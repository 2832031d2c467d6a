"""Round-10 operators: 64-bit token/gram hashing (setsim + exact
n-gram family), path-agreement certificates, and SemDeDup semantic
dedup.  Each new op is verified against its DuckDB oracle at the test
SF and its core invariants are property-checked."""

import pandas as pd
from pyspark.sql import functions as F

from smile_spark.tables import table
from smile_spark.testing import assert_matches_oracle

SF001 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# 64-bit key paths agree with string-key paths, bit for bit
# ---------------------------------------------------------------------------


def test_setsim_hashed_equals_string_path(spark, sf_dir):
    """The xxhash64 token path must produce the IDENTICAL pair set
    (a, b, na, nb, i, jaccard) as the raw-string path — the hashing
    only changes join-key width and the (df, tok) tie-break, neither
    of which the lossless prefix filter depends on."""
    from smile_spark.operators.dedup import setsim_join_frame

    for d in (sf_dir, SF001):
        docs = table(spark, d, "documents")
        hashed = sorted(
            map(tuple, setsim_join_frame(docs, hash_tokens=True).collect())
        )
        strung = sorted(
            map(tuple, setsim_join_frame(docs, hash_tokens=False).collect())
        )
        assert hashed == strung
        assert len(hashed) > 0


def test_ngram_hashed_equals_string_path(spark, sf_dir):
    """Same agreement contract for the 13-gram family: profiles and
    cut lists are identical under hashed vs string gram keys."""
    from smile_spark.operators.dedup import (
        SUBSTR_GRAM_N,
        dup_span_frame,
        exact_ngram_frame,
    )

    docs = table(spark, sf_dir, "documents")
    for fn in (exact_ngram_frame, dup_span_frame):
        hashed = sorted(
            map(
                tuple,
                fn(docs, SUBSTR_GRAM_N, hash_grams=True).collect(),
            )
        )
        strung = sorted(
            map(
                tuple,
                fn(docs, SUBSTR_GRAM_N, hash_grams=False).collect(),
            )
        )
        assert hashed == strung
        assert len(hashed) > 0


def test_setsim_hash_agreement_oracle(spark, sf_dir):
    from smile_spark.operators.dedup import (
        SETSIM_HASH_AGREEMENT_SQL,
        setsim_hash_agreement,
    )

    assert_matches_oracle(
        spark, setsim_hash_agreement, SETSIM_HASH_AGREEMENT_SQL, sf_dir
    )


def test_ngram_hash_agreement_oracle(spark, sf_dir):
    from smile_spark.operators.dedup import (
        NGRAM_HASH_AGREEMENT_SQL,
        ngram_hash_agreement,
    )

    assert_matches_oracle(
        spark, ngram_hash_agreement, NGRAM_HASH_AGREEMENT_SQL, sf_dir
    )


def test_setsim_group_expansion_covers_identical_docs(spark):
    """GroupJoin regression guard: documents with IDENTICAL token sets
    must appear as jaccard=1.0 pairs (intra-group expansion), and
    near-identical cross-group pairs must survive representative
    collapse."""
    from smile_spark.operators.dedup import setsim_join_frame

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
        # 9/10 of group {1,2,3}'s tokens + one new -> J = 9/11 < 0.9
        (4, "alpha beta gamma delta epsilon zeta eta theta iota NEW"),
        # J with group = 10/11 > 0.9 via one extra token
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa X"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.a, r.b): (r.na, r.nb, r.i, r.jaccard)
        for r in setsim_join_frame(docs).collect()
    }
    # intra-group: all three identical docs pairwise at J=1.0
    for pair in [(1, 2), (1, 3), (2, 3)]:
        assert got[pair] == (10, 10, 10, 1.0), got
    # inter-group: doc 5 vs each member of the identical group
    for pair in [(1, 5), (2, 5), (3, 5)]:
        assert got[pair] == (10, 11, 10, round(10 / 11, 6)), got
    assert not any(4 in p for p in got), got


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_oracle(spark, sf_dir):
    from smile_spark.operators.dedup import (
        SEMANTIC_DEDUP_SQL,
        semantic_dedup,
    )

    assert_matches_oracle(spark, semantic_dedup, SEMANTIC_DEDUP_SQL, sf_dir)
    assert_matches_oracle(spark, semantic_dedup, SEMANTIC_DEDUP_SQL, SF001)


def test_semantic_dedup_invariants(spark, sf_dir):
    """Every vector appears exactly once; dropped vectors always name
    a same-cluster dominator (per the SemDeDup reference semantics
    the dominator may itself be dropped — the rule is one matrix
    pass, not an iterative selection); kept rows carry no dominator;
    at least one drop happens on the fixture (the threshold is
    calibrated to the synthetic corpus)."""
    from smile_spark.operators.dedup import semantic_dedup

    pdf = semantic_dedup(spark, sf_dir).toPandas()
    emb = table(spark, sf_dir, "embeddings")
    assert len(pdf) == emb.count()
    assert pdf["vec_id"].is_unique
    dropped = pdf[~pdf["keep"]]
    assert len(dropped) > 0
    assert len(dropped) < len(pdf)
    assert dropped["dup_of"].notna().all()
    by_id = dict(zip(pdf["vec_id"], pdf["cid"]))
    for _, r in dropped.iterrows():
        assert int(r["dup_of"]) != int(r["vec_id"])
        assert by_id[int(r["dup_of"])] == r["cid"]
    assert pdf[pdf["keep"]]["dup_of"].isna().all()


def test_semantic_dedup_pairs_within_embedding_cosine(spark, sf_dir):
    """Ladder consistency: a (dropped, dup_of) semantic-dup edge is a
    same-cluster pair with cosine >= SEMDEDUP_TAU; every such edge
    must therefore also appear in dedup_embedding_cosine's pair set
    when the SemDeDup threshold is at least the embedding-cosine
    one — the coarser rung can only ADD pairs, never miss one the
    finer rung found (both compute the same exact cosine)."""
    from smile_spark.operators.dedup import (
        NEARDUP_COS_THRESHOLD,
        SEMDEDUP_TAU,
        dedup_embedding_cosine,
        semantic_dedup,
    )

    assert SEMDEDUP_TAU >= NEARDUP_COS_THRESHOLD
    sem = semantic_dedup(spark, sf_dir).toPandas()
    edges = {
        (min(int(r["vec_id"]), int(r["dup_of"])),
         max(int(r["vec_id"]), int(r["dup_of"])))
        for _, r in sem[~sem["keep"]].iterrows()
    }
    cos_pairs = {
        (r.a, r.b) for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    # dedup_embedding_cosine blocks by sign-quantized bucket; SemDeDup
    # blocks by nearest centroid.  Only edges whose two vectors share
    # a sign bucket CAN appear in the cosine rung — restrict to those.
    from smile_spark.operators.dedup import _auto_bits_cached
    from smile_spark.operators.similarity import _vectors

    emb = _vectors(spark, sf_dir)
    bits = _auto_bits_cached(spark, sf_dir, emb)
    bucket = sum(
        F.when(F.element_at("v", j + 1) >= 0, F.lit(2**j)).otherwise(
            F.lit(0)
        )
        for j in range(bits)
    )
    bmap = {
        r.vec_id: r.bucket
        for r in emb.select("vec_id", bucket.alias("bucket")).collect()
    }
    comparable = {e for e in edges if bmap[e[0]] == bmap[e[1]]}
    assert comparable.issubset(cos_pairs)


# ---------------------------------------------------------------------------
# join_skew_profile / duplicate_set_groups / pca_power_iteration
# ---------------------------------------------------------------------------


def test_join_skew_profile_oracle(spark, sf_dir):
    from smile_spark.operators.quality import (
        JOIN_SKEW_PROFILE_SQL,
        join_skew_profile,
    )

    assert_matches_oracle(
        spark, join_skew_profile, JOIN_SKEW_PROFILE_SQL, sf_dir
    )
    r = join_skew_profile(spark, SF001).collect()[0]
    # internal consistency: shares in [0,1], salt factor >= 1, hot
    # rows can never outnumber total rows
    assert 0.0 <= r.top_share <= 1.0
    assert 0.0 <= r.hot_rows_share <= 1.0
    assert r.rec_salts >= 1
    assert r.max_rows <= r.total_rows
    assert r.n_hot_keys <= r.n_keys


def test_duplicate_set_groups_oracle(spark, sf_dir):
    from smile_spark.operators.dedup import (
        DUPLICATE_SET_GROUPS_SQL,
        duplicate_set_groups,
    )

    assert_matches_oracle(
        spark, duplicate_set_groups, DUPLICATE_SET_GROUPS_SQL, sf_dir
    )


def test_duplicate_set_groups_matches_setsim_intra_pairs(spark, sf_dir):
    """Cross-operator consistency: intra_pairs (the pairs the GroupJoin
    expansion emits at jaccard exactly 1.0) must equal the number of
    J=1.0 pairs in the full setsim result whose endpoints share a
    token set — and every such setsim pair has identical na/nb."""
    from smile_spark.operators.dedup import (
        duplicate_set_groups,
        setsim_join_prefix,
    )

    g = duplicate_set_groups(spark, sf_dir).collect()[0]
    pairs = setsim_join_prefix(spark, sf_dir).collect()
    ones = [r for r in pairs if r.jaccard == 1.0 and r.i == r.na == r.nb]
    assert len(ones) == g.intra_pairs


def test_pca_power_iteration_oracle(spark, sf_dir):
    from smile_spark.operators.fit import (
        pca_power_iteration,
        pca_power_iteration_sql,
    )

    assert_matches_oracle(
        spark, pca_power_iteration, pca_power_iteration_sql(), sf_dir
    )
    assert_matches_oracle(
        spark, pca_power_iteration, pca_power_iteration_sql(), SF001
    )


def test_pca_power_iteration_unit_norm(spark, sf_dir):
    """The returned direction is (numerically) unit-norm and has one
    row per embedding dimension."""
    import math

    from smile_spark.operators.fit import pca_power_iteration

    rows = pca_power_iteration(spark, sf_dir).collect()
    assert len(rows) == 64
    assert set(r.pos for r in rows) == set(range(64))
    norm = math.sqrt(sum(r.loading**2 for r in rows))
    assert abs(norm - 1.0) < 1e-4
