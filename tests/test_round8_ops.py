"""Round-8 operator tests: supervised embedding evals + the PQ
fixed-K rewrite's scale contract."""

import pytest


def test_nearest_centroid_covers_all_labels(spark, sf_dir):
    from smile_spark.operators.similarity import nearest_centroid_eval
    from smile_spark.tables import table

    rows = nearest_centroid_eval(spark, sf_dir).collect()
    emb = table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels
    assert sum(r.n_vectors for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r.n_correct <= r.n_vectors
        assert 0.0 <= r.accuracy <= 1.0


def test_ann_recall_eval_contract(spark, sf_dir):
    from smile_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_recall_eval,
    )

    rows = ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert r.n_exact == TOP_K
        assert 0 <= r.n_hit <= TOP_K
        # the qid's own vector is in both exact top-k and every SRP
        # probe-0 bucket, so recall can never be zero
        assert r.recall > 0.0


def test_pq_codebook_is_fixed_size(spark, sf_dir):
    """The r07 scale defect: K grew ~N/7 with the corpus.  The fixed
    stride must keep every subspace's codebook at <= PQ_K_TARGET +
    ceiling slack regardless of corpus size."""
    import math

    from smile_spark.operators.similarity import (
        PQ_K_TARGET,
        PQ_MOD_FLOOR,
    )
    from smile_spark.tables import table

    n = table(spark, sf_dir, "embeddings").count()
    pqmod = max(PQ_MOD_FLOOR, math.ceil(n / float(PQ_K_TARGET)))
    k = -(-n // pqmod)  # codewords per subspace
    assert k <= PQ_K_TARGET + 1
    # and the fixture floor still yields a non-trivial book
    assert k >= 50


@pytest.mark.parametrize("n", [500, 2_000, 100_000, 10**9])
def test_pq_mod_scales_linearly(n):
    import math

    from smile_spark.operators.similarity import (
        PQ_K_TARGET,
        PQ_MOD_FLOOR,
    )

    pqmod = max(PQ_MOD_FLOOR, math.ceil(n / float(PQ_K_TARGET)))
    k = -(-n // pqmod)
    assert k <= PQ_K_TARGET + 1, (n, pqmod, k)


def test_exact_ngram_dedup_contract(spark, sf_dir):
    from smile_spark.operators.dedup import (
        SUBSTR_GRAM_N,
        exact_ngram_dedup,
    )
    from smile_spark.tables import table
    import pyspark.sql.functions as F

    rows = exact_ngram_dedup(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    eligible = docs.filter(
        F.size(F.split("text", " ")) >= SUBSTR_GRAM_N
    ).count()
    assert len(rows) == eligible
    for r in rows:
        assert 0 <= r.n_dup <= r.n_grams
        assert r.flagged == (r.n_dup * 2 >= r.n_grams)
    # the fixture is template-heavy: some cross-doc duplication exists
    assert any(r.n_dup > 0 for r in rows)


def test_exact_ngram_dedup_catches_partial_overlap(spark):
    """Two docs sharing one 13-token span inside otherwise-distinct
    text must both report exactly that duplicated gram set."""
    import pyspark.sql.functions as F

    span = " ".join(f"s{i}" for i in range(13))
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m n o p"),
            (2, span + " x1 x2 x3"),
            (3, "y1 y2 y3 " + span),
        ],
        "doc_id long, text string",
    )
    import smile_spark.operators.dedup as D

    n = D.SUBSTR_GRAM_N
    toks = df.select("doc_id", F.split("text", " ").alias("tk")).filter(
        F.size("tk") >= n
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(tk) - {n - 1}),"
                f" i -> array_join(slice(tk, i, {n}), ' '))"
            )
        ).alias("gram"),
    ).distinct()
    gstat = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("ndocs"))
    per = {
        r.doc_id: (r.n_grams, r.n_dup)
        for r in grams.join(gstat, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("ndocs") > 1).cast("bigint")).alias("n_dup"),
        )
        .collect()
    }
    assert per[1] == (4, 0)  # 16 tokens -> 4 grams, none shared
    # docs 2 and 3 share exactly the one span gram
    assert per[2][1] == 1 and per[3][1] == 1


def test_dup_span_cutlist_spans_are_disjoint(spark, sf_dir):
    from collections import defaultdict

    from smile_spark.operators.dedup import (
        SUBSTR_GRAM_N,
        dup_span_cutlist,
        exact_ngram_dedup,
    )

    rows = dup_span_cutlist(spark, sf_dir).collect()
    assert rows, "template-heavy fixture must have duplicated spans"
    by_doc = defaultdict(list)
    for r in rows:
        assert r.span_tokens == r.span_end - r.span_start + 1
        assert r.span_tokens >= SUBSTR_GRAM_N
        by_doc[r.doc_id].append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, "merged spans must not overlap or touch"
    # consistency with the per-doc profile: a doc with a span must
    # have n_dup > 0 there, and vice versa
    prof = {
        r.doc_id: r.n_dup for r in exact_ngram_dedup(spark, sf_dir).collect()
    }
    assert set(by_doc) == {d for d, nd in prof.items() if nd > 0}


def test_gap_interpolate_properties(spark, sf_dir):
    from smile_spark.operators.behavior import gap_interpolate_daily

    rows = gap_interpolate_daily(spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert r.v_interp is not None
        by_user.setdefault(r.user_id, []).append(r)
    n_interp = 0
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        # span edges are observed by construction
        assert series[0].is_observed and series[-1].is_observed
        # an interpolated value lies between its observed neighbours
        for i, r in enumerate(series):
            if r.is_observed:
                continue
            n_interp += 1
            prev = next(
                x for x in reversed(series[:i]) if x.is_observed
            )
            nxt = next(x for x in series[i + 1 :] if x.is_observed)
            lo = min(prev.v_interp, nxt.v_interp)
            hi = max(prev.v_interp, nxt.v_interp)
            assert lo - 1e-6 <= r.v_interp <= hi + 1e-6
    assert n_interp > 0, "fixture must contain gaps to interpolate"


def test_benford_screen_contract(spark, sf_dir):
    import pyspark.sql.functions as F

    from smile_spark.operators.quality import benford_screen
    from smile_spark.tables import table

    rows = benford_screen(spark, sf_dir).collect()
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_nationkey"
    )
    n_nations = (
        orders.join(cust, "ck").select("c_nationkey").distinct().count()
    )
    assert len(rows) == n_nations
    total = table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    for r in rows:
        assert r.chi2 >= 0.0
        assert r.n_orders > 0


def test_hard_negatives_exclude_query_label(spark, sf_dir):
    from smile_spark.operators.similarity import (
        TOP_K,
        hard_negative_mining,
    )

    rows = hard_negative_mining(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.neg_label != r.q_label
        assert 1 <= r.rn <= TOP_K


def test_group_split_certificate(spark, sf_dir):
    from smile_spark.operators.pipeline import group_split_no_leakage
    from smile_spark.tables import table

    row = group_split_no_leakage(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.crossing_pairs == 0, "near-dup pair crossed the split"
    n_docs = table(spark, sf_dir, "documents").count()
    assert r.n_train + r.n_eval == n_docs
    assert r.n_train > r.n_eval > 0
