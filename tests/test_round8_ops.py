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
