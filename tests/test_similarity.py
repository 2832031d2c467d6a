"""IVF approximate search is validated by recall against brute force
(it has no row-equal oracle by design)."""

from smile_spark.operators.similarity import ann_cosine_topk, ann_ivf_topk


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    exact = {
        (r.qid, r.vec_id) for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    approx = {
        (r.qid, r.vec_id) for r in ann_ivf_topk(spark, sf_dir).collect()
    }
    # every query returns k candidates, and recall must be useful
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_ivf_self_match(spark, sf_dir):
    # each query vector must find itself at rank 1 (its own cell is
    # always its nearest, hence always probed)
    rows = ann_ivf_topk(spark, sf_dir).collect()
    for qid in {r.qid for r in rows}:
        top = [r for r in rows if r.qid == qid and r.rn == 1][0]
        assert top.vec_id == qid and abs(top.cos_r - 1.0) < 1e-9


def test_ivf_index_search_matches_inmemory(spark, sf_dir, tmp_path):
    """The persisted cell-partitioned index must return exactly what
    the in-memory IVF search returns, and the probed-cell filter must
    prune partitions at the scan."""
    import os

    from smile_spark.operators.similarity import (
        ann_ivf_topk,
        ivf_build,
        ivf_search_indexed,
    )
    from smile_spark.plans.audit import formatted_plan

    path = os.path.join(tmp_path, "ivf_index")
    ivf_build(spark, sf_dir, path)
    indexed = ivf_search_indexed(spark, sf_dir, path)
    inmem = ann_ivf_topk(spark, sf_dir)
    assert indexed.exceptAll(inmem).isEmpty()
    assert inmem.exceptAll(indexed).isEmpty()

    plan = formatted_plan(indexed)
    assert "PartitionFilters" in plan and "cid" in plan
