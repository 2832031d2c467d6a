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
