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


def test_ann_ivf_indexed_registered(spark, sf_dir):
    """The driver-registered ann_ivf_indexed (build-once cached index
    + pruned probe) must match the in-memory IVF path exactly AND keep
    the partition-prune plan shape — the plan assert promoted into the
    registered query, not just the raw ivf_search_indexed helper."""
    from smile_spark.operators.similarity import (
        ann_ivf_indexed,
        ann_ivf_topk,
    )
    from smile_spark.plans.audit import formatted_plan

    indexed = ann_ivf_indexed(spark, sf_dir)
    inmem = ann_ivf_topk(spark, sf_dir)
    assert indexed.exceptAll(inmem).isEmpty()
    assert inmem.exceptAll(indexed).isEmpty()
    plan = formatted_plan(indexed)
    assert "PartitionFilters" in plan and "cid" in plan


def test_kmeans_lloyd_iteration_improves_inertia(spark, sf_dir):
    """One Lloyd update must not increase total inertia (the textbook
    monotonicity guarantee) — checked on the real fixture corpus."""
    from pyspark.sql import functions as F

    from smile_spark.operators.similarity import (
        KMEANS_K,
        _assign,
        _update,
        _vectors,
    )

    emb = _vectors(spark, sf_dir)
    cents0 = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    a1 = _assign(emb, cents0)
    a2 = _assign(emb, _update(a1))
    i1 = a1.agg(F.sum("d2")).collect()[0][0]
    i2 = a2.agg(F.sum("d2")).collect()[0][0]
    assert i2 <= i1 + 1e-9, (i1, i2)


def test_kmeans_partition_of_corpus(spark, sf_dir):
    """Every vector lands in exactly one cluster: cluster sizes sum to
    the corpus size."""
    from smile_spark.operators.similarity import embedding_kmeans
    from smile_spark.tables import table

    n = table(spark, sf_dir, "embeddings").count()
    sizes = embedding_kmeans(spark, sf_dir).collect()
    assert sum(r.n_points for r in sizes) == n
    assert all(r.inertia >= 0 for r in sizes)


def test_ivf_upsert_appends_into_assigned_cells(spark, sf_dir, tmp_path):
    """Upserted vectors must land in exactly the cells the in-memory
    assignment rule picks, without disturbing existing index rows."""
    from pyspark.sql import functions as F

    from smile_spark.operators.similarity import (
        _cells,
        _dot,
        _norm,
        _vectors,
        ivf_build,
        ivf_upsert,
    )
    from pyspark.sql.window import Window

    index = str(tmp_path / "ivf")
    ivf_build(spark, sf_dir, index)
    n0 = spark.read.parquet(index).count()

    batch = (
        _vectors(spark, sf_dir)
        .filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 10**6).alias("vec_id"), "v")
    )
    ivf_upsert(spark, sf_dir, index, batch)

    idx = spark.read.parquet(index)
    assert idx.count() == n0 + 50
    # expected assignment, recomputed in memory
    cents = _cells(spark, sf_dir)
    scored = batch.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        (_dot("v", "cv") / (_norm("v") * _norm("cv"))).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    expected = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", "cid")
    )
    got = idx.filter(F.col("vec_id") >= 10**6).select("vec_id", "cid")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
