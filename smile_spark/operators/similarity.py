"""Similarity search over embedding columns (north-star extension).

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

* brute-force cosine top-k — the exactness baseline.  Query vectors
  are broadcast; every partition scores its shard of the corpus and
  per-query top-k is a rank-filter.  No shuffle touches the corpus:
  the only exchanged data is (qid, vid, score) candidates.
* IVF-style partitioned search — the 100 TB path.  The corpus is
  assigned to coarse cells (nearest centroid); a query probes only
  its ``nprobe`` closest cells, so scored vectors drop by
  ~#cells/nprobe.  Centroids here are a deterministic subsample
  (stand-in for a k-means fit, which would be an offline job at
  scale); assignment/probing logic is the real thing.

All arithmetic is double-precision fold expressions inside codegen
(``zip_with`` + ``aggregate``) — no Python UDF in the scoring path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smile_spark.tables import table

N_QUERIES = 3          # query vectors: vec_id < 3
TOP_K = 10
CENTROID_MOD = 97      # deterministic centroid subsample
N_PROBE = 2
ROUND_DIGITS = 6


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0 as double), (acc, z) -> acc + z)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> x * x),"
            " cast(0 as double), (acc, z) -> acc + z)"
        )
    )


def ann_cosine_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Brute-force cosine top-k for the deterministic query set
    (vec_id < 3).  Scores round to 6 digits before ranking so the
    result set is stable across summation orders; ties break by
    vec_id.  Returns (qid, vec_id, cos_r, rn)."""
    emb = _vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = emb.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(_dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS).alias(
            "cos_r"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            "vec_id",
            "cos_r",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


ANN_COSINE_SQL = (
    "WITH e AS (SELECT vec_id,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings),"
    f" q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}),"
    " u AS (SELECT qid, e.vec_id, unnest(e.v) AS a, unnest(q.qv) AS b"
    "  FROM e, q),"
    " s AS (SELECT qid, vec_id, SUM(a * b) AS dot,"
    "  SUM(a * a) AS na, SUM(b * b) AS nb FROM u GROUP BY qid, vec_id),"
    " scored AS (SELECT qid, vec_id,"
    f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS cos_r FROM s),"
    " ranked AS (SELECT qid, vec_id, cos_r, ROW_NUMBER() OVER"
    "  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn FROM scored)"
    f" SELECT qid, vec_id, cos_r, rn FROM ranked WHERE rn <= {TOP_K}"
)


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """IVF-style approximate top-k: assign corpus to nearest-centroid
    cells, probe the query's ``nprobe`` nearest cells only.

    Shape at 100 TB: the corpus-to-cell assignment is one broadcast
    join against the (small) centroid set, written once and reused;
    per-query work then touches only the probed cells — with cell
    pruning pushed into the scan when the corpus is stored partitioned
    by cell id.  Approximate by design, so validated by a recall test
    against brute force, not a row-equal oracle.
    Returns (qid, vec_id, cos_r, rn).
    """
    emb = _vectors(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # cell assignment: nearest centroid by cosine (rank-1 filter)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cid",
        (_dot("v", "cv") / (_norm("v") * _norm("cv"))).alias("sim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        scored.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cid")
    )
    # queries probe their nprobe nearest cells
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    qcells = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "qid",
            "qv",
            "cid",
            (_dot("qv", "cv") / (_norm("qv") * _norm("cv"))).alias("sim"),
        )
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
            ),
        )
        .filter(F.col("prn") <= nprobe)
        .select("qid", "qv", "cid")
    )
    candidates = assigned.join(qcells, "cid").select(
        "qid",
        "vec_id",
        F.round(_dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS).alias(
            "cos_r"
        ),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        candidates.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            "vec_id",
            "cos_r",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


# DuckDB mirrors of _dot/_norm: list_reduce is a strict left fold, the
# same evaluation order as Spark's ``aggregate`` fold, so the unrounded
# doubles (cell-assignment similarities included) are bit-identical —
# which is what makes an EXACT oracle possible for the IVF search.
def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def _sql_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, x -> x * x),"
        " (x, y) -> x + y))"
    )


def ann_ivf_sql() -> str:
    """Exact DuckDB oracle for ann_ivf_topk.  Every nondeterminism is
    pinned: centroids are a fixed modulus subsample, assignment and
    probe ranks tie-break on cid, final rank ties on vec_id, and all
    dot/norm folds run in identical order on both engines."""
    sim_a = (
        f"{_sql_dot('e.v', 'c.cv')}"
        f" / ({_sql_norm('e.v')} * {_sql_norm('c.cv')})"
    )
    sim_q = (
        f"{_sql_dot('q.qv', 'c.cv')}"
        f" / ({_sql_norm('q.qv')} * {_sql_norm('c.cv')})"
    )
    cos = (
        f"{_sql_dot('a.v', 'qc.qv')}"
        f" / ({_sql_norm('a.v')} * {_sql_norm('qc.qv')})"
    )
    return (
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings),"
        f" cents AS (SELECT vec_id AS cid, v AS cv FROM e"
        f"  WHERE vec_id % {CENTROID_MOD} = 0),"
        " asg AS (SELECT vec_id, v, cid, ROW_NUMBER() OVER"
        "  (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS arn FROM ("
        f"  SELECT e.vec_id, e.v, c.cid, {sim_a} AS sim FROM e, cents c)),"
        " assigned AS (SELECT vec_id, v, cid FROM asg WHERE arn = 1),"
        f" q AS (SELECT vec_id AS qid, v AS qv FROM e"
        f"  WHERE vec_id < {N_QUERIES}),"
        " qc AS (SELECT qid, qv, cid, ROW_NUMBER() OVER"
        "  (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS prn FROM ("
        f"  SELECT q.qid, q.qv, c.cid, {sim_q} AS sim FROM q, cents c)),"
        f" qcells AS (SELECT qid, qv, cid FROM qc WHERE prn <= {N_PROBE}),"
        " cand AS (SELECT qc.qid, a.vec_id,"
        f"  ROUND({cos}, {ROUND_DIGITS}) AS cos_r"
        "  FROM assigned a JOIN qcells qc ON a.cid = qc.cid),"
        " ranked AS (SELECT qid, vec_id, cos_r, ROW_NUMBER() OVER"
        "  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn"
        "  FROM cand)"
        f" SELECT qid, vec_id, cos_r, rn FROM ranked WHERE rn <= {TOP_K}"
    )


# ---------------------------------------------------------------------------
# persisted IVF index: cell-partitioned corpus + pruned probing
# ---------------------------------------------------------------------------


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic centroid set (stand-in for an offline k-means)."""
    emb = _vectors(spark, sf_dir)
    return emb.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )


def ivf_build(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Build the IVF index: assign every corpus vector to its nearest
    centroid and persist the corpus PARTITIONED BY cell id.

    This is the one-time physical investment (like bucketing for
    joins): after it, a query probing ``nprobe`` cells reads ONLY
    those directories — cell pruning happens in the parquet source,
    before any vector is scored.
    """
    emb = _vectors(spark, sf_dir)
    cents = _cells(spark, sf_dir)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cid",
        (_dot("v", "cv") / (_norm("v") * _norm("cv"))).alias("sim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        scored.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cid")
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(index_path)


def ivf_search_indexed(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Probe a persisted IVF index: pick each query's ``nprobe``
    nearest cells, scan ONLY those partitions (the cell filter is a
    partition filter — checked in tests), score, rank.

    Result-identical to the in-memory ``ann_ivf_topk`` (same centroids,
    same probing) — asserted in tests; only the physical access path
    differs.
    """
    cents = _cells(spark, sf_dir)
    q = _vectors(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    qcells = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "qid",
            "qv",
            "cid",
            (_dot("qv", "cv") / (_norm("qv") * _norm("cv"))).alias("sim"),
        )
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
            ),
        )
        .filter(F.col("prn") <= nprobe)
        .select("qid", "qv", "cid")
    )
    # The probed-cell set is tiny (#queries × nprobe) — collect it so
    # the cell predicate is a LITERAL the parquet source can prune
    # partitions with; a join would be correct but unprunable.
    probe_cells = [r.cid for r in qcells.select("cid").distinct().collect()]
    corpus = spark.read.parquet(index_path).filter(
        F.col("cid").isin(probe_cells)
    )
    candidates = corpus.join(F.broadcast(qcells), "cid").select(
        "qid",
        "vec_id",
        F.round(_dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS).alias(
            "cos_r"
        ),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        candidates.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            "vec_id",
            "cos_r",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


# Index paths memoized per (application, sf_dir): an IVF index is the
# one-time physical investment (like bucketing) — built once, probed
# many times.  Since r13 the index lives at a STABLE warehouse path
# with a sidecar fingerprint (the setsim/dhash/PQ adoption contract):
# a fresh session whose memo is empty adopts a matching on-disk index
# instead of rebuilding — the cell-partitioned parquet is path-based,
# so adoption needs no catalog entry, only the sidecar match.  The
# single-writer assumption of the bucketed indexes applies.
_IVF_INDEX_CACHE: dict[tuple[str, str], str] = {}
_IVF_INDEX_SIDECARS: set[str] = set()


def clear_ivf_index_cache() -> None:
    """Forget the per-process IVF index memo AND drop the adoption
    sidecars this process wrote, forcing the next probe to rebuild
    the cell-partitioned index (overwrite in place — nothing to
    unpersist)."""
    from smile_spark.sources.bucketed import remove_sidecar_file

    _IVF_INDEX_CACHE.clear()
    for path in list(_IVF_INDEX_SIDECARS):
        remove_sidecar_file(path)
        _IVF_INDEX_SIDECARS.discard(path)


def _ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os

    from smile_spark.sources.bucketed import (
        _warehouse_dir,
        bucket_table_name,
        read_sidecar,
        write_sidecar,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _IVF_INDEX_CACHE:
        return _IVF_INDEX_CACHE[key]
    name = bucket_table_name("ivf_index", sf_dir)
    path = os.path.join(_warehouse_dir(spark), name)
    expected = {
        "n_vec": _vectors(spark, sf_dir).count(),
        "centroid_mod": CENTROID_MOD,
        "sf_dir": sf_dir,
        "path": path,
    }
    # path-based adoption: the parquet directory + a matching sidecar
    # (written AFTER the build, so a crashed build is never adopted)
    from smile_spark.sources.bucketed import sidecar_path

    if not (
        read_sidecar(spark, name) == expected and os.path.isdir(path)
    ):
        ivf_build(spark, sf_dir, path)
        write_sidecar(spark, name, expected)
    # track the sidecar whether built OR adopted: path-based adoption
    # works across processes (no catalog needed), so a clear must be
    # able to drop a sidecar this process never wrote
    _IVF_INDEX_SIDECARS.add(sidecar_path(spark, name))
    _IVF_INDEX_CACHE[key] = path
    return path


def ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN path, driver-registered: build the
    cell-PARTITIONED persisted IVF index once per application (cached,
    like the hypertable rollup), then answer top-k by probing only the
    queries' nearest cells — the probe-cell set becomes a literal
    ``IN`` predicate so parquet partition pruning skips every other
    cell's directory before a single vector is read.

    Result-identical to the in-memory :func:`ann_ivf_topk` (same
    centroid rule, same probing), so it shares the ``ann_ivf_sql``
    oracle; only the physical access path differs.  At 100 TB this is
    the shape that wins: the index build is one shuffle, and every
    search after it reads O(queries x nprobe x cell) bytes instead of
    the corpus."""
    return ivf_search_indexed(spark, sf_dir, _ivf_index_path(spark, sf_dir))


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus statistics: count and mean L2 norm — the cheap
    sanity scan a pipeline runs before any ANN build."""
    emb = table(spark, sf_dir, "embeddings").select(
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    return (
        emb.select("label", F.round(_norm("v"), ROUND_DIGITS).alias("l2_norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l2_norm"), 4).alias("avg_norm"),
        )
    )


EMBEDDING_NORMS_SQL = (
    "WITH n AS (SELECT vec_id, label,"
    " ROUND(sqrt(s), 6) AS l2_norm FROM ("
    "  SELECT vec_id, label, SUM(a * a) AS s FROM ("
    "   SELECT vec_id, label,"
    "   unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS a"
    "   FROM embeddings) GROUP BY vec_id, label))"
    " SELECT label, COUNT(*) AS n, ROUND(AVG(l2_norm), 4) AS avg_norm"
    " FROM n GROUP BY label"
)


# ---------------------------------------------------------------------------
# k-means (Lloyd) over the embedding corpus
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_DEC = "decimal(27,18)"       # exact per-dimension accumulation
KMEANS_INERTIA_DEC = "decimal(30,15)"


def _sql_d2(v: str, c: str) -> str:
    """Squared L2 as a strict left fold — same evaluation order as the
    Spark ``aggregate`` fold, so unrounded doubles match bit-for-bit."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({v})),"
        f" i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (x, y) -> x + y)"
    )


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment, fully map-side.

    The centroid set collapses to ONE array-of-structs row (a few KB)
    broadcast to every partition; each corpus row evaluates a
    per-centroid (d2, cid) struct array and takes ``array_min`` —
    struct ordering is lexicographic, so this IS "min d2, ties by cid
    ascending".  Unlike a crossJoin+window argmin, NO corpus row is
    ever replicated K ways through a shuffle and no window state
    exists: assignment cost is pure per-row compute inside codegen,
    the shape that survives a 100 TB corpus unchanged."""
    carr = cents.agg(
        F.expr("array_sort(collect_list(struct(cid, cv)))").alias("cs")
    )
    best = F.expr(
        "array_min(transform(cs, c -> named_struct("
        " 'd2', aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)),"
        "  cast(0 as double), (acc, z) -> acc + z),"
        " 'cid', c.cid)))"
    )
    return (
        emb.crossJoin(F.broadcast(carr))
        .select("vec_id", "v", best.alias("b"))
        .select(
            "vec_id",
            "v",
            F.col("b.cid").alias("cid"),
            F.col("b.d2").alias("d2"),
        )
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Recompute centroids as per-dimension means.

    Double SUM is order-dependent, so each coordinate accumulates in
    DECIMAL(27,18) (exact, associative) and divides ONCE as a double —
    bit-identical across partitionings and engines (the numeric.py
    discipline applied per dimension).  Shuffle volume is (cid, dim)
    keyed partial sums — K x dim rows per partition, independent of
    corpus size."""
    dims = assigned.select("cid", F.posexplode("v").alias("pos", "x"))
    means = dims.groupBy("cid", "pos").agg(
        (
            F.sum(F.col("x").cast(KMEANS_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("mean")
    )
    return means.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mean))),"
            " s -> s.mean)"
        ).alias("cv")
    )


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding corpus: 2 Lloyd assignment rounds
    (init = the first K vectors by vec_id, one centroid update in
    between), reporting per-cluster size and inertia.

    The iterative-ML-on-DataFrames pattern at 100 TB: per round, ONE
    broadcast of the K x dim centroid table (a few KB), assignment
    fully map-side, and a (cid, dim)-keyed partial-aggregate shuffle
    whose volume is independent of corpus size.  The driver loop only
    ships centroid tables — never data — mirroring the Pregel-style
    graph loop (SURVEY.md §3.3).  Every float reduction is either a
    pinned-order fold (distances: ``aggregate``/``list_reduce``) or a
    DECIMAL accumulation (means, inertia), so the whole fit — argmin
    assignments included — is verified bit-for-bit against DuckDB.

    Returns (cid, n_points, inertia) for the final assignment.
    """
    emb = _vectors(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    a1 = _assign(emb, cents)
    cents1 = _update(a1)
    a2 = _assign(emb, cents1)
    return a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum(F.col("d2").cast(KMEANS_INERTIA_DEC)).cast("double"), 4
        ).alias("inertia"),
    )


def embedding_kmeans_sql() -> str:
    """Exact DuckDB oracle: same init rule, same fold order for every
    distance, same DECIMAL accumulation for means and inertia, same
    cid-ascending tie-breaks."""
    return (
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings),"
        f" cents0 AS (SELECT vec_id AS cid, v AS cv FROM e"
        f"  WHERE vec_id < {KMEANS_K}),"
        " s1 AS (SELECT e.vec_id, e.v, c.cid,"
        f"  {_sql_d2('e.v', 'c.cv')} AS d2 FROM e, cents0 c),"
        " a1 AS (SELECT vec_id, v, cid, d2 FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id"
        "   ORDER BY d2 ASC, cid ASC) AS rn FROM s1) WHERE rn = 1),"
        " dims AS (SELECT cid, i - 1 AS pos, v[i] AS x"
        "  FROM a1, unnest(generate_series(1, len(v))) g(i)),"
        " means AS (SELECT cid, pos,"
        "  CAST(SUM(CAST(x AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*)"
        "   AS mean FROM dims GROUP BY cid, pos),"
        " cents1 AS (SELECT cid, list(mean ORDER BY pos) AS cv"
        "  FROM means GROUP BY cid),"
        " s2 AS (SELECT e.vec_id, c.cid,"
        f"  {_sql_d2('e.v', 'c.cv')} AS d2 FROM e, cents1 c),"
        " a2 AS (SELECT vec_id, cid, d2 FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id"
        "   ORDER BY d2 ASC, cid ASC) AS rn FROM s2) WHERE rn = 1)"
        " SELECT cid, COUNT(*) AS n_points,"
        " ROUND(CAST(SUM(CAST(d2 AS DECIMAL(30,15))) AS DOUBLE), 4)"
        "  AS inertia"
        " FROM a2 GROUP BY cid"
    )


def ivf_upsert(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    new_vectors: DataFrame,
) -> None:
    """Incrementally add vectors to a persisted IVF index: assign ONLY
    the new batch to cells (one broadcast join against the centroid
    set) and append into the cell-partitioned layout.

    The index lifecycle at 100 TB: the initial build is a full-corpus
    job (``ivf_build``), but fresh embeddings arrive continuously and
    re-building per batch is a non-starter — appending writes only the
    partitions the batch's cells touch, existing files are never
    rewritten, and queries see the union immediately (the parquet
    source lists files per probed cell directory at scan time).
    Compaction of small appended files is the same
    ``sources/compaction.py`` pass any streaming sink needs.

    ``new_vectors`` must carry (vec_id, v: array<double>).
    """
    cents = _cells(spark, sf_dir)
    scored = new_vectors.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cid",
        (_dot("v", "cv") / (_norm("v") * _norm("cv"))).alias("sim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    assigned = (
        scored.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cid")
    )
    assigned.write.mode("append").partitionBy("cid").parquet(index_path)


# ---------------------------------------------------------------------------
# Scalar-quantized (SQ8) ANN with exact re-rank
# ---------------------------------------------------------------------------

SQ8_LEVELS = 255       # codes 0..255 (one unsigned byte per dimension)
SQ8_CAND_MULT = 3      # quantized candidate pool = MULT * k per query


def ann_sq8_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """SQ8 approximate nearest neighbour: per-dimension uniform
    8-bit scalar quantization of the corpus, candidate generation by
    cosine over the DEQUANTIZED codes, then an exact re-rank of the
    SQ8_CAND_MULT*k survivors — the classic memory-bandwidth ANN
    ladder (FAISS's SQ8 index), beside the IVF cell-pruning path.

    Why it scales: the quantized corpus is one byte per dimension —
    an 8x smaller scan than float64 and 4x smaller than the float32
    parquet, which is the dominant cost of brute-force scoring at
    100 TB — and the exact re-rank touches only candidate rows.  The
    train step (per-dimension min/max) is ONE tiny aggregate,
    broadcast back; encode/score are JVM-side higher-order folds, no
    Python, no corpus shuffle (same contract as ann_cosine_topk).

    Determinism: min/max are exact; code = floor(t*255 + 0.5) on the
    identical double t both engines; scores round to 6 digits before
    ranking, ties break by vec_id.  The full pipeline (train, encode,
    probe, re-rank) is therefore exactly oracle-checkable even though
    the RETRIEVAL is approximate; recall vs brute force is pinned in
    pytest, not by the oracle."""
    emb = _vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    dims = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    stats = dims.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn, mx))),"
            " s -> s.mn)"
        ).alias("mins"),
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn, mx))),"
            " s -> s.mx)"
        ).alias("maxs"),
    )
    # Constant dimensions (mx == mn) would make (x-mn)/(mx-mn) NaN —
    # Spark folds NaN casts to 0 while DuckDB's checked CAST raises,
    # so the engines would diverge (ADVICE r05).  Emit code 0 for a
    # zero-range dimension; dequantization then reproduces mn exactly.
    codes = emb.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.expr(
            "transform(v, (x, i) -> case"
            " when element_at(maxs, i + 1) = element_at(mins, i + 1)"
            " then 0"
            " else cast(floor("
            " (x - element_at(mins, i + 1))"
            f" / (element_at(maxs, i + 1) - element_at(mins, i + 1))"
            f" * {SQ8_LEVELS}D + 0.5D) as int) end)"
        ).alias("codes"),
        "mins",
        "maxs",
    )
    deq = codes.withColumn(
        "vq",
        F.expr(
            "transform(codes, (c, i) -> element_at(mins, i + 1)"
            " + cast(c as double)"
            " * (element_at(maxs, i + 1) - element_at(mins, i + 1))"
            f" / {SQ8_LEVELS}D)"
        ),
    ).select("vec_id", "vq")
    qscored = deq.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(
            _dot("vq", "qv") / (_norm("vq") * _norm("qv")), ROUND_DIGITS
        ).alias("qcos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qcos"), F.asc("vec_id"))
    cand = (
        qscored.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= SQ8_CAND_MULT * k)
        .select("qid", "vec_id")
    )
    exact = (
        cand.join(emb, "vec_id")
        .join(q, "qid")
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS
            ).alias("cos_r"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cos_r", F.col("rn").cast("bigint").alias("rn"))
    )


ANN_SQ8_SQL = (
    "WITH e AS (SELECT vec_id,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings),"
    f" q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}),"
    " u AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS pos,"
    "  unnest(v) AS x FROM e),"
    " dims AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY pos),"
    " stats AS (SELECT list(mn ORDER BY pos) AS mins,"
    "  list(mx ORDER BY pos) AS maxs FROM dims),"
    # zero-range guard mirrors the Spark CASE: a constant dimension
    # dequantizes to mn on both engines instead of NaN/raise
    " deq AS (SELECT vec_id,"
    "  list_transform(v, (x, i) -> CASE WHEN maxs[i] = mins[i]"
    "   THEN mins[i] ELSE mins[i]"
    "   + CAST(FLOOR((x - mins[i]) / (maxs[i] - mins[i])"
    f"     * {SQ8_LEVELS} + 0.5) AS INT)"
    f"   * (maxs[i] - mins[i]) / {SQ8_LEVELS} END) AS vq"
    "  FROM e CROSS JOIN stats),"
    " uq AS (SELECT qid, deq.vec_id AS vec_id,"
    "  unnest(deq.vq) AS a, unnest(q.qv) AS b FROM deq, q),"
    " s AS (SELECT qid, vec_id, SUM(a * b) AS dot,"
    "  SUM(a * a) AS na, SUM(b * b) AS nb FROM uq GROUP BY qid, vec_id),"
    " qscored AS (SELECT qid, vec_id,"
    f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS qcos FROM s),"
    " cand AS (SELECT qid, vec_id FROM ("
    "  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid"
    "   ORDER BY qcos DESC, vec_id ASC) AS crn FROM qscored)"
    f"  WHERE crn <= {SQ8_CAND_MULT * TOP_K}),"
    " ue AS (SELECT c.qid, c.vec_id,"
    "  unnest(e.v) AS a, unnest(q.qv) AS b"
    "  FROM cand c JOIN e ON e.vec_id = c.vec_id JOIN q ON q.qid = c.qid),"
    " s2 AS (SELECT qid, vec_id, SUM(a * b) AS dot,"
    "  SUM(a * a) AS na, SUM(b * b) AS nb FROM ue GROUP BY qid, vec_id),"
    " exact AS (SELECT qid, vec_id,"
    f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS cos_r"
    "  FROM s2),"
    " ranked AS (SELECT qid, vec_id, cos_r, ROW_NUMBER() OVER"
    "  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn"
    "  FROM exact)"
    f" SELECT qid, vec_id, cos_r, rn FROM ranked WHERE rn <= {TOP_K}"
)


# ---------------------------------------------------------------------------
# Signed-random-projection (SRP) LSH ANN with multiprobe + exact re-rank
# ---------------------------------------------------------------------------

SRP_BITS = 8            # hyperplanes -> 2^8 buckets
SRP_PROBE_HAMMING = 2   # probe all buckets within this hamming radius
_SRP_A = 2654435761     # Knuth multiplicative constant
_SRP_STRIDE = 1000003   # bit-index stride into the hash domain
# XOR masks enumerating the hamming<=2 ball around a query's bucket:
# 1 (itself) + 8 (one flip) + 28 (two flips) = 37 probes of 256 buckets
SRP_MASKS = (
    [0]
    + [1 << b for b in range(SRP_BITS)]
    + [
        (1 << a) | (1 << b)
        for a in range(SRP_BITS)
        for b in range(a + 1, SRP_BITS)
    ]
)


def _srp_sign_case(b: int, one_based_i: str) -> str:
    """±1 hyperplane component for bit ``b``, dimension index expr
    (1-based) — a Knuth multiplicative hash of (bit, dim) taking a
    MIDDLE output bit (low bits of h are the input's low bits for an
    odd multiplier; parity alone would degenerate to a checkerboard).
    Pure integer arithmetic < 2^63, shared verbatim by both engines.
    """
    h = f"(({_SRP_A} * (cast({b * _SRP_STRIDE} as bigint) + {one_based_i}))" \
        f" % 4294967296)"
    return f"(case when {h} div 65536 % 2 = 0 then 1.0D else -1.0D end)"


def _srp_bucket_expr() -> str:
    """Spark expr: the SRP_BITS-bit bucket id of array column ``v``.

    Each bit is the SIGN of the projection onto a deterministic ±1
    hyperplane; each projection folds in DECIMAL(24,12) with per-term
    round-9 quantization (the ewma_anomaly device), so the sign — a
    hard threshold a float reorder could flip — is exact and
    order-independent on both engines."""
    bits = []
    for b in range(SRP_BITS):
        dot = (
            "aggregate(transform(v, (x, i) -> cast(round(x * "
            + _srp_sign_case(b, "(i + 1)")
            + ", 9) as decimal(24,12))), cast(0 as decimal(24,12)),"
            " (acc, t) -> cast(acc + t as decimal(24,12)))"
        )
        bits.append(f"(case when {dot} >= 0 then {1 << b} else 0 end)")
    return "cast(" + " + ".join(bits) + " as int)"


def srp_lsh_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """SRP-LSH approximate nearest neighbour: bucket the corpus by the
    signs of SRP_BITS deterministic random-hyperplane projections
    (Charikar's simhash for cosine), probe each query's hamming<=2
    bucket neighborhood, and exactly re-rank only the probed
    candidates.  The third ANN family beside IVF (data-dependent
    centroids, training pass) and SQ8 (full compressed scan): SRP
    needs NO training and its index is one integer per vector, so it
    is the incremental-ingest-friendly ANN — new vectors bucket
    independently, no retraining, no cell rebalance.

    Scale: the bucket table is (vec_id, bkt) — bytes per vector, built
    in one corpus pass with no shuffle wider than the groupBy on bkt;
    probing touches ~37/256 of buckets per query, so scored candidates
    are ~15% of the corpus per query (tunable by SRP_BITS/radius), and
    the exact re-rank reads full vectors ONLY for candidates.
    Multiprobe trades recall for probes explicitly — the knob a
    100 TB deployment tunes instead of rebuilding an index.

    Determinism: hyperplane components are integer-hash ±1; each
    projection folds in DECIMAL with round-9 terms, so bucket SIGNS
    (hard thresholds) cannot flip between engines; the re-rank is the
    ann_cosine contract (round-6 scores, vec_id tie-break).  Recall
    vs brute force is pinned in pytest, not by the oracle."""
    emb = _vectors(spark, sf_dir)
    sig = emb.select("vec_id", "v", F.expr(_srp_bucket_expr()).alias("bkt"))
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bkt"
    )
    masks = F.array(*[F.lit(m) for m in SRP_MASKS])
    probes = q.withColumn("m", F.explode(masks)).select(
        "qid", "qv", F.expr("bkt ^ m").alias("bkt")
    )
    # the probe table is queries x 37 masks — broadcast it; the corpus
    # signature table streams and never shuffles
    cand = F.broadcast(probes).join(sig, "bkt").select(
        "qid", "qv", "vec_id", "v"
    )
    scored = cand.select(
        "qid",
        "vec_id",
        F.round(
            _dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS
        ).alias("cos_r"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", "cos_r", F.col("rn").cast("bigint").alias("rn")
        )
    )


def _srp_sign_case_duck(one_based_i: str) -> str:
    """DuckDB twin of :func:`_srp_sign_case` with the bit index as the
    column ``b`` (the bits CTE) instead of a baked literal."""
    h = (
        f"(({_SRP_A} * (b * {_SRP_STRIDE} + {one_based_i}))"
        f" % 4294967296)"
    )
    return f"(CASE WHEN {h} // 65536 % 2 = 0 THEN 1.0 ELSE -1.0 END)"


def srp_lsh_sql() -> str:
    """Exact DuckDB oracle for srp_lsh_topk: identical DECIMAL-folded
    projections (order-independent, so the bucket signs agree
    bit-for-bit), identical mask set, identical re-rank contract."""
    masks = ", ".join(str(m) for m in SRP_MASKS)
    sign = _srp_sign_case_duck("i")
    return (
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings),"
        " u AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,"
        "  unnest(v) AS x FROM e),"
        f" bits AS (SELECT unnest(range({SRP_BITS})) AS b),"
        " dots AS (SELECT vec_id, b,"
        f"  SUM(CAST(ROUND(x * {sign}, 9) AS DECIMAL(24,12))) AS dotb"
        "  FROM u CROSS JOIN bits GROUP BY vec_id, b),"
        " sig AS (SELECT vec_id,"
        "  CAST(SUM(CASE WHEN dotb >= 0 THEN 1 << b ELSE 0 END) AS INT)"
        "   AS bkt FROM dots GROUP BY vec_id),"
        " q AS (SELECT s.vec_id AS qid, e.v AS qv, s.bkt"
        "  FROM sig s JOIN e ON e.vec_id = s.vec_id"
        f"  WHERE s.vec_id < {N_QUERIES}),"
        f" masks AS (SELECT unnest([{masks}]) AS m),"
        " probes AS (SELECT qid, qv, xor(bkt, CAST(m AS INT)) AS bkt"
        "  FROM q CROSS JOIN masks),"
        " cand AS (SELECT p.qid, p.qv, s.vec_id"
        "  FROM probes p JOIN sig s ON s.bkt = p.bkt),"
        " ue AS (SELECT c.qid, c.vec_id,"
        "  unnest(e.v) AS a, unnest(c.qv) AS b"
        "  FROM cand c JOIN e ON e.vec_id = c.vec_id),"
        " s2 AS (SELECT qid, vec_id, SUM(a * b) AS dot,"
        "  SUM(a * a) AS na, SUM(b * b) AS nb FROM ue GROUP BY qid, vec_id),"
        " scored AS (SELECT qid, vec_id,"
        f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS cos_r"
        "  FROM s2),"
        " ranked AS (SELECT qid, vec_id, cos_r, ROW_NUMBER() OVER"
        "  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn"
        "  FROM scored)"
        f" SELECT qid, vec_id, cos_r, rn FROM ranked WHERE rn <= {TOP_K}"
    )


# ---------------------------------------------------------------------------
# Embedding-space outlier screen (centroid cosine)
# ---------------------------------------------------------------------------

OUTLIER_Q = 0.05  # bottom-quantile cosine threshold


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space data-quality screen: flag vectors whose cosine
    to the global centroid falls in the bottom OUTLIER_Q quantile —
    the standard curation pass that surfaces corrupted encodes,
    wrong-modality rows, and mojibake clusters before they pollute
    dedup/ANN downstream (the MAD screen's analogue for vector
    columns).

    Plan: per-dimension DECIMAL mean aggregate (one row, broadcast —
    the embedding_kmeans device, exact and order-independent) → one
    map-side cosine fold per vector (no shuffle of the corpus) →
    exact-percentile threshold (1 row, broadcast) → flag.  At 100 TB
    the corpus is scanned twice and shuffles never; the percentile
    pass becomes approx_percentile with the winsorize certificate
    pattern.

    Determinism: the centroid's DECIMAL sums are exact; the cosine
    folds run in identical order on both engines (ann_ivf precedent);
    the threshold interpolates identical doubles.  Emits one row per
    vector: (vec_id, cos_c, is_outlier), cosine rounded to 6.
    """
    emb = _vectors(spark, sf_dir)
    cent = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.sum(F.col("x").cast("decimal(24,12)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "pos", (F.col("s").cast("double") / F.col("n")).alias("m")
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))),"
                " s -> s.m)"
            ).alias("cv")
        )
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.round(
            _dot("v", "cv") / (_norm("v") * _norm("cv")), ROUND_DIGITS
        ).alias("cos_c"),
    )
    thresh = scored.agg(
        F.expr(f"percentile(cos_c, {OUTLIER_Q}D)").alias("t")
    )
    return (
        scored.crossJoin(F.broadcast(thresh))
        .select(
            "vec_id",
            "cos_c",
            (F.col("cos_c") < F.col("t")).alias("is_outlier"),
        )
    )


EMBEDDING_OUTLIERS_SQL = (
    "WITH e AS (SELECT vec_id,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings),"
    " u AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS pos,"
    "  unnest(v) AS x FROM e),"
    " dims AS (SELECT pos,"
    "  CAST(SUM(CAST(x AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*) AS m"
    "  FROM u GROUP BY pos),"
    " cent AS (SELECT list(m ORDER BY pos) AS cv FROM dims),"
    " scored AS (SELECT vec_id,"
    f" ROUND({_sql_dot('e.v', 'c.cv')}"
    f"  / ({_sql_norm('e.v')} * {_sql_norm('c.cv')}), {ROUND_DIGITS})"
    "  AS cos_c"
    "  FROM e CROSS JOIN cent c),"
    f" th AS (SELECT quantile_cont(cos_c, {OUTLIER_Q}) AS t FROM scored)"
    " SELECT vec_id, cos_c, cos_c < t AS is_outlier"
    " FROM scored CROSS JOIN th"
)


# ---------------------------------------------------------------------------
# Product quantization (PQ) ADC ANN — the codebook rung of the ladder
# ---------------------------------------------------------------------------

PQ_M = 8                # subspaces: 64-dim embeddings -> 8 dims each
PQ_K_TARGET = 256       # fixed codebook size per subspace (FAISS default)
PQ_MOD_FLOOR = 7        # fixture floor: sf0.001's ~500 vectors still
                        # yield a ~72-codeword book (non-trivial recall)
PQ_CAND_MULT = 3        # quantized candidate pool = MULT * k per query


def ann_pq_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Product-quantization approximate nearest neighbour (Jégou et
    al., PAMI'11; FAISS's PQ index): split each vector into ``PQ_M``
    subspaces, encode every subvector as its nearest codeword from a
    per-subspace codebook, score queries against the DEQUANTIZED
    (codeword-concatenated) corpus, then exactly re-rank the
    ``PQ_CAND_MULT*k`` survivors.  Completes the quantization ladder
    beside brute force (ann_cosine), cell pruning (IVF), scalar
    quantization (SQ8), and hyperplane hashing (SRP).

    Why it scales: a PQ code is M small integers per vector (M bytes
    at 256-codeword books) — a 32x smaller scan than float32 at M=8,
    D=64, and in production the per-subspace score table per query is
    M×K lookups so candidate scoring never touches floats at all;
    here candidate scoring stays on the dequantized codewords and the
    exact re-rank touches only candidate rows.

    Determinism: the codebook is the fixed strided subsample of the
    corpus's own subvectors — vec_id % pqmod == 0 where pqmod =
    greatest(PQ_MOD_FLOOR, ceil(N / PQ_K_TARGET)), so the book holds a
    CONSTANT ~PQ_K_TARGET codewords per subspace at any corpus size
    (the IVF centroid convention, no iterative training to pin) and
    encoding stays O(N * M * K) — linear in N, unlike a fixed small
    modulus whose book grows with the corpus.  The encode itself is an
    Arrow-batched numpy kernel (mapInPandas): distances accumulate
    with an explicit per-dimension loop — ``acc = acc + d*d`` one
    dimension at a time — which reproduces the strict left fold
    DuckDB's list_reduce runs bit-for-bit (each elementwise IEEE op is
    exactly rounded; only accumulation ORDER can differ, and the loop
    pins it), and np.argmin's first-minimum rule over the cid-sorted
    book matches DuckDB's min(struct(d2, cid, cv)) tie-break exactly.
    The tiny ~M*K-row codebook (bounded: <= PQ_M * (PQ_K_TARGET +
    PQ_MOD_FLOOR) rows at ANY corpus size) is collected and broadcast
    — the standard model-broadcast pattern, same eager-build precedent
    as ann_ivf_indexed.  Scores round to 6 digits before ranking, ties
    break by vec_id.  The full pipeline (codebook, encode, ADC probe,
    re-rank) is exactly oracle-checkable even though the RETRIEVAL is
    approximate; recall vs brute force is pinned in pytest (the
    SQ8/SRP contract)."""
    emb = _vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    books = _pq_codebook(spark, emb)
    code = _pq_encode(spark, emb, books)
    deq = _pq_dequantize(code)
    return _pq_rank(emb, q, deq, k)


def _pq_sub_expr():
    return F.expr(
        f"transform(sequence(0, {PQ_M - 1}),"
        f" m -> slice(v, m * (size(v) div {PQ_M}) + 1,"
        f" size(v) div {PQ_M}))"
    )


def _pq_codebook(spark: SparkSession, emb: DataFrame) -> dict[int, tuple]:
    """Deterministic fixed-K PQ codebook: the strided subsample of the
    corpus's own subvectors (see ann_pq_topk's docstring).  Returns
    {m: (cids sorted ascending, (K, L) float64 codewords)} — bounded
    at <= M*(K_TARGET+floor) rows at ANY corpus size, so the collect
    is a model build, not a data move."""
    import math

    import numpy as np

    # fixed-K codebook stride, computed exactly as the oracle does
    # (double division + ceil on exact small integers)
    n_vec = emb.count()
    pqmod = max(PQ_MOD_FLOOR, math.ceil(n_vec / float(PQ_K_TARGET)))
    # codebook: filter the N-row vector table BEFORE exploding, so the
    # modulus touches N rows and the explode touches only ~K of them
    cents = (
        emb.filter(F.col("vec_id") % pqmod == 0)
        .select("vec_id", F.posexplode(_pq_sub_expr()).alias("m", "sv"))
        .collect()
    )
    books: dict[int, tuple] = {}
    for m in range(PQ_M):
        rows = sorted(
            (r.vec_id, r.sv) for r in cents if r.m == m
        )  # cid-ascending: np.argmin's first-min = lowest cid
        books[m] = (
            np.array([c for c, _ in rows], dtype=np.int64),
            np.array([sv for _, sv in rows], dtype=np.float64),
        )
    return books


def _pq_encode(
    spark: SparkSession, emb: DataFrame, books: dict[int, tuple]
) -> DataFrame:
    """Assign every (vec_id, m) subvector its nearest codeword; emits
    (vec_id, m, cid, cv) — the code id for the persisted index, the
    codeword floats for the in-memory dequantize.  Arrow-batched numpy
    kernel; the strict per-dimension left fold and the first-minimum
    argmin over the cid-sorted book reproduce DuckDB's list_reduce +
    min(struct) bit-for-bit (see ann_pq_topk)."""
    import numpy as np
    import pandas as pd

    bc_books = spark.sparkContext.broadcast(books)

    def _encode(batches):
        for pdf in batches:
            out_cv = [None] * len(pdf)
            out_cid = np.zeros(len(pdf), dtype=np.int64)
            mvals = pdf["m"].to_numpy()
            for m in np.unique(mvals):
                cids, cb = bc_books.value[int(m)]  # (K,), (K, L) float64
                idx = np.nonzero(mvals == m)[0]
                sv = np.array(list(pdf["sv"].iloc[idx]), dtype=np.float64)
                # strict left fold, one dimension at a time: matches
                # aggregate/list_reduce accumulation order bit-for-bit
                acc = np.zeros((sv.shape[0], cb.shape[0]))
                for i in range(sv.shape[1]):
                    d = sv[:, i : i + 1] - cb[None, :, i][0]
                    acc = acc + d * d
                best = np.argmin(acc, axis=1)
                for row_pos, b in zip(idx, best):
                    out_cv[row_pos] = cb[b].tolist()
                    out_cid[row_pos] = cids[b]
            # all columns positional: pdf["vec_id"] carries the
            # incoming index, and pandas would realign it against the
            # default-indexed frame while mvals/out_cv stay positional,
            # silently mis-assigning codes on a non-default index
            # (ADVICE r08 #2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "m": mvals,
                    "cid": out_cid,
                    "cv": out_cv,
                }
            )

    # subvectors: (vec_id, m, sv) with L = D div PQ_M dims per
    # subspace.  Repartition spreads the Arrow batches: a small corpus
    # parquet reads as ONE split, which would pin the whole encode to
    # one task; the shuffle moves only N*M subvector rows.
    sub = emb.select(
        "vec_id", F.posexplode(_pq_sub_expr()).alias("m", "sv")
    ).repartition("vec_id", "m")
    return sub.mapInPandas(
        _encode, schema="vec_id bigint, m int, cid bigint, cv array<double>"
    )


def _pq_dequantize(code: DataFrame) -> DataFrame:
    """(vec_id, m, cv) -> (vec_id, vq): chosen codewords concatenated
    in subspace order."""
    return code.groupBy("vec_id").agg(
        F.expr(
            "flatten(transform(array_sort(collect_list(struct(m, cv))),"
            " s -> s.cv))"
        ).alias("vq")
    )


def _pq_rank(emb: DataFrame, q: DataFrame, deq: DataFrame, k: int) -> DataFrame:
    """Shared PQ tail: ADC scoring against the dequantized corpus,
    PQ_CAND_MULT*k candidate cut, exact re-rank on original vectors —
    identical for the in-memory and persisted-index forms, which is
    what lets ann_pq_indexed share ann_pq_sql()."""
    qscored = deq.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        F.round(
            _dot("vq", "qv") / (_norm("vq") * _norm("qv")), ROUND_DIGITS
        ).alias("qcos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qcos"), F.asc("vec_id"))
    cand = (
        qscored.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= PQ_CAND_MULT * k)
        .select("qid", "vec_id")
    )
    exact = (
        cand.join(emb, "vec_id")
        .join(q, "qid")
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS
            ).alias("cos_r"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", "cos_r", F.col("rn").cast("bigint").alias("rn")
        )
    )


# --- persisted PQ index (codebook + codes as bucketed tables) ---------------

PQ_INDEX_BUCKETS = 16
_PQ_INDEX_READY: set[tuple[str, str]] = set()
_PQ_INDEX_SIDECARS: set[str] = set()


def _pq_index_tables(sf_dir: str) -> dict[str, str]:
    from smile_spark.sources.bucketed import bucket_table_name

    return {
        part: bucket_table_name(f"pq_idx_{part}", sf_dir)
        for part in ("codes", "book")
    }


def clear_pq_index_cache() -> None:
    """Forget the per-process index memo AND drop the adoption
    sidecars this process wrote, so the next probe (or the bench's
    cold ``pq_index_build`` loop) reruns the full codebook + encode +
    write path.  The build overwrites the tables in place — nothing
    to unpersist."""
    from smile_spark.sources.bucketed import remove_sidecar_file

    _PQ_INDEX_READY.clear()
    for path in list(_PQ_INDEX_SIDECARS):
        remove_sidecar_file(path)
        _PQ_INDEX_SIDECARS.discard(path)


def pq_index_build(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Materialize the PQ index once per corpus snapshot (VERDICT r12
    next-round #3): the deterministic codebook (m, cid, cv) and the
    corpus CODES (vec_id, m, cid) — M small ints per vector, the
    32x-compressed artifact real PQ systems store — as two bucketed
    tables.  Returns the table-name map.

    This kills the two per-run costs of ann_pq_topk at 100 TB: the
    codebook collect and, far worse, the O(N*M*K) re-encode of the
    full corpus on EVERY query run.  After this build a search run
    reads the code table (bucketed by vec_id) and reconstructs
    codeword floats with a broadcast-codebook lookup — no distance
    computation against the book at all.  Sidecar adoption as in
    setsim_index_build / dhash_index_build; cold path behind
    :func:`clear_pq_index_cache` for bench pricing.
    """
    from smile_spark.sources.bucketed import (
        drop_bucketed_table,
        sidecar_adoptable,
        write_bucketed,
        write_sidecar,
    )

    tables = _pq_index_tables(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PQ_INDEX_READY:
        return tables
    emb = _vectors(spark, sf_dir)
    n_vec = emb.count()
    expected = {
        "n_vec": n_vec,
        "m": PQ_M,
        "k_target": PQ_K_TARGET,
        "mod_floor": PQ_MOD_FLOOR,
        "n_buckets": PQ_INDEX_BUCKETS,
        "sf_dir": sf_dir,
        "tables": sorted(tables.values()),
    }
    sidecar_name = tables["codes"]
    if sidecar_adoptable(
        spark, sidecar_name, expected, list(tables.values())
    ):
        # track the sidecar whether built OR adopted (the IVF
        # contract, ADVICE r13 #2) so clear_pq_index_cache always
        # restores the cold codebook+encode+write path
        from smile_spark.sources.bucketed import sidecar_path

        _PQ_INDEX_SIDECARS.add(sidecar_path(spark, sidecar_name))
        _PQ_INDEX_READY.add(key)
        return tables
    books = _pq_codebook(spark, emb)
    code = _pq_encode(spark, emb, books)
    for tbl in tables.values():
        drop_bucketed_table(spark, tbl)
    write_bucketed(
        code.select("vec_id", "m", "cid"),
        tables["codes"],
        "vec_id",
        n_buckets=PQ_INDEX_BUCKETS,
        sort_cols=["vec_id", "m"],
    )
    book_rows = [
        (m, int(cid), [float(x) for x in cv])
        for m, (cids, cb) in books.items()
        for cid, cv in zip(cids, cb)
    ]
    book = spark.createDataFrame(
        book_rows, schema="m int, cid bigint, cv array<double>"
    )
    write_bucketed(
        book, tables["book"], "cid", n_buckets=4, sort_cols=["cid", "m"]
    )
    _PQ_INDEX_SIDECARS.add(write_sidecar(spark, sidecar_name, expected))
    _PQ_INDEX_READY.add(key)
    return tables


def ann_pq_indexed(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """The production PQ search path, driver-registered: probe the
    PERSISTED code + codebook tables from :func:`pq_index_build` —
    no codebook collect, no corpus re-encode per run (VERDICT r12
    What's-missing #2 closed, the ``ann_ivf_indexed`` persist-and-
    probe contract applied to PQ).

    The probe reconstructs each vector's dequantized form by joining
    the code table (bucketed by vec_id — the reconstruction groupBy
    reads pre-partitioned data with zero exchange) against the
    BROADCAST <= M*(K_TARGET+floor)-row codebook: a lookup, never a
    distance computation.  Scoring, candidate cut, and exact re-rank
    are the shared :func:`_pq_rank` tail, byte-identical to
    ann_pq_topk — which is why this entry shares ``ann_pq_sql()``
    (result-identity is also pinned by an agreement test).

    At 100 TB: the index build is one encode pass per snapshot; every
    search after it reads M ints per vector plus the candidate rows'
    floats for the re-rank."""
    from smile_spark.sources.bucketed import read_bucketed

    tables = pq_index_build(spark, sf_dir)
    emb = _vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    codes = read_bucketed(spark, tables["codes"])
    book = read_bucketed(spark, tables["book"])
    deq = _pq_dequantize(
        codes.join(F.broadcast(book), ["m", "cid"]).select(
            "vec_id", "m", "cv"
        )
    )
    return _pq_rank(emb, q, deq, k)


def ann_pq_sql() -> str:
    """Exact DuckDB oracle for ann_pq_topk: fixed-K strided codebook
    (pqmod = greatest(floor, ceil(N/K))), min-struct L2 assignment
    (bit-identical to Spark's aggregate fold and struct-min ordering),
    cid/vec_id tie-breaks, 6-digit score rounding."""
    sub_l = f"(len(v) // {PQ_M})"
    d2 = (
        "list_reduce(list_transform(generate_series(1, len(s.sv)),"
        " i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),"
        " (x, y) -> x + y)"
    )
    return (
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings),"
        f" q AS (SELECT vec_id AS qid, v AS qv FROM e"
        f"  WHERE vec_id < {N_QUERIES}),"
        f" modv AS (SELECT GREATEST({PQ_MOD_FLOOR}, CAST(CEIL("
        f"  COUNT(*) / {float(PQ_K_TARGET)}) AS BIGINT)) AS pqmod"
        "  FROM e),"
        " sub AS (SELECT vec_id, t.m,"
        f"  v[t.m * {sub_l} + 1 : (t.m + 1) * {sub_l}] AS sv"
        f"  FROM e CROSS JOIN generate_series(0, {PQ_M - 1}) t(m)),"
        " cents AS (SELECT m AS cm, vec_id AS cid, sv AS cv"
        "  FROM sub, modv WHERE vec_id % pqmod = 0),"
        " code AS (SELECT vec_id, m,"
        "  (min(struct_pack(d2 := d2, cid := cid, cv := cv))).cv AS cv"
        "  FROM (SELECT s.vec_id, s.m, c.cid, c.cv,"
        f"   {d2} AS d2 FROM sub s JOIN cents c ON c.cm = s.m)"
        "  GROUP BY vec_id, m),"
        " deq AS (SELECT vec_id, flatten(list(cv ORDER BY m)) AS vq"
        "  FROM code GROUP BY vec_id),"
        " uq AS (SELECT qid, deq.vec_id AS vec_id,"
        "  unnest(deq.vq) AS a, unnest(q.qv) AS b FROM deq, q),"
        " s AS (SELECT qid, vec_id, SUM(a * b) AS dot,"
        "  SUM(a * a) AS na, SUM(b * b) AS nb FROM uq GROUP BY qid, vec_id),"
        " qscored AS (SELECT qid, vec_id,"
        f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS qcos"
        "  FROM s),"
        " cand AS (SELECT qid, vec_id FROM ("
        "  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid"
        "   ORDER BY qcos DESC, vec_id ASC) AS crn FROM qscored)"
        f"  WHERE crn <= {PQ_CAND_MULT * TOP_K}),"
        " ue AS (SELECT c.qid, c.vec_id,"
        "  unnest(e.v) AS a, unnest(q.qv) AS b"
        "  FROM cand c JOIN e ON e.vec_id = c.vec_id"
        "  JOIN q ON q.qid = c.qid),"
        " s2 AS (SELECT qid, vec_id, SUM(a * b) AS dot,"
        "  SUM(a * a) AS na, SUM(b * b) AS nb FROM ue GROUP BY qid, vec_id),"
        " exact AS (SELECT qid, vec_id,"
        f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS cos_r"
        "  FROM s2),"
        " ranked AS (SELECT qid, vec_id, cos_r, ROW_NUMBER() OVER"
        "  (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn"
        "  FROM exact)"
        f" SELECT qid, vec_id, cos_r, rn FROM ranked WHERE rn <= {TOP_K}"
    )


# ---------------------------------------------------------------------------
# Supervised embedding-space evaluations
# ---------------------------------------------------------------------------


def nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label nearest-centroid classification accuracy over the
    labeled embedding table — the standard "is the embedding space
    class-separable?" screen a training-data pipeline runs before
    trusting vectors for curation decisions (a Rocchio/nearest-mean
    classifier evaluated on its own training labels: high accuracy =
    tight, well-separated label clusters; low accuracy = labels and
    geometry disagree, so embedding-driven filtering would be noise).

    Plan: one per-(label, dimension) DECIMAL mean aggregate (tiny: 10
    labels x 64 dims), the centroid set broadcast against the corpus
    for one map-side L2 fold per (vector, centroid), a per-vector
    rank-1 window, then a per-label accuracy aggregate.  At 100 TB the
    corpus is scanned twice (centroid pass + assign pass) and never
    shuffled beyond label-keyed counters — the embedding_outliers
    shape with a labeled centroid set.

    Determinism: centroid means come from exact DECIMAL(24,12) sums on
    both engines; the L2 distance is the same strict left fold DuckDB
    runs via list_reduce; argmin ties break on the smaller label;
    accuracy rounds to 6.  Emits (label, n_vectors, n_correct,
    accuracy)."""
    ev = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    cents = (
        ev.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("x").cast("decimal(24,12)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("label").alias("clabel"),
            "pos",
            (F.col("s").cast("double") / F.col("n")).alias("m"),
        )
        .groupBy("clabel")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))),"
                " s -> s.m)"
            ).alias("cv")
        )
    )
    d2 = F.expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (a, z) -> a + z)"
    )
    scored = ev.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "clabel", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("clabel"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", F.col("clabel").alias("pred"))
    )
    return pred.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum((F.col("pred") == F.col("label")).cast("bigint")).alias(
            "n_correct"
        ),
        F.round(
            F.sum((F.col("pred") == F.col("label")).cast("bigint")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            ROUND_DIGITS,
        ).alias("accuracy"),
    )


NEAREST_CENTROID_EVAL_SQL = (
    "WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings),"
    " u AS (SELECT label, unnest(generate_series(1, len(v))) AS pos,"
    "  unnest(v) AS x FROM e),"
    " dims AS (SELECT label AS clabel, pos,"
    "  CAST(SUM(CAST(x AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*) AS m"
    "  FROM u GROUP BY label, pos),"
    " cents AS (SELECT clabel, list(m ORDER BY pos) AS cv FROM dims"
    "  GROUP BY clabel),"
    " d AS (SELECT e.vec_id, e.label, c.clabel,"
    "  list_reduce(list_transform(generate_series(1, len(e.v)),"
    "   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])),"
    "   (x, y) -> x + y) AS d2"
    "  FROM e CROSS JOIN cents c),"
    " a AS (SELECT vec_id, label, clabel, ROW_NUMBER() OVER"
    "  (PARTITION BY vec_id ORDER BY d2 ASC, clabel ASC) AS rn FROM d),"
    " p AS (SELECT label, clabel AS pred FROM a WHERE rn = 1)"
    " SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,"
    " CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_correct,"
    " ROUND(CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS DOUBLE)"
    f"  / COUNT(*), {ROUND_DIGITS}) AS accuracy"
    " FROM p GROUP BY label"
)


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k certificate for the hyperplane-hash ANN rung
    (:func:`srp_lsh_topk`) against the exact brute-force top-k — the
    eval harness a production ANN rollout runs before trusting a
    probe-limited index (dedup_eval's analogue for similarity search).
    A recall collapse here is the canary for a bad mask set / bucket
    skew long before downstream curation quality moves.

    Emits (qid, n_exact, n_hit, recall): n_exact = k, n_hit = how many
    of the true top-k the SRP probe sequence recovered, recall rounded
    to 6.  Certificate-priced: it runs BOTH the approximate and the
    exact scorer (see SCALING.md's pricing table); production runs
    srp_lsh_topk alone.

    Scale: the exact side is the one-pass broadcast-query brute-force
    scan; the approximate side touches only probed buckets; the
    comparison is a k-row-per-query semi-join."""
    exact = ann_cosine_topk(spark, sf_dir).select("qid", "vec_id")
    approx = srp_lsh_topk(spark, sf_dir).select(
        F.col("qid").alias("aqid"), F.col("vec_id").alias("avid")
    )
    hit = exact.join(
        approx,
        (F.col("qid") == F.col("aqid")) & (F.col("vec_id") == F.col("avid")),
        "left",
    )
    return hit.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.col("avid").isNotNull().cast("bigint")).alias("n_hit"),
        F.round(
            F.sum(F.col("avid").isNotNull().cast("bigint")).cast("double")
            / F.count(F.lit(1)),
            ROUND_DIGITS,
        ).alias("recall"),
    )


def ann_recall_eval_sql() -> str:
    """Oracle: both sides recomputed exactly — the brute-force SQL and
    the srp SQL as nested-CTE subqueries, then the identical per-query
    hit aggregate."""
    return (
        f"WITH ex AS (SELECT qid, vec_id FROM ({ANN_COSINE_SQL})),"
        f" ap AS (SELECT qid AS aqid, vec_id AS avid FROM ({srp_lsh_sql()}))"
        " SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_exact,"
        " CAST(SUM(CASE WHEN avid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
        "  AS n_hit,"
        " ROUND(CAST(SUM(CASE WHEN avid IS NOT NULL THEN 1 ELSE 0 END)"
        f"  AS DOUBLE) / COUNT(*), {ROUND_DIGITS}) AS recall"
        " FROM ex LEFT JOIN ap ON ap.aqid = ex.qid AND ap.avid = ex.vec_id"
        " GROUP BY qid"
    )


def hard_negative_mining(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Top-k HARD NEGATIVES per query: the highest-cosine corpus
    vectors whose label DIFFERS from the query's — the mining step
    that builds contrastive training batches for embedding models
    (random negatives are too easy; the near-boundary ones carry the
    gradient signal).  The labeled twin of ann_cosine_topk.

    Plan: broadcast the 3-vector query set (with labels) against the
    corpus, one map-side cosine fold per (vector, query) with the
    label-mismatch filter applied BEFORE ranking, then a per-query
    rank-1..k window — the corpus never shuffles; only scored
    candidate rows move.  At 100 TB the scoring pass rides any ANN
    rung (IVF cells / SRP buckets) unchanged — mine negatives among
    the probed candidates instead of the full corpus.

    Determinism: the same strict-fold cosine as the ANN ladder,
    ROUND(...,6) before ranking, ties break by vec_id.  Emits
    (qid, q_label, vec_id, neg_label, cos_r, rn)."""
    ev = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    q = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    scored = (
        ev.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "qid",
            "q_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round(
                _dot("v", "qv") / (_norm("v") * _norm("qv")), ROUND_DIGITS
            ).alias("cos_r"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            "q_label",
            "vec_id",
            "neg_label",
            "cos_r",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


HARD_NEGATIVE_MINING_SQL = (
    "WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,"
    " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings),"
    " q AS (SELECT vec_id AS qid, label AS q_label, v AS qv FROM e"
    f"  WHERE vec_id < {N_QUERIES}),"
    " u AS (SELECT qid, q_label, e.vec_id, e.label AS neg_label,"
    "  unnest(e.v) AS a, unnest(q.qv) AS b"
    "  FROM e, q WHERE e.label <> q.q_label),"
    " s AS (SELECT qid, q_label, vec_id, neg_label, SUM(a * b) AS dot,"
    "  SUM(a * a) AS na, SUM(b * b) AS nb"
    "  FROM u GROUP BY qid, q_label, vec_id, neg_label),"
    " scored AS (SELECT qid, q_label, vec_id, neg_label,"
    f"  ROUND(dot / (sqrt(na) * sqrt(nb)), {ROUND_DIGITS}) AS cos_r"
    "  FROM s),"
    " ranked AS (SELECT qid, q_label, vec_id, neg_label, cos_r,"
    "  ROW_NUMBER() OVER (PARTITION BY qid"
    "   ORDER BY cos_r DESC, vec_id ASC) AS rn FROM scored)"
    " SELECT qid, q_label, vec_id, neg_label, cos_r, rn FROM ranked"
    f" WHERE rn <= {TOP_K}"
)
