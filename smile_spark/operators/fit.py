"""Grouped model fitting via applyInPandas — the batch grouped-map
Pandas-UDF shape (north-star extension; the reference's closest
analogue is the ``Table::foreach`` function-pointer hook,
/root/reference/src/data/table.h:42).

``grouped_ols_fit`` fits y = a·x + b per group (extendedprice on
quantity per returnflag).  This is the canonical "custom per-group
computation Spark's built-ins can't express" escape hatch — but
deliberately chosen so a closed-form SQL oracle EXISTS: the normal
equations need only the moments (n, Σx, Σy, Σxx, Σxy).

Cross-engine determinism: float sums are order-dependent, so inside
the UDF the moments accumulate as EXACT PYTHON INTEGERS (the 2-decimal
measures scale by 100 losslessly; numpy int64 products sum into
arbitrary-precision ints), and the closed forms evaluate once in
double — the identical expression the DuckDB oracle computes from
DECIMAL moments.  Bit-equal results from a Python UDF, independent of
partitioning.

Scale shape: one shuffle on the group key into Arrow batches; state
per group is five integers.  At 100 TB with millions of groups this
is the standard per-entity model-fit pattern (per-user forecasters,
per-item demand curves); for FEW groups prefer the pure-SQL moment
aggregation (zscore_normalize's shape) — the UDF exists for when the
per-group code is genuinely not expressible as SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OLS_SCALE = 100  # 2-decimal measures → exact integers
OLS_ROUND = 6


def _round_half_up(v: float | None) -> float | None:
    """HALF_UP rounding to OLS_ROUND digits, identical to F.round and
    DuckDB ROUND.  Python's built-in round() is half-to-even and can
    differ on exact .5 boundaries; Decimal(repr(v)) mirrors the JVM's
    BigDecimal.valueOf(double) shortest-representation semantics."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if v is None or math.isnan(v) or math.isinf(v):
        return v
    return float(
        Decimal(repr(v)).quantize(
            Decimal(1).scaleb(-OLS_ROUND), rounding=ROUND_HALF_UP
        )
    )


def grouped_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of l_extendedprice on l_quantity via
    applyInPandas with exact integer moment accumulation."""
    import pandas as pd

    from smile_spark.tables import table

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # scale to exact ints; all moment arithmetic stays integral.
        # numpy int64 keeps it vectorized AND exact: per-row products
        # are ≤ ~5e10 and the fixture group sums stay far below 2^63;
        # the assert guards the day a group outgrows that (then: chunk
        # and accumulate into Python ints)
        import numpy as np

        x = (pdf["l_quantity"] * OLS_SCALE).round().astype("int64").to_numpy()
        y = (
            (pdf["l_extendedprice"] * OLS_SCALE)
            .round()
            .astype("int64")
            .to_numpy()
        )
        n = int(len(pdf))
        if n:
            xm = int(np.abs(x).max())
            ym = int(np.abs(y).max())
            assert n * xm * max(xm, ym) < 2**62, "chunk the moment sums"
        sx = int(x.sum())
        sy = int(y.sum())
        sxx = int((x * x).sum())
        sxy = int((x * y).sum())
        # closed forms in double, identical expression AND rounding
        # order to the oracle: each exact integer converts to double
        # BEFORE the division (as the SQL's CAST(... AS DOUBLE) does —
        # Python's exact int/int true-division rounds once and could
        # differ in the last bit); scale cancels in slope.  A constant-x
        # group has zero variance → NULL slope/intercept, matching the
        # oracle's NULLIF'd denominator (Python would instead raise
        # ZeroDivisionError).
        denom = float(n * sxx - sx * sx)
        if denom == 0.0:
            slope = intercept = None
        else:
            slope = float(n * sxy - sx * sy) / denom
            intercept = (float(sy) - slope * float(sx)) / n / OLS_SCALE
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [n],
                "slope": [_round_half_up(slope)],
                "intercept": [_round_half_up(intercept)],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        fit,
        schema="l_returnflag string, n bigint, slope double,"
        " intercept double",
    )


GROUPED_OLS_FIT_SQL = (
    # identical integer moments via DECIMAL (exact), identical closed
    # forms in double — ROUND only as the final presentation step
    "WITH m AS (SELECT l_returnflag,"
    " COUNT(*) AS n,"
    f" CAST(SUM(CAST(l_quantity * {OLS_SCALE} AS BIGINT)) AS HUGEINT)"
    "  AS sx,"
    f" CAST(SUM(CAST(l_extendedprice * {OLS_SCALE} AS BIGINT)) AS HUGEINT)"
    "  AS sy,"
    f" SUM(CAST(CAST(l_quantity * {OLS_SCALE} AS BIGINT)"
    f"  * CAST(l_quantity * {OLS_SCALE} AS BIGINT) AS HUGEINT)) AS sxx,"
    f" SUM(CAST(CAST(l_quantity * {OLS_SCALE} AS BIGINT)"
    f"  * CAST(l_extendedprice * {OLS_SCALE} AS BIGINT) AS HUGEINT)) AS sxy"
    " FROM lineitem GROUP BY l_returnflag),"
    " f AS (SELECT l_returnflag, n,"
    "  CAST(n * sxy - sx * sy AS DOUBLE)"
    # NULLIF: a constant-x group yields NULL slope/intercept on both
    # engines (the UDF guards the same zero-variance denominator)
    "   / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0) AS slope,"
    "  sx, sy FROM m)"
    " SELECT l_returnflag, CAST(n AS BIGINT) AS n,"
    " ROUND(slope, 6) AS slope,"
    " ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n"
    f"  / {OLS_SCALE}, 6) AS intercept"
    " FROM f"
)


# ---------------------------------------------------------------------------
# Top principal component via fixed power iterations
# ---------------------------------------------------------------------------

PCA_ITERS = 3
PCA_MEAN_DEC = "decimal(27,18)"   # exact per-dimension mean accumulation
PCA_W_DEC = "decimal(30,12)"      # exact accumulation of x_c * s terms


def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (mean-centered) embedding
    corpus after PCA_ITERS fixed power iterations from e1 — the
    embedding-space drift/structure probe a training-data pipeline
    runs per corpus snapshot (a dominant direction appearing between
    snapshots usually means a new template or a collapsed encoder,
    the same screen nearest_centroid_eval runs against labels but
    unsupervised).

    The iterative-ML-on-DataFrames shape of embedding_kmeans, applied
    to v_{t+1} = normalize(Sum_i x_i (x_i . v_t)) with x_i = v_i - mu:
    per round ONE broadcast of the 1-row (mu, v_t) state, a map-side
    fold per vector for the projection s_i, and a (dimension)-keyed
    DECIMAL partial-aggregate shuffle whose volume is dim x
    partitions, independent of corpus size.  The driver loop ships
    only the 64-double state — never data — and the result is defined
    as "PCA_ITERS iterations from e1" (fixed, deterministic), not as
    a converged eigenvector.

    Determinism vs DuckDB: means and the per-dimension w sums
    accumulate in DECIMAL (exact, order-free); every dot product and
    the norm are strict left folds; the division by the norm happens
    once per element.  Emits (pos, loading) per dimension, rounded 6.
    """
    from smile_spark.operators.similarity import _vectors

    emb = _vectors(spark, sf_dir)
    mu = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            (
                F.sum(F.col("x").cast(PCA_MEAN_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))),"
                " s -> s.m)"
            ).alias("mu")
        )
    )
    cur = mu.select(
        "mu",
        F.expr(
            "transform(mu, (x, i) -> CASE WHEN i = 0 THEN"
            " CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
        ).alias("vt"),
    )
    for _ in range(PCA_ITERS):
        scored = emb.crossJoin(F.broadcast(cur)).select(
            "v",
            "mu",
            F.expr(
                "aggregate(zip_with(zip_with(v, mu, (a, b) -> a - b),"
                " vt, (x, y) -> x * y), cast(0 as double),"
                " (acc, z) -> acc + z)"
            ).alias("s"),
        )
        warr = (
            scored.select(
                F.posexplode(
                    F.expr("zip_with(v, mu, (a, b) -> a - b)")
                ).alias("pos", "xc"),
                "s",
            )
            .groupBy("pos")
            .agg(
                F.sum((F.col("xc") * F.col("s")).cast(PCA_W_DEC))
                .cast("double")
                .alias("w")
            )
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, w))),"
                    " s -> s.w)"
                ).alias("w")
            )
        )
        nw = warr.select(
            "w",
            F.expr(
                "sqrt(aggregate(transform(w, y -> y * y),"
                " cast(0 as double), (a, z) -> a + z))"
            ).alias("nrm"),
        )
        cur = nw.crossJoin(F.broadcast(mu)).select(
            "mu", F.expr("transform(w, y -> y / nrm)").alias("vt")
        )
    return cur.select(F.posexplode("vt").alias("pos", "l")).select(
        F.col("pos").cast("bigint").alias("pos"),
        F.round("l", 6).alias("loading"),
    )


def pca_power_iteration_sql() -> str:
    """Exact DuckDB oracle: the identical PCA_ITERS iterations
    unrolled as CTEs, same DECIMAL accumulations and fold orders."""
    s_expr = (
        "list_reduce(list_transform(generate_series(1, len(e.v)),"
        " i -> (e.v[i] - m.mu[i]) * m.vt[i]), (a, b) -> a + b)"
    )
    parts = [
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, t -> CAST(t AS DOUBLE)) AS v"
        " FROM embeddings),"
        " dims AS (SELECT vec_id, i - 1 AS pos, v[i] AS x FROM e,"
        "  unnest(generate_series(1, len(v))) g(i)),"
        " mu0 AS (SELECT pos,"
        f"  CAST(SUM(CAST(x AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*)"
        "   AS m FROM dims GROUP BY pos),"
        " muarr AS (SELECT list(m ORDER BY pos) AS mu FROM mu0),"
        " it0 AS (SELECT mu, list_transform(generate_series(1, len(mu)),"
        "  i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)"
        "   ELSE CAST(0.0 AS DOUBLE) END) AS vt FROM muarr)"
    ]
    for k in range(1, PCA_ITERS + 1):
        parts.append(
            f", s{k} AS (SELECT e.vec_id, e.v, m.mu, {s_expr} AS s"
            f"  FROM e, it{k - 1} m)"
            f", wd{k} AS (SELECT i - 1 AS pos,"
            f"  (v[i] - mu[i]) * s AS t FROM s{k},"
            "  unnest(generate_series(1, len(v))) g(i))"
            f", w0{k} AS (SELECT pos,"
            "  CAST(SUM(CAST(t AS DECIMAL(30,12))) AS DOUBLE) AS w"
            f"  FROM wd{k} GROUP BY pos)"
            f", wa{k} AS (SELECT list(w ORDER BY pos) AS w FROM w0{k})"
            f", it{k} AS (SELECT m.mu, list_transform(a.w,"
            "  y -> y / sqrt(list_reduce(list_transform(a.w,"
            "  y2 -> y2 * y2), (p, q) -> p + q))) AS vt"
            f"  FROM wa{k} a, muarr m)"
        )
    parts.append(
        " SELECT CAST(i - 1 AS BIGINT) AS pos, ROUND(vt[i], 6)"
        f" AS loading FROM it{PCA_ITERS},"
        " unnest(generate_series(1, len(vt))) g(i)"
    )
    return "".join(parts)
