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
