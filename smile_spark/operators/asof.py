"""As-of (point-in-time) join — a custom operator Spark lacks.

For each left row (key, t), find the single right row with the same
key and the greatest right-time ≤ t.  The naive formulations are a
per-row correlated subquery (non-relational) or a range join that
explodes to |left|×|orders-per-key| before picking the max
(quadratic in hot keys).  The scalable DataFrame composition is the
union-sort pattern:

1. align both sides into one schema with an ``is_left`` marker,
2. ONE shuffle on the key,
3. per key, sort by (time, is_left) — right rows first on ties so
   "at-or-before" is inclusive,
4. ``last(value, ignorenulls=True)`` over the running window carries
   the latest right values forward onto each left row,
5. keep left rows.

Cost: one exchange + one per-partition sort, identical to a window
aggregate — the same plan at 60k rows and at 100 TB (hot keys split
by AQE or pre-salted).  The oracle is DuckDB's native ASOF JOIN, so
the composition is checked against a first-class implementation.

The reference has no temporal joins of any kind (SURVEY.md §2.2); the
operator is north-star scope (training pipelines join events to the
latest snapshot/config/model-version constantly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join (left rows enriched with the latest right
    values at-or-before their time; nulls where no right row
    qualifies).  ``right`` must be unique per (key, right_time)."""
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tagged.schema["__lrow"].dataType.simpleString()
        ).alias("__lrow"),
        *value_cols,
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return (
        unioned.select("__is_left", "__lrow", *filled)
        .filter(F.col("__is_left") == 1)
        .select("__lrow.*", *value_cols)
    )


def asof_latest_order(spark, sf_dir: str) -> DataFrame:
    """Each event enriched with the customer's latest order at-or-
    before the event time (null where none).  Right side deduped to
    one row per (customer, order date) with deterministic max-orderkey
    tie-break, since as-of semantics require a unique right timeline.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from smile_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("odate"),
        )
        .agg(
            F.max("o_orderkey").alias("matched_orderkey"),
            F.expr("max_by(o_totalprice, o_orderkey)").alias("matched_price"),
        )
    )
    return asof_join(
        ev, o, "user_id", "ts", "odate",
        ["matched_orderkey", "matched_price"],
    )


ASOF_LATEST_ORDER_SQL = (
    "WITH e AS (SELECT event_id, user_id,"
    " date_trunc('microseconds', ts) AS ts FROM events),"
    " o AS (SELECT o_custkey AS user_id, o_orderdate AS odate,"
    "  MAX(o_orderkey) AS matched_orderkey,"
    "  arg_max(o_totalprice, o_orderkey) AS matched_price"
    "  FROM orders GROUP BY 1, 2)"
    " SELECT e.event_id, e.user_id, e.ts,"
    "  o.matched_orderkey, o.matched_price"
    " FROM e ASOF LEFT JOIN o"
    "  ON e.user_id = o.user_id AND e.ts >= o.odate"
)


# ---------------------------------------------------------------------------
# range (interval) join — bucketed equi-join, not a nested loop
# ---------------------------------------------------------------------------

RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour lookback, exact µs


def range_join_recent_events(spark, sf_dir: str) -> DataFrame:
    """Per event: how many events of the same user occurred in the
    strictly-preceding 1-hour window.

    A naive range join (``r.ts < l.ts AND r.ts >= l.ts - 1h``) is a
    per-key nested loop — quadratic in events-per-user.  The scalable
    composition bucketizes time at the window width: a right row can
    only qualify from the probe's own bucket or the one before, so the
    probe side expands 2× into an EQUI-join on (user, bucket) and the
    exact range predicate filters the residue.  Work is
    O(pairs-within-±1-bucket), not O(pairs-per-user); the bucket width
    knob trades expansion factor against residue selectivity.  All
    arithmetic in exact integer µs.
    """
    from smile_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros("ts").alias("us"),
    )
    w = F.lit(RANGE_JOIN_WINDOW_US)
    left = ev.withColumn("b", F.floor(F.col("us") / w))
    probe = left.select(
        "event_id",
        "user_id",
        "ts",
        "us",
        F.explode(F.array(F.col("b"), F.col("b") - 1)).alias("jb"),
    )
    right = left.select(
        "user_id", F.col("us").alias("us_r"), F.col("b").alias("jb")
    )
    hits = (
        probe.join(right, ["user_id", "jb"])
        .filter(
            (F.col("us_r") < F.col("us")) & (F.col("us_r") >= F.col("us") - w)
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    return (
        ev.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("n_recent", F.lit(0)).cast("bigint").alias("n_recent"),
        )
    )


RANGE_JOIN_SQL = (
    "WITH e AS (SELECT event_id, user_id,"
    " date_trunc('microseconds', ts) AS ts FROM events)"
    " SELECT l.event_id, l.user_id, l.ts,"
    "  COUNT(r.ts) AS n_recent"
    " FROM e l LEFT JOIN e r"
    "  ON l.user_id = r.user_id AND r.ts < l.ts"
    "  AND r.ts >= l.ts - INTERVAL 1 HOUR"
    " GROUP BY 1, 2, 3"
)
