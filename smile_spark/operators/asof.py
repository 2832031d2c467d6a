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


# ---------------------------------------------------------------------------
# Interval overlap join
# ---------------------------------------------------------------------------

FULFILL_DAYS = 7  # each order occupies [orderdate, orderdate + 7d)
FULFILL_US = FULFILL_DAYS * 86_400_000_000


def interval_overlap_join(spark, sf_dir: str) -> DataFrame:
    """Per customer: pairs of orders whose 7-day fulfillment intervals
    overlap — the third temporal-join shape after as-of and range.

    Two half-open intervals of EQUAL width w overlap iff their starts
    differ by < w, so each interval can only overlap partners whose
    start falls in its own w-wide bucket or an adjacent one.  The
    scalable composition is the same bucketize-then-equi-join as the
    range join: probe side expands 2× into (customer, bucket), the
    exact predicate filters the residue — O(pairs within ±1 bucket),
    never the per-customer quadratic nested loop.  Equal-width
    intervals need no interval tree; variable widths would bucket at
    the MAX width (or split long intervals across buckets).
    """
    from smile_spark.tables import table

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        # o_orderdate is TIMESTAMP_NTZ; cast is value-preserving under
        # the UTC session tz and unix_micros requires TIMESTAMP
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s"),
    )
    w = F.lit(FULFILL_US)
    left = o.withColumn("b", F.floor(F.col("s") / w))
    # One-sided in time: each interval probes for partners that start
    # AT OR BEFORE it (ties broken on orderkey), so every unordered
    # pair is generated exactly once — from its later member — and two
    # buckets {b, b-1} provably cover the partner's start.  A
    # symmetric |Δs| < w predicate would need 3 buckets per probe.
    probe = left.select(
        "ok",
        "ck",
        "s",
        F.explode(F.array(F.col("b"), F.col("b") - 1)).alias("jb"),
    )
    right = left.select(
        F.col("ck").alias("ck"),
        F.col("ok").alias("ok_b"),
        F.col("s").alias("s_b"),
        F.col("b").alias("jb"),
    )
    pairs = (
        probe.join(right, ["ck", "jb"])
        .filter(
            (
                (F.col("s_b") < F.col("s"))
                | ((F.col("s_b") == F.col("s")) & (F.col("ok_b") < F.col("ok")))
            )
            & (F.col("s_b") > F.col("s") - w)
        )
        .select(
            "ck",
            F.least("ok", "ok_b").alias("a"),
            F.greatest("ok", "ok_b").alias("b"),
        )
        .distinct()
    )
    return pairs.groupBy("ck").agg(
        F.count(F.lit(1)).alias("n_overlapping_pairs")
    )


INTERVAL_OVERLAP_SQL = (
    "WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck,"
    "  epoch_us(o_orderdate) AS s FROM orders),"
    " pairs AS (SELECT DISTINCT a.ck, a.ok AS a, b.ok AS b"
    "  FROM o a JOIN o b ON a.ck = b.ck AND a.ok < b.ok"
    f"  AND b.s < a.s + {FULFILL_US} AND b.s > a.s - {FULFILL_US})"
    " SELECT ck, COUNT(*) AS n_overlapping_pairs FROM pairs GROUP BY ck"
)
