"""Time-window operators over the events table (north-star extension;
the reference has no streaming/window surface — SURVEY.md §2.2).

Batch-first implementations of the three window families using the
same ``F.window`` / ``F.session_window`` primitives Structured
Streaming uses — so the smile_spark.streaming wrappers run the
IDENTICAL aggregation logic incrementally with watermarks (tested for
batch/stream agreement in tests/test_streaming.py).

Scale shape: tumbling/sliding windows are a groupBy on (window, key) —
partial aggregation applies, and the slide factor multiplies rows
*before* the map-side combine, not the shuffle.  Session windows are
Spark's native session_window (at 100 TB: a shuffle on user_id then a
per-key merge — the same plan streaming uses with state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.functions.numeric import dsum
from smile_spark.tables import table

SESSION_GAP_MIN = 30


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window: count + exact sum per (window, type)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


WINDOW_TUMBLING_SQL = (
    "SELECT date_trunc('hour', ts) AS ws,"
    " date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,"
    " event_type, COUNT(*) AS cnt,"
    " CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"
    " FROM events GROUP BY 1, 2, 3"
)


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes (4 windows per event)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "cnt",
            "sum_value",
        )
    )


WINDOW_SLIDING_SQL = (
    # replicate F.window's epoch-aligned slide expansion: an event at t
    # belongs to windows starting at floor(t/slide)*slide - j*slide,
    # j = 0..(size/slide - 1); every such window contains t.  All
    # arithmetic on exact integer microseconds (epoch() is a double
    # whose ~0.5µs resolution could flip bucket boundaries).
    "WITH us AS ("
    " SELECT value, date_diff('microsecond',"
    "  TIMESTAMP '1970-01-01 00:00:00',"
    "  date_trunc('microseconds', ts)) AS t_us FROM events),"
    " expanded AS ("
    " SELECT value, make_timestamp("
    "  ((t_us // 900000000) - j) * 900000000) AS ws"
    " FROM us, (SELECT unnest(range(4)) AS j) s)"
    " SELECT ws, ws + INTERVAL 1 HOUR AS we, COUNT(*) AS cnt,"
    " CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"
    " FROM expanded GROUP BY ws"
)


# ---------------------------------------------------------------------------
# hypertable rollup — continuous-aggregate hierarchy
# ---------------------------------------------------------------------------


def rollup_build(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Materialize the hourly rollup of events, partitioned by date —
    the TimescaleDB-style continuous aggregate.

    Only MERGEABLE state is stored (counts and exact DECIMAL sums —
    sum-of-sums and count-of-counts re-aggregate losslessly; averages
    are derived at query time, never stored).  At 100 TB this table is
    ~#hours × #types rows: coarser queries scan it instead of the raw
    events, and the date partitioning prunes time ranges.
    """
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_dec"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            F.to_date(F.col("w.start")).alias("event_date"),
            "event_type",
            "cnt",
            "sum_value_dec",
        )
    )
    hourly.write.mode("overwrite").partitionBy("event_date").parquet(path)


# Rollup paths memoized per (application, sf_dir): a continuous
# aggregate is built ONCE (then refreshed incrementally) and queried
# many times — rebuilding it per query would defeat its purpose.  Same
# persist-and-reuse pattern as dedup.lsh_pairs_cached.
_ROLLUP_CACHE: dict[tuple[str, str], str] = {}


def _rollup_path(spark: SparkSession, sf_dir: str) -> str:
    from smile_spark.session import scratch_dir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ROLLUP_CACHE:
        path = scratch_dir("smile_hypertable_")
        rollup_build(spark, sf_dir, path)
        _ROLLUP_CACHE[key] = path
    return _ROLLUP_CACHE[key]


def hypertable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type summary answered FROM THE HOURLY ROLLUP, not the
    raw events: build the rollup once per application (cached), then
    merge hourly states up to days.  The oracle aggregates the raw
    table directly — parity proves the rollup hierarchy is lossless.
    """
    hourly = spark.read.parquet(_rollup_path(spark, sf_dir))
    return (
        hourly.groupBy("event_date", "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("event_date", "yyyy-MM-dd").alias("day"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


HYPERTABLE_DAILY_SQL = (
    "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,"
    " event_type, COUNT(*) AS cnt,"
    " CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"
    " FROM events GROUP BY 1, 2"
)


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Native ``session_window``: window.start = first event,
    window.end = last event + gap.  Equivalent SQL (the oracle) is
    the classic gaps-and-islands lag/cumulative-sum — worth having
    both: the Spark primitive is what streaming state uses, the
    islands form is what warehouses run.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


WINDOW_SESSION_SQL = (
    # µs-truncate first: Spark timestamps are µs while the raw parquet
    # carries ns — boundaries must be computed on identical values.
    "WITH e AS (SELECT user_id, date_trunc('microseconds', ts) AS ts,"
    "  value FROM events),"
    " marked AS (SELECT user_id, ts, value,"
    "  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)"
    f"   IS NULL OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)"
    f"   >= INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END AS brk"
    "  FROM e),"
    " islands AS (SELECT user_id, ts, value,"
    "  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts"
    "   ROWS UNBOUNDED PRECEDING) AS sid FROM marked)"
    " SELECT user_id, MIN(ts) AS session_start,"
    f" MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,"
    " COUNT(*) AS n_events,"
    " CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"
    " FROM islands GROUP BY user_id, sid"
)


# ---------------------------------------------------------------------------
# Exact sliding distinct counting (bitmap-windowed NDV)
# ---------------------------------------------------------------------------

SLIDE_DAYS = 7  # trailing window width (days)


def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct active users per day — the DAU/WAU
    family's hard member: COUNT(DISTINCT) does not decompose over
    sliding windows (overlapping windows can't share a count), so the
    naive form rescans the window per day.

    Scale shape: the word-packed bitmap technique (sketch.py
    bitmap_distinct) makes distinct-state MERGEABLE — per (day,
    word_idx) words build in ONE pass with map-side bit_or combine,
    each day's words then replicate to the ≤SLIDE_DAYS windows that
    contain it (a bounded 7x explode of the tiny per-day word table,
    NOT of the events), and a second bit_or + popcount merges each
    window.  At 100 TB: events are scanned once; everything after is
    proportional to #days x id_range/32 words.  The same two-level
    merge serves any window width, backfills, and shard-parallel
    builds (bitmap OR is the exact analogue of the HLL register MAX).

    Emits (day, n_users_1d, n_users_7d) per calendar day with the
    1-day exact count beside the trailing-window count.
    """
    ev = table(spark, sf_dir, "events")
    # day stays a midnight TIMESTAMP (the gap_fill_daily convention):
    # Spark DATE and DuckDB DATE reach pandas as different dtypes and
    # would fail the driver's bit-exact frame compare
    words = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.expr("cast(user_id as bigint) div 32").alias("widx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(user_id % 32 as int))"
            ).alias("mask"),
        )
        .groupBy("day", "widx")
        .agg(F.bit_or("mask").alias("w"))
    )
    daily = words.groupBy("day").agg(
        F.sum(F.bit_count("w")).cast("bigint").alias("n_users_1d")
    )
    offsets = F.array(*[F.lit(i) for i in range(SLIDE_DAYS)])
    windowed = (
        words.withColumn("off", F.explode(offsets))
        .select(
            F.expr("timestampadd(DAY, off, day)").alias("wday"),
            "widx",
            "w",
        )
        .groupBy("wday", "widx")
        .agg(F.bit_or("w").alias("w"))
        .groupBy("wday")
        .agg(F.sum(F.bit_count("w")).cast("bigint").alias("n_users_7d"))
    )
    # trailing windows whose anchor day has no events are real windows
    # too, but the fixture's event stream is dense per day, so anchor
    # days == event days; keep only days that actually occur (the
    # explode also creates SLIDE_DAYS-1 anchor days past the stream's
    # end — drop them by the inner join with daily)
    return (
        daily.join(windowed, daily.day == windowed.wday)
        .select("day", "n_users_1d", "n_users_7d")
    )


SLIDING_DISTINCT_USERS_SQL = (
    "WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)"
    " SELECT d.day,"
    " (SELECT COUNT(DISTINCT user_id) FROM events e"
    "   WHERE date_trunc('day', e.ts) = d.day) AS n_users_1d,"
    " (SELECT COUNT(DISTINCT user_id) FROM events e"
    "   WHERE date_trunc('day', e.ts)"
    "    BETWEEN d.day - INTERVAL 6 DAY AND d.day) AS n_users_7d"
    " FROM d"
)


# ---------------------------------------------------------------------------
# Watermark planning: late-data audit
# ---------------------------------------------------------------------------

LATE_WATERMARKS_S = (3600, 7200)  # candidate watermarks (seconds)
_LATE_BUCKET = 4096               # events per running-max bucket


def watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW late-data audit for watermark planning: for each
    candidate watermark W, how many events arrive LATER than the
    already-seen event-time high-water mark minus W — exactly the rows
    Structured Streaming would drop at that setting.  Run this before
    choosing `withWatermark` so the state-size/completeness trade is a
    measured number, not a guess (arrival order is proxied by
    event_id, the fixture's ingestion sequence).

    Scale shape: the running event-time maximum over arrival order is
    the TWO-LEVEL device from graph_load — per-bucket ordered windows
    (bucket = event_id div 4096, fully parallel) plus an exclusive
    prefix-max over the tiny per-bucket maxima, broadcast back — so
    NO global single-partition window touches the fact table at any
    scale.  Emits (n_events, late_1h, late_2h, max_lateness_us).
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    ).withColumn("bkt", F.expr(f"event_id div {_LATE_BUCKET}"))
    w_local = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_max = ev.groupBy("bkt").agg(F.max("us").alias("bmax"))
    w_bkt = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_max.select(
        "bkt", F.max("bmax").over(w_bkt).alias("pmax")
    )
    run = (
        ev.withColumn("lmax", F.max("us").over(w_local))
        .join(F.broadcast(bucket_prefix), "bkt")
        .withColumn("running_max", F.greatest("lmax", "pmax"))
        .withColumn(
            "lateness",
            F.greatest(
                F.coalesce(F.col("running_max") - F.col("us"), F.lit(0)),
                F.lit(0),
            ),
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.sum(
            (F.col("lateness") > wm * 1_000_000).cast("bigint")
        ).alias(f"late_{wm // 3600}h")
        for wm in LATE_WATERMARKS_S
    ] + [F.max("lateness").cast("bigint").alias("max_lateness_us")]
    return run.agg(*aggs)


WATERMARK_LATE_AUDIT_SQL = (
    "WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),"
    " r AS (SELECT us,"
    "  MAX(us) OVER (ORDER BY event_id"
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS running_max"
    "  FROM e),"
    " l AS (SELECT GREATEST(COALESCE(running_max - us, 0), 0)"
    "   AS lateness FROM r)"
    " SELECT COUNT(*) AS n_events,"
    + ", ".join(
        f" CAST(SUM(CASE WHEN lateness > {wm * 1_000_000} THEN 1 ELSE 0"
        f" END) AS BIGINT) AS late_{wm // 3600}h"
        for wm in LATE_WATERMARKS_S
    )
    + ","
    " CAST(MAX(lateness) AS BIGINT) AS max_lateness_us"
    " FROM l"
)
