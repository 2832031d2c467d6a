"""Batch/stream agreement: the streaming window aggregations must
produce exactly the batch operators' results once the stream drains —
one definition, two execution modes."""

import pandas as pd
import pytest

from smile_spark.operators.windows import window_tumbling
from smile_spark.streaming.events import (
    run_stream_to_memory,
    stateful_user_totals,
    streaming_tumbling,
)
from smile_spark.testing import canonicalize


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = canonicalize(window_tumbling(spark, sf_dir).toPandas())
    stream_df = streaming_tumbling(spark, sf_dir)
    got = canonicalize(
        run_stream_to_memory(stream_df, "t_tumbling").toPandas()
    )
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_stateful_user_totals(spark, sf_dir):
    out = run_stream_to_memory(
        stateful_user_totals(spark, sf_dir), "t_state", output_mode="update"
    ).toPandas()
    # final state per user must match the batch aggregate
    from smile_spark.tables import table
    from pyspark.sql import functions as F

    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    # update mode may emit per-trigger rows; keep the last per user
    final = out.sort_values("n_events").groupby("user_id").last().reset_index()
    merged = final.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged.n_events_s == merged.n_events_b).all()


def test_streaming_dedup_drains_to_distinct(spark, sf_dir):
    """All fixture data arrives within one watermark window, so the
    drained streaming dedup must equal the batch distinct count on the
    same content hash."""
    from pyspark.sql import functions as F

    from smile_spark.streaming.events import streaming_dedup
    from smile_spark.tables import table

    out = run_stream_to_memory(
        streaming_dedup(spark, sf_dir), "t_dedup", output_mode="append"
    )
    batch_distinct = (
        table(spark, sf_dir, "events")
        .select(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("user_id").cast("string"),
                    "event_type",
                    F.col("props"),
                )
            ).alias("eh")
        )
        .distinct()
        .count()
    )
    assert out.select("eh").distinct().count() == batch_distinct
    assert out.count() == batch_distinct


def test_streaming_enriched_equals_batch(spark, sf_dir):
    """Stream–static join + window agg must equal the same computation
    done in batch."""
    from pyspark.sql import functions as F

    from smile_spark.functions.numeric import dsum
    from smile_spark.streaming.events import (
        run_stream_to_memory,
        streaming_enriched_tumbling,
    )
    from smile_spark.tables import table

    got = run_stream_to_memory(
        streaming_enriched_tumbling(spark, sf_dir), "enriched_tumbling"
    )
    ev = table(spark, sf_dir, "events")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = (
        ev.join(dim, "user_id")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("ws"), "c_mktsegment", "cnt", "sum_value"
        )
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    assert got.count() > 0


def test_streaming_click_attribution_equals_batch(spark, sf_dir):
    """Stream–stream join (watermarks both sides, time-bounded
    predicate) must equal the identical batch join once drained —
    append mode, so only rows the watermark has sealed are compared
    against the batch subset they cover; with the whole fixture in one
    trigger, every row seals."""
    from pyspark.sql import functions as F

    from smile_spark.streaming.events import streaming_click_attribution
    from smile_spark.tables import table

    got = run_stream_to_memory(
        streaming_click_attribution(spark, sf_dir),
        "t_attrib",
        output_mode="append",
    )
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND click_ts <= purchase_ts"
            " AND click_ts >= purchase_ts - INTERVAL 2 hours"
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )
    assert got.count() > 0
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_streaming_session_equals_batch(spark, sf_dir):
    """Session windows computed incrementally over the stream must
    equal the batch session_window result — dynamic-window state
    merging is lossless."""
    from smile_spark.operators.windows import window_session
    from smile_spark.streaming.events import (
        run_stream_to_memory,
        streaming_session,
    )

    got = run_stream_to_memory(
        streaming_session(spark, sf_dir), "t_sessions", "complete"
    )
    want = window_session(spark, sf_dir)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_streaming_checkpoint_exactly_once_restart(spark, sf_dir, tmp_path):
    """Kill a checkpointed stream mid-pipeline, restart it, and verify
    the file sink holds each input row EXACTLY once — the recovery
    contract a production ingestion job relies on: offsets commit to
    the checkpoint ahead of sink visibility, so a restart resumes
    instead of replaying or dropping."""
    import os

    from pyspark.sql import functions as F

    from smile_spark.streaming.events import read_event_stream
    from smile_spark.tables import table

    ckpt = os.path.join(tmp_path, "ckpt")
    out = os.path.join(tmp_path, "out")
    stage = os.path.join(tmp_path, "landing")

    def start():
        return (
            read_event_stream(spark, sf_dir, stage_dir=stage)
            .select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    # restart against the same checkpoint: no new input → no new rows
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)
    want = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    # per-id uniqueness: restart must not have duplicated any row
    assert (
        got.groupBy("event_id").count().filter(F.col("count") > 1).isEmpty()
    )


def test_streaming_cdc_upsert_equals_batch_compaction(spark, sf_dir, tmp_path):
    """The foreachBatch latest-wins merge loop must converge to the
    same state as the batch cdc_latest_state over the full log — the
    merge is associative, so batching must not matter."""
    import os

    from pyspark.sql import functions as F

    from smile_spark.operators.curation import cdc_latest_state
    from smile_spark.streaming.events import streaming_cdc_upsert

    state = os.path.join(tmp_path, "state")
    ckpt = os.path.join(tmp_path, "ckpt")
    streaming_cdc_upsert(spark, sf_dir, state, ckpt)

    got = spark.read.parquet(state).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )
    want = cdc_latest_state(spark, sf_dir)
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_streaming_hll_state_equals_batch_registers(spark, sf_dir, tmp_path):
    """The incrementally-maintained HLL register state must equal the
    single-pass batch registers row-for-row (MAX-merge associativity),
    and therefore yield the identical estimate."""
    from pyspark.sql import functions as F

    from smile_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from smile_spark.streaming.events import (
        hll_state_registers,
        streaming_hll_registers,
    )
    from smile_spark.tables import table

    state = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "hll_ckpt")
    streaming_hll_registers(spark, sf_dir, state, ckpt)

    users = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("tok")
    )
    batch_regs = hll_registers(users)
    stream_regs = hll_state_registers(spark, state)
    assert batch_regs.exceptAll(stream_regs).count() == 0
    assert stream_regs.exceptAll(batch_regs).count() == 0

    exact = users.distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = hll_estimate_from_registers(stream_regs, exact).collect()[0]
    rel_err = abs(est.est_distinct - est.exact_distinct) / est.exact_distinct
    assert rel_err < 0.2, est


def test_streaming_cms_state_equals_batch_counters(spark, sf_dir, tmp_path):
    """The incrementally-maintained CMS counter grid must equal the
    single-pass batch grid cell-for-cell (SUM-merge associativity)."""
    from pyspark.sql import functions as F

    from smile_spark.operators.sketch import CMS_DEPTH, _cms_hash_spark
    from smile_spark.streaming.events import (
        cms_state_counters,
        streaming_cms_counters,
    )
    from smile_spark.tables import table

    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "cms_ckpt")
    streaming_cms_counters(spark, sf_dir, state, ckpt)

    toks = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("tok")
    )
    batch_grid = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            F.expr(_cms_hash_spark(d)).alias("b"),
                        )
                        for d in range(CMS_DEPTH)
                    ]
                )
            ).alias("h")
        )
        .groupBy("h.d", "h.b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stream_grid = cms_state_counters(spark, state)
    assert batch_grid.exceptAll(stream_grid).count() == 0
    assert stream_grid.exceptAll(batch_grid).count() == 0

    # At-least-once replay: re-running the whole stream against the
    # SAME state dir (fresh checkpoint = every batch re-delivered)
    # must leave the merged grid unchanged — per-batch partials are
    # overwritten in place, never re-summed into a global table.  The
    # previous in-place SUM-merge design would double every counter.
    streaming_cms_counters(spark, sf_dir, state, str(tmp_path / "ckpt2"))
    replayed = cms_state_counters(spark, state)
    assert batch_grid.exceptAll(replayed).count() == 0
    assert replayed.exceptAll(batch_grid).count() == 0


def test_streaming_ewma_equals_batch(spark, sf_dir):
    """The online truncated-EWMA must emit exactly the batch
    ewma_anomaly rows (same scores, same spike flags) once the stream
    drains — the batch/stream equality contract of the sketch
    maintainers applied to a per-entity window operator."""
    from smile_spark.operators.behavior import ewma_anomaly
    from smile_spark.streaming.events import streaming_ewma

    out = run_stream_to_memory(
        streaming_ewma(spark, sf_dir), "t_ewma", output_mode="update"
    ).toPandas()
    batch = ewma_anomaly(spark, sf_dir).toPandas()
    assert len(out) == len(batch)
    key = ["user_id", "event_id"]
    m = out.merge(batch, on=key, suffixes=("_s", "_b"))
    assert len(m) == len(batch)
    assert (m.rn_s == m.rn_b).all()
    assert (m.ewma_prev_s == m.ewma_prev_b).all()
    assert (m.is_spike_s == m.is_spike_b).all()
