"""Streaming versions of the window operators.

The batch operators in smile_spark.operators.windows use the exact
``F.window`` / ``F.session_window`` primitives Structured Streaming
executes incrementally — these wrappers run the same logic as a
stream: parquet file source (one file per trigger simulates arrival),
event-time watermark for late data, windowed state, memory sink.

Tested for batch/stream agreement (tests/test_streaming.py): the
complete-output streaming result of each windowed aggregation must
equal the batch result — the property that makes a lambda-free
architecture possible at scale (one definition, two execution modes).

The custom stateful path (applyInPandasWithState) implements per-user
running counters — the shape the reference could only express as a
hand-written stateful loop.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.functions.numeric import dsum
from smile_spark.tables import _normalize_event_ts, table


def read_event_stream(
    spark: SparkSession, sf_dir: str, stage_dir: str | None = None
) -> DataFrame:
    """Parquet file-source stream over the events fixture; schema comes
    from a batch peek (streams need explicit schemas).  The nanosecond
    ts is converted exactly as the batch reader does.

    The file source requires a *directory* (it watches for arriving
    files); the read-only fixture is a single file, so we stage a temp
    directory with a symlink — in production this is simply the
    landing directory files arrive into.  Pass ``stage_dir`` to pin
    that directory: a checkpointed query records its source path, so a
    RESTART must re-read the same directory, not a fresh tempdir.
    """
    import os

    # Defensive: the caller may hand us a session built without our
    # factory (the driver does); this conf is runtime-settable and
    # required to read the TIMESTAMP(NANOS) fixture variant.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    if stage_dir is None:
        from smile_spark.session import scratch_dir

        stage = scratch_dir("smile_stream_")
    else:
        stage = stage_dir
        os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events-0000.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return _normalize_event_ts(stream)


def streaming_tumbling(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming hourly tumbling counts with an event-time watermark —
    identical aggregation to operators.windows.window_tumbling."""
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


# serializes run_stream_to_memory drains: the state-partition override
# below is session-global, so overlapping drains could restore a stale
# previous value (ADVICE r08 #1)
_DRAIN_LOCK = threading.Lock()


def run_stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table and return
    the materialized result (test/debug harness; production would use
    a real sink with a checkpoint location).

    Streaming STATE partitioning follows spark.sql.shuffle.partitions
    at query start, and every microbatch commits every state store —
    at the batch default of 32 a stream-stream join pays 32 × 4
    store commits per trigger, which dominated the certificate drains
    (measured 17.2 s → 3.1 s at 8 partitions for
    streaming_join_agreement at sf0.1).  The drain therefore sizes
    state partitions to the fixture's traffic (override with
    ``spark.smile.streaming.statePartitions``); a production
    deployment sizes this to per-trigger volume, not to the batch
    shuffle default.  Results are partitioning-independent — only the
    commit overhead changes.

    The override is SESSION-GLOBAL for the duration of the drain
    (state partitioning cannot be set per-query in Spark): a batch
    query planned concurrently in the same session would silently
    plan with the drain's small shuffle-partition count, and two
    concurrent drains could restore each other's previous value.
    ``_DRAIN_LOCK`` therefore serializes drains within this process,
    and batch queries must not be planned on this session while a
    drain is in flight (ADVICE r08 #1; the bench and the test suite
    already run drains standalone)."""
    spark = df.sparkSession
    with _DRAIN_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        n_state = spark.conf.get(
            "spark.smile.streaming.statePartitions", "8"
        )
        spark.conf.set("spark.sql.shuffle.partitions", n_state)
        try:
            query = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .start()
            )
            try:
                query.processAllAvailable()
            finally:
                query.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _event_content_hash() -> "F.Column":
    """The content identity the ingest dedup keys on — shared by the
    streaming operator and its batch-agreement certificate so both
    sides hash identical bytes.  Hashes the JSON encoding of the
    field STRUCT, which is injective on (user_id, event_type, props):
    field names disambiguate values and NULL fields can't collide
    with delimiter characters inside a value — unlike concat_ws,
    which both skips NULLs and is ambiguous when a field contains
    the separator (ADVICE r07 #5)."""
    return F.md5(
        F.to_json(F.struct("user_id", "event_type", "props"))
    )


def streaming_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` on a content hash.

    The batch dedup (operators.dedup.dedup_exact) keys state by hash
    forever; on an unbounded stream that state must be watermark-
    bounded — duplicates arriving within the watermark window are
    dropped, and state older than the watermark is evicted.  This is
    the ingestion-side dedup of a training-data pipeline (the batch
    pass remains the periodic full-corpus sweep).
    """
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    return ev.withColumn("eh", _event_content_hash()) \
        .dropDuplicatesWithinWatermark(["eh"])


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count
    and value total via applyInPandasWithState — the escape hatch for
    semantics windows can't express (here: unbounded per-key
    accumulators surviving across triggers)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    ev = read_event_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        total_cnt, total_val = (
            state.get if state.exists else (0, 0.0)
        )
        for pdf in pdfs:
            total_cnt += len(pdf)
            total_val += float(pdf["value"].sum())
        state.update((total_cnt, total_val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [total_cnt],
                "total_value": [total_val],
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="cnt bigint, val double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_click_attribution(
    spark: SparkSession,
    sf_dir: str,
    attribution_window: str = "2 hours",
) -> DataFrame:
    """Stream–stream inner join with watermarks on BOTH sides: attribute
    each purchase to the same user's preceding clicks within the
    attribution window — the canonical two-stream correlation
    (click-through attribution, request/response pairing, sessionized
    funnels).

    Both inputs carry watermarks and the join predicate bounds the
    event-time distance, so Spark can size the join state: a click is
    held only until the watermark passes click_ts + window, then
    evicted.  Unbounded-state stream joins (no time bound) are refused
    by the engine — the bound IS the 100 TB story: state ∝ traffic
    within the window, not stream history.
    """
    clicks = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", attribution_window)
    )
    purchases = (
        read_event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", attribution_window)
    )
    return purchases.join(
        clicks,
        F.expr(
            "p_user = c_user"
            " AND click_ts <= purchase_ts"
            f" AND click_ts >= purchase_ts - INTERVAL {attribution_window}"
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )


def streaming_enriched_tumbling(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Stream–static enrichment join feeding a windowed aggregate —
    the production shape for joining an event stream against a
    dimension table (here: events.user_id → customer, aggregated per
    market segment per day).

    The static side broadcasts, so each micro-batch joins map-side
    with NO stream-side shuffle before the windowed aggregation; the
    dimension is re-resolvable between triggers (Spark re-plans the
    static side per micro-batch), which is how slowly-changing
    dimensions stay fresh without restarting the query.
    """
    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("ws"),
            "c_mktsegment",
            "cnt",
            "sum_value",
        )
    )


def streaming_session(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows — the flagship stateful-streaming
    shape: ``session_window`` merges a user's events into dynamic
    windows that EXTEND while events keep arriving within the gap and
    CLOSE once the watermark passes last_event + gap.  State per key is
    one open session, not event history — the property that bounds
    memory on an unbounded stream.

    Identical aggregation to operators.windows.window_session, so the
    batch/stream agreement test proves the incremental execution is
    lossless."""
    from smile_spark.operators.windows import SESSION_GAP_MIN

    ev = read_event_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_cdc_upsert(
    spark: SparkSession, sf_dir: str, state_dir: str, ckpt_dir: str
) -> None:
    """Streaming CDC type-1 (latest-record-wins) maintained with
    ``foreachBatch``: each micro-batch's per-user winners merge into a
    keyed parquet state table — the incremental MERGE/upsert loop that
    keeps a current-state table fresh without re-compacting history.

    Inside every batch: reduce the batch to its per-user winner (same
    (ts, event_id) tiebreak as the batch operator), union with current
    state, keep the winner again, and atomically replace the state.
    The merge is associative, so the final state equals the batch
    ``cdc_latest_state`` over the whole log regardless of how arrivals
    were batched (asserted in tests/test_streaming.py).

    At 100 TB the replace-the-table write becomes a Delta/Iceberg
    MERGE INTO keyed by user_id; the per-batch reduction bounds merge
    input to |batch winners| + |state|."""
    import os

    from pyspark.sql.window import Window

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        winners = latest(batch)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            state = bspark.read.parquet(state_dir)
            merged = latest(state.unionByName(winners))
        else:
            merged = winners
        # stage-then-swap: never read and overwrite the same files
        tmp = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = bspark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_dir)

    q = (
        read_event_stream(spark, sf_dir)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def streaming_hll_registers(
    spark: SparkSession, sf_dir: str, state_dir: str, ckpt_dir: str
) -> None:
    """Streaming cardinality sketch maintenance: keep an HLL register
    table (distinct users seen so far) fresh with ``foreachBatch``.

    Per micro-batch: build the batch's registers
    (:func:`smile_spark.operators.sketch.hll_registers` over the batch
    user_ids), union with persisted state, and keep the register-wise
    MAX — the HLL merge protocol, associative and idempotent, so the
    final state equals the single-pass batch registers REGARDLESS of
    batching (asserted in tests), and re-delivered rows are harmless
    (MAX absorbs them: effectively-once without dedup bookkeeping).

    This is the 100 TB streaming-cardinality shape: state is ≤256
    rows forever, each batch contributes one tiny aggregate, and the
    estimate is read from state at any time without touching history.
    """
    import os

    from smile_spark.operators.sketch import hll_registers

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        regs = hll_registers(
            batch.select(F.col("user_id").cast("string").alias("tok"))
        ).withColumn("batch_id", F.lit(batch_id))
        # Idempotent per-batch partials: each micro-batch owns its own
        # batch_id=N partition (dynamic overwrite rewrites ONLY that
        # partition), so an at-least-once replay after a crash — or a
        # crash mid-write — just rewrites the same partition instead
        # of corrupting or double-merging a global state table.  The
        # merged view is produced at READ time (hll_state_registers).
        (
            regs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    q = (
        read_event_stream(spark, sf_dir)
        .select("user_id")
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def hll_state_registers(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged view of the streaming HLL state: register-wise MAX over
    the per-batch partials.  O(#batches x 256) rows scanned — if batch
    count ever mattered, MAX-merge associativity licenses folding old
    partials into one base partition (compaction), same as any LSM."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("bucket")
        .agg(F.max("mj").alias("mj"))
    )


def streaming_cms_counters(
    spark: SparkSession, sf_dir: str, state_dir: str, ckpt_dir: str
) -> None:
    """Streaming frequency-sketch maintenance: keep Count-Min counters
    over the event-type stream fresh with ``foreachBatch`` — the
    SUM-merge sibling of :func:`streaming_hll_registers`'s MAX-merge
    (together they cover both sketch merge algebras).

    Per micro-batch: build the batch's (d, b) counter grid and write
    it as an idempotent per-batch partial (its own ``batch_id=N``
    partition, dynamic overwrite).  Unlike the HLL sibling — whose
    MAX merge is idempotent and could tolerate in-place re-merge —
    SUM would DOUBLE-COUNT a replayed batch under the at-least-once
    ``foreachBatch`` contract, so the global grid is never mutated in
    place: a replay rewrites the same partition, and the merged grid
    is summed at read time (:func:`cms_state_counters`), making the
    maintained counters equal the single-pass batch counters
    regardless of batching, crashes, or replays (asserted in tests).
    Per-batch partials are depth×width rows; compaction (folding old
    partials into one base partition) is licensed by SUM
    associativity if batch count ever mattered.
    """

    def counters_of(df: DataFrame) -> DataFrame:
        from smile_spark.operators.sketch import (
            CMS_DEPTH,
            _cms_hash_spark,
        )

        toks = df.select(F.col("event_type").alias("tok"))
        hits = toks.select(
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
        return hits.groupBy("h.d", "h.b").agg(
            F.count(F.lit(1)).alias("c")
        )

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        grid = counters_of(batch).withColumn("batch_id", F.lit(batch_id))
        (
            grid.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    q = (
        read_event_stream(spark, sf_dir)
        .select("event_type")
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def cms_state_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged view of the streaming CMS state: per-cell SUM over the
    per-batch partials (the read-time half of the idempotent-partial
    design — see :func:`streaming_cms_counters`)."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("d", "b")
        .agg(F.sum("c").alias("c"))
    )


def streaming_ewma(
    spark: SparkSession, sf_dir: str, user_mod: int | None = None
) -> DataFrame:
    """Streaming sibling of operators/behavior.py:ewma_anomaly — the
    truncated per-user EWMA maintained ONLINE via
    applyInPandasWithState.  State per user is exactly the last
    EWMA_W values (a bounded deque — the truncation that makes the
    batch operator deterministic is the same thing that bounds
    streaming state forever) plus the last (ts, event_id) seen, used
    to assert monotone arrival within the group.

    Each trigger sorts its WHOLE group slice by (ts, event_id) once —
    the batch operator's window order; per-chunk sorting would
    interleave when Arrow splits a large group across record batches —
    scores every event against the deque, then appends it.  Genuinely
    out-of-order arrival (an event at or before the persisted
    last-(ts,event_id)) raises rather than silently diverging from the
    batch result.  Replay after a failure is NOT out-of-order: the
    state store is versioned per micro-batch, so a replayed batch runs
    against the rolled-back state and re-emits identical rows (scores
    are a pure function of the deque prefix).

    ``user_mod`` restricts the stream to ``user_id % user_mod == 0`` —
    the bounded audit-block device (dedup_eval's pattern) that keeps
    the certificate query's Python-side row work independent of the
    registered benchmark breadth."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from smile_spark.operators.behavior import EWMA_SPIKE_MULT, EWMA_W

    ev = read_event_stream(spark, sf_dir)
    if user_mod is not None:
        ev = ev.filter(F.col("user_id") % user_mod == 0)

    def score(hist: list):
        n = len(hist)
        # term rounding mirrors the engines exactly: Spark/DuckDB
        # ROUND(double, 12) rounds the SHORTEST DECIMAL REPR half-up
        # (Scala BigDecimal.decimal); Python round() is half-to-even
        # and differs on exact-half terms (e.g. 0.03125 * 0.5^8)
        s = sum(
            Decimal(repr(v * 0.5 ** (n - i))).quantize(
                Decimal("1e-12"), rounding=ROUND_HALF_UP
            )
            for i, v in enumerate(hist)
        )
        return float(s.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            hist, rn, last_us, last_eid = (
                list(state.get[0]),
                int(state.get[1]),
                int(state.get[2]),
                int(state.get[3]),
            )
        else:
            hist, rn, last_us, last_eid = [], 0, -1, -1
        out_event, out_rn, out_ewma, out_spike, out_val = [], [], [], [], []
        # ONE sort over the whole micro-batch slice: Arrow delivers a
        # group's rows as multiple unordered chunks (maxRecordsPerBatch
        # splits), so per-chunk sorting would interleave out of order
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            us = int(row["ts"].value) // 1000  # pandas ns -> us
            eid = int(row["event_id"])
            if (us, eid) <= (last_us, last_eid):
                # the monotone-arrival contract: scores already folded
                # into state cannot be recomputed under reordering —
                # fail loudly instead of silently diverging from batch
                raise ValueError(
                    f"out-of-order arrival for user {key[0]}:"
                    f" ({us}, {eid}) after ({last_us}, {last_eid})"
                )
            last_us, last_eid = us, eid
            rn += 1
            if hist:
                e = score(hist)
                out_event.append(eid)
                out_rn.append(rn)
                out_val.append(float(row["value"]))
                out_ewma.append(e)
                out_spike.append(
                    bool(float(row["value"]) > EWMA_SPIKE_MULT * e)
                )
            hist.append(float(row["value"]))
            hist = hist[-EWMA_W:]
        state.update((hist, rn, last_us, last_eid))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_event),
                "event_id": out_event,
                "rn": out_rn,
                "value": out_val,
                "ewma_prev": out_ewma,
                "is_spike": out_spike,
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, event_id bigint, rn bigint,"
            " value double, ewma_prev double, is_spike boolean"
        ),
        stateStructType=(
            "hist array<double>, rn bigint,"
            " last_us bigint, last_eid bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Stateful-streaming agreement certificate (driver-registered)
# ---------------------------------------------------------------------------

SSA_USER_MOD = 10  # audit block: user_id % MOD == 0


def streaming_state_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW certificate that the custom stateful streaming path
    (:func:`streaming_ewma`, ``applyInPandasWithState``) emits exactly
    the batch ``ewma_anomaly`` rows — the batch/stream equality
    contract, promoted from pytest to a driver-verifiable query
    (VERDICT r05 next-round #4).

    Runs the REAL Structured Streaming query (parquet file source →
    per-user bounded-deque EWMA state → memory sink) over the
    ``user_id % SSA_USER_MOD == 0`` audit block, full-outer-joins the
    drained sink against the batch operator on (user_id, event_id),
    and emits (n_stream, n_batch, n_mismatch): a mismatch is a row
    missing on either side or any disagreement in rn / value /
    ewma_prev / is_spike (exact equality is the contract — both paths
    quantize scores identically).  The oracle recomputes the expected
    row count from raw events and asserts the mismatch count is ZERO,
    so any batch/stream divergence flips the hash gate.

    Scale: the streaming side's state is EWMA_W doubles per user
    forever (the truncation bound); the certificate join is
    audit-block-sized.  In production the same query runs against any
    landing directory with a checkpoint location — the memory sink is
    the verification harness, not the deployment sink.
    """
    import uuid

    from smile_spark.operators.behavior import ewma_anomaly

    sink = f"ssa_{uuid.uuid4().hex[:10]}"
    out = run_stream_to_memory(
        streaming_ewma(spark, sf_dir, user_mod=SSA_USER_MOD),
        sink,
        output_mode="update",
    )
    stream = out.select(
        "user_id",
        "event_id",
        F.col("rn").alias("rn_s"),
        F.col("value").alias("value_s"),
        F.col("ewma_prev").alias("ewma_s"),
        F.col("is_spike").alias("spike_s"),
    )
    batch = ewma_anomaly(spark, sf_dir).filter(
        F.col("user_id") % SSA_USER_MOD == 0
    )
    j = stream.join(batch, ["user_id", "event_id"], "full")
    mismatch = (
        F.col("rn_s").isNull()
        | F.col("rn").isNull()
        | (F.col("rn_s") != F.col("rn"))
        | (F.col("value_s") != F.col("value"))
        | (F.col("ewma_s") != F.col("ewma_prev"))
        | (F.col("spike_s") != F.col("is_spike"))
    )
    return j.agg(
        F.count("rn_s").alias("n_stream"),
        F.count("rn").alias("n_batch"),
        F.sum(F.when(mismatch, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatch"),
    )


# The oracle recomputes the expected emitted-row count independently
# (every audit-block event with at least one predecessor in its user's
# (ts, event_id) order emits exactly one row) and asserts zero
# mismatches — the streaming run must reproduce the batch rows
# bit-for-bit for the value-hash to match.
STREAMING_STATE_AGREEMENT_SQL = (
    "WITH seq AS (SELECT ROW_NUMBER() OVER (PARTITION BY user_id"
    "  ORDER BY ts, event_id) AS rn FROM events"
    f"  WHERE user_id % {SSA_USER_MOD} = 0)"
    " SELECT COUNT(*) AS n_stream, COUNT(*) AS n_batch,"
    " CAST(0 AS BIGINT) AS n_mismatch FROM seq WHERE rn >= 2"
)


def streaming_window_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW certificate that the WINDOWED streaming path
    (:func:`streaming_tumbling`: event-time watermark + tumbling
    aggregate) emits exactly the batch ``window_tumbling`` grid once
    the stream drains — the lambda-free contract (one definition, two
    execution modes) promoted from pytest to a driver-verifiable
    query, beside :func:`streaming_state_agreement`'s custom-state
    sibling.

    Emits (n_stream, n_batch, n_mismatch): a mismatch is a grid cell
    missing on either side or any count/exact-decimal-sum
    disagreement.  The oracle recomputes the batch grid size from raw
    events and pins n_mismatch to zero.
    """
    import uuid

    from smile_spark.operators.windows import window_tumbling

    sink = f"swa_{uuid.uuid4().hex[:10]}"
    out = run_stream_to_memory(
        streaming_tumbling(spark, sf_dir), sink, output_mode="complete"
    )
    stream = out.select(
        "ws",
        "we",
        "event_type",
        F.col("cnt").alias("cnt_s"),
        F.col("sum_value").alias("sum_s"),
    )
    batch = window_tumbling(spark, sf_dir)
    j = stream.join(batch, ["ws", "we", "event_type"], "full")
    mismatch = (
        F.col("cnt_s").isNull()
        | F.col("cnt").isNull()
        | (F.col("cnt_s") != F.col("cnt"))
        | (F.col("sum_s") != F.col("sum_value"))
    )
    return j.agg(
        F.count("cnt_s").alias("n_stream"),
        F.count("cnt").alias("n_batch"),
        F.sum(F.when(mismatch, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatch"),
    )


STREAMING_WINDOW_AGREEMENT_SQL = (
    "WITH g AS (SELECT date_trunc('hour', ts) AS ws, event_type"
    "  FROM events GROUP BY 1, 2)"
    " SELECT COUNT(*) AS n_stream, COUNT(*) AS n_batch,"
    " CAST(0 AS BIGINT) AS n_mismatch FROM g"
)


def streaming_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW certificate that watermark-bounded streaming dedup
    (:func:`streaming_dedup`, ``dropDuplicatesWithinWatermark``) keeps
    exactly one row per content hash and exactly the hashes batch
    dedup keeps — the last major streaming feature promoted from
    pytest to a driver-verifiable query (VERDICT r06 next-round #7).

    Runs the REAL streaming query (parquet file source → content hash
    → watermark-bounded dedup state → memory sink, append mode),
    groups the drained output by hash, and full-outer-joins against
    the batch distinct-hash set.  Emits (n_stream, n_batch,
    n_mismatch): a mismatch is a hash missing on either side OR
    emitted more than once by the stream (a duplicate leak).  The
    fixture carries ~6% genuine duplicate triples, so a dedup that
    silently passed rows through would inflate n_stream AND flip
    n_mismatch.  The oracle recomputes the distinct-content count from
    raw events and pins n_mismatch to zero.

    Scale: streaming state is hash-keyed and watermark-EVICTED —
    bounded by traffic within the watermark, not stream history (the
    batch pass stays the periodic full-corpus sweep); the certificate
    join is distinct-hash-sized."""
    import uuid

    sink = f"sda_{uuid.uuid4().hex[:10]}"
    out = run_stream_to_memory(
        streaming_dedup(spark, sf_dir), sink, output_mode="append"
    )
    stream_keys = out.groupBy("eh").agg(F.count(F.lit(1)).alias("cnt_s"))
    batch_keys = (
        table(spark, sf_dir, "events")
        .select(_event_content_hash().alias("eh"))
        .distinct()
        .withColumn("b", F.lit(1))
    )
    j = stream_keys.join(batch_keys, "eh", "full")
    mismatch = (
        F.col("cnt_s").isNull()
        | F.col("b").isNull()
        | (F.col("cnt_s") != 1)
    )
    return j.agg(
        F.sum(F.coalesce("cnt_s", F.lit(0))).cast("bigint").alias("n_stream"),
        F.count("b").alias("n_batch"),
        F.sum(F.when(mismatch, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatch"),
    )


STREAMING_DEDUP_AGREEMENT_SQL = (
    "WITH d AS (SELECT DISTINCT user_id, event_type, props FROM events)"
    " SELECT COUNT(*) AS n_stream, COUNT(*) AS n_batch,"
    " CAST(0 AS BIGINT) AS n_mismatch FROM d"
)


ATTRIBUTION_WINDOW = "2 hours"


def streaming_join_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW certificate for the STREAM-STREAM join
    (:func:`streaming_click_attribution`: watermarks on both sides +
    an event-time-bounded join predicate): the drained streaming
    attribution must equal the batch range join computing the same
    click→purchase pairs — the last streaming join shape promoted
    from pytest to a driver-verifiable query.

    Emits (n_stream, n_batch, n_mismatch): a mismatch is a
    (purchase_id, click_id) pair present on only one side.  The
    oracle recomputes the batch pair count from raw events with the
    identical time predicate and pins n_mismatch to zero.

    Scale: the streaming join state is bounded by the watermark (a
    click is evicted once the watermark passes click_ts + window —
    unbounded-state stream joins are refused by the engine); the
    certificate diff is pair-set-sized."""
    import uuid

    sink = f"sja_{uuid.uuid4().hex[:10]}"
    out = run_stream_to_memory(
        streaming_click_attribution(
            spark, sf_dir, attribution_window=ATTRIBUTION_WINDOW
        ),
        sink,
        output_mode="append",
    )
    stream = out.select(
        "purchase_id", "click_id", F.lit(1).alias("s")
    )
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = purchases.join(
        clicks,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (
            F.col("cts")
            >= F.col("pts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        ),
        "inner",
    ).select("purchase_id", "click_id", F.lit(1).alias("b"))
    j = stream.join(batch, ["purchase_id", "click_id"], "full")
    mismatch = F.col("s").isNull() | F.col("b").isNull()
    return j.agg(
        F.count("s").alias("n_stream"),
        F.count("b").alias("n_batch"),
        F.sum(F.when(mismatch, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatch"),
    )


STREAMING_JOIN_AGREEMENT_SQL = (
    "WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts"
    "  FROM events WHERE event_type = 'click'),"
    " p AS (SELECT user_id, event_id AS purchase_id, ts AS pts"
    "  FROM events WHERE event_type = 'purchase'),"
    " pairs AS (SELECT purchase_id, click_id FROM p JOIN c"
    "  ON p.user_id = c.user_id AND c.cts <= p.pts"
    "   AND c.cts >= p.pts - INTERVAL 2 HOUR)"
    " SELECT COUNT(*) AS n_stream, COUNT(*) AS n_batch,"
    " CAST(0 AS BIGINT) AS n_mismatch FROM pairs"
)


def streaming_manifest_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ONE-ROW certificate that the increment ingest manifest also
    exists as a STREAMING surface (VERDICT r14 next-round #7): the
    increment documents arrive as a parquet file-source stream (one
    file per trigger — the daily landing-directory shape), and a
    ``foreachBatch`` sink runs the SAME six-rung precedence
    composition (pipeline._manifest_verdicts) over each micro-batch,
    restricted to the batch's doc ids.  The drained per-batch
    verdicts must equal the UNSPLIT batch composition over the same
    pinned pair frames row-for-row (the batch operator's manifest is
    the identical composition — increment_ingest_manifest shares
    `_manifest_verdicts` — so re-probing the indexes for the batch
    side would only double the rung work on a deterministic input).

    Emits (n_stream, n_batch, n_mismatch): a mismatch is a doc_id
    whose (verdict, reason, duplicate_of) differs between the two
    surfaces, appears on only one side, or is emitted more than once
    by the stream.  The oracle pins n_stream = n_batch = the
    increment count and n_mismatch = 0.

    Correctness argument for batch-independence: every rung judges an
    increment doc against the BASE corpus only (the incremental-rung
    contract — increment-internal duplicates are the next nightly
    rebuild's input), so a doc's verdict depends on nothing else in
    its micro-batch and the composition commutes with any batch
    split.  This certificate is exactly the check of that claim.

    Scale: the six rung pair frames are built ONCE (warm bucketed-
    index probes, increment-linear) and pinned with a local
    checkpoint; each micro-batch's work is then a batch-id semi-join
    over the pinned pair tables plus the increment-sized precedence
    window.  A production deployment would let each arriving file
    probe the indexes directly — the identical plan with the arriving
    frame in place of the pinned probe block."""
    import threading as _th
    import uuid

    from smile_spark.operators import dedup as D
    from smile_spark.operators import pipeline as P
    from smile_spark.session import scratch_dir, unpersist_checkpoint
    from smile_spark.tables import table as _table

    inc_docs = (
        _table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % D.SETSIM_INC_MOD == 0)
        .select("doc_id")
    )
    # stage the increment as TWO parquet files so maxFilesPerTrigger=1
    # yields two genuine micro-batches (a single-batch run would make
    # the split-commutativity claim vacuous)
    stage = scratch_dir("smile_manifest_stream_")
    inc_docs.repartition(2).write.mode("overwrite").parquet(stage)
    # build the rung pair frames once and pin them as ONE tagged
    # (a, b, reason) checkpoint (r16): per-batch work is then a single
    # semi-join + aggregate over one materialized pair table instead
    # of six of each, and the batch side reads the same checkpoint
    frames = P._manifest_frames(spark, sf_dir)
    pinned = P._manifest_tagged(frames).localCheckpoint()
    del frames  # rung-internal checkpoints may release on gc
    rows: list = []
    batches: list = []
    lock = _th.Lock()

    def handle(batch_df, batch_id) -> None:
        ids = batch_df.select("doc_id")
        bt = pinned.join(
            F.broadcast(ids.withColumnRenamed("doc_id", "a")),
            "a",
            "semi",
        )
        out = P._manifest_verdicts_tagged(bt, ids)
        with lock:
            rows.extend(out.collect())
            batches.append(batch_id)

    try:
        with _DRAIN_LOCK:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            n_state = spark.conf.get(
                "spark.smile.streaming.statePartitions", "8"
            )
            spark.conf.set("spark.sql.shuffle.partitions", n_state)
            try:
                query = (
                    spark.readStream.schema("doc_id bigint")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(stage)
                    .writeStream.foreachBatch(handle)
                    .queryName(f"sma_{uuid.uuid4().hex[:10]}")
                    .start()
                )
                try:
                    query.processAllAvailable()
                finally:
                    query.stop()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
    except Exception:
        unpersist_checkpoint(pinned)
        raise
    stream = spark.createDataFrame(
        rows,
        "doc_id bigint, verdict string, reason string,"
        " duplicate_of bigint",
    )
    # batch side: the SAME precedence composition over the SAME pinned
    # pair frames, unsplit — re-probing the six indexes through
    # increment_ingest_manifest would double the rung work for an
    # identical (deterministic) pair input, and what this certificate
    # tests is the COMPOSITION's batch-split commutativity
    batch = P._manifest_verdicts_tagged(pinned, inc_docs)
    # NULL duplicate_of (every "keep" row) would never match itself
    # in the outer join — compare through a sentinel
    dup_key = F.coalesce("duplicate_of", F.lit(-1)).alias("dup_key")
    s = stream.select("doc_id", "verdict", "reason", dup_key).groupBy(
        "doc_id", "verdict", "reason", "dup_key"
    ).agg(F.count(F.lit(1)).alias("cnt_s"))
    b = batch.select(
        "doc_id", "verdict", "reason", dup_key
    ).withColumn("bflag", F.lit(1))
    j = s.join(b, ["doc_id", "verdict", "reason", "dup_key"], "full")
    mismatch = (
        F.col("cnt_s").isNull()
        | F.col("bflag").isNull()
        | (F.col("cnt_s") != 1)
    )
    out = j.agg(
        F.sum(F.coalesce("cnt_s", F.lit(0)))
        .cast("bigint")
        .alias("n_stream"),
        F.count("bflag").alias("n_batch"),
        F.sum(F.when(mismatch, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatch"),
    )
    # the pinned probe checkpoints back the batch side's lazy plan —
    # release them only when the certificate itself is collected
    from smile_spark.session import release_checkpoints_on_gc

    release_checkpoints_on_gc(out, [pinned])
    return out


def streaming_manifest_agreement_sql() -> str:
    from smile_spark.operators.dedup import SETSIM_INC_MOD

    return (
        "WITH uni AS (SELECT doc_id FROM documents"
        f" WHERE doc_id % {SETSIM_INC_MOD} = 0)"
        " SELECT CAST(COUNT(*) AS BIGINT) AS n_stream,"
        " CAST(COUNT(*) AS BIGINT) AS n_batch,"
        " CAST(0 AS BIGINT) AS n_mismatch FROM uni"
    )
