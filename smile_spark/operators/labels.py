"""Generic persisted cluster-label state for pair-graph dedup rungs.

The r14 label machinery (operators/multimodal.py — `_label_index_build`,
`_clusters_incremental`, `label_rollforward`, `_rolled_label_state`,
`label_compact`) gave the image/audio/video rungs the full production
lifecycle: nightly base-cluster labels, an increment-linear fold, an
LSM-style delta-log roll, and amortized compaction.  This module is
that core made RUNG-GENERIC (VERDICT r14 next-round #2/#4), so the
text rung (setsim ∪ MinHash pair graphs, operators/dedup.py) and the
cross-modal rung (joint image+video graph, operators/multimodal.py)
run the identical lifecycle without duplicating the machinery.

A rung is described by a :class:`LabelRung`: where its document
universe comes from, how to produce its BASE↔BASE pair set (the
corpus-linear nightly input), how to produce its increment-incident
pair set (the increment-linear daily input), which doc ids count as
"today's increment", and the parameter payload that invalidates
persisted state.  Everything else — cc labels over the base graph,
the collapsed-supernode fold, the base+delta reader, compaction, the
sidecar adoption contract, and the ADVICE-r14 crash ordering (remove
the sidecar BEFORE the first append, write the rolled state LAST) —
is shared code below.

Collapse-correctness argument (the multimodal r14 proof, unchanged):
a stored base label IS the min doc_id of its base component, so
min-label cc over the COLLAPSED graph — increment docs plus touched
base supernodes — yields exactly the labels of cc over the full joint
pair graph.  Unlike the oriented multimodal fold (probe ids always on
the `a` side), this core classifies EACH endpoint independently by
the rung's increment predicate, so rungs whose incident pair set also
contains increment↔increment edges (the cross-modal rung, whose
rolled state must equal the full joint clustering) fold exactly too.

Scale: the base build is the once-per-snapshot corpus-linear job
(priced cold in bench.py per rung); every fold is increment-sized
(the collapsed graph has one node per increment doc or touched
cluster); the rolled reader scans the corpus-sized base label table
ONCE with no exchange and applies the delta as a broadcast remap;
compaction is the amortized LSM knob, policed by
:func:`compact_if_needed` (delta rows vs base rows from cheap parquet
metadata counts).

Reference scope note: the reference engine (/root/reference, C++14)
has no incremental maintenance at all — this whole file is north-star
extension surface, built on the public LSM / Delta-Lake delta-log
pattern and the Shiloach-Vishkin-style pointer-jumping cc in
operators/graph.py::cc_labels.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LABEL_STATE_BUCKETS = 16

# rung name -> (appId, sf_dir) memo / sidecar-path registries.  The
# single-writer warehouse assumption of the whole persisted-index
# family applies unchanged (see dedup._setsim_index_tables).
_RO_READY: set[tuple[str, str, str]] = set()
_RO_SIDECARS: dict[str, set[str]] = {}
_ROLL_READY: set[tuple[str, str, str]] = set()
_ROLL_SIDECARS: dict[str, set[str]] = {}


@dataclass(frozen=True)
class LabelRung:
    """One dedup rung's inputs to the shared label lifecycle.

    ``universe(spark, sf_dir)`` — one-column (doc_id) frame naming
    every document of the rung.  ``base_pairs`` — the BASE↔BASE
    (a, b) pair frame (corpus-linear; runs only inside the nightly
    build).  ``inc_pairs`` — the increment-incident (a, b) pair frame
    (increment-linear; ≥1 endpoint satisfies ``is_increment``).
    ``is_increment(col)`` — Column predicate classifying a doc id as
    today's increment.  ``params(spark, sf_dir)`` — every build
    parameter that must invalidate persisted state (goes verbatim
    into both sidecar payloads).  ``base_count``/``fold_count`` —
    covered-block row counts (cheap metadata counts) so snapshot
    changes also invalidate."""

    name: str
    table_base: str
    universe: Callable[[SparkSession, str], DataFrame]
    base_pairs: Callable[[SparkSession, str], DataFrame]
    inc_pairs: Callable[[SparkSession, str], DataFrame]
    is_increment: Callable[[F.Column], F.Column]
    params: Callable[[SparkSession, str], dict]
    base_count: Callable[[SparkSession, str], int]
    fold_count: Callable[[SparkSession, str], int]
    # optional fast path (r16): produce the base (id, component)
    # labels DIRECTLY, row-equal to cc over base_pairs.  The text rung
    # contracts identical-token-set groups to representatives before
    # cc: groups are cliques, so contraction preserves components,
    # and min-label cc over reps (each rep IS its group's min doc id)
    # yields the same minima.  When set, the nightly build and the
    # roll-base restore use it instead of the generic pair-cc path.
    base_labels: Callable[[SparkSession, str], DataFrame] | None = None


def _registries(rung: LabelRung) -> None:
    _RO_SIDECARS.setdefault(rung.name, set())
    _ROLL_SIDECARS.setdefault(rung.name, set())


def _ro_table(rung: LabelRung, sf_dir: str) -> str:
    from smile_spark.sources.bucketed import bucket_table_name

    return bucket_table_name(f"{rung.table_base}_ro", sf_dir)


def roll_tables(rung: LabelRung, sf_dir: str) -> dict[str, str]:
    from smile_spark.sources.bucketed import bucket_table_name

    return {
        "labels": bucket_table_name(f"{rung.table_base}_labels", sf_dir),
        "delta": bucket_table_name(f"{rung.table_base}_delta", sf_dir),
    }


def _roll_sidecar_name(rung: LabelRung, sf_dir: str) -> str:
    from smile_spark.sources.bucketed import bucket_table_name

    return bucket_table_name(rung.table_base, sf_dir)


def _payload(
    spark: SparkSession,
    sf_dir: str,
    rung: LabelRung,
    op: str,
    tables: list[str],
) -> dict:
    p = dict(rung.params(spark, sf_dir))
    p.update(
        {
            "op": op,
            "base_rows": rung.base_count(spark, sf_dir),
            "n_buckets": LABEL_STATE_BUCKETS,
            "sf_dir": sf_dir,
            "tables": sorted(tables),
        }
    )
    return p


def _roll_payloads(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> tuple[dict, dict]:
    tables = roll_tables(rung, sf_dir)
    base = _payload(
        spark,
        sf_dir,
        rung,
        f"{rung.name}_labelroll",
        list(tables.values()),
    )
    base["state"] = "base"
    rolled = dict(base)
    rolled["state"] = "rolled"
    rolled["fold_rows"] = rung.fold_count(spark, sf_dir)
    return base, rolled


def clear_label_state(rung: LabelRung, which: str = "all") -> None:
    """Forget this rung's memos AND drop this process' adoption
    sidecars (built or adopted — the IVF contract), so the next call
    runs the cold build/fold paths (bench pricing).  ``which`` scopes
    the clear: "ro" (the read-only base label table), "roll" (the
    delta-log roll state), or "all" — the bench's roll-fold loop must
    clear ONLY the roll, or it would force the registered live-fold
    entries to rebuild the read-only table inside their timed pass."""
    from smile_spark.sources.bucketed import remove_sidecar_file

    _registries(rung)
    targets = {
        "ro": [(_RO_READY, _RO_SIDECARS[rung.name])],
        "roll": [(_ROLL_READY, _ROLL_SIDECARS[rung.name])],
        "all": [
            (_RO_READY, _RO_SIDECARS[rung.name]),
            (_ROLL_READY, _ROLL_SIDECARS[rung.name]),
        ],
    }[which]
    for ready, sidecars in targets:
        for key in [k for k in ready if k[2] == rung.name]:
            ready.discard(key)
        for path in list(sidecars):
            remove_sidecar_file(path)
            sidecars.discard(path)


def _with_base_labels(
    spark: SparkSession, sf_dir: str, rung: LabelRung, sink
) -> None:
    """Compute the rung's BASE-block cc labels (id, component) and
    hand them to ``sink`` while the pair checkpoint backing the plan
    is still alive (the multimodal `_with_base_labels` contract).  The
    pair frame's own upstream checkpoints (setsim/LSH builders tie
    theirs to the frame's gc) stay referenced until the local
    checkpoint below has materialized."""
    from smile_spark.operators.graph import cc_labels
    from smile_spark.session import unpersist_checkpoint

    if rung.base_labels is not None:
        # contraction fast path (r16): the rung produces the labels
        # directly (row-equal to cc over base_pairs by construction);
        # the frame owns its checkpoints' release, and sink consumes
        # it eagerly while it is alive
        sink(rung.base_labels(spark, sf_dir))
        return
    src = rung.base_pairs(spark, sf_dir)
    pairs = src.select("a", "b").distinct().localCheckpoint()
    del src  # upstream checkpoints may now release on gc
    try:
        und = pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).union(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        nodes = und.select(F.col("src").alias("id")).distinct()
        sink(cc_labels(nodes, und))
    finally:
        unpersist_checkpoint(pairs)


def label_index_build(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> str:
    """Persist the rung's READ-ONLY base label table (id, component)
    bucketed by id — the nightly clustering job the live incremental
    fold reads.  Standard sidecar-adoption contract."""
    from smile_spark.sources.bucketed import (
        drop_bucketed_table,
        sidecar_adoptable,
        sidecar_path,
        write_bucketed,
        write_sidecar,
    )

    _registries(rung)
    tbl = _ro_table(rung, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, rung.name)
    if key in _RO_READY:
        return tbl
    expected = _payload(spark, sf_dir, rung, f"{rung.name}_labels", [tbl])
    if sidecar_adoptable(spark, tbl, expected, [tbl]):
        _RO_SIDECARS[rung.name].add(sidecar_path(spark, tbl))
        _RO_READY.add(key)
        return tbl

    def sink(labels: DataFrame) -> None:
        drop_bucketed_table(spark, tbl)
        write_bucketed(labels, tbl, "id", n_buckets=LABEL_STATE_BUCKETS)
        _RO_SIDECARS[rung.name].add(write_sidecar(spark, tbl, expected))

    _with_base_labels(spark, sf_dir, rung, sink)
    _RO_READY.add(key)
    return tbl


def _fold_delta(
    spark: SparkSession,
    rung: LabelRung,
    inc: DataFrame,
    labels: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The collapsed-supernode merge: map every endpoint of the
    increment-incident pair set to its collapsed node (an increment
    doc → itself; a base doc → its stored label, or itself when it
    was unpaired), run min-label cc over the collapsed graph, and
    classify each collapsed node's delta kind: 0 = increment doc's
    new assignment, 1 = remap of an existing base cluster label,
    2 = a previously-unpaired base doc pulled into a cluster.

    Returns (delta(id, component, kind), endpoint_checkpoint) — the
    caller must unpersist the checkpoint after consuming the delta.
    Everything here is increment-sized at any corpus size; the only
    corpus-side touch is the id-keyed left join against the bucketed
    base label table."""
    from smile_spark.operators.graph import cc_labels

    ids = (
        inc.select(F.col("a").alias("id"))
        .union(inc.select(F.col("b").alias("id")))
        .distinct()
    )
    # endpoint -> (collapsed node s, was-unpaired-base flag)
    m = (
        ids.join(
            labels.select("id", "component"),
            "id",
            "left",
        )
        .select(
            "id",
            F.when(rung.is_increment(F.col("id")), F.col("id"))
            .otherwise(F.coalesce("component", F.col("id")))
            .alias("s"),
            (
                ~rung.is_increment(F.col("id"))
                & F.col("component").isNull()
            ).alias("unp"),
        )
        .localCheckpoint()
    )
    # the collapsed edge set is CHECKPOINTED (r16): cc_labels scans
    # its edge input once per round, and an unmaterialized e would
    # re-run the two m-joins + distinct in EVERY round (measured ~2 s
    # of the 4.5 s fold at sf0.1); e is increment-sized, so the
    # checkpoint is one tiny job.  Released as soon as cc_labels
    # returns — its final label table is its own checkpoint.
    from smile_spark.session import unpersist_checkpoint

    e = (
        inc.join(m.select(F.col("id").alias("a"), F.col("s").alias("sa")), "a")
        .join(m.select(F.col("id").alias("b"), F.col("s").alias("sb")), "b")
        .select("sa", "sb")
        .filter(F.col("sa") != F.col("sb"))
        .distinct()
        .localCheckpoint()
    )
    try:
        nodes = (
            e.select(F.col("sa").alias("id"))
            .union(e.select(F.col("sb").alias("id")))
            .distinct()
        )
        und = e.select(
            F.col("sa").alias("src"), F.col("sb").alias("dst")
        ).union(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        cc = cc_labels(nodes, und)
    finally:
        unpersist_checkpoint(e)
    # collapsed-node kinds: increment ids, unpaired base ids, and base
    # labels are pairwise disjoint (a base label is the min member of
    # a PAIRED component, so it is never an unpaired id; base and
    # increment ids are disjoint by predicate)
    kinds = m.groupBy("s").agg(F.max("unp").alias("unp"))
    delta = (
        cc.join(kinds.select(F.col("s").alias("id"), "unp"), "id", "left")
        .select(
            "id",
            "component",
            F.when(rung.is_increment(F.col("id")), F.lit(0))
            .when(F.coalesce("unp", F.lit(False)), F.lit(2))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("kind"),
        )
    )
    return delta, m


def _keep_list(universe: DataFrame, labels: DataFrame) -> DataFrame:
    """(doc_id, cluster_size, keep) over an effective (doc_id-keyed)
    label frame — min-id survivorship, singletons kept (the
    `_perceptual_keep_list` output contract)."""
    lbl = universe.join(
        labels.select(F.col("id").alias("doc_id"), "component"),
        "doc_id",
        "left",
    ).select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("lbl")
    )
    sizes = lbl.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return lbl.join(sizes, "lbl").select(
        "doc_id",
        "cluster_size",
        (F.col("doc_id") == F.col("lbl")).alias("keep"),
    )


def clusters_incremental(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> DataFrame:
    """Live incremental cluster fold: today's increment-incident pairs
    folded through the rung's PERSISTED read-only base labels —
    updated clusters and keep list for the whole rung universe without
    re-clustering the corpus.  Emits (doc_id, cluster_size, keep) for
    EVERY universe doc (the `_perceptual_keep_list` schema)."""
    from smile_spark.session import (
        release_checkpoints_on_gc,
        unpersist_checkpoint,
    )
    from smile_spark.sources.bucketed import read_bucketed

    tbl = label_index_build(spark, sf_dir, rung)
    labels = read_bucketed(spark, tbl)
    inc_src = rung.inc_pairs(spark, sf_dir)
    inc = inc_src.select("a", "b").distinct().localCheckpoint()
    # inc is a self-contained checkpoint now; the source frame (and
    # any gc-tied upstream checkpoints it owns) may release
    del inc_src
    delta, m = _fold_delta(spark, rung, inc, labels)
    try:
        relabel = delta.select(
            F.col("id").alias("lbl0"), F.col("component").alias("c2")
        )
        lbl0 = (
            rung.universe(spark, sf_dir)
            .join(
                labels.select(F.col("id").alias("doc_id"), "component"),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("component", F.col("doc_id")).alias("lbl0"),
            )
        )
        final = lbl0.join(F.broadcast(relabel), "lbl0", "left").select(
            "doc_id", F.coalesce("c2", F.col("lbl0")).alias("lbl")
        )
        sizes = final.groupBy("lbl").agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size")
        )
        out = final.join(sizes, "lbl").select(
            "doc_id",
            "cluster_size",
            (F.col("doc_id") == F.col("lbl")).alias("keep"),
        )
    except Exception:
        unpersist_checkpoint(m)
        unpersist_checkpoint(inc)
        raise
    release_checkpoints_on_gc(out, [m, inc])
    return out


def _roll_base_write(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> None:
    """Corpus-linear base build of the ROLL state: cc labels into the
    roll's label table plus an EMPTY delta (the schema the fold
    appends)."""
    from smile_spark.sources.bucketed import (
        drop_bucketed_table,
        write_bucketed,
    )

    tables = roll_tables(rung, sf_dir)

    def sink(labels: DataFrame) -> None:
        for t in tables.values():
            drop_bucketed_table(spark, t)
        write_bucketed(
            labels, tables["labels"], "id", n_buckets=LABEL_STATE_BUCKETS
        )
        write_bucketed(
            labels.select(
                "id", "component", F.lit(0).cast("int").alias("kind")
            ).limit(0),
            tables["delta"],
            "id",
            n_buckets=LABEL_STATE_BUCKETS,
        )

    _with_base_labels(spark, sf_dir, rung, sink)


def roll_restore_base(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> None:
    """Bench/test device: force the roll tables back to the pre-fold
    BASE state (drop + corpus-linear rebuild + base sidecar) so the
    next roll-forward performs the fold alone.  Production never
    calls this."""
    from smile_spark.sources.bucketed import write_sidecar

    _registries(rung)
    key = (spark.sparkContext.applicationId, sf_dir, rung.name)
    _ROLL_READY.discard(key)
    _roll_base_write(spark, sf_dir, rung)
    pb, _ = _roll_payloads(spark, sf_dir, rung)
    _ROLL_SIDECARS[rung.name].add(
        write_sidecar(spark, _roll_sidecar_name(rung, sf_dir), pb)
    )


def _roll_fold(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> None:
    """Append the day's merged labels as DELTA rows — the
    increment-linear nightly step.  On an in-process append failure
    the tables are dropped (the sidecar is ALREADY gone: the caller
    removed it before invoking, the ADVICE-r14 crash ordering), so no
    half-appended state ever adopts."""
    from smile_spark.session import unpersist_checkpoint
    from smile_spark.sources.bucketed import (
        append_bucketed,
        drop_bucketed_table,
        read_bucketed,
    )

    tables = roll_tables(rung, sf_dir)
    labels = read_bucketed(spark, tables["labels"])
    inc_src = rung.inc_pairs(spark, sf_dir)
    inc = inc_src.select("a", "b").distinct().localCheckpoint()
    del inc_src
    delta, m = _fold_delta(spark, rung, inc, labels)
    try:
        try:
            append_bucketed(
                delta,
                tables["delta"],
                "id",
                n_buckets=LABEL_STATE_BUCKETS,
            )
        except Exception:
            for t in tables.values():
                drop_bucketed_table(spark, t)
            raise
    finally:
        unpersist_checkpoint(m)
        unpersist_checkpoint(inc)


def label_rollforward(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> dict[str, str]:
    """Advance the rung's persisted LABEL state from covering the BASE
    block to covering base ∪ increment by appending a delta of merged
    labels.  Three-state contract per (application, sf_dir, rung):
    adopt rolled → fold over base → full rebuild then fold; every
    parameter lives in both sidecar payloads, so parameter changes
    always land in the rebuild arm.  Crash contract (ADVICE r14): the
    sidecar is removed BEFORE the first append and the rolled sidecar
    written LAST, so a process crash anywhere inside the fold leaves
    no adoptable state — a second fold (silent delta duplication) is
    structurally impossible."""
    from smile_spark.sources.bucketed import (
        remove_sidecar_file,
        sidecar_adoptable,
        sidecar_path,
        write_sidecar,
    )

    _registries(rung)
    tables = roll_tables(rung, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, rung.name)
    if key in _ROLL_READY:
        return tables
    name = _roll_sidecar_name(rung, sf_dir)
    pb, pr = _roll_payloads(spark, sf_dir, rung)
    if sidecar_adoptable(spark, name, pr, list(tables.values())):
        _ROLL_SIDECARS[rung.name].add(sidecar_path(spark, name))
        _ROLL_READY.add(key)
        return tables
    if not sidecar_adoptable(spark, name, pb, list(tables.values())):
        _roll_base_write(spark, sf_dir, rung)
    scpath = sidecar_path(spark, name)
    remove_sidecar_file(scpath)
    _ROLL_SIDECARS[rung.name].discard(scpath)
    _roll_fold(spark, sf_dir, rung)
    _ROLL_SIDECARS[rung.name].add(write_sidecar(spark, name, pr))
    _ROLL_READY.add(key)
    return tables


def rolled_label_state(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> DataFrame:
    """The EFFECTIVE rolled label state (id, component): base labels
    with the delta's remap applied (broadcast — the delta is
    increment-sized), plus the delta's new rows (increment docs and
    previously-unpaired base docs).  The corpus-sized base table is
    scanned once with no exchange; everything else is delta-sized."""
    from smile_spark.sources.bucketed import read_bucketed

    tables = label_rollforward(spark, sf_dir, rung)
    base = read_bucketed(spark, tables["labels"])
    delta = read_bucketed(spark, tables["delta"])
    remap = delta.filter(F.col("kind") >= 1).select(
        F.col("id").alias("lbl0"), F.col("component").alias("c2")
    )
    eff_base = base.join(
        F.broadcast(remap), base["component"] == F.col("lbl0"), "left"
    ).select(
        base["id"].alias("id"),
        F.coalesce("c2", base["component"]).alias("component"),
    )
    extra = delta.filter(
        (F.col("kind") == 0) | (F.col("kind") == 2)
    ).select("id", "component")
    return eff_base.unionByName(extra)


def labels_rolled(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> DataFrame:
    """Keep-list view over the ROLLED label state — (doc_id,
    cluster_size, keep) for every universe doc, byte-identical to the
    rung's `clusters_incremental` output (same joint pair graph, same
    survivorship rule), but served from the persisted base + delta
    instead of a live fold."""
    eff = rolled_label_state(spark, sf_dir, rung)
    return _keep_list(rung.universe(spark, sf_dir), eff)


def label_compact(
    spark: SparkSession, sf_dir: str, rung: LabelRung
) -> dict[str, str]:
    """LSM-style compaction: rewrite the base label table as the
    EFFECTIVE rolled state and truncate the delta — amortized
    corpus-linear.  Readers see an identical state before and after.
    Crash contract: sidecar removed FIRST, rewritten LAST (the
    multimodal label_compact ordering), so a crash anywhere inside
    leaves no adoptable state."""
    from smile_spark.sources.bucketed import (
        drop_bucketed_table,
        read_bucketed,
        remove_sidecar_file,
        sidecar_path,
        write_bucketed,
        write_sidecar,
    )

    _registries(rung)
    tables = label_rollforward(spark, sf_dir, rung)
    name = _roll_sidecar_name(rung, sf_dir)
    _, pr = _roll_payloads(spark, sf_dir, rung)
    eff = rolled_label_state(spark, sf_dir, rung)
    empty_delta = spark.createDataFrame(
        [], read_bucketed(spark, tables["delta"]).schema
    )
    scpath = sidecar_path(spark, name)
    remove_sidecar_file(scpath)
    _ROLL_SIDECARS[rung.name].discard(scpath)
    tmp = f"{tables['labels']}_cmp"
    drop_bucketed_table(spark, tmp)
    write_bucketed(eff, tmp, "id", n_buckets=LABEL_STATE_BUCKETS)
    drop_bucketed_table(spark, tables["labels"])
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {tables['labels']}")
    write_bucketed(
        empty_delta, tables["delta"], "id", n_buckets=LABEL_STATE_BUCKETS
    )
    _ROLL_SIDECARS[rung.name].add(write_sidecar(spark, name, pr))
    return tables


def keep_list_sql(pairs_sql: str, universe_sql: str) -> str:
    """DuckDB twin of :func:`_keep_list`: the clustering replayed as a
    recursive min-reachability CTE over the same closed-form pair set
    (the multimodal `_keep_list_sql` device, re-exported here so text
    and cross-modal rung oracles need no multimodal import)."""
    return (
        "WITH RECURSIVE pairs AS ("
        f" SELECT a, b FROM ({pairs_sql}) p),"
        " und AS (SELECT a, b FROM pairs"
        "  UNION ALL SELECT b AS a, a AS b FROM pairs),"
        " nodes AS (SELECT DISTINCT a AS id FROM und),"
        " reach(id, r) AS ("
        "  SELECT id, id FROM nodes"
        "  UNION"
        "  SELECT rr.id, u.b FROM reach rr JOIN und u ON u.a = rr.r),"
        " comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id),"
        " sizes AS (SELECT c, COUNT(*) AS cluster_size FROM comp"
        "  GROUP BY c),"
        f" uni AS ({universe_sql})"
        " SELECT uni.doc_id,"
        "  CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,"
        "  (c.c IS NULL OR c.c = uni.doc_id) AS keep"
        " FROM uni LEFT JOIN comp c ON c.id = uni.doc_id"
        " LEFT JOIN sizes s ON s.c = c.c"
    )


# Compact when the accumulated delta exceeds this fraction of the base
# label table: below it, the broadcast remap and the appended reader
# rows are strictly cheaper than a corpus-linear rewrite; above it,
# reader overhead (delta-sized broadcast per query + growing emitted
# block) starts to rival the one-off rewrite the threshold amortizes.
COMPACT_MAX_DELTA_FRAC = 0.5


def compact_if_needed(
    spark: SparkSession,
    sf_dir: str,
    rung: LabelRung,
    max_delta_frac: float = COMPACT_MAX_DELTA_FRAC,
) -> bool:
    """The compaction POLICY (VERDICT r14 next-round #5): compact when
    delta rows exceed ``max_delta_frac`` × base label rows — both
    cheap parquet metadata counts, so the check itself costs two
    footer reads, never a scan.  Returns True iff a compaction ran.
    At 100 TB this is the nightly job's closing step: fold, check,
    amortize."""
    from smile_spark.sources.bucketed import read_bucketed

    tables = label_rollforward(spark, sf_dir, rung)
    n_delta = read_bucketed(spark, tables["delta"]).count()
    n_base = read_bucketed(spark, tables["labels"]).count()
    if n_delta <= max_delta_frac * max(n_base, 1):
        return False
    label_compact(spark, sf_dir, rung)
    return True
