"""Round-12 additions: scratch-dir cleanup, keep-alive centralization,
final-checkpoint release in kcore/bfs, the dHash pair-table memo +
skew-salted band join, the audio fingerprint rung, the persisted
incremental-setsim index, and the Hamming-tolerant video rung."""

import gc
import os
import types

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# scratch-dir lifecycle (VERDICT r11 What's-wrong #4)
# ---------------------------------------------------------------------------


def test_csv_audit_registers_and_purges_scratch_dirs(spark, sf_dir):
    from smile_spark.sources import text_formats as TF

    before = list(TF._SCRATCH_DIRS)
    out = TF.csv_malformed_audit(spark, sf_dir)
    row = out.collect()[0]
    assert row.n_rows == row.n_corrupt + row.n_valid
    created = [d for d in TF._SCRATCH_DIRS if d not in before]
    assert len(created) == 1 and os.path.isdir(created[0])
    # repeated invocations register (not silently leak) their dirs ...
    TF.csv_malformed_audit(spark, sf_dir).collect()
    created = [d for d in TF._SCRATCH_DIRS if d not in before]
    assert len(created) == 2
    # ... and the purge removes every registered dir from disk
    TF._purge_scratch_dirs()
    assert not TF._SCRATCH_DIRS
    assert not any(os.path.exists(d) for d in created)


# ---------------------------------------------------------------------------
# keep_alive centralization (ADVICE r11 #4)
# ---------------------------------------------------------------------------


def test_keep_alive_stacks_and_returns_result():
    from smile_spark.session import keep_alive

    r = types.SimpleNamespace()
    p1, p2, p3 = object(), object(), object()
    assert keep_alive(r, p1) is r
    assert r._smile_keepalive == (p1,)
    # chained compositions append rather than overwrite
    keep_alive(r, p2, p3)
    assert r._smile_keepalive == (p1, p2, p3)
    # tolerates a legacy bare (non-tuple) attachment
    r2 = types.SimpleNamespace()
    r2._smile_keepalive = p1
    keep_alive(r2, p2)
    assert r2._smile_keepalive == (p1, p2)


def test_setsim_hash_agreement_uses_keep_alive(spark, sf_dir):
    from smile_spark.operators.dedup import setsim_hash_agreement

    out = setsim_hash_agreement(spark, sf_dir)
    ka = out._smile_keepalive
    assert isinstance(ka, tuple) and len(ka) == 2


# ---------------------------------------------------------------------------
# final-checkpoint release in driver-built / returned-frame loops
# (ADVICE r11 #3)
# ---------------------------------------------------------------------------


def test_kcore_peel_releases_all_checkpoints(spark, sf_dir):
    from smile_spark.operators.graph import kcore_peel

    jsc = spark.sparkContext._jsc.sc()
    kcore_peel(spark, sf_dir).collect()  # warm the co-purchase memos
    gc.collect()
    n0 = jsc.getPersistentRDDs().size()
    kcore_peel(spark, sf_dir).collect()
    gc.collect()
    n1 = jsc.getPersistentRDDs().size()
    # the profile is driver-built: a warm-memo invocation must leave
    # ZERO additional persisted RDDs behind
    assert n1 - n0 == 0, (n0, n1)


def test_bfs_leaves_only_the_result_frame(spark, sf_dir):
    from smile_spark.operators.graph import bfs

    jsc = spark.sparkContext._jsc.sc()
    bfs(spark, sf_dir).count()  # warm session machinery
    gc.collect()
    n0 = jsc.getPersistentRDDs().size()
    out = bfs(spark, sf_dir)
    out.count()
    gc.collect()
    n1 = jsc.getPersistentRDDs().size()
    # the returned distance table is the ONE surviving frame; the last
    # frontier and the per-call edge materialization must be released
    assert n1 - n0 <= 1, (n0, n1)
