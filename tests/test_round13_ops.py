"""Round-13 additions: setsim index warehouse adoption (VERDICT r12
next-round #5 + ADVICE #2/#3), the persisted perceptual fingerprint
index (#2), the persisted PQ index (#3), and the cross-modal
video-frame <-> image rung (#4)."""

import gc
import json

import pytest  # noqa: F401


# ---------------------------------------------------------------------------
# setsim_index_build: warehouse adoption sidecar (VERDICT r12 #5)
# ---------------------------------------------------------------------------


def _setsim_sidecar_path(spark, sf_dir):
    from smile_spark.operators import dedup as D
    from smile_spark.sources import bucketed as BK

    hash_tokens = D._setsim_hash_conf(spark)
    name = BK.bucket_table_name(
        f"setsim_idx_{'h1' if hash_tokens else 'h0'}", sf_dir
    )
    return BK.sidecar_path(spark, name)


def test_setsim_index_adopted_by_fresh_session(spark, sf_dir, monkeypatch):
    """A second 'session' (per-process memo cleared, warehouse and
    catalog intact) must ADOPT the persisted index — zero drop/write
    jobs — instead of unconditionally rebuilding."""
    from smile_spark.operators import dedup as D
    from smile_spark.sources import bucketed as BK

    D.clear_setsim_index_cache()
    t1 = D.setsim_index_build(spark, sf_dir)
    # simulate the fresh session: only the per-process memo is gone
    D._SETSIM_INDEX_READY.clear()
    writes = []
    drops = []
    real_write = BK.write_bucketed
    monkeypatch.setattr(
        BK,
        "write_bucketed",
        lambda *a, **k: (writes.append(a), real_write(*a, **k)),
    )
    monkeypatch.setattr(
        BK, "drop_bucketed_table", lambda *a, **k: drops.append(a)
    )
    assert D.setsim_index_build(spark, sf_dir) == t1
    assert writes == [] and drops == [], "adoption ran a rebuild job"
    # and the adopted index actually serves the probe
    assert D.setsim_incremental_indexed(spark, sf_dir).count() >= 0


def test_setsim_index_stale_sidecar_rebuilds(spark, sf_dir, monkeypatch):
    """A sidecar whose snapshot fingerprint no longer matches (the
    corpus changed under the index) must force the drop-and-rebuild
    path, never adopt."""
    from smile_spark.operators import dedup as D
    from smile_spark.sources import bucketed as BK

    D.clear_setsim_index_cache()
    t1 = D.setsim_index_build(spark, sf_dir)
    path = _setsim_sidecar_path(spark, sf_dir)
    with open(path) as fh:
        payload = json.load(fh)
    payload["base_rows"] += 1  # pretend the snapshot grew
    with open(path, "w") as fh:
        json.dump(payload, fh)
    D._SETSIM_INDEX_READY.clear()
    writes = []
    real_write = BK.write_bucketed
    monkeypatch.setattr(
        BK,
        "write_bucketed",
        lambda *a, **k: (writes.append(a), real_write(*a, **k))[1],
    )
    assert D.setsim_index_build(spark, sf_dir) == t1
    assert len(writes) == 4, "stale sidecar must trigger a full rebuild"


def test_setsim_index_build_failure_releases_checkpoints(
    spark, sf_dir, monkeypatch
):
    """ADVICE r12 #2 pin: a drop/write failure mid-build must still
    unpersist the toks/membership localCheckpoints (try/finally), so
    retries never accumulate leaked blocks."""
    from smile_spark.operators import dedup as D
    from smile_spark.sources import bucketed as BK

    D.clear_setsim_index_cache()
    jsc = spark.sparkContext._jsc.sc()
    gc.collect()
    n0 = jsc.getPersistentRDDs().size()

    def boom(*a, **k):
        raise RuntimeError("injected write failure")

    monkeypatch.setattr(BK, "write_bucketed", boom)
    with pytest.raises(RuntimeError, match="injected"):
        D.setsim_index_build(spark, sf_dir)
    gc.collect()
    n1 = jsc.getPersistentRDDs().size()
    assert n1 - n0 <= 0, (n0, n1)
    # memo must NOT be set after a failed build
    assert not any(k[1] == sf_dir for k in D._SETSIM_INDEX_READY)
    # restore: a clean rebuild leaves a valid index for later tests
    monkeypatch.undo()
    D.clear_setsim_index_cache()
    D.setsim_index_build(spark, sf_dir)
