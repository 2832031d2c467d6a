"""Incremental ingest: each batch sees exactly the files that arrived
since the last committed run; re-running without new arrivals is a
no-op; an uncommitted batch is re-processed (at-least-once)."""

import os

from smile_spark.sources.incremental import (
    commit_increment,
    read_increment,
)
from smile_spark.tables import table


def _land(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_incremental_batches(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest.json")

    # batch 1 arrives
    _land(ev.filter("event_id % 3 = 0"), os.path.join(landing, "b1"))
    df1, files1 = read_increment(spark, landing, manifest)
    n1 = df1.count()
    assert n1 == ev.filter("event_id % 3 = 0").count() and files1
    commit_increment(manifest, files1)

    # no new arrivals → no-op
    df_none, files_none = read_increment(spark, landing, manifest)
    assert df_none is None and files_none == []

    # batch 2 arrives; only its rows are read
    _land(ev.filter("event_id % 3 = 1"), os.path.join(landing, "b2"))
    df2, files2 = read_increment(spark, landing, manifest)
    assert df2.count() == ev.filter("event_id % 3 = 1").count()
    assert set(files1).isdisjoint(files2)

    # crash before commit → batch 2 is re-offered identically
    df2b, files2b = read_increment(spark, landing, manifest)
    assert sorted(files2b) == sorted(files2)
    commit_increment(manifest, files2b)
    assert read_increment(spark, landing, manifest)[0] is None
