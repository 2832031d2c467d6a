"""Incremental batch ingest: process only files not yet seen.

The production shape for daily/hourly increments when Structured
Streaming is too heavy: a landing directory accumulates files, each
batch run lists the directory, anti-joins against a persisted manifest
of already-processed files, reads ONLY the new ones, and appends them
to the manifest on success.  The listing is driver-side metadata (file
names, not data) — the data itself is read as an ordinary distributed
scan restricted to the new paths, so a 100 TB landing zone costs one
directory listing plus I/O proportional to the increment.

The manifest is a plain JSON file (single-writer, like the catalog —
SURVEY.md §7.3); production variants keep it in a table or use
Spark's own streaming file-source checkpoint, which this mirrors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _list_data_files(path: str, suffix: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix) and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def load_manifest(manifest_path: str) -> set[str]:
    if not os.path.exists(manifest_path):
        return set()
    with open(manifest_path) as f:
        return set(json.load(f)["processed"])


def save_manifest(manifest_path: str, processed: set[str]) -> None:
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": 1, "processed": sorted(processed)}, f)
    os.replace(tmp, manifest_path)  # atomic single-writer update


def read_increment(
    spark: SparkSession,
    landing_dir: str,
    manifest_path: str,
    suffix: str = ".parquet",
) -> tuple[DataFrame | None, list[str]]:
    """Return (DataFrame over NEW files only, list of those files).

    Returns (None, []) when there is nothing new.  The caller commits
    the increment by passing the file list to ``commit_increment``
    AFTER its own write succeeds — crash between read and commit means
    the files are simply re-processed next run (at-least-once; make
    the downstream write idempotent, e.g. overwrite-by-partition).
    """
    seen = load_manifest(manifest_path)
    new = [f for f in _list_data_files(landing_dir, suffix) if f not in seen]
    if not new:
        return None, []
    return spark.read.parquet(*new), new


def commit_increment(manifest_path: str, files: list[str]) -> None:
    """Record files as processed (call after the downstream write)."""
    seen = load_manifest(manifest_path)
    save_manifest(manifest_path, seen | set(files))


def incremental_ingest_certificate(spark: SparkSession, sf_dir: str):
    """ONE-ROW certificate for manifest-tracked incremental ingest:
    land the events table as three batch files, drain them through
    :func:`read_increment` / :func:`commit_increment` one batch at a
    time, then prove (a) a fourth poll sees nothing new (exactly-once
    accounting over at-least-once delivery), and (b) the union of the
    ingested increments equals the source table row-for-row
    (symmetric exceptAll counts).

    Emits (n_batches, n_files, n_rows, n_new_after, only_src,
    only_rt); the oracle pins 3 / 3 / the events row count / 0 / 0 /
    0.
    """

    from pyspark.sql import functions as F

    from smile_spark.tables import table

    from smile_spark.session import scratch_dir

    ev = table(spark, sf_dir, "events")
    base = scratch_dir("smile_incr_")
    landing = os.path.join(base, "landing")
    manifest = os.path.join(base, "manifest.json")
    parts = []
    n_files = 0
    n_batches = 0
    # land → poll → commit, one batch at a time: each poll must see
    # exactly the one newly-arrived file
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(landing, f"b{i}"))
        df, files = read_increment(spark, landing, manifest)
        if df is None:
            continue
        parts.append(df)
        n_files += len(files)
        n_batches += 1
        commit_increment(manifest, files)
    extra, _ = read_increment(spark, landing, manifest)
    n_new_after = 0 if extra is None else 1
    ingested = parts[0]
    for p in parts[1:]:
        ingested = ingested.unionByName(p)
    n = ingested.agg(F.count(F.lit(1)).alias("n_rows"))
    only_src = ev.exceptAll(ingested).agg(
        F.count(F.lit(1)).alias("only_src")
    )
    only_rt = ingested.exceptAll(ev).agg(
        F.count(F.lit(1)).alias("only_rt")
    )
    return (
        n.crossJoin(only_src)
        .crossJoin(only_rt)
        .select(
            F.lit(n_batches).cast("bigint").alias("n_batches"),
            F.lit(n_files).cast("bigint").alias("n_files"),
            "n_rows",
            F.lit(n_new_after).cast("bigint").alias("n_new_after"),
            "only_src",
            "only_rt",
        )
    )


INCREMENTAL_INGEST_SQL = (
    "SELECT CAST(3 AS BIGINT) AS n_batches,"
    " CAST(3 AS BIGINT) AS n_files, COUNT(*) AS n_rows,"
    " CAST(0 AS BIGINT) AS n_new_after,"
    " CAST(0 AS BIGINT) AS only_src, CAST(0 AS BIGINT) AS only_rt"
    " FROM events"
)
