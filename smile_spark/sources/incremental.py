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
