"""Small-file compaction — the table-maintenance pass every large
parquet deployment needs.

Streaming ingest and fine-grained partitioned writes leave behind
many small files; at 100 TB the cost is real (NameNode/listing
pressure, one scan task per tiny file, poor row-group compression).
Compaction rewrites a directory into files near a target size.  The
file count comes from the ACTUAL byte size of the input (via Spark's
Hadoop FileSystem, so it works on any supported filesystem), not from
the upstream partition count — the same lesson as
sources/partitioned.py: size output by volume, not by input shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total byte size of a directory via the Hadoop FileSystem API
    (works for local/HDFS/object-store URIs alike)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    return fs.getContentSummary(hadoop_path).getLength()


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ``in_path`` (parquet) to ``out_path`` with file count
    sized to ``target_file_bytes``.  Returns the file count chosen.

    Uses ``repartition`` (round-robin shuffle) rather than
    ``coalesce``: coalesce(n) narrows the plan and would leave skewed
    outputs when input files are uneven — exactly the case compaction
    exists to fix.
    """
    n_files = max(1, math.ceil(dir_bytes(spark, in_path) / target_file_bytes))
    df: DataFrame = spark.read.parquet(in_path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
