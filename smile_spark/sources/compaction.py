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


def compaction_roundtrip(spark: SparkSession, sf_dir: str):
    """ONE-ROW certificate for the small-file compaction pass: write
    the documents table as 32 deliberately-small files, compact to a
    byte-sized target of one quarter of the directory (→ exactly 4
    output files), and prove the rewrite lossless with symmetric
    exceptAll counts — the table-maintenance contract (fewer files,
    identical rows) made driver-verifiable.

    Emits (n_files_before, n_files_after, n_rows, only_src, only_rt);
    the oracle pins 32 / 4 / the parquet row count / 0 / 0.
    """
    import math
    import os

    from pyspark.sql import functions as F

    from smile_spark.tables import table

    from smile_spark.session import scratch_dir

    docs = table(spark, sf_dir, "documents")
    base = scratch_dir("smile_compact_")
    src = os.path.join(base, "small")
    out = os.path.join(base, "compacted")
    docs.repartition(32).write.mode("overwrite").parquet(src)
    n_before = len(
        [
            f
            for f in os.listdir(src)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    )
    target = max(1, math.ceil(dir_bytes(spark, src) / 4))
    n_after = compact(spark, src, out, target_file_bytes=target)
    back = spark.read.parquet(out)
    n = back.agg(F.count(F.lit(1)).alias("n_rows"))
    only_src = docs.exceptAll(back).agg(
        F.count(F.lit(1)).alias("only_src")
    )
    only_rt = back.exceptAll(docs).agg(F.count(F.lit(1)).alias("only_rt"))
    return (
        n.crossJoin(only_src)
        .crossJoin(only_rt)
        .select(
            F.lit(n_before).cast("bigint").alias("n_files_before"),
            F.lit(n_after).cast("bigint").alias("n_files_after"),
            "n_rows",
            "only_src",
            "only_rt",
        )
    )


COMPACTION_ROUNDTRIP_SQL = (
    "SELECT CAST(32 AS BIGINT) AS n_files_before,"
    " CAST(4 AS BIGINT) AS n_files_after,"
    " COUNT(*) AS n_rows, CAST(0 AS BIGINT) AS only_src,"
    " CAST(0 AS BIGINT) AS only_rt FROM documents"
)
