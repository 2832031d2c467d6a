"""Date-partitioned parquet sink/source — the 100 TB table layout.

A time-series table at scale is stored partitioned by a date column:
`path/event_date=2024-01-05/part-*.parquet`.  Readers filtering on
the partition column never open non-matching directories — partition
pruning, visible in the plan as ``PartitionFilters`` — which is what
turns "scan 100 TB" into "scan one day".  The reference's analogue is
nothing: its paged file has no pruning of any kind; every scan is a
full file pass (/root/reference/src/regtests/scan_regtest.cpp:27-34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    date_col: str = "event_date",
) -> None:
    """Write ``df`` partitioned by the date of ``ts_col``.

    Partition count = #distinct dates; rows stay in their arrival
    partitions otherwise (no extra shuffle — the writer splits files
    by partition value within each task).
    """
    df.withColumn(date_col, F.to_date(F.col(ts_col))).write.mode(
        "overwrite"
    ).partitionBy(date_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a date-partitioned table (partition column reconstructed
    from directory names; filters on it prune directories)."""
    return spark.read.parquet(path)
