"""Bucketed parquet sink/source — the Spark-native CSR.

The reference's CSR layout exists so neighbor lookups touch one page
run (/root/reference/src/regtests/loadgraph_regtest.cpp:24-31).  The
distributed equivalent of "adjacency is physically co-located by
source node" is a table bucketed (and sorted) by ``src``: every join
or aggregation keyed on ``src`` then reads pre-partitioned data and
plans with ZERO exchange on the bucketed side.  At 100 TB that is the
difference between re-shuffling the edge set per query and never
shuffling it at all — bucketing is paid once at write time.

Bucketed tables must live in the session catalog (bucket metadata is
table metadata, not file metadata), hence ``saveAsTable`` rather than
path writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by
    ``bucket_cols`` as a catalog table, replacing any prior version."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata intact, so joins
    and aggregations on the bucket key skip their exchange)."""
    return spark.table(table_name)
