"""CSV / JSON-lines sources and sinks with explicit schemas.

The reference supports exactly one external format — its text edge
list (SURVEY.md §2.2; sources/edge_list.py) — but any real deployment
ingests CSV and JSONL.  Two rules, both scale-motivated:

* **Explicit schemas only.**  ``inferSchema`` (CSV) / schema sampling
  (JSON) cost a full extra pass over the data before the real job
  starts — at 100 TB that doubles ingest I/O.  Every reader here takes
  a ``StructType`` (or a source DataFrame whose schema to reuse).
* **Timestamps serialize at microsecond resolution** in a fixed
  pattern, so a parquet→csv→parquet round trip is lossless at Spark's
  native timestamp precision (the engine's comparison resolution — see
  smile_spark/testing.py).

Readers are ordinary distributed scans: a multi-TB CSV directory
splits by file/offset exactly like parquet (minus row-group stats —
predicates on CSV can't prune, which is why parquet stays the primary
format and these are ingest/egress edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Microsecond-precision pattern shared by writer and reader; Spark's
# TimestampType is µs-exact, so this round-trips losslessly.
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_CSV_OPTIONS = {
    "header": "true",
    "timestampFormat": TS_FORMAT,
    # quote/escape defaults (RFC-4180-ish) — set explicitly so the
    # written form is stable across Spark versions
    "quote": '"',
    "escape": '"',
}

# Scratch directories created by the round-trip certificates are
# purged at interpreter exit (ADVICE/VERDICT r11: every
# csv_malformed_audit invocation leaked a smile_csv_dirty_* dir for
# the life of the box); the shared engine-wide helper lives in
# smile_spark.session.
from smile_spark.session import scratch_dir as _scratch_dir  # noqa: E402


_JSON_OPTIONS = {"timestampFormat": TS_FORMAT}


def write_csv(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a DataFrame as a header-ed CSV directory.

    ``partitions`` controls output file count (None keeps the upstream
    partitioning); sizing output files is the writer's job — a 100 TB
    egress wants a repartition to target-file-size, not one file per
    upstream shuffle partition.
    """
    if partitions is not None:
        df = df.repartition(partitions)
    df.write.mode("overwrite").options(**_CSV_OPTIONS).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | DataFrame
) -> DataFrame:
    """Read a CSV directory with an explicit schema (no inference pass).

    ``schema`` may be a StructType or a DataFrame to copy the schema
    from (the common round-trip case).
    """
    st = schema.schema if isinstance(schema, DataFrame) else schema
    return (
        spark.read.options(**_CSV_OPTIONS)
        .schema(st)
        .option("mode", "FAILFAST")  # malformed rows fail loudly
        .csv(path)
    )


def write_jsonl(
    df: DataFrame, path: str, partitions: int | None = None
) -> None:
    """Write a DataFrame as JSON-lines (one object per line)."""
    if partitions is not None:
        df = df.repartition(partitions)
    df.write.mode("overwrite").options(**_JSON_OPTIONS).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | DataFrame
) -> DataFrame:
    """Read JSON-lines with an explicit schema (no sampling pass)."""
    st = schema.schema if isinstance(schema, DataFrame) else schema
    return (
        spark.read.options(**_JSON_OPTIONS)
        .schema(st)
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_orc(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a DataFrame as ORC — the second columnar interchange
    format (Hive/Trino ecosystems).  Columnar + predicate pushdown
    like parquet, so it is a peer primary format, not an ingest edge."""
    if partitions is not None:
        df = df.repartition(partitions)
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC directory (schema travels with the data, same as
    parquet — no explicit schema needed)."""
    return spark.read.orc(path)


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW losslessness certificate for the JSONL egress/ingest
    edge: export the documents table to JSON-lines, read it back with
    the explicit schema, and emit (n_rows, only_src, only_rt) where
    the two symmetric ``exceptAll`` counts must be ZERO — byte-level
    text fidelity through JSON escaping (newlines, quotes, non-ASCII)
    proven distributively, no driver data path.  The oracle pins the
    row count from the parquet original and both asymmetry counts to
    zero, so any serialization loss flips the hash gate.

    Scale: export and re-read are ordinary distributed passes; the
    exceptAll legs are hash anti-joins on full rows (at 100 TB you
    would compare md5 fingerprints per row instead of full rows —
    same plan shape, narrower shuffle).
    """
    from smile_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    out = _scratch_dir("smile_jsonl_rt_")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, docs)
    n = back.agg(F.count(F.lit(1)).alias("n_rows"))
    only_src = docs.exceptAll(back).agg(
        F.count(F.lit(1)).alias("only_src")
    )
    only_rt = back.exceptAll(docs).agg(
        F.count(F.lit(1)).alias("only_rt")
    )
    return n.crossJoin(only_src).crossJoin(only_rt)


JSONL_ROUNDTRIP_SQL = (
    "SELECT COUNT(*) AS n_rows, CAST(0 AS BIGINT) AS only_src,"
    " CAST(0 AS BIGINT) AS only_rt FROM documents"
)


def schema_evolution_certificate(spark: SparkSession, sf_dir: str):
    """ONE-ROW certificate for additive parquet schema evolution: land
    generation-1 files with a SUBSET of the documents schema (doc_id,
    text), generation-2 files with the full schema plus a new column,
    then read both generations together with ``mergeSchema`` — the
    contract every long-lived 100 TB table relies on (columns get
    added; old files stay readable; missing columns surface as NULL,
    never as errors or silent drops).

    Emits (n_rows, n_old_gen, n_new_gen, null_new_col, only_src,
    only_rt): generation counts by provenance, the NULL count of the
    added column (must equal the old generation's rows), and a
    symmetric exceptAll proof that doc_id/text survive both
    generations byte-for-byte.
    """
    import os

    from smile_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    base = _scratch_dir("smile_schev_")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .withColumn("quality_tier", F.lit("v2"))
    )
    old.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    new.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=1"), os.path.join(base, "gen=2")
    )
    src = docs.select("doc_id", "text")
    back = merged.select("doc_id", "text")
    agg = merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("quality_tier").isNull().cast("bigint")).alias(
            "null_new_col"
        ),
        F.sum((F.col("quality_tier") == "v2").cast("bigint")).alias(
            "n_new_gen"
        ),
    ).select(
        "n_rows",
        (F.col("n_rows") - F.col("n_new_gen")).alias("n_old_gen"),
        "n_new_gen",
        "null_new_col",
    )
    only_src = src.exceptAll(back).agg(
        F.count(F.lit(1)).alias("only_src")
    )
    only_rt = back.exceptAll(src).agg(F.count(F.lit(1)).alias("only_rt"))
    return agg.crossJoin(only_src).crossJoin(only_rt)


SCHEMA_EVOLUTION_SQL = (
    "SELECT COUNT(*) AS n_rows,"
    " CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_old_gen,"
    " CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_new_gen,"
    " CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS null_new_col,"
    " CAST(0 AS BIGINT) AS only_src, CAST(0 AS BIGINT) AS only_rt"
    " FROM documents"
)


# --- malformed-row ingest accounting (PERMISSIVE CSV) -----------------------

# every CSV_CORRUPT_MOD-th order lands with a non-numeric price field
CSV_CORRUPT_MOD = 10


def csv_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW certificate for error-tolerant CSV ingest — the source-
    level sibling of the expression-level ``try_cast_handling``: land
    an orders extract as raw CSV text with a DETERMINISTIC corruption
    (every CSV_CORRUPT_MOD-th order's price field replaced by a
    non-numeric token — the classic dirty-feed row), read it back with
    an explicit schema in PERMISSIVE mode with a declared
    ``_corrupt_record`` column, and account for every row: corrupt
    rows must be quarantined (corrupt-record populated, price NULL),
    valid rows must parse exactly.

    Emits (n_rows, n_corrupt, n_valid, bad_price_nulls,
    sum_valid_price): total read back, quarantined count, clean count,
    NULL-price count among quarantined (must equal n_corrupt — the
    malformed field never half-parses), and the DECIMAL-exact price
    sum over clean rows.  The oracle recomputes all five from the
    parquet original in closed form, so a silent row drop, a
    mis-quarantine, or a half-parsed corrupt row flips the hash gate.

    Scale: the write is one distributed text pass; the read is an
    ordinary splittable CSV scan — PERMISSIVE mode is exactly how a
    100 TB dirty feed is landed (quarantine-and-continue, never
    fail-the-job, never silently drop).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
    )

    from smile_spark.tables import table

    orders = table(spark, sf_dir, "orders")
    # deterministic corruption at the TEXT level: the price field of
    # every CSV_CORRUPT_MOD-th order becomes a non-numeric token
    lines = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.when(
                F.col("o_orderkey") % CSV_CORRUPT_MOD == 0, F.lit("oops")
            ).otherwise(F.col("o_totalprice").cast("string")),
            F.col("o_orderpriority"),
        ).alias("value")
    )
    out = _scratch_dir("smile_csv_dirty_")
    lines.write.mode("overwrite").text(out)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderpriority", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    from smile_spark.functions.numeric import dsum

    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("bigint")).alias(
            "n_corrupt"
        ),
        F.sum(F.col("_corrupt_record").isNull().cast("bigint")).alias(
            "n_valid"
        ),
        F.sum(
            (
                F.col("_corrupt_record").isNotNull()
                & F.col("o_totalprice").isNull()
            ).cast("bigint")
        ).alias("bad_price_nulls"),
        dsum(
            F.when(
                F.col("_corrupt_record").isNull(), F.col("o_totalprice")
            ),
            "sum_valid_price",
        ),
    )


CSV_MALFORMED_AUDIT_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,"
    f" CAST(SUM(CASE WHEN o_orderkey % {CSV_CORRUPT_MOD} = 0"
    "   THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,"
    f" CAST(SUM(CASE WHEN o_orderkey % {CSV_CORRUPT_MOD} <> 0"
    "   THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,"
    f" CAST(SUM(CASE WHEN o_orderkey % {CSV_CORRUPT_MOD} = 0"
    "   THEN 1 ELSE 0 END) AS BIGINT) AS bad_price_nulls,"
    " CAST(SUM(CASE WHEN o_orderkey % "
    f"{CSV_CORRUPT_MOD} <> 0 THEN CAST(o_totalprice AS DECIMAL(18,2))"
    "   END) AS DOUBLE) AS sum_valid_price"
    " FROM orders"
)
