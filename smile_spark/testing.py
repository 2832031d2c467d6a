"""Self-check harness: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (row count + schema + order-
insensitive value comparison at a given SF) so every operator can be
verified locally before the driver ever sees it — the engine-side
equivalent of the reference's write→reopen→compare round-trip tests
(/root/reference/src/tests/file_storage_test.cpp:53-76).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession

from smile_spark.tables import TABLE_NAMES


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL in DuckDB with the fixture tables as views."""
    import duckdb

    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS"
                f" SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted frame.

    Deliberately does NOT normalize integer/float dtypes: the driver's
    value hash is bit-exact over the fetched pandas frames, so a DuckDB
    HUGEINT (fetchdf → float64) vs a Spark BIGINT (int64) must FAIL
    here too, not be papered over (round-1 pivot_wide/date_functions
    regression class).  Only timestamps are floored to µs — that is a
    representation difference (ns vs µs), not a value difference.
    """
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.floor("us").astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
    out = out.sort_values(by=list(out.columns), na_position="last")
    return out.reset_index(drop=True)


def assert_matches_oracle(
    spark: SparkSession,
    query_fn,
    sql: str,
    sf_dir: str,
    check_exact: bool = True,
) -> None:
    """Assert a queries() callable matches its oracle SQL exactly."""
    got = canonicalize(query_fn(spark, sf_dir).toPandas())
    want = canonicalize(duckdb_oracle(sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)}"
        f" oracle={list(want.columns)}"
    )
    assert len(got) == len(want), (
        f"row count mismatch: spark={len(got)} oracle={len(want)}"
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=True, check_exact=check_exact
    )
