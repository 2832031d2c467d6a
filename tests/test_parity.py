"""Oracle-parity tests: every queries() entry with an oracle must match
DuckDB exactly at sf0.001 — the local mirror of the driver's t2 gate."""

import pytest

import __spark_entry__ as entry_mod
from smile_spark.testing import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    assert_matches_oracle(spark, QUERIES[name], ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"
