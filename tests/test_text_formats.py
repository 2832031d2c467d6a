"""CSV / JSONL source round-trips: parquet → text format → back must be
lossless under each table's explicit schema — the engine-side analogue
of the reference's storage write→reopen→compare round-trip
(/root/reference/src/tests/file_storage_test.cpp:53-76)."""

import pytest

from smile_spark.sources.text_formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from smile_spark.tables import table


def _assert_same_rows(a, b):
    assert a.schema == b.schema
    assert a.exceptAll(b).isEmpty()
    assert b.exceptAll(a).isEmpty()


@pytest.mark.parametrize("name", ["orders", "events", "documents"])
def test_csv_round_trip(spark, sf_dir, tmp_path, name):
    src = table(spark, sf_dir, name)
    path = str(tmp_path / f"{name}_csv")
    write_csv(src, path, partitions=4)
    back = read_csv(spark, path, src)
    _assert_same_rows(src, back)


@pytest.mark.parametrize("name", ["orders", "events"])
def test_jsonl_round_trip(spark, sf_dir, tmp_path, name):
    src = table(spark, sf_dir, name)
    path = str(tmp_path / f"{name}_jsonl")
    write_jsonl(src, path, partitions=4)
    back = read_jsonl(spark, path, src)
    _assert_same_rows(src, back)


def test_embeddings_jsonl_round_trip(spark, sf_dir, tmp_path):
    """Array<float> columns survive JSONL — the multimodal/embedding
    egress path."""
    src = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "emb_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, src)
    _assert_same_rows(src, back)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """parquet → ORC → read back must be lossless, and filters must
    push into the ORC scan just like parquet."""
    import os

    from smile_spark.sources.text_formats import read_orc, write_orc
    from smile_spark.tables import table

    orders = table(spark, sf_dir, "orders")
    path = os.path.join(tmp_path, "orders_orc")
    write_orc(orders, path, partitions=4)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert back.exceptAll(orders).isEmpty()

    filtered = back.filter(back.o_orderkey == 42).select("o_orderkey")
    plan = filtered._jdf.queryExecution().explainString(
        filtered._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_orc_roundtrip_lossless_all_tables(spark, sf_dir, tmp_path):
    """parquet → ORC → compare: every fixture table round-trips
    losslessly through the ORC edge (types, nulls, µs timestamps,
    nested arrays) — symmetric exceptAll, the graph_check contract."""
    from smile_spark.sources.text_formats import read_orc, write_orc
    from smile_spark.tables import table

    for name in ("lineitem", "events", "documents", "embeddings"):
        src = table(spark, sf_dir, name)
        path = str(tmp_path / f"orc_{name}")
        write_orc(src, path, partitions=2)
        back = read_orc(spark, path)
        assert back.schema == src.schema, name
        assert back.exceptAll(src).count() == 0, name
        assert src.exceptAll(back).count() == 0, name
