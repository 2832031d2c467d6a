"""Catalog tests — mirror the reference's schema_test.cpp round-trip
(/root/reference/src/tests/schema_test.cpp:10-60: register many types,
persist, reload, verify every name/id) plus the name/duplicate rules
(/root/reference/src/data/schema.cpp:148-167)."""

import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from smile_spark.catalog import Catalog, CatalogError


def test_create_and_get_assigns_incremental_ids():
    cat = Catalog()
    a = cat.create_node_type("person")
    b = cat.create_node_type("city")
    e = cat.create_edge_type("lives_in")
    assert (a.type_id, b.type_id) == (0, 1)
    assert e.type_id == 0  # per-kind id spaces
    assert cat.get_node_type("person").name == "person"


def test_duplicate_rejected():
    cat = Catalog()
    cat.create_node_type("person")
    with pytest.raises(CatalogError, match="already exists"):
        cat.create_node_type("person")


def test_name_length_enforced():
    cat = Catalog()
    cat.create_node_type("x" * 63)  # max OK (char[64] incl NUL)
    with pytest.raises(CatalogError, match="too long"):
        cat.create_node_type("y" * 64)
    with pytest.raises(CatalogError, match="non-empty"):
        cat.create_node_type("")


def test_unknown_type_errors():
    with pytest.raises(CatalogError, match="unknown"):
        Catalog().get_node_type("ghost")


def test_persistence_roundtrip_many_types(tmp_path):
    # the reference round-trips 32,768 types; same shape, same checks
    cat = Catalog()
    n = 32_768
    for i in range(n):
        cat.create_node_type(f"type_{i}")
    path = os.path.join(tmp_path, "catalog.json")
    cat.save(path)
    back = Catalog.load(path)
    assert len(back) == n
    for i in (0, 1, 12_345, n - 1):
        assert back.get_node_type(f"type_{i}").type_id == i
    # id allocation continues where it left off
    assert back.create_node_type("one_more").type_id == n


def test_schema_binding(spark, tmp_path):
    schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("name", StringType(), True),
        ]
    )
    cat = Catalog()
    cat.create_node_type("person", schema)
    df = spark.createDataFrame([(1, "ada")], schema)
    cat.bind_view(spark, "node", "person", df)
    assert spark.sql("SELECT name FROM person").collect()[0].name == "ada"

    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(CatalogError, match="schema mismatch"):
        cat.bind_view(spark, "node", "person", bad)

    path = os.path.join(tmp_path, "cat.json")
    cat.save(path)
    assert Catalog.load(path).get_node_type("person").schema == schema


def test_fixture_catalog_validates_all_tables(spark, sf_dir):
    """Every fixture table binds cleanly through its registered
    StructType — the load-time drift gate for the whole query surface."""
    from smile_spark.fixtures_catalog import register_views_validated

    cat = register_views_validated(spark, sf_dir)
    assert len(cat) == 10
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n > 0


def test_fixture_catalog_rejects_drifted_schema(spark, sf_dir):
    """A fixture whose column type drifts must fail the bind — this is
    the failure a silent regeneration would otherwise hide."""
    from pyspark.sql import functions as F

    from smile_spark.catalog import PROPERTY, CatalogError
    from smile_spark.fixtures_catalog import fixture_catalog
    from smile_spark.tables import table

    cat = fixture_catalog()
    drifted = table(spark, sf_dir, "documents").withColumn(
        "n_chars", F.col("n_chars").cast("int")  # bigint -> int drift
    )
    with pytest.raises(CatalogError, match="schema mismatch"):
        cat.bind_view(spark, PROPERTY, "documents", drifted)


@pytest.mark.parametrize(
    "sf", ["sf0.001", "sf0.01", "sf0.1"], ids=lambda s: s
)
def test_fixture_drift_canary_all_sf(spark, sf):
    """Round-start drift canary (VERDICT r02 #5): bind ALL declared
    schemas against EVERY sf fixture dir.  A regenerated fixture whose
    post-load type drifts fails exactly this named test with one
    actionable line per drifted table — not five confusing downstream
    symptoms (the r02 events TIMESTAMP_NTZ incident)."""
    from smile_spark.catalog import PROPERTY, CatalogError
    from smile_spark.fixtures_catalog import fixture_catalog
    from smile_spark.tables import TABLE_NAMES, table

    sf_dir = f"/root/testdata/{sf}"
    if not os.path.isdir(f"{sf_dir}/lineitem.parquet") and not os.path.exists(
        f"{sf_dir}/lineitem.parquet"
    ):
        pytest.skip(f"{sf_dir} not present")
    cat = fixture_catalog()
    drifts = []
    for name in TABLE_NAMES:
        try:
            cat.bind_view(spark, PROPERTY, name, table(spark, sf_dir, name))
        except CatalogError as exc:
            drifts.append(f"{sf}/{name}: {exc}")
    assert not drifts, "fixture drift detected:\n" + "\n".join(drifts)
