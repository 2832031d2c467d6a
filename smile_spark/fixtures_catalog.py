"""Catalog-backed fixture schemas — C1/C2 wired into the query surface.

The reference registers node/edge/property types in its Schema before
any query can touch data (/root/reference/src/data/schema.cpp:148-167);
queries then address data through the registered types.  The Spark-side
equivalent: every fixture table's schema is DECLARED here, registered
in a Catalog as a property type, and ``register_views`` binds each
DataFrame through ``Catalog.bind_view`` — which refuses to bind when
the on-disk parquet has drifted from its declared StructType.  A
fixture regeneration that silently changes a column type now fails at
load, not as a confusing hash mismatch three operators downstream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from smile_spark.catalog import PROPERTY, Catalog
from smile_spark.tables import TABLE_NAMES, table

# Declared fixture schemas (TESTDATA.md).  ``events.ts`` is declared in
# its POST-LOAD form: the parquet carries TIMESTAMP(NANOS), which
# tables.table() truncates to a µs timestamp — the declared contract is
# what queries actually see.
FIXTURE_DDL: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": (
        "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"
    ),
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING,"
        " p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ,"
        " o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"
    ),
    "events": (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING"
    ),
    "documents": (
        "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars BIGINT"
    ),
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}


def fixture_catalog() -> Catalog:
    """A Catalog with one registered property type per fixture table."""
    cat = Catalog()
    for name in TABLE_NAMES:
        cat.create_property_type(name, StructType.fromDDL(FIXTURE_DDL[name]))
    return cat


def register_views_validated(
    spark: SparkSession, sf_dir: str, catalog: Catalog | None = None
) -> Catalog:
    """Register every fixture table as a temp view THROUGH the catalog:
    each bind validates the loaded DataFrame against the registered
    StructType and raises CatalogError on drift."""
    cat = catalog or fixture_catalog()
    for name in TABLE_NAMES:
        cat.bind_view(spark, PROPERTY, name, table(spark, sf_dir, name))
    return cat
