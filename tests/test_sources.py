"""Edge-list source round-trip — the reference's loadgraph file format
(write → read → compare, like file_storage_test.cpp's golden
round-trip)."""

import os

import pytest

from smile_spark.operators.graph import edges
from smile_spark.sources.edge_list import read_edge_list, write_edge_list


def test_edge_list_roundtrip(spark, sf_dir, tmp_path):
    e = edges(spark, sf_dir)
    path = os.path.join(tmp_path, "graph.txt")
    write_edge_list(e, path)
    back = read_edge_list(spark, path)
    assert back.count() == e.count()
    assert back.exceptAll(e).count() == 0
    assert e.exceptAll(back).count() == 0


def test_edge_list_header_validation(spark, tmp_path):
    path = os.path.join(tmp_path, "bad.txt")
    with open(path, "w") as f:
        f.write("3 99\n1 2\n2 3\n")  # header lies about edge count
    with pytest.raises(ValueError, match="declares 99"):
        read_edge_list(spark, path)


def test_edge_list_header_collision(spark, tmp_path):
    # a data edge identical to the header pair must survive parsing
    path = os.path.join(tmp_path, "coll.txt")
    with open(path, "w") as f:
        f.write("2 3\n1 2\n2 3\n2 4\n")  # edge (2,3) == header values
    e = read_edge_list(spark, path, validate=False)
    rows = sorted((r.src, r.dst) for r in e.collect())
    assert rows == [(1, 2), (2, 3), (2, 4)]


def test_write_edge_list_refuses_large_graphs(spark, tmp_path):
    # the writer collects to the driver; it must refuse real-graph sizes
    # BEFORE collecting anything
    from pyspark.sql import functions as F

    big = spark.range(1_000_001).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(ValueError, match="exceeds"):
        write_edge_list(big, os.path.join(tmp_path, "big.txt"))


# --- property-based round-trip (hypothesis) -------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edge_pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),
                st.integers(min_value=0, max_value=50),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_edge_list_roundtrip_property(spark, tmp_path, edge_pairs):
        """Any small edge multiset must survive write→read unchanged —
        including duplicate edges, self-loops, and pairs that collide
        with the header line."""
        import collections

        path = os.path.join(tmp_path, f"prop-{abs(hash(tuple(edge_pairs)))}.txt")
        df = spark.createDataFrame(edge_pairs, "src bigint, dst bigint")
        write_edge_list(df, path)
        back = read_edge_list(spark, path)
        got = collections.Counter((r.src, r.dst) for r in back.collect())
        want = collections.Counter(edge_pairs)
        assert got == want
