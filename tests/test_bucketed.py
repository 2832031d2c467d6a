"""Bucketed tables must eliminate the exchange on the bucket key —
the co-located-join property that replaces the reference's CSR."""

import pytest
from pyspark.sql import functions as F

from smile_spark.operators.graph import edges
from smile_spark.plans.audit import formatted_plan
from smile_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_edges(spark, sf_dir):
    e = edges(spark, sf_dir)
    write_bucketed(e, "bucketed_edges_test", "src", n_buckets=8)
    yield read_bucketed(spark, "bucketed_edges_test")
    spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")


def test_bucketed_roundtrip(spark, sf_dir, bucketed_edges):
    assert bucketed_edges.count() == edges(spark, sf_dir).count()


def test_groupby_on_bucket_key_has_no_exchange(bucketed_edges):
    plan = formatted_plan(
        bucketed_edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )
    assert "Exchange" not in plan, plan


def test_self_join_on_bucket_key_has_no_exchange(bucketed_edges):
    other = bucketed_edges.withColumnRenamed("dst", "dst2")
    plan = formatted_plan(
        bucketed_edges.join(other, "src").filter(F.col("dst") < F.col("dst2"))
    )
    # co-located join: both sides read pre-bucketed, no shuffle
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_join_revenue_no_exchange_before_join(spark, sf_dir):
    """The registered co-located join query: neither side may shuffle
    before the join — both read pre-bucketed buckets."""
    from smile_spark.sources.bucketed import bucketed_join_revenue

    plan = formatted_plan(bucketed_join_revenue(spark, sf_dir))
    join_kw = "SortMergeJoin" if "SortMergeJoin" in plan else "ShuffledHashJoin"
    pre_join = plan.split(join_kw)[0]
    assert "Exchange hashpartitioning" not in pre_join, plan
