"""Approximate aggregates vs exact answers.

Spark's HLL++ (`approx_count_distinct`) and t-digest
(`approx_percentile`) have no cross-engine oracle (sketch internals are
implementation-specific), so the driver's hash gate can't cover them;
these tests pin their ERROR BOUNDS against the exact operators instead
— the property a 100 TB user actually relies on (mergeable partial
state with bounded relative error, vs. the exact forms' per-group
sorts / two-level distinct aggregates).
"""

from pyspark.sql import functions as F

from smile_spark.tables import table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel_err = abs(row.approx - row.exact) / row.exact
    # rsd is a standard deviation; 5x gives a generous deterministic bound
    assert rel_err < 0.10, (row.exact, row.approx)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 1000)"
        ).alias("approx"),
    ).collect()[0]
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err < 0.05, (row.exact, row.approx)
