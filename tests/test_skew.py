"""salted_join must be result-identical to a plain join — the salt
changes row placement, never semantics."""

from pyspark.sql import functions as F

from smile_spark.functions import salted_join
from smile_spark.tables import table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey")
    salted = salted_join(orders, customer, "o_custkey", n_salts=4)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    # customers with no orders must survive a left join from customer
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    plain = customer.join(orders, "o_custkey", "left")
    salted = salted_join(customer, orders, "o_custkey", n_salts=4, how="left")
    assert salted.count() == plain.count()
