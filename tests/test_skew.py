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


def test_salted_join_equivalence_property(spark):
    """salted_join must equal the plain join for arbitrary key
    distributions, salt counts, and join types — the salt only moves
    rows, never changes matches (now load-bearing for setsim)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smile_spark.functions.skew import salted_join

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(0, 5), min_size=1, max_size=30),
        st.lists(st.integers(0, 5), min_size=1, max_size=10),
        st.sampled_from([2, 7, 16]),
    )
    def equiv(big_keys, small_keys, n_salts):
        big = spark.createDataFrame(
            [(k, i) for i, k in enumerate(big_keys)], "k long, bv long"
        )
        small = spark.createDataFrame(
            [(k, i * 10) for i, k in enumerate(small_keys)],
            "k long, sv long",
        )
        got = sorted(
            (r.k, r.bv, r.sv)
            for r in salted_join(big, small, "k", n_salts=n_salts).collect()
        )
        want = sorted(
            (r.k, r.bv, r.sv) for r in big.join(small, "k").collect()
        )
        assert got == want

    equiv()
