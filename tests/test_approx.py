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


def test_cms_never_underestimates_and_bounds_error(spark, sf_dir):
    """Count-Min invariants: est ≥ truth always (counters only ever
    add), and the overestimate is bounded by the classic e·N/width
    slack with depth-row minimums (deterministic here, no 'w.h.p.'
    caveat needed for a fixed corpus + fixed hashes)."""
    import math

    from pyspark.sql import functions as F

    from smile_spark.operators.sketch import CMS_WIDTH, cms_heavy_hitters
    from smile_spark.tables import table

    r = cms_heavy_hitters(spark, sf_dir)
    assert r.filter(F.col("cms_estimate") < F.col("true_count")).isEmpty()
    n_tokens = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .count()
    )
    slack = math.e * n_tokens / CMS_WIDTH
    assert r.filter(
        F.col("cms_estimate") > F.col("true_count") + slack
    ).isEmpty()


def test_winsorize_approx_tracks_exact(spark, sf_dir):
    """The approx-bound winsorization must track the exact form:
    per-group bounds within 1% relative error, clipped-row counts
    within 1.5% of the group size (rank error ≤ 1/WINSOR_ACCURACY is
    far tighter; the slack absorbs value ties at the boundary), and
    the winsorized mean within 0.5%."""
    from smile_spark.operators.analytics import (
        winsorize_prices,
        winsorize_prices_approx_summary,
    )

    exact = {
        r.l_returnflag: r
        for r in winsorize_prices(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: r
        for r in winsorize_prices_approx_summary(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    sizes = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.lo - e.lo) / e.lo < 0.01, (flag, e.lo, a.lo)
        assert abs(a.hi - e.hi) / e.hi < 0.01, (flag, e.hi, a.hi)
        n = sizes[flag]
        assert abs(a.n_clipped_low - e.n_clipped_low) <= 0.015 * n
        assert abs(a.n_clipped_high - e.n_clipped_high) <= 0.015 * n
        rel = abs(a.winsorized_avg - e.winsorized_avg) / e.winsorized_avg
        assert rel < 0.005, (flag, e.winsorized_avg, a.winsorized_avg)


def test_winsorize_approx_certificate_all_true(spark, sf_dir):
    """The registered certificate query must emit lo/hi_in_tolerance
    TRUE for every group (matching the oracle's literal TRUE): the
    sketch's bounds sit within WINSOR_RANK_EPS rank error of the
    target quantiles.  A sketch regression flips a boolean and fails
    both this test and the driver's value-hash gate."""
    from smile_spark.operators.analytics import winsorize_prices_approx

    rows = winsorize_prices_approx(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        assert r.lo_in_tolerance and r.hi_in_tolerance, r


def test_hll_error_bound_on_large_domain(spark, sf_dir):
    """The fixture vocabulary (31 types) always takes the
    linear-counting branch; this exercises the RAW-estimate branch on
    a 50k-distinct synthetic domain and pins the error inside 5 sigma
    (sigma = 1.04/sqrt(m) ~ 6.5% at m=256)."""
    from pyspark.sql import functions as F

    from smile_spark.operators.sketch import HLL_M, hll_estimate

    toks = spark.range(50_000).select(
        F.concat(F.lit("tok_"), F.col("id")).alias("tok")
    )
    row = hll_estimate(toks).collect()[0]
    assert row.exact_distinct == 50_000
    assert row.n_registers == HLL_M  # raw branch: every register hit
    rel_err = abs(row.est_distinct - 50_000) / 50_000
    assert rel_err < 5 * 1.04 / HLL_M**0.5, rel_err


def test_hll_registers_merge_like_shards(spark, sf_dir):
    """Register-wise MAX of two shard register tables must equal the
    single-pass register table — the mergeability that makes HLL
    shippable across 100 TB shards (and exactly how the driver-side
    combine would work)."""
    from pyspark.sql import functions as F

    from smile_spark.operators.sketch import hll_estimate

    full = spark.range(20_000).select(
        F.concat(F.lit("t"), F.col("id")).alias("tok")
    )
    shard_a = full.filter(F.length("tok") % 2 == 0)
    shard_b = full.filter(F.length("tok") % 2 == 1)
    est_full = hll_estimate(full).collect()[0].est_distinct
    # merge = union of the shards' token streams (register MAX falls
    # out of the same groupBy) — estimate must be identical
    est_merged = hll_estimate(shard_a.union(shard_b)).collect()[0].est_distinct
    assert est_full == est_merged


def test_bloom_prejoin_no_false_negatives(spark, sf_dir):
    """A Bloom filter may pass non-members but must NEVER drop a
    member: every true match passes, so n_false_pos is exactly
    n_bloom_pass - n_true_match.  Also pin the false-positive rate
    under the m/n/k design point's theoretical bound with slack."""
    from smile_spark.operators.quality import bloom_prejoin

    row = bloom_prejoin(spark, sf_dir).collect()[0]
    assert row.n_bloom_pass >= row.n_true_match
    assert row.n_false_pos == row.n_bloom_pass - row.n_true_match
    # (1 - e^(-kn/m))^k with n = build keys; generous 3x slack since
    # the fixture build set is small
    assert row.fp_pct < 25.0, row


def test_hll_overlap_union_bounds(spark, sf_dir):
    """Sketch set algebra must satisfy the lattice bounds:
    max(est_a, est_b) <= est_union <= est_a + est_b, and the
    inclusion-exclusion intersection lands near truth on the
    small-vocabulary fixture (linear-counting regime)."""
    from smile_spark.operators.sketch import hll_source_overlap

    row = hll_source_overlap(spark, sf_dir).collect()[0]
    assert row.est_union >= max(row.est_a, row.est_b) - 1e-9
    assert row.est_union <= row.est_a + row.est_b + 1e-9
    assert abs(row.est_intersect - row.exact_intersect) <= max(
        5.0, 0.3 * row.exact_intersect
    ), row


def test_hll_register_algebra_on_known_overlap(spark, sf_dir):
    """Register set algebra on a SYNTHETIC 50%-overlap pair (the
    fixture sources share the whole vocabulary, which makes the
    registered query's bounds trivial): A = 0..30k, B = 15k..45k,
    |A∩B| = 15k.  Union estimate must track |A∪B| and the
    inclusion-exclusion intersection must land within sketch error
    (~6.5% sigma at m=256; allow 4 sigma on the subtraction, which
    compounds three estimates)."""
    from pyspark.sql import functions as F

    from smile_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    def toks(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("t"), F.col("id")).alias("tok")
        )

    a, b = toks(0, 30_000), toks(15_000, 45_000)
    exact1 = spark.range(1).select(
        F.lit(None).cast("bigint").alias("exact_distinct")
    )
    ra, rb = hll_registers(a), hll_registers(b)
    ru = ra.union(rb).groupBy("bucket").agg(F.max("mj").alias("mj"))
    ea = hll_estimate_from_registers(ra, exact1).collect()[0].est_distinct
    eb = hll_estimate_from_registers(rb, exact1).collect()[0].est_distinct
    eu = hll_estimate_from_registers(ru, exact1).collect()[0].est_distinct
    assert abs(eu - 45_000) / 45_000 < 0.26  # 4 sigma
    inter = ea + eb - eu
    assert abs(inter - 15_000) / 15_000 < 0.6, (ea, eb, eu, inter)


def test_mad_approx_certificate_booleans_hold(spark, sf_dir):
    """Both sketch medians must certify within rank tolerance, and the
    exact column must match the exact operator's median."""
    from smile_spark.operators.quality import mad_outliers, mad_outliers_approx

    rows = {r.l_returnflag: r for r in mad_outliers_approx(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in mad_outliers(spark, sf_dir).collect()}
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        assert r.med_in_tolerance and r.mad_in_tolerance, r
        assert r.med_price == exact[flag].med_price, (r, exact[flag])
        assert r.n == exact[flag].n_rows


def test_mad_approx_summary_close_to_exact(spark, sf_dir):
    """The production sketch-only MAD (no exact envelope, no
    rank-count certification passes) must land within sketch
    tolerance of the exact operator: medians/MADs within 1% and the
    outlier count within 1.5% of the group size — the same contract
    the winsorize summary form carries."""
    from smile_spark.operators.quality import (
        mad_outliers,
        mad_outliers_approx_summary,
    )

    exact = {
        r.l_returnflag: r for r in mad_outliers(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: r
        for r in mad_outliers_approx_summary(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        assert a.n_rows == e.n_rows
        assert abs(a.med_price - e.med_price) / e.med_price < 0.01
        assert abs(a.mad - e.mad) / e.mad < 0.01, (flag, e.mad, a.mad)
        assert abs(a.n_outliers - e.n_outliers) <= max(
            5, 0.015 * e.n_rows
        ), (flag, e.n_outliers, a.n_outliers)
