"""Invariant tests for the behavioral/event-sequence operators —
properties that must hold for ANY event log, complementing the
oracle-parity checks in test_parity.py (which pin one fixture)."""

from pyspark.sql import functions as F

from smile_spark.operators.analytics import unpivot_long
from smile_spark.operators.behavior import (
    SESSION_GAP_US,
    funnel_conversion,
    gap_fill_daily,
    retention_cohorts,
    sessionize,
)
from smile_spark.operators.curation import pii_redact, repetition_ratio
from smile_spark.tables import table


def test_sessionize_partitions_all_events(spark, sf_dir):
    """Sessions tile the event log: per-user session_seq is contiguous
    from 1, session bounds are ordered, and n_events sums to the
    event count."""
    s = sessionize(spark, sf_dir)
    assert s.filter(F.col("session_start") > F.col("session_end")).isEmpty()
    per_user = s.groupBy("user_id").agg(
        F.min("session_seq").alias("lo"),
        F.max("session_seq").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").alias("tot"),
    )
    assert per_user.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
    ).isEmpty()
    n_events = table(spark, sf_dir, "events").count()
    assert per_user.agg(F.sum("tot")).first()[0] == n_events


def test_sessionize_gap_property(spark, sf_dir):
    """Consecutive sessions of the same user are separated by MORE than
    the gap; within-session spans never require one (the defining
    property of gap-based sessionization)."""
    s = sessionize(spark, sf_dir).select(
        "user_id",
        "session_seq",
        F.unix_micros("session_start").alias("st"),
        F.unix_micros("session_end").alias("en"),
    )
    nxt = s.select(
        "user_id",
        (F.col("session_seq") - 1).alias("session_seq"),
        F.col("st").alias("next_st"),
    )
    adjacent = s.join(nxt, ["user_id", "session_seq"])
    violations = adjacent.filter(
        F.col("next_st") - F.col("en") <= SESSION_GAP_US
    )
    assert violations.isEmpty()


def test_funnel_stage_counts_monotone(spark, sf_dir):
    row = funnel_conversion(spark, sf_dir).first()
    assert row.n_view >= row.n_click_after_view >= row.n_purchase_after_click
    assert row.n_view > 0


def test_retention_day_zero_equals_cohort_size(spark, sf_dir):
    """Offset-0 activity is by definition the whole cohort."""
    r = retention_cohorts(spark, sf_dir)
    assert r.filter(F.col("day_offset") < 0).isEmpty()
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    )
    cohort_sizes = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.countDistinct("user_id").alias("size"))
    )
    zero = r.filter(F.col("day_offset") == 0).select("cohort_day", "n_users")
    assert (
        zero.join(cohort_sizes, "cohort_day")
        .filter(F.col("n_users") != F.col("size"))
        .isEmpty()
    )


def test_gap_fill_spine_is_dense_and_lossless(spark, sf_dir):
    """Per user: exactly (span_days + 1) rows, and the filled counts
    sum back to the user's true event count."""
    g = gap_fill_daily(spark, sf_dir)
    per_user = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.sum("cnt").alias("tot"),
    )
    bad_span = per_user.filter(
        F.col("n_days")
        != (F.unix_micros("d1") - F.unix_micros("d0")) / 86_400_000_000 + 1
    )
    assert bad_span.isEmpty()
    truth = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_tot"))
    )
    assert (
        per_user.join(truth, "user_id")
        .filter(F.col("tot") != F.col("true_tot"))
        .isEmpty()
    )


def test_pii_redact_leaves_no_digit_runs(spark, sf_dir):
    r = pii_redact(spark, sf_dir)
    assert r.filter(F.col("props_redacted").rlike("[0-9]{2,}")).isEmpty()
    # rows whose original payload had a 2+ digit run must record ≥1
    # redaction (single digits are intentionally left alone)
    ev = table(spark, sf_dir, "events").select("event_id", "props")
    joined = r.join(ev, "event_id")
    assert joined.filter(
        F.col("props").rlike("[0-9]{2,}") & (F.col("n_redactions") < 1)
    ).isEmpty()


def test_repetition_ratio_bounds(spark, sf_dir):
    r = repetition_ratio(spark, sf_dir)
    assert r.filter(
        (F.col("rep_ratio") < 0)
        | (F.col("rep_ratio") >= 1)
        | (F.col("n_distinct") > F.col("n_trigrams"))
    ).isEmpty()


def test_unpivot_expands_exactly_4x(spark, sf_dir):
    n = table(spark, sf_dir, "lineitem").count()
    assert unpivot_long(spark, sf_dir).count() == 4 * n


def test_rolling_window_matches_dense_prefix(spark, sf_dir):
    """On the dense spine, roll7_cnt at row i equals the sum of the
    last ≤7 daily counts — cross-checked by recomputing from
    gap_fill_daily with a self-join."""
    from smile_spark.operators.behavior import (
        ROLL_DAYS,
        gap_fill_daily,
        rolling_daily_activity,
    )

    r = rolling_daily_activity(spark, sf_dir)
    g = gap_fill_daily(spark, sf_dir).select(
        "user_id",
        F.unix_micros("day").alias("dus"),
        F.col("cnt").alias("c2"),
    )
    recomputed = (
        r.select(
            "user_id", F.unix_micros("day").alias("dus0"), "roll7_cnt"
        )
        .join(g, "user_id")
        .filter(
            (F.col("dus") <= F.col("dus0"))
            & (
                F.col("dus")
                > F.col("dus0") - ROLL_DAYS * 86_400_000_000
            )
        )
        .groupBy("user_id", "dus0", "roll7_cnt")
        .agg(F.sum("c2").alias("check"))
    )
    assert recomputed.filter(
        F.col("check") != F.col("roll7_cnt")
    ).isEmpty()


def test_bigram_pmi_lift_positive_and_ranked(spark, sf_dir):
    from smile_spark.operators.curation import PMI_MIN_COUNT, bigram_pmi

    rows = bigram_pmi(spark, sf_dir).collect()
    assert rows, "no collocations above min count"
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert all(r.pair_count >= PMI_MIN_COUNT for r in rows)
    assert all(r.lift > 0 for r in rows)


def test_zorder_preserves_locality(spark, sf_dir):
    """Z-value invariants: interleaving is a bijection on the masked
    domain (de-interleaving recovers both keys), and z ranges nest —
    rows sharing the top 2k z-bits agree on the top k bits of BOTH
    dimensions (the property that makes min/max file stats prune)."""
    from smile_spark.operators.analytics import ZORDER_BITS, zorder_cluster

    z = zorder_cluster(spark, sf_dir)
    mask = (1 << ZORDER_BITS) - 1
    even = sum(
        (
            F.shiftleft(
                F.shiftright("zval", 2 * i).bitwiseAND(F.lit(1)), i
            )
            for i in range(ZORDER_BITS)
        ),
        F.lit(0),
    )
    odd = sum(
        (
            F.shiftleft(
                F.shiftright("zval", 2 * i + 1).bitwiseAND(F.lit(1)), i
            )
            for i in range(ZORDER_BITS)
        ),
        F.lit(0),
    )
    bad = z.filter(
        (even != F.col("l_partkey").bitwiseAND(F.lit(mask)))
        | (odd != F.col("l_suppkey").bitwiseAND(F.lit(mask)))
    )
    assert bad.isEmpty()


# --- property-based sessionization (hypothesis) ---------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def _reference_sessions(events, gap_us):
    """Pure-Python gaps-and-islands: independent re-implementation the
    distributed operator must agree with on ANY input."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, eid, us in events:
        by_user[uid].append((us, eid))
    out = set()
    for uid, evs in by_user.items():
        evs.sort()
        seq, start, prev, n = 0, None, None, 0
        for us, _eid in evs:
            if prev is None or us - prev > gap_us:
                if seq:
                    out.add((uid, seq, start, prev, n))
                seq, start, n = seq + 1, us, 0
            n += 1
            prev = us
        out.add((uid, seq, start, prev, n))
    return out


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        events=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),      # user_id
                st.integers(min_value=1, max_value=10**6),  # event_id
                st.integers(min_value=0, max_value=10**7),  # µs offset
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[1],
        )
    )
    def test_sessionize_matches_reference_on_any_log(spark, events):
        """The distributed sessionizer equals an independent in-memory
        gaps-and-islands on arbitrary small logs — duplicates, ties,
        bursts, and singleton users included.  Gap shrunk to 1s so tiny
        random offsets actually split sessions."""
        from smile_spark.operators.behavior import sessionize_frame

        gap_us = 1_000_000
        df = spark.createDataFrame(
            [
                (uid, eid, 0.0, us)
                for uid, eid, us in events
            ],
            "user_id bigint, event_id bigint, value double, us bigint",
        ).withColumn("ts", F.timestamp_micros(F.col("us")))
        got = {
            (
                r.user_id,
                r.session_seq,
                r.session_start.timestamp() * 1_000_000,
                r.session_end.timestamp() * 1_000_000,
                r.n_events,
            )
            for r in sessionize_frame(df, gap_us).collect()
        }
        got = {
            (u, s, int(round(a)), int(round(b)), n) for u, s, a, b, n in got
        }
        want = _reference_sessions(
            [(u, e, us) for u, e, us in events], gap_us
        )
        assert got == want


def test_sessionize_invariants_at_16x(spark, sf_dir, tmp_path):
    """16× stress: union the event log 16 times under DISJOINT user-id
    ranges (scaling users, not duplicating timestamps) and re-assert
    the tiling invariant — per-copy results must equal the base result
    shifted, proving the operator is partitioning-insensitive as the
    key space grows."""
    import os

    from smile_spark.tables import TABLE_NAMES

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    big = ev
    for i in range(1, 16):
        big = big.union(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * 10**7))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 10**9))
        )
    big_dir = str(tmp_path / "ev16x")
    os.makedirs(big_dir)
    big.write.parquet(os.path.join(big_dir, "events.parquet"))
    for name in TABLE_NAMES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(big_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)

    base = sessionize(spark, sf_dir)
    big_s = sessionize(spark, big_dir)
    n_base = base.count()
    assert big_s.count() == 16 * n_base
    # copy 7 must equal the base result with shifted user ids
    copy7 = big_s.filter(
        (F.col("user_id") >= 7 * 10**7) & (F.col("user_id") < 8 * 10**7)
    ).withColumn("user_id", F.col("user_id") - F.lit(7 * 10**7))
    assert copy7.exceptAll(base).isEmpty()
    assert base.exceptAll(copy7).isEmpty()


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        obs=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),    # user_id
                st.integers(min_value=0, max_value=40),   # day offset
                st.integers(min_value=1, max_value=9),    # count
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    def test_gap_fill_matches_reference_on_any_series(spark, obs):
        """Spine fill on arbitrary sparse per-user daily series must
        equal an independent in-memory densification."""
        from smile_spark.operators.behavior import gap_fill_frame

        base_us = 1_700_000_000_000_000  # fixed day-aligned-enough epoch
        day_us = 86_400_000_000
        base_us -= base_us % day_us
        df = spark.createDataFrame(
            [(u, base_us + o * day_us, c) for u, o, c in obs],
            "user_id bigint, dus bigint, cnt bigint",
        ).select(
            "user_id", F.timestamp_micros("dus").alias("d"), "cnt"
        )
        got = {
            (r.user_id, int(r.day.timestamp() // 86400), r.cnt)
            for r in gap_fill_frame(df).collect()
        }
        from collections import defaultdict

        by_user = defaultdict(dict)
        for u, o, c in obs:
            by_user[u][o] = c
        want = set()
        day0 = base_us // day_us * (day_us // 1_000_000) // 86400
        for u, days in by_user.items():
            lo, hi = min(days), max(days)
            for o in range(lo, hi + 1):
                want.add((u, day0 + o, days.get(o, 0)))
        assert got == want
