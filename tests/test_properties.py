"""Hypothesis property tests for algorithmic cores whose edge cases
(ties, duplicates, degenerate sizes) fixture data can't be trusted to
cover.  Small example counts — each example builds a Spark DataFrame."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # price (small → many ties)
        st.integers(min_value=0, max_value=6),   # qty
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=points)
def test_skyline_frame_matches_bruteforce(spark, pts):
    """The two-level distributed skyline equals brute-force dominance
    on arbitrary small integer inputs — including duplicate
    coordinates (both stay), all-equal rows, and heavy ties on either
    axis."""
    from smile_spark.operators.analytics import skyline_frame

    rows = [(i, float(p), float(q)) for i, (p, q) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "k bigint, avg_price double, total_qty double"
    )
    got = {r.k for r in skyline_frame(df, "k").collect()}

    def dominated(i):
        px, py = pts[i]
        return any(
            qx <= px and qy >= py and (qx < px or qy > py)
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )

    want = {i for i in range(len(pts)) if not dominated(i)}
    assert got == want, (pts, got, want)


def test_setsim_frame_jaccard_exactly_tau_boundary(spark):
    """Pairs whose Jaccard is EXACTLY tau = 9/10 must be emitted — the
    boundary the integer thresholds exist for (float ceil computed
    alpha = 64 instead of 63 at na+nb = 133 and dropped such pairs).
    Constructed cases: containment (|A|=9 subset of |B|=10, J = 9/10)
    and near-equal sets (na=19, nb=19, i=... not integral — use
    na=9, nb=10, i=9 and na=18, nb=20, i=18), plus a just-below pair
    that must NOT appear."""
    from smile_spark.operators.dedup import SETSIM_TAU, setsim_join_frame

    def doc(i, toks):
        return (i, " ".join(toks))

    t = [f"w{j:03d}" for j in range(60)]
    rows = [
        doc(1, t[0:9]),            # A: 9 tokens
        doc(2, t[0:10]),           # B: 10 tokens, J(A,B) = 9/10 exactly
        doc(3, t[20:38]),          # C: 18 tokens
        doc(4, t[20:40]),          # D: 20 tokens, J(C,D) = 18/20 = 0.9
        doc(5, t[40:48]),          # E: 8 tokens
        doc(6, t[40:49]),          # F: 9 tokens, J(E,F) = 8/9 < 0.9
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.a, r.b): r.jaccard for r in setsim_join_frame(df).collect()}
    assert (1, 2) in got and got[(1, 2)] == SETSIM_TAU
    assert (3, 4) in got and got[(3, 4)] == SETSIM_TAU
    assert (5, 6) not in got
    assert set(got) == {(1, 2), (3, 4)}
