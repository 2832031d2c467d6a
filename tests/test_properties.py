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
