"""Semantic invariants for the round-4 operators beyond oracle parity:
sampling cardinality, ER accounting, and route well-formedness."""

from pyspark.sql import functions as F

from smile_spark.tables import table


def test_weighted_sample_exactly_k_per_stratum(spark, sf_dir):
    from smile_spark.operators.analytics import (
        WEIGHTED_SAMPLE_K,
        weighted_sample_topk,
    )

    rows = weighted_sample_topk(spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
        assert 0.0 < r.sample_key <= 1.0
        assert 1 <= r.rn <= WEIGHTED_SAMPLE_K
    n_sources = (
        table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(per_source) == n_sources
    for src, members in per_source.items():
        assert len(members) == WEIGHTED_SAMPLE_K, src
        assert sorted(m.rn for m in members) == list(
            range(1, WEIGHTED_SAMPLE_K + 1)
        )


def test_golden_records_account_for_every_part(spark, sf_dir):
    """Survivorship must be a PARTITION of the catalog: member counts
    sum to the part count, canonical keys are distinct, and each
    canonical is the minimum key of its own (brand, name) group by
    construction."""
    from smile_spark.operators.pipeline import golden_part_records

    golden = golden_part_records(spark, sf_dir)
    n_parts = table(spark, sf_dir, "part").count()
    rows = golden.collect()
    assert sum(r.n_members for r in rows) == n_parts
    keys = [r.canonical_pk for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.n_members >= 1 for r in rows)


def test_route_paths_are_well_formed(spark, sf_dir):
    """Every emitted route starts at its source, ends at its target,
    respects the hop cap, and has hop count consistent with the path
    string."""
    from smile_spark.operators.graph import (
        SSSP_ROUNDS,
        shortest_path_route,
    )

    rows = shortest_path_route(spark, sf_dir).collect()
    assert rows, "route set must be non-empty on the fixture graph"
    closed = [r for r in rows if r.closed]
    assert closed, "at least one closed route on the fixture graph"
    for r in rows:
        hops = r.path.split("->")
        # unclosed routes (pred chain did not reach the source within
        # the backtrack cap) are flagged, not dropped: their partial
        # path still ends at the target but starts mid-chain
        if r.closed:
            assert int(hops[0]) == r.source
        assert int(hops[-1]) == r.target
        assert len(hops) - 1 == r.n_hops
        assert 1 <= r.n_hops <= SSSP_ROUNDS
        assert r.dist >= r.n_hops  # integer weights are >= 1
