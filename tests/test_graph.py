"""Structural graph tests beyond the oracle parity suite: multi-hop BFS
and multi-node components on synthetic graphs (the fixture graph is a
union of stars, depth ≤ 2, so it cannot exercise deep traversal)."""

from pyspark.sql import functions as F

from smile_spark.operators.graph import bfs_frontier, edges, graph_load


def _edges_df(spark, pairs, undirected=True):
    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e


def test_bfs_path_graph(spark):
    # 1-2-3-4-5 path: distances from 1 must be 0..4
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = bfs_frontier(spark, e, [1], max_iter=10)
    got = {r.id: r.dist for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_shortest_path_wins(spark):
    # diamond with a shortcut: 1-2-3-4 and 1-4 → dist(4) == 1
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    out = bfs_frontier(spark, e, [1], max_iter=10)
    got = {r.id: r.dist for r in out.collect()}
    assert got[4] == 1 and got[3] == 2


def test_bfs_disconnected(spark):
    # 1-2, 3-4: BFS from 1 never reaches 3/4
    e = _edges_df(spark, [(1, 2), (3, 4)])
    out = bfs_frontier(spark, e, [1], max_iter=10)
    assert {r.id for r in out.collect()} == {1, 2}


def test_bfs_multi_source_single_pass(spark):
    e = _edges_df(spark, [(1, 2), (3, 4)])
    out = bfs_frontier(spark, e, [1, 3], max_iter=10)
    rows = {(r.source, r.id): r.dist for r in out.collect()}
    assert rows == {(1, 1): 0, (1, 2): 1, (3, 3): 0, (3, 4): 1}


def test_graph_load_offsets_are_csr(spark, sf_dir):
    rows = graph_load(spark, sf_dir).orderBy("src").collect()
    # CSR invariant: offset[i+1] == offset[i] + degree[i]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.csr_offset == prev.csr_offset + prev.out_degree
    assert rows[0].csr_offset == 0


def test_edges_deterministic(spark, sf_dir):
    a = edges(spark, sf_dir).orderBy("src", "dst").collect()
    b = edges(spark, sf_dir).orderBy("src", "dst").collect()
    assert a == b


def test_sssp_frontier_equals_full_relaxation(spark, sf_dir):
    """Queue-based Bellman-Ford must produce exactly the full-
    relaxation distance table (same hop cap, same sources)."""
    from smile_spark.operators.graph import sssp, sssp_frontier

    full = sssp(spark, sf_dir)
    frontier = sssp_frontier(spark, sf_dir)
    assert full.exceptAll(frontier).count() == 0
    assert frontier.exceptAll(full).count() == 0


def test_cc_long_path_converges_in_log_rounds(spark):
    """A 200-node path graph (diameter 199 >> the 30-round cap) must
    still converge: pointer jumping makes the loop O(log D), so plain
    min-label propagation's diameter assumption is gone (VERDICT r04
    'What's wrong' #4)."""
    from smile_spark.operators.graph import cc_labels

    n = 200
    nodes = spark.range(n).select(F.col("id"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    und = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = cc_labels(nodes, und, max_iter=30)
    assert labels.filter(F.col("component") != 0).isEmpty()


def test_cc_two_components_min_labels(spark):
    """Two disjoint chains resolve to their own min ids."""
    from smile_spark.operators.graph import cc_labels

    rows = [(0, 1), (1, 2), (10, 11), (11, 12)]
    fwd = spark.createDataFrame(rows, "src long, dst long")
    und = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = (
        und.select(F.col("src").alias("id")).distinct()
    )
    got = {
        (r.id, r.component) for r in cc_labels(nodes, und).collect()
    }
    assert got == {
        (0, 0), (1, 0), (2, 0), (10, 10), (11, 10), (12, 10),
    }


def test_shortest_path_route_emits_closed_flag(spark, sf_dir):
    """Every emitted route carries the closed flag; closed routes'
    path string starts at the source and ends at the target."""
    from smile_spark.operators.graph import shortest_path_route

    rows = shortest_path_route(spark, sf_dir).collect()
    assert rows
    for r in rows:
        hops = r.path.split("->")
        if r.closed:
            assert hops[0] == str(r.source), r
        assert hops[-1] == str(r.target), r
        assert r.n_hops == len(hops) - 1, r
