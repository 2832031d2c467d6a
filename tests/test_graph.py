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
