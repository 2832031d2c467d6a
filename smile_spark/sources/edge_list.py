"""Text edge-list source — the reference's graph input format.

Format contract (/root/reference/src/regtests/loadgraph_regtest.cpp:
11-23): first line ``numNodes numEdges``, then one ``orig dest`` pair
per line, grouped/sorted by orig.  The reference streams this
single-threadedly into CSR pages; here the file is read as a
distributed text scan, the header is separated by filtering (not by
driver-side seeking — the parse stays parallel for multi-GB lists),
and the declared header counts are validated against the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(
    spark: SparkSession, path: str, validate: bool = True
) -> DataFrame:
    """Parse an edge-list file into an ``edges(src, dst)`` DataFrame.

    The header row is identified positionally (first line of the
    file); data rows parse as two longs.  With ``validate`` the
    declared numEdges must match the parsed row count — the same check
    the reference's loader asserts while streaming.
    """
    lines = spark.read.text(path)
    parsed = lines.select(
        F.split(F.trim(F.col("value")), r"\s+").alias("parts")
    ).filter(F.size("parts") == 2)
    both = parsed.select(
        F.element_at("parts", 1).cast("bigint").alias("a"),
        F.element_at("parts", 2).cast("bigint").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())

    # Header and edges are shape-identical (two ints); the header is the
    # single row equal to (numNodes, numEdges).  Read it driver-side —
    # one small lookup — then exclude exactly one matching row.
    first = spark.read.text(path).limit(1).collect()[0].value.split()
    num_nodes, num_edges = int(first[0]), int(first[1])

    w_edges = both.withColumn(
        "is_header",
        (F.col("a") == num_nodes) & (F.col("b") == num_edges),
    )
    # drop one header occurrence (monotonically_increasing_id orders
    # within the scan; the header is the first such row)
    header_rows = w_edges.filter("is_header")
    edges = w_edges.filter(~F.col("is_header")).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    extra_header_like = header_rows.count() - 1
    if extra_header_like > 0:
        # a data edge coincidentally equal to the header pair: add the
        # surplus copies back
        dup = spark.createDataFrame(
            [(num_nodes, num_edges)] * extra_header_like, "src bigint, dst bigint"
        )
        edges = edges.union(dup)

    if validate:
        actual = edges.count()
        if actual != num_edges:
            raise ValueError(
                f"edge list header declares {num_edges} edges,"
                f" parsed {actual}"
            )
    return edges


# write_edge_list collects the full edge set to the driver — a fixture
# writer, never a production sink.  The guard makes misuse on a real
# graph an immediate error instead of a driver OOM.
WRITE_EDGE_LIST_MAX_ROWS = 1_000_000


def write_edge_list(df: DataFrame, path: str) -> None:
    """Persist ``edges(src, dst)`` in the reference text format (one
    header line + sorted pairs).  Driver-side write, intended for test
    fixtures — production graph persistence is parquet.  Refuses edge
    sets above WRITE_EDGE_LIST_MAX_ROWS."""
    n = df.count()
    if n > WRITE_EDGE_LIST_MAX_ROWS:
        raise ValueError(
            f"write_edge_list is a test-fixture writer: {n} edges exceeds"
            f" the {WRITE_EDGE_LIST_MAX_ROWS}-row guard; persist large"
            " graphs as parquet (df.write.parquet) instead"
        )
    rows = df.select("src", "dst").orderBy("src", "dst").collect()
    nodes = set()
    for r in rows:
        nodes.add(r.src)
        nodes.add(r.dst)
    with open(path, "w") as f:
        f.write(f"{len(nodes)} {len(rows)}\n")
        for r in rows:
            f.write(f"{r.src} {r.dst}\n")
