"""Spatial operators (north-star extension): radius joins over point
data via uniform grid bucketing — the equi-join reduction of a
geometric predicate, which is the only join shape that scales on a
shuffle engine (the same trick PostGIS ST_DWithin + GiST performs
index-side, re-expressed as DataFrame ops).

The fixtures carry no geography, so coordinates are SYNTHESIZED
deterministically from the keys (multiplicative hashing — the datagen
recurrence, /root/reference/src/regtests/datagen.cpp analogue) in the
unit square; the operator logic (cell assignment, neighborhood
replication, candidate verify) is the real thing and transfers to any
(lat, lon) column pair unchanged.

Determinism: coordinates derive from exact BIGINT arithmetic divided
by 2^32 — bit-identical doubles on both engines; squared distances
compare against the radius with identical IEEE ops.  No trig is used
anywhere (haversine would hit libm differences between engines; at
production scale you would switch the verify predicate to haversine
and keep the grid in projected coordinates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.tables import table

SPATIAL_RADIUS = 0.05   # unit-square radius for the join
_KNUTH = 2654435761     # Knuth multiplicative hash constant
_TWO32 = 4294967296


_TWO16 = 65536


def _coord(key: str, salt: int):
    """Deterministic uniform coordinate in [0, 1): exact bigint
    mixing, then one double division.

    The multiply is SPLIT into 16-bit halves so every intermediate
    stays far below 2^63 for any non-negative bigint key: a direct
    ``key * KNUTH`` overflows int64 for keys above ~3.46e9, where
    Spark (non-ANSI) wraps silently but DuckDB raises — the two
    engines would diverge at large scale factors (ADVICE r05).
    ``(hi*2^16 + lo) * KNUTH ≡ (hi*KNUTH mod 2^32)*2^16 + lo*KNUTH
    (mod 2^32)``; worst intermediate < 2^49.
    """
    k = F.col(key).cast("bigint") % _TWO32
    hi = F.expr(f"(cast({key} as bigint) % {_TWO32}) div {_TWO16}")
    lo = k % _TWO16
    mixed = ((hi * _KNUTH) % _TWO32 * _TWO16 + lo * _KNUTH + salt) % _TWO32
    return mixed.cast("double") / float(_TWO32)


def _coord_sql(key: str, salt: int) -> str:
    k = f"(CAST({key} AS BIGINT) % {_TWO32})"
    return (
        f"(({k} // {_TWO16} * {_KNUTH}) % {_TWO32} * {_TWO16}"
        f" + {k} % {_TWO16} * {_KNUTH} + {salt}) % {_TWO32}"
        f" / {float(_TWO32)!r}"
    )


def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) pairs within SPATIAL_RADIUS in the
    unit square — the radius join.

    Grid reduction: cell size = radius, so any qualifying pair sits
    in the same or an adjacent cell.  The SMALL side (suppliers) is
    replicated to its 3x3 cell neighborhood (a bounded 9x explode)
    and broadcast; the big side computes one cell id and hash-joins —
    the geometric predicate becomes one equi-join plus a cheap
    per-candidate verify.  At 100 TB: the big side is never
    replicated and never shuffled (broadcast join), work scales with
    true candidate density, and skewed cells can reuse the salted
    join machinery (functions/skew.py) unchanged.

    Returns (c_custkey, s_suppkey, d2) with d2 the squared distance
    rounded to 12 digits.
    """
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("c_custkey", 1).alias("x"),
        _coord("c_custkey", 2).alias("y"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("s_suppkey", 3).alias("sx"),
        _coord("s_suppkey", 4).alias("sy"),
    )
    cust = cust.withColumn(
        "cx", F.floor(F.col("x") / SPATIAL_RADIUS)
    ).withColumn("cy", F.floor(F.col("y") / SPATIAL_RADIUS))
    # replicate each supplier to its 3x3 neighborhood
    supp9 = (
        supp.withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.floor(F.col("sx") / SPATIAL_RADIUS) + F.col("dx")).alias("cx"),
            (F.floor(F.col("sy") / SPATIAL_RADIUS) + F.col("dy")).alias("cy"),
        )
    )
    # explicit products, not pow(x, 2): the oracle multiplies, and
    # pow is not guaranteed bit-identical to x*x
    ddx = F.col("x") - F.col("sx")
    ddy = F.col("y") - F.col("sy")
    d2 = ddx * ddx + ddy * ddy
    return (
        cust.join(F.broadcast(supp9), ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= SPATIAL_RADIUS * SPATIAL_RADIUS)
        .select("c_custkey", "s_suppkey", F.round("d2", 12).alias("d2"))
    )


SPATIAL_GRID_JOIN_SQL = (
    "WITH cust AS (SELECT c_custkey,"
    f" {_coord_sql('c_custkey', 1)} AS x,"
    f" {_coord_sql('c_custkey', 2)} AS y FROM customer),"
    " supp AS (SELECT s_suppkey,"
    f" {_coord_sql('s_suppkey', 3)} AS sx,"
    f" {_coord_sql('s_suppkey', 4)} AS sy FROM supplier)"
    " SELECT c_custkey, s_suppkey,"
    " ROUND((x - sx) * (x - sx) + (y - sy) * (y - sy), 12) AS d2"
    " FROM cust, supp"
    " WHERE (x - sx) * (x - sx) + (y - sy) * (y - sy)"
    f"  <= {SPATIAL_RADIUS * SPATIAL_RADIUS!r}"
)
