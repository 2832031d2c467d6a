"""KMV (K-minimum-values) distinct-count sketch.

The sketch family a 100 TB pipeline leans on (HLL, CMS, theta) shares
one property: tiny mergeable state.  KMV is the member whose state is
*relationally expressible* — the k smallest hash values of the
distinct set — which buys two things the others can't offer here:

* the whole sketch is a composition of built-in operators (hash →
  distinct → global k-smallest, i.e. ``orderBy().limit(k)`` =
  TakeOrderedAndProject, per-partition k then a k-row merge — the
  same mergeability that lets sketches combine across shards);
* it is DETERMINISTIC given the hash function, so the ESTIMATE itself
  is verified bit-for-bit against the DuckDB oracle — not just
  "within error bounds".

Estimator: with U = 2^32 hash space and h_k the k-th smallest of n
uniform hashes, E[h_k] ≈ k·U/(n+1), so n̂ = (k-1)·U/h_k (the
standard unbiased KMV form).  Expected relative error ~ 1/√(k-2).

The reference has no sketches (SURVEY.md §2.2); north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.tables import table

KMV_K = 256
HASH_SPACE = 2**32

# engine-specific hex→int on an md5 prefix (same pair as dedup.py)
_HASH_SPARK = "cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"
_HASH_DUCK = "(('0x' || substr(md5(tok), 1, 8))::BIGINT)"


def kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate the distinct-token count of the documents corpus with
    a K=256 KMV sketch, next to the exact count for comparison.
    Returns one row (k, h_k, est_distinct, exact_distinct)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    hashes = toks.select(F.expr(_HASH_SPARK).alias("h")).distinct()
    kmin = hashes.orderBy(F.asc("h")).limit(KMV_K)
    state = kmin.agg(
        F.count(F.lit(1)).alias("k"), F.max("h").alias("h_k")
    )
    exact = toks.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return state.crossJoin(exact).select(
        "k",
        "h_k",
        F.round(
            (F.col("k") - 1) * F.lit(float(HASH_SPACE)) / F.col("h_k"), 4
        ).alias("est_distinct"),
        "exact_distinct",
    )


KMV_SQL = (
    "WITH toks AS (SELECT DISTINCT tok FROM documents,"
    " unnest(string_split(text, ' ')) t(tok)),"
    f" hashes AS (SELECT DISTINCT {_HASH_DUCK} AS h FROM toks),"
    f" kmin AS (SELECT h FROM hashes ORDER BY h ASC LIMIT {KMV_K}),"
    " state AS (SELECT COUNT(*) AS k, MAX(h) AS h_k FROM kmin),"
    " exact AS (SELECT COUNT(*) AS exact_distinct FROM toks)"
    " SELECT k, h_k,"
    f" ROUND((k - 1) * {float(HASH_SPACE)} / h_k, 4) AS est_distinct,"
    " exact_distinct"
    " FROM state CROSS JOIN exact"
)


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_DEPTH = 4       # independent hash rows
CMS_WIDTH = 512     # buckets per row
CMS_TOP_K = 15


def _cms_hash_spark(d: int) -> str:
    # row-d hash: md5 of (d || token), 8 hex chars → bucket
    return (
        f"cast(conv(substr(md5(concat('{d}|', tok)), 1, 8), 16, 10)"
        f" as bigint) % {CMS_WIDTH}"
    )


def _cms_hash_duck(d: int) -> str:
    return (
        f"(('0x' || substr(md5(concat('{d}|', tok)), 1, 8))::BIGINT)"
        f" % {CMS_WIDTH}"
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream, queried for the
    exact top-k tokens: per heavy hitter, the CMS estimate (min over
    depth rows of its bucket counts) next to the true count.

    The sketch IS relational state: depth×width counters built as ONE
    pass (each token contributes to CMS_DEPTH buckets via explode),
    aggregated partial/final — mergeable across shards/streams by
    construction (counter addition), the property that makes CMS the
    frequency sketch at 100 TB.  Estimates are deterministic given the
    md5 row hashes, so the driver verifies them bit-for-bit; the
    overestimate bound (est ≥ truth, est ≤ truth + εN w.h.p.) is
    asserted in tests.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    # counters: one explode row per (depth, bucket) hit
    hits = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_cms_hash_spark(d)).alias("b"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("h")
    )
    counters = hits.groupBy("h.d", "h.b").agg(
        F.count(F.lit(1)).alias("c")
    )
    # query side: the true top-k tokens and their per-row buckets
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("tok"))
        .limit(CMS_TOP_K)
    )
    probes = top.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_cms_hash_spark(d)).alias("b"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select("tok", "true_count", "h.d", "h.b")
    return (
        probes.join(F.broadcast(counters), ["d", "b"])
        .groupBy("tok", "true_count")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
    )


def cms_heavy_hitters_sql() -> str:
    hit_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {_cms_hash_duck(d)} AS b, tok FROM toks"
        for d in range(CMS_DEPTH)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT tok, true_count, {d} AS d, {_cms_hash_duck(d)} AS b"
        " FROM top" for d in range(CMS_DEPTH)
    )
    return (
        "WITH toks AS (SELECT tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)),"
        f" hits AS ({hit_rows}),"
        " counters AS (SELECT d, b, COUNT(*) AS c FROM hits GROUP BY d, b),"
        " top AS (SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY tok"
        f"  ORDER BY true_count DESC, tok ASC LIMIT {CMS_TOP_K}),"
        f" probes AS ({probe_rows})"
        " SELECT p.tok, p.true_count,"
        " CAST(MIN(c.c) AS BIGINT) AS cms_estimate"
        " FROM probes p JOIN counters c ON c.d = p.d AND c.b = p.b"
        " GROUP BY 1, 2"
    )
