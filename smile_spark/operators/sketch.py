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
