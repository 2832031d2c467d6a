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

from smile_spark.tables import persisted_once, table

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
# HyperLogLog distinct count
# ---------------------------------------------------------------------------

HLL_P = 8                      # precision: m = 2^p registers
HLL_M = 1 << HLL_P             # 256
HLL_REM_BITS = 32 - HLL_P      # 24 bits feed the rank (rho) computation
# alpha_m for m >= 128 (Flajolet et al. 2007, §4); the literal is
# embedded identically in both engines' expressions.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_rho_spark(r: str) -> str:
    """rho = 1 + #leading zeros of the 24-bit remainder.

    Integer/string-only (bin → lpad → count leading '0's): no float
    log2 whose last-ulp behavior could differ between engines."""
    return (
        f"length(regexp_extract(lpad(bin({r}), {HLL_REM_BITS}, '0'),"
        " '^0*', 0)) + 1"
    )


def _hll_rho_duck(r: str) -> str:
    return (
        f"length(regexp_extract(lpad(bin({r}), {HLL_REM_BITS}, '0'),"
        " '^0*')) + 1"
    )


def hll_registers(toks: DataFrame) -> DataFrame:
    """Build the HLL register table (bucket, mj) from a ``tok`` string
    column.  Registers merge across shards/batches by register-wise
    MAX — ``regs_a.union(regs_b).groupBy("bucket").agg(max("mj"))`` is
    the whole merge protocol."""
    hashed = toks.select(F.expr(_HASH_SPARK).alias("h"))
    return hashed.select(
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(_hll_rho_spark(f"h div {HLL_M}")).alias("rho"),
    ).groupBy("bucket").agg(F.max("rho").alias("mj"))


def _hll_est_col(nreg: str = "n_registers", zp: str = "z_present"):
    """The estimate expression over (n_registers, z_present) columns:
    raw harmonic-mean estimate with the small-range linear-counting
    branch."""
    est_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        / (F.col(zp) + (F.lit(HLL_M) - F.col(nreg)))
    )
    n_empty = F.lit(HLL_M) - F.col(nreg)
    return F.when(
        (est_raw <= 2.5 * HLL_M) & (n_empty > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / n_empty),
    ).otherwise(est_raw)


def hll_estimate_from_registers(
    regs: DataFrame, exact: DataFrame
) -> DataFrame:
    """Estimate row from a register table plus a 1-row exact count
    (pass ``exact_distinct = NULL`` upstream when truth is unknown —
    e.g. estimating from persisted streaming state)."""
    state = regs.agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z_present"),
    )
    est = _hll_est_col()
    return state.crossJoin(exact).select(
        F.lit(HLL_M).cast("bigint").alias("m"),
        F.col("n_registers").cast("bigint").alias("n_registers"),
        F.round(est, 4).alias("est_distinct"),
        "exact_distinct",
    )


def hll_estimate(toks: DataFrame) -> DataFrame:
    """HLL register build + estimate over a ``tok`` string column.
    Returns one row (m, n_registers, est_distinct, exact_distinct)."""
    distinct_toks = toks.select("tok").distinct()
    regs = hll_registers(distinct_toks)
    exact = distinct_toks.agg(F.count(F.lit(1)).alias("exact_distinct"))
    return hll_estimate_from_registers(regs, exact)


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate next to the exact count.

    The register table IS relational state: bucket = low p hash bits,
    register value = MAX(rho) per bucket — one hash aggregate with
    map-side partial MAX, mergeable across shards/streams by
    construction (register-wise MAX), which is why HLL is *the*
    cardinality sketch at 100 TB.  The raw-estimate sum
    Σ 2^-M_j is a sum of powers of two ≥ 2^-25 bounded by m, exact in
    a double in ANY accumulation order — so the estimate (incl. the
    small-range linear-counting branch) is deterministic and verified
    bit-for-bit against DuckDB.  Rank uses bin/lpad string ops, not
    float log2, for the same reason.

    Returns one row (m, n_registers, est_distinct, exact_distinct).
    The reference has no sketches (SURVEY.md §2.2); north-star scope.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    return hll_estimate(toks)


def hll_distinct_sql() -> str:
    est_raw = (
        f"{HLL_ALPHA * HLL_M * HLL_M!r}"
        f" / (z_present + ({HLL_M} - n_registers))"
    )
    n_empty = f"({HLL_M} - n_registers)"
    return (
        "WITH toks AS (SELECT DISTINCT tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)),"
        f" hashed AS (SELECT {_HASH_DUCK} AS h FROM toks),"
        f" regs AS (SELECT h % {HLL_M} AS bucket,"
        f"  MAX({_hll_rho_duck(f'h // {HLL_M}')}) AS mj"
        "  FROM hashed GROUP BY bucket),"
        " state AS (SELECT COUNT(*) AS n_registers,"
        "  SUM(power(2.0, -mj)) AS z_present FROM regs),"
        " exact AS (SELECT COUNT(*) AS exact_distinct FROM toks)"
        f" SELECT CAST({HLL_M} AS BIGINT) AS m,"
        " CAST(n_registers AS BIGINT) AS n_registers,"
        f" ROUND(CASE WHEN {est_raw} <= {2.5 * HLL_M}"
        f"  AND {n_empty} > 0"
        f"  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / {n_empty})"
        f"  ELSE {est_raw} END, 4) AS est_distinct,"
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


def hll_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HyperLogLog: distinct-token estimate PER SOURCE next to
    the exact count — the NDV-per-partition profile (distinct users
    per day, distinct keys per shard) that production systems answer
    with sketches because per-group COUNT(DISTINCT) re-shuffles the
    raw values per group.

    Register state generalizes to one MAX-aggregate keyed
    (group, bucket): ≤256 rows per group whatever the group's
    cardinality, still mergeable by register-wise MAX within each
    group.  Returns (source, n_registers, est_distinct,
    exact_distinct)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    regs = (
        toks.select(
            "source",
            (F.expr(_HASH_SPARK) % HLL_M).alias("bucket"),
            F.expr(
                _hll_rho_spark(f"({_HASH_SPARK}) div {HLL_M}")
            ).alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    state = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z_present"),
    )
    exact = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return state.join(exact, "source").select(
        "source",
        F.col("n_registers").cast("bigint").alias("n_registers"),
        F.round(_hll_est_col(), 4).alias("est_distinct"),
        "exact_distinct",
    )


def hll_per_source_sql() -> str:
    est_raw = (
        f"{HLL_ALPHA * HLL_M * HLL_M!r}"
        f" / (z_present + ({HLL_M} - n_registers))"
    )
    n_empty = f"({HLL_M} - n_registers)"
    return (
        "WITH toks AS (SELECT DISTINCT source, tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)),"
        f" regs AS (SELECT source, {_HASH_DUCK} % {HLL_M} AS bucket,"
        f"  MAX({_hll_rho_duck(f'({_HASH_DUCK}) // {HLL_M}')}) AS mj"
        "  FROM toks GROUP BY 1, 2),"
        " state AS (SELECT source, COUNT(*) AS n_registers,"
        "  SUM(power(2.0, -mj)) AS z_present FROM regs GROUP BY source),"
        " exact AS (SELECT source, COUNT(*) AS exact_distinct FROM toks"
        "  GROUP BY source)"
        " SELECT source,"
        " CAST(n_registers AS BIGINT) AS n_registers,"
        f" ROUND(CASE WHEN {est_raw} <= {2.5 * HLL_M}"
        f"  AND {n_empty} > 0"
        f"  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / {n_empty})"
        f"  ELSE {est_raw} END, 4) AS est_distinct,"
        " exact_distinct"
        " FROM state JOIN exact USING (source)"
    )


OVERLAP_SRC_A = "src0"
OVERLAP_SRC_B = "src1"


def hll_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: estimate the distinct-token overlap between
    two sources from their HLL registers alone — union by register-wise
    MAX, intersection by inclusion–exclusion — next to the exact
    intersection for comparison.

    This is why sketch state matters at 100 TB: per-shard registers
    answer cross-shard overlap questions ("how much of source B is
    already in source A?") WITHOUT ever co-shuffling the raw values —
    the whole comparison runs on 2×256 register rows.  Deterministic
    md5 hashing makes every estimate oracle-checkable bit-for-bit.

    Returns one row (est_a, est_b, est_union, est_intersect,
    exact_intersect).
    """
    docs = table(spark, sf_dir, "documents").filter(
        F.col("source").isin(OVERLAP_SRC_A, OVERLAP_SRC_B)
    )
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    # three consumers (state_a, state_b, merged union); memoized per
    # application so repeated invocations reuse ONE cache entry
    regs = persisted_once(
        spark,
        "hll_overlap_regs",
        sf_dir,
        lambda: toks.select(
            "source",
            (F.expr(_HASH_SPARK) % HLL_M).alias("bucket"),
            F.expr(
                _hll_rho_spark(f"({_HASH_SPARK}) div {HLL_M}")
            ).alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("mj")),
    )

    def _state(df: DataFrame, suffix: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(f"n_registers_{suffix}"),
            F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias(
                f"z_present_{suffix}"
            ),
        )

    sa = _state(regs.filter(F.col("source") == OVERLAP_SRC_A), "a")
    sb = _state(regs.filter(F.col("source") == OVERLAP_SRC_B), "b")
    su = _state(
        regs.groupBy("bucket").agg(F.max("mj").alias("mj")), "u"
    )
    exact = (
        toks.filter(F.col("source") == OVERLAP_SRC_A)
        .select("tok")
        .join(
            toks.filter(F.col("source") == OVERLAP_SRC_B).select("tok"),
            "tok",
            "semi",
        )
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    est_a = F.round(_hll_est_col("n_registers_a", "z_present_a"), 4)
    est_b = F.round(_hll_est_col("n_registers_b", "z_present_b"), 4)
    est_u = F.round(_hll_est_col("n_registers_u", "z_present_u"), 4)
    return (
        sa.crossJoin(sb).crossJoin(su).crossJoin(exact).select(
            est_a.alias("est_a"),
            est_b.alias("est_b"),
            est_u.alias("est_union"),
            F.round(est_a + est_b - est_u, 4).alias("est_intersect"),
            "exact_intersect",
        )
    )


def hll_source_overlap_sql() -> str:
    def est(nreg: str, zp: str) -> str:
        est_raw = (
            f"{HLL_ALPHA * HLL_M * HLL_M!r} / ({zp} + ({HLL_M} - {nreg}))"
        )
        n_empty = f"({HLL_M} - {nreg})"
        return (
            f"ROUND(CASE WHEN {est_raw} <= {2.5 * HLL_M}"
            f" AND {n_empty} > 0"
            f" THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / {n_empty})"
            f" ELSE {est_raw} END, 4)"
        )

    ea = est("n_registers_a", "z_present_a")
    eb = est("n_registers_b", "z_present_b")
    eu = est("n_registers_u", "z_present_u")
    return (
        "WITH toks AS (SELECT DISTINCT source, tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)"
        f" WHERE source IN ('{OVERLAP_SRC_A}', '{OVERLAP_SRC_B}')),"
        f" regs AS (SELECT source, {_HASH_DUCK} % {HLL_M} AS bucket,"
        f"  MAX({_hll_rho_duck(f'({_HASH_DUCK}) // {HLL_M}')}) AS mj"
        "  FROM toks GROUP BY 1, 2),"
        " sa AS (SELECT COUNT(*) AS n_registers_a,"
        "  SUM(power(2.0, -mj)) AS z_present_a FROM regs"
        f"  WHERE source = '{OVERLAP_SRC_A}'),"
        " sb AS (SELECT COUNT(*) AS n_registers_b,"
        "  SUM(power(2.0, -mj)) AS z_present_b FROM regs"
        f"  WHERE source = '{OVERLAP_SRC_B}'),"
        " mu AS (SELECT bucket, MAX(mj) AS mj FROM regs GROUP BY bucket),"
        " su AS (SELECT COUNT(*) AS n_registers_u,"
        "  SUM(power(2.0, -mj)) AS z_present_u FROM mu),"
        " exact AS (SELECT COUNT(*) AS exact_intersect FROM ("
        f"  SELECT tok FROM toks WHERE source = '{OVERLAP_SRC_A}'"
        "  INTERSECT"
        f"  SELECT tok FROM toks WHERE source = '{OVERLAP_SRC_B}'))"
        f" SELECT {ea} AS est_a, {eb} AS est_b, {eu} AS est_union,"
        f" ROUND({ea} + {eb} - {eu}, 4) AS est_intersect,"
        " exact_intersect"
        " FROM sa CROSS JOIN sb CROSS JOIN su CROSS JOIN exact"
    )


# ---------------------------------------------------------------------------
# Join-size estimation by correlated sampling
# ---------------------------------------------------------------------------

JSE_RATE = 16  # sample keys with h(key) < HASH_SPACE / JSE_RATE


def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate |orders ⋈ high-balance customers| WITHOUT running the
    join — the sketch a cost-based optimizer consults before picking
    join order.  Correlated sampling (Vengerov et al., VLDB'15): both
    sides keep only keys whose shared hash falls under 1/JSE_RATE of
    the hash space, the surviving per-key count products are summed
    and scaled back up.  Because the SAME hash selects both sides,
    matching keys survive together — unlike independent Bernoulli
    sampling, which squares the survival probability and ruins join
    estimates.

    Emits the estimate NEXT TO the exact join size (the validation
    column a production planner would not compute): (est_join_rows,
    exact_join_rows, n_sampled_keys, rel_err).

    Scale: the sketch path touches 1/16 of DISTINCT keys — the
    shuffle is count-per-key rows on the sampled keys only, and the
    filter h < threshold pushes to each side BEFORE the join.
    Deterministic: the md5-prefix hash is the engine-portable pair
    used by every sketch in this module."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    cnt_a = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cnt_b = c.groupBy(F.col("c_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    h = (
        "cast(conv(substr(md5(cast(key as string)), 1, 8), 16, 10)"
        " as bigint)"
    )
    thresh = HASH_SPACE // JSE_RATE
    sa = cnt_a.filter(F.expr(h) < thresh)
    sb = cnt_b.filter(F.expr(h) < thresh)
    est = sa.join(sb, "key").agg(
        (F.sum(F.col("ca") * F.col("cb")) * JSE_RATE)
        .cast("bigint")
        .alias("est_join_rows"),
        F.count(F.lit(1)).alias("n_sampled_keys"),
    )
    exact = cnt_a.join(cnt_b, "key").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias(
            "exact_join_rows"
        )
    )
    return est.crossJoin(exact).select(
        "est_join_rows",
        "exact_join_rows",
        "n_sampled_keys",
        F.round(
            (F.col("est_join_rows") - F.col("exact_join_rows"))
            / F.col("exact_join_rows").cast("double"),
            6,
        ).alias("rel_err"),
    )


JOIN_SIZE_ESTIMATE_SQL = (
    "WITH cnt_a AS (SELECT o_custkey AS key, COUNT(*) AS ca"
    "  FROM orders GROUP BY 1),"
    " cnt_b AS (SELECT c_custkey AS key, COUNT(*) AS cb"
    "  FROM customer WHERE c_acctbal > 5000 GROUP BY 1),"
    " sa AS (SELECT * FROM cnt_a WHERE"
    "  ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))::BIGINT"
    f"  < {HASH_SPACE // JSE_RATE}),"
    " sb AS (SELECT * FROM cnt_b WHERE"
    "  ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8))::BIGINT"
    f"  < {HASH_SPACE // JSE_RATE}),"
    " est AS (SELECT"
    f"  CAST(SUM(ca * cb) * {JSE_RATE} AS BIGINT) AS est_join_rows,"
    "  COUNT(*) AS n_sampled_keys"
    "  FROM sa JOIN sb USING (key)),"
    " exact AS (SELECT CAST(SUM(ca * cb) AS BIGINT) AS exact_join_rows"
    "  FROM cnt_a JOIN cnt_b USING (key))"
    " SELECT est_join_rows, exact_join_rows, n_sampled_keys,"
    " ROUND((est_join_rows - exact_join_rows)"
    "  / CAST(exact_join_rows AS DOUBLE), 6) AS rel_err"
    " FROM est CROSS JOIN exact"
)


# ---------------------------------------------------------------------------
# Bitmap-index distinct counting (dense-id exact NDV)
# ---------------------------------------------------------------------------


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via word-packed bitmaps —
    the Roaring/groupBitmap technique (Druid, ClickHouse): when ids
    are dense integers, COUNT(DISTINCT) becomes bit_or over packed
    words followed by popcount, and the per-group state is id_range/32
    words instead of one row per distinct value.  (32 ids per BIGINT
    word: shift position 63 overflows DuckDB's checked <<, so the top
    half of each word stays unused — same asymptotics.)

    Why it beats COUNT(DISTINCT) at 100 TB: the shuffle carries
    (group, word_idx, word) partials — mergeable by BIT_OR, which is
    idempotent, so partial aggregation combines map-side AND the same
    merge serves shards/streams/snapshots (set union = OR, the HLL
    register contract made exact).  Intersections (users doing BOTH
    event types) come from AND on the same words with no rescan.

    Emits (event_type, n_users, n_words): popcount total and bitmap
    state size; deterministic integer arithmetic end to end."""
    ev = table(spark, sf_dir, "events")
    # Integer `div`, not a double division + truncating cast: doubles
    # lose exactness for ids >= 2^53 and truncate toward zero instead
    # of flooring, silently merging/splitting words (ADVICE r05).
    packed = ev.select(
        "event_type",
        F.expr("cast(user_id as bigint) div 32").alias("word_idx"),
        F.expr(
            "shiftleft(cast(1 as bigint), cast(user_id % 32 as int))"
        ).alias("mask"),
    )
    words = packed.groupBy("event_type", "word_idx").agg(
        F.bit_or("mask").alias("w")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("w")).cast("bigint").alias("n_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


BITMAP_DISTINCT_SQL = (
    "WITH packed AS (SELECT event_type,"
    " CAST(user_id // 32 AS BIGINT) AS word_idx,"
    " (CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS mask"
    " FROM events),"
    " words AS (SELECT event_type, word_idx, BIT_OR(mask) AS w"
    "  FROM packed GROUP BY event_type, word_idx)"
    " SELECT event_type, CAST(SUM(BIT_COUNT(w)) AS BIGINT) AS n_users,"
    " COUNT(*) AS n_words"
    " FROM words GROUP BY event_type"
)
