"""Extended analytics surface: grouping sets, pivot, exact quantiles,
moment statistics, analytic frames, deterministic sampling, date and
array function families.

The reference has none of these (SURVEY.md §2.2 — aggregations stop at
COUNT/SUM, there are no window/sort/string/date functions), but every
one of them is produced by the same partial→final hash-aggregate and
window machinery the reference hand-rolls for its five kernels, so they
are capability demos licensed by §2.2, not inventions.

Cross-engine determinism (the driver hashes values bit-for-bit):

* every SUM of a double measure accumulates in DECIMAL on both engines
  (smile_spark/functions/numeric.py);
* moment statistics (corr/covar/stddev) are computed from EXACT decimal
  moments (n, Σx, Σy, Σx², Σy², Σxy) with the final closed-form
  arithmetic written as the *identical* double expression in both
  engines — a single-pass, shuffle-bounded plan that is also the right
  shape at 100 TB (six numeric partials per group, map-side combined);
* quantiles interpolate identically (percentile ≡ quantile_cont) and
  are rounded to 6 digits to absorb the last-bit division difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smile_spark.functions.numeric import DEC, davg, dsum
from smile_spark.tables import table

# ---------------------------------------------------------------------------
# CUBE — the full grouping-set lattice
# ---------------------------------------------------------------------------


def cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping levels in
    one pass.  Spark expands the cube into a single aggregate whose
    partial state feeds every level — one scan, one shuffle, vs. the
    naive one-scan-per-level.  NULL markers become explicit strings so
    the cross-engine hash is well-defined (same as rollup_summary)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("status"),
            "cnt",
            "sum_qty",
        )
    )


CUBE_SUMMARY_SQL = (
    "SELECT COALESCE(l_returnflag, '(all)') AS flag,"
    " COALESCE(l_linestatus, '(all)') AS status,"
    " COUNT(*) AS cnt,"
    " CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty"
    " FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
)


# ---------------------------------------------------------------------------
# PIVOT — long → wide reshaping
# ---------------------------------------------------------------------------

PIVOT_FLAGS = ("A", "N", "R")


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: one row per linestatus, one column per
    returnflag.  The value list is pinned (A/N/R) so the plan is a
    single conditional aggregate — Spark never needs the extra
    distinct-values job, and the oracle is plain conditional SQL.
    At 100 TB an unpinned pivot would scan twice; always pin."""
    li = table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", list(PIVOT_FLAGS))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "l_linestatus",
        *[F.coalesce(F.col(f), F.lit(0)).alias(f"cnt_{f.lower()}") for f in PIVOT_FLAGS],
    )


PIVOT_WIDE_SQL = (
    "SELECT l_linestatus,"
    + ", ".join(
        f" CAST(SUM(CASE WHEN l_returnflag = '{f}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS cnt_{f.lower()}"
        for f in PIVOT_FLAGS
    )
    + " FROM lineitem GROUP BY l_linestatus"
)


# ---------------------------------------------------------------------------
# Exact quantiles
# ---------------------------------------------------------------------------


def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (p25/median/p75) of quantity per
    returnflag.  ``percentile`` in Spark and ``quantile_cont`` in DuckDB
    both use linear interpolation; results round to 6 digits to absorb
    last-bit division drift.  Exact percentile sorts within each group —
    at 100 TB you'd reach for approx_percentile (t-digest) when ±ε is
    acceptable; this operator is the exact-answer path."""
    li = table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_quantity, array(0.25D, 0.5D, 0.75D))"
        ).alias("qs"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return q.select(
        "l_returnflag",
        F.round(F.element_at("qs", 1), 6).alias("p25"),
        F.round(F.element_at("qs", 2), 6).alias("median"),
        F.round(F.element_at("qs", 3), 6).alias("p75"),
        "cnt",
    )


PERCENTILES_SQL = (
    "WITH q AS (SELECT l_returnflag,"
    " quantile_cont(l_quantity, [0.25, 0.5, 0.75]) AS qs,"
    " COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag)"
    " SELECT l_returnflag, ROUND(qs[1], 6) AS p25,"
    " ROUND(qs[2], 6) AS median, ROUND(qs[3], 6) AS p75, cnt FROM q"
)


# ---------------------------------------------------------------------------
# Moment statistics from exact decimal moments
# ---------------------------------------------------------------------------

_DEC_PROD = "decimal(28,4)"


def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / stddev_samp via exact moment accumulation.

    Naive ``F.corr`` sums doubles in partition order — nondeterministic
    across engines AND across runs of the same engine.  Instead the six
    moments (n, Σx, Σy, Σx², Σy², Σxy) accumulate exactly in DECIMAL
    (associative + commutative → partitioning-independent), and the
    closed forms are evaluated once, in double, with the identical
    expression tree on both engines.  Single pass, six numeric partials
    per group — the only shape that gives reproducible statistics on a
    1000-executor cluster.
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(DEC)
    y = F.col("l_extendedprice").cast(DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast(_DEC_PROD)).cast("double").alias("sxx"),
        F.sum((y * y).cast(_DEC_PROD)).cast("double").alias("syy"),
        F.sum((x * y).cast(_DEC_PROD)).cast("double").alias("sxy"),
    )
    cov_num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    varx_num = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vary_num = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("cnt"),
        F.round(cov_num / (F.col("n") - 1), 6).alias("covar_qty_price"),
        F.round(F.sqrt(varx_num / (F.col("n") - 1)), 6).alias("stddev_qty"),
        F.round(F.sqrt(vary_num / (F.col("n") - 1)), 6).alias("stddev_price"),
        F.round(cov_num / F.sqrt(varx_num * vary_num), 6).alias(
            "corr_qty_price"
        ),
    )


CORR_STATS_SQL = (
    "WITH m AS (SELECT l_returnflag,"
    " CAST(COUNT(*) AS DOUBLE) AS n,"
    " CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,"
    " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,"
    " CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))"
    "  * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE)"
    "  AS sxx,"
    " CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    "  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4)))"
    "  AS DOUBLE) AS syy,"
    " CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))"
    "  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4)))"
    "  AS DOUBLE) AS sxy"
    " FROM lineitem GROUP BY l_returnflag)"
    " SELECT l_returnflag, CAST(n AS BIGINT) AS cnt,"
    " ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price,"
    " ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,"
    " ROUND(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS stddev_price,"
    " ROUND((sxy - sx * sy / n)"
    "  / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)"
    "  AS corr_qty_price"
    " FROM m"
)


# ---------------------------------------------------------------------------
# Analytic frames: lag / delta / moving aggregate
# ---------------------------------------------------------------------------


def lead_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequence analytics: previous value, delta, and a
    3-row moving average.  One shuffle on user_id then a per-partition
    sort — the frame never re-shuffles.  The moving average divides an
    exact decimal frame-sum by the frame count, so it is deterministic
    without rounding; the delta is a single IEEE subtraction (exact on
    both engines).  Ordering ties broken by event_id."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-2, 0)
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
        (
            F.sum(F.col("value").cast(DEC)).over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
        ).alias("mavg3"),
    )


LEAD_LAG_DELTA_SQL = (
    # µs-truncate ts first: Spark reads the ns fixture at µs resolution,
    # and the window ORDER BY must see identical instants.
    "WITH e AS (SELECT event_id, user_id,"
    " date_trunc('microseconds', ts) AS ts, value FROM events)"
    " SELECT event_id, user_id, ts, value,"
    " LAG(value) OVER w AS prev_value,"
    " value - LAG(value) OVER w AS delta,"
    " CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER ("
    "   PARTITION BY user_id ORDER BY ts, event_id"
    "   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)"
    " / COUNT(*) OVER ("
    "   PARTITION BY user_id ORDER BY ts, event_id"
    "   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3"
    " FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
)


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

SAMPLE_PCT = 10


def sampling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample of the corpus by key hash.

    ``df.sample()`` seeds per-partition, so its row set changes with
    the partitioning — useless for reproducible pipeline snapshots.
    Hashing the key (md5 prefix mod 100) picks the SAME rows at any
    scale, any partitioning, any engine; it is also a pure pushed-down
    filter (no shuffle, no state).  This is how a training pipeline
    pins a stable eval holdout at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        " as bigint) % 100"
    )
    return (
        docs.select("doc_id", "source", bucket.alias("sample_bucket"))
        .filter(F.col("sample_bucket") < SAMPLE_PCT)
    )


SAMPLING_HASH_SQL = (
    "SELECT doc_id, source,"
    " (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 100"
    "  AS sample_bucket"
    " FROM documents"
    " WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)"
    f"  % 100 < {SAMPLE_PCT}"
)


# ---------------------------------------------------------------------------
# Date/time function family
# ---------------------------------------------------------------------------


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar function surface: trunc-to-month, year/month extraction,
    interval arithmetic, and day-difference aggregation per month.  The
    month truncation is the partition key a 100 TB time-partitioned
    table would prune on; everything groups in one hash aggregate."""
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
            F.datediff(
                F.lit("1998-12-31").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("bigint")
            .alias("days_to_eoy"),
        )
        .groupBy("month_start", "o_year", "o_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("days_to_eoy").alias("sum_days_to_eoy"),
        )
    )
    return monthly.select(
        "month_start",
        (F.col("month_start") + F.expr("INTERVAL 1 MONTH")).alias(
            "next_month"
        ),
        "o_year",
        "o_month",
        "n_orders",
        "sum_days_to_eoy",
    )


DATE_FUNCTIONS_SQL = (
    "WITH m AS (SELECT"
    " date_trunc('month', o_orderdate) AS month_start,"
    " CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,"
    " CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,"
    " CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')"
    "  AS BIGINT) AS days_to_eoy"
    " FROM orders)"
    " SELECT month_start, month_start + INTERVAL 1 MONTH AS next_month,"
    " o_year, o_month, COUNT(*) AS n_orders,"
    " CAST(SUM(days_to_eoy) AS BIGINT) AS sum_days_to_eoy"
    " FROM m GROUP BY month_start, o_year, o_month"
)


# ---------------------------------------------------------------------------
# Array / higher-order function family
# ---------------------------------------------------------------------------


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed column surface over tokenized documents: size,
    lambda filter, distinct, fold (aggregate), slice + join.  Every
    lambda runs JVM-side inside whole-stage codegen (Spark higher-order
    functions), so this is row-parallel with zero shuffle — the 100 TB
    path for array columns, vs. explode+groupBy which would shuffle
    every token."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    return toks.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.expr("cast(size(filter(toks, t -> length(t) > 4)) as bigint)").alias(
            "n_long_tokens"
        ),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.expr(
            "aggregate(toks, cast(0 as bigint), (acc, t) -> acc + length(t))"
        ).alias("total_tok_chars"),
        F.array_join(F.slice("toks", 1, 3), "_").alias("head3"),
    )


ARRAY_FUNCTIONS_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks"
    " FROM documents)"
    " SELECT doc_id,"
    " CAST(len(toks) AS BIGINT) AS n_tokens,"
    " CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT)"
    "  AS n_long_tokens,"
    " CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,"
    " list_reduce(list_prepend(CAST(0 AS BIGINT),"
    "  list_transform(toks, t -> CAST(length(t) AS BIGINT))),"
    "  (acc, c) -> acc + c) AS total_tok_chars,"
    " array_to_string(toks[1:3], '_') AS head3"
    " FROM t"
)


# ---------------------------------------------------------------------------
# JSON function family
# ---------------------------------------------------------------------------


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction and construction over the semi-structured
    ``props`` column: path extraction with typed cast, existence
    check, and a construct→re-extract round trip (build a JSON object
    from columns, then pull the fields back out).

    All JSON work is JVM-side codegen (Jackson under Spark's
    ``get_json_object``/``to_json``), row-parallel, zero shuffle —
    semi-structured columns at 100 TB are only viable when parsing
    stays off the Python path.  The round-trip is compared field-wise
    (never on the serialized text, whose whitespace is dialect-
    specific).
    """
    ev = table(spark, sf_dir, "events")
    constructed = F.to_json(F.struct("event_id", "event_type"))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").isNull().alias("no_missing"),
        F.get_json_object(constructed, "$.event_id")
        .cast("bigint")
        .alias("rt_id"),
        F.get_json_object(constructed, "$.event_type").alias("rt_type"),
    )


JSON_FUNCTIONS_SQL = (
    "WITH j AS (SELECT event_id, event_type, props,"
    " to_json(struct_pack(event_id := event_id,"
    "  event_type := event_type)) AS constructed"
    " FROM events)"
    " SELECT event_id,"
    " CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,"
    " json_extract_string(props, '$.k') IS NOT NULL AS has_k,"
    " json_extract_string(props, '$.missing') IS NULL AS no_missing,"
    " CAST(json_extract_string(constructed, '$.event_id') AS BIGINT)"
    "  AS rt_id,"
    " json_extract_string(constructed, '$.event_type') AS rt_type"
    " FROM j"
)


# ---------------------------------------------------------------------------
# Regex function family
# ---------------------------------------------------------------------------

# dialect-portable pattern subset (Java regex ≡ RE2/DuckDB for these)
_WORD_PAT = "([a-z]+)"
_VOWEL_PAT = "[aeiou]"
_DIGIT_PAT = "[0-9]"


def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface over part names: group extraction, global
    replacement, boolean match, and match counting.  All row-parallel
    codegen (Spark compiles Java regex into the generated code) — zero
    shuffle; the pattern subset is chosen to behave identically in
    Java regex and DuckDB's RE2."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", _WORD_PAT, 1).alias("first_word"),
        F.regexp_replace("p_name", _VOWEL_PAT, "").alias("no_vowels"),
        F.col("p_name").rlike(_DIGIT_PAT).alias("has_digit"),
        F.size(F.expr(f"regexp_extract_all(p_name, '{_WORD_PAT}', 1)"))
        .cast("bigint")
        .alias("n_words"),
    )


REGEX_FUNCTIONS_SQL = (
    "SELECT p_partkey,"
    f" regexp_extract(p_name, '{_WORD_PAT}', 1) AS first_word,"
    f" regexp_replace(p_name, '{_VOWEL_PAT}', '', 'g') AS no_vowels,"
    f" regexp_matches(p_name, '{_DIGIT_PAT}') AS has_digit,"
    f" CAST(len(regexp_extract_all(p_name, '{_WORD_PAT}', 1)) AS BIGINT)"
    "  AS n_words"
    " FROM part"
)


# ---------------------------------------------------------------------------
# Map function family
# ---------------------------------------------------------------------------


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: construct a map from columns, extract
    by key, enumerate keys/values, cardinality.  Row-parallel codegen,
    zero shuffle; outputs are flattened to scalar/string columns so the
    cross-engine comparison never hashes an engine-specific map
    rendering (Spark and DuckDB disagree on map literal syntax, not on
    map semantics)."""
    p = table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
        F.array_join(F.map_values(m), ",").alias("values_joined"),
        F.size(m).cast("bigint").alias("n_entries"),
    )


MAP_FUNCTIONS_SQL = (
    "WITH m AS (SELECT p_partkey,"
    " MAP(['brand','type'], [p_brand, p_type]) AS mp FROM part)"
    " SELECT p_partkey,"
    " mp['brand'][1] AS brand_val,"
    " mp['type'][1] AS type_val,"
    " array_to_string(map_keys(mp), ',') AS keys_joined,"
    " array_to_string(map_values(mp), ',') AS values_joined,"
    " CAST(cardinality(mp) AS BIGINT) AS n_entries"
    " FROM m"
)


# ---------------------------------------------------------------------------
# Math function family
# ---------------------------------------------------------------------------


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math surface: abs/sign/mod (exact), sqrt (IEEE-exact),
    and exp/ln/pow (libm-dependent — rounded to 6 digits, since the
    last bit is not guaranteed identical across math libraries).  All
    codegen expressions, zero shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("abs_dev"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_quantity"), F.lit(1.5)), 6).alias("qty_pow"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_tax" ).cast("bigint").alias("tax_floor"),
    )


MATH_FUNCTIONS_SQL = (
    "SELECT l_orderkey, l_linenumber,"
    " ABS(l_quantity - 25.0) AS abs_dev,"
    " CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,"
    " l_orderkey % 7 AS key_mod7,"
    " ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,"
    " ROUND(EXP(l_discount), 6) AS exp_disc,"
    " ROUND(LN(l_extendedprice), 6) AS ln_price,"
    " ROUND(POW(l_quantity, 1.5), 6) AS qty_pow,"
    " CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,"
    " CAST(FLOOR(l_tax) AS BIGINT) AS tax_floor"
    " FROM lineitem"
)


# ---------------------------------------------------------------------------
# Ranking function suite
# ---------------------------------------------------------------------------


def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window functions: percent_rank, cume_dist, ntile,
    dense_rank over a fully tie-broken ordering.  The total order
    (price, then key) makes every rank — and therefore the
    (rank-1)/(n-1) style ratios — a deterministic integer computation,
    identical across engines.  One shuffle on the partition key; the
    frame never re-shuffles (same argument as lead_lag_delta)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
    )


WINDOW_RANKING_SQL = (
    "SELECT o_orderkey, o_orderstatus, o_totalprice,"
    " percent_rank() OVER w AS pr,"
    " cume_dist() OVER w AS cd,"
    " ntile(4) OVER w AS quartile,"
    " CAST(dense_rank() OVER w AS BIGINT) AS drank"
    " FROM orders"
    " WINDOW w AS (PARTITION BY o_orderstatus"
    "  ORDER BY o_totalprice, o_orderkey)"
)


# ---------------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------------

# per-stratum keep-percentages; unlisted strata fall back to DEFAULT.
# In a real curation run these are the per-source mixing weights.
STRATA_PCT = {"src0": 80, "src1": 50, "src2": 25}
STRATA_DEFAULT_PCT = 10


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: each source keeps a
    different fraction, selected by key hash — the corpus-mixing
    primitive of a training-data pipeline (upsample rare sources,
    downsample dominant ones).

    Same scale argument as `sampling_hash`: a pure filter over the
    scan (zero shuffle, zero state), reproducible under any
    partitioning; `df.sampleBy` is seed-per-partition and is not.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        " as bigint) % 100"
    )
    rate = F.lit(STRATA_DEFAULT_PCT)
    for src, pct in sorted(STRATA_PCT.items()):
        rate = F.when(F.col("source") == src, F.lit(pct)).otherwise(rate)
    return (
        docs.select(
            "doc_id", "source", bucket.alias("sample_bucket"),
            rate.alias("keep_pct"),
        )
        .filter(F.col("sample_bucket") < F.col("keep_pct"))
    )


def stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{src}' THEN {pct}"
        for src, pct in sorted(STRATA_PCT.items())
    )
    rate = f"(CASE {cases} ELSE {STRATA_DEFAULT_PCT} END)"
    bucket = (
        "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)"
        " % 100"
    )
    return (
        f"SELECT doc_id, source, {bucket} AS sample_bucket,"
        f" {rate} AS keep_pct"
        " FROM documents"
        f" WHERE {bucket} < {rate}"
    )


# ---------------------------------------------------------------------------
# Histogram binning
# ---------------------------------------------------------------------------

HIST_LO, HIST_HI, HIST_BINS = 0.0, 500_000.0, 10


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: explicit floor-arithmetic
    binning (portable across engines, unlike engine-specific
    width_bucket variants), one partial/final count aggregate.  The
    histogram shuffle carries #bins rows per partition — the cheapest
    possible distribution profile at any corpus size."""
    o = table(spark, sf_dir, "orders")
    step = (HIST_HI - HIST_LO) / HIST_BINS
    bin_ = F.least(
        F.lit(HIST_BINS - 1),
        F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(step)),
    ).cast("bigint")
    return (
        o.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            (F.lit(HIST_LO) + F.col("bin") * F.lit(step)).alias("bin_lo"),
            (F.lit(HIST_LO) + (F.col("bin") + 1) * F.lit(step)).alias(
                "bin_hi"
            ),
            "cnt",
        )
    )


PRICE_HISTOGRAM_SQL = (
    "WITH b AS (SELECT CAST(least({bins} - 1,"
    " floor((o_totalprice - {lo}) / {step})) AS BIGINT) AS bin"
    " FROM orders)"
    " SELECT bin, {lo} + bin * {step} AS bin_lo,"
    " {lo} + (bin + 1) * {step} AS bin_hi, COUNT(*) AS cnt"
    " FROM b GROUP BY bin"
).format(bins=HIST_BINS, lo=HIST_LO, step=(HIST_HI - HIST_LO) / HIST_BINS)


# ---------------------------------------------------------------------------
# Null semantics
# ---------------------------------------------------------------------------


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface in one row: COUNT(col) vs COUNT(*)
    null-skipping, DISTINCT-excludes-null, COALESCE defaults, and
    null-safe equality (Spark ``<=>`` ≡ SQL IS NOT DISTINCT FROM) —
    the semantics corner where engines classically disagree.  The
    fixture has no NULLs, so the query synthesizes them
    deterministically with NULLIF; everything folds into one aggregate
    row (all map-side, no data-proportional shuffle)."""
    o = table(spark, sf_dir, "orders")
    vw = o.select(
        F.expr("nullif(o_orderkey % 7, 0)").alias("v"),
        F.expr("nullif(o_custkey % 7, 0)").alias("w"),
    )
    return vw.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
        F.countDistinct("v").alias("n_distinct"),
        F.sum(F.coalesce("v", F.lit(-1))).cast("bigint").alias(
            "sum_coalesced"
        ),
        F.sum(
            F.when(F.expr("v <=> w"), 1).otherwise(0)
        ).cast("bigint").alias("n_nullsafe_eq"),
    )


NULL_SEMANTICS_SQL = (
    "WITH vw AS (SELECT NULLIF(o_orderkey % 7, 0) AS v,"
    " NULLIF(o_custkey % 7, 0) AS w FROM orders)"
    " SELECT COUNT(*) AS n_rows, COUNT(v) AS n_nonnull,"
    " COUNT(*) - COUNT(v) AS n_null,"
    " COUNT(DISTINCT v) AS n_distinct,"
    " CAST(SUM(COALESCE(v, -1)) AS BIGINT) AS sum_coalesced,"
    " CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM w THEN 1 ELSE 0 END)"
    "  AS BIGINT) AS n_nullsafe_eq"
    " FROM vw"
)


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS + RANGE window frames
# ---------------------------------------------------------------------------

GROUPING_SETS_SQL = (
    "SELECT l_returnflag, l_linestatus,"
    " CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,"
    " CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,"
    " COUNT(*) AS cnt,"
    " CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty"
    " FROM lineitem"
    " GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),"
    " (l_returnflag, l_linestatus))"
)


def grouping_sets_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() level indicators — the
    general form behind ROLLUP/CUBE, choosing exactly which level
    combinations to compute.  Like CUBE, one scan feeds an Expand into
    a single partial/final aggregate — three groupings cost one pass,
    not three.  Same dialect text runs on both engines (the
    portability check)."""
    from smile_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


def range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: for each order, the count and
    exact sum of the same customer's orders priced within 1000 below
    it.  RANGE frames bound by VALUE distance, not row position — so
    unlike ROWS frames they are insensitive to ordering ties and
    deterministic by construction.  One shuffle on the partition key,
    per-key sort, then a sliding frame scan."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast("double")
        .alias("sum_near"),
    )


RANGE_FRAME_SUM_SQL = (
    "SELECT o_custkey, o_orderkey, o_totalprice,"
    " COUNT(*) OVER w AS n_near,"
    " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)"
    "  AS sum_near"
    " FROM orders WINDOW w AS (PARTITION BY o_custkey"
    " ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)"
)


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions: each customer's first / last / 2nd
    order price over their full order history.  last_value and
    nth_value need the UNBOUNDED-both-ways frame (the default frame
    stops at CURRENT ROW — the classic silent-wrong-answer); ordering
    is fully tie-broken (date, then key) so navigation is
    deterministic.  One shuffle on the partition key."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


WINDOW_FIRST_LAST_SQL = (
    "SELECT o_custkey, o_orderkey,"
    " first_value(o_totalprice) OVER w AS first_price,"
    " last_value(o_totalprice) OVER w AS last_price,"
    " nth_value(o_totalprice, 2) OVER w AS second_price"
    " FROM orders WINDOW w AS (PARTITION BY o_custkey"
    " ORDER BY o_orderdate, o_orderkey"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
)


def conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family: count_if, bool_and,
    bool_or per order status — the predicate-summary surface (data
    quality assertions compile to exactly these).  Boolean state is a
    single byte per group; everything combines map-side."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("cast(count_if(o_totalprice > 200000) as bigint)").alias(
            "n_large"
        ),
        F.expr("bool_and(o_totalprice > 1000)").alias("all_over_1k"),
        F.expr("bool_or(o_totalprice > 450000)").alias("any_over_450k"),
        F.expr("cast(count_if(o_orderpriority = '1-URGENT') as bigint)")
        .alias("n_urgent"),
    )


CONDITIONAL_AGGS_SQL = (
    "SELECT o_orderstatus,"
    " CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_large,"
    " bool_and(o_totalprice > 1000) AS all_over_1k,"
    " bool_or(o_totalprice > 450000) AS any_over_450k,"
    " CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent"
    " FROM orders GROUP BY o_orderstatus"
)


def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family over event ids: and/or/xor, shifts,
    and population count — row-parallel codegen, zero shuffle (the
    surface behind bitmap/bloom-style encodings)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ 21845").alias("xored"),
        F.expr("shiftleft(event_id, 2)").alias("shl2"),
        F.expr("shiftright(event_id, 3)").alias("shr3"),
        F.expr("cast(bit_count(event_id) as bigint)").alias("popcount"),
    )


BITWISE_FUNCTIONS_SQL = (
    "SELECT event_id,"
    " event_id & 255 AS low_byte,"
    " event_id | 4096 AS with_flag,"
    " xor(event_id, 21845) AS xored,"
    " event_id << 2 AS shl2,"
    " event_id >> 3 AS shr3,"
    " CAST(bit_count(event_id) AS BIGINT) AS popcount"
    " FROM events"
)


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-part extraction beyond year/month (date_functions):
    quarter, day-of-year, ISO week, and epoch seconds, aggregated per
    quarter.  Parts are restricted to the dialect-portable subset —
    day-of-week is deliberately absent (Spark numbers Sunday=1,
    DuckDB Sunday=0; a portable engine surfaces the parts that mean
    the same thing everywhere).  Epoch seconds are the join key for
    cross-system time alignment."""
    o = table(spark, sf_dir, "orders")
    parts = o.select(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
        F.dayofyear("o_orderdate").cast("bigint").alias("o_doy"),
        F.weekofyear("o_orderdate").cast("bigint").alias("o_week"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )
    return parts.groupBy("o_year", "o_quarter").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_doy").alias("min_doy"),
        F.max("o_doy").alias("max_doy"),
        F.min("o_week").alias("min_week"),
        F.max("o_week").alias("max_week"),
        F.min("epoch_s").alias("min_epoch"),
    )


DATE_PARTS_SQL = (
    "WITH p AS (SELECT"
    " CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,"
    " CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS o_quarter,"
    " CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS o_doy,"
    " CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS o_week,"
    " CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS epoch_s"
    " FROM orders)"
    " SELECT o_year, o_quarter, COUNT(*) AS n_orders,"
    " MIN(o_doy) AS min_doy, MAX(o_doy) AS max_doy,"
    " MIN(o_week) AS min_week, MAX(o_week) AS max_week,"
    " MIN(epoch_s) AS min_epoch"
    " FROM p GROUP BY o_year, o_quarter"
)


# ---------------------------------------------------------------------------
# UNPIVOT (wide → long) — the inverse of pivot_wide
# ---------------------------------------------------------------------------


def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot the four lineitem measures into (measure, val) long
    form — ``stack`` is a generator expression evaluated row-parallel
    inside the scan projection: the 4× row expansion happens with no
    shuffle and no self-union (the UNION ALL formulation would scan
    the table four times; this scans once)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4,"
            " 'quantity', l_quantity,"
            " 'extendedprice', l_extendedprice,"
            " 'discount', l_discount,"
            " 'tax', l_tax) AS (measure, val)"
        ),
    )


UNPIVOT_LONG_SQL = (
    "SELECT l_orderkey, l_linenumber, um.measure, um.val"
    " FROM lineitem"
    " CROSS JOIN LATERAL (VALUES"
    "  ('quantity', l_quantity), ('extendedprice', l_extendedprice),"
    "  ('discount', l_discount), ('tax', l_tax)) AS um(measure, val)"
)


# ---------------------------------------------------------------------------
# Z-order clustering key (multi-dimensional data layout)
# ---------------------------------------------------------------------------

ZORDER_BITS = 16


def _interleave(a, b, bits: int):
    """Morton/Z-order interleave of the low ``bits`` of two int
    columns: bit i of ``a`` lands at position 2i, of ``b`` at 2i+1.
    Unrolls to a flat sum of shift/mask terms — one codegen
    expression, no loop at runtime."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) —
    the multi-dimensional layout key behind data-skipping file layouts:
    sorting/range-partitioning by ``zval`` co-locates rows that are
    close in BOTH dimensions, so min/max file statistics prune scans
    filtered on either key.  The key itself is a pure row-parallel
    bit-interleave (no shuffle); the layout write is
    ``repartitionByRange("zval").sortWithinPartitions("zval")`` at
    sink time."""
    li = table(spark, sf_dir, "lineitem")
    p = F.col("l_partkey").bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    s = F.col("l_suppkey").bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        _interleave(p, s, ZORDER_BITS).cast("bigint").alias("zval"),
    )


def zorder_cluster_sql(bits: int = ZORDER_BITS) -> str:
    mask = (1 << bits) - 1
    terms = []
    # each term fully parenthesized: SQL gives `+` higher precedence
    # than `<<`, so a bare chain of  a << i + b << j  reassociates
    for i in range(bits):
        terms.append(f"((((l_partkey & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(
            f"((((l_suppkey & {mask}) >> {i}) & 1) << {2 * i + 1})"
        )
    return (
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,"
        f" CAST({' + '.join(terms)} AS BIGINT) AS zval"
        " FROM lineitem"
    )


# ---------------------------------------------------------------------------
# Ratio-to-report (share-of-total windows)
# ---------------------------------------------------------------------------


def revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's revenue — the
    ratio-to-report window: a partitioned unbounded SUM as the
    denominator, no second scan and no join back.

    The share divides two exact DECIMAL aggregates, so the double is
    bit-deterministic; the window's partition key is the 5-row region
    — at 100 TB the heavy lifting is the partial/final nation-level
    aggregate underneath, and the window runs over ~#nations rows."""
    from smile_spark.functions.numeric import dsum

    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_nation = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o.o_custkey == c.c_custkey,
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        "revenue",
        F.round(
            F.col("revenue") / F.sum("revenue").over(w) * 100, 6
        ).alias("share_pct"),
    )


REVENUE_SHARE_SQL = (
    "WITH per_nation AS (SELECT r.r_name, n.n_name,"
    " CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
    "  AS revenue"
    " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    "  JOIN nation n ON c.c_nationkey = n.n_nationkey"
    "  JOIN region r ON n.n_regionkey = r.r_regionkey"
    " GROUP BY 1, 2)"
    " SELECT r_name, n_name, revenue,"
    " ROUND(revenue / SUM(revenue) OVER (PARTITION BY r_name) * 100, 6)"
    "  AS share_pct"
    " FROM per_nation"
)


# ---------------------------------------------------------------------------
# Outlier handling / feature standardization (data-prep verbs)
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group price summary: clip l_extendedprice at the
    exact p05/p95 (boundaries rounded to cents so the clipped values
    stay 2-decimal and the winsorized mean accumulates exactly in
    DECIMAL on both engines), and report how many rows each tail
    clipped.

    Plan: one exact-percentile aggregate (tiny result) broadcast back
    onto the scan, then one partial/final aggregate — the standard
    two-pass statistical-clipping shape; at 100 TB pass one switches
    to approx_percentile when ±ε is acceptable."""
    li = table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.round(
            F.expr(f"percentile(l_extendedprice, {WINSOR_LO}D)"), 2
        ).alias("lo"),
        F.round(
            F.expr(f"percentile(l_extendedprice, {WINSOR_HI}D)"), 2
        ).alias("hi"),
    )
    return _clip_and_summarize(li, bounds)


def _clip_and_summarize(li: DataFrame, bounds: DataFrame) -> DataFrame:
    """Clip l_extendedprice at broadcast per-group (lo, hi) bounds and
    aggregate the winsorized summary — shared by the exact and approx
    bound passes."""
    clipped = li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        "lo",
        "hi",
        F.least(F.greatest("l_extendedprice", F.col("lo")), F.col("hi")).alias(
            "w"
        ),
        (F.col("l_extendedprice") < F.col("lo")).cast("int").alias("cl"),
        (F.col("l_extendedprice") > F.col("hi")).cast("int").alias("ch"),
    )
    return clipped.groupBy("l_returnflag", "lo", "hi").agg(
        F.sum("cl").cast("bigint").alias("n_clipped_low"),
        F.sum("ch").cast("bigint").alias("n_clipped_high"),
        davg("w", "winsorized_avg"),
    )


# approx_percentile accuracy parameter: guarantees rank error
# ≤ 1/WINSOR_ACCURACY of the group size with sketch memory O(accuracy)
# — constant per group regardless of corpus size.
WINSOR_ACCURACY = 10_000

# Rank-fraction tolerance for the certificate query: the sketch
# guarantees 1/WINSOR_ACCURACY; 5x slack absorbs boundary ties.
WINSOR_RANK_EPS = 5.0 / WINSOR_ACCURACY


def _approx_price_bounds(li: DataFrame) -> DataFrame:
    """Per-group (lo, hi) winsorization bounds from a single-pass
    ``approx_percentile`` sketch — bounded memory per group, the
    100 TB-safe alternative to exact ``percentile`` (which buffers
    every group value in the aggregation buffer)."""
    pair = F.expr(
        "approx_percentile(l_extendedprice,"
        f" array({WINSOR_LO}D, {WINSOR_HI}D), {WINSOR_ACCURACY})"
    )
    return li.groupBy("l_returnflag").agg(pair.alias("p")).select(
        "l_returnflag",
        F.round(F.element_at("p", 1), 2).alias("lo"),
        F.round(F.element_at("p", 2), 2).alias("hi"),
    )


def winsorize_prices_approx_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB production form of :func:`winsorize_prices`: clip at
    sketch-derived bounds (same output schema as the exact sibling).
    Not driver-registered — the sketch's boundaries are
    engine-specific so no cross-engine oracle exists for the raw
    values; tests/test_approx.py pins it against the exact form, and
    :func:`winsorize_prices_approx` is the registered deterministic
    certificate of the same sketch."""
    li = table(spark, sf_dir, "lineitem")
    return _clip_and_summarize(li, _approx_price_bounds(li))


def winsorize_prices_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tolerance certificate for the approx-winsorize
    sketch (the driver-registered face of the approx path).

    The sketch's raw bucket boundaries are engine-specific, so instead
    of emitting them this query emits what IS portable: the exact
    per-group (lo, hi) envelope plus booleans certifying the sketch
    bounds land within ``WINSOR_RANK_EPS`` rank error of the target
    quantiles.  The oracle recomputes the envelope in DuckDB and
    asserts the booleans TRUE — if Spark's sketch ever drifts out of
    tolerance the booleans flip and the driver's value-hash check
    fails, which makes the approx path driver-verifiable without
    faking determinism.  Plan: one combined exact+approx aggregate
    (tiny result) broadcast back onto the scan for the rank count —
    two passes, both map-side-combined.  At production scale you run
    :func:`winsorize_prices_approx_summary` (sketch only, one pass)."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    pair = F.expr(
        "approx_percentile(l_extendedprice,"
        f" array({WINSOR_LO}D, {WINSOR_HI}D), {WINSOR_ACCURACY})"
    )
    b = li.groupBy("l_returnflag").agg(
        pair.alias("p"),
        F.round(
            F.expr(f"percentile(l_extendedprice, {WINSOR_LO}D)"), 2
        ).alias("lo"),
        F.round(
            F.expr(f"percentile(l_extendedprice, {WINSOR_HI}D)"), 2
        ).alias("hi"),
    ).select(
        "l_returnflag",
        "lo",
        "hi",
        F.round(F.element_at("p", 1), 2).alias("alo"),
        F.round(F.element_at("p", 2), 2).alias("ahi"),
    )
    ranks = li.join(F.broadcast(b), "l_returnflag").groupBy(
        "l_returnflag", "lo", "hi"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((x < F.col("alo")).cast("bigint")).alias("lt_alo"),
        F.sum((x <= F.col("alo")).cast("bigint")).alias("le_alo"),
        F.sum((x < F.col("ahi")).cast("bigint")).alias("lt_ahi"),
        F.sum((x <= F.col("ahi")).cast("bigint")).alias("le_ahi"),
    )
    eps = F.lit(WINSOR_RANK_EPS)
    n = F.col("n").cast("double")
    return ranks.select(
        "l_returnflag",
        "lo",
        "hi",
        F.col("n").cast("bigint").alias("n"),
        (
            (F.col("lt_alo") / n <= F.lit(WINSOR_LO) + eps)
            & (F.col("le_alo") / n >= F.lit(WINSOR_LO) - eps)
        ).alias("lo_in_tolerance"),
        (
            (F.col("lt_ahi") / n <= F.lit(WINSOR_HI) + eps)
            & (F.col("le_ahi") / n >= F.lit(WINSOR_HI) - eps)
        ).alias("hi_in_tolerance"),
    )


WINSORIZE_PRICES_APPROX_SQL = (
    "SELECT l_returnflag,"
    f" ROUND(quantile_cont(l_extendedprice, {WINSOR_LO}), 2) AS lo,"
    f" ROUND(quantile_cont(l_extendedprice, {WINSOR_HI}), 2) AS hi,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " TRUE AS lo_in_tolerance,"
    " TRUE AS hi_in_tolerance"
    " FROM lineitem GROUP BY l_returnflag"
)


WINSORIZE_PRICES_SQL = (
    "WITH bounds AS (SELECT l_returnflag,"
    f" ROUND(quantile_cont(l_extendedprice, {WINSOR_LO}), 2) AS lo,"
    f" ROUND(quantile_cont(l_extendedprice, {WINSOR_HI}), 2) AS hi"
    " FROM lineitem GROUP BY l_returnflag),"
    " clipped AS (SELECT li.l_returnflag, b.lo, b.hi,"
    "  LEAST(GREATEST(li.l_extendedprice, b.lo), b.hi) AS w,"
    "  CASE WHEN li.l_extendedprice < b.lo THEN 1 ELSE 0 END AS cl,"
    "  CASE WHEN li.l_extendedprice > b.hi THEN 1 ELSE 0 END AS ch"
    "  FROM lineitem li JOIN bounds b ON b.l_returnflag = li.l_returnflag)"
    " SELECT l_returnflag, lo, hi,"
    " CAST(SUM(cl) AS BIGINT) AS n_clipped_low,"
    " CAST(SUM(ch) AS BIGINT) AS n_clipped_high,"
    " CAST(SUM(CAST(w AS DECIMAL(18,2))) AS DOUBLE) / COUNT(w)"
    "  AS winsorized_avg"
    " FROM clipped GROUP BY 1, 2, 3"
)


EQUI_DEPTH_NBINS = 10
_EQUI_DEPTH_QS = [i / EQUI_DEPTH_NBINS for i in range(1, EQUI_DEPTH_NBINS)]


def equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-DEPTH (quantile) binning of l_extendedprice — the
    histogram a profiler wants when the distribution is skewed and
    equal-width bins (price_histogram) put everything in two buckets.

    Bin bounds are the exact deciles rounded to cents (prices are
    2-decimal, so the rounded bound compares identically on both
    engines — the winsorize discipline); each row's bin is the count
    of bounds strictly below it, computed by a higher-order filter
    over the broadcast single-row bounds array — NO per-row join, no
    sort.  Plan: one tiny percentile aggregate broadcast onto the
    scan, then one partial/final aggregate keyed by the ≤NBINS bin
    ids.  At 100 TB the bounds pass switches to approx_percentile
    (the winsorize_prices_approx certificate pattern applies
    unchanged)."""
    li = table(spark, sf_dir, "lineitem")
    qlist = ", ".join(f"{q}D" for q in _EQUI_DEPTH_QS)
    bounds = li.agg(
        F.expr(
            f"transform(percentile(l_extendedprice, array({qlist})),"
            " b -> round(b, 2))"
        ).alias("qs")
    )
    binned = li.crossJoin(F.broadcast(bounds)).select(
        (
            F.expr("size(filter(qs, b -> l_extendedprice > b))") + 1
        ).cast("bigint").alias("bin"),
        "l_extendedprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        dsum("l_extendedprice", "sum_price"),
    )


EQUI_DEPTH_BINS_SQL = (
    "WITH bounds AS (SELECT list_transform("
    "  quantile_cont(l_extendedprice,"
    f"  [{', '.join(str(q) for q in _EQUI_DEPTH_QS)}]),"
    "  b -> ROUND(b, 2)) AS qs FROM lineitem),"
    " binned AS (SELECT"
    "  CAST(len(list_filter(qs, b -> l_extendedprice > b)) + 1 AS BIGINT)"
    "   AS bin,"
    "  l_extendedprice"
    "  FROM lineitem CROSS JOIN bounds)"
    " SELECT bin, COUNT(*) AS n,"
    "  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,"
    "  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    "   AS sum_price"
    " FROM binned GROUP BY bin"
)


def zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization of l_quantity — the feature-
    scaling verb of a training pipeline.  Group moments accumulate
    exactly in DECIMAL (the corr_stats discipline), the closed-form
    mean/std evaluate once in double with the IDENTICAL expression on
    both engines, and the per-row z rounds to 6 digits.  Plan: tiny
    moment aggregate broadcast onto the scan — one shuffle of group
    moments, never of rows."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum((x * x).cast(_DEC_PROD)).cast("double").alias("sxx"),
    )
    return li.join(F.broadcast(m), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(
            (F.col("l_quantity") - F.col("sx") / F.col("n"))
            / F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
            ),
            6,
        ).alias("z"),
    )


ZSCORE_NORMALIZE_SQL = (
    "WITH m AS (SELECT l_returnflag,"
    " CAST(COUNT(*) AS DOUBLE) AS n,"
    " CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,"
    " CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))"
    "  * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4)))"
    "  AS DOUBLE) AS sxx"
    " FROM lineitem GROUP BY l_returnflag)"
    " SELECT li.l_orderkey, li.l_linenumber, li.l_returnflag,"
    " ROUND((li.l_quantity - m.sx / m.n)"
    "  / SQRT((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)), 6) AS z"
    " FROM lineitem li JOIN m ON m.l_returnflag = li.l_returnflag"
)


def revenue_growth_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly exact-decimal totals,
    lag(1) over month order, percent change as a quotient of exact
    aggregates rounded to 6.  The partition-less lag window is safe
    HERE because its input is the monthly aggregate (#months rows) —
    the same tiny-aggregate exception as graph_load's bucket table."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(dsum("o_totalprice", "revenue"))
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(
            (F.col("revenue") - F.lag("revenue").over(w))
            / F.lag("revenue").over(w)
            * 100,
            6,
        ).alias("growth_pct"),
    )


REVENUE_GROWTH_MOM_SQL = (
    "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,"
    " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue"
    " FROM orders GROUP BY 1)"
    " SELECT month, revenue,"
    " ROUND((revenue - LAG(revenue) OVER (ORDER BY month))"
    "  / LAG(revenue) OVER (ORDER BY month) * 100, 6) AS growth_pct"
    " FROM m"
)


BALANCED_K = 20


def balanced_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsampling: EXACTLY min(k, n) documents per language,
    chosen by a deterministic content-hash order — the training-mix
    verb when strata must contribute equal counts (rate-based
    stratified_sample guarantees proportions, not counts).

    Per-stratum top-k via row_number over the hash order: one shuffle
    on the stratum key; selection is partitioning- and scale-
    independent because the hash order is a pure function of the
    rows."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BALANCED_K)
        .select(
            "lang",
            "doc_id",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


BALANCED_SAMPLE_K_SQL = (
    "SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM ("
    " SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang"
    "  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn"
    " FROM documents)"
    f" WHERE rn <= {BALANCED_K}"
)


WEIGHTED_SAMPLE_K = 5


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res): per source, the K documents drawn with probability
    proportional to length — the corpus-mixing verb when quality or
    length should bias selection, where hash sampling
    (``sampling_hash``) is uniform and ``balanced_sample_k`` is
    count-exact but unweighted.

    Each row computes key = u^(1/w) from a content-hash uniform
    u ∈ (0,1) and weight w; the global top-K by key IS a weighted
    draw (the E-S theorem), so "sample 5 docs ∝ length" becomes a
    per-stratum top-k — one shuffle of (doc_id, key) pairs on the
    stratum, no rejection loop, no driver RNG, reproducible at any
    partitioning.  Keys round to 6 digits (ties → doc_id) for
    cross-engine rank stability, the ann_cosine_topk discipline.
    """
    docs = table(spark, sf_dir, "documents")
    h32 = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        " as bigint)"
    )
    u = (h32.cast("double") + 0.5) / F.lit(float(2**32))
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 6
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("sample_key"), F.asc("doc_id")
    )
    return (
        docs.withColumn("sample_key", key)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WEIGHTED_SAMPLE_K)
        .select(
            "source",
            "doc_id",
            "n_chars",
            "sample_key",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


WEIGHTED_SAMPLE_TOPK_SQL = (
    "SELECT source, doc_id, n_chars, sample_key, CAST(rn AS BIGINT) AS rn"
    " FROM ("
    " SELECT source, doc_id, n_chars, sample_key,"
    "  ROW_NUMBER() OVER (PARTITION BY source"
    "   ORDER BY sample_key DESC, doc_id ASC) AS rn FROM ("
    "  SELECT source, doc_id, n_chars,"
    "   ROUND(power("
    "    ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    f"     ::DOUBLE + 0.5) / {float(2**32)!r}),"
    "    1.0 / CAST(n_chars AS DOUBLE)), 6) AS sample_key"
    "  FROM documents))"
    f" WHERE rn <= {WEIGHTED_SAMPLE_K}"
)


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier)
# ---------------------------------------------------------------------------

SKYLINE_BUCKETS = 64


def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts by (avg_price minimize, total_qty
    maximize) — the skyline operator (Borzsony/Kossmann/Stocker,
    ICDE'01): a part survives iff no other part is at-least-as-good in
    both dimensions and strictly better in one.

    Naive skyline is an O(N²) dominance self-join.  The 2-D case
    admits an O(N log N) sort-based form, and — because the union of
    per-partition skylines always contains the global skyline — it
    distributes as a lossless two-level prune:

    1. LOCAL: hash parts into SKYLINE_BUCKETS salt buckets; inside
       each bucket collapse to per-price groups (gmax = best qty at
       that price), then one rows-frame running max over strictly
       lower prices (prevmax).  A part is bucket-locally dominated
       iff prevmax ≥ qty (strictly cheaper, no worse) or
       gmax > qty (same price, strictly better).  64-way parallel
       windows, each over N/64 rows.
    2. GLOBAL: re-run the identical logic on the survivors (frontier-
       sized, ≤ a few points per bucket in practice) in one tiny
       window.

    At 100 TB the local stage is the only pass that touches the full
    aggregate table, and it is embarrassment-parallel; the global pass
    sees kilobytes.  No dominance join ever materializes.  The
    reference has no such operator (SURVEY.md §2.2 — no sorts); this
    is produced by the same window machinery as window_rank.
    """
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        davg("l_extendedprice", "avg_price"),
        dsum("l_quantity", "total_qty"),
    )
    return skyline_frame(per_part, "l_partkey").select(
        "l_partkey", "avg_price", "total_qty"
    )


def _skyline_pass(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One sort-based 2-D skyline pass over (avg_price min, total_qty
    max) within each partition key combination (global when empty)."""
    grp = part_cols + ["avg_price"]
    pg = df.groupBy(*grp).agg(F.max("total_qty").alias("gmax"))
    w = (
        Window.partitionBy(*part_cols)
        if part_cols
        else Window.partitionBy(F.lit(1))
    ).orderBy("avg_price").rowsBetween(Window.unboundedPreceding, -1)
    pg = pg.withColumn("prevmax", F.max("gmax").over(w))
    out = df.join(pg, grp)
    return out.filter(
        (F.col("prevmax").isNull() | (F.col("prevmax") < F.col("total_qty")))
        & (F.col("gmax") <= F.col("total_qty"))
    ).drop("gmax", "prevmax")


def skyline_frame(df: DataFrame, key_col: str) -> DataFrame:
    """Two-level lossless skyline of any (key, avg_price, total_qty)
    frame — the distributed core of :func:`skyline_pareto`, exposed
    for reuse and property testing."""
    salted = df.withColumn(
        "bkt", F.pmod(F.hash(key_col), F.lit(SKYLINE_BUCKETS))
    )
    local = _skyline_pass(salted, ["bkt"]).drop("bkt")
    return _skyline_pass(local, [])


SKYLINE_PARETO_SQL = (
    "WITH pp AS (SELECT l_partkey,"
    "  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    "   / COUNT(l_extendedprice) AS avg_price,"
    "  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
    "   AS total_qty"
    "  FROM lineitem GROUP BY l_partkey)"
    " SELECT p.l_partkey, p.avg_price, p.total_qty FROM pp p"
    " WHERE NOT EXISTS (SELECT 1 FROM pp q"
    "  WHERE q.avg_price <= p.avg_price AND q.total_qty >= p.total_qty"
    "   AND (q.avg_price < p.avg_price OR q.total_qty > p.total_qty))"
)


# ---------------------------------------------------------------------------
# Revenue concentration (Pareto / Lorenz / Gini)
# ---------------------------------------------------------------------------

CONC_TOPS = (1, 10, 20)  # top-k% customer shares to report


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-ROW revenue-concentration report over per-customer order
    revenue: the top-1/10/20% customer revenue shares (the Pareto
    "80/20" diagnostics) and the Gini coefficient — the
    concentration/imbalance summary every revenue, traffic, or token
    distribution gets profiled with (and, on a corpus, the standard
    source-imbalance screen).

    Determinism: per-customer revenue accumulates in exact DECIMAL
    (dsum); ranks order by (revenue, custkey) so ties are pinned;
    rank-weighted sums stay in DECIMAL; only the final ratios divide
    identical doubles and round to 6.  Gini uses the rank formula
    G = 2·Σ(i·v_i)/(n·Σv) − (n+1)/n over ascending-ordered values.

    Scale: the ordered window runs over the CUSTOMER dimension (one
    row per customer — dimension-sized, not fact-sized).  At a truly
    huge customer count the global sort becomes the graph_load
    two-level bucketed prefix-sum; the fact-table pass stays one
    map-side-combined aggregate either way.
    """
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        dsum("o_totalprice", "rev")
    )
    n_row = rev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rev").cast(DEC)).alias("total"),
    )
    w = Window.orderBy(F.asc("rev"), F.asc("o_custkey"))
    ranked = rev.withColumn("i", F.row_number().over(w)).crossJoin(
        F.broadcast(n_row)
    )
    top_cols = [
        F.round(
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - F.ceil(F.col("n") * p / 100.0),
                    F.col("rev").cast(DEC),
                ).otherwise(F.lit(0).cast(DEC))
            ).cast("double")
            / F.first("total").cast("double"),
            6,
        ).alias(f"top{p}_share")
        for p in CONC_TOPS
    ]
    gini = F.round(
        2.0
        * F.sum(F.col("i") * F.col("rev").cast(DEC)).cast("double")
        / (
            F.first("n").cast("double")
            * F.first("total").cast("double")
        )
        - (F.first("n") + 1).cast("double") / F.first("n").cast("double"),
        6,
    ).alias("gini")
    return ranked.agg(
        F.first("n").alias("n_customers"), *top_cols, gini
    )


REVENUE_CONCENTRATION_SQL = (
    "WITH rev AS (SELECT o_custkey,"
    " SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev"
    " FROM orders GROUP BY o_custkey),"
    " nt AS (SELECT COUNT(*) AS n, SUM(rev) AS total FROM rev),"
    " ranked AS (SELECT rev.*, nt.n, nt.total,"
    "  ROW_NUMBER() OVER (ORDER BY rev ASC, o_custkey ASC) AS i"
    "  FROM rev CROSS JOIN nt)"
    " SELECT ANY_VALUE(n) AS n_customers,"
    + ", ".join(
        f" ROUND(CAST(SUM(CASE WHEN i > n - CEIL(n * {p} / 100.0)"
        " THEN rev ELSE 0 END) AS DOUBLE)"
        f" / CAST(ANY_VALUE(total) AS DOUBLE), 6) AS top{p}_share"
        for p in CONC_TOPS
    )
    + ","
    " ROUND(2.0 * CAST(SUM(i * rev) AS DOUBLE)"
    "  / (CAST(ANY_VALUE(n) AS DOUBLE) * CAST(ANY_VALUE(total) AS DOUBLE))"
    "  - CAST(ANY_VALUE(n) + 1 AS DOUBLE) / CAST(ANY_VALUE(n) AS DOUBLE),"
    " 6) AS gini"
    " FROM ranked"
)
