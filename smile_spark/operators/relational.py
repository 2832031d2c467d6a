"""Relational operators — the reference's analytical query surface.

Each function re-expresses one hand-written OpenMP kernel from
/root/reference/src/regtests/ as a declarative DataFrame program.  The
reference's physical tricks (page-range partitioning, thread-local
partial state, padded counters, dense-array aggregation, build/probe
barriers — SURVEY.md §4.2) are exactly what Catalyst/Tungsten generate
from these plans: partial→final HashAggregate, whole-stage codegen,
broadcast or shuffled hash join chosen by AQE.  We deliberately write
NO imperative loops: at 100 TB the win comes from letting the optimizer
see the whole plan (pushdown, pruning, join reordering are free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.functions.numeric import davg, dsum
from smile_spark.tables import table

# ---------------------------------------------------------------------------
# S1 — full scan
# ---------------------------------------------------------------------------


def scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sequential table scan.

    Reference: 4 GB page loop, memcpy per 64 KB page
    (/root/reference/src/regtests/scan_regtest.cpp:27-34).  In Spark
    the paged file + buffer pool collapse into a columnar parquet scan
    split by ``spark.sql.files.maxPartitionBytes``; every executor
    streams its splits — the same page-range parallelism, minus the
    hand-rolled pool.
    """
    return table(spark, sf_dir, "lineitem")


# ---------------------------------------------------------------------------
# S2 — scan + filter + count
# ---------------------------------------------------------------------------


def scan_filter_count(
    spark: SparkSession, sf_dir: str, threshold: float = 25.0
) -> DataFrame:
    """Predicate + COUNT over the fact table.

    Reference: u32 values ``> threshold``, per-thread padded partial
    counters, serial final sum
    (/root/reference/src/regtests/scanfilter_regtest.cpp:14-57).  Spark
    plan: parquet scan with the predicate *pushed into the reader*
    (PushedFilters), partial count per partition, single-row final
    agg — the padded-counter trick is Tungsten's job.  The reference's
    threshold literal is a C++ ``2 ^ 32/2`` XOR quirk (SURVEY.md §7.3);
    we parameterize instead.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > threshold).agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# G1 — hash group-by + count
# ---------------------------------------------------------------------------


def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash GROUP BY + COUNT (map-backed partial state).

    Reference: per-thread ``unordered_map<u8,u32>`` then serial merge
    (/root/reference/src/regtests/groupby_regtest.cpp:32-81).  The
    partial/final split is Spark's HashAggregate(partial) → Exchange →
    HashAggregate(final); map-side combine means the shuffle carries at
    most (#groups × #partitions) rows — the property that keeps this
    O(groups) not O(rows) at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def groupby_count_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense small-domain GROUP BY + COUNT.

    Reference: ``array<u8,256>`` partial state for a bounded key domain
    (/root/reference/src/regtests/groupby_array_regtest.cpp:30-68).
    ``l_linenumber`` (1..7) is the bounded-domain analogue; the dense-
    array specialization is a physical detail Tungsten's vectorized
    hash aggregate already covers (SURVEY.md §2.1 G2).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linenumber").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# J1 — hash join (build + probe) + aggregate
# ---------------------------------------------------------------------------


def hashjoin_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build/probe hash equi-join feeding a grouped SUM.

    Reference: build side = even keys from the first 1/16 of data with
    FIRST-wins dedup per key; probe side scans the rest and atomically
    accumulates value sums per matched key
    (/root/reference/src/regtests/hashjoin_regtest.cpp:30-103).

    Spark mapping (SURVEY.md §3.2): the merged global hash table IS a
    broadcast exchange; the atomic probe-side update IS partial
    aggregation.  Scan-order "first" is nondeterministic in any
    parallel engine, so we pin the deterministic equivalent
    ``min(value)`` (SURVEY.md §7.3) — same in the oracle.  The build
    side (filtered customers) is small relative to orders at every SF,
    so we hint broadcast; at 100 TB AQE would pick broadcast vs
    shuffled-hash from real sizes, and the grouped SUM still combines
    map-side.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    build = (
        customer.filter(F.col("c_custkey") % 2 == 0)
        .groupBy(F.col("c_custkey").alias("key"))
        .agg(F.min("c_acctbal").alias("build_val"))
    )
    probe = orders
    return (
        probe.join(F.broadcast(build), probe.o_custkey == build.key, "inner")
        .groupBy("key", "build_val")
        .agg(
            dsum("o_totalprice", "sum_totalprice"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# P1 — projection
# ---------------------------------------------------------------------------


def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed column access (`Table<T>::get/foreach`,
    /root/reference/src/data/table.h:87-103,198-216).  As a plan this
    is column pruning: the parquet ReadSchema must contain exactly the
    two projected columns, nothing else."""
    return table(spark, sf_dir, "part").select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# F1 — cast / parse scalar functions
# ---------------------------------------------------------------------------


def casts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String↔value parse round-trips.

    Reference: ``parseBool/Int/.../Timestamp`` with warnings
    (/root/reference/src/base/types_utils.cpp:12-85); timestamp parsing
    there is stubbed to 0 — we implement the *intended* semantics
    (SURVEY.md §7.3).  Double→int uses explicit FLOOR because engines
    disagree on cast rounding; JSON-ish ``props`` is parsed with a
    regexp (dialect-portable) rather than a JSON extension.
    """
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("event_id").cast("string").alias("id_str"),
        F.col("event_id").cast("string").cast("bigint").alias("id_rt"),
        F.floor("value").cast("bigint").alias("value_floor"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_rt"),
        F.regexp_extract("props", r'"k": ([0-9]+)', 1)
        .cast("bigint")
        .alias("prop_k"),
        (F.col("event_type") == F.lit("purchase")).alias("is_purchase"),
    )


# ---------------------------------------------------------------------------
# F2 — timestamp comparisons
# ---------------------------------------------------------------------------


def timestamp_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp comparison semantics over a range predicate.

    Reference: ``timestamp`` wraps u64 seconds with comparison
    operators, and ``operator>=`` is buggily implemented as ``<=``
    (/root/reference/src/base/types.h:24-46, SURVEY.md §1.2) — we
    implement the *intended* semantics on native TimestampType.  The
    range predicate is sargable, so it pushes into the parquet reader
    (min/max row-group pruning — what partition pruning looks like on
    a time-partitioned 100 TB table).
    """
    ev = table(spark, sf_dir, "events")
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


TIMESTAMP_FILTER_SQL = (
    # µs-truncate: Spark reads the ns fixture at µs resolution.
    "WITH e AS (SELECT event_type,"
    " date_trunc('microseconds', ts) AS ts FROM events)"
    " SELECT event_type, COUNT(*) AS cnt,"
    " MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM e"
    " WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'"
    " AND ts < TIMESTAMP '2024-01-15 00:00:00'"
    " GROUP BY event_type"
)


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scalar-aggregate family: MIN / MAX / AVG / COUNT DISTINCT.

    The reference implements only COUNT and SUM (SURVEY.md §2.2); the
    rest come from the same partial/final hash-aggregate machinery.
    COUNT DISTINCT is the interesting one at scale: Spark expands it
    to a two-level aggregate (distinct (group, key) first, then count
    per group) — shuffle bounded by distinct pairs, not rows.  MIN/MAX
    on doubles are order-insensitive so they hash-match the oracle
    without decimal accumulation; AVG goes through exact DECIMAL.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_extendedprice", "avg_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("cnt"),
    )


AGG_STATS_SQL = (
    "SELECT l_returnflag,"
    " MIN(l_extendedprice) AS min_price,"
    " MAX(l_extendedprice) AS max_price,"
    " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    "  / COUNT(l_extendedprice) AS avg_price,"
    " COUNT(DISTINCT l_suppkey) AS n_suppliers,"
    " COUNT(*) AS cnt"
    " FROM lineitem GROUP BY l_returnflag"
)


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface over part names (the reference has no
    string functions at all, SURVEY.md §2.2).  Dialect-portable subset:
    case mapping, length, substring, concat, trim, replace, position,
    LIKE-style matching.  All row-parallel codegen expressions — zero
    shuffle."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        (F.instr("p_name", "a") > 0).alias("has_a"),
        F.col("p_name").like("%steel%").alias("is_steel"),
    )


STRING_FUNCTIONS_SQL = (
    "SELECT p_partkey,"
    " UPPER(p_name) AS name_upper,"
    " LOWER(p_brand) AS brand_lower,"
    " CAST(LENGTH(p_name) AS BIGINT) AS name_len,"
    " SUBSTRING(p_name, 1, 5) AS name_head,"
    " CONCAT_WS('-', p_brand, p_type) AS brand_type,"
    " TRIM(p_name) AS name_trim,"
    " REPLACE(p_type, ' ', '_') AS type_snake,"
    " POSITION('a' IN p_name) > 0 AS has_a,"
    " p_name LIKE '%steel%' AS is_steel"
    " FROM part"
)


# ---------------------------------------------------------------------------
# SQL surface — the same engine through spark.sql
# ---------------------------------------------------------------------------

# One SQL text, two engines: runs verbatim under Spark SQL *and* DuckDB
# (the portable dialect subset), over identically-named views.
SQL_ORDER_PRIORITY = (
    "SELECT o_orderpriority,"
    " COUNT(*) AS n_orders,"
    " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
    "  AS sum_price"
    " FROM orders"
    " WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'"
    " GROUP BY o_orderpriority"
)


def sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual SQL interface: catalog views + ``spark.sql``.

    The reference has no SQL layer at all (SURVEY.md §0) — every query
    is a hand-written C++ loop.  Here the engine's registered views
    make the whole fixture schema addressable from SQL, and the SAME
    query text runs on Spark and on the DuckDB oracle — dialect
    portability is the correctness check.
    """
    from smile_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_ORDER_PRIORITY)


# ---------------------------------------------------------------------------
# A1 — datagen
# ---------------------------------------------------------------------------


def datagen(spark: SparkSession, sf_dir: str, n: int = 100_000) -> DataFrame:
    """Deterministic synthetic data generator.

    Reference: 4 GB of pages filled with unseeded ``rand()%256``
    (/root/reference/src/regtests/alloc_regtest.cpp:23-36).  Unseeded
    randomness isn't semantics, so we generate with a Knuth
    multiplicative hash — pure arithmetic, identical in any engine,
    and embarrassingly parallel (``spark.range`` splits the id space
    across executors with zero shuffle).
    """
    return spark.range(0, n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 4294967296 % 256)
        .cast("int")
        .alias("val"),
    )


# ---------------------------------------------------------------------------
# Capability demos licensed by SURVEY.md §2.2 (free in Spark)
# ---------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (entry()): TPC-H Q1-shaped pricing summary.

    Exercises scan → filter (pushed down) → wide hash aggregate with
    exact decimal accumulation — the composition of S1+S2+G1 the
    reference can only run as separate kernels.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2025-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k by aggregate: join + group + order + limit.

    Sorts/limits are absent from the reference (SURVEY.md §2.2) but
    licensed as a capability; in Spark ``orderBy().limit(k)`` compiles
    to TakeOrderedAndProject — per-partition top-k then a k-row merge
    on the driver, which is the only top-k that scales to 100 TB (no
    global sort materialization).  Ties broken by key for determinism.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    totals = (
        orders.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spent"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent")
    )
    return totals.orderBy(F.desc("total_spent"), F.asc("c_custkey")).limit(k)


def window_rank(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Analytic window function: top-k orders per customer.

    row_number over (partition by customer, order by price desc) — one
    shuffle on the partition key, then a per-partition sort; ties
    broken by o_orderkey so the result set is engine-independent.
    """
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


def join_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi / anti / outer join family in one summary row.

    The reference implements exactly one join (J1's inner hash
    equi-join); semi/anti/outer come free from the same hash-join
    machinery in Spark (SURVEY.md §2.2), and the anti join is the
    shape its graph integrity check hand-rolls.  Each leg broadcasts
    the filtered customer side; counts summarize so one row proves all
    four semantics.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    rich = F.broadcast(
        customer.filter(F.col("c_acctbal") > 5000).select(
            F.col("c_custkey").alias("key")
        )
    )
    o = orders.select(F.col("o_custkey").alias("key"))
    n_semi = o.join(rich, "key", "semi").agg(F.count(F.lit(1)).alias("n_semi"))
    n_anti = o.join(rich, "key", "anti").agg(F.count(F.lit(1)).alias("n_anti"))
    outer = customer.select(F.col("c_custkey").alias("key")).join(
        o.groupBy("key").agg(F.count(F.lit(1)).alias("n_ord")), "key", "left"
    )
    n_outer_null = outer.filter(F.col("n_ord").isNull()).agg(
        F.count(F.lit(1)).alias("n_customers_without_orders")
    )
    return n_semi.crossJoin(n_anti).crossJoin(n_outer_null)


JOIN_VARIANTS_SQL = (
    "WITH rich AS (SELECT c_custkey AS key FROM customer"
    " WHERE c_acctbal > 5000),"
    " o AS (SELECT o_custkey AS key FROM orders)"
    " SELECT"
    " (SELECT COUNT(*) FROM o WHERE key IN (SELECT key FROM rich))"
    "  AS n_semi,"
    " (SELECT COUNT(*) FROM o WHERE key NOT IN (SELECT key FROM rich))"
    "  AS n_anti,"
    " (SELECT COUNT(*) FROM customer c LEFT JOIN"
    "  (SELECT key, COUNT(*) AS n_ord FROM o GROUP BY key) t"
    "  ON c.c_custkey = t.key WHERE t.n_ord IS NULL)"
    "  AS n_customers_without_orders"
)


def rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (grouping-set family).

    Absent from the reference (SURVEY.md §2.2 — no grouping sets/
    cube/rollup); in Spark the rollup is a single pass whose partial
    aggregates feed every grouping level, vs. one scan per level done
    naively.  NULL group markers are made explicit strings so the
    cross-engine hash is well-defined.
    """
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", "sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "cnt",
            "sum_price",
        )
    )


ROLLUP_SQL = (
    "SELECT COALESCE(o_orderstatus, '(all)') AS status,"
    " COALESCE(o_orderpriority, '(all)') AS priority,"
    " COUNT(*) AS cnt,"
    " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price"
    " FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
)


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (union / intersect / except) as one summary row.

    A = customers holding ≥1 order; B = customers with acctbal > 5000.
    Distinct set semantics; each leg is a shuffle on the key — the
    except leg is the same anti-join shape as the reference's graph
    integrity check (SURVEY.md §2.1 L2).
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    a = orders.select(F.col("o_custkey").alias("ck")).distinct()
    b = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("ck")
    )
    n_union = a.union(b).distinct().agg(F.count(F.lit(1)).alias("n_union"))
    n_intersect = a.intersect(b).agg(F.count(F.lit(1)).alias("n_intersect"))
    n_except = a.exceptAll(b).distinct().agg(
        F.count(F.lit(1)).alias("n_except")
    )
    return n_union.crossJoin(n_intersect).crossJoin(n_except)


# Correlated / scalar subquery surface — one portable SQL text per
# shape, run verbatim on Spark SQL and on the DuckDB oracle (the
# dialect-portability check, same as SQL_ORDER_PRIORITY).  The
# reference has no subquery concept at all (SURVEY.md §0: no SQL
# layer); Catalyst rewrites EXISTS/IN into semi joins and scalar
# subqueries into a broadcast single-row join — these are plan
# capabilities, not parser sugar.
SQL_SUBQUERIES = (
    "SELECT c_custkey, c_acctbal FROM customer c"
    " WHERE EXISTS (SELECT 1 FROM orders o"
    "   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"
    " AND c_custkey NOT IN ("
    "   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    "   AND o_custkey IS NOT NULL)"
    " AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer)"
)


def sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT IN + scalar subquery in one statement.

    Catalyst compiles the EXISTS to a left-semi join, the NOT IN to a
    null-aware anti join, and the scalar AVG to a single-row broadcast
    — all shuffle-bounded by key columns.  The identical text runs on
    the oracle, so the check covers both semantics and dialect
    portability.
    """
    from smile_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_SUBQUERIES)


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join: revenue per nation within a
    region and date range, where the supplier and customer share the
    nation.

    The scale shape: the two fact tables (lineitem ⋈ orders) meet in
    the single big shuffle on orderkey; every dimension
    (customer/supplier/nation/region) broadcasts, so the fact data is
    exchanged exactly once end-to-end; the date filter pushes into the
    orders scan and the region filter prunes the dimension BEFORE the
    broadcast.  Catalyst's join reordering gets the dimension chain
    right from the declarative form — the hand-scheduling the
    reference would need (SURVEY.md §4.1) simply doesn't exist here.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1999-01-01"))
        )
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            (li.l_suppkey == F.col("s_suppkey"))
            & (F.col("s_nationkey") == dims.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REGIONAL_REVENUE_SQL = (
    "SELECT n_name,"
    " CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    "  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    "  AS DECIMAL(18,4))) AS DOUBLE) AS revenue,"
    " COUNT(*) AS n_items"
    " FROM lineitem"
    " JOIN orders ON l_orderkey = o_orderkey"
    " JOIN customer ON o_custkey = c_custkey"
    " JOIN supplier ON l_suppkey = s_suppkey"
    "  AND s_nationkey = c_nationkey"
    " JOIN nation ON c_nationkey = n_nationkey"
    " JOIN region ON n_regionkey = r_regionkey"
    " WHERE r_name = 'ASIA'"
    " AND o_orderdate >= TIMESTAMP '1997-01-01'"
    " AND o_orderdate < TIMESTAMP '1999-01-01'"
    " GROUP BY n_name"
)


def q3_shipping_priority(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: segment-filtered
    customers ⋈ date-filtered orders ⋈ lineitem, revenue per order,
    global top-k.  The classic date-window star join: the customer
    filter broadcasts, the orders date predicate pushes into the scan,
    and the top-k is TakeOrderedAndProject (k rows per partition to the
    driver, no global sort) — at 100 TB the scan prunes on the date
    partition key and nothing but (orderkey, revenue) ever shuffles."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == c.c_custkey)
    )
    rev = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("revenue")
    )
    return rev.orderBy(
        F.desc("revenue"), F.asc("l_orderkey")
    ).limit(k)


Q3_SHIPPING_PRIORITY_SQL = (
    "SELECT l_orderkey, o_orderdate,"
    " CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    "  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    "  AS DECIMAL(18,4))) AS DOUBLE) AS revenue"
    " FROM lineitem"
    " JOIN orders ON l_orderkey = o_orderkey"
    " JOIN customer ON o_custkey = c_custkey"
    " WHERE c_mktsegment = 'BUILDING'"
    " AND o_orderdate < TIMESTAMP '1998-01-01'"
    " GROUP BY l_orderkey, o_orderdate"
    " ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
)


def skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue via an explicitly SALTED join
    (functions/skew.py): the big fact side is spread over 8 synthetic
    sub-keys, the supplier side replicated once per salt — the
    plan-level answer to a power-law hot key that AQE's runtime skew
    split can't fix.  The salt changes row placement ONLY: the result
    (and this oracle) is identical to the unsalted join, which is the
    point — verified here through the driver's hash gate."""
    from smile_spark.functions.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(li, s, "suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice", "sum_revenue"),
    )


SKEW_SALTED_REVENUE_SQL = (
    "SELECT s_nationkey, COUNT(*) AS n_items,"
    " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
    "  AS sum_revenue"
    " FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"
    " GROUP BY s_nationkey"
)


def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (UNION ALL / INTERSECT ALL /
    EXCEPT ALL) as one summary row — the multiplicity-preserving
    complement to ``set_ops``'s distinct semantics.  A = per-order
    customer keys (with repeats — the multiset); B = high-balance
    customer keys.  INTERSECT ALL keeps min(multiplicity) per value
    and EXCEPT ALL subtracts multiplicities — semantics Spark
    implements via counted hash joins (intersectAll/exceptAll), no
    distinct collapse, so the shuffle still carries one row per
    (value, count) after partial aggregation."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    a = orders.select(F.col("o_custkey").alias("ck"))
    b = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("ck")
    )
    n_union_all = a.union(b).agg(F.count(F.lit(1)).alias("n_union_all"))
    n_intersect_all = a.intersectAll(b).agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    n_except_all = a.exceptAll(b).agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    return n_union_all.crossJoin(n_intersect_all).crossJoin(n_except_all)


SET_OPS_ALL_SQL = (
    "WITH a AS (SELECT o_custkey AS ck FROM orders),"
    " b AS (SELECT c_custkey AS ck FROM customer WHERE c_acctbal > 5000)"
    " SELECT"
    "  (SELECT COUNT(*) FROM (SELECT ck FROM a UNION ALL"
    "    SELECT ck FROM b)) AS n_union_all,"
    "  (SELECT COUNT(*) FROM (SELECT ck FROM a INTERSECT ALL"
    "    SELECT ck FROM b)) AS n_intersect_all,"
    "  (SELECT COUNT(*) FROM (SELECT ck FROM a EXCEPT ALL"
    "    SELECT ck FROM b)) AS n_except_all"
)


def string_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg surface: per customer, the sorted CSV of
    their order priorities.  collect_list order is partitioning-
    dependent in any parallel engine — sorting INSIDE the aggregate
    result (array_sort before array_join) is what makes list-valued
    aggregation deterministic; the oracle's string_agg(... ORDER BY)
    states the same contract declaratively.  One partial/final
    aggregate; the list state is bounded by per-key cardinality."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(
            F.array_sort(F.collect_list("o_orderpriority")), ","
        ).alias("priorities_csv"),
    )


STRING_AGG_SQL = (
    "SELECT o_custkey, COUNT(*) AS n_orders,"
    " string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)"
    "  AS priorities_csv"
    " FROM orders GROUP BY o_custkey"
)


def try_cast_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant parsing surface: TRY_CAST yields NULL instead of
    failing the job — the difference between one malformed record
    killing a 100 TB ingest and it landing in a quarantine column.
    Mixed parseable/unparseable inputs are derived deterministically
    from event fields; the summary counts successes and failures."""
    ev = table(spark, sf_dir, "events")
    mixed = ev.select(
        "event_id",
        # numeric-looking only when event_id % 3 == 0
        F.expr(
            "CASE WHEN event_id % 3 = 0 THEN CAST(event_id AS STRING)"
            " ELSE event_type END"
        ).alias("maybe_num"),
    )
    parsed = mixed.select(
        "event_id",
        F.expr("try_cast(maybe_num AS BIGINT)").alias("as_num"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("as_num").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("as_num")).alias("n_failed"),
        F.sum("as_num").cast("bigint").alias("sum_parsed"),
    )


TRY_CAST_SQL = (
    "WITH mixed AS (SELECT event_id,"
    " CASE WHEN event_id % 3 = 0 THEN CAST(event_id AS VARCHAR)"
    "  ELSE event_type END AS maybe_num FROM events),"
    " parsed AS (SELECT event_id,"
    "  TRY_CAST(maybe_num AS BIGINT) AS as_num FROM mixed)"
    " SELECT COUNT(*) AS n_rows, COUNT(as_num) AS n_parsed,"
    " COUNT(*) - COUNT(as_num) AS n_failed,"
    " CAST(SUM(as_num) AS BIGINT) AS sum_parsed"
    " FROM parsed"
)


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (frequent pairs)
# ---------------------------------------------------------------------------

BASKET_MIN_SUPPORT = 3
BASKET_TOP_K = 25


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs: parts appearing together in the same order,
    with support ≥ BASKET_MIN_SUPPORT, top-k by support — the
    market-basket / co-occurrence kernel (recommendations, affinity).

    Pair generation happens INSIDE each basket: one shuffle gathers a
    basket's distinct items into a sorted array (collect_set ≡ the
    old per-order DISTINCT), then a combinations lambda emits the
    p1 < p2 pairs map-side — per-basket cost quadratic in basket SIZE
    (bounded, ~4 items), never in catalog or corpus size, and TWO
    fewer exchanges than the distinct + self-join formulation
    (measured 2.2s -> 1.7s at sf0.1, BENCH_LOCAL r04).  Support
    counting is a
    partial/final aggregate on the pair key; top-k is
    TakeOrderedAndProject.  The same shape computes token
    co-occurrence at 100 TB (documents as baskets)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    baskets = li.groupBy("ok").agg(
        F.expr("array_sort(collect_set(pk))").alias("ps")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    "  y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    return pairs.orderBy(
        F.desc("support"), F.asc("p1"), F.asc("p2")
    ).limit(BASKET_TOP_K)


COPURCHASE_PAIRS_SQL = (
    "WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk"
    "  FROM lineitem),"
    " pairs AS (SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS support"
    "  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk"
    f"  GROUP BY 1, 2 HAVING COUNT(*) >= {BASKET_MIN_SUPPORT})"
    " SELECT p1, p2, support FROM pairs"
    " ORDER BY support DESC, p1 ASC, p2 ASC"
    f" LIMIT {BASKET_TOP_K}"
)


# ---------------------------------------------------------------------------
# Calendar dimension generator
# ---------------------------------------------------------------------------

DATE_DIM_START = "2024-01-01"
DATE_DIM_DAYS = 366


def date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate the calendar dimension table warehouses join against:
    one row per day with the standard derived attributes.  Pure
    ``sequence``+``explode`` over an id space — embarrassingly
    parallel like datagen, no input scan at all (sf_dir unused; part
    of the generator family).  At 100 TB this is the canonical
    broadcast dimension: ~37k rows per century."""
    days = spark.range(DATE_DIM_DAYS).select(
        F.date_add(F.lit(DATE_DIM_START).cast("date"), F.col("id").cast("int"))
        .alias("d")
    )
    return days.select(
        F.col("d").cast("timestamp_ntz").alias("day"),
        F.year("d").cast("bigint").alias("year"),
        F.quarter("d").cast("bigint").alias("quarter"),
        F.month("d").cast("bigint").alias("month"),
        F.dayofmonth("d").cast("bigint").alias("day_of_month"),
        F.dayofweek("d").cast("bigint").alias("day_of_week"),
        F.weekofyear("d").cast("bigint").alias("iso_week"),
        (F.dayofweek("d").isin(1, 7)).alias("is_weekend"),
    )


DATE_DIMENSION_SQL = (
    "WITH days AS (SELECT CAST(DATE '2024-01-01' + INTERVAL (i) DAY"
    "  AS DATE) AS d"
    f" FROM generate_series(0, {DATE_DIM_DAYS - 1}) t(i))"
    " SELECT CAST(d AS TIMESTAMP) AS day,"
    " CAST(year(d) AS BIGINT) AS year,"
    " CAST(quarter(d) AS BIGINT) AS quarter,"
    " CAST(month(d) AS BIGINT) AS month,"
    " CAST(day(d) AS BIGINT) AS day_of_month,"
    " CAST(dayofweek(d) + 1 AS BIGINT) AS day_of_week,"
    " CAST(weekofyear(d) AS BIGINT) AS iso_week,"
    " dayofweek(d) IN (0, 6) AS is_weekend"
    " FROM days"
)
