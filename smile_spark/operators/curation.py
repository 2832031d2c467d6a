"""Corpus-curation operators (north-star extension; the reference has
no text surface at all — SURVEY.md §2.2): the remaining verbs of a
training-data pipeline beyond dedup/quality (operators/dedup.py,
operators/text.py, operators/pipeline.py):

* ``text_normalize`` — canonical text cleanup (case fold, punctuation
  strip, whitespace collapse) — the pass that runs before any
  shingling/fingerprinting so near-dup detection isn't defeated by
  formatting noise.
* ``doc_chunks`` — overlapping token-window chunking — how long
  documents become training-window-sized samples.
* ``ngram_counts`` — corpus-level bigram frequencies (top-k) — the
  corpus statistics pass behind tokenizer/vocab construction.
* ``cdc_latest_state`` — latest-record-wins compaction keyed by entity
  — the MERGE/upsert shape that turns an append-only event log into a
  current-state table.
* ``source_temperature_mix`` — temperature-based (α=0.5) source
  mixing: downweight dominant sources ∝ √(n_min/n_s), selected by the
  same deterministic key hash as `sampling_hash` so the mix is
  reproducible under any partitioning.

All are JVM-codegen column expressions (zero Python UDFs); each has a
bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smile_spark.tables import fan_out, persisted_once, table

# chunking: 64-token windows, 48-token stride (16-token overlap keeps
# boundary context in both neighbors)
CHUNK_W = 64
CHUNK_STRIDE = 48

NGRAM_TOP_K = 50

# temperature mixing exponent α = 0.5 expressed as √ — keep_rate_s =
# floor(100·√(n_min/n_s)) so the smallest source keeps 100%.  floor of
# a correctly-rounded sqrt is engine-portable (IEEE sqrt is exact per
# rounding, unlike libm pow/exp).
MIX_FLOOR_PCT = 1  # every source keeps at least 1%


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase → strip non-alnum →
    collapse runs of spaces → trim.  Row-parallel codegen over the
    scan, zero shuffle — at 100 TB this pass is I/O-bound and runs
    fused with whatever consumes it."""
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


TEXT_NORMALIZE_SQL = (
    "WITH n AS (SELECT doc_id,"
    " trim(regexp_replace(regexp_replace(lower(text),"
    "  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text"
    " FROM documents)"
    " SELECT doc_id, norm_text,"
    " CAST(length(norm_text) AS BIGINT) AS n_chars_norm FROM n"
)


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: each document yields windows
    of CHUNK_W tokens every CHUNK_STRIDE tokens (final windows may be
    short).  One explode keyed by the scan partitioning — no shuffle;
    chunk_idx derives from the window start, so no ordering dependence
    anywhere.  At 100 TB, partition for post-explosion volume
    (`fan_out`) exactly like shingling."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("n"))
    starts = toks.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.expr(f"sequence(0, n - 1, {CHUNK_STRIDE})")
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("s").cast("bigint").alias("start_tok"),
        F.least(F.lit(CHUNK_W), F.col("n") - F.col("s"))
        .cast("bigint")
        .alias("chunk_len"),
        F.array_join(
            F.expr(f"slice(toks, s + 1, {CHUNK_W})"), " "
        ).alias("chunk_text"),
    )


DOC_CHUNKS_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,"
    " len(string_split(text, ' ')) AS n FROM documents),"
    f" s AS (SELECT doc_id, toks, n, unnest(generate_series(0, n - 1,"
    f" {CHUNK_STRIDE})) AS s FROM t)"
    " SELECT doc_id,"
    f" CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,"
    " CAST(s AS BIGINT) AS start_tok,"
    f" CAST(least({CHUNK_W}, n - s) AS BIGINT) AS chunk_len,"
    f" array_to_string(toks[s + 1 : s + {CHUNK_W}], ' ') AS chunk_text"
    " FROM s"
)


def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies, top-k.  Bigrams assemble inside a
    higher-order lambda (no token self-join), then one explode → one
    partial/final count aggregate → TakeOrderedAndProject for the
    global top-k (every partition ships k rows, no global sort).  The
    shuffle carries (bigram, partial_count) — bounded by vocabulary²
    sightings, not corpus size."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(F.split("text", " ").alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN"
                " transform(sequence(1, size(toks) - 1),"
                "  i -> concat(element_at(toks, i), ' ',"
                "   element_at(toks, i + 1)))"
                " ELSE array() END"
            )
        ).alias("bigram")
    )
    counts = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy(F.desc("cnt"), F.asc("bigram")).limit(NGRAM_TOP_K)


NGRAM_COUNTS_SQL = (
    "WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),"
    " b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),"
    "  i -> toks[i] || ' ' || toks[i + 1])) AS bigram"
    "  FROM t WHERE len(toks) >= 2)"
    " SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram"
    f" ORDER BY cnt DESC, bigram ASC LIMIT {NGRAM_TOP_K}"
)


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-wins compaction of the append-only event log into
    a current-state table keyed by user: the batch form of a CDC/upsert
    MERGE.  One shuffle keyed by the entity id, per-key sort inside the
    window — at 100 TB this is the periodic compaction pass over a
    bucketed-by-key log, and the window becomes a near-free sort within
    pre-bucketed partitions.  Ties on ts break by event_id, so the
    winner is engine-independent."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


CDC_LATEST_STATE_SQL = (
    "WITH e AS (SELECT user_id, event_id,"
    " date_trunc('microseconds', ts) AS ts_us, event_type, value,"
    " ROW_NUMBER() OVER (PARTITION BY user_id"
    "  ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn"
    " FROM events)"
    " SELECT user_id, event_id AS last_event_id, ts_us AS last_ts,"
    " event_type AS last_type, value AS last_value"
    " FROM e WHERE rn = 1"
)


def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (α = 0.5): each source keeps
    floor(100·√(n_min/n_s))% of its documents, chosen by the same
    deterministic md5 key-hash as `sampling_hash` — dominant sources
    are damped toward the √ of their share, the smallest source keeps
    everything, and the selected row set is identical under any
    partitioning or engine.  Plan: one tiny per-source count aggregate
    (broadcast back), then a pure filter over the scan — the corpus
    never shuffles.  Emits per-source accounting (n_total, keep_pct,
    n_kept)."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    n_min = counts.agg(F.min("n_total").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_total",
        F.greatest(
            F.lit(MIX_FLOOR_PCT),
            F.floor(
                100
                * F.sqrt(
                    F.col("n_min").cast("double")
                    / F.col("n_total").cast("double")
                )
            ),
        )
        .cast("bigint")
        .alias("keep_pct"),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
        " as bigint) % 100"
    )
    kept = (
        docs.select("doc_id", "source", bucket.alias("b"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("b") < F.col("keep_pct"))
    )
    return (
        kept.groupBy("source", "n_total", "keep_pct")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .select("source", "n_total", "keep_pct", "n_kept")
    )


SOURCE_TEMPERATURE_MIX_SQL = (
    "WITH counts AS (SELECT source, COUNT(*) AS n_total FROM documents"
    " GROUP BY source),"
    " m AS (SELECT MIN(n_total) AS n_min FROM counts),"
    " rates AS (SELECT source, n_total,"
    f"  CAST(greatest({MIX_FLOOR_PCT}, floor(100 * sqrt("
    "   CAST(n_min AS DOUBLE) / CAST(n_total AS DOUBLE))))"
    "   AS BIGINT) AS keep_pct"
    "  FROM counts, m),"
    " kept AS (SELECT d.source, r.n_total, r.keep_pct"
    "  FROM documents d JOIN rates r ON d.source = r.source"
    "  WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT)"
    "   % 100 < r.keep_pct)"
    " SELECT source, n_total, keep_pct, COUNT(*) AS n_kept"
    " FROM kept GROUP BY source, n_total, keep_pct"
)


# decontamination: 8-token grams, 5%-of-corpus probe set standing in
# for a benchmark/eval corpus, flag threshold on the overlap ratio
DECON_GRAM_K = 8
DECON_PROBE_PCT = 5
DECON_THRESHOLD = 0.5


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose 8-token
    gram sets overlap a probe ("benchmark") set — the eval-leakage
    check a training-data pipeline runs beside near-dedup (near-dedup
    finds doc↔doc similarity; this finds doc↔BENCHMARK containment,
    catching verbatim spans even inside otherwise-novel documents).

    The probe set here is a deterministic 5% hash slice of the corpus
    (in production: the actual eval suites, a tiny broadcastable set).
    Shape: corpus grams explode once, collapse to a 60-bit md5-prefix
    key BEFORE the distinct (the shuffle then carries 8-byte keys, not
    ~60-byte gram strings — ~8× less exchange volume; both engines use
    the same md5, so the ~1e-5 collision behavior is identical and
    parity is exact), the probe key set broadcasts into a left
    semi-flag join, and one doc-keyed aggregate produces overlap
    ratios — corpus text never shuffles.
    Emits flagged docs: (doc_id, n_grams, n_overlap, overlap_ratio).
    """
    def _build_grams() -> DataFrame:
        docs = fan_out(table(spark, sf_dir, "documents"))
        return (
            docs.select(
                "doc_id",
                F.split("text", " ").alias("toks"),
            )
            .filter(F.size("toks") >= DECON_GRAM_K)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {DECON_GRAM_K - 1}),"
                        f" i -> array_join(slice(toks, i, {DECON_GRAM_K}), ' '))"
                    )
                ).alias("g"),
            )
            .select(
                "doc_id",
                F.expr(
                    "cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint)"
                ).alias("g"),
            )
            .distinct()
        )

    # feeds BOTH the probe slice and the corpus side: persist so the
    # explode+distinct runs once, not twice (MEMORY_AND_DISK — spills
    # rather than OOMs on a corpus-sized gram table; the 100 TB form
    # writes this table to shared storage once).  Memoized per
    # application so repeated invocations reuse ONE cache entry.
    grams = persisted_once(spark, "decon_grams", sf_dir, _build_grams)
    probe = (
        grams.filter(F.col("doc_id") % 100 < DECON_PROBE_PCT)
        .select("g")
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 100 >= DECON_PROBE_PCT)
    flagged = (
        corpus.join(
            F.broadcast(probe.withColumn("hit", F.lit(1))), "g", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias(
                "n_overlap"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_overlap",
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_grams"), 6
            ).alias("overlap_ratio"),
        )
        .filter(F.col("overlap_ratio") >= DECON_THRESHOLD)
    )
    return flagged


DECONTAMINATE_SQL = (
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t"
    " FROM documents),"
    " raw AS (SELECT doc_id,"
    f"  unnest(list_transform(generate_series(1, len(t) - {DECON_GRAM_K - 1}),"
    f"   i -> array_to_string(t[i : i + {DECON_GRAM_K - 1}], ' '))) AS gs"
    f"  FROM toks WHERE len(t) >= {DECON_GRAM_K}),"
    " grams AS (SELECT DISTINCT doc_id,"
    "  ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g FROM raw),"
    " probe AS (SELECT DISTINCT g FROM grams"
    f"  WHERE doc_id % 100 < {DECON_PROBE_PCT}),"
    " agg AS (SELECT grams.doc_id, COUNT(*) AS n_grams,"
    "  CAST(SUM(CASE WHEN probe.g IS NOT NULL THEN 1 ELSE 0 END)"
    "   AS BIGINT) AS n_overlap"
    "  FROM grams LEFT JOIN probe ON grams.g = probe.g"
    f"  WHERE grams.doc_id % 100 >= {DECON_PROBE_PCT}"
    "  GROUP BY grams.doc_id)"
    " SELECT doc_id, n_grams, n_overlap,"
    "  ROUND(CAST(n_overlap AS DOUBLE) / n_grams, 6) AS overlap_ratio"
    " FROM agg"
    f" WHERE ROUND(CAST(n_overlap AS DOUBLE) / n_grams, 6)"
    f"  >= {DECON_THRESHOLD}"
)


# ---------------------------------------------------------------------------
# PII scrubbing + intra-document repetition (Gopher-style quality signal)
# ---------------------------------------------------------------------------

# Redaction patterns, applied in order: emails first (so their digit
# runs don't double-count), then standalone digit runs of 2+ (ids,
# phone fragments, zips).  Both engines use RE2-compatible syntax.
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_NUM_RE = "[0-9]{2,}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the semi-structured event payload: replace email
    addresses and digit runs with typed placeholders, and count the
    redactions made.  Pure row-parallel regexp codegen — zero shuffle,
    fused with the scan; at 100 TB this pass is I/O-bound, exactly like
    text_normalize.  The same two-pattern cascade applies unchanged to
    a documents-scale text column."""
    ev = table(spark, sf_dir, "events")
    # counts use the column API (regexp_count), NOT f-string interpolation
    # into F.expr: SQL string-literal escape processing would turn the
    # pattern's '\\.' into '.', silently loosening the count regex
    # relative to the regexp_replace redaction and the DuckDB oracle.
    n_email = F.regexp_count("props", F.lit(PII_EMAIL_RE))
    redacted_email = F.regexp_replace("props", PII_EMAIL_RE, "<EMAIL>")
    n_num = F.regexp_count(redacted_email, F.lit(PII_NUM_RE))
    return ev.select(
        "event_id",
        F.regexp_replace(redacted_email, PII_NUM_RE, "<NUM>").alias(
            "props_redacted"
        ),
        (n_email + n_num).cast("bigint").alias("n_redactions"),
    )


PII_REDACT_SQL = (
    "SELECT event_id,"
    f" regexp_replace(regexp_replace(props, '{PII_EMAIL_RE}', '<EMAIL>',"
    f"  'g'), '{PII_NUM_RE}', '<NUM>', 'g') AS props_redacted,"
    " CAST(len(regexp_extract_all(props,"
    f"  '{PII_EMAIL_RE}')) + len(regexp_extract_all("
    f"  regexp_replace(props, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),"
    f"  '{PII_NUM_RE}')) AS BIGINT) AS n_redactions"
    " FROM events"
)


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signal: the fraction of
    word trigrams that are duplicates of an earlier trigram in the SAME
    document.  Heavily templated / looping text scores high and gets
    filtered before training.

    Trigrams assemble inside higher-order array lambdas (transform over
    an index sequence), distinct-count via array_distinct — the whole
    metric is per-row JVM codegen with NO explode and NO shuffle,
    unlike the corpus-level ngram_counts aggregation."""
    # materialize the token array ONCE in a projection — expression
    # trees don't common-subexpression-eliminate across lambda scopes,
    # so inlining split() here would re-tokenize per trigram index
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
    )
    tg = F.expr(
        "transform(sequence(1, size(t) - 2),"
        " i -> concat_ws(' ', t[i - 1], t[i], t[i + 1]))"
    )
    d = toks.select(
        "doc_id",
        F.size(tg).cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct(tg)).cast("bigint").alias("n_distinct"),
    )
    return d.select(
        "doc_id",
        "n_trigrams",
        "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_trigrams"), 6
        ).alias("rep_ratio"),
    )


REPETITION_RATIO_SQL = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks"
    "  FROM documents WHERE len(string_split(text, ' ')) >= 3),"
    " g AS (SELECT doc_id,"
    "  list_transform(generate_series(1, len(toks) - 2),"
    "   i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])) AS tg"
    "  FROM t),"
    " d AS (SELECT doc_id, CAST(len(tg) AS BIGINT) AS n_trigrams,"
    "  CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct FROM g)"
    " SELECT doc_id, n_trigrams, n_distinct,"
    " ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_trigrams, 6)"
    "  AS rep_ratio"
    " FROM d"
)


# ---------------------------------------------------------------------------
# Bigram association strength (vocabulary/collocation statistics)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k collocations by LIFT — the association measure behind
    merge rules in BPE/WordPiece-style vocabulary induction:
    ``lift(a,b) = P(a,b) / (P(a)·P(b))``.

    Lift instead of log-PMI by design: it is a quotient of exact
    integer counts, so the double result is bit-deterministic across
    engines (libm ``ln`` is not correctly-rounded everywhere; rank
    order is identical since log is monotone).

    Shape at 100 TB: unigram AND bigram sightings stream out of ONE
    tokenize+explode pass (tagged items), so the corpus is scanned and
    shuffled once — not once per n-gram order; splitting the counted
    table back into the two views is vocabulary-sized work.  Totals
    are 1-row broadcasts; the count joins key on component words
    (zipfian — AQE's skew handling covers head words); top-k is
    TakeOrderedAndProject."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(F.split("text", " ").alias("t"))
    items = toks.select(
        F.explode(
            F.expr(
                "concat("
                " transform(t, w -> struct(0 AS isbg, w AS k)),"
                " CASE WHEN size(t) >= 2 THEN"
                "  transform(sequence(1, size(t) - 1),"
                "   i -> struct(1 AS isbg,"
                "    concat(t[i - 1], ' ', t[i]) AS k))"
                "  ELSE array() END)"
            )
        ).alias("it")
    ).select("it.isbg", "it.k")
    # The counted table fans out to FOUR consumers (unigram view,
    # bigram view, both totals); without a cache each one re-runs the
    # corpus explode+count (measured 3.7s -> 0.6s at sf0.1 from this
    # persist).  The table is VOCABULARY-sized (unigram + bigram
    # types), so caching it is broadcast-scale memory at any corpus
    # size — persist(), not localCheckpoint(), keeps the query lazy;
    # memoized per application so repeated invocations reuse ONE
    # cache entry instead of leaking one per call.
    counts = persisted_once(
        spark,
        "pmi_counts",
        sf_dir,
        lambda: items.groupBy("isbg", "k").agg(
            F.count(F.lit(1)).alias("c")
        ),
    )
    uni = counts.filter(F.col("isbg") == 0).select(
        F.col("k").alias("w"), F.col("c").alias("wc")
    )
    big = (
        counts.filter(F.col("isbg") == 1)
        .filter(F.col("c") >= PMI_MIN_COUNT)
        .select(
            F.split("k", " ")[0].alias("w1"),
            F.split("k", " ")[1].alias("w2"),
            F.col("c").alias("bc"),
        )
    )
    t1 = uni.agg(F.sum("wc").alias("t1"))
    t2 = big.agg(F.sum("bc").alias("t2"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("wc").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("wc").alias("c2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "w1",
            "w2",
            F.col("bc").cast("bigint").alias("pair_count"),
            F.round(
                (F.col("bc") / F.col("t2"))
                / ((F.col("c1") / F.col("t1")) * (F.col("c2") / F.col("t1"))),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("w1"), F.asc("w2")
    ).limit(PMI_TOP_K)


BIGRAM_PMI_SQL = (
    "WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),"
    " uni AS (SELECT unnest(t) AS w FROM toks),"
    " uc AS (SELECT w, COUNT(*) AS wc FROM uni GROUP BY w),"
    " bg AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),"
    "   i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS bg FROM toks),"
    " bc AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS bc FROM bg"
    f"  GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_COUNT}),"
    " t1 AS (SELECT CAST(SUM(wc) AS DOUBLE) AS t1 FROM uc),"
    " t2 AS (SELECT CAST(SUM(bc) AS DOUBLE) AS t2 FROM bc)"
    " SELECT bc.w1, bc.w2, CAST(bc.bc AS BIGINT) AS pair_count,"
    " ROUND((bc.bc / t2.t2) /"
    "  ((u1.wc / t1.t1) * (u2.wc / t1.t1)), 6) AS lift"
    " FROM bc JOIN uc u1 ON u1.w = bc.w1"
    "  JOIN uc u2 ON u2.w = bc.w2, t1, t2"
    " ORDER BY lift DESC, bc.w1 ASC, bc.w2 ASC"
    f" LIMIT {PMI_TOP_K}"
)


# ---------------------------------------------------------------------------
# SCD Type-2 history (versioned dimension from an append-only log)
# ---------------------------------------------------------------------------


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn each customer's order
    stream into versioned rows with [valid_from, valid_to) ranges and
    a current flag — the warehouse-standard historization that
    ``cdc_latest_state`` (type 1, latest-wins) discards.

    One shuffle on the entity key; validity ranges come from lead()
    over the same partitioning; the open version's valid_to is NULL
    (rendered as a far-future sentinel — within pandas' ns range —
    so the cross-engine hash is well-defined).  At 100 TB this runs incrementally: new changes
    only reopen each entity's latest version, never the full
    history."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_totalprice").alias("state_price"),
        F.col("o_orderkey").alias("version_key"),
    )
    w = Window.partitionBy("custkey").orderBy("valid_from", "version_key")
    return o.select(
        "custkey",
        F.row_number().over(w).cast("bigint").alias("version"),
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(w),
            F.lit("2200-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("valid_to"),
        "state_price",
        (F.lead("valid_from").over(w).isNull()).alias("is_current"),
    )


SCD2_CUSTOMER_HISTORY_SQL = (
    "SELECT o_custkey AS custkey,"
    " CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,"
    " o_orderdate AS valid_from,"
    " COALESCE(LEAD(o_orderdate) OVER w,"
    "  TIMESTAMP '2200-01-01 00:00:00') AS valid_to,"
    " o_totalprice AS state_price,"
    " LEAD(o_orderdate) OVER w IS NULL AS is_current"
    " FROM orders"
    " WINDOW w AS (PARTITION BY o_custkey"
    "  ORDER BY o_orderdate, o_orderkey)"
)


# ---------------------------------------------------------------------------
# Sample packing (training-row assembly)
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 512


def sample_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sample packing: documents are laid out in a
    deterministic order within each source shard and assigned to
    fixed-token-budget training rows (bins) by a running token cumsum
    — how short documents get packed into full-length training
    sequences without padding waste.

    bin = (cumsum_before_doc) div budget: whole documents never split,
    so a bin may overflow by less than one document (the standard
    whole-sample packing tradeoff; split-packing would chunk first via
    doc_chunks).  One shuffle on the shard key; the per-shard window
    order is (doc_id) so the layout is partitioning-independent.  At
    100 TB packing runs per shard/source exactly like this — a global
    packing order would serialize the corpus for no training
    benefit."""
    docs = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return docs.select(
        "source",
        "doc_id",
        "n_tokens",
        (before / PACK_BUDGET_TOKENS).cast("bigint").alias("bin_id"),
        (before % PACK_BUDGET_TOKENS).cast("bigint").alias("offset_in_bin"),
    )


SAMPLE_PACKING_SQL = (
    "WITH d AS (SELECT source, doc_id,"
    " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens"
    " FROM documents),"
    " c AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY source"
    "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
    "  0) AS before FROM d)"
    " SELECT source, doc_id, n_tokens,"
    f" CAST(before // {PACK_BUDGET_TOKENS} AS BIGINT) AS bin_id,"
    f" CAST(before % {PACK_BUDGET_TOKENS} AS BIGINT) AS offset_in_bin"
    " FROM c"
)


# ---------------------------------------------------------------------------
# Deterministic stratified k-fold assignment
# ---------------------------------------------------------------------------

KFOLD_K = 5


def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold split assignment with per-stratum balance
    accounting — the train/eval split primitive: every document gets a
    stable fold from a hash of its id (NOT df.randomSplit, whose
    assignment changes with partitioning and re-runs), and the output
    reports per (source, fold) counts plus each stratum's imbalance
    ratio so a skewed split fails review before training does.

    Within each source stratum the fold is rank-based — row_number by
    (md5(doc_id), doc_id) mod K per stratum — so folds are balanced to
    ±1 document PER STRATUM by construction, not just in expectation
    (pure hash-mod assignment drifts several % on small strata).  The
    per-stratum window is the only shuffle and partitions by source;
    at 100 TB the same plan holds because window cost is per-stratum.

    Emits (source, fold, n_docs, sum_chars, stratum_imbalance) where
    stratum_imbalance = (max-min fold count within the stratum) — 0
    or 1 by construction, asserted in pytest."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    folds = docs.select(
        "source",
        "n_chars",
        ((F.row_number().over(w) - 1) % KFOLD_K).cast("bigint").alias(
            "fold"
        ),
    )
    counts = folds.groupBy("source", "fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    wsrc = Window.partitionBy("source")
    return counts.select(
        "source",
        "fold",
        "n_docs",
        "sum_chars",
        (
            F.max("n_docs").over(wsrc) - F.min("n_docs").over(wsrc)
        ).cast("bigint").alias("stratum_imbalance"),
    )


STRATIFIED_KFOLD_SQL = (
    "WITH folds AS (SELECT source, n_chars,"
    " CAST((ROW_NUMBER() OVER (PARTITION BY source"
    "  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)"
    f"  % {KFOLD_K} AS BIGINT) AS fold"
    " FROM documents),"
    " counts AS (SELECT source, fold, COUNT(*) AS n_docs,"
    "  CAST(SUM(n_chars) AS BIGINT) AS sum_chars"
    "  FROM folds GROUP BY source, fold)"
    " SELECT source, fold, n_docs, sum_chars,"
    " CAST(MAX(n_docs) OVER (PARTITION BY source)"
    "  - MIN(n_docs) OVER (PARTITION BY source) AS BIGINT)"
    "  AS stratum_imbalance"
    " FROM counts"
)
