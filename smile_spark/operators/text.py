"""Text-analysis operators (north-star extension; the reference has no
string functions at all — SURVEY.md §2.2).

All operators are pure JVM-side column expressions (no Python UDFs):
at 100 TB these run inside whole-stage codegen over the parquet scan,
so throughput is bounded by I/O, not by a Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.tables import fan_out, table

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# language marker words → predicted language; the fixture texts are
# synthetic English-vocabulary soup, so the interesting property is the
# deterministic scoring, not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "la", "que", "los"),
    "fr": ("le", "la", "et", "les"),
}

# BPE-ish token pattern: word pieces, digit runs, single punctuation.
# Kept to a dialect-portable subset (same semantics in Java regex and
# RE2/DuckDB).
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

ROLLING_MOD = 1_000_000_007


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics: token counts, average token
    length, stopword ratio, and a composite quality score.

    The shape is scan → explode(tokens) → groupBy(doc) — one shuffle
    keyed by doc_id; all scoring arithmetic is integer/exact until the
    final ratios.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    # Punctuation is counted per TOKEN and summed: splitting on spaces
    # preserves every non-space character, so Σ punct(tok) == punct
    # chars of the document — and the regexp runs on short token rows
    # (which exist anyway) instead of re-running over the full text
    # once per exploded row (expressions in the projection around a
    # generator are evaluated per OUTPUT row — measured 20× slower).
    per_doc = toks.groupBy("doc_id", "n_chars_calc").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("tok")).alias("tok_chars"),
        F.sum(
            F.length("tok")
            - F.length(F.regexp_replace("tok", "[^a-zA-Z0-9 ]", ""))
        ).alias("n_punct"),
        F.sum(
            F.when(F.col("tok").isin(*STOPWORDS), 1).otherwise(0)
        ).alias("n_stopwords"),
    )
    stats = per_doc.select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        (F.col("tok_chars").cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
        (F.col("n_stopwords").cast("double") / F.col("n_tokens")).alias(
            "stopword_ratio"
        ),
        (F.col("n_punct").cast("double") / F.col("n_chars_calc")).alias(
            "punct_ratio"
        ),
    )
    # Composite quality band (filter-threshold style, not a learned
    # model): token length in a sane band, stopword ratio neither
    # zero nor dominant, punctuation bounded.  Deterministic integer
    # case arithmetic → identical across engines.
    quality = (
        F.when(F.col("avg_token_len").between(3.0, 10.0), 0.4).otherwise(0.1)
        + F.when(F.col("stopword_ratio").between(0.05, 0.6), 0.3).otherwise(0.1)
        + F.when(F.col("punct_ratio") < 0.2, 0.3).otherwise(0.1)
    )
    return stats.withColumn("quality_score", F.round(quality, 1))


TEXT_STATS_SQL = (
    "WITH toks AS ("
    "  SELECT doc_id, length(text) AS n_chars_calc, tok"
    "  FROM documents, unnest(string_split(text, ' ')) t(tok)),"
    " per_doc AS ("
    "  SELECT doc_id, n_chars_calc, COUNT(*) AS n_tokens,"
    "   SUM(length(tok)) AS tok_chars,"
    "   SUM(length(tok)"
    "    - length(regexp_replace(tok, '[^a-zA-Z0-9 ]', '', 'g')))"
    "    AS n_punct,"
    "   SUM(CASE WHEN tok IN ({stop}) THEN 1 ELSE 0 END) AS n_stopwords"
    "  FROM toks GROUP BY doc_id, n_chars_calc),"
    " stats AS ("
    "  SELECT doc_id, n_chars_calc, n_tokens,"
    "   CAST(tok_chars AS DOUBLE) / n_tokens AS avg_token_len,"
    "   CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,"
    "   CAST(n_punct AS DOUBLE) / n_chars_calc AS punct_ratio"
    "  FROM per_doc)"
    " SELECT doc_id, n_chars_calc, n_tokens, avg_token_len,"
    "  stopword_ratio, punct_ratio,"
    "  ROUND("
    "   (CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 0.4 ELSE 0.1 END)"
    "   + (CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6"
    "      THEN 0.3 ELSE 0.1 END)"
    "   + (CASE WHEN punct_ratio < 0.2 THEN 0.3 ELSE 0.1 END), 1)"
    "   AS quality_score"
    " FROM stats"
).format(stop=", ".join(f"'{s}'" for s in STOPWORDS))


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (whitespace words + BPE-ish pieces) — the
    cheap token-budget estimator a training pipeline runs over every
    document.  Pure codegen expressions; no shuffle at all (the result
    is row-parallel)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1)
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_PATTERN}', 0)"))
        .cast("bigint")
        .alias("regex_tokens"),
    )


TOKEN_COUNT_SQL = (
    "SELECT doc_id,"
    " CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"
    "  AS ws_tokens,"
    f" CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}', 0)) AS BIGINT)"
    "  AS regex_tokens"
    " FROM documents"
)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language over
    the token stream, predict the max-scoring language (ties broken by
    language code), with the score that won.

    Emits (doc_id, lang_pred, lang_score).  One explode + one groupBy;
    the per-language scores are conditional sums in a single aggregate,
    not one pass per language.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    scores = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("tok").isin(*words), 1).otherwise(0)
            ).alias(f"score_{lang}")
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    # argmax with deterministic tie-break on language code order
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None)
    for lang in reversed(langs):  # earlier lang wins ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(
            pred
        )
    return scores.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("bigint").alias("lang_score"),
    )


def lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ", ".join(
        "SUM(CASE WHEN tok IN ({w}) THEN 1 ELSE 0 END) AS score_{lang}".format(
            w=", ".join(f"'{x}'" for x in LANG_MARKERS[lang]), lang=lang
        )
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return (
        "WITH toks AS (SELECT doc_id, tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)),"
        f" scores AS (SELECT doc_id, {score_cols} FROM toks GROUP BY doc_id)"
        f" SELECT doc_id, {pred} AS lang_pred,"
        f" CAST({best} AS BIGINT) AS lang_score FROM scores"
    )


def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution entropy — the perplexity-proxy
    quality signal (low entropy = repetitive/boilerplate text, the
    docs a training pipeline down-weights before any model-based
    scoring).  Emits (doc_id, n_tokens, n_distinct, ttr, entropy):
    type-token ratio and Shannon entropy -Σ p·log2(p) over the
    token frequency distribution.

    Cross-engine determinism: each entropy term p·log2(p) is the
    IDENTICAL double expression in both engines, quantized to
    DECIMAL(18,12) per term so the per-group SUM is exact and
    order-independent (float summation order across engines is not) —
    the corr_stats moment discipline applied to an information
    measure.

    Shape: explode → (doc, token) count (map-side partial) → per-doc
    totals → term sum; the joined tables are vocabulary-sized, never
    corpus-text-sized, and there is no per-row Python anywhere.
    """
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("nd")
    )
    p = F.col("c") / F.col("n")  # bigint/bigint → double in both engines
    terms = (
        counts.join(totals, "doc_id")
        .select(
            "doc_id",
            "n",
            "nd",
            F.round(p * F.log2(p), 12).cast("decimal(18,12)").alias("term"),
        )
        .groupBy("doc_id", "n", "nd")
        .agg(F.sum("term").alias("tsum"))
    )
    return terms.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("nd").cast("bigint").alias("n_distinct"),
        F.round(F.col("nd") / F.col("n").cast("double"), 6).alias("ttr"),
        F.round(-F.col("tsum").cast("double"), 6).alias("entropy"),
    )


TOKEN_ENTROPY_SQL = (
    "WITH toks AS ("
    "  SELECT doc_id, tok FROM documents,"
    "  unnest(string_split(text, ' ')) t(tok)),"
    " counts AS (SELECT doc_id, tok, COUNT(*) AS c"
    "  FROM toks GROUP BY 1, 2),"
    " totals AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd"
    "  FROM counts GROUP BY 1),"
    " terms AS ("
    "  SELECT c.doc_id, t.n, t.nd,"
    "   CAST(ROUND((c.c / CAST(t.n AS DOUBLE))"
    "    * log2(c.c / CAST(t.n AS DOUBLE)), 12) AS DECIMAL(18,12))"
    "    AS term"
    "  FROM counts c JOIN totals t ON t.doc_id = c.doc_id),"
    " sums AS (SELECT doc_id, n, nd, SUM(term) AS tsum"
    "  FROM terms GROUP BY 1, 2, 3)"
    " SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,"
    "  CAST(nd AS BIGINT) AS n_distinct,"
    "  ROUND(nd / CAST(n AS DOUBLE), 6) AS ttr,"
    "  ROUND(-CAST(tsum AS DOUBLE), 6) AS entropy"
    " FROM sums"
)


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 content hash + a rolling polynomial
    hash (Rabin-Karp-style, base 31 mod 1e9+7) computed as a fold over
    character codes — the per-char loop stays JVM-side via the
    higher-order ``aggregate`` expression, no Python in the path."""
    # per-char fold = ~300× expansion in work per row; partition for it
    docs = fan_out(table(spark, sf_dir, "documents"))
    roll = (
        "aggregate(sequence(1, length(text)), cast(0 as bigint),"
        f" (acc, i) -> (acc * 31 + ascii(substr(text, i, 1))) % {ROLLING_MOD})"
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.expr(roll).alias("rolling_hash"),
    )


FINGERPRINT_SQL = (
    "SELECT doc_id, md5(text) AS content_md5,"
    " list_reduce("
    "  list_prepend(CAST(0 AS BIGINT),"
    "   list_transform(generate_series(1, length(text)),"
    "    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),"
    f"  (acc, c) -> (acc * 31 + c) % {ROLLING_MOD}) AS rolling_hash"
    " FROM documents"
)


TFIDF_TOP_K = 30
TFIDF_ROUND = 6


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: the top-k most distinctive (term, doc) pairs.

    tf = in-document term count, idf = ln(N / df) over distinct-doc
    term frequency; score rounds to 6 digits before ranking (ln is the
    one libm call — both engines are correctly-rounded enough at 6
    digits, the same treatment as the math_functions family).  Two
    shuffles total: (doc_id, tok) count and tok-keyed df join; N is a
    broadcast 1-row aggregate folded into the same plan (no separate
    driver-side count() job); the global top-k is
    TakeOrderedAndProject.  This is the vector-space relevance
    primitive behind keyword extraction / BM25-lite."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs")
    )
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")),
                TFIDF_ROUND,
            ).alias("tfidf"),
        )
    )
    return scored.orderBy(
        F.desc("tfidf"), F.asc("doc_id"), F.asc("tok")
    ).limit(TFIDF_TOP_K)


def tfidf_top_terms_sql() -> str:
    return (
        "WITH toks AS (SELECT doc_id, tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)),"
        " tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks"
        "  GROUP BY doc_id, tok),"
        " df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),"
        " n AS (SELECT COUNT(*) AS n_docs FROM documents),"
        " scored AS (SELECT doc_id, tf.tok AS tok, tf, df,"
        f"  ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), {TFIDF_ROUND})"
        "   AS tfidf"
        "  FROM tf JOIN df ON tf.tok = df.tok, n)"
        " SELECT doc_id, tok, tf, df, tfidf FROM scored"
        f" ORDER BY tfidf DESC, doc_id ASC, tok ASC LIMIT {TFIDF_TOP_K}"
    )


# ---------------------------------------------------------------------------
# Fuzzy string-match join (blocked edit distance)
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 3


def fuzzy_name_match(spark, sf_dir: str) -> DataFrame:
    """Part-name pairs within edit distance ≤ 3, BLOCKED by brand —
    the entity-resolution join shape: a cheap equi-join on a blocking
    key bounds the quadratic levenshtein work to within-block pairs
    (≈ n²/#blocks), the exact distance filters the residue.  With no
    natural block, the standard blocking keys are length buckets,
    first-char, phonetic codes, or the q-gram inverted lists
    ngram_jaccard_topk builds.  levenshtein() is identical classic
    edit distance on both engines (ASCII here; grapheme semantics can
    differ on exotic unicode)."""
    from pyspark.sql import functions as F

    from smile_spark.tables import table

    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
    )
    # the input is kilobytes but the pair set explodes ~n²/#blocks:
    # fan the PROBE side out BEFORE the join (the block table stays
    # broadcast), so pair generation + levenshtein run across the full
    # parallelism in one stage — no wide pair shuffle, no single-task
    # explosion (input-byte partitioning put the whole blow-up on one
    # core: measured 12.7s → ~1s at sf0.1)
    a = fan_out(
        p.select(
            "brand", F.col("pk").alias("pk_a"), F.col("name").alias("name_a")
        )
    )
    b = p.select("brand", F.col("pk").alias("pk_b"), F.col("name").alias("name_b"))
    return (
        a.join(F.broadcast(b), "brand")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .filter(F.col("name_a") != F.col("name_b"))
        # length pre-filter: |len(a)-len(b)| > k implies dist > k —
        # prunes before the expensive distance at ~zero cost
        .filter(
            F.abs(F.length("name_a") - F.length("name_b"))
            <= FUZZY_MAX_DIST
        )
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("bigint")
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("brand", "pk_a", "pk_b", "name_a", "name_b", "dist")
    )


FUZZY_NAME_MATCH_SQL = (
    "SELECT a.p_brand AS brand, a.p_partkey AS pk_a, b.p_partkey AS pk_b,"
    " a.p_name AS name_a, b.p_name AS name_b,"
    " CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist"
    " FROM part a JOIN part b ON a.p_brand = b.p_brand"
    "  AND a.p_partkey < b.p_partkey AND a.p_name <> b.p_name"
    f" WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}"
)


# ---------------------------------------------------------------------------
# Vocabulary coverage (tokenizer design metric)
# ---------------------------------------------------------------------------

VOCAB_SIZES = (100, 500, 1000)


def vocab_coverage(spark, sf_dir: str) -> DataFrame:
    """For candidate vocabulary sizes V: what fraction of all token
    OCCURRENCES is covered by the top-V most frequent types — the
    truncation-loss curve behind vocabulary-size decisions.

    One token-count aggregate; the denominator is a separate total
    over the full type table; ranks only exist on the top-max(V) slice.
    Scale shape: coverage at V ∈ VOCAB_SIZES only needs the top
    max(V) types, so the global order is `orderBy(...).limit(max(V))`
    — TakeOrderedAndProject, every partition ships ≤ max(V) rows to
    the driver-side heap — and the rank window runs over that ≤1000-row
    result where a partition-less window is free.  A web-scale corpus
    has 10⁸–10⁹ distinct types (typos, URLs, code); ranking them all
    in one window task (the previous form) would single-task-sort a
    billion rows.  Both subtrees (total, top-V) hang off the same
    token-count aggregate, so Spark's ReusedExchange serves both from
    one shuffle.  Ranking ties break alphabetically so both engines
    pick the same top-V set.  Fractions are quotients of exact counts,
    rounded to 6."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from smile_spark.tables import fan_out, table

    toks = fan_out(table(spark, sf_dir, "documents")).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    top = counts.orderBy(F.desc("c"), F.asc("tok")).limit(max(VOCAB_SIZES))
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = top.withColumn("r", F.row_number().over(w))
    # one plan: explode the candidate V set against the ≤1000-row
    # ranked slice (≤ |V|·max(V) rows), aggregate per V — a single
    # window + a trivial final shuffle instead of |V| union branches
    sizes = F.explode(
        F.array(*[F.lit(v).cast("bigint") for v in VOCAB_SIZES])
    ).alias("vocab_size")
    return (
        ranked.crossJoin(F.broadcast(total))
        .select("r", "c", "t", sizes)
        .groupBy("vocab_size")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("r") <= F.col("vocab_size"), F.col("c"))
                    .otherwise(0)
                )
                / F.first("t"),
                6,
            ).alias("coverage"),
        )
    )


def vocab_coverage_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT CAST({v} AS BIGINT) AS vocab_size,"
        f" ROUND(SUM(CASE WHEN r <= {v} THEN c ELSE 0 END)"
        "  / CAST((SELECT SUM(c) FROM ranked) AS DOUBLE), 6) AS coverage"
        " FROM ranked"
        for v in VOCAB_SIZES
    )
    return (
        "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok"
        "  FROM documents),"
        " counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),"
        " ranked AS (SELECT c, ROW_NUMBER() OVER"
        "  (ORDER BY c DESC, tok ASC) AS r FROM counts)"
        f" {selects}"
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_TERMS = ("scan", "merge", "window")
BM25_TOP_K = 15


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval for a fixed query term set — the
    search-engine relevance function proper (Robertson & Zaragoza),
    the saturating upgrade of tfidf_top_terms: tf gains diminish past
    k1 and long documents are penalized by b·dl/avgdl.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Determinism: tf/df/dl are integers, avgdl and every per-term score
    evaluate as the IDENTICAL double expression on both engines (ln is
    the one libm call — the tfidf treatment), each term's contribution
    quantizes to DECIMAL(18,12) so the per-doc sum over query terms is
    order-independent, and the final score rounds to 6 digits before
    ranking.

    Plan: the tf table filters to the QUERY TERMS before any join —
    at 100 TB the posting-list fetch touches |q| terms' rows, never
    the corpus vocabulary; doc lengths are one doc-keyed aggregate
    (computed anyway by any quality pass); N/avgdl are broadcast
    1-row aggregates; top-k is TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    tf_q = (
        toks.filter(F.expr(f"tok IN ({terms})"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_q = tf_q.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    ).select(
        (F.col("sum_dl") / F.col("n_docs").cast("double")).alias("avgdl"),
        F.col("n_docs").cast("double").alias("n_docs"),
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1
        * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf_q.join(F.broadcast(df_q), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_part, 12).cast("decimal(18,12)").alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("c"), 6).cast("double").alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOP_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "doc_id", "score", F.col("rn").cast("bigint").alias("rn")
    )


def bm25_topk_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return (
        "WITH toks AS (SELECT doc_id, tok FROM documents,"
        " unnest(string_split(text, ' ')) t(tok)),"
        f" tf_q AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks"
        f"  WHERE tok IN ({terms}) GROUP BY doc_id, tok),"
        " df_q AS (SELECT tok, COUNT(*) AS df FROM tf_q GROUP BY tok),"
        " dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),"
        " stats AS (SELECT SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl,"
        "  CAST(COUNT(*) AS DOUBLE) AS n_docs FROM dl),"
        " contrib AS (SELECT tf_q.doc_id,"
        "  CAST(ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
        f"   * (tf * ({BM25_K1} + 1)) / (tf + {BM25_K1}"
        f"    * (1 - {BM25_B} + {BM25_B} * dl / avgdl)), 12)"
        "   AS DECIMAL(18,12)) AS c"
        "  FROM tf_q JOIN df_q USING (tok) JOIN dl USING (doc_id)"
        "  CROSS JOIN stats),"
        " scored AS (SELECT doc_id,"
        "  CAST(ROUND(SUM(c), 6) AS DOUBLE) AS score"
        "  FROM contrib GROUP BY doc_id),"
        " ranked AS (SELECT doc_id, score, ROW_NUMBER() OVER"
        "  (ORDER BY score DESC, doc_id ASC) AS rn FROM scored)"
        f" SELECT doc_id, score, rn FROM ranked WHERE rn <= {BM25_TOP_K}"
    )


# ---------------------------------------------------------------------------
# Inverted-index vocabulary statistics
# ---------------------------------------------------------------------------


def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary table of an inverted index: per token, document
    frequency, collection frequency, posting-list span, and an md5
    FINGERPRINT of the full sorted posting list — the artifact a
    search/RAG pipeline materializes once and serves lookups from
    (bm25_topk reads conceptually from this).

    Hashing the posting list instead of emitting it keeps output rows
    O(vocabulary) while still pinning every posting byte-for-byte
    across engines (a lost or reordered doc id flips the md5) — the
    same fingerprint-not-payload trick as graph_check.

    Plan: one (doc_id, tok) count shuffle, one tok-keyed aggregate
    whose list state is per-token df-bounded.  At 100 TB boilerplate
    tokens make that state corpus-sized — production splits postings
    into fixed-size blocks (tok, block_no) and fingerprints per
    block; the fixture vocabulary needs no blocking."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.md5(
            F.expr(
                "array_join(transform(array_sort(collect_list(doc_id)),"
                " x -> cast(x as string)), ',')"
            )
        ).alias("postings_md5"),
    )


INVERTED_INDEX_STATS_SQL = (
    "WITH tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM documents,"
    " unnest(string_split(text, ' ')) t(tok) GROUP BY doc_id, tok)"
    " SELECT tok, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,"
    " MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,"
    " md5(array_to_string(list(doc_id ORDER BY doc_id), ','))"
    "  AS postings_md5"
    " FROM tf GROUP BY tok"
)


# ---------------------------------------------------------------------------
# Bigram language-model fluency scoring (add-one smoothed)
# ---------------------------------------------------------------------------


def bigram_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency score under a corpus-trained add-one
    smoothed bigram language model: the mean conditional probability
    p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) over the document's bigrams — a
    deterministic perplexity proxy, the classic KenLM-style quality
    signal a curation pipeline uses to down-rank disfluent/boilerplate
    text (log-free on purpose: libm ln differs across engines, exact
    integer-derived divisions do not — the bigram_pmi lift precedent).

    Scale shape: the bigram/unigram count tables are the trained LM —
    built once with map-side-combined groupBys (state ∝ vocabulary²
    observed, not corpus), persistable and reusable; scoring is two
    equi-joins of the doc's bigrams against those counts plus one
    single-row vocab broadcast.  At 100 TB the count tables join
    shuffle-side (vocabulary-keyed, heavy hitters are exactly the
    well-estimated bigrams) and each doc's cost ∝ its own length.

    Determinism: p is a division of exact integers (identical IEEE
    result), quantized to DECIMAL(24,12) per term so the per-doc sum
    is order-independent; the final mean rounds to 6.
    Emits (doc_id, n_bigrams, fluency)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    from pyspark.sql.window import Window

    wd = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("w2", F.lead("w").over(wd))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("w").alias("w1"), "w2")
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("w").alias("vsz"))
    p = (F.col("c12") + 1) / (F.col("c1") + F.col("vsz"))
    term = F.round(p, 12).cast("decimal(24,12)")
    return (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(term).alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("s").cast("double") / F.col("n_bigrams"), 6
            ).alias("fluency"),
        )
    )


BIGRAM_LM_FLUENCY_SQL = (
    "WITH toks AS (SELECT doc_id, i AS pos, w FROM ("
    "  SELECT doc_id, unnest(string_split(text, ' ')) AS w,"
    "   unnest(generate_series(1, len(string_split(text, ' ')))) AS i"
    "  FROM documents)),"
    " big AS (SELECT doc_id, w AS w1,"
    "  LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM toks"
    "  QUALIFY w2 IS NOT NULL),"
    " c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),"
    " c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),"
    " vocab AS (SELECT COUNT(DISTINCT w) AS vsz FROM toks)"
    " SELECT doc_id, COUNT(*) AS n_bigrams,"
    " ROUND(CAST(SUM(CAST(ROUND((c12.c12 + 1) / (c1.c1 + vsz), 12)"
    "  AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*), 6) AS fluency"
    " FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1)"
    " CROSS JOIN vocab"
    " GROUP BY doc_id"
)


# ---------------------------------------------------------------------------
# Keyphrase extraction (RAKE)
# ---------------------------------------------------------------------------

RAKE_STOPWORDS = ("the", "a")
RAKE_MAX_LEN = 4     # candidate phrases longer than this are discarded
RAKE_TOP_K = 3


def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``RAKE_TOP_K`` keyphrases per document by RAKE (Rose et
    al. 2010): candidate phrases are maximal stopword-free token runs
    (capped at ``RAKE_MAX_LEN`` words, the standard practice), each
    word scores deg(w)/freq(w) over the candidate-phrase corpus
    (deg counts co-occurrence mass: the summed length of every phrase
    occurrence containing w), and a phrase scores the sum of its
    words' scores — the metadata-enrichment pass a training-data
    pipeline runs to tag documents with salient phrases.

    All JVM-side: tokenization is one posexplode, run segmentation is
    the sessionize device (a running stopword count partitions each
    doc's token sequence into phrases with ZERO extra shuffle beyond
    the per-doc window), word statistics are vocabulary-bounded
    aggregates, and the per-doc top-k is a rank window.  Word scores
    quantize to DECIMAL(18,12) before the phrase sum (the
    token_entropy device) so scores are order-independent and
    hash-exact across engines; phrase ranking rounds to 6 digits,
    ties break on the phrase text.  Emits (doc_id, phrase, n_words,
    score, rn).
    """
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).withColumn("is_stop", F.expr(f"tok in ({stop_list})"))
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    words = (
        toks.withColumn("run", F.sum(F.col("is_stop").cast("int")).over(wrun))
        .filter(~F.col("is_stop"))
        .select("doc_id", "run", "pos", "tok")
    )
    phrases = (
        words.groupBy("doc_id", "run")
        .agg(
            F.count(F.lit(1)).alias("plen"),
            F.expr(
                "array_join(transform(array_sort("
                " collect_list(struct(pos, tok))), s -> s.tok), ' ')"
            ).alias("phrase"),
        )
        .filter(F.col("plen") <= RAKE_MAX_LEN)
    )
    pw = words.join(
        phrases.select("doc_id", "run", "plen"), ["doc_id", "run"]
    )
    wscore = (
        pw.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .select(
            "tok",
            F.round(F.col("deg").cast("double") / F.col("freq"), 12)
            .cast("decimal(18,12)")
            .alias("wscore"),
        )
    )
    pscore = (
        pw.join(F.broadcast(wscore), "tok")
        .groupBy("doc_id", "run")
        .agg(F.round(F.sum("wscore").cast("double"), 6).alias("score"))
    )
    res = phrases.join(pscore, ["doc_id", "run"])
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RAKE_TOP_K)
        .select(
            "doc_id",
            "phrase",
            F.col("plen").cast("bigint").alias("n_words"),
            "score",
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


def rake_keyphrases_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    return (
        "WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS ws"
        "  FROM documents),"
        " tk AS (SELECT doc_id, i, ws[i] AS tok FROM ("
        "  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i"
        "  FROM t0)),"
        " st AS (SELECT doc_id, i, tok,"
        f"  CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END AS s"
        "  FROM tk),"
        " rn AS (SELECT doc_id, i, tok, s,"
        "  SUM(s) OVER (PARTITION BY doc_id ORDER BY i) AS run FROM st),"
        " words AS (SELECT doc_id, run, i, tok FROM rn WHERE s = 0),"
        " ph AS (SELECT doc_id, run, COUNT(*) AS plen,"
        "  string_agg(tok, ' ' ORDER BY i) AS phrase"
        f"  FROM words GROUP BY 1, 2 HAVING COUNT(*) <= {RAKE_MAX_LEN}),"
        " pw AS (SELECT w.doc_id, w.run, w.tok, p.plen"
        "  FROM words w JOIN ph p USING (doc_id, run)),"
        " sc AS (SELECT tok,"
        "  CAST(ROUND(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 12)"
        "   AS DECIMAL(18,12)) AS wscore"
        "  FROM pw GROUP BY tok),"
        " ps AS (SELECT pw.doc_id, pw.run,"
        "  ROUND(CAST(SUM(sc.wscore) AS DOUBLE), 6) AS score"
        "  FROM pw JOIN sc USING (tok) GROUP BY 1, 2),"
        " res AS (SELECT ph.doc_id, ph.phrase, ph.plen, ps.score"
        "  FROM ph JOIN ps USING (doc_id, run)),"
        " ranked AS (SELECT doc_id, phrase, plen, score, ROW_NUMBER()"
        "  OVER (PARTITION BY doc_id ORDER BY score DESC, phrase ASC)"
        "  AS rn FROM res)"
        " SELECT doc_id, phrase, CAST(plen AS BIGINT) AS n_words,"
        f" score, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= {RAKE_TOP_K}"
    )
