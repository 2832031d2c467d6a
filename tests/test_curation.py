"""Invariant tests for the curation operators — properties that must
hold for ANY corpus, complementing the oracle-parity checks (which pin
one fixture): chunk coverage/reconstruction, normalization idempotence,
compaction uniqueness, mix-rate bounds, decontamination sanity."""

from pyspark.sql import functions as F

from smile_spark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_W,
    DECON_PROBE_PCT,
    cdc_latest_state,
    decontaminate,
    doc_chunks,
    source_temperature_mix,
    text_normalize,
)
from smile_spark.tables import table


def test_doc_chunks_cover_every_token(spark, sf_dir):
    """Every token position of every document falls inside at least one
    chunk, chunk starts are stride-aligned, and lengths are bounded."""
    chunks = doc_chunks(spark, sf_dir)
    bad_align = chunks.filter(
        (F.col("start_tok") % CHUNK_STRIDE != 0)
        | (F.col("chunk_len") < 1)
        | (F.col("chunk_len") > CHUNK_W)
    )
    assert bad_align.isEmpty()
    # coverage: the last chunk of each doc must reach the doc's end
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")
    )
    last = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("chunk_len")).alias("covered")
    )
    gaps = last.join(docs, "doc_id").filter(F.col("covered") != F.col("n"))
    assert gaps.isEmpty()


def test_doc_chunks_reconstruct_text(spark, sf_dir):
    """Concatenating each chunk's first CHUNK_STRIDE tokens (the
    non-overlapping prefix) reproduces the original token stream."""
    chunks = doc_chunks(spark, sf_dir).select(
        "doc_id",
        "chunk_idx",
        F.slice(F.split("chunk_text", " "), 1, CHUNK_STRIDE).alias("head"),
    )
    rebuilt = chunks.groupBy("doc_id").agg(
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "head"))
                    ),
                    lambda s: s.head,
                )
            ),
            " ",
        ).alias("rebuilt")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    mismatch = rebuilt.join(docs, "doc_id").filter(
        F.col("rebuilt") != F.col("text")
    )
    assert mismatch.isEmpty()


def test_text_normalize_idempotent(spark, sf_dir):
    """Normalization must be a projection: applying the same transform
    to its own output changes nothing."""
    norm = text_normalize(spark, sf_dir)
    renorm = norm.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("norm_text"), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        ).alias("again"),
        "norm_text",
    )
    assert renorm.filter(F.col("again") != F.col("norm_text")).isEmpty()


def test_cdc_latest_state_unique_and_maximal(spark, sf_dir):
    """One row per user, and its timestamp is that user's max."""
    latest = cdc_latest_state(spark, sf_dir)
    assert latest.groupBy("user_id").count().filter("count > 1").isEmpty()
    ev_max = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("max_ts"))
    )
    assert (
        latest.join(ev_max, "user_id")
        .filter(F.col("last_ts") != F.col("max_ts"))
        .isEmpty()
    )


def test_temperature_mix_bounds(spark, sf_dir):
    """Keep rates in [1, 100]; kept counts never exceed totals; the
    smallest source keeps (close to) everything."""
    mix = source_temperature_mix(spark, sf_dir).collect()
    assert mix, "mix produced no sources"
    for r in mix:
        assert 1 <= r.keep_pct <= 100
        assert 0 < r.n_kept <= r.n_total
    smallest = min(mix, key=lambda r: r.n_total)
    assert smallest.keep_pct == 100


def test_decontaminate_sanity(spark, sf_dir):
    """Probe documents are never flagged; ratios lie in (0, 1]."""
    flagged = decontaminate(spark, sf_dir)
    assert flagged.filter(
        F.col("doc_id") % 100 < DECON_PROBE_PCT
    ).isEmpty()
    assert flagged.filter(
        (F.col("overlap_ratio") <= 0) | (F.col("overlap_ratio") > 1)
    ).isEmpty()
    assert flagged.filter(F.col("n_overlap") > F.col("n_grams")).isEmpty()


def test_pii_redact_count_matches_redaction_on_emails(spark):
    """The redaction count and the regexp_replace must use the SAME
    effective pattern.  Regression: interpolating PII_EMAIL_RE into an
    F.expr string literal let SQL escape-processing turn '\\.' into
    '.', so 'a@b co' (no dot-TLD) counted as an email while the
    replacement correctly left it alone.  Counts are recomputed here
    from the redacted text: n_redactions must equal the number of
    placeholders actually inserted."""
    from smile_spark.operators.curation import PII_EMAIL_RE, PII_NUM_RE

    rows = [
        ("e1", "contact bob@example.com or 555 1234"),
        ("e2", "not-an-email a@bXco zz"),          # no dot TLD → 0 emails
        ("e3", "a@b.co plus ids 42 and 7 and 10"),
        ("e4", "nothing to redact here"),
        ("e5", "two mails x@y.org z@w.net 99"),
    ]
    df = spark.createDataFrame(rows, "event_id string, props string")
    n_email = F.regexp_count("props", F.lit(PII_EMAIL_RE))
    red = F.regexp_replace("props", PII_EMAIL_RE, "<EMAIL>")
    n_num = F.regexp_count(red, F.lit(PII_NUM_RE))
    out = df.select(
        "event_id",
        F.regexp_replace(red, PII_NUM_RE, "<NUM>").alias("t"),
        (n_email + n_num).cast("bigint").alias("n"),
        F.regexp_count(
            F.regexp_replace(red, PII_NUM_RE, "<NUM>"),
            F.lit("<EMAIL>|<NUM>"),
        ).cast("bigint").alias("n_placeholders"),
    ).collect()
    got = {r["event_id"]: (r["t"], r["n"], r["n_placeholders"]) for r in out}
    assert got["e2"][0] == "not-an-email a@bXco zz"
    assert got["e2"][1] == 0
    assert got["e4"][1] == 0
    for eid, (_, n, n_ph) in got.items():
        assert n == n_ph, (eid, got[eid])
