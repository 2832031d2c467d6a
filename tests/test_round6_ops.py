"""Invariant tests for the round-6 operators (oracle parity is covered
by tests/test_parity.py via their oracle_sql() registrations)."""

from pyspark.sql import functions as F

from smile_spark.tables import table


def test_srp_recall_against_brute_force(spark, sf_dir):
    """Multiprobe SRP must recover a meaningful fraction of the true
    top-k: hamming<=2 probing over 8 bits scores ~15% of the corpus,
    and random-hyperplane collision probability concentrates near
    neighbors, so recall@10 should beat the ~0.15 random-candidate
    floor by a wide margin."""
    from smile_spark.operators.similarity import (
        TOP_K,
        ann_cosine_topk,
        srp_lsh_topk,
    )

    truth = {
        (r.qid, r.vec_id) for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    got = {(r.qid, r.vec_id) for r in srp_lsh_topk(spark, sf_dir).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, recall
    # scores of returned pairs must equal the brute-force scores
    bf = {
        (r.qid, r.vec_id): r.cos_r
        for r in ann_cosine_topk(spark, sf_dir, k=10**9).collect()
    }
    for r in srp_lsh_topk(spark, sf_dir).collect():
        assert bf[(r.qid, r.vec_id)] == r.cos_r
        assert 1 <= r.rn <= TOP_K


def test_srp_buckets_are_deterministic(spark, sf_dir):
    """Two independent evaluations of the bucket expression must agree
    exactly (the DECIMAL-fold signs cannot depend on partitioning)."""
    from smile_spark.operators.similarity import (
        _srp_bucket_expr,
        _vectors,
    )

    emb = _vectors(spark, sf_dir)
    a = {
        r.vec_id: r.bkt
        for r in emb.select(
            "vec_id", F.expr(_srp_bucket_expr()).alias("bkt")
        ).collect()
    }
    b = {
        r.vec_id: r.bkt
        for r in emb.repartition(7)
        .select("vec_id", F.expr(_srp_bucket_expr()).alias("bkt"))
        .collect()
    }
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_sliding_distinct_matches_naive_window(spark, sf_dir):
    """The bitmap-merged trailing-7-day NDV must equal a naive
    per-anchor COUNT(DISTINCT) over the same range."""
    from smile_spark.operators.windows import (
        SLIDE_DAYS,
        sliding_distinct_users,
    )

    got = {
        r.day: (r.n_users_1d, r.n_users_7d)
        for r in sliding_distinct_users(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    days = [r.day for r in ev.select("day").distinct().collect()]
    assert set(days) == set(got)
    rows = ev.collect()
    for day in days:
        naive_1d = len({r.user_id for r in rows if r.day == day})
        naive_7d = len(
            {
                r.user_id
                for r in rows
                if 0 <= (day - r.day).days < SLIDE_DAYS
            }
        )
        assert got[day] == (naive_1d, naive_7d), day


def test_bigram_fluency_bounds_and_coverage(spark, sf_dir):
    """Scores are valid probabilities; every multi-token document is
    scored; bigram counts reconcile with token counts."""
    from smile_spark.operators.text import bigram_lm_fluency

    docs = table(spark, sf_dir, "documents")
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    rows = bigram_lm_fluency(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == {
        d for d, n in n_tok.items() if n >= 2
    }
    for r in rows:
        assert 0.0 < r.fluency <= 1.0, r
        assert r.n_bigrams == n_tok[r.doc_id] - 1, r


def test_session_path_topk_consistent_with_sessionize(spark, sf_dir):
    """Total sessions across paths == sessionize's session count, and
    each path's event count matches its session's n_events."""
    from smile_spark.operators.behavior import (
        session_path_topk,
        sessionize,
    )

    n_sessions = sessionize(spark, sf_dir).count()
    rows = session_path_topk(spark, sf_dir, k=10**9).collect()
    assert sum(r.n_sessions for r in rows) == n_sessions
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_embedding_outliers_quantile_contract(spark, sf_dir):
    """Outlier fraction is ~OUTLIER_Q (strict-less threshold, so at
    most q·n and within one interpolation step below), every vector is
    scored, and cosines are valid."""
    from smile_spark.operators.similarity import (
        OUTLIER_Q,
        embedding_outliers,
        _vectors,
    )

    rows = embedding_outliers(spark, sf_dir).collect()
    n = _vectors(spark, sf_dir).count()
    assert len(rows) == n
    n_out = sum(r.is_outlier for r in rows)
    assert n_out <= OUTLIER_Q * n + 1
    assert n_out >= OUTLIER_Q * n - 2
    for r in rows:
        assert -1.000001 <= r.cos_c <= 1.000001


def test_real_codecs_parse_and_validate():
    """The numpy codecs are real parsers: valid payloads round-trip,
    malformed payloads raise (magic, header, chunk, length checks)."""
    import numpy as np
    import pytest

    from smile_spark.operators.multimodal import (
        _aud_sample,
        _encode_pgm,
        _encode_wav,
        decode_image,
        resample_audio,
        sample_video_frames,
    )

    w, h, pix = decode_image(_encode_pgm(7, 20, 10))
    assert (w, h) == (20, 10) and pix.shape == (10, 20)
    assert int(pix[0, 0]) == (7 * 31) % 256
    assert int(pix[0, 1]) == (7 * 31 + 7) % 256

    rate, s = resample_audio(_encode_wav(5), rate=8_000)
    n = 256 + 5 % 256
    assert rate == 8_000 and len(s) == (n + 1) // 2
    assert int(s[0]) == _aud_sample(5, 0)
    # stride-2 decimation: resampled[1] is source sample 2
    assert int(s[1]) == _aud_sample(5, 2)
    full_rate, full = resample_audio(_encode_wav(5), rate=16_000)
    assert full_rate == 16_000 and len(full) == n

    stream = b"".join(_encode_pgm(3, 8, 4, salt=97 * f) for f in range(3))
    frames = sample_video_frames(stream, every_n=2)
    assert len(frames) == 2  # frames 0 and 2
    assert int(frames[1][2][0, 0]) == (3 * 31 + 97 * 2) % 256

    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n" + bytes(12))  # wrong magic
    with pytest.raises(ValueError):
        decode_image(b"P5\n4 4\n255\n" + bytes(3))  # short raster
    with pytest.raises(ValueError):
        resample_audio(b"RIFX" + bytes(40))  # wrong container magic
    with pytest.raises(ValueError):
        sample_video_frames(b"JUNK")  # bad frame magic


# --- property-based codec tests (pure Python — no Spark session) ---------


def test_pgm_roundtrip_property():
    """Any (w, h, pixels) encodes to a PGM the parser inverts exactly,
    including whitespace-variant headers a foreign encoder might
    write."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smile_spark.operators.multimodal import decode_image

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 64),
        st.integers(1, 64),
        st.integers(0, 2**32 - 1),
    )
    def roundtrip(w, h, seed):
        rng = np.random.default_rng(seed)
        pix = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        for header in (
            f"P5\n{w} {h}\n255\n",
            f"P5 {w} {h} 255 ",   # single-space separators
            f"P5\n{w}\n{h}\n255\n",
        ):
            dw, dh, dp = decode_image(header.encode() + pix.tobytes())
            assert (dw, dh) == (w, h)
            assert (dp == pix).all()

    roundtrip()


def test_wav_roundtrip_property():
    """Any PCM16 sample vector round-trips through the RIFF writer and
    chunk-walking parser, with chunk order and junk chunks tolerated."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smile_spark.operators.multimodal import resample_audio

    def wav(samples: "np.ndarray", rate: int, junk_first: bool) -> bytes:
        data = samples.astype("<i2").tobytes()
        fmt = (
            (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        junk = b"JUNK" + (3).to_bytes(4, "little") + b"xyz" + b"\x00"
        chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        chunks += b"data" + len(data).to_bytes(4, "little") + data
        chunks += b"\x00" if len(data) % 2 else b""
        body = (junk + chunks) if junk_first else (chunks + junk)
        return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
        st.booleans(),
    )
    def roundtrip(vals, junk_first):
        s = np.array(vals, dtype="<i2")
        rate, out = resample_audio(wav(s, 16_000, junk_first), rate=16_000)
        assert rate == 16_000 and (out == s).all()
        rate2, out2 = resample_audio(wav(s, 16_000, junk_first), rate=8_000)
        assert rate2 == 8_000 and (out2 == s[::2]).all()

    roundtrip()


def test_pgm_stream_sampler_property():
    """Any sequence of variable-dimension frames is sampled at exactly
    the every_n stride with per-frame content preserved."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smile_spark.operators.multimodal import sample_video_frames

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 16), st.integers(1, 16)),
            min_size=1,
            max_size=8,
        ),
        st.integers(1, 4),
        st.integers(0, 2**32 - 1),
    )
    def roundtrip(dims, every_n, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            for w, h in dims
        ]
        stream = b"".join(
            f"P5\n{p.shape[1]} {p.shape[0]}\n255\n".encode() + p.tobytes()
            for p in frames
        )
        got = sample_video_frames(stream, every_n=every_n)
        want = frames[::every_n]
        assert len(got) == len(want)
        for (w, h, gp), wp in zip(got, want):
            assert (h, w) == wp.shape
            assert (gp == wp).all()

    roundtrip()


def test_revenue_concentration_matches_bruteforce(spark, sf_dir):
    """Third-opinion check: the DECIMAL rank-sum Gini and top-k shares
    must match a collected pure-Python recomputation (both engines
    share the SQL formulas, so a shared formula bug would pass the
    oracle — this pins the intent)."""
    from decimal import Decimal

    from smile_spark.operators.analytics import (
        CONC_TOPS,
        revenue_concentration,
    )

    row = revenue_concentration(spark, sf_dir).collect()[0]
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    rev = {}
    for r in orders:
        rev[r.o_custkey] = rev.get(r.o_custkey, Decimal(0)) + Decimal(
            str(r.o_totalprice)
        ).quantize(Decimal("0.01"))
    vals = [v for _, v in sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(vals)
    total = sum(vals)
    assert row.n_customers == n
    import math

    for p in CONC_TOPS:
        k = math.ceil(n * p / 100.0)
        share = float(sum(vals[n - k:])) / float(total)
        assert abs(getattr(row, f"top{p}_share") - share) < 1e-6, p
    gini = 2.0 * float(
        sum(Decimal(i + 1) * v for i, v in enumerate(vals))
    ) / (n * float(total)) - (n + 1) / n
    assert abs(row.gini - gini) < 1e-6
