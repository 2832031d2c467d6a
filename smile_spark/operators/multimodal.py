"""Multimodal column handling (north-star extension).

Images/audio/video are opaque ``binary`` payload columns with typed
metadata, processed by Arrow-batched pandas functions via
``mapInPandas`` — the only sane shape at 100 TB: payload bytes never
leave the executor, batches stream through Python with Arrow
zero-copy, and the output schema is declared so Catalyst can keep
pruning/pushdown around the UDF boundary.

The container has no PIL/ffmpeg, but numpy suffices for REAL codecs of
real formats: ``decode_image`` is a genuine binary-PGM (P5) parser,
``resample_audio`` a genuine RIFF/WAVE PCM16 chunk-walker +
integer-factor resampler, and ``sample_video_frames`` a frame sampler
over concatenated-PGM streams.  The ``multimodal_decode_*``
certificate queries synthesize valid payloads from doc_id arithmetic,
decode them with those parsers, and emit integer stats the DuckDB
oracle recomputes in closed form — so the decoders themselves sit
under the driver's hash gate.  Compressed formats (JPEG/MP3/H.264)
still need external libs and slot into the same signatures; the
original ``multimodal_meta``/frames/resize queries keep the
library-free fake-decode pipeline for the generic binary-column
plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smile_spark.tables import table

META_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint,"
    " fake_width int, fake_height int"
)


def attach_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the multimodal table: binary payload + metadata.

    Fixtures carry no media, so the payload is the utf-8 bytes of the
    document text — a real ``binary`` column flowing through a real
    plan; modality is derived deterministically from doc_id.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
    )


# --- real numpy codecs ----------------------------------------------------
#
# The container has no PIL/ffmpeg, but numpy is enough for REAL codecs
# of real formats: binary PGM (P5) for images, RIFF/WAVE PCM16 for
# audio, and concatenated PGM frames for video (the MJPEG idea with
# PGM as the per-frame codec).  Each decoder below is a genuine parser
# with validation — it reads magic numbers, header fields, and chunk
# layout from the byte stream, exactly as a PIL/soundfile body would;
# compressed formats (JPEG/MP3/H.264) still need external libs and
# would slot into the same function signatures.


def _parse_pgm(payload: bytes, off: int = 0) -> tuple[int, int, "object", int]:
    """Parse one binary-PGM (P5) image starting at ``off``: magic +
    whitespace-separated header tokens (width, height, maxval), then
    the raster viewed as a (height, width) uint8 array.  Returns
    (width, height, pixels, end_off) where ``end_off`` is the offset
    one past the raster — the exact number of bytes consumed, so
    stream parsers advance by what the parser actually read instead of
    re-searching for a canonical header marker."""
    import numpy as np

    if payload[off : off + 2] != b"P5":
        raise ValueError("not a binary PGM (P5) payload")
    # header = magic, width, height, maxval — tokens separated by any
    # whitespace; the raster starts after the single whitespace byte
    # that terminates maxval
    tokens: list[bytes] = []
    i = off + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PGM header")
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PGM maxval {maxval}")
    raster = payload[i : i + width * height]
    if len(raster) != width * height:
        raise ValueError("PGM raster shorter than width*height")
    pixels = np.frombuffer(raster, dtype=np.uint8).reshape(height, width)
    return width, height, pixels, i + width * height


def decode_image(payload: bytes) -> tuple[int, int, "object"]:
    """REAL binary-PGM (P5) decoder.  Returns (width, height, pixels)."""
    width, height, pixels, _ = _parse_pgm(payload)
    return width, height, pixels


def resample_audio(
    payload: bytes, rate: int = 8_000
) -> tuple[int, "object"]:
    """REAL RIFF/WAVE PCM16 decoder + integer-factor resampler: walk
    the chunk list (fmt / data may be in any order, with other chunks
    interleaved), validate PCM16 mono, then decimate to ``rate`` by
    integer stride (a production body would low-pass first; decimation
    keeps the certificate exact).  Returns (rate, samples)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    src_rate = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if i + 8 + size > len(payload):
            # a declared chunk size past the payload end means a
            # truncated/corrupt stream — fail loudly (same strictness
            # as the PGM raster length check), never silently shorten
            raise ValueError(
                f"chunk {cid!r} declares {size} bytes but only"
                f" {len(payload) - i - 8} remain"
            )
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            src_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = body
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if src_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if rate >= src_rate:
        return src_rate, samples
    if src_rate % rate:
        raise ValueError("only integer-factor decimation supported")
    return rate, samples[:: src_rate // rate]


def sample_video_frames(
    payload: bytes, every_n: int = 2
) -> list[tuple[int, int, "object"]]:
    """REAL frame sampler over a concatenated-PGM video stream: parse
    sequential P5 frames (each self-describing via its own header) and
    keep every ``every_n``-th one.  Returns the sampled frames as
    (width, height, pixels) tuples."""
    frames = []
    off = 0
    idx = 0
    while off < len(payload):
        if payload[off : off + 2] != b"P5":
            raise ValueError(f"bad frame magic at offset {off}")
        # the parser reports the exact byte it stopped at, so the walk
        # advances by what was actually consumed — correct for any
        # whitespace layout the header parser accepts
        w, h, pix, off = _parse_pgm(payload, off)
        if idx % every_n == 0:
            frames.append((w, h, pix))
        idx += 1
    return frames


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: metadata derived purely from
    the payload bytes, so the pipeline is testable end-to-end."""
    n_bytes = pdf["payload"].map(len)
    first_byte = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "n_bytes": n_bytes,
            "fake_width": (n_bytes % 64 + 16).astype("int32"),
            "fake_height": (first_byte % 32 + 8).astype("int32"),
        }
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-extract over the payload column via ``mapInPandas``.

    The iterator contract processes one Arrow batch at a time —
    constant memory per task regardless of table size; at 100 TB the
    decode parallelism is just the scan parallelism.
    """
    mm = attach_payload(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return mm.mapInPandas(decode, META_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_off bigint, frame_len int"
FRAME_STRIDE = 1000   # fake: one frame per 1000 payload bytes
MAX_FRAMES = 5


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads — the one-to-MANY
    ``mapInPandas`` shape (each input row yields several output rows,
    the UDF-side explode).

    Real codec would seek keyframes (see ``sample_video_frames``
    stub); the deterministic fake emits one frame per 1000 payload
    bytes (capped at 5), with byte offset/length — arithmetic the
    oracle reproduces from the text length.  Only video-modality rows
    are processed, and that filter happens BEFORE the UDF so Catalyst
    prunes the other modalities out of the Python path entirely.
    """
    mm = attach_payload(spark, sf_dir).filter(F.col("modality") == "video")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = min(n // FRAME_STRIDE + 1, MAX_FRAMES)
                for i in range(n_frames):
                    off = i * FRAME_STRIDE
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(off)
                    out["frame_len"].append(min(FRAME_STRIDE, n - off))
            yield pd.DataFrame(out)

    return mm.mapInPandas(sample, FRAMES_SCHEMA)


MULTIMODAL_FRAMES_SQL = (
    "WITH v AS (SELECT doc_id, length(text) AS n FROM documents"
    "  WHERE CAST(doc_id % 3 AS INT) = 2),"  # modality 'video'
    " f AS (SELECT doc_id, n,"
    f"  unnest(generate_series(0, CAST(least(n // {FRAME_STRIDE} + 1,"
    f" {MAX_FRAMES}) AS BIGINT) - 1)) AS frame_idx FROM v)"
    " SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,"
    f" CAST(frame_idx * {FRAME_STRIDE} AS BIGINT) AS frame_off,"
    f" CAST(least({FRAME_STRIDE}, n - frame_idx * {FRAME_STRIDE}) AS INT)"
    "  AS frame_len"
    " FROM f"
)


# Oracle: the fake decoder's arithmetic, expressed over the source text
# (payload is its utf-8 encoding; fixture text is ASCII so bytes==chars
# and the first byte is ascii of the first char).
MULTIMODAL_META_SQL = (
    "SELECT doc_id,"
    " CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'"
    "  WHEN 1 THEN 'audio' ELSE 'video' END AS modality,"
    " CAST(length(text) AS BIGINT) AS n_bytes,"
    " CAST(length(text) % 64 + 16 AS INT) AS fake_width,"
    " CAST(ascii(substr(text, 1, 1)) % 32 + 8 AS INT) AS fake_height"
    " FROM documents"
)


# --- resize (image modality) ---------------------------------------------

RESIZE_TARGET = 224  # longest-side target, the common vision-model input

RESIZE_SCHEMA = (
    "doc_id bigint, orig_w int, orig_h int, out_w int, out_h int"
)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over image payloads — the
    decode→transform mapInPandas shape (one row in, one row out, new
    metadata).

    A real implementation decodes and rescales pixels (see
    ``decode_image`` stub); the deterministic fake derives source
    dimensions from the payload exactly like ``_fake_decode_batch``
    and computes the longest-side-to-224 target in integer arithmetic
    (portable across engines).  Only image-modality rows reach the
    Python boundary — the modality filter sits before the UDF so
    Catalyst prunes audio/video out of the Arrow stream.
    """
    mm = attach_payload(spark, sf_dir).filter(F.col("modality") == "image")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
            w = (n_bytes % 64 + 16).astype("int64")
            h = (first % 32 + 8).astype("int64")
            longest = w.where(w >= h, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w.astype("int32"),
                    "orig_h": h.astype("int32"),
                    "out_w": (w * RESIZE_TARGET // longest).astype("int32"),
                    "out_h": (h * RESIZE_TARGET // longest).astype("int32"),
                }
            )

    return mm.mapInPandas(resize, RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = (
    "WITH img AS (SELECT doc_id,"
    "  length(text) % 64 + 16 AS w,"
    "  ascii(substr(text, 1, 1)) % 32 + 8 AS h"
    " FROM documents WHERE CAST(doc_id % 3 AS INT) = 0)"
    " SELECT doc_id, CAST(w AS INT) AS orig_w, CAST(h AS INT) AS orig_h,"
    f" CAST(w * {RESIZE_TARGET} // greatest(w, h) AS INT) AS out_w,"
    f" CAST(h * {RESIZE_TARGET} // greatest(w, h) AS INT) AS out_h"
    " FROM img"
)


# --- chunking (audio modality) -------------------------------------------

CHUNK_LEN = 800    # fake: bytes per audio window
CHUNK_HOP = 600    # fake: hop (overlapping windows)
MAX_CHUNKS = 6

CHUNKS_SCHEMA = (
    "doc_id bigint, chunk_idx int, chunk_off bigint, chunk_len int"
)


def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking over audio payloads — the second
    one-to-many mapInPandas shape (fixed-hop windows vs. the frame
    sampler's stride).  A real pipeline emits resampled PCM windows
    (see ``resample_audio`` stub); the fake emits (offset, length)
    windows with hop < length so windows overlap, capped at
    MAX_CHUNKS."""
    mm = attach_payload(spark, sf_dir).filter(F.col("modality") == "audio")

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "chunk_off": [], "chunk_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_chunks = min((max(n - 1, 0)) // CHUNK_HOP + 1, MAX_CHUNKS)
                for i in range(n_chunks):
                    off = i * CHUNK_HOP
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i)
                    out["chunk_off"].append(off)
                    out["chunk_len"].append(min(CHUNK_LEN, n - off))
            yield pd.DataFrame(out)

    return mm.mapInPandas(chunk, CHUNKS_SCHEMA)


MULTIMODAL_AUDIO_CHUNKS_SQL = (
    "WITH a AS (SELECT doc_id, length(text) AS n FROM documents"
    "  WHERE CAST(doc_id % 3 AS INT) = 1),"
    " c AS (SELECT doc_id, n,"
    f"  unnest(generate_series(0, CAST(least(greatest(n - 1, 0) //"
    f" {CHUNK_HOP} + 1, {MAX_CHUNKS}) AS BIGINT) - 1)) AS chunk_idx"
    "  FROM a)"
    " SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,"
    f" CAST(chunk_idx * {CHUNK_HOP} AS BIGINT) AS chunk_off,"
    f" CAST(least({CHUNK_LEN}, n - chunk_idx * {CHUNK_HOP}) AS INT)"
    "  AS chunk_len"
    " FROM c"
)


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video rollup of the sampled frames — the many-to-ONE
    composition closing the UDF shape matrix (1→1 meta/resize, 1→N
    frames/chunks, N→1 here): the Arrow-batched decode output feeds a
    plain JVM-side partial/final aggregate, so Python touches each
    frame row once and the reduction itself is codegen.  At 100 TB the
    aggregate keys on doc_id — the same partitioning the frame sampler
    already produced, so AQE usually elides the exchange."""
    frames = multimodal_frames(spark, sf_dir)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.col("frame_len").cast("bigint")).alias("total_frame_bytes"),
        F.max("frame_off").alias("last_frame_off"),
    )


MULTIMODAL_FRAME_STATS_SQL = (
    f"WITH frames AS ({MULTIMODAL_FRAMES_SQL})"
    " SELECT doc_id, COUNT(*) AS n_frames,"
    " CAST(SUM(frame_len) AS BIGINT) AS total_frame_bytes,"
    " MAX(frame_off) AS last_frame_off"
    " FROM frames GROUP BY doc_id"
)


# --- real-codec certificate queries ---------------------------------------
#
# The fixtures carry no media files, so each certificate SYNTHESIZES a
# valid payload per document from pure doc_id arithmetic (an encoder
# writing the real format per spec), decodes it with the REAL parser
# above — an independent code path reading magic bytes, headers, and
# chunk layout — and emits integer stats the DuckDB oracle recomputes
# in closed form from doc_id.  A parser bug (header arithmetic, chunk
# walk, stride, endianness) changes the stats and fails the hash gate.

IMG_PIX_A, IMG_PIX_B = 31, 7
AUD_A, AUD_B = 17, 13
VID_FRAMES, VID_FRAME_SALT, VID_EVERY = 3, 97, 2
AUD_SRC_RATE, AUD_TARGET_RATE = 16_000, 8_000


def _img_dims(doc_id: int) -> tuple[int, int]:
    return 16 + doc_id % 16, 8 + doc_id % 8


def _encode_pgm(doc_id: int, w: int, h: int, salt: int = 0) -> bytes:
    import numpy as np

    i = np.arange(w * h, dtype=np.int64)
    pix = ((doc_id * IMG_PIX_A + salt + IMG_PIX_B * i) % 256).astype(
        np.uint8
    )
    return f"P5\n{w} {h}\n255\n".encode() + pix.tobytes()


def _encode_wav(doc_id: int) -> bytes:
    import numpy as np

    n = 256 + doc_id % 256
    j = np.arange(n, dtype=np.int64)
    s = (((doc_id * AUD_A + AUD_B * j) % 65536) - 32768).astype("<i2")
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + AUD_SRC_RATE.to_bytes(4, "little")
        + (AUD_SRC_RATE * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→REAL-decode certificate for the image path: synthesize a
    binary PGM per image-modality document, parse it with
    :func:`decode_image`, and emit (doc_id, width, height, pix_sum) —
    all recomputed in closed form by the oracle.  Payload bytes never
    leave the executors (Arrow-batched mapInPandas, scan-parallel)."""
    ids = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "pix_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = _img_dims(d)
                payload = _encode_pgm(d, w, h)
                dw, dh, pix = decode_image(payload)
                out["doc_id"].append(d)
                out["width"].append(dw)
                out["height"].append(dh)
                out["pix_sum"].append(int(pix.astype("int64").sum()))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run, "doc_id bigint, width int, height int, pix_sum bigint"
    )


# DuckDB's generate_series rejects correlated column bounds, so the
# series is fixed-size (max w*h = 31*15 = 465 < 512) and filtered
MULTIMODAL_DECODE_IMAGE_SQL = (
    "SELECT d.doc_id, CAST(d.w AS INT) AS width,"
    " CAST(d.h AS INT) AS height,"
    " CAST(SUM((d.doc_id * 31 + 7 * t.i) % 256) AS BIGINT) AS pix_sum"
    " FROM (SELECT doc_id, 16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h"
    "  FROM documents WHERE doc_id % 3 = 0) d"
    " CROSS JOIN generate_series(0, 511) t(i)"
    " WHERE t.i < d.w * d.h"
    " GROUP BY d.doc_id, d.w, d.h"
)


def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→REAL-decode certificate for the audio path: synthesize a
    RIFF/WAVE PCM16 payload per audio-modality document, parse the
    chunk layout with :func:`resample_audio`, decimate 16 kHz → 8 kHz,
    and emit (doc_id, sample_rate, n_samples, sum_samples)."""
    ids = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "sample_rate": [],
                "n_samples": [],
                "sum_samples": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate, s = resample_audio(
                    _encode_wav(d), rate=AUD_TARGET_RATE
                )
                out["doc_id"].append(d)
                out["sample_rate"].append(rate)
                out["n_samples"].append(int(len(s)))
                out["sum_samples"].append(int(s.astype("int64").sum()))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        "doc_id bigint, sample_rate int, n_samples bigint,"
        " sum_samples bigint",
    )


MULTIMODAL_DECODE_AUDIO_SQL = (
    "SELECT d.doc_id,"
    f" CAST({AUD_TARGET_RATE} AS INT) AS sample_rate,"
    " CAST(d.n2 AS BIGINT) AS n_samples,"
    " CAST(SUM((d.doc_id * 17 + 13 * (2 * t.k)) % 65536 - 32768)"
    "  AS BIGINT) AS sum_samples"
    " FROM (SELECT doc_id, (256 + doc_id % 256 + 1) // 2 AS n2"
    "  FROM documents WHERE doc_id % 3 = 1) d"
    " CROSS JOIN generate_series(0, 255) t(k)"
    " WHERE t.k < d.n2"
    " GROUP BY d.doc_id, d.n2"
)


def multimodal_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→REAL-decode certificate for the video path: synthesize a
    3-frame concatenated-PGM stream per video-modality document,
    frame-sample every 2nd frame with :func:`sample_video_frames`
    (frames 0 and 2), and emit (doc_id, n_sampled, pix_sum) over the
    sampled frames."""
    ids = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_sampled": [], "pix_sum": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 8, 4 + d % 4
                stream = b"".join(
                    _encode_pgm(d, w, h, salt=VID_FRAME_SALT * f)
                    for f in range(VID_FRAMES)
                )
                frames = sample_video_frames(stream, every_n=VID_EVERY)
                out["doc_id"].append(d)
                out["n_sampled"].append(len(frames))
                out["pix_sum"].append(
                    int(
                        sum(
                            pix.astype("int64").sum()
                            for _, _, pix in frames
                        )
                    )
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run, "doc_id bigint, n_sampled int, pix_sum bigint"
    )


MULTIMODAL_DECODE_VIDEO_SQL = (
    "SELECT d.doc_id, CAST(2 AS INT) AS n_sampled,"
    " CAST(SUM((d.doc_id * 31 + 97 * f.f + 7 * t.i) % 256) AS BIGINT)"
    "  AS pix_sum"
    " FROM (SELECT doc_id, 8 + doc_id % 8 AS w, 4 + doc_id % 4 AS h"
    "  FROM documents WHERE doc_id % 3 = 2) d"
    " CROSS JOIN generate_series(0, 2) f(f)"
    " CROSS JOIN generate_series(0, 127) t(i)"
    " WHERE f.f % 2 = 0 AND t.i < d.w * d.h"
    " GROUP BY d.doc_id"
)
