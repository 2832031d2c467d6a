"""Multimodal column handling (north-star extension).

Images/audio/video are opaque ``binary`` payload columns with typed
metadata, processed by Arrow-batched pandas functions via
``mapInPandas`` — the only sane shape at 100 TB: payload bytes never
leave the executor, batches stream through Python with Arrow
zero-copy, and the output schema is declared so Catalyst can keep
pruning/pushdown around the UDF boundary.

The container has no image/audio libraries, so the actual codecs are
STUBS (clearly marked, raising NotImplementedError); the deterministic
fake decoder exercises the full Spark-side plumbing — schema contract,
batch iteration, partition parallelism — and is what the oracle
checks.  Swapping in a real codec changes one function body, not the
pipeline.
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


# --- codec stubs (no media libs in this container) -----------------------


def decode_image(payload: bytes) -> "object":
    """STUB: real implementation would decode via PIL/turbojpeg."""
    raise NotImplementedError("image codec not available in this container")


def resample_audio(payload: bytes, rate: int = 16_000) -> "object":
    """STUB: real implementation would decode via soundfile/ffmpeg."""
    raise NotImplementedError("audio codec not available in this container")


def sample_video_frames(payload: bytes, every_n: int = 30) -> "object":
    """STUB: real implementation would frame-sample via pyav/ffmpeg."""
    raise NotImplementedError("video codec not available in this container")


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
