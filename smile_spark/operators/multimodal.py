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
