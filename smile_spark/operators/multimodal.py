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
