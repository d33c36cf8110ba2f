"""Multimodal (image/audio/video) column support.

Design (north-star: 100 TB training-data pipelines):

- Media travel as **opaque binary columns with typed metadata**:
  ``struct<uri, media_type, data: binary, meta: struct<...>>``. Large
  payloads stay in object storage and only ``uri`` ships; small ones
  inline in ``data`` (parquet stores them page-compressed).
- Decode / feature-extraction / frame-sampling run as **Arrow-batched
  Python stages** (``mapInPandas`` / ``pandas_udf``) — the one place
  Python is the right tool, because codec libraries are Python/C.
- THIS CONTAINER HAS NO CODEC LIBRARIES (no PIL/ffmpeg/librosa), so the
  byte-level decoders below are **deterministic fakes, clearly marked**
  (gated by ``_FAKE_DECODE = True``); the Spark-side plumbing — column
  schemas, batch iteration, 1→n frame explosion, partition behavior —
  is real and is what the tests exercise. Swapping in a real decoder
  changes only the body of ``_decode_payload``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical wire schema for a media row.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("uri", StringType(), True),
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("data", BinaryType(), True),
    StructField("meta", StructType([
        StructField("source", StringType(), True),
        StructField("declared_chars", LongType(), True),
    ]), True),
])

_FAKE_DECODE = True  # no codec libs in this container — see module doc


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the read-only documents
    table: text bytes stand in for media payloads; media_type cycles by
    doc_id. (Ingest analogue of ``spark.read.format('binaryFile')``.)"""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("mem://corpus/"), F.col("doc_id").cast("string")).alias("uri"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_chars"),
        ).alias("meta"),
    )


def _decode_payload(media_type: str, payload: bytes) -> dict:
    """FAKE decoder (deterministic): derives pseudo width/height/
    duration from the payload digest. A real build replaces this body
    with PIL / ffmpeg / soundfile calls behind the same dict contract."""
    if not _FAKE_DECODE:  # pragma: no cover - real-codec path
        raise NotImplementedError("no codec libraries in this environment")
    digest = hashlib.sha256(payload or b"").digest()
    a, b = digest[0], digest[1]
    if media_type == "image":
        return {"width": 64 + a % 192, "height": 64 + b % 192,
                "channels": 3, "n_frames": 1}
    if media_type == "audio":
        return {"width": 0, "height": 0, "channels": 1 + a % 2,
                "n_frames": 1000 + (a << 8 | b)}
    return {"width": 320 + a % 64, "height": 240 + b % 64,
            "channels": 3, "n_frames": 8 + a % 24}


DECODED_SCHEMA = StructType(MEDIA_SCHEMA.fields + [
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over media rows adding
    decoded geometry columns. Narrow (no shuffle); batch size is
    governed by spark.sql.execution.arrow.maxRecordsPerBatch."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _decode_payload(mt, bytes(d) if d is not None else b"")
                for mt, d in zip(pdf["media_type"], pdf["data"])
            ]
            for k in ("width", "height", "channels", "n_frames"):
                pdf[k] = [d[k] for d in decoded]
            yield pdf

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


FEATURE_DIM = 8

_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("feature", ArrayType(FloatType()), True),
])


def media_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stage (fake embedding: normalized byte
    histogram moments from the sha256-whitened payload). Demonstrates
    the binary→vector contract used by the similarity operators."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for d in pdf["data"]:
                payload = bytes(d) if d is not None else b""
                digest = hashlib.sha256(payload).digest()
                feats.append([b / 255.0 for b in digest[:FEATURE_DIM]])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_data", BinaryType(), True),
])


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """1→n frame sampling for video rows (mapInPandas as UDTF): emits
    every `every`-th fake frame; non-video rows emit nothing. The fake
    "frame" is a deterministic byte slice of the payload."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_frame = [], [], []
            for mid, mt, d in zip(pdf["media_id"], pdf["media_type"],
                                  pdf["data"]):
                if mt != "video":
                    continue
                payload = bytes(d) if d is not None else b""
                n = _decode_payload(mt, payload)["n_frames"]
                for i in range(0, n, every):
                    lo = (i * 7) % max(len(payload), 1)
                    out_id.append(mid)
                    out_idx.append(i)
                    out_frame.append(payload[lo:lo + 16])
            yield pd.DataFrame({"media_id": out_id, "frame_idx": out_idx,
                                "frame_data": out_frame})

    return media.mapInPandas(batches, schema=_FRAME_SCHEMA)
