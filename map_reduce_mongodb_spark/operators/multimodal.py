"""Multimodal (image/audio/video) column support.

Design (north-star: 100 TB training-data pipelines):

- Media travel as **opaque binary columns with typed metadata**:
  ``struct<uri, media_type, data: binary, meta: struct<...>>``. Large
  payloads stay in object storage and only ``uri`` ships; small ones
  inline in ``data`` (parquet stores them page-compressed).
- Decode / feature-extraction / frame-sampling run as **Arrow-batched
  Python stages** (``mapInPandas`` / ``pandas_udf``) — the one place
  Python is the right tool, because codec libraries are Python/C.
- Codec reality in this container (no PIL/ffmpeg/librosa): **image and
  audio decode are REAL** — the synthesized payloads are well-formed
  binary PPM (P6) and PCM WAV files, and ``_decode_payload`` parses
  their headers with pure stdlib (hand-rolled P6 parsing with
  pixel-array length validation; the ``wave`` module for WAV), so the
  decode path exercises genuine bytes end-to-end. **Video stays a
  deterministic fake** (``_FAKE_VIDEO_DECODE = True`` — the stdlib has
  no video container parser), clearly marked; a real build swaps only
  that branch for ffmpeg. The Spark-side plumbing — column schemas,
  Arrow batch iteration, 1→n frame explosion, partition behavior — is
  identical across all three types.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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

_FAKE_VIDEO_DECODE = True  # stdlib has no video parser — see module doc

#: WAV synthesis parameters (PCM 16-bit).
_WAV_RATE = 16000
_WAV_SAMPLE_BYTES = 2


def _synth_payload(media_type: str, text: str) -> bytes:
    """Deterministic WELL-FORMED payload per media type, derived from
    the document text so every property is SQL-derivable (the oracle
    recomputes geometry from ``length(text)``):

    - image → binary PPM (P6): ``P6\\n{w} {h}\\n255\\n`` + exactly
      w·h·3 pixel bytes (text repeated/truncated). w and h are
      16 + f(len) ∈ [16, 63], so their decimal forms are always two
      digits and the header is exactly 13 bytes.
    - audio → PCM WAV: standard 44-byte RIFF header + the text bytes
      truncated to a whole number of frames (block align =
      2·channels; channels = 1 + len % 2).
    - video → raw text bytes (opaque; no stdlib container writer).
    """
    raw = text.encode("utf-8")
    n = len(raw)
    if media_type == "image":
        w = 16 + n % 48
        h = 16 + (n // 7) % 48
        npix = w * h * 3
        body = (raw * (-(-npix // n)))[:npix] if n else b"\x00" * npix
        return b"P6\n%d %d\n255\n" % (w, h) + body
    if media_type == "audio":
        channels = 1 + n % 2
        block = _WAV_SAMPLE_BYTES * channels
        dsize = n - (n % block)
        hdr = (b"RIFF" + struct.pack("<I", 36 + dsize) + b"WAVE"
               + b"fmt " + struct.pack(
                   "<IHHIIHH", 16, 1, channels, _WAV_RATE,
                   _WAV_RATE * block, block, 8 * _WAV_SAMPLE_BYTES)
               + b"data" + struct.pack("<I", dsize))
        return hdr + raw[:dsize]
    return raw


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the read-only documents
    table: each row carries a synthesized well-formed payload (PPM /
    WAV / opaque — see :func:`_synth_payload`); media_type cycles by
    doc_id. (Ingest analogue of ``spark.read.format('binaryFile')``.)
    Payload synthesis is an Arrow-batched pandas_udf — fixture-building
    code, not a hot path."""
    @F.pandas_udf(BinaryType())
    def synth(mt: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [_synth_payload(m, t if t is not None else "")
             for m, t in zip(mt, text)])

    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("mem://corpus/"), F.col("doc_id").cast("string")).alias("uri"),
        mt.alias("media_type"),
        synth(mt, F.col("text")).alias("data"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_chars"),
        ).alias("meta"),
    )


def _decode_payload(media_type: str, payload: bytes) -> dict:
    """Decode a media payload's geometry. Image and audio are REAL
    parsers over real bytes:

    - image: P6 (binary PPM) header — magic, dimensions, maxval — with
      strict validation that the pixel array is exactly w·h·3 bytes
      (a truncated or padded file raises ValueError);
    - audio: stdlib ``wave`` (RIFF/fmt/data chunk walk), which rejects
      malformed headers itself.

    Video has no stdlib parser: a deterministic sha256-derived fake,
    gated by ``_FAKE_VIDEO_DECODE`` — a real build replaces that
    branch (only) with an ffmpeg probe behind the same dict contract."""
    if media_type == "image":
        if not payload.startswith(b"P6"):
            raise ValueError("not a binary PPM (P6) payload")
        # Header: P6 <ws> width <ws> height <ws> maxval <single ws>.
        fields, pos = [], 2
        while len(fields) < 3:
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError("truncated PPM header")
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        width, height, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        if len(payload) - pos != width * height * 3:
            raise ValueError("PPM pixel array size mismatch")
        return {"width": width, "height": height,
                "channels": 3, "n_frames": 1}
    if media_type == "audio":
        with wave.open(io.BytesIO(payload)) as wv:
            return {"width": 0, "height": 0,
                    "channels": wv.getnchannels(),
                    "n_frames": wv.getnframes()}
    if not _FAKE_VIDEO_DECODE:  # pragma: no cover - real-codec path
        raise NotImplementedError("no video codec in this environment")
    digest = hashlib.sha256(payload or b"").digest()
    a, b = digest[0], digest[1]
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


_RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("data", BinaryType(), False),
])


def resize_images(media: DataFrame, size: tuple[int, int] = (16, 16),
                  ) -> DataFrame:
    """REAL image resize: nearest-neighbour resample of each image
    row's decoded PPM pixel grid (numpy index selection over the
    (h, w, 3) array), re-encoded as a PPM thumbnail — the standard
    embedding/fingerprint preprocessing step. Non-image rows emit
    nothing. Narrow Arrow stage, no shuffle; at 100 TB this is pure
    per-partition compute.

    Pixel mapping is the canonical floor(i·src/dst) grid, so thumb
    pixel (0, 0) is source pixel (0, 0) — the registered query's
    oracle exploits that to pin REAL pixel movement (the first
    thumbnail byte must equal the first source-text byte)."""
    import numpy as np
    tw, th = size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "data": []}
            for mid, mt, d in zip(pdf["media_id"], pdf["media_type"],
                                  pdf["data"]):
                if mt != "image":
                    continue
                payload = bytes(d) if d is not None else b""
                geom = _decode_payload("image", payload)  # validates
                w, h = geom["width"], geom["height"]
                body_at = payload.index(b"255\n") + 4  # header is first
                px = np.frombuffer(payload, dtype=np.uint8,
                                   offset=body_at).reshape(h, w, 3)
                ys = (np.arange(th) * h) // th
                xs = (np.arange(tw) * w) // tw
                thumb = px[np.ix_(ys, xs)]
                out["media_id"].append(mid)
                out["width"].append(tw)
                out["height"].append(th)
                out["data"].append(
                    b"P6\n%d %d\n255\n" % (tw, th) + thumb.tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=_RESIZED_SCHEMA)


_AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_samples", LongType(), False),
    StructField("peak", LongType(), False),
    StructField("mean_amp", DoubleType(), False),
    StructField("rms", DoubleType(), False),
])


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio DSP over the decoded WAV payloads: int16 PCM samples
    out of the stdlib ``wave`` reader, per-clip peak / mean amplitude
    / RMS energy via numpy — the loudness screens an audio curation
    pipeline runs. Sample sums are computed in int64 (exact), so the
    derived doubles are bit-identical to the SQL oracle's
    integer-sum/able arithmetic. Audio rows with zero whole frames
    emit nothing; other media types pass through the filter."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "n_samples": [], "peak": [],
                   "mean_amp": [], "rms": []}
            for mid, mt, d in zip(pdf["media_id"], pdf["media_type"],
                                  pdf["data"]):
                if mt != "audio":
                    continue
                payload = bytes(d) if d is not None else b""
                with wave.open(io.BytesIO(payload)) as wv:
                    raw = wv.readframes(wv.getnframes())
                x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                if not len(x):
                    continue
                n = len(x)
                s, ss = int(x.sum()), int((x * x).sum())
                # floor(x·10⁴ + 0.5): round-half-UP to 4 decimals on
                # both engines — Python's round() banker's-rounds and
                # diverges from SQL round() on exact half-way values
                # (mean of 2^k samples lands there routinely).
                r4 = (lambda v: math.floor(v * 10000 + 0.5) / 10000)
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["peak"].append(int(x.max()))
                out["mean_amp"].append(r4(s / n))
                out["rms"].append(r4((ss / n) ** 0.5))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=_AUDIO_FEATURES_SCHEMA)


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
