"""Multimodal plumbing tests: schemas, Arrow batch stages, 1→n frame
sampling — the decode bodies are stubbed, the Spark mechanics are real."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.io import table
from map_reduce_mongodb_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    decode_media,
    media_features,
    media_from_documents,
    sample_frames,
)
from tests.conftest import SF_DIR


def _media(spark):
    return media_from_documents(table(spark, "documents", SF_DIR))


def test_media_schema_and_payload(spark):
    media = _media(spark)
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert row.uri == "mem://corpus/0"
    assert row.media_type == "image"
    assert isinstance(row.data, (bytes, bytearray))
    assert row.meta.declared_chars == len(row.data)  # ascii corpus


def test_decode_media_adds_geometry(spark):
    decoded = decode_media(_media(spark))
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert all(r.n_frames >= 1 for r in rows)
    imgs = [r for r in rows if r.media_type == "image"]
    assert imgs and all(r.n_frames == 1 and r.channels == 3 for r in imgs)
    # deterministic: same payload → same fake geometry
    again = {r.media_id: (r.width, r.height) for r in
             decode_media(_media(spark)).collect()}
    assert all((r.width, r.height) == again[r.media_id] for r in rows)


def test_media_features_shape(spark):
    feats = media_features(_media(spark)).collect()
    assert all(len(r.feature) == FEATURE_DIM for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r.feature)


def test_sample_frames_video_only(spark):
    media = _media(spark)
    frames = sample_frames(media, every=8)
    got_types = frames.join(media, "media_id").select("media_type").distinct()
    assert [r.media_type for r in got_types.collect()] == ["video"]
    per_video = frames.groupBy("media_id").count().collect()
    assert per_video and all(r["count"] >= 1 for r in per_video)
