"""Structured Streaming: the SAME window builders must produce the SAME
results under readStream (AvailableNow → memory sink) as in batch."""

from __future__ import annotations

import shutil

import pytest

from map_reduce_mongodb_spark.io import table
from map_reduce_mongodb_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    session_counts,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    """File-source streaming reads a DIRECTORY of files."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_stream_batch_equivalence_tumbling(spark, events_stream_dir):
    batch = tumbling_counts(table(spark, "events", SF_DIR)).collect()
    stream_df = tumbling_counts(
        read_events_stream(spark, events_stream_dir), watermark="2 hours")
    run_to_memory_sink(stream_df, "tumbling_test")
    streamed = spark.table("tumbling_test").collect()
    assert _canon(batch) == _canon(streamed)


def test_stream_batch_equivalence_sessions(spark, events_stream_dir):
    batch = session_counts(table(spark, "events", SF_DIR)).collect()
    stream_df = session_counts(
        read_events_stream(spark, events_stream_dir), watermark="2 hours")
    run_to_memory_sink(stream_df, "session_test")
    streamed = spark.table("session_test").collect()
    assert _canon(batch) == _canon(streamed)


def test_streaming_dedup_drops_redelivered_rows(spark, events_stream_dir):
    """A doubled stream (union of two reads of the same source) through
    exactly_once_dedup must equal the single-copy batch distinct —
    both the unbounded-state and the watermarked variant."""
    from map_reduce_mongodb_spark.streaming.windows import (
        exactly_once_dedup)

    batch = table(spark, "events", SF_DIR).select("event_id").distinct()
    n_expected = batch.count()
    for wm, sink in [(None, "dedup_plain_test"), ("2 hours",
                                                  "dedup_wm_test")]:
        doubled = read_events_stream(spark, events_stream_dir).unionAll(
            read_events_stream(spark, events_stream_dir))
        deduped = exactly_once_dedup(doubled, keys=("event_id",),
                                     watermark=wm)
        run_to_memory_sink(deduped, sink, output_mode="append")
        got = spark.table(sink)
        assert got.count() == n_expected, f"{sink}: row count"
        assert got.select("event_id").distinct().count() == n_expected


def test_stateful_user_profiles_stream_equals_batch(spark, events_stream_dir):
    """applyInPandasWithState running profile == batch aggregation.
    Caveat: streamed totals accumulate in pandas sum order; compare
    rounded values."""
    from map_reduce_mongodb_spark.streaming.stateful import (
        user_profiles_stateful)

    batch = user_profiles_stateful(table(spark, "events", SF_DIR))
    stream_df = user_profiles_stateful(
        read_events_stream(spark, events_stream_dir))
    run_to_memory_sink(stream_df, "profiles_test", output_mode="update")
    streamed = spark.table("profiles_test")
    assert _canon(batch.collect()) == _canon(streamed.collect())
