"""Structured Streaming: the SAME window builders must produce the SAME
results under readStream (AvailableNow → memory sink) as in batch."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

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
    # full-row expectation, not just counts (r9 test review: the
    # count-only compare is the class that hid the TWS timezone bug —
    # a payload/ts corruption keeping one row per key would pass it).
    # The stream reader's ts is LTZ over the same instants as the
    # batch NTZ scan, so normalize both to epoch micros for compare.
    want = {(r.event_id, r.us, r.user_id, round(r.value, 6))
            for r in table(spark, "events", SF_DIR)
            .select("event_id",
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    .alias("us"), "user_id", "value").collect()}
    for wm, sink in [(None, "dedup_plain_test"), ("2 hours",
                                                  "dedup_wm_test")]:
        doubled = read_events_stream(spark, events_stream_dir).unionAll(
            read_events_stream(spark, events_stream_dir))
        deduped = exactly_once_dedup(doubled, keys=("event_id",),
                                     watermark=wm)
        run_to_memory_sink(deduped, sink, output_mode="append")
        got = spark.table(sink)
        assert got.count() == n_expected, f"{sink}: row count"
        rows = {(r.event_id, r.us, r.user_id, round(r.value, 6))
                for r in got.select(
                    "event_id",
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    .alias("us"), "user_id", "value").collect()}
        assert rows == want, f"{sink}: row content"


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


def test_streaming_merge_into_store(spark, tmp_path):
    """Streaming out:{reduce}: a file-source stream drained through
    foreach_batch, each micro-batch merge_into-ing the persisted
    store, must equal one batch job over all input — the reference's
    incremental collection merge (mongodb.js:96,100) running
    continuously. maxFilesPerTrigger=1 forces 2 real micro-batches so
    the store's re-reduce path (not just the bootstrap) executes."""
    import json

    from map_reduce_mongodb_spark.operators.mapreduce import (
        map_reduce, merge_into, read_reduced_store)
    from map_reduce_mongodb_spark.sinks import foreach_batch

    src = tmp_path / "docs_stream"
    src.mkdir()
    rows1 = [(1, "a b a"), (2, "b only_in_first")]
    rows2 = [(3, "a c"), (4, "b c c")]
    schema = "doc_id long, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    store = str(tmp_path / "wc_store")
    mr = lambda d: ((w, {"n": 1}) for w in d["text"].split())
    red = lambda k, vs: {"n": sum(v["n"] for v in vs)}

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = foreach_batch(
        stream,
        lambda batch_df, epoch: merge_into(store, batch_df, mr, red),
        checkpoint=str(tmp_path / "ckpt"),
        query_name="stream_merge_test", available_now=True)
    q.awaitTermination(120)

    oracle = map_reduce(
        spark.createDataFrame(rows1 + rows2, schema), mr, red)
    want = {r._id: json.loads(r.value)["n"] for r in oracle.collect()}
    got = {r._id: json.loads(r.value)["n"]
           for r in read_reduced_store(spark, store).collect()}
    assert got == want
    # two micro-batches really ran: store advanced past the bootstrap
    assert int((tmp_path / "wc_store" / "_VERSION").read_text()) >= 1


def test_streaming_scd2_upsert_pipeline(spark, tmp_path):
    """Streaming CDC → versioned dimension: a file-source update
    stream drained through foreach_batch, each micro-batch applying
    scd2_apply to a persisted dimension snapshot — the streaming
    composition of the batch SCD2 operator (MERGE-on-stream).
    maxFilesPerTrigger=1 forces two real micro-batches, so a key
    updated in BOTH batches must end at version 3 with a complete
    closed-row chain."""
    from pyspark.sql import functions as F

    from map_reduce_mongodb_spark.operators.scd import scd2_apply
    from map_reduce_mongodb_spark.sinks import foreach_batch

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(k, f"seg{k % 2}") for k in range(6)], "k long, seg string") \
        .select("k", "seg",
                F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(1).alias("version")) \
        .write.mode("overwrite").parquet(dim_path)

    src = tmp_path / "updates"
    src.mkdir()
    schema = "k long, seg string, effective_ts timestamp"
    b1 = [(0, "NEW", "1998-01-01"), (2, "NEW", "1998-01-01")]
    b2 = [(0, "NEWER", "1999-01-01"), (4, "NEW", "1999-01-01")]
    for name, rows in (("f1", b1), ("f2", b2)):
        spark.createDataFrame(rows, "k long, seg string, ts string") \
            .select("k", "seg",
                    F.col("ts").cast("timestamp").alias("effective_ts")) \
            .coalesce(1).write.parquet(str(src / name))

    def upsert(batch_df, epoch):
        if batch_df.isEmpty():
            return
        dim = batch_df.sparkSession.read.parquet(dim_path)
        merged = scd2_apply(dim, batch_df, "k", ["seg"]).localCheckpoint()
        merged.write.mode("overwrite").parquet(dim_path)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = foreach_batch(stream, upsert,
                      checkpoint=str(tmp_path / "ckpt"),
                      query_name="stream_scd2_test", available_now=True)
    q.awaitTermination(120)

    final = spark.read.parquet(dim_path)
    assert final.count() == 6 + 4          # append-only history
    open_rows = final.where("valid_to IS NULL")
    assert open_rows.count() == 6          # one open row per key
    k0 = sorted((r.version, r.seg, r.valid_to is None)
                for r in final.where("k = 0").collect())
    assert k0 == [(1, "seg0", False), (2, "NEW", False),
                  (3, "NEWER", True)]


_TWS_BODY = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

from map_reduce_mongodb_spark.streaming.stateful import (
    user_profiles_stateful, user_profiles_tws)
from map_reduce_mongodb_spark.streaming.windows import run_to_memory_sink

SF = {sf!r}
SCHEMA = ("event_id long, ts timestamp, user_id long,"
          " event_type string, value double, props string")
sess = (SparkSession.builder.appName("tws-pin").master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "4")
        # NON-UTC session on purpose: the LTZ ts input must normalize
        # to NTZ UTC inside BOTH operators — pre-r9-fix the TWS twin
        # skipped the normalization and first/last_ts came back
        # shifted by the session offset (this config + the timestamp
        # comparison below is what catches it)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider")
        .getOrCreate())
sess.sparkContext.setLogLevel("ERROR")
stream = (sess.readStream.schema(SCHEMA)
          .option("pathGlobFilter", "events.parquet").parquet(SF))
run_to_memory_sink(user_profiles_tws(stream), "tws_sink",
                   output_mode="update")
got = {{r.user_id: (r.n_events, r.total_value, r.first_ts, r.last_ts)
        for r in sess.table("tws_sink").collect()}}
want = {{r.user_id: (r.n_events, r.total_value, r.first_ts, r.last_ts)
         for r in user_profiles_stateful(
             sess.read.option("pathGlobFilter", "events.parquet")
             .schema(SCHEMA).parquet(SF)).collect()}}
assert got == want and got, (len(got), len(want))
print("TWS_PIN_OK", len(got))
"""

# Pure-Python protobuf runtime shipped inside this sandbox's
# google-cloud-sdk (plain `google.protobuf` imports, version 6.32.0)
# — lets the transformWithState lane run without pip. The pyspark
# pb2 gencode is 6.33.0, one minor AHEAD of this runtime, so the
# official escape hatch TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK
# is required; the wire format is unaffected (proto3).
_APPENGINE_PROTOBUF = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def test_transform_with_state_profiles_match_batch():
    """Spark 4 transformWithStateInPandas twin of the
    applyInPandasWithState profile operator — needs google.protobuf in
    BOTH the driver and the Python workers (the stateful processor API
    client speaks proto to the JVM state server). No protobuf is pip-
    installed here, so the test runs in a SUBPROCESS with the cloud-sdk
    pure-Python runtime on PYTHONPATH — env must be set before the JVM
    starts so workers inherit it, which an in-process sys.path tweak
    on the shared session cannot do."""
    import importlib.util
    import subprocess
    import sys
    from pathlib import Path

    import pytest

    from tests.conftest import SF_DIR

    try:
        # raises (not returns None) when even the parent `google`
        # namespace package is absent
        have_protobuf = (
            importlib.util.find_spec("google.protobuf") is not None)
    except ModuleNotFoundError:
        have_protobuf = False
    env = dict(os.environ)
    if not have_protobuf:
        if not Path(_APPENGINE_PROTOBUF, "google", "protobuf").is_dir():
            pytest.skip("google.protobuf not available and no vendored "
                        "runtime found: transformWithState needs it")
        env["PYTHONPATH"] = _APPENGINE_PROTOBUF + (
            (":" + env["PYTHONPATH"]) if env.get("PYTHONPATH") else "")
        env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    repo = str(Path(__file__).resolve().parent.parent)
    out = subprocess.run(
        [sys.executable, "-c",
         _TWS_BODY.format(repo=repo, sf=SF_DIR)],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "TWS_PIN_OK" in out.stdout, out.stdout[-2000:]


def test_streaming_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across a RESTART: process a first batch of files,
    stop the query, drop more files in, restart with the SAME
    checkpoint — the sink must end up with every input row exactly
    once (the checkpoint's source offsets skip the already-committed
    files), equal to a batch read of the full directory."""
    import pyspark.sql.functions as F
    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    events = table(spark, "events", SF_DIR)
    half1 = events.where(F.col("event_id") % 2 == 0)
    half2 = events.where(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(str(src / "f1"))

    def run_once():
        q = (spark.readStream.schema(events.schema)
             .option("recursiveFileLookup", "true")
             .parquet(str(src))
             .writeStream.format("parquet")
             .option("path", str(sink))
             .option("checkpointLocation", str(ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(str(sink)).count()
    assert n1 == half1.count()
    half2.write.mode("overwrite").parquet(str(src / "f2"))
    run_once()
    got = spark.read.parquet(str(sink))
    assert got.count() == events.count()  # no loss, no double-count
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_outputs_are_session_timezone_independent(
        spark, events_stream_dir):
    """Watermarked streams carry LTZ event time internally (Spark
    rejects NTZ there), but every EXPOSED timestamp must come back as
    the batch scan's naive NTZ values regardless of
    spark.sql.session.timeZone — a non-UTC driver box must not shift
    windowed/stateful outputs (r7 TZ sweep regression)."""
    batch = tumbling_counts(table(spark, "events", SF_DIR)).collect()

    sess = spark.newSession()
    sess.conf.set("spark.sql.session.timeZone", "America/New_York")
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    stream_df = tumbling_counts(
        read_events_stream(sess, events_stream_dir), watermark="2 hours")
    assert dict(stream_df.dtypes)["window_start"] == "timestamp_ntz"
    run_to_memory_sink(stream_df, "tumbling_tz_test")
    streamed = sess.table("tumbling_tz_test").collect()
    assert _canon(batch) == _canon(streamed)

    # the stateful operator fed the RAW LTZ stream — it must normalize
    # internally (not rely on callers): first/last_ts must equal the
    # batch min/max under the shifted session
    from pyspark.sql import functions as F

    from map_reduce_mongodb_spark.streaming.stateful import (
        user_profiles_stateful)
    stream = read_events_stream(sess, events_stream_dir)
    run_to_memory_sink(user_profiles_stateful(stream),
                       "profiles_tz_test", output_mode="update")
    got = _canon(sess.table("profiles_tz_test").collect())
    want = _canon(
        table(spark, "events", SF_DIR)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"),
             F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .collect())
    assert got == want
