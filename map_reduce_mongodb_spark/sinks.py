"""Sinks — the reference's write surfaces, Spark-first.

| Reference | Where | Here |
|---|---|---|
| S3 stream→sink adapter (`streamMapper`) | harvest.js:53-68 | :func:`foreach_batch` on a streaming DataFrame |
| S4 bulk insert (`createRecords`) | mongodb.js:47-53 | :func:`write_table` (parquet, append/overwrite, optional partitioning) |
| stage materialization (collections between stages) | harvest.js:104-135 | :func:`write_stage` |
| final single-doc export (A4) | mongodb.js:125-143 | :func:`export_feature_collection_json` (explicitly driver-side, documented cliff) |
| MongoDB itself | mongodb.js | :func:`to_mongodb` — the Spark MongoDB connector one-liner (BASELINE.json `spark_approach`); gated: the connector jar isn't in this environment |
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame


def write_table(df: DataFrame, path: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """S4: bulk write. At scale, pass partition_by (e.g. state, date) so
    downstream scans partition-prune."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_stage(df: DataFrame, path: str) -> DataFrame:
    """Materialize a pipeline stage boundary and return a reader over
    it — the analogue of the reference writing each stage to a
    collection, with the write amortized across all downstream
    consumers."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def foreach_batch(stream_df: DataFrame,
                  fn: Callable[[DataFrame, int], None],
                  checkpoint: str, query_name: str = "sink",
                  available_now: bool = False):
    """S3: per-micro-batch callback sink (exactly-once per epoch given
    an idempotent fn). Returns the StreamingQuery handle.
    ``available_now=True`` processes current input then terminates
    (backfills / tests); default runs continuously."""
    w = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def export_feature_collection_json(fc_df: DataFrame, path: str) -> None:
    """A4 final artifact: ONE GeoJSON FeatureCollection-shaped document.
    This is inherently a driver-side collect of one row (the reference
    built the same doc in driver memory, mongodb.js:125-137); callers
    must only use it on bounded exports — the distributed form is the
    per-feature DataFrame."""
    rows = fc_df.toJSON().collect()
    doc = json.loads(rows[0]) if rows else {"data": []}
    with open(path, "w") as f:
        json.dump(doc, f, sort_keys=True)


def to_mongodb(df: DataFrame, uri: str, database: str,
               collection: str, mode: str = "append") -> None:
    """Reference-parity MongoDB sink via the official Spark MongoDB
    connector. The connector jar is not present in this environment, so
    this raises a clear error unless it is installed
    (--packages org.mongodb.spark:mongo-spark-connector_2.13)."""
    try:
        (df.write.format("mongodb").mode(mode)
         .option("connection.uri", uri)
         .option("database", database)
         .option("collection", collection)
         .save())
    except Exception as exc:  # pragma: no cover - no connector here
        raise RuntimeError(
            "MongoDB connector not available in this environment; install "
            "org.mongodb.spark:mongo-spark-connector to use this sink"
        ) from exc
