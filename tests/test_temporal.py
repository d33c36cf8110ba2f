"""Temporal join operators: unit contracts not covered by the oracle
parity queries (those exercise the fixture tables, which happen to have
unique left rows)."""

from __future__ import annotations

from datetime import datetime

from map_reduce_mongodb_spark.operators.temporal import range_count


def test_range_count_preserves_duplicate_left_rows(spark):
    """Fully duplicate left rows must each produce their own output row
    (grouping happens on an internal unique row id, not the left tuple
    — the silent-collapse hazard flagged in review)."""
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("u1", t0), ("u1", t0), ("u2", t0)],  # first two are identical
        "user string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 11, 59, 30)),
         ("u2", datetime(2024, 1, 1, 11, 0, 0))],  # out of range for u2
        "user string, ts timestamp")
    out = range_count(left, right, by="user", ts="ts", delta_seconds=60)
    rows = sorted((r.user, r.n_in_range) for r in out.collect())
    assert rows == [("u1", 1), ("u1", 1), ("u2", 0)]
