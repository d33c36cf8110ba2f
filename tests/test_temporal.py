"""Temporal join operators: unit contracts not covered by the oracle
parity queries (those exercise the fixture tables, which happen to have
unique left rows)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

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


def test_asof_join_duplicate_right_ts_resolves_to_max_payload(spark):
    """Duplicate right rows at the same (by, ts) must resolve
    DETERMINISTICALLY — to the greatest payload struct (the window's
    final sort key), not to whichever duplicate happened to sort last
    under one partition layout (r9 review: (ts, side) alone is not a
    total order, so the carried value could flap across runs/task
    retries)."""
    from map_reduce_mongodb_spark.operators.temporal import asof_join
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 12, 0, 30))], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t0, 10.0), ("k", t0, 30.0), ("k", t0, 20.0)],
        "k string, ts timestamp, price double")
    for _ in range(3):  # repeated runs must agree
        out = asof_join(left, right, by="k", ts="ts",
                        payload_cols=["price"]).collect()
        assert [r.asof_price for r in out] == [30.0]
    fwd = asof_join(left.select("k", F.lit(t0).alias("ts")),
                    right, by="k", ts="ts", payload_cols=["price"],
                    direction="forward").collect()
    assert [r.asof_price for r in fwd] == [30.0]


def test_interval_overlap_pairs_canonical_cell_dedup(spark):
    """A pair of long intervals sharing MANY grid cells must surface
    exactly once (the canonical-cell rule), with the exact overlap
    length; disjoint and touching (half-open) intervals must not
    pair; pairs never cross the key boundary."""
    from map_reduce_mongodb_spark.operators.temporal import (
        interval_overlap_pairs)
    iv = spark.createDataFrame(
        [  # key s1: [0,20) vs [5,25) share cells 0..2 (w=7), overlap 15
            ("s1", 1, 0, 20), ("s1", 2, 5, 25),
            # touching half-open: [25,30) vs [30,35) -> no pair
            ("s1", 3, 25, 30), ("s1", 4, 30, 35),
            # same span as id 1/2 but other key: no cross-key pair
            ("s2", 5, 0, 20),
        ],
        "k string, iid int, s long, e long")
    out = interval_overlap_pairs(iv, key="k", id_col="iid",
                                 start="s", end="e", cell_width=7)
    rows = sorted((r.k, r.id_a, r.id_b, r.overlap)
                  for r in out.collect())
    assert rows == [("s1", 1, 2, 15)]
