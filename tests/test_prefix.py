"""distributed_cumsum: correctness vs a local reference and the
no-single-partition-window plan contract (the reason it exists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.operators.prefix import (
    distributed_cummax_exclusive,
    distributed_cumsum,
)


def _reference(rows, key=lambda r: (-r[1], r[0])):
    out, acc = {}, 0
    for rid, v in sorted(rows, key=key):
        acc += v
        out[rid] = acc
    return out


def test_cumsum_matches_sequential_reference(spark):
    rows = [(i, (i * 37) % 101) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = distributed_cumsum(
        df, [F.col("v").desc(), F.col("id").asc()], F.col("v"), "cum",
        num_partitions=8).collect()
    want = _reference(rows)
    assert len(got) == 1000
    for r in got:
        assert r.cum == want[r.id], (r.id, r.cum, want[r.id])


def test_cumsum_handles_fewer_rows_than_partitions(spark):
    df = spark.createDataFrame([(1, 10), (2, 5)], "id long, v long")
    got = {r.id: r.cum for r in distributed_cumsum(
        df, [F.col("v").desc(), F.col("id").asc()], F.col("v"), "cum",
        num_partitions=16).collect()}
    assert got == {1: 10, 2: 15}


def test_cumsum_plan_has_no_global_single_partition_window(spark):
    """The data-sized window must be partitioned (by _pid); only the
    O(#partitions) offset table may use a single-partition window.
    Guard: the window OVER THE INPUT RELATION never shows
    SinglePartition in the exchange feeding it."""
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v"))
    out = distributed_cumsum(
        df, [F.col("v").desc(), F.col("id").asc()], F.col("v"), "cum",
        num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the within-partition running sum is keyed by _pid
    assert "windowspecdefinition(_pid" in plan
    # exactly one single-partition exchange: the tiny offsets branch
    assert plan.count("Exchange SinglePartition") <= 1


def test_cumsum_range_exchange_is_reused(spark):
    """Both passes must read the SAME range exchange (sampled
    boundaries!) — ReuseExchange makes _pid consistent between the
    window branch and the totals branch. If this ever breaks, the
    operator needs an explicit persist of the ranged frame."""
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v"))
    out = distributed_cumsum(
        df, [F.col("v").desc(), F.col("id").asc()], F.col("v"), "cum",
        num_partitions=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan


def test_cummax_exclusive_matches_sequential_reference(spark):
    rows = [(i, (i * 53) % 71) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r.id: r.m for r in distributed_cummax_exclusive(
        df, [F.col("v").asc(), F.col("id").asc()], F.col("v"), "m",
        num_partitions=8).collect()}
    best, want = None, {}
    for rid, v in sorted(rows, key=lambda r: (r[1], r[0])):
        want[rid] = best
        best = v if best is None or v > best else best
    assert got == want
    assert sum(1 for m in got.values() if m is None) == 1  # global first


def _prefix_property_check(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r.id: r.cum for r in distributed_cumsum(
        df, [F.col("v").desc(), F.col("id").asc()], F.col("v"), "cum",
        num_partitions=5).collect()}
    acc, want = 0, {}
    for rid, v in sorted(rows, key=lambda r: (-r[1], r[0])):
        acc += v
        want[rid] = acc
    assert got == want


def test_cumsum_property_sweep(spark):
    """Batched hypothesis-style sweep: duplicates, negatives, single
    row, all-equal keys — shapes where range boundaries and tiebreaks
    matter."""
    import random
    rng = random.Random(7)
    cases = [
        [0], [5, 5, 5, 5], [-3, -1, -2, 0, 2, 1],
        [rng.randrange(-10, 10) for _ in range(97)],
        [rng.choice([1, 2]) for _ in range(64)],
        list(range(50)) + list(range(50)),
    ]
    for values in cases:
        _prefix_property_check(spark, values)
