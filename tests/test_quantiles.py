"""grouped_order_statistic: exactness against a Python sort, including
duplicate values straddling bucket boundaries and custom ranks."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.operators.quantiles import (
    grouped_order_statistic)


def _data():
    # Deterministic LCG values in [0, 40) with duplicates, 2 groups.
    rows, x = [], 7
    for i in range(200):
        x = (x * 1103515245 + 12345) % (2 ** 31)
        rows.append(("g" + str(i % 2), float(x % 400) / 10.0))
    # Pile duplicates exactly on a bucket edge (floor(v) boundary).
    rows += [("g0", 17.0)] * 15 + [("g1", 17.0)] * 5
    return rows


def test_lower_median_matches_python_sort(spark):
    rows = _data()
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: (r.n, r.stat)
           for r in grouped_order_statistic(df, ["g"], "v").collect()}
    for g in ("g0", "g1"):
        vals = sorted(v for gg, v in rows if gg == g)
        k = (len(vals) + 1) // 2
        assert out[g] == (len(vals), vals[k - 1]), g


def test_custom_rank_p90(spark):
    rows = _data()
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r.stat
           for r in grouped_order_statistic(
               df, ["g"], "v", rank_sql="(9 * n + 9) div 10").collect()}
    for g in ("g0", "g1"):
        vals = sorted(v for gg, v in rows if gg == g)
        k = (9 * len(vals) + 9) // 10
        assert out[g] == vals[k - 1], g


def test_selection_window_is_bucket_scoped(spark):
    """The phase-2 running-weight window must be partitioned by
    (group, bucket) — never a whole-group (let alone global) window —
    and the target join must be a (group, bucket)-keyed equi-join,
    never a cartesian/nested-loop. (The join is un-hinted since r6 —
    the per-group target table scales with group cardinality, so
    strategy stays with the planner: a statless in-memory frame like
    this one plans a shuffle join statically and AQE broadcasts it at
    runtime; a parquet-backed caller below the 64 MB threshold
    broadcasts statically.)"""
    import re
    df = spark.createDataFrame(_data(), "g string, v double")
    plan = (grouped_order_statistic(df, ["g"], "v")
            ._jdf.queryExecution().executedPlan().toString())
    specs = [m.group(1) for m in
             re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
             if "_v#" in m.group(1)]
    assert specs and all("_b#" in s for s in specs), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [ln for ln in plan.splitlines()
             if "Join" in ln and "_b#" in ln]
    assert joins, plan  # the target join is keyed on (group, bucket)


def test_weighted_statistic_matches_row_expansion(spark):
    """Weighted selection must equal the unweighted statistic over the
    weight-expanded multiset (the weighted-median contract)."""
    rows = [("g0", 10.0, 3), ("g0", 20.0, 1), ("g0", 30.0, 2),
            ("g1", 5.0, 5), ("g1", 50.0, 4), ("g1", 7.25, 1)]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    out = {r.g: (r.n, r.stat)
           for r in grouped_order_statistic(
               df, ["g"], "v", weight_col="w").collect()}
    for g in ("g0", "g1"):
        expanded = sorted(v for gg, v, w in rows if gg == g
                          for _ in range(w))
        k = (len(expanded) + 1) // 2
        assert out[g] == (len(expanded), expanded[k - 1]), g


def test_quantile_cont_bit_equals_percentile(spark):
    """grouped_quantile_cont must reproduce Spark's percentile()
    EXACTLY (==, no tolerance) — that bit-compatibility is what lets
    it replace the aggregate under a stored result hash. Covers
    interpolating and integral positions (n=11, p=0.5 lands on a row),
    singleton and pair groups, duplicate values straddling a bucket
    boundary, the p=0/p=1 endpoints, and ignored nulls."""
    from map_reduce_mongodb_spark.operators.quantiles import (
        grouped_quantile_cont)
    rows, x = [], 7
    for i in range(200):
        x = (x * 1103515245 + 12345) % (2 ** 31)
        rows.append(("g" + str(i % 2), float(x % 400) / 10.0))
    rows += [("g0", 17.0)] * 15 + [("g1", 17.0)] * 5
    rows += [("one", 42.5)]
    rows += [("two", 3.25), ("two", -9.75)]
    rows += [("eleven", float(v)) for v in range(11)]
    rows += [("g0", None), ("one", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {r.g: [r.n] + [r[f"q{i}"] for i in range(len(ps))]
           for r in grouped_quantile_cont(
               df, ["g"], "v", ps,
               out_cols=[f"q{i}" for i in range(len(ps))]).collect()}
    arr = ", ".join(repr(p) for p in ps)
    want = {r.g: [r.n] + list(r.qs)
            for r in df.groupBy("g").agg(
                F.count("v").alias("n"),
                F.expr(f"percentile(v, array({arr}))").alias("qs"))
            .collect()}
    assert got == want
