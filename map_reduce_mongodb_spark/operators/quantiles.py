"""Grouped EXACT order statistics over continuous values — selection
without a per-group data sort.

`lang_median_doclen` computes grouped medians over a DISCRETE value
(word counts) by aggregating to a (group, value, count) histogram and
scanning its cumulative counts. Continuous values (prices, latencies,
scores) defeat that directly — every value is distinct, so the
"histogram" is the data. This module generalizes the same two-phase
selection to continuous columns:

  Phase 1 (coarse): quantize values to integer buckets (caller-chosen
      expression, e.g. ``floor(v)``), aggregate to a (group, bucket,
      count) histogram — fact-sized work, map-side combined. Cumulative
      counts over that BOUNDED histogram (window partitioned by group,
      ordered by bucket) locate, per group, the single bucket containing
      the target rank k and the residual offset of k within it.
  Phase 2 (exact): broadcast-join the one-row-per-group target back to
      the data, keeping only rows in each group's target bucket —
      an expected |group|/|buckets| sliver — and pick the offset-th
      smallest value inside it with a tiny per-group sort.

The result is the EXACT k-th order statistic (duplicates and all): the
coarse phase only narrows where the sort happens. At 100 TB the only
fact-sized operations are one aggregate and one semi-join-shaped probe;
no group's full value set ever passes through a single task — only its
target-bucket sliver does (choose the bucket expression so slivers stay
small; a pathological single-bucket distribution degrades to the plain
per-group sort it replaces).

Used by `robust_mad_outliers` (median + median-absolute-deviation, two
chained selections) — the robust outlier gate that survives the heavy
tails that break z-scores.

:func:`grouped_quantile_cont` extends the same selection to the SQL
``quantile_cont`` contract (linear interpolation between the two
straddling order statistics, several quantiles at once): one bounded
histogram locates EVERY target rank, one sliver probe fetches them all,
and the interpolation arithmetic mirrors Spark's ``percentile()``
expression bit-for-bit — so it can replace that aggregate (whose buffer
holds a group's every value inside one task) wherever exact
interpolated quantiles are needed at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_order_statistic(df: DataFrame, group_cols: list[str],
                            value_col: str,
                            rank_sql: str = "(n + 1) div 2",
                            bucket: Column | None = None,
                            out_col: str = "stat",
                            weight_col: str | None = None) -> DataFrame:
    """Per group, the exact ``k``-th smallest value of `value_col`,
    where k is ``rank_sql`` evaluated over the group size ``n`` (the
    default is the lower median). With ``weight_col`` (positive
    integers), n is the group's TOTAL WEIGHT and the result is the
    weighted order statistic: the smallest value whose cumulative
    weight reaches k (weight w ≡ w duplicated rows — the weighted-
    median contract). Returns one row per group:
    ``group_cols + [n, out_col]``.

    ``rank_sql`` must use integer arithmetic (``div``, not ``/``) and
    evaluate to 1..n — the Spark/DuckDB division-dialect trap is on
    the CALLER's side of this contract."""
    return grouped_order_statistics(df, group_cols, value_col,
                                    {out_col: rank_sql}, bucket=bucket,
                                    weight_col=weight_col)


def grouped_order_statistics(df: DataFrame, group_cols: list[str],
                             value_col: str, ranks: dict[str, str],
                             bucket: Column | None = None,
                             weight_col: str | None = None) -> DataFrame:
    """Several exact order statistics of ONE (group, value) frame from
    ONE histogram and ONE sliver probe: ``ranks`` maps each output
    column to its rank expression (the :func:`grouped_order_statistic`
    contract). A caller needing e.g. both winsorization bounds (p5 and
    p95 ranks) pays one cumulative-histogram pass and one probe join
    instead of rebuilding both per rank — at any scale the histogram
    aggregate and the probe are the fact-sized stages, so k ranks for
    the price of one. Returns ``group_cols + [n] + list(ranks)``."""
    if not ranks:
        raise ValueError("ranks must be non-empty")
    if bucket is None:
        bucket = F.floor(F.col(value_col))
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    names = list(ranks)
    d = df.select(*group_cols, F.col(value_col).alias("_v"),
                  bucket.cast("long").alias("_b"), w.alias("_w"))
    hist = d.groupBy(*group_cols, "_b").agg(F.sum("_w").alias("_c"))
    wcum = (Window.partitionBy(*group_cols).orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy(*group_cols)
    cum = (hist.withColumn("_cw", F.sum("_c").over(wcum))
           .withColumn("n", F.sum("_c").over(wall)))
    # One histogram row fans out to every rank target (tagged _t); the
    # containing-bucket filter then keeps exactly one row per
    # (group, target).
    tgt = (cum.select(*group_cols, "_b", "_c", "_cw", "n",
                      F.explode(F.array(*[
                          F.struct(F.lit(t).alias("_t"),
                                   F.expr(ranks[name]).alias("_k"))
                          for t, name in enumerate(names)]))
                      .alias("_tk"))
           .select(*group_cols, "_b", "_c", "_cw", "n",
                   F.col("_tk._t").alias("_t"),
                   F.col("_tk._k").alias("_k"))
           .where((F.col("_cw") >= F.col("_k"))
                  & (F.col("_cw") - F.col("_c") < F.col("_k")))
           .select(*group_cols, "_b", "_t", "n",
                   (F.col("_k") - (F.col("_cw") - F.col("_c")))
                   .alias("_off")))
    # tgt is one row per (group, target) — un-hinted because group
    # cardinality is the caller's (AQE broadcasts it when small,
    # shuffles the group-keyed equi-join when a high-cardinality
    # grouping outgrows broadcast range).
    sliced = d.join(tgt, [*group_cols, "_b"])
    # Partition by (group, bucket, target): the partition is the
    # target-bucket sliver, never the whole group. The smallest value
    # whose running weight reaches the residual offset is the
    # statistic — with unit weights this is exactly the _off-th
    # smallest. Ties in _v order arbitrarily inside the window, but
    # every candidate crossing row shares the same value, so min() is
    # deterministic.
    win = (Window.partitionBy(*group_cols, "_b", "_t").orderBy("_v")
           .rowsBetween(Window.unboundedPreceding, 0))
    stats = (sliced.withColumn("_cw2", F.sum("_w").over(win))
             .where(F.col("_cw2") >= F.col("_off"))
             .groupBy(*group_cols, "n", "_t")
             .agg(F.min("_v").alias("_stat")))
    return (stats.groupBy(*group_cols, "n")
            .agg(*[F.min(F.when(F.col("_t") == t, F.col("_stat")))
                   .alias(name) for t, name in enumerate(names)])
            .select(*group_cols, "n", *names))


def grouped_quantile_cont(df: DataFrame, group_cols: list[str],
                          value_col: str, ps: list[float],
                          bucket: Column | None = None,
                          out_cols: list[str] | None = None) -> DataFrame:
    """Per group, the EXACT linearly-interpolated quantile of
    `value_col` for EVERY p in ``ps`` — the ANSI ``quantile_cont`` /
    Spark ``percentile()`` contract — from ONE bounded histogram and
    ONE target-bucket probe. Returns ``group_cols + [n] + out_cols``
    (``out_cols`` defaults to ``q_<p>``); ``n`` is the group's
    non-null value count.

    Semantics are bit-compatible with ``percentile()`` (pinned by
    tests/test_quantiles.py) with ONE documented divergence: a group
    whose every value is null is ABSENT from the output (it has no
    order statistic), where the aggregate would emit a NULL row —
    callers needing those groups must outer-join them back. Otherwise:
    nulls ignored; 0-based position
    ``pos = p * (n - 1)``; the result is ``v[pos]`` when ``pos`` is
    integral, else ``v[floor] * (ceil - pos) + v[ceil] * (pos -
    floor)`` with the factors computed in exactly that operand order,
    matching Spark's expression so replacing the aggregate cannot
    shift a stored hash. The difference is WHERE the work happens:
    ``percentile()``'s aggregation buffer materializes a group's
    every value inside one task (the per-group memory hotspot that
    OOMs first at 100 TB), while here the fact-sized operations are
    one map-side-combinable aggregate and one (group, bucket)-keyed
    sliver join — only the buckets containing target ranks are ever
    sorted, and the 2·|ps| targets per group share one histogram and
    one probe."""
    if not ps:
        raise ValueError("ps must be non-empty")
    if out_cols is None:
        out_cols = [f"q_{p}" for p in ps]
    if len(out_cols) != len(ps):
        raise ValueError("out_cols must match ps")
    if bucket is None:
        bucket = F.floor(F.col(value_col))
    d = (df.where(F.col(value_col).isNotNull())
         .select(*group_cols, F.col(value_col).alias("_v"),
                 bucket.cast("long").alias("_b")))
    hist = d.groupBy(*group_cols, "_b").agg(
        F.count(F.lit(1)).alias("_c"))
    wcum = (Window.partitionBy(*group_cols).orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy(*group_cols)
    cum = (hist.withColumn("_cw", F.sum("_c").over(wcum))
           .withColumn("n", F.sum("_c").over(wall)))

    def _pos(p: float) -> Column:
        return F.lit(float(p)) * (F.col("n") - 1).cast("double")

    # Target ranks, 1-based: the floor and ceil order statistics of
    # every quantile, tagged t = 2i (floor side) / 2i + 1 (ceil side).
    # When pos is integral both sides resolve to rank floor+1 via the
    # least() clamp, so no target is ever missing.
    targets = []
    for i, p in enumerate(ps):
        k_lo = (F.floor(_pos(p)).cast("long") + 1)
        k_hi = F.least(k_lo + 1,
                       F.ceil(_pos(p)).cast("long") + 1, F.col("n"))
        targets.append(F.struct(F.lit(2 * i).alias("_t"),
                                k_lo.alias("_k")))
        targets.append(F.struct(F.lit(2 * i + 1).alias("_t"),
                                k_hi.alias("_k")))
    tgt = (cum.select(*group_cols, "_b", "_c", "_cw", "n",
                      F.explode(F.array(*targets)).alias("_tk"))
           .select(*group_cols, "_b", "_c", "_cw", "n",
                   F.col("_tk._t").alias("_t"), F.col("_tk._k").alias("_k"))
           .where((F.col("_cw") >= F.col("_k"))
                  & (F.col("_cw") - F.col("_c") < F.col("_k")))
           .select(*group_cols, "_b", "_t", "n",
                   (F.col("_k") - (F.col("_cw") - F.col("_c")))
                   .alias("_off")))
    # (group, bucket)-keyed equi-join; a data row fans out only to the
    # targets living in ITS bucket (usually 0, at most 2·|ps|). The
    # phase-2 window partitions per TARGET so each sliver sort sees
    # one bucket's rows, never a whole group.
    sliced = d.join(tgt, [*group_cols, "_b"])
    win = (Window.partitionBy(*group_cols, "_b", "_t").orderBy("_v")
           .rowsBetween(Window.unboundedPreceding, 0))
    stats = (sliced.withColumn("_cw2", F.count(F.lit(1)).over(win))
             .where(F.col("_cw2") >= F.col("_off"))
             .groupBy(*group_cols, "n", "_t")
             .agg(F.min("_v").alias("_stat")))
    wide = stats.groupBy(*group_cols, "n").agg(*[
        F.min(F.when(F.col("_t") == t, F.col("_stat"))).alias(f"_s{t}")
        for t in range(2 * len(ps))])
    outs = []
    for i, (p, name) in enumerate(zip(ps, out_cols)):
        pos = _pos(p)
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        v_lo, v_hi = F.col(f"_s{2 * i}"), F.col(f"_s{2 * i + 1}")
        outs.append(
            F.when(lo == hi, v_lo)
            .otherwise(v_lo * (hi.cast("double") - pos)
                       + v_hi * (pos - lo.cast("double")))
            .alias(name))
    return wide.select(*group_cols, "n", *outs)
