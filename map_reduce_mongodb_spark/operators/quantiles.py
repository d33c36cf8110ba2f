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
    if bucket is None:
        bucket = F.floor(F.col(value_col))
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    d = df.select(*group_cols, F.col(value_col).alias("_v"),
                  bucket.cast("long").alias("_b"), w.alias("_w"))
    hist = d.groupBy(*group_cols, "_b").agg(F.sum("_w").alias("_c"))
    wcum = (Window.partitionBy(*group_cols).orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy(*group_cols)
    cum = (hist.withColumn("_cw", F.sum("_c").over(wcum))
           .withColumn("n", F.sum("_c").over(wall))
           .withColumn("_k", F.expr(rank_sql)))
    tgt = (cum.where((F.col("_cw") >= F.col("_k"))
                     & (F.col("_cw") - F.col("_c") < F.col("_k")))
           .select(*group_cols, "_b", "n",
                   (F.col("_k") - (F.col("_cw") - F.col("_c")))
                   .alias("_off")))
    # tgt is one row per group — un-hinted because group cardinality
    # is the caller's (AQE broadcasts it when small, shuffles the
    # group-keyed equi-join when a high-cardinality grouping outgrows
    # broadcast range).
    sliced = d.join(tgt, [*group_cols, "_b"])
    # Partition by (group, bucket): the partition is the target-bucket
    # sliver, never the whole group. The smallest value whose running
    # weight reaches the residual offset is the statistic — with unit
    # weights this is exactly the _off-th smallest. Ties in _v order
    # arbitrarily inside the window, but every candidate crossing row
    # shares the same value, so min() is deterministic.
    win = (Window.partitionBy(*group_cols, "_b").orderBy("_v")
           .rowsBetween(Window.unboundedPreceding, 0))
    return (sliced.withColumn("_cw2", F.sum("_w").over(win))
            .where(F.col("_cw2") >= F.col("_off"))
            .groupBy(*group_cols, "n")
            .agg(F.min("_v").alias(out_col))
            .select(*group_cols, "n", out_col))
