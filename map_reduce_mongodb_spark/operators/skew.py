"""Skew mitigation: salted two-phase aggregation.

For a groupBy on a hot/low-cardinality key, the shuffle sends every row
of a key to ONE reducer. Salting splits each key into `salts`
sub-groups aggregated in parallel (phase 1), then merges the partial
states per key (phase 2) — the manual form of map-side combine when the
combine itself is the bottleneck, and the standard fix for a single
pathological key (AQE splits skewed JOIN partitions, but a skewed
aggregation key still funnels into one task).

The caller supplies algebraic partial/final aggregate builders (count,
sum, min, max compose; avg = sum/count at the final step).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(df: DataFrame, key: str, salts: int,
                     partial_aggs: Callable[[], list[Column]],
                     final_aggs: Callable[[], list[Column]]) -> DataFrame:
    """groupBy(key) in two salted phases; result equals the direct
    groupBy for algebraic aggregates (property: the oracle of
    `salted_agg_skew` is the plain GROUP BY)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()),
                        F.lit(salts)))
    phase1 = salted.groupBy(key, "_salt").agg(*partial_aggs())
    return phase1.groupBy(key).agg(*final_aggs())
