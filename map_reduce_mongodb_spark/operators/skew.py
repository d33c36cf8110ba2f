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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def cap_group_fanout(df: DataFrame, key: str | list[str], max_n: int,
                     order_col: str | Column | list[str | Column]
                     ) -> DataFrame:
    """Deterministically keep at most ``max_n`` rows per key — the
    skew defense for inverted-index SELF-joins, whose output is
    Σ per-key-fanout²: one hot posting list (a mega-customer's
    basket, a stopword's document list, a boilerplate shingle) of
    |P| rows contributes |P|² pairs and can dominate the whole
    stage. Capping bounds every key's contribution at max_n² at the
    cost of recall on pairs that co-occur ONLY under hot keys — the
    `max_shingle_df` / LSH hot-bucket trade (members of a hot list
    are near-uninformative for similarity anyway, and pairs sharing
    any other, colder key are still found).

    ``order_col`` pins WHICH rows survive (rank ascending; a single
    column or a LIST whose concatenation must be UNIQUE per key —
    with duplicate order values row_number breaks ties by physical
    row order and the survivor set flaps between runs, the exact
    nondeterminism this dial exists to prevent; pass tiebreak columns
    until the order is total, ADVICE r6). Off-path by default
    everywhere: oracle-checked queries keep exact semantics; this is
    the documented dial for the 100 TB deployment."""
    keys = [key] if isinstance(key, str) else list(key)
    order = (list(order_col) if isinstance(order_col, (list, tuple))
             else [order_col])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("_fr", F.row_number().over(w))
            .where(F.col("_fr") <= max_n).drop("_fr"))
