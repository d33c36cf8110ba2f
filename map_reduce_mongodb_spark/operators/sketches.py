"""Frequent-items (heavy-hitters) detection with a mergeable
Misra-Gries summary and an EXACT recount.

The two-phase design is the standard scale recipe for "which items
exceed a frequency threshold" when the item universe is too large to
hash-aggregate comfortably:

1. **Candidate phase** — each partition folds its token stream into a
   k-counter Misra-Gries summary (Arrow-batched ``mapInPandas``; the
   whole partition reduces to ≤k rows). The batched reduce is the
   "mergeable summaries" formulation (Agarwal, Cormode, Huang,
   Phillips, Wei, Yi — PODS'12): merge exact batch counts into the
   summary, then shrink to k entries by subtracting the (k+1)-th
   largest count from every counter and dropping the non-positive
   ones. Every shrink that removes mass m removes it from ≥ k+1
   counters at once, so a partition with n_p tokens subtracts at most
   n_p/(k+1) from any single item — hence any item with
   ``freq_p(x) > n_p/(k+1)`` survives partition p's summary, and (by
   averaging over partitions) any item with GLOBAL frequency
   > n/(k+1) survives in at least one partition. The candidate union
   is therefore a SUPERSET of the true heavy hitters.

2. **Exact phase** — the candidate set (≤ #partitions·k rows — tiny)
   broadcast-semi-joins back against the token stream, candidates are
   recounted EXACTLY (map-side-combined aggregate over a stream
   pre-filtered to ≤k distinct keys per partition), and the final
   filter ``freq·(k+1) > n`` applies exact integer arithmetic.

Net: exact answers with sketch-bounded intermediate state — the
aggregate's key space never exceeds the candidate set, no matter how
large the item universe is. At 100 TB with 10k partitions and k=50 the
candidate table is ≤500k short strings; if that outgrew the broadcast
threshold the semi-join degrades gracefully to a shuffle join with the
same plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_shrink(counters: dict, k: int) -> dict:
    """Shrink a counter dict to ≤k entries: subtract the (k+1)-th
    largest count from everything, keep the strictly positive."""
    if len(counters) <= k:
        return counters
    m = sorted(counters.values(), reverse=True)[k]
    return {t: c - m for t, c in counters.items() if c > m}


def misra_gries_candidates(tokens: DataFrame, col: str, k: int
                           ) -> DataFrame:
    """≤k Misra-Gries candidate items per partition of ``tokens``.

    Returns a 1-column DataFrame (``col``) of DISTINCT candidates —
    a guaranteed superset of every item whose global frequency
    exceeds n/(k+1) (module doc). Each batch is folded via its exact
    ``value_counts`` (vectorized) before the k-bound shrink, so the
    Python-side work is O(distinct-per-batch), not O(rows).
    """
    schema = tokens.select(col).schema

    def summarize(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for t, c in pdf[col].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            counters = _mg_shrink(counters, k)
        yield pd.DataFrame({col: list(counters.keys())})

    return tokens.select(col).mapInPandas(summarize, schema=schema)


def exact_heavy_hitters(tokens: DataFrame, col: str, k: int
                        ) -> DataFrame:
    """Items with global frequency strictly above n/(k+1), with EXACT
    counts and shares — via the two-phase candidate/recount plan in
    the module doc. Output: (``col``, freq BIGINT, share DOUBLE@6dp).
    """
    cands = misra_gries_candidates(tokens, col, k).distinct()
    total = tokens.agg(F.count(F.lit(1)).alias("n"))
    return (tokens.join(F.broadcast(cands), col, "left_semi")
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("freq"))
            .crossJoin(F.broadcast(total))
            .where(F.col("freq") * (k + 1) > F.col("n"))
            .select(col, "freq",
                    F.round(F.col("freq").cast("double")
                            / F.col("n"), 6).alias("share")))
