"""Cache hygiene for persisted intermediates.

Several operators legitimately ``persist()`` a mid-plan DataFrame (LSH
signatures consumed by both sides of a self-join, shingle arrays read
by banding AND verification) — recomputing those per consumer is the
wrong trade at corpus scale. But a long-lived session sweeping all ~58
registered queries (bench.py, the grading driver) would otherwise
accumulate every query's caches and lean on LRU eviction.

Contract: operators call :func:`tracked_persist` instead of
``DataFrame.persist``; every registered query builder releases the
PREVIOUS query's caches on entry (see ``queries.query``), so live
cache is bounded by one query regardless of how many the session runs;
``release_caches()`` at the end of a sweep drops the last one.
Releasing is always safe — an unpersisted plan silently recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                    ) -> DataFrame:
    """persist() + register for bulk release. MEMORY_AND_DISK (the
    default) spills instead of evicting at scale."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns how
    many were released."""
    n = len(_LIVE)
    while _LIVE:
        _LIVE.pop().unpersist()
    return n
