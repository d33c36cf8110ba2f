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
Releasing a persisted DataFrame is always safe — the plan silently
recomputes. Released checkpoint RDDs (:func:`track_rdd`) are NOT
recomputable: a query result built on one must be consumed before the
next registered query is built (true of every driver/bench/test flow
here, which collect each query before building the next).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []
_LIVE_RDDS: list = []  # py4j handles of localCheckpoint-persisted RDDs


def tracked_persist(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                    ) -> DataFrame:
    """persist() + register for bulk release. MEMORY_AND_DISK (the
    default) spills instead of evicting at scale."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def track_rdd(handle) -> None:
    """Register a JVM RDD handle (e.g. a DataFrame.localCheckpoint's
    backing RDD, which DataFrame.unpersist() does NOT release) for
    bulk release. After release the checkpointed DataFrame is dead —
    only register blocks whose consumer finished or whose result the
    next query rebuild can recompute from source."""
    _LIVE_RDDS.append(handle)


def release_caches() -> int:
    """Unpersist every tracked DataFrame and checkpoint RDD
    (non-blocking); returns how many were released."""
    n = len(_LIVE) + len(_LIVE_RDDS)
    while _LIVE:
        _LIVE.pop().unpersist()
    while _LIVE_RDDS:
        _LIVE_RDDS.pop().unpersist(False)
    return n
