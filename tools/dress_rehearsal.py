"""Driver-mirror dress rehearsal.

Runs registry queries at a given scale factor and compares each
against its DuckDB oracle with the driver's semantics (row count +
column-name set + order-insensitive canonical value multiset), using
the exact canonicalizer the test suite uses. Prints one status line
per query and a final ``BAD=[...]`` summary line.

Usage:
    python tools/dress_rehearsal.py                 # first-50 window, sf0.01
    python tools/dress_rehearsal.py --all           # whole registry
    python tools/dress_rehearsal.py --names a b c   # specific queries
    python tools/dress_rehearsal.py --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="run every registered query, not just the window")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--bare", action="store_true",
                    help="plain SparkSession (no repo confs) — catches "
                         "missing-conf / worker-unpickling failures that "
                         "get_spark masks; closest to the grading driver")
    ap.add_argument("--master", default="local[*]",
                    help="bare-session master override (e.g. local[5]) "
                         "— partition-LAYOUT sensitivity sweeps: every "
                         "oracled query must stay exact under any "
                         "parallelism (the r6 cumsum bug class)")
    ap.add_argument("--conf", nargs="*", default=[],
                    help="extra bare-session k=v confs (e.g. "
                         "spark.sql.shuffle.partitions=13)")
    ap.add_argument("--fault-inject", action="store_true",
                    help="task-retry invariance sweep (VERDICT r8 #4):"
                         " wrap every io.table scan so each task's "
                         "FIRST attempt fails and is retried; pass a "
                         "fault-tolerant master too, e.g. --master "
                         "'local[8,4]' (maxFailures=4) or every job "
                         "dies on the injected failure")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="SparkContext.setCheckpointDir path — flips "
                         "cache.eager_checkpoint to the RELIABLE "
                         "DataFrame.checkpoint path (the 100 TB "
                         "cluster mode), exercising checkpoint-file "
                         "write/read instead of local blocks")
    args = ap.parse_args()

    import os

    if args.fault_inject:
        from map_reduce_mongodb_spark.io import FAULT_INJECT_ENV
        os.environ[FAULT_INJECT_ENV] = "1"
        if args.master == "local[*]":
            # default master has maxFailures=1 — injected failures
            # would kill every job instead of exercising retries
            args.master = "local[8,4]"

    import duckdb

    from map_reduce_mongodb_spark.io import TABLE_NAMES
    from map_reduce_mongodb_spark.queries import (
        ORACLE_SQL, QUERIES, _DRIVER_WINDOW)
    from map_reduce_mongodb_spark.session import get_spark
    from tests.conftest import canonical_rows

    if args.names:
        names = list(args.names)
    elif args.all:
        names = list(QUERIES)
    else:
        names = list(QUERIES)[:_DRIVER_WINDOW]

    def build_session():
        if args.bare:
            from pyspark.sql import SparkSession
            b = (SparkSession.builder.appName("dress-rehearsal-bare")
                 .master(args.master)
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false"))
            for kv in args.conf:
                k, _, v = kv.partition("=")
                b = b.config(k, v)
            s = b.getOrCreate()
        else:
            # honor --master (and the --fault-inject auto-upgrade to
            # a maxFailures>1 master) in the repo-conf path too —
            # without this, --fault-inject without --bare got a
            # maxFailures=1 session and every injected attempt-0
            # failure was fatal
            s = get_spark(app_name="dress-rehearsal",
                          master=(args.master
                                  if args.master != "local[*]" else None))
        if args.checkpoint_dir:
            # flips cache.eager_checkpoint's auto-switch to reliable
            # DataFrame.checkpoint (files under this dir; delete the
            # dir after the sweep — the cleanCheckpoints conf is
            # creation-time-only, not runtime-settable)
            s.sparkContext.setCheckpointDir(args.checkpoint_dir)
        return s

    spark = build_session()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    bad: list[str] = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            got = QUERIES[name](spark, args.sf_dir).toPandas()
            if name not in ORACLE_SQL:
                status = f"ROWS_ONLY rows={len(got)}"
            else:
                want = con.execute(ORACLE_SQL[name]).fetchdf()
                if sorted(got.columns) != sorted(want.columns):
                    status = (f"SCHEMA_MISMATCH spark={sorted(got.columns)}"
                              f" duckdb={sorted(want.columns)}")
                    bad.append(name)
                elif len(got) != len(want):
                    status = f"ROWS_MISMATCH spark={len(got)} duckdb={len(want)}"
                    bad.append(name)
                else:
                    g, w = canonical_rows(got), canonical_rows(want)
                    if g == w:
                        status = f"OK rows={len(got)}"
                    else:
                        only_g = list((g - w).elements())[:2]
                        only_w = list((w - g).elements())[:2]
                        status = (f"HASH_MISMATCH only_spark={only_g}"
                                  f" only_duckdb={only_w}")
                        bad.append(name)
        except Exception:
            status = "ERROR\n" + traceback.format_exc(limit=8)
            bad.append(name)
            # A fatal executor error (an OOM under a pathological
            # sweep config, say) kills the local SparkContext; every
            # later query would then ERROR on the corpse and the
            # sweep verdict would be unreadable (the first forced-
            # spill sweep lost 120 queries this way). Detect the dead
            # context, drop session-bound cache state (the shared
            # materializations hold DataFrames of the dead session),
            # and rebuild so the sweep keeps diagnosing per-query.
            try:
                dead = spark.sparkContext._jsc.sc().isStopped()
            except Exception:
                dead = True
            if dead:
                from map_reduce_mongodb_spark import cache
                try:
                    cache.release_caches()
                except Exception:
                    pass
                cache._LIVE.clear()
                cache._LIVE_RDDS.clear()
                cache.clear_shared()
                try:
                    spark.stop()  # clears the instantiated session
                except Exception:
                    pass
                spark = build_session()
                print(f"[{i}/{len(names)}] {name}: SparkContext died "
                      "— session rebuilt for the remaining queries",
                      flush=True)
        print(f"[{i}/{len(names)}] {name}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)

    print(f"BAD={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
