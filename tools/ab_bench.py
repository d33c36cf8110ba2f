#!/usr/bin/env python
"""Targeted A/B measurement harness for optimization rounds.

Usage:
  python tools/ab_bench.py [--reps N] [--plans DIR --tag before|after] q1 q2 ...

Warms the JVM with two cheap queries, then for each named query runs
build+noop-save REPS times and prints min/median (min is the
contention-robust statistic on an otherwise-idle box). With --plans,
writes ``DIR/<query>_<tag>.txt`` containing ``explain('formatted')``.

Per-rep hygiene mirrors bench.py's --fresh mode (release caches,
clear SQL cache) so reps don't ride each other's persisted fragments;
shared_parquet artifacts (process-scoped by design) are NOT cleared —
rep 1 pays any cold shared build, so the reported min/median reflect
the steady-state consumer cost and the build cost is printed
separately from cache.shared_build_seconds.
"""
from __future__ import annotations

import argparse
import io
import statistics
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from map_reduce_mongodb_spark.cache import (  # noqa: E402
    release_caches, shared_build_seconds)
from map_reduce_mongodb_spark.queries import QUERIES  # noqa: E402
from map_reduce_mongodb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="ab_bench")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    # two DISTINCT cheap warmup queries (ADVICE r12: this previously
    # named filter_project twice while claiming two queries)
    for w in ("filter_project", "topk_orders"):
        QUERIES[w](spark, args.sf_dir).write.format("noop") \
            .mode("overwrite").save()

    for name in args.names:
        fn = QUERIES[name]
        if args.plans:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = Path(args.plans) / f"{name}_{args.tag}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(buf.getvalue())
        reps = []
        for i in range(args.reps):
            release_caches()
            spark.catalog.clearCache()
            sc.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
        print(f"{min(reps):8.3f} min {statistics.median(reps):8.3f} med "
              f"{reps}  {name}", flush=True)
    release_caches()
    builds = shared_build_seconds()
    if builds:
        print("shared builds paid this process:")
        for k, v in sorted(builds.items(), key=lambda kv: -kv[1]):
            print(f"  {v:8.3f}  {k}")


if __name__ == "__main__":
    main()
