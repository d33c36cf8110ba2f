#!/usr/bin/env python
"""Benchmark harness (driver contract): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The FINAL stdout line is a SHORT JSON the
driver can always capture in its tail window:

  {"metric": "...", "value": <total_sec>,
   "value_production": <sec>, "unit": "sec", "sf": <sf>,
   "n_queries": N}

The lines before it carry the full detail — one full JSON line with
per-query seconds ("queries") and shared-artifact build attribution
("shared_builds"), then short per-query chunk lines sized for the
driver's 2000-char tail window (biggest baseline-deviators last). The
full summary is also written to BENCH_PERQUERY.json (tracked) and
BENCH_LOCAL.json (gitignored scratch).

Each query is executed to completion with the `noop` sink (full
computation, no driver collect — measures the engine, not result
marshalling).

``--fresh``: clear the SQL CacheManager between queries. In the default
mode Spark silently substitutes plan fragments persisted by EARLIER
queries in the same session (e.g. one query's shingle cache feeding
another's), which flatters per-query numbers; --fresh gives each query
a cold cache, matching the grading driver's one-query-per-check
profile, while still sharing the warmed JVM.

``--isolate [names...]``: run each query in its OWN subprocess/JVM —
the strongest isolation (no shared JIT, cache, or broadcast state);
use to arbitrate when --fresh numbers look suspicious. Much slower
(~10 s JVM startup per query), so optionally pass query names to
isolate only those; per-query times exclude the session bootstrap
(measured inside the child)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from map_reduce_mongodb_spark.cache import (  # noqa: E402
    release_caches, shared_build_seconds)
from map_reduce_mongodb_spark.queries import QUERIES  # noqa: E402
from map_reduce_mongodb_spark.session import get_spark  # noqa: E402

# md5-hashed ORACLE TWINS: these queries exist so the corresponding
# operator is DuckDB-reproducible (md5 is the only rich hash both
# engines share); each has a registered xxhash64 production twin that
# runs the IDENTICAL plan shape on cheap 8-byte hashes. ALL queries
# are timed by default so ``total_query_wall_sec`` stays comparable
# across rounds (r03 skipped the twins, which made its headline read
# partly as a speedup that was actually queries removed — see
# ADVICE r3); the summary additionally reports
# ``value_production`` = the same total minus these correctness
# instruments (md5 oracle twins + ANN probe-all exactness gates),
# which is the number that reflects the engine's production paths.
# Pass --prod to skip timing them entirely.
ORACLE_TWINS = {
    "winnow_fingerprints",   # production: winnow_fingerprints_fast
    "winnow_dup_pairs",      # production: winnow_dup_pairs_fast
    "ngram_jaccard_pairs",   # production: ngram_jaccard_pairs_fast
    "minhash_lsh_md5",       # production: minhash_dedup_pairs (xxhash64)
    # ANN exactness instruments (r5): identical index builds probed /
    # re-ranked EXHAUSTIVELY so the result provably equals brute force
    # for ANY trained index — they exist to hash-check the rows-only
    # production twins (queries.py::ROWS_ONLY_GATES) and are by
    # construction the slow siblings (probe-everything is the point).
    "ivf_kmeans_probe_all",  # production: ivf_kmeans_topk
    "pq_rerank_all",         # production: pq_adc_topk
    "nsw_probe_all",         # production: nsw_topk
    "ivfpq_probe_all",       # production: ivfpq_topk
}


def _baseline_queries() -> dict[str, float]:
    """Per-query seconds from the builder's quiet-machine reference
    run — BENCH_BASELINE.json (COMMITTED snapshot, survives a clean
    checkout; BENCH_LOCAL.json is gitignored scratch overwritten by
    every run and only used as fallback). This is what lets a loaded
    run self-diagnose: any query that blows past RETRY_FACTOR× its
    reference time is re-run once and the minimum kept (VERDICT r6
    #2: the r6 driver artifact recorded 572.8 s vs 301.9 s local
    purely from machine contention). Missing files / new queries →
    no retry for them."""
    here = Path(__file__).resolve().parent
    for name in ("BENCH_BASELINE.json", "BENCH_LOCAL.json"):
        try:
            d = json.loads((here / name).read_text())
            return {k: float(v) for k, v in d.get("queries", {}).items()}
        except (OSError, ValueError):
            continue
    return {}


# Retry a query once when its wall time exceeds BOTH this multiple of
# its committed baseline AND the absolute floor. The floor exists so
# millisecond-scale jitter can't trigger retries, but r7 set it at
# 2.0 s — above the point where contention tails matter: BENCH_r07's
# three >2× per-query ratios (0.4→1.1 s class) all sat under the old
# floor, so the artifact couldn't distinguish their load noise from a
# plan regression (VERDICT r7 #3). 0.5 s keeps sub-half-second jitter
# retry-free while letting small-query contention self-diagnose.
# RETRY_BUDGET_SEC bounds
# the total wall time spent on second attempts: on a machine loaded
# for the WHOLE run, unbounded retries would double the bench instead
# of diagnosing it (and flirt with any harness-side timeout) — after
# the budget, first-attempt times stand and the loadavg tells the
# story.
RETRY_FACTOR = 1.6
RETRY_FLOOR_SEC = 0.5
# 150 s (was 90 s through r12): the r13 cold-retry semantics make each
# second attempt re-pay shared builds, so the same wall budget covers
# far fewer retries — the first r13 run spent 90 s on 40 retries and
# STARVED 16 suspects carrying ~17 s of unadjusted load noise (40.5 s
# observed vs 23.8 s committed-baseline for the same set). The bump
# restores the r12-era COVERAGE under the honest semantics; trigger
# predicate, floor and factor are unchanged.
RETRY_BUDGET_SEC = 150.0


def _should_retry(t1: float, base: float | None,
                  retry_spent: float) -> bool:
    """One re-run iff: a committed reference exists for the query, the
    first attempt exceeded both the absolute floor and FACTOR× the
    reference, and the total seconds already spent on second attempts
    are under budget."""
    return (base is not None and retry_spent < RETRY_BUDGET_SEC
            and t1 > max(RETRY_FLOOR_SEC, RETRY_FACTOR * base))


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


# Load-gate (r12, VERDICT r11 #2a): a bench started into another
# process's load tail prints a contaminated artifact (BENCH_r11 began
# at loadavg 3.54 and burned 73 retries). Before the timed loop, wait
# for the 1-min load to drain below the gate — bounded so a genuinely
# busy host still produces an artifact (the loadavg telemetry then
# explains it). Gate values are conservative: the bench itself idles
# while waiting, so any residual load is someone else's.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "1.0"))
LOAD_GATE_TIMEOUT_SEC = float(
    os.environ.get("SPARK_GRAFT_LOAD_GATE_TIMEOUT", "120"))


def _wait_for_quiet() -> float:
    """Sleep until 1-min loadavg < LOAD_GATE or the wait budget runs
    out; returns seconds waited (recorded in the artifact)."""
    t0 = time.perf_counter()
    while True:
        la = _loadavg()
        waited = time.perf_counter() - t0
        if not la or la[0] < LOAD_GATE or waited >= LOAD_GATE_TIMEOUT_SEC:
            return round(waited, 1)
        time.sleep(5.0)


def _run_one(name: str, sf_dir: str) -> float:
    """Child-process entry: build a session, run ONE query, print its
    wall time (bootstrap excluded) on the last line."""
    spark = get_spark(app_name=f"bench-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    print(round(time.perf_counter() - t0, 3))


def _isolate(names: list[str], sf_dir: str) -> dict[str, float]:
    import subprocess
    times = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, __file__, "--run-one", name],
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            capture_output=True, text=True, check=True)
        times[name] = float(out.stdout.strip().splitlines()[-1])
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")
    args = sys.argv[1:]
    if "--run-one" in args:
        _run_one(args[args.index("--run-one") + 1], sf_dir)
        return
    if "--isolate" in args:
        picked = [a for a in args if not a.startswith("--")]
        times = _isolate(picked or list(QUERIES), sf_dir)
        _emit_summary({
            "metric": "total_query_wall_sec_isolated",
            "value": round(sum(times.values()), 3),
            "unit": "sec", "queries": times, "sf": sf,
        })
        return
    # Gate on external load BEFORE the session boots: the warmup and
    # session startup generate their own (self-inflicted, harmless)
    # load tail, so gating later would mostly wait on ourselves.
    gate_wait = _wait_for_quiet()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query times measure
    # execution, not first-touch JIT/IO. TIERED (r13, VERDICT r12 #7):
    # two cheap fixed queries run FIRST so that when the rotation puts
    # an expensive shared-build payer at the head of the registry, its
    # build (the 95 s cold-JVM jaccard materialization) runs against a
    # JIT-warm executor path instead of a stone-cold one. Purely
    # wall-clock outside the timed loop — the timed sweep below still
    # times every query, same trigger, same sink.
    for _warm in ("filter_project", "topk_orders"):
        if _warm in QUERIES:
            QUERIES[_warm](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
    next(iter(QUERIES.values()))(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    fresh = "--fresh" in sys.argv[1:]
    prod_only = "--prod" in sys.argv[1:]
    baseline = _baseline_queries()
    load_start = _loadavg()
    times: dict[str, float] = {}
    retries: dict[str, list[float]] = {}

    def _timed(name, fn) -> float:
        from map_reduce_mongodb_spark.cache import consumer_scope
        t0 = time.perf_counter()
        with consumer_scope(name):
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    first_attempt: dict[str, float] = {}
    budget_starved: list[str] = []
    for name, fn in QUERIES.items():
        if name in ORACLE_TWINS and prod_only:
            continue
        if fresh:
            release_caches()
            spark.catalog.clearCache()
        t1 = _timed(name, fn)
        first_attempt[name] = t1
        times[name] = t1
    # Snapshot the sweep's shared-build attribution BEFORE the retry
    # pass: cold retries (below) rebuild shared artifacts, which would
    # overwrite the sweep's first-payer seconds with warm rebuild times.
    from map_reduce_mongodb_spark.cache import (forget_shared_artifacts,
                                                shared_build_metrics)
    sweep_shared_builds = shared_build_seconds()
    sweep_build_metrics = shared_build_metrics()
    # Retry pass (r12, VERDICT r11 #2b): retries used to run inline in
    # REGISTRY order, so an early run of moderate outliers could drain
    # RETRY_BUDGET_SEC before the worst deviations were reached —
    # BENCH_r11 starved exactly its 16 biggest outliers. Same trigger
    # predicate, same budget, same one-re-run-keep-the-min semantics;
    # the budget is spent WORST-DEVIATION-FIRST (t1/baseline desc),
    # so whatever the budget covers is always the most load-suspect
    # slice of the run.
    #
    # COLD retries (r13, VERDICT r12 #1): every second attempt now runs
    # with the previous query's tracked caches released, the SQL cache
    # cleared, AND the cross-query shared-artifact memo forgotten, so a
    # retried first-payer query re-pays its shared build instead of
    # re-reading the materialization (BENCH_r12's warm retries collapsed
    # scd2_events_replay 3.306 s → 0.095 s and removed ~61 s of real
    # first-payer work from value_retry_adjusted). min(t1, t2) can now
    # only remove load noise, never attributed build work; on an idle
    # machine retry pairs land within ~2× of each other. The budget
    # accounting is unchanged (sum of second-attempt seconds ≤ 90 s) —
    # cold retries spend it faster, and worst-first ordering decides
    # who gets covered. "value" stays retry-adjusted (same formula as
    # every BENCH_r* artifact), now with cold-retry semantics.
    suspects = sorted(
        (n for n, t1 in first_attempt.items()
         if _should_retry(t1, baseline.get(n), 0.0)),
        # max() guards a future 0.0 committed baseline entry (times are
        # rounded to 3 decimals) from a ZeroDivisionError that would
        # lose the whole artifact (ADVICE r12).
        key=lambda n: -(first_attempt[n] / max(baseline[n], 1e-9)))
    for name in suspects:
        if not _should_retry(first_attempt[name], baseline.get(name),
                             sum(ts[1] for ts in retries.values())):
            # budget exhausted: remaining (smaller-deviation) suspects
            # stay un-retried; their times are load-suspect and
            # UNADJUSTED in every total below.
            budget_starved.append(name)
            continue
        release_caches()
        spark.catalog.clearCache()
        forget_shared_artifacts()
        t2 = _timed(name, QUERIES[name])
        retries[name] = [first_attempt[name], t2]
        times[name] = min(first_attempt[name], t2)
    release_caches()  # query builders release the previous query's

    _emit_summary({
        "metric": ("total_query_wall_sec_prod" if prod_only
                   else "total_query_wall_sec"),
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # Engine total minus the correctness instruments — the honest
        # production number (see ORACLE_TWINS note).
        "value_production": round(
            sum(t for n, t in times.items() if n not in ORACLE_TWINS),
            3),
        # First-payer attribution: wall seconds each cross-query shared
        # artifact (pair tables, CC labels, fingerprint tables) took to
        # materialize. These seconds are INSIDE whichever consumer
        # query ran first — read family totals, not single rows.
        # Snapshotted before the retry pass (cold retries rebuild).
        "shared_builds": sweep_shared_builds,
        # Per-build scalar metrics (CC round counts etc.) so iterative
        # builds' regressions are attributable (VERDICT r6 #3).
        "shared_build_metrics": sweep_build_metrics,
        # Machine contention telemetry: 1/5/15-min load averages at
        # start/end plus every retried query's [first, second] times —
        # a degraded artifact now explains itself (VERDICT r6 #2).
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
        # Seconds spent in the pre-start load gate (r12): >0 means the
        # bench deferred its start to let another process's load drain.
        "load_gate_wait_sec": gate_wait,
        "retries": retries,
        # Retry-adjusted headline (VERDICT r8 #6): the three numbers a
        # round-over-round comparison needs WITHOUT a quiet re-run.
        #   value_first_attempt  — sum of first attempts (the nominal a
        #     naive reading assumes "value" is);
        #   value_retry_adjusted — sum of min-over-attempts (what
        #     "value" computes today, named explicitly so the headline
        #     survives any future change to "value");
        #   baseline_total       — the committed quiet-machine seconds
        #     for the BASELINE-COVERED subset of this run's queries;
        #     the matching numerator is value_baseline_covered, so
        #     value_baseline_covered / baseline_total is the
        #     load-arbitrated round ratio even when this run has
        #     queries the committed baseline lacks (a new query before
        #     the baseline refresh would otherwise inflate the ratio
        #     by its full runtime — r9 self-review).
        # retry_budget_starved lists queries over the retry trigger
        # left un-retried (budget exhausted) — their times are
        # load-suspect and unadjusted in every total above.
        # queries_without_baseline names this run's queries absent
        # from the committed baseline (no retry arbitration, excluded
        # from both ratio legs) — [] means the sets coincide.
        "value_first_attempt": round(sum(first_attempt.values()), 3),
        "value_retry_adjusted": round(sum(times.values()), 3),
        "value_baseline_covered": round(
            sum(t for n, t in times.items() if n in baseline), 3),
        "baseline_total": round(
            sum(baseline[n] for n in times if n in baseline), 3),
        "retry_budget_starved": budget_starved,
        "queries_without_baseline": sorted(
            n for n in times if n not in baseline),
    })


def _query_chunks(queries: dict[str, float],
                  limit: int = 380) -> list[dict[str, float]]:
    """Split the per-query map into JSON lines each under ``limit``
    payload chars, ordered so the LAST chunks carry the queries with
    the biggest |log(time/baseline)| deviation. The driver's capture
    keeps only a 2000-char tail of stdout (measured: every committed
    BENCH_r* artifact has len(tail) == 2000), which a 261-entry map
    (~8 KB) can never fit — so the tail is spent on the most
    audit-relevant slice: the biggest movers vs the committed
    baseline land nearest the end, right before the final short line
    (VERDICT r12 #2). The complete map goes to BENCH_PERQUERY.json."""
    import math
    baseline = _baseline_queries()

    def _dev(n: str) -> float:
        b = baseline.get(n)
        if not b:
            return -1.0  # no committed reference: least informative
        return abs(math.log(max(queries[n], 1e-3) / max(b, 1e-3)))

    chunks: list[dict[str, float]] = []
    cur: dict[str, float] = {}
    cur_len = 0
    for n in sorted(queries, key=_dev):
        ent_len = len(n) + len(repr(queries[n])) + 4
        if cur and cur_len + ent_len > limit:
            chunks.append(cur)
            cur, cur_len = {}, 0
        cur[n] = queries[n]
        cur_len += ent_len
    if cur:
        chunks.append(cur)
    return chunks


def _emit_summary(summary: dict) -> None:
    """Emit the summary truncation-proof. The driver keeps only a
    2000-char TAIL window of process output — smaller than any full
    per-query dict — so BENCH_r02..r04 arrived truncated mid-JSON
    ("parsed": null). Layout (r13, VERDICT r12 #2):

      1. the FULL one-line JSON (per-query map, retries, shared-build
         attribution) — for local logs; scrolls out of the tail;
      2. per-query CHUNK lines ({"qchunk": i, "of": N, "q": {...}}),
         each short enough that the tail window captures the last few
         — ordered so the biggest baseline-deviators come LAST (the
         slice a regression audit needs most);
      3. the FINAL short JSON (totals only — always parseable).

    The complete per-query map is additionally written to
    BENCH_PERQUERY.json (tracked in git, committed with each round) and
    BENCH_LOCAL.json (gitignored scratch). Console progress stays
    disabled in session defaults so Spark noise can't land between
    lines."""
    full_line = json.dumps(summary)
    short = {k: v for k, v in summary.items()
             if k in ("metric", "value", "value_production", "unit",
                      "sf", "loadavg_start", "loadavg_end",
                      "value_retry_adjusted", "value_baseline_covered",
                      "baseline_total")}
    short["n_queries"] = len(summary.get("queries", {}))
    short["n_retried"] = len(summary.get("retries", {}))
    short["perquery_file"] = "BENCH_PERQUERY.json"
    short_line = json.dumps(short)
    here = Path(__file__).resolve().parent
    for fname in ("BENCH_LOCAL.json", "BENCH_PERQUERY.json"):
        try:
            (here / fname).write_text(full_line + "\n")
        except OSError:
            pass  # read-only checkout: stdout still carries the summary
    sys.stdout.flush()
    sys.stderr.flush()
    print(full_line, flush=True)
    chunks = _query_chunks(summary.get("queries", {}))
    for i, chunk in enumerate(chunks, start=1):
        print(json.dumps({"qchunk": i, "of": len(chunks), "q": chunk},
                         separators=(",", ":")))
    print(short_line, flush=True)


if __name__ == "__main__":
    main()
