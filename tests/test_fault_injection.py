"""Task-retry invariance (VERDICT r8 #4).

At 100 TB on a real cluster, executor loss and task retry are routine;
any nondeterministic recompute — an unseeded sample, a non-checksummed
checkpoint, an order-sensitive aggregate — would be a silent wrong
answer that only manifests under failure. ``io.table`` has an
env-gated injector (``FAULT_INJECT_ENV``) that fails every task's
FIRST attempt; under a ``local[N, maxFailures]`` master the retry then
succeeds, so a full query exercises scan-stage retry plus upstream
recompute of everything pipelined with the scans.

The registry-wide sweep runs via ``tools/dress_rehearsal.py
--fault-inject`` (recorded per round in NOTES); this file pins the
machinery so it can't rot:

- positive control: the injector really raises on attempt 0 (else the
  sweep would pass vacuously with injection silently off);
- invariance pin: in a fault-tolerant subprocess session, an
  iterative-checkpoint query (connected components), a distributed
  prefix scan, and a shuffle aggregate produce IDENTICAL results with
  and without injected failures.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

from map_reduce_mongodb_spark.io import FAULT_INJECT_ENV

from tests.conftest import SF_DIR

REPO = Path(__file__).resolve().parent.parent


def test_injector_fails_first_attempt(spark, monkeypatch):
    """Positive control: with the env set, a scan raises on the shared
    maxFailures=1 session (the injected attempt-0 failure is fatal
    there — proving the wrapper is active and actually throwing)."""
    import pytest

    from map_reduce_mongodb_spark.io import table

    monkeypatch.setenv(FAULT_INJECT_ENV, "1")
    with pytest.raises(Exception, match="injected task failure"):
        table(spark, "region", SF_DIR).count()


def test_injector_off_without_env(spark, monkeypatch):
    from map_reduce_mongodb_spark.io import table

    monkeypatch.delenv(FAULT_INJECT_ENV, raising=False)
    assert table(spark, "region", SF_DIR).count() == 5


_CHILD = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F

    SF = {sf!r}
    spark = (SparkSession.builder.appName("fault-pin")
             .master("local[4,3]")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from map_reduce_mongodb_spark.io import FAULT_INJECT_ENV, table
    from map_reduce_mongodb_spark.operators.graph import (
        connected_components)
    from map_reduce_mongodb_spark.operators.prefix import (
        distributed_cumsum)

    def snapshot():
        # iterative CC with eager checkpoints: orders' customers
        # linked through shared order-priority buckets (arbitrary but
        # deterministic small graph over real testdata)
        o = table(spark, "orders", SF)
        e = (o.select((F.col("o_custkey") % 97).alias("src"),
                      (F.col("o_orderkey") % 89).alias("dst")))
        cc = sorted(map(tuple, connected_components(e).collect()))
        # distributed prefix scan (checkpointed ranged frame)
        li = (table(spark, "lineitem", SF)
              .select("l_orderkey", "l_linenumber", "l_quantity")
              .limit(5000))
        cs = sorted(map(tuple, distributed_cumsum(
            li, order_by=[F.col("l_orderkey"), F.col("l_linenumber")],
            value=F.col("l_quantity"), out="running").collect()))
        # shuffle aggregate
        ag = sorted(map(tuple,
                        o.groupBy("o_orderpriority")
                         .agg(F.count(F.lit(1)).alias("n"),
                              F.sum("o_totalprice").alias("s"))
                         .collect()))
        return cc, cs, ag

    os.environ.pop(FAULT_INJECT_ENV, None)
    clean = snapshot()
    os.environ[FAULT_INJECT_ENV] = "1"
    faulted = snapshot()
    os.environ.pop(FAULT_INJECT_ENV, None)
    assert faulted == clean, "results diverged under task retry"
    print("FAULT_PIN_OK", len(clean[0]), len(clean[1]), len(clean[2]))
""")


def test_results_invariant_under_task_retry():
    """Invariance pin: same session, same queries, with and without
    every task's first attempt failing — byte-identical results.
    Runs in a subprocess because it needs a fault-tolerant master
    (local[4,3]); the shared test session is maxFailures=1."""
    script = _CHILD.format(repo=str(REPO), sf=SF_DIR)
    out = subprocess.run(
        [sys.executable, "-c", script],
        env={k: v for k, v in os.environ.items()
             if k != FAULT_INJECT_ENV},
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "FAULT_PIN_OK" in out.stdout, out.stdout[-2000:]
