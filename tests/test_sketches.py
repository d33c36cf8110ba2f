"""Approximate sketch aggregates: engine-specific values (no SQL
oracle possible), so accuracy is gated against the EXACT aggregates —
the check that actually matters for a sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.io import table
from map_reduce_mongodb_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_sketches_track_exact_values(spark):
    approx = {r.l_returnflag: r
              for r in QUERIES["approx_sketches"](spark, SF_DIR).collect()}
    exact = {
        r.l_returnflag: r
        for r in table(spark, "lineitem", SF_DIR).groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("orders"),
             F.countDistinct("l_partkey").alias("parts"),
             F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
             F.expr("percentile(l_extendedprice, 0.95)").alias("p95"))
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for flag, a in approx.items():
        e = exact[flag]
        # HLL++ default rsd=5%; allow 3σ. The 1% sketch must be tighter.
        assert abs(a.approx_orders - e.orders) <= max(3, 0.15 * e.orders)
        assert abs(a.approx_parts_1pct - e.parts) <= max(3, 0.03 * e.parts)
        # percentile_approx with accuracy 10000 is near-exact at this n:
        # it returns a real data value within a tight rank tolerance.
        assert abs(a.approx_median_price - e.median) <= 0.05 * e.median
        assert abs(a.approx_p95_price - e.p95) <= 0.05 * e.p95
