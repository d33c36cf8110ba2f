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


def test_misra_gries_candidates_cover_true_heavy_hitters(spark):
    """The MG candidate union must be a SUPERSET of every item with
    global frequency > n/(k+1) — the guarantee the exact recount
    phase relies on (operators/sketches.py). The corpus vocabulary
    (~31 types) never pressures a k=50 summary, so this uses a
    SYNTHETIC skewed stream whose item universe (~n/2 types) dwarfs
    k=10 — every partition shrink fires many times — with two known
    heavy items at ~25% share each."""
    from map_reduce_mongodb_spark.operators.sketches import (
        misra_gries_candidates)
    k = 10
    tokens = (spark.range(4000).repartition(8)
              .select(F.when(F.col("id") % 4 == 0, F.lit("hot_a"))
                      .when(F.col("id") % 4 == 1, F.lit("hot_b"))
                      .otherwise(F.concat(F.lit("t"), F.col("id")))
                      .alias("word")))
    cands = {r.word for r in
             misra_gries_candidates(tokens, "word", k).collect()}
    n = tokens.count()
    true_hh = {r.word for r in
               tokens.groupBy("word").count()
               .where(F.col("count") * (k + 1) > n).collect()}
    assert true_hh == {"hot_a", "hot_b"}
    assert true_hh <= cands, true_hh - cands
    # and the summary is genuinely bounded: <=k rows per partition
    assert len(cands) <= 8 * k


def test_heavy_hitters_partition_invariance(spark):
    """The exact two-phase answer must not depend on the physical
    partitioning of the token stream (candidate sets differ;
    answers must not)."""
    from map_reduce_mongodb_spark.functions import text as T
    from map_reduce_mongodb_spark.io import table
    from map_reduce_mongodb_spark.operators.sketches import (
        exact_heavy_hitters)
    tokens = (table(spark, "documents", SF_DIR)
              .select(F.explode(T.words(F.col("text"))).alias("word")))
    a = {(r.word, r.freq) for r in
         exact_heavy_hitters(tokens.repartition(2), "word", 50)
         .collect()}
    b = {(r.word, r.freq) for r in
         exact_heavy_hitters(tokens.repartition(16), "word", 50)
         .collect()}
    assert a == b and a


def test_misra_gries_empty_and_tiny_inputs(spark):
    """The summary path must survive empty partitions and a stream
    smaller than k."""
    from map_reduce_mongodb_spark.operators.sketches import (
        exact_heavy_hitters, misra_gries_candidates)
    empty = spark.createDataFrame([], "word string").repartition(4)
    assert misra_gries_candidates(empty, "word", 5).count() == 0
    assert exact_heavy_hitters(empty, "word", 5).count() == 0
    tiny = spark.createDataFrame([("a",), ("a",), ("b",)],
                                 "word string").repartition(4)
    hh = {(r.word, r.freq)
          for r in exact_heavy_hitters(tiny, "word", 5).collect()}
    # threshold n/(k+1) = 0.5 -> both items qualify
    assert hh == {("a", 2), ("b", 1)}
