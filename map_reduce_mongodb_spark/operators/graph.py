"""Distributed connected components — dedup-cluster assignment.

A training-data pipeline that finds near-duplicate PAIRS (MinHash,
SimHash, exact Jaccard — operators/dedup.py) still needs to turn the
pair graph into CLUSTERS (pick one canonical doc per component, drop
the rest). The reference engine has no graph operator, so this is a
north-star extension; the algorithm is the alternating
large-star/small-star method of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SOCC'14) — the standard shuffle-based CC
algorithm, converging in O(log^2 n) rounds (2-3 rounds in practice on
short-diameter dedup graphs).

Scale notes:
- Each half-round is one groupBy (per-node min neighbour) + one join
  (attach that min back to the edge list) — no collect_set, so a
  high-degree hub (the component minimum attracts all members) never
  materializes a giant array on one task; its edges stay distributed
  rows.
- Iterative DataFrame loops grow lineage without bound; each round is
  cut with ``localCheckpoint(eager=True)`` (executor-local blocks). On
  a real cluster with lineage-failure concerns, swap for
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` — same
  plan shape.
- Convergence is detected with a deterministic (count, xxhash64-sum)
  checksum of the edge set: one tiny aggregate per round instead of a
  full set-difference join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node u attaches its strictly-larger
    neighbours to m(u) = min(N(u) ∪ {u})."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (sym.groupBy("src").agg(F.min("dst").alias("mn"))
               .select("src", F.least("mn", "src").alias("m")))
    return (sym.join(mins, "src")
               .where(F.col("dst") > F.col("src"))
               .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
               .where(F.col("src") != F.col("dst"))
               .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges large→small, then every node
    attaches its smaller neighbours (and itself) to the minimum."""
    oriented = (edges.select(F.greatest("src", "dst").alias("src"),
                             F.least("src", "dst").alias("dst"))
                     .where(F.col("src") != F.col("dst")))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    attach = (oriented.join(mins, "src")
                      .select(F.col("dst").alias("src"),
                              F.col("m").alias("dst")))
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (attach.union(self_edge)
                  .where(F.col("src") != F.col("dst"))
                  .distinct())


def _persistent_rdds(spark) -> dict:
    """id → JVM RDD handle of every currently-persisted RDD.

    Deliberate private-API use, version-pinned: ``SparkContext._jsc``
    (the Py4J JavaSparkContext) and ``sc().getPersistentRDDs()`` (a
    PUBLIC Scala API, reached through the private Python handle) are
    stable across Spark 3.x/4.x (developed against 4.1). There is no
    public PySpark surface that enumerates persisted RDDs, and
    ``DataFrame.unpersist`` does not release localCheckpoint blocks —
    this is the only way to free them. If a future Spark moves the
    handle, the except below degrades GRACEFULLY: checkpoint blocks
    are simply not freed early (they still die with the session /
    ContextCleaner), trading memory hygiene for correctness instead of
    crashing the query."""
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        out = {}
        while it.hasNext():
            t = it.next()
            out[t._1()] = t._2()
        return out
    except Exception:  # AttributeError (API moved) or Py4J errors
        return {}


def _checkpoint(df: DataFrame):
    """``localCheckpoint(eager=True)`` + the JVM handles of the RDD
    blocks it just persisted (``DataFrame.unpersist`` does NOT release
    those — they must be dropped at the RDD level). Assumes the
    single-threaded query-builder context: no concurrent persists."""
    spark = df.sparkSession
    before = set(_persistent_rdds(spark))
    out = df.localCheckpoint(eager=True)
    handles = [r for i, r in _persistent_rdds(spark).items()
               if i not in before]
    return out, handles


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor (not sum) of the row hashes: order-insensitive and free
    # of ANSI long-overflow on sums of 64-bit hashes.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """Label every node of the undirected graph `edges` with the
    minimum node id of its connected component.

    Input: any DataFrame with two comparable id columns (self-loops and
    duplicate/reversed edges are fine). Output: ``(id, cc)`` — one row
    per non-isolated node, ``cc`` = min id in its component (isolated
    nodes never appear in an edge list; callers union them back with
    cc = id if needed).
    """
    from map_reduce_mongodb_spark.cache import track_rdd

    e, handles = _checkpoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
             .where(F.col(src) != F.col(dst))
             .distinct())
    prev = _checksum(e)
    for _ in range(max_iter):
        nxt, nxt_handles = _checkpoint(_small_star(_large_star(e)))
        cur = _checksum(nxt)
        for h in handles:  # superseded iteration's blocks
            h.unpersist(False)
        e, handles = nxt, nxt_handles
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # The returned plan hangs off the FINAL checkpoint; its blocks are
    # handed to the cache registry, so they live until the next
    # registered query is built (same lifetime as tracked_persist
    # caches — results must be consumed before the next build).
    for h in handles:
        track_rdd(h)
    # At the fixpoint every edge is (member, component-min); the min
    # itself appears only on the right side.
    labels = (e.select(F.col("src").alias("id"), F.col("dst").alias("cc"))
               .union(e.select(F.col("dst").alias("id"),
                               F.col("dst").alias("cc")))
               .groupBy("id").agg(F.min("cc").alias("cc")))
    return labels


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Near-dup pair list → cluster assignment ``(doc_id, cluster_id,
    cluster_size)``; cluster_id = min doc_id of the component — the
    canonical survivor a keep-one-per-cluster dedup would retain."""
    labels = connected_components(pairs, src=id_a, dst=id_b)
    sizes = labels.groupBy("cc").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "cc")
                  .select(F.col("id").alias("doc_id"),
                          F.col("cc").alias("cluster_id"),
                          F.col("cluster_size")))


def k_core(pairs: DataFrame, k: int, id_a: str = "id_a",
           id_b: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Nodes of the graph's k-CORE (the maximal subgraph where every
    node keeps degree ≥ k): iterative peeling — drop all nodes with
    current degree < k, re-filter the edge list to survivors, repeat
    until a round drops nobody. Returns (id, core_degree) with the
    node's degree INSIDE the core.

    Execution shape: each round is one map-side-combined degree
    aggregate + two semi-joins keyed by node id — O(edges) per round,
    no driver-side graph state; rounds cut lineage with the module's
    localCheckpoint discipline (superseded rounds' RDD blocks released
    immediately). The only driver value per round is the survivor
    COUNT (the convergence scalar — same footprint as
    connected_components' checksum). Round count is bounded by the
    peeling depth (the graph's degeneracy ordering length), not by
    data size; ``max_iter`` is a guard rail, and the loop raises if
    it trips without converging (a silently partial core would be
    wrong, not slow)."""
    from map_reduce_mongodb_spark.cache import track_rdd
    sym = pairs.select(F.col(id_a).alias("src"),
                       F.col(id_b).alias("dst"))
    edges = sym.union(sym.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
    handles: list = []
    prev_n = -1
    for _ in range(max_iter):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("src")
        n = keep.count()
        if n == prev_n:
            break
        prev_n = n
        if n == 0:
            edges = edges.limit(0)
            break
        edges, nxt = _checkpoint(
            edges.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst",
                  "left_semi"))
        for h in handles:
            h.unpersist(False)
        handles = nxt
    else:
        raise RuntimeError(
            f"k_core did not converge within {max_iter} rounds")
    for h in handles:
        track_rdd(h)
    return (edges.groupBy("src").agg(F.count(F.lit(1))
                                     .alias("core_degree"))
            .where(F.col("core_degree") >= k)
            .select(F.col("src").alias("id"), "core_degree"))
