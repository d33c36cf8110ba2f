"""Connected-components operator (operators/graph.py): equivalence to
a driver-side union-find on random graphs, worst-case chain diameters,
degenerate inputs, and dedup_clusters contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from map_reduce_mongodb_spark.operators.graph import (
    connected_components, dedup_clusters)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {r["id"]: r["cc"]
            for r in connected_components(df).collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_union_find_random(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    want = _union_find(n, edges)
    got = _labels(spark, edges)
    touched = {v for e in edges for v in e if e[0] != e[1]}
    assert set(got) == touched
    for v in touched:
        assert got[v] == want[v], f"node {v}: {got[v]} != {want[v]}"


def test_long_chain_converges(spark):
    # Path graph 0-1-2-...-59: diameter 59 — the worst case for naive
    # propagation; large-star/small-star must still converge quickly.
    edges = [(i, i + 1) for i in range(59)]
    got = _labels(spark, edges)
    assert got == {v: 0 for v in range(60)}


def test_duplicate_reversed_and_self_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)]
    got = _labels(spark, edges)
    # 3's only edge is a self-loop -> isolated, not reported
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_high_degree_star(spark):
    # Star around node 500 (hub NOT the min) with 300 leaves including
    # node 0: everything must collapse to 0, and the hub's full
    # neighbourhood must never need a collect_set-style array.
    edges = [(500, leaf) for leaf in range(0, 300)]
    got = _labels(spark, edges)
    assert got == {v: 0 for v in [*range(0, 300), 500]}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src: long, dst: long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_sizes(spark):
    # {1,2,3} triangle-less chain + {7,8} pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a: long, id_b: long")
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters(pairs).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_no_leaked_caches(spark):
    # Intermediate rounds' localCheckpoint blocks are released as they
    # are superseded; the final round's blocks go to the cache registry
    # and drop on release_caches(). Nothing accumulates per-iteration.
    from map_reduce_mongodb_spark.cache import release_caches

    jsc = spark.sparkContext._jsc.sc()
    release_caches()
    base = jsc.getPersistentRDDs().size()
    edges = [(i, i + 1) for i in range(20)]  # several CC iterations
    _labels(spark, edges)
    during = jsc.getPersistentRDDs().size()
    assert during - base <= 2, f"{during - base} new RDDs still live"
    release_caches()
    assert jsc.getPersistentRDDs().size() <= base


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    """dup_graph_pagerank invariants: scores sum to 1 over the graph
    (symmetric graph, no dangling mass) and a hub out-scores leaves."""
    from tests.conftest import SF_DIR
    from map_reduce_mongodb_spark.queries import QUERIES

    rows = QUERIES["dup_graph_pagerank"](spark, SF_DIR).collect()
    assert rows, "no pagerank rows at test SF (planted dups expected)"
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-3, total
    assert all(r.pagerank > 0 for r in rows)
    # the docstring's promised hub assertion, for real (r9 test
    # review: sum==1 + all-positive also holds for the UNITERATED
    # uniform vector, so a zero-iteration regression passed).
    # Conditional on the graph's ACTUAL structure: uniform is the
    # correct stationary vector whenever every edge joins EQUAL-degree
    # endpoints (each component locally regular — this fixture's dup
    # graph is pairs and cliques, so global degree diversity alone
    # does NOT imply score spread; verified by hand on the fixture).
    # Score spread is required exactly when some edge joins nodes of
    # different degree.
    from map_reduce_mongodb_spark.operators.graph import symmetrize
    from map_reduce_mongodb_spark.queries import _jaccard_pairs_07
    sym = symmetrize(_jaccard_pairs_07(spark, SF_DIR)
                     .select("id_a", "id_b"))
    deg = sym.groupBy("id_a").count()
    mixed_edge = (sym
                  .join(deg.withColumnRenamed("id_a", "_s")
                        .withColumnRenamed("count", "da"),
                        sym["id_a"] == F.col("_s"))
                  .join(deg.withColumnRenamed("id_a", "_t")
                        .withColumnRenamed("count", "db"),
                        sym["id_b"] == F.col("_t"))
                  .where(F.col("da") != F.col("db")).count() > 0)
    scores = sorted(r.pagerank for r in rows)
    if mixed_edge:
        assert scores[-1] > scores[0], \
            "irregular graph but uniform pagerank — did the power " \
            "loop run?"
    else:
        assert abs(scores[-1] - scores[0]) < 1e-9, \
            "locally-regular graph must score uniformly"


def test_pagerank_releases_iteration_blocks(spark):
    """Superseded power-iteration checkpoints must not accumulate;
    only the final round's blocks (plus the two persisted loop
    invariants) may remain live until release_caches()."""
    from map_reduce_mongodb_spark.cache import release_caches
    from map_reduce_mongodb_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    jsc = spark.sparkContext._jsc.sc()
    release_caches()
    base = jsc.getPersistentRDDs().size()
    QUERIES["dup_graph_pagerank"](spark, SF_DIR).collect()
    during = jsc.getPersistentRDDs().size()
    assert during - base <= 4, f"{during - base} RDD/cache blocks live"
    release_caches()
    assert jsc.getPersistentRDDs().size() <= base


def test_k_core_matches_exact_python_peel(spark):
    """k_core must equal the exact sequential peel (node set AND
    in-core degrees) on the sf0.001 dup graph for several k."""
    from collections import defaultdict

    from map_reduce_mongodb_spark.operators.graph import k_core
    from map_reduce_mongodb_spark.queries import _jaccard_pairs_07
    from tests.conftest import SF_DIR
    pairs = [(int(r.id_a), int(r.id_b))
             for r in _jaccard_pairs_07(spark, SF_DIR)
             .select("id_a", "id_b").collect()]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    for k in (2, 3, 4):
        adj = defaultdict(set)
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        changed = True
        while changed:
            drop = [v for v, ns in adj.items() if len(ns) < k]
            changed = bool(drop)
            for v in drop:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
        want = {v: len(ns) for v, ns in adj.items()}
        got = {int(r.id): int(r.core_degree)
               for r in k_core(pdf, k=k).collect()}
        assert got == want, f"k={k}: {got} != {want}"
    assert k_core(pdf, k=2).count() > 0  # non-degenerate fixture


def test_iteration_round_counts_are_recorded(spark):
    """connected_components / k_core note their round counts into the
    cache module's build metrics (attributed to the enclosing shared
    build, or _unattributed outside one) — iterative-build regressions
    must be attributable in BENCH artifacts, not anonymous slowdowns
    (VERDICT r6 #3)."""
    from map_reduce_mongodb_spark import cache
    from map_reduce_mongodb_spark.operators.graph import k_core

    cache._BUILD_METRICS.clear()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src: long, dst: long")
    connected_components(edges).collect()
    got = cache.shared_build_metrics().get("_unattributed", {})
    assert "cc_rounds" in got, got
    rounds = got["cc_rounds"]
    rounds = rounds if isinstance(rounds, list) else [rounds]
    assert all(1 <= r <= 25 for r in rounds), rounds

    k_core(spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "id_a: long, id_b: long"),
        k=2).collect()
    got = cache.shared_build_metrics().get("_unattributed", {})
    assert "kcore_rounds" in got, got

    # consumer_scope: the same inline metric attributes to the named
    # query when the caller (bench.py's timed loop) opens a scope —
    # iterative-round regressions name the query they belong to.
    cache._BUILD_METRICS.clear()
    with cache.consumer_scope("dup_graph_kcore"):
        k_core(spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "id_a: long, id_b: long"),
            k=2).collect()
    got = cache.shared_build_metrics()
    assert "kcore_rounds" in got.get("dup_graph_kcore", {}), got
    assert "kcore_rounds" not in got.get("_unattributed", {}), got

    # attribution: a metric noted during a shared_parquet build lands
    # under that build's key
    cache._BUILD_METRICS.clear()
    cache.clear_shared()

    def build():
        cache.note_build_metric("cc_rounds", 3)
        return spark.range(2)

    cache.shared_parquet(spark, "metric_attr_test", build)
    assert cache.shared_build_metrics()[
        "metric_attr_test"]["cc_rounds"] == 3
    cache.clear_shared()


def test_k_core_profile_matches_independent_peels(spark):
    """k_core_profile (chained peels exploiting (k+1)-core ⊆ k-core)
    must produce exactly the per-depth aggregates of INDEPENDENT
    k_core runs — on a random graph with a planted dense nucleus and
    on the sf0.001 dup graph, including depths whose core is empty."""
    import random

    from pyspark.sql import functions as F

    from map_reduce_mongodb_spark.operators.graph import (
        k_core, k_core_profile)
    from map_reduce_mongodb_spark.queries import _jaccard_pairs_07
    from tests.conftest import SF_DIR

    rng = random.Random(11)
    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    sparse = [(rng.randrange(6, 60), rng.randrange(6, 60))
              for _ in range(40)]
    cases = [
        spark.createDataFrame(
            [(a, b) for a, b in clique + sparse if a != b],
            "id_a long, id_b long"),
        _jaccard_pairs_07(spark, SF_DIR).select("id_a", "id_b"),
    ]
    for pdf in cases:
        ks = [2, 3, 4, 7]  # 7-core is empty for both fixtures
        got = {r.k: (r.n_core_docs, r.max_core_degree)
               for r in k_core_profile(pdf, ks=ks).collect()}
        for k in ks:
            row = (k_core(pdf, k=k)
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.coalesce(F.max("core_degree"), F.lit(0))
                         .cast("long").alias("mx")).first())
            assert got[k] == (row.n, row.mx), (k, got[k], row)


@pytest.mark.parametrize("seed", [3, 4])
def test_cc_threshold_sweep_matches_independent_cc(spark, seed):
    """cc_threshold_sweep (supernode contraction down the threshold
    ladder) must label every level exactly like an independent
    connected_components run on that level's edge set — on random
    weighted graphs whose lower levels both MERGE higher-level
    components and introduce brand-new nodes."""
    from map_reduce_mongodb_spark.operators.graph import (
        cc_threshold_sweep, connected_components)

    rng = random.Random(seed)
    n = 80
    rows = [(rng.randrange(n), rng.randrange(n),
             rng.choice([0.72, 0.75, 0.82, 0.85, 0.91, 0.95]))
            for _ in range(70)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long, w double")
    thresholds = [0.7, 0.8, 0.9]
    swept = cc_threshold_sweep(pairs, "w", thresholds)
    _assert_sweep_matches_independent(pairs, thresholds, swept)


def _assert_sweep_matches_independent(pairs, thresholds, swept):
    from map_reduce_mongodb_spark.operators.graph import (
        connected_components)
    assert [t for t, _ in swept] == thresholds
    for t, labels in swept:
        got = {r["id"]: r["cc"] for r in labels.collect()}
        want = {r["id"]: r["cc"]
                for r in connected_components(
                    pairs.where(F.col(pairs.columns[2]) >= t),
                    src="id_a", dst="id_b").collect()}
        assert got == want, (t, got, want)


def test_cc_threshold_sweep_on_dup_graph(spark):
    """The sweep on the real sf0.001 near-dup pair graph (the exact
    input dup_graph_threshold_sweep feeds it in r8) matches
    independent per-threshold CC."""
    from map_reduce_mongodb_spark.operators.graph import (
        cc_threshold_sweep)
    from map_reduce_mongodb_spark.queries import _jaccard_pairs_07
    from tests.conftest import SF_DIR

    pairs = _jaccard_pairs_07(spark, SF_DIR) \
        .select("id_a", "id_b", "jaccard")
    thresholds = [0.7, 0.8, 0.9]
    swept = cc_threshold_sweep(pairs, "jaccard", thresholds)
    _assert_sweep_matches_independent(pairs, thresholds, swept)


def test_cc_threshold_sweep_empty_top_level(spark):
    """A top threshold above every weight yields an empty label set,
    and the next level down must still cluster from scratch (every
    node is its own supernode)."""
    from map_reduce_mongodb_spark.operators.graph import (
        cc_threshold_sweep)

    pairs = spark.createDataFrame(
        [(1, 2, 0.75), (2, 3, 0.75), (7, 8, 0.85)],
        "id_a long, id_b long, w double")
    swept = dict(cc_threshold_sweep(pairs, "w", [0.7, 0.9]))
    assert swept[0.9].count() == 0
    got = {r["id"]: r["cc"] for r in swept[0.7].collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
