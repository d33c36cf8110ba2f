"""Similarity search over embedding columns (``array<float>``).

Two paths, per the north-star scale strategy:

- :func:`cosine_topk_bruteforce` — exact top-k: broadcast the (small)
  query set against the full corpus, one narrow pass computing cosine,
  then a ranking window partitioned by query id. Cost O(|Q| · n · d)
  with no shuffle of the corpus; correct baseline at every scale where
  |Q| is modest.
- :func:`ann_lsh_topk` — approximate: random-hyperplane (sign) LSH.
  Each vector gets a compact bit-bucket; candidates are bucket
  cohabitants (equality join on the bucket key — shuffle keyed by
  bucket), ranked within bucket. Hyperplanes are generated from a fixed
  seed → fully deterministic. Probing multiple rotated bucketings
  raises recall without widening any single bucket.

No Python UDFs: the dot products are JVM expressions (unrolled or
folded — see functions/vectors.py for the bit-exactness rationale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from map_reduce_mongodb_spark.functions.vectors import (
    cosine_unrolled,
    dot_fold,
    dot_unrolled,
    norm_sq_unrolled,
)


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int],
                           k: int = 5, dim: int = 64,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbours for each query id (excluding self).
    Returns (query_id, neighbor_id, cosine, rank)."""
    # Norms are per-row: compute them ONCE as columns before the
    # |Q|×n pair expansion, so each pair evaluates only the dot product.
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm_sq_unrolled(vec_col, dim).alias("qn"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"),
                          norm_sq_unrolled(vec_col, dim).alias("cn"))
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    cos = dot_unrolled("qv", "cv", dim) / F.sqrt(F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_dup_pairs(embeddings: DataFrame, threshold: float,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (exact): all (id_a < id_b) pairs
    with cosine ≥ threshold. Norms are computed once per row before the
    pair expansion. O(n²) by nature — the exact baseline; at corpus
    scale run the sign-LSH bucketing (``ann_lsh_topk``'s candidate
    machinery) and verify only cohabitant pairs, exactly as
    MinHash-LSH verifies against exact Jaccard."""
    # Per-row prep BEFORE the O(n²) expansion: L2-normalize each vector
    # once (cosine then = plain dot, a third of the per-pair element
    # accesses), persist both sides, and repartition BOTH — the nested-
    # loop join's parallelism is its streamed side's partition count,
    # and a single-file corpus is one partition (measured 5× from this
    # alone at sf0.1).
    par = embeddings.sparkSession.sparkContext.defaultParallelism

    def normed(idname, vname):
        base = embeddings.select(
            F.col(id_col).alias(idname), F.col(vec_col).alias("_v"),
            F.sqrt(norm_sq_unrolled(vec_col, dim)).alias("_n"))
        return base.select(
            idname,
            F.transform("_v", lambda x: x.cast("double") / F.col("_n"))
            .alias(vname)).repartition(par).persist()

    a = normed("id_a", "va")
    b = normed("id_b", "vb")
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine",
                         F.round(dot_unrolled("va", "vb", dim), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (public numpy RNG, fixed seed)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id of a vector against the given hyperplanes.

    Projections are UNROLLED literal arithmetic (element_at * constant,
    summed) — plain codegen'd expressions. A higher-order-function fold
    here runs the lambda interpreter per element and dominated the ANN
    wall-clock before this change."""
    plane_bits = []
    for j, plane in enumerate(planes):
        dot = " + ".join(
            f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            f" * CAST('{x!r}' AS DOUBLE)"
            for i, x in enumerate(plane)
        )
        plane_bits.append(
            f"(CASE WHEN ({dot}) > 0D THEN {1 << j} ELSE 0 END)")
    return F.expr(" + ".join(plane_bits))


def ann_lsh_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                 dim: int = 64, n_planes: int = 4, n_tables: int = 4,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: rank only bucket-cohabitants of each query,
    across `n_tables` independent bucketings (union raises recall).
    Returns (query_id, neighbor_id, cosine, rank).

    Recall characteristics: sign-LSH concentrates TRUE near neighbours
    (cosine near 1) into shared buckets with probability
    ``(1 - θ/π)^n_planes`` per table — near-duplicates are found with
    high probability. On uniformly random vectors (no structure) recall
    degrades to ≈ the examined-candidate fraction; that is a property
    of the data, not the index. Tune n_planes up for bigger corpora
    (smaller buckets), n_tables up for recall."""
    # ALL tables' buckets in one projection + explode (not a union of
    # n_tables branches: one whole-stage-codegen unit instead of
    # n_tables compilations of near-identical generated code), then one
    # persist — both join sides below consume the bucketed table.
    table_structs = [
        F.struct(
            F.lit(t).alias("tbl"),
            lsh_bucket(vec_col, _hyperplanes(dim, n_planes, seed=42 + t))
            .alias("bucket"),
        )
        for t in range(n_tables)
    ]
    all_buckets = embeddings.select(
        F.col(id_col), F.col(vec_col),
        F.explode(F.array(*table_structs)).alias("tb"),
    ).select(id_col, vec_col, "tb.tbl", "tb.bucket").persist()
    q = all_buckets.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        "bucket", "tbl")
    c = all_buckets.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("cv"), "bucket", "tbl")
    pairs = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()  # same pair may cohabit in several tables
    )
    cos = cosine_unrolled("qv", "cv", dim)  # candidate count is small
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
