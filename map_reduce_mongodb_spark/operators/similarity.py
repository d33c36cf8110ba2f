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
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from map_reduce_mongodb_spark.cache import tracked_persist
from map_reduce_mongodb_spark.functions.vectors import (
    cosine_unrolled,
    dot_unrolled,
    norm_sq_unrolled,
)


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int],
                           k: int = 5, dim: int = 64,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           queries_df: DataFrame | None = None) -> DataFrame:
    """Exact top-k cosine neighbours for each query id (excluding self).
    Returns (query_id, neighbor_id, cosine, rank). `queries_df` lets the
    query vectors come from a different (e.g. unfiltered) table than
    the ranked corpus — the hybrid/filtered-search case."""
    # Norms are per-row: compute them ONCE as columns before the
    # |Q|×n pair expansion, so each pair evaluates only the dot product.
    q = (embeddings if queries_df is None else queries_df) \
        .filter(F.col(id_col).isin(query_ids)).select(
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


def _l2_normalized(embeddings: DataFrame, dim: int, id_col: str,
                   vec_col: str) -> DataFrame:
    """(id, vn): L2-normalize once — the shared prep for every
    exact-cosine path. ONE definition on purpose (r9 review): the
    norm (norm_sq_unrolled) and per-element double division are part
    of the bit-exactness contract with the SQL oracle, and three
    drifting copies of it were the risk."""
    return embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_v"),
        F.sqrt(norm_sq_unrolled(vec_col, dim)).alias("_n"),
    ).select(
        "id",
        F.transform("_v", lambda x: x.cast("double") / F.col("_n"))
        .alias("vn"))


def _cosine_epilogue(pairs: DataFrame, dim: int,
                     threshold: float) -> DataFrame:
    """Shared scoring tail: exact cosine via the left-associated JVM
    fold (bit-identical to the SQL oracle), round to 6, threshold."""
    return (pairs.withColumn("cosine",
                             F.round(dot_unrolled("va", "vb", dim), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _verify_cosine(cand: DataFrame, vnorm: DataFrame, dim: int,
                   threshold: float) -> DataFrame:
    """Exact-verify epilogue shared by the candidate-generator paths:
    join the normalized vectors back by id on both sides of each
    (id_a, id_b) candidate, then score/threshold."""
    pairs = (
        cand
        .join(vnorm.select(F.col("id").alias("id_a"),
                           F.col("vn").alias("va")), "id_a")
        .join(vnorm.select(F.col("id").alias("id_b"),
                           F.col("vn").alias("vb")), "id_b"))
    return _cosine_epilogue(pairs, dim, threshold)


def embedding_dup_pairs_exact(embeddings: DataFrame, threshold: float,
                              dim: int = 64, id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs, exact all-pairs baseline:
    every (id_a < id_b) pair with cosine ≥ threshold. O(n²) pairwise
    expression evaluation — kept as the recall oracle for tests and
    small corpora only; the registered query path is
    :func:`embedding_dup_pairs` (blocked-GEMM candidates + exact
    verify). Per-row prep (L2-normalize once) happens before the pair
    expansion; both sides are repartitioned because a nested-loop
    join's parallelism is its streamed side's partition count."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    vn = _l2_normalized(embeddings, dim, id_col, vec_col)
    a = (vn.select(F.col("id").alias("id_a"), F.col("vn").alias("va"))
         .repartition(par))
    b = (vn.select(F.col("id").alias("id_b"), F.col("vn").alias("vb"))
         .repartition(par))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return _cosine_epilogue(pairs, dim, threshold)


def _estimate_rows(df: DataFrame) -> int | None:
    """Row count from parquet footer metadata: driver-side footer reads
    over ``df.inputFiles()`` — no Spark job, no data scan (footers are
    already touched during planning). Returns None when the frame is
    not parquet-file-backed (e.g. createDataFrame fixtures), letting
    callers fall back to an exact count. An upstream FILTER would make
    this an overestimate of surviving rows — fine for block sizing,
    which only needs the right order of magnitude."""
    files = df.inputFiles()
    # Footer-probe only LOCAL parquet (bare paths or file: URIs): a
    # remote URI (s3://, hdfs://) would be opened as a local path and
    # fail confusingly. Remote-backed frames fall back to count().
    if not files or not all(
            f.endswith(".parquet")
            and (f.startswith("file:") or f.startswith("/"))
            for f in files):
        return None
    import pyarrow.parquet as pq
    try:
        total = 0
        for f in files:
            if f.startswith("file:"):
                f = "/" + f.removeprefix("file:").lstrip("/")
            total += pq.ParquetFile(f).metadata.num_rows
        return total
    except Exception:  # ArrowInvalid on bad footers is not an OSError;
        return None    # any probe failure means "estimate unavailable"


def _data_sized_partitions(df: DataFrame,
                           rows_per_task: int = 8192) -> int:
    """Partition count for an Arrow-UDF corpus scan, sized from the
    DATA (footer-estimated rows / rows_per_task), clamped to
    [1, 4·defaultParallelism]. A fixed repartition(defaultParallelism)
    is wrong at BOTH ends: a 2k-vector corpus fans a 32-task
    mapInPandas round-trip per Lloyd pass (pure worker overhead —
    measured 4.2s of a 5.6s query at sf0.1), while a 100 TB corpus
    needs far MORE than one wave's worth of partitions. Falls back to
    defaultParallelism when no estimate is available (non-parquet
    frames) — never a count() job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    rows = _estimate_rows(df)
    if rows is None:
        return par
    return max(1, min(4 * par, -(-rows // rows_per_task)))


def lsh_bucket_arrays(dim: int, n_planes: int, n_tables: int,
                      seed: int = 42):
    """Vectorized sign-LSH bucketer: an Arrow pandas_udf mapping an
    ``array<float>`` column to the vector's bucket id in each of
    ``n_tables`` independent tables (``array<int>``, one entry per
    table).

    Why a pandas_udf and not unrolled JVM expressions: bucket
    assignment needs n_tables × n_planes plane-dots; unrolled that is a
    (n_tables·n_planes·dim)-term projection, which blows up both plan
    construction (seconds of driver time) and codegen (method-too-large
    fallback to interpreted eval — the same trap that made the r1
    all-pairs BNLJ 60s). One numpy matmul per Arrow batch does the same
    work in microseconds. Sign bits are scale-invariant, so vectors are
    NOT normalized first. Exactness does not depend on this UDF: it
    only proposes candidates; the verify step recomputes exact cosine
    JVM-side."""
    planes = np.vstack([_hyperplanes(dim, n_planes, seed + t)
                        for t in range(n_tables)])  # (T·b, dim)
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def buckets(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)      # (batch, dim)
        bits = (m @ planes.T) > 0                        # (batch, T·b)
        ids = bits.reshape(len(m), n_tables, n_planes) @ pows
        return pd.Series(list(ids.astype(np.int32)))

    return buckets


def embedding_dup_pairs_lsh(embeddings: DataFrame, threshold: float,
                            dim: int = 64, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_planes: int = 8, n_tables: int = 8,
                            seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-LSH bucket candidates +
    exact verification — the HIGH-threshold scale path.

    Plan shape (no nested loop anywhere):
      1. bucket ids per vector per table (Arrow-vectorized matmul) —
         O(n) narrow rows (id, tbl, bucket) after posexplode;
      2. candidates = bucket cohabitants via an EQUALITY self-join on
         (tbl, bucket), deduped on (id_a, id_b) before any vector
         bytes move;
      3. verify = re-join the two vectors by id and keep pairs whose
         exact cosine (same left-associated JVM arithmetic as the
         all-pairs baseline, bit-identical to the SQL oracle) clears
         the threshold.

    Recall is governed by (n_planes, n_tables) against the threshold:
    P[pair with cosine c shares a bucket in ≥1 table] =
    1 - (1 - (1 - arccos(c)/π)^n_planes)^n_tables. At real dedup
    thresholds (c ≥ 0.8: collision prob ≥ 0.35/table at b=8 → ≥ 0.97
    across 8 tables) this prunes hard while keeping near-dups.
    Measured honesty note: at a LOW threshold (the registered query
    uses 0.4) on isotropic data, 100% recall forces wide buckets
    (b=2, T≥16), and the candidate set becomes ~95% of all pairs —
    LSH buys no asymptotic pruning there. That regime is served by
    :func:`embedding_dup_pairs` (blocked-GEMM filter) instead; this
    operator is the right tool once the threshold is high enough for
    buckets to discriminate. Tested against the exact baseline on
    planted near-dup fixtures in tests/test_similarity.py."""
    buckets = lsh_bucket_arrays(dim, n_planes, n_tables, seed)
    # persisted: BOTH sides of the candidate self-join consume bk —
    # unpersisted, the Arrow bucketing UDF and posexplode run over
    # the full corpus twice (r9 review; same boundary ann_lsh_topk
    # draws on its bucketed table).
    bk = tracked_persist(embeddings.select(
        F.col(id_col).alias("id"), buckets(vec_col).alias("bks"),
    ).select("id", F.posexplode("bks").alias("tbl", "bucket")))
    cand = (
        bk.select(F.col("id").alias("id_a"), "tbl", "bucket")
        .join(bk.select(F.col("id").alias("id_b"), "tbl", "bucket"),
              ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_cosine(
        cand, _l2_normalized(embeddings, dim, id_col, vec_col),
        dim, threshold)


def embedding_dup_pairs(embeddings: DataFrame, threshold: float,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        block_size: int = 4096,
                        margin: float = 1e-4,
                        n_blocks: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs, registered scale path:
    distributed blocked-GEMM candidate filter + exact JVM verification.

    Why not LSH here: the registered query's threshold (0.4) sits in
    the bulk of the isotropic cosine distribution, where sign-LSH
    buckets wide enough for 100% recall retain ~all pairs (measured:
    b=2, T=20 keeps 99.7% — all the overhead, none of the pruning).
    Exact low-threshold all-pairs is fundamentally a dense n×n score
    computation, so compute it the way hardware wants: as a blocked
    matrix product (BLAS), not as n² codegen'd 64-term expressions
    (the r1 all-pairs BNLJ burned 62s at sf0.1; this runs the same
    scores in milliseconds of matmul).

    Plan shape — the standard 2-D distributed GEMM decomposition:
      1. pack: hash rows into ⌈n/block_size⌉ blocks, collect each
         block's (ids, vectors) into ONE row (groupBy + collect_list —
         a single narrow shuffle of the corpus);
      2. block pairs: self-join blocks on blk_a <= blk_b — B(B+1)/2
         tasks, each holding two blocks;
      3. score: per task, one numpy float64 matmul of the L2-normalized
         blocks; emit only (id_a, id_b) index pairs whose approximate
         cosine ≥ threshold - margin (margin ≫ the ~1e-15 summation-
         order divergence between BLAS and the JVM's left-associated
         fold, so no true pair is lost);
      4. verify: join the two vectors back by id and keep pairs whose
         EXACT cosine (same unrolled JVM arithmetic as the all-pairs
         baseline, bit-identical to the SQL oracle) clears the real
         threshold. Candidates ≈ final answer + a margin sliver, so
         this join is broadcast-tiny.

    Scale accounting at 100 TB: communication is O(n·B) rows (each
    block shipped to B partner tasks) — the classic GEMM replication
    cost, vastly below O(n²) pair materialization; flops spread over
    B(B+1)/2 independent tasks; per-task memory is 2 blocks + a
    block_size² score tile (float64: 4096² = 128 MiB — tune
    block_size to the executor). Equality-join LSH
    (:func:`embedding_dup_pairs_lsh`) remains the better tool when the
    threshold is high enough for buckets to discriminate.

    Block count comes from parquet FOOTER metadata (driver-side footer
    reads — the same metadata query planning already pays, no Spark
    job), not a ``count()`` action: at 100 TB a count is a full scan
    before any work starts. Non-file-backed inputs (unit-test frames)
    fall back to one count; ``n_blocks`` overrides both."""
    if n_blocks is None:
        n = _estimate_rows(embeddings)
        if n is None:
            n = embeddings.count()
        n_blocks = max(1, -(-n // block_size))
    src = embeddings.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("v"),
                            F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks))
                            .alias("blk"))
    packed = (
        src.groupBy("blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
        .select("blk",
                F.expr("transform(rows, r -> r.id)").alias("ids"),
                F.expr("transform(rows, r -> r.v)").alias("vecs"))
    )
    bp = (
        packed.select(F.col("blk").alias("blk_a"),
                      F.col("ids").alias("ids_a"),
                      F.col("vecs").alias("vecs_a"))
        .join(packed.select(F.col("blk").alias("blk_b"),
                            F.col("ids").alias("ids_b"),
                            F.col("vecs").alias("vecs_b")),
              F.col("blk_a") <= F.col("blk_b"))
        # one heavy task per block pair, not per input partition
        .repartition(n_blocks * (n_blocks + 1) // 2, "blk_a", "blk_b")
    )
    cut = threshold - margin

    def score(batches):
        for pdf in batches:
            out_a, out_b = [], []
            for ra, va, rb, vb, same in zip(
                    pdf["ids_a"], pdf["vecs_a"], pdf["ids_b"],
                    pdf["vecs_b"], pdf["blk_a"] == pdf["blk_b"]):
                ids_a = np.asarray(ra, dtype=np.int64)
                ids_b = np.asarray(rb, dtype=np.int64)
                ma = np.array([np.asarray(x, dtype=np.float64) for x in va])
                mb = np.array([np.asarray(x, dtype=np.float64) for x in vb])
                na = np.linalg.norm(ma, axis=1, keepdims=True)
                nb = np.linalg.norm(mb, axis=1, keepdims=True)
                na[na == 0] = 1.0
                nb[nb == 0] = 1.0
                s = (ma / na) @ (mb / nb).T
                ia, ib = np.nonzero(s >= cut)
                if same:  # each unordered pair once, no diagonal
                    keep = ia < ib
                    ia, ib = ia[keep], ib[keep]
                lo = np.minimum(ids_a[ia], ids_b[ib])
                hi = np.maximum(ids_a[ia], ids_b[ib])
                out_a.append(lo)
                out_b.append(hi)
            if out_a:
                yield pd.DataFrame({
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b)})

    cand = bp.mapInPandas(score, "id_a long, id_b long")
    return _verify_cosine(
        cand, _l2_normalized(embeddings, dim, id_col, vec_col),
        dim, threshold)


def ivf_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             dim: int = 64, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    family member next to sign-LSH: partition the corpus into
    `n_centroids` Voronoi cells, search only the `nprobe` cells nearest
    each query. Returns (query_id, neighbor_id, cosine, rank).

    Centroids are DETERMINISTIC: the corpus vectors with
    ``id < n_centroids`` (random-init IVF without the k-means
    refinement — a real build would Lloyd-iterate; determinism keeps
    the whole index SQL-reproducible, so unlike most ANN indexes this
    one is fully oracle-checked).

    Plan shape:
      1. assignment: corpus × broadcast(centroids) (n·C rows, C small)
         scored with the UNROLLED cosine — the same left-associated
         arithmetic as the SQL oracle, so cell assignment is
         bit-identical across engines (ties broken by centroid id);
         one ranking window partitioned by vector id;
      2. probes: the same ranking for query vectors, keeping nprobe
         cells each;
      3. candidates: probes ⋈ assignments on the CELL id (equality
         join — shuffle keyed by cell), ranked by exact cosine.

    Scale notes: assignment is O(n·C) expression evaluations; at
    C ≳ 10³ switch step 1 to the Arrow matmul pattern
    (lsh_bucket_arrays) and feed k-means centroids — the index
    structure and probe join are unchanged. Candidate volume per query
    ≈ n·nprobe/C of the corpus — the recall/cost dial."""
    # Norms are hoisted into per-row columns BEFORE any pair expansion:
    # cosine(a,b) = dot(a,b)/sqrt(nsq_a*nsq_b) evaluates the identical
    # IEEE-754 sequence as the inline form (and the SQL oracle), but
    # each row's norm is computed once, not once per pair — the n·C
    # assignment and the candidate re-rank drop to one dot per pair.
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        norm_sq_unrolled(vec_col, dim).alias("cnsq"))
    v = embeddings.select(F.col(id_col).alias("vid"),
                          F.col(vec_col).alias("vv"),
                          norm_sq_unrolled(vec_col, dim).alias("vnsq"))
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "ccos",
        dot_unrolled("vv", "cv", dim)
        / F.sqrt(F.col("vnsq") * F.col("cnsq")))
    w_assign = Window.partitionBy("vid").orderBy(
        F.desc("ccos"), F.asc("cid"))
    ranked = scored.withColumn("crank", F.row_number().over(w_assign))
    assign = ranked.filter(F.col("crank") == 1).select(
        F.col("vid").alias("neighbor_id"), F.col("vv").alias("cv_n"),
        F.col("vnsq").alias("n_nsq"), "cid")
    probes = ranked.filter(F.col("vid").isin(query_ids)
                           & (F.col("crank") <= nprobe)).select(
        F.col("vid").alias("query_id"), F.col("vv").alias("qv"),
        F.col("vnsq").alias("q_nsq"), "cid")
    cands = (
        probes.join(assign, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv_n", "q_nsq", "n_nsq")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn(
            "cosine",
            dot_unrolled("qv", "cv_n", dim)
            / F.sqrt(F.col("q_nsq") * F.col("n_nsq")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_centroids(embeddings: DataFrame, n_centroids: int = 16,
                     n_iters: int = 3, dim: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     corpus: DataFrame | None = None,
                     ) -> list[tuple[int, list[float]]]:
    """Spherical-k-means refinement of the IVF coarse quantizer:
    Lloyd iterations with cosine assignment and direction-mean centroid
    updates (mean of L2-normalized members — the spherical variant,
    since IVF cells here are cosine Voronoi regions).

    Init = the deterministic id-derived centroids ``ivf_topk`` uses, so
    refinement strictly post-processes the same index family. Returns
    centroid metadata as plain Python — C·dim floats collected per
    iteration, which is INDEX METADATA (kilobytes), not corpus data;
    the corpus itself is only ever scanned (assignment) and
    partially aggregated (per-cell component means via posexplode —
    the embedding_centroids pattern), both distributed. Empty cells
    keep their previous centroid (standard Lloyd convention).

    ``corpus`` (optional): a pre-repartitioned+persisted (vv) frame to
    iterate over — pass it when the caller keeps iterating afterwards
    (ivf_kmeans_topk does) so the scan+spread shuffle happens once for
    the whole build instead of once per Lloyd pass.

    Determinism note: per-partition partial sums merge on the driver in
    float64, so centroid coordinates can differ in the last bit across
    partition layouts (np.add.at accumulation order). Downstream
    rankings could flip only on exact cosine ties; correctness is
    carried by the probe machinery (all-cells probe ≡ brute force for
    ANY centroids — see ivf_kmeans_topk), not by centroid bits."""
    cents = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in embeddings.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col).collect())
    if corpus is None:
        # spread the Arrow batches across DATA-SIZED partitions, once,
        # and keep them hot across passes (see _data_sized_partitions:
        # a fixed 32-way fan-out is per-pass worker overhead on small
        # corpora and too few waves on huge ones)
        corpus = tracked_persist(
            embeddings.select(F.col(vec_col).alias("vv"))
            .repartition(_data_sized_partitions(embeddings)))
    v = corpus
    for _ in range(n_iters):
        # One mapInPandas pass per Lloyd iteration: each Arrow batch is
        # assigned by numpy matmul (argmax ties → lowest cid, matching
        # ivf_topk's (desc cos, asc cid) window order since `cents` is
        # cid-sorted) AND folded into per-cell unit-vector sums right
        # there — each partition emits C partial rows (cid, n, sum),
        # so the per-pass shuffle is partitions·C tiny rows instead of
        # the n·dim posexplode this replaces.
        parts = v.mapInPandas(
            _cell_partials_fn(cents),
            schema="cid int, n long, s array<double>").collect()
        counts = {cid: 0 for cid, _ in cents}
        sums = {cid: np.zeros(dim) for cid, _ in cents}
        for r in parts:
            counts[int(r["cid"])] += int(r["n"])
            sums[int(r["cid"])] += np.asarray(r["s"])
        cents = [(cid,
                  (sums[cid] / counts[cid]).tolist()
                  if counts[cid] else cv)
                 for cid, cv in cents]
    return cents


def _cell_partials_fn(cents: list[tuple[int, list[float]]]):
    """mapInPandas body: per-batch nearest-cell assignment (cosine =
    argmax over v·ĉ, centroids L2-normalized once) folded into per-cell
    running (count, sum of L2-normalized members) — the spherical
    k-means sufficient statistics, emitted once per partition."""
    cids = np.array([c for c, _ in cents], dtype=np.int32)
    M = np.array([vec for _, vec in cents], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    M = M / norms
    dim = M.shape[1]

    def fn(batches):
        counts = np.zeros(len(cids), dtype=np.int64)
        sums = np.zeros((len(cids), dim), dtype=np.float64)
        for pdf in batches:
            X = np.array(pdf["vv"].tolist(), dtype=np.float64)
            if not len(X):
                continue
            a = np.argmax(X @ M.T, axis=1)
            xn = np.linalg.norm(X, axis=1, keepdims=True)
            xn[xn == 0] = 1.0
            U = X / xn
            counts += np.bincount(a, minlength=len(cids))
            np.add.at(sums, a, U)
        yield pd.DataFrame({"cid": cids, "n": counts, "s": list(sums)})

    return fn


def _topcells_udf(cents: list[tuple[int, list[float]]], nprobe: int):
    """Arrow pandas_udf: the nprobe nearest cell ids per vector by
    cosine (stable argsort → deterministic, lowest-cid tie-break;
    centroid rows are L2-normalized once so ordering v·ĉ equals
    ordering cosine — the vector's own norm is constant per row).
    Element 0 is the argmax cell, so ONE udf serves both the corpus
    assignment (cells[0]) and the query probe list (explode) — one
    Python stage to compile and warm instead of two."""
    cids = np.array([c for c, _ in cents], dtype=np.int32)
    M = np.array([vec for _, vec in cents], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    M = M / norms

    @F.pandas_udf("array<int>")
    def f(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        order = np.argsort(-(X @ M.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cids[order]))

    return f


def ivf_kmeans_topk(embeddings: DataFrame, query_ids: list[int],
                    k: int = 5, dim: int = 64, n_centroids: int = 16,
                    nprobe: int = 4, n_iters: int = 3,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    probe_all: bool = False,
                    cents: list[tuple[int, list[float]]] | None = None,
                    ) -> DataFrame:
    """IVF top-k over k-means-REFINED centroids — same index structure
    and probe join as :func:`ivf_topk` (assignment window → probe
    window → equality join on the cell id → exact re-rank), but the
    cells are spherical-k-means Voronoi regions instead of the
    arbitrary id-init ones, so cells track the data's actual cluster
    structure and recall at fixed nprobe rises on clustered corpora.
    Not SQL-reproducible (iterative refinement) → rows-only driver
    check; exactness is gated the closed-loop way instead: probing all
    cells must equal brute force (tests/test_similarity.py), which
    holds for ANY centroid set — the probe machinery, not the
    centroids, carries correctness.

    ``probe_all``: probe every cell of the trained quantizer —
    ``nprobe = len(cents)``, derived AFTER the centroids resolve (the
    ``ivfpq_topk`` contract: a precomputed ``cents`` may carry a
    different cell count than the ``n_centroids`` parameter, and
    probing fewer than all of them would silently void the "provably
    brute force for ANY centroids" exactness gate).

    ``cents``: precomputed trained centroids (``kmeans_centroids``
    output, typically via ``cache.shared_value`` so a production query
    and its probe-all gate search the SAME index instance and the
    multi-pass training runs once per process); trained here when
    omitted."""
    v = tracked_persist(
        embeddings.select(F.col(id_col).alias("vid"),
                          F.col(vec_col).alias("vv"),
                          norm_sq_unrolled(vec_col, dim).alias("nsq"))
        .repartition(_data_sized_partitions(embeddings)))
    if cents is None:
        cents = kmeans_centroids(embeddings, n_centroids, n_iters, dim,
                                 id_col, vec_col, corpus=v.select("vv"))
    if probe_all:
        nprobe = len(cents)
    topcells = _topcells_udf(cents, nprobe)
    assign = v.select(
        F.col("vid").alias("neighbor_id"), F.col("vv").alias("cv_n"),
        F.col("nsq").alias("n_nsq"),
        topcells("vv").getItem(0).alias("cid"))
    probes = (v.filter(F.col("vid").isin(query_ids))
               .select(F.col("vid").alias("query_id"),
                       F.col("vv").alias("qv"),
                       F.col("nsq").alias("q_nsq"),
                       F.explode(topcells("vv")).alias("cid")))
    cands = (
        probes.join(assign, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv_n", "q_nsq", "n_nsq")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn(
            "cosine",
            dot_unrolled("qv", "cv_n", dim)
            / F.sqrt(F.col("q_nsq") * F.col("n_nsq")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (public numpy RNG, fixed seed)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def ann_lsh_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                 dim: int = 64, n_planes: int = 4, n_tables: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 multiprobe: int | bool = 1) -> DataFrame:
    """Approximate top-k: rank only bucket-cohabitants of each query,
    across `n_tables` independent bucketings (union raises recall).
    Returns (query_id, neighbor_id, cosine, rank).

    Recall characteristics: sign-LSH concentrates TRUE near neighbours
    (cosine near 1) into shared buckets with probability
    ``(1 - θ/π)^n_planes`` per table — near-duplicates are found with
    high probability. On uniformly random vectors (no structure) recall
    degrades to ≈ the examined-candidate fraction; that is a property
    of the data, not the index. Tune n_planes up for bigger corpora
    (smaller buckets), n_tables up for recall.

    Multiprobe (default depth 1): each QUERY additionally probes every
    bucket within Hamming distance ``multiprobe`` of its own — the
    neighbouring half-spaces where a near miss most likely landed
    (``True`` ≡ 1 for back-compat; 0/False disables). Depth d
    multiplies examined candidates by ≤ Σ_{i≤d} C(n_planes, i) while
    touching only the (tiny) query side of the join: the corpus is
    never re-bucketed, re-shuffled, or widened — the recall/cost dial
    a user turns before paying for more tables. Measured on the
    near-uniform driver corpus (the hard case): recall ≈0.2-0.35
    single-probe → ≥0.6 at depth 1; planted near-duplicates: 50/50
    (tests/test_similarity.py gates both, plus candidate-superset
    monotonicity across depths)."""
    # ALL tables' buckets from ONE Arrow matmul per batch
    # (lsh_bucket_arrays — the same bucketer embedding_dup_pairs_lsh
    # uses): n_tables·n_planes plane-dots as a single numpy GEMM
    # instead of unrolled (n_tables·n_planes·dim)-term SQL projections,
    # which blew up both plan construction and codegen (method-too-
    # large → interpreted eval) and made this query the one bench
    # regression of round 2. Then one posexplode + persist — both join
    # sides below consume the bucketed table.
    buckets = lsh_bucket_arrays(dim, n_planes, n_tables, seed=42)
    all_buckets = embeddings.select(
        F.col(id_col), F.col(vec_col), buckets(vec_col).alias("bks"),
    ).select(id_col, vec_col,
             F.posexplode("bks").alias("tbl", "bucket"))
    all_buckets = tracked_persist(all_buckets)
    q = all_buckets.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        "bucket", "tbl")
    probe_bits = int(multiprobe)  # True -> 1, False -> 0
    if probe_bits:
        from itertools import combinations
        masks = [0] + [
            sum(1 << j for j in bits)
            for d in range(1, probe_bits + 1)
            for bits in combinations(range(n_planes), d)
        ]
        probes = F.array(*[F.col("bucket").bitwiseXOR(F.lit(m))
                           for m in masks])
        q = q.select("query_id", "qv", "tbl",
                     F.explode(probes).alias("bucket"))
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


# ---------------------------------------------------------------------
# Product quantization (PQ): compress vectors to m sub-codes, search
# with asymmetric distance computation (ADC) + exact re-rank.
# ---------------------------------------------------------------------

def pq_train(embeddings: DataFrame, m: int = 8, ks: int = 16,
             n_iters: int = 3, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             normalize: bool = True) -> np.ndarray:
    """Train PQ codebooks: split the L2-NORMALIZED vector into ``m``
    contiguous subspaces of dim/m components and run Lloyd k-means
    (Euclidean — on unit vectors L2 order is cosine order) per
    subspace with ``ks`` centroids each. ALL subspaces train in the
    same distributed pass: one mapInPandas per iteration emits
    per-(subspace, centroid) partial sufficient statistics
    (count, component sum — m·ks tiny rows per partition), merged on
    the driver. Codebooks are INDEX METADATA (m·ks·dsub floats, a few
    KB) — the corpus itself is only scanned. Init = subvectors of the
    first ``ks`` ids (deterministic). Returns an (m, ks, dsub) array.

    ``normalize=False`` trains on the vectors AS GIVEN — the residual
    case (IVF-PQ): residuals are displacements from a coarse
    centroid, and re-normalizing them would destroy the geometry the
    codebook is meant to quantize.
    """
    dsub = dim // m
    init = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in embeddings.filter(F.col(id_col) < ks)
        .select(id_col, vec_col).collect())
    books = np.zeros((m, ks, dsub))
    for cid, vec in init:
        v = np.asarray(vec, dtype=np.float64)
        if normalize:
            n = np.linalg.norm(v)
            v = v / n if n else v
        books[:, cid, :] = v.reshape(m, dsub)
    corpus = tracked_persist(
        embeddings.select(F.col(vec_col).alias("vv"))
        .repartition(_data_sized_partitions(embeddings)))
    for _ in range(n_iters):
        parts = corpus.mapInPandas(
            _pq_partials_fn(books, normalize),
            schema="sub int, cid int, n long, s array<double>"
        ).collect()
        counts = np.zeros((m, ks), dtype=np.int64)
        sums = np.zeros((m, ks, dsub))
        for r in parts:
            counts[int(r["sub"]), int(r["cid"])] += int(r["n"])
            sums[int(r["sub"]), int(r["cid"])] += np.asarray(r["s"])
        nz = counts > 0
        books = np.where(nz[:, :, None],
                         sums / np.maximum(counts, 1)[:, :, None],
                         books)
    return books


def _pq_partials_fn(books: np.ndarray, normalize: bool = True):
    m, ks, dsub = books.shape

    def fn(batches):
        counts = np.zeros((m, ks), dtype=np.int64)
        sums = np.zeros((m, ks, dsub))
        for pdf in batches:
            X = np.array(pdf["vv"].tolist(), dtype=np.float64)
            if not len(X):
                continue
            if normalize:
                nrm = np.linalg.norm(X, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                X = X / nrm
            X = X.reshape(len(X), m, dsub)
            for s in range(m):
                # argmin ||x_s - c||² = argmax (x·c - ||c||²/2)
                B = books[s]
                score = X[:, s, :] @ B.T - 0.5 * (B * B).sum(axis=1)
                a = np.argmax(score, axis=1)
                np.add.at(counts[s], a, 1)
                np.add.at(sums[s], a, X[:, s, :])
        out = [(s, c, int(counts[s, c]), sums[s, c].tolist())
               for s in range(m) for c in range(ks)]
        yield pd.DataFrame(out, columns=["sub", "cid", "n", "s"])

    return fn


def pq_encode(embeddings: DataFrame, books: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              normalize: bool = True) -> DataFrame:
    """Encode every vector to its m-byte PQ code (array<int>): per
    subspace, the nearest codebook centroid of the L2-normalized
    subvector (``normalize=False`` → of the subvector as given — the
    IVF-PQ residual case). Arrow-batched mapInPandas, one numpy
    matmul per subspace per batch; output is (id, code) — the
    8-byte-per-vector representation that makes billion-scale ANN
    memory-resident."""
    m, ks, dsub = books.shape

    def fn(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if not len(X):
                yield pd.DataFrame({"vec_id": [], "code": []})
                continue
            if normalize:
                nrm = np.linalg.norm(X, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                X = X / nrm
            Xs = X.reshape(len(X), m, dsub)
            codes = np.stack(
                [np.argmax(Xs[:, s, :] @ books[s].T
                           - 0.5 * (books[s] * books[s]).sum(axis=1),
                           axis=1)
                 for s in range(m)], axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].values,
                                "code": list(codes)})

    return embeddings.select(id_col, vec_col).mapInPandas(
        fn, schema="vec_id long, code array<int>")


def pq_adc_topk(embeddings: DataFrame, query_ids: list[int],
                k: int = 5, m: int = 8, ks: int = 16,
                rerank: int = 50, dim: int = 64,
                id_col: str = "vec_id", vec_col: str = "embedding",
                books: "np.ndarray | None" = None,
                codes: DataFrame | None = None) -> DataFrame:
    """PQ search with ADC + exact re-rank — the standard two-stage
    ANN: (1) each query precomputes an (m × ks) distance table
    (driver-side — |Q|·m·ks floats); every corpus CODE then scores in
    m table lookups, and each partition emits only its local
    top-``rerank`` per query (mapInPandas heap cut — the corpus never
    shuffles); (2) the ≤ |Q|·partitions·rerank survivors re-rank by
    EXACT cosine against the broadcast query vectors, cutting to
    top-k. Approximation error lives only in stage-1 candidate
    selection — reported cosines are exact. Rows-only under the
    driver (approximate by design); recall gates live in
    tests/test_similarity.py.

    ``books`` / ``codes``: precomputed codebooks and (vec_id, code)
    table (via ``cache.shared_value`` / ``shared_parquet``, so the
    production query and its rerank-all gate score the SAME trained
    index and the corpus encodes once per process — the production
    shape, where the code table IS the stored index); trained/encoded
    here when omitted. ``codes`` requires ``books`` (the ADC tables
    must come from the codebooks that produced the codes)."""
    if codes is not None and books is None:
        raise ValueError("codes without books: ADC tables need the "
                         "codebooks that produced the codes")
    if books is None:
        books = pq_train(embeddings, m=m, ks=ks, dim=dim,
                         id_col=id_col, vec_col=vec_col)
    if codes is None:
        codes = pq_encode(embeddings, books, id_col=id_col,
                          vec_col=vec_col)
    qrows = sorted(
        (int(r[0]), np.asarray([float(x) for x in r[1]]))
        for r in embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col).collect())
    qids = np.array([q for q, _ in qrows], dtype=np.int64)
    dsub = dim // m
    tables = []
    for _, v in qrows:
        n = np.linalg.norm(v)
        vs = (v / n if n else v).reshape(m, dsub)
        tables.append(np.stack(
            [((books[s] - vs[s][None, :]) ** 2).sum(axis=1)
             for s in range(m)]))
    T = np.stack(tables)  # (|Q|, m, ks)

    def score_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["code"].values).astype(np.int64)  # (n, m)
            ids = pdf["vec_id"].values
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids)):
                d = T[qi][np.arange(m)[None, :], C].sum(axis=1)
                sel = ~np.equal(ids, qids[qi])
                idx = np.nonzero(sel)[0]
                if not len(idx):
                    continue
                top = idx[np.argsort(d[idx], kind="stable")[:rerank]]
                out_q.extend([int(qids[qi])] * len(top))
                out_n.extend(int(ids[t]) for t in top)
                out_d.extend(float(d[t]) for t in top)
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "adist": out_d})

    cands = codes.mapInPandas(
        score_fn, schema="query_id long, neighbor_id long, adist double")
    qdf = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_sq_unrolled(vec_col, dim).alias("qn"))
    cdf = embeddings.select(F.col(id_col).alias("neighbor_id"),
                            F.col(vec_col).alias("cv"),
                            norm_sq_unrolled(vec_col, dim).alias("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (cands.join(cdf, "neighbor_id").join(F.broadcast(qdf),
                                                "query_id")
            .withColumn("cosine", dot_unrolled("qv", "cv", dim)
                        / F.sqrt(F.col("qn") * F.col("cn")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


# ---------------------------------------------------------------------
# Graph ANN (NSW): per-shard navigable-small-world graphs + beam
# search — the graph-index family (HNSW et al.), distributed the way
# production vector stores shard it: each partition owns an
# independent graph over its vectors, queries fan out to every shard,
# per-shard candidates merge through one exact global re-rank.
# ---------------------------------------------------------------------

def _nsw_search(adj: list, X: "np.ndarray", q: "np.ndarray",
                entry: int, ef: int) -> list:
    """Deterministic best-first beam search over graph ``adj`` from
    ``entry``: maintain the ef best nodes seen; expand the most
    promising frontier node until it can no longer improve the beam.
    Ties break on node index (heap tuples carry the index), so the
    walk is reproducible regardless of dict/set iteration order.
    Returns the beam as (similarity, node) sorted best-first."""
    import heapq
    sims: dict = {}

    def sim(i: int) -> float:
        s = sims.get(i)
        if s is None:
            s = float(X[i] @ q)
            sims[i] = s
        return s

    visited = {entry}
    frontier = [(-sim(entry), entry)]
    beam = [(sim(entry), entry)]  # min-heap of the ef best
    while frontier:
        neg_s, u = heapq.heappop(frontier)
        if len(beam) >= ef and -neg_s < beam[0][0]:
            break  # best frontier node can't beat the beam's worst
        for v in adj[u]:
            if v in visited:
                continue
            visited.add(v)
            sv = sim(v)
            if len(beam) < ef or sv > beam[0][0]:
                heapq.heappush(frontier, (-sv, v))
                heapq.heappush(beam, (sv, v))
                if len(beam) > ef:
                    heapq.heappop(beam)
    return sorted(beam, key=lambda t: (-t[0], t[1]))


def _nsw_component(adj: list, entry: int) -> list:
    """Every node reachable from ``entry`` (plain BFS)."""
    seen = {entry}
    stack = [entry]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return sorted(seen)


def _build_nsw(X: "np.ndarray", max_degree: int, ef_construction: int
               ) -> list:
    """Incremental NSW construction (Malkov et al.'s navigable small
    world, single-layer): insert vectors in index order; each new node
    beam-searches the EXISTING graph for its ef_construction nearest,
    links bidirectionally to the best ``max_degree``, and any
    neighbour whose degree overflows 2·max_degree prunes back to its
    most-similar links — EXCEPT spanning-tree edges.

    Connectivity invariant (load-bearing for probe_all exactness):
    node i's FIRST link at insertion is marked a spanning edge and is
    never pruned, so by induction every node stays connected to node
    0's component — a beam search with ef ≥ n therefore visits the
    entire shard."""
    n = len(X)
    adj: list = [[] for _ in range(n)]
    span: set = set()  # undirected spanning edges, never pruned
    for i in range(1, n):
        res = _nsw_search(adj, X, X[i], 0, ef_construction)
        nbrs = [j for _, j in res[:max_degree]]
        span.add((min(i, nbrs[0]), max(i, nbrs[0])))
        for j in nbrs:
            adj[i].append(j)
            adj[j].append(i)
            if len(adj[j]) > 2 * max_degree:
                keep = sorted(
                    ((float(X[j] @ X[v]), v) for v in set(adj[j])),
                    key=lambda t: (-t[0], t[1]))
                kept = {v for _, v in keep[:2 * max_degree]}
                kept |= {v for v in adj[j]
                         if (min(j, v), max(j, v)) in span}
                adj[j] = sorted(kept)
    return adj


def nsw_candidates(embeddings: DataFrame, query_ids: list[int],
                   dim: int = 64, max_degree: int = 8,
                   ef_search: int = 48, ef_construction: int = 32,
                   shard_rows: int = 4096, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   probe_all: bool = False) -> DataFrame:
    """(query_id, neighbor_id) ANN candidates from per-shard NSW
    graphs. Shards are LOGICAL (vec_id mod P with P sized from the
    data) so results don't depend on physical partitioning; each
    applyInPandas group sorts by id, L2-normalizes, builds its graph,
    and beam-searches every query from entry node 0. With
    ``probe_all`` the search is replaced by the full reachable
    component — which the connectivity invariant makes the WHOLE
    shard (self-checked with an assert), so the candidate union is
    provably the entire corpus and the downstream exact re-rank is
    provably brute force, independent of any float detail here (the
    ivf_kmeans_probe_all closed-loop pattern).

    At 100 TB: shard count grows with the data (fixed shard_rows), so
    per-shard build cost and memory are constant; queries broadcast
    in the closure; the candidate table is |Q|·P·ef rows — the only
    data-sized stages are the one shuffle onto shards and the
    re-rank join."""
    rows = _estimate_rows(embeddings)
    n_shards = max(1, -(-rows // shard_rows)) if rows else 1
    qrows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col).collect())

    def run_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        X = X / norms[:, None]
        adj = _build_nsw(X, max_degree, ef_construction)
        out_q, out_n = [], []
        if probe_all:
            comp = _nsw_component(adj, 0) if len(X) else []
            if len(comp) != len(X):
                # the probe_all exactness contract rests on this;
                # raise (not assert — python -O strips asserts and
                # the gate would pass vacuously on a partial set)
                raise RuntimeError(
                    "NSW spanning invariant violated: graph "
                    "disconnected")
            for qid, _ in qrows:
                out_q.extend([qid] * len(comp))
                out_n.extend(int(ids[c]) for c in comp)
        else:
            for qid, qv in qrows:
                q = np.asarray(qv, dtype=np.float64)
                nq = np.linalg.norm(q)
                q = q / nq if nq else q
                beam = _nsw_search(adj, X, q, 0, ef_search) \
                    if len(X) else []
                out_q.extend([qid] * len(beam))
                out_n.extend(int(ids[i]) for _, i in beam)
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    shards = embeddings.select(
        id_col, vec_col,
        (F.col(id_col) % n_shards).alias("_shard"))
    return (shards.groupBy("_shard")
            .applyInPandas(run_shard,
                           schema="query_id long, neighbor_id long"))


def nsw_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             dim: int = 64, max_degree: int = 8, ef_search: int = 48,
             ef_construction: int = 32, shard_rows: int = 4096,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probe_all: bool = False) -> DataFrame:
    """Graph-ANN top-k: per-shard NSW beam candidates, then ONE exact
    global re-rank with the same unrolled-SQL cosine the oracle uses
    (all float-sensitive math stays JVM-side — the Python stage only
    nominates ids). Returns (query_id, neighbor_id, cosine, rank)."""
    cands = nsw_candidates(
        embeddings, query_ids, dim=dim, max_degree=max_degree,
        ef_search=ef_search, ef_construction=ef_construction,
        shard_rows=shard_rows, id_col=id_col, vec_col=vec_col,
        probe_all=probe_all).distinct()
    qdf = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm_sq_unrolled(vec_col, dim).alias("qn"))
    cdf = embeddings.select(F.col(id_col).alias("neighbor_id"),
                            F.col(vec_col).alias("cv"),
                            norm_sq_unrolled(vec_col, dim).alias("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (cands.filter(F.col("neighbor_id") != F.col("query_id"))
            .join(cdf, "neighbor_id").join(F.broadcast(qdf), "query_id")
            .withColumn("cosine", dot_unrolled("qv", "cv", dim)
                        / F.sqrt(F.col("qn") * F.col("cn")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


# ---------------------------------------------------------------------
# IVF-PQ (the FAISS IVFPQ architecture): coarse Voronoi cells +
# PQ-coded RESIDUALS, ADC scoring within probed cells, exact re-rank.
# ---------------------------------------------------------------------

def ivfpq_residual_frame(embeddings: DataFrame,
                         cents: list[tuple[int, list[float]]],
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """The persisted (vec_id, cell, resid) residual frame — THE
    corpus-scaled pass of IVF-PQ index construction. Build it once and
    hand it to both :func:`ivfpq_train_books` and
    :func:`ivfpq_encode_codes`; letting each derive its own would scan
    and residual-encode the corpus twice per index build."""
    return tracked_persist(
        ivf_residuals(embeddings, cents, id_col, vec_col)
        .repartition(_data_sized_partitions(embeddings)))


def ivfpq_train_books(embeddings: DataFrame,
                      cents: list[tuple[int, list[float]]],
                      m: int = 8, ks: int = 16, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      resid: DataFrame | None = None) -> "np.ndarray":
    """Residual PQ codebooks for the given coarse centroids: one
    residual pass (or the caller's precomputed ``resid`` frame from
    :func:`ivfpq_residual_frame`), then per-subspace Lloyd training
    with normalize=False (residuals are displacements — re-normalizing
    would destroy the geometry being quantized)."""
    rdf = resid if resid is not None else ivfpq_residual_frame(
        embeddings, cents, id_col, vec_col)
    return pq_train(rdf, m=m, ks=ks, dim=dim, id_col="vec_id",
                    vec_col="resid", normalize=False)


def ivfpq_encode_codes(embeddings: DataFrame,
                       cents: list[tuple[int, list[float]]],
                       books: "np.ndarray",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       resid: DataFrame | None = None) -> DataFrame:
    """The IVF-PQ stored index table: (vec_id, code, cell) — every
    vector's coarse-cell assignment plus the PQ code of its residual
    under the given trained ``cents``/``books``. One encode pass over
    ``resid`` (the caller's :func:`ivfpq_residual_frame`, or derived
    here); this 12 B/vector frame is what a production store
    materializes (and what ``cache.shared_parquet`` shares across a
    production query and its probe-all gate)."""
    rdf = resid if resid is not None else ivfpq_residual_frame(
        embeddings, cents, id_col, vec_col)
    return (pq_encode(rdf, books, id_col="vec_id", vec_col="resid",
                      normalize=False)
            .join(rdf.select("vec_id", "cell"), "vec_id"))


def ivf_residuals(embeddings: DataFrame,
                  cents: list[tuple[int, list[float]]],
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  ) -> DataFrame:
    """(id, cell, resid): each vector's coarse-cell assignment and its
    residual displacement r = v̂ − ĉ(cell) from the (L2-normalized)
    cell centroid — the quantity IVF-PQ codes, which is much more
    compressible than the raw vector because cell-local displacements
    are small and centered. One Arrow pass; centroids ride in the
    closure (index metadata)."""
    cids = np.array([c for c, _ in cents], dtype=np.int32)
    M = np.array([vec for _, vec in cents], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    M = M / norms

    def fn(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if not len(X):
                yield pd.DataFrame({"vec_id": [], "cell": [],
                                    "resid": []})
                continue
            nrm = np.linalg.norm(X, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            U = X / nrm
            a = np.argmax(U @ M.T, axis=1)
            R = U - M[a]
            yield pd.DataFrame({"vec_id": pdf[id_col].values,
                                "cell": cids[a],
                                "resid": list(R)})

    return embeddings.select(id_col, vec_col).mapInPandas(
        fn, schema="vec_id long, cell int, resid array<double>")


def ivfpq_topk(embeddings: DataFrame, query_ids: list[int],
               k: int = 5, dim: int = 64, n_centroids: int = 16,
               nprobe: int = 4, m: int = 8, ks: int = 16,
               rerank: int = 32, n_iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               probe_all: bool = False,
               cents: list[tuple[int, list[float]]] | None = None,
               books: "np.ndarray | None" = None,
               codes: DataFrame | None = None) -> DataFrame:
    """IVF-PQ search — the two-level index every billion-scale vector
    store runs (FAISS IVFPQ): spherical-k-means coarse cells prune
    the corpus to nprobe Voronoi regions, PQ codes over the CELL
    RESIDUALS give an 8-byte in-memory representation, ADC lookup
    tables (built per probed cell from the query's residual there)
    score candidates without touching any float vector, per-partition
    top-``rerank`` cuts bound the candidate stream, and one exact
    JVM-side cosine re-rank fixes the final ranking. Composes the
    existing index stages: kmeans_centroids (coarse), pq_train /
    pq_encode with normalize=False (residual codebooks + codes).

    ``probe_all`` widens the gate the closed-loop way: every cell
    probed AND the per-partition cut widened past the corpus ⇒ the
    candidate set is provably everything ⇒ the exact re-rank IS
    brute force for ANY centroids/codebooks (ivf_kmeans_probe_all /
    pq_rerank_all pattern).

    At 100 TB: codes+cells are 12 bytes/vector (memory-resident at
    billions), the scoring pass is one Arrow scan with numpy table
    lookups, per-partition cuts keep the shuffle at
    O(partitions·|Q|·rerank), and every driver-side object is index
    metadata (C·dim + m·ks·dsub floats).

    ``cents`` / ``books`` / ``codes``: precomputed index pieces
    (coarse centroids, residual codebooks, and the
    (vec_id, code, cell) table — via ``cache.shared_value`` /
    ``shared_parquet``, so the production query and its probe-all
    gate search the SAME trained index and the corpus
    residual-encodes once per process; codes+cells are the 12 B/vector
    layout a production store persists); trained/encoded here when
    omitted. ``books``/``codes`` require ``cents`` (they quantize ITS
    residual geometry), ``codes`` requires ``books``."""
    if (books is not None or codes is not None) and cents is None:
        raise ValueError("books/codes without cents: residual "
                         "codebooks are relative to the coarse cells")
    if codes is not None and books is None:
        raise ValueError("codes without books: ADC tables need the "
                         "codebooks that produced the codes")
    if cents is None:
        cents = kmeans_centroids(embeddings, n_centroids, n_iters, dim,
                                 id_col, vec_col)
    if books is None:
        # compose the build from the helpers above (ONE copy of the
        # index-build recipe — r9 review replaced an inlined verbatim
        # duplicate that could drift): one shared residual frame feeds
        # both training and encoding.
        rdf = ivfpq_residual_frame(embeddings, cents, id_col, vec_col)
        books = ivfpq_train_books(embeddings, cents, m=m, ks=ks,
                                  dim=dim, id_col=id_col,
                                  vec_col=vec_col, resid=rdf)
        if codes is None:
            codes = ivfpq_encode_codes(embeddings, cents, books,
                                       id_col, vec_col, resid=rdf)
    if codes is None:
        codes = ivfpq_encode_codes(embeddings, cents, books,
                                   id_col, vec_col)

    if probe_all:
        # len(cents), NOT the n_centroids parameter: precomputed cents
        # may carry a different cell count, and probing fewer than all
        # of them would silently void the "provably brute force for
        # ANY centroids" exactness contract.
        nprobe = len(cents)
        rows = _estimate_rows(embeddings)
        if rows is None:
            # exactness-gate path: a guessed constant could UNDERSIZE
            # the rerank cut on a large non-parquet-backed corpus and
            # silently void the brute-force contract — pay the exact
            # count (probe_all is a test/gate mode, never production)
            rows = embeddings.count()
        rerank = max(rerank, rows + 1)

    cids = np.array([c for c, _ in cents], dtype=np.int32)
    M = np.array([vec for _, vec in cents], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    M = M / norms
    cid_pos = {int(c): i for i, c in enumerate(cids)}

    qrows = sorted(
        (int(r[0]), np.asarray([float(x) for x in r[1]]))
        for r in embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col).collect())
    dsub = dim // m
    # per (query, probed cell): ADC table (m, ks) from the query's
    # residual IN THAT CELL — |Q|·nprobe·m·ks floats, index metadata
    qids, qcells, qtables = [], [], []
    for qid, v in qrows:
        n = np.linalg.norm(v)
        u = v / n if n else v
        probe = np.argsort(-(M @ u), kind="stable")[:nprobe]
        tabs = {}
        for p in probe:
            qr = (u - M[p]).reshape(m, dsub)
            tabs[int(cids[p])] = np.stack(
                [((books[s] - qr[s][None, :]) ** 2).sum(axis=1)
                 for s in range(m)])
        qids.append(qid)
        qcells.append({int(cids[p]) for p in probe})
        qtables.append(tabs)

    def score_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["code"].values).astype(np.int64)
            cells = pdf["cell"].values.astype(np.int64)
            ids = pdf["vec_id"].values
            out_q, out_n = [], []
            for qi, qid in enumerate(qids):
                sel = np.array([c in qcells[qi] for c in cells])
                sel &= ~np.equal(ids, qid)
                idx = np.nonzero(sel)[0]
                if not len(idx):
                    continue
                d = np.empty(len(idx))
                for j, t in enumerate(idx):
                    tab = qtables[qi][int(cells[t])]
                    d[j] = tab[np.arange(m), C[t]].sum()
                top = idx[np.argsort(d, kind="stable")[:rerank]]
                out_q.extend([qid] * len(top))
                out_n.extend(int(ids[t]) for t in top)
            yield pd.DataFrame({"query_id": out_q,
                                "neighbor_id": out_n})

    cands = codes.mapInPandas(
        score_fn, schema="query_id long, neighbor_id long")
    qdf = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm_sq_unrolled(vec_col, dim).alias("qn"))
    cdf = embeddings.select(F.col(id_col).alias("neighbor_id"),
                            F.col(vec_col).alias("cv"),
                            norm_sq_unrolled(vec_col, dim).alias("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (cands.join(cdf, "neighbor_id")
            .join(F.broadcast(qdf), "query_id")
            .withColumn("cosine", dot_unrolled("qv", "cv", dim)
                        / F.sqrt(F.col("qn") * F.col("cn")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
