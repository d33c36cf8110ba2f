"""Exact-integer PCA: distributed Gram/covariance sufficient
statistics + a deterministic quantized power iteration.

The embedding-pipeline op behind whitening, dimensionality checks and
anisotropy diagnostics ("is this embedding space collapsing to one
direction?"). Floating-point PCA is engine-divergent (sum order), so
everything here is EXACT INTEGER arithmetic, bit-reproducible against
a SQL oracle:

1. Quantize components: ``xq = floor(x · 2^10 + 0.5)`` — float·2^k and
   +0.5 are exact IEEE ops, floor is exact, so both engines produce
   the SAME integers.
2. Centering without fractions: work on ``y = n·xq − S`` (S = per-dim
   integer sum), i.e. n·2^10-scaled deviations — still integers.
3. Scatter matrix ``C = Σ_r y_r y_rᵀ``: one mapInPandas pass emits
   per-partition ``yᵀy`` partials (d² int64 rows per partition — numpy
   int64 matmul is exact within its range); Spark sums them. The d×d
   result is index-METADATA-sized (like IVF centroids) and may be
   collected.
4. Power iteration on the integer matrix: reduce C by the integer
   divisor ``D = max|C| div 2^20 + 1`` (keeps every later product in
   int64 range), then iterate ``w = C·v; v = w div (max|w| div 2^10 +
   1)`` — all divisions are sign·(abs div d), identical in Spark,
   Python, and DuckDB (``div``/``//`` disagree on NEGATIVE operands
   between dialects — magnitude division sidesteps it).

The iterate after k steps is a deterministic function of the input
bits — convergence is NOT required for correctness (both engines run
the same k steps); the docstring of the consuming query reports it as
the k-step power iterate.

Overflow budget (int64, scale 2^10): the DISTRIBUTED accumulation is
the raw second moment ``M = Σ xq xqᵀ`` — |entries| ≤ n·max|xq|², safe
through n ≈ 4.6e18 / max|xq|² (≈ 1.7e11 rows at |x| ≤ 5). The scatter
matrix of n-scaled deviations is then assembled DRIVER-SIDE in
unbounded Python ints: ``C = n²·M − n·S·Sᵀ`` (algebraically identical
to Σ (n·xq − S)(n·xq − S)ᵀ, which is what the oracle computes —
DuckDB's sum over BIGINT promotes to HUGEINT so the oracle never had
the int64 constraint). The r10 version accumulated the deviations
THEMSELVES distributed (per-partition yᵀy with y = n·xq − S), whose
O(4n³·max|xq|²) bound hit the guard at n ≈ 2·10⁴ — found by the r11
sf≈1 scale probe, where the embeddings table is 10× sf0.1 and the
whole PCA lane refused. The guard below still exists (for M now) but
sits ~10⁷× further out; ``scale_bits`` remains the resolution-vs-
headroom dial past that.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _idiv(x: int, d: int) -> int:
    """sign(x) · (|x| div d) — the dialect-safe integer division."""
    return -((-x) // d) if x < 0 else x // d


def gram_matrix_int(embeddings: DataFrame, vec_col: str = "embedding",
                    scale_bits: int = 10
                    ) -> tuple[int, list[int], list[list[int]]]:
    """(n, S, C): row count, per-dim quantized integer sums, and the
    d×d integer scatter matrix of n·2^scale_bits-scaled deviations."""
    scale = 1 << scale_bits
    dim = embeddings.select(F.size(vec_col)).first()[0]
    xq = F.floor(F.col("x").cast("double") * scale + F.lit(0.5)) \
        .cast("long")
    sums = (embeddings.select(F.posexplode(vec_col).alias("i", "x"))
            .groupBy("i").agg(F.sum(xq).alias("s"),
                              F.max(F.abs(xq)).alias("mx")).collect())
    s_arr = np.zeros(dim, dtype=np.int64)
    mx = 1
    for r in sums:
        s_arr[int(r["i"])] = int(r["s"])
        mx = max(mx, int(r["mx"]))
    n = int(embeddings.count())
    if not n * mx * mx < 2 ** 62:
        # ValueError, not assert: python -O strips asserts and a
        # wrapped int64 Gram matrix is a silently wrong answer.
        # Bound is the raw second moment's (n·max|xq|²): the scatter
        # matrix itself is assembled below in unbounded Python ints.
        raise ValueError(
            f"int64 second-moment overflow risk at n={n}, "
            f"max|xq|={mx}: lower scale_bits")

    def partials(it):
        import pandas as pd
        for pdf in it:
            if not len(pdf):
                continue
            A = np.stack(pdf[vec_col].values).astype(np.float64)
            q = np.floor(A * scale + 0.5).astype(np.int64)
            G = q.T @ q
            i_idx, j_idx = np.meshgrid(np.arange(1, dim + 1),
                                       np.arange(1, dim + 1),
                                       indexing="ij")
            yield pd.DataFrame({"i": i_idx.ravel().astype(np.int32),
                                "j": j_idx.ravel().astype(np.int32),
                                "c": G.ravel()})

    rows = (embeddings.select(vec_col)
            .mapInPandas(partials, schema="i int, j int, c long")
            .groupBy("i", "j").agg(F.sum("c").alias("c")).collect())
    M = [[0] * dim for _ in range(dim)]
    for r in rows:
        M[int(r["i"]) - 1][int(r["j"]) - 1] = int(r["c"])
    # C = Σ (n·xq − S)(n·xq − S)ᵀ = n²·M − n·S·Sᵀ — exact unbounded
    # Python ints (can exceed int64 past n ≈ 2·10⁴; everything
    # downstream reduces by D before touching fixed-width arithmetic,
    # and the oracle's HUGEINT sums agree bit-for-bit).
    S_int = [int(v) for v in s_arr]
    C = [[n * n * M[i][j] - n * S_int[i] * S_int[j]
          for j in range(dim)] for i in range(dim)]
    return n, S_int, C


def power_iteration_int(C: list[list[int]], iters: int = 8,
                        red_bits: int = 18, cap_bits: int = 10
                        ) -> tuple[list[int], int, list[list[int]]]:
    """k-step integer power iteration on the reduced matrix
    ``cr = C div D``; returns (v, D, cr). Pure Python ints — exact,
    unbounded, and a line-for-line mirror of the oracle's unrolled
    CTEs. red_bits=18 keeps the Rayleigh numerator vᵀ·cr·v under 2^53
    (|v| ≤ 2^11, |cr| ≤ 2^18, d² = 4096 terms) so its DOUBLE cast is
    exact in every engine."""
    dim = len(C)
    max_c = max((abs(c) for row in C for c in row), default=0)
    D = max_c // (1 << red_bits) + 1
    cr = [[_idiv(c, D) for c in row] for row in C]
    v = [1] * dim
    for _ in range(iters):
        w = [sum(cr[i][j] * v[j] for j in range(dim))
             for i in range(dim)]
        m = max(abs(x) for x in w) // (1 << cap_bits) + 1
        v = [_idiv(x, m) for x in w]
    return v, D, cr


def power_iteration_deflated(cr: list[list[int]], v1: list[int],
                             iters: int = 8, cap_bits: int = 10
                             ) -> list[int]:
    """Second-component iterate: power iteration on ``cr`` with an
    EXACT integer orthogonalization against the PC1 iterate each
    step — ``o = t·(v1·v1) − (t·v1)·v1`` satisfies o·v1 = 0 with no
    fractions (classic deflation C − λvvᵀ would need rational λ).
    The subsequent magnitude cap (sign·(abs div m)) re-introduces a
    bounded, DETERMINISTIC truncation — identical in both engines,
    and re-orthogonalized away on the next step. Start vector
    alternates ±1 (fixed, never parallel to a data-derived v1).
    Intermediates exceed int64 (t·qq ~ 2^73) — pure Python ints here,
    HUGEINT casts in the oracle."""
    dim = len(cr)
    qq = sum(x * x for x in v1)
    u = [1 if i % 2 == 0 else -1 for i in range(dim)]
    for _ in range(iters):
        t = [sum(cr[i][j] * u[j] for j in range(dim))
             for i in range(dim)]
        d = sum(t[i] * v1[i] for i in range(dim))
        o = [t[i] * qq - d * v1[i] for i in range(dim)]
        m = max(abs(x) for x in o) // (1 << cap_bits) + 1
        u = [_idiv(x, m) for x in o]
    return u
