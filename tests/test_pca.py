"""Exact-integer PCA operator: Gram matrix vs brute-force Python ints,
power-iterate direction vs numpy eigendecomposition."""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_mongodb_spark.operators.pca import (
    gram_matrix_int, power_iteration_int)


def _vecs():
    # Deterministic anisotropic cloud: dominant direction (3, 1, 0, 0)
    rows, x = [], 11
    for i in range(120):
        x = (x * 48271) % (2 ** 31 - 1)
        t = (x % 2001 - 1000) / 1000.0
        x = (x * 48271) % (2 ** 31 - 1)
        noise = (x % 201 - 100) / 1000.0
        rows.append((i, [3.0 * t + noise, 1.0 * t - noise,
                         noise * 0.5, 0.25]))
    return rows


def test_gram_matches_bruteforce_python_ints(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n, S, C = gram_matrix_int(df)
    assert n == len(rows)
    # Brute force in unbounded Python ints over float32-rounded inputs.
    arr = np.array([r[1] for r in rows], dtype=np.float32).astype(float)
    q = [[int(np.floor(v * 1024 + 0.5)) for v in row] for row in arr]
    S_ref = [sum(q[r][i] for r in range(n)) for i in range(4)]
    assert S == S_ref
    y = [[n * q[r][i] - S_ref[i] for i in range(4)] for r in range(n)]
    C_ref = [[sum(y[r][i] * y[r][j] for r in range(n))
              for j in range(4)] for i in range(4)]
    assert C == C_ref


def test_power_iterate_aligns_with_numpy_pc1(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n, S, C = gram_matrix_int(df)
    v, D, cr = power_iteration_int(C)
    vn = np.array(v, dtype=float)
    vn /= np.linalg.norm(vn)
    w, V = np.linalg.eigh(np.array(C, dtype=float))
    pc1 = V[:, -1]
    # 8 steps on a well-separated spectrum: alignment should be tight.
    assert abs(float(np.dot(vn, pc1))) > 0.999


def test_gram_overflow_guard(spark):
    big = spark.createDataFrame(
        [(i, [1e6, 1e6]) for i in range(4000)],
        "vec_id long, embedding array<float>")
    # ValueError, not AssertionError: the guard must survive
    # python -O (asserts are stripped; a wrapped Gram matrix is a
    # silently wrong answer)
    with pytest.raises(ValueError, match="overflow"):
        gram_matrix_int(big)


def test_deflated_iterate_orthogonal_and_aligned(spark):
    from map_reduce_mongodb_spark.operators.pca import (
        power_iteration_deflated)
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n, S, C = gram_matrix_int(df)
    v, D, cr = power_iteration_int(C)
    u = power_iteration_deflated(cr, v)
    vn = np.array(v, float); vn /= np.linalg.norm(vn)
    un = np.array(u, float); un /= np.linalg.norm(un)
    # near-orthogonal to PC1 (exact orthogonalization, then one
    # deterministic integer truncation)
    assert abs(float(np.dot(un, vn))) < 1e-3
    w, V = np.linalg.eigh(np.array(C, dtype=float))
    pc2 = V[:, -2]
    assert abs(float(np.dot(un, pc2))) > 0.99
