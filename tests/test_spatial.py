"""radius_pairs: equality to brute force on adversarial point sets
(cell boundaries, negative coords, exact-radius distances, co-located
points)."""

from __future__ import annotations

from itertools import combinations

from map_reduce_mongodb_spark.operators.spatial import radius_pairs


def _brute(points, r):
    out = set()
    for (ia, xa, ya), (ib, xb, yb) in combinations(sorted(points), 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= r * r:
            out.add((ia, ib, d2))
    return out


def _check(spark, points, r):
    df = spark.createDataFrame(points, "id long, x double, y double")
    got = {(p.id_a, p.id_b, p.dist2)
           for p in radius_pairs(df, "id", "x", "y", r).collect()}
    assert got == _brute(points, r)


def test_radius_pairs_boundary_and_negative_cells(spark):
    r = 2.0
    pts = [
        (1, 0.0, 0.0), (2, 2.0, 0.0),     # dist == r exactly (kept)
        (3, -0.1, 0.0),                    # adjacent negative cell
        (4, -4.0, -4.0), (5, -4.0, -2.1),  # negative-cell neighbours
        (6, 10.0, 10.0),                   # isolated
        (7, 0.0, 0.0),                     # co-located with 1
        (8, 1.9999, 1.9999),               # corner: just outside r
        (9, 3.99, 0.0),                    # 2 cells from 1, near 2
    ]
    _check(spark, pts, r)


def test_radius_pairs_random_sweep(spark):
    import random
    rng = random.Random(11)
    for trial in range(3):
        pts = [(i, round(rng.uniform(-10, 10), 3),
                round(rng.uniform(-10, 10), 3)) for i in range(60)]
        _check(spark, pts, 3.0)
