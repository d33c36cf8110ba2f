"""Grid-bucketed spatial self-join — radius search without all pairs.

`usgs_nearest_sites` ranks candidates from a broadcast pair join
(correct while the site dimension is small); THIS module is the
documented scale path made real: bucket the plane into cells of side
``radius``, so any pair within ``radius`` must lie in the same or an
adjacent cell (|Δcoord| ≤ r ⇒ cell indices differ by ≤ 1). The join
then touches only cell-cohabitants — the spatial analogue of LSH
banding: candidates come from a container equality join, and an exact
per-row distance check verifies.

Pair-once accounting: the PROBE side explodes each point to its 3×3
cell neighbourhood; the BUILD side stays in its single home cell.
Every qualifying pair (a, b) is found exactly once — b's home cell is
unique, and a's neighbourhood covers it iff they are within one cell.

Scale notes: the shuffle keys are cell ids (cardinality ~area/r²;
pick r to keep cells at container granularity — the same dial as LSH
band width). Probe-side explosion is a fixed ×9 row factor, narrow.
Skewed cells (a city of points in one cell) are AQE skew-join
territory, or pre-split hot cells exactly like the LSH
``max_bucket_size`` cap. Planar/equirectangular coordinates by
design — every op is IEEE-exact (+, ×, floor, compare), so results
hash-check across engines; swap the verify expression for haversine
when geodesic distance matters (same plan shape, trig is
engine-divergent so such a query is Spark-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_pairs(points: DataFrame, id_col: str, x_col: str,
                 y_col: str, radius: float) -> DataFrame:
    """All unordered pairs of ``points`` within planar distance
    ``radius``: (id_a, id_b, dist2) with ``id_a < id_b`` and
    ``dist2 = (xa-xb)² + (ya-yb)² ≤ radius²``.
    """
    cx = F.floor(F.col(x_col) / F.lit(radius))
    cy = F.floor(F.col(y_col) / F.lit(radius))
    home = points.select(F.col(id_col), F.col(x_col), F.col(y_col),
                         cx.alias("cx"), cy.alias("cy"))
    neigh = F.explode(F.array(*[
        F.struct((F.col("cx") + dx).alias("cx"),
                 (F.col("cy") + dy).alias("cy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("cell")
    probe = (home.select(F.col(id_col).alias("id_a"),
                         F.col(x_col).alias("xa"),
                         F.col(y_col).alias("ya"), neigh)
             .select("id_a", "xa", "ya",
                     F.col("cell.cx").alias("cx"),
                     F.col("cell.cy").alias("cy")))
    build = home.select(F.col(id_col).alias("id_b"),
                        F.col(x_col).alias("xb"),
                        F.col(y_col).alias("yb"), "cx", "cy")
    dist2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
             + (F.col("ya") - F.col("yb"))
             * (F.col("ya") - F.col("yb")))
    return (probe.join(build, ["cx", "cy"])
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("dist2", dist2)
            .where(F.col("dist2") <= F.lit(radius) * F.lit(radius))
            .select("id_a", "id_b", "dist2"))
