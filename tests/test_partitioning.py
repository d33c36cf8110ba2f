"""Physical data layout at scale: hive-partitioned writes must prune
partitions at read, and AQE must split skewed join partitions — the
two layout/runtime levers a 100 TB corpus lives or dies by."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from map_reduce_mongodb_spark.io import table
from tests.conftest import SF_DIR


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def lang_partitioned_docs(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docs_by_lang"))
    table(spark, "documents", SF_DIR).write.partitionBy("lang") \
        .mode("overwrite").parquet(d)
    return d


def test_partitioned_write_prunes_at_read(spark, lang_partitioned_docs):
    """Filtering on the partition column must become a PartitionFilter
    (directory pruning — zero IO for other languages), not a post-scan
    filter. This is the layout decision for any corpus queried mostly
    per-language/per-source."""
    df = (spark.read.parquet(lang_partitioned_docs)
               .where(F.col("lang") == "en")
               .select("doc_id", "n_chars"))
    p = _plan(df)
    assert "PartitionFilters" in p
    seg = p.split("PartitionFilters")[1][:200]
    assert "lang" in seg, seg
    # the data-filter section must NOT re-check lang — asserted for
    # real now (r9 test review: this was a comment-only invariant):
    # between "DataFilters" and the next bracket-delimited section,
    # lang must not appear (it was pruned at the directory level)
    if "DataFilters" in p:
        dseg = p.split("DataFilters")[1].split("]")[0]
        assert "lang" not in dseg, dseg
    en_rows = df.count()
    want = (table(spark, "documents", SF_DIR)
            .where(F.col("lang") == "en").count())
    assert en_rows == want


def test_write_sizing_controls_file_count(spark, tmp_path):
    """Output-file sizing — the compaction story: repartition picks the
    file count (the small-files fix for 100k-task jobs), and
    maxRecordsPerFile caps file size without a shuffle. Both are
    asserted on disk, not just in the plan."""
    import math
    import os

    li = table(spark, "lineitem", SF_DIR)
    out1 = str(tmp_path / "coalesced")
    li.repartition(4).write.mode("overwrite").parquet(out1)
    files1 = [f for f in os.listdir(out1) if f.endswith(".parquet")]
    assert len(files1) == 4

    out2 = str(tmp_path / "capped")
    li.repartition(1).write.option("maxRecordsPerFile", 1000) \
        .mode("overwrite").parquet(out2)
    files2 = [f for f in os.listdir(out2) if f.endswith(".parquet")]
    assert len(files2) == math.ceil(li.count() / 1000)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling: one hot key (90% of the fact side) must
    be detected at runtime and split across tasks instead of sinking
    one straggler. Thresholds are lowered on a cloned session so the
    KB-sized fixture triggers the cluster-scale code path."""
    sess = spark.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sess.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8KB")
    sess.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                  "1")
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.shuffle.partitions", "4")
    hot = sess.range(0, 40_000).select(
        (F.when(F.col("id") % 10 < 9, F.lit(7))
          .otherwise(F.col("id"))).alias("k"),
        F.col("id").alias("payload"))
    dim = sess.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    joined = hot.join(dim, "k")
    # collect() executes THIS DataFrame's own query execution — count()
    # or a write would spawn a separate one whose runtime re-plan
    # explain() can't show
    assert len(joined.collect()) == 40_000
    p = _plan(joined, mode="simple")
    assert "isFinalPlan=true" in p
    assert "skew=true" in p, p


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Additive schema evolution: files written before a column
    existed must read alongside newer files via mergeSchema, with
    the missing column as NULL — the contract that lets a 100 TB
    table grow columns without rewriting history."""
    import pyspark.sql.functions as F
    d = tmp_path / "evolving"
    v1 = spark.range(5).select(F.col("id"),
                               (F.col("id") * 2).alias("a"))
    v1.write.parquet(str(d / "epoch=1"))
    v2 = spark.range(5, 10).select(F.col("id"),
                                   (F.col("id") * 2).alias("a"),
                                   F.lit("new").alias("b"))
    v2.write.parquet(str(d / "epoch=2"))
    got = (spark.read.option("mergeSchema", "true")
           .option("recursiveFileLookup", "true").parquet(str(d)))
    assert set(got.columns) == {"id", "a", "b"}
    assert got.count() == 10
    assert got.where(F.col("b").isNull()).count() == 5
    # column pruning still reaches the scan on the merged schema
    assert got.select("a").where(F.col("a") > 10).count() == 4


def test_cap_group_fanout_bounds_and_determinism(spark):
    """cap_group_fanout: per-key survivors ≤ max_n, survivor choice is
    the deterministic order_col prefix, and an inverted-index
    self-join over the capped frame emits a SUBSET of the uncapped
    pairs with every hot key's contribution bounded at max_n² — the
    mega-customer / stopword-posting skew dial (off by default in
    every oracle-checked query)."""
    import pyspark.sql.functions as F
    from map_reduce_mongodb_spark.operators.skew import cap_group_fanout

    rows = ([("hot", i) for i in range(50)]
            + [("cold", 100 + i) for i in range(3)]
            + [("warm", 200 + i) for i in range(8)])
    df = spark.createDataFrame(rows, "k string, item int")
    capped = cap_group_fanout(df, "k", 5, F.col("item"))
    per_key = {r.k: r.n for r in
               capped.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert per_key == {"hot": 5, "cold": 3, "warm": 5}
    # deterministic survivor set: ascending order_col prefix
    hot_items = sorted(r.item for r in
                       capped.where(F.col("k") == "hot").collect())
    assert hot_items == [0, 1, 2, 3, 4]
    # run-to-run stability
    again = sorted((r.k, r.item) for r in
                   cap_group_fanout(df, "k", 5, F.col("item")).collect())
    assert again == sorted((r.k, r.item) for r in capped.collect())

    # list-of-columns order: duplicate primary order values are made
    # total by the tiebreak column, so the survivor set is pinned
    # (ADVICE r6: a non-unique single order_col would let row_number
    # pick survivors nondeterministically)
    dup = spark.createDataFrame(
        [("k", 1, i) for i in range(10)] + [("k", 0, 99)],
        "k string, prio int, uid int")
    survivors = sorted(
        (r.prio, r.uid) for r in
        cap_group_fanout(dup, "k", 3,
                         [F.col("prio"), F.col("uid")]).collect())
    assert survivors == [(0, 99), (1, 0), (1, 1)]

    def pairs(frame):
        a, b = frame.alias("a"), frame.alias("b")
        return {(r[0], r[1]) for r in
                (a.join(b, (F.col("a.k") == F.col("b.k"))
                        & (F.col("a.item") < F.col("b.item")))
                 .select(F.col("a.item"), F.col("b.item")).collect())}

    capped_pairs, full_pairs = pairs(capped), pairs(df)
    assert capped_pairs <= full_pairs
    # hot contributes max_n²-bounded C(5,2)=10 instead of C(50,2);
    # under-cap keys are untouched: cold C(3,2)=3, warm→5 C(5,2)=10
    assert len(capped_pairs) == 10 + 3 + 10
