"""scd2_apply invariants: exactly one open row per key, versions
increment, history is append-only (row count = dim + |updates|)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.operators.scd import scd2_apply


def _dim(spark):
    rows = [(k, f"seg{k % 3}", "1992-01-01", None, 1) for k in range(20)]
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from string, valid_to string, "
              "version int") \
        .select("k", "seg",
                F.col("valid_from").cast("timestamp").alias("valid_from"),
                F.col("valid_to").cast("timestamp").alias("valid_to"),
                "version")


def test_scd2_apply_invariants(spark):
    dim = _dim(spark)
    upd = spark.createDataFrame(
        [(k, "NEW", "1998-06-01") for k in range(0, 20, 4)],
        "k long, seg string, effective_ts string") \
        .select("k", "seg",
                F.col("effective_ts").cast("timestamp")
                .alias("effective_ts"))
    out = scd2_apply(dim, upd, "k", ["seg"]).cache()

    assert out.count() == 20 + 5  # append-only
    open_rows = out.where(F.col("valid_to").isNull())
    assert open_rows.count() == 20  # one open row per key
    assert open_rows.groupBy("k").count().where("count > 1").count() == 0
    v2 = out.where("version = 2")
    assert {r.k for r in v2.collect()} == set(range(0, 20, 4))
    assert v2.where("seg <> 'NEW'").count() == 0
    closed = out.where("valid_to IS NOT NULL")
    assert {r.k for r in closed.collect()} == set(range(0, 20, 4))
    assert closed.where("version <> 1").count() == 0


def test_scd2_apply_second_batch_composes(spark):
    """Applying a second batch closes the version-2 rows, not history."""
    dim = _dim(spark)
    mk = lambda eff, seg, keys: spark.createDataFrame(  # noqa: E731
        [(k, seg, eff) for k in keys],
        "k long, seg string, effective_ts string") \
        .select("k", "seg", F.col("effective_ts").cast("timestamp")
                .alias("effective_ts"))
    once = scd2_apply(dim, mk("1998-06-01", "NEW", [4]), "k", ["seg"])
    twice = scd2_apply(once, mk("1999-01-01", "NEWER", [4]), "k",
                       ["seg"])
    hist = sorted((r.version, r.seg,
                   r.valid_to is None)
                  for r in twice.where("k = 4").collect())
    assert hist == [(1, "seg1", False), (2, "NEW", False),
                    (3, "NEWER", True)]
