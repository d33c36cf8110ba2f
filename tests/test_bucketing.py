"""Bucketing: pre-partitioned co-located joins — the zero-shuffle join
strategy for repeated large-table joins at scale (SURVEY §4.2 notes).

Both sides written with ``bucketBy(8, key)``; the join then requires no
Exchange on either side (only sorts), which at 100 TB removes the
dominant cost of a repeated fact-fact join."""

from __future__ import annotations

import contextlib
import io

import pytest

from map_reduce_mongodb_spark.io import table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # a fresh metastore can coexist with a stale warehouse dir from a
    # previous session — clear the locations too
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"/tmp/spark-warehouse/{t}", ignore_errors=True)
    table(spark, "orders", SF_DIR).write.bucketBy(8, "o_orderkey") \
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    table(spark, "lineitem", SF_DIR).write.bucketBy(8, "l_orderkey") \
        .sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")
    yield "orders_b", "lineitem_b"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        o, li = table(spark, "orders", SF_DIR), table(spark, "lineitem", SF_DIR)
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
