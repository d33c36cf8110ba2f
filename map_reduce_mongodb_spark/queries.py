"""Query catalog: every operator from SURVEY.md §2 (and the north-star
extensions) as a named (PySpark query, DuckDB oracle SQL) pair.

Contract (``__spark_entry__.py``): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame whose column NAMES match the
oracle's aliases exactly (the driver sorts columns by name before
hashing). Conventions used throughout to make the hash comparison
robust:

- every computed/aggregate column is aliased identically on both sides;
- double-typed aggregates are ``ROUND(x, 2)`` (sums/avgs of different
  accumulation orders agree after rounding; per-row arithmetic is
  bit-identical between engines so it stays unrounded);
- every top-k/limit query carries a deterministic total order (unique
  tiebreak column) so the selected SET is engine-independent;
- nondeterministic "first" aggregates are replaced by ``min_by`` /
  ``arg_min`` on an explicit key.

Section markers (S/P/F/M/A/...) refer to SURVEY.md §2's operator
inventory; reference citations are ``file:line`` into /root/reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_mongodb_spark.io import table
from map_reduce_mongodb_spark.pipeline.usgs import usgs_flat_join

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


# =====================================================================
# Flagship — the reference pipeline end-to-end (S2,P1-P8,F1-F3,M2,A2,A3)
# =====================================================================

@query("usgs_site_join", oracle="""
WITH src AS (
  SELECT event_id,
         'S' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS site,
         CAST(user_id % 360 - 180 AS DOUBLE) + 0.5 AS lon,
         CAST(user_id % 180 - 90 AS DOUBLE) + 0.25 AS lat,
         CASE (CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END) % 3
           WHEN 0 THEN '00065' WHEN 1 THEN '00060' ELSE '00010' END AS code,
         CASE WHEN event_id % 13 = 0 THEN 'undefined'
              ELSE CAST(value AS VARCHAR) END AS mval,
         strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS mts
  FROM events
  WHERE event_id % 17 <> 0
)
SELECT * FROM (
  SELECT site,
         min(lon) AS lon,
         min(lat) AS lat,
         arg_min(mval, event_id) FILTER (WHERE code = '00065') AS flow_value,
         arg_min(mts,  event_id) FILTER (WHERE code = '00065') AS flow_ts,
         arg_min(mval, event_id) FILTER (WHERE code = '00060') AS gage_value,
         arg_min(mts,  event_id) FILTER (WHERE code = '00060') AS gage_ts
  FROM src
  WHERE code IN ('00065', '00060')
  GROUP BY site
)
WHERE flow_value IS NOT NULL AND gage_value IS NOT NULL
""")
def q_usgs_site_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference pipeline (SURVEY.md §3.1) with a FLAT output
    so the oracle hash-compares: per-site lon/lat + the streamFlow and
    gageHeight measurements of sites having both (N5 inner semantics)."""
    return usgs_flat_join(table(spark, "events", sf_dir))


# =====================================================================
# Scan + projection + filter (S5, P2-P8, F1-F3 analogues)
# =====================================================================

@query("filter_project", oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS flag_desc
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
""")
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection + scalar expressions (P4-P7 analogue;
    pushdown-friendly: filters reach the parquet scan)."""
    li = table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey", "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.col("l_quantity").cast("int").alias("qty_int"),
            F.when(F.col("l_returnflag") == "R", "returned")
            .otherwise("kept").alias("flag_desc"),
        )
    )


@query("q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical hash-aggregate (A2's aggregation
    layer). Partial (map-side) aggregation makes the shuffle carry only
    |groups| rows per partition."""
    li = table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =====================================================================
# Joins (A3 generalized + ABSENT-in-reference fill-ins, SURVEY §2.9)
# =====================================================================

@query("join_customer_orders", oracle="""
SELECT c_mktsegment,
       count(*) AS order_cnt,
       round(sum(o_totalprice), 2) AS total_price,
       count(DISTINCT o_custkey) AS active_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def q_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join fact→dim. The dim side is broadcast (customer is tiny
    relative to orders at every sf) → no shuffle of the fact table."""
    orders = table(spark, "orders", sf_dir)
    customer = table(spark, "customer", sf_dir)
    return (
        orders.join(F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.countDistinct("o_custkey").alias("active_customers"),
        )
    )


@query("join_full_outer_coalesce", oracle="""
SELECT coalesce(o.o_custkey, f.o_custkey) AS custkey,
       coalesce(o.open_cnt, 0) AS open_cnt,
       coalesce(f.done_cnt, 0) AS done_cnt,
       round(coalesce(o.open_total, 0) + coalesce(f.done_total, 0), 2) AS grand_total
FROM (SELECT o_custkey, count(*) AS open_cnt,
             round(sum(o_totalprice), 2) AS open_total
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
FULL OUTER JOIN
     (SELECT o_custkey, count(*) AS done_cnt,
             round(sum(o_totalprice), 2) AS done_total
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
ON o.o_custkey = f.o_custkey
""")
def q_join_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 expressed the join way: two filtered branches full-outer-joined
    on the re-key column with per-field coalesce — the equivalent
    formulation of the reference's ``out:{reduce:'joined'}`` merge
    (mongodb.js:94-115). SURVEY §5 property: equals union-then-group."""
    orders = table(spark, "orders", sf_dir)
    opens = (
        orders.filter(F.col("o_orderstatus") == "O").groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("open_cnt"),
             F.round(F.sum("o_totalprice"), 2).alias("open_total"))
    )
    done = (
        orders.filter(F.col("o_orderstatus") == "F").groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("done_cnt"),
             F.round(F.sum("o_totalprice"), 2).alias("done_total"))
    )
    return (
        opens.join(done, "o_custkey", "full_outer")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.coalesce("open_cnt", F.lit(0)).alias("open_cnt"),
            F.coalesce("done_cnt", F.lit(0)).alias("done_cnt"),
            F.round(F.coalesce("open_total", F.lit(0.0))
                    + F.coalesce("done_total", F.lit(0.0)), 2).alias("grand_total"),
        )
    )


@query("semi_join", oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""")
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    customer = table(spark, "customer", sf_dir)
    big = table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query("anti_join", oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    customer = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query("multiway_join", oracle="""
SELECT n_name AS nation,
       count(*) AS li_cnt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY n_name
""")
def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-ish multiway star join: fact ⋈ three broadcast dims.
    All dims broadcast → zero shuffles before the final aggregation."""
    li = table(spark, "lineitem", sf_dir)
    supplier = table(spark, "supplier", sf_dir)
    nation = table(spark, "nation", sf_dir)
    region = table(spark, "region", sf_dir).filter(
        F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation),
              supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("li_cnt"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
    )


# =====================================================================
# Aggregation variants (A2, A4, M2 analogues)
# =====================================================================

@query("agg_conditional_pivot", oracle="""
SELECT o_custkey,
       round(max(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS open_max,
       round(max(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS done_max,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS open_cnt,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS done_cnt,
       arg_min(o_orderpriority, o_orderkey) AS first_priority
FROM orders
GROUP BY o_custkey
""")
def q_agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2's manual pivot (mapreduce.js:78-95) generalized: conditional
    aggregates re-keyed by customer, plus deterministic arg_min in place
    of the reference's order-dependent last-writer-wins."""
    orders = table(spark, "orders", sf_dir)
    is_open = F.col("o_orderstatus") == "O"
    is_done = F.col("o_orderstatus") == "F"
    return orders.groupBy("o_custkey").agg(
        F.round(F.max(F.when(is_open, F.col("o_totalprice"))), 2).alias("open_max"),
        F.round(F.max(F.when(is_done, F.col("o_totalprice"))), 2).alias("done_max"),
        F.count(F.when(is_open, F.lit(1))).alias("open_cnt"),
        F.count(F.when(is_done, F.lit(1))).alias("done_cnt"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
    )


@query("union_groupby", oracle="""
SELECT o_custkey, count(*) AS n, round(sum(amount), 2) AS total
FROM (
  SELECT o_custkey, o_totalprice AS amount FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_custkey, o_totalprice * 2 AS amount
  FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY o_custkey
""")
def q_union_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The idiomatic-Spark A3: union the filtered branches, one
    groupBy — exactly how the flagship merges its two mapReduce jobs."""
    orders = table(spark, "orders", sf_dir)
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", F.col("o_totalprice").alias("amount"))
    # `* 2`, not `* 0.5`: keeps amounts at cent precision, so the final
    # round(sum, 2) never sits on a half-cent boundary — Spark and
    # DuckDB round exact .xx5 doubles differently (HALF_UP on the
    # shortest decimal repr vs on the binary value).
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", (F.col("o_totalprice") * 2).alias("amount"))
    return a.unionByName(b).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("amount"), 2).alias("total"),
    )


@query("collect_per_group", oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders
GROUP BY o_orderpriority
""")
def q_collect_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analogue (collect-into-document, mongodb.js:125-143) kept
    distributed: collect_set per group, sorted for determinism, joined
    to a string so the cross-engine hash is stable."""
    orders = table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus")))
        .alias("statuses"),
    )


@query("rollup_agg", oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""")
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (grouping-sets family — ABSENT in
    the reference, SURVEY §2.9)."""
    orders = table(spark, "orders", sf_dir)
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# =====================================================================
# Distinct / set ops / sort / top-k (ABSENT in reference, SURVEY §2.9)
# =====================================================================

@query("distinct_parts", oracle="""
SELECT DISTINCT p_brand, p_type FROM part
""")
def q_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, "part", sf_dir).select("p_brand", "p_type").distinct()


@query("set_intersect", oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query("set_except", oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
""")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, "customer", sf_dir)
    opens = table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return customer.select("c_custkey").exceptAll(opens).distinct()


@query("topk_orders", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort at scale. Unique
    orderkey tiebreak makes the selected set deterministic."""
    orders = table(spark, "orders", sf_dir)
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query("window_topk_per_group", oracle="""
SELECT * FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
""")
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window — the scale-correct idiom
    (shuffle by group key once; no global sort)."""
    orders = table(spark, "orders", sf_dir)
    customer = table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query("window_running_sum", oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""")
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (ABSENT in reference). Deterministic
    frame: unique (o_orderdate, o_orderkey) ordering."""
    orders = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


# =====================================================================
# Scalar function library (ABSENT in reference, SURVEY §2.9)
# =====================================================================

@query("scalar_functions", oracle="""
SELECT event_id,
       upper(event_type) AS type_upper,
       substr(event_type, 1, 3) AS type_pfx,
       length(props) AS props_len,
       CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS m,
       CAST(dayofmonth(ts) AS INTEGER) AS d,
       CAST(hour(ts) AS INTEGER) AS h,
       date_trunc('day', ts) AS day_ts,
       round(abs(value - 500.0), 2) AS dist_from_500,
       round(sqrt(abs(value)), 4) AS sqrt_val,
       concat(event_type, '#', CAST(event_id % 10 AS VARCHAR)) AS tag
FROM events
WHERE event_type <> 'view'
""")
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar library sweep — every expression stays
    JVM-side in whole-stage codegen (no UDFs)."""
    ev = table(spark, "events", sf_dir)
    return ev.filter(F.col("event_type") != "view").select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_pfx"),
        F.length("props").alias("props_len"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.round(F.abs(F.col("value") - 500.0), 2).alias("dist_from_500"),
        F.round(F.sqrt(F.abs(F.col("value"))), 4).alias("sqrt_val"),
        F.concat(F.col("event_type"), F.lit("#"),
                 (F.col("event_id") % 10).cast("string")).alias("tag"),
    )


@query("json_extract", oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
""")
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: the reference's schemaless documents map
    to JSON string columns parsed on demand (SURVEY §1.1)."""
    ev = table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", k.alias("k_val"))
        .filter(F.col("k_val") > 50)
    )


# =====================================================================
# Time windows over events (streaming analogue, batch-testable)
# =====================================================================

@query("events_tumbling_window", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""")
def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — identical code runs
    under Structured Streaming with a watermark (streaming module)."""
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )
