"""Property tests (SURVEY.md §5.2 item 4):

1. ``falsy_coalesce`` matches JS ``||`` on a generated string corpus.
2. The A2/A3 merge aggregation is input-order-insensitive.
3. union-then-group ≡ full-outer-join-then-coalesce (the two
   formulations of the reference's merge, SURVEY A3).

Spark round-trips are expensive, so hypothesis drives a single
in-process reference model plus batched Spark checks over the whole
generated corpus at once.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_mongodb_spark.functions.scalar import falsy_coalesce

# --- 1. falsy_coalesce ≡ JS `||` for string operands -----------------

strings = st.one_of(
    st.none(),
    st.text(alphabet="ab \t'\"0é", max_size=5),
    st.sampled_from(["", "0", "undefined", "null", "false", " "]),
)


def js_or(value, default="undefined"):
    """JS `value || default` for string-typed value: falsy = null/''."""
    return default if (value is None or value == "") else value


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(strings, min_size=1, max_size=30))
def test_falsy_coalesce_matches_js(spark, corpus):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(corpus)],
                               "i int, v string")
    got = {r.i: r.out for r in df.select(
        "i", falsy_coalesce(F.col("v"), "undefined").alias("out")).collect()}
    want = {i: js_or(v) for i, v in enumerate(corpus)}
    assert got == want


# --- 1b. falsy_coalesce_num ≡ JS `||` for numeric operands -----------

numbers = st.one_of(
    st.none(),
    st.sampled_from([0.0, -0.0, float("nan"), 1.0, -1.0, 0.5]),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6),
)


def js_or_num(value, default=-999.0):
    """JS `value || default` for a number: falsy = null/0/NaN."""
    import math
    if value is None or value == 0 or (isinstance(value, float)
                                       and math.isnan(value)):
        return default
    return value


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(numbers, min_size=1, max_size=30))
def test_falsy_coalesce_num_matches_js(spark, corpus):
    """The numeric twin was defined but never executed anywhere
    (r9 review) — pin its NULL/0/NaN falsiness against the JS model
    the docstring claims, same harness as the string variant."""
    from map_reduce_mongodb_spark.functions.scalar import (
        falsy_coalesce_num)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(corpus)],
                               "i int, v double")
    got = {r.i: r.out for r in df.select(
        "i", falsy_coalesce_num(F.col("v"), -999.0).alias("out"))
        .collect()}
    want = {i: js_or_num(v) for i, v in enumerate(corpus)}
    assert got == want


# --- 2/3. merge-agg properties over generated (site, code, val) rows --

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # site
        st.sampled_from(["00065", "00060", "00010"]),   # code
        st.integers(min_value=0, max_value=100),        # measurement id
    ),
    min_size=1, max_size=40,
)


def _merge_model(rows):
    """Reference model of the A2/A3 merge: per site, min measurement id
    per code; sites with both codes kept."""
    per = {}
    for site, code, mid in rows:
        if code in ("00065", "00060"):
            key = (site, code)
            per[key] = min(per.get(key, mid), mid)
    out = {}
    for site in {s for s, _, _ in rows}:
        flow, gage = per.get((site, "00065")), per.get((site, "00060"))
        if flow is not None and gage is not None:
            out[site] = (flow, gage)
    return out


def _merge_spark(spark, rows):
    df = spark.createDataFrame(rows, "site int, code string, mid int")
    agg = (
        df.filter(F.col("code").isin("00065", "00060"))
        .groupBy("site")
        .agg(F.min_by("mid", F.when(F.col("code") == "00065", F.col("mid")))
             .alias("flow"),
             F.min_by("mid", F.when(F.col("code") == "00060", F.col("mid")))
             .alias("gage"))
        .filter(F.col("flow").isNotNull() & F.col("gage").isNotNull())
    )
    return {r.site: (r.flow, r.gage) for r in agg.collect()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows_strategy)
def test_merge_agg_matches_model_and_order_insensitive(spark, rows):
    want = _merge_model(rows)
    assert _merge_spark(spark, rows) == want
    assert _merge_spark(spark, list(reversed(rows))) == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows_strategy)
def test_union_group_equals_full_outer_join(spark, rows):
    """The two A3 formulations agree (SURVEY §5.2 property 4)."""
    df = spark.createDataFrame(rows, "site int, code string, mid int")
    flow = df.filter(F.col("code") == "00065").groupBy("site") \
        .agg(F.min("mid").alias("flow"))
    gage = df.filter(F.col("code") == "00060").groupBy("site") \
        .agg(F.min("mid").alias("gage"))
    joined = flow.join(gage, "site", "full_outer") \
        .filter(F.col("flow").isNotNull() & F.col("gage").isNotNull())
    got_join = {r.site: (r.flow, r.gage) for r in joined.collect()}
    assert got_join == _merge_spark(spark, rows)


def test_hilbert_transform_is_bijective_and_continuous(spark):
    """The unrolled xy→d Hilbert levels (queries._hilbert_level_sql)
    must (1) hit every d in [0, 65536) exactly once over the full
    256×256 grid and (2) map consecutive d to ADJACENT cells
    (|dx|+|dy| = 1) — the continuity property that distinguishes
    Hilbert from Morton. Runs the exact SQL the registered query
    uses, over a generated grid."""
    from pyspark.sql import functions as F

    from map_reduce_mongodb_spark.queries import _hilbert_level_sql

    grid = (spark.range(256 * 256)
            .selectExpr("CAST(id % 256 AS BIGINT) AS x0",
                        "CAST(id DIV 256 AS BIGINT) AS y0")
            .selectExpr("x0 AS x", "y0 AS y", "0 AS d", "x0", "y0"))
    for s in [128, 64, 32, 16, 8, 4, 2, 1]:
        d_e, x_e, y_e = _hilbert_level_sql(s)
        grid = grid.selectExpr(f"{x_e} AS x", f"{y_e} AS y",
                               f"{d_e} AS d", "x0", "y0")
    cur = grid.select("d", "x0", "y0")
    stats = cur.agg(F.countDistinct("d").alias("nd"),
                    F.min("d").alias("lo"),
                    F.max("d").alias("hi")).collect()[0]
    assert (stats.nd, stats.lo, stats.hi) == (65536, 0, 65535)
    nxt = cur.selectExpr("d - 1 AS d", "x0 AS x1", "y0 AS y1")
    steps = (cur.join(nxt, "d")
             .selectExpr("abs(x0 - x1) + abs(y0 - y1) AS step"))
    bad = steps.filter("step <> 1").count()
    assert bad == 0


def test_cdc_chunks_resynchronize_after_prefix_edit(spark):
    """The content-defined-chunking claim: inserting words at the
    FRONT of a document only perturbs the leading chunk(s) — the
    chunk-hash multiset of the edited doc still shares almost every
    hash with the original (fixed-width chunking would shift and
    break every chunk). Runs the registered query's plan over a
     2-doc corpus built from a real document."""
    from pyspark.sql import functions as F

    from map_reduce_mongodb_spark.io import table
    from map_reduce_mongodb_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    base = (table(spark, "documents", SF_DIR)
            .where(F.size(F.split(F.trim("text"), r"\s+")) > 60)
            .orderBy("doc_id").limit(1).collect()[0])
    text = base.text
    assert len(text.split()) > 60
    import tempfile

    import pandas as pd
    two = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": [text, "zz yy xx qq " + text],
        "lang": ["en", "en"], "source": ["t", "t"],
        "n_chars": [len(text), len(text) + 12]}))
    with tempfile.TemporaryDirectory() as tmp:
        two.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = QUERIES["cdc_chunks"](spark, tmp).collect()
    h0 = {r.chunk_hash for r in out if r.doc_id == 0}
    h1 = {r.chunk_hash for r in out if r.doc_id == 1}
    shared = h0 & h1
    # everything but the perturbed leading chunk(s) must re-align
    assert len(shared) >= len(h0) - 2, (len(shared), len(h0))
    assert any(r.shared_docs == 2 for r in out)


_iv_strategy = st.lists(
    st.tuples(st.sampled_from(["k1", "k2"]),
              st.integers(min_value=-40, max_value=40),
              st.integers(min_value=1, max_value=25)),
    min_size=1, max_size=18)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_iv_strategy)
def test_interval_overlap_pairs_matches_bruteforce(spark, ivs):
    """Grid-bucketed interval join ≡ brute-force O(n²) on random
    instances: same pair SET, same overlap lengths, each pair once —
    including negative starts and spans crossing many cells."""
    from map_reduce_mongodb_spark.operators.temporal import (
        interval_overlap_pairs)
    rows = [(k, i, s, s + d) for i, (k, s, d) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "k string, iid int, s long, e long")
    got = sorted((r.k, r.id_a, r.id_b, r.overlap)
                 for r in interval_overlap_pairs(
                     df, key="k", id_col="iid", start="s", end="e",
                     cell_width=7).collect())
    want = sorted(
        (ka, ia, ib, min(ea, eb) - max(sa, sb))
        for (ka, ia, sa, ea) in rows for (kb, ib, sb, eb) in rows
        if ka == kb and ia < ib and sa < eb and sb < ea)
    assert got == want


_gos_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(min_value=-500, max_value=500)),
    min_size=1, max_size=40)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_gos_strategy, st.integers(min_value=1, max_value=9))
def test_grouped_order_statistic_matches_python(spark, rows, dec):
    """Two-phase selection ≡ sorted()[k-1] for a random decile rank,
    negative values and duplicate-heavy groups included (values div 10
    piles duplicates into shared buckets)."""
    from map_reduce_mongodb_spark.operators.quantiles import (
        grouped_order_statistic)
    data = [(g, float(v) / 10.0) for g, v in rows]
    df = spark.createDataFrame(data, "g string, v double")
    rank = f"greatest(({dec} * n + {dec}) div 10, 1)"
    got = {r.g: (r.n, r.stat)
           for r in grouped_order_statistic(
               df, ["g"], "v", rank_sql=rank).collect()}
    for g in {g for g, _ in data}:
        vals = sorted(v for gg, v in data if gg == g)
        k = (dec * len(vals) + dec) // 10
        k = max(k, 1)
        assert got[g] == (len(vals), vals[k - 1]), (g, k)


def test_epoch_us_ntz_is_session_timezone_free(spark):
    """epoch_us_ntz on TIMESTAMP_NTZ must return NAIVE epoch micros —
    DuckDB's epoch_us() — in ANY session timezone, including across a
    DST transition. The retired idiom unix_micros(cast AS TIMESTAMP)
    consulted session.timeZone on the NTZ→LTZ cast: under
    America/New_York the 01:30→03:30 wall-clock gap over the
    2024-03-10 spring-forward is 1 REAL hour, shifting the computed
    gap by −3600s vs the oracle's naive arithmetic (ADVICE r7)."""
    from map_reduce_mongodb_spark.functions.scalar import epoch_us_ntz

    sess = spark.newSession()
    sess.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = sess.createDataFrame(
        [("2024-03-10 01:30:00",), ("2024-03-10 03:30:00",)], "s string"
    ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
    lo, hi = sorted(
        r.us for r in df.select(epoch_us_ntz(F.col("ts")).alias("us"))
        .collect())
    assert hi - lo == 2 * 3_600_000_000  # naive gap, not elapsed UTC
    # and the absolute values are the naive epoch (UTC-rendered wall)
    assert lo == 1710034200000000  # 2024-03-10T01:30:00Z as naive µs


def test_date_to_ntz_cast_survives_midnight_dst_gap(spark):
    """DATE→TIMESTAMP_NTZ must yield the naive local midnight in ANY
    session timezone — including on a calendar day whose local
    midnight does not exist. Brazil's 1995-10-15 spring-forward
    happened AT 00:00 (clocks jumped straight to 01:00), so the
    retired DATE→LTZ idiom rendered that day as 01:00 under
    America/Sao_Paulo: the inflight_sweepline wrong answer the r8 TZ
    sweep caught. Pins the fixed idiom AND documents the broken one
    (if Spark ever changes the LTZ gap policy this updates too)."""
    sess = spark.newSession()
    sess.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    df = sess.createDataFrame([("1995-10-15",), ("1995-10-16",)],
                              "s string") \
        .select(F.col("s").cast("date").alias("d"))
    ntz = {str(r.t) for r in
           df.select(F.col("d").cast("timestamp_ntz").alias("t"))
           .collect()}
    assert ntz == {"1995-10-15 00:00:00", "1995-10-16 00:00:00"}
    # why LTZ casts are banned: the two consecutive midnights are 23
    # REAL hours apart (Oct 15's nonexistent midnight shifts +1h), so
    # the day boundary moves — NTZ keeps them exactly 24h apart
    lo, hi = sorted(
        r.t for r in
        df.select(F.unix_seconds(F.col("d").cast("timestamp"))
                  .alias("t")).collect())
    assert hi - lo == 23 * 3600
