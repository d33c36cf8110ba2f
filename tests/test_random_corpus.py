"""Randomized-DATA oracle parity (the r9 axis-class addition).

Every other oracle test runs on the fixed driver fixtures; this one
generates a schema-identical corpus with a DIFFERENT seed and
deliberate in-domain edge injections (tools/gen_random_corpus.py:
exact ties, band-boundary values, empty/whitespace-only/single-token
docs, duplicate + near-duplicate embeddings, multi-month events at
the 64-day bitmap edge, a skew user) and re-checks a targeted query
subset against DuckDB on it — the queries whose r9 randomized-data
findings were each "one data change away" from a red driver row:

- the five fixed divergences (day-63 sign-bit shift, zero-token
  divide, two -0.0 renders, SCD2 first-epoch close-out);
- the tie-determinism lane (asof tiebreak, funnel anchors, top-k
  over duplicate embeddings);
- boundary/edge consumers (l-diversity bands at exactly 0/5000,
  wordcount over empty docs, Theil–Sen at the 1992-01-01 epoch).

Full-registry randomized sweeps stay in tools/dress_rehearsal.py
(NOTES_r9); this test keeps the axis alive in the suite at a bounded
cost. The corpus is generated once per session into a tmp dir — the
read-only fixtures are never touched.
"""

from __future__ import annotations

import duckdb
import pytest

from map_reduce_mongodb_spark.io import TABLE_NAMES
from tests.conftest import assert_oracle_match

# Edge-sensitive subset: every name must stay registered and oracled.
EDGE_QUERIES = [
    "user_activity_bitmap",
    "token_count_bpe",
    "doc_token_entropy",
    "mmr_rerank",
    "scd2_events_replay",
    "scd2_snapshot_diff",
    "dedup_exact_groups",
    "asof_join_purchases",
    "funnel_time_to_convert",
    "events_interarrival",
    "cosine_topk",
    "embedding_dup_pairs",
    "l_diversity_audit",
    "mapreduce_wordcount",
    "brand_theilsen_slope",
]


@pytest.fixture(scope="module")
def rand_sf_dir(tmp_path_factory) -> str:
    from tools.gen_random_corpus import gen
    out = str(tmp_path_factory.mktemp("randsf"))
    counts = gen(out, seed=7)
    assert counts["events"] > 0 and counts["documents"] > 0
    return out


@pytest.fixture(scope="module")
def rand_ddb(rand_sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{rand_sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_query_matches_oracle_on_randomized_corpus(
        spark, rand_sf_dir, rand_ddb, name):
    from map_reduce_mongodb_spark.queries import ORACLE_SQL, QUERIES
    assert name in QUERIES and name in ORACLE_SQL, (
        f"{name} dropped from the registry — update EDGE_QUERIES")
    assert_oracle_match(QUERIES[name](spark, rand_sf_dir), rand_ddb,
                        ORACLE_SQL[name], name=f"rand:{name}")


# Queries that consume the purchase slice or a lang block — the ones
# an empty slice (routine at 100 TB: a keyspace partition with no
# rows) must not break or silently mis-handle.
EMPTY_SLICE_QUERIES = [
    "scd2_events_replay",      # replay drives THREE all-empty batches
    "scd2_snapshot_diff",      # must be exactly empty, not error
    "asof_join_purchases",     # empty right side
    "funnel_conversion",       # no conversions anywhere
    "retention_cohorts",
    "lang_char_trigram_profile",  # a lang block absent entirely
]


@pytest.fixture(scope="module")
def empty_slice_sf_dir(rand_sf_dir, tmp_path_factory) -> str:
    """The randomized corpus with the purchase slice EMPTIED (every
    'purchase' remapped to 'view') and one lang collapsed away —
    derived via DuckDB rewrite so schemas stay bit-identical."""
    import shutil

    out = str(tmp_path_factory.mktemp("randsf_empty"))
    for t in TABLE_NAMES:
        if t not in ("events", "documents"):
            shutil.copy(f"{rand_sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""COPY (SELECT event_id, ts, user_id,
        CASE WHEN event_type = 'purchase' THEN 'view'
             ELSE event_type END AS event_type, value, props
        FROM '{rand_sf_dir}/events.parquet')
        TO '{out}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT doc_id, text,
        CASE WHEN lang = 'zh' THEN 'en' ELSE lang END AS lang,
        source, n_chars FROM '{rand_sf_dir}/documents.parquet')
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    assert con.execute(f"SELECT count(*) FROM '{out}/events.parquet' "
                       "WHERE event_type = 'purchase'").fetchone()[0] == 0
    con.close()
    return out


@pytest.fixture(scope="module")
def empty_slice_ddb(empty_slice_sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{empty_slice_sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", EMPTY_SLICE_QUERIES)
def test_slice_consumers_survive_an_empty_slice(
        spark, empty_slice_sf_dir, empty_slice_ddb, name):
    from map_reduce_mongodb_spark.queries import ORACLE_SQL, QUERIES
    assert_oracle_match(QUERIES[name](spark, empty_slice_sf_dir),
                        empty_slice_ddb, ORACLE_SQL[name],
                        name=f"empty:{name}")


def test_random_corpus_schema_matches_fixtures(rand_sf_dir):
    """The generator's arrow schemas must track the driver fixtures
    exactly — a drifting column type would turn every parity result
    above into a vacuous comparison of different tables."""
    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR
    for t in TABLE_NAMES:
        got = pq.read_schema(f"{rand_sf_dir}/{t}.parquet")
        want = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        assert got.names == want.names, t
        assert [str(f.type) for f in got] == [str(f.type) for f in want], t


def test_empty_slice_rewrite_preserves_schemas(
        empty_slice_sf_dir, rand_sf_dir):
    """The empty-slice fixture rewrites events/documents through a
    DuckDB COPY — a parquet-writer type drift there (e.g. timestamp
    unit) would silently change what the empty-slice parity tests
    compare. Pin the rewritten tables' arrow schemas to the
    generator originals (r10 advisor catch)."""
    import pyarrow.parquet as pq

    for t in ("events", "documents"):
        got = pq.read_schema(f"{empty_slice_sf_dir}/{t}.parquet")
        want = pq.read_schema(f"{rand_sf_dir}/{t}.parquet")
        assert got.names == want.names, t
        assert [str(f.type) for f in got] == [str(f.type) for f in want], t


# Row-group layout axis (r10): the SAME data arriving as many input
# splits (multi-row-group parquet + tiny maxPartitionBytes) must not
# change any answer. The fixtures are single-row-group, so every
# other test scans one partition per table and never exercises
# partial-aggregation merge order — which is exactly what flipped
# q1_pricing_summary's double sum_charge by a half-cent before its
# aggregates moved to DECIMAL (the r10 full-registry layout sweep's
# one hit). The queries here are the layout-sensitive classes: the
# decimal-fixed money aggregate, the distributed prefix scan,
# per-partition applyInPandas packing, window running sums, and the
# new diagonal-run dedup (posexplode positions must survive splits).
LAYOUT_QUERIES = [
    "q1_pricing_summary",
    "orders_running_quantile",
    "seq_packing_ffd",
    "window_running_sum",
    "dup_shared_token_runs",
    "lineitem_higher_moments",
]


@pytest.fixture(scope="module")
def rg_sf_dir(tmp_path_factory) -> str:
    from tools.gen_random_corpus import gen
    out = str(tmp_path_factory.mktemp("randsf_rg"))
    gen(out, seed=7, row_group_rows=97)
    return out


@pytest.fixture(scope="module")
def rg_ddb(rg_sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{rg_sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def split_scan_spark(spark):
    """The shared session with file-split confs forced tiny so each
    row group lands in its own input partition; restored after."""
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    yield spark
    spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
    spark.conf.set("spark.sql.files.openCostInBytes", old_oc)


@pytest.mark.parametrize("name", LAYOUT_QUERIES)
def test_layout_sensitive_query_survives_split_scans(
        split_scan_spark, rg_sf_dir, rg_ddb, name):
    from map_reduce_mongodb_spark.queries import ORACLE_SQL, QUERIES
    df = QUERIES[name](split_scan_spark, rg_sf_dir)
    assert_oracle_match(df, rg_ddb, ORACLE_SQL[name], name=f"rg:{name}")
