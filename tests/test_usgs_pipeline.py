"""Golden-output pipeline test (SURVEY.md §5.2 item 3): a checked-in
miniature USGS JSON response → the full 5-stage pipeline → compare the
final FeatureCollection against a golden file. This behaviorally pins
the semantic decisions N1-N5:

- fixture site A: both codes → exported
- site B: one code only → dropped (N5 inner semantics)
- site C: parameter 00010 → dropped by both filters (F1/F2)
- site D: both codes but one with an EMPTY measurement array → that
  row's variables=[null] (N4) → site has one effective code → dropped
- site E: '' measurement value → 'undefined' (falsy-coalesce, P4);
  missing unit → 'undefined' at the feature stage

Also covers the ingest sources: batch spark.read.json path and the
Spark 4 Python Data Source (partition-per-state, file:// URLs so the
executor-side fetch runs offline).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from map_reduce_mongodb_spark.pipeline.usgs import (
    export_features,
    feature_collection,
    geojson_features,
    merge_sites,
)
from map_reduce_mongodb_spark.sources.usgs import (
    USGSDataSource,
    build_usgs_url,
    read_usgs_json,
)

FIXTURES = Path(__file__).parent / "fixtures"


def _pipeline_fc(usgs_rows):
    out = export_features(merge_sites(geojson_features(usgs_rows).persist()))
    return feature_collection(out.orderBy(F.col("properties.siteCode")))


def test_explode_and_schema(spark):
    usgs = read_usgs_json(spark, str(FIXTURES / "usgs_s*.json"))
    assert usgs.count() == 8  # 4 timeSeries elements per state file
    assert usgs.columns[0] == "_id"
    # missing unit in fixture E:00060 → NULL, not error (PERMISSIVE)
    e = usgs.filter(F.col("_id") == "USGS:E:00060").collect()[0]
    assert e.variable.unit.unitAbbreviation is None


def test_golden_feature_collection(spark):
    usgs = read_usgs_json(spark, str(FIXTURES / "usgs_s*.json"))
    got = json.loads(_pipeline_fc(usgs).toJSON().collect()[0])
    want = json.loads(
        (FIXTURES / "usgs_golden_feature_collection.json").read_text())
    assert got == want
    # the semantic pins, asserted explicitly so regressions name them:
    sites = [f["properties"]["siteCode"] for f in got["data"]]
    assert sites == ["A0001", "E0005"]          # B, C, D dropped
    e = got["data"][1]["properties"]
    assert e["streamFlow"]["value"] == "undefined"  # falsy-coalesce


def test_flagship_composition_sf01_spot_check(spark):
    """VERDICT r8 #7: the golden FeatureCollection test pins the
    flagship at fixture scale; this pins the COMPOSITION (synthesize →
    features → merge → export, with the persisted stage-2 boundary) at
    sf0.1 — row count plus two content checksums, so an sf-dependent
    regression anywhere in the 5-stage chain (a partition-sensitive
    first/min_by, a boundary dropped under AQE) fails by value, not
    just by shape. Golden values recorded from the r9 tree, whose
    flat-join face is DuckDB-oracled at sf0.01 (usgs_site_join) — this
    extends the same composition one SF decade up."""
    import hashlib

    from map_reduce_mongodb_spark.io import table
    from map_reduce_mongodb_spark.pipeline.usgs import (
        usgs_flat_join, usgs_pipeline)

    ev = table(spark, "events", "/root/testdata/sf0.1")
    out = usgs_pipeline(ev)
    assert out.count() == 1500
    chk = (usgs_flat_join(ev)
           .agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(F.bit_xor(F.xxhash64(
                    "site", "lon", "lat", "flow_value", "flow_ts",
                    "gage_value", "gage_ts")), F.lit(0)).alias("h"))
           ).collect()[0]
    assert (chk["n"], chk["h"]) == (1500, 918040228476031011)
    # one sampled site end-to-end: the full nested Feature of the
    # first site, as rendered JSON (all-string leaves — no TZ or
    # float-format sensitivity)
    s = (out.select(F.to_json(F.struct("*")).alias("j"),
                    F.col("properties.siteCode").alias("sc"))
         .orderBy("sc").limit(1).collect()[0])
    assert s["sc"] == "S000000"
    assert (hashlib.md5(s["j"].encode()).hexdigest()
            == "0aa2c64ea92e26f2fae47352c07a7143")


def test_python_datasource_partition_per_state(spark, tmp_path):
    """The usgs Data Source end-to-end with file:// URLs: one partition
    per 'state', executor-side fetch, same rows as the batch reader."""
    assert USGSDataSource is not None
    template = f"file://{FIXTURES}/usgs_{{state}}.json"
    assert build_usgs_url("s1", template).endswith("usgs_s1.json")
    spark.dataSource.register(USGSDataSource)
    df = (spark.read.format("usgs")
          .option("states", "s1,s2")
          .option("url_template", template)
          .load())
    assert df.rdd.getNumPartitions() == 2   # one per state
    rows = df.select("name").collect()
    assert len(rows) == 8
    batch = read_usgs_json(spark, str(FIXTURES / "usgs_s*.json"))
    assert sorted(r.name for r in rows) == \
        sorted(r.name for r in batch.select("name").collect())
    # and the pipeline runs identically on datasource rows
    ds_rows = df.select(F.col("name").alias("_id"), "*")
    got = json.loads(_pipeline_fc(ds_rows).toJSON().collect()[0])
    want = json.loads(
        (FIXTURES / "usgs_golden_feature_collection.json").read_text())
    assert got == want


def test_python_datasource_null_timeseries_yields_zero_rows(
        spark, tmp_path):
    """An explicit ``"timeSeries": null`` response (a state with no
    data) must yield zero rows, not a task-killing TypeError:
    ``.get("timeSeries", [])`` returns None for a JSON null and the
    default never applies — the one null-guard the source was missing
    (r9 review; the batch reader handles the same document as zero
    rows via the PERMISSIVE read)."""
    (tmp_path / "usgs_sn.json").write_text(
        '{"value": {"timeSeries": null}}')
    template = f"file://{tmp_path}/usgs_{{state}}.json"
    spark.dataSource.register(USGSDataSource)
    df = (spark.read.format("usgs")
          .option("states", "sn")
          .option("url_template", template)
          .load())
    assert df.count() == 0


def test_python_datasource_bounded_concurrency(spark):
    """SURVEY O1's rate-limit promise: concurrency=N caps in-flight
    fetches by chunking states into N partitions whose fetches run
    sequentially; concurrency=1 is the reference's --sequential
    harvest. Row content must be identical to the full-parallel read."""
    template = f"file://{FIXTURES}/usgs_{{state}}.json"
    spark.dataSource.register(USGSDataSource)

    def load(**opts):
        r = (spark.read.format("usgs")
             .option("states", "s1,s2,s1,s2")
             .option("url_template", template))
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    seq = load(concurrency=1)
    assert seq.rdd.getNumPartitions() == 1      # strictly sequential
    two = load(concurrency=2)
    assert two.rdd.getNumPartitions() == 2      # ≤2 in flight
    full = load()
    assert full.rdd.getNumPartitions() == 4     # default: per state
    names = sorted(r.name for r in full.select("name").collect())
    assert sorted(r.name for r in seq.select("name").collect()) == names
    assert sorted(r.name for r in two.select("name").collect()) == names
