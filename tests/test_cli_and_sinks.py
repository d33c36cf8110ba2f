"""O2/O3 orchestration: the CLI waterfall with materialized stage
boundaries, and the sink helpers."""

from __future__ import annotations

import json

from map_reduce_mongodb_spark.__main__ import main
from tests.conftest import SF_DIR


def test_cli_waterfall(spark, tmp_path):
    out = str(tmp_path / "usgs_out")
    summary = main(["--sf-dir", SF_DIR, "--out-dir", out])
    assert summary["features"] == 1000
    assert summary["joined"] == summary["exported"] == 15
    # stage boundaries are real parquet readable by a fresh scan
    assert spark.read.parquet(f"{out}/joined").count() == 15
    doc = json.loads((tmp_path / "usgs_out" /
                      "feature_collection.json").read_text())
    assert len(doc["data"]) == 15
    sites = [f["properties"]["siteCode"] for f in doc["data"]]
    assert sites == sorted(sites)
