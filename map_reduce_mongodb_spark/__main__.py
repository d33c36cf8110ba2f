"""CLI entry (O3, harvest.js:146-149): run the flagship pipeline with
materialized stage boundaries (O2's waterfall, harvest.js:104-135).

    python -m map_reduce_mongodb_spark --sf-dir /root/testdata/sf0.001 \
        --out-dir /tmp/usgs_out

Writes per-stage parquet (features, joined, export) and the final
FeatureCollection JSON artifact, then prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from map_reduce_mongodb_spark import get_spark, io
from map_reduce_mongodb_spark.pipeline.usgs import (
    export_features,
    feature_collection,
    geojson_features,
    merge_sites,
    synthesize_usgs,
)
from map_reduce_mongodb_spark.sinks import (
    export_feature_collection_json,
    write_stage,
)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="map_reduce_mongodb_spark")
    ap.add_argument("--sf-dir", default=io.DEFAULT_SF_DIR)
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="usgs-pipeline-cli")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)

    events = io.table(spark, "events", args.sf_dir)
    features = write_stage(geojson_features(synthesize_usgs(events)),
                           f"{args.out_dir}/features")
    joined = write_stage(
        merge_sites(features, order_key=F.col("_id").cast("long")),
        f"{args.out_dir}/joined")
    exported = write_stage(export_features(joined), f"{args.out_dir}/export")
    fc_path = f"{args.out_dir}/feature_collection.json"
    export_feature_collection_json(
        feature_collection(exported.orderBy("properties.siteCode")), fc_path)

    summary = {
        "features": features.count(),
        "joined": joined.count(),
        "exported": exported.count(),
        "artifact": fc_path,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
