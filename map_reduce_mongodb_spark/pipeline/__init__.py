from map_reduce_mongodb_spark.pipeline.usgs import (
    feature_collection,
    geojson_features,
    merge_sites,
    export_features,
    synthesize_usgs,
    usgs_flat_join,
    usgs_pipeline,
)

__all__ = [
    "synthesize_usgs",
    "geojson_features",
    "merge_sites",
    "export_features",
    "feature_collection",
    "usgs_flat_join",
    "usgs_pipeline",
]
