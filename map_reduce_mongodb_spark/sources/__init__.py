from map_reduce_mongodb_spark.sources.usgs import (
    USGS_RESPONSE_SCHEMA,
    USGS_TIMESERIES_SCHEMA,
    build_usgs_url,
    explode_response,
    read_usgs_json,
)

__all__ = [
    "USGS_RESPONSE_SCHEMA",
    "USGS_TIMESERIES_SCHEMA",
    "build_usgs_url",
    "read_usgs_json",
    "explode_response",
]
