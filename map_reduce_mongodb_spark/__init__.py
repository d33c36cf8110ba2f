"""map_reduce_mongodb_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of the reference ETL pipeline
``practicalprogramming-io/map-reduce-mongodb`` (a Node.js + MongoDB
mapReduce harvester of USGS hydrographic data), extended with the
operators a large-scale (100 TB) training-data pipeline needs:
deduplication, similarity search, multimodal columns and text analysis.

Layout
------
- ``session``   : SparkSession factory (AQE, Arrow, tuned shuffle).
- ``io``        : catalog of the driver's test tables (S5/S7 analogues).
- ``functions`` : scalar/text/vector column helpers (JS-semantics
                  ``falsy_coalesce``, language-ID, minhash, cosine...).
- ``pipeline``  : the flagship USGS GeoJSON pipeline re-expressed as one
                  declarative DataFrame program.
- ``operators`` : mapreduce facade, dedup family, similarity search,
                  top-k — the "engine API" surface.
- ``sources``   : ingest sources (HTTP/JSON landing pattern).
- ``streaming`` : Structured Streaming windowed/sessionized analogues.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from map_reduce_mongodb_spark.session import get_spark
from map_reduce_mongodb_spark.io import TABLE_NAMES, load_tables, table

__all__ = ["get_spark", "load_tables", "table", "TABLE_NAMES"]

__version__ = "0.1.0"
