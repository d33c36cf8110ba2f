"""Table catalog — the engine's analogue of the reference's collection
registry (``getCollection`` name→model switch, mongodb.js:30-45) plus
its full-collection scans (``find({})``, mongodb.js:59-67).

In Spark the catalog is just named DataFrames / temp views over
parquet; predicate pushdown, column pruning and partition pruning on
these scans are Catalyst built-ins (SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Driver test tables (TESTDATA.md). One parquet file per table.
TABLE_NAMES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: Columns stored as TIMESTAMP(NANOS) in the driver parquet. Spark reads
#: them as long (``spark.sql.legacy.parquet.nanosAsLong``); we convert to
#: TIMESTAMP at scan time — lossless, the corpus has 0 sub-µs digits.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Scan one named table (S5 analogue: full scan; Catalyst prunes)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    sf_dir = sf_dir or sf_dir_from_env()
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # Integer DIV, not `/`: float division of epoch-nanos loses
            # precision beyond double's 53-bit mantissa.
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None,
                register_views: bool = False) -> dict[str, DataFrame]:
    """Load the whole catalog; optionally register temp views so
    ``spark.sql`` / the S7 name-lookup path works by name."""
    sf_dir = sf_dir or sf_dir_from_env()
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
