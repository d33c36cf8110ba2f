"""USGS NWIS ingest — the reference's S1 (HTTP REST source,
harvest.js:70-87) and S2 (incremental JSON parse + timeSeries array
extraction, harvest.js:19-51) re-expressed Spark-first.

The reference hand-rolls an incremental JSON parser and explodes
``root.value.timeSeries[]`` element-by-element as bytes stream in
(harvest.js:34-41). Spark's JSON reader + an explicit schema + one
``explode`` subsume all of it — with schema projection, PERMISSIVE
missing-field → NULL semantics (the analogue of JS undefined
propagation, SURVEY.md §1.3), and parallelism across response files.

Two ingest paths:

- :func:`read_usgs_json` — batch: responses landed as files (one per
  state — the pattern the driver harness uses; also what you'd do at
  scale: land to object storage, then scan).
- :class:`USGSDataSource` — Spark 4 Python Data Source: one partition
  per state, fetched executor-side (``urllib``; supports file:// URLs
  so the whole path is testable offline). Register with
  ``spark.dataSource.register(USGSDataSource)`` and read with
  ``spark.read.format("usgs").option("states", "CO,UT").load()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

#: Exactly the fields the reference reads (FIXTURES.md §1, citing
#: mapreduce.js:12-27) — schema projection prunes everything else the
#: real API returns.
USGS_TIMESERIES_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("sourceInfo", StructType([
        StructField("siteName", StringType()),
        StructField("siteCode", ArrayType(StructType([
            StructField("value", StringType()),
        ]))),
        StructField("geoLocation", StructType([
            StructField("geogLocation", StructType([
                StructField("srs", StringType()),
                StructField("latitude", DoubleType()),
                StructField("longitude", DoubleType()),
            ])),
        ])),
    ])),
    StructField("variable", StructType([
        StructField("variableCode", ArrayType(StructType([
            StructField("value", StringType()),
        ]))),
        StructField("unit", StructType([
            StructField("unitAbbreviation", StringType()),
        ])),
        StructField("noDataValue", DoubleType()),
    ])),
    StructField("values", ArrayType(StructType([
        StructField("value", ArrayType(StructType([
            StructField("value", StringType()),
            StructField("dateTime", StringType()),
        ]))),
    ]))),
])

USGS_RESPONSE_SCHEMA = StructType([
    StructField("value", StructType([
        StructField("timeSeries", ArrayType(USGS_TIMESERIES_SCHEMA)),
    ])),
])

#: URL construction — harvest.js:12-17 verbatim parameters.
USGS_URL_TEMPLATE = ("https://waterservices.usgs.gov/nwis/iv/?format=json"
                     "&stateCd={state}&parameterCd=00065,00060")


def build_usgs_url(state: str, template: str = USGS_URL_TEMPLATE) -> str:
    return template.format(state=state)


def explode_response(responses: DataFrame) -> DataFrame:
    """S2: one row per ``value.timeSeries[]`` element. ``_id`` is the
    element's ``name`` (site+param natural key) — the deterministic
    stand-in for the reference's Mongo-generated ObjectId (documented
    divergence; the reference never relies on ObjectId structure)."""
    ts = responses.select(
        F.explode("value.timeSeries").alias("t")).select("t.*")
    return ts.select(F.col("name").alias("_id"), "*")


def read_usgs_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read landed USGS response files (one JSON doc per file) →
    exploded ``usgs_timeseries`` rows (FIXTURES.md §1 shape)."""
    responses = spark.read.json(path, schema=USGS_RESPONSE_SCHEMA,
                                multiLine=True, mode="PERMISSIVE")
    return explode_response(responses)


# ----------------------------------------------------------------------
# Spark 4 Python Data Source: partition-per-state executor-side fetch
# ----------------------------------------------------------------------

try:  # pyspark>=4 API; gate so the batch path works everywhere
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _StatePartition(InputPartition):
        """One scheduling unit = an ordered list of (state, url) fetches
        executed sequentially within the partition."""

        def __init__(self, fetches: list[tuple[str, str]]):
            self.fetches = fetches

    class USGSDataSource(DataSource):
        """``spark.read.format("usgs")`` — options:

        - ``states``: comma-separated state codes (required)
        - ``url_template``: override (e.g. ``file:///fixtures/{state}.json``
          for offline tests); defaults to the live NWIS endpoint.
        - ``concurrency``: max in-flight fetches (default: one partition
          per state, full parallelism). ``concurrency=1`` reproduces the
          reference's strictly sequential, rate-limited harvest
          (harvest.js:94-102 — SURVEY.md O1 keeps it as an option for
          API politeness): states are chunked round-robin into that
          many partitions and fetched one at a time inside each.

        Scale notes: by default one input partition per state = the
        reference's 49 sequential fetches run in parallel across
        executors; its sequentiality was backpressure politeness, not
        semantics. Rows stream out per timeSeries element — no
        whole-response buffering on the driver.
        """

        @classmethod
        def name(cls) -> str:
            return "usgs"

        def schema(self):
            return USGS_TIMESERIES_SCHEMA

        def reader(self, schema):
            return _USGSReader(self.options)

    class _USGSReader(DataSourceReader):
        def __init__(self, options):
            states = options.get("states", "")
            self._template = options.get("url_template", USGS_URL_TEMPLATE)
            self._states = [s.strip() for s in states.split(",") if s.strip()]
            if not self._states:
                raise ValueError("usgs source requires option 'states'")
            raw = options.get("concurrency")
            self._concurrency = int(raw) if raw is not None else None
            if self._concurrency is not None and self._concurrency < 1:
                raise ValueError("concurrency must be >= 1")

        def partitions(self):
            n = len(self._states)
            if self._concurrency is not None:
                n = min(self._concurrency, n)
            # Round-robin chunking: partition count IS the concurrency
            # ceiling (a partition's fetches run sequentially).
            chunks = [self._states[i::n] for i in range(n)]
            return [
                _StatePartition([(s, build_usgs_url(s, self._template))
                                 for s in chunk])
                for chunk in chunks
            ]

        def read(self, partition):
            import json as _json
            from urllib.request import urlopen

            for _state, url in partition.fetches:
                with urlopen(url) as resp:  # noqa: S310 (file:// in tests)
                    payload = _json.load(resp)
                # `or []`, not .get(key, []): an explicit JSON
                # "timeSeries": null returns None from .get and the
                # default never applies (the one null-guard this file
                # was missing — r9 review; the batch twin's PERMISSIVE
                # read handles the same document as zero rows)
                for element in ((payload.get("value") or {})
                                .get("timeSeries") or []):
                    yield _row_from_element(element)

    def _row_from_element(element: dict):
        """dict → tuple in USGS_TIMESERIES_SCHEMA field order, with JS-
        style missing-path tolerance (absent → None)."""
        def g(d, *path):
            cur = d
            for p in path:
                if cur is None:
                    return None
                cur = cur.get(p) if isinstance(cur, dict) else None
            return cur

        src = element.get("sourceInfo") or {}
        var = element.get("variable") or {}
        return (
            element.get("name"),
            (
                src.get("siteName"),
                [(c.get("value"),) for c in src.get("siteCode") or []],
                ((
                    g(src, "geoLocation", "geogLocation", "srs"),
                    g(src, "geoLocation", "geogLocation", "latitude"),
                    g(src, "geoLocation", "geogLocation", "longitude"),
                ),),
            ),
            (
                [(c.get("value"),) for c in var.get("variableCode") or []],
                (g(var, "unit", "unitAbbreviation"),),
                var.get("noDataValue"),
            ),
            [
                ([(v.get("value"), v.get("dateTime"))
                  for v in (vv.get("value") or [])],)
                for vv in element.get("values") or []
            ],
        )

except ImportError:  # pragma: no cover - pyspark<4 fallback
    USGSDataSource = None  # type: ignore[assignment]
