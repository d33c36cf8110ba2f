"""Scalar column helpers.

``falsy_coalesce`` reproduces the JS ``expr || 'undefined'`` idiom the
reference applies to five projected fields (mapreduce.js:23-27): JS
``||`` replaces *falsy* values — null/undefined, ``''``, ``0``, ``NaN``
— not just SQL NULL, so a plain ``coalesce`` is not faithful
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us_ntz(col: Column) -> Column:
    """Zone-free epoch microseconds of a TIMESTAMP_NTZ column — the
    exact inverse of ``streaming/windows.py:ntz_utc``: a calendar
    difference from an NTZ epoch literal, never consulting the session
    timezone. The previous idiom ``unix_micros(col.cast('timestamp'))``
    routed through an NTZ→LTZ cast that DOES consult
    ``spark.sql.session.timeZone`` — a no-op under the pinned-UTC
    sessions every sweep ran, but in a bare session on a non-UTC box a
    per-key gap straddling a DST transition would shift by ±3600s vs
    the oracle's naive arithmetic (ADVICE r7). Caller contract: ``col``
    must be TIMESTAMP_NTZ (every ``io.table`` timestamp is); an LTZ
    input would coerce the epoch literal session-locally."""
    return F.timestamp_diff(
        "MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
        col)


def falsy_coalesce(col: Column, default) -> Column:
    """JS ``col || default`` over a *string* column.

    Treats NULL and the empty string as falsy (the two cases reachable
    for the reference's string fields; numeric falsiness is handled by
    callers casting first). ``default`` may be a literal or Column.
    """
    default_col = default if isinstance(default, Column) else F.lit(default)
    return F.when(col.isNull() | (col == F.lit("")), default_col).otherwise(col)


def falsy_coalesce_num(col: Column, default) -> Column:
    """JS ``col || default`` over a numeric column: NULL, 0 and NaN are
    falsy (mapreduce.js:25 applies ``|| 'undefined'`` to a number-
    turned-string; this is the pre-cast numeric form)."""
    default_col = default if isinstance(default, Column) else F.lit(default)
    return (
        F.when(col.isNull() | F.isnan(col) | (col == F.lit(0)), default_col)
        .otherwise(col)
    )
