"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join — implemented as compositions of existing DataFrame
ops (SURVEY.md custom-operator rule (a): composition before UDFs).

As-of join (the time-series "most recent prior reading" join):
    The naive formulation — an inequality join + max() — explodes into
    O(|L|·|R|) pairs per key before aggregating. This implementation is
    the UNION-SORT formulation: tag both sides, one window pass ordered
    by (ts, side) per key, carry the last-seen right payload forward
    onto left rows. Cost: one shuffle + one sort per key group — the
    same shape as a sort-merge join, with no pair explosion, skew
    bounded by the hottest key.

Range join (count/aggregate right rows within [ts-Δ, ts)):
    Implemented with time-bucketing: right rows land in buckets of
    width Δ; each left row probes its own and the previous bucket —
    an equi-join on (key, bucket) with a residual range filter. Join
    fan-out is bounded by bucket occupancy, not window count.

Interval-overlap join (all pairs of overlapping [start, end) spans):
    The 1-D analogue of the spatial grid join (operators/spatial.py):
    each interval explodes to the fixed-width day cells it covers, the
    self-join runs per (key, cell), and each overlapping pair is kept
    exactly once — in the canonical cell that contains the overlap's
    first day. Join fan-out is Σ cell_occupancy², never |group|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, by: str, ts: str,
              payload_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` sharing the `by` key (direction='backward';
    'forward' mirrors it). Right payload columns come back prefixed
    ``asof_`` (NULL when no match). Ties on ts: the right row at the
    exact left timestamp matches (<=), consistent with DuckDB ASOF.

    DUPLICATE right rows at the same (by, ts) resolve to the GREATEST
    payload struct (field-wise comparison, left-to-right in
    ``payload_cols`` order) — the payload struct is the window's final
    sort key, so the carried value is deterministic under any
    partition layout / task retry instead of whichever duplicate
    happened to sort last (r9 review). Consequence: payload columns
    must be of orderable types (no maps) — an unorderable payload now
    fails loudly at analysis instead of running nondeterministically."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    l_tag = left.select(
        F.col(by), F.col(ts),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(by), F.col(ts),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*payload_cols).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right row at ts T must precede a left row at T: order
        # (ts, side, payload) — the payload tiebreak makes duplicate
        # right (by, ts) rows resolve deterministically (last = max)
        w = (Window.partitionBy(by)
             .orderBy(F.asc(ts), F.asc("_is_left"), F.asc("_r"))
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(by)
             .orderBy(F.desc(ts), F.asc("_is_left"), F.asc("_r"))
             .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).select(
        "_l.*", *[F.col("_match")[c].alias(f"asof_{c}") for c in payload_cols])
    return out


def range_count(left: DataFrame, right: DataFrame, by: str, ts: str,
                delta_seconds: int,
                agg_col: str | None = None) -> DataFrame:
    """Per left row: count (and optionally sum ``agg_col`` of) right
    rows with ``left.ts - Δ <= right.ts < left.ts`` sharing `by`.

    Bucketed: a right row at time t can only serve left rows in its own
    or the next Δ-bucket, so each left row probes exactly 2 buckets.

    Row multiplicity: output has exactly one row per LEFT ROW (not per
    distinct left tuple) — an internal unique row id is attached before
    the 2-probe explode and grouped on, so fully duplicate left rows
    each keep their own count instead of silently collapsing."""
    bucket = lambda c: (F.unix_timestamp(c) / delta_seconds).cast("long")  # noqa: E731
    r = right.select(F.col(by), F.col(ts).alias("_rts"),
                     *( [F.col(agg_col).alias("_rv")] if agg_col else []),
                     bucket(F.col(ts)).alias("_rb"))
    l = (left.withColumn("_lid", F.monotonically_increasing_id())
         .withColumn("_lb", bucket(F.col(ts)))
         .withColumn("_probe",
                     F.explode(F.array(F.col("_lb"), F.col("_lb") - 1))))
    joined = l.join(r, (l[by] == r[by]) & (l["_probe"] == r["_rb"]), "left")
    in_range = (
        F.col("_rts").isNotNull()
        & (F.col("_rts") < F.col(ts))
        & (F.col("_rts") >= F.col(ts) - F.expr(f"INTERVAL {delta_seconds} SECOND"))
    )
    aggs = [F.count(F.when(in_range, 1)).alias("n_in_range")]
    if agg_col:
        aggs.append(F.round(F.sum(F.when(in_range, F.col("_rv"))), 2)
                    .alias("sum_in_range"))
    return (
        joined.groupBy(F.col("_lid"), *[l[c] for c in left.columns])
        .agg(*aggs)
        .drop("_lid")
    )


def interval_overlap_pairs(iv: DataFrame, key: str, id_col: str,
                           start: str, end: str,
                           cell_width: int) -> DataFrame:
    """All pairs (a, b) with ``a.id < b.id`` sharing `key` whose
    half-open integer intervals ``[start, end)`` overlap, with the
    overlap length attached — the temporal-interval join behind
    shipment-collision, booking-conflict, and session-concurrency
    analyses.

    Scale design: the naive per-key self-join compares |group|² pairs.
    Here each interval is exploded to the ``cell_width``-wide cells it
    covers (``sequence(s div w, (e-1) div w)`` — ≤ span/w + 1 cells),
    the equi-join runs on (key, cell), and a surviving pair is counted
    exactly once by the CANONICAL-CELL rule: keep it only in the cell
    containing ``max(a.start, b.start)`` — the overlap's first day,
    which both sides necessarily cover. Work is Σ occupancy² per cell
    instead of |group|², and a hot cell is an AQE-skew/salting target
    like any hot LSH bucket. Output: key, id_a, id_b, overlap
    (= min(ends) - max(starts) > 0)."""
    cells = iv.select(
        F.col(key), F.col(id_col), F.col(start), F.col(end),
        F.explode(F.sequence(
            F.floor(F.col(start) / cell_width),
            F.floor((F.col(end) - 1) / cell_width))).alias("_cell"))
    a, b = cells.alias("a"), cells.alias("b")
    ov_start = F.greatest(F.col(f"a.{start}"), F.col(f"b.{start}"))
    overlap = (F.least(F.col(f"a.{end}"), F.col(f"b.{end}")) - ov_start)
    return (a.join(b, (F.col(f"a.{key}") == F.col(f"b.{key}"))
                   & (F.col("a._cell") == F.col("b._cell"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .where((overlap > 0)
                   & (F.col("a._cell") == F.floor(ov_start / cell_width)))
            .select(F.col(f"a.{key}").alias(key),
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    overlap.alias("overlap")))
