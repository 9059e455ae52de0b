"""Time-series resampling with gap filling (north-star extension; the
reference has no event time at all — SURVEY.md §2.3 date/time row).

``resample`` turns an irregular event stream into a REGULAR grid:
bucket timestamps to a fixed step, aggregate per (group, bucket), then
materialize the empty buckets — the step every monitoring/feature
pipeline needs before windowed models, and the one plain ``groupBy``
can't do (it never emits a bucket nobody hit).

Scale shape: one hash aggregate for the buckets (map-side combined),
one tiny per-group min/max aggregate, a ``sequence``+``explode`` grid
(rows = span/step per group — generated, never shuffled), a left join
grid←buckets on (group, bucket), and for ``fill="prev"`` one window
per group ordered by bucket — the same partitioning as the join, so
AQE coalesces it into the existing exchange. No Python anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["resample"]

# fixed-length units only: floor-bucketing onto a regular microsecond
# grid is meaningless for variable-length calendar periods
_UNIT_US = {
    "microsecond": 1,
    "us": 1,
    "millisecond": 1_000,
    "ms": 1_000,
    "second": 1_000_000,
    "sec": 1_000_000,
    "s": 1_000_000,
    "minute": 60_000_000,
    "min": 60_000_000,
    "hour": 3_600_000_000,
    "h": 3_600_000_000,
    "day": 86_400_000_000,
    "d": 86_400_000_000,
    "week": 7 * 86_400_000_000,
    "w": 7 * 86_400_000_000,
}
_CALENDAR_UNITS = ("month", "quarter", "year")


def _step_micros(step: str) -> int:
    """Parse a fixed-length interval string ("15 minutes", "1 week") to
    microseconds. Calendar units (month/quarter/year) are rejected with
    a contract error: their buckets are variable-length, so a fixed
    floor grid cannot honor them — use ``F.date_trunc`` + ``groupBy``
    for calendar bucketing instead."""
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*", str(step))
    if not m:
        raise ValueError(
            f"step {step!r} is not '<number> <unit>'; supported units: "
            f"{sorted(set(_UNIT_US))}"
        )
    n, unit = float(m.group(1)), m.group(2).lower()
    # de-pluralize only when the singular is the known unit ("minutes" ->
    # "minute"); never blind-strip ("us"/"ms"/"s" are units themselves)
    if unit not in _UNIT_US and unit not in _CALENDAR_UNITS and unit.endswith("s"):
        unit = unit[:-1]
    if unit in _CALENDAR_UNITS:
        raise ValueError(
            f"step {step!r} uses calendar unit {unit!r}: calendar periods are "
            "variable-length and cannot be resampled onto a fixed grid; use "
            "date_trunc + groupBy for calendar buckets, or a fixed-length "
            f"step from {sorted(set(_UNIT_US))}"
        )
    if unit not in _UNIT_US:
        raise ValueError(
            f"step {step!r} has unknown unit {unit!r}; supported units: "
            f"{sorted(set(_UNIT_US))}"
        )
    return int(round(n * _UNIT_US[unit]))


def resample(
    df: DataFrame,
    ts_col: str,
    step: str = "1 hour",
    by: list[str] | None = None,
    aggs: dict[str, Column] | None = None,
    fill: str = "none",
    fill_zero: float = 0.0,
) -> DataFrame:
    """Regular-grid resample of an event table.

    - ``ts_col`` must be a timestamp/timestamp_ntz column (strings and
      epoch numbers are rejected loudly, same policy as sessionize).
    - ``step``: a FIXED-LENGTH interval string (``"15 minutes"``,
      ``"1 hour"``, ``"1 week"``; units us/ms/second/minute/hour/day/
      week). Calendar units (month/quarter/year) are variable-length
      and rejected with a ``ValueError`` — use ``date_trunc`` +
      ``groupBy`` for calendar bucketing.
    - ``by``: optional grouping columns — each group gets its own full
      grid from ITS first to ITS last bucket.
    - ``aggs``: ``{out_name: aggregate Column}``; default
      ``{"n": count(*)}``.
    - ``fill``: ``"none"`` (empty buckets carry NULL aggregates, count
      columns still NULL), ``"zero"`` (NULL→``fill_zero``), or
      ``"prev"`` (forward-fill from the last non-empty bucket).

    Returns one row per (group, bucket_start) with no holes.
    """
    if fill not in ("none", "zero", "prev"):
        raise ValueError(f"fill must be none|zero|prev, got {fill!r}")
    dtype = dict(df.dtypes).get(ts_col)
    if dtype is None:
        raise ValueError(f"column {ts_col!r} not in DataFrame columns {df.columns}")
    if dtype not in ("timestamp", "timestamp_ntz"):
        raise TypeError(
            f"resample ts_col {ts_col!r} has type {dtype}; expected timestamp "
            "(cast explicitly if it is a string or epoch number)"
        )
    by = list(by or ())
    missing = [c for c in by if c not in df.columns]
    if missing:
        raise ValueError(f"by columns {missing} not in DataFrame columns")
    step_us = _step_micros(step)
    if step_us <= 0:
        raise ValueError(f"step {step!r} must be positive")
    if aggs is None:
        aggs = {"n": F.count(F.lit(1)).cast("long")}

    bucket_us = (
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(step_us))
        * F.lit(step_us)
    ).cast("long")
    keyed = df.withColumn("__bucket_us", bucket_us)

    agged = keyed.groupBy(*by, "__bucket_us").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )

    # per-group grid bounds (tiny aggregate), then the dense grid
    bounds = keyed.groupBy(*by).agg(
        F.min("__bucket_us").alias("__lo"), F.max("__bucket_us").alias("__hi")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_us))
        ).alias("__bucket_us"),
    )

    out = grid.join(agged, [*by, "__bucket_us"], "left")
    agg_names = list(aggs.keys())
    if fill == "zero":
        out = out.select(
            *by,
            "__bucket_us",
            *[
                F.coalesce(F.col(n), F.lit(fill_zero).cast(dict(out.dtypes)[n])).alias(n)
                for n in agg_names
            ],
        )
    elif fill == "prev":
        w = (
            Window.partitionBy(*by)
            .orderBy("__bucket_us")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            *by,
            "__bucket_us",
            *[F.last(F.col(n), ignorenulls=True).over(w).alias(n) for n in agg_names],
        )
    return out.withColumn(
        "bucket_start", F.timestamp_micros(F.col("__bucket_us"))
    ).drop("__bucket_us")
