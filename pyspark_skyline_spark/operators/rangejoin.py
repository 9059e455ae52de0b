"""Bin-bucketed range (interval × point) join.

The reference has no joins at all (SURVEY.md §2.3: "no `.join` call
anywhere in `src/`"); this fills the range-predicate join family the
task spec lists, the way a Spark engine should: a naive range join is a
``BroadcastNestedLoopJoin`` (every point × every interval — quadratic),
so instead both sides are bucketed into fixed-width bins of the range
key and joined with an ordinary hash equi-join on the bin id plus the
exact range predicate:

* each interval row explodes to the bins it overlaps
  (``sequence(floor(start/w), floor(end/w))``);
* each point row computes its single bin (``floor(point/w)``);
* the equi-join on ``(bin, *on)`` shuffles hash-partitioned — the
  standard scale path (this is what the commercial engines' RANGE_JOIN
  bin hints do) — and the exact predicate filters within the bin.

A point lives in exactly one bin, so no pair can match twice — no
dedup pass is needed (the join is exact, not a candidate generator).

Bin width is the one tuning knob: ~the typical interval length is
right (intervals then explode to ~2 bins). Much smaller explodes
intervals into many bins (row blowup ~len/width); much larger packs
unrelated rows into one bin (within-bin mini-cross-products). Both
stay correct — only the shuffle/compare volume changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    TimestampNTZType,
    TimestampType,
)

__all__ = ["range_join", "range_key"]

_CLOSED = {
    "left": (True, False),
    "right": (False, True),
    "both": (True, True),
    "neither": (False, False),
}


def range_key(df: DataFrame, col: str) -> Column:
    """Numeric range key for binning: microseconds for timestamps, days
    for dates, the value itself for numerics (``bin_width`` is expressed
    in these units)."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        # unix_micros over a timestamp cast: TIMESTAMP_NTZ neither casts
        # to double nor feeds unix_micros directly (Spark 4 requires
        # TIMESTAMP), and micros keep exact integer arithmetic. NTZ
        # wall-clock values are interpreted in the session timezone —
        # pin spark.sql.session.timeZone=UTC (as the repo's entry points
        # do) so range arithmetic is DST-proof.
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01").cast("date"))
    if isinstance(dt, NumericType):
        return F.col(col)
    # same loud-failure policy as streaming/watermark._with_event_time:
    # a string/bool range column would bin as NULL and compare lexically
    raise TypeError(
        f"range column {col!r} has type {dt.simpleString()}; expected "
        "timestamp/timestamp_ntz/date/numeric (cast explicitly first)"
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    on: list[str] | None = None,
    closed: str = "left",
) -> DataFrame:
    """Inner join of ``points`` rows to every ``intervals`` row whose
    ``[start_col, end_col)`` range contains ``point_col`` (bounds per
    ``closed`` ∈ left|right|both|neither), optionally also matching on
    the ``on`` equality columns.

    Column names must be disjoint between the two inputs (select/alias
    first); the result carries all columns of both.
    """
    if closed not in _CLOSED:
        raise ValueError(f"closed must be one of {sorted(_CLOSED)}, got {closed!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    on = list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"column names must be disjoint (alias first): {sorted(overlap)}"
        )
    inc_lo, inc_hi = _CLOSED[closed]

    pk = range_key(points, point_col)
    sk = range_key(intervals, start_col)
    ek = range_key(intervals, end_col)

    p = points.withColumn("__bin", F.floor(pk / F.lit(bin_width)))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(sk / F.lit(bin_width)), F.floor(ek / F.lit(bin_width)))
        ),
    )
    lo = (
        F.col(point_col) >= F.col(start_col)
        if inc_lo
        else F.col(point_col) > F.col(start_col)
    )
    hi = (
        F.col(point_col) <= F.col(end_col)
        if inc_hi
        else F.col(point_col) < F.col(end_col)
    )
    return p.join(iv, on + ["__bin"]).filter(lo & hi).drop("__bin")
