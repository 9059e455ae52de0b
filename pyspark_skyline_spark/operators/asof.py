"""As-of (time-travel) join — a temporal operator Spark's DataFrame API
lacks (no counterpart in the reference either; north-star extension).

For every left row, find the single right row with the nearest event
time at-or-before it (``direction="backward"``) or at-or-after it
(``"forward"``), within the same ``by`` keys — the canonical
"enrich each event with the most recent state" primitive.

Architecture (Spark-first, scales to 100 TB):

* NOT a range join (``l.ts >= r.ts`` theta-joins explode into
  O(n_l * n_r) comparisons per key) and NOT a per-key ``collect_list``
  UDF (driver-sized state).
* Instead the classic union-scan formulation: tag each side, union into
  one event stream, hash-partition by the ``by`` keys, sort by event
  time within partitions, and carry the most recent right payload
  forward with ``last(ignorenulls=True)`` over an unbounded-preceding
  window. ONE shuffle per side, one sort, zero UDFs — the same plan
  shape as any windowed aggregation, so AQE/skew handling apply.
* Ties (equal timestamps) are deterministic: the right row sorts before
  the left row at the same instant (inclusive semantics), and among
  equal-time right rows the one with the greatest ``tiebreak`` column
  wins for backward joins (smallest for forward).

Equivalent ANSI SQL (the oracle form): per left row,
``row_number() OVER (PARTITION BY left_id ORDER BY r.ts DESC,
r.tiebreak DESC) = 1`` over the inequality join — quadratic per key,
which is exactly why the engine uses the union-scan instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "asof_join_nearest"]

_TS, _SIDE, _TIE, _RPAY = "__asof_ts", "__asof_side", "__asof_tie", "__asof_r"


def _event_micros(df: DataFrame, col: str):
    """Event time as integer microseconds (timestamps) or a plain long
    (numerics) — the single type-dispatch both the directional and the
    nearest variants must agree on."""
    dtype = df.schema[col].dataType.typeName()
    c = F.col(col)
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance_micros: int | None = None,
    tiebreak: str | None = None,
    how: str = "inner",
    right_prefix: str = "",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on event time.

    Parameters
    ----------
    left_on / right_on : event-time column on each side (timestamp or
        numeric; compared via ``unix_micros`` for timestamps)
    by : equi-join key columns (same names on both sides)
    direction : "backward" (right.ts <= left.ts, the default) or
        "forward" (right.ts >= left.ts)
    tolerance_micros : drop matches farther than this many microseconds
        from the left timestamp (like ``pandas.merge_asof(tolerance=)``)
    tiebreak : right column deciding among equal-time right rows
        (greatest wins backward / least wins forward); required for a
        fully deterministic result when right times can tie
    how : "inner" (drop unmatched left rows) or "left"
    right_prefix : prefix applied to right payload columns in the output
        (use when names collide with left columns)

    Returns left columns + right payload columns (by/ts/tiebreak of the
    right side included, prefixed).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by or ())

    right_payload = [c for c in right.columns if c not in by]
    out_names = {f"{right_prefix}{c}" for c in right_payload}
    clash = out_names & set(left.columns)
    if clash:
        raise ValueError(
            f"right columns {sorted(clash)} collide with left; set right_prefix"
        )

    from pyspark.sql.types import StructField, StructType

    r_struct = StructType([StructField(c, right.schema[c].dataType) for c in right_payload])
    l_struct = StructType([StructField(c, left.schema[c].dataType) for c in left.columns])
    tie = F.col(tiebreak) if tiebreak is not None else F.lit(0)
    l_tagged = left.select(
        *by,
        _event_micros(left, left_on).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_TIE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_l"),
        F.lit(None).cast(r_struct).alias(_RPAY),
    )
    r_tagged = right.select(
        *by,
        _event_micros(right, right_on).alias(_TS),
        F.lit(0).alias(_SIDE),
        tie.cast("long").alias(_TIE),
        F.lit(None).cast(l_struct).alias("__asof_l"),
        F.struct(*[F.col(c) for c in right_payload]).alias(_RPAY),
    )
    # rows with NULL event time have no temporal position: NULL right
    # rows must never be carried as matches (asc-nulls-first sorting
    # would otherwise attach their payload to every row after them),
    # and NULL left rows can match nothing — excluded from the scan,
    # re-attached unmatched in "left" mode below
    r_tagged = r_tagged.where(F.col(_TS).isNotNull())
    l_null = l_tagged.where(F.col(_TS).isNull())
    l_tagged = l_tagged.where(F.col(_TS).isNotNull())
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc_nulls_first()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc(), F.col(_TIE).desc_nulls_first()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        _RPAY, F.last(_RPAY, ignorenulls=True).over(w)
    ).withColumn("__asof_rts", F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True).over(w))

    matched = carried.filter(F.col(_SIDE) == 1)
    if tolerance_micros is not None:
        gap = (
            (F.col(_TS) - F.col("__asof_rts"))
            if direction == "backward"
            else (F.col("__asof_rts") - F.col(_TS))
        )
        matched = matched.withColumn(
            _RPAY, F.when(gap <= F.lit(int(tolerance_micros)), F.col(_RPAY))
        )
    if how == "inner":
        matched = matched.filter(F.col(_RPAY).isNotNull())

    if how == "left":
        # l_null lacks the carried __asof_rts column; fill with NULL
        matched = matched.unionByName(l_null, allowMissingColumns=True)
    out_cols = [F.col(f"__asof_l.`{c}`").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"{_RPAY}.`{c}`").alias(f"{right_prefix}{c}") for c in right_payload
    ]
    return matched.select(*out_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    by: list[str] | None = None,
    tolerance_micros: int | None = None,
    tiebreak: str | None = None,
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """As-of join taking the right row NEAREST in time on EITHER side
    (``pandas.merge_asof(direction="nearest")`` semantics; exact ties
    in distance prefer the backward match, like pandas).

    Composition of the two directional union-scans plus one
    smallest-|gap| window keyed on ``left_id`` (which must uniquely
    identify left rows — the window needs a per-row identity to pick
    between the two candidates). Costs ~2x a directional join; the
    final window partitions by ``left_id`` so it parallelizes per row
    group, no global sort.
    """
    if left_id not in left.columns:
        raise ValueError(f"left_id {left_id!r} not in left columns {left.columns}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    rts = f"{right_prefix}{right_on}"
    legs = []
    for direction in ("backward", "forward"):
        leg = asof_join(
            left, right, left_on, right_on, by=by, direction=direction,
            tolerance_micros=tolerance_micros, tiebreak=tiebreak,
            how="left", right_prefix=right_prefix,
        )
        if rts not in leg.columns:
            raise ValueError(
                f"right_on column {right_on!r} must be part of the right "
                "payload (needed to compute the gap)"
            )
        legs.append(leg.withColumn("__asof_dir", F.lit(direction)))
    both = legs[0].unionByName(legs[1])

    absgap = F.when(
        F.col(rts).isNotNull(),
        F.abs(_event_micros(both, left_on) - _event_micros(both, rts)),
    ).otherwise(F.lit(None))
    # partition by the by-keys too: a left_id unique only per group is
    # then still safe (identical cost; the docstring's global-uniqueness
    # demand remains the contract for duplicate ids within one group)
    w = Window.partitionBy(left_id, *(by or [])).orderBy(
        absgap.asc_nulls_last(),
        # exact distance tie -> backward wins (pandas semantics)
        F.when(F.col("__asof_dir") == "backward", 0).otherwise(1).asc(),
    )
    picked = (
        both.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn", "__asof_dir")
    )
    if how == "inner":
        picked = picked.filter(F.col(rts).isNotNull())
    return picked
