"""Watermarked stream-stream interval join (SURVEY.md §2.3 streaming
breadth; the reference has no joins at all — its only dataflow is a
single keyed aggregate, src/jobs/stream_job.py).

``stream_interval_join`` joins two event streams on equality keys plus
a bounded time window (right event in ``[left_ts - max_delay,
left_ts]`` — "the most recent right-side context for each left event",
e.g. clicks preceding an error). Both sides carry watermarks and the
join predicate carries the time bound, which is exactly the shape
Structured Streaming needs to EVICT state: each side buffers only rows
inside ``watermark + max_delay`` of the stream frontier, so state is
bounded by rate × horizon, never by stream length.

Inner joins emit each match as soon as both rows have arrived
(watermarks only bound state and drop late rows), so an availableNow
replay emits exactly the batch join of the same data — the property
the oracle tests rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyspark_skyline_spark.streaming.watermark import _with_event_time

__all__ = ["stream_interval_join", "stream_static_join"]


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    keys: list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a streaming fact with a static dimension table (the
    classic lookup/enrichment shape: events + user profile, lineitem +
    part attributes).

    Stream-static joins are STATELESS in Structured Streaming — each
    micro-batch joins against the current static snapshot, no state
    store, no watermark required — which makes this the cheapest join
    in the engine. ``broadcast_dim=True`` (default) broadcasts the
    dimension so each micro-batch is a map-side BroadcastHashJoin: zero
    shuffle of the stream, the plan you want when the dimension fits an
    executor. Set it False for dimensions too large to broadcast (the
    engine then shuffles each micro-batch — usually the wrong trade;
    consider pre-bucketing instead).

    ``how``: inner or left_outer with the stream on the left — the
    shapes Structured Streaming supports statelessly. Works unchanged
    on batch DataFrames (broadcast hint is identical), so batch==stream
    equivalence is directly testable.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    if not keys:
        raise ValueError("keys must be non-empty")
    missing_s = [k for k in keys if k not in stream.columns]
    missing_d = [k for k in keys if k not in static.columns]
    if missing_s or missing_d:
        raise ValueError(f"join keys missing: stream={missing_s} static={missing_d}")
    dim = F.broadcast(static) if broadcast_dim else static
    return stream.join(dim, keys, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str] | None = None,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same ``by`` keys whose
    event time falls in ``[left_ts - max_delay, left_ts]``.

    Right-side columns are renamed with ``right_prefix`` (both streams
    often share a schema — e.g. one event table split by type). Works
    on batch DataFrames too (watermarks are a no-op there), so the same
    call is unit-testable and oracle-checkable in batch.

    ``how="left_outer"`` keeps unmatched left rows with NULL right
    columns. Outer results are watermark-gated by the engine: a left
    row's NULL-match row only emits once the watermark proves no
    matching right row can still arrive (watermark past ``left_ts +
    max_delay``) — rows newer than the final watermark stay buffered,
    so a bounded replay emits the batch left join of the
    watermark-closed prefix only.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    by = list(by or ())
    for c in [left_ts, *by]:
        if c not in left.columns:
            raise ValueError(f"column {c!r} not in left columns {left.columns}")
    for c in [right_ts, *by]:
        if c not in right.columns:
            raise ValueError(f"column {c!r} not in right columns {right.columns}")
    l = _with_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = _with_event_time(right, right_ts).withWatermark(right_ts, watermark)
    renames = {c: f"{right_prefix}{c}" for c in r.columns}
    r = r.select(*[F.col(c).alias(renames[c]) for c in r.columns])
    r_ts = renames[right_ts]
    cond = (F.col(r_ts) <= F.col(left_ts)) & (
        F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_delay}")
    )
    for c in by:
        cond = cond & (F.col(c) == F.col(renames[c]))
    return l.join(r, cond, how)
