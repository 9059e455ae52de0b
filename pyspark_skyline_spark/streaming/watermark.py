"""Watermarked streaming operators: bounded-state dedup and windowed
aggregation with a late-data policy.

The reference has NO event-time handling at all — no timestamp column,
no ``withWatermark``, and its streaming ``dropDuplicates`` keeps state
forever (reference src/jobs/stream_job.py:180; SURVEY.md §2.3 rows
"streaming: watermarks" / "stateful ops & late data"). These operators
supply the bounded-state equivalents the new engine promises:

* ``watermarked_dedup`` — exact streaming dedup whose key state expires
  once the watermark passes ``delay`` behind the max observed event
  time. State is O(keys within the watermark horizon), not O(all keys
  ever) — the fix for the reference's unbounded growth.
* ``windowed_stream_stats`` — tumbling-window aggregation in APPEND
  mode: a window only emits once the watermark closes it, and
  later-than-watermark rows are dropped by policy instead of corrupting
  emitted results.

Both compose with any streaming source (Kafka/file/rate) and any sink;
tests drive them through the real Structured Streaming engine with a
file source + memory sink and ``availableNow`` triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["watermarked_dedup", "windowed_stream_stats", "sliding_stream_stats", "session_stream_stats"]


def _with_event_time(stream_df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP before ``withWatermark``.

    Spark requires the watermark column to be TIMESTAMP; parquet files
    written with NTZ semantics (as the driver's testdata is) read back as
    TIMESTAMP_NTZ and raise EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. The cast
    interprets NTZ wall-clock values in the *session timezone* — callers
    should pin ``spark.sql.session.timeZone=UTC`` (the repo's entry points
    do) or accept local-time semantics. Non-timestamp types (string, long)
    are rejected rather than implicitly parsed, so a schema mistake fails
    loudly instead of producing epoch-seconds surprises.
    """
    dtype = dict(stream_df.dtypes).get(ts_col)
    if dtype is None:
        raise ValueError(f"event-time column {ts_col!r} not found in {stream_df.columns}")
    if dtype == "timestamp":
        return stream_df
    if dtype in ("timestamp_ntz", "date"):
        return stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    raise TypeError(
        f"event-time column {ts_col!r} has type {dtype}; expected "
        "timestamp/timestamp_ntz/date (cast explicitly if it is a string or epoch number)"
    )


def watermarked_dedup(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    Keeps the first row seen per ``keys``; key state expires once the
    watermark passes ``delay`` behind that key's event time, so a
    duplicate arriving after the horizon re-emits — the documented
    trade for O(keys-in-horizon) instead of O(all-keys-ever) state.
    Uses ``dropDuplicatesWithinWatermark`` (plain ``dropDuplicates``
    without the event-time column in the subset never expires state —
    the reference's exact bug, stream_job.py:180).
    """
    stream_df = _with_event_time(stream_df, ts_col)
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def windowed_stream_stats(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    window_duration: str = "1 hour",
    delay: str = "10 minutes",
    by: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window count/sum/min/max per (window [, by...]) in
    append mode: results emit exactly once, when the watermark closes
    the window; rows later than ``delay`` behind the stream's max event
    time are dropped (the late-data policy the reference lacks).

    Integer-friendly aggregates so a batch oracle can hash-match the
    emitted rows.
    """
    stream_df = _with_event_time(stream_df, ts_col)
    by = list(by or ())
    w = F.window(F.col(ts_col), window_duration)
    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(w.alias("__w"), *by)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(value_col)).alias("sum_value"),
            F.min(F.col(value_col)).alias("min_value"),
            F.max(F.col(value_col)).alias("max_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *by,
            "n_rows",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def sliding_stream_stats(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Sliding-window streaming aggregation (append mode): every event
    contributes to ``duration/slide`` overlapping windows; a window
    emits once, when the watermark closes it. Same bounded-state /
    late-data-drop semantics as ``windowed_stream_stats`` — the
    tumbling op is the ``slide == duration`` special case.

    count/min/max only (no float accumulation), so a batch SQL oracle
    reproduces the emitted rows bit-for-bit.
    """
    stream_df = _with_event_time(stream_df, ts_col)
    w = F.window(F.col(ts_col), window_duration, slide)
    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(w.alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col(value_col)).alias("min_value"),
            F.max(F.col(value_col)).alias("max_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "n_rows",
            "min_value",
            "max_value",
        )
    )


def session_stream_stats(
    stream_df: DataFrame,
    ts_col: str,
    by: str,
    gap: str = "30 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Session-window streaming aggregation (``F.session_window``,
    append mode): per ``by`` key, events closer than ``gap`` merge into
    one session whose window is [first_ts, last_ts + gap); the session
    emits once the watermark passes its close. The streaming-native
    equivalent of the batch ``sessionize`` operator (which numbers
    sessions instead of windowing them).
    """
    stream_df = _with_event_time(stream_df, ts_col)
    w = F.session_window(F.col(ts_col), gap)
    return (
        stream_df.withWatermark(ts_col, delay)
        .groupBy(w.alias("__w"), F.col(by))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            by,
            "n_rows",
        )
    )
