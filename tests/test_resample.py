"""Time-series resample (operators/resample.py): dense grids, fill
policies, per-group bounds, type rejection."""

import datetime

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.resample import resample


def _ts(day, hour, minute=0):
    return datetime.datetime(2024, 1, day, hour, minute)


ROWS = [
    # group a: hours 0, 1, 3 of day 1 (hour 2 is a gap)
    ("a", _ts(1, 0, 5), 1.0),
    ("a", _ts(1, 0, 50), 2.0),
    ("a", _ts(1, 1, 10), 3.0),
    ("a", _ts(1, 3, 59), 4.0),
    # group b: a single hour
    ("b", _ts(1, 7, 30), 10.0),
]
SCHEMA = "g string, ts timestamp, v double"


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_dense_grid_with_nulls(events):
    out = resample(
        events, "ts", "1 hour", by=["g"],
        aggs={"n": F.count(F.lit(1)).cast("long"), "sum_v": F.sum("v")},
    )
    rows = {(r.g, r.bucket_start.hour): (r.n, r.sum_v) for r in out.collect()}
    # group a: hours 0..3 all present, gap hour 2 has NULLs
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("a", 1)] == (1, 3.0)
    assert rows[("a", 2)] == (None, None)
    assert rows[("a", 3)] == (1, 4.0)
    # group b: only its own single-bucket grid
    assert [h for (g, h) in rows if g == "b"] == [7]
    assert len(rows) == 5


def test_zero_fill(events):
    out = resample(events, "ts", "1 hour", by=["g"], fill="zero")
    rows = {(r.g, r.bucket_start.hour): r.n for r in out.collect()}
    assert rows[("a", 2)] == 0
    assert rows[("a", 0)] == 2


def test_forward_fill(events):
    out = resample(
        events, "ts", "1 hour", by=["g"], aggs={"sum_v": F.sum("v")}, fill="prev"
    )
    rows = {(r.g, r.bucket_start.hour): r.sum_v for r in out.collect()}
    assert rows[("a", 2)] == 3.0  # carried from hour 1
    assert rows[("a", 3)] == 4.0  # real value wins


def test_ungrouped_grid(spark):
    rows = [(_ts(1, 0), 1.0), (_ts(1, 5), 2.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = resample(df, "ts", "1 hour")
    assert out.count() == 6  # hours 0..5 inclusive
    assert out.where(F.col("n").isNull()).count() == 4


def test_sub_hour_step(events):
    out = resample(
        events.where(F.col("g") == "a"), "ts", "30 minutes", by=["g"]
    )
    # span 00:05 .. 03:59 -> buckets 00:00 .. 03:30 = 8
    assert out.count() == 8


def test_type_and_arg_rejection(spark, events):
    bad = spark.createDataFrame([("2024-01-01", 1.0)], "ts string, v double")
    with pytest.raises(TypeError):
        resample(bad, "ts")
    with pytest.raises(ValueError):
        resample(events, "nope")
    with pytest.raises(ValueError):
        resample(events, "ts", fill="interpolate")
    with pytest.raises(ValueError):
        resample(events, "ts", by=["missing"])


def test_real_events_table_no_holes(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = resample(ev, "ts", "1 day", by=["event_type"], fill="zero")
    # every (type, day) between each type's first and last day exists
    spans = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        ((F.unix_micros(F.max("bucket_start")) - F.unix_micros(F.min("bucket_start")))
         / F.lit(86_400_000_000) + 1).cast("long").alias("expected"),
    )
    assert all(r.n_buckets == r.expected for r in spans.collect())
    assert out.where(F.col("n") < 0).count() == 0


def test_step_units_fixed_length_ok():
    """Unit-string contract (r3 ADVICE): fixed-length steps parse —
    including weeks, which pd.Timedelta rejected."""
    from pyspark_skyline_spark.operators.resample import _step_micros

    assert _step_micros("15 minutes") == 15 * 60_000_000
    assert _step_micros("1 hour") == 3_600_000_000
    assert _step_micros("1 week") == 7 * 86_400_000_000
    assert _step_micros("2 weeks") == 14 * 86_400_000_000
    assert _step_micros("500 ms") == 500_000
    assert _step_micros("10s") == 10_000_000
    assert _step_micros("1.5 hours") == 5_400_000_000


def test_step_units_calendar_rejected_clearly():
    """Calendar units raise a CONTRACT error naming the problem, not a
    pandas internals message."""
    from pyspark_skyline_spark.operators.resample import _step_micros

    for bad in ("1 month", "3 months", "1 quarter", "1 year"):
        with pytest.raises(ValueError, match="calendar"):
            _step_micros(bad)
    with pytest.raises(ValueError, match="unknown unit"):
        _step_micros("1 fortnight")
    with pytest.raises(ValueError, match="not '<number> <unit>'"):
        _step_micros("hourly")


def test_resample_week_step_grid(spark):
    """End-to-end with a week step: grid rows are exactly 7 days apart."""
    rows = [("2024-01-01 00:00:00",), ("2024-01-20 12:00:00",)]
    df = spark.createDataFrame(rows, "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    out = resample(df, "ts", "1 week").orderBy("bucket_start").collect()
    # epoch-aligned weekly buckets: 2024-01-01 -> 2023-12-28, 2024-01-20
    # -> 2024-01-18, grid covers the two empty weeks between
    assert len(out) == 4
    starts = [r.bucket_start for r in out]
    assert all(
        (b - a).total_seconds() == 7 * 86400 for a, b in zip(starts, starts[1:])
    )
    assert [r.n for r in out] == [1, None, None, 1]
