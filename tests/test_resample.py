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
