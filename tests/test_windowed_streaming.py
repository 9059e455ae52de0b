"""Event-time windowed streaming skyline: per-window frontiers from a
multi-batch stream must equal the batch windowed_skyline; late rows are
dropped by policy without corrupting emitted frontiers."""

import uuid

from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.skyline import _compute_bounds, skyline, windowed_skyline
from pyspark_skyline_spark.streaming.windowed import windowed_stream_skyline

DIMS = [("value", "max"), ("event_id", "min")]


def _run_stream(spark, stream, bounds, delay):
    out = windowed_stream_skyline(
        stream, "ts", "1 day", DIMS, bounds, delay=delay, partitions=4
    )
    name = f"wsky_{uuid.uuid4().hex[:6]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _per_window_frontiers(df):
    return {
        (r.window_start, r.value, r.event_id)
        for r in df.select("window_start", "value", "event_id").dropDuplicates().collect()
    }


def test_windowed_stream_skyline_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    src = str(tmp_path / "events_stream")
    events.repartition(3).write.parquet(src)  # 3 unordered files -> >= 3 micro-batches
    bounds = _compute_bounds(events, DIMS)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # delay larger than the data span: no row is late, so the union of
    # update-mode emissions covers every window completely
    emitted = _run_stream(spark, stream, bounds, delay="3650 days")
    assert emitted.count() > 0
    reduced = skyline(
        emitted.select("window_start", "value", "event_id"),
        DIMS,
        by=["window_start"],
    )
    want = windowed_skyline(events, "ts", "1 day", DIMS)
    assert _per_window_frontiers(reduced) == _per_window_frontiers(want)


def test_windowed_stream_skyline_drops_late_rows(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # file 1: day-10 events; file 2 (arrives later): day-1 events — far
    # behind the watermark set by file 1, so they must be dropped and
    # their window must never emit
    src = tmp_path / "late_stream"
    on_time = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00", 5.0), (2, "2024-01-10 13:00:00", 7.0)],
        "event_id long, ts string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    late = spark.createDataFrame(
        [(3, "2024-01-01 12:00:00", 9.0)],
        "event_id long, ts string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    on_time.coalesce(1).write.parquet(str(src))
    late.coalesce(1).write.mode("append").parquet(str(src))
    # the file source orders batches by modification time: force the
    # late file strictly after the on-time one so batch order is
    # deterministic
    import os
    import time

    parts = sorted(src.glob("part-*.parquet"), key=lambda p: p.stat().st_mtime)
    now = time.time()
    os.utime(parts[0], (now - 100, now - 100))
    for p in parts[1:]:
        os.utime(p, (now, now))
    bounds = {"value": (0.0, 10.0), "event_id": (0.0, 10.0)}

    stream = (
        spark.readStream.schema(on_time.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    emitted = _run_stream(spark, stream, bounds, delay="1 hour")
    starts = {r.window_start.day for r in emitted.select("window_start").collect()}
    assert starts == {10}  # the late day-1 window never emits
    ids = {r.event_id for r in emitted.collect()}
    assert {1, 2}.issubset(ids) and 3 not in ids


def test_windowed_stream_skyline_rejects_non_utc_session(spark, sf_dir):
    import pytest

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    bounds = _compute_bounds(
        events.withColumn("ts", F.col("ts").cast("timestamp")), DIMS
    )
    stream = spark.readStream.schema(events.schema).parquet(sf_dir + "/events.parquet")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="session.timeZone"):
            windowed_stream_skyline(stream, "ts", "1 day", DIMS, bounds, partitions=4)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
