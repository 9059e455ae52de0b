"""Stream-stream interval join: availableNow replay == batch join, and
matches spanning micro-batches are still found (state retention within
the watermark horizon)."""

import os
import time
import uuid

from pyspark.sql import functions as F

from pyspark_skyline_spark.streaming.joins import stream_interval_join

SCHEMA = "event_id long, user_id long, ts timestamp"


def _write_batches(spark, tmpdir, batches):
    src = os.path.join(tmpdir, "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        path = os.path.join(src, f"batch_{i}.parquet")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        t = time.time() + i
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(path, (t, t))
    return src


def _run_stream(spark, src, max_files=None):
    stream = spark.readStream.schema(SCHEMA)
    if max_files:
        stream = stream.option("maxFilesPerTrigger", max_files)
    stream = stream.parquet(src + "/*")
    errors = stream.filter(F.col("event_id") >= 100)
    clicks = stream.filter(F.col("event_id") < 100)
    joined = stream_interval_join(
        errors, clicks, "ts", "ts", by=["user_id"], max_delay="10 minutes",
        watermark="1 hour",
    ).select("event_id", "r_event_id")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {(r.event_id, r.r_event_id) for r in spark.table(name).collect()}


def _ts(minute):
    from datetime import datetime

    return datetime(2024, 1, 1, 10, minute)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    rows = [
        (1, 7, _ts(0)),    # click
        (2, 7, _ts(8)),    # click
        (3, 9, _ts(5)),    # click, other user
        (101, 7, _ts(9)),  # error: joins clicks 1 (9m) and 2 (1m)
        (102, 9, _ts(30)), # error: click 3 is 25m earlier -> no match
        (103, 8, _ts(10)), # error: no clicks for user 8
    ]
    src = _write_batches(spark, str(tmp_path), [rows])
    got = _run_stream(spark, src)

    df = spark.createDataFrame(rows, SCHEMA)
    batch = stream_interval_join(
        df.filter("event_id >= 100"), df.filter("event_id < 100"),
        "ts", "ts", by=["user_id"], max_delay="10 minutes",
    ).select("event_id", "r_event_id")
    want = {(r.event_id, r.r_event_id) for r in batch.collect()}
    assert got == want == {(101, 1), (101, 2)}


def test_stream_interval_join_across_micro_batches(spark, tmp_path):
    # the click arrives one micro-batch BEFORE its error: the join
    # buffers it (within watermark + delay) and still emits the pair
    b1 = [(1, 7, _ts(0))]
    b2 = [(101, 7, _ts(5)), (2, 7, _ts(4))]
    src = _write_batches(spark, str(tmp_path), [b1, b2])
    got = _run_stream(spark, src, max_files=1)
    assert got == {(101, 1), (101, 2)}


def test_stream_interval_left_outer_join(spark, tmp_path):
    """left_outer: unmatched errors emit with NULL right columns once the
    watermark proves no match can arrive. A far-future watermark-pusher
    row advances the final watermark past every left row + delay, so the
    whole left side flushes and the result equals the batch left join."""
    b1 = [
        (1, 7, _ts(0)),     # click
        (101, 7, _ts(5)),   # error: matches click 1
        (102, 8, _ts(6)),   # error: no click for user 8 -> NULL match
    ]
    # outer-join state is only evicted while a DATA batch executes, and
    # the watermark a batch runs with derives from the PREVIOUS batch's
    # max event time — so two staged pushers: b2 advances the watermark
    # past every left row + delay, b3 executes under it and flushes
    # the engine's global watermark is the MIN across both sides'
    # watermark operators, so each pusher batch must advance BOTH the
    # click and the error branch (the pushers themselves stay buffered
    # past the final watermark and never reach the output)
    b2 = [(50, 99, _ts(50)), (201, 98, _ts(50))]
    b3 = [(51, 99, _ts(55)), (202, 98, _ts(55))]
    src = _write_batches(spark, str(tmp_path), [b1, b2, b3])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    errors = stream.filter(F.col("event_id") >= 100)
    clicks = stream.filter((F.col("event_id") < 100))
    joined = stream_interval_join(
        errors, clicks, "ts", "ts", by=["user_id"],
        max_delay="10 minutes", watermark="5 minutes", how="left_outer",
    ).select("event_id", "r_event_id")
    import uuid

    name = f"ssjo_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.event_id, r.r_event_id) for r in spark.table(name).collect()}
    assert got == {(101, 1), (102, None)}

    import pytest as _pt

    with _pt.raises(ValueError, match="how"):
        stream_interval_join(errors, clicks, "ts", "ts", how="full")
