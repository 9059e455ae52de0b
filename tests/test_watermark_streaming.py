"""Watermarked streaming: bounded-state dedup + append-mode windowed
aggregation with a late-data policy (SURVEY.md §2.3 rows "streaming:
watermarks" / "stateful ops & late data" — both absent in the
reference, whose streaming dropDuplicates keeps state forever,
stream_job.py:180)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.streaming.watermark import (
    session_stream_stats,
    sliding_stream_stats,
    watermarked_dedup,
    windowed_stream_stats,
)

SCHEMA = "k long, ts timestamp, v long"


def _write_batches(spark, tmpdir, batches):
    """One parquet file per batch, mtimes strictly increasing so the
    file stream source (maxFilesPerTrigger=1) replays them in order."""
    src = os.path.join(tmpdir, "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        path = os.path.join(src, f"batch_{i}.parquet")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        t = time.time() + i  # strictly increasing per batch
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(path, (t, t))
    return src


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


TS0 = "2024-01-01 00:00:00"


def _t(minutes):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minutes)


def test_watermarked_dedup_bounds_state(spark, tmp_path):
    # batch 0: keys 1..5 @ t0 ; batch 1: same keys @ t0+5min (inside the
    # 10-min horizon -> dropped). The watermark only advances AFTER a
    # batch and expired state is purged at batch END (after that batch's
    # dedup check), so batch 2 pushes the watermark past t0+10min and
    # batch 3 triggers the purge; batch 4's re-sent keys then find no
    # state and re-emit.
    b0 = [(k, _t(0), 1) for k in range(1, 6)]
    b1 = [(k, _t(5), 2) for k in range(1, 6)]
    b2 = [(99, _t(120), 9)]
    b3 = [(98, _t(125), 8)]
    b4 = [(k, _t(130), 3) for k in range(1, 6)]
    src = _write_batches(spark, str(tmp_path), [b0, b1, b2, b3, b4])
    out = watermarked_dedup(_stream(spark, src), ["k"], "ts", delay="10 minutes")
    _run_to_memory(out, "wm_dedup")
    rows = spark.sql("SELECT k, v FROM wm_dedup").collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r.v, set()).add(r.k)
    # first occurrence of every key emitted; in-horizon duplicates dropped
    assert by_v.get(1) == {1, 2, 3, 4, 5}
    assert 2 not in by_v
    # beyond the horizon the key state has expired: duplicates re-emit —
    # the bounded-state trade (reference kept state forever instead)
    assert by_v.get(3) == {1, 2, 3, 4, 5}


def test_windowed_stats_append_emits_closed_windows(spark, tmp_path):
    # two 1-hour windows of data, then a batch far ahead that advances
    # the watermark past both; late row older than the watermark dropped
    b0 = [(1, _t(10), 10), (2, _t(20), 20), (3, _t(70), 30)]
    b1 = [(4, _t(600), 40)]  # watermark -> 590min: closes both windows
    b2 = [(5, _t(15), 99)]  # late beyond watermark: dropped by policy
    src = _write_batches(spark, str(tmp_path), [b0, b1, b2])
    out = windowed_stream_stats(
        _stream(spark, src), "ts", "v", window_duration="1 hour", delay="10 minutes"
    )
    _run_to_memory(out, "wm_windows")
    got = {
        (r.window_start.hour, r.n_rows, r.sum_value, r.min_value, r.max_value)
        for r in spark.sql("SELECT * FROM wm_windows").collect()
    }
    assert (0, 2, 30, 10, 20) in got  # hour-0 window: rows @10,@20 only
    assert (1, 1, 30, 30, 30) in got  # hour-1 window
    # the late row (v=99) must not have landed anywhere
    assert not any(t[3] == 99 or t[4] == 99 for t in got)


def test_windowed_stats_matches_batch_for_closed_windows(spark, tmp_path):
    # batch oracle over the same rows for the windows the stream emitted
    b0 = [(k, _t(k), k * 10) for k in range(1, 50)]
    b1 = [(99, _t(600), 1)]
    src = _write_batches(spark, str(tmp_path), [b0, b1])
    out = windowed_stream_stats(
        _stream(spark, src), "ts", "v", window_duration="30 minutes", delay="5 minutes"
    )
    _run_to_memory(out, "wm_eq")
    got = {
        (str(r.window_start), r.n_rows, r.sum_value)
        for r in spark.sql("SELECT * FROM wm_eq").collect()
    }
    static = spark.createDataFrame(b0 + b1, SCHEMA)
    want_all = {
        (str(r.window_start), r.n_rows, r.sum_value)
        for r in (
            static.groupBy(F.window("ts", "30 minutes").alias("__w"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("v").alias("sum_value"),
            )
            .select(
                F.col("__w.start").alias("window_start"), "n_rows", "sum_value"
            )
            .collect()
        )
    }
    # every emitted window matches the batch computation exactly
    assert got <= want_all
    # and all closed windows did emit (only the final window may be open)
    assert len(got) >= len(want_all) - 1


def test_sliding_stats_overlapping_windows_match_batch(spark, tmp_path):
    # 1h windows sliding by 30min: each event lands in 2 windows
    b0 = [(1, _t(10), 10), (2, _t(40), 20), (3, _t(70), 30)]
    b1 = [(4, _t(600), 40)]  # advances watermark far past all of b0
    src = _write_batches(spark, str(tmp_path), [b0, b1])
    out = sliding_stream_stats(
        _stream(spark, src),
        "ts",
        "v",
        window_duration="1 hour",
        slide="30 minutes",
        delay="10 minutes",
    )
    _run_to_memory(out, "wm_slide")
    got = {
        (str(r.window_start), r.n_rows, r.min_value, r.max_value)
        for r in spark.sql("SELECT * FROM wm_slide").collect()
    }
    static = spark.createDataFrame(b0 + b1, SCHEMA)
    want_all = {
        (str(r.window_start), r.n_rows, r.min_value, r.max_value)
        for r in (
            static.groupBy(F.window("ts", "1 hour", "30 minutes").alias("__w"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("v").alias("min_value"),
                F.max("v").alias("max_value"),
            )
            .select(
                F.col("__w.start").alias("window_start"),
                "n_rows",
                "min_value",
                "max_value",
            )
            .collect()
        )
    }
    assert got <= want_all
    # all four closed windows over b0 emitted (event @10min is in the
    # [-30,30) and [0,60) windows; @40 in [0,60)+[30,90); @70 in
    # [30,90)+[60,120)) — only the final windows around t=600 stay open
    closed = {t for t in want_all if "10:" not in t[0]}
    assert len(got) >= len(closed) - 2


def test_session_stats_gap_merge(spark, tmp_path):
    # user 1: events at 0,10,20 (one session), then 100 (new session);
    # user 2: single event at 5
    b0 = [(1, _t(0), 0), (1, _t(10), 0), (1, _t(20), 0), (2, _t(5), 0)]
    b1 = [(1, _t(100), 0)]
    b2 = [(9, _t(600), 0)]  # close everything
    src = _write_batches(spark, str(tmp_path), [b0, b1, b2])
    out = session_stream_stats(
        _stream(spark, src), "ts", "k", gap="30 minutes", delay="10 minutes"
    )
    _run_to_memory(out, "wm_sess")
    rows = spark.sql("SELECT * FROM wm_sess").collect()
    got = {(r.k, str(r.session_start), str(r.session_end), r.n_rows) for r in rows}
    # user 1 session A: [0, 20+30) with 3 rows; session B: [100, 130) 1 row
    assert (1, "2024-01-01 00:00:00", "2024-01-01 00:50:00", 3) in got
    assert (1, "2024-01-01 01:40:00", "2024-01-01 02:10:00", 1) in got
    # user 2: single-event session [5, 35)
    assert (2, "2024-01-01 00:05:00", "2024-01-01 00:35:00", 1) in got
