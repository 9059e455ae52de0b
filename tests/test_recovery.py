"""Restart/recovery: (1) the foreachBatch skyline resumes from its
persisted frontier + engine checkpoint without reprocessing committed
batches, (2) frontier updates are idempotent under at-least-once
replay, (3) the engine's own state store recovers a dropDuplicates
stream into an exactly-once file sink across a restart."""

import os
import time

from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.skyline import skyline
from pyspark_skyline_spark.streaming.skyline_stream import run_skyline_stream

SCHEMA = "x1 long, x2 long"


def _write_batch(spark, src, name, rows, schema=SCHEMA, when=None):
    os.makedirs(src, exist_ok=True)
    path = os.path.join(src, name)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)
    t = when or time.time()
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))
    os.utime(path, (t, t))
    return path


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )


BATCH0 = [(1, 9), (2, 8), (5, 5), (9, 1), (7, 7)]
BATCH1 = [(0, 10), (3, 3), (10, 0), (6, 6)]
DIMS = [("x1", "min"), ("x2", "min")]


def _frontier_set(df):
    return {(r.x1, r.x2) for r in df.select("x1", "x2").collect()}


def test_skyline_stream_restart_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    _write_batch(spark, src, "b0.parquet", BATCH0, when=time.time())

    state1, q1 = run_skyline_stream(
        _stream(spark, src), DIMS, state_dir=state_dir, checkpoint_dir=chk
    )
    q1.awaitTermination(180)
    want0 = _frontier_set(skyline(spark.createDataFrame(BATCH0, SCHEMA), DIMS))
    assert _frontier_set(state1.result()) == want0
    v_after_first = state1._version
    assert v_after_first >= 1

    # "process restart": a brand-new state object recovers from disk,
    # the engine checkpoint skips the committed batch 0
    _write_batch(spark, src, "b1.parquet", BATCH1, when=time.time() + 5)
    state2, q2 = run_skyline_stream(
        _stream(spark, src), DIMS, state_dir=state_dir, checkpoint_dir=chk
    )
    q2.awaitTermination(180)
    all_rows = spark.createDataFrame(BATCH0 + BATCH1, SCHEMA)
    assert _frontier_set(state2.result()) == _frontier_set(skyline(all_rows, DIMS))
    # exactly one new update ran (batch 1 only — batch 0 not reprocessed)
    assert state2._version == v_after_first + 1


def test_skyline_stream_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay: a fresh engine checkpoint replays ALL
    source files against an already-populated frontier — the result
    must be unchanged (the property that upgrades at-least-once
    delivery to an exactly-once result)."""
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    _write_batch(spark, src, "b0.parquet", BATCH0)
    _write_batch(spark, src, "b1.parquet", BATCH1, when=time.time() + 5)

    state1, q1 = run_skyline_stream(
        _stream(spark, src), DIMS, state_dir=state_dir,
        checkpoint_dir=str(tmp_path / "chk1"),
    )
    q1.awaitTermination(180)
    want = _frontier_set(state1.result())

    # new checkpoint => full replay; frontier recovered from state_dir
    state2, q2 = run_skyline_stream(
        _stream(spark, src), DIMS, state_dir=state_dir,
        checkpoint_dir=str(tmp_path / "chk2"),
    )
    q2.awaitTermination(180)
    assert _frontier_set(state2.result()) == want
    all_rows = spark.createDataFrame(BATCH0 + BATCH1, SCHEMA)
    assert want == _frontier_set(skyline(all_rows, DIMS))


def test_engine_state_store_recovery_dedup_sink(spark, tmp_path):
    """Engine-native recovery: streaming dropDuplicates + parquet sink
    + checkpoint. After a stop/restart with new data, duplicates seen
    BEFORE the restart are still suppressed (state store recovered)
    and the sink holds each key exactly once."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    _write_batch(spark, src, "b0.parquet", [(1, 1), (2, 2), (3, 3)], when=time.time())

    def run():
        stream = _stream(spark, src).dropDuplicates(["x1"])
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    # keys 2,3 are cross-restart duplicates; 4,5 are new
    _write_batch(
        spark, src, "b1.parquet", [(2, 9), (3, 9), (4, 4), (5, 5)],
        when=time.time() + 5,
    )
    run()
    out = spark.read.parquet(sink)
    keys = [r.x1 for r in out.select("x1").collect()]
    assert sorted(keys) == [1, 2, 3, 4, 5]  # exactly once each
    # the retained rows for 2 and 3 are the FIRST-seen ones
    vals = {r.x1: r.x2 for r in out.collect()}
    assert vals[2] == 2 and vals[3] == 3


def test_epoch_sink_exactly_once_under_replay(spark, tmp_path):
    """foreachBatch epoch sink: a replayed epoch is skipped; a crashed
    partial write (no _SUCCESS) is overwritten; readers see each epoch
    exactly once."""
    from pyspark_skyline_spark.streaming.sinks import (
        epoch_sink,
        write_epoch_idempotent,
    )

    out = str(tmp_path / "epochs")
    b0 = spark.createDataFrame([(1, 1), (2, 2)], SCHEMA)
    assert write_epoch_idempotent(b0, 0, out) is True
    # replay of a committed epoch: skipped even with different data
    b0_replay = spark.createDataFrame([(9, 9)], SCHEMA)
    assert write_epoch_idempotent(b0_replay, 0, out) is False
    # crashed partial attempt: remove the commit marker -> rewrite wins
    assert write_epoch_idempotent(spark.createDataFrame([(3, 3)], SCHEMA), 1, out)
    os.remove(os.path.join(out, "epoch=1", "_SUCCESS"))
    assert write_epoch_idempotent(spark.createDataFrame([(4, 4)], SCHEMA), 1, out)
    rows = {(r.x1, r.x2) for r in spark.read.option("recursiveFileLookup", "false")
            .parquet(out).collect()}
    assert rows == {(1, 1), (2, 2), (4, 4)}

    # end-to-end through a real stream: availableNow over two files
    src = str(tmp_path / "esrc")
    _write_batch(spark, src, "b0.parquet", [(1, 1)], when=time.time())
    _write_batch(spark, src, "b1.parquet", [(2, 2)], when=time.time() + 3)
    sink_dir = str(tmp_path / "esink")
    q = (
        _stream(spark, src)
        .writeStream.foreachBatch(epoch_sink(sink_dir))
        .option("checkpointLocation", str(tmp_path / "echk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.x1, r.x2) for r in spark.read.parquet(sink_dir).collect()}
    assert got == {(1, 1), (2, 2)}
