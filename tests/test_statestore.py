"""RocksDB state-store opt-in (streaming/statestore.py): the stateful
skyline paths must run and RECOVER on the RocksDB provider — the
provider a 100 TB deployment would pin — with changelog checkpoint
artifacts proving the provider actually engaged."""

import glob
import os
import time
import pytest

from pyspark_skyline_spark.operators.skyline import _compute_bounds, skyline
from pyspark_skyline_spark.streaming.statestore import (
    ROCKSDB_PROVIDER,
    configure_state_store,
)
from pyspark_skyline_spark.streaming.windowed import windowed_stream_skyline

SCHEMA = "event_id long, ts timestamp, value double"
DIMS = [("value", "max"), ("event_id", "min")]


def _rows(ids, day):
    import datetime as dt

    return [
        (i, dt.datetime(2024, 1, day, 1 + (i % 20), 0, 0), float(100 - i))
        for i in ids
    ]


def _write_batch(spark, src, name, rows, when=None):
    os.makedirs(src, exist_ok=True)
    path = os.path.join(src, name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    t = when or time.time()
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))
    os.utime(path, (t, t))


@pytest.fixture
def rocksdb_session(spark):
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    got = configure_state_store(spark, "rocksdb")
    assert got == ROCKSDB_PROVIDER
    yield spark
    if old is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_configure_state_store_validates(spark):
    with pytest.raises(ValueError):
        configure_state_store(spark, "leveldb")


def _run(spark, src, chk, sink, bounds):
    # memory sink refuses checkpoint recovery; a foreachBatch parquet
    # append survives restarts and accumulates both runs' emissions
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    out = windowed_stream_skyline(
        stream, "ts", "1 day", DIMS, bounds, delay="3650 days", partitions=4
    )

    def write(batch_df, _epoch):
        batch_df.select("window_start", "value", "event_id").write.mode(
            "append"
        ).parquet(sink)

    q = (
        out.writeStream.foreachBatch(write)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(sink)


def test_windowed_skyline_recovers_on_rocksdb(rocksdb_session, tmp_path):
    """Two-run restart on the RocksDB provider: run 2 must resume from
    the RocksDB-checkpointed frontier state (not reprocess batch 0) and
    the union of update emissions must reduce to the batch answer."""
    spark = rocksdb_session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    b0, b1 = _rows(range(0, 30), day=3), _rows(range(30, 60), day=3)
    _write_batch(spark, src, "b0.parquet", b0)

    bounds = _compute_bounds(spark.createDataFrame(b0 + b1, SCHEMA), DIMS)
    sink = str(tmp_path / "sink")
    em1 = _run(spark, src, chk, sink, bounds)
    assert em1.count() > 0

    # provider engaged: RocksDB changelog/zip artifacts in the state dir
    arts = glob.glob(f"{chk}/state/**/*.changelog", recursive=True) + glob.glob(
        f"{chk}/state/**/*.zip", recursive=True
    )
    assert arts, f"no RocksDB state artifacts under {chk}/state"

    _write_batch(spark, src, "b1.parquet", b1, when=time.time() + 5)
    emitted = _run(spark, src, chk, sink, bounds)

    reduced = skyline(
        emitted.select("window_start", "value", "event_id"), DIMS, by=["window_start"]
    )
    want = skyline(spark.createDataFrame(b0 + b1, SCHEMA), DIMS)
    got = {(r.value, r.event_id) for r in reduced.collect()}
    assert got == {(r.value, r.event_id) for r in want.collect()}
