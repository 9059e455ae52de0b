"""Streaming observability (streaming/monitor.py): metrics from a real
stateful query, empty-progress behavior."""

import os
import time
import uuid

from pyspark.sql import functions as F

from pyspark_skyline_spark.streaming.monitor import query_metrics


def test_query_metrics_on_stateful_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(i, i % 5) for i in range(200)]
    spark.createDataFrame(rows, "event_id long, user_id long").coalesce(1).write.parquet(
        src + "/b0.parquet"
    )
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .parquet(src + "/*")
        .dropDuplicates(["user_id"])  # stateful: 5 distinct keys buffered
    )
    name = f"mon_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    m = query_metrics(q)
    assert m["n_batches"] >= 1
    assert m["input_rows"] == 200
    assert m["state_rows"] == 5  # the dedup state: one row per key
    assert m["state_bytes"] > 0
    assert m["avg_batch_ms"] > 0
    assert m["rows_per_sec"] > 0


def test_query_metrics_empty_progress():
    class _Fake:
        recentProgress = []

    m = query_metrics(_Fake())
    assert m["n_batches"] == 0 and m["input_rows"] == 0
