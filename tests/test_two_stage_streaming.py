"""Composed two-stage topology (stateful per-cell stage 1 -> foreachBatch
global merge): the Spark-native equivalent of the reference's concurrent
stream_job pipeline (src/jobs/stream_job.py:87-206). Prefix-consistency:
after any set of micro-batches the global frontier equals the batch
skyline of the rows ingested so far."""

import time

from pyspark.sql import functions as F

from pyspark_skyline_spark import skyline
from pyspark_skyline_spark.operators.skyline import _compute_bounds
from pyspark_skyline_spark.streaming.two_stage import run_two_stage_skyline_stream

DIMS = [("o_totalprice", "max"), ("o_orderdate", "min")]


def _frontier_set(df):
    return {
        (r.o_totalprice, r.o_orderdate)
        for r in df.select("o_totalprice", "o_orderdate").dropDuplicates().collect()
    }


def test_two_stage_available_now_matches_batch(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = str(tmp_path / "orders_stream")
    orders.repartition(3).write.parquet(src)  # 3 files -> >=3 micro-batches
    bounds = _compute_bounds(orders, DIMS)

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state, query = run_two_stage_skyline_stream(stream, DIMS, bounds, partitions=8)
    query.awaitTermination()

    assert _frontier_set(state.result()) == _frontier_set(skyline(orders, DIMS))


def test_two_stage_processing_time_prefix_consistent(spark, sf_dir, tmp_path):
    # continuous (processingTime) mode, files arriving mid-stream: the
    # global frontier must equal the batch skyline of each prefix
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").orderBy("o_orderkey")
    half1 = orders.limit(400)
    half2 = orders.subtract(half1).limit(400)
    bounds = _compute_bounds(orders, DIMS)

    src = tmp_path / "orders_cont"
    half1.coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state, query = run_two_stage_skyline_stream(
        stream, DIMS, bounds, partitions=8, processing_time="1 second"
    )
    try:
        query.processAllAvailable()
        assert _frontier_set(state.result()) == _frontier_set(skyline(half1, DIMS))

        # second batch arrives while the query is live
        half2.coalesce(1).write.mode("append").parquet(str(src))
        deadline = time.time() + 60
        want = _frontier_set(skyline(half1.unionByName(half2), DIMS))
        while time.time() < deadline:
            query.processAllAvailable()
            if state.current is not None and _frontier_set(state.result()) == want:
                break
            time.sleep(0.5)
        assert _frontier_set(state.result()) == want
    finally:
        query.stop()
