"""applyInPandasWithState per-cell skyline: multi-batch file stream,
global frontier from union of emissions equals batch skyline."""

from pyspark.sql import functions as F

from pyspark_skyline_spark import skyline
from pyspark_skyline_spark.operators.skyline import _compute_bounds
from pyspark_skyline_spark.streaming.stateful import stateful_cell_skyline

DIMS = [("o_totalprice", "max"), ("o_orderdate", "min")]


def test_stateful_cell_skyline_matches_batch(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # multi-file input -> multiple micro-batches
    src = str(tmp_path / "orders_stream")
    orders.repartition(3).write.parquet(src)
    bounds = _compute_bounds(orders, [(c, s) for c, s in DIMS])

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_cell_skyline(stream, DIMS, bounds, partitions=8)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cell_frontiers")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM cell_frontiers").drop("__sky_cell")
    assert emitted.count() > 0
    got = skyline(emitted, DIMS)
    want = skyline(orders, DIMS)

    def fs(df):
        return {
            (r.o_totalprice, r.o_orderdate)
            for r in df.select("o_totalprice", "o_orderdate").dropDuplicates().collect()
        }

    assert fs(got) == fs(want)
