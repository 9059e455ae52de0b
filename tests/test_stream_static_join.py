"""Stream-static enrichment join (streaming/joins.py): stateless
micro-batch lookup against a static dimension — availableNow replay ==
batch join, left-outer keeps unmatched stream rows, and the dimension
side broadcasts."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.streaming.joins import stream_static_join

SCHEMA = "event_id long, user_id long, value double"


def _stream_of(spark, tmp_path, rows):
    src = os.path.join(str(tmp_path), "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(SCHEMA).parquet(src)


def _collect_stream(spark, df):
    name = f"enr_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


ROWS = [(1, 10, 1.0), (2, 11, 2.0), (3, 99, 3.0), (4, 10, 4.0)]
DIM = [(10, "alice"), (11, "bob"), (12, "carol")]


def test_inner_enrichment_matches_batch(spark, tmp_path):
    stream = _stream_of(spark, tmp_path, ROWS)
    dim = spark.createDataFrame(DIM, ["user_id", "name"])
    out = _collect_stream(
        spark, stream_static_join(stream, dim, ["user_id"], how="inner")
    )
    batch = spark.createDataFrame(ROWS, SCHEMA).join(dim, ["user_id"], "inner")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}
    assert out.count() == 3  # user 99 unmatched


def test_left_outer_keeps_unmatched_stream_rows(spark, tmp_path):
    stream = _stream_of(spark, tmp_path, ROWS)
    dim = spark.createDataFrame(DIM, ["user_id", "name"])
    out = _collect_stream(
        spark, stream_static_join(stream, dim, ["user_id"], how="left_outer")
    )
    rows = {r.event_id: r.name for r in out.collect()}
    assert rows[3] is None and rows[1] == "alice"
    assert len(rows) == 4


def test_dimension_broadcasts(spark, sf_dir):
    """The batch form of the same join (identical plan construction)
    must be a BroadcastHashJoin — no shuffle of the fact side."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .withColumnRenamed("c_custkey", "user_id")
        .select("user_id", "c_name")
    )
    out = stream_static_join(ev, cust, ["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validation(spark, tmp_path):
    stream = _stream_of(spark, tmp_path, ROWS)
    dim = spark.createDataFrame(DIM, ["user_id", "name"])
    with pytest.raises(ValueError):
        stream_static_join(stream, dim, [], how="inner")
    with pytest.raises(ValueError):
        stream_static_join(stream, dim, ["nope"])
    with pytest.raises(ValueError):
        stream_static_join(stream, dim, ["user_id"], how="full_outer")
