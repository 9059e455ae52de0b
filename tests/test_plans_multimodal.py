"""Plan audits (pushdown/broadcast/pruning hold at any scale) +
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators import multimodal as M
from pyspark_skyline_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    formatted_plan,
    scan_read_schema,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    assert_pushed_filters(q, "GreaterThan(l_quantity,40.0")


def test_column_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    schema_line = scan_read_schema(q, "lineitem")
    assert "l_extendedprice" not in schema_line
    assert "l_orderkey" in schema_line


def test_join_skyline_uses_broadcast(spark, sf_dir):
    from pyspark_skyline_spark.entry_ext import _q_join_skyline_customer_nation

    assert_broadcast_join(_q_join_skyline_customer_nation(spark, sf_dir))


def test_skyline_plan_has_no_python_udf_before_grouping(spark, sf_dir):
    """Partition keying must be native expressions: the only Python
    stages allowed are the applyInPandas kernels (FlatMapGroupsInPandas),
    never row-wise BatchEvalPython (the reference's bottleneck)."""
    from pyspark_skyline_spark import skyline

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for algo in ("MR_DIM", "MR_GRID", "MR_ANGLE"):
        plan = formatted_plan(
            skyline(li, [("l_extendedprice", "min"), ("l_quantity", "max")], algo=algo)
        )
        assert "BatchEvalPython" not in plan, plan
        assert "FlatMapGroupsInPandas" in plan


def test_multimodal_decode_fake(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = M.decode_media_meta(M.with_blob(docs, "text"), "doc_id").collect()
    assert len(out) == 10
    for r in out:
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert r.format in ("png", "jpeg", "webp")
        assert r.n_bytes > 0


def test_multimodal_decode_strict_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        M.decode_media_meta(M.with_blob(docs, "text"), "doc_id", decode_mode="strict").collect()


def test_multimodal_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    a = sorted(tuple(r) for r in M.decode_media_meta(M.with_blob(docs, "text"), "doc_id").collect())
    b = sorted(tuple(r) for r in M.decode_media_meta(M.with_blob(docs, "text"), "doc_id").collect())
    assert a == b
