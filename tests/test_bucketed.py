"""Bucketed co-located joins: the equi-join of two same-bucketed tables
must plan WITHOUT a shuffle exchange on either side."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.plans.explain import formatted_plan
from pyspark_skyline_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders,
        "bktest.orders_b",
        ["o_custkey"],
        num_buckets=8,
        sort_cols=["o_custkey"],
        path=str(base / "orders_b"),
    )
    write_bucketed(
        customer,
        "bktest.customer_b",
        ["c_custkey"],
        num_buckets=8,
        sort_cols=["c_custkey"],
        path=str(base / "customer_b"),
    )
    yield "bktest.orders_b", "bktest.customer_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.customer_b")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    # disable broadcast so the planner MUST pick a sort-merge join —
    # the interesting case for bucketing (big x big at scale)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed(spark, t_orders)
        c = read_bucketed(spark, t_customer)
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join should not shuffle:\n" + plan
        )
        # result sanity vs the plain-parquet join
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_matches_plain_join(spark, sf_dir, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    o = read_bucketed(spark, t_orders)
    c = read_bucketed(spark, t_customer)
    got = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    po = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pc = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = (
        po.join(pc, po["o_custkey"] == pc["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.c_nationkey, r.n) for r in got.collect()} == {
        (r.c_nationkey, r.n) for r in want.collect()
    }
