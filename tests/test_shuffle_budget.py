"""Shuffle budgets: each operator's physical plan must not exchange
more than its documented cost model says — the machine-checkable form
of 'would this plan survive a 100x scale-up'. Broadcast exchanges are
deliberately excluded from the count (they ship the small side only);
a failure here means an operator silently grew a full-data shuffle."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.plans.explain import assert_max_exchanges, count_exchanges


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_sessionize_one_shuffle(events):
    from pyspark_skyline_spark.operators.sample import sessionize

    # both windows partition by user -> ONE exchange total
    assert_max_exchanges(sessionize(events, "user_id", "ts"), 1)


def test_samplers_zero_shuffles(orders):
    from pyspark_skyline_spark.operators.sample import (
        hash_sample,
        split_dataset,
        weighted_sample,
    )

    assert count_exchanges(hash_sample(orders, ["o_orderkey"], 0.1)) == 0
    assert count_exchanges(split_dataset(orders, ["o_orderkey"])) == 0
    assert count_exchanges(
        weighted_sample(orders, ["o_orderkey"], F.lit(0.5))
    ) == 0


def test_filtering_ops_zero_shuffles(spark, sf_dir):
    from pyspark_skyline_spark.operators.filtering import pii_scrub, repetition_stats
    from pyspark_skyline_spark.operators.jsonx import json_extract

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert count_exchanges(repetition_stats(docs)) == 0
    assert count_exchanges(pii_scrub(docs)) == 0
    assert count_exchanges(json_extract(events, "props", [("k", "$.k", "bigint")])) == 0


def test_merge_upsert_snapshot_never_shuffles(orders):
    """The snapshot side must reach the sink via broadcast anti-join +
    union only. The two allowed exchanges are BOTH the (small) update
    batch's dedup-window subtree — it feeds two consumers (the union
    branch and the broadcast key list), so Spark plans it twice; the
    snapshot itself contributes zero exchanges."""
    from pyspark_skyline_spark.operators.upsert import merge_upsert

    upd = orders.where(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    merged = merge_upsert(orders, upd, ["o_orderkey"], order_col="o_totalprice")
    assert_max_exchanges(merged, 2)
    # without an order_col (pre-verified unique batch) there is no
    # window at all: a fully shuffle-free merge
    upd_unique = upd  # o_orderkey is unique in orders, so also in upd
    assert count_exchanges(merge_upsert(orders, upd_unique, ["o_orderkey"])) == 0


def test_scd2_one_shuffle(events):
    from pyspark_skyline_spark.operators.upsert import scd2_history

    assert_max_exchanges(
        scd2_history(events.select("user_id", "event_id", "ts"), ["user_id"], "ts"), 1
    )


def test_rolling_and_topk_one_shuffle(events, orders):
    from pyspark_skyline_spark.operators.topk import top_k_per_group

    assert_max_exchanges(
        top_k_per_group(orders, ["o_custkey"], [F.col("o_totalprice").desc()], 3), 1
    )


def test_resample_budget(events):
    """bucket agg + per-group bounds + grid join + ffill window: the
    documented budget is 4 exchanges (bounds/grid/agg each shuffle on
    the group key; AQE may reuse but must not exceed)."""
    from pyspark_skyline_spark.operators.resample import resample

    out = resample(events, "ts", "1 hour", by=["event_type"], fill="prev")
    assert_max_exchanges(out, 4)


def test_heavy_hitters_budget(events):
    from pyspark_skyline_spark.operators.diagnostics import heavy_hitters, skew_stats

    # hash agg (1 exchange) + TakeOrdered (no full sort exchange)
    assert_max_exchanges(heavy_hitters(events, ["user_id"]), 1)
    assert_max_exchanges(skew_stats(events, ["user_id"]), 2)


def test_stream_static_enrichment_zero_shuffles(events, spark, sf_dir):
    from pyspark_skyline_spark.streaming.joins import stream_static_join

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .withColumnRenamed("c_custkey", "user_id")
        .select("user_id", "c_name")
    )
    assert count_exchanges(stream_static_join(events, cust, ["user_id"])) == 0
