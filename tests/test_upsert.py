"""Keyed merge/upsert (operators/upsert.py): update/insert/passthrough
semantics, latest-wins ordering, tombstones, duplicate-key rejection,
and the broadcast-anti-join plan on the snapshot side."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.upsert import merge_upsert

CUR = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
COLS = ["k", "name", "v"]


@pytest.fixture(scope="module")
def cur(spark):
    return spark.createDataFrame(CUR, COLS)


def test_update_insert_passthrough(spark, cur):
    upd = spark.createDataFrame([(2, "B", 21.0), (9, "i", 90.0)], COLS)
    out = {tuple(r) for r in merge_upsert(cur, upd, ["k"]).collect()}
    assert out == {(1, "a", 10.0), (2, "B", 21.0), (3, "c", 30.0), (9, "i", 90.0)}


def test_latest_wins_with_order_col(spark, cur):
    upd = spark.createDataFrame(
        [(2, "old", 1.0), (2, "new", 2.0), (2, "mid", 1.5)], COLS
    )
    out = {tuple(r) for r in merge_upsert(cur, upd, ["k"], order_col="v").collect()}
    assert (2, "new", 2.0) in out and len(out) == 3


def test_duplicate_update_keys_rejected_without_order(spark, cur):
    upd = spark.createDataFrame([(2, "x", 1.0), (2, "y", 2.0)], COLS)
    with pytest.raises(ValueError, match="duplicate update keys"):
        merge_upsert(cur, upd, ["k"])


def test_tombstone_deletes_key(spark, cur):
    upd = spark.createDataFrame(
        [(2, "B", 21.0, False), (3, None, 0.0, True), (9, "i", 90.0, None)],
        COLS + ["deleted"],
    )
    out = {tuple(r) for r in merge_upsert(cur, upd, ["k"], delete_col="deleted").collect()}
    # key 3 tombstoned; NULL delete flag means keep
    assert out == {(1, "a", 10.0), (2, "B", 21.0), (9, "i", 90.0)}


def test_latest_delete_wins_over_earlier_update(spark, cur):
    upd = spark.createDataFrame(
        [(2, "resurrect", 1.0, False), (2, "kill", 2.0, True)], COLS + ["deleted"]
    )
    out = {
        tuple(r)
        for r in merge_upsert(
            cur, upd, ["k"], order_col="v", delete_col="deleted"
        ).collect()
    }
    assert out == {(1, "a", 10.0), (3, "c", 30.0)}  # key 2 gone


def test_schema_mismatch_rejected(spark, cur):
    upd = spark.createDataFrame([(1, "a")], ["k", "name"])
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(cur, upd, ["k"])


def test_multi_key_and_column_order_insensitive(spark):
    cur = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], ["k1", "k2", "v"])
    upd = spark.createDataFrame([(3.0, 1, "y")], ["v", "k1", "k2"])
    out = {tuple(r) for r in merge_upsert(cur, upd, ["k1", "k2"]).collect()}
    assert out == {(1, "x", 1.0), (1, "y", 3.0)}


def test_snapshot_side_broadcast_anti_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    upd = orders.where(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    out = merge_upsert(orders, upd, ["o_orderkey"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert out.count() == orders.count()
    bumped = out.join(upd.select("o_orderkey"), ["o_orderkey"]).agg(
        F.min("o_totalprice")
    ).first()[0]
    assert bumped >= 1000.0


def test_scd2_history_intervals(spark):
    import datetime

    from pyspark_skyline_spark.operators.upsert import scd2_history

    def ts(d):
        return datetime.datetime(2024, 1, d)

    rows = [
        (1, "a", ts(1)), (1, "b", ts(5)), (1, "c", ts(9)),
        (2, "x", ts(3)),
    ]
    df = spark.createDataFrame(rows, "k long, v string, ts timestamp")
    out = {(r.k, r.v): (r.valid_from, r.valid_to, r.is_current)
           for r in scd2_history(df, ["k"], "ts").collect()}
    assert out[(1, "a")] == (ts(1), ts(5), False)
    assert out[(1, "b")] == (ts(5), ts(9), False)
    assert out[(1, "c")] == (ts(9), None, True)
    assert out[(2, "x")] == (ts(3), None, True)
    # exactly one current version per key
    cur = [kv for kv, (_, _, c) in out.items() if c]
    assert sorted(k for k, _ in cur) == [1, 2]


def test_scd2_history_rejects_tied_versions(spark):
    import datetime

    from pyspark_skyline_spark.operators.upsert import scd2_history

    t = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame([(1, "a", t), (1, "b", t)], "k long, v string, ts timestamp")
    with pytest.raises(ValueError, match="duplicate"):
        scd2_history(df, ["k"], "ts")
    with pytest.raises(ValueError, match="already present"):
        scd2_history(
            df.withColumnRenamed("v", "is_current"), ["k"], "ts"
        )


def test_snapshot_diff_statuses(spark):
    """snapshot_diff: added/removed/changed/unchanged per key; NULL->
    value and value->NULL are changed, NULL->NULL is unchanged
    (null-safe compare); compare_cols defaults to shared non-keys;
    validation raises on missing keys/columns."""
    import pytest as _pt

    from pyspark_skyline_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, None, 40), (5, "e", 50)],
        "id long, txt string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", None), (4, "D", 40), (5, None, 50), (6, "f", 60)],
        "id long, txt string, v int",
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "unchanged",  # NULL -> NULL in v
        4: "changed",    # NULL -> 'D' in txt
        5: "changed",    # 'e' -> NULL in txt
        6: "added",
    }
    # restricting compare_cols flips 4/5 to unchanged (txt excluded)
    got_v = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"], compare_cols=["v"]).collect()
    }
    assert got_v[4] == "unchanged" and got_v[5] == "unchanged"

    with _pt.raises(ValueError, match="keys must be non-empty"):
        snapshot_diff(old, new, [])
    with _pt.raises(ValueError, match="must exist in both"):
        snapshot_diff(old, new.drop("v"), ["id"], compare_cols=["v"])


def test_snapshot_diff_duplicate_keys_raise(spark):
    """Duplicate keys in either snapshot raise loudly by default (the
    module convention), with assume_unique=True as the explicit
    skip-the-check fast path."""
    import pytest as _pt

    from pyspark_skyline_spark.operators.upsert import snapshot_diff

    clean = spark.createDataFrame([(1, "a")], "id long, txt string")
    duped = spark.createDataFrame([(1, "a"), (1, "b")], "id long, txt string")
    with _pt.raises(ValueError, match="duplicate keys in new"):
        snapshot_diff(clean, duped, ["id"])
    with _pt.raises(ValueError, match="duplicate keys in old"):
        snapshot_diff(duped, clean, ["id"])
    # the escape hatch skips the guard (caller owns the contract)
    assert snapshot_diff(clean, duped, ["id"], assume_unique=True).count() == 2
