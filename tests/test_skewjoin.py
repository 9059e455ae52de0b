"""Salted skew join (operators/skewjoin.py): result equivalence with
the plain join (rows AND multiplicities), outer-join null rows, salt
distribution, and plan shape."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.skewjoin import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (0) carrying 80% of the fact rows + a tail, dup rows
    # included so multiplicity preservation is actually exercised
    fact = spark.createDataFrame(
        [(0, i % 7) for i in range(800)]
        + [(k, k) for k in range(1, 50)]
        + [(3, 3), (3, 3)],  # duplicate fact rows
        ["k", "v"],
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 40)] + [(0, "name0-dup")],
        ["k", "name"],
    )
    return fact, dim


def _counted(df):
    return {tuple(r): c for *r, c in (
        df.groupBy(*df.columns).count().collect()
    )}


def test_inner_matches_plain_join(skewed):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], "inner")
    salted = salted_join(fact, dim, ["k"], n_salts=5, how="inner")
    assert salted.columns == plain.columns
    assert _counted(salted) == _counted(plain)


def test_left_outer_matches_plain_join(skewed):
    fact, dim = skewed
    # shrink dim so some fact keys miss -> null name rows must survive
    small_dim = dim.where(F.col("k") < 10)
    plain = fact.join(small_dim, ["k"], "left_outer")
    salted = salted_join(fact, small_dim, ["k"], n_salts=4, how="left_outer")
    assert _counted(salted) == _counted(plain)


def test_multi_key_join(spark):
    fact = spark.createDataFrame([(1, "a", 10), (1, "b", 20), (2, "a", 30)], ["k1", "k2", "v"])
    dim = spark.createDataFrame([(1, "a", "x"), (2, "a", "y")], ["k1", "k2", "d"])
    plain = fact.join(dim, ["k1", "k2"], "inner")
    salted = salted_join(fact, dim, ["k1", "k2"], n_salts=3)
    assert _counted(salted) == _counted(plain)


def test_salt_actually_spreads_hot_key(skewed):
    fact, dim = skewed
    n = 5
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n)).cast("int")
    dist = (
        fact.where(F.col("k") == 0)
        .withColumn("s", salt)
        .groupBy("s")
        .count()
        .collect()
    )
    # the hot key's rows land on >1 salt value (deterministic given data)
    assert len(dist) > 1


def test_n_salts_one_degenerates_to_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], "inner")
    salted = salted_join(fact, dim, ["k"], n_salts=1)
    assert _counted(salted) == _counted(plain)


def test_validation(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, [], 4)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["nope"], 4)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], 0)
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], 4, how="right_outer")


def test_join_exchanges_on_salt(spark, sf_dir):
    """The shuffle keys must include the salt: that IS the skew fix.
    Broadcast would bypass the shuffle entirely, so pin a sort-merge
    join for the plan assert."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "user_id"
    )
    out = salted_join(
        ev.hint("merge"), cust.select("user_id", "c_name"), ["user_id"], n_salts=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    # result sanity on real tables
    plain = ev.join(cust.select("user_id", "c_name"), ["user_id"], "inner")
    assert out.count() == plain.count()
