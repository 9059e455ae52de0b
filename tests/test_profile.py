"""column_profile: one-pass dataset profiling."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.profile import column_profile


def test_column_profile_values(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "b"), (None, 20.0, None)],
        "k long, v double, s string",
    )
    prof = {r.column: r for r in column_profile(df).collect()}
    assert set(prof) == {"k", "v", "s"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["k"].n_nulls == 1 and prof["v"].n_nulls == 1 and prof["s"].n_nulls == 1
    assert prof["v"].min == 10.0 and prof["v"].max == 30.0
    assert prof["v"].mean == pytest.approx(20.0)
    assert prof["s"].min is None and prof["s"].mean is None  # non-numeric
    assert prof["k"].approx_distinct == 3  # exact at tiny cardinality


def test_column_profile_subset_and_validation(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = column_profile(orders, ["o_orderkey", "o_totalprice"])
    rows = {r.column: r for r in prof.collect()}
    n = orders.count()
    assert rows["o_orderkey"].n_rows == n and rows["o_orderkey"].n_nulls == 0
    # o_orderkey is unique: HLL at rsd=0.05 must land within 10%
    assert abs(rows["o_orderkey"].approx_distinct - n) <= 0.1 * n
    with pytest.raises(ValueError, match="not in DataFrame"):
        column_profile(orders, ["nope"])


def test_column_quantiles_exact_hand_computed(spark):
    from pyspark_skyline_spark.operators.profile import column_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "x double")
    got = {
        (r.column, r.p): r.value
        for r in column_quantiles(df, mode="exact").collect()
    }
    # exact interpolated quantiles of 1..5
    assert got[("x", 0.25)] == 2.0
    assert got[("x", 0.5)] == 3.0
    assert got[("x", 0.75)] == 4.0


def test_column_quantiles_approx_close_and_validation(spark):
    import pytest as _pt

    from pyspark_skyline_spark.operators.profile import column_quantiles

    df = spark.range(0, 10001).selectExpr("cast(id as double) as x")
    got = {
        r.p: r.value for r in column_quantiles(df, probs=(0.5,), mode="approx").collect()
    }
    assert abs(got[0.5] - 5000.0) < 50
    with _pt.raises(ValueError, match="not numeric"):
        column_quantiles(df.selectExpr("cast(x as string) as s"), ["s"])
    with _pt.raises(ValueError, match="mode"):
        column_quantiles(df, mode="sketchy")


def test_column_correlations_hand_computed(spark):
    import math

    from pyspark_skyline_spark.operators.profile import column_correlations

    # y = 2x exactly, z anti-correlated with x
    rows = [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0), (4.0, 8.0, 0.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r.col_a, r.col_b): r.corr for r in column_correlations(df).collect()}
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0
    assert len(out) == 3

    with pytest.raises(ValueError):
        column_correlations(df, ["x"])
    with pytest.raises(ValueError):
        column_correlations(df.select(F.col("x").cast("string").alias("x"), "y"))


def test_histogram_width_hand_computed(spark):
    from pyspark_skyline_spark.operators.profile import histogram

    df = spark.createDataFrame([(float(v),) for v in range(0, 100)], "x double")
    out = histogram(df, "x", bins=4).collect()
    assert [(r.bucket, r.lo, r.hi, r.n) for r in out] == [
        (0, 0.0, 24.75, 25),
        (1, 24.75, 49.5, 25),
        (2, 49.5, 74.25, 25),
        (3, 74.25, 99.0, 25),  # max closed into the last bucket
    ]


def test_histogram_depth_balances_skew(spark):
    from pyspark.sql import functions as F

    from pyspark_skyline_spark.operators.profile import histogram

    # heavy skew: 90% of mass near 0, a long tail to 1e6
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.col("id") % 100)
        .otherwise(F.col("id") * 100)
        .cast("double")
        .alias("x")
    )
    width = histogram(df, "x", bins=5).collect()
    depth = histogram(df, "x", bins=5, mode="depth").collect()
    # width mode: nearly everything in bucket 0
    assert width[0].n > 0.85 * 10_000
    # depth mode: every bucket carries a meaningful share
    assert all(r.n > 500 for r in depth)
    assert sum(r.n for r in depth) == 10_000


def test_histogram_edge_cases(spark):
    from pyspark_skyline_spark.operators.profile import histogram

    const = spark.createDataFrame([(5.0,), (5.0,), (None,)], "x double")
    out = histogram(const, "x", bins=3).collect()
    assert sum(r.n for r in out) == 2  # NULL excluded
    assert out[0].n == 2  # constant column collapses to bucket 0

    empty = spark.createDataFrame([], "x double")
    assert sum(r.n for r in histogram(empty, "x", bins=3).collect()) == 0

    with pytest.raises(ValueError):
        histogram(const, "x", bins=0)
    with pytest.raises(ValueError):
        histogram(const, "x", mode="log")
    bad = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError):
        histogram(bad, "s")


def test_categorical_mi_matches_hand_model(spark):
    """categorical_mi == hand-computed contingency MI; independent
    columns score ~0; a bijective copy scores exactly H(A); NULL rows
    are excluded; same-column call raises."""
    import math
    from collections import Counter

    from pyspark_skyline_spark.operators.profile import categorical_mi

    rows = [
        ("x", "p"), ("x", "p"), ("x", "q"),
        ("y", "q"), ("y", "q"), ("y", "p"),
        ("z", "r"), ("z", "r"), (None, "p"), ("x", None),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    clean = [(a, b) for a, b in rows if a is not None and b is not None]
    jc = Counter(clean)
    ac = Counter(a for a, _ in clean)
    bc = Counter(b for _, b in clean)
    n = len(clean)
    want = sum(
        (c / n) * math.log(c * n / (ac[a] * bc[b])) for (a, b), c in jc.items()
    )
    got = categorical_mi(df, "a", "b").collect()[0]
    assert abs(got["mi_nats"] - want) < 1e-9
    assert got["n_rows"] == n and got["n_a"] == 3 and got["n_b"] == 3

    # bijective dependence: MI == H(A) (here ln 2 for a 50/50 split)
    dep = spark.createDataFrame(
        [("u", "U"), ("u", "U"), ("v", "V"), ("v", "V")], "a string, b string"
    )
    got2 = categorical_mi(dep, "a", "b").collect()[0]
    assert abs(got2["mi_nats"] - math.log(2)) < 1e-12

    # independence: uniform product table -> MI exactly 0 by symmetry
    ind = spark.createDataFrame(
        [(a, b) for a in "uv" for b in "UV"], "a string, b string"
    )
    assert abs(categorical_mi(ind, "a", "b").collect()[0]["mi_nats"]) < 1e-12

    import pytest as _pt

    with _pt.raises(ValueError, match="differ"):
        categorical_mi(df, "a", "a")


def test_categorical_mi_missing_column_raises(spark):
    import pytest as _pt

    from pyspark_skyline_spark.operators.profile import categorical_mi

    df = spark.createDataFrame([("x", "p")], "a string, b string")
    with _pt.raises(ValueError, match="not in DataFrame columns"):
        categorical_mi(df, "a", "nope")
