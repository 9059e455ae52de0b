"""Skew diagnostics: hand-computed heavy hitters and skew stats."""

import pytest

from pyspark_skyline_spark.operators import diagnostics as DG


def test_heavy_hitters_hand_computed(spark):
    rows = [("a", 1)] * 5 + [("b", 1)] * 3 + [("c", 2)] * 3 + [("d", 9)]
    df = spark.createDataFrame(rows, "k string, g long")
    got = [(r.k, r.g, r.n) for r in DG.heavy_hitters(df, ["k", "g"], k=3).collect()]
    # ties (b,1) vs (c,2) break by key ascending
    assert got == [("a", 1, 5), ("b", 1, 3), ("c", 2, 3)]


def test_skew_stats_hand_computed(spark):
    rows = [("hot",)] * 8 + [("w1",), ("w2",)]
    df = spark.createDataFrame(rows, "k string")
    r = DG.skew_stats(df, ["k"]).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_key_rows) == (10, 3, 8)
    assert r.avg_key_rows == pytest.approx(10 / 3, abs=1e-6)
    assert r.skew_ratio == pytest.approx(8 / (10 / 3), abs=1e-6)


def test_diagnostics_validate(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="non-empty"):
        DG.heavy_hitters(df, [])
    with pytest.raises(ValueError, match="not in DataFrame"):
        DG.skew_stats(df, ["nope"])
