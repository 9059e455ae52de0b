"""Z-order layout (sources/layout.py): bit-interleave correctness vs a
pure-Python Morton encoder, and the measurable payoff — per-file
min/max extents shrink vs an unclustered write, which is exactly what
parquet row-group skipping prunes on."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.sources.layout import write_zordered, zorder_key


def _morton_py(vals, bits):
    """Reference interleave: column i contributes bit j to position j*d+i."""
    z = 0
    d = len(vals)
    for j in range(bits):
        for i in range(d):
            z |= ((vals[i] >> j) & 1) << (j * d + i)
    return z


def test_zorder_key_matches_python_reference(spark):
    # bounds chosen so the fixed-point cell == the raw integer value:
    # [0, 16) with bits=4 makes floor(v/16*16) = v
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.withColumn(
        "z", zorder_key(df, ["a", "b"], bits=4, bounds={"a": (0, 16), "b": (0, 16)})
    ).collect()
    for r in out:
        assert r.z == _morton_py([r.a, r.b], 4), (r.a, r.b, r.z)


def test_zorder_key_data_driven_bounds_cover_range(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("x"), (F.col("id") % 89).alias("y")
    )
    z = df.select(zorder_key(df, ["x", "y"], bits=8).alias("z"))
    lo, hi = z.agg(F.min("z"), F.max("z")).first()
    assert lo >= 0 and hi < (1 << 16)
    # distinct z values: the curve actually spreads points
    assert z.distinct().count() > 500


def test_zorder_key_null_and_timestamp(spark):
    import datetime

    rows = [
        (None, datetime.datetime(2024, 1, 1)),
        (5.0, datetime.datetime(2024, 6, 1)),
        (9.0, None),
    ]
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    out = df.select(zorder_key(df, ["v", "ts"], bits=8).alias("z")).collect()
    assert all(r.z is not None and r.z >= 0 for r in out)


def test_zorder_validation(spark):
    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError):
        zorder_key(df, [], 8)
    with pytest.raises(ValueError):
        zorder_key(df, ["nope"], 8)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], 32)  # 64 bits > 63
    with pytest.raises(ValueError):
        zorder_key(df, ["a"], 8, bounds={"b": (0, 1)})


def _file_extents(path, col_names):
    """Per parquet file: normalized (max-min) extent per column from
    footer statistics — the quantity row-group skipping prunes on."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files
    spans = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        per_col = {}
        for c in col_names:
            idx = names.index(c)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_col[c] = (min(mins), max(maxs))
        spans[f] = per_col
    return spans


def test_write_zordered_shrinks_file_extents(spark, tmp_path):
    """Uniform 2-d data: unclustered files each span ~the full domain
    in both dims; z-ordered files must cover much smaller rectangles."""
    n = 40_000
    df = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(10_000)).cast("long").alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).cast("long").alias("y"),
        )
    )
    plain_path = str(tmp_path / "plain")
    z_path = str(tmp_path / "zorder")
    df.repartition(16).write.parquet(plain_path)
    write_zordered(df, z_path, ["x", "y"], bits=12, n_files=16)

    def mean_area(path):
        spans = _file_extents(path, ["x", "y"])
        areas = []
        for per_col in spans.values():
            ax = (per_col["x"][1] - per_col["x"][0]) / 10_000
            ay = (per_col["y"][1] - per_col["y"][0]) / 10_000
            areas.append(ax * ay)
        return sum(areas) / len(areas)

    plain_area = mean_area(plain_path)
    z_area = mean_area(z_path)
    # 16 z-ordered files over uniform data -> each covers ~1/16 of the
    # plane; unclustered files cover ~all of it. Require a 3x margin.
    assert z_area < plain_area / 3, (plain_area, z_area)
    # round-trip: no rows lost, schema preserved
    back = spark.read.parquet(z_path)
    assert back.count() == n and set(back.columns) == {"x", "y"}


def test_write_zordered_prunes_row_groups_for_range_query(spark, tmp_path):
    """End-to-end payoff: a range predicate on either z-ordered column
    skips most files (footer-stat pruning needs no reader changes)."""
    n = 40_000
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).cast("long").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).cast("long").alias("y"),
    )
    z_path = str(tmp_path / "z2")
    write_zordered(df, z_path, ["x", "y"], bits=12, n_files=16)
    spans = _file_extents(z_path, ["x", "y"])
    # a 10%-of-domain window on x alone overlaps only a minority of files
    overlapping = [
        f for f, pc in spans.items() if pc["x"][0] <= 1000 and pc["x"][1] >= 0
    ]
    assert len(overlapping) <= len(spans) / 2
    got = spark.read.parquet(z_path).where((F.col("x") >= 0) & (F.col("x") < 1000))
    want = df.where((F.col("x") >= 0) & (F.col("x") < 1000))
    assert got.count() == want.count()
