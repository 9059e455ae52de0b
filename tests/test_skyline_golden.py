"""Golden replay: the reference's own expected outputs on its vendored
100k-point CSVs (reference data/expected_skyline_output.txt; SURVEY.md §5).
"""

import os
import re

import pytest

from pyspark_skyline_spark import skyline
from pyspark_skyline_spark.sources.tables import read_points_csv

REF_DATA = "/root/reference/data"
GOLDEN = f"{REF_DATA}/expected_skyline_output.txt"
CSV_D2 = f"{REF_DATA}/points_D_2_N_100_000.csv"

needs_ref = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference data not available"
)


def parse_golden():
    """-> {(s1, s2): set of (x1, x2)} for the D_2_N_100_000 section."""
    text = open(GOLDEN).read()
    section = text.split("points_D_2_N_100_000.csv")[1].split("################ points")[0]
    out = {}
    for m in re.finditer(
        r"SKYLINE OF x1 (MIN|MAX), x2 (MIN|MAX)-+\s*\n\s*\[(.*?)\]", section, re.DOTALL
    ):
        senses = (m.group(1).lower(), m.group(2).lower())
        pts = {
            (int(a), int(b))
            for a, b in re.findall(r"\{\s*(\d+)\s*,\s*(\d+)\s*\}", m.group(3))
        }
        out[senses] = pts
    return out


@needs_ref
@pytest.mark.parametrize("algo", ["MR_DIM", "MR_GRID", "MR_ANGLE"])
def test_golden_d2_all_sense_combos(spark, algo):
    golden = parse_golden()
    assert len(golden) == 4
    df = read_points_csv(spark, CSV_D2, d=2).cache()
    try:
        for (s1, s2), want in golden.items():
            res = skyline(df, [("x1", s1), ("x2", s2)], algo=algo)
            got = {(r.x1, r.x2) for r in res.select("x1", "x2").dropDuplicates().collect()}
            assert got == want, (algo, s1, s2)
    finally:
        df.unpersist()
