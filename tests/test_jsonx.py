"""JSON column operators (operators/jsonx.py): typed extraction,
bounded-sample schema inference, flattening, malformed-input policy."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pyspark_skyline_spark.operators.jsonx import (
    infer_json_schema,
    json_extract,
    json_flatten,
)

DOCS = [
    (1, '{"k": 87, "tag": "a", "nested": {"x": 1.5}}'),
    (2, '{"k": 0, "tag": "b"}'),
    (3, '{"k": 12}'),
    (4, None),
    (5, "not json at all"),
    (6, '{"k": "not-an-int"}'),
]


@pytest.fixture(scope="module")
def jdf(spark):
    return spark.createDataFrame(DOCS, ["id", "props"])


def test_json_extract_typed_fields(jdf):
    out = json_extract(
        jdf,
        "props",
        [("k", "$.k", "bigint"), ("tag", "$.tag", "string"), ("x", "$.nested.x", "double")],
    )
    rows = {r.id: (r.k, r.tag, r.x) for r in out.collect()}
    assert rows[1] == (87, "a", 1.5)
    assert rows[2] == (0, "b", None)
    assert rows[3] == (12, None, None)
    assert rows[4] == (None, None, None)  # null document
    assert rows[5] == (None, None, None)  # malformed document
    assert rows[6] == (None, None, None)  # failed cast -> NULL


def test_json_extract_keeps_input_columns(jdf):
    out = json_extract(jdf, "props", [("k", "$.k", "bigint")])
    assert out.columns == ["id", "props", "k"]


def test_json_extract_validates(jdf):
    with pytest.raises(ValueError):
        json_extract(jdf, "nope", [("k", "$.k", "bigint")])
    with pytest.raises(ValueError):
        json_extract(jdf, "props", [])
    with pytest.raises(ValueError):
        json_extract(jdf, "props", [("k", "k", "bigint")])  # path missing $


def test_infer_json_schema_merges_across_docs(jdf):
    schema = infer_json_schema(jdf, "props")
    names = {f.name for f in schema.fields}
    # fields from different documents merge, like spark.read.json
    assert {"k", "tag", "nested"} <= names


def test_infer_json_schema_no_docs(spark):
    df = spark.createDataFrame([(1, None)], "id long, props string")
    with pytest.raises(ValueError):
        infer_json_schema(df, "props")


def test_json_flatten_inferred(jdf):
    out = json_flatten(jdf.select("id", "props"), "props")
    assert "props" not in out.columns
    rows = {r.id: r for r in out.collect()}
    # doc 6 has k as a string; merged schema widens k to string
    assert rows[3].k == "12"
    assert rows[1].tag == "a"
    assert rows[5].tag is None  # malformed -> NULLs, job survives


def test_json_flatten_explicit_schema_and_prefix(jdf):
    schema = StructType([StructField("k", LongType()), StructField("tag", StringType())])
    out = json_flatten(jdf, "props", schema=schema, prefix="p_", drop=False)
    assert out.columns == ["id", "props", "p_k", "p_tag"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].p_k == 87 and rows[1].p_tag == "a"
    assert rows[6].p_k is None  # "not-an-int" fails the long field -> NULL


def test_json_flatten_collision_rejected(jdf):
    schema = StructType([StructField("id", LongType())])
    with pytest.raises(ValueError):
        json_flatten(jdf, "props", schema=schema)


def test_json_extract_on_events_table(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = json_extract(df, "props", [("k", "$.k", "bigint")])
    assert out.where(F.col("k").isNull()).count() == 0
    assert out.count() == df.count()
    lo, hi = out.agg(F.min("k"), F.max("k")).first()
    assert 0 <= lo <= hi


def test_json_extract_stays_in_codegen(spark, sf_dir):
    """The extraction plan must be pure Catalyst (no Python eval node)
    and prune the scan to the referenced columns."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = json_extract(df, "props", [("k", "$.k", "bigint")]).select("event_id", "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Eval" not in plan and "Python" not in plan
    # column pruning: the parquet scan reads only event_id + props
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    assert all("user_id" not in ln and "event_type" not in ln for ln in scan_lines)


def test_json_flatten_dotted_keys(spark):
    """JSON keys legally contain dots; flattening must not parse them
    as nested struct paths."""
    df = spark.createDataFrame(
        [(1, '{"user.id": 5, "plain": "x"}')], ["id", "props"]
    )
    out = json_flatten(df, "props")
    row = out.first()
    assert row["user.id"] == 5 and row["plain"] == "x"
