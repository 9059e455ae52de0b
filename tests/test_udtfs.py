"""Python UDTF surface (operators/udtfs.py): SQL LATERAL and DataFrame
lateralJoin front doors, NULL/short-paragraph policy."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.udtfs import (
    make_paragraph_splitter,
    register_paragraph_splitter,
)

DOCS = [
    (1, "first para\n\nsecond para\n\n\n\nthird"),
    (2, "single"),
    (3, None),
    (4, "  \n\n  "),  # only blank paragraphs
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_udtf_sql_lateral(spark, docs):
    register_paragraph_splitter(spark, "split_paras_t")
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.doc_id, p.para_idx, p.para_text, p.n_chars "
        "FROM udtf_docs d, LATERAL split_paras_t(d.text) p"
    ).collect()
    got = {(r.doc_id, r.para_idx): r.para_text for r in out}
    assert got == {
        (1, 0): "first para",
        (1, 1): "second para",
        (1, 2): "third",
        (2, 0): "single",
    }
    # inner lateral: doc 3 (NULL) and doc 4 (blank-only) emit nothing
    assert {r.doc_id for r in out} == {1, 2}


def test_udtf_dataframe_call(spark):
    splitter = make_paragraph_splitter(min_chars=6)
    out = splitter(F.lit("tiny\n\nlong enough paragraph")).collect()
    assert [(r.para_idx, r.para_text) for r in out] == [(0, "long enough paragraph")]


def test_udtf_n_chars_matches(spark, docs):
    register_paragraph_splitter(spark, "split_paras_t2")
    docs.createOrReplaceTempView("udtf_docs2")
    rows = spark.sql(
        "SELECT p.para_text, p.n_chars FROM udtf_docs2 d, "
        "LATERAL split_paras_t2(d.text) p"
    ).collect()
    assert all(r.n_chars == len(r.para_text) for r in rows)
