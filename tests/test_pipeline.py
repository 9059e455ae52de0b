"""End-to-end curation pipeline (pipeline.py): the operators compose —
spam filtered, PII gone, dups collapsed, eval quotes removed, split
assigned — with a per-stage audit trail."""

from pyspark.sql import functions as F

from pyspark_skyline_spark.pipeline import curate_corpus

GOOD = (
    "a sensible document with varied language about distributed query "
    "engines and their shuffle behavior under load"
)


def test_curate_corpus_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
            (3, "an operations handbook for the ingest cluster on broker "
                "failover drills; contact me at alice@example.com for details"),
            (4, GOOD),  # exact duplicate of 1 -> collapsed
            (5, "the quick brown fox jumps over the lazy dog today and tomorrow "
                "it will jump again over the same lazy dog happily"),
            (6, "totally unrelated clean text about parquet footers and bloom "
                "filters for membership pruning at scale"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today and tomorrow")],
        "doc_id long, text string",
    )
    out, audit = curate_corpus(docs, evalset)
    rows = {r.doc_id: r for r in out.collect()}
    # spam (2) filtered; dup (4) collapsed into 1; eval quote (5) dropped
    assert set(rows) == {1, 3, 6}
    # PII scrubbed in place
    assert "<EMAIL>" in rows[3].text and "alice@example.com" not in rows[3].text
    # split labels assigned
    assert all(r.split in ("train", "val", "test") for r in rows.values())
    # audit trail is monotone non-increasing
    order = ["input", "quality_filtered", "pii_scrubbed", "deduped",
             "decontaminated", "split"]
    vals = [audit[k] for k in order]
    assert vals[0] == 6 and vals == sorted(vals, reverse=True)
    assert audit["split"] == 3


def test_curate_corpus_no_evalset_no_audit(spark):
    docs = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    out, audit = curate_corpus(docs, audit=False)
    assert audit == {}
    assert out.count() == 1 and "split" in out.columns


def test_curate_corpus_runs_on_real_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    evalset = docs.limit(3)
    out, audit = curate_corpus(docs, evalset)
    assert audit["split"] <= audit["input"]
    # the planted eval docs must be gone (they share every 8-gram)
    got = {r.doc_id for r in out.collect()}
    planted = {r.doc_id for r in evalset.collect()}
    assert not (got & planted)
