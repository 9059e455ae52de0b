"""Corpus filtering ops: repetition metrics, PII scrubbing, benchmark
decontamination — hand-computed expectations + plan-shape checks."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators import filtering as FL


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 6 words, all distinct, 3 distinct non-empty lines
            (1, "alpha beta gamma\ndelta epsilon zeta"),
            # degenerate spam: one word repeated 6 times, 3 identical lines
            (2, "spam spam\nspam spam\nspam spam"),
            # too short
            (3, "hi there"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in FL.repetition_stats(df).select(
            "doc_id", "n_words", "dup_line_frac", "dup_word_frac",
            "top_word_frac", "keep",
        ).collect()
    }
    assert got[1].n_words == 6
    assert got[1].dup_line_frac == 0.0
    assert got[1].dup_word_frac == 0.0
    assert got[1].top_word_frac == pytest.approx(1 / 6)
    assert got[1].keep is True

    assert got[2].n_words == 6
    assert got[2].dup_line_frac == pytest.approx(2 / 3)  # 3 lines, 1 distinct
    assert got[2].dup_word_frac == pytest.approx(5 / 6)
    assert got[2].top_word_frac == pytest.approx(1.0)
    assert got[2].keep is False

    assert got[3].keep is False  # under min_words


def test_repetition_stats_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    rows = FL.repetition_stats(df).select("doc_id", "keep").collect()
    assert all(r.keep is False for r in rows)  # no crash, no division by zero

    scrubbed = {r.doc_id: r for r in FL.pii_scrub(df).collect()}
    assert scrubbed[3].text_scrubbed == "" and scrubbed[3].n_email == 0


def test_repetition_stats_python_differential(spark):
    # differential vs an independent pure-Python computation on random
    # word-soup docs (fixed seed)
    import random

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = []
    for i in range(60):
        n = rng.randint(0, 12)
        words = [rng.choice(vocab) for _ in range(n)]
        # random line structure
        text, pos = "", 0
        while pos < n:
            take = rng.randint(1, 4)
            text += " ".join(words[pos : pos + take]) + "\n"
            pos += take
        docs.append((i, text.rstrip("\n")))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in FL.repetition_stats(df).collect()}

    for i, text in docs:
        words = text.lower().split()
        lines = [ln for ln in text.split("\n") if ln.strip()]
        r = got[i]
        # split(r'\s+') on "" yields [''] -> size 1; mirror that edge
        expect_words = words if words else [""]
        assert r.n_words == len(expect_words), (i, text)
        if lines:
            assert r.dup_line_frac == pytest.approx(
                1 - len(set(lines)) / len(lines)
            ), i
        assert r.dup_word_frac == pytest.approx(
            1 - len(set(expect_words)) / len(expect_words)
        ), i
        top = max(expect_words.count(w) for w in set(expect_words))
        assert r.top_word_frac == pytest.approx(top / len(expect_words)), i


def test_pii_scrub_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
            (2, "server 192.168.0.1 charged card 4111 1111 1111 1111 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in FL.pii_scrub(df).collect()}
    assert "<EMAIL>" in got[1].text_scrubbed
    assert "jane.doe" not in got[1].text_scrubbed
    assert "<PHONE>" in got[1].text_scrubbed
    assert got[1].n_email == 1 and got[1].n_phone == 1

    assert "<IP>" in got[2].text_scrubbed and "192.168" not in got[2].text_scrubbed
    assert "<CARD>" in got[2].text_scrubbed and "4111" not in got[2].text_scrubbed
    assert got[2].n_ipv4 == 1 and got[2].n_card == 1

    assert got[3].text_scrubbed == got[3].text
    assert got[3].n_email == got[3].n_phone == got[3].n_ipv4 == got[3].n_card == 0


def test_pii_scrub_kind_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a@b.io on 10.0.0.1")], "doc_id long, text string")
    row = FL.pii_scrub(df, kinds=["email"]).collect()[0]
    assert "<EMAIL>" in row.text_scrubbed and "10.0.0.1" in row.text_scrubbed
    assert not hasattr(row, "n_ipv4")
    with pytest.raises(ValueError, match="unknown PII kinds"):
        FL.pii_scrub(df, kinds=["ssn"])


@pytest.fixture()
def contamination_pair(spark):
    # doc 1 quotes the probe verbatim (>= 8 shared words in a row);
    # doc 2 is clean; doc 3 shares only a short 3-word phrase
    quote = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, f"intro text then {quote} and some trailing words"),
            (2, "completely unrelated content about spark partitions"),
            (3, "the quick brown cat sleeps all day long at home"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame([(quote,)], "text string")
    return train, probe


def test_decontaminate_drop_and_flag(spark, contamination_pair):
    train, probe = contamination_pair
    kept = FL.decontaminate(train, probe, "doc_id", shingle_k=8)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]

    flagged = FL.decontaminate(train, probe, "doc_id", shingle_k=8, mode="flag")
    got = {r.doc_id: r for r in flagged.collect()}
    assert got[1].contaminated is True and got[1].n_contaminated_grams >= 1
    assert got[2].contaminated is False and got[2].n_contaminated_grams == 0
    assert got[3].contaminated is False

    with pytest.raises(ValueError, match="mode"):
        FL.decontaminate(train, probe, "doc_id", mode="purge")


def test_decontaminate_broadcasts_probe(spark, contamination_pair):
    train, probe = contamination_pair
    plan = FL.decontaminate(train, probe, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # probe grams broadcast, corpus never shuffled for the match


def test_filtering_ops_run_in_streaming(spark, sf_dir, tmp_path):
    # repetition_stats + pii_scrub are stateless projections, so they
    # compose with Structured Streaming unchanged — prove it end to end
    import uuid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    src = str(tmp_path / "docs_stream")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = FL.pii_scrub(FL.repetition_stats(stream)).select(
        "doc_id", "keep", "text_scrubbed"
    )
    name = f"filt_{uuid.uuid4().hex[:6]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name)
    assert got.count() == 50
    batch = FL.pii_scrub(FL.repetition_stats(docs)).select("doc_id", "keep", "text_scrubbed")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_decontaminate_on_documents_table(spark, sf_dir):
    # self-decontamination: probing with its own first rows must drop them
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.orderBy("doc_id").limit(3).select("text")
    before = docs.count()
    after = FL.decontaminate(docs, probe, "doc_id", shingle_k=8).count()
    assert after < before


def test_pii_scrub_ip_not_eaten_by_phone(spark):
    # 192.168.100.100 is phone-shaped (3-4 digit dotted groups); the
    # ipv4 pattern must win the span so the redacted label and the
    # n_ipv4 audit count agree
    df = spark.createDataFrame(
        [(1, "host 192.168.100.100 answered")], "doc_id long, text string"
    )
    row = FL.pii_scrub(df).collect()[0]
    assert "<IP>" in row.text_scrubbed
    assert "<PHONE>" not in row.text_scrubbed
    assert row.n_ipv4 == 1


def test_repetition_stats_skips_quadratic_hof_past_word_cap(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "a a b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in FL.repetition_stats(df, min_words=2, max_words=4).collect()}
    # doc 1 exceeds the cap: the O(distinct x total) HOF is skipped
    # (top_word_frac NULL) and keep is False, not NULL
    assert got[1].top_word_frac is None
    assert got[1].keep is False
    # doc 2 is under the cap and computes normally
    assert got[2].top_word_frac == pytest.approx(2 / 3)


def test_filtering_ops_compose_with_streaming(spark, tmp_path):
    """pii_scrub / repetition_stats / split_dataset are stateless
    per-row transforms, so they run unchanged on a streaming DataFrame
    (availableNow file source -> memory sink) and agree with the batch
    result. decontaminate aggregates per-doc hit counts (a streaming
    agg would need a watermark), so a streaming curation pipeline runs
    it inside foreachBatch — exercised on each micro-batch here."""
    import os

    from pyspark_skyline_spark.operators import filtering as FL
    from pyspark_skyline_spark.operators.sample import split_dataset

    rows = [
        (1, "contact bob@example.com or call 555.123.4567 now"),
        (2, "plain text " * 30),
        (3, "the quick brown fox jumps over the lazy dog"),
    ]
    src = os.path.join(str(tmp_path), "src")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    evalset = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "eval_id long, text string"
    )

    def stateless(df):
        return split_dataset(FL.pii_scrub(FL.repetition_stats(df)), ["doc_id"]).select(
            "doc_id", "text", "text_scrubbed", "n_email", "keep", "split"
        )

    def full(df):
        return FL.decontaminate(
            stateless(df), evalset, "doc_id", shingle_k=5, mode="flag"
        ).select(
            "doc_id", "text_scrubbed", "n_email", "keep", "split", "contaminated"
        )

    batch = {tuple(r) for r in full(spark.read.parquet(src)).collect()}

    sink: set = set()

    def sink_batch(bdf, _bid):
        sink.update(tuple(r) for r in full(bdf).collect())

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sink == batch
    assert any(r[5] for r in sink)  # the planted quote is flagged
    assert all(r[4] in ("train", "val", "test") for r in sink)
    assert any("<EMAIL>" in r[1] for r in sink)  # PII redacted in-stream
    assert any("<PHONE>" in r[1] for r in sink)


def test_contamination_report_counts_leaking_docs(spark):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (1, f"intro text then {quote} and trailing words"),
            (2, f"another doc also quoting {quote} right here"),
            (3, "completely unrelated content about spark partitions"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, quote), (200, "no overlap with anything at all here now")],
        "eval_id long, text string",
    )
    got = {
        r.eval_id: r.n_leaking_docs
        for r in FL.contamination_report(
            train, probe, "doc_id", "eval_id", shingle_k=8
        ).collect()
    }
    assert got == {100: 2}  # probes without leaks are absent
