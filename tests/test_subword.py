"""subword_encode / subword_decode laws (round-13 addition): greedy
longest-match correctness against an independent pure-Python reference,
the decode round-trip, unk semantics, vocab validation, plan shape
(zero exchanges), and END-TO-END composition through the packing family
(pack_sequences -> gather_token_sequences -> pack_position_ids) on
REAL token ids — the last synthetic link the round-12 verdict flagged.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.text import (
    _SUBWORD_SPLIT,
    GREEDY_VOCAB,
    subword_decode,
    subword_encode,
)

VOCAB = {p: i for i, p in enumerate(GREEDY_VOCAB)}


def _reference_encode(text: str, vocab: dict[str, int], unk_id=None):
    """Independent greedy longest-match: scans candidate pieces by
    sorted-by-length vocab list + startswith — a different code path
    from the operator's length-countdown dict lookups."""
    by_len = sorted(vocab, key=lambda p: (-len(p), p))
    ids = []
    for run in re.findall(_SUBWORD_SPLIT, text.lower()):
        pos = 0
        while pos < len(run):
            for piece in by_len:
                if run.startswith(piece, pos):
                    ids.append(vocab[piece])
                    pos += len(piece)
                    break
            else:
                assert unk_id is not None
                ids.append(unk_id)
                pos += 1
    return ids


FIXTURE = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "pack 512 sequences, then gather them all!"),
    (3, "internationalization and localization"),
    (4, "a"),
    (5, ""),
    (6, "   \t\n  "),
    (7, "x" * 300),
    (8, "mixed CASE and UPPER case RUNS"),
    (9, "1234567890 42 007"),
    (10, "semi;colon: and (parens) [brackets] {braces} <angles>"),
]


def test_matches_independent_reference(spark):
    df = spark.createDataFrame(FIXTURE, "id long, text string")
    got = {
        r.id: list(r.token_ids)
        for r in subword_encode(df, VOCAB, "text").collect()
    }
    for i, text in FIXTURE:
        assert got[i] == _reference_encode(text, VOCAB), (i, text)


def test_every_emitted_token_is_longest_prefix(spark):
    """Implementation-independent greedy certificate on the corpus
    fixture: reconstruct each doc's run stream from the emitted pieces
    and check no LONGER vocab piece matched at any emission point."""
    df = spark.createDataFrame(FIXTURE, "id long, text string")
    inv = {i: p for p, i in VOCAB.items()}
    max_piece = max(len(p) for p in VOCAB)
    rows = subword_encode(df, VOCAB, "text").collect()
    for r in rows:
        runs = re.findall(_SUBWORD_SPLIT, (r.text or "").lower())
        ids = list(r.token_ids)
        k = 0
        for run in runs:
            pos = 0
            while pos < len(run):
                piece = inv[ids[k]]
                assert run.startswith(piece, pos), (r.id, run, pos, piece)
                for L in range(len(piece) + 1, min(max_piece, len(run) - pos) + 1):
                    assert run[pos : pos + L] not in VOCAB, (
                        f"doc {r.id}: emitted {piece!r} but "
                        f"{run[pos:pos + L]!r} is a longer match"
                    )
                pos += len(piece)
                k += 1
        assert k == len(ids), r.id


def test_decode_roundtrip_on_corpus(spark, sf_dir):
    """decode(encode(text)) == runs of lower(text) joined (= text with
    whitespace removed on this corpus) for every document — checked
    natively, one boolean aggregate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    enc = subword_encode(docs, VOCAB, "text")
    dec = subword_decode(enc, VOCAB)
    bad = dec.withColumn(
        "__want",
        F.array_join(
            F.regexp_extract_all(F.lower("text"), F.lit(_SUBWORD_SPLIT), 0), ""
        ),
    ).where(F.col("decoded") != F.col("__want"))
    assert bad.count() == 0


def test_unk_semantics(spark):
    df = spark.createDataFrame([(1, "café")], "id long, text string")
    # no unk_id: raise loudly (worker exception surfaces as Py4J error)
    with pytest.raises(Exception, match="no vocab piece matches"):
        subword_encode(df, VOCAB, "text").collect()
    got = subword_encode(df, VOCAB, "text", unk_id=-1).collect()[0].token_ids
    assert list(got) == [VOCAB["c"], VOCAB["a"], VOCAB["f"], -1]


def test_vocab_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        subword_encode(df, {}, "text")
    with pytest.raises(ValueError, match="non-empty"):
        subword_encode(df, {"": 0}, "text")
    with pytest.raises(ValueError, match="duplicate"):
        subword_decode(df.withColumn("token_ids", F.array()), {"a": 0, "b": 0})


def test_plan_zero_exchanges(spark, sf_dir):
    """Scan-shaped like the multimodal decoders: native regexp pre-tok
    + one mapInPandas, no shuffle anywhere in the plan."""
    from pyspark_skyline_spark.plans.explain import assert_max_exchanges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_max_exchanges(subword_encode(docs, VOCAB, "text"), 0)


def test_composes_with_packing_family(spark, sf_dir):
    """The pretraining chain on REAL token ids end-to-end: encode ->
    plan on size(token_ids) -> gather_token_sequences -> every sequence
    but the last is exactly seq_len; the concatenation of sequences in
    seq_id order equals the concatenation of docs' ids in doc_id order;
    pack_position_ids agrees with per-token segment/position recompute.
    """
    from pyspark_skyline_spark.operators.sample import (
        gather_token_sequences,
        pack_position_ids,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    enc = subword_encode(docs, VOCAB, "text").withColumn(
        "n_tok", F.size("token_ids")
    )
    plan = pack_sequences(enc, "doc_id", "n_tok", seq_len=256)
    seqs = {
        r.seq_id: list(r.seq_tokens)
        for r in gather_token_sequences(enc, plan, "doc_id", "token_ids").collect()
    }
    n_seq = len(seqs)
    assert n_seq >= 2
    for sid, toks in seqs.items():
        if sid != max(seqs):
            assert len(toks) == 256, sid
    stream = [t for sid in sorted(seqs) for t in seqs[sid]]
    want = [
        t
        for r in sorted(enc.collect(), key=lambda r: r.doc_id)
        for t in r.token_ids
    ]
    assert stream == want
    # position/segment ids line up with the gathered tokens
    pos = {r.seq_id: (list(r.position_ids), list(r.segment_ids))
           for r in pack_position_ids(plan).collect()}
    assert set(pos) == set(seqs)
    for sid in seqs:
        p, s = pos[sid]
        assert len(p) == len(seqs[sid]) and len(s) == len(seqs[sid])
        # positions restart at 0 exactly when the segment id increments
        # (unless the chunk continues a split document - then the
        # sequence STARTS mid-document with segment 0, position > 0)
        for i in range(1, len(s)):
            assert s[i] in (s[i - 1], s[i - 1] + 1)
            if s[i] == s[i - 1]:
                assert p[i] == p[i - 1] + 1
            else:
                assert p[i] == 0


# ---------------------------------------------------------------------------
# learn_bpe_merges (round-13 addition)
# ---------------------------------------------------------------------------


def _naive_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook recount-everything BPE — the O(n_merges * histogram)
    reference the incremental learner must match exactly."""
    hist = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in hist.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs or max(pairs.values()) <= 0:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        out = {}
        for syms, c in hist.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    res.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + c
        hist = out
    return merges


def test_learn_bpe_sennrich_example(spark):
    """The worked example from the BPE paper (Sennrich et al. 2016):
    {low:5, lower:2, newest:6, widest:3} — first merges are (e,s) 9,
    (es,t) 9, then (l,o) 7 / (lo,w) 7."""
    from pyspark_skyline_spark.operators.text import learn_bpe_merges

    rows = (
        [(i, "low") for i in range(5)]
        + [(100 + i, "lower") for i in range(2)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "id long, text string")
    merges, vocab = learn_bpe_merges(df, 4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    # vocab layout: sorted singles first, then merges in learn order
    singles = sorted(set("lowernewstid"))
    assert [p for p, _ in sorted(vocab.items(), key=lambda kv: kv[1])] == (
        singles + ["es", "est", "lo", "low"]
    )


def test_learn_bpe_matches_naive_reference(spark, sf_dir):
    """Incremental pair-index learner == textbook recount learner on
    the real corpus word histogram (both weighted by word count, same
    lexicographic tie rule)."""
    import re as _re

    from pyspark_skyline_spark.operators.text import learn_bpe_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    merges, _ = learn_bpe_merges(docs, 60)
    wc: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in _re.findall(_SUBWORD_SPLIT, (r.text or "").lower()):
            wc[w] = wc.get(w, 0) + 1
    assert merges == _naive_bpe(wc, 60)


def test_learned_vocab_feeds_encoder_with_zero_unks(spark, sf_dir):
    """Composition: vocab learned FROM the corpus covers the corpus —
    subword_encode with unk_id=None (raise-on-unk) succeeds, and the
    decode round-trip holds; more merges => no more tokens."""
    from pyspark_skyline_spark.operators.text import learn_bpe_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    _, vocab = learn_bpe_merges(docs, 40)
    enc = subword_encode(docs, vocab, "text")  # unk_id=None: any gap raises
    dec = subword_decode(enc, vocab)
    bad = dec.withColumn(
        "__want",
        F.array_join(
            F.regexp_extract_all(F.lower("text"), F.lit(_SUBWORD_SPLIT), 0), ""
        ),
    ).where(F.col("decoded") != F.col("__want"))
    assert bad.count() == 0
    n40 = enc.select(F.sum(F.size("token_ids"))).collect()[0][0]
    _, vocab0 = learn_bpe_merges(docs, 0)
    n0 = (
        subword_encode(docs, vocab0, "text")
        .select(F.sum(F.size("token_ids")))
        .collect()[0][0]
    )
    assert n40 <= n0  # merges only ever shorten the encoding


def test_learn_bpe_truncation_and_validation(spark):
    import warnings as _w

    from pyspark_skyline_spark.operators.text import learn_bpe_merges

    df = spark.createDataFrame(
        [(i, f"w{i} common common") for i in range(30)], "id long, text string"
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        merges, vocab = learn_bpe_merges(df, 3, max_words=5)
    assert any("distinct words" in str(x.message) for x in rec)
    # the dominant word still learns its merges from the kept head
    assert ("c", "o") in merges or ("o", "m") in merges or ("m", "m") in merges
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges(df, -1)
    with pytest.raises(ValueError, match="max_words"):
        learn_bpe_merges(df, 1, max_words=0)


# ---------------------------------------------------------------------------
# bpe_encode (merge-rank inference, round-13 addition)
# ---------------------------------------------------------------------------


def _apply_merges_in_order(run: str, merges):
    """Reference: apply each merge everywhere, in training order —
    classically equivalent to repeatedly applying the lowest-rank
    present pair (what bpe_encode implements)."""
    syms = list(run)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_apply_in_order(spark, sf_dir):
    """Merge-rank inference == training-order application on the real
    corpus, with the vocab LEARNED from that corpus — the exact
    train/infer consistency contract."""
    import re as _re

    from pyspark_skyline_spark.operators.text import bpe_encode, learn_bpe_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    merges, vocab = learn_bpe_merges(docs, 80)
    got = {
        r.doc_id: list(r.token_ids)
        for r in bpe_encode(docs, merges, vocab, "text").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = [
            vocab[s]
            for run in _re.findall(_SUBWORD_SPLIT, (r.text or "").lower())
            for s in _apply_merges_in_order(run, merges)
        ]
        assert got[r.doc_id] == want, r.doc_id


def test_bpe_encode_differs_from_greedy_where_it_should(spark):
    """The documented divergence: greedy longest-match grabs a piece
    training order never builds at that position.  merges
    [(b,c), (a,b)] on 'abc': merge-rank fires rank-0 (b,c) first ->
    [a, bc] and (a,bc) is no merge, so it stops; greedy sees prefix
    'ab' in vocab and takes it -> [ab, c].  Same vocab, different
    (both valid) segmentations — the reason bpe_encode exists."""
    from pyspark_skyline_spark.operators.text import bpe_encode

    merges = [("b", "c"), ("a", "b")]
    vocab = {"a": 0, "b": 1, "c": 2, "bc": 3, "ab": 4}
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    rank_ids = list(
        bpe_encode(df, merges, vocab, "text").collect()[0].token_ids
    )
    greedy_ids = list(subword_encode(df, vocab, "text").collect()[0].token_ids)
    assert rank_ids == [vocab["a"], vocab["bc"]]
    assert greedy_ids == [vocab["ab"], vocab["c"]]


def test_bpe_encode_unk_and_validation(spark):
    from pyspark_skyline_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "xyz")], "id long, text string")
    with pytest.raises(ValueError, match="missing from vocab"):
        bpe_encode(df, [("a", "b")], {"a": 0, "b": 1}, "text")
    with pytest.raises(Exception, match="not in vocab"):
        bpe_encode(df, [], {"a": 0}, "text").collect()
    got = bpe_encode(df, [], {"x": 7}, "text", unk_id=-1).collect()[0].token_ids
    assert list(got) == [7, -1, -1]


def test_bpe_encode_plan_zero_exchanges(spark, sf_dir):
    from pyspark_skyline_spark.operators.text import bpe_encode
    from pyspark_skyline_spark.plans.explain import assert_max_exchanges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_max_exchanges(
        bpe_encode(docs, [("t", "h")], {**{c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz")}, "th": 26}, "text", unk_id=-1),
        0,
    )


# ---------------------------------------------------------------------------
# round-13 review fixes
# ---------------------------------------------------------------------------


def test_null_and_empty_text_encode_to_empty_array(spark):
    """regexp_extract_all(NULL) arrives in the Arrow batch as None —
    the encoders must emit [] instead of crashing the worker."""
    from pyspark_skyline_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "ab")], "id long, text string"
    )
    got = {
        r.id: list(r.token_ids)
        for r in subword_encode(df, VOCAB, "text").collect()
    }
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == [VOCAB["a"], VOCAB["b"]]  # 'ab' is not a GREEDY_VOCAB piece
    got2 = {
        r.id: list(r.token_ids)
        for r in bpe_encode(
            df, [("a", "b")], {"a": 0, "b": 1, "ab": 2}, "text"
        ).collect()
    }
    assert got2[1] == [] and got2[4] == [2]


def test_column_collision_guards(spark):
    from pyspark_skyline_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError, match="already exists"):
        subword_encode(df.withColumn("token_ids", F.lit(0)), VOCAB, "text")
    with pytest.raises(ValueError, match="reserved"):
        subword_encode(df.withColumn("__runs", F.lit(0)), VOCAB, "text")
    with pytest.raises(ValueError, match="not found"):
        subword_encode(df, VOCAB, "no_such_col")
    with pytest.raises(ValueError, match="already exists"):
        bpe_encode(
            df.withColumn("token_ids", F.lit(0)), [], {"a": 0}, "text"
        )
    with pytest.raises(ValueError, match="already exists"):
        subword_decode(
            df.withColumn("token_ids", F.array(F.lit(0)))
            .withColumn("decoded", F.lit("x")),
            {"a": 0},
        )


def test_decode_big_vocab_broadcast_path(spark):
    """Past native_map_max the decoder switches to broadcast +
    mapInPandas (a 2|V|-arg CreateMap literal is the documented codegen
    pathology); both paths must agree, NULL ids decode to NULL."""
    big_vocab = {f"w{i:05d}": i for i in range(2000)}
    big_vocab["a"] = 2000
    df = spark.createDataFrame(
        [(1, [2000, 5, 2000]), (2, None)],
        "id long, token_ids array<int>",
    )
    lo = subword_decode(df, big_vocab, native_map_max=5000).collect()
    hi = subword_decode(df, big_vocab, native_map_max=10).collect()
    as_map = lambda rows: {r.id: r.decoded for r in rows}
    want = {1: "aw00005a", 2: None}
    got_lo, got_hi = as_map(lo), as_map(hi)
    # native path renders NULL ids arrays as NULL too (array_join of
    # NULL is NULL), matching the broadcast path
    assert got_hi == want
    assert got_lo == want


def test_dhondt_huge_counts_no_float_overflow():
    """counts >= 2^1024 overflow math.sqrt; the exact path must stay
    all-integer (review find) and agree with the retained loop."""
    from pyspark_skyline_spark.operators.shuffle import (
        _dhondt_allocate_loop,
        dhondt_allocate,
    )

    counts = {"a": 2**1100, "b": 2**1099, "c": 3}
    got = dhondt_allocate(counts, 11, 0.5)
    assert got == _dhondt_allocate_loop(counts, 11, 0.5)
    assert sum(got.values()) == 11
    assert dhondt_allocate({"a": 2**1100}, 5, 0.5) == {"a": 5}


def test_subword_oracle_emits_zero_run_docs(spark, tmp_path):
    """The extras oracle must keep (doc_id, 0, '') rows for docs whose
    text yields no runs (empty/whitespace/NULL), matching the Spark
    side — pinned on a synthetic documents table containing all three.
    """
    import duckdb

    from pyspark_skyline_spark.entry_ext import _q_subword_encode_documents
    from pyspark_skyline_spark.entry_oracles import _ORACLES

    p = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    ).write.parquet(f"{p}/documents.parquet")
    sdf = _q_subword_encode_documents(spark, p).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{p}/documents.parquet/*.parquet')"
    )
    odf = con.execute(
        "SELECT * FROM ("
        + _ORACLES["subword_encode_documents"]
        + ") ORDER BY doc_id"
    ).fetchall()
    assert len(sdf) == len(odf) == 4
    for s, o in zip(sdf, odf):
        assert (s.doc_id, s.n_tokens, s.ids_joined) == (o[0], o[1], o[2])
    assert sdf[1].n_tokens == 0 and sdf[1].ids_joined == ""
    assert sdf[3].n_tokens == 0 and sdf[3].ids_joined == ""


def test_subword_encode_on_structured_stream(spark, sf_dir, tmp_path):
    """The tokenizer composes with Structured Streaming unchanged:
    mapInPandas is stream-capable, so a readStream -> subword_encode ->
    memory-sink availableNow pass must produce exactly the batch
    result — the property a streaming ingest+tokenize pipeline relies
    on (no rewrite between backfill and live paths)."""
    import shutil
    import uuid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # readStream needs a DIRECTORY source; the fixture is a bare file
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "part-0.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    enc = subword_encode(stream, VOCAB, "text").select(
        "doc_id", F.size("token_ids").alias("n_tok")
    )
    name = f"tok_{uuid.uuid4().hex[:8]}"
    q = (
        enc.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.n_tok for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        r.doc_id: r.n_tok
        for r in subword_encode(docs, VOCAB, "text")
        .select("doc_id", F.size("token_ids").alias("n_tok"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_bpe_from_histogram_hypothesis_matches_naive():
    """Property: the incremental lazy-heap learner == the textbook
    recount learner on random histograms (words over a 3-letter
    alphabet maximize merge collisions/overlaps), any n_merges. Also:
    re-encoding every histogram word with the learned merges
    (training-order application) uses only vocab pieces."""
    from hypothesis import given, settings, strategies as st

    from pyspark_skyline_spark.operators.text import bpe_from_histogram

    words = st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=12,
    )

    @given(wc=words, n=st.integers(min_value=0, max_value=15))
    @settings(max_examples=150, deadline=None)
    def inner(wc, n):
        merges, vocab = bpe_from_histogram(wc, n)
        assert merges == _naive_bpe(wc, n)
        for w in wc:
            for s in _apply_merges_in_order(w, merges):
                assert s in vocab

    inner()
