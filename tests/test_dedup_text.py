"""Dedup + text operators: Python-reference differentials for the ops
whose driver check is rows-only (simhash), plus behavior tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators import dedup as D
from pyspark_skyline_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_dedup_exact_representative(spark):
    df = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "b"), (5, "b"), (4, "c")], "id long, v string"
    )
    got = D.dedup_exact(df, ["v"], order_col="id")
    assert sorted((r.id, r.v) for r in got.collect()) == [(1, "a"), (2, "b"), (4, "c")]


def test_exact_dup_groups_counts(spark):
    df = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "b")], "doc_id long, text string"
    )
    got = D.exact_dup_groups(df, ["text"], "doc_id")
    rows = {(r.doc_id, r.n_copies) for r in got.collect()}
    assert rows == {(1, 2), (2, 1)}


def test_shingles_short_text(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    got = df.select(D.shingles(F.col("text"), 3).alias("sh")).collect()[0].sh
    assert got == ["one two"]


def test_minhash_identical_docs_always_pair(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    pairs = D.minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=4).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert all(abs(r.jac - 1.0) < 1e-12 for r in pairs)


def _py_simhash(text: str, bits: int = 60):
    """Pure-Python reference mirroring simhash(hash_mode='md5')."""
    toks = text.strip().lower().split()
    sums = [0] * bits
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for i in range(bits):
            sums[i] += 1 if (h >> i) & 1 else -1
    half = bits // 2
    lo = sum((1 << i) for i in range(half) if sums[i] > 0)
    hi = sum((1 << (i - half)) for i in range(half, bits) if sums[i] > 0)
    return lo, hi


def test_simhash_matches_python_reference(docs):
    sample = docs.limit(20)
    got = {
        r.doc_id: (r.simhash_lo, r.simhash_hi)
        for r in D.simhash(sample, "doc_id", "text", hash_mode="md5").collect()
    }
    for r in sample.select("doc_id", "text").collect():
        assert got[r.doc_id] == _py_simhash(r.text), r.doc_id


def test_simhash_near_dups_close(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("lazy", "sleepy")  # one token changed
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = {r.doc_id: (r.simhash_lo, r.simhash_hi) for r in D.simhash(df, "doc_id", "text").collect()}
    ham = bin(rows[1][0] ^ rows[2][0]).count("1") + bin(rows[1][1] ^ rows[2][1]).count("1")
    assert ham <= 20  # 60-bit sketch: near-dups differ in few bits


def test_ngram_jaccard_finds_near_dups(spark):
    base = "w" + " w".join(str(i) for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely other content " * 8)],
        "doc_id long, text string",
    )
    pairs = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze und der vogel"),
            (3, "xyz qrs tuv"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in T.lang_id(df).select("doc_id", "pred_lang").collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "hello   world"), (2, "  hello world "), (3, "HELLO WORLD")],
        "doc_id long, text string",
    )
    fps = [r.fp for r in T.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


def test_token_count_whitespace_semantics(spark):
    # token_count lost its dedicated driver row (its output is a strict
    # projection of quality_documents), so pin the semantics here
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, "  x "), (3, "one")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_tokens for r in T.token_count(df).collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_quality_flags(spark):
    df = spark.createDataFrame(
        [(1, "short one"), (2, "this is a long enough document with many tokens")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.keep for r in T.quality_flags(df).collect()}
    assert got == {1: False, 2: True}


def test_subword_count_rule(spark):
    import math, re
    texts = [
        "hello world",
        "internationalization!!!",
        "a1b2 c3",
        "  ",
        "token-counting, with punct...",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    from pyspark_skyline_spark.operators.text import subword_count, _SUBWORD_SPLIT
    got = {r.doc_id: r.n_subwords for r in subword_count(df).collect()}
    for i, t in enumerate(texts):
        want = sum(math.ceil(len(r) / 6) for r in re.findall(_SUBWORD_SPLIT, t.lower()))
        assert got[i] == want, (t, got[i], want)


def test_winnow_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    a = "intro words here " + shared + " trailing part one"
    b = "completely different opening " + shared + " other ending text"
    c = "nothing in common with either document at all whatsoever today"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    from pyspark_skyline_spark.operators.text import winnow_fingerprints
    fps = winnow_fingerprints(df, "doc_id", "text", shingle_k=3, window=4)
    sets = {i: set() for i in range(3)}
    for r in fps.collect():
        sets[r.doc_id].add(r.fp)
    # winnowing guarantee: a shared run of >= window+k-1 tokens yields
    # at least one shared fingerprint
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])
    assert not (sets[1] & sets[2])


def test_winnow_short_doc_still_fingerprints(spark):
    df = spark.createDataFrame([(0, "tiny doc"), (1, "one")], "doc_id long, text string")
    from pyspark_skyline_spark.operators.text import winnow_fingerprints
    got = winnow_fingerprints(df, "doc_id", "text").groupBy("doc_id").count().collect()
    assert {r.doc_id for r in got} == {0, 1}


def test_near_dup_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.cluster_id for r in D.near_dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_near_dup_clusters_long_chain(spark):
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id for r in D.near_dup_clusters(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_near_dup_clusters_distributed_path_matches_driver_path(spark):
    """driver_edge_limit=0 forces the iterative label-propagation
    regime; both regimes must produce the identical labeling."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 4)],
        "id_a long, id_b long",
    )
    fast = {r.node: r.cluster_id for r in D.near_dup_clusters(pairs).collect()}
    dist = {
        r.node: r.cluster_id
        for r in D.near_dup_clusters(pairs, driver_edge_limit=0).collect()
    }
    assert fast == dist
    assert fast[5] == 1


def test_ngram_jaccard_matches_bruteforce_random(spark):
    """Prefix-filter candidate generation must be COMPLETE: compare
    against brute-force all-pairs Jaccard on random small corpora built
    from a tiny vocabulary (high overlap => dense pair graph stresses
    the PPJoin positional bound and the rarest-first ordering)."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = []
    for i in range(40):
        n = rng.randint(1, 12)
        texts.append((i, " ".join(rng.choice(vocab) for _ in range(n))))

    def py_shingles(t, k=3):
        toks = t.lower().split()
        if len(toks) >= k:
            return {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        return {" ".join(toks)}

    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(texts, 2):
        sa, sb = py_shingles(ta), py_shingles(tb)
        jac = len(sa & sb) / len(sa | sb)
        if jac >= 0.5:
            want.add((min(ia, ib), max(ia, ib)))

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert got == want


def test_verify_broadcast_regimes_agree(spark, monkeypatch):
    """The size-gated verify broadcast (round 6) only changes the
    physical join side, never the result: run ngram_jaccard_pairs and
    minhash_lsh_pairs with the budget forced to 0 (shuffle-join regime,
    the 100 TB plan) and at the default (broadcast regime for these
    tiny corpora) and pin both equal; also pin that the default regime
    actually planned a broadcast-hash verify join."""
    import random

    from pyspark_skyline_spark.plans.explain import formatted_plan

    rng = random.Random(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))))
        for i in range(60)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def pairs(fn, **kw):
        return {(r.id_a, r.id_b, round(r.jac, 9)) for r in fn(df, "doc_id", "text", **kw).collect()}

    bc_ng = pairs(D.ngram_jaccard_pairs, threshold=0.5)
    bc_mh = pairs(D.minhash_lsh_pairs, threshold=0.4)
    plan = formatted_plan(D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5))
    assert "BroadcastHashJoin" in plan, plan
    monkeypatch.setattr(D, "_VERIFY_BROADCAST_BUDGET", 0)
    assert pairs(D.ngram_jaccard_pairs, threshold=0.5) == bc_ng
    assert pairs(D.minhash_lsh_pairs, threshold=0.4) == bc_mh


def test_persisted_bytes_reads_checkpoint_size(spark):
    """Pin the block-manager metadata accessor itself (round-7 ADVICE):
    the regime-differential test above cannot distinguish the
    _persisted_bytes path from its aggregate-probe fallback (both
    decide broadcast on these fixtures), so a break in the accessor
    would regress silently to one extra probe job per invocation.
    Assert it returns a positive int on an eagerly localCheckpoint'ed
    DataFrame, and None on an unmaterialized plan."""
    df = spark.range(1000).localCheckpoint(eager=True)
    size = D._persisted_bytes(df)
    assert isinstance(size, int) and size > 0, size
    assert D._persisted_bytes(spark.range(10)) in (None, 0)


def test_seed_mix_rejects_unknown_mode(spark):
    """_seed_mix must raise on a typo'd mode instead of silently
    applying md5 semantics (round-7 ADVICE). Takes the spark fixture:
    F.lit needs an active SparkContext, and without requesting it this
    test only passed when earlier tests in the file had created one."""
    with pytest.raises(ValueError, match="hash_mode"):
        D._seed_mix(F.lit(1), 0, "xxhash65")


def test_minhash_bucket_cap_drops_giant_cluster_only(spark):
    """max_bucket_size: a 30-copy boilerplate cluster floods its buckets
    past the cap and drops out; an ordinary near-dup pair elsewhere
    survives. Uncapped run still finds everything."""
    boiler = [(i, "spam spam spam wonderful spam and eggs again") for i in range(30)]
    pair = [
        (100, "a distinctive document about distributed pareto frontiers ok"),
        (101, "a distinctive document about distributed pareto frontiers yes"),
    ]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    kw = dict(num_hashes=32, bands=8, threshold=0.4)
    capped = D.minhash_lsh_pairs(docs, "doc_id", "text", max_bucket_size=10, **kw)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}
    uncapped = D.minhash_lsh_pairs(docs, "doc_id", "text", **kw)
    assert uncapped.count() == 30 * 29 // 2 + 1


def test_simhash_pairs_complete_vs_bruteforce(spark):
    """Banded-LSH simhash pairs must equal the all-pairs Hamming
    filter (pigeonhole: bands > max_hamming => complete recall)."""
    import itertools
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(80)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choices(vocab, k=30))))
    # planted near-dups: copy with small perturbations
    for j, (src, _) in enumerate(docs[:6]):
        base = docs[src][1].split()
        base[rng.randrange(len(base))] = rng.choice(vocab)
        docs.append((100 + j, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    H = 8
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_pairs(
            df, "doc_id", "text", max_hamming=H, bands=10
        ).collect()
    }
    sigs = {
        r.doc_id: r.simhash_hi * (1 << 30) + r.simhash_lo
        for r in D.simhash(df, "doc_id", "text").collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin(sigs[a] ^ sigs[b]).count("1")
        if h <= H:
            want.add((a, b, h))
    assert got == want and len(want) > 0


def test_simhash_pairs_validates_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="must exceed"):
        D.simhash_pairs(df, "doc_id", "text", max_hamming=4, bands=4)
    with _pt.raises(ValueError, match="divide"):
        D.simhash_pairs(df, "doc_id", "text", max_hamming=6, bands=7)


def test_tfidf_topk_hand_computed(spark):
    import math

    from pyspark_skyline_spark.operators import text as T

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry durian"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.term): (r.tf, r.score, r.rank)
        for r in T.tfidf_topk_terms(df, "doc_id", "text", k=2).collect()
    }
    ln = math.log
    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert got[(1, "apple")] == (2, round(2 * ln(3 / 1), 6), 1)
    assert got[(1, "banana")] == (1, round(1 * ln(3 / 2), 6), 2)
    # doc 3: durian tf=1 df=1 (ln 3 ~ 1.10) beats cherry tf=2 df=2
    # (2 ln 1.5 ~ 0.81)
    assert got[(3, "durian")] == (1, round(ln(3.0), 6), 1)
    assert got[(3, "cherry")] == (2, round(2 * ln(3 / 2), 6), 2)
    assert len(got) == 6  # two per doc


def test_tfidf_ties_rank_by_term(spark):
    from pyspark_skyline_spark.operators import text as T

    df = spark.createDataFrame([(1, "zeta alpha")], "doc_id long, text string")
    got = [
        (r.term, r.rank)
        for r in T.tfidf_topk_terms(df, k=5).orderBy("rank").collect()
    ]
    assert got == [("alpha", 1), ("zeta", 2)]


def test_bm25_hand_computed(spark):
    import math

    from pyspark_skyline_spark.operators import text as T

    rows = [
        (1, "apple banana apple"),     # dl=3
        (2, "banana cherry"),          # dl=2
        (3, "cherry cherry durian"),   # dl=3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in T.bm25_scores(df, ["apple", "cherry"], k=3).collect()}
    n, avgdl, k1, b = 3, 8 / 3, 1.2, 0.75

    def bm25(tf, dfreq, dl):
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(round(bm25(2, 1, 3), 6), abs=1e-9)
    assert got[3] == pytest.approx(round(bm25(2, 2, 3), 6), abs=1e-9)
    assert got[2] == pytest.approx(round(bm25(1, 2, 2), 6), abs=1e-9)
    # doc with both hits would sum; here ordering: apple-rich doc first
    order = [r.doc_id for r in T.bm25_scores(df, ["apple", "cherry"], k=3).orderBy(
        F.col("score").desc(), "doc_id").collect()]
    assert order[0] == 1


def test_bm25_validates(spark):
    from pyspark_skyline_spark.operators import text as T

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        T.bm25_scores(df, [])


def test_mersenne_modmul_matches_bigint(spark):
    """The pure-long Mersenne-61 split-multiply helpers (round 10 —
    they replaced the decimal(20,0) formulation whose BigDecimal
    allocation churn caused the neardup bench row's 5-68 s run-to-run
    variance) are bit-identical to exact big-integer arithmetic on
    adversarial operands: 0, 1, p-1, all-ones masks at the 30/31-bit
    split boundaries, and random 60/61-bit values. Also pins the full
    md5-mode _seed_mix against the exact (a·h²+b·h+c) mod p polynomial
    — the contract every md5-mode DuckDB oracle (HUGEINT) relies on."""
    import random

    from pyspark.sql import functions as F

    from pyspark_skyline_spark.operators.dedup import (
        _MERSENNE61 as P,
        _fold61,
        _mix_param,
        _modmul61_const,
        _modsquare61,
        _seed_mix,
    )

    rng = random.Random(99)
    edge = [0, 1, 2, (1 << 31) - 1, 1 << 31, (1 << 30) - 1, 1 << 30,
            P - 1, P - 2, (1 << 60) - 1, (1 << 61) - 2]
    xs = edge + [rng.randrange(P) for _ in range(40)]
    ks = edge + [rng.randrange(P) for _ in range(5)]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    # fold: valid for v < 2^63
    folds = [(1 << 62) + 12345, (1 << 63) - 1, P, P + 1, 2 * P, 3 * P - 1]
    got = df.select(
        "x",
        _modsquare61(F.col("x")).alias("sq"),
        *[_modmul61_const(F.col("x"), k).alias(f"mul{i}") for i, k in enumerate(ks)],
    ).collect()
    for r in got:
        assert r["sq"] == (r["x"] * r["x"]) % P, r["x"]
        for i, k in enumerate(ks):
            assert r[f"mul{i}"] == (r["x"] * k) % P, (r["x"], k)
    fdf = spark.createDataFrame([(v,) for v in folds], "v long")
    for r in fdf.select("v", _fold61(F.col("v")).alias("f")).collect():
        assert r["f"] == r["v"] % P, r["v"]
    # full seed mix (h < 2^60, the md5 15-hex domain) for several seeds
    hdf = spark.createDataFrame(
        [(h,) for h in xs if h < (1 << 60)], "h long"
    )
    seeds = [0, 1, 7, 31]
    rows = hdf.select(
        "h", *[_seed_mix(F.col("h"), j, "md5").alias(f"s{j}") for j in seeds]
    ).collect()
    for r in rows:
        h2 = (r["h"] * r["h"]) % P
        for j in seeds:
            a, b, c = _mix_param(j)
            assert r[f"s{j}"] == (a * h2 + b * r["h"] + c) % P, (r["h"], j)
    # the SQL-string fast path (what minhash_signatures actually runs)
    # computes the identical polynomial
    from pyspark_skyline_spark.operators.dedup import (
        _md5_mix_base,
        _md5_mix_exprs,
    )

    base = _md5_mix_base(hdf.select(F.col("h").alias("__h")))
    rows2 = base.select("__h", *_md5_mix_exprs(8)).collect()
    for r in rows2:
        h2 = (r["__h"] * r["__h"]) % P
        for j in range(8):
            a, b, c = _mix_param(j)
            assert r[f"__h{j}"] == (a * h2 + b * r["__h"] + c) % P, (r["__h"], j)


def test_hash_embed_matches_python(spark):
    import hashlib

    from pyspark_skyline_spark.operators import text as T

    rows = [(1, "apple banana apple"), (2, ""), (3, "cherry")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dim = 8
    got = {r.doc_id: list(r.embedding) for r in T.hash_embed(df, dim=dim).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {1: [0.0] * dim, 2: [0.0] * dim, 3: [0.0] * dim}
    for doc, text in rows:
        for t in text.lower().split():
            sgn = 1.0 if h60(f"{t}#1") % 2 == 0 else -1.0
            want[doc][h60(t) % dim] += sgn
    assert got == want


def test_hash_embed_composes_with_cosine_topk(spark, sf_dir):
    from pyspark_skyline_spark.operators import similarity as S
    from pyspark_skyline_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    emb = T.hash_embed(docs, dim=32, hash_mode="xxhash64")
    top = S.cosine_topk(emb, "doc_id", "embedding", probe_id=0, k=5).collect()
    assert len(top) == 5
    assert all(r.doc_id != 0 for r in top)


def test_dedup_incremental_drops_known_and_batch_dups(spark):
    known = spark.createDataFrame(
        [(1, "seen before text"), (2, "also known already")],
        "doc_id long, text string",
    )
    ledger = T.fingerprint(known).select("fp")
    new = spark.createDataFrame(
        [
            (10, "Seen   BEFORE text"),     # normalizes to a known fp -> dropped
            (11, "brand new document one"),
            (12, "brand  NEW document one"), # in-batch dup of 11 -> dropped
            (13, "another fresh document"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r.doc_id for r in D.dedup_incremental(new, ledger, "doc_id").collect()
    )
    assert got == [11, 13]


def test_dedup_incremental_neardup(spark):
    """Near-dup incremental ingest vs a signature ledger: a lightly
    edited copy of a known doc is dropped, fresh docs survive with
    signatures appended, short no-shingle docs survive with NULLs."""
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet green field toward the distant hills today"
    )
    known = spark.createDataFrame(
        [(100, base), (101, "an entirely different known document about spark joins "
                            "and shuffle partitioning strategies at large scale")],
        "ledger_id long, text string",
    )
    ledger = D.minhash_signatures(known, "ledger_id", "text", num_hashes=64)

    near_copy = base.replace("lazy dog", "sleepy dog")  # high Jaccard vs 100
    new = spark.createDataFrame(
        [
            (10, near_copy),
            (11, "completely unrelated fresh text about duckdb oracles and "
                 "parquet footers with statistics for pruning row groups"),
            (12, "tiny"),  # shorter than shingle k -> one degenerate shingle
        ],
        "doc_id long, text string",
    )
    out = D.dedup_incremental_neardup(
        new, ledger, "doc_id", threshold=0.5, num_hashes=64, bands=16
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {11, 12}          # near-copy of 100 dropped
    assert rows[11].m0 is not None        # signatures ready for the ledger
    assert "text" in out.columns and out.count() == 2

    # threshold=1.0 only drops exact-signature matches -> near-copy survives
    out_strict = D.dedup_incremental_neardup(
        new, ledger, "doc_id", threshold=1.0, num_hashes=64, bands=16
    )
    assert {r.doc_id for r in out_strict.collect()} == {10, 11, 12}

    # ledger schema validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ledger_sigs missing"):
        D.dedup_incremental_neardup(new, known, "doc_id")
    with _pytest.raises(ValueError, match="threshold"):
        D.dedup_incremental_neardup(new, ledger, "doc_id", threshold=0.0)


def test_dedup_incremental_neardup_signature_estimate(spark):
    """The signature-estimate verify agrees with minhash_lsh_pairs'
    banding: a doc identical to a ledger doc has estimate 1.0 and is
    dropped even at threshold=1.0."""
    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    known = spark.createDataFrame([(1, text)], "ledger_id long, text string")
    ledger = D.minhash_signatures(known, "ledger_id", "text")
    new = spark.createDataFrame([(2, text), (3, "other words entirely here")],
                                "doc_id long, text string")
    out = D.dedup_incremental_neardup(new, ledger, "doc_id", threshold=1.0)
    assert {r.doc_id for r in out.collect()} == {3}


def test_minhash_banding_recall_at_moderate_jaccard(spark):
    """Regression for the seed-mix fix: pairs at Jaccard ~0.6-0.75 must
    reach the verify stage. Under the old XOR mix all 64 components
    shared one argmin, so candidate recall collapsed to ~J (a J=0.7
    pair was MISSED ~30% of the time); with independent per-seed
    re-hashes the banded S-curve gives P(candidate) ~ 1-(1-J^4)^16 >
    0.99 at J=0.7."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    planted = []
    for i in range(20):
        base = [rng.choice(vocab) for _ in range(40)]
        edited = list(base)
        # replace 4 of 40 tokens -> shingle Jaccard ~0.55-0.75
        for pos in rng.sample(range(2, 38), 4):
            edited[pos] = rng.choice(vocab)
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(edited)))
        planted.append((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    hits = sum(1 for p in planted if p in got)
    assert hits >= 18, f"recall {hits}/20 — banding is missing moderate-J pairs"
    # md5 mode uses a DIFFERENT seed mix since round 7 — the degree-2
    # polynomial scramble (a_j*(h² mod p) + b_j*h + c_j) mod 2^61-1 in
    # exact decimal arithmetic (engine-portable, one md5 per shingle
    # instead of H). Bar calibration: the planted pairs sit at true
    # J 0.52-0.62, where IDEAL random permutations give
    # E[hits] = Σ 1-(1-J⁴)^16 = 15.5 (median 16, P(>=18) ≈ 0.14 — the
    # xxhash bar above rides that function's lucky deterministic
    # draw). The md5 mix lands exactly on the ideal median; an
    # XOR-style collapse (the round-3 bug class, recall ~J) would
    # score ~11 and fail this bar loudly.
    md5_pairs = D.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.4, hash_mode="md5"
    )
    md5_got = {(r.id_a, r.id_b) for r in md5_pairs.collect()}
    md5_hits = sum(1 for p in planted if p in md5_got)
    assert md5_hits >= 15, f"md5-mode recall {md5_hits}/20 — seed mix collapsed"


def test_extract_domains(spark):
    from pyspark_skyline_spark.operators.text import extract_domains

    rows = [
        (1, "see https://WWW.Example.COM/path?q=1 and http://sub.site.org/x ."),
        (2, "plain text, no links"),
        (3, "dup https://a.com/x https://A.com/y and https://b.net"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.domain) for r in extract_domains(df, "doc_id").collect()}
    assert got == {
        (1, "example.com"),
        (1, "sub.site.org"),
        (3, "a.com"),   # lowercased + deduped
        (3, "b.net"),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        extract_domains(df, "nope")


def test_dedup_incremental_neardup_blank_text_survives(spark):
    """NULL/blank docs carry no shingle content: they must survive with
    NULL signatures instead of matching every empty ledger doc."""
    known = spark.createDataFrame([(1, "   ")], "ledger_id long, text string")
    # ledger built on raw minhash_signatures (degenerate "" shingle)
    ledger = D.minhash_signatures(known, "ledger_id", "text")
    new = spark.createDataFrame(
        [(10, None), (11, ""), (12, "  "), (13, "real content words here")],
        "doc_id long, text string",
    )
    out = D.dedup_incremental_neardup(new, ledger, "doc_id", threshold=0.5)
    rows = {r.doc_id: r.m0 for r in out.collect()}
    assert set(rows) == {10, 11, 12, 13}
    assert rows[10] is None and rows[11] is None and rows[12] is None
    assert rows[13] is not None


def test_extract_domains_trailing_dot_and_userinfo(spark):
    from pyspark_skyline_spark.operators.text import extract_domains

    rows = [
        (1, "end of sentence https://example.com. Next."),
        (2, "login http://alice:pw@evil.example.com/x now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.domain) for r in extract_domains(df, "doc_id").collect()}
    assert got == {(1, "example.com"), (2, "evil.example.com")}


def test_char_entropy(spark):
    import math

    from pyspark_skyline_spark.operators.text import char_entropy

    rows = [
        (1, "aaaa"),            # zero entropy
        (2, "hello"),           # 1.921928 bits (h,e,2xl,o)
        (3, None),              # NULL -> NULL
        (4, ""),                # empty -> NULL
        (5, "ABBA"),            # lowercased: a,b,b,a -> 1 bit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.entropy for r in char_entropy(df, "doc_id").collect()}
    assert out[1] == 0.0
    assert out[2] == round(-(0.2 * math.log2(0.2) * 3 + 0.4 * math.log2(0.4)), 6)
    assert out[3] is None and out[4] is None
    assert out[5] == 1.0
    # cap bounds the work: entropy computed on the first max_chars only
    long = spark.createDataFrame([(9, "ab" * 5000)], "doc_id long, text string")
    assert char_entropy(long, "doc_id", max_chars=100).first().entropy == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        char_entropy(df, "nope")


def test_substring_dedup_spans_semantics(spark):
    """Planted cases for the round-8 substring-dedup operator: a
    cross-doc duplicated 4-token run yields one merged span in each
    doc; two disjoint duplicated runs in one doc yield two spans; an
    internal within-doc repeat is caught; unique docs and docs shorter
    than k yield nothing; hash modes agree."""
    k = 4
    shared = "alpha beta gamma delta epsilon"            # 5 tokens -> span of 5
    docs = [
        (1, f"unique one {shared} trailing words here"),  # span tokens 3..7
        (2, f"{shared} and then different text follows"), # span tokens 1..5
        (3, "x1 x2 x3 x4 middle gap y1 y2 y3 y4"),        # two runs, dup'd in doc 4
        (4, "x1 x2 x3 x4 other stuff y1 y2 y3 y4"),
        (5, "r1 r2 r3 r4 sep r1 r2 r3 r4"),               # within-doc repeat
        (6, "totally unique document with no duplication at all"),
        (7, "too short"),                                  # < k tokens
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def spans(mode):
        return {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in D.substring_dedup_spans(
                df, "doc_id", "text", k=k, hash_mode=mode
            ).collect()
        }

    got = spans("md5")
    assert got == spans("xxhash64")
    assert got == {
        (1, 3, 7, 5),
        (2, 1, 5, 5),
        (3, 1, 4, 4), (3, 7, 10, 4),
        (4, 1, 4, 4), (4, 7, 10, 4),
        (5, 1, 4, 4), (5, 6, 9, 4),
    }, got


def test_substring_dedup_spans_edge_cases(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.substring_dedup_spans(empty, "doc_id", "text", k=3).count() == 0
    with _pytest.raises(ValueError, match="k must be"):
        D.substring_dedup_spans(empty, "doc_id", "text", k=0)
    # adjacent-but-not-overlapping duplicated windows merge: doc 1/2
    # share tokens 1..6 -> windows at 1,2,3 (k=4) merge into one span
    df = spark.createDataFrame(
        [(1, "a b c d e f tail1"), (2, "a b c d e f tail2")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in D.substring_dedup_spans(df, "doc_id", "text", k=4).collect()
    }
    assert got == {(1, 1, 6), (2, 1, 6)}


def test_substring_scrub_applies_spans(spark):
    """substring_scrub drops ALL occurrences of duplicated windows and
    reassembles normalized-token text; clean docs and sub-k docs pass
    through intact (one output row per input doc)."""
    k = 4
    docs = [
        (1, "HEADER one two three body alpha beta"),
        (2, "header one two three other content here"),
        (3, "nothing shared with anyone at all"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_scrubbed, r.n_tokens, r.n_dropped)
        for r in D.substring_scrub(df, "doc_id", "text", k=k).collect()
    }
    # docs 1/2 share the 4-token window "header one two three"
    assert got[1] == ("body alpha beta", 7, 4)
    assert got[2] == ("other content here", 7, 4)
    assert got[3] == ("nothing shared with anyone at all", 6, 0)
    assert got[4] == ("tiny doc", 2, 0)
    assert len(got) == 4
    # NULL text coalesces to empty on both operator and oracle sides
    # (round-8 review: the operator used to return NULLs while the
    # oracle returned '' — a latent exactly-oracled-row divergence)
    with_null = df.unionByName(
        spark.createDataFrame([(9, None)], "doc_id long, text string")
    )
    got9 = {
        r.doc_id: (r.text_scrubbed, r.n_tokens, r.n_dropped)
        for r in D.substring_scrub(with_null, "doc_id", "text", k=k).collect()
    }[9]
    assert got9 == ("", 1, 0)


def test_unigram_nll_matches_hand_model(spark):
    """unigram_nll == hand-computed add-one unigram NLL on a tiny
    corpus; common-vocabulary docs score lower than rare-vocabulary
    ones (the quality-filter property)."""
    import math

    texts = {1: "a a b", 2: "a b c", 3: "zzz qqq"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    # corpus model
    from collections import Counter
    all_toks = [t for s in texts.values() for t in s.split()]
    c = Counter(all_toks)
    N, V = len(all_toks), len(c)
    def nll(doc):
        ts = texts[doc].split()
        return sum(-math.log((c[t] + 1) / (N + V)) for t in ts) / len(ts)
    got = {
        r.doc_id: (r.avg_nll, r.n_tokens)
        for r in T.unigram_nll(df, "doc_id", "text").collect()
    }
    for d in texts:
        assert abs(got[d][0] - nll(d)) < 1e-9, d
        assert got[d][1] == len(texts[d].split())
    assert got[3][0] > got[1][0]  # rare vocab scores worse


def test_bigram_nll_matches_hand_model(spark):
    """bigram_nll == hand-computed add-one bigram NLL on a tiny corpus;
    a shuffled-order doc built from COMMON vocabulary scores worse than
    its in-order twin (the word-order sensitivity unigram_nll lacks);
    single-token and empty/NULL docs produce no row."""
    import math
    from collections import Counter

    texts = {1: "a b c d", 2: "a b c d", 3: "d a c b", 4: "x", 5: None}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    toks = {d: (t or "").split() for d, t in texts.items()}
    bgs = [
        (ts[i], ts[i + 1])
        for ts in toks.values()
        for i in range(len(ts) - 1)
    ]
    c = Counter(bgs)
    ctx = Counter(b[0] for b in bgs)
    vocab = len({t for ts in toks.values() for t in ts})

    def nll(doc):
        ts = toks[doc]
        ps = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        return sum(
            -math.log((c[p] + 1) / (ctx[p[0]] + vocab)) for p in ps
        ) / len(ps)

    got = {
        r.doc_id: (r.avg_nll, r.n_bigrams)
        for r in T.bigram_nll(df, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2, 3}  # no bigrams -> no row (docs 4, 5)
    for d in (1, 2, 3):
        assert abs(got[d][0] - nll(d)) < 1e-9, d
        assert got[d][1] == len(toks[d]) - 1
    # doc 3 uses the exact same unigrams as 1/2 but in an order the
    # corpus never repeats -> higher bigram NLL
    assert got[3][0] > got[1][0]


def test_slice_divergence_matches_hand_model(spark):
    """slice_divergence == hand-computed KL/JS vs the pooled corpus on
    a tiny two-slice corpus; a slice identical in distribution to the
    corpus scores ~0 on both; KL >= 0 and 0 <= JS <= ln 2 always."""
    import math
    from collections import Counter

    texts = {
        ("en", 1): "the cat sat on the mat",
        ("en", 2): "the dog sat on the rug",
        ("fr", 3): "le chat dort sur le tapis",
        ("fr", 4): "le chien dort sur le lit",
    }
    df = spark.createDataFrame(
        [(lang, t) for (lang, _), t in texts.items()], "lang string, text string"
    )
    by_g: dict[str, Counter] = {}
    for (lang, _), t in texts.items():
        by_g.setdefault(lang, Counter()).update(t.split())
    corpus = Counter()
    for cnt in by_g.values():
        corpus.update(cnt)
    n = sum(corpus.values())

    def hand(g):
        cnt = by_g[g]
        ng = sum(cnt.values())
        kl = js_sup = qcov = 0.0
        for t, cg in cnt.items():
            p, q = cg / ng, corpus[t] / n
            m = (p + q) / 2
            kl += p * math.log(p / q)
            js_sup += p * math.log(p / m) + q * math.log(q / m)
            qcov += q
        return kl, 0.5 * (js_sup + math.log(2) * (1 - qcov)), ng, len(cnt)

    got = {
        r["lang"]: r
        for r in T.slice_divergence(df, "lang", "text").collect()
    }
    assert set(got) == {"en", "fr"}
    for g in ("en", "fr"):
        kl, js, ng, vg = hand(g)
        assert abs(got[g]["kl_vs_corpus"] - kl) < 1e-9, g
        assert abs(got[g]["js_vs_corpus"] - js) < 1e-9, g
        assert got[g]["n_tokens"] == ng and got[g]["vocab"] == vg
        assert kl >= 0 and 0 <= js <= math.log(2) + 1e-12


def test_slice_divergence_degenerate_single_slice(spark):
    """One slice == the corpus -> p == q everywhere -> KL = JS = 0 (up
    to float fold-order), and full corpus-mass coverage."""
    df = spark.createDataFrame(
        [("a", "x y z x"), ("a", "z y w")], "src string, text string"
    )
    row = T.slice_divergence(df, "src", "text").collect()[0]
    assert row["src"] == "a"
    assert abs(row["kl_vs_corpus"]) < 1e-12
    assert abs(row["js_vs_corpus"]) < 1e-12
    assert row["n_tokens"] == 7 and row["vocab"] == 4


def test_pmi_collocations_matches_hand_model(spark):
    """pmi_collocations == hand-computed PMI over adjacent pairs; the
    min_count predicate decides the row set; a pair that always
    co-occurs scores higher than independent-ish pairs."""
    import math
    from collections import Counter

    texts = [
        "new york is big",
        "new york never sleeps",
        "a big apple in new york",
        "the apple is big",
        "york new",  # reversed order: a DIFFERENT pair
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    toks = [t.split() for t in texts if t]
    unis = Counter(w for ts in toks for w in ts)
    bgs = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    nu, nbg = sum(unis.values()), sum(bgs.values())

    def pmi(p):
        return math.log((bgs[p] / nbg) / ((unis[p[0]] / nu) * (unis[p[1]] / nu)))

    got = {
        (r["w1"], r["w2"]): r
        for r in T.pmi_collocations(df, "text", min_count=2).collect()
    }
    want = {p for p, c in bgs.items() if c >= 2}
    assert set(got) == want
    for p in want:
        r = got[p]
        assert r["pair_count"] == bgs[p]
        assert r["w1_count"] == unis[p[0]] and r["w2_count"] == unis[p[1]]
        assert abs(r["pmi"] - pmi(p)) < 1e-9, p
    # both surviving pairs co-occur more than independence predicts
    # (("is","big") actually outscores ("new","york") here — its
    # unigrams are rarer — which the hand model reproduces exactly)
    assert all(got[p]["pmi"] > 0 for p in want)

    with pytest.raises(ValueError, match="min_count"):
        T.pmi_collocations(df, "text", min_count=0)


def test_dedup_keep_best_matches_hand_model(spark):
    """dedup_keep_best: per-cluster winner by (quality desc, id); docs
    absent from the pair graph are their own singleton clusters and
    always keep; NULL quality sorts last; lower-is-better flips the
    winner; missing column raises."""
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (4, 50), (5, None), (6, 300)],
        "doc_id long, n_chars int",
    )
    # graph: {1,2,3} one cluster, {5,6} another; 4 is a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in D.dedup_keep_best(docs, pairs).collect()
    }
    assert out == {
        1: (1, False),
        2: (1, True),   # 300 chars beats 100/200
        3: (1, False),
        4: (4, True),   # singleton keeps itself
        5: (5, False),  # NULL quality loses to 6
        6: (5, True),
    }
    # lower-is-better: 1 (100 chars) wins its cluster; NULL still last
    out2 = {
        r["doc_id"]: r["keep"]
        for r in D.dedup_keep_best(
            docs, pairs, higher_is_better=False
        ).collect()
    }
    assert out2 == {1: True, 2: False, 3: False, 4: True, 5: False, 6: True}

    with pytest.raises(ValueError, match="must be columns"):
        D.dedup_keep_best(docs, pairs, quality_col="nope")


def test_dedup_keep_best_rejects_non_integral_id(spark):
    """A non-integral id would cast to NULL in the singleton fallback
    and silently collapse every singleton into one NULL cluster — the
    operator refuses loudly instead (review find)."""
    docs = spark.createDataFrame([("u1", 5)], "doc_id string, n_chars int")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError, match="integral type"):
        D.dedup_keep_best(docs, pairs)


def test_dedup_keep_best_rejects_duplicate_ids(spark):
    """Duplicated ids would fan the cluster join out and emit multiple
    rows per id with an arbitrary single keeper among the copies — the
    operator raises loudly like snapshot_diff/merge_upsert (advisor
    find); assume_unique=True is the documented escape hatch."""
    docs = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "doc_id long, n_chars int"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError, match="duplicate ids"):
        D.dedup_keep_best(docs, pairs)
    # escape hatch skips the scan (caller owns the precondition)
    out = D.dedup_keep_best(docs, pairs, assume_unique=True).collect()
    assert len(out) == 3


def test_adjacent_pairs_empty_array_yields_empty(spark):
    """adjacent_pairs on an empty/singleton array returns [] instead of
    throwing — size(toks)-1 is -1 for an empty array and Spark's slice
    rejects negative lengths; the length is clamped at 0 (advisor
    find). Unreachable via tokens() but the helper takes arbitrary
    array columns."""
    df = spark.createDataFrame(
        [(1, []), (2, ["only"]), (3, ["a", "b", "c"])],
        "id long, toks array<string>",
    )
    out = {
        r["id"]: r["pairs"]
        for r in df.select(
            "id",
            T.adjacent_pairs(
                F.col("toks"), lambda a, b: F.concat_ws(" ", a, b)
            ).alias("pairs"),
        ).collect()
    }
    assert out == {1: [], 2: [], 3: ["a b", "b c"]}


def test_shingle_novelty_matches_hand_model(spark):
    """shingle_novelty == hand-computed unique-shingle fractions: an
    exact duplicate pair scores 0 (nothing it says is unique), a
    unique doc scores 1, a part-copy lands in between; short texts use
    the whole-text fallback shingle; NULL drops."""
    texts = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta epsilon",       # exact dup of 1
        3: "totally original words never repeated anywhere",
        4: "alpha beta gamma delta NEW TAIL HERE",  # shares a prefix
        5: "tiny",                                  # fallback shingle
        6: None,
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def sh(t):
        toks = t.strip().lower().split()
        if len(toks) >= 3:
            return set(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
        return {" ".join(toks)}

    from collections import Counter

    dfreq = Counter()
    for d, t in texts.items():
        if t is not None:
            dfreq.update(sh(t))
    got = {
        r["doc_id"]: r
        for r in D.shingle_novelty(df, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    for d in got:
        s = sh(texts[d])
        uniq = sum(1 for x in s if dfreq[x] == 1)
        assert got[d]["n_shingles"] == len(s), d
        assert got[d]["n_unique"] == uniq, d
        assert got[d]["novelty"] == pytest.approx(uniq / len(s), abs=0), d
    assert got[1]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0 and got[5]["novelty"] == 1.0
    assert 0.0 < got[4]["novelty"] < 1.0


def test_xx_mix_sqls_matches_seed_mix_columns(spark):
    """Round-14 driver-chatter fix: the xxhash64-mode per-seed mixes
    shipped as ONE selectExpr SQL string must produce bit-identical
    values to the original Column-API _seed_mix form."""
    h = spark.range(0, 512).select(
        F.col("id"), F.xxhash64(F.col("id").cast("string")).alias("__h")
    )
    old = h.select(
        "id",
        *[D._seed_mix(F.col("__h"), j, "xxhash64").alias(f"__h{j}") for j in range(8)],
    )
    new = h.selectExpr("`id`", *D._xx_mix_sqls(8))
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_near_dup_clusters_driver_path_empty_and_broadcastable(spark):
    """Round 14: the driver union-find path returns an Arrow-built,
    broadcast-hinted table. Empty input must still yield an empty
    (node, cluster_id) frame, and a consumer equi-join against the
    label table must plan as a broadcast join (the table is
    driver-resident and bounded by driver_edge_limit)."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = D.near_dup_clusters(empty)
    assert got.columns == ["node", "cluster_id"]
    assert got.count() == 0

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    clusters = D.near_dup_clusters(pairs)
    docs = spark.range(0, 10).select(F.col("id").alias("node"))
    plan = docs.join(clusters, "node", "left")._jdf.queryExecution().executedPlan()
    assert "BroadcastHashJoin" in str(plan.treeString())


def test_spread_for_compute_decisions(spark):
    """Round-14 stats-probe rewrite: a small single-file scan still
    spreads to cluster parallelism, and a small post-shuffle input
    (fuzzy's respread-after-distinct case, which AQE would byte-coalesce
    to a few tasks) spreads too."""
    import os
    import tempfile

    target = spark.sparkContext.defaultParallelism
    path = os.path.join(tempfile.mkdtemp(prefix="spread_"), "t.parquet")
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path)
    assert D.spread_for_compute(scan).rdd.getNumPartitions() == target
    shuffled = scan.distinct()
    assert D.spread_for_compute(shuffled).rdd.getNumPartitions() == target
