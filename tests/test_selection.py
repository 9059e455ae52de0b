"""DSIR data-selection operators vs a hand-computed NumPy-free model
(operators/selection.py). The hand model re-derives the hashed-feature
buckets, the two add-one multinomials, and the log-weights from first
principles so any drift in the Spark plan (tokenization, bigram
construction, smoothing, join shape) fails loudly."""

import hashlib
import math

import pytest

from pyspark_skyline_spark.operators.selection import dsir_logweights, dsir_select

RAW = [
    (1, "the cat sat on the mat", "en"),
    (2, "le chat noir dort sur le tapis", "fr"),
    (3, "the dog ran to the park and the dog sat", "en"),
    (4, "der hund schläft auf der matte", "de"),
    (5, "a cat and a dog sat on a mat", "en"),
    (6, "le chien court dans le parc", "fr"),
    (7, "one", "en"),
]
TARGET_LANG = "en"
B = 64


def _hand_bucket(feat: str) -> int:
    # the repo's md5-mode 60-bit hash (dedup.hash64_expr) mod B
    return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % B


def _hand_feats(text: str, include_bigrams: bool = True) -> list[str]:
    toks = text.strip().lower().split()
    feats = list(toks)
    if include_bigrams:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return feats


def _hand_logweights(include_bigrams: bool = True) -> dict[int, tuple[float, int]]:
    q: dict[int, int] = {}
    p: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, text, lang in RAW:
        bs = [_hand_bucket(f) for f in _hand_feats(text, include_bigrams)]
        doc_buckets[doc_id] = bs
        for b in bs:
            q[b] = q.get(b, 0) + 1
            if lang == TARGET_LANG:
                p[b] = p.get(b, 0) + 1
    nq = sum(q.values())
    np_ = sum(p.values())
    out = {}
    for doc_id, bs in doc_buckets.items():
        logw = sum(
            math.log((p.get(b, 0) + 1.0) / (np_ + B))
            - math.log((q[b] + 1.0) / (nq + B))
            for b in bs
        )
        out[doc_id] = (logw, len(bs))
    return out


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string, lang string")


@pytest.mark.parametrize("include_bigrams", [True, False])
def test_dsir_logweights_match_hand_model(spark, raw_df, include_bigrams):
    tgt = raw_df.filter(f"lang = '{TARGET_LANG}'")
    got = {
        r["doc_id"]: (r["logw"], r["n_feats"])
        for r in dsir_logweights(
            raw_df,
            tgt,
            n_buckets=B,
            include_bigrams=include_bigrams,
            hash_mode="md5",
        ).collect()
    }
    want = _hand_logweights(include_bigrams)
    assert set(got) == set(want)
    for doc_id, (logw, n_feats) in want.items():
        assert got[doc_id][1] == n_feats
        assert got[doc_id][0] == pytest.approx(logw, rel=1e-9, abs=1e-9)


def test_dsir_logweights_separate_target(spark, raw_df):
    """English docs must outscore non-English ones when the target is
    the English slice (the operator's whole point), and the xxhash64
    production mode preserves that ordering (different buckets, same
    statistics)."""
    tgt = raw_df.filter(f"lang = '{TARGET_LANG}'")
    for mode in ("md5", "xxhash64"):
        rows = {
            r["doc_id"]: r["logw"]
            for r in dsir_logweights(
                raw_df, tgt, n_buckets=B, hash_mode=mode
            ).collect()
        }
        en = [rows[i] for i, _, lang in RAW if lang == "en" and i != 7]
        non_en = [rows[i] for i, _, lang in RAW if lang != "en"]
        assert min(en) > max(non_en), mode


def test_dsir_logweights_null_text_absent(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    got = dsir_logweights(df, df.filter("doc_id = 1"), n_buckets=B).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_dsir_select_cut_is_exact(spark, raw_df):
    tgt = raw_df.filter(f"lang = '{TARGET_LANG}'")
    out = dsir_select(
        raw_df, tgt, keep_frac=0.4, n_buckets=B, hash_mode="md5"
    ).collect()
    assert len(out) == len(RAW)
    kept = sorted(r["doc_id"] for r in out if r["keep"])
    assert len(kept) == math.ceil(0.4 * len(RAW))
    # the kept set is exactly the top-|kept| by (logw desc, id asc)
    ranked = sorted(out, key=lambda r: (-r["logw"], r["doc_id"]))
    assert kept == sorted(r["doc_id"] for r in ranked[: len(kept)])
    # and the schema is the logweights schema + keep
    assert sorted(out[0].asDict()) == ["doc_id", "keep", "logw", "n_feats"]


def test_dsir_validation(spark, raw_df):
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logweights(raw_df, raw_df, n_buckets=1)
    with pytest.raises(ValueError, match="keep_frac"):
        dsir_select(raw_df, raw_df, keep_frac=0.0)


def test_dsir_select_gumbel_mode(spark, raw_df):
    """Gumbel mode: exact cut cardinality holds per seed; a fixed seed
    is reproducible across partition layouts; different seeds produce
    different kept sets somewhere (it IS sampling); and across seeds
    the highest-weight doc is kept at least as often as the lowest
    (proportional-to-exp(logw) sampling, coarse sanity)."""
    tgt = raw_df.filter(f"lang = '{TARGET_LANG}'")

    def kept(seed, df):
        out = dsir_select(
            df, tgt, keep_frac=0.4, n_buckets=B, hash_mode="md5",
            sample_mode="gumbel", seed=seed,
        ).collect()
        return frozenset(r["doc_id"] for r in out if r["keep"])

    k0 = kept(0, raw_df)
    assert len(k0) == math.ceil(0.4 * len(RAW))
    assert k0 == kept(0, raw_df.repartition(5))  # layout-independent
    seeds = range(12)
    sets = [kept(s, raw_df) for s in seeds]
    assert any(s != k0 for s in sets)  # different seeds really resample
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(raw_df, tgt, n_buckets=B, hash_mode="md5").collect()
    }
    best = max(w, key=w.get)
    worst = min(w, key=w.get)
    n_best = sum(best in s for s in sets)
    n_worst = sum(worst in s for s in sets)
    assert n_best >= n_worst

    with pytest.raises(ValueError, match="sample_mode"):
        dsir_select(raw_df, tgt, sample_mode="bogus")


def test_dsir_select_exact_matches_hand_model_and_ties(spark):
    """dsir_select_exact (round 10): ranks equal the hand model's
    (score desc, id) order; exact-DUPLICATE texts (the fold-order
    caveat class that keeps the float-sum select out of the oracle)
    get adjacent ranks in id order regardless of partition layout;
    output is all integer/boolean; keep cuts at ceil(keep_frac*N)."""
    from pyspark_skyline_spark.operators.selection import dsir_select_exact

    rows = RAW + [
        (8, "the cat sat on the mat", "en"),   # exact duplicate of 1
        (9, "the cat sat on the mat", "fr"),   # and another
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tgt = df.filter(f"lang = '{TARGET_LANG}'")

    # hand model over the augmented corpus
    q: dict[int, int] = {}
    p: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, text, lang in rows:
        bs = [_hand_bucket(f) for f in _hand_feats(text)]
        doc_buckets[doc_id] = bs
        for b in bs:
            q[b] = q.get(b, 0) + 1
            if lang == TARGET_LANG:
                p[b] = p.get(b, 0) + 1
    nq, np_ = sum(q.values()), sum(p.values())
    score = {
        d: sum(
            math.log((p.get(b, 0) + 1.0) / (np_ + B))
            - math.log((q[b] + 1.0) / (nq + B))
            for b in bs
        )
        for d, bs in doc_buckets.items()
    }
    want_order = sorted(score, key=lambda d: (-score[d], d))
    k = math.ceil(0.4 * len(rows))

    for layout in (df, df.repartition(7)):
        got = {
            r["doc_id"]: r
            for r in dsir_select_exact(
                layout, tgt, keep_frac=0.4, n_buckets=B, hash_mode="md5"
            ).collect()
        }
        assert [d for d, _ in sorted(
            ((d, got[d]["rank"]) for d in got), key=lambda t: t[1]
        )] == want_order
        assert {d for d in got if got[d]["keep"]} == set(want_order[:k])
        assert all(got[d]["n_feats"] == len(doc_buckets[d]) for d in got)
        # duplicates 1, 8, 9 share one exact score -> adjacent ranks
        # in id order (the tie-exact contract)
        r1, r8, r9 = (got[d]["rank"] for d in (1, 8, 9))
        assert (r8, r9) == (r1 + 1, r1 + 2)

    with pytest.raises(ValueError, match="keep_frac"):
        dsir_select_exact(df, tgt, keep_frac=0.0)


def test_target_filter_path_bit_equal(spark, raw_df):
    """Round-13 optimization: the single-pass target_filter path must be
    BIT-identical to the two-DataFrame path for every operator (the fit
    counts are integers either way, so any divergence is a plan bug,
    not float noise)."""
    from pyspark.sql import functions as F

    from pyspark_skyline_spark.operators.selection import dsir_select_exact

    tgt_df = raw_df.filter(F.col("lang") == TARGET_LANG)
    flt = F.col("lang") == TARGET_LANG
    for fn, kw in (
        (dsir_logweights, {}),
        (dsir_select_exact, {"keep_frac": 0.4}),
        (dsir_select, {"keep_frac": 0.4, "sample_mode": "gumbel"}),
    ):
        a = {
            r["doc_id"]: r.asDict()
            for r in fn(
                raw_df, tgt_df, n_buckets=B, hash_mode="md5", **kw
            ).collect()
        }
        b = {
            r["doc_id"]: r.asDict()
            for r in fn(
                raw_df, n_buckets=B, hash_mode="md5", target_filter=flt, **kw
            ).collect()
        }
        assert a == b, fn.__name__

    with pytest.raises(ValueError, match="exactly one"):
        dsir_logweights(raw_df, tgt_df, target_filter=flt)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_logweights(raw_df)
