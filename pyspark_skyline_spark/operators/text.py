"""Text-analysis operators for LLM-data pipelines (north-star extension;
the reference has no string functions beyond casts — SURVEY.md §2.3).

All hot-path expressions are native ``pyspark.sql.functions`` (JVM-side,
codegen) — no Python UDFs — and every operator has an exactly-equivalent
ANSI-SQL formulation so DuckDB can oracle it. Arithmetic sticks to
integers/booleans where possible so cross-engine value hashes match
bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "extract_domains",
    "char_entropy",
    "tokens",
    "token_count",
    "subword_count",
    "subword_encode",
    "subword_decode",
    "learn_bpe_merges",
    "bpe_from_histogram",
    "bpe_encode",
    "GREEDY_VOCAB",
    "text_stats",
    "lang_id",
    "fingerprint",
    "winnow_fingerprints",
    "quality_flags",
    "chunk_documents",
    "vocab_topk",
    "ngram_counts",
    "tfidf_topk_terms",
    "bm25_scores",
    "hash_embed",
    "unigram_nll",
    "slice_divergence",
    "pmi_collocations",
    "LANG_MARKERS",
]


def tokens(col) -> Column:
    """Whitespace tokens of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def adjacent_pairs(toks: Column, combine) -> Column:
    """Array of ``combine(toks[i], toks[i+1])`` over a token array's
    adjacent positions (1-based slice convention — the one every
    DuckDB oracle mirrors as ``range(1, len(toks))``). ``combine`` is
    a two-Column lambda; built on ``zip_with`` over two shifted slices
    because zip_with children evaluate once per row (a ``transform``
    over indices re-evaluates the token expression per ELEMENT — the
    ~50x interpreted-HOF penalty documented at
    dedup.ordered_shingles). Shared by bigram_nll, pmi_collocations,
    and selection._occ_buckets so the index arithmetic exists
    exactly once. The slice length is clamped at 0 — ``size(toks)-1``
    is -1 for an empty array and Spark's ``slice`` throws on negative
    length (unreachable via tokens(), whose split never yields an
    empty array, but this helper takes arbitrary array columns)."""
    pair_len = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        combine,
    )


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(F.col(text_col))))


#: BPE-ish lexer classes: letter runs, digit runs, non-space symbol runs.
#: ASCII classes only so the Java and PCRE/RE2 regex dialects agree.
_SUBWORD_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def subword_count(
    df: DataFrame, text_col: str = "text", out: str = "n_subwords", max_piece: int = 6
) -> DataFrame:
    """BPE-flavored token-count estimate, fully relational.

    Real BPE needs a learned merge table; pipelines mostly need the
    COUNT, which is well approximated by lexing into letter/digit/symbol
    runs (the pre-tokenization every BPE does) and charging one piece
    per ``max_piece`` characters of each run (long words split into
    roughly len/max_piece pieces under any merge table). Deterministic,
    portable arithmetic: Σ ceil(len(run)/max_piece) over runs.
    """
    runs = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_SUBWORD_SPLIT), 0)
    pieces = F.aggregate(
        runs,
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.ceil(F.length(r).cast("double") / F.lit(float(max_piece))).cast("long"),
    )
    return df.withColumn(out, pieces)


def text_stats(
    df: DataFrame, group_col: str = "lang", text_col: str = "text", chars_col: str = "n_chars"
) -> DataFrame:
    """Per-group corpus stats (integer-only aggregates: exact across
    engines)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars_col).cast("long").alias("total_chars"),
        F.min(chars_col).cast("long").alias("min_chars"),
        F.max(chars_col).cast("long").alias("max_chars"),
        F.sum(F.size(tokens(F.col(text_col)))).cast("long").alias("total_tokens"),
    )


#: marker words per language for the n-gram-free heuristic language ID.
#: Counting uses the replace-trick (length delta / marker length) so the
#: exact same rule is expressible in any ANSI SQL dialect.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "und", "die"]),
    ("fr", ["le", "la", "et"]),
    ("es", ["el", "los", "que"]),
    ("zh", ["的", "是"]),
]


def _occurrences(padded: Column, word: str) -> Column:
    marker = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit("")))) / F.lit(
        len(marker)
    )


def lang_id(df: DataFrame, text_col: str = "text", out: str = "pred_lang") -> DataFrame:
    """Deterministic marker-word language ID: highest marker count wins,
    ties break in LANG_MARKERS order, zero hits -> 'und'."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = [
        sum((_occurrences(padded, w) for w in words), F.lit(0)).alias(f"__s_{lang}")
        for lang, words in LANG_MARKERS
    ]
    scored = df.select("*", *scores)
    best = F.greatest(*[F.col(f"__s_{lang}") for lang, _ in LANG_MARKERS])
    pred = F.lit("und")
    # first language reaching the max wins: build the when-chain in order
    chain = None
    for lang, _ in LANG_MARKERS:
        cond = (F.col(f"__s_{lang}") == best) & (best > 0)
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    pred = chain.otherwise("und")
    return scored.withColumn(out, pred).drop(*[f"__s_{lang}" for lang, _ in LANG_MARKERS])


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of whitespace-collapsed, lowercased,
    trimmed text. md5 (not xxhash) so any SQL engine reproduces it."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm.cast("binary")))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing (MOSS-style rolling-hash) fingerprints: the distinct
    minima of each sliding ``window`` of k-gram hashes.

    Guarantees of the winnowing scheme: any shared substring long enough
    to span window+k-1 tokens yields at least one shared fingerprint,
    and per-doc fingerprint density is ~2/(window+1) — a bounded-size
    sketch for plagiarism/overlap detection at corpus scale.

    Relational formulation (one window function, no UDF): posexplode
    token k-gram md5 hashes, per-row sliding min over the next
    ``window`` rows (``ROWS BETWEEN CURRENT ROW AND window-1
    FOLLOWING``), keep only full windows, DISTINCT. Identical SQL runs
    on any engine with window frames, so the operator is oracle-able.
    Returns (id_col, fp) rows.
    """
    from pyspark.sql import Window
    from pyspark_skyline_spark.operators.dedup import (
        hash64_expr,
        ordered_shingles,
        spread_for_compute,
    )

    df = spread_for_compute(df)
    ex = df.select(
        F.col(id_col),
        F.posexplode(ordered_shingles(F.col(text_col), shingle_k)).alias("__pos", "__s"),
    ).select(id_col, "__pos", hash64_expr(F.col("__s"), None, "md5").alias("__h"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("__pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    n = Window.partitionBy(id_col)
    return (
        ex.withColumn("__wmin", F.min("__h").over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        # docs with fewer than `window` shingles keep position 0 (its
        # clipped frame covers the whole doc), so every doc fingerprints
        .filter(F.col("__pos") <= F.greatest(F.col("__n") - F.lit(window), F.lit(0)))
        .select(F.col(id_col), F.col("__wmin").alias("fp"))
        .distinct()
    )


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Corpus vocabulary heavy hitters: the ``k`` most frequent
    whitespace tokens with their counts — the first step of any
    tokenizer/vocab build.

    Shape at scale: explode + hash-aggregate (map-side partial combine
    collapses each partition's counts before the shuffle, so the
    exchange carries one row per distinct token per partition, not one
    per occurrence), then a global top-k (``TakeOrderedAndProject`` —
    per-partition heaps, never a full sort). Total order (count desc,
    token asc) makes the cut deterministic."""
    tok = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return tok.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 50
) -> DataFrame:
    """Corpus word n-gram frequency table (top-``k``): the LM-statistics
    companion of ``vocab_topk`` (n=1 is the unigram case).

    Documents shorter than ``n`` tokens contribute nothing. Same shape
    at scale as ``vocab_topk``: n-grams are built row-locally with
    ``zip_with`` (one evaluation per row, no per-element re-split),
    then explode → map-side-combined hash aggregate → global top-k via
    ``TakeOrderedAndProject`` (per-partition heaps, never a full sort);
    count-desc then n-gram-asc makes the cut deterministic.
    """
    from pyspark_skyline_spark.operators.dedup import ordered_shingles

    if n <= 0 or k <= 0:
        raise ValueError("n and k must be positive")
    col = F.col(text_col)
    grams = (
        df.filter(F.size(tokens(col)) >= n)
        .select(F.explode(ordered_shingles(col, n)).alias("ngram"))
        .filter(F.col("ngram") != "")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return grams.orderBy(F.col("n").desc(), F.col("ngram").asc()).limit(k)


def tfidf_topk_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (keyword extraction /
    relevance weighting): ``score = tf * ln(n_docs / df_term)`` with
    ``tf`` the in-document term count and ``df_term`` the number of
    documents containing the term.

    Shape at scale: explode → two hash aggregates, both with map-side
    partial combine (per-(doc, term) counts, then per-term document
    frequencies over the already-aggregated pairs — the exchange never
    carries one row per occurrence); a shuffle equi-join on term
    (vocab-scale, one row per term on the build side); and a per-doc
    window for the top-k (parallel over docs, no global sort). The
    corpus size is ONE scalar aggregate, not a crossJoin of an
    unaggregated count.

    Scores are rounded to 6 decimals and ties rank by term ascending,
    so the result is a deterministic, engine-portable set.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    n_docs = df.select(id_col).distinct().count()
    pairs = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_term")
    )
    scored = pairs.join(dfreq, "term").withColumn(
        "score",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_term")), 6
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def hash_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    hash_mode: str = "md5",
    out: str = "embedding",
) -> DataFrame:
    """Feature-hashing document embeddings (the "hashing trick"):
    ``embedding[i] = Σ_{tokens t: h(t) mod dim == i} sign(t)`` with a
    second hash bit supplying the sign — the classic vocabulary-free
    bag-of-words vector. Output is an ``array<double>`` column that
    composes directly with the similarity family (``cosine_topk``,
    ``cosine_near_dup_pairs``).

    Shape at scale: explode → one map-side-combined (id, bucket)
    aggregate → one per-doc ``map_from_entries`` reassembly; the dense
    vector is built row-locally from a ``sequence`` transform, missing
    buckets coalesce to 0. Documents with no tokens keep an all-zero
    vector (ids are preserved via a left join of the distinct-id set).
    ``hash_mode="md5"`` is engine-portable (SQL oracles reproduce the
    exact vectors); ``"xxhash64"`` is the faster JVM-native production
    mode.
    """
    from pyspark_skyline_spark.operators.dedup import hash64_expr

    if dim <= 0:
        raise ValueError("dim must be positive")
    col = F.col(text_col)
    tok = (
        df.select(F.col(id_col), F.explode(tokens(col)).alias("__t"))
        .filter(F.col("__t") != "")
    )
    bucket = F.pmod(hash64_expr(F.col("__t"), None, hash_mode), F.lit(dim)).cast("long")
    sign = (
        F.when(
            F.pmod(hash64_expr(F.col("__t"), F.lit(1), hash_mode), F.lit(2)) == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
    )
    sums = (
        tok.select(F.col(id_col), bucket.alias("__b"), sign.alias("__s"))
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"))
    )
    maps = sums.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__v"))).alias("__m")
    )
    # map lookup is BY KEY (the 0-based bucket id); missing buckets -> 0
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("__m")[i.cast("long")], F.lit(0.0)),
    )
    ids = df.select(id_col).distinct()
    return (
        ids.join(maps, id_col, "left")
        .select(F.col(id_col), vec.alias(out))
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag of query terms:
    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b +
    b·|d|/avgdl))`` with the standard smoothed
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Shape at scale: the exploded token stream is filtered to the query
    terms BEFORE any shuffle (the per-(doc, term) aggregate only ever
    carries query-term hits, not the corpus vocabulary); doc lengths
    ride a scan-local projection; N/avgdl are one scalar aggregate; the
    per-term df table is query-sized and broadcast. Final ranking is a
    global top-k (``TakeOrderedAndProject``), never a full sort. Scores
    are rounded to 6 decimals and ties rank by ``id_col`` ascending so
    results are deterministic and engine-portable.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    terms = sorted({t.lower() for t in query_terms})
    col = F.col(text_col)
    base = df.select(F.col(id_col), F.size(tokens(col)).alias("__dl"), col.alias(text_col))
    row = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    if n_docs == 0 or avgdl == 0.0:
        raise ValueError("corpus is empty")
    hits = (
        base.select(F.col(id_col), F.col("__dl"), F.explode(tokens(col)).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = (
        hits.groupBy("term")
        .agg(F.countDistinct(id_col).cast("double").alias("df_term"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df_term") + F.lit(0.5))
        / (F.col("df_term") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
        )
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


_PUNCT = ".,!?;:"


def quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_per_token: float = 0.5,
) -> DataFrame:
    """Cheap quality scoring: token count, punctuation count, and a
    keep/drop flag — integer/boolean outputs only."""
    txt = F.col(text_col)
    stripped = txt
    for ch in _PUNCT:
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    n_punct = (F.length(txt) - F.length(stripped)).alias("n_punct")
    n_toks = F.size(tokens(txt))
    return (
        df.withColumn("n_tokens", n_toks)
        .withColumn("n_punct", F.length(txt) - F.length(stripped))
        .withColumn(
            "keep",
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_punct") <= F.col("n_tokens") * F.lit(max_punct_per_token)),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into token-window chunks — the standard
    pre-tokenization step of an LLM training pipeline, as pure Spark
    SQL expressions (no Python in the hot path).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; windows start while
    ``i*stride < n_tokens``, so the final chunk may be short and every
    token belongs to >= 1 chunk. Tokens are materialized into a column
    BEFORE the window transform: a higher-order-function lambda that
    references the split expression re-evaluates it per element
    (interpreted HOFs), the ~50x hot-path penalty.

    Returns (id_col, chunk_idx, chunk_text, n_tokens) — one row per
    chunk, ``n_tokens`` the chunk's own length. Row-local computation:
    no shuffle at all (the explode is pipelined into the scan).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    n_chunks = F.ceil(F.col("__n") / F.lit(stride)).cast("int")
    chunked = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(F.col("__toks"), i * stride + 1, chunk_tokens),
            )
        ).alias("chunk_idx", "__chunk"),
    )
    return chunked.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("long").alias("n_tokens"),
    )


def extract_domains(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Distinct lowercased URL domains per document — the input to
    source-level curation (domain blocklists, per-domain quotas,
    domain-grouped dedup, and the leak-safe split key: a document and
    every other page of its site share a domain).

    One ``regexp_extract_all`` over the text (scan-speed, no Python),
    ``www.`` prefix stripped, exploded to ``(id, domain)`` rows —
    documents without URLs contribute nothing. ASCII host pattern,
    engine-portable.
    """
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame columns {df.columns}")
    # host = dot-separated labels that cannot start/end with a dot (so a
    # sentence-ending period is never captured); optional userinfo
    # (user[:pass]@) is skipped rather than mistaken for the host
    pattern = r"https?://(?:[A-Za-z0-9._%+-]+(?::[^@/\s]*)?@)?([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)"
    doms = F.transform(
        F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(1)),
        lambda d: F.regexp_replace(F.lower(d), r"^www\.", ""),
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(doms)).alias("domain"))
        .where(F.col("domain") != "")
    )


def char_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_chars: int = 2000,
) -> DataFrame:
    """Per-document character-distribution entropy (bits/char) — the
    gibberish/boilerplate signal quality pipelines threshold on: near 0
    for single-character spam, ~2-3 for repeated boilerplate, ~4+ for
    natural prose, higher for random noise.

    Cost is bounded by ``max_chars``: entropy is estimated on the first
    ``max_chars`` characters (the estimate stabilizes within a few
    hundred), so the explode is ≤ ``max_chars`` rows per document
    regardless of document size — never O(total corpus characters).
    Two map-side-combined aggregates; lowercased; empty/NULL texts get
    NULL entropy.
    """
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame columns {df.columns}")
    if max_chars < 1:
        raise ValueError("max_chars must be >= 1")
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.slice(F.split(F.lower(F.col(text_col)), ""), 1, max_chars)
        ).alias("__c"),
    ).where(F.col("__c") != "")
    cnt = chars.groupBy(id_col, "__c").agg(F.count(F.lit(1)).cast("double").alias("__n"))
    # single aggregate, no join: H = log2(t) - sum(n*log2 n)/t (the
    # algebraic form of -sum(p*log2 p)) — one exchange instead of two
    ent = cnt.groupBy(id_col).agg(
        F.round(
            F.log2(F.sum("__n")) - F.sum(F.col("__n") * F.log2("__n")) / F.sum("__n"),
            6,
        ).alias("entropy")
    )
    return df.select(id_col).join(ent, id_col, "left")


def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own add-one-smoothed unigram language model — the classic cheap
    LM-quality proxy (the CCNet-style recipe scores documents with a
    small LM and filters the high-perplexity tail; a corpus-fit
    unigram model is its zero-dependency degenerate case). Low
    ``avg_nll`` = common, fluent-ish vocabulary; high = rare tokens,
    noise, or wrong-language text. Returns
    ``(id_col, avg_nll, n_tokens)`` for every document with at least
    one token.

    Model: ``p(t) = (c_t + 1) / (N + V)`` with ``c_t`` the corpus
    count, ``N`` total tokens, ``V`` distinct tokens;
    ``avg_nll = mean(-ln p(t))`` over the document's tokens.

    Plan: one token explode (linear), one hash-aggregate to the
    unigram table (map-side combine — the skew-safe shape for Zipfian
    token counts), a two-scalar aggregate over that small table for
    (N, V) broadcast via a 1-row cross join, an equi-join of token
    occurrences against the unigram table (AQE broadcasts real-world
    vocabularies — a few million rows — under the threshold; shuffle
    join past it), and the per-doc mean. Everything is exact
    arithmetic but the ``ln``; identical SQL runs in any engine, so
    the operator is oracle-able (float agreement to ~1e-12, far
    inside the compare rounding)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    vocab = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    tot = vocab.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    scored = (
        tok.join(vocab, "__t")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            (-F.log((F.col("__c") + 1.0) / (F.col("__n") + F.col("__v")))).alias(
                "__nll"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.avg("__nll").alias("avg_nll"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )


def slice_divergence(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-slice unigram-distribution divergence from the whole corpus
    — the mixture-monitoring diagnostic for a multi-source training
    pipeline (is one source/language/snapshot drifting away from the
    blend it is supposed to feed?). For each value of ``group_col``
    returns ``(group_col, n_tokens, vocab, kl_vs_corpus,
    js_vs_corpus)``: the slice's token count and distinct vocabulary,
    ``KL(p_slice || p_corpus)`` and the Jensen-Shannon divergence
    between slice and corpus, both in nats (JS bounded by ln 2).

    No smoothing is needed — every slice token IS a corpus token
    (support containment), so ``q > 0`` wherever ``p > 0`` and KL is
    finite by construction; the JS term for corpus tokens ABSENT from
    the slice collapses algebraically to ``ln 2 * (1 - Q_g)`` with
    ``Q_g`` the corpus probability mass the slice's support covers, so
    the full-vocabulary sum never has to be materialized per group.
    Exact arithmetic but the ``ln`` (cross-engine agreement ~1e-12),
    so the operator is exactly oracle-able.

    Plan: ONE token explode of the corpus; the per-(group, token)
    count is a map-side-combined hash aggregate (Zipf-safe), and the
    corpus unigram table is DERIVED from it (a second aggregate of the
    already-reduced table — the corpus is never exploded twice); the
    per-group totals table is #groups rows (broadcast) and the grand
    total is a broadcast 1-row cross join; the (group, token) ⋈ token
    equi-join AQE-broadcasts real vocabularies and shuffle-joins past
    the threshold; one per-group sum ends it."""
    occ = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    # four downstream consumers (ct, gn, tot, j) would each re-run the
    # corpus explode + aggregate without a lineage cut here; st is the
    # REDUCED table (#groups x vocab rows at most), so checkpointing it
    # is cheap and the corpus is scanned exactly once (measured 4x
    # wall-time win at sf0.1; lazy checkpoint RDDs are reclaimed by the
    # context cleaner, unlike a pinned persist)
    st = (
        occ.groupBy(group_col, "__t")
        .agg(F.count(F.lit(1)).alias("__cg"))
        .localCheckpoint(eager=False)
    )
    ct = st.groupBy("__t").agg(F.sum("__cg").alias("__c"))
    gn = st.groupBy(group_col).agg(
        F.sum("__cg").alias("__ng"), F.count(F.lit(1)).alias("__vg")
    )
    tot = ct.agg(F.sum("__c").alias("__n"))
    j = (
        st.join(ct, "__t")
        .join(F.broadcast(gn), group_col)
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("__cg") / F.col("__ng")
    q = F.col("__c") / F.col("__n")
    m = (p + q) / F.lit(2.0)
    agg = j.groupBy(group_col, "__ng", "__vg").agg(
        F.sum(p * F.log(p / q)).alias("__kl"),
        F.sum(p * F.log(p / m) + q * F.log(q / m)).alias("__js_sup"),
        F.sum(q).alias("__qcov"),
    )
    return agg.select(
        group_col,
        F.col("__ng").cast("long").alias("n_tokens"),
        F.col("__vg").cast("long").alias("vocab"),
        F.col("__kl").alias("kl_vs_corpus"),
        (
            F.lit(0.5)
            * (
                F.col("__js_sup")
                + F.lit(math.log(2.0)) * (F.lit(1.0) - F.col("__qcov"))
            )
        ).alias("js_vs_corpus"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-level collocation extraction by pointwise mutual
    information — the classic "which word pairs co-occur far more than
    chance" primitive (vocabulary induction, multi-word-expression
    mining, boilerplate phrase discovery). Returns one row per
    distinct adjacent word pair seen at least ``min_count`` times:
    ``(w1, w2, pair_count, w1_count, w2_count, pmi)`` with
    ``pmi = ln( p(w1,w2) / (p(w1) p(w2)) )`` in nats — pair
    probability over adjacent-bigram positions, unigram probabilities
    over token positions.

    The row SET is decided by an integer predicate (``pair_count >=
    min_count``), so the operator is exactly oracle-able with no
    float-boundary risk; the float ``pmi`` appears only as a value
    column (``ln`` cross-engine agreement ~1e-12).

    Scale shape: one explode for bigram positions and one for tokens
    (both linear); both count tables are map-side-combined hash
    aggregates (Zipf-safe) behind lazy checkpoints (each feeds a total
    AND a join — without the lineage cut every consumer re-runs its
    explode); the ``min_count`` filter prunes the Zipf tail BEFORE any
    join, so the two unigram joins probe with the small surviving
    candidate set (AQE broadcasts it); totals ride a broadcast 1-row
    cross join."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = tokens(F.col(text_col))
    pairs = adjacent_pairs(
        toks, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    occ = df.select(F.explode(pairs).alias("__p")).select("__p.w1", "__p.w2")
    bgc = (
        occ.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .localCheckpoint(eager=False)
    )
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    tot = (
        bgc.agg(F.sum("pair_count").alias("__nbg"))
        .crossJoin(F.broadcast(uni.agg(F.sum("__c").alias("__nu"))))
    )
    cand = bgc.filter(F.col("pair_count") >= min_count)
    j = (
        cand.join(uni.withColumnRenamed("__t", "w1").withColumnRenamed("__c", "__c1"), "w1")
        .join(uni.withColumnRenamed("__t", "w2").withColumnRenamed("__c", "__c2"), "w2")
        .crossJoin(F.broadcast(tot))
    )
    return j.select(
        "w1",
        "w2",
        F.col("pair_count").cast("long").alias("pair_count"),
        F.col("__c1").cast("long").alias("w1_count"),
        F.col("__c2").cast("long").alias("w2_count"),
        F.log(
            (F.col("pair_count") / F.col("__nbg"))
            / ((F.col("__c1") / F.col("__nu")) * (F.col("__c2") / F.col("__nu")))
        ).alias("pmi"),
    )


def bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own add-one-smoothed BIGRAM language model — one order up from
    ``unigram_nll`` toward the CCNet-style perplexity filter: a
    document full of individually-common tokens in implausible ORDER
    (shuffled text, keyword stuffing, boilerplate collage) scores high
    here while the unigram model cannot see anything wrong. Returns
    ``(id_col, avg_nll, n_bigrams)`` for every document with >= 2
    tokens (a bigram model conditions on a predecessor, so
    single-token documents have no scored positions and are absent —
    same convention as dropping the un-conditioned first token).

    Model: ``p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (ctx(w_{i-1}) + V)``
    with ``c`` the corpus bigram count, ``ctx(w)`` the count of ``w``
    as a bigram context (occurrences of ``w`` with a successor), ``V``
    the distinct-unigram vocabulary size;
    ``avg_nll = mean(-ln p)`` over the document's bigram positions.

    Plan (all linear, no all-pairs, same skew-safe shape as
    ``unigram_nll``): bigrams come from a ``zip_with`` over two slices
    of the per-doc token array (tokens are whitespace-split, so the
    single-space join byte cannot collide), ONE explode of that array;
    the bigram-count and context-count tables are map-side-combined
    hash aggregates (Zipfian repeats collapse before the shuffle); V
    rides a broadcast 1-row cross join; occurrences equi-join the two
    count tables (AQE broadcasts real vocabularies under the
    threshold, shuffle join past it); one per-doc mean. Exact
    arithmetic but the ``ln`` (engine agreement ~1e-12), so the
    operator is exactly oracle-able like its unigram sibling."""
    # NO null-coalescing, matching unigram_nll: a NULL text tokenizes
    # to NULL, the slices/explode drop it, and it contributes nothing
    # to the vocabulary (coalescing to '' would instead mint an
    # empty-string token and silently inflate V)
    toks = tokens(F.col(text_col))
    pairs = adjacent_pairs(
        toks,
        lambda a, b: F.struct(
            a.alias("__prev"), F.concat_ws(" ", a, b).alias("__bg")
        ),
    )
    occ = df.select(F.col(id_col), F.explode(pairs).alias("__p")).select(
        id_col, F.col("__p.__prev").alias("__prev"), F.col("__p.__bg").alias("__bg")
    )
    bg_counts = occ.groupBy("__bg").agg(F.count(F.lit(1)).alias("__c"))
    ctx_counts = occ.groupBy("__prev").agg(F.count(F.lit(1)).alias("__cc"))
    vocab = df.select(F.explode(tokens(F.col(text_col))).alias("__t")).agg(
        F.count_distinct(F.col("__t")).alias("__v")
    )
    scored = (
        occ.join(bg_counts, "__bg")
        .join(ctx_counts, "__prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (-F.log((F.col("__c") + 1.0) / (F.col("__cc") + F.col("__v")))).alias(
                "__nll"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.avg("__nll").alias("avg_nll"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )


#: Fixed demonstration vocabulary for :func:`subword_encode` — token id
#: = position in this tuple.  Layout: the 26 ASCII letters, the 10
#: digits, the 32 printable ASCII symbols (full single-character
#: coverage of the ``_SUBWORD_SPLIT`` run alphabet, so encoding never
#: needs an unk on ASCII text), then common English merges (bigrams and
#: trigrams a real BPE learns first).  A production pipeline passes its
#: own learned vocab; this one exists so the oracle row and the tests
#: pin EXACT greedy-longest-match semantics end-to-end.
GREEDY_VOCAB: tuple[str, ...] = (
    *"abcdefghijklmnopqrstuvwxyz",
    *"0123456789",
    *"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur",
    "the", "and", "ing", "ion", "ent", "for", "tio", "ati", "ter",
    "her", "tha", "ere", "ate", "his", "con", "res", "ver", "all",
    "ons", "ght", "ive", "out", "rea", "our", "ust", "ith", "era",
    "per", "ore", "int",
)


def _runs_encode_stage(
    df: DataFrame,
    text_col: str,
    out_col: str,
    lowercase: bool,
    enc_factory,
) -> DataFrame:
    """Shared scaffolding of :func:`subword_encode` and
    :func:`bpe_encode` (review find, round 13 — the plumbing existed
    twice and fixes had to land twice): native ``regexp_extract_all``
    pre-tokenization into a reserved ``__runs`` column, ONE zero-shuffle
    ``mapInPandas`` Arrow stage, output schema = input + ``out_col:
    array<int>``.  A NULL ``text_col`` encodes to an EMPTY id array
    (``regexp_extract_all(NULL)`` arrives in the Arrow batch as None —
    iterating it crashed the worker before this guard).
    ``enc_factory()`` runs once per worker batch-iterator and returns
    the per-run encoder, closing over broadcast state and its own memo.
    """
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not found")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    if "__runs" in df.columns:
        raise ValueError(
            "column name '__runs' is reserved by the tokenizer stage"
        )
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    source = df.withColumn(
        "__runs",
        F.regexp_extract_all(
            F.lower(F.col(text_col)) if lowercase else F.col(text_col),
            F.lit(_SUBWORD_SPLIT),
            0,
        ),
    )
    keep = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType(), False), False)]
    )

    def encode_batches(batches):
        enc = enc_factory()
        for pdf in batches:
            runs = pdf["__runs"]
            out = pdf[keep].copy()
            out[out_col] = [
                [] if rs is None else [t for r in rs for t in enc(r)]
                for rs in runs
            ]
            yield out

    return source.mapInPandas(encode_batches, out_schema)


def subword_encode(
    df: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "token_ids",
    unk_id: int | None = None,
    lowercase: bool = True,
    memo_cap: int = 1 << 20,
) -> DataFrame:
    """Greedy longest-match subword tokenization against a FIXED vocab
    — real token ids for the packing family (:func:`~pyspark_skyline_spark.
    operators.sample.pack_sequences` / ``gather_token_sequences`` /
    ``pack_position_ids``), replacing the regex piece-count proxy of
    :func:`subword_count` with an actual encoder.

    Semantics (the WordPiece/BPE-inference core, minus the ``##``
    continuation marker so the rule is plainly SQL-replayable): text is
    pre-tokenized into ``_SUBWORD_SPLIT`` runs (letter / digit / symbol
    runs — the pre-tokenization every BPE does), then each run is
    encoded left to right: at each position emit the LONGEST vocab
    piece prefixing the remaining run and advance by its length; if no
    piece matches, emit ``unk_id`` and advance one character (raise if
    ``unk_id`` is None — the default, so silent lossy encodes are
    opt-in).  Deterministic: ties are impossible (two distinct
    equal-length pieces cannot both prefix the same position).  NULL
    text encodes to an empty array.

    Scale shape: pre-tokenization stays native/JVM
    (``regexp_extract_all``); the matcher is ONE ``mapInPandas`` Arrow
    stage — zero shuffles, scan-shaped like the multimodal decoders —
    with the vocab shipped once per executor via a Spark broadcast
    (never per-task pickling) and a per-worker memo over distinct runs
    (Zipfian corpora hit it constantly; capped at ``memo_cap`` entries
    so adversarial all-distinct corpora cannot OOM the workers).
    Python-side work is unavoidable here — greedy longest-match is
    sequential within a run and Catalyst has no iterative expression —
    but it is the per-core-bounded, shuffle-free kind.

    Returns ``df`` plus ``out_col: array<int>``.
    """
    if not vocab:
        raise ValueError("vocab must be non-empty")
    for p in vocab:
        if not p:
            raise ValueError("vocab pieces must be non-empty strings")
    max_piece = max(len(p) for p in vocab)
    bc = df.sparkSession.sparkContext.broadcast(dict(vocab))

    def enc_factory():
        v = bc.value
        memo: dict[str, list[int]] = {}

        def enc(run: str) -> list[int]:
            got = memo.get(run)
            if got is not None:
                return got
            ids: list[int] = []
            pos, n = 0, len(run)
            while pos < n:
                for k in range(min(max_piece, n - pos), 0, -1):
                    tid = v.get(run[pos : pos + k])
                    if tid is not None:
                        ids.append(tid)
                        pos += k
                        break
                else:
                    if unk_id is None:
                        raise ValueError(
                            f"subword_encode: no vocab piece matches "
                            f"{run[pos]!r} and unk_id is None"
                        )
                    ids.append(unk_id)
                    pos += 1
            if len(memo) < memo_cap:
                memo[run] = ids
            return ids

        return enc

    return _runs_encode_stage(df, text_col, out_col, lowercase, enc_factory)


def subword_decode(
    df: DataFrame,
    vocab: dict[str, int],
    ids_col: str = "token_ids",
    out_col: str = "decoded",
    unk_piece: str = "",
    native_map_max: int = 1024,
) -> DataFrame:
    """Inverse of :func:`subword_encode` up to pre-tokenization:
    concatenate each id's vocab piece (ids without a piece render as
    ``unk_piece``).  ``decode(encode(t))`` equals ``t``'s runs joined —
    i.e. the lowercased text with whitespace removed — whenever the
    vocab covers the text (the round-trip law the tests pin).

    Small vocabs (<= ``native_map_max`` pieces) decode fully native:
    one map literal + ``transform`` + ``array_join``, no Python in the
    row path.  LEARNED/production vocabs (10k-100k pieces) switch to a
    broadcast dict + one zero-shuffle ``mapInPandas`` stage — a map
    LITERAL at that size is a 2|V|-argument CreateMap expression
    (codegen blowup + per-element py4j chatter, the repo's documented
    when()-tree pathology), the exact thing the encoder's broadcast
    pattern avoids (review find, round 13)."""
    inv: dict[int, str] = {}
    for piece, tid in vocab.items():
        if tid in inv:
            raise ValueError(f"duplicate token id {tid} in vocab")
        inv[tid] = piece
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    if len(inv) <= native_map_max:
        m = F.create_map(
            *[F.lit(x) for tid in sorted(inv) for x in (tid, inv[tid])]
        )
        return df.withColumn(
            out_col,
            F.array_join(
                F.transform(
                    F.col(ids_col),
                    lambda i: F.coalesce(m[i], F.lit(unk_piece)),
                ),
                "",
            ),
        )
    from pyspark.sql.types import StringType, StructField, StructType

    bc = df.sparkSession.sparkContext.broadcast(inv)
    keep = [f.name for f in df.schema.fields]
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType(), True)]
    )

    def decode_batches(batches):
        iv = bc.value
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = [
                None
                if ids is None
                else "".join(iv.get(int(i), unk_piece) for i in ids)
                for ids in pdf[ids_col]
            ]
            yield out

    return df.mapInPandas(decode_batches, out_schema)


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 1 << 22,
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Learn a BPE merge table from the corpus and return
    ``(merges, vocab)`` — the training complement of
    :func:`subword_encode` (whose fixed GREEDY_VOCAB this replaces
    with corpus-fit pieces).

    The algorithm is the classic word-histogram BPE (Sennrich et al.,
    "Neural Machine Translation of Rare Words with Subword Units",
    2016): start from characters, repeatedly merge the most frequent
    adjacent symbol pair, frequencies weighted by word count.  The
    division of labor is the one real trainers use: SPARK computes the
    exact word histogram (explode ``_SUBWORD_SPLIT`` runs + one
    map-side-combined count — the only data-sized pass, and the only
    shuffle), and the merge loop runs driver-local on the HISTOGRAM,
    whose size is the corpus VOCABULARY (Heaps' law: ~10^6 words at
    100 TB), never the corpus.  Past ``max_words`` distinct words the
    histogram is truncated to the most frequent (count desc, word) —
    and says so with a warning, never silently (tail words are
    precisely the ones BPE statistics barely see).

    The merge loop is incremental (pair->containing-words index, only
    affected words re-scanned per merge; best pair via a lazy max-heap
    of count snapshots, never a dict scan), so learning is
    O(total pair updates x log), not O(n_merges * distinct pairs).
    Deterministic: ties on pair frequency break lexicographically.

    ``vocab`` maps piece -> id with single characters first (sorted),
    then merged pieces in LEARN ORDER — feed it straight to
    :func:`subword_encode` / :func:`subword_decode`.  Greedy
    longest-match encoding against a BPE-learned piece set is the
    standard WordPiece-style inference; it is not merge-order BPE
    inference, and the tests pin the semantics actually promised:
    every learned piece is reachable and corpus text re-encodes with
    zero unks.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    runs = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)) if lowercase else F.col(text_col),
            F.lit(_SUBWORD_SPLIT),
            0,
        )
    ).alias("__w")
    hist_df = df.select(runs).groupBy("__w").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # deterministic bounded collect: top max_words by (count desc, word)
    rows = (
        hist_df.orderBy(F.col("__c").desc(), F.col("__w")).limit(max_words + 1)
    ).collect()
    if len(rows) > max_words:
        import warnings

        warnings.warn(
            f"learn_bpe_merges: corpus has more than {max_words} distinct "
            f"words; training on the {max_words} most frequent (count "
            f"desc, word) — the dropped tail is the part BPE statistics "
            f"barely see, but this is a truncation, not full coverage",
            UserWarning,
            stacklevel=2,
        )
        rows = rows[:max_words]
    return bpe_from_histogram(
        {r["__w"]: int(r["__c"]) for r in rows}, n_merges
    )


def bpe_from_histogram(
    word_counts: dict[str, int], n_merges: int
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Pure driver-local BPE merge learning over a word histogram —
    the Spark-free core of :func:`learn_bpe_merges` (factored out so
    the merge loop is property-testable without a session; same
    algorithm, same lexicographic tie rule, same vocab layout)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    hist: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in word_counts.items()
    ]
    import heapq

    merges: list[tuple[str, str]] = []
    # pair -> total weighted count; pair -> indices of words containing
    # it; plus a LAZY max-heap of (-count, pair) snapshots so best-pair
    # selection is O(log) pop-validate, not a full dict scan per merge
    # (review find, round 13: the scan made the loop O(n_merges x
    # distinct_pairs), contradicting the incremental design). Every
    # count update pushes a fresh snapshot; stale snapshots are
    # skipped when their count no longer matches. Tuple order
    # (-count, pair) gives the lexicographic tie rule for free.
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def _bump(pair: tuple[str, str], delta: int) -> None:
        c = pair_counts.get(pair, 0) + delta
        pair_counts[pair] = c
        if c > 0:
            heapq.heappush(heap, (-c, pair))

    for wi, (syms, cnt) in enumerate(hist):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
            pair_words.setdefault((a, b), set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items() if c > 0]
    heapq.heapify(heap)
    for _ in range(int(n_merges)):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        # re-scan only the words that contain the merged pair
        for wi in sorted(pair_words.get(best, ())):
            syms, cnt = hist[wi]
            # retract this word's pair contributions
            for a, b in zip(syms, syms[1:]):
                _bump((a, b), -cnt)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            hist[wi] = (out, cnt)
            # re-add the rewritten word's contributions
            for a, b in zip(out, out[1:]):
                _bump((a, b), cnt)
                pair_words.setdefault((a, b), set()).add(wi)
    chars = sorted({c for w in word_counts for c in w})
    vocab: dict[str, int] = {c: i for i, c in enumerate(chars)}
    for a, b in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "token_ids",
    unk_id: int | None = None,
    lowercase: bool = True,
    memo_cap: int = 1 << 20,
) -> DataFrame:
    """TRUE merge-rank BPE inference (the HuggingFace/GPT-2 algorithm),
    the exact companion of :func:`learn_bpe_merges`: each run starts as
    characters and repeatedly applies the LOWEST-RANK merge present
    (rank = training order) until none applies — reproducing training
    segmentation exactly, which greedy longest-match
    (:func:`subword_encode`) does not always do (greedy can take a long
    piece training never built at that position).

    Characters absent from ``vocab`` emit ``unk_id`` (raise when None,
    the default).  NULL text encodes to an empty array.  Same scale
    shape as ``subword_encode`` (shared ``_runs_encode_stage``
    scaffolding): native pre-tokenization, ONE zero-shuffle
    ``mapInPandas`` stage, merges + vocab broadcast once per executor,
    capped per-worker memo over distinct runs.  Returns ``df`` plus
    ``out_col: array<int>``."""
    if not vocab:
        raise ValueError("vocab must be non-empty")
    ranks = {}
    for i, m in enumerate(merges):
        pair = tuple(m)
        if len(pair) != 2:
            raise ValueError(f"merges[{i}] must be a (left, right) pair")
        if pair not in ranks:
            ranks[pair] = i
        piece = pair[0] + pair[1]
        if piece not in vocab:
            raise ValueError(
                f"merged piece {piece!r} (merges[{i}]) missing from vocab"
            )
    bc = df.sparkSession.sparkContext.broadcast((ranks, dict(vocab)))

    def enc_factory():
        rk, v = bc.value
        memo: dict[str, list[int]] = {}

        def enc(run: str) -> list[int]:
            got = memo.get(run)
            if got is not None:
                return got
            syms = list(run)
            while len(syms) > 1:
                best_rank, best_pair = None, None
                for p in zip(syms, syms[1:]):
                    r = rk.get(p)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, p
                if best_pair is None:
                    break
                merged, out, i = best_pair[0] + best_pair[1], [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == best_pair[0]
                        and syms[i + 1] == best_pair[1]
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            ids: list[int] = []
            for s in syms:
                tid = v.get(s)
                if tid is None:
                    if unk_id is None:
                        raise ValueError(
                            f"bpe_encode: symbol {s!r} not in vocab and "
                            f"unk_id is None"
                        )
                    ids.append(unk_id)
                else:
                    ids.append(tid)
            if len(memo) < memo_cap:
                memo[run] = ids
            return ids

        return enc

    return _runs_encode_stage(df, text_col, out_col, lowercase, enc_factory)
