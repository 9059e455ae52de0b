"""Targeted data selection for LLM pretraining corpora (north-star
extension; the reference engine has no data-selection surface —
SURVEY.md §2.3 scope note).

Re-expresses the hashed n-gram importance-weight recipe of DSIR —
"Data Selection for Language Models via Importance Resampling" (Xie,
Santurkar, Ma, Liang; NeurIPS 2023, arXiv:2302.03169) — as pure
DataFrame algebra: fit two bag-of-hashed-ngrams multinomials (target
corpus p, raw corpus q), weight every raw document by
``log w(x) = sum_b f_b(x) * (ln p_b - ln q_b)``, and keep the
highest-weight fraction. The paper samples with Gumbel noise to avoid
mode collapse; the deterministic top-k cut implemented here is its
zero-temperature limit and is what makes the operator exactly
oracle-able (rank ties broken by the document id, no RNG).

Scale shape (the part that must survive 100 TB): features never leave
the executor as strings — one ``explode`` per corpus (linear in
tokens), bucket ids via a native 64-bit hash ``pmod`` the bucket
count, and both model fits are map-side-combined hash aggregates of at
most ``n_buckets`` groups (the whole point of feature hashing: the
shuffled state is O(B), not O(vocabulary)). The per-bucket log-ratio
table is at most ``n_buckets`` rows — broadcast — so scoring is a
broadcast equi-join plus one per-doc sum. No window over a global
order, no all-pairs anything.

All hot-path expressions are native ``pyspark.sql.functions`` (JVM
codegen); ``hash_mode="md5"`` swaps xxhash64 for the repo's standard
md5-derived 60-bit hash so any SQL engine reproduces the buckets
bit-for-bit (see operators/dedup.py::hash64_expr).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from pyspark_skyline_spark.operators.dedup import hash64_expr, spread_for_compute
from pyspark_skyline_spark.operators.shuffle import _global_row_number_with_total
from pyspark_skyline_spark.operators.text import adjacent_pairs, tokens

__all__ = [
    "dsir_logweights",
    "dsir_select",
    "dsir_select_exact",
]


def _occ_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    include_bigrams: bool,
    hash_mode: str,
    target_filter: Column | None = None,
) -> DataFrame:
    """(id[, __tgt], __b) bucketed-occurrence table from ONE projected,
    compute-spread scan+explode of ``df``: whitespace unigrams plus
    (optionally) space-joined word bigrams, duplicates KEPT — the
    bag-of-features counts are the multinomial's sufficient statistics
    (the single-space join byte cannot collide with a unigram because
    unigrams are whitespace-split). NULL text tokenizes to NULL and the
    explode drops it (the repo's unigram_nll convention — no
    empty-string token is minted).

    Round-13 optimization (guide §2.5 input skew + §2.3 project before
    the exchange): the tokenize→md5→explode pipeline is compute-dense,
    and a single-parquet-file corpus scans as ONE partition — profiled
    at sf0.1, the whole DSIR fit ran on one core (1.3–2.3 s single-task
    stages). ``spread_for_compute`` round-robins the PROJECTED (id,
    text[, flag]) rows to cluster parallelism first (a no-op at real
    scale where splits >= cores), so the hash work parallelizes; only
    the columns the explode needs cross that exchange."""
    bucket = lambda c: F.pmod(hash64_expr(c, None, hash_mode), F.lit(n_buckets))  # noqa: E731
    cols = [F.col(id_col), F.col(text_col)]
    keep = [id_col]
    if target_filter is not None:
        cols.append(target_filter.cast("boolean").alias("__tgt"))
        keep.append("__tgt")
    slim = spread_for_compute(df.select(*cols))
    toks = tokens(F.col(text_col))
    feats = toks
    if include_bigrams:
        pairs = adjacent_pairs(toks, lambda a, b: F.concat(a, F.lit(" "), b))
        feats = F.concat(toks, pairs)
    return slim.select(*keep, F.explode(feats).alias("__feat")).select(
        *keep, bucket(F.col("__feat")).alias("__b")
    )


def _ratio_from_counts(counts: DataFrame, n_buckets: int) -> DataFrame:
    """Per-bucket log-ratio table from a single (__b, __cq, __cp)
    counts table (``__cp`` NULL where the bucket has no target
    occurrences). Bit-identical arithmetic to the two-table join form:
    same add-one smoothing, same IEEE ``ln`` over the same integers."""
    totals = counts.agg(
        F.sum("__cq").alias("__nq"),
        F.coalesce(F.sum("__cp"), F.lit(0)).alias("__np"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log(
                (F.coalesce(F.col("__cp"), F.lit(0)) + 1.0)
                / (F.col("__np") + F.lit(n_buckets))
            )
            - F.log((F.col("__cq") + 1.0) / (F.col("__nq") + F.lit(n_buckets)))
        ).alias("__lr"),
    )


def dsir_logweights(
    raw_df: DataFrame,
    target_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    include_bigrams: bool = True,
    hash_mode: str = "xxhash64",
    target_filter: Column | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight of every raw document
    toward the target corpus's hashed-feature distribution. Returns
    ``(id_col, logw, n_feats)`` for every raw document with >= 1
    feature (documents whose text is NULL are absent — they have no
    features to score).

    Model: features are hashed into ``n_buckets`` buckets; the target
    and raw corpora each fit an add-one-smoothed multinomial over
    buckets, ``p_b = (c_p(b)+1) / (N_p + B)`` and ``q_b`` likewise;
    ``logw = sum over the doc's feature occurrences of (ln p_b - ln
    q_b)``. Positive = looks more like the target than like the raw
    corpus average. Exact arithmetic but the ``ln`` (cross-engine
    agreement ~1e-12, far inside the compare rounding), so the
    operator is exactly oracle-able in md5 hash mode.

    Plan: one explode per corpus, two map-side-combined bucket-count
    aggregates (<= B groups each — Zipf-safe by construction, the hash
    spreads hot tokens' counts into fixed buckets whose partials
    collapse before the shuffle), a broadcast 1-row (N_p, N_q) scalar,
    a left join of raw buckets to target buckets (<= B rows on either
    side), and ONE broadcast equi-join of raw occurrences against the
    <= B-row log-ratio table, then a per-doc sum. At the paper's B =
    10^4..10^6 the ratio table is 16 bytes/row — always broadcastable.

    ``target_filter`` (mutually exclusive with ``target_df``): a
    boolean Column selecting the target slice OF ``raw_df`` — both
    multinomials then fit from one flagged explode (see
    :func:`_dsir_model`), cutting corpus text passes from 3 to 2.
    Identical output (integer bucket counts either way).
    """
    occ_raw, ratio = _dsir_model(
        raw_df, target_df, id_col, text_col, n_buckets, include_bigrams,
        hash_mode, target_filter, per_doc_counts=False,
    )
    return (
        occ_raw.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__lr").alias("logw"),
            F.count(F.lit(1)).cast("long").alias("n_feats"),
        )
    )


def _dsir_model(
    raw_df: DataFrame,
    target_df: DataFrame | None,
    id_col: str,
    text_col: str,
    n_buckets: int,
    include_bigrams: bool,
    hash_mode: str,
    target_filter: Column | None,
    per_doc_counts: bool,
) -> tuple[DataFrame, DataFrame]:
    """The DSIR model parts shared by :func:`dsir_logweights` and
    :func:`dsir_select_exact`: the raw corpus's scoring-side table and
    the <= B-row per-bucket log-ratio table.

    ``per_doc_counts=False`` returns the per-OCCURRENCE (id, __b) table
    (``dsir_logweights`` sums ``__lr`` per occurrence, preserving its
    oracle's summation association); ``True`` returns the localCheck-
    pointed per-(id, __b) integer count table ``docb`` (``__cnt``
    column; ``dsir_select_exact``'s exact-decimal scoring side).

    ``target_filter`` (round-13 optimization, guide §1.2/§8 "decide
    with small rows"): when the target corpus is a predicate SLICE of
    the raw corpus — the common pretraining case, and what the entry
    rows do — passing the predicate instead of a second DataFrame lets
    BOTH multinomials fit from ONE flagged explode of the raw corpus:
    ``__cq`` = all occurrences per bucket, ``__cp`` = the conditional
    count over target-flagged rows, in one map-side-combined aggregate.
    Corpus text passes drop from 3 to 1 (``dsir_select_exact``: the
    checkpointed docb feeds fit AND scoring) or 2 (``dsir_logweights``:
    fit + the per-occurrence scoring join). Bucket counts are integers
    either way, so results are bit-identical to the two-DataFrame path
    (pinned by tests/test_selection.py's equivalence test).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if (target_df is None) == (target_filter is None):
        raise ValueError(
            "exactly one of target_df / target_filter must be provided"
        )
    if target_filter is not None:
        occ = _occ_buckets(
            raw_df, id_col, text_col, n_buckets, include_bigrams, hash_mode,
            target_filter,
        )
        if per_doc_counts:
            # ONE corpus pass total: docb carries the per-doc target
            # flag (constant per doc), so the bucket fit is a tiny
            # re-aggregate of the checkpointed docb instead of a second
            # explode. Checkpoint RDDs are reclaimed by the context
            # cleaner, unlike a pinned persist.
            docb = (
                occ.groupBy(id_col, "__tgt", "__b")
                .agg(F.count(F.lit(1)).alias("__cnt"))
                .localCheckpoint(eager=False)
            )
            counts = docb.groupBy("__b").agg(
                F.sum("__cnt").alias("__cq"),
                F.sum(F.when(F.col("__tgt"), F.col("__cnt"))).alias("__cp"),
            )
            return docb, _ratio_from_counts(counts, n_buckets)
        # per-occurrence scoring side: the fit is one conditional
        # aggregate of the flagged occurrence table (<= B groups,
        # map-side combined); checkpointed so the totals + ratio
        # consumers don't re-run the explode
        counts = occ.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__cq"),
            F.sum(F.when(F.col("__tgt"), F.lit(1))).alias("__cp"),
        ).localCheckpoint(eager=False)
        return occ.drop("__tgt"), _ratio_from_counts(counts, n_buckets)

    # two-DataFrame path (arbitrary target corpus, not necessarily a
    # slice of raw): one spread explode per corpus. NOTE totals must
    # come from the FULL p_counts (a target bucket absent from raw
    # still contributes to N_p), so the ratio keeps the two-table join.
    occ_raw = _occ_buckets(
        raw_df, id_col, text_col, n_buckets, include_bigrams, hash_mode
    )
    occ_tgt = _occ_buckets(
        target_df, id_col, text_col, n_buckets, include_bigrams, hash_mode
    ).select("__b")
    if per_doc_counts:
        docb = (
            occ_raw.groupBy(id_col, "__b")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .localCheckpoint(eager=False)
        )
        q_counts = docb.groupBy("__b").agg(F.sum("__cnt").alias("__cq"))
        scoring_side: DataFrame = docb
    else:
        q_counts = (
            occ_raw.groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__cq"))
            .localCheckpoint(eager=False)
        )
        scoring_side = occ_raw
    p_counts = (
        occ_tgt.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__cp"))
        .localCheckpoint(eager=False)
    )
    totals = q_counts.agg(F.sum("__cq").alias("__nq")).crossJoin(
        p_counts.agg(F.coalesce(F.sum("__cp"), F.lit(0)).alias("__np"))
    )
    # buckets never seen in the raw corpus cannot be scored (no raw
    # occurrence joins them), so a left join from q_counts suffices;
    # raw buckets absent from the target get the smoothed floor 1/(N_p+B)
    ratio = (
        q_counts.join(p_counts, "__b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce(F.col("__cp"), F.lit(0)) + 1.0)
                    / (F.col("__np") + F.lit(n_buckets))
                )
                - F.log((F.col("__cq") + 1.0) / (F.col("__nq") + F.lit(n_buckets)))
            ).alias("__lr"),
        )
    )
    return scoring_side, ratio


def dsir_select_exact(
    raw_df: DataFrame,
    target_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_frac: float = 0.25,
    n_buckets: int = 8192,
    include_bigrams: bool = True,
    hash_mode: str = "xxhash64",
    num_partitions: int | None = None,
    target_filter: Column | None = None,
) -> DataFrame:
    """Deterministic DSIR top-k selection with a TIE-EXACT ranking key
    — the variant whose full select (not just the score surface) is
    SQL-oracle-able (round-9 verdict ask #6). Returns ``(id_col,
    n_feats, rank, keep)`` — every output column integer/boolean, no
    float column at all.

    Why :func:`dsir_select` isn't oracled: ``logw`` is a float SUM
    over feature occurrences, and summation order (Spark's partial
    folds vs the oracle engine's) can put two identical-text documents
    — equal in exact math — 1 ulp apart, flipping the id tie-break.
    Here the per-doc score is summed EXACTLY: occurrences collapse to
    per-(doc, bucket) integer counts first, each bucket contributes
    the single IEEE product ``count * log_ratio`` (deterministic in
    any engine), and those terms are summed as ``decimal(38,18)`` —
    exact decimal addition is order-free, so identical documents get
    bitwise-equal scores in BOTH engines and tie-break identically by
    id. The only remaining cross-engine surface is the ``ln`` in the
    per-bucket ratio (~1e-12 relative): a rank flip needs two
    DISTINCT-score documents closer than that — not a tie class, and
    measured absent on the test corpora.

    Same scale shape as :func:`dsir_logweights`, slightly better: the
    broadcast scoring join carries per-(doc, bucket) counts instead of
    raw occurrences (smaller by each doc's within-bucket multiplicity)
    and the decimal work is one cast+add per distinct (doc, bucket),
    not per token. Ranking is the skew-free range-shuffle
    ``global_row_number`` over a two-column projection; the cut index
    ``ceil(keep_frac * N)`` is the identical IEEE multiply+ceil in any
    engine."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    # per_doc_counts: _dsir_model returns the checkpointed per-(doc,
    # bucket) count table, which is BOTH the model-fit input and the
    # scoring side — with target_filter the whole operator makes one
    # pass over the corpus text (guide §8: every later decision runs on
    # the small integer proxy table, never the text again)
    docb, ratio = _dsir_model(
        raw_df, target_df, id_col, text_col, n_buckets, include_bigrams,
        hash_mode, target_filter, per_doc_counts=True,
    )
    scored = (
        docb.join(F.broadcast(ratio), "__b")
        .withColumn(
            "__t", (F.col("__cnt") * F.col("__lr")).cast("decimal(38,18)")
        )
        .groupBy(id_col)
        .agg(
            F.sum("__t").alias("__lwx"),
            F.sum("__cnt").cast("long").alias("n_feats"),
        )
    )
    ordered = scored.withColumn("__ord", -F.col("__lwx"))
    fin, n_rows = _global_row_number_with_total(
        ordered, ["__ord", id_col], "__fin", num_partitions
    )
    threshold = math.ceil(keep_frac * n_rows)
    return fin.select(
        id_col,
        "n_feats",
        (F.col("__fin") + 1).cast("long").alias("rank"),
        ((F.col("__fin") + 1) <= F.lit(threshold)).alias("keep"),
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_frac: float = 0.25,
    n_buckets: int = 8192,
    include_bigrams: bool = True,
    hash_mode: str = "xxhash64",
    sample_mode: str = "topk",
    seed: int = 42,
    num_partitions: int | None = None,
    target_filter: Column | None = None,
) -> DataFrame:
    """DSIR selection: ``dsir_logweights`` plus a ``keep_frac`` cut.
    Returns ``(id_col, logw, n_feats, keep)`` with ``keep`` true for
    ``ceil(keep_frac * N)`` documents.

    ``sample_mode="topk"`` (default) keeps the highest-weight
    documents (ties broken by ascending id — the zero-temperature
    limit of the paper's Gumbel resampling; no RNG). Caveat for
    exact-duplicate texts: their logw values are equal in exact math
    but are float SUMS, so partial-aggregation fold order can place
    them 1 ulp apart — which of an identical pair straddling the cut
    index is kept is then fold-order dependent. This is why the
    registered oracle row exposes ``dsir_logweights`` (every value
    engine-exact) while the cut is graded by the hand-model pytest.

    ``sample_mode="gumbel"`` is the paper's actual sampler: the
    Gumbel-top-k trick (perturb each ``logw`` with an independent
    standard Gumbel and take the top k) draws documents WITHOUT
    replacement with probability proportional to ``exp(logw)`` —
    avoiding the top-k mode's failure where the kept set collapses
    onto one narrow region of the target distribution. The Gumbel is
    derived from a seeded per-id hash (``-ln(-ln(u))`` with ``u`` in
    the open unit interval from 53 hash bits), so a given ``seed`` is
    reproducible and partition-layout-independent, but the float
    perturbation is engine-specific — gumbel mode is pytest-graded,
    not SQL-oracled.

    The order pass is the skew-free range-shuffle
    ``global_row_number`` machinery (never a single-task
    ``Window.orderBy``), carrying a two-column projection. The cut
    index ``ceil(keep_frac * N)`` is the identical IEEE multiply+ceil
    in any engine."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if sample_mode not in ("topk", "gumbel"):
        raise ValueError(f"sample_mode must be 'topk' or 'gumbel', got {sample_mode!r}")
    w = dsir_logweights(
        raw_df, target_df, id_col, text_col, n_buckets, include_bigrams,
        hash_mode, target_filter=target_filter,
    )
    key = F.col("logw")
    if sample_mode == "gumbel":
        # u in the OPEN interval (0, 1): 53 hash bits + half-ulp shift,
        # so neither log can hit 0 or -inf
        u = (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 53))
            + F.lit(0.5)
        ) / F.lit(float(1 << 53))
        key = key + (-F.log(-F.log(u)))
    ordered = w.withColumn("__ord", -key)
    fin, n_rows = _global_row_number_with_total(
        ordered, ["__ord", id_col], "__fin", num_partitions
    )
    threshold = math.ceil(keep_frac * n_rows)
    return fin.withColumn("keep", (F.col("__fin") + 1) <= F.lit(threshold)).drop(
        "__ord", "__fin"
    )
