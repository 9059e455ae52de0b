"""Corpus filtering operators for LLM-data pipelines (north-star
extension; no counterpart in the reference, which has no string
functions beyond casts — SURVEY.md §2.3).

The three filters every large-scale pretraining pipeline runs between
dedup and tokenization:

* ``repetition_stats`` — per-document repetition metrics in the style
  of the published Gopher/RefinedWeb rules (duplicate-line fraction,
  duplicate-word fraction, most-frequent-word share, mean word length)
  plus a composite ``keep`` flag. All native array/HOF expressions —
  zero shuffles, zero Python — so the filter runs at scan speed and
  pushes down as an ordinary projection+filter.
* ``pii_scrub`` — redact emails / phone numbers / IPv4 addresses /
  16-digit card-shaped numbers with ``regexp_replace`` chains (ASCII
  regexes only, so Java and RE2/PCRE dialects agree), plus per-doc
  match counts for audit. Native, order-independent, oracle-able.
* ``decontaminate`` — drop (or flag) training documents that share any
  word k-gram with a benchmark/eval set: shingle both sides, hash to
  60-bit ints, and LEFT SEMI join the exploded training shingles
  against the probe shingle set. The probe side (an eval benchmark) is
  small by nature — it broadcasts, so the train side is one scan +
  one broadcast semi-join + one ``groupBy(id)``; no all-pairs work,
  no shuffle of the corpus text itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyspark_skyline_spark.operators.dedup import hash64_expr, shingles
from pyspark_skyline_spark.operators.text import tokens

__all__ = ["repetition_stats", "pii_scrub", "decontaminate", "contamination_report"]


def _frac(num: Column, den: Column) -> Column:
    """num/den as double, 0.0 when the denominator is 0."""
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.3,
    max_dup_word_frac: float = 0.5,
    max_top_word_frac: float = 0.2,
    min_words: int = 5,
    max_words: int = 100_000,
) -> DataFrame:
    """Add per-document repetition metrics + a composite ``keep`` flag.

    Columns added (all deterministic, SQL-expressible):

    * ``n_words`` — whitespace token count
    * ``dup_line_frac`` — 1 - distinct/total over non-empty lines
      (the Gopher duplicate-line-fraction rule)
    * ``dup_word_frac`` — 1 - distinct/total over words
    * ``top_word_frac`` — occurrences of the most frequent word / total
      (degenerate "aaa aaa aaa" spam scores 1.0)
    * ``mean_word_len`` — mean characters per word
    * ``keep`` — all thresholds pass (word count in range, every
      repetition fraction under its cap)

    ``top_word_frac`` is an O(distinct x total) per-document HOF —
    vectorized JVM work bounded by document length, no shuffle. It is
    only computed for rows with ``n_words <= max_words``: past the cap
    the composite ``keep`` already rejects the row, so the expensive
    HOF is skipped and ``top_word_frac`` is NULL there (``keep`` stays
    False — ``false AND NULL`` is false).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))  # NULL text == empty doc
    toks = tokens(text)
    n_words = F.size(toks)
    distinct_words = F.array_distinct(toks)
    lines = F.filter(
        F.split(text, r"\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_lines = F.size(lines)
    # O(distinct x total) HOF — guarded so a single multi-MB document
    # never pays the quadratic cost: past the word-count cap the row is
    # rejected by ``keep`` anyway, so top_word_frac is left NULL there
    top_count = F.when(
        n_words <= max_words,
        F.array_max(
            F.transform(
                distinct_words,
                lambda w: F.size(F.filter(toks, lambda x: x == w)),
            )
        ),
    )
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w).cast("long")
    )
    out = (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("dup_line_frac", _frac(n_lines - F.size(F.array_distinct(lines)), n_lines))
        .withColumn("dup_word_frac", _frac(n_words - F.size(distinct_words), n_words))
        .withColumn("top_word_frac", _frac(top_count, n_words))
        .withColumn("mean_word_len", _frac(total_chars, n_words))
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_word_frac") <= max_top_word_frac),
    )


#: ASCII-only patterns so Java regex and RE2/PCRE oracles agree.
#: Order matters: cards before phones (a 16-digit run must not be
#: half-eaten by the phone pattern) and ipv4 before phones (the phone
#: pattern can consume dotted IPs whose last two octets are 3 digits,
#: e.g. 192.168.100.100 — counts run on the ORIGINAL text, so
#: replacement order does not affect the audit columns).
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
    kinds: list[str] | None = None,
) -> DataFrame:
    """Redact PII-shaped spans and count what was redacted.

    Adds ``out_col`` (the scrubbed text) and one ``n_<kind>`` count per
    pattern (emails, 16-digit card-shaped numbers, phone numbers, IPv4
    addresses). Counts are computed on the ORIGINAL text with the same
    patterns, so audits don't depend on replacement order (which also
    means one span can be counted under multiple kinds — a card number
    contains phone-shaped digit runs); replacements apply in the fixed
    ``_PII_PATTERNS`` order, earliest pattern wins the span. Pure ``regexp_replace``
    / ``regexp_count`` chains — scan-speed, no Python, no shuffle.

    This is pattern-shaped redaction (the standard first pass), not NER:
    names/addresses need a model and are out of scope for a
    deterministic relational operator.
    """
    chosen = [p for p in _PII_PATTERNS if kinds is None or p[0] in kinds]
    if kinds is not None:
        known = {p[0] for p in _PII_PATTERNS}
        bad = set(kinds) - known
        if bad:
            raise ValueError(f"unknown PII kinds {sorted(bad)}; known: {sorted(known)}")
    text = F.coalesce(F.col(text_col), F.lit(""))  # NULL text == empty doc
    scrubbed = text
    for _, pat, repl in chosen:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out = df
    for kind, pat, _ in chosen:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(text, F.lit(pat)).cast("long")
        )
    return out.withColumn(out_col, scrubbed)


def decontaminate(
    df: DataFrame,
    probe_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    probe_text_col: str | None = None,
    shingle_k: int = 8,
    min_hits: int = 1,
    mode: str = "drop",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Benchmark decontamination: remove (``mode="drop"``) or flag
    (``mode="flag"``, adds ``contaminated`` + ``n_contaminated_grams``)
    training rows sharing >= ``min_hits`` distinct word ``shingle_k``-grams
    with ``probe_df`` — the standard n-gram-overlap test-set leakage
    check run before pretraining.

    Physical plan: both sides shingle + hash (scan-local), the probe
    shingle set is distinct'd and broadcast (eval benchmarks are tiny
    next to a training corpus), the training side explodes its shingles
    into a broadcast-hash semi/inner join, and a ``groupBy(id)`` counts
    hits. The corpus text itself is never shuffled — only (id, hash)
    pairs that actually match a probe gram reach the aggregation. At
    k=8 (the usual 8-13-gram window) incidental collisions are
    negligible and every real quote is caught.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be drop|flag, got {mode!r}")
    ptc = probe_text_col or text_col
    probe_grams = (
        probe_df.select(
            F.explode(shingles(F.col(ptc), shingle_k)).alias("__g")
        )
        .select(hash64_expr(F.col("__g"), None, hash_mode).alias("__h"))
        .distinct()
    )
    train_grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("__g"),
    ).select("__id", hash64_expr(F.col("__g"), None, hash_mode).alias("__h"))
    hits = (
        train_grams.join(F.broadcast(probe_grams), "__h", "inner")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") >= min_hits)
    )
    if mode == "drop":
        return df.join(
            hits.select(F.col("__id").alias(id_col)), id_col, "left_anti"
        )
    flagged = df.join(
        hits.select(
            F.col("__id").alias(id_col),
            F.col("n_contaminated_grams"),
        ),
        id_col,
        "left",
    )
    return flagged.withColumn(
        "n_contaminated_grams", F.coalesce(F.col("n_contaminated_grams"), F.lit(0)).cast("long")
    ).withColumn("contaminated", F.col("n_contaminated_grams") >= min_hits)


def contamination_report(
    df: DataFrame,
    probe_df: DataFrame,
    id_col: str,
    probe_id_col: str,
    text_col: str = "text",
    probe_text_col: str | None = None,
    shingle_k: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The reverse view of ``decontaminate``: per EVAL row, how many
    corpus documents share at least one word ``shingle_k``-gram with it
    — "which benchmark items leak into the training set, and how
    badly". Returns ``(probe_id, n_leaking_docs)`` for probe rows with
    at least one leak.

    Physical plan mirrors ``decontaminate``: the probe shingle set
    (eval-sized, tiny) is broadcast; the corpus explodes to distinct
    (doc, gram-hash) pairs — the only shuffle, sized by matching grams
    after the broadcast join, never by corpus text.
    """
    ptc = probe_text_col or text_col
    probe_grams = (
        probe_df.select(
            F.col(probe_id_col).alias("__pid"),
            F.explode(shingles(F.col(ptc), shingle_k)).alias("__g"),
        )
        .select("__pid", hash64_expr(F.col("__g"), None, hash_mode).alias("__h"))
        .distinct()
    )
    corpus_grams = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("__g"),
    ).select("__doc", hash64_expr(F.col("__g"), None, hash_mode).alias("__h"))
    # distinct (doc, hash) so one doc repeating a gram counts once
    return (
        corpus_grams.join(F.broadcast(probe_grams), "__h", "inner")
        .select("__pid", "__doc")
        .distinct()
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaking_docs"))
        .select(F.col("__pid").alias(probe_id_col), "n_leaking_docs")
    )
