"""Fuzzy string matching / record linkage (north-star extension; no
counterpart in the reference).

``fuzzy_pairs`` finds all id pairs whose strings are within edit
(Levenshtein) distance ``max_dist`` — the record-linkage primitive
(near-identical names, titles, URLs) — without ever forming the
all-pairs product. The machinery runs over DISTINCT strings (edit
distance is a property of the string, not the row; duplicate-heavy
columns would otherwise pay the duplicate product in every filter
stage) and expands verified string-pairs back to id-pairs at the end:

- LONG strings (length >= q·(d+1)) go through the POSITIONAL q-gram
  filter (Gravano et al.): within edit distance d the strings admit a
  one-to-one matching of at least ``max(len) - q + 1 - q·d`` q-gram
  occurrences whose positions differ by <= d. Candidates come from an
  equi-join on exploded positional q-grams (position-window predicate)
  + a distinct-matched-position count threshold — a necessary
  condition of the true bound, so no true pair is lost (distinct
  grams alone would be UNSOUND: repetitive strings collapse their
  gram multiset). Hash join + hash aggregate — the shapes that scale.
- SHORT strings (where that bound is vacuous) are block-joined within
  a ``|len_a - len_b| <= d`` length band (edit distance >= length
  difference, so the band is sound). Short-string volume is typically
  tiny; the band bounds the blowup.
- every candidate is VERIFIED with Spark's native ``levenshtein``
  before it is emitted — the filters only affect speed, never the
  answer.

Skew guard: ubiquitous q-grams ("the", "ing") create hot join keys;
``max_gram_freq`` drops grams more frequent than the cap from candidate
GENERATION only (the count threshold is computed against the surviving
grams on BOTH sides identically, so correctness degrades to recall loss
confined to pairs whose every shared gram is ubiquitous — and those
still meet through the short-string band if short, as in dedup.py's
bucket-cap trade, documented there). Since the round-4 distinct-string
collapse, gram frequency is counted over DISTINCT string values, not
rows — the right unit, because the candidate join itself runs in
distinct-string space (a gram shared by a million copies of 64 names
has frequency <= 64 and is harmless; only grams shared across many
DISTINCT strings explode the candidate pair count). Caps calibrated to
row counts should be re-read as distinct-value counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fuzzy_pairs"]


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 3,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` and
    ``levenshtein(s_a, s_b) <= max_dist``. NULL strings never match.

    With ``max_gram_freq=None`` (default) the result is EXACT — the
    q-gram count bound and the length band are both necessary
    conditions for the verified predicate.

    .. versionchanged:: round 4
        ``max_gram_freq`` counts a gram's frequency over DISTINCT
        strings, not rows (the distinct-string collapse below runs the
        whole filter on ``SELECT DISTINCT str_col``). A cap calibrated
        to row counts on a duplicate-heavy column is now far tighter
        than intended — re-tune it as a distinct-value cap. Recall-only
        impact: the cap only ever drops candidate grams.

    DISTINCT-STRING COLLAPSE (round 4): edit distance is a function of
    the STRING, not the row, so the filter/verify machinery runs over
    ``SELECT DISTINCT str_col`` and verified string-pairs are expanded
    back to id-pairs by two hash joins (plus a same-string self-join
    for the dist-0 pairs inside duplicate groups). On a duplicate-heavy
    column (a 200k-row table with 64 distinct names) this turns a
    quadratic-in-duplicates candidate join into a 64-string problem
    whose only large stage is the inherent output expansion; on an
    all-unique column it costs one extra distinct + the expansion
    joins. The output contract is unchanged.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 1:
        raise ValueError("q must be >= 1")
    for c in (id_col, str_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame columns {df.columns}")

    base = df.select(F.col(id_col).alias("__id"), F.col(str_col).alias("__s")).where(
        F.col("__s").isNotNull()
    )
    vals = base.select("__s").distinct().withColumn("__len", F.length("__s"))
    short_cut = q * (max_dist + 1)  # below this, the count bound is vacuous

    # --- long branch: positional q-gram filter (distinct strings) -----
    long_side = vals.where(F.col("__len") >= short_cut)
    grams = long_side.select(
        "__s",
        "__len",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, __len - {q} + 1), i -> substring(__s, i, {q}))"
            )
        ).alias("__p", "__g"),
    )
    if max_gram_freq is not None:
        freq = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__gf"))
        grams = (
            grams.join(freq, "__g").where(F.col("__gf") <= max_gram_freq).drop("__gf")
        )
    a = grams.select(
        F.col("__s").alias("s_a"), F.col("__len").alias("__la"),
        F.col("__p").alias("__pa"), "__g",
    )
    b = grams.select(
        F.col("__s").alias("s_b"), F.col("__len").alias("__lb"),
        F.col("__p").alias("__pb"), "__g",
    )
    # a true pair admits a 1:1 matching of >= T gram occurrences with
    # position shift <= d, so it has >= T distinct matched a-positions —
    # the count below can only be larger, never smaller (sound filter)
    long_cand = (
        a.join(b, "__g")
        .where(
            (F.col("s_a") < F.col("s_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
            & (F.abs(F.col("__pa") - F.col("__pb")) <= max_dist)
        )
        .groupBy("s_a", "s_b", "__la", "__lb")
        .agg(F.countDistinct("__pa").alias("__matched"))
        .where(
            F.col("__matched")
            >= F.greatest(F.col("__la"), F.col("__lb")) - F.lit(q - 1 + q * max_dist)
        )
        .select("s_a", "s_b")
    )

    # --- short branch: length-band block join -------------------------
    short_side = vals.where(F.col("__len") < short_cut)
    sa = short_side.select(
        F.col("__s").alias("s_a"),
        F.explode(
            F.sequence(F.col("__len"), F.col("__len") + max_dist)
        ).alias("__band"),
    )
    sb = short_side.select(F.col("__s").alias("s_b"), F.col("__len").alias("__band"))
    short_cand = (
        sa.join(sb, "__band").where(F.col("s_a") != F.col("s_b"))
        .select(
            F.least("s_a", "s_b").alias("s_a"),
            F.greatest("s_a", "s_b").alias("s_b"),
        )
        .dropDuplicates()
    )
    # long x short boundary pairs: lengths straddling the cut can still
    # be within max_dist — same length-band equi-join as short_cand
    # (the r3 crossJoin-with-full-short-side-broadcast is gone: on a
    # mostly-short corpus that broadcast was the whole table). Each
    # long-boundary row explodes to <= max_dist band keys (its reachable
    # short lengths), then hash-joins the short side on its exact
    # length — edit distance >= |len diff| makes the band sound.
    boundary_a = long_side.where(F.col("__len") < short_cut + max_dist).select(
        F.col("__s").alias("s_a"),
        F.explode(
            F.sequence(
                F.greatest(F.col("__len") - max_dist, F.lit(0)),
                F.lit(short_cut - 1),
            )
        ).alias("__band"),
    )
    boundary_b = short_side.select(
        F.col("__s").alias("s_b"), F.col("__len").alias("__band")
    )
    boundary = boundary_a.join(boundary_b, "__band").select(
        F.least("s_a", "s_b").alias("s_a"),
        F.greatest("s_a", "s_b").alias("s_b"),
    )

    vcand = long_cand.unionByName(short_cand).unionByName(boundary).dropDuplicates()

    # --- exact verify on distinct string pairs ------------------------
    vpairs = vcand.withColumn(
        "dist", F.levenshtein("s_a", "s_b").cast("long")
    ).where(F.col("dist") <= max_dist)

    # --- expand back to id pairs --------------------------------------
    ids_a = base.select(F.col("__s").alias("s_a"), F.col("__id").alias("id_a"))
    ids_b = base.select(F.col("__s").alias("s_b"), F.col("__id").alias("id_b"))
    cross = (
        vpairs.join(ids_a, "s_a")
        .join(ids_b, "s_b")
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "dist",
        )
    )
    # dist-0 pairs inside each duplicate-string group (distinct strings
    # are never at distance 0, so these never overlap with `cross`)
    dup0 = (
        ids_a.join(
            base.select(F.col("__s").alias("s_a"), F.col("__id").alias("id_b")),
            "s_a",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("long").alias("dist"))
    )
    return cross.unionByName(dup0)
