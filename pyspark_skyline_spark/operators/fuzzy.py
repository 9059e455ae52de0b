"""Fuzzy string matching / record linkage (north-star extension; no
counterpart in the reference).

``fuzzy_pairs`` finds all id pairs whose strings are within edit
(Levenshtein) distance ``max_dist`` — the record-linkage primitive
(near-identical names, titles, URLs) — without ever forming the
all-pairs product. The machinery runs over DISTINCT strings (edit
distance is a property of the string, not the row; duplicate-heavy
columns would otherwise pay the duplicate product in every filter
stage) and expands verified string-pairs back to id-pairs at the end:

- LONG strings go through one of two exact candidate filters
  (``strategy``):

  * ``"segment"`` (default, PassJoin — Li/Deng/Feng, VLDB 2011):
    partition each string into ``d+1`` even segments; by pigeonhole,
    any string within edit distance d contains at least one segment
    VERBATIM, starting within ``±d`` of its source position. The
    candidate join is an equi-join on ``(partner_len, segment_index,
    segment_text)`` — segments are ``~len/(d+1)`` chars, so the key
    stays selective even on SMALL-ALPHABET data (composed names,
    codes, URLs) where every q-gram is ubiquitous and a gram join
    goes quadratic. The probe side enumerates ``O(d²)`` banded
    substrings per (partner length, segment); shorter-side-indexed,
    so each cross-length pair is generated once.
  * ``"qgram"`` (Gravano et al. positional filter): within edit
    distance d the strings admit a one-to-one matching of at least
    ``max(len) - q + 1 - q·d`` q-gram occurrences whose positions
    differ by <= d. Equi-join on exploded positional q-grams +
    distinct-matched-position count threshold (distinct grams alone
    would be UNSOUND: repetitive strings collapse the multiset).
    Strong on large-alphabet text; degenerates when the distinct
    gram universe is small relative to the string count.

- SHORT strings (where the filters are vacuous) are block-joined
  within a ``|len_a - len_b| <= d`` length band (edit distance >=
  length difference, so the band is sound). Short-string volume is
  typically tiny; the band bounds the blowup.
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

#: auto-strategy budget: pick "qgram" only when its candidate join's
#: exact fan-out (sum over grams of occurrence-count squared — the
#: pre-filter row count of the gram self-join) stays within this
#: factor of the total gram volume, i.e. each gram occurrence meets
#: <= this many partners on average. Diverse-alphabet corpora sit at
#: 1-5 partners; the degenerate 40-word fixture sits in the thousands
#: — the regimes are orders of magnitude apart, so the exact cutoff
#: is uncritical (both filters are exact; this only picks the faster
#: plan).
_AUTO_QGRAM_MAX_FANOUT = 32


def _choose_strategy(vals: DataFrame, max_dist: int, q: int) -> str:
    """One-scan probe for ``strategy="auto"``: over the distinct
    strings that would enter the q-gram filter (length >=
    ``q*(max_dist+1)``), build the positional gram table, group by
    gram, and compute the EXACT fan-out of the Gravano candidate join
    — ``sum(occ^2)`` (the join key is the gram alone; position/length
    are post-join predicates, so occurrence multiplicity counts).
    Returns ``"qgram"`` iff ``fanout <= _AUTO_QGRAM_MAX_FANOUT *
    total_occurrences`` (and the long side is non-empty), else
    ``"segment"``.

    Cost: one explode + one gram-count shuffle over the distinct-string
    table — the same gram table the qgram path builds anyway, and far
    cheaper than guessing wrong (the fixture that motivated this went
    quadratic: 30+ min vs 15 s at 200k strings). The segment filter is
    the safe default: its ~len/(d+1)-char keys stay selective on any
    alphabet, while the qgram filter wins only when grams are diverse.
    """
    long_side = vals.where(F.length("__s") >= q * (max_dist + 1))
    occ = long_side.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length(__s) - {q} + 1),"
                f" i -> substring(__s, i, {q}))"
            )
        ).alias("__g")
    ).groupBy("__g").agg(F.count(F.lit(1)).alias("__c"))
    row = occ.agg(
        F.sum("__c").alias("tot"),
        # occ^2 sums overflow a long only past ~3e9 occurrences of one
        # gram; decimal(38,0) keeps the probe exact at any scale
        F.sum(
            F.col("__c").cast("decimal(19,0)") * F.col("__c").cast("decimal(19,0)")
        ).alias("fanout"),
    ).collect()[0]
    if row["tot"] is None or row["tot"] == 0:
        return "segment"
    return (
        "qgram"
        if int(row["fanout"]) <= _AUTO_QGRAM_MAX_FANOUT * int(row["tot"])
        else "segment"
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 3,
    max_gram_freq: int | None = None,
    strategy: str = "segment",
) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` and
    ``levenshtein(s_a, s_b) <= max_dist``. NULL strings never match.

    ``strategy`` picks the long-string candidate filter: ``"segment"``
    (default; PassJoin pigeonhole — robust on any alphabet),
    ``"qgram"`` (positional Gravano filter; ``q``/``max_gram_freq``
    apply only here), or ``"auto"`` (one-scan probe; decision rule
    below). All are necessary conditions of the verified predicate, so
    the result is identical — EXACT with the default parameters
    (``max_gram_freq`` trades qgram recall for hot-gram skew,
    documented below).

    .. versionchanged:: round 6
        ``strategy="auto"``: computes the q-gram join's EXACT fan-out
        (``sum(occ²)`` over the gram table — its pre-filter candidate
        row count) in one aggregate over the distinct strings, and
        picks ``"qgram"`` iff that fan-out is within
        ``_AUTO_QGRAM_MAX_FANOUT`` (32) partners per gram occurrence;
        otherwise ``"segment"``. The two failure modes are opposite
        (qgram: cheap short keys, quadratic on small alphabets;
        segment: longer keys + O(d²) banded probes, robust on any
        alphabet) and the regimes sit orders of magnitude apart, so
        the probe — costing about one qgram gram-count stage — always
        pays for itself when it matters.

    .. versionchanged:: round 5
        Default strategy is ``"segment"``: on a 200k-name fixture with
        a 40-word vocabulary the q-gram join is quadratic (every gram
        is shared by thousands of DISTINCT strings), while segment
        keys (~len/(d+1) chars) stay selective; on large-alphabet text
        both run in similar time. ``"qgram"`` remains for corpora
        where grams are diverse and the shorter key pays off.

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
    if strategy not in ("segment", "qgram", "auto"):
        raise ValueError(
            f"strategy must be 'segment', 'qgram' or 'auto', got {strategy!r}"
        )
    for c in (id_col, str_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame columns {df.columns}")

    from pyspark_skyline_spark.operators.dedup import spread_for_compute

    base = df.select(F.col(id_col).alias("__id"), F.col(str_col).alias("__s")).where(
        F.col("__s").isNotNull()
    )
    # the distinct-string table feeds four branches (index, probe,
    # short, boundary) — materialize it once; the checkpoint RDD is
    # reclaimed by the context cleaner with the plan.
    # spread_for_compute: the distinct's post-shuffle partition count
    # is sized by BYTES (AQE coalesces a 200k-name table to a handful
    # of partitions), but everything downstream is compute-dense
    # map-side work on those partitions — the segment/banded-substring
    # explodes and the O(d²) probe enumeration ran on 4 of 32 cores at
    # the sf1 fixture (8.4 s of a ~10 s operator) until respread
    vals = spread_for_compute(
        base.select("__s")
        .distinct()
        .withColumn("__len", F.length("__s"))
    ).localCheckpoint(eager=False)
    if strategy == "auto":
        strategy = _choose_strategy(vals, max_dist, q)
    if strategy == "segment":
        # below d+1 chars a string has no full-length segment partition
        short_cut = max_dist + 1
        long_side = vals.where(F.col("__len") >= short_cut)
        long_cand = _segment_candidates(long_side, max_dist, short_cut)
    else:
        short_cut = q * (max_dist + 1)  # below this, the count bound is vacuous
        long_side = vals.where(F.col("__len") >= short_cut)
        long_cand = _qgram_candidates(long_side, max_dist, q, max_gram_freq)

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

    vcand = long_cand.unionByName(short_cand).unionByName(boundary)

    # --- exact verify, then dedup the SURVIVORS -----------------------
    # verify BEFORE deduplicating: candidates arrive with duplicates
    # (equal-length pairs from both probe ends, multi-segment matches),
    # but the duplication factor is small, while deduplicating first
    # would shuffle the full candidate set — verification is a map-side
    # filter, so only verified pairs (output-sized) reach a shuffle.
    # The 3-arg threshold levenshtein runs the banded O(d·len) DP and
    # returns -1 past the threshold (exact distance otherwise).
    vpairs = (
        vcand.withColumn(
            "dist", F.expr(f"levenshtein(s_a, s_b, {int(max_dist)})").cast("long")
        )
        .where(F.col("dist") >= 0)
        .dropDuplicates(["s_a", "s_b"])
    )

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


def _segment_candidates(long_side: DataFrame, k: int, short_cut: int) -> DataFrame:
    """PassJoin pigeonhole candidates over distinct strings of length
    >= ``short_cut`` (= k+1).

    Each string of length l is partitioned into ``k+1`` even segments
    (first ``l mod (k+1)`` segments one char longer; start positions a
    pure function of (l, i), so both sides derive them independently).
    If ``lev(r, s) <= k`` then at most k segments of s are touched by
    edit operations — at least one appears VERBATIM in r, its start
    shifted by the net indel count before it. With ``l = len(s) <=
    lb = len(r)``: #ins − #del = lb − l and #ins + #del <= k, so the
    shift δ = (#ins before) − (#del before) is bounded by
    ``−⌊(k−(lb−l))/2⌋ <= δ <= ⌊(k+(lb−l))/2⌋`` — tighter than the
    naive ``±k`` (3 positions instead of 5 at k=2, equal lengths).
    Index side: the segments of each (shorter) string; probe side:
    each string r enumerates, for every partner length ``l in
    [len(r)-k, len(r)]`` and segment index, the banded substrings of r
    with that segment's exact length. Equi-join on ``(l, i,
    substring)`` — a ``~l/(k+1)``-char key, selective on any alphabet.
    Equal-length pairs are generated from both ends; the caller's
    dropDuplicates collapses them.
    """
    n_seg = k + 1
    # segment geometry for a string of length `lcol`, index `icol`:
    #   a = l div (k+1); b = l mod (k+1)
    #   seg_len(i) = a + (1 if i < b else 0)
    #   seg_start(i) = i*a + min(i, b)
    def seg_len(lcol, icol):
        a = F.floor(lcol / n_seg)
        b = lcol % n_seg
        return (a + F.when(icol < b, 1).otherwise(0)).cast("int")

    def seg_start(lcol, icol):
        a = F.floor(lcol / n_seg)
        b = lcol % n_seg
        return (icol * a + F.least(icol, b)).cast("int")

    idx = F.explode(F.sequence(F.lit(0), F.lit(k))).alias("__i")
    segs = (
        long_side.select(F.col("__s").alias("s_a"), F.col("__len").alias("__l"), idx)
        .withColumn("__sl", seg_len(F.col("__l"), F.col("__i")))
        .withColumn("__st", seg_start(F.col("__l"), F.col("__i")))
        .select(
            "s_a",
            "__l",
            "__i",
            "__st",
            F.col("s_a").substr(F.col("__st") + 1, F.col("__sl")).alias("__key"),
        )
    )
    # probe: partner lengths are SHORTER-OR-EQUAL (each cross-length
    # pair generated exactly once; equal lengths twice, deduped later)
    probes = (
        long_side.select(F.col("__s").alias("s_b"), F.col("__len").alias("__lb"))
        .withColumn(
            "__l",
            F.explode(
                F.sequence(
                    F.greatest(F.col("__lb") - k, F.lit(short_cut)), F.col("__lb")
                )
            ),
        )
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(k))))
        .withColumn("__sl", seg_len(F.col("__l"), F.col("__i")))
        .withColumn("__st", seg_start(F.col("__l"), F.col("__i")))
        .withColumn("__dl", F.col("__lb") - F.col("__l"))
        .withColumn(
            "__plo",
            F.greatest(
                F.col("__st") - F.floor((F.lit(k) - F.col("__dl")) / 2).cast("int"),
                F.lit(0),
            ),
        )
        .withColumn(
            "__phi",
            F.least(
                F.col("__st") + F.floor((F.lit(k) + F.col("__dl")) / 2).cast("int"),
                F.col("__lb") - F.col("__sl"),
            ),
        )
        .where(F.col("__plo") <= F.col("__phi"))
        .withColumn("__p", F.explode(F.sequence(F.col("__plo"), F.col("__phi"))))
        .select(
            "s_b",
            "__l",
            "__i",
            F.col("__p").alias("__pst"),
            F.col("s_b").substr(F.col("__p") + 1, F.col("__sl")).alias("__key"),
        )
    )
    # duplicates (equal-length pairs generated from both ends, strings
    # matching on several segments) are NOT collapsed here: the caller
    # verifies first and dedups only survivors
    return (
        segs.join(probes, ["__l", "__i", "__key"])
        .where(F.col("s_a") != F.col("s_b"))
        .select(
            F.least("s_a", "s_b").alias("s_a"),
            F.greatest("s_a", "s_b").alias("s_b"),
        )
    )


def _qgram_candidates(
    long_side: DataFrame, max_dist: int, q: int, max_gram_freq: int | None
) -> DataFrame:
    """Positional q-gram count filter (Gravano et al.) over distinct
    strings — see the module docstring for the soundness argument and
    the ``max_gram_freq`` recall trade."""
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
    return long_cand
