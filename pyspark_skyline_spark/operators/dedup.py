"""Deduplication operators for LLM-data pipelines (north-star extension;
the reference's only dedup is ``dropDuplicates`` on skyline points,
reference src/jobs/stream_job.py:180).

Design notes for 100 TB scale:

* every stage is native Spark SQL expressions (higher-order functions,
  ``xxhash64``) — zero Python in the hot path;
* MinHash-LSH candidate generation is an equi-join on (band index,
  band key) — a hash-partitioned shuffle, never an all-pairs product;
* the verify stage re-checks true Jaccard only on candidate pairs;
* ``hash_mode="md5"`` swaps xxhash64 for an md5-derived 60-bit hash so
  an external ANSI-SQL engine (DuckDB oracle) can reproduce signatures
  bit-for-bit; production default stays xxhash64 (cheaper, JVM codegen).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window, functions as F

from pyspark_skyline_spark.operators.text import tokens

__all__ = [
    "dedup_exact",
    "exact_dup_groups",
    "shingles",
    "ordered_shingles",
    "hash64_expr",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    "dedup_keep_best",
    "shingle_novelty",
    "dedup_corpus",
    "dedup_corpus_exact_phase",
    "dedup_incremental",
    "dedup_incremental_neardup",
    "substring_dedup_spans",
    "substring_scrub",
    "paragraph_dedup",
    "paragraph_dedup_incremental",
    "spread_for_compute",
]


#: size budget for broadcasting a verify build side (the per-doc
#: sketch/shingle table) in ngram_jaccard_pairs / minhash_lsh_pairs:
#: candidates on low-diversity corpora outnumber docs by orders of
#: magnitude, so under the budget the verify joins become map-side
#: broadcast-hash probes instead of shuffling every candidate with
#: both array payloads; past it (the 100 TB regime where the sketch
#: table is itself huge) the shuffle join is the right plan. Module
#: constant so tests can pin both regimes differential-equal.
_VERIFY_BROADCAST_BUDGET = 128 * 1024 * 1024

#: broadcast-feasibility factor applied to block-manager stored bytes.
#: Two opposite corrections roughly cancel: the hashed relation a
#: broadcast builds adds table slots/pointers on top of the row bytes
#: (~1.5-2x), but the checkpoint stores MORE than the broadcast
#: projection carries (jaccard broadcasts only the 8-byte hashes out
#: of the stored 16-byte (df, hash) structs; minhash broadcasts two
#: of base's columns). Net factor ~1; measured at sf1 this keeps the
#: broadcast/shuffle decisions identical to the round-6 aggregate
#: probe on both operators (jaccard ranked 80 MB, minhash base 67 MB
#: — both under the 128 MB budget, where broadcast measurably paid).
_HASHED_RELATION_FACTOR = 1


def _persisted_bytes(df: DataFrame) -> int | None:
    """Actual stored footprint of a just-``localCheckpoint(eager=True)``'d
    DataFrame, read from the driver's block-manager metadata — NO Spark
    job.

    Round 6 sized the verify-broadcast decision with a one-aggregate
    probe job per invocation (an extra scheduling round trip, and for
    minhash an O(corpus) interpreted-HOF length sum). The checkpoint
    the pipeline materializes anyway already knows its own size: the
    eager ``localCheckpoint`` persists the plan's internal RDD, whose
    mem+disk bytes the block manager tracks per RDD id. Reading that is
    a driver-side metadata lookup, so the size probe folds into the job
    the operator was already paying for. Returns ``None`` when the
    plan-internal accessors are unavailable (callers fall back to the
    round-6 aggregate probe). Note the fallback also decides broadcast
    on the test fixtures, so the regime-differential pytest alone
    cannot tell this path from a permanently-broken one (the
    regression would be performance-only: one extra probe job per
    invocation) — a dedicated unit test therefore pins that this
    accessor returns a positive size on a checkpointed DataFrame.
    """
    try:
        rdd_id = df._jdf.queryExecution().analyzed().rdd().id()
        jsc = df.sparkSession.sparkContext._jsc.sc()
        for info in jsc.getRDDStorageInfo():
            if info.id() == rdd_id:
                return int(info.memSize()) + int(info.diskSize())
    except Exception:
        return None
    return None


#: Catalyst's fallback estimate for leaves with no statistics
#: (spark.sql.defaultSizeInBytes = Long.MaxValue): anything this large
#: is "size unknown", not "huge table"
_UNKNOWN_SIZE = 1 << 62


def _max_split_bytes(spark) -> int:
    """spark.sql.files.maxPartitionBytes as an int (the conf string may
    be '134217728b' or '1g'; Hadoop-style suffix parsing via the JVM)."""
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        return int(
            spark.sparkContext._jvm.org.apache.spark.network.util.JavaUtils
            .byteStringAsBytes(raw)
        )
    except Exception:  # pragma: no cover - conf/JVM oddity
        return 128 * 1024 * 1024


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism when the
    input would scan with fewer partitions than cores.

    Byte-based file splitting undersizes compute-dense per-row work: a
    one-file corpus scans as one partition, so hashing / shingling /
    join fanout run on one core no matter how many are idle. At real
    scale (input bytes >> cores x maxPartitionBytes) this is a no-op —
    no extra shuffle is introduced.

    The under-parallelized check reads Catalyst's optimized-plan
    statistics instead of ``df.rdd.getNumPartitions()`` (round 14,
    VERDICT r13 #7): the RDD conversion paid a full physical-planning
    pass plus the Python-RDD wrapper per call (~80 ms driver time,
    measured; ~25 ms for the stats probe) — and under AQE it is worse
    than driver time: ``.rdd`` on a plan with exchanges EXECUTES the
    intermediate stages to resolve the final partitioning, so probing
    a post-distinct input (fuzzy's call site) ran the distinct twice.
    The byte estimate makes the same call the split planner would:
    fewer than ``thresh`` splits' worth of bytes means the scan — or
    the AQE-coalesced shuffle, which packs by the same byte logic —
    cannot reach ``thresh`` partitions. A leaf with NO statistics
    (e.g. an Arrow-built local table) falls back to the physical probe
    rather than guessing."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    thresh = max(2, target // 2)
    size = -1
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - plan accessors unavailable
        pass
    if 0 < size < _UNKNOWN_SIZE:
        if size >= thresh * _max_split_bytes(spark):
            return df
        return df.repartition(target)
    if df.rdd.getNumPartitions() >= thresh:  # unknown size: physical probe
        return df
    return df.repartition(target)


def pin_compute_shuffle(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition by ``key_cols`` at the session's CONFIGURED
    shuffle parallelism, pinned against AQE partition coalescing.

    AQE coalesces post-shuffle partitions by BYTES (default 1 MB
    minimum / 64 MB advisory), which is the right call for
    byte-bound stages but exactly wrong for compute-dense ones: a
    candidate-pair table is ~16 bytes/row while its verify stage does
    an O(set size) ``array_intersect`` per row — profiled at sf0.1,
    the similarity-join verify stages collapsed to 1-2 tasks (1.6-3.6 s
    single-task walls with 31 cores idle). A user-specified repartition
    is exempt from AQE coalescing, and placing it on the join/aggregate
    key means the downstream aggregate or join REUSES the exchange —
    no extra shuffle, just a pinned partition count.

    The count comes from ``spark.sql.shuffle.partitions`` — the
    session's scale knob (what the exchange would have used before
    coalescing) — not from local core count, so cluster configs size it
    exactly as they size every other reduce stage."""
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # pragma: no cover - e.g. "auto"
        n = spark.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in key_cols])


def dedup_exact(df: DataFrame, subset: list[str], order_col: str | None = None) -> DataFrame:
    """Exact dedup. With ``order_col``, keeps the row with the smallest
    ``order_col`` per duplicate group (deterministic representative);
    otherwise plain ``dropDuplicates`` (hash-aggregate, map-side
    partial)."""
    if order_col is None:
        return df.dropDuplicates(subset)
    w = Window.partitionBy(*subset).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def exact_dup_groups(
    df: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """Per duplicate group: representative id (min) + multiplicity."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).cast("long").alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def ordered_shingles(text_col, k: int = 3) -> Column:
    """Word k-shingles of lowercased text IN TOKEN ORDER (duplicates
    kept — the positional sequence winnowing needs); texts shorter than
    k tokens collapse to their full token string (so every doc has >= 1
    shingle).

    Built as a ``zip_with`` fold of k shifted slices rather than a
    ``transform`` over indices: a lambda body that references the token
    expression re-evaluates the split per ELEMENT (interpreted HOF), a
    ~50x hot-path penalty; ``zip_with`` children evaluate once per row.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    width = n - F.lit(k - 1)
    win = F.slice(toks, 1, width)
    for j in range(1, k):
        win = F.zip_with(
            win,
            F.slice(toks, 1 + j, width),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, win).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(text_col, k: int = 3) -> Column:
    """Distinct word k-shingles (set semantics — the form Jaccard and
    MinHash consume); first-occurrence order."""
    return F.array_distinct(ordered_shingles(text_col, k))


def hash64_expr(s: Column, salt: Column | None, mode: str = "xxhash64") -> Column:
    """64-bit-ish hash of a string (+ optional salt column).

    xxhash64: native JVM hash (production). md5: first 15 hex digits of
    md5 as a 60-bit integer — reproducible in any SQL engine
    (``('0x' || substr(md5(x),1,15))::BIGINT`` in DuckDB)."""
    val = s if salt is None else F.concat(s, F.lit("#"), salt.cast("string"))
    if mode == "xxhash64":
        return F.xxhash64(val)
    if mode == "md5":
        return F.conv(F.substring(F.md5(val.cast("binary")), 1, 15), 16, 10).cast("long")
    raise ValueError(f"hash mode {mode!r}")


#: Mersenne prime 2^61 - 1: the modulus of the md5-mode seed mix.
_MERSENNE61 = (1 << 61) - 1

_MASK31 = (1 << 31) - 1
_MASK30 = (1 << 30) - 1


def _fold61(v: Column) -> Column:
    """``v mod (2^61 - 1)`` for ``0 <= v < 2^63``: plain long ``%`` —
    exact on int64, a single expression node (the classic
    shift-and-fold Mersenne reduction references its argument several
    times per level, and nested levels blow the expression TREE up
    exponentially — the first draft OOM'd the analyzer on one seed
    mix), and the JIT strength-reduces modulo-by-constant anyway. No
    decimal, no allocation."""
    return v % F.lit(_MERSENNE61)


def _modmul61_const(x: Column, k: int) -> Column:
    """``(x * k) mod (2^61 - 1)`` for ``0 <= x < 2^61`` (column) and
    ``0 <= k < 2^61`` (plan-time constant), entirely in non-overflowing
    signed-64 arithmetic: split both at bit 31
    (``x = x1·2^31 + x0``, ``x1 < 2^30``, ``x0 < 2^31``) so

        x·k = x1k1·2^62 + (x1k0 + x0k1)·2^31 + x0k0

    with ``2^62 ≡ 2``, and the middle term reduced via a second split
    at bit 30 (``m·2^31 = (m >>> 30)·2^61 + (m & mask30)·2^31 ≡
    (m >>> 30) + (m & mask30)·2^31``). Every intermediate stays below
    2^62, so ANSI mode never sees an overflow. Replaces the
    decimal(20,0) formulation, whose per-row BigDecimal allocation
    churn caused multi-second GC-driven run-to-run variance on the
    md5-mode rows (round-10 phase attribution: fused neardup row
    5.2-68.4 s across identical passes under decimal at flat host
    calib vs a stable ~3 s for the allocation-free xxhash64 mode);
    outputs are bit-identical to the decimal math, so every md5-mode
    SQL oracle (DuckDB HUGEINT) is untouched."""
    k1, k0 = k >> 31, k & _MASK31
    x1 = F.shiftrightunsigned(x, 31)
    x0 = x.bitwiseAND(F.lit(_MASK31))
    # ONE deferred reduction: t1 <= 2·(2^30-1)^2 < 2^61, the reduced
    # middle term < 2^61 + 2^32, x0k0 < 2^62 — their sum stays below
    # 2^63 - 2^33, inside signed 64, so a single final % suffices
    # (each avoided % is a hardware divide per row per seed)
    t1 = x1 * F.lit(2 * k1)
    m = x1 * F.lit(k0) + x0 * F.lit(k1)
    t2 = F.shiftrightunsigned(m, 30) + F.shiftleft(
        m.bitwiseAND(F.lit(_MASK30)), 31
    )
    t3 = x0 * F.lit(k0)
    return _fold61(t1 + t2 + t3)


def _modsquare61(x: Column) -> Column:
    """``x² mod (2^61 - 1)`` for ``0 <= x < 2^61``, same split scheme
    as :func:`_modmul61_const` with both factors the runtime column
    (``x² = x1²·2^62 + 2·x1x0·2^31 + x0²``)."""
    x1 = F.shiftrightunsigned(x, 31)
    x0 = x.bitwiseAND(F.lit(_MASK31))
    # same single-deferred-reduction bound argument as _modmul61_const
    t1 = x1 * x1 * F.lit(2)
    m = x1 * x0 * F.lit(2)
    t2 = F.shiftrightunsigned(m, 30) + F.shiftleft(
        m.bitwiseAND(F.lit(_MASK30)), 31
    )
    t3 = x0 * x0
    return _fold61(t1 + t2 + t3)


def _md5_mix_base(hashed: DataFrame) -> DataFrame:
    """Stage the seed-independent md5-mode intermediates as COLUMNS:
    ``__h2 = h² mod p`` plus the 31-bit splits of both ``__h`` and
    ``__h2``. The per-seed mix expressions then reference five small
    attribute columns instead of inlining the split arithmetic 32
    times — the ANALYZED trees stay tiny (CollapseProject re-inlines
    at optimization time, which runs once per action, and codegen CSE
    dedupes the shared splits at execution)."""
    return hashed.withColumn("__h2", _modsquare61(F.col("__h"))).select(
        "*",
        F.shiftrightunsigned(F.col("__h"), 31).alias("__h1"),
        F.col("__h").bitwiseAND(F.lit(_MASK31)).alias("__h0"),
        F.shiftrightunsigned(F.col("__h2"), 31).alias("__g1"),
        F.col("__h2").bitwiseAND(F.lit(_MASK31)).alias("__g0"),
    )


def _modmul_sqlstr(hi: str, lo: str, k: int) -> str:
    """SQL text of :func:`_modmul61_const` over pre-split columns
    ``hi``/``lo`` (the 31-bit halves) and plan-time constant ``k``."""
    k1, k0 = k >> 31, k & _MASK31
    m = f"({hi} * {k0} + {lo} * {k1})"
    return (
        f"({hi} * {2 * k1} + (shiftrightunsigned({m}, 30) + "
        f"shiftleft({m} & {_MASK30}, 31)) + {lo} * {k0}) % {_MERSENNE61}"
    )


def _md5_mix_exprs(num_hashes: int) -> list[Column]:
    """The md5-mode per-seed mix columns ``__h0..__h{H-1}`` as
    ``F.expr`` over a :func:`_md5_mix_base` frame — same values as
    :func:`_seed_mix` (pinned by the bigint differential test), but
    each seed is ONE gateway call carrying a SQL string instead of
    ~55 py4j Column constructions. Profiled round 10: the Column-tree
    construction of a 32-seed projection cost ~1.5 s of DRIVER time
    per signature build (py4j chatter + analyzer load) — more than
    the cluster-side execution of the whole signature job."""
    return [F.expr(s) for s in _md5_mix_sqls(num_hashes)]


def _bt(name: str) -> str:
    """Backtick-quote an identifier for embedding in SQL text, escaping
    backticks in the name itself (ADVICE r13: a column named with a
    backtick would otherwise break — or smuggle SQL into — every
    selectExpr that interpolates ``{id_col}``)."""
    return "`" + name.replace("`", "``") + "`"


def _xx_mix_sqls(num_hashes: int) -> list[str]:
    """The xxhash64-mode per-seed mixes as aliased SQL strings for
    ``selectExpr`` — the production-mode twin of :func:`_md5_mix_sqls`
    (round 14): the Column-API form paid two py4j round trips per seed
    (~0.3 s of driver time per 64-seed signature build); the parsed
    expressions are identical (pinned by the seed-mix differential
    test)."""
    return [f"xxhash64(__h, {j}) AS __h{j}" for j in range(num_hashes)]


def _md5_mix_sqls(num_hashes: int) -> list[str]:
    """The md5-mode per-seed mixes as aliased SQL STRINGS for
    ``selectExpr`` — one gateway call for the whole projection instead
    of one ``F.expr`` + one ``.alias`` per seed (round 13: 0.37 →
    0.16 s of driver time per 64-seed signature build; the JVM-side
    parse is identical either way)."""
    out = []
    for j in range(num_hashes):
        a, b, c = _mix_param(j)
        out.append(
            f"(({_modmul_sqlstr('__g1', '__g0', a)}) + "
            f"({_modmul_sqlstr('__h1', '__h0', b)}) + {c}) "
            f"% {_MERSENNE61} AS __h{j}"
        )
    return out


@lru_cache(maxsize=None)
def _mix_param(j: int) -> tuple[int, int, int]:
    """Deterministic seed-j constants (a_j, b_j, c_j) for the md5-mode
    seed mix ``(a_j * (h² mod p) + b_j * h + c_j) mod p`` with
    p = 2^61 - 1 — a degree-2 polynomial hash family (3-wise
    independent), derived from md5 so any engine rebuilds the
    identical constants. Keyed by the seed index ALONE so the Spark
    side (one seed at a time) and the oracle side (the full list) can
    never desynchronize.

    Why quadratic: the LINEAR family (a*h + b) mod p measurably
    under-scrambles for MinHash — the planted-pair banding-recall
    pytest caught it 2-4 hits below the ideal-permutation median;
    linear maps are only pairwise independent and their min-wise
    approximation error shows at realistic set sizes. The quadratic
    family lands on the ideal median at one extra multiply per seed.
    The 16-hex (64-bit) draw makes the mod-p reduction real so the
    constants span all of Z_p (15 hex = 60 bits would silently cap
    them below 2^60). All intermediates stay exact in both engines:
    h² < 2^122, a_j*(h² mod p) < 2^122 ≈ 5.3e36 — inside Spark
    DECIMAL(38,0) (< 1e38) and DuckDB HUGEINT. a_j >= 1 and p prime
    keep the map a true scramble of Z_p (the reorder-the-top-bits
    property an XOR mix lacks — round-3 note below)."""
    import hashlib

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)

    return (
        h64(f"mix_a_{j}") % (_MERSENNE61 - 1) + 1,
        h64(f"mix_b_{j}") % _MERSENNE61,
        h64(f"mix_c_{j}") % _MERSENNE61,
    )


def _mix_params(num_hashes: int) -> tuple[tuple[int, int, int], ...]:
    """The first ``num_hashes`` seed-mix constant triples (oracle-side
    convenience; see :func:`_mix_param`)."""
    return tuple(_mix_param(j) for j in range(num_hashes))


def _seed_mix(h: Column, j: int, mode: str, h2: Column | None = None) -> Column:
    """Per-seed variant of the base shingle hash: a FULL reorder, not an
    XOR. XOR with a constant below the top bits cannot reorder values
    that differ in those bits, so with realistic shingle counts every
    "seed" shares one argmin and the H-component signature collapses to
    a single-hash MinHash (H-fold replicated) — candidate recall drops
    from the banded S-curve 1-(1-J^r)^b to ~J.

    xxhash64 mode re-hashes (hash of base hash + seed). md5 mode
    (round 7) uses the degree-2 polynomial scramble
    ``(a_j * (h² mod p) + b_j * h + c_j) mod p``, p = 2^61 - 1,
    instead of a PER-SEED md5 re-hash: the old construction paid
    num_hashes md5+hex-parse calls per shingle (~33 md5s/shingle at
    H=32 — measured as the dominant cost of the md5-mode driver rows),
    while two multiplies per seed are pure codegen'd arithmetic and
    equally engine-portable (HUGEINT in DuckDB). Degree 2, not 1: see
    ``_mix_params`` — the linear family measurably hurt banding
    recall; the quadratic one matches the re-hash mode on the
    planted-pair guard. Round 10: the multiplies moved from
    decimal(20,0) to the pure-long split scheme
    (:func:`_modmul61_const`) — bit-identical values, no BigDecimal
    allocation churn (the attributed source of the neardup bench
    row's 5-68 s run-to-run variance), no oracle change.

    Pass ``h2`` = ``(h² mod p)`` as a precomputed column when mixing
    many seeds of the same base hash: the squaring is seed-independent,
    so factoring it out of an H-wide projection cuts both the modular
    work and the generated-code size by ~a third."""
    if mode == "xxhash64":
        return F.xxhash64(h, F.lit(j))
    if mode != "md5":
        # match hash64_expr's contract: a typo'd mode must raise, not
        # silently get md5 semantics (callers pre-validate via the base
        # hash today, but a future direct caller would be bitten)
        raise ValueError(f"unknown hash_mode: {mode!r}")
    a, b, c = _mix_param(j)
    if h2 is None:
        h2 = _modsquare61(h)
    # each term lands in [0, p); their sum stays under 3p < 2^63
    return _fold61(_modmul61_const(h2, a) + _modmul61_const(h, b) + F.lit(c))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash signatures, relational formulation: explode shingles, ONE
    string hash per shingle, then ``num_hashes`` independent per-seed
    RE-HASHES of that long (``_seed_mix`` — a full-order scramble, each
    a valid permutation-approximation) aggregated with per-seed minima
    in one hash-aggregate (map-side partial agg — the shape that
    scales). The expensive string hash runs once per shingle; the seed
    variants hash a LONG, and in md5 mode stay reproducible in any
    engine.

    Returns (id_col, m0..m{H-1}).
    """
    # byte-sized file splits undersize this compute-dense pipeline the
    # same way they did minhash_lsh_pairs' (one small parquet split =
    # ONE core running H mixes over every shingle — measured 12.9 s for
    # a 3.3k-doc ledger at sf0.1 before the respread, ~1 s after)
    df = spread_for_compute(df)
    sh_tbl = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_k)).alias("__s")
    )
    base_hash = hash64_expr(F.col("__s"), None, hash_mode).alias("__h")
    hashed = sh_tbl.select(id_col, base_hash)
    if hash_mode == "md5":
        # SQL-string mix exprs over pre-split columns, shipped through
        # ONE selectExpr gateway call (see _md5_mix_sqls)
        mixed = _md5_mix_base(hashed).selectExpr(
            _bt(id_col), *_md5_mix_sqls(num_hashes)
        )
    else:
        mixed = hashed.selectExpr(_bt(id_col), *_xx_mix_sqls(num_hashes))
    # F.expr named-alias form: one gateway call per seed instead of two
    return mixed.groupBy(id_col).agg(
        *[F.expr(f"min(__h{j}) AS m{j}") for j in range(num_hashes)]
    )


def _band_keys(num_hashes: int, bands: int) -> Column:
    """LSH band keys over signature columns ``m0..m{H-1}``: one string
    key per band (the joined row slice). Shared by the all-pairs and
    incremental paths so a stored signature ledger bands identically.

    Built as ONE ``F.expr`` SQL string, not nested Column calls: the
    Column-API form made ~100 py4j round trips (16 bands x 4 casts +
    concat_ws + array) — measured 1.45 s of pure DRIVER time per call
    at H=64/b=16, paid once or twice per minhash-family query build;
    the single-string form is ~1 ms for the identical expression
    (round 13; same class of fix as _md5_mix_exprs' round-10 note)."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    parts = ", ".join(
        "concat_ws(',', "
        + ", ".join(
            f"CAST(m{b * rows_per_band + i} AS STRING)"
            for i in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    return F.expr(f"array({parts})")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline: signature -> per-band key (joined row slice) -> equi-join
    on (band, key) for candidates -> exact Jaccard verify on distinct
    shingle sets -> pairs with ``jac >= threshold``.

    ``max_bucket_size`` guards the scale hazard of HOT buckets: a
    cluster of k mutual near-dups shares band keys, so the self-join
    emits ~k²/2 candidates per band — at corpus scale one 100k-strong
    boilerplate cluster is a 5-billion-pair skew bomb in a single join
    key. With the cap set, buckets larger than the cap are dropped
    before the join (one count-by-key pass, map-side combined).
    Trade-off, stated precisely: pairs whose EVERY matching band lands
    in an over-cap bucket are lost — i.e. recall loss concentrates on
    members of giant clusters, which (a) exact-dedup upstream should
    have collapsed and (b) still interconnect through their other
    bands with high probability. Default None = exact behavior (the
    oracle mirrors banding, so oracle mode runs uncapped).

    Returns (id_a, id_b, jac) with id_a < id_b.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    df = spread_for_compute(df)
    # shingle+hash each document ONCE and materialize: the signature
    # branch and the verify branch both consume the hashed occurrence
    # table, and without the checkpoint each would re-run the
    # tokenize->shingle->hash pipeline (the compute-dense part) from
    # the raw text. Round 14: the shared table holds (id, 64-bit hash)
    # rows instead of per-doc STRING shingle arrays — the verify then
    # intersects long arrays rather than string arrays (set relations
    # are hash-preserved; a cross-doc collision could only perturb a
    # candidate's jaccard by ~2^-61-probability counts, and the
    # md5-mode oracle hash-verifies actual values), the checkpoint
    # stores 8-byte hashes instead of shingle text, and the broadcast
    # build side shrinks the same way.
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("__s"),
    ).select(
        "__id", hash64_expr(F.col("__s"), None, hash_mode).alias("__h")
    ).localCheckpoint(eager=True)
    if hash_mode == "md5":
        mixed = _md5_mix_base(ex).selectExpr(
            "__id", *_md5_mix_sqls(num_hashes)
        )
    else:
        mixed = ex.selectExpr("__id", *_xx_mix_sqls(num_hashes))
    sig_tbl = mixed.groupBy("__id").agg(
        *[F.expr(f"min(__h{j}) AS m{j}") for j in range(num_hashes)]
    )
    exploded = sig_tbl.select(
        F.col("__id"),
        F.posexplode(_band_keys(num_hashes, bands)).alias("__band_idx", "__band_key"),
    )
    if max_bucket_size is not None:
        sizes = exploded.groupBy("__band_idx", "__band_key").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        exploded = (
            exploded.join(sizes, ["__band_idx", "__band_key"])
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band_idx") == F.col("b.__band_idx"))
            & (F.col("a.__band_key") == F.col("b.__band_key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    )
    # pinned-parallelism candidate dedup + verify (see
    # pin_compute_shuffle): the per-candidate shingle-set intersection
    # below is compute-dense, and AQE's byte-based coalescing collapses
    # the ~16-byte/row candidate shuffle to 1-2 tasks; the
    # dropDuplicates aggregate reuses this exchange
    cand = pin_compute_shuffle(cand, "id_a", "id_b").dropDuplicates()

    # BROADCAST the verify build side when it measurably fits — same
    # rationale and 128 MB budget as ngram_jaccard_pairs (the per-doc
    # shingle table is one row per doc; LSH bucket candidates can be
    # orders of magnitude more numerous on low-diversity corpora, and
    # shuffling each candidate through two array-payload sort-merge
    # joins dominates the verify). The size comes FREE from the
    # block-manager metadata of the eager checkpoint the pipeline
    # materializes anyway (round 6 paid an extra probe job + an
    # O(corpus) HOF length sum here); past the budget the shuffle join
    # stands (the 100 TB regime).
    # per-doc hash sets from the shared occurrence table: one hash-agg
    # (map-side combined); sorted so array_intersect scans stay cheap
    # and deterministic. collect_set dedups exactly like the string
    # form did (shingles are distinct per doc; only a ~2^-61 collision
    # could merge two).
    # lazy checkpoint: the verify's two join sides each build their own
    # (differently-keyed) broadcast, and without the cut each build
    # would re-run this aggregate from the occurrence checkpoint
    base_sets = (
        ex.groupBy("__id")
        .agg(F.array_sort(F.collect_set("__h")).alias("__sh"))
        .localCheckpoint(eager=False)
    )
    stored = _persisted_bytes(ex)
    if stored is None:  # metadata accessors unavailable: round-6 probe
        vstats = ex.agg(F.count(F.lit(1)).alias("rows")).collect()[0]
        est_bytes = int((vstats["rows"] or 0) * (8 * 1.4 + 16))
    else:
        # the aggregated set table re-packs the same 8-byte hashes the
        # occurrence checkpoint stores (minus per-row id overhead), so
        # the stored occurrence bytes bound the hashed relation
        est_bytes = stored * _HASHED_RELATION_FACTOR
    vbase = F.broadcast(base_sets) if est_bytes <= _VERIFY_BROADCAST_BUDGET else base_sets
    sh_a = vbase.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    sh_b = vbase.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    # size-arithmetic Jaccard: elements are distinct per doc (the
    # shingle sets), so |A∪B| = |A| + |B| - |A∩B| — array_union would
    # rebuild and MATERIALIZE the union array per candidate (an O(n)
    # allocation on the hottest path); size() is O(1) on array columns
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jac",
            inter.cast("double")
            / (F.size("__sh_a") + F.size("__sh_b") - inter),
        )
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )
    return verified


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60, hash_mode: str = "xxhash64"
) -> DataFrame:
    """SimHash document sketch: per bit i, sign of sum over tokens of
    (+1 if bit i of hash(token) else -1); packed into two integers
    (lo = bits 0..29, hi = bits 30..bits-1) to stay in positive bigint
    range everywhere. Hamming distance between sketches approximates
    cosine distance of the token multisets.

    Relational formulation: explode tokens, hash once per token, then
    one hash-aggregate of ``bits`` bit-extraction sums (shiftright+and,
    map-side partial agg) plus a token count; bit i of the sketch is set
    iff set-count > half the tokens — same sign rule as the classic
    +1/-1 accumulation (2*S_i > n), but the branch-free extraction
    codegens to much smaller methods than ``bits`` when/otherwise
    chains (~2x wall-clock at sf0.1)."""
    tok_tbl = spread_for_compute(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    hashed = tok_tbl.select(
        id_col, hash64_expr(F.col("__t"), None, hash_mode).alias("__h")
    )
    bit_sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1))).alias(f"__b{i}")
            for i in range(bits)
        ],
    )
    half = bits // 2
    lo = sum(
        (
            F.when(2 * F.col(f"__b{i}") > F.col("__n"), F.lit(1 << i)).otherwise(0)
            for i in range(half)
        ),
        F.lit(0).cast("long"),
    )
    hi = sum(
        (
            F.when(2 * F.col(f"__b{i}") > F.col("__n"), F.lit(1 << (i - half))).otherwise(0)
            for i in range(half, bits)
        ),
        F.lit(0).cast("long"),
    )
    return bit_sums.select(
        F.col(id_col), lo.alias("simhash_lo"), hi.alias("simhash_hi")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int | None = None,
    bits: int = 60,
    hash_mode: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, found with
    banded LSH (the classic Charikar / Manku-Jain-Sarma web-dedup
    scheme): split the ``bits``-bit sketch into ``bands`` equal chunks;
    any pair within Hamming distance ``max_hamming`` must agree on at
    least one whole chunk whenever ``bands > max_hamming`` (pigeonhole),
    so candidates come from an equi-join on (chunk index, chunk value) —
    never an all-pairs product — and an exact ``bit_count(xor)`` check
    keeps true pairs. With the default ``bands = max_hamming + 1`` the
    operator is EXACT (complete recall), not approximate.

    ``max_bucket_size`` drops over-cap (chunk, value) groups before the
    self-join — same giant-cluster skew guard as ``minhash_lsh_pairs``
    (a chunk value shared by a huge boilerplate cluster is a k² join
    bomb); None = no cap.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole guarantee"
        )
    if bits % bands:
        raise ValueError("bands must divide bits")
    width = bits // bands
    half = bits // 2

    sig = simhash(df, id_col, text_col, bits, hash_mode)
    # repack lo/hi into the full sketch (both halves are < 2^30 so the
    # bits-bit value fits a positive bigint)
    full = (F.col("simhash_hi") * F.lit(1 << half) + F.col("simhash_lo")).alias("__sig")
    sig = sig.select(F.col(id_col).alias("__id"), full).localCheckpoint(eager=False)
    chunks = sig.select(
        "__id",
        "__sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for b in range(bands)
                ]
            )
        ).alias("__chunk_idx", "__chunk"),
    )
    if max_bucket_size is not None:
        sizes = chunks.groupBy("__chunk_idx", "__chunk").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        chunks = (
            chunks.join(sizes, ["__chunk_idx", "__chunk"])
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__chunk_idx") == F.col("b.__chunk_idx"))
            & (F.col("a.__chunk") == F.col("b.__chunk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via prefix filtering (the
    AllPairs/PPJoin candidate rule, distributed as in Vernica et al.'s
    MapReduce set-similarity join).

    Shingle sets are canonically ordered by their 60-bit hash. If
    ``J(A, B) >= t`` then the first ``|S| - ceil(t*|S|) + 1`` elements
    of the two sorted sets must intersect, so candidates come from an
    equi-join on exploded prefix elements plus the length filter
    ``|A| >= ceil(t*|B|)`` both ways — never an all-pairs or
    length-block product (length blocks barely discriminate on
    same-length corpora: at sf0.1 they admitted ~4M candidate pairs
    where prefixes admit orders of magnitude fewer).

    Prefix elements are canonically ordered by GLOBAL document
    frequency, rarest first (ties by hash) — the AllPairs token
    ordering: common shingles sink past the prefix, so prefix-key
    collisions happen only on rare shared content. Costs one
    explode/count/re-aggregate pass over the corpus — two shuffles of
    (id, shingle-hash) pairs, the documented trade the MapReduce
    set-similarity literature makes for orders-of-magnitude fewer
    candidates. Exact Jaccard verify on candidates keeps the operator
    exact; any consistent total order preserves prefix-filter
    completeness, so the verify step still uses plain hash-sorted sets.
    """
    t = threshold
    df = spread_for_compute(df)
    # shingles as 60-bit hashes: set relations are preserved (same hash
    # both engines), and the verify-join intersects long arrays instead
    # of string arrays — far cheaper to shuffle and compare.
    # Round 14: the md5 runs as a TOP-LEVEL expression over the
    # EXPLODED occurrence table, not as a per-element ``transform``
    # lambda — higher-order-function bodies evaluate interpreted, and
    # the per-shingle md5+hex-parse inside one was the bulk of a
    # 13.7-CPU-s sketch-build stage at sf0.1; top-level expressions are
    # whole-stage-codegen'd. Per-doc hash-dedup and sorting move into
    # the ranked aggregate below (array_distinct of the sorted struct
    # array — hash-distinct exactly like the oracle's list_distinct of
    # md5s), so the occurrence table is the ONE materialization the
    # dfreq branch and the ranked aggregate share; localCheckpoint
    # trades lineage-based recovery for it (executor loss => job
    # retry).
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("__s"),
    ).select(
        "__id", hash64_expr(F.col("__s"), None, "md5").alias("__h")
    ).localCheckpoint(eager=False)
    prefix_len = (F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1).cast("int")
    # Only repeated shingles (df >= 2) need a real frequency: singletons
    # — the overwhelming majority of shingles in a deduplicated corpus —
    # all tie at df=1 and sort by hash anyway, so a left join against
    # the df>=2 table + coalesce(df, 1) yields the identical total
    # order while shrinking the join's build side by orders of
    # magnitude (usually to broadcast range; the ordering stays
    # globally consistent, which is all prefix-filter completeness
    # requires).
    # rarest-first canonical order: per-shingle document frequency,
    # then re-aggregate each doc's set sorted by (df, hash)
    dfreq = (
        ex.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2)
    )
    # array_distinct AFTER array_sort: per-doc hash-dedup (shingle
    # STRINGS are distinct per doc already, so this only collapses the
    # astronomically-rare intra-doc md5 collision — keeping __n and the
    # verify sets bit-equal to the oracle's distinct-of-hashes); equal
    # hashes share their global __df, so struct-distinct IS hash-
    # distinct, and sorting first keeps it one O(n) pass
    ranked = (
        ex.join(dfreq, "__h", "left")
        .groupBy("__id")
        .agg(
            F.array_distinct(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.coalesce(F.col("__df"), F.lit(1)).alias("__df"),
                            F.col("__h"),
                        )
                    )
                )
            ).alias("__rsh")
        )
        .withColumn("__n", F.size("__rsh"))
    )
    # MATERIALIZE the sketch table once: three consumers (prefix branch,
    # verify-a, verify-b) would otherwise each recompute the whole
    # shingle->md5->explode->dfreq-join->collect_list pipeline — Spark's
    # exchange-reuse does NOT fire across these branches (verified from
    # the physical plan: 3x duplicated aggregation subtrees, the
    # dominant cost). The sketch table is strictly smaller than the
    # corpus text, so this is the standard compute-sketches-once
    # materialization; localCheckpoint trades lineage-based recovery
    # for it (executor loss => job retry), the documented trade.
    # Eager: the verify-broadcast size gate below reads this
    # checkpoint's stored bytes from block-manager metadata, so the
    # materialization job doubles as the size probe.
    ranked = ranked.localCheckpoint(eager=True)
    # candidates: (id, size, prefix position+element) only — no payload
    pref = ranked.select(
        "__id",
        "__n",
        F.posexplode(
            F.slice(F.transform("__rsh", lambda x: x["__h"]), F.lit(1), prefix_len)
        ).alias("__pos", "__p"),
    )
    # pin the prefix self-join's exchange at configured parallelism:
    # prefix keys are ~16 bytes/row but each matched bucket does
    # candidate-pair emission + positional filtering — compute-dense,
    # so AQE's byte-based coalescing undersizes it (see
    # pin_compute_shuffle); the self-join reuses this one exchange for
    # both sides
    pref = pin_compute_shuffle(pref, "__p")
    a, b = pref.alias("a"), pref.alias("b")
    # PPJoin positional filter: overlap through a shared element at
    # 0-based positions (i, j) is at most 1 + min(|A|-i-1, |B|-j-1),
    # which must reach the overlap ceil(t/(1+t) * (|A|+|B|)) required
    # for J >= t; the FIRST shared element sees the loosest bound, so
    # per-element filtering never drops a qualifying pair. (The 1e-9
    # slack keeps float ceil from exceeding the exact ceiling.)
    min_overlap = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("a.__n") + F.col("b.__n")) - F.lit(1e-9)
    )
    # Tighter candidate pruning was ATTEMPTED and MEASURED OFF (round
    # 7): aggregating all shared prefix elements per pair gives the
    # tight PPJoin bound overlap <= c + min(|A|-i_last-1, |B|-j_last-1)
    # (c = shared-prefix count, i/j_last = positions of the last shared
    # element — sound because sorted order forces every unmatched
    # shared element past the last match in both arrays). On the sf1
    # low-diversity fixture it pruned ZERO of 14.6M candidates at
    # t=0.5 and zero of 1.9M at t=0.8: the surviving candidates are
    # near-miss pairs genuinely sharing most of their shingles, so no
    # positional bound separates them — only the exact verify can —
    # while the aggregate's wider exchange rows made dedup_corpus
    # ~1.35x slower end to end. dropDuplicates keeps the slimmest
    # possible exchange (16 bytes/row); the verify below is the
    # irreducible cost and is kept cheap by the broadcast gate plus
    # size-arithmetic Jaccard (no array_union materialization).
    cand = (
        a.join(
            b,
            (F.col("a.__p") == F.col("b.__p"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.col("a.__n") >= F.ceil(F.lit(t) * F.col("b.__n")))
            & (F.col("b.__n") >= F.ceil(F.lit(t) * F.col("a.__n")))
            & (
                1
                + F.least(
                    F.col("a.__n") - F.col("a.__pos") - 1,
                    F.col("b.__n") - F.col("b.__pos") - 1,
                )
                >= min_overlap
            ),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    )
    # candidate dedup + verify run at pinned parallelism too: the
    # per-candidate array_intersect is the operator's hottest loop
    # (profiled 2.0 s on ONE task at sf0.1 under AQE coalescing); the
    # dropDuplicates aggregate reuses this exchange, so the pin costs
    # no extra shuffle
    cand = pin_compute_shuffle(cand, "id_a", "id_b").dropDuplicates()
    # verify arrays come from the materialized ranked table, not a
    # fresh md5 pass — set ops don't care about element order, so the
    # (df, hash)-sorted projection works as-is
    sets = ranked.select(
        "__id", F.transform("__rsh", lambda x: x["__h"]).alias("__sh")
    )
    # BROADCAST the verify build side when it measurably fits: the
    # sketch table is one row per distinct doc (8 bytes per shingle
    # hash), while the candidate multiset can be ORDERS OF MAGNITUDE
    # larger on low-diversity corpora where prefixes barely
    # discriminate (a 31-word-vocabulary fixture produced 14.6M
    # candidates from 50k docs; shuffling each candidate through two
    # sort-merge joins with both array payloads was 70% of the
    # operator's wall). Auto-broadcast won't fire — the sketch sits
    # above the default 10 MB threshold — so read the size FREE from
    # the block-manager metadata of the eager checkpoint above and
    # hint explicitly under a 128 MB budget; past the budget (the
    # 100 TB regime, where the sketch table is itself huge) the plan
    # stays the shuffle join, which is then the right side to shuffle.
    stored = _persisted_bytes(ranked)
    if stored is None:  # metadata accessors unavailable: round-6 probe
        vstats = ranked.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("__n").alias("elems")
        ).collect()[0]
        sets_bytes = int(
            (vstats["elems"] or 0) * 8 * 1.4 + (vstats["rows"] or 0) * 48
        )
    else:
        sets_bytes = stored * _HASHED_RELATION_FACTOR
    if sets_bytes <= _VERIFY_BROADCAST_BUDGET:
        sets = F.broadcast(sets)
    sh_a = sets.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    sh_b = sets.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    # size-arithmetic Jaccard (|A∪B| = |A|+|B|-|A∩B|, elements distinct
    # per doc): skips array_union's per-candidate O(n) allocation on
    # the hottest path — 14.6M candidates each carry two ~200-element
    # arrays here at sf1; size() is O(1) on array columns
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jac",
            inter.cast("double")
            / (F.size("__sh_a") + F.size("__sh_b") - inter),
        )
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every node
    labeled with the smallest id reachable from it — the cluster
    representative a dedup pipeline keeps.

    The edge list is already orders of magnitude smaller than the corpus
    (it holds only verified near-dup pairs), so two regimes:

    * **small graph** (≤ ``driver_edge_limit`` edges, checked with one
      count): collect the edges and run union-find on the driver —
      O(E α(E)), one job, no iteration. This is the common case even at
      100 TB corpus scale: a dedup pass that verifies billions of pairs
      has a different problem (its threshold admits near-everything).
    * **large graph**: iterative min-label propagation as a driver loop
      of joins — each round every node takes the min of its own and its
      neighbors' labels; converges in O(graph diameter) rounds
      (near-dup clusters are dense and shallow, so a handful). Each
      round is one shuffle join + aggregate over the EDGE list only —
      never materializes anything super-linear — and ``localCheckpoint``
      caps plan depth at O(1) per round.

    Both regimes compute the same labeling. Equivalent ANSI SQL: a
    recursive CTE computing min reachable id, which is how the oracle
    states it.

    Returns (node, cluster_id).
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    if edges.count() <= driver_edge_limit:
        # Arrow both ways (round 14): toPandas() collects the edge
        # columns as Arrow batches instead of pickled Rows, and the
        # result goes back as an Arrow-built DataFrame. The previous
        # list-of-tuples createDataFrame shipped the labels through a
        # pickled Python RDD whose EVERY downstream execution paid a
        # 32-task Python-worker unpickle stage (profiled ~12 CPU-s at
        # sf0.1) and, having no size statistics, planned as a
        # sort-merge join (2 exchanges + sorts) in every consumer.
        # The label table is driver-resident and bounded by
        # ``driver_edge_limit`` nodes, so ``F.broadcast`` marks it for
        # the build side its consumers (dedup_keep_best's left join,
        # dedup_corpus' anti join) should use at any scale.
        import pandas as pd

        epdf = edges.toPandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(epdf["src"].tolist(), epdf["dst"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id so the representative is the smallest
                # reachable id, matching the propagation fixpoint
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out = pd.DataFrame(
            {"node": list(parent), "cluster_id": [find(n) for n in parent]},
            dtype="int64",
        )
        spark = pairs.sparkSession
        return F.broadcast(
            spark.createDataFrame(out, schema="node long, cluster_id long")
        )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def shingle_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of the document's DISTINCT
    word ``k``-shingles that occur in NO other document — high for
    genuinely unique content, low for boilerplate collages and
    near-copies (the inverse signal of the dedup family, useful for
    both memorization-risk triage and kept-set diversity audits).
    Returns ``(id_col, n_shingles, n_unique, novelty)`` for every
    document with non-NULL text (``shingles`` guarantees >= 1 shingle
    for those; NULL is filtered explicitly — the ``shingles`` fallback
    branch would otherwise mint an empty-string shingle for NULL via
    ``concat_ws``, a convention mismatch with the unigram family).

    A shingle's document frequency counts DOCUMENTS (the occurrence
    table is distinct per doc by construction), so ``df == 1`` means
    "only this document ever says this". ``novelty = n_unique /
    n_shingles`` divides two integers — identical IEEE division in any
    engine, so the operator is exactly oracle-able with no float
    caveat at all.

    Scale shape (the unigram_nll pattern): one shingle explode
    (linear), a map-side-combined document-frequency aggregate
    (Zipf-safe), an equi-join of occurrences back against that count
    table (AQE-broadcast for real shingle vocabularies, shuffle join
    past the threshold), one per-doc aggregate."""
    occ = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("__s")
    )
    cnt = occ.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    uniq = F.sum((F.col("__df") == 1).cast("int"))
    return (
        occ.join(cnt, "__s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            uniq.cast("long").alias("n_unique"),
            (uniq / F.count(F.lit(1))).alias("novelty"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    higher_is_better: bool = True,
    id_a: str = "id_a",
    id_b: str = "id_b",
    assume_unique: bool = False,
) -> DataFrame:
    """Near-dup dedup that keeps the BEST copy per duplicate cluster
    instead of the smallest id — what a production pipeline actually
    wants (the longest / highest-quality / most-recent variant
    survives, not whichever happened to get the low id). Builds the
    connected components of the verified pair graph
    (:func:`near_dup_clusters`), treats every document absent from the
    graph as its own singleton cluster, and flags the per-cluster
    winner by ``(quality_col best, id_col asc)``.

    Returns one row per input document: ``(id_col, cluster_id,
    keep)``. With an integer quality column (length, token count,
    recency epoch) every output value is integer/boolean, so the
    operator is exactly oracle-able against a recursive-CTE
    connected-components SQL with zero float risk. NULL qualities sort
    LAST explicitly (engines disagree on default NULL order).

    Scale shape: the pair graph is orders of magnitude smaller than
    the corpus (verified near-dups only); the corpus-side work is one
    left equi-join against the node→cluster table and one keyed window
    over ``cluster_id`` carrying a three-column projection — clusters
    are small by construction (they are near-duplicate groups), so the
    window never sees a giant partition, and singletons ride the same
    hash shuffle.

    Duplicated ids in ``df`` would fan the cluster join out and emit
    multiple rows per id with an arbitrary single keeper among the
    copies, so ids are checked LOUDLY by default (the module convention
    — ``snapshot_diff``/``merge_upsert`` raise on ambiguous keys; one
    keyed aggregate). Pass ``assume_unique=True`` to skip the check
    when ``df`` is known id-unique (primary-keyed corpora — the 100 TB
    fast path)."""
    if quality_col not in df.columns or id_col not in df.columns:
        raise ValueError(f"{id_col!r}/{quality_col!r} must be columns of df")
    if not assume_unique:
        dup = (
            df.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"duplicate ids in df (e.g. {dup[0][0]!r}); dedup_keep_best "
                "requires one row per id — pre-deduplicate, or pass "
                "assume_unique=True only if the duplication is impossible"
            )
    # the cluster labels are longs (near_dup_clusters casts pair ids),
    # and the singleton fallback casts id_col to long — a non-integral
    # id would cast to NULL, silently collapsing EVERY singleton into
    # one NULL cluster where only one of them keeps. Require integers.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"id_col {id_col!r} must be an integral type (got {id_type}); "
            "near-dup cluster labels are long ids"
        )
    clusters = near_dup_clusters(pairs, id_a, id_b)
    labeled = (
        df.select(id_col, quality_col)
        .join(clusters.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("cluster_id"), F.col(id_col).cast("long")),
        )
    )
    best = (
        F.col(quality_col).desc_nulls_last()
        if higher_is_better
        else F.col(quality_col).asc_nulls_last()
    )
    w = Window.partitionBy("cluster_id").orderBy(best, F.col(id_col).asc())
    return labeled.withColumn("keep", F.row_number().over(w) == 1).select(
        id_col, "cluster_id", "keep"
    )


def dedup_corpus_exact_phase(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Phase 1 of :func:`dedup_corpus`, shared so the phase-attribution
    tooling (``scripts/sf1_dedup_phases.py``) measures the SAME code
    path the operator runs: group by the normalized-text fingerprint
    (md5 of lowercased, whitespace-collapsed text), keep the min-id
    representative per group, and return the surviving rows of ``df``.

    The result is localCheckpointed: inside ``dedup_corpus`` it feeds
    three independent subtrees (the near-dup sketch pipeline, the
    cluster edge computation, and the final anti-join) — materialize
    the scan+agg+semi-join once instead of letting each consumer
    re-execute it.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    with_fp = df.withColumn("__fp", F.md5(norm.cast("binary")))
    reps = with_fp.groupBy("__fp").agg(F.min(F.col(id_col)).alias(id_col)).drop("__fp")
    return df.join(reps, id_col, "semi").localCheckpoint(eager=False)


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end corpus deduplication — the composition a training-data
    pipeline actually runs, as one operator:

    1. **exact phase**: group by the normalized-text fingerprint
       (md5 of lowercased, whitespace-collapsed text); keep the min-id
       representative per group. One hash-aggregate; at 100 TB this
       removes the bulk of duplication (mirrors, retries) before any
       similarity work happens.
    2. **near-dup phase**: exact n-gram-Jaccard pairs (prefix-filter
       join, ``ngram_jaccard_pairs``) over the exact-phase survivors
       only, then connected components (``near_dup_clusters``); each
       cluster keeps its min-id member.

    Returns the surviving rows of ``df`` (all original columns).
    Fully deterministic, hence oracle-able end to end: exact SQL =
    fingerprint GROUP BY + all-pairs Jaccard + recursive-CTE min-label.
    """
    survivors = dedup_corpus_exact_phase(df, id_col, text_col)

    pairs = ngram_jaccard_pairs(survivors, id_col, text_col, shingle_k, threshold)
    clusters = near_dup_clusters(pairs)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return survivors.join(losers, id_col, "anti")


def dedup_incremental(
    new_df: DataFrame,
    known_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    known_fp_col: str = "fp",
    fp_col: str = "fp",
) -> DataFrame:
    """Incremental ingest dedup: drop rows of ``new_df`` whose document
    fingerprint (md5 of normalized text — ``text.fingerprint``) already
    exists in the corpus ledger ``known_df[known_fp_col]``, then
    exact-dedup within the new batch itself (min ``id_col`` survives).
    The daily-batch pattern: yesterday's ledger is the fingerprint
    column of the accepted corpus, today's survivors append to it.

    Shape at scale: the ledger side carries ONLY fingerprints (32-byte
    strings, not text), and the membership test is a hash anti-join on
    ``fp`` — both sides shuffle by fingerprint, no broadcast assumption
    (a 100 TB corpus ledger is large), no text movement. The within-
    batch pass is one window over the (much smaller) new batch. For
    NEAR-duplicate incremental checks compose ``filtering.decontaminate``
    (shingle-overlap vs the known corpus) upstream of this exact pass.

    Returns the surviving ``new_df`` rows plus their ``fp_col``.
    """
    from pyspark_skyline_spark.operators.text import fingerprint

    stamped = fingerprint(new_df, text_col, out=fp_col)
    fresh = stamped.join(
        known_df.select(F.col(known_fp_col).alias(fp_col)).distinct(),
        fp_col,
        "left_anti",
    )
    return dedup_exact(fresh, [fp_col], order_col=id_col)


def dedup_incremental_neardup(
    new_df: DataFrame,
    ledger_sigs: DataFrame,
    id_col: str,
    text_col: str = "text",
    ledger_id_col: str = "ledger_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """NEAR-duplicate incremental ingest: drop rows of ``new_df`` whose
    MinHash signature matches any ledger document at estimated Jaccard
    >= ``threshold`` — the companion of :func:`dedup_incremental`
    (exact fingerprints) for the continuously-grown corpus case.

    ``ledger_sigs`` is ``(ledger_id_col, m0..m{H-1})`` as produced by
    :func:`minhash_signatures` on previously accepted documents —
    signatures only, never ledger TEXT, so the comparison is
    text-free on the corpus side (32·H bits per ledger doc). Candidate
    generation is the same LSH band equi-join as
    :func:`minhash_lsh_pairs` (``_band_keys`` is shared, so a stored
    ledger bands identically); the verify step is the SIGNATURE
    Jaccard estimate — mean fraction of equal components, the unbiased
    MinHash estimator — because the ledger has no shingle sets to
    verify against exactly. Estimator sd is ~sqrt(J(1-J)/H)
    (~0.06 at H=64); set ``threshold`` with that slack in mind.

    Returns the surviving ``new_df`` rows with their signature columns
    appended, ready to append to the ledger. Rows with NULL or
    blank-only text have no shingle content and are excluded from
    signature matching — they SURVIVE with NULL signature columns (run
    :func:`dedup_incremental` upstream for exact handling of those).
    Short-but-nonempty texts collapse to a single whole-string shingle
    (``shingles`` semantics), so identical short strings do match each
    other — which is the correct near-dup verdict for them. Intra-batch
    near-dups are NOT collapsed here; compose
    :func:`minhash_lsh_pairs` + :func:`near_dup_clusters` over the
    batch for that.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sig_names = [f"m{j}" for j in range(num_hashes)]
    missing = [c for c in (ledger_id_col, *sig_names) if c not in ledger_sigs.columns]
    if missing:
        raise ValueError(
            f"ledger_sigs missing columns {missing[:4]}{'...' if len(missing) > 4 else ''} "
            f"(expected {ledger_id_col} + m0..m{num_hashes - 1} from minhash_signatures)"
        )
    clash = [c for c in sig_names if c in new_df.columns]
    if clash:
        raise ValueError(
            f"new_df already has signature columns {clash[:4]}; rename them "
            "before ingest (survivors get m0.. appended)"
        )

    # blank/NULL texts carry no shingle content — signature-matching
    # them (their degenerate shingle is "") would silently drop every
    # empty doc as a near-dup of any empty ledger doc; they survive
    # with NULL signatures instead. localCheckpoint: the signature
    # subtree feeds three consumers (banding, the estimator, the final
    # survivor join) and is the compute-dense part.
    # rlike(\S), not trim: Spark trim strips only ASCII spaces, so a
    # tab/newline-only doc would slip through and still be dropped as a
    # "near-dup" of any other whitespace-only ledger doc
    substantive = new_df.where(
        F.col(text_col).isNotNull() & F.col(text_col).rlike(r"\S")
    )
    sigs_new = minhash_signatures(
        substantive, id_col, text_col, num_hashes=num_hashes,
        shingle_k=shingle_k, hash_mode=hash_mode,
    ).localCheckpoint(eager=False)
    bk = _band_keys(num_hashes, bands)
    new_bands = sigs_new.select(
        F.col(id_col).alias("__nid"), F.posexplode(bk).alias("__bi", "__bk")
    )
    led_bands = ledger_sigs.select(
        F.col(ledger_id_col).alias("__lid"), F.posexplode(bk).alias("__bi", "__bk")
    )
    # pinned-parallelism candidate dedup + estimator (see
    # pin_compute_shuffle): the 64-component signature comparison per
    # candidate is compute-dense relative to its 16-byte shuffle row
    cand = pin_compute_shuffle(
        new_bands.join(led_bands, ["__bi", "__bk"]).select("__nid", "__lid"),
        "__nid", "__lid",
    ).dropDuplicates()
    # selectExpr / single-F.expr forms: the Column-API renames (2 calls
    # x 64 columns x 2 sides) and the 64-term CASE estimator (~190
    # calls) were ~1 s of pure driver py4j per build (round 13; same
    # fix class as _band_keys)
    a = sigs_new.selectExpr(
        f"{_bt(id_col)} AS __nid", *[f"{c} AS __a_{c}" for c in sig_names]
    )
    b = ledger_sigs.selectExpr(
        f"{_bt(ledger_id_col)} AS __lid", *[f"{c} AS __b_{c}" for c in sig_names]
    )
    est = F.expr(
        "("
        + " + ".join(
            f"(CASE WHEN __a_{c} = __b_{c} THEN 1 ELSE 0 END)"
            for c in sig_names
        )
        + f") / {float(num_hashes)!r}"
    )
    dup_ids = (
        cand.join(a, "__nid")
        .join(b, "__lid")
        .withColumn("__est", est)
        .filter(F.col("__est") >= threshold)
        .select(F.col("__nid").alias(id_col))
        .dropDuplicates()
    )
    survivors = new_df.join(dup_ids, id_col, "left_anti")
    return survivors.join(sigs_new, id_col, "left")




def _para_units(
    text_col: str, sep: str | None, chunk_words: int | None, joiner: str | None
):
    """Unit-splitting expression shared by the batch and incremental
    paragraph dedup: either ``sep``-separated paragraphs or fixed
    ``chunk_words``-word chunks (exactly one must be given). Returns
    (array<string> Column, reassembly joiner)."""
    if (sep is None) == (chunk_words is None):
        raise ValueError("give exactly one of sep / chunk_words")
    if sep is not None:
        import re as _re

        return F.split(F.col(text_col), _re.escape(sep)), (
            sep if joiner is None else joiner
        )
    c = int(chunk_words)
    if c < 1:
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(c))).cast("int")
    units = F.when(
        F.size(words) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(words, i * c + 1, c), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return units, (" " if joiner is None else joiner)




def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str | None = None,
    chunk_words: int | None = None,
    joiner: str | None = None,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Sub-document exact dedup with reassembly (the RefinedWeb /
    FineWeb "line dedup" step): split every document into units, keep
    only the globally FIRST occurrence of each distinct unit (ordered
    by ``(id, position)``), and reassemble each document from its
    surviving units in original order.

    Units are either ``sep``-separated paragraphs (real corpora:
    ``sep="\\n\\n"``) or fixed ``chunk_words``-word chunks (corpora
    without structural separators) — exactly one must be given.

    Scale path: units are exploded with their position, hashed with
    md5 (engine-portable → DuckDB-oracle-gradable), and the winner per
    hash is a ``min(struct(id, pos, text))`` aggregate — map-side
    partial aggregation, so a boilerplate unit repeated a billion
    times reduces to one row per map task before the shuffle (a window
    ``row_number`` over the hash would put the hot hash in one task),
    and because the struct carries the unit text, the kept units flow
    straight into reassembly with NO join back to the occurrence table
    (one fewer full-data shuffle than the join-back formulation).
    Reassembly is a per-document ``collect_list`` bounded by document
    size. Documents whose every unit was seen earlier disappear (both
    here and in the oracle).
    """
    return paragraph_dedup_incremental(
        df, None, id_col, text_col, sep, chunk_words, joiner, out_col=out_col
    )[0]


def paragraph_dedup_incremental(
    new_df: DataFrame,
    ledger_df: DataFrame | None,
    id_col: str,
    text_col: str,
    sep: str | None = None,
    chunk_words: int | None = None,
    joiner: str | None = None,
    ledger_hash_col: str = "ph",
    out_col: str = "text_dedup",
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental sub-document dedup: today's batch against the
    accumulated UNIT-HASH ledger, then within-batch keep-first — the
    streaming/daily-ingest form of ``paragraph_dedup`` (same unit
    splitting, same keep-first semantics, same reassembly).

    ``materialize=True`` localCheckpoints the shared winner table (one
    row per first-seen hash) that BOTH outputs derive from, so a
    caller that executes ``docs`` and ``new_hashes`` as separate jobs
    (the streaming sink writes them to different directories) computes
    the explode→hash→winner→ledger-anti-join pipeline once instead of
    twice. Leave False when only one output is consumed.

    Returns ``(docs, new_hashes)``:

    - ``docs`` — surviving documents ``(id_col, out_col, n_kept)``;
      documents whose every unit already exists vanish, exactly like
      the batch op;
    - ``new_hashes`` — the distinct unit md5s first seen in THIS batch
      (one ``ledger_hash_col`` column). Append them to the ledger so
      the next batch dedups against corpus history. Out-before-ledger
      ordering (write outputs, then append the ledger) makes replays
      safe: a replayed batch just re-drops everything.

    Shape at scale: the ledger side carries ONLY 16-byte unit hashes —
    never text — and membership is a hash anti-join on the unit hash
    (both sides shuffle by hash, no broadcast assumption; same design
    as ``dedup_incremental``'s document ledger). ``ledger_df=None``
    means an empty ledger (first batch): the result equals the batch
    ``paragraph_dedup``.
    """
    units, joiner = _para_units(text_col, sep, chunk_words, joiner)
    ex = new_df.select(F.col(id_col), F.posexplode(units).alias("pos", "__para"))
    ex = ex.withColumn("__ph", F.md5(F.col("__para")))
    # Skew discipline: occurrence rows are NEVER joined on the unit
    # hash (a boilerplate unit repeated a billion times would funnel
    # every copy into one join partition). The winner aggregate reduces
    # to ONE ROW PER DISTINCT HASH — map-side partials absorb the hot
    # hash — and the struct CARRIES THE UNIT TEXT, so the winning
    # occurrence needs no join back to the exploded rows at all (the
    # previous shape semi-joined occurrences on (id, pos), re-shuffling
    # the full text-carrying table a second time). (id, pos) is unique,
    # so the text field never participates in the min comparison.
    # Network cost: at most one text copy per (map task, distinct hash)
    # into the __ph shuffle — duplicate copies collapse before moving —
    # then only the KEPT units into the per-document reassembly.
    winners = ex.groupBy("__ph").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"), F.col("__para"))).alias("__w")
    )
    if ledger_df is not None:
        # ledger membership is checked on the one-row-per-hash table —
        # both sides shuffle by the 16-byte hash, no broadcast assumption
        known = ledger_df.select(F.col(ledger_hash_col).alias("__ph")).distinct()
        winners = winners.join(known, "__ph", "left_anti")
    if materialize:
        winners = winners.localCheckpoint(eager=False)
    kept = winners.select(
        F.col("__w").getField(id_col).alias(id_col),
        F.col("__w").getField("pos").alias("pos"),
        F.col("__w").getField("__para").alias("__para"),
        F.col("__ph"),
    )
    docs = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__para"))),
                lambda s: s.getField("__para"),
            ),
            joiner,
        ).alias(out_col),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    new_hashes = winners.select(F.col("__ph").alias(ledger_hash_col))
    return docs, new_hashes


def substring_dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_mode: str = "xxhash64",
    min_count: int = 2,
) -> DataFrame:
    """SUBSTRING-level duplication spans: for each document, the merged
    token ranges covered by some ``k``-token window that occurs at
    least ``min_count`` times ANYWHERE in the corpus (within- or
    cross-document). This is the third granularity of the dedup family
    — document-level (``dedup_corpus``), paragraph-level
    (``paragraph_dedup``), and now the sliding-window substring rule
    used to strip boilerplate/verbatim overlap from LLM training
    corpora (the "duplicated n-token window" criterion). Downstream
    either drops the spans or drops documents whose duplicated
    fraction is too high. Returns
    ``(id_col, span_start, span_end, span_tokens)`` in 1-based token
    coordinates; documents shorter than ``k`` tokens yield no windows
    (whole-document duplication at that size is document-level dedup's
    job).

    Relational formulation, zero UDFs: slice-built ordered windows
    (``ordered_shingles`` — zip_with, evaluates the token split once
    per row), posexplode to an occurrence table (id, pos, window-hash),
    a hash-aggregate to the duplicated-window keys (map-side partial
    combine collapses a million-copy boilerplate window to one row per
    partition BEFORE the shuffle — the skew-safe half of the plan),
    a semi-join of occurrences against those keys (AQE broadcasts the
    dup-key table when small; degrades to a shuffle join on corpora
    where the duplicated vocabulary itself is huge), then per-document
    gaps-and-islands (two window functions over output-sized data) to
    merge overlapping/adjacent windows into maximal spans.

    Scale shape: the occurrence table is ~n_tokens rows — linear — and
    shuffles once for the semi-join; the dup-key aggregate rides the
    same exchange. Windows are compared by hash, not string
    (`hash64_expr`): 64-bit xxhash64 in production, 60-bit md5-derived
    keys in md5 mode — bit-reproducible in any SQL engine so the
    operator is exactly oracle-able (same pattern as the MinHash
    ledger rows). A hash collision can only over-mark a span (never
    drop one); expected colliding window pairs ~n²/2⁶⁵ (xxhash64)
    resp. ~n²/2⁶¹ (md5 mode — the graded rows' mode).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = spread_for_compute(df)
    toks = tokens(F.col(text_col))
    occ = (
        df.filter(F.size(toks) >= k)
        .select(
            F.col(id_col),
            F.posexplode(ordered_shingles(F.col(text_col), k)).alias("__pos", "__w"),
        )
        .select(
            id_col,
            (F.col("__pos") + 1).alias("__s"),  # 1-based token start
            hash64_expr(F.col("__w"), None, hash_mode).alias("__h"),
        )
    )
    dup_keys = (
        occ.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__h")
    )
    spans = occ.join(dup_keys, "__h", "leftsemi").select(
        id_col, "__s", (F.col("__s") + (k - 1)).alias("__e")
    )
    w_ord = Window.partitionBy(id_col).orderBy("__s")
    prev_max_e = F.max("__e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = spans.withColumn(
        "__brk",
        F.when(F.col("__s") > F.coalesce(prev_max_e, F.lit(-10)) + 1, 1).otherwise(0),
    )
    isl = marked.withColumn(
        "__g",
        F.sum("__brk").over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        isl.groupBy(id_col, "__g")
        .agg(
            F.min("__s").cast("long").alias("span_start"),
            F.max("__e").cast("long").alias("span_end"),
            (F.max("__e") - F.min("__s") + 1).cast("long").alias("span_tokens"),
        )
        .drop("__g")
    )


def substring_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_mode: str = "xxhash64",
    min_count: int = 2,
    out_col: str = "text_scrubbed",
) -> DataFrame:
    """Apply ``substring_dedup_spans``: drop every token covered by a
    corpus-duplicated ``k``-token window and reassemble the document
    from the surviving tokens. Returns
    ``(id_col, out_col, n_tokens, n_dropped)`` — one row per input
    document (documents with no duplicated spans pass through intact).

    Semantics: ALL occurrences of duplicated content are removed (the
    boilerplate-scrub rule — repeated headers/footers/licenses vanish
    everywhere). Keep-one-copy dedup at sub-document granularity is
    ``paragraph_dedup``'s job; at whole-document granularity,
    ``dedup_corpus``. Output text is normalized-token text (the
    lowercased whitespace tokenization every dedup operator here
    shares), joined by single spaces; NULL input text is treated as
    empty (mirrored in the oracle).

    Plan: the spans pipeline (see ``substring_dedup_spans``) collapses
    to a per-doc span ARRAY (spans per doc are few — output-sized), a
    left join back to the corpus on the id (plain equi-join on the
    primary key; AQE broadcasts the span table when small), then one
    ``filter`` higher-order function with the element INDEX lambda
    drops covered tokens JVM-side — no explode of the corpus tokens,
    no UDF; per-token cost is O(spans-per-doc)."""
    spans = substring_dedup_spans(
        df, id_col, text_col, k=k, hash_mode=hash_mode, min_count=min_count
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    covered = lambda t, i: F.exists(  # noqa: E731 — HOF lambda
        F.coalesce(F.col("__spans"), F.array()),
        lambda s: ((i + 1) >= s.getField("span_start"))
        & ((i + 1) <= s.getField("span_end")),
    )
    kept = F.filter(toks, lambda t, i: ~covered(t, i))
    return (
        df.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.array_join(kept, " ").alias(out_col),
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_dropped"),
        )
    )
