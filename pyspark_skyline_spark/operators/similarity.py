"""Embedding similarity search (north-star extension; no counterpart in
the reference).

Two paths:

* ``cosine_topk`` — exact brute-force top-k against a probe vector.
  The dot product is a sequential left-fold over double-cast arrays
  (``aggregate(zip_with(...))``) so an external engine folding in the
  same order produces bit-identical doubles — which is what makes the
  DuckDB oracle hash-match.
* ``cosine_topk_lsh`` — random-hyperplane LSH: signature = sign bits of
  dot(v, plane) packed per table; candidates share a bucket in any of
  ``n_tables`` tables (equi-join, no all-pairs product); exact rerank on
  candidates. Approximate — verified by a recall test, not an oracle.
* ``cosine_topk_ivf`` — IVF (inverted-file) partitioning: spherical
  k-means centroids trained on a bounded deterministic sample, every
  vector assigned to its nearest centroid cell, probe scans only the
  ``nprobe`` nearest cells. Approximate — recall test, not an oracle.
"""

from __future__ import annotations

import math
import numbers

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from pyspark_skyline_spark.operators.dedup import spread_for_compute
from pyspark_skyline_spark.operators.topk import top_k_per_group

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "cosine_topk_batch",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "ivf_assign",
    "train_ivf_centroids",
    "cosine_near_dup_pairs",
    "embedding_decontaminate",
    "semantic_dedup",
]


def _dbl(v) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a, b) -> Column:
    """Sequential left-fold dot product in float64 (deterministic
    accumulation order)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v) -> Column:
    return F.sqrt(dot_product(v, v))


def cosine(a, b) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id: int,
    k: int = 10,
    impl: str = "fold",
) -> DataFrame:
    """Exact top-k cosine neighbors of the row with ``id_col ==
    probe_id`` (excluded from results). Returns (rank, id)
    deterministically ordered by (cosine desc, id asc).

    impl="fold": native sequential-fold expressions — bit-reproducible
    against an external SQL engine (the oracle path). impl="arrow":
    vectorized NumPy scoring in a pandas_udf over Arrow batches — the
    fast path for large fleets (matrix-vector product per batch instead
    of interpreted per-element folds); same ranks, last-ulp score
    differences possible.
    """
    if impl == "arrow":
        probe_row = df.filter(F.col(id_col) == probe_id).select(vec_col).first()
        if probe_row is None:
            raise ValueError(f"probe id {probe_id!r} not found")
        probe_vec = np.asarray(probe_row[0], dtype=np.float64)
        pnorm = float(np.linalg.norm(probe_vec))

        @F.pandas_udf("double")
        def score(s: pd.Series) -> pd.Series:
            m = np.vstack(s.to_numpy()).astype(np.float64)
            return pd.Series((m @ probe_vec) / (np.linalg.norm(m, axis=1) * pnorm))

        scored = df.filter(F.col(id_col) != probe_id).withColumn(
            "__cos", score(F.col(vec_col))
        )
    elif impl == "fold":
        probe = df.filter(F.col(id_col) == probe_id).select(
            F.col(vec_col).alias("__probe_vec")
        )
        scored = (
            df.filter(F.col(id_col) != probe_id)
            .crossJoin(F.broadcast(probe))
            .withColumn("__cos", cosine(F.col(vec_col), F.col("__probe_vec")))
        )
    else:
        raise ValueError(f"impl must be fold|arrow, got {impl!r}")
    ranked = top_k_per_group(
        scored.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("__cos").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )
    return ranked.select("rank", id_col).withColumn("rank", F.col("rank").cast("long"))


def cosine_topk_batch(
    df: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id_col: str,
    probe_vec_col: str,
    k: int = 10,
    impl: str = "arrow",
) -> DataFrame:
    """Exact top-k cosine neighbors for EVERY probe in one pass — the
    production retrieval shape (a query batch against the corpus),
    where per-probe calls would rescan the table per query.

    The probe set broadcasts (queries are small; the corpus is not),
    every (corpus row × probe) pair is scored, and
    ``top_k_per_group(probe_id)`` keeps k per probe via per-partition
    heaps — no global sort, one corpus scan total. A corpus row whose
    id equals the probe id is excluded (self-match), matching
    ``cosine_topk``.

    impl="arrow": the probe MATRIX is captured in one pandas_udf and
    each Arrow batch scores against all probes with a single GEMM.
    impl="fold": native fold expressions after the broadcast cross
    join — bit-reproducible against SQL oracles (slower; the oracle
    path). Same ranks on well-formed inputs; degenerate rows differ by
    design: NULL corpus vectors are dropped (arrow) vs scored NULL
    (fold) — neither ranks — and an all-zero vector scores 0 under
    arrow's clamped norm but NaN under fold's exact division.
    Returns (probe_id_col, rank, id_col).
    """
    for c, d_ in ((id_col, df), (vec_col, df), (probe_id_col, probes), (probe_vec_col, probes)):
        if c not in d_.columns:
            raise ValueError(f"column {c!r} not found")
    if impl == "fold":
        p = probes.select(
            F.col(probe_id_col).alias("__pid"), F.col(probe_vec_col).alias("__pvec")
        )
        scored = (
            df.crossJoin(F.broadcast(p))
            .filter(F.col(id_col) != F.col("__pid"))
            .withColumn("__cos", cosine(F.col(vec_col), F.col("__pvec")))
        )
    elif impl == "arrow":
        prows = probes.select(probe_id_col, probe_vec_col).collect()
        if not prows:
            raise ValueError("probes is empty")
        if any(r[1] is None for r in prows):
            raise ValueError("probe vectors must be non-null")
        pids = [r[0] for r in prows]
        dims = {len(r[1]) for r in prows}
        if len(dims) != 1:
            raise ValueError(f"probe vectors have mixed dimensions {sorted(dims)}")
        P = np.asarray([r[1] for r in prows], dtype=np.float64)
        Punit = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)

        @F.pandas_udf("array<double>")
        def score_all(s: pd.Series) -> pd.Series:
            m = np.vstack(s.to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cos = m @ Punit.T  # one GEMM: batch x probes
            return pd.Series(list(cos))

        pid_arr = F.array(*[F.lit(p) for p in pids])
        # NULL corpus vectors never rank (the fold impl scores them
        # NULL, which also never enters the top-k) — dropped here so
        # the vstack GEMM sees a rectangular batch
        scored = (
            df.where(F.col(vec_col).isNotNull())
            .withColumn("__all", score_all(F.col(vec_col)))
            .select(
                id_col,
                F.explode(F.arrays_zip(pid_arr.alias("__pid"), F.col("__all").alias("__cos"))).alias("__z"),
            )
            .select(id_col, F.col("__z.__pid").alias("__pid"), F.col("__z.__cos").alias("__cos"))
            .filter(F.col(id_col) != F.col("__pid"))
        )
    else:
        raise ValueError(f"impl must be fold|arrow, got {impl!r}")
    ranked = top_k_per_group(
        scored,
        ["__pid"],
        [F.col("__cos").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )
    return ranked.select(
        F.col("__pid").alias(probe_id_col),
        F.col("rank").cast("long").alias("rank"),
        id_col,
    )


def embedding_decontaminate(
    df: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    probe_vec_col: str,
    impl: str = "arrow",
) -> DataFrame:
    """Max cosine similarity of every corpus embedding against a small
    PROBE set (eval/benchmark embeddings) — paraphrase-level
    decontamination, the embedding-space complement of the n-gram
    ``filtering.decontaminate`` (which only catches verbatim overlap).
    Returns ``(id_col, max_sim)``; the caller thresholds/sorts — max
    over a fixed set of doubles is fold-order-free, so the output has
    no rank-cut or row-set float boundary and the operator is
    oracle-able under value rounding alone. Corpus rows with a NULL
    vector — or a vector whose dimension differs from the probe
    dimension — are dropped in BOTH impls (they cannot be scored;
    before the explicit size filter the fold impl silently emitted
    max_sim=NULL for mismatched rows while arrow raised inside
    np.vstack, an undocumented impl divergence — review find).

    Scale shape: eval sets are small (10^2..10^5 rows) and the corpus
    is not, so the probe side always broadcasts and the corpus is
    scanned once with NO shuffle at all in the arrow impl (per-batch
    GEMM against the captured probe matrix, then a row-local max) —
    the same pattern the n-gram decontaminate documents for its
    broadcast probe grams. The fold impl (broadcast cross join +
    per-id max, native sequential-fold cosine with the same clamped
    norm the arrow GEMM uses — an all-zero probe scores ~0, never
    NaN-poisons the max) is the bit-reproducible oracle path, like
    ``cosine_topk_batch``'s. Both impls validate the probe set
    up-front (non-empty after NULL drop, one dimension) — a silently
    empty probe set in a decontamination check would read as "no
    contamination" for the whole corpus. One documented divergence on
    degenerate input: duplicated corpus ids collapse to one max row
    under fold (per-id aggregate — also what the SQL oracle's GROUP BY
    computes) but score row-by-row under arrow (no shuffle, no
    grouping); ids are unique in any well-formed embedding table."""
    for c, d_ in ((id_col, df), (vec_col, df), (probe_vec_col, probes)):
        if c not in d_.columns:
            raise ValueError(f"column {c!r} not found")
    if impl not in ("fold", "arrow"):
        raise ValueError(f"impl must be fold|arrow, got {impl!r}")
    # probe-set validation for BOTH impls (probes are small by
    # contract, so this driver-side peek is one tiny job): an empty or
    # dimension-mixed probe set must fail loudly — under fold it would
    # otherwise silently yield 0 rows / silently skip the malformed
    # probes (zip_with null-pads, NULL cosine, max drops it)
    dims = [
        r[0]
        for r in probes.where(F.col(probe_vec_col).isNotNull())
        .select(F.size(probe_vec_col))
        .distinct()
        .collect()
    ]
    if not dims:
        raise ValueError("probes is empty")
    if len(dims) != 1:
        raise ValueError(f"probe vectors have mixed dimensions {sorted(dims)}")
    # unscorable corpus rows (NULL vector or dimension != probe dim) are
    # dropped identically in both impls — a native filter, no extra
    # shuffle or scan
    df = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == F.lit(int(dims[0])))
    )
    if impl == "fold":
        p = probes.where(F.col(probe_vec_col).isNotNull()).select(
            F.col(probe_vec_col).alias("__pvec")
        )
        # clamped-norm cosine, mirroring the arrow GEMM (and the SQL
        # oracle's greatest(sqrt(...), 1e-12)): 0.0/0.0 would be NaN,
        # and Spark's max sorts NaN above every double
        num = dot_product(F.col(vec_col), F.col("__pvec"))
        den = F.greatest(l2_norm(F.col(vec_col)), F.lit(1e-12)) * F.greatest(
            l2_norm(F.col("__pvec")), F.lit(1e-12)
        )
        return (
            df.crossJoin(F.broadcast(p))
            .withColumn("__cos", num / den)
            .groupBy(id_col)
            .agg(F.max("__cos").alias("max_sim"))
        )
    prows = probes.where(F.col(probe_vec_col).isNotNull()).select(probe_vec_col).collect()
    P = np.asarray([r[0] for r in prows], dtype=np.float64)
    Punit = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf("double")
    def max_sim(s: pd.Series) -> pd.Series:
        m = np.vstack(s.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ Punit.T).max(axis=1))

    return df.select(id_col, max_sim(F.col(vec_col)).alias("max_sim"))


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _md5_planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """Deterministic Rademacher (±1) hyperplanes, each entry the parity
    of ``md5(f"{table}_{plane}_{dim}")`` — the same engine-portable md5
    trick that makes the MinHash ledger oracle bit-reproducible
    (``hash64_expr`` md5 mode): any SQL engine rebuilds the identical
    matrix with ``md5(t || '_' || p || '_' || i)``. Sign random
    projections with ±1 entries are a standard LSH family (Charikar's
    SimHash with Rademacher instead of Gaussian directions); combined
    with the integer quantization in ``_bucket_udf`` the whole bucket
    assignment is exact integer arithmetic, so an LSH-mode near-dup
    query can be graded by an EXACT SQL oracle instead of only the
    exhaustive single-bucket mode. Returns int64, which also selects
    the quantized-integer path in ``_bucket_udf``."""
    import hashlib

    c = np.empty((n_tables, n_planes, dim), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            for i in range(dim):
                h = int(hashlib.md5(f"{t}_{p}_{i}".encode()).hexdigest()[:15], 16)
                c[t, p, i] = 1 if h % 2 == 0 else -1
    return c


def _bucket_udf(planes: np.ndarray):
    """Packed sign-bit bucket ids for ALL LSH tables in one vectorized
    pandas_udf: one einsum of the Arrow batch against every hyperplane
    (n_tables * n_planes interpreted fold-expressions per row would be
    the slow path). Returns array<long>, one bucket per table."""
    _, n_planes, _ = planes.shape
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    integer_planes = np.issubdtype(planes.dtype, np.integer)

    @F.pandas_udf("array<long>")
    def buckets(s: pd.Series) -> pd.Series:
        m = np.vstack(s.to_numpy()).astype(np.float64)  # (n, dim)
        if integer_planes:
            # oracle-reproducible path (md5 Rademacher planes): project
            # the 1e-6-quantized embedding with EXACT int64 arithmetic —
            # floor(x * 1e6) and the ±1 dot products are bit-identical
            # in any engine, so sign decisions can never straddle a
            # float summation-order boundary the way a BLAS-ordered
            # Gaussian projection could
            m = np.floor(m * 1e6).astype(np.int64)
        bits = np.einsum("nd,tpd->ntp", m, planes) > 0  # (n, T, P)
        vals = (bits * weights).sum(axis=2).astype(np.int64)  # (n, T)
        return pd.Series(list(vals))

    return buckets


def _bucket_exprs(vec_col: str, planes: np.ndarray) -> list[Column]:
    """One bucket column per LSH table (vectorized; see _bucket_udf)."""
    n_tables = planes.shape[0]
    arr = _bucket_udf(planes)(F.col(vec_col))
    return [arr.getItem(t).alias(f"__b{t}") for t in range(n_tables)]


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_planes: int | str = 8,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    target_bucket_size: int = 256,
    plane_mode: str = "gaussian",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector analogue of
    MinHash dedup): random-hyperplane LSH proposes candidates — rows
    sharing a bucket in ANY table, generated by an equi-join on
    (table, bucket), never an all-pairs product — then an exact cosine
    check keeps pairs with ``cos >= threshold``. Deterministic (seeded
    planes). ``max_bucket_size`` drops over-cap (table, bucket) groups
    before the self-join — the same giant-cluster skew guard as
    ``minhash_lsh_pairs``; None = exact LSH behavior.
    Returns (id_a, id_b, cos).

    Physical strategy — bucket-local verify, not a candidate join: each
    (table, bucket) group is scored as ONE NumPy gemm inside
    ``applyInPandas`` and only pairs passing the threshold leave the
    group. The alternative (equi-join exploded bucket tables on
    (t, b), distinct the candidate pairs, then re-join vectors twice)
    materializes and shuffles every within-bucket pair — ~N²/2^planes
    per table — before a single cosine is computed; with near-uniform
    embeddings that candidate set is orders of magnitude larger than
    the verified output. Here the quadratic work stays inside a BLAS
    call on data already co-located by the groupBy shuffle, the
    shuffle volume is n_tables × the vector table (the standard LSH
    multiplicity), and only verified pairs (then one dropDuplicates
    over tables that agree) hit the wire.

    ``n_planes="auto"`` (round 6) sizes the plane count to the DATA:
    ``ceil(log2(n / target_bucket_size))`` from one count job, keeping
    the expected bucket population near ``target_bucket_size`` however
    large the table grows. A FIXED plane count is quadratic at scale —
    expected per-bucket pairs are ~(n/2^p)², so 10× rows at constant p
    is ~100× GEMM work per bucket — while auto sizing adds one plane
    per doubling and keeps total verify work ~linear in n. The recall
    trade is governed by per-table collision probability
    ``(1 - θ/π)^p``: in the near-duplicate regime this op targets
    (cos ≥ 0.9, θ ≤ 26°) each extra plane costs ≤ ~8% per table and
    the ``n_tables`` OR-construction absorbs it (miss ∝ (1-p_t)^T);
    for moderate thresholds, size ``n_planes`` manually and raise
    ``n_tables`` with it.

    ``plane_mode="md5"`` (round 7) swaps the seeded Gaussian planes for
    deterministic md5-parity Rademacher (±1) planes and projects a
    1e-6-quantized (floored) copy of the embedding with exact int64
    arithmetic (see ``_md5_planes``): every bucket decision is then
    bit-reproducible in plain SQL, so the LSH mode itself — not just
    the exhaustive ``n_planes=0`` special case — can be graded by an
    exact DuckDB oracle. Same semantics (co-bucketed in any table AND
    exact cosine ≥ threshold); quantization only perturbs bucket
    boundaries, never the verified cosine."""
    if n_planes == "auto":
        n_rows = df.count()
        n_planes = max(
            1, math.ceil(math.log2(max(2.0, n_rows / max(1, target_bucket_size))))
        )
    elif (
        isinstance(n_planes, bool)
        or not isinstance(n_planes, numbers.Integral)
        or n_planes < 0
    ):
        # bool is an int subclass: n_planes=True would silently run a
        # 1-plane LSH (2 giant buckets — the quadratic regime auto
        # exists to avoid) instead of erroring like other junk specs;
        # negative counts would die inside numpy with a shape error.
        # numbers.Integral (not plain int) so numpy integer scalars —
        # the natural output of numpy-derived sizing — stay accepted.
        # n_planes=0 is ALLOWED and contractual: the exhaustive mode
        # (one bucket, all-pairs verify) the oracle-graded driver row
        # runs so the all-pairs threshold SQL applies exactly.
        raise ValueError(
            f"n_planes must be a non-negative int or 'auto', got {n_planes!r}"
        )
    else:
        n_planes = int(n_planes)
    dim = len(df.select(vec_col).first()[0])
    df = spread_for_compute(df)
    if plane_mode == "gaussian":
        planes = _hyperplanes(dim, n_planes, n_tables, seed)
    elif plane_mode == "md5":
        planes = _md5_planes(dim, n_planes, n_tables)
    else:
        raise ValueError(f"plane_mode must be 'gaussian' or 'md5', got {plane_mode!r}")
    id_type = df.schema[id_col].dataType.simpleString()
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
    with_buckets = base.select("__id", "__vec", *_bucket_exprs("__vec", planes))
    buckets = with_buckets.select(
        "__id",
        "__vec",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("b"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("__id", "__vec", F.col("tb.t").alias("__t"), F.col("tb.b").alias("__b"))

    cap = max_bucket_size
    thr = float(threshold)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        if n < 2 or (cap is not None and n > cap):
            return empty
        # sort by id so upper-triangle (i < j) implies id_a < id_b
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        m = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
        u = m / np.linalg.norm(m, axis=1, keepdims=True)
        out = []
        # blocked gemm: memory stays O(block * n) however big the group
        for lo in range(0, n, 2048):
            hi = min(lo + 2048, n)
            sims = u[lo:hi] @ u.T
            r, c = np.nonzero(sims >= thr)
            keep = (r + lo) < c
            out.append(
                pd.DataFrame(
                    {"id_a": ids[r[keep] + lo], "id_b": ids[c[keep]], "cos": sims[r[keep], c[keep]]}
                )
            )
        return pd.concat(out) if out else empty

    # mapInPandas fold with a LOCAL groupby instead of per-group
    # applyInPandas (round 14): the verify's cost here is per-group
    # LATENCY, not GEMM flops — hundreds of ~target_bucket_size groups
    # each paying Arrow framing + vstack/normalize setup (profiled
    # ~2.7 CPU-s for 256 trivial GEMMs at sf0.1; interleaved A/B: 1.54
    # -> 1.41 s row floor, identical pairs). Buckets stay whole because
    # the exchange hash-partitions on the full (table, bucket) key;
    # rows of a bucket are ACCUMULATED until the partition ends (a GEMM
    # is not incremental), so task memory is one reduce partition of
    # vectors — bounded by the shuffle partitioning a cluster already
    # sizes, with over-cap buckets dropped AS THEY ACCUMULATE so a
    # skew-bomb bucket never materializes past the cap.
    keys = ["__t", "__b"]
    try:
        n_parts = int(
            buckets.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # pragma: no cover - e.g. "auto"
        n_parts = buckets.sparkSession.sparkContext.defaultParallelism

    def fold(batches):
        acc: dict = {}  # group key -> list of row slices | None (= over cap)
        for pdf in batches:
            if not len(pdf):
                continue
            for gkey, gidx in pdf.groupby(keys, sort=False).indices.items():
                if gkey in acc and acc[gkey] is None:
                    continue
                parts = acc.setdefault(gkey, [])
                parts.append(pdf.iloc[gidx])
                if cap is not None and sum(len(p) for p in parts) > cap:
                    acc[gkey] = None
        for parts in acc.values():
            if parts is None:
                continue
            g = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            out = bucket_pairs(g)
            if len(out):
                yield out

    return (
        buckets.repartition(n_parts, *keys)
        .mapInPandas(fold, f"id_a {id_type}, id_b {id_type}, cos double")
        .dropDuplicates(["id_a", "id_b"])
    )


def train_ivf_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int = 16,
    train_n: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Train ``nlist`` unit-norm spherical-k-means centroids on a
    bounded, deterministic sample.

    The sample is the ``train_n`` rows with the smallest
    ``xxhash64(id)`` — a TakeOrdered job (scan + per-partition top-n),
    never a full collect, so training stays O(train_n · d) on the
    driver regardless of table size. Lloyd iterations run in NumPy:
    assign by max dot against unit centroids, re-mean, re-normalize;
    empty cells are re-seeded from the sample deterministically.
    """
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(train_n)
        .collect()
    )
    if not rows:  # empty table: no cells to train
        return np.zeros((0, 0), dtype=np.float64)
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    nlist = min(nlist, len(X))
    C = X[rng.choice(len(X), size=nlist, replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(nlist):
            members = X[assign == c]
            if len(members) == 0:
                C[c] = X[rng.integers(len(X))]
                continue
            mean = members.mean(axis=0)
            C[c] = mean / max(np.linalg.norm(mean), 1e-12)
    return C


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray, cell_col: str = "__cell") -> DataFrame:
    """Add the IVF cell id (nearest-centroid index by cosine): one
    Arrow-batched matrix product + argmax per batch. At scale the
    assigned table would be written partitioned/bucketed by this column
    so probes prune at the file level; here it is an ordinary column
    feeding an ``isin`` filter."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def cell(s: pd.Series) -> pd.Series:
        m = np.vstack(s.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ C.T).argmax(axis=1).astype(np.int32))

    return df.withColumn(cell_col, cell(F.col(vec_col)))


def cosine_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_n: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF cell pruning.

    Scale path: the probe's ``nprobe`` nearest centroids are computed
    on the driver (O(nlist · d)), and only vectors assigned to those
    cells are scored — an ``isin`` filter Catalyst can push to a
    cell-partitioned scan, cutting the scored fraction to ~nprobe/nlist.
    Exact Arrow-batched rerank inside the probed cells. Deterministic
    (seeded sample + seeded k-means). Returns (rank, id).
    """
    C = train_ivf_centroids(df, id_col, vec_col, nlist, train_n, seed=seed)
    probe_row = df.filter(F.col(id_col) == probe_id).select(vec_col).first()
    if probe_row is None:
        raise ValueError(f"probe id {probe_id!r} not found")
    probe_vec = np.asarray(probe_row[0], dtype=np.float64)
    punit = probe_vec / max(np.linalg.norm(probe_vec), 1e-12)
    probed = np.argsort(-(C @ punit), kind="stable")[: min(nprobe, len(C))]
    pnorm = float(np.linalg.norm(probe_vec))

    @F.pandas_udf("double")
    def score(s: pd.Series) -> pd.Series:
        m = np.vstack(s.to_numpy()).astype(np.float64)
        return pd.Series((m @ probe_vec) / (np.linalg.norm(m, axis=1) * pnorm))

    cand = (
        ivf_assign(df, vec_col, C)
        .filter(F.col("__cell").isin([int(c) for c in probed]))
        .filter(F.col(id_col) != probe_id)
        .withColumn("__cos", score(F.col(vec_col)))
    )
    ranked = top_k_per_group(
        cand.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("__cos").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )
    return ranked.select("rank", id_col).withColumn("rank", F.col("rank").cast("long"))


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id: int,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (the scale path).

    Signature bits are native expressions over literal plane arrays —
    ``dot(v, plane) > 0`` per plane, packed to one bucket id per table.
    Candidate set = rows sharing the probe's bucket in ANY table; exact
    cosine rerank on candidates only. At 100 TB the equi-join on
    (table, bucket) prunes ~ (1 - 2^-n_planes) of the data per table.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    with_buckets = df.select(
        F.col(id_col), F.col(vec_col), *_bucket_exprs(vec_col, planes)
    )
    probe = with_buckets.filter(F.col(id_col) == probe_id).select(
        F.col(vec_col).alias("__probe_vec"),
        *[F.col(f"__b{t}").alias(f"__pb{t}") for t in range(n_tables)],
    )
    joined = with_buckets.filter(F.col(id_col) != probe_id).crossJoin(F.broadcast(probe))
    any_match = None
    for t in range(n_tables):
        m = F.col(f"__b{t}") == F.col(f"__pb{t}")
        any_match = m if any_match is None else (any_match | m)
    cand = joined.filter(any_match).withColumn(
        "__cos", cosine(F.col(vec_col), F.col("__probe_vec"))
    )
    ranked = top_k_per_group(
        cand.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("__cos").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
    )
    return ranked.select("rank", id_col).withColumn("rank", F.col("rank").cast("long"))


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int = 16,
    threshold: float = 0.95,
    train_n: int = 4096,
    iters: int = 10,
    seed: int = 42,
    max_cell: int = 200_000,
    cell_col: str = "cell",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.03540): embedding-level
    semantic dedup — cluster vectors with spherical k-means, then
    within each cluster greedily drop any vector whose cosine to an
    already-kept earlier vector (smaller id) meets or exceeds
    ``threshold``. Returns the surviving rows as ``(id_col, cell_col)``.

    Scale path: the k-means fit is the bounded deterministic sample of
    ``train_ivf_centroids`` (O(train_n · d) driver work regardless of
    table size); assignment is one Arrow-batched matrix product; the
    within-cluster prune is ``applyInPandas`` per cell — pairwise work
    is confined to cells (~N/nlist rows each), never the whole table,
    which is the entire point of the published method. Size ``nlist``
    so cells fit one task; a cell above ``max_cell`` raises loudly
    (raise ``nlist``) rather than silently OOMing mid-job.

    Deterministic: seeded sample + seeded k-means + ascending-id greedy
    order, so re-runs and different input partitionings agree exactly.
    No SQL oracle (iterative k-means); graded by the differential
    planted-duplicate pytest (tests/test_similarity.py).
    """
    C = train_ivf_centroids(df, id_col, vec_col, nlist, train_n, iters, seed)
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        [df.schema[id_col], StructField(cell_col, IntegerType(), False)]
    )
    if C.shape[0] == 0:  # empty table: nothing to dedup
        return df.sparkSession.createDataFrame([], out_schema)
    assigned = ivf_assign(
        df.select(id_col, vec_col), vec_col, C, cell_col="__sd_cell"
    )

    def prune(key, pdf):
        if len(pdf) > max_cell:
            raise ValueError(
                f"semantic_dedup cell {key[0]} has {len(pdf)} rows > "
                f"max_cell={max_cell}; raise nlist so cells fit one task"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        kept = np.empty_like(m)
        kept_idx = []
        for i in range(len(pdf)):
            if not kept_idx or float((kept[: len(kept_idx)] @ m[i]).max()) < threshold:
                kept[len(kept_idx)] = m[i]
                kept_idx.append(i)
        out = pdf.iloc[kept_idx][[id_col]].copy()
        out[cell_col] = int(key[0])
        return out

    return assigned.groupBy("__sd_cell").applyInPandas(prune, out_schema)
