"""Dataset profiling (north-star extension; no counterpart in the
reference): the "measure, don't guess" primitive a pipeline runs before
choosing partition counts, join strategies, and filter thresholds.

``column_profile`` computes per-column row/null/approx-distinct counts
and numeric min/max/mean in ONE aggregate job — a single scan with
map-side partial aggregation regardless of how many columns are
profiled. Output is a small long-format DataFrame (one row per column),
reshaped on the driver from the single aggregate row (O(columns) work,
never row-scale data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType

__all__ = [
    "column_profile",
    "column_quantiles",
    "column_correlations",
    "categorical_mi",
    "histogram",
]


def categorical_mi(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns — the
    dependence probe `column_correlations` cannot give for
    non-numeric columns (is `status` informative about `priority`? is
    a quality flag secretly a language detector?). Returns ONE row:
    ``(mi_nats, n_rows, n_a, n_b)`` — MI plus the row count scored and
    each column's distinct cardinality. Rows where either column is
    NULL are excluded (NULL equi-joins drop them silently otherwise;
    excluding them is the explicit, documented convention).

    ``MI = Σ_ab p(a,b) · ln( p(a,b) / (p(a) p(b)) )`` over the joint
    contingency table. Exact arithmetic but the ``ln`` (~1e-12
    cross-engine), an integer-exact single-row output shape, so the
    operator is exactly oracle-able.

    Scale shape: ONE map-side-combined hash aggregate of the corpus to
    the joint table (cardinality |A|·|B| — tiny for real categoricals;
    a lazy checkpoint cuts lineage because three consumers derive from
    it: both marginals and the total); the marginals re-aggregate the
    already-reduced joint table, never the corpus; two equi-joins over
    contingency-sized tables and one scalar sum end it."""
    if col_a == col_b:
        raise ValueError("col_a and col_b must differ")
    missing = [c for c in (col_a, col_b) if c not in df.columns]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame columns")
    base = df.select(col_a, col_b).dropna()
    joint = (
        base.groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__cab"))
        .localCheckpoint(eager=False)
    )
    ma = joint.groupBy(col_a).agg(F.sum("__cab").alias("__ca"))
    mb = joint.groupBy(col_b).agg(F.sum("__cab").alias("__cb"))
    tot = joint.agg(F.sum("__cab").alias("__n"))
    j = (
        joint.join(ma, col_a)
        .join(mb, col_b)
        .crossJoin(F.broadcast(tot))
    )
    # ratio-of-probabilities form, not (cab*n)/(ca*cb): the integer
    # products overflow a long near 10^10-row inputs (ANSI throw);
    # probabilities divide first and stay in double range, and the
    # oracle runs the identical expression
    pab = F.col("__cab") / F.col("__n")
    contrib = pab * F.log(
        pab / ((F.col("__ca") / F.col("__n")) * (F.col("__cb") / F.col("__n")))
    )
    return j.agg(
        F.sum(contrib).alias("mi_nats"),
        F.sum("__cab").cast("long").alias("n_rows"),
        F.count_distinct(F.col(col_a)).cast("long").alias("n_a"),
        F.count_distinct(F.col(col_b)).cast("long").alias("n_b"),
    )


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct_rsd: float = 0.05,
    distinct_mode: str = "approx",
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregate pass.

    Returns a DataFrame with one row per column:
    ``(column, n_rows, n_nulls, approx_distinct, min, max, mean)`` —
    min/max/mean as doubles for numeric columns, null otherwise
    (min/max over strings/timestamps are type-heterogeneous, so they
    are deliberately left out of the uniform schema; query them
    directly when needed).

    With the default ``distinct_mode="approx"``, ``approx_distinct``
    uses HyperLogLog++ (relative sd ``distinct_rsd``) — deterministic
    for a given dataset since sketch inserts and merges are
    order-independent. At 100 TB this is the affordable form of
    distinctness; exact NDV is a full shuffle per column.
    ``distinct_mode="exact"`` computes exact ``count(DISTINCT)`` per
    column instead (still one aggregate job — Spark expands the
    distinct aggregates); use it for small inputs or when an external
    SQL oracle must reproduce the value bit-for-bit.
    """
    if distinct_mode not in ("approx", "exact"):
        raise ValueError(f"distinct_mode must be approx|exact, got {distinct_mode!r}")
    cols = list(cols or df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame columns {df.columns}")
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    # project to the profiled columns, then spread (round 14): the
    # distinct aggregates expand the input |cols|-fold and reduce it in
    # the PARTIAL aggregate, which runs at scan parallelism — a one-file
    # input profiled the whole expand on one task (8-vs-32-core ratio
    # 1.04). The spread exchange carries only the profiled columns; at
    # real scale it is a no-op (see spread_for_compute).
    from pyspark_skyline_spark.operators.dedup import spread_for_compute

    df = spread_for_compute(df.select(*[F.col(f"`{c}`") for c in cols]))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nulls_{c}"))
        if distinct_mode == "exact":
            aggs.append(F.countDistinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col, distinct_rsd).alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
            aggs.append(F.avg(col.cast("double")).alias(f"__mean_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["__n"],
            row[f"__nulls_{c}"],
            row[f"__nd_{c}"],
            row[f"__min_{c}"] if c in numeric else None,
            row[f"__max_{c}"] if c in numeric else None,
            row[f"__mean_{c}"] if c in numeric else None,
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, approx_distinct long, "
        "min double, max double, mean double",
    )


def column_quantiles(
    df: DataFrame,
    cols: list[str] | None = None,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    mode: str = "approx",
    accuracy: int = 10000,
) -> DataFrame:
    """Per-column quantiles of the numeric columns in ONE aggregate job
    (the distribution companion of ``column_profile`` — pick shuffle
    partition counts, salt thresholds, and filter cut-offs from data).

    Returns long-format ``(column, p, value)`` — values as doubles,
    rounded to 6 decimals.

    ``mode="approx"`` (default) uses ``percentile_approx`` (GK sketch,
    ``accuracy`` trade-off) — mergeable map-side partials, the only
    affordable form at 100 TB. ``mode="exact"`` uses the exact
    interpolated ``percentile`` (DuckDB's ``quantile_cont`` definition)
    — a per-column value buffer in the aggregate, fine for profiling
    samples and bit-reproducible against SQL oracles.
    """
    if mode not in ("approx", "exact"):
        raise ValueError(f"mode must be approx|exact, got {mode!r}")
    if not probs or not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be within [0, 1], got {probs}")
    numeric = [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    cols = [c for c in (cols or numeric)]
    bad = [c for c in cols if c not in numeric]
    if bad:
        raise ValueError(f"columns {bad} are not numeric (numeric: {numeric})")
    arr = "array(" + ", ".join(repr(float(p)) for p in probs) + ")"
    fn = "percentile" if mode == "exact" else "percentile_approx"
    extra = "" if mode == "exact" else f", {int(accuracy)}"
    aggs = [
        F.expr(f"{fn}(`{c}`{'' if mode == 'exact' else ''}, {arr}{extra})").alias(
            f"__q_{c}"
        )
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (c, float(p), round(float(v), 6) if v is not None else None)
        for c in cols
        for p, v in zip(probs, row[f"__q_{c}"] or [None] * len(probs))
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, p double, value double"
    )


def column_correlations(
    df: DataFrame,
    cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations of the numeric columns in ONE
    aggregate job — all d*(d-1)/2 ``corr`` aggregates share a single
    scan with map-side partials; only the tiny coefficient row reaches
    the driver.

    Returns long-format ``(col_a, col_b, corr)`` with ``col_a <
    col_b`` (each unordered pair once); Pearson is scale-invariant so
    the value is engine-portable modulo float noise (absorbed by
    ``round_to``). The feature-selection / redundancy-detection
    companion of ``column_profile``.
    """
    numeric = [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    cols = list(cols or numeric)
    bad = [c for c in cols if c not in numeric]
    if bad:
        raise ValueError(f"columns {bad} are not numeric (numeric: {numeric})")
    if len(cols) < 2:
        raise ValueError(f"need >= 2 numeric columns, got {cols}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = [
        F.round(F.corr(F.col(f"`{a}`"), F.col(f"`{b}`")), round_to).alias(
            f"__c_{i}"
        )
        for i, (a, b) in enumerate(pairs)
    ]
    row = df.agg(*aggs).collect()[0]
    out = [(a, b, row[f"__c_{i}"]) for i, (a, b) in enumerate(pairs)]
    return df.sparkSession.createDataFrame(
        out, "col_a string, col_b string, corr double"
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    mode: str = "width",
    relative_error: float = 1e-4,
) -> DataFrame:
    """Distribution histogram of a numeric column in two aggregate jobs
    (edges, then one map-side-combined count pass) — the profiling
    primitive behind partition sizing and filter selectivity estimates.

    ``mode="width"``: ``bins`` equi-width buckets over [min, max]; the
    top edge is closed so max lands in the last bucket. ``mode="depth"``:
    equi-population buckets with edges from ``percentile_approx``
    (``relative_error`` accuracy) — the shape that stays readable on
    skewed data. Returns ``(bucket, lo, hi, n)`` with every bucket
    materialized (empty ones carry n=0), ordered by bucket.

    NULLs are excluded (count them via ``column_profile``).
    """
    if mode not in ("width", "depth"):
        raise ValueError(f"mode must be width|depth, got {mode!r}")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    numeric = {f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)}
    if col not in numeric:
        raise ValueError(f"column {col!r} is not numeric (numeric: {sorted(numeric)})")
    x = F.col(f"`{col}`").cast("double")
    src = df.where(x.isNotNull())
    if mode == "width":
        lo, hi = src.agg(F.min(x), F.max(x)).first()
        if lo is None:
            edges = [0.0] * (bins + 1)
        elif hi == lo:
            edges = [float(lo)] * (bins + 1)
        else:
            span = (hi - lo) / bins
            edges = [float(lo + i * span) for i in range(bins)] + [float(hi)]
        if hi is None or hi == lo:
            bucket = F.lit(0)
        else:
            bucket = F.least(
                F.floor((x - F.lit(float(lo))) / F.lit((hi - lo) / bins)),
                F.lit(bins - 1),
            ).cast("int")
    else:
        probs = ", ".join(str(i / bins) for i in range(1, bins))
        row = src.agg(
            F.min(x).alias("__lo"),
            F.max(x).alias("__hi"),
            F.expr(
                f"percentile_approx(CAST(`{col}` AS DOUBLE), array({probs}), "
                f"{int(1 / relative_error)})"
            ).alias("__cuts"),
        ).first()
        if row["__lo"] is None:
            edges = [0.0] * (bins + 1)
            bucket = F.lit(0)
        else:
            cuts = [float(c) for c in (row["__cuts"] or [])]
            edges = [float(row["__lo"])] + cuts + [float(row["__hi"])]
            bucket = F.lit(0)
            for c in cuts:
                bucket = bucket + F.when(x > F.lit(c), 1).otherwise(0)
            bucket = bucket.cast("int")
    counts = {
        r["__b"]: r["__n"]
        for r in src.groupBy(bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    out = [
        (i, edges[i], edges[i + 1], int(counts.get(i, 0)))
        for i in range(bins)
    ]
    return df.sparkSession.createDataFrame(
        out, "bucket int, lo double, hi double, n long"
    )
