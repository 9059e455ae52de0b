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

__all__ = ["column_profile"]


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
