"""Operational diagnostics for partition/join planning (north-star
extension; no counterpart in the reference): the numbers you read
BEFORE choosing salting factors, broadcast thresholds, and shuffle
partition counts on a large cluster.

Both operators are single hash-aggregate pipelines with map-side
partial combine — one scan each, no row-scale driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["heavy_hitters", "skew_stats"]


def heavy_hitters(df: DataFrame, cols: list[str], k: int = 20) -> DataFrame:
    """Top-``k`` most frequent key combinations of ``cols`` with their
    counts — the keys that need salting (or a skew-join hint) if they
    dominate a shuffle. Explode-free hash aggregate + global top-k via
    ``TakeOrderedAndProject`` (per-partition heaps, never a full sort);
    count-desc then key-asc order makes the cut deterministic."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame columns {df.columns}")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return counts.orderBy(F.col("n").desc(), *[F.col(c).asc() for c in cols]).limit(k)


def skew_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row skew summary of the key distribution of ``cols``:
    ``(n_rows, n_keys, max_key_rows, avg_key_rows, skew_ratio)`` where
    ``skew_ratio = max/avg`` — >> 1 means the hottest key would
    dominate its shuffle partition (salt it, or rely on AQE skew-join).
    Two chained aggregates (per-key counts, then their max/avg), both
    map-side combined; only the single summary row reaches the driver's
    caller."""
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame columns {df.columns}")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    return counts.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__n").cast("long").alias("max_key_rows"),
        F.round(F.avg("__n"), 6).alias("avg_key_rows"),
        F.round(F.max("__n") / F.avg("__n"), 6).alias("skew_ratio"),
    )
