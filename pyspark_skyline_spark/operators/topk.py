"""Windowed top-k per group (SURVEY.md §2.3: window functions absent in
the reference; provided here as a first-class operator and used by the
similarity search)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["top_k_per_group"]


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic top-k rows per group. ``order_exprs`` must contain a
    tie-breaker (e.g. a key column) to be reproducible."""
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
