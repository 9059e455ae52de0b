"""Bucketed-table helpers: co-located joins without a shuffle.

At cluster scale the dominant cost of a large equi-join is the shuffle
of both sides. Hive-style bucketing (``DataFrameWriter.bucketBy``)
hash-partitions the FILES by the join key at write time, so a join of
two tables bucketed the same way reads pre-co-located data and the
planner drops both Exchange nodes (verified by the plan-audit test —
``SortMergeJoin`` directly over scans). The one-time write cost is
amortized over every subsequent join/aggregation on the bucket key —
the right trade for fact tables joined repeatedly (orders x lineitem,
documents x embeddings).

The reference has no table layout control at all (Kafka topics only,
reference README.md:98-102, 5 fixed topic partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table.

    ``num_buckets`` should divide evenly into the cluster's task slots;
    sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the same files would lose it)."""
    return spark.table(table)
