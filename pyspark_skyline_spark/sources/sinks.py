"""Batch sinks with scale-correct defaults (the reference's only sink is
Kafka, reference src/jobs/batch_job.py:144-153; file sinks are new
surface).

What matters at 100 TB is FILE GEOMETRY, not the write call itself:

* **target file size** — a sea of KB-sized files destroys scan
  parallelism setup cost and NameNode/object-store metadata; multi-GB
  files destroy parallelism. ``maxRecordsPerFile`` bounds the top end;
  a pre-write ``repartition`` bounds the bottom end AND (on the
  partition columns) lines task boundaries up with directory
  boundaries so each task writes few files.
* **hive partitioning** (``partitionBy``) gives partition PRUNING on
  read: a date/source filter skips whole directories before any IO.
* writes are atomic per task via the normal Spark commit protocol; no
  custom machinery needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_table"]


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write ``df`` as a partitioned table with bounded file sizes.

    With ``partition_by``, the input is first hash-repartitioned ON the
    partition columns: without this, every task can hold rows of every
    partition value and the job writes ``tasks x values`` small files —
    the classic small-file explosion. ``maxRecordsPerFile`` then splits
    any oversized task output, bounding the other extreme.
    """
    out = df
    if partition_by:
        out = out.repartition(*partition_by)
    w = out.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    w.save(path)
