"""Multi-dimensional data layout: z-order clustering for write paths
(north-star extension; the reference has no file sinks at all — its
only I/O is Kafka, src/jobs/batch_job.py:86-94,144-153).

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan optimization after partition pruning is ROW-GROUP
skipping on parquet min/max statistics. Sorting by a single column
clusters only that column; interleaving the bits of several columns
(a Morton / z-order curve) clusters ALL of them at once, so range
predicates on any subset of the z-ordered columns touch a small
fraction of files. This is the same layout technique Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse/Databricks liquid clustering
apply — here as a pure DataFrame composition:

- ``zorder_key``: fixed-point-normalize each column against
  data-driven (or caller-provided) bounds, then interleave bits with
  native ``shiftright``/``bitwiseAND``/``shiftleft`` expressions —
  whole-stage-codegen'd, no Python;
- ``write_zordered``: global range-partition by the z-key, sort within
  partitions, write parquet — every output file covers a small
  hyper-cube of the key space.

The only driver materialization is the d-row bounds aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "write_zordered"]


def _fixed_point(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2**bits) against
    [lo, hi]; values at hi (or beyond, for caller-provided bounds)
    clamp to the top cell — same edge policy as the MR-GRID bucket
    (operators/skyline.py)."""
    n_cells = 1 << bits
    if hi <= lo:  # constant column: everything in cell 0
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(hi - lo) * F.lit(n_cells)
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n_cells - 1)).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton (z-order) key over ``cols`` as a single LONG column
    expression: each column is normalized to ``bits`` bits against its
    [min, max] (computed in one aggregate job unless supplied via
    ``bounds``), then the bits are interleaved column-round-robin.

    ``len(cols) * bits`` must fit in 63 bits. Timestamps/dates are
    supported via their numeric cast. NULLs normalize to cell 0 (they
    sort first — together, which is what a scan filter wants).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame columns {df.columns}")
    d = len(cols)
    if d * bits > 63:
        raise ValueError(
            f"{d} columns x {bits} bits = {d * bits} key bits > 63; lower bits="
        )
    if bits < 1:
        raise ValueError("bits must be >= 1")

    def numeric(c: str) -> Column:
        dtype = dict(df.dtypes)[c]
        col = F.col(c)
        if dtype in ("timestamp", "timestamp_ntz"):
            return F.unix_micros(col.cast("timestamp")).cast("double")
        if dtype == "date":
            return F.datediff(col, F.lit("1970-01-01")).cast("double")
        return col.cast("double")

    if bounds is None:
        row = df.agg(
            *[F.min(numeric(c)).alias(f"lo_{i}") for i, c in enumerate(cols)],
            *[F.max(numeric(c)).alias(f"hi_{i}") for i, c in enumerate(cols)],
        ).first()
        bounds_list = [
            (row[f"lo_{i}"], row[f"hi_{i}"]) for i in range(d)
        ]
    else:
        missing_b = [c for c in cols if c not in bounds]
        if missing_b:
            raise ValueError(f"bounds missing for columns {missing_b}")
        bounds_list = [bounds[c] for c in cols]

    cells = []
    for c, (lo, hi) in zip(cols, bounds_list):
        if lo is None or hi is None:  # all-NULL column
            lo, hi = 0.0, 0.0
        cells.append(
            F.coalesce(_fixed_point(numeric(c), float(lo), float(hi), bits), F.lit(0))
        )

    z = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(d):
            bit = F.shiftright(cells[i], j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * d + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order curve of
    ``cols``: global range-partition on the z-key (``n_files`` ranges —
    one task/file each), sort within partitions, drop the key, write.

    Each output file then covers a compact hyper-cube of the key
    space, so parquet min/max statistics prune files for range
    predicates on ANY of the z-ordered columns — the read side needs
    no code change, Spark's scan does the skipping from footer stats.
    """
    if n_files < 1:
        raise ValueError("n_files must be >= 1")
    key = "__zkey"
    if key in df.columns:
        raise ValueError(f"{key} column already present")
    keyed = df.withColumn(key, zorder_key(df, cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )
