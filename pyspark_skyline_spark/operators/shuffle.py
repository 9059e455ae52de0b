"""Deterministic global shuffle, balanced sharding, and skew-free
grouped ranking (north-star extensions; no counterpart in the
reference — SURVEY.md §2.3 "training-data pipeline" family).

A training pipeline needs a *reproducible* global permutation of the
corpus (epoch shuffles, stable eval splits) and *balanced* output
shards — and needs them without a single-task global window.  The
building block here is a distributed total-order row number:

- ``global_row_number``: range-repartition on the order columns (one
  shuffle — Spark's scalable sort machinery), sort within partitions,
  then number rows as ``offset[pid] + local_pos``.  The per-partition
  offsets come from one tiny count-per-partition job; the local
  position comes from ``monotonically_increasing_id`` (documented
  layout: ``partition_id * 2^33 + record_index``), assigned after the
  local sort — nondeterministic-marked, so Catalyst will not reorder
  it below the sort.  No ``Window.orderBy(...)`` over the whole table,
  which would funnel 100 TB through one task.
- ``global_shuffle``: order key = ``md5(seed | key_cols)`` — a
  deterministic, uniform, engine-portable permutation (DuckDB's md5
  agrees byte-for-byte, so the op is fully oracle-gradable).  Shard =
  ``pos % n_shards``: round-robin over the shuffled order, so shards
  are balanced to within one row (hash-mod sharding is only balanced
  in expectation).
- ``grouped_row_number``: per-group rank in ONE range shuffle on
  ``(group, order)``.  ``Window.partitionBy(group)`` puts each whole
  group in one task — a hot domain at 100 TB is a straggler; here a
  group may span many range partitions and each partition sorts only
  its slice.  Per-(partition, group) counts are collected (groups are
  contiguous under the sort, so that's O(partitions + groups) rows)
  and stitched into per-group offsets on the driver.  The driver
  stitch is only safe when groups are FEW — a high-cardinality group
  key would collect O(groups) rows to the driver — so the op probes
  ``approx_count_distinct(group)`` first and, past ``max_groups``,
  falls back to ``Window.partitionBy`` (the RIGHT plan when groups
  are numerous and small: skew only bites when groups are few and
  hot) or raises, per ``on_many_groups``.
- ``mix_corpus``: exact domain-weighted mixture — take the first
  ``targets[domain]`` rows of each domain in md5 order.  The standard
  "data mixing" step (sample each source to its target share) as one
  sort + one filter; ``allocate_mixture`` converts float weights to
  integer counts by largest remainder.

Scale notes: both row-number ops localCheckpoint the range-shuffled
input so the count job and the main job share one materialization
(reclaimed by the context cleaner), and both run the numbering
arithmetic JVM-side (no Python in the row path).  The
offset/adjustment tables are O(partitions + groups) and are applied
via a broadcast join.  ``write_shards`` materializes an epoch as
hive-partitioned, order-preserving shard files.
"""

from __future__ import annotations

import math
import struct
import warnings

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "global_row_number",
    "global_prefix_sum",
    "global_shuffle",
    "grouped_row_number",
    "ntile_global",
    "ntile_by_group",
    "allocate_mixture",
    "dhondt_allocate",
    "temperature_targets",
    "mix_corpus",
    "rank_ensemble",
    "write_shards",
]

# monotonically_increasing_id layout: upper 31 bits partition id,
# lower 33 bits record index within the partition (Spark API docs).
# The partition id itself comes from spark_partition_id() (contracted
# API); the mid supplies only the within-partition counter, and the
# counts job asserts per-partition that counters are exactly
# 0..cnt-1, so a layout drift in a future Spark fails loudly instead
# of silently corrupting positions.
_MID_BITS = 33
_MID_MASK = (1 << _MID_BITS) - 1


def _broadcast_exclusive_offsets(spark, totals: dict) -> tuple[DataFrame, int]:
    """Shared scaffold of :func:`global_row_number` and
    :func:`global_prefix_sum` (review find: the accumulation loop,
    empty-input sentinel, and join schema were copy-pasted and had to
    stay in lock-step): per-partition totals -> a tiny broadcastable
    ``(__gpid, __poff)`` frame holding each pid's EXCLUSIVE prefix in
    pid order (pids are assigned in range order by repartitionByRange,
    so pid order IS the global order), plus the grand total. The
    ``or [(0, 0)]`` sentinel keeps the join schema valid on an empty
    input; consumers left-join and coalesce the offset to 0."""
    acc = 0
    offsets = []
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    return (
        spark.createDataFrame(offsets or [(0, 0)], "__gpid long, __poff long"),
        acc,
    )


def _num_partitions(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return max(1, int(num_partitions))
    return max(1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))


def _check_lpos_layout(
    pid: int, cnt: int, lo: int, hi: int, total: int, total_sq: int
) -> None:
    """Loud guard for the monotonically_increasing_id record-index
    contract: within one task the masked counter should be exactly the
    permutation 0..cnt-1.  Checks min==0, max==cnt-1,
    sum==cnt(cnt-1)/2 AND sum-of-squares==(cnt-1)cnt(2cnt-1)/6.  This
    is a strong HEURISTIC, not a proof of the permutation: min/max/sum
    alone admit duplicate-plus-gap multisets like {0,0,3,3} (cnt=4),
    which the square-sum rejects; matching all four still leaves
    contrived multi-row compensations (four moments cannot pin a
    multiset of size > 4), but every realistic drift mode — offset
    shift, stride change, counter reset, Catalyst reordering the id
    below the sort — breaks min/max or one of the two sums.  The
    grouped variant's run-tiling check (contiguous [start, end] spans)
    is exact.  On drift, fail the job instead of corrupting positions."""
    if (
        lo != 0
        or hi != cnt - 1
        or total != cnt * (cnt - 1) // 2
        or total_sq != (cnt - 1) * cnt * (2 * cnt - 1) // 6
    ):
        raise RuntimeError(
            "monotonically_increasing_id layout drift detected in "
            f"partition {pid}: local counters span [{lo}, {hi}] with "
            f"sum {total}, square-sum {total_sq} for {cnt} rows "
            f"(expected exactly 0..{cnt - 1}, sum {cnt * (cnt - 1) // 2}, "
            f"square-sum {(cnt - 1) * cnt * (2 * cnt - 1) // 6}). Spark's "
            "record-index contract changed; row numbering would be corrupt."
        )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    pos_col: str = "__pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based global row number in ``order_cols`` order without
    a single-task global window.

    ``order_cols`` must be a total order (ties may land on either side
    of a range-partition boundary and would then be numbered in
    partition order, not a deterministic one).  One range shuffle; the
    count side-job and the main job share the localCheckpoint
    materialization (checkpoint RDDs are reclaimed by the context
    cleaner when the DataFrame goes out of scope — a ``persist`` here
    would pin a full-table cache entry forever).
    """
    return _global_row_number_with_total(df, order_cols, pos_col, num_partitions)[0]


def _global_row_number_with_total(
    df: DataFrame,
    order_cols: list[str],
    pos_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """``global_row_number`` plus the total row count its offsets job
    already computed — callers that need N (ntile's remainder rule)
    get it without a second count job."""
    n = _num_partitions(df, num_partitions)
    part = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__gpid", F.spark_partition_id().cast("long"))
        .withColumn(
            "__lpos", F.monotonically_increasing_id().bitwiseAND(F.lit(_MID_MASK))
        )
        .localCheckpoint(eager=False)
    )
    stats = (
        part.groupBy("__gpid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("__lpos").alias("lo"),
            F.max("__lpos").alias("hi"),
            # both sums in decimal: a partition may legally hold up to
            # 2^33 rows (the record-index width), where the counter sum
            # reaches ~2^65 and the square sum ~2^99 — a long sum would
            # wrap (non-ANSI) or throw (ANSI) and fake a drift error on
            # healthy data; decimal(38,0) holds both exactly
            F.sum(F.col("__lpos").cast("decimal(19,0)")).alias("tot"),
            F.sum(
                F.col("__lpos").cast("decimal(19,0)")
                * F.col("__lpos").cast("decimal(19,0)")
            ).alias("totsq"),
        )
        .collect()
    )
    counts = {}
    for r in stats:
        _check_lpos_layout(
            r["__gpid"], r["cnt"], r["lo"], r["hi"], int(r["tot"]), int(r["totsq"])
        )
        counts[r["__gpid"]] = r["cnt"]
    off, acc = _broadcast_exclusive_offsets(df.sparkSession, counts)
    out = (
        part.join(F.broadcast(off), "__gpid", "left")
        .withColumn(pos_col, F.coalesce(F.col("__poff"), F.lit(0)) + F.col("__lpos"))
        .drop("__gpid", "__lpos", "__poff")
    )
    return out, acc


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "__off",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the EXCLUSIVE global running sum of ``val_col`` in
    ``order_cols`` order (row i gets the sum of all earlier rows'
    values; the first row gets 0) without a single-task global window
    — the scan/prefix-sum primitive behind sequence packing and any
    "global offset" layout computation.

    Same skew-free two-phase shape as :func:`global_row_number`: one
    range shuffle on the order columns, a WITHIN-partition running-sum
    window (parallel — one window partition per range partition), and
    a broadcast join of per-partition value totals accumulated on the
    driver (one tiny collect of `num_partitions` rows). ``order_cols``
    must be a total order for a deterministic result (ties may land on
    either side of a range boundary). ``val_col`` must be non-negative
    integers; the running total must fit a long (ANSI mode raises on
    overflow rather than wrapping — at 9.2e18 that is ~4.6 exabytes of
    int tokens, past any real corpus).

    Plan note (audited): the window's required clustering on
    ``__gpid`` adds a SECOND exchange on top of the range shuffle —
    the rows are already physically grouped by gpid, but Spark cannot
    prove that over a checkpoint scan. Both exchanges carry only the
    caller's projection (callers pass id/length/order metadata, never
    text — see pack_sequences), and the window's groups are the range
    partitions themselves, balanced by construction, so neither
    exchange has a skew or single-task failure mode. A future
    mapPartitions fast path could elide the second exchange; measured
    non-dominant at the current scales (pack_sequences sf1 growth
    1.08x at 10x data)."""
    n = _num_partitions(df, num_partitions)
    part = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__gpid", F.spark_partition_id().cast("long"))
        .localCheckpoint(eager=False)
    )
    stats = (
        part.groupBy("__gpid")
        .agg(F.sum(F.col(val_col).cast("long")).alias("tot"))
        .collect()
    )
    totals = {r["__gpid"]: int(r["tot"] or 0) for r in stats}
    off, _ = _broadcast_exclusive_offsets(df.sparkSession, totals)
    w = (
        Window.partitionBy("__gpid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(val_col).cast("long")).over(w), F.lit(0))
    return (
        part.join(F.broadcast(off), "__gpid", "left")
        .withColumn(out_col, F.coalesce(F.col("__poff"), F.lit(0)) + local)
        .drop("__gpid", "__poff")
    )


def global_shuffle(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int = 8,
    seed: int = 42,
    ord_col: str = "__ord",
    pos_col: str = "__pos",
    shard_col: str = "__shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global permutation + balanced shard assignment.

    ``key_cols`` must uniquely identify rows and be non-NULL (the md5
    order key concatenates them with ``concat_ws``, which skips NULLs —
    a NULL in one key column could make distinct keys tie, and
    duplicate keys would tie outright; ties are numbered in partition
    order, breaking determinism).  Adds:

    - ``ord_col``: ``md5(seed | key_cols)`` hex — the shuffle order,
      identical in any engine with md5 (fully oracle-gradable);
    - ``pos_col``: 0-based position in that order;
    - ``shard_col``: ``pos % n_shards`` — round-robin over the
      shuffled order, balanced to within one row.

    Downstream, write with ``partitionBy(shard_col)`` (or loop shards)
    for per-shard training files.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    keyed = df.withColumn(
        ord_col,
        F.md5(
            F.concat_ws(
                "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
            )
        ),
    )
    out = global_row_number(keyed, [ord_col], pos_col, num_partitions)
    return out.withColumn(shard_col, (F.col(pos_col) % n_shards).cast("int"))


def _group_key_expr(group_cols: list[str]):
    # NULL-safe, injection-safe composite key: base64 has no \x1f and
    # the \x00 sentinel is outside the base64 alphabet
    return F.concat_ws(
        "\x1f",
        *[
            F.coalesce(
                F.base64(F.col(c).cast("string").cast("binary")),
                F.lit("\x00NULL"),
            )
            for c in group_cols
        ],
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    pos_col: str = "__gpos",
    num_partitions: int | None = None,
    max_groups: int = 100_000,
    on_many_groups: str = "window",
    num_groups_hint: int | None = None,
) -> DataFrame:
    """Add a 0-based row number *within each group* in ``order_cols``
    order, without ``Window.partitionBy(group)``'s one-task-per-group
    skew wall.

    One range shuffle on ``(group_cols, order_cols)``; a group may span
    many partitions.  Driver-side stitching: for each (partition,
    group) run — contiguous under the sort — compute its local start
    (cumulative counts of earlier groups in the same partition) and
    its global group offset (counts of the same group in earlier
    partitions); then ``gpos = local_pos - local_start + group_offset``
    applied via a broadcast join of the O(partitions + groups)
    adjustment table.  ``group_cols + order_cols`` must be a total
    order.  Group values may be NULL and may contain any bytes: the
    internal group key base64-encodes each value with a distinct NULL
    sentinel, so ``("x", NULL)`` / ``(NULL, "x")`` and
    delimiter-containing values never collapse into one group.

    **Cardinality guard** (the stitch collects O(groups) rows to the
    driver, so it is only safe when groups are FEW — domains, splits,
    shards): an ``approx_count_distinct`` probe runs over the
    range-shuffled, checkpointed table (so the input lineage is
    computed exactly once — the probe job doubles as the checkpoint
    materialization); if the estimate lands past ``max_groups``, one
    EXACT distinct count decides (the HLL error band never wrongly
    switches plans or raises at the boundary).  Past the cap the op
    either auto-falls back to a ``Window.partitionBy`` over the SAME
    normalized group key the range path uses (so float ``0.0/-0.0``
    and NULL semantics are identical in both plans;
    ``on_many_groups="window"``, the default — the right plan when
    groups are numerous and small, because per-group skew only bites
    when groups are few and hot) or raises
    (``on_many_groups="error"``, for callers that must have the
    range-shuffle plan).  ``num_groups_hint`` skips the probe when
    the caller already knows the cardinality (e.g. it just enumerated
    the domains) — the hint is trusted against ``max_groups``; an
    over-cap hint falls back before any shuffle.  A ≲5% HLL
    underestimate that stays under the cap just means the stitch
    collects ≲5% more rows than ``max_groups`` — the cap is an
    order-of-magnitude guard, not an exact budget.
    """
    out, _counts = _grouped_row_number_impl(
        df,
        group_cols,
        order_cols,
        pos_col,
        num_partitions,
        max_groups,
        on_many_groups,
        num_groups_hint,
    )
    return out.drop("__gkey")


def _grouped_row_number_impl(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    pos_col: str,
    num_partitions: int | None,
    max_groups: int,
    on_many_groups: str,
    num_groups_hint: int | None,
) -> tuple[DataFrame, dict | None]:
    """Shared core: returns ``(out, counts)`` where ``out`` RETAINS the
    normalized ``__gkey`` column and ``counts`` is the exact per-group
    total from the stitch (``{gkey: cnt}``) — or ``None`` when the
    cardinality guard chose the window fallback (callers that need
    per-group totals then compute them windowed too, never as an
    O(groups) driver/broadcast structure)."""
    if on_many_groups not in ("window", "error"):
        raise ValueError(
            f"on_many_groups must be 'window' or 'error', got {on_many_groups!r}"
        )
    gk = _group_key_expr(group_cols)

    def _too_many(n_groups, frame):
        # `frame` must already carry __gkey
        if on_many_groups == "error":
            raise RuntimeError(
                f"grouped_row_number: ~{n_groups} distinct groups exceeds "
                f"max_groups={max_groups}; the driver-side stitch would "
                "collect O(groups) rows. Raise max_groups only if the "
                "driver can hold that, or use on_many_groups='window'."
            )
        warnings.warn(
            f"grouped_row_number: ~{n_groups} distinct groups > "
            f"max_groups={max_groups}; falling back to "
            "Window.partitionBy (numerous small groups hash-partition "
            "fine; the range-shuffle plan is for few hot groups).",
            stacklevel=4,
        )
        w = Window.partitionBy("__gkey").orderBy(*[F.col(c) for c in order_cols])
        return frame.withColumn(
            pos_col, (F.row_number().over(w) - F.lit(1)).cast("long")
        )

    if num_groups_hint is not None and int(num_groups_hint) > max_groups:
        return _too_many(int(num_groups_hint), df.withColumn("__gkey", gk)), None
    n = _num_partitions(df, num_partitions)
    part = (
        df.repartitionByRange(n, *[F.col(c) for c in group_cols + order_cols])
        .sortWithinPartitions(*(group_cols + order_cols))
        .withColumn("__gkey", gk)
        .withColumn("__gpid", F.spark_partition_id().cast("long"))
        .withColumn(
            "__lpos", F.monotonically_increasing_id().bitwiseAND(F.lit(_MID_MASK))
        )
        .localCheckpoint(eager=False)
    )
    if num_groups_hint is None:
        approx = part.agg(F.approx_count_distinct("__gkey").alias("g")).collect()[0][
            "g"
        ]
        if approx > max_groups:
            # exact recheck only when the estimate crosses the cap
            exact = part.agg(F.countDistinct("__gkey").alias("g")).collect()[0]["g"]
            if exact > max_groups:
                fb = _too_many(exact, part)
                return fb.drop("__gpid", "__lpos"), None
    # one small job: per-(partition, group-run) count and local start.
    stats = (
        part.groupBy("__gpid", "__gkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("__lpos").alias("start"),
            F.max("__lpos").alias("end"),
        )
        .collect()
    )
    # group runs sorted by (pid, local start) == global group/order sort.
    stats.sort(key=lambda r: (r["__gpid"], r["start"]))
    # layout guard: group runs are contiguous under the sort, so their
    # [start, end] counter spans must tile each partition as exactly
    # 0..partition_count-1; any gap/overlap means the id contract drifted.
    run_pos = 0
    prev_pid = None
    for r in stats:
        if r["__gpid"] != prev_pid:
            prev_pid, run_pos = r["__gpid"], 0
        if r["start"] != run_pos or r["end"] != run_pos + r["cnt"] - 1:
            raise RuntimeError(
                "monotonically_increasing_id layout drift detected in "
                f"partition {r['__gpid']}: group run spans counters "
                f"[{r['start']}, {r['end']}] for {r['cnt']} rows where "
                f"[{run_pos}, {run_pos + r['cnt'] - 1}] was expected. "
                "Spark's record-index contract changed; grouped row "
                "numbering would be corrupt."
            )
        run_pos += r["cnt"]
    seen: dict[str, int] = {}
    adj = []
    for r in stats:
        goff = seen.get(r["__gkey"], 0)
        adj.append((r["__gpid"], r["__gkey"], goff - r["start"]))
        seen[r["__gkey"]] = goff + r["cnt"]
    spark = df.sparkSession
    adj_df = spark.createDataFrame(
        adj or [(0, "", 0)], "__gpid long, __gkey string, __adj long"
    )
    out = (
        part.join(F.broadcast(adj_df), ["__gpid", "__gkey"], "left")
        .withColumn(pos_col, F.col("__lpos") + F.coalesce(F.col("__adj"), F.lit(0)))
        .drop("__gpid", "__lpos", "__adj")
    )
    return out, dict(seen)


def ntile_global(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Equi-depth binning with exact SQL ``ntile(n) OVER (ORDER BY
    order_cols)`` semantics — bucket 1..n, first ``N mod n`` buckets
    one row larger — but WITHOUT the single-task global window that
    ``Window.orderBy`` forces (ntile needs a total order, so the
    window form funnels the whole table through one task; at 100 TB
    that is the canonical scale wall for equi-depth histograms /
    quantile bucketing).

    One range shuffle via ``global_row_number``; the bucket is pure
    arithmetic on the global position (ntile's remainder rule:
    ``base = N div n`` rows per bucket, the first ``rem = N mod n``
    buckets get one extra). ``order_cols`` must be a total order (add
    a unique id as tiebreak) — same contract as the SQL form needs for
    a deterministic result. Fully oracle-gradable against any engine's
    ``ntile``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # the numbering job's per-partition counts already yield N — no
    # second count job for the remainder rule
    pos, n_rows = _global_row_number_with_total(
        df, order_cols, "__ntpos", num_partitions
    )
    base, rem = divmod(n_rows, n)
    cut = rem * (base + 1)
    if base == 0:
        # fewer rows than buckets: one row per bucket, pos+1 == tile
        tile = F.col("__ntpos") + F.lit(1)
    else:
        # INTEGER `div`, same as _NTILE_SQL below: double-precision
        # floor(x / y) can round the wrong way once x approaches 2^53
        # (~2^44-row buckets) — this global form is the one pitched at
        # 100 TB, so it uses the exact formulation, not just the
        # grouped variant
        tile = F.when(
            F.col("__ntpos") < F.lit(cut),
            F.expr(f"__ntpos div {base + 1}") + F.lit(1),
        ).otherwise(
            F.lit(rem) + F.expr(f"(__ntpos - {cut}) div {base}") + F.lit(1)
        )
    return pos.withColumn(tile_col, tile.cast("int")).drop("__ntpos")


def rank_ensemble(
    df: DataFrame,
    id_col: str,
    signals: list[tuple[str, bool]],
    keep_frac: float = 0.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rank-based quality-signal ensembling — the FineWeb/Gopher-style
    "blend several cheap quality filters" step done in RANK space, so
    signals on wildly different scales (token counts vs ratios vs NLL)
    combine without any normalization constants to tune: each signal
    contributes its global 1-based rank (1 = best), documents are
    ordered by the integer rank SUM, and the best ``keep_frac``
    fraction is flagged ``keep``.

    ``signals`` is ``[(numeric column name, higher_is_better)]`` on
    ``df``. Rows with a NULL in any signal are EXCLUDED (they cannot
    be ranked; filter or impute upstream). Output:
    ``(id_col, rank_<signal>... , rank_sum, keep)`` — every value an
    integer or boolean, so the operator is exactly oracle-able against
    any engine's ``row_number()`` windows with zero float-comparison
    risk (the only float step, ``ceil(keep_frac * N)``, is the same
    two IEEE ops in any engine).

    Scale shape: one range shuffle per signal plus one for the final
    order (``global_row_number`` — never a single-task
    ``Window.orderBy``), then S equi-joins on the id. S is the number
    of signals (2-5 in practice), so the plan is S+1 sorts of an
    (id, value) projection — each shuffle carries two columns, not the
    corpus. Ranks tie-break on the id, making every rank, the sum, and
    the cut deterministic and engine-independent.
    """
    import math

    if not signals:
        raise ValueError("signals must be non-empty")
    names = [s for s, _ in signals]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate signal columns: {names}")
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    base = df.select(id_col, *names).dropna(subset=names)
    out = None
    for sig, higher_is_better in signals:
        # a total order per signal: (value, id); higher-is-better
        # ranks by the negated value (exact for ints and IEEE floats)
        ordered = base.select(
            id_col,
            (-F.col(sig) if higher_is_better else F.col(sig)).alias("__ord"),
        )
        ranked = global_row_number(
            ordered, ["__ord", id_col], "__r", num_partitions
        ).select(id_col, (F.col("__r") + 1).alias(f"rank_{sig}"))
        out = ranked if out is None else out.join(ranked, id_col)
    rank_sum = sum(F.col(f"rank_{s}") for s in names).cast("long")
    summed = out.withColumn("rank_sum", rank_sum)
    fin, n_rows = _global_row_number_with_total(
        summed, ["rank_sum", id_col], "__fin", num_partitions
    )
    # ceil(keep_frac * N): both this driver-side Python and a SQL
    # oracle's ceil(frac * count) run the identical IEEE multiply +
    # ceil, so the cut index matches bit-for-bit by construction
    threshold = math.ceil(keep_frac * n_rows)
    return fin.withColumn(
        "keep", (F.col("__fin") + 1) <= F.lit(threshold)
    ).drop("__fin")


#: exact SQL-ntile bucket from a 0-based position `__ntgpos` and the
#: group total `__ntgc` — INTEGER `div` throughout (double-precision
#: floor(x / y) can round the wrong way past ~2^40-row groups):
#: base = cnt div n rows per bucket, the first rem = cnt mod n buckets
#: one row larger; with fewer rows than buckets, pos+1 IS the bucket.
_NTILE_SQL = """CAST(CASE
  WHEN __ntgc < {n} THEN __ntgpos + 1
  WHEN __ntgpos < (__ntgc % {n}) * (__ntgc div {n} + 1)
    THEN __ntgpos div (__ntgc div {n} + 1) + 1
  ELSE (__ntgc % {n})
    + (__ntgpos - (__ntgc % {n}) * (__ntgc div {n} + 1)) div (__ntgc div {n})
    + 1
END AS INT)"""


def ntile_by_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
    max_groups: int = 100_000,
    on_many_groups: str = "window",
    num_groups_hint: int | None = None,
) -> DataFrame:
    """Per-group equi-depth binning with exact ``ntile(n) OVER
    (PARTITION BY group ORDER BY order)`` semantics, skew-free: the
    rank comes from the grouped-row-number range shuffle (a hot group
    spans many partitions instead of one window task) and the
    per-group totals are the exact counts that stitch ALREADY
    collected — no extra count job, and the broadcast size table is
    genuinely bounded by the cardinality guard, because when the guard
    chooses the window fallback (numerous small groups) the tile is
    computed by ``F.ntile`` over that same window and NO per-group
    structure is ever built.  ``group_cols + order_cols`` must be a
    total order; ``on_many_groups="error"`` opts out of the fallback.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    out, counts = _grouped_row_number_impl(
        df,
        group_cols,
        order_cols,
        "__ntgpos",
        num_partitions,
        max_groups,
        on_many_groups,
        num_groups_hint,
    )
    if counts is None:
        # window-fallback regime: same window computes the tile (the
        # engine evaluates both functions in one pass over the sort)
        w = Window.partitionBy("__gkey").orderBy(*[F.col(c) for c in order_cols])
        return out.withColumn(tile_col, F.ntile(n).over(w)).drop(
            "__gkey", "__ntgpos"
        )
    spark = df.sparkSession
    sizes = spark.createDataFrame(
        list(counts.items()) or [("", 0)], "__gkey string, __ntgc long"
    )
    return (
        out.join(F.broadcast(sizes), "__gkey", "left")
        .withColumn(tile_col, F.expr(_NTILE_SQL.format(n=int(n))))
        .drop("__gkey", "__ntgpos", "__ntgc")
    )


def allocate_mixture(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder allocation of ``total`` rows across domains
    proportional to ``weights`` (floats, any positive scale).  Exact:
    the returned counts sum to ``total``.  Deterministic tie-break by
    (remainder desc, domain name)."""
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    quotas = {k: total * (w / wsum) for k, w in weights.items()}
    alloc = {k: int(q) for k, q in quotas.items()}
    leftover = total - sum(alloc.values())
    by_rem = sorted(quotas, key=lambda k: (-(quotas[k] - alloc[k]), k))
    for k in by_rem[:leftover]:
        alloc[k] += 1
    return alloc


def _dhondt_allocate_loop(
    counts: dict[str, int], total: int, tau: float = 0.5
) -> dict[str, int]:
    """Seat-at-a-time D'Hondt reference: grant ``total`` seats one by
    one to the domain maximizing ``n^tau / (k+1)`` (k = seats held),
    ties to the lexicographically smaller domain.  O(total * domains)
    — RETAINED ONLY as the differential-test oracle for
    :func:`dhondt_allocate` (which computes the identical allocation
    in O(domains * log) via divisor bisection); production callers go
    through :func:`dhondt_allocate` / :func:`temperature_targets`.
    """
    alloc = {k: 0 for k in counts}
    if not counts:
        return alloc
    domains = sorted(counts)
    for _ in range(int(total)):
        best = domains[0]
        for d in domains[1:]:
            if tau == 0.5:
                # exact cross-multiplied sqrt comparison (ints only)
                better = counts[d] * (alloc[best] + 1) ** 2 > counts[best] * (
                    alloc[d] + 1
                ) ** 2
            else:
                better = (
                    counts[d] ** tau / (alloc[d] + 1)
                    > counts[best] ** tau / (alloc[best] + 1)
                )
            if better:
                best = d
        alloc[best] += 1
    return alloc


def _float_key(x: float) -> int:
    """Monotone int encoding of a positive double (IEEE-754 ordering:
    for x, y > 0, x < y iff key(x) < key(y)) — lets the generic-tau
    path bisect over the FINITE float grid instead of pretending the
    reals are searchable."""
    return struct.unpack("<q", struct.pack("<d", x))[0]


def _key_float(k: int) -> float:
    return struct.unpack("<d", struct.pack("<q", k))[0]


def dhondt_allocate(
    counts: dict[str, int], total: int, tau: float = 0.5
) -> dict[str, int]:
    """Highest-averages (D'Hondt) allocation of ``total`` seats across
    domains with weights ``counts[d]^tau``, bit-identical to the
    seat-at-a-time loop (ties to the lexicographically smaller domain)
    but SUBLINEAR IN ``total``: O(domains * log(total * resolution))
    comparisons via divisor bisection, so real training-mixture totals
    (1e6–1e9 sequence slots) allocate in milliseconds instead of the
    loop's minutes-to-never.

    Method: the allocation is the ``total`` largest values of the grid
    ``{n_d^tau / j : j >= 1}``.  For a threshold value v, domain d has
    ``#{j : n_d^tau / j >= v}`` grid values above it — a closed-form
    floor at tau=0.5, a per-domain binary search otherwise — so the
    count-above-threshold function is cheap and monotone, and the
    total-th largest grid value is found by bisection.  Seats strictly
    above that value are granted outright; the remaining (<= domains)
    boundary seats are exact ties and are granted in lexicographic
    domain order, each domain taking its full equal-value run before
    the next — precisely the loop's tie behavior.

    At the default ``tau=0.5`` every comparison is EXACT integer
    arithmetic: thresholds live on the integer grid ``m / M`` with
    ``M = 4*max(n)^2 + 1`` chosen so distinct grid rationals
    ``j^2 / n_d`` (which differ by >= 1/max(n)^2) never share a cell,
    and the count above ``sqrt(M/m)``-ish thresholds is
    ``isqrt(n_d * m // M)`` — no float anywhere, bit-reproducible
    across engines.  Other ``tau`` values bisect over the float grid
    itself (``_float_key``), reproducing the loop's float-division
    comparisons EXACTLY — including values that collapse to equal
    doubles — deterministic on any IEEE-754 driver.
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    alloc = {k: 0 for k in counts}
    if not counts or total == 0:
        return alloc
    total = int(total)
    domains = sorted(counts)
    if any(counts[d] <= 0 for d in domains):
        raise ValueError("domain counts must be positive")
    if tau == 0.5:
        n = {d: int(counts[d]) for d in domains}
        # resolution: distinct exact grid values j^2/n differ by at
        # least 1/max(n)^2, so cells of width 1/M hold at most one
        # distinct value (= one exact-tie class)
        big = max(n.values())
        M = 4 * big * big + 1

        def seats(m: int) -> dict[str, int]:
            # #{j >= 1 : j^2/n_d <= m/M} = isqrt(floor(n_d*m/M))
            return {d: math.isqrt(n[d] * m // M) for d in domains}

        def tot(m: int) -> int:
            return sum(math.isqrt(n[d] * m // M) for d in domains)

        # bracket then bisect the smallest m with tot(m) >= total; an
        # INTEGER estimate of the divisor seeds hi (doubling repairs
        # any underestimate) — all-int so the documented "no float
        # anywhere" contract holds even for counts past 2^1024, where
        # math.sqrt raises OverflowError (review find, round 13)
        sq = sum(math.isqrt(x) for x in n.values())  # >= 1: counts > 0
        hi = M * (2 * ((total * total) // (sq * sq)) + 1)
        while tot(hi) < total:
            hi *= 2
        lo = 1
        while lo < hi:
            mid = (lo + hi) // 2
            if tot(mid) >= total:
                hi = mid
            else:
                lo = mid + 1
        ge = seats(lo)  # includes the boundary-value tie class
        gt = seats(lo - 1)  # strictly above the boundary value
    else:
        a = {d: float(counts[d]) ** tau for d in domains}
        if not all(math.isfinite(x) and x > 0 for x in a.values()):
            raise ValueError(
                f"counts**tau must be finite and positive for every "
                f"domain (tau={tau}); got a non-finite or zero weight"
            )

        def seats_d(d: str, v: float) -> int:
            # largest j in [0, total] with float(a_d / j) >= v; float
            # division by a growing positive int is monotone
            # non-increasing, so binary search is exact w.r.t. the
            # loop's own float comparisons.  Capped at ``total``: no
            # domain can hold more seats than exist.
            ad = a[d]
            if ad < v:
                return 0
            if ad / total >= v:
                return total
            j_lo, j_hi = 1, total  # a/j_lo >= v > a/j_hi
            while j_hi - j_lo > 1:
                j_mid = (j_lo + j_hi) // 2
                if ad / j_mid >= v:
                    j_lo = j_mid
                else:
                    j_hi = j_mid
            return j_lo

        def tot_v(v: float) -> int:
            return sum(seats_d(d, v) for d in domains)

        v_hi = max(a.values())  # the largest grid value (j=1)
        v_lo = min(a.values()) / total
        while v_lo > 5e-324 and tot_v(v_lo) < total:
            v_lo /= 2  # float-rounding insurance; at the smallest
            # subnormal every a_d/j >= v_lo, so tot = domains*total
        k_lo, k_hi = _float_key(v_lo), _float_key(v_hi)
        if tot_v(v_hi) >= total:
            k_lo = k_hi  # threshold is the max value itself
        while k_hi - k_lo > 1:
            k_mid = (k_lo + k_hi) // 2
            if tot_v(_key_float(k_mid)) >= total:
                k_lo = k_mid
            else:
                k_hi = k_mid
        v_star = _key_float(k_lo)
        v_next = math.nextafter(v_star, math.inf)
        ge = {d: seats_d(d, v_star) for d in domains}
        gt = {d: seats_d(d, v_next) for d in domains}
    # grant everything strictly above the threshold, then hand out the
    # boundary ties in lexicographic domain order (the loop grants a
    # tied average to the lex-smaller domain, and a domain whose
    # consecutive averages collapse to the same value keeps winning
    # until its run is exhausted)
    remaining = total - sum(gt.values())
    for d in domains:
        if remaining <= 0:
            break
        take = min(ge[d] - gt[d], remaining)
        gt[d] += take
        remaining -= take
    assert remaining == 0, "dhondt_allocate: boundary distribution bug"
    for d in domains:
        alloc[d] = gt[d]
    return alloc


def temperature_targets(
    df: DataFrame, domain_col: str, total: int, tau: float = 0.5
) -> dict[str, int]:
    """Temperature-based mixture targets: allocate ``total`` rows
    across domains proportional to ``count^tau`` — the standard
    multilingual/domain sampling rule (tau=1 is proportional, tau=0 is
    uniform; tau in between up-samples small domains). Feed the result
    straight to :func:`mix_corpus`.

    Allocation is HIGHEST-AVERAGES (D'Hondt): the ``total`` largest
    values of the grid ``{n_d^tau / j : j >= 1}``, ties to the
    lexicographically smaller domain — which is how the SQL oracle
    states it.  Computed by :func:`dhondt_allocate` (divisor
    bisection, O(domains * log) — NOT seat-at-a-time), so ``total``
    may be a real training-mixture size (1e6–1e9 sequence slots)
    without a driver wall.  At the default ``tau=0.5`` every
    comparison is exact integer arithmetic (no float anywhere), so
    the allocation is bit-reproducible across engines (the
    fold-order-free exactness discipline of the DSIR decimal scores).
    Other ``tau`` values use float comparisons — deterministic on the
    driver, but not cross-engine-exact.

    Driver-side by design: one ``groupBy(domain).count()`` collect —
    bounded by the DOMAIN count (a mixture spec is human-sized), never
    by rows. NULL domains are excluded (``mix_corpus`` drops them
    anyway). A domain's target may exceed its row count when ``total``
    is large; ``mix_corpus`` then keeps all of its rows (documented
    there).
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    rows = (
        df.where(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .count()
        .collect()
    )
    counts = {str(r[domain_col]): int(r["count"]) for r in rows}
    return dhondt_allocate(counts, total, tau)


def mix_corpus(
    df: DataFrame,
    domain_col: str,
    targets: dict[str, int],
    key_cols: list[str],
    seed: int = 42,
    rank_col: str = "mix_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact domain-weighted mixture: per domain, keep the first
    ``targets[domain]`` rows in deterministic ``md5(seed | key_cols)``
    order (domains absent from ``targets`` contribute nothing; a
    domain with fewer rows than its target contributes all of them).

    This is the "data mixing" step of a training pipeline — sample
    each source to its target share, reproducibly — in one range
    shuffle via ``grouped_row_number`` (no per-domain single-task
    window).  Use ``allocate_mixture`` to turn float mixture weights
    into integer targets.  Adds ``rank_col`` (0-based within-domain
    rank in the shuffled order).  ``key_cols`` must be unique and
    non-NULL (same md5-order contract as ``global_shuffle``); NULL
    domains are safe (grouped_row_number's key encoding) but match no
    target, so they are dropped.
    """
    for k, v in targets.items():
        if v < 0:
            raise ValueError(f"negative target for {k!r}: {v}")
    if not targets:
        # empty mixture = empty result; also sidesteps the zero-arg
        # F.create_map() literal, whose typing is engine-version
        # sensitive.
        return df.withColumn(rank_col, F.lit(0).cast("long")).where(F.lit(False))
    keyed = df.withColumn(
        "__mord",
        F.md5(
            F.concat_ws(
                "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
            )
        ),
    )
    ranked = grouped_row_number(
        keyed, [domain_col], ["__mord"], rank_col, num_partitions
    )
    tmap = F.create_map(
        *[F.lit(x) for kv in sorted(targets.items()) for x in kv]
    )
    # explicit string cast: map keys are strings; a non-string domain
    # column would otherwise rely on implicit-cast lookup semantics.
    out = ranked.where(
        F.col(rank_col) < F.coalesce(tmap[F.col(domain_col).cast("string")], F.lit(0))
    )
    return out.drop("__mord")


def write_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int = 8,
    seed: int = 42,
    fmt: str = "parquet",
    mode: str = "overwrite",
    keep_order_col: bool = False,
) -> None:
    """Materialize a deterministic epoch shuffle as per-shard training
    files: ``global_shuffle`` then write hive-partitioned by
    ``__shard`` (``path/__shard=K/``), each shard sorted by ``__pos``
    so a reader streaming one shard sees the corpus in the shuffled
    order.  Shards are balanced to within one row (round-robin over
    the permutation), so data-parallel trainers reading one shard per
    worker stay load-balanced.

    Re-running with the same seed reproduces the layout bit-for-bit;
    a new seed is a new epoch.  The write repartitions ON the shard
    column first (one task per shard — no tasks x shards small-file
    explosion; shard count chooses the write parallelism).
    ``keep_order_col`` retains ``__ord`` for audits; ``__pos`` is
    always written (readers use it for resumable offsets).
    """
    out = global_shuffle(df, key_cols, n_shards, seed)
    if not keep_order_col:
        out = out.drop("__ord")
    (
        # RANGE partition on the shard id: hash repartition would send
        # pmod(murmur3(k), n) collisions of the n small ints to one
        # task, leaving some write slots idle — range boundaries over n
        # distinct values give the documented one-task-per-shard layout
        out.repartitionByRange(n_shards, F.col("__shard"), F.col("__pos"))
        .sortWithinPartitions("__shard", "__pos")
        .write.format(fmt)
        .partitionBy("__shard")
        .mode(mode)
        .save(path)
    )
