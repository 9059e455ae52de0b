"""Keyed merge / upsert (north-star extension; the reference's only
mutation model is append-only Kafka topics).

``merge_upsert`` is the batch building block of every incremental
pipeline: apply a (small) batch of updated rows to a (huge) current
snapshot by key — the relational core of ``MERGE INTO`` /
Delta-style upserts, as a pure DataFrame composition:

- dedup the UPDATE side to one row per key (latest by ``order_col``,
  deterministic tie-break) — a window over the update batch only,
  never over the snapshot;
- anti-join the snapshot against the update keys — with a typical
  update batch this broadcasts a key list and the 100 TB side is
  touched by a map-side broadcast anti-join, zero shuffle;
- union the surviving snapshot rows with the deduped updates.

The snapshot is never window-sorted and never shuffled when the update
side is broadcastable — the property that makes this viable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["merge_upsert", "scd2_history", "snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """Keyed diff between two corpus/table snapshots — the planning
    primitive of every incremental pipeline (which documents must be
    re-embedded / re-deduped / re-scored since the last run?). Returns
    one row per key present in either side: ``(*keys, status)`` with
    ``status`` in ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, compared columns differ), ``unchanged``.

    ``compare_cols`` defaults to every shared non-key column. The
    comparison is null-safe per column (``<=>``), so NULL -> value and
    value -> NULL both count as changed while NULL -> NULL does not.
    All-string/integer output: exactly oracle-able (ANSI SQL ``IS NOT
    DISTINCT FROM``) with zero float caveats beyond the columns the
    caller chooses to compare.

    Duplicate keys within a snapshot would fan the full-outer join out
    and break the one-row-per-key contract with conflicting statuses,
    so both sides are checked LOUDLY by default (the module convention
    — ``merge_upsert`` and ``scd2_history`` both raise on ambiguous
    keys). The check is one keyed aggregate per side; pass
    ``assume_unique=True`` to skip it when the snapshots are known
    key-unique (primary-keyed tables — the 100 TB fast path).

    Scale shape: ONE full outer join on the keys — the unavoidable
    shuffle, carrying only the keys and compared columns (project
    before joining); everything else is a per-row expression. For the
    usual "small delta against a huge base" case, prefer
    ``merge_upsert``'s anti-join shape to APPLY a known delta; this
    operator is for DISCOVERING the delta when only the two snapshots
    exist."""
    if not keys:
        raise ValueError("keys must be non-empty")
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"key column {k!r} must exist in both snapshots")
    if not assume_unique:
        for side, d_ in (("old", old), ("new", new)):
            dup = (
                d_.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"duplicate keys in {side} snapshot (e.g. "
                    f"{tuple(dup[0][:-1])}); snapshot_diff requires one row "
                    "per key — pre-aggregate, or pass assume_unique=True "
                    "only if the duplication is impossible"
                )
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in new.columns and c not in keys
        ]
    for c in compare_cols:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"compare column {c!r} must exist in both snapshots")
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def scd2_history(
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build a slowly-changing-dimension (type 2) history from an
    update log: every version of a key gets a validity interval
    ``[valid_from, valid_to)`` — ``valid_to`` NULL (and
    ``is_current`` true) for the newest version. The as-of-queryable
    form every warehouse keeps for dimensions; the interval output
    composes directly with ``range_join``/``asof_join`` for
    point-in-time lookups.

    One window per key ordered by ``ts_col`` (``lead`` for the closing
    timestamp) — a single shuffle on the key, no global sort. Ties on
    ``(keys, ts_col)`` are rejected loudly: two versions of one key at
    the same instant have no well-defined order, and silently picking
    one corrupts history.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    missing = [c for c in (*keys, ts_col) if c not in updates.columns]
    if missing:
        raise ValueError(f"columns {missing} not in DataFrame columns")
    for c in (valid_from, valid_to, current_col):
        if c in updates.columns:
            raise ValueError(f"output column {c!r} already present")
    dup = (
        updates.groupBy(*keys, ts_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate (key, {ts_col}) version (e.g. {tuple(dup[0][:-1])}); "
            "history order would be undefined"
        )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, nxt)
        .withColumn(current_col, nxt.isNull())
    )


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    delete_col: str | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Return ``current`` with ``updates`` applied by ``keys``:
    updated keys take the update row, new keys are inserted, untouched
    keys pass through.

    Both sides must share a schema (same columns, any order). If the
    update batch can contain several rows per key, ``order_col`` picks
    the winner (highest value; remaining ties broken deterministically
    by the remaining columns) — without ``order_col`` duplicate update
    keys are rejected loudly rather than resolved arbitrarily.

    ``delete_col`` names an optional boolean column on ``updates``
    (NOT part of the shared schema): rows where it is true tombstone
    their key — the key disappears from the result.

    ``broadcast_updates=True`` (default) hints the update key list to
    broadcast — right for the typical small batch, but Spark honors
    the hint regardless of size, so pass False for backfill-scale
    batches (the anti-join then plans an ordinary shuffle join).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    up_cols = [c for c in updates.columns if c != delete_col]
    if set(current.columns) != set(up_cols):
        raise ValueError(
            f"schemas differ: current={sorted(current.columns)} "
            f"updates={sorted(up_cols)} (delete_col excluded)"
        )
    missing = [k for k in keys if k not in current.columns]
    if missing:
        raise ValueError(f"keys {missing} not in columns {current.columns}")
    if order_col is not None and order_col not in up_cols:
        raise ValueError(f"order_col {order_col!r} not in update columns")
    if delete_col is not None and delete_col not in updates.columns:
        raise ValueError(f"delete_col {delete_col!r} not in update columns")

    # one winner per update key (window over the update batch only)
    if order_col is not None:
        tiebreak = [c for c in up_cols if c not in keys and c != order_col]
        if delete_col is not None:
            # a delete and an update tying on order_col (and all data
            # columns) must still resolve deterministically: delete wins
            tiebreak = [delete_col, *tiebreak]
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc_nulls_last() for c in tiebreak]
        )
        deduped = (
            updates.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        dup = (
            updates.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"duplicate update keys (e.g. {tuple(dup[0][:-1])}); pass "
                "order_col= to pick a winner"
            )
        deduped = updates

    # the huge side is only ever anti-joined against the update KEYS —
    # broadcast when the batch is small, so the snapshot never shuffles.
    # No dropDuplicates here: keys are already unique after the
    # latest-wins window (or the loud duplicate check), and the extra
    # dedup would cost a second shuffle of the batch
    upd_keys = deduped.select(*keys)
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    untouched = current.join(upd_keys, keys, "left_anti")
    if delete_col is not None:
        deduped = deduped.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return untouched.unionByName(deduped.select(*current.columns))
