"""Skew-mitigated equi-join (north-star extension; no counterpart in
the reference, which has no joins at all — SURVEY.md §2.3).

At 100 TB a handful of hot keys (null-ish users, default IDs, crawler
domains) can put most of a shuffle into one task. AQE's skew-join
splits oversized *partitions* after the fact; explicit salting splits
oversized *keys* before the shuffle and is the standard fix when one
key alone exceeds an executor. This module implements the classic
replicate-and-salt scheme as a pure DataFrame composition:

- fact side: each row gets ``__salt = pmod(xxhash64(all columns), n)``
  — deterministic (re-runs and retries agree), key-independent, so one
  hot key's rows spread over ``n`` shuffle partitions;
- dim side: each row is replicated ``n`` times via a posexplode over
  ``sequence(0, n-1)`` (rows × n, so keep the dim side the smaller
  one);
- join on ``keys + [__salt]``: every fact row still matches each dim
  row exactly once (on its own salt value), so the result is row-for-
  row identical to the plain join, multiplicities included.

Supported join types: inner and left_outer (the fact side must be the
left side — those are the shapes where fact-side skew hurts).
``skew_stats``/``heavy_hitters`` (operators/diagnostics.py) provide the
numbers for choosing ``n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` (large, possibly key-skewed) with ``dim``
    (small enough to replicate ``n_salts`` times) on ``keys``,
    spreading each fact key across ``n_salts`` shuffle partitions.

    Returns ``fact.join(dim, keys, how)`` exactly — same rows, same
    multiplicities — with the hot-key partition split ``n_salts`` ways.
    Join columns follow Spark's USING semantics (one copy of each key
    column); the salt column never escapes.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    missing_f = [k for k in keys if k not in fact.columns]
    missing_d = [k for k in keys if k not in dim.columns]
    if missing_f or missing_d:
        raise ValueError(
            f"join keys missing: fact={missing_f} dim={missing_d}"
        )
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"how={how!r}; salted_join supports inner/left_outer with the "
            "skewed fact side on the left"
        )
    if _SALT in fact.columns or _SALT in dim.columns:
        raise ValueError(f"{_SALT} column already present")

    # deterministic per-row salt from the full row content: task
    # retries recompute the same value, unlike rand() (nondeterministic
    # expressions can double-count rows when a shuffle partition is
    # recomputed). Known limitation: rows IDENTICAL in every column
    # share a salt, so a hot key made of pure duplicate filler rows is
    # not spread — add any distinguishing column (ingest offset,
    # monotonic id materialized at ingest) to the fact schema to
    # restore the spread; the join RESULT is correct either way.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast(
        "int"
    )
    salted_fact = fact.withColumn(_SALT, salt)
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(replicated_dim, keys + [_SALT], how)
    return joined.drop(_SALT)
