"""Vectorized skyline (Pareto-frontier) kernel.

Pure NumPy — no Spark imports — so it can be unit-tested standalone and
shipped to executors inside ``applyInPandas`` closures.

Semantics mirror the reference's dominance test and block-nested-loop
(reference: src/utils/functions.py:6-27 ``is_dominated`` and
src/utils/functions.py:29-54 ``find_skyline``):

* point ``p`` is dominated by ``q`` iff ``q`` is at-least-as-good in
  EVERY dimension and strictly better in AT LEAST ONE (per-dimension
  MIN/MAX senses);
* a point equal to ``p`` in all dimensions does NOT dominate it — exact
  duplicates are all kept by the kernel (the reference collapses them
  because its skyline is a ``set`` of tuples; callers that want that
  behavior apply ``dropDuplicates``/``DISTINCT`` on top).

The implementation is not a straight translation: instead of the
reference's tuple-at-a-time Python loop, we

1. map all dimensions into "min-space" (negate MAX dims) as one float64
   matrix,
2. pre-prune with a few pivot passes (each pivot is a guaranteed
   skyline point; everything it dominates dies in one vectorized sweep),
3. run a single-pass incremental BNL over the survivors in ascending
   dimension-sum order — in that order a later point can never dominate
   an earlier kept one (dominance implies a strictly smaller sum), so
   the kept set only grows and one pass suffices.
"""

from __future__ import annotations

import numpy as np

__all__ = ["to_min_space", "find_skyline_mask", "skyline_of_array"]

#: senses accepted for each dimension
MIN, MAX = "min", "max"


def to_min_space(values, sense: str) -> np.ndarray:
    """Convert one dimension to float64 "smaller is better" space.

    Handles numeric dtypes and datetime64 (converted to microseconds
    since epoch, which stays exactly representable in float64 until
    year ~2255). MAX dims are negated.
    """
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.datetime64):
        arr = arr.astype("datetime64[us]").astype(np.int64)
    arr = arr.astype(np.float64, copy=False)
    if sense == MAX:
        arr = -arr
    elif sense != MIN:
        raise ValueError(f"sense must be 'min' or 'max', got {sense!r}")
    return arr


def _min_matrix(cols, senses) -> np.ndarray:
    if len(cols) != len(senses):
        raise ValueError("cols and senses length mismatch")
    return np.column_stack([to_min_space(c, s) for c, s in zip(cols, senses)])


def find_skyline_mask(cols, senses, prune_rounds: int = 8) -> np.ndarray:
    """Boolean keep-mask (original row order) of the skyline.

    Parameters
    ----------
    cols : sequence of 1-D arrays/Series, one per skyline dimension
    senses : sequence of 'min' | 'max', same length as ``cols``
    prune_rounds : pivot pre-prune passes before the BNL (0 disables)
    """
    a = _min_matrix(cols, senses)
    n, d = a.shape
    mask = np.zeros(n, dtype=bool)
    if n == 0:
        return mask

    order = np.argsort(a.sum(axis=1), kind="stable")
    s = a[order]  # rows in ascending sum order

    alive = np.ones(n, dtype=bool)
    # Pivot pre-prune: the first alive row in sum order is a guaranteed
    # skyline point (any dominator would have a smaller sum and, by
    # transitivity, would have killed this row already). One vectorized
    # sweep removes everything it dominates.
    start = 0
    for _ in range(prune_rounds):
        while start < n and not alive[start]:
            start += 1
        if start >= n:
            break
        p = s[start]
        ge = (s >= p).all(axis=1)
        gt = (s > p).any(axis=1)
        dead = ge & gt
        alive &= ~dead
        start += 1

    # Incremental BNL over survivors, ascending sum order: kept set only
    # grows, each candidate is checked against current kept rows.
    idx_alive = np.nonzero(alive)[0]
    kept_rows = np.empty((len(idx_alive), d), dtype=np.float64)
    k = 0
    kept_src = []
    for i in idx_alive:
        p = s[i]
        K = kept_rows[:k]
        le = (K <= p).all(axis=1)
        if le.any() and (K[le] < p).any(axis=1).any():
            continue
        kept_rows[k] = p
        k += 1
        kept_src.append(i)

    mask[order[np.asarray(kept_src, dtype=np.int64)]] = True
    return mask


def skyline_of_array(cols, senses) -> np.ndarray:
    """Return the (n_skyline, d) min-space matrix of skyline rows
    (mainly for tests)."""
    a = _min_matrix(cols, senses)
    return a[find_skyline_mask(cols, senses)]
