"""ANSI-SQL oracle builders (DuckDB-runnable) for the driver's
correctness gate.

The skyline oracle is the textbook ``NOT EXISTS`` dominance anti-join
(SURVEY.md §5.1), but evaluated two-phase — per-block local skylines via
a ``row_number() % G`` blocking key, then a global pass over the few
survivors — because the naive O(n^2) anti-join takes ~18s on 60k rows in
DuckDB while this exact-equivalent form takes ~2s. Correct for the same
reason the engine's partial/final aggregation is: dominance is
transitive, so any point dominated in the full set is dominated by some
member of its block's skyline, and the global pass over the union of
block skylines removes the rest.
"""

from __future__ import annotations

__all__ = ["skyline_oracle_sql"]


def skyline_oracle_sql(
    table: str,
    dims: list[tuple[str, str]],
    groups: int = 128,
    where: str | None = None,
    by: list[str] | None = None,
) -> str:
    """``by`` adds grouped-skyline semantics: dominance restricted to
    rows with equal ``by`` columns (mirrors ``skyline(..., by=...)``)."""
    by = list(by or ())
    out_cols = ", ".join([*by, *(c for c, _ in dims)])
    le = " AND ".join(
        [f"q.{c} = p.{c}" for c in by]
        + [f"q.{c} {'<=' if s == 'min' else '>='} p.{c}" for c, s in dims]
    )
    lt = " OR ".join(f"q.{c} {'<' if s == 'min' else '>'} p.{c}" for c, s in dims)
    where_clause = f"WHERE {where}" if where else ""
    order = ", ".join([*by, *(c for c, _ in dims)])
    return f"""
WITH pts AS (SELECT DISTINCT {out_cols} FROM {table} {where_clause}),
blocked AS (
  SELECT *, (row_number() OVER (ORDER BY {order})) % {groups} AS grp FROM pts),
loc AS (
  SELECT {out_cols} FROM blocked p WHERE NOT EXISTS (
    SELECT 1 FROM blocked q WHERE q.grp = p.grp AND {le} AND ({lt})))
SELECT {out_cols} FROM loc p WHERE NOT EXISTS (
  SELECT 1 FROM loc q WHERE {le} AND ({lt}))
"""
