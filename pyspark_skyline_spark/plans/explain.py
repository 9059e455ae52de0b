"""Physical-plan audits: machine-checkable assertions that the plans we
ship are the plans we want at scale (filter pushdown reached the scan,
small dims broadcast, column pruning happened). Used by tests so plan
regressions fail CI instead of silently costing a full-table scan at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "scan_read_schema",
    "count_exchanges",
    "count_exchanges_in_plan",
    "assert_max_exchanges",
]


def count_exchanges_in_plan(plan: str) -> int:
    """Shuffle-exchange count of a formatted-plan STRING (shared by
    the df-level audit below and the plan-fingerprint shape facts, so
    the two can never disagree on what counts as a shuffle). Broadcast
    exchanges are excluded: they ship the SMALL side only and are the
    cheap alternative the audit wants to encourage. AQE reuse
    (ReusedExchange) is also excluded — a reused exchange is not a
    second shuffle."""
    import re

    # formatted plans print each node twice (tree + detail section);
    # count only the "(N) Exchange" detail headers, one per node
    n = 0
    for ln in plan.splitlines():
        if re.match(r"^\(\d+\) Exchange\b", ln.strip()):
            n += 1
    return n


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale
    cost model's first-order term (every exchange is a full
    rewrite+network pass over its input at 100 TB)."""
    return count_exchanges_in_plan(formatted_plan(df))


def assert_max_exchanges(df: DataFrame, budget: int) -> None:
    """Fail when an operator's plan shuffles more than its documented
    budget — the plan-shape regression test for 'is there a shuffle
    here that becomes the bottleneck at scale'."""
    n = count_exchanges(df)
    assert n <= budget, (
        f"plan has {n} shuffle exchanges, budget {budget}:\n{formatted_plan(df)}"
    )


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters: line of the scan."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed down:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def scan_read_schema(df: DataFrame, table_fragment: str) -> str:
    """ReadSchema of the scan whose path contains ``table_fragment``
    (for column-pruning assertions)."""
    plan = formatted_plan(df)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "ReadSchema" in ln:
            ctx = "\n".join(lines[max(0, i - 12) : i + 1])
            if table_fragment in ctx:
                return ln
    raise AssertionError(f"no ReadSchema found for {table_fragment!r}:\n{plan}")
