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
]


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
