"""Plan-inspection helpers."""

from pyspark_skyline_spark.plans.explain import (
    formatted_plan,
    assert_pushed_filters,
    assert_broadcast_join,
    scan_read_schema,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "scan_read_schema",
]
