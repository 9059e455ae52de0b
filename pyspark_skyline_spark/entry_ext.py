"""Extension-operator registrations for ``__spark_entry__`` (dedup,
similarity, text analysis, streaming). Grows as operators land."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def ext_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def ext_oracle_sql() -> dict[str, str]:
    return {}
