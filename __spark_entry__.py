"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship skyline; ``queries()`` maps
query name -> (spark, sf_dir) -> DataFrame for every implemented
operator (SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL per query. Column names are aligned between both sides (the
driver's compare sorts columns by name before value-hashing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_skyline_spark import skyline  # noqa: E402
from pyspark_skyline_spark.oracles import skyline_oracle_sql  # noqa: E402
from pyspark_skyline_spark.sources.tables import load_table  # noqa: E402

# ---------------------------------------------------------------------------
# skyline query family: (table, dims, algo)
# ---------------------------------------------------------------------------

_SKYLINE_QUERIES: dict[str, tuple[str, list[tuple[str, str]], str]] = {
    # flagship (SURVEY.md §7.1)
    "skyline_lineitem_3d_min": (
        "lineitem",
        [("l_extendedprice", "min"), ("l_discount", "min"), ("l_quantity", "min")],
        "auto",
    ),
    "skyline_lineitem_2d_mixed": (
        "lineitem",
        [("l_extendedprice", "min"), ("l_quantity", "max")],
        "MR_DIM",
    ),
    "skyline_events_value_ts": (
        "events",
        [("value", "min"), ("ts", "min")],
        "MR_ANGLE",
    ),
}


def _make_skyline_query(table: str, dims, algo: str, via_sql: bool = False):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # timestamp results must collect in UTC to match DuckDB's naive
        # timestamps regardless of the harness session's zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        cols = [c for c, _ in dims]
        # project to the skyline dimensions BEFORE the operator (round
        # 13, guide §4.1): the grouped kernel is opaque to Catalyst, so
        # without this every non-dim column of the table crosses the
        # shuffle and the Arrow boundary only to be dropped by the
        # final select — and the parquet scan reads them all. Same
        # result (dominance + dedup touch only the dims).
        df = load_table(spark, sf_dir, table).select(*cols)
        if via_sql:
            # K11 parser front door (parser.py): dims travel through the
            # reference's query grammar instead of a Python list, so the
            # driver row also grades the parser
            query = "SKYLINE OF " + ", ".join(f"{c} {s.upper()}" for c, s in dims)
            from pyspark_skyline_spark import skyline_sql

            return skyline_sql(df, query, algo=algo).select(*cols).dropDuplicates()
        return skyline(df, dims, algo=algo).select(*cols).dropDuplicates()

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    run = _make_skyline_query(*_SKYLINE_QUERIES["skyline_lineitem_3d_min"])
    return run(spark, "/root/testdata/sf0.001")


#: the driver grades at most 50 queries() entries (dict insertion
#: order); round 1 silently lost 2 rows past the cap, so the count is
#: now a hard invariant
DRIVER_QUERY_CAP = 50

#: retired skyline rows (see _SKYLINE_QUERIES note): pytest-graded via
#: extra_queries(), outside the driver's capped registry
_EXTRA_SKYLINE_QUERIES: dict[str, tuple[str, list[tuple[str, str]], str]] = {
    "skyline_part_grid": (
        "part",
        [("p_retailprice", "min"), ("p_size", "min")],
        "MR_GRID",
    ),
    # round-5 rotation: MR_DIM stays driver-graded via
    # skyline_lineitem_2d_mixed + skyline_orders_price_date; the K11
    # parser front door this row carried moved to
    # skyline_lineitem_2d_mixed (via_sql below), so the parser keeps a
    # hard-gate row. Freed the slot for stream-stream join / BM25 /
    # split-dataset coverage.
    "skyline_part_dim": (
        "part",
        [("p_retailprice", "min"), ("p_size", "min")],
        "MR_DIM",
    ),
    # round-4 rotation: MR_ANGLE stays driver-graded via
    # skyline_events_value_ts (same packed angular key + reflection)
    "skyline_part_angle": (
        "part",
        [("p_retailprice", "min"), ("p_size", "min")],
        "MR_ANGLE",
    ),
    # round-6 rotation: MR_DIM keeps the hard-gate row
    # skyline_lineitem_2d_mixed (which also carries the K11 parser
    # front door), and the identical max+date dim pair stays
    # driver-graded via the grouped skyline_orders_by_status row; this
    # second explicit-MR_DIM row added no algorithm/type coverage
    # beyond those. Freed the slot for the ntile/incremental-dedup
    # families.
    "skyline_orders_price_date": (
        "orders",
        [("o_totalprice", "max"), ("o_orderdate", "min")],
        "MR_DIM",
    ),
    # round-11 rotation: the skyline family held 4 of 50 gate slots;
    # this MR_GRID row exercises the same kernel+merge path as the
    # flagship skyline_lineitem_3d_min (which stays, with the parser-
    # routed MR_DIM and the MR_ANGLE rows). MR_GRID's census prune
    # stays pytest-oracled here and via skyline_part_grid above; the
    # grouped/windowed/streaming skyline rows keep the family at the
    # gate. Freed the slot for the sequence-packing family.
    "skyline_customer_acctbal": (
        "customer",
        [("c_acctbal", "max"), ("c_custkey", "min")],
        "MR_GRID",
    ),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (table, dims, algo) in _SKYLINE_QUERIES.items():
        # skyline_lineitem_2d_mixed goes through the SKYLINE OF
        # query-string front door so the K11 parser gets a graded driver
        # row (same result; carried by skyline_part_dim before rotation #5)
        out[name] = _make_skyline_query(
            table, dims, algo, via_sql=(name == "skyline_lineitem_2d_mixed")
        )
    from pyspark_skyline_spark.entry_ext import ext_queries

    out.update(ext_queries())
    assert len(out) == DRIVER_QUERY_CAP, (
        f"driver registry must hold exactly {DRIVER_QUERY_CAP} queries "
        f"(the driver grades at most {DRIVER_QUERY_CAP}; extras belong in "
        f"extra_queries()), got {len(out)}"
    )
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, (table, dims, _algo) in _SKYLINE_QUERIES.items():
        out[name] = skyline_oracle_sql(table, dims)
    from pyspark_skyline_spark.entry_ext import ext_oracle_sql

    out.update(ext_oracle_sql())
    return out


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-graded by pytest (tests/test_entry.py) but deliberately
    outside the driver's 50-entry registry — entries retired as
    redundant with rows that remain driver-graded."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (table, dims, algo) in _EXTRA_SKYLINE_QUERIES.items():
        out[name] = _make_skyline_query(table, dims, algo)
    from pyspark_skyline_spark.entry_ext import ext_extra_queries

    out.update(ext_extra_queries())
    return out


def extra_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, (table, dims, _algo) in _EXTRA_SKYLINE_QUERIES.items():
        out[name] = skyline_oracle_sql(table, dims)
    from pyspark_skyline_spark.entry_ext import ext_extra_oracle_sql

    out.update(ext_extra_oracle_sql())
    return out
