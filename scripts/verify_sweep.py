"""Run every __spark_entry__.queries() entry at sf0.01 and diff against
oracle_sql() via duckdb — mirrors the driver's correctness gate."""
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(d):
    d = d[sorted(d.columns)].copy()
    for c in d.columns:
        import pandas as pd
        if pd.api.types.is_float_dtype(d[c]):
            d[c] = d[c].round(6).astype(str)
        else:
            d[c] = d[c].astype(str)
    return d.sort_values(list(d.columns)).reset_index(drop=True)


def main():
    sf = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    only = sys.argv[1:] or list(qs)
    fails = []
    for name in only:
        fn = qs[name]
        try:
            got = fn(spark, sf).toPandas()
        except Exception:
            print(f"FAIL {name}: query raised")
            traceback.print_exc()
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)})")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle raised")
            traceback.print_exc()
            fails.append(name)
            continue
        a, b = norm(got), norm(want)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails.append(name)
        elif list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}")
            fails.append(name)
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ")
            fails.append(name)
        else:
            print(f"ok   {name}: {len(a)} rows match")
    print(f"\n{len(only) - len(fails)}/{len(only)} pass; fails: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
