"""Round-13 scale point for temperature_targets + mix_corpus with
``total`` scaling WITH the corpus (r12 verdict ask #6): the extras row
fixes total=200, so the old driver-loop wall was invisible to every
gate — this stress sets total = n_docs/2 across the ``source`` domains
at sf0.1 and sf1 and times the full allocate+mix pipeline, plus a pure
driver-side allocation point at total=1e8 (the regime the r12 loop
could never finish: 1e8 x 20 domains = 2e9 Python comparisons).

Usage: python scripts/stress_tempmix.py  ->  one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    from pyspark_skyline_spark.operators.shuffle import (
        dhondt_allocate,
        mix_corpus,
        temperature_targets,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tempmix-stress")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    points = {}
    for label, d in [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(repo, "testdata_sf1")),
    ]:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n = docs.count()
        total = n // 2
        best = None
        for _ in range(2):  # min-of-two, same discipline as bench.py
            t0 = time.perf_counter()
            targets = temperature_targets(docs, "source", total=total, tau=0.5)
            kept = mix_corpus(docs, "source", targets, ["doc_id"]).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        assert sum(targets.values()) == total
        points[label] = {
            "n_docs": n,
            "total": total,
            "mix_rows": kept,
            "sec": round(best, 3),
        }
    # pure allocation at a REAL mixture total: 1e8 slots over the sf1
    # domain histogram — driver-only, no Spark job, the exact regime
    # the r12 seat loop walled on
    counts = {
        str(r["source"]): int(r["count"])
        for r in spark.read.parquet(
            os.path.join(repo, "testdata_sf1/documents.parquet")
        )
        .groupBy("source")
        .count()
        .collect()
    }
    t0 = time.perf_counter()
    alloc = dhondt_allocate(counts, 100_000_000, 0.5)
    alloc_sec = round(time.perf_counter() - t0, 4)
    assert sum(alloc.values()) == 100_000_000
    growth = round(points["sf1"]["sec"] / points["sf0.1"]["sec"], 2)
    print(
        json.dumps(
            {
                "metric": "tempmix_stress",
                "points": points,
                "growth_10x_data_10x_total": growth,
                "alloc_total_1e8_sec": alloc_sec,
                "domains": len(counts),
                "note": (
                    "end-to-end = groupBy-count collect + D'Hondt bisection "
                    "+ md5-order grouped ranking + map-filter take; growth "
                    "tracks the mix_corpus range shuffle (data-sized), the "
                    "allocation itself is O(domains x log) and flat"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
