"""Warm-in mitigation reprobe (r10 VERDICT ask #7).

The d7/1e7 sweep point decayed 45.1 -> 11.0 s over 5 fresh-process
passes in round 10 — JIT/Arrow warm-in, not data work. This script
measures whether ``skyline.warm_up`` (a bounded synthetic dry run of
the same plan shape) brings a COLD process's first timed pass within
2x of steady state.

Protocol: one fresh JVM per invocation. With --control, skip warm_up
(the round-10 baseline behavior). Either way: build the d7/1e7
uniform table (same rng seed/shape as bench.py --sweep), cache it,
then time N passes of the same all-MIN skyline. Prints one JSON line.

Run each mode >=2 times interleaved on a quiet host and compare
pass-1 values: warm_up is judged on first_pass / steady ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    control = "--control" in sys.argv
    d, n = 7, 10_000_000
    passes = int(os.environ.get("WARMUP_PASSES", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark_skyline_spark import skyline, warm_up

    warm_sec = None
    if not control:
        t0 = time.perf_counter()
        warm_up(spark, d)
        warm_sec = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(42)
    cols = [f"x{i+1}" for i in range(d)]
    arr = rng.integers(0, 10**9, size=(n, d), dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame(arr, columns=cols)).repartition(int(cpus))
    df.cache().count()
    dims = [(c, "min") for c in cols]
    times, cnt = [], 0
    for _ in range(passes):
        t0 = time.perf_counter()
        cnt = skyline(df, dims, algo="auto").count()
        times.append(round(time.perf_counter() - t0, 2))
    steady = min(times[1:]) if len(times) > 1 else times[0]
    print(
        json.dumps(
            {
                "mode": "control" if control else "warmed",
                "warm_up_sec": warm_sec,
                "passes": times,
                "first_over_steady": round(times[0] / steady, 2) if steady else None,
                "frontier": cnt,
                "shape": f"d{d}_n{n}",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
