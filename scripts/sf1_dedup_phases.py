"""Phase breakdown for the dedup_corpus_documents bench row (VERDICT r5
ask #4: make the sf1 outlier attribution checkable).

Times the three phases of ``dedup.dedup_corpus`` separately at a given
SF dir by materializing each phase boundary with a count:

1. **exact**  — normalized-fingerprint groupBy + min-id semi-join
   (``survivors``; its localCheckpoint materializes here, so later
   phases reuse it — same sharing the fused operator relies on);
2. **jaccard** — exact n-gram Jaccard pair generation over survivors
   (prefix-filter join, ``ngram_jaccard_pairs``);
3. **components** — connected components over the pair edges + the
   final anti-join returning survivors (iterative label propagation,
   so it pays per-iteration job overhead).

The per-phase splits do NOT sum exactly to the fused operator's bench
time (the fused plan shares scans/shuffles the boundaries here force
apart), but they attribute WHERE a scale-point overage lives. Prints
one JSON line; run with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like
bench.py. Two passes, min kept, both recorded.

Bench-only tooling — not part of the library surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def run_phases(spark, sf_dir: str):
    # the SAME phase-1 code path and shingle/threshold constants the
    # dedup_corpus_documents bench row runs — imported, not restated,
    # so operator or parameter drift cannot silently make this tool
    # attribute costs for a different pipeline
    from pyspark_skyline_spark.entry_ext import _NJ_K, _NJ_T
    from pyspark_skyline_spark.operators import dedup as D
    from pyspark_skyline_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "documents")
    out = {}

    t0 = time.perf_counter()
    survivors = D.dedup_corpus_exact_phase(df, "doc_id", "text")
    n_surv = survivors.count()
    out["exact_sec"] = round(time.perf_counter() - t0, 3)
    out["exact_survivors"] = n_surv

    t0 = time.perf_counter()
    pairs = D.ngram_jaccard_pairs(survivors, "doc_id", "text", _NJ_K, _NJ_T)
    pairs = pairs.localCheckpoint(eager=False)
    n_pairs = pairs.count()
    out["jaccard_sec"] = round(time.perf_counter() - t0, 3)
    out["jaccard_pairs"] = n_pairs

    t0 = time.perf_counter()
    clusters = D.near_dup_clusters(pairs)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    n_final = survivors.join(losers, "doc_id", "anti").count()
    out["components_sec"] = round(time.perf_counter() - t0, 3)
    out["final_rows"] = n_final
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # --no-coalesce: disable AQE post-shuffle partition coalescing, the
    # round-8 variance suspect (the candidate join's downstream verify
    # work hangs off AQE-coalesced exchanges; if the sf1 spread is AQE
    # re-plan instability rather than host noise, it vanishes here)
    coalesce = "--no-coalesce" not in sys.argv
    n_passes = 2
    if "--passes" in sys.argv:
        idx = sys.argv.index("--passes") + 1
        if idx >= len(sys.argv) or not sys.argv[idx].isdigit() or int(sys.argv[idx]) < 1:
            sys.exit("usage: sf1_dedup_phases.py [--passes N>=1] [--no-coalesce]")
        n_passes = int(sys.argv[idx])
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf1-dedup-phases")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", str(coalesce).lower())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # per-pass host-speed calibration (same fixed probe as bench.py,
    # shared via the package): a pass whose phases inflate WITH its
    # calib is host contention; a pass whose phases inflate at flat
    # calib is a plan/AQE effect
    from pyspark_skyline_spark.benchtools import calibration_sec

    calibration_sec(spark, int(cpus))  # warm the probe's plan
    passes = []
    for i in range(n_passes):
        res = {"calib": calibration_sec(spark, int(cpus))}
        res.update(run_phases(spark, sf_dir))
        passes.append(res)
        print(f"# pass{i}: {json.dumps(res)}", file=sys.stderr)
    best = min(passes, key=lambda r: r["exact_sec"] + r["jaccard_sec"] + r["components_sec"])
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": int(cpus),
        "aqe_coalesce": coalesce, "min": best, "passes": passes,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
