"""Phase breakdown for the dedup_incremental_neardup_documents bench
row (VERDICT r9 ask #1: the round's only unexplained mover — driver
artifact 10.41/10.57 s at quiet calib vs 4.0-5.7 s in other quiet runs
and one 29.45 s outlier pass; plan fingerprint unchanged).

Times the row's phases separately at a given SF dir by materializing
each boundary with a count, using the SAME entry_params constants and
operator internals the bench row runs:

1. **sig_ledger** — md5 MinHash signatures over the accepted corpus
   (doc_id % 3 != 0) — the fixture-derivation step that stands in for
   reading a STORED signature ledger in production;
2. **sig_new**   — md5 MinHash signatures over today's batch
   (doc_id % 3 == 0), localCheckpointed like the operator does;
3. **band**      — the LSH band equi-join candidate generation
   (posexplode both sides, join on (band_index, band_key), distinct);
4. **verify**    — the signature-Jaccard estimate join + threshold
   filter producing the dup-id set;
5. **append**    — the survivor anti-join + signature re-attach
   (the operator's return shape).

Also times the FUSED entry query two ways per pass:

- **fused_recompute** — exactly the committed entry query: the derived
  ledger feeds BOTH the band explode and the estimator join with no
  materialization, so the 32-column md5 decimal signature expression —
  the most JIT-sensitive codegen in the suite (the r8 code-cache
  finding was measured on this exact expression) — executes TWICE per
  run over 2/3 of the corpus;
- **fused_ledger_ckpt** — the same query with the derived ledger
  localCheckpointed first (production semantics: a real ledger is READ
  from storage as materialized signatures, never recomputed), so the
  md5 expression runs once per side.

Per-pass host-speed calibration brackets every number (a pass whose
phases inflate WITH its calib is host contention; inflation at flat
calib is plan/JIT/AQE). ``--no-coalesce`` disables AQE partition
coalescing (the r8/r9 variance suspect on the band join). Run with
SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py; ≥3 separate
process invocations give the cross-process spread the verdict asked
for. Prints one JSON line.

RESOLUTION (round 10) — the attribution this tool produced:

1. The variance was NOT AQE, not the band join, not checkpoint
   placement, and not host contention: a 6-run single-process A/B
   showed hash_mode=xxhash64 rock-stable (2.3-3.0 s) while md5 mode
   swung 5.2-68.4 s at flat calib, with whole-stage codegen on OR
   off. The md5 seed mix's decimal(20,0) Mersenne arithmetic
   (per-row-per-seed BigDecimal allocation) was driving GC storms.
   Fixed: pure-long split-multiply modmul (dedup._modmul61_const) —
   bit-identical values, oracles untouched.
2. The residual ~7 s was DRIVER-side: ~3.5k py4j gateway calls per
   signature build constructing 32 fat Column trees, plus analyzer/
   optimizer load on them (event-log stage walls summed to ~2 s of a
   ~8 s run). Fixed: SQL-string mix exprs over pre-split columns
   (dedup._md5_mix_exprs) — build 7.2 -> 3.4 s, and the entry query
   now localCheckpoints the derived ledger (the operator consumes it
   twice; a production ledger is read materialized).
3. After both: row min-of-passes 3.96 s at quiet calib (driver r9
   artifact: 10.41 s both passes); first execution at a new scale
   still pays ~10 s of JIT/AQE warm-in, which the bench's new
   volatile-row third pass covers.

Bench-only tooling — not part of the library surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def _inputs(spark, sf_dir: str):
    from pyspark_skyline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 3 == 0)
    known = docs.filter(
        (F.col("doc_id") % 3 != 0)
        & F.col("text").isNotNull()
        & F.col("text").rlike(r"\S")
    )
    return new, known


def run_phases(spark, sf_dir: str):
    from pyspark_skyline_spark.entry_params import (
        _MH_BANDS,
        _MH_HASHES,
        _MH_K,
        _MH_T,
    )
    from pyspark_skyline_spark.operators import dedup as D
    from pyspark_skyline_spark.operators.dedup import _band_keys

    new, known = _inputs(spark, sf_dir)
    sig_names = [f"m{j}" for j in range(_MH_HASHES)]
    out = {}

    t0 = time.perf_counter()
    ledger = (
        D.minhash_signatures(
            known, "doc_id", "text",
            num_hashes=_MH_HASHES, shingle_k=_MH_K, hash_mode="md5",
        )
        .withColumnRenamed("doc_id", "ledger_id")
        .localCheckpoint(eager=False)
    )
    out["sig_ledger_rows"] = ledger.count()
    out["sig_ledger_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    substantive = new.where(F.col("text").isNotNull() & F.col("text").rlike(r"\S"))
    sigs_new = D.minhash_signatures(
        substantive, "doc_id", "text",
        num_hashes=_MH_HASHES, shingle_k=_MH_K, hash_mode="md5",
    ).localCheckpoint(eager=False)
    out["sig_new_rows"] = sigs_new.count()
    out["sig_new_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    bk = _band_keys(_MH_HASHES, _MH_BANDS)
    new_bands = sigs_new.select(
        F.col("doc_id").alias("__nid"), F.posexplode(bk).alias("__bi", "__bk")
    )
    led_bands = ledger.select(
        F.col("ledger_id").alias("__lid"), F.posexplode(bk).alias("__bi", "__bk")
    )
    cand = (
        new_bands.join(led_bands, ["__bi", "__bk"])
        .select("__nid", "__lid")
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    out["band_candidates"] = cand.count()
    out["band_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    a = sigs_new.select(
        F.col("doc_id").alias("__nid"),
        *[F.col(c).alias(f"__a_{c}") for c in sig_names],
    )
    b = ledger.select(
        F.col("ledger_id").alias("__lid"),
        *[F.col(c).alias(f"__b_{c}") for c in sig_names],
    )
    est = sum(
        F.when(F.col(f"__a_{c}") == F.col(f"__b_{c}"), 1).otherwise(0)
        for c in sig_names
    ) / F.lit(float(_MH_HASHES))
    dup_ids = (
        cand.join(a, "__nid")
        .join(b, "__lid")
        .withColumn("__est", est)
        .filter(F.col("__est") >= _MH_T)
        .select(F.col("__nid").alias("doc_id"))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    out["verify_dups"] = dup_ids.count()
    out["verify_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    survivors = new.join(dup_ids, "doc_id", "left_anti")
    out["append_rows"] = survivors.join(sigs_new, "doc_id", "left").count()
    out["append_sec"] = round(time.perf_counter() - t0, 3)
    return out


def run_fused(spark, sf_dir: str, ledger_ckpt: bool):
    from pyspark_skyline_spark.entry_params import (
        _MH_BANDS,
        _MH_HASHES,
        _MH_K,
        _MH_T,
    )
    from pyspark_skyline_spark.operators import dedup as D

    new, known = _inputs(spark, sf_dir)
    t0 = time.perf_counter()
    ledger = D.minhash_signatures(
        known, "doc_id", "text",
        num_hashes=_MH_HASHES, shingle_k=_MH_K, hash_mode="md5",
    ).withColumnRenamed("doc_id", "ledger_id")
    if ledger_ckpt:
        ledger = ledger.localCheckpoint(eager=False)
    out = D.dedup_incremental_neardup(
        new, ledger, "doc_id", "text", ledger_id_col="ledger_id",
        num_hashes=_MH_HASHES, bands=_MH_BANDS, shingle_k=_MH_K,
        threshold=_MH_T, hash_mode="md5",
    )
    n = out.select("doc_id", "source").count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    coalesce = "--no-coalesce" not in sys.argv
    n_passes = 2
    if "--passes" in sys.argv:
        idx = sys.argv.index("--passes") + 1
        if idx >= len(sys.argv) or not sys.argv[idx].isdigit() or int(sys.argv[idx]) < 1:
            sys.exit("usage: sf01_neardup_phases.py [--passes N>=1] [--no-coalesce]")
        n_passes = int(sys.argv[idx])
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf01-neardup-phases")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", str(coalesce).lower())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # match bench.py's JIT environment exactly — the r8 code-cache
        # finding was measured on this row's md5 signature expression
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark_skyline_spark.benchtools import calibration_sec

    calibration_sec(spark, int(cpus))  # warm the probe's plan
    passes = []
    for i in range(n_passes):
        res = {"calib": calibration_sec(spark, int(cpus))}
        res.update(run_phases(spark, sf_dir))
        for label, ckpt in (("fused_recompute", False), ("fused_ledger_ckpt", True)):
            sec, n = run_fused(spark, sf_dir, ckpt)
            res[f"{label}_sec"], res[f"{label}_rows"] = sec, n
        res["calib_post"] = calibration_sec(spark, int(cpus))
        passes.append(res)
        print(f"# pass{i}: {json.dumps(res)}", file=sys.stderr)
        spark.sparkContext._jvm.System.gc()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "aqe_coalesce": coalesce,
                "pid": os.getpid(),
                "passes": passes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
