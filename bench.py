"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Context numbers to beat: BASELINE.md (reference runs 2-d/3-d skylines of
1e5..1e7 uniform points in ~20-50 s on a 12-core cluster; sf0.1 lineitem
is 6e5 rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# the Python WORKER fleet resolves imports from PYTHONPATH, not the
# driver's sys.path: without this, running bench from any cwd but the
# repo root breaks every row whose closure imports the package on
# executors (ModuleNotFoundError from the applyInPandas rows)
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.abspath(__file__))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def _anticorrelated(rng, n: int, d: int):
    """Anticorrelated point cloud (Börzsönyi et al. 2001 generator shape):
    each point's coordinates share a fixed "energy" budget drawn near 0.5,
    split across dimensions by a Dirichlet draw — dims are negatively
    correlated, which maximizes frontier size (worst case for skylines;
    far harder than the reference report's uniform grid)."""
    import numpy as np

    energy = rng.normal(0.5, 0.05, size=n).clip(0.0, 1.0)
    props = rng.dirichlet(np.ones(d), size=n)
    pts = (props * (energy[:, None] * d)).clip(0.0, 1.0)
    return (pts * 1e9).astype(np.int64)


def sweep() -> None:
    """--sweep: replay the reference report's d x N grid (uniform random
    ints in [0, 1e9], all-MIN query; BASELINE.md) on this engine, plus
    adversarial ANTICORRELATED shapes the reference never attempted
    (worst-case frontier size). Reference numbers: ~20 s (d=2, N=1e5) to
    ~600 s / DNF (d=7, N=1e6) on 12 cores."""
    import numpy as np
    import time as _t

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark_skyline_spark import skyline, warm_up

    rng = np.random.default_rng(42)
    results = {}
    # d=10 only at N=1e5 (the reference report's own d=10 coverage, p.3;
    # at 1e6 the frontier is most of the dataset — intrinsic, SURVEY §7.3)
    shapes = [
        (n, d, "uniform")
        for n, ds in (
            (100_000, (2, 3, 5, 7, 10)),
            (1_000_000, (2, 3, 5, 7)),
            # the reference's LARGEST published scale (report p.4):
            # ~50 s (d=2/3), ~250 s (d=5), 47 min MR-ANGLE (d=7)
            (10_000_000, (2, 3, 5, 7)),
        )
        for d in ds
    ]
    # adversarial points the reference never dared: anticorrelated dims
    # (worst-case frontier growth) and d=10 at 1e6. d=10 anticorr stays
    # at 1e5 — at 1e6 the frontier IS most of the dataset (degenerate
    # by construction, not a meaningful query; SURVEY §7.3)
    shapes += [(100_000, 10, "anticorr"), (1_000_000, 5, "anticorr"), (1_000_000, 10, "uniform")]
    # cold-JVM warm-up per distinct dimensionality BEFORE anything is
    # timed (r10 verdict ask #7: the d7/1e7 first pass decayed 45->11 s
    # over 5 reprobes — codegen/C2/Arrow warm-in, not data work). The
    # generated plan shape depends on the column count, so each d warms
    # its own codegen classes; a real long-running cluster pays this
    # once per executor lifetime, exactly as modeled here.
    for d in sorted({d for _, d, _ in shapes}):
        t0 = _t.perf_counter()
        warm_up(spark, d)
        print(
            f"# warm_up d={d}: {_t.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    for n, d, dist in shapes:
        cols = [f"x{i+1}" for i in range(d)]
        if dist == "anticorr":
            arr = _anticorrelated(rng, n, d)
        else:
            arr = rng.integers(0, 10**9, size=(n, d), dtype=np.int64)
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame(arr, columns=cols)).repartition(int(cpus))
        df.cache().count()
        dims = [(c, "min") for c in cols]
        # two passes, keep the min: early grid points otherwise pay
        # one-time JVM JIT/codegen costs (observed 5-6x inflation on
        # the first execution of a shape) that a warmed long-running
        # cluster never sees — same estimator as the main bench
        # BOTH raw pass times are kept per shape (round 7): recording
        # only the min hid host contention — r6's d7/1e7 point read
        # 223.5 s while a quiet re-probe measured 12.3 s, and nothing
        # in the artifact showed which. Pass divergence is the
        # contention signal, same discipline as the main bench's
        # passes side file.
        dt, cnt, shape_passes = None, 0, []
        for _ in range(2):
            t0 = _t.perf_counter()
            cnt = skyline(df, dims, algo="auto").count()
            dt1 = round(_t.perf_counter() - t0, 2)
            shape_passes.append(dt1)
            dt = dt1 if dt is None or dt1 < dt else dt
        df.unpersist()
        # drop accumulated shuffle/broadcast state between shapes: the
        # 12-shape sweep otherwise inflates late points with GC noise
        spark.sparkContext._jvm.System.gc()
        key = f"d{d}_n{n}" + ("_anticorr" if dist == "anticorr" else "")
        results[key] = {"sec": dt, "passes": shape_passes, "skyline_size": cnt}
        print(
            f"# d={d} N={n} {dist}: {dt}s (passes {shape_passes}), frontier {cnt}",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "baseline-grid sweep", "grid": results}))
    spark.stop()


def ann_recall(spark, sf_dir: str) -> dict:
    """Approximation quality of the ANN family at PRODUCTION parameters
    (the driver rows grade them in exhaustive-parameter mode where exact
    oracles apply; this surfaces real-parameter quality in the bench
    artifact so degradation is visible round-over-round).

    - lsh_topk@10 / ivf_topk@10: mean recall vs exact cosine top-10 over
      several probes on the sf embeddings table. NOTE the sf embeddings
      are near-uniform random: a probe's true neighbors spread almost
      evenly over IVF cells, so ivf recall is bounded near the scanned
      fraction (~nprobe/nlist) by the DATA, not the index — on real
      clustered embeddings the same parameters score far higher.
    - near_dup_pairs: recall of LSH-bucketed near-dup pairs vs the exact
      all-pairs >= threshold set (ground truth via driver-side NumPy on
      the collected table — bench-only, bounded by the sf table size).
    """
    import numpy as np

    from pyspark_skyline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    probes = [int(ids[i]) for i in (0, len(ids) // 3, 2 * len(ids) // 3)]
    k = 10

    def exact_topk(pid):
        p = unit[ids == pid][0]
        cos = unit @ p
        mask = ids != pid
        order = np.lexsort((ids[mask], -cos[mask]))
        return set(int(x) for x in ids[mask][order][:k])

    lsh_hits = ivf_hits = 0
    for pid in probes:
        want = exact_topk(pid)
        got_lsh = {
            r.vec_id
            for r in S.cosine_topk_lsh(
                emb, "vec_id", "embedding", pid, k, n_planes=4, n_tables=16
            ).collect()
        }
        got_ivf = {
            r.vec_id
            for r in S.cosine_topk_ivf(
                emb, "vec_id", "embedding", pid, k, nlist=12, nprobe=4
            ).collect()
        }
        lsh_hits += len(got_lsh & want)
        ivf_hits += len(got_ivf & want)

    # near-dup PLANTED-PAIR recall at production LSH parameters: the sf
    # embeddings are near-uniform (no real pairs >= threshold), so plant
    # 8 perturbed clones (cosine ~0.999 to their base) and measure both
    # planted recall and full recall vs the exact all-pairs truth set of
    # the augmented table
    threshold = 0.9
    prng = np.random.default_rng(7)
    n_plant = 8
    base_idx = prng.choice(len(ids), size=n_plant, replace=False)
    next_id = int(ids.max()) + 1
    plant_ids = np.arange(next_id, next_id + n_plant)
    plant_vecs = mat[base_idx] + prng.standard_normal((n_plant, mat.shape[1])) * (
        norms[base_idx][:, None] * 0.02
    )
    aug_ids = np.concatenate([ids, plant_ids])
    aug_unit = np.vstack(
        [unit, plant_vecs / np.linalg.norm(plant_vecs, axis=1)[:, None]]
    )
    planted = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[base_idx], plant_ids)
    }
    gram = aug_unit @ aug_unit.T
    iu = np.triu_indices(len(aug_ids), 1)
    hit = gram[iu] >= threshold
    truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(aug_ids[iu[0]][hit], aug_ids[iu[1]][hit])
    }
    emb2 = emb.select("vec_id", "embedding")
    aug = emb2.unionByName(
        spark.createDataFrame(
            [
                (int(i), [float(x) for x in v])
                for i, v in zip(plant_ids, plant_vecs)
            ],
            emb2.schema,
        )
    )
    # production LSH knobs IMPORTED from entry_params (round-8 review:
    # this block hardcoded 4x8 and silently desynced when the driver
    # row moved to 16 tables)
    from pyspark_skyline_spark.entry_params import (
        _ND_LSH_PLANES,
        _ND_LSH_T,
        _ND_LSH_TABLES,
    )

    got_pairs = {
        (int(r.id_a), int(r.id_b))
        for r in S.cosine_near_dup_pairs(
            aug, "vec_id", "embedding", threshold=threshold,
            n_planes=_ND_LSH_PLANES, n_tables=_ND_LSH_TABLES,
        ).collect()
    }
    # DRIVER-ROW recall at the driver row's EXACT knobs (round-8 ask):
    # cosine_near_dup_lsh_embeddings runs md5-mode LSH at the
    # entry_params _ND_LSH_* settings, and its oracle mirrors the LSH
    # exactly — so the CORRECTNESS gate can stay green while the
    # bucketing's recall vs the exhaustive truth silently sags. Measure
    # that recall here every round, at the exact same knobs (imported,
    # not copied, so a knob change can't desync), against the NumPy
    # all-pairs truth of the raw sf table. Deterministic (md5 planes):
    # 0.931 at 4x16 on the sf0.1 embeddings' 144 true pairs.
    # (gram for the augmented table was computed above; its raw-id
    # block IS the raw-table gram — slice it instead of a second
    # O(N^2 d) matmul)
    drv_cos = gram[: len(ids), : len(ids)]
    drv_iu = np.triu_indices(len(ids), 1)
    drv_hit = drv_cos[drv_iu] >= _ND_LSH_T
    drv_truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[drv_iu[0]][drv_hit], ids[drv_iu[1]][drv_hit])
    }
    drv_got = {
        (int(r.id_a), int(r.id_b))
        for r in S.cosine_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=_ND_LSH_T,
            n_planes=_ND_LSH_PLANES, n_tables=_ND_LSH_TABLES,
            plane_mode="md5",
        ).collect()
    }
    drv_recall = (
        round(len(drv_got & drv_truth) / len(drv_truth), 3) if drv_truth else 1.0
    )

    # MinHash-LSH planted-pair recall at PRODUCTION parameters
    # (xxhash64 mode, 64 hashes x 16 bands): 20 pairs at shingle
    # Jaccard ~0.55-0.75 — the moderate-similarity regime where a
    # degenerate seed mix loses pairs (the round-3 estimator fix)
    import random

    from pyspark_skyline_spark.operators import dedup as DD

    rrng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    mh_rows, mh_planted = [], []
    for i in range(20):
        base = [rrng.choice(vocab) for _ in range(40)]
        edited = list(base)
        for pos in rrng.sample(range(2, 38), 4):
            edited[pos] = rrng.choice(vocab)
        mh_rows.append((2 * i, " ".join(base)))
        mh_rows.append((2 * i + 1, " ".join(edited)))
        mh_planted.append((2 * i, 2 * i + 1))
    mh_df = spark.createDataFrame(mh_rows, "doc_id long, text string")
    mh_got = {
        (r.id_a, r.id_b)
        for r in DD.minhash_lsh_pairs(mh_df, "doc_id", "text", threshold=0.4).collect()
    }
    mh_recall = sum(1 for p in mh_planted if p in mh_got) / len(mh_planted)

    # clustered-fixture IVF recall at the SAME production parameters:
    # the sf embeddings are near-uniform, which data-limits IVF recall
    # to ~nprobe/nlist (the r3 "it's the data, not the index" claim).
    # This fixture makes that claim falsifiable: 12 well-separated
    # Gaussian clusters, where a working IVF index must put a probe's
    # true neighbors in its own handful of cells — recall should be
    # near 1.0 here every round, whatever the uniform table scores.
    crng = np.random.default_rng(11)
    n_clusters, per, dim = 12, 170, 64
    centers = crng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    cvecs = np.repeat(centers, per, axis=0) + 0.15 * crng.standard_normal(
        (n_clusters * per, dim)
    )
    cids = np.arange(len(cvecs))
    cunit = cvecs / np.linalg.norm(cvecs, axis=1)[:, None]
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(cids, cvecs)],
        "vec_id long, embedding array<float>",
    )
    civf_hits = 0
    cprobes = [0, per * 5 + 3, per * 10 + 7]
    for pid in cprobes:
        cos = cunit @ cunit[pid]
        mask = cids != pid
        order = np.lexsort((cids[mask], -cos[mask]))
        want = set(int(x) for x in cids[mask][order][:k])
        got = {
            r.vec_id
            for r in S.cosine_topk_ivf(
                cdf, "vec_id", "embedding", pid, k, nlist=12, nprobe=4
            ).collect()
        }
        civf_hits += len(got & want)

    # SemDeDup planted-clone recall at PRODUCTION parameters: plant
    # near-identical clones (cosine ~0.999 to their base, comfortably
    # past the 0.95 production threshold) into the clustered fixture
    # with ids ABOVE every base id, run semantic_dedup at production
    # nlist, and measure the fraction of clones dropped. A quality
    # regression at real parameters (bad centroids, broken cell prune)
    # shows here round-over-round even though the op has no SQL oracle.
    sd_rng = np.random.default_rng(13)
    n_sd = 10
    sd_base = sd_rng.choice(len(cids), size=n_sd, replace=False)
    sd_clone_ids = np.arange(len(cids), len(cids) + n_sd)
    sd_clones = cvecs[sd_base] + 0.01 * sd_rng.standard_normal((n_sd, dim))
    sd_df = cdf.unionByName(
        spark.createDataFrame(
            [
                (int(i), [float(x) for x in v])
                for i, v in zip(sd_clone_ids, sd_clones)
            ],
            "vec_id long, embedding array<float>",
        )
    )
    sd_kept = {
        r.vec_id
        for r in S.semantic_dedup(
            sd_df, "vec_id", "embedding", nlist=12, threshold=0.95
        ).collect()
    }
    sd_dropped = sum(1 for i in sd_clone_ids if int(i) not in sd_kept)
    sd_bases_kept = sum(1 for i in sd_base if int(cids[i]) in sd_kept)

    return {
        "lsh_topk@10": round(lsh_hits / (k * len(probes)), 3),
        "ivf_topk@10": round(ivf_hits / (k * len(probes)), 3),
        "ivf_topk@10_clustered": round(civf_hits / (k * len(cprobes)), 3),
        "near_dup_planted": round(len(got_pairs & planted) / len(planted), 3),
        "near_dup_all_pairs": round(len(got_pairs & truth) / len(truth), 3) if truth else 1.0,
        "near_dup_truth_pairs": len(truth),
        "near_dup_lsh_driver": drv_recall,
        "near_dup_lsh_driver_truth_pairs": len(drv_truth),
        "minhash_planted@J0.7": round(mh_recall, 3),
        "semdedup_planted": round(sd_dropped / n_sd, 3),
        "semdedup_bases_kept": round(sd_bases_kept / n_sd, 3),
    }


# shared with scripts/sf1_dedup_phases.py and the line-width guard test
# via the package (single definition, no file-loader duplication)
from pyspark_skyline_spark.benchtools import (  # noqa: E402
    INLINE_RECALL as _INLINE_RECALL,
    calibration_sec as _calibration_sec,
    fmt_secs as _fmt_secs,
    persist_passes as _persist_passes,
)


def main() -> None:
    if "--sweep" in sys.argv:
        sweep()
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # --queries a,b,c: time only the named subset (scale-point runs,
    # e.g. the top-N most expensive rows at a generated sf1 fixture);
    # the driver's no-arg invocation is unchanged
    only: set | None = None
    if "--queries" in sys.argv:
        idx = sys.argv.index("--queries") + 1
        if idx >= len(sys.argv):
            sys.exit("usage: bench.py [--queries name1,name2,...]")
        only = set(sys.argv[idx].split(","))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pyspark-skyline-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # the 50-query suite cycles well past the default 100-entry
        # compiled-class cache (each query contributes several codegen
        # units), so expensive-to-compile plans — the 32-column decimal
        # minhash mix takes seconds to compile — were RECOMPILING on
        # every pass (measured: the md5-signature row at 15-20 s in the
        # full run vs 4.5 s steady-state alone). A long-running cluster
        # sizes this cache to its workload; so does the bench.
        # 2000 entries was MARGINAL at sf1 (round 12, measured): the
        # 50-row suite (warmup + 2 passes) generates enough codegen
        # units to cycle a 2000-entry cache, so a heavy row's generated
        # classes are evicted between its passes and EVERY pass pays
        # cold-class warm-in — dedup_corpus at sf1 ran [127 s, 154 s]
        # across both passes while its steady-state (3rd same-session
        # repetition, classes resident) is ~10 s. min-of-passes can't
        # see steady state when the cache cycles faster than a pass.
        .config("spark.sql.codegen.cache.maxEntries", "8192")
        # the 2000-entry codegen cache keeps every generated class
        # ALIVE, and the default 240 MB JIT code cache fills after ~a
        # pass and a half of the 50-query suite — the JVM then silently
        # stops compiling and hot loops run interpreted (measured
        # round 8: minhash_pairs 2.8 s solo / 27-32 s late in the
        # suite, with broad pass-2 degradation 2-7x on other rows).
        # A long-running cluster sizes the code cache with the class
        # cache — same legitimate pairing here.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the code-cache flag above only takes effect because PySpark's
    # launch_gateway forwards conf at JVM launch; a pre-existing gateway
    # in this process (or a spark-submit wrapper that owns the JVM args)
    # silently drops it and the round-8 JIT degradation (2-7x late-suite
    # slowdowns once the 240 MB default code cache fills) returns with
    # no signal. Verify against the LIVE JVM's RuntimeMXBean args.
    jvm_args = str(
        spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
        .getInputArguments()
        .toString()
    )
    codecache_missing = "ReservedCodeCacheSize" not in jvm_args
    if codecache_missing:
        print(
            "# WARNING: -XX:ReservedCodeCacheSize absent from the live JVM "
            "(pre-existing gateway or external launcher?) — the codegen "
            "class cache will exhaust the default 240 MB code cache and "
            "late-suite queries degrade 2-7x; timings below are suspect",
            file=sys.stderr,
        )

    import __spark_entry__ as entry

    # session warmup (codegen caches, parquet footers, Python workers) so
    # per-query timings reflect steady state, not first-query JVM costs
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
        "l_returnflag"
    ).count().collect()
    # pre-spawn the Arrow Python-worker fleet (each worker imports
    # pandas/numpy on first use — ~1s apiece if paid inside a query)
    from pyspark.sql import functions as _F

    @_F.pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as _np

        return s * _np.float64(1.0)

    spark.range(0, int(cpus) * 4, 1, int(cpus)).select(
        _F.sum(_warm(_F.col("id").cast("double")))
    ).collect()

    # Warm each query SHAPE once against the tiny sf0.001 tables: the
    # generated whole-stage-codegen source is identical regardless of
    # data scale, so this populates the codegen cache and lets the JVM
    # JIT the hot methods before anything is timed. Without it the first
    # execution of a wide plan (e.g. 64-way minhash aggregate) pays
    # 10-20s of Janino+C2 compilation that has nothing to do with the
    # engine's throughput — on a real cluster this cost is paid once per
    # executor lifetime, not once per query.
    # the driver's no-arg run times the 50 registry rows; a --queries
    # subset run may also name extra_queries() rows (scale points for
    # extras-graded families, e.g. the IVF/semantic-dedup embedding ops)
    bench_queries = dict(entry.queries())
    if only is not None:
        extras = entry.extra_queries()
        bench_queries.update({k: extras[k] for k in only & set(extras)})
        unknown = only - set(bench_queries)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        # filter once — the loops below need no membership guards
        bench_queries = {k: bench_queries[k] for k in sorted(only)}

    # r12 find: a codegen class cache that cycles faster than a pass
    # reads as DATA-GROWTH pathology (sf1 total 320 s -> 216 s and
    # dedup_corpus 127 s -> 27 s when the cache went 2000 -> 8192) —
    # heavy rows pay cold-class C2 warm-in on every pass and
    # min-of-passes never sees steady state. Each row contributes
    # several codegen units, so warn whenever the configured cache is
    # under ~4x the benched row count.
    cache_entries = int(
        spark.conf.get("spark.sql.codegen.cache.maxEntries", "100")
    )
    if cache_entries < 4 * len(bench_queries):
        print(
            f"# WARNING: codegen class cache ({cache_entries} entries) is "
            f"under 4x the benched row count ({len(bench_queries)}) — the "
            "suite can cycle the cache between a row's passes, and "
            "cold-class recompilation then masquerades as data-growth "
            "pathology; raise spark.sql.codegen.cache.maxEntries",
            file=sys.stderr,
        )

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name, fn in sorted(bench_queries.items()):
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:  # warmup is best-effort
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    # host-speed calibration bracket: warm the probe's plan once, then
    # time it before pass 1 and again after pass 2 (see _calibration_sec)
    _calibration_sec(spark, int(cpus))
    calib_pre = _calibration_sec(spark, int(cpus))

    # two timed passes, keep the per-query minimum: single executions on
    # a 32-thread single-JVM local mode are noisy (JIT tiers, GC, AQE
    # stage-size decisions); the min is the standard steady-state
    # estimator and is what a warmed long-running cluster would see
    # Per-query fault isolation: one query's exception must never kill
    # the whole run (round 1 lost ALL bench evidence to a single
    # AnalysisException). Failing queries are recorded under "errors"
    # and excluded from the total; the final JSON line always prints.
    timings: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for _pass in range(2):
        for name, fn in sorted(bench_queries.items()):
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                n = df.count()
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                passes.pop(name, None)
                print(f"# pass{_pass} {name}: ERROR {errors[name]}", file=sys.stderr)
                continue
            dt = round(time.perf_counter() - t0, 3)
            passes.setdefault(name, []).append(dt)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            print(f"# pass{_pass} {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
            # release the DataFrame ref promptly: several operators
            # localCheckpoint their sketch tables, and the persisted
            # RDDs stay pinned until the Python wrapper is collected
            # (ContextCleaner unpersists on driver-side GC). Without
            # this, ~100 query executions accumulate checkpoint blocks
            # and the alphabetical tail of pass 1 degrades 3-8x
            # (measured: vocab_topk 0.35 -> 2.6 s, windowed_skyline
            # 2.4 -> 11.2 s before; near-parity after).
            del df
            import gc as _gc

            _gc.collect()
        # one JVM GC between passes flushes what ContextCleaner queued
        spark.sparkContext._jvm.System.gc()

    # third pass for VOLATILE rows (round-9 verdict ask #4): min-of-2 is
    # fragile when one row's two passes span 4.0 -> 29.5 s — the reported
    # min then rests on a single quiet execution. Any row whose pass pair
    # diverges more than 2x gets one extra timed pass so its min is
    # corroborated (or the volatility is itself triple-witnessed in the
    # side file). Bounded cost: only volatile rows pay, and a quiet run
    # schedules zero extra work.
    volatile = sorted(
        n
        for n, p in passes.items()
        if len(p) == 2 and min(p) > 0 and max(p) / min(p) > 2.0
    )
    import gc as _gc

    pass3_errors: dict[str, str] = {}
    for name in volatile:
        t0 = time.perf_counter()
        try:
            df = bench_queries[name](spark, sf_dir)
            n = df.count()
        except Exception as exc:
            # the corroboration pass is OPTIONAL extra evidence: a
            # transient failure here must not erase the row's two
            # already-valid timed passes (ADVICE r10) — keep the
            # existing min/passes, note the failure in the side file
            # (separately from passes: its lists stay float-only)
            pass3_errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(
                f"# pass3 {name}: ERROR (kept min of first two passes) "
                f"{pass3_errors[name]}",
                file=sys.stderr,
            )
            continue
        dt = round(time.perf_counter() - t0, 3)
        passes[name].append(dt)
        if dt < timings[name]:
            timings[name] = dt
        print(
            f"# pass3 {name}: {dt:.2f}s ({n} rows) [volatile-row third pass]",
            file=sys.stderr,
        )
        del df
        _gc.collect()
    if volatile:
        spark.sparkContext._jvm.System.gc()

    calib_post = _calibration_sec(spark, int(cpus))

    total = round(sum(timings.values()), 2)
    # FINAL-LINE BUDGET: the driver parses the LAST stdout line and its
    # tail capture is 2000 chars (round 8's 2047-char line arrived with
    # its head cut off — parsed:null). Everything here is width-bounded:
    # short metric string, adaptive-precision timings (_fmt_secs),
    # calib as a bare [pre, post] pair, only the 3 headline recall keys
    # inline (full tail -> side file + stderr), error strings capped.
    # tests/test_entry.py::test_bench_final_line_fits_tail_capture pins
    # the worst case under 1900.
    payload = {
        "metric": "total",
        "value": _fmt_secs(total),
        "unit": "sec",
        "queries": {k: _fmt_secs(v) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calib": [calib_pre, calib_post],
    }
    if codecache_missing:
        payload["codecache"] = "MISSING"
    # Both raw pass times per query (execution order), kept OUT of the
    # final printed line: round 5 embedded them inline and the ~2x
    # larger line overflowed the driver's stdout tail capture —
    # BENCH_r05.json recorded parsed:null, losing the round's parsed
    # totals. The pairs stay durable in a side file (and on stderr for
    # log capture), along with raw-precision timings and (re-persisted
    # below) the full recall tail; the final line stays compact so the
    # driver artifact is always machine-readable. Host contention still
    # shows as pass1/pass2 divergence (and the calib bracket) without
    # re-running. The side file is keyed by sf and full-vs-subset so
    # the documented back-to-back sf0.1/sf1 method never clobbers one
    # scale's evidence with the other's, and a later --queries probe
    # never overwrites the driver run's 50-row pairs.
    run_id = f"{int(time.time())}-{os.getpid()}"
    passes_blob = {
        "sf": payload["sf"],
        "cpus": int(cpus),
        "run": run_id,
        "calib": [calib_pre, calib_post],
        "passes": passes,
    }
    if errors:  # full error messages live here and on stderr
        passes_blob["errors"] = errors
    if pass3_errors:  # failed corroboration passes (min-of-2 retained)
        passes_blob["pass3_errors"] = pass3_errors
    if only is not None:  # subset side files self-describe their scope
        passes_blob["subset"] = sorted(only)
    print(f"# passes: {json.dumps(passes_blob)}", file=sys.stderr)
    import re as _re

    # sanitize: an sf_dir without "sf" makes the parsed token a whole
    # path — separators in the filename would break the side-file write
    sf_token = _re.sub(r"[^A-Za-z0-9_.-]", "_", str(sf))
    # subset runs are keyed by a short hash of the query list too: two
    # different --queries probes at the same sf must not clobber each
    # other's pass-pair evidence (only the full run owns the unsuffixed
    # filename)
    if only is not None:
        import hashlib as _hl

        subset_tag = "_subset_" + _hl.sha256(
            ",".join(sorted(only)).encode()
        ).hexdigest()[:8]
    else:
        subset_tag = ""
    side = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_passes_sf{sf_token}{subset_tag}.json",
    )
    # persist the pass pairs BEFORE the minutes-long recall tail runs:
    # an interruption during the untimed recall probes must not lose
    # the completed timed passes (round-9 review finding — the very
    # evidence-loss class rounds 5/8 were hardened against)
    try:
        _persist_passes(passes_blob, side)
    except OSError as exc:  # side artifact must never kill the bench
        print(f"# passes side file failed: {exc}", file=sys.stderr)
    # untimed tail: ANN approximation quality at PRODUCTION parameters
    # (the driver-graded LSH rows are exactly oracled by construction —
    # md5-plane / exhaustive modes — so this tracks the GAUSSIAN-mode
    # real-parameter recall round-over-round)
    try:
        if only is not None:
            raise RuntimeError("skipped for --queries subset run")
        recall_full = ann_recall(spark, sf_dir)
        print(f"# recall: {json.dumps(recall_full)}", file=sys.stderr)
        payload["recall"] = {
            k: recall_full[k] for k in _INLINE_RECALL if k in recall_full
        }
        passes_blob["recall_full"] = recall_full
    except Exception as exc:  # quality probe must never kill the bench
        print(f"# recall probe failed: {exc}", file=sys.stderr)
    else:
        # re-persist with the recall tail (same run id -> atomically
        # rewritten in place, no self-archiving). Its own guard with an
        # accurate label: a disk failure here is a SIDE-FILE problem,
        # not a recall failure — mislabeling it sent an operator
        # re-running the minutes-long recall tail for nothing.
        try:
            _persist_passes(passes_blob, side)
        except OSError as exc:
            print(
                f"# passes re-persist with recall_full failed: {exc}",
                file=sys.stderr,
            )
    if errors:
        # names only on the final line (width-bounded by construction:
        # each errored row also LEAVES the queries dict, so per error
        # the line SHRINKS by ~10 chars net and can never outgrow the
        # happy-path worst case the guard test pins by more than the
        # 12-char '"errors":[]' scaffold); full messages are on stderr
        # and in the side file
        payload["errors"] = sorted(errors)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
