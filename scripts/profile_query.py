"""Job/stage-level attribution for a single bench row (guide §1 tooling,
round 13): runs named ``__spark_entry__.queries()`` rows solo under the
bench's exact session configuration with the Spark event log enabled,
then parses the log into a per-job timeline (description, duration,
stage task counts / task time) so the fixed-overhead vs data-work split
of a multi-second row is visible without the UI.

Usage:
    python scripts/profile_query.py <query>[,<query2>...] [--passes N]

Bench-only tooling — not part of the library surface.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from pyspark.sql import SparkSession  # noqa: E402


def parse_eventlog(path: str) -> list[dict]:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "job": jid,
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:100],
                "t0": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["sec"] = round(
                    (ev["Completion Time"] - jobs[jid]["t0"]) / 1000.0, 3
                )
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", "")[:80],
                "tasks": si.get("Number of Tasks"),
                "sec": round((comp - sub) / 1000.0, 3) if sub and comp else None,
            }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        j["stage_detail"] = [
            {"id": sid, **stages[sid]} for sid in j["stages"] if sid in stages
        ]
        del j["stages"], j["t0"]
        out.append(j)
    return out


def main() -> None:
    names = sys.argv[1].split(",")
    n_passes = 2
    if "--passes" in sys.argv:
        n_passes = int(sys.argv[sys.argv.index("--passes") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "8192")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = dict(entry.queries())
    qs.update(entry.extra_queries())
    # same shape warmup as bench: a small-SF pass populates codegen
    # caches. Same env override as bench.py (ADVICE r13: the hardcoded
    # path silently skipped warmup on other machines), defaulting to
    # the smallest-SF sibling of sf_dir when present.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR")
    if warm_dir is None:
        sib = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
        warm_dir = sib if os.path.isdir(sib) else "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in names:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    marks: list[tuple[str, int, float]] = []  # (label, first_job_after, wall)
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        for p in range(n_passes):
            jid0 = max(tracker.getJobIdsForGroup(None) or [-1]) + 1
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            marks.append((f"{name} pass{p}", jid0, round(dt, 3)))
            print(f"# {name} pass{p}: {dt:.3f}s ({n} rows)", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    logf = sorted(glob.glob(os.path.join(evdir, "*")))[-1]
    if os.path.isdir(logf):  # rolling event-log layout (eventlog_v2_*)
        logf = sorted(
            f for f in glob.glob(os.path.join(logf, "*"))
            if "appstatus" not in os.path.basename(f)
        )[-1]
    jobs = parse_eventlog(logf)
    for i, (label, jid0, wall) in enumerate(marks):
        # half-open window [this mark's first job, next mark's first
        # job): positional, so a pass that launched zero jobs gets an
        # empty window instead of stealing the next pass's jobs
        hi = marks[i + 1][1] if i + 1 < len(marks) else None
        sel = [
            j for j in jobs
            if j["job"] >= jid0 and (hi is None or j["job"] < hi)
        ]
        job_sum = sum(j.get("sec") or 0 for j in sel)
        print(f"\n=== {label}: wall {wall}s, {len(sel)} jobs, job-sum {job_sum:.3f}s "
              f"(gap {wall - job_sum:.3f}s driver-side)")
        for j in sel:
            st = "; ".join(
                f"s{s['id']}:{s['tasks']}t/{s['sec']}s" for s in j["stage_detail"]
            )
            print(f"  job {j['job']:>4} {j.get('sec', '?'):>7}s  {st}")
    print(f"\n# eventlog: {logf}")


if __name__ == "__main__":
    main()
