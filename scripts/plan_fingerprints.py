"""Capture a physical-plan fingerprint for every driver-registry row
and diff against a previous round's capture (VERDICT r7 ask #5).

For each ``__spark_entry__.queries()`` row this BUILDS the DataFrame at
``SPARK_GRAFT_SF_DIR`` (default sf0.1) and records
``plans.fingerprint.plan_summary`` — a sha256 of the normalized
``explain("formatted")`` plus the coarse shape facts (exchange count,
broadcast/SMJ counts, pushdown flag) that make a diff readable. No
query is EXECUTED beyond whatever driver-side probes the builder
itself runs (count-based sizing, localCheckpoint materialization, and
the streaming rows, which execute their bounded stream on build — the
fingerprint of a stream row covers its read-back plan, so it pins the
row's output contract rather than the in-flight streaming plan).

Usage:
    python scripts/plan_fingerprints.py PLANS_r08.json [--diff PLANS_r07.json]

With ``--diff`` the script prints one line per row whose fingerprint
changed (with the shape-fact deltas) plus added/removed rows, and
embeds the same diff in the output JSON under ``"diff_vs"`` — an
accidental broadcast→shuffle or pushdown loss anywhere in the 50-row
registry surfaces here without a judge re-reading 50 plans.

Bench-only tooling — not part of the library surface.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def capture(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry
    from pyspark_skyline_spark.plans.fingerprint import (
        normalized_plan,
        plan_summary,
    )

    dump_dir = os.environ.get("PLAN_DUMP_DIR")
    out: dict[str, dict] = {}
    for name, fn in sorted(entry.queries().items()):
        try:
            df = fn(spark, sf_dir)
            out[name] = plan_summary(df)
            if dump_dir:
                with open(os.path.join(dump_dir, f"{name}.txt"), "w") as f:
                    f.write(normalized_plan(df))
        except Exception:
            out[name] = {"error": traceback.format_exc(limit=1).strip()[-300:]}
        print(f"  {name}: {out[name].get('fp', 'ERROR')}", file=sys.stderr)
    return out


def diff_rows(old: dict, new: dict) -> dict:
    changed, added, errored = {}, [], []
    for name, ns in new.items():
        os_ = old.get(name)
        if "error" in ns:
            # an errored row must NEVER read as "no drift" — without
            # this, a builder that throws in two consecutive rounds has
            # fp None on both sides and vanishes from the diff
            errored.append(name)
        elif os_ is None:
            added.append(name)
        elif os_.get("fp") != ns.get("fp"):
            delta = {
                k: [os_.get(k), ns.get(k)]
                for k in ("exchanges", "broadcast_joins", "sortmerge_joins",
                          "has_pushed_filters", "plan_nodes")
                if os_.get(k) != ns.get(k)
            }
            changed[name] = delta or {"note": "same shape facts, expr-level change"}
    removed = sorted(set(old) - set(new))
    return {
        "changed": changed,
        "added": sorted(added),
        "removed": removed,
        "errored": sorted(errored),
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = args[0] if args and not args[0].startswith("--") else "PLANS.json"
    old_path = None
    if "--diff" in args:
        old_path = args[args.index("--diff") + 1]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        rows = capture(spark, sf_dir)
    finally:
        spark.stop()

    payload: dict = {"sf_dir": sf_dir, "rows": rows}
    if old_path:
        with open(old_path) as f:
            old = json.load(f)
        d = diff_rows(old.get("rows", old), rows)
        payload["diff_vs"] = {"path": old_path, **d}
        for name, delta in d["changed"].items():
            print(f"CHANGED {name}: {delta}")
        if d["added"]:
            print(f"ADDED {d['added']}")
        if d["removed"]:
            print(f"REMOVED {d['removed']}")
        if d["errored"]:
            print(f"ERRORED {d['errored']}")
        if not (d["changed"] or d["added"] or d["removed"] or d["errored"]):
            print("no plan drift")

    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
