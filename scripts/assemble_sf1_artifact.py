"""Assemble BENCH_r{N}_sf1.json from two (or more) run-keyed sf1 pass
blobs plus sf0.1 floor evidence — the r12 method
(BENCH_r12_sf1.json note_method), kept as a script so the per-round
artifact is reproducible from the archived blobs instead of hand-built.

Usage:
  python scripts/assemble_sf1_artifact.py OUT.json ROUND_LABEL \
      sf1_blob1.json sf1_blob2.json [...] --sf01 sf01_blob.json [...]

Each blob is a bench.py "# passes:" JSON object ({"passes": {row:
[secs...]}, "calib": [...], "run": ...}).  Per-row sf1 = min across
all sf1 blobs' passes; sf0.1 comparand = min across the given sf0.1
blobs (plus any floats passed via --sf01-official).
"""

from __future__ import annotations

import json
import sys


def _mins(blobs: list[dict]) -> dict[str, float]:
    out: dict[str, float] = {}
    for b in blobs:
        for k, ps in b["passes"].items():
            m = min(ps)
            if k not in out or m < out[k]:
                out[k] = m
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path, label = args[0], args[1]
    rest = args[2:]
    sf1_paths: list[str] = []
    sf01_paths: list[str] = []
    officials: list[float] = []
    mode = "sf1"
    for a in rest:
        if a == "--sf01":
            mode = "sf01"
        elif a == "--sf01-official":
            mode = "official"
        elif mode == "sf1":
            sf1_paths.append(a)
        elif mode == "sf01":
            sf01_paths.append(a)
        else:
            officials.append(float(a))
    sf1_blobs = [json.load(open(p)) for p in sf1_paths]
    sf01_blobs = [json.load(open(p)) for p in sf01_paths]
    sf1 = _mins(sf1_blobs)
    sf01 = _mins(sf01_blobs)
    queries = {}
    over8x = []
    for k in sorted(sf1):
        row = {"sf1": round(sf1[k], 3)}
        if k in sf01:
            row["sf0.1"] = round(sf01[k], 3)
            row["growth_10x_data"] = round(sf1[k] / max(sf01[k], 1e-9), 2)
            if row["growth_10x_data"] > 8:
                over8x.append(k)
        queries[k] = row
    growths = sorted(
        v["growth_10x_data"] for v in queries.values() if "growth_10x_data" in v
    )
    median = growths[len(growths) // 2] if growths else None
    payload = {
        "metric": f"full-registry sf1 scale points (10x sf0.1), {label}",
        "cpus": 32,
        "fixture": (
            "scripts/gen_sf1.py deterministic 10x synthetic mirror "
            "(bench-only, not an oracle fixture)"
        ),
        "note_method": (
            "bench.py full no-arg registry run at "
            "SPARK_GRAFT_SF_DIR=testdata_sf1, independent fresh-JVM "
            "invocations; per-row sf1 = min across invocations "
            "(min-of-several floors). sf0.1 comparand = min across the "
            "given same-session sf0.1 blobs. Per-pass blobs archived "
            "run-keyed in bench_runs/."
        ),
        "totals": {
            "sf1_per_run_sums": [
                round(sum(min(p) for p in b["passes"].values()), 1)
                for b in sf1_blobs
            ],
            "sf1_floor_sum": round(sum(sf1.values()), 1),
            "sf0.1_floor_sum": round(sum(sf01.values()), 1) if sf01 else None,
            "sf0.1_official_refs": officials,
        },
        "calib": {
            "sf1_runs": [b.get("calib") for b in sf1_blobs],
            "sf0.1_runs": [b.get("calib") for b in sf01_blobs],
        },
        "median_growth_10x_data": median,
        "rows_over_8x_growth": over8x,
        "queries": queries,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"wrote {out_path}: floor sum {payload['totals']['sf1_floor_sum']}"
          f" median growth {median} over8x {over8x}")


if __name__ == "__main__":
    main()
