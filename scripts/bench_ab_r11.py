"""Round-11 bench-residual attribution A/B (r10 VERDICT ask #1).

Question: the 47 rows common to BENCH_r09 and BENCH_r10 drifted
48.3 -> 55.7 s best-case at equal calib with bit-identical plan
fingerprints. Split "host drifted between the r9/r10 measurement
days" from "the two new ~5 s rows (dedup_keep_best, dsir_logweights)
pressure the JVM for later rows in the same invocation".

Method (one session, interleaved): alternate >=3 invocations each of
  A: bench.py --queries <47 common rows>           (r9-shape workload)
  B: bench.py --queries <47 common + 3 r10-only>   (r10-shape workload)
Each invocation is a fresh JVM with bench.py's own warmup, calib
bracket, two timed passes, and per-row pass pairs in the side file.
The discriminator: per-invocation COMMON-ROW total (min-of-passes over
the 47 shared rows only) A vs B at matching calib. If B's common-row
total matches A's, the new rows exert no intra-run pressure and the
r9->r10 residual was host drift between days; if B > A consistently,
the pressure is real and the per-row B-A deltas (rows sorting after
'd' alphabetically run AFTER the heavy rows) localize it.

Writes BENCH_r11_ab.json (the committed attribution artifact, the
BENCH_r09_sf1.json precedent) with raw per-invocation evidence; the
"finding" field is filled in by analysis after the runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON_47 = [
    "agg_lineitem_pricing", "asof_error_click_events", "bm25_documents",
    "cohort_retention_events", "column_profile_orders",
    "cosine_near_dup_lsh_embeddings", "cosine_topk_embeddings",
    "cube_orders", "decontaminate_documents", "dedup_corpus_documents",
    "dedup_incremental_documents", "dedup_incremental_neardup_documents",
    "equi_depth_orders", "funnel_events", "fuzzy_pairs_part",
    "global_shuffle_orders", "join_skyline_customer_nation",
    "k_skyband_part", "lang_id_documents", "minhash_pairs_documents",
    "mix_corpus_documents", "multi_join_revenue",
    "multimodal_meta_documents", "ngram_jaccard_documents",
    "paragraph_dedup_documents", "range_join_error_click_events",
    "rolling_stats_events", "scd2_events", "set_ops_customers",
    "skyline_customer_acctbal", "skyline_events_value_ts",
    "skyline_layers_orders", "skyline_lineitem_2d_mixed",
    "skyline_lineitem_3d_min", "skyline_orders_by_status",
    "split_dataset_orders", "stream_join_error_click_events",
    "stream_skyline_orders", "stream_window_stats_orders",
    "substring_scrub_documents", "substring_spans_documents",
    "topk_orders_per_customer", "two_stage_skyline_orders",
    "unigram_nll_documents", "upsert_orders", "windowed_skyline_events",
    "windowed_stream_skyline_events",
]
R10_ONLY = [
    "dedup_keep_best_documents", "dsir_logweights_documents",
    "snapshot_diff_documents",
]


def run_arm(names: list[str]) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--queries", ",".join(names)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    json_lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not json_lines:
        # a crashed invocation must not abort the interleaved protocol
        # or hide the bench's own diagnostics (review find): record the
        # failure as an arm entry and keep going
        return {
            "wall_sec": round(time.time() - t0, 1),
            "error": f"bench rc={proc.returncode}",
            "stderr_tail": proc.stderr[-2000:],
            "calib": None, "total": None, "common_total": None,
            "queries": {}, "passes": {}, "errors": [],
        }
    payload = json.loads(json_lines[-1])
    # pass pairs from the stderr passes line (keyed evidence per row)
    passes = {}
    for line in proc.stderr.splitlines():
        if line.startswith("# passes: "):
            passes = json.loads(line[len("# passes: "):])
    common_total = round(
        sum(v for k, v in payload["queries"].items() if k in set(COMMON_47)), 2
    )
    return {
        "wall_sec": round(time.time() - t0, 1),
        "calib": payload.get("calib"),
        "total": payload["value"],
        "common_total": common_total,
        "queries": payload["queries"],
        "passes": passes.get("passes", {}),
        "errors": payload.get("errors", []),
    }


def main() -> None:
    n_rounds = int(os.environ.get("AB_ROUNDS", "3"))
    out_path = os.path.join(REPO, "BENCH_r11_ab.json")
    result = {
        "metric": "r11 common-row residual attribution A/B",
        "method": (
            "interleaved fresh-JVM bench.py --queries invocations, one "
            "session: A = the 47 r9/r10 common rows alone (r9-shape), "
            "B = common + the 3 r10-only gate rows (r10-shape); "
            "discriminator = per-invocation min-of-passes total over the "
            "47 common rows at matching calib"
        ),
        "common_rows": COMMON_47,
        "r10_only_rows": R10_ONLY,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "arms": {"A_common_only": [], "B_with_r10_rows": []},
        "finding": "PENDING analysis",
    }
    for i in range(n_rounds):
        for arm, names in (("A_common_only", COMMON_47),
                           ("B_with_r10_rows", COMMON_47 + R10_ONLY)):
            print(f"# round {i} arm {arm} starting", file=sys.stderr, flush=True)
            rec = run_arm(names)
            rec["round"] = i
            result["arms"][arm].append(rec)
            # persist incrementally: an interruption keeps completed arms
            with open(out_path, "w") as fh:
                json.dump(result, fh, indent=1, sort_keys=True)
            print(
                f"# round {i} arm {arm}: common_total={rec['common_total']} "
                f"calib={rec['calib']} wall={rec['wall_sec']}s",
                file=sys.stderr, flush=True,
            )
    print(json.dumps({"done": True, "out": out_path}))


if __name__ == "__main__":
    main()
