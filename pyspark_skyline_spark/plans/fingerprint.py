"""Physical-plan fingerprints for round-over-round drift detection.

The plan audits in ``explain.py`` assert SPECIFIC properties (a filter
pushed, a join broadcast) on the operators we thought to guard. This
module covers the rest of the surface generically: hash a NORMALIZED
``explain("formatted")`` of every driver-row DataFrame at bench time
(``scripts/plan_fingerprints.py`` writes ``PLANS_r{N}.json``) and diff
the hashes against the previous round, so an accidental
broadcast→shuffle flip, a lost pushdown, or an extra exchange anywhere
in the 50-row registry surfaces as a one-line diff instead of needing
a human to re-read 50 plans.

Normalization strips everything that legitimately varies between two
builds of the SAME logical plan — expression ids (``#123``), codegen
stage ids, file paths/URIs, checkpoint/RDD identifiers, cached-plan
hex addresses — while keeping the operator tree, join strategies,
partitioning, pushed filters, and read schemas that define the plan's
scale behavior. Two runs of an unchanged query therefore hash equal,
and any physical strategy change hashes different.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

from pyspark_skyline_spark.plans.explain import formatted_plan

__all__ = ["normalized_plan", "plan_fingerprint", "plan_summary"]

# order matters: URIs before bare paths, ids before generic numbers
_RULES: list[tuple[re.Pattern[str], str]] = [
    # expression ids: col#123, col#123L, cast(x#45 as ...)
    (re.compile(r"#\d+"), "#x"),
    # higher-order-function lambda variables draw from a SESSION-global
    # counter (lambda x_17#x), so any earlier query shifts them
    (re.compile(r"lambda ([A-Za-z]+)_\d+"), r"lambda \1_n"),
    # RDD lineage ids (localCheckpoint scans: MapPartitionsRDD[194])
    # and their JVM call-site capture ("at NativeMethodAccessorImpl
    # .java:0" vs "at <unknown>:0" varies with JVM inlining state)
    (re.compile(r"RDD\[\d+\] at \S+ at [^,]*:\d+"), "RDD[n] at <site>"),
    (re.compile(r"RDD\[\d+\]"), "RDD[n]"),
    # exchange/subquery reuse ids: [id=#x] already covered by above;
    # plan_id=123 from AQE
    (re.compile(r"plan_id=\d+"), "plan_id=x"),
    # codegen ids shift when unrelated stages split/merge upstream of a
    # node; whole-stage BOUNDARIES still show as WholeStageCodegen nodes
    (re.compile(r"\[codegen id : \d+\]"), "[codegen id : n]"),
    # file: / dbfs: / hdfs: URIs and bare absolute paths (scan
    # locations, checkpoint dirs, stream sinks, temp dirs)
    (re.compile(r"(file|hdfs|s3a?|dbfs):/[^\s,\]\)]*"), "<uri>"),
    (re.compile(r"/[A-Za-z0-9_.\-/]*(?:parquet|checkpoint|tmp|warehouse)[A-Za-z0-9_.\-/]*"), "<path>"),
    # memory-sink stream tables get generated names (the column lists
    # inside ExistingRDD[...] / MemoryScan[...] brackets are KEPT — the
    # #id rule above normalizes their exprIds, and erasing the whole
    # bracket would blind the detector to schema drift on exactly the
    # localCheckpoint scans it exists to cover)
    (re.compile(r"`[A-Za-z0-9_]*mem_[A-Za-z0-9_]*`"), "`<memtable>`"),
    # JVM object hex addresses occasionally leak into node details
    (re.compile(r"@[0-9a-f]{6,}"), "@addr"),
    # InMemoryFileIndex path counts are layout noise
    (re.compile(r"InMemoryFileIndex\([0-9]+ paths\)"), "InMemoryFileIndex(<paths>)"),
    # localCheckpoint scans report the checkpointed RDD's ACTUAL
    # partition count as UnknownPartitioning(N) — runtime state of the
    # builder's probe jobs (AQE coalesce outcome on the capture day),
    # not a plan property: the r10->r11 diff flagged equi_depth /
    # global_shuffle as "expr-level change" on bit-identical code
    # (verified: the r10 tree rebuilt today yields the r11 hash). The
    # MEANINGFUL partition counts (hashpartitioning(keys, 32),
    # rangepartitioning(..., 32)) carry a partitioning NAME and are
    # untouched by this rule.
    (re.compile(r"UnknownPartitioning\(\d+\)"), "UnknownPartitioning(n)"),
]


def normalized_plan(df: DataFrame) -> str:
    """``explain("formatted")`` with run-varying identifiers stripped."""
    plan = formatted_plan(df)
    for pat, repl in _RULES:
        plan = pat.sub(repl, plan)
    return plan


def plan_fingerprint(df: DataFrame) -> str:
    """sha256 (16 hex chars) of the normalized formatted plan."""
    return hashlib.sha256(normalized_plan(df).encode()).hexdigest()[:16]


def plan_summary(df: DataFrame) -> dict:
    """Fingerprint plus the coarse shape facts that make a fingerprint
    DIFF interpretable without reading either plan: shuffle-exchange
    count, broadcast-join count, sort-merge-join count, and whether any
    scan kept pushed filters."""
    from pyspark_skyline_spark.plans.explain import count_exchanges_in_plan

    plan = normalized_plan(df)
    return {
        "fp": hashlib.sha256(plan.encode()).hexdigest()[:16],
        "exchanges": count_exchanges_in_plan(plan),
        "broadcast_joins": len(
            re.findall(r"^\(\d+\) Broadcast(Hash|NestedLoop)Join", plan, re.M)
        ),
        "sortmerge_joins": len(re.findall(r"^\(\d+\) SortMergeJoin", plan, re.M)),
        "has_pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),
        "plan_nodes": len(re.findall(r"^\(\d+\) ", plan, re.M)),
    }
