"""Local replica of the driver's t2 correctness gate: every queries()
entry with an oracle must match DuckDB on row count, column names, and
order-insensitive values (sf dir from SPARK_GRAFT_TEST_SF_DIR, default
sf0.001 for speed; the driver itself runs sf0.01)."""

import importlib.util
import os

import duckdb
import pytest

ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")

spec = importlib.util.spec_from_file_location("spark_entry", ENTRY_PATH)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_registry_holds_exactly_driver_cap():
    # the driver grades at most 50 entries in dict order; an accidental
    # 51st would silently push a graded row off the end (round-1 bug).
    # queries() itself asserts, so exercise it plus the disjointness of
    # the extras registry.
    qs = entry_mod.queries()
    assert len(qs) == entry_mod.DRIVER_QUERY_CAP
    extras = entry_mod.extra_queries()
    assert not (set(qs) & set(extras))
    # every main entry has an oracle; extras may be rows-only
    assert set(entry_mod.oracle_sql()) == set(qs)
    assert set(entry_mod.extra_oracle_sql()) <= set(extras)


def test_registry_tallies_match_documented_counts():
    """The COVERAGE/README tallies drifted (round-7 judge: docs said
    48 extras / 46 oracled while the live registry held 44 / 42 — the
    overcount dated to ~round 5). Pin the documented numbers to the
    registries themselves: whenever a rotation or addition changes
    these, this test forces the same-commit doc update instead of
    letting prose drift for three rounds.

    Part of the round-7 confusion was COMPOSITIONAL: extra_queries()
    is the union of entry_ext._EXTRA_QUERIES (general operators) and
    __spark_entry__._EXTRA_SKYLINE_QUERIES (retired skyline dims, all
    oracled), and different counters included different halves. Pin
    both halves and the union.

    Documented tally (round 13): 50 driver rows (all oracled) + 72
    extras total = 67 entry_ext extras (64 oracled + 3 rows-only:
    representative_skyline_part — sequential greedy has no SQL form;
    semantic_dedup_embeddings — iterative k-means likewise;
    pack_documents_ffd_documents — sequential first-fit greedy
    likewise) + 5 extra skyline rows (all oracled)."""
    from pyspark_skyline_spark.entry_ext import ext_extra_queries

    qs = entry_mod.queries()
    extras = entry_mod.extra_queries()
    extra_oracled = set(entry_mod.extra_oracle_sql())
    ext_extras = ext_extra_queries()
    assert len(qs) == 50
    assert len(ext_extras) == 67
    assert len(extras) == 72  # 67 entry_ext + 5 extra skyline dims
    assert len(extra_oracled) == 69
    assert set(extras) - extra_oracled == {
        "representative_skyline_part",
        "semantic_dedup_embeddings",
        "pack_documents_ffd_documents",
    }
    skyline_extras = set(extras) - set(ext_extras)
    assert len(skyline_extras) == 5
    assert skyline_extras <= extra_oracled


def test_coverage_doc_tallies_match_registries():
    """COVERAGE.md's tally PROSE drifted from the live registries in
    rounds 5-8 — twice in rounds where a registry-only pinning test
    was green (it checked the registries, not the document). Grep the
    two load-bearing cells (the bold headline tally and the canonical
    per-registry breakdown) for strings COMPOSED from the live
    registries, so any rotation/addition that changes a count fails
    here until COVERAGE.md is updated in the same commit."""
    from pyspark_skyline_spark.entry_ext import ext_extra_queries

    qs = entry_mod.queries()
    extras = entry_mod.extra_queries()
    oracled = set(entry_mod.extra_oracle_sql())
    ext_extras = ext_extra_queries()
    n_sky = len(extras) - len(ext_extras)
    n_ext_oracled = len(oracled & set(ext_extras))
    n_rows_only = len(extras) - len(oracled)
    cov_path = os.path.join(os.path.dirname(ENTRY_PATH), "COVERAGE.md")
    with open(cov_path) as fh:
        cov = fh.read().replace("\n", " ")
    headline = (
        f"Exactly {len(qs)} driver-registered queries, all {len(qs)} "
        f"oracle-checked, plus {len(extras)} pytest-graded extras "
        f"({len(oracled)} oracle-checked + {n_rows_only} rows-only: "
        f"{len(qs) + len(extras)} graded queries total)."
    )
    canonical = (
        f"Canonical tally: {len(qs)} driver rows (all oracled) + "
        f"{len(extras)} extras total = {len(ext_extras)} entry_ext extras "
        f"({n_ext_oracled} oracled + {n_rows_only} rows-only) + "
        f"{n_sky} skyline extras (all oracled)."
    )
    assert headline in cov, f"COVERAGE.md headline tally must read: {headline}"
    assert canonical in cov, f"COVERAGE.md canonical tally must read: {canonical}"


def test_bench_final_line_fits_tail_capture():
    """The driver parses the LAST stdout line of bench.py and its tail
    capture is 2000 CHARS (judge-measured in round 8, when the line hit
    2047 and BENCH_r08.json recorded parsed:null — round 5 failed the
    same way at a larger size; the old guard asserted <4096, a bar that
    never matched the real capture). Build the worst-case happy-path
    line exactly as bench.py does — the real fmt_secs/INLINE_RECALL
    (shared via pyspark_skyline_spark.benchtools), every live registry
    row at the widest timing fmt_secs can emit, 3-digit calibration
    pair — and pin it under 1950 (50 chars of real slack; the errors
    path can only add the 12-char scaffold, since each errored row
    leaves the queries dict and inline errors are names-only). The
    bar was 1900 through round 9; rotation #10's longer row names
    (dedup_keep_best/dsir_logweights/snapshot_diff replacing shorter
    retired names) pushed the worst case to 1904, still 96 under the
    capture — the slack narrowed, the contract didn't."""
    import json as _json

    from pyspark_skyline_spark.benchtools import INLINE_RECALL, fmt_secs

    # widest encodings fmt_secs can produce per magnitude regime
    worst_timing = max(
        (fmt_secs(v) for v in (99.99, 999.99, 99999.0)),
        key=lambda x: len(_json.dumps(x)),
    )
    payload = {
        "metric": "total",
        "value": fmt_secs(99999.0),
        "unit": "sec",
        "queries": {n: worst_timing for n in sorted(entry_mod.queries())},
        "sf": 0.1,
        "calib": [999.99, 999.99],
        "recall": {k: 0.999 for k in INLINE_RECALL},
    }
    line = _json.dumps(payload)
    assert len(line) < 1950, f"bench final line would be {len(line)} chars"


def test_persist_passes_archives_other_runs_only(tmp_path):
    """benchtools.persist_passes contract (round-9 review findings): a
    DIFFERENT run's file is archived under bench_runs/ before the
    fixed path is rewritten; the SAME run rewrites in place with no
    self-archive; a corrupt/non-dict existing file falls back to an
    mtime-keyed archive instead of raising (json.load(...).get on a
    bare 'null' used to AttributeError straight through the bench's
    final print); archive-name collisions get a numeric suffix instead
    of overwriting earlier evidence; writes are atomic (no stray .tmp
    left behind)."""
    import json as _json

    from pyspark_skyline_spark.benchtools import persist_passes

    side = str(tmp_path / "BENCH_passes_sfX.json")
    runs_dir = tmp_path / "bench_runs"

    persist_passes({"run": "r1", "passes": {}}, side)
    assert _json.load(open(side))["run"] == "r1"
    assert not runs_dir.exists()  # nothing to archive on first write

    persist_passes({"run": "r1", "passes": {"a": [1.0]}}, side)
    assert not runs_dir.exists()  # same run rewrites in place
    assert _json.load(open(side))["passes"] == {"a": [1.0]}

    persist_passes({"run": "r2/../evil", "passes": {}}, side)
    archived = list(runs_dir.glob("*.json"))
    assert len(archived) == 1 and "_runr1.json" in archived[0].name
    assert _json.load(open(archived[0]))["passes"] == {"a": [1.0]}

    with open(side, "w") as fh:  # valid JSON, not a dict
        fh.write("null")
    persist_passes({"run": "r3", "passes": {}}, side)
    archived = sorted(p.name for p in runs_dir.glob("*.json"))
    assert len(archived) == 2 and any("_runmtime" in n for n in archived)
    assert _json.load(open(side))["run"] == "r3"

    # collision: archiving a second run named r1 must not overwrite the
    # first r1 archive
    persist_passes({"run": "r1", "passes": {"b": [2.0]}}, side)  # r3 archived
    persist_passes({"run": "r4", "passes": {}}, side)  # archives the new r1
    r1_archives = sorted(p.name for p in runs_dir.glob("*_runr1*.json"))
    assert r1_archives == [
        "BENCH_passes_sfX_runr1.1.json",
        "BENCH_passes_sfX_runr1.json",
    ]
    assert _json.load(open(runs_dir / "BENCH_passes_sfX_runr1.1.json"))[
        "passes"
    ] == {"b": [2.0]}
    assert not list(tmp_path.glob("*.tmp"))  # atomic write leaves no temp


def _all_queries():
    out = dict(entry_mod.queries())
    out.update(entry_mod.extra_queries())
    return out


def _all_oracles():
    out = dict(entry_mod.oracle_sql())
    out.update(entry_mod.extra_oracle_sql())
    return out


@pytest.mark.parametrize("name", sorted(_all_queries().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = _all_queries()[name]
    oracles = _all_oracles()
    sdf = q(spark, sf_dir)
    srows = sdf.collect()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check (driver's weaker gate)
        return
    con = duck_con(sf_dir)
    ddf = con.execute(oracles[name])
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    # order-insensitive value compare on name-sorted columns
    sidx = [sdf.columns.index(c) for c in sorted(sdf.columns)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    got = normalize([[r[i] for i in sidx] for r in srows])
    want = normalize([[r[i] for i in didx] for r in drows])
    assert got == want, f"{name}: value mismatch"
