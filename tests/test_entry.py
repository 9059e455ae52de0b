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

    Documented tally (round 8): 50 driver rows (all oracled) + 51
    extras total = 47 entry_ext extras (45 oracled + 2 rows-only:
    representative_skyline_part — sequential greedy has no SQL form;
    semantic_dedup_embeddings — iterative k-means likewise) + 4 extra
    skyline rows (all oracled)."""
    from pyspark_skyline_spark.entry_ext import ext_extra_queries

    qs = entry_mod.queries()
    extras = entry_mod.extra_queries()
    extra_oracled = set(entry_mod.extra_oracle_sql())
    ext_extras = ext_extra_queries()
    assert len(qs) == 50
    assert len(ext_extras) == 47
    assert len(extras) == 51  # 47 entry_ext + 4 extra skyline dims
    assert len(extra_oracled) == 49
    assert set(extras) - extra_oracled == {
        "representative_skyline_part",
        "semantic_dedup_embeddings",
    }
    skyline_extras = set(extras) - set(ext_extras)
    assert len(skyline_extras) == 4
    assert skyline_extras <= extra_oracled


def test_bench_final_line_fits_tail_capture():
    """The driver parses the LAST stdout line of bench.py; round 5's
    inline pass arrays overflowed its tail capture and BENCH_r05.json
    recorded parsed:null. Pin the worst-case happy-path line (every
    registry row at a 4-digit timing, full recall tail) comfortably
    under 4 KB so a future registry rename/addition that bloats the
    line fails here, not in the round artifact."""
    import json as _json

    recall_keys = (
        "lsh_topk@10", "ivf_topk@10", "ivf_topk@10_clustered",
        "near_dup_planted", "near_dup_all_pairs", "near_dup_truth_pairs",
        "minhash_planted@J0.7", "semdedup_planted", "semdedup_bases_kept",
        "near_dup_lsh_driver", "near_dup_lsh_driver_truth_pairs",
    )
    payload = {
        "metric": "total wall-clock of headline queries",
        "value": 99999.999,
        "unit": "sec",
        "queries": {n: 9999.999 for n in sorted(entry_mod.queries())},
        "sf": 0.1,
        "recall": {k: 0.999 for k in recall_keys},
    }
    assert len(_json.dumps(payload)) < 4096


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
