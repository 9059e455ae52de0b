"""Generate a deterministic sf1 BENCH fixture (10x sf0.1) under
testdata_sf1/ — scale-linearity evidence only, NOT an oracle fixture.

The driver's read-only /root/testdata stops at sf0.1; the 2x
performance gate is therefore only ever checked at one scale. This
script synthesizes a 10x point with the same schemas, marginal
distributions, key relationships, and planted-near-dup density as the
driver's sf0.1 tables (profiled 2026-08: vocab, categorical domains,
value ranges, ~4.5% near-dup groups, lines-per-order ~ Poisson(4)), so
`SPARK_GRAFT_SF_DIR=testdata_sf1 python bench.py` measures how each
query's cost grows with data volume. Values are NOT row-for-row
comparable to any DuckDB oracle — correctness stays graded at sf0.01.

Deterministic (numpy PCG64 seed 1). Writes plain pyarrow parquet with
schemas byte-matched to the driver tables (timestamp[us], int32 dims).
region/nation are copied verbatim (fixed-size dimension tables).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
US_PER_DAY = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {name}: {table.num_rows} rows")


def _day_ts(rng, n: int, lo_day: str, hi_day: str) -> np.ndarray:
    lo = np.datetime64(lo_day).astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64(hi_day).astype("datetime64[us]").astype(np.int64)
    days = rng.integers(0, (hi - lo) // US_PER_DAY + 1, n)
    return (lo + days * US_PER_DAY).astype("datetime64[us]")


def gen(out_dir: str, scale: int = 10) -> None:
    rng = np.random.default_rng(1)
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    n_cust = 15_000 * scale
    n_part = 20_000 * scale
    n_supp = 1_000 * scale
    n_ord = 150_000 * scale
    n_li = 600_000 * scale
    n_ev = 100_000 * scale
    n_doc = 5_000 * scale
    n_emb = 2_000 * scale

    seg = np.array(["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"])
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(seg[rng.integers(0, len(seg), n_cust)]),
    }))

    # p_name: TPC-H-style 5-word combination over a 40-word list, so the
    # DISTINCT name count scales with the row count (~n_part). The
    # driver tables keep 64 distinct 2-word names at every SF — a
    # degeneracy that made the sf1 fuzzy point output-bound (duplicate
    # groups grow linearly, valid pairs quadratically) instead of
    # measuring the operator's compute scaling. Deliberate divergence
    # from the driver marginal, bench-fixture-only.
    name_words = np.array(
        "large hot blue small red dark light cold ring bolt washer gear "
        "cog pin screw clip plate shim nut flange rivet bracket hinge "
        "spring bearing valve rotor shaft cam lever strut coupler gasket "
        "collar spacer dowel wheel crank socket plug".split()
    )
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            " ".join(name_words[rng.integers(0, len(name_words), 5)])
            for _ in range(n_part)
        ]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "LARGE", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
        )[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }))

    status = np.array(["O", "P", "F"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(status[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
        "o_orderdate": pa.array(_day_ts(rng, n_ord, "1995-01-01", "2001-08-01")),
        "o_orderpriority": pa.array(prio[rng.integers(0, 5, n_ord)]),
    }))

    # lines-per-order ~ Binomial(n_li, 1/n_ord) ~ Poisson(4), linenumber
    # sequential within each order (run index over the key-sorted draw)
    okey = np.sort(rng.integers(0, n_ord, n_li))
    first = np.r_[True, okey[1:] != okey[:-1]]
    run_start = np.maximum.accumulate(np.where(first, np.arange(n_li), 0))
    linenum = (np.arange(n_li) - run_start + 1).astype(np.int32)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(_day_ts(rng, n_li, "1995-01-02", "2001-11-04")),
    }))

    # events: unique microsecond timestamps over the same 30-day window
    lo = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("2024-01-31T00:00:00").astype("datetime64[us]").astype(np.int64)
    ts = rng.integers(lo, hi, n_ev)
    while len(np.unique(ts)) < n_ev:  # expected <1 collision at this span
        ts = np.unique(np.r_[ts, rng.integers(lo, hi, n_ev - len(np.unique(ts)))])
        ts = ts[:n_ev]
    rng.shuffle(ts)
    etype = np.array(["signup", "click", "error", "view", "purchase"])
    kvals = rng.integers(0, 100, n_ev)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_cust, n_ev), pa.int64()),
        "event_type": pa.array(etype[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in kvals]),
    }))

    # documents: same 31-word vocab, ~50-word docs, ~5% near-dup copies
    # (few-word mutations of an earlier doc) + ~0.2% exact copies —
    # keeps the per-doc candidate/pair density of the driver tables so
    # dedup/minhash costs scale with corpus size, not with an artifact
    vocab = np.array(
        "batch part spark line column order small sort fast value scan hash slow "
        "group agg filter query big key window join scale merge shuffle stage "
        "task node disk read write plan".split()
    )
    base_docs = []
    for _ in range(n_doc):
        nw = int(rng.integers(8, 95))
        base_docs.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    near = rng.random(n_doc) < 0.05
    exact = rng.random(n_doc) < 0.002
    for i in range(1, n_doc):
        if exact[i]:
            base_docs[i] = base_docs[int(rng.integers(0, i))]
        elif near[i]:
            src_words = base_docs[int(rng.integers(0, i))].split()
            for pos in rng.integers(0, len(src_words), max(1, len(src_words) // 12)):
                src_words[pos] = str(vocab[int(rng.integers(0, len(vocab)))])
            base_docs[i] = " ".join(src_words)
    langs = np.array(["en", "fr", "de", "es", "zh"])
    lang_p = np.array([0.41, 0.15, 0.14, 0.15, 0.15])
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(base_docs),
        "lang": pa.array(langs[rng.choice(5, n_doc, p=lang_p)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in base_docs]), pa.int64()),
    }))

    # embeddings: 64-d unit vectors (the driver table is near-uniform on
    # the sphere — documented in bench.py's recall notes)
    mat = rng.standard_normal((n_emb, 64))
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gen(out, scale)
