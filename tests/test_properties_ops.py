"""Property-based checks (Hypothesis) for the newer relational
operators: salted_join ≡ plain join on arbitrary key/value data, and
merge_upsert laws (idempotence, last-write-wins, key partition)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark_skyline_spark.operators.skewjoin import salted_join
from pyspark_skyline_spark.operators.upsert import merge_upsert

KEYS = st.integers(min_value=0, max_value=6)  # few keys -> heavy collisions
VALS = st.integers(min_value=-100, max_value=100)

fact_rows = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=25)
dim_rows = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=10)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _counted(df):
    return {tuple(r): c for *r, c in df.groupBy(*df.columns).count().collect()}


@given(fact=fact_rows, dim=dim_rows, n_salts=st.integers(1, 5))
@_SETTINGS
def test_salted_join_equals_plain_join(spark, fact, dim, n_salts):
    fdf = spark.createDataFrame(fact, "k int, v int") if fact else spark.createDataFrame([], "k int, v int")
    ddf = spark.createDataFrame(dim, "k int, d int") if dim else spark.createDataFrame([], "k int, d int")
    for how in ("inner", "left_outer"):
        plain = fdf.join(ddf, ["k"], how)
        salted = salted_join(fdf, ddf, ["k"], n_salts=n_salts, how=how)
        assert _counted(salted) == _counted(plain)


upd_rows = st.lists(
    st.tuples(KEYS, VALS, st.integers(0, 50)), min_size=0, max_size=15
)
cur_rows = st.lists(
    st.tuples(KEYS, VALS, st.integers(0, 50)), min_size=0, max_size=15, unique_by=lambda t: t[0]
)


@given(cur=cur_rows, upd=upd_rows)
@_SETTINGS
def test_merge_upsert_laws(spark, cur, upd):
    schema = "k int, v int, ord int"
    cdf = spark.createDataFrame(cur, schema) if cur else spark.createDataFrame([], schema)
    udf_ = spark.createDataFrame(upd, schema) if upd else spark.createDataFrame([], schema)
    merged = merge_upsert(cdf, udf_, ["k"], order_col="ord")
    rows = merged.collect()
    keys = [r.k for r in rows]
    # key partition: one row per key, keys = current ∪ update keys
    assert sorted(keys) == sorted(set(keys))
    assert set(keys) == {t[0] for t in cur} | {t[0] for t in upd}
    # updated keys carry the max-ord update row's ord value
    by_key = {}
    for k, v, o in upd:
        if k not in by_key or o > by_key[k]:
            by_key[k] = o
    for r in rows:
        if r.k in by_key:
            assert r.ord == by_key[r.k]
    # idempotence: applying the same batch again changes nothing
    again = merge_upsert(merged, udf_, ["k"], order_col="ord")
    assert _counted(again) == _counted(merged)


# grouped_row_number ≡ Window.partitionBy(group).orderBy(order) row_number
# on arbitrary data with NULL groups, delimiter bytes, and collisions —
# the skew-free machinery must be observationally identical to the
# window form it replaces
_GROUPS = st.one_of(
    st.none(), st.sampled_from(["", "x", "x\x1f", "\x1fx", "a|b", "∅"])
)
_grp_rows = st.lists(
    st.tuples(_GROUPS, st.integers(0, 50)), min_size=0, max_size=30, unique=True
)


@given(rows=_grp_rows, nparts=st.integers(1, 5))
@_SETTINGS
def test_grouped_row_number_equals_window(spark, rows, nparts):
    from pyspark.sql import Window, functions as F

    from pyspark_skyline_spark.operators.shuffle import grouped_row_number

    schema = "g string, k int"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = {
        (r["g"], r["k"]): r["rn"]
        for r in grouped_row_number(
            df, ["g"], ["k"], pos_col="rn", num_partitions=nparts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("k")
    ref = {
        (r["g"], r["k"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w) - 1).collect()
    }
    assert got == ref


# ntile_by_group ≡ ntile(n) OVER (PARTITION BY g ORDER BY k) on arbitrary
# data with NULL groups and any bucket count — the broadcast-count
# arithmetic must reproduce SQL's remainder rule exactly
@given(rows=_grp_rows, n=st.integers(1, 7))
@_SETTINGS
def test_ntile_by_group_equals_window(spark, rows, n):
    from pyspark.sql import Window, functions as F

    from pyspark_skyline_spark.operators.shuffle import ntile_by_group

    schema = "g string, k int"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = {
        (r["g"], r["k"]): r["tile"]
        for r in ntile_by_group(df, ["g"], ["k"], n, num_partitions=3).collect()
    }
    w = Window.partitionBy("g").orderBy("k")
    ref = {
        (r["g"], r["k"]): r["t"]
        for r in df.withColumn("t", F.ntile(n).over(w)).collect()
    }
    assert got == ref


snap_rows = st.lists(
    st.tuples(KEYS, st.one_of(st.none(), VALS)),
    min_size=0, max_size=12, unique_by=lambda t: t[0],
)


@given(old=snap_rows, new=snap_rows)
@_SETTINGS
def test_snapshot_diff_laws(spark, old, new):
    """snapshot_diff laws on arbitrary key-unique snapshots:
    (1) output keys == union of input keys, exactly once each;
    (2) diff(x, x) is all-unchanged;
    (3) swapping the snapshots maps added<->removed and fixes
        changed/unchanged;
    (4) statuses agree with a dict-based reference (incl. NULL
        transitions under the null-safe compare)."""
    from pyspark_skyline_spark.operators.upsert import snapshot_diff

    schema = "k int, v int"
    odf = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
    ndf = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)

    got = {r["k"]: r["status"] for r in snapshot_diff(odf, ndf, ["k"]).collect()}
    om, nm = dict(old), dict(new)
    assert set(got) == set(om) | set(nm)  # law 1 (unique_by gives one row/key)

    def want(k):
        if k not in om:
            return "added"
        if k not in nm:
            return "removed"
        return "unchanged" if om[k] == nm[k] else "changed"

    assert got == {k: want(k) for k in got}  # law 4

    same = {r["k"]: r["status"] for r in snapshot_diff(odf, odf, ["k"]).collect()}
    assert set(same.values()) <= {"unchanged"}  # law 2

    rev = {r["k"]: r["status"] for r in snapshot_diff(ndf, odf, ["k"]).collect()}
    flip = {"added": "removed", "removed": "added"}
    assert rev == {k: flip.get(v, v) for k, v in got.items()}  # law 3


pair_rows = st.lists(st.tuples(KEYS, KEYS), min_size=0, max_size=10)
doc_rows = st.lists(
    st.tuples(st.integers(0, 6), st.one_of(st.none(), st.integers(0, 30))),
    min_size=1, max_size=7, unique_by=lambda t: t[0],
)


@given(docs=doc_rows, pairs=pair_rows)
@_SETTINGS
def test_dedup_keep_best_laws(spark, docs, pairs):
    """dedup_keep_best laws on arbitrary doc/pair graphs: every input
    doc appears exactly once; every cluster that has documents keeps
    EXACTLY one; the winner's quality is >= every non-NULL quality in
    its cluster; a pair graph never grows the output."""
    from pyspark_skyline_spark.operators.dedup import dedup_keep_best

    ddf = spark.createDataFrame(docs, "doc_id long, n_chars int")
    # restrict edges to existing docs so singleton semantics stay pure
    ids = {d for d, _ in docs}
    edges = [(a, b) for a, b in pairs if a in ids and b in ids and a != b]
    pdf = (
        spark.createDataFrame(edges, "id_a long, id_b long")
        if edges
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    out = dedup_keep_best(ddf, pdf, "doc_id", "n_chars").collect()
    assert sorted(r["doc_id"] for r in out) == sorted(ids)
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    q = dict(docs)
    for cluster, rows in by_cluster.items():
        winners = [r for r in rows if r["keep"]]
        assert len(winners) == 1, cluster
        wq = q[winners[0]["doc_id"]]
        non_null = [q[r["doc_id"]] for r in rows if q[r["doc_id"]] is not None]
        if non_null:
            assert wq is not None and wq >= max(non_null), cluster


_pack_rows = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 30)),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(rows=_pack_rows, L=st.integers(1, 16))
@_SETTINGS
def test_pack_sequences_laws(spark, rows, L):
    """pack_sequences laws on arbitrary (id, length) corpora: the
    spans reproduce an exclusive-cumsum reference exactly; every
    positive-length doc is tiled [0, n) gap-free; every sequence is a
    gap-free window starting at pos 0 with total fill min(L, stream
    remainder); zero-length docs are absent; sum of span lengths ==
    total stream length."""
    from pyspark_skyline_spark.operators.sample import pack_sequences

    schema = "doc_id long, n int"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = sorted(
        (r["seq_id"], r["doc_id"], r["tok_start"], r["tok_end"], r["pos_in_seq"])
        for r in pack_sequences(df, "doc_id", "n", L).collect()
    )
    # exclusive-cumsum reference
    want = []
    off = 0
    for d, n in sorted(rows):
        if n <= 0:
            continue
        for seq in range(off // L, (off + n - 1) // L + 1):
            s0 = seq * L
            a, b = max(off, s0), min(off + n, s0 + L)
            want.append((seq, d, a - off, b - off, a - s0))
        off += n
    assert got == sorted(want)
    total = sum(n for _, n in rows if n > 0)
    assert sum(b - a for _, _, a, b, _ in got) == total
    if total:
        n_seqs = (total + L - 1) // L
        assert {s for s, *_ in got} == set(range(n_seqs))


@given(
    rows=_pack_rows,
    L=st.integers(1, 16),
    shards=st.one_of(st.none(), st.integers(1, 4)),
)
@_SETTINGS
def test_pack_documents_ffd_laws(spark, rows, L, shards):
    """pack_documents_ffd laws on arbitrary (id, length) corpora with
    lengths clamped into [0, L]: every positive-length doc is assigned
    exactly once as a WHOLE span (tok_start=0, tok_end=len); per-bin
    fills are contiguous from 0 in pos order and total <= L; the bin
    count respects the FFD guarantee per shard (<= 11/9*OPT_shard + 1,
    summed); assignment is invariant under input repartitioning. shards
    of None exercises the AUTO path (session-derived shard count, r11
    verdict ask #6) — all laws must hold under it too."""
    from pyspark_skyline_spark.operators.sample import pack_documents_ffd

    rows = [(d, min(n, L)) for d, n in rows]
    schema = "doc_id long, n int"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    out = sorted(
        (r["seq_id"], r["doc_id"], r["tok_start"], r["tok_end"], r["pos_in_seq"])
        for r in pack_documents_ffd(
            df, "doc_id", "n", L, n_shards=shards
        ).collect()
    )
    positive = {d: n for d, n in rows if n > 0}
    assert sorted(t[1] for t in out) == sorted(positive)
    assert all(a == 0 and b == positive[d] for _, d, a, b, _ in out)
    by_bin: dict[int, list] = {}
    for t in out:
        by_bin.setdefault(t[0], []).append(t)
    for _bin, items in by_bin.items():
        items.sort(key=lambda t: t[4])
        fill = 0
        for _, d, _a, b, pos in items:
            assert pos == fill  # contiguous tiling from offset 0
            fill += b
        assert fill <= L
    # FFD bin-count guarantee, shard-local: group by shard prefix
    by_shard: dict[int, list] = {}
    for t in out:
        by_shard.setdefault(t[0] >> 40, []).append(positive[t[1]])
    total_bins = len(by_bin)
    bound = 0
    for lens in by_shard.values():
        # OPT lower bound: volume alone understates OPT when mid-size
        # docs dominate (12 docs of len 2 at L=3: FFD=OPT=12 bins but
        # ceil(sum/L)=8 -> the 11/9 bound on the volume LB is a false
        # theorem, a latent Hypothesis flake — review find, round 12).
        # Docs strictly longer than L/2 cannot share a bin, so their
        # count is a second valid OPT lower bound; take the max.
        opt_lb = max(-(-sum(lens) // L), sum(1 for x in lens if 2 * x > L))
        bound += (11 * opt_lb) // 9 + 2  # 11/9*OPT + 1, integer slack
    assert total_bins <= max(bound, len(by_shard))
    # partitioning invariance (the determinism contract)
    out2 = sorted(
        (r["seq_id"], r["doc_id"], r["tok_start"], r["tok_end"], r["pos_in_seq"])
        for r in pack_documents_ffd(
            df.repartition(7), "doc_id", "n", L, n_shards=shards
        ).collect()
    )
    assert out == out2


def test_pack_documents_ffd_rejects_oversize_and_feeds_gather(spark):
    """A document longer than seq_len raises loudly with its id; and an
    FFD plan executes through the SAME gather executors as
    pack_sequences (whole-document spans reassemble bin content in pos
    order)."""
    import pytest

    from pyspark_skyline_spark.operators.sample import (
        gather_sequences,
        pack_documents_ffd,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bb"), (3, "cccc"), (4, "d")],
        "doc_id long, text string",
    ).withColumn("n", F.length("text"))
    plan = pack_documents_ffd(docs, "doc_id", "n", seq_len=5, n_shards=1)
    got = {
        r["seq_id"]: r["seq_text"]
        for r in gather_sequences(docs, plan, "doc_id").collect()
    }
    # FFD order: lens desc, id asc -> aaaa(4), cccc(4), bb(2), d(1):
    # bin0 = aaaa + d? no: first-fit — aaaa->bin0(cap1), cccc->bin1(cap1),
    # bb->bin2(cap3), d->bin0 (first bin with cap>=1)
    assert sorted(got.values()) == ["aaaad", "bb", "cccc"]
    big = spark.createDataFrame(
        [(9, 10)], "doc_id long, n int"
    )
    with pytest.raises(Exception, match="seq_len"):
        pack_documents_ffd(big, "doc_id", "n", seq_len=5).collect()


def test_pack_position_ids_laws(spark):
    """pack_position_ids laws over a concat-and-split plan: both arrays
    tile the sequence exactly (length == sum of span lengths); segment
    ids start at 0 and step by at most 1 in order; positions are
    contiguous ascending WITHIN a segment; a document split across
    sequences CONTINUES its positions in the next chunk (rotary
    consistency across chunks); and an FFD (whole-document) plan yields
    positions restarting at 0 for every segment."""
    from pyspark.sql import functions as F

    from pyspark_skyline_spark.operators.sample import (
        pack_documents_ffd,
        pack_position_ids,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 9), (4, 2), (5, 7)], "doc_id long, n int"
    )
    plan = pack_sequences(docs, "doc_id", "n", seq_len=8)
    got = {
        r.seq_id: (list(r.position_ids), list(r.segment_ids))
        for r in pack_position_ids(plan).collect()
    }
    total = 5 + 3 + 9 + 2 + 7
    n_seqs = -(-total // 8)
    assert set(got) == set(range(n_seqs))
    assert sum(len(p) for p, _ in got.values()) == total
    for sid, (pos, seg) in got.items():
        assert len(pos) == len(seg)
        if sid < n_seqs - 1:
            assert len(pos) == 8  # full sequences tile exactly
        assert seg[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(seg, seg[1:]))
        # contiguous ascending positions within each segment
        for s_idx in set(seg):
            chunk = [p for p, g in zip(pos, seg) if g == s_idx]
            assert chunk == list(range(chunk[0], chunk[0] + len(chunk)))
    # doc 3 (len 9, offsets 5+3=8..17) spans seqs 1-2: its positions
    # must CONTINUE across the boundary: seq 1 carries 0..7, seq 2
    # opens with 8
    assert got[1][0] == list(range(8)) and got[1][1] == [0] * 8
    assert got[2][0][0] == 8
    # FFD plan: whole documents only -> every segment restarts at 0
    ffd = pack_documents_ffd(docs, "doc_id", "n", seq_len=16, n_shards=1)
    for r in pack_position_ids(ffd).collect():
        pos, seg = list(r.position_ids), list(r.segment_ids)
        for s_idx in set(seg):
            chunk = [p for p, g in zip(pos, seg) if g == s_idx]
            assert chunk[0] == 0 and chunk == list(range(len(chunk)))
    # plan column validation is loud
    import pytest

    with pytest.raises(ValueError, match="seq_id"):
        pack_position_ids(docs)
