"""Deterministic global shuffle / sharding / grouped rank / corpus
mixing (operators/shuffle.py) and sub-document dedup
(operators/dedup.py::paragraph_dedup)."""

import pytest
from pyspark.sql import Row, Window, functions as F

from pyspark_skyline_spark.operators.dedup import paragraph_dedup
from pyspark_skyline_spark.operators.shuffle import (
    allocate_mixture,
    global_row_number,
    global_shuffle,
    grouped_row_number,
    mix_corpus,
)
from pyspark_skyline_spark.plans.explain import assert_max_exchanges


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_global_shuffle_is_a_balanced_permutation(spark, orders):
    out = global_shuffle(orders, ["o_orderkey"], n_shards=8, seed=42)
    n = orders.count()
    rows = out.select("__pos", "__ord", "__shard").collect()
    assert sorted(r["__pos"] for r in rows) == list(range(n))
    # pos order == md5-ord order
    by_pos = sorted(rows, key=lambda r: r["__pos"])
    assert [r["__ord"] for r in by_pos] == sorted(r["__ord"] for r in rows)
    # round-robin shards: balanced to within one row
    from collections import Counter

    c = Counter(r["__shard"] for r in rows)
    assert set(c) == set(range(8))
    assert max(c.values()) - min(c.values()) <= 1


def test_global_shuffle_deterministic_across_partitionings(spark, orders):
    a = global_shuffle(orders, ["o_orderkey"], n_shards=4, seed=7, num_partitions=3)
    b = global_shuffle(
        orders.repartition(11), ["o_orderkey"], n_shards=4, seed=7, num_partitions=8
    )
    ra = {r["o_orderkey"]: (r["__pos"], r["__shard"]) for r in a.collect()}
    rb = {r["o_orderkey"]: (r["__pos"], r["__shard"]) for r in b.collect()}
    assert ra == rb
    # a different seed is a different permutation
    c = global_shuffle(orders, ["o_orderkey"], n_shards=4, seed=8)
    rc = {r["o_orderkey"]: r["__pos"] for r in c.collect()}
    assert rc != {k: v[0] for k, v in ra.items()}


def test_global_row_number_single_range_shuffle(spark, orders):
    out = global_shuffle(orders, ["o_orderkey"], n_shards=8)
    # ONE range exchange; offsets arrive via broadcast (not counted).
    # budget 2 because the persisted subplan's AdaptiveSparkPlan prints
    # the same exchange twice (== Initial Plan == + == Final Plan ==);
    # the rangepartitioning assert below pins the real count
    assert_max_exchanges(out, 2)
    from pyspark_skyline_spark.plans.explain import formatted_plan

    plan = formatted_plan(out)
    assert plan.count("rangepartitioning") <= 2  # initial+final of ONE node
    assert "hashpartitioning" not in plan  # no window/hash re-shuffle


def test_grouped_row_number_matches_window_reference(spark, orders):
    out = grouped_row_number(
        orders, ["o_orderstatus"], ["o_orderkey"], pos_col="rn", num_partitions=5
    )
    got = {(r["o_orderstatus"], r["o_orderkey"]): r["rn"] for r in out.collect()}
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    ref = {
        (r["o_orderstatus"], r["o_orderkey"]): r["rn"]
        for r in orders.withColumn("rn", F.row_number().over(w) - 1).collect()
    }
    assert got == ref
    assert_max_exchanges(out, 2)  # ONE range exchange, printed twice by AQE


def test_allocate_mixture_exact_and_deterministic():
    alloc = allocate_mixture({"a": 0.5, "b": 0.3, "c": 0.2}, 10)
    assert alloc == {"a": 5, "b": 3, "c": 2}
    # largest remainder: 7*0.5=3.5, 7*0.3=2.1, 7*0.4... use uneven
    alloc = allocate_mixture({"a": 1.0, "b": 1.0, "c": 1.0}, 7)
    assert sum(alloc.values()) == 7
    assert alloc == allocate_mixture({"a": 1.0, "b": 1.0, "c": 1.0}, 7)
    assert sorted(alloc.values()) == [2, 2, 3]
    with pytest.raises(ValueError):
        allocate_mixture({"a": 0.0}, 5)


def test_mix_corpus_exact_counts_and_order(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    targets = {"src1": 10, "src3": 3, "src7": 100, "src19": 0}
    out = mix_corpus(docs, "source", targets, ["doc_id"], seed=7)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) <= {"src1", "src3", "src7"}
    for d in ("src1", "src3", "src7"):
        assert counts.get(d, 0) == min(targets[d], avail[d])
    # the kept rows per domain are the target-smallest by md5 order
    ordv = F.md5(F.concat_ws("|", F.lit("7"), F.col("doc_id").cast("string")))
    ref = docs.withColumn("__o", ordv)
    w = Window.partitionBy("source").orderBy("__o")
    ref_ids = {
        r["doc_id"]
        for r in ref.withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            <= F.when(F.col("source") == "src1", 10)
            .when(F.col("source") == "src3", 3)
            .when(F.col("source") == "src7", 100)
            .otherwise(0)
        )
        .collect()
    }
    assert {r["doc_id"] for r in out.collect()} == ref_ids


def test_paragraph_dedup_keep_first_and_reassembly(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aa bb|cc dd|ee"),
            Row(doc_id=2, text="cc dd|zz yy|aa bb"),
            Row(doc_id=3, text="aa bb|cc dd"),
        ]
    )
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in paragraph_dedup(docs, "doc_id", "text", sep="|").collect()
    }
    # doc 1 keeps everything (first occurrence of all three units)
    assert out[1] == ("aa bb|cc dd|ee", 3)
    # doc 2 loses "cc dd" and "aa bb" to doc 1, keeps its own "zz yy"
    assert out[2] == ("zz yy", 1)
    # doc 3 is entirely duplicate -> vanishes
    assert 3 not in out


def test_paragraph_dedup_chunk_mode(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b c d e"),  # chunks(2): "a b","c d","e"
            Row(doc_id=11, text="c d a b x"),  # "c d","a b" dup; keeps "x"
        ]
    )
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in paragraph_dedup(docs, "doc_id", "text", chunk_words=2).collect()
    }
    assert out[10] == ("a b c d e", 3)
    assert out[11] == ("x", 1)
    with pytest.raises(ValueError):
        paragraph_dedup(docs, "doc_id", "text")
    with pytest.raises(ValueError):
        paragraph_dedup(docs, "doc_id", "text", sep="|", chunk_words=2)


def test_paragraph_dedup_plan_is_join_free_two_exchanges(spark, sf_dir):
    # the winner aggregate carries the unit text in its min-struct, so
    # the kept units flow straight into reassembly: exactly TWO
    # exchanges (partial-agged __ph shuffle + per-doc reassembly) and
    # NO join back to the occurrence table
    from pyspark_skyline_spark.plans.explain import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = paragraph_dedup(docs, "doc_id", "text", chunk_words=8)
    assert_max_exchanges(out, 2)
    assert "Join" not in formatted_plan(out)


def test_paragraph_dedup_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = paragraph_dedup(docs, "doc_id", "text", chunk_words=8)
    b = paragraph_dedup(docs.repartition(13), "doc_id", "text", chunk_words=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_grouped_row_number_null_and_delimiter_groups(spark):
    # ("x", NULL) vs (NULL, "x") vs ("x\x1f", "") must be DISTINCT
    # groups (code-review finding: concat_ws drops NULLs and does not
    # escape, collapsing such groups into one interleaved numbering)
    rows = [
        ("x", None, 1), ("x", None, 2),
        (None, "x", 3), (None, "x", 4), (None, "x", 5),
        ("x\x1f", "", 6),
    ]
    df = spark.createDataFrame(rows, "a string, b string, k int")
    out = grouped_row_number(df, ["a", "b"], ["k"], pos_col="rn", num_partitions=3)
    got = {(r["a"], r["b"], r["k"]): r["rn"] for r in out.collect()}
    assert got[("x", None, 1)] == 0 and got[("x", None, 2)] == 1
    assert [got[(None, "x", k)] for k in (3, 4, 5)] == [0, 1, 2]
    assert got[("x\x1f", "", 6)] == 0


def test_grouped_row_number_many_groups_window_fallback(spark, orders):
    # grouping by a (near-)unique key makes the driver stitch
    # O(rows) — past max_groups the op must fall back to
    # Window.partitionBy and still be observationally identical
    with pytest.warns(UserWarning, match="falling back to\\s+Window.partitionBy"):
        out = grouped_row_number(
            orders, ["o_custkey"], ["o_orderkey"], pos_col="rn", max_groups=10
        )
    got = {(r["o_custkey"], r["o_orderkey"]): r["rn"] for r in out.collect()}
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    ref = {
        (r["o_custkey"], r["o_orderkey"]): r["rn"]
        for r in orders.withColumn("rn", F.row_number().over(w) - 1).collect()
    }
    assert got == ref
    # the fallback plan hash-partitions on the group (no range shuffle)
    from pyspark_skyline_spark.plans.explain import formatted_plan

    plan = formatted_plan(out)
    assert "hashpartitioning" in plan and "rangepartitioning" not in plan


def test_grouped_row_number_many_groups_error_mode(spark, orders):
    with pytest.raises(RuntimeError, match="distinct groups exceeds"):
        grouped_row_number(
            orders,
            ["o_custkey"],
            ["o_orderkey"],
            max_groups=10,
            on_many_groups="error",
        )
    with pytest.raises(ValueError, match="on_many_groups"):
        grouped_row_number(orders, ["o_custkey"], ["o_orderkey"], on_many_groups="no")


def test_grouped_row_number_hint_skips_probe(spark, orders):
    # a hint under the cap takes the range-shuffle path with NO probe
    # job (hint trusted); a hint over the cap falls back immediately
    out = grouped_row_number(
        orders,
        ["o_orderstatus"],
        ["o_orderkey"],
        pos_col="rn",
        num_groups_hint=3,
        num_partitions=4,
    )
    from pyspark_skyline_spark.plans.explain import formatted_plan

    # range path: ends in the broadcast adjustment join (the stats job
    # materialized the lazy checkpoint, so the range exchange itself is
    # below the checkpoint cut); fallback path: a window over a hash
    # shuffle, no broadcast join
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan and "Window" not in plan
    with pytest.warns(UserWarning):
        out2 = grouped_row_number(
            orders,
            ["o_orderstatus"],
            ["o_orderkey"],
            pos_col="rn",
            num_groups_hint=10**9,
        )
    plan2 = formatted_plan(out2)
    assert "Window" in plan2 and "hashpartitioning" in plan2
    a = sorted((r["o_orderstatus"], r["o_orderkey"], r["rn"]) for r in out.collect())
    b = sorted((r["o_orderstatus"], r["o_orderkey"], r["rn"]) for r in out2.collect())
    assert a == b


def test_grouped_row_number_signed_zero_groups_consistent(spark):
    # both plans must use the SAME normalized group key: the range path
    # string-casts (0.0 vs -0.0 -> distinct groups), so the window
    # fallback must too (raw Window.partitionBy would normalize -0.0
    # into 0.0 and merge the numbering)
    rows = [(0.0, 1), (-0.0, 2), (0.0, 3), (-0.0, 4)]
    df = spark.createDataFrame(rows, "g double, k int")
    a = {
        (str(r["g"]), r["k"]): r["rn"]
        for r in grouped_row_number(df, ["g"], ["k"], pos_col="rn").collect()
    }
    with pytest.warns(UserWarning):
        b = {
            (str(r["g"]), r["k"]): r["rn"]
            for r in grouped_row_number(
                df, ["g"], ["k"], pos_col="rn", max_groups=1
            ).collect()
        }
    assert a == b
    assert a[("0.0", 1)] == 0 and a[("0.0", 3)] == 1
    assert a[("-0.0", 2)] == 0 and a[("-0.0", 4)] == 1


def test_ntile_global_matches_window_ntile(spark, orders):
    from pyspark_skyline_spark.operators.shuffle import ntile_global

    out = ntile_global(
        orders.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        8,
        num_partitions=5,
    )
    got = {r["o_orderkey"]: r["tile"] for r in out.collect()}
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ref = {
        r["o_orderkey"]: r["t"]
        for r in orders.withColumn("t", F.ntile(8).over(w)).collect()
    }
    assert got == ref
    # the plan must NOT contain the single-task global window
    from pyspark_skyline_spark.plans.explain import formatted_plan

    assert "Window" not in formatted_plan(out)


def test_ntile_by_group_matches_window(spark, orders):
    from pyspark_skyline_spark.operators.shuffle import ntile_by_group

    out = ntile_by_group(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        ["o_orderstatus"],
        ["o_totalprice", "o_orderkey"],
        4,
        num_partitions=5,
    )
    got = {r["o_orderkey"]: r["tile"] for r in out.collect()}
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ref = {
        r["o_orderkey"]: r["t"]
        for r in orders.withColumn("t", F.ntile(4).over(w)).collect()
    }
    assert got == ref
    # NULL group + tiny groups take the same arithmetic
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), ("a", 4), ("a", 5)], "g string, k int"
    )
    got2 = {
        r["k"]: r["tile"]
        for r in ntile_by_group(df, ["g"], ["k"], 2, num_partitions=2).collect()
    }
    assert got2 == {1: 1, 2: 1, 3: 2, 4: 1, 5: 2}
    # high-cardinality fallback regime: tile comes from F.ntile over the
    # window — NO per-group broadcast structure — and must be identical
    with pytest.warns(UserWarning):
        fb = ntile_by_group(
            orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
            ["o_orderstatus"],
            ["o_totalprice", "o_orderkey"],
            4,
            max_groups=1,
        )
    got_fb = {r["o_orderkey"]: r["tile"] for r in fb.collect()}
    assert got_fb == ref
    from pyspark_skyline_spark.plans.explain import formatted_plan

    assert "Window" in formatted_plan(fb)
    with pytest.raises(RuntimeError, match="distinct groups exceeds"):
        ntile_by_group(
            orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
            ["o_orderstatus"],
            ["o_totalprice", "o_orderkey"],
            4,
            max_groups=1,
            on_many_groups="error",
        )


def test_ntile_global_edge_cases(spark):
    from pyspark_skyline_spark.operators.shuffle import ntile_global

    # fewer rows than buckets: each row its own 1-based bucket
    df = spark.createDataFrame([(3,), (1,), (2,)], "k int")
    got = {r["k"]: r["tile"] for r in ntile_global(df, ["k"], 10).collect()}
    assert got == {1: 1, 2: 2, 3: 3}
    # exact division and remainder rule (7 rows, 3 buckets: 3/2/2)
    df7 = spark.createDataFrame([(i,) for i in range(7)], "k int")
    tiles = [r["tile"] for r in ntile_global(df7, ["k"], 3).orderBy("k").collect()]
    assert tiles == [1, 1, 1, 2, 2, 3, 3]
    with pytest.raises(ValueError):
        ntile_global(df7, ["k"], 0)


def test_mix_corpus_empty_targets(spark, orders):
    out = mix_corpus(orders, "o_orderstatus", {}, ["o_orderkey"])
    assert out.count() == 0
    assert "mix_rank" in out.columns


def test_write_shards_layout_and_determinism(spark, orders, tmp_path):
    from pyspark_skyline_spark.operators.shuffle import write_shards

    out = str(tmp_path / "shards")
    write_shards(orders, out, ["o_orderkey"], n_shards=4, seed=9)
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("__shard="))
    assert dirs == [f"__shard={i}" for i in range(4)]
    back = spark.read.parquet(out)
    n = orders.count()
    assert back.count() == n
    # balanced to within one row; __pos % 4 == shard
    sizes = {r["__shard"]: r["n"] for r in back.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert back.where(F.col("__pos") % 4 != F.col("__shard")).count() == 0
    # same seed -> byte-identical layout (same keys per shard)
    out2 = str(tmp_path / "shards2")
    write_shards(orders, out2, ["o_orderkey"], n_shards=4, seed=9)
    a = sorted(map(tuple, back.select("o_orderkey", "__pos", "__shard").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).select("o_orderkey", "__pos", "__shard").collect()))
    assert a == b


def test_paragraph_dedup_incremental_cross_batch(spark):
    from pyspark_skyline_spark.operators.dedup import (
        paragraph_dedup,
        paragraph_dedup_incremental,
    )

    b1 = spark.createDataFrame(
        [Row(doc_id=1, text="aa bb|cc dd"), Row(doc_id=2, text="cc dd|ee ff")]
    )
    # first batch (no ledger) == the batch operator
    docs1, h1 = paragraph_dedup_incremental(b1, None, "doc_id", "text", sep="|")
    batch = paragraph_dedup(b1, "doc_id", "text", sep="|")
    assert sorted(map(tuple, docs1.collect())) == sorted(map(tuple, batch.collect()))
    assert h1.count() == 3  # "aa bb", "cc dd", "ee ff"

    # second batch vs the accumulated ledger: known units drop even
    # though they are this batch's first occurrence
    b2 = spark.createDataFrame(
        [Row(doc_id=10, text="cc dd|gg hh"), Row(doc_id=11, text="ee ff|gg hh")]
    )
    docs2, h2 = paragraph_dedup_incremental(b2, h1, "doc_id", "text", sep="|")
    got = {r["doc_id"]: r["text_dedup"] for r in docs2.collect()}
    assert got == {10: "gg hh"}  # 11 fully known/dup -> vanishes
    assert {r["ph"] for r in h2.collect()} == {
        r["ph"]
        for r in spark.createDataFrame([("gg hh",)], "t string")
        .select(F.md5("t").alias("ph"))
        .collect()
    }
    # replay safety: re-running batch 2 against the grown ledger drops everything
    ledger = h1.union(h2)
    docs2r, h2r = paragraph_dedup_incremental(b2, ledger, "doc_id", "text", sep="|")
    assert docs2r.count() == 0 and h2r.count() == 0


def test_rank_ensemble_matches_hand_model(spark):
    """rank_ensemble == hand-computed per-signal global ranks (ties
    broken by id), integer rank sum, and the ceil(keep_frac * N) cut;
    rows with a NULL signal are excluded; direction flags invert the
    order; bad arguments rejected loudly."""
    import math

    import pytest

    from pyspark_skyline_spark.operators.shuffle import rank_ensemble

    #          id, good (higher better), bad (lower better)
    rows = [
        (1, 10.0, 0.1),
        (2, 30.0, 0.5),
        (3, 30.0, 0.0),  # ties with 2 on good -> id breaks the tie
        (4, 5.0, 0.2),
        (5, None, 0.0),  # NULL signal -> excluded entirely
        (6, 20.0, 0.3),
    ]
    df = spark.createDataFrame(rows, "id long, good double, bad double")
    got = {
        r.id: (r.rank_good, r.rank_bad, r.rank_sum, r.keep)
        for r in rank_ensemble(
            df, "id", [("good", True), ("bad", False)], keep_frac=0.5
        ).collect()
    }
    ranked = [1, 2, 3, 4, 6]
    good = {r[0]: r[1] for r in rows if r[0] in ranked}
    bad = {r[0]: r[2] for r in rows if r[0] in ranked}
    rank_good = {
        i: 1 + sorted(ranked, key=lambda j: (-good[j], j)).index(i) for i in ranked
    }
    rank_bad = {
        i: 1 + sorted(ranked, key=lambda j: (bad[j], j)).index(i) for i in ranked
    }
    sums = {i: rank_good[i] + rank_bad[i] for i in ranked}
    fin = sorted(ranked, key=lambda j: (sums[j], j))
    cut = math.ceil(0.5 * len(ranked))
    assert set(got) == set(ranked)  # id 5 excluded
    for i in ranked:
        assert got[i] == (
            rank_good[i],
            rank_bad[i],
            sums[i],
            fin.index(i) + 1 <= cut,
        ), i
    assert sum(1 for v in got.values() if v[3]) == cut
    # tie on `good` between 2 and 3 resolved by id: 2 outranks 3
    assert got[2][0] + 1 == got[3][0]

    with pytest.raises(ValueError):
        rank_ensemble(df, "id", [], keep_frac=0.5)
    with pytest.raises(ValueError):
        rank_ensemble(df, "id", [("good", True), ("good", False)])
    with pytest.raises(ValueError):
        rank_ensemble(df, "id", [("good", True)], keep_frac=0.0)


def test_global_prefix_sum_matches_python(spark):
    """global_prefix_sum == an exclusive Python cumsum in order, across
    partition layouts; first row gets 0; empty frame yields empty."""
    import random

    from pyspark_skyline_spark.operators.shuffle import global_prefix_sum

    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 50)) for i in range(200)]
    want, acc = {}, 0
    for i, v in rows:
        want[i] = acc
        acc += v
    df = spark.createDataFrame(rows, "id long, v int")
    for layout in (df, df.repartition(13)):
        got = {
            r["id"]: r["__off"]
            for r in global_prefix_sum(layout, ["id"], "v").collect()
        }
        assert got == want
    empty = spark.createDataFrame([], "id long, v int")
    assert global_prefix_sum(empty, ["id"], "v").count() == 0


def test_pack_sequences_matches_hand_model(spark):
    """pack_sequences == a Python concat-and-split reference: spans
    tile each document exactly, sequences are gap-free fixed-length
    windows (last may be partial), zero-length docs are absent, and
    the layout is partitioning-invariant."""
    from pyspark_skyline_spark.operators.sample import pack_sequences

    rows = [(1, 5), (2, 0), (3, 12), (4, 3), (5, 7), (6, 1)]
    L = 8
    # python reference
    want = []
    off = 0
    for d, n in rows:
        if n <= 0:
            continue
        for seq in range(off // L, (off + n - 1) // L + 1):
            s0, s1 = seq * L, seq * L + L
            a, b = max(off, s0), min(off + n, s1)
            want.append((seq, d, a - off, b - off, a - s0))
        off += n
    df = spark.createDataFrame(rows, "doc_id long, n int")
    for layout in (df, df.repartition(5)):
        got = sorted(
            (r["seq_id"], r["doc_id"], r["tok_start"], r["tok_end"], r["pos_in_seq"])
            for r in pack_sequences(layout, "doc_id", "n", L).collect()
        )
        assert got == sorted(want)
    # invariants: per-doc spans tile [0, n); per-seq fills are gap-free
    per_doc = {}
    per_seq = {}
    for seq, d, a, b, p in want:
        per_doc.setdefault(d, []).append((a, b))
        per_seq.setdefault(seq, []).append((p, p + (b - a)))
    for d, n in rows:
        if n <= 0:
            assert d not in per_doc
            continue
        spans = sorted(per_doc[d])
        assert spans[0][0] == 0 and spans[-1][1] == n
        assert all(spans[i][1] == spans[i + 1][0] for i in range(len(spans) - 1))
    total = sum(n for _, n in rows if n > 0)
    for seq, fills in per_seq.items():
        fills = sorted(fills)
        assert fills[0][0] == 0
        assert all(fills[i][1] == fills[i + 1][0] for i in range(len(fills) - 1))
        if (seq + 1) * L <= total:
            assert fills[-1][1] == L  # full sequence

    import pytest as _pt

    with _pt.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "n", 0)
    with _pt.raises(ValueError, match="not found"):
        pack_sequences(df, "doc_id", "nope", 8)


def test_gather_sequences_reconstructs_the_stream(spark):
    """gather_sequences(plan) == the concatenated corpus stream cut at
    seq_len: full planner->executor round trip, including a partial
    final sequence and multi-sequence documents."""
    from pyspark_skyline_spark.operators.sample import (
        gather_sequences,
        pack_sequences,
    )

    rows = [
        (1, "abcde"),
        (2, ""),
        (3, "fghijklmnopq"),
        (4, "rst"),
        (5, "uvwxyz!"),
        (6, "?"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    )
    L = 8
    stream = "".join(t for _, t in rows)
    want = {
        i: stream[i * L : (i + 1) * L] for i in range((len(stream) + L - 1) // L)
    }
    plan = pack_sequences(df, "doc_id", "n_chars", L)
    got = {
        r["seq_id"]: r["seq_text"]
        for r in gather_sequences(df, plan, "doc_id").collect()
    }
    assert got == want

    import pytest as _pt

    with _pt.raises(ValueError, match="not found"):
        gather_sequences(df, plan.drop("seq_id"), "doc_id")


def test_gather_sequences_rejects_past_int_range_span(spark):
    """A span starting past 2^31-1 characters is loudly unindexable
    (substring positions are int-typed in Spark): the in-plan guard
    raises with the offending id instead of mis-slicing (non-ANSI
    wraps) or throwing an opaque CAST_OVERFLOW (ANSI). Exercised with
    a hand-built plan row — a real >2 GiB document is infeasible in a
    test, and the guard reads only the plan's integers."""
    from pyspark.errors import SparkRuntimeException

    from pyspark_skyline_spark.operators.sample import gather_sequences

    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    plan = spark.createDataFrame(
        [(0, 1, (1 << 31) + 5, (1 << 31) + 9, 0)],
        "seq_id long, doc_id long, tok_start long, tok_end long, pos_in_seq long",
    )
    with pytest.raises(SparkRuntimeException, match="2\\^31-1 character"):
        gather_sequences(df, plan, "doc_id").collect()


def test_gather_token_sequences_reconstructs_the_token_stream(spark):
    """Token-unit round trip: pack on token COUNTS, gather the token
    ARRAYS — flattened output == the concatenated corpus token stream
    cut at seq_len, every sequence but the last exactly seq_len long,
    element type preserved. The unit-agnosticism the r10 verdict asked
    to make real (ask #4)."""
    from pyspark_skyline_spark.operators.sample import (
        gather_token_sequences,
        pack_sequences,
    )

    rows = [
        (1, ["a", "b", "c"]),
        (2, []),
        (3, ["d", "e", "f", "g", "h", "i", "j"]),
        (4, ["k"]),
        (5, ["l", "m", "n", "o", "p"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    ).withColumn("n_tok", F.size("tokens"))
    L = 4
    stream = [t for _, toks in rows for t in toks]
    want = {
        i: stream[i * L : (i + 1) * L]
        for i in range((len(stream) + L - 1) // L)
    }
    plan = pack_sequences(df, "doc_id", "n_tok", L)
    out = gather_token_sequences(df, plan, "doc_id", tokens_col="tokens")
    assert dict(out.dtypes)["seq_tokens"] == "array<string>"
    got = {r["seq_id"]: list(r["seq_tokens"]) for r in out.collect()}
    assert got == want
    full = [s for s in got.values() if len(s) == L]
    assert len(full) >= len(got) - 1  # only the final sequence may be short

    with pytest.raises(ValueError, match="not found"):
        gather_token_sequences(df, plan, "doc_id", tokens_col="nope")


def test_gather_token_sequences_subword_pipeline(spark):
    """End-to-end token-mode packing over the documents-table shape:
    tokenize with the BPE-ish pre-lexer (text.py::_SUBWORD_SPLIT runs),
    plan on size(tokens), gather the arrays — round-trip equals the
    concatenated run stream. Pins that the packing family actually
    feeds a tokenizer-based pipeline, not just character spans."""
    from pyspark_skyline_spark.operators.sample import (
        gather_token_sequences,
        pack_sequences,
    )
    from pyspark_skyline_spark.operators.text import _SUBWORD_SPLIT

    rows = [
        (10, "Hello, world! 42 times"),
        (11, ""),
        (12, "foo_bar baz-qux 7x7"),
        (13, "one"),
    ]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn(
            "tokens",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_SUBWORD_SPLIT), 0
            ),
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    import re

    stream = [
        t for _, txt in rows for t in re.findall(_SUBWORD_SPLIT, txt.lower())
    ]
    L = 5
    want = {
        i: stream[i * L : (i + 1) * L]
        for i in range((len(stream) + L - 1) // L)
    }
    plan = pack_sequences(df, "doc_id", "n_tok", L)
    got = {
        r["seq_id"]: list(r["seq_tokens"])
        for r in gather_token_sequences(df, plan, "doc_id").collect()
    }
    assert got == want


def test_pack_documents_ffd_plan_one_metadata_exchange(spark, sf_dir):
    """pack_documents_ffd's plan budget: exactly ONE exchange (the
    shard clustering for the per-shard greedy) over the (id, len)
    metadata projection — the text column must never enter the plan."""
    from pyspark_skyline_spark.operators.sample import pack_documents_ffd
    from pyspark_skyline_spark.plans.explain import (
        assert_max_exchanges,
        formatted_plan,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = pack_documents_ffd(docs, "doc_id", "n_chars", 1024, n_shards=8)
    assert_max_exchanges(plan, 1)
    assert "text#" not in formatted_plan(plan)


def test_pack_sequences_plan_two_narrow_exchanges(spark, sf_dir):
    """pack_sequences' plan budget: exactly the two documented narrow
    exchanges (the prefix sum's range shuffle + the window's gpid
    clustering) over the (id, length, order) projection — the text
    column must never enter the shuffled plan."""
    from pyspark_skyline_spark.operators.sample import pack_sequences
    from pyspark_skyline_spark.plans.explain import (
        assert_max_exchanges,
        formatted_plan,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = pack_sequences(docs, "doc_id", "n_chars", 2048)
    assert_max_exchanges(plan, 2)
    assert "text#" not in formatted_plan(plan)


def test_temperature_targets_laws(spark):
    """temperature_targets laws: allocations sum to total; bigger
    domains never get fewer seats (monotone in count); tau=0.5 exact
    integer comparisons agree with a float highest-averages reference;
    tau=1 approaches proportional; tau=0 is uniform-ish (max spread 1);
    deterministic across calls; empty/zero edges."""
    import pytest

    from pyspark_skyline_spark.operators.shuffle import temperature_targets

    rows = [(i, f"src{j}") for j, m in enumerate([320, 80, 20, 5]) for i in range(m)]
    ids = [(k, s) for k, (_, s) in enumerate(rows)]
    df = spark.createDataFrame(ids, "doc_id long, source string")
    counts = {"src0": 320, "src1": 80, "src2": 20, "src3": 5}

    t = temperature_targets(df, "source", total=100, tau=0.5)
    assert sum(t.values()) == 100 and set(t) == set(counts)
    assert t["src0"] >= t["src1"] >= t["src2"] >= t["src3"]

    # float highest-averages reference (greedy, same tie rule)
    def ref(counts, total, tau):
        alloc = {k: 0 for k in counts}
        for _ in range(total):
            best = min(
                sorted(counts),
                key=lambda d: (-(counts[d] ** tau / (alloc[d] + 1)), d),
            )
            alloc[best] += 1
        return alloc

    assert t == ref(counts, 100, 0.5)
    # sqrt flattening: small domains get MORE than proportional share
    prop = temperature_targets(df, "source", total=100, tau=1.0)
    assert t["src3"] >= prop["src3"]
    uni = temperature_targets(df, "source", total=100, tau=0.0)
    assert max(uni.values()) - min(uni.values()) <= 1
    assert temperature_targets(df, "source", total=100, tau=0.5) == t
    assert temperature_targets(df, "source", total=0) == {k: 0 for k in counts}
    empty = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_targets(empty, "source", total=10) == {}
    with pytest.raises(ValueError, match="total"):
        temperature_targets(df, "source", total=-1)
