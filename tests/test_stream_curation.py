"""Streaming incremental near-dup ingest (streaming/curation.py):
cross-batch dedup through the accumulated signature ledger, replay
idempotency, and the crash-ordering contract."""

import os
import time

from pyspark.sql import functions as F

from pyspark_skyline_spark.streaming.curation import (
    committed_ledger,
    run_incremental_dedup_stream,
)

SCHEMA = "doc_id long, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the quiet green field toward the distant hills today"
)
OTHER = (
    "an entirely different document about spark joins and shuffle "
    "partitioning strategies at large scale with broadcast hints"
)


def _write_batch(spark, src, name, rows, when=None):
    os.makedirs(src, exist_ok=True)
    path = os.path.join(src, name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    t = when or time.time()
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))
    os.utime(path, (t, t))


def _run(spark, src, out, ledger, chk):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = run_incremental_dedup_stream(
        stream, out, ledger, "doc_id", checkpoint_dir=chk, threshold=0.5
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
    assert finished, "availableNow curation query did not finish in time"


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    chk = str(tmp_path / "chk")
    _write_batch(spark, src, "b0.parquet", [(1, BASE), (2, OTHER)], when=time.time())
    _run(spark, src, out, ledger, chk)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}

    # batch 1: a near-copy of doc 1, plus fresh content
    near = BASE.replace("lazy dog", "sleepy dog")
    fresh = ("completely unrelated new text about parquet footers with "
             "statistics for pruning row groups during scans")
    _write_batch(spark, src, "b1.parquet", [(10, near), (11, fresh)],
                 when=time.time() + 5)
    _run(spark, src, out, ledger, chk)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 11}  # near-copy 10 dropped via the LEDGER

    # the ledger accumulated only survivors
    led = committed_ledger(spark, ledger)
    assert {r.ledger_id for r in led.collect()} == {1, 2, 11}


def test_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint replays every batch against the existing
    ledger/out dirs: committed epochs are skipped, nothing duplicates,
    and nothing is wrongly dropped (the out-before-ledger ordering)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    _write_batch(spark, src, "b0.parquet", [(1, BASE)], when=time.time())
    _write_batch(spark, src, "b1.parquet", [(2, OTHER)], when=time.time() + 5)
    _run(spark, src, out, ledger, str(tmp_path / "chk1"))
    before = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert before == [1, 2]

    _run(spark, src, out, ledger, str(tmp_path / "chk2"))  # full replay
    after = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert after == before
    assert sorted(r.ledger_id for r in committed_ledger(spark, ledger).collect()) == [1, 2]


def test_crash_between_out_and_ledger(spark, tmp_path):
    """Simulated crash window: out epoch committed, ledger epoch not.
    The replay must recompute the SAME survivors (ledger state without
    the half-done epoch) and complete the ledger write."""
    import shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    _write_batch(spark, src, "b0.parquet", [(1, BASE), (2, OTHER)], when=time.time())
    _run(spark, src, out, ledger, str(tmp_path / "chk1"))
    # "crash": drop the ledger epoch commit entirely
    shutil.rmtree(os.path.join(ledger, "epoch=0"))
    assert committed_ledger(spark, ledger).count() == 0

    _run(spark, src, out, ledger, str(tmp_path / "chk2"))  # replay epoch
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 2]
    assert committed_ledger(spark, ledger).count() == 2  # ledger healed


def test_blank_docs_pass_without_ledger_entries(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    _write_batch(spark, src, "b0.parquet", [(1, BASE), (2, None), (3, "  ")],
                 when=time.time())
    _run(spark, src, out, ledger, str(tmp_path / "chk"))
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 3}
    # only the substantive doc entered the ledger
    assert {r.ledger_id for r in committed_ledger(spark, ledger).collect()} == {1}


def _run_para(spark, src, out, ledger, chk, n_shards=4):
    from pyspark_skyline_spark.streaming.curation import run_paragraph_dedup_stream

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = run_paragraph_dedup_stream(
        stream, out, ledger, "doc_id", checkpoint_dir=chk, sep="|",
        n_shards=n_shards,
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
    assert finished, "availableNow paragraph curation query did not finish"


def test_paragraph_stream_equals_batch_and_shard_invariants(spark, tmp_path):
    """Cross-batch contract: streaming the corpus in two batches through
    run_paragraph_dedup_stream must keep exactly the documents/text the
    one-shot batch paragraph_dedup keeps (ids increase with arrival
    order, so keep-first agrees), and every epoch's shard layout must
    hold write_shards' invariants (pos % n == shard, balance <= 1)."""
    from pyspark.sql import functions as F

    from pyspark_skyline_spark.operators.dedup import paragraph_dedup
    from pyspark_skyline_spark.streaming.curation import committed_unit_ledger

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    b0 = [(1, "aa bb|cc dd"), (2, "cc dd|ee ff")]
    b1 = [(10, "cc dd|gg hh"), (11, "ee ff|aa bb"), (12, "ii jj|gg hh")]
    _write_batch(spark, src, "b0.parquet", b0, when=time.time())
    _write_batch(spark, src, "b1.parquet", b1, when=time.time() + 5)
    _run_para(spark, src, out, ledger, str(tmp_path / "chk"))

    got = {
        (r.doc_id, r.text_dedup, r.n_kept)
        for r in spark.read.parquet(out)
        .select("doc_id", "text_dedup", "n_kept")
        .collect()
    }
    ref_df = spark.createDataFrame(b0 + b1, SCHEMA)
    ref = {
        (r.doc_id, r.text_dedup, r.n_kept)
        for r in paragraph_dedup(ref_df, "doc_id", "text", sep="|").collect()
    }
    assert got == ref

    # ledger accumulated exactly the distinct unit hashes
    led = committed_unit_ledger(spark, ledger)
    assert led.count() == 5  # aa bb, cc dd, ee ff, gg hh, ii jj
    assert led.select("ph").distinct().count() == 5

    # shard invariants per epoch
    for epoch in ("epoch=0", "epoch=1"):
        edf = spark.read.parquet(os.path.join(out, epoch))
        n = edf.count()
        if n == 0:
            continue
        assert edf.where(F.col("__pos") % 4 != F.col("__shard")).count() == 0
        sizes = [
            r.n
            for r in edf.groupBy("__shard").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        assert max(sizes) - min(sizes) <= 1


def test_paragraph_stream_replay_and_crash_window(spark, tmp_path):
    """Replay with a fresh checkpoint changes nothing; a crash between
    the shard write and the ledger write heals on replay (same
    survivors recomputed against the identical ledger state)."""
    import shutil

    from pyspark_skyline_spark.streaming.curation import committed_unit_ledger

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ledger = str(tmp_path / "ledger")
    _write_batch(spark, src, "b0.parquet", [(1, "aa bb|cc dd")], when=time.time())
    _write_batch(spark, src, "b1.parquet", [(2, "cc dd|xx yy")], when=time.time() + 5)
    _run_para(spark, src, out, ledger, str(tmp_path / "chk1"))
    before = sorted(
        (r.doc_id, r.text_dedup)
        for r in spark.read.parquet(out).select("doc_id", "text_dedup").collect()
    )
    assert before == [(1, "aa bb|cc dd"), (2, "xx yy")]

    _run_para(spark, src, out, ledger, str(tmp_path / "chk2"))  # full replay
    after = sorted(
        (r.doc_id, r.text_dedup)
        for r in spark.read.parquet(out).select("doc_id", "text_dedup").collect()
    )
    assert after == before
    assert committed_unit_ledger(spark, ledger).count() == 3

    # crash window: ledger epoch 1 lost after out epoch 1 committed
    shutil.rmtree(os.path.join(ledger, "epoch=1"))
    _run_para(spark, src, out, ledger, str(tmp_path / "chk3"))
    assert committed_unit_ledger(spark, ledger).count() == 3  # healed
    again = sorted(
        (r.doc_id, r.text_dedup)
        for r in spark.read.parquet(out).select("doc_id", "text_dedup").collect()
    )
    assert again == before


# ---------------------------------------------------------------------------
# streaming snapshot diff (changed-keys-only upsert planner)
# ---------------------------------------------------------------------------

SD_SCHEMA = "k long, v string, ts long"


def _write_sd_batch(spark, src, name, rows, when=None):
    os.makedirs(src, exist_ok=True)
    path = os.path.join(src, name)
    spark.createDataFrame(rows, SD_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    t = when or time.time()
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))
    os.utime(path, (t, t))


def _run_sd(spark, src, out, state, chk, order_col="ts"):
    from pyspark_skyline_spark.streaming.curation import run_snapshot_diff_stream

    stream = (
        spark.readStream.schema(SD_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = run_snapshot_diff_stream(
        stream, out, state, ["k"], checkpoint_dir=chk,
        compare_cols=["v"], order_col=order_col,
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
    assert finished, "availableNow snapshot-diff query did not finish in time"


def _sd_statuses(spark, out):
    got = {}
    for d in sorted(os.listdir(out)):
        if not d.startswith("epoch="):
            continue
        ep = int(d.split("=")[1])
        for r in spark.read.parquet(os.path.join(out, d)).collect():
            got[(ep, r["k"])] = r["status"]
    return got


def test_snapshot_diff_stream_statuses(spark, tmp_path):
    """Batch 0 all added; batch 1: changed value -> changed, same value
    -> unchanged, new key -> added; within-batch duplicate keys
    collapse latest-wins by order_col; state view reflects the last
    upsert per key."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    state, chk = str(tmp_path / "state"), str(tmp_path / "chk")
    t = time.time()
    _write_sd_batch(spark, src, "b0.parquet", [(1, "a", 10), (2, "b", 11)], when=t - 20)
    # key 3 duplicated within batch 1: ts 31 wins -> "y"
    _write_sd_batch(
        spark, src, "b1.parquet",
        [(1, "a", 20), (2, "B", 21), (3, "x", 30), (3, "y", 31)],
        when=t - 10,
    )
    _run_sd(spark, src, out, state, chk)
    got = _sd_statuses(spark, out)
    assert got == {
        (0, 1): "added",
        (0, 2): "added",
        (1, 1): "unchanged",
        (1, 2): "changed",
        (1, 3): "added",
    }
    from pyspark_skyline_spark.streaming.curation import committed_snapshot_state

    cur = {
        r["k"]: r["v"]
        for r in committed_snapshot_state(spark, state, ["k"]).collect()
    }
    assert cur == {1: "a", 2: "B", 3: "y"}


def test_snapshot_diff_stream_prefix_consistency(spark, tmp_path):
    """Feeding batches b0..b2 in one run produces the same per-epoch
    statuses as feeding b0..b1 then restarting the stream (same
    checkpoint) with b2 appended — the ledgered state carries across
    restarts exactly (the dedup_incremental prefix-consistency
    contract)."""
    t = time.time()
    batches = [
        [(1, "a", 1), (2, "b", 2)],
        [(2, "c", 3), (3, "d", 4)],
        [(1, "a", 5), (3, "e", 6), (4, "f", 7)],
    ]
    # run A: all three at once
    srcA, outA = str(tmp_path / "srcA"), str(tmp_path / "outA")
    stateA, chkA = str(tmp_path / "stateA"), str(tmp_path / "chkA")
    for i, rows in enumerate(batches):
        _write_sd_batch(spark, srcA, f"b{i}.parquet", rows, when=t - 30 + i)
    _run_sd(spark, srcA, outA, stateA, chkA)
    # run B: two, then restart with the third
    srcB, outB = str(tmp_path / "srcB"), str(tmp_path / "outB")
    stateB, chkB = str(tmp_path / "stateB"), str(tmp_path / "chkB")
    for i, rows in enumerate(batches[:2]):
        _write_sd_batch(spark, srcB, f"b{i}.parquet", rows, when=t - 30 + i)
    _run_sd(spark, srcB, outB, stateB, chkB)
    _write_sd_batch(spark, srcB, "b2.parquet", batches[2], when=t - 30 + 2)
    _run_sd(spark, srcB, outB, stateB, chkB)
    assert _sd_statuses(spark, outA) == _sd_statuses(spark, outB) == {
        (0, 1): "added", (0, 2): "added",
        (1, 2): "changed", (1, 3): "added",
        (2, 1): "unchanged", (2, 3): "changed", (2, 4): "added",
    }


def test_snapshot_diff_stream_replay_idempotent(spark, tmp_path):
    """A committed epoch replay (same checkpoint, re-fed source) writes
    nothing new: statuses and state epochs are unchanged after a second
    run over the same source."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    state, chk = str(tmp_path / "state"), str(tmp_path / "chk")
    t = time.time()
    _write_sd_batch(spark, src, "b0.parquet", [(1, "a", 1)], when=t - 20)
    _write_sd_batch(spark, src, "b1.parquet", [(1, "z", 2)], when=t - 10)
    _run_sd(spark, src, out, state, chk)
    before = _sd_statuses(spark, out)
    state_epochs = sorted(os.listdir(state))
    _run_sd(spark, src, out, state, chk)  # replay, nothing new
    assert _sd_statuses(spark, out) == before == {
        (0, 1): "added", (1, 1): "changed",
    }
    assert sorted(os.listdir(state)) == state_epochs


def test_snapshot_diff_stream_tied_order_col_deterministic(spark, tmp_path):
    """Rows tied on (key, order_col) collapse to a DETERMINISTIC winner
    (remaining columns ascending, NULLs last) — without the full
    tie-break a crash replay could pick a different winner than the
    committed diff epoch used (review find)."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    state, chk = str(tmp_path / "state"), str(tmp_path / "chk")
    _write_sd_batch(
        spark, src, "b0.parquet",
        [(1, "b", 5), (1, "a", 5), (2, None, 7), (2, "z", 7)],
        when=time.time() - 10,
    )
    _run_sd(spark, src, out, state, chk)
    from pyspark_skyline_spark.streaming.curation import committed_snapshot_state

    cur = {
        r["k"]: r["v"]
        for r in committed_snapshot_state(spark, state, ["k"]).collect()
    }
    # ties at ts: 'a' < 'b' ascending; NULL sorts last so 'z' wins
    assert cur == {1: "a", 2: "z"}


def test_snapshot_diff_stream_auto_compaction_bounds_the_log(spark, tmp_path):
    """compact_every_n_epochs keeps the delta log bounded over a long
    run (r10 verdict ask #6): 10 epochs with n=3 leave at most 3
    committed log dirs (the compacted base + <n fresh deltas), while
    the uncompacted control grows one dir per epoch; statuses and the
    final state view are IDENTICAL in both runs — compaction is purely
    a read-cost lever."""
    import pytest

    from pyspark_skyline_spark.streaming.curation import (
        committed_snapshot_state,
        run_snapshot_diff_stream,
    )

    t = time.time()
    n_epochs = 10
    batches = [
        # key i churns every epoch; key 100+i is fresh each epoch
        [(1, f"v{i}", i), (100 + i, "new", i)]
        for i in range(n_epochs)
    ]

    def run(tag, compact_every):
        src = str(tmp_path / f"src_{tag}")
        out = str(tmp_path / f"out_{tag}")
        state = str(tmp_path / f"state_{tag}")
        chk = str(tmp_path / f"chk_{tag}")
        for i, rows in enumerate(batches):
            _write_sd_batch(spark, src, f"b{i}.parquet", rows, when=t - 60 + i)
        stream = (
            spark.readStream.schema(SD_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = run_snapshot_diff_stream(
            stream, out, state, ["k"], checkpoint_dir=chk,
            compare_cols=["v"], order_col="ts",
            compact_every_n_epochs=compact_every,
        )
        assert q.awaitTermination(600)
        dirs = [d for d in os.listdir(state) if d.startswith("epoch=")]
        view = {
            (r["k"], r["v"])
            for r in committed_snapshot_state(spark, state, ["k"]).collect()
        }
        return _sd_statuses(spark, out), dirs, view

    st_off, dirs_off, view_off = run("off", None)
    st_on, dirs_on, view_on = run("on", 3)
    assert len(dirs_off) == n_epochs  # one delta per epoch, unbounded
    assert len(dirs_on) <= 3  # base + fresh deltas since last compact
    assert any(d.endswith(".compact") for d in dirs_on)
    assert st_on == st_off and view_on == view_off
    assert st_on[(n_epochs - 1, 1)] == "changed"  # churn tracked to the end

    with pytest.raises(ValueError, match="compact_every_n_epochs"):
        run_snapshot_diff_stream(
            spark.readStream.schema(SD_SCHEMA).parquet(
                str(tmp_path / "src_on") + "/*"
            ),
            str(tmp_path / "o2"), str(tmp_path / "s2"), ["k"],
            checkpoint_dir=str(tmp_path / "c2"), compact_every_n_epochs=1,
        )


def test_state_epoch_covered_honors_compact_base(spark, tmp_path):
    """The replay done-guard treats a committed compact base as covering
    every epoch it folded (review find: inline compaction deletes the
    epoch dir the old guard probed, so a post-compaction replay
    recomputed the batch and re-appended a duplicate delta)."""
    from pyspark_skyline_spark.streaming.curation import _state_epoch_covered

    state = str(tmp_path / "state")
    for name in ("epoch=5.compact", "epoch=6"):
        d = os.path.join(state, name)
        os.makedirs(d)
        open(os.path.join(d, "_SUCCESS"), "w").close()
    assert _state_epoch_covered(spark, state, 3)   # folded into the base
    assert _state_epoch_covered(spark, state, 5)   # the base itself
    assert _state_epoch_covered(spark, state, 6)   # live delta
    assert not _state_epoch_covered(spark, state, 7)  # future epoch
    # an UNcommitted dir (no _SUCCESS) covers nothing
    os.makedirs(os.path.join(state, "epoch=7"))
    assert not _state_epoch_covered(spark, state, 7)


def test_snapshot_diff_stream_rejects_unorderable_tiebreak_column(
    spark, tmp_path
):
    """A map-typed non-key column cannot serve as a deterministic
    tie-break column: the runner rejects it at START time (same
    convention as the key/compare/order name checks) instead of an
    opaque StreamingQueryException inside foreachBatch (ADVICE r10)."""
    import pytest

    from pyspark_skyline_spark.streaming.curation import run_snapshot_diff_stream

    schema = "k long, v string, ts long, attrs map<string,string>"
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [(1, "a", 1, {"x": "y"})], schema
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0.parquet"))
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    with pytest.raises(ValueError, match="unorderable"):
        run_snapshot_diff_stream(
            stream,
            str(tmp_path / "out"),
            str(tmp_path / "state"),
            ["k"],
            checkpoint_dir=str(tmp_path / "chk"),
            compare_cols=["v"],
            order_col="ts",
        )
    # without order_col there is no tie-break ordering: the same schema
    # must be accepted (the underlying snapshot_diff duplicate check
    # guards ambiguity instead)
    q = run_snapshot_diff_stream(
        stream,
        str(tmp_path / "out2"),
        str(tmp_path / "state2"),
        ["k"],
        checkpoint_dir=str(tmp_path / "chk2"),
        compare_cols=["v"],
    )
    assert q.awaitTermination(300)


def test_compact_snapshot_log_preserves_view_and_shrinks(spark, tmp_path):
    """compact_snapshot_log: the latest-wins view is IDENTICAL before
    and after compaction; subsumed delta dirs are removed; the stream
    continues correctly on top of the compacted base; compacting a
    single-dir log is a no-op; a leftover old delta (simulated
    mid-delete crash) does not change the view."""
    import shutil

    from pyspark_skyline_spark.streaming.curation import (
        committed_snapshot_state,
        compact_snapshot_log,
    )

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    state, chk = str(tmp_path / "state"), str(tmp_path / "chk")
    t = time.time()
    _write_sd_batch(spark, src, "b0.parquet", [(1, "a", 1), (2, "b", 2)], when=t - 30)
    _write_sd_batch(spark, src, "b1.parquet", [(2, "c", 3), (3, "d", 4)], when=t - 20)
    _run_sd(spark, src, out, state, chk)

    def view():
        return {
            r["k"]: r["v"]
            for r in committed_snapshot_state(spark, state, ["k"]).collect()
        }

    before = view()
    assert before == {1: "a", 2: "c", 3: "d"}
    # crash simulation: copy a delta aside, compact, restore the copy —
    # the base + leftover delta must yield the same view
    leftover_src = os.path.join(state, "epoch=0")
    leftover_bak = str(tmp_path / "epoch0_bak")
    shutil.copytree(leftover_src, leftover_bak)
    removed = compact_snapshot_log(spark, state, ["k"])
    assert removed == 2
    assert view() == before
    assert [d for d in sorted(os.listdir(state)) if d.startswith("epoch=")] == [
        "epoch=1.compact"
    ]
    shutil.copytree(leftover_bak, os.path.join(state, "epoch=0"))
    assert view() == before  # leftover delta is harmless
    # the leftover sweep must NOT rewrite the committed base in place
    # (a crash mid-rewrite would destroy the only copy — review find):
    # pin by content identity of the base's files
    base_dir = os.path.join(state, "epoch=1.compact")
    base_files = sorted(os.listdir(base_dir))
    assert compact_snapshot_log(spark, state, ["k"]) == 1  # sweeps it
    assert sorted(os.listdir(base_dir)) == base_files
    # single-dir log: no-op
    assert compact_snapshot_log(spark, state, ["k"]) == 0
    # an unparseable committed epoch= dir is never deleted (compaction
    # cannot know it is subsumed — review find) and never blocks
    weird = os.path.join(state, "epoch=weird")
    shutil.copytree(leftover_bak, weird)
    assert compact_snapshot_log(spark, state, ["k"]) == 0
    assert os.path.isdir(weird)
    shutil.rmtree(weird)
    # stream continues on the compacted base
    _write_sd_batch(spark, src, "b2.parquet", [(1, "a", 5), (3, "e", 6)], when=t - 10)
    _run_sd(spark, src, out, state, chk)
    got = _sd_statuses(spark, out)
    assert got[(2, 1)] == "unchanged" and got[(2, 3)] == "changed"
    assert view() == {1: "a", 2: "c", 3: "e"}
