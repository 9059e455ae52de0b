"""Extension-operator registrations for ``__spark_entry__`` — dedup,
text analysis, similarity, top-k, joins, multimodal plumbing.

Every query here returns hash-stable output (integers / booleans /
strings / bit-reproducible doubles) and, where SQL-expressible, ships a
DuckDB oracle that mirrors the Spark expression tree operation-for-
operation (same fold order for float accumulation, same md5-derived
hashes, same regex splits)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyspark_skyline_spark.operators import dedup as D
from pyspark_skyline_spark.operators import diagnostics as DG
from pyspark_skyline_spark.operators import filtering as FL
from pyspark_skyline_spark.operators import multimodal as M
from pyspark_skyline_spark.operators import profile as P
from pyspark_skyline_spark.operators import sample as SA
from pyspark_skyline_spark.operators import similarity as S
from pyspark_skyline_spark.operators import text as T
from pyspark_skyline_spark.operators import topk as K
from pyspark_skyline_spark.operators.asof import asof_join
from pyspark_skyline_spark.operators.rangejoin import range_join
from pyspark_skyline_spark.operators.skyband import k_skyband
from pyspark_skyline_spark.operators.skyline import skyline, skyline_layers, windowed_skyline
from pyspark_skyline_spark.oracles import skyline_oracle_sql
from pyspark_skyline_spark.sources.tables import load_table

# shared knobs (must match between Spark query and DuckDB oracle)
_MH_HASHES, _MH_BANDS, _MH_K, _MH_T = 32, 8, 3, 0.4
_NJ_K, _NJ_T = 3, 0.5
_TOPK_K, _PROBE_ID = 10, 0
_SAMPLE_FRAC, _SAMPLE_SEED = 0.1, 7
_STRATA_FRACS = {"click": 0.05, "view": 0.02, "error": 1.0}
_VOCAB_K = 50
_SH_MAX_HAMMING = 3
_CHUNK_TOKENS, _CHUNK_OVERLAP = 64, 16
_N_BATCHES, _BATCH_SEED = 32, 7


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def _q_dedup_exact_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return D.dedup_exact(ev, ["user_id", "event_type", "value"]).select(
        "user_id", "event_type", "value"
    )


def _q_text_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.text_stats(docs)


def _q_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.lang_id(docs).select("doc_id", "pred_lang")


def _q_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.fingerprint(docs).select("doc_id", "fp")


def _q_subword_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.subword_count(docs).select("doc_id", "n_subwords")


def _q_winnow(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.winnow_fingerprints(docs, "doc_id", "text", shingle_k=3, window=4)


def _q_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_flags(docs).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_punct").cast("long").alias("n_punct"),
        "keep",
    )


def _q_minhash_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=_MH_HASHES, bands=_MH_BANDS, shingle_k=_MH_K,
        threshold=_MH_T, hash_mode="md5",
    )


def _q_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=_NJ_K, threshold=_NJ_T)


def _q_near_dup_clusters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=_NJ_K, threshold=_NJ_T)
    return D.near_dup_clusters(pairs)


def _q_simhash(spark, sf_dir):
    # md5 hash mode so the DuckDB oracle reproduces signatures
    # bit-for-bit (production default is xxhash64)
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, "doc_id", "text", hash_mode="md5")


def _q_simhash_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(
        docs, "doc_id", "text", max_hamming=_SH_MAX_HAMMING, hash_mode="md5"
    ).withColumn("hamming", F.col("hamming").cast("long"))


def _q_rolling_stats_events(spark, sf_dir):
    # analytic window FRAMES (rank/lead-lag are covered elsewhere): per
    # user, ordered by time, stats over the trailing 5-row frame.
    # Deliberately min/max/count only - no float accumulation to
    # disagree on across engines.
    from pyspark.sql import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    frame = w.rowsBetween(-4, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(frame).cast("long").alias("n_in_frame"),
        F.min("value").over(frame).alias("min_value"),
        F.max("value").over(frame).alias("max_value"),
        F.lag("value", 1).over(w).alias("prev_value"),
    )


def _q_k_skyband_part(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return (
        k_skyband(part, [("p_retailprice", "min"), ("p_size", "min")], k=3)
        .select("p_retailprice", "p_size", "n_dominators")
        .dropDuplicates()
    )


def _q_sessionize_events(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return SA.sessionize(ev, "user_id", "ts", gap="30 minutes").select(
        "event_id", "user_id", "session_id"
    )


def _q_skyline_layers_orders(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = load_table(spark, sf_dir, "orders")
    out = skyline_layers(
        orders, [("o_totalprice", "max"), ("o_orderdate", "min")], n_layers=3
    )
    return out.select("o_totalprice", "o_orderdate", "layer").dropDuplicates()


def _q_chunk_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    )


def _q_pack_batches_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return SA.pack_batches(
        orders, ["o_orderkey"], _N_BATCHES, seed=_BATCH_SEED, hash_mode="md5"
    ).select("o_orderkey", "batch_id", "batch_pos")


def _q_range_join_error_click(spark, sf_dir):
    # every click within 10 minutes AFTER an error (any user): an
    # interval x point range join, executed as a bin-bucketed hash
    # equi-join (bin width = the 10-minute interval length, in micros)
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("err_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return range_join(
        clicks, errors, "click_ts", "err_ts", "err_end", bin_width=600_000_000
    ).select("err_id", "click_id")


def _q_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, "vec_id", "embedding", probe_id=_PROBE_ID, k=_TOPK_K)


def _q_cosine_topk_lsh(spark, sf_dir):
    # Driver entry runs the EXHAUSTIVE special case (n_planes=0 -> one
    # bucket -> the probe's candidate set is the whole table), so the
    # exact top-k oracle applies and the full LSH pipeline (bucket udf,
    # probe bucket match, fold-cosine rerank) gets a hash-checked row.
    # Approximate parameters are graded by the recall pytest
    # (tests/test_similarity.py), which is the meaningful accuracy check.
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh(
        emb, "vec_id", "embedding", probe_id=_PROBE_ID, k=_TOPK_K,
        n_planes=0, n_tables=1,
    )


def _q_cosine_topk_ivf(spark, sf_dir):
    # Driver entry probes EVERY cell (nprobe == nlist), so IVF training,
    # assignment, and probing all run but the candidate set is exact and
    # the exact top-k oracle applies. Cell-pruning recall at nprobe <
    # nlist is graded by the recall pytest.
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_ivf(
        emb, "vec_id", "embedding", probe_id=_PROBE_ID, k=_TOPK_K,
        nlist=12, nprobe=12,
    )


def _q_cosine_near_dup(spark, sf_dir):
    # Exhaustive special case (n_planes=0 -> single bucket): the
    # bucket-local verify scores ALL pairs, so the all-pairs threshold
    # SQL oracle applies exactly. Bucketed recall at real parameters is
    # graded by the planted-pair pytest.
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.45, n_planes=0, n_tables=1
    ).select("id_a", "id_b")


def _q_cosine_near_dup_lsh(spark, sf_dir):
    """LSH-MODE near-dup with an EXACT oracle (round 7): md5-parity
    Rademacher planes over 1e-6-floored embeddings make every bucket
    decision integer arithmetic any SQL engine reproduces bit-exactly
    (the md5-signature-ledger pattern from the MinHash oracle applied
    to hyperplane LSH — operators/similarity.py::_md5_planes). The
    oracle rebuilds the same planes/buckets in DuckDB and verifies
    cosine exactly, so the SCALE PATH (bucketed, never all-pairs) is
    driver-graded, not just the exhaustive n_planes=0 special case."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.45,
        n_planes=4, n_tables=8, plane_mode="md5",
    ).select("id_a", "id_b")


from contextlib import contextmanager


@contextmanager
def _state_partitions(spark, n: int = 8):
    """Run a stateful streaming query with its state partition count
    sized to the STATE instead of the session's batch-analytics shuffle
    default. Stateful operators keep one-or-more state stores per
    shuffle partition and every micro-batch (including the trailing
    0-input watermark-advance batch) commits every instance, so at the
    bench's state sizes (thousands of rows) wall time tracks the
    instance count, not the compute — profiled in
    ``_q_stream_join_events``'s docstring. Streaming state partitioning
    is checkpoint-pinned and AQE-exempt, so explicit sizing is the
    correct practice at 100 TB too (there you size UP for state
    volume). Restores the session conf on exit for the batch rows that
    follow."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _q_stream_window_stats_orders(spark, sf_dir):
    # watermarked tumbling-window aggregation through the REAL streaming
    # engine (append mode): a single-file/single-batch stream leaves the
    # watermark at max(o_orderdate) - 1 day after the data batch, and the
    # trailing no-data batch flushes exactly the windows closed by then —
    # deterministic, so a batch SQL oracle can reproduce the emitted set
    import os
    import uuid

    from pyspark_skyline_spark.streaming.watermark import windowed_stream_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/orders.parquet"
    static = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    stream = stream.select(
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.col("o_totalprice").alias("v"),
    )
    out = windowed_stream_stats(stream, "ts", "v", "30 days", delay="1 day")
    name = f"wm_stats_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "window_start",
        "window_end",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("sum_value"), 2).alias("sum_value"),
        F.round(F.col("min_value"), 2).alias("min_value"),
        F.round(F.col("max_value"), 2).alias("max_value"),
    )


def _q_stream_session_stats_events(spark, sf_dir):
    # session windows (F.session_window) through the real streaming
    # engine: per user, events closer than 4h merge into one session
    # [first_ts, last_ts + 4h); append mode emits exactly the sessions
    # closed by the final watermark (max ts - 1h after the single data
    # batch), so a gaps-and-islands batch SQL oracle reproduces the set
    import os
    import uuid

    from pyspark_skyline_spark.streaming.watermark import session_stream_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    out = session_stream_stats(
        stream.select("ts", "user_id"), "ts", "user_id", gap="4 hours", delay="1 hour"
    )
    name = f"wm_sess_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "session_start",
        "session_end",
        "user_id",
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def _q_stream_sliding_stats_events(spark, sf_dir):
    # sliding windows (2h window / 30min slide) through the real
    # streaming engine: every event lands in 4 overlapping windows; a
    # window emits once the final watermark (max ts - 1h) closes it, so
    # a batch SQL oracle expanding each event into its 4 windows and
    # keeping closed ones reproduces the emitted set. min/max-only
    # aggregates — no float accumulation to disagree on.
    import os
    import uuid

    from pyspark_skyline_spark.streaming.watermark import sliding_stream_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    out = sliding_stream_stats(
        stream.select("ts", "value"), "ts", "value",
        window_duration="2 hours", slide="30 minutes", delay="1 hour",
    )
    name = f"wm_slide_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "window_start",
        "window_end",
        F.col("n_rows").cast("long").alias("n_rows"),
        "min_value",
        "max_value",
    )


def _q_multimodal_frames(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    blobs = M.with_blob(docs, "text")
    return M.sample_frames(blobs, "doc_id")


def _q_global_top_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


def _q_set_ops_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.filter(F.month("o_orderdate") <= 6).select("o_custkey")
    h2 = orders.filter(F.month("o_orderdate") > 6).select("o_custkey")
    return h1.intersect(h2)


def _q_topk_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return K.top_k_per_group(
        orders, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    ).select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn"))


def _q_agg_pricing(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("count_order"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
    )


def _q_multimodal_meta(spark, sf_dir):
    # one driver row exercising BOTH multimodal paths (blob metadata and
    # the mapInPandas decode) — consolidated from two entries to stay
    # inside the driver's 50-query grading cap
    docs = load_table(spark, sf_dir, "documents")
    blobs = M.with_blob(docs, "text")
    meta = M.blob_meta(blobs, "blob").select(
        "doc_id", F.col("n_bytes").cast("long").alias("n_bytes"), "checksum"
    )
    dec = M.decode_media_meta(blobs, "doc_id", "blob").select(
        F.col("id").alias("doc_id"), "width", "height", "format"
    )
    return meta.join(dec, "doc_id")


def _q_stream_skyline_orders(spark, sf_dir):
    # real Structured Streaming path (foreachBatch incremental skyline);
    # prefix == full table, so the batch skyline oracle applies exactly
    from pyspark_skyline_spark.streaming.skyline_stream import stream_table_skyline

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with _state_partitions(spark):
        res = stream_table_skyline(
            spark,
            f"{sf_dir}/orders.parquet",
            [("o_totalprice", "max"), ("o_orderdate", "min")],
        )
    return res.select("o_totalprice", "o_orderdate").dropDuplicates()


def _q_windowed_skyline_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    res = windowed_skyline(
        ev, "ts", "1 day", [("value", "max"), ("event_id", "min")]
    )
    return res.select("window_start", "value", "event_id").dropDuplicates()


def _q_distinct_users_by_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _q_skyline_by_status(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    res = skyline(
        orders,
        [("o_totalprice", "max"), ("o_orderdate", "min")],
        by=["o_orderstatus"],
    )
    return res.select("o_orderstatus", "o_totalprice", "o_orderdate").dropDuplicates()


def _q_join_skyline_customer_nation(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner"
    )
    res = skyline(
        joined, [("c_acctbal", "max"), ("c_custkey", "min")], by=["n_regionkey"]
    )
    return res.select("n_regionkey", "c_acctbal", "c_custkey").dropDuplicates()


def _q_asof_error_click(spark, sf_dir):
    # for each error event: the same user's most recent click at-or-before
    # it (single-shuffle union-scan as-of join; ties -> max click event_id)
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clk = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    res = asof_join(
        err, clk, "ts", "ts", by=["user_id"],
        tiebreak="event_id", how="inner", right_prefix="click_",
    )
    return res.select(
        F.col("event_id").alias("err_id"),
        F.col("click_event_id").alias("click_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


def _q_hash_sample_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return SA.hash_sample(
        orders, ["o_orderkey"], _SAMPLE_FRAC, seed=_SAMPLE_SEED
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def _q_stratified_sample_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return SA.stratified_hash_sample(
        ev, "event_type", _STRATA_FRACS, ["event_id"], seed=_SAMPLE_SEED
    ).select("event_id", "event_type", "user_id")


def _q_vocab_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.vocab_topk(docs, "text", k=_VOCAB_K)


def _q_dedup_incremental_documents(spark, sf_dir):
    """Daily-ingest pattern: docs with doc_id % 4 == 0 form yesterday's
    accepted-corpus fingerprint ledger; the rest arrive as today's batch
    and must drop ledger matches plus in-batch duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    known = docs.filter(F.col("doc_id") % 4 == 0)
    ledger = T.fingerprint(known).select("fp")
    new = docs.filter(F.col("doc_id") % 4 != 0)
    return D.dedup_incremental(new, ledger, "doc_id").select("doc_id", "fp")


def _q_dedup_incremental_neardup_documents(spark, sf_dir):
    """NEAR-dup incremental ingest vs a signature LEDGER: docs with
    doc_id % 3 != 0 form the accepted corpus (stored as MinHash
    signatures only — the ledger never carries text); docs with
    doc_id % 3 == 0 arrive as today's batch and drop when their
    signature-Jaccard estimate against any band-matched ledger doc
    reaches the threshold. md5 hash mode: the signature computation,
    band match, and estimate are all bit-reproducible in any engine
    with md5, so the SQL oracle mirrors the op EXACTLY — there is no
    approximation gap to bridge (the estimator's variance is part of
    the op's contract, not noise)."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 3 == 0)
    known = docs.filter(
        (F.col("doc_id") % 3 != 0)
        & F.col("text").isNotNull()
        & F.col("text").rlike(r"\S")
    )
    ledger = D.minhash_signatures(
        known, "doc_id", "text",
        num_hashes=_MH_HASHES, shingle_k=_MH_K, hash_mode="md5",
    ).withColumnRenamed("doc_id", "ledger_id")
    out = D.dedup_incremental_neardup(
        new, ledger, "doc_id", "text", ledger_id_col="ledger_id",
        num_hashes=_MH_HASHES, bands=_MH_BANDS, shingle_k=_MH_K,
        threshold=_MH_T, hash_mode="md5",
    )
    return out.select("doc_id", "source")


def _q_stream_vocab_documents(spark, sf_dir):
    """COMPLETE output mode through the real engine (append and update
    are covered by the other stream rows): a streaming token-count
    aggregation re-emits the full result each trigger, so after an
    availableNow replay the memory sink holds exactly the batch
    vocabulary — the batch vocab_topk SQL is an exact oracle."""
    import os
    import uuid

    path = f"{sf_dir}/documents.parquet"
    static = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    counts = (
        stream.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    name = f"svocab_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(_VOCAB_K)
    )


def _q_contamination_report_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return FL.contamination_report(
        train, probe, "doc_id", "eval_id", shingle_k=8, hash_mode="md5"
    )


def _q_heavy_hitters_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return DG.heavy_hitters(ev, ["user_id", "event_type"], k=20)


def _q_skew_stats_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return DG.skew_stats(ev, ["user_id"])


def _q_stream_join_events(spark, sf_dir):
    """Watermarked stream-stream interval join through the REAL engine:
    errors joined to same-user clicks within the preceding 30 minutes.
    Inner joins emit every match of the replayed data (watermarks only
    bound state), so the batch SQL interval join is an exact oracle.

    State partitioning is sized to the STATE, not to the session's
    batch-analytics shuffle default: a stream-stream join keeps FOUR
    state stores per shuffle partition, and every micro-batch commits
    every instance (including the 0-input watermark-advance batch
    availableNow appends), so the fixed cost scales with
    ``batches x partitions x 4`` store instance commits. Profiled at
    sf0.1 (~40k state rows, HDFS-backed provider): join compute <1 s,
    but wall tracked the instance count — ~7.7 s at 32 partitions
    (256 commits across 2 batches; per-instance commitTimeMs summed to
    ~42 s/66 s per batch, overlapping imperfectly across the 32 task
    threads because checkpoint file I/O and per-instance maintenance
    partially serialize), ~2.9 s at 8 partitions (64 commits), ~2.4 s
    at 4. Streaming state partitioning is an explicit,
    checkpoint-pinned knob (it cannot AQE-coalesce and cannot change
    on restart), so sizing it deliberately is the correct 100 TB
    practice too — there you'd size UP for state volume; here 8
    partitions carry ~5k state rows each.
    """
    import os
    import uuid

    from pyspark_skyline_spark.streaming.joins import stream_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    errors = stream.filter(F.col("event_type") == "error")
    clicks = stream.filter(F.col("event_type") == "click")
    joined = stream_interval_join(
        errors, clicks, "ts", "ts", by=["user_id"],
        max_delay="30 minutes", watermark="1 hour",
    ).select(
        F.col("event_id").alias("err_id"),
        F.col("r_event_id").alias("click_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("r_ts").cast("timestamp"))
        ).alias("gap_us"),
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_rollup_orders(spark, sf_dir):
    """GROUP BY ROLLUP (status, priority): subtotal rows carry NULLs for
    the aggregated-out levels in BOTH engines — native Catalyst rollup,
    map-side partial agg per grouping set."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def _q_pivot_events(spark, sf_dir):
    """Pivot (crosstab): per-user event counts, one column per event
    type. Pivot values are pinned so the schema is static — at scale an
    unpinned pivot needs an extra distinct-values job."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
    )


def _q_column_quantiles_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return P.column_quantiles(
        orders, ["o_totalprice"], probs=(0.25, 0.5, 0.75), mode="exact"
    )


_BM25_TERMS = ["spark", "join", "window"]


def _q_bm25_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_scores(docs, _BM25_TERMS, "doc_id", "text", k=10)


def _q_hash_embed_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.hash_embed(docs, "doc_id", "text", dim=16, hash_mode="md5")


def _q_ngram_counts_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.ngram_counts(docs, "text", n=2, k=40)


def _q_multi_join_revenue(spark, sf_dir):
    """TPC-H Q5-shaped multi-way join (standard-SQL breadth evidence:
    the optimizer broadcasts the dimension chain supplier→nation→region
    and aggregates map-side): revenue by nation for one region."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    dims = (
        su.join(na, su["s_nationkey"] == na["n_nationkey"])
        .join(re, na["n_regionkey"] == re["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def _q_split_dataset_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return SA.split_dataset(orders, ["o_orderkey"], seed=_SAMPLE_SEED).select(
        "o_orderkey", "split"
    )


def _q_tfidf_topk_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.tfidf_topk_terms(docs, "doc_id", "text", k=3)


def _q_dedup_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_corpus(
        docs, "doc_id", "text", shingle_k=_NJ_K, threshold=_NJ_T
    ).select("doc_id", "source")


def _q_repetition_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return FL.repetition_stats(docs).select(
        "doc_id", "n_words", "dup_line_frac", "dup_word_frac",
        "top_word_frac", "mean_word_len", "keep",
    )


def _q_pii_scrub(spark, sf_dir):
    # append a deterministic PII-shaped suffix (email + IP + phone built
    # from doc_id) so the row exercises real redactions — the synthetic
    # corpus itself contains no PII-shaped spans
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" reach user"), F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0.0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(" or +1 555-123-4567"),
        ).alias("text"),
    )
    return FL.pii_scrub(enriched).select(
        "doc_id", "n_email", "n_card", "n_ipv4", "n_phone", "text_scrubbed"
    )


def _q_decontaminate(spark, sf_dir):
    # probe = every 50th doc (a stand-in eval benchmark); flag the rest.
    # md5 hash mode so the DuckDB oracle reproduces gram hashes exactly.
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return FL.decontaminate(
        train, probe, "doc_id", shingle_k=8, mode="flag", hash_mode="md5"
    ).select("doc_id", "n_contaminated_grams", "contaminated")


def _q_column_profile(spark, sf_dir):
    # exact-distinct mode so the SQL oracle reproduces values exactly;
    # integer/string columns only, so min/max/mean have no float
    # accumulation to disagree on (the HLL approx path is graded by the
    # accuracy pytest, tests/test_profile.py)
    orders = load_table(spark, sf_dir, "orders")
    return P.column_profile(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
        distinct_mode="exact",
    )


def _q_windowed_stream_skyline(spark, sf_dir):
    # per-day skyline through the REAL applyInPandasWithState path:
    # union of update-mode frontier emissions, reduced per window with
    # the batch operator (stage-2 equivalent), equals the batch windowed
    # skyline — so the batch SQL oracle applies exactly
    import os
    import uuid

    from pyspark_skyline_spark.operators.skyline import _compute_bounds
    from pyspark_skyline_spark.streaming.windowed import windowed_stream_skyline

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    dims = [("value", "max"), ("event_id", "min")]
    path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(path)
    if dict(static.dtypes).get("ts") == "bigint":
        static = static.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    bounds = _compute_bounds(static, dims)
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    out = windowed_stream_skyline(
        stream.select("ts", "value", "event_id"), "ts", "1 day", dims, bounds,
        partitions=8,
    )
    name = f"wsky_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emissions = spark.table(name).drop("__sky_cell")
    reduced = skyline(emissions, dims, by=["window_start"])
    return reduced.select("window_start", "value", "event_id").dropDuplicates()


def _q_two_stage_skyline(spark, sf_dir):
    # the reference's flagship two-CONCURRENT-query topology
    # (stream_job.py:87-206) as the composed single-pipeline equivalent:
    # stage-1 state-store cell frontiers -> stage-2 foreachBatch global
    # merge; prefix == full table, so the batch skyline oracle applies
    import os

    from pyspark_skyline_spark.operators.skyline import _compute_bounds
    from pyspark_skyline_spark.streaming.two_stage import run_two_stage_skyline_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    dims = [("o_totalprice", "max"), ("o_orderdate", "min")]
    path = f"{sf_dir}/orders.parquet"
    static = spark.read.parquet(path)
    bounds = _compute_bounds(static, dims)
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    with _state_partitions(spark):
        state, q = run_two_stage_skyline_stream(stream, dims, bounds, partitions=16)
        q.awaitTermination()
    return state.result().select("o_totalprice", "o_orderdate").dropDuplicates()


# ---------------------------------------------------------------------------
# DuckDB oracles (ANSI SQL mirrors)
# ---------------------------------------------------------------------------

_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

# ordered word 3-shingles (duplicates kept), mirroring
# dedup.ordered_shingles(k=3)
_ORDERED_SHINGLES = f"""
CASE WHEN len({_TOKS}) >= 3
     THEN list_transform(range(0, len({_TOKS}) - 2),
          i -> {_TOKS}[i+1] || ' ' || {_TOKS}[i+2] || ' ' || {_TOKS}[i+3])
     ELSE [array_to_string({_TOKS}, ' ')] END
"""

# distinct word 3-shingles, mirroring dedup.shingles(k=3)
_SHINGLES = f"list_distinct({_ORDERED_SHINGLES.strip()})"

_HASH60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _minhash_oracle() -> str:
    r = _MH_HASHES // _MH_BANDS
    base_hash = _HASH60.format(x="s")
    # per-seed RE-hash of the base hash (mirrors dedup._seed_mix md5
    # mode): md5(h::VARCHAR || '#' || j) — an XOR mix cannot reorder
    # values differing in their top bits and collapses the estimator
    seed_mix = _HASH60.format(x="(h::VARCHAR || '#' || j::VARCHAR)")
    return f"""
WITH base AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM documents),
hashes AS (
  SELECT doc_id, sh, list_transform(sh, s -> {base_hash}) AS hs FROM base),
sigs AS (
  SELECT doc_id, sh,
         list_transform(range(0, {_MH_HASHES}),
           j -> list_min(list_transform(hs, h -> {seed_mix}))) AS sig
  FROM hashes),
band_lists AS (
  SELECT doc_id,
         list_transform(range(0, {_MH_BANDS}),
           b -> {{'idx': b,
                  'key': array_to_string(sig[b*{r}+1 : b*{r}+{r}], ',')}}) AS bl
  FROM sigs),
bands AS (
  SELECT doc_id, u.idx AS band_idx, u.key AS band_key
  FROM band_lists, UNNEST(bl) AS t(u)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.sh, sb.sh))::DOUBLE /
         len(list_distinct(sa.sh || sb.sh)) AS jac
  FROM cand
  JOIN base sa ON sa.doc_id = id_a
  JOIN base sb ON sb.doc_id = id_b)
SELECT id_a, id_b, jac FROM verified WHERE jac >= {_MH_T}
"""



def _incr_neardup_oracle() -> str:
    """Exact SQL mirror of ``_q_dedup_incremental_neardup_documents``:
    both sides of the ledger comparison compute the SAME md5-mode
    MinHash signatures (the sig construction is shared verbatim with
    ``_minhash_oracle``), candidates come from any shared band, the
    verify is the signature equality fraction, and survivors are the
    new batch minus the dropped ids. Blank/NULL-text rows never enter
    signature matching and therefore always survive — mirrored by the
    regexp filter on both sides here and the final anti-membership
    select over the UNfiltered new batch."""
    h = _MH_HASHES
    r = h // _MH_BANDS
    base_hash = _HASH60.format(x="s")
    seed_mix = _HASH60.format(x="(h::VARCHAR || '#' || j::VARCHAR)")

    def sigs(name: str, pred: str) -> str:
        return f"""{name} AS (
  SELECT doc_id,
         list_transform(range(0, {h}),
           j -> list_min(list_transform(hs, h -> {seed_mix}))) AS sig
  FROM (SELECT doc_id, list_transform({_SHINGLES}, s -> {base_hash}) AS hs
        FROM documents
        WHERE ({pred}) AND text IS NOT NULL AND regexp_matches(text, '\\S')))"""

    def bands(name: str, src: str) -> str:
        return f"""{name} AS (
  SELECT doc_id, u.idx AS band_idx, u.key AS band_key
  FROM (SELECT doc_id,
               list_transform(range(0, {_MH_BANDS}),
                 b -> {{'idx': b,
                        'key': array_to_string(sig[b*{r}+1 : b*{r}+{r}], ',')}}) AS bl
        FROM {src}), UNNEST(bl) AS t(u))"""

    return f"""
WITH {sigs("nsig", "doc_id % 3 = 0")},
{sigs("lsig", "doc_id % 3 <> 0")},
{bands("nbands", "nsig")},
{bands("lbands", "lsig")},
cand AS (
  SELECT DISTINCT n.doc_id AS nid, l.doc_id AS lid
  FROM nbands n JOIN lbands l
    ON n.band_idx = l.band_idx AND n.band_key = l.band_key),
dropped AS (
  SELECT DISTINCT nid FROM cand
  JOIN nsig a ON a.doc_id = nid
  JOIN lsig b ON b.doc_id = lid
  WHERE len(list_filter(range(0, {h}),
            j -> a.sig[j+1] = b.sig[j+1]))::DOUBLE / {h} >= {_MH_T})
SELECT doc_id, source FROM documents
WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT nid FROM dropped)
"""


def _skyline_layers_oracle(
    table: str, dims: list[tuple[str, str]], n_layers: int, groups: int = 128
) -> str:
    """Onion-peeling oracle: per layer, the blocked two-phase skyline of
    the remainder (same construction as ``skyline_oracle_sql``), then an
    anti-join removes that layer's coordinate set before the next."""
    cols = ", ".join(c for c, _ in dims)
    le = " AND ".join(
        f"q.{c} {'<=' if s == 'min' else '>='} p.{c}" for c, s in dims
    )
    lt = " OR ".join(f"q.{c} {'<' if s == 'min' else '>'} p.{c}" for c, s in dims)
    ctes = [f"r0 AS (SELECT DISTINCT {cols} FROM {table})"]
    selects = []
    for i in range(1, n_layers + 1):
        prev = f"r{i-1}"
        ctes.append(
            f"""b{i} AS (
  SELECT *, (row_number() OVER (ORDER BY {cols})) % {groups} AS grp FROM {prev})"""
        )
        ctes.append(
            f"""loc{i} AS (
  SELECT {cols} FROM b{i} p WHERE NOT EXISTS (
    SELECT 1 FROM b{i} q WHERE q.grp = p.grp AND {le} AND ({lt})))"""
        )
        ctes.append(
            f"""s{i} AS (
  SELECT {cols} FROM loc{i} p WHERE NOT EXISTS (
    SELECT 1 FROM loc{i} q WHERE {le} AND ({lt})))"""
        )
        if i < n_layers:
            ctes.append(
                f"r{i} AS (SELECT {cols} FROM {prev} ANTI JOIN s{i} USING ({cols}))"
            )
        selects.append(f"SELECT {cols}, {i}::BIGINT AS layer FROM s{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _simhash_sig_sql(bits: int = 60) -> str:
    """CTE body computing (doc_id, simhash_lo, simhash_hi) exactly as
    ``dedup.simhash(hash_mode='md5')``: one md5-derived 60-bit hash per
    whitespace token (duplicates kept), per-bit set-counts, majority
    rule 2*S_i > n."""
    half = bits // 2
    hash60 = _HASH60.format(x="t")
    bit_sums = ",\n         ".join(
        f"sum((h >> {i}) & 1) AS b{i}" for i in range(bits)
    )
    lo = " + ".join(f"CASE WHEN 2*b{i} > n THEN {1 << i} ELSE 0 END" for i in range(half))
    hi = " + ".join(
        f"CASE WHEN 2*b{i} > n THEN {1 << (i - half)} ELSE 0 END"
        for i in range(half, bits)
    )
    return f"""
tok AS (
  SELECT doc_id, {hash60} AS h
  FROM documents, unnest({_TOKS}) AS u(t)),
bitsums AS (
  SELECT doc_id, count(*) AS n,
         {bit_sums}
  FROM tok GROUP BY doc_id),
sig AS (
  SELECT doc_id, ({lo})::BIGINT AS simhash_lo, ({hi})::BIGINT AS simhash_hi
  FROM bitsums)"""


def _simhash_oracle() -> str:
    return f"WITH {_simhash_sig_sql()}\nSELECT doc_id, simhash_lo, simhash_hi FROM sig"


def _simhash_pairs_oracle(max_hamming: int = 3, bits: int = 60) -> str:
    # strategy-independent oracle: ALL pairs within the Hamming radius
    # (the engine's banded-LSH join must reproduce it exactly — with
    # bands > max_hamming the pigeonhole guarantee makes LSH complete)
    half = bits // 2
    return f"""
WITH {_simhash_sig_sql(bits)},
fullsig AS (
  SELECT doc_id, simhash_hi * {1 << half} + simhash_lo AS s FROM sig)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM fullsig a JOIN fullsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


def _ngram_jaccard_oracle(table: str = "documents") -> str:
    # strategy-independent oracle: ALL doc pairs above the threshold
    # (all-pairs is fine at sf0.01; the engine's prefix-filter join must
    # reproduce it exactly — prefix filtering is complete, not a heuristic)
    sh_hashed = (
        "list_sort(list_distinct(list_transform(" + _SHINGLES.strip() + ",\n"
        "  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)))"
    )
    return f"""
WITH base AS (
  SELECT doc_id, {sh_hashed} AS sh FROM {table})
SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
       len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       len(list_distinct(sa.sh || sb.sh)) AS jac
FROM base sa JOIN base sb ON sa.doc_id < sb.doc_id
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
      len(list_distinct(sa.sh || sb.sh)) >= {_NJ_T}
"""


def _dedup_corpus_oracle() -> str:
    # phase 1: exact fingerprint groups keep min-id; phase 2: near-dup
    # clusters (all-pairs Jaccard + recursive-CTE min-label) over the
    # exact-phase survivors keep min-id — mirrors dedup.dedup_corpus
    sh_hashed = (
        "list_sort(list_distinct(list_transform(" + _SHINGLES.strip() + ",\n"
        "  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)))"
    )
    return rf"""
WITH RECURSIVE base_fp AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents),
reps AS (SELECT min(doc_id) AS doc_id FROM base_fp GROUP BY fp),
docs2 AS (SELECT d.* FROM documents d JOIN reps USING (doc_id)),
sets AS (SELECT doc_id, {sh_hashed} AS sh FROM docs2),
pairs AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
  FROM sets sa JOIN sets sb ON sa.doc_id < sb.doc_id
  WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        len(list_distinct(sa.sh || sb.sh)) >= {_NJ_T}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node),
labels AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, d.source FROM docs2 d
WHERE d.doc_id NOT IN (SELECT node FROM labels WHERE node <> cluster_id)
"""


def _lang_id_oracle() -> str:
    padded = "(' ' || lower(text) || ' ')"
    score_terms = {}
    for lang, words in T.LANG_MARKERS:
        terms = [
            f"((length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2})"
            for w in words
        ]
        score_terms[lang] = "(" + " + ".join(terms) + ")"
    whens = " ".join(
        f"WHEN __s_{lang} = __best AND __best > 0 THEN '{lang}'"
        for lang, _ in T.LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"__s_{lang}" for lang, _ in score_terms.items()) + ")"
    return f"""
WITH raw AS (SELECT doc_id,
  {", ".join(f"{expr} AS __s_{lang}" for lang, expr in score_terms.items())}
  FROM documents),
scored AS (SELECT *, {best} AS __best FROM raw)
SELECT doc_id, CASE {whens} ELSE 'und' END AS pred_lang FROM scored
"""


def _quality_oracle() -> str:
    stripped = "text"
    for ch in T._PUNCT:
        lit = "''''" if ch == "'" else f"'{ch}'"
        stripped = f"replace({stripped}, {lit}, '')"
    return f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) - length({stripped}) AS BIGINT) AS n_punct,
       (len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 5
        AND (length(text) - length({stripped}))
            <= len(regexp_split_to_array(lower(trim(text)), '\\s+')) * 0.5) AS keep
FROM documents
"""


_FOLD = "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"

_BATCH_PROBE_IDS = (0, 7, 19)


def _q_char_entropy_documents(spark, sf_dir):
    """Character-distribution entropy per document (operators/text.py::
    char_entropy) — the gibberish/boilerplate quality signal; work
    bounded by the max_chars slice."""
    from pyspark_skyline_spark.operators.text import char_entropy

    docs = load_table(spark, sf_dir, "documents")
    return char_entropy(docs, "doc_id", max_chars=500)


def _q_representative_skyline_part(spark, sf_dir):
    """Distance-based representative skyline (greedy farthest-point —
    inherently sequential, so no SQL oracle: rows-only check; the
    subset/spread/determinism contract is pytest-graded in
    tests/test_witness.py)."""
    from pyspark_skyline_spark import representative_skyline

    part = load_table(spark, sf_dir, "part")
    return representative_skyline(
        part, [("p_retailprice", "min"), ("p_size", "min")], 3, "p_partkey"
    ).select("p_partkey", "p_retailprice", "p_size")


def _q_extract_domains_documents(spark, sf_dir):
    """URL/domain extraction (operators/text.py::extract_domains) on
    deterministically injected links (the corpus has none — same
    injection technique as the pii_scrub oracle): every 3rd doc gets a
    mixed-case www URL, every 5th a second host, so lowercasing,
    www-stripping, dedup, and multi-URL extraction are all graded."""
    from pyspark_skyline_spark.operators.text import extract_domains

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" visit https://WWW.Site"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com/page now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" see http://Mirror.example.org/x")
            ).otherwise(F.lit("")),
        ),
    )
    return extract_domains(aug, "doc_id")


def _q_histogram_orders(spark, sf_dir):
    """Equi-width histogram (operators/profile.py::histogram): 8
    buckets over o_totalprice, empty buckets materialized — two
    aggregate jobs total."""
    from pyspark_skyline_spark.operators.profile import histogram

    orders = load_table(spark, sf_dir, "orders")
    h = histogram(orders, "o_totalprice", bins=8)
    # lo/hi are UNROUNDED: both engines evaluate the identical IEEE
    # sequence t=(hi-lo)/8; u=i*t; v=lo+u, so the doubles are
    # bit-identical and rounding (Spark HALF_UP vs DuckDB half-even —
    # the r3 ADVICE boundary risk) is not needed at all
    return h.select("bucket", "lo", "hi", "n")


def _q_equi_depth_orders(spark, sf_dir):
    """Equi-depth binning (operators/shuffle.py::ntile_global): exact
    SQL ntile(8) semantics over (o_totalprice, o_orderkey) — one range
    shuffle + positional arithmetic, NOT Window.orderBy's single-task
    global sort (the canonical quantile-bucketing scale wall). The
    equi-width histogram row grades value-space binning; this grades
    rank-space binning."""
    from pyspark_skyline_spark.operators.shuffle import ntile_global

    orders = load_table(spark, sf_dir, "orders")
    return ntile_global(
        orders.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        8,
    ).select("o_orderkey", "tile")


def _q_equi_depth_by_status_orders(spark, sf_dir):
    """Per-group equi-depth binning (operators/shuffle.py::
    ntile_by_group): exact ntile(4) PARTITION BY o_orderstatus
    semantics via the skew-free grouped rank + broadcast count table —
    a hot status value spans many partitions instead of one window
    task."""
    from pyspark_skyline_spark.operators.shuffle import ntile_by_group

    orders = load_table(spark, sf_dir, "orders")
    return ntile_by_group(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        ["o_orderstatus"],
        ["o_totalprice", "o_orderkey"],
        4,
    ).select("o_orderkey", "o_orderstatus", "tile")


def _q_scd2_events(spark, sf_dir):
    """SCD type-2 history (operators/upsert.py::scd2_history): each
    user's event log becomes validity intervals — lead() per key, one
    shuffle. (events' microsecond timestamps are tie-free; the operator
    rejects tied versions loudly.)"""
    from pyspark_skyline_spark.operators.upsert import scd2_history

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    return scd2_history(ev, ["user_id"], "ts").select(
        "user_id", "event_id", "valid_from", "valid_to", "is_current"
    )


def _q_fuzzy_pairs_part(spark, sf_dir):
    """Edit-distance record linkage (operators/fuzzy.py): part-name
    pairs within levenshtein distance 2 via the positional q-gram
    filter + exact verify. The strategy-independent all-pairs oracle
    applies because the filter is exact (no gram-frequency cap)."""
    from pyspark_skyline_spark.operators.fuzzy import fuzzy_pairs

    part = load_table(spark, sf_dir, "part")
    return fuzzy_pairs(part, "p_partkey", "p_name", max_dist=2)


def _batch_topk_oracle() -> str:
    dot_vp = _FOLD.format(a="e.v", b="p.pvec")
    dot_vv = _FOLD.format(a="e.v", b="e.v")
    dot_pp = _FOLD.format(a="p.pvec", b="p.pvec")
    ids = ", ".join(str(i) for i in _BATCH_PROBE_IDS)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id AS pid, v AS pvec FROM e WHERE vec_id IN ({ids})),
scored AS (
  SELECT p.pid, e.vec_id,
         {dot_vp} / (sqrt({dot_vv}) * sqrt({dot_pp})) AS cos
  FROM e, p WHERE e.vec_id <> p.pid)
SELECT pid, rank, vec_id FROM (
  SELECT pid, vec_id,
         CAST(row_number() OVER (PARTITION BY pid ORDER BY cos DESC, vec_id)
              AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
"""




def _cosine_topk_oracle() -> str:
    dot_vp = _FOLD.format(a="v", b="pv")
    dot_vv = _FOLD.format(a="v", b="v")
    dot_pp = _FOLD.format(a="pv", b="pv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT v AS pv FROM e WHERE vec_id = {_PROBE_ID}),
scored AS (
  SELECT vec_id, {dot_vp} / (sqrt({dot_vv}) * sqrt({dot_pp})) AS cos
  FROM e, p WHERE vec_id <> {_PROBE_ID})
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank, vec_id
FROM scored ORDER BY cos DESC, vec_id LIMIT {_TOPK_K}
"""


def _multimodal_meta_oracle() -> str:
    byte = lambda i: f"('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT"  # noqa: E731
    return f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(16 + ({byte(0)} % 240) AS INT) AS width,
       CAST(16 + ({byte(1)} % 240) AS INT) AS height,
       CASE {byte(2)} % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
FROM documents
"""


def _shingles_sql_k(k: int) -> str:
    """Distinct word ``k``-shingle SQL mirroring ``dedup.shingles(k=k)``
    (generalization of the hardcoded k=3 ``_SHINGLES``)."""
    concat = " || ' ' || ".join(f"{_TOKS}[i+{j + 1}]" for j in range(k))
    return f"""list_distinct(CASE WHEN len({_TOKS}) >= {k}
     THEN list_transform(range(0, len({_TOKS}) - {k - 1}), i -> {concat})
     ELSE [array_to_string({_TOKS}, ' ')] END)"""


def _repetition_oracle() -> str:
    # mirrors filtering.repetition_stats default thresholds exactly:
    # int/int divisions as double (bit-identical across engines), keep =
    # conjunction of the same comparisons
    return r"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+') AS toks,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                     ln -> trim(ln) <> '') AS lines
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS nw, len(lines) AS nl,
         len(list_distinct(toks)) AS ndw, len(list_distinct(lines)) AS ndl,
         CASE WHEN len(toks) <= 100000 THEN
           list_max(list_transform(list_distinct(toks),
                    w -> len(list_filter(toks, x -> x = w)))) END AS topc,
         list_sum(list_transform(toks, w -> length(w))) AS tchars
  FROM base),
f AS (
  SELECT doc_id, nw,
         CASE WHEN nl > 0 THEN (nl - ndl)::DOUBLE / nl ELSE 0.0 END AS dup_line_frac,
         CASE WHEN nw > 0 THEN (nw - ndw)::DOUBLE / nw ELSE 0.0 END AS dup_word_frac,
         CASE WHEN nw > 0 THEN topc::DOUBLE / nw ELSE 0.0 END AS top_word_frac,
         CASE WHEN nw > 0 THEN tchars::DOUBLE / nw ELSE 0.0 END AS mean_word_len
  FROM m)
SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       dup_line_frac, dup_word_frac, top_word_frac, mean_word_len,
       (nw >= 5 AND nw <= 100000 AND dup_line_frac <= 0.3
        AND dup_word_frac <= 0.5 AND top_word_frac <= 0.2) AS keep
FROM f
"""


def _pii_oracle() -> str:
    # same enrichment suffix + pattern chain (and replacement order) as
    # _q_pii_scrub / filtering._PII_PATTERNS; counts run on the original
    pats = {k: p for k, p, _ in FL._PII_PATTERNS}
    repl = {k: r for k, _, r in FL._PII_PATTERNS}
    scrubbed = "txt"
    for kind, _, _ in FL._PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pats[kind]}', '{repl[kind]}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(txt, '{pats[kind]}')) AS BIGINT) AS n_{kind}"
        for kind, _, _ in FL._PII_PATTERNS
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         coalesce(text, '') || ' reach user' || doc_id || '@example.com via 10.0.0.'
           || (doc_id % 200) || ' or +1 555-123-4567' AS txt
  FROM documents)
SELECT doc_id,
       {counts},
       {scrubbed} AS text_scrubbed
FROM t
"""


def _decontaminate_oracle() -> str:
    sh8 = _shingles_sql_k(8)
    h = _HASH60.format(x="g")
    return f"""
WITH sh AS (
  SELECT doc_id, {sh8} AS s FROM documents),
probe AS (
  SELECT DISTINCT {h} AS h
  FROM sh, unnest(s) AS u(g) WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
grams AS (
  SELECT doc_id, {h} AS h
  FROM train, unnest(s) AS u(g)),
hits AS (
  SELECT doc_id, count(*) AS n FROM grams JOIN probe USING (h) GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
       coalesce(h.n, 0) >= 1 AS contaminated
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
"""


def _column_profile_oracle(table: str, cols: list[tuple[str, bool]]) -> str:
    # one SELECT per profiled column (numeric flag controls min/max/mean);
    # count(DISTINCT) matches the engine's distinct_mode="exact"
    selects = []
    for c, numeric in cols:
        if numeric:
            mmm = (
                f"CAST(min({c}) AS DOUBLE) AS min, CAST(max({c}) AS DOUBLE) AS max,\n"
                f"       avg(CAST({c} AS DOUBLE)) AS mean"
            )
        else:
            mmm = (
                "CAST(NULL AS DOUBLE) AS min, CAST(NULL AS DOUBLE) AS max,\n"
                "       CAST(NULL AS DOUBLE) AS mean"
            )
        selects.append(
            f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS approx_distinct,
       {mmm}
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)


def _cosine_near_dup_oracle(threshold: float) -> str:
    # all-pairs exact threshold join — valid because the driver entry
    # runs the LSH pipeline in its exhaustive (single-bucket) mode
    dot_ab = _FOLD.format(a="a.v", b="b.v")
    dot_vv = _FOLD.format(a="v", b="v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt({dot_vv}) AS nv FROM e)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {dot_ab} / (a.nv * b.nv) >= {threshold}
"""


def _cosine_near_dup_lsh_oracle(threshold: float, n_planes: int, n_tables: int) -> str:
    # EXACT oracle for the LSH mode itself (plane_mode="md5"): the
    # plane matrix is the parity of md5(t || '_' || p || '_' || i) and
    # the projection runs on floor(v[i] * 1e6) BIGINTs, so bucket ids
    # are integer-exact in both engines; candidates = co-bucketed in
    # any table, verify = exact cosine (same fold as the exhaustive
    # oracle). Mirrors operators/similarity.py::_md5_planes +
    # _bucket_udf's integer path.
    dot_ab = _FOLD.format(a="a.v", b="b.v")
    dot_vv = _FOLD.format(a="v", b="v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, i, CAST(floor(v[i] * 1000000.0) AS BIGINT) AS qv
      FROM e, range(1, 65) r(i)),
c AS (SELECT t, p, i,
             CASE WHEN ('0x' || substr(md5(CAST(t AS VARCHAR) || '_' ||
                        CAST(p AS VARCHAR) || '_' ||
                        CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS cv
      FROM range(0, {n_tables}) rt(t),
           range(0, {n_planes}) rp(p),
           range(1, 65) ri(i)),
dots AS (SELECT q.vec_id, c.t, c.p, sum(q.qv * c.cv) AS dp
         FROM q JOIN c USING (i) GROUP BY 1, 2, 3),
buckets AS (SELECT vec_id, t,
                   sum(CASE WHEN dp > 0 THEN (CAST(1 AS BIGINT) << p)
                            ELSE 0 END) AS b
            FROM dots GROUP BY 1, 2),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM buckets x JOIN buckets y
           ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id),
n AS (SELECT vec_id, v, sqrt({dot_vv}) AS nv FROM e)
SELECT id_a, id_b
FROM cand
JOIN n a ON a.vec_id = cand.id_a
JOIN n b ON b.vec_id = cand.id_b
WHERE {dot_ab} / (a.nv * b.nv) >= {threshold}
"""


_ORACLES: dict[str, str] = {
    "dedup_exact_events": "SELECT DISTINCT user_id, event_type, value FROM events",
    "text_stats_documents": r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT)
         AS total_tokens
FROM documents GROUP BY lang
""",
    "subword_count_documents": r"""
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(
           regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'),
           r -> CAST(ceil(length(r) / 6.0) AS BIGINT))), 0) AS BIGINT) AS n_subwords
FROM documents
""",
    "lang_id_documents": _lang_id_oracle(),
    "fingerprint_documents": r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents
""",
    "quality_documents": _quality_oracle(),
    "winnow_fingerprints_documents": f"""
WITH base AS (SELECT doc_id, {_ORDERED_SHINGLES.strip()} AS sh FROM documents),
ex AS (SELECT doc_id, unnest(sh) AS s, generate_subscripts(sh, 1) - 1 AS pos0 FROM base),
h AS (SELECT doc_id, pos0, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM ex),
wm AS (SELECT doc_id, pos0,
              min(h) OVER (PARTITION BY doc_id ORDER BY pos0
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
              count(*) OVER (PARTITION BY doc_id) AS n
       FROM h)
SELECT DISTINCT doc_id, fp FROM wm WHERE pos0 <= greatest(n - 4, 0)
""",
    "minhash_pairs_documents": _minhash_oracle(),
    "dedup_incremental_neardup_documents": _incr_neardup_oracle(),
    "simhash_documents": _simhash_oracle(),
    "simhash_pairs_documents": _simhash_pairs_oracle(_SH_MAX_HAMMING),
    "chunk_documents": """
WITH toks AS (
  SELECT doc_id, {toks} AS t, len({toks}) AS n FROM documents),
chunks AS (
  SELECT doc_id, i AS chunk_idx, t[i*48+1 : i*48+64] AS c
  FROM toks, unnest(range(0, cast(ceil(n / 48.0) AS BIGINT))) AS u(i))
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       array_to_string(c, ' ') AS chunk_text, len(c)::BIGINT AS n_tokens
FROM chunks
""".replace("{toks}", _TOKS),
    "rolling_stats_events": """
SELECT event_id, user_id,
       count(*) OVER frame::BIGINT AS n_in_frame,
       min(value) OVER frame AS min_value,
       max(value) OVER frame AS max_value,
       lag(value, 1) OVER w AS prev_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       frame AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    # strategy-independent k-skyband oracle: exact dominator-count subquery
    "k_skyband_part": """
SELECT DISTINCT p_retailprice, p_size, cnt::BIGINT AS n_dominators FROM (
  SELECT p.p_retailprice, p.p_size,
         (SELECT count(*) FROM part q
          WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)) AS cnt
  FROM part p)
WHERE cnt < 3
""",
    # gaps-and-islands: lag marks session starts, running sum numbers them
    "sessionize_events": """
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT event_id, user_id,
       (sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_id
FROM flagged
""",
    "skyline_layers_orders": _skyline_layers_oracle(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")], 3
    ),
    "pack_batches_orders": """
WITH h AS (
  SELECT o_orderkey,
         ('0x' || substr(md5(o_orderkey::VARCHAR || '#' || 7), 1, 15))::BIGINT AS hh
  FROM orders)
SELECT o_orderkey, (hh % 32)::BIGINT AS batch_id,
       (row_number() OVER (PARTITION BY hh % 32 ORDER BY hh, o_orderkey) - 1)::BIGINT AS batch_pos
FROM h
""",
    # strategy-independent range-join oracle: plain theta join
    "range_join_error_click_events": """
SELECT e.event_id AS err_id, c.event_id AS click_id
FROM events e, events c
WHERE e.event_type = 'error' AND c.event_type = 'click'
  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
""",
    "ngram_jaccard_documents": _ngram_jaccard_oracle(),
    # connected components over the near-dup pair graph: the iterative
    # min-label propagation must equal the recursive-CTE min-reachable-id
    "near_dup_clusters_documents": f"""
WITH RECURSIVE pairs AS ({_ngram_jaccard_oracle().strip()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node)
SELECT node, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY node
""",
    "cosine_topk_embeddings": _cosine_topk_oracle(),
    # exhaustive-mode ANN entries (see the query docstrings): the exact
    # oracles apply because the driver parameters disable pruning
    "cosine_topk_lsh_embeddings": _cosine_topk_oracle(),
    "cosine_topk_ivf_embeddings": _cosine_topk_oracle(),
    "cosine_near_dup_embeddings": _cosine_near_dup_oracle(0.45),
    "cosine_near_dup_lsh_embeddings": _cosine_near_dup_lsh_oracle(0.45, 4, 8),
    "global_top_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    "equi_depth_orders": """
SELECT o_orderkey,
       CAST(ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS tile
FROM orders
""",
    "equi_depth_by_status_orders": """
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey) AS INT) AS tile
FROM orders
""",
    "set_ops_customers": """
SELECT o_custkey FROM orders WHERE month(o_orderdate) <= 6
INTERSECT
SELECT o_custkey FROM orders WHERE month(o_orderdate) > 6
""",
    "topk_orders_per_customer": """
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
    "agg_lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "multimodal_meta_documents": _multimodal_meta_oracle(),
    "multimodal_frame_sample": """
WITH b AS (
  SELECT doc_id AS id, text,
         octet_length(encode(text)) % 5 + 1 AS nf
  FROM documents),
idx AS (SELECT id, text, range(0, nf) AS idxs FROM b)
SELECT id, CAST(i AS INT) AS frame_idx, CAST(i * 40 AS BIGINT) AS ts_ms,
       md5(text || ':' || i) AS frame_checksum
FROM idx, UNNEST(idxs) AS t(i)
""",
    "windowed_skyline_events": skyline_oracle_sql(
        "(SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, "
        "value, event_id FROM events) w",
        [("value", "max"), ("event_id", "min")],
        by=["window_start"],
    ),
    "distinct_users_by_type": """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
    "stream_window_stats_orders": """
WITH w AS (
  SELECT make_timestamp((epoch_us(o_orderdate::TIMESTAMP) // 2592000000000)
                        * 2592000000000) AS window_start,
         o_totalprice AS v
  FROM orders),
m AS (SELECT max(o_orderdate)::TIMESTAMP - INTERVAL 1 DAY AS wm FROM orders)
SELECT window_start,
       window_start + INTERVAL 30 DAY AS window_end,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(v), 2) AS sum_value,
       round(min(v), 2) AS min_value,
       round(max(v), 2) AS max_value
FROM w, m
GROUP BY window_start, wm
HAVING window_start + INTERVAL 30 DAY <= wm
""",
    "stream_session_stats_events": """
WITH lg AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 4 HOUR THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lg),
agg AS (
  SELECT user_id, min(ts) AS session_start,
         max(ts) + INTERVAL 4 HOUR AS session_end,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM s GROUP BY user_id, sid),
m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
SELECT session_start, session_end, user_id, n_rows FROM agg, m
WHERE session_end <= wm
""",
    # each event expands to its duration/slide = 4 overlapping windows
    # (slide-aligned to the unix epoch, exactly Spark's window() origin);
    # keep windows closed by the final watermark max(ts) - 1h
    "stream_sliding_stats_events": """
WITH w AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS b, value
  FROM events),
ex AS (
  SELECT b - (k * INTERVAL 30 MINUTE) AS window_start, value
  FROM w, unnest(range(0, 4)) AS t(k)),
m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(value) AS min_value,
       max(value) AS max_value
FROM ex, m GROUP BY window_start, wm
HAVING window_start + INTERVAL 2 HOUR <= wm
""",
    "stream_skyline_orders": skyline_oracle_sql(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")]
    ),
    "skyline_orders_by_status": skyline_oracle_sql(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")], by=["o_orderstatus"]
    ),
    "join_skyline_customer_nation": skyline_oracle_sql(
        "(SELECT c.*, n.n_regionkey FROM customer c JOIN nation n "
        "ON c.c_nationkey = n.n_nationkey) j",
        [("c_acctbal", "max"), ("c_custkey", "min")],
        by=["n_regionkey"],
    ),
    # as-of join: the quadratic row_number() formulation is the oracle;
    # the engine's union-scan must reproduce it exactly (ties -> max
    # click ts then max click event_id)
    "asof_error_click_events": """
SELECT e.event_id AS err_id, c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM events e JOIN events c
  ON c.user_id = e.user_id AND c.ts <= e.ts
WHERE e.event_type = 'error' AND c.event_type = 'click'
QUALIFY row_number() OVER (PARTITION BY e.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) = 1
""",
    "hash_sample_orders": f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR || '#{_SAMPLE_SEED}'), 1, 15))::BIGINT
      < {int(_SAMPLE_FRAC * (1 << 60))}
""",
    "stratified_sample_events": f"""
SELECT event_id, event_type, user_id FROM events
WHERE ('0x' || substr(md5(event_id::VARCHAR || '#{_SAMPLE_SEED}'), 1, 15))::BIGINT
      < CASE {' '.join(f"WHEN event_type = '{s}' THEN {int(f * (1 << 60))}" for s, f in sorted(_STRATA_FRACS.items()))} ELSE 0 END
""",
    "vocab_topk_documents": rf"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
  FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT {_VOCAB_K}
""",
    "dedup_corpus_documents": _dedup_corpus_oracle(),
    # shared integer cut points via split_thresholds(): both engines use
    # the SAME float-accumulated band edges on the md5 60-bit hash
    "split_dataset_orders": (lambda bands: f"""
SELECT o_orderkey,
       CASE {' '.join(f"WHEN h < {thr} THEN '{name}'" for name, thr in bands[:-1])}
            ELSE '{bands[-1][0]}' END AS split
FROM (SELECT o_orderkey,
             ('0x' || substr(md5(o_orderkey::VARCHAR || '#{_SAMPLE_SEED}'), 1, 15))::BIGINT AS h
      FROM orders)
""")(SA.split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})),
    "dedup_incremental_documents": r"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents),
ledger AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 4 = 0),
fresh AS (
  SELECT f.doc_id, f.fp FROM fp f
  WHERE f.doc_id % 4 <> 0 AND f.fp NOT IN (SELECT fp FROM ledger))
SELECT doc_id, fp FROM fresh
QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
""",
    "stream_vocab_documents": rf"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
  FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT {_VOCAB_K}
""",
    "contamination_report_documents": (lambda sh8, h: f"""
WITH sh AS (
  SELECT doc_id, {sh8} AS s FROM documents),
probe AS (
  SELECT DISTINCT doc_id AS eval_id, {h} AS h
  FROM sh, unnest(s) AS u(g) WHERE doc_id % 50 = 0),
grams AS (
  SELECT doc_id, {h} AS h
  FROM sh, unnest(s) AS u(g) WHERE doc_id % 50 <> 0),
pairs AS (
  SELECT DISTINCT probe.eval_id, grams.doc_id
  FROM grams JOIN probe USING (h))
SELECT eval_id, CAST(count(*) AS BIGINT) AS n_leaking_docs
FROM pairs GROUP BY eval_id
""")(_shingles_sql_k(8), _HASH60.format(x="g")),
    "heavy_hitters_events": """
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
ORDER BY n DESC, user_id ASC, event_type ASC LIMIT 20
""",
    "skew_stats_events": """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(n) AS BIGINT) AS max_key_rows,
       round(avg(n), 6) AS avg_key_rows,
       round(max(n) / avg(n), 6) AS skew_ratio
FROM c
""",
    "stream_join_error_click_events": """
SELECT e.event_id AS err_id, c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM events e JOIN events c
  ON c.user_id = e.user_id
 AND c.ts <= e.ts
 AND c.ts >= e.ts - INTERVAL 30 MINUTE
WHERE e.event_type = 'error' AND c.event_type = 'click'
""",
    "rollup_orders": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "pivot_events": f"""
SELECT user_id,
       {', '.join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
""",
    # Spark's exact `percentile` and DuckDB's quantile_cont share the
    # same interpolated definition; round(6) absorbs ulp noise
    "column_quantiles_orders": """
SELECT 'o_totalprice' AS column, 0.25 AS p,
       round(quantile_cont(o_totalprice, 0.25), 6) AS value FROM orders
UNION ALL
SELECT 'o_totalprice', 0.5, round(quantile_cont(o_totalprice, 0.5), 6) FROM orders
UNION ALL
SELECT 'o_totalprice', 0.75, round(quantile_cont(o_totalprice, 0.75), 6) FROM orders
""",
    # N and avgdl are exact in both engines (integer-valued sums below
    # 2^53), so only ln/division carry float noise — absorbed by round(6)
    "bm25_documents": rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks))::DOUBLE AS avgdl FROM base),
hits AS (
  SELECT doc_id, len(toks) AS dl, t AS term, count(*)::DOUBLE AS tf
  FROM base, unnest(toks) AS u(t)
  WHERE t IN ({', '.join(repr(t) for t in _BM25_TERMS)})
  GROUP BY doc_id, len(toks), t),
dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df_term FROM hits GROUP BY term)
SELECT doc_id,
       round(sum(
         ln(1 + (stats.n - df_term + 0.5) / (df_term + 0.5))
         * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / stats.avgdl))
       ), 6) AS score
FROM hits JOIN dfreq USING (term), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    # md5 hash/sign mirror hash64_expr(mode='md5'); dense vectors built
    # from an ids x buckets grid so zero buckets (and token-less docs)
    # appear explicitly
    "hash_embed_documents": r"""
WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
    FROM documents)
  WHERE t <> ''),
h AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 15))::BIGINT % 16 AS b,
         CASE WHEN ('0x' || substr(md5(t || '#1'), 1, 15))::BIGINT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM tok),
sums AS (SELECT doc_id, b, sum(s) AS v FROM h GROUP BY doc_id, b),
ids AS (SELECT DISTINCT doc_id FROM documents),
grid AS (SELECT ids.doc_id, r.i FROM ids, range(0, 16) AS r(i)),
vals AS (
  SELECT grid.doc_id, grid.i, coalesce(sums.v, 0.0) AS v
  FROM grid LEFT JOIN sums ON sums.doc_id = grid.doc_id AND sums.b = grid.i)
SELECT doc_id, list(v ORDER BY i) AS embedding FROM vals GROUP BY doc_id
""",
    # docs shorter than n tokens contribute nothing (same filter both
    # sides); \s+ separators collapse runs identically in both engines
    "ngram_counts_documents": r"""
WITH d AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents),
g AS (
  SELECT array_to_string(list_slice(toks, i, i + 1), ' ') AS ngram
  FROM d, unnest(range(1, len(toks))) AS t(i)
  WHERE len(toks) >= 2)
SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM g
WHERE ngram <> ''
GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 40
""",
    "multi_join_revenue": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    # rank orders by the ROUNDED score in both engines so float ties
    # cannot reorder the cut; (doc, term) is unique so rank is total
    "tfidf_topk_documents": r"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
    FROM documents)
  WHERE term <> '' GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_term FROM tf GROUP BY term),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents)
SELECT * FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(n.n_docs / dfq.df_term), 6) AS score,
         CAST(row_number() OVER (
              PARTITION BY tf.doc_id
              ORDER BY round(tf.tf * ln(n.n_docs / dfq.df_term), 6) DESC,
                       tf.term ASC) AS BIGINT) AS rank
  FROM tf JOIN dfq USING (term), n)
WHERE rank <= 3
""",
    "repetition_stats_documents": _repetition_oracle(),
    "pii_scrub_documents": _pii_oracle(),
    "decontaminate_documents": _decontaminate_oracle(),
    "column_profile_orders": _column_profile_oracle(
        "orders",
        [
            ("o_orderkey", True),
            ("o_custkey", True),
            ("o_orderstatus", False),
            ("o_orderdate", False),
        ],
    ),
    # the streaming state-store path must reproduce the batch windowed
    # skyline exactly (union-of-emissions reduction; see the query)
    "windowed_stream_skyline_events": skyline_oracle_sql(
        "(SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, "
        "value, event_id FROM events) w",
        [("value", "max"), ("event_id", "min")],
        by=["window_start"],
    ),
    # prefix == full table under availableNow, so the batch oracle applies
    "two_stage_skyline_orders": skyline_oracle_sql(
        "orders", [("o_totalprice", "max"), ("o_orderdate", "min")]
    ),
    # independent JSON engines: Spark get_json_object vs DuckDB's JSON
    # extension; min/max grade the row-level extraction, the group-by
    # grades the typed cast
    "json_extract_events": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1
""",
    # stream-static inner join emits every match of the replay, so the
    # plain batch join is exact
    "stream_enrich_events": """
SELECT e.event_id, e.user_id, c.c_name, round(c.c_acctbal, 2) AS acctbal
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
    # update/passthrough split expressed relationally; both engines do
    # the same double multiply + round, so values match bit-for-bit
    "upsert_orders": """
SELECT o_orderkey, 'U' AS o_orderstatus,
       round(o_totalprice + 1000.0, 2) AS totalprice
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
FROM orders WHERE o_orderkey % 10 <> 0
""",
    "cube_orders": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    "grouping_sets_orders": """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    # dense hourly grid via generate-series + left join; empty buckets
    # zero-filled in both engines
    "resample_events": """
WITH k AS (
  SELECT event_type, (floor(epoch_us(ts) / 3600000000))::BIGINT AS hb, value
  FROM events),
a AS (
  SELECT event_type, hb, CAST(count(*) AS BIGINT) AS n,
         round(sum(value), 6) AS sum_value
  FROM k GROUP BY 1, 2),
bounds AS (SELECT event_type, min(hb) AS lo, max(hb) AS hi FROM k GROUP BY 1),
grid AS (SELECT event_type, unnest(range(lo, hi + 1)) AS hb FROM bounds)
SELECT g.event_type,
       coalesce(a.n, 0) AS n,
       coalesce(a.sum_value, 0.0) AS sum_value,
       make_timestamp(g.hb * 3600000000) AS bucket_start
FROM grid g LEFT JOIN a ON a.event_type = g.event_type AND a.hb = g.hb
""",
    # fold impl -> bit-identical doubles; one corpus pass, 3 probes
    "cosine_topk_batch_embeddings": _batch_topk_oracle(),
    # same slice cap, lowercase, and log2 arithmetic; round(6) absorbs
    # summation-order float noise. ACCEPTED BOUNDARY RISK (r3 ADVICE):
    # round() is HALF_UP in Spark vs half-even in DuckDB, so a computed
    # entropy landing EXACTLY on a representable 5e-7 tie would diverge;
    # entropies are sums of p*log2(p) terms, which cannot be exact
    # decimal ties except for degenerate one-symbol inputs (entropy 0,
    # tie-free), so the risk is accepted rather than tolerated away.
    "char_entropy_documents": """
WITH ch AS (
  SELECT doc_id,
         unnest(string_split(substr(lower(text), 1, 500), '')) AS c
  FROM documents),
cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch WHERE c <> ''
        GROUP BY 1, 2),
ent AS (
  SELECT doc_id,
         round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6) AS entropy
  FROM cnt GROUP BY doc_id)
SELECT d.doc_id, ent.entropy FROM documents d LEFT JOIN ent USING (doc_id)
""",
    # the injected-link construction makes the expected set closed-form
    "extract_domains_documents": """
SELECT doc_id, 'site' || (doc_id % 7) || '.example.com' AS domain
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'mirror.example.org' AS domain
FROM documents WHERE doc_id % 5 = 0
""",
    # same IEEE edge arithmetic (lo + i*span), max closed into the top
    # bucket, empty buckets zero-filled; edges UNROUNDED — both engines
    # run the identical double op sequence, so the values are
    # bit-identical without any tie-breaking-sensitive round()
    "histogram_orders": """
WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
k AS (
  SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 8)) AS BIGINT), 7)
           AS bucket
  FROM orders CROSS JOIN b),
c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1),
grid AS (SELECT unnest(range(0, 8)) AS bucket)
SELECT CAST(grid.bucket AS INT) AS bucket,
       b.lo + grid.bucket * ((b.hi - b.lo) / 8) AS lo,
       CASE WHEN grid.bucket = 7 THEN b.hi
            ELSE b.lo + (grid.bucket + 1) * ((b.hi - b.lo) / 8) END AS hi,
       coalesce(c.n, 0) AS n
FROM grid CROSS JOIN b LEFT JOIN c ON c.bucket = grid.bucket
""",
    "scd2_events": """
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""",
    # strategy-independent: plain all-pairs levenshtein threshold join
    "fuzzy_pairs_part": """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b ON a.p_partkey < b.p_partkey
WHERE a.p_name IS NOT NULL AND b.p_name IS NOT NULL
  AND levenshtein(a.p_name, b.p_name) <= 2
""",
    # witnesses restricted to the frontier (sound: dominance is
    # transitive); min frontier id per dominated row, NULL for members
    "skyline_witness_part": """
WITH t AS (SELECT p_partkey, p_retailprice, p_size FROM part),
sky AS (
  SELECT * FROM t p WHERE NOT EXISTS (
    SELECT 1 FROM t q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)))
SELECT p.p_partkey, p.p_retailprice, p.p_size,
       (SELECT min(s.p_partkey) FROM sky s
        WHERE s.p_retailprice <= p.p_retailprice AND s.p_size <= p.p_size
          AND (s.p_retailprice < p.p_retailprice OR s.p_size < p.p_size))
         AS witness
FROM t p
""",
    # same md5 hash order, bucket arithmetic, and batch-id formula
    "pack_by_length_documents": """
WITH h AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || '#' || '0'), 1, 15))::BIGINT AS hh
  FROM documents),
k AS (
  SELECT doc_id,
         CAST(floor(n_chars / 256.0) AS BIGINT) AS len_bucket,
         hh % 4 AS shard, hh
  FROM h),
r AS (
  SELECT doc_id, len_bucket, shard,
         row_number() OVER (PARTITION BY len_bucket, shard
                            ORDER BY hh, doc_id) - 1 AS rn
  FROM k)
SELECT doc_id, len_bucket,
       CAST((len_bucket * 4 + shard) * 1099511627776 + rn // 8 AS BIGINT) AS batch_id,
       CAST(rn % 8 AS BIGINT) AS batch_pos
FROM r
""",
    # identical IEEE ops both sides: md5 60-bit key hash vs
    # floor(weight * 2^60) threshold
    "weighted_sample_orders": """
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR || '#' || '42'), 1, 15))::BIGINT
      < CAST(floor(least(greatest((o_orderkey % 100) / 100.0, 0.0), 1.0)
                   * 1152921504606846976.0) AS BIGINT)
""",
    # Pearson is scale-invariant -> engine-portable modulo float noise;
    # round(6) absorbs the differing summation orders. ACCEPTED BOUNDARY
    # RISK (r3 ADVICE): Spark HALF_UP vs DuckDB half-even could diverge
    # on an EXACT 5e-7 tie, but corr of real data is an irrational-ish
    # ratio (sqrt in the denominator) — an exact decimal tie needs a
    # contrived integer lattice; accepted, not tolerated away.
    "correlations_lineitem": """
SELECT * FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
         round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount',
         round(corr(l_quantity, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax',
         round(corr(l_quantity, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount',
         round(corr(l_extendedprice, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax',
         round(corr(l_extendedprice, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax',
         round(corr(l_discount, l_tax), 6) FROM lineitem)
""",
    "global_shuffle_orders": """
WITH t AS (
  SELECT o_orderkey,
         md5(concat_ws('|', '42', CAST(o_orderkey AS VARCHAR))) AS __ord
  FROM orders
)
SELECT o_orderkey, __ord,
       CAST(row_number() OVER (ORDER BY __ord) - 1 AS BIGINT) AS __pos,
       CAST((row_number() OVER (ORDER BY __ord) - 1) % 8 AS INT) AS __shard
FROM t
""",
    "mix_corpus_documents": """
WITH t AS (
  SELECT doc_id, source,
         md5(concat_ws('|', '7', CAST(doc_id AS VARCHAR))) AS __o
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY __o) - 1 AS mix_rank
  FROM t
)
SELECT doc_id, source, CAST(mix_rank AS BIGINT) AS mix_rank
FROM r
WHERE mix_rank < CASE source WHEN 'src1' THEN 12 WHEN 'src3' THEN 3
                             WHEN 'src7' THEN 40 WHEN 'src11' THEN 7
                             ELSE 0 END
""",
    "paragraph_dedup_documents": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
ch AS (
  SELECT doc_id, g.pos AS pos,
         array_to_string(ws[(g.pos * 8 + 1):(g.pos * 8 + 8)], ' ') AS para
  FROM w, LATERAL (
    SELECT unnest(generate_series(0, CAST(ceil(len(ws) / 8.0) AS INT) - 1)) AS pos
  ) g
),
k AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
  FROM ch
)
SELECT doc_id,
       array_to_string(list(para ORDER BY pos), ' ') AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_kept
FROM k WHERE rn = 1 GROUP BY doc_id
""",
}

def _q_upsert_orders(spark, sf_dir):
    """Keyed merge/upsert (operators/upsert.py): a derived update batch
    (every 10th order, price +1000.0 — exact in doubles, no rounding
    landmine — status 'U') applied to the orders snapshot —
    update/passthrough semantics graded row-for-row. The snapshot side
    is a broadcast anti-join, never shuffled."""
    from pyspark_skyline_spark.operators.upsert import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    # +1000.0 is exact in doubles at this magnitude (no rounding step,
    # so no HALF_UP-vs-half-even divergence between engines)
    updates = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    merged = merge_upsert(orders, updates, ["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("totalprice")
    )


def _q_cube_orders(spark, sf_dir):
    """GROUP BY CUBE over (status, priority): all four grouping sets in
    one pass, subtotal rows carrying NULL markers — native Catalyst
    cube, map-side partials per grouping set (completes the
    rollup/cube/grouping-sets family; rollup_orders grades ROLLUP)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def _q_cosine_topk_batch_embeddings(spark, sf_dir):
    """Batch retrieval (operators/similarity.py::cosine_topk_batch):
    exact top-5 for three probes in ONE corpus pass, fold impl so the
    sequential-fold doubles match DuckDB bit-for-bit."""
    from pyspark_skyline_spark.operators.similarity import cosine_topk_batch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.where(F.col("vec_id").isin(list(_BATCH_PROBE_IDS))).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec")
    )
    return cosine_topk_batch(
        emb, probes, "vec_id", "embedding", "pid", "pvec", k=5, impl="fold"
    )


def _q_skyline_witness_part(spark, sf_dir):
    """Dominance explanation (operators/skyline.py::skyline_witness):
    per part, the minimal frontier member dominating it (NULL for
    frontier rows) — the partitioned skyline feeds a broadcast
    theta-join + min aggregate."""
    from pyspark_skyline_spark import skyline_witness

    part = load_table(spark, sf_dir, "part")
    return skyline_witness(
        part, [("p_retailprice", "min"), ("p_size", "min")], "p_partkey"
    )


def _q_pack_by_length_documents(spark, sf_dir):
    """Length-bucketed batch packing (operators/sample.py): documents
    batched by n_chars bucket with hash-deterministic order — the
    padding-efficiency primitive, graded row-for-row in md5 mode."""
    from pyspark_skyline_spark.operators.sample import pack_by_length

    docs = load_table(spark, sf_dir, "documents")
    return pack_by_length(
        docs.select("doc_id", "n_chars"), ["doc_id"], "n_chars",
        batch_size=8, bucket_width=256, n_shards=4, hash_mode="md5",
    ).select("doc_id", "len_bucket", "batch_id", "batch_pos")


def _q_weighted_sample_orders(spark, sf_dir):
    """Deterministic importance sampling (operators/sample.py): per-row
    keep probability (o_orderkey % 100)/100 via the shared key-hash
    threshold — reproducible in any engine, integer-free of float
    disagreement because both sides run the identical IEEE ops."""
    from pyspark_skyline_spark.operators.sample import weighted_sample

    orders = load_table(spark, sf_dir, "orders")
    w = (F.col("o_orderkey") % 100) / F.lit(100.0)
    return weighted_sample(orders, ["o_orderkey"], w).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
    )


def _q_correlations_lineitem(spark, sf_dir):
    """Pairwise Pearson correlations of lineitem's numeric columns in
    one aggregate job (operators/profile.py::column_correlations)."""
    from pyspark_skyline_spark.operators.profile import column_correlations

    li = load_table(spark, sf_dir, "lineitem")
    return column_correlations(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def _q_resample_events(spark, sf_dir):
    """Regular-grid resample (operators/resample.py): hourly
    count/sum(value) per event_type with EMPTY BUCKETS materialized and
    zero-filled — the shape plain GROUP BY cannot produce. Grid rows =
    span/step per group, generated not shuffled."""
    from pyspark_skyline_spark.operators.resample import resample

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return resample(
        ev,
        "ts",
        "1 hour",
        by=["event_type"],
        aggs={
            "n": F.count(F.lit(1)).cast("long"),
            "sum_value": F.round(F.sum("value"), 6),
        },
        fill="zero",
    )


def _q_grouping_sets_orders(spark, sf_dir):
    """Arbitrary GROUPING SETS through the SQL front door: per-status,
    per-priority, and grand-total groups in ONE pass (rollup_orders and
    cube_orders grade the fixed-shape variants; this grades the
    free-form list, which neither rollup nor cube can express)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _q_stream_enrich_events(spark, sf_dir):
    """Stream-static enrichment join through the REAL engine: streaming
    events looked up against the static customer dimension (broadcast,
    stateless per micro-batch). Inner stream-static joins emit every
    match of the replayed data, so the batch SQL join is an exact
    oracle."""
    import os
    import uuid

    from pyspark_skyline_spark.streaming.joins import stream_static_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    static_ev = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(static_ev.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "user_id")
        .select("user_id", "c_name", "c_acctbal")
    )
    joined = stream_static_join(stream, dim, ["user_id"], how="inner").select(
        "event_id", "user_id", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )
    name = f"enr_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def _q_json_extract_events(spark, sf_dir):
    """Typed JSON field extraction (operators/jsonx.py) feeding an
    ordinary aggregate: props ->> '$.k' as BIGINT, grouped by k % 10.
    Pure Catalyst (get_json_object + try_cast) — no Python, one scan of
    (props, value) only."""
    from pyspark_skyline_spark.operators.jsonx import json_extract

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ex = json_extract(df, "props", [("k", "$.k", "bigint")])
    return ex.groupBy((F.col("k") % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def _q_global_shuffle_orders(spark, sf_dir):
    """Deterministic epoch shuffle + balanced sharding
    (operators/shuffle.py): md5(seed|key) permutation, 0-based global
    position via the single-range-shuffle row-number machinery (no
    one-task global window), shard = pos % 8 (balanced to within one
    row). Fully oracle-gradable because DuckDB's md5 and the
    row_number order agree byte-for-byte."""
    from pyspark_skyline_spark.operators.shuffle import global_shuffle

    orders = load_table(spark, sf_dir, "orders")
    return global_shuffle(orders, ["o_orderkey"], n_shards=8, seed=42).select(
        "o_orderkey", "__ord", "__pos", "__shard"
    )


_MIX_TARGETS = {"src1": 12, "src3": 3, "src7": 40, "src11": 7}


def _q_mix_corpus_documents(spark, sf_dir):
    """Exact domain-weighted corpus mixture (operators/shuffle.py):
    per source keep the first targets[source] docs in md5(seed|doc_id)
    order — the training-pipeline "data mixing" step. src7's target
    (40) exceeds the 25 available, exercising the take-all branch;
    absent sources contribute nothing. One range shuffle via
    grouped_row_number (no per-domain single-task window)."""
    from pyspark_skyline_spark.operators.shuffle import mix_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return mix_corpus(docs, "source", _MIX_TARGETS, ["doc_id"], seed=7).select(
        "doc_id", "source", "mix_rank"
    )


def _q_paragraph_dedup_documents(spark, sf_dir):
    """Sub-document exact dedup with reassembly
    (operators/dedup.py::paragraph_dedup) — the RefinedWeb "line
    dedup" step. Units are 8-word chunks (this corpus has no
    structural separators); globally-first occurrence survives (by
    doc_id, pos), documents are rebuilt from surviving chunks, fully
    duplicated documents vanish. Winner-per-hash is a min(struct)
    aggregate (map-side partial agg, boilerplate-hash-skew safe)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.paragraph_dedup(docs, "doc_id", "text", chunk_words=8)


def _q_semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup (operators/similarity.py::semantic_dedup): spherical
    k-means cells + within-cell greedy cosine prune at 0.95. No SQL
    oracle (iterative k-means) — rows-only at the gate; exactness is
    graded by the planted-duplicate + NumPy-differential pytest
    (tests/test_similarity.py::test_semantic_dedup_drops_planted_duplicates)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb, "vec_id", "embedding", nlist=8, threshold=0.95, seed=42
    ).orderBy("vec_id")


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # NOTE: the driver grades at most 50 entries (round 1 registered 52
    # and the last 2 got no CORRECTNESS row), so this registry is held
    # at exactly 50 = 4 skyline + 46 here (__spark_entry__.queries()
    # asserts the total). Entries retired as redundant move to
    # _EXTRA_QUERIES below — still oracle-graded by pytest
    # (tests/test_entry.py), just not by the driver's capped gate.
    "text_stats_documents": _q_text_stats,
    "lang_id_documents": _q_lang_id,
    "quality_documents": _q_quality,
    "minhash_pairs_documents": _q_minhash_pairs,
    "ngram_jaccard_documents": _q_ngram_jaccard,
    "simhash_pairs_documents": _q_simhash_pairs,
    "range_join_error_click_events": _q_range_join_error_click,
    "chunk_documents": _q_chunk_documents,
    "skyline_layers_orders": _q_skyline_layers_orders,
    "k_skyband_part": _q_k_skyband_part,
    "cosine_topk_embeddings": _q_cosine_topk,
    # round-7: the LSH MODE itself is driver-graded — md5-Rademacher
    # planes over floored-integer projections make the bucket relation
    # bit-reproducible in SQL, so the scale path (bucketed, never
    # all-pairs) gets the exact oracle the exhaustive special case had;
    # the exhaustive n_planes=0 row rotated to extras (rationale at its
    # entry), gaussian-mode recall stays graded by the planted pytest
    # + the bench recall tail.
    "cosine_near_dup_lsh_embeddings": _q_cosine_near_dup_lsh,
    "set_ops_customers": _q_set_ops_customers,
    "topk_orders_per_customer": _q_topk_orders,
    "agg_lineitem_pricing": _q_agg_pricing,
    "multimodal_meta_documents": _q_multimodal_meta,
    "windowed_skyline_events": _q_windowed_skyline_events,
    "stream_skyline_orders": _q_stream_skyline_orders,
    "stream_window_stats_orders": _q_stream_window_stats_orders,
    # stream_session_stats_events rotated to extras in round 4: session
    # windows stay graded via sessionize_events (batch semantics) and
    # the remaining stream rows cover the streaming engine paths
    "skyline_orders_by_status": _q_skyline_by_status,
    "join_skyline_customer_nation": _q_join_skyline_customer_nation,
    "asof_error_click_events": _q_asof_error_click,
    "vocab_topk_documents": _q_vocab_topk,
    "dedup_corpus_documents": _q_dedup_corpus,
    # round-3 additions: LLM-pipeline filtering + profiling, and the
    # two streaming skyline topologies through the real state-store path
    "repetition_stats_documents": _q_repetition_stats,
    "pii_scrub_documents": _q_pii_scrub,
    "decontaminate_documents": _q_decontaminate,
    "column_profile_orders": _q_column_profile,
    "windowed_stream_skyline_events": _q_windowed_stream_skyline,
    "two_stage_skyline_orders": _q_two_stage_skyline,
    # late round-3 rotation: grade this session's new operator families
    # at the hard gate (JSON extraction, merge/upsert, dense-grid
    # resample); the retired rows' categories stay driver-covered —
    # exact dedup via dedup_corpus phase 1 + distinct_users_by_type,
    # multimodal via multimodal_meta_documents, sliding windows via the
    # session/tumbling/windowed-skyline stream rows
    "json_extract_events": _q_json_extract_events,
    "upsert_orders": _q_upsert_orders,
    # round-4 rotation: the strongest previously-ungraded families get
    # hard-gate rows (retired: skyline_part_angle, cosine_topk_ivf,
    # stream_session_stats — rationale at their extra entries).
    # fuzzy_pairs carries the subtlest soundness story in the repo (the
    # positional q-gram lower bound); scd2 grades interval construction;
    # histogram grades the bit-exact unrounded edge arithmetic.
    "fuzzy_pairs_part": _q_fuzzy_pairs_part,
    "scd2_events": _q_scd2_events,
    # round-4 rotation (second wave): the new training-data-layout +
    # sub-document-dedup families get hard-gate rows (retired:
    # global_top_orders, distinct_users_by_type, pack_batches_orders —
    # rationale at their extra entries). global_shuffle grades the
    # single-range-shuffle global row-number machinery; mix_corpus
    # grades skew-free grouped ranking + exact mixture allocation;
    # paragraph_dedup grades keep-first sub-document dedup with
    # reassembly.
    "global_shuffle_orders": _q_global_shuffle_orders,
    "mix_corpus_documents": _q_mix_corpus_documents,
    "paragraph_dedup_documents": _q_paragraph_dedup_documents,
    # round-5 rotation: the strongest remaining extras get hard-gate
    # rows (retired: skyline_part_dim, subword_count_documents,
    # rolling_stats_events — rationale at their extra entries).
    # stream_join grades the watermarked stream-stream interval join
    # through the real streaming engine (the only join family not yet
    # driver-graded); bm25 grades the text-relevance scoring family
    # (df/idf/length-normalized tf over the corpus); split_dataset
    # grades the anti-leak hash-split property — practically the most
    # load-bearing LLM-pipeline op that was still extras-only.
    "stream_join_error_click_events": _q_stream_join_events,
    "bm25_documents": _q_bm25_documents,
    "split_dataset_orders": _q_split_dataset_orders,
    # round-6 rotation: the round-5 ntile family gets hard-gate rows
    # (equi-depth binning via the range-shuffled global/grouped row
    # number — exact SQL ntile semantics without the single-task window
    # wall) and the incremental-ledger dedup family is driver-graded
    # for the first time (retired: skyline_orders_price_date,
    # winnow_fingerprints_documents, sessionize_events — rationale at
    # their extra entries).
    "equi_depth_orders": _q_equi_depth_orders,
    "equi_depth_by_status_orders": _q_equi_depth_by_status_orders,
    "dedup_incremental_documents": _q_dedup_incremental_documents,
    # round-7 rotation: the never-driver-graded OLAP family gets a
    # hard-gate row (cube — supersets rollup/grouping-sets coverage,
    # which stay oracle-graded as extras), window FRAMES return to the
    # gate via rolling_stats_events (rows-between rolling aggregates —
    # the ranked-window rows grade ordering, not frames), and the
    # incremental NEAR-dup ledger gets its first driver row — the
    # md5-mode signature-Jaccard estimate is bit-reproducible in SQL,
    # so the approximate path is exactly oracled (retired:
    # histogram_orders, resample_events, stratified_sample_events —
    # rationale at their extra entries).
    "cube_orders": _q_cube_orders,
    "rolling_stats_events": _q_rolling_stats_events,
    "dedup_incremental_neardup_documents": _q_dedup_incremental_neardup_documents,
}

#: Retired from the driver's 50-entry gate as redundant with rows that
#: remain graded (rationale per entry below); pytest still grades each
#: against its oracle, so coverage is retained at the weaker gate.
_EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # md5 fingerprint logic is also graded inside dedup_corpus_documents
    "fingerprint_documents": _q_fingerprint,
    # simhash signature construction is graded inside simhash_pairs_documents
    "simhash_documents": _q_simhash,
    # LSH bucketing is graded via cosine_near_dup_lsh_embeddings (same
    # hyperplane pipeline); exact rerank via cosine_topk_embeddings
    "cosine_topk_lsh_embeddings": _q_cosine_topk_lsh,
    # round-7 rotation out of the 50-cap (swapped for the LSH-mode row
    # above): the exhaustive n_planes=0 special case is subsumed — the
    # all-pairs threshold semantics stay graded here by the same exact
    # oracle, while the driver row now grades the bucketed scale path
    # (the mode a 100 TB corpus actually runs)
    "cosine_near_dup_embeddings": _q_cosine_near_dup,
    # connected-components clustering is graded inside dedup_corpus_documents
    "near_dup_clusters_documents": _q_near_dup_clusters,
    # the hash-threshold sampler core is graded via stratified_sample_events
    "hash_sample_orders": _q_hash_sample_orders,
    # late round-3 rotation (swapped for json/upsert/resample driver
    # rows): exact dedup graded inside dedup_corpus phase 1 +
    # distinct_users_by_type; multimodal 1-to-N via multimodal_meta;
    # sliding windows via the remaining stream agg rows
    "dedup_exact_events": _q_dedup_exact_events,
    "multimodal_frame_sample": _q_multimodal_frames,
    "stream_sliding_stats_events": _q_stream_sliding_stats_events,
    # round-3 additions past the 50-cap: oracle-graded by pytest
    "tfidf_topk_documents": _q_tfidf_topk_documents,
    "ngram_counts_documents": _q_ngram_counts_documents,
    "multi_join_revenue": _q_multi_join_revenue,
    "hash_embed_documents": _q_hash_embed_documents,
    "column_quantiles_orders": _q_column_quantiles_orders,
    "rollup_orders": _q_rollup_orders,
    "pivot_events": _q_pivot_events,
    # dedup_incremental_documents moved to the driver gate (rotation #6);
    # dedup_incremental_neardup_documents followed it there (rotation #7)
    "stream_vocab_documents": _q_stream_vocab_documents,
    "contamination_report_documents": _q_contamination_report_documents,
    "heavy_hitters_events": _q_heavy_hitters_events,
    "skew_stats_events": _q_skew_stats_events,
    "stream_enrich_events": _q_stream_enrich_events,
    "weighted_sample_orders": _q_weighted_sample_orders,
    "pack_by_length_documents": _q_pack_by_length_documents,
    "skyline_witness_part": _q_skyline_witness_part,
    "cosine_topk_batch_embeddings": _q_cosine_topk_batch_embeddings,
    "extract_domains_documents": _q_extract_domains_documents,
    # round-4 rotation out of the 50-cap (swapped for fuzzy/scd2/
    # histogram): IVF stays graded here + by the bench recall tail and
    # the exact/LSH driver rows; session windows stay graded via
    # sessionize_events + the remaining stream rows
    "cosine_topk_ivf_embeddings": _q_cosine_topk_ivf,
    "stream_session_stats_events": _q_stream_session_stats_events,
    # no oracle (sequential greedy): rows-only at the gate, contract
    # graded by pytest (tests/test_witness.py)
    "representative_skyline_part": _q_representative_skyline_part,
    "char_entropy_documents": _q_char_entropy_documents,
    # cube_orders moved to the driver gate (rotation #7); rollup /
    # grouping-sets are sub-lattices of the cube and stay graded here
    "grouping_sets_orders": _q_grouping_sets_orders,
    "correlations_lineitem": _q_correlations_lineitem,
    # round-4 rotation (second wave) out of the 50-cap (swapped for
    # global_shuffle/mix_corpus/paragraph_dedup): global sort+limit
    # stays graded here and via the TakeOrdered paths inside
    # vocab_topk/tfidf/bm25; plain DISTINCT stays graded here and via
    # dedup_exact_events + set_ops_customers' distinct set semantics;
    # hash-chop batch packing stays graded here and via the richer
    # pack_by_length_documents oracle
    "global_top_orders": _q_global_top_orders,
    "distinct_users_by_type": _q_distinct_users_by_type,
    "pack_batches_orders": _q_pack_batches_orders,
    # no oracle (iterative k-means): rows-only at the gate, exactness
    # graded by the NumPy-differential pytest (tests/test_similarity.py)
    "semantic_dedup_embeddings": _q_semantic_dedup_embeddings,
    # round-5 rotation out of the 50-cap (swapped for stream_join/bm25/
    # split_dataset): BPE-ish subword counting stays graded here and
    # inside quality_documents' token stats; rolling window frames stay
    # graded here and via topk_orders_per_customer's ranked windows +
    # the stream window rows. (skyline_part_dim moved to the extra
    # skyline registry in __spark_entry__.py.)
    "subword_count_documents": _q_subword_count,
    # rolling_stats_events returned to the driver gate (rotation #7)
    # round-6 rotation out of the 50-cap (swapped for equi_depth x2 /
    # dedup_incremental): winnowing fingerprints stay graded here and
    # inside dedup_corpus_documents' fingerprint phase +
    # fingerprint_documents; gaps-and-islands sessionization stays
    # graded here and via the session-window stream extra
    # (stream_session_stats_events) — the batch oracle is identical.
    "winnow_fingerprints_documents": _q_winnow,
    "sessionize_events": _q_sessionize_events,
    # round-7 rotation out of the 50-cap (swapped for cube_orders /
    # rolling_stats_events / dedup_incremental_neardup_documents):
    # the profile family keeps its driver row via
    # column_profile_orders (histogram's bit-exact unrounded edge
    # arithmetic stays graded here); the date/time family keeps
    # scd2_events at the gate (dense-grid resample stays graded here
    # and its sequence/fill machinery also underpins the stream window
    # rows); the sampling family keeps split_dataset_orders at the
    # gate (the shared hash-threshold sampler core stays graded here
    # and via hash_sample_orders).
    "histogram_orders": _q_histogram_orders,
    "resample_events": _q_resample_events,
    "stratified_sample_events": _q_stratified_sample_events,
}


def ext_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def ext_oracle_sql() -> dict[str, str]:
    return {k: v for k, v in _ORACLES.items() if k in _QUERIES}


def ext_extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_EXTRA_QUERIES)


def ext_extra_oracle_sql() -> dict[str, str]:
    return {k: v for k, v in _ORACLES.items() if k in _EXTRA_QUERIES}
