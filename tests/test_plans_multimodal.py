"""Plan audits (pushdown/broadcast/pruning hold at any scale) +
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators import multimodal as M
from pyspark_skyline_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    formatted_plan,
    scan_read_schema,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    assert_pushed_filters(q, "GreaterThan(l_quantity,40.0")


def test_column_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    schema_line = scan_read_schema(q, "lineitem")
    assert "l_extendedprice" not in schema_line
    assert "l_orderkey" in schema_line


def test_join_skyline_uses_broadcast(spark, sf_dir):
    from pyspark_skyline_spark.entry_ext import _q_join_skyline_customer_nation

    assert_broadcast_join(_q_join_skyline_customer_nation(spark, sf_dir))


def test_skyline_plan_has_no_python_udf_before_grouping(spark, sf_dir):
    """Partition keying must be native expressions: the only Python
    stages allowed are the applyInPandas kernels (FlatMapGroupsInPandas),
    never row-wise BatchEvalPython (the reference's bottleneck)."""
    from pyspark_skyline_spark import skyline

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for algo in ("MR_DIM", "MR_GRID", "MR_ANGLE"):
        plan = formatted_plan(
            skyline(li, [("l_extendedprice", "min"), ("l_quantity", "max")], algo=algo)
        )
        assert "BatchEvalPython" not in plan, plan
        assert "FlatMapGroupsInPandas" in plan


def test_multimodal_decode_fake(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = M.decode_media_meta(M.with_blob(docs, "text"), "doc_id").collect()
    assert len(out) == 10
    for r in out:
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert r.format in ("png", "jpeg", "webp")
        assert r.n_bytes > 0


def _pillow_installed() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pillow_installed(),
    reason="strict mode SUCCEEDS when Pillow is importable — the raise "
    "contract is only reachable without it (review find, round 12)",
)
def test_multimodal_decode_strict_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        M.decode_media_meta(M.with_blob(docs, "text"), "doc_id", decode_mode="strict").collect()


def test_multimodal_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    a = sorted(tuple(r) for r in M.decode_media_meta(M.with_blob(docs, "text"), "doc_id").collect())
    b = sorted(tuple(r) for r in M.decode_media_meta(M.with_blob(docs, "text"), "doc_id").collect())
    assert a == b


def test_sample_frames_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "xy"), (3, "")], "id long, text string"
    )
    from pyspark_skyline_spark.operators import multimodal as M

    blobs = M.with_blob(df, "text")
    a = sorted((r.id, r.frame_idx, r.ts_ms, r.frame_checksum)
               for r in M.sample_frames(blobs, "id").collect())
    b = sorted((r.id, r.frame_idx, r.ts_ms, r.frame_checksum)
               for r in M.sample_frames(blobs, "id").collect())
    assert a == b
    per_id = {}
    for t in a:
        per_id.setdefault(t[0], []).append(t)
    # fake rule: octet_length % 5 + 1 frames, 40ms apart
    assert len(per_id[1]) == 4 % 5 + 1
    assert len(per_id[2]) == 2 % 5 + 1
    assert len(per_id[3]) == 0 % 5 + 1
    assert [t[2] for t in per_id[1]] == [0, 40, 80, 120, 160][: len(per_id[1])]


@pytest.mark.skipif(
    _pillow_installed(),
    reason="strict mode SUCCEEDS when Pillow is importable — the raise "
    "contract is only reachable without it (review find, round 12)",
)
def test_resize_and_embed_strict_raise(spark):
    from pyspark_skyline_spark.operators import multimodal as M

    df = M.with_blob(
        spark.createDataFrame([(1, "abc")], "id long, text string"), "text"
    )
    import pytest as _pt

    with _pt.raises(Exception, match="NotImplementedError|image library|encoder"):
        M.resize_media(df, "id", decode_mode="strict").collect()
    with _pt.raises(Exception, match="NotImplementedError|image library|encoder"):
        M.embed_media(df, "id", decode_mode="strict").collect()


def _png_bytes(width, height, rgb=(200, 10, 10)):
    """A real, spec-valid PNG built from the stdlib (zlib CRCs +
    deflate IDAT): 8-bit RGB, one filter-0 scanline per row."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_header_bytes(width, height):
    """A real JPEG prefix: SOI, an APP0/JFIF segment, then a baseline
    SOF0 frame header carrying the dimensions (the bytes every JPEG
    dimension sniffer — including PIL's — reads them from)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", height, width
    ) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_decode_media_meta_headers_mode_real_formats(spark):
    """REAL container-header decode (r10 verdict ask #5): a spec-valid
    generated PNG, a JPEG SOF0 prefix, GIF/BMP/WEBP headers, and a
    garbage payload — width/height/format come from the actual format
    headers, unknown bytes yield NULL dims + 'unknown' instead of
    killing the batch."""
    import struct

    payloads = [
        (1, _png_bytes(37, 23)),
        (2, _jpeg_header_bytes(640, 480)),
        (3, b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 6),
        (4, b"BM" + b"\x00" * 16 + struct.pack("<ii", 99, -77) + b"\x00" * 4),
        # WEBP VP8L: 14-bit packed (w-1, h-1)
        (
            5,
            b"RIFF\x00\x00\x00\x00WEBPVP8L\x00\x00\x00\x00\x2f"
            + int((50 - 1) | ((20 - 1) << 14)).to_bytes(4, "little"),
        ),
        (6, b"not an image at all"),
    ]
    df = spark.createDataFrame(payloads, "id long, blob binary")
    got = {
        r.id: (r.width, r.height, r.format, r.n_bytes)
        for r in M.decode_media_meta(df, "id", decode_mode="headers").collect()
    }
    assert got[1][:3] == (37, 23, "png")
    assert got[2][:3] == (640, 480, "jpeg")
    assert got[3][:3] == (12, 34, "gif")
    assert got[4][:3] == (99, 77, "bmp")  # negative height = top-down
    assert got[5][:3] == (50, 20, "webp")
    assert got[6][:3] == (None, None, "unknown")
    assert all(got[i][3] == len(p) for i, p in payloads)


def test_sniff_image_meta_jpeg_fill_bytes(spark):
    """Optional 0xFF fill bytes before a JPEG marker are legal (ISO
    10918-1 B.1.1.2); the sniffer must skip them, not misparse the
    segment length from shifted bytes (review find)."""
    import struct

    base = _jpeg_header_bytes(320, 200)
    # inject two fill bytes before the SOF0 marker
    sof_at = base.index(b"\xff\xc0")
    padded = base[:sof_at] + b"\xff\xff" + base[sof_at:]
    assert M.sniff_image_meta(padded) == (320, 200, "jpeg")
    assert M.sniff_image_meta(base) == (320, 200, "jpeg")


def test_decode_media_meta_auto_mode_decodes_generated_png(spark):
    """auto mode performs a REAL decode of a generated PNG blob in any
    environment: full Pillow decode when installed, the stdlib header
    parse otherwise — either way the true dimensions come out (never
    the fake mode's hash-derived pseudo-dims)."""
    df = spark.createDataFrame(
        [(1, _png_bytes(37, 23))], "id long, blob binary"
    )
    r = M.decode_media_meta(df, "id", decode_mode="auto").collect()[0]
    assert (r.width, r.height, r.format) == (37, 23, "png")


def test_decode_media_meta_pil_mode_full_decode(spark):
    """Full-pixel decode path (skipped where Pillow is absent): PIL
    verifies the payload, and a truncated JPEG prefix that the header
    sniffer accepts is still dimensioned from the same SOF bytes."""
    pytest.importorskip("PIL")
    df = spark.createDataFrame(
        [(1, _png_bytes(37, 23))], "id long, blob binary"
    )
    r = M.decode_media_meta(df, "id", decode_mode="pil").collect()[0]
    assert (r.width, r.height, r.format) == (37, 23, "png")
    rs = M.resize_media(df, "id", width=8, height=6, decode_mode="strict").collect()[0]
    assert M.sniff_image_meta(bytes(rs.resized))[:2] == (8, 6)


def test_decode_media_meta_pil_mode_raises_without_pillow(spark):
    """decode_mode='pil' is the explicit Pillow contract: absent the
    library it raises instead of degrading (auto is the degrading
    mode). Skipped where Pillow IS installed."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — the raise path is unreachable")
    except ImportError:
        pass
    df = spark.createDataFrame([(1, b"x")], "id long, blob binary")
    with pytest.raises(Exception, match="ImportError|Pillow"):
        M.decode_media_meta(df, "id", decode_mode="pil").collect()


def test_embed_media_feeds_similarity(spark):
    from pyspark_skyline_spark.operators import multimodal as M
    from pyspark_skyline_spark.operators import similarity as S

    texts = [(i, f"document number {i} with content {i*7}") for i in range(20)]
    df = M.with_blob(spark.createDataFrame(texts, "id long, text string"), "text")
    emb = M.embed_media(df, "id", dim=16)
    assert emb.schema["embedding"].dataType.simpleString() == "array<double>"
    top = S.cosine_topk(emb, "id", "embedding", probe_id=0, k=5, impl="arrow").collect()
    assert len(top) == 5 and all(r.id != 0 for r in top)


def test_text_dedup_pipelines_stay_jvm_side(spark, sf_dir):
    """minhash/ngram/simhash hot paths are pure SQL expressions — a
    Python stage anywhere in those plans is a regression."""
    from pyspark_skyline_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for q in (
        D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=4),
        D.ngram_jaccard_pairs(docs, "doc_id", "text"),
        D.simhash(docs, "doc_id", "text"),
    ):
        plan = formatted_plan(q)
        assert "BatchEvalPython" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan


def test_ngram_computes_sketch_table_once(spark, sf_dir):
    """The prefix branch and both verify branches consume ONE
    materialized sketch table: the shingle->md5->dfreq->collect_list
    pipeline must appear at most once in the executed plan (Spark's
    exchange reuse does NOT fire across these branches — without the
    materialization the whole pipeline ran three times)."""
    from pyspark_skyline_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = D.ngram_jaccard_pairs(docs, "doc_id", "text")
    q.count()  # force the lazy localCheckpoint
    plan = formatted_plan(q)
    assert plan.count("collect_list") == 0, plan
    assert plan.count("md5") == 0, plan


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """The bin-bucketed range join must plan as a hash equi-join on the
    bin id; a BroadcastNestedLoopJoin means the binning regressed to a
    quadratic theta join."""
    from pyspark_skyline_spark.entry_ext import _QUERIES

    plan = formatted_plan(_QUERIES["range_join_error_click_events"](spark, sf_dir))
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_multi_join_revenue_plan_broadcasts_dimension_chain(spark, sf_dir):
    # the supplier->nation->region chain must broadcast (no SortMergeJoin,
    # no shuffle of the fact table for the join) and stay fully JVM-side
    from pyspark_skyline_spark.entry_ext import ext_queries

    df = ext_queries()["multi_join_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_plan_fingerprint_stable_and_strategy_sensitive(spark, sf_dir):
    """The round-8 drift detector (plans/fingerprint.py) must be
    INVARIANT to run-varying identifiers — two independent builds of
    the same logical query allocate fresh expression ids but must hash
    equal — and SENSITIVE to physical strategy: forcing the broadcast
    side of a join to shuffle must change the fingerprint, and the
    shape facts in plan_summary must say why (that's what makes a
    PLANS_r{N}.json diff readable)."""
    from pyspark_skyline_spark.plans.fingerprint import (
        plan_fingerprint,
        plan_summary,
    )

    def q(mode):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
        nat = F.broadcast(nat) if mode == "broadcast" else nat.hint(mode)
        return (
            cust.join(nat, cust.c_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .count()
        )

    fp_a, fp_b = plan_fingerprint(q("broadcast")), plan_fingerprint(q("broadcast"))
    assert fp_a == fp_b  # fresh exprIds normalized away
    no_bc = q("shuffle_hash")
    assert plan_fingerprint(no_bc) != fp_a
    s_bc, s_sh = plan_summary(q("broadcast")), plan_summary(no_bc)
    assert s_bc["broadcast_joins"] >= 1
    assert s_sh["broadcast_joins"] == 0
    assert s_sh["exchanges"] > s_bc["exchanges"]
