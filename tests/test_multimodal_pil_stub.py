"""Execute the ``mode == "pil"`` branches of the four media ops with an
injected PIL-shaped double (r11 verdict ask #2): Pillow is absent in
this sandbox, so without `operators/fakepil.py` these branches would
never run anywhere — the Resampling attribute use, multi-frame
seek/n_frames handling, and the per-row corrupt-payload->NULL guards
would all be unverified. The double travels to the Spark worker
processes as an importable module through the ops' ``_image_module``
seam (a driver-side monkeypatch of ``_pil_image_module`` never reaches
the workers — cloudpickle re-imports module references there).

The real-Pillow tests in test_plans_multimodal.py stay as importorskip
bonuses; these run everywhere.
"""

import hashlib

import pytest

from pyspark_skyline_spark.operators import fakepil
from pyspark_skyline_spark.operators import multimodal as M
from pyspark_skyline_spark.operators.fakepil import fake_image_bytes


def _blobs(spark, payloads):
    return spark.createDataFrame(payloads, "id long, blob binary")


def test_decode_pil_branch_dims_and_corrupt_null(spark):
    df = _blobs(
        spark,
        [
            (1, fake_image_bytes(37, 23)),
            (2, fake_image_bytes(640, 480)),
            (3, b"not an image at all"),
        ],
    )
    got = {
        r.id: (r.width, r.height, r.format)
        for r in M.decode_media_meta(
            df, "id", decode_mode="pil", _image_module=fakepil
        ).collect()
    }
    assert got[1] == (37, 23, "fakeimg")
    assert got[2] == (640, 480, "fakeimg")
    # corrupt payload -> NULL dims row, not a dead task
    assert got[3] == (None, None, "unknown")


def test_decode_strict_succeeds_with_module(spark):
    """strict means 'full pixel decode or raise' — with a decoder
    present it must succeed, not raise."""
    df = _blobs(spark, [(1, fake_image_bytes(8, 4))])
    r = M.decode_media_meta(
        df, "id", decode_mode="strict", _image_module=fakepil
    ).collect()[0]
    assert (r.width, r.height) == (8, 4)


def test_resize_pil_branch_reencodes_and_corrupt_null(spark):
    df = _blobs(
        spark,
        [(1, fake_image_bytes(100, 50)), (2, b"garbage")],
    )
    got = {
        r.id: r
        for r in M.resize_media(
            df, "id", width=8, height=6, decode_mode="strict",
            _image_module=fakepil,
        ).collect()
    }
    # the re-encoded payload is a REAL sniffable PNG at the target dims
    assert M.sniff_image_meta(bytes(got[1].resized))[:2] == (8, 6)
    assert (got[1].width, got[1].height) == (8, 6)
    assert got[2].resized is None  # corrupt -> NULL payload, row kept


def test_embed_pil_branch_unit_range_and_corrupt_null(spark):
    df = _blobs(
        spark,
        [(1, fake_image_bytes(64, 64)), (2, b"\x00\x01garbage")],
    )
    got = {
        r.id: r.embedding
        for r in M.embed_media(
            df, "id", dim=16, decode_mode="strict", _image_module=fakepil
        ).collect()
    }
    assert len(got[1]) == 16
    assert all(0.0 <= v <= 1.0 for v in got[1])
    # deterministic: the double's pixels are a pure function of dims
    again = M.embed_media(
        _blobs(spark, [(1, fake_image_bytes(64, 64))]),
        "id", dim=16, decode_mode="strict", _image_module=fakepil,
    ).collect()[0].embedding
    assert got[1] == again
    assert got[2] is None  # corrupt -> NULL embedding, row kept


def test_sample_frames_pil_branch_multiframe(spark):
    df = _blobs(
        spark,
        [
            (1, fake_image_bytes(10, 10, n_frames=3)),
            (2, fake_image_bytes(10, 10, n_frames=1)),
            (3, b"junk payload"),
        ],
    )
    rows = M.sample_frames(
        df, "id", frame_ms=40, decode_mode="strict", _image_module=fakepil
    ).collect()
    per_id = {}
    for r in rows:
        per_id.setdefault(r.id, []).append(r)
    assert sorted(r.frame_idx for r in per_id[1]) == [0, 1, 2]
    assert sorted(r.ts_ms for r in per_id[1]) == [0, 40, 80]
    # frames carry DISTINCT content checksums (seek actually advanced)
    assert len({r.frame_checksum for r in per_id[1]}) == 3
    assert [r.frame_idx for r in per_id[2]] == [0]
    # corrupt -> exactly one null-frame marker row
    assert [(r.frame_idx, r.ts_ms, r.frame_checksum) for r in per_id[3]] == [
        (None, None, None)
    ]


def test_sample_frames_truncated_animation_single_null_row(spark):
    """A container that decodes frames 0..k-1 then fails at seek(k)
    (truncated animation) must yield ONE null-frame row — never the
    partial frames alongside the marker (review find, round 12; the
    pre-fix code extended the output inside the loop)."""
    df = _blobs(
        spark,
        [
            (1, fake_image_bytes(10, 10, n_frames=5, good_frames=2)),
            (2, fake_image_bytes(10, 10, n_frames=2)),
        ],
    )
    rows = M.sample_frames(
        df, "id", decode_mode="strict", _image_module=fakepil
    ).collect()
    per_id = {}
    for r in rows:
        per_id.setdefault(r.id, []).append(r)
    assert [(r.frame_idx, r.frame_checksum) for r in per_id[1]] == [(None, None)]
    assert sorted(r.frame_idx for r in per_id[2]) == [0, 1]


def test_fakepil_surface_matches_production_expectations():
    """Driver-side sanity of the double itself: the exact attribute
    surface the pil branches touch (Resampling members, context
    manager, convert/resize/save/tobytes/getdata/seek) — so a double
    drift fails HERE, not inside an executor traceback."""
    import io

    im = fakepil.open(io.BytesIO(fake_image_bytes(6, 4, n_frames=2)))
    assert (im.width, im.height, im.n_frames) == (6, 4, 2)
    with im as ctx:
        assert ctx is im
    rgb = im.convert("RGB")
    assert len(rgb.tobytes()) == 6 * 4 * 3
    gray = im.convert("L")
    assert len(gray.getdata()) == 24 and all(
        isinstance(p, int) for p in gray.getdata()
    )
    small = rgb.resize((2, 2), fakepil.Resampling.LANCZOS)
    buf = io.BytesIO()
    small.save(buf, format="PNG")
    assert M.sniff_image_meta(buf.getvalue())[:2] == (2, 2)
    with pytest.raises(ValueError):
        rgb.resize((2, 2), "nearest")  # non-Resampling filter rejected
    im.seek(1)
    with pytest.raises(EOFError):
        im.seek(2)
    # frame content differs across frames (checksum source)
    a = im.convert("RGB").tobytes()
    im.seek(0)
    b = im.convert("RGB").tobytes()
    assert hashlib.md5(a).digest() != hashlib.md5(b).digest()
    with pytest.raises(Exception, match="identify"):
        fakepil.open(io.BytesIO(b"garbage"))
