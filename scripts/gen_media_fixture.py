"""Generate `fixtures/media_blobs.parquet`: genuine image-container
payloads with their TRUE (width, height, format) recorded alongside at
generation time (r11 verdict ask #5).

This upgrades the real header decode from pytest-graded to
driver-gate-graded: the `multimodal_decode_real_documents` row runs
``decode_media_meta(decode_mode="headers")`` over these blobs, while
the DuckDB oracle is a plain SELECT of the stored truth columns — the
truth was written HERE, independent of the sniffer, so a sniffer
regression hash-mismatches at the gate instead of hiding behind a
round-tripped formula.

Payload mix (seeded, deterministic; dims kept inside each format's
encodable range): spec-valid PNGs (zlib CRCs + deflate IDAT), real
JPEG SOI/APP0/SOF0 marker streams (some with legal 0xFF fill padding),
GIF89a logical screen descriptors, BMP BITMAPINFOHEADERs (some with
negative = top-down heights), WEBP VP8L bitstream headers, and
garbage/truncated payloads whose truth is (NULL, NULL, 'unknown').

Run from the repo root: ``python scripts/gen_media_fixture.py``.
Idempotent — same seed, same bytes, same file.
"""

from __future__ import annotations

import os
import random
import struct
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "media_blobs.parquet")


def png_bytes(width: int, height: int, rng: random.Random) -> bytes:
    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    rgb = bytes(rng.randrange(256) for _ in range(3))
    raw = b"".join(b"\x00" + rgb * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int, pad_fill: bool) -> bytes:
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + b"\x00\x48\x00\x48\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    # legal optional 0xFF fill bytes before a marker (ISO 10918-1
    # B.1.1.2) on some rows — the sniffer regression the r11 review
    # caught must stay covered by the gate fixture
    fill = b"\xff\xff" if pad_fill else b""
    return b"\xff\xd8" + app0 + fill + sof0


def gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\xf7\x00\x00"


def bmp_bytes(width: int, height: int, top_down: bool) -> bytes:
    # spec-consistent sizes: 14-byte file header + 40-byte
    # BITMAPINFOHEADER (+ the trailing reserved zeros we emit), with
    # bfSize/bfOffBits matching the actual byte count — a hardened
    # sniffer that validates the declared sizes must still accept
    # these (review find, round 12: declared != actual is exactly the
    # drift that would flip the gate row on a correct sniffer change)
    h = -height if top_down else height
    dib = struct.pack("<IiiHH", 40, width, h, 1, 24) + b"\x00" * 24
    total = 14 + len(dib)
    return b"BM" + struct.pack("<IHHI", total, 0, 0, total) + dib


def webp_vp8l_bytes(width: int, height: int) -> bytes:
    bits = (width - 1) | ((height - 1) << 14)
    payload = b"\x2f" + bits.to_bytes(4, "little") + b"\x00\x00\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff_size = 4 + len(chunk)  # "WEBP" + the VP8L chunk
    return b"RIFF" + struct.pack("<I", riff_size) + b"WEBP" + chunk


def main() -> None:
    rng = random.Random(20260816)
    rows: list[tuple[int, bytes, int | None, int | None, str]] = []
    for i in range(600):
        kind = i % 8
        if kind in (0, 1):  # PNG gets double weight (the common case)
            w, h = rng.randint(1, 512), rng.randint(1, 512)
            rows.append((i, png_bytes(w, h, rng), w, h, "png"))
        elif kind == 2:
            w, h = rng.randint(1, 4096), rng.randint(1, 4096)
            rows.append((i, jpeg_bytes(w, h, pad_fill=i % 16 == 2), w, h, "jpeg"))
        elif kind == 3:
            w, h = rng.randint(1, 65535), rng.randint(1, 65535)
            rows.append((i, gif_bytes(w, h), w, h, "gif"))
        elif kind == 4:
            w, h = rng.randint(1, 10000), rng.randint(1, 10000)
            rows.append((i, bmp_bytes(w, h, top_down=i % 16 == 4), w, h, "bmp"))
        elif kind == 5:
            w, h = rng.randint(1, 16384), rng.randint(1, 16384)
            rows.append((i, webp_vp8l_bytes(w, h), w, h, "webp"))
        elif kind == 6:  # garbage: no known signature
            raw = bytes(rng.randrange(256) for _ in range(rng.randint(0, 64)))
            if raw[:1] in (b"\x89", b"G", b"B", b"\xff", b"R"):
                raw = b"\x00" + raw  # keep it signature-free
            rows.append((i, raw, None, None, "unknown"))
        else:  # truncated real container: signature present, header cut
            full = png_bytes(64, 64, rng)
            rows.append((i, full[: rng.randint(0, 15)], None, None, "unknown"))
    table = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "blob": pa.array([r[1] for r in rows], pa.binary()),
            "true_width": pa.array([r[2] for r in rows], pa.int32()),
            "true_height": pa.array([r[3] for r in rows], pa.int32()),
            "true_format": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    n_by_fmt: dict[str, int] = {}
    for r in rows:
        n_by_fmt[r[4]] = n_by_fmt.get(r[4], 0) + 1
    print(f"wrote {OUT}: {len(rows)} rows, {n_by_fmt}")


if __name__ == "__main__":
    sys.exit(main())
