"""A deterministic ``PIL.Image``-shaped test double.

The sandbox has no Pillow, so the ``mode == "pil"`` branches in
`multimodal.py` (decode / resize / embed / sample_frames) would
otherwise never execute anywhere — any latent defect in them (the
Pillow>=9.1-only ``Resampling`` attribute, multi-frame ``seek`` /
``n_frames`` handling, the per-row failure->NULL guards) would be
invisible to the suite (r11 verdict ask #2). This module stands in for
``PIL.Image`` with the exact surface those branches touch, backed by a
tiny explicit container format, so the branches run deterministically
in-sandbox; the real-Pillow tests remain as ``importorskip`` bonuses.

It must be an IMPORTABLE module (not a test-local monkeypatch): the
branches execute inside mapInPandas closures on Spark's Python WORKER
processes, where cloudpickle resolves module-level references by
re-import — a driver-side monkeypatch of
``multimodal._pil_image_module`` never reaches them. Injection instead
travels through the ops' ``_image_module`` parameter: a module object
pickles by reference, so the workers import this file and get the same
double.

Container format (``fake_image_bytes`` builds it)::

    b"FAKEIMG" u16be(width) u16be(height) u8(n_frames) u8(good_frames)

``good_frames < n_frames`` models a TRUNCATED animation: ``seek(i)``
raises for ``i >= good_frames`` after the header advertised more —
the real-world shape behind the one-null-row-per-corrupt-payload
contract. Any other payload raises ``UnidentifiedImageError`` from
``open`` exactly as Pillow does for garbage bytes.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["open", "Resampling", "UnidentifiedImageError", "fake_image_bytes"]

_MAGIC = b"FAKEIMG"


class UnidentifiedImageError(OSError):
    pass


class _Resampling:
    """Stands in for ``PIL.Image.Resampling`` (Pillow >= 9.1): the
    production code accesses ``image_mod.Resampling.LANCZOS`` /
    ``.BILINEAR`` — an AttributeError here is exactly the class of
    defect this double exists to surface."""

    LANCZOS = "lanczos"
    BILINEAR = "bilinear"


Resampling = _Resampling


def fake_image_bytes(
    width: int, height: int, n_frames: int = 1, good_frames: int | None = None
) -> bytes:
    if good_frames is None:
        good_frames = n_frames
    return _MAGIC + struct.pack(
        ">HHBB", width, height, n_frames, good_frames
    )


class _FakeImage:
    def __init__(self, width, height, n_frames, good_frames, mode="RGB"):
        self.width = int(width)
        self.height = int(height)
        self.n_frames = int(n_frames)
        self._good_frames = int(good_frames)
        self._frame = 0
        self.mode = mode
        self.format = "FAKEIMG"

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def seek(self, frame: int) -> None:
        # Pillow raises EOFError past the last frame; a truncated
        # container raises mid-iteration AFTER n_frames advertised more
        if frame >= self._good_frames:
            raise EOFError(f"cannot seek to frame {frame}")
        self._frame = frame

    def convert(self, mode: str) -> _FakeImage:
        out = _FakeImage(
            self.width, self.height, self.n_frames, self._good_frames, mode
        )
        out._frame = self._frame
        return out

    def resize(self, size, resample=None) -> _FakeImage:
        if resample not in (Resampling.LANCZOS, Resampling.BILINEAR):
            raise ValueError(f"unknown resample filter {resample!r}")
        w, h = size
        return _FakeImage(w, h, 1, 1, self.mode)

    def tobytes(self) -> bytes:
        # deterministic pseudo-pixels: a digest of (dims, frame, mode)
        # repeated to the pixel-buffer size
        bpp = 1 if self.mode == "L" else 3
        need = self.width * self.height * bpp
        seed = hashlib.sha256(
            f"{self.width}x{self.height}:{self._frame}:{self.mode}".encode()
        ).digest()
        return (seed * (need // len(seed) + 1))[:need]

    def getdata(self):
        if self.mode == "L":
            return list(self.tobytes())
        raw = self.tobytes()
        return [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]

    def save(self, fp, format="PNG") -> None:
        if format != "PNG":
            raise ValueError(f"fake encoder only writes PNG, got {format!r}")
        # a REAL sniffable PNG prefix (signature + IHDR) so downstream
        # header parses of the re-encoded payload see the true dims
        ihdr = struct.pack(">IIBBBBB", self.width, self.height, 8, 2, 0, 0, 0)
        fp.write(
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + b"\x00" * 4  # CRC not validated by header sniffers
        )


def open(fp) -> _FakeImage:  # noqa: A001 - mirrors PIL.Image.open
    raw = fp.read()
    if raw[: len(_MAGIC)] != _MAGIC or len(raw) < len(_MAGIC) + 6:
        raise UnidentifiedImageError("cannot identify image file")
    w, h, n_frames, good = struct.unpack(
        ">HHBB", raw[len(_MAGIC) : len(_MAGIC) + 6]
    )
    if n_frames < 1 or good < 1:
        raise UnidentifiedImageError("corrupt frame table")
    return _FakeImage(w, h, n_frames, good)
