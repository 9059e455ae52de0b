"""Multimodal-column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
partition-wise decode, partitioning — is real and tested; the actual
media decode is STUBBED (decode libraries are not in this container):
``decode_mode="strict"`` raises NotImplementedError, the default
``"fake"`` derives deterministic pseudo-metadata from the bytes so the
pipeline shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "with_blob",
    "blob_meta",
    "decode_media_meta",
    "sample_frames",
    "resize_media",
    "embed_media",
]


def with_blob(df: DataFrame, src_col: str, out: str = "blob") -> DataFrame:
    """Materialize an opaque binary column (here: UTF-8 bytes of a
    string column; in production: the raw media payload)."""
    return df.withColumn(out, F.col(src_col).cast("binary"))


def blob_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap native metadata: byte length + md5 checksum (JVM-side)."""
    return df.withColumn("n_bytes", F.octet_length(F.col(blob_col))).withColumn(
        "checksum", F.md5(F.col(blob_col))
    )


_DECODE_SCHEMA = "id long, n_bytes long, width int, height int, format string"


def decode_media_meta(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    decode_mode: str = "fake",
) -> DataFrame:
    """Partition-wise media decode via ``mapInPandas`` (Arrow batches —
    the right shape for wrapping PIL/ffmpeg at scale; one Python worker
    per partition, vectorized transfer, no per-row pickling).

    ``fake`` mode synthesizes deterministic width/height/format from the
    payload bytes; ``strict`` raises until a real decoder is wired in.
    """
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"decode_mode {decode_mode!r}")

    sel = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; run with decode_mode='fake'"
                )
            metas = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.sha256(raw).digest()
                metas.append(
                    {
                        "id": int(_id),
                        "n_bytes": len(raw),
                        # deterministic pseudo-decode from content bytes
                        "width": 16 + digest[0] % 240,
                        "height": 16 + digest[1] % 240,
                        "format": ["png", "jpeg", "webp"][digest[2] % 3],
                    }
                )
            yield pd.DataFrame(metas, columns=["id", "n_bytes", "width", "height", "format"])

    return sel.mapInPandas(decode, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = "id long, frame_idx int, ts_ms long, frame_checksum string"


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    frame_ms: int = 40,
    decode_mode: str = "fake",
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (the 1-to-N
    ``mapInPandas`` shape video pipelines need — batch in, multiple
    rows per input out, no ``explode`` of a pre-materialized array).

    ``fake`` mode derives a deterministic frame count from the payload
    (``octet_length % 5 + 1``) and checksums each pseudo-frame as
    ``md5(payload || ':' || frame_idx)`` — simple enough that an ANSI
    SQL oracle reproduces it exactly; ``strict`` raises until a real
    ffmpeg-style demuxer is wired in.
    """
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"decode_mode {decode_mode!r}")

    sel = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "frame sampling requires a video demuxer not present in "
                    "this environment; run with decode_mode='fake'"
                )
            rows = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                n_frames = len(raw) % 5 + 1
                for i in range(n_frames):
                    rows.append(
                        {
                            "id": int(_id),
                            "frame_idx": i,
                            "ts_ms": i * frame_ms,
                            "frame_checksum": hashlib.md5(
                                raw + f":{i}".encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "ts_ms", "frame_checksum"]
            )

    return sel.mapInPandas(sample, schema=_FRAME_SCHEMA)


def resize_media(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    width: int = 224,
    height: int = 224,
    decode_mode: str = "fake",
) -> DataFrame:
    """Resize plumbing: binary in, binary out, target dims in metadata.
    ``fake`` mode passes a deterministic sha256-derived payload of
    bounded size through the real Arrow path; ``strict`` raises until a
    real image library is wired in."""
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"decode_mode {decode_mode!r}")

    sel = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    schema = "id long, width int, height int, resized binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "resize requires an image library not present in this "
                    "environment; run with decode_mode='fake'"
                )
            out = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                out.append(
                    {
                        "id": int(_id),
                        "width": width,
                        "height": height,
                        "resized": hashlib.sha256(raw).digest(),
                    }
                )
            yield pd.DataFrame(out, columns=["id", "width", "height", "resized"])

    return sel.mapInPandas(resize, schema=schema)


def embed_media(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    dim: int = 16,
    decode_mode: str = "fake",
) -> DataFrame:
    """Feature extraction: binary -> ``array<double>`` embedding, ready
    for the similarity operators (``cosine_topk``/``cosine_topk_ivf``).
    ``fake`` mode expands sha256 bytes into a deterministic unit-range
    vector; ``strict`` raises until a real encoder is wired in."""
    if decode_mode not in ("fake", "strict"):
        raise ValueError(f"decode_mode {decode_mode!r}")

    sel = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    schema = "id long, embedding array<double>"

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "strict":
                raise NotImplementedError(
                    "media embedding requires an encoder not present in this "
                    "environment; run with decode_mode='fake'"
                )
            out = []
            for _id, blob in zip(pdf["id"], pdf["blob"]):
                raw = bytes(blob) if blob is not None else b""
                material = hashlib.sha256(raw).digest()
                while len(material) < dim:
                    material += hashlib.sha256(material).digest()
                vec = [b / 255.0 for b in material[:dim]]
                out.append({"id": int(_id), "embedding": vec})
            yield pd.DataFrame(out, columns=["id", "embedding"])

    return sel.mapInPandas(embed, schema=schema)
