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

__all__ = ["with_blob", "blob_meta", "decode_media_meta"]


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
