"""Exactly-once foreachBatch file sinks.

``foreachBatch`` gives at-least-once delivery: after a crash between
"sink written" and "checkpoint committed", the next run REPLAYS the
last epoch. The standard fix (Structured Streaming docs) is an
idempotent sink keyed by ``epoch_id`` — this module packages it for
parquet directories:

- each epoch writes to its own ``epoch=N`` directory;
- a replayed epoch is detected by the directory's ``_SUCCESS`` commit
  marker and skipped (or harmlessly overwritten if the previous
  attempt died mid-write — overwrite of a partial directory is safe
  because readers gate on ``_SUCCESS``);
- readers load ``path`` recursively and see each epoch exactly once.

This complements the engine-native parquet streaming sink (which has
its own transaction log): foreachBatch is needed whenever the batch is
TRANSFORMED with logic the sink API can't express (e.g. the two-stage
skyline's global merge), and then exactly-once becomes the sink's job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["write_epoch_idempotent", "epoch_sink"]


def write_epoch_idempotent(batch_df: DataFrame, epoch_id: int, path: str) -> bool:
    """Write one micro-batch to ``path/epoch=<id>``; return False (and
    write nothing) if that epoch already committed — the replay case.
    Partial directories from a crashed attempt lack ``_SUCCESS`` and
    are overwritten.

    The marker check runs on the DRIVER with ``os.path`` — correct for
    local/NFS paths (this environment); for object stores swap the
    existence check for the corresponding filesystem client (the commit
    protocol itself — write-then-``_SUCCESS`` — is identical)."""
    epoch_dir = os.path.join(path, f"epoch={int(epoch_id)}")
    if os.path.exists(os.path.join(epoch_dir, "_SUCCESS")):
        return False
    batch_df.write.mode("overwrite").parquet(epoch_dir)
    return True


def epoch_sink(path: str):
    """A ``foreachBatch`` callable: ``writeStream.foreachBatch(
    epoch_sink(out_dir))`` — every epoch lands exactly once under
    ``out_dir/epoch=N`` regardless of replays."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_epoch_idempotent(batch_df, epoch_id, path)

    return sink
