"""Streaming query observability (ops surface; the reference offers
nothing here — its only signal is Kafka consumer lag).

``query_metrics`` condenses a StreamingQuery's ``recentProgress`` into
the numbers an operator actually watches: throughput, batch latency,
and state-store size/growth. State growth is THE production signal for
watermark bugs — a stream whose ``state_rows`` climbs monotonically is
buffering forever (missing watermark, wrong event-time column) and
will OOM at scale long before any correctness test notices.
"""

from __future__ import annotations

__all__ = ["query_metrics"]


def query_metrics(query) -> dict:
    """Summarize a StreamingQuery's recent progress.

    Returns ``{n_batches, input_rows, rows_per_sec, avg_batch_ms,
    max_batch_ms, state_rows, state_bytes, state_growth_rows}`` where
    ``state_*`` aggregates over all stateful operators of the LAST
    batch and ``state_growth_rows`` is last-batch minus first-batch
    state rows across the retained progress window (positive and
    climbing ⇒ suspect unbounded state). Works on finished queries
    (``availableNow`` replays) as well as live ones.
    """
    progress = [p for p in (query.recentProgress or []) if p is not None]
    if not progress:
        return {
            "n_batches": 0, "input_rows": 0, "rows_per_sec": 0.0,
            "avg_batch_ms": 0.0, "max_batch_ms": 0, "state_rows": 0,
            "state_bytes": 0, "state_growth_rows": 0,
        }

    def state_rows(p) -> tuple[int, int]:
        ops = p.get("stateOperators") or []
        return (
            sum(int(o.get("numRowsTotal", 0)) for o in ops),
            sum(int(o.get("memoryUsedBytes", 0)) for o in ops),
        )

    input_rows = sum(int(p.get("numInputRows", 0)) for p in progress)
    durations = [
        int((p.get("durationMs") or {}).get("triggerExecution", 0)) for p in progress
    ]
    total_ms = sum(durations)
    last_rows, last_bytes = state_rows(progress[-1])
    first_rows, _ = state_rows(progress[0])
    return {
        "n_batches": len(progress),
        "input_rows": input_rows,
        "rows_per_sec": round(input_rows / (total_ms / 1000.0), 3) if total_ms else 0.0,
        "avg_batch_ms": round(total_ms / len(progress), 1),
        "max_batch_ms": max(durations) if durations else 0,
        "state_rows": last_rows,
        "state_bytes": last_bytes,
        "state_growth_rows": last_rows - first_rows,
    }
