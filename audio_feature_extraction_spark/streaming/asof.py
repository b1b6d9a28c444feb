"""Streaming point-in-time enrichment (the online feature-store pattern).

The batch engine's as-of join answers "which reference row was current at
this event's timestamp"; the streaming form answers it continuously as
events arrive. Spark's built-in stream-stream interval join
(`streaming/joins.py`) covers the bounded-lag case; THIS module covers the
classic serving shape — a live event stream enriched against a bounded
point-in-time reference dimension (model-feature snapshots, slowly-changing
dims) — by running the broadcast-Arrow as-of kernel inside the streaming
micro-batch plan. `mapInPandas` is fully streaming-compatible: the kernel
is stateless per batch (all state is the broadcast reference), so the plan
needs no watermark and works in append mode.

Scale shape: identical to the batch `broadcast_arrow` strategy — the
reference is collected once (guarded), broadcast as per-key sorted numpy
arrays, and each micro-batch matches with vectorized searchsorted. No
shuffle of the stream, no streaming state store.

Semantics are EXACTLY the batch as-of (same kernel): NULL keys match the
NULL-key reference history, NULL event-ts rows never match, a partner row
with NULL payload yields NULL, tolerance is exact int64 µs — the parity
test drains availableNow and compares against the batch strategy row for
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_asof_enrich(
    stream: DataFrame,
    reference: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    tolerance_sec: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Enrich a streaming DataFrame with the as-of-current reference row
    per (key, event-time). ``reference`` must be a bounded (batch)
    DataFrame — the point-in-time dimension snapshot; re-create the query
    to pick up a new snapshot (the standard stream-static pattern)."""
    from audio_feature_extraction_spark.operators.asof import (
        _broadcast_arrow_asof,
    )

    assert stream.isStreaming, "stream must be a streaming DataFrame"
    assert not reference.isStreaming, "reference must be bounded (static)"
    # the kernel treats anything != 'backward' as forward — reject e.g.
    # 'nearest' (batch-only) loudly instead of silently computing forward
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"stream_asof_enrich supports direction 'backward'/'forward', "
            f"got {direction!r} (use the batch asof_join for 'nearest')"
        )
    right_ts = right_ts or left_ts
    right_payload = [
        c for c in reference.columns if c not in set(on) | {right_ts}
    ]
    return _broadcast_arrow_asof(
        stream, reference, on, left_ts, right_ts, right_payload,
        tolerance_sec, direction,
    )
