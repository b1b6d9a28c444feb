"""Structured Streaming variants of the batch windowed operators.

The reference is pure batch, but its VAD segment-merge carries streaming
session semantics (SURVEY.md §2.9): consecutive speech frames merge while the
gap ≤ threshold. Batch form: ``operators.sessionize``. Streaming form (here):
``session_window`` with a watermark for late data, so the same gap semantics
run incrementally over an unbounded source.

Semantics parity note: ``session_window(ts, gap)`` closes a session when the
next event arrives **≥ gap** after the previous one, while the batch operator
opens a new session when the gap is **> gap** — they differ only on
gap == threshold exactly (measure-zero for microsecond event time; the parity
test uses data with no exact-threshold gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    stream_df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    gap_sec: float = 30.0,
    watermark: str = "1 hour",
    agg_value: str | None = None,
) -> DataFrame:
    """Incremental gap-based sessionization with late-data tolerance.

    Returns one row per closed session: keys + session_start/session_end
    (event-time bounds of observed rows) + n_rows (+ sum_value if
    ``agg_value``). State is bounded by the watermark: sessions older than
    max(event time) - watermark are finalized and their state dropped —
    that is what makes this run forever at cluster scale.
    """
    gap = f"{gap_sec} seconds"
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if agg_value:
        aggs.append(F.sum(agg_value).alias("sum_value"))
    return (
        stream_df.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap), *keys)
        .agg(*aggs)
        .drop("session_window")
    )


def run_available_now(
    stream_out: DataFrame,
    checkpoint_dir: str,
    query_name: str = "sessions",
    output_mode: str = "complete",
) -> DataFrame:
    """Drain all currently-available input through the streaming plan into an
    in-memory table and return it as a batch DataFrame (test/backfill mode —
    production would writeStream to the checkpointed sink instead).

    ``output_mode`` must match the plan: aggregating plans drain in
    "complete" (note: complete mode also emits sessions the watermark has
    NOT yet closed — they reappear, grown, on the next drain); append-only
    plans (``stream_dedup_first``, ``stream_interval_join``) require
    "append" and emit only watermark-finalized rows."""
    q = (
        stream_out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_out.sparkSession.table(query_name)
