"""Watermarked stream-stream event-time interval join (SURVEY.md §2.9).

The batch banded join (`operators/rangejoin.py`, the DTW band-constraint
analog `05_dtw_alignment_experiment/dtw_alignment.py:885-928`) matched each
probe row to same-key reference rows inside a trailing time band. This is the
incremental form: two unbounded sources, equi key + event-time interval
predicate, both sides watermarked so Spark can bound the join state — rows
older than (max event time − watermark − band) are provably unmatchable and
their state is dropped. That bounded state is what lets the join run forever
on a cluster; an unwatermarked stream-stream join would grow state without
limit and is refused by Spark in append mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lo_sec: float = 0.0,
    hi_sec: float = 86_400.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: left row ↔ same-key right rows with
    ``left_ts - hi_sec <= right_ts <= left_ts - lo_sec`` (a trailing band).
    Column names must be disjoint apart from ``on``; rename the right ts
    before calling (Spark needs distinct event-time columns to reason about
    the interval)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = None
    for k in on:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    # millisecond-resolution intervals: int(sec) would silently truncate
    # fractional bands (lo=0.5 becoming 0 widens the join window)
    lo = F.expr(f"INTERVAL {int(round(lo_sec * 1000))} MILLISECONDS")
    hi = F.expr(f"INTERVAL {int(round(hi_sec * 1000))} MILLISECONDS")
    band = (F.col(right_ts) >= F.col(left_ts) - hi) & (
        F.col(right_ts) <= F.col(left_ts) - lo
    )
    out = l.join(r, cond & band, "inner")
    # drop the duplicate right-side key columns
    for k in on:
        out = out.drop(r[k])
    return out
