"""Streaming dedup (SURVEY.md §2.9): bounded-state duplicate suppression.

Streaming twin of the batch :func:`operators.dedup.first_per_window`
(one-feature-row-per-utterance-per-pass, the reference's re-run guard
`04_feature_extraction_experiment/feature_extractor.py:698-718`). Two forms:

- :func:`stream_dedup_first` — keep the first-ARRIVING row per
  (keys × tumbling event-time window). State is one row per open
  (key, window); the watermark proves old windows complete and evicts them,
  so state is bounded no matter how long the stream runs.
- :func:`stream_dedup_within_watermark` — Spark's
  ``dropDuplicatesWithinWatermark``: suppress key repeats within the
  watermark delay without window alignment (dedup on exact-key re-delivery,
  e.g. at-least-once sources).

Arrival order vs event order: streaming keeps the first row to ARRIVE;
the batch twin keeps the first by EVENT TIME. They agree exactly when each
key's rows arrive in event-time order (one source partition per key, or a
sorted replay); otherwise the streaming result is one representative per
(key, window) — the parity test asserts both properties.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# every unit Spark's window()/watermark duration parser accepts
_UNIT_MICROS = {
    "microsecond": 1, "microseconds": 1,
    "millisecond": 1_000, "milliseconds": 1_000,
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
    "week": 604_800_000_000, "weeks": 604_800_000_000,
}


def _interval_micros(interval: str) -> int:
    """Parse a '<n> <unit> [<n> <unit> ...]' interval into microseconds,
    covering the same units Spark's duration parser accepts."""
    total = 0
    for num, unit in re.findall(r"(\d+)\s*([a-zA-Z]+)", interval):
        if unit.lower() not in _UNIT_MICROS:
            raise ValueError(f"unsupported interval unit in {interval!r}")
        total += int(num) * _UNIT_MICROS[unit.lower()]
    if total == 0:
        raise ValueError(f"could not parse interval {interval!r}")
    return total


def stream_dedup_first(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str | None = None,
    lateness: str = "30 minutes",
    out: str = "win_start",
) -> DataFrame:
    """First arriving row per (keys × tumbling window); append-mode safe.

    State boundedness: plain ``dropDuplicates`` on a projected window-start
    field NEVER evicts state (``GetStructField`` drops the event-time
    metadata ``StreamingDeduplicateExec`` keys eviction on), and keeping the
    watermarked ``window()`` struct alongside the watermarked ``ts`` is
    rejected ("more than one event time column"). The supported bounded
    form is ``dropDuplicatesWithinWatermark``: state rows are evicted once
    the watermark passes their event time plus the delay, regardless of key
    metadata. The first-per-window guarantee therefore holds when
    ``watermark >= window span + max lateness`` — an evicted (key, window)
    cell could otherwise re-admit a very late duplicate (which the
    watermark would normally drop as late anyway). The DEFAULT watermark is
    therefore derived as ``window + lateness`` so the guarantee holds out
    of the box; pass ``watermark`` explicitly only to override."""
    if watermark is None:
        watermark = (
            f"{_interval_micros(window) + _interval_micros(lateness)}"
            " microseconds"
        )
    win = F.window(F.col(ts), window)
    return (
        stream.withWatermark(ts, watermark)
        .withColumn(out, win.start)
        .dropDuplicatesWithinWatermark([*keys, out])
    )


def stream_dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Suppress exact-key duplicates arriving within the watermark delay."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        keys
    )
