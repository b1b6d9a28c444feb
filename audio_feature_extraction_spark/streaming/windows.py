"""Streaming tumbling/sliding event-time aggregation (SURVEY.md §2.9).

The reference's fixed 25/30 ms frames with a 10 ms hop
(`04_feature_extraction_experiment/feature_extraction.py:35-45`,
`04_…/process_audio.py:103-104`) are batch tumbling/sliding frames; these are
the incremental forms: ``window(ts, size[, slide])`` under a watermark, so
frame aggregates run over an unbounded source with bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_agg(
    stream_df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    size: str = "60 seconds",
    watermark: str = "1 hour",
    agg_value: str | None = None,
) -> DataFrame:
    """Tumbling event-time frame counts (+ value sum) per key, watermarked so
    frames older than max(event time) - watermark finalize and drop state."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if agg_value:
        aggs.append(F.sum(agg_value).alias("sum_value"))
    return (
        stream_df.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), size), *keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("frame_start"),
            F.col("window.end").alias("frame_end"),
            *keys,
            *[c for c in (["n_rows"] + (["sum_value"] if agg_value else []))],
        )
    )


def stream_sliding_agg(
    stream_df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    size: str = "60 seconds",
    slide: str = "30 seconds",
    watermark: str = "1 hour",
    agg_value: str | None = None,
) -> DataFrame:
    """Sliding (overlapping) event-time frames — the 25 ms/10 ms-hop analog."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if agg_value:
        aggs.append(F.sum(agg_value).alias("sum_value"))
    return (
        stream_df.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), size, slide), *keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("frame_start"),
            F.col("window.end").alias("frame_end"),
            *keys,
            *[c for c in (["n_rows"] + (["sum_value"] if agg_value else []))],
        )
    )
