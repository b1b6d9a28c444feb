"""Distribution statistics & normalization (SURVEY.md A7, A9, A10; robust
normalization `05_dtw_alignment_experiment/dtw_alignment.py:388-411`).

All JVM-side: exact interpolated percentiles via ``F.percentile`` in a
grouped aggregate, broadcast-joined back to the fact rows (the per-group
stats table is tiny — one row per group — so the join never shuffles the
fact side at scale). Column expressions only; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1e-8


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    prefix: str = "q",
) -> DataFrame:
    """Per-group exact interpolated quantiles (A7). One row per group."""
    aggs = [
        F.percentile(col, F.lit(q)).alias(f"{prefix}{int(q * 100)}") for q in qs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def robust_normalize(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    out: str = "normalized",
) -> DataFrame:
    """IQR-clip + median-center robust normalization, per group
    (`dtw_alignment.py:388-411`): clip to [p25 - 1.5·IQR, p75 + 1.5·IQR],
    then (x - median) / (IQR + eps). Stats side is broadcast."""
    stats = group_quantiles(df, group_cols, col).select(
        *group_cols,
        F.col("q25"),
        F.col("q50"),
        F.col("q75"),
        (F.col("q75") - F.col("q25")).alias("iqr"),
    )
    j = df.join(F.broadcast(stats), group_cols)
    lo = F.col("q25") - 1.5 * F.col("iqr")
    hi = F.col("q75") + 1.5 * F.col("iqr")
    clipped = F.least(F.greatest(F.col(col), lo), hi)
    return j.withColumn(
        out, (clipped - F.col("q50")) / (F.col("iqr") + F.lit(EPS))
    ).drop("q25", "q50", "q75", "iqr")


def snr_metrics(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    noise_q: float = 0.10,
) -> DataFrame:
    """Derived per-group signal metrics (A9):
    - ``snr_db``   = 20·log10(mean / (p10 + eps))  (04_…/feature_extractor.py:370-374)
    - ``cv``       = std / (mean + eps)
    - ``stability``= 1 - std / (mean(|x|) + eps)   (feature_extraction.py:316-324)
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        (
            20.0
            * F.log(
                10.0,
                F.avg(col)
                / (F.percentile(col, F.lit(noise_q)) + F.lit(EPS)),
            )
        ).alias("snr_db"),
        (F.stddev_samp(col) / (F.avg(col) + F.lit(EPS))).alias("cv"),
        (
            F.lit(1.0)
            - F.stddev_samp(col) / (F.avg(F.abs(F.col(col))) + F.lit(EPS))
        ).alias("stability"),
    )


def histogram_counts(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram (A10, `evaluation/evaluator.py:149-206` analog):
    bucket i covers [lo + i·w, lo + (i+1)·w); values < lo clamp to bucket 0,
    values ≥ hi clamp to the last bucket. Pure groupBy — one shuffle of
    (group, bucket) pairs, partial-aggregated map-side."""
    w = (hi - lo) / nbins
    bucket = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("int"), F.lit(0)
        ),
        F.lit(nbins - 1),
    )
    keys = (group_cols or []) + ["bucket"]
    return (
        df.withColumn("bucket", bucket)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def clip_gate(
    value: Column, is_active: Column, lo: float, hi: float
) -> Column:
    """VAD-gate + clip projection (P4/P7): keep the clipped value on active
    rows, zero elsewhere (`feature_extraction.py:143-183`,
    `04_…/process_audio.py:100-116`)."""
    clipped = F.least(F.greatest(value, F.lit(lo)), F.lit(hi))
    return F.when(is_active, clipped).otherwise(F.lit(0.0))
