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
    # round, not int(): 0.29*100 floats to 28.999… and int() would mislabel
    # the column (and collide q28/q29 into duplicate names)
    aggs = [
        F.percentile(col, F.lit(q)).alias(f"{prefix}{int(round(q * 100))}")
        for q in qs
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
    then (x - median) / (IQR + eps). Stats side is broadcast.

    The stats join is NULL-SAFE (<=>): a plain equi-join would silently drop
    every fact row whose group key is NULL even though groupBy computed a
    NULL-group row for them. NaN inputs stay NaN (np.clip semantics) —
    Spark's least/greatest would otherwise turn NaN into the hi bound."""
    stats = group_quantiles(df, group_cols, col).select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols],
        F.col("q25"),
        F.col("q50"),
        F.col("q75"),
        (F.col("q75") - F.col("q25")).alias("iqr"),
    )
    cond = None
    for c in group_cols:
        e = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
        cond = e if cond is None else cond & e
    j = df.join(F.broadcast(stats), cond).drop(
        *[f"__g_{c}" for c in group_cols]
    )
    lo = F.col("q25") - 1.5 * F.col("iqr")
    hi = F.col("q75") + 1.5 * F.col("iqr")
    v = F.col(col)
    clipped = F.when(
        F.isnan(v.cast("double")), v.cast("double")
    ).otherwise(F.least(F.greatest(v, lo), hi))
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

    std is POPULATION std (stddev_pop): the reference uses ``np.std``
    (ddof=0), and stddev_samp would both inflate every finite group by
    sqrt(n/(n-1)) and return NULL (not 0) for single-row groups.
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
        (F.stddev_pop(col) / (F.avg(col) + F.lit(EPS))).alias("cv"),
        (
            F.lit(1.0)
            - F.stddev_pop(col) / (F.avg(F.abs(F.col(col))) + F.lit(EPS))
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
    values ≥ hi clamp to the last bucket. NULL/NaN rows are EXCLUDED — the
    bucket expression would otherwise count them in bucket 0, because
    Spark's greatest() skips NULL arguments (greatest(NULL, 0) = 0).
    Pure groupBy — one shuffle of (group, bucket) pairs."""
    w = (hi - lo) / nbins
    v = F.col(col)
    bucket = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(w)).cast("int"), F.lit(0)
        ),
        F.lit(nbins - 1),
    )
    keys = (group_cols or []) + ["bucket"]
    return (
        df.where(v.isNotNull() & ~F.isnan(v.cast("double")))
        .withColumn("bucket", bucket)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def clip_gate(
    value: Column, is_active: Column, lo: float, hi: float
) -> Column:
    """VAD-gate + clip projection (P4/P7): keep the clipped value on active
    rows, zero elsewhere (`feature_extraction.py:143-183`,
    `04_…/process_audio.py:100-116`). NaN stays NaN (np.clip semantics) —
    least/greatest would otherwise pin NaN to the hi bound."""
    clipped = F.when(F.isnan(value.cast("double")), value).otherwise(
        F.least(F.greatest(value, F.lit(lo)), F.lit(hi))
    )
    return F.when(is_active, clipped).otherwise(F.lit(0.0))


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Partition-skew diagnostic: the top-k heaviest keys with their share
    of total rows and their hot-factor vs the mean per-key count — the
    report a 100 TB pipeline runs BEFORE picking a shuffle key (a hot key
    with share >> 1/shuffle_partitions means salting or AQE skew-join is
    mandatory; see operators/asof.py's salted strategy).

    Scale shape: one groupBy(key) count (map-side partial), then the
    global totals ride along as a broadcast single-row frame (the
    unigram_surprisal pattern — BroadcastNestedLoopJoin of 1 row, never a
    CartesianProduct), and the top-k filter is a rank<=k window that
    Spark 4 rewrites into a map-side WindowGroupLimit before the final
    single-partition sort — only ~k rows per task reach it. Skew factor is
    computed as cnt * n_keys / total in DOUBLE (both engines evaluate
    left-to-right, IEEE-identical); counts stay exact BIGINT."""
    from pyspark.sql import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "rank",
            key_col,
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_total"), 6).alias(
                "share"
            ),
            F.round(
                F.col("cnt").cast("double")
                * F.col("_nkeys")
                / F.col("_total"),
                6,
            ).alias("hot_factor"),
            F.col("_nkeys").alias("n_keys"),
        )
    )
