"""Range / banded joins (SURVEY.md J5) — the DTW band-constraint analog
(`05_dtw_alignment_experiment/dtw_alignment.py:885-928`): for each left row,
the admissible right candidates are those within a time band around it.

Physical shape: equi-join on the entity keys + band predicate. Catalyst
plans the equi part as a hash/sort-merge join and evaluates the band as a
post-join filter, so the exchange is on the keys only; with AQE the skewed
key splits are handled at runtime. The aggregate collapses the fan-out to
one row per left row, map-side partial first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators.timeutil import ts_micros


def band_join_stats(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lo_sec: float = 0.0,
    hi_sec: float = 3600.0,
    value_col: str | None = None,
) -> DataFrame:
    """Per left row, stats over right rows with the same keys and
    ``left.ts - hi <= right.ts <= left.ts - lo`` (a trailing band; lo=0 makes
    it point-in-time inclusive — zero temporal leakage when lo >= 0).

    Returns all left columns + ``n_in_band`` (+ ``band_max``/``band_sum``
    over ``value_col`` if given). Left rows with no candidates are kept with
    n_in_band = 0 (the missing-partner case, J2 analog).
    """
    lo_us = int(round(lo_sec * 1_000_000))
    hi_us = int(round(hi_sec * 1_000_000))
    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        ts_micros(right_ts).alias("__r_us"),
        *([F.col(value_col).alias("__r_val")] if value_col else []),
    )
    lag = F.col("__l_us") - F.col("__r_us")
    # band predicate lives IN the join condition so left rows whose candidates
    # all miss the band still survive the outer join (n_in_band = 0)
    cond = [F.col(c) == F.col(f"__r_{c}") for c in on] + [
        (lag >= F.lit(lo_us)) & (lag <= F.lit(hi_us))
    ]
    # per-ROW identity for the regroup: grouping on the left columns alone
    # would collapse duplicate left rows into one row with summed stats.
    # The id never reaches the output, so its partition-dependent values
    # can't leak nondeterminism.
    l = left.withColumn("__l_us", ts_micros(left_ts)).withColumn(
        "__l_rid", F.monotonically_increasing_id()
    )
    j = l.join(r, cond, "left_outer")
    aggs = [F.count("__r_us").alias("n_in_band")]
    if value_col:
        aggs += [
            F.max("__r_val").alias("band_max"),
            F.sum("__r_val").alias("band_sum"),
        ]
    out = (
        j.groupBy(F.col("__l_rid"), *[F.col(c) for c in left.columns])
        .agg(*aggs)
        .drop("__l_rid")
    )
    return out
