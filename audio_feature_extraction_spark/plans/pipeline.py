"""Flagship end-to-end feature pipeline (SURVEY.md §7.2).

For every row of the input sequences table:
  sessionize by 30 s event-time gaps per doc_id, LOCF-backfill missing values,
  compute lag-1 delta + causal width-9 regression delta + trailing rolling
  stats + running token totals, as-of join each row to the latest preceding
  reference event for its (source, doc_id) within 300 s, and emit
  (doc_id, seq, ts, session_id, feature_vector array<double>, tokens).

Must match ``oracle.oracle_features`` (np.allclose on feature_vector,
bit-identical int32 tokens) — see tests/test_pipeline_oracle.py.

Physical shape: ONE hash exchange on doc_id feeds every window expression
(they share the same Window spec), plus the as-of union-window exchange on
(source, doc_id). No pandas UDF anywhere — the whole plan is JVM window exec +
projections, whole-stage-codegen eligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audio_feature_extraction_spark.oracle import (
    ASOF_TOL_SEC,
    GAP_SEC,
    ROLL_WINDOW,
)
from audio_feature_extraction_spark.operators import windows as W
from audio_feature_extraction_spark.operators.asof import asof_join
from audio_feature_extraction_spark.operators.backfill import locf
from audio_feature_extraction_spark.operators.sessionize import with_session_id
from audio_feature_extraction_spark.operators.timeutil import ts_micros


def feature_pipeline(
    seq: DataFrame,
    ref: DataFrame,
    asof_strategy: str = "window",
    gap_sec: float = GAP_SEC,
    tol_sec: float = ASOF_TOL_SEC,
) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy("ts", "seq")

    # point-in-time backfill + windowed features (one Window exchange)
    df = seq.withColumn("v_filled", locf("value", w, default=0.0))
    df = df.withColumn("delta1", W.delta1("v_filled", w))
    df = df.withColumn("delta9", W.delta_trailing("v_filled", w, half=4))
    df = df.withColumn("roll_mean", W.rolling_mean("v_filled", w, ROLL_WINDOW))
    df = df.withColumn("roll_std", W.rolling_std_pop("v_filled", w, ROLL_WINDOW))
    df = df.withColumn("cum_tokens", W.running_sum(F.col("n_tok").cast("long"), w))
    df = with_session_id(df, keys=["doc_id"], ts="ts", order=["ts", "seq"], gap_sec=gap_sec)

    # point-in-time reference lookup (backward as-of, tolerance-bounded)
    matched = asof_join(
        df,
        ref,
        on=["source", "doc_id"],
        left_ts="ts",
        tolerance_sec=tol_sec,
        direction="backward",
        strategy=asof_strategy,
    )

    # exact µs subtraction first, one double division after (oracle parity)
    lag_sec = (
        (ts_micros("ts") - ts_micros("matched_ts")).cast("double") / 1e6
    )
    out = matched.select(
        "doc_id",
        "seq",
        "ts",
        "session_id",
        F.array(
            F.col("v_filled"),
            F.col("delta1"),
            F.col("delta9"),
            F.col("roll_mean"),
            F.col("roll_std"),
            F.col("session_id").cast("double"),
            F.col("n_tok").cast("double"),
            F.col("cum_tokens").cast("double"),
            F.coalesce(F.element_at("ref_vec", 1), F.lit(0.0)),
            F.coalesce(lag_sec, F.lit(-1.0)),
        ).alias("feature_vector"),
        "tokens",
    )
    return out
