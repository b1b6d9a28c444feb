"""Flagship end-to-end feature pipeline (SURVEY.md §7.2).

For every row of the input sequences table:
  sessionize by 30 s event-time gaps per doc_id, LOCF-backfill missing values,
  compute lag-1 delta + causal width-9 regression delta + trailing rolling
  stats + running token totals, as-of join each row to the latest preceding
  reference event for its (source, doc_id) within 300 s, and emit
  (doc_id, seq, ts, session_id, feature_vector array<double>, tokens).

Must match ``oracle.oracle_features`` (np.allclose on feature_vector,
bit-identical int32 tokens) — see tests/test_pipeline_oracle.py.

Physical shape: ONE hash exchange total. The as-of runs first with its union
clustered on hash(doc_id) — a strict subset of the as-of window keys
(source, doc_id), which still satisfies the window's ClusteredDistribution —
and every subsequent feature window partitions by doc_id, so Spark reuses the
same partitioning and plans sort-only for the rest of the pipeline. The fat
token rows cross the wire exactly once. No pandas UDF anywhere — the whole
plan is JVM window exec + projections, whole-stage-codegen eligible.
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
    # point-in-time reference lookup first (backward as-of, tolerance-bounded),
    # with the union clustered on doc_id alone — the one exchange of the run;
    # every window below reuses hash(doc_id) and plans sort-only
    matched = asof_join(
        seq,
        ref,
        on=["source", "doc_id"],
        left_ts="ts",
        tolerance_sec=tol_sec,
        direction="backward",
        strategy=asof_strategy,
        cluster_on=["doc_id"] if asof_strategy == "window" else None,
    )

    w = Window.partitionBy("doc_id").orderBy("ts", "seq")

    # point-in-time backfill + windowed features (no further exchange)
    df = matched.withColumn("v_filled", locf("value", w, default=0.0))
    df = df.withColumn("delta1", W.delta1("v_filled", w))
    df = df.withColumn("delta9", W.delta_trailing("v_filled", w, half=4))
    df = df.withColumn("roll_mean", W.rolling_mean("v_filled", w, ROLL_WINDOW))
    df = df.withColumn("roll_std", W.rolling_std_pop("v_filled", w, ROLL_WINDOW))
    df = df.withColumn("cum_tokens", W.running_sum(F.col("n_tok").cast("long"), w))
    matched = with_session_id(
        df, keys=["doc_id"], ts="ts", order=["ts", "seq"], gap_sec=gap_sec
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
            F.coalesce(F.try_element_at("ref_vec", F.lit(1)), F.lit(0.0)),
            F.coalesce(lag_sec, F.lit(-1.0)),
        ).alias("feature_vector"),
        "tokens",
    )
    return out
