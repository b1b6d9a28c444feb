"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time feature pipeline on
/root/testdata/sf0.001. ``queries()`` exposes one entry per implemented
operator from SURVEY.md §2, each runnable on any sf dir; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the correctness gate.

Conventions shared by both sides so the driver's order-insensitive
value-hash matches:
- every computed double that involves accumulation/interpolation is
  round(x, 6) on BOTH sides; money sums go through DECIMAL(18,2/4) so the
  sum is exact before the final cast to double;
- integer window sums are cast to BIGINT on the DuckDB side (DuckDB sums
  integers into HUGEINT);
- event-time arithmetic is exact int64 microseconds (unix_micros /
  epoch_us) on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from audio_feature_extraction_spark.operators import windows as W
from audio_feature_extraction_spark.operators.asof import asof_join, dedupe_right
from audio_feature_extraction_spark.operators.backfill import backfill, locf
from audio_feature_extraction_spark.operators.sessionize import (
    session_bounds,
    with_session_id,
)
from audio_feature_extraction_spark.operators.timeutil import ts_micros
from audio_feature_extraction_spark.plans.pipeline import feature_pipeline

# events-table parameters: median same-user inter-event gap is ~7.7 h, so an
# 8 h gap sessionizes into multi-event sessions; 2-day as-of tolerance gives a
# healthy matched/unmatched mix (the missing-partner case stays exercised).
EV_GAP_SEC = 28_800.0
EV_TOL_SEC = 172_800.0
EV_GAP_US = int(EV_GAP_SEC * 1_000_000)
EV_TOL_US = int(EV_TOL_SEC * 1_000_000)

_WU = "PARTITION BY user_id ORDER BY ts, event_id"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + the NULL-injected observation column ``v`` (missing-value
    analog of unvoiced F0, SURVEY.md P1). Single source of truth:
    plans.from_events.with_v / V_NULL_ABOVE — the same derivation the
    flagship pipeline uses, so the threshold can never drift between the
    two query families."""
    from audio_feature_extraction_spark.plans.from_events import with_v

    return with_v(_t(spark, sf_dir, "events"))


def _uw():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


# --------------------------------------------------------------------------
# flagship pipeline plumbing: events reshaped to the input_hint schema
# (doc_id, seq, tokens array<int32>, n_tok, source, ts, value)
# --------------------------------------------------------------------------


from audio_feature_extraction_spark.plans.from_events import (  # noqa: E402
    reference_from_events,
    sequences_from_events,
)


def _sequences_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequences_from_events(_ev(spark, sf_dir))


def _reference_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reference_from_events(_t(spark, sf_dir, "events"))


def _pipeline(spark: SparkSession, sf_dir: str, strategy: str = "window") -> DataFrame:
    seq = _sequences_from_events(spark, sf_dir)
    ref = _reference_from_events(spark, sf_dir)
    return feature_pipeline(
        seq, ref, asof_strategy=strategy, gap_sec=EV_GAP_SEC, tol_sec=EV_TOL_SEC
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _pipeline(spark, "/root/testdata/sf0.001")


def _pipeline_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _pipeline(spark, sf_dir)
    el = lambda i: F.element_at("feature_vector", i)  # noqa: E731
    return out.select(
        "doc_id",
        "seq",
        "ts",
        "session_id",
        F.round(el(1), 6).alias("v_filled"),
        F.round(el(2), 6).alias("delta1"),
        F.round(el(3), 6).alias("delta9"),
        F.round(el(4), 6).alias("roll_mean"),
        F.round(el(5), 6).alias("roll_std"),
        el(7).cast("int").alias("n_tok"),
        el(8).cast("long").alias("cum_tokens"),
        F.round(el(9), 6).alias("ref0"),
        F.round(el(10), 6).alias("lag_sec"),
    )


# --------------------------------------------------------------------------
# aggregation queries (SURVEY.md §2.4)
# --------------------------------------------------------------------------


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing rollup (A1/A5 analog): exact DECIMAL sums,
    cast to double only at the end."""
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc = (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    taxp = (F.lit(1.0) + F.col("l_tax")).cast("decimal(18,2)")
    disc_price = (d2("l_extendedprice") * disc).cast("decimal(18,4)")
    charge = disc_price * taxp
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(d2("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(d2("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
       AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
       * CAST(1.0 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  ROUND(AVG(l_extendedprice), 6) AS avg_price,
  ROUND(AVG(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _q_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.stddev_pop("value"), 6).alias("std_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_SQL_GROUPED_STATS = """
SELECT event_type, COUNT(*) AS n,
  ROUND(AVG(value), 6) AS avg_value,
  ROUND(STDDEV_POP(value), 6) AS std_value,
  MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
"""


def _q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
    )


_SQL_PERCENTILES = """
SELECT event_type,
  ROUND(QUANTILE_CONT(value, 0.25), 6) AS p25,
  ROUND(QUANTILE_CONT(value, 0.50), 6) AS p50,
  ROUND(QUANTILE_CONT(value, 0.75), 6) AS p75
FROM events GROUP BY event_type
"""


def _q_bool_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hi = (F.col("value") > 100).cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(hi) * 100, 6).alias("high_rate_pct"),
        F.sum(hi).cast("long").alias("n_high"),
    )


_SQL_BOOL_RATES = """
SELECT event_type,
  ROUND(AVG(CASE WHEN value > 100 THEN 1 ELSE 0 END) * 100, 6) AS high_rate_pct,
  CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events GROUP BY event_type
"""


def _q_missing_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("v").isNull().cast("int")), 6).alias("null_rate"),
    )


_SQL_MISSING_RATE = """
SELECT event_type, COUNT(*) AS n,
  ROUND(AVG(CASE WHEN value > 150 THEN 1 ELSE 0 END), 6) AS null_rate
FROM events GROUP BY event_type
"""


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.stddev_pop("n_chars"), 6).alias("std_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


_SQL_CORPUS_STATS = """
SELECT lang, COUNT(*) AS n_docs,
  ROUND(AVG(n_chars), 6) AS avg_chars,
  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
  ROUND(STDDEV_POP(n_chars), 6) AS std_chars,
  COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


def _q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-deduction quality scoring ladder (P8/P9,
    04_…/feature_extractor.py:220-227)."""
    ev = _t(spark, sf_dir, "events")
    score = F.greatest(
        F.lit(1.0)
        - F.when(F.col("value") > 180, F.lit(0.3)).otherwise(F.lit(0.0))
        - F.when(F.col("value") < 20, F.lit(0.3)).otherwise(F.lit(0.0))
        - F.when(F.col("event_type") == "error", F.lit(0.3)).otherwise(F.lit(0.0)),
        F.lit(0.0),
    )
    ev = ev.withColumn("score", score)
    return ev.groupBy("event_type").agg(
        F.round(F.avg("score"), 6).alias("avg_score"),
        F.round(F.avg((F.col("score") >= 0.7).cast("int")), 6).alias("pass_rate"),
    )


_SQL_QUALITY_SCORE = """
WITH s AS (
  SELECT event_type,
    GREATEST(1.0
      - CASE WHEN value > 180 THEN 0.3 ELSE 0.0 END
      - CASE WHEN value < 20 THEN 0.3 ELSE 0.0 END
      - CASE WHEN event_type = 'error' THEN 0.3 ELSE 0.0 END, 0.0) AS score
  FROM events)
SELECT event_type, ROUND(AVG(score), 6) AS avg_score,
  ROUND(AVG(CASE WHEN score >= 0.7 THEN 1 ELSE 0 END), 6) AS pass_rate
FROM s GROUP BY event_type
"""


# --------------------------------------------------------------------------
# sessionization (SURVEY.md §2.9)
# --------------------------------------------------------------------------


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = with_session_id(
        ev, keys=["user_id"], ts="ts", order=["ts", "event_id"], gap_sec=EV_GAP_SEC
    )
    return out.select("event_id", "user_id", "session_id")


_SQL_SESSIONIZE = f"""
WITH gaps AS (
  SELECT event_id, user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_WU}) > {EV_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events)
SELECT event_id, user_id,
  CAST(SUM(is_new) OVER ({_WU} ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM gaps
"""


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sid = with_session_id(
        ev, keys=["user_id"], ts="ts", order=["ts", "event_id"], gap_sec=EV_GAP_SEC
    )
    agg = session_bounds(sid, keys=["user_id"], ts="ts", min_rows=2)
    return agg.select(
        "user_id",
        "session_id",
        "n_rows",
        "session_start",
        "session_end",
        (ts_micros("session_end") - ts_micros("session_start")).alias("duration_us"),
    )


_SQL_SESSION_STATS = f"""
WITH gaps AS (
  SELECT event_id, user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_WU}) > {EV_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (
  SELECT user_id, ts,
    CAST(SUM(is_new) OVER ({_WU} ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM gaps)
SELECT user_id, session_id, COUNT(*) AS n_rows,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM s GROUP BY user_id, session_id HAVING COUNT(*) >= 2
"""


# --------------------------------------------------------------------------
# missing-value strategies (W10)
# --------------------------------------------------------------------------


def _q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = _uw()
    return ev.select(
        "event_id",
        "user_id",
        locf("v", w, default=0.0).alias("v_locf"),
        backfill("v", w, default=None).alias("v_backfill"),
    )


_SQL_LOCF_FILL = f"""
WITH b AS (SELECT event_id, user_id, ts,
           CASE WHEN value > 150 THEN NULL ELSE value END AS v FROM events)
SELECT event_id, user_id,
  COALESCE(LAST_VALUE(v IGNORE NULLS)
           OVER ({_WU} ROWS UNBOUNDED PRECEDING), 0.0) AS v_locf,
  FIRST_VALUE(v IGNORE NULLS)
           OVER ({_WU} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS v_backfill
FROM b
"""


# --------------------------------------------------------------------------
# window features (W2-W9)
# --------------------------------------------------------------------------


def _q_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    return ev.select(
        "event_id",
        W.delta1("value", w).alias("d1"),
        W.lead_delta("value", w).alias("d_lead"),
    )


_SQL_LAG_LEAD_DELTA = f"""
SELECT event_id,
  COALESCE(value - LAG(value) OVER ({_WU}), 0.0) AS d1,
  COALESCE(LEAD(value) OVER ({_WU}) - value, 0.0) AS d_lead
FROM events
"""


def _duck_edge_lag(col: str, k: int) -> str:
    return (
        f"COALESCE(LAG({col}, {k}) OVER ({_WU}), "
        f"FIRST_VALUE({col}) OVER ({_WU} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
    )


def _q_delta9(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    return ev.select(
        "event_id", F.round(W.delta_trailing("value", w, half=4), 6).alias("d9")
    )


# same term order & parenthesization as operators.windows.delta_trailing
_SQL_DELTA9 = f"""
SELECT event_id,
  ROUND((0.0
    + 1.0 * ({_duck_edge_lag("value", 3)} - {_duck_edge_lag("value", 5)})
    + 2.0 * ({_duck_edge_lag("value", 2)} - {_duck_edge_lag("value", 6)})
    + 3.0 * ({_duck_edge_lag("value", 1)} - {_duck_edge_lag("value", 7)})
    + 4.0 * (value - {_duck_edge_lag("value", 8)})) / 60.0, 6) AS d9
FROM events
"""


def _q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    return ev.select(
        "event_id",
        F.round(W.rolling_mean("value", w, 5), 6).alias("rmean"),
        F.round(W.rolling_std_pop("value", w, 5), 6).alias("rstd"),
        W.rolling_min("value", w, 5).alias("rmin"),
        W.rolling_max("value", w, 5).alias("rmax"),
    )


_SQL_ROLLING_STATS = f"""
SELECT event_id,
  ROUND(AVG(value) OVER w5, 6) AS rmean,
  ROUND(COALESCE(STDDEV_POP(value) OVER w5, 0.0), 6) AS rstd,
  MIN(value) OVER w5 AS rmin,
  MAX(value) OVER w5 AS rmax
FROM events
WINDOW w5 AS ({_WU} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def _q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    return ev.select(
        "event_id", F.round(W.rolling_median("value", w, 5), 6).alias("rmed")
    )


_SQL_ROLLING_MEDIAN = f"""
SELECT event_id,
  ROUND(MEDIAN(value) OVER ({_WU} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
  AS rmed
FROM events
"""


def _q_savgol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    coeffs = W.savgol_coeffs(11, 3)
    return ev.select(
        "event_id", F.round(W.weighted_window("value", w, coeffs), 6).alias("smooth")
    )


def _sql_savgol() -> str:
    coeffs = W.savgol_coeffs(11, 3)
    n = len(coeffs)
    terms = "".join(
        f"\n    + ({c!r}) * {_duck_edge_lag('value', n - 1 - i)}"
        for i, c in enumerate(coeffs)
    )
    return f"SELECT event_id, ROUND((0.0{terms}), 6) AS smooth FROM events"


def _q_gauss_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: gaussian convolutional smoothing (dtw_alignment.py:413-441) as a
    trailing fixed-weight windowed dot product — same physical shape as SG."""
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    coeffs = W.gaussian_coeffs(9, 2.0)
    return ev.select(
        "event_id", F.round(W.weighted_window("value", w, coeffs), 6).alias("smooth")
    )


def _sql_gauss() -> str:
    coeffs = W.gaussian_coeffs(9, 2.0)
    n = len(coeffs)
    terms = "".join(
        f"\n    + ({c!r}) * {_duck_edge_lag('value', n - 1 - i)}"
        for i, c in enumerate(coeffs)
    )
    return f"SELECT event_id, ROUND((0.0{terms}), 6) AS smooth FROM events"


def _q_preemph_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("c", F.col("value") - 100.0)
    w = _uw()
    return ev.select(
        "event_id",
        F.round(W.preemphasis("value", w, 0.97), 6).alias("preemph"),
        F.round(W.sign_change_rate("c", w, 10), 6).alias("scr"),
    )


_SQL_PREEMPH_ZCR = f"""
WITH b AS (SELECT event_id, user_id, ts, value, value - 100.0 AS c FROM events),
flips AS (
  SELECT event_id, user_id, ts, value,
    COALESCE(CASE WHEN SIGN(c) * SIGN(LAG(c) OVER ({_WU})) < 0
             THEN 1.0 ELSE 0.0 END, 0.0) AS flip
  FROM b)
SELECT event_id,
  ROUND(value - 0.97 * COALESCE(LAG(value) OVER ({_WU}), 0.0), 6) AS preemph,
  ROUND(AVG(flip) OVER ({_WU} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS scr
FROM flips
"""


def _q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    return ev.select(
        "event_id",
        F.round(W.running_sum(F.col("value"), w), 6).alias("cum_value"),
        W.running_max("value", w).alias("cum_max"),
        F.row_number().over(w).alias("rn"),
    )


_SQL_RUNNING_TOTALS = f"""
SELECT event_id,
  ROUND(SUM(value) OVER ({_WU} ROWS UNBOUNDED PRECEDING), 6) AS cum_value,
  MAX(value) OVER ({_WU} ROWS UNBOUNDED PRECEDING) AS cum_max,
  ROW_NUMBER() OVER ({_WU}) AS rn
FROM events
"""


def _q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = W.top1_per_group(
        ev, keys=["user_id"], order_cols=[F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select("user_id", "event_id", "ts", "value")


_SQL_TOP1 = """
SELECT user_id, event_id, ts, value FROM (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# as-of joins (J4/J5) — all three physical strategies against one oracle
# --------------------------------------------------------------------------


def _asof_frames(spark: SparkSession, sf_dir: str):
    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("ref_value")
    )
    right = dedupe_right(right, on=["user_id"], ts="ts")
    return left, right


def _q_asof(strategy: str, direction: str = "backward"):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        left, right = _asof_frames(spark, sf_dir)
        return asof_join(
            left,
            right,
            on=["user_id"],
            left_ts="ts",
            tolerance_sec=EV_TOL_SEC,
            direction=direction,
            strategy=strategy,
        )

    return q


_SQL_ASOF_BACKWARD = f"""
WITH l AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'click'),
     r AS (SELECT user_id, ts, MAX(value) AS ref_value FROM events
           WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, l.ts, l.value,
  CASE WHEN r.ts IS NOT NULL
        AND epoch_us(l.ts) - epoch_us(r.ts) <= {EV_TOL_US}
       THEN r.ts END AS matched_ts,
  CASE WHEN r.ts IS NOT NULL
        AND epoch_us(l.ts) - epoch_us(r.ts) <= {EV_TOL_US}
       THEN r.ref_value END AS ref_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""

_SQL_ASOF_FORWARD = f"""
WITH l AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'click'),
     r AS (SELECT user_id, ts, MAX(value) AS ref_value FROM events
           WHERE event_type = 'purchase' GROUP BY user_id, ts),
     m AS (SELECT l.*,
           (SELECT MIN(r.ts) FROM r
            WHERE r.user_id = l.user_id AND r.ts >= l.ts) AS cand FROM l)
SELECT event_id, user_id, ts, value,
  CASE WHEN cand IS NOT NULL
        AND epoch_us(cand) - epoch_us(ts) <= {EV_TOL_US}
       THEN cand END AS matched_ts,
  CASE WHEN cand IS NOT NULL
        AND epoch_us(cand) - epoch_us(ts) <= {EV_TOL_US}
       THEN (SELECT r.ref_value FROM r
             WHERE r.user_id = m.user_id AND r.ts = m.cand) END AS ref_value
FROM m
"""


# --------------------------------------------------------------------------
# equi / anti joins (J1-J3)
# --------------------------------------------------------------------------


def _q_equi_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim chain + 1:N fan-out rollup (J1/J3)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        orders, cust.c_custkey == orders.o_custkey, "left_outer"
    )
    return j.groupBy("n_name").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


_SQL_EQUI_JOIN_FANOUT = """
SELECT n_name,
  COUNT(DISTINCT c_custkey) AS n_customers,
  COUNT(o_orderkey) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM customer
JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY n_name
"""


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# flagship pipeline as a gated query
# --------------------------------------------------------------------------

_SQL_PIPELINE = f"""
WITH base AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(event_id AS INT) AS seq,
         user_id, ts,
         CASE WHEN value > 150 THEN NULL ELSE value END AS v,
         CAST((event_id % 31) + 2 AS INT) AS n_tok
  FROM events),
gaps AS (
  SELECT *,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY doc_id ORDER BY ts, seq) > {EV_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM base),
f AS (
  SELECT doc_id, seq, user_id, ts, n_tok,
    COALESCE(LAST_VALUE(v IGNORE NULLS) OVER wh, 0.0) AS v_filled,
    CAST(SUM(CAST(n_tok AS BIGINT)) OVER wh AS BIGINT) AS cum_tokens,
    CAST(SUM(is_new) OVER wh AS BIGINT) AS session_id
  FROM gaps
  WINDOW wh AS (PARTITION BY doc_id ORDER BY ts, seq ROWS UNBOUNDED PRECEDING)),
g AS (
  SELECT *,
    COALESCE(v_filled - LAG(v_filled) OVER w, 0.0) AS delta1,
    (0.0
     + 1.0 * (COALESCE(LAG(v_filled, 3) OVER w, FIRST_VALUE(v_filled) OVER wf)
            - COALESCE(LAG(v_filled, 5) OVER w, FIRST_VALUE(v_filled) OVER wf))
     + 2.0 * (COALESCE(LAG(v_filled, 2) OVER w, FIRST_VALUE(v_filled) OVER wf)
            - COALESCE(LAG(v_filled, 6) OVER w, FIRST_VALUE(v_filled) OVER wf))
     + 3.0 * (COALESCE(LAG(v_filled, 1) OVER w, FIRST_VALUE(v_filled) OVER wf)
            - COALESCE(LAG(v_filled, 7) OVER w, FIRST_VALUE(v_filled) OVER wf))
     + 4.0 * (v_filled
            - COALESCE(LAG(v_filled, 8) OVER w, FIRST_VALUE(v_filled) OVER wf))
    ) / 60.0 AS delta9,
    AVG(v_filled) OVER w5 AS roll_mean,
    COALESCE(STDDEV_POP(v_filled) OVER w5, 0.0) AS roll_std
  FROM f
  WINDOW w AS (PARTITION BY doc_id ORDER BY ts, seq),
         w5 AS (PARTITION BY doc_id ORDER BY ts, seq
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY doc_id ORDER BY ts, seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
r AS (SELECT user_id, ts, MAX(value) AS r0 FROM events
      WHERE event_type = 'purchase' GROUP BY user_id, ts),
m AS (SELECT g.*, r.ts AS rts, r.r0
      FROM g ASOF LEFT JOIN r ON g.user_id = r.user_id AND g.ts >= r.ts)
SELECT doc_id, seq, ts, session_id,
  ROUND(v_filled, 6) AS v_filled,
  ROUND(delta1, 6) AS delta1,
  ROUND(delta9, 6) AS delta9,
  ROUND(roll_mean, 6) AS roll_mean,
  ROUND(roll_std, 6) AS roll_std,
  n_tok, cum_tokens,
  ROUND(CASE WHEN rts IS NOT NULL
              AND epoch_us(ts) - epoch_us(rts) <= {EV_TOL_US}
        THEN r0 ELSE 0.0 END, 6) AS ref0,
  ROUND(CASE WHEN rts IS NOT NULL
              AND epoch_us(ts) - epoch_us(rts) <= {EV_TOL_US}
        THEN (epoch_us(ts) - epoch_us(rts)) / 1000000.0 ELSE -1.0 END, 6)
        AS lag_sec
FROM m
"""


# --------------------------------------------------------------------------
# dedup suite (documents table; the driver testdata plants near-duplicates)
# --------------------------------------------------------------------------

from audio_feature_extraction_spark.operators import dedup as _D  # noqa: E402
from audio_feature_extraction_spark.operators import multimodal as _M  # noqa: E402
from audio_feature_extraction_spark.operators import similarity as _S  # noqa: E402
from audio_feature_extraction_spark.operators import text as _T  # noqa: E402


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _D.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id")


_SQL_DEDUP_EXACT = """
SELECT array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
         AS dedup_key,
       MIN(doc_id) AS survivor_id,
       COUNT(*) AS n_dupes
FROM documents GROUP BY 1
"""

# hot-shingle document-frequency cap for the inverted-index join: a shingle
# shared by > NGRAM_DF_CAP docs is a stop-shingle — it carries no dedup signal
# and is exactly the key whose self-join is quadratic at 100 TB
NGRAM_DF_CAP = 64


def _sql_jaccard(df_cap: int | None = None) -> str:
    """Brute-force 3-gram jaccard pairs (DuckDB). With ``df_cap`` the oracle
    mirrors the engine's stop-shingle drop so values stay bit-identical."""
    kept = (
        "SELECT * FROM sh"
        if df_cap is None
        else "SELECT * FROM sh WHERE s NOT IN "
        f"(SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {df_cap})"
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
idx AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
        FROM d),
sh AS (SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s FROM idx),
kept AS ({kept}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(inter / (sa.n + sb.n - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE inter / (sa.n + sb.n - inter) >= 0.8
"""


_SQL_JACCARD_BASE = _sql_jaccard(None)


def _q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.8, df_cap=NGRAM_DF_CAP,
    )


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: verified jaccard pairs → connected
    components (min-label propagation, operators/graph.py) → every document
    labeled with its cluster representative (min doc_id reachable) and the
    cluster size. This is the keep-one-representative primitive of corpus
    dedup; the DuckDB oracle computes the same components via a recursive
    reachability CTE."""
    from audio_feature_extraction_spark.operators.graph import (
        connected_components,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = _D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, df_cap=NGRAM_DF_CAP
    )
    cc = connected_components(pairs, docs, id_col="doc_id")
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        F.col("node").alias("doc_id"), "cluster_id", "cluster_size"
    )


def _sql_dedup_clusters() -> str:
    """Reachability closure over the SAME verified-pair set: cluster_id =
    min node reachable in the undirected pair graph (UNION-recursive CTE,
    terminates at the closure fixpoint)."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({_sql_jaccard(NGRAM_DF_CAP)}) jp),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM pairs),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst AS node, rc.r
  FROM reach rc JOIN edges e ON e.src = rc.node),
lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM lab l JOIN sizes s USING (cluster_id)
"""


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded candidates + exact verification. Oracle = brute force: at
    j≥0.8 with 32 bands × 3 rows, miss probability ≤ 2e-10 per pair, and the
    testdata's qualifying pairs all sit ≥ 0.9."""
    return _D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


def _duck_word_hash(x: str) -> str:
    return f"CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _sql_simhash_cte(bits: int = _D.SIMHASH_BITS) -> str:
    """Programmatically generated DuckDB twin of operators.dedup.simhash."""
    sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
h AS (SELECT doc_id, {_duck_word_hash('word')} AS h FROM w),
sums AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, {sig} AS simhash FROM sums)
"""


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _D.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_simhash() -> str:
    return f"WITH {_sql_simhash_cte()} SELECT doc_id, simhash FROM sig"


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _D.simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=6
    )


def _sql_simhash_pairs() -> str:
    # oracle is the brute-force all-pairs hamming; the engine's banded join
    # has exact recall for max_hamming < bands (pigeonhole)
    return f"""
WITH {_sql_simhash_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


# --------------------------------------------------------------------------
# text analysis suite
# --------------------------------------------------------------------------


def _q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        _T.whitespace_token_count("text").alias("wc"),
        _T.bpe_ish_token_count("text").alias("bpe_tokens"),
        F.round(_T.quality_score("text"), 6).alias("quality"),
        _T.lang_id("text").alias("lang_pred"),
        _T.doc_fingerprint("text").alias("fingerprint"),
    )
    # min-shingle via the explode plan, not the array-transform column:
    # higher-order lambdas are interpreted (CodegenFallback), so one extra
    # keyed agg + join beats per-row gram building (~2× on this query)
    msf = (
        _D.shingles(d, "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(F.min(_D.portable_word_hash(F.col("shingle"))).alias("min_shingle_fp"))
    )
    return base.join(msf, "doc_id", "left")


def _sql_text_features() -> str:
    def _hits_expr(markers: list[str]) -> str:
        # mirror text.marker_hits: word-count for ASCII markers, substring
        # occurrence count for CJK (space-free scripts never word-match)
        word_ms = [m for m in markers if m.isascii()]
        sub_ms = [m for m in markers if not m.isascii()]
        parts = []
        if word_ms:
            parts.append(
                "len(list_filter(string_split(text,' '), "
                f"w -> list_contains({word_ms!r}, w)))"
            )
        for m in sub_ms:
            parts.append(
                f"CAST((length(text) - length(replace(text, '{m}', '')))"
                f" / {len(m)} AS INT)"
            )
        return " + ".join(parts)

    marker_hits = {
        lang: _hits_expr(markers) for lang, markers in _T.LANG_MARKERS.items()
    }
    gm = "GREATEST(" + ", ".join(f"h_{l}" for l in _T.LANG_MARKERS) + ")"
    lang_case = "CASE WHEN " + gm + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{l} = {gm} THEN '{l}'" for l in _T.LANG_MARKERS
    ) + " END"
    hit_cols = ", ".join(f"{expr} AS h_{l}" for l, expr in marker_hits.items())
    return f"""
WITH base AS (
  SELECT doc_id, text,
    len(string_split(text, ' ')) AS wc,
    len(regexp_extract_all(text, '{_T.BPE_ISH_PATTERN}')) AS bpe_tokens,
    len(list_distinct(string_split(text, ' '))) AS n_distinct,
    {hit_cols}
  FROM documents),
q AS (
  SELECT *,
    n_distinct / wc AS dwr,
    (length(text) - (wc - 1)) / wc AS awl
  FROM base),
sh AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
  FROM (SELECT doc_id, string_split(text,' ') AS words,
               unnest(generate_series(1, len(string_split(text,' ')) - 2)) AS i
        FROM documents)),
msf AS (SELECT doc_id, MIN({_duck_word_hash('s')}) AS min_shingle_fp
        FROM sh GROUP BY doc_id)
SELECT q.doc_id, wc, bpe_tokens,
  ROUND(GREATEST(1.0
    - CASE WHEN wc < 20 THEN 0.3 ELSE 0.0 END
    - CASE WHEN dwr < 0.4 THEN 0.3 ELSE 0.0 END
    - CASE WHEN awl < 2.5 OR awl > 12.0 THEN 0.3 ELSE 0.0 END, 0.0), 6)
    AS quality,
  {lang_case} AS lang_pred,
  md5(text) AS fingerprint,
  msf.min_shingle_fp
FROM q LEFT JOIN msf ON q.doc_id = msf.doc_id
"""


# --------------------------------------------------------------------------
# similarity search suite (embeddings table)
# --------------------------------------------------------------------------


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.brute_force_topk(emb, queries, k=10)


_SQL_ANN_TOPK = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.qe, v.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(v.e, x -> x * x)))) AS cos
  FROM v, q WHERE v.vec_id != q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos
FROM ranked WHERE rank <= 10
"""


def _q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.lsh_bucketed_topk(emb, queries, k=10)


def _sql_ann_lsh() -> str:
    """DuckDB twin of lsh_bucketed_topk: identical plan-time hyperplane
    literals, identical sequential double math, multiprobe at hamming ≤ 1 —
    so the approximate result is deterministic and exactly checkable."""
    planes = _S._plane_literals(8, 64, 7)
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(list_zip(e, ["
        + ", ".join(repr(x) for x in plane)
        + "]), x -> x[1] * x[2])) > 0 THEN "
        + str(1 << p)
        + " ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << p})" for p in range(8)])
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
sig AS (SELECT vec_id, e, {bits} AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, unnest([{probes}]) AS bucket
      FROM sig WHERE vec_id < 10),
cand AS (SELECT q.query_id, s.vec_id AS neighbor_id, q.qe, s.e
         FROM sig s JOIN q ON s.bucket = q.bucket
         WHERE s.vec_id != q.query_id),
scored AS (SELECT query_id, neighbor_id,
    list_sum(list_transform(list_zip(qe, e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(qe, x -> x * x)))
       * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos
  FROM cand),
ranked AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos
FROM ranked WHERE rank <= 10
"""


IVF_CELLS, IVF_NPROBE, IVF_SEED = 16, 4, 11


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (the scale path beside LSH): corpus pruned to
    the query's nprobe nearest cells, exact cosine re-rank inside."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.ivf_topk(
        emb, queries, k=10, n_cells=IVF_CELLS, nprobe=IVF_NPROBE, seed=IVF_SEED
    )


def _sql_ann_ivf() -> str:
    """DuckDB twin of ivf_topk: identical centroid literals, identical
    -2·(v·c)+|c|² rank math, lexicographic struct ordering for ties."""
    cents = _S._centroid_literals(IVF_CELLS, 64, IVF_SEED)
    ds = ", ".join(
        "struct_pack(d := -2.0 * list_sum(list_transform(list_zip(e, ["
        + ", ".join(repr(x) for x in c)
        + "]), x -> x[1] * x[2])) + "
        + repr(float(sum(x * x for x in c)))
        + ", c := "
        + str(i)
        + ")"
        for i, c in enumerate(cents)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
d AS (SELECT vec_id, e, [{ds}] AS ds FROM v),
c AS (SELECT vec_id AS neighbor_id, e, list_sort(ds)[1].c AS cell FROM d),
q AS (SELECT vec_id AS query_id, e AS qe,
             unnest(list_transform(list_sort(ds)[1:{IVF_NPROBE}], s -> s.c))
               AS cell
      FROM d WHERE vec_id < 10),
scored AS (SELECT q.query_id, c.neighbor_id,
    list_sum(list_transform(list_zip(q.qe, c.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
  FROM c JOIN q ON c.cell = q.cell
  WHERE c.neighbor_id != q.query_id),
ranked AS (SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cos
FROM ranked WHERE rank <= 10
"""


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing over synthesized payloads (no media
    codecs in this container; deterministic md5-derived fake decoder, real
    Arrow mapInPandas path — the oracle reproduces the features in SQL)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    out = _M.extract_media_features(_M.with_media_meta(d), fake=True)
    return out.select(
        "doc_id",
        F.size("media_features").alias("feat_dim"),
        F.round(F.element_at("media_features", 1), 6).alias("f0"),
        F.round(F.element_at("media_features", 8), 6).alias("f7"),
        F.round(
            F.aggregate("media_features", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("f_sum"),
    )


def _sql_media_features() -> str:
    """SQL twin of multimodal._fake_decode: feature i =
    int64(md5(payload || '|' || i)[:12 hex]) / 2^48, payload = utf-8 text."""
    def feat(i: int) -> str:
        return (
            f"(CAST(('0x' || substr(md5(text || '|{i}'), 1, 12)) AS BIGINT)"
            " / 281474976710656.0)"
        )

    fsum = " + ".join(feat(i) for i in range(_M.FEATURE_DIM))
    return f"""
SELECT doc_id, CAST({_M.FEATURE_DIM} AS INT) AS feat_dim,
  ROUND({feat(0)}, 6) AS f0,
  ROUND({feat(7)}, 6) AS f7,
  ROUND((0.0 + {fsum}), 6) AS f_sum
FROM documents
"""


def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("int").alias("n_frames")
    )
    return _M.frame_sample_plan(d, every=10).select("doc_id", "frame_idx")


_SQL_FRAME_SAMPLE = """
SELECT doc_id,
       unnest(generate_series(0, n_chars - 1, 10)) AS frame_idx
FROM documents
WHERE n_chars > 0
"""


# --------------------------------------------------------------------------
# projection / trim / normalization suite (P3/P4/P7, A9/A10, dtw robust-norm)
# --------------------------------------------------------------------------

from audio_feature_extraction_spark.operators import stats as _ST  # noqa: E402
from audio_feature_extraction_spark.operators.rangejoin import (  # noqa: E402
    band_join_stats,
)
from audio_feature_extraction_spark.operators.windows import (  # noqa: E402
    trim_to_active,
)

TRIM_THRESH = 170.0


def _q_trim_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-trim (P3): keep rows between the first and last loud row per
    user (librosa.effects.trim analog, core/feature_extractor.py:72)."""
    ev = _t(spark, sf_dir, "events")
    out = trim_to_active(
        ev, keys=["user_id"], ts="ts", active=F.col("value") >= TRIM_THRESH
    )
    return out.select("event_id", "user_id", "ts")


_SQL_TRIM_ACTIVE = f"""
WITH b AS (SELECT event_id, user_id, ts, value, epoch_us(ts) AS us FROM events),
m AS (SELECT *,
    MIN(CASE WHEN value >= {TRIM_THRESH} THEN us END)
        OVER (PARTITION BY user_id) AS lo,
    MAX(CASE WHEN value >= {TRIM_THRESH} THEN us END)
        OVER (PARTITION BY user_id) AS hi
  FROM b)
SELECT event_id, user_id, ts FROM m
WHERE lo IS NOT NULL AND us BETWEEN lo AND hi
"""


def _q_gate_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-gate + clip projection (P4/P7): clipped value on active rows,
    zero elsewhere (feature_extraction.py:143-183, :125-139)."""
    ev = _t(spark, sf_dir, "events")
    is_active = (F.col("event_type") != "error") & (F.col("value") > 50)
    return ev.select(
        "event_id",
        F.round(_ST.clip_gate(F.col("value"), is_active, 20.0, 180.0), 6).alias(
            "gated"
        ),
    )


_SQL_GATE_CLIP = """
SELECT event_id,
  ROUND(CASE WHEN event_type != 'error' AND value > 50
        THEN LEAST(GREATEST(value, 20.0), 180.0) ELSE 0.0 END, 6) AS gated
FROM events
"""


def _q_robust_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-clip robust normalization per group (dtw_alignment.py:388-411)."""
    ev = _t(spark, sf_dir, "events")
    out = _ST.robust_normalize(ev, ["event_type"], "value", out="normalized")
    return out.select("event_id", F.round("normalized", 6).alias("normalized"))


_SQL_ROBUST_NORM = """
WITH s AS (
  SELECT event_type,
    QUANTILE_CONT(value, 0.25) AS q25,
    QUANTILE_CONT(value, 0.50) AS q50,
    QUANTILE_CONT(value, 0.75) AS q75
  FROM events GROUP BY 1)
SELECT event_id,
  ROUND((LEAST(GREATEST(value, q25 - 1.5 * (q75 - q25)),
               q75 + 1.5 * (q75 - q25)) - q50)
        / ((q75 - q25) + 1e-8), 6) AS normalized
FROM events JOIN s USING (event_type)
"""


def _q_snr_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived SNR/CV/stability aggregates (A9,
    04_…/feature_extractor.py:370-374, feature_extraction.py:316-324)."""
    ev = _t(spark, sf_dir, "events")
    out = _ST.snr_metrics(ev, ["event_type"], "value", noise_q=0.10)
    return out.select(
        "event_type",
        "n",
        F.round("snr_db", 6).alias("snr_db"),
        F.round("cv", 6).alias("cv"),
        F.round("stability", 6).alias("stability"),
    )


# ln(x)/ln(10) (NOT the C log10) so the double math matches Spark's
# Logarithm(base, expr) bit-for-bit
_SQL_SNR_STABILITY = """
SELECT event_type, COUNT(*) AS n,
  ROUND(20.0 * (LN(AVG(value) / (QUANTILE_CONT(value, 0.10) + 1e-8))
                / LN(10.0)), 6) AS snr_db,
  ROUND(STDDEV_POP(value) / (AVG(value) + 1e-8), 6) AS cv,
  ROUND(1.0 - STDDEV_POP(value) / (AVG(ABS(value)) + 1e-8), 6) AS stability
FROM events GROUP BY event_type
"""


def _q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width distribution analysis (A10, evaluation/evaluator.py:149-206)."""
    ev = _t(spark, sf_dir, "events")
    return _ST.histogram_counts(
        ev, "value", lo=0.0, hi=200.0, nbins=20, group_cols=["event_type"]
    )


_SQL_VALUE_HISTOGRAM = """
SELECT event_type,
  LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 10.0) AS INT), 0), 19) AS bucket,
  COUNT(*) AS n
FROM events
WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY 1, 2
"""


def _q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key grouped reporting with subtotals (A6,
    dtw_alignment.py:1519-1552) — ROLLUP grouping sets."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select("o_orderpriority", "o_orderstatus", "grp", "n", "total_price")
    )


def _q_vector_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Arrow-kernel template: per-row moment stats of the embedding
    vector via ONE Series→Series pandas_udf (float64 accumulation in array
    order — the reference's per-entity numpy semantics,
    core/feature_extractor.py:99-101)."""
    from audio_feature_extraction_spark.operators.kernels import vector_stats

    e = _t(spark, sf_dir, "embeddings")
    s = vector_stats("embedding")
    return e.select(
        "vec_id",
        F.round(s["mean"], 6).alias("v_mean"),
        F.round(s["std"], 6).alias("v_std"),
        F.round(s["vmin"], 6).alias("v_min"),
        F.round(s["vmax"], 6).alias("v_max"),
        F.round(s["l2"], 6).alias("v_l2"),
    )


_SQL_VECTOR_KERNEL = """
WITH clean AS (
  -- NaN elements are MISSING on both sides (kernels._vec_stats filters them)
  SELECT vec_id,
         list_filter(CAST(embedding AS DOUBLE[]), x -> NOT isnan(x)) AS e
  FROM embeddings)
SELECT vec_id,
  ROUND((SELECT AVG(x) FROM UNNEST(e) AS t(x)), 6) AS v_mean,
  ROUND((SELECT STDDEV_POP(x) FROM UNNEST(e) AS t(x)), 6) AS v_std,
  ROUND((SELECT MIN(x) FROM UNNEST(e) AS t(x)), 6) AS v_min,
  ROUND((SELECT MAX(x) FROM UNNEST(e) AS t(x)), 6) AS v_max,
  ROUND(SQRT((SELECT SUM(x * x) FROM UNNEST(e) AS t(x))), 6) AS v_l2
FROM clean
"""


def _q_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 full-matrix variant: CUBE over (lesson, student) analog keys —
    per-lang × per-source rollups incl. both marginals
    (dtw_alignment.py:1519-1552)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_chars").cast("long")).alias("chars"),
        )
        .select("lang", "source", "grp", "n", "chars")
    )


_SQL_CUBE_REPORT = """
SELECT lang, source,
  GROUPING(lang) * 2 + GROUPING(source) AS grp,
  COUNT(*) AS n,
  CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
FROM documents GROUP BY CUBE (lang, source)
"""


def _q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: count + exact distinct per group (evaluation/evaluator.py:70,
    dtw_alignment.py:1431-1434). approx_count_distinct is the 100 TB form;
    exact countDistinct here so the oracle comparison is deterministic."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


_SQL_COUNT_DISTINCT = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


_SQL_ROLLUP_REPORT = """
SELECT o_orderpriority, o_orderstatus,
  GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS grp,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# --------------------------------------------------------------------------
# set operations (U1-U3)
# --------------------------------------------------------------------------


def _q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "view").select("user_id")
    return a.unionByName(b).distinct()


_SQL_UNION_DISTINCT = """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'view'
"""


def _q_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


_SQL_INTERSECT_USERS = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


# --------------------------------------------------------------------------
# range/banded join (J5) + event-time frames (W1)
# --------------------------------------------------------------------------

BAND_HI_SEC = 86_400.0
BAND_HI_US = int(BAND_HI_SEC * 1_000_000)


def _q_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-band join (J5, dtw_alignment.py:885-928): per click, stats
    over same-user purchases in the last 24 h. DECIMAL sum for exactness."""
    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").cast("decimal(18,6)").alias("pval")
    )
    out = band_join_stats(
        left, right, on=["user_id"], lo_sec=0.0, hi_sec=BAND_HI_SEC,
        value_col="pval",
    )
    return out.select(
        "event_id",
        "user_id",
        "n_in_band",
        F.col("band_max").cast("double").alias("band_max"),
        F.col("band_sum").cast("double").alias("band_sum"),
    )


_SQL_BAND_JOIN = f"""
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
     r AS (SELECT user_id, epoch_us(ts) AS us,
                  CAST(value AS DECIMAL(18,6)) AS pval
           FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
  COUNT(r.us) AS n_in_band,
  CAST(MAX(r.pval) AS DOUBLE) AS band_max,
  CAST(SUM(r.pval) AS DOUBLE) AS band_sum
FROM l LEFT JOIN r
  ON l.user_id = r.user_id
 AND epoch_us(l.ts) - r.us BETWEEN 0 AND {BAND_HI_US}
GROUP BY l.event_id, l.user_id
"""

TUMBLE_US = 21_600_000_000  # 6 h
SLIDE_US = 10_800_000_000  # 3 h


def _q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time frames (W1, feature_extraction.py:35-45):
    6 h windows per event_type via the native window() operator.

    avg goes through an exact DECIMAL sum: at sf0.1 a group's float avg
    landed exactly on a round-half boundary (…3125e-6) and the two engines'
    different summation orders rounded opposite ways — decimal summation is
    order-independent, so the rounded avg is bit-identical at every SF."""
    ev = _t(spark, sf_dir, "events")
    # exact decimal SUM → cast to double → double division: both engines
    # then hold the IDENTICAL IEEE double. The final rounding is the
    # floor(x*1e6 + 0.5)/1e6 expression on BOTH sides — the engines' native
    # round() functions disagree at representation boundaries (Spark rounds
    # the exact BigDecimal of the double, DuckDB rounds a float product),
    # which is exactly what a 10×-data summation exposed.
    dsum = F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
    avg = dsum / F.count(F.lit(1))
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(avg * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "avg_value"
            ),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "avg_value")
    )


_SQL_TUMBLING_COUNTS = f"""
SELECT make_timestamp((epoch_us(ts) // {TUMBLE_US}) * {TUMBLE_US}) AS win_start,
       event_type, COUNT(*) AS n,
       FLOOR(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
             * 1e6 + 0.5) / 1e6 AS avg_value
FROM events GROUP BY 1, 2
"""


def _q_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frames (W1): 6 h window, 3 h hop — every event lands in 2
    windows (librosa.util.frame analog, 04_…/process_audio.py:104)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


_SQL_SLIDING_COUNTS = f"""
SELECT make_timestamp((epoch_us(ts) // {SLIDE_US}) * {SLIDE_US}
                      - j * {SLIDE_US}) AS win_start,
       event_type, COUNT(*) AS n
FROM events, unnest([0, 1]) AS t(j)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# token-array ops (O2 + bit-identity over the input_hint schema)
# --------------------------------------------------------------------------


def _q_token_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence truncation + array integrity (O2,
    feature_extraction_for_student.py:27): head slice, last element, exact
    int sum — all computed from the actual tokens array so any corruption
    in the array path shows up against the closed-form oracle."""
    seq = _sequences_from_events(spark, sf_dir)
    return seq.select(
        "doc_id",
        "seq",
        "n_tok",
        F.concat_ws(
            ",", F.slice("tokens", 1, F.least(F.lit(8), F.col("n_tok")))
        ).alias("head_csv"),
        F.try_element_at("tokens", F.lit(-1)).alias("tok_last"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("tok_sum"),
    )


_SQL_TOKEN_SLICE = """
WITH b AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(event_id AS INT) AS seq,
         CAST((event_id % 31) + 2 AS INT) AS n_tok
  FROM events)
SELECT doc_id, seq, n_tok,
  array_to_string(range(1, LEAST(8, n_tok) + 1), ',') AS head_csv,
  n_tok AS tok_last,
  CAST(n_tok AS BIGINT) * (n_tok + 1) // 2 AS tok_sum
FROM b
"""


# --------------------------------------------------------------------------
# embedding-cosine near-dup (the embedding analog of minhash-LSH)
# --------------------------------------------------------------------------

NEARDUP_COS = 0.9
NEARDUP_PLANT = 50  # planted dupes: vec_id < 50 rescaled by 1.001, id +100000


def _emb_with_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw embeddings are random (max pairwise cos ≈ 0.49), so plant
    deterministic near-duplicates: scaled copies (cos = 1.0) of the first
    NEARDUP_PLANT vectors. The operator must recover exactly those pairs."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = emb.where(F.col("vec_id") < NEARDUP_PLANT).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    return emb.unionByName(dupes)


def _q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _S.cosine_neardup_pairs(
        _emb_with_planted(spark, sf_dir), threshold=NEARDUP_COS
    )


def _sql_emb_neardup() -> str:
    """DuckDB twin replicates the hyperplane bucketing exactly (same plane
    literals, same sequential double math), so the check is exact."""
    planes = _S._plane_literals(8, 64, 7)
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(list_zip(e, ["
        + ", ".join(repr(x) for x in plane)
        + "]), x -> x[1] * x[2])) > 0 THEN "
        + str(1 << p)
        + " ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
v AS (SELECT vec_id, e FROM v0
      UNION ALL
      SELECT vec_id + 100000, list_transform(e, x -> x * 1.001)
      FROM v0 WHERE vec_id < {NEARDUP_PLANT}),
sig AS (SELECT vec_id, e, {bits} AS bucket FROM v)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_sum(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]))
    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
     * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS cos
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.e, b.e), x -> x[1] * x[2]))
    / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
     * sqrt(list_sum(list_transform(b.e, x -> x * x)))) >= {NEARDUP_COS}
"""


# --------------------------------------------------------------------------
# n_tok-aware bin-packing as an observable assignment (SURVEY.md §4.2)
# --------------------------------------------------------------------------

from audio_feature_extraction_spark.operators.binpack import (  # noqa: E402
    with_bin_id,
)

BIN_CAP = 20_000


def _q_binpack_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    out = with_bin_id(
        d,
        payload_col="n_chars",
        order_cols=["doc_id"],
        group_cols=["lang"],
        target_payload_per_bin=BIN_CAP,
        mix=False,
        out="bin_id",
    )
    return out.select("doc_id", "lang", "bin_id")


_SQL_BINPACK_ASSIGN = f"""
SELECT doc_id, lang,
  CAST(FLOOR(GREATEST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - 1, 0)
/ {BIN_CAP}) AS INT) AS bin_id
FROM documents
"""


def _q_delta9_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact centered librosa-style delta (W2 non-causal variant)."""
    ev = _t(spark, sf_dir, "events")
    w = _uw()
    return ev.select(
        "event_id", F.round(W.delta_centered("value", w, half=4), 6).alias("d9c")
    )


def _duck_edge_lead(col: str, k: int) -> str:
    return (
        f"COALESCE(LEAD({col}, {k}) OVER ({_WU}), "
        f"LAST_VALUE({col}) OVER ({_WU} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
    )


_SQL_DELTA9_CENTERED = f"""
SELECT event_id,
  ROUND((0.0
    + 1.0 * ({_duck_edge_lead("value", 1)} - {_duck_edge_lag("value", 1)})
    + 2.0 * ({_duck_edge_lead("value", 2)} - {_duck_edge_lag("value", 2)})
    + 3.0 * ({_duck_edge_lead("value", 3)} - {_duck_edge_lag("value", 3)})
    + 4.0 * ({_duck_edge_lead("value", 4)} - {_duck_edge_lag("value", 4)}))
    / 60.0, 6) AS d9c
FROM events
"""


DAY_US = 86_400_000_000

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_time_range_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (W12 time-based form): per user, count and sum
    over the trailing 24 h of *event time* — a range frame over int64 µs, not
    a row-count frame (ties included as frame peers on both engines)."""
    ev = _t(spark, sf_dir, "events").withColumn("us", ts_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-DAY_US, 0)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.round(F.sum("value").over(w), 6).alias("sum_24h"),
    )


_SQL_TIME_RANGE_STATS = f"""
SELECT event_id,
  COUNT(*) OVER w AS n_24h,
  ROUND(SUM(value) OVER w, 6) AS sum_24h
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {DAY_US} PRECEDING AND CURRENT ROW)
"""


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 explicit GROUPING SETS form: chosen subtotal combinations only —
    (priority, status), (priority), (status) — not the full rollup lattice."""
    o = _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping_id() AS grp,
               count(1) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        """,
        o=o,
    )


_SQL_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus,
  GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS grp,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus))
"""


def _q_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-entity × per-category report via the native pivot operator
    (the reference's per-category metric matrices,
    evaluation/evaluator.py:149-206). Pivot values are pinned so the plan is
    deterministic (no extra distinct-scan job)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.avg("value"), 6))
    )


_SQL_PIVOT_REPORT = """
SELECT user_id,
  ROUND(AVG(value) FILTER (WHERE event_type = 'click'), 6) AS click,
  ROUND(AVG(value) FILTER (WHERE event_type = 'error'), 6) AS error,
  ROUND(AVG(value) FILTER (WHERE event_type = 'purchase'), 6) AS purchase,
  ROUND(AVG(value) FILTER (WHERE event_type = 'signup'), 6) AS signup,
  ROUND(AVG(value) FILTER (WHERE event_type = 'view'), 6) AS view
FROM events GROUP BY user_id
"""


def _q_delta9_second(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Δ² (delta-delta, W2): the trailing regression delta applied to its own
    output — the reference's stacked Δ/Δ² features
    (feature_extraction.py:208-211)."""
    ev = _t(spark, sf_dir, "events")
    out = W.delta2_trailing(
        ev, "value", keys=["user_id"], order=["ts", "event_id"], half=4, out="d2"
    )
    return out.select("event_id", F.round("d2", 6).alias("d2"))


def _duck_delta9_expr(col: str) -> str:
    """The causal width-9 regression delta as a DuckDB expression — same term
    order & parenthesization as operators.windows.delta_trailing."""
    return (
        "(0.0"
        f"\n    + 1.0 * ({_duck_edge_lag(col, 3)} - {_duck_edge_lag(col, 5)})"
        f"\n    + 2.0 * ({_duck_edge_lag(col, 2)} - {_duck_edge_lag(col, 6)})"
        f"\n    + 3.0 * ({_duck_edge_lag(col, 1)} - {_duck_edge_lag(col, 7)})"
        f"\n    + 4.0 * ({col} - {_duck_edge_lag(col, 8)})) / 60.0"
    )


_SQL_DELTA9_SECOND = f"""
WITH d1 AS (
  SELECT event_id, user_id, ts,
    {_duck_delta9_expr("value")} AS d9
  FROM events)
SELECT event_id, ROUND({_duck_delta9_expr("d9")}, 6) AS d2
FROM d1
"""


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# corpus-curation suite: repetition signals, contamination, deterministic
# sampling, length histograms (operators/quality.py)
# --------------------------------------------------------------------------

from audio_feature_extraction_spark.operators import quality as _Q  # noqa: E402

_SAMPLE_RATES = {"src0": 0.5, "src1": 0.25, "src2": 0.1}
_SAMPLE_DEFAULT = 0.05


def _q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per doc: duplicated bigram/trigram
    fraction + most-frequent-word dominance, all from ONE posexplode pass
    (one exchange; the rollup chain reuses the hash(doc_id) partitioning —
    see quality.repetition_stats)."""
    d = _t(spark, sf_dir, "documents")
    return _Q.repetition_stats(d, "doc_id", "text")


_SQL_DOC_REPETITION = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS wc
  FROM documents),
g2 AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w)),
g3 AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w)),
d2 AS (SELECT doc_id, ROUND(1.0 - COUNT(DISTINCT g) / COUNT(*), 6) AS dup2_frac
       FROM g2 GROUP BY doc_id),
d3 AS (SELECT doc_id, ROUND(1.0 - COUNT(DISTINCT g) / COUNT(*), 6) AS dup3_frac
       FROM g3 GROUP BY doc_id),
wordcounts AS (
  SELECT doc_id, word, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(ws) AS word FROM w)
  GROUP BY doc_id, word),
top AS (
  SELECT doc_id, word, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, word) AS rn
  FROM wordcounts)
SELECT w.doc_id, d2.dup2_frac, d3.dup3_frac,
       top.word AS top_word,
       CAST(top.n AS BIGINT) AS top_word_count,
       ROUND(top.n / w.wc, 6) AS top_word_frac
FROM w
LEFT JOIN d2 ON w.doc_id = d2.doc_id
LEFT JOIN d3 ON w.doc_id = d3.doc_id
JOIN top ON w.doc_id = top.doc_id AND top.rn = 1
"""


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: 3-gram shingle overlap between the
    corpus (doc_id % 97 != 0) and a broadcast benchmark set (% 97 == 0).
    Inverted-index join — never an all-pairs comparison. (Real corpora use
    longer shingles, e.g. 8-grams; the synthetic vocab is tiny so 3-grams
    keep the matched set large enough to gate on.)"""
    d = _t(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 97 != 0)
    bench = d.where(F.col("doc_id") % 97 == 0)
    return _Q.contamination_overlap(
        corpus, bench, "doc_id", "text", n=3, min_overlap=1
    ).select("doc_id", F.col("overlap").cast("long").alias("overlap"))


_SQL_CONTAMINATION = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
    {_duck_word_hash("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")} AS h
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w)),
corpus AS (SELECT DISTINCT doc_id, h FROM sh WHERE doc_id % 97 != 0),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0)
SELECT corpus.doc_id, CAST(COUNT(*) AS BIGINT) AS overlap
FROM corpus JOIN bench ON corpus.h = bench.h
GROUP BY corpus.doc_id
HAVING COUNT(*) >= 1
"""


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling: md5-bucket filter, zero shuffles,
    bit-reproducible across engines and partition layouts."""
    d = _t(spark, sf_dir, "documents")
    out = _Q.stratified_sample(
        d, "doc_id", "source", _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT
    )
    return out.select("doc_id", "source", "lang", "n_chars")


def _sql_stratified_sample() -> str:
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        " % 10000"
    )
    # round(), matching quality.stratified_sample's threshold derivation
    cases = " ".join(
        f"WHEN source = '{s}' THEN {round(r * 10000)}"
        for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE {bucket} < (CASE {cases} ELSE {round(_SAMPLE_DEFAULT * 10000)} END)
"""


def _q_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size eval-set draw: exactly 3 docs per (source) stratum in
    deterministic md5-hash order — same rows on any engine/layout."""
    d = _t(spark, sf_dir, "documents")
    out = _Q.take_per_stratum(d, "doc_id", "source", 3, out_rank="draw_rank")
    return out.select("source", "draw_rank", "doc_id", "lang")


def _sql_eval_sample() -> str:
    h = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
WITH ranked AS (
  SELECT source, doc_id, lang,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS draw_rank
  FROM documents)
SELECT source, CAST(draw_rank AS INT) AS draw_rank, doc_id, lang
FROM ranked WHERE draw_rank <= 3
"""


def _q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram for batch-shape planning: power-of-two
    n_chars buckets per source (bit-exact bucket labels)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "source", _Q.pow2_length_bucket(F.col("n_chars")).alias("len_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


_SQL_LENGTH_BUCKETS = """
SELECT source,
  CASE WHEN n_chars <= 0 THEN 0
       ELSE CAST(power(2.0, length(bin(CAST(n_chars AS BIGINT))) - 1) AS BIGINT)
  END AS len_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# token-payload suite: vocabulary histogram, packed-batch rollup, per-session
# token throughput (the north rule's payload is pre-tokenized sequences)
# --------------------------------------------------------------------------


def _q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary histogram over the pre-tokenized sequences: explode the
    tokens array, one keyed agg (map-side combine collapses the explode
    blow-up before the exchange — at 10^12 sequences the shuffle carries
    |vocab| × partials, not one row per token occurrence)."""
    seq = _sequences_from_events(spark, sf_dir)
    return (
        seq.select(
            "doc_id", "n_tok", F.explode("tokens").alias("token")
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_ntok"),
        )
    )


_SQL_TOKEN_VOCAB = """
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(event_id % 31 + 2 AS INT) AS n_tok
  FROM events),
t AS (SELECT doc_id, n_tok, unnest(generate_series(1, n_tok)) AS token FROM s)
SELECT CAST(token AS INT) AS token,
  CAST(COUNT(*) AS BIGINT) AS n_seqs,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS sum_ntok
FROM t GROUP BY token
"""


def _q_packed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-shape report over the bin-packed corpus: per (lang, bin), doc
    count, payload total, fill ratio vs the bin cap, and the ordered member
    list — the manifest a downstream trainer reads to schedule batches."""
    d = _t(spark, sf_dir, "documents")
    packed = with_bin_id(
        d,
        payload_col="n_chars",
        order_cols=["doc_id"],
        group_cols=["lang"],
        target_payload_per_bin=BIN_CAP,
        mix=False,
        out="bin_id",
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("payload"),
        F.round(F.sum("n_chars") / F.lit(BIN_CAP), 6).alias("fill_ratio"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("members"),
    )


_SQL_PACKED_ROLLUP = f"""
WITH packed AS (
  SELECT doc_id, lang, n_chars,
    CAST(FLOOR(GREATEST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - 1, 0)
/ {BIN_CAP}) AS INT) AS bin_id
  FROM documents)
SELECT lang, bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS payload,
  ROUND(SUM(n_chars) / {BIN_CAP}, 6) AS fill_ratio,
  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
FROM packed GROUP BY lang, bin_id
"""


def _q_session_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session token throughput: gap-sessionize, then sum the session's
    token payload — the unit a streaming trainer consumes. One window pass
    + one keyed agg, both partitioned by the same user key (no extra
    exchange between them)."""
    ev = _t(spark, sf_dir, "events")
    sid = with_session_id(
        ev, keys=["user_id"], ts="ts", order=["ts", "event_id"], gap_sec=EV_GAP_SEC
    )
    from audio_feature_extraction_spark.plans.from_events import n_tok_of

    n_tok = n_tok_of("event_id")
    return (
        sid.withColumn("n_tok", n_tok)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tok").cast("long").alias("session_tokens"),
            F.max("n_tok").alias("max_ntok"),
        )
    )


_SQL_SESSION_TOKEN_STATS = f"""
WITH gaps AS (
  SELECT event_id, user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_WU}) > {EV_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events),
sess AS (
  SELECT event_id, user_id,
    CAST(SUM(is_new) OVER ({_WU} ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS session_id,
    CAST(event_id % 31 + 2 AS INT) AS n_tok
  FROM gaps)
SELECT user_id, session_id,
  CAST(COUNT(*) AS BIGINT) AS n_seqs,
  CAST(SUM(n_tok) AS BIGINT) AS session_tokens,
  MAX(n_tok) AS max_ntok
FROM sess GROUP BY user_id, session_id
"""


def _q_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessions split into fixed panes when they exceed a max duration
    (4 h cap on 8 h-gap sessions): one shuffle, exact-µs pane arithmetic."""
    from audio_feature_extraction_spark.operators.sessionize import (
        with_capped_session_id,
    )

    ev = _t(spark, sf_dir, "events")
    out = with_capped_session_id(
        ev,
        keys=["user_id"],
        ts="ts",
        order=["ts", "event_id"],
        gap_sec=EV_GAP_SEC,
        max_duration_sec=14_400.0,
    )
    return out.select("event_id", "user_id", "session_id", "sub_session")


_SQL_CAPPED_SESSIONS = f"""
WITH gaps AS (
  SELECT event_id, user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_WU}) > {EV_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events),
sess AS (
  SELECT event_id, user_id, ts,
    CAST(SUM(is_new) OVER ({_WU} ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS session_id
  FROM gaps),
anchored AS (
  SELECT *,
    epoch_us(ts) - MIN(epoch_us(ts))
      OVER (PARTITION BY user_id, session_id) AS diff
  FROM sess)
SELECT event_id, user_id, session_id,
  CAST((diff - (diff % 14400000000)) / 14400000000 AS BIGINT) AS sub_session
FROM anchored
"""


def _q_region_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-flavored 5-way star join (J1 breadth: lineitem ⋈ supplier ⋈
    nation ⋈ region ⋈ part): revenue per (region, brand). All three
    dimension chains are broadcast (supplier/nation/region/part are dims);
    the fact table streams through one hash-agg — at 100 TB the only
    exchange is the final (region, brand) combine. Exact DECIMAL money."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = (
        d2("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "r_name")
    )
    return (
        l.join(dim, l.l_suppkey == dim.s_suppkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("r_name", "p_brand")
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.sum(d2("l_quantity")).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_SQL_REGION_PART_REVENUE = """
SELECT r_name, p_brand,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
       AS revenue,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
  COUNT(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON l_partkey = p_partkey
GROUP BY r_name, p_brand
"""


PACK_CAP = 512  # tokens per packed training batch (n_tok is 2..32 here)


def _q_packed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer-facing packed batches: bin-pack the pre-tokenized sequences
    by cumulative n_tok per source, then emit per (source, bin) the packed
    stream's integrity fingerprint — md5 over the concatenated token CSVs in
    (doc_id, seq) order — plus row/token totals. The fingerprint is the
    per-partition lineage checksum a resumable 10^12-sequence run verifies
    against (north rule: per-partition lineage manifests; the checkpoint
    sink computes the same kind of digest)."""
    seq = _sequences_from_events(spark, sf_dir)
    packed = with_bin_id(
        seq,
        payload_col="n_tok",
        order_cols=["doc_id", "seq"],
        group_cols=["source"],
        target_payload_per_bin=PACK_CAP,
        mix=False,
        out="bin_id",
    )
    csv = F.array_join(F.col("tokens").cast("array<string>"), ",")
    return (
        packed.withColumn("_csv", csv)
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tok").cast("long").alias("batch_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("doc_id"), F.col("seq"), F.col("_csv")
                                )
                            )
                        ),
                        lambda s: s["_csv"],
                    ),
                    ",",
                )
            ).alias("pack_md5"),
        )
    )


_SQL_PACKED_TOKENS = f"""
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         CAST(event_id AS INT) AS seq,
         CAST(event_id % 31 + 2 AS INT) AS n_tok,
         'src' || CAST(user_id % 4 AS VARCHAR) AS source
  FROM events),
packed AS (
  SELECT *,
    CAST(FLOOR(GREATEST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id, seq
                                 ROWS UNBOUNDED PRECEDING) - 1, 0)
/ {PACK_CAP}) AS INT) AS bin_id,
    array_to_string(list_transform(generate_series(1, n_tok),
                                   x -> CAST(x AS VARCHAR)), ',') AS csv
  FROM s)
SELECT source, bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_seqs,
  CAST(SUM(n_tok) AS BIGINT) AS batch_tokens,
  md5(string_agg(csv, ',' ORDER BY doc_id, seq)) AS pack_md5
FROM packed GROUP BY source, bin_id
"""


def _q_ann_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/BLAS twin of ann_cosine_topk: broadcast query matrix, one
    matmul per corpus batch, margin-guarded per-batch cut, global window
    top-k. Rank on round(cos,6) + id on both engines (summation-order
    robustness — see similarity.brute_force_topk_arrow)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _S.brute_force_topk_arrow(emb, queries, k=10)


_SQL_ANN_TOPK_ARROW = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
    ROUND(list_sum(list_transform(list_zip(q.qe, v.e), x -> x[1] * x[2]))
      / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
       * sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6) AS cos
  FROM v, q WHERE v.vec_id != q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, cos
FROM ranked WHERE rank <= 10
"""


def _q_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value ranking family (§2.5): percent_rank, cume_dist and
    quartile ntile over (user, value, event_id-tiebroken) order — one
    window pass, standard SQL semantics shared by both engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


_SQL_RANK_STATS = """
SELECT event_id, user_id,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 6) AS cume,
  CAST(NTILE(4) OVER w AS INT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
"""


def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON composition both directions: parse the props JSON column
    (get_json_object → typed), aggregate, and re-emit a canonical compact
    JSON summary string (to_json(struct(...)) — byte-identical to DuckDB's
    json_object, both engines print compact key-insertion-order JSON)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    agg = ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.max("k").alias("max_k"),
    )
    return agg.withColumn(
        "summary",
        F.to_json(
            F.struct(F.col("event_type").alias("t"), F.col("max_k").alias("mx"))
        ),
    )


_SQL_JSON_PROPS = """
WITH k AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  ROUND(AVG(k), 6) AS avg_k,
  MAX(k) AS max_k,
  CAST(json_object('t', event_type, 'mx', MAX(k)) AS VARCHAR) AS summary
FROM k GROUP BY event_type
"""


def _q_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, 1 h tumbling event-time window) — batch twin
    of streaming dropDuplicatesWithinWatermark (bounded-state dedup)."""
    ev = _t(spark, sf_dir, "events")
    out = _D.first_per_window(
        ev, keys=["user_id"], ts="ts", window_sec=3600.0, tiebreak=["event_id"]
    )
    return out.select("event_id", "user_id", "win_start_us")


_SQL_WINDOWED_DEDUP = """
WITH b AS (
  -- floor-division bucketing (like _SQL_TUMBLING_COUNTS): DuckDB % is a
  -- sign-following remainder, which would disagree with Spark's pmod for
  -- pre-1970 (negative epoch_us) timestamps
  SELECT event_id, user_id, ts,
         (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us
  FROM events),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, win_start_us ORDER BY ts, event_id) AS rn
  FROM b)
SELECT event_id, user_id, win_start_us FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# exact banded weighted DTW (J4's exact-kernel form,
# 05_dtw_alignment_experiment/dtw_alignment.py:930-1090)
# --------------------------------------------------------------------------

_DTW_CAP = 12       # frames per side (keeps the oracle's DP ~n*m cells/pair)
_DTW_BAND = 6.0     # Sakoe-Chiba band on slope-scaled |i - j*n/m|
_DTW_DW = 0.9       # diagonal step weight (diagonal-preferring, like the ref)
_DTW_SW = 1.1       # vertical/horizontal step weight


def _q_dtw_band_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-pair banded weighted-DTW distance (the alignment kernel the
    as-of join replaces when only point-in-time matches are needed; ref
    `05_dtw_alignment_experiment/dtw_alignment.py:930-1090`). Per user:
    left = first 12 'click' values, right = first 12 'view' values in
    event-time order; euclidean local cost computed exactly as the Arrow
    kernel does (sqrt(max(a²+b²-2ab, 0))); diagonal-preferring weights.
    The DuckDB oracle replays the identical DP as a recursive CTE over
    anti-diagonals, so the gate is exact — operations run in the same IEEE
    order on both engines."""
    from audio_feature_extraction_spark.operators.dtw import dtw_join

    def side(event_type: str) -> DataFrame:
        # fresh scan per call: all four derivations below would otherwise
        # share lineage and trip Spark's ambiguous-self-join analyzer
        return (
            _t(spark, sf_dir, "events")
            .where(F.col("event_type") == event_type)
            .select(
                "user_id",
                "value",
                F.row_number().over(_uw()).alias("seq"),
            )
            .where(F.col("seq") <= _DTW_CAP)
        )

    left, right = side("click"), side("view")
    # restrict to pair keys present on BOTH sides (the oracle's pair list);
    # one-sided keys are dtw_join's NULL-distance path, tested in test_dtw
    common = side("click").select("user_id").distinct().join(
        side("view").select("user_id").distinct(), "user_id"
    )
    out = dtw_join(
        left.join(F.broadcast(common), "user_id"),
        right.join(F.broadcast(common), "user_id"),
        on=["user_id"],
        order_col="seq",
        feature_cols=["value"],
        diag_weight=_DTW_DW,
        step_weight=_DTW_SW,
        band=int(_DTW_BAND),
    )
    return out.select(
        "user_id",
        "n",
        "m",
        F.round("dtw_dist", 6).alias("dtw_dist"),
        F.round("dtw_norm", 6).alias("dtw_norm"),
    )


# The oracle's DP: one recursive-CTE iteration per anti-diagonal. Each
# working row is an acc cell aged 0 (newest diagonal) or 1 (one behind);
# every row emits its successor CONTRIBUTIONS (up/left × step weight from
# age-0, diagonal × diag weight from age-1) plus a one-iteration self-copy,
# and the new diagonal's cells are min-aggregated contributions + local
# cost. Cells outside the band/bounds simply never exist (= +inf), exactly
# like the kernel's banded skip.
_SQL_DTW_BAND_COST = f"""
WITH RECURSIVE
lf AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER ({_WU}) AS seq
  FROM events WHERE event_type = 'click'),
rf AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER ({_WU}) AS seq
  FROM events WHERE event_type = 'view'),
l AS (SELECT * FROM lf WHERE seq <= {_DTW_CAP}),
r AS (SELECT * FROM rf WHERE seq <= {_DTW_CAP}),
pairs AS (
  SELECT l.user_id, max(l.seq)::INT AS n, max(r.seq)::INT AS m
  FROM (SELECT DISTINCT user_id, seq FROM l) l
  JOIN (SELECT DISTINCT user_id, seq FROM r) r USING (user_id)
  GROUP BY l.user_id),
cost AS (
  SELECT p.user_id, p.n, p.m, l.seq AS i, r.seq AS j,
         sqrt(greatest((l.value*l.value + r.value*r.value)
                       - 2.0*(l.value*r.value), 0.0)) AS c
  FROM pairs p
  JOIN l ON l.user_id = p.user_id
  JOIN r ON r.user_id = p.user_id
  WHERE abs(l.seq - r.seq * (p.n::DOUBLE / p.m)) <= {_DTW_BAND}),
dp AS (
  SELECT user_id, n, m, 0 AS i, 0 AS j, 0.0::DOUBLE AS acc, 1 AS age
  FROM pairs
  UNION ALL
  SELECT t.user_id, t.n, t.m, t.ti AS i, t.tj AS j,
         CASE WHEN t.kind = 'c' THEN c.c + min(t.val) ELSE min(t.val) END
           AS acc,
         CASE WHEN t.kind = 'c' THEN 0 ELSE 1 END AS age
  FROM (
    SELECT d.user_id, d.n, d.m, u.x.ti AS ti, u.x.tj AS tj,
           u.x.val AS val, u.x.kind AS kind
    FROM dp d, UNNEST(
      CASE WHEN d.age = 0 THEN
        [struct_pack(ti := d.i + 1, tj := d.j,
                     val := d.acc * {_DTW_SW}::DOUBLE, kind := 'c'),
         struct_pack(ti := d.i, tj := d.j + 1,
                     val := d.acc * {_DTW_SW}::DOUBLE, kind := 'c')]
        || CASE WHEN d.i + d.j + 1 <= d.n + d.m
                THEN [struct_pack(ti := d.i, tj := d.j,
                                  val := d.acc, kind := 'k')]
                ELSE [] END
      ELSE
        [struct_pack(ti := d.i + 1, tj := d.j + 1,
                     val := d.acc * {_DTW_DW}::DOUBLE, kind := 'c')]
      END) u(x)
  ) t
  LEFT JOIN cost c
    ON t.kind = 'c' AND c.user_id = t.user_id AND c.i = t.ti AND c.j = t.tj
  WHERE t.kind = 'k' OR c.c IS NOT NULL
  GROUP BY t.user_id, t.n, t.m, t.ti, t.tj, t.kind, c.c)
SELECT p.user_id, p.n, p.m,
       ROUND(COALESCE(min(d.acc), 'infinity'::DOUBLE), 6) AS dtw_dist,
       ROUND(COALESCE(min(d.acc), 'infinity'::DOUBLE) / (p.n + p.m), 6)
         AS dtw_norm
FROM pairs p
LEFT JOIN dp d ON d.user_id = p.user_id AND d.i = p.n AND d.j = p.m
GROUP BY p.user_id, p.n, p.m
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict ORDER matters: the driver's correctness gate hashes the FIRST 50
    entries. r03 rotation — the head is (a) one regression canary per
    already-driver-proven family (flagship, aggs, windows, as-of, joins,
    dedup, ANN, multimodal, cube, text), then (b) every query that had only
    a local judge-verified gate through r02 (plus the new dtw_band_cost),
    so each earns a driver-green row. The tail (entries 51+) is r02
    driver-proven work, still covered by tools/check_entry.py locally."""
    return {
        # -- canaries: one per driver-proven family (r02 green) ------------
        "pipeline_features": _pipeline_scalar,
        "pricing_summary": _q_pricing_summary,
        "grouped_stats": _q_grouped_stats,
        "percentiles": _q_percentiles,
        "delta9": _q_delta9,
        "rolling_median": _q_rolling_median,
        "savgol_smooth": _q_savgol,
        "running_totals": _q_running_totals,
        "top1_per_group": _q_top1_per_group,
        "locf_fill": _q_locf_fill,
        "sessionize": _q_sessionize,
        "asof_range_merge": _q_asof("range_merge"),
        "equi_join_fanout": _q_equi_join_fanout,
        "anti_join": _q_anti_join,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_exact": _q_dedup_exact,
        "ann_cosine_topk": _q_ann_topk,
        "ann_ivf_topk": _q_ivf_topk,
        "ann_lsh_topk": _q_lsh_topk,
        "media_features": _q_media_features,
        "cube_report": _q_cube_report,
        "text_features": _q_text_features,
        # -- new this round ------------------------------------------------
        "dtw_band_cost": _q_dtw_band_cost,
        "dedup_clusters": _q_dedup_clusters,
        # -- r02 judge-verified tail rotated in for driver-green rows ------
        "band_join": _q_band_join,
        "tumbling_counts": _q_tumbling_counts,
        "sliding_counts": _q_sliding_counts,
        "token_slice": _q_token_slice,
        "emb_neardup": _q_emb_neardup,
        "binpack_assign": _q_binpack_assign,
        "delta9_centered": _q_delta9_centered,
        "delta9_second": _q_delta9_second,
        "time_range_stats": _q_time_range_stats,
        "grouping_sets_report": _q_grouping_sets,
        "pivot_report": _q_pivot_report,
        "doc_repetition": _q_doc_repetition,
        "contamination": _q_contamination,
        "stratified_sample": _q_stratified_sample,
        "length_buckets": _q_length_buckets,
        "token_vocab": _q_token_vocab,
        "packed_rollup": _q_packed_rollup,
        "session_token_stats": _q_session_token_stats,
        "windowed_dedup": _q_windowed_dedup,
        "json_props": _q_json_props,
        "rank_stats": _q_rank_stats,
        "ann_topk_arrow": _q_ann_topk_arrow,
        "packed_tokens": _q_packed_tokens,
        "region_part_revenue": _q_region_part_revenue,
        "capped_sessions": _q_capped_sessions,
        "eval_sample": _q_eval_sample,
        # ------------------- 50-entry driver-gate cap ---------------------
        # tail: r02 driver-proven, covered locally by tools/check_entry.py
        "corpus_stats": _q_corpus_stats,
        "bool_rates": _q_bool_rates,
        "missing_rate": _q_missing_rate,
        "quality_score": _q_quality_score,
        "session_stats": _q_session_stats,
        "lag_lead_delta": _q_lag_lead_delta,
        "rolling_stats": _q_rolling_stats,
        "preemph_zcr": _q_preemph_zcr,
        "asof_backward": _q_asof("window"),
        "asof_salted": _q_asof("salted"),
        "asof_broadcast": _q_asof("broadcast"),
        "asof_broadcast_arrow": _q_asof("broadcast_arrow"),
        "asof_forward": _q_asof("window", direction="forward"),
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "simhash_signatures": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "frame_sample": _q_frame_sample,
        "trim_active": _q_trim_active,
        "gate_clip": _q_gate_clip,
        "robust_norm": _q_robust_norm,
        "snr_stability": _q_snr_stability,
        "value_histogram": _q_value_histogram,
        "rollup_report": _q_rollup_report,
        "vector_kernel_stats": _q_vector_kernel,
        "count_distinct": _q_count_distinct,
        "gauss_smooth": _q_gauss_smooth,
        "union_distinct": _q_union_distinct,
        "intersect_users": _q_intersect_users,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": _SQL_PRICING,
        "grouped_stats": _SQL_GROUPED_STATS,
        "percentiles": _SQL_PERCENTILES,
        "bool_rates": _SQL_BOOL_RATES,
        "missing_rate": _SQL_MISSING_RATE,
        "corpus_stats": _SQL_CORPUS_STATS,
        "quality_score": _SQL_QUALITY_SCORE,
        "sessionize": _SQL_SESSIONIZE,
        "session_stats": _SQL_SESSION_STATS,
        "locf_fill": _SQL_LOCF_FILL,
        "lag_lead_delta": _SQL_LAG_LEAD_DELTA,
        "delta9": _SQL_DELTA9,
        "rolling_stats": _SQL_ROLLING_STATS,
        "rolling_median": _SQL_ROLLING_MEDIAN,
        "savgol_smooth": _sql_savgol(),
        "preemph_zcr": _SQL_PREEMPH_ZCR,
        "running_totals": _SQL_RUNNING_TOTALS,
        "top1_per_group": _SQL_TOP1,
        "asof_backward": _SQL_ASOF_BACKWARD,
        "asof_salted": _SQL_ASOF_BACKWARD,
        "asof_range_merge": _SQL_ASOF_BACKWARD,
        "asof_broadcast": _SQL_ASOF_BACKWARD,
        "asof_broadcast_arrow": _SQL_ASOF_BACKWARD,
        "asof_forward": _SQL_ASOF_FORWARD,
        "equi_join_fanout": _SQL_EQUI_JOIN_FANOUT,
        "anti_join": _SQL_ANTI_JOIN,
        "pipeline_features": _SQL_PIPELINE,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "dedup_ngram_jaccard": _sql_jaccard(NGRAM_DF_CAP),
        "dedup_minhash_lsh": _SQL_JACCARD_BASE,
        "simhash_signatures": _sql_simhash(),
        "simhash_pairs": _sql_simhash_pairs(),
        "text_features": _sql_text_features(),
        "ann_cosine_topk": _SQL_ANN_TOPK,
        "frame_sample": _SQL_FRAME_SAMPLE,
        "trim_active": _SQL_TRIM_ACTIVE,
        "gate_clip": _SQL_GATE_CLIP,
        "robust_norm": _SQL_ROBUST_NORM,
        "snr_stability": _SQL_SNR_STABILITY,
        "value_histogram": _SQL_VALUE_HISTOGRAM,
        "rollup_report": _SQL_ROLLUP_REPORT,
        "cube_report": _SQL_CUBE_REPORT,
        "vector_kernel_stats": _SQL_VECTOR_KERNEL,
        "count_distinct": _SQL_COUNT_DISTINCT,
        "gauss_smooth": _sql_gauss(),
        "union_distinct": _SQL_UNION_DISTINCT,
        "intersect_users": _SQL_INTERSECT_USERS,
        "band_join": _SQL_BAND_JOIN,
        "tumbling_counts": _SQL_TUMBLING_COUNTS,
        "sliding_counts": _SQL_SLIDING_COUNTS,
        "token_slice": _SQL_TOKEN_SLICE,
        "emb_neardup": _sql_emb_neardup(),
        "binpack_assign": _SQL_BINPACK_ASSIGN,
        "delta9_centered": _SQL_DELTA9_CENTERED,
        "delta9_second": _SQL_DELTA9_SECOND,
        "time_range_stats": _SQL_TIME_RANGE_STATS,
        "grouping_sets_report": _SQL_GROUPING_SETS,
        "pivot_report": _SQL_PIVOT_REPORT,
        "ann_lsh_topk": _sql_ann_lsh(),
        "ann_ivf_topk": _sql_ann_ivf(),
        "media_features": _sql_media_features(),
        "doc_repetition": _SQL_DOC_REPETITION,
        "contamination": _SQL_CONTAMINATION,
        "stratified_sample": _sql_stratified_sample(),
        "length_buckets": _SQL_LENGTH_BUCKETS,
        "token_vocab": _SQL_TOKEN_VOCAB,
        "packed_rollup": _SQL_PACKED_ROLLUP,
        "session_token_stats": _SQL_SESSION_TOKEN_STATS,
        "windowed_dedup": _SQL_WINDOWED_DEDUP,
        "json_props": _SQL_JSON_PROPS,
        "rank_stats": _SQL_RANK_STATS,
        "ann_topk_arrow": _SQL_ANN_TOPK_ARROW,
        "packed_tokens": _SQL_PACKED_TOKENS,
        "region_part_revenue": _SQL_REGION_PART_REVENUE,
        "capped_sessions": _SQL_CAPPED_SESSIONS,
        "eval_sample": _sql_eval_sample(),
        "dtw_band_cost": _SQL_DTW_BAND_COST,
        "dedup_clusters": _sql_dedup_clusters(),
    }
