"""Gap-based sessionization and per-session statistics.

Split out of __spark_entry__.py (registry-only now); see that module's
docstring for the cross-engine oracle conventions all queries follow."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from audio_feature_extraction_spark.operators.sessionize import session_bounds
from audio_feature_extraction_spark.operators.sessionize import with_session_id
from audio_feature_extraction_spark.operators.timeutil import ts_micros
from .common import EV_GAP_SEC, EV_GAP_US, _WU, _t


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
