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

def _q_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-presence report: top-10 user pairs by number of OVERLAPPING
    gap-sessions (plus total overlap µs). The pair generation is the
    bucketed interval-overlap join (operators/rangejoin.py
    interval_overlap_join): one equi-shuffle on a 6 h time bucket,
    exactly-once emission via the first-overlap-bucket filter — never a
    cross product, never a distinct. The session frame is persisted so the
    sessionize window+agg runs once, not once per join side."""
    from audio_feature_extraction_spark.operators.rangejoin import (
        interval_overlap_join,
    )
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    sid = with_session_id(
        ev, keys=["user_id"], ts="ts", order=["ts", "event_id"],
        gap_sec=EV_GAP_SEC,
    )
    sess = (
        session_bounds(sid, keys=["user_id"], ts="ts")
        .select(
            "user_id",
            ts_micros("session_start").alias("s"),
            ts_micros("session_end").alias("e"),
        )
        .persist()
    )
    a = sess.select(
        F.col("user_id").alias("u1"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
    )
    b = sess.select(
        F.col("user_id").alias("u2"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    pairs = interval_overlap_join(
        a, b, "s1", "e1", "s2", "e2",
        bucket_sec=21_600.0,
        extra_cond=F.col("u1") < F.col("u2"),
        # guard is opt-in (the operator default is None to stay a pure
        # lazy builder); this gated query keeps it ON as evidence
        max_fanout_per_row=512,
    )
    agg = pairs.groupBy("u1", "u2").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(
            F.least(F.col("e1"), F.col("e2"))
            - F.greatest(F.col("s1"), F.col("s2"))
        ).cast("long").alias("overlap_us"),
    )
    wnd = Window.orderBy(
        F.col("n_overlaps").desc(), F.col("overlap_us").desc(), "u1", "u2"
    )
    return (
        agg.withColumn("rank", F.row_number().over(wnd))
        .where(F.col("rank") <= 10)
        .select("rank", "u1", "u2", "n_overlaps", "overlap_us")
    )


_SQL_SESSION_OVERLAP = f"""
WITH gaps AS (
  SELECT event_id, user_id, ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_WU}) > {EV_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (
  SELECT user_id, ts,
    CAST(SUM(is_new) OVER ({_WU} ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS session_id
  FROM gaps),
sess AS (
  SELECT user_id, session_id,
         epoch_us(MIN(ts)) AS st, epoch_us(MAX(ts)) AS en
  FROM s GROUP BY 1, 2),
p AS (
  SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS n,
         SUM(LEAST(a.en, b.en) - GREATEST(a.st, b.st)) AS ov
  FROM sess a JOIN sess b
    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
  GROUP BY 1, 2),
r AS (
  SELECT u1, u2, CAST(n AS BIGINT) AS n_overlaps,
         CAST(ov AS BIGINT) AS overlap_us,
         ROW_NUMBER() OVER (
           ORDER BY n DESC, ov DESC, u1, u2) AS rk
  FROM p)
SELECT CAST(rk AS INT) AS rank, u1, u2, n_overlaps, overlap_us
FROM r WHERE rk <= 10
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
