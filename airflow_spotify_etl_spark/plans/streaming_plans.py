"""Batch-checkable projections of the streaming surface (SURVEY.md §2.9).

The live Structured Streaming jobs (watermarks, cross-batch dedup,
checkpointed cursors) are in ``streaming/`` and are exercised by pytest;
these queries verify the WINDOW SEMANTICS themselves against the SQL oracle
on the static ``events`` table — same aggregation logic the streaming jobs
run per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.files import load_table

__all__ = ["QUERIES", "ORACLES"]


def q30_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative gap counter (ST6 session-window
    analog; the streaming path uses ``session_window`` — see
    streaming/pipelines.py). One shuffle on user_id; the session assignment
    is a sort within partitions, same cost shape as the as-of join."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    sessions = ev.withColumn(
        "is_new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_new_session").alias("n_sessions"),
        )
        .orderBy("user_id")
    )


_Q30_SQL = """
SELECT user_id, count(*) AS n_events, CAST(sum(is_new_session) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


def q31_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows via ``F.window`` — the exact
    grouping the streaming job uses with a watermark (ST6,
    streaming/pipelines.py). Epoch-aligned windows == date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # Decimal sum: exact and order-independent, so the hash is
            # stable across engines and runs (see plans/relational._dec).
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start_us", "event_type")
    )


_Q31_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*)             AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start_us, event_type
"""


def q32_dedup_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 cross-batch dedup semantics as a batch query: keep each user's
    latest event (dropDuplicates-by-key ≡ row_number()=1 over recency)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type")
        .orderBy("user_id")
    )


_Q32_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


QUERIES = {
    "q30_sessionization": q30_sessionization,
    "q31_hourly_windows": q31_hourly_windows,
    "q32_dedup_latest_per_user": q32_dedup_latest_per_user,
}

ORACLES = {
    "q30_sessionization": _Q30_SQL,
    "q31_hourly_windows": _Q31_SQL,
    "q32_dedup_latest_per_user": _Q32_SQL,
}
