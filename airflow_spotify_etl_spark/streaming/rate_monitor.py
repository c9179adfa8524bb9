"""Streaming event-rate monitoring: maintain per-type hourly counts as
a mergeable store and recompute anomaly flags from their sum — the
streaming twin of the oracle-checked q118 batch operator.

Counts are the simplest mergeable state there is (addition), so the
store follows the sketch-maintenance layout: each micro-batch writes
its OWN hourly partial counts under ``batch=<id>`` and a reader sums
partials per (type, hour). foreachBatch retries overwrite their own
partition with identical data — never double-count (the novelty-store
contract). An hour split across micro-batches (late data, restarts)
merges correctly by construction; no watermark is needed because the
state is per-hour counts, not per-event.

At 100 TB: the store grows by (types × hours touched) per batch — tiny
next to the stream — and the flag recompute (`rate_anomalies_hourly`)
runs on hour-cardinality data, so monitoring cost is independent of
event volume beyond the one per-batch count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["run_rate_monitor", "read_rate_flags"]


def _apply_rate_batch(
    bdf: DataFrame,
    store_path: str,
    batch_id: int,
    ts_col: str,
    type_col: str,
) -> None:
    if bdf.isEmpty():
        return
    hourly = bdf.groupBy(
        type_col, F.date_trunc("hour", ts_col).alias("hour_ts")
    ).agg(F.count("*").alias("cnt"))
    hourly.write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")


def run_rate_monitor(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> None:
    """Drain ``stream`` (availableNow), accumulating per-batch hourly
    partial counts into the store."""

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        _apply_rate_batch(bdf, store_path, batch_id, ts_col, type_col)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rate_flags(
    spark: SparkSession,
    store_path: str,
    type_col: str = "event_type",
    factor: int = 3,
    n_lags: int = 8,
) -> DataFrame:
    """Merge the stored partials (one sum across batches) and flag — the
    result is IDENTICAL to running the batch operator on the union of
    every drained event (pytest-pinned: the partial-count merge is
    exact addition, and the flag core is shared code)."""
    from ..operators.quality import rate_anomalies_hourly

    partials = spark.read.parquet(store_path)
    hourly = partials.groupBy(type_col, "hour_ts").agg(
        F.sum("cnt").alias("cnt")
    )
    return rate_anomalies_hourly(hourly, type_col, factor, n_lags)
