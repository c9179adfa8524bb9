"""Stream-stream joins (ST6 extension): event-time interval join with
bounded state.

The batch as-of join (operators/joins.py) answers "latest click before this
purchase" over static data; this is the live version — purchases join
clicks as both STREAMS arrive. Spark requires watermarks on both sides plus
an event-time range in the join condition; together they let the state
store evict rows once they can no longer match (left rows older than
watermark + max_gap), so state is bounded by the gap window, not the
stream's history — the property that keeps this runnable forever at
cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_stream"]


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: right events with a left event for the same ``on`` key
    whose time precedes them by at most ``max_gap``
    (left_ts <= right_ts <= left_ts + max_gap).

    ``left`` / ``right`` must not share column names besides ``on``
    (rename payloads first). Output carries all columns of both sides with
    one ``on`` column."""
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(f"rename overlapping columns before joining: {overlap}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_gap}")
        )
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{on}"))
