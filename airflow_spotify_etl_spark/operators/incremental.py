"""Incremental materialized-aggregate maintenance.

The reference recomputes its summary statistics from scratch on every daily
run (spotify_etl2.py:271-278 re-scans the full table each batch). At 100 TB
that is the difference between touching yesterday's partition and touching
the whole corpus: an additive rollup (count / sum / min / max — any
commutative monoid) can be maintained by merging the existing snapshot with
partial aggregates of JUST the new rows.

Design:
- The snapshot schema IS the partial-aggregate schema (keys + mergeable
  states), so `merge(snapshot, partials(delta)) == partials(base ∪ delta)`
  by associativity — verified against a full-recompute oracle (q70).
- `merge` is union + re-aggregate: one shuffle bounded by
  |snapshot keys| + |delta rows|, never by the base table size. The base
  table is NOT read at all on the incremental path.
- Averages are derived (sum/count) at read time, never stored — stored
  averages don't merge.
- At scale the snapshot lives as a partitioned table; only key partitions
  present in the delta are rewritten (dynamic partition overwrite), so a
  daily increment touches O(|delta|) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_snapshot", "merge_rollup"]


def rollup_snapshot(events: DataFrame, keys: list[str], value_col) -> DataFrame:
    """Partial-aggregate snapshot: mergeable states per key group.

    ``value_col`` must be an exact (decimal/integer) column expression —
    double sums are order-dependent and would make `merge(snapshot, delta)`
    differ from a full recompute at the last ulp."""
    return events.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(snapshot: DataFrame, delta_partials: DataFrame) -> DataFrame:
    """Merge two partial-aggregate snapshots (monoid combine per key).

    union + re-aggregate: each state column merges with its own combine
    (counts/sums add, min/max fold). Cost is one shuffle over the union of
    key sets — independent of the size of the already-aggregated history.
    """
    keys = [c for c in snapshot.columns if c not in
            ("n_events", "sum_value", "min_value", "max_value")]
    return (
        snapshot.unionByName(delta_partials)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
