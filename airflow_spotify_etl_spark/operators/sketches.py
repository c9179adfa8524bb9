"""Sketch-based profiling: the sub-linear stats path for 100 TB scans.

Exact count-distinct and exact percentiles (q05/q41) shuffle or buffer
per-group value sets — the right answer for the oracle gate, the wrong
plan at corpus scale. This module is the sketch twin the engine exposes
for production profiling:

- ``approx_count_distinct`` — HyperLogLog++: fixed ~1.5 KB of state per
  aggregate regardless of cardinality, mergeable map-side, relative
  standard deviation set by ``rsd``.
- ``percentile_approx`` — Greenwald-Khanna/KLL-style quantile sketch:
  bounded state (``accuracy`` knob trades memory for rank error), again
  mergeable, so a 100 TB percentile is one partial-aggregate pass.
- ``freqItems`` — misra-gries style heavy hitters without a full groupBy.

All three are built-in Catalyst aggregates (JVM-side, partial+final), so
the profile of N columns is ONE scan with map-side combine — the same
single-pass multi-aggregate shape as operators/quality.py, with bounded
memory where the exact forms grow with the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_profile", "frequent_values"]


def approx_profile(
    df: DataFrame,
    value_cols: Sequence[str],
    rsd: float = 0.05,
    percentiles: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """One-row sketch profile of ``value_cols``: HLL distinct estimate and
    approximate percentiles per column, computed in a single pass."""
    aggs = []
    for c in value_cols:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}_distinct_est"))
        aggs.append(
            F.percentile_approx(c, list(percentiles), accuracy).alias(f"{c}_pcts")
        )
    return df.agg(*aggs)


def frequent_values(
    df: DataFrame, cols: Sequence[str], support: float = 0.01
) -> DataFrame:
    """Heavy hitters per column at the given support threshold (built-in
    misra-gries style ``freqItems``): no per-value groupBy shuffle. May
    over-report (false positives) but never misses a value above support —
    the standard sketch contract; follow with an exact count of just the
    reported candidates when exact frequencies are needed."""
    return df.freqItems(list(cols), support)
