"""Sketch profiling accuracy: HLL distinct within its advertised rsd,
approximate percentiles within rank tolerance of exact, heavy hitters
never miss an above-support value."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_spotify_etl_spark.operators.sketches import (
    approx_profile,
    frequent_values,
)
from airflow_spotify_etl_spark.sources.files import load_table


def test_hll_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = approx_profile(ev, ["user_id", "event_id"], rsd=0.02).collect()[0]
    exact_users = ev.select("user_id").distinct().count()
    exact_events = ev.count()  # event_id is unique
    assert abs(row["user_id_distinct_est"] - exact_users) <= max(
        4, 0.08 * exact_users
    )
    assert abs(row["event_id_distinct_est"] - exact_events) <= 0.08 * exact_events


def test_approx_percentiles_within_rank_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = approx_profile(ev, ["value"], accuracy=10_000).collect()[0]
    p50_est, p95_est, p99_est = row["value_pcts"]
    vals = sorted(r.value for r in ev.select("value").collect())
    n = len(vals)

    def rank_of(x: float) -> float:
        import bisect

        return bisect.bisect_left(vals, x) / n

    # accuracy=10000 → rank error ≤ 1/10000; allow slack for interpolation.
    assert abs(rank_of(p50_est) - 0.50) < 0.02
    assert abs(rank_of(p95_est) - 0.95) < 0.02
    assert abs(rank_of(p99_est) - 0.99) < 0.015


def test_frequent_values_never_miss_above_support(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    reported = frequent_values(ev, ["event_type"], support=0.1).collect()[0][
        "event_type_freqItems"
    ]
    n = ev.count()
    truly_frequent = {
        r.event_type
        for r in ev.groupBy("event_type").count().filter(F.col("count") > 0.1 * n).collect()
    }
    assert truly_frequent <= set(reported)


def test_profile_is_single_pass(spark, sf_dir):
    """N columns × M sketches must stay ONE aggregate over ONE scan."""
    ev = load_table(spark, sf_dir, "events")
    df = approx_profile(ev, ["user_id", "value"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # assert on what ran
    assert plan.count("FileScan parquet") == 1
    # partial + final aggregate, nothing else: one exchange total.
    assert plan.count("Exchange") == 1
