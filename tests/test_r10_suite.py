"""Hand-computed worked-example pins for round-10 changes. Like the
r8b/r9 suites, every expected value is derived by hand in the
docstring — the DuckDB oracle replays the same formula as the Spark
plan, so planted closed-form fixtures are the only INDEPENDENT check
available in this container (scipy absent, installs forbidden)."""

from __future__ import annotations

import datetime

import pytest

from airflow_spotify_etl_spark.plans import all_queries
from airflow_spotify_etl_spark.sources.files import SCHEMAS


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )


def test_q362_null_ts_rows_excluded(spark, tmp_path, qs):
    """The r8b q362 6-event fixture plus a seventh row with NULL ts:
    the NULL-ts row must be EXCLUDED from the lateness profile (r9
    advice — before the fix it silently landed in '0_on_time'), so
    the tier table is byte-identical to the 6-row case: shares are
    n·10⁶ div 6, not div 7."""
    d = datetime.datetime
    rows = [
        (1, d(2024, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 3, 1, 9, 59, 59, 500000), 2, "view", 1.0, "{}"),
        (3, d(2024, 3, 1, 10, 0, 30), 3, "view", 1.0, "{}"),
        (4, d(2024, 3, 1, 9, 59, 45), 4, "view", 1.0, "{}"),
        (5, d(2024, 3, 1, 9, 0, 0), 5, "view", 1.0, "{}"),
        (6, d(2024, 3, 1, 9, 59, 0), 6, "view", 1.0, "{}"),
        (7, None, 7, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q362_watermark_lateness_audit"](spark, str(tmp_path)).collect()
    got = {r.lateness_tier: (r.n_events, r.share_ppm) for r in out}
    assert got == {
        "0_on_time": (2, 333_333),
        "1_under_1s": (1, 166_666),
        "2_under_1m": (1, 166_666),
        "3_under_1h": (1, 166_666),
        "4_1h_plus": (1, 166_666),
    }


def test_q378_null_ts_rows_excluded(spark, tmp_path, qs):
    """Same fixture: the watermark cost curve's n_events must be 6 at
    every candidate delay (the NULL-ts row can never be 'dropped' at
    any watermark, so counting it deflated every drop_ppm). Lateness
    values are 0/0.5s/0/45s/3630s/90s -> at delay 0 the 4 late rows
    drop (666_666 ppm of 6); at 1s the 3 over-1s rows; at 1m the
    3630s and 90s rows; at 10m and 1h only the 3630s row; the 1h
    bound itself drops it too (3630s > 3600s)."""
    d = datetime.datetime
    rows = [
        (1, d(2024, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, d(2024, 3, 1, 9, 59, 59, 500000), 2, "view", 1.0, "{}"),
        (3, d(2024, 3, 1, 10, 0, 30), 3, "view", 1.0, "{}"),
        (4, d(2024, 3, 1, 9, 59, 45), 4, "view", 1.0, "{}"),
        (5, d(2024, 3, 1, 9, 0, 0), 5, "view", 1.0, "{}"),
        (6, d(2024, 3, 1, 9, 59, 0), 6, "view", 1.0, "{}"),
        (7, None, 7, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q378_watermark_cost_curve"](spark, str(tmp_path)).collect()
    got = {r.delay_us: (r.n_events, r.n_dropped, r.drop_ppm) for r in out}
    assert got == {
        0: (6, 4, 666_666),
        1_000_000: (6, 3, 500_000),
        10_000_000: (6, 3, 500_000),
        60_000_000: (6, 2, 333_333),
        600_000_000: (6, 1, 166_666),
        3_600_000_000: (6, 1, 166_666),
    }
