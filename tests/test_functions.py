"""Scalar-function + sink-helper unit tests (P5-P12, K1 path handling)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_spotify_etl_spark.functions.datetime_fns import (
    iso_date_prefix,
    lenient_to_date,
)
from airflow_spotify_etl_spark.functions.strings import (
    duration_mmss,
    parse_bool_flag,
    url_encode_col,
)
from airflow_spotify_etl_spark.sinks.writers import normalize_object_store_path


def test_lenient_to_date_handles_all_precisions(spark):
    """§1.2: release_date arrives as YYYY, YYYY-MM, or YYYY-MM-DD."""
    df = spark.createDataFrame(
        [("2024",), ("2024-06",), ("2024-06-15",), ("garbage",), (None,)],
        "raw string",
    )
    got = [r.d for r in df.select(lenient_to_date("raw").alias("d")).collect()]
    assert got == [
        dt.date(2024, 1, 1),
        dt.date(2024, 6, 1),
        dt.date(2024, 6, 15),
        None,
        None,
    ]


def test_duration_mmss_matches_reference_divmod(spark):
    """P8 — new.py:170: ms // 60000 and (ms % 60000) // 1000, zero-padded."""
    df = spark.createDataFrame([(200000,), (59999,), (60000,), (0,)], "ms long")
    got = [r.s for r in df.select(duration_mmss("ms").alias("s")).collect()]
    assert got == ["3:20", "0:59", "1:00", "0:00"]


def test_url_encode_matches_reference_quoting(spark):
    """P7 — spotify_etl.py:108 percent-encodes the artist query."""
    df = spark.createDataFrame([("Ed Sheeran & Co/",)], "name string")
    got = df.select(url_encode_col("name").alias("e")).collect()[0]["e"]
    assert "Ed" in got and " " not in got and "&" not in got and "/" not in got


def test_iso_date_prefix(spark):
    df = spark.createDataFrame([("2024-01-01T10:00:00.000Z",)], "ts string")
    assert df.select(iso_date_prefix("ts").alias("d")).collect()[0]["d"] == "2024-01-01"


def test_parse_bool_flag_reference_idiom():
    assert parse_bool_flag("true") and parse_bool_flag(" True ")
    assert not parse_bool_flag("false") and not parse_bool_flag("yes")
    assert parse_bool_flag(None, default=True)
    assert not parse_bool_flag(None)


def test_s3_paths_rewrite_to_s3a():
    assert normalize_object_store_path("s3://bucket/key.csv") == "s3a://bucket/key.csv"
    assert normalize_object_store_path("/local/path") == "/local/path"
    assert normalize_object_store_path("s3a://bucket/x") == "s3a://bucket/x"


def test_percentile_approx_twin_tracks_exact(spark, sf_dir):
    """The sketch-mode percentile surface (the 100 TB plan) stays within
    sketch tolerance of the exact sort-based form on real data."""
    from airflow_spotify_etl_spark.plans.relational import q41_value_percentiles

    from airflow_spotify_etl_spark.sources.files import load_table

    exact = {r.event_type: r for r in q41_value_percentiles(spark, sf_dir).collect()}
    approx = {
        r.event_type: r
        for r in q41_value_percentiles(spark, sf_dir, approx=True).collect()
    }
    assert exact.keys() == approx.keys()
    # The sketch guarantee is on RANK (error <= n/accuracy), and
    # percentile_approx returns an actual sample, not an interpolation — so
    # assert the answer lands within +-2 order statistics of the target
    # rank, which stays meaningful even where tail gaps are large relative
    # to the value (sf0.001 groups are ~200 rows: one step at p99 can be
    # tens of percent of the value, so a value-relative bound would be
    # either vacuous or flaky).
    vals: dict[str, list[float]] = {}
    for r in load_table(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for et, a in approx.items():
        xs = sorted(vals[et])
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = q * (len(xs) - 1)
            lo = xs[max(0, int(rank) - 2)]
            hi = xs[min(len(xs) - 1, int(rank) + 3)]
            assert lo - 0.01 <= a[col] <= hi + 0.01, (et, col, a[col], lo, hi)
        assert exact[et].value_stddev == a.value_stddev  # stddev path identical
