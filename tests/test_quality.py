"""Unit tests for the fused data-quality suite (reference semantics:
spotify_etl2.py:42-86 — empty→warn, dup PK→raise, nulls→warn, late→warn+keep)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from airflow_spotify_etl_spark.operators.quality import assert_quality, quality_report

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


TS = dt.datetime(2024, 1, 15)


def test_clean_batch(spark):
    df = _df(spark, [(1, TS, "a"), (2, TS, "b")])
    row = quality_report(df, "k", "ts").collect()[0]
    assert row.n_rows == 2 and not row.is_empty and row.pk_unique
    assert row.nulls_v == 0 and row.n_late_rows == 0


def test_duplicate_pk_raises(spark):
    df = _df(spark, [(1, TS, "a"), (1, TS, "b")])
    with pytest.raises(ValueError, match="Primary key"):
        assert_quality(df, "k", "ts")


def test_empty_is_warn_not_error(spark):
    df = _df(spark, [])
    assert assert_quality(df, "k", "ts")["status"] == "empty"


def test_nulls_counted_per_column(spark):
    df = _df(spark, [(1, TS, None), (2, None, "b")])
    row = quality_report(df, "k", "ts").collect()[0]
    assert row.nulls_v == 1 and row.nulls_ts == 1 and row.nulls_k == 0


def test_late_rows_counted_and_kept(spark):
    late = TS - dt.timedelta(days=10)
    df = _df(spark, [(1, TS, "a"), (2, late, "b")])
    row = quality_report(df, "k", "ts", freshness_days=7).collect()[0]
    assert row.n_late_rows == 1 and row.n_rows == 2  # warn-and-keep: row stays


def test_integrity_checks_count_planted_violations(spark):
    from airflow_spotify_etl_spark.operators.quality import (
        check_accepted_values,
        check_not_null,
        check_referential,
        check_unique,
        integrity_audit,
    )

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        # pk 1 triplicated (2 extra rows), one NULL status, one bad status,
        # two orphans (fk 9 twice).
        [
            (1, 1, "O"),
            (1, 1, "F"),
            (1, 1, "X"),
            (2, 9, None),
            (3, 9, "O"),
            (4, 2, "P"),
        ],
        "id long, fk long, status string",
    )
    got = {
        r.check: r.n_violations
        for r in integrity_audit(
            [
                check_unique(child, ["id"], "uniq"),
                check_not_null(child, "status", "notnull"),
                check_accepted_values(child, "status", ["O", "F", "P"], "vals"),
                check_referential(child, parent, "fk", "pk", "fk"),
            ]
        ).collect()
    }
    assert got == {"uniq": 2, "notnull": 1, "vals": 1, "fk": 2}


def test_integrity_audit_empty_list_raises(spark):
    import pytest as _pytest

    from airflow_spotify_etl_spark.operators.quality import integrity_audit

    with _pytest.raises(ValueError, match="no checks"):
        integrity_audit([])


def test_check_unique_composite_counts_null_tuples(spark):
    """A NULL inside a composite key is a countable key (SQL tuple
    semantics, the q89 oracle's count(DISTINCT (a,b))) — not a row that
    silently disappears from the distinct count."""
    from airflow_spotify_etl_spark.operators.quality import check_unique

    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 2)], "a long, b long"
    )
    got = check_unique(df, ["a", "b"], "pk").collect()[0]
    assert got.n_violations == 1  # (1,NULL) duplicated once; (2,2) unique


def test_rate_anomalies_flags_planted_spike(spark):
    """Steady 10/hour for 10 hours, then a 100-event spike: only the
    spike hour is flagged; the series head (no baseline) never is; the
    flag decision is the exact integer cross-multiply."""
    import datetime as dt

    from airflow_spotify_etl_spark.operators.quality import rate_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(10):
        for _ in range(10):
            rows.append((eid, base + dt.timedelta(hours=h), "click"))
            eid += 1
    for _ in range(100):  # hour 10: the spike
        rows.append((eid, base + dt.timedelta(hours=10), "click"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {r.hour_ts: r for r in rate_anomalies(df).collect()}
    flagged = [k for k, r in out.items() if r.is_anomaly]
    assert flagged == ["2024-01-01 10:00:00"]
    spike = out["2024-01-01 10:00:00"]
    # all 8 lags exist and equal 10 → num = 10*255, den = 255, ratio 10
    assert spike.baseline_den == 255 and spike.baseline_num == 2550
    assert spike.rate_ratio == 10.0
    head = out["2024-01-01 00:00:00"]
    assert head.baseline_den == 0 and not head.is_anomaly


def test_rate_anomalies_shrinking_head_baseline(spark):
    """At hour 1 only lag-1 exists: den = the single heaviest weight,
    and a 3x jump there IS flagged (the fraction, not a padded zero
    baseline, decides)."""
    import datetime as dt

    from airflow_spotify_etl_spark.operators.quality import rate_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, "buy") for i in range(10)]
    rows += [(100 + i, base + dt.timedelta(hours=1), "buy") for i in range(40)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {r.hour_ts: r for r in rate_anomalies(df).collect()}
    h1 = out["2024-01-01 01:00:00"]
    assert h1.baseline_den == 128 and h1.baseline_num == 10 * 128
    assert h1.is_anomaly  # 40 > 3 x 10


def test_k_anonymity_flags_small_classes(spark):
    """Planted quasi-identifier classes: the singleton is flagged, the
    big class is not, and the table-level anonymity equals the smallest
    class size."""
    from pyspark.sql import functions as F

    rows = [(i, "en", "s1", 150) for i in range(10)]
    rows += [(100, "fr", "s2", 950)]  # a singleton QI class
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )
    qi = df.select(
        "lang", "source", (F.floor(F.col("n_chars") / 100) * 100).alias("len_bucket")
    )
    classes = qi.groupBy("lang", "source", "len_bucket").agg(
        F.count("*").alias("class_size")
    )
    level = classes.agg(F.min("class_size").alias("anonymity_level"))
    out = {
        (r.lang, r.source): r
        for r in classes.crossJoin(F.broadcast(level))
        .withColumn("below_k", F.col("class_size") < 5)
        .collect()
    }
    assert out[("fr", "s2")].below_k and out[("fr", "s2")].class_size == 1
    assert not out[("en", "s1")].below_k
    assert out[("en", "s1")].anonymity_level == 1
def test_expectations_one_pass_and_semantics(spark):
    """All six check kinds verified on planted data, and the whole suite
    must compile into ONE aggregate over one scan (no per-check jobs)."""
    from airflow_spotify_etl_spark.operators.expectations import (
        expectations_report, in_range, in_set, matches, min_rows,
        not_null, unique,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5, "ok"),
            (2, "a", -1, "ok"),        # dup 'a'; -1 out of range
            (None, "b", 50, "bad!"),   # null id; pattern violation
            (4, None, 2000, "ok"),     # null v (not a set violation); range
        ],
        "id long, v string, x long, s string",
    )
    suite = [
        not_null("id"), unique("v"), in_range("x", 0, 1000),
        in_set("v", ["a", "b"]), matches("s", "^ok$"), min_rows(10),
    ]
    out = {r.check: (r.n_violations, r.passed) for r in expectations_report(df, suite).collect()}
    assert out["not_null_id"] == (1, False)
    assert out["unique_v"] == (1, False)       # 'a' twice → 1 excess
    assert out["in_range_x"] == (2, False)     # -1 and 2000
    assert out["in_set_v"] == (0, True)        # NULL not a violation
    assert out["matches_s"] == (1, False)
    assert out["min_rows"] == (6, False)       # 10 - 4
    # one scan: the physical plan contains exactly one HashAggregate pair
    rep = expectations_report(df, suite)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    import re as _re
    scans = len(_re.findall(r"Scan ExistingRDD|LocalTableScan", plan))
    assert scans == 1, plan


def test_expectations_all_pass_and_empty(spark):
    from airflow_spotify_etl_spark.operators.expectations import (
        expectations_report, min_rows, not_null,
    )

    df = spark.createDataFrame([(1,)], "id long")
    out = expectations_report(df, [not_null("id"), min_rows(1)]).collect()
    assert all(r.passed for r in out)
    empty = spark.createDataFrame([], "id long")
    out = {r.check: r.n_violations for r in
           expectations_report(empty, [not_null("id"), min_rows(3)]).collect()}
    assert out == {"not_null_id": 0, "min_rows": 3}

