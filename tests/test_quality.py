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
