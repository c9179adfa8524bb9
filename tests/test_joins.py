"""Unit tests for as-of join + incremental anti-append (SURVEY.md §2.6 J4/J5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_spotify_etl_spark.operators.joins import (
    asof_join,
    asof_join_pandas,
    incremental_anti_append,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(5)), (4, "w", _ts(10))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "u", _ts(10)), (101, "u", _ts(15)), (102, "v", _ts(1))],
        "rid long, k string, rts timestamp",
    )
    return left, right


def test_asof_backward_basic(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right.select("k", "rts", "rid"),
        on=["k"], left_ts="lts", right_ts="rts", right_payload=["rid"],
    )
    got = {r.lid: r.rid for r in out.collect()}
    # lid=1 at t10 matches rid=100 (same-ts counts), lid=2 at t20 → rid=101,
    # lid=3 at t5 → no prior right row, lid=4 key 'w' → no right rows.
    assert got == {1: 100, 2: 101, 3: None, 4: None}


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _sides(spark)
    a = asof_join(
        left, right.select("k", "rts", "rid"),
        on=["k"], left_ts="lts", right_ts="rts", right_payload=["rid"],
    ).select("lid", "rid")
    b = asof_join_pandas(left, right, on="k", left_ts="lts", right_ts="rts").select(
        "lid", "rid"
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_asof_rejects_column_collision(spark):
    left, right = _sides(spark)
    import pytest

    with pytest.raises(ValueError, match="rename"):
        asof_join(
            left.withColumnRenamed("lid", "rid"), right.select("k", "rts", "rid"),
            on=["k"], left_ts="lts", right_ts="rts", right_payload=["rid"],
        )


def test_incremental_anti_append_is_idempotent(spark):
    existing = spark.createDataFrame([(1,), (2,)], "id long")
    new = spark.createDataFrame([(2,), (3,)], "id long")
    out = incremental_anti_append(new, existing, "id")
    assert [r.id for r in out.collect()] == [3]
    # Re-appending the same batch adds nothing (fixes spotify_etl2.py:220
    # double-insert-on-rerun).
    merged = existing.union(out)
    again = incremental_anti_append(new, merged, "id")
    assert again.count() == 0


def test_fuzzy_self_join_finds_planted_variants(spark):
    from airflow_spotify_etl_spark.operators.joins import fuzzy_self_join

    df = spark.createDataFrame(
        [("cold anvil",), ("old anvil",), ("gold anvil",), ("red widget",),
         ("red widget",), ("blue bolt",)],
        "p_name string",
    )
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_self_join(df, "p_name", max_dist=2).collect()
    }
    # Same-noun variants within distance 2; cross-block pairs never compared.
    assert ("cold anvil", "old anvil", 1) in got
    assert ("gold anvil", "old anvil", 1) in got
    assert ("cold anvil", "gold anvil", 1) in got
    assert all("widget" not in a or "widget" not in b or a != b for a, b, _ in got)
    assert not any("bolt" in a and "anvil" in b for a, b, _ in got)


def test_fuzzy_self_join_caps_degenerate_blocks(spark):
    from airflow_spotify_etl_spark.operators.joins import fuzzy_self_join

    # 40 values sharing one noun: with max_block=10 the block is dropped
    # entirely instead of expanding quadratically.
    rows = [(f"v{i:02d} gizmo",) for i in range(40)]
    df = spark.createDataFrame(rows, "p_name string")
    assert fuzzy_self_join(df, "p_name", max_dist=2, max_block=10).count() == 0
    assert fuzzy_self_join(df, "p_name", max_dist=2, max_block=100).count() > 0
