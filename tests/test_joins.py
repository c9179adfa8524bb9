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


def test_multitouch_credit_conserves_exactly(spark):
    """Every purchase's credit must sum to exactly 10000 bp whatever its
    touch count — including the k=3 case where 2000 doesn't divide
    evenly and the remainder goes to the earliest middle."""
    import datetime as dt

    from airflow_spotify_etl_spark.plans.relational import (
        q135_multitouch_attribution,
    )
    import os, tempfile

    base = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = []
    eid = 0

    def ev(kind, user, minutes):
        nonlocal eid
        rows.append(
            (eid, base + dt.timedelta(minutes=minutes), user, kind, 1.0, "{}")
        )
        eid += 1

    # user 1: k=5 (middle split 2000 over 3 → 666/666/668-style with rem)
    for m in (-200, -150, -100, -50, -10):
        ev("click", 1, m)
    ev("purchase", 1, 0)
    # user 2: k=1 (only)
    ev("click", 2, -30)
    ev("purchase", 2, 0)
    # user 3: k=3 → middles get 2000 with remainder to earliest middle
    for m in (-90, -60, -30):
        ev("click", 3, m)
    ev("purchase", 3, 0)
    # user 4: a click OUTSIDE the 24h window — no credit at all
    ev("click", 4, -60 * 25)
    ev("purchase", 4, 0)

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = {r.role: r for r in q135_multitouch_attribution(spark, td).collect()}
    total = sum(r.credit_bp for r in out.values())
    assert total == 10000 * 3  # users 1-3 credited; user 4's purchase untouched
    assert out["only"].credit_bp == 10000 and out["only"].n_touches == 1
    assert out["first"].n_touches == 2 and out["first"].credit_bp == 8000
    assert out["last"].credit_bp == 8000
    # middles: user1 has 3 middles (2000 total), user3 has 1 middle (2000)
    assert out["middle"].n_touches == 4 and out["middle"].credit_bp == 4000


def test_session_conversion_ordering_and_gap(spark):
    """Conversion requires a purchase AT-OR-AFTER a click INSIDE the
    session: purchase-then-click does not convert; a >30-min gap splits
    the session so a click in session 1 cannot convert session 2."""
    import datetime as dt
    import os, tempfile

    from airflow_spotify_etl_spark.plans.relational import (
        q138_session_conversion,
    )

    base = dt.datetime(2024, 2, 1, 9, 0, 0)
    rows = []
    eid = 0

    def ev(kind, user, minutes):
        nonlocal eid
        rows.append(
            (eid, base + dt.timedelta(minutes=minutes), user, kind, 1.0, "{}")
        )
        eid += 1

    ev("click", 1, 0); ev("purchase", 1, 5)        # converts
    ev("purchase", 2, 0); ev("click", 2, 5)        # wrong order: no
    ev("click", 3, 0); ev("purchase", 3, 45)       # gap splits: no
    ev("view", 4, 0)                               # session, no funnel
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = q138_session_conversion(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    # sessions: u1 x1, u2 x1, u3 x2 (split), u4 x1 = 5; converted: u1 only
    assert (r.n_sessions, r.n_converted, r.conversion_rate) == (5, 1, 0.2)
