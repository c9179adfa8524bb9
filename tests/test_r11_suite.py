"""Hand-computed worked-example pins for round-11 additions. Every
expected value is derived by hand in the docstring — the DuckDB oracle
replays the same formula as the Spark plan, so planted closed-form
fixtures are the only INDEPENDENT check available in this container
(scipy absent, installs forbidden)."""

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


def test_q405_variant_hand_values(spark, tmp_path, qs):
    """Five events, two types. Constructed payload per row is
    '{"a":{"b":K},"c":[2K,K+1],"d":"TYPE"}' with K = props.$.k
    (coalesced to 0 when absent); event_id % 97 == 0 truncates the
    payload by 4 chars, which is invalid JSON in BOTH engines.

    - id 0, click, k=7  -> CORRUPTED (0 % 97 == 0): failed, all NULL
    - id 1, click, k=7  -> ab=7,  c1=7+1=8,  d='click' (match)
    - id 2, view,  k=10 -> ab=10, c1=11,     d='view'  (match)
    - id 3, view,  no k -> K=0: ab=0, c1=1,  d='view'  (match)
    - id 97, view, k=3  -> CORRUPTED (97 % 97 == 0)

    click: n=2, failed=1, sum_ab=7,  sum_c1=8,     matches=1
    view:  n=3, failed=1, sum_ab=10, sum_c1=11+1=12, matches=2"""
    d = datetime.datetime
    ts = d(2024, 3, 1, 10, 0, 0)
    rows = [
        (0, ts, 1, "click", 1.0, '{"k": 7}'),
        (1, ts, 2, "click", 1.0, '{"k": 7}'),
        (2, ts, 3, "view", 1.0, '{"k": 10}'),
        (3, ts, 4, "view", 1.0, '{"x": 5}'),
        (97, ts, 5, "view", 1.0, '{"k": 3}'),
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q405_variant_nested_extract"](spark, str(tmp_path)).collect()
    got = {
        r.event_type: (r.n_events, r.n_failed, r.sum_ab, r.sum_c1, r.n_d_match)
        for r in out
    }
    assert [r.event_type for r in out] == ["click", "view"]
    assert got == {
        "click": (2, 1, 7, 8, 1),
        "view": (3, 1, 10, 12, 2),
    }


def test_q405_all_corrupted_group_coalesces_to_zero(spark, tmp_path, qs):
    """Degenerate path: a type whose EVERY payload is corrupted.
    Spark's sum over an all-NULL column is NULL — the coalesce(sum, 0)
    guard (mirrored in the oracle) must pin the sums and the match
    count to literal 0, not NULL, or the strict hash compare diverges
    from DuckDB's coalesced 0."""
    d = datetime.datetime
    ts = d(2024, 3, 1, 10, 0, 0)
    rows = [
        (0, ts, 1, "error", 1.0, '{"k": 5}'),  # 0 % 97 == 0 -> corrupted
        (194, ts, 2, "error", 1.0, '{"k": 6}'),  # 194 % 97 == 0 -> corrupted
    ]
    _write_events(spark, tmp_path, rows)
    out = qs["q405_variant_nested_extract"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.n_events, r.n_failed) == ("error", 2, 2)
    assert (r.sum_ab, r.sum_c1, r.n_d_match) == (0, 0, 0)
