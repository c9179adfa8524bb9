"""Smoke: driver contract + every declared query runs at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_every_query_runs_and_has_stable_schema(spark, sf_dir):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        # Schema must be stable across two invocations.
        assert df.columns == fn(spark, sf_dir).columns, name


def test_oracles_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)


def test_rows_only_tier_is_exactly_q27():
    """Every registered query must carry an oracle except the one
    documented rows-only case (q27: driver-side Lloyd training that a
    fixed SQL string cannot replay). A new query landing here without an
    oracle is a coverage regression, not a design choice."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) - set(oracles) == {"q27_ivf_topk"}
