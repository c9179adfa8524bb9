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


def test_every_query_has_an_oracle():
    """Every registered query must carry a DuckDB oracle — the rows-only
    tier is empty since q27 gained its probe-all exact oracle (trained
    IVF at nprobe=nlist ≡ brute-force top-k, centroid-independent). A new
    query landing without an oracle is a coverage regression, not a
    design choice."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) - set(oracles) == set()
