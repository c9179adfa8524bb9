"""Mechanical registry-completeness gates (VERDICT r5 item 5).

Every query registered in __spark_entry__.queries() must carry its full
evidence chain: a DuckDB oracle, a bench HEADLINE entry, a BASELINE.md
regression anchor, and a COVERAGE.md row. These meta-tests make gaps
like round 5's 31 never-benched queries impossible to reintroduce
silently. No SparkSession is needed — everything is registry/file
introspection.
"""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# Queries deliberately without a SQL oracle (driver records a weaker
# rows-only check). Keep this list EXPLICIT — additions need a reason.
ROWS_ONLY_OK: set[str] = set()


def _qnum(name: str) -> str:
    return re.match(r"(q\d+)_", name).group(1)


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(oracles) - ROWS_ONLY_OK)
    assert not missing, f"queries without oracle_sql(): {missing}"
    orphans = sorted(set(oracles) - set(qs))
    assert not orphans, f"oracles without queries(): {orphans}"


def test_every_query_is_benched():
    from bench import HEADLINE

    qs = entry.queries()
    unbenched = sorted(set(qs) - set(HEADLINE))
    assert not unbenched, f"queries missing from bench HEADLINE: {unbenched}"
    ghosts = sorted(set(HEADLINE) - set(qs))
    assert not ghosts, f"HEADLINE names not in the registry: {ghosts}"
    assert len(HEADLINE) == len(set(HEADLINE)), "duplicate HEADLINE entries"


def test_every_query_has_a_baseline_anchor():
    from bench import _anchor_medians

    anchors = _anchor_medians()
    qs = entry.queries()
    unanchored = sorted(set(qs) - set(anchors))
    assert not unanchored, f"queries without BASELINE.md anchor: {unanchored}"
    # the anchor regex must not have matched the same query twice
    text = (REPO / "BASELINE.md").read_text()
    names = re.findall(r"\|\s*(q\w+)\s*\|\s*[0-9.]+\s*(?=\|)", text)
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate anchor rows in BASELINE.md: {dupes}"


def test_every_query_has_a_coverage_row():
    text = (REPO / "COVERAGE.md").read_text()
    mentioned = set(re.findall(r"\bq\d+", text))
    missing = sorted(
        {n for n in entry.queries() if _qnum(n) not in mentioned},
        key=lambda n: int(_qnum(n)[1:]),
    )
    assert not missing, f"queries without a COVERAGE.md mention: {missing}"


def test_every_query_has_a_plans_note():
    text = (REPO / "PLANS.md").read_text()
    mentioned = set(re.findall(r"\bq\d+", text))
    missing = sorted(
        {n for n in entry.queries() if _qnum(n) not in mentioned},
        key=lambda n: int(_qnum(n)[1:]),
    )
    assert not missing, f"queries without a PLANS.md note: {missing}"
