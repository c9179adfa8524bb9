"""Registry-wide plan-shape gate: every unpartitioned window must sit
above a BOUNDED relation (round-9 verdict task 7).

An unpartitioned ``Window`` moves all its input to one partition — the
classic global-sort scale killer. The house rule (PLANS.md audit) is
that such windows are only ever applied to relations that are bounded
by construction: an aggregate output (e.g. the 256-row bucket-count
relation of ``epoch_shuffle``'s two-phase rank), a ``LIMIT``/top-k
slice, or a literal/local relation. This test turns that manual audit
into a mechanical regression gate over ALL registered queries: it walks
each query's OPTIMIZED logical plan and, for every Window node with an
empty partitionSpec, checks that every path from the window down to a
raw source scan (``LogicalRelation``) passes through a bounding barrier
(``Aggregate``, ``GlobalLimit``/``LocalLimit``, ``Deduplicate``).
A deliberately-unbounded fixture proves the gate actually fails.

Queries on the explicit allowlist below carry a justification for why a
non-barrier path is still bounded (these are re-audited cases, not
exemptions of convenience).

KNOWN LIMITATION (r9 advice): treating every ``Aggregate`` as a barrier
is sound only when the grouping keys have bounded cardinality (salt
grids, day/date buckets, literal explodes — the only patterns this repo
uses under unpartitioned windows, re-audited in PLANS.md). An aggregate
grouped by a HIGH-CARDINALITY key (e.g. user_id) is NOT bounded, and an
unpartitioned window over such an aggregate would pass this gate
undetected. The gate is therefore a one-way check: a failure is always
real, but a pass certifies boundedness only in combination with the
manual PLANS.md audit of what each barrier aggregate groups by. Anyone
adding an unpartitioned window over an aggregate must confirm the
grouping keys are bounded-by-construction and note it in PLANS.md; if
they are not provably bounded, partition the window or route the query
through ``_ALLOWLIST`` with a justification.
"""

from __future__ import annotations

import pytest

from airflow_spotify_etl_spark.plans import all_queries

# Node class simple-names that bound the row count of everything above
# them on the path.
_BARRIERS = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "LocalRelation",
    "OneRowRelation",
    "Range",
}

# Leaf nodes that represent an UNBOUNDED source scan.
_RAW_LEAVES = {"LogicalRelation", "HiveTableRelation", "UnresolvedRelation"}

# name -> justification for paths that the mechanical walk cannot prove
# bounded but a manual audit has. Keep SHORT and specific; anything new
# landing here needs a PLANS.md note too.
_ALLOWLIST: dict[str, str] = {}


def _children(jnode):
    cs = jnode.children()
    return [cs.apply(i) for i in range(cs.size())]


def _cls(jnode) -> str:
    return jnode.getClass().getSimpleName()


def _unpartitioned_windows(jnode):
    out = []
    stack = [jnode]
    while stack:
        n = stack.pop()
        if _cls(n) == "Window" and n.partitionSpec().isEmpty():
            out.append(n)
        stack.extend(_children(n))
    return out


def _raw_paths_below(jnode) -> list[str]:
    """Class-name chains from ``jnode`` down to any raw leaf not cut by
    a barrier; empty list == bounded."""
    bad = []

    def dfs(n, path):
        c = _cls(n)
        if c in _BARRIERS:
            return
        kids = _children(n)
        if not kids:
            if c in _RAW_LEAVES:
                bad.append(" > ".join(path + [c]))
            return
        for k in kids:
            dfs(k, path + [c])

    for k in _children(jnode):
        dfs(k, [])
    return bad


def _gate(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    problems = []
    for w in _unpartitioned_windows(plan):
        for p in _raw_paths_below(w):
            problems.append(f"unpartitioned Window over raw path: {p}")
    return problems


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_unpartitioned_windows_are_bounded(spark, sf_dir, name):
    if name in _ALLOWLIST:
        pytest.skip(f"audited exception: {_ALLOWLIST[name]}")
    df = all_queries()[name](spark, sf_dir)
    problems = _gate(df)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_gate_flags_deliberately_unbounded_window(spark, sf_dir):
    """A row_number over the raw events scan with no partition key MUST
    trip the gate — proves the walk detects the anti-pattern."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from airflow_spotify_etl_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    bad = ev.withColumn(
        "rn", F.row_number().over(W.orderBy("event_id"))
    )
    assert _gate(bad), "gate failed to flag an unbounded global window"
