"""Declarative data-expectation engine (the Deequ/Great-Expectations
shape, Spark-first): a suite of typed checks compiles into ONE fused
aggregate over a single scan, then unpivots into a per-check report —
check count never adds passes over the data, which is what makes an
expectation suite affordable at 100 TB (Deequ's core design point).

Each check is a (name, kind, params) tuple; the compiler emits exact
integer violation counts (no float decides pass/fail) and the report
carries observed/threshold columns so the failure is diagnosable without
a re-scan. Extends the reference's ad-hoc guards (spotify_etl.py:266-272
empty/missing checks; spotify_etl2.py:246-266 nulls/dupes/timeliness)
into a composable rule engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind`` ∈ {not_null, unique, in_range, in_set,
    matches, min_rows}; params depend on the kind (see compile_checks)."""

    name: str
    kind: str
    column: str | None = None
    params: dict = field(default_factory=dict)


def not_null(column: str) -> Check:
    return Check(f"not_null_{column}", "not_null", column)


def unique(column: str) -> Check:
    return Check(f"unique_{column}", "unique", column)


def in_range(column: str, lo, hi) -> Check:
    return Check(
        f"in_range_{column}", "in_range", column, {"lo": lo, "hi": hi}
    )


def in_set(column: str, values: list) -> Check:
    return Check(f"in_set_{column}", "in_set", column, {"values": list(values)})


def matches(column: str, pattern: str) -> Check:
    return Check(f"matches_{column}", "matches", column, {"pattern": pattern})


def min_rows(n: int) -> Check:
    return Check("min_rows", "min_rows", None, {"n": int(n)})


def expectations_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the suite in ONE aggregate pass and return one row per check:
    (check, column, n_rows, n_violations, passed).

    Violation semantics (all exact integers):
    - not_null: rows where the column IS NULL.
    - unique: rows beyond the first per value — count(col) − n_distinct
      (NULLs don't participate, matching SQL UNIQUE).
    - in_range: non-null rows outside [lo, hi].
    - in_set: non-null rows whose value is not in the list.
    - matches: non-null rows not fully matching the regex.
    - min_rows: violations = max(0, n − count) — the deficit.

    Scale shape: every check compiles to a conditional-sum (or
    count-distinct) column of the SAME grouped-by-nothing aggregate, so
    partials combine map-side and the suite costs one scan regardless
    of how many checks it carries; the report is a |checks|-row stack
    of that single row."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(checks):
        col = F.col(c.column) if c.column else None
        if c.kind == "not_null":
            v = F.sum(col.isNull().cast("long"))
        elif c.kind == "unique":
            v = F.count(col) - F.countDistinct(col)
        elif c.kind == "in_range":
            lo, hi = c.params["lo"], c.params["hi"]
            v = F.sum(
                (col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi))))
                .cast("long")
            )
        elif c.kind == "in_set":
            v = F.sum(
                (col.isNotNull() & ~col.isin(c.params["values"])).cast("long")
            )
        elif c.kind == "matches":
            v = F.sum(
                (col.isNotNull() & ~col.rlike(c.params["pattern"]))
                .cast("long")
            )
        elif c.kind == "min_rows":
            v = F.greatest(
                F.lit(0).cast("long"),
                F.lit(int(c.params["n"])) - F.count(F.lit(1)),
            )
        else:
            raise ValueError(f"unknown check kind: {c.kind}")
        # empty input: sum() is NULL — a suite over zero rows must still
        # report 0 violations (min_rows carries the deficit instead)
        aggs.append(F.coalesce(v, F.lit(0).cast("long")).alias(f"_v{i}"))
    row = df.agg(*aggs)

    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack = ", ".join(
        f"{lit(c.name)}, {lit(c.column or '')}, `_v{i}`"
        for i, c in enumerate(checks)
    )
    return (
        row.selectExpr(
            "_n",
            f"stack({len(checks)}, {stack})"
            " AS (check, column, n_violations)",
        )
        .select(
            "check",
            "column",
            F.col("_n").alias("n_rows"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
