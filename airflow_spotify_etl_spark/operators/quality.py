"""Data-quality constraint suite as ONE fused aggregation pass.

Re-expresses the reference's ``check_if_valid_data`` (spotify_etl2.py:42-86):

- F1 emptiness check        (spotify_etl2.py:56-58)  → ``is_empty``
- F2 primary-key uniqueness (spotify_etl2.py:61-62)  → ``pk_unique`` + counts
- F3 any-null scan          (spotify_etl2.py:65-68)  → per-column null counts
- F4 freshness / late-data  (spotify_etl2.py:71-84)  → ``n_late_rows``
  (warn-and-KEEP semantics: rows are counted, never dropped — the batch-side
  answer to SURVEY.md §7 "what's hard #2"; the streaming path uses a
  watermark side-count instead, see streaming/pipelines.py)

The reference runs these as four separate pandas passes; here they are one
multi-aggregate scan (SURVEY.md §4 "multi-aggregate fusion"), plus one
stats-only scan for ``max(ts)`` (answered from Parquet footer min/max at any
scale — it never reads data pages). At 100 TB that is two scans and one
shuffle: the exact ``countDistinct`` needs a partial-aggregate exchange on
the key (swap in ``approx_count_distinct`` to make the pass shuffle-free
when an estimate suffices); every other aggregate reduces map-side to a
single row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quality_report",
    "assert_quality",
    "check_unique",
    "check_not_null",
    "check_accepted_values",
    "check_referential",
    "integrity_audit",
    "rate_anomalies",
    "rate_anomalies_hourly",
]


def quality_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    freshness_days: int = 7,
    null_cols: list[str] | None = None,
) -> DataFrame:
    """Return a 1-row DataFrame with the full constraint report."""
    cols = null_cols or df.columns
    # Lateness cutoff is data-relative (max(ts) − N days), mirroring the
    # reference's now()−7d cutoff (spotify_etl2.py:72) but reproducible on
    # static data. Broadcast the 1-row max so the main scan stays shuffle-free.
    max_ts = df.agg(F.max(ts_col).alias("_max_ts"))
    aggs = [
        F.count("*").alias("n_rows"),
        (F.count("*") == 0).alias("is_empty"),
        F.countDistinct(key_col).alias("n_distinct_keys"),
        (F.count("*") == F.countDistinct(key_col)).alias("pk_unique"),
    ]
    aggs += [
        F.count_if(F.col(c).isNull()).alias(f"nulls_{c}") for c in cols
    ]
    aggs.append(
        F.count_if(
            F.col(ts_col)
            < F.col("_max_ts") - F.expr(f"INTERVAL {freshness_days} DAYS")
        ).alias("n_late_rows")
    )
    return df.crossJoin(F.broadcast(max_ts)).agg(*aggs)


def assert_quality(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    freshness_days: int = 7,
) -> dict:
    """Imperative wrapper with the reference's exact pass/warn/fail policy:
    empty → invalid (warn, spotify_etl2.py:56-58); duplicate PK → raise
    (spotify_etl2.py:61-62); nulls → warn (non-fatal, :65-68); late rows →
    warn and keep (:71-84). Returns the report row as a dict."""
    row = quality_report(df, key_col, ts_col, freshness_days).collect()[0].asDict()
    if row["is_empty"]:
        row["status"] = "empty"
        return row
    if not row["pk_unique"]:
        raise ValueError(
            f"Primary key check failed: {row['n_rows']} rows, "
            f"{row['n_distinct_keys']} distinct {key_col!r}"
        )
    row["status"] = "ok"
    return row


# ---------------------------------------------------------------------------
# Cross-table integrity audit (the dbt-tests tier: uniqueness, not-null,
# accepted values, referential integrity — each check one aggregate or one
# anti-join, emitted as a uniform (check, n_violations) relation so the
# audit is storable/diffable like any other table).


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """n_violations = rows beyond the first per duplicate key group
    (count(*) − count(distinct key)); 0 iff the key is unique. One
    partial-aggregate exchange on the key.

    Composite keys count through a STRUCT: Spark's bare
    ``count_distinct(a, b)`` skips any row with a NULL component, while
    SQL ``count(DISTINCT (a, b))`` counts the NULL-containing tuple — a
    struct (never NULL itself) restores tuple semantics, so a NULL in one
    PK column is a countable key, not an invisible row (engine-parity
    with the q89 oracle). Single columns keep the bare form: there both
    engines skip NULL identically."""
    distinct = (
        F.count_distinct(F.struct(*[F.col(c) for c in cols]))
        if len(cols) > 1
        else F.count_distinct(F.col(cols[0]))
    )
    return df.agg(
        (F.count(F.lit(1)) - distinct).cast("long").alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def check_not_null(df: DataFrame, col: str, name: str) -> DataFrame:
    """n_violations = NULL count; map-side reducible, no exchange."""
    return df.agg(
        F.sum(F.col(col).isNull().cast("long")).cast("long").alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def check_accepted_values(
    df: DataFrame, col: str, allowed: list[str], name: str
) -> DataFrame:
    """n_violations = non-null rows outside ``allowed`` (dbt semantics:
    NULLs belong to the not-null check, not this one)."""
    bad = F.col(col).isNotNull() & ~F.col(col).isin(*allowed)
    return df.agg(
        F.sum(bad.cast("long")).cast("long").alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """n_violations = child rows whose key has no parent (left anti join,
    child-side keys only through the exchange; AQE broadcasts the parent
    key set when it fits)."""
    orphans = child.select(F.col(child_key).alias("_k")).join(
        parent.select(F.col(parent_key).alias("_k")), "_k", "left_anti"
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_violations")
    ).select(F.lit(name).alias("check"), "n_violations")


def integrity_audit(checks: list[DataFrame]) -> DataFrame:
    """Union per-check 1-row relations into the audit table. Each branch
    executes independently (parallel scans); the union itself is free."""
    if not checks:
        raise ValueError("integrity_audit: no checks given")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def rate_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    factor: int = 3,
    n_lags: int = 8,
) -> DataFrame:
    """Per-type hourly-rate anomaly flags: an hour is anomalous when its
    count exceeds ``factor`` x the decay-weighted trailing baseline
    (EWMA over the ``n_lags`` previous observed hours, powers-of-two
    weights — heaviest on the most recent lag). The baseline rides as
    an exact integer fraction (num/den; den shrinks at a series head
    where fewer lags exist) and the flag is the cross-multiplied
    integer comparison ``cnt * den > factor * num`` — no float division
    decides anything, so the decision replays bit-for-bit in the SQL
    oracle (plans/relational/layout_ops.py q118). One aggregate exchange; all
    ``n_lags`` lag() calls share ONE window pass."""
    hourly = df.groupBy(
        type_col, F.date_trunc("hour", ts_col).alias("hour_ts")
    ).agg(F.count("*").alias("cnt"))
    return rate_anomalies_hourly(hourly, type_col, factor, n_lags)


def rate_anomalies_hourly(
    hourly: DataFrame,
    type_col: str = "event_type",
    factor: int = 3,
    n_lags: int = 8,
) -> DataFrame:
    """The flag core over a pre-aggregated (type, hour_ts, cnt) relation —
    shared by the batch operator above and the streaming rate monitor
    (streaming/rate_monitor.py), which maintains the hourly counts as a
    mergeable store and recomputes flags from their sum."""
    from pyspark.sql import Window as W

    w = W.partitionBy(type_col).orderBy("hour_ts")
    lags = [F.lag("cnt", j).over(w) for j in range(1, n_lags + 1)]
    weights = [1 << (n_lags - j) for j in range(1, n_lags + 1)]
    num = sum(
        (F.coalesce(lg, F.lit(0)) * F.lit(wt) for lg, wt in zip(lags, weights)),
        F.lit(0),
    )
    den = sum(
        (
            F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
            for lg, wt in zip(lags, weights)
        ),
        F.lit(0),
    )
    d = hourly.select(
        type_col,
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "cnt",
        num.alias("baseline_num"),
        den.alias("baseline_den"),
    )
    anom = (F.col("baseline_den") > 0) & (
        F.col("cnt") * F.col("baseline_den")
        > int(factor) * F.col("baseline_num")
    )
    ratio = F.when(
        (F.col("baseline_den") > 0) & (F.col("baseline_num") > 0),
        F.round(
            (F.col("cnt") * F.col("baseline_den")).cast("double")
            / F.col("baseline_num").cast("double"),
            4,
        ),
    )
    return d.withColumn("is_anomaly", anom).withColumn("rate_ratio", ratio)
