"""Incremental materialized-aggregate maintenance.

The reference recomputes its summary statistics from scratch on every daily
run (spotify_etl2.py:271-278 re-scans the full table each batch). At 100 TB
that is the difference between touching yesterday's partition and touching
the whole corpus: an additive rollup (count / sum / min / max — any
commutative monoid) can be maintained by merging the existing snapshot with
partial aggregates of JUST the new rows.

Design:
- The snapshot schema IS the partial-aggregate schema (keys + mergeable
  states), so `merge(snapshot, partials(delta)) == partials(base ∪ delta)`
  by associativity — verified against a full-recompute oracle (q70).
- `merge` is union + re-aggregate: one shuffle bounded by
  |snapshot keys| + |delta rows|, never by the base table size. The base
  table is NOT read at all on the incremental path.
- Averages are derived (sum/count) at read time, never stored — stored
  averages don't merge.
- At scale the snapshot lives as a partitioned table; only key partitions
  present in the delta are rewritten (dynamic partition overwrite), so a
  daily increment touches O(|delta|) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "lateness_us",
    "lateness_tier_counts",
    "rollup_snapshot",
    "merge_rollup",
    "merge_upsert",
    "cdc_apply",
    "scd2_runs",
    "scd2_apply_delta",
    "snapshot_diff",
    "gap_fill_hourly",
    "stats_drift",
    "tvd_matrix",
]


def cdc_apply(
    base: DataFrame,
    cdc: DataFrame,
    keys: list[str],
    order_col: str,
    op_col: str = "op",
    broadcast_cdc: bool = True,
) -> DataFrame:
    """Apply a CDC batch WITH delete tombstones to a stored table state —
    ``merge_upsert`` plus the WHEN MATCHED ... DELETE arm a real MERGE
    needs: the batch is first collapsed to the LATEST change per key
    (max ``order_col``; a key that is updated then deleted within one
    batch must end deleted, and vice versa), then 'D' keys are removed
    from the state, 'U'/'I' keys replace-or-insert, and untouched base
    rows pass through. Deleting a key the state never had is a no-op,
    as a CDC consumer requires for at-least-once replays.

    Contract enforcement: ``op_col`` must be one of I/U/D. Anything
    else — including NULL — fails the job via ``raise_error`` instead
    of silently deleting: a malformed row would still remove its base
    row through the key anti-join while ``op != 'D'`` evaluates NULL
    and drops it from the upserts, vanishing the key. The check runs
    inside the collapse projection (distributed, no extra pass).

    Determinism: ties on ``order_col`` within a key are broken by
    tombstone-priority ('D' outranks 'I'/'U' at the same version — the
    safe direction for replayed feeds) and finally by a full-row
    xxhash64, so the surviving row never depends on partitioning.

    Scale shape: one |cdc|-keyed window for the collapse, one anti join
    of base against the (broadcastable) CDC key set, one union — the
    base streams through exactly once; cost scales with the batch, not
    the table. On partitioned storage this pairs with dynamic partition
    overwrite exactly like merge_upsert."""
    checked_op = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"cdc_apply: {op_col} must be one of I/U/D, got "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    cdc = cdc.withColumn(op_col, checked_op)
    w = W.partitionBy(*keys).orderBy(
        F.col(order_col).desc(),
        F.when(F.col(op_col) == "D", F.lit(1)).otherwise(F.lit(0)).desc(),
        F.xxhash64(*[F.col(c) for c in cdc.columns]).desc(),
    )
    latest = (
        cdc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cols = base.columns
    key_set = latest.select(*keys).distinct()
    if broadcast_cdc:
        key_set = F.broadcast(key_set)
    survivors = base.join(key_set, keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*cols)
    return survivors.unionByName(upserts)


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """MERGE-INTO upsert: delta rows replace base rows sharing their key
    (WHEN MATCHED THEN UPDATE), unmatched delta rows are inserted, and
    untouched base rows survive — the standard lakehouse upsert the
    reference approximates with its drop-and-append cycle
    (spotify_etl2.py's re-scan + to_sql append has no update path at all).

    If ``order_col`` is given, a delta carrying several versions of one key
    is first collapsed to the latest (max order_col, one |delta|-bounded
    window) — MERGE's "multiple source rows match" error becomes
    last-writer-wins, which is what a CDC tail wants.

    Shape at 100 TB: one left-anti hash join of base against the delta's
    key set plus a union — the base table streams through; only the delta
    (the small side, broadcastable) is materialized per key. On partitioned
    storage this pairs with dynamic partition overwrite
    (sinks/writers.overwrite_partitions) so only key partitions present in
    the delta are rewritten; the anti-join is then scoped to those
    partitions and a daily increment touches O(|delta|) data, never the
    full base."""
    if order_col is not None:
        w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
        delta = (
            delta.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    cols = base.columns
    key_set = delta.select(*keys).distinct()
    if broadcast_delta:
        key_set = F.broadcast(key_set)
    return base.join(key_set, keys, "left_anti").unionByName(delta.select(*cols))


def rollup_snapshot(events: DataFrame, keys: list[str], value_col) -> DataFrame:
    """Partial-aggregate snapshot: mergeable states per key group.

    ``value_col`` must be an exact (decimal/integer) column expression —
    double sums are order-dependent and would make `merge(snapshot, delta)`
    differ from a full recompute at the last ulp."""
    return events.groupBy(*keys).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(snapshot: DataFrame, delta_partials: DataFrame) -> DataFrame:
    """Merge two partial-aggregate snapshots (monoid combine per key).

    union + re-aggregate: each state column merges with its own combine
    (counts/sums add, min/max fold). Cost is one shuffle over the union of
    key sets — independent of the size of the already-aggregated history.
    """
    keys = [c for c in snapshot.columns if c not in
            ("n_events", "sum_value", "min_value", "max_value")]
    return (
        snapshot.unionByName(delta_partials)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Dataset-version diff: (id, status ∈ added|removed|changed|unchanged)
    between two snapshots, comparing content by md5 so the full-outer join
    shuffles two narrow (id, hash) relations — never the payloads. This is
    the audit primitive for corpus releases (what changed between v1 and
    v2) and for validating incremental maintenance (diff(stored, rebuilt)
    must be all-unchanged). One co-partitioned join keyed on id.

    NULL content is coalesced to a sentinel before hashing: ``md5(NULL)``
    is NULL, which would be indistinguishable from "row absent" in the
    full-outer join and misclassify NULL-both-sides as added (ADVICE r3).
    The sentinel starts with a NUL byte no real text contains, so it
    cannot collide with a legitimate value."""
    content = F.md5(F.coalesce(F.col(content_col), F.lit("\x00<null>")))
    o = old.select(F.col(id_col).alias("id"), content.alias("oh"))
    n = new.select(F.col(id_col).alias("id"), content.alias("nh"))
    return (
        o.join(n, "id", "full_outer")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("oh").isNull(), F.lit("added"))
            .when(F.col("nh").isNull(), F.lit("removed"))
            .when(F.col("oh") != F.col("nh"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def scd2_runs(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Collapse each key's event stream into state runs — the SCD-2
    building block: (user, run_id 1.., state, vf = first ts of the run,
    n_events). One hash exchange on the key serves the change-marker
    window, the running run-id, and the group-aggregate."""
    w = W.partitionBy(user_col).orderBy(ts_col, order_col)
    wrows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag(state_col).over(w)
    return (
        events.select(user_col, ts_col, order_col, state_col)
        .withColumn(
            "chg",
            F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0),
        )
        .withColumn("run_id", F.sum("chg").over(wrows))
        .groupBy(user_col, "run_id")
        .agg(
            F.min(state_col).alias("state"),
            F.min(ts_col).alias("vf"),
            F.count("*").alias("n_events"),
        )
    )


def scd2_apply_delta(
    current: DataFrame,
    delta_events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Incrementally maintain an SCD-2 run table: fold an APPEND-ONLY
    delta batch (all delta events later than the stored history per key)
    into ``current`` (a `scd2_runs` snapshot) without re-reading history.

    Semantics that make it equal a full rebuild (verified by q80's
    full-recompute oracle):
    - a delta's first run CONTINUES the key's open run when the state
      matches (counts merge; the run keeps its original valid_from);
    - otherwise, and for every later delta run, new runs append with ids
      continuing the stored sequence;
    - keys seen only in the delta start at run 1.

    Cost: runs-of-delta (one delta-keyed exchange) + two joins against the
    |keys|-bounded run table — never a scan of the historical events. At
    scale `current` lives partitioned by key range, so the join touches
    only partitions with delta activity."""
    d = scd2_runs(delta_events, user_col, ts_col, order_col, state_col)
    last = current.groupBy(user_col).agg(F.max("run_id").alias("last_run"))
    last_state = (
        current.join(last, user_col)
        .filter(F.col("run_id") == F.col("last_run"))
        .select(user_col, "last_run", F.col("state").alias("last_state"))
    )
    d2 = d.join(last_state, user_col, "left")
    merges_open_run = (
        (F.col("run_id") == 1)
        & F.col("last_run").isNotNull()
        & (F.col("state") == F.col("last_state"))
    )
    merged_counts = d2.filter(merges_open_run).select(
        user_col,
        F.col("last_run").alias("run_id"),
        F.col("n_events").alias("extra_events"),
    )
    updated_current = (
        current.join(merged_counts, [user_col, "run_id"], "left")
        .withColumn(
            "n_events", F.col("n_events") + F.coalesce("extra_events", F.lit(0))
        )
        .drop("extra_events")
    )
    first_run_merged = d2.filter(merges_open_run).select(
        user_col, F.lit(1).alias("_merged1")
    )
    new_runs = (
        d2.filter(~merges_open_run)
        .join(first_run_merged, user_col, "left")
        .select(
            user_col,
            (
                F.coalesce("last_run", F.lit(0))
                + F.col("run_id")
                - F.coalesce("_merged1", F.lit(0))
            ).alias("run_id"),
            "state",
            "vf",
            "n_events",
        )
    )
    return updated_current.unionByName(new_runs)


def gap_fill_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled hourly rollup with last-observation-carried-forward —
    the hypertable ``time_bucket_gapfill + locf`` shape: every hour
    between the stream's first and last event appears exactly once;
    silent hours get n_events = 0 and carry the last known hourly average
    forward (leading gaps stay NULL — there is nothing to carry).

    Scale shape: the only stream-sized work is the hourly aggregate (one
    exchange on the bounded hour key; DECIMAL sum so the average is
    order-independent across partitions — float-parity discipline). The
    spine explodes sequence(min, max, 1 hour) from a 1-row bounds
    aggregate; spine ⋈ hourly and the LOCF window run on HOUR-cardinality
    relations (≈ 8.8k rows/year), never the stream. The unpartitioned
    LOCF window is deliberate and bounded; at multi-year scale partition
    it by year and stitch the boundary value in a second tiny pass."""
    dec = F.col(value_col).cast("decimal(18,2)")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hour_ts")
    ).agg(
        F.count("*").alias("n_events"),
        (F.sum(dec).cast("double") / F.count(value_col)).alias("_avg"),
    )
    bounds = hourly.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts")
    )
    w = W.orderBy("hour_ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    return spine.join(hourly, "hour_ts", "left").select(
        "hour_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(F.last("_avg", ignorenulls=True).over(w), 4).alias("avg_value_locf"),
    )


def stats_drift(
    old: DataFrame,
    new: DataFrame,
    columns: list[str],
    null_delta_pct: int = 1,
    distinct_ratio_bound: int = 2,
) -> DataFrame:
    """Column-stats drift report between two snapshots of a table — the
    check a pipeline runs before promoting today's partition: per
    column, row/null/distinct counts on both sides, the null-rate delta,
    the distinct-count ratio, and two drift flags. Catches silent
    upstream breakage (a field going NULL, an enum collapsing, an id
    column exploding) that schema equality alone never sees.

    Both flags are CROSS-MULTIPLIED integer comparisons —
    ``|nulls_new·n_old − nulls_old·n_new|·100 > null_delta_pct·n_old·n_new``
    and ``distinct_new·bound < distinct_old`` (or symmetric) — so no
    float division decides a flag and the whole report replays exactly
    in the SQL oracle (plans/relational/layout_ops.py q121). The reported ratio
    columns are single divisions of those exact integers, rounded.

    Scale shape: ONE aggregate pass per side (all columns' counts in a
    single fused Aggregate over the scan — the quality_report
    discipline), a stack() unpivot of the resulting 1-row relation, and
    a column-name join of two ``len(columns)``-row relations. Cost is
    two scans regardless of column count."""
    cols = list(columns)

    def prof(df: DataFrame) -> DataFrame:
        aggs = [F.count("*").alias("n")]
        for c in cols:
            aggs.append(F.count(c).alias(f"nn_{c}"))
            aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        row = df.agg(*aggs)
        # Column names flow into generated SQL: backtick-quote the
        # aliases (doubling any embedded backtick, Spark's escape) and
        # single-quote-escape the name literal so spaces/quotes/dots in
        # source column names can't break the stack() parse.
        def bq(name: str) -> str:
            return "`" + name.replace("`", "``") + "`"

        def lit(name: str) -> str:
            return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

        stack = ", ".join(
            f"{lit(c)}, {bq('nn_' + c)}, {bq('nd_' + c)}" for c in cols
        )
        return row.selectExpr(
            "n",
            f"stack({len(cols)}, {stack}) AS (column, n_nonnull, n_distinct)",
        )

    o = prof(old).select(
        "column",
        F.col("n").alias("n_old"),
        (F.col("n") - F.col("n_nonnull")).alias("nulls_old"),
        F.col("n_distinct").alias("distinct_old"),
    )
    nw = prof(new).select(
        "column",
        F.col("n").alias("n_new"),
        (F.col("n") - F.col("n_nonnull")).alias("nulls_new"),
        F.col("n_distinct").alias("distinct_new"),
    )
    j = o.join(nw, "column")
    null_drift = (
        F.abs(
            F.col("nulls_new") * F.col("n_old")
            - F.col("nulls_old") * F.col("n_new")
        )
        * 100
        > int(null_delta_pct) * F.col("n_old") * F.col("n_new")
    )
    b = int(distinct_ratio_bound)
    distinct_drift = (
        F.col("distinct_new") * b < F.col("distinct_old")
    ) | (F.col("distinct_new") > b * F.col("distinct_old"))
    return j.select(
        "column",
        "n_old",
        "n_new",
        "nulls_old",
        "nulls_new",
        "distinct_old",
        "distinct_new",
        F.when(
            (F.col("n_old") > 0) & (F.col("n_new") > 0),
            F.round(
                F.col("nulls_new").cast("double")
                / F.col("n_new").cast("double")
                - F.col("nulls_old").cast("double")
                / F.col("n_old").cast("double"),
                6,
            ),
        ).alias("null_rate_delta"),
        F.when(
            F.col("distinct_old") > 0,
            F.round(
                F.col("distinct_new").cast("double")
                / F.col("distinct_old").cast("double"),
                4,
            ),
        ).alias("distinct_ratio"),
        null_drift.alias("null_drift"),
        distinct_drift.alias("distinct_drift"),
    )


def tvd_matrix(
    counts: DataFrame,
    group_col: str = "source",
    value_col: str = "v",
    count_col: str = "c",
) -> DataFrame:
    """EXACT pairwise total variation distance between the value
    distributions of every group in a (group, value, count) relation —
    the shared core behind the batch drift matrix (plans/llm/evalstats.py q319)
    and the streaming histogram monitor (streaming/drift_monitor.py).

    Inner-join-plus-totals identity (no full-outer join, no dense value
    grid): Σ_v |c₁N₂ − c₂N₁| = 2·N₁N₂ + Σ_{v∈common}(|c₁N₂−c₂N₁| −
    c₁N₂ − c₂N₁), because one-sided values contribute their full c·N
    mass. tvd_ppm = (num·10⁶) div (2·N₁N₂) is exact end to end; the
    cross products accumulate in DECIMAL(38,0) (c·N ~ N² wraps BIGINT
    at N ≈ 3e9). Emits pairs sharing ≥1 value (a fully disjoint pair —
    TVD exactly 1 — has no join row; n_common_values keeps the support
    explicit).

    Scale shape: runs entirely on the count relation (|groups|·|values|
    rows, corpus-independent)."""
    g, v, c = group_col, value_col, count_col
    tot = counts.groupBy(g).agg(F.sum(c).alias("n"))
    a = counts.join(tot, g).select(
        F.col(g).alias("grp_a"), F.col(v).alias("_v"),
        F.col(c).alias("ca"), F.col("n").alias("na"),
    )
    b = counts.join(tot, g).select(
        F.col(g).alias("grp_b"), F.col(v).alias("_v"),
        F.col(c).alias("cb"), F.col("n").alias("nb"),
    )
    common = (
        a.join(b, "_v")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.sum(
                F.expr(
                    "abs(CAST(ca AS DECIMAL(38,0)) * nb"
                    "    - CAST(cb AS DECIMAL(38,0)) * na)"
                    " - CAST(ca AS DECIMAL(38,0)) * nb"
                    " - CAST(cb AS DECIMAL(38,0)) * na"
                )
            ).alias("adj"),
            F.count("*").alias("n_common_values"),
        )
    )
    return common.select(
        "grp_a", "grp_b", "n_a", "n_b", "n_common_values",
        F.expr(
            "CAST((2 * CAST(n_a AS DECIMAL(38,0)) * n_b + adj) * 1000000"
            " div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
        ).alias("tvd_ppm"),
    ).orderBy("grp_a", "grp_b")


_LONG_MIN = -9223372036854775808


def lateness_us(
    df: DataFrame, prev_max_us: int | None = None
) -> DataFrame:
    """Per-event lateness in micros for an arrival-ordered event
    relation — the shared core of the batch watermark-delay planner
    (plans/relational.q362), the delay-cost curve (q378), and the
    streaming lateness monitor
    (streaming/lateness_monitor.py): each event's lateness is the gap
    to the maximum event time among STRICTLY EARLIER arrivals
    (arrival order = event_id, seeded with ``prev_max_us`` — the max
    event time of every earlier micro-batch — so cross-batch lateness
    composes exactly).

    Scale shape (the q214/q224 two-phase idiom on prefix-MAX): a
    FIXED ≤1025-cell event_id grid (width = (max_id − min_id) div
    1024 + 1, ids min-rebased, from a broadcast 1-row agg — robust to
    offset id spaces), per-cell maxima map-side combine, a
    prefix-max over the bounded cell relation, and a cell-partitioned
    within-cell window — no global sort touches raw rows. Returns a
    one-column (late_us) relation; all integers.

    NULL event times: rows with ``ts IS NULL`` are EXCLUDED from the
    lateness pass (r9 advice). A NULL event time carries no lateness
    semantics — before this filter such rows silently landed in the
    '0_on_time' tier (greatest() skips NULLs in both Spark and DuckDB)
    and could never be dropped at any candidate watermark, skewing the
    q362/q378 decision tables. They never influenced the running max
    either way (max() skips NULLs), so on NULL-free data the output is
    byte-identical; callers that need the NULL-ts population should
    count it separately before calling (``df.filter("ts IS NULL")``).
    """
    from pyspark.sql import Window as W

    raw = df.filter(F.col("ts").isNotNull()).select(
        "event_id", F.expr("unix_micros(ts)").alias("t_us")
    )
    # Width derives from the id RANGE (max - min), and bucketing is on
    # the min-rebased id: with an offset id space (e.g. every later
    # micro-batch of the streaming monitor, whose ids start near the
    # running max) a max-based width would dump nearly all rows into
    # the top cells and degenerate the within-cell window toward the
    # single-partition sort this two-phase plan exists to avoid. The
    # rebased bucket id stays monotone in event_id, so the prefix-max
    # composition is unchanged.
    width = raw.agg(
        F.expr(
            "CAST((max(event_id) - min(event_id)) div 1024 + 1 AS BIGINT)"
        ).alias("w"),
        F.expr("CAST(min(event_id) AS BIGINT)").alias("mn"),
    )
    base = raw.crossJoin(F.broadcast(width)).select(
        "event_id",
        "t_us",
        F.expr("CAST((event_id - mn) div w AS BIGINT)").alias("b"),
    )
    bmax = base.groupBy("b").agg(F.max("t_us").alias("bm"))
    w_excl = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    bpre = bmax.select("b", F.max("bm").over(w_excl).alias("bpre"))
    w_in = W.partitionBy("b").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    seed = _LONG_MIN if prev_max_us is None else int(prev_max_us)
    late = (
        base.join(F.broadcast(bpre), "b")
        .withColumn("in_max", F.max("t_us").over(w_in))
        .select(
            F.expr(
                f"CASE WHEN greatest(coalesce(in_max, {_LONG_MIN}),"
                f" coalesce(bpre, {_LONG_MIN}), {seed}) = {_LONG_MIN}"
                " THEN 0"
                f" ELSE greatest(0, greatest(coalesce(in_max, {_LONG_MIN}),"
                f" coalesce(bpre, {_LONG_MIN}), {seed}) - t_us) END"
            ).alias("late_us")
        )
    )
    return late


def lateness_tier_counts(
    df: DataFrame, prev_max_us: int | None = None
) -> DataFrame:
    """Out-of-orderness tier counts over ``lateness_us`` — the q362 /
    streaming-monitor aggregation. Returns (lateness_tier, n_events);
    all integers."""
    tier = (
        "CASE WHEN late_us = 0 THEN '0_on_time'"
        " WHEN late_us < 1000000 THEN '1_under_1s'"
        " WHEN late_us < 60000000 THEN '2_under_1m'"
        " WHEN late_us < 3600000000 THEN '3_under_1h'"
        " ELSE '4_1h_plus' END"
    )
    return (
        lateness_us(df, prev_max_us=prev_max_us)
        .select(F.expr(tier).alias("lateness_tier"))
        .groupBy("lateness_tier")
        .agg(F.count("*").alias("n_events"))
    )
