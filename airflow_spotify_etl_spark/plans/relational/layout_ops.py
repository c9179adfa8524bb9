"""Mechanically split from plans/relational.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...operators.joins import asof_join
from ...operators.quality import quality_report
from ...sources.files import load_table
from ._shared import (
    _dec,
    _scd2_format,
    _t,
)


def q65_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event stream: each user's
    consecutive run of one event_type becomes a validity interval
    [valid_from, valid_to) with the open (current) interval closed by the
    standard end-of-time sentinel. One partitionBy(user_id) exchange serves
    all three windows (change marker, running run-id, lead valid_to) — the
    canonical warehouse pattern the reference's append-only sink
    (spotify_etl2.py:220) would need to become a history table. Scale:
    shuffle is keyed on user_id (high-cardinality, skew-free); no joins."""
    from ...operators.incremental import scd2_runs

    ev = _t(spark, sf_dir, "events")
    return _scd2_format(scd2_runs(ev))


_Q65_SQL = """
WITH m AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, event_type,  ts,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS run_id
  FROM m
), g AS (
  SELECT user_id, run_id, min(event_type) AS state, min(ts) AS vf,
         CAST(count(*) AS BIGINT) AS n_events
  FROM r GROUP BY user_id, run_id
)
SELECT user_id, run_id, state,
       epoch_us(vf) AS valid_from_us,
       coalesce(epoch_us(lead(vf) OVER w2), 253402300799000000) AS valid_to_us,
       (lead(vf) OVER w2 IS NULL) AS is_current,
       n_events
FROM g
WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
ORDER BY user_id, run_id
"""


def q70_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance
    (operators/incremental.py): the daily rollup snapshot built from
    history-before-cutoff is merged with partial aggregates of ONLY the
    post-cutoff delta — the base rows are never re-aggregated. The oracle
    is a FULL recompute over all events, so a green hash proves
    merge(snapshot, partials(delta)) == partials(base ∪ delta) exactly
    (sums aggregate in DECIMAL, making the merge order-independent). At
    100 TB this is the difference between touching one day's partition and
    re-scanning the corpus each run."""
    from ...operators.incremental import merge_rollup, rollup_snapshot

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    base = ev.filter(F.col("day") < F.lit("2024-01-25").cast("date"))
    delta = ev.filter(F.col("day") >= F.lit("2024-01-25").cast("date"))
    keys = ["day", "event_type"]
    snapshot = rollup_snapshot(base, keys, _dec("value"))
    merged = merge_rollup(snapshot, rollup_snapshot(delta, keys, _dec("value")))
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    ).orderBy("day", "event_type")


_Q70_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
       CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY CAST(ts AS DATE), event_type
ORDER BY day, event_type
"""


def q80_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD-2 maintenance (operators/incremental.py
    `scd2_apply_delta`): the stored run table built from history before the
    cutoff is folded together with ONLY the post-cutoff delta — continuing
    open runs whose state persists, appending new runs otherwise — and the
    oracle is q65's FULL-rebuild SQL over all events. A green hash proves
    apply(base_runs, delta) == rebuild(base ∪ delta) exactly, including a
    run that straddles the cutoff. The historical events are never
    re-scanned; the delta path touches runs-of-delta plus two
    |keys|-bounded joins."""
    from ...operators.incremental import scd2_apply_delta, scd2_runs

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-25").cast("timestamp")
    base = scd2_runs(ev.filter(F.col("ts") < cutoff))
    merged = scd2_apply_delta(base, ev.filter(F.col("ts") >= cutoff))
    return _scd2_format(merged)


def q82_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-release diff (operators/incremental.snapshot_diff): v1 is
    docs < 450, v2 drops the first 50, keeps the rest, and rewrites every
    7th doc — the diff must classify every id as added / removed /
    changed / unchanged from two narrow (id, md5) relations joined once
    on id. The release-audit primitive for versioned datasets."""
    from ...operators.incremental import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") < 450)
    v2 = docs.filter(F.col("doc_id") >= 50).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(v1, v2).orderBy("doc_id")


_Q82_SQL = """
WITH v1 AS (
  SELECT doc_id, md5(coalesce(text, chr(0) || '<null>')) AS oh
  FROM documents WHERE doc_id < 450
), v2 AS (
  SELECT doc_id,
         md5(coalesce(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                           ELSE text END, chr(0) || '<null>')) AS nh
  FROM documents WHERE doc_id >= 50
)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.oh IS NULL THEN 'added'
            WHEN v2.nh IS NULL THEN 'removed'
            WHEN v1.oh <> v2.nh THEN 'changed'
            ELSE 'unchanged' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
ORDER BY doc_id
"""


def q91_temporal_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ SCD-2 dimension by validity interval — the canonical
    warehouse temporal lookup: each purchase event resolved to the
    dimension run that was CURRENT at the event's timestamp (user equi-key
    + [valid_from, valid_to) containment). The join is an equi-join on the
    key with the interval predicates as join filters, so it shuffles on
    user_id like any other keyed join — no range-explode, no cartesian;
    intervals tile each user's timeline (q65 invariant), so exactly one
    dimension row matches per fact."""
    from ...operators.incremental import scd2_runs

    ev = _t(spark, sf_dir, "events", parallelize=True)
    runs = scd2_runs(ev)
    w2 = W.partitionBy("user_id").orderBy("run_id")
    dim = runs.withColumn("vt", F.lead("vf").over(w2)).select(
        F.col("user_id").alias("d_user"), "run_id", "state", "vf", "vt"
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        facts.join(
            dim,
            (facts.user_id == dim.d_user)
            & (dim.vf <= facts.ts)
            & (dim.vt.isNull() | (facts.ts < dim.vt)),
        )
        .select("event_id", "user_id", "run_id", "state")
        .orderBy("event_id")
    )


_Q91_SQL = """
WITH m AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, event_type, ts,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS run_id
  FROM m
), g AS (
  SELECT user_id, run_id, min(event_type) AS state, min(ts) AS vf
  FROM r GROUP BY user_id, run_id
), d AS (
  SELECT user_id, run_id, state, vf, lead(vf) OVER w2 AS vt
  FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
)
SELECT f.event_id, f.user_id, d.run_id, d.state
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') f
JOIN d ON f.user_id = d.user_id
      AND d.vf <= f.ts AND (d.vt IS NULL OR f.ts < d.vt)
ORDER BY f.event_id
"""


def q89_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse constraint audit (operators/quality.py integrity tier):
    primary-key uniqueness, not-null, accepted-values, and referential
    checks over the star schema, emitted as a uniform (check,
    n_violations) table — the dbt-tests shape, each check one aggregate
    or one anti-join. On clean data every row is 0; planted-violation
    behavior is pinned by tests/test_quality.py."""
    from ...operators.quality import (
        check_accepted_values,
        check_not_null,
        check_referential,
        check_unique,
        integrity_audit,
    )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    return integrity_audit(
        [
            check_unique(orders, ["o_orderkey"], "orders_pk_unique"),
            check_unique(
                li, ["l_orderkey", "l_linenumber"], "lineitem_pk_unique"
            ),
            check_not_null(orders, "o_custkey", "orders_custkey_not_null"),
            check_accepted_values(
                orders, "o_orderstatus", ["O", "F", "P"], "orders_status_values"
            ),
            check_referential(
                li, orders, "l_orderkey", "o_orderkey", "lineitem_orders_fk"
            ),
            check_referential(
                orders, cust, "o_custkey", "c_custkey", "orders_customer_fk"
            ),
        ]
    ).orderBy("check")


_Q89_SQL = """
SELECT 'orders_pk_unique' AS "check",
       count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
UNION ALL
SELECT 'lineitem_pk_unique',
       count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
UNION ALL
SELECT 'orders_custkey_not_null',
       count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
UNION ALL
SELECT 'orders_status_values',
       count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O','F','P')) FROM orders
UNION ALL
SELECT 'lineitem_orders_fk', count(*) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_customer_fk', count(*) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
ORDER BY "check"
"""


def q101_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE-INTO upsert (operators/incremental.merge_upsert):
    a CDC-style delta against the customer dimension — every custkey ≡ 3
    (mod 10) arrives as an UPDATE (+100 balance, segment stamped
    'UPDATED'), every custkey ≡ 7 (mod 10) spawns an INSERT under a fresh
    key — applied as one base-anti-join-∪-delta pass. The oracle replays
    MERGE's contract directly in SQL (base rows not in the delta key set,
    UNION ALL the delta), so a green hash proves update-wins, insert, and
    keep semantics simultaneously. The reference's drop-and-append sink
    (spotify_etl2.py to_sql 'append') has no update path; this is its
    scale-correct replacement."""
    from ...operators.incremental import merge_upsert

    cust = _t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    inserts = cust.filter(F.col("c_custkey") % 10 == 7).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("INSERTED").alias("c_mktsegment"),
    )
    merged = merge_upsert(cust, updates.unionByName(inserts), ["c_custkey"])
    return merged.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    ).orderBy("c_custkey")


_Q101_SQL = """
WITH delta AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal,
         'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT c_custkey + 1000000, 'new-' || c_name, c_nationkey, 0.0, 'INSERTED'
  FROM customer WHERE c_custkey % 10 = 7
)
SELECT c_custkey, c_name, CAST(c_nationkey AS INTEGER) AS c_nationkey,
       round(c_acctbal, 2) AS c_acctbal, c_mktsegment
FROM (
  SELECT * FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
  UNION ALL
  SELECT * FROM delta
)
ORDER BY c_custkey
"""


def q114_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (operators/layout.skew_report) over the
    events table's (event_type, user activity) — the one-row report that
    decides plain-shuffle vs AQE-skew-split vs explicit salting before a
    100 TB join. Recommended salt count is exact integer ceil-div; the
    distribution stats replay in SQL (DuckDB quantile_cont matches
    Spark's exact `percentile`)."""
    from ...operators.layout import skew_report

    ev = _t(spark, sf_dir, "events")
    return skew_report(ev, ["event_type"], top_k=3)


_Q114_SQL = """
WITH counts AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
), stats AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
         count(*) AS n_keys,
         CAST(max(cnt) AS BIGINT) AS max_key_rows,
         quantile_cont(cnt, 0.5) AS p50_key_rows,
         quantile_cont(cnt, 0.99) AS p99_key_rows
  FROM counts
), topk AS (
  SELECT array_to_string(list(kc ORDER BY cnt DESC, event_type), ', ')
           AS top_keys
  FROM (
    SELECT event_type, cnt, event_type || ':' || cnt AS kc
    FROM counts ORDER BY cnt DESC, event_type LIMIT 3
  )
)
SELECT n_rows, n_keys, max_key_rows,
       round(p50_key_rows, 2) AS p50_key_rows,
       round(p99_key_rows, 2) AS p99_key_rows,
       round(max_key_rows * n_keys / CAST(n_rows AS DOUBLE), 4) AS skew_factor,
       (max_key_rows * n_keys + n_rows - 1) // n_rows AS recommended_salts,
       top_keys
FROM stats CROSS JOIN topk
"""


def q116_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle + batch assignment
    (operators/layout.epoch_shuffle): every document's exact position and
    batch in the md5(seed:id) read order, computed with the DISTRIBUTED
    two-phase global rank (per-bucket partitioned window + broadcast
    bucket offsets) — never a single-partition ORDER BY window over the
    corpus. The oracle is the naive global row_number, proving the
    bucket-offset decomposition reproduces it row-for-row."""
    from ...operators.layout import epoch_shuffle

    docs = _t(spark, sf_dir, "documents")
    return epoch_shuffle(
        docs, id_col="doc_id", seed="epoch0", batch_size=64
    ).orderBy("global_pos")


_Q116_SQL = """
SELECT doc_id, shuffle_key,
       row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS global_pos,
       (row_number() OVER (ORDER BY shuffle_key, doc_id) - 1) // 64
         AS batch_id
FROM (
  SELECT doc_id, md5('epoch0:' || doc_id::VARCHAR) AS shuffle_key
  FROM documents
)
ORDER BY global_pos
"""


def q118_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: per type, flag hours whose count
    exceeds 3× the decay-weighted trailing baseline (EWMA over the 8
    previous observed hours, powers-of-two weights 128..1 — heaviest on
    the most recent lag). The ops-monitoring primitive a 100 TB ingest
    runs on its own telemetry.

    Exactness: the baseline is kept as an exact integer FRACTION
    (weighted sum ``num`` over weight total ``den`` — den shrinks at a
    series head where fewer lags exist), and the anomaly gate is the
    cross-multiplied integer comparison ``cnt·den > 3·num`` — no float
    division ever decides a flag, so the decision replays bit-for-bit
    in SQL. One aggregate exchange; the 8 lags share ONE window pass
    (operators/quality.rate_anomalies)."""
    from ...operators.quality import rate_anomalies

    ev = _t(spark, sf_dir, "events")
    return rate_anomalies(ev, factor=3, n_lags=8).orderBy(
        "event_type", "hour_ts"
    )


_Q118_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, count(*) AS cnt
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, hour_ts, cnt,
         lag(cnt, 1) OVER w AS l1, lag(cnt, 2) OVER w AS l2,
         lag(cnt, 3) OVER w AS l3, lag(cnt, 4) OVER w AS l4,
         lag(cnt, 5) OVER w AS l5, lag(cnt, 6) OVER w AS l6,
         lag(cnt, 7) OVER w AS l7, lag(cnt, 8) OVER w AS l8
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts)
), b AS (
  SELECT event_type, hour_ts, cnt,
         coalesce(l1,0)*128 + coalesce(l2,0)*64 + coalesce(l3,0)*32
           + coalesce(l4,0)*16 + coalesce(l5,0)*8 + coalesce(l6,0)*4
           + coalesce(l7,0)*2 + coalesce(l8,0)*1 AS baseline_num,
         (CASE WHEN l1 IS NOT NULL THEN 128 ELSE 0 END)
           + (CASE WHEN l2 IS NOT NULL THEN 64 ELSE 0 END)
           + (CASE WHEN l3 IS NOT NULL THEN 32 ELSE 0 END)
           + (CASE WHEN l4 IS NOT NULL THEN 16 ELSE 0 END)
           + (CASE WHEN l5 IS NOT NULL THEN 8 ELSE 0 END)
           + (CASE WHEN l6 IS NOT NULL THEN 4 ELSE 0 END)
           + (CASE WHEN l7 IS NOT NULL THEN 2 ELSE 0 END)
           + (CASE WHEN l8 IS NOT NULL THEN 1 ELSE 0 END) AS baseline_den
  FROM l
)
SELECT event_type, strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       cnt,
       CAST(baseline_num AS BIGINT) AS baseline_num,
       CAST(baseline_den AS BIGINT) AS baseline_den,
       (baseline_den > 0 AND cnt * baseline_den > 3 * baseline_num)
         AS is_anomaly,
       CASE WHEN baseline_den > 0 AND baseline_num > 0
            THEN round(CAST(cnt * baseline_den AS DOUBLE)
                       / CAST(baseline_num AS DOUBLE), 4)
       END AS rate_ratio
FROM b
ORDER BY event_type, hour_ts
"""


def q121_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-stats drift between two snapshot windows of the events
    table (operators/incremental.stats_drift): the first half of the
    month as "yesterday", the second as "today". Per column —
    row/null/distinct counts, null-rate delta, distinct ratio, and
    cross-multiplied integer drift flags (no float division decides a
    flag). One fused aggregate per side; both time filters reach the
    parquet scan."""
    from ...operators.incremental import stats_drift

    ev = _t(spark, sf_dir, "events")
    cut = "2024-01-16 00:00:00"
    old = ev.filter(F.col("ts") < cut)
    new = ev.filter(F.col("ts") >= cut)
    return stats_drift(
        old, new, ["event_type", "user_id", "value", "props"]
    ).orderBy("column")


_Q121_SQL = """
WITH o AS (
  SELECT count(*) AS n,
         count(event_type) AS nn_event_type,
         count(DISTINCT event_type) AS nd_event_type,
         count(user_id) AS nn_user_id,
         count(DISTINCT user_id) AS nd_user_id,
         count(value) AS nn_value, count(DISTINCT value) AS nd_value,
         count(props) AS nn_props, count(DISTINCT props) AS nd_props
  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
), nw AS (
  SELECT count(*) AS n,
         count(event_type) AS nn_event_type,
         count(DISTINCT event_type) AS nd_event_type,
         count(user_id) AS nn_user_id,
         count(DISTINCT user_id) AS nd_user_id,
         count(value) AS nn_value, count(DISTINCT value) AS nd_value,
         count(props) AS nn_props, count(DISTINCT props) AS nd_props
  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
), ou AS (
  SELECT 'event_type' AS column, n, nn_event_type AS nn, nd_event_type AS nd FROM o
  UNION ALL SELECT 'user_id', n, nn_user_id, nd_user_id FROM o
  UNION ALL SELECT 'value', n, nn_value, nd_value FROM o
  UNION ALL SELECT 'props', n, nn_props, nd_props FROM o
), nu AS (
  SELECT 'event_type' AS column, n, nn_event_type AS nn, nd_event_type AS nd FROM nw
  UNION ALL SELECT 'user_id', n, nn_user_id, nd_user_id FROM nw
  UNION ALL SELECT 'value', n, nn_value, nd_value FROM nw
  UNION ALL SELECT 'props', n, nn_props, nd_props FROM nw
)
SELECT ou.column,
       ou.n AS n_old, nu.n AS n_new,
       ou.n - ou.nn AS nulls_old, nu.n - nu.nn AS nulls_new,
       ou.nd AS distinct_old, nu.nd AS distinct_new,
       CASE WHEN ou.n > 0 AND nu.n > 0 THEN
         round(CAST(nu.n - nu.nn AS DOUBLE) / CAST(nu.n AS DOUBLE)
               - CAST(ou.n - ou.nn AS DOUBLE) / CAST(ou.n AS DOUBLE), 6)
       END AS null_rate_delta,
       CASE WHEN ou.nd > 0
            THEN round(CAST(nu.nd AS DOUBLE) / CAST(ou.nd AS DOUBLE), 4)
       END AS distinct_ratio,
       (abs((nu.n - nu.nn) * ou.n - (ou.n - ou.nn) * nu.n) * 100
          > 1 * ou.n * nu.n) AS null_drift,
       (nu.nd * 2 < ou.nd OR nu.nd > 2 * ou.nd) AS distinct_drift
FROM ou JOIN nu ON nu.column = ou.column
ORDER BY ou.column
"""


def q127_salted_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact⋈dim enrichment through the EXPLICIT salting path
    (operators/layout.salted_join): events scatter over 8 sub-keys, the
    customer dim replicates 8×, the join runs on (key, salt) — the
    plan a pipeline switches to when q114's skew report flags a hot key
    beyond AQE's split threshold. The oracle is the PLAIN join +
    rollup: a green hash proves salting is correctness-neutral
    (identical result set, different physical distribution) — the
    claim that makes the operator safe to drop into any hot join."""
    from ...operators.layout import salted_join

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(ev, cust, key="user_id", n_salts=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .orderBy("c_mktsegment")
    )


_Q127_SQL = """
SELECT c_mktsegment,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q128_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct-user counts through the SALTED two-phase
    path (operators/layout.salted_count_distinct): dedup inside
    (type, hash(user) % 32) buckets, then sum the per-bucket distincts
    — the plan a pipeline switches to when one group key owns most of
    the table and plain countDistinct melts its single reducer. The
    oracle is the plain COUNT(DISTINCT): a green hash proves the
    salted decomposition is exact (each distinct value lands in exactly
    one bucket), not an approximation."""
    from ...operators.layout import salted_count_distinct

    ev = _t(spark, sf_dir, "events")
    return salted_count_distinct(
        ev, ["event_type"], "user_id", n_salts=32
    ).orderBy("event_type")


_Q128_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_distinct_user_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q129_range_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth range-boundary plan for clustering lineitem by price
    (operators/layout.range_boundaries): exact 8-bucket quantile
    boundaries + realized per-bucket counts — the pinned input a
    range-clustered write uses instead of repartitionByRange's sample.
    Exact-percentile parity with quantile_cont makes the whole plan
    hash-checkable."""
    from ...operators.layout import range_boundaries

    li = _t(spark, sf_dir, "lineitem", parallelize=True)
    return range_boundaries(li, "l_extendedprice", n_buckets=8).orderBy(
        "bucket"
    )


_Q129_SQL = """
WITH b AS (
  SELECT quantile_cont(l_extendedprice,
           [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
  FROM lineitem
), assigned AS (
  SELECT len(list_filter(b.bs, x -> l.l_extendedprice > x)) AS bucket
  FROM lineitem l CROSS JOIN b
), counts AS (
  SELECT bucket, count(*) AS n_rows FROM assigned GROUP BY bucket
)
SELECT c.bucket, c.n_rows,
       CASE WHEN c.bucket >= 1 THEN round(b.bs[c.bucket], 4) END AS lo,
       CASE WHEN c.bucket <= 6 THEN round(b.bs[c.bucket + 1], 4) END AS hi
FROM counts c CROSS JOIN b
ORDER BY c.bucket
"""


def q131_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimate, computed EXACTLY from per-key
    counts: |events ⋈ customer on user_id| = Σ_k cA(k)·cB(k) — the
    number a planner wants BEFORE committing to a join strategy, at
    the cost of two narrow count aggregates + a key-cardinality join
    instead of the join itself. Also reports both sides' key counts
    and the max single-key contribution (the skew share that decides
    salting). All integers; the estimate is proven exact against the
    oracle's actual join count."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    ca = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("ca")
    )
    cb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").alias("cb")
    )
    per_key = ca.join(cb, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("contrib")
    )
    return per_key.agg(
        F.count("*").alias("n_join_keys"),
        F.sum("contrib").alias("est_join_rows"),
        F.max("contrib").alias("max_key_rows"),
    )


_Q131_SQL = """
WITH actual AS (
  SELECT e.user_id AS k
  FROM events e JOIN customer c ON c.c_custkey = e.user_id
)
SELECT count(DISTINCT k) AS n_join_keys,
       count(*) AS est_join_rows,
       CAST(max(per_key) AS BIGINT) AS max_key_rows
FROM actual
JOIN (SELECT k AS k2, count(*) AS per_key FROM actual GROUP BY k) m
  ON m.k2 = actual.k
"""


def q171_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs row-major clustering audit — the number that justifies
    OPTIMIZE ZORDER (operators/layout.zorder_key / write_zordered): bucket
    lineitem 32 ways by (a) the Morton interleave of (partkey, suppkey)
    low-16-bit halves and (b) the row-major key partkey·2¹⁶+suppkey, then
    report the mean in-bucket min-max WIDTH of each dimension. Row-major
    gives a razor-thin partkey range but the FULL suppkey range per
    bucket (zero pruning on the second dim); the Z-curve pays a modestly
    wider partkey range to shrink both — exactly the file-stats pruning
    trade a lakehouse makes. The key is the same codegen bit-arithmetic
    as the writer (bit b of column j lands at position b·2+j), replayed
    verbatim in the oracle; everything is integer until the two rounded
    mean divisions."""
    from ...operators.layout import zorder_key

    li = _t(spark, sf_dir, "lineitem")
    raw = li.select(
        F.col("l_partkey").alias("x0"), F.col("l_suppkey").alias("y0")
    )
    # Equal-width normalization to [0, 2^16) against the global min/max
    # (write_zordered's width_bucket step) in EXACT integer arithmetic —
    # without it a small key domain leaves the curve's high bits all
    # zero and every row in one bucket.
    stats = raw.agg(
        F.min("x0").alias("mnx"),
        F.max("x0").alias("mxx"),
        F.min("y0").alias("mny"),
        F.max("y0").alias("mxy"),
    )
    base = raw.crossJoin(F.broadcast(stats)).select(
        # `div` (Spark) / `//` (DuckDB): EXPLICIT integer division — a
        # float divide + CAST would truncate in Spark but ROUND in DuckDB.
        F.expr("(x0 - mnx) * 65536 div (mxx - mnx + 1)").alias("xp"),
        F.expr("(y0 - mny) * 65536 div (mxy - mny + 1)").alias("yp"),
    )
    keyed = base.select(
        "xp",
        "yp",
        F.shiftright(zorder_key(["xp", "yp"], bits=16), 27).alias("bz"),
        F.shiftright(F.col("xp") * 65536 + F.col("yp"), 27).alias("br"),
    )

    def ranges(bucket_col: str, layout: str) -> DataFrame:
        return (
            keyed.groupBy(F.col(bucket_col).alias("_b"))
            .agg(
                (F.max("xp") - F.min("xp")).alias("xr"),
                (F.max("yp") - F.min("yp")).alias("yr"),
            )
            .agg(
                F.count("*").alias("n_buckets"),
                F.sum("xr").alias("sx"),
                F.sum("yr").alias("sy"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "n_buckets",
                F.round(F.col("sx").cast("double") / F.col("n_buckets"), 2).alias(
                    "avg_partkey_range"
                ),
                F.round(F.col("sy").cast("double") / F.col("n_buckets"), 2).alias(
                    "avg_suppkey_range"
                ),
            )
        )

    return (
        ranges("bz", "zorder")
        .unionByName(ranges("br", "rowmajor"))
        .orderBy("layout")
    )


def _q171_sql() -> str:
    interleave = " + ".join(
        f"(((xp >> {b}) & 1) << {2 * b}) + (((yp >> {b}) & 1) << {2 * b + 1})"
        for b in range(16)
    )
    return f"""
WITH stats AS (
  SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
         min(l_suppkey) AS mny, max(l_suppkey) AS mxy
  FROM lineitem
), base AS (
  SELECT (l_partkey - mnx) * 65536 // (mxx - mnx + 1) AS xp,
         (l_suppkey - mny) * 65536 // (mxy - mny + 1) AS yp
  FROM lineitem CROSS JOIN stats
), keyed AS (
  SELECT xp, yp,
         ({interleave}) >> 27 AS bz,
         (xp * 65536 + yp) >> 27 AS br
  FROM base
), rz AS (
  SELECT bz AS b, max(xp) - min(xp) AS xr, max(yp) - min(yp) AS yr
  FROM keyed GROUP BY bz
), rr AS (
  SELECT br AS b, max(xp) - min(xp) AS xr, max(yp) - min(yp) AS yr
  FROM keyed GROUP BY br
)
SELECT 'zorder' AS layout, count(*) AS n_buckets,
       round(CAST(sum(xr) AS BIGINT) / CAST(count(*) AS DOUBLE), 2)
         AS avg_partkey_range,
       round(CAST(sum(yr) AS BIGINT) / CAST(count(*) AS DOUBLE), 2)
         AS avg_suppkey_range
FROM rz
UNION ALL
SELECT 'rowmajor', count(*),
       round(CAST(sum(xr) AS BIGINT) / CAST(count(*) AS DOUBLE), 2),
       round(CAST(sum(yr) AS BIGINT) / CAST(count(*) AS DOUBLE), 2)
FROM rr
ORDER BY layout
"""


def q176_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply WITH tombstones (operators/incremental.cdc_apply): the
    orders table as of 1999-01-01 is the stored state; later orders
    become a change stream where 'P'-status rows are DELETE tombstones
    and the rest are upserts, latest-per-key wins by order date. The
    oracle rebuilds the same final state from scratch with one window —
    a green hash proves apply(state, cdc) == rebuild(full), deletes
    included, which is the invariant a lakehouse MERGE with WHEN
    MATCHED ... DELETE must hold."""
    from ...operators.incremental import cdc_apply

    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp")
    base = o.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        "o_orderdate",
    )
    post = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        "o_orderdate",
        F.when(F.col("o_orderstatus") == "P", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    # Two CDC versions per changed key: the original change and a later
    # price correction one day on — so latest-per-key collapse is
    # genuinely exercised (v2 must win; v1 must leave no trace).
    v2 = post.select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("price_cents") + 5).alias("price_cents"),
        F.expr("o_orderdate + INTERVAL 1 DAY").alias("o_orderdate"),
        "op",
    )
    cdc = post.unionByName(v2)
    return (
        cdc_apply(base, cdc, keys=["o_orderkey"], order_col="o_orderdate")
        .select("o_orderkey", "o_orderstatus", "price_cents")
        .orderBy("o_orderkey")
    )


_Q176_SQL = """
WITH post AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderdate,
         CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op
  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
), cdc AS (
  SELECT * FROM post
  UNION ALL
  SELECT o_orderkey, o_orderstatus, price_cents + 5,
         o_orderdate + INTERVAL 1 DAY, op
  FROM post
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                 ORDER BY o_orderdate DESC) AS rn
    FROM cdc
  ) WHERE rn = 1
), base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
)
SELECT o_orderkey, o_orderstatus, price_cents FROM base
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
UNION ALL
SELECT o_orderkey, o_orderstatus, price_cents FROM latest WHERE op = 'U'
ORDER BY o_orderkey
"""


def q181_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (operators/expectations.py — the
    Deequ/Great-Expectations shape): six typed checks over the events
    stream compiled into ONE fused aggregate pass (check count never
    adds scans), unpivoted into a per-check report with exact integer
    violation counts. The oracle replays each check as plain SQL over
    the same scan — a green hash proves the compiler's semantics
    (NULL handling, uniqueness-as-excess, regex fullmatch) match the
    obvious SQL meaning."""
    from ...operators.expectations import (
        expectations_report,
        in_range,
        in_set,
        matches,
        min_rows,
        not_null,
        unique,
    )

    ev = _t(spark, sf_dir, "events")
    suite = [
        not_null("user_id"),
        unique("event_id"),
        in_range("value", 0, 1000),
        in_set("event_type", ["click", "error", "purchase", "signup", "view"]),
        matches("props", r"^\{.*\}$"),
        min_rows(1000),
    ]
    return expectations_report(ev, suite).orderBy("check")


_Q181_SQL = r"""
WITH a AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_nn,
         count(event_id) - count(DISTINCT event_id) AS v_uq,
         CAST(sum(CASE WHEN value IS NOT NULL AND (value < 0 OR value > 1000)
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_rng,
         CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                       ('click', 'error', 'purchase', 'signup', 'view')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
         CAST(sum(CASE WHEN props IS NOT NULL
                       AND NOT regexp_matches(props, '^\{.*\}$')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_re,
         greatest(0, 1000 - count(*)) AS v_min
  FROM events
)
SELECT u.check, u.col AS "column", a.n AS n_rows,
       u.v AS n_violations, u.v = 0 AS passed
FROM a, (
  SELECT 'in_range_value' AS check, 'value' AS col, v_rng AS v FROM a
  UNION ALL SELECT 'in_set_event_type', 'event_type', v_set FROM a
  UNION ALL SELECT 'matches_props', 'props', v_re FROM a
  UNION ALL SELECT 'min_rows', '', v_min FROM a
  UNION ALL SELECT 'not_null_user_id', 'user_id', v_nn FROM a
  UNION ALL SELECT 'unique_event_id', 'event_id', v_uq FROM a
) u
ORDER BY u.check
"""


def q325_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew audit for the lineitem ⋈ orders fact-fact join — the
    operational question AQE's skew-join handling answers at runtime,
    surfaced as a queryable relation so capacity planning can see it
    BEFORE the join runs: per-key mass distribution (max, exact p99,
    top-key share) and the worst-partition share under hash
    partitioning into 32 buckets (modeled with the engine-portable
    md5-slice hash so the DuckDB oracle replays the same assignment —
    a model of hash partitioning, not Spark's murmur3, but the same
    balls-in-bins statistics).

    Exactness: every output is an exact integer off the key-mass count
    table — p99 is a true order statistic (cumulative count table, the
    q41 idiom: smallest mass with cum ≥ ceil(0.99·n_keys), integer
    ceiling via (99·n+99) div 100... exactly (99·n_keys + 99) div 100
    ≡ ceil when n not divisible); shares are ppm integer divisions.

    Shape at 100 TB: ONE grouped pass over the fact table to the
    key-mass relation (map-side combine collapses in-key rows); the
    mass count table, partition rollup, and 1-row reduction are all
    bounded by |distinct masses| and 32."""
    li = _t(spark, sf_dir, "lineitem")
    km = li.groupBy("l_orderkey").agg(F.count("*").alias("m"))
    mc = km.groupBy("m").agg(F.count("*").alias("keys"))
    w = W.orderBy("m").rowsBetween(W.unboundedPreceding, 0)
    cum = mc.select(
        "m", "keys", F.sum("keys").over(w).alias("cum")
    )
    tot = mc.agg(
        F.sum("keys").alias("n_keys"),
        F.sum(F.expr("m * keys")).alias("n_rows"),
        F.max("m").alias("max_key_rows"),
    )
    p99 = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.expr("(99 * n_keys + 99) div 100"))
        .agg(F.min("m").alias("p99_key_rows"))
    )
    parts = (
        km.groupBy(
            F.expr(
                "pmod(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 8),"
                " 16, 10), 32)"
            ).alias("p")
        )
        .agg(F.sum("m").alias("pm"))
        .agg(
            F.max("pm").alias("max_part_rows"),
            F.count("*").alias("n_parts_hit"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(p99))
        .crossJoin(F.broadcast(parts))
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            "p99_key_rows",
            F.expr("(max_key_rows * 1000000) div n_rows").alias("top_key_ppm"),
            "max_part_rows",
            "n_parts_hit",
            F.expr("(max_part_rows * 1000000) div n_rows").alias(
                "max_part_ppm"
            ),
            F.expr("(max_part_rows * 32 * 1000) div n_rows").alias(
                "skew_ratio_milli"
            ),
        )
    )


_Q325_SQL = """
WITH km AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS m
  FROM lineitem GROUP BY 1
), mc AS (
  SELECT m, CAST(count(*) AS BIGINT) AS keys FROM km GROUP BY m
), cum AS (
  SELECT m, keys,
         sum(keys) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum
  FROM mc
), tot AS (
  SELECT CAST(sum(keys) AS BIGINT) AS n_keys,
         CAST(sum(m * keys) AS BIGINT) AS n_rows,
         CAST(max(m) AS BIGINT) AS max_key_rows
  FROM mc
), p99 AS (
  SELECT CAST(min(m) AS BIGINT) AS p99_key_rows
  FROM cum CROSS JOIN tot
  WHERE cum >= (99 * n_keys + 99) // 100
), parts AS (
  SELECT CAST(max(pm) AS BIGINT) AS max_part_rows,
         CAST(count(*) AS BIGINT) AS n_parts_hit
  FROM (
    SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
             % 32 AS p,
           CAST(sum(m) AS BIGINT) AS pm
    FROM km GROUP BY 1
  )
)
SELECT n_keys, n_rows, max_key_rows, p99_key_rows,
       CAST((max_key_rows * 1000000) // n_rows AS BIGINT) AS top_key_ppm,
       max_part_rows, n_parts_hit,
       CAST((max_part_rows * 1000000) // n_rows AS BIGINT) AS max_part_ppm,
       CAST((max_part_rows * 32 * 1000) // n_rows AS BIGINT)
         AS skew_ratio_milli
FROM tot CROSS JOIN p99 CROSS JOIN parts
"""


def q283_deletion_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten deletion manifest: given an opt-out subject
    list (here the deterministic 1-in-97 md5 sample of customers — in
    production an uploaded consent table), enumerate every row that
    must be purged across the star schema — customer rows, their
    orders, the lineitems of those orders, and their events — as one
    per-table manifest with row counts and key ranges. The compliance
    primitive a training-data pipeline runs BEFORE a rebuild so the
    purge is verifiable (counts + key bounds) rather than fire-and-
    forget.

    Shape at 100 TB: the subject list is corpus-small and broadcasts
    into LEFT SEMI joins on every fact table (no fact ever shuffles);
    the orders→lineitem hop reuses the semi-joined order keys, again
    broadcast. All outputs are exact integers."""
    cust = _t(spark, sf_dir, "customer")
    subjects = cust.filter(
        F.expr(
            "conv(substr(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10)"
            " % 97 = 0"
        )
    ).select("c_custkey").localCheckpoint(eager=True)
    orders = _t(spark, sf_dir, "orders").join(
        F.broadcast(subjects),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    okeys = orders.select("o_orderkey").localCheckpoint(eager=True)
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(okeys),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    ev = _t(spark, sf_dir, "events").join(
        F.broadcast(subjects),
        F.col("user_id") == F.col("c_custkey"),
        "left_semi",
    )

    def manifest(df, table, key):
        return df.agg(
            F.lit(table).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.min(key).cast("long").alias("min_key"),
            F.max(key).cast("long").alias("max_key"),
        )

    out = (
        manifest(subjects, "customer", "c_custkey")
        .unionByName(manifest(orders, "orders", "o_orderkey"))
        .unionByName(manifest(li, "lineitem", "l_orderkey"))
        .unionByName(manifest(ev, "events", "event_id"))
    )
    return out.orderBy("table_name")


_Q283_SQL = """
WITH subjects AS (
  SELECT c_custkey FROM customer
  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
        % 97 = 0
), ords AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM subjects)
), li AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM ords)
), ev AS (
  SELECT event_id FROM events
  WHERE user_id IN (SELECT c_custkey FROM subjects)
)
SELECT * FROM (
  SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(min(c_custkey) AS BIGINT) AS min_key,
         CAST(max(c_custkey) AS BIGINT) AS max_key
  FROM subjects
  UNION ALL
  SELECT 'orders', CAST(count(*) AS BIGINT),
         CAST(min(o_orderkey) AS BIGINT), CAST(max(o_orderkey) AS BIGINT)
  FROM ords
  UNION ALL
  SELECT 'lineitem', CAST(count(*) AS BIGINT),
         CAST(min(l_orderkey) AS BIGINT), CAST(max(l_orderkey) AS BIGINT)
  FROM li
  UNION ALL
  SELECT 'events', CAST(count(*) AS BIGINT),
         CAST(min(event_id) AS BIGINT), CAST(max(event_id) AS BIGINT)
  FROM ev
)
ORDER BY table_name
"""


def q292_rendezvous_resharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment audit for
    growing a keyspace from 8 to 10 shards: per customer key the winner
    is argmax_s h(s, key), so ONLY keys won by the two NEW shards move
    — the minimal-movement property that makes HRW the right layout for
    a stored ANN index or a keyed feature store (vs mod-N, which moves
    ~8/10 of all keys). Reports per-shard load under 10 shards, how
    many keys arrived by migration, and the global moved share.

    Exactness/portability: the argmax is the max of ten exact BIGINTs
    h(s,key)·16 + s (md5-slice h < 2^32, s < 16 — a built-in argmax/
    max_by would tie-break nondeterministically); shard id is that
    max % 16. Pure projection per key, one grouped pass.

    Shape at 100 TB: zero joins, zero explode — greatest() over ten
    codegen'd expressions per row, then a 10-row groupBy."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")

    def score(s: int) -> str:
        return (
            "conv(substr(md5(concat('rdv:', CAST("
            f"{s} AS STRING), ':', CAST(c_custkey AS STRING))), 1, 8),"
            f" 16, 10) * 16 + {s}"
        )

    g8 = "greatest(" + ", ".join(score(s) for s in range(8)) + ")"
    g10 = "greatest(" + ", ".join(score(s) for s in range(10)) + ")"
    assigned = cust.select(
        F.expr(f"CAST(({g8}) % 16 AS INT)").alias("shard8"),
        F.expr(f"CAST(({g10}) % 16 AS INT)").alias("shard10"),
    ).localCheckpoint(eager=True)
    tot = assigned.agg(
        F.count("*").alias("n_keys"),
        F.sum(
            F.when(F.col("shard8") != F.col("shard10"), 1).otherwise(0)
        ).alias("moved"),
    )
    return (
        assigned.groupBy("shard10")
        .agg(
            F.count("*").alias("n_keys_shard"),
            F.sum(
                F.when(F.col("shard8") != F.col("shard10"), 1).otherwise(0)
            ).alias("n_migrated_in"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("shard10").alias("shard"),
            "n_keys_shard",
            "n_migrated_in",
            "n_keys",
            F.expr("(moved * 1000000L) div n_keys").alias("moved_ppm"),
        )
        .orderBy("shard")
    )


def _q292_sql() -> str:
    def score(s: int) -> str:
        return (
            f"('0x' || substr(md5('rdv:' || CAST({s} AS VARCHAR) || ':'"
            f" || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT * 16 + {s}"
        )

    g8 = "greatest(" + ", ".join(score(s) for s in range(8)) + ")"
    g10 = "greatest(" + ", ".join(score(s) for s in range(10)) + ")"
    return f"""
WITH assigned AS (
  SELECT CAST(({g8}) % 16 AS INTEGER) AS shard8,
         CAST(({g10}) % 16 AS INTEGER) AS shard10
  FROM customer
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN shard8 <> shard10 THEN 1 ELSE 0 END) AS BIGINT)
           AS moved
  FROM assigned
)
SELECT shard10 AS shard,
       CAST(count(*) AS BIGINT) AS n_keys_shard,
       CAST(sum(CASE WHEN shard8 <> shard10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_migrated_in,
       n_keys,
       CAST((moved * 1000000) // n_keys AS BIGINT) AS moved_ppm
FROM assigned CROSS JOIN tot
GROUP BY shard10, n_keys, moved
ORDER BY shard
"""


def q359_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan for the drip-fed events table
    (operators/layout.compaction_plan): consecutive daily micro-
    batches grouped by fixed-quota cumulative splitting into
    ~1000-row rewrite groups, each group reporting its day range, row
    count, and an ``oversized`` flag when the group's TOTAL exceeds
    the budget (a single over-budget day, or several sub-budget days
    quota-split into one group) — the maintenance relation a
    lakehouse OPTIMIZE job
    executes, made driver-visible. Quota splitting is a pure function
    of the daily prefix sums, so the plan is deterministic across
    engines and reruns (no greedy sequential scan).

    Exactness: all integers; dates exact; the flag an integer
    comparison.

    Shape at 100 TB: one map-side-combined daily rollup; the prefix
    window runs on the bounded ≤|days| relation."""
    from ...operators.layout import compaction_plan

    events = load_table(spark, sf_dir, "events")
    return compaction_plan(events, ts_col="ts", target_rows=1000)


_Q359_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events
  GROUP BY 1
), assigned AS (
  SELECT d, n,
         CAST(floor(coalesce(sum(n) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) / 1000.0) AS BIGINT) AS group_id
  FROM daily
)
SELECT group_id,
       min(d) AS d_from,
       max(d) AS d_to,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(n) AS BIGINT) > 1000 AS oversized
FROM assigned
GROUP BY group_id
ORDER BY group_id
"""


def q362_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay planner: the out-of-orderness profile of the
    events stream — for every event, its lateness versus the maximum
    event time among STRICTLY EARLIER arrivals (arrival order =
    event_id), bucketed into the delay tiers a streaming job chooses
    its ``withWatermark`` bound from (ST3/ST4's 'how late is late
    data actually' question answered from the batch archive).

    Exactness: timestamps to epoch micros (exact BIGINTs); lateness
    is an integer subtraction; tiers are integer comparisons;
    share_ppm the exact integer (n·10⁶) div total. Rows with NULL ts
    are excluded from the profile (see lateness_us — they carry no
    lateness semantics and previously read as on-time).

    Shape at 100 TB: the naive form is one GLOBAL ordered running-max
    window (single-partition scale killer). Here it is the q214/q224
    two-phase prefix machinery applied to prefix-MAX: arrivals bucket
    into a FIXED ≤1025-cell event_id grid (width = max_id div 1024
    + 1, a broadcast 1-row derivation — the cell count stays bounded
    at ANY corpus size, unlike a fixed-width bucketing whose cell
    relation grows with n), per-bucket maxima map-side combine, the
    bounded bucket relation is prefix-maxed, and the broadcast bucket
    prefix combines with a bucket-partitioned within-bucket window —
    arrival order is preserved end to end, no global sort ever
    touches raw rows."""
    from ...operators.incremental import lateness_tier_counts

    events = load_table(spark, sf_dir, "events")
    return (
        lateness_tier_counts(events)
        .select(
            "lateness_tier",
            "n_events",
            F.expr(
                "(n_events * 1000000)"
                " div (sum(n_events) OVER ())"
            ).alias("share_ppm"),
        )
        .orderBy("lateness_tier")
    )


_Q362_SQL = """
WITH base AS (
  SELECT event_id, epoch_us(ts) AS t_us
  FROM events
  WHERE ts IS NOT NULL
), late AS (
  SELECT CASE WHEN prev_max IS NULL THEN 0
              ELSE greatest(0, prev_max - t_us) END AS late_us
  FROM (
    SELECT t_us,
           max(t_us) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
    FROM base
  )
), tiers AS (
  SELECT CASE WHEN late_us = 0 THEN '0_on_time'
              WHEN late_us < 1000000 THEN '1_under_1s'
              WHEN late_us < 60000000 THEN '2_under_1m'
              WHEN late_us < 3600000000 THEN '3_under_1h'
              ELSE '4_1h_plus' END AS lateness_tier
  FROM late
)
SELECT lateness_tier,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((count(*) * 1000000) // (sum(count(*)) OVER ()) AS BIGINT)
         AS share_ppm
FROM tiers
GROUP BY lateness_tier
ORDER BY lateness_tier
"""


def q370_shuffle_mixing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-mixing audit of the q116 training-epoch order: how often
    do ADJACENT positions in the shuffled read order carry the same
    source? Poorly mixed epochs feed the trainer long same-source runs
    (the gradient-correlation failure a corpus shuffle exists to
    prevent); under a uniform random permutation the expected count of
    same-source adjacencies is exactly E[m] = Σ_s n_s(n_s−1)/N, so
    mixing_ratio_ppm = m·N·10⁶ div Σ_s n_s(n_s−1) reads 1,000,000 for
    perfect mixing, above it for clumping.

    Exactness: positions come from the audited epoch_shuffle two-phase
    exact rank (oracle: the naive global row_number); the adjacency
    relation is a JOIN on consecutive integers (global_pos = pos+1) —
    no window over raw rows; all outputs are exact integers and
    cleared-denominator divs. Single-doc sources contribute 0 to the
    denominator; a denominator of 0 (all sources singleton) → NULL
    ratio.

    Shape at 100 TB: epoch_shuffle's one data exchange, a doc_id-keyed
    source attach, one hash join on the consecutive-position key, two
    1-row aggregates."""
    from ...operators.layout import epoch_shuffle

    docs = _t(spark, sf_dir, "documents")
    pos = epoch_shuffle(
        docs, id_col="doc_id", seed="epoch0", batch_size=64
    ).select("doc_id", "global_pos").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    nxt = pos.select(
        (F.col("global_pos") - 1).alias("global_pos"),
        F.col("source").alias("next_source"),
    )
    adj = pos.join(nxt, "global_pos").agg(
        F.count("*").alias("n_adjacent_pairs"),
        F.sum(
            F.expr("CASE WHEN source = next_source THEN 1 ELSE 0 END")
        ).cast("long").alias("n_same_source"),
    )
    per = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = per.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1)")).alias("pairs2"),
    )
    return adj.crossJoin(F.broadcast(tot)).select(
        "n_rows",
        "n_adjacent_pairs",
        "n_same_source",
        F.expr("CAST(pairs2 * 1000000 div n_rows AS BIGINT)").alias(
            "expected_same_micro"
        ),
        F.expr(
            "CASE WHEN pairs2 > 0 THEN"
            " CAST(CAST(n_same_source AS DECIMAL(38,0)) * n_rows"
            " * 1000000 div pairs2 AS BIGINT) END"
        ).alias("mixing_ratio_ppm"),
    )


_Q370_SQL = """
WITH pos AS (
  SELECT source,
         row_number() OVER (
           ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id
         ) - 1 AS global_pos
  FROM documents
), adj AS (
  SELECT CAST(count(*) AS BIGINT) AS n_adjacent_pairs,
         CAST(sum(CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
              AS BIGINT) AS n_same_source
  FROM pos a JOIN pos b ON b.global_pos = a.global_pos + 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS pairs2
  FROM (SELECT source, count(*) AS n FROM documents GROUP BY source)
)
SELECT n_rows, n_adjacent_pairs, n_same_source,
       CAST(pairs2 * 1000000 // n_rows AS BIGINT) AS expected_same_micro,
       CASE WHEN pairs2 > 0 THEN
         CAST(CAST(n_same_source AS HUGEINT) * n_rows * 1000000 // pairs2
              AS BIGINT) END AS mixing_ratio_ppm
FROM adj CROSS JOIN tot
"""


def q378_watermark_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay COST curve: for each candidate
    ``withWatermark`` bound (0s, 1s, 10s, 1m, 10m, 1h), the number and
    ppm share of events that would arrive TOO LATE and be dropped —
    the decision table on top of q362's tier profile (q362 describes
    how late data is; this prices each candidate bound so an operator
    picks the knee of the curve: a bigger delay drops less but holds
    proportionally more state and delays results by the bound).

    Exactness: per-event lateness is the exact integer micro gap from
    the shared ``operators/incremental.lateness_us`` core (the q362
    two-phase prefix-MAX — no global sort touches raw rows; NULL-ts
    rows excluded, see lateness_us); each
    candidate's drop count is an integer conditional sum over ONE
    shared lateness pass (the 6 candidates explode AFTER the per-event
    lateness is computed, so the prefix machinery runs once);
    drop_ppm is integer division.

    Shape at 100 TB: the q362 shape plus a 6-way explode feeding one
    map-side-combined aggregate to 6 rows."""
    from ...operators.incremental import lateness_us

    events = load_table(spark, sf_dir, "events")
    delays = [0, 1000000, 10000000, 60000000, 600000000, 3600000000]
    late = lateness_us(events)
    return (
        late.select(
            "late_us",
            F.explode(
                F.array(*[F.lit(d).cast("long") for d in delays])
            ).alias("delay_us"),
        )
        .groupBy("delay_us")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("late_us") > F.col("delay_us"), 1).otherwise(0)
            ).cast("long").alias("n_dropped"),
        )
        .select(
            "delay_us",
            "n_events",
            "n_dropped",
            F.expr("(n_dropped * 1000000) div n_events").alias("drop_ppm"),
        )
        .orderBy("delay_us")
    )


_Q378_SQL = """
WITH base AS (
  SELECT event_id, epoch_us(ts) AS t_us
  FROM events
  WHERE ts IS NOT NULL
), late AS (
  SELECT CASE WHEN prev_max IS NULL THEN 0
              ELSE greatest(0, prev_max - t_us) END AS late_us
  FROM (
    SELECT t_us,
           max(t_us) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
    FROM base
  )
), curve AS (
  SELECT d.delay_us,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN late_us > d.delay_us THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dropped
  FROM late
  CROSS JOIN (SELECT unnest([0, 1000000, 10000000, 60000000,
                             600000000, 3600000000]) AS delay_us) d
  GROUP BY d.delay_us
)
SELECT CAST(delay_us AS BIGINT) AS delay_us, n_events, n_dropped,
       (n_dropped * 1000000) // n_events AS drop_ppm
FROM curve
ORDER BY delay_us
"""
