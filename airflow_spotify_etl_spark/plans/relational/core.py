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
    _t,
)


# --------------------------------------------------------------------------
# Aggregation suite (A1-A7): TPC-H Q1-style pricing summary.
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate in one pass (A1 avg, A2 count, A4 min/max,
    A6 round — reference computes each stat in a separate pass,
    spotify_etl.py:264-265, spotify_etl2.py:272-274)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", "decimal(4,2)")
    tax = _dec("l_tax", "decimal(4,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # l_quantity is integer-valued: double sums are already exact.
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (1 - disc)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * (1 - disc) * (1 + tax)), 2)
            .cast("double")
            .alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("l_extendedprice")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                                      AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)          AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)   AS sum_charge,
       sum(l_quantity) / count(l_quantity)                                  AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / count(l_extendedprice)                                           AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
         / count(l_discount)                                                AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Flagship: scan → filter → join → agg → sort → limit (SURVEY.md §7 Phase 0).
# --------------------------------------------------------------------------
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style top-K revenue orders (T1 top-k semantics —
    spotify_etl.py:146,153 delegates top-10-by-popularity to the API; here
    the engine computes it). customer scales WITH the fact tables (TPC-H
    sf1 = 150k rows; hundreds of GB at 100 TB), so no broadcast hint — AQE
    picks broadcast at small SF and shuffle-hash/sort-merge at scale."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .withColumn("o_orderdate", F.to_date("o_orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q02_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q03_segment_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top market segments by average order value over the trailing 90 days
    of the data (F5 time-range filter, spotify_etl2.py:102-117, as a
    data-relative predicate; A1/A2/A6 aggregates). Scalar subquery for the
    cutoff — Catalyst evaluates it once and folds it into the scan filter."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*)                   AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(o_totalprice)     AS avg_order_value,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 90 DAYS FROM orders)
        GROUP BY c_mktsegment
        ORDER BY avg_order_value DESC, c_mktsegment
        LIMIT 5
        """
    )


_Q03_SQL = """
SELECT c_mktsegment,
       count(*)                    AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         / count(o_totalprice)     AS avg_order_value,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)
GROUP BY c_mktsegment
ORDER BY avg_order_value DESC, c_mktsegment
LIMIT 5
"""


def q04_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join (J1-J3 star joins implied by the reference's
    captured FKs, new.py:124-126). Only TRUE dims (region 5 rows, nation 25
    rows — fixed size at any SF) carry broadcast hints; customer/supplier
    scale with the data, so AQE chooses their join strategy from runtime
    sizes (broadcast at small SF, shuffle join at 100 TB)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


_Q04_SQL = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
       count(*)                                          AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN customer ON o_custkey  = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# Global + grouped statistics over events (A1-A6, K4 summary record).
# --------------------------------------------------------------------------
def q05_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's XCom summary record (spotify_etl.py:275-281,
    new.py:250-263: count / count-distinct / rounded avg / min-max range /
    conditional count) as ONE multi-aggregate pass."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(_dec("value")).cast("double") / F.count("value")).alias("avg_value"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )


_Q05_SQL = """
SELECT count(*)                                   AS n_rows,
       count(DISTINCT user_id)                    AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
       epoch_us(min(ts))                          AS first_ts_us,
       epoch_us(max(ts))                          AS last_ts_us,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
FROM events
"""


def q06_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped generalization of the reference's global stats (SURVEY.md
    §2.4: 'grouped versions are the natural generalization')."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(_dec("value")).cast("double") / F.count("value")).alias("avg_value"),
            F.to_date(F.min("ts")).alias("first_date"),
            F.to_date(F.max("ts")).alias("last_date"),
            F.count_if(F.col("value") > 100.0).alias("n_high_value"),
        )
        .orderBy("event_type")
    )


_Q06_SQL = """
SELECT event_type,
       count(*)                              AS n_events,
       count(DISTINCT user_id)               AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
       CAST(min(ts) AS DATE)                 AS first_date,
       CAST(max(ts) AS DATE)                 AS last_date,
       count(*) FILTER (WHERE value > 100.0) AS n_high_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q07_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily window as a batch aggregation (ST6: the reference's
    daily Airflow batch ≈ 1-day tumbling window, spotify_dag.py:23 +
    spotify_etl2.py:102-104). Streaming variant lives in
    streaming/pipelines.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .orderBy("event_date")
    )


_Q07_SQL = """
SELECT CAST(ts AS DATE)     AS event_date,
       count(*)             AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date
"""


# --------------------------------------------------------------------------
# Top-K / windows (T1, T2, W1).
# --------------------------------------------------------------------------
def q08_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-K via row_number window (T1 generalized per-group:
    row_number over partitionBy — SURVEY.md §2.5). Ties broken on the
    ROUNDED total then user_id so both engines pick identical rows."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(_dec("value")).cast("double").alias("total_value"),
        F.count("*").alias("n_events"),
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "user_id", "total_value", "n_events")
        .orderBy("event_type", "rank")
    )


_Q08_SQL = """
SELECT event_type, rank, user_id, total_value, n_events
FROM (
  SELECT event_type, user_id, total_value, n_events,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY total_value DESC, user_id) AS rank
  FROM (
    SELECT event_type, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(*)             AS n_events
    FROM events GROUP BY event_type, user_id
  )
)
WHERE rank <= 3
ORDER BY event_type, rank
"""


def q09_recency_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — the reference's only window function: sequential rank over
    recency order with a limit (new.py:108,114 `rank = idx+1` over
    most-recent-first items, clamp new.py:97). orderBy+limit prunes to 50
    rows BEFORE the single-partition window — top-K never globally sorts
    the full table (Spark uses TakeOrderedAndProject)."""
    ev = _t(spark, sf_dir, "events")
    top = ev.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(50)
    w = W.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )


_Q09_SQL = """
SELECT row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rank,
       event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 50
"""


# --------------------------------------------------------------------------
# Joins beyond equi (J4 anti, J5 range/as-of) + set ops (§2.7).
# --------------------------------------------------------------------------
def q10_purchases_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J4 — the incremental-dedup join the reference NEEDS
    but lacks: its append sink would double-insert on re-run,
    spotify_etl2.py:220). Purchases by users who never hit an error."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    error_users = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return (
        purchases.join(error_users, "user_id", "left_anti")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .orderBy("event_id")
    )


_Q10_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
FROM events p
WHERE event_type = 'purchase'
  AND NOT EXISTS (SELECT 1 FROM events e
                  WHERE e.event_type = 'error' AND e.user_id = p.user_id)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Projection / scalar-expression layer (P1-P12).
# --------------------------------------------------------------------------
def q13_flatten_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flatten-with-defaults projection (P1/P9:
    `.get(k, default)` on every field, spotify_etl.py:241-250) + JSON field
    extraction from a raw payload column, date slice (P5:
    `played_at[:10]`, spotify_etl2.py:170) and epoch-ms (P6,
    spotify_etl2.py:102-104). All built-in Catalyst expressions — no UDFs.

    Presentation sort below the projection (r10, same reasoning as
    q45): range-exchange sampling runs its child twice, so sorting the
    raw events first and projecting after runs the JSON extraction once
    (0.98 s -> 0.59 s at sf0.1), byte-identical output."""
    ev = _t(spark, sf_dir, "events").orderBy("event_id")
    return ev.select(
        "event_id",
        F.coalesce("event_type", F.lit("Unknown")).alias("event_type_filled"),
        F.coalesce(
            F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)
        ).alias("prop_k"),
        F.substring(F.col("ts").cast("string"), 1, 10).alias("event_date_str"),
        F.unix_millis("ts").alias("ts_ms"),
        F.coalesce("value", F.lit(0.0)).alias("value_filled"),
    )


_Q13_SQL = """
SELECT event_id,
       coalesce(event_type, 'Unknown')                               AS event_type_filled,
       coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS prop_k,
       substr(CAST(ts AS VARCHAR), 1, 10)                            AS event_date_str,
       epoch_ms(ts)                                                  AS ts_ms,
       coalesce(value, 0.0)                                          AS value_filled
FROM events
ORDER BY event_id
"""


def q14_duration_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — ms → 'm:ss' display format (new.py:170) via format_string;
    P10 string concat. round() before the bigint cast because Spark CAST
    truncates while DuckDB CAST rounds."""
    ev = _t(spark, sf_dir, "events")
    ms = F.round(F.col("value") * 1000, 0).cast("bigint")
    return ev.select(
        "event_id",
        ms.alias("duration_ms"),
        F.format_string(
            "%d:%02d", (ms / 60000).cast("bigint"), ((ms % 60000) / 1000).cast("bigint")
        ).alias("duration_str"),
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("user_tag"),
    ).orderBy("event_id")


_Q14_SQL = """
SELECT event_id,
       CAST(round(value * 1000, 0) AS BIGINT) AS duration_ms,
       printf('%d:%02d',
              CAST(round(value * 1000, 0) AS BIGINT) // 60000,
              (CAST(round(value * 1000, 0) AS BIGINT) % 60000) // 1000) AS duration_str,
       'user-' || CAST(user_id AS VARCHAR) AS user_tag
FROM events
ORDER BY event_id
"""


def q15_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup grouping sets (§2.4: 'free via df.rollup — include in engine
    surface for summary reporting')."""
    ev = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    return (
        ev.rollup("event_type", "event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        # Rollup NULL keys → '(all)' sentinels so the subtotal rows hash
        # identically across engines (and read better downstream).
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.date_format("event_date", "yyyy-MM-dd"), F.lit("(all)")).alias(
                "event_date"
            ),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "event_date")
    )


_Q15_SQL = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(strftime(event_date, '%Y-%m-%d'), '(all)') AS event_date,
       n_events, total_value
FROM (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
)
ORDER BY event_type, event_date
"""


def q16_shipdate_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 range predicate join: lineitems shipped within 90 days of their
    order date (the reference's freshness-window compare,
    spotify_etl2.py:71-84, as a join predicate). Equi-key + range filter →
    Catalyst runs the equi-join and applies the range as a post-filter, so
    no nested-loop blowup at scale."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_shipped_90d"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_Q16_SQL = """
SELECT o_orderpriority,
       count(*)                         AS n_shipped_90d,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q17_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J5): for each purchase, the most recent click at-or-before
    it by the same user — via operators/joins.asof_join (union + window
    strategy: one shuffle on user_id, no nested loop; scales as a single
    sort-within-partition at 100 TB)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        "click_event_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
    ).orderBy("event_id")


_Q17_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS purchase_ts_us,
       click_event_id, epoch_us(click_ts) AS click_ts_us
FROM (
  SELECT event_id, user_id, ts, is_left,
         last_value(CASE WHEN NOT is_left THEN src_event_id END IGNORE NULLS)
           OVER w AS click_event_id,
         last_value(CASE WHEN NOT is_left THEN ts END IGNORE NULLS)
           OVER w AS click_ts
  FROM (
    SELECT event_id, user_id, ts, TRUE AS is_left, NULL::BIGINT AS src_event_id
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT NULL AS event_id, user_id, ts, FALSE AS is_left, event_id AS src_event_id
    FROM events WHERE event_type = 'click'
  )
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
WHERE is_left
ORDER BY event_id
"""


def q37_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window surface beyond W1 (SURVEY.md §2.5: rank/dense_rank/
    lag/lead + frame-spec rolling aggregates are 'absent in reference, free
    in Spark' — this registers them as engine surface). One shuffle on
    user_id serves every window (same partitioning reused)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_rank = W.partitionBy("user_id").orderBy("event_type")
    roll = w.rowsBetween(-2, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.sum("value").over(roll), 2).alias("rolling3_value"),
        F.rank().over(w_rank).alias("type_rank"),
        F.dense_rank().over(w_rank).alias("type_dense_rank"),
    ).orderBy("user_id", "ts_us", "event_id")


_Q37_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(lag(value)  OVER w, 2) AS prev_value,
       round(lead(value) OVER w, 2) AS next_value,
       round(sum(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                                    AS rolling3_value,
       rank()       OVER wr AS type_rank,
       dense_rank() OVER wr AS type_dense_rank
FROM events
WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
       wr AS (PARTITION BY user_id ORDER BY event_type)
ORDER BY user_id, ts_us, event_id
"""


def q38_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (§2.4 extension): daily event counts pivoted by event_type —
    `groupBy().pivot()` with the value list EXPLICIT, so Catalyst skips the
    extra distinct-values job and the output schema is fixed at plan time
    (the scale-safe way to pivot; an unbounded value set would make schema
    depend on data)."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    return (
        ev.groupBy("event_date")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("event_date")
    )


_Q38_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'error')    AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date
"""


def q39_above_type_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (§2.6 extension — TPC-H Q2/Q17 idiom):
    parts priced above 1.02x their type's average. Catalyst DECORRELATES
    the subquery into an aggregate + join — no per-row re-execution; at
    100 TB this is one grouped aggregate over part plus one join, both
    shuffling on p_type."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_type, round(p_retailprice, 2) AS price
        FROM part p
        WHERE p_retailprice > 1.02 * (
            SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(p2.p_retailprice)
    FROM part p2 WHERE p2.p_type = p.p_type
        )
        ORDER BY p_partkey
        """
    )


_Q39_SQL = """
SELECT p_partkey, p_type, round(p_retailprice, 2) AS price
FROM part p
WHERE p_retailprice > 1.02 * (
    SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(p2.p_retailprice)
    FROM part p2 WHERE p2.p_type = p.p_type
)
ORDER BY p_partkey
"""


def q40_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + semi-join (TPC-H Q18 idiom): customers whose order count
    and total spend clear thresholds, with their names semi-joined back.
    The HAVING filter runs on the aggregate BEFORE the dimension join, so
    only qualifying keys reach the join at scale."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, b.n_orders, b.total_spend
        FROM (
            SELECT o_custkey, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
            FROM orders
            GROUP BY o_custkey
            HAVING count(*) >= 8
        ) b
        JOIN customer c ON c.c_custkey = b.o_custkey
        ORDER BY b.total_spend DESC, c.c_custkey
        LIMIT 50
        """
    )


_Q40_SQL = """
SELECT c.c_custkey, c.c_name, b.n_orders, b.total_spend
FROM (
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 8
) b
JOIN customer c ON c.c_custkey = b.o_custkey
ORDER BY b.total_spend DESC, c.c_custkey
LIMIT 50
"""


def q44_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (§2.4 extension, completing the rollup/pivot
    family): all 4 aggregation granularities of (event_type, event_date)
    in ONE pass — Catalyst expands the grouping sets before the single
    shuffle rather than scanning per granularity."""
    ev = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    return (
        ev.cube("event_type", "event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.date_format("event_date", "yyyy-MM-dd"), F.lit("(all)")).alias(
                "event_date"
            ),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "event_date")
    )


_Q44_SQL = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(strftime(event_date, '%Y-%m-%d'), '(all)') AS event_date,
       n_events, total_value
FROM (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY CUBE (event_type, CAST(ts AS DATE))
)
ORDER BY event_type, event_date
"""


def q60_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance similarity self-join over the part catalog
    (entity resolution: near-identical SKU names). Blocking key = the noun
    (last token); the Levenshtein verify runs only within a block, with the
    LSH-style cap dropping degenerate blocks (operators/joins.py
    fuzzy_self_join)."""
    from ...operators.joins import fuzzy_self_join

    part = load_table(spark, sf_dir, "part")
    return fuzzy_self_join(part, "p_name", max_dist=2).orderBy(
        "name_a", "name_b"
    )


_Q60_SQL = """
WITH n AS (
  SELECT DISTINCT p_name AS v FROM part
), b AS (
  SELECT v, string_split(v, ' ')[-1] AS blk FROM n
), c AS (
  SELECT v, blk FROM (
    SELECT v, blk, count(*) OVER (PARTITION BY blk) AS bn FROM b
  ) WHERE bn <= 1000
)
SELECT a.v AS name_a, r.v AS name_b, levenshtein(a.v, r.v) AS dist
FROM c a JOIN c r ON a.blk = r.blk AND a.v < r.v
WHERE levenshtein(a.v, r.v) <= 2
ORDER BY name_a, name_b
"""


def q72_excess_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped correlated-aggregate query: suppliers who shipped
    more than 1.5× the per-supplier average quantity of a part in 1995.
    The correlated comparison is division-free (2·qty·n > 3·total, exact
    integer-valued doubles) so the boundary is engine-deterministic. Plan:
    one (part, supp) aggregate, a partkey window over the already-reduced
    relation, then a supplier join that AQE broadcasts at small SF —
    the nested-subquery decorrelation pattern, hand-expressed."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    w = W.partitionBy("l_partkey")
    flagged = (
        ps.withColumn("n_s", F.count("*").over(w))
        .withColumn("tot", F.sum("qty").over(w))
        .filter(2 * F.col("qty") * F.col("n_s") > 3 * F.col("tot"))
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        flagged.join(sup, flagged.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_excess_parts"))
        .orderBy(F.col("n_excess_parts").desc(), "s_name")
        .limit(50)
    )


_Q72_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1996-01-01'
  GROUP BY l_partkey, l_suppkey
), f AS (
  SELECT l_partkey, l_suppkey FROM (
    SELECT l_partkey, l_suppkey, qty,
           count(*) OVER (PARTITION BY l_partkey) AS n_s,
           sum(qty)  OVER (PARTITION BY l_partkey) AS tot
    FROM ps
  ) WHERE 2 * qty * n_s > 3 * tot
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_excess_parts
FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY n_excess_parts DESC, s_name
LIMIT 50
"""


def q73_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: events carry a raw JSON ``props``
    payload; extract ``$.k`` with a JSON-path expression (JVM-side
    get_json_object — no Python in the loop) and aggregate it per type.
    Integer sums keep the stats exact. At 100 TB the parse is a narrow
    codegen projection; for repeated multi-key access you'd materialize
    from_json(struct) once instead of N path extractions."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_Q73_SQL = """
SELECT event_type,
       CAST(count(k) AS BIGINT) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def q75_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the general form of
    rollup (q15) / cube (q44): exactly the (status), (priority), and
    (status, priority) groupings in one pass, disambiguated by GROUPING()
    flags rather than nulls (a null group key and a super-aggregate row
    are different things — the flags make that queryable). Catalyst
    expands the sets into one Expand + single aggregate, so the scan runs
    once regardless of how many groupings are requested."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
        """
    )


_Q75_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


def q76_windowed_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a window — an operation Spark's window engine
    does NOT support natively (COUNT(DISTINCT) OVER raises). The engine
    expresses it as size(collect_set() OVER w): per event, how many
    distinct users of that event_type have appeared up to (and including)
    its calendar day. The state is the per-partition distinct set — fine
    for bounded-cardinality keys like users-per-type; for unbounded keys
    swap in the sketch path (approx_count_distinct per cumulative frame
    via self-join, or operators/sketches.py offline)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        daily.withColumn("cum_users", F.size(F.collect_set("user_id").over(w)))
        .groupBy("event_type", "day")
        .agg(F.max("cum_users").alias("cum_distinct_users"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cum_distinct_users",
        )
        .orderBy("event_type", "day")
    )


_Q76_SQL = """
WITH daily AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id FROM events
), per_row AS (
  SELECT event_type, day,
         count(DISTINCT user_id) OVER (
           PARTITION BY event_type ORDER BY day
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS c
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(max(c) AS INTEGER) AS cum_distinct_users
FROM per_row
GROUP BY event_type, day
ORDER BY event_type, day
"""


def q78_trend_fit_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group model fit through the ``applyInPandas`` grouped-map seam:
    each event_type's value-vs-time OLS trend, fit inside an Arrow batch.
    This is the niche the seam exists for — per-group fits with no SQL
    closed form (sklearn/scipy models); OLS specifically DOES have one
    (regr_slope), which is exactly what makes this instance oracle-
    checkable: the fit returns the exact INTEGER numerator/denominator

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    over integer (seconds-since-2024, cents) pairs — python bigints in the
    UDF, HUGEINT in DuckDB — so the Python-seam output hash-matches SQL
    bit-for-bit. The float slope itself (num/den) is deliberately NOT in
    the output: DuckDB's HUGEINT→DOUBLE cast is not correctly rounded, so
    the two engines' int→double conversions can differ by one ulp before
    the division (observed in CORRECTNESS_r03); the exact integer num/den
    pair IS the fit, and callers divide at the edge if they want a float.
    Plan: one shuffle on event_type; each group is one Arrow batch
    (fine for |types| groups; a high-cardinality fit would pre-aggregate
    the sums JVM-side and fit driver-side instead)."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    base = 1704067200  # 2024-01-01, keeps x small and exact
    pre = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    ).withColumn("x", F.col("x") - F.lit(base))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        x = [int(v) for v in pdf["x"]]
        y = [int(v) for v in pdf["y"]]
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        # num/den exceed int64 at scale; emitted as exact decimal STRINGS
        # because DuckDB's pandas fetch coerces HUGEINT/DECIMAL(38,0) to
        # float64, which breaks the driver's exact-string value hash.
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n": n,
                    "num": str(num),
                    "den": str(den),
                }
            ]
        )

    schema = "event_type string, n long, num string, den string"
    return (
        pre.groupBy("event_type").applyInPandas(fit, schema).orderBy("event_type")
    )


_Q78_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 1000000 - 1704067200 AS HUGEINT) AS x,
         CAST(round(value * 100) AS HUGEINT) AS y
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM b GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS VARCHAR) AS num,
       CAST(n * sxx - sx * sx AS VARCHAR) AS den
FROM s ORDER BY event_type
"""


def q87_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style nation-pair trade flows: revenue shipped between
    NATION_1 and NATION_2 (both directions kept separate) per ship year.
    Six-relation join where BOTH nation legs are true fixed-size dims
    (broadcast); supplier/customer scale with data, so their strategy is
    left to AQE (broadcast here, shuffle join at 100 TB). The pair filter
    applies to the broadcast legs before the fact join, so non-matching
    lineitems drop at the earliest join, not in a post-filter."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nat.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q87_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_lineitems
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q88_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: NATION_3 suppliers' revenue fraction
    of all PROMO-part revenue sold to ASIA-region customers, per order
    year. A 7-relation join tree where the selective dims (part type,
    region) broadcast and prune FIRST — the part filter alone drops ~5/6
    of lineitems at the earliest join. The share divides two EXACT
    decimal sums (conditional numerator via a CASE inside the same
    aggregate — one pass, no self-join), cast to double only for the
    final rounded ratio."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))
    supp_nat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nat = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nat), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nat), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)).alias("_num"),
            F.sum(vol).alias("_den"),
        )
    )
    share = F.round(
        F.coalesce(F.col("_num"), F.lit(0)).cast("double")
        / F.col("_den").cast("double"),
        4,
    )
    return agg.select(
        "o_year",
        share.alias("mkt_share"),
        F.round(F.col("_den"), 2).cast("double").alias("total_revenue"),
    ).orderBy("o_year")


_Q88_SQL = """
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2))) AS vol,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
)
SELECT o_year,
       round(CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol END),
                           0) AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE), 4) AS mkt_share,
       CAST(round(sum(vol), 2) AS DOUBLE) AS total_revenue
FROM base
GROUP BY o_year
ORDER BY o_year
"""


def q124_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) through the SQL surface — the
    second pure-`spark.sql` entry after q74's Q6, exercising the
    front-end on a 3-table join + grouped aggregate + top-k: segment
    filter on customer, date split across orders/lineitem, revenue in
    DECIMAL (exact, order-independent), deterministic top-10
    (revenue desc, orderdate, orderkey). Catalyst gets the classic Q3
    plan for free: both date predicates and the segment filter pushed
    into their scans, customer broadcast, the grouped sum partial
    before the final exchange."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < '1995-03-15'
          AND l_shipdate > '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


_Q124_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q125_sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting) through the SQL surface: the
    4-table join (customer ⋈ orders ⋈ lineitem ⋈ nation) ranking
    customers by revenue lost to returns in a quarter. DECIMAL-exact
    revenue; deterministic top-20. The plan Catalyst derives is the Q10
    textbook shape: quarter + returnflag predicates pushed, small dims
    broadcast, one grouped exchange."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS revenue,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """
    )


_Q125_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q126_sql_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers) through the SQL surface: the
    IN-(grouped-HAVING-subquery) shape — orders whose total lineitem
    quantity clears a threshold, joined back to customers. Exercises
    Catalyst's subquery planning: the HAVING subquery becomes a grouped
    aggregate + semi-join, not a per-row re-execution. Quantities are
    summed in DECIMAL(18,2) so the threshold comparison and the output
    are exact; deterministic order by (qty desc, orderkey)."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 20
        """
    )


_Q126_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


def q152_sql_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape (order-priority checking) through the SQL
    surface: count orders per priority that have AT LEAST ONE line
    shipped more than 90 days after the order date — the correlated
    EXISTS that Catalyst rewrites into a left SEMI join (one probe per
    order, no row multiplication from multi-line orders, which a plain
    join + distinct would pay for). Both date predicates pushed; the
    date arithmetic is written identically in both engines."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > CAST(date_add(o_orderdate, 90) AS TIMESTAMP)
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_Q152_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > (o_orderdate + INTERVAL 90 DAY)::TIMESTAMP
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q154_sql_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (suppliers who kept orders waiting) through the
    SQL surface, adapted to this schema's columns: a line is "late" when
    it ships > 60 days after its order date (the testdata has no
    commit/receipt dates). For finished orders, count per supplier the
    orders where THEIR line was late, another supplier participated
    (correlated EXISTS → left semi join), and NO other supplier was late
    (correlated NOT EXISTS → left anti join). The per-(order, supplier)
    late flag is pre-aggregated once in a CTE so all three references
    probe the same |order-supplier| relation rather than re-joining raw
    lineitem; Catalyst plans the chain as hash semi + anti joins on the
    order key — no row multiplication, no distinct. Integer output."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    return spark.sql(
        """
        WITH lf AS (
          SELECT l_orderkey, l_suppkey,
                 max(CASE WHEN l_shipdate >
                       CAST(date_add(o_orderdate, 60) AS TIMESTAMP)
                     THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY l_orderkey, l_suppkey
        )
        SELECT s_name, n_name, count(*) AS numwait
        FROM supplier s
        JOIN lf l1 ON s.s_suppkey = l1.l_suppkey
        JOIN nation ON s.s_nationkey = n_nationkey
        WHERE l1.late = 1
          AND EXISTS (
            SELECT 1 FROM lf l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lf l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.late = 1
          )
        GROUP BY s_name, n_name
        ORDER BY numwait DESC, s_name
        """
    )


_Q154_SQL = """
WITH lf AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > (o_orderdate + INTERVAL 60 DAY)::TIMESTAMP
             THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
)
SELECT s_name, n_name, count(*) AS numwait
FROM supplier s
JOIN lf l1 ON s.s_suppkey = l1.l_suppkey
JOIN nation ON s.s_nationkey = n_nationkey
WHERE l1.late = 1
  AND EXISTS (
    SELECT 1 FROM lf l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lf l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.late = 1
  )
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
"""


def q155_sql_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape (global sales opportunity) through the SQL
    surface: per market segment, the count and total balance of customers
    whose balance beats the average POSITIVE balance and who have placed
    no order since 1999-01-01 (every synthetic customer has SOME order,
    so the dormancy window replaces Q22's plain no-orders test; the
    pushed date filter shrinks the anti-join build side before it ever
    shuffles). The above-average flag is the house integer discipline:
    balances are exact cents (BIGINT), and ``cb·n > sum_cb`` decides the
    flag with no float division; the only float is the final
    cents→currency division of an exactly-summed integer, rounded
    identically in both engines. Catalyst plans the scalar subquery as a
    1-row broadcast and the NOT EXISTS as a left anti hash join."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        WITH cb AS (
          SELECT c_custkey, c_mktsegment,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer
        ), avg_pos AS (
          SELECT sum(bal_cents) AS s, count(*) AS n
          FROM cb WHERE bal_cents > 0
        )
        SELECT c_mktsegment,
               count(*) AS numcust,
               round(CAST(sum(bal_cents) AS DOUBLE) / 100.0, 2) AS totacctbal
        FROM cb CROSS JOIN avg_pos
        WHERE bal_cents * n > s
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = cb.c_custkey
              AND o_orderdate >= '1999-01-01'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


_Q155_SQL = """
WITH cb AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), avg_pos AS (
  SELECT CAST(sum(bal_cents) AS BIGINT) AS s, count(*) AS n
  FROM cb WHERE bal_cents > 0
)
SELECT c_mktsegment,
       count(*) AS numcust,
       round(CAST(CAST(sum(bal_cents) AS BIGINT) AS DOUBLE) / 100.0, 2) AS totacctbal
FROM cb CROSS JOIN avg_pos
WHERE bal_cents * n > s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = cb.c_custkey
      AND o_orderdate >= DATE '1999-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q160_sql_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's shape (top supplier by quarterly revenue) through the
    SQL surface: an aggregated revenue view probed twice — once for the
    per-supplier rollup, once under max() — with the equality filter
    Catalyst plans as a 1-row broadcast of the scalar max against the
    |suppliers|-sized rollup (the view is NOT recomputed per row).
    Revenue stays exact to the end: cents x (100 - discount-percent)
    integer units, one rounded /10000 division on output. Ties (several
    suppliers at the max) are all returned, per Q15's spec."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS rev_e4
          FROM lineitem
          WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1995-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               round(CAST(rev_e4 AS DOUBLE) / 10000.0, 2) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE rev_e4 = (SELECT max(rev_e4) FROM revenue)
        ORDER BY s_suppkey
        """
    )


_Q160_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(CAST(rev_e4 AS DOUBLE) / 10000.0, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE rev_e4 = (SELECT max(rev_e4) FROM revenue)
ORDER BY s_suppkey
"""


def q161_sql_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape (small-quantity-order revenue) through the SQL
    surface: average yearly revenue lost if Brand#1's small orders
    (quantity below 20% of that part's average order quantity) moved to
    bulk. The correlated scalar average is pre-aggregated per part and
    the membership test is the house integer cross-multiply —
    ``qty·5·n < sum_qty`` with all three terms exact BIGINTs (quantities
    are integral), so no float division decides a row. The only float is
    the final cents/700 division, rounded once, identically, on both
    engines. Catalyst plans the per-part aggregate as a broadcast-joined
    build side; the brand filter is pushed into the part scan."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        WITH pq AS (
          SELECT l_partkey,
                 count(*) AS n_lines,
                 sum(CAST(l_quantity AS BIGINT)) AS sum_qty
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#1'
          GROUP BY l_partkey
        )
        SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                          AS DOUBLE) / 700.0, 2) AS avg_yearly
        FROM lineitem JOIN pq ON lineitem.l_partkey = pq.l_partkey
        WHERE CAST(l_quantity AS BIGINT) * 5 * n_lines < sum_qty
        """
    )


_Q161_SQL = """
WITH pq AS (
  SELECT l_partkey,
         count(*) AS n_lines,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#1'
  GROUP BY l_partkey
)
SELECT round(CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 700.0, 2) AS avg_yearly
FROM lineitem JOIN pq ON lineitem.l_partkey = pq.l_partkey
WHERE CAST(l_quantity AS BIGINT) * 5 * n_lines < sum_qty
"""


def q174_sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT round-trip through the SQL surface: daily event
    counts pivoted wide by type, then UNPIVOTed straight back — the
    oracle is the PLAIN GROUP BY, so a green hash proves the two
    clauses compose to the identity (including the null-cell contract:
    PIVOT fills absent (day, type) cells with NULL and UNPIVOT drops
    NULLs, so missing combinations stay missing on both sides). The
    DataFrame pivot is q38; this pins the SQL front-end's clauses."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT d, event_type, n FROM (
          SELECT * FROM (SELECT CAST(ts AS DATE) AS d, event_type FROM events)
          PIVOT (count(*) AS n FOR event_type IN
                 ('click' AS click, 'error' AS error, 'purchase' AS purchase,
                  'signup' AS signup, 'view' AS view))
        ) UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
        ORDER BY d, event_type
        """
    )


_Q174_SQL = """
SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS n
FROM events
GROUP BY CAST(ts AS DATE), event_type
ORDER BY d, event_type
"""


def q175_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-k through the SQL surface — the per-entity
    top-N idiom SQL users reach for before learning window functions:
    for every nation, the 2 richest customers via a correlated ordered
    LIMIT subquery. Catalyst decorrelates the LATERAL into a
    partitioned window under the hood (no per-nation rescan); the
    IDENTICAL statement runs on DuckDB, which plans its own lateral —
    the engines must agree on correlation, ordering, and the
    deterministic (balance DESC, key ASC) tiebreak. Balances stay
    exact cents until the rounded output division."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["customer", "nation"])
    return spark.sql(
        """
        SELECT n.n_name, s.c_name,
               round(CAST(s.bal_cents AS DOUBLE) / 100.0, 2) AS acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, c_name
          LIMIT 2
        ) s
        ORDER BY n.n_name, acctbal DESC, c_name
        """
    )


_Q175_SQL = """
SELECT n.n_name, s.c_name,
       round(CAST(s.bal_cents AS DOUBLE) / 100.0, 2) AS acctbal
FROM nation n,
LATERAL (
  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY bal_cents DESC, c_name
  LIMIT 2
) s
ORDER BY n.n_name, acctbal DESC, c_name
"""


def q193_sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume) through the SQL surface: revenue
    kept inside each ASIA nation — lineitems whose CUSTOMER and SUPPLIER
    sit in the same nation, the classic 6-table star with the extra
    c_nationkey = s_nationkey equi-condition that makes Q5 the
    join-order stress test. DECIMAL-exact revenue (q124 discipline);
    region/nation broadcast; the year predicate pushes into the orders
    scan; Catalyst's join reorder keeps the two fact relations joined
    on their keys before the nation equality filters the pair."""
    from ...sources.files import register_views

    register_views(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    return spark.sql(
        """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """
    )


_Q193_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
             AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q194_sql_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates) adapted to
    this schema: three OR'd brand/size/quantity bands over
    lineitem ⋈ part. The POINT is the predicate structure — Catalyst
    must extract the common conjuncts it can push (p_size ≥ 1, quantity
    bounds via OR-to-range) and keep the disjunction as a single
    post-join filter instead of three unioned scans (the naive rewrite
    triples the fact read at 100 TB). DECIMAL-exact revenue; one
    aggregate row out."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 20 AND l_quantity <= 30)
        """
    )


_Q194_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


def q195_sql_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) shape through the SQL surface:
    parts whose lineitem revenue exceeds 1.5× the MEAN per-part revenue
    — a grouped HAVING judged against scalar subqueries over the same
    fact. The mean is never materialized: the cut is cross-multiplied
    (value·2·|parts| > total·3) so every compared quantity is an exact
    DECIMAL product — no division, no float, identical membership in
    both engines at any scale factor (a fixed share threshold would
    empty out as |parts| grows with SF). Catalyst decorrelates the scalar into a 1-row broadcast
    join; the fact is scanned twice (grouped + total) — the rewrite
    into one window-over-nothing pass would globally reshuffle, so two
    cheap scans win at 100 TB. Output value cast to DOUBLE for display
    only."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        SELECT p_partkey, p_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS part_value
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_partkey, p_name
        HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l_discount AS DECIMAL(4,2))))
               * (SELECT count(DISTINCT l_partkey) * 2 FROM lineitem)
               > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2))
                                - CAST(l_discount AS DECIMAL(4,2))))
                         * 3
                  FROM lineitem)
        ORDER BY part_value DESC, p_partkey
        """
    )


_Q195_SQL = """
SELECT p_partkey, p_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS part_value
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_partkey, p_name
HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2))
              - CAST(l_discount AS DECIMAL(4,2))))
       * (SELECT count(DISTINCT l_partkey) * 2 FROM lineitem)
       > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l_discount AS DECIMAL(4,2))))
                 * 3
          FROM lineitem)
ORDER BY part_value DESC, p_partkey
"""


def q196_sql_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) shape: per ship-month, the share of
    revenue carried by PROMO-type parts. Both the promo and total sums
    are exact DECIMALs from ONE conditional-aggregation pass (no second
    scan, no join back); the share itself never divides decimals — it's
    the truncating integer quotient (promo·10⁴)·10⁶ div (total·10⁴):
    the ·10⁴ shift makes each DECIMAL(·,4) integral BEFORE its scale-0
    cast (a direct cast would ROUND, and the engines round differently), so the figure is bit-identical
    in both engines at any magnitude (DECIMAL→DOUBLE casts drift past
    2⁵³ — the q78 lesson — hence no CAST-then-divide). Display percent
    derives from the micro value. Months with zero revenue cannot occur
    (a month exists only via its lineitems)."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        WITH t AS (
          SELECT date_format(l_shipdate, 'yyyy-MM') AS ship_month,
                 sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_rev,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
          FROM lineitem JOIN part ON p_partkey = l_partkey
          GROUP BY date_format(l_shipdate, 'yyyy-MM')
        )
        SELECT ship_month,
               CAST(promo_rev AS DOUBLE) AS promo_rev,
               CAST(total_rev AS DOUBLE) AS total_rev,
               CAST(promo_rev * 10000 AS DECIMAL(28,0)) * 1000000
                 div CAST(total_rev * 10000 AS DECIMAL(28,0)) AS promo_micro
        FROM t
        ORDER BY ship_month
        """
    )


_Q196_SQL = """
WITH t AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2))
                     - CAST(l_discount AS DECIMAL(4,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_rev,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2))
                - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY strftime(l_shipdate, '%Y-%m')
)
SELECT ship_month,
       CAST(promo_rev AS DOUBLE) AS promo_rev,
       CAST(total_rev AS DOUBLE) AS total_rev,
       CAST(CAST(promo_rev * 10000 AS HUGEINT) * 1000000
            // CAST(total_rev * 10000 AS HUGEINT) AS BIGINT) AS promo_micro
FROM t
ORDER BY ship_month
"""


def q197_sql_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) shape on this schema: revenue
    attributed to the SUPPLIER's nation per order-year, restricted to
    parts whose name carries the Q9-style substring filter (p_name LIKE
    '%a%' stands in for '%green%' on the synthetic names). The plan
    lesson Q9 teaches: the LIKE filter prunes part FIRST (pushed into
    its scan), the fact joins ride broadcast dims, and the wide
    (nation × year) rollup is the only real exchange. DECIMAL-exact
    amount, display cast only."""
    from ...sources.files import register_views

    register_views(
        spark, sf_dir, ["lineitem", "orders", "supplier", "nation", "part"]
    )
    return spark.sql(
        """
        SELECT n_name AS nation,
               year(o_orderdate) AS o_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS amount
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%a%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
        """
    )


_Q197_SQL = """
SELECT n_name AS nation,
       CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS amount
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN part ON p_partkey = l_partkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, date_part('year', o_orderdate)
ORDER BY nation, o_year DESC
"""


def q208_sql_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) shape: how many DISTINCT
    suppliers can deliver each (brand, type, size) bucket, excluding a
    blacklist — the NOT IN subquery (suppliers in arrears, the stand-in
    for Q16's complaint scan) plus a grouped count(DISTINCT). The plan
    lessons: NOT IN over a non-nullable key becomes a broadcast
    ANTI-join (not a per-row subquery), and the distinct-agg expands to
    the two-phase partial-distinct exchange. Restriction predicates
    push into the part scan. Deterministic order (count desc, then the
    full key)."""
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


_Q208_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q209_sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) shape — the last uncovered
    TPC-H plan shape: a CORRELATED scalar subquery (per-part regional
    minimum price) that Catalyst decorrelates into an aggregate-join —
    min() grouped by l_partkey joined back on (partkey, price) — not a
    per-row re-execution. The region restriction appears in both the
    outer and inner blocks and pushes into both scans; supplier/nation/
    region dims broadcast. Every output column participates in ORDER BY
    so the LIMIT cuts a deterministic multiset in both engines (the
    result rows themselves carry no floats derived by arithmetic —
    l_extendedprice/s_acctbal are raw column values, exact in parquet)."""
    from ...sources.files import register_views

    register_views(
        spark, sf_dir, ["part", "lineitem", "supplier", "nation", "region"]
    )
    return spark.sql(
        """
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
               l_extendedprice AS min_price
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
          AND l_extendedprice = (
            SELECT min(l2.l_extendedprice)
            FROM lineitem l2
            JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_type, min_price
        LIMIT 100
        """
    )


_Q209_SQL = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       l_extendedprice AS min_price
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND l_extendedprice = (
    SELECT min(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_type, min_price
LIMIT 100
"""


def q405_variant_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured processing (Spark 4 `parse_json`): build a
    nested JSON payload per event (object + array + string fields, keyed
    off the real ``props.$.k``), deterministically TRUNCATE every 97th
    payload to exercise malformed-input tolerance, then parse ONCE with
    ``try_parse_json`` into a VariantType column and take THREE typed
    extractions (``$.a.b`` bigint, ``$.c[1]`` array index, ``$.d``
    string) with ``try_variant_get``. This is the plan shape q73 points
    at for repeated multi-path access: one parse into Variant's binary
    encoding, N typed reads — vs N full string re-parses with
    get_json_object. At 100 TB the parse is a narrow codegen projection
    and Variant is the shredding-friendly storage form. Parity trap
    (measured): Spark's try_parse_json TOLERATES trailing garbage
    ('{..}x' parses) while DuckDB json_valid rejects it — so the
    corruption here is truncation, which both engines agree is invalid.
    Reference: spotify_etl.py's raw Spotify API JSON handling is this
    operation's 1-level special case."""
    ev = _t(spark, sf_dir, "events", parallelize=True)
    k = F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0))
    nested = F.concat(
        F.lit('{"a":{"b":'), k.cast("string"),
        F.lit('},"c":['), (k * 2).cast("string"), F.lit(","),
        (k + 1).cast("string"),
        F.lit('],"d":"'), F.col("event_type"), F.lit('"}'),
    )
    payloads = (
        ev.select("event_id", "event_type", nested.alias("nested"))
        .select(
            "event_type",
            F.when(
                F.col("event_id") % 97 == 0,
                F.expr("substring(nested, 1, length(nested) - 4)"),
            ).otherwise(F.col("nested")).alias("p"),
        )
    )
    ext = payloads.select(
        "event_type", F.try_parse_json("p").alias("v")
    ).select(
        "event_type",
        F.col("v").isNull().alias("failed"),
        F.try_variant_get("v", "$.a.b", "bigint").alias("ab"),
        F.try_variant_get("v", "$.c[1]", "bigint").alias("c1"),
        F.try_variant_get("v", "$.d", "string").alias("d"),
    )
    return (
        ext.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("failed").cast("long")).alias("n_failed"),
            F.coalesce(F.sum("ab"), F.lit(0)).alias("sum_ab"),
            F.coalesce(F.sum("c1"), F.lit(0)).alias("sum_c1"),
            F.coalesce(
                F.sum((F.col("d") == F.col("event_type")).cast("long")),
                F.lit(0),
            ).alias("n_d_match"),
        )
        .orderBy("event_type")
    )


_Q405_SQL = """
WITH base AS (
  SELECT event_id, event_type,
         '{"a":{"b":' || CAST(k AS VARCHAR) || '},"c":['
           || CAST(k * 2 AS VARCHAR) || ',' || CAST(k + 1 AS VARCHAR)
           || '],"d":"' || event_type || '"}' AS nested
  FROM (
    SELECT event_id, event_type,
           coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
    FROM events
  )
), payloads AS (
  SELECT event_type,
         CASE WHEN event_id % 97 = 0
              THEN substring(nested, 1, length(nested) - 4)
              ELSE nested END AS p
  FROM base
), ext AS (
  SELECT event_type,
         NOT json_valid(p) AS failed,
         CASE WHEN json_valid(p) THEN CAST(json_extract(p, '$.a.b') AS BIGINT) END AS ab,
         CASE WHEN json_valid(p) THEN CAST(json_extract(p, '$.c[1]') AS BIGINT) END AS c1,
         CASE WHEN json_valid(p) THEN json_extract_string(p, '$.d') END AS d
  FROM payloads
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN failed THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       CAST(coalesce(sum(ab), 0) AS BIGINT) AS sum_ab,
       CAST(coalesce(sum(c1), 0) AS BIGINT) AS sum_c1,
       CAST(coalesce(sum(CASE WHEN d = event_type THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_d_match
FROM ext
GROUP BY event_type
ORDER BY event_type
"""
