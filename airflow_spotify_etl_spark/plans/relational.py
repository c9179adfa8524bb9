"""Core relational query surface (SURVEY.md §2.2-§2.8).

Every semantic operator the reference implements — flatten-with-defaults
projection, validation predicates, global/grouped aggregation, top-k, window
rank, (implied) star joins, anti-join dedup, set ops — re-expressed as
declarative Spark plans over the test star schema, each paired with an ANSI
SQL oracle (``ORACLES``) that DuckDB runs on the same Parquet files.

Scale notes (100 TB design):
- Only TRUE dims (region 5 rows, nation 25 — size-fixed at any SF) carry
  broadcast hints. customer/supplier scale with the facts, so AQE picks
  their join strategy from runtime sizes (broadcast at small SF, shuffle
  join at 100 TB).
- Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; AQE handles
  skew and coalesces post-shuffle partitions.
- All aggregates are single-pass multi-aggregate (`agg(...)` with many
  expressions) — the reference re-scans per statistic (spotify_etl.py:265
  then :279 recomputes the mean; spotify_etl2.py:272-274 three passes);
  Catalyst computes all partials in one scan here.
- Money aggregates sum in DECIMAL (exact, order-independent) and averages
  divide the exact sum by the exact count unrounded, so the value hash is
  bit-stable across engines and runs — see `_dec`. round() on a double is
  the one non-portable op (Spark rounds the shortest decimal repr, DuckDB
  the binary value); it appears only where inputs are exact decimals.
- persist() vs localCheckpoint(eager=True): see the pinning convention in
  plans/llm.py's module docstring (ADVICE r6) — localCheckpoint only on
  small bounded intermediates fanned into 2+ branches of ONE invocation;
  persist() for multi-round iterative cores (the q266 pagerank revert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..operators.quality import quality_report
from ..sources.files import load_table

__all__ = ["QUERIES", "ORACLES"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str, scale: str = "decimal(18,2)"):
    """Exact decimal view of a fixed-2-decimal measure stored as double.

    Money sums MUST aggregate in decimal, not double: a double sum's last
    ulp depends on partial-aggregate arrival order (nondeterministic across
    runs and across engines), and round(·, 2) of a value sitting on a .xx5
    boundary then flips between HALF_UP engines and binary-double engines.
    Decimal sums are exact and order-independent, so the rounded output is
    bit-identical everywhere. Averages divide the exact decimal sum (cast
    to double) by the exact count — identical IEEE division in any engine —
    and skip the final round entirely (Spark rounds the shortest decimal
    repr, DuckDB rounds the binary value; on identical doubles they can
    still disagree at a .xx5 repr)."""
    return F.col(col).cast(scale)


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


def q11_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.7, absent in reference, required surface):
    INTERSECT (purchasers who also signed up), EXCEPT (purchasers with no
    errors), tagged and unioned."""
    ev = _t(spark, sf_dir, "events")

    def users(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select("user_id").distinct()

    loyal = users("purchase").intersect(users("signup")).withColumn(
        "cohort", F.lit("purchase_and_signup")
    )
    clean = users("purchase").exceptAll(users("error")).withColumn(
        "cohort", F.lit("purchase_no_error")
    )
    return loyal.unionByName(clean).select("cohort", "user_id").orderBy(
        "cohort", "user_id"
    )


_Q11_SQL = """
SELECT 'purchase_and_signup' AS cohort, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
)
UNION ALL
SELECT 'purchase_no_error' AS cohort, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
ORDER BY cohort, user_id
"""


def q12_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's validation suite F1-F4 (spotify_etl2.py:42-86) fused
    into ONE aggregation pass — see operators/quality.py."""
    ev = _t(spark, sf_dir, "events")
    return quality_report(
        ev, key_col="event_id", ts_col="ts", freshness_days=7
    )


_Q12_SQL = """
SELECT count(*)                                        AS n_rows,
       CAST(count(*) = 0 AS BOOLEAN)                   AS is_empty,
       count(DISTINCT event_id)                        AS n_distinct_keys,
       CAST(count(*) = count(DISTINCT event_id) AS BOOLEAN) AS pk_unique,
       count(*) FILTER (WHERE event_id IS NULL)        AS nulls_event_id,
       count(*) FILTER (WHERE ts IS NULL)              AS nulls_ts,
       count(*) FILTER (WHERE user_id IS NULL)         AS nulls_user_id,
       count(*) FILTER (WHERE event_type IS NULL)      AS nulls_event_type,
       count(*) FILTER (WHERE value IS NULL)           AS nulls_value,
       count(*) FILTER (WHERE props IS NULL)           AS nulls_props,
       count(*) FILTER (WHERE ts < (SELECT max(ts) - INTERVAL 7 DAY FROM events))
                                                       AS n_late_rows
FROM events
"""


# --------------------------------------------------------------------------
# Projection / scalar-expression layer (P1-P12).
# --------------------------------------------------------------------------
def q13_flatten_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flatten-with-defaults projection (P1/P9:
    `.get(k, default)` on every field, spotify_etl.py:241-250) + JSON field
    extraction from a raw payload column, date slice (P5:
    `played_at[:10]`, spotify_etl2.py:170) and epoch-ms (P6,
    spotify_etl2.py:102-104). All built-in Catalyst expressions — no UDFs."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce("event_type", F.lit("Unknown")).alias("event_type_filled"),
        F.coalesce(
            F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)
        ).alias("prop_k"),
        F.substring(F.col("ts").cast("string"), 1, 10).alias("event_date_str"),
        F.unix_millis("ts").alias("ts_ms"),
        F.coalesce("value", F.lit(0.0)).alias("value_filled"),
    ).orderBy("event_id")


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


def q41_value_percentiles(
    spark: SparkSession, sf_dir: str, approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """Percentiles per group (§2.4 statistical extension): median / p90 /
    p99 of event value by type.

    Two modes behind one surface:
    - exact (default, oracle-checked): Spark's ``percentile`` — sort-based,
      buffers each group's values; matches DuckDB's ``quantile_cont``
      bit-for-bit after rounding. The plan you want when groups fit in
      memory (few event types × bounded values here).
    - ``approx=True`` (THE 100 TB plan): ``percentile_approx`` — a bounded
      ~KB sketch per group, single pass, mergeable map-side like any
      partial aggregate, so a group's memory no longer grows with its row
      count. Error ≤ 1/accuracy relative rank; tolerance vs the exact form
      is pinned in tests/test_functions.py (no oracle — DuckDB's
      approx_quantile is a different sketch)."""
    ev = _t(spark, sf_dir, "events")
    if approx:
        pct = [
            F.round(
                F.percentile_approx("value", q, accuracy), 2
            ).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    else:
        pct = [
            F.round(F.expr(f"percentile(value, {q})"), 2).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    return (
        ev.groupBy("event_type")
        .agg(*pct, F.round(F.stddev_samp("value"), 2).alias("value_stddev"))
        .orderBy("event_type")
    )


_Q41_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 2)  AS p50,
       round(quantile_cont(value, 0.9), 2)  AS p90,
       round(quantile_cont(value, 0.99), 2) AS p99,
       round(stddev_samp(value), 2)         AS value_stddev
FROM events
GROUP BY event_type
ORDER BY event_type
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
    from ..operators.joins import fuzzy_self_join

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


def q61_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users who viewed,
    then clicked AFTER their first view, then purchased AFTER that first
    qualifying click. Three stage aggregates, each a groupBy on user_id
    joined to the next stage's filtered scan — every join is keyed on
    user_id so AQE co-locates the stages on one shuffle key; no windows,
    no self-join explosion."""
    ev = _t(spark, sf_dir, "events")

    def stage(prev: DataFrame, etype: str, ts_col: str, prev_ts: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(ts_col))
        )

    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    clicks = stage(views, "click", "tc", "tv")
    purchases = stage(clicks, "purchase", "tp", "tc")
    n_v = views.agg(F.count("*").alias("n_viewed"))
    n_c = clicks.agg(F.count("*").alias("n_clicked_after_view"))
    n_p = purchases.agg(F.count("*").alias("n_purchased_after_click"))
    return (
        n_v.crossJoin(n_c)
        .crossJoin(n_p)
        .select(
            "n_viewed",
            "n_clicked_after_view",
            "n_purchased_after_click",
            F.round(
                F.col("n_clicked_after_view") / F.col("n_viewed"), 4
            ).alias("view_to_click"),
            F.round(
                F.col("n_purchased_after_click") / F.col("n_clicked_after_view"),
                4,
            ).alias("click_to_purchase"),
        )
    )


_Q61_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS tc
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_after_click,
       round((SELECT count(*) FROM c) / (SELECT count(*) FROM v), 4)
         AS view_to_click,
       round((SELECT count(*) FROM p) / (SELECT count(*) FROM c), 4)
         AS click_to_purchase
"""


def q62_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date, counted as
    retained on each later day they appear, day offsets 0-7. Two grouped
    aggregations on user_id/(cohort, offset) plus one user-keyed join —
    the standard product-analytics rollup, shuffle-bounded by |users|."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_date"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


_Q62_SQL = """
WITH a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), f AS (
  SELECT user_id, min(day) AS cohort_date FROM a GROUP BY user_id
)
SELECT strftime(f.cohort_date, '%Y-%m-%d') AS cohort_date,
       datediff('day', f.cohort_date, a.day) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM a JOIN f USING (user_id)
WHERE datediff('day', f.cohort_date, a.day) <= 7
GROUP BY f.cohort_date, datediff('day', f.cohort_date, a.day)
ORDER BY cohort_date, day_offset
"""


def q63_rolling_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling aggregate: hourly event value per type with a
    trailing 3-hour moving average. The frame is rangeBetween on epoch
    seconds (gap-correct: missing hours shrink the frame, unlike a ROWS
    frame), per-type partitions. Hourly sums aggregate in DECIMAL first so
    the windowed average divides exact sums — engine-portable without a
    float-sum ordering hazard."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_ts"),
        )
        .agg(F.sum(_dec("value")).alias("hv"))
        .withColumn("epoch_s", F.unix_timestamp("hour_ts"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("epoch_s")
        .rangeBetween(-2 * 3600, 0)
    )
    return (
        hourly.select(
            "event_type",
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            F.col("hv").cast("double").alias("hourly_value"),
            (F.sum("hv").over(w).cast("double") / F.count("hv").over(w)).alias(
                "rolling_3h_avg"
            ),
        )
        .orderBy("event_type", "hour_ts")
    )


_Q63_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         sum(CAST(value AS DECIMAL(18,2))) AS hv,
         epoch(date_trunc('hour', ts)) AS epoch_s
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT event_type,
       strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       CAST(hv AS DOUBLE) AS hourly_value,
       CAST(sum(hv) OVER w AS DOUBLE) / count(hv) OVER w AS rolling_3h_avg
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_s
             RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW)
ORDER BY event_type, hour_ts
"""


def q65_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event stream: each user's
    consecutive run of one event_type becomes a validity interval
    [valid_from, valid_to) with the open (current) interval closed by the
    standard end-of-time sentinel. One partitionBy(user_id) exchange serves
    all three windows (change marker, running run-id, lead valid_to) — the
    canonical warehouse pattern the reference's append-only sink
    (spotify_etl2.py:220) would need to become a history table. Scale:
    shuffle is keyed on user_id (high-cardinality, skew-free); no joins."""
    from ..operators.incremental import scd2_runs

    ev = _t(spark, sf_dir, "events")
    return _scd2_format(scd2_runs(ev))


def _scd2_format(runs: DataFrame) -> DataFrame:
    """Run table → interval table: lead() closes each run with the next
    run's valid_from; the open run gets the end-of-time sentinel."""
    w2 = W.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(w2)
    return (
        runs.withColumn("vt", nxt)
        .select(
            "user_id",
            "run_id",
            "state",
            F.unix_micros("vf").alias("valid_from_us"),
            F.coalesce(F.unix_micros("vt"), F.lit(253402300799000000)).alias(
                "valid_to_us"
            ),
            F.col("vt").isNull().alias("is_current"),
            "n_events",
        )
        .orderBy("user_id", "run_id")
    )


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


def q66_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: top-20 three-event paths users actually
    take, from two lead() windows over each user's timeline — the
    sequence-mining primitive behind funnel discovery. One user-keyed
    exchange; the path space is tiny (|types|³) so the final top-k is a
    TakeOrderedAndProject, never a global sort of the counts."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


_Q66_SQL = """
WITH t AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1 || '>' || e2 || '>' || e3
ORDER BY n DESC, path
LIMIT 20
"""


def q67_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3σ outlier scan in EXACT integer arithmetic. The naive form
    |x − mean| > 3·stddev computes mean/stddev as doubles whose last ulp
    depends on aggregation order — boundary rows flip between engines and
    runs. Instead both sides of the inequality are cleared of divisions:

        (n−1)·(n·x − S)² > 9·n·(n·SSQ − S²)

    with x in integer cents (values carry exactly 2 decimals), S = Σx,
    SSQ = Σx². All terms are exact DECIMAL(38,0) integers (magnitudes
    ≤ ~1e18), so the flag is bit-deterministic on any engine and any
    partitioning. Plan: one grouped agg (5 rows) broadcast back over the
    scan — no second full shuffle."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("decimal(38,0)")
    evc = ev.select("event_id", "event_type", "value", cents.alias("cv"))
    stats = evc.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cv").alias("sv"),
        F.sum(F.col("cv") * F.col("cv")).alias("ssq"),
    )
    dev = F.col("n") * F.col("cv") - F.col("sv")
    return (
        evc.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("n") - 1) * dev * dev
            > 9 * F.col("n") * (F.col("n") * F.col("ssq") - F.col("sv") * F.col("sv"))
        )
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


_Q67_SQL = """
WITH c AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 100) AS HUGEINT) AS cv
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(cv) AS HUGEINT) AS sv,
         CAST(sum(cv * cv) AS HUGEINT) AS ssq
  FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type, c.value
FROM c JOIN s USING (event_type)
WHERE (s.n - 1) * (s.n * c.cv - s.sv) * (s.n * c.cv - s.sv)
      > 9 * s.n * (s.n * s.ssq - s.sv * s.sv)
ORDER BY c.event_id
"""


def q68_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 10-bucket histogram of order totals. Bucket assignment is
    pure integer arithmetic on cents ((x−lo)·10 div (hi−lo), max clamped
    into bucket 9) so boundary values land identically on every engine —
    float division would make edge cents engine-dependent. The min/max pass
    is a 1-row broadcast; the histogram itself is one grouped agg with
    map-side partials (10 groups). Degenerate range (hi == lo — a
    constant column) collapses to bucket 0 instead of dividing by zero."""
    o = _t(spark, sf_dir, "orders")
    oc = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        _dec("o_totalprice").alias("p"),
    )
    mm = oc.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    return (
        oc.crossJoin(F.broadcast(mm))
        .withColumn(
            "bucket",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(F.lit(9), F.expr("(cents - lo) * 10 div (hi - lo)"))
            )
            .cast("int"),
        )
        .groupBy("bucket", "lo", "hi")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("p").cast("double").alias("total_value"),
        )
        .select(
            "bucket",
            (F.expr("lo * 10 + bucket * (hi - lo)") / 1000.0).alias("bucket_lo"),
            (F.expr("lo * 10 + (bucket + 1) * (hi - lo)") / 1000.0).alias("bucket_hi"),
            "n_orders",
            "total_value",
        )
        .orderBy("bucket")
    )


_Q68_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
), mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
b AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE least(9, (cents - lo) * 10 // (hi - lo)) END AS bucket,
         p, lo, hi
  FROM c, mm
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       (lo * 10 + bucket * (hi - lo)) / 1000.0 AS bucket_lo,
       (lo * 10 + (bucket + 1) * (hi - lo)) / 1000.0 AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(p) AS DOUBLE) AS total_value
FROM b GROUP BY bucket, lo, hi ORDER BY bucket
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
    from ..operators.incremental import merge_rollup, rollup_snapshot

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


def q74_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 through the engine's SQL surface: tables registered as temp
    views (sources/files.register_views), the query itself a single
    ``spark.sql`` string — proof that the full Catalyst SQL front-end is a
    first-class entry point, not just the DataFrame DSL. Revenue sums in
    DECIMAL (exact, order-independent — see _dec). The plan is the one
    Q6 wants: all three predicates pushed into the parquet scan, one
    partial+final aggregate, no shuffle beyond the 1-row combine."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                 AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
        """
    )


_Q74_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
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
    from ..operators.incremental import scd2_apply_delta, scd2_runs

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
    from ..operators.incremental import snapshot_diff

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


def q91_temporal_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ SCD-2 dimension by validity interval — the canonical
    warehouse temporal lookup: each purchase event resolved to the
    dimension run that was CURRENT at the event's timestamp (user equi-key
    + [valid_from, valid_to) containment). The join is an equi-join on the
    key with the interval predicates as join filters, so it shuffles on
    user_id like any other keyed join — no range-explode, no cartesian;
    intervals tile each user's timeline (q65 invariant), so exactly one
    dimension row matches per fact."""
    from ..operators.incremental import scd2_runs

    ev = _t(spark, sf_dir, "events")
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
    from ..operators.quality import (
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


def q98_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly time-series rollup with last-observation-carried-
    forward — the hypertable ``time_bucket_gapfill + locf`` shape: hours
    with no purchase events still appear (n_events = 0) and carry the
    last known hourly average forward.

    Scale shape: the ONLY corpus-sized work is the hourly aggregate (one
    exchange on the bounded hour key, decimal sum for order-independent
    float parity — the q03 discipline). The spine is sequence(min, max,
    1 hour) exploded from a 1-row bounds aggregate; the spine⋈hourly left
    join and the LOCF window both run on HOUR-cardinality relations
    (≈ 720 rows/month), never the event stream — the unpartitioned LOCF
    window is deliberate and bounded (at multi-year scale, partition it
    by year and carry the year-boundary value in a second tiny pass)."""
    from ..operators.incremental import gap_fill_hourly

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return gap_fill_hourly(ev).orderBy("hour_ts")


_Q98_SQL = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour_ts,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS a
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1
), b AS (
  SELECT min(hour_ts) AS lo, max(hour_ts) AS hi FROM h
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts FROM b
)
SELECT s.hour_ts,
       coalesce(h.n_events, 0) AS n_events,
       round(last_value(h.a IGNORE NULLS) OVER (
         ORDER BY s.hour_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS avg_value_locf
FROM spine s LEFT JOIN h USING (hour_ts)
ORDER BY hour_ts
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
    from ..operators.incremental import merge_upsert

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
    from ..operators.layout import skew_report

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
    from ..operators.layout import epoch_shuffle

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
    from ..operators.quality import rate_anomalies

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
    from ..operators.incremental import stats_drift

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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


def q127_salted_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact⋈dim enrichment through the EXPLICIT salting path
    (operators/layout.salted_join): events scatter over 8 sub-keys, the
    customer dim replicates 8×, the join runs on (key, salt) — the
    plan a pipeline switches to when q114's skew report flags a hot key
    beyond AQE's split threshold. The oracle is the PLAIN join +
    rollup: a green hash proves salting is correctness-neutral
    (identical result set, different physical distribution) — the
    claim that makes the operator safe to drop into any hot join."""
    from ..operators.layout import salted_join

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
    from ..operators.layout import salted_count_distinct

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
    from ..operators.layout import range_boundaries

    li = _t(spark, sf_dir, "lineitem")
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


def q135_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: every click in the 24 h before
    a purchase (same user) shares that purchase's credit — 40 % to the
    first touch, 40 % to the last, 20 % across the middles. Credit is
    INTEGER BASIS POINTS with a deterministic remainder rule (the
    integer division's leftover goes to the earliest middle touch), so
    per-purchase credit sums to exactly 10000 and every rollup is exact
    under any aggregation order — the float-credit scheme every
    analytics stack hand-waves is engineered into integer arithmetic
    instead. One user-keyed range join (q16 shape), one per-purchase
    window pass, one 4-key rollup; the checksum column proves
    conservation in the output itself."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    j = p.join(c, "user_id").filter(
        (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS"))
    )
    w = W.partitionBy("pid").orderBy("cts", "cid")
    t = j.withColumn("r", F.row_number().over(w)).withColumn(
        "k", F.count("*").over(W.partitionBy("pid"))
    )
    base = F.floor(F.lit(2000) / (F.col("k") - 2)).cast("long")
    rem = F.lit(2000) - base * (F.col("k") - 2)
    credit = (
        F.when(F.col("k") == 1, F.lit(10000))
        .when(F.col("k") == 2, F.lit(5000))
        .when(F.col("r") == 1, F.lit(4000))
        .when(F.col("r") == F.col("k"), F.lit(4000))
        .when(F.col("r") == 2, base + rem)
        .otherwise(base)
    ).cast("long")
    role = (
        F.when(F.col("k") == 1, "only")
        .when(F.col("r") == 1, "first")
        .when(F.col("r") == F.col("k"), "last")
        .otherwise("middle")
    )
    return (
        t.select(role.alias("role"), credit.alias("bp"), "pid")
        .groupBy("role")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("bp").alias("credit_bp"),
            F.countDistinct("pid").alias("n_purchases"),
        )
        .orderBy("role")
    )


_Q135_SQL = """
WITH p AS (
  SELECT event_id AS pid, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS cid, user_id, ts AS cts
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.pid, c.cid, c.cts
  FROM p JOIN c ON c.user_id = p.user_id
  WHERE c.cts <= p.pts AND c.cts > p.pts - INTERVAL 24 HOURS
), t AS (
  SELECT pid, cid,
         row_number() OVER (PARTITION BY pid ORDER BY cts, cid) AS r,
         count(*) OVER (PARTITION BY pid) AS k
  FROM j
), credited AS (
  SELECT pid,
         CASE WHEN k = 1 THEN 'only'
              WHEN r = 1 THEN 'first'
              WHEN r = k THEN 'last'
              ELSE 'middle' END AS role,
         CAST(CASE WHEN k = 1 THEN 10000
              WHEN k = 2 THEN 5000
              WHEN r = 1 THEN 4000
              WHEN r = k THEN 4000
              WHEN r = 2 THEN (2000 // (k - 2)) + 2000 - (2000 // (k - 2)) * (k - 2)
              ELSE 2000 // (k - 2) END AS BIGINT) AS bp
  FROM t
)
SELECT role, count(*) AS n_touches,
       CAST(sum(bp) AS BIGINT) AS credit_bp,
       count(DISTINCT pid) AS n_purchases
FROM credited
GROUP BY role
ORDER BY role
"""


def q138_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped funnel conversion: sessions are 30-minute-gap
    windows per user (the q30 sessionization rule), and a session
    CONVERTS when it contains a purchase at-or-after a click — ordering
    inside the session matters, which is what distinguishes this from
    a mere co-occurrence count. Daily rollup: sessions, converted
    sessions, exact-integer counts, one rounded rate. Two window
    passes over the same user-keyed sort order (gap flag → session id,
    then min-click/convert flags per session) — Catalyst reuses the
    (user_id)-keyed exchange for both."""
    ev = _t(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
        > 1800 * 1_000_000,
        1,
    ).otherwise(0)
    first = F.when(F.lag("ts").over(wu).isNull(), 1).otherwise(0)
    s = ev.select("user_id", "event_id", "ts", "event_type").withColumn(
        "_new", F.greatest(gap, first)
    )
    s = s.withColumn(
        "session_id",
        F.sum("_new").over(
            wu.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    ws = W.partitionBy("user_id", "session_id")
    min_click = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(ws)
    converted = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & min_click.isNotNull()
            & (F.col("ts") >= min_click),
            1,
        ).otherwise(0)
    ).over(ws)
    per_session = (
        s.withColumn("_conv", converted)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.to_date("ts")).alias("day"),
            F.max("_conv").alias("conv"),
        )
    )
    return (
        per_session.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("conv").alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_sessions").cast("double"),
                4,
            ),
        )
        .orderBy("day")
    )


_Q138_SQL = """
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM s
), flagged AS (
  SELECT user_id, session_id, ts, event_type,
         min(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id, session_id) AS min_click
  FROM sid
), per_session AS (
  SELECT user_id, session_id,
         min(CAST(ts AS DATE)) AS day,
         max(CASE WHEN event_type = 'purchase' AND min_click IS NOT NULL
                    AND ts >= min_click THEN 1 ELSE 0 END) AS conv
  FROM flagged
  GROUP BY user_id, session_id
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       count(*) AS n_sessions,
       CAST(sum(conv) AS BIGINT) AS n_converted,
       round(CAST(sum(conv) AS DOUBLE) / count(*), 4) AS conversion_rate
FROM per_session
GROUP BY day
ORDER BY day
"""


def q140_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase latency distribution: the as-of join (q17
    machinery) pairs each purchase with its most recent prior click by
    the same user, and the report is exact p50/p90/p99 of the lag in
    seconds plus the match rate. Exact integer microsecond lags feed
    Spark's exact percentile ≡ DuckDB quantile_cont (the q114 parity);
    the match rate is one rounded division of exact counts. The
    operational number a funnel team actually pages on — how long the
    intent-to-purchase window really is."""
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    j = asof_join(
        p, c, on=["user_id"], left_ts="ts", right_ts="cts",
        right_payload=["cid"],
    )
    lag_s = (
        (F.unix_micros("ts") - F.unix_micros("cts")) / F.lit(1_000_000.0)
    )
    matched = j.filter(F.col("cid").isNotNull()).select(lag_s.alias("lag"))
    stats = matched.agg(
        F.count("*").alias("n_matched"),
        F.expr("percentile(lag, array(0.5, 0.9, 0.99))").alias("ps"),
    )
    total = p.agg(F.count("*").alias("n_purchases"))
    return stats.crossJoin(F.broadcast(total)).select(
        "n_purchases",
        "n_matched",
        F.round(
            F.col("n_matched").cast("double")
            / F.col("n_purchases").cast("double"),
            4,
        ).alias("match_rate"),
        F.round(F.element_at("ps", 1), 2).alias("p50_lag_s"),
        F.round(F.element_at("ps", 2), 2).alias("p90_lag_s"),
        F.round(F.element_at("ps", 3), 2).alias("p99_lag_s"),
    )


_Q140_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS cid, user_id, ts AS cts
  FROM events WHERE event_type = 'click'
), matched AS (
  SELECT p.event_id,
         epoch_us(p.ts) - epoch_us(max(c.cts)) AS lag_us
  FROM p JOIN c ON c.user_id = p.user_id AND c.cts <= p.ts
  GROUP BY p.event_id, p.ts
), lags AS (
  SELECT lag_us / 1000000.0 AS lag FROM matched
)
SELECT (SELECT count(*) FROM p) AS n_purchases,
       (SELECT count(*) FROM lags) AS n_matched,
       round(CAST((SELECT count(*) FROM lags) AS DOUBLE)
             / (SELECT count(*) FROM p), 4) AS match_rate,
       round(quantile_cont(lag, 0.5), 2) AS p50_lag_s,
       round(quantile_cont(lag, 0.9), 2) AS p90_lag_s,
       round(quantile_cont(lag, 0.99), 2) AS p99_lag_s
FROM lags
"""


def q144_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum read order (operators/layout.curriculum_order): docs
    tiered by length (shorter = earlier, tier = min(n_chars/250, 3) —
    the classic short-to-long curriculum), shuffled within tier,
    batches as contiguous cuts. The distributed composite-bucket rank
    is oracle-proven against the naive (tier, md5) global row_number —
    the q116 argument extended to a two-level key."""
    from ..operators.layout import curriculum_order

    docs = _t(spark, sf_dir, "documents").withColumn(
        "tier", F.least(F.floor(F.col("n_chars") / 250), F.lit(3)).cast("int")
    )
    return curriculum_order(
        docs, tier_col="tier", id_col="doc_id", seed="cur0", batch_size=64
    ).orderBy("global_pos")


_Q144_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(least(floor(n_chars / 250), 3) AS INTEGER) AS tier,
         md5('cur0:' || doc_id::VARCHAR) AS shuffle_key
  FROM documents
)
SELECT doc_id, tier, shuffle_key,
       row_number() OVER (ORDER BY tier, shuffle_key, doc_id) - 1
         AS global_pos,
       (row_number() OVER (ORDER BY tier, shuffle_key, doc_id) - 1) // 64
         AS batch_id
FROM t
ORDER BY global_pos
"""


def q152_sql_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape (order-priority checking) through the SQL
    surface: count orders per priority that have AT LEAST ONE line
    shipped more than 90 days after the order date — the correlated
    EXISTS that Catalyst rewrites into a left SEMI join (one probe per
    order, no row multiplication from multi-line orders, which a plain
    join + distinct would pay for). Both date predicates pushed; the
    date arithmetic is written identically in both engines."""
    from ..sources.files import register_views

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


def q153_sql_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13's shape (customer distribution) through the SQL surface:
    LEFT OUTER join customer→orders with an extra join-side predicate
    (non-urgent orders only — the analog of Q13's comment filter, and it
    must live in the ON clause: in the WHERE it would silently turn the
    outer join inner and drop the zero-order bucket), count orders per
    customer including the zero bucket, then histogram the counts. Two
    aggregations, the second over |distinct counts| rows. All-integer
    output — hash-exact by construction. The outer join hashes on the
    customer key; at scale AQE picks broadcast for the dim side."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """
    )


_Q153_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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


def q162_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust (median/MAD) outlier scan — the companion to q67's
    3σ scan for heavy-tailed values, where the mean and stddev are
    themselves dragged by the outliers they're meant to find. A row is
    an outlier when |x − median| > 3·1.4826·MAD.

    Exactness discipline: values are exact cents; 2·median of integers
    is an exact integer (the even-n midpoint average can only end in .5),
    so the center lives in half-cent ints and deviations 4·MAD in
    quarter-cent ints. The flag is the all-integer cross-multiply
    ``dev2·40000 > 44478·mad4`` (3·1.4826 = 4.4478) — no float division
    decides a row, both engines replay it bit-for-bit.

    Scale shape: two grouped aggregates over the scan (|types| groups)
    plus |types|-row broadcast joins back. Exact ``percentile`` buffers a
    group's values (same honesty note as q41/q129); the 100 TB swap is
    ``percentile_approx`` with the flag inequality unchanged."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    base = ev.select("event_type", cents.alias("c"))
    med = base.groupBy("event_type").agg(
        F.expr("CAST(round(2 * percentile(c, 0.5)) AS BIGINT)").alias("m2")
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", "m2", F.abs(2 * F.col("c") - F.col("m2")).alias("dev2")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(round(2 * percentile(dev2, 0.5)) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("m2").alias("_m2"),
            F.max("mad4").alias("_mad4"),
            F.sum(
                (F.col("dev2") * 40000 > 44478 * F.col("mad4")).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("_m2") / 200.0, 3).alias("median_value"),
            F.round(F.col("_mad4") / 400.0, 3).alias("mad_value"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


_Q162_SQL = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
), med AS (
  SELECT event_type, CAST(round(2 * quantile_cont(c, 0.5)) AS BIGINT) AS m2
  FROM base GROUP BY event_type
), dev AS (
  SELECT b.event_type, m.m2, abs(2 * b.c - m.m2) AS dev2
  FROM base b JOIN med m USING (event_type)
), mad AS (
  SELECT event_type,
         CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT) AS mad4
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       count(*) AS n,
       round(max(d.m2) / 200.0, 3) AS median_value,
       round(max(a.mad4) / 400.0, 3) AS mad_value,
       CAST(sum(CASE WHEN d.dev2 * 40000 > 44478 * a.mad4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


def q163_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over event values — the
    data-forensics screen for fabricated or re-scaled numeric feeds (a
    synthetic generator that draws uniformly shows up instantly against
    the log-law). The digit is taken from the STRING form of the exact
    cents integer — no log10, whose float boundary at powers of ten
    flips digits between engines. One grouped aggregate to 9 rows; the
    observed share is the single rounded division of exact integers, and
    the expected Benford shares are identical literals in both engines
    (never computed — log10(1+1/d) last-ulp differences would leak into
    the hash)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    expected = {
        1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
        6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
    }
    exp_expr = F.create_map(
        *[F.lit(x) for kv in expected.items() for x in kv]
    )
    digits = ev.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    ).filter(F.col("digit") >= 1)
    total = digits.groupBy().agg(F.count("*").alias("n_total"))
    return (
        digits.groupBy("digit")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_total"), 6).alias(
                "share"
            ),
            exp_expr[F.col("digit")].alias("benford_share"),
        )
        .orderBy("digit")
    )


_Q163_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS digit
  FROM events
), dd AS (
  SELECT digit FROM d WHERE digit >= 1
), t AS (
  SELECT count(*) AS n_total FROM dd
)
SELECT digit, count(*) AS n,
       round(CAST(count(*) AS DOUBLE) / max(t.n_total), 6) AS share,
       CAST(CASE digit
         WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091 WHEN 3 THEN 0.124939
         WHEN 4 THEN 0.09691 WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
         WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 ELSE 0.045757
       END AS DOUBLE) AS benford_share
FROM dd CROSS JOIN t
GROUP BY digit
ORDER BY digit
"""


def q165_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequential pattern audit: each user's full
    event history becomes an ordered character string (c/e/p/s/v by
    type initial, sorted by ts then event_id for a total order) and
    three behavioral patterns are tested as regexes over it — the CEP
    primitive (completed funnel with gaps 's.*v.*c.*p', recovery
    'e.*p', bounce = never purchases). Spark has no MATCH_RECOGNIZE;
    a sorted-collect + rlike replays it exactly and the oracle proves
    the two engines agree on both the ordering and the matching.

    Scale shape: ONE user-keyed exchange into the sorted collect; the
    path string is bounded by per-user activity, not corpus size (a
    real deployment caps it with slice(arr, 1, N) — same contract as
    the capped-basket discipline in graph.py). The pattern rollup is a
    3-row unpivot of one aggregate row; share is the single rounded
    division of exact integers."""
    ev = _t(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("ch")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            "user_id",
            F.concat_ws("", F.expr("transform(arr, x -> x.ch)")).alias("path"),
        )
    )
    agg = paths.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("path").rlike("s.*v.*c.*p").cast("long")).alias("m_funnel"),
        F.sum(F.col("path").rlike("e.*p").cast("long")).alias("m_recovery"),
        F.sum((~F.col("path").rlike("p")).cast("long")).alias("m_bounce"),
    )
    return agg.selectExpr(
        "n_users",
        "stack(3, 'funnel_complete', m_funnel,"
        " 'recovery_purchase', m_recovery,"
        " 'bounce_no_purchase', m_bounce) AS (pattern, n_matched)",
    ).select(
        "pattern",
        "n_users",
        "n_matched",
        F.round(F.col("n_matched").cast("double") / F.col("n_users"), 6).alias(
            "share"
        ),
    ).orderBy("pattern")


_Q165_SQL = """
WITH paths AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
), a AS (
  SELECT count(*) AS n_users,
         CAST(sum(CASE WHEN regexp_matches(path, 's.*v.*c.*p')
                       THEN 1 ELSE 0 END) AS BIGINT) AS m_funnel,
         CAST(sum(CASE WHEN regexp_matches(path, 'e.*p')
                       THEN 1 ELSE 0 END) AS BIGINT) AS m_recovery,
         CAST(sum(CASE WHEN NOT regexp_matches(path, 'p')
                       THEN 1 ELSE 0 END) AS BIGINT) AS m_bounce
  FROM paths
)
SELECT u.pattern, a.n_users, u.n_matched,
       round(CAST(u.n_matched AS DOUBLE) / a.n_users, 6) AS share
FROM a, (
  SELECT 'funnel_complete' AS pattern, m_funnel AS n_matched FROM a
  UNION ALL SELECT 'recovery_purchase', m_recovery FROM a
  UNION ALL SELECT 'bounce_no_purchase', m_bounce FROM a
) u
ORDER BY pattern
"""


def q166_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed WEIGHTED median: per return flag, the smallest
    price p such that lineitems priced ≤ p carry at least half the
    total shipped QUANTITY — the volume-weighted center a pricing
    analysis wants (the plain median treats a 50-unit line like a
    1-unit line). No built-in does weighted quantiles exactly in
    either engine; the cumulative-weight window replays identically in
    both: one per-group sort exchange for the running sum, a broadcast
    1-row-per-group total, and the all-integer cut ``2·cumw ≥ W``
    (quantities are integral — no float compares anywhere; the output
    price is exact cents divided once, rounded)."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    w_cum = W.partitionBy("l_returnflag").orderBy("pc").rowsBetween(
        W.unboundedPreceding, 0
    )
    tot = base.groupBy("l_returnflag").agg(F.sum("q").alias("wtot"))
    cum = (
        base.groupBy("l_returnflag", "pc")
        .agg(F.sum("q").alias("qp"))
        .withColumn("cumw", F.sum("qp").over(w_cum))
    )
    return (
        cum.join(F.broadcast(tot), "l_returnflag")
        .filter(2 * F.col("cumw") >= F.col("wtot"))
        .groupBy("l_returnflag")
        .agg(F.min("pc").alias("_pc"), F.max("wtot").alias("total_quantity"))
        .select(
            "l_returnflag",
            F.round(F.col("_pc") / 100.0, 2).alias("weighted_median_price"),
            "total_quantity",
        )
        .orderBy("l_returnflag")
    )


_Q166_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
), grp AS (
  SELECT l_returnflag, pc, CAST(sum(q) AS BIGINT) AS qp
  FROM base GROUP BY l_returnflag, pc
), cum AS (
  SELECT l_returnflag, pc, qp,
         CAST(sum(qp) OVER (PARTITION BY l_returnflag ORDER BY pc
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
  FROM grp
), tot AS (
  SELECT l_returnflag, CAST(sum(q) AS BIGINT) AS wtot
  FROM base GROUP BY l_returnflag
)
SELECT c.l_returnflag,
       round(min(c.pc) / 100.0, 2) AS weighted_median_price,
       max(t.wtot) AS total_quantity
FROM cum c JOIN tot t USING (l_returnflag)
WHERE 2 * c.cumw >= t.wtot
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
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
    from ..operators.layout import zorder_key

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


def q173_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-novelty decay curve — the crawl-ops metric behind "is this
    feed still worth ingesting": per day, how many item references the
    event stream carried, how many were the item's FIRST-EVER
    appearance, the day's novelty share, and the cumulative distinct
    vocabulary. A healthy feed's novelty decays slowly; a recrawl loop
    pins near zero. Two grouped aggregates — first-seen date per item
    (|items| rows), then the daily rollup — plus one cumulative window
    over the |days|-row result (tiny, not the corpus). Exact integers;
    one rounded division."""
    ev = _t(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("bigint")
    base = ev.select(
        F.to_date("ts").alias("d"), item.alias("item")
    ).filter(F.col("item").isNotNull())
    daily = base.groupBy("d").agg(F.count("*").alias("n_refs"))
    first = base.groupBy("item").agg(F.min("d").alias("d0"))
    news = first.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").alias("n_new")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return (
        daily.join(news, "d", "left")
        .select("d", "n_refs", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .withColumn("cum_vocab", F.sum("n_new").over(w))
        .select(
            "d",
            "n_refs",
            "n_new",
            "cum_vocab",
            F.round(
                F.col("n_new").cast("double") / F.col("n_refs"), 4
            ).alias("novelty_share"),
        )
        .orderBy("d")
    )


_Q173_SQL = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
), daily AS (
  SELECT d, count(*) AS n_refs FROM base GROUP BY d
), first AS (
  SELECT item, min(d) AS d0 FROM base GROUP BY item
), news AS (
  SELECT d0 AS d, count(*) AS n_new FROM first GROUP BY d0
)
SELECT dy.d, dy.n_refs,
       coalesce(nw.n_new, 0) AS n_new,
       CAST(sum(coalesce(nw.n_new, 0))
            OVER (ORDER BY dy.d ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_vocab,
       round(CAST(coalesce(nw.n_new, 0) AS DOUBLE) / dy.n_refs, 4)
         AS novelty_share
FROM daily dy LEFT JOIN news nw USING (d)
ORDER BY dy.d
"""


def q174_sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT round-trip through the SQL surface: daily event
    counts pivoted wide by type, then UNPIVOTed straight back — the
    oracle is the PLAIN GROUP BY, so a green hash proves the two
    clauses compose to the identity (including the null-cell contract:
    PIVOT fills absent (day, type) cells with NULL and UNPIVOT drops
    NULLs, so missing combinations stay missing on both sides). The
    DataFrame pivot is q38; this pins the SQL front-end's clauses."""
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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


def q176_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply WITH tombstones (operators/incremental.cdc_apply): the
    orders table as of 1999-01-01 is the stored state; later orders
    become a change stream where 'P'-status rows are DELETE tombstones
    and the rest are upserts, latest-per-key wins by order date. The
    oracle rebuilds the same final state from scratch with one window —
    a green hash proves apply(state, cdc) == rebuild(full), deletes
    included, which is the invariant a lakehouse MERGE with WHEN
    MATCHED ... DELETE must hold."""
    from ..operators.incremental import cdc_apply

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


def q177_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — the hypertable
    ``time_weight(locf)`` shape: between consecutive events the value
    holds (last observation carried forward), so the average weights
    each reading by HOW LONG it was current, not by how often the
    sensor fired — a burst of identical readings stops biasing the
    mean. TWAP = Σ vᵢ·Δtᵢ / Σ Δtᵢ over each user's consecutive-event
    segments. Exactness: cents × microseconds products summed as
    BIGINTs (≤ ~4·10¹⁵ per segment — no overflow), one rounded final
    division. One user-keyed window (lead) + one grouped sum — the
    q66/q138 exchange pattern."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
            F.expr("unix_micros(ts)").alias("us"),
        )
        .withColumn("us2", F.lead("us").over(w))
        .filter(F.col("us2").isNotNull())
        .select(
            "user_id", "c", (F.col("us2") - F.col("us")).alias("dt")
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.col("c") * F.col("dt")).alias("_num"),
            F.sum("dt").alias("_den"),
        )
        .filter(F.col("_den") > 0)
        .select(
            "user_id",
            "n_segments",
            F.round(
                F.col("_num").cast("double") / (F.col("_den") * F.lit(100)),
                4,
            ).alias("twap_value"),
        )
        .orderBy("user_id")
    )


_Q177_SQL = """
WITH seg AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(*) AS n_segments,
       round(CAST(sum(c * dt) AS BIGINT)
             / CAST(CAST(sum(dt) AS BIGINT) * 100 AS DOUBLE), 4)
         AS twap_value
FROM seg
WHERE dt IS NOT NULL
GROUP BY user_id
HAVING CAST(sum(dt) AS BIGINT) > 0
ORDER BY user_id
"""


def q178_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle rollup — the financial/monitoring downsample: per
    (event_type, day), the opening value, high, low, and closing value
    plus volume. Open/close use ``min_by``/``max_by`` on a PACKED
    deterministic key (epoch-micros·1000 + event_id mod 1000 — two
    events in the same microsecond still order identically in both
    engines; a bare ts tiebreak would be engine-dependent). One grouped
    aggregate, all partials map-side combinable; exact cents until the
    four rounded output divisions."""
    ev = _t(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100, 0).cast("long")
    key = F.expr("unix_micros(ts) * 1000 + event_id % 1000")
    base = ev.select(
        F.to_date("ts").alias("d"),
        "event_type",
        c.alias("c"),
        key.alias("k"),
    )
    return (
        base.groupBy("event_type", "d")
        .agg(
            F.count("*").alias("n"),
            F.expr("min_by(c, k)").alias("_o"),
            F.max("c").alias("_h"),
            F.min("c").alias("_l"),
            F.expr("max_by(c, k)").alias("_c"),
        )
        .select(
            "event_type",
            "d",
            "n",
            F.round(F.col("_o") / F.lit(100.0), 2).alias("open"),
            F.round(F.col("_h") / F.lit(100.0), 2).alias("high"),
            F.round(F.col("_l") / F.lit(100.0), 2).alias("low"),
            F.round(F.col("_c") / F.lit(100.0), 2).alias("close"),
        )
        .orderBy("event_type", "d")
    )


_Q178_SQL = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d, event_type,
         CAST(round(value * 100) AS BIGINT) AS c,
         epoch_us(ts) * 1000 + event_id % 1000 AS k
  FROM events
)
SELECT event_type, d, count(*) AS n,
       round(CAST(CAST(min_by(c, k) AS BIGINT) AS DOUBLE) / 100.0, 2) AS open,
       round(CAST(CAST(max(c) AS BIGINT) AS DOUBLE) / 100.0, 2) AS high,
       round(CAST(CAST(min(c) AS BIGINT) AS DOUBLE) / 100.0, 2) AS low,
       round(CAST(CAST(max_by(c, k) AS BIGINT) AS DOUBLE) / 100.0, 2) AS close
FROM base
GROUP BY event_type, d
ORDER BY event_type, d
"""


def q180_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic behavioral cut: per user, Recency
    (days since last purchase, vs the stream's max date), Frequency
    (purchase count), Monetary (exact cents), each scored into
    quintiles against EXACT percentile boundaries of the user-level
    relation, then segment counts. Boundaries come from one percentile
    aggregate over the |users|-row rollup broadcast back (the q41/q129
    exact tier — percentile_approx is the swap when users outgrow a
    buffer); scoring is pure comparisons against those boundaries, so
    both engines bucket identically (interpolated boundaries are exact
    rationals of ints). Output is the ≤125-row (r, f, m) segment
    census with mean monetary value per segment — exact integers and
    two rounded divisions."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    mx = p.agg(F.max(F.to_date("ts")).alias("d_max"))
    users = (
        p.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.min(F.datediff(F.col("d_max"), F.to_date("ts"))).alias("rec"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("mon"),
        )
    )
    bounds = users.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c}_{int(q * 100)}")
            for c in ("rec", "freq", "mon")
            for q in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def score(c: str, invert: bool) -> F.Column:
        s = (
            F.when(F.col(c) <= F.col(f"{c}_20"), 1)
            .when(F.col(c) <= F.col(f"{c}_40"), 2)
            .when(F.col(c) <= F.col(f"{c}_60"), 3)
            .when(F.col(c) <= F.col(f"{c}_80"), 4)
            .otherwise(5)
        )
        # low recency = GOOD → invert so 5 is always the best quintile
        return (6 - s) if invert else s

    scored = users.crossJoin(F.broadcast(bounds)).select(
        score("rec", True).alias("r_score"),
        score("freq", False).alias("f_score"),
        score("mon", False).alias("m_score"),
        "mon",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("mon").alias("_mon"),
        )
        .select(
            "r_score",
            "f_score",
            "m_score",
            "n_users",
            # round-half-up to the CENT in pure integers, then one
            # exact /100 — round(sum/(n·100), 2) hits .xx5 ties where
            # Spark (decimal-string HALF_UP) and DuckDB (binary double)
            # disagree by a cent.
            (
                F.expr("(2 * _mon + n_users) div (2 * n_users)").cast("double")
                / F.lit(100.0)
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_Q180_SQL = """
WITH p AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), mx AS (
  SELECT max(d) AS d_max FROM p
), users AS (
  SELECT user_id,
         min(date_diff('day', d, d_max)) AS rec,
         count(*) AS freq,
         CAST(sum(cents) AS BIGINT) AS mon
  FROM p CROSS JOIN mx
  GROUP BY user_id
), bounds AS (
  SELECT quantile_cont(rec, 0.2) AS rec_20, quantile_cont(rec, 0.4) AS rec_40,
         quantile_cont(rec, 0.6) AS rec_60, quantile_cont(rec, 0.8) AS rec_80,
         quantile_cont(freq, 0.2) AS freq_20, quantile_cont(freq, 0.4) AS freq_40,
         quantile_cont(freq, 0.6) AS freq_60, quantile_cont(freq, 0.8) AS freq_80,
         quantile_cont(mon, 0.2) AS mon_20, quantile_cont(mon, 0.4) AS mon_40,
         quantile_cont(mon, 0.6) AS mon_60, quantile_cont(mon, 0.8) AS mon_80
  FROM users
), scored AS (
  SELECT 6 - (CASE WHEN rec <= rec_20 THEN 1 WHEN rec <= rec_40 THEN 2
                   WHEN rec <= rec_60 THEN 3 WHEN rec <= rec_80 THEN 4
                   ELSE 5 END) AS r_score,
         CASE WHEN freq <= freq_20 THEN 1 WHEN freq <= freq_40 THEN 2
              WHEN freq <= freq_60 THEN 3 WHEN freq <= freq_80 THEN 4
              ELSE 5 END AS f_score,
         CASE WHEN mon <= mon_20 THEN 1 WHEN mon <= mon_40 THEN 2
              WHEN mon <= mon_60 THEN 3 WHEN mon <= mon_80 THEN 4
              ELSE 5 END AS m_score,
         mon
  FROM users CROSS JOIN bounds
)
SELECT r_score, f_score, m_score,
       count(*) AS n_users,
       CAST((2 * CAST(sum(mon) AS BIGINT) + count(*)) // (2 * count(*))
            AS DOUBLE) / 100.0 AS avg_monetary
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
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
    from ..operators.expectations import (
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


def q182_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (event type × day-of-week) with the
    statistic defined in EXACT integer arithmetic: per cell,
    (O·N − R·C)²/(N·R·C) is computed as integer quotient-plus-scaled-
    remainder in milli-units — ``d² div M · 1000 + (d² mod M) · 1000
    div M`` — so the cross-cell sum is an exact BIGINT and both engines
    agree bit-for-bit (a per-cell double sum would be aggregation-order
    -dependent). The floor-quantization understates χ² by < 1 milli per
    cell — a DEFINED statistic, stated in the report. Magnitude audit:
    d² ≤ (O·N)² needs N·O < 3·10⁹ — true well past sf0.1; the
    DECIMAL(38) swap is the documented big-N path. One grouped count +
    tiny margin joins; dow parity pinned (Spark dayofweek−1 ≡ DuckDB
    dow)."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(F.count("*").alias("o"))
    rows_m = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    # FULL grid: absent (type, dow) cells are real zero observations and
    # contribute R·C/N each — dropping them understates the statistic
    # (a perfectly dependent 2x2 would read half its true chi2).
    grid = rows_m.crossJoin(cols_m)
    j = (
        grid.join(cells, ["event_type", "dow"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    term = F.expr(
        "(o * n - r * c) * (o * n - r * c) div (n * r * c) * 1000"
        " + ((o * n - r * c) * (o * n - r * c) % (n * r * c)) * 1000"
        "   div (n * r * c)"
    )
    agg = j.agg(
        F.max("n").alias("n"),
        F.count("*").alias("n_cells"),
        F.countDistinct("event_type").alias("_nt"),
        F.countDistinct("dow").alias("_nd"),
        F.sum(term).alias("chi2_milli"),
    )
    return agg.select(
        "n",
        "n_cells",
        ((F.col("_nt") - 1) * (F.col("_nd") - 1)).alias("dof"),
        "chi2_milli",
        F.round(F.col("chi2_milli").cast("double") / 1000.0, 3).alias("chi2"),
    )


_Q182_SQL = """
WITH cells AS (
  SELECT event_type, CAST(date_part('dow', ts) AS INTEGER) AS dow,
         count(*) AS o
  FROM events GROUP BY event_type, CAST(date_part('dow', ts) AS INTEGER)
), rm AS (
  SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY event_type
), cm AS (
  SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY dow
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
), grid AS (
  SELECT rm.event_type, rm.r, cm.dow, cm.c FROM rm CROSS JOIN cm
), j AS (
  SELECT coalesce(cells.o, 0) AS o, grid.r, grid.c, tot.n
  FROM grid LEFT JOIN cells USING (event_type, dow) CROSS JOIN tot
), terms AS (
  SELECT n,
         (o * n - r * c) * (o * n - r * c) // (n * r * c) * 1000
         + ((o * n - r * c) * (o * n - r * c) % (n * r * c)) * 1000
           // (n * r * c) AS t
  FROM j
)
SELECT max(n) AS n,
       count(*) AS n_cells,
       CAST((SELECT count(*) FROM rm) - 1 AS BIGINT)
         * ((SELECT count(*) FROM cm) - 1) AS dof,
       CAST(sum(t) AS BIGINT) AS chi2_milli,
       round(CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) / 1000.0, 3) AS chi2
FROM terms
"""


def q184_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Spearman rank correlation between customer account
    balance and lifetime order spend, EXACT to the last bit: tie-aware
    average ranks are doubled to stay integral (tie group of size c at
    min-rank p has average rank p+(c−1)/2, so 2·rank+cnt−1 is an exact
    integer), and ρ² is the integer quotient num²·10⁶ div (denx·deny)
    over the Pearson-on-ranks sums — no cross-row float ever forms, so
    aggregation order cannot perturb the statistic. ρ itself is the one
    sanctioned float chain: sign · √(ρ²µ/10⁶), both factors exact
    doubles, √ correctly rounded IEEE in both engines. Magnitude audit:
    with n customers per group, doubled ranks ≤ 2n, num ≤ 4n⁴ (BIGINT
    past sf1), num²·10⁶ ≤ 2.7·10³⁷ < 10³⁸ at n=6000 — the DECIMAL(38)
    ceiling, stated. Degenerate groups (a constant side, e.g. every
    customer unspent) have den=0 → ρ NULL, not a crash.

    Scale shape: spend rollup is one fact-keyed exchange; ranks are two
    windows over the SAME nation partitioning (one exchange, two sorts);
    group size is |customers|/|nations| — for unbounded groups swap in
    the q144 distributed-rank (range-partitioned) path. Final stats are
    a 25-row aggregate."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("spend_c")
    )
    base = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            "n_name",
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("xc"),
            F.coalesce("spend_c", F.lit(0)).alias("yc"),
        )
    )
    wx = W.partitionBy("n_name").orderBy("xc")
    wy = W.partitionBy("n_name").orderBy("yc")
    ranked = base.select(
        "n_name",
        (2 * F.rank().over(wx) + F.count("*").over(W.partitionBy("n_name", "xc")) - 1)
        .alias("rx"),
        (2 * F.rank().over(wy) + F.count("*").over(W.partitionBy("n_name", "yc")) - 1)
        .alias("ry"),
    )
    s = ranked.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = "(cast(n as decimal(19,0)) * sxy - cast(sx as decimal(19,0)) * sy)"
    denx = "(cast(n as decimal(19,0)) * sxx - cast(sx as decimal(19,0)) * sx)"
    deny = "(cast(n as decimal(19,0)) * syy - cast(sy as decimal(19,0)) * sy)"
    rho2u = (
        f"case when {denx} = 0 or {deny} = 0 then null "
        f"else {num} * {num} * 1000000 div ({denx} * {deny}) end"
    )
    sign = f"cast(case when {num} > 0 then 1 when {num} < 0 then -1 else 0 end as int)"
    return s.select(
        F.col("n_name").alias("nation"),
        "n",
        F.expr(rho2u).alias("rho2_micro"),
        F.expr(sign).alias("rho_sign"),
        F.expr(
            f"round({sign} * sqrt(cast({rho2u} as double) / 1e6), 4)"
        ).alias("rho"),
    ).orderBy("nation")


_Q184_SQL = """
WITH spend AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_c
  FROM orders GROUP BY o_custkey
), base AS (
  SELECT n_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS xc,
         coalesce(spend_c, 0) AS yc
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN spend ON c_custkey = o_custkey
), ranked AS (
  SELECT n_name,
         2 * rank() OVER (PARTITION BY n_name ORDER BY xc)
           + count(*) OVER (PARTITION BY n_name, xc) - 1 AS rx,
         2 * rank() OVER (PARTITION BY n_name ORDER BY yc)
           + count(*) OVER (PARTITION BY n_name, yc) - 1 AS ry
  FROM base
), s AS (
  SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
         CAST(sum(rx * ry) AS HUGEINT) AS sxy,
         CAST(sum(rx * rx) AS HUGEINT) AS sxx,
         CAST(sum(ry * ry) AS HUGEINT) AS syy
  FROM ranked GROUP BY n_name
)
SELECT n_name AS nation,
       CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                 THEN NULL
                 ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
                      // ((n * sxx - sx * sx) * (n * syy - sy * sy)) END
            AS BIGINT) AS rho2_micro,
       CAST(CASE WHEN (n * sxy - sx * sy) > 0 THEN 1
                 WHEN (n * sxy - sx * sy) < 0 THEN -1 ELSE 0 END
            AS INTEGER) AS rho_sign,
       round(CASE WHEN (n * sxy - sx * sy) > 0 THEN 1
                  WHEN (n * sxy - sx * sy) < 0 THEN -1 ELSE 0 END
             * sqrt(CAST(CAST(CASE WHEN (n * sxx - sx * sx) = 0
                                        OR (n * syy - sy * sy) = 0
                                   THEN NULL
                                   ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy)
                                        * 1000000
                                        // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                                   END AS BIGINT) AS DOUBLE) / 1e6), 4) AS rho
FROM s
ORDER BY nation
"""


def q185_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent curation gates (a char-length
    rater and a token-count rater) — the inter-annotator-agreement number
    a labeling pipeline reports before trusting cheap filters. Exact
    rational: κ = (n·agree − pe) / (n² − pe) with pe = r₁c₁ + r₀c₀ all
    integers from ONE fused aggregate scan (the 2×2 confusion, both
    margins, and n come out of the same pass — no per-cell re-scan).
    κ_micro is the truncating integer quotient ·10⁶ (both engines
    truncate toward zero); κ itself divides two ≤10⁶ exact doubles.
    Magnitude: n² needs DECIMAL past ~3·10⁹ docs — cast up front (19,0),
    DuckDB HUGEINT; the div is exact at any corpus size. pe = n²
    (a degenerate all-one-cell corpus) → NULL, not a crash."""
    docs = _t(spark, sf_dir, "documents")
    flags = docs.select(
        (F.col("n_chars").between(200, 5000)).cast("long").alias("a"),
        (F.size(F.split(F.col("text"), " ")) >= 40).cast("long").alias("b"),
    )
    s = flags.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("cast(a = 1 and b = 1 as long)")).alias("c11"),
        F.sum(F.expr("cast(a = 1 and b = 0 as long)")).alias("c10"),
        F.sum(F.expr("cast(a = 0 and b = 1 as long)")).alias("c01"),
        F.sum(F.expr("cast(a = 0 and b = 0 as long)")).alias("c00"),
    )
    n = "cast(n as decimal(19,0))"
    pe = f"(cast(c11 + c10 as decimal(19,0)) * (c11 + c01) + cast(c01 + c00 as decimal(19,0)) * (c10 + c00))"
    num = f"({n} * (c11 + c00) - {pe})"
    den = f"({n} * n - {pe})"
    kmicro = f"case when {den} = 0 then null else {num} * 1000000 div {den} end"
    return s.select(
        "n", "c11", "c10", "c01", "c00",
        F.expr(kmicro).alias("kappa_micro"),
        F.expr(f"round(cast({kmicro} as double) / 1e6, 4)").alias("kappa"),
    )


_Q185_SQL = """
WITH flags AS (
  SELECT CAST(n_chars BETWEEN 200 AND 5000 AS BIGINT) AS a,
         CAST(len(string_split(text, ' ')) >= 40 AS BIGINT) AS b
  FROM documents
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(a = 1 AND b = 1 AS BIGINT)) AS HUGEINT) AS c11,
         CAST(sum(CAST(a = 1 AND b = 0 AS BIGINT)) AS HUGEINT) AS c10,
         CAST(sum(CAST(a = 0 AND b = 1 AS BIGINT)) AS HUGEINT) AS c01,
         CAST(sum(CAST(a = 0 AND b = 0 AS BIGINT)) AS HUGEINT) AS c00
  FROM flags
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(c11 AS BIGINT) AS c11, CAST(c10 AS BIGINT) AS c10,
       CAST(c01 AS BIGINT) AS c01, CAST(c00 AS BIGINT) AS c00,
       CAST(CASE WHEN (n * n - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00))) = 0
                 THEN NULL
                 ELSE (n * (c11 + c00) - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)))
                      * 1000000
                      // (n * n - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)))
            END AS BIGINT) AS kappa_micro,
       round(CAST(CAST(CASE WHEN (n * n - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00))) = 0
                 THEN NULL
                 ELSE (n * (c11 + c00) - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)))
                      * 1000000
                      // (n * n - ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)))
            END AS BIGINT) AS DOUBLE) / 1e6, 4) AS kappa
FROM s
"""


def q186_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance, EXACT, per ship-year:
    does the price distribution of returned lineitems differ from kept
    ones? D = max|F₁−F₂| is evaluated at every pooled price point
    without a single float: per (year, cents) counts → one cumulative
    window over the distinct-price rows → the integer envelope
    max|n₂·cum₁ − n₁·cum₂|, divided once at the end (truncating ·10⁶
    quotient; both engines truncate toward zero). The window partitions
    by year (the q166 weighted-quantile shape: the sort touches
    DISTINCT prices, not rows); for unbounded value domains pre-bucket
    with the q68 equi-width grid first. n₁·n₂ outgrows BIGINT near 3·10⁹
    rows/side — the DECIMAL cast up front is that ceiling. A year with
    either side empty yields NULL distance, not a crash."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.year("l_shipdate").alias("ship_year"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("pc"),
        (F.col("l_returnflag") == "R").cast("long").alias("r"),
    )
    cnt = base.groupBy("ship_year", "pc").agg(
        F.sum("r").alias("c1"), F.sum(1 - F.col("r")).alias("c2")
    )
    w = W.partitionBy("ship_year").orderBy("pc").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = cnt.select(
        "ship_year",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = cnt.groupBy("ship_year").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    env = (
        cum.join(F.broadcast(tot), "ship_year")
        .groupBy("ship_year")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(
                F.abs(
                    F.expr("cast(n2 as decimal(19,0)) * cum1")
                    - F.expr("cast(n1 as decimal(19,0)) * cum2")
                )
            ).alias("dnum"),
        )
    )
    ksu = (
        "case when n1 = 0 or n2 = 0 then null "
        "else dnum * 1000000 div (cast(n1 as decimal(19,0)) * n2) end"
    )
    return env.select(
        "ship_year", "n1", "n2",
        F.expr(ksu).alias("ks_micro"),
        F.expr(f"round(cast({ksu} as double) / 1e6, 4)").alias("ks"),
    ).orderBy("ship_year")


_Q186_SQL = """
WITH base AS (
  SELECT CAST(date_part('year', l_shipdate) AS INTEGER) AS ship_year,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(l_returnflag = 'R' AS BIGINT) AS r
  FROM lineitem
), cnt AS (
  SELECT ship_year, pc,
         CAST(sum(r) AS BIGINT) AS c1,
         CAST(sum(1 - r) AS BIGINT) AS c2
  FROM base GROUP BY ship_year, pc
), cum AS (
  SELECT ship_year,
         sum(c1) OVER (PARTITION BY ship_year ORDER BY pc
                       ROWS UNBOUNDED PRECEDING) AS cum1,
         sum(c2) OVER (PARTITION BY ship_year ORDER BY pc
                       ROWS UNBOUNDED PRECEDING) AS cum2
  FROM cnt
), tot AS (
  SELECT ship_year, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2
  FROM cnt GROUP BY ship_year
), env AS (
  SELECT cum.ship_year, max(n1) AS n1, max(n2) AS n2,
         max(abs(CAST(n2 AS HUGEINT) * cum1 - CAST(n1 AS HUGEINT) * cum2))
           AS dnum
  FROM cum JOIN tot ON cum.ship_year = tot.ship_year
  GROUP BY cum.ship_year
)
SELECT ship_year, n1, n2,
       CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                 ELSE dnum * 1000000 // (CAST(n1 AS HUGEINT) * n2) END
            AS BIGINT) AS ks_micro,
       round(CAST(CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                 ELSE dnum * 1000000 // (CAST(n1 AS HUGEINT) * n2) END
            AS BIGINT) AS DOUBLE) / 1e6, 4) AS ks
FROM env
ORDER BY ship_year
"""


def q187_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (tie-aware, EXACT) per source: do English docs run
    longer than non-English ones? Doubled U stays integral under ties —
    2U₁ = Σ_v c1(v)·(2·cum2(<v) + c2(v)) over per-(source, n_chars)
    counts, one exclusive cumulative window over DISTINCT lengths (the
    q166/q186 shape: the sort never touches raw rows). The rank-biserial
    effect size r = U₁/(n₁n₂·½) − 1 = (2U₁ − 2n₁n₂+...)/... is emitted
    as the truncating quotient (2U₁ − n₁n₂)·10⁶ div (n₁n₂) ∈ [−10⁶,10⁶]
    — sign says which side stochastically dominates; both engines
    truncate toward zero. Products cast to DECIMAL/HUGEINT up front
    (n₁n₂ outgrows BIGINT near 3·10⁹ docs/side). One-sided sources →
    NULL effect."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        F.col("n_chars").alias("nc"),
        (F.col("lang") == "en").cast("long").alias("e"),
    )
    cnt = base.groupBy("source", "nc").agg(
        F.sum("e").alias("c1"), F.sum(1 - F.col("e")).alias("c2")
    )
    w_excl = W.partitionBy("source").orderBy("nc").rowsBetween(
        W.unboundedPreceding, -1
    )
    u_terms = cnt.select(
        "source", "c1", "c2",
        F.coalesce(F.sum("c2").over(w_excl), F.lit(0)).alias("cum2x"),
    )
    s = u_terms.groupBy("source").agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.expr("cast(c1 as decimal(19,0)) * (2 * cum2x + c2)")
        ).alias("u2"),
    )
    rbu = (
        "case when n1 = 0 or n2 = 0 then null "
        "else (u2 - cast(n1 as decimal(19,0)) * n2) * 1000000 "
        "     div (cast(n1 as decimal(19,0)) * n2) end"
    )
    return s.select(
        "source", "n1", "n2",
        F.col("u2").cast("long").alias("u2"),
        F.expr(rbu).alias("rb_micro"),
        F.expr(f"round(cast({rbu} as double) / 1e6, 4)").alias("rank_biserial"),
    ).orderBy("source")


_Q187_SQL = """
WITH base AS (
  SELECT source, n_chars AS nc, CAST(lang = 'en' AS BIGINT) AS e
  FROM documents
), cnt AS (
  SELECT source, nc, CAST(sum(e) AS BIGINT) AS c1,
         CAST(sum(1 - e) AS BIGINT) AS c2
  FROM base GROUP BY source, nc
), u_terms AS (
  SELECT source, c1, c2,
         coalesce(sum(c2) OVER (PARTITION BY source ORDER BY nc
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum2x
  FROM cnt
), s AS (
  SELECT source, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(CAST(c1 AS HUGEINT) * (2 * cum2x + c2)) AS HUGEINT) AS u2
  FROM u_terms GROUP BY source
)
SELECT source, n1, n2, CAST(u2 AS BIGINT) AS u2,
       CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                 ELSE (u2 - CAST(n1 AS HUGEINT) * n2) * 1000000
                      // (CAST(n1 AS HUGEINT) * n2) END AS BIGINT) AS rb_micro,
       round(CAST(CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                 ELSE (u2 - CAST(n1 AS HUGEINT) * n2) * 1000000
                      // (CAST(n1 AS HUGEINT) * n2) END AS BIGINT) AS DOUBLE)
             / 1e6, 4) AS rank_biserial
FROM s
ORDER BY source
"""


def q188_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the DAILY event-count series — the
    seasonality probe (a weekly cycle shows as a lag-7 peak). The series
    is zero-filled over the full calendar (a silent gap is a real 0, not
    a skipped term — positional lag over a gapped series would compare
    Tuesday to Thursday), then each lag is an exact-integer Pearson over
    the (x_t, x_{t−k}) pairs: counts are integers, so every sum is
    exact; ρ² is the q184 quotient num²·10⁶ div (denx·deny) and ρ the
    one sanctioned sign·√ chain. Scale shape: the corpus collapses to
    ≤|days| rows in the FIRST exchange; calendar fill is a 1-row min/max
    broadcast + sequence-explode; the 7 lag joins run on the tiny daily
    table. Constant series (den=0) → NULL."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("c")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = series.select(F.col("d").alias("da"), F.col("c").alias("x"))
    b = series.select(F.col("d").alias("db"), F.col("c").alias("y"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.expr("db = date_add(da, -k)"))
    )
    s = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.expr("cast(x as decimal(19,0)) * y")).alias("sxy"),
        F.sum(F.expr("cast(x as decimal(19,0)) * x")).alias("sxx"),
        F.sum(F.expr("cast(y as decimal(19,0)) * y")).alias("syy"),
    )
    num = "(cast(n as decimal(19,0)) * sxy - cast(sx as decimal(19,0)) * sy)"
    denx = "(cast(n as decimal(19,0)) * sxx - cast(sx as decimal(19,0)) * sx)"
    deny = "(cast(n as decimal(19,0)) * syy - cast(sy as decimal(19,0)) * sy)"
    r2u = (
        f"case when {denx} = 0 or {deny} = 0 then null "
        f"else {num} * {num} * 1000000 div ({denx} * {deny}) end"
    )
    sign = f"cast(case when {num} > 0 then 1 when {num} < 0 then -1 else 0 end as int)"
    return s.select(
        F.col("k").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.expr(r2u).alias("acf2_micro"),
        F.expr(sign).alias("acf_sign"),
        F.expr(f"round({sign} * sqrt(cast({r2u} as double) / 1e6), 4)").alias("acf"),
    ).orderBy("lag")


_Q188_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM mm
), series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), lags AS (
  SELECT unnest(range(1, 8)) AS k
), pairs AS (
  SELECT CAST(lags.k AS INTEGER) AS k, a.c AS x, b.c AS y
  FROM lags
  JOIN series a ON true
  JOIN series b ON b.d = a.d - CAST(lags.k AS INTEGER)
), s AS (
  SELECT k, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs GROUP BY k
)
SELECT k AS lag, CAST(n AS BIGINT) AS n_pairs,
       CAST(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                 THEN NULL
                 ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
                      // ((n * sxx - sx * sx) * (n * syy - sy * sy)) END
            AS BIGINT) AS acf2_micro,
       CAST(CASE WHEN (n * sxy - sx * sy) > 0 THEN 1
                 WHEN (n * sxy - sx * sy) < 0 THEN -1 ELSE 0 END
            AS INTEGER) AS acf_sign,
       round(CASE WHEN (n * sxy - sx * sy) > 0 THEN 1
                  WHEN (n * sxy - sx * sy) < 0 THEN -1 ELSE 0 END
             * sqrt(CAST(CAST(CASE WHEN (n * sxx - sx * sx) = 0
                                        OR (n * syy - sy * sy) = 0
                                   THEN NULL
                                   ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy)
                                        * 1000000
                                        // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                                   END AS BIGINT) AS DOUBLE) / 1e6), 4) AS acf
FROM s
ORDER BY lag
"""


def q189_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer lifetime spend — the
    revenue-concentration number (0 = spend spread evenly, →1 = one
    whale). Exact sorted-rank identity G = (2Σᵢ i·xᵢ − (n+1)S)/(n·S)
    over integer cents: the position weight i is a row_number within the
    nation (ties contribute identically regardless of order among
    equals, so the tiebreak is cosmetic), every product stays integral,
    and the single truncating ·10⁶ quotient lands at the end. Unspent
    customers enter as real zeros — dropping them would understate
    concentration. One fact-keyed exchange for the rollup, one
    nation-keyed exchange for rank+sums (the q184 window shape); S=0
    nations → NULL. n·S outgrows BIGINT near 10¹⁸ cent-rows — DECIMAL
    cast up front is that ceiling."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("spend_c")
    )
    base = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            "n_name",
            F.col("c_custkey").alias("ck"),
            F.coalesce("spend_c", F.lit(0)).alias("x"),
        )
    )
    w = W.partitionBy("n_name").orderBy("x", "ck")
    ranked = base.select(
        "n_name", "x", F.row_number().over(w).alias("i")
    )
    s = ranked.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("cast(i as decimal(19,0)) * x")).alias("six"),
    )
    gu = (
        "case when sx = 0 then null "
        "else (2 * six - (cast(n as decimal(19,0)) + 1) * sx) * 1000000 "
        "     div (cast(n as decimal(19,0)) * sx) end"
    )
    return s.select(
        F.col("n_name").alias("nation"),
        "n",
        F.col("sx").alias("total_spend_cents"),
        F.expr(gu).alias("gini_micro"),
        F.expr(f"round(cast({gu} as double) / 1e6, 4)").alias("gini"),
    ).orderBy("nation")


_Q189_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c
  FROM orders GROUP BY o_custkey
), base AS (
  SELECT n_name, c_custkey AS ck, coalesce(spend_c, 0) AS x
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN spend ON c_custkey = o_custkey
), ranked AS (
  SELECT n_name, x,
         row_number() OVER (PARTITION BY n_name ORDER BY x, ck) AS i
  FROM base
), s AS (
  SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(i AS HUGEINT) * x) AS HUGEINT) AS six
  FROM ranked GROUP BY n_name
)
SELECT n_name AS nation,
       CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS total_spend_cents,
       CAST(CASE WHEN sx = 0 THEN NULL
                 ELSE (2 * six - (n + 1) * sx) * 1000000 // (n * sx) END
            AS BIGINT) AS gini_micro,
       round(CAST(CAST(CASE WHEN sx = 0 THEN NULL
                 ELSE (2 * six - (n + 1) * sx) * 1000000 // (n * sx) END
            AS BIGINT) AS DOUBLE) / 1e6, 4) AS gini
FROM s
ORDER BY nation
"""


def q190_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upward level-shift detection (CUSUM) on the daily event-count
    series, EXACT: the textbook recursion S_t = max(0, S_{t−1} + dev_t)
    is not a SQL window — but its closed form IS: S_t = P_t − min_{j≤t}
    P_j over the prefix sums of deviations. Deviations are mean-centered
    without division by scaling through D (days) and T (total): P'_t =
    D·prefix_t − t·T, so S'_t = P'_t − min(0, runmin(P'_j)) is an exact
    integer D·(accumulated excess). Alarm when that excess tops 10% of
    total volume — S'·10 > D·T, cross-multiplied, no float in the
    decision. The series is calendar zero-filled (a silent day is a real
    0). Scale: corpus → |days| rows in one exchange; the ordered windows
    ride the tiny daily table; D·prefix outgrows BIGINT near 10¹⁴
    events — DECIMAL note. Output: one row per day with the scaled
    excess and the alarm flag."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    tot = series.agg(
        F.count("*").alias("dd"), F.sum("x").alias("t")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    pref = series.crossJoin(F.broadcast(tot)).select(
        "d", "x", "dd", "t",
        (
            F.col("dd") * F.sum("x").over(w)
            - F.row_number().over(W.orderBy("d")) * F.col("t")
        ).alias("p"),
    )
    s = pref.select(
        "d", "x", "dd", "t",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(w))).alias("s"),
    )
    return s.select(
        "d", "x",
        F.col("s").alias("excess_scaled"),
        (F.col("s") * 10 > F.col("dd") * F.col("t")).alias("alarm"),
    ).orderBy("d")


_Q190_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM mm
), series AS (
  SELECT cal.d, coalesce(daily.x, 0) AS x
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS dd, CAST(sum(x) AS BIGINT) AS t
  FROM series
), pref AS (
  SELECT d, x, dd, t,
         dd * sum(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
           - row_number() OVER (ORDER BY d) * t AS p
  FROM series CROSS JOIN tot
), s AS (
  SELECT d, x, dd, t,
         p - least(0, min(p) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)) AS s
  FROM pref
)
SELECT d, x, CAST(s AS BIGINT) AS excess_scaled,
       s * 10 > dd * t AS alarm
FROM s
ORDER BY d
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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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


def q199_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation —
    the antitrust-style "is this nation's supply base one big vendor?"
    number, and unlike entropy it needs NO transcendental: HHI =
    Σ share_i² = Σx_i²·10⁶ div (Σx)² is an exact truncating integer
    quotient over per-supplier revenue cents. The effective supplier
    count 1/HHI is the one display division. Two exchanges: the
    supplier rollup (fact-keyed) and the nation rollup; squares cast to
    DECIMAL up front (x² outgrows BIGINT past ~10⁹·10⁹ cents²). The
    classic >2500-point (0.25) concentration flag is an integer
    compare."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("x")
        )
    )
    s = rev.groupBy("n_name").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("cast(x as decimal(19,0)) * x")).alias("sxx"),
    )
    hhi = (
        "case when sx = 0 then null "
        "else sxx * 1000000 div (cast(sx as decimal(19,0)) * sx) end"
    )
    return s.select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        F.expr(hhi).alias("hhi_micro"),
        F.expr(f"({hhi}) > 250000").alias("concentrated"),
        F.expr(f"round(1e6 / cast({hhi} as double), 2)").alias(
            "effective_suppliers"
        ),
    ).orderBy("nation")


_Q199_SQL = """
WITH rev AS (
  SELECT n_name, s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey
), s AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM rev GROUP BY n_name
)
SELECT n_name AS nation, n_suppliers,
       CAST(CASE WHEN sx = 0 THEN NULL
                 ELSE sxx * 1000000 // (sx * sx) END AS BIGINT) AS hhi_micro,
       CAST(CASE WHEN sx = 0 THEN NULL
                 ELSE sxx * 1000000 // (sx * sx) END AS BIGINT) > 250000
         AS concentrated,
       round(1e6 / CAST(CAST(CASE WHEN sx = 0 THEN NULL
                 ELSE sxx * 1000000 // (sx * sx) END AS BIGINT) AS DOUBLE), 2)
         AS effective_suppliers
FROM s
ORDER BY nation
"""


def q200_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of customer spend, DECOMPOSED: total = within-
    nation + between-nation — the additive split that says whether
    spend inequality lives inside nations or across them (Gini can't
    decompose; Theil is the index built for it). Each term is one float
    chain over exact integers — (x/S)·ln(x·N/S) for total,
    (x/S)·ln(x·N_g/S_g) for within, (S_g/S)·ln(S_g·N/(S·N_g)) for
    between — QUANTIZED to pico-units (10¹²) per row before summing
    (per-row terms are O(1/N); micro would round them all to zero),
    then reported in micro. The real-valued identity T = Tw + Tb holds
    term-by-term via ln factorization; the emitted gap_micro is the
    quantization residue — pytest pins it ≤ 1 micro. Zero-spend
    customers are excluded (ln 0); the population is spenders. Scale:
    spend rollup + one broadcast of 25 group stats + one global
    1-row aggregate; counts/cents stay < 2⁵³ through sf100 (the
    stated double-exactness ceiling)."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("x")
        )
        .filter(F.col("x") > 0)
    )
    base = spend.join(
        cust, spend.o_custkey == cust.c_custkey
    ).join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "n_name", "x"
    )
    grp = base.groupBy("n_name").agg(
        F.count("*").alias("ng"), F.sum("x").alias("sg")
    )
    glob = grp.agg(
        F.sum("ng").alias("n"), F.sum("sg").alias("s")
    )
    rows = base.join(F.broadcast(grp), "n_name").crossJoin(F.broadcast(glob))
    t_tot = (
        "cast(round((cast(x as double) / cast(s as double))"
        " * ln(cast(x as double) * cast(n as double) / cast(s as double))"
        " * 1e12) as bigint)"
    )
    t_win = (
        "cast(round((cast(x as double) / cast(s as double))"
        " * ln(cast(x as double) * cast(ng as double) / cast(sg as double))"
        " * 1e12) as bigint)"
    )
    cust_terms = rows.agg(
        F.max("n").alias("n_customers"),
        F.sum(F.expr(t_tot)).alias("tt"),
        F.sum(F.expr(t_win)).alias("tw"),
    )
    t_btw = (
        "cast(round((cast(sg as double) / cast(s as double))"
        " * ln(cast(sg as double) * cast(n as double)"
        "      / (cast(s as double) * cast(ng as double))) * 1e12) as bigint)"
    )
    btw = grp.crossJoin(F.broadcast(glob)).agg(
        F.sum(F.expr(t_btw)).alias("tb")
    )
    return cust_terms.crossJoin(F.broadcast(btw)).select(
        "n_customers",
        F.expr("tt div 1000000").alias("theil_total_micro"),
        F.expr("tw div 1000000").alias("theil_within_micro"),
        F.expr("tb div 1000000").alias("theil_between_micro"),
        F.expr("abs(tt - tw - tb) div 1000000").alias("gap_micro"),
    )


_Q200_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
  HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT)) > 0
), base AS (
  SELECT n_name, x
  FROM spend
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
), grp AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS ng, CAST(sum(x) AS BIGINT) AS sg
  FROM base GROUP BY n_name
), gtot AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s FROM grp
), cust_terms AS (
  SELECT max(n) AS n_customers,
         CAST(sum(CAST(round((CAST(x AS DOUBLE) / CAST(s AS DOUBLE))
              * ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
              * 1e12) AS BIGINT)) AS BIGINT) AS tt,
         CAST(sum(CAST(round((CAST(x AS DOUBLE) / CAST(s AS DOUBLE))
              * ln(CAST(x AS DOUBLE) * CAST(ng AS DOUBLE) / CAST(sg AS DOUBLE))
              * 1e12) AS BIGINT)) AS BIGINT) AS tw
  FROM base JOIN grp USING (n_name) CROSS JOIN gtot
), btw AS (
  SELECT CAST(sum(CAST(round((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
              * ln(CAST(sg AS DOUBLE) * CAST(n AS DOUBLE)
                   / (CAST(s AS DOUBLE) * CAST(ng AS DOUBLE)))
              * 1e12) AS BIGINT)) AS BIGINT) AS tb
  FROM grp CROSS JOIN gtot
)
SELECT n_customers,
       tt // 1000000 AS theil_total_micro,
       tw // 1000000 AS theil_within_micro,
       tb // 1000000 AS theil_between_micro,
       abs(tt - tw - tb) // 1000000 AS gap_micro
FROM cust_terms CROSS JOIN btw
"""


def q201_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between customer balance and lifetime spend,
    computed EXACTLY on the 10×10 equi-width quantized grid — the
    rank-free formulation: once values are bucketed, concordant /
    discordant / tied pair counts are plain integer arithmetic over the
    100-cell joint histogram (C = Σ n_ij·n_i'j' over i'>i, j'>j via a
    100×100 cell self-join — constant work regardless of corpus size),
    so there is NO global sort anywhere: the q68 broadcast-min/max grid
    replaces ntile's single-partition window. Tau-b handles the
    quantization ties by construction: τ² = (C−D)²·10⁶ div
    ((T₀−T₁)(T₀−T₂)) is the q184 exact-quotient pattern, τ the
    sanctioned sign·√ chain. Pair counts stay doubled-free (each
    unordered pair counted once by the i'>i join). DECIMAL ceiling:
    (C−D)² ≤ (n²/2)² needs DECIMAL(38) past ~10⁹ customers — cast up
    front."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("sp")
    )
    base = cust.join(spend, cust.c_custkey == spend.o_custkey, "left").select(
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("xc"),
        F.coalesce("sp", F.lit(0)).alias("yc"),
    )
    mm = base.agg(
        F.min("xc").alias("lx"), F.max("xc").alias("hx"),
        F.min("yc").alias("ly"), F.max("yc").alias("hy"),
    )
    binned = base.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("hx") == F.col("lx"), F.lit(0))
        .otherwise(F.least(F.lit(9), F.expr("(xc - lx) * 10 div (hx - lx)")))
        .cast("int").alias("bx"),
        F.when(F.col("hy") == F.col("ly"), F.lit(0))
        .otherwise(F.least(F.lit(9), F.expr("(yc - ly) * 10 div (hy - ly)")))
        .cast("int").alias("by"),
    )
    grid = binned.groupBy("bx", "by").agg(F.count("*").alias("c"))
    g2 = grid.select(
        F.col("bx").alias("bx2"), F.col("by").alias("by2"),
        F.col("c").alias("c2"),
    )
    conc = (
        grid.join(
            F.broadcast(g2),
            (F.col("bx2") > F.col("bx")) & (F.col("by2") > F.col("by")),
        )
        .agg(F.sum(F.expr("cast(c as decimal(19,0)) * c2")).alias("v"))
        .select(F.coalesce("v", F.lit(0).cast("decimal(19,0)")).alias("cc"))
    )
    disc = (
        grid.join(
            F.broadcast(g2),
            (F.col("bx2") > F.col("bx")) & (F.col("by2") < F.col("by")),
        )
        .agg(F.sum(F.expr("cast(c as decimal(19,0)) * c2")).alias("v"))
        .select(F.coalesce("v", F.lit(0).cast("decimal(19,0)")).alias("dd"))
    )
    margins = grid.agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("cast(c as decimal(19,0)) * (c - 1)")).alias("txy2"),
    )
    tx = (
        grid.groupBy("bx").agg(F.sum("c").alias("m"))
        .agg(F.sum(F.expr("cast(m as decimal(19,0)) * (m - 1)")).alias("tx2"))
    )
    ty = (
        grid.groupBy("by").agg(F.sum("c").alias("m"))
        .agg(F.sum(F.expr("cast(m as decimal(19,0)) * (m - 1)")).alias("ty2"))
    )
    s = (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(margins))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    # doubled pair counts: 2T0 = n(n-1), 2T1 = Σ m(m-1) — ratios cancel
    den = (
        "((cast(n as decimal(19,0)) * (n - 1) - tx2)"
        " * (cast(n as decimal(19,0)) * (n - 1) - ty2))"
    )
    num = "(cc - dd)"
    tau2u = (
        f"case when {den} = 0 then null "
        f"else {num} * {num} * 4 * 1000000 div {den} end"
    )
    sign = f"cast(case when {num} > 0 then 1 when {num} < 0 then -1 else 0 end as int)"
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("cc").cast("long").alias("concordant"),
        F.col("dd").cast("long").alias("discordant"),
        F.expr(tau2u).alias("tau2_micro"),
        F.expr(sign).alias("tau_sign"),
        F.expr(f"round({sign} * sqrt(cast({tau2u} as double) / 1e6), 4)").alias("tau"),
    )


_Q201_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sp
  FROM orders GROUP BY o_custkey
), base AS (
  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS xc,
         coalesce(sp, 0) AS yc
  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
), mm AS (
  SELECT min(xc) AS lx, max(xc) AS hx, min(yc) AS ly, max(yc) AS hy FROM base
), binned AS (
  SELECT CAST(CASE WHEN hx = lx THEN 0
              ELSE least(9, (xc - lx) * 10 // (hx - lx)) END AS INTEGER) AS bx,
         CAST(CASE WHEN hy = ly THEN 0
              ELSE least(9, (yc - ly) * 10 // (hy - ly)) END AS INTEGER) AS by
  FROM base CROSS JOIN mm
), grid AS (
  SELECT bx, by, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY bx, by
), conc AS (
  SELECT coalesce(CAST(sum(CAST(g1.c AS HUGEINT) * g2.c) AS HUGEINT),
                  0::HUGEINT) AS cc
  FROM grid g1 JOIN grid g2 ON g2.bx > g1.bx AND g2.by > g1.by
), disc AS (
  SELECT coalesce(CAST(sum(CAST(g1.c AS HUGEINT) * g2.c) AS HUGEINT),
                  0::HUGEINT) AS dd
  FROM grid g1 JOIN grid g2 ON g2.bx > g1.bx AND g2.by < g1.by
), margins AS (
  SELECT CAST(sum(c) AS HUGEINT) AS n FROM grid
), tx AS (
  SELECT CAST(sum(CAST(m AS HUGEINT) * (m - 1)) AS HUGEINT) AS tx2
  FROM (SELECT bx, sum(c) AS m FROM grid GROUP BY bx)
), ty AS (
  SELECT CAST(sum(CAST(m AS HUGEINT) * (m - 1)) AS HUGEINT) AS ty2
  FROM (SELECT by, sum(c) AS m FROM grid GROUP BY by)
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(cc AS BIGINT) AS concordant,
       CAST(dd AS BIGINT) AS discordant,
       CAST(CASE WHEN ((n * (n - 1) - tx2) * (n * (n - 1) - ty2)) = 0 THEN NULL
                 ELSE (cc - dd) * (cc - dd) * 4 * 1000000
                      // ((n * (n - 1) - tx2) * (n * (n - 1) - ty2)) END
            AS BIGINT) AS tau2_micro,
       CAST(CASE WHEN cc > dd THEN 1 WHEN cc < dd THEN -1 ELSE 0 END
            AS INTEGER) AS tau_sign,
       round(CASE WHEN cc > dd THEN 1 WHEN cc < dd THEN -1 ELSE 0 END
             * sqrt(CAST(CAST(
                 CASE WHEN ((n * (n - 1) - tx2) * (n * (n - 1) - ty2)) = 0
                      THEN NULL
                      ELSE (cc - dd) * (cc - dd) * 4 * 1000000
                           // ((n * (n - 1) - tx2) * (n * (n - 1) - ty2)) END
                 AS BIGINT) AS DOUBLE) / 1e6), 4) AS tau
FROM conc
CROSS JOIN disc CROSS JOIN margins CROSS JOIN tx CROSS JOIN ty
"""


def q203_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of DAILY counts per event
    type — the burstiness dial: a Poisson-arrival stream sits at 1,
    bursty traffic (bot storms, batch replays) far above, metronomic
    traffic below. Fully rational, zero transcendental: with D days and
    S = Σx, F = var/mean = (D·Σx² − S²)·? — emitted as the truncating
    quotient (D·Σx² − S²)·10³ div (D·S) (population variance over the
    calendar-zero-filled series; a silent day is a real 0 and LOWERS
    the mean while RAISING the variance — dropping gaps would
    understate burstiness). One corpus exchange to (type, day) counts,
    a broadcast calendar fill, a |types|-row output. Over-dispersion
    flag F > 2 is an integer cross-multiplied compare."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("x"))
    mm = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    types = daily.select("event_type").distinct()
    series = (
        types.crossJoin(F.broadcast(cal))
        .join(daily, ["event_type", "d"], "left")
        .select("event_type", "d", F.coalesce("x", F.lit(0)).alias("x"))
    )
    s = series.groupBy("event_type").agg(
        F.count("*").alias("dd"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("cast(x as decimal(19,0)) * x")).alias("sxx"),
    )
    fano = (
        "case when sx = 0 then null "
        "else (cast(dd as decimal(19,0)) * sxx"
        "      - cast(sx as decimal(19,0)) * sx) * 1000 "
        "     div (cast(dd as decimal(19,0)) * sx) end"
    )
    return s.select(
        "event_type",
        F.col("dd").alias("n_days"),
        F.col("sx").alias("n_events"),
        F.expr(fano).alias("fano_milli"),
        F.expr(
            "(cast(dd as decimal(19,0)) * sxx - cast(sx as decimal(19,0)) * sx)"
            " > 2 * cast(dd as decimal(19,0)) * sx"
        ).alias("overdispersed"),
    ).orderBy("event_type")


_Q203_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), mm AS (
  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events
), cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM mm
), types AS (
  SELECT DISTINCT event_type FROM daily
), series AS (
  SELECT types.event_type, cal.d, coalesce(daily.x, 0) AS x
  FROM types CROSS JOIN cal
  LEFT JOIN daily ON daily.event_type = types.event_type AND daily.d = cal.d
), s AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS dd,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM series GROUP BY event_type
)
SELECT event_type,
       CAST(dd AS BIGINT) AS n_days,
       CAST(sx AS BIGINT) AS n_events,
       CAST(CASE WHEN sx = 0 THEN NULL
                 ELSE (dd * sxx - sx * sx) * 1000 // (dd * sx) END
            AS BIGINT) AS fano_milli,
       (dd * sxx - sx * sx) > 2 * dd * sx AS overdispersed
FROM s
ORDER BY event_type
"""


def q204_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on PAIRED classifier errors — do the q185
    length-gate and token-gate disagree with the labeling (lang='en')
    at different rates? Only the discordant pairs carry signal: b =
    length-gate right & token-gate wrong, c = the reverse, χ² =
    (b−c)²/(b+c) — an exact truncating ·10³ quotient (the
    continuity-corrected (|b−c|−1)²/(b+c) is emitted alongside, same
    arithmetic; the uncorrected form is the stated statistic). All four
    paired-outcome cells come from ONE fused scan — no per-classifier
    re-pass. b+c = 0 (the gates never disagree on correctness) → NULL.
    DECIMAL ceiling at b,c ~ 3·10⁹ as usual."""
    docs = _t(spark, sf_dir, "documents")
    flags = docs.select(
        (F.col("n_chars").between(200, 5000)).alias("a"),
        (F.size(F.split(F.col("text"), " ")) >= 40).alias("bg"),
        (F.col("lang") == "en").alias("t"),
    )
    s = flags.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("cast((a = t) and (bg <> t) as long)")).alias("b"),
        F.sum(F.expr("cast((a <> t) and (bg = t) as long)")).alias("c"),
    )
    stat = (
        "case when b + c = 0 then null "
        "else (cast(b as decimal(19,0)) - c) * (cast(b as decimal(19,0)) - c)"
        " * 1000 div (cast(b as decimal(19,0)) + c) end"
    )
    corr = (
        "case when b + c = 0 then null "
        "else (abs(cast(b as decimal(19,0)) - c) - 1)"
        " * (abs(cast(b as decimal(19,0)) - c) - 1)"
        " * 1000 div (cast(b as decimal(19,0)) + c) end"
    )
    return s.select(
        "n", "b", "c",
        F.expr(stat).alias("mcnemar_milli"),
        F.expr(corr).alias("mcnemar_corrected_milli"),
    )


_Q204_SQL = """
WITH flags AS (
  SELECT (n_chars BETWEEN 200 AND 5000) AS a,
         (len(string_split(text, ' ')) >= 40) AS bg,
         (lang = 'en') AS t
  FROM documents
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST((a = t) AND (bg <> t) AS BIGINT)) AS BIGINT) AS b,
         CAST(sum(CAST((a <> t) AND (bg = t) AS BIGINT)) AS BIGINT) AS c
  FROM flags
)
SELECT n, b, c,
       CAST(CASE WHEN b + c = 0 THEN NULL
                 ELSE (CAST(b AS HUGEINT) - c) * (CAST(b AS HUGEINT) - c)
                      * 1000 // (CAST(b AS HUGEINT) + c) END
            AS BIGINT) AS mcnemar_milli,
       CAST(CASE WHEN b + c = 0 THEN NULL
                 ELSE (abs(CAST(b AS HUGEINT) - c) - 1)
                      * (abs(CAST(b AS HUGEINT) - c) - 1)
                      * 1000 // (CAST(b AS HUGEINT) + c) END
            AS BIGINT) AS mcnemar_corrected_milli
FROM s
"""


def q205_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily event series' up/down
    moves — is traffic direction random, trending (few long runs), or
    oscillating (many short runs)? Day-over-day moves on the calendar
    zero-filled series, ties dropped (the standard reduction), runs
    counted by a lag window over the FILTERED move sequence. The z²
    statistic is made fully rational by clearing denominators:
    z² = ((R−1)·n − 2n₁n₂)²·(n−1) / (2n₁n₂·(2n₁n₂ − n)) — every factor
    an exact integer, emitted as a truncating ·10³ quotient with the
    direction sign from R·n vs 2n₁n₂+n (too many runs = oscillation,
    too few = trending). Degenerate (n<2 or 2n₁n₂≤n) → NULL. The
    ordered windows ride the |days| table only."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    wd = W.orderBy("d")
    moves = (
        series.select(
            "d", (F.col("x") - F.lag("x").over(wd)).alias("diff")
        )
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .select("d", F.signum("diff").cast("int").alias("s"))
    )
    runs = moves.select(
        "s",
        (F.col("s") != F.coalesce(F.lag("s").over(wd), F.col("s")))
        .cast("long")
        .alias("chg"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.expr("cast(s = 1 as long)")).alias("n_up"),
        F.sum(F.expr("cast(s = -1 as long)")).alias("n_down"),
        (F.sum("chg") + 1).alias("r"),
    )
    p = "(2 * cast(n_up as decimal(19,0)) * n_down)"
    num = f"((r - 1) * cast(n as decimal(19,0)) - {p})"
    den = f"({p} * ({p} - n))"
    z2 = (
        f"case when n < 2 or {p} <= n then null "
        f"else {num} * {num} * (n - 1) * 1000 div {den} end"
    )
    sign = (
        f"cast(case when r * cast(n as decimal(19,0)) > {p} + n then 1 "
        f"when r * cast(n as decimal(19,0)) < {p} + n then -1 else 0 end as int)"
    )
    return runs.select(
        F.col("n").alias("n_moves"), "n_up", "n_down",
        F.col("r").alias("runs"),
        F.expr(z2).alias("z2_milli"),
        F.expr(sign).alias("direction"),
        F.expr(
            f"round({sign} * sqrt(cast({z2} as double) / 1e3), 4)"
        ).alias("z"),
    )


_Q205_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM mm
), series AS (
  SELECT cal.d, coalesce(daily.x, 0) AS x
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), moves AS (
  SELECT d, CAST(sign(diff) AS INTEGER) AS s
  FROM (SELECT d, x - lag(x) OVER (ORDER BY d) AS diff FROM series)
  WHERE diff IS NOT NULL AND diff <> 0
), runs AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(s = 1 AS BIGINT)) AS HUGEINT) AS n_up,
         CAST(sum(CAST(s = -1 AS BIGINT)) AS HUGEINT) AS n_down,
         CAST(sum(CAST(s <> coalesce(prev, s) AS BIGINT)) + 1 AS HUGEINT) AS r
  FROM (SELECT s, lag(s) OVER (ORDER BY d) AS prev FROM moves)
)
SELECT CAST(n AS BIGINT) AS n_moves,
       CAST(n_up AS BIGINT) AS n_up, CAST(n_down AS BIGINT) AS n_down,
       CAST(r AS BIGINT) AS runs,
       CAST(CASE WHEN n < 2 OR 2 * n_up * n_down <= n THEN NULL
                 ELSE ((r - 1) * n - 2 * n_up * n_down)
                      * ((r - 1) * n - 2 * n_up * n_down) * (n - 1) * 1000
                      // (2 * n_up * n_down * (2 * n_up * n_down - n)) END
            AS BIGINT) AS z2_milli,
       CAST(CASE WHEN r * n > 2 * n_up * n_down + n THEN 1
                 WHEN r * n < 2 * n_up * n_down + n THEN -1 ELSE 0 END
            AS INTEGER) AS direction,
       round(CASE WHEN r * n > 2 * n_up * n_down + n THEN 1
                  WHEN r * n < 2 * n_up * n_down + n THEN -1 ELSE 0 END
             * sqrt(CAST(CAST(
                 CASE WHEN n < 2 OR 2 * n_up * n_down <= n THEN NULL
                      ELSE ((r - 1) * n - 2 * n_up * n_down)
                           * ((r - 1) * n - 2 * n_up * n_down) * (n - 1) * 1000
                           // (2 * n_up * n_down * (2 * n_up * n_down - n)) END
                 AS BIGINT) AS DOUBLE) / 1e3), 4) AS z
FROM runs
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
    from ..sources.files import register_views

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
    from ..sources.files import register_views

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


# Shared sessionization -> midnight-split segment chain (microsecond
# integers, rule 11). Single source of truth for q210 (peak via sweep)
# and q231 (time-averaged via busy-time integral) on BOTH engines — a
# gap/tail/day-width change cannot silently decouple the two queries.
_SESSION_SEG_SPARK = """        WITH e AS (
          SELECT user_id, unix_micros(ts) AS es FROM events
        ),
        ord AS (
          SELECT user_id, es,
                 CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es)
                        IS NULL
                      OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es)
                        > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM e
        ),
        sess AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY es
                                     ROWS UNBOUNDED PRECEDING) AS sid,
                 es
          FROM ord
        ),
        bounds AS (
          SELECT user_id, sid, min(es) AS s, max(es) + 60000000 AS f
          FROM sess GROUP BY user_id, sid
        ),
        seg AS (
          SELECT d AS epoch_day,
                 greatest(s, d * 86400000000) AS seg_start,
                 least(f, (d + 1) * 86400000000) AS seg_end
          FROM bounds
          LATERAL VIEW explode(sequence(s div 86400000000, (f - 1) div 86400000000)) AS d
        )"""

_SESSION_SEG_DUCK = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS es FROM events
),
ord AS (
  SELECT user_id, es,
         CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)
),
sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY es
                             ROWS UNBOUNDED PRECEDING) AS sid,
         es
  FROM ord
),
bounds AS (
  SELECT user_id, sid, min(es) AS s, max(es) + 60000000 AS f
  FROM sess GROUP BY user_id, sid
),
seg AS (
  SELECT d.d AS epoch_day,
         greatest(s, d.d * 86400000000) AS seg_start,
         least(f, (d.d + 1) * 86400000000) AS seg_end
  FROM bounds, UNNEST(generate_series(s // 86400000000, (f - 1) // 86400000000)) AS d(d)
)"""


def q210_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by a DISTRIBUTED sweep-line:
    sessionize per user (30-min gap, 60-s tail so single-event sessions
    have positive length), split each session interval at UTC midnight
    into per-day segments, emit +1/-1 boundary deltas, and running-sum
    them inside a window PARTITIONED BY day — the sweep is per-day
    local, so no global single-partition sort exists anywhere (the
    classic scale failure of naive interval sweeps). All arithmetic is
    integer epoch-MICROseconds (rule 11: Spark floors seconds, DuckDB
    rounds them — micros are exact); ties order -1 before +1 so touching
    intervals never count as concurrent and the per-group max is
    order-deterministic in both engines."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _SESSION_SEG_SPARK
        + """,
        deltas AS (
          SELECT epoch_day, seg_start AS t, 1 AS delta FROM seg
          UNION ALL
          SELECT epoch_day, seg_end AS t, -1 AS delta FROM seg
        ),
        sweep AS (
          SELECT epoch_day,
                 sum(delta) OVER (PARTITION BY epoch_day ORDER BY t, delta
                                  ROWS UNBOUNDED PRECEDING) AS run
          FROM deltas
        )
        SELECT epoch_day, CAST(max(run) AS BIGINT) AS peak_concurrency,
               count(*) DIV 2 AS n_segments
        FROM sweep GROUP BY epoch_day
        ORDER BY epoch_day
        """
    )


_Q210_SQL = _SESSION_SEG_DUCK + """,
deltas AS (
  SELECT epoch_day, seg_start AS t, 1 AS delta FROM seg
  UNION ALL
  SELECT epoch_day, seg_end AS t, -1 AS delta FROM seg
),
sweep AS (
  SELECT epoch_day,
         sum(delta) OVER (PARTITION BY epoch_day ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM deltas
)
SELECT epoch_day, CAST(max(run) AS BIGINT) AS peak_concurrency,
       CAST(count(*) // 2 AS BIGINT) AS n_segments
FROM sweep GROUP BY epoch_day
ORDER BY epoch_day
"""


def q214_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier (cheapest-and-largest parts): every
    part not dominated in (price low, size high). The classic serial
    solution sorts globally and runs one cumulative max — a
    single-partition scale killer. This plan is the DISTRIBUTED
    two-phase prefix-max: collapse to per-price groups, range-bucket
    prices on the broadcast [min,max] grid, take the running max
    WITHIN each bucket (keyed window), reduce each bucket to one max
    (|buckets| rows), prefix-max those 32 rows, and combine — the only
    unkeyed window runs over 32 rows. Frontier membership is the
    integer compare pmax > max(strictly-cheaper maxes); dominated-by-
    equal-price is handled by the per-price group max. Validated
    against naive O(n^2) dominance in the pytest."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["part"])
    return spark.sql(_Q214_SQL)


_Q214_SQL = """
WITH mm AS (
  SELECT min(p_retailprice) AS lo, max(p_retailprice) AS hi FROM part
), pg AS (
  SELECT p_retailprice AS price, max(p_size) AS pmax
  FROM part GROUP BY p_retailprice
), bucketed AS (
  SELECT price, pmax,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(31, CAST(floor((price - lo) * 32 / (hi - lo))
                               AS INTEGER)) END AS INTEGER) AS bkt
  FROM pg CROSS JOIN mm
), loc AS (
  SELECT price, pmax, bkt,
         max(pmax) OVER (PARTITION BY bkt ORDER BY price
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS local_before
  FROM bucketed
), bmax AS (
  SELECT bkt, max(pmax) AS bm FROM bucketed GROUP BY bkt
), bpre AS (
  SELECT bkt, max(bm) OVER (ORDER BY bkt
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_max
  FROM bmax
), frontier AS (
  SELECT price, pmax
  FROM loc JOIN bpre ON loc.bkt = bpre.bkt
  WHERE pmax > greatest(coalesce(local_before, -1), coalesce(prior_max, -1))
)
SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
FROM part JOIN frontier
  ON part.p_retailprice = frontier.price AND part.p_size = frontier.pmax
ORDER BY p_retailprice, p_partkey
"""


def q215_lead_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase DAILY
    series: Pearson r at every lag in [-7, +7] — does click volume
    LEAD purchase volume, and by how many days? All six sufficient
    statistics (n, Sx, Sy, Sxx, Syy, Sxy) are exact INTEGER sums over
    the calendar-zero-filled series (q203 discipline), grouped by lag;
    the r float chain (one sqrt — the accepted libm seam, like ln in
    q111/q192) runs once per lag over those integers and rounds to
    milli. Degenerate variance => NULL, each factor checked separately
    in integers (no product overflow). Scale: one grouped count over
    events, then everything is |days| x 15 rows — the lag fan-out
    happens AFTER aggregation, never on raw events."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH days AS (
          SELECT min(unix_micros(ts) div 86400000000) AS d0,
                 max(unix_micros(ts) div 86400000000) AS d1
          FROM events
        ),
        cal AS (
          SELECT explode(sequence(d0, d1)) AS day FROM days
        ),
        cnts AS (
          SELECT unix_micros(ts) div 86400000000 AS day, event_type,
                 count(*) AS c
          FROM events WHERE event_type IN ('click', 'purchase')
          GROUP BY 1, 2
        ),
        x AS (
          SELECT cal.day, coalesce(c, 0) AS v FROM cal
          LEFT JOIN cnts ON cnts.day = cal.day AND event_type = 'click'
        ),
        y AS (
          SELECT cal.day, coalesce(c, 0) AS v FROM cal
          LEFT JOIN cnts ON cnts.day = cal.day AND event_type = 'purchase'
        ),
        lags AS (
          SELECT explode(sequence(-7, 7)) AS lag
        ),
        joined AS (
          SELECT lag, x.v AS xv, y.v AS yv
          FROM lags CROSS JOIN x JOIN y ON y.day = x.day + lags.lag
        ),
        agg AS (
          SELECT lag, count(*) AS n,
                 sum(xv) AS sx, sum(yv) AS sy,
                 sum(cast(xv as decimal(38,0)) * xv) AS sxx,
                 sum(cast(yv as decimal(38,0)) * yv) AS syy,
                 sum(cast(xv as decimal(38,0)) * yv) AS sxy
          FROM joined GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n,
               CASE WHEN cast(n as double) * cast(sxx as double)
                         - cast(sx as double) * cast(sx as double) <= 0
                      OR cast(n as double) * cast(syy as double)
                         - cast(sy as double) * cast(sy as double) <= 0
                    THEN NULL
                    ELSE CAST(round((cast(n as double) * cast(sxy as double)
                         - cast(sx as double) * cast(sy as double))
                         / sqrt((cast(n as double) * cast(sxx as double)
                                 - cast(sx as double) * cast(sx as double))
                                * (cast(n as double) * cast(syy as double)
                                   - cast(sy as double) * cast(sy as double)))
                         * 1000) AS BIGINT) END AS r_milli
        FROM agg ORDER BY lag
        """
    )


_Q215_SQL = """
WITH days AS (
  SELECT min(epoch_us(ts) // 86400000000) AS d0,
         max(epoch_us(ts) // 86400000000) AS d1
  FROM events
), cal AS (
  SELECT u.d AS day FROM days, UNNEST(generate_series(d0, d1)) AS u(d)
), cnts AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
), x AS (
  SELECT cal.day, coalesce(c, 0) AS v FROM cal
  LEFT JOIN cnts ON cnts.day = cal.day AND event_type = 'click'
), y AS (
  SELECT cal.day, coalesce(c, 0) AS v FROM cal
  LEFT JOIN cnts ON cnts.day = cal.day AND event_type = 'purchase'
), lags AS (
  SELECT u.l AS lag FROM UNNEST(generate_series(-7, 7)) AS u(l)
), joined AS (
  SELECT lag, x.v AS xv, y.v AS yv
  FROM lags CROSS JOIN x JOIN y ON y.day = x.day + lags.lag
), agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         sum(xv * xv) AS sxx, sum(yv * yv) AS syy, sum(xv * yv) AS sxy
  FROM joined GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
              OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
            THEN NULL
            ELSE CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1000) AS BIGINT) END AS r_milli
FROM agg ORDER BY lag
"""


def q217_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonal indices per event type —
    the classical-decomposition seasonal factor (index 1.0 = that
    weekday runs at the daily average). Day-of-week comes from PURE
    INTEGER epoch arithmetic ((epoch_day + 3) %% 7, Monday = 0) so
    both engines bucket identically with no timezone/locale seam;
    counts are zero-filled over the full type x calendar grid (q203
    discipline) so sparse weekdays read 0 rather than vanishing; the
    index is one float chain over four exact integers, micro-
    quantized. Scale: one grouped count over events, then everything
    is |types| x 7 rows; the calendar fan-out is post-aggregation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH days AS (
          SELECT min(unix_micros(ts) div 86400000000) AS d0,
                 max(unix_micros(ts) div 86400000000) AS d1
          FROM events
        ),
        cal AS (
          SELECT explode(sequence(d0, d1)) AS day FROM days
        ),
        types AS (
          SELECT DISTINCT event_type FROM events
        ),
        grid AS (
          SELECT event_type, day FROM types CROSS JOIN cal
        ),
        cnts AS (
          SELECT event_type AS et, unix_micros(ts) div 86400000000 AS day,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        filled AS (
          SELECT grid.event_type, grid.day, coalesce(c, 0) AS c,
                 (grid.day + 3) % 7 AS dow
          FROM grid LEFT JOIN cnts
            ON cnts.et = grid.event_type AND cnts.day = grid.day
        ),
        dowagg AS (
          SELECT event_type, dow, count(*) AS n_days, sum(c) AS sum_c
          FROM filled GROUP BY event_type, dow
        ),
        tot AS (
          SELECT event_type AS et, sum(sum_c) AS total,
                 sum(n_days) AS total_days
          FROM dowagg GROUP BY event_type
        )
        SELECT event_type, dow, n_days, sum_c,
               CASE WHEN total = 0 THEN NULL ELSE
                 CAST(round((CAST(sum_c AS DOUBLE) / CAST(n_days AS DOUBLE))
                      / (CAST(total AS DOUBLE) / CAST(total_days AS DOUBLE))
                      * 1e6) AS BIGINT) END AS index_micro
        FROM dowagg JOIN tot ON dowagg.event_type = tot.et
        ORDER BY event_type, dow
        """
    )


_Q217_SQL = """
WITH days AS (
  SELECT min(epoch_us(ts) // 86400000000) AS d0,
         max(epoch_us(ts) // 86400000000) AS d1
  FROM events
), cal AS (
  SELECT u.d AS day FROM days, UNNEST(generate_series(d0, d1)) AS u(d)
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT event_type, day FROM types CROSS JOIN cal
), cnts AS (
  SELECT event_type AS et, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), filled AS (
  SELECT grid.event_type, grid.day, coalesce(c, 0) AS c,
         (grid.day + 3) % 7 AS dow
  FROM grid LEFT JOIN cnts
    ON cnts.et = grid.event_type AND cnts.day = grid.day
), dowagg AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(c) AS BIGINT) AS sum_c
  FROM filled GROUP BY event_type, dow
), tot AS (
  SELECT event_type AS et, CAST(sum(sum_c) AS BIGINT) AS total,
         CAST(sum(n_days) AS BIGINT) AS total_days
  FROM dowagg GROUP BY event_type
)
SELECT event_type, dow, n_days, sum_c,
       CASE WHEN total = 0 THEN NULL ELSE
         CAST(round((CAST(sum_c AS DOUBLE) / CAST(n_days AS DOUBLE))
              / (CAST(total AS DOUBLE) / CAST(total_days AS DOUBLE)) * 1e6)
           AS BIGINT) END AS index_micro
FROM dowagg JOIN tot ON dowagg.event_type = tot.et
ORDER BY event_type, dow
"""


def q218_kcore_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=110, near this graph's density
    threshold so the peel is non-trivial) of the co-purchase graph:
    parts are vertices, an edge joins parts bought in the same order
    (baskets capped at 100, the q111 discipline; join-free nested-
    transform pair expansion). Output is the 8-round PEEL TRAJECTORY
    (round, n_vertices, n_edges) — two equal consecutive rows prove
    the fixed point (the k-core) was reached inside the budget. Every
    per-round shuffle is vertex-keyed; localCheckpoint truncates the
    lineage each round (operators/graph.kcore_peel). The oracle is
    the same peel UNROLLED as 8 materialized CTE rounds."""
    from ..operators.graph import copurchase_edges, kcore_peel

    li = _t(spark, sf_dir, "lineitem")
    return kcore_peel(copurchase_edges(li, max_basket=100), k=110, rounds=8)


_Q218_SQL = """
WITH b AS MATERIALIZED (
  SELECT l_orderkey AS o, l_partkey AS p
  FROM lineitem GROUP BY 1, 2
), sized AS MATERIALIZED (
  SELECT o, p, count(*) OVER (PARTITION BY o) AS bs FROM b
), kept AS MATERIALIZED (
  SELECT o, p FROM sized WHERE bs <= 100
), e0 AS MATERIALIZED (
  SELECT DISTINCT x.p AS a, y.p AS bb
  FROM kept x JOIN kept y ON x.o = y.o AND x.p < y.p
),
v1 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e0 UNION ALL SELECT bb FROM e0
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e1 AS MATERIALIZED (
  SELECT a, bb FROM e0
  WHERE a IN (SELECT v FROM v1) AND bb IN (SELECT v FROM v1)
),
v2 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e1 UNION ALL SELECT bb FROM e1
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e2 AS MATERIALIZED (
  SELECT a, bb FROM e1
  WHERE a IN (SELECT v FROM v2) AND bb IN (SELECT v FROM v2)
),
v3 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e2 UNION ALL SELECT bb FROM e2
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e3 AS MATERIALIZED (
  SELECT a, bb FROM e2
  WHERE a IN (SELECT v FROM v3) AND bb IN (SELECT v FROM v3)
),
v4 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e3 UNION ALL SELECT bb FROM e3
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e4 AS MATERIALIZED (
  SELECT a, bb FROM e3
  WHERE a IN (SELECT v FROM v4) AND bb IN (SELECT v FROM v4)
),
v5 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e4 UNION ALL SELECT bb FROM e4
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e5 AS MATERIALIZED (
  SELECT a, bb FROM e4
  WHERE a IN (SELECT v FROM v5) AND bb IN (SELECT v FROM v5)
),
v6 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e5 UNION ALL SELECT bb FROM e5
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e6 AS MATERIALIZED (
  SELECT a, bb FROM e5
  WHERE a IN (SELECT v FROM v6) AND bb IN (SELECT v FROM v6)
),
v7 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e6 UNION ALL SELECT bb FROM e6
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e7 AS MATERIALIZED (
  SELECT a, bb FROM e6
  WHERE a IN (SELECT v FROM v7) AND bb IN (SELECT v FROM v7)
),
v8 AS MATERIALIZED (
  SELECT a AS v FROM (
    SELECT a FROM e7 UNION ALL SELECT bb FROM e7
  ) t(a) GROUP BY a HAVING count(*) >= 110
),
e8 AS MATERIALIZED (
  SELECT a, bb FROM e7
  WHERE a IN (SELECT v FROM v8) AND bb IN (SELECT v FROM v8)
)
SELECT * FROM (
SELECT CAST(0 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e0 UNION SELECT bb FROM e0) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges
UNION ALL
SELECT CAST(1 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e1 UNION SELECT bb FROM e1) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
UNION ALL
SELECT CAST(2 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e2 UNION SELECT bb FROM e2) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e2) AS n_edges
UNION ALL
SELECT CAST(3 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e3 UNION SELECT bb FROM e3) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e3) AS n_edges
UNION ALL
SELECT CAST(4 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e4 UNION SELECT bb FROM e4) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e4) AS n_edges
UNION ALL
SELECT CAST(5 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e5 UNION SELECT bb FROM e5) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e5) AS n_edges
UNION ALL
SELECT CAST(6 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e6 UNION SELECT bb FROM e6) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e6) AS n_edges
UNION ALL
SELECT CAST(7 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e7 UNION SELECT bb FROM e7) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e7) AS n_edges
UNION ALL
SELECT CAST(8 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT v) AS BIGINT)
   FROM (SELECT a AS v FROM e8 UNION SELECT bb FROM e8) u) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM e8) AS n_edges
) ORDER BY round"""


def q219_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT (sequential probability ratio test) on the daily
    user-conversion rate: H0 p=0.2 vs H1 p=0.3, alpha=beta=0.05 — the
    canonical always-valid sequential A/B monitor. A trial is a
    user-day with at least one click; success = same user-day also
    purchased (a proper Bernoulli, built by one grouped max-flag scan).
    Per-day LLR terms use ln(1.5)/ln(0.875) — EXACTLY representable
    double arguments, dodging the decimal-literal division seam — and
    are micro-quantized before the cumulative sum, so the running LLR
    is an exact BIGINT prefix and the +/-ln(19) decision boundaries
    compare integers. The only unkeyed window runs over |days|
    post-aggregation rows (q215 argument)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH ud AS (
          SELECT user_id, unix_micros(ts) div 86400000000 AS day,
                 max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS has_click,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_buy
          FROM events GROUP BY 1, 2
        ),
        daily AS (
          SELECT day, count(*) AS n_trials, sum(has_buy) AS k_success
          FROM ud WHERE has_click = 1 GROUP BY day
        ),
        terms AS (
          SELECT day, n_trials, k_success,
                 CAST(round((CAST(k_success AS DOUBLE) * ln(1.5)
                      + CAST(n_trials - k_success AS DOUBLE) * ln(0.875))
                      * 1e6) AS BIGINT) AS term_micro
          FROM daily
        ),
        cum AS (
          SELECT day, n_trials, k_success,
                 sum(term_micro) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS llr_micro
          FROM terms
        )
        SELECT day AS epoch_day, n_trials, k_success, llr_micro,
               CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
                    WHEN llr_micro <= -2944439 THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM cum ORDER BY epoch_day
        """
    )


_Q219_SQL = """
WITH ud AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_buy
  FROM events GROUP BY 1, 2
), daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_trials,
         CAST(sum(has_buy) AS BIGINT) AS k_success
  FROM ud WHERE has_click = 1 GROUP BY day
), terms AS (
  SELECT day, n_trials, k_success,
         CAST(round((CAST(k_success AS DOUBLE) * ln(1.5)
              + CAST(n_trials - k_success AS DOUBLE) * ln(0.875))
              * 1e6) AS BIGINT) AS term_micro
  FROM daily
), cum AS (
  SELECT day, n_trials, k_success,
         CAST(sum(term_micro) OVER (ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS llr_micro
  FROM terms
)
SELECT day AS epoch_day, n_trials, k_success, llr_micro,
       CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
            WHEN llr_micro <= -2944439 THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum ORDER BY epoch_day
"""


def q221_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of each
    user's INTER-EVENT times — the timing-based complement of the
    count-based Fano factor (q203): B -> -1 for clockwork arrivals,
    0 for Poisson, -> +1 for heavy bursts. Gaps come from a user-keyed
    lag window (distributed); the three sufficient statistics (n, S,
    SS) are exact integer epoch-second sums — SS accumulates in
    DECIMAL(38,0)/HUGEINT because a long-span user's sum of squared
    gaps can pass int64 — and the n's cancel algebraically so B
    reduces to (sqrt(n*SS - S^2) - S)/(sqrt(...) + S), the moment
    products evaluated in DOUBLE (greatest(...,0) absorbs sub-ulp
    negatives), one sqrt chain per user, micro-quantized.
    Degenerate gaps (n < 2 after lag, or all-zero) emit NULL; users
    under 10 gaps are dropped (estimator noise floor)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH e AS (
          SELECT user_id, unix_micros(ts) div 1000000 AS es FROM events
        ),
        gaps AS (
          SELECT user_id,
                 es - lag(es) OVER (PARTITION BY user_id ORDER BY es) AS g
          FROM e
        ),
        agg AS (
          SELECT user_id, count(g) AS n, sum(g) AS s,
                 sum(cast(g as decimal(38,0)) * g) AS ss
          FROM gaps WHERE g IS NOT NULL GROUP BY user_id
        )
        SELECT user_id, n, s,
               CASE WHEN n < 2 OR s = 0 THEN NULL ELSE
                 CAST(round((sqrt(greatest(cast(n as double)
                        * cast(ss as double)
                        - cast(s as double) * cast(s as double), 0d))
                      - CAST(s AS DOUBLE))
                      / (sqrt(greatest(cast(n as double)
                         * cast(ss as double)
                         - cast(s as double) * cast(s as double), 0d))
                         + CAST(s AS DOUBLE)) * 1e6) AS BIGINT) END
                 AS burstiness_micro
        FROM agg
        WHERE n >= 10
        ORDER BY user_id
        """
    )


_Q221_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS es FROM events
), gaps AS (
  SELECT user_id,
         es - lag(es) OVER (PARTITION BY user_id ORDER BY es) AS g
  FROM e
), agg AS (
  SELECT user_id, CAST(count(g) AS BIGINT) AS n,
         CAST(sum(g) AS BIGINT) AS s, sum(g * g) AS ss
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
)
SELECT user_id, n, s,
       CASE WHEN n < 2 OR s = 0 THEN NULL ELSE
         CAST(round((sqrt(greatest(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0))
              - CAST(s AS DOUBLE))
              / (sqrt(greatest(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0))
                 + CAST(s AS DOUBLE))
              * 1e6) AS BIGINT) END AS burstiness_micro
FROM agg
WHERE n >= 10
ORDER BY user_id
"""


# Shared survival-analysis risk table (q222 Kaplan-Meier, q235
# Nelson-Aalen): subjects are users whose first click starts the
# exposure clock; the event is the first purchase at-or-after it;
# right-censoring at the max observed day. Produces
# risk(dur, d, n_risk) via one reverse cumulative sum over the
# |distinct durations| post-aggregation table.
_SURVIVAL_RISK_SPARK = """
WITH ev AS (
  SELECT user_id, event_type,
         unix_micros(ts) div 86400000000 AS day
  FROM events
),
mx AS (
  SELECT max(day) AS dmax FROM ev
),
firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN day END) AS c0
  FROM ev GROUP BY user_id
),
conv AS (
  SELECT e.user_id, min(day) AS p0
  FROM ev e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.day >= f.c0
  GROUP BY e.user_id
),
subjects AS (
  SELECT f.user_id,
         CASE WHEN p0 IS NOT NULL THEN p0 - c0
              ELSE dmax - c0 END AS dur,
         CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM firsts f LEFT JOIN conv ON f.user_id = conv.user_id
  CROSS JOIN mx
  WHERE c0 IS NOT NULL
),
tbl AS (
  SELECT dur, count(*) AS at_t, sum(ev) AS d
  FROM subjects GROUP BY dur
),
risk AS (
  SELECT dur, d,
         sum(at_t) OVER (ORDER BY dur DESC
              ROWS UNBOUNDED PRECEDING) AS n_risk
  FROM tbl
)
"""

_SURVIVAL_RISK_DUCK = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day
  FROM events
), mx AS (
  SELECT max(day) AS dmax FROM ev
), firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN day END) AS c0
  FROM ev GROUP BY user_id
), conv AS (
  SELECT e.user_id, min(day) AS p0
  FROM ev e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.day >= f.c0
  GROUP BY e.user_id
), subjects AS (
  SELECT f.user_id,
         CASE WHEN p0 IS NOT NULL THEN p0 - c0
              ELSE dmax - c0 END AS dur,
         CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM firsts f LEFT JOIN conv ON f.user_id = conv.user_id
  CROSS JOIN mx
  WHERE c0 IS NOT NULL
), tbl AS (
  SELECT dur, CAST(count(*) AS BIGINT) AS at_t,
         CAST(sum(ev) AS BIGINT) AS d
  FROM subjects GROUP BY dur
), risk AS (
  SELECT dur, d,
         CAST(sum(at_t) OVER (ORDER BY dur DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
  FROM tbl
)
"""


def q222_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for days-to-first-purchase after
    first click (the event is the first purchase AT OR AFTER the
    first click — earlier purchases do not convert this exposure),
    with RIGHT CENSORING at the observation horizon —
    the survival-analysis estimator naive conversion rates get wrong
    (censored users are neither converted nor failed; dropping them
    biases the curve). Risk sets come from a reverse cumulative sum
    over the |distinct durations| post-aggregation table; each
    (1 - d/n) factor's ln is PICO-QUANTIZED before the prefix sum so
    the product is an exact-integer exponent (order-independent), and
    exp() runs once per output row. The n_risk = d terminal row (all
    remaining subjects fail) uses a -1000-nat sentinel, which exp
    maps to exactly 0 — at most one such row can exist, so no
    overflow. Unkeyed windows all run post-aggregation (q215/q219
    argument)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _SURVIVAL_RISK_SPARK
        + """,
        terms AS (
          SELECT dur, d, n_risk,
                 CASE WHEN d = 0 THEN 0
                      WHEN n_risk = d THEN -1000000000000000
                      ELSE CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                           / CAST(n_risk AS DOUBLE)) * 1e12) AS BIGINT) END
                   AS lnp
          FROM risk
        )
        SELECT dur AS duration_days, n_risk, d AS n_events,
               CAST(round(exp(CAST(sum(lnp) OVER (ORDER BY dur
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e12) * 1e6)
                    AS BIGINT) AS survival_micro
        FROM terms
        WHERE d > 0
        ORDER BY dur
        """
    )


_Q222_SQL = _SURVIVAL_RISK_DUCK + """, terms AS (
  SELECT dur, d, n_risk,
         CASE WHEN d = 0 THEN 0
              WHEN n_risk = d THEN -1000000000000000
              ELSE CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                   / CAST(n_risk AS DOUBLE)) * 1e12) AS BIGINT) END AS lnp
  FROM risk
)
SELECT dur AS duration_days, n_risk, d AS n_events,
       CAST(round(exp(CAST(sum(lnp) OVER (ORDER BY dur
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e12) * 1e6) AS BIGINT)
         AS survival_micro
FROM terms
WHERE d > 0
ORDER BY dur
"""


def q223_haar_band_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet band energies of each event type's daily series —
    multi-resolution periodicity detection (level L = the 2^L-day
    band; a strong weekly rhythm pumps levels 2-3, day-to-day noise
    pumps level 1) that is FULLY INTEGER: each unnormalized Haar
    detail coefficient is (first-half block sum) - (second-half block
    sum) of zero-filled daily counts, and band energy is the sum of
    squared coefficients — no float appears anywhere, so cross-engine
    parity is exact by construction (the strongest guarantee in the
    float-parity ladder). Partial trailing blocks are dropped
    (blk_days = 2^L) rather than zero-padded, so energies are not
    biased by the series end. One grouped count over events; the
    level fan-out (x3) happens on the |types| x |days| grid."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH days AS (
          SELECT min(unix_micros(ts) div 86400000000) AS d0,
                 max(unix_micros(ts) div 86400000000) AS d1
          FROM events
        ),
        cal AS (
          SELECT explode(sequence(d0, d1)) AS day FROM days
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT event_type, day FROM types CROSS JOIN cal),
        cnts AS (
          SELECT event_type AS et, unix_micros(ts) div 86400000000 AS day,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        filled AS (
          SELECT grid.event_type, grid.day - days.d0 AS t, coalesce(c, 0) AS c
          FROM grid CROSS JOIN days
          LEFT JOIN cnts ON cnts.et = grid.event_type AND cnts.day = grid.day
        ),
        lv AS (SELECT explode(sequence(1, 3)) AS lvl),
        coefs AS (
          SELECT event_type, lvl, t div shiftleft(1, lvl) AS blk,
                 sum(CASE WHEN (t div shiftleft(1, lvl - 1)) % 2 = 0
                          THEN c ELSE -c END) AS coef,
                 count(*) AS blk_days
          FROM filled CROSS JOIN lv
          GROUP BY event_type, lvl, t div shiftleft(1, lvl)
        )
        SELECT event_type, CAST(lvl AS BIGINT) AS lvl,
               count(*) AS n_blocks,
               sum(coef * coef) AS energy
        FROM coefs
        WHERE blk_days = shiftleft(1, lvl)
        GROUP BY event_type, lvl
        ORDER BY event_type, lvl
        """
    )


_Q223_SQL = """
WITH days AS (
  SELECT min(epoch_us(ts) // 86400000000) AS d0,
         max(epoch_us(ts) // 86400000000) AS d1
  FROM events
), cal AS (
  SELECT u.d AS day FROM days, UNNEST(generate_series(d0, d1)) AS u(d)
), types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT event_type, day FROM types CROSS JOIN cal),
cnts AS (
  SELECT event_type AS et, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), filled AS (
  SELECT grid.event_type, grid.day - days.d0 AS t, coalesce(c, 0) AS c
  FROM grid CROSS JOIN days
  LEFT JOIN cnts ON cnts.et = grid.event_type AND cnts.day = grid.day
), lv AS (SELECT u.l AS lvl FROM UNNEST(generate_series(1, 3)) AS u(l)),
coefs AS (
  SELECT event_type, lvl, t // (1 << lvl) AS blk,
         CAST(sum(CASE WHEN (t // (1 << (lvl - 1))) % 2 = 0
                       THEN c ELSE -c END) AS BIGINT) AS coef,
         CAST(count(*) AS BIGINT) AS blk_days
  FROM filled CROSS JOIN lv
  GROUP BY event_type, lvl, t // (1 << lvl)
)
SELECT event_type, CAST(lvl AS BIGINT) AS lvl,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(coef * coef) AS BIGINT) AS energy
FROM coefs
WHERE blk_days = (1 << lvl)
GROUP BY event_type, lvl
ORDER BY event_type, lvl
"""


def q224_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/15/5) inventory classification of parts by
    cumulative revenue share — the warehouse-planning classic whose
    naive form is a GLOBAL revenue-desc running sum (single-partition
    scale killer). Here it is the q214 two-phase machinery applied to
    prefix-SUM: range-bucket part revenues on the broadcast [min,max]
    grid (bucket order provably consistent with revenue order — the
    index is monotone in hi-r, and equal revenues share a bucket),
    sum WITHIN buckets via keyed windows, prefix the 32 bucket totals,
    and combine. Revenue is exact integer cents x (100-disc) so the
    80%/95% cuts are integer cross-multiplies; ties break on part key.
    Validated against the naive global running sum in the pytest."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q224_SQL)


_Q224_SQL = """
WITH rev AS (
  SELECT l_partkey AS p,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS r
  FROM lineitem GROUP BY l_partkey
), mm AS (
  SELECT min(r) AS lo, max(r) AS hi, CAST(sum(r) AS BIGINT) AS tot FROM rev
), bucketed AS (
  SELECT p, r,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(31, CAST(floor((CAST(hi - r AS DOUBLE))
                   * 32 / CAST(hi - lo AS DOUBLE)) AS INTEGER)) END
           AS INTEGER) AS bkt, tot
  FROM rev CROSS JOIN mm
), loc AS (
  SELECT p, r, bkt, tot,
         CAST(coalesce(sum(r) OVER (PARTITION BY bkt ORDER BY r DESC, p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS before_in_bkt
  FROM bucketed
), bsum AS (
  SELECT bkt, CAST(sum(r) AS BIGINT) AS bs FROM bucketed GROUP BY bkt
), bpre AS (
  SELECT bkt, CAST(coalesce(sum(bs) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS prior
  FROM bsum
), shares AS (
  SELECT p, r, loc.bkt, tot, prior + before_in_bkt + r AS cum
  FROM loc JOIN bpre ON loc.bkt = bpre.bkt
), classed AS (
  SELECT p, r,
         CASE WHEN CAST(cum AS DECIMAL(38,0)) * 100
                   <= CAST(tot AS DECIMAL(38,0)) * 80 THEN 'A'
              WHEN CAST(cum AS DECIMAL(38,0)) * 100
                   <= CAST(tot AS DECIMAL(38,0)) * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM shares
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(r) AS BIGINT) AS revenue_cents2,
       min(r) AS min_rev, max(r) AS max_rev
FROM classed GROUP BY abc ORDER BY abc
"""


def q225_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman 2002):
    the Pearson correlation of endpoint degrees over edge ENDS (each
    undirected edge contributes both orientations — the standard
    symmetric estimator). Do hub parts co-sell with hubs (r > 0,
    assortative) or with the long tail (r < 0, disassortative,
    typical of real co-purchase graphs)? Edges come from the SHARED
    builder operators/graph.copurchase_edges (same graph as q218);
    degrees are one vertex-keyed grouped count. Moment sums
    accumulate in DECIMAL(38,0) on the Spark side (DuckDB's
    sum(BIGINT) is HUGEINT natively) because sum(d^2)/sum(d*d') can
    exceed int64 on skewed graphs at large SF — Spark's non-ANSI
    BIGINT sum would wrap silently where DuckDB errors, diverging
    exactly where the sf0.01 selfcheck never looks. The n*Sxx - Sx^2
    products then evaluate in DOUBLE (int-to-double casts are
    correctly rounded in both engines below 2^53; past that the
    shared cast is the accepted q78-class ulp seam, guarded by
    vx/vy <= 0 => NULL)."""
    from ..operators.graph import copurchase_edges
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["lineitem"])
    e = copurchase_edges(spark.table("lineitem"), max_basket=100)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    j = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("dx")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("dy")), "b")
        .select("dx", "dy")
    )
    ori = j.unionAll(j.select(F.col("dy").alias("dx"), F.col("dx").alias("dy")))
    agg = ori.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.expr("cast(dx as decimal(38,0)) * dx")).alias("sxx"),
        F.sum(F.expr("cast(dy as decimal(38,0)) * dy")).alias("syy"),
        F.sum(F.expr("cast(dx as decimal(38,0)) * dy")).alias("sxy"),
    )
    vx = ("(cast(n as double) * cast(sxx as double)"
          " - cast(sx as double) * cast(sx as double))")
    vy = ("(cast(n as double) * cast(syy as double)"
          " - cast(sy as double) * cast(sy as double))")
    num = ("(cast(n as double) * cast(sxy as double)"
           " - cast(sx as double) * cast(sy as double))")
    return agg.select(
        "n", "sx",
        F.expr("cast(sxy as bigint)").alias("sxy"),
        F.expr(
            f"case when {vx} <= 0 or {vy} <= 0 then null "
            f"else cast(round({num} / sqrt({vx} * {vy}) * 1000) as bigint) "
            "end"
        ).alias("assortativity_milli"),
    )


_Q225_SQL = """
WITH b AS MATERIALIZED (
  SELECT l_orderkey AS o, l_partkey AS p FROM lineitem GROUP BY 1, 2
), sized AS (
  SELECT o, p, count(*) OVER (PARTITION BY o) AS bs FROM b
), kept AS (
  SELECT o, p FROM sized WHERE bs BETWEEN 2 AND 100
), e AS MATERIALIZED (
  SELECT DISTINCT x.p AS a, y.p AS bb
  FROM kept x JOIN kept y ON x.o = y.o AND x.p < y.p
), deg AS MATERIALIZED (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT bb FROM e
  ) GROUP BY v
), ori AS (
  SELECT da.d AS dx, db.d AS dy
  FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.bb = db.v
  UNION ALL
  SELECT db.d AS dx, da.d AS dy
  FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.bb = db.v
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         sum(dx * dx) AS sxx, sum(dy * dy) AS syy, sum(dx * dy) AS sxy
  FROM ori
)
SELECT n, sx, CAST(sxy AS BIGINT) AS sxy,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <= 0
              OR (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
            THEN NULL
            ELSE CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1000) AS BIGINT) END AS assortativity_milli
FROM agg
"""


def q226_markov_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the event-type Markov chain —
    how predictable is the NEXT action given the current one? (The
    chain's entropy rate is the sum of these terms; a state whose row
    collapses toward 0 nano-nats is a deterministic funnel step.)
    Transitions from a user-keyed lag; each -(c/N)·ln(c/cx) term is
    one float chain over three exact integers, NANO-quantized before
    the 25-cell sum (finer than micro because row masses are O(1/25)).
    Identical SQL text runs on both engines."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_Q226_SQL)


_Q226_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), trans AS (
  SELECT prev, event_type AS nxt, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, nxt
), rowt AS (
  SELECT prev AS prev2, CAST(sum(c) AS BIGINT) AS cx FROM trans GROUP BY prev
), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM trans),
terms AS (
  SELECT trans.prev, nxt, c, cx, n,
         CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
              * ln(CAST(c AS DOUBLE) / CAST(cx AS DOUBLE)) * 1e9)
           AS BIGINT) AS t
  FROM trans JOIN rowt ON trans.prev = rowt.prev2 CROSS JOIN tot
)
SELECT prev, CAST(count(*) AS BIGINT) AS n_next,
       max(cx) AS n_from,
       CAST(sum(t) AS BIGINT) AS cond_entropy_nano
FROM terms GROUP BY prev ORDER BY prev
"""


def q227_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending parts by exponentially decayed order counts with a
    1-day half-life — and the decay is EXACT: score = sum of
    c_age · 2^(40-age) over the last 41 days is pure BIGINT (dyadic
    weights as integer shifts; newest day weighs 2^40, the horizon
    weighs 1), so there is no float to drift and no summation-order
    seam at all — the integer-only guarantee class of q223. The age
    filter prunes the join output before aggregation; top-20 is a
    total-order limit on (score desc, partkey)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["lineitem", "orders"])
    return spark.sql(
        """
        WITH mx AS (
          SELECT max(unix_micros(o_orderdate) div 86400000000) AS dmax
          FROM orders
        ),
        li AS (
          SELECT l_partkey AS p,
                 dmax - (unix_micros(o_orderdate) div 86400000000) AS age
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey CROSS JOIN mx
          WHERE dmax - (unix_micros(o_orderdate) div 86400000000) <= 40
        ),
        daily AS (
          SELECT p, age, count(*) AS c FROM li GROUP BY p, age
        ),
        scored AS (
          SELECT p,
                 sum(c * shiftleft(CAST(1 AS BIGINT), CAST(40 - age AS INT)))
                   AS score,
                 sum(c) AS n_recent
          FROM daily GROUP BY p
        )
        SELECT p AS partkey, score, n_recent
        FROM scored
        ORDER BY score DESC, partkey
        LIMIT 20
        """
    )


_Q227_SQL = """
WITH mx AS (
  SELECT max(epoch_us(o_orderdate) // 86400000000) AS dmax FROM orders
), li AS (
  SELECT l_partkey AS p,
         dmax - (epoch_us(o_orderdate) // 86400000000) AS age
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey CROSS JOIN mx
  WHERE dmax - (epoch_us(o_orderdate) // 86400000000) <= 40
), daily AS (
  SELECT p, age, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY p, age
), scored AS (
  SELECT p, CAST(sum(c * (1::BIGINT << CAST(40 - age AS INT))) AS BIGINT)
           AS score,
         CAST(sum(c) AS BIGINT) AS n_recent
  FROM daily GROUP BY p
)
SELECT p AS partkey, score, n_recent
FROM scored
ORDER BY score DESC, partkey
LIMIT 20
"""


def q228_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users cohorted by first-signup day,
    cumulative purchase revenue by cohort age — the
    product-analytics curve behind payback-period decisions. Revenue
    converts to exact integer cents through the DECIMAL(18,2) view
    (the _dec discipline — double sums are order-dependent); the
    cumulative sum is a cohort-KEYED window (distributed across
    cohorts, never a global sort); day arithmetic is integer
    epoch-microseconds floor-divided (rule 11)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH firsts AS (
          SELECT user_id, min(unix_micros(ts) div 86400000000) AS cohort_day
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        purch AS (
          SELECT user_id, unix_micros(ts) div 86400000000 AS d,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        joined AS (
          SELECT f.cohort_day AS cd, p.d - f.cohort_day AS age_d, p.cents
          FROM purch p JOIN firsts f ON p.user_id = f.user_id
          WHERE p.d >= f.cohort_day
        ),
        agg AS (
          SELECT cd, age_d, sum(cents) AS rev, count(*) AS n_purch
          FROM joined GROUP BY cd, age_d
        ),
        sized AS (
          SELECT cohort_day AS cd2, count(*) AS cohort_users
          FROM firsts GROUP BY cohort_day
        )
        SELECT cd AS cohort_day, age_d, n_purch, cohort_users,
               sum(rev) OVER (PARTITION BY cd ORDER BY age_d
                    ROWS UNBOUNDED PRECEDING) AS cum_revenue_cents
        FROM agg JOIN sized ON agg.cd = sized.cd2
        ORDER BY cohort_day, age_d
        """
    )


_Q228_SQL = """
WITH firsts AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), purch AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS d,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), joined AS (
  SELECT f.cohort_day AS cd, p.d - f.cohort_day AS age_d, p.cents
  FROM purch p JOIN firsts f ON p.user_id = f.user_id
  WHERE p.d >= f.cohort_day
), agg AS (
  SELECT cd, age_d, CAST(sum(cents) AS BIGINT) AS rev,
         CAST(count(*) AS BIGINT) AS n_purch
  FROM joined GROUP BY cd, age_d
), sized AS (
  SELECT cohort_day AS cd2, CAST(count(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_day
)
SELECT cd AS cohort_day, age_d, n_purch, cohort_users,
       CAST(sum(rev) OVER (PARTITION BY cd ORDER BY age_d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
FROM agg JOIN sized ON agg.cd = sized.cd2
ORDER BY cohort_day, age_d
"""


def q229_markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine model evaluation: per-state top-1 accuracy of the
    event-type Markov predictor (predict the modal next event given
    the current one) — the productionized complement of q226's
    entropy (entropy says how predictable a state COULD be; this says
    how well the argmax rule actually does). The argmax is a keyed
    rank over the 25-cell transition table with a deterministic
    (count desc, event asc) tiebreak so both engines pick the same
    prediction; accuracy is evaluated on the SAME transition counts
    (resubstitution — no second corpus pass needed), as one integer
    conditional sum; the single float division is micro-rounded.
    Identical SQL text runs on both engines."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_Q229_SQL)


_Q229_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS nxt,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), trans AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, nxt
), best AS (
  SELECT prev AS prev2, nxt AS pred
  FROM (SELECT prev, nxt, row_number() OVER (PARTITION BY prev
               ORDER BY c DESC, nxt) AS rn FROM trans)
  WHERE rn = 1
)
SELECT trans.prev, max(pred) AS predicted,
       CAST(sum(c) AS BIGINT) AS n_transitions,
       CAST(sum(CASE WHEN nxt = pred THEN c ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(round(CAST(sum(CASE WHEN nxt = pred THEN c ELSE 0 END) AS DOUBLE)
            / CAST(sum(c) AS DOUBLE) * 1e6) AS BIGINT) AS accuracy_micro
FROM trans JOIN best ON trans.prev = best.prev2
GROUP BY trans.prev
ORDER BY trans.prev
"""


def q230_percolation_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation robustness of the co-purchase graph: remove the 50
    highest-degree hubs (deterministic degree-desc, id-asc cut) and
    measure what remains connected — the targeted-attack experiment
    of network science (scale-free graphs shatter under hub removal;
    random graphs barely notice). Components come from BOUNDED
    min-label propagation (operators/graph.label_propagation_
    trajectory, 6 rounds, per-round checkpoints) whose trajectory of
    (n_components, largest_component) rows makes convergence
    CHECKABLE — two equal consecutive rows — while staying exactly
    comparable to the DuckDB twin, which unrolls the identical peel
    as materialized CTE rounds (the q218 discipline). Edges come from
    the shared copurchase_edges builder."""
    from ..operators.graph import copurchase_edges, label_propagation_trajectory
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["lineitem"])
    e = copurchase_edges(spark.table("lineitem"), max_basket=100)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # TakeOrderedAndProject, not a single-partition row_number window:
    # the top-50 cut stays distributed even at 1e8 vertices.
    hubs = deg.orderBy(F.col("d").desc(), F.col("v")).limit(50).select("v")
    residual = (
        e.join(hubs.withColumnRenamed("v", "a"), "a", "left_anti")
        .join(hubs.withColumnRenamed("v", "b"), "b", "left_anti")
        .select("a", "b")
    )
    return label_propagation_trajectory(residual, rounds=6)


_Q230_SQL = """
WITH b AS MATERIALIZED (
  SELECT l_orderkey AS o, l_partkey AS p FROM lineitem GROUP BY 1, 2
), sized AS (
  SELECT o, p, count(*) OVER (PARTITION BY o) AS bs FROM b
), kept AS (
  SELECT o, p FROM sized WHERE bs BETWEEN 2 AND 100
), e AS MATERIALIZED (
  SELECT DISTINCT x.p AS a, y.p AS bb
  FROM kept x JOIN kept y ON x.o = y.o AND x.p < y.p
), deg AS MATERIALIZED (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT bb FROM e
  ) GROUP BY v
), hubs AS MATERIALIZED (
  SELECT v FROM (
    SELECT v, row_number() OVER (ORDER BY d DESC, v) AS rn FROM deg
  ) WHERE rn <= 50
), re AS MATERIALIZED (
  SELECT a, bb FROM e
  WHERE a NOT IN (SELECT v FROM hubs) AND bb NOT IN (SELECT v FROM hubs)
), l0 AS MATERIALIZED (
  SELECT v, v AS lbl FROM (
    SELECT a AS v FROM re UNION SELECT bb FROM re
  )
),
l1 AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l0
    UNION ALL
    SELECT re.a AS v, l.lbl FROM re JOIN l0 l ON re.bb = l.v
    UNION ALL
    SELECT re.bb AS v, l.lbl FROM re JOIN l0 l ON re.a = l.v
  ) GROUP BY v
),
l2 AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l1
    UNION ALL
    SELECT re.a AS v, l.lbl FROM re JOIN l1 l ON re.bb = l.v
    UNION ALL
    SELECT re.bb AS v, l.lbl FROM re JOIN l1 l ON re.a = l.v
  ) GROUP BY v
),
l3 AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l2
    UNION ALL
    SELECT re.a AS v, l.lbl FROM re JOIN l2 l ON re.bb = l.v
    UNION ALL
    SELECT re.bb AS v, l.lbl FROM re JOIN l2 l ON re.a = l.v
  ) GROUP BY v
),
l4 AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l3
    UNION ALL
    SELECT re.a AS v, l.lbl FROM re JOIN l3 l ON re.bb = l.v
    UNION ALL
    SELECT re.bb AS v, l.lbl FROM re JOIN l3 l ON re.a = l.v
  ) GROUP BY v
),
l5 AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l4
    UNION ALL
    SELECT re.a AS v, l.lbl FROM re JOIN l4 l ON re.bb = l.v
    UNION ALL
    SELECT re.bb AS v, l.lbl FROM re JOIN l4 l ON re.a = l.v
  ) GROUP BY v
),
l6 AS MATERIALIZED (
  SELECT v, min(lbl) AS lbl FROM (
    SELECT v, lbl FROM l5
    UNION ALL
    SELECT re.a AS v, l.lbl FROM re JOIN l5 l ON re.bb = l.v
    UNION ALL
    SELECT re.bb AS v, l.lbl FROM re JOIN l5 l ON re.a = l.v
  ) GROUP BY v
)
SELECT * FROM (
SELECT CAST(0 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l0) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l0 GROUP BY lbl)) AS largest_component
UNION ALL
SELECT CAST(1 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l1) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l1 GROUP BY lbl)) AS largest_component
UNION ALL
SELECT CAST(2 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l2) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l2 GROUP BY lbl)) AS largest_component
UNION ALL
SELECT CAST(3 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l3) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l3 GROUP BY lbl)) AS largest_component
UNION ALL
SELECT CAST(4 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l4) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l4 GROUP BY lbl)) AS largest_component
UNION ALL
SELECT CAST(5 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l5) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l5 GROUP BY lbl)) AS largest_component
UNION ALL
SELECT CAST(6 AS BIGINT) AS round,
  (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l6) AS n_components,
  (SELECT CAST(max(sz) AS BIGINT) FROM
     (SELECT count(*) AS sz FROM l6 GROUP BY lbl)) AS largest_component
) ORDER BY round"""


def q231_time_avg_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-AVERAGED session concurrency per day — the Little's-law
    "L" that q210's sweep-line peak bounds from above: integrate busy
    time (sum of segment lengths in integer microseconds) over each
    day and divide by the 86400-second day. The division is EXACT
    integer arithmetic: busy_us // 86400 IS the average concurrency
    in micro-units (µs busy per second of day = 1e-6 concurrency), so
    the whole query is in the q223 no-float class. Shares the
    sessionization -> midnight-split chain with q210 via
    _SESSION_SEG_SPARK/_SESSION_SEG_DUCK (one source of truth); no
    window at all — the integral is a plain grouped sum."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _SESSION_SEG_SPARK
        + """
        SELECT epoch_day, count(*) AS n_segments,
               sum(seg_end - seg_start) AS busy_us,
               sum(seg_end - seg_start) div 86400 AS avg_concurrency_micro
        FROM seg GROUP BY epoch_day ORDER BY epoch_day
        """
    )


_Q231_SQL = _SESSION_SEG_DUCK + """
SELECT epoch_day, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(seg_end - seg_start) AS BIGINT) AS busy_us,
       CAST(sum(seg_end - seg_start) // 86400 AS BIGINT)
         AS avg_concurrency_micro
FROM seg GROUP BY epoch_day ORDER BY epoch_day
"""


def _floor_scaled_div(x: str, n: str, m: int) -> str:
    """Spark SQL expression computing floor(x·m / n) EXACTLY for
    non-negative DECIMAL x and positive n. Spark's `div` narrows its
    quotient to BIGINT even on DECIMAL inputs and silently wraps past
    2⁶³ (observed: S²/N = 9.4e18 wrapped by 2⁶⁴ in q233), so the
    quotient q = x div n is built from two sub-1e16 limbs via base-10⁹
    long division — q = q_hi·10⁹ + (r_hi·10⁹ + x mod 10⁹) div n — and
    the final m-scaling reuses the exact remainder r = x − q·n. Every
    `div` here yields a quotient < 10¹⁶; valid for x < 9.2e27
    (x div 10⁹ must fit BIGINT)."""
    d = 1_000_000_000
    qhi = f"cast((({x}) div {d}) div ({n}) as decimal(38,0))"
    inner = (
        f"((cast((({x}) div {d}) % ({n}) as decimal(38,0)) * {d}"
        f" + ({x}) % {d}) div ({n}))"
    )
    q = f"({qhi} * {d} + {inner})"
    r = f"(({x}) - {q} * ({n}))"
    return f"({q} * {m} + ({r}) * {m} div ({n}))"


def q233_anova_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test: does mean order value differ across market
    segments? The decomposition SST = SSB + SSW runs entirely on exact
    integers: order totals quantize to cents, per-segment (n, Σx, Σx²)
    are exact DECIMAL sums, and each rational s²/n is scaled to 10⁶ via
    the two-limb identity floor(a·M/n) = (a div n)·M + ((a%n)·M) div n —
    no intermediate ever exceeds DECIMAL(38,0) (ceiling ≈ 10¹² orders;
    q187's documented DECIMAL discipline). F and η² are emitted as
    integer micro-ratios (`div`/`//` truncate identically on the
    non-negative operands) so no >2⁵³ integer is ever cast to double —
    the q78 HUGEINT→float64 trap. Scale shape: one equi-join (AQE picks
    broadcast when customer is small), one 5-group partial-agg collapse,
    then 1-row arithmetic. SSB/SSW exceed int64 → emitted as STRINGs
    (house rule). Degenerate inputs (k=1 or zero variance) → NULL
    stats, not division errors."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    g = base.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("cast(cents as decimal(19,0))")).alias("s"),
        F.sum(F.expr("cast(cents as decimal(19,0)) * cents")).alias("ss"),
    )
    ag = g.select(
        "n", "s", "ss",
        F.expr(_floor_scaled_div("s * s", "n", 1000000)).alias("a"),
    )
    tot = ag.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n"),
        F.sum("s").alias("stot"),
        F.sum("a").alias("a"),
        F.expr("sum(ss) * 1000000").alias("ss6"),
    )
    b = _floor_scaled_div("stot * stot", "n", 1000000)
    fin = tot.select(
        "k", "n",
        F.expr(f"greatest(a - {b}, cast(0 as decimal(38,0)))").alias("ssb_d"),
        F.expr("ss6 - a").alias("ssw_d"),
        F.expr(f"ss6 - {b}").alias("sst_d"),
    )
    return fin.select(
        "k", "n",
        F.expr("cast(ssb_d as string)").alias("ssb_s"),
        F.expr("cast(ssw_d as string)").alias("ssw_s"),
        F.expr(
            "case when sst_d > 0 then"
            " cast(ssb_d * 1000000 div sst_d as bigint) end"
        ).alias("eta2_micro"),
        F.expr(
            "case when k > 1 and ssw_d > 0 then cast(least("
            + _floor_scaled_div(
                "ssb_d * (n - k)", "ssw_d * (k - 1)", 1000000
            )
            + ", cast(1000000000000000 as decimal(38,0))) as bigint) end"
        ).alias("f_micro"),
    ).withColumn(
        "f_stat", F.expr("round(cast(f_micro as double) / 1e6, 4)")
    )


_Q233_SQL = """
WITH base AS (
  SELECT c_mktsegment AS seg,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
  FROM base GROUP BY seg
), ag AS (
  SELECT n, s, ss,
         (s * s // n) * 1000000 + ((s * s % n) * 1000000) // n AS a
  FROM g
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS HUGEINT) AS stot,
         CAST(sum(a) AS HUGEINT) AS a,
         CAST(sum(ss) AS HUGEINT) * 1000000 AS ss6
  FROM ag
), fin AS (
  SELECT k, n,
         greatest(a - ((stot * stot // n) * 1000000
                       + ((stot * stot % n) * 1000000) // n),
                  CAST(0 AS HUGEINT)) AS ssb_d,
         ss6 - a AS ssw_d,
         ss6 - ((stot * stot // n) * 1000000
                + ((stot * stot % n) * 1000000) // n) AS sst_d
  FROM tot
), fm AS (
  SELECT k, n, ssb_d, ssw_d, sst_d,
         CAST(CASE WHEN k > 1 AND ssw_d > 0 THEN least(
              ssb_d * (n - k) // (ssw_d * (k - 1)) * 1000000
              + (ssb_d * (n - k) % (ssw_d * (k - 1))) * 1000000
                // (ssw_d * (k - 1)),
              CAST(1000000000000000 AS HUGEINT)) END AS BIGINT) AS f_micro
  FROM fin
)
SELECT k, n,
       CAST(ssb_d AS VARCHAR) AS ssb_s,
       CAST(ssw_d AS VARCHAR) AS ssw_s,
       CAST(CASE WHEN sst_d > 0
                 THEN ssb_d * 1000000 // sst_d END AS BIGINT) AS eta2_micro,
       f_micro,
       round(CAST(f_micro AS DOUBLE) / 1e6, 4) AS f_stat
FROM fm
"""


_LOGRANK_CORE = """
WITH ev AS (
  SELECT user_id, event_type, {day_expr} AS day FROM events
),
mx AS (SELECT max(day) AS dmax FROM ev),
firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN day END) AS c0
  FROM ev GROUP BY user_id
),
conv AS (
  SELECT e.user_id, min(day) AS p0
  FROM ev e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.day >= f.c0
  GROUP BY e.user_id
),
subjects AS (
  SELECT f.user_id, CAST(f.user_id % 2 AS BIGINT) AS g,
         CASE WHEN p0 IS NOT NULL THEN p0 - c0 ELSE dmax - c0 END AS dur,
         CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM firsts f LEFT JOIN conv ON f.user_id = conv.user_id
  CROSS JOIN mx
  WHERE c0 IS NOT NULL
),
tbl AS (
  SELECT dur,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS at1,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS at2,
         CAST(sum(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT) AS d2
  FROM subjects GROUP BY dur
),
risk AS (
  SELECT dur, d1, d2,
         sum(at1) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING) AS n1,
         sum(at2) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING) AS n2
  FROM tbl
),
terms AS (
  SELECT d1, d2, n1, n2, n1 + n2 AS n, d1 + d2 AS d,
         (CAST(d1 + d2 AS {wide}) * n1 * 1000000000) {idiv} (n1 + n2)
           AS e1_nano,
         CASE WHEN n1 + n2 > 1 THEN
           (CAST(d1 + d2 AS {wide}) * n1 * n2
              * (n1 + n2 - (d1 + d2)) * 1000000000)
             {idiv} (CAST(n1 + n2 AS {wide}) * (n1 + n2) * (n1 + n2 - 1))
         ELSE 0 END AS v_nano
  FROM risk WHERE d1 + d2 > 0
)
SELECT CAST(max(n1k.v) AS BIGINT) AS n1_subjects,
       CAST(max(n2k.v) AS BIGINT) AS n2_subjects,
       CAST(sum(d1) AS BIGINT) AS o1,
       CAST(sum(d2) AS BIGINT) AS o2,
       CAST(sum(e1_nano) AS BIGINT) AS e1_nano,
       CAST(sum(v_nano) AS BIGINT) AS v_nano,
       CASE WHEN CAST(sum(v_nano) AS BIGINT) = 0 THEN NULL ELSE
       round((CAST(CAST(sum(d1) AS BIGINT) AS DOUBLE) * 1e9
              - CAST(CAST(sum(e1_nano) AS BIGINT) AS DOUBLE))
             / (sqrt(CAST(CAST(sum(v_nano) AS BIGINT) AS DOUBLE))
                * sqrt(1e9)), 4) END AS logrank_z
FROM terms
CROSS JOIN (SELECT count(*) AS v FROM subjects WHERE g = 0) n1k
CROSS JOIN (SELECT count(*) AS v FROM subjects WHERE g = 1) n2k
"""


def q321_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the days-to-first-purchase
    survival curves of two deterministic user cohorts (user_id parity)
    — the hypothesis test the Kaplan-Meier (q222) / Nelson-Aalen
    (q235) estimators feed: does cohort membership change conversion
    timing, with right censoring handled correctly (a naive converted-%
    comparison is biased by censored users)?

    Exactness: O₁, O₂ are exact integer event sums; each event time's
    hypergeometric mean d·n₁/n and variance d·n₁n₂(n−d)/(n²(n−1)) are
    NANO-FLOORED integer divisions BEFORE summing (the q222 pre-sum
    quantization idiom), so e1_nano/v_nano are exact order-independent
    BIGINTs; z = (O₁−E₁)/√V is one final double chain through the
    sqrt seam (v_nano < 2^53 up to ~9e6 events — int64→double is
    correctly rounded in both engines, unlike HUGEINT, the q78 rule).

    Magnitude audit: the variance numerator d·n₁·n₂·(n−d)·10⁹ ~ N⁴·10⁹
    wraps BIGINT at N ≈ 200 subjects — it runs in DECIMAL(38,0)/
    HUGEINT (wrap at N ≈ 80k… no: 38 digits hold N⁴·10⁹ to N ≈ 3e7;
    beyond that, pre-divide n² first).

    Shape at 100 TB: one grouped corpus pass per event class to the
    |distinct durations|-bounded risk table (the q222 shape); the
    test statistic is a 1-row reduction of that bounded relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _LOGRANK_CORE.format(
            day_expr="unix_micros(ts) div 86400000000",
            wide="DECIMAL(38,0)",
            idiv="div",
        )
    )


_Q321_SQL = _LOGRANK_CORE.format(
    day_expr="epoch_us(ts) // 86400000000",
    wide="HUGEINT",
    idiv="//",
)


def q322_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (tie-corrected, via midranks) for whether event
    types have systematically different daily volumes — the
    repeated-measures companion of Kruskal-Wallis (q234): each day is
    a BLOCK, event types are ranked WITHIN the day, so day-level
    traffic swings (which inflate a pooled-rank test) cancel by
    construction.

    Exact integer arithmetic end-to-end with DOUBLED midranks
    (2r = 2·below + ties + 1, the q307 idiom, per block): with
    S2_j = Σ_days 2r_dj, the tie-corrected statistic
    Q = (k−1)·Σ_j(R_j − n(k+1)/2)² / (Σr² − nk(k+1)²/4) becomes
    Q = (k−1)·A / B with A = Σ_j (S2_j − n(k+1))² and
    B = Σ_cells (2r)² − n·k·(k+1)², both exact BIGINTs (the 4s
    cancel); q_milli = ((k−1)·A·1000) div B, NULL when B = 0 (all
    blocks fully tied — Q undefined, the q308 guard discipline).
    Missing (day, type) cells are zero-filled on the dense
    days×types grid, so blocks are complete by construction.

    Shape at 100 TB: one grouped corpus pass to the (day, type) count
    table; the dense grid, per-block rank windows, and the 1-row
    reduction all run on calendar·|types|-bounded relations."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("c"))
    days = cells.select("day").distinct()
    types = cells.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(cells, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
    )
    vc = grid.groupBy("day", "c").agg(F.count("*").alias("t"))
    w = W.partitionBy("day").orderBy("c").rowsBetween(W.unboundedPreceding, -1)
    r2 = vc.select(
        "day",
        "c",
        (2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1).alias(
            "r2"
        ),
    )
    ranked = grid.join(r2, ["day", "c"]).select("day", "event_type", "r2")
    nk = ranked.agg(
        F.countDistinct("day").alias("n"),
        F.countDistinct("event_type").alias("k"),
        F.sum(F.expr("CAST(r2 AS DECIMAL(38,0)) * r2")).alias("ssq"),
    )
    s2 = ranked.groupBy("event_type").agg(F.sum("r2").alias("s2"))
    a = (
        s2.crossJoin(F.broadcast(nk))
        .select(
            F.expr(
                "CAST(s2 - n * (k + 1) AS DECIMAL(38,0))"
                " * (s2 - n * (k + 1))"
            ).alias("dev2"),
        )
        .agg(F.sum("dev2").alias("a_stat"))
    )
    return (
        a.crossJoin(F.broadcast(nk))
        .select(
            F.col("n").alias("n_days"),
            F.col("k").alias("k_types"),
            F.expr("CAST(a_stat AS DECIMAL(38,0))").cast("long").alias("a_stat"),
            F.expr(
                "CAST(ssq - CAST(n AS DECIMAL(38,0)) * k * (k + 1) * (k + 1)"
                " AS DECIMAL(38,0))"
            ).cast("long").alias("b_stat"),
            F.expr(
                "CASE WHEN ssq - CAST(n AS DECIMAL(38,0)) * k * (k+1) * (k+1)"
                " = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE CAST(((k - 1) * CAST(a_stat AS DECIMAL(38,0)) * 1000)"
                " div (ssq - CAST(n AS DECIMAL(38,0)) * k * (k+1) * (k+1))"
                " AS BIGINT) END"
            ).alias("q_milli"),
        )
    )


_Q322_SQL = """
WITH cells AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM cells),
types AS (SELECT DISTINCT event_type FROM cells),
grid AS (
  SELECT d.day, t.event_type, coalesce(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
), vc AS (
  SELECT day, c, CAST(count(*) AS BIGINT) AS t FROM grid GROUP BY 1, 2
), r2t AS (
  SELECT day, c,
         2 * coalesce(sum(t) OVER (PARTITION BY day ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS r2
  FROM vc
), ranked AS (
  SELECT g.day, g.event_type, r.r2
  FROM grid g JOIN r2t r ON r.day = g.day AND r.c = g.c
), nk AS (
  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k,
         CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) AS ssq
  FROM ranked
), s2 AS (
  SELECT event_type, CAST(sum(r2) AS BIGINT) AS s2 FROM ranked GROUP BY 1
), a AS (
  SELECT CAST(sum(CAST(s2.s2 - nk.n * (nk.k + 1) AS HUGEINT)
               * (s2.s2 - nk.n * (nk.k + 1))) AS HUGEINT) AS a_stat
  FROM s2 CROSS JOIN nk
)
SELECT nk.n AS n_days, nk.k AS k_types,
       CAST(a.a_stat AS BIGINT) AS a_stat,
       CAST(nk.ssq - CAST(nk.n AS HUGEINT) * nk.k * (nk.k + 1) * (nk.k + 1)
            AS BIGINT) AS b_stat,
       CAST(CASE WHEN nk.ssq - CAST(nk.n AS HUGEINT) * nk.k * (nk.k + 1)
                      * (nk.k + 1) = 0 THEN NULL
            ELSE ((nk.k - 1) * CAST(a.a_stat AS HUGEINT) * 1000)
                 // (nk.ssq - CAST(nk.n AS HUGEINT) * nk.k * (nk.k + 1)
                     * (nk.k + 1)) END AS BIGINT) AS q_milli
FROM a CROSS JOIN nk
"""


_DW_CORE = """
, tmin AS (SELECT min(t) AS t0 FROM {src})
, s AS (
  SELECT CAST({src}.t - tmin.t0 AS BIGINT) AS tp, CAST(y AS BIGINT) AS y
  FROM {src} CROSS JOIN tmin
)
, mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(tp) AS BIGINT) AS st,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(tp AS {wide}) * tp) AS {wide}) AS stt,
         CAST(sum(CAST(tp AS {wide}) * y) AS {wide}) AS sty
  FROM s
)
, coef AS (
  SELECT n, st, sy,
         CASE WHEN CAST(n AS {wide}) * sty - CAST(st AS {wide}) * sy >= 0
         THEN (CAST(n AS {wide}) * sty - CAST(st AS {wide}) * sy)
              * 1000000000
              {idiv} (CAST(n AS {wide}) * stt - CAST(st AS {wide}) * st)
         ELSE -((CAST(st AS {wide}) * sy - CAST(n AS {wide}) * sty)
                * 1000000000
                {idiv} (CAST(n AS {wide}) * stt - CAST(st AS {wide}) * st))
         END AS b_nano
  FROM mom
)
, bn AS (
  SELECT n, st, sy, CAST(b_nano AS BIGINT) AS b_nano,
         CAST(CASE WHEN CAST(sy AS {wide}) * 1000000000
                        - CAST(b_nano AS {wide}) * st >= 0
              THEN (CAST(sy AS {wide}) * 1000000000
                    - CAST(b_nano AS {wide}) * st) {idiv} n
              ELSE -((CAST(b_nano AS {wide}) * st
                      - CAST(sy AS {wide}) * 1000000000) {idiv} n)
              END AS BIGINT) AS a_nano
  FROM coef
)
, resid AS (
  SELECT s.tp,
         CAST(s.y * 1000000000 - bn.a_nano
              - CAST(bn.b_nano AS {wide}) * s.tp AS BIGINT) AS e
  FROM s CROSS JOIN bn
)
, lagged AS (
  SELECT e, lag(e) OVER (ORDER BY tp) AS ep FROM resid
)
, sums AS (
  SELECT CAST(sum(CAST(e AS {wide}) * e) AS {wide}) AS se2,
         CAST(sum(CASE WHEN ep IS NULL THEN 0
                  ELSE CAST(e - ep AS {wide}) * (e - ep) END) AS {wide}) AS sd2
  FROM lagged
)
SELECT bn.n AS n_days, bn.b_nano AS slope_nano,
       CAST(sums.se2 AS {str}) AS sum_e2_nano2,
       CAST(sums.sd2 AS {str}) AS sum_d2_nano2,
       CAST(CASE WHEN sums.se2 = 0 THEN NULL
            ELSE (sums.sd2 * 1000) {idiv} sums.se2 END AS BIGINT) AS dw_milli
FROM sums CROSS JOIN bn
"""


def q323_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic for lag-1 autocorrelation of the OLS
    residuals of the daily event-count trend — the regression-
    diagnostic companion of the raw-series autocorrelation (q188) and
    the OLS fits (q78/q267): DW ≈ 2(1−ρ₁) of the RESIDUALS, the
    standard check that a linear trend left serially-correlated
    structure behind (DW→0 positive, →4 negative autocorrelation).

    Exactness: the OLS slope/intercept are NANO-FLOORED integers off
    exact moment sums (b_nano = (nSty−StSy)·10⁹ div (nStt−St²), the
    q300 quantize-before-use discipline), so every residual
    e = y·10⁹ − a_nano − b_nano·t' is an exact BIGINT and both DW sums
    are exact DECIMAL(38,0)/HUGEINT — emitted as STRINGS (Σe² ~
    n·(y·10⁹)² exceeds int64, the q78 rule); dw_milli is one integer
    division with a perfect-fit (Σe²=0) NULL guard.

    Magnitude audit: e ~ y·10⁹ ≤ ~1e16 at 1e11 rows/3650 days (BIGINT
    ✓); Σe² ≤ n·e² ~ 4e35 < 10³⁸ (✓ at any calendar length).

    Shape at 100 TB: one grouped corpus pass to the pinned calendar
    series (_calendar_series); moments, residuals, the lag window and
    the 1-row reduction all run on the day-bounded relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    series = _calendar_series(_t(spark, sf_dir, "events"))
    series.createOrReplaceTempView("q323_series")
    core = _DW_CORE.format(src="q323_series", wide="DECIMAL(38,0)", idiv="div", str="STRING")
    return spark.sql("WITH " + core.lstrip().lstrip(",").lstrip())


_Q323_SQL = (
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM cal LEFT JOIN daily ON cal.d = daily.d
)"""
    + _DW_CORE.format(src="series", wide="HUGEINT", idiv="//", str="VARCHAR")
)


_PH_CORE = """
, o AS (
  SELECT t, y, row_number() OVER (ORDER BY t) AS i FROM {src}
)
, cum AS (
  SELECT i, t, y,
         sum(CAST(y AS {wide})) OVER (ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS s
  FROM o
)
, terms AS (
  SELECT i, t,
         CAST(y AS {wide}) * 1000000000
           - (CAST(s AS {wide}) * 1000000000) {idiv} i AS term
  FROM cum
)
, m AS (
  SELECT i, t,
         sum(term) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS mt
  FROM terms
)
, ph AS (
  SELECT i, t, mt,
         mt - min(mt) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS ph_t
  FROM m
)
, peak AS (
  SELECT t AS peak_day_t, ph_t AS ph_max FROM (
    SELECT t, ph_t,
           row_number() OVER (ORDER BY ph_t DESC, i ASC) AS rn
    FROM ph
  ) WHERE rn = 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM o) AS n_days,
       CAST(peak.peak_day_t AS BIGINT) AS peak_day_t,
       CAST(peak.ph_max AS {str}) AS ph_max_nano
FROM peak
"""


def q324_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley change detection on the daily event-count series —
    the sequential mean-shift monitor completing the changepoint suite
    (CUSUM q190 targets a KNOWN reference mean, Pettitt q238 is a
    retrospective rank test; Page-Hinkley tracks deviation from the
    RUNNING mean, the form an online ingest monitor actually runs):
    m_t = Σ_{i≤t}(x_i − x̄_i), PH_t = m_t − min_{s≤t} m_s, alarm when
    the peak exceeds a threshold. Reports the peak PH and its day.

    Exactness: each running mean x̄_i is NANO-FLOORED off the exact
    cumulative sum ((S_i·10⁹) div i — all operands nonnegative, no
    trunc/floor divergence), so every term, the cumulative m_t, the
    prefix min, and the peak are exact integers; the argmax tiebreak
    is earliest day.

    Magnitude audit: a term ~ x·10⁹ ≤ 2.7e22 at 1e11 rows/3650 days —
    terms and both cumulatives run in DECIMAL(38,0)/HUGEINT and
    ph_max ships as a STRING (q78 rule).

    Shape at 100 TB: one grouped corpus pass to the pinned calendar
    spine; all windows are unkeyed but run POST-aggregation on the
    day-bounded relation (the q215/q219 argument)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    series = _calendar_series(_t(spark, sf_dir, "events"))
    series.createOrReplaceTempView("q324_series")
    core = _PH_CORE.format(
        src="q324_series", wide="DECIMAL(38,0)", idiv="div", str="STRING"
    )
    return spark.sql("WITH " + core.lstrip().lstrip(",").lstrip())


_Q324_SQL = (
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM cal LEFT JOIN daily ON cal.d = daily.d
)"""
    + _PH_CORE.format(src="series", wide="HUGEINT", idiv="//", str="VARCHAR")
)


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


def q333_ab_duration_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test duration planner — the question every experiment
    review starts with, answered from the event stream itself: at the
    observed per-user conversion rate and daily traffic, how many
    users per arm (and how many days) does a two-sided α=0.05 / 80%-
    power test need to detect a +10% relative lift in the high-value
    (value > 200) purchase rate? Completes the
    experimentation suite (SRM q285, CUPED q286, A/A q295, Wilson
    q291, Neyman q294) with the PRE-experiment number.

    Determinism: the inputs (converters, users, days) are exact
    integers; p is ppm-quantized by exact integer division BEFORE the
    one double chain (normal-approximation n/arm with z=1.959964 +
    0.841621 literal constants — identical expression text in both
    engines, the accepted float-seam form), and the outputs are
    ceil()'d back to integers.

    Shape at 100 TB: one grouped pass to per-user flags (map-side
    combine on user_id), one 1-row reduction; the planner arithmetic
    is driver-free scalar algebra."""
    ev = _t(spark, sf_dir, "events")
    # qualifying conversion = a HIGH-VALUE purchase (value > 200) — the
    # plain any-purchase rate saturates at 1.0 on this schema, where a
    # planner is undefined (p2 = 1.1·p > 1)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 200)
            ).cast("long")
        ).alias("conv")
    )
    days = ev.agg(
        (
            F.expr("max(unix_micros(ts) div 86400000000)")
            - F.expr("min(unix_micros(ts) div 86400000000)")
            + 1
        ).alias("n_days")
    )
    base = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("conv").alias("n_converters"),
    )
    chain = (
        "CAST(round("
        "  (((1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0))"
        "   * (p1 * (1.0e0 - p1) + p2 * (1.0e0 - p2)))"
        "  / ((p2 - p1) * (p2 - p1))"
        "  + 0.5e0) AS BIGINT)"
    )
    return (
        base.crossJoin(F.broadcast(days))
        .select(
            "n_users",
            "n_converters",
            "n_days",
            F.expr("(n_converters * 1000000) div n_users").alias("p_ppm"),
            F.expr("n_users div n_days").alias("daily_users"),
        )
        .select(
            "n_users",
            "n_converters",
            "n_days",
            "p_ppm",
            "daily_users",
            F.expr(
                # p_ppm = 0 makes (p2-p1)^2 = 0 -> NaN whose BIGINT cast
                # diverges between engines; degenerate -> NULL (q308 idiom)
                "CASE WHEN p_ppm = 0 THEN CAST(NULL AS BIGINT) ELSE "
                + chain.replace("p1", "(CAST(p_ppm AS DOUBLE) / 1e6)")
                .replace("p2", "(CAST(p_ppm AS DOUBLE) / 1e6 * 1.1e0)")
                + " END"
            ).alias("n_per_arm"),
        )
        .select(
            "n_users",
            "n_converters",
            "n_days",
            "p_ppm",
            "daily_users",
            "n_per_arm",
            F.expr(
                "CASE WHEN daily_users > 0 THEN"
                " (2 * n_per_arm + daily_users - 1) div daily_users"
                " ELSE CAST(NULL AS BIGINT) END"
            ).alias("days_needed"),
        )
    )


_Q333_SQL = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 200
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), days AS (
  SELECT max(epoch_us(ts) // 86400000000)
         - min(epoch_us(ts) // 86400000000) + 1 AS n_days
  FROM events
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_converters
  FROM per_user
), scalars AS (
  SELECT n_users, n_converters, CAST(n_days AS BIGINT) AS n_days,
         CAST((n_converters * 1000000) // n_users AS BIGINT) AS p_ppm,
         CAST(n_users // n_days AS BIGINT) AS daily_users
  FROM base CROSS JOIN days
), planned AS (
  SELECT *,
         CASE WHEN p_ppm = 0 THEN NULL ELSE
         CAST(round(
           (((1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0))
            * ((CAST(p_ppm AS DOUBLE) / 1e6)
                 * (1.0e0 - CAST(p_ppm AS DOUBLE) / 1e6)
               + (CAST(p_ppm AS DOUBLE) / 1e6 * 1.1e0)
                 * (1.0e0 - CAST(p_ppm AS DOUBLE) / 1e6 * 1.1e0)))
           / ((CAST(p_ppm AS DOUBLE) / 1e6 * 1.1e0
               - CAST(p_ppm AS DOUBLE) / 1e6)
              * (CAST(p_ppm AS DOUBLE) / 1e6 * 1.1e0
                 - CAST(p_ppm AS DOUBLE) / 1e6))
           + 0.5e0) AS BIGINT) END AS n_per_arm
  FROM scalars
)
SELECT n_users, n_converters, n_days, p_ppm, daily_users, n_per_arm,
       CAST(CASE WHEN daily_users > 0 THEN
              (2 * n_per_arm + daily_users - 1) // daily_users
            ELSE NULL END AS BIGINT) AS days_needed
FROM planned
"""


def q334_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU stickiness at the observation horizon — the product
    engagement ratios (how much of the monthly audience shows up daily
    /weekly) that sit beside retention cohorts (q62) and concurrency
    (q210/q231): DAU = distinct users on the LAST day, WAU over its
    trailing 7 days, MAU over its trailing 30, stickiness =
    DAU·10⁶ div MAU and WAU·10⁶ div MAU.

    Exactness: day boundaries via integer microseconds (unix_micros
    div 86400000000 ≡ epoch_us // — the q30 idiom); the three distinct
    counts are exact; ratios are exact ppm integer divisions
    (DAU ⊆ WAU ⊆ MAU by construction, pytest-pinned).

    Shape at 100 TB: ONE grouped pass to (user, day ∈ last-30) — the
    pushed day filter prunes the scan — then three conditional
    distinct counts over that bounded relation (≤ 30 rows/user)."""
    ev = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    mx = ev.agg(F.max(day).alias("d_last"))
    ud = (
        ev.select(day.alias("d"), "user_id")
        .crossJoin(F.broadcast(mx))
        .filter(F.col("d") > F.col("d_last") - 30)
        .select("user_id", "d", "d_last")
        .distinct()
    )
    return ud.agg(
        F.max("d_last").alias("last_day_t"),
        F.countDistinct(
            F.when(F.col("d") == F.col("d_last"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct(
            F.when(F.col("d") > F.col("d_last") - 7, F.col("user_id"))
        ).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    ).select(
        "last_day_t",
        "dau",
        "wau",
        "mau",
        F.expr("(dau * 1000000) div mau").alias("dau_mau_ppm"),
        F.expr("(wau * 1000000) div mau").alias("wau_mau_ppm"),
    )


_Q334_SQL = """
WITH mx AS (
  SELECT max(epoch_us(ts) // 86400000000) AS d_last FROM events
), ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d, mx.d_last
  FROM events CROSS JOIN mx
  WHERE epoch_us(ts) // 86400000000 > mx.d_last - 30
)
SELECT CAST(max(d_last) AS BIGINT) AS last_day_t,
       CAST(count(DISTINCT CASE WHEN d = d_last THEN user_id END) AS BIGINT)
         AS dau,
       CAST(count(DISTINCT CASE WHEN d > d_last - 7 THEN user_id END)
            AS BIGINT) AS wau,
       CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
       CAST((count(DISTINCT CASE WHEN d = d_last THEN user_id END) * 1000000)
            // count(DISTINCT user_id) AS BIGINT) AS dau_mau_ppm,
       CAST((count(DISTINCT CASE WHEN d > d_last - 7 THEN user_id END)
             * 1000000)
            // count(DISTINCT user_id) AS BIGINT) AS wau_mau_ppm
FROM ud
"""


def q337_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend Lorenz curve in deciles — the concentration curve
    BEHIND the Gini scalars (q189/q306): per spend-decile of customers
    (ascending), how many customers, how much revenue, and the
    cumulative revenue share — 'the top 10% of customers drive X% of
    revenue', exactly.

    Exact tie-splitting without a global row sort: on the spend-cents
    COUNT TABLE with cumulative rank intervals (lo, hi], decile d owns
    ranks ((d−1)·N div 10, d·N div 10]; a tied value-group straddling
    a boundary contributes overlap = max(0, min(hi, b_d) −
    max(lo, b_{d−1})) customers — every tied customer carries the SAME
    spend, so decile revenue = Σ overlap·v is exact. Shares are ppm
    integer divisions; spend sums accumulate in DECIMAL(38,0)/HUGEINT
    and the per-decile cents ship as BIGINT (≤ total revenue cents,
    int64-safe to ~9e16 cents).

    Shape at 100 TB: one grouped pass to per-customer spend (map-side
    combine on o_custkey), one rollup to the |distinct spend values|
    count table; the decile spine (10 rows) broadcasts and all windows
    run on the bounded count table."""
    orders = _t(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    vc = cust.groupBy("cents").agg(F.count("*").alias("c"))
    w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    cum = vc.select(
        "cents",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("lo"),
        F.sum("c").over(w).alias("hi"),
    )
    tot = vc.agg(
        F.sum("c").alias("n_cust"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * c")).alias("total"),
    )
    deciles = F.broadcast(
        spark.createDataFrame([(d,) for d in range(1, 11)], "decile int")
    )
    cells = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(deciles)
        .select(
            "decile",
            "cents",
            F.expr(
                "greatest(CAST(0 AS BIGINT),"
                " least(hi, (decile * n_cust) div 10)"
                " - greatest(lo, ((decile - 1) * n_cust) div 10))"
            ).alias("k"),
        )
        .filter(F.col("k") > 0)
        .groupBy("decile")
        .agg(
            F.sum("k").alias("n_customers"),
            F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * k")).alias("spend"),
        )
    )
    wd = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("spend").cast("long").alias("spend_cents"),
            F.expr("CAST((spend * 1000000) div total AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr(
                "CAST((sum(spend) OVER (ORDER BY decile"
                " ROWS UNBOUNDED PRECEDING) * 1000000) div total AS BIGINT)"
            ).alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


_Q337_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), vc AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY cents
), cum AS (
  SELECT cents, c,
         sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - c AS lo,
         sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS hi
  FROM vc
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_cust,
         CAST(sum(CAST(cents AS HUGEINT) * c) AS HUGEINT) AS total
  FROM vc
), cells AS (
  SELECT d.decile,
         CAST(sum(k) AS BIGINT) AS n_customers,
         CAST(sum(CAST(cents AS HUGEINT) * k) AS HUGEINT) AS spend
  FROM (
    SELECT dd.decile, cum.cents,
           greatest(CAST(0 AS BIGINT),
             least(cum.hi, (dd.decile * tot.n_cust) // 10)
             - greatest(cum.lo, ((dd.decile - 1) * tot.n_cust) // 10)) AS k
    FROM cum CROSS JOIN tot
    CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) dd(decile)
  ) d
  WHERE d.k > 0
  GROUP BY d.decile
)
SELECT CAST(cells.decile AS INT) AS decile, cells.n_customers,
       CAST(cells.spend AS BIGINT) AS spend_cents,
       CAST((cells.spend * 1000000) // tot.total AS BIGINT) AS share_ppm,
       CAST((sum(cells.spend) OVER (ORDER BY cells.decile
             ROWS UNBOUNDED PRECEDING) * 1000000) // tot.total AS BIGINT)
         AS cum_share_ppm
FROM cells CROSS JOIN tot
ORDER BY decile
"""


def q235_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{t_i≤t} d_i/n_i for
    days-to-first-purchase, with the Poisson variance estimate
    Σ d_i/n_i² and the Fleming-Harrington survival Ŝ = exp(−H) — the
    other classical estimator pair on q222's shared right-censored
    risk table (_SURVIVAL_RISK_SPARK). Each per-step rational is
    micro/pico-quantized with `div` BEFORE the prefix sum, so both
    cumulatives are exact order-independent integer sums (the q222
    ln-quantization idiom); exp runs once per output row on
    H_micro/1e6 < 2⁵³. Scale shape: everything after the first
    groupBy runs on the |distinct durations| table."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _SURVIVAL_RISK_SPARK
        + """,
        steps AS (
          SELECT dur, d, n_risk,
                 cast(d as decimal(19,0)) * 1000000 div n_risk AS h_step,
                 cast(d as decimal(19,0)) * 1000000000000
                   div (cast(n_risk as decimal(19,0)) * n_risk) AS v_step
          FROM risk
        )
        SELECT dur AS duration_days, n_risk, d AS n_events,
               h_step AS hazard_step_micro,
               sum(h_step) OVER (ORDER BY dur
                    ROWS UNBOUNDED PRECEDING) AS cum_hazard_micro,
               sum(v_step) OVER (ORDER BY dur
                    ROWS UNBOUNDED PRECEDING) AS var_pico,
               cast(round(exp(-cast(sum(h_step) OVER (ORDER BY dur
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e6) * 1e6)
                    AS BIGINT) AS survival_fh_micro
        FROM steps
        WHERE d > 0
        ORDER BY dur
        """
    )


_Q235_SQL = _SURVIVAL_RISK_DUCK + """, steps AS (
  SELECT dur, d, n_risk,
         CAST(CAST(d AS HUGEINT) * 1000000 // n_risk AS BIGINT) AS h_step,
         CAST(CAST(d AS HUGEINT) * 1000000000000
              // (CAST(n_risk AS HUGEINT) * n_risk) AS BIGINT) AS v_step
  FROM risk
)
SELECT dur AS duration_days, n_risk, d AS n_events,
       h_step AS hazard_step_micro,
       CAST(sum(h_step) OVER (ORDER BY dur
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hazard_micro,
       CAST(sum(v_step) OVER (ORDER BY dur
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS var_pico,
       CAST(round(exp(-CAST(sum(h_step) OVER (ORDER BY dur
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e6) * 1e6)
            AS BIGINT) AS survival_fh_micro
FROM steps
WHERE d > 0
ORDER BY dur
"""


def q234_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (tie-corrected, EXACT): does event `value` differ
    in distribution across event types? The k-group rank ANOVA that
    completes the q187 (2-group Mann-Whitney) / q233 (parametric ANOVA)
    test family. Ranks never touch raw rows: values quantize to ms, the
    (type, ms) count table gets per-value totals from a partitionBy(v)
    window and the exclusive global cumulative from one rangeBetween
    window over the post-aggregation table, so doubled rank-sums
    2R_g = Σ c_gv·(2·cum(<v) + c_v + 1) stay integral under ties.
    Σ(2R_g)²·10⁶/n_g, 3A/(N(N+1)), and the tie correction
    (N³−N)/(N³−N−ΣT) all go through _floor_scaled_div — no quotient
    ever narrows past int64 and no >2⁵³ integer is cast to double.
    Degenerate inputs (k<2 or all values tied → C=0) yield NULL, not
    division errors. DECIMAL(38) ceiling ≈ 10⁹ events (R2² ~ 4N⁴)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 1000, 0).cast("long").alias("v"),
    ).where(F.col("v").isNotNull())
    cnt = base.groupBy("g", "v").agg(F.count("*").alias("c"))
    w_v = W.partitionBy("v")
    w_cum = W.orderBy("v").rangeBetween(W.unboundedPreceding, -1)
    u = cnt.select(
        "g", "c",
        F.sum("c").over(w_v).alias("cv"),
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("cumx"),
    )
    s = u.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.expr("cast(c as decimal(19,0)) * (2 * cumx + cv + 1)")
        ).alias("r2"),
    )
    ag = s.select(
        "n", F.expr(_floor_scaled_div("r2 * r2", "n", 1000000)).alias("a")
    )
    ties = (
        cnt.groupBy("v").agg(F.sum("c").alias("cv"))
        .agg(F.sum(
            F.expr("cast(cv as decimal(19,0)) * cv * cv - cv")
        ).alias("tt"))
    )
    tot = ag.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n"),
        F.sum("a").alias("a"),
    ).crossJoin(F.broadcast(ties))
    t1 = _floor_scaled_div(
        "3 * a", "cast(n as decimal(19,0)) * (n + 1)", 1
    )
    prep = tot.select(
        "k", "n", "a", "tt",
        F.expr(
            f"greatest({t1} - 3 * (cast(n as decimal(19,0)) + 1) * 1000000,"
            " cast(0 as decimal(38,0)))"
        ).alias("h0"),
        F.expr(
            "cast(n as decimal(19,0)) * n * n - n"
        ).alias("nn3"),
    )
    return prep.select(
        "k", "n",
        F.expr("cast(a as string)").alias("a_s"),
        F.expr("cast(tt as string)").alias("tt_s"),
        F.expr(
            "case when k > 1 and nn3 - tt > 0 then cast("
            + _floor_scaled_div("h0 * nn3", "nn3 - tt", 1)
            + " as bigint) end"
        ).alias("h_micro"),
    ).withColumn(
        "h_stat", F.expr("round(cast(h_micro as double) / 1e6, 4)")
    )


_Q234_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(round(value * 1000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), cnt AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, v
), u AS (
  SELECT g, c,
         CAST(sum(c) OVER (PARTITION BY v) AS BIGINT) AS cv,
         CAST(coalesce(sum(c) OVER (ORDER BY v
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumx
  FROM cnt
), s AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(c AS HUGEINT) * (2 * cumx + cv + 1)) AS HUGEINT)
           AS r2
  FROM u GROUP BY g
), ag AS (
  SELECT n, (r2 * r2 // n) * 1000000 + (r2 * r2 % n) * 1000000 // n AS a
  FROM s
), ties AS (
  SELECT CAST(sum(CAST(cv AS HUGEINT) * cv * cv - cv) AS HUGEINT) AS tt
  FROM (SELECT CAST(sum(c) AS BIGINT) AS cv FROM cnt GROUP BY v)
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(a) AS HUGEINT) AS a
  FROM ag
), prep AS (
  SELECT k, n, a, tt,
         greatest(3 * a // (CAST(n AS HUGEINT) * (n + 1))
                  - 3 * (CAST(n AS HUGEINT) + 1) * 1000000,
                  CAST(0 AS HUGEINT)) AS h0,
         CAST(n AS HUGEINT) * n * n - n AS nn3
  FROM tot CROSS JOIN ties
)
SELECT k, n,
       CAST(a AS VARCHAR) AS a_s,
       CAST(tt AS VARCHAR) AS tt_s,
       CAST(CASE WHEN k > 1 AND nn3 - tt > 0
                 THEN h0 * nn3 // (nn3 - tt) END AS BIGINT) AS h_micro,
       round(CAST(CAST(CASE WHEN k > 1 AND nn3 - tt > 0
                 THEN h0 * nn3 // (nn3 - tt) END AS BIGINT) AS DOUBLE)
             / 1e6, 4) AS h_stat
FROM prep
"""


def q238_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint test on the DAILY event-count
    series (zero-filled over the full calendar, the q188 argument):
    U_t = 2·W_t − t(n+1) with W_t the prefix rank-sum; the test
    statistic K = max_{t<n} |U_t| locates the most likely split. With
    doubled tie-average ranks R2_v = 2·cum(<v) + c_v + 1, 2·W_t is the
    exact-integer prefix sum of R2, so U_t = Σ_{i≤t}R2_i − t(n+1)
    never touches a float; the approximate significance
    p ≈ 2·exp(−6K²/(n³+n²)) is the single sanctioned double chain over
    exact <2⁵³ integers. Scale shape: the corpus collapses to ≤|days|
    rows in the first agg; every window runs on that bounded calendar
    table; the argmax is TakeOrdered with a deterministic
    smallest-t tie-break."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("c")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    w_lt = W.orderBy("c").rangeBetween(W.unboundedPreceding, -1)
    w_eq = W.partitionBy("c")
    ranked = series.select(
        "d", "c",
        (2 * F.coalesce(F.count("*").over(w_lt), F.lit(0))
         + F.count("*").over(w_eq) + 1).alias("r2"),
    )
    w_t = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("d")
    u = ranked.select(
        "d",
        F.row_number().over(w_all).alias("t"),
        F.sum("r2").over(w_t).alias("s2"),
    )
    n1 = ranked.agg(F.count("*").alias("n"))
    scored = (
        u.crossJoin(F.broadcast(n1))
        .where(F.col("t") < F.col("n"))
        .select(
            "n", "t", F.col("d").alias("change_date"),
            (F.col("s2") - F.col("t") * (F.col("n") + 1)).alias("u_stat"),
        )
    )
    return (
        scored.select(
            "n", "t", "change_date", "u_stat",
            F.abs(F.col("u_stat")).alias("k_stat"),
            F.expr(
                "round(least(2e0 * exp(-6e0 * u_stat * u_stat"
                " / (cast(n as double) * n * n + cast(n as double) * n)),"
                " 1e0), 6)"
            ).alias("p_value"),
        )
        .orderBy(F.desc("k_stat"), "t")
        .limit(1)
    )


_Q238_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM mm
), series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), ranked AS (
  SELECT d, c,
         2 * coalesce(count(*) OVER (ORDER BY c
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + count(*) OVER (PARTITION BY c) + 1 AS r2
  FROM series
), u AS (
  SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
         CAST(sum(r2) OVER (ORDER BY d
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s2
  FROM ranked
), n1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ranked
), scored AS (
  SELECT n, t, d AS change_date, s2 - t * (n + 1) AS u_stat
  FROM u CROSS JOIN n1
  WHERE t < n
)
SELECT n, t, change_date, u_stat,
       abs(u_stat) AS k_stat,
       round(least(2e0 * exp(-6e0 * u_stat * u_stat
             / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)),
             1e0), 6) AS p_value
FROM scored
ORDER BY k_stat DESC, t
LIMIT 1
"""


def q241_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: do purchase events
    carry different `value` than view events? One conditional-
    aggregation pass yields exact (n, Σms, Σms²) per side; the
    variance-of-mean terms v_i = (n·SS − S²)/(n²(n−1)) are
    micro-quantized through _floor_scaled_div (their numerators exceed
    every int64 bound), and the Welch-Satterthwaite df runs the same
    helper over the quantized vm_i so no intermediate ever narrows or
    wraps. Only the final t chain touches doubles — every cast input
    is a BIGINT < 2⁵³ (DuckDB's HUGEINT→DOUBLE is not correctly
    rounded, the q78 family trap; BIGINT→DOUBLE is). Guards: either
    side with n < 2 → NULL stats. DECIMAL ceiling ≈ 10⁹ events/side
    (n·SS in the helper's x < 9.2·10²⁷ bound)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.where(F.col("event_type").isin("purchase", "view")).select(
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        F.round(F.col("value") * 1000, 0).cast("long").alias("ms"),
    ).where(F.col("ms").isNotNull())
    g = base.agg(
        F.sum("is_p").alias("n1"),
        F.sum(1 - F.col("is_p")).alias("n2"),
        F.sum(F.expr("cast(is_p * ms as decimal(19,0))")).alias("s1"),
        F.sum(F.expr("cast((1 - is_p) * ms as decimal(19,0))")).alias("s2"),
        F.sum(F.expr("cast(is_p as decimal(19,0)) * ms * ms")).alias("ss1"),
        F.sum(F.expr("cast(1 - is_p as decimal(19,0)) * ms * ms")).alias("ss2"),
    )
    vm1 = _floor_scaled_div(
        "cast(n1 as decimal(19,0)) * ss1 - s1 * s1",
        "cast(n1 as decimal(19,0)) * n1 * (n1 - 1)", 1000000,
    )
    vm2 = _floor_scaled_div(
        "cast(n2 as decimal(19,0)) * ss2 - s2 * s2",
        "cast(n2 as decimal(19,0)) * n2 * (n2 - 1)", 1000000,
    )
    prep = g.select(
        "n1", "n2",
        F.expr("s1 * 1000000 div n1").alias("m1_micro"),
        F.expr("s2 * 1000000 div n2").alias("m2_micro"),
        F.expr(f"case when n1 >= 2 then {vm1} end").alias("vm1d"),
        F.expr(f"case when n2 >= 2 then {vm2} end").alias("vm2d"),
    )
    prep2 = prep.select(
        "n1", "n2", "m1_micro", "m2_micro", "vm1d", "vm2d",
        F.expr(
            "case when vm1d is not null then "
            + _floor_scaled_div("vm1d * vm1d", "n1 - 1", 1)
            + " end"
        ).alias("d1"),
        F.expr(
            "case when vm2d is not null then "
            + _floor_scaled_div("vm2d * vm2d", "n2 - 1", 1)
            + " end"
        ).alias("d2"),
    )
    df_expr = _floor_scaled_div(
        "(vm1d + vm2d) * (vm1d + vm2d)", "d1 + d2", 1000
    )
    return prep2.select(
        "n1", "n2", "m1_micro", "m2_micro",
        F.expr("cast(vm1d as bigint)").alias("vm1"),
        F.expr("cast(vm2d as bigint)").alias("vm2"),
        F.expr(
            "case when vm1d is not null and vm2d is not null"
            " and vm1d + vm2d > 0 then"
            " round(cast(cast(m1_micro - m2_micro as bigint) as double)"
            " / 1e6 / sqrt(cast(cast(vm1d + vm2d as bigint) as double)"
            " / 1e6), 4) end"
        ).alias("t_stat"),
        F.expr(
            "case when d1 is not null and d2 is not null and d1 + d2 > 0"
            f" then cast({df_expr} as bigint) end"
        ).alias("df_milli"),
    )


_Q241_SQL = """
WITH base AS (
  SELECT CAST(event_type = 'purchase' AS INTEGER) AS is_p,
         CAST(round(value * 1000) AS BIGINT) AS ms
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
), g AS (
  SELECT CAST(sum(is_p) AS BIGINT) AS n1,
         CAST(sum(1 - is_p) AS BIGINT) AS n2,
         CAST(sum(CAST(is_p AS HUGEINT) * ms) AS HUGEINT) AS s1,
         CAST(sum(CAST(1 - is_p AS HUGEINT) * ms) AS HUGEINT) AS s2,
         CAST(sum(CAST(is_p AS HUGEINT) * ms * ms) AS HUGEINT) AS ss1,
         CAST(sum(CAST(1 - is_p AS HUGEINT) * ms * ms) AS HUGEINT) AS ss2
  FROM base
), prep AS (
  SELECT n1, n2,
         s1 * 1000000 // n1 AS m1_micro,
         s2 * 1000000 // n2 AS m2_micro,
         CASE WHEN n1 >= 2 THEN
           (CAST(n1 AS HUGEINT) * ss1 - s1 * s1) * 1000000
           // (CAST(n1 AS HUGEINT) * n1 * (n1 - 1)) END AS vm1d,
         CASE WHEN n2 >= 2 THEN
           (CAST(n2 AS HUGEINT) * ss2 - s2 * s2) * 1000000
           // (CAST(n2 AS HUGEINT) * n2 * (n2 - 1)) END AS vm2d
  FROM g
), prep2 AS (
  SELECT *, vm1d * vm1d // (n1 - 1) AS d1,
            vm2d * vm2d // (n2 - 1) AS d2
  FROM prep
)
SELECT n1, n2,
       CAST(m1_micro AS BIGINT) AS m1_micro,
       CAST(m2_micro AS BIGINT) AS m2_micro,
       CAST(vm1d AS BIGINT) AS vm1,
       CAST(vm2d AS BIGINT) AS vm2,
       CASE WHEN vm1d IS NOT NULL AND vm2d IS NOT NULL
            AND vm1d + vm2d > 0 THEN
         round(CAST(CAST(m1_micro - m2_micro AS BIGINT) AS DOUBLE)
               / 1e6 / sqrt(CAST(CAST(vm1d + vm2d AS BIGINT) AS DOUBLE)
               / 1e6), 4) END AS t_stat,
       CASE WHEN d1 IS NOT NULL AND d2 IS NOT NULL AND d1 + d2 > 0
            THEN CAST((vm1d + vm2d) * (vm1d + vm2d) * 1000
                 // (d1 + d2) AS BIGINT) END AS df_milli
FROM prep2
"""


def q242_bh_fdr_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR over a FAMILY of in-engine tests: for
    every source, a 3-bucket length chi-square (short/medium/long docs)
    against the corpus-wide proportions — df = 2, whose survival
    function is the closed form p = exp(−X²/2), so no erf is needed
    (neither engine ships one). Each X² term (O·N − n_s·C_b)²/(N·n_s·C_b)
    is micro-quantized through _floor_scaled_div and summed exactly;
    the p chain and the BH comparison p_i ≤ 0.05·i/m are identical
    double expressions in both engines (exact <2⁵³ integer inputs), so
    the discovery set is deterministic. Scale shape: the corpus
    collapses to per-(source, bucket) counts in one agg; the grid,
    ranks, and the BH step-up all run on the |sources|·3 table;
    zero-observed cells are materialized by the grid so their (O−E)²
    mass is not silently dropped. DECIMAL ceiling ≈ 3·10⁹ docs
    ((O·N)² < 10³⁸)."""
    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        F.expr(
            "case when n_chars < 500 then 's'"
            " when n_chars < 2000 then 'm' else 'l' end"
        ).alias("bucket"),
    )
    obs = b.groupBy("source", "bucket").agg(F.count("*").alias("o"))
    src_t = b.groupBy("source").agg(F.count("*").alias("ns"))
    bkt_t = b.groupBy("bucket").agg(F.count("*").alias("cb"))
    n_t = b.agg(F.count("*").alias("n"))
    grid = (
        src_t.crossJoin(F.broadcast(bkt_t))
        .join(obs, ["source", "bucket"], "left")
        .crossJoin(F.broadcast(n_t))
        .select(
            "source", "ns", "cb", "n",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    dev = (
        "(cast(o as decimal(19,0)) * n - cast(ns as decimal(19,0)) * cb)"
    )
    term = grid.select(
        "source", "ns",
        F.expr(
            "case when cb > 0 then "
            + _floor_scaled_div(
                f"{dev} * {dev}",
                "cast(n as decimal(19,0)) * ns * cb",
                1000000,
            )
            + " else cast(0 as decimal(38,0)) end"
        ).alias("t"),
    )
    x2 = term.groupBy("source", "ns").agg(
        F.expr("cast(sum(t) as bigint)").alias("x2_micro")
    )
    m_t = x2.agg(F.count("*").alias("m"))
    ranked = (
        x2.crossJoin(F.broadcast(m_t))
        .withColumn(
            "i",
            F.row_number().over(
                W.orderBy(F.desc("x2_micro"), "source")
            ),
        )
        .withColumn(
            "p_value",
            F.expr("exp(-cast(x2_micro as double) / 2e6)"),
        )
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        ranked.withColumn(
            "bh_k",
            F.max(
                F.expr(
                    "case when p_value <= 5e-2 * i / m then i else 0 end"
                )
            ).over(w_all),
        )
        .select(
            "source", F.col("ns").alias("n_docs"), "x2_micro",
            F.round("p_value", 8).alias("p_value"),
            "i", "m", "bh_k",
            (F.col("i") <= F.col("bh_k")).alias("discovery"),
        )
        .orderBy("i")
    )


_Q242_SQL = """
WITH b AS (
  SELECT source,
         CASE WHEN n_chars < 500 THEN 's'
              WHEN n_chars < 2000 THEN 'm' ELSE 'l' END AS bucket
  FROM documents
), obs AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS o
  FROM b GROUP BY source, bucket
), src_t AS (
  SELECT source, CAST(count(*) AS BIGINT) AS ns FROM b GROUP BY source
), bkt_t AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY bucket
), n_t AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM b
), grid AS (
  SELECT s.source, s.ns, k.cb, n_t.n, coalesce(obs.o, 0) AS o
  FROM src_t s CROSS JOIN bkt_t k
  LEFT JOIN obs ON s.source = obs.source AND k.bucket = obs.bucket
  CROSS JOIN n_t
), term AS (
  SELECT source, ns,
         CASE WHEN cb > 0 THEN
           (CAST(o AS HUGEINT) * n - CAST(ns AS HUGEINT) * cb)
           * (CAST(o AS HUGEINT) * n - CAST(ns AS HUGEINT) * cb)
           * 1000000 // (CAST(n AS HUGEINT) * ns * cb)
         ELSE 0 END AS t
  FROM grid
), x2 AS (
  SELECT source, ns, CAST(sum(t) AS BIGINT) AS x2_micro
  FROM term GROUP BY source, ns
), m_t AS (
  SELECT CAST(count(*) AS BIGINT) AS m FROM x2
), ranked AS (
  SELECT source, ns, x2_micro, m,
         CAST(row_number() OVER (ORDER BY x2_micro DESC, source)
              AS BIGINT) AS i,
         exp(-CAST(x2_micro AS DOUBLE) / 2e6) AS p_value
  FROM x2 CROSS JOIN m_t
)
SELECT source, ns AS n_docs, x2_micro,
       round(p_value, 8) AS p_value, i, m,
       max(CASE WHEN p_value <= 5e-2 * i / m THEN i ELSE 0 END)
         OVER () AS bh_k,
       i <= max(CASE WHEN p_value <= 5e-2 * i / m THEN i ELSE 0 END)
         OVER () AS discovery
FROM ranked
ORDER BY i
"""


def _calendar_series(ev: DataFrame, pin_series: bool = True) -> DataFrame:
    """Zero-filled daily event-count series (t = epoch days, y = count)
    over the min..max calendar — the q267 spine, shared by every
    trend/backtest query that pairs or lags the daily series (q243,
    q300, q301, q316, q323, q324). PINNED per the llm.py convention:
    ``daily`` is day-bounded and referenced by both the min/max scan
    and the spine join (the pin makes the corpus pass run ONCE —
    unpinned, each downstream branch replayed the full events scan).
    The returned series is pinned only when the CALLER fans it into
    2+ branches (``pin_series`` — the convention's fan-out criterion;
    q301 references it once, and the unconditional pin cost it +0.26 s
    of eager-materialization overhead in the r7 closing bench)."""
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        F.expr("datediff(d, date'1970-01-01')").alias("t"),
        F.coalesce("c", F.lit(0)).cast("long").alias("y"),
    )
    return series.localCheckpoint(eager=True) if pin_series else series


def q243_mann_kendall_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen robust slope on the daily
    event-count series — the nonparametric alternative to q78's
    least-squares trend (outlier days cannot drag it). The series is
    zero-filled over the calendar (q188/q238), so the C(n,2) pair
    expansion is bounded by |days|² — a few hundred thousand pairs at
    ANY corpus scale, the whole reason this self-join is admissible.
    S = Σ sign(Δc) is exact; Kendall-tau-vs-time is the integer
    quotient 2S·10⁶ div (n(n−1)); each pairwise slope Δc/Δd is
    nano-quantized (floor div — deterministic) and the Theil-Sen
    estimate is the LOWER median by row_number over the sorted,
    bounded slope table (documented choice: no averaging of middle
    pairs, so the result is an actual observed quantized slope)."""
    ev = _t(spark, sf_dir, "events")
    series = _calendar_series(ev)
    a = series.select(F.col("t").alias("ta"), F.col("y").alias("ca"))
    b = series.select(F.col("t").alias("tb"), F.col("y").alias("cb"))
    pairs = a.join(b, F.col("tb") > F.col("ta")).select(
        F.signum(F.col("cb") - F.col("ca")).cast("long").alias("sgn"),
        F.expr(
            "(cast(cb as decimal(19,0)) - ca) * 1000000000"
            " div (tb - ta)"
        ).alias("slope_nano"),
    )
    stats = pairs.agg(
        F.count("*").alias("n_pairs"), F.sum("sgn").alias("s")
    )
    med = (
        pairs.select("slope_nano")
        .withColumn(
            "rn", F.row_number().over(W.orderBy("slope_nano"))
        )
        .crossJoin(F.broadcast(stats))
        .where(F.expr("rn = (n_pairs + 1) div 2"))
        .select(F.col("slope_nano").alias("sen_slope_nano"))
    )
    n1 = series.agg(F.count("*").alias("n"))
    return (
        stats.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(med))
        .select(
            "n", "n_pairs", "s",
            F.expr(
                "case when n > 1 then cast(2 * s as decimal(19,0))"
                " * 1000000 div (cast(n as decimal(19,0)) * (n - 1))"
                " end"
            ).cast("long").alias("tau_micro"),
            "sen_slope_nano",
        )
    )


_Q243_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t,
         coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), pairs AS (
  SELECT CAST(sign(b.c - a.c) AS BIGINT) AS sgn,
         CAST((CAST(b.c AS HUGEINT) - a.c) * 1000000000
              // (b.t - a.t) AS BIGINT) AS slope_nano
  FROM series a JOIN series b ON b.t > a.t
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(sgn) AS BIGINT) AS s
  FROM pairs
), med AS (
  SELECT slope_nano AS sen_slope_nano
  FROM (SELECT slope_nano,
               row_number() OVER (ORDER BY slope_nano) AS rn
        FROM pairs) r CROSS JOIN stats
  WHERE rn = (n_pairs + 1) // 2
), n1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM series
)
SELECT n, n_pairs, s,
       CAST(CASE WHEN n > 1 THEN CAST(2 * s AS HUGEINT) * 1000000
            // (CAST(n AS HUGEINT) * (n - 1)) END AS BIGINT) AS tau_micro,
       sen_slope_nano
FROM stats CROSS JOIN n1 CROSS JOIN med
"""


def q247_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-count series via classical
    rescaled-range analysis: for block sizes m ∈ {4,8,16,32}, each full
    block's R/S is computed EXACTLY as integers — scaling the centered
    prefix deviation by m gives D_t = m·Σ_{i≤t}x_i − t·Σ_block
    (integer), so R/S = (max D − min D)/√(m·ΣX² − Σ²) with both
    operands exact (the m's cancel); one √ per block, micro-floored
    before the per-m average so the cross-block mean is an exact
    integer sum. H is then the OLS slope of log₂(R/S) on log₂(m) over
    4 points, with each log ln-quantized to nano BEFORE the 4-point
    sums (the q222 discipline — no cross-row float accumulation
    anywhere). H ≈ 0.5 for an uncorrelated series, > 0.5 for
    persistent. Scale shape: everything runs on the |days|-bounded
    zero-filled calendar table; blocks are keyed windows.
    Magnitude audit: blocks are m ≤ 32 days of daily counts (~2.7e7
    at 1e11 rows), so m·ΣX² ≤ 32²·7e14 ~ 7e17 and the 4-point OLS
    moments (x = log₂m ≤ 5) are tiny — all BIGINT-safe with ≥10×
    margin at 1e11 rows; wraps only past ~1e12 rows, where the
    q233-style DECIMAL swap applies."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("c")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = (
        cal.join(daily, "d", "left")
        .select("d", F.coalesce("c", F.lit(0)).alias("c"))
        .withColumn("t0", F.expr("datediff(d, date'1970-01-01')"))
    )
    base = series.agg(F.min("t0").alias("tmin"))
    ms = spark.range(2, 6).select(
        F.expr("shiftleft(cast(1 as bigint), cast(id as int))").alias("m")
    )
    blk = (
        series.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(ms))
        .select(
            "m", "c",
            F.expr("(t0 - tmin) div m").alias("blk"),
            F.expr("(t0 - tmin) % m + 1").alias("pos"),
        )
    )
    w_pre = W.partitionBy("m", "blk").orderBy("pos").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_all = W.partitionBy("m", "blk")
    scored = blk.select(
        "m", "blk", "pos", "c",
        F.sum("c").over(w_pre).alias("pre"),
        F.sum("c").over(w_all).alias("tot"),
        F.count("*").over(w_all).alias("npos"),
        F.sum(F.expr("cast(c as decimal(19,0)) * c")).over(w_all)
        .alias("ss"),
    ).where(F.col("npos") == F.col("m"))
    dev = scored.select(
        "m", "blk",
        F.expr("m * pre - pos * tot").alias("dt"),
        F.expr("m * ss - cast(tot as decimal(19,0)) * tot").alias("s2m"),
    )
    per_blk = dev.groupBy("m", "blk").agg(
        F.max("dt").alias("dmax"), F.min("dt").alias("dmin"),
        F.first("s2m").alias("s2m"),
    ).where(F.col("s2m") > 0)
    rs = per_blk.select(
        "m",
        F.expr(
            "cast(floor(cast(dmax - dmin as double) * 1e6"
            " / sqrt(cast(cast(s2m as bigint) as double))) as bigint)"
        ).alias("rs_micro"),
    )
    per_m = rs.groupBy("m").agg(
        F.count("*").alias("n_blocks"),
        F.expr("sum(rs_micro) div count(*)").alias("rs_mean_micro"),
    ).where(F.col("rs_mean_micro") > 0)
    pts = per_m.select(
        "m", "n_blocks", "rs_mean_micro",
        F.expr("cast(round(log2(cast(m as double))) as bigint)").alias("x"),
        F.expr(
            "cast(round((ln(cast(rs_mean_micro as double)) - ln(1e6))"
            " / ln(2e0) * 1e9) as bigint)"
        ).alias("y_nano"),
    )
    ols = pts.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"), F.sum("y_nano").alias("sy"),
        F.sum(F.expr("x * y_nano")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    ).select(
        F.expr(
            "case when k * sxx - sx * sx > 0 then"
            " cast((k * sxy - sx * sy) * 1000"
            " div (cast(k * sxx - sx * sx as bigint) * 1000000000)"
            " * 1000 + ((k * sxy - sx * sy) * 1000"
            " % (cast(k * sxx - sx * sx as bigint) * 1000000000))"
            " * 1000 div (cast(k * sxx - sx * sx as bigint) * 1000000000)"
            " as bigint) end"
        ).alias("hurst_micro"),
    )
    return (
        pts.crossJoin(F.broadcast(ols))
        .select(
            "m", "n_blocks", "rs_mean_micro", "y_nano", "hurst_micro",
            F.expr("round(cast(hurst_micro as double) / 1e6, 4)")
            .alias("hurst"),
        )
        .orderBy("m")
    )


_Q247_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t0,
         coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), base AS (
  SELECT min(t0) AS tmin FROM series
), ms AS (
  SELECT unnest([4, 8, 16, 32])::BIGINT AS m
), blk AS (
  SELECT m, c,
         (t0 - tmin) // m AS blk,
         (t0 - tmin) % m + 1 AS pos
  FROM series CROSS JOIN base CROSS JOIN ms
), scored AS (
  SELECT m, blk, pos, c,
         CAST(sum(c) OVER (PARTITION BY m, blk ORDER BY pos
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre,
         CAST(sum(c) OVER (PARTITION BY m, blk) AS BIGINT) AS tot,
         CAST(count(*) OVER (PARTITION BY m, blk) AS BIGINT) AS npos,
         CAST(sum(CAST(c AS HUGEINT) * c) OVER (PARTITION BY m, blk)
              AS HUGEINT) AS ss
  FROM blk
), dev AS (
  SELECT m, blk,
         m * pre - pos * tot AS dt,
         m * ss - CAST(tot AS HUGEINT) * tot AS s2m
  FROM scored WHERE npos = m
), per_blk AS (
  SELECT m, blk, max(dt) AS dmax, min(dt) AS dmin, first(s2m) AS s2m
  FROM dev GROUP BY m, blk
  HAVING first(s2m) > 0
), rs AS (
  SELECT m,
         CAST(floor(CAST(dmax - dmin AS DOUBLE) * 1e6
              / sqrt(CAST(CAST(s2m AS BIGINT) AS DOUBLE))) AS BIGINT)
           AS rs_micro
  FROM per_blk
), per_m AS (
  SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(rs_micro) // count(*) AS BIGINT) AS rs_mean_micro
  FROM rs GROUP BY m
  HAVING sum(rs_micro) // count(*) > 0
), pts AS (
  SELECT m, n_blocks, rs_mean_micro,
         CAST(round(log2(CAST(m AS DOUBLE))) AS BIGINT) AS x,
         CAST(round((ln(CAST(rs_mean_micro AS DOUBLE)) - ln(1e6))
              / ln(2e0) * 1e9) AS BIGINT) AS y_nano
  FROM per_m
), ols AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y_nano) AS BIGINT) AS sy,
         CAST(sum(x * y_nano) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts
), h AS (
  SELECT CAST(CASE WHEN k * sxx - sx * sx > 0 THEN
         (CAST(k AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000
         // (CAST(k * sxx - sx * sx AS HUGEINT) * 1000000000) * 1000
         + ((CAST(k AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000
            % (CAST(k * sxx - sx * sx AS HUGEINT) * 1000000000)) * 1000
           // (CAST(k * sxx - sx * sx AS HUGEINT) * 1000000000)
         END AS BIGINT) AS hurst_micro
  FROM ols
)
SELECT m, n_blocks, rs_mean_micro, y_nano, hurst_micro,
       round(CAST(hurst_micro AS DOUBLE) / 1e6, 4) AS hurst
FROM pts CROSS JOIN h
ORDER BY m
"""


def q248_gumbel_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit on WEEKLY block maxima of the daily
    event count, with 4/12/52-week return levels — the capacity-
    planning question ("what daily peak should we provision for?")
    answered with the classical EVT method of moments: β = s·√6/π,
    μ = x̄ − γβ (γ = Euler-Mascheroni), level(T) = μ − β·ln(−ln(1−1/T)).
    The block-maxima table is calendar-bounded (≤|weeks| rows); its
    (k, Σmax, Σmax²) are exact integers, the unbiased variance
    k·SS − S² stays integral, and each return level is ONE double
    chain over those <2⁵³ integers with e0-literal constants — written
    identically in both engines, so the output is bit-stable. Weeks
    are epoch-day div 7 (no partial-week bias at the epoch anchor
    matters for maxima). Degenerate k < 2 → NULL."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(cast(to_date(ts) as timestamp))"
               " div 86400000000").alias("day")
    ).agg(F.count("*").alias("c"))
    wk = daily.groupBy(F.expr("day div 7").alias("week")).agg(
        F.max("c").alias("mx")
    )
    g = wk.agg(
        F.count("*").alias("k"),
        F.sum("mx").alias("s"),
        F.sum(F.expr("cast(mx as decimal(19,0)) * mx")).alias("ss"),
    )
    mean = "cast(cast(s as bigint) as double) / k"
    sd = (
        "sqrt(cast(cast(cast(k as decimal(19,0)) * ss"
        " - cast(s as decimal(19,0)) * s as bigint) as double)"
        " / (cast(k as double) * (k - 1)))"
    )
    beta = f"({sd} * sqrt(6e0) / pi())"
    mu = f"({mean} - 0.5772156649015329e0 * {beta})"
    def lvl(t: int) -> str:
        return (
            f"round({mu} - {beta} * ln(-ln(1e0 - 1e0 / {t})), 4)"
        )
    return g.select(
        "k",
        F.expr("cast(s as bigint)").alias("sum_max"),
        F.expr("cast(ss as string)").alias("ss_s"),
        F.expr(f"case when k > 1 then round({mu}, 4) end").alias("mu"),
        F.expr(f"case when k > 1 then round({beta}, 4) end").alias("beta"),
        F.expr(f"case when k > 1 then {lvl(4)} end").alias("level_4w"),
        F.expr(f"case when k > 1 then {lvl(12)} end").alias("level_12w"),
        F.expr(f"case when k > 1 then {lvl(52)} end").alias("level_52w"),
    )


_Q248_SQL = """
WITH daily AS (
  SELECT epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) // 86400000000
           AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), wk AS (
  SELECT day // 7 AS week, CAST(max(c) AS BIGINT) AS mx
  FROM daily GROUP BY 1
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(mx) AS BIGINT) AS s,
         CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS ss
  FROM wk
)
SELECT k, s AS sum_max, CAST(ss AS VARCHAR) AS ss_s,
       CASE WHEN k > 1 THEN round(CAST(CAST(s AS BIGINT) AS DOUBLE) / k
            - 0.5772156649015329e0 * (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
              - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
              / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi()), 4)
         END AS mu,
       CASE WHEN k > 1 THEN round(sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
            - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
            / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi(), 4)
         END AS beta,
       CASE WHEN k > 1 THEN round(CAST(CAST(s AS BIGINT) AS DOUBLE) / k
            - 0.5772156649015329e0 * (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
              - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
              / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi())
            - (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
               - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
               / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi())
              * ln(-ln(1e0 - 1e0 / 4)), 4) END AS level_4w,
       CASE WHEN k > 1 THEN round(CAST(CAST(s AS BIGINT) AS DOUBLE) / k
            - 0.5772156649015329e0 * (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
              - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
              / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi())
            - (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
               - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
               / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi())
              * ln(-ln(1e0 - 1e0 / 12)), 4) END AS level_12w,
       CASE WHEN k > 1 THEN round(CAST(CAST(s AS BIGINT) AS DOUBLE) / k
            - 0.5772156649015329e0 * (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
              - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
              / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi())
            - (sqrt(CAST(CAST(CAST(k AS HUGEINT) * ss
               - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
               / (CAST(k AS DOUBLE) * (k - 1))) * sqrt(6e0) / pi())
              * ln(-ln(1e0 - 1e0 / 52)), 4) END AS level_52w
FROM g
"""


def q250_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between the
    purchase and view `value` distributions — the drift metric that
    sees HOW FAR mass moved, where KS (q186) only sees the largest gap
    and PSI (q192) needs binning. W₁ = ∫|F_A − F_B| dv collapses to a
    sum over DISTINCT ms values: Σ |cumA·nB − cumB·nA|·Δv / (nA·nB),
    whose numerator is an exact DECIMAL/HUGEINT integer from one
    inclusive cumulative window over the per-value count table (the
    q187 shape — raw rows never sort); one truncating division at the
    end emits micro-ms. Also emitted: the total-variation-style
    normalized W₁/range. Scale shape: one grouped count collapse, one
    bounded post-agg window, 1-row totals broadcast. DECIMAL ceiling
    ≈ 10⁹ events/side (cum·n products)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.where(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    ).select(
        (F.col("event_type") == "purchase").cast("long").alias("is_a"),
        F.round(F.col("value") * 1000, 0).cast("long").alias("v"),
    )
    cnt = base.groupBy("v").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    w_cum = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    w_next = W.orderBy("v")
    cum = cnt.select(
        "v",
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.lead("v").over(w_next).alias("vnext"),
    )
    tot = base.agg(
        F.sum("is_a").alias("na"),
        F.sum(1 - F.col("is_a")).alias("nb"),
        F.min("v").alias("vlo"), F.max("v").alias("vhi"),
    )
    terms = cum.crossJoin(F.broadcast(tot)).where(
        F.col("vnext").isNotNull()
    ).select(
        F.expr(
            "abs(cast(cuma as decimal(19,0)) * nb"
            " - cast(cumb as decimal(19,0)) * na) * (vnext - v)"
        ).alias("t"),
        "na", "nb", "vlo", "vhi",
    )
    return terms.groupBy("na", "nb", "vlo", "vhi").agg(
        F.sum("t").alias("num")
    ).select(
        "na", "nb",
        F.expr("cast(num as string)").alias("num_s"),
        F.expr(
            "case when na > 0 and nb > 0 then cast(num * 1000000"
            " div (cast(na as decimal(19,0)) * nb) as bigint) end"
        ).alias("w1_micro"),
        F.expr(
            "case when na > 0 and nb > 0 and vhi > vlo then"
            " cast(num * 1000000 div (cast(na as decimal(19,0)) * nb"
            " * (vhi - vlo)) as bigint) end"
        ).alias("w1_norm_micro"),
    )


_Q250_SQL = """
WITH base AS (
  SELECT CAST(event_type = 'purchase' AS BIGINT) AS is_a,
         CAST(round(value * 1000) AS BIGINT) AS v
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
), cnt AS (
  SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
         CAST(sum(1 - is_a) AS BIGINT) AS cb
  FROM base GROUP BY v
), cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cumb,
         lead(v) OVER (ORDER BY v) AS vnext
  FROM cnt
), tot AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS na,
         CAST(sum(1 - is_a) AS BIGINT) AS nb,
         min(v) AS vlo, max(v) AS vhi
  FROM base
), terms AS (
  SELECT abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
           * (vnext - v) AS t,
         na, nb, vlo, vhi
  FROM cum CROSS JOIN tot
  WHERE vnext IS NOT NULL
)
SELECT na, nb,
       CAST(sum(t) AS VARCHAR) AS num_s,
       CAST(CASE WHEN na > 0 AND nb > 0 THEN CAST(sum(t) AS HUGEINT)
            * 1000000 // (CAST(na AS HUGEINT) * nb) END AS BIGINT)
         AS w1_micro,
       CAST(CASE WHEN na > 0 AND nb > 0 AND vhi > vlo THEN
            CAST(sum(t) AS HUGEINT) * 1000000
            // (CAST(na AS HUGEINT) * nb * (vhi - vlo)) END AS BIGINT)
         AS w1_norm_micro
FROM terms
GROUP BY na, nb, vlo, vhi
"""


_POIS1_T = [1580030168, 3160060337, 3950075421,
            4213413783, 4279248373, 4292415291]


def _pois1_weight(u32: str) -> str:
    """SQL CASE mapping a uniform 32-bit integer to a Poisson(1) draw
    (weights 0..6) by EXACT integer threshold comparison — the
    thresholds are floor(2³²·CDF) precomputed in Python, so both
    engines branch on identical integers and no float ever enters the
    resampling. P(>6) ≈ 8·10⁻⁵ is folded into w=6 (bounded weights,
    also what keeps Σw·x overflow-safe)."""
    t = _POIS1_T
    return (
        f"case when {u32} < {t[0]} then 0"
        f" when {u32} < {t[1]} then 1 when {u32} < {t[2]} then 2"
        f" when {u32} < {t[3]} then 3 when {u32} < {t[4]} then 4"
        f" when {u32} < {t[5]} then 5 else 6 end"
    )


def q251_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean order value — THE
    resampling scheme that works on distributed data (Σ independent
    Poisson(1) weights ≈ multinomial resample, no global coordination;
    the bag-of-little-bootstraps building block). Every draw is
    DETERMINISTIC: u32 = first 8 md5 hex chars of "orderkey:replicate"
    (the engine-portable _h32 idiom), mapped to a weight by exact
    integer thresholds (_pois1_weight), so both engines materialize
    bit-identical resamples. 50 replicate means are exact ·10⁴-cent
    truncating quotients; the percentile CI picks order statistics 2
    and 49 (documented convention) by row_number over the 50-row
    table. Scale shape: the 50× expansion collapses immediately via
    map-side combine into 50 groups — one pass, no row ever carries
    more than (b, w, cents)."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    reps = spark.range(1, 51).select(F.col("id").cast("int").alias("b"))
    u32 = ("conv(substr(md5(concat(cast(okey as string), ':',"
           " cast(b as string))), 1, 8), 16, 10)")
    weighted = base.crossJoin(F.broadcast(reps)).select(
        "b", "cents",
        F.expr(_pois1_weight(u32)).cast("long").alias("w"),
    )
    means = weighted.groupBy("b").agg(
        F.sum("w").alias("sw"),
        F.sum(F.expr("cast(w as decimal(19,0)) * cents")).alias("swx"),
    ).select(
        "b",
        F.expr(
            "case when sw > 0 then"
            " cast(swx * 10000 div sw as bigint) end"
        ).alias("mean_c4"),
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(W.orderBy("mean_c4", "b"))
    )
    ci = ranked.agg(
        F.max(F.expr("case when rn = 2 then mean_c4 end")).alias("lo_c4"),
        F.max(F.expr("case when rn = 49 then mean_c4 end")).alias("hi_c4"),
        F.count("*").alias("b_count"),
    )
    point = base.agg(
        F.count("*").alias("n"),
        F.expr(
            "cast(sum(cast(cents as decimal(19,0))) * 10000"
            " div count(*) as bigint)"
        ).alias("mean_c4"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n", "b_count", "mean_c4", "lo_c4", "hi_c4",
        F.expr("cast(lo_c4 <= mean_c4 and mean_c4 <= hi_c4 as boolean)")
        .alias("covers_point"),
    )


_Q251_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS okey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), reps AS (
  SELECT unnest(generate_series(1, 50)) AS b
), weighted AS (
  SELECT b, cents,
         CAST({_pois1_weight("(('0x' || substr(md5(okey::VARCHAR || ':' || b::VARCHAR), 1, 8))::BIGINT)")} AS BIGINT) AS w
  FROM base CROSS JOIN reps
), means AS (
  SELECT b,
         CAST(CASE WHEN sum(w) > 0 THEN
              CAST(sum(CAST(w AS HUGEINT) * cents) AS HUGEINT) * 10000
              // CAST(sum(w) AS HUGEINT) END AS BIGINT) AS mean_c4
  FROM weighted GROUP BY b
), ranked AS (
  SELECT b, mean_c4,
         row_number() OVER (ORDER BY mean_c4, b) AS rn
  FROM means
), ci AS (
  SELECT max(CASE WHEN rn = 2 THEN mean_c4 END) AS lo_c4,
         max(CASE WHEN rn = 49 THEN mean_c4 END) AS hi_c4,
         CAST(count(*) AS BIGINT) AS b_count
  FROM ranked
), point AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) * 10000
              // count(*) AS BIGINT) AS mean_c4
  FROM base
)
SELECT n, b_count, mean_c4, lo_c4, hi_c4,
       lo_c4 <= mean_c4 AND mean_c4 <= hi_c4 AS covers_point
FROM point CROSS JOIN ci
"""


def q253_optimal_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal 3-segmentation of the daily event-count series by exact
    Bellman dynamic programming — the k-segment generalization of the
    single changepoint (q238) and CUSUM (q190): minimize total
    within-segment SSE over ALL ways to cut the series into 3
    contiguous segments. Admissible at any corpus scale because the DP
    state is calendar-bounded: segment costs come from prefix sums
    (len·ΣX² − S²)·10⁶ div len via _floor_scaled_div (exact micro
    integers, so cost comparisons are engine-identical), the O(|days|²)
    sse relation and both DP layers are joins over bounded tables, and
    every argmin is min-cost-then-min-index (deterministic ties).
    Output: the three segments with boundaries, exact sums and costs,
    plus the optimal total — the oracle replays the identical DP as
    plain CTEs."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("c")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = W.orderBy("d")
    pref = series.select(
        "d",
        F.row_number().over(w).alias("t"),
        F.sum("c").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("p"),
        F.sum(F.expr("cast(c as decimal(19,0)) * c"))
        .over(w.rowsBetween(W.unboundedPreceding, 0)).alias("q"),
    )
    nrow = pref.agg(F.max("t").alias("n"))
    zero = spark.sql(
        "select 0 as t, cast(0 as bigint) as p,"
        " cast(0 as decimal(29,0)) as q"
    )
    prefz = pref.select("t", "p", "q").unionByName(zero)
    a = prefz.select(
        F.col("t").alias("a"), F.col("p").alias("pa"), F.col("q").alias("qa")
    )
    b = pref.select(
        F.col("t").alias("j"), F.col("p").alias("pj"), F.col("q").alias("qj")
    )
    # The O(|days|²) pair expansion is the DP's state space by design
    # (calendar-bounded); broadcast the anchor side so it compiles to
    # BroadcastNestedLoopJoin, and persist — four consumers below.
    sse = F.broadcast(a).join(b, F.col("j") > F.col("a")).select(
        (F.col("a") + 1).alias("i"), "j",
        (F.col("j") - F.col("a")).alias("len"),
        (F.col("pj") - F.col("pa")).alias("s"),
        F.expr(
            "cast("
            + _floor_scaled_div(
                "(j - a) * (qj - qa) - cast(pj - pa as decimal(19,0))"
                " * (pj - pa)",
                "j - a", 1000000,
            )
            + " as decimal(38,0))"
        ).alias("sse_micro"),
    ).localCheckpoint(eager=True)
    cost1 = sse.where(F.col("i") == 1).select(
        F.col("j").alias("t"), F.col("sse_micro").alias("c1")
    )
    cand2 = cost1.join(sse, F.col("i") == F.col("t") + 1).select(
        F.col("t").alias("j1"), F.col("j").alias("t2"),
        (F.col("c1") + F.col("sse_micro")).alias("tot2"),
    )
    m2 = cand2.groupBy("t2").agg(F.min("tot2").alias("c2"))
    cand3 = (
        m2.join(
            sse.crossJoin(F.broadcast(nrow)).where(F.col("j") == F.col("n")),
            F.col("i") == F.col("t2") + 1,
        )
        .select("t2", (F.col("c2") + F.col("sse_micro")).alias("tot3"))
    )
    best3 = cand3.agg(F.min("tot3").alias("total_cost"))
    j2 = (
        cand3.join(
            F.broadcast(best3), F.col("tot3") == F.col("total_cost")
        )
        .agg(
            F.min("t2").alias("j2"),
            F.min("total_cost").alias("total_cost_micro"),
        )
    )
    j1 = (
        cand2.join(F.broadcast(j2), F.col("t2") == F.col("j2"))
        .join(
            m2.withColumnRenamed("t2", "t2m"),
            F.col("t2m") == F.col("j2"),
        )
        .where(F.col("tot2") == F.col("c2"))
        .agg(F.min("j1").alias("j1"))
    )
    bounds = (
        j1.crossJoin(F.broadcast(j2)).crossJoin(F.broadcast(nrow))
        .select(
            F.expr(
                "stack(3,"
                " 1, cast(1 as bigint), cast(j1 as bigint),"
                " 2, cast(j1 + 1 as bigint), cast(j2 as bigint),"
                " 3, cast(j2 + 1 as bigint), cast(n as bigint))"
                " as (seg_id, i, j)"
            ),
            "total_cost_micro",
        )
        .select("seg_id", "i", "j", "total_cost_micro")
    )
    dates = pref.select("t", "d")
    return (
        bounds
        .join(sse.select("i", "j", "len", "s", "sse_micro"), ["i", "j"])
        .join(dates.withColumnRenamed("t", "i")
              .withColumnRenamed("d", "start_date"), "i")
        .join(dates.withColumnRenamed("t", "j")
              .withColumnRenamed("d", "end_date"), "j")
        .select(
            "seg_id", "start_date", "end_date", "len",
            F.col("s").alias("seg_sum"),
            F.expr("cast(sse_micro as bigint)").alias("sse_micro"),
            F.expr("cast(total_cost_micro as bigint)")
            .alias("total_cost_micro"),
        )
        .orderBy("seg_id")
    )


_Q253_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM mm
), series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), pref AS (
  SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
         CAST(sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS p,
         CAST(sum(CAST(c AS HUGEINT) * c) OVER (ORDER BY d
              ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS q
  FROM series
), nrow AS (
  SELECT max(t) AS n FROM pref
), prefz AS (
  SELECT t, p, q FROM pref
  UNION ALL SELECT 0, 0, CAST(0 AS HUGEINT)
), sse AS (
  SELECT a.t + 1 AS i, b.t AS j, b.t - a.t AS len,
         b.p - a.p AS s,
         ((b.t - a.t) * (b.q - a.q)
          - CAST(b.p - a.p AS HUGEINT) * (b.p - a.p)) * 1000000
           // (b.t - a.t) AS sse_micro
  FROM prefz a JOIN pref b ON b.t > a.t
), cost1 AS (
  SELECT j AS t, sse_micro AS c1 FROM sse WHERE i = 1
), cand2 AS (
  SELECT c.t AS j1, s.j AS t2, c.c1 + s.sse_micro AS tot2
  FROM cost1 c JOIN sse s ON s.i = c.t + 1
), m2 AS (
  SELECT t2, min(tot2) AS c2 FROM cand2 GROUP BY t2
), cand3 AS (
  SELECT m2.t2, m2.c2 + s.sse_micro AS tot3
  FROM m2 JOIN sse s ON s.i = m2.t2 + 1
  CROSS JOIN nrow WHERE s.j = nrow.n
), best3 AS (
  SELECT min(tot3) AS total_cost FROM cand3
), j2 AS (
  SELECT min(t2) AS j2, min(total_cost) AS total_cost_micro
  FROM cand3 CROSS JOIN best3 WHERE tot3 = total_cost
), j1 AS (
  SELECT min(j1) AS j1
  FROM cand2 CROSS JOIN j2 JOIN m2 ON m2.t2 = j2.j2
  WHERE cand2.t2 = j2.j2 AND cand2.tot2 = m2.c2
), bounds AS (
  SELECT 1 AS seg_id, CAST(1 AS BIGINT) AS i, j1.j1 AS j,
         j2.total_cost_micro
  FROM j1 CROSS JOIN j2
  UNION ALL
  SELECT 2, j1.j1 + 1, j2.j2, j2.total_cost_micro
  FROM j1 CROSS JOIN j2
  UNION ALL
  SELECT 3, j2.j2 + 1, nrow.n, j2.total_cost_micro
  FROM j2 CROSS JOIN nrow
)
SELECT seg_id, di.d AS start_date, dj.d AS end_date, s.len,
       s.s AS seg_sum,
       CAST(s.sse_micro AS BIGINT) AS sse_micro,
       CAST(b.total_cost_micro AS BIGINT) AS total_cost_micro
FROM bounds b
JOIN sse s ON s.i = b.i AND s.j = b.j
JOIN pref di ON di.t = b.i
JOIN pref dj ON dj.t = b.j
ORDER BY seg_id
"""


def q255_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed and winsorized mean order value per market
    segment — the robust-location companions to MAD (q162) and the
    weighted median (q166), computed WITHOUT sorting raw rows: on the
    per-(segment, cents) count table, one keyed cumulative window
    gives each distinct value's kept multiplicity
    max(0, min(n−k, cum) − max(k, cum−c)) for the trim window
    [k+1, n−k] (k = n div 10), so the trimmed sum is an exact integer;
    the winsorized mean adds k copies of the exact p10/p90 order
    statistics (smallest v with cum ≥ rank — min-filtered aggregates,
    no percentile approximation anywhere). All quotients are
    truncating ·10⁴-cent integers. Degenerate n − 2k ≤ 0 → NULL."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    cnt = base.groupBy("seg", "v").agg(F.count("*").alias("c"))
    w_seg = W.partitionBy("seg")
    w_cum = W.partitionBy("seg").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    u = cnt.select(
        "seg", "v", "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_seg).alias("n"),
    ).withColumn("k", F.expr("n div 10"))
    kept = u.select(
        "seg", "v", "c", "cum", "n", "k",
        F.expr(
            "greatest(least(n - k, cum) - greatest(k, cum - c),"
            " cast(0 as bigint))"
        ).alias("kept"),
    )
    agg = kept.groupBy("seg").agg(
        F.max("n").alias("n"), F.max("k").alias("k"),
        F.sum(F.expr("cast(v as decimal(19,0)) * c")).alias("s_all"),
        F.sum(F.expr("cast(v as decimal(19,0)) * kept")).alias("s_trim"),
        F.min(F.expr("case when cum >= k + 1 then v end")).alias("p10_c"),
        F.min(F.expr("case when cum >= n - k then v end")).alias("p90_c"),
    )
    return agg.select(
        "seg", "n", "k", "p10_c", "p90_c",
        F.expr("cast(s_all * 10000 div n as bigint)").alias("mean_c4"),
        F.expr(
            "case when n - 2 * k > 0 then"
            " cast(s_trim * 10000 div (n - 2 * k) as bigint) end"
        ).alias("trimmed_mean_c4"),
        F.expr(
            "cast((s_trim + cast(k as decimal(19,0)) * p10_c"
            " + cast(k as decimal(19,0)) * p90_c) * 10000"
            " div n as bigint)"
        ).alias("winsor_mean_c4"),
    ).orderBy("seg")


_Q255_SQL = """
WITH base AS (
  SELECT c_mktsegment AS seg,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
), cnt AS (
  SELECT seg, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY seg, v
), u AS (
  SELECT seg, v, c,
         CAST(sum(c) OVER (PARTITION BY seg ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY seg) AS BIGINT) AS n
  FROM cnt
), kept AS (
  SELECT seg, v, c, cum, n, n // 10 AS k,
         greatest(least(n - n // 10, cum)
                  - greatest(n // 10, cum - c), 0) AS kept
  FROM u
), agg AS (
  SELECT seg, max(n) AS n, max(k) AS k,
         CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s_all,
         CAST(sum(CAST(v AS HUGEINT) * kept) AS HUGEINT) AS s_trim,
         min(CASE WHEN cum >= k + 1 THEN v END) AS p10_c,
         min(CASE WHEN cum >= n - k THEN v END) AS p90_c
  FROM kept GROUP BY seg
)
SELECT seg, n, k, p10_c, p90_c,
       CAST(s_all * 10000 // n AS BIGINT) AS mean_c4,
       CAST(CASE WHEN n - 2 * k > 0 THEN
            s_trim * 10000 // (n - 2 * k) END AS BIGINT)
         AS trimmed_mean_c4,
       CAST((s_trim + CAST(k AS HUGEINT) * p10_c
             + CAST(k AS HUGEINT) * p90_c) * 10000 // n AS BIGINT)
         AS winsor_mean_c4
FROM agg
ORDER BY seg
"""


def q264_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox disaggregation audit: conversion rate
    (purchase / (purchase + view)) for cohort A (c_acctbal >= 0) vs
    cohort B (c_acctbal < 0), pooled AND within every market segment —
    the aggregation-bias check a dataset curator runs before trusting
    a pooled A/B comparison. A segment `reverses` when its rate
    direction contradicts the pooled direction.

    Exactness: directions are sign(a_succ·b_tot − b_succ·a_tot) —
    cross-multiplied BIGINT comparisons, never float division
    (the q118/q121 flag discipline); rates surface only as display
    columns via one rounded division each.

    Shape at 100 TB: one events×customer broadcast-dim join, one
    grouped pass to (segment, cohort) partials, a pivot of the
    <=5-row-per-cohort relation, and a 1-row pooled broadcast."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("user_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
        F.when(F.col("c_acctbal") >= 0, F.lit("A")).otherwise(F.lit("B")).alias(
            "cohort"
        ),
    )
    base = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment", "cohort")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("succ"),
            F.count("*").alias("tot"),
        )
    )
    seg = (
        base.groupBy("c_mktsegment")
        .pivot("cohort", ["A", "B"])
        .agg(
            F.first("succ").alias("succ"),
            F.first("tot").alias("tot"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.coalesce("A_succ", F.lit(0)).alias("a_succ"),
            F.coalesce("A_tot", F.lit(0)).alias("a_tot"),
            F.coalesce("B_succ", F.lit(0)).alias("b_succ"),
            F.coalesce("B_tot", F.lit(0)).alias("b_tot"),
        )
    )
    sgn = F.signum(
        (F.col("a_succ") * F.col("b_tot") - F.col("b_succ") * F.col("a_tot"))
        .cast("double")
    ).cast("int")
    pooled = (
        seg.agg(
            F.sum("a_succ").alias("pa_succ"),
            F.sum("a_tot").alias("pa_tot"),
            F.sum("b_succ").alias("pb_succ"),
            F.sum("b_tot").alias("pb_tot"),
        )
        .select(
            F.signum(
                (
                    F.col("pa_succ") * F.col("pb_tot")
                    - F.col("pb_succ") * F.col("pa_tot")
                ).cast("double")
            )
            .cast("int")
            .alias("pooled_dir")
        )
    )
    return (
        seg.crossJoin(F.broadcast(pooled))
        .select(
            "segment",
            "a_succ",
            "a_tot",
            "b_succ",
            "b_tot",
            F.when(
                F.col("a_tot") > 0,
                F.round(F.col("a_succ").cast("double") / F.col("a_tot"), 4),
            ).otherwise(F.lit(0.0)).alias("a_rate"),
            F.when(
                F.col("b_tot") > 0,
                F.round(F.col("b_succ").cast("double") / F.col("b_tot"), 4),
            ).otherwise(F.lit(0.0)).alias("b_rate"),
            sgn.alias("seg_dir"),
            "pooled_dir",
            (sgn * F.col("pooled_dir") < 0).alias("reverses"),
        )
        .orderBy("segment")
    )


_Q264_SQL = """
WITH base AS (
  SELECT c.c_mktsegment,
         CASE WHEN c.c_acctbal >= 0 THEN 'A' ELSE 'B' END AS cohort,
         CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS succ,
         CAST(count(*) AS BIGINT) AS tot
  FROM events e
  JOIN customer c ON c.c_custkey = e.user_id
  WHERE e.event_type IN ('purchase', 'view')
  GROUP BY 1, 2
), seg AS (
  SELECT c_mktsegment AS segment,
         CAST(coalesce(sum(CASE WHEN cohort = 'A' THEN succ END), 0) AS BIGINT) AS a_succ,
         CAST(coalesce(sum(CASE WHEN cohort = 'A' THEN tot END), 0) AS BIGINT) AS a_tot,
         CAST(coalesce(sum(CASE WHEN cohort = 'B' THEN succ END), 0) AS BIGINT) AS b_succ,
         CAST(coalesce(sum(CASE WHEN cohort = 'B' THEN tot END), 0) AS BIGINT) AS b_tot
  FROM base GROUP BY 1
), pooled AS (
  SELECT CAST(sign(sum(a_succ) * sum(b_tot) - sum(b_succ) * sum(a_tot))
              AS INTEGER) AS pooled_dir
  FROM seg
)
SELECT segment, a_succ, a_tot, b_succ, b_tot,
       CASE WHEN a_tot > 0
            THEN round(CAST(a_succ AS DOUBLE) / a_tot, 4) ELSE 0.0 END AS a_rate,
       CASE WHEN b_tot > 0
            THEN round(CAST(b_succ AS DOUBLE) / b_tot, 4) ELSE 0.0 END AS b_rate,
       CAST(sign(a_succ * b_tot - b_succ * a_tot) AS INTEGER) AS seg_dir,
       pooled_dir,
       (CAST(sign(a_succ * b_tot - b_succ * a_tot) AS INTEGER) * pooled_dir < 0)
         AS reverses
FROM seg CROSS JOIN pooled
ORDER BY segment
"""


def q267_chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test at the midpoint of the daily
    event-count series: fit y = a + b·t by OLS on the full series and
    on each half, F = ((SSE_p − SSE_1 − SSE_2)/k) / ((SSE_1+SSE_2)/
    (n−2k)), k=2 — the regression-based complement to the rank-based
    Pettitt (q238) and CUSUM (q190) changepoint detectors.

    Exactness: all regression moments (Σt, Σy, Σt², Σty, Σy²) are
    exact integers on the calendar-bounded series; each SSE is the
    single deterministic double chain (C − A²/B)/n over those integers
    and F is one more deterministic chain — the q248 discipline.
    Magnitude audit: t is calendar-bounded (≤ ~1e4 days) so Σt² ≤ 1e12
    and Σty ≤ ~1e15 stay BIGINT-safe, but y (daily count) scales with
    the corpus — at 1e11 rows / 3650 days, y ≈ 2.7e7 and Σy² ≈ 2.7e18
    sits only 3.4× under int64 — so Σy² accumulates in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB). Its CAST→DOUBLE is exact below 2^53
    (all driver scales); past that the ≤2^-52 seam is invisible at
    round(·, 4).

    Shape at 100 TB: one corpus groupBy to daily counts; everything
    after runs on the calendar-bounded (≤ a few thousand rows) series,
    with the midpoint as a 1-row broadcast."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("c")
    )
    mm = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = mm.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = W.orderBy("d")
    idx = series.select(
        F.row_number().over(w).alias("t"), F.col("c").cast("long").alias("y")
    )
    nrow = idx.agg((F.max("t").cast("long")).alias("n"))
    seg = (
        idx.crossJoin(F.broadcast(nrow))
        .select(
            F.when(F.col("t") <= F.expr("n div 2"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("seg"),
            F.col("t").cast("long").alias("t"),
            "y",
        )
        .groupBy("seg")
        .agg(
            F.count("*").alias("m"),
            F.sum("t").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("t * t")).alias("sxx"),
            F.sum(F.expr("t * y")).alias("sxy"),
            F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        )
        .localCheckpoint(eager=True)
    )
    sse = (
        "(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy"
        " - (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
        " / CAST(m AS DOUBLE)"
    )
    per = seg.select("seg", F.expr(sse).alias("sse"), "m")
    pooled = (
        seg.agg(
            F.sum("m").alias("m"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("sxx").alias("sxx"),
            F.sum("sxy").alias("sxy"),
            F.sum("syy").alias("syy"),
        )
        .select(F.expr(sse).alias("sse_p"), F.col("m").alias("n"))
    )
    halves = (
        per.groupBy()
        .pivot("seg", [1, 2])
        .agg(F.first("sse"))
        .select(F.col("1").alias("sse_1"), F.col("2").alias("sse_2"))
    )
    return (
        halves.crossJoin(F.broadcast(pooled))
        .select(
            F.col("n"),
            F.expr("n div 2").alias("break_t"),
            F.round("sse_p", 4).alias("sse_pooled"),
            F.round("sse_1", 4).alias("sse_1"),
            F.round("sse_2", 4).alias("sse_2"),
            F.round(
                F.expr(
                    "CASE WHEN sse_1 + sse_2 > 0 THEN"
                    " ((sse_p - sse_1 - sse_2) / 2.0e0)"
                    " / ((sse_1 + sse_2) / CAST(n - 4 AS DOUBLE))"
                    " ELSE CAST(NULL AS DOUBLE) END"
                ),
                4,
            ).alias("f_stat"),
        )
    )


_Q267_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM mm
), series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), idx AS (
  SELECT row_number() OVER (ORDER BY d) AS t, CAST(c AS BIGINT) AS y
  FROM series
), nn AS (
  SELECT CAST(max(t) AS BIGINT) AS n FROM idx
), seg AS (
  SELECT CASE WHEN t <= (SELECT n FROM nn) // 2 THEN 1 ELSE 2 END AS seg,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(t) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * t) AS BIGINT) AS sxx,
         CAST(sum(t * y) AS BIGINT) AS sxy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM idx GROUP BY 1
), per AS (
  SELECT seg,
         (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy
          - (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
         / CAST(m AS DOUBLE) AS sse
  FROM seg
), pooled AS (
  SELECT (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy
          - (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          * (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
         / CAST(m AS DOUBLE) AS sse_p,
         m AS n
  FROM (
    SELECT CAST(sum(m) AS BIGINT) AS m, CAST(sum(sx) AS BIGINT) AS sx,
           CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxx) AS BIGINT) AS sxx,
           CAST(sum(sxy) AS BIGINT) AS sxy, CAST(sum(syy) AS HUGEINT) AS syy
    FROM seg
  )
), halves AS (
  SELECT max(CASE WHEN seg = 1 THEN sse END) AS sse_1,
         max(CASE WHEN seg = 2 THEN sse END) AS sse_2
  FROM per
)
SELECT n, n // 2 AS break_t,
       round(sse_p, 4) AS sse_pooled,
       round(sse_1, 4) AS sse_1,
       round(sse_2, 4) AS sse_2,
       round(CASE WHEN sse_1 + sse_2 > 0 THEN
               ((sse_p - sse_1 - sse_2) / 2.0e0)
               / ((sse_1 + sse_2) / CAST(n - 4 AS DOUBLE))
             ELSE CAST(NULL AS DOUBLE) END, 4) AS f_stat
FROM halves CROSS JOIN pooled
"""


def q273_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio and chi-square across market
    segments for the q264 cohort×conversion table — the stratified
    estimate that answers what q264's Simpson audit raises: once the
    pooled comparison is confounded by segment, what is the
    segment-ADJUSTED effect of cohort on conversion?

    Per stratum (a = A-purchase, b = A-view, c = B-purchase,
    d = B-view, n = a+b+c+d) the Cochran-Mantel-Haenszel ingredients
    a·d/n, b·c/n, E = (a+b)(a+c)/n and V = (a+b)(c+d)(a+c)(b+d)/
    (n²(n−1)) are each floored to NANO BIGINTs before summation (the
    quantize-pre-sum discipline — cross-stratum float sums never
    happen); OR_ppm is one nonnegative integer division and the
    chi-square one final double chain over the exact sums.

    Shape at 100 TB: identical to q264 — broadcast dim join, one
    grouped pass, then a <=5-row stratum reduction."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("user_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
        (F.col("c_acctbal") >= 0).alias("is_a"),
    )
    cells = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.when(F.col("is_a") & (F.col("event_type") == "purchase"), 1)
                .otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(F.col("is_a") & (F.col("event_type") == "view"), 1)
                .otherwise(0)
            ).alias("b"),
            F.sum(
                F.when(
                    (~F.col("is_a")) & (F.col("event_type") == "purchase"), 1
                ).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when((~F.col("is_a")) & (F.col("event_type") == "view"), 1)
                .otherwise(0)
            ).alias("d"),
        )
        .filter(F.expr("a + b + c + d > 1"))
        .select(
            "a",
            "b",
            "c",
            "d",
            F.expr("a + b + c + d").alias("n"),
            F.expr("(a * d * 1000000000L) div (a + b + c + d)").alias(
                "ad_nano"
            ),
            F.expr("(b * c * 1000000000L) div (a + b + c + d)").alias(
                "bc_nano"
            ),
            F.expr(
                "((a + b) * (a + c) * 1000000000L) div (a + b + c + d)"
            ).alias("e_nano"),
            # V factored as two milli-floored quotients (m1·m2·1e3 div
            # (n-1)): the single-expression form multiplies four cell
            # products by 1e9 before dividing and overflows int64 at
            # sf0.1 already. The factored fixed-point IS the operator
            # definition — the oracle and the test mirror it exactly.
            F.expr(
                "((((a + b) * (c + d) * 1000L) div (a + b + c + d))"
                " * (((a + c) * (b + d) * 1000L) div (a + b + c + d))"
                " * 1000L) div (a + b + c + d - 1)"
            ).alias("v_nano"),
        )
    )
    agg = cells.agg(
        F.count("*").alias("n_strata"),
        F.sum("a").alias("sum_a"),
        F.sum("ad_nano").alias("sum_ad_nano"),
        F.sum("bc_nano").alias("sum_bc_nano"),
        F.sum("e_nano").alias("sum_e_nano"),
        F.sum("v_nano").alias("sum_v_nano"),
    )
    return agg.select(
        "n_strata",
        "sum_ad_nano",
        "sum_bc_nano",
        F.expr("(sum_ad_nano * 1000000L) div sum_bc_nano").alias("or_ppm"),
        F.round(
            F.expr(
                "pow(CAST(sum_a AS DOUBLE) - CAST(sum_e_nano AS DOUBLE) / 1.0e9, 2)"
                " / (CAST(sum_v_nano AS DOUBLE) / 1.0e9)"
            ),
            4,
        ).alias("mh_chi2"),
    )


_Q273_SQL = """
WITH cells AS (
  SELECT c.c_mktsegment,
         CAST(sum(CASE WHEN c.c_acctbal >= 0 AND e.event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN c.c_acctbal >= 0 AND e.event_type = 'view'
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN c.c_acctbal < 0 AND e.event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS BIGINT) AS c_,
         CAST(sum(CASE WHEN c.c_acctbal < 0 AND e.event_type = 'view'
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM events e
  JOIN customer c ON c.c_custkey = e.user_id
  WHERE e.event_type IN ('purchase', 'view')
  GROUP BY 1
), q AS (
  SELECT a, b, c_, d, a + b + c_ + d AS n,
         (a * d * 1000000000) // (a + b + c_ + d) AS ad_nano,
         (b * c_ * 1000000000) // (a + b + c_ + d) AS bc_nano,
         ((a + b) * (a + c_) * 1000000000) // (a + b + c_ + d) AS e_nano,
         ((((a + b) * (c_ + d) * 1000) // (a + b + c_ + d))
          * (((a + c_) * (b + d) * 1000) // (a + b + c_ + d))
          * 1000) // (a + b + c_ + d - 1) AS v_nano
  FROM cells
  WHERE a + b + c_ + d > 1
)
SELECT CAST(count(*) AS BIGINT) AS n_strata,
       CAST(sum(ad_nano) AS BIGINT) AS sum_ad_nano,
       CAST(sum(bc_nano) AS BIGINT) AS sum_bc_nano,
       CAST((sum(ad_nano) * 1000000) // sum(bc_nano) AS BIGINT) AS or_ppm,
       round(pow(CAST(sum(a) AS DOUBLE)
                 - CAST(sum(e_nano) AS DOUBLE) / 1.0e9, 2)
             / (CAST(sum(v_nano) AS DOUBLE) / 1.0e9), 4) AS mh_chi2
FROM q
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


def q285_srm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit for a hash-bucket A/B assignment:
    users split 50/50 by the engine-portable md5 hash, checked globally
    AND per market segment with a 1-df chi-square against the expected
    ratio — the guardrail every experimentation platform runs before
    trusting a treatment readout (a segment-level SRM reveals a biased
    assignment or a data loss path even when the global split looks
    clean).

    Exactness: counts are BIGINTs; each chi-square
    (a−b)²/(a+b) is ONE deterministic double chain per row.

    Shape at 100 TB: the assignment is a per-row projection on the
    customer dim; one grouped pass per level; events join the dim by
    broadcast to audit exposure counts too."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        (
            F.expr(
                "conv(substr(md5(concat('ab:', CAST(c_custkey AS STRING))),"
                " 1, 8), 16, 10) % 2"
            )
            == 0
        ).alias("is_a"),
    )
    ev = _t(spark, sf_dir, "events").select("user_id")
    exposed = ev.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("user_id"), "is_a")),
        "user_id",
    )
    chi = (
        "round(pow(CAST(a AS DOUBLE) - b, 2)"
        " / (CAST(a AS DOUBLE) + b), 4)"
    )

    def level(df, name_col, label):
        return df.groupBy(name_col).agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("b"),
        ).select(
            F.lit(label).alias("level"),
            F.col(name_col).cast("string").alias("segment"),
            "a",
            "b",
            F.expr(chi).alias("chi2_1df"),
            F.expr(f"{chi} > 3.8415").alias("srm_flag"),
        )

    out = (
        level(cust.withColumn("_all", F.lit("ALL")), "_all", "assignment")
        .unionByName(level(cust, "c_mktsegment", "assignment_by_segment"))
        .unionByName(
            level(exposed.withColumn("_all", F.lit("ALL")), "_all", "exposure")
        )
    )
    return out.orderBy("level", "segment")


_Q285_SQL = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         ('0x' || substr(md5('ab:' || CAST(c_custkey AS VARCHAR)), 1, 8))
           ::BIGINT % 2 = 0 AS is_a
  FROM customer
), exposed AS (
  SELECT e.user_id, c.is_a
  FROM events e JOIN cust c ON c.c_custkey = e.user_id
), lv AS (
  SELECT 'assignment' AS level, 'ALL' AS segment,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM cust
  UNION ALL
  SELECT 'assignment_by_segment', c_mktsegment,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
  FROM cust GROUP BY c_mktsegment
  UNION ALL
  SELECT 'exposure', 'ALL',
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
  FROM exposed
)
SELECT level, segment, a, b,
       round(pow(CAST(a AS DOUBLE) - b, 2) / (CAST(a AS DOUBLE) + b), 4)
         AS chi2_1df,
       round(pow(CAST(a AS DOUBLE) - b, 2) / (CAST(a AS DOUBLE) + b), 4)
         > 3.8415 AS srm_flag
FROM lv
ORDER BY level, segment
"""


def q286_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the per-user event value metric:
    pre-period spend (first half of the date range, by epoch-micros
    midpoint — the q30 unix_micros ≡ epoch_us idiom) as the covariate
    for post-period spend; θ = cov(pre, post)/var(pre) and the achieved
    variance reduction ρ² — the experimentation-platform primitive that
    pairs with the q285 SRM guardrail (same assignment hash) to shrink
    A/B confidence intervals without touching the mean.

    Exactness: per-user pre/post sums are exact BIGINT cents; the six
    population moments are exact; θ, ρ², and the variances are single
    deterministic double chains over them (q248 discipline).
    Magnitude audit: per-user cents ~1e7 ⇒ pre² ~1e14, so the BIGINT
    Σpre² would wrap at ~1e5 heavy users × 1e9 rows — the second-moment
    sums (sxx/sxy/syy) accumulate in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB) with the row-level product widened BEFORE multiplying;
    sx/sy stay BIGINT (safe to ~1e12 users). CAST→DOUBLE is exact
    below 2^53 (all driver scales).

    Shape at 100 TB: one grouped pass events→users (conditional sums,
    map-side combined), one 6-moment reduction."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    mm = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid")
    )
    per = (
        ev.crossJoin(F.broadcast(mm))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), F.col("cents"))
                  .otherwise(0)).alias("pre"),
            F.sum(F.when(F.col("us") >= F.col("mid"), F.col("cents"))
                  .otherwise(0)).alias("post"),
        )
    )
    mom = per.agg(
        F.count("*").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(F.expr("CAST(pre AS DECIMAL(38,0)) * pre")).alias("sxx"),
        F.sum(F.expr("CAST(pre AS DECIMAL(38,0)) * post")).alias("sxy"),
        F.sum(F.expr("CAST(post AS DECIMAL(38,0)) * post")).alias("syy"),
    )
    cov = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    varx = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    vary = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    return mom.select(
        F.col("n").alias("n_users"),
        F.round(F.expr("CAST(sy AS DOUBLE) / n / 100.0e0"), 4).alias(
            "mean_post"
        ),
        F.round(F.expr(f"{cov} / {varx}"), 6).alias("theta"),
        F.round(
            F.expr(f"{cov} * {cov} / ({varx} * {vary})"), 6
        ).alias("rho_sq"),
        F.round(
            F.expr(f"{vary} / (CAST(n AS DOUBLE) * n) / 10000.0e0"), 4
        ).alias("var_post"),
        F.round(
            F.expr(
                f"{vary} * (1.0e0 - {cov} * {cov} / ({varx} * {vary}))"
                " / (CAST(n AS DOUBLE) * n) / 10000.0e0"
            ),
            4,
        ).alias("var_adjusted"),
    )


_Q286_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), mm AS (
  SELECT (min(us) + max(us)) // 2 AS mid FROM ev
), per AS (
  SELECT user_id,
         CAST(sum(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT)
           AS pre,
         CAST(sum(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT)
           AS post
  FROM ev CROSS JOIN mm
  GROUP BY user_id
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pre) AS BIGINT) AS sx,
         CAST(sum(post) AS BIGINT) AS sy,
         CAST(sum(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS sxx,
         CAST(sum(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS sxy,
         CAST(sum(CAST(post AS HUGEINT) * post) AS HUGEINT) AS syy
  FROM per
)
SELECT n AS n_users,
       round(CAST(sy AS DOUBLE) / n / 100.0e0, 4) AS mean_post,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS theta,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS rho_sq,
       round((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * n) / 10000.0e0, 4) AS var_post,
       round((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             * (1.0e0
                - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             / (CAST(n AS DOUBLE) * n) / 10000.0e0, 4) AS var_adjusted
FROM mom
"""


def q289_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-style mix-shift decomposition of the period-over-period
    change in mean event value: for each market segment,
    Δ contribution = w₂·(m₂ − m₁)  [within-segment rate change]
                   + m₁·(w₂ − w₁)  [mix/composition change],
    whose sum across segments IS the global mean delta (exact
    identity) — the BI answer to "did the metric move because segments
    changed, or because the mix changed?".

    Exactness: per-(segment, period) sums are exact BIGINT cents; each
    within/mix term is one double chain over those integers floored to
    nano-cents pre-sum; the identity is pinned (within floor slack) in
    pytest.

    Shape at 100 TB: one broadcast dim join, one grouped pass to
    (segment, period) cells, a <=5-row decomposition."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    mm = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    cells = (
        ev.join(F.broadcast(cust), "user_id")
        .crossJoin(F.broadcast(mm))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), 1).otherwise(0)).alias(
                "n1"
            ),
            F.sum(F.when(F.col("us") < F.col("mid"), F.col("cents"))
                  .otherwise(0)).alias("s1"),
            F.sum(F.when(F.col("us") >= F.col("mid"), 1).otherwise(0)).alias(
                "n2"
            ),
            F.sum(F.when(F.col("us") >= F.col("mid"), F.col("cents"))
                  .otherwise(0)).alias("s2"),
        )
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    within = (
        "CAST(floor((CAST(n2 AS DOUBLE) / t2)"
        " * (CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1)"
        " * 1.0e9) AS BIGINT)"
    )
    mix = (
        "CAST(floor((CAST(s1 AS DOUBLE) / n1)"
        " * (CAST(n2 AS DOUBLE) / t2 - CAST(n1 AS DOUBLE) / t1)"
        " * 1.0e9) AS BIGINT)"
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "n1",
            "n2",
            F.round(F.expr("CAST(s1 AS DOUBLE) / n1 / 100.0e0"), 4).alias(
                "mean_1"
            ),
            F.round(F.expr("CAST(s2 AS DOUBLE) / n2 / 100.0e0"), 4).alias(
                "mean_2"
            ),
            F.expr(within).alias("within_nano"),
            F.expr(mix).alias("mix_nano"),
        )
        .orderBy("segment")
    )


_Q289_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), mm AS (
  SELECT (min(us) + max(us)) // 2 AS mid FROM ev
), cells AS (
  SELECT c.c_mktsegment,
         CAST(sum(CASE WHEN us < mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT) AS s2
  FROM ev
  JOIN customer c ON c.c_custkey = ev.user_id
  CROSS JOIN mm
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
  FROM cells
)
SELECT c_mktsegment AS segment, n1, n2,
       round(CAST(s1 AS DOUBLE) / n1 / 100.0e0, 4) AS mean_1,
       round(CAST(s2 AS DOUBLE) / n2 / 100.0e0, 4) AS mean_2,
       CAST(floor((CAST(n2 AS DOUBLE) / t2)
            * (CAST(s2 AS DOUBLE) / n2 - CAST(s1 AS DOUBLE) / n1)
            * 1.0e9) AS BIGINT) AS within_nano,
       CAST(floor((CAST(s1 AS DOUBLE) / n1)
            * (CAST(n2 AS DOUBLE) / t2 - CAST(n1 AS DOUBLE) / t1)
            * 1.0e9) AS BIGINT) AS mix_nano
FROM cells CROSS JOIN tot
WHERE n1 > 0 AND n2 > 0
ORDER BY segment
"""


def q291_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score intervals for the per-segment conversion rate
    (purchase / (purchase + view)) — the small-sample-safe interval the
    naive ±1.96·√(p(1−p)/n) Wald band gets wrong near 0/1, and the
    reporting layer on top of the q264/q273/q285 conversion family.

    Exactness: (k, n) are exact BIGINTs; the Wilson center and
    half-width are one deterministic double chain each over those
    integers with the z=1.96 literal spelled 1.96e0 (a bare decimal
    literal would be DECIMAL in SQL and change the chain).

    Shape at 100 TB: one broadcast dim join + one grouped pass; the
    interval math runs on <=5 segment rows."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("user_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    base = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("k"),
            F.count("*").alias("n"),
        )
    )
    z2 = "(1.96e0 * 1.96e0)"
    center = (
        f"(CAST(k AS DOUBLE) / n + {z2} / (2.0e0 * n))"
        f" / (1.0e0 + {z2} / n)"
    )
    half = (
        f"1.96e0 * sqrt((CAST(k AS DOUBLE) / n)"
        f" * (1.0e0 - CAST(k AS DOUBLE) / n) / n"
        f" + {z2} / (4.0e0 * CAST(n AS DOUBLE) * n))"
        f" / (1.0e0 + {z2} / n)"
    )
    return base.select(
        F.col("c_mktsegment").alias("segment"),
        "k",
        "n",
        F.round(F.expr("CAST(k AS DOUBLE) / n"), 4).alias("rate"),
        F.round(F.expr(f"{center} - {half}"), 4).alias("wilson_lo"),
        F.round(F.expr(f"{center} + {half}"), 4).alias("wilson_hi"),
    ).orderBy("segment")


def _q291_sql() -> str:
    z2 = "(1.96e0 * 1.96e0)"
    center = (
        f"(CAST(k AS DOUBLE) / n + {z2} / (2.0e0 * n))"
        f" / (1.0e0 + {z2} / n)"
    )
    half = (
        f"1.96e0 * sqrt((CAST(k AS DOUBLE) / n)"
        f" * (1.0e0 - CAST(k AS DOUBLE) / n) / n"
        f" + {z2} / (4.0e0 * CAST(n AS DOUBLE) * n))"
        f" / (1.0e0 + {z2} / n)"
    )
    return f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM events e
  JOIN customer c ON c.c_custkey = e.user_id
  WHERE e.event_type IN ('purchase', 'view')
  GROUP BY 1
)
SELECT segment, k, n,
       round(CAST(k AS DOUBLE) / n, 4) AS rate,
       round({center} - {half}, 4) AS wilson_lo,
       round({center} + {half}, 4) AS wilson_hi
FROM base
ORDER BY segment
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


def _aa_salted_cells(ev: DataFrame) -> DataFrame:
    """Shared q295/q304 salted-cells subplan: per-(salt, arm) exact
    moments for 20 independent md5-salted 50/50 user splits.

    Hash shape (round-9 optimization): ONE md5 digest per event row
    (``md5('aa:' || user_id)``) instead of one md5 per (row, salt) —
    salt k's arm assignment is the PARITY OF HEX DIGIT k+1 of that
    single digest. md5 output bits are independent, so the 20 splits
    remain independent 50/50 user splits, and both engines replay the
    identical digit-parity expression. This removes 19 of every 20
    md5-over-concat evaluations — the dominant cost of the old plan
    (the 20-salt explode and the map-side combine to 40 cells are
    unchanged, still one shuffle-free grouped pass)."""
    salted = (
        ev.select(
            "cents",
            F.expr("md5(concat('aa:', CAST(user_id AS STRING)))").alias(
                "dg"
            ),
        )
        .select(
            "cents",
            "dg",
            F.explode(F.array(*[F.lit(k) for k in range(20)])).alias("k"),
        )
        .select(
            "k",
            "cents",
            (
                F.expr("conv(substring(dg, k + 1, 1), 16, 10) % 2") == 0
            ).alias("is_a"),
        )
    )
    return salted.groupBy("k").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("is_a"), F.col("cents")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("is_a"),
                     F.expr("CAST(cents AS DECIMAL(38,0)) * cents"))
              .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("ssa"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("nb"),
        F.sum(F.when(F.col("is_a"), F.lit(0)).otherwise(F.col("cents")))
        .alias("sb"),
        F.sum(F.when(F.col("is_a"), F.lit(0).cast("decimal(38,0)"))
              .otherwise(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")))
        .alias("ssb"),
    )


_AA_SALTED_CELLS_SQL = """
WITH base AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         md5('aa:' || CAST(user_id AS VARCHAR)) AS dg
  FROM events
), salted AS (
  SELECT k.k, b.cents,
         ('0x' || substr(b.dg, k.k + 1, 1))::BIGINT % 2 = 0 AS is_a
  FROM base b
  CROSS JOIN (SELECT unnest(range(0, 20)) AS k) k
), cells AS (
  SELECT k,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN is_a THEN cents ELSE 0 END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN is_a THEN CAST(cents AS HUGEINT) * cents
                       ELSE 0 END) AS HUGEINT) AS ssa,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE cents END) AS BIGINT) AS sb,
         CAST(sum(CASE WHEN is_a THEN 0
                       ELSE CAST(cents AS HUGEINT) * cents END) AS HUGEINT)
           AS ssb
  FROM salted
  GROUP BY k
)
"""


def q295_aa_test_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A-test audit of the experimentation stack: 20 independent
    md5-salted 50/50 user splits, each scored with the Welch z on mean
    event value — under the null every split compares identical
    populations, so the |z| > 1.96 flag rate must sit near 5% (a hot
    spot here means the assignment hash or the variance estimator is
    broken, the meta-guardrail above q285's SRM and q241's t-test).

    Exactness: per-(salt, arm) moments are exact via one grouped pass
    over a 20-salt explode of ONE md5 digest per row (salt k = parity
    of hex digit k+1 — see ``_aa_salted_cells``); each z is a single
    double chain (q241's Welch form without the df, since n is
    large). Magnitude audit:
    cents ~ 1e4 so cents^2 ~ 1e8 — a BIGINT sum of squares wraps at
    ~1e11 rows, so ssa/ssb accumulate in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB), good to ~1e30 rows; sa/sb are plain BIGINT
    (safe to ~1e14 rows at 1e4 cents/row). The CAST(ss AS DOUBLE) in
    the z chain is exact below 2^53 (all driver scales); past that
    the <=2^-52 relative conversion seam is invisible at round(z,4).

    Shape at 100 TB: the explode multiplies the scan by the salt count
    but the aggregate combines map-side to 40 cells; everything after
    is a 40-row reduction."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    cells = _aa_salted_cells(ev)
    z = (
        "(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
        " / sqrt((CAST(ssa AS DOUBLE) / na"
        "         - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na))"
        "        / (na - 1.0e0)"
        "        + (CAST(ssb AS DOUBLE) / nb"
        "           - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb))"
        "          / (nb - 1.0e0))"
    )
    return cells.select(
        "k",
        "na",
        "nb",
        F.round(F.expr(z), 4).alias("z_welch"),
        F.expr(f"abs({z}) > 1.96e0").alias("false_flag"),
    ).orderBy("k")


def _q295_sql() -> str:
    z = (
        "(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
        " / sqrt((CAST(ssa AS DOUBLE) / na"
        "         - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na))"
        "        / (na - 1.0e0)"
        "        + (CAST(ssb AS DOUBLE) / nb"
        "           - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb))"
        "          / (nb - 1.0e0))"
    )
    return f"""
{_AA_SALTED_CELLS_SQL}
SELECT CAST(k AS BIGINT) AS k, na, nb,
       round({z}, 4) AS z_welch,
       abs({z}) > 1.96e0 AS false_flag
FROM cells
ORDER BY k
"""


def q296_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of market segment against the
    purchase outcome — the leakage-free categorical feature a
    train-time pipeline emits (a row never sees its own label:
    enc_i = (K_s − y_i)/(n_s − 1)). Since y is binary, every segment
    has exactly TWO encodings; the query emits that closed-form table
    plus the global prior used for unseen categories.

    Exactness: all-BIGINT — K, n per segment and the ppm encodings are
    nonnegative integer divisions; n_s >= 2 guarded.

    Shape at 100 TB: the per-row encoded table is a broadcast-dim join
    of this <=5-row lookup back onto the facts — the expensive part is
    one grouped pass, which is what this query materializes."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("user_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    base = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("k"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    prior = base.agg(
        F.expr("(sum(k) * 1000000L) div sum(n)").alias("prior_ppm")
    )
    return (
        base.crossJoin(F.broadcast(prior))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "k",
            "n",
            F.expr("(k * 1000000L) div (n - 1)").alias("enc_for_y0_ppm"),
            F.expr("((k - 1) * 1000000L) div (n - 1)").alias(
                "enc_for_y1_ppm"
            ),
            "prior_ppm",
        )
        .orderBy("segment")
    )


_Q296_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM events e
  JOIN customer c ON c.c_custkey = e.user_id
  WHERE e.event_type IN ('purchase', 'view')
  GROUP BY 1
  HAVING count(*) >= 2
), prior AS (
  SELECT CAST((sum(k) * 1000000) // sum(n) AS BIGINT) AS prior_ppm
  FROM base
)
SELECT segment, k, n,
       CAST((k * 1000000) // (n - 1) AS BIGINT) AS enc_for_y0_ppm,
       CAST(((k - 1) * 1000000) // (n - 1) AS BIGINT) AS enc_for_y1_ppm,
       prior_ppm
FROM base CROSS JOIN prior
ORDER BY segment
"""


def q297_transition_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-dynamics drift: per-user event-type transition counts
    in the first vs second half of the date range, tested cell-by-cell
    with the 2-sample homogeneity chi-square — the DYNAMICS complement
    to the value-distribution drift dials (PSI q192, Wasserstein q250):
    marginal rates can be stable while the transition structure moves.

    For each (prev, next) cell with half counts (a, b) and half totals
    (T1, T2), the chi-square term is (a·T2 − b·T1)²/((a+b)·T1·T2) —
    computed as one double chain over exact BIGINTs and nano-floored
    before the cross-cell sum; df = live cells − 1 reported alongside.

    Shape at 100 TB: one lag window per user (the sessionization
    shuffle), one grouped pass into <=50 cells, a bounded reduction."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
    )
    mm = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .crossJoin(F.broadcast(mm))
        .groupBy("prev", F.col("event_type").alias("nxt"))
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), 1).otherwise(0)).alias(
                "a"
            ),
            F.sum(F.when(F.col("us") >= F.col("mid"), 1).otherwise(0)).alias(
                "b"
            ),
        )
    )
    tot = trans.agg(F.sum("a").alias("t1"), F.sum("b").alias("t2"))
    term = (
        "CAST(floor((CAST(a AS DOUBLE) * t2 - CAST(b AS DOUBLE) * t1)"
        " * (CAST(a AS DOUBLE) * t2 - CAST(b AS DOUBLE) * t1)"
        " / ((CAST(a AS DOUBLE) + b) * t1 * t2) * 1.0e9) AS BIGINT)"
    )
    agg = (
        trans.crossJoin(F.broadcast(tot))
        .filter(F.expr("a + b > 0"))
        .agg(
            F.count("*").alias("live_cells"),
            F.sum(F.expr(term)).alias("chi2_sum_nano"),
            F.max("t1").alias("n_first_half"),
            F.max("t2").alias("n_second_half"),
        )
    )
    return agg.select(
        "live_cells",
        (F.col("live_cells") - 1).alias("df"),
        "n_first_half",
        "n_second_half",
        "chi2_sum_nano",
        F.round(F.col("chi2_sum_nano").cast("double") / 1e9, 4).alias(
            "chi2"
        ),
    )


_Q297_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us FROM events
), mm AS (
  SELECT (min(us) + max(us)) // 2 AS mid FROM ev
), lagged AS (
  SELECT user_id, event_type AS nxt, us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM ev
), trans AS (
  SELECT prev, nxt,
         CAST(sum(CASE WHEN us < mid THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM lagged CROSS JOIN mm
  WHERE prev IS NOT NULL
  GROUP BY prev, nxt
), tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS t1, CAST(sum(b) AS BIGINT) AS t2
  FROM trans
)
SELECT CAST(count(*) AS BIGINT) AS live_cells,
       CAST(count(*) - 1 AS BIGINT) AS df,
       CAST(max(t1) AS BIGINT) AS n_first_half,
       CAST(max(t2) AS BIGINT) AS n_second_half,
       CAST(sum(CAST(floor(
           (CAST(a AS DOUBLE) * t2 - CAST(b AS DOUBLE) * t1)
           * (CAST(a AS DOUBLE) * t2 - CAST(b AS DOUBLE) * t1)
           / ((CAST(a AS DOUBLE) + b) * t1 * t2) * 1.0e9) AS BIGINT))
         AS BIGINT) AS chi2_sum_nano,
       round(CAST(sum(CAST(floor(
           (CAST(a AS DOUBLE) * t2 - CAST(b AS DOUBLE) * t1)
           * (CAST(a AS DOUBLE) * t2 - CAST(b AS DOUBLE) * t1)
           / ((CAST(a AS DOUBLE) + b) * t1 * t2) * 1.0e9) AS BIGINT))
         AS DOUBLE) / 1e9, 4) AS chi2
FROM trans CROSS JOIN tot
WHERE a + b > 0
"""


def q298_weekday_hour_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour 2-D seasonality: the 7×24 activity grid plus the
    independence chi-square (does hour-of-day shape DEPEND on weekday,
    or do the two margins factorize?) — the 2-D upgrade of q217's
    1-D seasonal indices that decides whether a capacity plan needs a
    full weekly-hourly matrix or two independent profiles.

    Exactness: cell/margin counts are BIGINTs; each chi term
    (c·N − r·k)²/(r·k·N) is one double chain nano-floored pre-sum.
    dow/hour come from date_part-compatible extracts (UTC session).

    Output: the top-10 over/under-loaded cells by |deviation| plus the
    grid-level chi-square repeated — one bounded relation, two grouped
    passes at corpus scale."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("CAST(dayofweek(ts) AS INT)").alias("dow"),
        F.expr("CAST(hour(ts) AS INT)").alias("hr"),
    )
    cells = ev.groupBy("dow", "hr").agg(F.count("*").alias("c"))
    rows_ = cells.groupBy("dow").agg(F.sum("c").alias("r"))
    cols = cells.groupBy("hr").agg(F.sum("c").alias("k"))
    tot = cells.agg(F.sum("c").alias("n"))
    term = (
        "CAST(floor((CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)"
        " * (CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)"
        " / (CAST(r AS DOUBLE) * k * n) * 1.0e9 / n) AS BIGINT)"
    )
    dev = (
        "(CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)"
        " / (CAST(r AS DOUBLE) * k)"
    )
    joined = (
        cells.join(rows_, "dow")
        .join(cols, "hr")
        .crossJoin(F.broadcast(tot))
        .localCheckpoint(eager=True)
    )
    chi = joined.agg(
        F.sum(F.expr(term)).alias("chi2_sum_nano"),
        F.count("*").alias("live_cells"),
    )
    return (
        joined.select(
            "dow",
            "hr",
            "c",
            F.round(F.expr(dev), 4).alias("load_vs_expected"),
            F.expr(f"abs({dev})").alias("_a"),
        )
        .orderBy(F.col("_a").desc(), "dow", "hr")
        .limit(10)
        .crossJoin(F.broadcast(chi))
        .select(
            "dow",
            "hr",
            "c",
            "load_vs_expected",
            "live_cells",
            F.round(
                F.col("chi2_sum_nano").cast("double") / 1e9, 4
            ).alias("chi2"),
        )
        .orderBy(F.col("load_vs_expected").desc(), "dow", "hr")
    )


_Q298_SQL = """
WITH ev AS (
  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
         CAST(hour(ts) AS INTEGER) AS hr
  FROM events
), cells AS (
  SELECT dow, hr, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2
), rows_ AS (
  SELECT dow, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY dow
), cols AS (
  SELECT hr, CAST(sum(c) AS BIGINT) AS k FROM cells GROUP BY hr
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM cells
), joined AS (
  SELECT cells.dow, cells.hr, c, r, k, n
  FROM cells
  JOIN rows_ USING (dow)
  JOIN cols USING (hr)
  CROSS JOIN tot
), chi AS (
  SELECT CAST(sum(CAST(floor(
           (CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)
           * (CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)
           / (CAST(r AS DOUBLE) * k * n) * 1.0e9 / n) AS BIGINT)) AS BIGINT)
           AS chi2_sum_nano,
         CAST(count(*) AS BIGINT) AS live_cells
  FROM joined
), top AS (
  SELECT dow, hr, c,
         round((CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)
               / (CAST(r AS DOUBLE) * k), 4) AS load_vs_expected
  FROM joined
  ORDER BY abs((CAST(c AS DOUBLE) * n - CAST(r AS DOUBLE) * k)
               / (CAST(r AS DOUBLE) * k)) DESC, dow, hr
  LIMIT 10
)
SELECT dow, hr, c, load_vs_expected, live_cells,
       round(CAST(chi2_sum_nano AS DOUBLE) / 1e9, 4) AS chi2
FROM top CROSS JOIN chi
ORDER BY load_vs_expected DESC, dow, hr
"""


def q299_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily event volume and
    daily active users — the pair-count completion of the concordance
    suite (Cliff's delta q269, ROC-AUC q272, Jonckheere q274): does
    MORE traffic come from MORE users, or from the same users firing
    harder? tau-b corrects both tie margins, which matters on count
    data where whole stretches of days share a volume.

    Exact concordance without any day-pair join: on the dense
    (x, y) count grid a suffix-in-y window within each x column gives
    s1 = #{y' > y | x}, then a suffix-in-x window within each y column
    gives G(x,y) = #{x' > x, y' > y}; the discordant side runs the
    mirrored prefix. C = Σ c·G and D = Σ c·L are exact integers, tie
    terms come from the two marginals, and
    tau_b = (C − D)/√((N₀−Tx)(N₀−Ty)) is one deterministic double
    chain over those integers.

    Magnitude audit: everything is CALENDAR-bounded — n days ⇒
    N₀ = n(n−1)/2 ≈ 6.7e6 at a 10-year corpus, the dense grid is at
    most n² ≈ 1.3e7 cells, and every count < 2^53 — BIGINT-safe with
    ~1e5× margin at any corpus size (day count, not row count, is the
    driver).

    Shape at 100 TB: ONE grouped corpus pass to the day relation;
    every window and join after runs on the bounded day/grid
    cardinality."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("x"),
        F.countDistinct("user_id").alias("y"),
    )
    cnt = daily.groupBy("x", "y").agg(F.count("*").alias("c"))
    grid = (
        cnt.select("x").distinct()
        .crossJoin(cnt.select("y").distinct())
        .join(cnt, ["x", "y"], "left")
        .select("x", "y", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_above_y = (
        W.partitionBy("x").orderBy("y").rowsBetween(1, W.unboundedFollowing)
    )
    w_below_y = (
        W.partitionBy("x").orderBy("y").rowsBetween(W.unboundedPreceding, -1)
    )
    s = grid.select(
        "x",
        "y",
        "c",
        F.coalesce(F.sum("c").over(w_above_y), F.lit(0)).alias("s_up"),
        F.coalesce(F.sum("c").over(w_below_y), F.lit(0)).alias("s_dn"),
    )
    w_above_x = (
        W.partitionBy("y").orderBy("x").rowsBetween(1, W.unboundedFollowing)
    )
    gl = s.select(
        "c",
        F.coalesce(F.sum("s_up").over(w_above_x), F.lit(0)).alias("g"),
        F.coalesce(F.sum("s_dn").over(w_above_x), F.lit(0)).alias("l"),
    )
    conc = gl.agg(
        F.sum(F.expr("c * g")).alias("cc"),
        F.sum(F.expr("c * l")).alias("dd"),
    )
    mx = daily.groupBy("x").agg(F.count("*").alias("n")).agg(
        F.sum("n").alias("n_days"),
        F.sum(F.expr("n * (n - 1)")).alias("tx2"),
    )
    my = daily.groupBy("y").agg(F.count("*").alias("n")).agg(
        F.sum(F.expr("n * (n - 1)")).alias("ty2"),
    )
    tau = (
        "CAST(cc - dd AS DOUBLE)"
        " / sqrt((CAST(n_days AS DOUBLE) * (n_days - 1) / 2.0e0"
        "         - CAST(tx2 AS DOUBLE) / 2.0e0)"
        "        * (CAST(n_days AS DOUBLE) * (n_days - 1) / 2.0e0"
        "           - CAST(ty2 AS DOUBLE) / 2.0e0))"
    )
    return (
        conc.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(my))
        .select(
            "n_days",
            F.col("cc").alias("concordant"),
            F.col("dd").alias("discordant"),
            F.expr("tx2 div 2").alias("ties_x"),
            F.expr("ty2 div 2").alias("ties_y"),
            F.round(F.expr(tau), 6).alias("tau_b"),
        )
    )


_Q299_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS x,
         CAST(count(DISTINCT user_id) AS BIGINT) AS y
  FROM events GROUP BY 1
), cnt AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY 1, 2
), grid AS (
  SELECT xs.x, ys.y, coalesce(cnt.c, 0) AS c
  FROM (SELECT DISTINCT x FROM cnt) xs
  CROSS JOIN (SELECT DISTINCT y FROM cnt) ys
  LEFT JOIN cnt ON cnt.x = xs.x AND cnt.y = ys.y
), s AS (
  SELECT x, y, c,
         coalesce(sum(c) OVER (PARTITION BY x ORDER BY y
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS s_up,
         coalesce(sum(c) OVER (PARTITION BY x ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_dn
  FROM grid
), gl AS (
  SELECT c,
         coalesce(sum(s_up) OVER (PARTITION BY y ORDER BY x
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS g,
         coalesce(sum(s_dn) OVER (PARTITION BY y ORDER BY x
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS l
  FROM s
), conc AS (
  SELECT CAST(sum(c * g) AS BIGINT) AS cc,
         CAST(sum(c * l) AS BIGINT) AS dd
  FROM gl
), mx AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_days,
         CAST(sum(n * (n - 1)) AS BIGINT) AS tx2
  FROM (SELECT x, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY x)
), my AS (
  SELECT CAST(sum(n * (n - 1)) AS BIGINT) AS ty2
  FROM (SELECT y, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY y)
)
SELECT n_days,
       cc AS concordant,
       dd AS discordant,
       CAST(tx2 // 2 AS BIGINT) AS ties_x,
       CAST(ty2 // 2 AS BIGINT) AS ties_y,
       round(CAST(cc - dd AS DOUBLE)
             / sqrt((CAST(n_days AS DOUBLE) * (n_days - 1) / 2.0e0
                     - CAST(tx2 AS DOUBLE) / 2.0e0)
                    * (CAST(n_days AS DOUBLE) * (n_days - 1) / 2.0e0
                       - CAST(ty2 AS DOUBLE) / 2.0e0)), 6) AS tau_b
FROM conc CROSS JOIN mx CROSS JOIN my
"""


def q300_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily event-count series: the
    median over all C(n,2) pairwise slopes (y_j−y_i)/(t_j−t_i) — the
    breakdown-resistant complement to the OLS fits (q78/q267): a
    handful of outage days or traffic spikes move OLS but not the
    pairwise-slope median.

    Exactness: each slope is sign-split-floored to an exact nano
    BIGINT ((|dy|·1e9) div dt, negated for dy<0 — both engines floor
    NONNEGATIVE operands only, sidestepping the trunc-vs-floor
    divergence on negatives), and the median is picked from the
    slope-value COUNT TABLE by cumulative range (lower median at
    k = (P+1) div 2) — no global row_number over the pair stream.

    Magnitude audit: calendar-bounded — P = C(n,2) ≈ 6.7e6 pairs at
    10 years; |dy|·1e9 ≤ ~2.7e16 at 1e11 rows/3650 days. All BIGINT-
    safe by ≥100×; day count, not corpus rows, drives every relation.

    Shape at 100 TB: one grouped corpus pass to the zero-filled
    calendar series (q267's spine); the pair expansion is a self-join
    of that n-row relation (bounded n² stream), then count-table
    windows on the slope domain."""
    ev = _t(spark, sf_dir, "events")
    series = _calendar_series(ev)
    a = series.select(F.col("t").alias("t1"), F.col("y").alias("y1"))
    b = series.select(F.col("t").alias("t2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, F.col("t2") > F.col("t1"))
        .select(
            F.expr(
                "CASE WHEN y2 >= y1 THEN"
                " ((y2 - y1) * 1000000000L) div (t2 - t1)"
                " ELSE -(((y1 - y2) * 1000000000L) div (t2 - t1)) END"
            ).alias("s")
        )
        .groupBy("s")
        .agg(F.count("*").alias("c"))
    )
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, 0)
    cum = slopes.select(
        "s",
        (F.sum("c").over(w) - F.col("c")).alias("lo"),
        F.sum("c").over(w).alias("hi"),
    )
    tot = slopes.agg(F.sum("c").alias("p"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("lo") < F.expr("(p + 1) div 2"))
            & (F.expr("(p + 1) div 2") <= F.col("hi"))
        )
        .select(
            F.col("p").alias("n_pairs"),
            F.col("s").alias("median_slope_nano"),
        )
    )
    n = series.agg(F.count("*").alias("n_days"))
    return med.crossJoin(F.broadcast(n)).select(
        "n_days",
        "n_pairs",
        "median_slope_nano",
        F.round(F.col("median_slope_nano").cast("double") / 1e9, 4).alias(
            "slope_per_day"
        ),
    )


_Q300_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), slopes AS (
  SELECT CASE WHEN b.y >= a.y THEN
           ((b.y - a.y) * 1000000000) // (b.t - a.t)
         ELSE -(((a.y - b.y) * 1000000000) // (b.t - a.t)) END AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM series a JOIN series b ON b.t > a.t
  GROUP BY 1
), cum AS (
  SELECT s, c,
         CAST(sum(c) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS BIGINT)
           AS lo,
         CAST(sum(c) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS hi
  FROM slopes
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS p FROM slopes
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM series
)
SELECT n_days,
       p AS n_pairs,
       CAST(s AS BIGINT) AS median_slope_nano,
       round(CAST(s AS DOUBLE) / 1e9, 4) AS slope_per_day
FROM cum CROSS JOIN tot CROSS JOIN n
WHERE lo < (p + 1) // 2 AND (p + 1) // 2 <= hi
"""


def q301_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily event-count
    series: S = #(later day higher) − #(later day lower) over all
    C(n,2) time-ordered pairs, with the tie-corrected variance and the
    continuity-corrected z — the NONPARAMETRIC significance companion
    to the Theil-Sen slope (q300): q300 says how steep, this says
    whether the monotone trend is real.

    Exact concordance without a pair join: time indices are unique, so
    S = C − D from the q299 dense-grid dominance counts on (t, y) —
    suffix-in-y within each t column, then suffix-in-t within each y
    column. Var(S)·18 = n(n−1)(2n+5) − Σ t_k(t_k−1)(2t_k+5) over
    value-tie groups stays an exact BIGINT; z is one double chain with
    the ±1 continuity correction sign-split on the exact S.

    Magnitude audit: calendar-bounded — S ≤ C(n,2) ≈ 6.7e6 and
    var18 ≤ ~2n³ ≈ 1e11 at 10 years; BIGINT-safe by ~1e7×.

    Shape at 100 TB: one grouped corpus pass to the zero-filled
    calendar; two windows over the ≤n² dense grid."""
    ev = _t(spark, sf_dir, "events")
    series = _calendar_series(ev, pin_series=False)
    cnt = series.groupBy("t", "y").agg(F.count("*").alias("c"))
    grid = (
        cnt.select("t").distinct()
        .crossJoin(cnt.select("y").distinct())
        .join(cnt, ["t", "y"], "left")
        .select("t", "y", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_up = W.partitionBy("t").orderBy("y").rowsBetween(1, W.unboundedFollowing)
    w_dn = (
        W.partitionBy("t").orderBy("y").rowsBetween(W.unboundedPreceding, -1)
    )
    s1 = grid.select(
        "t",
        "y",
        "c",
        F.coalesce(F.sum("c").over(w_up), F.lit(0)).alias("s_up"),
        F.coalesce(F.sum("c").over(w_dn), F.lit(0)).alias("s_dn"),
    )
    w_t = W.partitionBy("y").orderBy("t").rowsBetween(1, W.unboundedFollowing)
    gl = s1.select(
        "c",
        F.coalesce(F.sum("s_up").over(w_t), F.lit(0)).alias("g"),
        F.coalesce(F.sum("s_dn").over(w_t), F.lit(0)).alias("l"),
    )
    conc = gl.agg(
        F.sum(F.expr("c * g")).alias("cc"),
        F.sum(F.expr("c * l")).alias("dd"),
    )
    mom = series.groupBy("y").agg(F.count("*").alias("n")).agg(
        F.sum("n").alias("nd"),
        F.sum(F.expr("n * (n - 1) * (2 * n + 5)")).alias("tsum"),
    )
    z = (
        "CASE WHEN cc > dd THEN (CAST(cc - dd AS DOUBLE) - 1.0e0)"
        " / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)"
        "         - CAST(tsum AS DOUBLE)) / 18.0e0)"
        " WHEN cc < dd THEN (CAST(cc - dd AS DOUBLE) + 1.0e0)"
        " / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)"
        "         - CAST(tsum AS DOUBLE)) / 18.0e0)"
        " ELSE 0.0e0 END"
    )
    return conc.crossJoin(F.broadcast(mom)).select(
        F.col("nd").alias("n_days"),
        F.expr("cc - dd").alias("s_stat"),
        F.expr(
            "nd * (nd - 1) * (2 * nd + 5) - tsum"
        ).alias("var18"),
        F.round(F.expr(z), 4).alias("z_mk"),
        F.expr(
            f"CASE WHEN ({z}) > 1.96e0 THEN 'increasing'"
            f" WHEN ({z}) < -1.96e0 THEN 'decreasing'"
            " ELSE 'no trend' END"
        ).alias("trend"),
    )


_Q301_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), cnt AS (
  SELECT t, y, CAST(count(*) AS BIGINT) AS c FROM series GROUP BY 1, 2
), grid AS (
  SELECT ts_.t, ys.y, coalesce(cnt.c, 0) AS c
  FROM (SELECT DISTINCT t FROM cnt) ts_
  CROSS JOIN (SELECT DISTINCT y FROM cnt) ys
  LEFT JOIN cnt ON cnt.t = ts_.t AND cnt.y = ys.y
), s1 AS (
  SELECT t, y, c,
         coalesce(sum(c) OVER (PARTITION BY t ORDER BY y
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS s_up,
         coalesce(sum(c) OVER (PARTITION BY t ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_dn
  FROM grid
), gl AS (
  SELECT c,
         coalesce(sum(s_up) OVER (PARTITION BY y ORDER BY t
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS g,
         coalesce(sum(s_dn) OVER (PARTITION BY y ORDER BY t
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS l
  FROM s1
), conc AS (
  SELECT CAST(sum(c * g) AS BIGINT) AS cc,
         CAST(sum(c * l) AS BIGINT) AS dd
  FROM gl
), mom AS (
  SELECT CAST(sum(n) AS BIGINT) AS nd,
         CAST(sum(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS tsum
  FROM (SELECT y, CAST(count(*) AS BIGINT) AS n FROM series GROUP BY y)
)
SELECT nd AS n_days,
       CAST(cc - dd AS BIGINT) AS s_stat,
       CAST(nd * (nd - 1) * (2 * nd + 5) - tsum AS BIGINT) AS var18,
       round(CASE WHEN cc > dd THEN (CAST(cc - dd AS DOUBLE) - 1.0e0)
               / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)
                       - CAST(tsum AS DOUBLE)) / 18.0e0)
             WHEN cc < dd THEN (CAST(cc - dd AS DOUBLE) + 1.0e0)
               / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)
                       - CAST(tsum AS DOUBLE)) / 18.0e0)
             ELSE 0.0e0 END, 4) AS z_mk,
       CASE WHEN (CASE WHEN cc > dd THEN (CAST(cc - dd AS DOUBLE) - 1.0e0)
               / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)
                       - CAST(tsum AS DOUBLE)) / 18.0e0)
             WHEN cc < dd THEN (CAST(cc - dd AS DOUBLE) + 1.0e0)
               / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)
                       - CAST(tsum AS DOUBLE)) / 18.0e0)
             ELSE 0.0e0 END) > 1.96e0 THEN 'increasing'
            WHEN (CASE WHEN cc > dd THEN (CAST(cc - dd AS DOUBLE) - 1.0e0)
               / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)
                       - CAST(tsum AS DOUBLE)) / 18.0e0)
             WHEN cc < dd THEN (CAST(cc - dd AS DOUBLE) + 1.0e0)
               / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2.0e0 * nd + 5.0e0)
                       - CAST(tsum AS DOUBLE)) / 18.0e0)
             ELSE 0.0e0 END) < -1.96e0 THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM conc CROSS JOIN mom
"""


def q304_bh_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the q295 A/A-test family:
    the 20 salted-split Welch z-scores become conservative
    Hoeffding-bound p-values p = min(1, 2·exp(−z²/2)), ranked
    ascending, and BH at q=0.05 marks p_(k) ≤ q·k/m — the
    multiple-testing guardrail the experimentation tier needs once it
    runs whole FAMILIES of tests (q295 audits the per-test rate; this
    audits the family-wise procedure. Under the null, rejections
    should be rare).

    Exactness: each z is the q295 exact-moment double chain; the
    bound p is one exp chain (exp is a correctly-rounded seam, both
    engines evaluate the identical expression) floored to p_nano
    BEFORE any comparison; rank ties break on the salt id; and the BH
    comparison p_nano·m ≤ 5e7·k·(1e9/1e9) runs as EXACT integer
    cross-multiplication (q·1e9 = 5e7·... with m=20:
    p_nano·20 ≤ 1_000_000_000·k·0.05·20/20 → p_nano·20 ≤ 5e7·20·k/m
    = 5e7·k), never float division. The rejection set is all ranks ≤
    max passing k (the BH step-up), via one window max.

    Shape at 100 TB: the q295 shape (``_aa_salted_cells``: one md5
    digest per row, 20-salt exploded grouped pass to 40 cells);
    everything after is a 20-row relation."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    cells = _aa_salted_cells(ev)
    z = (
        "(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
        " / sqrt((CAST(ssa AS DOUBLE) / na"
        "         - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na))"
        "        / (na - 1.0e0)"
        "        + (CAST(ssb AS DOUBLE) / nb"
        "           - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb))"
        "          / (nb - 1.0e0))"
    )
    # Degenerate splits (singleton arm, or BOTH arms zero-variance —
    # decided by EXACT integer moment identities, never by comparing a
    # float to 0) have no defined z: p = 1, never rejected. The guard
    # keeps the ANSI divide-by-zero out of the CASE's taken branch.
    degenerate = (
        "(na <= 1 OR nb <= 1 OR"
        " (ssa * na = CAST(sa AS DECIMAL(38,0)) * sa"
        "  AND ssb * nb = CAST(sb AS DECIMAL(38,0)) * sb))"
    )
    p_nano = (
        f"CASE WHEN {degenerate} THEN 1000000000L"
        f" ELSE CAST(floor(least(2.0e0 * exp(-(({z}) * ({z})) / 2.0e0),"
        " 1.0e0) * 1e9) AS BIGINT) END"
    )
    scored = cells.select("k", F.expr(p_nano).alias("p_nano"))
    w = W.orderBy("p_nano", "k")
    ranked = scored.select(
        "k", "p_nano", F.row_number().over(w).alias("rank")
    ).withColumn(
        "bh_pass", F.expr("p_nano * 20 <= 50000000 * rank")
    )
    wmax = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ranked.select(
        "k",
        "p_nano",
        "rank",
        "bh_pass",
        (
            F.col("rank")
            <= F.coalesce(
                F.max(F.when(F.col("bh_pass"), F.col("rank"))).over(wmax),
                F.lit(0),
            )
        ).alias("rejected"),
    ).orderBy("rank")


def _q304_sql() -> str:
    z = (
        "(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
        " / sqrt((CAST(ssa AS DOUBLE) / na"
        "         - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na))"
        "        / (na - 1.0e0)"
        "        + (CAST(ssb AS DOUBLE) / nb"
        "           - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb))"
        "          / (nb - 1.0e0))"
    )
    return f"""
{_AA_SALTED_CELLS_SQL.rstrip()}, scored AS (
  SELECT CAST(k AS BIGINT) AS k,
         CASE WHEN na <= 1 OR nb <= 1 OR
                   (ssa * na = CAST(sa AS HUGEINT) * sa
                    AND ssb * nb = CAST(sb AS HUGEINT) * sb)
              THEN 1000000000
              ELSE CAST(floor(least(2.0e0 * exp(-(({z}) * ({z})) / 2.0e0),
                   1.0e0) * 1e9) AS BIGINT) END AS p_nano
  FROM cells
), ranked AS (
  SELECT k, p_nano,
         CAST(row_number() OVER (ORDER BY p_nano, k) AS BIGINT) AS rank,
         p_nano * 20 <= 50000000 * row_number() OVER (ORDER BY p_nano, k)
           AS bh_pass
  FROM scored
)
SELECT k, p_nano, rank, bh_pass,
       rank <= coalesce(max(CASE WHEN bh_pass THEN rank END) OVER (), 0)
         AS rejected
FROM ranked
ORDER BY rank
"""


def q306_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient and mean absolute difference of per-user spend
    — the concentration audit that says whether corpus value (or, run
    on token counts, training data) is spread across users or piled on
    a head; the inequality-curve companion to the skew report (q114)
    and RFM segments (q180).

    Exact pair-free arithmetic: on the spend value-count table,
    Σᵢⱼ|xᵢ−xⱼ| = 2·Σ_v c_v·(v·N₍₎ − S₍₎) with N₍₎/S₍₎ the
    below-v cumulative count/sum — two windows over the bounded
    distinct-value domain (cents-quantized), never a user-pair join.
    Gini = T/(2n·Σx) and MD = T/(n(n−1)) are nonnegative integer
    divisions to ppm/milli.

    Magnitude audit: T ~ N²·x̄ wraps BIGINT at ~3e5 users — every
    product and T run in DECIMAL(38,0)/HUGEINT (T·1e6 ≤ ~1e35 at 1e11
    users stays inside DECIMAL(38)); Σx is emitted as a STRING
    (q78/q233 rule). The cumulative S₍₎ also rides the wide type.

    Shape at 100 TB: one grouped corpus pass events→users, one
    grouped pass users→value counts, two windows on that bounded
    domain, a 1-row reduction."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    per = ev.groupBy("user_id").agg(F.sum("cents").alias("x"))
    vc = per.groupBy("x").agg(F.count("*").alias("c"))
    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    cum = vc.select(
        "x",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("nb"),
        F.coalesce(
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * c")).over(w),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sb"),
    )
    mom = cum.agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * c")).alias("sx"),
        F.sum(
            F.expr(
                "2 * CAST(c AS DECIMAL(38,0))"
                " * (CAST(x AS DECIMAL(38,0)) * nb - sb)"
            )
        ).alias("t"),
    )
    return mom.select(
        F.col("n").alias("n_users"),
        F.expr("CAST(sx AS STRING)").alias("total_cents"),
        F.expr(
            "(t * 1000000) div (2 * CAST(n AS DECIMAL(38,0)) * sx)"
        ).alias("gini_ppm"),
        F.expr(
            "(t * 1000) div (CAST(n AS DECIMAL(38,0)) * (n - 1))"
        ).alias("mad_cents_milli"),
        F.round(
            F.expr(
                "CAST((t * 1000000) div (2 * CAST(n AS DECIMAL(38,0)) * sx)"
                " AS DOUBLE) / 1e6"
            ),
            4,
        ).alias("gini"),
    )


_Q306_SQL = """
WITH per AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY user_id
), vc AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY x
), cum AS (
  SELECT x, c,
         coalesce(sum(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb,
         coalesce(sum(CAST(x AS HUGEINT) * c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(0 AS HUGEINT)) AS sb
  FROM vc
), mom AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(x AS HUGEINT) * c) AS HUGEINT) AS sx,
         CAST(sum(2 * CAST(c AS HUGEINT)
                  * (CAST(x AS HUGEINT) * nb - sb)) AS HUGEINT) AS t
  FROM cum
)
SELECT n AS n_users,
       CAST(sx AS VARCHAR) AS total_cents,
       CAST((t * 1000000) // (2 * CAST(n AS HUGEINT) * sx) AS BIGINT)
         AS gini_ppm,
       CAST((t * 1000) // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
         AS mad_cents_milli,
       round(CAST(CAST((t * 1000000) // (2 * CAST(n AS HUGEINT) * sx)
             AS BIGINT) AS DOUBLE) / 1e6, 4) AS gini
FROM mom
"""


def q307_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-corrected, via midranks) between
    daily event volume and daily active users — the rank-space
    counterpart of Kendall tau-b (q299): Pearson over midranks, which
    the count tables give EXACTLY without any global sort of the raw
    series.

    Exactness: the DOUBLED midrank 2·R(v) = 2·N₍below v₎ + c_v + 1 is
    an exact BIGINT off each marginal's cumulative window (doubling
    clears the half-integer; the constant scale cancels in the
    correlation); the five moments over (r2x, r2y) are exact; rho is
    one deterministic double chain.

    Magnitude audit: calendar-bounded — r2 ≤ 2n and Σr2² ≤ 4n³ ≈
    2e11 at 10 years; BIGINT-safe by ~4e7×.

    Shape at 100 TB: one grouped corpus pass to the day relation, two
    value-domain windows, two broadcast rank joins on the bounded day
    relation, a 1-row reduction."""
    ev = _t(spark, sf_dir, "events")
    # day-bounded and fanned into 3 branches (the join + both rank
    # derivations) — pin it so the corpus pass runs ONCE (the llm.py
    # pinning convention; unpinned, each ranks() replayed the scan).
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count("*").alias("x"),
            F.countDistinct("user_id").alias("y"),
        )
        .localCheckpoint(eager=True)
    )

    def ranks(col):
        vc = daily.groupBy(col).agg(F.count("*").alias("c"))
        w = W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        return vc.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(f"r2{col}"),
        )

    joined = daily.join(F.broadcast(ranks("x")), "x").join(
        F.broadcast(ranks("y")), "y"
    )
    mom = joined.agg(
        F.count("*").alias("n"),
        F.sum("r2x").alias("sx"),
        F.sum("r2y").alias("sy"),
        F.sum(F.expr("r2x * r2x")).alias("sxx"),
        F.sum(F.expr("r2y * r2y")).alias("syy"),
        F.sum(F.expr("r2x * r2y")).alias("sxy"),
    )
    rho = (
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        "        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
    )
    return mom.select(
        F.col("n").alias("n_days"),
        "sxy",
        F.round(F.expr(rho), 6).alias("spearman_rho"),
    )


_Q307_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS x,
         CAST(count(DISTINCT user_id) AS BIGINT) AS y
  FROM events GROUP BY 1
), rx AS (
  SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2x
  FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY x)
), ry AS (
  SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2y
  FROM (SELECT y, CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY y)
), joined AS (
  SELECT r2x, r2y FROM daily JOIN rx USING (x) JOIN ry USING (y)
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r2x) AS BIGINT) AS sx,
         CAST(sum(r2y) AS BIGINT) AS sy,
         CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
         CAST(sum(r2y * r2y) AS BIGINT) AS syy,
         CAST(sum(r2x * r2y) AS BIGINT) AS sxy
  FROM joined
)
SELECT n AS n_days, sxy,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS spearman_rho
FROM mom
"""


def q311_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed and 5%-winsorized means of event value — the
    outlier-robust location estimates that complement the MAD outlier
    gate (q162) and the raw percentile view (q41): trimming DROPS the
    tails, winsorizing CLIPS them to the cut values, and the gap
    between the three means is itself a tail-heaviness diagnostic.

    Exact order statistics without a global sort: on the cents
    value-count table with cumulative bounds (lo, hi], the in-trim
    mass of a value is max(0, min(hi, n−k) − max(lo, k)) — pure
    integer window arithmetic; the cut values v₍k+1₎ and v₍n−k₎ are
    range-selected (lo < r ≤ hi) like the q300 median. Both means are
    exact milli-cent integers ((S·1000) div count) with the dollar
    doubles derived from them.

    Magnitude audit: S ≤ N·cents ~ 1e15 at 1e11 events — the value
    products ride DECIMAL(38,0)/HUGEINT anyway (habit over audit).

    Shape at 100 TB: one grouped corpus pass to the value-count
    table, two windows on that bounded domain, a 1-row reduction."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v")
    )
    vc = ev.groupBy("v").agg(F.count("*").alias("c"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = vc.select(
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("lo"),
        F.sum("c").over(w).alias("hi"),
    )
    tot = vc.agg(F.sum("c").alias("n")).select(
        "n", F.expr("n div 20").alias("k")
    )
    joined = cum.crossJoin(F.broadcast(tot))
    agg = joined.agg(
        F.first("n").alias("n"),
        F.first("k").alias("k"),
        F.sum(
            F.expr(
                "CAST(v AS DECIMAL(38,0))"
                " * greatest(least(hi, n - k) - greatest(lo, k), 0)"
            )
        ).alias("s_trim"),
        F.max(
            F.when(
                (F.col("lo") < F.col("k") + 1)
                & (F.col("k") + 1 <= F.col("hi")),
                F.col("v"),
            )
        ).alias("v_lo"),
        F.max(
            F.when(
                (F.col("lo") < F.expr("n - k"))
                & (F.expr("n - k") <= F.col("hi")),
                F.col("v"),
            )
        ).alias("v_hi"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * c")).alias("s_all"),
    )
    return agg.select(
        "n",
        "k",
        "v_lo",
        "v_hi",
        F.expr("CAST((s_all * 1000) div n AS BIGINT)").alias(
            "mean_milli_cents"
        ),
        F.expr(
            "CAST((s_trim * 1000) div (n - 2 * k) AS BIGINT)"
        ).alias("trimmed_milli_cents"),
        F.expr(
            "CAST(((s_trim + CAST(k AS DECIMAL(38,0)) * v_lo"
            " + CAST(k AS DECIMAL(38,0)) * v_hi) * 1000) div n AS BIGINT)"
        ).alias("winsorized_milli_cents"),
        F.round(
            F.expr(
                "CAST(CAST((s_trim * 1000) div (n - 2 * k) AS BIGINT)"
                " AS DOUBLE) / 1e5"
            ),
            4,
        ).alias("trimmed_mean"),
    )


_Q311_SQL = """
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
), vc AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY v
), cum AS (
  SELECT v, c,
         CAST(sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS BIGINT)
           AS lo,
         CAST(sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS hi
  FROM vc
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c) // 20 AS BIGINT) AS k
  FROM vc
), agg AS (
  SELECT max(n) AS n, max(k) AS k,
         CAST(sum(CAST(v AS HUGEINT)
              * greatest(least(hi, n - k) - greatest(lo, k), 0)) AS HUGEINT)
           AS s_trim,
         max(CASE WHEN lo < k + 1 AND k + 1 <= hi THEN v END) AS v_lo,
         max(CASE WHEN lo < n - k AND n - k <= hi THEN v END) AS v_hi,
         CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s_all
  FROM cum CROSS JOIN tot
)
SELECT n, k, v_lo, v_hi,
       CAST((s_all * 1000) // n AS BIGINT) AS mean_milli_cents,
       CAST((s_trim * 1000) // (n - 2 * k) AS BIGINT)
         AS trimmed_milli_cents,
       CAST(((s_trim + CAST(k AS HUGEINT) * v_lo
              + CAST(k AS HUGEINT) * v_hi) * 1000) // n AS BIGINT)
         AS winsorized_milli_cents,
       round(CAST(CAST((s_trim * 1000) // (n - 2 * k) AS BIGINT)
             AS DOUBLE) / 1e5, 4) AS trimmed_mean
FROM agg
"""


def q316_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest on the daily event-count
    series: ŷ_t = y_{t−7} scored by MAE and by MASE (MAE over the
    naive-1 MAE — Hyndman's scale-free forecast error), the evaluation
    primitive that says whether q74's forecast beats the
    weekly-seasonal baseline at all.

    Exactness: both MAE numerators are exact BIGINT sums of |y_t −
    y_{t−lag}| off two lag self-joins of the zero-filled calendar
    (q267's spine), scored over the SAME day window (both lags
    present), so the denominators cancel and
    MASE_ppm = Σ|e₇|·1e6 div Σ|e₁| is one nonnegative integer
    division — never a float ratio of floats.

    Magnitude audit: Σ|e| ≤ n·max-daily ~ 3650·2.7e7 ≈ 1e11 at 1e11
    rows — BIGINT-safe by 1e7; the cross-multiplied MASE numerator
    rides DECIMAL(38,0)/HUGEINT out of habit.

    Shape at 100 TB: one grouped corpus pass to the calendar series;
    the lag joins are day-keyed self-joins of that bounded relation."""
    ev = _t(spark, sf_dir, "events")
    series = _calendar_series(ev)
    cur = series.select(F.col("t"), F.col("y"))
    lag = lambda k: series.select(
        (F.col("t") + k).alias("t"), F.col("y").alias(f"y{k}")
    )
    j = cur.join(lag(7), "t").join(lag(1), "t")
    agg = j.agg(
        F.count("*").alias("n_scored"),
        F.sum(F.expr("abs(y - y7)")).alias("sae7"),
        F.sum(F.expr("abs(y - y1)")).alias("sae1"),
    )
    n_tot = series.agg(F.count("*").alias("n_days"))
    return (
        agg.crossJoin(F.broadcast(n_tot))
        .select(
            "n_days",
            "n_scored",
            "sae7",
            "sae1",
            F.round(
                F.expr("CAST(sae7 AS DOUBLE) / n_scored"), 4
            ).alias("mae_seasonal"),
            F.expr(
                "CASE WHEN sae1 > 0 THEN"
                " CAST((CAST(sae7 AS DECIMAL(38,0)) * 1000000)"
                "      div CAST(sae1 AS DECIMAL(38,0)) AS BIGINT)"
                " END"
            ).alias("mase_ppm"),
        )
    )


_Q316_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS c FROM events GROUP BY 1
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM mm
), series AS (
  SELECT CAST(cal.d - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), j AS (
  SELECT cur.t, cur.y, l7.y AS y7, l1.y AS y1
  FROM series cur
  JOIN (SELECT t + 7 AS t, y FROM series) l7 ON l7.t = cur.t
  JOIN (SELECT t + 1 AS t, y FROM series) l1 ON l1.t = cur.t
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_scored,
         CAST(sum(abs(y - y7)) AS BIGINT) AS sae7,
         CAST(sum(abs(y - y1)) AS BIGINT) AS sae1
  FROM j
), n_tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM series
)
SELECT n_days, n_scored, sae7, sae1,
       round(CAST(sae7 AS DOUBLE) / n_scored, 4) AS mae_seasonal,
       CASE WHEN sae1 > 0 THEN
         CAST((CAST(sae7 AS HUGEINT) * 1000000)
              // CAST(sae1 AS HUGEINT) AS BIGINT)
       END AS mase_ppm
FROM agg CROSS JOIN n_tot
"""


_DUNN_CORE = """
WITH base AS (
  SELECT event_type AS g, CAST(round(value * 1000, 0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), cnt AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, v
), u AS (
  SELECT g, c,
         CAST(sum(c) OVER (PARTITION BY v) AS BIGINT) AS cv,
         CAST(coalesce(sum(c) OVER (ORDER BY v
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumx
  FROM cnt
), s AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(c AS {wide}) * (2 * cumx + cv + 1)) AS r2
  FROM u GROUP BY g
), ties AS (
  SELECT sum(CAST(cv AS {wide}) * cv * cv - cv) AS tt
  FROM (SELECT CAST(sum(c) AS BIGINT) AS cv FROM cnt GROUP BY v) tv
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn FROM s
), pairs AS (
  SELECT a.g AS g_a, b.g AS g_b, a.n AS n_a, b.n AS n_b,
         CAST(a.r2 * b.n - b.r2 * a.n AS BIGINT) AS a_num,
         CAST(CAST(nn AS {wide}) * (nn + 1) * (nn - 1) - tt AS BIGINT) AS vn,
         nn
  FROM s a JOIN s b ON a.g < b.g
  CROSS JOIN tot CROSS JOIN ties
)
SELECT g_a, g_b, n_a, n_b,
       CASE WHEN vn <= 0 THEN NULL ELSE
         round((CAST(a_num AS DOUBLE)
                / (2.0e0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
               / sqrt(CAST(vn AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
                      / (12.0e0 * CAST(nn - 1 AS DOUBLE)
                         * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 4)
       END AS dunn_z
FROM pairs
ORDER BY g_a, g_b
"""


def q341_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test: tie-corrected pairwise mean-rank z-scores
    between every event-type pair — the follow-up the Kruskal-Wallis
    omnibus (q234) requires before naming WHICH groups differ, on the
    exact same doubled-rank count-table grid (ranks never touch raw
    rows; 2R_g stays integral under ties).

    Exactness: the mean-rank difference is the exact integer cross-
    multiply a_num = r2_a·n_b − r2_b·n_a over 2n_a·n_b; the tie-
    corrected variance scale vn = N(N+1)(N−1) − ΣT is an exact wide
    integer; z is ONE double chain over BIGINT-cast scalars (int64 →
    double is correctly rounded in both engines — the q321 rule), with
    the all-tied degenerate (vn = 0) yielding NULL. Magnitude: a_num ~
    N²·n_g wraps the BIGINT cast at N ≈ 2e6 events — beyond that the
    cast fails loud under ANSI rather than wrapping.

    Shape at 100 TB: one grouped corpus pass to the (type, value-ms)
    count table; both windows and the k²-row pair join run on that
    bounded relation (k = |event types|)."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_DUNN_CORE.format(wide="DECIMAL(38,0)"))


_Q341_SQL = _DUNN_CORE.format(wide="HUGEINT")

def _q342_core(wide: str, idiv: str, str_t: str) -> str:
    D = 1_000_000_000

    def fsd(x: str, n: str, m: int) -> str:
        # floor(x*m/n) via base-1e9 two-limb long division — exact and
        # BIGINT-quotient-safe in BOTH engines (the _floor_scaled_div
        # identity, rendered per-engine through {idiv}).
        qhi = f"CAST((({x}) {idiv} {D}) {idiv} ({n}) AS {wide})"
        inner = (
            f"((CAST((({x}) {idiv} {D}) % ({n}) AS {wide}) * {D}"
            f" + ({x}) % {D}) {idiv} ({n}))"
        )
        q = f"({qhi} * {D} + {inner})"
        r = f"(({x}) - {q} * ({n}))"
        return f"({q} * {m} + ({r}) * {m} {idiv} ({n}))"

    a6 = fsd("s * s", "n", 1_000_000)
    b6 = fsd("stot * stot", "n", 1_000_000)
    w6 = fsd("ssb_d * (n - k)", "ssw_d * (k - 1)", 1_000_000)
    return f"""
WITH base AS (
  SELECT event_type AS g, CAST(round(value * 1000, 0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), cnt AS (
  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, v
), cum AS (
  SELECT g, v, c,
         CAST(sum(c) OVER (PARTITION BY g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cm
  FROM cnt
), gn AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY g
), med AS (
  SELECT cum.g,
         min(CASE WHEN cm >= (n + 1) {idiv} 2 THEN v END)
         + min(CASE WHEN cm >= (n + 2) {idiv} 2 THEN v END) AS m2
  FROM cum JOIN gn ON cum.g = gn.g
  GROUP BY cum.g
), dev AS (
  SELECT cnt.g, abs(2 * v - m2) AS d, c
  FROM cnt JOIN med ON cnt.g = med.g
), g2 AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(c AS {wide}) * d) AS s,
         sum(CAST(c AS {wide}) * (CAST(d AS {wide}) * d)) AS ss
  FROM g2src GROUP BY g
), ag AS (
  SELECT n, s, ss, {a6} AS a FROM g2
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS {wide}) AS stot,
         CAST(sum(a) AS {wide}) AS a,
         CAST(sum(ss) AS {wide}) * 1000000 AS ss6
  FROM ag
), fin AS (
  SELECT k, n,
         greatest(a - {b6}, CAST(0 AS {wide})) AS ssb_d,
         ss6 - a AS ssw_d
  FROM tot
), fm AS (
  SELECT k, n, ssb_d, ssw_d,
         CASE WHEN k > 1 AND ssw_d > 0 THEN CAST(least({w6},
              CAST(1000000000000000 AS {wide})) AS BIGINT) END AS w_micro
  FROM fin
)
SELECT k, n,
       CAST(ssb_d AS {str_t}) AS ssb_s,
       CAST(ssw_d AS {str_t}) AS ssw_s,
       w_micro,
       round(CAST(w_micro AS DOUBLE) / 1e6, 4) AS w_stat
FROM fm
""".replace("FROM g2src", "FROM dev")


def q342_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity of event `value` across event types — the
    heteroscedasticity check that decides whether the pooled-variance
    ANOVA (q233) or Welch (q241) is the right mean test, completing
    the location/scale test family (Mood q332 tests scale by ranks;
    this is the moment version, robust via the MEDIAN center).

    Exactness: values quantize to ms; each group's DOUBLED median m2
    (sum of the two middle order statistics) comes off the (g, v)
    count table by inclusive-cum position — integral under ties and
    even n — so deviations d = |2v − m2| are exact integers; the
    one-way ANOVA on d then reuses the q233 discipline verbatim
    (DECIMAL/HUGEINT power sums, two-limb floor-scaled divisions, SSB/
    SSW emitted as strings, W capped at 1e9 and NULL on degenerate
    k<2 / zero-SSW inputs). DECIMAL(38) ceiling ≈ 10¹² events.

    Shape at 100 TB: one grouped corpus pass to the (type, value-ms)
    count table; the per-group cum window, median join, and the k-row
    ANOVA all run on that bounded relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_q342_core("DECIMAL(38,0)", "div", "STRING"))


_Q342_SQL = _q342_core("HUGEINT", "//", "VARCHAR")

_CVM_CORE = """
WITH base AS (
  SELECT source, length(text) AS v FROM documents
  WHERE source IN ('src0', 'src1')
), cnt AS (
  SELECT v,
         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS c2
  FROM base GROUP BY v
), cum AS (
  SELECT v, c1, c2,
         CAST(sum(c1) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS a,
         CAST(sum(c2) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS b
  FROM cnt
), nm AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n, CAST(sum(c2) AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS n_values
  FROM cnt
), agg AS (
  SELECT max(n) AS n, max(m) AS m, max(n_values) AS n_values,
         sum(CAST(c1 + c2 AS {wide})
             * ((CAST(a AS {wide}) * m - CAST(b AS {wide}) * n)
                * (CAST(a AS {wide}) * m - CAST(b AS {wide}) * n)))
           AS snum
  FROM cum CROSS JOIN nm
)
SELECT 'src0' AS src_a, 'src1' AS src_b, n AS n_a, m AS n_b, n_values,
       CAST(CASE WHEN n > 0 AND m > 0 THEN
            snum * 1000000 {idiv}
            (CAST(n + m AS {wide}) * (n + m) * n * m)
       END AS BIGINT) AS t_micro,
       round(CAST(CAST(CASE WHEN n > 0 AND m > 0 THEN
            snum * 1000000 {idiv}
            (CAST(n + m AS {wide}) * (n + m) * n * m)
       END AS BIGINT) AS DOUBLE) / 1e6, 4) AS t_stat
FROM agg
"""


def q343_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between the src0 and src1
    doc-length distributions — the integrated-squared-ECDF-gap member
    of the two-sample family (KS q309 takes the max gap; CvM weighs the
    WHOLE curve, so a distribution that differs broadly but never
    sharply still registers).

    Exactness: T = Σ_v (c₁+c₂)·(A_v·m − B_v·n)² / (N²·n·m) over the
    pooled distinct values with INCLUSIVE cumulative counts A, B —
    every term is an exact wide integer (the ECDF gaps cross-multiplied
    to a common denominator), so t_micro is one exact floor division;
    no float anywhere before the final display scaling. Magnitude:
    the summand ~ (n·m)²·c wraps DECIMAL(38) around n ≈ 10⁷ docs per
    source — beyond that pre-reduce the count table (the q319 note).

    Shape at 100 TB: one grouped corpus pass to the pooled value count
    table (no join at all — both sources land in one relation with
    conditional counts); the window and the 1-row reduction run on
    that bounded relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(_CVM_CORE.format(wide="DECIMAL(38,0)", idiv="div"))


_Q343_SQL = _CVM_CORE.format(wide="HUGEINT", idiv="//")


_LB_CORE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  {cal_expr}
), series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc
  FROM series
), dd AS (
  SELECT d, CAST(n AS BIGINT) * c - sc AS dv
  FROM series CROSS JOIN tot
), den AS (
  SELECT sum(CAST(dv AS {wide}) * dv) AS den FROM dd
), lags AS (
  {lags_expr}
), nums AS (
  SELECT CAST(lags.k AS INTEGER) AS k,
         sum(CAST(a.dv AS {wide}) * b.dv) AS num,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM lags
  JOIN dd a ON true
  JOIN dd b ON b.d = {date_sub}
  GROUP BY lags.k
), rk AS (
  SELECT k, n_terms,
         CASE WHEN den = 0 THEN NULL ELSE
           CAST(CASE WHEN num >= 0
                THEN (num * 1000000000) {idiv} den
                ELSE -((-num * 1000000000) {idiv} den)
           END AS BIGINT)
         END AS r_nano
  FROM nums CROSS JOIN den
), terms AS (
  SELECT k, n_terms, r_nano,
         (CAST(r_nano AS {wide}) * r_nano)
           {idiv} ((SELECT max(n) FROM tot) - k) AS t_p
  FROM rk
)
SELECT max(t2.n) AS n_days,
       CAST(max(den.den) AS {str_t}) AS den_s,
       CAST(CASE WHEN max(den.den) = 0 THEN NULL ELSE
            (CAST(max(t2.n) AS {wide}) * (max(t2.n) + 2) * sum(t_p))
              {idiv} 1000000000000000
       END AS BIGINT) AS lb_milli
FROM terms CROSS JOIN tot t2 CROSS JOIN den
"""


def _lb_render(engine: str) -> str:
    if engine == "spark":
        return _LB_CORE.format(
            wide="DECIMAL(38,0)", idiv="div", str_t="STRING",
            cal_expr=(
                "SELECT explode(sequence(lo, hi, interval 1 day)) AS d"
                " FROM mm"
            ),
            lags_expr=(
                "SELECT explode(sequence(1, 7)) AS k"
            ),
            date_sub="date_add(a.d, -CAST(lags.k AS INT))",
        )
    return _LB_CORE.format(
        wide="HUGEINT", idiv="//", str_t="VARCHAR",
        cal_expr=(
            "SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))"
            " AS DATE) AS d FROM mm"
        ),
        lags_expr="SELECT unnest(range(1, 8)) AS k",
        date_sub="a.d - CAST(lags.k AS INTEGER)",
    )


def q344_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau statistic over lags 1..7 of the daily
    event-count series — the single-number whiteness test that
    aggregates the q188 per-lag autocorrelations (a seasonal or
    autocorrelated series fails it even when no single lag dominates).

    Exactness: the series is calendar-zero-filled (the q188 rule);
    deviations enter as the exact integers d_t = n·x_t − Σx (n times
    the centered value), so every lag's numerator Σ d_t·d_{t+k} and
    the shared denominator Σ d_t² are exact wide-integer sums;
    r_k is nano-floored with a SIGN-SPLIT division (Spark div
    truncates toward zero, DuckDB // floors — the r6 rule 25), each
    r²/(n−k) term floors exactly, and lb_milli = n(n+2)·Σterms div
    10¹⁵ is all-integer end to end — no float seam at all. The
    denominator is emitted as a string (exceeds int64 on long
    series). Constant series (den = 0) → NULL.

    Shape at 100 TB: the corpus collapses to ≤|days| rows in the
    first exchange; the 7 lag joins and the 1-row reduction run on
    the tiny daily relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_lb_render("spark"))


_Q344_SQL = _lb_render("duckdb")

def _q345_core(wide: str, idiv: str, cal_expr: str, date_sub: str) -> str:
    D = 1_000_000_000

    def fsd(x: str, n: str, m: int) -> str:
        qhi = f"CAST((({x}) {idiv} {D}) {idiv} ({n}) AS {wide})"
        inner = (
            f"((CAST((({x}) {idiv} {D}) % ({n}) AS {wide}) * {D}"
            f" + ({x}) % {D}) {idiv} ({n}))"
        )
        q = f"({qhi} * {D} + {inner})"
        r = f"(({x}) - {q} * ({n}))"
        return f"({q} * {m} + ({r}) * {m} {idiv} ({n}))"

    phi1 = fsd(
        f"abs(CAST(r1n AS {wide})) * ({D} - r2n)",
        f"CAST({D} - r1n AS {wide}) * ({D} + r1n)",
        1_000_000,
    )
    phi2 = fsd(
        f"abs(CAST(r2n AS {wide}) * {D} - CAST(r1n AS {wide}) * r1n)",
        f"CAST({D} - r1n AS {wide}) * ({D} + r1n)",
        1_000_000,
    )
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily
), cal AS (
  {cal_expr}
), series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc
  FROM series
), dd AS (
  SELECT d, CAST(n AS BIGINT) * c - sc AS dv
  FROM series CROSS JOIN tot
), den AS (
  SELECT sum(CAST(dv AS {wide}) * dv) AS den FROM dd
), nums AS (
  SELECT
    (SELECT sum(CAST(a.dv AS {wide}) * b.dv)
     FROM dd a JOIN dd b ON b.d = {date_sub.format(k=1)}) AS num1,
    (SELECT sum(CAST(a.dv AS {wide}) * b.dv)
     FROM dd a JOIN dd b ON b.d = {date_sub.format(k=2)}) AS num2
), rk AS (
  SELECT
    CASE WHEN den = 0 THEN NULL ELSE
      CAST(CASE WHEN num1 >= 0 THEN (num1 * {D}) {idiv} den
           ELSE -((-num1 * {D}) {idiv} den) END AS BIGINT)
    END AS r1n,
    CASE WHEN den = 0 THEN NULL ELSE
      CAST(CASE WHEN num2 >= 0 THEN (num2 * {D}) {idiv} den
           ELSE -((-num2 * {D}) {idiv} den) END AS BIGINT)
    END AS r2n
  FROM nums CROSS JOIN den
)
SELECT (SELECT max(n) FROM tot) AS n_days, r1n AS r1_nano, r2n AS r2_nano,
       CASE WHEN r1n IS NULL OR abs(r1n) >= {D} THEN NULL ELSE
         CAST(CASE WHEN r1n >= 0 THEN {phi1} ELSE -{phi1} END AS BIGINT)
       END AS phi1_micro,
       CASE WHEN r1n IS NULL OR abs(r1n) >= {D} THEN NULL ELSE
         CAST(CASE WHEN CAST(r2n AS {wide}) * {D}
                        - CAST(r1n AS {wide}) * r1n >= 0
              THEN {phi2} ELSE -{phi2} END AS BIGINT)
       END AS phi2_micro
FROM rk
"""


def q345_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule-Walker AR(2) fit of the daily event-count series — the
    autoregressive coefficients (φ₁, φ₂) behind the q188 ACF and the
    q74 forecast: φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) from
    the biased lag-1/lag-2 autocorrelations.

    Exactness: the series is calendar-zero-filled; deviations enter
    as exact integers d_t = n·x_t − Σx, so num₁, num₂ and the shared
    denominator are exact wide-integer sums; r₁, r₂ are nano-floored
    with sign-split divisions, and the φ's are computed FROM THE
    QUANTIZED r's in exact integer arithmetic (two-limb floor-scaled
    divisions with 1−r₁² factored as (10⁹−r₁)(10⁹+r₁)) — fully
    integer end to end, no float seam. |r₁| = 1 (degenerate
    perfectly-correlated series) → NULL φ's.

    Shape at 100 TB: the corpus collapses to ≤|days| rows in the
    first exchange; everything else runs on the tiny daily relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_q345_core(
        "DECIMAL(38,0)", "div",
        "SELECT explode(sequence(lo, hi, interval 1 day)) AS d FROM mm",
        "date_add(a.d, -{k})",
    ))


_Q345_SQL = _q345_core(
    "HUGEINT", "//",
    "SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)"
    " AS d FROM mm",
    "a.d - {k}",
)

def _q346_core(wide: str, idiv: str, ntok: str, ndis: str) -> str:
    D = 1_000_000_000

    def fsd(x: str, n: str, m: int) -> str:
        qhi = f"CAST((({x}) {idiv} {D}) {idiv} ({n}) AS {wide})"
        inner = (
            f"((CAST((({x}) {idiv} {D}) % ({n}) AS {wide}) * {D}"
            f" + ({x}) % {D}) {idiv} ({n}))"
        )
        q = f"({qhi} * {D} + {inner})"
        r = f"(({x}) - {q} * ({n}))"
        return f"({q} * {m} + ({r}) * {m} {idiv} ({n}))"

    kap = fsd(
        f"abs(3 * CAST(n_docs AS {wide}) * (ss - 3 * n_docs)"
        f" - 2 * (CAST(c0 AS {wide}) * c0 + CAST(c1 AS {wide}) * c1"
        f"        + CAST(c2 AS {wide}) * c2))",
        f"(18 * CAST(n_docs AS {wide}) * n_docs"
        f" - 2 * (CAST(c0 AS {wide}) * c0 + CAST(c1 AS {wide}) * c1"
        f"        + CAST(c2 AS {wide}) * c2))",
        1_000_000,
    )
    sgn = (
        f"(3 * CAST(n_docs AS {wide}) * (ss - 3 * n_docs)"
        f" - 2 * (CAST(c0 AS {wide}) * c0 + CAST(c1 AS {wide}) * c1"
        f"        + CAST(c2 AS {wide}) * c2))"
    )
    den0 = (
        f"(18 * CAST(n_docs AS {wide}) * n_docs"
        f" - 2 * (CAST(c0 AS {wide}) * c0 + CAST(c1 AS {wide}) * c1"
        f"        + CAST(c2 AS {wide}) * c2))"
    )
    return f"""
WITH rated AS (
  SELECT doc_id,
         CASE WHEN n_chars < 200 THEN 0
              WHEN n_chars < 400 THEN 1 ELSE 2 END AS cat_a,
         CASE WHEN {ntok} < 40 THEN 0
              WHEN {ntok} < 80 THEN 1 ELSE 2 END AS cat_b,
         CASE WHEN {ndis} < 30 THEN 0
              WHEN {ndis} < 60 THEN 1 ELSE 2 END AS cat_c
  FROM documents
), cells AS (
  SELECT doc_id,
         CAST((CASE WHEN cat_a = 0 THEN 1 ELSE 0 END)
            + (CASE WHEN cat_b = 0 THEN 1 ELSE 0 END)
            + (CASE WHEN cat_c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST((CASE WHEN cat_a = 1 THEN 1 ELSE 0 END)
            + (CASE WHEN cat_b = 1 THEN 1 ELSE 0 END)
            + (CASE WHEN cat_c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST((CASE WHEN cat_a = 2 THEN 1 ELSE 0 END)
            + (CASE WHEN cat_b = 2 THEN 1 ELSE 0 END)
            + (CASE WHEN cat_c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM rated
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n0 * n0 + n1 * n1 + n2 * n2) AS BIGINT) AS ss,
         CAST(sum(n0) AS BIGINT) AS c0,
         CAST(sum(n1) AS BIGINT) AS c1,
         CAST(sum(n2) AS BIGINT) AS c2
  FROM cells
)
SELECT n_docs, ss, c0, c1, c2,
       CASE WHEN {den0} = 0 THEN NULL ELSE
         CAST(CASE WHEN {sgn} >= 0 THEN {kap} ELSE -{kap} END AS BIGINT)
       END AS kappa_micro
FROM agg
"""


def q346_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE deterministic quality raters — the
    multi-rater chance-corrected agreement that generalizes the 2-rater
    Cohen's kappa pair (q185/q308): each document is independently
    bucketed into {short, medium, long} by three different signals
    (raw n_chars, token count, distinct-token count), and kappa
    measures their agreement beyond chance — the standard audit before
    trusting ensemble quality labels.

    Exactness: per-doc category counts n_ij are 0..3 integers; SS =
    ΣΣn_ij² and the category margins C_j are exact sums, and
    kappa = (P̄−P̄ₑ)/(1−P̄ₑ) clears denominators exactly to
    κ·10⁶ = floor((3N(SS−3N) − 2ΣC²)·10⁶ / (18N² − 2ΣC²)) via the
    two-limb floor-scaled division with a SIGN SPLIT (kappa can be
    negative) — fully integer, no float seam. Unanimous single-
    category degenerate (P̄ₑ = 1 → denominator 0) → NULL.

    Shape at 100 TB: one narrow corpus pass computing three per-row
    integers, then a single 1-row reduction — zero joins, zero
    windows, whole-stage-codegen throughout."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["documents"])
    tok = "size(filter(split(lower(text), '\\\\s+'), x -> x <> ''))"
    dis = ("size(array_distinct(filter(split(lower(text), '\\\\s+'),"
           " x -> x <> '')))")
    return spark.sql(_q346_core("DECIMAL(38,0)", "div", tok, dis))


_Q346_SQL = _q346_core(
    "HUGEINT", "//",
    "len(list_filter(string_split_regex(lower(text), '\\s+'),"
    " x -> x <> ''))",
    "len(list_distinct(list_filter(string_split_regex(lower(text),"
    " '\\s+'), x -> x <> '')))",
)

_PAGE_CORE = """
WITH cells AS (
  SELECT {day_expr} AS day, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), days AS (
  SELECT DISTINCT day FROM cells
), types AS (
  SELECT DISTINCT event_type FROM cells
), typ AS (
  SELECT event_type,
         CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS j
  FROM types
), grid AS (
  SELECT d.day, t.event_type, coalesce(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
), vc AS (
  SELECT day, c, CAST(count(*) AS BIGINT) AS t FROM grid GROUP BY day, c
), r2 AS (
  SELECT day, c,
         2 * coalesce(sum(t) OVER (PARTITION BY day ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + t + 1 AS r2
  FROM vc
), ranked AS (
  SELECT g.day, g.event_type, r2.r2
  FROM grid g JOIN r2 ON r2.day = g.day AND r2.c = g.c
), s2 AS (
  SELECT event_type, CAST(sum(r2) AS BIGINT) AS s2
  FROM ranked GROUP BY event_type
), nk AS (
  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k
  FROM grid
), l AS (
  SELECT CAST(sum(j * s2) AS BIGINT) AS l2
  FROM s2 JOIN typ ON s2.event_type = typ.event_type
)
SELECT n AS n_days, k AS k_types, l2,
       (n * k * (k + 1) * (k + 1)) {idiv} 2 AS e2,
       CASE WHEN k < 2 OR n < 1 THEN NULL ELSE
         round(CAST(l2 - (n * k * (k + 1) * (k + 1)) {idiv} 2 AS DOUBLE)
               / sqrt(CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                      * CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE)
                      * CAST(k * k - 1 AS DOUBLE) / 36.0e0), 4)
       END AS page_z
FROM l CROSS JOIN nk
"""


def q347_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test over day-blocked event-type ranks — the
    ORDERED alternative to the Friedman omnibus (q322), sibling of
    Jonckheere-Terpstra (q274, which orders groups in a pooled
    design): is there a monotone volume trend across the hypothesized
    (alphabetical, declared a priori) event-type ordering, judged
    against within-day ranks so day-level traffic swings cancel?

    Exactness: the same dense zero-filled grid and DOUBLED midranks
    as q322, so L2 = Σ_j j·2R_j is an exact BIGINT and the null mean
    E[L2] = n·k(k+1)²/2 is exactly integral (k(k+1) is even); z is
    ONE double chain over those exact integers with the classical
    no-ties variance n·k²(k+1)(k²−1)/36 (the tie-corrected omnibus
    lives in q322; Page's z is conventionally reported uncorrected).
    k<2 degenerates to NULL.

    Shape at 100 TB: one grouped corpus pass to the (day, type) count
    table; grid, rank windows, and the 1-row reduction run on
    calendar·|types|-bounded relations."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_PAGE_CORE.format(
        day_expr="unix_micros(ts) div 86400000000", idiv="div"
    ))


_Q347_SQL = _PAGE_CORE.format(day_expr="epoch_us(ts) // 86400000000",
                              idiv="//")

_COCHRANQ_CORE = """
WITH ev AS (
  SELECT user_id, event_type, {day_expr} AS day FROM events
), mx AS (
  SELECT max(day) AS dmax FROM ev
), pur AS (
  SELECT DISTINCT user_id, day
  FROM ev CROSS JOIN mx
  WHERE day > dmax - 7 AND event_type = 'purchase'
), ru AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS r FROM pur GROUP BY user_id
), cj AS (
  SELECT day, CAST(count(*) AS BIGINT) AS c FROM pur GROUP BY day
), days AS (
  SELECT {days_gen} AS day FROM mx
), cjz AS (
  SELECT days.day, coalesce(cj.c, 0) AS c
  FROM days LEFT JOIN cj ON days.day = cj.day
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS k_days
  FROM cjz
), agg AS (
  SELECT sum((7 * CAST(c AS {wide}) - t) * (7 * CAST(c AS {wide}) - t))
           AS dev2
  FROM cjz CROSS JOIN tot
), rr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
         coalesce(sum(CAST(r AS {wide}) * r), CAST(0 AS {wide})) AS r2
  FROM ru
)
SELECT k_days, n_blocks, t, CAST(r2 AS BIGINT) AS sum_r2,
       CASE WHEN 7 * CAST(t AS {wide}) - r2 = 0 THEN NULL ELSE
         CAST((6 * dev2 * 1000)
              {idiv} (7 * (7 * CAST(t AS {wide}) - r2)) AS BIGINT)
       END AS q_milli
FROM tot CROSS JOIN agg CROSS JOIN rr
"""


def q349_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test over the last 7 observed days: does the DAILY
    PROPENSITY TO PURCHASE differ across days, judged on the binary
    per-(user, day) purchased/not matrix — the binary-outcome member
    of the blocked-design family (Friedman q322 ranks counts, Page
    q347 orders them; Cochran's Q is Friedman specialized to 0/1 and
    McNemar's (q204) k-treatment generalization).

    Exactness: FULLY integer — with day totals C_j (users purchasing
    on day j), T = ΣC_j, and per-user totals R_u,
    Q = (k−1)·Σ_j(k·C_j − T)² / (k·(k·T − ΣR_u²)) clears every
    denominator exactly (k = 7); q_milli is one floor division, NULL
    when every purchasing user purchased on all 7 days (denominator
    0). All-zero blocks drop out of Q algebraically, so no dense
    user×day grid is materialized — the engine touches purchase pairs
    only. The 7-day spine is zero-filled (a no-purchase day is a real
    C_j = 0 column, not a dropped treatment).

    Shape at 100 TB: one pushed-window corpus pass to distinct
    (user, day) purchase pairs, two bounded groupings (≤|users| and
    exactly 7 rows), then 1-row arithmetic."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_COCHRANQ_CORE.format(
        day_expr="unix_micros(ts) div 86400000000",
        days_gen="explode(sequence(dmax - 6, dmax))",
        wide="DECIMAL(38,0)",
        idiv="div",
    ))


_Q349_SQL = _COCHRANQ_CORE.format(
    day_expr="epoch_us(ts) // 86400000000",
    days_gen="unnest(range(dmax - 6, dmax + 1))",
    wide="HUGEINT",
    idiv="//",
)


def _q351_core(wide: str, idiv: str, str_t: str) -> str:
    D = 1_000_000_000

    def fsd(x: str, n: str, m: int) -> str:
        qhi = f"CAST((({x}) {idiv} {D}) {idiv} ({n}) AS {wide})"
        inner = (
            f"((CAST((({x}) {idiv} {D}) % ({n}) AS {wide}) * {D}"
            f" + ({x}) % {D}) {idiv} ({n}))"
        )
        q = f"({qhi} * {D} + {inner})"
        r = f"(({x}) - {q} * ({n}))"
        return f"({q} * {m} + ({r}) * {m} {idiv} ({n}))"

    gam = fsd("abs(cc - dd)", "cc + dd", 1_000_000)
    som = fsd("abs(cc - dd)", "cc + dd + ty", 1_000_000)
    return f"""
WITH base AS (
  SELECT {{hour_expr}} AS x,
         CAST(round(value * 1000, 0) AS BIGINT) {idiv} 100000 AS y
  FROM events WHERE value IS NOT NULL
), cnt AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY x, y
), grid AS (
  SELECT xs.x, ys.y, coalesce(cnt.c, 0) AS c
  FROM (SELECT DISTINCT x FROM cnt) xs
  CROSS JOIN (SELECT DISTINCT y FROM cnt) ys
  LEFT JOIN cnt ON cnt.x = xs.x AND cnt.y = ys.y
), colsum AS (
  SELECT x, CAST(sum(c) AS BIGINT) AS nx FROM grid GROUP BY x
), pref AS (
  SELECT g.x, g.y, g.c,
         CAST(coalesce(sum(g.c) OVER (PARTITION BY g.x ORDER BY g.y
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cb_lt,
         cs.nx
  FROM grid g JOIN colsum cs ON g.x = cs.x
), lt AS (
  SELECT x, y, c,
         CAST(coalesce(sum(cb_lt) OVER (PARTITION BY y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_lt_lt,
         CAST(coalesce(sum(nx - cb_lt - c) OVER (PARTITION BY y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_lt_gt,
         CAST(coalesce(sum(c) OVER (PARTITION BY y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_lt_eq
  FROM pref
), agg AS (
  SELECT sum(CAST(c AS {wide}) * n_lt_lt) AS cc,
         sum(CAST(c AS {wide}) * n_lt_gt) AS dd,
         sum(CAST(c AS {wide}) * n_lt_eq) AS ty
  FROM lt
)
SELECT CAST(cc AS {str_t}) AS concordant,
       CAST(dd AS {str_t}) AS discordant,
       CAST(ty AS {str_t}) AS tied_y_only,
       CASE WHEN cc + dd = 0 THEN NULL ELSE
         CAST(CASE WHEN cc >= dd THEN {gam} ELSE -{gam} END AS BIGINT)
       END AS gamma_micro,
       CASE WHEN cc + dd + ty = 0 THEN NULL ELSE
         CAST(CASE WHEN cc >= dd THEN {som} ELSE -{som} END AS BIGINT)
       END AS somers_dyx_micro
FROM agg
"""


def q351_ordinal_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma and Somers' d_yx between HOUR OF DAY
    (ordered 0-23) and the event-value bucket — the ordinal-ordinal
    association pair that completes the association family (NMI q282
    is nominal, Spearman/Kendall q307/q299 are continuous-rank,
    Cramér's V q312 is nominal-effect-size): does spend level rise
    with the hour, counting concordant vs discordant pairs?

    Exact concordance without any pair join (the q274 2-D prefix-grid
    idiom on the dense (hour, bucket) count grid): C, D, and
    tied-on-bucket-only counts come from three windows over the
    bounded grid; gamma = (C−D)/(C+D) and d_yx = (C−D)/(C+D+T_Y)
    clear denominators exactly via sign-split two-limb floor-scaled
    divisions. Pair counts (~N²) accumulate in DECIMAL(38,0)/HUGEINT
    and are emitted as STRINGS (the q233 rule). All-tied degenerates
    → NULL.

    Shape at 100 TB: one grouped corpus pass to the ≤24·|buckets|
    grid; every window and the 1-row reduction run on that bounded
    relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        _q351_core("DECIMAL(38,0)", "div", "STRING").format(
            hour_expr="CAST((unix_micros(ts) div 3600000000) % 24 AS BIGINT)"
        )
    )


_Q351_SQL = _q351_core("HUGEINT", "//", "VARCHAR").format(
    hour_expr="CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)"
)

def _q352_core(wide: str, idiv: str) -> str:
    D = 1_000_000_000

    def fsd(x: str, n: str, m: int) -> str:
        qhi = f"CAST((({x}) {idiv} {D}) {idiv} ({n}) AS {wide})"
        inner = (
            f"((CAST((({x}) {idiv} {D}) % ({n}) AS {wide}) * {D}"
            f" + ({x}) % {D}) {idiv} ({n}))"
        )
        q = f"({qhi} * {D} + {inner})"
        r = f"(({x}) - {q} * ({n}))"
        return f"({q} * {m} + ({r}) * {m} {idiv} ({n}))"

    w6 = fsd("a_stat", "CAST(n AS {w}) * b_stat".replace("{w}", wide),
             1_000_000)
    return f"""
WITH cells AS (
  SELECT {{day_expr}} AS day, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM cells),
types AS (SELECT DISTINCT event_type FROM cells),
grid AS (
  SELECT d.day, t.event_type, coalesce(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.event_type = t.event_type
), vc AS (
  SELECT day, c, CAST(count(*) AS BIGINT) AS t FROM grid GROUP BY day, c
), r2 AS (
  SELECT day, c,
         2 * coalesce(sum(t) OVER (PARTITION BY day ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + t + 1 AS r2
  FROM vc
), ranked AS (
  SELECT g.day, g.event_type, r2.r2
  FROM grid g JOIN r2 ON r2.day = g.day AND r2.c = g.c
), nk AS (
  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k,
         sum(CAST(r2 AS {wide}) * r2) AS ssq
  FROM ranked
), s2 AS (
  SELECT event_type, CAST(sum(r2) AS BIGINT) AS s2
  FROM ranked GROUP BY event_type
), ab AS (
  SELECT max(n) AS n, max(k) AS k,
         sum(CAST(s2 - n * (k + 1) AS {wide}) * (s2 - n * (k + 1)))
           AS a_stat,
         max(ssq - CAST(n AS {wide}) * k * (k + 1) * (k + 1)) AS b_stat
  FROM s2 CROSS JOIN nk
)
SELECT n AS n_days, k AS k_types,
       CASE WHEN b_stat = 0 THEN NULL ELSE
         CAST({w6} AS BIGINT)
       END AS w_micro
FROM ab
"""


def q352_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across day-blocked
    event-type ranks — how strongly the days AGREE on the ranking of
    event types (W = 1 perfect concordance, 0 none), the effect-size
    companion of the Friedman test (q322: tie-corrected
    W = Q/(n(k−1)) = A/(n·B) on the identical doubled-rank grid).

    Exactness: A = Σ_j(S2_j − n(k+1))² and B = Σ(2r)² − nk(k+1)² are
    the exact integers q322 derives (the 4s cancel in the doubled-rank
    identity), so w_micro = floor(A·10⁶/(n·B)) is one exact two-limb
    floor-scaled division, NULL when B = 0 (all blocks fully tied).
    W ∈ [0, 1] by construction — a pytest bound.

    Shape at 100 TB: the q322 shape — one grouped corpus pass to the
    (day, type) count table; windows and the reduction run on
    calendar·|types|-bounded relations."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_q352_core("DECIMAL(38,0)", "div").format(
        day_expr="unix_micros(ts) div 86400000000"
    ))


_Q352_SQL = _q352_core("HUGEINT", "//").format(
    day_expr="epoch_us(ts) // 86400000000"
)


_TURNING_CORE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
cal AS ({cal_expr}),
series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), tri AS (
  SELECT a.c AS x0, b.c AS x1, cc.c AS x2
  FROM series a
  JOIN series b ON b.d = {next1}
  JOIN series cc ON cc.d = {next2}
), agg AS (
  SELECT CAST(sum(CASE WHEN (x1 > x0 AND x1 > x2)
                         OR (x1 < x0 AND x1 < x2)
                  THEN 1 ELSE 0 END) AS BIGINT) AS t,
         CAST(count(*) + 2 AS BIGINT) AS n
  FROM tri
)
SELECT n AS n_days, t AS n_turning_points,
       CASE WHEN n < 3 OR 16 * n - 29 <= 0 THEN NULL ELSE
         round((CAST(3 * t - 2 * (n - 2) AS DOUBLE) / 3.0e0)
               / sqrt(CAST(16 * n - 29 AS DOUBLE) / 90.0e0), 4)
       END AS z_turning
FROM agg
"""


def q353_turning_point_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test of the daily event-count series —
    the classic IID probe (too FEW strict local extrema means trend or
    positive autocorrelation, too MANY means negative/oscillation),
    complementing the runs test (q205) and Ljung-Box (q344).

    Exactness: T counts STRICT interior extrema (ties are not turning
    points — documented choice) — an exact integer off the
    calendar-zero-filled series; z = (T − 2(n−2)/3)/√((16n−29)/90) is
    one double chain over exact integers with the 1/3 kept exact as
    (3T − 2(n−2))/3. n < 3 → NULL.

    Shape at 100 TB: the corpus collapses to ≤|days| rows in the first
    exchange; the triple join runs on the tiny daily relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_TURNING_CORE.format(
        cal_expr="SELECT explode(sequence(lo, hi, interval 1 day)) AS d"
                 " FROM mm",
        next1="date_add(a.d, 1)",
        next2="date_add(a.d, 2)",
    ))


_Q353_SQL = _TURNING_CORE.format(
    cal_expr="SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))"
             " AS DATE) AS d FROM mm",
    next1="a.d + 1",
    next2="a.d + 2",
)


_COXSTUART_CORE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
), mm AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
cal AS ({cal_expr}),
series AS (
  SELECT cal.d, coalesce(daily.c, 0) AS c,
         CAST(row_number() OVER (ORDER BY cal.d) AS BIGINT) AS i
  FROM cal LEFT JOIN daily ON cal.d = daily.d
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM series
), pairs AS (
  SELECT a.c AS x0, b.c AS x1
  FROM series a
  JOIN nn ON true
  JOIN series b ON b.i = a.i + (n {idiv} 2)
  WHERE a.i <= n {idiv} 2 AND (n % 2 = 0 OR a.i <= n {idiv} 2)
    AND b.i <= n
), agg AS (
  SELECT CAST(sum(CASE WHEN x1 > x0 THEN 1 ELSE 0 END) AS BIGINT)
           AS s_plus,
         CAST(sum(CASE WHEN x1 <> x0 THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM pairs
)
SELECT (SELECT max(n) FROM nn) AS n_days, s_plus, m,
       CASE WHEN m = 0 THEN NULL ELSE
         round(CAST(2 * s_plus - m AS DOUBLE)
               / sqrt(CAST(m AS DOUBLE)), 4)
       END AS z_trend
FROM agg
"""


def q354_cox_stuart_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart sign test for a monotone trend in the daily
    event-count series — the distribution-free trend check that
    complements Mann-Kendall (q301) and the turning-point test
    (q353): pair day i with day i + n/2 and count sign changes.

    Exactness: S⁺ (later-half wins) and m (non-tied pairs) are exact
    integers off the calendar-zero-filled series; z = (2S⁺ − m)/√m is
    one double chain (the exact binomial two-sided normal
    approximation, continuity uncorrected — documented). All-tied
    (m = 0) → NULL. Odd n drops the middle element, the classical
    treatment (pairing i → i + n div 2 for i ≤ n div 2).

    Shape at 100 TB: corpus collapses to ≤|days| rows; one self-join
    on the tiny daily relation."""
    from ..sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_COXSTUART_CORE.format(
        cal_expr="SELECT explode(sequence(lo, hi, interval 1 day)) AS d"
                 " FROM mm",
        idiv="div",
    ))


_Q354_SQL = _COXSTUART_CORE.format(
    cal_expr="SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))"
             " AS DATE) AS d FROM mm",
    idiv="//",
)

def q357_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screening of order value
    against urgency (the credit-scoring feature-screening standard,
    Siddiqi 2006): orders bucket into fixed 50k price bins, the
    'bad' class is the urgent priorities ('1-URGENT', '2-HIGH'), and
    each bin reports WoE = ln((good_i/G)/(bad_i/B)) plus its IV
    contribution (good_i/G − bad_i/B)·WoE — the table a feature store
    publishes to rank predictors before model training.

    Exactness: bins and class counts are exact BIGINTs; WoE/IV are one
    double chain each over those integers, quantized to micro via the
    q340 round(x·10⁶) seam. Bins missing a class entirely get NULL
    WoE/IV (ln undefined — the classical treatment is explicit, not a
    smoothing constant, so the gap is visible); iv_total_micro sums
    the QUANTIZED micro terms (integer addition — order-independent
    across engines, unlike a float window sum), NULL terms as 0.

    Shape at 100 TB: one map-side-combined groupBy on the fixed-width
    bin key (≤ ~dozens of bins), a broadcast 1-row totals join, and a
    window over the bounded bin relation."""
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.select(
            F.expr(
                "CAST(floor(o_totalprice / 50000.0e0) AS BIGINT)"
            ).alias("price_bin"),
            F.expr(
                "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END"
            ).alias("is_bad"),
        )
        .groupBy("price_bin")
        .agg(
            F.sum(F.expr("1 - is_bad")).cast("long").alias("n_good"),
            F.sum("is_bad").cast("long").alias("n_bad"),
        )
    )
    tot = per.agg(
        F.sum("n_good").cast("long").alias("g_tot"),
        F.sum("n_bad").cast("long").alias("b_tot"),
    )
    woe = (
        "ln((CAST(n_good AS DOUBLE) * b_tot)"
        " / (CAST(n_bad AS DOUBLE) * g_tot))"
    )
    ivt = (
        "(CAST(n_good AS DOUBLE) / g_tot"
        " - CAST(n_bad AS DOUBLE) / b_tot) * " + woe
    )
    gated = per.crossJoin(F.broadcast(tot)).select(
        "price_bin",
        "n_good",
        "n_bad",
        F.expr(
            "CASE WHEN n_good > 0 AND n_bad > 0 THEN"
            f" CAST(round({woe} * 1e6) AS BIGINT) END"
        ).alias("woe_micro"),
        F.expr(
            "CASE WHEN n_good > 0 AND n_bad > 0 THEN"
            f" CAST(round({ivt} * 1e6) AS BIGINT) END"
        ).alias("iv_micro"),
    )
    return gated.select(
        "*",
        F.sum(F.coalesce("iv_micro", F.lit(0)))
        .over(W.partitionBy())
        .alias("iv_total_micro"),
    ).orderBy("price_bin")


_Q357_SQL = """
WITH per AS (
  SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS price_bin,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
  FROM orders
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS g_tot,
         CAST(sum(n_bad) AS BIGINT) AS b_tot
  FROM per
), gated AS (
  SELECT price_bin, n_good, n_bad,
         CASE WHEN n_good > 0 AND n_bad > 0 THEN
           CAST(round(ln((CAST(n_good AS DOUBLE) * b_tot)
                         / (CAST(n_bad AS DOUBLE) * g_tot)) * 1e6)
                AS BIGINT) END AS woe_micro,
         CASE WHEN n_good > 0 AND n_bad > 0 THEN
           CAST(round((CAST(n_good AS DOUBLE) / g_tot
                       - CAST(n_bad AS DOUBLE) / b_tot)
                      * ln((CAST(n_good AS DOUBLE) * b_tot)
                           / (CAST(n_bad AS DOUBLE) * g_tot)) * 1e6)
                AS BIGINT) END AS iv_micro
  FROM per CROSS JOIN tot
)
SELECT price_bin, n_good, n_bad, woe_micro, iv_micro,
       CAST(sum(coalesce(iv_micro, 0)) OVER () AS BIGINT)
         AS iv_total_micro
FROM gated
ORDER BY price_bin
"""


def q358_delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for the per-event value ratio,
    clustered by user (the standard ratio-metric machinery of online
    experimentation — Deng et al. 2017/2018: R = ΣX_u/ΣY_u over user
    totals, Var(R) ≈ n/(n−1)·Σ(x_u − R·y_u)²/(ΣY)² — because events of
    one user are correlated, the naive per-event variance is wrong and
    the user-clustered linearization is the fix).

    Exactness: values quantize to milli BIGINTs BEFORE any sum
    (quantize-pre-sum), so every moment (Σx, Σxy, Σx², Σy², per-user
    totals) is an exact integer in DECIMAL(38,0)/HUGEINT; R, SE and
    the 1.96σ bounds are one double chain over those integers,
    micro-quantized via the q340 round(x·10⁶) seam. Float cancellation
    in the residual quadratic is clamped at 0. Single-user types
    (n < 2) report NULL SE/CI.

    Shape at 100 TB: two map-side-combined hash aggregations
    ((event_type, user) totals → event_type moments) — the canonical
    scalable shape; no window, no join."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select(
            "event_type",
            "user_id",
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v_milli"),
        )
        .groupBy("event_type", "user_id")
        .agg(
            F.sum("v_milli").alias("x_m"),
            F.count("*").alias("y"),
        )
    )
    mom = per_user.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("y").cast("long").alias("n_events"),
        F.sum("x_m").cast("long").alias("sum_value_milli"),
        F.sum(F.expr("CAST(x_m AS DECIMAL(38,0)) * x_m")).alias("sxx"),
        F.sum(F.expr("CAST(x_m AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    r_m = "(CAST(sum_value_milli AS DOUBLE) / n_events)"
    s_quad = (
        f"greatest(0.0e0, CAST(sxx AS DOUBLE) - 2.0e0 * {r_m} *"
        f" CAST(sxy AS DOUBLE) + {r_m} * {r_m} * CAST(syy AS DOUBLE))"
    )
    se_v = (
        f"sqrt((CAST(n_users AS DOUBLE) / (n_users - 1)) * {s_quad})"
        " / (1000.0e0 * n_events)"
    )
    return mom.select(
        "event_type",
        "n_users",
        "n_events",
        "sum_value_milli",
        F.expr(
            f"CAST(round({r_m} * 1000) AS BIGINT)"
        ).alias("r_micro"),
        F.expr(
            "CASE WHEN n_users >= 2 THEN"
            f" CAST(round({se_v} * 1e6) AS BIGINT) END"
        ).alias("se_micro"),
        F.expr(
            "CASE WHEN n_users >= 2 THEN"
            f" CAST(round(({r_m} / 1000.0e0 - 1.96e0 * {se_v}) * 1e6)"
            " AS BIGINT) END"
        ).alias("ci_lo_micro"),
        F.expr(
            "CASE WHEN n_users >= 2 THEN"
            f" CAST(round(({r_m} / 1000.0e0 + 1.96e0 * {se_v}) * 1e6)"
            " AS BIGINT) END"
        ).alias("ci_hi_micro"),
    ).orderBy("event_type")


def _q358_sql() -> str:
    r_m = "(CAST(sum_value_milli AS DOUBLE) / n_events)"
    s_quad = (
        f"greatest(0.0, CAST(sxx AS DOUBLE) - 2.0 * {r_m} *"
        f" CAST(sxy AS DOUBLE) + {r_m} * {r_m} * CAST(syy AS DOUBLE))"
    )
    se_v = (
        f"sqrt((CAST(n_users AS DOUBLE) / (n_users - 1)) * {s_quad})"
        " / (1000.0 * n_events)"
    )
    return f"""
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS x_m,
         CAST(count(*) AS BIGINT) AS y
  FROM events
  GROUP BY event_type, user_id
), mom AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(y) AS BIGINT) AS n_events,
         CAST(sum(x_m) AS BIGINT) AS sum_value_milli,
         CAST(sum(CAST(x_m AS HUGEINT) * x_m) AS HUGEINT) AS sxx,
         CAST(sum(CAST(x_m AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_user
  GROUP BY event_type
)
SELECT event_type, n_users, n_events, sum_value_milli,
       CAST(round({r_m} * 1000) AS BIGINT) AS r_micro,
       CASE WHEN n_users >= 2 THEN
         CAST(round({se_v} * 1e6) AS BIGINT) END AS se_micro,
       CASE WHEN n_users >= 2 THEN
         CAST(round(({r_m} / 1000.0 - 1.96 * {se_v}) * 1e6) AS BIGINT)
       END AS ci_lo_micro,
       CASE WHEN n_users >= 2 THEN
         CAST(round(({r_m} / 1000.0 + 1.96 * {se_v}) * 1e6) AS BIGINT)
       END AS ci_hi_micro
FROM mom
ORDER BY event_type
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
    from ..operators.layout import compaction_plan

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


def q360_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA over event values by
    type — the variance-robust companion to the classical F (q233)
    and the mean-variant of Brown-Forsythe (q342): unequal group
    variances break the pooled-SSW F, and Welch's F* with its
    Satterthwaite df2 is the standard fix (Welch 1951).

    Exactness: per-group moments (n, Σx, Σx²) are exact integers off
    milli-quantized values; each group's weight w = n/s², weighted
    mean terms w·x̄, w·x̄², and Λ-term (1−w/W)²/(n−1) are
    deterministic doubles OVER those exact integers, then quantized
    (micro for the w-family into DECIMAL(38,0), femto for Λ into
    BIGINT) BEFORE the cross-group sum — so every sum is integer and
    engine-order-independent (a raw float sum over groups would be
    summation-order-sensitive). F* and df2 are one final double
    chain, micro-quantized. Groups below 2 events or with zero
    variance are excluded (classical treatment); fewer than 2
    qualifying groups → NULL statistics, k_groups still reported.

    Shape at 100 TB: one map-side-combined groupBy collapses the
    corpus to ≤|event_types| rows; the totals join is a broadcast
    1-row crossJoin; everything after is arithmetic on that bounded
    relation."""
    events = load_table(spark, sf_dir, "events")
    g = (
        events.select(
            "event_type",
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v_m"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("v_m").cast("long").alias("s"),
            F.sum(F.expr("CAST(v_m AS DECIMAL(38,0)) * v_m")).alias("ss"),
        )
        .filter(
            "n >= 2 AND CAST(n AS DECIMAL(38,0)) * ss"
            " > CAST(s AS DECIMAL(38,0)) * s"
        )
    )
    # value-unit doubles from exact integer moments (milli -> value)
    mean_v = "(CAST(s AS DOUBLE) / n / 1000.0e0)"
    var_v = (
        "((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        " / (n - 1) / 1.0e6)"
    )
    w_v = f"(CAST(n AS DOUBLE) / {var_v})"
    per = g.select(
        "n",
        F.expr(
            f"CAST(round({w_v} * 1e6) AS DECIMAL(38,0))"
        ).alias("w_u"),
        F.expr(
            f"CAST(round({w_v} * {mean_v} * 1e6) AS DECIMAL(38,0))"
        ).alias("wm_u"),
        F.expr(
            f"CAST(round({w_v} * {mean_v} * {mean_v} * 1e6)"
            " AS DECIMAL(38,0))"
        ).alias("wm2_u"),
    )
    tot = per.agg(
        F.count("*").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("w_u").alias("w_tot"),
        F.sum("wm_u").alias("b_tot"),
        F.sum("wm2_u").alias("a_tot"),
    )
    lam = per.crossJoin(F.broadcast(tot.select("w_tot"))).agg(
        F.sum(
            F.expr(
                "CAST(round(pow(1.0e0 - CAST(w_u AS DOUBLE) / w_tot, 2)"
                " / (n - 1) * 1e15) AS BIGINT)"
            )
        ).alias("lam_f")
    )
    num = (
        "((CAST(a_tot AS DOUBLE)"
        " - CAST(b_tot AS DOUBLE) * b_tot / w_tot)"
        " / 1e6 / (k - 1))"
    )
    den = (
        "(1.0e0 + (2.0e0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1))"
        " * (CAST(lam_f AS DOUBLE) / 1e15))"
    )
    return tot.crossJoin(F.broadcast(lam)).select(
        F.col("k").alias("k_groups"),
        "n_total",
        (F.col("k") - 1).cast("long").alias("df1"),
        F.expr(
            "CASE WHEN k >= 2 THEN"
            f" CAST(round({num} / {den} * 1e6) AS BIGINT) END"
        ).alias("f_welch_micro"),
        F.expr(
            "CASE WHEN k >= 2 THEN"
            " CAST(round((CAST(k AS DOUBLE) * k - 1)"
            " / (3.0e0 * CAST(lam_f AS DOUBLE) / 1e15) * 1e6)"
            " AS BIGINT) END"
        ).alias("df2_micro"),
    )


def _q360_sql() -> str:
    mean_v = "(CAST(s AS DOUBLE) / n / 1000.0)"
    var_v = (
        "((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        " / (n - 1) / 1.0e6)"
    )
    w_v = f"(CAST(n AS DOUBLE) / {var_v})"
    num = (
        "((CAST(a_tot AS DOUBLE)"
        " - CAST(b_tot AS DOUBLE) * b_tot / w_tot)"
        " / 1e6 / (k - 1))"
    )
    den = (
        "(1.0 + (2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1))"
        " * (CAST(lam_f AS DOUBLE) / 1e15))"
    )
    return f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(CAST(round(value * 1000) AS BIGINT) AS HUGEINT)
                  * CAST(round(value * 1000) AS BIGINT)) AS HUGEINT) AS ss
  FROM events
  GROUP BY event_type
), q AS (
  SELECT * FROM g
  WHERE n >= 2 AND CAST(n AS HUGEINT) * ss > CAST(s AS HUGEINT) * s
), per AS (
  SELECT n,
         CAST(round({w_v} * 1e6) AS HUGEINT) AS w_u,
         CAST(round({w_v} * {mean_v} * 1e6) AS HUGEINT) AS wm_u,
         CAST(round({w_v} * {mean_v} * {mean_v} * 1e6) AS HUGEINT) AS wm2_u
  FROM q
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(w_u) AS HUGEINT) AS w_tot,
         CAST(sum(wm_u) AS HUGEINT) AS b_tot,
         CAST(sum(wm2_u) AS HUGEINT) AS a_tot
  FROM per
), lam AS (
  SELECT CAST(sum(CAST(round(pow(1.0 - CAST(w_u AS DOUBLE)
                                 / (SELECT w_tot FROM tot), 2)
                             / (n - 1) * 1e15) AS BIGINT)) AS BIGINT)
           AS lam_f
  FROM per
)
SELECT k AS k_groups, n_total,
       CAST(k - 1 AS BIGINT) AS df1,
       CASE WHEN k >= 2 THEN
         CAST(round({num} / {den} * 1e6) AS BIGINT) END AS f_welch_micro,
       CASE WHEN k >= 2 THEN
         CAST(round((CAST(k AS DOUBLE) * k - 1)
                    / (3.0 * CAST(lam_f AS DOUBLE) / 1e15) * 1e6)
              AS BIGINT) END AS df2_micro
FROM tot CROSS JOIN lam
"""


def q361_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley scale test per source (tie-aware): do English
    and non-English doc lengths differ in DISPERSION around a common
    median? The rank-based companion to the location tests
    (Mann-Whitney q187, Mood's median q332): AB scores
    a(r) = min(r, N+1−r) peak at the middle, so a LOW sample-1 score
    sum means sample 1 concentrates in the tails (larger spread).

    Exactness: the count-table discipline of q186/q187 — ranks never
    touch raw rows; each distinct length's rank span [lo, hi] gets its
    score-span sum S via the closed two-triangle formula (exact
    integers, DECIMAL-cast products), and the tie-averaged per-group
    terms c1·S/cnt and S²/cnt (the only rationals) are quantized to
    micro BEFORE the per-source sum — integer addition, engine-order-
    independent, accumulated in DECIMAL(38,0)/HUGEINT (S ~ N·cnt, so
    S²/cnt·10⁶ is quadratic-to-cubic in corpus size and would wrap
    64 bits around 10⁵–10⁶ tied docs; BIGINT only on final output).
    The tie-corrected normal approximation
    z = (T1 − n1·ā)/√(n1·n2·(N·Σa² − (Σa)²)/(N²(N−1))) is one final
    double chain. One-sided sources or zero score variance → NULL z.

    Shape at 100 TB: one (source, length) count-table collapse, two
    windows over the bounded distinct-length relation, a ≤|sources|
    rollup. No raw-row sort, no join."""
    docs = _t(spark, sf_dir, "documents")
    cnt = (
        docs.select(
            "source",
            F.col("n_chars").alias("nc"),
            (F.col("lang") == "en").cast("long").alias("e"),
        )
        .groupBy("source", "nc")
        .agg(
            F.sum("e").alias("c1"),
            F.sum(1 - F.col("e")).alias("c2"),
        )
        .withColumn("cnt", F.col("c1") + F.col("c2"))
    )
    w_excl = W.partitionBy("source").orderBy("nc").rowsBetween(
        W.unboundedPreceding, -1
    )
    w_all = W.partitionBy("source")
    spans = cnt.select(
        "source", "c1", "c2", "cnt",
        (F.coalesce(F.sum("cnt").over(w_excl), F.lit(0)) + 1).alias("lo"),
        F.sum("cnt").over(w_all).alias("n_tot"),
    ).withColumn("hi", F.col("lo") + F.col("cnt") - 1)
    # score-span sum S = sum_{r=lo}^{hi} min(r, N+1-r): ascending
    # triangle up to m = (N+1) div 2, descending after — two exact
    # consecutive-integer sums (products DECIMAL-cast: ranks reach N).
    s_expr = (
        "CAST("
        " CASE WHEN lo <= least(hi, (n_tot + 1) div 2) THEN"
        "  (CAST(least(hi, (n_tot + 1) div 2) AS DECIMAL(38,0))"
        "   * (least(hi, (n_tot + 1) div 2) + 1)"
        "   - CAST(lo AS DECIMAL(38,0)) * (lo - 1)) div 2 ELSE 0 END"
        " + CASE WHEN greatest(lo, (n_tot + 1) div 2 + 1) <= hi THEN"
        "  (CAST(n_tot + 1 - greatest(lo, (n_tot + 1) div 2 + 1)"
        "        AS DECIMAL(38,0))"
        "   * (n_tot + 2 - greatest(lo, (n_tot + 1) div 2 + 1))"
        "   - CAST(n_tot - hi AS DECIMAL(38,0)) * (n_tot + 1 - hi))"
        "  div 2 ELSE 0 END"
        " AS DECIMAL(38,0))"
    )
    # The quantized micro terms accumulate in DECIMAL(38,0) (like
    # `sa` already does), not BIGINT: S grows like N·cnt, so
    # S²/cnt·1e6 is quadratic-to-cubic in corpus size and would wrap
    # 64 bits around N~10⁵–10⁶ tied docs. BIGINT conversion happens
    # only on the final output column.
    terms = spans.withColumn("s_sum", F.expr(s_expr)).select(
        "source", "c1", "c2", "cnt", "n_tot",
        "s_sum",
        F.expr(
            "CAST(round(CAST(c1 AS DOUBLE) * s_sum / cnt * 1e6)"
            " AS DECIMAL(38,0))"
        ).alias("t1_u"),
        F.expr(
            "CAST(round(CAST(s_sum AS DOUBLE) * s_sum / cnt * 1e6)"
            " AS DECIMAL(38,0))"
        ).alias("sa2_u"),
    )
    agg = terms.groupBy("source").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.max("n_tot").cast("long").alias("n"),
        F.sum("t1_u").alias("t1_micro"),
        F.sum("s_sum").alias("sa"),
        F.sum("sa2_u").alias("sa2_micro"),
    )
    varr = (
        "(CAST(n1 AS DOUBLE) * n2"
        " * (CAST(n AS DOUBLE) * (CAST(sa2_micro AS DOUBLE) / 1e6)"
        "    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n * (n - 1)))"
    )
    z = (
        "((CAST(t1_micro AS DOUBLE) / 1e6"
        f" - CAST(n1 AS DOUBLE) * CAST(sa AS DOUBLE) / n) / sqrt({varr}))"
    )
    return agg.select(
        "source", "n1", "n2",
        F.expr("CAST(t1_micro AS BIGINT)").alias("t1_micro"),
        F.expr(
            "CASE WHEN n1 > 0 AND n2 > 0 AND n >= 2"
            f" AND {varr} > 0 THEN"
            f" CAST(round({z} * 1e6) AS BIGINT) END"
        ).alias("z_micro"),
    ).orderBy("source")


def _q361_sql() -> str:
    s_expr = (
        "CAST("
        " CASE WHEN lo <= least(hi, (n_tot + 1) // 2) THEN"
        "  (CAST(least(hi, (n_tot + 1) // 2) AS HUGEINT)"
        "   * (least(hi, (n_tot + 1) // 2) + 1)"
        "   - CAST(lo AS HUGEINT) * (lo - 1)) // 2 ELSE 0 END"
        " + CASE WHEN greatest(lo, (n_tot + 1) // 2 + 1) <= hi THEN"
        "  (CAST(n_tot + 1 - greatest(lo, (n_tot + 1) // 2 + 1)"
        "        AS HUGEINT)"
        "   * (n_tot + 2 - greatest(lo, (n_tot + 1) // 2 + 1))"
        "   - CAST(n_tot - hi AS HUGEINT) * (n_tot + 1 - hi))"
        "  // 2 ELSE 0 END"
        " AS HUGEINT)"
    )
    varr = (
        "(CAST(n1 AS DOUBLE) * n2"
        " * (CAST(n AS DOUBLE) * (CAST(sa2_micro AS DOUBLE) / 1e6)"
        "    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n * (n - 1)))"
    )
    z = (
        "((CAST(t1_micro AS DOUBLE) / 1e6"
        f" - CAST(n1 AS DOUBLE) * CAST(sa AS DOUBLE) / n) / sqrt({varr}))"
    )
    return f"""
WITH cnt AS (
  SELECT source, n_chars AS nc,
         CAST(sum(CAST(lang = 'en' AS BIGINT)) AS BIGINT) AS c1,
         CAST(sum(1 - CAST(lang = 'en' AS BIGINT)) AS BIGINT) AS c2
  FROM documents
  GROUP BY source, n_chars
), spans AS (
  SELECT source, c1, c2, c1 + c2 AS cnt,
         coalesce(sum(c1 + c2) OVER (PARTITION BY source ORDER BY nc
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) + 1 AS lo,
         sum(c1 + c2) OVER (PARTITION BY source) AS n_tot
  FROM cnt
), terms AS (
  SELECT source, c1, c2, cnt, n_tot, s_sum,
         CAST(round(CAST(c1 AS DOUBLE) * s_sum / cnt * 1e6) AS HUGEINT)
           AS t1_u,
         CAST(round(CAST(s_sum AS DOUBLE) * s_sum / cnt * 1e6) AS HUGEINT)
           AS sa2_u
  FROM (
    SELECT *, lo + cnt - 1 AS hi FROM spans
  ) sp, LATERAL (SELECT {s_expr} AS s_sum) sc
), agg AS (
  SELECT source,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(max(n_tot) AS BIGINT) AS n,
         CAST(sum(t1_u) AS HUGEINT) AS t1_micro,
         CAST(sum(s_sum) AS HUGEINT) AS sa,
         CAST(sum(sa2_u) AS HUGEINT) AS sa2_micro
  FROM terms
  GROUP BY source
)
SELECT source, n1, n2, CAST(t1_micro AS BIGINT) AS t1_micro,
       CASE WHEN n1 > 0 AND n2 > 0 AND n >= 2 AND {varr} > 0 THEN
         CAST(round({z} * 1e6) AS BIGINT) END AS z_micro
FROM agg
ORDER BY source
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
    share_ppm the exact integer (n·10⁶) div total.

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
    from ..operators.incremental import lateness_tier_counts

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


def q366_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user growth accounting — the product-analytics ledger
    that decomposes every day's active count into NEW (first-ever
    day), RETAINED (also active yesterday) and RESURRECTED (returning
    after a gap), with CHURNED (active yesterday, silent today)
    attributed to the day the user went silent — the decomposition
    behind 'active(d) − active(d−1) = new + resurrected − churned'
    that q62's cohort grid and q334's stickiness ratio don't give.
    Right-censored: nobody churns past the last observed day.

    Exactness: all integers off the distinct (user, day) relation;
    classification is lag/lead day arithmetic; the churn side is
    attributed to day+1 and outer-merged with the activity side so a
    fully-silent day still carries its churn row.

    Shape at 100 TB: one distinct on (user, day) (hash shuffle keyed
    by user count), two user-partitioned windows, two ≤|days| rollups
    and a calendar-bounded outer merge. No raw-row global sort."""
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w_u = W.partitionBy("user_id").orderBy("day")
    flags = ud.select(
        "user_id",
        "day",
        F.lag("day").over(w_u).alias("prev_day"),
        F.lead("day").over(w_u).alias("next_day"),
        F.min("day").over(
            W.partitionBy("user_id")
        ).alias("first_day"),
    )
    acts = flags.groupBy("day").agg(
        F.count("*").alias("n_active"),
        F.sum(
            F.expr("CASE WHEN day = first_day THEN 1 ELSE 0 END")
        ).cast("long").alias("n_new"),
        F.sum(
            F.expr(
                "CASE WHEN prev_day = day - INTERVAL 1 DAY"
                " THEN 1 ELSE 0 END"
            )
        ).cast("long").alias("n_retained"),
        F.sum(
            F.expr(
                "CASE WHEN day > first_day AND (prev_day IS NULL"
                " OR prev_day < day - INTERVAL 1 DAY)"
                " THEN 1 ELSE 0 END"
            )
        ).cast("long").alias("n_resurrected"),
    )
    last = ud.agg(F.max("day").alias("max_day"))
    churn = (
        flags.crossJoin(F.broadcast(last))
        .filter(
            "(next_day IS NULL OR next_day > day + INTERVAL 1 DAY)"
            " AND day < max_day"
        )
        .select(F.expr("day + INTERVAL 1 DAY").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        acts.join(churn, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .orderBy("day")
    )


_Q366_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), flags AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day,
         min(day) OVER (PARTITION BY user_id) AS first_day
  FROM ud
), acts AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN prev_day = day - INTERVAL 1 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN day > first_day AND (prev_day IS NULL
                        OR prev_day < day - INTERVAL 1 DAY)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM flags
  GROUP BY day
), churn AS (
  SELECT CAST(day + INTERVAL 1 DAY AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_churned
  FROM flags CROSS JOIN (SELECT max(day) AS max_day FROM ud) m
  WHERE (next_day IS NULL OR next_day > day + INTERVAL 1 DAY)
    AND day < max_day
  GROUP BY 1
)
SELECT coalesce(acts.day, churn.day) AS day,
       coalesce(n_active, 0) AS n_active,
       coalesce(n_new, 0) AS n_new,
       coalesce(n_retained, 0) AS n_retained,
       coalesce(n_resurrected, 0) AS n_resurrected,
       coalesce(n_churned, 0) AS n_churned
FROM acts FULL OUTER JOIN churn ON churn.day = acts.day
ORDER BY 1
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
    from ..operators.layout import epoch_shuffle

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


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_top_revenue_orders": q02_top_revenue_orders,
    "q03_segment_order_value": q03_segment_order_value,
    "q04_region_nation_revenue": q04_region_nation_revenue,
    "q05_global_stats": q05_global_stats,
    "q06_grouped_stats": q06_grouped_stats,
    "q07_daily_activity": q07_daily_activity,
    "q08_top_users_per_type": q08_top_users_per_type,
    "q09_recency_rank": q09_recency_rank,
    "q10_purchases_without_errors": q10_purchases_without_errors,
    "q11_user_cohorts": q11_user_cohorts,
    "q12_quality_report": q12_quality_report,
    "q13_flatten_defaults": q13_flatten_defaults,
    "q14_duration_format": q14_duration_format,
    "q15_rollup_counts": q15_rollup_counts,
    "q16_shipdate_range_join": q16_shipdate_range_join,
    "q17_last_click_before_purchase": q17_last_click_before_purchase,
    "q37_window_suite": q37_window_suite,
    "q38_pivot_daily": q38_pivot_daily,
    "q39_above_type_average": q39_above_type_average,
    "q40_big_customers": q40_big_customers,
    "q41_value_percentiles": q41_value_percentiles,
    "q44_cube_counts": q44_cube_counts,
    "q60_fuzzy_part_names": q60_fuzzy_part_names,
    "q61_conversion_funnel": q61_conversion_funnel,
    "q62_retention_cohorts": q62_retention_cohorts,
    "q63_rolling_hourly_value": q63_rolling_hourly_value,
    "q65_scd2_intervals": q65_scd2_intervals,
    "q66_event_path_trigrams": q66_event_path_trigrams,
    "q67_value_outliers": q67_value_outliers,
    "q68_price_histogram": q68_price_histogram,
    "q70_incremental_rollup": q70_incremental_rollup,
    "q72_excess_part_suppliers": q72_excess_part_suppliers,
    "q73_json_props_stats": q73_json_props_stats,
    "q74_sql_forecast_revenue": q74_sql_forecast_revenue,
    "q75_grouping_sets": q75_grouping_sets,
    "q76_windowed_distinct_count": q76_windowed_distinct_count,
    "q78_trend_fit_grouped": q78_trend_fit_grouped,
    "q80_scd2_incremental": q80_scd2_incremental,
    "q82_snapshot_diff": q82_snapshot_diff,
    "q87_volume_shipping": q87_volume_shipping,
    "q88_market_share": q88_market_share,
    "q89_integrity_audit": q89_integrity_audit,
    "q91_temporal_dim_lookup": q91_temporal_dim_lookup,
    "q98_gap_fill_hourly": q98_gap_fill_hourly,
    "q101_merge_upsert": q101_merge_upsert,
    "q114_skew_report": q114_skew_report,
    "q116_epoch_shuffle": q116_epoch_shuffle,
    "q118_rate_anomalies": q118_rate_anomalies,
    "q121_stats_drift": q121_stats_drift,
    "q124_sql_shipping_priority": q124_sql_shipping_priority,
    "q125_sql_returned_items": q125_sql_returned_items,
    "q126_sql_large_volume_customers": q126_sql_large_volume_customers,
    "q127_salted_enrichment": q127_salted_enrichment,
    "q128_salted_distinct_users": q128_salted_distinct_users,
    "q129_range_boundaries": q129_range_boundaries,
    "q131_join_cardinality": q131_join_cardinality,
    "q135_multitouch_attribution": q135_multitouch_attribution,
    "q138_session_conversion": q138_session_conversion,
    "q140_conversion_latency": q140_conversion_latency,
    "q144_curriculum_order": q144_curriculum_order,
    "q152_sql_priority_check": q152_sql_priority_check,
    "q153_sql_order_count_histogram": q153_sql_order_count_histogram,
    "q154_sql_lone_late_supplier": q154_sql_lone_late_supplier,
    "q155_sql_dormant_high_balance": q155_sql_dormant_high_balance,
    "q160_sql_top_revenue_supplier": q160_sql_top_revenue_supplier,
    "q161_sql_small_quantity_revenue": q161_sql_small_quantity_revenue,
    "q162_mad_outliers": q162_mad_outliers,
    "q163_benford_audit": q163_benford_audit,
    "q165_sequence_patterns": q165_sequence_patterns,
    "q166_weighted_median": q166_weighted_median,
    "q171_zorder_layout_audit": q171_zorder_layout_audit,
    "q173_novelty_decay": q173_novelty_decay,
    "q174_sql_pivot_unpivot": q174_sql_pivot_unpivot,
    "q175_sql_lateral_topk": q175_sql_lateral_topk,
    "q176_cdc_apply": q176_cdc_apply,
    "q177_time_weighted_avg": q177_time_weighted_avg,
    "q178_ohlc_candles": q178_ohlc_candles,
    "q180_rfm_segments": q180_rfm_segments,
    "q181_expectations_report": q181_expectations_report,
    "q182_chi_square": q182_chi_square,
    "q184_spearman_corr": q184_spearman_corr,
    "q185_cohens_kappa": q185_cohens_kappa,
    "q186_ks_test": q186_ks_test,
    "q187_mann_whitney": q187_mann_whitney,
    "q188_autocorrelation": q188_autocorrelation,
    "q189_gini_concentration": q189_gini_concentration,
    "q190_cusum_changepoints": q190_cusum_changepoints,
    "q193_sql_local_supplier_volume": q193_sql_local_supplier_volume,
    "q194_sql_disjunctive_revenue": q194_sql_disjunctive_revenue,
    "q195_sql_important_parts": q195_sql_important_parts,
    "q196_sql_promo_share": q196_sql_promo_share,
    "q197_sql_nation_profit": q197_sql_nation_profit,
    "q199_hhi_concentration": q199_hhi_concentration,
    "q200_theil_decomposition": q200_theil_decomposition,
    "q201_kendall_tau": q201_kendall_tau,
    "q203_fano_burstiness": q203_fano_burstiness,
    "q204_mcnemar_test": q204_mcnemar_test,
    "q205_runs_test": q205_runs_test,
    "q208_sql_supplier_diversity": q208_sql_supplier_diversity,
    "q209_sql_min_cost_supplier": q209_sql_min_cost_supplier,
    "q210_peak_concurrency": q210_peak_concurrency,
    "q214_pareto_frontier": q214_pareto_frontier,
    "q215_lead_lag_correlation": q215_lead_lag_correlation,
    "q217_seasonal_indices": q217_seasonal_indices,
    "q218_kcore_trajectory": q218_kcore_trajectory,
    "q219_sprt_sequential_test": q219_sprt_sequential_test,
    "q221_interevent_burstiness": q221_interevent_burstiness,
    "q222_kaplan_meier": q222_kaplan_meier,
    "q223_haar_band_energy": q223_haar_band_energy,
    "q224_abc_classification": q224_abc_classification,
    "q225_degree_assortativity": q225_degree_assortativity,
    "q226_markov_conditional_entropy": q226_markov_conditional_entropy,
    "q227_trending_decay": q227_trending_decay,
    "q228_cohort_ltv": q228_cohort_ltv,
    "q229_markov_top1_accuracy": q229_markov_top1_accuracy,
    "q230_percolation_robustness": q230_percolation_robustness,
    "q231_time_avg_concurrency": q231_time_avg_concurrency,
    "q233_anova_segments": q233_anova_segments,
    "q234_kruskal_wallis": q234_kruskal_wallis,
    "q235_nelson_aalen": q235_nelson_aalen,
    "q238_pettitt_changepoint": q238_pettitt_changepoint,
    "q241_welch_ttest": q241_welch_ttest,
    "q242_bh_fdr_sources": q242_bh_fdr_sources,
    "q243_mann_kendall_theil_sen": q243_mann_kendall_theil_sen,
    "q247_hurst_rs": q247_hurst_rs,
    "q248_gumbel_return_levels": q248_gumbel_return_levels,
    "q250_wasserstein_drift": q250_wasserstein_drift,
    "q251_poisson_bootstrap_ci": q251_poisson_bootstrap_ci,
    "q253_optimal_segmentation": q253_optimal_segmentation,
    "q255_robust_means": q255_robust_means,
    "q264_simpson_audit": q264_simpson_audit,
    "q267_chow_break_test": q267_chow_break_test,
    "q273_mantel_haenszel": q273_mantel_haenszel,
    "q283_deletion_manifest": q283_deletion_manifest,
    "q285_srm_audit": q285_srm_audit,
    "q286_cuped_adjustment": q286_cuped_adjustment,
    "q289_mix_shift_decomposition": q289_mix_shift_decomposition,
    "q291_wilson_intervals": q291_wilson_intervals,
    "q292_rendezvous_resharding": q292_rendezvous_resharding,
    "q295_aa_test_audit": q295_aa_test_audit,
    "q296_loo_target_encoding": q296_loo_target_encoding,
    "q297_transition_drift": q297_transition_drift,
    "q298_weekday_hour_seasonality": q298_weekday_hour_seasonality,
    "q299_kendall_tau": q299_kendall_tau,
    "q300_theil_sen": q300_theil_sen,
    "q301_mann_kendall": q301_mann_kendall,
    "q304_bh_fdr_control": q304_bh_fdr_control,
    "q306_gini_concentration": q306_gini_concentration,
    "q307_spearman_rho": q307_spearman_rho,
    "q311_robust_means": q311_robust_means,
    "q316_seasonal_backtest": q316_seasonal_backtest,
    "q321_logrank_test": q321_logrank_test,
    "q322_friedman_test": q322_friedman_test,
    "q323_durbin_watson": q323_durbin_watson,
    "q324_page_hinkley": q324_page_hinkley,
    "q325_join_skew_audit": q325_join_skew_audit,
    "q333_ab_duration_planner": q333_ab_duration_planner,
    "q334_dau_mau_stickiness": q334_dau_mau_stickiness,
    "q341_dunn_posthoc": q341_dunn_posthoc,
    "q342_brown_forsythe": q342_brown_forsythe,
    "q343_cramer_von_mises": q343_cramer_von_mises,
    "q344_ljung_box": q344_ljung_box,
    "q345_yule_walker_ar2": q345_yule_walker_ar2,
    "q346_fleiss_kappa": q346_fleiss_kappa,
    "q347_page_trend_test": q347_page_trend_test,
    "q349_cochran_q": q349_cochran_q,
    "q351_ordinal_association": q351_ordinal_association,
    "q352_kendalls_w": q352_kendalls_w,
    "q353_turning_point_test": q353_turning_point_test,
    "q354_cox_stuart_trend": q354_cox_stuart_trend,
    "q357_woe_iv": q357_woe_iv,
    "q358_delta_method_ratio_ci": q358_delta_method_ratio_ci,
    "q359_compaction_plan": q359_compaction_plan,
    "q360_welch_anova": q360_welch_anova,
    "q361_ansari_bradley": q361_ansari_bradley,
    "q362_watermark_lateness_audit": q362_watermark_lateness_audit,
    "q366_growth_accounting": q366_growth_accounting,
    "q370_shuffle_mixing_audit": q370_shuffle_mixing_audit,
    "q337_lorenz_curve": q337_lorenz_curve,
}

ORACLES = {
    "q01_pricing_summary": _Q01_SQL,
    "q02_top_revenue_orders": _Q02_SQL,
    "q03_segment_order_value": _Q03_SQL,
    "q04_region_nation_revenue": _Q04_SQL,
    "q05_global_stats": _Q05_SQL,
    "q06_grouped_stats": _Q06_SQL,
    "q07_daily_activity": _Q07_SQL,
    "q08_top_users_per_type": _Q08_SQL,
    "q09_recency_rank": _Q09_SQL,
    "q10_purchases_without_errors": _Q10_SQL,
    "q11_user_cohorts": _Q11_SQL,
    "q12_quality_report": _Q12_SQL,
    "q13_flatten_defaults": _Q13_SQL,
    "q14_duration_format": _Q14_SQL,
    "q15_rollup_counts": _Q15_SQL,
    "q16_shipdate_range_join": _Q16_SQL,
    "q17_last_click_before_purchase": _Q17_SQL,
    "q37_window_suite": _Q37_SQL,
    "q38_pivot_daily": _Q38_SQL,
    "q39_above_type_average": _Q39_SQL,
    "q40_big_customers": _Q40_SQL,
    "q41_value_percentiles": _Q41_SQL,
    "q44_cube_counts": _Q44_SQL,
    "q60_fuzzy_part_names": _Q60_SQL,
    "q61_conversion_funnel": _Q61_SQL,
    "q62_retention_cohorts": _Q62_SQL,
    "q63_rolling_hourly_value": _Q63_SQL,
    "q65_scd2_intervals": _Q65_SQL,
    "q66_event_path_trigrams": _Q66_SQL,
    "q67_value_outliers": _Q67_SQL,
    "q68_price_histogram": _Q68_SQL,
    "q70_incremental_rollup": _Q70_SQL,
    "q72_excess_part_suppliers": _Q72_SQL,
    "q73_json_props_stats": _Q73_SQL,
    "q74_sql_forecast_revenue": _Q74_SQL,
    "q75_grouping_sets": _Q75_SQL,
    "q76_windowed_distinct_count": _Q76_SQL,
    "q78_trend_fit_grouped": _Q78_SQL,
    "q80_scd2_incremental": _Q65_SQL,
    "q82_snapshot_diff": _Q82_SQL,
    "q87_volume_shipping": _Q87_SQL,
    "q88_market_share": _Q88_SQL,
    "q89_integrity_audit": _Q89_SQL,
    "q91_temporal_dim_lookup": _Q91_SQL,
    "q98_gap_fill_hourly": _Q98_SQL,
    "q101_merge_upsert": _Q101_SQL,
    "q114_skew_report": _Q114_SQL,
    "q116_epoch_shuffle": _Q116_SQL,
    "q118_rate_anomalies": _Q118_SQL,
    "q121_stats_drift": _Q121_SQL,
    "q124_sql_shipping_priority": _Q124_SQL,
    "q125_sql_returned_items": _Q125_SQL,
    "q126_sql_large_volume_customers": _Q126_SQL,
    "q127_salted_enrichment": _Q127_SQL,
    "q128_salted_distinct_users": _Q128_SQL,
    "q129_range_boundaries": _Q129_SQL,
    "q131_join_cardinality": _Q131_SQL,
    "q135_multitouch_attribution": _Q135_SQL,
    "q138_session_conversion": _Q138_SQL,
    "q140_conversion_latency": _Q140_SQL,
    "q144_curriculum_order": _Q144_SQL,
    "q152_sql_priority_check": _Q152_SQL,
    "q153_sql_order_count_histogram": _Q153_SQL,
    "q154_sql_lone_late_supplier": _Q154_SQL,
    "q155_sql_dormant_high_balance": _Q155_SQL,
    "q160_sql_top_revenue_supplier": _Q160_SQL,
    "q161_sql_small_quantity_revenue": _Q161_SQL,
    "q162_mad_outliers": _Q162_SQL,
    "q163_benford_audit": _Q163_SQL,
    "q165_sequence_patterns": _Q165_SQL,
    "q166_weighted_median": _Q166_SQL,
    "q171_zorder_layout_audit": _q171_sql(),
    "q173_novelty_decay": _Q173_SQL,
    "q174_sql_pivot_unpivot": _Q174_SQL,
    "q175_sql_lateral_topk": _Q175_SQL,
    "q176_cdc_apply": _Q176_SQL,
    "q177_time_weighted_avg": _Q177_SQL,
    "q178_ohlc_candles": _Q178_SQL,
    "q180_rfm_segments": _Q180_SQL,
    "q181_expectations_report": _Q181_SQL,
    "q182_chi_square": _Q182_SQL,
    "q184_spearman_corr": _Q184_SQL,
    "q185_cohens_kappa": _Q185_SQL,
    "q186_ks_test": _Q186_SQL,
    "q187_mann_whitney": _Q187_SQL,
    "q188_autocorrelation": _Q188_SQL,
    "q189_gini_concentration": _Q189_SQL,
    "q190_cusum_changepoints": _Q190_SQL,
    "q193_sql_local_supplier_volume": _Q193_SQL,
    "q194_sql_disjunctive_revenue": _Q194_SQL,
    "q195_sql_important_parts": _Q195_SQL,
    "q196_sql_promo_share": _Q196_SQL,
    "q197_sql_nation_profit": _Q197_SQL,
    "q199_hhi_concentration": _Q199_SQL,
    "q200_theil_decomposition": _Q200_SQL,
    "q201_kendall_tau": _Q201_SQL,
    "q203_fano_burstiness": _Q203_SQL,
    "q204_mcnemar_test": _Q204_SQL,
    "q205_runs_test": _Q205_SQL,
    "q208_sql_supplier_diversity": _Q208_SQL,
    "q209_sql_min_cost_supplier": _Q209_SQL,
    "q210_peak_concurrency": _Q210_SQL,
    "q214_pareto_frontier": _Q214_SQL,
    "q215_lead_lag_correlation": _Q215_SQL,
    "q217_seasonal_indices": _Q217_SQL,
    "q218_kcore_trajectory": _Q218_SQL,
    "q219_sprt_sequential_test": _Q219_SQL,
    "q221_interevent_burstiness": _Q221_SQL,
    "q222_kaplan_meier": _Q222_SQL,
    "q223_haar_band_energy": _Q223_SQL,
    "q224_abc_classification": _Q224_SQL,
    "q225_degree_assortativity": _Q225_SQL,
    "q226_markov_conditional_entropy": _Q226_SQL,
    "q227_trending_decay": _Q227_SQL,
    "q228_cohort_ltv": _Q228_SQL,
    "q229_markov_top1_accuracy": _Q229_SQL,
    "q230_percolation_robustness": _Q230_SQL,
    "q231_time_avg_concurrency": _Q231_SQL,
    "q233_anova_segments": _Q233_SQL,
    "q234_kruskal_wallis": _Q234_SQL,
    "q235_nelson_aalen": _Q235_SQL,
    "q238_pettitt_changepoint": _Q238_SQL,
    "q241_welch_ttest": _Q241_SQL,
    "q242_bh_fdr_sources": _Q242_SQL,
    "q243_mann_kendall_theil_sen": _Q243_SQL,
    "q247_hurst_rs": _Q247_SQL,
    "q248_gumbel_return_levels": _Q248_SQL,
    "q250_wasserstein_drift": _Q250_SQL,
    "q251_poisson_bootstrap_ci": _Q251_SQL,
    "q253_optimal_segmentation": _Q253_SQL,
    "q255_robust_means": _Q255_SQL,
    "q264_simpson_audit": _Q264_SQL,
    "q267_chow_break_test": _Q267_SQL,
    "q273_mantel_haenszel": _Q273_SQL,
    "q283_deletion_manifest": _Q283_SQL,
    "q285_srm_audit": _Q285_SQL,
    "q286_cuped_adjustment": _Q286_SQL,
    "q289_mix_shift_decomposition": _Q289_SQL,
    "q291_wilson_intervals": _q291_sql(),
    "q292_rendezvous_resharding": _q292_sql(),
    "q295_aa_test_audit": _q295_sql(),
    "q296_loo_target_encoding": _Q296_SQL,
    "q297_transition_drift": _Q297_SQL,
    "q298_weekday_hour_seasonality": _Q298_SQL,
    "q299_kendall_tau": _Q299_SQL,
    "q300_theil_sen": _Q300_SQL,
    "q301_mann_kendall": _Q301_SQL,
    "q304_bh_fdr_control": _q304_sql(),
    "q306_gini_concentration": _Q306_SQL,
    "q307_spearman_rho": _Q307_SQL,
    "q311_robust_means": _Q311_SQL,
    "q316_seasonal_backtest": _Q316_SQL,
    "q321_logrank_test": _Q321_SQL,
    "q322_friedman_test": _Q322_SQL,
    "q323_durbin_watson": _Q323_SQL,
    "q324_page_hinkley": _Q324_SQL,
    "q325_join_skew_audit": _Q325_SQL,
    "q333_ab_duration_planner": _Q333_SQL,
    "q334_dau_mau_stickiness": _Q334_SQL,
    "q341_dunn_posthoc": _Q341_SQL,
    "q342_brown_forsythe": _Q342_SQL,
    "q343_cramer_von_mises": _Q343_SQL,
    "q344_ljung_box": _Q344_SQL,
    "q345_yule_walker_ar2": _Q345_SQL,
    "q346_fleiss_kappa": _Q346_SQL,
    "q347_page_trend_test": _Q347_SQL,
    "q349_cochran_q": _Q349_SQL,
    "q351_ordinal_association": _Q351_SQL,
    "q352_kendalls_w": _Q352_SQL,
    "q353_turning_point_test": _Q353_SQL,
    "q354_cox_stuart_trend": _Q354_SQL,
    "q357_woe_iv": _Q357_SQL,
    "q358_delta_method_ratio_ci": _q358_sql(),
    "q359_compaction_plan": _Q359_SQL,
    "q360_welch_anova": _q360_sql(),
    "q361_ansari_bradley": _q361_sql(),
    "q362_watermark_lateness_audit": _Q362_SQL,
    "q366_growth_accounting": _Q366_SQL,
    "q370_shuffle_mixing_audit": _Q370_SQL,
    "q337_lorenz_curve": _Q337_SQL,
}
