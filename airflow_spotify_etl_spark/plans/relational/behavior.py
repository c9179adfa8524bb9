"""Mechanically split from plans/relational.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...operators.joins import asof_join
from ...operators.quality import quality_report
from ...sources.files import load_table
from ._shared import (
    _SESSION_SEG_DUCK,
    _SESSION_SEG_SPARK,
    _t,
)


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
    from ...operators.joins import asof_join

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
    from ...operators.layout import curriculum_order

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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


def q227_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending parts by exponentially decayed order counts with a
    1-day half-life — and the decay is EXACT: score = sum of
    c_age · 2^(40-age) over the last 41 days is pure BIGINT (dyadic
    weights as integer shifts; newest day weighs 2^40, the horizon
    weighs 1), so there is no float to drift and no summation-order
    seam at all — the integer-only guarantee class of q223. The age
    filter prunes the join output before aggregation; top-20 is a
    total-order limit on (score desc, partkey)."""
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
