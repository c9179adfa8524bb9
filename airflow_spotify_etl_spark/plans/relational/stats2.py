"""Mechanically split from plans/relational.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...operators.joins import asof_join
from ...operators.quality import quality_report
from ...sources.files import load_table
from ._shared import (
    _AA_SALTED_CELLS_SQL,
    _COCHRANQ_CORE,
    _CVM_CORE,
    _DUNN_CORE,
    _aa_salted_cells,
    _t,
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
    orders = _t(spark, sf_dir, "orders", parallelize=True)
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
    ev = _t(spark, sf_dir, "events", parallelize=True).select(
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
    ev = _t(spark, sf_dir, "events", parallelize=True).select(
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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_q342_core("DECIMAL(38,0)", "div", "STRING"))


_Q342_SQL = _q342_core("HUGEINT", "//", "VARCHAR")


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
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(_CVM_CORE.format(wide="DECIMAL(38,0)", idiv="div"))


_Q343_SQL = _CVM_CORE.format(wide="HUGEINT", idiv="//")

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_q352_core("DECIMAL(38,0)", "div").format(
        day_expr="unix_micros(ts) div 86400000000"
    ))


_Q352_SQL = _q352_core("HUGEINT", "//").format(
    day_expr="epoch_us(ts) // 86400000000"
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


def q372_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity over event values by
    type — the PARAMETRIC counterpart of Brown-Forsythe (q342) and the
    precondition check for the pooled-variance classical ANOVA
    (q233): T = [(N−k)·ln(s_p²) − Σ(n_i−1)·ln(s_i²)] / C with
    C = 1 + (Σ 1/(n_i−1) − 1/(N−k)) / (3(k−1)), chi-square(k−1)
    under normality (Bartlett 1937). q342 answers "are spreads equal,
    robustly"; this answers the textbook form the ANOVA assumptions
    cite.

    Exactness: per-group moments (n, Σx, Σx²) are exact integers off
    milli-quantized values; each group's double terms —
    (n_i−1)·ln(s_i²) (micro → DECIMAL(38,0): the term grows like
    n·ln, wrapping BIGINT near 1e12 rows), (n_i−1)·s_i² (micro →
    DECIMAL(38,0)), and 1/(n_i−1) (femto BIGINT, the q360 Λ rule) —
    are quantized BEFORE the cross-group sum, so every sum is integer
    and engine-order-independent. T and C are one final double chain,
    micro-quantized. Groups below 2 events or with exactly zero
    variance (integer identity n·Σx² = (Σx)²) are excluded; fewer
    than 2 qualifying groups → NULL statistics, counts still
    reported. ln is the same correctly-rounded-seam argument as q304's
    exp, hidden under micro quantization away from boundaries.

    Shape at 100 TB: one map-side-combined groupBy collapses the
    corpus to ≤|event_types| rows; everything after is a ≤k-row
    reduction. No raw-row sort, no join."""
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
    )
    ok = (
        "(n >= 2 AND CAST(n AS DECIMAL(38,0)) * ss"
        " > CAST(s AS DECIMAL(38,0)) * s)"
    )
    var_v = (
        "((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        " / (n - 1) / 1.0e6)"
    )
    per = g.select(
        F.expr(f"CASE WHEN {ok} THEN 1 ELSE 0 END").alias("used"),
        "n",
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round((n - 1) * ln({var_v}) * 1e6) AS DECIMAL(38,0))"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("lnterm_u"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round((n - 1) * {var_v} * 1e6) AS DECIMAL(38,0))"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("ssw_u"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            " CAST(round(1e15 / (n - 1)) AS BIGINT) ELSE 0L END"
        ).alias("inv_f"),
    )
    agg = per.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("used").cast("long").alias("k_used"),
        F.sum(F.expr("CASE WHEN used = 1 THEN n ELSE 0 END"))
        .cast("long").alias("n_used"),
        F.sum("lnterm_u").alias("ln_sum_u"),
        F.sum("ssw_u").alias("ssw_sum_u"),
        F.sum("inv_f").cast("long").alias("inv_sum_f"),
    )
    sp2 = "(CAST(ssw_sum_u AS DOUBLE) / 1e6 / (n_used - k_used))"
    num = (
        f"((n_used - k_used) * ln({sp2})"
        " - CAST(ln_sum_u AS DOUBLE) / 1e6)"
    )
    cc = (
        "(1.0e0 + (CAST(inv_sum_f AS DOUBLE) / 1e15"
        " - 1.0e0 / (n_used - k_used)) / (3.0e0 * (k_used - 1)))"
    )
    return agg.select(
        "k_groups",
        "k_used",
        "n_used",
        F.expr(
            f"CASE WHEN k_used >= 2 AND {sp2} > 0 THEN"
            f" CAST(round({num} / {cc} * 1e6) AS BIGINT) END"
        ).alias("bartlett_t_micro"),
        F.expr(
            f"CASE WHEN k_used >= 2 AND {sp2} > 0 THEN"
            f" CAST(round({cc} * 1e6) AS BIGINT) END"
        ).alias("c_micro"),
    )


def _q372_sql() -> str:
    ok = (
        "(n >= 2 AND CAST(n AS HUGEINT) * ss"
        " > CAST(s AS HUGEINT) * s)"
    )
    var_v = (
        "((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        " / (n - 1) / 1.0e6)"
    )
    sp2 = "(CAST(ssw_sum_u AS DOUBLE) / 1e6 / (n_used - k_used))"
    num = (
        f"((n_used - k_used) * ln({sp2})"
        " - CAST(ln_sum_u AS DOUBLE) / 1e6)"
    )
    cc = (
        "(1.0e0 + (CAST(inv_sum_f AS DOUBLE) / 1e15"
        " - 1.0e0 / (n_used - k_used)) / (3.0e0 * (k_used - 1)))"
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
), per AS (
  SELECT CASE WHEN {ok} THEN 1 ELSE 0 END AS used,
         n,
         CASE WHEN {ok} THEN
           CAST(round((n - 1) * ln({var_v}) * 1e6) AS HUGEINT)
         ELSE CAST(0 AS HUGEINT) END AS lnterm_u,
         CASE WHEN {ok} THEN
           CAST(round((n - 1) * {var_v} * 1e6) AS HUGEINT)
         ELSE CAST(0 AS HUGEINT) END AS ssw_u,
         CASE WHEN {ok} THEN CAST(round(1e15 / (n - 1)) AS BIGINT)
         ELSE 0 END AS inv_f
  FROM g
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_groups,
         CAST(sum(used) AS BIGINT) AS k_used,
         CAST(sum(CASE WHEN used = 1 THEN n ELSE 0 END) AS BIGINT)
           AS n_used,
         CAST(sum(lnterm_u) AS HUGEINT) AS ln_sum_u,
         CAST(sum(ssw_u) AS HUGEINT) AS ssw_sum_u,
         CAST(sum(inv_f) AS BIGINT) AS inv_sum_f
  FROM per
)
SELECT k_groups, k_used, n_used,
       CASE WHEN k_used >= 2 AND {sp2} > 0 THEN
         CAST(round({num} / {cc} * 1e6) AS BIGINT) END
         AS bartlett_t_micro,
       CASE WHEN k_used >= 2 AND {sp2} > 0 THEN
         CAST(round({cc} * 1e6) AS BIGINT) END AS c_micro
FROM agg
"""


def q376_holm_stepdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down multiple-testing control over the q295 A/A family
    — the UNIFORMLY-more-powerful-than-Bonferroni FWER procedure beside
    the FDR step-up (q304): p_(i) is tested against α/(m−i+1) and
    rejection stops at the FIRST failure (step-DOWN), vs BH's walk up
    from the largest passing rank. Running both on the same family is
    the textbook comparison of the two error-rate philosophies (FWER
    vs FDR) — under the A/A null both should reject nothing.

    Exactness: p values are q304's Hoeffding-bound p_nano integers off
    the shared ``_aa_salted_cells`` exact moments; the Holm comparison
    p_nano·(m−i+1) ≤ 5·10⁷ runs as exact integer cross-multiplication
    (α=0.05, m=20); the stop-at-first-failure is a prefix-MIN window
    over the 20-row ranked relation. No float enters any comparison.

    Shape at 100 TB: the q295 shape (one md5 digest per row, 20-salt
    exploded grouped pass to 40 cells); everything after is a 20-row
    relation."""
    ev = _t(spark, sf_dir, "events", parallelize=True).select(
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
        "holm_pass",
        F.expr("p_nano * (20 - rank + 1) <= 50000000"),
    )
    wpre = W.orderBy("rank").rowsBetween(W.unboundedPreceding, 0)
    return ranked.select(
        "k",
        "p_nano",
        "rank",
        "holm_pass",
        (
            F.min(F.when(F.col("holm_pass"), 1).otherwise(0)).over(wpre)
            == 1
        ).alias("rejected"),
    ).orderBy("rank")


def _q376_sql() -> str:
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
         CAST(row_number() OVER (ORDER BY p_nano, k) AS BIGINT) AS rank
  FROM scored
), flagged AS (
  SELECT k, p_nano, rank,
         p_nano * (20 - rank + 1) <= 50000000 AS holm_pass
  FROM ranked
)
SELECT k, p_nano, rank, holm_pass,
       min(CASE WHEN holm_pass THEN 1 ELSE 0 END) OVER (
         ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) = 1 AS rejected
FROM flagged
ORDER BY rank
"""


def q385_benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli FDR control over the q295 A/A family —
    completing the multiple-testing triptych (BH step-up q304 assumes
    PRDS; Holm step-down q376 controls FWER; BY is the FDR step-up
    valid under ARBITRARY dependence, paying the harmonic penalty
    c(m) = Σᵢ≤m 1/i ≈ 3.598 at m = 20). Running all three on one
    family is the textbook dependence-assumption comparison; under
    the A/A null all should reject nothing.

    Exactness: p values are q304's Hoeffding-bound p_nano integers
    off the shared ``_aa_salted_cells`` moments; c(m) enters as the
    femto-quantized harmonic sum H_f = Σ round(10¹⁵/i) (a
    deterministic integer both engines replay), making the BY
    comparison p_nano·m·H_f ≤ α_nano·k·10¹⁵ exact integer
    cross-multiplication (no float ever compared); the step-up is the
    q304 max-passing-rank window.

    Shape at 100 TB: the q295 shape — one md5-digest-per-row 20-salt
    exploded grouped pass to 40 cells; everything after is a 20-row
    relation."""
    ev = _t(spark, sf_dir, "events", parallelize=True).select(
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
    h_f = sum(round(1e15 / i) for i in range(1, 21))
    scored = cells.select("k", F.expr(p_nano).alias("p_nano"))
    w = W.orderBy("p_nano", "k")
    ranked = scored.select(
        "k", "p_nano", F.row_number().over(w).alias("rank")
    ).withColumn(
        "by_pass",
        F.expr(
            "CAST(p_nano AS DECIMAL(38,0)) * 20 * "
            f"{h_f} <= CAST(50000000 AS DECIMAL(38,0)) * rank"
            " * 1000000000000000"
        ),
    )
    wmax = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ranked.select(
        "k",
        "p_nano",
        "rank",
        "by_pass",
        (
            F.col("rank")
            <= F.coalesce(
                F.max(F.when(F.col("by_pass"), F.col("rank"))).over(wmax),
                F.lit(0),
            )
        ).alias("rejected"),
    ).orderBy("rank")


def _q385_sql() -> str:
    z = (
        "(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
        " / sqrt((CAST(ssa AS DOUBLE) / na"
        "         - (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na))"
        "        / (na - 1.0e0)"
        "        + (CAST(ssb AS DOUBLE) / nb"
        "           - (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb))"
        "          / (nb - 1.0e0))"
    )
    h_f = sum(round(1e15 / i) for i in range(1, 21))
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
         CAST(row_number() OVER (ORDER BY p_nano, k) AS BIGINT) AS rank
  FROM scored
), flagged AS (
  SELECT k, p_nano, rank,
         CAST(p_nano AS HUGEINT) * 20 * {h_f}
           <= CAST(50000000 AS HUGEINT) * rank * 1000000000000000
           AS by_pass
  FROM ranked
)
SELECT k, p_nano, rank, by_pass,
       rank <= coalesce(max(CASE WHEN by_pass THEN rank END) OVER (), 0)
         AS rejected
FROM flagged
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Round 10 — q388-q392: moment/normality, paired-rank, symmetry, reliability


_JB_MU = "(CAST(s1 AS DOUBLE) / n)"
_JB_M2 = f"(CAST(s2 AS DOUBLE) / n - {_JB_MU} * {_JB_MU})"
_JB_M3 = (
    f"(CAST(s3 AS DOUBLE) / n - 3.0e0 * {_JB_MU} * (CAST(s2 AS DOUBLE) / n)"
    f" + 2.0e0 * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_M4 = (
    f"(CAST(s4 AS DOUBLE) / n - 4.0e0 * {_JB_MU} * (CAST(s3 AS DOUBLE) / n)"
    f" + 6.0e0 * {_JB_MU} * {_JB_MU} * (CAST(s2 AS DOUBLE) / n)"
    f" - 3.0e0 * {_JB_MU} * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_S = f"({_JB_M3} / pow({_JB_M2}, 1.5e0))"
_JB_K = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3.0e0)"
_JB_T = f"(n / 6.0e0 * ({_JB_S} * {_JB_S} + {_JB_K} * {_JB_K} / 4.0e0))"
_JB_OK = f"(n >= 2 AND {_JB_M2} > 0)"


def q388_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test over event values — the MOMENT-based
    omnibus beside the EDF-based Anderson-Darling (q371): skewness S =
    m₃/m₂^1.5, excess kurtosis K = m₄/m₂² − 3, JB = n/6·(S² + K²/4),
    chi-square(2) under normality (Jarque & Bera 1980). q371 answers
    "does the empirical CDF track a normal"; this answers "are the
    third and fourth moments normal-shaped" — the pair is the standard
    normality cross-check before parametric tests (q233/q241/q372).

    Exactness: raw power sums off milli-quantized values — s1, s2 as
    exact DECIMAL(38,0)/HUGEINT; v³ and v⁴ are both computed with a
    DECIMAL(38,0)/HUGEINT leading factor (CAST(v) · v · v), so no
    per-row BIGINT overflow cliff exists — beyond the fixture range
    (values ≤ ~2000) both engines keep exact wide-integer arithmetic
    instead of Spark silently wrapping while DuckDB raises. Central moments and the JB chain are ONE identical double
    expression in both engines (shared format strings), micro-quantized.
    n < 2 or zero variance → NULL statistics.

    Shape at 100 TB: one map-side-combined 1-row aggregate over the
    value column — no shuffle of raw rows beyond the partial-agg
    exchange, no window, no join."""
    events = load_table(spark, sf_dir, "events")
    agg = events.select(
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
    ).select(
        "v",
        F.expr("v * v").alias("v2"),
        F.expr("CAST(v AS DECIMAL(38,0)) * v * v").alias("v3"),
        F.expr("CAST(v AS DECIMAL(38,0)) * v * v * v").alias("v4"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("v2").cast("decimal(38,0)")).alias("s2"),
        F.sum(F.col("v3").cast("decimal(38,0)")).alias("s3"),
        F.sum("v4").alias("s4"),
    )
    return agg.select(
        "n",
        F.expr(
            f"CASE WHEN {_JB_OK} THEN"
            f" CAST(round({_JB_S} * 1e6) AS BIGINT) END"
        ).alias("skew_micro"),
        F.expr(
            f"CASE WHEN {_JB_OK} THEN"
            f" CAST(round({_JB_K} * 1e6) AS BIGINT) END"
        ).alias("exkurt_micro"),
        F.expr(
            f"CASE WHEN {_JB_OK} THEN"
            f" CAST(round({_JB_T} * 1e6) AS BIGINT) END"
        ).alias("jb_micro"),
    )


def _q388_sql() -> str:
    return f"""
WITH v AS (
  SELECT CAST(round(value * 1000) AS BIGINT) AS v FROM events
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(v * v AS HUGEINT)) AS HUGEINT) AS s2,
         CAST(sum(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS s3,
         CAST(sum(CAST(v * v AS HUGEINT) * (v * v)) AS HUGEINT) AS s4
  FROM v
)
SELECT n,
       CASE WHEN {_JB_OK} THEN
         CAST(round({_JB_S} * 1e6) AS BIGINT) END AS skew_micro,
       CASE WHEN {_JB_OK} THEN
         CAST(round({_JB_K} * 1e6) AS BIGINT) END AS exkurt_micro,
       CASE WHEN {_JB_OK} THEN
         CAST(round({_JB_T} * 1e6) AS BIGINT) END AS jb_micro
FROM agg
"""


def q389_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test, paired by DAY: morning total value
    (hour < 12) vs evening total (hour ≥ 12) per calendar day — the
    PAIRED counterpart of Mann-Whitney (q187; unpaired) that the
    registry lacked: did the within-day value distribution shift
    between halves of the day, discounting day-scale magnitude?

    Mechanics (Wilcoxon 1945, normal approximation with tie
    correction, no continuity correction — documented): d_t = morning
    − evening per day (exact milli integers), zero diffs dropped,
    |d| ranked ascending with AVERAGE ranks; W⁺ = Σ ranks of positive
    d. To stay integer, doubled ranks are used: for each distinct |d|
    group (t ties, cum_less smaller rows), every member's doubled
    average rank is 2·cum_less + t + 1, so W2 = 2·W⁺ =
    Σ_groups p_v·(2·cum_less + t + 1) with p_v the positive-diff
    count — all exact integers. z = (W⁺ − n(n+1)/4)/√V with
    V = [2n(n+1)(2n+1) − Σ(t³−t)]/48 = M/48. Substituting W⁺ = W2/2:
    z = [(W2 − n(n+1)/2)/2]·√48/√M = (W2 − n(n+1)/2)·√12/√M — the
    closed form used identically in both engines and micro-quantized;
    the full derivation is re-done by hand in the
    tests/test_r10_suite.py pin.

    Exactness: diffs, doubled ranks, W2, M are exact integers; the
    z chain is one shared double expression micro-quantized. n = 0 →
    NULL z; M = 0 guarded.

    Shape at 100 TB: one map-side day/half aggregate collapses the
    corpus to ≤366 rows; every window below sits on that bounded
    relation (date-grouped aggregate barrier, window-gate compliant)."""
    events = load_table(spark, sf_dir, "events")
    day = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(hour(ts) < 12 AS INT)").alias("am"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.sum(F.expr("CASE WHEN am = 1 THEN v ELSE 0 END"))
            .cast("long").alias("morning"),
            F.sum(F.expr("CASE WHEN am = 0 THEN v ELSE 0 END"))
            .cast("long").alias("evening"),
        )
        .select(F.expr("morning - evening").alias("diff"))
        .filter("diff <> 0")
    )
    grp = day.groupBy(F.expr("abs(diff)").alias("absd")).agg(
        F.count("*").cast("long").alias("t"),
        F.sum(F.expr("CASE WHEN diff > 0 THEN 1 ELSE 0 END"))
        .cast("long").alias("p"),
    )
    wnd = W.orderBy("absd").rowsBetween(W.unboundedPreceding, -1)
    ranked = grp.select(
        "t",
        "p",
        F.coalesce(F.sum("t").over(wnd), F.lit(0)).alias("cum_less"),
    )
    agg = ranked.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.expr("p * (2 * cum_less + t + 1)")).cast("long").alias("w2"),
        F.sum(F.expr("t * t * t - t")).cast("long").alias("ties"),
    )
    m = "(2 * n * (n + 1) * (2 * n + 1) - ties)"
    z = (
        f"((CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2)"
        f" * sqrt(12.0e0) / sqrt(CAST({m} AS DOUBLE)))"
    )
    return agg.select(
        F.coalesce("n", F.lit(0)).alias("n_days"),
        "w2",
        F.expr(
            f"CASE WHEN n >= 1 AND {m} > 0 THEN"
            f" CAST(round({z} * 1e6) AS BIGINT) END"
        ).alias("z_micro"),
    )


def _q389_sql() -> str:
    m = "(2 * n * (n + 1) * (2 * n + 1) - ties)"
    z = (
        f"((CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2)"
        f" * sqrt(12.0e0) / sqrt(CAST({m} AS DOUBLE)))"
    )
    return f"""
WITH day AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CASE WHEN hour(ts) < 12
                       THEN CAST(round(value * 1000) AS BIGINT)
                       ELSE 0 END) AS BIGINT)
         - CAST(sum(CASE WHEN hour(ts) >= 12
                         THEN CAST(round(value * 1000) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS diff
  FROM events GROUP BY 1
), nz AS (
  SELECT diff FROM day WHERE diff <> 0
), grp AS (
  SELECT abs(diff) AS absd,
         CAST(count(*) AS BIGINT) AS t,
         CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM nz GROUP BY 1
), ranked AS (
  SELECT t, p,
         coalesce(sum(t) OVER (ORDER BY absd
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_less
  FROM grp
), agg AS (
  SELECT CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(p * (2 * cum_less + t + 1)) AS BIGINT) AS w2,
         CAST(sum(t * t * t - t) AS BIGINT) AS ties
  FROM ranked
)
SELECT coalesce(n, 0) AS n_days, w2,
       CASE WHEN n >= 1 AND {m} > 0 THEN
         CAST(round({z} * 1e6) AS BIGINT) END AS z_micro
FROM agg
"""


def q390_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker symmetry test over the event-type TRANSITION matrix —
    the k×k generalization of McNemar (q204): with n_ij the count of
    user-consecutive transitions i→j (i ≠ j), B = Σ_{i<j, n_ij+n_ji>0}
    (n_ij − n_ji)²/(n_ij + n_ji), chi-square(#cells) under the null
    that the transition matrix is symmetric (Bowker 1948). q297
    measures whether transitions DRIFT over time; this asks whether
    flows are DIRECTIONAL at all (view→purchase ≠ purchase→view).

    Exactness: transition counts are exact integers off the per-user
    lag; each cell's term is the exact cross-multiplied floor
    ((n_ij − n_ji)²·10⁶) div (n_ij + n_ji) (q118 rule — never float
    division), and B_micro is their integer sum. Cells with both
    directions zero contribute neither to B nor to df.

    Shape at 100 TB: the lag window is partitioned by user (no global
    sort); transitions collapse map-side to ≤|types|² cells; the
    symmetric fold groups those ≤k² rows by (least, greatest)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("to_t"),
        )
        .withColumn("from_t", F.lag("to_t").over(w))
        .filter("from_t IS NOT NULL AND from_t <> to_t")
    )
    cells = trans.groupBy("from_t", "to_t").agg(
        F.count("*").cast("long").alias("c")
    )
    sym = cells.groupBy(
        F.least("from_t", "to_t").alias("lo"),
        F.greatest("from_t", "to_t").alias("hi"),
    ).agg(
        F.sum(F.expr("CASE WHEN from_t < to_t THEN c ELSE 0 END"))
        .cast("long").alias("n_fwd"),
        F.sum(F.expr("CASE WHEN from_t > to_t THEN c ELSE 0 END"))
        .cast("long").alias("n_rev"),
    )
    return sym.agg(
        F.sum(F.expr("n_fwd + n_rev")).cast("long").alias("n_transitions"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(
            F.expr(
                "((n_fwd - n_rev) * (n_fwd - n_rev) * 1000000)"
                " div (n_fwd + n_rev)"
            )
        ).cast("long").alias("bowker_b_micro"),
    )


_Q390_SQL = """
WITH trans AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_t,
         event_type AS to_t
  FROM events
), cells AS (
  SELECT from_t, to_t, CAST(count(*) AS BIGINT) AS c
  FROM trans WHERE from_t IS NOT NULL AND from_t <> to_t
  GROUP BY 1, 2
), sym AS (
  SELECT least(from_t, to_t) AS lo, greatest(from_t, to_t) AS hi,
         CAST(sum(CASE WHEN from_t < to_t THEN c ELSE 0 END) AS BIGINT)
           AS n_fwd,
         CAST(sum(CASE WHEN from_t > to_t THEN c ELSE 0 END) AS BIGINT)
           AS n_rev
  FROM cells GROUP BY 1, 2
)
SELECT CAST(sum(n_fwd + n_rev) AS BIGINT) AS n_transitions,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(((n_fwd - n_rev) * (n_fwd - n_rev) * 1000000)
                // (n_fwd + n_rev)) AS BIGINT) AS bowker_b_micro
FROM sym
"""


def q391_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the user × event-type value matrix —
    internal-consistency reliability (Cronbach 1951): items = event
    types, subjects = users, score x_ui = user u's total value on type
    i (users without type-i events score 0 — absence IS the
    observation). alpha = k/(k−1)·(1 − Σᵢ var_i / var_total), where
    var_total is the variance of user TOTAL scores. The agreement
    family (Cohen q185/q308, Fleiss q346, Kendall's W q352) measures
    rater consistency on shared subjects; alpha measures whether the
    k item scores hang together as one scale.

    Exactness: per-(user, item) totals are exact milli integers; item
    sums/sum-of-squares and user-total sums/sum-of-squares are exact
    DECIMAL(38,0)/HUGEINT; each item's (N−1)-scaled variance is
    micro-quantized BEFORE the cross-item sum (≤k terms, the q372
    rule); alpha is one shared double chain, micro-quantized.
    Implicit zeros enter through N = all users, not just type-i users.
    k < 2 or zero total variance → NULL alpha.

    Shape at 100 TB: one (user, type) aggregate (map-side combine),
    then a ≤k-row item reduction and a user-keyed total reduction —
    no window, no join against raw rows."""
    events = load_table(spark, sf_dir, "events")
    ut = (
        events.select(
            "user_id",
            F.col("event_type").alias("item"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("user_id", "item")
        .agg(F.sum("v").cast("long").alias("x"))
    )
    n_users = ut.select(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    # item variance numerator, (N-1)-scaled: ss_i - s_i^2/N, with the
    # (N - cnt_i) implicit zero scores contributing 0 to both sums.
    items = (
        ut.groupBy("item")
        .agg(
            F.sum("x").cast("long").alias("s_i"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("ss_i"),
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            F.expr(
                "CAST(round((CAST(ss_i AS DOUBLE)"
                " - CAST(s_i AS DOUBLE) * s_i / n_users) * 1e6)"
                " AS DECIMAL(38,0))"
            ).alias("vnum_u")
        )
        .agg(
            F.count("*").cast("long").alias("k_items"),
            F.sum("vnum_u").alias("item_var_sum_u"),
        )
    )
    totals = (
        ut.groupBy("user_id")
        .agg(F.sum("x").cast("long").alias("t"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("t").cast("long").alias("st"),
            F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("sst"),
        )
    )
    both = items.crossJoin(F.broadcast(totals))
    tot_var = (
        "(CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / n_users)"
    )
    alpha = (
        "(CAST(k_items AS DOUBLE) / (k_items - 1)"
        f" * (1.0e0 - CAST(item_var_sum_u AS DOUBLE) / 1e6 / {tot_var}))"
    )
    return both.select(
        "k_items",
        "n_users",
        F.expr(
            f"CASE WHEN k_items >= 2 AND {tot_var} > 0 THEN"
            f" CAST(round({alpha} * 1e6) AS BIGINT) END"
        ).alias("alpha_micro"),
    )


def _q391_sql() -> str:
    tot_var = (
        "(CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / n_users)"
    )
    alpha = (
        "(CAST(k_items AS DOUBLE) / (k_items - 1)"
        f" * (1.0e0 - CAST(item_var_sum_u AS DOUBLE) / 1e6 / {tot_var}))"
    )
    return f"""
WITH ut AS (
  SELECT user_id, event_type AS item,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), nu AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut
), items AS (
  SELECT CAST(count(*) AS BIGINT) AS k_items,
         CAST(sum(vnum_u) AS HUGEINT) AS item_var_sum_u
  FROM (
    SELECT CAST(round((CAST(ss_i AS DOUBLE)
             - CAST(s_i AS DOUBLE) * s_i / nu.n_users) * 1e6) AS HUGEINT)
           AS vnum_u
    FROM (
      SELECT item, CAST(sum(x) AS BIGINT) AS s_i,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss_i
      FROM ut GROUP BY item
    ) CROSS JOIN nu
  )
), totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sst
  FROM (SELECT user_id, CAST(sum(x) AS BIGINT) AS t FROM ut GROUP BY 1)
)
SELECT k_items, n_users,
       CASE WHEN k_items >= 2 AND {tot_var} > 0 THEN
         CAST(round({alpha} * 1e6) AS BIGINT) END AS alpha_micro
FROM items CROSS JOIN totals
"""


def q392_icc_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way intraclass correlation ICC(1) with users as groups and
    their event values as repeated measurements — "how much of value
    variance is BETWEEN users?" (Shrout & Fleiss 1979 case 1, unequal
    group sizes via k₀ = (N − Σn_u²/N)/(a−1)): MSB = SSB/(a−1),
    MSW = SSW/(N−a), ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW). The ANOVA
    machinery (q233) reports whether segment means differ; ICC turns
    the same decomposition into the variance-share effect size the
    reliability literature uses.

    Exactness: per-user moments (n_u, s_u, ss_u) are exact integers
    off milli values; each user's s_u²/n_u is micro-quantized BEFORE
    the cross-user sum (the quantize-pre-sum rule — both engines round
    the same per-user double), making SSW/SSB integer arithmetic on
    DECIMAL(38,0)/HUGEINT; the final ICC chain is one shared double
    expression micro-quantized. a < 2 or N ≤ a → NULL.

    Shape at 100 TB: one user-keyed aggregate (map-side combine) then
    a 1-row reduction — no window, no join."""
    events = load_table(spark, sf_dir, "events")
    per = (
        events.select(
            "user_id",
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_u"),
            F.sum("v").cast("long").alias("s_u"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("ss_u"),
        )
        .select(
            "n_u",
            "ss_u",
            F.expr(
                "CAST(round(CAST(s_u AS DOUBLE) * s_u / n_u * 1e6)"
                " AS DECIMAL(38,0))"
            ).alias("r_u"),
            F.col("s_u"),
        )
    )
    agg = per.agg(
        F.count("*").cast("long").alias("a_groups"),
        F.sum("n_u").cast("long").alias("n_total"),
        F.sum("s_u").cast("long").alias("s_all"),
        F.sum("ss_u").alias("ss_all"),
        F.sum("r_u").alias("r_sum_u"),
        F.sum(F.expr("CAST(n_u AS DECIMAL(38,0)) * n_u")).alias("nn_sum"),
    )
    ssw = "(CAST(ss_all AS DOUBLE) - CAST(r_sum_u AS DOUBLE) / 1e6)"
    ssb = (
        "(CAST(r_sum_u AS DOUBLE) / 1e6"
        " - CAST(s_all AS DOUBLE) * s_all / n_total)"
    )
    msb = f"({ssb} / (a_groups - 1))"
    msw = f"({ssw} / (n_total - a_groups))"
    k0 = (
        "((CAST(n_total AS DOUBLE)"
        " - CAST(nn_sum AS DOUBLE) / n_total) / (a_groups - 1))"
    )
    icc = f"(({msb} - {msw}) / ({msb} + ({k0} - 1.0e0) * {msw}))"
    ok = f"(a_groups >= 2 AND n_total > a_groups AND {ssw} > 0)"
    return agg.select(
        "a_groups",
        "n_total",
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round({k0} * 1e6) AS BIGINT) END"
        ).alias("k0_micro"),
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round({icc} * 1e6) AS BIGINT) END"
        ).alias("icc_micro"),
    )


def _q392_sql() -> str:
    ssw = "(CAST(ss_all AS DOUBLE) - CAST(r_sum_u AS DOUBLE) / 1e6)"
    ssb = (
        "(CAST(r_sum_u AS DOUBLE) / 1e6"
        " - CAST(s_all AS DOUBLE) * s_all / n_total)"
    )
    msb = f"({ssb} / (a_groups - 1))"
    msw = f"({ssw} / (n_total - a_groups))"
    k0 = (
        "((CAST(n_total AS DOUBLE)"
        " - CAST(nn_sum AS DOUBLE) / n_total) / (a_groups - 1))"
    )
    icc = f"(({msb} - {msw}) / ({msb} + ({k0} - 1.0e0) * {msw}))"
    ok = f"(a_groups >= 2 AND n_total > a_groups AND {ssw} > 0)"
    return f"""
WITH per AS (
  SELECT CAST(count(*) AS BIGINT) AS n_u,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS s_u,
         CAST(sum(CAST(CAST(round(value * 1000) AS BIGINT) AS HUGEINT)
                  * CAST(round(value * 1000) AS BIGINT)) AS HUGEINT) AS ss_u
  FROM events GROUP BY user_id
), q AS (
  SELECT n_u, ss_u, s_u,
         CAST(round(CAST(s_u AS DOUBLE) * s_u / n_u * 1e6) AS HUGEINT) AS r_u
  FROM per
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS a_groups,
         CAST(sum(n_u) AS BIGINT) AS n_total,
         CAST(sum(s_u) AS BIGINT) AS s_all,
         CAST(sum(ss_u) AS HUGEINT) AS ss_all,
         CAST(sum(r_u) AS HUGEINT) AS r_sum_u,
         CAST(sum(CAST(n_u AS HUGEINT) * n_u) AS HUGEINT) AS nn_sum
  FROM q
)
SELECT a_groups, n_total,
       CASE WHEN {ok} THEN CAST(round({k0} * 1e6) AS BIGINT) END
         AS k0_micro,
       CASE WHEN {ok} THEN CAST(round({icc} * 1e6) AS BIGINT) END
         AS icc_micro
FROM agg
"""


def q401_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test over the day × event-type value matrix — the
    range-WEIGHTED repeated-measures rank test beside Friedman (q322):
    blocks = days, treatments = event types, y_ij = type j's total
    value on day i (missing cells read 0 through the explicit
    day × type grid — absence of a type on a day IS the observation).
    Blocks with a larger within-day range carry more weight
    (Quade 1979): S_ij = Q_i·(r_ij − (k+1)/2) with r_ij the within-
    block average ranks and Q_i the average rank of block ranges;
    F = (b−1)·B/(A−B), A = ΣS², B = ΣS_j²/b, F(k−1, (b−1)(k−1)).

    Exactness: FULLY integer — doubled average ranks (the q389
    2·cum_less + t + 1 device) for both the within-block ranks and
    the block-range ranks make 4·S_ij = q2_i·(r2_ij − (k+1)) an exact
    integer, and the scale factors cancel in F:
    F = (b−1)·ΣS4_j² / (b·ΣS4² − ΣS4_j²) — one integer ratio,
    micro-quantized. A = B (all discrimination between-treatment) or
    degenerate b, k < 2 → NULL.

    Shape at 100 TB: one (day, type) aggregate collapses the corpus;
    the grid, both rank passes, and the reduction run on calendar- and
    type-bounded relations (≤366·k rows)."""
    events = load_table(spark, sf_dir, "events")
    cell = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.col("event_type").alias("t"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d", "t")
        .agg(F.sum("v").cast("long").alias("y"))
    )
    days = cell.select("d").distinct()
    types = cell.select("t").distinct()
    grid = days.crossJoin(types).join(cell, ["d", "t"], "left").select(
        "d", "t", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    # within-block doubled average ranks: r2 = 2*cum_less + t + 1
    vg = grid.groupBy("d", "y").agg(F.count("*").cast("long").alias("tt"))
    wv = W.partitionBy("d").orderBy("y").rowsBetween(
        W.unboundedPreceding, -1
    )
    r2 = vg.select(
        "d", "y", "tt",
        (2 * F.coalesce(F.sum("tt").over(wv), F.lit(0)) + F.col("tt") + 1)
        .alias("r2"),
    )
    ranked = grid.join(r2, ["d", "y"]).select("d", "t", "r2")
    # block-range doubled average ranks q2 over the ≤366-day relation
    rng = grid.groupBy("d").agg(
        (F.max("y") - F.min("y")).cast("long").alias("rg")
    )
    rg_g = rng.groupBy("rg").agg(F.count("*").cast("long").alias("tt"))
    wr = W.orderBy("rg").rowsBetween(W.unboundedPreceding, -1)
    q2 = rg_g.select(
        "rg",
        (2 * F.coalesce(F.sum("tt").over(wr), F.lit(0)) + F.col("tt") + 1)
        .alias("q2"),
    )
    blocks = rng.join(q2, "rg").select("d", "q2")
    k1 = types.agg(F.count("*").cast("long").alias("k")).select(
        "k", (F.col("k") + 1).alias("kp1")
    )
    s4 = (
        ranked.join(blocks, "d")
        .crossJoin(F.broadcast(k1))
        .select("d", "t", "k", F.expr("q2 * (r2 - kp1)").alias("s4"))
    )
    per_t = s4.groupBy("t").agg(
        F.max("k").alias("k"),
        F.sum("s4").cast("long").alias("s4j"),
        F.sum(F.expr("CAST(s4 AS DECIMAL(38,0)) * s4")).alias("ss4"),
    )
    agg = per_t.agg(
        F.max("k").cast("long").alias("k_types"),
        F.sum(F.expr("CAST(s4j AS DECIMAL(38,0)) * s4j")).alias("bsum"),
        F.sum("ss4").alias("asum"),
    ).crossJoin(
        F.broadcast(days.agg(F.count("*").cast("long").alias("b_days")))
    )
    f = (
        "(CAST((b_days - 1) AS DOUBLE) * CAST(bsum AS DOUBLE)"
        " / (CAST(b_days AS DOUBLE) * CAST(asum AS DOUBLE)"
        " - CAST(bsum AS DOUBLE)))"
    )
    ok = (
        "(b_days >= 2 AND k_types >= 2"
        " AND CAST(b_days AS DOUBLE) * CAST(asum AS DOUBLE)"
        " > CAST(bsum AS DOUBLE))"
    )
    return agg.select(
        "b_days",
        "k_types",
        F.expr(
            f"CASE WHEN {ok} THEN CAST(round({f} * 1e6) AS BIGINT) END"
        ).alias("quade_f_micro"),
    )


def _q401_sql() -> str:
    f = (
        "(CAST((b_days - 1) AS DOUBLE) * CAST(bsum AS DOUBLE)"
        " / (CAST(b_days AS DOUBLE) * CAST(asum AS DOUBLE)"
        " - CAST(bsum AS DOUBLE)))"
    )
    ok = (
        "(b_days >= 2 AND k_types >= 2"
        " AND CAST(b_days AS DOUBLE) * CAST(asum AS DOUBLE)"
        " > CAST(bsum AS DOUBLE))"
    )
    return f"""
WITH cell AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS t,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT dd.d, tt.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT d FROM cell) dd
  CROSS JOIN (SELECT DISTINCT t FROM cell) tt
  LEFT JOIN cell c ON c.d = dd.d AND c.t = tt.t
), vg AS (
  SELECT d, y, CAST(count(*) AS BIGINT) AS tt FROM grid GROUP BY 1, 2
), r2 AS (
  SELECT d, y,
         2 * coalesce(sum(tt) OVER (PARTITION BY d ORDER BY y
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) + tt + 1 AS r2
  FROM vg
), ranked AS (
  SELECT g.d, g.t, r2.r2 FROM grid g JOIN r2 ON r2.d = g.d AND r2.y = g.y
), rng AS (
  SELECT d, CAST(max(y) - min(y) AS BIGINT) AS rg FROM grid GROUP BY d
), rg_g AS (
  SELECT rg, CAST(count(*) AS BIGINT) AS tt FROM rng GROUP BY rg
), q2 AS (
  SELECT rg,
         2 * coalesce(sum(tt) OVER (ORDER BY rg
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) + tt + 1 AS q2
  FROM rg_g
), blocks AS (
  SELECT rng.d, q2.q2 FROM rng JOIN q2 USING (rg)
), k1 AS (
  SELECT CAST(count(DISTINCT t) AS BIGINT) AS k,
         CAST(count(DISTINCT t) + 1 AS BIGINT) AS kp1
  FROM cell
), s4 AS (
  SELECT r.t, k1.k, blocks.q2 * (r.r2 - k1.kp1) AS s4
  FROM ranked r JOIN blocks ON blocks.d = r.d CROSS JOIN k1
), per_t AS (
  SELECT t, CAST(max(k) AS BIGINT) AS k,
         CAST(sum(s4) AS BIGINT) AS s4j,
         CAST(sum(CAST(s4 AS HUGEINT) * s4) AS HUGEINT) AS ss4
  FROM s4 GROUP BY t
), agg AS (
  SELECT CAST(max(k) AS BIGINT) AS k_types,
         CAST(sum(CAST(s4j AS HUGEINT) * s4j) AS HUGEINT) AS bsum,
         CAST(sum(ss4) AS HUGEINT) AS asum
  FROM per_t
), bd AS (
  SELECT CAST(count(DISTINCT d) AS BIGINT) AS b_days FROM cell
)
SELECT b_days, k_types,
       CASE WHEN {ok} THEN CAST(round({f} * 1e6) AS BIGINT) END
         AS quade_f_micro
FROM agg CROSS JOIN bd
"""
