"""Mechanically split from plans/relational.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...operators.joins import asof_join
from ...operators.quality import quality_report
from ...sources.files import load_table


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    return load_table(spark, sf_dir, name, parallelize=parallelize)


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
