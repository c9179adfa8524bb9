"""Mechanically split from plans/relational.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...operators.joins import asof_join
from ...operators.quality import quality_report
from ...sources.files import load_table
from ._shared import (
    _COXSTUART_CORE,
    _DW_CORE,
    _PAGE_CORE,
    _PH_CORE,
    _TURNING_CORE,
    _calendar_series,
    _dec,
    _lb_render,
    _t,
)


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


def q74_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 through the engine's SQL surface: tables registered as temp
    views (sources/files.register_views), the query itself a single
    ``spark.sql`` string — proof that the full Catalyst SQL front-end is a
    first-class entry point, not just the DataFrame DSL. Revenue sums in
    DECIMAL (exact, order-independent — see _dec). The plan is the one
    Q6 wants: all three predicates pushed into the parquet scan, one
    partial+final aggregate, no shuffle beyond the 1-row combine."""
    from ...sources.files import register_views

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
    from ...operators.incremental import gap_fill_hourly

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...operators.graph import copurchase_edges, kcore_peel

    li = _t(spark, sf_dir, "lineitem", parallelize=True)
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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...operators.graph import copurchase_edges
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem"], parallelize=True)
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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...operators.graph import copurchase_edges, label_propagation_trajectory
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["lineitem"], parallelize=True)
    # Eager checkpoint (r12): the edge relation feeds BOTH the degree/hub
    # branch and the residual anti-join, and the expensive pair-explosion
    # derivation was re-executed once per branch inside the double build
    # (paired A/B: residual double build 4.1 -> 2.7 s warm with it).
    e = copurchase_edges(
        spark.table("lineitem"), max_basket=100
    ).localCheckpoint(eager=True)
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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_PAGE_CORE.format(
        day_expr="unix_micros(ts) div 86400000000", idiv="div"
    ))


_Q347_SQL = _PAGE_CORE.format(day_expr="epoch_us(ts) // 86400000000",
                              idiv="//")


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
    from ...sources.files import register_views

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
    from ...sources.files import register_views

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


def q374_kuiper_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's V test of weekday uniformity per event type — the
    CIRCULAR counterpart of the KS uniformity family (q186/q309):
    V = D⁺ + D⁻ is invariant to where the week 'starts', so a
    mid-week activity bump scores identically whether the CDF is
    anchored on Sunday or Wednesday — exactly the property a
    day-of-week seasonality audit needs (KS itself is anchor-
    dependent; q298 profiles the same cells descriptively).

    Exactness: ZERO doubles anywhere. Weekday = epoch-day mod 7 (an
    engine-neutral integer; dayofweek() conventions differ between
    engines). On the 7-cell-per-type grid (missing weekdays
    materialized as zero via an explode of the bounded type relation),
    D⁺ and D⁻ are exact-integer numerators over the common
    denominator 7n: D⁺·7n = max_i(7·cum_i − i·n) and
    D⁻·7n = max_i(i·n − 7·cum_{i−1}), and
    v_ppm = ((D⁺+D⁻ numerators)·10⁶) div (7n) is one integer
    division. Engine-identical by construction.

    Shape at 100 TB: one map-side-combined (type, weekday) count
    collapse (≤ 7·|types| cells), the grid explode on the ≤|types|
    aggregate, windows partitioned per type over 7 rows, a ≤|types|
    rollup. No raw-row sort, no corpus join."""
    events = load_table(spark, sf_dir, "events")
    cnt = (
        events.select(
            "event_type",
            F.expr(
                "pmod(datediff(to_date(ts), DATE '1970-01-01'), 7)"
            ).alias("wd"),
        )
        .groupBy("event_type", "wd")
        .agg(F.count("*").alias("c"))
    )
    grid = (
        cnt.groupBy("event_type")
        .agg(F.sum("c").cast("long").alias("n"))
        .select(
            "event_type",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("wd"),
        )
        .join(cnt, ["event_type", "wd"], "left")
        .select(
            "event_type",
            "n",
            "wd",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    w = W.partitionBy("event_type").orderBy("wd").rowsBetween(
        W.unboundedPreceding, 0
    )
    steps = grid.select(
        "event_type",
        "n",
        (F.col("wd") + 1).alias("i"),
        F.sum("c").over(w).alias("cum"),
    ).select(
        "event_type",
        "n",
        (F.lit(7) * F.col("cum") - F.col("i") * F.col("n")).alias("dp"),
        (
            F.col("i") * F.col("n")
            - F.lit(7)
            * F.lag("cum", 1, 0).over(
                W.partitionBy("event_type").orderBy("i")
            )
        ).alias("dm"),
    )
    return (
        steps.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.max("dp").alias("dpn"),
            F.max("dm").alias("dmn"),
        )
        .select(
            "event_type",
            "n_events",
            F.expr(
                "CAST(((dpn + dmn) * 1000000) div (7 * n_events)"
                " AS BIGINT)"
            ).alias("v_ppm"),
        )
        .orderBy("event_type")
    )


_Q374_SQL = """
WITH cnt AS (
  SELECT event_type,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS wd,
         CAST(count(*) AS BIGINT) AS c
  FROM events
  GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
), grid AS (
  SELECT t.event_type, t.n, g.wd, coalesce(c.c, 0) AS c
  FROM tot t
  CROSS JOIN (SELECT unnest(range(0, 7)) AS wd) g
  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.wd = g.wd
), steps AS (
  SELECT event_type, n, wd + 1 AS i,
         sum(c) OVER (PARTITION BY event_type ORDER BY wd
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM grid
), nums AS (
  SELECT event_type, n,
         7 * cum - i * n AS dp,
         i * n - 7 * coalesce(lag(cum) OVER (
           PARTITION BY event_type ORDER BY i), 0) AS dm
  FROM steps
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(((max(dp) + max(dm)) * 1000000) // (7 * max(n)) AS BIGINT)
         AS v_ppm
FROM nums
GROUP BY event_type
ORDER BY event_type
"""


def q375_grubbs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max-outlier statistic on the daily event-count series —
    G = max|c_d − c̄|/s, the single-most-discordant-day screen that
    complements the sequential changepoint detectors (CUSUM q190,
    Pettitt q238, Page-Hinkley q324): those find level SHIFTS, Grubbs
    flags one anomalous day against an otherwise stable series (the
    batch twin of the rate-anomaly monitor q118's z-threshold, scored
    on the corpus archive with the day identified).

    Exactness: daily counts are exact integers; the argmax day is
    chosen by the EXACT integer key |c·n − S| (equivalent to
    |c − mean| without any division), ties broken on the earlier day
    — engine-identical selection. G is one final double chain over
    the exact moments (n, S, SS), micro-quantized. Fewer than 3 days
    or exactly zero variance (integer identity n·SS = S²) → NULL
    statistic and NULL day, n_days still reported.

    Shape at 100 TB: the corpus collapses to the ≤|days| daily
    relation in one map-side-combined aggregation; the single
    unpartitioned window runs on that bounded aggregate output (the
    house two-phase rule; the registry-wide window gate proves it)."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("c"))
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ss"),
    )
    ranked = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "dev_num",
            F.expr("abs(CAST(c AS DECIMAL(38,0)) * n"
                   " - CAST(s AS DECIMAL(38,0)))"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.col("dev_num").desc(), F.col("d").asc())
            ),
        )
        .filter(F.col("rn") == 1)
    )
    gexpr = (
        "(CAST(dev_num AS DOUBLE) / n"
        " / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        "        / (n - 1)))"
    )
    ok = (
        "(n >= 3 AND CAST(n AS DECIMAL(38,0)) * ss"
        " > CAST(s AS DECIMAL(38,0)) * s)"
    )
    return ranked.select(
        F.col("n").alias("n_days"),
        F.expr(f"CASE WHEN {ok} THEN d END").alias("outlier_day"),
        F.expr(f"CASE WHEN {ok} THEN CAST(c AS BIGINT) END").alias(
            "outlier_count"
        ),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round({gexpr} * 1e6) AS BIGINT) END"
        ).alias("g_micro"),
    )


_Q375_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM daily
), ranked AS (
  SELECT d, c, n, s, ss,
         abs(CAST(c AS HUGEINT) * n - CAST(s AS HUGEINT)) AS dev_num,
         row_number() OVER (
           ORDER BY abs(CAST(c AS HUGEINT) * n - CAST(s AS HUGEINT)) DESC,
                    d ASC) AS rn
  FROM daily CROSS JOIN tot
)
SELECT n AS n_days,
       CASE WHEN n >= 3 AND CAST(n AS HUGEINT) * ss
                 > CAST(s AS HUGEINT) * s THEN d END AS outlier_day,
       CASE WHEN n >= 3 AND CAST(n AS HUGEINT) * ss
                 > CAST(s AS HUGEINT) * s THEN CAST(c AS BIGINT) END
         AS outlier_count,
       CASE WHEN n >= 3 AND CAST(n AS HUGEINT) * ss
                 > CAST(s AS HUGEINT) * s THEN
         CAST(round(CAST(dev_num AS DOUBLE) / n
              / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1)) * 1e6) AS BIGINT) END AS g_micro
FROM ranked
WHERE rn = 1
"""


def q379_pot_gpd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD fit on daily revenue — the
    EXCEEDANCE-side extreme-value model beside the block-maxima Gumbel
    (q248): threshold u = the p90 daily total (exact order statistic),
    exceedances y = v − u for v > u, and the method-of-moments GPD
    shape/scale ξ̂ = ½(1 − m²/s²), σ̂ = ½m(m²/s² + 1) (Hosking &
    Wallis 1987) — the capacity-planning tail model ("how bad is a
    bad day beyond the p90") that a return-level table extrapolates
    from.

    Exactness: daily totals are exact cent BIGINTs; u is the row at
    rank ceil(0.9·n) in exact (value, day) order — engine-identical
    selection; exceedance moments (n_e, Σy, Σy²) are exact integers
    (Σy² in DECIMAL(38,0)); ξ̂/σ̂ are one final double chain,
    micro-quantized. Fewer than 3 exceedances or zero exceedance
    variance (integer identity) → NULL estimates, counts still
    reported.

    Shape at 100 TB: one map-side-combined daily collapse; the order
    statistic and moments run on the bounded ≤|days| relation (the
    single unpartitioned window ranks an aggregate output — window
    gate proved)."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    n_rel = daily.agg(F.count("*").cast("long").alias("n"))
    u_rel = (
        daily.crossJoin(F.broadcast(n_rel))
        .withColumn(
            "rk", F.row_number().over(W.orderBy("v", "d"))
        )
        .filter(F.expr("rk = CAST((9 * n + 9) div 10 AS INT)"))
        .select(F.col("v").alias("u"), "n")
    )
    exc = (
        daily.crossJoin(F.broadcast(u_rel))
        .filter(F.col("v") > F.col("u"))
        .select("u", "n", (F.col("v") - F.col("u")).alias("y"))
    )
    agg = exc.groupBy("u", "n").agg(
        F.count("*").cast("long").alias("ne"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    m = "(CAST(sy AS DOUBLE) / ne)"
    s2 = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ne) / (ne - 1))"
    ratio = f"({m} * {m} / {s2})"
    ok = (
        "(ne >= 3 AND CAST(ne AS DECIMAL(38,0)) * syy"
        " > CAST(sy AS DECIMAL(38,0)) * sy)"
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("u").alias("u_cents"),
        F.col("ne").alias("n_exceed"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round(0.5e0 * (1.0e0 - {ratio}) * 1e6) AS BIGINT) END"
        ).alias("xi_micro"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round(0.5e0 * {m} * ({ratio} + 1.0e0) * 1e6)"
            " AS BIGINT) END"
        ).alias("sigma_cents_micro"),
    )


_Q379_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1
), nrel AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM daily
), u_rel AS (
  SELECT v AS u, n FROM (
    SELECT v, n, row_number() OVER (ORDER BY v, d) AS rk
    FROM daily CROSS JOIN nrel
  ) WHERE rk = (9 * n + 9) // 10
), exc AS (
  SELECT u, n, v - u AS y
  FROM daily CROSS JOIN u_rel
  WHERE v > u
), agg AS (
  SELECT u, n,
         CAST(count(*) AS BIGINT) AS ne,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM exc GROUP BY u, n
)
SELECT n AS n_days, u AS u_cents, ne AS n_exceed,
       CASE WHEN ne >= 3 AND CAST(ne AS HUGEINT) * syy
                 > CAST(sy AS HUGEINT) * sy THEN
         CAST(round(0.5e0 * (1.0e0
           - (CAST(sy AS DOUBLE) / ne) * (CAST(sy AS DOUBLE) / ne)
             / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ne)
                / (ne - 1))) * 1e6) AS BIGINT) END AS xi_micro,
       CASE WHEN ne >= 3 AND CAST(ne AS HUGEINT) * syy
                 > CAST(sy AS HUGEINT) * sy THEN
         CAST(round(0.5e0 * (CAST(sy AS DOUBLE) / ne)
           * ((CAST(sy AS DOUBLE) / ne) * (CAST(sy AS DOUBLE) / ne)
              / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ne)
                 / (ne - 1)) + 1.0e0) * 1e6) AS BIGINT) END
         AS sigma_cents_micro
FROM agg
"""


def q380_record_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record test on the daily event-count series: the
    observed count of strict prefix-maximum days R against its
    exchangeability expectation H_n = Σ1/k and variance
    Σ(1/k − 1/k²) (classical record statistics; Foster & Stuart) —
    a distribution-free growth detector beside the rank trend tests
    (Mann-Kendall q301, Cox-Stuart q354): under a stationary
    exchangeable series records arrive at harmonic rate, and a
    growing series sets records far faster.

    Exactness: daily counts and the record indicator are exact
    integers (strict > over the exact prefix max; ties never count,
    the conservative direction); each harmonic/variance term is
    quantized to femto BIGINT BEFORE the sum, so the cross-day sums
    are integer and order-independent. z is one final double chain,
    micro-quantized; below 2 days or zero variance → NULL z.

    Shape at 100 TB: one daily collapse; the prefix-max and rank
    windows run on the bounded ≤|days| aggregate output."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_prev = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    w_rank = W.orderBy("d")
    terms = daily.select(
        "d",
        "c",
        F.max("c").over(w_prev).alias("pm"),
        F.row_number().over(w_rank).alias("k"),
    ).select(
        F.expr(
            "CASE WHEN pm IS NULL OR c > pm THEN 1 ELSE 0 END"
        ).alias("rec"),
        F.expr("CAST(round(1e15 / k) AS BIGINT)").alias("h_f"),
        F.expr(
            "CAST(round(1e15 / k) AS BIGINT)"
            " - CAST(round(1e15 / (CAST(k AS DOUBLE) * k)) AS BIGINT)"
        ).alias("v_f"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("rec").cast("long").alias("n_records"),
        F.sum("h_f").cast("long").alias("h_sum_f"),
        F.sum("v_f").cast("long").alias("v_sum_f"),
    )
    z = (
        "((CAST(n_records AS DOUBLE) - CAST(h_sum_f AS DOUBLE) / 1e15)"
        " / sqrt(CAST(v_sum_f AS DOUBLE) / 1e15))"
    )
    return agg.select(
        "n_days",
        "n_records",
        F.expr(
            "CAST(round(CAST(h_sum_f AS DOUBLE) / 1e15 * 1e6) AS BIGINT)"
        ).alias("expected_micro"),
        F.expr(
            f"CASE WHEN n_days >= 2 AND v_sum_f > 0 THEN"
            f" CAST(round({z} * 1e6) AS BIGINT) END"
        ).alias("z_micro"),
    )


_Q380_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), terms AS (
  SELECT CASE WHEN pm IS NULL OR c > pm THEN 1 ELSE 0 END AS rec,
         CAST(round(1e15 / k) AS BIGINT) AS h_f,
         CAST(round(1e15 / k) AS BIGINT)
           - CAST(round(1e15 / (CAST(k AS DOUBLE) * k)) AS BIGINT) AS v_f
  FROM (
    SELECT c,
           max(c) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pm,
           row_number() OVER (ORDER BY d) AS k
    FROM daily
  )
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(rec) AS BIGINT) AS n_records,
         CAST(sum(h_f) AS BIGINT) AS h_sum_f,
         CAST(sum(v_f) AS BIGINT) AS v_sum_f
  FROM terms
)
SELECT n_days, n_records,
       CAST(round(CAST(h_sum_f AS DOUBLE) / 1e15 * 1e6) AS BIGINT)
         AS expected_micro,
       CASE WHEN n_days >= 2 AND v_sum_f > 0 THEN
         CAST(round((CAST(n_records AS DOUBLE)
                     - CAST(h_sum_f AS DOUBLE) / 1e15)
                    / sqrt(CAST(v_sum_f AS DOUBLE) / 1e15) * 1e6)
              AS BIGINT) END AS z_micro
FROM agg
"""


def q382_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the per-user spend tail index — the
    order-statistics member of the extreme-value family (block maxima
    → Gumbel q248, exceedances → GPD q379, tail slope → this):
    ξ̂ = (1/k)·Σᵢ≤k ln(x₍ᵢ₎/x₍k+1₎) over the k = 100 largest
    positive user totals — the "how heavy is the whale tail" number
    that decides whether mean-based capacity planning is even valid
    (ξ ≥ 1 ⇒ infinite mean tail).

    Exactness: user totals are exact cent BIGINTs; the top-(k+1) draw
    is a TakeOrdered on exact (total DESC, user_id) — engine-identical
    at ties, and tied boundary values leave ξ̂ unchanged (equal ln
    contributions); each ln ratio is quantized to micro BIGINT BEFORE
    the k-row sum. k adapts to small corpora as
    min(100, n_pos − 1); below 2 positive users the estimator has no
    reference order statistic and the relation is empty.

    Shape at 100 TB: one map-side-combined user collapse, one bounded
    TakeOrdered(101), arithmetic on the ≤101-row relation."""
    events = load_table(spark, sf_dir, "events")
    k = 100
    users = (
        events.select(
            "user_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").cast("long").alias("x"))
        .filter(F.col("x") > 0)
    )
    n_rel = users.agg(F.count("*").cast("long").alias("n_pos"))
    top = users.orderBy(F.col("x").desc(), "user_id").limit(k + 1)
    ranked = top.withColumn(
        "rk", F.row_number().over(W.orderBy(F.col("x").desc(), "user_id"))
    ).crossJoin(F.broadcast(n_rel))
    xk1 = ranked.filter(
        F.expr(f"rk = least({k + 1}, n_pos)")
    ).select(F.col("x").alias("xk1"))
    lnterms = (
        ranked.filter(F.expr(f"rk <= least({k}, n_pos - 1)"))
        .crossJoin(F.broadcast(xk1))
        .select(
            F.expr(
                "CAST(round(ln(CAST(x AS DOUBLE) / xk1) * 1e6) AS BIGINT)"
            ).alias("ln_u"),
            "xk1",
            "n_pos",
        )
    )
    return (
        lnterms.groupBy("n_pos", "xk1")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.sum("ln_u").cast("long").alias("ln_sum_u"),
        )
        .select(
            "n_pos",
            F.col("k_used").alias("k"),
            F.col("xk1").alias("x_kplus1_cents"),
            F.expr(
                "CAST(round(CAST(ln_sum_u AS DOUBLE) / 1e6 / k_used * 1e6)"
                " AS BIGINT)"
            ).alias("hill_xi_micro"),
        )
    )


_Q382_SQL = """
WITH users AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events
  GROUP BY user_id
  HAVING sum(CAST(round(value * 100) AS BIGINT)) > 0
), nrel AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos FROM users
), ranked AS (
  SELECT x, rk, n_pos FROM (
    SELECT x, row_number() OVER (ORDER BY x DESC, user_id) AS rk
    FROM users
    ORDER BY x DESC, user_id
    LIMIT 101
  ) CROSS JOIN nrel
), xk1 AS (
  SELECT x AS xk1 FROM ranked WHERE rk = least(101, n_pos)
), agg AS (
  SELECT n_pos, xk1,
         CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(CAST(round(ln(CAST(x AS DOUBLE) / xk1) * 1e6)
                       AS BIGINT)) AS BIGINT) AS ln_sum_u
  FROM ranked CROSS JOIN xk1
  WHERE rk <= least(100, n_pos - 1)
  GROUP BY n_pos, xk1
)
SELECT n_pos, k_used AS k, xk1 AS x_kplus1_cents,
       CAST(round(CAST(ln_sum_u AS DOUBLE) / 1e6 / k_used * 1e6)
            AS BIGINT) AS hill_xi_micro
FROM agg
"""


def q383_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected shortfall (CVaR) of daily revenue at the 90% level —
    the TAIL MEAN companion of the order-statistic threshold (q379
    models the exceedance SHAPE; this reports the single
    capacity/risk number "how big is an average top-decile day"):
    the top n − ceil(0.9·n) days by exact (value, day) rank, their
    mean, and their share of total revenue.

    Exactness: FULLY integer — the tail is rank-selected (not
    value-thresholded, so ties never change the tail size), the mean
    is an exact integer milli division (Σv·1000 div n_tail) and the
    share an integer ppm. Below 1 tail row (n < 2... ceil makes
    n_tail ≥ 1 for n ≥ 10; n_tail = 0 only when ceil(0.9n) = n) →
    empty-tail guard reports NULLs with counts.

    Shape at 100 TB: one daily collapse; one rank window over the
    bounded ≤|days| aggregate; a 1-row reduction."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    n_rel = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("tot"),
    )
    ranked = daily.crossJoin(F.broadcast(n_rel)).withColumn(
        "rk", F.row_number().over(W.orderBy(F.col("v").desc(), "d"))
    )
    agg = (
        ranked.filter(F.expr("rk <= n - (9 * n + 9) div 10"))
        .groupBy("n", "tot")
        .agg(
            F.count("*").cast("long").alias("n_tail"),
            F.sum("v").cast("long").alias("tail_sum"),
        )
    )
    return n_rel.join(
        agg.select("n", "n_tail", "tail_sum"), "n", "left"
    ).select(
        F.col("n").alias("n_days"),
        F.coalesce("n_tail", F.lit(0)).cast("long").alias("n_tail"),
        F.expr(
            "CASE WHEN n_tail > 0 THEN (tail_sum * 1000) div n_tail END"
        ).alias("es_cents_milli"),
        F.expr(
            "CASE WHEN n_tail > 0 AND tot > 0 THEN"
            " (tail_sum * 1000000) div tot END"
        ).alias("tail_share_ppm"),
    )


_Q383_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1
), nrel AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS tot
  FROM daily
), ranked AS (
  SELECT v, n, tot, row_number() OVER (ORDER BY v DESC, d) AS rk
  FROM daily CROSS JOIN nrel
), agg AS (
  SELECT n,
         CAST(count(*) AS BIGINT) AS n_tail,
         CAST(sum(v) AS BIGINT) AS tail_sum
  FROM ranked
  WHERE rk <= n - (9 * n + 9) // 10
  GROUP BY n
)
SELECT nrel.n AS n_days,
       coalesce(agg.n_tail, 0) AS n_tail,
       CASE WHEN agg.n_tail > 0 THEN (agg.tail_sum * 1000) // agg.n_tail
       END AS es_cents_milli,
       CASE WHEN agg.n_tail > 0 AND nrel.tot > 0 THEN
         (agg.tail_sum * 1000000) // nrel.tot END AS tail_share_ppm
FROM nrel LEFT JOIN agg ON agg.n = nrel.n
"""


def q386_variogram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical variogram of the daily event-count series at lags
    h ∈ {1, 2, 4, 8} days: γ(h) = ½·mean((c_{t+h} − c_t)²) over
    calendar-aligned day pairs — the INCREMENT-based dependence
    profile beside the correlation-based ACF (q188): the variogram is
    defined under trends and level shifts where the stationary ACF is
    not (intrinsic vs second-order stationarity), so a growing series
    still yields an interpretable scale-vs-lag curve (flat ⇒ white
    noise, rising ⇒ persistent structure).

    Exactness: all increments are exact integer differences of daily
    counts over EXACT calendar alignment (d+h join; missing days
    simply form no pair, the standard irregular-series treatment);
    squared increments accumulate in DECIMAL(38,0); the reported
    γ(h) is an exact integer milli division (Σδ²·1000 div (2·n_h)).
    Lags with no pairs report NULL.

    Shape at 100 TB: one daily collapse; per-lag self-joins on the
    bounded ≤|days| relation keyed on the exact date (broadcast-
    sized); a 4-row result."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("c"))
    )
    lagged = daily.select(
        "d",
        "c",
        F.explode(
            F.array(*[F.lit(h) for h in (1, 2, 4, 8)])
        ).alias("h"),
    ).withColumn("d2", F.expr("date_add(d, h)"))
    pairs = lagged.alias("a").join(
        daily.alias("b"), F.col("a.d2") == F.col("b.d")
    ).select(
        F.col("a.h").alias("h"),
        (F.col("b.c") - F.col("a.c")).alias("delta"),
    )
    agg = pairs.groupBy("h").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.expr("CAST(delta AS DECIMAL(38,0)) * delta")).alias("ss"),
    )
    grid = daily.agg(F.count("*").alias("_n")).select(
        F.explode(F.array(*[F.lit(h) for h in (1, 2, 4, 8)])).alias("h")
    )
    return (
        grid.join(agg, "h", "left")
        .select(
            F.col("h").cast("long").alias("lag_days"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.expr(
                "CASE WHEN n_pairs > 0 THEN"
                " CAST((ss * 1000) div (2 * n_pairs) AS BIGINT) END"
            ).alias("gamma_milli"),
        )
        .orderBy("lag_days")
    )


_Q386_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), lagged AS (
  SELECT d, c, h.h, d + CAST(h.h AS INTEGER) AS d2
  FROM daily
  CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS h) h
), pairs AS (
  SELECT l.h, b.c - l.c AS delta
  FROM lagged l JOIN daily b ON b.d = l.d2
), agg AS (
  SELECT h,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CAST(delta AS HUGEINT) * delta) AS HUGEINT) AS ss
  FROM pairs GROUP BY h
), grid AS (
  SELECT unnest([1, 2, 4, 8]) AS h
)
SELECT CAST(g.h AS BIGINT) AS lag_days,
       coalesce(a.n_pairs, 0) AS n_pairs,
       CASE WHEN a.n_pairs > 0 THEN
         CAST((a.ss * 1000) // (2 * a.n_pairs) AS BIGINT) END
         AS gamma_milli
FROM grid g LEFT JOIN agg a ON a.h = g.h
ORDER BY lag_days
"""


# ---------------------------------------------------------------------------
# Round 10 — q393-q395: stationarity, conditional heteroscedasticity,
# robust paired shift


def q393_kpss_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic over the daily mean-value
    series — the null-reversed complement of the registry's trend
    tests (Mann-Kendall q301 tests FOR trend; KPSS tests AGAINST
    stationarity, Kwiatkowski-Phillips-Schmidt-Shin 1992): with
    e_t = y_t − ȳ and partial sums S_t, η = n⁻² Σ S_t² / σ̂²,
    σ̂² = n⁻¹ Σ e_t² (lag-0 long-run variance — the iid short-run
    form, documented; a Bartlett-kernel bandwidth would enter only
    the denominator).

    Exactness: daily means are milli-quantized integers m_t (rounded
    from exact per-day integer sums — both engines round the same
    double); demeaning is done n-SCALED to stay integer:
    E_t = n·m_t − Σm, S_t = running Σ E. The statistic collapses to
    the exact integer ratio η = Σ S_t² / (n · Σ E_t²) (the n-scalings
    cancel: S_t(e) = S_t(E)/n, σ̂² = ΣE²/n³), micro-quantized in one
    shared double division. Σ E_t² = 0 (constant series) → NULL.

    Shape at 100 TB: one map-side daily aggregate collapses the corpus
    to ≤366 rows; the running sum is a window over that bounded
    date-grouped relation; two broadcast 1-row scalars."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("m")
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("m").cast("long").alias("sm"),
    )
    e = daily.crossJoin(F.broadcast(tot)).select(
        "d", "n", F.expr("n * m - sm").alias("ee")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    s = e.select("n", "ee", F.sum("ee").over(w).alias("st"))
    agg = s.agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(F.expr("CAST(ee AS DECIMAL(38,0)) * ee")).alias("den0"),
        F.sum(F.expr("CAST(st AS DECIMAL(38,0)) * st")).alias("num"),
    )
    return agg.select(
        "n_days",
        F.expr(
            "CASE WHEN den0 > 0 THEN"
            " CAST(round(CAST(num AS DOUBLE)"
            " / (CAST(n_days AS DOUBLE) * CAST(den0 AS DOUBLE)) * 1e6)"
            " AS BIGINT) END"
        ).alias("kpss_micro"),
    )


_Q393_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS m
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS sm
  FROM daily
), e AS (
  SELECT d, n, n * m - sm AS ee FROM daily CROSS JOIN tot
), s AS (
  SELECT n, ee,
         sum(ee) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS st
  FROM e
), agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_days,
         CAST(sum(CAST(ee AS HUGEINT) * ee) AS HUGEINT) AS den0,
         CAST(sum(CAST(st AS HUGEINT) * st) AS HUGEINT) AS num
  FROM s
)
SELECT n_days,
       CASE WHEN den0 > 0 THEN
         CAST(round(CAST(num AS DOUBLE)
              / (CAST(n_days AS DOUBLE) * CAST(den0 AS DOUBLE)) * 1e6)
              AS BIGINT) END AS kpss_micro
FROM agg
"""


_ARCH_R2 = (
    "(pow(CAST(n1 AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2.0e0)"
    " / ((CAST(n1 AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n1 AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
)
_ARCH_OK = (
    "(n1 >= 2 AND CAST(n1 AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " > CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    " AND CAST(n1 AS DOUBLE) * CAST(syy AS DOUBLE)"
    " > CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)


def q394_arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH(1) LM test over the daily mean-value series — does
    today's squared deviation predict tomorrow's (volatility
    clustering)? Ljung-Box (q344) autocorrelates the LEVELS; this
    autocorrelates the SQUARES: regress e²_t on e²_{t−1}, LM =
    (n−1)·R², chi-square(1) under homoscedasticity (Engle 1982).

    Exactness: e_t is the n-scaled integer demeaned series of q393
    (E_t = n·m_t − Σm off rounded daily mean milli integers);
    u_t = E_t² is exact BIGINT; the lag pairing is a window over the
    bounded daily relation; all five regression moments are exact
    DECIMAL(38,0)/HUGEINT sums. R² is scale-invariant, so regressing
    the n²-scaled u keeps R² exactly the textbook value; the R²/LM
    chain is one shared double expression, micro-quantized.
    Degenerate variance (constant u) → NULL.

    Shape at 100 TB: the q393 shape — daily map-side collapse, lag +
    running windows on ≤366 rows, 1-row reduction."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("m")
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("m").cast("long").alias("sm"),
    )
    u = daily.crossJoin(F.broadcast(tot)).select(
        "d", "n", F.expr("(n * m - sm) * (n * m - sm)").alias("u")
    )
    w = W.orderBy("d")
    pair = u.select(
        "n", F.col("u").alias("y"), F.lag("u").over(w).alias("x")
    ).filter("x IS NOT NULL")
    agg = pair.agg(
        F.max("n").cast("long").alias("n_days"),
        F.count("*").cast("long").alias("n1"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    return agg.select(
        "n_days",
        "n1",
        F.expr(
            f"CASE WHEN {_ARCH_OK} THEN"
            f" CAST(round({_ARCH_R2} * 1e6) AS BIGINT) END"
        ).alias("r2_micro"),
        F.expr(
            f"CASE WHEN {_ARCH_OK} THEN"
            f" CAST(round(n1 * {_ARCH_R2} * 1e6) AS BIGINT) END"
        ).alias("arch_lm_micro"),
    )


def _q394_sql() -> str:
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS m
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS sm
  FROM daily
), u AS (
  SELECT d, n, (n * m - sm) * (n * m - sm) AS u
  FROM daily CROSS JOIN tot
), pair AS (
  SELECT n, u AS y, lag(u) OVER (ORDER BY d) AS x FROM u
), agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_days,
         CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pair WHERE x IS NOT NULL
)
SELECT n_days, n1,
       CASE WHEN {_ARCH_OK} THEN
         CAST(round({_ARCH_R2} * 1e6) AS BIGINT) END AS r2_micro,
       CASE WHEN {_ARCH_OK} THEN
         CAST(round(n1 * {_ARCH_R2} * 1e6) AS BIGINT) END AS arch_lm_micro
FROM agg
"""


def q395_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann estimator of the weekday-vs-weekend shift in
    daily mean value: the MEDIAN of all pairwise differences
    (weekday mean − weekend mean) — the robust location-shift
    ESTIMATE that accompanies rank TESTS (Mann-Whitney q187 answers
    "is there a shift?"; HL answers "how big?", Hodges & Lehmann
    1963). Reported doubled (hl_shift_x2_milli) so the even-count
    midpoint average stays an exact integer.

    Exactness: daily means are milli integers (rounded from exact
    integer day sums, both engines rounding the same double); the
    pairwise differences are exact integers; the median is picked by
    row_number over the value-sorted bounded pair relation — integer
    end to end, no float. Weekend = Sunday/Saturday (Spark
    dayofweek ∈ {1,7} ≡ DuckDB dayofweek ∈ {0,6} — the q298 parity
    mapping). Either side empty → NULL estimate, counts reported.

    Shape at 100 TB: two ≤366-row daily aggregates cross-joined to a
    ≤(262·104)-row bounded pair relation — all windows sit above
    date-grouped aggregate barriers."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("m")
        )
        .select("d", "m", F.expr("dayofweek(d) IN (1, 7)").alias("we"))
    )
    wd = daily.filter(~F.col("we")).select(F.col("m").alias("x"))
    wk = daily.filter(F.col("we")).select(F.col("m").alias("y"))
    pairs = wd.crossJoin(wk).select(F.expr("x - y").alias("diff"))
    cnt = pairs.agg(F.count("*").cast("long").alias("c"))
    w = W.orderBy("diff")
    ranked = pairs.select(
        "diff", F.row_number().over(w).alias("r")
    ).crossJoin(F.broadcast(cnt))
    mid = ranked.filter(
        "r = (c + 1) div 2 OR r = (c + 2) div 2"
    ).agg(
        F.expr(
            "CAST(round(avg(diff) * 2) AS BIGINT)"
        ).alias("hl2")
    )
    counts = daily.agg(
        F.sum(F.expr("CASE WHEN we THEN 0 ELSE 1 END"))
        .cast("long").alias("n_weekday_days"),
        F.sum(F.expr("CASE WHEN we THEN 1 ELSE 0 END"))
        .cast("long").alias("n_weekend_days"),
    )
    return counts.crossJoin(F.broadcast(cnt)).crossJoin(
        F.broadcast(mid)
    ).select(
        "n_weekday_days",
        "n_weekend_days",
        F.col("c").alias("n_pairs"),
        F.expr("CASE WHEN c > 0 THEN hl2 END").alias("hl_shift_x2_milli"),
    )


_Q395_SQL = """
WITH daily AS (
  SELECT d, m, dayofweek(d) IN (0, 6) AS we FROM (
    SELECT CAST(ts AS DATE) AS d,
           CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT))
                           AS DOUBLE) / count(*)) AS BIGINT) AS m
    FROM events GROUP BY 1
  )
), pairs AS (
  SELECT x.m - y.m AS diff
  FROM (SELECT m FROM daily WHERE NOT we) x
  CROSS JOIN (SELECT m FROM daily WHERE we) y
), cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS c FROM pairs
), ranked AS (
  SELECT diff, row_number() OVER (ORDER BY diff) AS r FROM pairs
), mid AS (
  SELECT CAST(round(avg(diff) * 2) AS BIGINT) AS hl2
  FROM ranked CROSS JOIN cnt
  WHERE r = (c + 1) // 2 OR r = (c + 2) // 2
), counts AS (
  SELECT CAST(sum(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT)
           AS n_weekday_days,
         CAST(sum(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT)
           AS n_weekend_days
  FROM daily
)
SELECT n_weekday_days, n_weekend_days, c AS n_pairs,
       CASE WHEN c > 0 THEN hl2 END AS hl_shift_x2_milli
FROM counts CROSS JOIN cnt CROSS JOIN mid
"""


# ---------------------------------------------------------------------------
# Round 10, batch 2 — q398/q399/q402: Granger, seasonal MK, Siegel


_GR_CYY = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m)"
_GR_CAA = "(CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / m)"
_GR_CBB = "(CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / m)"
_GR_CYA = "(CAST(sya AS DOUBLE) - CAST(sy AS DOUBLE) * sa / m)"
_GR_CYB = "(CAST(syb AS DOUBLE) - CAST(sy AS DOUBLE) * sb / m)"
_GR_CAB = "(CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb / m)"
_GR_DET = f"({_GR_CAA} * {_GR_CBB} - {_GR_CAB} * {_GR_CAB})"
_GR_RSSR = f"({_GR_CYY} - {_GR_CYA} * {_GR_CYA} / {_GR_CAA})"
_GR_RSSU = (
    f"({_GR_CYY} - ({_GR_CBB} * {_GR_CYA} * {_GR_CYA}"
    f" - 2.0e0 * {_GR_CAB} * {_GR_CYA} * {_GR_CYB}"
    f" + {_GR_CAA} * {_GR_CYB} * {_GR_CYB}) / {_GR_DET})"
)
_GR_F = f"(({_GR_RSSR} - {_GR_RSSU}) * (m - 3) / {_GR_RSSU})"
_GR_OK = (
    f"(m >= 4 AND {_GR_CAA} > 0 AND {_GR_DET} > 0 AND {_GR_RSSU} > 0)"
)


def q398_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality: does yesterday's event COUNT improve
    today's mean-VALUE forecast beyond yesterday's value alone? The
    nested-OLS F test (Granger 1969): restricted y_t ~ y_{t−1},
    unrestricted y_t ~ y_{t−1} + x_{t−1},
    F = (RSS_r − RSS_u)·(m−3)/RSS_u, F(1, m−3) under no-causality.
    q215 measures lead-lag CORRELATION; this is the incremental-
    predictability test built on it, completing the AR toolkit
    (Yule-Walker q345, Durbin-Watson q323).

    Exactness: y = rounded daily mean milli (exact integer inputs,
    both engines round the same double), x = exact daily counts; all
    nine regression moments are exact DECIMAL(38,0)/HUGEINT sums over
    the ≤366-row lag-paired relation; the centered-moment / RSS / F
    chain is ONE shared double expression, micro-quantized. Degenerate
    (m < 4, constant regressors, collinear det ≤ 0, perfect fit
    RSS_u ≤ 0) → NULL F.

    Shape at 100 TB: one map-side daily aggregate to ≤366 rows; lag
    window and 1-row moment reduction on that bounded relation."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("y"),
            F.count("*").cast("long").alias("x"),
        )
    )
    w = W.orderBy("d")
    pair = daily.select(
        F.col("y"),
        F.lag("y").over(w).alias("a"),
        F.lag("x").over(w).alias("b"),
    ).filter("a IS NOT NULL")
    agg = pair.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("a").cast("decimal(38,0)")).alias("sa"),
        F.sum(F.col("b").cast("decimal(38,0)")).alias("sb"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        F.sum(F.expr("CAST(a AS DECIMAL(38,0)) * a")).alias("saa"),
        F.sum(F.expr("CAST(b AS DECIMAL(38,0)) * b")).alias("sbb"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * a")).alias("sya"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * b")).alias("syb"),
        F.sum(F.expr("CAST(a AS DECIMAL(38,0)) * b")).alias("sab"),
    )
    return agg.select(
        F.col("m").alias("n_pairs"),
        F.expr(
            f"CASE WHEN {_GR_OK} THEN"
            f" CAST(round({_GR_RSSU} / {_GR_RSSR} * 1e6) AS BIGINT) END"
        ).alias("rss_ratio_micro"),
        F.expr(
            f"CASE WHEN {_GR_OK} THEN"
            f" CAST(round({_GR_F} * 1e6) AS BIGINT) END"
        ).alias("granger_f_micro"),
    )


def _q398_sql() -> str:
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), pair AS (
  SELECT y, lag(y) OVER (ORDER BY d) AS a, lag(x) OVER (ORDER BY d) AS b
  FROM daily
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(a AS HUGEINT)) AS HUGEINT) AS sa,
         CAST(sum(CAST(b AS HUGEINT)) AS HUGEINT) AS sb,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) AS saa,
         CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sbb,
         CAST(sum(CAST(y AS HUGEINT) * a) AS HUGEINT) AS sya,
         CAST(sum(CAST(y AS HUGEINT) * b) AS HUGEINT) AS syb,
         CAST(sum(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sab
  FROM pair WHERE a IS NOT NULL
)
SELECT m AS n_pairs,
       CASE WHEN {_GR_OK} THEN
         CAST(round({_GR_RSSU} / {_GR_RSSR} * 1e6) AS BIGINT) END
         AS rss_ratio_micro,
       CASE WHEN {_GR_OK} THEN
         CAST(round({_GR_F} * 1e6) AS BIGINT) END AS granger_f_micro
FROM agg
"""


def q399_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984): the q301
    MK statistic computed WITHIN each weekday stratum and summed —
    trend detection that a weekly cycle cannot fool (plain MK q301
    reads a strong weekday pattern as noise or worse, false trend).
    S = Σ_g S_g with S_g = Σ_{i<j} sign(y_j − y_i) over stratum g's
    day-ordered daily means; Var = Σ_g [n_g(n_g−1)(2n_g+5) −
    Σ_t t(t−1)(2t+5)]/18; z = (S − sign(S))/√Var (continuity
    correction, the q301 convention).

    Exactness: daily means are rounded milli integers; each S_g is an
    exact integer pair sum over a ≤53-row stratum (the within-weekday
    self-join is (366/7)²-bounded per stratum); tie terms are exact
    integers off value-grouped counts; z is one shared double chain,
    micro-quantized. Var = 0 → NULL z.

    Shape at 100 TB: daily collapse to ≤366 rows, then per-stratum
    self-joins on the weekday key — every relation bounded by the
    calendar, map-side combine everywhere."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("m")
        )
        .select("d", "m", F.expr("dayofweek(d)").alias("g"))
    )
    a = daily.select("g", F.col("d").alias("di"), F.col("m").alias("mi"))
    b = daily.select(
        F.col("g").alias("g2"), F.col("d").alias("dj"), F.col("m").alias("mj")
    )
    s = (
        a.join(b, (F.col("g") == F.col("g2")) & (F.col("di") < F.col("dj")))
        .agg(
            F.sum(F.expr("CAST(sign(mj - mi) AS BIGINT)"))
            .cast("long").alias("s")
        )
    )
    per_g = daily.groupBy("g").agg(F.count("*").cast("long").alias("ng"))
    ties = (
        daily.groupBy("g", "m")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("g")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long").alias("tt")
        )
    )
    var = (
        per_g.join(ties, "g")
        .agg(
            F.sum(F.expr("ng * (ng - 1) * (2 * ng + 5) - tt"))
            .cast("long").alias("var18"),
            F.count("*").cast("long").alias("n_strata"),
        )
    )
    both = s.crossJoin(F.broadcast(var))
    z = (
        "((CAST(s AS DOUBLE) - CAST(sign(s) AS DOUBLE))"
        " / sqrt(CAST(var18 AS DOUBLE) / 18.0e0))"
    )
    return both.select(
        F.coalesce("s", F.lit(0)).alias("s_total"),
        "n_strata",
        F.expr(
            f"CASE WHEN var18 > 0 THEN"
            f" CAST(round({z} * 1e6) AS BIGINT) END"
        ).alias("z_micro"),
    )


def _q399_sql() -> str:
    z = (
        "((CAST(s AS DOUBLE) - CAST(sign(s) AS DOUBLE))"
        " / sqrt(CAST(var18 AS DOUBLE) / 18.0e0))"
    )
    return f"""
WITH daily AS (
  SELECT d, m, dayofweek(d) + 1 AS g FROM (
    SELECT CAST(ts AS DATE) AS d,
           CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT))
                           AS DOUBLE) / count(*)) AS BIGINT) AS m
    FROM events GROUP BY 1
  )
), s AS (
  SELECT CAST(sum(CAST(sign(b.m - a.m) AS BIGINT)) AS BIGINT) AS s
  FROM daily a JOIN daily b ON a.g = b.g AND a.d < b.d
), per_g AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng FROM daily GROUP BY g
), ties AS (
  SELECT g, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
  FROM (SELECT g, m, CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY g, m)
  GROUP BY g
), var AS (
  SELECT CAST(sum(ng * (ng - 1) * (2 * ng + 5) - tt) AS BIGINT) AS var18,
         CAST(count(*) AS BIGINT) AS n_strata
  FROM per_g JOIN ties USING (g)
)
SELECT coalesce(s, 0) AS s_total, n_strata,
       CASE WHEN var18 > 0 THEN
         CAST(round({z} * 1e6) AS BIGINT) END AS z_micro
FROM s CROSS JOIN var
"""


def q402_siegel_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median slope of the daily mean-value series —
    the 50%-breakdown robust trend estimate beside Theil-Sen's 29%
    (q300; Siegel 1982): for each day i take the MEDIAN over j ≠ i of
    the pairwise slope (m_j − m_i)/(d_j − d_i), then the median of
    those per-day medians. A majority of corrupted days still cannot
    move it.

    Exactness: daily means are exact milli integers and day gaps
    exact integer day counts, so every pairwise slope is the same
    rational in both engines; medians are selected by row_number with
    a FULL deterministic tiebreak (slope value, then partner day), so
    both engines pick the identical element; the midpoint average of
    an even count is the only arithmetic, and the final estimate is
    micro-quantized once. Fewer than 2 days → NULL.

    Shape at 100 TB: the pair relation is calendar-bounded (≤366²
    rows) off one map-side daily collapse; the per-day median window
    partitions by day i (bounded partitions), the final median by
    row_number over ≤366 rows."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("m")
        )
    )
    a = daily.select(F.col("d").alias("di"), F.col("m").alias("mi"))
    b = daily.select(F.col("d").alias("dj"), F.col("m").alias("mj"))
    slopes = a.join(b, F.col("di") != F.col("dj")).select(
        "di",
        "dj",
        F.expr(
            "CAST(mj - mi AS DOUBLE) / CAST(datediff(dj, di) AS DOUBLE)"
        ).alias("slope"),
    )
    wi = W.partitionBy("di").orderBy("slope", "dj")
    cnt_i = W.partitionBy("di")
    per_i = (
        slopes.select(
            "di",
            "slope",
            F.row_number().over(wi).alias("r"),
            F.count("*").over(cnt_i).alias("c"),
        )
        .filter("r = (c + 1) div 2 OR r = (c + 2) div 2")
        .groupBy("di")
        .agg(F.avg("slope").alias("med_i"))
    )
    wf = W.orderBy("med_i", "di")
    cnt_f = daily.agg(F.count("*").cast("long").alias("n_days"))
    final = (
        per_i.select(
            "med_i",
            F.row_number().over(wf).alias("r"),
        )
        .crossJoin(F.broadcast(cnt_f))
        .filter("r = (n_days + 1) div 2 OR r = (n_days + 2) div 2")
        .agg(
            F.expr(
                "CAST(round(avg(med_i) * 1e6) AS BIGINT)"
            ).alias("slope_micro_per_day")
        )
    )
    return cnt_f.crossJoin(F.broadcast(final)).select(
        "n_days",
        F.expr(
            "CASE WHEN n_days >= 2 THEN slope_micro_per_day END"
        ).alias("slope_micro_per_day"),
    )


_Q402_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS m
  FROM events GROUP BY 1
), slopes AS (
  SELECT a.d AS di, b.d AS dj,
         CAST(b.m - a.m AS DOUBLE) / CAST(datediff('day', a.d, b.d) AS DOUBLE)
           AS slope
  FROM daily a JOIN daily b ON a.d <> b.d
), per_i AS (
  SELECT di, avg(slope) AS med_i FROM (
    SELECT di, slope,
           row_number() OVER (PARTITION BY di ORDER BY slope, dj) AS r,
           count(*) OVER (PARTITION BY di) AS c
    FROM slopes
  ) WHERE r = (c + 1) // 2 OR r = (c + 2) // 2
  GROUP BY di
), cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
), final AS (
  SELECT CAST(round(avg(med_i) * 1e6) AS BIGINT) AS slope_micro_per_day
  FROM (
    SELECT med_i, row_number() OVER (ORDER BY med_i, di) AS r
    FROM per_i
  ) CROSS JOIN cnt
  WHERE r = (n_days + 1) // 2 OR r = (n_days + 2) // 2
)
SELECT n_days,
       CASE WHEN n_days >= 2 THEN slope_micro_per_day END
         AS slope_micro_per_day
FROM cnt CROSS JOIN final
"""


_BP_R2 = (
    "(pow(CAST(n AS DOUBLE) * CAST(sut AS DOUBLE)"
    " - CAST(su AS DOUBLE) * CAST(st AS DOUBLE), 2.0e0)"
    " / ((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)"
    " - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)"
    " - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))))"
)
_BP_OK = (
    "(n >= 3 AND CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)"
    " > CAST(su AS DOUBLE) * CAST(su AS DOUBLE)"
    " AND CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)"
    " > CAST(st AS DOUBLE) * CAST(st AS DOUBLE))"
)


def q403_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test of the daily trend fit —
    does residual VARIANCE grow with time? The regression-diagnostics
    member beside the residual-AUTOCORRELATION tests (Durbin-Watson
    q323 on levels, ARCH-LM q394 on lagged squares): fit the OLS line
    of daily mean value on the day index, regress the SQUARED
    residuals back on the index, LM = n·R², chi-square(1) under
    homoscedasticity (Breusch & Pagan 1979, Koenker studentized form).

    Exactness: daily means are rounded milli integers; the trend fit
    (a, b) is one shared double chain off exact integer (t, y)
    moments; each day's squared residual u_t = (y_t − a − b·t)² is
    the SAME double in both engines and is milli-quantized BEFORE the
    cross-day sums (milli, not micro: u·u sums must keep overflow
    headroom inside DECIMAL(38,0) / DuckDB HUGEINT at the documented
    residual bound, and R² is invariant to the uniform u scaling;
    the quantize-pre-sum rule — double sums are
    order-dependent, integer sums are not), so the second regression's
    moments are exact integers; R²/LM is one final shared double
    chain, micro-quantized. Degenerate variances → NULL.

    Shape at 100 TB: one map-side daily collapse to ≤366 rows; the
    day index is a window over that bounded relation; two 1-row
    reductions with a broadcast (a, b) scalar attach."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("y")
        )
    )
    w = W.orderBy("d")
    ty = daily.select("y", F.row_number().over(w).cast("long").alias("t"))
    fit = ty.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st0"),
        F.sum("y").cast("long").alias("sy0"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("stt0"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty0"),
    )
    b = (
        "((CAST(n AS DOUBLE) * CAST(sty0 AS DOUBLE)"
        " - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(stt0 AS DOUBLE)"
        " - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)))"
    )
    a = (
        f"((CAST(sy0 AS DOUBLE) - {b} * CAST(st0 AS DOUBLE))"
        " / CAST(n AS DOUBLE))"
    )
    u = (
        f"CAST(round(pow(CAST(y AS DOUBLE) - {a} - {b}"
        " * CAST(t AS DOUBLE), 2.0e0) * 1e3) AS DECIMAL(38,0))"
    )
    resid = ty.crossJoin(F.broadcast(fit)).select(
        "t",
        F.expr(
            "CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(stt0 AS DOUBLE)"
            " > CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)"
            f" THEN {u} ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("u"),
    )
    agg = resid.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("t").cast("decimal(38,0)")).alias("st"),
        F.sum("u").alias("su"),
        F.sum(F.expr("u * t")).alias("sut"),
        F.sum(F.expr("u * u")).alias("suu"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("stt"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.expr(
            f"CASE WHEN {_BP_OK} THEN"
            f" CAST(round({_BP_R2} * 1e6) AS BIGINT) END"
        ).alias("r2_micro"),
        F.expr(
            f"CASE WHEN {_BP_OK} THEN"
            f" CAST(round(n * {_BP_R2} * 1e6) AS BIGINT) END"
        ).alias("bp_lm_micro"),
    )


def _q403_sql() -> str:
    b = (
        "((CAST(n AS DOUBLE) * CAST(sty0 AS DOUBLE)"
        " - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(stt0 AS DOUBLE)"
        " - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)))"
    )
    a = (
        f"((CAST(sy0 AS DOUBLE) - {b} * CAST(st0 AS DOUBLE))"
        " / CAST(n AS DOUBLE))"
    )
    u = (
        f"CAST(round(pow(CAST(y AS DOUBLE) - {a} - {b}"
        " * CAST(t AS DOUBLE), 2.0e0) * 1e3) AS HUGEINT)"
    )
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS y
  FROM events GROUP BY 1
), ty AS (
  SELECT y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t FROM daily
), fit AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st0,
         CAST(sum(y) AS BIGINT) AS sy0,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt0,
         CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty0
  FROM ty
), resid AS (
  SELECT t,
         CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(stt0 AS DOUBLE)
                   > CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)
              THEN {u} ELSE CAST(0 AS HUGEINT) END AS u
  FROM ty CROSS JOIN fit
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
         CAST(sum(u) AS HUGEINT) AS su,
         CAST(sum(u * t) AS HUGEINT) AS sut,
         CAST(sum(u * u) AS HUGEINT) AS suu,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt
  FROM resid
)
SELECT n AS n_days,
       CASE WHEN {_BP_OK} THEN
         CAST(round({_BP_R2} * 1e6) AS BIGINT) END AS r2_micro,
       CASE WHEN {_BP_OK} THEN
         CAST(round(n * {_BP_R2} * 1e6) AS BIGINT) END AS bp_lm_micro
FROM agg
"""


def q404_pacf_lag2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily mean series at lags 1 and
    2 via Durbin-Levinson — the model-ORDER picker that completes the
    AR toolkit: ACF (q188) says how correlated lags are, Yule-Walker
    (q345) fits a chosen AR(2), PACF says WHICH order to choose
    (φ11 = r₁, φ22 = (r₂ − r₁²)/(1 − r₁²); an AR(1) process has
    φ22 ≈ 0).

    Exactness: the q393 n-scaled integer demeaning (E_t = n·m_t − Σm,
    exact off rounded daily mean milli integers); lag products and the
    lag-0 sum are exact DECIMAL/HUGEINT integers (r_k = Σ E_t·E_{t+k}
    / Σ E_t², the standard biased estimator — n-scalings cancel); the
    φ chain is one shared double expression, micro-quantized.
    Zero variance or |r₁| = 1 → NULL.

    Shape at 100 TB: the q393 daily-collapse shape — lag windows and
    a 1-row reduction on ≤366 rows."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)"
            ).alias("m")
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("m").cast("long").alias("sm"),
    )
    w = W.orderBy("d")
    e = daily.crossJoin(F.broadcast(tot)).select(
        "d", "n", F.expr("n * m - sm").alias("e")
    ).select(
        "n", "e",
        F.lag("e", 1).over(w).alias("e1"),
        F.lag("e", 2).over(w).alias("e2"),
    )
    agg = e.agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(F.expr("CAST(e AS DECIMAL(38,0)) * e")).alias("c0"),
        F.sum(F.expr("CAST(e AS DECIMAL(38,0)) * e1")).alias("c1"),
        F.sum(F.expr("CAST(e AS DECIMAL(38,0)) * e2")).alias("c2"),
    )
    r1 = "(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))"
    r2 = "(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE))"
    p22 = f"(({r2} - {r1} * {r1}) / (1.0e0 - {r1} * {r1}))"
    ok = f"(c0 > 0 AND n_days >= 3 AND abs({r1}) < 1.0e0)"
    return agg.select(
        "n_days",
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round({r1} * 1e6) AS BIGINT) END"
        ).alias("pacf1_micro"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST(round({p22} * 1e6) AS BIGINT) END"
        ).alias("pacf2_micro"),
    )


def _q404_sql() -> str:
    r1 = "(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))"
    r2 = "(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE))"
    p22 = f"(({r2} - {r1} * {r1}) / (1.0e0 - {r1} * {r1}))"
    ok = f"(c0 > 0 AND n_days >= 3 AND abs({r1}) < 1.0e0)"
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(round(CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS DOUBLE)
                    / count(*)) AS BIGINT) AS m
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS sm
  FROM daily
), e AS (
  SELECT n, ee,
         lag(ee, 1) OVER (ORDER BY d) AS e1,
         lag(ee, 2) OVER (ORDER BY d) AS e2
  FROM (SELECT d, n, n * m - sm AS ee FROM daily CROSS JOIN tot)
), agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_days,
         CAST(sum(CAST(ee AS HUGEINT) * ee) AS HUGEINT) AS c0,
         CAST(sum(CAST(ee AS HUGEINT) * e1) AS HUGEINT) AS c1,
         CAST(sum(CAST(ee AS HUGEINT) * e2) AS HUGEINT) AS c2
  FROM e
)
SELECT n_days,
       CASE WHEN {ok} THEN
         CAST(round({r1} * 1e6) AS BIGINT) END AS pacf1_micro,
       CASE WHEN {ok} THEN
         CAST(round({p22} * 1e6) AS BIGINT) END AS pacf2_micro
FROM agg
"""
