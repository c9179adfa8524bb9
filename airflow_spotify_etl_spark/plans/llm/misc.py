"""Mechanically split from plans/llm.py (round 9) — segment contents are verbatim; see package __init__."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...sources.files import load_table


def q99_weighted_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size-k weighted-without-replacement sample (Efraimidis–
    Spirakis A-ES) of documents, weight = n_chars — "exactly 100 docs,
    longer docs proportionally likelier". Plans as TakeOrderedAndProject
    over a narrow projection: zero exchanges (plan-gated with q94). The
    hash-determinized competition keys replay in SQL, so the draw itself
    is oracle-checked, not just its size."""
    from ...operators.sampling import weighted_exact_k_sample

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_exact_k_sample(
        docs.select("doc_id", "source", "n_chars"), k=100, weight_col="n_chars"
    )
    return out.select(
        "doc_id", "source", "n_chars", F.round("es_key", 6).alias("es_key")
    )


_Q99_SQL = """
SELECT doc_id, source, n_chars,
       round(power(
         ((('0x' || substr(md5('wek' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
           / 4294967296.0),
         1.0 / CAST(n_chars AS DOUBLE)
       ), 6) AS es_key
FROM documents
WHERE CAST(n_chars AS DOUBLE) > 0
ORDER BY power(
         ((('0x' || substr(md5('wek' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
           / 4294967296.0),
         1.0 / CAST(n_chars AS DOUBLE)
       ) DESC, doc_id
LIMIT 100
"""


def q254_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta — the standard computational-stylometry distance
    between text collections: z-score each of the top-50 corpus words'
    relative frequency across sources, then Delta(s₁,s₂) = mean |z₁−z₂|.
    Flags sources with anomalous style (template farms, MT output) for
    curation. Exactness discipline: per-source relative frequencies are
    micro quotients; the across-source mean and population variance of
    each word's f_micro are exact integers; the ONLY float is one sqrt
    per (word) for σ, immediately floored to micro (sd_micro ≥ 1 guard
    avoids zero-division); z is a milli integer quotient, so every
    pairwise Delta is an exact integer mean. Scale shape: one token
    count collapse; the top-50 vocabulary is TakeOrdered and broadcast;
    the z matrix is |sources|·50; the pair expansion is
    |sources|²/2 — all bounded post-agg tables."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    cnt = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    n_s = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    top = (
        cnt.groupBy("tok").agg(F.sum("c").alias("ct"))
        .orderBy(F.desc("ct"), "tok").limit(50)
        .select("tok")
    )
    k_t = n_s.agg(F.count("*").alias("k"))
    grid = n_s.crossJoin(F.broadcast(top)).join(
        cnt, ["source", "tok"], "left"
    ).select(
        "source", "tok", "n",
        F.coalesce("c", F.lit(0)).alias("c"),
    ).select(
        "source", "tok",
        F.expr(
            "cast(cast(c as decimal(19,0)) * 1000000 div n as bigint)"
        ).alias("f_micro"),
    )
    stats = grid.groupBy("tok").agg(
        F.sum("f_micro").alias("sf"),
        F.sum(F.expr("cast(f_micro as decimal(19,0)) * f_micro"))
        .alias("sff"),
    ).crossJoin(F.broadcast(k_t)).select(
        "tok",
        F.expr("cast(sf div k as bigint)").alias("mu_micro"),
        F.expr(
            "greatest(cast(floor(sqrt(cast(cast((k * sff"
            " - cast(sf as decimal(19,0)) * sf) div (cast(k as"
            " decimal(19,0)) * k) as bigint) as double))) as bigint),"
            " cast(1 as bigint))"
        ).alias("sd_micro"),
    )
    z = grid.join(F.broadcast(stats), "tok").select(
        "source", "tok",
        F.expr(
            "cast(f_micro - mu_micro as decimal(19,0)) * 1000"
            " div sd_micro"
        ).cast("long").alias("z_milli"),
    )
    za = z.select(
        F.col("source").alias("sa"), "tok", F.col("z_milli").alias("za")
    )
    zb = z.select(
        F.col("source").alias("sb"), "tok", F.col("z_milli").alias("zb")
    )
    pairs = za.join(zb, "tok").where(F.col("sa") < F.col("sb"))
    return (
        pairs.groupBy("sa", "sb")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.expr("abs(za - zb)")).alias("sum_absdz_milli"),
        )
        .select(
            "sa", "sb", "n_words", "sum_absdz_milli",
            F.expr("sum_absdz_milli div n_words").alias("delta_milli"),
        )
        .orderBy("sa", "sb")
    )


_Q254_SQL = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
), cnt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), n_s AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
), top AS (
  SELECT tok FROM (
    SELECT tok, sum(c) AS ct FROM cnt GROUP BY tok
    ORDER BY ct DESC, tok LIMIT 50)
), k_t AS (
  SELECT CAST(count(*) AS BIGINT) AS k FROM n_s
), grid AS (
  SELECT n_s.source, top.tok,
         CAST(CAST(coalesce(cnt.c, 0) AS HUGEINT) * 1000000 // n_s.n
              AS BIGINT) AS f_micro
  FROM n_s CROSS JOIN top
  LEFT JOIN cnt ON cnt.source = n_s.source AND cnt.tok = top.tok
), stats AS (
  SELECT tok,
         CAST(sf // k AS BIGINT) AS mu_micro,
         greatest(CAST(floor(sqrt(CAST(CAST((k * sff
           - CAST(sf AS HUGEINT) * sf) // (CAST(k AS HUGEINT) * k)
           AS BIGINT) AS DOUBLE))) AS BIGINT), 1) AS sd_micro
  FROM (SELECT tok, CAST(sum(f_micro) AS HUGEINT) AS sf,
               CAST(sum(CAST(f_micro AS HUGEINT) * f_micro) AS HUGEINT)
                 AS sff
        FROM grid GROUP BY tok) CROSS JOIN k_t
), z AS (
  SELECT source, grid.tok,
         CAST(CAST(f_micro - mu_micro AS HUGEINT) * 1000 // sd_micro
              AS BIGINT) AS z_milli
  FROM grid JOIN stats ON grid.tok = stats.tok
)
SELECT a.source AS sa, b.source AS sb,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(abs(a.z_milli - b.z_milli)) AS BIGINT) AS sum_absdz_milli,
       CAST(CAST(sum(abs(a.z_milli - b.z_milli)) AS HUGEINT) // count(*)
            AS BIGINT) AS delta_milli
FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY sa, sb
"""
