"""Oracle-checked queries for the connector-side operators (flatten P1-P4/P9).

q13 covers the JSON-string flatten idiom; q33 here oracle-checks the REAL
nested-struct path of ``flatten_with_defaults`` — struct-field access,
head-of-array extraction on genuinely EMPTY arrays, and every default kind
("Unknown"/0/False/"" — spotify_etl.py:241-250 semantics) — by building a
deterministic nested track payload from the ``documents`` table in Spark and
computing the expected flat projection directly in SQL on the oracle side.

Scale note: the nested construction + flatten is one narrow codegen'd
projection — no shuffle, scan-speed at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.flatten import TRACK_FIELDS, FieldSpec, flatten_with_defaults
from ..sources.files import load_table

__all__ = ["QUERIES", "ORACLES"]


def _nested_tracks(docs: DataFrame) -> DataFrame:
    """Deterministic nested payloads: every doc_id residue class exercises a
    different missing-field path (null name, empty artists array, null
    popularity, ...) so the flatten's defaults all fire on real structs."""
    d = F.col("doc_id")
    s = d.cast("string")
    null_s = F.lit(None).cast("string")
    track = F.struct(
        F.when(d % 3 == 0, null_s).otherwise(F.concat(F.lit("trk-"), s)).alias("id"),
        F.when(d % 7 == 0, null_s).otherwise(F.concat(F.lit("Song "), s)).alias("name"),
        F.when(d % 4 == 0, F.lit(None).cast("int"))
        .otherwise((d % 100).cast("int"))
        .alias("popularity"),
        F.when(d % 9 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars") * 1000)
        .alias("duration_ms"),
        F.when(d % 13 == 0, F.lit(None).cast("boolean"))
        .otherwise(d % 2 == 0)
        .alias("explicit"),
        F.when(d % 6 == 0, null_s)
        .otherwise(F.concat(F.lit("https://p/"), s))
        .alias("preview_url"),
        F.when(
            d % 5 == 0, F.array().cast("array<struct<id:string,name:string>>")
        )
        .otherwise(
            F.array(
                F.struct(
                    F.concat(F.lit("art-"), F.col("lang")).alias("id"),
                    F.concat(F.lit("Artist "), F.col("lang")).alias("name"),
                )
            )
        )
        .alias("artists"),
        F.struct(
            F.concat(F.lit("alb-"), s).alias("id"),
            F.when(d % 8 == 0, null_s)
            .otherwise(F.concat(F.lit("Album "), F.col("source")))
            .alias("name"),
            F.element_at(
                F.array(F.lit("2024"), F.lit("2024-06"), F.lit("2024-06-15")),
                (d % 3 + 1).cast("int"),
            ).alias("release_date"),
        ).alias("album"),
        F.struct(
            F.when(d % 10 == 0, null_s)
            .otherwise(F.concat(F.lit("https://open/"), s))
            .alias("spotify")
        ).alias("external_urls"),
    )
    return docs.select("doc_id", track.alias("track"))


def q33_flatten_track_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P4/P9 on real nested structs: 10-col flatten-with-defaults over a
    synthesized track payload, incl. artists=[] head-of-array and per-kind
    defaults; release_date cycles the YYYY / YYYY-MM / YYYY-MM-DD precision
    variants (SURVEY.md §1.2 lenient-date note)."""
    docs = load_table(spark, sf_dir, "documents")
    fields = [FieldSpec("doc_id", "doc_id"), *TRACK_FIELDS]
    return flatten_with_defaults(_nested_tracks(docs), fields).orderBy("doc_id")


_Q33_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'Unknown'
            ELSE 'Artist ' || lang END                                AS artist_name,
       CASE WHEN doc_id % 7 = 0 THEN 'Unknown'
            ELSE 'Song ' || doc_id END                                AS song_name,
       CASE WHEN doc_id % 4 = 0 THEN 0 ELSE doc_id % 100 END          AS popularity,
       CASE WHEN doc_id % 9 = 0 THEN 0 ELSE n_chars * 1000 END        AS duration_ms,
       CASE WHEN doc_id % 13 = 0 THEN FALSE ELSE doc_id % 2 = 0 END   AS explicit,
       CASE WHEN doc_id % 10 = 0 THEN ''
            ELSE 'https://open/' || doc_id END                        AS external_url,
       CASE WHEN doc_id % 6 = 0 THEN ''
            ELSE 'https://p/' || doc_id END                           AS preview_url,
       CASE WHEN doc_id % 8 = 0 THEN 'Unknown'
            ELSE 'Album ' || source END                               AS album_name,
       (['2024', '2024-06', '2024-06-15'])[(doc_id % 3) + 1]          AS release_date,
       CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'trk-' || doc_id END     AS track_id
FROM documents
ORDER BY doc_id
"""


def q150_reference_top_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference application's OWN pipeline as one oracle-checked
    query — the capstone parity row: nested payload flatten with
    defaults (spotify_etl.py:224-260 semantics, the q33 machinery) →
    ms→m:ss display format (new.py:170) → popularity rank and top-10
    (new.py:97-114's enumerate over the sorted list). A user of the
    reference reads THIS table; here the whole chain is declarative
    Catalyst and the oracle replays every default, the format string,
    and the rank. The global rank window is the reference's own
    semantic (its only window) and is bounded by the top-10 cut."""
    docs = load_table(spark, sf_dir, "documents")
    fields = [FieldSpec("doc_id", "doc_id"), *TRACK_FIELDS]
    flat = flatten_with_defaults(_nested_tracks(docs), fields)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("popularity").desc(), "doc_id")
    ms = F.col("duration_ms")
    return (
        flat.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "rank",
            "artist_name",
            "song_name",
            F.format_string(
                "%d:%02d",
                (ms / 60000).cast("bigint"),
                ((ms % 60000) / 1000).cast("bigint"),
            ).alias("duration"),
            "popularity",
            "album_name",
        )
        .orderBy("rank")
    )


_Q150_SQL = f"""
WITH flat AS (
  SELECT * FROM ({_Q33_SQL}) f
)
SELECT row_number() OVER (ORDER BY popularity DESC, doc_id) AS rank,
       artist_name, song_name,
       printf('%d:%02d', duration_ms // 60000,
              (duration_ms % 60000) // 1000) AS duration,
       popularity, album_name
FROM flat
ORDER BY rank
LIMIT 10
"""


QUERIES = {
    "q33_flatten_track_payload": q33_flatten_track_payload,
    "q150_reference_top_tracks": q150_reference_top_tracks,
}
ORACLES = {
    "q33_flatten_track_payload": _Q33_SQL,
    "q150_reference_top_tracks": _Q150_SQL,
}
