"""Schema-with-defaults flattening operator (SURVEY.md §1.2, §2.2 P1-P4/P9).

The reference flattens nested Spotify track documents row-at-a-time in
Python, supplying a default for every missing field ("Unknown" for names, 0
for numerics, False for ``explicit``, "" for URLs — spotify_etl.py:241-250,
spotify_etl2.py:157-177, new.py:110-127). Here the same semantics are ONE
declarative ``select`` over a nested-schema DataFrame: struct-field access,
head-of-array extraction, and ``coalesce`` defaults — all Catalyst
expressions, fully codegen'd, so the flatten runs at scan speed at 100 TB
(and columns never needed are pruned out of the source read entirely).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "FieldSpec",
    "flatten_with_defaults",
    "TRACK_FIELDS",
    "RECENTLY_PLAYED_FIELDS",
    "WIDE_TRACK_FIELDS",
    "track_payload_schema",
]


@dataclass(frozen=True)
class FieldSpec:
    """One output column: a nested path expression + its missing-default.
    ``expr`` (SQL expression string) overrides ``path`` for derived columns
    like the reference's ``played_at[:10]`` date slice (P5)."""

    name: str
    path: str  # dotted path; `[0]` takes an array head (P4)
    default: object = None
    cast: str | None = None
    expr: str | None = None


def _path_expr(path: str) -> Column:
    """Build a Column from a dotted path with optional ``[i]`` array heads,
    e.g. ``track.artists[0].name`` → try_element_at(col, 1).getField(...).
    ``try_element_at`` (not ``element_at``, which throws under ANSI mode on
    an empty array) gives null → the field default — the reference's
    ``if track.get("artists") else "Unknown"`` guard (spotify_etl.py:241)."""
    col: Column | None = None
    for part in path.split("."):
        if "[" in part:
            base, idx = part[:-1].split("[")
            nxt = (F.col(base) if col is None else col.getField(base))
            col = F.try_element_at(nxt, F.lit(int(idx) + 1))
        else:
            col = F.col(part) if col is None else col.getField(part)
    assert col is not None
    return col


def flatten_with_defaults(df: DataFrame, fields: list[FieldSpec]) -> DataFrame:
    """Project nested documents to a flat table, defaulting every missing /
    null field (P9 — the reference's ``.get(k, default)`` idiom on every
    extraction)."""
    cols = []
    for f in fields:
        c = F.expr(f.expr) if f.expr else _path_expr(f.path)
        if f.cast:
            c = c.cast(f.cast)
        if f.default is not None:
            c = F.coalesce(c, F.lit(f.default))
        cols.append(c.alias(f.name))
    return df.select(*cols)


def track_payload_schema() -> T.StructType:
    """Nested raw-track payload schema (FIXTURES.md A3; spotify_etl.py:240-251,
    new.py:110-127): the shape REST payloads are parsed into via from_json."""
    artist = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
    )
    album = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("release_date", T.StringType()),
        ]
    )
    track = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("popularity", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("explicit", T.BooleanType()),
            T.StructField("preview_url", T.StringType()),
            T.StructField("artists", T.ArrayType(artist)),
            T.StructField("album", album),
            T.StructField(
                "external_urls",
                T.StructType([T.StructField("spotify", T.StringType())]),
            ),
        ]
    )
    return T.StructType(
        [T.StructField("played_at", T.StringType()), T.StructField("track", track)]
    )


# The reference's 10-column projection (P1, spotify_etl.py:237-255).
TRACK_FIELDS = [
    FieldSpec("artist_name", "track.artists[0].name", "Unknown"),
    FieldSpec("song_name", "track.name", "Unknown"),
    FieldSpec("popularity", "track.popularity", 0),
    FieldSpec("duration_ms", "track.duration_ms", 0),
    FieldSpec("explicit", "track.explicit", False),
    FieldSpec("external_url", "track.external_urls.spotify", ""),
    FieldSpec("preview_url", "track.preview_url", ""),
    FieldSpec("album_name", "track.album.name", "Unknown"),
    FieldSpec("release_date", "track.album.release_date", ""),
    FieldSpec("track_id", "track.id", ""),
]

# Pipeline 2's 8-column projection (P2, spotify_etl2.py:145-193) — adds the
# played_at event-time key and its date slice (P5: `played_at[:10] if
# played_at else ""`, spotify_etl2.py:170).
RECENTLY_PLAYED_FIELDS = [
    FieldSpec("song_name", "track.name", "Unknown"),
    FieldSpec("artist_name", "track.artists[0].name", "Unknown"),
    FieldSpec("played_at", "played_at", ""),
    FieldSpec("timestamp", "", "", expr="substring(played_at, 1, 10)"),
    FieldSpec("track_id", "track.id", ""),
    FieldSpec("album_name", "track.album.name", "Unknown"),
    FieldSpec("duration_ms", "track.duration_ms", 0),
    FieldSpec("popularity", "track.popularity", 0),
]

# Pipeline 3's wide projection (P3, new.py:113-127): 12 extracted columns;
# the 13th (`rank`, new.py:114) is a recency row_number the pipeline adds —
# a rank is a window over the data, not a field of it.
WIDE_TRACK_FIELDS = [
    FieldSpec("track_name", "track.name", "Unknown"),
    FieldSpec("artist_name", "track.artists[0].name", "Unknown"),
    FieldSpec("album_name", "track.album.name", "Unknown"),
    FieldSpec("spotify_url", "track.external_urls.spotify", ""),
    FieldSpec("preview_url", "track.preview_url", ""),
    FieldSpec("duration_ms", "track.duration_ms", 0),
    FieldSpec("popularity", "track.popularity", 0),
    FieldSpec("explicit", "track.explicit", False),
    FieldSpec("played_at", "played_at", ""),
    FieldSpec("track_id", "track.id", ""),
    FieldSpec("artist_id", "track.artists[0].id", ""),
    FieldSpec("album_id", "track.album.id", ""),
]
