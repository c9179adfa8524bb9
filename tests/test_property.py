"""Property-based differential tests (hypothesis): the Spark operators vs
straight-Python reference implementations of the reference repo's logic,
over generated inputs — edge cases a hand-picked fixture misses (missing
fields at every position, empty artists, boundary durations)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_spotify_etl_spark.functions.strings import duration_mmss
from airflow_spotify_etl_spark.operators.flatten import (
    TRACK_FIELDS,
    flatten_with_defaults,
    track_payload_schema,
)

_SETTINGS = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@_SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=30))
def test_duration_mmss_matches_python_divmod(spark, ms_values):
    """P8 property: Spark's format == the reference's `ms // 60000`,
    `(ms % 60000) // 1000` zero-padded divmod (new.py:170) for any ms."""
    df = spark.createDataFrame([(v,) for v in ms_values], "ms long")
    got = [r.s for r in df.select(duration_mmss("ms").alias("s")).collect()]
    expected = [f"{v // 60000}:{(v % 60000) // 1000:02d}" for v in ms_values]
    assert sorted(got) == sorted(expected)


def _dflt(value, default):
    """Default on missing-or-null ONLY — `.get(k, default)` semantics with
    JSON null folded in (from_json cannot distinguish the two); empty
    strings and False pass through untouched."""
    return default if value is None else value


def _reference_flatten(track: dict) -> dict:
    """The reference's extraction loop (spotify_etl.py:241-250) in plain
    Python over the raw dict."""
    artists = track.get("artists")
    album = track.get("album") or {}
    return {
        "artist_name": _dflt(artists[0].get("name") if artists else None, "Unknown"),
        "song_name": _dflt(track.get("name"), "Unknown"),
        "popularity": _dflt(track.get("popularity"), 0),
        "duration_ms": _dflt(track.get("duration_ms"), 0),
        "explicit": _dflt(track.get("explicit"), False),
        "external_url": _dflt((track.get("external_urls") or {}).get("spotify"), ""),
        "preview_url": _dflt(track.get("preview_url"), ""),
        "album_name": _dflt(album.get("name"), "Unknown"),
        "release_date": _dflt(album.get("release_date"), ""),
        "track_id": _dflt(track.get("id"), ""),
    }


_name = st.one_of(st.none(), st.text(alphabet="abcXYZ 09", min_size=0, max_size=12))
_track = st.fixed_dictionaries(
    {},
    optional={
        "id": _name,
        "name": _name,
        "popularity": st.one_of(st.none(), st.integers(0, 100)),
        "duration_ms": st.one_of(st.none(), st.integers(0, 10**7)),
        "explicit": st.one_of(st.none(), st.booleans()),
        "preview_url": _name,
        "artists": st.one_of(
            st.none(),
            st.lists(
                st.fixed_dictionaries({}, optional={"id": _name, "name": _name}),
                max_size=3,
            ),
        ),
        "album": st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {}, optional={"id": _name, "name": _name, "release_date": _name}
            ),
        ),
        "external_urls": st.one_of(
            st.none(), st.fixed_dictionaries({}, optional={"spotify": _name})
        ),
    },
)


@_SETTINGS
@given(st.lists(_track, min_size=1, max_size=15))
def test_flatten_defaults_match_reference_semantics(spark, tracks):
    """P1/P4/P9 property: for ANY nested payload (fields missing, null, or
    empty at every level) the declarative flatten produces exactly what the
    reference's imperative `.get(k, default)` loop produces.

    Caveat encoded here: empty-string names stay empty strings (coalesce
    replaces only NULL) — matching `.get("name", "Unknown")`, which also
    keeps "" — while the reference's falsy-or idiom `x or default` would
    not; the generator includes "" to pin the .get semantics."""
    rows = [(json.dumps({"played_at": None, "track": t}),) for t in tracks]
    df = spark.createDataFrame(rows, "raw string").select(
        F.from_json("raw", track_payload_schema()).alias("doc")
    ).select("doc.*")
    flat = flatten_with_defaults(df, TRACK_FIELDS)
    got = sorted(
        (tuple(r[f.name] for f in TRACK_FIELDS)) for r in flat.collect()
    )
    expected = sorted(
        tuple(_reference_flatten(t)[f.name] for f in TRACK_FIELDS) for t in tracks
    )
    assert got == expected


@given(
    r1=st.integers(min_value=0, max_value=100),
    r2=st.integers(min_value=0, max_value=100),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_stratified_sample_nested_and_bounded(spark, r1, r2):
    """Hash-threshold sampling: a lower rate's sample is a SUBSET of a
    higher rate's (same salt ⇒ same buckets), and rate 1.0 keeps all."""
    from airflow_spotify_etl_spark.operators.sampling import stratified_sample

    lo, hi = sorted((r1, r2))
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    a = {r.doc_id for r in stratified_sample(df, {"en": lo / 100}).collect()}
    b = {r.doc_id for r in stratified_sample(df, {"en": hi / 100}).collect()}
    assert a <= b
    assert len({r.doc_id for r in stratified_sample(df, {"en": 1.0}).collect()}) == 200


@given(words=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_entropy_and_repetition_bounds(spark, words):
    """0 <= entropy <= ln(n_distinct); ratios in (0, 1]; single-token docs
    pin both metrics to their degenerate values."""
    import math

    from airflow_spotify_etl_spark.operators.text import (
        repetition_metrics,
        token_entropy,
    )

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    ent = token_entropy(df).collect()[0]
    n_distinct = len(set(words))
    # 5e-5 slack: the operator rounds to 4 decimals, which can nudge the
    # value just past the exact ln(n_distinct) bound.
    assert -5e-5 <= ent.entropy <= math.log(max(n_distinct, 2)) + 5e-5
    assert 0.0 <= ent.entropy_norm <= 1.0
    rep = repetition_metrics(df).collect()[0]
    assert rep.n_tokens == len(words)
    assert 0 < rep.type_token_ratio <= 1.0
    assert 0 < rep.top_token_frac <= 1.0
