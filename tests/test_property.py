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


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=29),       # day offset
            st.sampled_from(["a", "b", "c"]),             # group
            st.integers(min_value=0, max_value=99_999),   # cents
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=29),               # cutoff day
)
def test_incremental_merge_equals_full_for_any_split(spark, rows, cutoff):
    """merge(partials(base), partials(delta)) == partials(all) for ANY
    split point and ANY values — the monoid-associativity contract of
    operators/incremental.py, not just the one fixture cutoff."""
    from airflow_spotify_etl_spark.operators.incremental import (
        merge_rollup,
        rollup_snapshot,
    )

    df = spark.createDataFrame(
        [(d, g, c / 100.0) for d, g, c in rows], "day int, grp string, value double"
    )
    val = F.col("value").cast("decimal(18,2)")
    keys = ["day", "grp"]
    full = rollup_snapshot(df, keys, val)
    merged = merge_rollup(
        rollup_snapshot(df.filter(F.col("day") < cutoff), keys, val),
        rollup_snapshot(df.filter(F.col("day") >= cutoff), keys, val),
    )
    assert merged.exceptAll(full).isEmpty() and full.exceptAll(merged).isEmpty()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),  # cents in [0, 100.00]
        min_size=3,
        max_size=80,
    )
)
def test_outlier_inequality_matches_exact_rational_zscore(spark, cents):
    """The division-free integer inequality (q67) must agree with an
    EXACT rational z² > 9·σ² comparison (fractions module) on arbitrary
    2-decimal values — including values sitting exactly on the boundary,
    where a float z-score reference could legitimately disagree."""
    from fractions import Fraction

    from airflow_spotify_etl_spark.plans.relational import q67_value_outliers  # noqa: F401  (shape reference)

    df = spark.createDataFrame(
        [(i, "t", c / 100.0) for i, c in enumerate(cents)],
        "event_id long, event_type string, value double",
    )
    cv = F.round(F.col("value") * 100, 0).cast("decimal(38,0)")
    evc = df.select("event_id", "event_type", cv.alias("cv"))
    stats = evc.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cv").alias("sv"),
        F.sum(F.col("cv") * F.col("cv")).alias("ssq"),
    )
    dev = F.col("n") * F.col("cv") - F.col("sv")
    flagged = {
        r.event_id
        for r in evc.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("n") - 1) * dev * dev
            > 9 * F.col("n") * (F.col("n") * F.col("ssq") - F.col("sv") * F.col("sv"))
        )
        .collect()
    }

    n = len(cents)
    mean = Fraction(sum(cents), n)
    var = (
        sum((Fraction(c) - mean) ** 2 for c in cents) / (n - 1)
        if n > 1
        else Fraction(0)
    )
    expect = {
        i for i, c in enumerate(cents) if (Fraction(c) - mean) ** 2 > 9 * var
    }
    assert flagged == expect


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_weighted_sample_monotone_in_weight(spark, w_lo, w_hi):
    """For any two weights w_lo <= w_hi, the kept set at w_lo is a subset
    of the kept set at w_hi (same hash, higher threshold)."""
    from airflow_spotify_etl_spark.operators.sampling import weighted_sample

    if w_lo > w_hi:
        w_lo, w_hi = w_hi, w_lo
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    lo = {
        r.doc_id
        for r in weighted_sample(df.withColumn("w", F.lit(w_lo)), "w").collect()
    }
    hi = {
        r.doc_id
        for r in weighted_sample(df.withColumn("w", F.lit(w_hi)), "w").collect()
    }
    assert lo <= hi
