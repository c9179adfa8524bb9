"""End-to-end pipeline + REST connector tests (VERDICT r1 #2/#3).

A canned transport stands in for the Spotify API — the same injection seam
the production path exposes (sources/rest.py: ``transport`` param). Every
previously-untested stage runs here as one composed flow: token flow (S1),
search LIMIT-1 (S3), top-tracks (S4), cursor scan + clamp (S5/F6),
PERMISSIVE malformed docs (F8), flatten (P1-P4/P9), quality gate (F1-F4),
CSV / append sinks (K1/K2), summary record (K4).
"""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from airflow_spotify_etl_spark.pipelines import (
    run_recently_played_analysis,
    run_recently_played_etl,
    run_top_tracks_etl,
)
from airflow_spotify_etl_spark.sources.rest import OAuthUserAuth, SpotifyRestSource


def _track(i: int, *, artists=True, explicit=False, popularity=None) -> dict:
    return {
        "id": f"trk-{i}",
        "name": f"Song {i}",
        "popularity": 50 + i if popularity is None else popularity,
        "duration_ms": 200_000 + i * 1000,
        "explicit": explicit,
        "preview_url": f"https://p.example/{i}",
        "artists": [{"id": f"art-{i % 2}", "name": f"Artist {i % 2}"}] if artists else [],
        "album": {"id": f"alb-{i}", "name": f"Album {i}", "release_date": "2024-01-01"},
        "external_urls": {"spotify": f"https://open.spotify.com/track/trk-{i}"},
    }


class CannedTransport:
    """Routes URLs to canned payloads; records every request for asserts."""

    def __init__(self, n_recent: int = 5):
        self.calls: list[tuple[str, dict, bytes | None]] = []
        self.n_recent = n_recent

    def __call__(self, url: str, headers: dict, data: bytes | None = None) -> dict:
        self.calls.append((url, headers, data))
        if url.startswith("https://accounts.spotify.com/api/token"):
            return {"access_token": "tok-abc", "expires_in": 3600}
        if "/v1/search" in url:
            return {"artists": {"items": [{"id": "art-0", "name": "Artist 0"}]}}
        if "/top-tracks" in url:
            return {"tracks": [_track(i) for i in range(3)]}
        if "/me/player/recently-played" in url:
            items = [
                {
                    "played_at": f"2024-01-01T10:{i:02d}:00.000Z",
                    "track": _track(i, explicit=(i == 1)),
                }
                for i in range(self.n_recent)
            ]
            return {"items": items}
        raise AssertionError(f"unexpected URL {url}")


@pytest.fixture()
def transport():
    return CannedTransport()


@pytest.fixture()
def source(spark, transport):
    spark.conf.set("spark.spotify.client_id", "cid")
    spark.conf.set("spark.spotify.client_secret", "sec")
    return SpotifyRestSource(spark, transport=transport)


# -- connector unit coverage (S1-S5, F6, F8) -------------------------------

def test_token_flow_sends_basic_auth(source, transport):
    assert source.token() == "tok-abc"
    url, headers, data = transport.calls[0]
    expected = base64.b64encode(b"cid:sec").decode()
    assert headers["Authorization"] == f"Basic {expected}"
    assert data == b"grant_type=client_credentials"
    # Token is cached — a second scan must not re-POST (reference caches the
    # token per run, spotify_etl.py:220).
    source.token()
    assert sum("accounts.spotify" in u for u, _, _ in transport.calls) == 1


def test_search_pushes_limit_1(source, transport):
    df = source.search_artist("Artist 0")
    assert df.count() == 1
    search_url = next(u for u, _, _ in transport.calls if "/v1/search" in u)
    assert "limit=1" in search_url and "q=Artist+0" in search_url


def test_recently_played_clamps_limit(source, transport):
    source.recently_played(limit=999)
    url = next(u for u, _, _ in transport.calls if "recently-played" in u)
    assert "limit=50" in url
    source.recently_played(limit=0)
    url2 = [u for u, _, _ in transport.calls if "recently-played" in u][-1]
    assert "limit=1" in url2


def test_cursor_unit_adapter_converts_us_to_ms(source, transport):
    source.recently_played_since_us(after_us=1_700_000_000_000_000)
    url = next(u for u, _, _ in transport.calls if "recently-played" in u)
    assert "after=1700000000000" in url  # microseconds // 1000


def test_permissive_malformed_doc_becomes_defaults(spark, source):
    """F8 — a malformed track doc (wrong types) nulls out instead of failing
    the scan; flatten then fills the reference defaults (spotify_etl.py:241)."""
    from airflow_spotify_etl_spark.operators.flatten import (
        TRACK_FIELDS,
        flatten_with_defaults,
    )

    rows = [
        {"played_at": None, "track": _track(1)},
        {"played_at": None, "track": {"popularity": "NOT-A-NUMBER", "artists": []}},
    ]
    df = source._payload_df(rows)
    flat = flatten_with_defaults(df, TRACK_FIELDS)
    got = {r["song_name"]: r for r in flat.collect()}
    assert got["Song 1"]["popularity"] == 51
    bad = got["Unknown"]
    assert bad["artist_name"] == "Unknown"  # artists=[] head-of-array default
    assert bad["popularity"] == 0 and bad["track_id"] == ""


def test_oauth_user_auth_refreshes_and_caches(spark, transport, tmp_path):
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({"refresh_token": "r-1"}))
    spark.conf.set("spark.spotify.client_id", "cid")
    spark.conf.set("spark.spotify.client_secret", "sec")
    auth = OAuthUserAuth(spark, cache_path=str(cache), transport=transport)
    assert auth.token() == "tok-abc"
    _, _, data = transport.calls[0]
    assert b"grant_type=refresh_token" in data and b"refresh_token=r-1" in data
    # Cache now holds a fresh access token — second call is transport-free.
    n_calls = len(transport.calls)
    assert auth.token() == "tok-abc"
    assert len(transport.calls) == n_calls


def test_fetch_partitioned_handles_empty_partitions(spark):
    """Executor-side fan-out: partitions whose keys return no records must
    still yield schema-conformant (empty) frames (ADVICE r1 fix)."""
    from airflow_spotify_etl_spark.sources.rest import fetch_partitioned

    keys = spark.createDataFrame([(k,) for k in "abcdefgh"], "key string").repartition(8)

    def fetch_one(key: str) -> list[dict]:
        if key in ("a", "b"):
            return [{"key": key, "n": ord(key)}]
        return []  # sparse partition

    out = fetch_partitioned(spark, keys, fetch_one, "key string, n long")
    rows = {(r.key, r.n) for r in out.collect()}
    assert rows == {("a", 97), ("b", 98)}
    assert out.columns == ["key", "n"]


# -- composed end-to-end flows (the reference's three entry points) --------

def test_top_tracks_etl_end_to_end(spark, source, tmp_path):
    out = str(tmp_path / "songs_csv")
    summary = run_top_tracks_etl(
        spark, source, "Artist 0", out, execution_date="2024-01-02"
    )
    assert summary["tracks_processed"] == 3
    assert summary["avg_popularity"] == 51.0  # mean(50, 51, 52)
    assert summary["status"] == "success"
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    assert set(back.columns) >= {"artist_name", "song_name", "popularity", "track_id"}


def test_top_tracks_etl_artist_not_found_raises(spark, tmp_path):
    class EmptySearch(CannedTransport):
        def __call__(self, url, headers, data=None):
            if "/v1/search" in url:
                return {"artists": {"items": []}}
            return super().__call__(url, headers, data)

    src = SpotifyRestSource(spark, transport=EmptySearch())
    with pytest.raises(ValueError, match="not found"):
        run_top_tracks_etl(spark, src, "Nobody", str(tmp_path / "x"))


def test_recently_played_etl_is_idempotent(spark, source, tmp_path):
    db = str(tmp_path / "recently_played")
    s1 = run_recently_played_etl(spark, source, db, limit=50)
    assert s1["tracks_processed"] == 5 and s1["rows_appended"] == 5
    assert s1["unique_artists"] == 2
    assert s1["date_range"] == "2024-01-01 to 2024-01-01"
    assert s1["status"] == "success"
    # Re-run with the same payload: the reference double-inserts here
    # (spotify_etl2.py:220); the anti-join guard appends nothing.
    s2 = run_recently_played_etl(spark, source, db, limit=50)
    assert s2["rows_appended"] == 0
    assert spark.read.parquet(db).count() == 5


def test_recently_played_etl_empty_is_no_data(spark, tmp_path):
    class Empty(CannedTransport):
        def __call__(self, url, headers, data=None):
            if "recently-played" in url:
                return {"items": []}
            return super().__call__(url, headers, data)

    src = SpotifyRestSource(spark, transport=Empty(), token="t")
    out = run_recently_played_etl(spark, src, str(tmp_path / "db"))
    assert out == {"tracks_processed": 0, "status": "no_data"}


def test_recently_played_duplicate_pk_raises(spark, tmp_path):
    class Dup(CannedTransport):
        def __call__(self, url, headers, data=None):
            if "recently-played" in url:
                item = {"played_at": "2024-01-01T10:00:00.000Z", "track": _track(1)}
                return {"items": [item, dict(item)]}
            return super().__call__(url, headers, data)

    src = SpotifyRestSource(spark, transport=Dup(), token="t")
    with pytest.raises(ValueError, match="Primary key"):
        run_recently_played_etl(spark, src, str(tmp_path / "db"))


def test_recently_played_analysis_end_to_end(spark, source, tmp_path, capsys):
    out = str(tmp_path / "analysis_csv")
    summary = run_recently_played_analysis(
        spark, source, out, limit=10, display_results=True
    )
    assert summary["tracks_processed"] == 5
    assert summary["unique_artists"] == 2
    assert summary["explicit_tracks"] == 1
    assert summary["average_popularity"] == 52.0  # mean(50..54)
    # K3 display actually printed (m:ss duration column included, P8).
    shown = capsys.readouterr().out
    assert "3:2" in shown  # 200s+ → "3:2x"
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 5
    # W1: rank 1 is the most recent played_at.
    top = back.filter(F.col("rank") == 1).collect()[0]
    assert top["played_at"] == "2024-01-01T10:04:00.000Z"


def test_oauth_initial_grant_seeds_cache(spark, tmp_path):
    """S6 initial authorization-code grant (reference new.py:63-77): the
    one-time code->token exchange seeds the cache, after which token()
    serves/refreshes WITHOUT re-authorization."""

    class GrantTransport(CannedTransport):
        def __call__(self, url, headers, data=None):
            self.calls.append((url, headers, data))
            assert url.startswith("https://accounts.spotify.com/api/token")
            if b"grant_type=authorization_code" in data:
                return {
                    "access_token": "tok-initial",
                    "refresh_token": "r-initial",
                    "expires_in": 3600,
                    "scope": "user-read-recently-played",
                }
            return {"access_token": "tok-refreshed", "expires_in": 3600}

    spark.conf.set("spark.spotify.client_id", "cid")
    spark.conf.set("spark.spotify.client_secret", "sec")
    t = GrantTransport()
    cache = tmp_path / "cache.json"
    auth = OAuthUserAuth(spark, cache_path=str(cache), transport=t)

    url = auth.authorize_url("http://localhost:8888/callback", state="xyz")
    assert url.startswith("https://accounts.spotify.com/authorize?")
    assert "client_id=cid" in url and "response_type=code" in url
    assert "scope=user-read-recently-played" in url and "state=xyz" in url

    seeded = auth.authorize("code-123", "http://localhost:8888/callback")
    assert seeded["refresh_token"] == "r-initial"
    _, headers, data = t.calls[0]
    creds = base64.b64decode(headers["Authorization"].split()[1]).decode()
    assert creds == "cid:sec"
    assert b"code=code-123" in data
    assert b"redirect_uri=http%3A%2F%2Flocalhost%3A8888%2Fcallback" in data

    # cache is seeded: fresh token served with no further HTTP...
    assert auth.token() == "tok-initial"
    assert len(t.calls) == 1
    # ...and once expired, the refresh grant (not re-authorization) runs.
    stored = json.loads(cache.read_text())
    stored["expires_at"] = 0
    cache.write_text(json.dumps(stored))
    assert auth.token() == "tok-refreshed"
    assert b"grant_type=refresh_token" in t.calls[-1][2]
