"""Python Data Source tests: batch pushdown options, native streaming
offsets (resume without re-emitting), flatten integration."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from airflow_spotify_etl_spark.sources.datasource import SpotifyRecentlyPlayedSource


def _payload(n, start_min=0):
    return json.dumps(
        {
            "items": [
                {
                    "played_at": f"2024-01-01T10:{start_min + i:02d}:00.000Z",
                    "track": {"id": f"trk-{start_min + i}", "name": f"Song {start_min + i}",
                              "popularity": 50 + i},
                }
                for i in range(n)
            ]
        }
    )


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SpotifyRecentlyPlayedSource)


def test_batch_read_returns_payload_rows(spark):
    df = (
        spark.read.format("spotify_recently_played")
        .option("payload_json", _payload(5))
        .load()
    )
    assert df.columns == ["played_at", "track_json"]
    assert df.count() == 5


def test_batch_read_flattens_through_the_same_path(spark):
    from airflow_spotify_etl_spark.operators.flatten import track_payload_schema

    df = (
        spark.read.format("spotify_recently_played")
        .option("payload_json", _payload(3))
        .load()
    )
    track_schema = track_payload_schema()["track"].dataType
    flat = df.select(
        "played_at",
        F.from_json("track_json", track_schema).alias("track"),
    ).select("played_at", "track.name", "track.popularity")
    rows = flat.orderBy("played_at").collect()
    assert rows[0]["name"] == "Song 0" and rows[0]["popularity"] == 50


def test_stream_offsets_resume_without_reemit(spark, tmp_path):
    """The native streaming cursor: batch 1 emits 3 rows; a restart with 2
    NEW rows in the payload emits only those 2 (checkpointed offset, ST2)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain(payload):
        q = (
            spark.readStream.format("spotify_recently_played")
            .option("payload_json", payload)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(_payload(3))
    assert spark.read.parquet(out).count() == 3

    # Restart: same 3 rows plus 2 newer ones → only the 2 new rows land.
    drain(_payload(5))
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert got.select("played_at").distinct().count() == 5
