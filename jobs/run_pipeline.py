"""Thin spark-submit entry point for the Airflow DAG (dags/spotify_spark_dag.py).

Usage: spark-submit jobs/run_pipeline.py <pipeline> — where <pipeline> is
``top_tracks_etl`` / ``recently_played_etl`` / ``recently_played_analysis``.
Pipeline config arrives as ``--conf spark.spotify.*`` (the same channel the
reference fills from Airflow Variables, SURVEY.md §2.11); the summary dict
prints as one JSON line AND — when ``spark.spotify.summary_path`` is set —
lands in that file, which the DAG's on-success callback pushes to XCom
(dags/spotify_spark_dag.py push_summary_to_xcom). That file convention is
what completes the reference's XCom contract (spotify_etl.py:275-281:
PythonOperator return → XCom): SparkSubmitOperator never parses stdout, so
without it the summary would print and vanish. The DAG runs spark-submit in
client mode on the Airflow worker, so the driver-local summary file IS
worker-local — readable by the callback.
"""

from __future__ import annotations

import json
import sys

from airflow_spotify_etl_spark.functions.strings import parse_bool_flag
from airflow_spotify_etl_spark.pipelines import (
    run_recently_played_analysis,
    run_recently_played_etl,
    run_top_tracks_etl,
)
from airflow_spotify_etl_spark.session import get_spark
from airflow_spotify_etl_spark.sources.rest import SpotifyRestSource


def _conf(spark, key: str, default: str | None = None) -> str | None:
    return spark.conf.get(f"spark.spotify.{key}", default)


def main(argv: list[str] | None = None, source: SpotifyRestSource | None = None) -> dict:
    pipeline = (argv or sys.argv[1:])[0]
    spark = get_spark(f"spotify-{pipeline}")
    source = source or SpotifyRestSource(spark)
    if pipeline == "top_tracks_etl":
        summary = run_top_tracks_etl(
            spark,
            source,
            artist_name=_conf(spark, "artist_name", "Ed Sheeran"),
            output_path=_conf(spark, "output_path", "songs.csv"),
            market=_conf(spark, "market", "US"),
        )
    elif pipeline == "recently_played_etl":
        summary = run_recently_played_etl(
            spark,
            source,
            db_path=_conf(spark, "db_path", "recently_played"),
            limit=int(_conf(spark, "limit", "50")),
        )
    elif pipeline == "recently_played_analysis":
        summary = run_recently_played_analysis(
            spark,
            source,
            output_path=_conf(spark, "output_path", "recently_played_tracks.csv"),
            limit=int(_conf(spark, "limit", "10")),
            display_results=parse_bool_flag(
                _conf(spark, "display_results", "true")
            ),
        )
    else:
        raise SystemExit(f"unknown pipeline {pipeline!r}")
    print(json.dumps(summary))
    summary_path = _conf(spark, "summary_path")
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump(summary, f)
    return summary


if __name__ == "__main__":
    main()
