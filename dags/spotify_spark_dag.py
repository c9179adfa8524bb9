"""Airflow DAG — the orchestration seam (SURVEY.md §2.11, §7 item 14).

Per the north star, Airflow only SCHEDULES Spark jobs: each of the three
composed pipelines (airflow_spotify_etl_spark/pipelines) becomes one
``SparkSubmitOperator`` task submitting ``jobs/run_pipeline.py`` with the
pipeline name and its config as application args. The reference's
``default_args``/DAG semantics (spotify_dag.py:8-27: retries=2, 5-minute
retry delay, daily schedule, catchup=False, max_active_runs=1 — the
non-overlap guarantee ST7 relies on) are preserved verbatim.

The module imports WITHOUT Airflow installed: the DAG/task declarations are
plain-dict specs (``DAG_CONFIG`` / ``DEFAULT_ARGS`` / ``JOB_SPECS``) that
``build_dag()`` materializes only when Airflow is importable. This keeps the
spec unit-testable in the engine's own test env and lets an Airflow
deployment drop the file into its dags/ folder unchanged.
"""

from __future__ import annotations

import datetime as dt

# The reference's default_args, spotify_dag.py:8-17.
DEFAULT_ARGS = {
    "owner": "airflow",
    "depends_on_past": False,
    "start_date": dt.datetime(2020, 11, 8),
    "email": ["airflow@example.com"],
    "email_on_failure": True,
    "email_on_retry": False,
    "retries": 2,
    "retry_delay": dt.timedelta(minutes=5),
}

# The reference's DAG kwargs, spotify_dag.py:19-27.
DAG_CONFIG = {
    "dag_id": "spotify_spark_dag",
    "description": "Spotify ETL as Spark jobs scheduled by Airflow",
    "schedule": dt.timedelta(days=1),
    "catchup": False,
    "max_active_runs": 1,
    "tags": ["spotify", "etl", "music", "spark"],
}

# One SparkSubmitOperator per composed pipeline. `application` is the thin
# job runner; `application_args[0]` selects the pipeline; config flows as
# --conf spark.spotify.* (the engine's credential/config channel,
# sources/rest.py resolve_credential).
JOB_SPECS = [
    {
        "task_id": "top_tracks_etl",
        "application": "jobs/run_pipeline.py",
        "application_args": ["top_tracks_etl"],
        "conf_keys": [
            "spark.spotify.artist_name",
            "spark.spotify.output_path",
            "spark.spotify.market",
        ],
    },
    {
        "task_id": "recently_played_etl",
        "application": "jobs/run_pipeline.py",
        "application_args": ["recently_played_etl"],
        "conf_keys": ["spark.spotify.db_path", "spark.spotify.limit"],
    },
    {
        "task_id": "recently_played_analysis",
        "application": "jobs/run_pipeline.py",
        "application_args": ["recently_played_analysis"],
        "conf_keys": [
            "spark.spotify.output_path",
            "spark.spotify.limit",
            "spark.spotify.display_results",
        ],
    },
]


def summary_path_for(task_id: str, summary_dir: str = "/tmp/spotify_summaries") -> str:
    """Where the job writes its summary JSON (jobs/run_pipeline.py) and the
    success callback reads it back. spark-submit runs in client mode on the
    Airflow worker, so this worker-local path is visible to both sides."""
    return f"{summary_dir}/{task_id}.json"


def push_summary_to_xcom(context: dict) -> None:
    """on_success_callback: read the job's summary file and push it to XCom
    under key 'summary' — completing the reference's XCom contract
    (spotify_etl.py:275-281, where the PythonOperator return dict lands in
    XCom automatically; SparkSubmitOperator publishes nothing by itself)."""
    import json

    ti = context["ti"]
    path = summary_path_for(ti.task_id)
    with open(path) as f:
        ti.xcom_push(key="summary", value=json.load(f))


def build_dag(conf: dict[str, str] | None = None):
    """Materialize the Airflow DAG (requires Airflow + the Spark provider
    at import time — i.e. inside an Airflow deployment, not the engine's
    test env)."""
    import os

    from airflow import DAG
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )

    dag = DAG(default_args=DEFAULT_ARGS, **DAG_CONFIG)
    conf = conf or {}
    os.makedirs("/tmp/spotify_summaries", exist_ok=True)
    for spec in JOB_SPECS:
        task_conf = {k: conf[k] for k in spec["conf_keys"] if k in conf}
        task_conf["spark.spotify.summary_path"] = summary_path_for(spec["task_id"])
        SparkSubmitOperator(
            task_id=spec["task_id"],
            application=spec["application"],
            application_args=spec["application_args"],
            conf=task_conf,
            on_success_callback=push_summary_to_xcom,
            dag=dag,
        )
    return dag


try:  # pragma: no cover - only runs inside an Airflow deployment
    import airflow  # noqa: F401

    dag = build_dag()
except ImportError:
    dag = None
