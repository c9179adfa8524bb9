"""DAG-spec unit tests (SURVEY.md §7 item 14): the orchestration seam must
preserve the reference's scheduling semantics (spotify_dag.py:8-27) and
import cleanly without Airflow installed."""

from __future__ import annotations

import datetime as dt
import importlib.util
import sys
from pathlib import Path

DAG_PATH = Path(__file__).resolve().parent.parent / "dags" / "spotify_spark_dag.py"


def _load():
    spec = importlib.util.spec_from_file_location("spotify_spark_dag", DAG_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_dag_module_imports_without_airflow():
    mod = _load()
    # In this env Airflow is absent → the module must still import, with the
    # materialized DAG gated off.
    assert mod.dag is None or mod.dag is not None  # import itself is the test


def test_default_args_match_reference():
    mod = _load()
    a = mod.DEFAULT_ARGS
    assert a["retries"] == 2  # spotify_dag.py:15
    assert a["retry_delay"] == dt.timedelta(minutes=5)  # :16
    assert a["depends_on_past"] is False
    assert a["email_on_failure"] is True
    assert a["email_on_retry"] is False
    assert a["owner"] == "airflow"


def test_dag_config_matches_reference():
    mod = _load()
    c = mod.DAG_CONFIG
    assert c["schedule"] == dt.timedelta(days=1)  # spotify_dag.py:23
    assert c["catchup"] is False  # :24
    assert c["max_active_runs"] == 1  # :25
    assert "spotify" in c["tags"] and "etl" in c["tags"]


def test_job_specs_cover_all_three_pipelines():
    mod = _load()
    ids = {s["task_id"] for s in mod.JOB_SPECS}
    assert ids == {"top_tracks_etl", "recently_played_etl", "recently_played_analysis"}
    for s in mod.JOB_SPECS:
        assert s["application"] == "jobs/run_pipeline.py"
        assert s["application_args"][0] == s["task_id"]


def test_job_runner_dispatches_and_prints_summary(spark, tmp_path, capsys):
    """The spark-submit target end-to-end with a canned source: config via
    spark.spotify.* conf, summary JSON on stdout for XCom capture."""
    import importlib.util
    import json as _json

    from tests.test_pipelines import CannedTransport
    from airflow_spotify_etl_spark.sources.rest import SpotifyRestSource

    job_path = Path(__file__).resolve().parent.parent / "jobs" / "run_pipeline.py"
    spec = importlib.util.spec_from_file_location("run_pipeline", job_path)
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    spark.conf.set("spark.spotify.output_path", str(tmp_path / "out_csv"))
    spark.conf.set("spark.spotify.display_results", "false")
    src = SpotifyRestSource(spark, transport=CannedTransport(), token="t")
    summary = job.main(["recently_played_analysis"], source=src)
    assert summary["tracks_processed"] == 5 and summary["status"] == "success"
    printed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["tracks_processed"] == 5


def test_summary_file_contract_end_to_end(spark, tmp_path, capsys):
    """XCom wiring (reference spotify_etl.py:275-281): the job writes its
    summary JSON to spark.spotify.summary_path; the DAG's success callback
    reads that file and xcom_pushes it."""
    import importlib.util
    import json as _json

    from tests.test_pipelines import CannedTransport
    from airflow_spotify_etl_spark.sources.rest import SpotifyRestSource

    job_path = Path(__file__).resolve().parent.parent / "jobs" / "run_pipeline.py"
    spec = importlib.util.spec_from_file_location("run_pipeline2", job_path)
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    summary_file = tmp_path / "recently_played_analysis.json"
    spark.conf.set("spark.spotify.output_path", str(tmp_path / "out_csv"))
    spark.conf.set("spark.spotify.display_results", "false")
    spark.conf.set("spark.spotify.summary_path", str(summary_file))
    src = SpotifyRestSource(spark, transport=CannedTransport(), token="t")
    summary = job.main(["recently_played_analysis"], source=src)
    spark.conf.unset("spark.spotify.summary_path")
    assert _json.loads(summary_file.read_text()) == summary

    # The DAG-side callback pushes exactly that payload under key=summary.
    mod = _load()

    class FakeTI:
        task_id = "recently_played_analysis"

        def __init__(self):
            self.pushed = {}

        def xcom_push(self, key, value):
            self.pushed[key] = value

    ti = FakeTI()
    orig = mod.summary_path_for
    mod.summary_path_for = lambda task_id, summary_dir=None: str(summary_file)
    try:
        mod.push_summary_to_xcom({"ti": ti})
    finally:
        mod.summary_path_for = orig
    assert ti.pushed["summary"] == summary


def test_build_dag_wires_summary_conf():
    mod = _load()
    for spec in mod.JOB_SPECS:
        path = mod.summary_path_for(spec["task_id"])
        assert path.endswith(f"{spec['task_id']}.json")
