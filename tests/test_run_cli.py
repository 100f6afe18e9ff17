"""CLI entry point smoke: ``python -m reddit_can_bigdata_spark.run``
(engine analog of the reference's Airflow DAG operation,
`airflow/dags/reddit_can_complete_pipeline.py:269-520`).

Calls ``run.main`` in-process (get_spark is a getOrCreate singleton, so
the suite's session is reused — no second JVM)."""

from __future__ import annotations

import json

from reddit_can_bigdata_spark import orchestration
from reddit_can_bigdata_spark.run import main


def _last_json_line(out: str) -> dict:
    return json.loads(out.strip().splitlines()[-1])


def test_cli_runs_and_emits_report(spark, sf_dir, capsys):
    assert main(["--sf-dir", sf_dir]) == 0
    report = _last_json_line(capsys.readouterr().out)
    for key in (
        "posts",
        "comments",
        "processed_posts",
        "unique_users",
        "ml_branch",
        "network_branch",
        "sentiment_results",
        "ml_coverage_pct",
        "network_users",
        "stage_seconds",
        "total_seconds",
    ):
        assert key in report, key
    assert set(report["stage_seconds"]) == {
        "session_start",
        "pipeline",
        "report_collect",
    }
    assert report["total_seconds"] >= report["stage_seconds"]["pipeline"]
    # gate consistency: the branch strings are the DAG's task ids
    assert report["ml_branch"] in ("run_ml_analysis", "skip_ml")
    assert report["network_branch"] in ("run_network_analysis", "skip_network")
    if report["ml_branch"] == "run_ml_analysis":
        assert report["sentiment_results"] == report["processed_posts"]
        assert report["ml_coverage_pct"] == 100.0
    else:
        assert report["sentiment_results"] == 0


def test_cli_skip_flags_force_skip_and_restore_thresholds(spark, sf_dir, capsys):
    before = (orchestration.MIN_POSTS_FOR_ML, orchestration.MIN_USERS_FOR_NETWORK)
    assert main(["--sf-dir", sf_dir, "--skip-ml", "--skip-network"]) == 0
    report = _last_json_line(capsys.readouterr().out)
    assert report["ml_branch"] == "skip_ml"
    assert report["network_branch"] == "skip_network"
    assert report["sentiment_results"] == 0 and report["network_users"] == 0
    # thresholds restored even though the run mutated them
    assert (
        orchestration.MIN_POSTS_FOR_ML,
        orchestration.MIN_USERS_FOR_NETWORK,
    ) == before


def test_cli_help_needs_no_spark(capsys):
    import pytest

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    assert "--sf-dir" in capsys.readouterr().out
