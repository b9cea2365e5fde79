"""Airflow DAG with the reference's exact topology (O1-O5), scheduling
the engine's Spark jobs: get_replay_ids >> download_replays >>
retry_failed_replays >> compact_daily_replays
(reference dags/showdown_replay_etl_dag.py:35-80).

Kept in the orchestration layer, per SURVEY.md §2.10: daily schedule,
retries=1, conditional skip when discovery finds nothing (O3,
discovery.py:136), compaction under ALL_DONE so it runs even after
upstream failure/skip (O4, :76). XCom carries only counts/batch ids —
work lists are re-derived from the metadata table by each job (O5 at
100 TB: never id-lists through XCom).

Airflow is not installed in the test container, so the module degrades
to an importable no-op there; the task callables themselves are plain
functions tested via the jobs package.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

LAKE_ROOT = os.environ.get("SHOWDOWN_LAKE_ROOT", "/data/showdown_lake")
FORMAT_ID = os.environ.get("SHOWDOWN_FORMAT_ID", "gen9randombattle")


def _run_stage(stage: str, **params):
    """One Spark job per task, mirroring SparkSubmitOperator semantics
    in-process (swap for SparkSubmitOperator against a cluster master)."""
    from pokemon_showdown_airflow_etl_spark.jobs import (
        ReplayLake,
        compact,
        discover,
        download,
        retry_failed,
    )
    from pokemon_showdown_airflow_etl_spark.session import get_spark
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient

    spark = get_spark(app_name=f"showdown-{stage}")
    lake = ReplayLake(LAKE_ROOT)
    client = ReplayApiClient(request_pause_s=0.1)  # reference pacing, api.py:66
    fn = {
        "discover": lambda: discover(spark, lake, client, FORMAT_ID, **params),
        "download": lambda: download(spark, lake, client, FORMAT_ID),
        "retry": lambda: retry_failed(spark, lake, client, FORMAT_ID),
        "compact": lambda: compact(spark, lake, FORMAT_ID),
    }[stage]
    stats = fn()
    if stage == "discover" and stats.get("new_replays", 0) == 0:
        try:
            from airflow.exceptions import AirflowSkipException
        except ImportError:
            return stats
        raise AirflowSkipException("no new replays")  # O3, discovery.py:136
    return stats


try:  # pragma: no cover - airflow not installed in the test container
    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.utils.trigger_rule import TriggerRule

    with DAG(
        dag_id="showdown_replay_etl",
        schedule_interval=timedelta(days=1),  # daily (reference :39)
        start_date=datetime(2025, 1, 1),
        catchup=False,
        default_args={"retries": 1, "retry_delay": timedelta(minutes=5)},
        max_active_runs=1,
    ) as dag:
        get_replay_ids = PythonOperator(
            task_id="get_replay_ids",
            python_callable=lambda: _run_stage("discover", max_pages=5),
        )
        download_replays = PythonOperator(
            task_id="download_replays",
            python_callable=lambda: _run_stage("download"),
            execution_timeout=timedelta(hours=6),
        )
        retry_failed_replays = PythonOperator(
            task_id="retry_failed_replays",
            python_callable=lambda: _run_stage("retry"),
        )
        compact_daily_replays = PythonOperator(
            task_id="compact_daily_replays",
            python_callable=lambda: _run_stage("compact"),
            trigger_rule=TriggerRule.ALL_DONE,  # O4, reference :76
            execution_timeout=timedelta(hours=8),
        )
        get_replay_ids >> download_replays >> retry_failed_replays >> compact_daily_replays
except ImportError:
    dag = None
