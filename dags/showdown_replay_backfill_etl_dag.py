"""Backfill DAG (O2): manual trigger, single active run, pages strictly
backwards from MIN(uploadtime) — reference
dags/showdown_replay_backfill_etl_dag.py:30-96. Downstream stages are
identical to the daily DAG (download is id-driven; it re-derives its
work list from metadata regardless of which discovery produced it)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from showdown_replay_etl_dag import _run_stage  # noqa: F401 (shared stages)

LAKE_ROOT = os.environ.get("SHOWDOWN_LAKE_ROOT", "/data/showdown_lake")
FORMAT_ID = os.environ.get("SHOWDOWN_FORMAT_ID", "gen9randombattle")


def _backfill_discover():
    from pokemon_showdown_airflow_etl_spark.jobs import ReplayLake, discover_backfill
    from pokemon_showdown_airflow_etl_spark.session import get_spark
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient

    spark = get_spark(app_name="showdown-backfill-discover")
    return discover_backfill(
        spark,
        ReplayLake(LAKE_ROOT),
        ReplayApiClient(request_pause_s=0.1),
        FORMAT_ID,
        max_pages=50,  # reference :51
    )


try:  # pragma: no cover - airflow not installed in the test container
    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.utils.trigger_rule import TriggerRule

    with DAG(
        dag_id="showdown_replay_backfill_etl",
        schedule_interval=None,  # manual only (reference :46)
        start_date=datetime(2025, 1, 1),
        catchup=False,
        default_args={
            "retries": 2,  # reference :36
            "execution_timeout": timedelta(hours=4),  # reference :38
        },
        max_active_runs=1,  # reference :55
        dagrun_timeout=timedelta(hours=8),  # reference :56
    ) as dag:
        get_backfill_replay_ids = PythonOperator(
            task_id="get_backfill_replay_ids", python_callable=_backfill_discover
        )
        download_replays = PythonOperator(
            task_id="download_replays",
            python_callable=lambda: _run_stage("download"),
            execution_timeout=timedelta(hours=6),  # reference :71
        )
        retry_failed_replays = PythonOperator(
            task_id="retry_failed_replays", python_callable=lambda: _run_stage("retry")
        )
        compact_daily_replays = PythonOperator(
            task_id="compact_daily_replays",
            python_callable=lambda: _run_stage("compact"),
            trigger_rule=TriggerRule.ALL_DONE,  # reference :92
            execution_timeout=timedelta(hours=8),  # reference :91
        )
        get_backfill_replay_ids >> download_replays >> retry_failed_replays >> compact_daily_replays
except ImportError:
    dag = None
