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

# Run-time tunables, same names/defaults as the reference DAG params
# (reference showdown_replay_etl_dag.py:42-47); overridable per-run via
# `airflow dags trigger --conf '{"ignore_history": true, ...}'`.
DAG_PARAMS = {
    "format_id": FORMAT_ID,
    "max_pages": 5,
    "ignore_history": False,  # force re-processing all replays (testing)
    "enable_detailed_timing": False,  # O9 per-section timing records
}


def resolve_params(context: dict) -> dict:
    """Merge DAG defaults with a run's params/conf (reference reads
    ``context['params']`` in every task callable) and apply the
    process-wide toggles: detailed timing maps onto the engine's
    SHOWDOWN_DETAILED_TIMING env switch (functions/metrics.py)."""
    from pokemon_showdown_airflow_etl_spark.functions.metrics import ENABLE_ENV

    merged = {**DAG_PARAMS, **(context.get("params") or {})}
    os.environ[ENABLE_ENV] = "1" if merged.get("enable_detailed_timing") else "0"
    return merged


def _run_stage(stage: str, **context):
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

    p = resolve_params(context)
    format_id = p["format_id"]
    spark = get_spark(app_name=f"showdown-{stage}")
    lake = ReplayLake(LAKE_ROOT)
    client = ReplayApiClient(request_pause_s=0.1)  # reference pacing, api.py:66
    fn = {
        "discover": lambda: discover(
            spark, lake, client, format_id,
            max_pages=int(p["max_pages"]),
            ignore_history=bool(p["ignore_history"]),
        ),
        "download": lambda: download(spark, lake, client, format_id),
        "retry": lambda: retry_failed(spark, lake, client, format_id),
        "compact": lambda: compact(spark, lake, format_id),
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
        params=dict(DAG_PARAMS),  # reference :42-47
    ) as dag:
        get_replay_ids = PythonOperator(
            task_id="get_replay_ids",
            python_callable=lambda **ctx: _run_stage("discover", **ctx),
        )
        download_replays = PythonOperator(
            task_id="download_replays",
            python_callable=lambda **ctx: _run_stage("download", **ctx),
            execution_timeout=timedelta(hours=6),
        )
        retry_failed_replays = PythonOperator(
            task_id="retry_failed_replays",
            python_callable=lambda **ctx: _run_stage("retry", **ctx),
        )
        compact_daily_replays = PythonOperator(
            task_id="compact_daily_replays",
            python_callable=lambda **ctx: _run_stage("compact", **ctx),
            trigger_rule=TriggerRule.ALL_DONE,  # O4, reference :76
            execution_timeout=timedelta(hours=8),
        )
        get_replay_ids >> download_replays >> retry_failed_replays >> compact_daily_replays
except ImportError:
    dag = None
