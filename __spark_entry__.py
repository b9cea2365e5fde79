"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship lifecycle-stats query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
SURVEY.md section 2 (see pokemon_showdown_airflow_etl_spark.plans).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: lifecycle stats by format and event date — the
    reference's get_stats_by_format (db.py:629-664) + per-date counters
    (compaction.py:121-132) as one conditional-aggregation pass
    (scan -> derive date -> groupBy -> conditional aggs -> order)."""
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.io import table

    events = table(spark, SMOKE_SF_DIR, "events")
    return (
        events.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_type", "event_date")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type", "event_date")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: query.spark for name, query in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query that is SQL-expressible."""
    return {
        name: query.oracle for name, query in ALL_QUERIES.items() if query.oracle is not None
    }
