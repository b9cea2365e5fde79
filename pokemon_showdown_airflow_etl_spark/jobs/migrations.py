"""O13: lake initialization + versioned schema migrations.

The reference keeps a ``db_migration`` version table (db.py:79-86) and
one migration (v1) that collapses an event-log pair of tables into the
wide ``replay_status`` table (db.py:96-208). Here the version table is a
single-row parquet table under the lake root; migrations are Spark jobs
keyed by version, applied in order, recorded idempotently. The v1
analogue — event-log rows to wide lifecycle rows via latest-event-per-
(key, stage) pivot (W1 top-1 window) — is implemented so a user migrating
an old event-log layout can run it.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from .lake import ReplayLake

SCHEMA_VERSION = 1

VERSION_SCHEMA = StructType(
    [
        StructField("version", IntegerType(), nullable=False),
        StructField("applied_at", TimestampType()),
        StructField("description", StringType()),
    ]
)


def version_path(lake: ReplayLake) -> str:
    return os.path.join(lake.root, "schema_version")


def current_version(spark: SparkSession, lake: ReplayLake) -> int:
    path = version_path(lake)
    if not os.path.exists(path):
        return 0
    row = spark.read.parquet(path).agg(F.max("version")).first()
    return row[0] or 0


def record_version(spark: SparkSession, lake: ReplayLake, version: int, description: str) -> None:
    row = [(version, datetime.datetime.now(), description)]
    spark.createDataFrame(row, VERSION_SCHEMA).write.mode("append").parquet(
        version_path(lake)
    )


def init_lake(spark: SparkSession, lake: ReplayLake) -> dict:
    """init_db.py analogue: create the (empty) metadata table and stamp
    the schema version; safe to re-run."""
    from ..schemas import REPLAY_STATUS
    from .lake import MetadataStore

    MetadataStore(spark, lake.metadata_path)  # table materializes on first insert
    before = current_version(spark, lake)
    if before < SCHEMA_VERSION:
        record_version(spark, lake, SCHEMA_VERSION, "wide replay_status lifecycle table")
    _ = REPLAY_STATUS  # the schema IS the contract; nothing to materialize eagerly
    return {"version_before": before, "version": SCHEMA_VERSION}


def migrate_v1_event_log(processing: DataFrame, metadata: DataFrame) -> DataFrame:
    """The v0 -> v1 collapse (db.py:96-208): an event-log table
    (replay_id, stage, status, processed_at, details) pivots to one wide
    row per replay — latest event per (replay, stage) wins (W1 top-1
    window, db.py:133-154), joined with the old metadata table for
    uploadtime/players.

    ``stage`` in {downloaded, compacted, retried}; ``status`` success
    marks the flag true; batch ids are recovered from the details
    message (C7, db.py:171-179).
    """
    w = Window.partitionBy("replay_id", "stage").orderBy(F.desc("processed_at"))
    latest = (
        processing.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    batch = F.regexp_extract("details", r"\(batch ([^)]+)\)", 1)
    per_stage = latest.groupBy("replay_id").pivot(
        "stage", ["downloaded", "compacted", "retried"]
    ).agg(
        F.first(
            F.struct(
                (F.col("status") == "success").alias("ok"),
                F.col("processed_at").alias("at"),
                batch.alias("batch"),
                F.col("details").alias("details"),
            )
        )
    )
    return metadata.join(per_stage, "replay_id", "left").select(
        "replay_id",
        "format_id",
        F.col("discovered_at"),
        F.lit("migration_v1").alias("discovered_batch"),
        F.coalesce("downloaded.ok", F.lit(False)).alias("is_downloaded"),
        F.col("downloaded.at").alias("downloaded_at"),
        F.col("downloaded.batch").alias("downloaded_batch"),
        F.col("downloaded.details").alias("download_details"),
        F.coalesce("compacted.ok", F.lit(False)).alias("is_compacted"),
        F.col("compacted.at").alias("compacted_at"),
        F.col("compacted.batch").alias("compacted_batch"),
        F.col("compacted.details").alias("compacted_details"),
        F.col("retried.ok").alias("is_retry_attempted"),
        F.col("retried.at").alias("retry_at"),
        F.col("retried.batch").alias("retry_batch"),
        F.col("retried.details").alias("retry_details"),
        "uploadtime",
        "players",
        F.lit(None).cast("map<string,string>").alias("additional_info"),
    )
