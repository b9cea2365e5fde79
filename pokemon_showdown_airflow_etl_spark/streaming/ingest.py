"""Structured Streaming formulation of the ingest (SURVEY.md §2.8).

The reference is batch-incremental: a daily run reads MAX(uploadtime)
and pages the API forward (T1, tasks/discovery.py:42-100); compaction
buckets by calendar day of event time (T3, db.py:690-700). Both are
native streaming concepts, so this module re-expresses them:

- the landing directory of replay documents becomes a file-stream
  source (new files = new micro-batch — the streaming twin of S3);
- the discovery watermark becomes ``withWatermark`` on the event time
  derived from ``uploadtime``;
- daily compaction stats become a tumbling 1-day window aggregate;
- idempotent metadata registration (T5) stays exactly-once via
  ``foreachBatch`` + the same anti-join MERGE the batch job uses —
  micro-batch replays after failure re-run the anti-join and insert
  nothing twice;
- duplicate replay uploads within the lateness horizon are dropped by
  ``dropDuplicatesWithinWatermark`` (bounded state, unlike a global
  dropDuplicates whose state grows forever at 100 TB/day).

Everything runs with ``Trigger.AvailableNow`` for batch-parity runs
(the reference's daily schedule) and unmodified under a continuous
micro-batch trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import REPLAY_DOCUMENT


def stream_replay_docs(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-stream source over a landing directory of replay-document
    parquet (the streaming S3 scan). Explicit schema — no inference pass
    exists in streaming, same reason schemas.py mandates one at scale."""
    schema = REPLAY_DOCUMENT
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(landing_dir)
        .withColumn("event_time", F.timestamp_seconds("uploadtime"))
    )


def with_late_data_bounds(docs: DataFrame, lateness: str = "2 days") -> DataFrame:
    """T1/T4: watermark on event time. Replays arriving later than the
    horizon are dropped from stateful operators — the streaming analogue
    of the discovery cutoff at tasks/discovery.py:91-100."""
    return docs.withWatermark("event_time", lateness)


def dedup_within_watermark(docs: DataFrame, lateness: str = "2 days") -> DataFrame:
    """T5 idempotence in-stream: drop re-uploaded replay ids within the
    lateness horizon with bounded state."""
    return with_late_data_bounds(docs, lateness).dropDuplicatesWithinWatermark(["id"])


def daily_rollup(docs: DataFrame, lateness: str = "2 days") -> DataFrame:
    """T3: tumbling 1-day event-time window per format — the streaming
    twin of the compaction date bucketing (db.py:690-700) and the G7
    per-date counters (compaction.py:121-132)."""
    return (
        with_late_data_bounds(docs, lateness)
        .groupBy(F.window("event_time", "1 day").alias("day"), F.col("format"))
        .agg(
            F.count("*").cast("long").alias("n_replays"),
            F.approx_count_distinct("p1").alias("approx_players"),
            F.max("uploadtime").alias("max_uploadtime"),
        )
        .select(
            F.col("day.start").cast("date").alias("date"),
            "format",
            "n_replays",
            "approx_players",
            "max_uploadtime",
        )
    )


def start_metadata_registration(
    docs: DataFrame,
    metadata_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming discovery sink: each micro-batch anti-join-MERGEs its
    documents into the replay_status table (J2/T5 — db.py:853-912
    semantics, exactly-once across micro-batch replays because the
    anti-join re-derives novelty from the table itself)."""
    from ..jobs.lake import MetadataStore

    def register(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rows = batch_df.select(
            F.col("id").alias("replay_id"),
            F.col("format").alias("format_id"),
            F.current_timestamp().alias("discovered_at"),
            F.lit(f"stream_batch_{batch_id}").alias("discovered_batch"),
            F.lit(True).alias("is_downloaded"),
            F.current_timestamp().alias("downloaded_at"),
            F.lit(f"stream_batch_{batch_id}").alias("downloaded_batch"),
            F.lit("Landed via stream").alias("download_details"),
            F.lit(False).alias("is_compacted"),
            F.lit(None).cast("timestamp").alias("compacted_at"),
            F.lit(None).cast("string").alias("compacted_batch"),
            F.lit(None).cast("string").alias("compacted_details"),
            F.lit(None).cast("boolean").alias("is_retry_attempted"),
            F.lit(None).cast("timestamp").alias("retry_at"),
            F.lit(None).cast("string").alias("retry_batch"),
            F.lit(None).cast("string").alias("retry_details"),
            F.col("uploadtime"),
            F.array_join("players", " vs ").alias("players"),
            F.lit(None).cast("map<string,string>").alias("additional_info"),
        )
        MetadataStore(spark, metadata_path).insert_new(rows)

    writer = docs.writeStream.foreachBatch(register).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_daily_rollup(
    docs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    lateness: str = "2 days",
    available_now: bool = True,
) -> StreamingQuery:
    """Windowed rollup sink (append mode: a day's row is emitted once
    its window falls behind the watermark — finalized days only, the
    property the reference approximates by compacting yesterday)."""
    rolled = daily_rollup(docs, lateness)
    writer = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
