"""Relational operators over the ``replay_status`` metadata table — the
reference's query workhorse (db.py:43-70), as DataFrame expressions.

These are the domain-level versions used by the pipeline jobs; the
testdata-mapped, oracle-checked versions live in ``plans``. Citations
are file:line into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import scalars as C


# --- filters (F1-F7) --------------------------------------------------------


def undownloaded(meta: DataFrame, format_id: str) -> DataFrame:
    """F2 (db.py:505-509): rows awaiting download, projection pruned."""
    return meta.filter(
        (F.col("format_id") == format_id) & ~C.flag_or_false("is_downloaded")
    ).select("replay_id", "format_id", "uploadtime", "players", "additional_info")


def downloaded_uncompacted(meta: DataFrame, format_id: str) -> DataFrame:
    """F3 (db.py:537-541)."""
    return meta.filter(
        (F.col("format_id") == format_id)
        & C.flag_or_false("is_downloaded")
        & ~C.flag_or_false("is_compacted")
    )


def failed_unretried(meta: DataFrame, format_id: str) -> DataFrame:
    """F4 (db.py:562-569): failed downloads never retried — LIKE-prefix
    plus NULL-safe retry flag (three-valued logic, SQLite parity)."""
    return meta.filter(
        (F.col("format_id") == format_id)
        & ~C.flag_or_false("is_downloaded")
        & C.is_failed("download_details")
        & C.not_retried()
    )


def point_lookup(meta: DataFrame, replay_id: str) -> DataFrame:
    """F6 (db.py:307-313)."""
    return meta.filter(F.col("replay_id") == replay_id)


# --- aggregations (G1-G10) --------------------------------------------------


def high_watermark(meta: DataFrame, format_id: str):
    """G1 (db.py:590-594): MAX(uploadtime) for the incremental cursor.
    Returns None when the format has no rows."""
    row = meta.filter(F.col("format_id") == format_id).agg(F.max("uploadtime")).first()
    return row[0] if row else None


def low_watermark(meta: DataFrame, format_id: str):
    """G2 (db.py:616-620): MIN(uploadtime) for the backfill cursor."""
    row = meta.filter(F.col("format_id") == format_id).agg(F.min("uploadtime")).first()
    return row[0] if row else None


def lifecycle_stats(meta: DataFrame) -> DataFrame:
    """G3 (db.py:642-651) per format: totals + per-stage conditional sums."""

    def flag_sum(col: str):
        return F.sum(F.when(C.flag_or_false(col), 1).otherwise(0)).cast("long")

    return meta.groupBy("format_id").agg(
        F.count("*").cast("long").alias("total"),
        flag_sum("is_downloaded").alias("downloaded"),
        flag_sum("is_compacted").alias("compacted"),
        flag_sum("is_retry_attempted").alias("retried"),
        F.sum(F.when(C.is_failed("download_details") & ~C.flag_or_false("is_downloaded"), 1).otherwise(0))
        .cast("long")
        .alias("failed"),
    )


def duplicates(meta: DataFrame) -> DataFrame:
    """G4 (cleanup_db.py:130-135)."""
    return (
        meta.groupBy("replay_id", "format_id")
        .agg(F.count("*").cast("long").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def dedup_keep_latest(meta: DataFrame) -> DataFrame:
    """G6 (cleanup_db.py:148-178), made deterministic: keep the most
    recently discovered row per (replay_id, format_id)."""
    w = Window.partitionBy("replay_id", "format_id").orderBy(
        F.desc_nulls_last("discovered_at"), F.desc_nulls_last("uploadtime")
    )
    return meta.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def ids_by_date(meta: DataFrame, format_id: str) -> DataFrame:
    """G5 (db.py:666-700): downloaded-uncompacted replay ids grouped by
    the calendar day of their uploadtime — the compaction work list."""
    return (
        downloaded_uncompacted(meta, format_id)
        .withColumn("date", C.epoch_to_date_str("uploadtime"))
        .groupBy("date")
        .agg(F.sort_array(F.collect_list("replay_id")).alias("replay_ids"))
    )


# --- joins (J1-J7) -----------------------------------------------------------


def existence_flags(ids: DataFrame, meta: DataFrame) -> DataFrame:
    """J1 (db.py:702-734): id -> is_downloaded map, missing ids false.

    The probe set (``ids``, one work batch) is the small side; the
    metadata table is the lake-scale side. Broadcasting metadata would
    pin the whole table to driver memory, so instead the flags are
    semi-filtered down to the probe ids (small ids broadcast into the
    semi-join) and the now-bounded result broadcasts back for the outer
    probe — the IN-list replaced by two broadcast joins, zero shuffles
    of the big table.
    """
    flags = meta.select("replay_id", "is_downloaded").join(
        F.broadcast(ids.select("replay_id")), "replay_id", "left_semi"
    )
    return ids.join(F.broadcast(flags), "replay_id", "left").select(
        "replay_id", C.flag_or_false("is_downloaded").alias("is_downloaded")
    )


def new_rows(incoming: DataFrame, meta: DataFrame) -> DataFrame:
    """J2 (db.py:853-912): the idempotent-ingest anti-join — incoming
    rows whose replay_id is not already tracked."""
    return incoming.join(meta.select("replay_id"), "replay_id", "left_anti")
