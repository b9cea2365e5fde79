"""Bucketed-table support: shuffle-free co-located joins (the 100 TB
join strategy SURVEY.md §4 calls out).

The metadata table is joined on ``replay_id`` by every stage (existence
checks J1, ingest anti-joins J2, import reconciliation J6). At lake
scale those joins shuffle both sides every run. Writing both sides
bucketed by the join key co-locates matching rows permanently: Spark
reads bucket i of each table into the same task and the join plan has
NO Exchange — the one-time write cost buys every future join.

Bucketed tables require the session catalog (``saveAsTable``), not bare
paths; bucket count should be sized so a bucket of the big table fits
one task (~128-512 MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "replay_id",
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets additionally enables merge-join without a sort step."""
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "replay_id",
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. With
    matching bucket specs Spark plans a SortMergeJoin with zero Exchange
    on either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
