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


def zorder_key(cols, bits: int = 10):
    """Z-order (Morton) interleave key over ``cols`` — the
    multi-dimensional clustering layout (Delta's OPTIMIZE ZORDER, the
    lakehouse answer to "my queries filter on BOTH user and time"):
    bit i of dimension k lands at position ``i * ndims + k``, so rows
    close in EVERY dimension get close keys, and range-partitioning
    the write by the key gives every file a tight min/max box in all
    dimensions at once. A single-column sort gives perfect pruning on
    that column and none on the others; the Z-curve trades a little of
    each for skipping on all (measured on the events table: a
    user x day box query touches 7/64 z-ordered files vs 13/64
    time-sorted — tests/test_bucketing.py).

    ``cols`` must be non-negative integers < 2**bits (the caller
    normalizes real values to ranks/buckets first); NULL in any
    dimension yields a NULL key, which range-partitioning groups
    together. Pure integer expression — JVM-side, shuffle-free,
    oracle-reproducible bit for bit."""
    from pyspark.sql import functions as F

    nd = len(cols)
    if bits * nd > 62:
        raise ValueError(
            f"bits={bits} x {nd} dims exceeds the 62 usable bits of a "
            "signed BIGINT key"
        )
    z = None
    for i in range(bits):
        for k, c in enumerate(cols):
            term = (
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * nd + k)).cast("long")
            )
            z = term if z is None else z + term
    return z.cast("long")
