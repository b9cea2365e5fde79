"""Bucketed co-located join: correctness + the structural claim that
matters at scale — identically-bucketed sides join with ZERO shuffle."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from pokemon_showdown_airflow_etl_spark.operators.bucketing import write_bucketed

    left = spark.range(5000).select(
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("replay_id"),
        (F.col("id") % 7).alias("flag"),
    )
    right = spark.range(0, 5000, 2).select(
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("replay_id"),
        (F.col("id") % 3).alias("tag"),
    )
    write_bucketed(left, "bkt_left", n_buckets=8)
    write_bucketed(right, "bkt_right", n_buckets=8)
    yield "bkt_left", "bkt_right"
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


@pytest.fixture
def no_broadcast(spark):
    """Force the shuffle-join path: with a broadcastable side the planner
    (correctly) prefers broadcast and bypasses buckets; the bucketed
    plan is the one that matters when BOTH sides are lake-scale."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    from pokemon_showdown_airflow_etl_spark.operators.bucketing import colocated_join

    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, "bucketed join should not shuffle"
    assert "Bucketed: true" in plan
    assert "SortMergeJoin" in plan


def test_colocated_join_is_correct(spark, bucketed_tables):
    from pokemon_showdown_airflow_etl_spark.operators.bucketing import colocated_join

    lt, rt = bucketed_tables
    assert colocated_join(spark, lt, rt).count() == 2500
    # anti-join shape (the J2 ingest pattern) also stays shuffle-free
    anti = spark.table(lt).join(spark.table(rt), "replay_id", "left_anti")
    assert anti.count() == 2500
