"""Semantics tests for the temporal join operators: as-of tie/strict
behavior and range-join band edges (including matches that cross a
bucket boundary — the case the bucketing trick must not lose)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a"),
         (1, _ts("2024-01-01 12:00:00"), "b"),
         (2, _ts("2024-01-01 09:00:00"), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 10.0),
         (1, _ts("2024-01-01 10:00:00"), 20.0),   # ties left row 'a' exactly
         (1, _ts("2024-01-01 11:30:00"), 30.0),
         (2, _ts("2024-01-01 09:30:00"), 99.0)],  # after left row 'c'
        "k long, ts timestamp, v double",
    )
    out = {
        r["tag"]: r["vv"]
        for r in asof_join(left, right, on="k", carry={"v": "vv"}).collect()
    }
    assert out == {"a": 20.0, "b": 30.0, "c": None}

    strict = {
        r["tag"]: r["vv"]
        for r in asof_join(left, right, on="k", carry={"v": "vv"}, strict=True).collect()
    }
    # strict: the equal-timestamp right row is no longer visible to 'a'
    assert strict == {"a": 10.0, "b": 30.0, "c": None}


def test_asof_null_carry_value_is_preserved(spark):
    """A matched right row whose carry column is NULL must yield NULL —
    not skip back to an older non-null value (pandas.merge_asof / DuckDB
    ASOF semantics; ADVICE r3 medium). Exercises both the plain and the
    sliced operator."""
    from pokemon_showdown_airflow_etl_spark.operators.temporal import (
        asof_join_sliced,
    )

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a"),
         (1, _ts("2024-01-01 12:00:00"), "b")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 10.0),
         (1, _ts("2024-01-01 09:30:00"), None),   # latest before 'a': NULL
         (1, _ts("2024-01-01 11:00:00"), 30.0)],
        "k long, ts timestamp, v double",
    )
    want = {"a": None, "b": 30.0}
    plain = {
        r["tag"]: r["vv"]
        for r in asof_join(left, right, on="k", carry={"v": "vv"}).collect()
    }
    assert plain == want
    # slice width chosen so 09:30 (NULL) and 10:00 land in DIFFERENT
    # slices: the NULL must win via the slice-level carry-in too
    sliced = {
        r["tag"]: r["vv"]
        for r in asof_join_sliced(
            left, right, on="k", slice_seconds=900, carry={"v": "vv"}
        ).collect()
    }
    assert sliced == want


def test_asof_left_columns_pass_through(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7, "x")],
        "k long, ts timestamp, n long, s string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1.5)], "k long, ts timestamp, v double"
    )
    row = asof_join(left, right, on="k", carry={"v": "vv"}).collect()[0]
    assert (row["k"], row["n"], row["s"], row["vv"]) == (1, 7, "x", 1.5)


def test_range_join_band_edges_and_bucket_crossing(spark):
    # band = 1 hour; left anchor at 10:30 so the band [10:30, 11:30)
    # CROSSES the hour-bucket boundary at 11:00 — the right row at 11:15
    # lives in the next bucket and must still match
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"), "anchor")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:29:59"), "before"),
         (1, _ts("2024-01-01 10:30:00"), "at_start"),   # inclusive
         (1, _ts("2024-01-01 11:15:00"), "next_bucket"),
         (1, _ts("2024-01-01 11:30:00"), "at_end"),     # exclusive
         (2, _ts("2024-01-01 10:45:00"), "other_key")],
        "k long, ts timestamp, name string",
    )
    out = sorted(
        r["rname"]
        for r in range_join_bucketed(
            left, right, on="k", band_seconds=3600, carry={"name": "rname"}
        ).collect()
    )
    assert out == ["at_start", "next_bucket"]


def test_range_join_plan_is_equi_join(spark):
    import contextlib
    import io

    left = spark.range(10).select(
        F.col("id").alias("k"), F.timestamp_seconds(F.col("id") * 100).alias("ts")
    )
    right = spark.range(50).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 37).alias("ts"),
        F.col("id").alias("rid"),
    )
    df = range_join_bucketed(left, right, on="k", band_seconds=600, carry={"rid": "rid"})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
