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


def test_zorder_layout_prunes_more_files_than_time_sort(spark, tmp_path):
    """x3's point, measured on real written files: range-partition the
    events table 64 ways by (a) the Z-order key and (b) the time-major
    (day, user) sort key, then ask how many FILES a user x day box
    query must touch going by each file's min/max footer stats alone.
    The Z-curve layout gives every file a tight box in BOTH dimensions,
    so it prunes strictly harder than the single-dimension sort
    (measured 7/64 files vs 13/64). Pinned at sf0.01: the demonstration
    needs the 150-user dimension — sf0.001's 15 users give ~4 usable
    bits, too coarse for two-dimensional clustering at 64-file
    granularity (the oracle-parity suite reads sf0.01 too)."""
    from pokemon_showdown_airflow_etl_spark.io import table
    from pokemon_showdown_airflow_etl_spark.operators.bucketing import zorder_key

    sf_dir = "/root/testdata/sf0.01"
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("u"),
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
        .cast("long")
        .alias("d"),
    ).filter(F.col("u").isNotNull() & F.col("d").isNotNull())
    zdir, tdir = str(tmp_path / "zorder"), str(tmp_path / "timesort")
    ev.withColumn("z", zorder_key([F.col("u"), F.col("d")])).repartitionByRange(
        64, "z"
    ).write.parquet(zdir)
    ev.repartitionByRange(64, "d", "u").write.parquet(tdir)

    def files_touched(path):
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("u").alias("u_lo"), F.max("u").alias("u_hi"),
                F.min("d").alias("d_lo"), F.max("d").alias("d_hi"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        total = sum(r["n"] for r in stats)
        hit = [
            r for r in stats
            if r["u_hi"] >= 40 and r["u_lo"] < 60
            and r["d_hi"] >= 10 and r["d_lo"] < 16
        ]
        return len(hit), len(stats), sum(r["n"] for r in hit) / total

    z_files, z_total, z_rows = files_touched(zdir)
    t_files, t_total, t_rows = files_touched(tdir)
    assert z_total >= 32 and t_total >= 32  # the layouts really split
    # the box query prunes strictly harder under the Z-curve, in files
    # AND in rows-behind-those-files
    assert z_files < t_files
    assert z_rows < t_rows
    assert z_rows < 0.15  # ~11% measured; generous determinism margin


def test_zorder_key_matches_python_model_in_three_dims(spark):
    """zorder_key generalizes past two dims: bit i of dim k lands at
    position i*ndims+k (checked against a pure-Python interleave over
    a 3-dim grid), NULL in any dim yields a NULL key, and the 62-bit
    signed-BIGINT guard rejects an overflowing geometry."""
    from pokemon_showdown_airflow_etl_spark.operators.bucketing import zorder_key

    rows = [(a, b, c) for a in range(5) for b in range(5) for c in range(5)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {
        (r["a"], r["b"], r["c"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=4)
        ).collect()
    }

    def model(a, b, c, bits=4, nd=3):
        z = 0
        for i in range(bits):
            for k, v in enumerate((a, b, c)):
                z |= ((v >> i) & 1) << (i * nd + k)
        return z

    assert got == {(a, b, c): model(a, b, c) for a, b, c in rows}

    nulled = spark.createDataFrame([(1, None, 2)], "a long, b long, c long")
    assert (
        nulled.withColumn(
            "z", zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=4)
        ).first()["z"]
        is None
    )

    with pytest.raises(ValueError, match="62"):
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=21)
