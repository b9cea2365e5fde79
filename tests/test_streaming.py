"""Structured Streaming ingest tests: file-source discovery with
exactly-once metadata registration across incremental runs, tumbling
daily rollup with watermark finalization, in-stream dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs.lake import MetadataStore
from pokemon_showdown_airflow_etl_spark.schemas import REPLAY_DOCUMENT
from pokemon_showdown_airflow_etl_spark.sources.fake import make_replays
from pokemon_showdown_airflow_etl_spark.streaming import (
    dedup_within_watermark,
    start_daily_rollup,
    start_metadata_registration,
    stream_replay_docs,
)


def land_docs(spark, landing_dir: str, replays: list[dict]) -> None:
    rows = [
        tuple(r.get(f.name) for f in REPLAY_DOCUMENT.fields) for r in replays
    ]
    spark.createDataFrame(rows, REPLAY_DOCUMENT).write.mode("append").parquet(landing_dir)


@pytest.fixture
def dirs(tmp_path):
    return {
        "landing": str(tmp_path / "landing"),
        "meta": str(tmp_path / "meta"),
        "rollup": str(tmp_path / "rollup"),
        "ck1": str(tmp_path / "ck1"),
        "ck2": str(tmp_path / "ck2"),
    }


def test_streaming_registration_is_incremental_and_exactly_once(spark, dirs):
    corpus = make_replays("gen9ou", 60)
    land_docs(spark, dirs["landing"], corpus[:40])

    docs = stream_replay_docs(spark, dirs["landing"])
    q = start_metadata_registration(docs, dirs["meta"], dirs["ck1"])
    q.awaitTermination()
    meta = MetadataStore(spark, dirs["meta"])
    assert meta.read().count() == 40

    # second run over the same checkpoint: only the 20 new files'
    # rows are processed; re-landed duplicates insert nothing (T5)
    land_docs(spark, dirs["landing"], corpus[20:])  # 20 dupes + 20 new
    q = start_metadata_registration(
        stream_replay_docs(spark, dirs["landing"]), dirs["meta"], dirs["ck1"]
    )
    q.awaitTermination()
    assert meta.read().count() == 60
    assert meta.read().select("replay_id").distinct().count() == 60


def test_daily_rollup_emits_finalized_days(spark, dirs):
    # 5 days of replays, one per hour
    corpus = make_replays("gen9ou", 120)
    land_docs(spark, dirs["landing"], corpus)
    q = start_daily_rollup(
        stream_replay_docs(spark, dirs["landing"]),
        dirs["rollup"],
        dirs["ck2"],
        lateness="1 day",
    )
    q.awaitTermination()
    out = spark.read.parquet(dirs["rollup"])
    # append mode emits only windows older than watermark (max_ts - 1 day):
    # of the 6 calendar days spanned, the trailing day(s) stay open
    emitted = out.count()
    assert emitted >= 3
    total = out.agg(F.sum("n_replays")).first()[0]
    assert total <= 120
    # each finalized day counts 24 hourly replays (boundary days partial)
    full_days = out.filter(F.col("n_replays") == 24).count()
    assert full_days >= 2


def test_dedup_within_watermark_drops_reuploads(spark, dirs):
    corpus = make_replays("gen9ou", 30)
    land_docs(spark, dirs["landing"], corpus)
    land_docs(spark, dirs["landing"], corpus[:10])  # re-uploads
    deduped = dedup_within_watermark(stream_replay_docs(spark, dirs["landing"]))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT id) AS d FROM dedup_sink").first()
    assert got["n"] == 30 and got["d"] == 30


def test_stateful_cursor_tracking_across_runs(spark, dirs, tmp_path):
    """applyInPandasWithState keyed cursor state: totals accumulate
    across micro-batches AND across restarted queries (checkpointed
    state store), mirroring the reference's persistent cursor file."""
    from pokemon_showdown_airflow_etl_spark.streaming.stateful import (
        start_cursor_tracking,
    )

    out = str(tmp_path / "cursor_log")
    ck = str(tmp_path / "cursor_ck")
    corpus = make_replays("gen9ou", 50)
    land_docs(spark, dirs["landing"], corpus[:30])
    q = start_cursor_tracking(stream_replay_docs(spark, dirs["landing"]), out, ck)
    q.awaitTermination()
    log = spark.read.parquet(out)
    latest = log.orderBy(F.desc("total_replays")).first()
    assert latest["total_replays"] == 30
    assert latest["last_seen_ts"] == max(r["uploadtime"] for r in corpus[:30])

    # restart with 20 more docs: state resumes, cursor advances
    land_docs(spark, dirs["landing"], corpus[30:])
    q = start_cursor_tracking(stream_replay_docs(spark, dirs["landing"]), out, ck)
    q.awaitTermination()
    log = spark.read.parquet(out)
    latest = log.orderBy(F.desc("total_replays")).first()
    assert latest["total_replays"] == 50
    assert latest["last_seen_ts"] == max(r["uploadtime"] for r in corpus)


def test_streaming_move_usage_matches_batch(spark, dirs, tmp_path):
    """The streaming b-layer: per-day move usage rolled up over the
    replay stream equals the same aggregation computed in batch over
    the finalized days (explode+parse is stateless, the only state is
    the watermarked day window)."""
    from pokemon_showdown_airflow_etl_spark.functions.logparse import command_lines
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_move_usage_rollup,
        stream_move_usage,
    )

    corpus = make_replays("gen9ou", 120)  # hourly uploads, ~5 days
    land_docs(spark, dirs["landing"], corpus)
    out_dir = str(tmp_path / "moves")
    q = start_move_usage_rollup(
        stream_replay_docs(spark, dirs["landing"]),
        out_dir,
        str(tmp_path / "ck_moves"),
        lateness="1 day",
    )
    q.awaitTermination()
    streamed = spark.read.parquet(out_dir)

    # only finalized (pre-watermark) days are emitted, each exactly once
    assert streamed.count() == streamed.select("date", "pokemon", "move").distinct().count()
    emitted_days = sorted(r["date"] for r in streamed.select("date").distinct().collect())
    assert len(emitted_days) >= 3

    # batch recomputation over those days must agree value-for-value
    docs = spark.createDataFrame(
        [(r["id"], r["uploadtime"], r["log"]) for r in corpus],
        "id string, uploadtime long, log string",
    ).withColumn("event_time", F.timestamp_seconds("uploadtime"))
    batch = (
        command_lines(docs, "move", keep=("event_time",))
        .withColumn("date", F.col("event_time").cast("date"))
        .filter(F.col("date").isin(emitted_days))
        .groupBy(
            "date",
            F.regexp_extract(F.try_element_at("args", F.lit(1)), r": (.*)$", 1).alias(
                "pokemon"
            ),
            F.try_element_at("args", F.lit(2)).alias("move"),
        )
        .agg(F.count("*").cast("long").alias("n_uses"))
    )
    a = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.select(*streamed.columns).collect()}
    assert a == b


def test_streaming_asof_enrichment_matches_batch(spark, tmp_path):
    """The streaming as-of twin: purchase events enriched with the
    latest at-or-before click value, state carried across micro-batches
    (maxFilesPerTrigger=1 forces one batch per chunk), must equal the
    batch merge-asof (operators/temporal.py, the j10 plan) on the same
    rows — including NULL for never-enriched users."""
    import json
    import random

    from pokemon_showdown_airflow_etl_spark.operators.temporal import asof_join
    from pokemon_showdown_airflow_etl_spark.streaming.asof import (
        start_asof_enrichment,
    )

    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append(
            {
                "user_id": rng.randrange(5),
                "event_id": i,
                "ts": 1_700_000_000 + i * 60,
                "event_type": rng.choice(["click", "purchase", "view"]),
                "value": round(rng.uniform(0, 100), 2),
            }
        )
    land = tmp_path / "events_landing"
    land.mkdir()
    import os
    import time

    base = time.time() - 600
    for c in range(3):  # time-ordered chunks -> cross-batch state carry
        path = land / f"chunk{c}.json"
        with open(path, "w") as f:
            for r in rows[c * 20 : (c + 1) * 20]:
                f.write(json.dumps(r) + "\n")
        # FileStreamSource orders batches by modification time; files
        # written within the same second get an arbitrary order, which
        # once fed chunk2 first — pin strictly increasing mtimes
        os.utime(path, (base + c, base + c))

    schema = "user_id long, event_id long, ts long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
        .withColumn("ts", F.timestamp_seconds("ts"))
    )
    out, ck = str(tmp_path / "enriched"), str(tmp_path / "asof_ck")
    q = start_asof_enrichment(stream, out, ck)
    q.awaitTermination()
    got = {
        r["event_id"]: r["last_ref_value"] for r in spark.read.parquet(out).collect()
    }

    ev = spark.createDataFrame(
        [tuple(r.values()) for r in rows], schema
    ).withColumn("ts", F.timestamp_seconds("ts"))
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("value").alias("ref")
    )
    purch = ev.filter("event_type = 'purchase'").select("user_id", "event_id", "ts")
    want = {
        r["event_id"]: r["lrv"]
        for r in asof_join(purch, clicks, on="user_id", carry={"ref": "lrv"}).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_asof_late_query_row_gets_null_not_future_value(spark, tmp_path):
    """A query row that arrives in a LATER micro-batch than a newer
    reference row must emit NULL, not be enriched with that future
    reference (at-or-before guard in streaming/asof.py). A query row
    after the carried state's timestamp still enriches normally."""
    import json
    import os
    import time

    from pokemon_showdown_airflow_etl_spark.streaming.asof import (
        start_asof_enrichment,
    )

    land = tmp_path / "late_landing"
    land.mkdir()
    chunks = [
        # batch 0: the only click, at t=1000
        [{"user_id": 1, "event_id": 0, "ts": 1_700_001_000,
          "event_type": "click", "value": 42.0}],
        # batch 1: a purchase BEFORE the click's ts (late arrival) and
        # one after it
        [{"user_id": 1, "event_id": 1, "ts": 1_700_000_500,
          "event_type": "purchase", "value": 0.0},
         {"user_id": 1, "event_id": 2, "ts": 1_700_001_500,
          "event_type": "purchase", "value": 0.0}],
    ]
    base = time.time() - 600
    for c, rows in enumerate(chunks):
        path = land / f"chunk{c}.json"
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(path, (base + c, base + c))

    schema = "user_id long, event_id long, ts long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
        .withColumn("ts", F.timestamp_seconds("ts"))
    )
    out, ck = str(tmp_path / "late_enriched"), str(tmp_path / "late_ck")
    q = start_asof_enrichment(stream, out, ck)
    q.awaitTermination()
    got = {
        r["event_id"]: r["last_ref_value"] for r in spark.read.parquet(out).collect()
    }
    assert got == {1: None, 2: 42.0}


def test_streaming_player_sessions_match_batch(spark, dirs, tmp_path):
    """The streaming session-window twin (w5's shape over a stream):
    per-player sessions finalized by the watermark must be EXACTLY the
    sessions batch session_window computes over the same corpus — same
    boundaries, same counts — for every session old enough to have
    finalized. 10-minute upload cadence + a 1h gap
    yields ~150 closed sessions including ~50 multi-battle merges (a
    4h gap would never close: every player reappears within 2.8h), so
    both the merge path and watermark finalization are exercised."""
    from pokemon_showdown_airflow_etl_spark.streaming.battlelog import (
        start_session_rollup,
    )

    corpus = make_replays("gen9ou", 120, step=600)  # 10-min cadence, ~20h
    land_docs(spark, dirs["landing"], corpus)
    out_dir = str(tmp_path / "sessions")
    q = start_session_rollup(
        stream_replay_docs(spark, dirs["landing"]),
        out_dir,
        str(tmp_path / "ck_sessions"),
        gap="1 hour",
        lateness="2 hours",
    )
    q.awaitTermination()
    streamed = spark.read.parquet(out_dir)

    # exactly-once: no session emitted twice
    assert streamed.count() == streamed.dropDuplicates(
        ["player", "session_start"]
    ).count()
    assert streamed.count() >= 100
    # multi-battle sessions exist (the merge path ran, not just singletons)
    assert streamed.filter(F.col("n_battles") > 1).count() > 0

    docs = spark.createDataFrame(
        [(r["p1"], r["p2"], r["uploadtime"]) for r in corpus],
        "p1 string, p2 string, uploadtime long",
    ).withColumn("event_time", F.timestamp_seconds("uploadtime"))
    batch = (
        docs.select("event_time", F.explode(F.array("p1", "p2")).alias("player"))
        .groupBy(F.session_window("event_time", "1 hour").alias("w"), "player")
        .agg(F.count("*").cast("long").alias("n_battles"))
        .select(
            "player",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_battles",
        )
    )
    streamed_set = {tuple(map(str, r)) for r in streamed.collect()}
    batch_set = {tuple(map(str, r)) for r in batch.collect()}
    # every finalized streaming session is a batch session verbatim
    assert streamed_set <= batch_set
    # and everything that SHOULD have finalized did: batch sessions whose
    # gap-extended end is safely behind the final watermark
    import datetime

    max_ts = max(r["uploadtime"] for r in corpus)
    wm = datetime.datetime.fromtimestamp(max_ts - 2 * 3600, datetime.timezone.utc).replace(tzinfo=None)
    due = {t for t in batch_set if datetime.datetime.fromisoformat(t[2]) < wm}
    assert due <= streamed_set


def test_streaming_session_rollup_survives_restart(spark, dirs, tmp_path):
    """Checkpoint recovery for the session operator: land half the
    corpus, drain, land the rest, restart the SAME query — every
    session still lands exactly once (no re-emission of finalized
    sessions, no loss), and the union equals a fresh single-pass
    drain over the full corpus."""
    from pokemon_showdown_airflow_etl_spark.streaming.battlelog import (
        start_session_rollup,
    )

    corpus = make_replays("gen9ou", 120, step=600)
    out_dir = str(tmp_path / "sessions")
    ck = str(tmp_path / "ck")

    land_docs(spark, dirs["landing"], corpus[:70])
    q = start_session_rollup(
        stream_replay_docs(spark, dirs["landing"]), out_dir, ck,
        gap="1 hour", lateness="2 hours",
    )
    q.awaitTermination()
    first = spark.read.parquet(out_dir).count()
    assert first > 0

    land_docs(spark, dirs["landing"], corpus[70:])
    q = start_session_rollup(
        stream_replay_docs(spark, dirs["landing"]), out_dir, ck,
        gap="1 hour", lateness="2 hours",
    )
    q.awaitTermination()
    resumed = spark.read.parquet(out_dir)
    assert resumed.count() > first
    assert resumed.count() == resumed.dropDuplicates(
        ["player", "session_start"]
    ).count()

    # one-shot reference drain over the full corpus
    ref_land = str(tmp_path / "landing2")
    land_docs(spark, ref_land, corpus)
    ref_out = str(tmp_path / "sessions2")
    q = start_session_rollup(
        stream_replay_docs(spark, ref_land), ref_out, str(tmp_path / "ck2"),
        gap="1 hour", lateness="2 hours",
    )
    q.awaitTermination()
    a = {tuple(map(str, r)) for r in resumed.collect()}
    b = {tuple(map(str, r)) for r in spark.read.parquet(ref_out).collect()}
    assert a == b


def test_streaming_asof_late_reference_never_regresses_carry(spark, tmp_path):
    """A reference row arriving in a LATER batch with an OLDER timestamp
    than the carried state must be dropped, not adopted: an on-time
    query row in that same batch gets the carried (newer) state value,
    and a late query row older than the state still gets NULL. Before
    the advance-only in-batch guard, the late reference overwrote the
    carry and both rows were served the stale value."""
    import json
    import os
    import time

    from pokemon_showdown_airflow_etl_spark.streaming.asof import (
        start_asof_enrichment,
    )

    chunks = [
        # batch 0: establish state (ts=1000, value=42)
        [
            {"user_id": 1, "event_id": 0, "ts": 1000, "event_type": "click", "value": 42.0},
        ],
        # batch 1: late click (ts=500) + on-time purchase (1500) + late purchase (600)
        [
            {"user_id": 1, "event_id": 1, "ts": 500, "event_type": "click", "value": 7.0},
            {"user_id": 1, "event_id": 2, "ts": 1500, "event_type": "purchase", "value": 0.0},
            {"user_id": 1, "event_id": 3, "ts": 600, "event_type": "purchase", "value": 0.0},
        ],
    ]
    land = tmp_path / "landing"
    land.mkdir()
    base = time.time() - 600
    for c, rows in enumerate(chunks):
        path = land / f"chunk{c}.json"
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(path, (base + c, base + c))

    schema = "user_id long, event_id long, ts long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
        .withColumn("ts", F.timestamp_seconds("ts"))
    )
    q = start_asof_enrichment(
        stream, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["last_ref_value"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {2: 42.0, 3: None}


def test_streaming_trending_terms_bounded_state_and_mg_floor(spark, tmp_path):
    """The trending-terms stream: heavy tokens must appear in the final
    per-shard emissions (MG floor), emissions are bounded per batch, and
    a restarted query resumes the summaries from the state store (the
    second run's counters continue from the first's, not from zero)."""
    from pokemon_showdown_airflow_etl_spark.streaming import start_trending_terms

    land = str(tmp_path / "tok")
    out = str(tmp_path / "trend")
    ck = str(tmp_path / "ck")

    heavy = {f"hot{i}": 300 - 40 * i for i in range(4)}  # 300..180
    def land_chunk(salt: str, frac: float):
        rows = [(k,) for k, n in heavy.items() for _ in range(int(n * frac))]
        rows += [(f"tail_{salt}_{i}",) for i in range(500)]  # fresh singleton tail
        spark.createDataFrame(rows, "token string").coalesce(1).write.mode(
            "append"
        ).parquet(land)

    def run():
        stream = (
            spark.readStream.schema("token string")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = start_trending_terms(stream, out, ck, n_shards=4, m=32, emit_top=8)
        q.awaitTermination()

    land_chunk("a", 0.5)
    run()
    land_chunk("b", 0.5)
    run()  # restart: state must come back from the checkpoint

    emitted = spark.read.parquet(out)
    # bounded output: <= emit_top rows per (shard, batch emission)
    assert emitted.count() <= 8 * 4 * 2 + 8 * 4  # 2-3 batches x 4 shards x top8
    # the LAST emission per shard carries the cumulative summaries: all
    # heavy tokens present with counters spanning both runs (> one
    # chunk's worth — proves state survived the restart)
    newest = emitted.groupBy("shard").agg(F.max("shard_tokens").alias("shard_tokens"))
    latest = emitted.join(newest, ["shard", "shard_tokens"]).select("token", "lb").collect()
    by_tok = {r["token"]: r["lb"] for r in latest}
    for k, n in heavy.items():
        assert k in by_tok, (k, sorted(by_tok))
        assert by_tok[k] <= n  # lb never exceeds the true count
        assert by_tok[k] > n * 0.5  # and spans both halves of the stream


def test_streaming_scene_segments_match_batch(spark, tmp_path):
    """The streaming scene twin: frames drained in three time-ordered
    micro-batches (state straddles batch boundaries, including cuts
    whose jump crosses a boundary) must equal the batch
    scene_segments windows on the same frames; a re-delivered chunk
    must not re-emit (per-frame exactly-once)."""
    import json
    import os
    import random
    import time

    from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
        scene_segments,
    )
    from pokemon_showdown_airflow_etl_spark.streaming.stateful import (
        start_scene_segmentation,
    )

    rng = random.Random(11)
    rows = []
    for asset in ("va", "vb", "vc"):
        for k in range(30):
            rows.append(
                {
                    "asset_id": asset,
                    "frame_ms": k * 1000,
                    "luma": rng.randrange(256),
                }
            )
    rows.sort(key=lambda r: r["frame_ms"])  # time-ordered landing
    land = tmp_path / "frames_landing"
    land.mkdir()
    base = time.time() - 600
    for c in range(3):
        path = land / f"chunk{c}.json"
        with open(path, "w") as f:
            for r in rows[c * 30 : (c + 1) * 30]:
                f.write(json.dumps(r) + "\n")
        os.utime(path, (base + c, base + c))

    schema = "asset_id string, frame_ms long, luma int"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
    )
    out, ck = str(tmp_path / "scenes"), str(tmp_path / "scene_ck")
    q = start_scene_segmentation(stream, out, ck)
    q.awaitTermination()

    batch = scene_segments(
        spark.createDataFrame(
            [(r["asset_id"], r["frame_ms"], r["luma"]) for r in rows], schema
        )
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(tuple, batch.select(*spark.read.parquet(out).columns).collect())
    )
    assert got == want and len(got) == 90

    # re-deliver chunk0 under a new name: a restarted / at-least-once
    # source must not re-emit already-processed offsets
    dup = land / "chunk0_replay.json"
    with open(dup, "w") as f:
        for r in rows[:30]:
            f.write(json.dumps(r) + "\n")
    os.utime(dup, (base + 10, base + 10))
    q = start_scene_segmentation(stream, out, ck)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 90
