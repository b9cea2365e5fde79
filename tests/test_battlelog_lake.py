"""Write-path tests for the materialized battle-log analysis layer
(jobs/battlelog_lake.py) — the K2-style parity contract: the lake
tables must equal the direct parse row-for-row, the build must be
idempotent/atomic, and the layout must carry the clustering the
b-queries depend on."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.functions.logparse import battle_events
from pokemon_showdown_airflow_etl_spark.functions.scalars import log_timestamp
from pokemon_showdown_airflow_etl_spark.jobs import battlelog_lake as bl
from pokemon_showdown_airflow_etl_spark.plans.battlelog import corpus


@pytest.fixture()
def lake_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", str(tmp_path / "lake"))
    yield tmp_path / "lake"


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_lines_table_equals_direct_parse(spark, sf_dir, lake_env):
    docs, lines = bl.battlelog_tables(spark, sf_dir)
    direct = battle_events(corpus(spark, sf_dir))
    assert _rows(lines) == _rows(direct)


def test_docs_table_equals_direct_derivation(spark, sf_dir, lake_env):
    docs, _ = bl.battlelog_tables(spark, sf_dir)
    src = corpus(spark, sf_dir)
    direct = src.select(
        F.col("id").alias("replay_id"),
        "format",
        "uploadtime",
        "p1",
        "p2",
        log_timestamp("log").alias("first_log_ts"),
        F.size(F.filter(F.split("log", "\n"), lambda s: s != "")).alias("n_lines"),
    )
    assert _rows(docs) == _rows(direct)
    # n_lines cross-table invariant: docs.n_lines == per-replay count in lines
    _, lines = bl.battlelog_tables(spark, sf_dir)
    joined = (
        docs.join(
            lines.groupBy("replay_id").agg(F.count("*").alias("n")),
            "replay_id",
        )
        .filter(F.col("n") != F.col("n_lines"))
        .count()
    )
    assert joined == 0


def test_first_log_ts_skips_malformed_leading_stamp(spark, lake_env, monkeypatch):
    """C5 parity on the degenerate logs (ADVICE r4): the lake's
    first_log_ts must equal log_timestamp()'s first-PARSEABLE-stamp
    semantics even when a log's first |t:| line is malformed, and NULL
    when no stamp parses at all."""
    import pokemon_showdown_airflow_etl_spark.plans.battlelog as pb

    rows = [
        # first stamp malformed -> C5 skips to 777; the old bare
        # command=='t:' min_by returned NULL here
        ("r-bad-first", "gen9ou", 1, "a", "b",
         "|start\n|t:|garbage\n|move|p1a: X|Tackle\n|t:|777\n|win|a"),
        # no parseable stamp anywhere -> NULL (C11 fallback territory)
        ("r-no-stamp", "gen9ou", 2, "a", "b", "|start\n|t:|nope\n|win|b"),
        # happy path unchanged
        ("r-ok", "gen9ou", 3, "a", "b", "|t:|555\n|start\n|win|a"),
    ]
    fake = spark.createDataFrame(
        rows, "id string, format string, uploadtime long, p1 string, p2 string, log string"
    )
    monkeypatch.setattr(pb, "corpus", lambda spark_, sf: fake)
    docs, _ = bl.battlelog_tables(spark, "sf-malformed-stamp")
    got = {r["replay_id"]: r["first_log_ts"] for r in docs.collect()}
    want = {
        r[0]: v
        for r, v in zip(
            rows,
            [r["ts"] for r in fake.select(log_timestamp("log").alias("ts")).collect()],
        )
    }
    assert got == want == {"r-bad-first": 777, "r-no-stamp": None, "r-ok": 555}


def test_build_is_idempotent_and_cached(spark, sf_dir, lake_env):
    out1 = bl.ensure_battlelog_lake(spark, sf_dir)
    marker = out1 / "_SUCCESS"
    mtime = marker.stat().st_mtime_ns
    out2 = bl.ensure_battlelog_lake(spark, sf_dir)
    assert out1 == out2
    assert marker.stat().st_mtime_ns == mtime, "second ensure() rebuilt the lake"


def test_failed_build_leaves_no_partial_lake(spark, sf_dir, lake_env, monkeypatch):
    # a build that dies mid-write must not leave a directory the next
    # reader would mistake for a complete lake
    def boom(spark_, sf, out):
        (out / "lines").mkdir(parents=True)
        raise RuntimeError("injected failure")

    monkeypatch.setattr(bl, "build_battlelog_lake", boom)
    with pytest.raises(RuntimeError, match="injected"):
        bl.ensure_battlelog_lake(spark, sf_dir)
    assert not bl.lake_dir(sf_dir).exists()
    assert not list(bl.lake_dir(sf_dir).parent.glob(".tmp-*")), "temp dir leaked"


def test_lines_layout_is_clustered_by_replay(spark, sf_dir, lake_env):
    # hash-repartition on replay_id means a replay's lines land in
    # exactly ONE file — the co-location per-replay windows and
    # aggregates rely on (at cluster scale: bucketing by replay_id)
    out = bl.ensure_battlelog_lake(spark, sf_dir)
    lines = spark.read.parquet(str(out / "lines"))
    split_replays = (
        lines.withColumn("f", F.input_file_name())
        .groupBy("replay_id")
        .agg(F.countDistinct("f").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert split_replays == 0


def test_lines_scan_is_bucketed_and_aggregates_without_exchange(
    spark, sf_dir, lake_env
):
    """The point of the bucketed layout: a per-replay aggregate over the
    registered lines table must read `Bucketed: true` and plan NO
    Exchange — the scan's hash-distribution satisfies the aggregate's
    requirement. A regression to a plain-parquet read (or a lost
    CLUSTERED BY registration) reintroduces a full fact-table shuffle
    on every b-query."""
    import contextlib
    import io

    _, lines = bl.battlelog_tables(spark, sf_dir)
    agg = lines.groupBy("replay_id").agg(F.count("*").alias("n"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    assert "Bucketed: true" in plan, plan
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# Incremental analysis layer over the live replay lake
# ---------------------------------------------------------------------------


def _land_compacted(spark, lake, replays):
    from pokemon_showdown_airflow_etl_spark.schemas import REPLAY_DOCUMENT

    rows = [tuple(r.get(f.name) for f in REPLAY_DOCUMENT.fields) for r in replays]
    (
        spark.createDataFrame(rows, REPLAY_DOCUMENT)
        .withColumn(
            "date", F.from_unixtime("uploadtime", "yyyy-MM-dd")
        )
        .write.partitionBy("format", "date")
        .mode("append")
        .parquet(lake.compacted_path)
    )


def test_refresh_battlelog_layer_incremental(spark, tmp_path):
    """The live-lake analysis layer: first refresh parses everything;
    an unchanged second refresh parses NOTHING (and rewrites no files);
    landing more docs into one day re-parses exactly that day and the
    parsed lines match a direct parse of the whole lake throughout."""
    import os

    from pokemon_showdown_airflow_etl_spark.functions.logparse import battle_events
    from pokemon_showdown_airflow_etl_spark.jobs import ReplayLake
    from pokemon_showdown_airflow_etl_spark.jobs.battlelog_lake import (
        analysis_paths,
        refresh_battlelog_layer,
    )
    from pokemon_showdown_airflow_etl_spark.sources.fake import make_replays

    lake = ReplayLake(str(tmp_path / "lake"))
    corpus = make_replays("gen9ou", 60)  # hourly -> 3 days
    _land_compacted(spark, lake, corpus[:48])

    stats = refresh_battlelog_layer(spark, lake)
    assert stats["partitions_refreshed"] > 0
    assert stats["docs_parsed"] == 48
    paths = analysis_paths(lake)

    def lines_rows():
        return sorted(
            tuple(str(v) for v in r)
            for r in spark.read.parquet(paths["lines"])
            .select("replay_id", "line_no", "command", "args", "event_ts")
            .collect()
        )

    def direct(replays):
        from pokemon_showdown_airflow_etl_spark.schemas import REPLAY_DOCUMENT

        rows = [tuple(r.get(f.name) for f in REPLAY_DOCUMENT.fields) for r in replays]
        return sorted(
            tuple(str(v) for v in r)
            for r in battle_events(spark.createDataFrame(rows, REPLAY_DOCUMENT))
            .select("replay_id", "line_no", "command", "args", "event_ts")
            .collect()
        )

    assert lines_rows() == direct(corpus[:48])

    # unchanged lake: nothing re-parses, no data file rewritten
    mtimes = {
        p: os.path.getmtime(os.path.join(paths["lines"], p))
        for p in os.listdir(paths["lines"])
        if not p.startswith(("_", "."))
    }
    stats = refresh_battlelog_layer(spark, lake)
    assert stats == {"partitions_refreshed": 0, "docs_parsed": 0}
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(paths["lines"], p)) == m

    # 12 more replays: day 3 grows, day 4 appears -> exactly those days
    _land_compacted(spark, lake, corpus[48:])
    stats = refresh_battlelog_layer(spark, lake)
    assert stats["partitions_refreshed"] == 2
    assert lines_rows() == direct(corpus)
    docs = spark.read.parquet(paths["docs"])
    assert docs.count() == 60
    assert docs.filter(F.col("n_lines") <= 0).count() == 0


# ---------------------------------------------------------------------------
# Content-signature layer (jobs/doc_signature_lake.py)
# ---------------------------------------------------------------------------


def test_signature_lake_matches_on_the_fly_formulas(spark, sf_dir, tmp_path, monkeypatch):
    """The stored layer must be byte-identical to the live formulas —
    the property that lets d2/d3/d5/d7/d8 route through it without any
    oracle change; and a second ensure() must not rebuild."""
    import os

    from pokemon_showdown_airflow_etl_spark.io import table
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        NUM_HASHES,
        SHINGLE_N,
        ensure_signature_lake,
        signature_tables,
    )
    from pokemon_showdown_airflow_etl_spark.operators.dedup import (
        _shingle_df,
        minhash_signature,
        simhash16,
    )

    monkeypatch.setenv("SPARK_GRAFT_LAKE_DIR", str(tmp_path / "sig"))
    out = ensure_signature_lake(spark, sf_dir)
    sig, fp = signature_tables(spark, sf_dir)

    docs = table(spark, sf_dir, "documents")
    live_sh = _shingle_df(docs, "doc_id", "text", SHINGLE_N)
    live_sig = live_sh.select(
        "doc", "shingles", *minhash_signature(F.col("shingles"), NUM_HASHES)
    )
    a = sorted(
        (r["doc"], tuple(sorted(r["shingles"])), *[r[f"mh{i}"] for i in range(NUM_HASHES)])
        for r in sig.collect()
    )
    b = sorted(
        (r["doc"], tuple(sorted(r["shingles"])), *[r[f"mh{i}"] for i in range(NUM_HASHES)])
        for r in live_sig.collect()
    )
    assert a == b
    assert sorted(map(tuple, fp.collect())) == sorted(
        map(tuple, simhash16(docs, "doc_id", "text").collect())
    )

    # idempotent: second ensure leaves every file untouched
    mtimes = {
        p: os.path.getmtime(os.path.join(out, "signatures", p))
        for p in os.listdir(out / "signatures")
        if not p.startswith(("_", "."))
    }
    assert ensure_signature_lake(spark, sf_dir) == out
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, "signatures", p)) == m


def test_ensure_lake_repairs_sentinel_less_leftover(tmp_path):
    """A cache dir left WITHOUT _SUCCESS (interrupted cleanup) must be
    cleared and rebuilt, not brick every consumer with ENOTEMPTY."""
    from pokemon_showdown_airflow_etl_spark.jobs._lake import ensure_lake

    out = tmp_path / "v1-x"
    (out / "data").mkdir(parents=True)  # junk: exists, no _SUCCESS
    (out / "data" / "part-0").write_text("stale")

    def build(tmp):
        tmp.mkdir(parents=True, exist_ok=True)
        (tmp / "fresh").write_text("ok")

    got = ensure_lake(out, build)
    assert got == out
    assert (out / "_SUCCESS").exists()
    assert (out / "fresh").read_text() == "ok"
    assert not (out / "data").exists()  # junk replaced

    # second call: no rebuild (build would now add nothing)
    def boom(tmp):
        raise AssertionError("rebuilt despite _SUCCESS")

    assert ensure_lake(out, boom) == out
