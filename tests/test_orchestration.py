"""Tests for the orchestration surface: CLI subcommands, schema-version
migrations (O13 incl. the v1 event-log collapse), and DAG importability
without Airflow installed."""

from __future__ import annotations

import datetime
import importlib.util
import sys

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs import ReplayLake
from pokemon_showdown_airflow_etl_spark.jobs.migrations import (
    SCHEMA_VERSION,
    current_version,
    init_lake,
    migrate_v1_event_log,
)


def test_init_lake_stamps_version_idempotently(spark, tmp_path):
    lake = ReplayLake(str(tmp_path / "lake"))
    out = init_lake(spark, lake)
    assert out == {"version_before": 0, "version": SCHEMA_VERSION}
    assert current_version(spark, lake) == SCHEMA_VERSION
    out2 = init_lake(spark, lake)
    assert out2["version_before"] == SCHEMA_VERSION
    assert current_version(spark, lake) == SCHEMA_VERSION


def test_migrate_v1_event_log_collapse(spark):
    t = datetime.datetime(2025, 1, 1, 12, 0, 0)
    processing = spark.createDataFrame(
        [
            # r1: downloaded (older failure superseded by newer success - W1)
            ("r1", "downloaded", "failed", t, "Failed: HTTP 500 (batch b0)"),
            ("r1", "downloaded", "success", t + datetime.timedelta(hours=1),
             "Downloaded (batch b1)"),
            # r1 compacted
            ("r1", "compacted", "success", t + datetime.timedelta(hours=2),
             "Compacted (batch c1)"),
            # r2: failed download, retried
            ("r2", "downloaded", "failed", t, "Failed: HTTP 404 (batch b1)"),
            ("r2", "retried", "failed", t + datetime.timedelta(hours=3),
             "Failed: HTTP 404 (batch retry_1)"),
        ],
        "replay_id string, stage string, status string, processed_at timestamp, details string",
    )
    metadata = spark.createDataFrame(
        [
            ("r1", "gen9ou", t, 1700000000, "a vs b"),
            ("r2", "gen9ou", t, 1700000100, "c vs d"),
            ("r3", "gen9ou", t, 1700000200, "e vs f"),  # no events at all
        ],
        "replay_id string, format_id string, discovered_at timestamp, uploadtime long, players string",
    )
    wide = {r["replay_id"]: r for r in migrate_v1_event_log(processing, metadata).collect()}
    assert wide["r1"]["is_downloaded"] is True  # latest event wins
    assert wide["r1"]["downloaded_batch"] == "b1"
    assert wide["r1"]["is_compacted"] is True
    assert wide["r2"]["is_downloaded"] is False
    assert wide["r2"]["is_retry_attempted"] is False  # retry event was a failure
    assert wide["r2"]["retry_batch"] == "retry_1"
    assert wide["r3"]["is_downloaded"] is False and wide["r3"]["is_retry_attempted"] is None


def test_cli_init_analyze_roundtrip(spark, tmp_path, capsys):
    from pokemon_showdown_airflow_etl_spark.cli import main
    from pokemon_showdown_airflow_etl_spark.jobs import MetadataStore, discover
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient
    from pokemon_showdown_airflow_etl_spark.sources.fake import (
        FakeShowdownTransport,
        make_replays,
    )

    lake_dir = str(tmp_path / "lake")
    assert main(["--lake", lake_dir, "init"]) == 0
    lake = ReplayLake(lake_dir)
    client = ReplayApiClient(
        transport=FakeShowdownTransport({"gen9ou": make_replays("gen9ou", 20)}),
        sleeper=lambda s: None,
    )
    discover(spark, lake, client, "gen9ou", max_pages=5)
    assert main(["--lake", lake_dir, "analyze"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    import json

    analyzed = json.loads(out[-1])
    assert analyzed["gen9ou"]["total"] == 20


def test_dags_import_without_airflow(tmp_path):
    """The DAG modules must import cleanly (dag=None) when airflow is
    absent, so the repo doubles as a deployable Airflow dags folder."""
    import os

    for mod in ("showdown_replay_etl_dag", "showdown_replay_backfill_etl_dag"):
        path = os.path.join(os.path.dirname(__file__), "..", "dags", f"{mod}.py")
        sys.path.insert(0, os.path.dirname(path))
        try:
            spec = importlib.util.spec_from_file_location(mod, path)
            m = importlib.util.module_from_spec(spec)
            sys.modules[mod] = m
            spec.loader.exec_module(m)
            assert m.dag is None  # no airflow in this container
            assert callable(m._run_stage) or hasattr(m, "_backfill_discover")
        finally:
            sys.path.pop(0)


def test_cli_export_json_roundtrip(spark, tmp_path, capsys):
    import json

    from pokemon_showdown_airflow_etl_spark.cli import main
    from pokemon_showdown_airflow_etl_spark.io import read_compacted_json
    from pokemon_showdown_airflow_etl_spark.jobs import compact, discover, download
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient
    from pokemon_showdown_airflow_etl_spark.sources.fake import (
        FakeShowdownTransport,
        make_replays,
    )

    lake_dir = str(tmp_path / "lake")
    lake = ReplayLake(lake_dir)
    client = ReplayApiClient(
        transport=FakeShowdownTransport({"gen9ou": make_replays("gen9ou", 25)}),
        sleeper=lambda s: None,
    )
    discover(spark, lake, client, "gen9ou", max_pages=5)
    download(spark, lake, client, "gen9ou", parallelism=4)
    compact(spark, lake, "gen9ou")

    out_dir = str(tmp_path / "json_export")
    assert main(["--lake", lake_dir, "export-json", "--out", out_dir]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["exported"] == 25
    back = read_compacted_json(spark, out_dir)
    assert back.count() == 25 and back.select("id").distinct().count() == 25


def test_dag_params_resolve_like_reference(monkeypatch):
    """The DAG exposes the reference's run-time params
    (showdown_replay_etl_dag.py:42-47): format_id, max_pages,
    ignore_history, enable_detailed_timing — merged from a run's
    params/conf over the defaults, with the timing toggle mapped onto
    the engine's env switch."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "dags", "showdown_replay_etl_dag.py")
    spec = importlib.util.spec_from_file_location("etl_dag_params", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    monkeypatch.setenv("SHOWDOWN_DETAILED_TIMING", "unset-sentinel")  # restored on teardown

    assert set(m.DAG_PARAMS) == {
        "format_id", "max_pages", "ignore_history", "enable_detailed_timing"
    }
    p = m.resolve_params(
        {"params": {"ignore_history": True, "enable_detailed_timing": True, "max_pages": 9}}
    )
    assert p["ignore_history"] is True and p["max_pages"] == 9
    assert p["format_id"] == m.DAG_PARAMS["format_id"]
    assert os.environ["SHOWDOWN_DETAILED_TIMING"] == "1"
    assert m.resolve_params({}) == m.DAG_PARAMS
    assert os.environ["SHOWDOWN_DETAILED_TIMING"] == "0"


def test_cli_catalog_surface(spark, sf_dir, capsys):
    """`queries` lists the whole catalog without a lake or Spark
    session; `query` runs a cataloged query against an sf dir; `explain`
    dumps the physical plan (the plan-first debugging loop as a CLI)."""
    import json

    from pokemon_showdown_airflow_etl_spark.cli import main
    from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES

    assert main(["queries"]) == 0
    listed = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {e["name"] for e in listed} == set(ALL_QUERIES)
    assert all(e["check"] in ("sql-checked", "rows-only") for e in listed)

    assert main(["query", "g9_table_count", "--sf-dir", sf_dir]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and "n_rows" in rows[0]

    assert main(["explain", "q6_forecast_revenue", "--sf-dir", sf_dir]) == 0
    plan = capsys.readouterr().out
    assert "PushedFilters" in plan and "Scan parquet" in plan

    with pytest.raises(SystemExit):
        main(["query", "no_such_query", "--sf-dir", sf_dir])
    with pytest.raises(SystemExit):
        main(["audit"])  # lake-less maintenance command must refuse


def test_corpus_curation_dag_imports_and_runs_stages(spark, tmp_path, monkeypatch):
    """The corpus-curation DAG (dags/corpus_curation_dag.py): imports
    cleanly without airflow, and its stage callables drive the real
    jobs end-to-end over a tmp lake — admit (d9 + facets), decon-check
    (a10 serve, counts-only return), curate (stored-LM band), compact
    (O12 under ALL_DONE). A re-run of admit on the decided drop skips
    (O3: zero considered)."""
    import os as _os

    path = _os.path.join(
        _os.path.dirname(__file__), "..", "dags", "corpus_curation_dag.py"
    )
    spec = importlib.util.spec_from_file_location("corpus_curation_dag", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules["corpus_curation_dag"] = m
    spec.loader.exec_module(m)
    assert m.dag is None  # no airflow in this container

    drop_dir = tmp_path / "drops"
    (drop_dir / "2026-08-16").parent.mkdir(parents=True, exist_ok=True)
    monkeypatch.setattr(m, "SIG_ROOT", str(tmp_path / "sig"))
    monkeypatch.setattr(m, "DROP_DIR", str(drop_dir))
    monkeypatch.setattr(m, "OUT_DIR", str(tmp_path / "curated"))
    rows = [
        (
            i,
            f"document number {i} with several unique words w{i}a w{i}b w{i}c",
            f"src{i % 3}",
        )
        for i in range(30)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(str(drop_dir / "2026-08-16"))

    ctx = {"ds": "2026-08-16", "params": {"min_batches_compact": 1}}
    st = m.run_admit(**ctx)
    assert st["n_accepted"] > 0
    again = m.run_admit(**ctx)  # no airflow -> returns stats instead of skip
    assert again["n_considered"] == 0

    dc = m.run_decon_check(**ctx)
    # the probe excludes the drop's own batch (ADVICE r11), and day 1
    # has no prior batches — nothing to probe against
    assert dc["has_bloom"] is False

    # day 2: one doc copied verbatim from day 1 (true contamination
    # against the prior corpus) plus fresh docs — only the copy flags
    day2 = [rows[0]] + [
        (
            100 + i,
            f"fresh day-two text z{i}q z{i}r z{i}s z{i}t never seen",
            "src9",
        )
        for i in range(4)
    ]
    spark.createDataFrame(
        day2, "doc_id long, text string, source string"
    ).write.parquet(str(drop_dir / "2026-08-17"))
    ctx2 = {"ds": "2026-08-17", "params": {"min_batches_compact": 1}}
    st2 = m.run_admit(**ctx2)
    # doc_id 0 is already registered from day 1, so only the 4 fresh
    # ids are considered; the decon probe still sees the whole drop
    assert st2["n_considered"] == 4
    dc2 = m.run_decon_check(**ctx2)
    assert dc2["has_bloom"] is True
    assert dc2["n_docs"] == 5 and dc2["n_docs_flagged"] == 1

    cu = m.run_curate(**ctx)
    assert cu["n_written"] > 0
    assert cu["n_semantic_pruned"] == 0  # stage off by default

    # the optional r12 stage params thread through: semantic_prune
    # without an embeddings path must hit curate's loud guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires embeddings_path"):
        m.run_curate(
            **{**ctx, "params": {**ctx["params"], "semantic_prune": 0.9}}
        )
    cp = m.run_compact(**ctx)
    assert cp["n_batches_consolidated"] == 2  # day1 + day2

    # image leg (VERDICT r11 item 4): no drop dir -> O3 skip; a real
    # drop is admitted into the registry; a replay skips; compaction
    # consolidates under ALL_DONE
    monkeypatch.setattr(m, "IMG_ROOT", str(tmp_path / "img"))
    monkeypatch.setattr(m, "IMG_DROP_DIR", str(tmp_path / "img_drops"))
    assert m.run_admit_images(**ctx) == {"n_batch": 0}
    (tmp_path / "img_drops").mkdir()
    spark.createDataFrame(
        [(str(i), f"image payload {i}".encode()) for i in range(6)],
        "asset_id string, payload binary",
    ).write.parquet(str(tmp_path / "img_drops" / "2026-08-16"))
    ist = m.run_admit_images(**ctx)
    assert ist["n_accepted"] == 6 and ist["n_considered"] == 6
    ist2 = m.run_admit_images(**ctx)  # replay -> already decided
    assert ist2["n_considered"] == 0 and ist2["n_already_registered"] == 6
    icp = m.run_compact_images(**ctx)
    assert icp["n_batches_consolidated"] in (0, 1)

    # topology pin (airflow absent, so assert at the source level):
    # the image leg is parallel to the document chain, with its own
    # ALL_DONE compaction
    src_text = open(path).read()
    assert "admit_document_drop >> decontaminate_check >> curate >> compact_corpus" in src_text
    assert "admit_image_drop >> compact_images" in src_text
    assert src_text.count("TriggerRule.ALL_DONE") == 2
