"""Tests for the gap-filling extras: approx-sketch error bounds (the
check DuckDB hash equality can't express) and the S4 JSON compacted
interop scan (multiLine array files + line-delimited exports)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.io import (
    export_compacted_json,
    read_compacted_json,
)
from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES
from pokemon_showdown_airflow_etl_spark.sources.fake import make_replays


def test_approx_sketches_error_bounds(spark, sf_dir):
    """a1 emits the bound CHECK, not the sketch (the raw estimates are
    engine-specific): every per-group boolean must hold, and the exact
    count must agree with an independent exact aggregation."""
    from pokemon_showdown_airflow_etl_spark.io import table

    rows = {
        r["event_type"]: r
        for r in ALL_QUERIES["a1_approx_sketches"].spark(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["users"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        assert r["exact_users"] == exact[et]
        assert r["hll_within_3rsd"] is True
        assert r["median_rank_ok"] is True
        assert r["p99_rank_ok"] is True


def test_compacted_json_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(make_replays("gen9ou", 30)).withColumn(
        "date", F.date_format(F.timestamp_seconds("uploadtime"), "yyyy-MM-dd")
    ).withColumn("extras", F.lit(None).cast("map<string,string>"))
    out = str(tmp_path / "compacted_json")
    export_compacted_json(docs, out)
    back = read_compacted_json(spark, out)
    assert back.count() == 30
    assert back.select("id").distinct().count() == 30
    assert back.filter(F.col("log").contains("|t:|")).count() == 30


def test_multiline_array_day_file_scan(spark, tmp_path):
    """The reference writes each day as one JSON *array* file
    (compaction.py:219-225); multiLine read ingests that format."""
    replays = make_replays("gen9ou", 7)
    day_dir = tmp_path / "compacted_replays" / "gen9ou"
    os.makedirs(day_dir)
    with open(day_dir / "2023-11-14.json", "w") as f:
        json.dump(replays, f)
    df = read_compacted_json(spark, str(day_dir), multi_line=True)
    assert df.count() == 7
    assert df.select("id").distinct().count() == 7
    assert df.schema["uploadtime"].dataType.typeName() == "long"


def test_filename_to_id_and_mtime_on_real_scan(spark, tmp_path):
    """C9/C11 against a real file scan: binaryFile source provides
    path + modificationTime; the basename-stem extraction and the
    mtime-as-epoch fallback run on actual input_file_name() metadata
    (import_existing_replays.py:32-34,54)."""
    import json

    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.functions import scalars as C

    day_dir = tmp_path / "replays" / "gen9ou" / "2023-11-14"
    day_dir.mkdir(parents=True)
    for rid in ("gen9ou-1", "gen9ou-2", "gen9ou-3"):
        (day_dir / f"{rid}.json").write_text(json.dumps({"id": rid}))

    files = spark.read.format("binaryFile").load(str(day_dir) + "/*.json")
    out = files.select(
        F.regexp_extract("path", r"([^/]+)\.json$", 1).alias("replay_id"),
        F.unix_timestamp("modificationTime").alias("mtime_epoch"),
    )
    rows = {r["replay_id"]: r["mtime_epoch"] for r in out.collect()}
    assert set(rows) == {"gen9ou-1", "gen9ou-2", "gen9ou-3"}
    assert all(v > 1_600_000_000 for v in rows.values())

    # the json-source twin using input_file_name() (C9 exactly)
    docs = spark.read.schema("id string").json(str(day_dir)).select(
        "id", C.filename_to_id().alias("from_path")
    )
    assert all(r["id"] == r["from_path"] for r in docs.collect())


def test_orc_lake_roundtrip(spark, tmp_path):
    """The lake write/read path supports ORC as an alternative columnar
    format (same partition pruning and pushdown) for ORC-standardized
    shops."""
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.io import (
        read_replay_lake,
        write_replay_lake,
    )

    docs = (
        spark.createDataFrame(make_replays("gen9ou", 12))
        .withColumn("date", F.date_format(F.timestamp_seconds("uploadtime"), "yyyy-MM-dd"))
    )
    path = str(tmp_path / "orc_lake")
    write_replay_lake(docs, path, file_format="orc")
    back = read_replay_lake(spark, path, file_format="orc")
    assert back.count() == 12
    # partition pruning works the same: filter on partition cols
    one_day = back.filter(F.col("date") == docs.select("date").first()[0])
    assert one_day.count() > 0


def test_gzipped_day_file_scan(spark, tmp_path):
    """S4 with compressed day files: Spark's json source decompresses
    .gz transparently, so gzipped compacted archives ingest unchanged."""
    import gzip
    import json

    from pokemon_showdown_airflow_etl_spark.io import read_compacted_json

    day_dir = tmp_path / "compacted_replays" / "gen9ou"
    day_dir.mkdir(parents=True)
    replays = make_replays("gen9ou", 9)
    with gzip.open(day_dir / "2023-11-14.json.gz", "wt") as f:
        for r in replays:
            f.write(json.dumps(r) + "\n")
    df = read_compacted_json(spark, str(day_dir))
    assert df.count() == 9
    assert df.select("id").distinct().count() == 9


def test_reference_day_file_export_round_trips(spark, tmp_path):
    """export_reference_day_files must write the reference's exact
    on-disk layout — {format}/{YYYY-MM-DD}.json, each a JSON ARRAY of
    replay docs (tasks/compaction.py:219-225) — and re-reading those
    array files must reproduce the parquet compacted lake."""
    import json
    import os

    from pokemon_showdown_airflow_etl_spark.io import (
        export_reference_day_files,
        read_compacted_json,
    )
    from pokemon_showdown_airflow_etl_spark.jobs import (
        ReplayLake, compact, discover, download,
    )
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient
    from pokemon_showdown_airflow_etl_spark.sources.fake import (
        FakeShowdownTransport, make_replays,
    )
    from pyspark.sql import functions as F

    lake = ReplayLake(str(tmp_path / "lake"))
    client = ReplayApiClient(
        transport=FakeShowdownTransport({"gen9ou": make_replays("gen9ou", 60)}),
        sleeper=lambda s: None,
    )
    discover(spark, lake, client, "gen9ou", max_pages=10)
    download(spark, lake, client, "gen9ou", parallelism=4)
    compact(spark, lake, "gen9ou")

    compacted = spark.read.parquet(lake.compacted_path)
    out = str(tmp_path / "compacted_replays")
    export_reference_day_files(compacted, out)

    # exact layout: one {format}/{date}.json per day, each a JSON array
    days = {str(r["date"]) for r in compacted.select("date").distinct().collect()}
    files = sorted(os.listdir(os.path.join(out, "gen9ou")))
    assert files == sorted(f"{d}.json" for d in days)
    total = 0
    for fn in files:
        with open(os.path.join(out, "gen9ou", fn)) as f:
            arr = json.loads(f.read())
        assert isinstance(arr, list) and arr, f"{fn} is not a non-empty array"
        assert all(doc["id"] for doc in arr)
        total += len(arr)
    assert total == compacted.count()

    # round-trip: the array day files re-read into the same table
    back = read_compacted_json(spark, os.path.join(out, "*", "*.json"), multi_line=True)
    cols = ["id", "format", "uploadtime", "p1", "p2", "log", "rating"]
    a = {tuple(r) for r in compacted.select(*cols).collect()}
    b = {tuple(r) for r in back.select(*cols).collect()}
    assert a == b
    # and the derived day matches the directory file name it came from
    rederived = back.withColumn(
        "date", F.date_format(F.timestamp_seconds("uploadtime"), "yyyy-MM-dd")
    )
    assert {r["date"] for r in rederived.select("date").distinct().collect()} == days


def test_resize_images_aspect_fit_invariants(spark):
    """m4's mapInPandas resize: the longer side lands exactly on the
    target, nothing exceeds the box, and aspect order is preserved.
    (Value-level parity is the m4 oracle's job — this pins the geometry
    contract the stub shares with a real resampler.)"""
    from pokemon_showdown_airflow_etl_spark.operators.multimodal import resize_images

    assets = spark.createDataFrame(
        [(f"a{i}", f"payload-{i}".encode()) for i in range(64)],
        "asset_id string, payload binary",
    )
    out = resize_images(assets, target=100).collect()
    assert len(out) == 64
    for r in out:
        assert max(r["out_width"], r["out_height"]) == 100
        assert r["out_width"] <= 100 and r["out_height"] <= 100
        assert (r["width"] >= r["height"]) == (r["out_width"] >= r["out_height"])
        assert r["out_bytes"] == r["out_width"] * r["out_height"] * 3
        assert len(r["resized_md5"]) == 32


def test_chunk_windows_reconstruct_and_overlap(spark):
    """Chunk inventory invariants: with stride == window the chunks
    concatenate back to the normalized text; with stride < window each
    chunk's tail overlaps the next chunk's head by window - stride
    tokens; n_tokens always equals the chunk's actual token count."""
    from pokemon_showdown_airflow_etl_spark.operators.text import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),
            (2, " ".join(f"v{i}" for i in range(37))),  # runt tail
            (3, "a b c"),  # shorter than min_tokens
            (4, "  Mixed   CASE    text here now ok yes sure  "),
        ],
        "doc_id long, text string",
    )
    # exact tiling: stride == window, keep every tail
    tiled = chunk_windows(docs, "doc_id", "text", window=16, stride=16, min_tokens=1)
    rows = tiled.orderBy("doc_id", "chunk_id").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert r["n_tokens"] == len(r["chunk_text"].split(" "))
    assert " ".join(c["chunk_text"] for c in by_doc[1]) == " ".join(
        f"w{i}" for i in range(100)
    )
    assert " ".join(c["chunk_text"] for c in by_doc[4]) == (
        "mixed case text here now ok yes sure"
    )
    assert [c["chunk_id"] for c in by_doc[1]] == list(range(7))  # dense ids

    # overlapped: each consecutive pair shares window - stride tokens
    lapped = chunk_windows(docs, "doc_id", "text", window=16, stride=8, min_tokens=8)
    d1 = [r for r in lapped.orderBy("chunk_id").collect() if r["doc_id"] == 1]
    for a, b in zip(d1, d1[1:]):
        if a["n_tokens"] == 16:
            assert a["chunk_text"].split(" ")[8:] == b["chunk_text"].split(" ")[:8]
    # doc 3 (3 tokens < min 8) emits nothing
    assert lapped.filter(F.col("doc_id") == 3).count() == 0


def test_cms_heavy_hitters_laws(spark):
    """CMS laws on a skewed synthetic stream: the reported keys are the
    exact top-k with exact counts; est >= exact holds for EVERY key even
    under a deliberately collision-heavy width=2 sketch."""
    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        cms_estimate,
        cms_heavy_hitters,
        cms_sketch,
    )

    occurrences = []
    truth = {}
    for i, n in enumerate([500, 120, 120, 40, 7, 3, 1]):
        truth[f"k{i}"] = n
        occurrences += [(f"k{i}",)] * n
    keys = spark.createDataFrame(occurrences, "k string").repartition(8)

    top = cms_heavy_hitters(keys, "k", depth=4, width=256, topk=3).collect()
    assert [(r["k"], r["exact_n"], r["rank"]) for r in top] == [
        ("k0", 500, 1),
        ("k1", 120, 2),  # 120-tie breaks on key asc
        ("k2", 120, 3),
    ]
    assert all(r["est_ge_exact"] and r["est_within_eps"] for r in top)

    # collision-heavy sketch: estimates inflate but never underestimate
    sk = cms_sketch(keys, "k", depth=2, width=2)
    all_keys = keys.distinct()
    est = cms_estimate(all_keys, sk, "k", depth=2, width=2).collect()
    assert len(est) == len(truth)
    assert all(r["est"] >= truth[r["k"]] for r in est)
    assert any(r["est"] > truth[r["k"]] for r in est)  # collisions happened


def test_misra_gries_proposes_all_true_heavy_hitters(spark):
    """The MG floor: any key with global frequency above n/(m+1) of its
    partition must survive that partition's summary. Build a skewed
    stream where heavy keys tower over a long tail of singletons and
    assert the approx path (MG candidates + CMS estimates, no exact
    aggregation) reports exactly the true heavy keys, despite m being
    far smaller than the key cardinality."""
    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        cms_heavy_hitters_approx,
        misra_gries_candidates,
    )

    heavy = {f"h{i}": 400 - 50 * i for i in range(5)}  # 400..200
    occurrences = [(k,) for k, n in heavy.items() for _ in range(n)]
    occurrences += [(f"tail{i}",) for i in range(2000)]  # singleton tail
    keys = spark.createDataFrame(occurrences, "k string").repartition(4)

    cands = {r["key"] for r in misra_gries_candidates(keys, "k", m=16).collect()}
    assert set(heavy) <= cands
    # bounded state: <= m survivors per partition
    assert len(cands) <= 4 * 16

    top = cms_heavy_hitters_approx(keys, "k", depth=4, width=1024, topk=5, m=16)
    rows = top.collect()
    assert [r["k"] for r in rows] == sorted(heavy, key=lambda k: (-heavy[k], k))
    for r in rows:
        assert r["est"] >= heavy[r["k"]]  # no-underestimate survives the pipeline
