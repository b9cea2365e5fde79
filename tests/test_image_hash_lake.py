"""The incremental image-hash registry (jobs/image_hash_lake.py): m8's
admission protocol over a live lake — commit markers, idempotent
re-runs, batch immutability, crash invisibility, and table-agnostic
compaction, all inherited from the signature-lake machinery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs.image_hash_lake import (
    compact_image_corpus,
    ingest_image_batch,
)


def _assets(spark, ids, salt=""):
    rows = [(str(i), f"{salt}image payload {i}".encode()) for i in ids]
    return spark.createDataFrame(rows, "asset_id string, payload binary")


def _statuses(spark, root, batch):
    return {
        r["asset"]: r["status"]
        for r in spark.read.parquet(
            os.path.join(root, "admissions", f"batch={batch}")
        ).collect()
    }


def test_ingest_registers_and_dedups_against_corpus(spark, tmp_path):
    root = str(tmp_path / "img")
    st = ingest_image_batch(spark, _assets(spark, range(10)), root, "day1")
    assert st["n_accepted"] == 10 and st["n_dup_of_corpus"] == 0

    # day2: 5 fresh + 3 re-encodes of day1 content under NEW ids + one
    # asset carried twice in the drop (same id — must decide once)
    day2 = (
        _assets(spark, range(10, 15))
        .unionByName(_assets(spark, range(3), salt="").withColumn(
            "asset_id", F.concat(F.lit("re-"), F.col("asset_id"))
        ))
        .unionByName(_assets(spark, [10]))
    )
    st = ingest_image_batch(spark, day2, root, "day2")
    assert st["n_considered"] == 8
    assert st["n_accepted"] == 5
    assert st["n_dup_of_corpus"] == 3
    s = _statuses(spark, root, "day2")
    assert s["re-0"] == "dup_of_corpus" and s["12"] == "accepted"

    # only survivors define identity: a day3 copy of a REJECTED day2
    # asset still reports dup (its content matches the day1 original
    # that was accepted)
    st = ingest_image_batch(
        spark,
        _assets(spark, [1]).withColumn("asset_id", F.lit("re2-1")),
        root,
        "day3",
    )
    assert st["n_dup_of_corpus"] == 1


def test_rerun_is_idempotent_and_committed_batches_are_immutable(
    spark, tmp_path
):
    root = str(tmp_path / "img")
    ingest_image_batch(spark, _assets(spark, range(5)), root, "day1")
    again = ingest_image_batch(spark, _assets(spark, range(5)), root, "day1")
    assert again["n_already_registered"] == 5 and again["n_considered"] == 0
    with pytest.raises(ValueError, match="immutable"):
        ingest_image_batch(spark, _assets(spark, range(5, 9)), root, "day1")


def test_crashed_batch_is_invisible_until_repaired(spark, tmp_path):
    import shutil

    root = str(tmp_path / "img")
    ingest_image_batch(spark, _assets(spark, range(5)), root, "day1")
    ingest_image_batch(spark, _assets(spark, range(5, 9)), root, "day2")
    # simulate a crash BEFORE day2's members marker landed
    shutil.rmtree(os.path.join(root, "members", "batch=day2"))
    # a day3 copy of a day2 asset must be ACCEPTED: day2's partial
    # hashes are phantoms (not committed), so they reject nothing
    st = ingest_image_batch(
        spark,
        _assets(spark, [5]).withColumn("asset_id", F.lit("re-5")),
        root,
        "day3",
    )
    assert st["n_accepted"] == 1 and st["n_dup_of_corpus"] == 0
    # the re-run repairs day2 in place; its copy now rejects
    ingest_image_batch(spark, _assets(spark, range(5, 9)), root, "day2")
    st = ingest_image_batch(
        spark,
        _assets(spark, [6]).withColumn("asset_id", F.lit("re-6")),
        root,
        "day4",
    )
    assert st["n_dup_of_corpus"] == 1


def test_compaction_consolidates_without_changing_admission(spark, tmp_path):
    root = str(tmp_path / "img")
    for i in range(3):
        ingest_image_batch(
            spark, _assets(spark, range(i * 5, (i + 1) * 5)), root, f"day{i}"
        )
    st = compact_image_corpus(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 3
    parts = sorted(os.listdir(os.path.join(root, "hashes")))
    assert len(parts) == 1 and parts[0].startswith("batch=compact-")

    # admission against the consolidated corpus behaves identically
    probe = (
        _assets(spark, [7])
        .withColumn("asset_id", F.lit("re-7"))
        .unionByName(_assets(spark, [100]))
    )
    st = ingest_image_batch(spark, probe, root, "day9")
    assert st["n_dup_of_corpus"] == 1 and st["n_accepted"] == 1
    # a retired id can never be reused
    with pytest.raises(ValueError, match="retired"):
        ingest_image_batch(spark, _assets(spark, [200]), root, "day0")


def test_streaming_image_admission_matches_batch_ingest(spark, tmp_path):
    """The m8 streaming twin (streaming/admission.py): draining an
    asset stream through foreachBatch admission registers exactly the
    survivors sequential batch ingests register, and a second drain
    resumes from the checkpoint (duplicates of registered content
    rejected, completed epochs not re-decided)."""
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_image_admission,
    )

    land = str(tmp_path / "in")
    root = str(tmp_path / "img")
    ck = str(tmp_path / "ck")

    c1 = [
        ("a0", b"image payload zero"),
        ("a1", b"image payload zero"),  # within-chunk dup of a0
        ("a2", b"image payload two"),
    ]
    c2 = [
        ("b0", b"image payload zero"),  # dup of registered a0
        ("b1", b"image payload fresh"),
    ]

    def land_chunk(rows):
        spark.createDataFrame(
            rows, "asset_id string, payload binary"
        ).coalesce(1).write.mode("append").parquet(land)

    def drain():
        stream = (
            spark.readStream.schema("asset_id string, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = start_image_admission(stream, root, ck)
        q.awaitTermination()

    land_chunk(c1)
    drain()
    land_chunk(c2)
    drain()  # restart from checkpoint

    adm = spark.read.parquet(root + "/admissions")
    got = {r["asset"]: r["status"] for r in adm.collect()}
    assert got == {
        "a0": "accepted",
        "a1": "dup_in_batch",
        "a2": "accepted",
        "b0": "dup_of_corpus",
        "b1": "accepted",
    }
    assert adm.count() == 5
    kept = {
        r["asset_id"]
        for r in spark.read.parquet(root + "/hashes").select("asset_id").collect()
    }
    assert kept == {"a0", "a2", "b1"}


def test_undecodable_assets_stay_undecided_and_reopen(spark, tmp_path):
    """ADVICE r11: a null-payload asset gets an explicit 'undecodable'
    admissions row, the counts sum to n_considered, and its id is
    EXCLUDED from members/ — so a corrected re-upload under a new
    batch_id is re-considered instead of permanently skipped. A
    checkpoint-style replay of the committed batch (same null payload)
    stays a harmless no-op rather than tripping the immutability
    guard."""
    root = str(tmp_path / "img")
    day1 = _assets(spark, range(3)).unionByName(
        spark.createDataFrame(
            [("broken", None)], "asset_id string, payload binary"
        )
    )
    st = ingest_image_batch(spark, day1, root, "day1")
    assert st["n_considered"] == 4
    assert st["n_accepted"] == 3 and st["n_undecodable"] == 1
    assert (
        st["n_accepted"]
        + st["n_dup_of_corpus"]
        + st["n_dup_in_batch"]
        + st["n_undecodable"]
        == st["n_considered"]
    )
    assert _statuses(spark, root, "day1")["broken"] == "undecodable"
    members = {
        r["asset"]
        for r in spark.read.parquet(
            os.path.join(root, "members", "batch=day1")
        ).collect()
    }
    assert "broken" not in members and members == {"0", "1", "2"}

    # replay of the committed batch with the same null payload: no-op
    again = ingest_image_batch(spark, day1, root, "day1")
    assert again["n_considered"] == 0 and again["n_undecodable"] == 1

    # a genuinely NEW id on a committed batch still trips immutability
    with pytest.raises(ValueError, match="immutable"):
        ingest_image_batch(
            spark, day1.unionByName(_assets(spark, [99])), root, "day1"
        )

    # the corrected re-upload arrives as a new batch and is decided
    fixed = spark.createDataFrame(
        [("broken", b"now a real unique payload")],
        "asset_id string, payload binary",
    )
    st = ingest_image_batch(spark, fixed, root, "day2")
    assert st["n_considered"] == 1 and st["n_accepted"] == 1
