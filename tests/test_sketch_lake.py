"""The signature lake's sketch facet (VERDICT r9 item 7): per-batch
HLL registers + KMV bottom-k rows persist at ingest, compaction REDUCES
them by the merge laws (max per register / bottom-k of unions), and the
merged stored sketch always equals the sketch computed from scratch
over everything ingested."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
    SKETCH_TABLE,
    batch_sketch_rows,
    compact_signature_corpus,
    ingest_signature_batch,
    merge_sketch_rows,
    read_corpus_sketch,
)


def _docs(spark, lo, hi, salt=""):
    rows = [
        (i, f"{salt}tok{i}a tok{i}b tok{i}c shared words here {i}")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ingest_persists_sketch_and_merge_equals_from_scratch(spark, tmp_path):
    root = str(tmp_path / "sig")
    a, b = _docs(spark, 0, 40), _docs(spark, 40, 75, salt="x")
    ingest_signature_batch(spark, a, root, "day1")
    ingest_signature_batch(spark, b, root, "day2")
    assert os.path.exists(
        os.path.join(root, SKETCH_TABLE, "batch=day1", "_SUCCESS")
    )
    merged = read_corpus_sketch(spark, root, k=32)
    scratch = batch_sketch_rows(a.unionAll(b), k=32)
    assert _rows(merged) == _rows(scratch)
    # merging is idempotent: re-merging the merged sketch is a no-op
    assert _rows(merge_sketch_rows(merged, k=32)) == _rows(merged)


def test_compaction_reduces_sketches_without_changing_the_merge(spark, tmp_path):
    root = str(tmp_path / "sig")
    parts = [(0, 30), (30, 55), (55, 90)]
    for i, (lo, hi) in enumerate(parts):
        ingest_signature_batch(spark, _docs(spark, lo, hi), root, f"day{i}")
    before = _rows(read_corpus_sketch(spark, root, k=32))

    st = compact_signature_corpus(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 3
    # one consolidated sketch partition, bounded (<= 64 HLL + k KMV
    # rows), the per-day partitions gone
    sk_parts = sorted(os.listdir(os.path.join(root, SKETCH_TABLE)))
    assert len(sk_parts) == 1 and sk_parts[0].startswith("batch=compact-")
    stored = spark.read.parquet(os.path.join(root, SKETCH_TABLE, sk_parts[0]))
    assert stored.count() <= 64 + 512
    assert _rows(read_corpus_sketch(spark, root, k=32)) == before

    # and the lake keeps growing after compaction: a new batch's sketch
    # merges with the consolidated one
    ingest_signature_batch(spark, _docs(spark, 90, 120, salt="z"), root, "day9")
    grown = read_corpus_sketch(spark, root, k=32)
    scratch = batch_sketch_rows(
        _docs(spark, 0, 90).unionAll(_docs(spark, 90, 120, salt="z")), k=32
    )
    assert _rows(grown) == _rows(scratch)


def test_pre_facet_batches_without_sketches_are_tolerated(spark, tmp_path):
    """A lake whose early batches predate the sketch facet has no
    sketches/ partition for them — readers merge what exists and
    compaction must not crash on the gap."""
    import shutil

    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, _docs(spark, 0, 20), root, "old")
    shutil.rmtree(os.path.join(root, SKETCH_TABLE, "batch=old"))
    assert read_corpus_sketch(spark, root) is None

    ingest_signature_batch(spark, _docs(spark, 20, 45), root, "new")
    got = read_corpus_sketch(spark, root, k=32)
    assert _rows(got) == _rows(batch_sketch_rows(_docs(spark, 20, 45), k=32))

    st = compact_signature_corpus(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 2
    assert _rows(read_corpus_sketch(spark, root, k=32)) == _rows(
        batch_sketch_rows(_docs(spark, 20, 45), k=32)
    )


def test_sketch_covers_considered_docs_not_just_survivors(spark, tmp_path):
    """Intake statistics are a pure function of what ARRIVED: a batch
    full of near-dups of the corpus still contributes its docs to the
    sketch even though none of them register as survivors."""
    root = str(tmp_path / "sig")
    a = _docs(spark, 0, 25)
    ingest_signature_batch(spark, a, root, "day1")
    # day2 re-sends day1's texts under NEW ids -> all dup_of_corpus
    dups = a.select(
        (F.col("doc_id") + 1000).alias("doc_id"), F.col("text")
    )
    st = ingest_signature_batch(spark, dups, root, "day2")
    assert st["n_accepted"] == 0 and st["n_dup_of_corpus"] == 25
    merged = read_corpus_sketch(spark, root, k=64)
    scratch = batch_sketch_rows(a.unionAll(dups), k=64)
    assert _rows(merged) == _rows(scratch)
    # the KMV leg saw all 50 considered docs
    assert merged.filter(F.col("kind") == "kmv").count() == 50


def test_corpus_sketch_stats_serves_estimates_from_stored_rows(spark, tmp_path):
    """The operational read (cli sketch-stats): distinct-content
    estimate within HLL error of the true count, and — because the
    corpus is smaller than k — EXACT nearest-rank length quantiles."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        corpus_sketch_stats,
    )

    root = str(tmp_path / "sig")
    assert corpus_sketch_stats(spark, root)["has_sketch"] is False

    docs = _docs(spark, 0, 60).unionAll(_docs(spark, 60, 100, salt="y"))
    ingest_signature_batch(spark, docs.filter("doc_id < 50"), root, "d1")
    ingest_signature_batch(spark, docs.filter("doc_id >= 50"), root, "d2")
    st = corpus_sketch_stats(spark, root)
    assert st["has_sketch"] and st["n_kmv_sample"] == 100
    est = st["distinct_content_est_milli"] / 1000.0
    assert abs(est - 100) / 100 < 0.45, f"HLL estimate {est} too far from 100"
    lens = sorted(
        len(r["text"]) for r in docs.select("text").collect()
    )
    for q_bp, got in st["len_quantiles_bp"].items():
        assert got == lens[(int(q_bp) * 99) // 10000]


def test_kmv_merge_dedupes_crash_window_duplicates(spark, tmp_path):
    """During the compaction crash window the consolidated partition's
    rows are read alongside the not-yet-removed partitions they replaced,
    so every KMV row arrives twice. HLL is idempotent under max, but the
    KMV rank must dedupe identical (h, k, v) rows or the sample
    degenerates to ~bottom-k/2-each-twice (ADVICE r10)."""
    a, b = _docs(spark, 0, 40), _docs(spark, 40, 75, salt="x")
    sk_a, sk_b = batch_sketch_rows(a, k=32), batch_sketch_rows(b, k=32)
    clean = merge_sketch_rows(sk_a.unionAll(sk_b), k=32)
    # the crash-window read: both originals AND their merge
    window = sk_a.unionAll(sk_b).unionAll(clean)
    assert _rows(merge_sketch_rows(window, k=32)) == _rows(clean)
    kmv = merge_sketch_rows(window, k=32).filter(F.col("kind") == "kmv")
    assert kmv.count() == 32
    assert kmv.select("h").distinct().count() == 32
