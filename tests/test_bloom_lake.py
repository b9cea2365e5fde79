"""The signature lake's Bloom decontamination facet: per-batch
(w, bits) word rows over the considered docs' word 4-grams persist at
ingest, compaction REDUCES them by bitwise OR, and the merged stored
filter always equals the filter built from scratch over everything
ingested. OR is idempotent, so — unlike the additive lm/cms facets —
the compaction crash window (double-read of a consolidated partition
beside the batches it replaced) cannot corrupt the merge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
    BLOOM_TABLE,
    batch_bloom_rows,
    batch_gram4_stream,
    compact_signature_corpus,
    corpus_gram_probe,
    corpus_sketch_stats,
    ingest_signature_batch,
    read_corpus_bloom,
)
from pokemon_showdown_airflow_etl_spark.operators.sketches import (
    BLOOM_WORDS,
    bloom_maybe_contains,
    bloom_rows,
    merge_bloom_rows,
)


def _docs(spark, lo, hi, salt=""):
    rows = [
        (
            i,
            f"{salt}alpha{i} bravo{i} charlie{i} delta{i} echo{i} "
            f"foxtrot{i} golf{i}",
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ingest_persists_bloom_and_merge_equals_from_scratch(spark, tmp_path):
    root = str(tmp_path / "sig")
    a, b = _docs(spark, 0, 20), _docs(spark, 20, 40, salt="x")
    ingest_signature_batch(spark, a, root, "day1")
    ingest_signature_batch(spark, b, root, "day2")
    assert os.path.exists(
        os.path.join(root, BLOOM_TABLE, "batch=day1", "_SUCCESS")
    )
    merged = read_corpus_bloom(spark, root)
    scratch = batch_bloom_rows(a.unionAll(b))
    assert _rows(merged) == _rows(scratch)
    # OR is idempotent: re-merging the merged filter is a no-op, and so
    # is merging a batch's rows in twice (the crash-window double read)
    assert _rows(merge_bloom_rows(merged)) == _rows(merged)
    day1 = spark.read.parquet(os.path.join(root, BLOOM_TABLE, "batch=day1"))
    assert _rows(merge_bloom_rows(merged.unionByName(day1))) == _rows(merged)


def test_compaction_reduces_bloom_without_changing_the_merge(spark, tmp_path):
    root = str(tmp_path / "sig")
    parts = [(0, 15), (15, 30), (30, 50)]
    for i, (lo, hi) in enumerate(parts):
        ingest_signature_batch(spark, _docs(spark, lo, hi), root, f"day{i}")
    before = _rows(read_corpus_bloom(spark, root))

    st = compact_signature_corpus(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 3
    bl_parts = sorted(os.listdir(os.path.join(root, BLOOM_TABLE)))
    assert len(bl_parts) == 1 and bl_parts[0].startswith("batch=compact-")
    stored = spark.read.parquet(os.path.join(root, BLOOM_TABLE, bl_parts[0]))
    assert stored.count() <= BLOOM_WORDS
    assert _rows(read_corpus_bloom(spark, root)) == before

    # the lake keeps growing after compaction
    ingest_signature_batch(spark, _docs(spark, 50, 65, salt="z"), root, "day9")
    grown = read_corpus_bloom(spark, root)
    scratch = batch_bloom_rows(
        _docs(spark, 0, 50).unionAll(_docs(spark, 50, 65, salt="z"))
    )
    assert _rows(grown) == _rows(scratch)


def test_bloom_no_false_negatives_and_absent_grams_read_false(
    spark, tmp_path
):
    """The decontamination contract: every gram actually ingested reads
    maybe_present=true (NO false negatives, the law the serve relies
    on); grams never ingested read false at this tiny fill."""
    root = str(tmp_path / "sig")
    train = _docs(spark, 0, 30)
    ingest_signature_batch(spark, train, root, "day1")

    present = batch_gram4_stream(train).distinct()
    got = corpus_gram_probe(spark, root, present)
    assert got.filter(~F.col("maybe_present")).count() == 0

    absent = batch_gram4_stream(_docs(spark, 100, 130, salt="q")).distinct()
    got = corpus_gram_probe(spark, root, absent)
    # fill at 30 tiny docs is ~1e-4; a single false positive here would
    # be a hash-quality red flag, not bad luck
    assert got.filter(F.col("maybe_present")).count() == 0


def test_eval_decontamination_flags_planted_overlap(spark, tmp_path):
    """End-to-end serve: a held-out eval doc PLANTED to share a 4-gram
    with the ingested corpus probes true on exactly that gram; a clean
    eval doc probes all-false — contamination checked from stored rows
    without touching corpus text."""
    root = str(tmp_path / "sig")
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    ingest_signature_batch(spark, train, root, "day1")
    ev = spark.createDataFrame(
        [
            (100, "quick brown fox jumps somewhere else entirely"),
            (101, "totally unrelated evaluation sentence nothing shared"),
        ],
        "doc_id long, text string",
    )
    grams = batch_gram4_stream(ev).distinct()
    verdict = corpus_gram_probe(spark, root, grams)
    flagged = sorted(
        r["gram"] for r in verdict.filter(F.col("maybe_present")).collect()
    )
    assert flagged == ["quick brown fox jumps"]


def test_pre_facet_batches_without_bloom_are_tolerated(spark, tmp_path):
    import shutil

    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, _docs(spark, 0, 10), root, "old")
    shutil.rmtree(os.path.join(root, BLOOM_TABLE, "batch=old"))
    assert read_corpus_bloom(spark, root) is None
    assert corpus_gram_probe(
        spark, root, spark.createDataFrame([("x y z w",)], "gram string")
    ) is None

    ingest_signature_batch(spark, _docs(spark, 10, 25), root, "new")
    got = read_corpus_bloom(spark, root)
    assert _rows(got) == _rows(batch_bloom_rows(_docs(spark, 10, 25)))

    st = compact_signature_corpus(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 2
    assert _rows(read_corpus_bloom(spark, root)) == _rows(
        batch_bloom_rows(_docs(spark, 10, 25))
    )


def test_bloom_probe_key_matches_build_key(spark):
    """Probe and build share batch_gram4_stream, so a doc's own grams
    always hit the filter built from that doc — guards the one way the
    facet could silently rot (key drift between the two sides)."""
    docs = _docs(spark, 0, 5)
    grams = batch_gram4_stream(docs).distinct()
    bloom = bloom_rows(grams, "gram")
    got = bloom_maybe_contains(grams, bloom, "gram")
    assert got.filter(~F.col("maybe_present")).count() == 0


def test_sketch_stats_report_bloom_fill(spark, tmp_path):
    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, _docs(spark, 0, 20), root, "day1")
    st = corpus_sketch_stats(spark, root)
    assert st["has_bloom"] is True
    assert st["bloom_words"] > 0
    assert st["bloom_set_bits"] >= st["bloom_words"]
    assert 0 < st["bloom_fill_ppm"] < 1_000_000
    assert 0 <= st["bloom_fp_ppm"] <= st["bloom_fill_ppm"]
    assert st["facet_coverage"][BLOOM_TABLE] == [1, 1]


def test_eval_contamination_per_doc_verdicts(spark, tmp_path):
    """The job-level serve (cli decon-check): per-eval-doc verdicts
    from stored rows — planted overlap flags, clean doc doesn't,
    null-text doc comes back with zero grams instead of crashing."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        eval_contamination,
    )

    root = str(tmp_path / "sig")
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    assert eval_contamination(spark, root, train) is None  # pre-facet
    ingest_signature_batch(spark, train, root, "day1")
    ev = spark.createDataFrame(
        [
            (100, "quick brown fox jumps somewhere else"),
            (101, "totally unrelated evaluation sentence nothing shared"),
            (102, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_maybe_contaminated"], r["contaminated"])
        for r in eval_contamination(spark, root, ev).collect()
    }
    assert got[100] == (3, 1, True)
    assert got[101][2] is False and got[101][0] > 0
    assert got[102] == (0, 0, False)


def test_duplicate_candidates_cannot_fake_a_false_negative(spark, tmp_path):
    """ADVICE r11: bloom_maybe_contains decides sum(hit) == count(*),
    not == k, so a caller passing the SAME present key twice (2k probe
    rows, all hits) still reads true — duplicates can never manufacture
    a false negative, which would silently break the no-false-negative
    law the decontamination serve advertises."""
    root = str(tmp_path / "sig")
    train = _docs(spark, 0, 5)
    ingest_signature_batch(spark, train, root, "day1")
    bloom = read_corpus_bloom(spark, root)

    one = batch_gram4_stream(train).select("gram").distinct().limit(1)
    dup = one.unionAll(one).unionAll(one)  # the same key, three times
    got = bloom_maybe_contains(dup, bloom, "gram").collect()
    assert len(got) == 1 and got[0]["maybe_present"] is True

    # absent keys stay false under duplication too
    miss = spark.createDataFrame(
        [("zz never ingested gram",)] * 3, "gram string"
    )
    got = bloom_maybe_contains(miss, bloom, "gram").collect()
    assert len(got) == 1 and got[0]["maybe_present"] is False


def test_eval_contamination_excludes_named_batches(spark, tmp_path):
    """ADVICE r11 (DAG ordering): with exclude=(own batch,), a drop
    admitted BEFORE its decon check measures overlap with the PRIOR
    corpus only — day 1 alone yields no filter at all (None), and a
    day-2 doc flags iff it overlaps day 1, never merely itself."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        eval_contamination,
    )

    root = str(tmp_path / "sig")
    day1 = _docs(spark, 0, 10)
    ingest_signature_batch(spark, day1, root, "day1")
    # the sole batch excluded -> pre-facet view -> None
    assert eval_contamination(spark, root, day1, exclude=("day1",)) is None

    day2 = day1.limit(1).unionAll(_docs(spark, 50, 54, salt="fresh"))
    ingest_signature_batch(spark, day2, root, "day2")
    got = {
        r["doc_id"]: r["contaminated"]
        for r in eval_contamination(
            spark, root, day2, exclude=("day2",)
        ).collect()
    }
    assert got[0] is True  # the day-1 copy
    assert all(not got[i] for i in range(50, 54))  # the fresh docs
