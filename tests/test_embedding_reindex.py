"""Quantizer migration for the embedding-index lake
(jobs/embedding_index_lake.py::reindex_embedding_index — catalog s12):
the reindexed root must hold exactly the rank-1 assignments of the old
root's survivors under the NEW quantizer (never re-scored admissions),
carry the members/admissions audit and the retired ledger forward,
resume after a mid-backfill crash without retraining, and behave — for
future admissions — exactly like an index built from scratch under the
new centroids (the d9 proof style)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
    compact_embedding_index,
    ingest_embedding_batch,
    init_embedding_index,
    read_centroids,
    reindex_embedding_index,
)
from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
    read_committed,
    retired_batches,
)
from pokemon_showdown_airflow_etl_spark.operators import similarity

THR = 0.95

# old quantizer: the first three axes; new quantizer: rotated/merged
# geometry that moves most vectors to a different cell
OLD_AXES = [(1, [1.0, 0, 0, 0]), (2, [0, 1.0, 0, 0]), (3, [0, 0, 1.0, 0])]
NEW_AXES = [
    (10, [0.7, 0.7, 0, 0]),
    (11, [0, 0, 1.0, 0.2]),
    (12, [0, 0, 0, 1.0]),
]

B1 = [
    (0, [1.0, 0.01, 0, 0]),
    (1, [1.0, 0.012, 0, 0]),  # ~0 -> dup_in_batch
    (2, [0, 0.02, 1.0, 0]),
]
B2 = [
    (10, [1.0, 0.011, 0, 0]),  # ~registered 0 -> dup_of_corpus
    (11, [0, 1.0, 0.01, 0]),   # fresh
]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def _cents(spark, rows):
    return spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in rows],
        "cell_id long, centroid array<double>",
    )


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _build_old(spark, root) -> None:
    init_embedding_index(
        spark, _cents(spark, OLD_AXES).select(
            F.col("cell_id").alias("vec_id"), F.col("centroid").alias("embedding")
        ), root, n_cells=3, train=False,
    )
    ingest_embedding_batch(spark, _emb(spark, B1), root, "b1", threshold=THR)
    ingest_embedding_batch(spark, _emb(spark, B2), root, "b2", threshold=THR)


def test_reindex_assignments_audit_and_old_root_untouched(spark, tmp_path):
    old, new = str(tmp_path / "v0"), str(tmp_path / "v1")
    _build_old(spark, old)
    before = _rows(
        read_committed(spark, old, "assignments"), "vec_id", "cell_id"
    )

    st = reindex_embedding_index(
        spark, old, new, centroids=_cents(spark, NEW_AXES)
    )
    assert st["n_batches_total"] == 2 and st["n_batches_migrated"] == 2
    assert st["n_batches_already_done"] == 0 and not st["resumed"]
    assert st["n_cells"] == 3

    # survivors: b1 accepted {0, 2}; b2 accepted {11} (10 is dup of 0)
    new_asg = read_committed(spark, new, "assignments")
    assert {r["vec_id"] for r in new_asg.collect()} == {0, 2, 11}
    assert st["n_vectors_reindexed"] == 3

    # the reindexed rows are EXACTLY assign_cells(survivors, new_cents, 1)
    survivors = _emb(spark, [r for r in B1 + B2 if r[0] in (0, 2, 11)])
    expect = similarity.assign_cells(
        survivors, _cents(spark, NEW_AXES), 1
    ).select("vec_id", "v", "cell_id")
    assert _rows(new_asg, "vec_id", "cell_id") == _rows(
        expect, "vec_id", "cell_id"
    )
    assert _rows(new_asg.select("vec_id", F.col("v").cast("string").alias("s")), "vec_id", "s") == _rows(
        expect.select("vec_id", F.col("v").cast("string").alias("s")), "vec_id", "s"
    )
    # the audit moved verbatim
    assert _rows(
        read_committed(spark, new, "members"), "vec"
    ) == _rows(read_committed(spark, old, "members"), "vec")
    assert _rows(
        spark.read.parquet(new + "/admissions"), "vec", "status"
    ) == _rows(spark.read.parquet(old + "/admissions"), "vec", "status")
    # the old root still serves, byte-for-byte
    assert _rows(
        read_committed(spark, old, "assignments"), "vec_id", "cell_id"
    ) == before
    # the audit count: everything moved cells under the rotated quantizer
    assert 0 < st["n_cell_changed"] <= 3

    # idempotent full re-run: nothing to do
    st2 = reindex_embedding_index(
        spark, old, new, centroids=_cents(spark, NEW_AXES)
    )
    assert st2["n_batches_migrated"] == 0
    assert st2["n_batches_already_done"] == 2 and st2["resumed"]


def test_reindexed_equals_from_scratch_for_future_admissions(spark, tmp_path):
    """The d9-style behavioral proof: an index REINDEXED under new
    centroids and an index BUILT from scratch under those centroids
    (same survivor corpus, bulk-loaded with an accept-everything
    threshold) make identical admission decisions on the next drop."""
    old, new, scratch = (
        str(tmp_path / "v0"), str(tmp_path / "v1"), str(tmp_path / "ref")
    )
    _build_old(spark, old)
    reindex_embedding_index(spark, old, new, centroids=_cents(spark, NEW_AXES))

    survivors = _emb(spark, [r for r in B1 + B2 if r[0] in (0, 2, 11)])
    init_embedding_index(
        spark,
        _cents(spark, NEW_AXES).select(
            F.col("cell_id").alias("vec_id"), F.col("centroid").alias("embedding")
        ),
        scratch, n_cells=3, train=False,
    )
    # threshold > 1.0: cosine can never reach it, the bulk load accepts all
    ingest_embedding_batch(spark, survivors, scratch, "bulk", threshold=2.0)

    probe = [
        (100, [1.0, 0.013, 0, 0]),   # ~survivor 0 -> dup_of_corpus
        (101, [0.5, 0.5, 0.5, 1.0]), # far -> accepted
        (102, [0, 1.0, 0.012, 0]),   # ~survivor 11 -> dup_of_corpus
        (103, [0.9, 0.1, 0.9, 0.1]),
        (104, [0.9, 0.11, 0.9, 0.1]),  # ~103 -> dup_in_batch
    ]
    got = {}
    for root in (new, scratch):
        s = ingest_embedding_batch(
            spark, _emb(spark, probe), root, "probe", threshold=THR
        )
        dec = _rows(
            spark.read.parquet(root + "/admissions/batch=probe"),
            "vec", "n_corpus_dups", "first_corpus_dup", "status",
        )
        got[root] = (s, dec)
    assert got[new] == got[scratch]
    # and the decisions are non-trivial (real mix)
    statuses = {d[3] for d in got[new][1]}
    assert statuses == {"accepted", "dup_of_corpus", "dup_in_batch"}


def test_reindex_resumes_after_crash_without_retraining(
    spark, tmp_path, monkeypatch
):
    """Inject a crash after the first batch's commit marker lands (the
    re-assignment itself is now ONE job over all pending batches, so
    the per-batch crash window is the marker-copy phase): the resume
    must (a) reuse the committed new centroids — NEVER retrain, which
    would mix quantizers across resumed batches — and (b) finish only
    the marker-less batch, converging to the uninterrupted result."""
    import os as _os

    from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as el

    old, new, ref = (
        str(tmp_path / "v0"), str(tmp_path / "v1"), str(tmp_path / "ref")
    )
    _build_old(spark, old)

    real = el._copy_dir_marker_last

    def crashy(src, dst):
        if dst.replace(_os.sep, "/").endswith("/members/batch=b2"):
            raise OSError("injected crash mid-backfill")
        return real(src, dst)

    monkeypatch.setattr(el, "_copy_dir_marker_last", crashy)
    with pytest.raises(OSError, match="injected"):
        reindex_embedding_index(spark, old, new, n_cells=3, train=True)
    monkeypatch.setattr(el, "_copy_dir_marker_last", real)

    # crash state: centroids committed, b1 committed, b2 absent
    assert read_centroids(spark, new).count() == 3
    committed = {r["vec_id"] for r in read_committed(spark, new, "assignments").collect()}
    assert committed == {0, 2}

    st = reindex_embedding_index(spark, old, new, n_cells=3, train=True)
    assert st["resumed"] and st["n_train_iters"] == 0
    assert st["n_batches_migrated"] == 1 and st["n_batches_already_done"] == 1

    # uninterrupted twin under the SAME centroids (the committed ones)
    reindex_embedding_index(
        spark, old, ref,
        centroids=read_centroids(spark, new).select("cell_id", "centroid"),
    )
    assert _rows(
        read_committed(spark, new, "assignments"), "vec_id", "cell_id"
    ) == _rows(read_committed(spark, ref, "assignments"), "vec_id", "cell_id")


def test_reindex_guards(spark, tmp_path):
    old, new = str(tmp_path / "v0"), str(tmp_path / "v1")
    with pytest.raises(FileNotFoundError, match="init_embedding_index"):
        reindex_embedding_index(spark, old, new)
    _build_old(spark, old)
    with pytest.raises(ValueError, match="NEW root"):
        reindex_embedding_index(spark, old, old)
    reindex_embedding_index(spark, old, new, centroids=_cents(spark, NEW_AXES))
    # a resumed migration must continue under the committed quantizer
    with pytest.raises(ValueError, match="resume mismatch"):
        reindex_embedding_index(
            spark, old, new, centroids=_cents(spark, NEW_AXES[:2])
        )
    # empty old index (no committed batches) can only migrate with
    # explicit centroids — there is nothing to train on
    empty_old, empty_new = str(tmp_path / "e0"), str(tmp_path / "e1")
    init_embedding_index(
        spark,
        _cents(spark, OLD_AXES).select(
            F.col("cell_id").alias("vec_id"), F.col("centroid").alias("embedding")
        ),
        empty_old, n_cells=3, train=False,
    )
    with pytest.raises(ValueError, match="no committed assignments"):
        reindex_embedding_index(spark, empty_old, empty_new, train=True)
    st = reindex_embedding_index(
        spark, empty_old, empty_new, centroids=_cents(spark, NEW_AXES)
    )
    assert st["n_batches_total"] == 0 and st["n_vectors_reindexed"] == 0
    assert read_centroids(spark, empty_new).count() == 3


def test_reindex_carries_retired_ledger_and_audit(spark, tmp_path):
    """Compaction at the old root retires b1/b2; the migration must
    carry the ledger (so those ids stay unusable at the new root) AND
    their surviving admissions audit dirs."""
    import os

    old, new = str(tmp_path / "v0"), str(tmp_path / "v1")
    _build_old(spark, old)
    compact_embedding_index(spark, old, min_batches=2)
    assert set(retired_batches(old)) == {"b1", "b2"}

    st = reindex_embedding_index(
        spark, old, new, centroids=_cents(spark, NEW_AXES)
    )
    # one committed batch now: the consolidated one
    assert st["n_batches_total"] == 1 and st["n_vectors_reindexed"] == 3
    assert set(retired_batches(new)) == {"b1", "b2"}
    with pytest.raises(ValueError, match="retired"):
        ingest_embedding_batch(
            spark, _emb(spark, [(200, [1.0, 0, 0, 0])]), new, "b1", threshold=THR
        )
    # the retired batches' admission audits moved too
    for b in ("b1", "b2"):
        assert os.path.exists(
            os.path.join(new, "admissions", f"batch={b}", "_SUCCESS")
        )


def test_reindex_many_batches_in_constant_spark_jobs(spark, tmp_path):
    """20 committed batches migrate in O(1) Spark jobs (VERDICT r7
    item 5): the re-assignment is ONE multi-path read + ONE
    dynamic-partition-overwrite write over all pending batches, and
    the members/admissions carry is marker-last file copies — so the
    job count must not grow with the ledger. The per-batch loop this
    replaced cost ~3 driver-serialized jobs per batch (footer read,
    assignment write, members write): >= 60 here."""
    old, new = str(tmp_path / "v0"), str(tmp_path / "v1")
    dim = 32

    def basis(k):
        return [1.0 if j == k else 0.0 for j in range(dim)]

    def emb32(rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    init_embedding_index(
        spark, emb32([(0, basis(0)), (1, basis(1))]), old, n_cells=2, train=False
    )
    for b in range(20):
        ingest_embedding_batch(
            spark, emb32([(100 + b, basis(2 + b))]), old, f"d{b}", threshold=THR
        )

    sc = spark.sparkContext
    sc.setJobGroup("reindex-jobcount", "reindex 20 batches")
    try:
        st = reindex_embedding_index(
            spark, old, new,
            centroids=_cents(spark, [(50, basis(1)), (51, basis(2))]),
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert st["n_batches_migrated"] == 20
    assert st["n_vectors_reindexed"] == 20

    n_jobs = len(sc.statusTracker().getJobIdsForGroup("reindex-jobcount"))
    # measured 16 (writes + counts + AQE stages); 25 leaves AQE headroom
    # while staying far under the per-batch regime's >= 60
    assert n_jobs <= 25, f"reindex of 20 batches ran {n_jobs} Spark jobs"

    # every batch came back committed and readable
    assert {
        r["vec_id"]
        for r in read_committed(spark, new, "assignments").collect()
    } == {100 + b for b in range(20)}


def test_drift_gauge_triggers_refresh_only_past_threshold(spark, tmp_path):
    """The composition the a9 facet exists for: the stored baseline
    (train_stats/, committed at init) vs the stored estats facet gives
    a per-dim z gauge with no vector scan; refresh_if_drifted is a
    no-op below the threshold and runs the s12 migration above it —
    carrying the estats facet forward and refreshing the baseline so
    the NEW root reads as un-drifted."""
    import random

    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        quantizer_drift,
        read_index_estats,
        read_train_stats,
        refresh_if_drifted,
    )

    rng = random.Random(11)
    seed_rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    emb = spark.createDataFrame(
        seed_rows, "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    assert read_train_stats(spark, root) is not None

    # ingest the seed itself: served stats == baseline, z == 0
    ingest_embedding_batch(spark, emb, root, "d1", threshold=2.0)
    z0 = max(r["z_milli"] for r in quantizer_drift(spark, root).collect())
    assert z0 <= 5  # milli rounding only
    st = refresh_if_drifted(
        spark, root, str(tmp_path / "never"), z_threshold_milli=500
    )
    assert st == {
        "refreshed": False,
        "has_drift_signal": True,
        "max_z_milli": z0,
        "z_threshold_milli": 500,
    }

    # a drop shifted +3.0 along dim 2: the corpus mean migrates ~1.5,
    # the baseline std is ~0.58 -> z far past any sane threshold
    drop = spark.createDataFrame(
        [
            (100 + i, [x + (3.0 if d == 2 else 0.0) for d, x in enumerate(v)])
            for i, (_, v) in enumerate(seed_rows)
        ],
        "vec_id long, embedding array<double>",
    )
    ingest_embedding_batch(spark, drop, root, "d2", threshold=2.0)
    drift = {r["d"]: r["z_milli"] for r in quantizer_drift(spark, root).collect()}
    assert drift[2] > 1000
    assert all(z <= 5 for d, z in drift.items() if d != 2)

    new_root = str(tmp_path / "idx2")
    st2 = refresh_if_drifted(spark, root, new_root, z_threshold_milli=500)
    assert st2["refreshed"] is True
    assert st2["max_z_milli"] == drift[2]
    assert st2["n_vectors_reindexed"] == 100
    # the new root serves: retrained centroids, migrated estats facet,
    # and a REFRESHED baseline under which the corpus is un-drifted
    assert read_centroids(spark, new_root).count() > 0
    assert read_index_estats(spark, new_root) is not None
    z_new = max(
        r["z_milli"] for r in quantizer_drift(spark, new_root).collect()
    )
    assert z_new <= 5


def test_refresh_says_why_when_it_cannot_judge(spark, tmp_path):
    import shutil

    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        TRAIN_STATS_TABLE,
        quantizer_drift,
        refresh_if_drifted,
    )

    emb = _emb(spark, OLD_AXES)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=3, train=False)
    # facet-less corpus: baseline exists but no estats to compare
    ingest_embedding_batch(
        spark, _emb(spark, B1), root, "d1", threshold=2.0, facets=False
    )
    assert quantizer_drift(spark, root) is None
    st = refresh_if_drifted(spark, root, str(tmp_path / "n1"))
    assert st["refreshed"] is False and st["has_drift_signal"] is False
    # pre-baseline root (built before train_stats existed)
    ingest_embedding_batch(spark, _emb(spark, B2), root, "d2", threshold=2.0)
    shutil.rmtree(f"{root}/{TRAIN_STATS_TABLE}")
    assert quantizer_drift(spark, root) is None
    st = refresh_if_drifted(spark, root, str(tmp_path / "n2"))
    assert st["refreshed"] is False and st["has_drift_signal"] is False
