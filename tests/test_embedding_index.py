"""Incremental semantic admission (operators/similarity.py::
embed_admit_batch — catalog s11) and the persisted embedding index
(jobs/embedding_index_lake.py): admission semantics on planted
geometry, full-probe equivalence with the exact pairwise decision, the
n_probe recall contract, and the lake's commit-marker protocol
(sequential == one-shot, idempotency, immutability, phantom
invisibility)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators import similarity

DIM = 4
THR = 0.95


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


AXES = [(1, [1.0, 0, 0, 0]), (2, [0, 1.0, 0, 0]), (3, [0, 0, 1.0, 0])]

CORPUS = [
    (0, [1.0, 0.01, 0, 0]),   # cell 1
    (1, [0.01, 1.0, 0, 0]),   # cell 2
    (2, [0, 0.02, 1.0, 0]),   # cell 3
]

BATCH = [
    (100, [1.0, 0.012, 0, 0]),   # ~corpus 0 -> dup_of_corpus
    (101, [0.011, 1.0, 0, 0]),   # ~corpus 1 -> dup_of_corpus
    (102, [0.5, 0.5, 0.5, 1.0]), # far from everything -> accepted
    (103, [0.7, 0.7, 0.1, 0]),   # novel pair straddling cells 1/2
    (104, [0.7, 0.69, 0.1, 0]),  # ~103 -> dup_in_batch (min-id-wins)
    (105, [1.0, 0.013, 0, 0]),   # ~corpus 0 AND ~100/104-style batch
                                 # partners -> corpus wins
]


def _admit(spark, batch, corpus, n_probe, threshold=THR):
    cents = _cents(spark, AXES)
    members = similarity.assign_cells(_emb(spark, corpus), cents, 1)
    return {
        r["vec"]: (r["n_corpus_dups"], r["first_corpus_dup"], r["status"])
        for r in similarity.embed_admit_batch(
            _emb(spark, batch), members, cents, threshold=threshold, n_probe=n_probe
        ).collect()
    }


def test_admission_statuses_on_planted_geometry(spark):
    got = _admit(spark, BATCH, CORPUS, n_probe=2)
    assert got[100] == (1, 0, "dup_of_corpus")
    assert got[101] == (1, 1, "dup_of_corpus")
    assert got[102] == (0, None, "accepted")
    assert got[103] == (0, None, "accepted")
    assert got[104] == (0, None, "dup_in_batch")
    # corpus identity beats the within-batch pair (100 ~ 105 too)
    assert got[105] == (1, 0, "dup_of_corpus")


def _exact_decision(batch, corpus, threshold):
    """From-scratch pairwise reference (no cells): what full probing
    must reproduce."""
    def unit(v):
        a = np.asarray(v, dtype=np.float64)
        return a / np.linalg.norm(a)

    want = {}
    losers = set()
    for i, vi in batch:
        for j, vj in batch:
            if j < i and round(float(unit(vi) @ unit(vj)), 6) >= threshold:
                losers.add(i)
    for i, vi in batch:
        dups = [
            j
            for j, vj in corpus
            if round(float(unit(vi) @ unit(vj)), 6) >= threshold
        ]
        if dups:
            want[i] = (len(dups), min(dups), "dup_of_corpus")
        elif i in losers:
            want[i] = (0, None, "dup_in_batch")
        else:
            want[i] = (0, None, "accepted")
    return want


def test_full_probe_equals_exact_pairwise(spark):
    """n_probe == n_cells probes every cell: candidates = whole corpus
    and every batch pair meets, so the ANN decision must equal the
    exact pairwise decision — on the planted set AND on a seeded
    random set (where cell geometry is arbitrary)."""
    got = _admit(spark, BATCH, CORPUS, n_probe=len(AXES))
    assert got == _exact_decision(BATCH, CORPUS, THR)

    rng = np.random.default_rng(7)
    corpus = [(i, rng.normal(size=DIM).tolist()) for i in range(12)]
    batch = [(100 + i, rng.normal(size=DIM).tolist()) for i in range(8)]
    # a couple of planted dups so the check is not all-accepted
    batch[3] = (103, (np.asarray(corpus[5][1]) * 2.0).tolist())
    batch[6] = (106, (np.asarray(batch[2][1]) * 0.5).tolist())
    got = _admit(spark, batch, corpus, n_probe=len(AXES), threshold=0.9)
    assert got == _exact_decision(batch, corpus, 0.9)
    assert got[103][2] == "dup_of_corpus" and got[106][2] == "dup_in_batch"


def test_n_probe_recall_contract(spark):
    """The documented approximation: a true dup whose corpus twin is
    assigned to an unprobed cell is missed. X ranks its cells
    (1,3,2), Y ranks (2,3,1) — with n_probe=2, Y never probes X's
    rank-1 cell, so near-identical X/Y slip through; n_probe=3
    catches the pair."""
    x = (0, [0.60, 0.58, 0.59, 0])
    y = (100, [0.58, 0.60, 0.59, 0])
    cos = round(
        float(
            np.asarray(x[1]) @ np.asarray(y[1])
            / (np.linalg.norm(x[1]) * np.linalg.norm(y[1]))
        ),
        6,
    )
    assert cos >= THR, "fixture drifted: the pair is no longer a near-dup"
    got2 = _admit(spark, [y], [x], n_probe=2)
    assert got2[100] == (0, None, "accepted")  # missed — by contract
    got3 = _admit(spark, [y], [x], n_probe=3)
    assert got3[100] == (1, 0, "dup_of_corpus")


def test_empty_corpus_and_empty_batch(spark):
    cents = _cents(spark, AXES)
    empty = _emb(spark, [])
    members_empty = similarity.assign_cells(empty, cents, 1)
    got = {
        r["vec"]: r["status"]
        for r in similarity.embed_admit_batch(
            _emb(spark, BATCH), members_empty, cents, threshold=THR, n_probe=2
        ).collect()
    }
    # pure within-batch dedup: min id of each near-dup group wins
    assert got[100] == "accepted"
    assert got[105] == "dup_in_batch"  # loses to 100 now
    assert got[104] == "dup_in_batch"
    assert (
        similarity.embed_admit_batch(
            empty,
            similarity.assign_cells(_emb(spark, CORPUS), cents, 1),
            cents,
            threshold=THR,
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# The persisted index + live ingest protocol
# ---------------------------------------------------------------------------


def test_ingest_embedding_batches_sequential_equals_one_shot(spark, tmp_path):
    """Admitting drop-1 then drop-2 against the index registers the
    same survivor set as admitting their union as one batch (clean dup
    groups — the regime where pairwise min-id-wins and
    dedup-against-survivors coincide, same scope note as the signature
    twin), and a completed batch re-run is a no-op."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        ingest_embedding_batch,
        init_embedding_index,
    )

    b1 = [
        (0, [1.0, 0.01, 0, 0]),
        (1, [1.0, 0.012, 0, 0]),  # ~0 -> dup_in_batch
        (2, [0, 0.02, 1.0, 0]),
    ]
    b2 = [
        (10, [1.0, 0.011, 0, 0]),  # ~registered 0 -> dup_of_corpus
        (11, [0, 1.0, 0.01, 0]),   # fresh
    ]

    def survivors(root):
        adm = spark.read.parquet(root + "/admissions")
        return {
            r["vec"] for r in adm.filter(F.col("status") == "accepted").collect()
        }

    seed = _emb(spark, b1 + b2)

    root_a = str(tmp_path / "seq")
    init_embedding_index(spark, seed, root_a, n_cells=3, train=False)
    s1 = ingest_embedding_batch(spark, _emb(spark, b1), root_a, "b1", threshold=THR)
    assert s1 == {
        "n_batch": 3,
        "n_already_registered": 0,
        "n_considered": 3,
        "n_accepted": 2,
        "n_dup_of_corpus": 0,
        "n_dup_in_batch": 1,
    }
    s2 = ingest_embedding_batch(spark, _emb(spark, b2), root_a, "b2", threshold=THR)
    assert s2["n_dup_of_corpus"] == 1 and s2["n_accepted"] == 1

    root_b = str(tmp_path / "oneshot")
    init_embedding_index(spark, seed, root_b, n_cells=3, train=False)
    ingest_embedding_batch(
        spark, _emb(spark, b1 + b2), root_b, "all", threshold=THR
    )
    assert survivors(root_a) == survivors(root_b) == {0, 2, 11}

    # idempotency: completed re-run decides nothing
    s3 = ingest_embedding_batch(spark, _emb(spark, b2), root_a, "b2", threshold=THR)
    assert s3["n_already_registered"] == 2 and s3["n_considered"] == 0
    assert survivors(root_a) == {0, 2, 11}
    # only accepted vectors hold assignment rows
    asg = {
        r["vec_id"]
        for r in spark.read.parquet(root_a + "/assignments").select("vec_id").collect()
    }
    assert asg == {0, 2, 11}


def test_embedding_commit_protocol_guards(spark, tmp_path):
    """(a) committed batches are immutable; (b) a crashed batch's
    phantom assignments (no members marker) are invisible — vectors
    must not be rejected against never-registered survivors; (c) an
    uninitialized root fails loudly."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        ingest_embedding_batch,
        init_embedding_index,
        read_centroids,
    )
    from pokemon_showdown_airflow_etl_spark.operators.similarity import assign_cells

    root = str(tmp_path / "idx")
    with pytest.raises(FileNotFoundError, match="init_embedding_index"):
        read_centroids(spark, root)
    with pytest.raises(FileNotFoundError):
        ingest_embedding_batch(
            spark, _emb(spark, BATCH), root, "b1", threshold=THR
        )

    seed = _emb(spark, CORPUS)
    st = init_embedding_index(spark, seed, root, n_cells=3, train=False)
    assert st["n_cells"] == 3 and not st["already_initialized"]
    # re-init is a guarded no-op
    st2 = init_embedding_index(spark, seed, root, n_cells=3, train=False)
    assert st2["already_initialized"]

    ingest_embedding_batch(spark, _emb(spark, CORPUS), root, "b1", threshold=THR)
    amended = _emb(spark, CORPUS + [(7, [0, 1.0, 1.0, 0])])
    with pytest.raises(ValueError, match="immutable"):
        ingest_embedding_batch(spark, amended, root, "b1", threshold=THR)

    # phantom: assignments land, members marker does not
    phantom = _emb(spark, [(50, [0, 0, 0.9, 1.0])])
    assign_cells(phantom, read_centroids(spark, root), 1).select(
        "vec_id", "v", "cell_id"
    ).write.parquet(root + "/assignments/batch=crashed")
    twin_of_phantom = _emb(spark, [(60, [0, 0, 0.9, 1.0])])
    s = ingest_embedding_batch(
        spark, twin_of_phantom, root, "b2", threshold=THR
    )
    assert s["n_accepted"] == 1 and s["n_dup_of_corpus"] == 0, (
        "vector rejected against an uncommitted phantom survivor"
    )


def test_trained_init_contract(spark):
    """train=True runs the distributed Lloyd trainer: n_cells centroid
    rows, every seed vector counted in exactly one cell (conservation),
    >= 1 iteration recorded."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        init_embedding_index,
        read_centroids,
    )
    import tempfile

    rng = np.random.default_rng(11)
    seed = _emb(
        spark, [(i, rng.normal(size=DIM).tolist()) for i in range(40)]
    )
    with tempfile.TemporaryDirectory() as d:
        st = init_embedding_index(
            spark, seed, d + "/idx", n_cells=4, max_iter=5, train=True
        )
        assert st["n_train_iters"] >= 1
        cents = read_centroids(spark, d + "/idx")
        rows = cents.collect()
        assert len(rows) == 4
        assert sum(r["n_members"] for r in rows) == 40


def test_compact_embedding_index_preserves_admission(spark, tmp_path):
    """The shared compaction machinery pointed at assignments/: after
    consolidation the index must give IDENTICAL admission decisions, no
    vector's assignment row may duplicate, and retired batch ids must
    refuse re-ingest."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        compact_embedding_index,
        ingest_embedding_batch,
        init_embedding_index,
    )

    root = str(tmp_path / "idx")
    seed = _emb(spark, CORPUS)
    init_embedding_index(spark, seed, root, n_cells=3, train=False)
    for i, (vid, v) in enumerate(CORPUS):
        ingest_embedding_batch(
            spark, _emb(spark, [(vid, v)]), root, f"day{i}", threshold=THR
        )

    st = compact_embedding_index(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 3
    committed = _committed_batches(root + "/members")
    assert len(committed) == 1 and committed[0].startswith("compact-")
    asg = [
        r["vec_id"]
        for r in spark.read.parquet(root + "/assignments").select("vec_id").collect()
    ]
    assert sorted(asg) == [0, 1, 2]  # each exactly once

    # decisions against the consolidated index are unchanged
    s = ingest_embedding_batch(
        spark,
        _emb(spark, [(200, CORPUS[0][1]), (201, [0.5, 0.5, 0.5, 1.0])]),
        root,
        "probe",
        threshold=THR,
    )
    assert s["n_dup_of_corpus"] == 1 and s["n_accepted"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="retired"):
        ingest_embedding_batch(
            spark, _emb(spark, [(300, [1.0, 1, 1, 1])]), root, "day0", threshold=THR
        )


def test_streaming_embedding_admission_matches_batch(spark, tmp_path):
    """The s11 streaming twin: draining a vector stream through
    foreachBatch admission registers exactly what sequential batch
    ingest registers, and a restarted drain over new files resumes
    from the checkpoint."""
    from pyspark.sql import functions as SF

    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        init_embedding_index,
    )
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_embedding_admission,
    )

    land = str(tmp_path / "in")
    root = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")

    init_embedding_index(
        spark, _emb(spark, CORPUS + BATCH), root, n_cells=3, train=False
    )

    c1 = [
        (0, [1.0, 0.01, 0, 0]),
        (1, [1.0, 0.012, 0, 0]),   # within-chunk dup of 0
        (2, [0, 0.02, 1.0, 0]),
    ]
    c2 = [
        (10, [1.0, 0.011, 0, 0]),  # dup of registered 0
        (11, [0, 1.0, 0.01, 0]),
    ]

    def land_chunk(rows):
        _emb(spark, rows).coalesce(1).write.mode("append").parquet(land)

    def drain():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = start_embedding_admission(stream, root, ck, threshold=THR)
        q.awaitTermination()

    land_chunk(c1)
    drain()
    land_chunk(c2)
    drain()  # restart from checkpoint

    adm = spark.read.parquet(root + "/admissions")
    got = {r["vec"]: r["status"] for r in adm.collect()}
    assert got == {
        0: "accepted",
        1: "dup_in_batch",
        2: "accepted",
        10: "dup_of_corpus",
        11: "accepted",
    }
    assert adm.count() == 5  # each vector decided exactly once
    asg = {
        r["vec_id"]
        for r in spark.read.parquet(root + "/assignments").select("vec_id").collect()
    }
    assert asg == {0, 2, 11}


def test_duplicated_batch_id_is_one_decision_not_self_rejection(spark, tmp_path):
    """A drop carrying the same vec_id twice (re-sent row in an
    at-least-once feed) must yield ONE decision and must NOT reject the
    vector against itself — the self-pair bug would mark it
    dup_in_batch with no surviving partner and lose it from the index
    forever (members/ records it as decided)."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        ingest_embedding_batch,
        init_embedding_index,
    )

    cents = _cents(spark, AXES)
    dup_batch = _emb(spark, [(100, [1.0, 0.01, 0, 0]), (100, [1.0, 0.01, 0, 0]),
                             (101, [0, 0.02, 1.0, 0])])
    members = similarity.assign_cells(_emb(spark, []), cents, 1)
    rows = similarity.embed_admit_batch(
        dup_batch, members, cents, threshold=THR, n_probe=2
    ).collect()
    got = {r["vec"]: r["status"] for r in rows}
    assert len(rows) == 2, rows  # one decision per id, not per row
    assert got == {100: "accepted", 101: "accepted"}

    # end to end: the duplicated id registers exactly one assignment row
    root = str(tmp_path / "idx")
    init_embedding_index(spark, _emb(spark, CORPUS), root, n_cells=3, train=False)
    s = ingest_embedding_batch(spark, dup_batch, root, "b1", threshold=THR)
    assert s["n_considered"] == 2 and s["n_dup_in_batch"] == 0
    asg = [
        r["vec_id"]
        for r in spark.read.parquet(root + "/assignments").select("vec_id").collect()
    ]
    assert sorted(asg) == [100, 101]  # no duplicated rows


def test_init_repairs_partial_centroids_dir(spark, tmp_path):
    """A crash mid-centroids-write leaves a dir without _SUCCESS; the
    re-run must repair it (overwrite), not fail forever on
    path-already-exists."""
    import os

    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        init_embedding_index,
        read_centroids,
    )

    root = str(tmp_path / "idx")
    d = os.path.join(root, "centroids")
    os.makedirs(d)
    with open(os.path.join(d, "part-junk.parquet"), "w") as f:
        f.write("partial garbage from a crashed init")
    st = init_embedding_index(
        spark, _emb(spark, CORPUS), root, n_cells=3, train=False
    )
    assert not st["already_initialized"]
    assert read_centroids(spark, root).count() == 3


def test_estats_facet_merges_reduces_and_serves(spark, tmp_path):
    """The embedding lake's drift facet (a9): per-batch statistics
    merged by SUM equal building from scratch on everything ingested,
    compaction reduces them to one partition without changing the
    merge, and facets=False batches degrade coverage gracefully."""
    import os

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        ESTATS_TABLE,
        facet_coverage,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        batch_embedding_stats_rows,
        compact_embedding_index,
        ingest_embedding_batch,
        init_embedding_index,
        read_index_estats,
    )

    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb.filter("vec_id < 25"), root, "d1", threshold=2.0)
    ingest_embedding_batch(spark, emb.filter("vec_id >= 25"), root, "d2", threshold=2.0)

    def srt(df):
        return sorted(map(tuple, df.collect()))

    merged = read_index_estats(spark, root)
    assert srt(merged) == srt(batch_embedding_stats_rows(emb))
    assert merged.count() == 8  # dim rows only

    st = compact_embedding_index(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 2
    parts = [
        p for p in os.listdir(os.path.join(root, ESTATS_TABLE))
        if p.startswith("batch=")
    ]
    assert len(parts) == 1 and parts[0].startswith("batch=compact-")
    assert srt(read_index_estats(spark, root)) == srt(
        batch_embedding_stats_rows(emb)
    )

    # a facets=False batch: admission identical, coverage degrades
    more = spark.createDataFrame(
        [(100 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    st2 = ingest_embedding_batch(
        spark, more, root, "lean", threshold=2.0, facets=False
    )
    assert st2["n_accepted"] == 5
    assert facet_coverage(root, ESTATS_TABLE, data_table="assignments") == (1, 2)
    # the merged stats still serve (the faceted subset)
    assert srt(read_index_estats(spark, root)) == srt(
        batch_embedding_stats_rows(emb)
    )
