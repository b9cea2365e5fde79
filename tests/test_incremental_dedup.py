"""Incremental cross-snapshot dedup (operators/dedup.py::
dedup_against_corpus — catalog d9): admitting batch-2 against batch-1's
materialized signatures must agree with the from-scratch union
pipeline, short docs are always admitted, and corpus identity beats
within-batch identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while cold rain falls "
    "on the quiet town near the old river bank and the morning light "
    "slides across wet roofs toward the distant gray hills"
)


def _corpus_and_batch():
    corpus = [
        (0, BASE + " corpus zero"),
        (1, BASE.replace("quiet", "silent") + " corpus one"),
        (2, "completely different words about spark plans and shuffles " * 4),
    ]
    batch = [
        (120, BASE + " corpus zero"),          # exact dup of corpus 0
        (121, BASE + " corpus zero extra"),    # near-dup of 0 AND of 120
        (122, "novel text " + " ".join(f"tok{j}" for j in range(40))),
        (123, "novel text " + " ".join(f"tok{j}" for j in range(40))),  # dup of 122
        (130, "hi there"),                     # short: no signature row
        (131, "fresh " + " ".join(f"z{j}" for j in range(30))),
    ]
    return corpus, batch


def _sig(df):
    sh = dedup._shingle_df(df, "doc_id", "text", 3)
    return sh.select(
        "doc", "shingles", *dedup.minhash_signature(F.col("shingles"), 8)
    )


def _make(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_admission_equals_from_scratch(spark):
    corpus_rows, batch_rows = _corpus_and_batch()
    corpus, batch = _make(spark, corpus_rows), _make(spark, batch_rows)
    new_ids = batch.select(F.col("doc_id").alias("doc"))

    got = {
        r["doc"]: (r["n_corpus_dups"], r["first_corpus_dup"], r["status"])
        for r in dedup.dedup_against_corpus(
            new_ids, _sig(batch), _sig(corpus)
        ).collect()
    }

    # from-scratch reference: the SAME LSH+verify pipeline over the
    # union; expected statuses derive from which side each pair spans
    union_pairs = dedup.lsh_verified_dups(
        corpus.unionByName(batch), "doc_id", "text", n=3, threshold=0.8
    ).collect()
    corpus_ids = {r[0] for r in corpus_rows}
    cdups: dict[int, list[int]] = {}
    batch_losers: set[int] = set()
    for r in union_pairs:
        a, b = r["doc_a"], r["doc_b"]  # a < b by construction
        if a in corpus_ids and b not in corpus_ids:
            cdups.setdefault(b, []).append(a)
        elif a not in corpus_ids and b not in corpus_ids:
            batch_losers.add(b)
    want = {}
    for doc_id, _ in batch_rows:
        if doc_id in cdups:
            want[doc_id] = (
                len(cdups[doc_id]),
                min(cdups[doc_id]),
                "dup_of_corpus",
            )
        elif doc_id in batch_losers:
            want[doc_id] = (0, None, "dup_in_batch")
        else:
            want[doc_id] = (0, None, "accepted")
    assert got == want

    # the planted structure itself (so the test can't pass vacuously):
    # 120/121 lose to corpus 0; 123 loses within-batch to 122; the
    # short doc and the unique docs are admitted
    assert got[120][2] == got[121][2] == "dup_of_corpus"
    assert got[120][1] == got[121][1] == 0
    assert got[123] == (0, None, "dup_in_batch")
    assert got[122][2] == got[130][2] == got[131][2] == "accepted"


def test_corpus_identity_beats_batch_identity(spark):
    # 120 and 121 are near-dups of EACH OTHER too — the within-batch
    # pair must not demote them to dup_in_batch when the corpus match
    # exists (re-running a batch against a corpus that already absorbed
    # one of them must give the same drop decision)
    corpus_rows, batch_rows = _corpus_and_batch()
    corpus, batch = _make(spark, corpus_rows), _make(spark, batch_rows)
    pairs_in_batch = dedup.lsh_verified_dups(
        batch, "doc_id", "text", n=3, threshold=0.8
    ).collect()
    assert any({r["doc_a"], r["doc_b"]} == {120, 121} for r in pairs_in_batch)
    got = {
        r["doc"]: r["status"]
        for r in dedup.dedup_against_corpus(
            batch.select(F.col("doc_id").alias("doc")), _sig(batch), _sig(corpus)
        ).collect()
    }
    assert got[121] == "dup_of_corpus"


def test_empty_batch_and_empty_corpus(spark):
    corpus_rows, batch_rows = _corpus_and_batch()
    corpus, batch = _make(spark, corpus_rows), _make(spark, batch_rows)
    empty = _make(spark, []).limit(0)
    # empty batch -> empty result
    assert (
        dedup.dedup_against_corpus(
            empty.select(F.col("doc_id").alias("doc")), _sig(empty), _sig(corpus)
        ).count()
        == 0
    )
    # empty corpus -> pure within-batch dedup
    got = {
        r["doc"]: r["status"]
        for r in dedup.dedup_against_corpus(
            batch.select(F.col("doc_id").alias("doc")), _sig(batch), _sig(empty)
        ).collect()
    }
    assert got[120] == "accepted"  # min id of its batch group wins now
    assert got[121] == "dup_in_batch"
    assert got[123] == "dup_in_batch"


def test_ingest_signature_batches_sequential_equals_one_shot(spark, tmp_path):
    """The live-corpus ingest (jobs/doc_signature_lake.py::
    ingest_signature_batch): admitting batch1 then batch2 registers
    the same survivor set as admitting their union as one batch, and a
    re-run of a completed batch is a no-op. Scope note: this fixture's
    dup groups are CLEAN (no similarity chains), which is exactly the
    regime where pairwise min-id-wins and dedup-against-survivors
    coincide — on chains the two semantics differ BY DESIGN (batch
    granularity is part of the semantic; see dedup_against_corpus's
    docstring), so sequential==one-shot is not asserted for chains."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        ingest_signature_batch,
    )

    def doc(i, tail):
        return (i, BASE + " " + tail)

    b1 = [
        doc(0, "alpha"),
        doc(1, "alpha"),
        (2, "entirely different corpus " + " ".join(f"q{j}" for j in range(30))),
    ]
    b2 = [
        doc(10, "alpha"),
        (11, "fresh material only " + " ".join(f"y{j}" for j in range(30))),
        (12, "tiny"),
    ]
    df1, df2 = _make(spark, [(i, t) for i, t in b1]), _make(
        spark, [(i, t) for i, t in b2]
    )

    root_a = str(tmp_path / "seq")
    s1 = ingest_signature_batch(spark, df1, root_a, "b1")
    assert s1 == {
        "n_batch": 3,
        "n_already_registered": 0,
        "n_considered": 3,
        "n_accepted": 2,  # 0 and 2; 1 loses to 0 within-batch
        "n_dup_of_corpus": 0,
        "n_dup_in_batch": 1,
    }
    s2 = ingest_signature_batch(spark, df2, root_a, "b2")
    assert s2["n_accepted"] == 2  # 11 and the short doc 12
    assert s2["n_dup_of_corpus"] == 1  # 10 matches registered 0
    def survivors(root):
        adm = spark.read.parquet(root + "/admissions")
        return {
            r["doc"]
            for r in adm.filter(F.col("status") == "accepted").collect()
        }

    seq_members = survivors(root_a)

    root_b = str(tmp_path / "oneshot")
    ingest_signature_batch(spark, df1.unionByName(df2), root_b, "all")
    one_members = survivors(root_b)
    assert seq_members == one_members == {0, 2, 11, 12}

    # idempotency: a completed batch re-run changes nothing
    s3 = ingest_signature_batch(spark, df2, root_a, "b2")
    assert s3["n_already_registered"] == 3 and s3["n_accepted"] == 0
    assert survivors(root_a) == seq_members
    # only accepted docs' signatures are in the corpus (short doc 12
    # is a member but has no signature row)
    sig_docs = {
        r["doc"]
        for r in spark.read.parquet(root_a + "/signatures").select("doc").collect()
    }
    assert sig_docs == {0, 2, 11}


def test_streaming_admission_matches_batch_ingest(spark, tmp_path):
    """The d9 streaming twin (streaming/admission.py): draining a doc
    stream through foreachBatch admission must register exactly the
    survivors the sequential batch ingests register, and a second drain
    over new files resumes from the checkpoint (already-admitted docs
    rejected, completed epochs not re-decided)."""
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_document_admission,
    )

    land = str(tmp_path / "in")
    root = str(tmp_path / "sig")
    ck = str(tmp_path / "ck")

    c1 = [
        (0, BASE + " alpha"),
        (1, BASE + " alpha"),  # within-chunk dup of 0
        (2, "separate subject " + " ".join(f"q{j}" for j in range(30))),
    ]
    c2 = [
        (10, BASE + " alpha"),  # dup of registered 0
        (11, "new stuff " + " ".join(f"y{j}" for j in range(30))),
    ]

    def land_chunk(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(land)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = start_document_admission(stream, root, ck)
        q.awaitTermination()

    land_chunk(c1)
    drain()
    land_chunk(c2)
    drain()  # restart from checkpoint

    adm = spark.read.parquet(root + "/admissions")
    got = {r["doc"]: r["status"] for r in adm.collect()}
    assert got == {
        0: "accepted",
        1: "dup_in_batch",
        2: "accepted",
        10: "dup_of_corpus",
        11: "accepted",
    }
    # every decided doc appears exactly once across all epochs
    assert adm.count() == 5
    sig_docs = {
        r["doc"]
        for r in spark.read.parquet(root + "/signatures").select("doc").collect()
    }
    assert sig_docs == {0, 2, 11}


def test_ingest_commit_protocol_guards(spark, tmp_path):
    """File-level transaction protocol: (a) a committed batch is
    immutable — re-running its id with extra docs raises instead of
    silently unregistering the originally decided docs; (b) a crashed
    OTHER batch's partial signatures (no members/ marker) are invisible
    to later batches — docs must never be rejected against phantom
    survivors that were themselves never registered."""
    import pytest as _pytest

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        compute_signatures,
        ingest_signature_batch,
    )

    root = str(tmp_path / "sig")
    df1 = _make(spark, [(0, BASE + " alpha"), (2, "other " * 20)])
    ingest_signature_batch(spark, df1, root, "b1")

    # (a) amended re-run of the committed id
    amended = _make(spark, [(0, BASE + " alpha"), (3, "brand new " * 15)])
    with _pytest.raises(ValueError, match="immutable"):
        ingest_signature_batch(spark, amended, root, "b1")
    # same-content re-run stays a no-op
    s = ingest_signature_batch(spark, df1, root, "b1")
    assert s["n_already_registered"] == 2 and s["n_considered"] == 0

    # (b) phantom partition: signatures landed, members marker did not
    phantom = _make(spark, [(50, "phantom corpus doc " + "w " * 30)])
    compute_signatures(phantom).write.parquet(root + "/signatures/batch=crashed")
    dup_of_phantom = _make(spark, [(60, "phantom corpus doc " + "w " * 30)])
    s2 = ingest_signature_batch(spark, dup_of_phantom, root, "b2")
    assert s2["n_accepted"] == 1 and s2["n_dup_of_corpus"] == 0, (
        "doc rejected against an uncommitted phantom survivor"
    )


def test_streaming_admission_new_checkpoint_does_not_clobber(spark, tmp_path):
    """A SECOND stream (fresh checkpoint, epochs restarting at 0) over
    the same sig_root must not be mistaken for a crashed re-run of the
    first stream's epochs: its batch ids are namespaced by checkpoint,
    so it re-reads the files, finds every doc already decided, and
    changes nothing."""
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_document_admission,
    )

    land = str(tmp_path / "in")
    root = str(tmp_path / "sig")
    spark.createDataFrame(
        [(0, BASE + " alpha"), (2, "separate " * 20)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(land)

    def drain(ck):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = start_document_admission(stream, root, ck)
        q.awaitTermination()

    drain(str(tmp_path / "ck1"))
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(root + "/admissions").collect()
    )
    drain(str(tmp_path / "ck2"))  # fresh checkpoint, epoch 0 again
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(root + "/admissions").collect()
    )
    assert before == after


def test_compact_signature_corpus_preserves_admission(spark, tmp_path):
    """Small-file maintenance (compact_signature_corpus): after N daily
    batches consolidate into one partition, later batches must get the
    IDENTICAL admission decisions; a crash between the consolidated
    commit and the removals resumes to the same end state."""
    import os

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
        compact_signature_corpus,
        ingest_signature_batch,
    )

    root = str(tmp_path / "sig")
    for i in range(3):
        ingest_signature_batch(
            spark,
            _make(spark, [(i * 10, f"distinct day {i} corpus " + " ".join(f"u{i}w{j}" for j in range(30)))]),
            root,
            f"day{i}",
        )

    # below the floor: no-op
    assert compact_signature_corpus(spark, root, min_batches=8) == {
        "n_batches_consolidated": 0,
        "n_signature_rows": 0,
        "n_member_rows": 0,
    }
    st = compact_signature_corpus(spark, root, min_batches=2)
    assert st["n_batches_consolidated"] == 3
    assert st["n_signature_rows"] == 3 and st["n_member_rows"] == 3
    committed = _committed_batches(root + "/members")
    assert len(committed) == 1 and committed[0].startswith("compact-")

    # admission against the consolidated corpus: dup of day-1 doc still
    # rejected, fresh doc accepted
    s = ingest_signature_batch(
        spark,
        _make(
            spark,
            [(99, "distinct day 1 corpus " + " ".join(f"u1w{j}" for j in range(30))),
             (100, "all new " + " ".join(f"n{j}" for j in range(30)))],
        ),
        root,
        "day3",
    )
    assert s["n_dup_of_corpus"] == 1 and s["n_accepted"] == 1

    # crash simulation: consolidate day3 in, then delete only the OLD
    # partitions' nothing — emulate by re-running compaction twice; the
    # second run must be a no-op resume (same committed set), never a
    # double-consolidation that would duplicate rows
    st2 = compact_signature_corpus(spark, root, min_batches=2)
    assert st2["n_batches_consolidated"] == 2  # compact-* + day3
    sig_docs = [
        r["doc"]
        for r in spark.read.parquet(root + "/signatures").select("doc").collect()
    ]
    assert len(sig_docs) == len(set(sig_docs)) == 4  # no duplicated rows


def test_compact_resume_after_partial_removal(spark, tmp_path, monkeypatch):
    """Inject the mid-removal crash for real: members/ of an old batch
    is removed, then rmtree dies before its signatures/ dir — the state
    where the batch is no longer committed so manifest-driven resume
    cannot see it. The retired-ids ledger must let the NEXT compaction
    run sweep the orphaned signatures dir, and ingest must refuse to
    reuse the retired id (its admissions audit survives compaction)."""
    import os
    import shutil

    import pytest as _pytest

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
        compact_signature_corpus,
        ingest_signature_batch,
        retired_batches,
    )

    root = str(tmp_path / "sig")
    for i in range(2):
        ingest_signature_batch(
            spark,
            _make(spark, [(i, f"resume item {i} text " + " ".join(f"v{i}w{j}" for j in range(30)))]),
            root,
            f"d{i}",
        )

    real_rmtree = shutil.rmtree

    def crash_on_first_sig_dir(path, *a, **k):
        if "/signatures/batch=d" in path.replace(os.sep, "/"):
            raise OSError("injected crash mid-removal")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(shutil, "rmtree", crash_on_first_sig_dir)
    with _pytest.raises(OSError, match="mid-removal"):
        compact_signature_corpus(spark, root, min_batches=2)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    # crash state: the first old batch is uncommitted (members gone)
    # with its signatures dir ORPHANED — invisible to manifest resume;
    # the second old batch is still committed (resume will see it).
    # The ledger knows both were retired.
    committed = _committed_batches(root + "/members")
    assert any(b.startswith("compact-") for b in committed)
    assert set(retired_batches(root)) == {"d0", "d1"}
    orphans = [
        d
        for d in os.listdir(root + "/signatures")
        if d.startswith("batch=d") and d[len("batch="):] not in committed
    ]
    assert orphans, "injection did not leave an orphan — test is vacuous"

    # the next run resumes: finishes the committed leftover AND sweeps
    # the invisible orphan via the ledger
    compact_signature_corpus(spark, root, min_batches=99)
    assert not [
        d
        for d in os.listdir(root + "/signatures")
        if d.startswith("batch=d")
    ], "orphaned signature dirs survived the sweep"
    assert all(
        b.startswith("compact-") for b in _committed_batches(root + "/members")
    )

    # a retired id can never be re-ingested over its admissions audit
    with _pytest.raises(ValueError, match="retired"):
        ingest_signature_batch(
            spark, _make(spark, [(99, "new content " + "q " * 30)]), root, "d0"
        )
    # the surviving corpus still admits/rejects correctly
    s = ingest_signature_batch(
        spark,
        _make(spark, [(50, "resume item 0 text " + " ".join(f"v0w{j}" for j in range(30)))]),
        root,
        "probe",
    )
    assert s["n_dup_of_corpus"] == 1


def test_compact_crash_before_removals_resumes_without_duplication(
    spark, tmp_path, monkeypatch
):
    """Inject the real crash: consolidation commits, then rmtree fails
    before any old partition is removed. The corpus briefly holds every
    doc twice (committed old + committed consolidated) — admission must
    still work — and the re-run must take the RESUME branch (remove the
    leftovers, never re-consolidate the duplicated rows)."""
    import shutil

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
        compact_signature_corpus,
        ingest_signature_batch,
    )

    root = str(tmp_path / "sig")
    for i in range(2):
        ingest_signature_batch(
            spark,
            _make(
                spark,
                [(i, f"crashy item {i} " + " ".join(f"c{i}w{j}" for j in range(30)))],
            ),
            root,
            f"d{i}",
        )

    real_rmtree = shutil.rmtree

    def boom(*a, **k):
        raise OSError("injected crash before removals")

    monkeypatch.setattr(shutil, "rmtree", boom)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        compact_signature_corpus(spark, root, min_batches=2)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    # mid-crash state: 3 committed partitions (d0, d1, compact-*), docs
    # present twice in the corpus view — a dup must still be rejected
    assert len(_committed_batches(root + "/members")) == 3
    s = ingest_signature_batch(
        spark,
        _make(
            spark,
            [(50, "crashy item 0 " + " ".join(f"c0w{j}" for j in range(30)))],
        ),
        root,
        "probe",
    )
    assert s["n_dup_of_corpus"] == 1

    st = compact_signature_corpus(spark, root, min_batches=99)  # resume ignores floor
    assert st["n_batches_consolidated"] >= 2
    # duplicate-free end state (probe batch may still sit beside the
    # consolidated partition — it was not part of the crashed run)
    docs = [
        r["doc"]
        for r in spark.read.parquet(root + "/signatures").select("doc").collect()
    ]
    assert len(docs) == len(set(docs)), "doc rows duplicated after resume"


def _sig_lake_ops(spark, root):
    """Adapter: the signature corpus as the multi-generation subject."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        compact_signature_corpus,
        ingest_signature_batch,
    )

    def gen_text(g, i):
        return (f"gen {g} item {i} "
                + " ".join(f"g{g}i{i}w{j}" for j in range(30)))

    def ingest(g, i):
        ingest_signature_batch(
            spark, _make(spark, [(g * 100 + i, gen_text(g, i))]), root, f"g{g}b{i}"
        )

    def probe(n):
        s = ingest_signature_batch(
            spark,
            _make(
                spark,
                [
                    (9000 + n, gen_text(0, 0)),  # dup of gen-0 doc 0
                    (9500 + n, f"probe fresh {n} "
                     + " ".join(f"p{n}w{j}" for j in range(30))),
                ],
            ),
            root,
            f"probe{n}",
        )
        return s

    return {
        "data_table": "signatures",
        "data_id_col": "doc",
        "member_id_col": "doc",
        "ingest": ingest,
        "probe": probe,
        "compact": lambda: compact_signature_corpus(spark, root, min_batches=2),
    }


def _emb_lake_ops(spark, root):
    """Adapter: the embedding-index lake as the SAME multi-generation
    subject (VERDICT r7 item 4 — shared compaction machinery, now
    shared proof). Vectors are 16-dim one-hots: generation vectors use
    positions 0-5 (mutually orthogonal, all accepted at threshold
    0.9), the probe duplicates gen-0 vec 0 exactly (cos 1 ->
    dup_of_corpus) and probes a fresh orthogonal position per call."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        compact_embedding_index,
        ingest_embedding_batch,
        init_embedding_index,
    )

    dim = 16

    def basis(k):
        return [1.0 if j == k else 0.0 for j in range(dim)]

    def frame(rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # quantizer: 4 seed centroids at positions 0-3 (deterministic,
    # train=False). Vectors at positions >= 4 tie at cos 0 against all
    # centroids and assign to cell 0 — fine: identity is the GEMM
    # verify, the cells are only routing.
    init_embedding_index(
        spark, frame([(i, basis(i)) for i in range(4)]), root, n_cells=4,
        train=False,
    )

    def ingest(g, i):
        ingest_embedding_batch(
            spark,
            frame([(g * 100 + i, basis(g * 2 + i))]),
            root,
            f"g{g}b{i}",
            threshold=0.9,
        )

    def probe(n):
        return ingest_embedding_batch(
            spark,
            frame([(9000 + n, basis(0)), (9500 + n, basis(8 + n))]),
            root,
            f"probe{n}",
            threshold=0.9,
        )

    return {
        "data_table": "assignments",
        "data_id_col": "vec_id",
        "member_id_col": "vec",
        "ingest": ingest,
        "probe": probe,
        "compact": lambda: compact_embedding_index(spark, root, min_batches=2),
    }


@pytest.mark.parametrize("make_ops", [_sig_lake_ops, _emb_lake_ops],
                         ids=["signature_corpus", "embedding_index"])
def test_compaction_steady_state_multi_generation(
    spark, tmp_path, monkeypatch, make_ops
):
    """The steady-state production cycle (VERDICT r5 item 6,
    parameterized over BOTH lakes by r7 item 4): three generations of
    ingest -> compact, with a mid-removal crash injected between
    generations. After every generation the corpus must hold each
    registered item's data rows exactly once, admission decisions
    against the consolidated corpus must stay identical to what the
    never-compacted corpus would decide, and the retired-ids ledger
    must keep growing (never forgetting an id that could otherwise be
    re-armed)."""
    import os
    import shutil

    import pytest as _pytest

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
        retired_batches,
    )

    root = str(tmp_path / "lake")
    ops = make_ops(spark, root)
    data_table = ops["data_table"]
    probe_n = 0

    def probe():
        """Admission decision for a dup of gen-0 item 0 + a fresh item —
        must be invariant across compactions (new id each call, the
        fresh item's content unique per call)."""
        nonlocal probe_n
        probe_n += 1
        s = ops["probe"](probe_n)
        assert s["n_dup_of_corpus"] == 1 and s["n_accepted"] == 1

    def assert_no_duplicate_data_rows():
        data = spark.read.parquet(f"{root}/{data_table}")
        ids = [r[ops["data_id_col"]] for r in data.select(ops["data_id_col"]).collect()]
        assert len(ids) == len(set(ids)), f"{data_table} rows duplicated"

    retired_so_far: set[str] = set()
    for g in range(3):
        for i in range(2):
            ops["ingest"](g, i)
        if g == 1:
            # crash this generation's compaction mid-removal ...
            real_rmtree = shutil.rmtree

            def crash(path, *a, **k):
                if f"/{data_table}/batch=" in path.replace(os.sep, "/"):
                    raise OSError("injected generational crash")
                return real_rmtree(path, *a, **k)

            monkeypatch.setattr(shutil, "rmtree", crash)
            with _pytest.raises(OSError, match="generational"):
                ops["compact"]()
            monkeypatch.setattr(shutil, "rmtree", real_rmtree)
            # ... and let the SAME generation's re-run repair it
        ops["compact"]()
        assert_no_duplicate_data_rows()
        committed = _committed_batches(root + "/members")
        assert all(b.startswith("compact-") for b in committed), committed
        retired_now = set(retired_batches(root))
        assert retired_so_far <= retired_now, "ledger forgot retired ids"
        assert retired_now - retired_so_far, "generation retired nothing"
        retired_so_far = retired_now
        probe()

    # every generation's items are still registered exactly once and
    # the retired ids hold no partitions
    mems = spark.read.parquet(root + "/members")
    got = {r[ops["member_id_col"]] for r in mems.select(ops["member_id_col"]).collect()}
    assert {g * 100 + i for g in range(3) for i in range(2)} <= got
    for b in retired_so_far:
        assert not os.path.exists(root + f"/members/batch={b}")
        assert not os.path.exists(root + f"/{data_table}/batch={b}")


def test_streaming_admission_keeps_facets_current(spark, tmp_path):
    """Every admitted micro-batch persists its intake facets, so the
    stored corpus LM / sketch / heavy hitters reflect the stream as it
    drains — the merged stored LM must equal training from scratch on
    every CONSIDERED doc across the epochs."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        corpus_sketch_stats,
        lake_heavy_hitters,
        read_corpus_lm,
    )
    from pokemon_showdown_airflow_etl_spark.operators.text import bigram_lm_rows
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_document_admission,
    )

    land = str(tmp_path / "in")
    root = str(tmp_path / "sig")
    ck = str(tmp_path / "ck")
    rows = [
        (i, f"tok{i}a tok{i}b shared words here {i}") for i in range(20)
    ]
    spark.createDataFrame(rows[:10], "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(land)
    spark.createDataFrame(rows[10:], "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    start_document_admission(stream, root, ck).awaitTermination()

    whole = spark.createDataFrame(rows, "doc_id long, text string")
    lm = read_corpus_lm(spark, root)
    assert sorted(map(tuple, lm.collect())) == sorted(
        map(tuple, bigram_lm_rows(whole).collect())
    )
    st = corpus_sketch_stats(spark, root, top_grams=2)
    n_f, n_c = st["facet_coverage"]["lm"]
    assert n_f == n_c >= 2  # one facet partition per non-empty epoch
    hh = {r["gram"] for r in lake_heavy_hitters(spark, root, topk=2).collect()}
    assert hh == {"shared words", "words here"}


def test_edit_verified_dups_charges_order_not_just_sets(spark):
    """d10's reason to exist: a token-scramble shares d7's shingle SETS
    poorly but a small boilerplate PATCH shares almost everything —
    edit distance accepts the patch pair and rejects a heavy rewrite,
    with integer rel_edit_ppm reported."""
    from pokemon_showdown_airflow_etl_spark.operators import dedup as dd

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (0, base),
        (1, base.replace("tok7", "patched") ),     # tiny edit -> dup
        (2, " ".join(f"tok{i}" for i in range(39, -1, -1))),  # full reversal
        (3, "completely different content here about other things"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["edit_distance"], r["rel_edit_ppm"])
        for r in dd.edit_verified_dups(df, "doc_id", "text").collect()
    }
    assert (0, 1) in got
    ed, rel = got[(0, 1)]

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1,
                    m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    e = lev(rows[0][1], rows[1][1])
    assert ed == e
    assert rel == (e * 1_000_000) // max(len(rows[0][1]), len(rows[1][1]))
    # the reversal is a candidate by token-set identity but FAILS the
    # edit verify (every token moved)
    assert (0, 2) not in got and (1, 2) not in got
    assert not any(3 in p for p in got)
