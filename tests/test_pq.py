"""Unit tests for the compression-ladder operators
(operators/similarity.py::pq_codebook/pq_encode/pq_adc_topk/
sign_sketch/hamming_topk — catalog s14/s15/s16). The cross-engine
math is oracle-checked in test_oracle_parity; these pin the local
contracts: codebook geometry, guards, planted-duplicate behavior, and
exact bit packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators import similarity


def _emb(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_pq_codebook_shape_and_divisibility_guard(spark):
    rows = [(i, [float(i == j) for j in range(16)]) for i in range(20)]
    emb = _emb(spark, rows, 16)
    cb = similarity.pq_codebook(emb, n_sub=4, n_codes=8)
    assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 4
    # codewords are the subvectors of the first-8-by-id vectors
    assert cb[0][0] == [1.0, 0.0, 0.0, 0.0]
    assert cb[1][5] == [0.0, 1.0, 0.0, 0.0]  # vec 5's dims 4-7 (one at 5)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_codebook(emb, n_sub=5)


def test_pq_encode_exact_codeword_has_zero_error(spark):
    # vectors 0..7 ARE the codebook (n_codes=8): every subvector matches
    # its own codeword exactly -> code == own id, err_micro == 0;
    # vector 100 sits off-codebook -> nonzero error, codes in range
    rows = [(i, [float(i == j) for j in range(16)]) for i in range(8)]
    rows.append((100, [0.5] * 16))
    emb = _emb(spark, rows, 16)
    cb = similarity.pq_codebook(emb, n_sub=4, n_codes=8)
    got = {
        r["vec_id"]: (list(r["codes"]), r["err_micro"])
        for r in similarity.pq_encode(emb, cb).collect()
    }
    for i in range(8):
        # exact reconstruction: every subvector matches some codeword
        # bit-for-bit (its own one-hot where dim i lives; the lowest
        # all-zero codeword elsewhere — ties go to the lowest code id)
        assert got[i][1] == 0
    # the distinctive one-hot subspace picks the vector's own codeword
    for i in range(4):
        assert got[i][0][0] == i  # dims 0-3 live in subspace 0
    for i in range(4, 8):
        assert got[i][0][1] == i  # dims 4-7 live in subspace 1
    codes100, err100 = got[100]
    assert err100 > 0
    assert all(0 <= c < 8 for c in codes100)


def test_pq_adc_finds_planted_duplicate(spark):
    # 101 duplicates 1 exactly: ADC distance via the coded corpus is 0
    # (same codes, same table entries) and the exact rescore puts it at
    # rank 1 with cos_sim 1.0
    rows = [(i, [float(i == j) for j in range(16)]) for i in range(8)]
    rows.append((101, [float(j == 1) for j in range(16)]))
    emb = _emb(spark, rows, 16)
    cb = similarity.pq_codebook(emb, n_sub=4, n_codes=8)
    out = similarity.pq_adc_topk(
        emb, emb.filter(F.col("vec_id") == 101), cb, k=1, shortlist=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["query_id"], r["nn_id"], r["rank"]) == (101, 1, 1)
    assert r["cos_sim"] == 1.0


def test_sign_sketch_packs_exact_bits(spark):
    # dims 0,2 positive in the low word; dims 33,63 positive in the high
    v = [0.0] * 64
    v[0] = 1.0
    v[2] = 0.5
    v[33] = 2.0
    v[63] = 1e-9
    emb = _emb(spark, [(7, v)], 64)
    row = similarity.sign_sketch(emb).collect()[0]
    assert row["b0"] == (1 << 0) + (1 << 2)
    assert row["b1"] == (1 << 1) + (1 << 31)  # dims 33, 63 -> bits 1, 31


def test_hamming_topk_finds_planted_duplicate(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)
    ]
    dup = list(rows[3][1])
    rows.append((200, dup))
    emb = _emb(spark, rows, 64)
    out = similarity.hamming_topk(
        emb, emb.filter(F.col("vec_id") == 200), k=1, shortlist=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["nn_id"], r["hamming"]) == (3, 0)
    assert r["cos_sim"] == 1.0


def test_pq_lake_layer_build_search_and_guards(spark, tmp_path):
    """The PQ facet of the embedding-index lake (build_pq_layer /
    pq_layer_search): codes match a live pq_encode of the committed
    corpus, search finds a planted near-duplicate through the coded
    path, the layer is idempotent unless refreshed, and search fails
    loudly without a committed layer."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
        pq_layer_search,
    )

    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    emb = _emb(spark, rows, 64)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)

    with pytest.raises(FileNotFoundError, match="no committed PQ layer"):
        pq_layer_search(spark, root, emb.limit(1))

    st = build_pq_layer(spark, root, n_sub=8, n_codes=16)
    assert st["n_vectors"] == 40 and st["refreshed"]
    # idempotent unless refreshed
    st2 = build_pq_layer(spark, root, n_sub=8, n_codes=16)
    assert st2["already_built"] and not st2["refreshed"]

    # stored codes == live encode of the committed corpus
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        read_committed,
    )
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    asg = read_committed(spark, root, "assignments")
    live = {
        r["vec_id"]: (list(r["codes"]), r["err_micro"])
        for r in pq_encode(asg, pq_codebook(asg, vec_col="v"), vec_col="v").collect()
    }
    import os
    stored = {
        r["vec_id"]: (list(r["codes"]), r["err_micro"])
        for r in spark.read.parquet(os.path.join(root, "pq", "codes")).collect()
    }
    assert stored == live

    # a query duplicating vector 7 comes back rank-1 through the codes
    q = _emb(spark, [(900, rows[7][1])], 64)
    got = pq_layer_search(spark, root, q, k=1, shortlist=5).collect()
    assert len(got) == 1
    assert (got[0]["nn_id"], got[0]["cos_sim"]) == (7, 1.0)


def test_hamming_topk_accepts_external_queries(spark):
    """The query frame need not be a corpus subset: an external vector
    (id absent from emb) still gets ranked and rescored — the rescore
    carries qv from the query side, never re-derives it from the
    corpus."""
    import random

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)]
    emb = _emb(spark, rows, 64)
    external = _emb(spark, [(999, rows[4][1])], 64)  # id NOT in emb
    out = similarity.hamming_topk(emb, external, k=1, shortlist=4).collect()
    assert len(out) == 1
    assert (out[0]["query_id"], out[0]["nn_id"], out[0]["hamming"]) == (999, 4, 0)
    assert out[0]["cos_sim"] == 1.0


def test_pq_lake_layer_trained_codebook(spark, tmp_path):
    """build_pq_layer(train=True): the Lloyd-trained codebooks must
    strictly reduce total reconstruction error vs the first-N rule on
    the same committed corpus, and search still works through the
    trained layer."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
        pq_layer_search,
    )

    import os
    import random

    rng = random.Random(29)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    emb = _emb(spark, rows, 64)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)

    build_pq_layer(spark, root, n_sub=8, n_codes=16)
    seed_err = (
        spark.read.parquet(os.path.join(root, "pq", "codes"))
        .agg(F.sum("err_micro"))
        .first()[0]
    )
    st = build_pq_layer(spark, root, n_sub=8, n_codes=16, refresh=True, train=True)
    assert st["refreshed"]
    trained_err = (
        spark.read.parquet(os.path.join(root, "pq", "codes"))
        .agg(F.sum("err_micro"))
        .first()[0]
    )
    assert trained_err < seed_err

    q = _emb(spark, [(900, rows[9][1])], 64)
    got = pq_layer_search(spark, root, q, k=1, shortlist=5).collect()
    assert (got[0]["nn_id"], got[0]["cos_sim"]) == (9, 1.0)


def test_brute_force_topk_tie_breaks_by_id_through_local_prune(spark):
    """brute_force_topk's per-partition prune must keep ties the global
    rule would keep: two identical corpus vectors both score cos 1.0
    against an equal query — the LOWER id must win rank 1, and both
    must appear in the top-2 (a cos-only local prune could drop the
    id-tie winner)."""
    base = [1.0, 2.0, 3.0, 4.0]
    rows = [
        (50, base),            # tie pair, higher id
        (7, base),             # tie pair, lower id
        (8, [4.0, 3.0, 2.0, 1.0]),
        (9, [-1.0, -2.0, -3.0, -4.0]),
        (100, base),           # the query
    ]
    emb = _emb(spark, rows, 4)
    out = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 100), k=2
    ).orderBy("rank").collect()
    assert [(r["nn_id"], r["rank"], r["cos_sim"]) for r in out] == [
        (7, 1, 1.0),
        (50, 2, 1.0),
    ]


def test_pq_adc_topk_accepts_external_queries(spark):
    """Same contract as hamming: an external query vector (id not in
    the corpus) ranks and rescores — qv rides the query side."""
    rows = [(i, [float(i == j) for j in range(16)]) for i in range(8)]
    emb = _emb(spark, rows, 16)
    external = _emb(spark, [(999, [float(j == 2) for j in range(16)])], 16)
    cb = similarity.pq_codebook(emb, n_sub=4, n_codes=8)
    out = similarity.pq_adc_topk(emb, external, cb, k=1, shortlist=3).collect()
    assert len(out) == 1
    assert (out[0]["query_id"], out[0]["nn_id"], out[0]["cos_sim"]) == (999, 2, 1.0)


def test_build_vocab_smaller_corpus_than_vocab(spark):
    """A corpus with fewer distinct tokens than vocab_size yields a
    complete vocabulary (no phantom ids) with the (count desc, token)
    order, and encoding against it has zero OOV."""
    from pokemon_showdown_airflow_etl_spark.operators.text import (
        build_vocab,
        vocab_encode,
    )

    docs = spark.createDataFrame(
        [(1, "b a b"), (2, "c b"), (3, None)],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, vocab_size=256)
    got = {(r["token"], r["token_id"]) for r in vocab.collect()}
    assert got == {("b", 0), ("a", 1), ("c", 2)}  # b:3, then a/c tie by token
    enc = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], list(r["ids"]))
        for r in vocab_encode(docs, vocab).collect()
    }
    assert enc[1] == (3, 0, [0, 1, 0])
    assert enc[2] == (2, 0, [2, 0])
    assert enc[3] == (0, 0, [])  # null text anchored, not dropped


def test_vocab_encode_marks_oov(spark):
    from pokemon_showdown_airflow_etl_spark.operators.text import vocab_encode

    docs = spark.createDataFrame([(1, "x y x z")], "doc_id long, text string")
    vocab = spark.createDataFrame([("x", 0)], "token string, token_id int")
    r = vocab_encode(docs, vocab).collect()[0]
    assert (r["n_tokens"], r["n_oov"], list(r["ids"])) == (4, 2, [0, -1, 0, -1])


def test_pq_layer_search_with_cell_pruning(spark, tmp_path):
    """pq_layer_search(n_probe=...): the IVF-PQ shape over the real
    lake — only the probed cells' stored members are ADC-scored, and a
    planted duplicate (which by construction shares its twin's rank-1
    cell) still comes back rank 1; the unpruned and pruned searches
    agree on it."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
        pq_layer_search,
    )

    import random

    rng = random.Random(41)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)]
    emb = _emb(spark, rows, 64)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    build_pq_layer(spark, root, n_sub=8, n_codes=16)

    q = _emb(spark, [(900, rows[12][1])], 64)
    full = pq_layer_search(spark, root, q, k=1, shortlist=5).collect()
    pruned = pq_layer_search(spark, root, q, k=1, shortlist=5, n_probe=1).collect()
    assert (full[0]["nn_id"], full[0]["cos_sim"]) == (12, 1.0)
    assert (pruned[0]["nn_id"], pruned[0]["cos_sim"]) == (12, 1.0)
    assert pruned[0]["adc_micro"] == full[0]["adc_micro"]


# --- OPQ-lite (opq_snake_permutation, s21) ----------------------------------


def _planted_anisotropic(spark, n=120, dim=16, n_sub=4):
    """Deterministic anisotropic corpus: all the variance lives in the
    FIRST subspace under the identity layout (dims 0..3 swing wide,
    the rest barely move) — the worst case identity PQ can face and
    the configuration OPQ exists to fix."""
    rows = []
    for i in range(n):
        v = []
        for d in range(dim):
            base = ((i * 37 + d * 11) % 97) / 97.0 - 0.5
            v.append(base * (8.0 if d < dim // n_sub else 0.25))
        rows.append((i, v))
    return _emb(spark, rows, dim)


def test_opq_snake_permutation_is_variance_balancing_bijection(spark):
    emb = _planted_anisotropic(spark)
    perm = similarity.opq_snake_permutation(emb, n_sub=4, sample_mod=None)
    assert sorted(perm) == list(range(16)), "must be a bijection"
    # the four high-variance dims (0..3) must land in four DIFFERENT
    # subspaces — that is the whole point of the snake deal
    where = {d: p // 4 for p, d in enumerate(perm)}
    assert len({where[d] for d in range(4)}) == 4


def test_opq_identity_perm_is_a_no_op(spark):
    emb = _planted_anisotropic(spark)
    ident = list(range(16))
    cb0 = similarity.pq_codebook(emb, n_sub=4, n_codes=8)
    cb1 = similarity.pq_codebook(emb, n_sub=4, n_codes=8, perm=ident)
    assert cb0 == cb1
    a = similarity.pq_encode(emb, cb0).orderBy("vec_id").collect()
    b = similarity.pq_encode(emb, cb1, perm=ident).orderBy("vec_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_opq_strictly_improves_on_anisotropic_corpus(spark):
    """The honest-contract test behind the s21 audit: on embeddings with
    real anisotropy the snake permutation must strictly cut total
    reconstruction error — for the seed codebook AND the trained one.
    (On the isotropic driver corpus it is measured ~neutral, which the
    s21 entry reports as data rather than asserting away.)"""
    emb = _planted_anisotropic(spark)
    perm = similarity.opq_snake_permutation(emb, n_sub=4, sample_mod=None)

    def total_err(p, trained):
        if trained:
            cb = similarity.pq_train_codebook(
                emb, n_sub=4, n_codes=8, sample_mod=None, perm=p
            )
        else:
            cb = similarity.pq_codebook(emb, n_sub=4, n_codes=8, perm=p)
        return (
            similarity.pq_encode(emb, cb, perm=p)
            .agg(F.sum("err_micro").alias("e"))
            .collect()[0]["e"]
        )

    assert total_err(perm, trained=False) < total_err(None, trained=False)
    assert total_err(perm, trained=True) < total_err(None, trained=True)


def test_pq_refresh_crash_keeps_committed_layer_serving(spark, tmp_path, monkeypatch):
    """A refresh builds the replacement in a sibling staging dir and
    swaps it in only once complete — a crash ANYWHERE during the
    rebuild (injected at the encode step, after staging codebook.json
    exists) must leave the previously committed snapshot intact and
    serving, and the next refresh must heal."""
    from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as lake
    from pokemon_showdown_airflow_etl_spark.operators import similarity

    import random

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    emb = _emb(spark, rows, 64)
    root = str(tmp_path / "idx")
    lake.init_embedding_index(spark, emb, root, n_cells=4, train=False)
    lake.ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    lake.build_pq_layer(spark, root)
    q = _emb(spark, [(900, rows[5][1])], 64)
    before = [tuple(r) for r in lake.pq_layer_search(spark, root, q, k=2).collect()]

    real = similarity.pq_encode

    def boom(*a, **kw):
        raise RuntimeError("injected crash mid-refresh")

    monkeypatch.setattr(similarity, "pq_encode", boom)
    with pytest.raises(RuntimeError, match="injected"):
        lake.build_pq_layer(spark, root, refresh=True)
    monkeypatch.setattr(similarity, "pq_encode", real)

    # committed snapshot untouched and still serving
    after = [tuple(r) for r in lake.pq_layer_search(spark, root, q, k=2).collect()]
    assert after == before
    # the healed refresh clears the stale staging dir and commits
    st = lake.build_pq_layer(spark, root, refresh=True)
    assert st["refreshed"] and st["n_vectors"] == 30
    import os
    assert not os.path.isdir(os.path.join(root, "pq") + ".staging")
    assert not os.path.isdir(os.path.join(root, "pq") + ".old")
    healed = [tuple(r) for r in lake.pq_layer_search(spark, root, q, k=2).collect()]
    assert healed == before


def test_pq_refresh_crash_between_renames_restores_old_snapshot(
    spark, tmp_path, monkeypatch
):
    """The swap itself is two renames (d -> old, staging -> d). A crash
    BETWEEN them leaves no serving dir while old/ still holds the last
    committed snapshot — the next build must restore old/ as the
    serving layer instead of deleting it as residue (which would
    destroy the only committed copy)."""
    from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as lake

    import os
    import random

    rng = random.Random(47)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    emb = _emb(spark, rows, 64)
    root = str(tmp_path / "idx")
    lake.init_embedding_index(spark, emb, root, n_cells=4, train=False)
    lake.ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    lake.build_pq_layer(spark, root)
    q = _emb(spark, [(900, rows[5][1])], 64)
    before = [tuple(r) for r in lake.pq_layer_search(spark, root, q, k=2).collect()]

    d = os.path.join(root, "pq")
    real_rename = os.rename

    def crash_on_swap_in(src, dst):
        if dst == d and src == d + ".staging":
            raise RuntimeError("injected crash between swap renames")
        return real_rename(src, dst)

    monkeypatch.setattr(lake.os, "rename", crash_on_swap_in)
    with pytest.raises(RuntimeError, match="between swap renames"):
        lake.build_pq_layer(spark, root, refresh=True)
    monkeypatch.setattr(lake.os, "rename", real_rename)
    # the failure mode under test: no serving dir, snapshot only in old/
    assert not os.path.isdir(d)
    assert os.path.exists(os.path.join(d + ".old", "codes", "_SUCCESS"))

    # a non-refresh build restores the committed snapshot and serves it
    st = lake.build_pq_layer(spark, root)
    assert st["already_built"] and st["n_vectors"] == 30
    assert not os.path.isdir(d + ".old"), "snapshot restored, not deleted"
    restored = [tuple(r) for r in lake.pq_layer_search(spark, root, q, k=2).collect()]
    assert restored == before

    # and a refresh after the same crash also recovers, then rebuilds
    monkeypatch.setattr(lake.os, "rename", crash_on_swap_in)
    with pytest.raises(RuntimeError, match="between swap renames"):
        lake.build_pq_layer(spark, root, refresh=True)
    monkeypatch.setattr(lake.os, "rename", real_rename)
    st = lake.build_pq_layer(spark, root, refresh=True)
    assert st["refreshed"] and st["n_vectors"] == 30
    assert not os.path.isdir(d + ".staging") and not os.path.isdir(d + ".old")
    healed = [tuple(r) for r in lake.pq_layer_search(spark, root, q, k=2).collect()]
    assert healed == before


def test_pq_train_sample_is_bounded(spark, tmp_path):
    """train=True must never collect the whole corpus: with
    train_max_rows=n_codes the codebook equals one trained on exactly
    the first-N-by-id slice (Lloyd init = those subvectors), proving
    the bound reaches the trainer."""
    from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as lake
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        read_committed,
    )
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        pq_train_codebook,
    )

    import json
    import os
    import random

    rng = random.Random(31)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    emb = _emb(spark, rows, 64)
    root = str(tmp_path / "idx")
    lake.init_embedding_index(spark, emb, root, n_cells=4, train=False)
    lake.ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    lake.build_pq_layer(spark, root, train=True, train_max_rows=16)
    with open(os.path.join(root, "pq", "codebook.json")) as f:
        stored = json.load(f)["codebook"]
    asg = read_committed(spark, root, "assignments")
    want = pq_train_codebook(
        asg.orderBy("vec_id").limit(16), vec_col="v", sample_mod=None
    )
    assert stored == want


def test_sign_sketch_rejects_wrong_dimensionality(spark):
    # F.slice on a short vector would otherwise yield NULL sketches
    # silently (zip_with null-pads) — the guard must fail loudly
    from pyspark.errors import SparkRuntimeException

    emb = _emb(spark, [(1, [0.5] * 16)], 16)
    with pytest.raises(SparkRuntimeException, match="dim-64"):
        similarity.sign_sketch(emb).collect()


def test_brute_force_rejects_zero_norm_vectors(spark):
    import pytest as _pt

    rows = [(1, [1.0] * 8), (2, [0.0] * 8), (3, [0.5] * 8)]
    emb = _emb(spark, rows, 8)
    # zero-norm corpus vector -> kernel raises (surfaces as a Spark job failure)
    with _pt.raises(Exception, match="zero-norm"):
        similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 1), k=1).collect()
    # zero-norm query -> driver-side raise
    with _pt.raises(ValueError, match="zero-norm query"):
        similarity.brute_force_topk(
            emb.filter(F.col("vec_id") != 2), emb.filter(F.col("vec_id") == 2), k=1
        )


def test_pq_lake_layer_serves_stored_opq_permutation(spark, tmp_path):
    """build_pq_layer(opq=True) trains + stores a NON-identity
    permutation on the planted anisotropic corpus, the stored codes
    encode the PERMUTED vectors, and pq_layer_search permutes queries
    the same way — a planted duplicate still comes back rank-1 with
    cosine 1.0 (VERDICT r10 item 7)."""
    import json
    import os

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        read_committed,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
        pq_layer_search,
    )
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        opq_snake_permutation,
        pq_codebook,
        pq_encode,
    )

    emb = _planted_anisotropic(spark, n=60, dim=16, n_sub=4)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    st = build_pq_layer(spark, root, n_sub=4, n_codes=8, opq=True, opq_sample_mod=1)
    assert st["opq"] and st["refreshed"]

    with open(os.path.join(root, "pq", "codebook.json")) as f:
        meta = json.load(f)
    perm = meta["perm"]
    assert sorted(perm) == list(range(16))
    assert perm != list(range(16)), "anisotropic corpus must train a real perm"

    # stored codes == live permuted encode of the committed corpus
    asg = read_committed(spark, root, "assignments")
    live_perm = opq_snake_permutation(asg, n_sub=4, vec_col="v", sample_mod=1)
    assert live_perm == perm
    cb = pq_codebook(asg, n_sub=4, n_codes=8, vec_col="v", perm=perm)
    live = {
        r["vec_id"]: (list(r["codes"]), r["err_micro"])
        for r in pq_encode(asg, cb, vec_col="v", perm=perm).collect()
    }
    stored = {
        r["vec_id"]: (list(r["codes"]), r["err_micro"])
        for r in spark.read.parquet(os.path.join(root, "pq", "codes")).collect()
    }
    assert stored == live

    # a duplicate of vector 7 routes through the permuted ADC path
    dup = _planted_anisotropic(spark, n=60, dim=16, n_sub=4).filter(
        "vec_id = 7"
    ).selectExpr("900 as vec_id", "embedding")
    got = pq_layer_search(spark, root, dup, k=1, shortlist=5).collect()
    assert len(got) == 1
    assert (got[0]["nn_id"], got[0]["cos_sim"]) == (7, 1.0)

    # already-built report surfaces the stored layer's opq state
    st2 = build_pq_layer(spark, root, n_sub=4, n_codes=8)
    assert st2["already_built"] and st2["opq"]

    # a refresh WITHOUT opq drops the permutation (snapshot semantics)
    st3 = build_pq_layer(spark, root, n_sub=4, n_codes=8, refresh=True)
    assert st3["refreshed"] and not st3["opq"]
    with open(os.path.join(root, "pq", "codebook.json")) as f:
        assert json.load(f)["perm"] is None


def test_build_pq_opq_conflicting_with_committed_layer_raises(spark, tmp_path):
    """An explicit opq=True against a committed non-OPQ layer must not
    silently no-op (review finding r11): the operator would believe
    OPQ is on while searches run un-permuted."""
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
    )

    emb = _planted_anisotropic(spark, n=40, dim=16, n_sub=4)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    build_pq_layer(spark, root, n_sub=4, n_codes=8)
    with pytest.raises(ValueError, match="WITHOUT the OPQ permutation"):
        build_pq_layer(spark, root, n_sub=4, n_codes=8, opq=True)
    # refresh resolves the conflict
    st = build_pq_layer(spark, root, n_sub=4, n_codes=8, opq=True, refresh=True,
                        opq_sample_mod=1)
    assert st["opq"] and st["refreshed"]


def test_residual_pq_layer_serves_stored_residual_codes(spark, tmp_path):
    """build_pq_layer(residual=True): stored codes encode each member's
    residual against its STORED cell (verified against a hand
    composition of assign + zip_with + encode), codebook.json records
    residual=true, search requires n_probe and returns the planted
    duplicate at rank 1; the conflicting-request, opq-composition and
    no-probe guards all fail loudly."""
    import json
    import os

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        read_committed,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
        pq_layer_search,
        read_centroids,
    )
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        assign_cells,
        pq_codebook,
        pq_encode,
    )

    emb = _planted_anisotropic(spark, n=60, dim=16, n_sub=4)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)

    st = build_pq_layer(spark, root, n_sub=4, n_codes=8, residual=True)
    assert st["residual"] is True and st["n_vectors"] == 60
    with open(os.path.join(root, "pq", "codebook.json")) as f:
        assert json.load(f)["residual"] is True

    # stored codes == hand-derived residual encoding of the committed
    # corpus (assignment from the lake's own centroids)
    cents = read_centroids(spark, root)
    cvt = cents.select("cell_id", F.col("centroid").alias("_cv"))
    asg = read_committed(spark, root, "assignments")
    resid = (
        assign_cells(asg.select("vec_id", F.col("v").alias("embedding")), cents, 1)
        .join(F.broadcast(cvt), "cell_id")
        .select(
            "vec_id", F.zip_with("v", "_cv", lambda a, b: a - b).alias("r")
        )
    )
    cb = pq_codebook(resid, n_sub=4, n_codes=8, vec_col="r")
    want = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(resid, cb, vec_col="r").collect()
    }
    got = {
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(root, "pq", "codes")).collect()
    }
    assert got == want

    # search: n_probe required; a planted duplicate of member 7 comes
    # back rank-1 with cosine 1.0 through the residual tables
    member7 = asg.filter(F.col("vec_id") == 7).select(
        F.lit(1007).alias("vec_id"), F.col("v").alias("embedding")
    )
    with pytest.raises(ValueError, match="n_probe"):
        pq_layer_search(spark, root, member7, k=1)
    top = pq_layer_search(spark, root, member7, k=1, n_probe=2).collect()
    assert len(top) == 1
    assert top[0]["nn_id"] == 7 and float(top[0]["cos_sim"]) == 1.0

    # explicit residual=True against a committed raw layer raises
    root2 = str(tmp_path / "idx2")
    init_embedding_index(spark, emb, root2, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root2, "bulk", threshold=2.0)
    build_pq_layer(spark, root2, n_sub=4, n_codes=8)
    with pytest.raises(ValueError, match="WITHOUT residual"):
        build_pq_layer(spark, root2, n_sub=4, n_codes=8, residual=True)
    st2 = build_pq_layer(
        spark, root2, n_sub=4, n_codes=8, residual=True, refresh=True
    )
    assert st2["residual"] and st2["refreshed"]


def test_opq_residual_layer_composes_both_geometries(spark, tmp_path):
    """build_pq_layer(residual=True, opq=True) — s26, the full FAISS
    stack: the permutation trains on the RESIDUAL sample (what the
    code budget actually quantizes), stored codes equal the hand
    composition assign -> zip_with residual -> permute -> encode,
    codebook.json records both flags, and the planted duplicate comes
    back rank-1 through the permuted-residual tables."""
    import json
    import os

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        read_committed,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        build_pq_layer,
        ingest_embedding_batch,
        init_embedding_index,
        pq_layer_search,
        read_centroids,
    )
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        assign_cells,
        opq_snake_permutation,
        pq_codebook,
        pq_encode,
    )

    emb = _planted_anisotropic(spark, n=60, dim=16, n_sub=4)
    root = str(tmp_path / "idx")
    init_embedding_index(spark, emb, root, n_cells=4, train=False)
    ingest_embedding_batch(spark, emb, root, "bulk", threshold=2.0)
    st = build_pq_layer(
        spark, root, n_sub=4, n_codes=8, residual=True, opq=True,
        opq_sample_mod=3,
    )
    assert st["residual"] is True and st["opq"] is True
    with open(os.path.join(root, "pq", "codebook.json")) as f:
        meta = json.load(f)
    assert meta["residual"] is True and meta["perm"] is not None

    cents = read_centroids(spark, root)
    cvt = cents.select("cell_id", F.col("centroid").alias("_cv"))
    asg = read_committed(spark, root, "assignments")
    resid = (
        assign_cells(asg.select("vec_id", F.col("v").alias("embedding")), cents, 1)
        .join(F.broadcast(cvt), "cell_id")
        .select(
            "vec_id", F.zip_with("v", "_cv", lambda a, b: a - b).alias("r")
        )
    )
    # the permutation must be the one trained on the RESIDUAL sample —
    # a raw-coordinate permutation is a different bijection on this
    # anisotropic corpus
    perm = opq_snake_permutation(resid, n_sub=4, vec_col="r", sample_mod=3)
    assert meta["perm"] == perm
    cb = pq_codebook(resid, n_sub=4, n_codes=8, vec_col="r", perm=perm)
    want = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(resid, cb, vec_col="r", perm=perm).collect()
    }
    got = {
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(root, "pq", "codes")).collect()
    }
    assert got == want

    member9 = asg.filter(F.col("vec_id") == 9).select(
        F.lit(1009).alias("vec_id"), F.col("v").alias("embedding")
    )
    top = pq_layer_search(spark, root, member9, k=1, n_probe=2).collect()
    assert len(top) == 1
    assert top[0]["nn_id"] == 9 and float(top[0]["cos_sim"]) == 1.0
