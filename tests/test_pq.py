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
