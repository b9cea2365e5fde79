"""Unit contracts for the round-9 additions: the deterministic
HyperLogLog (operators/sketches.py::hll_*, catalog a4) and the smoothed
bigram scorer (operators/text.py::bigram_logprob, catalog t25). The
cross-engine math is oracle-checked in test_oracle_parity; these pin the
operator-level semantics against independent pure-Python models.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators.sketches import (
    HLL_ALPHA,
    HLL_M,
    HLL_RANK_CAP,
    hll_registers,
    hll_summary,
)
from pokemon_showdown_airflow_etl_spark.operators.text import bigram_logprob


def _py_hll_registers(keys):
    """Independent model: md5 first byte % m routes, rank = leading
    zeros of the 60-bit tail (hex chars 3..17) + 1."""
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        reg = int(h[:2], 16) % HLL_M
        tail = h[2:17]
        v = int(tail, 16)
        rank = 61 - v.bit_length() if v else 61
        rank = min(rank, HLL_RANK_CAP)
        regs[reg] = max(regs.get(reg, 0), rank)
    return regs


def test_hll_registers_match_python_model(spark):
    keys = [f"key-{i}" for i in range(500)] + ["key-7", "key-7"]  # dups no-op
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["reg"]: r["max_rank"] for r in hll_registers(df, F.col("k")).collect()}
    assert got == _py_hll_registers(keys)


def test_hll_estimate_formula_and_branches(spark):
    # high-cardinality: raw branch; the estimate must match the formula
    # applied to the model registers and sit within 4 sigma (rsd =
    # 1.04/sqrt(64) = 13%) of the truth
    n = 2000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    row = hll_summary(df, F.col("k")).collect()[0]
    regs = _py_hll_registers([f"u{i}" for i in range(n)])
    s = sum(2 ** (HLL_RANK_CAP - r) for r in regs.values())
    s += (HLL_M - len(regs)) * 2**HLL_RANK_CAP
    assert row["s_sum"] == s
    assert row["v_zero"] == HLL_M - len(regs)
    raw = HLL_ALPHA * HLL_M * HLL_M * float(2**HLL_RANK_CAP) / s
    assert row["est_milli"] == round(raw * 1000)
    assert abs(raw - n) / n < 4 * 1.04 / math.sqrt(HLL_M)

    # tiny cardinality: the linear-counting branch must fire
    df2 = spark.createDataFrame([(f"x{i % 3}",) for i in range(50)], "k string")
    row2 = hll_summary(df2, F.col("k")).collect()[0]
    v0 = row2["v_zero"]
    assert v0 > 0
    assert row2["est_milli"] == round(HLL_M * math.log(HLL_M / v0) * 1000)
    assert abs(row2["est_milli"] / 1000 - 3) < 1  # ~3 distinct


def test_hll_registers_merge_by_max(spark):
    """The sketch is mergeable: registers of A ∪ B == elementwise max of
    registers(A), registers(B) — the property that makes the distributed
    build just an aggregation."""
    a = [f"a{i}" for i in range(200)]
    b = [f"b{i}" for i in range(200)]
    df_a = spark.createDataFrame([(k,) for k in a], "k string")
    df_b = spark.createDataFrame([(k,) for k in b], "k string")
    df_ab = df_a.unionAll(df_b)
    ra = {r["reg"]: r["max_rank"] for r in hll_registers(df_a, F.col("k")).collect()}
    rb = {r["reg"]: r["max_rank"] for r in hll_registers(df_b, F.col("k")).collect()}
    rab = {r["reg"]: r["max_rank"] for r in hll_registers(df_ab, F.col("k")).collect()}
    merged = {reg: max(ra.get(reg, 0), rb.get(reg, 0)) for reg in set(ra) | set(rb)}
    assert rab == merged


def _py_bigram_nll(docs):
    """Independent add-one bigram model in micro-unit arithmetic."""
    toks = {i: t.lower().split() for i, t in docs.items() if t}
    occ = [(w1, w2) for ts in toks.values() for w1, w2 in zip(ts, ts[1:])]
    vocab = {w for ts in toks.values() for w in ts}
    c2, c1 = {}, {}
    for w1, w2 in occ:
        c2[(w1, w2)] = c2.get((w1, w2), 0) + 1
        c1[w1] = c1.get(w1, 0) + 1
    micro = {
        bg: round(math.log((c + 1.0) / (c1[bg[0]] + len(vocab))) * 1_000_000)
        for bg, c in c2.items()
    }
    out = {}
    for i in docs:
        ts = toks.get(i, [])
        bgs = list(zip(ts, ts[1:]))
        nll = -sum(micro[bg] for bg in bgs)
        out[i] = (len(bgs), nll, nll // len(bgs) if bgs else 0)
    return out


def test_bigram_logprob_matches_python_model(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "mat the cat",
        4: "solo",          # single token -> 0 bigrams
        5: None,             # null text -> anchored zero row
        6: "",               # empty text -> anchored zero row
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"], r["avg_nll_micro"])
        for r in bigram_logprob(df).collect()
    }
    want = _py_bigram_nll(docs)
    assert set(got) == set(docs), "output must anchor on INPUT ids"
    assert got == want
    # repeated text scores lower NLL per bigram than unique text
    assert got[1][2] > 0 and got[2][2] > 0


def test_bottomk_sample_is_mergeable_and_deterministic(spark):
    """The a5 scale claim: bottom-k of a union equals bottom-k of the
    two sides' bottom-ks merged — which is why per-partition bottom-k
    then re-rank (the two-phase shard window) computes the exact global
    sample without a global sort. Verified against an independent
    Python KMV model."""
    import hashlib

    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        bottomk_sample,
    )
    from pyspark.sql import functions as F

    def model(keys_vals, k):
        ranked = sorted(
            keys_vals, key=lambda kv: hashlib.md5(kv[0].encode()).hexdigest()
        )[:k]
        return sorted(v for _, v in ranked)

    a = [(f"a{i}", float(i)) for i in range(300)]
    b = [(f"b{i}", float(1000 + i)) for i in range(300)]
    df_a = spark.createDataFrame(a, "k string, v double")
    df_b = spark.createDataFrame(b, "k string, v double")
    got_union = bottomk_sample(df_a.unionAll(df_b), F.col("k"), "v", k=64)
    assert got_union == model(a + b, 64)
    # mergeable: bottom-k of (bottom-k(A) ∪ bottom-k(B)) == bottom-k(A ∪ B)
    ka = model(a, 64)
    kb = model(b, 64)
    merged_model = model(
        [kv for kv in a if kv[1] in set(ka)] + [kv for kv in b if kv[1] in set(kb)],
        64,
    )
    assert got_union == merged_model
    # determinism across runs
    assert got_union == bottomk_sample(df_b.unionAll(df_a), F.col("k"), "v", k=64)


def test_bottomk_sample_total_order_on_duplicate_keys(spark):
    """Duplicate keys hash identically, so the sample's order must fall
    through to (key string, value) — otherwise a row_number tie at the
    k boundary breaks by partition order and the sampled VALUES become
    run-dependent (the scale_probe text-key call hits this). Pin the
    exact expected sample against the total-order model across two
    different physical layouts."""
    import hashlib

    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        bottomk_sample,
    )
    from pyspark.sql import functions as F

    # 40 distinct keys, each carried by 5 rows with DIFFERENT values;
    # k=16 guarantees the cut lands inside a duplicate-key hash tie
    rows = [(f"k{i % 40}", float(i)) for i in range(200)]

    def model(keys_vals, k):
        ranked = sorted(
            keys_vals,
            key=lambda kv: (
                hashlib.md5(kv[0].encode()).hexdigest(),
                kv[0],
                kv[1],
            ),
        )[:k]
        return sorted(v for _, v in ranked)

    want = model(rows, 16)
    for n_parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "k string, v double").repartition(n_parts)
        assert bottomk_sample(df, F.col("k"), "v", k=16) == want, n_parts


def test_sampled_quantile_audit_rejects_short_input(spark):
    """The a5 oracle hard-codes full-k nearest-rank indices; a shorter
    sample must fail loudly instead of silently desyncing from it."""
    import pytest

    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        sampled_quantile_audit,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(f"k{i}", float(i)) for i in range(10)], "k string, v double")
    with pytest.raises(ValueError, match="fixed-k rank arithmetic"):
        sampled_quantile_audit(df, F.col("k"), "v", k=64)


def test_hll_summary_of_empty_registers_is_a_zero_sketch(spark):
    """An empty register frame (nothing hashed — a lake of all-null
    texts) is a valid ZERO sketch: S = m*2^cap, V = m, estimate 0 via
    the linear-counting branch — not a NULL that crashes the stats
    reader downstream."""
    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        HLL_M,
        HLL_RANK_CAP,
        hll_summary_of_registers,
    )

    empty = spark.createDataFrame([], "reg int, max_rank int")
    row = hll_summary_of_registers(empty).collect()[0]
    assert row["s_sum"] == HLL_M * 2**HLL_RANK_CAP
    assert row["v_zero"] == HLL_M
    assert row["est_milli"] == 0


def test_grouped_hll_matches_per_group_global_sketch(spark):
    """a11's grouped sketch is DEFINITIONALLY the global sketch run per
    group: for every group, (s_sum, v_zero, est_milli) must equal
    hll_summary over that group's rows alone; and the grouped registers
    merge across day-splits by max exactly like the global ones."""
    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        hll_registers_by,
        hll_summary,
        hll_summary_by,
    )

    rows = [(f"g{i % 3}", f"user{i % 57}") for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    got = {
        r["grp"]: (r["s_sum"], r["v_zero"], r["est_milli"])
        for r in hll_summary_by(hll_registers_by(df, "grp", F.col("uid"))).collect()
    }
    for g in ("g0", "g1", "g2"):
        want = hll_summary(
            df.filter(F.col("grp") == g), F.col("uid")
        ).collect()[0]
        assert got[g] == (want["s_sum"], want["v_zero"], want["est_milli"]), g

    # day-split merge law: max per (grp, reg) over the two halves'
    # register frames == registers of the union
    a = hll_registers_by(df.limit(200), "grp", F.col("uid"))
    b = hll_registers_by(
        spark.createDataFrame(rows[200:], "grp string, uid string"),
        "grp",
        F.col("uid"),
    )
    merged = (
        a.unionByName(b)
        .groupBy("grp", "reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    whole = hll_registers_by(df, "grp", F.col("uid"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
