"""Subword (BPE-style) vocabulary: bpe_train / bpe_segment / bpe_encode
(operators/text.py). The t24 oracle re-derives the whole artifact in
unrolled DuckDB SQL; these tests pin the operator-level contracts a
corpus-scale sweep can't isolate: greedy tie-breaks, the double-space
replace encoding's greedy-run behavior, the word-type cap, anchoring,
and the bounded-vocab invariant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators.text import (
    bpe_encode,
    bpe_segment,
    bpe_symbol_vocab,
    bpe_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _reference_bpe(word_freq, n_merges):
    """Sennrich-style greedy BPE on a word-frequency dict — the
    independent model the operator must match: count ALL adjacent pairs
    (overlapping included), merge the (count desc, left asc, right asc)
    winner left-to-right non-overlapping, repeat."""
    segs = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freq[w]
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_train_matches_reference_model(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest widest"),
    ]
    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 1}
    want, _ = _reference_bpe(freq, 6)
    got = bpe_train(_docs(spark, rows), "text", n_merges=6, max_word_types=16)
    assert got == want


def test_replace_encoding_is_greedy_on_repeated_runs(spark):
    # the hard case for any string-replace formulation: a run of n
    # repeated symbols must merge to floor(n/2) pairs plus at most one
    # leftover, greedy left-to-right. The old single-space two-pass
    # convention diverged at n >= 5 ('aaaaa' -> [aa, a, aa]); the
    # double-space encoding consumes one boundary space per side and
    # restores it, so adjacent matches never share a consumed char and
    # one replace pass per merge IS the greedy scan.
    freq = {"aaaa": 4, "aaa": 3, "aaaaa": 2, "aaaaaa": 1}
    _, segs_after_one = _reference_bpe(freq, 1)
    assert segs_after_one["aaaaa"] == ["aa", "aa", "a"], "reference sanity"
    assert segs_after_one["aaaaaa"] == ["aa", "aa", "aa"], "reference sanity"
    want_merges, want_segs = _reference_bpe(freq, 2)
    rows = [(1, " ".join(w for w, n in freq.items() for _ in range(n)))]
    merges = bpe_train(_docs(spark, rows), "text", n_merges=2, max_word_types=16)
    assert merges == want_merges
    seg = (
        spark.createDataFrame([(w,) for w in freq], "tok string")
        .select("tok", bpe_segment(F.col("tok"), merges).alias("seg"))
        .collect()
    )
    assert {r["tok"]: r["seg"].split(" ") for r in seg} == want_segs


def test_word_type_cap_binds(spark):
    # 'zz' is frequent enough to dominate merges unless the cap (top-1
    # by count desc, word asc) excludes it: only 'ab' (freq 3) trains
    rows = [(1, "ab ab ab zz zz")]
    merges = bpe_train(_docs(spark, rows), "text", n_merges=1, max_word_types=1)
    assert merges == [("a", "b", 3)]


def test_train_stops_when_no_pairs_remain(spark):
    # single-char word types have no adjacent pairs after full merging
    rows = [(1, "ab ab")]
    merges = bpe_train(_docs(spark, rows), "text", n_merges=5, max_word_types=4)
    assert merges == [("a", "b", 2)]


def test_encode_anchored_and_bounded_vocab(spark):
    rows = [(1, "low lower low"), (2, None), (3, "")]
    df = _docs(spark, rows)
    merges = bpe_train(df, "text", n_merges=3, max_word_types=8)
    vocab = bpe_symbol_vocab(df, merges).collect()
    merged_syms = {l + r for l, r, _ in merges}
    chars = set("lower")
    assert all(r["sym"] in merged_syms or r["sym"] in chars for r in vocab)
    # dense ids 0..V-1, ranked count desc then symbol asc
    ranked = sorted(vocab, key=lambda r: (-r["n"], r["sym"]))
    assert [r["sym_id"] for r in ranked] == list(range(len(vocab)))

    enc = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    assert set(enc) == {1, 2, 3}, "output must anchor on INPUT ids"
    assert enc[2]["ids"] == [] and enc[3]["ids"] == []
    assert enc[2]["n_tokens"] == 0 and enc[3]["n_subwords"] == 0
    assert enc[1]["n_tokens"] == 3
    # id stream decodes back to the exact segmentation
    sym_of = {r["sym_id"]: r["sym"] for r in vocab}
    _, segs = _reference_bpe({"low": 2, "lower": 1}, 3)
    want_stream = segs["low"] + segs["lower"] + segs["low"]
    assert [sym_of[i] for i in enc[1]["ids"]] == want_stream


def test_segmentation_is_lossless_and_deterministic(spark):
    """Property: for ANY token, joining its segmentation reconstructs
    the token exactly (merges only ever glue adjacent symbols), and
    segmentation is idempotent — re-segmenting the re-joined token
    reproduces the same symbol stream."""
    import random

    rng = random.Random(99)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ] + ["a", "b", "ab", "ba", "aaaaaaaa"]
    corpus = " ".join(words)
    df = _docs(spark, [(1, corpus)])
    merges = bpe_train(df, "text", n_merges=6, max_word_types=32)
    toks = spark.createDataFrame([(w,) for w in set(words)], "tok string")
    seg1 = F.col("_s1")
    rows = (
        toks.withColumn("_s1", bpe_segment(F.col("tok"), merges))
        .withColumn(
            "_s2",
            bpe_segment(F.concat_ws("", F.split(seg1, " ")), merges),
        )
        .collect()
    )
    for r in rows:
        assert r["_s1"].replace(" ", "") == r["tok"], "lossless"
        assert r["_s2"] == r["_s1"], "fixpoint: re-segmenting is stable"


def test_greedy_semantics_match_reference_on_random_runs(spark):
    """Randomized sweep of the ADVICE-r9 fix: corpora drawn from a
    run-heavy alphabet (repeated-symbol runs are exactly where the old
    two-pass convention diverged) must train the same merge table AND
    segment every word identically to the canonical greedy reference."""
    import random
    from collections import Counter

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("aab") for _ in range(rng.randint(1, 10)))
            for _ in range(40)
        ] + ["aaaaa", "aaaaaa", "aaaaaaa", "ababab"]
        freq = Counter(words)
        want_merges, want_segs = _reference_bpe(freq, 4)
        df = _docs(spark, [(1, " ".join(words))])
        merges = bpe_train(df, "text", n_merges=4, max_word_types=64)
        assert merges == want_merges, f"seed {seed}"
        seg = (
            spark.createDataFrame([(w,) for w in freq], "tok string")
            .select("tok", bpe_segment(F.col("tok"), merges).alias("seg"))
            .collect()
        )
        got = {r["tok"]: r["seg"].split(" ") for r in seg}
        assert got == want_segs, f"seed {seed}"
