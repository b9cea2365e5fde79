"""The tokenize-docs job (jobs/tokenize.py): the operational surface of
the t23/t24 tokenize story — vocab.json + encoded/ parquet, both modes.
"""

from __future__ import annotations

import json
import os

from pokemon_showdown_airflow_etl_spark.jobs.tokenize import tokenize_corpus


def _write_docs(spark, path):
    rows = [
        (1, "low lower low newest"),
        (2, "newest newest widest low"),
        (3, None),
        (4, ""),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)


def test_tokenize_word_mode(spark, tmp_path):
    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "tok")
    _write_docs(spark, inp)
    stats = tokenize_corpus(spark, inp, out, mode="word", vocab_size=3)
    assert stats["n_docs"] == 4 and stats["n_vocab"] == 3
    assert stats["n_tokens"] == 8
    # counts: low=3, newest=3, lower=1, widest=1 -> top-3 keeps
    # low/newest/lower (count desc, token asc); 'widest' is the one OOV
    assert stats["n_oov"] == 1
    vocab = json.load(open(os.path.join(out, "vocab.json")))
    assert vocab["mode"] == "word"
    # (count desc, token asc): low=3, newest=3, lower=1, widest=1 ->
    # top-3 = low, newest, lower
    assert set(vocab["tokens"]) == {"low", "newest", "lower"}
    enc = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "encoded")).collect()
    }
    assert set(enc) == {1, 2, 3, 4}, "anchored on input ids"
    assert enc[3]["ids"] == [] and enc[4]["n_tokens"] == 0
    assert enc[2]["n_oov"] == 1  # widest


def test_tokenize_bpe_mode(spark, tmp_path):
    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "tok")
    _write_docs(spark, inp)
    stats = tokenize_corpus(spark, inp, out, mode="bpe", n_merges=4)
    assert stats["n_docs"] == 4 and stats["n_merges"] == 4
    assert stats["n_tokens"] == 8 and stats["n_subwords"] > stats["n_tokens"]
    vocab = json.load(open(os.path.join(out, "vocab.json")))
    assert vocab["mode"] == "bpe" and len(vocab["merges"]) == 4
    # every symbol is a corpus char or a merge product; ids dense
    merged = {l + r for l, r, _ in vocab["merges"]}
    chars = set("lowernewstid")
    assert all(s in merged or s in chars for s in vocab["symbols"])
    assert sorted(vocab["symbols"].values()) == list(range(len(vocab["symbols"])))
    enc = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "encoded")).collect()
    }
    assert set(enc) == {1, 2, 3, 4}
    assert enc[3]["ids"] == [] and enc[4]["n_subwords"] == 0
    # no OOV concept in bpe mode: every id resolves to a symbol
    inv = {v: k for k, v in vocab["symbols"].items()}
    assert all(i in inv for i in enc[1]["ids"])
