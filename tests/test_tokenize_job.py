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


def test_tokenize_rebuild_crash_keeps_committed_artifact(spark, tmp_path, monkeypatch):
    """vocab.json and encoded/ are ONE artifact: a crash anywhere
    during a rebuild (injected at the encode step, after the staged
    vocab.json exists) must leave the previously committed pair intact
    and mutually consistent — the old in-place write left a NEW vocab
    beside OLD ids. A later rebuild heals."""
    import pytest

    from pokemon_showdown_airflow_etl_spark.jobs import tokenize as tok_mod
    from pokemon_showdown_airflow_etl_spark.operators import text as text_ops

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "tok")
    _write_docs(spark, inp)
    stats1 = tokenize_corpus(spark, inp, out, mode="word", vocab_size=3)
    vocab_before = json.load(open(os.path.join(out, "vocab.json")))
    ids_before = sorted(
        map(tuple, spark.read.parquet(os.path.join(out, "encoded")).collect())
    )

    real = text_ops.vocab_encode

    def boom(*a, **kw):
        raise RuntimeError("injected crash mid-rebuild")

    # tokenize_corpus imports the operator inside the function body, so
    # patching the source module intercepts the rebuild's encode step
    monkeypatch.setattr(text_ops, "vocab_encode", boom)
    with pytest.raises(RuntimeError, match="injected"):
        tokenize_corpus(spark, inp, out, mode="word", vocab_size=2)
    monkeypatch.setattr(text_ops, "vocab_encode", real)

    # committed pair untouched: OLD vocab (size 3) beside OLD ids —
    # never the crashed rebuild's size-2 vocab
    assert json.load(open(os.path.join(out, "vocab.json"))) == vocab_before
    ids_after = sorted(
        map(tuple, spark.read.parquet(os.path.join(out, "encoded")).collect())
    )
    assert ids_after == ids_before

    # the healed rebuild clears residue and commits the new artifact
    stats2 = tokenize_corpus(spark, inp, out, mode="word", vocab_size=2)
    assert stats2["n_vocab"] == 2
    assert not os.path.isdir(out + ".staging") and not os.path.isdir(out + ".old")
    assert len(json.load(open(os.path.join(out, "vocab.json")))["tokens"]) == 2
    # first build's stats shape still sane
    assert stats1["n_vocab"] == 3


def test_tokenize_crash_between_renames_restores_old_artifact(
    spark, tmp_path, monkeypatch
):
    """A crash BETWEEN the two swap renames (out parked in old/,
    staging never renamed in) must be healed by the next run restoring
    the committed snapshot instead of deleting it as residue."""
    import pytest

    from pokemon_showdown_airflow_etl_spark.jobs import tokenize as tok_mod

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "tok")
    _write_docs(spark, inp)
    tokenize_corpus(spark, inp, out, mode="word", vocab_size=3)
    vocab_before = json.load(open(os.path.join(out, "vocab.json")))

    real_rename = os.rename

    def crash_on_swap_in(src, dst):
        if dst == out and src == out + ".staging":
            raise RuntimeError("injected crash between swap renames")
        return real_rename(src, dst)

    monkeypatch.setattr(tok_mod.os, "rename", crash_on_swap_in)
    with pytest.raises(RuntimeError, match="between swap renames"):
        tokenize_corpus(spark, inp, out, mode="word", vocab_size=2)
    monkeypatch.setattr(tok_mod.os, "rename", real_rename)
    assert not os.path.isdir(out), "the failure mode under test"
    assert os.path.exists(os.path.join(out + ".old", "encoded", "_SUCCESS"))

    # next run restores the snapshot before rebuilding on top of it
    stats = tokenize_corpus(spark, inp, out, mode="word", vocab_size=3)
    assert stats["n_vocab"] == 3
    assert json.load(open(os.path.join(out, "vocab.json"))) == vocab_before
    assert not os.path.isdir(out + ".staging") and not os.path.isdir(out + ".old")
