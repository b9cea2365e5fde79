"""Corpus tokenization job: the operational surface of the tokenize
story t23/t24 tell — build a vocabulary over a curated corpus and
encode every document to ids, as the step a training pipeline runs
after `curate` and before sequence packing.

Two modes sharing one layout:

  word  — whole-token dictionary encoding (operators/text.py::
          build_vocab/vocab_encode): top-V tokens get dense ids,
          everything else -1 (UNK).
  bpe   — bounded deterministic byte-pair encoding (bpe_train/
          bpe_encode): merges train on the bounded word-type table,
          documents encode to subword ids with NO OOV (every symbol is
          a corpus character or a merge).

Output layout under ``output_dir``:

  vocab.json   the id table a downstream trainer ships: mode, params,
               and (word) token->id or (bpe) merge list + symbol->id —
               written BEFORE the encoded parquet, so the parquet's
               _SUCCESS marker only ever commits a complete artifact
               (the build_pq_layer convention)
  encoded/     parquet of (id_col, n_tokens, n_oov|n_subwords,
               ids array<int>)

Scale shape: both modes collect only constant-size tables to the
driver (top-V vocab / word-type table + the provably bounded symbol
vocab); the encode pass is a map + broadcast join + one doc-keyed
reassembly regardless of corpus size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def tokenize_corpus(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    mode: str = "word",
    vocab_size: int = 256,
    n_merges: int = 8,
    max_word_types: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Returns counts only (the O5 XCom rule): n_docs, n_tokens, and
    per-mode vocabulary stats."""
    from ..operators.text import (
        bpe_encode,
        bpe_symbol_vocab,
        bpe_train,
        build_vocab,
        vocab_encode,
    )
    from ..pinning import pin

    docs = spark.read.parquet(input_path)
    os.makedirs(output_dir, exist_ok=True)
    vocab_path = os.path.join(output_dir, "vocab.json")
    encoded_dir = os.path.join(output_dir, "encoded")

    if mode == "word":
        vocab = pin(build_vocab(docs, text_col, vocab_size=vocab_size))
        table = {r["token"]: r["token_id"] for r in vocab.collect()}
        with open(vocab_path, "w") as f:
            json.dump(
                {"mode": "word", "vocab_size": vocab_size, "tokens": table},
                f,
                sort_keys=True,
            )
        enc = vocab_encode(docs, vocab, id_col, text_col)
        enc.write.mode("overwrite").parquet(encoded_dir)
        stats = spark.read.parquet(encoded_dir).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_oov").alias("n_oov"),
        ).collect()[0]
        return {
            "mode": "word",
            "n_docs": int(stats["n_docs"]),
            "n_tokens": int(stats["n_tokens"] or 0),
            "n_oov": int(stats["n_oov"] or 0),
            "n_vocab": len(table),
        }
    if mode == "bpe":
        merges = bpe_train(
            docs, text_col, n_merges=n_merges, max_word_types=max_word_types
        )
        vocab = pin(bpe_symbol_vocab(docs, merges, id_col, text_col))
        syms = {r["sym"]: r["sym_id"] for r in vocab.collect()}
        with open(vocab_path, "w") as f:
            json.dump(
                {
                    "mode": "bpe",
                    "n_merges": n_merges,
                    "max_word_types": max_word_types,
                    "merges": [[l, r, c] for l, r, c in merges],
                    "symbols": syms,
                },
                f,
                sort_keys=True,
            )
        enc = bpe_encode(docs, merges, id_col, text_col, vocab=vocab)
        enc.write.mode("overwrite").parquet(encoded_dir)
        stats = spark.read.parquet(encoded_dir).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_subwords").alias("n_subwords"),
        ).collect()[0]
        return {
            "mode": "bpe",
            "n_docs": int(stats["n_docs"]),
            "n_tokens": int(stats["n_tokens"] or 0),
            "n_subwords": int(stats["n_subwords"] or 0),
            "n_merges": len(merges),
            "n_symbols": len(syms),
        }
    raise ValueError(f"unknown tokenize mode {mode!r} — use 'word' or 'bpe'")
