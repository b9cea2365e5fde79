"""The corpus-curation job: stagewise counts, determinism, and the
partitioned-by-split layout of the written corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.jobs.curate import curate_corpus


def _corpus(spark):
    """A corpus with every case the pipeline must handle:
    - 0/1: exact dups (same text modulo case+whitespace) -> keep 0
    - 2/3: near dups (40 shared tokens, one divergent) -> keep 2
    - 4: too short for the quality floor (3 tokens) -> dropped
    - 5..24: clean unique docs that survive everything
    """
    base_a = " ".join(f"atok{i}" for i in range(40))
    base_b = " ".join(f"btok{i}" for i in range(40))
    rows = [
        (0, base_a + " ending one", "en", "srcA"),
        (1, "  " + base_a.upper() + "   ENDING ONE ", "en", "srcA"),
        (2, base_b + " different tail here", "en", "srcB"),
        (3, base_b + " different tail gone", "en", "srcB"),
        (4, "way too short", "en", "srcC"),
    ] + [
        (
            5 + i,
            " ".join(f"u{i}w{j} the a of to in" for j in range(8)),
            "en",
            "srcD",
        )
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))


def test_curate_corpus_stages_layout_and_determinism(spark, tmp_path):
    src = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    _corpus(spark).write.parquet(src)

    stats = curate_corpus(spark, src, out)
    assert stats["n_input"] == 25
    assert stats["n_after_exact_dedup"] == 24  # doc 1 gone (doc 0 kept)
    assert stats["n_after_near_dedup"] == 23  # doc 3 gone (doc 2 kept)
    assert stats["n_after_quality"] == 22  # doc 4 gone
    assert stats["n_written"] == 22
    assert stats["n_written"] == sum(stats["splits"].values())
    assert set(stats["splits"]) <= {"train", "val", "test"}
    assert stats["train_bins"] >= 1
    assert stats["train_tokens"] > 0

    # layout: hive-partitioned by split, readable with partition pruning
    assert sorted(
        d for d in os.listdir(out) if d.startswith("split=")
    ) == sorted(f"split={s}" for s in stats["splits"])
    written = spark.read.parquet(out)
    ids = {r["doc_id"] for r in written.select("doc_id").collect()}
    assert 1 not in ids and 3 not in ids and 4 not in ids
    assert {0, 2} <= ids

    # determinism: a re-run over the same input reproduces rows + stats
    out2 = str(tmp_path / "curated2")
    stats2 = curate_corpus(spark, src, out2)
    assert stats2 == stats
    again = spark.read.parquet(out2)
    a = sorted(map(tuple, written.select("doc_id", "split").collect()))
    b = sorted(map(tuple, again.select("doc_id", "split").collect()))
    assert a == b


def test_with_quality_matches_quality_score(spark, sf_dir):
    """The appended-column scorer must be bit-identical to the t7
    (id, quality) frame — curate's filter IS t7's threshold."""
    from pokemon_showdown_airflow_etl_spark.io import table
    from pokemon_showdown_airflow_etl_spark.operators.text import (
        quality_score,
        with_quality,
    )

    docs = table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, with_quality(docs, "text").select("doc_id", "quality").collect())
    )
    b = sorted(map(tuple, quality_score(docs, "doc_id", "text").collect()))
    assert a == b


def test_curated_output_prunes_split_partitions(spark, tmp_path):
    """Training readers filter split='train'; the write layout must turn
    that into directory-level partition pruning, not a file scan."""
    import contextlib
    import io

    src = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    _corpus(spark).write.parquet(src)
    curate_corpus(spark, src, out)

    df = spark.read.parquet(out).filter(F.col("split") == "train")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(split" in plan, plan


def test_curate_empty_survivor_set_returns_zeros(spark, tmp_path):
    """Every doc failing the quality floor must yield zero-count stats,
    not an AnalysisException from re-reading an empty partitioned dir."""
    src = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    spark.createDataFrame(
        [(i, "too short", "en", "s") for i in range(5)],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(src)
    stats = curate_corpus(spark, src, out)
    assert stats["n_written"] == 0
    assert stats["splits"] == {}
    assert stats["train_bins"] == 0 and stats["train_tokens"] == 0


def test_curate_train_bins_counts_spanning_tail_docs(spark, tmp_path):
    """A last document longer than the pack budget spans several context
    windows; train_bins must count ceil(tokens/budget) per pack
    partition, not max(bin_id)+1."""
    src = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    # one source, docs long enough to pass quality; total tokens per
    # (source, shard) partition known exactly
    rows = [
        (i, " ".join(f"w{i}x{j} the of" for j in range(50)), "en", "srcZ")
        for i in range(8)
    ]  # 150 tokens per doc
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(src)
    stats = curate_corpus(spark, src, out, pack_budget=64)
    # per-partition ceil sums: with 150-token docs and budget 64, a
    # 1-doc partition alone must report ceil(150/64) = 3 bins, so the
    # total is always >= 3 * n_partitions_with_docs > n_docs when the
    # old max(bin_id)+1 formula would report fewer
    import math

    written = spark.read.parquet(out)
    train_docs = written.filter(F.col("split") == "train").count()
    assert stats["train_bins"] >= math.ceil(150 / 64)  # spanning tail counted
    assert stats["train_tokens"] == 150 * train_docs


def test_curate_decontaminates_against_eval_set(spark, tmp_path):
    """Docs sharing a 4-gram with the held-out eval corpus are dropped;
    clean docs and the stats chain are unaffected."""
    src = str(tmp_path / "raw")
    ev = str(tmp_path / "eval")
    out = str(tmp_path / "curated")
    _corpus(spark).write.parquet(src)
    # eval doc quoting the doc-7-specific 4-gram "u2w0 the a of" (u2w0
    # appears only in doc 7 = id 5+2); every other 4-gram in the eval
    # text contains an out-of-corpus token, so exactly doc 7 is dropped
    spark.createDataFrame(
        [(9000, "zz yy xx ww u2w0 the a of")],
        "doc_id long, text string",
    ).write.parquet(ev)

    base = curate_corpus(spark, src, str(tmp_path / "c0"))
    stats = curate_corpus(spark, src, out, eval_path=ev)
    assert stats["n_after_near_dedup"] == base["n_after_near_dedup"]
    assert stats["n_after_decontam"] == base["n_after_near_dedup"] - 1
    assert stats["n_written"] == base["n_written"] - 1
    ids = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert 7 not in ids
    # without an eval set the key mirrors the near-dup count
    assert base["n_after_decontam"] == base["n_after_near_dedup"]


def test_curate_scrub_stage_redacts_and_counts(spark, tmp_path):
    """The t18 scrub stage: planted PII in a surviving doc is redacted
    in the WRITTEN corpus, n_redacted counts affected docs, clean docs
    are byte-identical, and --no-scrub restores the raw text."""
    src = str(tmp_path / "raw")
    def base(i):  # distinct per doc so near-dedup keeps all three
        return " ".join(f"d{i}w{j} the a of to in is it" for j in range(10))

    rows = [
        (0, base(0) + " mail me at someone@example.com today", "en", "srcA"),
        (1, base(1) + " totally clean tail one", "en", "srcB"),
        (2, base(2) + " see https://ex.org/p?utm_source=x&y=2 ok", "en", "srcC"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    df.write.parquet(src)

    stats = curate_corpus(spark, src, str(tmp_path / "c1"))
    assert stats["n_redacted"] == 2
    written = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "c1")).collect()
    }
    assert "someone@example.com" not in written[0] and "<EMAIL>" in written[0]
    assert written[1] == rows[1][1]  # clean doc untouched
    assert written[2].endswith(" see https://ex.org/p ok")

    raw = curate_corpus(spark, src, str(tmp_path / "c2"), scrub=False)
    assert raw["n_redacted"] == 0
    rewritten = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "c2")).collect()
    }
    assert rewritten[0] == rows[0][1]


def test_curate_dedups_against_signature_corpus(spark, tmp_path):
    """curate --dedup-against-corpus: docs near-duplicating the live
    corpus's REGISTERED survivors are dropped (read-only — the corpus
    itself is untouched); docs matching only unregistered/rejected
    corpus content pass through."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
        ingest_signature_batch,
    )

    def words(tag, n=30):
        return " ".join(f"{tag}{j}" for j in range(n))

    # corpus: doc 0 registered; doc 1 is a within-batch dup of 0 (so
    # its content IS registered via 0)
    corpus = spark.createDataFrame(
        [(0, "corpus base " + words("c")), (1, "corpus base " + words("c"))],
        "doc_id long, text string",
    )
    sig_root = str(tmp_path / "sig")
    ingest_signature_batch(spark, corpus, sig_root, "seed")
    committed_before = _committed_batches(sig_root + "/members")

    src = str(tmp_path / "raw")
    rows = [
        (100, "corpus base " + words("c")),  # dup of registered content
        (101, "fresh drop " + words("f")),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("srcA")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(src)

    stats = curate_corpus(
        spark, src, str(tmp_path / "out"), corpus_sig_root=sig_root
    )
    assert stats["n_after_near_dedup"] == 2
    assert stats["n_after_corpus_dedup"] == 1
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).select("doc_id").collect()
    }
    assert ids == {101}
    # read-only: curate registered nothing
    assert _committed_batches(sig_root + "/members") == committed_before

    # without the flag the stat mirrors the decontam count
    base = curate_corpus(spark, src, str(tmp_path / "out2"))
    assert base["n_after_corpus_dedup"] == base["n_after_decontam"] == 2


def test_curate_rejects_nonexistent_corpus_root(spark, tmp_path):
    """A typo'd --dedup-against-corpus path must fail loudly, never
    silently skip the gate and report success."""
    import pytest as _pytest

    src = str(tmp_path / "raw")
    _corpus(spark).write.parquet(src)
    with _pytest.raises(ValueError, match="does not exist"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "out"),
            corpus_sig_root=str(tmp_path / "no-such-root"),
        )


def test_curate_span_dedup_stage_strips_boilerplate(spark, tmp_path):
    """The optional t20 stage: a 10-token boilerplate window pasted
    into several otherwise-distinct docs is stripped from ALL of them
    (whole-doc dedup keeps every host doc — their tails differ), the
    drop count lands in n_paragraphs_dropped, and the written text is
    the reassembled clean_text."""
    boiler = " ".join(f"bp{i}" for i in range(10))
    rows = [
        (
            100 + i,
            boiler + " " + " ".join(f"d{i}w{j} the a of to in" for j in range(8)),
            "en",
            "srcS",
        )
        for i in range(3)
    ] + [
        (
            200 + i,
            " ".join(f"u{i}w{j} the a of to in" for j in range(8)),
            "en",
            "srcU",
        )
        for i in range(5)
    ]
    src = str(tmp_path / "raw")
    out = str(tmp_path / "curated")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)

    stats = curate_corpus(spark, src, out, span_dedup_tokens=10)
    # every host doc survives dedup (distinct tails) but loses exactly
    # its boilerplate window
    assert stats["n_after_near_dedup"] == 8
    assert stats["n_paragraphs_dropped"] == 3
    written = spark.read.parquet(out)
    texts = {
        r["doc_id"]: r["text"] for r in written.select("doc_id", "text").collect()
    }
    for i in range(3):
        assert 100 + i in texts
        assert "bp0" not in texts[100 + i]
        assert f"d{i}w0" in texts[100 + i]

    # stage off: boilerplate survives, stat reports zero
    out2 = str(tmp_path / "curated2")
    stats2 = curate_corpus(spark, src, out2)
    assert stats2["n_paragraphs_dropped"] == 0
    kept = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out2).select("doc_id", "text").collect()
    }
    assert "bp0" in kept[100]


def test_curate_semantic_admission_drops_corpus_dups(spark, tmp_path):
    """curate --embed-admit-root (VERDICT r7 item 3): docs whose
    precomputed embeddings are s11 admission-duplicates of the
    embedding index's registered members are dropped — and ONLY those
    (docs with novel embeddings, and docs with no embedding row at
    all, pass through). Read-only: the index registers nothing."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        _committed_batches,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        ingest_embedding_batch,
        init_embedding_index,
    )

    dim = 8

    def basis(i):
        return [1.0 if j == i else 0.0 for j in range(dim)]

    # index: 8 orthogonal corpus vectors, first-8 seed quantizer
    corpus_emb = spark.createDataFrame(
        [(i, basis(i)) for i in range(dim)], "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "idx")
    init_embedding_index(spark, corpus_emb, root, n_cells=8, train=False)
    ingest_embedding_batch(spark, corpus_emb, root, "seed", threshold=2.0)
    committed_before = _committed_batches(root + "/members")

    def doc_text(i):
        return " ".join(f"d{i}w{j} the a of to in" for j in range(8))

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(100 + i, doc_text(i), "en", "srcA") for i in range(3)],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)

    # 100 duplicates corpus vec 0; 101 is novel (cos 1/sqrt(8) to every
    # member); 102 has NO embedding row
    emb_path = str(tmp_path / "doc_emb")
    spark.createDataFrame(
        [(100, basis(0)), (101, [1.0] * dim)],
        "doc_id long, embedding array<double>",
    ).write.parquet(emb_path)

    stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "out"),
        embed_admit_root=root,
        embeddings_path=emb_path,
        embed_admit_threshold=0.9,
    )
    assert stats["n_after_corpus_dedup"] == 3
    assert stats["n_semantic_dups"] == 1
    assert stats["n_after_semantic_dedup"] == 2
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).select("doc_id").collect()
    }
    assert ids == {101, 102}
    # read-only: curate registered nothing in the index
    assert _committed_batches(root + "/members") == committed_before

    # without the flag the stats are inert
    base = curate_corpus(spark, src, str(tmp_path / "out2"))
    assert base["n_semantic_dups"] == 0
    assert base["n_after_semantic_dedup"] == base["n_after_corpus_dedup"] == 3


def test_curate_semantic_admission_guards(spark, tmp_path):
    """The semantic leg fails loudly on a fresh/typo'd index root
    (admitting against nothing would silently accept every duplicate)
    and on a missing embeddings frame."""
    import pytest as _pytest

    src = str(tmp_path / "raw")
    _corpus(spark).write.parquet(src)
    emb_path = str(tmp_path / "doc_emb")
    spark.createDataFrame(
        [(0, [1.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(emb_path)

    with _pytest.raises(ValueError, match="requires embeddings_path"):
        curate_corpus(
            spark, src, str(tmp_path / "o1"), embed_admit_root=str(tmp_path / "idx")
        )
    with _pytest.raises(FileNotFoundError, match="no committed centroids"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o2"),
            embed_admit_root=str(tmp_path / "no-such-idx"),
            embeddings_path=emb_path,
        )


def test_curate_perplexity_band_cuts_both_tails(spark, tmp_path):
    """The t25 integration (VERDICT r9 item 4): a planted boilerplate
    doc (one word repeated — near-certain bigrams, bottom NLL tail) and
    a planted gibberish doc (every bigram unseen — top NLL tail) must
    BOTH fall to the CCNet-style band cut, while the normal middle
    ships. Without the band, both planted docs ship — the gap this
    stage closes over the t7 heuristic floor."""
    rows = [
        (0, "spam " * 400, "en", "boiler"),
        (1, " ".join(f"zx{i}q" for i in range(60)), "en", "gibber"),
    ] + [
        (
            2 + i,
            " ".join(f"u{i}w{j} the a of to in" for j in range(8)),
            "en",
            "srcD",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    src, out = str(tmp_path / "raw"), str(tmp_path / "curated")
    df.write.parquet(src)

    stats = curate_corpus(
        spark, src, out, min_quality=0.0, perplexity_band=(0.05, 0.9)
    )
    assert stats["n_after_quality"] == 22
    assert stats["n_ppl_cut_low"] == 1, "boilerplate tail"
    assert stats["n_ppl_cut_high"] == 1, "gibberish tail"
    assert stats["n_after_perplexity"] == 20 == stats["n_written"]
    assert len(stats["ppl_band_micro"]) == 2
    assert stats["ppl_band_micro"][0] <= stats["ppl_band_micro"][1]
    ids = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert 0 not in ids and 1 not in ids
    assert ids == set(range(2, 22))

    # band off: both planted docs pass the heuristic floor and ship
    out2 = str(tmp_path / "curated_noband")
    stats2 = curate_corpus(spark, src, out2, min_quality=0.0)
    ids2 = {r["doc_id"] for r in spark.read.parquet(out2).select("doc_id").collect()}
    assert {0, 1} <= ids2
    assert stats2["n_ppl_cut_low"] == 0 and stats2["n_after_perplexity"] == 22

    # deterministic: same input + band -> same stats and survivors
    out3 = str(tmp_path / "curated_again")
    stats3 = curate_corpus(
        spark, src, out3, min_quality=0.0, perplexity_band=(0.05, 0.9)
    )
    assert stats3 == stats


def test_curate_rejects_malformed_perplexity_band_even_on_empty_slice(
    spark, tmp_path
):
    """A malformed band must fail on an empty/filtered smoke slice
    exactly as it would on real data — never a false green."""
    import pytest

    src, out = str(tmp_path / "raw"), str(tmp_path / "c")
    # every doc falls below the quality floor -> zero survivors
    spark.createDataFrame(
        [(1, "x", "en", "s")], "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)
    with pytest.raises(ValueError, match="perplexity_band"):
        curate_corpus(
            spark, src, out, min_quality=0.99, perplexity_band=(0.9, 0.2)
        )


def _expected_mixture(train_counts: dict[str, int], alpha, num, den):
    """Pure-Python replica of temperature_mixture's integer contract:
    micro weights, floor targets capped at domain size, largest-
    remainder topping over uncapped domains (Hamilton's method)."""
    import math

    n_total = sum(train_counts.values())
    budget = (n_total * num) // den
    micro = {
        d: int(math.floor(n**alpha * 1_000_000 + 0.5))
        for d, n in train_counts.items()
    }
    tot = sum(micro.values())
    t0 = {d: min(train_counts[d], (micro[d] * budget) // tot) for d in micro}
    rem = {d: (micro[d] * budget) % tot for d in micro}
    leftover = budget - sum(t0.values())
    uncapped = sorted(
        (d for d in micro if t0[d] < train_counts[d]),
        key=lambda d: (-rem[d], d),
    )
    for d in uncapped[:leftover]:
        t0[d] += 1
    return budget, t0


def test_curate_mixture_stage_hits_exact_per_domain_budget(spark, tmp_path):
    """The t21/t22 integration (VERDICT r10 item 3): a planted skewed
    domain histogram must come out of the final mixture stage at
    EXACTLY the largest-remainder per-domain targets, with val/test
    holdouts untouched and the audit in the stats dict."""
    rows = [
        (i, " ".join(f"big{i}w{j} the a of to in" for j in range(8)), "en", "crawl")
        for i in range(120)
    ] + [
        (
            1000 + i,
            " ".join(f"sm{i}w{j} the a of to in" for j in range(8)),
            "en",
            "curated",
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    src = str(tmp_path / "raw")
    df.write.parquet(src)

    # reference run without the mixture: per-domain train counts
    out0 = str(tmp_path / "plain")
    stats0 = curate_corpus(spark, src, out0, min_quality=0.0)
    assert stats0["mixture_domains"] == {}
    plain = spark.read.parquet(out0)
    train_counts = {
        r["source"]: r["n"]
        for r in plain.filter(F.col("split") == "train")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    holdout_ids = {
        r["doc_id"]
        for r in plain.filter(F.col("split") != "train").collect()
    }
    budget, targets = _expected_mixture(train_counts, 0.5, 2, 5)

    out = str(tmp_path / "mixed")
    stats = curate_corpus(
        spark,
        src,
        out,
        min_quality=0.0,
        mixture_alpha=0.5,
        mixture_budget=(2, 5),
    )
    assert stats["n_train_before_mixture"] == sum(train_counts.values())
    assert stats["mixture_domains"] == {
        d: {"n_train": train_counts[d], "target": targets[d], "kept": targets[d]}
        for d in train_counts
    }
    written = spark.read.parquet(out)
    got = {
        r["source"]: r["n"]
        for r in written.filter(F.col("split") == "train")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {d: t for d, t in targets.items() if t > 0}
    # the exact total budget lands when no domain cap binds
    if all(targets[d] < train_counts[d] for d in targets):
        assert sum(got.values()) == budget
    # val/test pass through untouched
    assert {
        r["doc_id"] for r in written.filter(F.col("split") != "train").collect()
    } == holdout_ids
    # alpha < 1 upweights the small curated domain vs natural share
    assert targets["curated"] / train_counts["curated"] > targets[
        "crawl"
    ] / train_counts["crawl"]

    # deterministic: rerun -> identical stats
    out2 = str(tmp_path / "mixed2")
    stats2 = curate_corpus(
        spark, src, out2, min_quality=0.0, mixture_alpha=0.5, mixture_budget=(2, 5)
    )
    assert stats2 == stats


def test_curate_mixture_guards(spark, tmp_path):
    import pytest

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(1, "some words here to pass the floor easily today", "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)
    with pytest.raises(ValueError, match="mixture_budget"):
        curate_corpus(
            spark, src, str(tmp_path / "a"), mixture_alpha=0.5, mixture_budget=(0, 5)
        )
    with pytest.raises(ValueError, match="mixture_domain_col"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "b"),
            mixture_alpha=0.5,
            mixture_domain_col="no_such_col",
        )


def test_curate_perplexity_band_reads_stored_lm(spark, tmp_path):
    """--lm-root scores the band under the lake's STORED bigram LM
    (VERDICT r10 item 4). With a lake ingested from exactly this
    corpus the stored model equals the self-trained one, so the cut is
    bit-identical; a pre-facet lake falls back to self-training; a
    typo'd root fails loudly."""
    import shutil

    import pytest

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        LM_TABLE,
        ingest_signature_batch,
    )

    rows = [
        (0, "spam " * 400, "en", "boiler"),
        (1, " ".join(f"zx{i}q" for i in range(60)), "en", "gibber"),
    ] + [
        (
            2 + i,
            " ".join(f"u{i}w{j} the a of to in" for j in range(8)),
            "en",
            "srcD",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    src = str(tmp_path / "raw")
    df.write.parquet(src)
    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, df.filter("doc_id % 2 = 0"), root, "even")
    ingest_signature_batch(spark, df.filter("doc_id % 2 = 1"), root, "odd")

    self_stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "self"),
        min_quality=0.0,
        perplexity_band=(0.05, 0.9),
    )
    assert self_stats["ppl_lm"] == "self"
    stored_stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "stored"),
        min_quality=0.0,
        perplexity_band=(0.05, 0.9),
        lm_root=root,
    )
    assert stored_stats["ppl_lm"] == "stored"
    assert {k: v for k, v in stored_stats.items() if k != "ppl_lm"} == {
        k: v for k, v in self_stats.items() if k != "ppl_lm"
    }

    # pre-facet lake (no lm/ partitions): silent fallback to self-train
    shutil.rmtree(os.path.join(root, LM_TABLE))
    fb_stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "fallback"),
        min_quality=0.0,
        perplexity_band=(0.05, 0.9),
        lm_root=root,
    )
    assert fb_stats["ppl_lm"] == "self"
    assert {k: v for k, v in fb_stats.items() if k != "ppl_lm"} == {
        k: v for k, v in self_stats.items() if k != "ppl_lm"
    }

    with pytest.raises(ValueError, match="lm_root"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "typo"),
            min_quality=0.0,
            perplexity_band=(0.05, 0.9),
            lm_root=str(tmp_path / "no_such_root"),
        )


def test_curate_mixture_on_zero_survivors_returns_zeros(spark, tmp_path):
    """The mixture stage must behave on an empty survivor slice exactly
    as on real data: malformed budgets still fail loudly, a valid
    mixture returns the zero stats without crashing."""
    import pytest

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(1, "x", "en", "s")], "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)
    # every doc falls below the quality floor -> zero survivors
    stats = curate_corpus(
        spark, src, str(tmp_path / "out"), min_quality=0.99, mixture_alpha=0.5
    )
    assert stats["n_written"] == 0
    assert stats["mixture_domains"] == {}
    assert stats["n_train_before_mixture"] == 0
    with pytest.raises(ValueError, match="mixture_budget"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "out2"),
            min_quality=0.99,
            mixture_alpha=0.5,
            mixture_budget=(7, 5),
        )


def test_curate_mixture_zero_budget_empties_output_without_crash(spark, tmp_path):
    """A budget that floors to 0 can empty the output even when
    survivors exist (review finding r11): the empty-write gate must
    account for the post-mixture count, not just n_after_perplexity."""
    from pokemon_showdown_airflow_etl_spark.operators.sampling import hash_split

    # pick ids that deterministically land in the train split, so the
    # zero-target mixture removes every written row
    cand = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    train_ids = [
        r["doc_id"]
        for r in hash_split(cand, "doc_id").filter("split = 'train'").collect()
    ][:6]
    rows = [
        (i, " ".join(f"z{i}w{j} the a of to in" for j in range(8)), "en", "s")
        for i in train_ids
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)
    stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "out"),
        min_quality=0.0,
        mixture_alpha=0.5,
        mixture_budget=(1, 1000),  # floor(6/1000) = 0 docs
    )
    assert stats["n_after_quality"] == 6
    assert stats["n_train_before_mixture"] == 6
    assert stats["mixture_domains"]["s"]["kept"] == 0
    assert stats["n_written"] == 0 and stats["splits"] == {}


def test_curate_lm_root_rejects_non_corpus_directory(spark, tmp_path):
    """An existing directory that is NOT a signature corpus root (e.g.
    the lm/ facet subdir itself) must fail loudly, not silently
    self-train while claiming success (review finding r11)."""
    import pytest

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        ingest_signature_batch,
    )

    src = str(tmp_path / "raw")
    df = spark.createDataFrame(
        [
            (i, " ".join(f"q{i}w{j} the a of to in" for j in range(8)), "en", "s")
            for i in range(8)
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    df.write.parquet(src)
    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, df, root, "b1")
    with pytest.raises(ValueError, match="lm_root"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o1"),
            min_quality=0.0,
            perplexity_band=(0.05, 0.9),
            lm_root=os.path.join(root, "lm"),  # exists, but wrong dir
        )


def test_curate_reports_partial_lm_coverage(spark, tmp_path):
    """A corpus mixing facets=False and faceted batches serves a model
    trained on the faceted subset only — curate must say
    'stored_partial', not imply the corpus model (review finding r11)."""
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        ingest_signature_batch,
    )

    rows = [
        (i, " ".join(f"p{i}w{j} the a of to in" for j in range(8)), "en", "s")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    src = str(tmp_path / "raw")
    df.write.parquet(src)
    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, df.filter("doc_id < 6"), root, "old", facets=False)
    ingest_signature_batch(spark, df.filter("doc_id >= 6"), root, "new")
    stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "out"),
        min_quality=0.0,
        perplexity_band=(0.05, 0.9),
        lm_root=root,
    )
    assert stats["ppl_lm"] == "stored_partial"


def test_curate_mixture_token_budget_keeps_maximal_prefix(spark, tmp_path):
    """--mixture-budget-tokens: each domain keeps the maximal
    hash-ordered doc prefix whose token total fits its target —
    kept_tokens never overshoots, and adding the first excluded doc
    would overshoot (replicated in pure Python)."""
    import hashlib
    import math

    rows = [
        (i, " ".join(f"big{i}w{j} the a of to in" for j in range(8)), "en", "crawl")
        for i in range(60)
    ] + [
        (
            1000 + i,
            " ".join(f"sm{i}w{j} the a of to in" for j in range(4)),
            "en",
            "curated",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    src = str(tmp_path / "raw")
    df.write.parquet(src)

    budget = 600
    stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "out"),
        min_quality=0.0,
        mixture_alpha=0.5,
        mixture_budget_tokens=budget,
    )
    md = stats["mixture_domains"]
    assert sum(v["tok_target"] for v in md.values()) <= budget
    for dom, v in md.items():
        assert v["kept_tokens"] <= v["tok_target"]

    # python replica of the per-domain prefix rule over the TRAIN rows
    plain = curate_corpus(spark, src, str(tmp_path / "plain"), min_quality=0.0)
    written = spark.read.parquet(str(tmp_path / "plain"))
    train = [
        (r["doc_id"], r["source"], len(r["text"].split()))
        for r in written.filter("split = 'train'").collect()
    ]

    def order_key(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return (int(h[:2], 16) % 16, h, doc_id)

    counts: dict[str, int] = {}
    toks: dict[str, int] = {}
    for _, dom, n in train:
        counts[dom] = counts.get(dom, 0) + 1
        toks[dom] = toks.get(dom, 0) + n
    micro = {
        d: int(math.floor(n**0.5 * 1_000_000 + 0.5)) for d, n in counts.items()
    }
    tot = sum(micro.values())
    t0 = {d: min(toks[d], (micro[d] * budget) // tot) for d in micro}
    rem = {d: (micro[d] * budget) % tot for d in micro}
    L = budget - sum(t0.values())
    for d in sorted(
        (d for d in micro if t0[d] < toks[d]), key=lambda d: (-rem[d], d)
    )[:max(0, L)]:
        t0[d] += 1
    expect_tokens: dict[str, int] = {}
    expect_kept: dict[str, int] = {}
    for dom in counts:
        cum = 0
        kept = 0
        for doc_id, _, n in sorted(
            (r for r in train if r[1] == dom), key=lambda r: order_key(r[0])
        ):
            if cum + n > t0[dom]:
                break
            cum += n
            kept += 1
        expect_tokens[dom] = cum
        expect_kept[dom] = kept
    assert {d: v["kept_tokens"] for d, v in md.items()} == expect_tokens
    assert {d: v["kept"] for d, v in md.items()} == expect_kept
    assert {d: v["tok_target"] for d, v in md.items()} == t0


def _ml_corpus(spark):
    """20 judge-able docs in two disjoint-vocabulary topics plus one
    too-short-to-judge doc. Texts are offset-rotated so no two docs
    are near-dups of each other."""
    rows = [
        (
            i,
            " ".join(
                f"alpha{(i + j) % 10} beta{(i * 3 + j) % 10}" for j in range(8)
            ),
            "en",
            "phys",
        )
        for i in range(10)
    ] + [
        (
            100 + i,
            " ".join(
                f"gamma{(i + j) % 10} delta{(i * 3 + j) % 10}" for j in range(8)
            ),
            "xx",
            "food",
        )
        for i in range(10)
    ]
    rows.append((50, "solo", "en", "phys"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))


def test_curate_moore_lewis_keeps_the_in_domain_half(spark, tmp_path):
    """The t28 integration: with the 'en' rows as the in-domain seed
    and a 0.5 keep quantile, the contrastive cut drops exactly the
    out-of-domain topic (its bigrams are unseen by the in-domain LM)
    and the too-short doc passes through unjudged."""
    src, out = str(tmp_path / "raw"), str(tmp_path / "curated")
    _ml_corpus(spark).write.parquet(src)

    stats = curate_corpus(
        spark,
        src,
        out,
        min_quality=0.0,
        near_dup_threshold=0.99,
        ml_in_domain="lang = 'en'",
        ml_keep_quantile=0.5,
    )
    assert stats["n_after_quality"] == 21
    assert stats["n_ml_cut"] == 10
    assert stats["n_after_ml"] == 11 == stats["n_written"]
    assert len(stats["ml_threshold_micro"]) == 1
    ids = {
        r.doc_id
        for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert ids == set(range(10)) | {50}


def test_curate_moore_lewis_guards(spark, tmp_path):
    """Malformed quantile and an empty in-domain seed both fail loudly
    (the perplexity-band validation rule: before and regardless of the
    survivor gate)."""
    import pytest as _pytest

    src = str(tmp_path / "raw")
    _ml_corpus(spark).write.parquet(src)

    with _pytest.raises(ValueError, match="ml_keep_quantile"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o1"),
            ml_in_domain="lang = 'en'",
            ml_keep_quantile=1.5,
        )
    with _pytest.raises(ValueError, match="matched no surviving"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o2"),
            min_quality=0.0,
            ml_in_domain="lang = 'zz'",
        )


def test_curate_moore_lewis_contrast_from_stored_lm(spark, tmp_path):
    """--lm-root serves the Moore-Lewis CONTRAST model from the lake's
    lm/ facet. With a lake ingested from exactly this corpus the
    stored contrast equals the self-trained one, so the cut is
    bit-identical; a pre-facet lake falls back to self-training."""
    import shutil

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        LM_TABLE,
        ingest_signature_batch,
    )

    df = _ml_corpus(spark)
    src = str(tmp_path / "raw")
    df.write.parquet(src)
    root = str(tmp_path / "sig")
    ingest_signature_batch(spark, df.filter("doc_id % 2 = 0"), root, "even")
    ingest_signature_batch(spark, df.filter("doc_id % 2 = 1"), root, "odd")

    kw = dict(
        min_quality=0.0,
        near_dup_threshold=0.99,
        ml_in_domain="lang = 'en'",
        ml_keep_quantile=0.5,
    )
    self_stats = curate_corpus(spark, src, str(tmp_path / "self"), **kw)
    assert self_stats["ml_lm"] == "self"
    stored_stats = curate_corpus(
        spark, src, str(tmp_path / "stored"), lm_root=root, **kw
    )
    assert stored_stats["ml_lm"] == "stored"
    assert stored_stats["n_ml_cut"] == 10
    assert {k: v for k, v in stored_stats.items() if k != "ml_lm"} == {
        k: v for k, v in self_stats.items() if k != "ml_lm"
    }

    # pre-facet lake (no lm/ partitions): silent fallback to self-train
    shutil.rmtree(os.path.join(root, LM_TABLE))
    fb_stats = curate_corpus(
        spark, src, str(tmp_path / "fallback"), lm_root=root, **kw
    )
    assert fb_stats["ml_lm"] == "self"
    assert {k: v for k, v in fb_stats.items() if k != "ml_lm"} == {
        k: v for k, v in self_stats.items() if k != "ml_lm"
    }


def test_curate_semantic_prune_keeps_one_per_neighborhood(spark, tmp_path):
    """curate --semantic-prune (VERDICT r11 item 3): WITHIN-corpus
    SemDeDup — planted near-duplicate embedding pairs among the
    survivors are pruned to the min-id representative; docs with
    unique embeddings, and docs with no embedding row, pass through.
    Deterministic under re-run."""
    dim = 64

    def basis(i):
        return [1.0 if j == i else 0.0 for j in range(dim)]

    # 0/1 share an embedding direction (cos 1.0); 2/3 share another;
    # 4 unique; 5 has NO embedding row
    emb_rows = [
        (0, basis(0)),
        (1, [2.0 * x for x in basis(0)]),
        (2, basis(1)),
        (3, [0.5 * x for x in basis(1)]),
        (4, basis(2)),
    ]
    emb_path = str(tmp_path / "emb")
    spark.createDataFrame(
        emb_rows, "doc_id long, embedding array<double>"
    ).write.parquet(emb_path)

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [
            (
                i,
                " ".join(f"sp{i}w{j} the a of to in" for j in range(8)),
                "en",
                "srcA",
            )
            for i in range(6)
        ],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)

    stats = curate_corpus(
        spark,
        src,
        str(tmp_path / "out"),
        min_quality=0.0,
        embeddings_path=emb_path,
        semantic_prune_threshold=0.95,
    )
    assert stats["n_after_semantic_dedup"] == 6
    assert stats["n_semantic_pruned"] == 2
    assert stats["n_after_semantic_prune"] == 4
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_id")
        .collect()
    }
    assert ids == {0, 2, 4, 5}  # min-id keepers + unjudgeable 5

    # off by default; guard: threshold without embeddings fails loudly
    base = curate_corpus(spark, src, str(tmp_path / "out2"), min_quality=0.0)
    assert base["n_semantic_pruned"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires embeddings_path"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o3"),
            semantic_prune_threshold=0.9,
        )
    with _pytest.raises(ValueError, match="semantic_prune_threshold"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o4"),
            semantic_prune_threshold=1.5,
            embeddings_path=emb_path,
        )


def test_curate_nb_autolabel_feeds_mixture(spark, tmp_path):
    """curate --nb-seed (VERDICT r11 item 2): an UNLABELED corpus (no
    usable domain column) is auto-labeled by the t29 NB classifier
    trained on a labeled seed, and the mixture stage hits the exact
    t22 largest-remainder per-PREDICTED-domain targets."""
    sport = "football stadium referee goal"
    science = "quantum theorem laboratory hypothesis"
    rows = [
        (
            i,
            f"{sport} {sport} " + " ".join(f"sp{i}x{j}" for j in range(6)),
            "en",
            "crawl",
        )
        for i in range(40)
    ] + [
        (
            1000 + i,
            f"{science} {science} " + " ".join(f"sc{i}x{j}" for j in range(6)),
            "en",
            "crawl",
        )
        for i in range(10)
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)

    # symmetric labeled seed: same token totals per label, so the
    # smoothed floors match and the marker words alone decide
    seed_path = str(tmp_path / "seed")
    spark.createDataFrame(
        [(sport, "sports")] * 3 + [(science, "science")] * 3,
        "text string, label string",
    ).write.parquet(seed_path)

    # reference run: which docs land in train (ids encode true domain)
    out0 = str(tmp_path / "plain")
    curate_corpus(spark, src, out0, min_quality=0.0)
    train_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out0)
        .filter(F.col("split") == "train")
        .collect()
    }
    train_counts = {
        "sports": sum(1 for i in train_ids if i < 1000),
        "science": sum(1 for i in train_ids if i >= 1000),
    }
    budget, targets = _expected_mixture(train_counts, 0.5, 2, 5)

    out = str(tmp_path / "mixed")
    stats = curate_corpus(
        spark,
        src,
        out,
        min_quality=0.0,
        mixture_alpha=0.5,
        mixture_budget=(2, 5),
        mixture_domain_col="no_such_col",  # the raw-crawl case
        nb_seed_path=seed_path,
    )
    assert stats["mixture_label_source"] == "nb_seed"
    assert stats["mixture_domains"] == {
        d: {"n_train": train_counts[d], "target": targets[d], "kept": targets[d]}
        for d in train_counts
    }
    kept_train = {
        r["doc_id"]
        for r in spark.read.parquet(out)
        .filter(F.col("split") == "train")
        .collect()
    }
    assert sum(1 for i in kept_train if i < 1000) == targets["sports"]
    assert sum(1 for i in kept_train if i >= 1000) == targets["science"]

    # determinism: rerun -> identical stats
    stats2 = curate_corpus(
        spark,
        src,
        str(tmp_path / "mixed2"),
        min_quality=0.0,
        mixture_alpha=0.5,
        mixture_budget=(2, 5),
        mixture_domain_col="no_such_col",
        nb_seed_path=seed_path,
    )
    assert stats2 == stats

    # guards: a seed without the label column fails loudly; without a
    # seed, a missing domain column still fails as before
    import pytest as _pytest

    bad_seed = str(tmp_path / "badseed")
    spark.createDataFrame([(sport,)], "text string").write.parquet(bad_seed)
    with _pytest.raises(ValueError, match="nb_seed_path"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o5"),
            mixture_alpha=0.5,
            nb_seed_path=bad_seed,
        )
    with _pytest.raises(ValueError, match="mixture_domain_col"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o6"),
            mixture_alpha=0.5,
            mixture_domain_col="no_such_col",
        )


def test_curate_quality_weighted_downsample(spark, tmp_path):
    """curate --sample-k (t30): the surviving corpus caps at k docs
    drawn proportional to the quality score BEFORE the split —
    deterministic under re-run, off by default, guard on negative k."""
    rows = [
        (
            i,
            " ".join(f"sw{i}x{j} the a of to in" for j in range(8)),
            "en",
            "crawl",
        )
        for i in range(80)
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(src)

    stats = curate_corpus(
        spark, src, str(tmp_path / "out"), min_quality=0.0, sample_k=25
    )
    assert stats["n_after_ml"] == 80
    assert stats["n_after_sample"] == 25
    assert stats["n_written"] == 25
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert len(kept) == 25

    # deterministic: the same 25 docs survive a re-run
    stats2 = curate_corpus(
        spark, src, str(tmp_path / "out2"), min_quality=0.0, sample_k=25
    )
    assert stats2 == stats
    kept2 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert kept2 == kept

    # off by default; a k above the corpus passes everything through
    base = curate_corpus(spark, src, str(tmp_path / "out3"), min_quality=0.0)
    assert base["n_after_sample"] == base["n_after_ml"] == 80
    big = curate_corpus(
        spark, src, str(tmp_path / "out4"), min_quality=0.0, sample_k=500
    )
    assert big["n_after_sample"] == 80

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sample_k"):
        curate_corpus(spark, src, str(tmp_path / "o5"), sample_k=-1)


_PHY_TOPIC = (
    "the electron and the photon carry the quantum of energy in the nucleus"
)
_REC_TOPIC = "the butter and the flour fold in the dough to a golden bake"


def _dsir_corpus(spark):
    """10 physics-flavored + 10 recipe-flavored docs, each with a
    doc-unique prefix (so near-dedup keeps them all) and a shared
    topical sentence (so DSIR has a distribution to match)."""
    rows = [
        (i, " ".join(f"p{i}x{j}" for j in range(6)) + " " + _PHY_TOPIC, "phy")
        for i in range(10)
    ] + [
        (10 + i, " ".join(f"r{i}x{j}" for j in range(6)) + " " + _REC_TOPIC, "rec")
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_curate_dsir_stage_resamples_to_budget(spark, tmp_path):
    src = str(tmp_path / "raw")
    tgt = str(tmp_path / "target")
    out = str(tmp_path / "curated")
    _dsir_corpus(spark).write.parquet(src)
    # a text-only target parquet (no doc_id — the stage synthesizes one)
    spark.createDataFrame(
        [(_PHY_TOPIC,)] * 4, "text string"
    ).write.parquet(tgt)

    stats = curate_corpus(
        spark,
        src,
        out,
        min_quality=0.0,
        dsir_target_path=tgt,
        dsir_k=6,
    )
    assert stats["n_after_ml"] == 20
    assert stats["n_after_dsir"] == 6
    assert stats["n_written"] == 6
    written = spark.read.parquet(out)
    kept = {r["doc_id"] for r in written.select("doc_id").collect()}
    # the importance race overwhelmingly favors target-like docs: the
    # logw gap between flavors is tens of nats, Gumbel noise is ~1
    assert len(kept) == 6 and all(i < 10 for i in kept)

    # deterministic: the same inputs keep the same docs
    out2 = str(tmp_path / "curated2")
    curate_corpus(
        spark, src, out2, min_quality=0.0, dsir_target_path=tgt, dsir_k=6
    )
    kept2 = {
        r["doc_id"]
        for r in spark.read.parquet(out2).select("doc_id").collect()
    }
    assert kept2 == kept


def test_curate_dsir_guards(spark, tmp_path):
    import pytest

    src = str(tmp_path / "raw")
    _dsir_corpus(spark).write.parquet(src)

    with pytest.raises(ValueError, match="go together"):
        curate_corpus(
            spark, src, str(tmp_path / "o1"), dsir_target_path="/nope"
        )
    with pytest.raises(ValueError, match="go together"):
        curate_corpus(spark, src, str(tmp_path / "o2"), dsir_k=5)
    empty_tgt = str(tmp_path / "empty_target")
    spark.createDataFrame([], "text string").write.parquet(empty_tgt)
    with pytest.raises(ValueError, match="empty"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o3"),
            min_quality=0.0,
            dsir_target_path=empty_tgt,
            dsir_k=5,
        )
    no_text = str(tmp_path / "no_text_target")
    spark.createDataFrame([(1,)], "x long").write.parquet(no_text)
    with pytest.raises(ValueError, match="no text column"):
        curate_corpus(
            spark,
            src,
            str(tmp_path / "o4"),
            min_quality=0.0,
            dsir_target_path=no_text,
            dsir_k=5,
        )
