"""End-to-end training-corpus curation: the job a user actually runs
over raw documents before pretraining, composing the cataloged §2.11
operators into one pipeline:

    read -> exact dedup (d6) -> near-dup clustering (d8, keep one per
    cluster) -> optional decontamination (t9) -> optional lexical
    corpus dedup (d9 read-only, --dedup-against-corpus) -> optional
    SEMANTIC corpus dedup (s11 read-only, --embed-admit-root +
    --embeddings) -> optional WITHIN-corpus semantic pruning (s23
    SemDeDup, --semantic-prune + --embeddings) -> optional
    repeated-span removal (t20: the C4-style
    boilerplate pass) -> optional scrub (t18: PII redaction + URL
    canonicalization) -> quality filter (t7) -> optional perplexity
    band (t25: CCNet-style bigram-NLL cut of BOTH tails —
    --perplexity-band) -> optional Moore-Lewis contrastive domain
    selection (t28 — --ml-in-domain) -> optional DSIR importance
    resampling to a budget (t31 Xie et al. — --dsir-target +
    --dsir-k) -> optional quality-weighted
    downsample (t30 Efraimidis-Spirakis — --sample-k) ->
    deterministic split (t12) ->
    optional
    temperature-weighted domain mixture of the train split (t21/t22 —
    --mixture-alpha; grouped by a t29 NB-predicted label when
    --nb-seed is given) -> partitioned write + packing stats (t11)

Plan economics: each stage's survivor frame is pinned (lazy
localCheckpoint) so the per-stage audit counts and the next stage reuse
one materialization instead of re-deriving the whole upstream lineage —
at 100 TB each un-pinned count would be a full re-scan of every prior
stage. The write lands partitioned by split so downstream training
readers prune to their split at the directory level, and the returned
stats dict is the job's XCom-sized contract (counts only — same rule as
run_daily_pipeline's O5 stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import drop_exact_dups, dup_clusters
from ..operators.sampling import hash_split
from ..operators.text import pack_sequences, with_quality
from ..pinning import pin


def curate_corpus(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    *,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
    pack_budget: int = 512,
    eval_path: str | None = None,
    decontam_ngram: int = 4,
    scrub: bool = True,
    corpus_sig_root: str | None = None,
    embed_admit_root: str | None = None,
    embeddings_path: str | None = None,
    embed_admit_threshold: float = 0.9,
    embed_n_probe: int | None = None,
    semantic_prune_threshold: float | None = None,
    span_dedup_tokens: int | None = None,
    span_max_occurrences: int = 1,
    perplexity_band: tuple[float, float] | None = None,
    perplexity_sample_k: int = 512,
    lm_root: str | None = None,
    ml_in_domain: str | None = None,
    ml_keep_quantile: float = 0.5,
    dsir_target_path: str | None = None,
    dsir_k: int | None = None,
    mixture_alpha: float | None = None,
    mixture_domain_col: str = "source",
    mixture_budget: tuple[int, int] = (3, 5),
    mixture_budget_tokens: int | None = None,
    nb_seed_path: str | None = None,
    nb_label_col: str = "label",
    sample_k: int | None = None,
) -> dict:
    """Run the curation pipeline and write the curated corpus
    partitioned by split. Deterministic: same input -> same survivors,
    same splits, same stats (every stage is hash- or min-id-based; no
    randomness, no timestamps).

    ``eval_path`` (optional) points at a held-out benchmark corpus with
    the same (doc_id, text) shape: documents sharing any word
    ``decontam_ngram``-gram with it are dropped — the decontamination
    gate every pretraining run applies (operators/dedup.py::eval_overlap;
    the eval gram set broadcasts, the corpus never shuffles for it).

    ``corpus_sig_root`` (optional) points at a live signature corpus
    (jobs/doc_signature_lake.py ingest layout): input docs that are
    verified near-dups of the corpus's registered survivors are dropped
    (the d9 decision, read-only — nothing is registered here), so
    curating today's drop against yesterday's corpus composes with the
    incremental ingest instead of re-deduping history. Like ingest,
    this read must not run concurrently with compact-signatures: the
    file-level protocol is single-writer, and compaction removing a
    partition mid-read would fail the curate job.

    ``embed_admit_root`` (optional) is the SEMANTIC twin of
    ``corpus_sig_root``: it points at a live embedding-index lake
    (jobs/embedding_index_lake.py layout), and input docs whose
    precomputed embeddings are s11-admission duplicates of the index's
    registered members (``status == 'dup_of_corpus'``) are dropped —
    read-only, nothing is registered or re-assigned here. Requires
    ``embeddings_path``: a parquet of (doc_id, embedding) — ``vec_id``
    is accepted as the id column name — covering the input docs (docs
    without an embedding row cannot be judged and pass through).
    ``read_centroids`` fails loudly on an uninitialized/typo'd root:
    admitting against an accidentally-fresh index would silently
    accept every duplicate. Within-batch semantic pairs are NOT
    dropped by this leg (its contract is corpus membership, mirroring
    the lexical leg's check_batch=False); the same
    don't-run-concurrently-with-compaction rule applies.

    ``semantic_prune_threshold`` (optional) turns on WITHIN-corpus
    semantic pruning (s23, SemDeDup — Abbas et al. 2023): among the
    surviving docs themselves, one representative is kept per SRP-cell
    cosine neighborhood at the given threshold, dropping the rest.
    Requires ``embeddings_path`` (the 2b4 frame is reused); docs
    without an embedding row pass through. Complements — and composes
    with — the cross-corpus ``embed_admit_root`` leg: that one asks
    "is this doc already IN the corpus", this one asks "does the batch
    repeat ITSELF semantically".

    ``perplexity_band`` (optional) is the (low_q, high_q) quantile pair
    for the t25 CCNet-style cut: an add-one-smoothed bigram model
    trains on the quality survivors and documents whose per-token NLL
    falls below the low_q or above the high_q corpus quantile are
    dropped (boilerplate and gibberish tails respectively). Thresholds
    come from the deterministic KMV sample (``perplexity_sample_k``
    rows), so the stage stays a pure function of the input; docs with
    fewer than two tokens cannot be judged and pass through.

    ``lm_root`` (optional, with ``perplexity_band``) points at a live
    signature-corpus root whose lm/ facet holds the STORED bigram LM
    (jobs/doc_signature_lake.py::read_corpus_lm): the band then scores
    survivors under the corpus model instead of retraining from
    scratch every run — at 100 TB retraining per run re-scans the
    corpus the lake was built to avoid. A typo'd root fails loudly
    (the corpus_sig_root rule); a real root whose committed batches
    predate the LM facet falls back to self-training (there is no
    stored model to read). Band thresholds still come from THIS run's
    survivor scores, so the cut adapts to the batch while the model
    stays the corpus's.

    ``ml_in_domain`` (optional) is a SQL boolean expression over the
    corpus columns (e.g. ``"lang = 'en'"``) naming the in-domain seed
    for a Moore-Lewis contrastive selection pass (t28, Moore & Lewis
    ACL 2010): an in-domain bigram LM trains on the surviving seed
    rows, the full-survivor LM is the contrast, and documents whose
    cross-entropy difference exceeds the ``ml_keep_quantile`` corpus
    quantile are dropped — keeping the most in-domain fraction. The
    threshold comes from the same deterministic KMV sample as the
    perplexity band (``perplexity_sample_k`` rows), so the stage is a
    pure function of the input; docs too short to judge (< 2 tokens)
    pass through. An expression matching NO survivors fails loudly —
    an empty seed would train a degenerate LM and silently score
    garbage. Runs after the perplexity band: the band cuts fluency
    outliers corpus-wide, Moore-Lewis then ranks the fluent remainder
    by domain affinity. With ``lm_root``, the CONTRAST model is the
    lake's stored corpus LM (the textbook Moore-Lewis setup — the
    out-of-domain side is the general corpus, served from the lm/
    facet instead of re-trained per run); the in-domain LM always
    trains on this run's seed rows. The stats dict reports which
    contrast served (``ml_lm``: self/stored/stored_partial, the
    ``ppl_lm`` convention).

    ``dsir_target_path`` (optional, with ``dsir_k``) turns on DSIR
    importance resampling (t31, Xie et al. NeurIPS 2023): the parquet
    at the path (any table with a ``text`` column) defines the TARGET
    distribution, every survivor scores log p_target - log p_raw under
    hashed-bigram multinomial models (operators/text.py::dsir_weights
    — the raw side is the survivors themselves, the paper's
    estimator), and exactly ``dsir_k`` docs are kept by the
    Gumbel-top-k race (operators/sampling.py::gumbel_topk_sample) —
    sampling WITHOUT replacement proportional to the importance
    weight, which matches the target feature distribution in
    expectation, not a hard threshold. Deterministic like every stage
    (md5-uniform race keys, integer micro-unit weights). Runs after
    Moore-Lewis — both are target-affinity passes, but ML cuts a
    score quantile while DSIR resamples to a BUDGET — and before the
    quality downsample. An empty target parquet fails loudly (it
    would degenerate to uniform sampling while claiming to match a
    target); docs too short to judge carry weight exp(0) = 1 and race
    uniformly.

    ``mixture_alpha`` (optional) turns on the final t21/t22 stage a
    pretraining-corpus job actually ends with: the TRAIN split is
    rebalanced by temperature-weighted domain sampling (keep
    proportional to count^alpha per ``mixture_domain_col``), to an
    exact total budget of ``floor(n_train * num / den)`` documents
    (``mixture_budget = (num, den)``) topped up largest-remainder
    (Hamilton's method) so only domain-size caps can leave shortfall.
    Val/test holdouts pass through untouched — rebalancing heldout
    data would change what eval measures. Selection is hash-ranked
    (operators/sampling.py::temperature_mixture), so the kept set is
    deterministic and monotone under budget growth; per-domain
    n_train/target/kept counts land in the stats dict.
    ``mixture_budget_tokens`` switches the budget unit to TOKENS (the
    unit a pretraining run plans by): per-domain token targets split
    the absolute budget largest-remainder and each domain keeps the
    maximal hash-ordered prefix of its docs whose running whitespace
    token total fits (operators/sampling.py::token_budget_mixture —
    undershoot < one doc, never overshoot); the per-domain audit then
    carries tok_target/kept_tokens.

    ``nb_seed_path`` (optional, with ``mixture_alpha``) handles the
    raw-crawl case where the corpus has NO domain column: a labeled
    seed parquet of (text, ``nb_label_col``) rows trains the
    closed-form multinomial NB classifier (t29,
    operators/text.py::nb_train_rows — the fastText-classifier step a
    real pretraining mixture pipeline runs), the TRAIN split is
    classified under it, and the mixture stage groups by the PREDICTED
    label instead of ``mixture_domain_col``. Deterministic end to end
    (counting-pass training, integer micro-unit scoring, smallest-
    label tie-break), so the kept set stays a pure function of
    (corpus, seed). When given, predictions take precedence even if
    ``mixture_domain_col`` exists — the explicit seed is the stronger
    statement of intent. The stats dict reports
    ``mixture_label_source`` ('nb_seed' / 'column') and the audit keys
    become predicted labels.

    ``sample_k`` (optional) caps the corpus BEFORE the split by
    quality-weighted sampling without replacement (t30, Efraimidis &
    Spirakis): keep sample_k docs drawn proportional to the t7 quality
    score — deterministic (md5-uniform race keys), so re-runs keep the
    same docs. Docs with quality <= 0 cannot race and are dropped."""
    docs = spark.read.parquet(input_path)

    # Stage-count audits are DEFERRED to one block after the final write
    # (r13, guide §1.4/§2.4): each eager ``.count()`` here used to run a
    # separate full job that serialized the stage chain; the write
    # materializes every pinned stage anyway, so the audits now read the
    # already-pinned frames afterwards. ``n_input`` needs no scan of its
    # own at all: the exact-dedup window carries ``_n_copies`` (rows per
    # keeper, same window partitioning — no extra shuffle) whose sum IS
    # the input row count. Counts a later stage's CONTROL FLOW needs
    # (optional legs' gates) resolve on demand via the helpers below —
    # values are identical either way because the pinned frames are
    # immutable. The stats dict is byte-identical to the eager version.

    # 1. exact dedup — keep the min-id row per normalized content
    exact_audit = drop_exact_dups(
        docs, "doc_id", "text", with_copies=True
    ).transform(pin)
    exact = exact_audit.drop("_n_copies")

    # 2. near-dup clusters over the exact survivors; drop every cluster
    #    member except the min-id keeper (anti-join on the non-keeper
    #    set — docs in no cluster aren't in it and pass through).
    # no broadcast hint: the dropped set is data-dependent (could be a
    # large fraction of a crawl corpus) — AQE picks broadcast when it
    # actually fits
    clusters = dup_clusters(exact, "doc_id", "text", threshold=near_dup_threshold)
    near = (
        exact.join(
            clusters.filter(~F.col("is_kept")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    ).transform(pin)
    near_stage2 = near
    _n_near: list[int | None] = [None]

    def _n_after_near() -> int:
        if _n_near[0] is None:
            _n_near[0] = near_stage2.count()
        return _n_near[0]

    # 2b. decontamination against the held-out benchmark (if given):
    #     anti-join on the contaminated-doc set
    if eval_path is not None:
        from ..operators.dedup import eval_overlap

        eval_df = spark.read.parquet(eval_path)
        contaminated = eval_overlap(
            near, eval_df, "doc_id", "text", n=decontam_ngram
        ).select("doc_id")
        near = near.join(contaminated, "doc_id", "left_anti").transform(pin)
    n_after_decontam = near.count() if eval_path is not None else None

    # 2b2. cross-corpus dedup (optional, d9 read-only): drop survivors
    #      that are verified near-dups of the EXISTING corpus's
    #      registered docs — batch band rows equi-join the committed
    #      signature partitions, never re-signing the corpus.
    #      check_batch=False: stage 2's dup_clusters already settled
    #      within-batch identity at the same threshold/geometry, so the
    #      operator's batch self-join leg would be a provably-empty
    #      full-corpus LSH pass Spark can't eliminate on its own.
    n_after_corpus = n_after_decontam
    if corpus_sig_root is not None:
        if n_after_corpus is None:
            n_after_corpus = _n_after_near()
        import os

        from ..operators.dedup import dedup_against_corpus
        from .doc_signature_lake import (
            NUM_HASHES,
            compute_signatures,
            read_committed,
        )

        if not os.path.isdir(corpus_sig_root):
            # a typo'd root silently skipping the gate would ship a
            # corpus full of near-dups while reporting success
            raise ValueError(
                f"corpus_sig_root {corpus_sig_root!r} does not exist — "
                "point at a signature corpus root (the directory holding "
                "members/ and signatures/)"
            )
        corpus_sig = read_committed(spark, corpus_sig_root, "signatures")
        if corpus_sig is not None:
            decision = dedup_against_corpus(
                near.select(F.col("doc_id").alias("doc")),
                compute_signatures(near),
                corpus_sig,
                threshold=near_dup_threshold,
                num_hashes=NUM_HASHES,
                check_batch=False,
            )
            corpus_dups = decision.filter(
                F.col("status") == "dup_of_corpus"
            ).select(F.col("doc").alias("doc_id"))
            near = near.join(corpus_dups, "doc_id", "left_anti").transform(pin)
            n_after_corpus = near.count()

    # 2b4. cross-corpus SEMANTIC dedup (optional, s11 read-only): drop
    #      survivors whose embeddings are admission-duplicates of the
    #      embedding index's registered members. Probe-only: batch
    #      vectors assign to n_probe cells via the broadcast quantizer
    #      and GEMM-score only those cells' stored members — the index
    #      never re-scans, the corpus text never shuffles for this.
    n_semantic_dups = 0
    n_after_semantic = n_after_corpus
    if embed_admit_root is not None:
        if n_after_corpus is None:
            # no prior optional leg ran — the pre-semantic survivor
            # count IS the stage-2 count, resolved on demand
            n_after_corpus = _n_after_near()
        if embeddings_path is None:
            raise ValueError(
                "embed_admit_root requires embeddings_path — the docs "
                "frame carries no vectors, so semantic admission needs "
                "a precomputed (doc_id, embedding) parquet"
            )
        from ..operators.similarity import embed_admit_batch
        from .doc_signature_lake import read_committed as _read_committed
        from .embedding_index_lake import DEFAULT_N_PROBE, read_centroids

        # fails loudly on an uninitialized or typo'd root
        cents = read_centroids(spark, embed_admit_root)
        members = _read_committed(spark, embed_admit_root, "assignments")
        if members is not None:
            emb = spark.read.parquet(embeddings_path)
            if "doc_id" not in emb.columns and "vec_id" in emb.columns:
                emb = emb.withColumnRenamed("vec_id", "doc_id")
            batch = near.select("doc_id").join(emb, "doc_id")
            decision = embed_admit_batch(
                batch,
                members,
                cents,
                threshold=embed_admit_threshold,
                n_probe=embed_n_probe or DEFAULT_N_PROBE,
                id_col="doc_id",
            )
            sem_dups = decision.filter(
                F.col("status") == "dup_of_corpus"
            ).select(F.col("vec").alias("doc_id"))
            near = near.join(sem_dups, "doc_id", "left_anti").transform(pin)
            n_after_semantic = near.count()
            n_semantic_dups = n_after_corpus - n_after_semantic

    # 2b5. WITHIN-corpus semantic pruning (optional, s23 SemDeDup):
    #      among the survivors themselves, keep one representative per
    #      same-cell cosine neighborhood — the Abbas et al. 2023 pass
    #      the cross-corpus 2b4 leg cannot make (its contract is
    #      membership against an EXISTING index; this one prunes the
    #      batch's own semantic redundancy). Drop rule is the
    #      order-free smaller-id-witness verdict, so the stage is a
    #      pure function of (survivors, embeddings). Docs without an
    #      embedding row cannot be judged and pass through (the 2b4
    #      rule). Cost at scale: SRP-cell equi-join GEMM pairs,
    #      O(sum of squared cell sizes) — never all-pairs.
    n_semantic_pruned = 0
    n_after_semantic_prune = n_after_semantic
    if semantic_prune_threshold is not None:
        if n_after_semantic is None:
            # resolve the pre-prune survivor count on demand (the
            # embed-admit leg's rule)
            n_after_semantic = (
                n_after_corpus if n_after_corpus is not None else _n_after_near()
            )
        if not (0.0 < semantic_prune_threshold <= 1.0):
            raise ValueError(
                f"semantic_prune_threshold must be in (0, 1]; got "
                f"{semantic_prune_threshold!r}"
            )
        if embeddings_path is None:
            raise ValueError(
                "semantic_prune_threshold requires embeddings_path — "
                "SemDeDup judges vectors, and the docs frame carries "
                "none"
            )
        from ..operators.similarity import semantic_dedup

        emb = spark.read.parquet(embeddings_path)
        if "doc_id" not in emb.columns and "vec_id" in emb.columns:
            emb = emb.withColumnRenamed("vec_id", "doc_id")
        surv = near.select("doc_id").join(emb, "doc_id")
        verdicts = semantic_dedup(
            surv,
            threshold=semantic_prune_threshold,
            id_col="doc_id",
            vec_col="embedding",
        )
        pruned = verdicts.filter(~F.col("kept")).select(
            F.col("vec_id").alias("doc_id")
        )
        near = near.join(pruned, "doc_id", "left_anti").transform(pin)
        n_after_semantic_prune = near.count()
        n_semantic_pruned = n_after_semantic - n_after_semantic_prune

    # 2b3. repeated-span removal (optional, t20): drop every
    #      span_dedup_tokens-token window whose hash occurs more than
    #      span_max_occurrences times across the surviving corpus —
    #      AFTER doc-level keep-one (so what it removes is
    #      cross-document boilerplate, not the dup copies d6/d8
    #      already settled) and BEFORE quality (the scorer should
    #      judge the de-boilerplated text). The per-doc drop count
    #      rides along and folds into the single stats action below.
    if span_dedup_tokens is not None:
        from ..operators.dedup import span_dedup

        cleaned = span_dedup(
            near,
            "doc_id",
            "text",
            span_tokens=span_dedup_tokens,
            max_occurrences=span_max_occurrences,
        )
        near = near.drop("text").join(
            cleaned.select(
                "doc_id",
                F.col("n_dropped").alias("_span_dropped"),
                F.col("clean_text").alias("text"),
            ),
            "doc_id",
        )
    else:
        near = near.withColumn("_span_dropped", F.lit(0).cast("long"))

    # 2c. scrub (optional, t18): PII-shaped redaction + URL
    #     canonicalization as pure regexp map passes on the dedup
    #     survivors — AFTER dedup (identity is decided on raw content;
    #     scrubbing first would merge docs that differ only in the
    #     redacted spans) and BEFORE quality (the scorer should judge
    #     what training will actually see)
    # 3. quality floor — the t7 scorer as an appended column (pure map,
    #    no self-join back on the id); a model scorer swaps in behind
    #    the same column without plan changes. Scrub and quality are
    #    both map passes, so they share ONE pinned materialization and
    #    ONE stats action (splitting them measured curate at ~910
    #    docs/s vs the >=1000 target — the extra localCheckpoint of the
    #    full text column was the cost, not the regexes).
    if scrub:
        from ..operators.text import scrub_text

        near = scrub_text(near, "text")
    else:
        near = near.withColumn("was_redacted", F.lit(False))
    staged = with_quality(near, "text").transform(pin)
    _staged_row: list = [None]

    def _get_staged_row():
        # the scrub/quality stats action, computed once — on demand when
        # a later leg's gate needs n_after_quality mid-flight, otherwise
        # in the deferred audit block after the write (where staged is
        # already materialized and the agg is a cached-partition scan)
        if _staged_row[0] is None:
            _staged_row[0] = staged.agg(
                F.sum(F.col("was_redacted").cast("long")).alias("n_red"),
                F.sum((F.col("quality") >= min_quality).cast("long")).alias("n_q"),
                F.sum("_span_dropped").alias("n_sp"),
            ).first()
        return _staged_row[0]

    curated = staged.filter(F.col("quality") >= min_quality).drop(
        "n_emails", "n_urls_canonicalized", "n_phones", "was_redacted",
        "_span_dropped",
    )

    # 3b. perplexity band (optional, t25): the CCNet-style cut (Wenzek
    #     et al., LREC 2020) the heuristic t7 floor can't make — an
    #     add-one-smoothed bigram model trains on the quality
    #     survivors themselves and docs whose per-token NLL falls
    #     outside the (low_q, high_q) corpus-quantile band are dropped:
    #     the LOW tail is degenerate boilerplate (repeated templates
    #     score near-certain), the HIGH tail is gibberish (every bigram
    #     unseen). Band thresholds come from the a5 deterministic KMV
    #     sample of the per-doc scores, so the cut is a pure function
    #     of the corpus — no RNG, no engine-dependent quantile sketch.
    #     Docs too short to judge (< 2 tokens -> n_bigrams == 0) pass
    #     through, mirroring the no-embedding-row rule above. Cost at
    #     scale: the t25 aggregations (bigram table shuffles on its
    #     natural key), one bounded sample collect, one anti-join.
    # shared stored-LM read: the lm/ facet serves BOTH the perplexity
    # band's model and the Moore-Lewis contrast model, so validate the
    # root and load the rows once
    stored_lm = None
    stored_lm_source = ""
    if lm_root is not None and (
        perplexity_band is not None or ml_in_domain is not None
    ):
        import os

        from .doc_signature_lake import read_corpus_lm

        if not os.path.isdir(os.path.join(lm_root, "members")):
            # a typo'd or wrong directory (e.g. the lm/ subdir itself)
            # silently retraining would report success while scoring
            # under the wrong model — only a real corpus root (one
            # that has registered batches) may fall back, and only
            # when its batches predate the facet
            raise ValueError(
                f"lm_root {lm_root!r} is not a signature corpus "
                "root (no members/ directory) — point at the "
                "directory holding members/ and lm/"
            )
        stored_lm = read_corpus_lm(spark, lm_root)
        if stored_lm is not None:
            from .doc_signature_lake import LM_TABLE, facet_coverage

            # a corpus mixing pre-facet and faceted batches serves a
            # model trained on the faceted subset only — report that
            # honestly rather than implying the corpus model
            n_facet, n_committed = facet_coverage(lm_root, LM_TABLE)
            stored_lm_source = (
                "stored" if n_facet == n_committed else "stored_partial"
            )

    n_ppl_cut_low = 0
    n_ppl_cut_high = 0
    ppl_band_micro: list[int] = []
    ppl_lm_source = ""
    n_after_perplexity = None  # resolves to n_after_quality in the audit
    if perplexity_band is not None:
        # validate BEFORE the survivor-count gate: a malformed band must
        # fail on an empty/filtered smoke slice exactly as it would on
        # real data, not return a false green
        lo_q, hi_q = perplexity_band
        if not (0.0 <= lo_q < hi_q <= 1.0):
            raise ValueError(
                f"perplexity_band must be quantiles with 0 <= low < "
                f"high <= 1; got {perplexity_band!r}"
            )
    if perplexity_band is not None and int(_get_staged_row()["n_q"] or 0) > 0:
        from ..operators.sketches import bottomk_sample
        from ..operators.text import bigram_logprob

        lo_q, hi_q = perplexity_band
        curated = pin(curated)
        if stored_lm is not None:
            from ..operators.text import bigram_nll_with_lm

            ppl_lm_source = stored_lm_source
            scored = pin(bigram_nll_with_lm(curated, stored_lm, "doc_id", "text"))
        else:
            ppl_lm_source = "self"
            scored = pin(bigram_logprob(curated, "doc_id", "text"))
        judged = scored.filter(F.col("n_bigrams") > 0)
        vals = bottomk_sample(
            judged,
            F.col("doc_id").cast("string"),
            "avg_nll_micro",
            k=perplexity_sample_k,
        )
        if vals:
            lo = vals[int(lo_q * (len(vals) - 1))]
            hi = vals[int(hi_q * (len(vals) - 1))]
            ppl_band_micro = [int(lo), int(hi)]
            cut = judged.filter(
                (F.col("avg_nll_micro") < F.lit(lo))
                | (F.col("avg_nll_micro") > F.lit(hi))
            )
            tails = cut.agg(
                F.sum((F.col("avg_nll_micro") < F.lit(lo)).cast("long")).alias("lo"),
                F.sum((F.col("avg_nll_micro") > F.lit(hi)).cast("long")).alias("hi"),
            ).first()
            n_ppl_cut_low = int(tails["lo"] or 0)
            n_ppl_cut_high = int(tails["hi"] or 0)
            curated = curated.join(
                cut.select("doc_id"), "doc_id", "left_anti"
            ).transform(pin)
            n_after_perplexity = (
                int(_get_staged_row()["n_q"] or 0)
                - n_ppl_cut_low
                - n_ppl_cut_high
            )

    # 3c. Moore-Lewis contrastive domain selection (optional, t28):
    #     rank the band survivors by the cross-entropy DIFFERENCE
    #     between an in-domain LM (trained on the rows matching the
    #     predicate) and the full-survivor LM, keep the most in-domain
    #     ml_keep_quantile fraction. Threshold from the deterministic
    #     KMV sample (the perplexity-band protocol), so the stage is a
    #     pure function of the input. Cost at scale: t25's aggregations
    #     twice over one shared occurrence explode + one bounded sample
    #     collect + one anti-join.
    n_ml_cut = 0
    ml_threshold_micro: list[int] = []
    ml_lm_source = ""
    n_after_ml = n_after_perplexity
    if ml_in_domain is not None:
        # validate before the survivor-count gate (the band's rule): a
        # malformed quantile must fail on an empty slice too
        if not (0.0 < ml_keep_quantile <= 1.0):
            raise ValueError(
                f"ml_keep_quantile must be in (0, 1]; got "
                f"{ml_keep_quantile!r}"
            )
    if ml_in_domain is not None and n_after_perplexity is None:
        # the band leg didn't run (or didn't judge) — resolve the
        # pre-ML survivor count on demand
        n_after_perplexity = int(_get_staged_row()["n_q"] or 0)
        n_after_ml = n_after_perplexity
    if ml_in_domain is not None and n_after_perplexity > 0:
        from ..operators.sketches import bottomk_sample
        from ..operators.text import moore_lewis_score

        curated = pin(curated)
        flag = F.expr(ml_in_domain)
        if curated.filter(flag).limit(1).count() == 0:
            raise ValueError(
                f"ml_in_domain {ml_in_domain!r} matched no surviving "
                "documents — an empty in-domain seed would train a "
                "degenerate LM; fix the expression or widen the seed"
            )
        # contrast model: the lake's stored corpus LM when available
        # (the textbook Moore-Lewis setup — the out-of-domain side IS
        # the big general corpus, already summarized by the lm/
        # facet); self-trained on the survivors otherwise
        ml_lm_source = stored_lm_source if stored_lm is not None else "self"
        scored = pin(
            moore_lewis_score(
                curated, flag, "doc_id", "text", out_lm_rows=stored_lm
            )
        )
        judged = scored.filter(F.col("n_bigrams") > 0)
        vals = bottomk_sample(
            judged,
            F.col("doc_id").cast("string"),
            "ml_micro",
            k=perplexity_sample_k,
        )
        if vals:
            thr = vals[int(ml_keep_quantile * (len(vals) - 1))]
            ml_threshold_micro = [int(thr)]
            cut = judged.filter(F.col("ml_micro") > F.lit(thr))
            n_ml_cut = cut.count()
            curated = curated.join(
                cut.select("doc_id"), "doc_id", "left_anti"
            ).transform(pin)
            n_after_ml = n_after_perplexity - n_ml_cut

    # 3c2. DSIR importance resampling (optional, t31 — Xie et al.
    #      2023): score survivors by log p_target - log p_raw over
    #      hashed bigram features and keep dsir_k docs by the
    #      Gumbel-top-k race — resampling proportional to the weight,
    #      not thresholding. After Moore-Lewis (ML cuts a quantile,
    #      DSIR resamples to a budget), before the quality downsample.
    #      Cost at scale: one tokenize + explode each side, a <= 10k
    #      row broadcast model join, one top-k.
    if (dsir_target_path is None) != (dsir_k is None):
        raise ValueError(
            "dsir_target_path and dsir_k go together: the target "
            "defines WHAT to match, dsir_k how much survives"
        )
    if dsir_k is not None and dsir_k < 0:
        raise ValueError(f"dsir_k must be >= 0; got {dsir_k!r}")
    n_after_dsir = n_after_ml
    if dsir_target_path is not None and n_after_ml is None:
        # neither the band nor the ML leg resolved a count — the pre-
        # DSIR survivor count is the quality-stage count, on demand
        n_after_ml = int(_get_staged_row()["n_q"] or 0)
        n_after_dsir = n_after_ml
    if dsir_target_path is not None and n_after_ml > 0:
        from ..operators.sampling import gumbel_topk_sample
        from ..operators.text import dsir_weights

        tgt = spark.read.parquet(dsir_target_path)
        if "text" not in tgt.columns:
            raise ValueError(
                f"dsir target {dsir_target_path!r} has no text column"
            )
        if tgt.filter(F.col("text").isNotNull()).limit(1).count() == 0:
            raise ValueError(
                f"dsir target {dsir_target_path!r} is empty — an empty "
                "target degenerates to uniform sampling while claiming "
                "to match a distribution"
            )
        # target ids are never consumed (only its bucket counts are) —
        # a text-only seed parquet gets a constant stand-in id
        if "doc_id" not in tgt.columns:
            tgt = tgt.withColumn("doc_id", F.lit(0))
        curated = pin(curated)
        weights = dsir_weights(curated, tgt, "doc_id", "text")
        sel = gumbel_topk_sample(
            weights, "doc_id", "logw_micro", k=dsir_k
        ).select("doc_id")
        curated = curated.join(sel, "doc_id", "left_semi").transform(pin)
        n_after_dsir = curated.count()

    # 3d. quality-weighted downsample (optional, t30): when the
    #     surviving corpus is still larger than the training budget,
    #     keep sample_k docs drawn WITHOUT replacement proportional to
    #     the t7 quality score — the Efraimidis-Spirakis exponential
    #     race (operators/sampling.py::weighted_sample), deterministic
    #     like every other stage. Runs after all the content filters
    #     (they decide WHAT is usable; this decides HOW MUCH survives)
    #     and before the split (shrinking after the split would skew
    #     the holdout ratios). Docs whose quality is <= 0 cannot race
    #     and are dropped. Cost at scale: one map pass + a top-k
    #     (per-partition heaps, never a global sort).
    n_after_sample = n_after_dsir
    if sample_k is not None:
        if sample_k < 0:
            raise ValueError(f"sample_k must be >= 0; got {sample_k!r}")
        from ..operators.sampling import weighted_sample

        curated = pin(curated)
        sel = weighted_sample(curated, "doc_id", "quality", k=sample_k).select(
            "doc_id"
        )
        curated = curated.join(sel, "doc_id", "left_semi").transform(pin)
        n_after_sample = curated.count()

    # 4. deterministic split assignment (pure map — no shuffle)
    split_docs = hash_split(curated, "doc_id").drop("bucket")

    # 4b. domain mixture of the train split (optional, t21/t22): the
    #     two-phase sharded selection (rank within (domain, shard),
    #     superset filter, exact re-rank) so no task ever sorts a whole
    #     domain; targets come from one count aggregation + the
    #     largest-remainder topping over the constant-size domain
    #     table. Only the bounded per-domain audit reaches the driver.
    mixture_domains: dict[str, dict[str, int]] = {}
    n_train_before_mixture = 0
    mixture_label_source = ""
    if mixture_alpha is not None:
        from ..operators.sampling import temperature_mixture

        num, den = mixture_budget
        if not (0 < num <= den):
            raise ValueError(
                f"mixture_budget must be a fraction 0 < num <= den; "
                f"got {mixture_budget!r}"
            )
        if mixture_budget_tokens is not None and mixture_budget_tokens < 0:
            raise ValueError(
                f"mixture_budget_tokens must be >= 0; got "
                f"{mixture_budget_tokens!r}"
            )
        if nb_seed_path is None and mixture_domain_col not in split_docs.columns:
            raise ValueError(
                f"mixture_domain_col {mixture_domain_col!r} not in the "
                f"corpus columns {split_docs.columns} — domain mixture "
                "needs a domain label per document (or a labeled seed "
                "via nb_seed_path to predict one)"
            )
        # pinned: feeds the target/selection aggregations, the
        # per-domain audit AND the final semi-join
        train_rows = split_docs.filter(F.col("split") == "train").transform(pin)
        if nb_seed_path is not None:
            # t29: no trusted domain column — train the closed-form NB
            # classifier on the labeled seed and group the mixture by
            # its predictions. mix_rows is a JOINED view (train_rows'
            # schema stays untouched for the final unionByName).
            from ..operators.text import nb_classify, nb_train_rows

            seed = spark.read.parquet(nb_seed_path)
            if nb_label_col not in seed.columns or "text" not in seed.columns:
                raise ValueError(
                    f"nb_seed_path {nb_seed_path!r} must carry (text, "
                    f"{nb_label_col!r}) columns; got {seed.columns}"
                )
            model = nb_train_rows(seed, label_col=nb_label_col)
            preds = nb_classify(train_rows, model, "doc_id", "text").select(
                "doc_id", "pred_label"
            )
            mix_rows = train_rows.join(preds, "doc_id").transform(pin)
            dcol = "pred_label"
            mixture_label_source = "nb_seed"
        else:
            mix_rows = train_rows
            dcol = mixture_domain_col
            mixture_label_source = "column"
        if mixture_budget_tokens is not None:
            from ..operators.sampling import token_budget_mixture
            from ..operators.text import tokens as _tokens

            sel = token_budget_mixture(
                mix_rows.withColumn(
                    "_ntok",
                    F.coalesce(
                        F.size(_tokens(F.col("text"))), F.lit(0)
                    ).cast("long"),
                ),
                "doc_id",
                dcol,
                "_ntok",
                mixture_budget_tokens,
                alpha=mixture_alpha,
            ).transform(pin)
            kept = sel.groupBy(dcol).agg(
                F.count("*").cast("long").alias("_kept"),
                F.max("tok_target").cast("long").alias("_target"),
                F.sum("n_tokens").cast("long").alias("_kept_tok"),
            )
        else:
            sel = temperature_mixture(
                mix_rows,
                "doc_id",
                dcol,
                alpha=mixture_alpha,
                budget_num=num,
                budget_den=den,
                exact_budget=True,
            ).transform(pin)
            kept = sel.groupBy(dcol).agg(
                F.count("*").cast("long").alias("_kept"),
                F.max("mix_target").cast("long").alias("_target"),
            )
        pre = mix_rows.groupBy(dcol).agg(
            F.count("*").cast("long").alias("_n")
        )
        # bounded collect: one row per domain (a zero-target domain has
        # no selection row — it still lands in the audit with kept 0)
        audit = pre.join(kept, dcol, "left").collect()
        mixture_domains = {
            str(r[dcol]): {
                "n_train": int(r["_n"]),
                (
                    "tok_target" if mixture_budget_tokens is not None else "target"
                ): int(r["_target"] or 0),
                "kept": int(r["_kept"] or 0),
                **(
                    {"kept_tokens": int(r["_kept_tok"] or 0)}
                    if mixture_budget_tokens is not None
                    else {}
                ),
            }
            for r in audit
        }
        n_train_before_mixture = sum(
            v["n_train"] for v in mixture_domains.values()
        )
        split_docs = split_docs.filter(F.col("split") != "train").unionByName(
            train_rows.join(sel.select("doc_id"), "doc_id", "left_semi")
        )

    split_docs.write.mode("overwrite").partitionBy("split").parquet(output_path)

    # ---- deferred stage-count audit (r13) ----
    # The write above materialized every pinned stage frame, so these
    # audits are cached-partition scans, not the separate full jobs the
    # old eager per-stage counts paid. Values are identical: the pins
    # are immutable snapshots of each stage's survivors.
    ex_row = exact_audit.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.coalesce(F.sum("_n_copies"), F.lit(0)).cast("long").alias("n_in"),
    ).first()
    n_input = int(ex_row["n_in"])
    n_after_exact = int(ex_row["n_exact"])
    n_after_near = _n_after_near()
    if n_after_decontam is None:
        n_after_decontam = n_after_near
    if n_after_corpus is None:
        n_after_corpus = n_after_decontam
    if n_after_semantic is None:
        n_after_semantic = n_after_corpus
    if n_after_semantic_prune is None:
        n_after_semantic_prune = n_after_semantic
    row = _get_staged_row()
    n_redacted = int(row["n_red"] or 0) if scrub else 0
    n_after_quality = int(row["n_q"] or 0)
    n_paragraphs_dropped = int(row["n_sp"] or 0)
    if n_after_perplexity is None:
        n_after_perplexity = n_after_quality
    if n_after_ml is None:
        n_after_ml = n_after_perplexity
    if n_after_dsir is None:
        n_after_dsir = n_after_ml
    if n_after_sample is None:
        n_after_sample = n_after_dsir

    stats = {
        "n_input": n_input,
        "n_after_exact_dedup": n_after_exact,
        "n_after_near_dedup": n_after_near,
        "n_after_decontam": n_after_decontam,
        "n_after_corpus_dedup": n_after_corpus,
        "n_semantic_dups": n_semantic_dups,
        "n_after_semantic_dedup": n_after_semantic,
        "n_semantic_pruned": n_semantic_pruned,
        "n_after_semantic_prune": n_after_semantic_prune,
        "n_paragraphs_dropped": n_paragraphs_dropped,
        "n_redacted": n_redacted,
        "n_after_quality": n_after_quality,
        "n_ppl_cut_low": n_ppl_cut_low,
        "n_ppl_cut_high": n_ppl_cut_high,
        "ppl_band_micro": ppl_band_micro,
        "ppl_lm": ppl_lm_source,
        "n_after_perplexity": n_after_perplexity,
        "n_ml_cut": n_ml_cut,
        "ml_threshold_micro": ml_threshold_micro,
        "ml_lm": ml_lm_source,
        "n_after_ml": n_after_ml,
        "n_after_dsir": n_after_dsir,
        "n_after_sample": n_after_sample,
        "n_train_before_mixture": n_train_before_mixture,
        "mixture_domains": mixture_domains,
        "mixture_label_source": mixture_label_source,
        "n_written": 0,
        "splits": {},
        "train_bins": 0,
        "train_tokens": 0,
    }
    # what the write could have landed AFTER the mixture stage: the
    # holdout rows plus exactly the per-domain targets — a tiny corpus
    # whose budget floors to 0 can empty the output even when
    # n_after_perplexity > 0
    n_expected_written = n_after_sample
    if mixture_alpha is not None:
        n_expected_written = (
            n_after_sample
            - n_train_before_mixture
            + sum(v["kept"] for v in mixture_domains.values())
        )
    if n_expected_written == 0:
        # the partitioned write of an empty frame leaves no parquet
        # footers to re-read — report the zeros instead of crashing
        return stats

    written = spark.read.parquet(output_path)
    split_counts = {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 5. packing audit on the train split: how many context windows the
    #    curated corpus yields (the number a pretraining run plans by)
    train = written.filter(F.col("split") == "train")
    packed = pack_sequences(
        train, "doc_id", "text", "source", budget=pack_budget
    )
    # windows per (source, shard) pack partition = ceil(token total /
    # budget): bin_id alone undercounts when the LAST document spans
    # multiple windows (it is assigned the bin its first token lands in)
    pack_stats = (
        packed.groupBy("source", "shard")
        .agg(F.sum("n_tokens").alias("_tok"))
        .agg(
            F.sum(F.ceil(F.col("_tok") / F.lit(float(pack_budget))))
            .cast("long")
            .alias("n_bins"),
            F.sum("_tok").cast("long").alias("n_train_tokens"),
        )
        .first()
    )

    stats["n_written"] = sum(split_counts.values())
    stats["splits"] = split_counts
    stats["train_bins"] = int(pack_stats["n_bins"] or 0)
    stats["train_tokens"] = int(pack_stats["n_train_tokens"] or 0)
    return stats
