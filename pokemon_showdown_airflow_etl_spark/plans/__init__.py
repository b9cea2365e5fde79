"""Named query catalog: every operator from SURVEY.md section 2 mapped
onto the driver testdata, each paired with a DuckDB oracle SQL string.

``ALL_QUERIES`` is what ``__spark_entry__.queries()`` / ``oracle_sql()``
expose to the driver.

Ordering matters: the round-1 driver checked exactly the first 50
catalog entries in insertion order (CORRECTNESS_r01.json is the
50-entry prefix of the r1 catalog, bit-for-bit). ``_PRIORITY`` below
therefore front-loads (a) the 32 queries that had no driver row in
round 1 and (b) the queries whose implementation changed this round,
so the hard correctness signal rotates over the whole catalog across
rounds. Every entry stays in the catalog regardless of position; the
local oracle-parity gate (tests/test_oracle_parity.py) always sweeps
all of them.
"""

from __future__ import annotations

from .base import Query
from . import relational, joins, llm, battlelog, extras, tpch

# Front of the driver's 50-query window, round 12. Rotation rule
# (VERDICT r3, made standing by r4 item 1): (1) every entry whose code
# changed after its latest driver row (= CHANGED_SINCE_LAST_ROW), then
# (2) the entries with the OLDEST standing rows, oldest first. After
# CORRECTNESS_r11 (50/50 green) the cumulative freshness is 50
# r11-latest, 47 r10-latest, 43 r9-latest, 29 r8-latest. The r12
# window (VERDICT r11 item 1): the twelve new entries (m9, m9b, a13,
# t30, s24, s25, x3, a14, t31, d10, s26, t32), m10/m10b (new, no row
# yet), the changed entries below, then the r8-latest names oldest
# debt first — the optimization round's changed-entry slots displace
# nine r8-stale names to the r13 rotation (see the boundary comment),
# each keeping its standing green row.
# Entries whose implementation changed since their latest driver row —
# maintained by hand when editing query code, cleared when the next
# CORRECTNESS file greens them. tests/test_driver_window.py asserts
# every name here holds a slot in the upcoming 50-entry window, so a
# changed query can no longer coast on a stale green row (the t8/g16/s6
# gap VERDICT r3 flagged).
CHANGED_SINCE_LAST_ROW: list[str] = [
    # -- r12 OPTIMIZATION-round changes (value-identical restructures,
    # each re-proven against the DuckDB oracle on a bare session the
    # day it changed — tools/raw_oracle_sweep.py; see
    # OPTIMIZATION_r12.md for the before/after evidence) --
    "m5_audio_frame_energy",  # scale-adaptive kernel spread + capped
    #   frame emission parameter (pinning.spread; max_frames)
    "m5b_audio_pcm_energy",  # spread + uint32 PCM synth (exact wrap)
    "s9_embedding_dup_clusters",  # CC convergence probe fused into the
    #   round checkpoint (one join+job less per round)
    "d8_dup_clusters",  # same connected_components change
    "s13_ann_recall_audit",  # one multi-probe scored pass replaces the
    #   three per-n_probe ivf_topk legs (ivf_topk_multi_probe)
    "t24_bpe_encode",  # type-level encode (no per-subword explode),
    #   TakeOrderedAndProject word-type top-K in bpe_train
    "a12_hll_set_ops",  # r12: the pairwise union/estimate math moved
    #   into the shared operators/sketches.py::hll_pairwise_overlap
    #   (a13 serves the lake facet through the same derivation) and the
    #   pair key became a STRUCT through the summary (ADVICE r11) —
    #   value-identical, re-oracled locally; rotated for the hard
    #   driver signal (the standing rule)
    "a10_lake_bloom_decontaminate",  # r12: bloom_maybe_contains now
    #   decides sum(hit)==count(*) instead of ==k (ADVICE r11
    #   duplicate-candidate false negative) — identical on the distinct
    #   probes a10 sends, rotated because the verdict expression changed
    "m8_image_admission",  # r12: image_ahash gained a passthrough
    #   parameter (m9 carries scene context through the kernel) — the
    #   default path is expression-identical, rotated anyway
    "m6_image_ahash",  # r12: same image_ahash signature change
    "m6b_image_near_dups",  # r12: same image_ahash signature change
    "a6_lake_sketch",  # r12: ingest_signature_batch now also writes
    #   the hllg facet, so the sf demo lake rebuilds under a new cache
    #   tag — a6's rows are value-identical (verified on a bare
    #   session), rotated because the ingest path changed
    "t26_lake_bigram_nll",  # r12: same ingest-path change (lm/ rows
    #   value-identical under the rebuilt lake)
    "a7_lake_cms_heavy_hitters",  # r12: same ingest-path change
    "a8_lake_heavy_hitters",  # r12: same ingest-path change
    "s20_lake_pq_search",  # r12: the qv-projection restructure
    #   (narrow shortlist exchange + broadcast qv re-attach) runs
    #   inside pq_layer_search's serve path — value-identical
    #   (183/183 bare-session sweep), rotated per the a12 standing
    #   rule: changed serve expression = fresh driver row
    "s22_opq_lake_search",  # r12: same pq_layer_search change (the
    #   OPQ-permuted path shares the scoring stage)
]

_PRIORITY: list[str] = [
    # -- (1) new entries, then every entry in CHANGED_SINCE_LAST_ROW --
    "m9_scene_frame_hashes",  # NEW r12: scene-representative frame
    #   sampling + perceptual hashing (m7 -> first-frame rule -> m6)
    "m9b_scene_clip_dups",  # NEW r12: cross-asset scene/clip dedup
    #   (m9 hashes -> m6b banded pair scan)
    "a13_lake_segment_overlap",  # NEW r12: grouped-HLL lake facet +
    #   stored-row pairwise segment overlap serve
    "t30_weighted_sample",  # NEW r12: deterministic weighted sampling
    #   without replacement (Efraimidis-Spirakis exponential race)
    "s24_residual_ivfpq",  # NEW r12: residual-encoded IVF-PQ (the
    #   FAISS-default refinement; per-(query, cell) LUTs)
    "s25_residual_lake_search",  # NEW r12: s24 served from the lake's
    #   stored residual codes (the s14->s20 promotion)
    "x3_zorder_key",  # NEW r12: Z-order clustering key (multi-dim
    #   file-skipping layout; pruning measured in test_bucketing)
    "a14_lake_token_quantiles",  # NEW r12: mergeable quantile-histogram
    #   lake facet (hist/) — token-length quantiles served from stored
    #   decimal buckets
    "t31_dsir_weights",  # NEW r12: DSIR hashed-ngram importance
    #   weights (Xie et al. 2023) + Gumbel-top-k resampling in curate
    "d10_edit_verified_dups",  # NEW r12: LSH candidates verified by
    #   normalized Levenshtein (Ed-Join family) — order-sensitive dups
    "s26_opq_residual_search",  # NEW r12: the full FAISS stack — OPQ
    #   permutation trained on residuals, served from the stored layer
    "t32_leakage_safe_split",  # NEW r12: holdout split keyed by
    #   near-dup cluster — no dup pair straddles train and the holdouts
    "a12_hll_set_ops",
    "a10_lake_bloom_decontaminate",
    "m8_image_admission",
    "m6_image_ahash",
    "m6b_image_near_dups",
    "a6_lake_sketch",
    "t26_lake_bigram_nll",
    "a7_lake_cms_heavy_hitters",
    "a8_lake_heavy_hitters",
    # -- r12 optimization-round restructures (CHANGED_SINCE_LAST_ROW):
    # changed code outranks stale rotation per the standing rule, so
    # these take window slots ahead of five more r8-stale entries
    # (s13 already holds a slot in the r8 block below) --
    "m5_audio_frame_energy",
    "m5b_audio_pcm_energy",
    "s9_embedding_dup_clusters",
    "d8_dup_clusters",
    "t24_bpe_encode",
    "s20_lake_pq_search",
    "s22_opq_lake_search",
    # -- (2) the 29 r8-latest entries owed since r11 (VERDICT r11
    # item 1: after CORRECTNESS_r12 no entry's latest driver row may
    # predate r9) --
    "q8_market_share",
    "q9_product_profit",
    "s1_similarity_topk",
    "s2_ann_srp_topk",
    "s4_ivf_ann_topk",
    "s5_gemm_ann_topk",
    "s7_ivf_kmeans_quality",
    "s11_embed_admit_batch",
    "s12_reindexed_admit_batch",
    "s13_ann_recall_audit",
    "s15_pq_adc_topk",
    "s16_hamming_topk",
    "s17_ivfpq_topk",
    "s18_compression_recall_audit",
    "s19_pq_train_quality",
    "t2_lang_id",
    "t3_token_counts",
    "t4_fingerprint",
    "t6_token_explode",
    "t7_quality_score",
    # m10/m10b have NO driver row yet — a new entry may never spill out
    # of the window (test_driver_window caught exactly this on the
    # interrupted r11 build's HEAD; fixed as the r12 optimization
    # round's inherited-state repair).
    "m10_audio_fingerprint",
    "m10b_audio_near_dups",
    # ---- slot 50 boundary ---- (the 7 changed-entry slots above plus
    # m10/m10b displace nine r8-stale entries to the r13 rotation;
    # each keeps its standing r8 green row, and all nine — like the
    # whole catalog — are oracle-verified by this round's local parity
    # sweep)
    "t9_decontaminate",
    "t10_repetition_ratio",
    "t11_pack_sequences",
    "t21_domain_mixture",
    "u4_except",
    "w2_keyset_pagination",
    "w3_sorted_dates",
    "w5_session_windows",
    "x1_salted_agg",
    "c10_json_extract",
    "c1_epoch_to_date",
    "c4_batch_id",
    "c5_regex_extract",
    "c6_players_concat",
    "c7_batch_from_details",
    "c8_prefix_predicate",
    "f1_watermark_filter",
    "f2_undownloaded_filter",
    "f3_conjunctive_flags",
    "f4_failed_retry_predicate",
    "f6_point_lookup",
    "f7_partition_filter",
]


def _merge() -> dict[str, Query]:
    flat: dict[str, Query] = {}
    for mod in (relational, joins, llm, battlelog, extras, tpch):
        for q in mod.QUERIES:
            if q.name in flat:
                raise ValueError(f"duplicate query name: {q.name}")
            # the @q decorator binds to the NEXT def: a helper inserted
            # between decorator and query silently becomes the catalog
            # entry (this once registered a private helper as q2). The
            # convention function-name == query-name makes that a
            # load-time error instead of a runtime surprise.
            if q.spark.__name__ != q.name:
                raise ValueError(
                    f"catalog entry {q.name!r} is implemented by "
                    f"{q.spark.__name__!r} — the @q decorator probably "
                    "bound to a helper def placed between it and the "
                    "intended query function"
                )
            flat[q.name] = q
    missing = [n for n in _PRIORITY if n not in flat]
    if missing:
        raise ValueError(f"_PRIORITY names not in catalog: {missing}")
    out: dict[str, Query] = {n: flat[n] for n in _PRIORITY}
    for n, q in flat.items():
        if n not in out:
            out[n] = q
    return out


ALL_QUERIES: dict[str, Query] = _merge()
