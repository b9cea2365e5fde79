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

# Front of the driver's 50-query window, round 11. Rotation rule
# (VERDICT r3, made standing by r4 item 1): (1) every entry whose code
# changed after its latest driver row (= CHANGED_SINCE_LAST_ROW), then
# (2) the entries with the OLDEST standing rows, oldest first. After
# CORRECTNESS_r10 (50/50 green) the cumulative freshness is 50
# r10-latest, 47 r9-latest, 48 r8-latest, 8 r7-latest. The r11 window
# (VERDICT r10 item 1): the changed/new entries, then the three
# rule-refinement entries whose code changed after their latest row
# without rotating in r10 (a4 hll_summary split, s14/s20 perm threading
# + crash recovery — re-greening them retires the refinement debt),
# then the eight r7-latest spills, then 30 of the 48-name r8-latest
# block — 18 spill to r12 (listed at the section (4) comment below; all
# were green in r8 and are re-verified by every local parity sweep).
# After CORRECTNESS_r11 no entry's latest driver row predates r8 and no
# changed-since-row entry remains.
# Entries whose implementation changed since their latest driver row —
# maintained by hand when editing query code, cleared when the next
# CORRECTNESS file greens them. tests/test_driver_window.py asserts
# every name here holds a slot in the upcoming 50-entry window, so a
# changed query can no longer coast on a stale green row (the t8/g16/s6
# gap VERDICT r3 flagged).
CHANGED_SINCE_LAST_ROW: list[str] = [
    "t25_bigram_logprob",  # r11: refactored into the bigram_lm_rows +
    #   bigram_nll_with_lm composition so the lm/ lake facet and the
    #   self-trained path share one implementation — value-identical
    #   (shared pinned occurrence stream keeps the r10 plan shape),
    #   re-oracled in the 156-entry raw sweep; rotated for the hard
    #   driver signal anyway (VERDICT r10 item 1's standing rule)
    "a6_lake_sketch",  # r11: merge_sketch_rows dedupes identical KMV
    #   (h,k,v) rows before ranking (ADVICE r10: compaction crash-window
    #   reads saw each row twice) — a no-op for a6's disjoint demo
    #   batches, rotated because the merge expression changed
    "m5b_audio_pcm_energy",  # r11: null-payload guard at the pruned
    #   select + text IS NOT NULL in the oracle (ADVICE r10)
    "m5_audio_frame_energy",  # r11: same null-payload guard as m5b
    "m3_frame_sample_plan",  # r11: frame_sample_plan now passes input
    #   columns through the explode (m7 rides its digest column through
    #   the shared fan-out) — m3 projects after, provably identical,
    #   re-verified by the raw sweep; rotated because the operator
    #   expression changed (already held a window slot in section (4),
    #   listed here so the changed-entry gate tracks it)
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW, new first --
    "a12_hll_set_ops",  # NEW r11: sketch-only audience overlap
    "a11_grouped_hll_distinct",  # NEW r11: per-group HLL distinct
    "m8_image_admission",  # NEW r11: incremental image-drop admission
    "m7_scene_segments",  # NEW r11: shot-boundary scene segmentation
    "m6_image_ahash",  # NEW r11: perceptual average-hash kernel
    "m6b_image_near_dups",  # NEW r11: banded-Hamming image dedup
    "a10_lake_bloom_decontaminate",  # NEW r11: lake-served Bloom decon
    "t28_moore_lewis_score",  # NEW r11: contrastive in/out-domain LM
    "t29_nb_domain_classifier",  # NEW r11: trained NB domain classifier
    "s23_semantic_dedup",  # NEW r11: SemDeDup keep/drop verdicts
    "t26_lake_bigram_nll",  # NEW r11: stored-LM NLL (lm/ facet)
    "a7_lake_cms_heavy_hitters",  # NEW r11: lake-served CMS (cms/ facet)
    "a8_lake_heavy_hitters",  # NEW r11: end-to-end stored-row HH serve
    "t27_token_budget_mixture",  # NEW r11: exact-token-budget mixture
    "a9_lake_embedding_drift",  # NEW r11: embedding-lake drift facet
    "s22_opq_lake_search",  # NEW r11: OPQ perm served from the PQ lake
    "t25_bigram_logprob",
    "a6_lake_sketch",
    "m5b_audio_pcm_energy",
    "m5_audio_frame_energy",
    # -- (2) the r10 rule-refinement trio: output-identical changes
    # (verified on a bare session) that skipped rotation under the
    # documented convention; VERDICT r10 item 1 asks for the hard
    # driver signal anyway --
    "a4_hll_distinct",
    "s14_pq_codes",
    "s20_lake_pq_search",
    # -- (3) the eight r7-latest spills owed since r10 --
    "b5_first_log_timestamp",
    "c9_filename_to_id",
    "t1_quality_features",
    "t5_corpus_stats",
    "t17_chunk_windows",
    "t20_paragraph_dedup",
    "u3_intersect",
    "x2_salted_join",
    # -- (4) the r8-latest block fills the remaining slots; spilling to
    # r12: s1_similarity_topk, s2_ann_srp_topk, s4_ivf_ann_topk,
    # s5_gemm_ann_topk, s7_ivf_kmeans_quality,
    # t10_repetition_ratio, t11_pack_sequences,
    # t21_domain_mixture, t2_lang_id, t3_token_counts, t4_fingerprint,
    # t6_token_explode, t7_quality_score, t9_decontaminate, u4_except,
    # w2_keyset_pagination, w3_sorted_dates, w5_session_windows,
    # x1_salted_agg (all green in r8; the local parity sweep still
    # re-verifies them every run at two SFs) --
    "c11_mtime_fallback",
    "d6_drop_exact_dups",
    "g12_event_pivot",
    "g13_event_unpivot",
    "g14_value_histogram",
    "g15_retention_cohorts",
    "g8_retry_counters",
    "j9_above_customer_avg",
    "m1_payload_metadata",
    "m2_image_decode_features",
    "m3_frame_sample_plan",
    "m4_image_resize",
    "q10_returned_items",
    "q18_top_customers",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    # the reserved head slots are all taken (t26, a7, s22 in section
    # (1)), plus t25's rotation, a8, t27 and a9; s1_similarity_topk,
    # s2_ann_srp_topk, s4_ivf_ann_topk and s5_gemm_ann_topk joined
    # s7/t10/t11 in yielding their slots to r12's spill list above.
    # The ten mid-round additions (t28/t29/s23/a10/a11/a12/m6/m6b/
    # m7/m8 — new entries must sit in the window) pushed
    # q8_market_share, q9_product_profit,
    # s11_embed_admit_batch, s12_reindexed_admit_batch,
    # s13_ann_recall_audit, s15_pq_adc_topk, s16_hamming_topk,
    # s17_ivfpq_topk, s18_compression_recall_audit and
    # s19_pq_train_quality to the r12 spill as well (all r8-green,
    # re-verified by every local parity sweep).
    # ---- slot 50 boundary ----
    "q8_market_share",
    "q9_product_profit",
    "s11_embed_admit_batch",
    "s12_reindexed_admit_batch",
    "s13_ann_recall_audit",
    "s15_pq_adc_topk",
    "s16_hamming_topk",
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
