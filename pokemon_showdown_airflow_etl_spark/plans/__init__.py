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

# Front of the driver's 50-query window, round 8. Rotation rule
# (VERDICT r3, made standing by r4 item 1): (1) every entry whose code
# changed after its latest driver row (= CHANGED_SINCE_LAST_ROW), then
# (2) the entries with the OLDEST standing rows, oldest first. After
# CORRECTNESS_r07 (50/50 green) the cumulative freshness is 50
# r7-latest, 49 r6-latest, 36 r5-latest — so the r8 window is: the
# round-8 new/changed entries (s13-s19 + t23 new; s12, whose backfill
# went batch-parallel this round), then the full 36-name r5 block,
# then the head of the r6 window to fill slot 50. t20 greened in r7 and was
# cleared from the changed-list (keeping it would burn a slot
# re-checking unchanged code). The local oracle-parity gate still
# sweeps all entries each run, and tests/test_driver_window.py asserts
# no entry can miss both a past row and this window.
# Entries whose implementation changed since their latest driver row —
# maintained by hand when editing query code, cleared when the next
# CORRECTNESS file greens them. tests/test_driver_window.py asserts
# every name here holds a slot in the upcoming 50-entry window, so a
# changed query can no longer coast on a stale green row (the t8/g16/s6
# gap VERDICT r3 flagged).
CHANGED_SINCE_LAST_ROW: list[str] = [
    "s13_ann_recall_audit",  # r8 NEW: IVF recall@1 vs exact per n_probe
    "s12_reindexed_admit_batch",  # r8: batch-parallel reindex backfill
    "s14_pq_codes",  # r8 NEW: product-quantization encode
    "s15_pq_adc_topk",  # r8 NEW: PQ asymmetric-distance search + rescore
    "s16_hamming_topk",  # r8 NEW: binary sign-sketch Hamming search
    "s17_ivfpq_topk",  # r8 NEW: composed IVF-PQ (cells -> ADC -> rescore)
    "s18_compression_recall_audit",  # r8 NEW: PQ/Hamming recall vs shortlist
    "s19_pq_train_quality",  # r8 NEW: trained-codebook quality contract
    "t23_vocab_encode",  # r8 NEW: dictionary encoding (tokenize-to-ids)
    "s1_similarity_topk",  # r8: brute-force kernel rewrite (GEMM + local top-k)
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW, new first --
    "s13_ann_recall_audit",
    "s12_reindexed_admit_batch",
    "s14_pq_codes",
    "s15_pq_adc_topk",
    "s16_hamming_topk",
    "s17_ivfpq_topk",
    "s18_compression_recall_audit",
    "s19_pq_train_quality",
    "t23_vocab_encode",
    "s1_similarity_topk",
    # -- (2) the full 36-name r5-latest block, so after r8 no catalog
    # entry's latest row predates round 6 --
    "c11_mtime_fallback",
    "d6_drop_exact_dups",
    "g8_retry_counters",
    "g12_event_pivot",
    "g13_event_unpivot",
    "g14_value_histogram",
    "g15_retention_cohorts",
    "j9_above_customer_avg",
    "m1_payload_metadata",
    "m2_image_decode_features",
    "m3_frame_sample_plan",
    "m4_image_resize",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q18_top_customers",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
    "s2_ann_srp_topk",
    "s5_gemm_ann_topk",
    "t2_lang_id",
    "t3_token_counts",
    "t4_fingerprint",
    "t6_token_explode",
    "t7_quality_score",
    "t9_decontaminate",
    "t10_repetition_ratio",
    "t11_pack_sequences",
    "u4_except",
    "w2_keyset_pagination",
    "w3_sorted_dates",
    "w5_session_windows",
    "x1_salted_agg",
    # -- (3) head of the r6 window filling to slot 50 --
    "s11_embed_admit_batch",
    "t21_domain_mixture",
    "s4_ivf_ann_topk",
    "s7_ivf_kmeans_quality",
    # ---- slot 50 boundary ----
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
