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

# Front of the driver's 50-query window, round 4. Rotation rule
# (VERDICT r3): (1) every entry whose code changed after its latest
# driver row (= CHANGED_SINCE_LAST_ROW, 37 names), then (2) as many of
# the 15 r1-only entries as fit — 37 + 13 = the 50-slot window;
# u3_intersect/u4_except and the block-(3) tail carry their standing
# rows and wait for the r5 rotation. The local oracle-parity gate still sweeps all
# entries each run, and tests/test_driver_window.py asserts no entry
# can miss both a past row and this window.
# Entries whose implementation changed since their latest driver row —
# maintained by hand when editing query code, cleared when the next
# CORRECTNESS file greens them. tests/test_driver_window.py asserts
# every name here holds a slot in the upcoming 50-entry window, so a
# changed query can no longer coast on a stale green row (the t8/g16/s6
# gap VERDICT r3 flagged).
CHANGED_SINCE_LAST_ROW: list[str] = [
    "t16_bm25_topk",
    "g17_rolling_7day",
    "t17_chunk_windows",  # r4 NEW: RAG/long-context chunking
    "a2_cms_heavy_hitters",  # r4 NEW: count-min sketch heavy hitters
    "a3_mg_cms_heavy_hitters",  # r4 NEW: Misra-Gries + CMS production path
    "x2_salted_join",  # r4 NEW: salted skew join cataloged
    # signature-lake routing (jobs/doc_signature_lake.py) changed these
    # after any prior driver row:
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_candidates",
    "d4_simhash_fingerprint",
    "d5_simhash_near_dups",
    "d7_lsh_verified_dups",
    "d8_dup_clusters",
    "s4_ivf_ann_topk",  # r4: per-cell GEMM scoring + ivf query_ids param
    "s7_ivf_kmeans_quality",  # r4: sufficient-statistics trainer + tol stop
    "a1_approx_sketches",  # r4: distinct agg split out of the sketch agg
    "s3_embedding_near_dups",  # r4: per-bucket GEMM scoring (fdf7e71)
    # postdates its r2 row — CORRECTNESS_r03 has no s3 entry
    "s9_embedding_dup_clusters",  # r4 NEW: embedding dup clusters
    # pin() indirection (c81f383) touched these after their r3 rows —
    # same edit as j11; the gate must cover them identically
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q15_top_supplier",
    "q20_excess_suppliers",
    "t14_unigram_logprob",
    "t8_tfidf_top_terms",
    "g16_funnel",
    "s6_embedding_outliers",
    "j12_asof_last_click_sliced",
    "j10_asof_last_click",
    "j11_range_follow_events",
    "s8_int8_quant",
    "b1_log_command_histogram",
    "b2_battle_event_times",
    "b3_player_win_rates",
    "b4_move_usage",
    "b5_first_log_timestamp",
    "b6_event_gaps",
    "b7_move_ranks",
    "b8_head_to_head",
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW, new/changed first --
    # (37 names: r4 additions, the signature-lake d-set, the pin()
    # indirection set, and the battle-log-lake b-set; the window gate
    # requires ALL of them inside the first 50)
    "t8_tfidf_top_terms",  # rescan elimination (4853915)
    "g16_funnel",  # rescan elimination (4853915)
    "s6_embedding_outliers",  # distance-frame pinning (3aa0f3b)
    "t16_bm25_topk",  # NEW: BM25 top-k retrieval
    "g17_rolling_7day",  # NEW: range-frame rolling trend
    "t17_chunk_windows",  # NEW: window/stride chunk inventory
    "a2_cms_heavy_hitters",  # NEW: count-min sketch heavy hitters
    "a3_mg_cms_heavy_hitters",  # NEW: bounded-memory MG+CMS path
    "x2_salted_join",  # NEW: salted skew join vs plain-join oracle
    "j12_asof_last_click_sliced",  # NEW: partition-bounded as-of
    "d2_ngram_jaccard_pairs",  # signature-lake routing
    "d3_minhash_lsh_candidates",  # signature-lake routing
    "d4_simhash_fingerprint",  # signature-lake routing
    "d5_simhash_near_dups",  # signature-lake routing
    "d7_lsh_verified_dups",  # signature-lake routing
    "d8_dup_clusters",  # signature-lake routing
    "s4_ivf_ann_topk",  # per-cell GEMM scoring + ivf query_ids param
    "s7_ivf_kmeans_quality",  # sufficient-statistics trainer + tol stop
    "s3_embedding_near_dups",  # per-bucket GEMM pair scoring
    "s9_embedding_dup_clusters",  # NEW: s3 pairs -> components -> keeper
    "a1_approx_sketches",  # distinct agg split out of the sketch agg
    "q2_min_cost_supplier",  # pin() indirection (c81f383), like j11
    "q11_important_parts",
    "q15_top_supplier",
    "q20_excess_suppliers",
    "t14_unigram_logprob",
    "j10_asof_last_click",  # NULL-carry struct fix in asof_join
    "j11_range_follow_events",  # anchor frame now routes through pin()
    "s8_int8_quant",  # rounding order matched to oracle
    "b1_log_command_histogram",  # b-set rewritten onto the
    "b2_battle_event_times",  # materialized battle-log lake
    "b3_player_win_rates",  # (jobs/battlelog_lake.py) — every
    "b4_move_usage",  # entry re-checks the lake end-to-end
    "b5_first_log_timestamp",
    "b6_event_gaps",
    "b7_move_ranks",
    "b8_head_to_head",
    # -- (2) 13 of the 15 entries whose only driver row is from round 1
    # (37 + 13 = exactly the 50-slot window; u3/u4 wait for r5) --
    "c13_bool_coercion",
    "d1_exact_dedup",
    "j3_compaction_anti_join",
    "j4_reconcile_semi_join",
    "j5_broadcast_lookup",
    "j7_membership_flag",
    "j8_star_join_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "s1_similarity_topk",
    "t1_quality_features",
    "u2_distinct_union",
    # ---- slot 50 boundary ----
    "u3_intersect",  # first in line when the r5 window rotates
    "u4_except",
    # -- (3) stalest r2 rows, heavy first --
    "d6_drop_exact_dups",
    "s5_gemm_ann_topk",
    "t9_decontaminate",
    "t10_repetition_ratio",
    "t11_pack_sequences",
    "w5_session_windows",
    "g15_retention_cohorts",
    "m1_payload_metadata",
    "m2_image_decode_features",
    "m4_image_resize",
    "q4_order_priority",
    "j9_above_customer_avg",
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
