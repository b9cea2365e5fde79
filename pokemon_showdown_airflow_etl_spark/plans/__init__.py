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

# Front of the driver's 50-query window, round 5. Rotation rule
# (VERDICT r3, made standing by r4 item 1): (1) every entry whose code
# changed after its latest driver row (= CHANGED_SINCE_LAST_ROW), then
# (2) the entries with the OLDEST standing rows, oldest first — for r5
# that is u3/u4 (r1-only, the catalog's stalest pair) plus the full
# 34-name stale-r2 block, then 2 r3 rotations (q8/q9 — q21 and g11
# gave their slots to the new t19/s10) to fill slot 50. All 37
# names r4 re-greened were cleared from the changed-list at r5 start
# (keeping them would have burned 37 of 50 slots re-checking unchanged
# code). The local oracle-parity gate still sweeps all entries each
# run, and tests/test_driver_window.py asserts no entry can miss both
# a past row and this window.
# Entries whose implementation changed since their latest driver row —
# maintained by hand when editing query code, cleared when the next
# CORRECTNESS file greens them. tests/test_driver_window.py asserts
# every name here holds a slot in the upcoming 50-entry window, so a
# changed query can no longer coast on a stale green row (the t8/g16/s6
# gap VERDICT r3 flagged).
CHANGED_SINCE_LAST_ROW: list[str] = [
    "d9_incremental_dedup",  # r5 NEW: batch-vs-corpus signature-lake dedup
    "t18_scrub",  # r5 NEW: C4-style PII scrub + URL canonicalization
    "t19_hybrid_rrf",  # r5 NEW: BM25 + cosine reciprocal-rank fusion
    "s10_mmr_rerank",  # r5 NEW: MMR diversity re-ranking of candidates
    "s6_embedding_outliers",  # r5: exact=True twin of the new approx default
    "t5_corpus_stats",  # r5: rewritten onto operators/text.py::corpus_stats
    "x2_salted_join",  # r5: per-row deviations quantized to 1e-4 bigints
    "b5_first_log_timestamp",  # r5: lake first_log_ts skips malformed stamps
    "a3_mg_cms_heavy_hitters",  # r5: string-key guard in the approx path
    "d3_minhash_lsh_candidates",  # r5: band construction -> shared band_keys()
    "d7_lsh_verified_dups",  # r5: same band_keys() refactor (via d3's path)
    "d8_dup_clusters",  # r5: same band_keys() refactor (via d7's path)
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW, new first --
    "d9_incremental_dedup",
    "t18_scrub",
    "t19_hybrid_rrf",
    "s10_mmr_rerank",
    "s6_embedding_outliers",
    "t5_corpus_stats",
    "x2_salted_join",
    "b5_first_log_timestamp",
    "a3_mg_cms_heavy_hitters",
    "d3_minhash_lsh_candidates",
    "d7_lsh_verified_dups",
    "d8_dup_clusters",
    # -- (2) the two r1-only entries, three rounds overdue --
    "u3_intersect",
    "u4_except",
    # -- (2b) the whole stale-r2 block (t5 already above), so after r5
    # no catalog entry's latest row predates round 3 --
    "c9_filename_to_id",
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
    "w2_keyset_pagination",
    "w3_sorted_dates",
    "w5_session_windows",
    "x1_salted_agg",
    # -- (3) r3 rotations filling to slot 50, heaviest plans first --
    "q8_market_share",
    "q9_product_profit",
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
