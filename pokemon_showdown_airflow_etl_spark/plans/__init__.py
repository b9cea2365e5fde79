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

# Front of the driver's 50-query window, round 7. Rotation rule
# (VERDICT r3, made standing by r4 item 1): (1) every entry whose code
# changed after its latest driver row (= CHANGED_SINCE_LAST_ROW), then
# (2) the entries with the OLDEST standing rows, oldest first. After
# CORRECTNESS_r06 (50/50 green) the cumulative freshness is 50
# r6-latest, 50 r5-latest, 34 r4-latest — so the r7 window is: the
# round-7 changed/new entries, then the full 34-name r4 block, then the
# head of the r5 window to fill slot 50. All 6 names r6 greened were
# cleared from the changed-list (keeping them would burn slots
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
    "s12_reindexed_admit_batch",  # r7 NEW: quantizer-migration backfill
    "t20_paragraph_dedup",  # r7: oracle anchored on documents (ADVICE r6)
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW, new first --
    "s12_reindexed_admit_batch",
    "t20_paragraph_dedup",
    # -- (2) the full 34-name r4-latest block, so after r7 no catalog
    # entry's latest row predates round 5 --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "j10_asof_last_click",
    "j11_range_follow_events",
    "j12_asof_last_click_sliced",
    "d1_exact_dedup",
    "d2_ngram_jaccard_pairs",
    "d4_simhash_fingerprint",
    "d5_simhash_near_dups",
    "s1_similarity_topk",
    "s3_embedding_near_dups",
    "s9_embedding_dup_clusters",
    "t1_quality_features",
    "t8_tfidf_top_terms",
    "s8_int8_quant",
    "t14_unigram_logprob",
    "t16_bm25_topk",
    "t17_chunk_windows",
    "a2_cms_heavy_hitters",
    "b1_log_command_histogram",
    "b2_battle_event_times",
    "b3_player_win_rates",
    "b4_move_usage",
    "b6_event_gaps",
    "b7_move_ranks",
    "b8_head_to_head",
    "a1_approx_sketches",
    "g16_funnel",
    "g17_rolling_7day",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q15_top_supplier",
    "q20_excess_suppliers",
    # -- (3) head of the r5 window filling to slot 50 --
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
    "u3_intersect",
    "c9_filename_to_id",
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
