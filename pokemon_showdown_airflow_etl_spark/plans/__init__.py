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

# Front of the driver's 50-query window, round 6. Rotation rule
# (VERDICT r3, made standing by r4 item 1): (1) every entry whose code
# changed after its latest driver row (= CHANGED_SINCE_LAST_ROW), then
# (2) the entries with the OLDEST standing rows, oldest first. After
# CORRECTNESS_r05 (50/50 green) the cumulative freshness is 50 r5-latest,
# 43 r4-latest, 37 r3-latest — so the r6 window is: the round-6 changed
# entries, then the full 37-name r3 block, then the oldest r4 rows to
# fill slot 50. All 12 names r5 greened were cleared from the
# changed-list (keeping them would burn slots re-checking unchanged
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
    "s11_embed_admit_batch",  # r6 NEW: incremental semantic admission vs index
    "t20_paragraph_dedup",  # r6 NEW: C4-style repeated-paragraph removal
    "t21_domain_mixture",  # r6 NEW: temperature-weighted domain mixture
    "s4_ivf_ann_topk",  # r6: ivf_topk gained the queried-cell semi-join prune
    "s7_ivf_kmeans_quality",  # r6: same ivf_topk change (query_ids path)
    "t22_domain_mixture_exact",  # r6 NEW: largest-remainder exact budget
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW, new first --
    "s11_embed_admit_batch",
    "t20_paragraph_dedup",
    "t21_domain_mixture",
    "s4_ivf_ann_topk",
    "s7_ivf_kmeans_quality",
    "t22_domain_mixture_exact",
    # -- (2) the full 37-name r3-latest block, so after r6 no catalog
    # entry's latest row predates round 4 --
    "f1_watermark_filter",
    "f2_undownloaded_filter",
    "f3_conjunctive_flags",
    "f4_failed_retry_predicate",
    "f6_point_lookup",
    "f7_partition_filter",
    "g1_high_watermark",
    "g2_low_watermark",
    "g3_lifecycle_stats",
    "g4_duplicate_detection",
    "g5_ids_by_date",
    "g6_dedup_keep_one",
    "g7_daily_counters",
    "g9_table_count",
    "g10_throughput_metrics",
    "g11_lifecycle_cube",
    "w1_latest_per_key",
    "w4_head_n",
    "u1_union_all",
    "c1_epoch_to_date",
    "c4_batch_id",
    "c5_regex_extract",
    "c6_players_concat",
    "c7_batch_from_details",
    "c8_prefix_predicate",
    "c10_json_extract",
    "j1_existence_flag",
    "j2_ingest_anti_join",
    "t12_hash_split",
    "t13_domain_mix",
    "t15_domain_cap",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    # -- (3) oldest-r4 rotations filling to slot 50 --
    "u2_distinct_union",
    "c13_bool_coercion",
    "j3_compaction_anti_join",
    "j4_reconcile_semi_join",
    "j5_broadcast_lookup",
    "j7_membership_flag",
    "j8_star_join_revenue",
    # (q1/q3/q6 gave their slots to the changed s4/s7 and the new t22;
    # they stay r4-latest and rotate in r7)
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
