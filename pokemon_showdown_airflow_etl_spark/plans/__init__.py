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
    # -- r13 OPTIMIZATION-round changes (value-identical restructures,
    # each re-proven against the DuckDB oracle on a bare session the
    # day it changed — tools/raw_oracle_sweep.py 183/183 green; see
    # OPTIMIZATION_r13.md for the before/after evidence). The 17 r12
    # names that used to sit here were all greened by CORRECTNESS_r12
    # (err=null, hash_match=true) and are cleared per this list's own
    # rule (ADVICE r12 item 2). --
    "s9_embedding_dup_clusters",  # connected_components: 2 propagation
    #   rounds per checkpoint+probe pair + scale-adaptive loop-frame
    #   coalesce (derived from edge-row count; identity at scale)
    "d8_dup_clusters",  # same connected_components change
    "t32_leakage_safe_split",  # same (leakage split keys on d8's
    #   clustering machinery)
    "d2_ngram_jaccard_pairs",  # PPJoin positional prefix filter before
    #   the array_intersect verification (no false negatives —
    #   property-tested + oracle green)
    "a5_sampled_quantiles",  # audit legs fan out of ONE aggregation row
    #   via explode(array(structs)) — the pinned-row 4-way union is gone
    "s18_compression_recall_audit",  # ONE fused Arrow kernel scores
    #   ADC/Hamming/exact in a single corpus pass, emitting batch-local
    #   shortlists (supersets of the global ones — row-identical)
    "a12_hll_set_ops",  # hll_pairwise_overlap: one pin (registers),
    #   broadcast doubled-pair-key equi-joins replace OR-joins; exact
    #   audit distincts (grp, uid) once and counts per side
    "a13_lake_segment_overlap",  # same shared derivation + audit
    "a4_hll_distinct",  # HLL register/rank/summary expressions build as
    #   single-parse SQL strings (same ops, one py4j round trip)
    "a6_lake_sketch",  # same: the stored-register summary serve uses
    #   the SQL-string hll_summary_of_registers
    "a11_grouped_hll_distinct",  # same: hll_registers_by/hll_summary_by
]

_PRIORITY: list[str] = [
    # -- (1) every entry in CHANGED_SINCE_LAST_ROW (r13 changed code
    # outranks stale rotation per the standing rule) --
    "s9_embedding_dup_clusters",
    "d8_dup_clusters",
    "t32_leakage_safe_split",
    "d2_ngram_jaccard_pairs",
    "a5_sampled_quantiles",
    "s18_compression_recall_audit",
    "a12_hll_set_ops",
    "a13_lake_segment_overlap",
    "a4_hll_distinct",
    "a6_lake_sketch",
    "a11_grouped_hll_distinct",
    # -- (2) the nine r8-stale entries displaced from the r12 window
    # (VERDICT r12 item 9 / ADVICE item 1: they take the freed slots) --
    "t9_decontaminate",
    "t10_repetition_ratio",
    "t11_pack_sequences",
    "t21_domain_mixture",
    "u4_except",
    "w2_keyset_pagination",
    "w3_sorted_dates",
    "w5_session_windows",
    "x1_salted_agg",
    # -- (3) the r9-latest block, oldest debt first: the 13 names
    # queued since r12, then the rest in name order --
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
    "g10_throughput_metrics",
    "g11_lifecycle_cube",
    "g1_high_watermark",
    "g2_low_watermark",
    "g3_lifecycle_stats",
    "g4_duplicate_detection",
    "g5_ids_by_date",
    "g6_dedup_keep_one",
    "g7_daily_counters",
    "j1_existence_flag",
    "j2_ingest_anti_join",
    "j3_compaction_anti_join",
    "j4_reconcile_semi_join",
    "j5_broadcast_lookup",
    "j7_membership_flag",
    "j8_star_join_revenue",
    "q12_priority_shipping",
    # ---- slot 50 boundary ---- (the 11 changed-entry slots displace
    # the remaining 13 r9-latest names to the r14 rotation; each keeps
    # its standing r9 green row and — like the whole catalog — is
    # oracle-verified by this round's local parity sweep. After
    # CORRECTNESS_r13 no entry's latest driver row predates r9.)
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "s21_opq_audit",
    "t12_hash_split",
    "t13_domain_mix",
    "t15_domain_cap",
    "t20b_separator_dedup",
    "t22_domain_mixture_exact",
    "t23_vocab_encode",
    "w1_latest_per_key",
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
