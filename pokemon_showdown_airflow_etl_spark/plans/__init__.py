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

# Front of the driver's 50-query window, round 3: first the 14 catalog
# entries that have NEVER had a driver row (committed after the r2
# window was consumed), then the queries changed this round (a1 rewritten
# to an error-bound oracle; q11/q20 de-vacuized — both already in the
# never-checked set), then 35 round-1-checked entries whose rows are now
# the stalest (w2/s2/s3 re-greened in r2, so they rotate behind).
# Round-2-green entries rotate out; the local oracle-parity gate still
# sweeps every entry each run, and tests/test_driver_window.py asserts
# no catalog entry can miss both a past row and this window.
_PRIORITY: list[str] = [
    # -- never driver-checked (r3 must green all of these) --
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",  # changed in r3: data-driven nation + avg threshold
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_suppliers",  # changed in r3: data-driven region
    "q21_waiting_suppliers",
    "t12_hash_split",
    "t13_domain_mix",
    # -- changed/new in round 3: first hash-checkable driver row --
    "a1_approx_sketches",
    "s7_ivf_kmeans_quality",  # new in r3: trained-quantizer IVF contract
    "j10_asof_last_click",  # new in r3: as-of join vs native ASOF oracle
    "j11_range_follow_events",  # new in r3: bucketed band range join
    "s8_int8_quant",  # new in r3: int8 vector quantization contract
    "t14_unigram_logprob",  # new in r3: perplexity-style quality score
    "t15_domain_cap",  # new in r3: exact per-domain ceiling (2-phase top-k)
    "b8_head_to_head",  # new in r3: docs x parsed-log join shape
    # -- stalest standing rows (r1-only): rotate back under the signal --
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
