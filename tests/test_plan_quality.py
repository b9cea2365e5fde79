"""Physical-plan quality gates: the properties that make these queries
scale are asserted structurally, not just benchmarked — filters reach
the parquet scan, projections prune the read schema, small sides
broadcast, anti-joins stay anti, nothing degenerates into a cartesian
product, and hot paths stay inside whole-stage codegen."""

from __future__ import annotations

import contextlib
import io

import pytest

from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def build(name: str) -> str:
        return plan_text(ALL_QUERIES[name].spark(spark, sf_dir))

    return build


def test_filter_pushdown_reaches_scan(q):
    plan = q("f2_undownloaded_filter")
    assert "PushedFilters" in plan
    assert "EqualTo(o_orderstatus,O)" in plan


def test_projection_prunes_read_schema(q):
    plan = q("f2_undownloaded_filter")
    # only the 4 projected + filter columns may be read; o_comment and
    # o_totalprice's siblings must not appear in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_comment" not in read_schema
    assert "o_clerk" not in read_schema
    assert "o_totalprice" in read_schema


def test_point_lookup_pushes_equality(q):
    plan = q("f6_point_lookup")
    assert "EqualTo(o_orderkey,42)" in plan


def test_small_dimension_joins_broadcast(q):
    # j5's lookup side and j8's region/nation dims must broadcast, not
    # shuffle the fact side
    assert "BroadcastHashJoin" in q("j5_broadcast_lookup")
    assert "BroadcastHashJoin" in q("j8_star_join_revenue")


def test_ingest_anti_join_is_anti(q):
    assert "LeftAnti" in q("j2_ingest_anti_join")


def test_no_cartesian_products_in_pair_generators(q):
    for name in (
        "d2_ngram_jaccard_pairs",
        "d3_minhash_lsh_candidates",
        "d5_simhash_near_dups",
        "d9_incremental_dedup",
        "s2_ann_srp_topk",
        "s3_embedding_near_dups",
    ):
        plan = q(name)
        assert "CartesianProduct" not in plan, f"{name} degenerated to cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} nested-loop join"


def test_flagship_agg_partial_before_exchange(q):
    # map-side combine: a HashAggregate must appear before the shuffle.
    # (AQE's initial formatted plan hides WholeStageCodegen markers, so
    # codegen is asserted via the no-Python test below instead.)
    plan = q("q1_pricing_summary")
    assert plan.index("HashAggregate") < plan.index("Exchange")
    assert "partial_sum" in plan


def test_lifecycle_stats_single_exchange(q):
    plan = q("g3_lifecycle_stats")
    assert plan.count("Exchange") <= 2  # one shuffle + possible AQE read


def test_explode_parse_is_builtin_generate(spark, sf_dir, q):
    # the log explode is a built-in Generate (posexplode), never a
    # Python UDTF — since r4 it runs at lake build, so gate the build
    # plan; the b1 QUERY plan must contain no Generate at all (that's
    # the point of materializing) and read only the command column
    from pokemon_showdown_airflow_etl_spark.functions.logparse import (
        battle_events,
    )
    from pokemon_showdown_airflow_etl_spark.plans.battlelog import corpus

    build = plan_text(battle_events(corpus(spark, sf_dir)))
    assert "Generate" in build
    assert "BatchEvalPython" not in build

    plan = q("b1_log_command_histogram")
    assert "Generate" not in plan, "b1 re-parses instead of reading the lake"
    assert "BatchEvalPython" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and all(
        "args" not in l and "event_ts" not in l for l in read_schema
    ), "b1 reads more than the command column from the lines table"


def test_no_python_udfs_in_relational_core(q):
    for name in ("q1_pricing_summary", "g3_lifecycle_stats", "w1_latest_per_key",
                 "t1_quality_features", "t2_lang_id", "d1_exact_dedup"):
        assert "BatchEvalPython" not in q(name), f"{name} fell back to Python"


def test_pagination_has_no_full_table_window(q, spark, sf_dir):
    # w2 must slice the page from a distributed top-(offset+page)
    # (TakeOrderedAndProject), never rank the whole table through one
    # task. The only Window allowed is the one over the limited rows.
    plan = q("w2_keyset_pagination")
    assert "TakeOrderedAndProject" in plan, "page fetch lost its top-k form"
    # in the tree, the Window's input must be the limit, not the scan:
    # TakeOrderedAndProject appears below Window in the operator listing
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    # and the full-table form would need a single-partition Exchange
    assert "Exchange SinglePartition" not in plan


def test_compact_job_joins_stay_semi_anti_and_pruned(spark, tmp_path):
    # drive the real pipeline to build a small lake, then explain the
    # exact frames compact() executes (they are module-level helpers)
    from pokemon_showdown_airflow_etl_spark.jobs import (
        MetadataStore, ReplayLake, compact, discover, download,
    )
    from pokemon_showdown_airflow_etl_spark.jobs.pipeline import (
        compact_fresh, compact_keep, compact_todo,
    )
    from pokemon_showdown_airflow_etl_spark.operators import metadata as M
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient
    from pokemon_showdown_airflow_etl_spark.sources.fake import (
        FakeShowdownTransport, make_replays,
    )
    from pyspark.sql import functions as SF

    lake = ReplayLake(str(tmp_path / "lake"))
    client = ReplayApiClient(
        transport=FakeShowdownTransport({"gen9ou": make_replays("gen9ou", 60)}),
        sleeper=lambda s: None,
    )
    discover(spark, lake, client, "gen9ou", max_pages=10)
    download(spark, lake, client, "gen9ou", parallelism=4)
    compact(spark, lake, "gen9ou")  # materializes the compacted lake

    meta = MetadataStore(spark, lake.metadata_path)
    work = M.downloaded_uncompacted(meta.read(), "gen9ou").select("replay_id")
    replays = spark.read.parquet(lake.replays_path).filter(SF.col("format") == "gen9ou")
    existing = spark.read.parquet(lake.compacted_path).filter(SF.col("format") == "gen9ou")

    todo = compact_todo(replays, work)
    p_todo = plan_text(todo)
    assert "LeftSemi" in p_todo and "CartesianProduct" not in p_todo
    # the format predicate prunes raw-lake partitions at the scan
    assert any(
        "PartitionFilters" in l and "format" in l for l in p_todo.splitlines()
    ), "format filter did not reach the raw-lake scan"

    p_fresh = plan_text(compact_fresh(todo, existing))
    assert "LeftAnti" in p_fresh and "CartesianProduct" not in p_fresh
    # anti side reads only the id column from the compacted lake
    anti_scan = [l for l in p_fresh.splitlines() if "ReadSchema" in l]
    assert any("id" in l and "log" not in l for l in anti_scan)

    days = todo.select("format", "date").distinct()
    p_keep = plan_text(compact_keep(existing, days))
    assert "LeftSemi" in p_keep
    assert "BroadcastHashJoin" in p_keep or "BroadcastExchange" in p_keep


def test_battle_event_window_shuffles_narrow_rows(spark, sf_dir, q):
    """The event-time fill's window exchange must carry only
    (replay_id, line_no, stamp): if the |t:| extraction rode inside the
    window function, command and the full args array would cross the
    shuffle for every protocol line (measured 23% at sf0.1). Since r4
    the fill runs at LAKE BUILD (jobs/battlelog_lake.py), so the gate
    checks the build plan; b2 itself must shuffle only its partial
    aggregate — never args/command."""
    from pokemon_showdown_airflow_etl_spark.functions.logparse import battle_events
    from pokemon_showdown_airflow_etl_spark.plans.battlelog import corpus

    build = plan_text(
        battle_events(corpus(spark, sf_dir)).select("replay_id", "event_ts")
    )
    lines = build.splitlines()
    for i, l in enumerate(lines):
        if l.strip().startswith("(") and ") Exchange" in l:
            exchange_input = lines[i + 1]
            assert "Input [3]" in exchange_input, exchange_input
            assert "args" not in exchange_input and "command" not in exchange_input
            break
    else:
        pytest.fail("no Exchange found in the lake-build plan")

    # the query itself: every exchange input stays free of args/command
    qlines = q("b2_battle_event_times").splitlines()
    for i, l in enumerate(qlines):
        if l.strip().startswith("(") and ") Exchange" in l:
            assert "args" not in qlines[i + 1], f"wide shuffle: {qlines[i + 1]}"
            assert "command" not in qlines[i + 1], f"wide shuffle: {qlines[i + 1]}"


def test_q10_top20_is_take_ordered(q):
    plan = q("q10_returned_items")
    assert "TakeOrderedAndProject" in plan, "top-20 fell back to a global sort"
    # returnflag pushes to the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q19_derives_single_table_implications(q):
    # Catalyst must derive each side's single-table implication from the
    # OR-of-ANDs and push it to that side's scan: the brand/size
    # disjunction to part, the quantity disjunction to lineitem — so the
    # join never sees rows no branch could match
    plan = q("q19_disjunctive_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("EqualTo(p_brand,Brand#12)" in l for l in pushed), (
        "brand disjunction not pushed to the part scan"
    )
    assert any("l_quantity" in l for l in pushed), (
        "quantity disjunction not pushed to the lineitem scan"
    )
    assert "CartesianProduct" not in plan


def test_q22_is_anti_join_with_broadcast_scalar(q):
    plan = q("q22_global_sales_opportunity")
    assert "LeftAnti" in plan
    # the avg-balance scalar rides a broadcast, never a collect
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_pack_sequences_window_is_sharded(q):
    # the prefix-sum window must partition by (source, shard) — a
    # partitionless Window over the corpus would rank every row through
    # one task (the w2 failure mode)
    plan = q("t11_pack_sequences")
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan
    assert "shard" in plan.split("Window")[0] or "shard" in plan


def test_hash_split_is_shuffle_free(q):
    plan = q("t12_hash_split")
    assert "Exchange" not in plan, "a pure map pass must not shuffle"
    assert "BatchEvalPython" not in plan


def test_domain_mix_is_shuffle_free(q):
    plan = q("t13_domain_mix")
    assert "Exchange" not in plan, "a pure map pass must not shuffle"
    assert "BatchEvalPython" not in plan


def test_funnel_has_no_cartesian_and_stays_jvm(q):
    plan = q("g16_funnel")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_retention_cohort_reuses_user_partitioning(q):
    # cohort derivation + distinct + join all key on user_id: at most
    # the user_id exchange (x2 for the two branches), the final
    # (cohort, offset) agg exchange, and AQE reads — never a re-shuffle
    # of the fact table on a non-user key in between
    plan = q("g15_retention_cohorts")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_no_tokenization_inside_filter_predicates(q):
    """InferFiltersFromGenerate regression guard: a plain explode over a
    derived gram/shingle array lets Catalyst push a size(...) > 0
    predicate below the token projection, substituting the WHOLE
    tokenize+gram pipeline (split() re-run per element_at) into an
    interpreted Filter — a measured 5-12x slowdown on t9/t10. The fix
    is explode_outer + a post-generate null filter; this asserts no
    Filter condition ever contains the tokenizer again."""
    for name in ("t9_decontaminate", "t10_repetition_ratio"):
        plan = q(name)
        for line in plan.splitlines():
            if line.strip().startswith("Condition :"):
                assert "regexp_replace" not in line, (
                    f"{name}: tokenizer inlined into a Filter predicate"
                )


TPCH_ROUND2 = [
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
]


@pytest.mark.parametrize("name", TPCH_ROUND2)
def test_tpch_depth_queries_stay_distributed(q, name):
    """The 12 remaining TPC-H shapes: no plan may degenerate into a
    cartesian product (each decorrelated subquery must become a real
    join) or fall out of the JVM into a Python UDF."""
    plan = q(name)
    assert "CartesianProduct" not in plan, f"{name} degenerated to cartesian"
    assert "BatchEvalPython" not in plan, f"{name} fell out of codegen"


def test_tpch_date_ranges_push_to_scan(q, spark, sf_dir):
    # Q12/Q14/Q15/Q20: the shipdate window must reach the parquet scan,
    # not evaluate post-join. Q15/Q20 checkpoint their shared aggregate
    # (opaque to explain), so their pre-checkpoint frames are inspected.
    from pokemon_showdown_airflow_etl_spark.plans import tpch as T

    for name in ("q12_priority_shipping", "q14_promo_revenue"):
        assert "GreaterThanOrEqual(l_shipdate" in q(name), name
    assert "GreaterThanOrEqual(l_shipdate" in plan_text(T._q15_revenue(spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan_text(T._q20_shipped(spark, sf_dir))


def test_tpch_dimension_joins_broadcast(q, spark, sf_dir):
    # Q8/Q9: the filtered dimension sides (nation, region, part slice)
    # must broadcast into the fact join, never shuffle lineitem on a dim
    # key. Q2/Q11 pin their shared aggregate behind a localCheckpoint
    # (explain can't see through it), so their pre-checkpoint frames are
    # inspected directly.
    from pokemon_showdown_airflow_etl_spark.plans import tpch as T
    from pyspark.sql import functions as SF

    for name in ("q8_market_share", "q9_product_profit"):
        assert "BroadcastHashJoin" in q(name), f"{name} lost its broadcast dims"
    p15 = __import__(
        "pokemon_showdown_airflow_etl_spark.plans.base", fromlist=["t"]
    ).t(spark, sf_dir, "part").filter(SF.col("p_size") == 15)
    assert "BroadcastHashJoin" in plan_text(T._q2_offers(spark, sf_dir, p15))
    assert "BroadcastHashJoin" in plan_text(T._q11_vals(spark, sf_dir))


def test_scalar_thresholds_ride_broadcasts(q):
    # Q11's per-part average and Q15's max revenue are 1-row
    # re-aggregations joined back as broadcasts — a driver-side collect
    # would show up as the threshold folded into a literal filter
    for name in ("q11_important_parts", "q15_top_supplier"):
        plan = q(name)
        assert "BroadcastExchange" in plan, f"{name} scalar not broadcast"


def test_q21_top20_is_take_ordered(q):
    plan = q("q21_waiting_suppliers")
    assert "TakeOrderedAndProject" in plan, "q21 top-20 fell back to a global sort"


def test_asof_join_has_no_range_nested_loop(q):
    # j10's merge-asof must be union + window, never an inequality join:
    # no join operator at all should appear between the event sides
    plan = q("j10_asof_last_click")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_range_join_stays_equi(q):
    plan = q("j11_range_follow_events")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_t14_vocabulary_join_is_not_forced_broadcast(spark, sf_dir):
    # the unigram vocabulary is unbounded at corpus scale, so the code
    # must not HINT it broadcast — only the 1-row total may carry an
    # explicit hint. At tiny SF the optimizer auto-broadcasts from size
    # estimates (fine — that flips to SMJ at scale), so the gate builds
    # the plan with auto-broadcast OFF: any surviving BroadcastExchange
    # is then a forced hint.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_text(
            ALL_QUERIES["t14_unigram_logprob"].spark(spark, sf_dir)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import re

    # formatted explain prints every node twice (tree + details): count
    # the detail entries, one per physical node
    n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange", plan))
    assert n_bcast == 1, (
        f"{n_bcast} broadcasts with auto-broadcast off — only the 1-row "
        "total may be hinted; the vocabulary join must shuffle (its "
        "size is unbounded at scale)"
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_t15_cap_is_two_phase_not_global_window(q):
    # cap_per_group's scale contract: rank within (source, _shard)
    # first (bounded partitions), filter to <= cap*shards survivors,
    # THEN the exact per-source re-rank — never one global window over
    # the whole corpus per source. The naive single-window formulation
    # has no _shard spec and no shard-rank filter.
    import re

    plan = q("t15_domain_cap")
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    sharded = [s for s in specs if "_shard" in s]
    exact = [s for s in specs if "_shard" not in s and "source" in s]
    assert sharded, "no (source, _shard) window — phase 1 missing"
    assert exact, "no per-source exact re-rank window — phase 2 missing"
    assert "_sr" in plan, "shard-rank survivor filter missing"


def test_sliced_asof_windows_partition_by_key_and_slice(q):
    # j12's whole point is bounded partition work: the within-slice
    # carry must window over (user_id, _slice), NOT over user_id alone
    # (which would re-create j10's whole-history-per-task sort), and no
    # inequality join may appear anywhere
    plan = q("j12_asof_last_click_sliced")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Union" in plan
    import re
    specs = re.findall(r"partitionBy=\[([^\]]*)\]", plan) + re.findall(
        r"windowspecdefinition\(([^)]*)\)", plan
    )
    sliced = [s for s in specs if "_slice" in s]
    assert sliced, f"no (key, slice) window spec found in plan:\n{plan[:2000]}"
    assert all(
        "user_id" in s for s in sliced
    ), f"slice window not co-keyed with user_id: {sliced}"


def test_q13_zero_bucket_survives(spark, sf_dir):
    # the priority exclusion must live in the join condition; a WHERE
    # would silently drop never-ordered customers from the histogram
    from pokemon_showdown_airflow_etl_spark.plans import ALL_QUERIES

    rows = {
        r["c_count"]: r["custdist"]
        for r in ALL_QUERIES["q13_customer_distribution"].spark(spark, sf_dir).collect()
    }
    assert 0 in rows, "left join lost the zero-order customers"


def test_chunk_windows_is_pure_map(q):
    """t17 must stream at scan speed: one Generate, zero Exchange, no
    Python eval — the chunking pass precedes a 100 TB embedding job."""
    plan = q("t17_chunk_windows")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_cms_estimate_join_broadcasts_the_sketch(q):
    """a2's estimate join must broadcast the constant-size sketch (<=
    depth*width rows) — shuffling candidates against it would key the
    exchange on sketch cells."""
    plan = q("a2_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_join_keys_include_the_salt(q):
    """x2's equi-join must key on (user_id, _salt) — the salt in the
    join key is what spreads a hot user over n_salts reducers."""
    plan = q("x2_salted_join")
    assert "_salt" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_signature_scans_prune_to_consumed_columns(spark, sf_dir):
    """The point of the columnar signature layer: d3 must read ONLY the
    8 MinHash strings (never the shingles array — the wide column), and
    d5 only the fingerprint. Checked with pinning disabled so the scans
    are visible."""
    from pokemon_showdown_airflow_etl_spark import pinning

    with pinning.disabled():
        d3 = plan_text(ALL_QUERIES["d3_minhash_lsh_candidates"].spark(spark, sf_dir))
        d5 = plan_text(ALL_QUERIES["d5_simhash_near_dups"].spark(spark, sf_dir))
    d3_schemas = [l for l in d3.splitlines() if "ReadSchema" in l]
    assert d3_schemas and all("shingles" not in l for l in d3_schemas), d3_schemas
    assert any("mh7" in l for l in d3_schemas), d3_schemas
    d5_schemas = [l for l in d5.splitlines() if "ReadSchema" in l]
    assert d5_schemas and all("simhash" in l and "shingles" not in l for l in d5_schemas), d5_schemas


def test_percentile_operators_default_to_approx_sketch(spark, sf_dir):
    """The r4 verdict's only weak pair: an EXACT percentile buffers the
    whole value set in one aggregation task (fatal at 100 TB). The
    operators must DEFAULT to the approx_percentile mergeable sketch;
    exact=True stays available as the oracle-checkable twin the s6/t5
    catalog entries pin."""
    from pokemon_showdown_airflow_etl_spark.io import table
    from pokemon_showdown_airflow_etl_spark.operators import similarity, text

    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    for plan in (
        plan_text(similarity.centroid_outliers(emb)),
        plan_text(text.corpus_stats(docs)),
    ):
        assert "approx_percentile" in plan or "percentile_approx" in plan, plan
        stripped = plan.replace("approx_percentile", "").replace(
            "percentile_approx", ""
        )
        assert "percentile(" not in stripped, (
            "default path still carries an exact percentile aggregate"
        )
    # the exact twins keep their oracle-checkable formulation
    exact = plan_text(similarity.centroid_outliers(emb, exact=True))
    assert "approx_percentile" not in exact and "percentile(" in exact


def test_scrub_is_pure_map(q):
    """t18: three regexp passes + digest — must stay a single map stage
    (any Exchange here would mean the scrub added a shuffle to what is
    a free rider on the corpus scan at 100 TB)."""
    plan = q("t18_scrub")
    assert "Exchange" not in plan, "scrub pass introduced a shuffle"
    assert "BatchEvalPython" not in plan, "scrub fell back to Python"
    assert "[codegen id" in plan  # the regexp passes stay codegen'd


def test_d9_scans_prune_to_consumed_columns(spark, sf_dir):
    """d9's point at scale: the band join must read ONLY the 8 MinHash
    strings and the verify join ONLY the shingles — a scan carrying
    both would ship the wide shingle arrays through the candidate
    shuffle."""
    from pokemon_showdown_airflow_etl_spark import pinning

    with pinning.disabled():
        plan = plan_text(ALL_QUERIES["d9_incremental_dedup"].spark(spark, sf_dir))
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas
    assert all(not ("mh0" in l and "shingles" in l) for l in schemas), schemas


def test_s11_admission_plan_shape(spark, sf_dir):
    """s11's scale contract: the only nested-loop joins are the
    BROADCAST centroid assignments (constant-size centroid table by
    design), candidate scoring runs as the Arrow cell kernel (one
    FlatMapGroupsInPandas keyed by cell_id — pairs never materialize
    as join rows), and nothing degenerates to a cartesian or
    row-at-a-time Python."""
    import re

    from pokemon_showdown_airflow_etl_spark import pinning

    with pinning.disabled():
        plan = plan_text(ALL_QUERIES["s11_embed_admit_batch"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan, "cell kernel lost its Arrow form"
    # the index side must prune to the probed cells BEFORE the kernel
    # shuffle (broadcast semi-join on the bounded probed-cell list) —
    # without it every unprobed cell's members ride the groupBy as
    # dead weight, which at thousands-of-cells scale is the whole index
    assert "LeftSemi" in plan, "corpus members lost the probed-cell prune"
    # every nested-loop is the broadcast centroid cross join: as many
    # BroadcastExchange details as BroadcastNestedLoopJoin details
    n_nl = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    n_bc = len(re.findall(r"\(\d+\) BroadcastExchange", plan))
    assert n_nl >= 1 and n_bc >= n_nl, (plan.count("BroadcastNestedLoopJoin"), n_bc)


def test_t20_blacklist_join_is_anti_and_jvm(q):
    """t20: the repeated-span blacklist must subtract via LeftAnti (a
    positive join against the KEPT side would carry the whole corpus
    through the join twice) and the whole pass stays JVM-side."""
    plan = q("t20_paragraph_dedup")
    assert "LeftAnti" in plan, "blacklist subtraction lost its anti form"
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan  # no Python at all here


def test_t21_targets_broadcast_and_sharded_selection(q):
    """t21: the per-domain target table (one row per domain) rides a
    broadcast to the corpus; selection is the two-phase sharded top-k
    (a window per (domain, shard) first), never one global window per
    domain over the whole corpus."""
    import re

    plan = q("t21_domain_mixture")
    assert "BroadcastHashJoin" in plan, "targets join lost its broadcast"
    assert "_shard" in plan, "selection lost its shard phase"
    assert "Exchange SinglePartition" not in plan
    # the DETAIL section numbers nodes bottom-up: the first detailed
    # Window must be the sharded phase (the tree section prints the
    # outer re-rank first, so index into details, not the tree)
    detail_windows = [m.start() for m in re.finditer(r"\(\d+\) Window", plan)]
    assert len(detail_windows) == 2, "expected exactly shard + re-rank windows"
    assert "_shard" in plan[detail_windows[0] : detail_windows[0] + 500], (
        "first (inner) window is not the sharded phase"
    )


def test_t22_largest_remainder_window_sees_domains_not_corpus(q):
    # temperature_mixture(exact_budget=True)'s scale contract (VERDICT
    # r7 item 7): the largest-remainder topping runs one UNPARTITIONED
    # rank window, which is only safe because its input is the
    # constant-size domain-count aggregate. Assert it structurally:
    # every single-partition exchange in the plan carries domain-table
    # columns only — never the corpus id — and the remainder window
    # (input holds the _uncapped flag) is similarly corpus-free, while
    # the corpus-side selection windows stay partitioned.
    import re

    plan = q("t22_domain_mixture_exact")
    nodes = re.findall(
        r"\(\d+\) (Exchange|Window)[^\n]*\n((?:[^\n(]+\n)*)", plan
    )
    saw_single, saw_remainder = 0, 0
    for kind, detail in nodes:
        if kind == "Exchange" and "SinglePartition" in detail:
            saw_single += 1
            assert "doc_id" not in detail, (
                "a single-partition exchange carries the corpus:\n" + detail
            )
        if kind == "Window" and "_uncapped" in detail:
            saw_remainder += 1
            assert "doc_id" not in detail, (
                "the largest-remainder window ranks corpus rows:\n" + detail
            )
    assert saw_single, "no single-partition exchange found — plan changed shape"
    assert saw_remainder, "largest-remainder window not found in the plan"


def test_pq_encode_is_pure_map(q):
    # pq_encode's scale contract: the codebook rides as literals, so
    # encoding the corpus is a single map pass — no shuffle, no join,
    # no Python. The naive formulation (join against a codebook table,
    # window-argmin per (vec, subspace)) shuffles the corpus twice.
    plan = q("s14_pq_codes")
    assert "Exchange" not in plan, "PQ encode must not shuffle"
    assert "Join" not in plan, "PQ encode must not join"
    assert "BatchEvalPython" not in plan


def test_vocab_build_window_is_sharded(spark, sf_dir):
    # build_vocab's scale contract (t23): the vocabulary rank runs
    # within md5 shards first (bounded partitions), and only the
    # <= shards x V survivors take the exact global rank — never one
    # global window over millions of distinct tokens. Built with
    # pinning disabled: the production plan pins the vocab subtree,
    # which hides its windows behind an ExistingRDD scan.
    import re

    from pokemon_showdown_airflow_etl_spark import pinning

    with pinning.disabled():
        plan = plan_text(ALL_QUERIES["t23_vocab_encode"].spark(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    sharded = [s for s in specs if "_shard" in s]
    assert sharded, "no sharded vocab window — phase 1 missing"
    assert "_sr" in plan, "shard-rank survivor filter missing"


def test_bpe_encode_stays_jvm_with_bounded_vocab_window(q):
    """t24: the encode must be a JVM map (merge table constant-folded
    into replace chains, no Python in the scoring path) and the only
    window ranks the provably bounded symbol table — never the corpus
    (no rank over an unbounded key domain)."""
    plan = q("t24_bpe_encode")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the symbol-vocab join must broadcast (<= chars + merges rows)
    assert "BroadcastHashJoin" in plan


def test_bigram_logprob_joins_on_natural_key_no_cartesian(q):
    """t25: scoring joins occurrences to the bigram table on (w1, w2) —
    an equi-join; V rides a broadcast scalar; no Python anywhere."""
    plan = q("t25_bigram_logprob")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_hll_is_one_combinable_aggregation(q):
    """a4: each audited column's register build must partial-aggregate
    map-side (HashAggregate before the exchange) and never ship raw
    rows — the mergeable-sketch shape."""
    plan = q("a4_hll_distinct")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_separator_dedup_blacklist_is_equi_join(q):
    """t20b: the blacklist anti/left join must stay an equi-join on the
    span hash — never a cartesian over exploded units."""
    plan = q("t20b_separator_dedup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lake_pq_search_pairs_by_equi_join(q):
    """s20: candidate codes pair with their probing query by an
    equi-join on the query id (broadcast lookup tables) — never
    candidates x all-queries."""
    plan = q("s20_lake_pq_search")
    assert "CartesianProduct" not in plan


def test_audio_kernels_single_crossing_no_fanout_shuffle(q):
    """m5/m5b: one Arrow crossing per asset, and the frame fan-out —
    which happens inside the kernel AFTER the binary column drops —
    must never shuffle: no Exchange is allowed ABOVE the MapInPandas.
    Below it, the only admissible Exchange is pinning.spread's
    scale-adaptive hash spread of the (asset_id, payload) scan — the
    identity at production split counts (test_pinning_spread proves the
    no-op side) — which exists exactly so a small single-split scan
    does not serialize the kernel on one core."""
    import re

    for name in ("m5_audio_frame_energy", "m5b_audio_pcm_energy"):
        plan = q(name)
        # the formatted plan names each node twice (tree + detail
        # section); count detail headers for the true node count
        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, name
        tree_end = plan.index("MapInPandas")
        assert "Exchange" not in plan[:tree_end], (
            f"{name} shuffles its fan-out (Exchange above the kernel)"
        )
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) <= 1, f"{name}: more than the spread exchange"
        if exchanges:
            assert "hashpartitioning(asset_id" in plan, (
                f"{name}: the only allowed exchange is the deterministic "
                "asset_id spread"
            )
        assert "CartesianProduct" not in plan, name


def test_pinning_spread_is_identity_when_already_parallel(spark):
    """pinning.spread must be a plan no-op whenever the input already
    has >= defaultParallelism partitions — the production case (a
    100 TB scan has orders of magnitude more splits than cores), which
    is what keeps 'media bytes never shuffle at scale' true with the
    spread in place."""
    from pokemon_showdown_airflow_etl_spark.pinning import spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000).repartition(target + 4)
    assert spread(wide, "id") is wide
    narrow = spark.range(0, 1000).coalesce(1)
    spread_df = spread(narrow, "id")
    assert spread_df is not narrow
    assert spread_df.rdd.getNumPartitions() == target


def test_lake_sketch_read_is_bounded_merge(q):
    """a6: serving the stored sketch is a <= (64 + k)-row merge — a
    grouped max plus the two-phase bottom-k re-rank; no Python, no
    cartesian, and the only joins/windows run over stored sketch rows,
    never the corpus."""
    plan = q("a6_lake_sketch")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "_sr" in plan, "two-phase shard re-rank missing from KMV merge"


def test_lake_lm_scoring_is_equi_join_on_model_rows(q):
    """t26: scoring under the STORED LM is equi-joins of the occurrence
    stream against the O(types) model table (+ a broadcast V scalar) —
    no Python, no cartesian, and the model marginals reduce from the
    stored rows, never from a corpus re-scan."""
    plan = q("t26_lake_bigram_nll")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_lake_cms_estimates_broadcast_stored_cells(q):
    """a7: the stored <= depth*width cell table BROADCASTS to the
    candidate estimate join — the corpus-side work is only the exact
    audit aggregation; no Python, no cartesian."""
    plan = q("a7_lake_cms_heavy_hitters")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "stored-cell join must broadcast"


def test_opq_lake_search_pairs_by_equi_join(q):
    """s22: same contract as s20 — candidate codes pair with their
    probing query by an equi-join on the query id; the stored
    permutation is applied inside the query kernel, never as a plan
    node over the corpus."""
    plan = q("s22_opq_lake_search")
    assert "CartesianProduct" not in plan


def test_lake_hh_serve_is_stored_rows_only(q):
    """a8: the serving read must touch only the stored candidate and
    cell row sets — broadcast estimate join, bounded rank window, no
    Python, no cartesian. (The documents scan in the plan belongs to
    the demo-lake BUILD path, not the serve; the oracle-side corpus
    replay is DuckDB's.)"""
    plan = q("a8_lake_heavy_hitters")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "stored-cell join must broadcast"


def test_token_budget_mixture_cumsum_is_sharded(q):
    """t27: the corpus-side running total must window over
    (domain, shard) — never a whole-domain sort in one task; the only
    domain-partitioned window allowed is over the constant-size
    shard-totals table."""
    plan = q("t27_token_budget_mixture")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "_shard" in plan, "sharded cumsum missing from the plan"


def test_lake_estats_read_is_bounded_merge(q):
    """a9: serving the stored drift statistics is a dim-row SUM merge
    over the committed facet partitions — no Python, no cartesian, no
    vector column anywhere in the read path."""
    plan = q("a9_lake_embedding_drift")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_lake_bloom_probe_broadcasts_stored_words(q):
    """a10: the stored <= BLOOM_WORDS word table BROADCASTS to the
    probe join — the panel side never shuffles against it; the only
    corpus-side work is the exact top-10 audit leg. No Python, no
    cartesian."""
    plan = q("a10_lake_bloom_decontaminate")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "stored-word join must broadcast"


def test_image_ahash_single_crossing_no_shuffle(q):
    """m6: one Arrow crossing per asset and NO exchange — the hash is
    a pure map, image bytes never shuffle."""
    import re

    plan = q("m6_image_ahash")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Exchange" not in plan


def test_image_near_dups_band_join_is_equi(q):
    """m6b: the pinned hash frame feeds both sides of the band
    blocking, which must stay an equi-join on (band, key) — no
    cartesian, no second Arrow crossing, and the only shuffled rows
    are five narrow hash columns (the binary payload drops inside the
    kernel)."""
    import re

    plan = q("m6b_image_near_dups")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) <= 1, (
        "hash kernel must run once (pinned), not per join side"
    )
    assert (
        "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_scene_segments_is_jvm_windows_single_exchange(q):
    """m7: pure JVM window math — no Python anywhere, and the lag +
    running-sum windows share ONE shuffle on the asset key (same
    partition key, same order — a second exchange would mean the
    two windows didn't align)."""
    import re

    plan = q("m7_scene_segments")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2


def test_image_admission_probes_corpus_by_equi_join(q):
    """m8: one Arrow hash pass (pinned) feeding the corpus probe and
    the within-batch check — both equi-joins on (band, key), never a
    cartesian, never a second kernel crossing."""
    import re

    plan = q("m8_image_admission")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) <= 1


def test_hll_set_ops_union_reads_registers_not_data(q):
    """a12: the pairwise union sketch must come from the two segments'
    64-row register frames (register-max merge), never from a revisit
    of the events data — the plan may scan events only for the sketch
    build and the exact audit (both pinned), and no Python appears."""
    import re

    plan = q("a12_hll_set_ops")
    assert "BatchEvalPython" not in plan
    # pin materializes the register/pair frames, so the only parquet
    # scans left belong to the single exact-audit leg
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 1


def test_scene_frame_hashes_filters_before_one_kernel_crossing(q):
    """m9: no exchange beyond m7's one — the first-frame flag rides
    the same asset-key window, the representative rule is a pure
    filter, and the m6 hash kernel crosses ONCE over the scene
    survivors (frame payloads never materialize per frame, and no
    join carries the hashes back)."""
    import re

    plan = q("m9_scene_frame_hashes")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_lake_segment_overlap_reads_stored_registers_not_text(q):
    """a13: the overlap estimates must come from the STORED hllg facet
    (pinned registers + pinned pair math), never a re-scan of corpus
    text — the only parquet scan left in the final plan belongs to the
    exact-audit leg, and no Python appears."""
    import re

    plan = q("a13_lake_segment_overlap")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 1


def test_scene_clip_dedup_hashes_once_then_equi_joins(q):
    """m9b: the m9 chain (frame fan-out + windows + hash kernel) runs
    ONCE (pinned) — the banded pair scan equi-joins the materialized
    clip hashes, never re-deriving a side and never going cartesian."""
    import re

    plan = q("m9b_scene_clip_dups")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) <= 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0  # pinned
    assert (
        "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_weighted_sample_is_top_k_not_global_sort(q):
    """t30: the weighted race must resolve as per-partition heaps + a
    k-row merge (TakeOrderedAndProject), never a single-partition sort
    of the corpus; the rank window runs over the k survivors only."""
    plan = q("t30_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_residual_ivfpq_two_kernels_equi_join_no_cartesian(q):
    """s24: exactly TWO Arrow kernels — the corpus residual-encode
    pass (pinned, runs once) and the bounded per-(query, cell) LUT
    pass — with candidates meeting members through equi-joins only;
    no cartesian, no row-Python, no single-partition exchange."""
    import re

    plan = q("s24_residual_ivfpq")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_lake_token_quantiles_read_stored_buckets_not_text(q):
    """a14: the quantile serve must come from the STORED hist facet —
    the merged bucket table (pinned) drives the cumulative window and
    the target join, corpus text never rescans, the bounded bucket
    side broadcasts, and no Python appears anywhere."""
    import re

    plan = q("a14_lake_token_quantiles")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    # the only parquet scans are the facet's stored bucket rows
    # (re-read per join leg) — never the documents table
    assert "documents" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # target <= bucket rows
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2


def test_dsir_model_broadcasts_to_scoring_join(q):
    """t31: the <= n_buckets ratio model must BROADCAST to the
    occurrence-stream scoring join — the corpus-sized stream never
    shuffles on the bucket key — and everything stays JVM-side."""
    plan = q("t31_dsir_weights")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_edit_verified_dups_stay_banded_no_cartesian(q):
    """d10: the pair volume must come from the LSH band equi-join
    (reused from the shared signature lake — no shingle recompute),
    never a cartesian; the Levenshtein verify is a JVM expression, no
    Python anywhere."""
    plan = q("d10_edit_verified_dups")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert (
        "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_opq_residual_search_stays_cell_bounded(q):
    """s26: candidates meet their probing query through the
    (cell_id, query_id) equi-joins — the permutation is applied inside
    the per-(query, cell) kernel, never as a plan node over the
    corpus; no cartesian anywhere."""
    plan = q("s26_opq_residual_search")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_leakage_safe_split_is_banded_plus_map(q):
    """t32: the split rides d8's bounded machinery — no cartesian, no
    Python; the split assignment itself is a pure map over the keyed
    rows."""
    plan = q("t32_leakage_safe_split")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_audio_fingerprint_one_kernel_one_exchange(q):
    """m10: one Arrow crossing (the m5 framing kernel), one exchange
    for the bounded per-asset lead window, no row-Python."""
    import re

    plan = q("m10_audio_fingerprint")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_audio_near_dups_band_join_is_equi(q):
    """m10b: the pinned fingerprint frame feeds an equi band join —
    no cartesian, no re-derivation of the kernel chain per side."""
    import re

    plan = q("m10b_audio_near_dups")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 0  # pinned
    assert (
        "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )
