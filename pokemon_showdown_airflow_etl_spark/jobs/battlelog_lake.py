"""Materialized battle-log analysis layer — parse the replay corpus
ONCE into columnar lake tables and let every b-query read those.

This is the analysis-layer analogue of the reference's compaction step
(tasks/compaction.py:149-225 turns per-replay JSON files into compacted
day files so downstream readers stop paying per-document open costs):
at 100 TB the raw ``log`` text column dominates storage, and every
analytics query that re-splits it repays the full parse. The lake
holds two tables:

- ``docs``: one row per replay — replay_id, format, uploadtime, p1,
  p2, first_log_ts (C5's "first |t:| stamp"), n_lines. The dimension
  side of b3/b5/b8.
- ``lines``: one row per parsed protocol line — replay_id, line_no,
  command, args, event_ts (the running last-|t:|-at-or-before fill
  from functions/logparse.battle_events). The fact side of
  b1/b2/b4/b6/b7 and b8's win extraction.

``lines`` is a genuine BUCKETED TABLE: written through
``bucketBy(32, replay_id).sortBy(replay_id, line_no)`` (one file per
bucket — the pre-write repartition uses the same murmur3 hash, so each
task owns exactly one bucket) and read back registered with the same
``CLUSTERED BY / SORTED BY`` metadata. The scan then REPORTS the
hash-distribution and sort order to the planner, so every per-replay
groupBy/window in the b-queries and b8's docs-lines equi-join run with
NO exchange and NO re-sort over the fact table — the shuffle the
plain-parquet layout still paid on every query. This is the
cluster-scale layout for real (plus partitioning by (format,
upload_date) when multiple formats land).

The build is idempotent and atomic via the shared lake-cache machinery
(jobs/_lake.py): temp dir + rename, keyed by (layout VERSION, sf-dir
basename, resolved-path hash, parse-formula source hash) — a formula
edit invalidates automatically; bump VERSION for layout changes. Tests
point the cache root elsewhere via $SPARK_GRAFT_LAKE_DIR.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._lake import ensure_lake, formula_tag, keyed_dir

VERSION = 3  # v3: lines files carry bucket ids (bucketBy writer)
_LINE_BUCKETS = 32


def _tag() -> str:
    from ..functions import logparse
    from ..plans import battlelog

    return formula_tag(
        battlelog.corpus,
        logparse.battle_events,
        logparse.explode_log_lines,
        logparse.parse_protocol_lines,
    )


def lake_dir(sf_dir: str) -> Path:
    """Cache key = (layout VERSION, basename, hash of the RESOLVED
    path, hash of the parse-formula SOURCE): two datasets sharing a
    basename (/a/sf0.1 vs /b/sf0.1) can never serve each other's lake,
    and an edit to the corpus/parse formulas invalidates the cache
    without a manual VERSION bump (VERSION covers layout changes).
    Under a shared $SPARK_GRAFT_LAKE_DIR root each layer gets its own
    subdirectory (jobs/_lake.py)."""
    return keyed_dir("battlelog_lake", VERSION, sf_dir, _tag())


def build_battlelog_lake(spark: SparkSession, sf_dir: str, out_dir: Path) -> None:
    """Parse the corpus and write docs + lines under ``out_dir`` (direct
    write, no atomicity — callers wanting idempotence use ``ensure``).

    The log column is parsed exactly ONCE: ``lines`` is written first,
    then ``docs``' log-derived columns (first_log_ts, n_lines) are
    AGGREGATED FROM THE WRITTEN LINES — a columnar read-back — joined to
    the log-free dimension projection (which Catalyst prunes down to
    the cheap columns). The previous formulation recomputed
    log_timestamp + line counts from the raw log, paying the full
    parse twice (measured ~40% of a 14 s build at sf0.1).

    first_log_ts = the self-parsed epoch of the earliest ``|t:|`` line
    whose own argument parses (min_by on line_no over valid stamps
    only) — exactly C5's first-regex-match semantics, including logs
    whose leading stamp line is malformed.
    """
    from ..functions.logparse import battle_events
    from ..plans.battlelog import corpus

    docs = corpus(spark, sf_dir)
    # ONE exchange, of the COMPACT docs (guide §3: explode after the
    # shuffle, never before): hashing on id — the bucket key, same
    # murmur3 % 32 as the bucket spec — means the explode, the
    # event-time window (alias-aware: replay_id IS id) and the
    # bucketed write all run fan-out-wide with the bucket partitioning
    # already in place. The previous shape parsed the whole corpus in
    # the scan's single input split and shuffled the EXPLODED lines
    # twice (window exchange + bucket repartition) — ~20x the bytes.
    lines = battle_events(docs.repartition(_LINE_BUCKETS, "id"))
    # bucketBy requires saveAsTable: write through a scratch EXTERNAL
    # table (files land under out_dir, carrying bucket ids in their
    # names), then drop the catalog entry — the files, names included,
    # are what the reader re-registers against. Each task holds
    # exactly one bucket -> one file per bucket, which is what lets
    # the scan also report the sortBy order.
    scratch = f"battlelog_lines_build_{os.getpid()}_{int(time.time() * 1000)}"
    (
        lines.write.bucketBy(_LINE_BUCKETS, "replay_id")
        .sortBy("replay_id", "line_no")
        .option("path", str(out_dir / "lines"))
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(scratch)
    )
    spark.sql(f"DROP TABLE IF EXISTS {scratch}")
    lines_back = spark.read.parquet(str(out_dir / "lines"))
    # first_log_ts must match C5 (LOG_TS_PATTERN = first |t:|<digits>
    # match in the raw log): self-parse each stamp line's own argument
    # (leading digits, like the regex capture) and take the earliest
    # line where that parse SUCCEEDS. Using the carried event_ts and a
    # bare command=='t:' guard diverged on logs whose FIRST stamp line
    # is malformed — event_ts there is NULL or carried from nowhere,
    # while C5 skips ahead to the first stamp that parses (ADVICE r4).
    is_stamp = F.col("command") == "t:"
    own_stamp = F.when(
        is_stamp,
        F.regexp_extract(
            F.try_element_at("args", F.lit(1)), r"^(\d+)", 1
        ).try_cast("long"),
    )
    log_agg = lines_back.groupBy("replay_id").agg(
        F.min_by(
            own_stamp, F.when(own_stamp.isNotNull(), F.col("line_no"))
        ).alias("first_log_ts"),
        F.count("*").cast("int").alias("n_lines"),
    )
    (
        docs.select(
            F.col("id").alias("replay_id"), "format", "uploadtime", "p1", "p2"
        )
        .join(log_agg, "replay_id", "left")
        .select(
            "replay_id",
            "format",
            "uploadtime",
            "p1",
            "p2",
            "first_log_ts",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
        .write.mode("overwrite")
        .parquet(str(out_dir / "docs"))
    )


def ensure_battlelog_lake(spark: SparkSession, sf_dir: str) -> Path:
    """Build the lake for ``sf_dir`` if absent (atomic, race-benign,
    self-repairing — see jobs/_lake.py)."""
    return ensure_lake(
        lake_dir(sf_dir), lambda tmp: build_battlelog_lake(spark, sf_dir, tmp)
    )


def _register_lines_table(spark: SparkSession, lines_dir: Path) -> DataFrame:
    """Expose ``lines_dir`` as an external bucketed table so the scan
    carries the CLUSTERED BY / SORTED BY metadata the files were
    written with. The name is keyed by the directory (tests rotate
    $SPARK_GRAFT_LAKE_DIR under one session), and re-registration only
    happens when the location moved."""
    import hashlib

    loc = str(lines_dir.resolve())
    name = f"battlelog_lines_{hashlib.md5(loc.encode()).hexdigest()[:12]}"
    if spark.catalog.tableExists(name):
        # the path may have been deleted and rebuilt (bench does this):
        # drop any cached file listing before serving the relation
        spark.catalog.refreshTable(name)
    else:
        schema_ddl = spark.read.parquet(loc).schema.toDDL()
        spark.sql(
            f"""
            CREATE TABLE {name} ({schema_ddl})
            USING PARQUET
            CLUSTERED BY (replay_id) SORTED BY (replay_id, line_no)
            INTO {_LINE_BUCKETS} BUCKETS
            LOCATION '{loc}'
            """
        )
    return spark.table(name)


def battlelog_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(docs, lines) DataFrames of the materialized layer, building it
    on first use. ``lines`` comes back as the registered bucketed
    table, so per-replay plans skip the exchange."""
    out = ensure_battlelog_lake(spark, sf_dir)
    return (
        spark.read.parquet(str(out / "docs")),
        _register_lines_table(spark, out / "lines"),
    )


# ---------------------------------------------------------------------------
# Incremental analysis layer over the LIVE replay lake
# ---------------------------------------------------------------------------
#
# The functions above materialize the SYNTHETIC bench corpus once per
# sf-dir. A user of the reference has a real lake (jobs/lake.ReplayLake)
# fed by the daily pipeline; this is the same analysis layer over that
# lake's COMPACTED side (the reference's per-day files,
# tasks/compaction.py:219-225), refreshed INCREMENTALLY: only (format,
# date) partitions whose document count changed since the last refresh
# are re-parsed and dynamically overwritten — the analytics analogue of
# compact()'s anti-join + dynamic-partition-overwrite contract. At 100
# TB this is the difference between a daily refresh costing one day's
# parse and costing the whole corpus's.


def analysis_paths(lake) -> dict[str, str]:
    root = os.path.join(lake.root, "analysis")
    return {
        "lines": os.path.join(root, "battle_lines"),
        "docs": os.path.join(root, "battle_docs"),
        "manifest": os.path.join(root, "manifest"),
    }


def refresh_battlelog_layer(spark: SparkSession, lake) -> dict:
    """Parse new/changed (format, date) partitions of the compacted lake
    into the battle-log analysis tables. Idempotent: a second refresh
    with an unchanged lake rewrites nothing. Returns counts.

    Change detection is the per-partition document count (a
    footer-only aggregate — no data columns are read): the compacted
    lake only ever GAINS documents per day (compact() skips
    already-compacted ids), so a count change is exactly "this day has
    new replays". Changed days re-parse whole — same day-granularity
    rewrite as compaction itself — and land via dynamic partition
    overwrite, so concurrent readers never see a half-written day.
    """
    from pyspark.sql.utils import AnalysisException

    from ..functions.logparse import battle_events
    from ..functions.scalars import log_timestamp
    from .lake import _dynamic_overwrite

    paths = analysis_paths(lake)
    try:
        src = spark.read.parquet(lake.compacted_path)
    except AnalysisException:
        return {"partitions_refreshed": 0, "docs_parsed": 0, "skipped": True}
    src_counts = src.groupBy("format", "date").agg(F.count("*").alias("n_src"))

    try:
        manifest = spark.read.parquet(paths["manifest"])
    except AnalysisException:
        manifest = None
    if manifest is not None:
        todo = (
            src_counts.join(manifest, ["format", "date"], "left")
            .filter(
                F.col("n_docs").isNull() | (F.col("n_docs") != F.col("n_src"))
            )
            .select("format", "date", "n_src")
        )
    else:
        todo = src_counts
    days = [
        (r["format"], r["date"], r["n_src"]) for r in todo.collect()
    ]  # O(changed days) driver list, like compact()'s touched-days probe
    if not days:
        return {"partitions_refreshed": 0, "docs_parsed": 0}

    day_df = spark.createDataFrame(
        [(f, d) for f, d, _ in days], "format string, date string"
    )
    docs_todo = src.join(F.broadcast(day_df), ["format", "date"], "left_semi")
    docs_todo = docs_todo.localCheckpoint(eager=True)  # one parse feeds both tables

    lines = battle_events(docs_todo, keep=("format", "date")).select(
        "replay_id", "line_no", "command", "args", "event_ts", "format", "date"
    )
    _dynamic_overwrite(lines, paths["lines"], ["format", "date"])

    docs_rows = docs_todo.select(
        F.col("id").alias("replay_id"),
        "uploadtime",
        "p1",
        "p2",
        log_timestamp("log").alias("first_log_ts"),
        F.size(F.filter(F.split("log", "\n"), lambda s: s != "")).alias("n_lines"),
        "format",
        "date",
    )
    _dynamic_overwrite(docs_rows, paths["docs"], ["format", "date"])

    # manifest rewrite: the full per-partition count table (tiny — one
    # row per (format, day)); written last so a crashed refresh just
    # re-parses its days next time
    src_counts.withColumnRenamed("n_src", "n_docs").coalesce(1).write.mode(
        "overwrite"
    ).parquet(paths["manifest"])

    return {
        "partitions_refreshed": len(days),
        "docs_parsed": int(sum(n for _, _, n in days)),
    }
