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

``lines`` is written clustered by replay_id (hash repartition + sort
within partitions on (replay_id, line_no)), so per-replay windows and
aggregates read co-located, pre-sorted runs; at cluster scale the same
layout comes from partitioning by (format, upload_date) and bucketing
by replay_id.

The build is idempotent and atomic: it writes to a temp directory and
renames into place, keyed by (layout VERSION, sf-dir basename) — bump
VERSION whenever the corpus formula or table layout changes so stale
caches can never serve. Tests point the cache root elsewhere via
$SPARK_GRAFT_LAKE_DIR.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION = 2
_LINE_BUCKETS = 32


def cache_root() -> Path:
    env = os.environ.get("SPARK_GRAFT_LAKE_DIR")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "spark-warehouse" / "battlelog_lake"


def lake_dir(sf_dir: str) -> Path:
    base = Path(sf_dir).name or "sf"
    return cache_root() / f"v{VERSION}-{base}"


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

    first_log_ts = event_ts of the earliest ``|t:|`` line (min_by on
    line_no), which equals C5's first-regex-match for any log whose
    first stamp parses — battle_events stamps a valid ``|t:|`` line
    with its own value.
    """
    from ..functions.logparse import battle_events
    from ..plans.battlelog import corpus

    docs = corpus(spark, sf_dir)
    lines = battle_events(docs)
    (
        lines.repartition(_LINE_BUCKETS, "replay_id")
        .sortWithinPartitions("replay_id", "line_no")
        .write.mode("overwrite")
        .parquet(str(out_dir / "lines"))
    )
    lines_back = spark.read.parquet(str(out_dir / "lines"))
    is_stamp = F.col("command") == "t:"
    log_agg = lines_back.groupBy("replay_id").agg(
        F.min_by(
            F.when(is_stamp, F.col("event_ts")), F.when(is_stamp, F.col("line_no"))
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
    """Build the lake for ``sf_dir`` if absent; return its directory.

    Concurrent builders race benignly: each writes its own temp dir and
    the losing rename finds the winner's output already in place.
    """
    out = lake_dir(sf_dir)
    if (out / "_SUCCESS").exists():
        return out
    tmp = out.parent / f".tmp-{os.getpid()}-{int(time.time() * 1000)}"
    tmp.parent.mkdir(parents=True, exist_ok=True)
    try:
        build_battlelog_lake(spark, sf_dir, tmp)
        (tmp / "_SUCCESS").touch()
        try:
            tmp.rename(out)
        except OSError:
            if not (out / "_SUCCESS").exists():
                raise
    finally:
        if tmp.exists():
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def battlelog_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(docs, lines) DataFrames of the materialized layer, building it
    on first use."""
    out = ensure_battlelog_lake(spark, sf_dir)
    return (
        spark.read.parquet(str(out / "docs")),
        spark.read.parquet(str(out / "lines")),
    )
