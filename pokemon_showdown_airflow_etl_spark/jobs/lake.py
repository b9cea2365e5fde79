"""Physical layout of the replay lake + the metadata store.

The reference persists three things (constants.py:7-10, db.py:43-70,
state.py:13-49): loose per-replay JSON files under
``replays/{format}/{date}/``, per-day compacted JSON arrays under
``compacted_replays/{format}/``, and a SQLite ``replay_status`` table.
Here all three become partitioned parquet tables under one lake root:

    {root}/replays/    partitioned by (format, date)   -- raw documents
    {root}/compacted/  partitioned by (format, date)   -- compacted documents
    {root}/metadata/   partitioned by (format_id)      -- replay_status
    {root}/state/{format_id}_state.json                -- cursor checkpoint

Partitioning IS the reference's directory scheme, so Catalyst partition
pruning replaces both the directory walks and the SQLite secondary
indexes (db.py:73-76). At 100 TB each (format, date) partition is a
handful of parquet files, and every job below touches only the
partitions it names — no full-table rewrite anywhere.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_patch, upsert
from ..schemas import FORMAT_STATE, REPLAY_STATUS


@dataclass(frozen=True)
class ReplayLake:
    root: str

    @property
    def replays_path(self) -> str:
        return os.path.join(self.root, "replays")

    @property
    def compacted_path(self) -> str:
        return os.path.join(self.root, "compacted")

    @property
    def metadata_path(self) -> str:
        return os.path.join(self.root, "metadata")

    @property
    def state_dir(self) -> str:
        return os.path.join(self.root, "state")


def _dynamic_overwrite(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Overwrite only the partitions present in ``df`` (the moral
    equivalent of the reference's per-day file rewrite at
    compaction.py:219-225, and of Delta MERGE file pruning)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # localCheckpoint materializes rows read from `path` before the
        # overwrite clobbers their source files.
        df.localCheckpoint(eager=True).write.partitionBy(*partition_cols).mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


class MetadataStore:
    """The ``replay_status`` table (db.py:43-70) over partitioned parquet.

    Writes are MERGE-shaped and touch only the ``format_id`` partitions
    present in the update — insert_new is the one-transaction
    existence-check+insert of db.py:832-928, patch is the in-place
    stage-flag UPDATE of db.py:736-830.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        # an empty directory is not a table (parquet cannot infer a schema
        # from zero files)
        return os.path.exists(self.path) and any(os.scandir(self.path))

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], REPLAY_STATUS)
        return self.spark.read.parquet(self.path)

    def read_format(self, format_id: str) -> DataFrame:
        # partition-pruned scan: only {path}/format_id=X is read
        return self.read().filter(F.col("format_id") == format_id)

    def insert_new(self, rows: DataFrame) -> int:
        """J2 idempotent ingest (db.py:853-912): left-anti vs existing
        keys, then append. Returns the number of genuinely new rows."""
        rows = rows.select(*[f.name for f in REPLAY_STATUS.fields])
        if not self.exists():
            new = rows.localCheckpoint(eager=True)
            n = new.count()
            if n:
                new.write.partitionBy("format_id").mode("overwrite").parquet(self.path)
            return n
        existing_keys = self.read().select("replay_id", "format_id")
        new = rows.join(existing_keys, ["replay_id", "format_id"], "left_anti")
        new = new.localCheckpoint(eager=True)
        n = new.count()
        if n:
            new.write.partitionBy("format_id").mode("append").parquet(self.path)
        return n

    def patch(self, patch: DataFrame, format_id: str) -> None:
        """Column-level MERGE WHEN MATCHED UPDATE for one format
        partition. ``patch`` carries replay_id + the columns to set."""
        if not self.exists():
            return
        current = self.read_format(format_id)
        merged = merge_patch(current, patch.drop("format_id"), ["replay_id"])
        merged = merged.withColumn("format_id", F.lit(format_id))
        _dynamic_overwrite(merged, self.path, ["format_id"])

    def upsert_rows(self, rows: DataFrame) -> None:
        """Full-row INSERT OR REPLACE (db.py:230-236), partition-scoped."""
        if not self.exists():
            rows.select(*[f.name for f in REPLAY_STATUS.fields]).write.partitionBy(
                "format_id"
            ).mode("overwrite").parquet(self.path)
            return
        touched = [r[0] for r in rows.select("format_id").distinct().collect()]
        current = self.read().filter(F.col("format_id").isin(touched))
        merged = upsert(current, rows, ["replay_id", "format_id"])
        _dynamic_overwrite(merged, self.path, ["format_id"])


def register_lake_views(spark: SparkSession, lake: ReplayLake) -> list[str]:
    """Expose the lake as SQL views — the reference's query surface IS
    SQL (hand-written strings against SQLite, db.py throughout), so the
    engine offers the same: ``replay_status``, ``replays`` and
    ``compacted_replays`` become temp views and every db.py query runs
    as ``spark.sql(...)`` with partition pruning intact."""
    import os

    registered = []
    MetadataStore(spark, lake.metadata_path).read().createOrReplaceTempView(
        "replay_status"
    )
    registered.append("replay_status")
    for name, path in (
        ("replays", lake.replays_path),
        ("compacted_replays", lake.compacted_path),
    ):
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
            registered.append(name)
    return registered


# --- K4: cursor/state checkpoint (state.py:13-49) ---------------------------


def save_state(lake: ReplayLake, format_id: str, **fields) -> None:
    os.makedirs(lake.state_dir, exist_ok=True)
    path = os.path.join(lake.state_dir, f"{format_id}_state.json")
    state = load_state(lake, format_id)
    state.update(fields)
    state["format_id"] = format_id
    with open(path, "w") as f:
        json.dump(state, f)


def load_state(lake: ReplayLake, format_id: str) -> dict:
    path = os.path.join(lake.state_dir, f"{format_id}_state.json")
    if not os.path.exists(path):
        return {"format_id": format_id, "last_seen_ts": None, "oldest_ts": None,
                "last_processed_id": None}
    with open(path) as f:
        return json.load(f)


def state_df(spark: SparkSession, lake: ReplayLake, format_id: str) -> DataFrame:
    """The state checkpoint as a single-row DataFrame (FORMAT_STATE)."""
    s = load_state(lake, format_id)
    row = tuple(s.get(f.name) for f in FORMAT_STATE.fields)
    return spark.createDataFrame([row], FORMAT_STATE)
