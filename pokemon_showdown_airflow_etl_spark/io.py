"""Table loaders for the driver testdata and the partitioned replay lake.

Testdata (TESTDATA.md): one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``. The replay lake mirrors the
reference's physical layout (constants.py:7-10 —
``replays/{format_id}/{YYYY-MM-DD}/{id}.json``) as a Hive-partitioned
parquet table ``partitionBy(format_id, date)`` so Catalyst prunes on
format/date the way the reference prunes by directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_NANOS_TS_COLS: dict[str, list[str]] = {}


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark refuses them
    natively (PARQUET_TYPE_ILLEGAL), so they are read as nano longs and
    converted. Footer is inspected once per path."""
    if path not in _NANOS_TS_COLS:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        _NANOS_TS_COLS[path] = [
            f.name for f in schema if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NANOS_TS_COLS[path]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table.

    Nanosecond-timestamp columns are converted to TimestampType via
    integer floor-division to microseconds (`div`, not `/` — int64 nanos
    exceed double's 53-bit mantissa), matching DuckDB's nanos->micros
    truncation so oracle comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_ts_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- replay lake ------------------------------------------------------------


def write_replay_lake(
    df: DataFrame, path: str, mode: str = "append", file_format: str = "parquet"
) -> None:
    """K1 sink: partitioned write of replay documents.

    Reference writes one JSON file per replay under
    ``replays/{format}/{date}/`` (tasks/download.py:76-87); at scale one
    file per record is pathological, so the lake is columnar, partitioned
    by the same two keys — identical pruning, ~1000x fewer files.
    Requires ``format`` and ``date`` columns. ``file_format`` may be any
    Spark batch source (parquet default; orc supported out of the box
    for shops standardized on it — same pruning and predicate pushdown).
    """
    df.write.partitionBy("format", "date").mode(mode).format(file_format).save(path)


def read_replay_lake(
    spark: SparkSession, path: str, file_format: str = "parquet"
) -> DataFrame:
    """S3 scan: read the replay lake with partition discovery."""
    return spark.read.format(file_format).load(path)


def export_compacted_json(df: DataFrame, path: str) -> None:
    """Reference-format export: the compacted lake as JSON files under
    ``format=X/date=Y/`` directories — interop with the reference's
    per-day compacted files (tasks/compaction.py:149,219-225). One file
    per (format, date) partition, line-delimited JSON documents."""
    df.repartition("format", "date").write.partitionBy("format", "date").mode(
        "overwrite"
    ).json(path)


def export_reference_day_files(df: DataFrame, path: str) -> None:
    """Reference-EXACT on-disk layout: one JSON *array* file per day at
    ``{path}/{format}/{YYYY-MM-DD}.json`` (tasks/compaction.py:219-225
    writes exactly this; import_existing_replays.py:70-82 re-reads it).

    Scale shape: rows shuffle once on (format, date); each task
    serializes its days and writes the files itself (no driver
    round-trip, no collect). Docs are sorted by id inside each array
    and files land via write-temp-then-rename, so the export is
    deterministic and re-runnable. ``path`` must be a filesystem both
    executors and consumers share — same contract as the reference's
    compacted_replays directory.
    """
    doc_cols = [c for c in df.columns if c != "date"]
    payload = df.select(
        "format",
        "date",
        F.col("id").alias("_sort_id"),
        F.to_json(F.struct(*[F.col(c) for c in doc_cols])).alias("_doc"),
    )

    def write_days(rows) -> None:
        import collections
        import os as _os

        groups = collections.defaultdict(list)
        for r in rows:
            groups[(r["format"], r["date"])].append((r["_sort_id"], r["_doc"]))
        for (fmt, date), docs in groups.items():
            day_dir = _os.path.join(path, fmt)
            _os.makedirs(day_dir, exist_ok=True)
            docs.sort()
            tmp = _os.path.join(day_dir, f".{date}.json.tmp")
            with open(tmp, "w") as f:
                f.write("[" + ",".join(doc for _sid, doc in docs) + "]")
            _os.replace(tmp, _os.path.join(day_dir, f"{date}.json"))

    payload.repartition("format", "date").foreachPartition(write_days)


def read_compacted_json(spark: SparkSession, path: str, multi_line: bool = False) -> DataFrame:
    """S4 scan: read compacted JSON day files. ``multi_line=True`` reads
    the reference's whole-day JSON *array* files
    (tasks/compaction.py:155-163, import_existing_replays.py:70-82);
    False reads line-delimited exports."""
    from .schemas import REPLAY_DOCUMENT

    reader = spark.read.schema(REPLAY_DOCUMENT)
    if multi_line:
        reader = reader.option("multiLine", True)
    return reader.json(path)


def write_metadata(df: DataFrame, path: str) -> None:
    """Persist the replay_status metadata table, partitioned by format_id

    (the reference's most-used index, db.py:73).
    """
    df.write.partitionBy("format_id").mode("overwrite").parquet(path)


def read_metadata(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
