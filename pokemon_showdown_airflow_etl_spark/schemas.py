"""Explicit StructTypes for every data shape the reference touches.

The reference infers schemas dynamically by probing dict keys; at scale
an explicit schema is mandatory (no sampling-inference pass over 100 TB
of JSON) and keeps scans prunable. Citations are file:line into
/root/reference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- the replay document --------------------------------------------------
# Fields the reference reads from one replay JSON
# (scripts/import_existing_replays.py:36-68, tasks/compaction.py:160-162).
# Open-ended extras are kept as a string->string map rather than inferred
# columns (db.py:269-270 keeps them as JSON text in `additional_info`).
REPLAY_DOCUMENT = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("format", StringType()),
        StructField("uploadtime", LongType()),
        StructField("players", ArrayType(StringType())),
        StructField("p1", StringType()),
        StructField("p2", StringType()),
        StructField("log", StringType()),
        StructField("rating", IntegerType()),
        StructField("extras", MapType(StringType(), StringType())),
    ]
)

# --- one row of the paginated search API ----------------------------------
# search.json page rows: id/uploadtime/p1/p2 + open remainder
# (api.py:13-33, db.py:858-879). Pages hold at most 51 rows
# (discovery.py:108).
SEARCH_PAGE_ROW = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("uploadtime", LongType(), nullable=False),
        StructField("p1", StringType()),
        StructField("p2", StringType()),
        StructField("format", StringType()),
        StructField("rating", IntegerType()),
        StructField("extras", MapType(StringType(), StringType())),
    ]
)

PAGE_SIZE = 51  # short page => end of data (discovery.py:108)

# --- the replay_status lifecycle/metadata table ----------------------------
# Column-for-column the SQLite schema at db.py:43-70, with native Spark
# types: ISO-text timestamps become TimestampType, JSON-in-TEXT
# `additional_info` becomes map<string,string>. Partition the physical
# table by format_id — the reference indexes format_id/uploadtime/
# is_downloaded/is_compacted (db.py:73-76); partition pruning plus parquet
# min/max footers subsume all four indexes.
REPLAY_STATUS = StructType(
    [
        StructField("replay_id", StringType(), nullable=False),
        StructField("format_id", StringType(), nullable=False),
        StructField("discovered_at", TimestampType()),
        StructField("discovered_batch", StringType()),
        StructField("is_downloaded", BooleanType()),
        StructField("downloaded_at", TimestampType()),
        StructField("downloaded_batch", StringType()),
        StructField("download_details", StringType()),
        StructField("is_compacted", BooleanType()),
        StructField("compacted_at", TimestampType()),
        StructField("compacted_batch", StringType()),
        StructField("compacted_details", StringType()),
        # NULLable on purpose: the reference relies on three-valued logic
        # here (db.py:568 — `is_retry_attempted = FALSE OR ... IS NULL`).
        StructField("is_retry_attempted", BooleanType()),
        StructField("retry_at", TimestampType()),
        StructField("retry_batch", StringType()),
        StructField("retry_details", StringType()),
        StructField("uploadtime", LongType(), nullable=False),
        StructField("players", StringType()),
        StructField("additional_info", MapType(StringType(), StringType())),
    ]
)

# --- cursor / watermark state ----------------------------------------------
# state.py:31-36 — one row per format: high watermark (incremental runs),
# low watermark (backfill), last processed id.
FORMAT_STATE = StructType(
    [
        StructField("format_id", StringType(), nullable=False),
        StructField("last_seen_ts", LongType()),
        StructField("oldest_ts", LongType()),
        StructField("last_processed_id", StringType()),
    ]
)

# --- multimodal asset columns ----------------------------------------------
# North-star surface (SURVEY.md section 2.11): opaque binary payload plus
# typed metadata, the lake-friendly layout for image/audio/video corpora.
MULTIMODAL_ASSET = StructType(
    [
        StructField("asset_id", StringType(), nullable=False),
        StructField("modality", StringType()),  # image | audio | video | text
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("extras", MapType(StringType(), StringType())),
    ]
)
