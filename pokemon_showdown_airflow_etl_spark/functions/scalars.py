"""Scalar column expressions C1-C13 (SURVEY.md section 2.7).

Every helper returns a Column built purely from ``pyspark.sql.functions``
so the whole expression stays inside whole-stage codegen — no Python UDFs
in the hot path. Citations are file:line into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C1/C2 — epoch seconds -> calendar date used for partitioning
# (db.py:693-694, tasks/download.py:77-78, fix_compacted_status.py:47).


def epoch_to_date_str(epoch: Column | str) -> Column:
    return F.date_format(F.from_unixtime(F.col(epoch) if isinstance(epoch, str) else epoch), "yyyy-MM-dd")


def epoch_to_date(epoch: Column | str) -> Column:
    return F.to_date(F.from_unixtime(F.col(epoch) if isinstance(epoch, str) else epoch))


# C3 — mutation timestamp (db.py:226 stamps datetime.now().isoformat()).


def now_ts() -> Column:
    return F.current_timestamp()


# C4 — batch-id synthesis `{format}_{yyyyMMdd_HHmmss}` with stage prefixes
# (discovery.py:55,174; retry.py:38; compaction.py:88).


def batch_id(format_id: Column | str, prefix: str = "") -> Column:
    fmt = F.col(format_id) if isinstance(format_id, str) else format_id
    stamp = F.date_format(F.current_timestamp(), "yyyyMMdd_HHmmss")
    base = F.concat_ws("_", fmt, stamp)
    return F.concat(F.lit(prefix), base) if prefix else base


# C5 — battle-log timestamp extraction: `|t:|<epoch>` inside the log text
# (scripts/import_existing_replays.py:46-49).
LOG_TS_PATTERN = r"\|t:\|(\d+)"


def log_timestamp(log: Column | str) -> Column:
    c = F.col(log) if isinstance(log, str) else log
    # try_cast: a log with no |t:| stamp extracts '' — under default
    # ANSI mode a plain cast would fail the job instead of yielding the
    # NULL that the C11 mtime fallback expects to fill.
    return F.regexp_extract(c, LOG_TS_PATTERN, 1).try_cast("long")


# C6 — players display string (import_existing_replays.py:61-64, db.py:877).


def players_vs(players_array: Column | str) -> Column:
    c = F.col(players_array) if isinstance(players_array, str) else players_array
    return F.array_join(c, " vs ")


def players_vs_pair(p1: Column | str, p2: Column | str) -> Column:
    a = F.col(p1) if isinstance(p1, str) else p1
    b = F.col(p2) if isinstance(p2, str) else p2
    return F.concat_ws(" vs ", a, b)


# C7 — recover batch id embedded in a details message (db.py:171-179).
BATCH_IN_DETAILS = r"\(batch ([^)]+)\)"


def batch_from_details(details: Column | str) -> Column:
    c = F.col(details) if isinstance(details, str) else details
    return F.regexp_extract(c, BATCH_IN_DETAILS, 1)


# C8 — failure-prefix convention (db.py:366 writes "Failed: ...",
# db.py:567,648 filter on LIKE 'Failed:%').
FAILED_PREFIX = "Failed: "
ERROR_PREFIX = "ERROR: "


def is_failed(details: Column | str) -> Column:
    c = F.col(details) if isinstance(details, str) else details
    return c.startswith("Failed:")


def failed_details(err: Column | str) -> Column:
    c = F.col(err) if isinstance(err, str) else err
    return F.concat(F.lit(FAILED_PREFIX), c)


# C9 — filename -> replay id (import_existing_replays.py:32-34).


def filename_to_id() -> Column:
    return F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1)


# C13 — three-valued boolean coercion: SQLite treats NULL retry flags as
# not-yet-attempted (db.py:568); Spark needs an explicit coalesce.


def flag_or_false(flag: Column | str) -> Column:
    c = F.col(flag) if isinstance(flag, str) else flag
    return F.coalesce(c, F.lit(False))


def not_retried(is_retry_attempted: Column | str = "is_retry_attempted") -> Column:
    return ~flag_or_false(is_retry_attempted)
