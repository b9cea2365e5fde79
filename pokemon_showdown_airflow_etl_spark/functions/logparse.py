"""Battle-log protocol parsing — the analysis layer the replay data exists for.

A replay ``log`` is one big string of newline-separated protocol lines,
each shaped ``|command|arg1|arg2|...`` with embedded event timestamps
``|t:|<epoch>`` (reference only consumes the timestamp today —
scripts/import_existing_replays.py:46-49 — but the whole layer is
table-generating: log -> rows). Pure built-in expressions: split +
explode + element_at, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_log_lines(df: DataFrame, log_col: str = "log", id_col: str = "id") -> DataFrame:
    """UDTF-shaped: one row per protocol line, with line number."""
    lines = F.split(F.col(log_col), "\n")
    exploded = df.select(
        F.col(id_col).alias("replay_id"),
        F.posexplode(lines).alias("line_no", "line"),
    )
    return exploded.filter(F.col("line") != "")


def parse_protocol_lines(lines_df: DataFrame) -> DataFrame:
    """Parse ``|command|args...`` into (command, args array).

    Lines start with '|', so element 0 of the split is empty: command is
    element 1, args are the remainder.
    """
    parts = F.split(F.col("line"), r"\|")
    return lines_df.select(
        "replay_id",
        "line_no",
        F.element_at(parts, 2).alias("command"),
        F.slice(parts, 3, 2147483647 - 3).alias("args"),
    )


def battle_events(df: DataFrame, log_col: str = "log", id_col: str = "id") -> DataFrame:
    """Full pipeline: replay docs -> typed battle event rows.

    Event time comes from the most recent ``|t:|<epoch>`` line at or
    before each event (a running last_value window per replay).
    """
    from pyspark.sql import Window

    parsed = parse_protocol_lines(explode_log_lines(df, log_col, id_col))
    w = (
        Window.partitionBy("replay_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts = F.when(F.col("command") == "t:", F.element_at("args", 1).cast("long"))
    return parsed.withColumn("event_ts", F.last(ts, ignorenulls=True).over(w))
