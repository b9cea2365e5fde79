"""Streaming battle-log analytics: the b-layer over a replay stream.

Each replay document carries its whole ``log`` in one column, so the
protocol explode + parse is a stateless row-local transform — legal in
Structured Streaming — and the only stateful operator is a watermarked
tumbling event-time window. This is the analytics twin of the batch
``plans/battlelog.py`` queries (b4 move usage), fed by the same
file-stream source the ingest uses (``stream_replay_docs``), mirroring
the reference's day-bucketed compaction cadence (db.py:690-700) at the
analysis layer instead of the storage layer.

Scale notes: the explode fans out ~x40 per document BEFORE the shuffle,
but the groupBy keys (day, pokemon, move) are low-cardinality, so
map-side partial aggregation collapses the fan-out before the exchange;
state is bounded by (windows in the lateness horizon) x (move mix), not
by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.logparse import command_lines
from .ingest import with_late_data_bounds


def stream_move_usage(docs: DataFrame, lateness: str = "2 days") -> DataFrame:
    """Tumbling 1-day move-usage counts over streamed replay docs.

    ``docs`` is ``stream_replay_docs(...)`` output (has ``event_time``).
    Emits one finalized row per (day, pokemon, move) once the watermark
    passes the window — the streaming twin of b4_move_usage.
    """
    moves = command_lines(
        with_late_data_bounds(docs, lateness), "move", keep=("event_time",)
    )
    return (
        moves.groupBy(
            F.window("event_time", "1 day").alias("day"),
            F.regexp_extract(
                F.try_element_at("args", F.lit(1)), r": (.*)$", 1
            ).alias("pokemon"),
            F.try_element_at("args", F.lit(2)).alias("move"),
        )
        .agg(F.count("*").cast("long").alias("n_uses"))
        .select(
            F.col("day.start").cast("date").alias("date"),
            "pokemon",
            "move",
            "n_uses",
        )
    )


def start_move_usage_rollup(
    docs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    lateness: str = "2 days",
    available_now: bool = True,
) -> StreamingQuery:
    """Append-mode sink: a (day, pokemon, move) row lands exactly once,
    when its day falls behind the watermark (finalized days only)."""
    rolled = stream_move_usage(docs, lateness)
    writer = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_player_sessions(docs: DataFrame, gap: str = "2 hours", lateness: str = "1 day") -> DataFrame:
    """Per-player activity sessions over streamed replay docs: both
    players of every replay, sessionized by upload event-time with a
    ``gap`` inactivity timeout — the streaming twin of the batch
    session-window query (w5), using the SAME native
    ``session_window`` operator so batch and stream share one
    sessionization semantics.

    State is one open session per (player, window) in the lateness
    horizon — Spark's session operator merges windows as events
    arrive; a session finalizes (emits exactly once, append mode)
    when the watermark passes its gap-extended end. State is bounded
    by active players x lateness, never by stream length.
    """
    players = with_late_data_bounds(docs, lateness).select(
        "event_time",
        F.explode(F.array("p1", "p2")).alias("player"),
    )
    return (
        players.groupBy(F.session_window("event_time", gap).alias("w"), "player")
        .agg(F.count("*").cast("long").alias("n_battles"))
        .select(
            "player",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_battles",
        )
    )


def start_session_rollup(
    docs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    gap: str = "2 hours",
    lateness: str = "1 day",
    available_now: bool = True,
) -> StreamingQuery:
    """Append-mode sink for finalized player sessions: each session
    lands exactly once, when the watermark passes its gap-extended
    end."""
    sessions = stream_player_sessions(docs, gap, lateness)
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
