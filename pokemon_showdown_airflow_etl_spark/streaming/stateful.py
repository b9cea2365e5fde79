"""Custom stateful streaming operator via ``applyInPandasWithState``:
the per-format discovery cursor as managed stream state.

The reference persists per-format cursor state in a JSON file —
``last_seen_ts`` high watermark plus counters (state.py:13-49, derived
from the DB at db.py:577-627). Streamified, that is *keyed state*: one
state row per format, updated by every micro-batch of landed replay
documents, emitting a cursor-advance record per (format, batch). The
state store checkpoints it, so a restarted query resumes with the
cursor intact — the exact property the reference gets from re-deriving
MAX(uploadtime) on every run.

This is the applyInPandasWithState shape for any custom stateful
operator the built-in windows can't express (session-less running
aggregates, cross-batch counters, cursor tracking): grouped Arrow
batches in, arbitrary pandas out, explicit typed state in between.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CURSOR_OUTPUT_SCHEMA = (
    "format string, last_seen_ts long, total_replays long, batch_replays long"
)
CURSOR_STATE_SCHEMA = "last_seen_ts long, total_replays long"


def _update_cursor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (last_seen, total) = state.get if state.exists else (0, 0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        if len(pdf):
            last_seen = max(last_seen, int(pdf["uploadtime"].max()))
    total += batch_rows
    state.update((last_seen, total))
    yield pd.DataFrame(
        [
            {
                "format": key[0],
                "last_seen_ts": last_seen,
                "total_replays": total,
                "batch_replays": batch_rows,
            }
        ]
    )


def track_format_cursors(docs: DataFrame) -> DataFrame:
    """One cursor-advance record per (format, micro-batch): the running
    high watermark and total replay count held in keyed state."""
    return docs.groupBy("format").applyInPandasWithState(
        _update_cursor,
        outputStructType=CURSOR_OUTPUT_SCHEMA,
        stateStructType=CURSOR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_cursor_tracking(
    docs: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Sink the cursor-advance stream to parquet (K4's state file as an
    auditable append log instead of an overwritten JSON blob)."""
    writer = (
        track_format_cursors(docs)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
