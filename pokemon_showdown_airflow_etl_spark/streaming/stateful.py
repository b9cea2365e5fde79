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
from pyspark.sql import functions as F
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


# ---------------------------------------------------------------------------
# Trending terms: bounded-state heavy hitters over a token stream
# ---------------------------------------------------------------------------

TREND_OUTPUT_SCHEMA = "shard int, token string, lb long, shard_tokens long"
TREND_STATE_SCHEMA = "keys array<string>, counts array<long>, total long"


def _update_trends(m: int, emit_top: int):
    from ..operators.sketches import mg_merge

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, total = state.get
            counters = pd.Series(list(counts), index=list(keys), dtype="float64")
        else:
            counters, total = None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            total += len(pdf)
            counters = mg_merge(counters, pdf["token"].value_counts(), m)
        if counters is None:
            return
        state.update(
            (
                [str(k) for k in counters.index],
                [int(c) for c in counters.values],
                int(total),
            )
        )
        top = sorted(
            counters.items(), key=lambda kv: (-kv[1], kv[0])
        )[:emit_top]
        yield pd.DataFrame(
            [
                {
                    "shard": int(key[0]),
                    "token": t,
                    "lb": int(c),
                    "shard_tokens": int(total),
                }
                for t, c in top
            ]
        )

    return update


def track_trending_terms(
    tokens: DataFrame, n_shards: int = 8, m: int = 64, emit_top: int = 8
) -> DataFrame:
    """Streaming heavy hitters — "what's trending in the crawl right
    now" over an unbounded token stream, the streaming twin of the
    batch Misra-Gries + CMS path (operators/sketches.py, catalog a3).

    Tokens shard by hash so state parallelizes across executors like
    any keyed stream; each shard holds ONE Misra-Gries summary of at
    most ``m`` counters in the state store — total state is
    O(n_shards * m) FOREVER, however long the stream runs (the property
    a groupBy(token).count() stream lacks: its state grows with the
    open-ended token vocabulary). Every micro-batch each shard merges
    its batch counts into the summary (the same ``mg_merge`` reduction
    the batch operator uses) and emits its current top ``emit_top`` as
    (token, lb, shard_tokens); the MG floor guarantees any token with
    shard frequency > shard_tokens/(m+1) is present. A reader unions
    the latest emission per shard for the global trending view.

    ``tokens`` needs a ``token`` string column (pre-exploded).
    """
    sharded = tokens.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _update_trends(m, emit_top),
        outputStructType=TREND_OUTPUT_SCHEMA,
        stateStructType=TREND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_trending_terms(
    tokens: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    n_shards: int = 8,
    m: int = 64,
    emit_top: int = 8,
    available_now: bool = True,
):
    """Sink the per-batch trending emissions to parquet (an auditable
    append log; the latest rows per shard are the live view)."""
    writer = (
        track_trending_terms(tokens, n_shards=n_shards, m=m, emit_top=emit_top)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
