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


# ---------------------------------------------------------------------------
# Scene segmentation: per-asset change-point state over a frame stream
# ---------------------------------------------------------------------------

SCENE_OUTPUT_SCHEMA = (
    "asset_id string, frame_ms long, luma int, is_cut boolean, scene_id long"
)
# last_ms/last_luma use -1 as "no previous frame" (luma is 0..255, ms
# is >= 0, so the sentinels are unambiguous)
SCENE_STATE_SCHEMA = "last_ms long, last_luma long, scenes long"


def _update_scenes(threshold: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        last_ms, last_luma, scenes = (
            state.get if state.exists else (-1, -1, 0)
        )
        frames = pd.concat(list(pdfs), ignore_index=True)
        # replays of already-processed offsets (an at-least-once
        # source re-delivering a file) are dropped, so the append sink
        # stays exactly-once per frame; genuinely late NEW frames are
        # a source-ordering violation this operator cannot repair —
        # the batch twin (operators/multimodal.py::scene_segments)
        # re-derives truth over the landed corpus
        frames = frames[frames["frame_ms"] > last_ms].sort_values("frame_ms")
        if len(frames):
            luma = frames["luma"].to_numpy(dtype=np.int64)
            prev = np.empty(len(luma), dtype=np.float64)
            prev[0] = last_luma if last_luma >= 0 else np.nan
            prev[1:] = luma[:-1]
            is_cut = ~np.isnan(prev) & (np.abs(luma - prev) > threshold)
            scene_ids = scenes + np.cumsum(is_cut.astype(np.int64))
            out = pd.DataFrame(
                {
                    "asset_id": key[0],
                    "frame_ms": frames["frame_ms"].to_numpy(dtype=np.int64),
                    "luma": luma.astype(np.int32),
                    "is_cut": is_cut,
                    "scene_id": scene_ids,
                }
            )
            last_ms = int(frames["frame_ms"].iloc[-1])
            last_luma = int(luma[-1])
            scenes = int(scene_ids[-1])
        else:
            out = pd.DataFrame(
                columns=[
                    "asset_id",
                    "frame_ms",
                    "luma",
                    "is_cut",
                    "scene_id",
                ]
            )
        state.update((last_ms, last_luma, scenes))
        yield out

    return update


def track_scene_segments(frames: DataFrame, threshold: int = 128) -> DataFrame:
    """Streaming twin of the batch scene segmentation (m7,
    operators/multimodal.py::scene_segments): per-asset keyed state
    carries (last offset, last luma, scene counter) across
    micro-batches, so a cut is detected even when the jump straddles a
    batch boundary and scene ids keep counting instead of resetting.
    State is THREE scalars per asset — bounded by live assets, never
    by stream length — and already-processed offsets are dropped for
    per-frame exactly-once emission under an at-least-once source.
    Assumes per-asset frames arrive in offset order across batches
    (the landing layout's contract, same as the cursor twin's
    uploadtime assumption); the batch operator re-derives truth over
    the landed corpus if a source ever violates it."""
    return frames.groupBy("asset_id").applyInPandasWithState(
        _update_scenes(threshold),
        outputStructType=SCENE_OUTPUT_SCHEMA,
        stateStructType=SCENE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_scene_segmentation(
    frames: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    threshold: int = 128,
    available_now: bool = True,
):
    """Append-mode parquet sink for the per-frame scene verdicts."""
    writer = (
        track_scene_segments(frames, threshold)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
