"""Streaming as-of enrichment via ``applyInPandasWithState``: every
query event picks up the latest at-or-before reference value of its
key, with the "latest value" carried across micro-batches as keyed
state.

Spark has no native stream-stream as-of join (stream-static joins
re-read the static side; interval joins buffer both sides). The batch
engine's merge-asof (operators/temporal.py:asof_join, cataloged as
j10) streamifies as ONE state row per key — (last_ts, last_value) —
updated by reference rows and read by query rows in timestamp order
inside each micro-batch. The state store checkpoints it, so a
restarted query resumes the carry exactly.

Ordering contract: within a micro-batch, rows process in (ts, side)
order — reference-before-query at equal timestamps, matching the batch
operator's at-or-before tie rule. ACROSS micro-batches the enrichment
is online, and disorder degrades in BOTH directions:

- late reference: a reference row arriving in a later batch than a
  query row it should have informed cannot retro-correct the
  already-emitted row (standard online-enrichment trade-off); a
  reference older than the carried state is DROPPED outright (the
  carry advances monotonically in-batch exactly as the state merge
  does across batches), so it also never regresses the value served
  to on-time rows of its own batch;
- late query: a query row arriving in a later batch than a NEWER
  reference row must not be enriched with that future value — the
  state only holds the latest (ts, value), so the true at-or-before
  answer (an older reference) is gone. Such rows emit NULL ("unknown")
  rather than a value from their future; the guard is
  ``row.ts >= state last_ts`` at emit time (in-batch references always
  satisfy it by the sort order, so only stale cross-batch state
  triggers it).

Feed the stream through a watermark-ordered buffer if the source can
reorder across batches — the batch j10 plan is the replayable ground
truth either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp, last_ref_value double"
ASOF_STATE_SCHEMA = "last_ts double, last_val double"


def _enrich_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    state_ts, state_val = state.get if state.exists else (None, None)
    last_ts, last_val = state_ts, state_val
    batch = pd.concat(list(pdfs), ignore_index=True)
    # (ts, side) walk: side 0 = reference rows first at equal stamps,
    # identical to the batch operator's at-or-before tie rule
    batch = batch.sort_values(["ts", "side"], kind="stable")
    out = []
    for row in batch.itertuples(index=False):
        if row.side == 0:
            # advance-only, in-batch too: a reference OLDER than the
            # carried state must not regress the carry — otherwise an
            # on-time query row in the same batch would be enriched
            # with the stale late reference instead of the newer state
            # (and the late-query NULL guard below would be defeated,
            # since last_ts would move backwards under it)
            t = row.ts.timestamp()
            if last_ts is None or t >= last_ts:
                last_ts, last_val = t, float(row.value)
        else:
            # at-or-before guard: carried state newer than this row means
            # the row arrived late relative to a future reference — emit
            # NULL, never a value from the row's future. In-batch refs
            # pass by construction (the sort puts them at-or-before).
            ok = last_ts is None or row.ts.timestamp() >= last_ts
            out.append(
                {
                    "user_id": key[0],
                    "event_id": int(row.event_id),
                    "ts": row.ts,
                    "last_ref_value": last_val if ok else None,
                }
            )
    # monotone state merge: only ADVANCE the watermark — if the source
    # delivered an out-of-order (older) batch, the newer state survives,
    # so disorder degrades only the rows of the late batch, never the
    # state every future batch depends on
    if last_ts is not None and (state_ts is None or last_ts >= state_ts):
        state.update((float(last_ts), float(last_val)))
    res = pd.DataFrame(out, columns=["user_id", "event_id", "ts", "last_ref_value"])
    # keep never-enriched rows NULL, not NaN (Arrow treats NaN as a
    # valid double, which would diverge from the batch operator's null)
    res["last_ref_value"] = res["last_ref_value"].astype(object).where(
        pd.notna(res["last_ref_value"]), None
    )
    yield res


def stream_asof_enrich(
    events: DataFrame,
    ref_type: str = "click",
    query_type: str = "purchase",
) -> DataFrame:
    """Enrich ``query_type`` events with the latest at-or-before
    ``ref_type`` value per user. ``events`` is a (possibly streaming)
    frame with (user_id, event_id, ts, event_type, value)."""
    from pyspark.sql import functions as F

    tagged = events.filter(
        F.col("event_type").isin(ref_type, query_type)
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == ref_type, 0).otherwise(1).alias("side"),
        F.col("value").cast("double").alias("value"),
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _enrich_group,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_asof_enrichment(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    ref_type: str = "click",
    query_type: str = "purchase",
    available_now: bool = True,
):
    """Sink the enriched query-event stream to parquet."""
    writer = (
        stream_asof_enrich(events, ref_type, query_type)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
