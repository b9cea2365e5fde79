"""Parallel backfill: distributed cursor-range discovery.

The reference's backfill pages the search API strictly sequentially —
one cursor, 0.1 s between pages (tasks/discovery.py:159-211) — and its
own optimization notes propose parallel page fetching as future work
(docs/airflow_backfill_optimization.md:36-137). This implements that
proposal Spark-first:

the time axis below the current low watermark is split into disjoint
half-open ranges [start, end); each range becomes one task of a
mapInPandas stage that runs the same page loop the sequential backfill
runs, bounded to its range (fetch before=end, keep rows >= start, stop
at the first row < start or a short page). Ranges are disjoint, so no
replay appears twice across tasks; the anti-join MERGE dedups against
history exactly like sequential discovery. Rate limits stay per-task
(the client's request_pause_s), so total request rate = tasks x pace —
size n_ranges to the API budget.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import SparkSession

from ..operators import metadata as M
from ..schemas import PAGE_SIZE
from ..sources.api import ReplayApiClient
from .lake import MetadataStore, ReplayLake, save_state
from .pipeline import _batch_id, _status_rows

RANGE_SCHEMA = "range_start long, range_end long"
ROW_SCHEMA = "row_json string"


def _fetch_range(client: ReplayApiClient, format_id: str, start: int, end: int,
                 max_pages: int) -> list[dict]:
    """The sequential page loop, bounded to [start, end)."""
    out: list[dict] = []
    before = end
    pages = 0
    while pages < max_pages:
        page = client.fetch_page(format_id, before)
        pages += 1
        if not page:
            break
        for row in page:
            if int(row["uploadtime"]) < start:
                return out
            out.append(row)
        if len(page) < PAGE_SIZE:
            break
        before = int(page[-1]["uploadtime"])
    return out


def discover_backfill_parallel(
    spark: SparkSession,
    lake: ReplayLake,
    client: ReplayApiClient,
    format_id: str,
    window_s: int = 86_400,
    n_ranges: int = 8,
    max_pages_per_range: int = 50,
) -> dict:
    """Backfill ``n_ranges`` windows of ``window_s`` seconds below the
    current low watermark, all ranges fetched concurrently on executors.

    Without a low watermark (empty metadata) the newest page seeds it
    first. Returns the same stats shape as sequential backfill.
    """
    meta = MetadataStore(spark, lake.metadata_path)
    oldest = M.low_watermark(meta.read(), format_id)
    if oldest is None:
        seed = client.fetch_page(format_id)
        if not seed:
            return {"ranges": 0, "replays_found": 0, "new_replays": 0}
        oldest = int(seed[-1]["uploadtime"]) + 1

    bounds = [
        (oldest - (i + 1) * window_s, oldest - i * window_s) for i in range(n_ranges)
    ]
    ranges_df = spark.createDataFrame(bounds, RANGE_SCHEMA).repartition(n_ranges)

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for start, end in zip(pdf["range_start"], pdf["range_end"]):
                for row in _fetch_range(
                    client, format_id, int(start), int(end), max_pages_per_range
                ):
                    rows.append(json.dumps(row))
            yield pd.DataFrame({"row_json": rows})

    fetched = ranges_df.mapInPandas(fetch, ROW_SCHEMA).localCheckpoint(eager=True)
    collected = [json.loads(r["row_json"]) for r in fetched.collect()]

    batch = _batch_id(format_id, prefix="backfill_parallel_")
    incoming = _status_rows(spark, collected, format_id, batch)
    new_count = meta.insert_new(incoming)
    if collected:
        save_state(
            lake, format_id, oldest_ts=min(int(r["uploadtime"]) for r in collected)
        )
    return {
        "batch_id": batch,
        "ranges": n_ranges,
        "replays_found": len(collected),
        "new_replays": new_count,
    }
