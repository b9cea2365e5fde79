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
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_ENABLED = True


def pin(df: DataFrame) -> DataFrame:
    """Pin ``df`` (lazy localCheckpoint) so downstream branches share one
    computation — identity while ``disabled()`` is active."""
    if _ENABLED:
        return df.localCheckpoint(eager=False)
    return df


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
