"""Guard against silently rotating a catalog entry out of the driver's
correctness signal: every query in ALL_QUERIES must either already have
a hard driver row (a key in some committed CORRECTNESS_r*.json) or sit
inside the upcoming 50-entry driver window (the first 50 catalog
entries, which is what the driver checks each round). Round 2 found 14
queries that had never been hash-checked because they were added after
the window was consumed — this test makes that impossible to ship.
"""

from __future__ import annotations

import glob
import json
import os

from pokemon_showdown_airflow_etl_spark.plans import (
    _PRIORITY,
    ALL_QUERIES,
    CHANGED_SINCE_LAST_ROW,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _checked_in_past_rounds() -> set[str]:
    keys: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        # only count rows the driver actually greened — an `err` row
        # (e.g. a1's r2 `no_oracle`) is not a standing signal
        keys.update(
            name
            for name, row in rows.items()
            if row.get("err") is None and row.get("hash_match")
        )
    return keys


def test_priority_is_window_prefix():
    """_PRIORITY must be a prefix of the catalog ordering (the driver
    checks the first WINDOW entries of ALL_QUERIES in order)."""
    names = list(ALL_QUERIES)
    assert names[: len(_PRIORITY)] == _PRIORITY
    assert len(_PRIORITY) >= WINDOW, (
        f"_PRIORITY has {len(_PRIORITY)} entries; the driver window is "
        f"{WINDOW} — underfilling it wastes hard correctness signal"
    )


def test_every_query_has_a_driver_row_or_a_window_slot():
    checked = _checked_in_past_rounds()
    window = set(list(ALL_QUERIES)[:WINDOW])
    orphans = [n for n in ALL_QUERIES if n not in checked and n not in window]
    assert not orphans, (
        "catalog entries with no past driver row and no slot in the "
        f"upcoming 50-query window: {orphans} — reorder _PRIORITY in "
        "plans/__init__.py so they get a hard correctness row"
    )


def test_changed_queries_sit_in_the_window():
    """A query edited after its last driver row must not coast on the
    stale green: every CHANGED_SINCE_LAST_ROW name needs a slot in the
    upcoming window (VERDICT r3 item 1)."""
    window = set(list(ALL_QUERIES)[:WINDOW])
    stale = [n for n in CHANGED_SINCE_LAST_ROW if n not in window]
    assert not stale, (
        f"changed-but-unwindowed entries: {stale} — move them into "
        "_PRIORITY's first 50 or their next driver check predates the code"
    )
    unknown = [n for n in CHANGED_SINCE_LAST_ROW if n not in ALL_QUERIES]
    assert not unknown, f"CHANGED_SINCE_LAST_ROW names not in catalog: {unknown}"
