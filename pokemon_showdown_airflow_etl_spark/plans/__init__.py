"""Named query catalog: every operator from SURVEY.md section 2 mapped
onto the driver testdata, each paired with a DuckDB oracle SQL string.

``ALL_QUERIES`` is what ``__spark_entry__.queries()`` / ``oracle_sql()``
expose to the driver.
"""

from __future__ import annotations

from .base import Query
from . import relational, joins, llm, battlelog, extras


def _merge() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for mod in (relational, joins, llm, battlelog, extras):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    return out


ALL_QUERIES: dict[str, Query] = _merge()
