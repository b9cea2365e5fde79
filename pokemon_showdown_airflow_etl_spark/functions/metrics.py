"""O9: timing instrumentation (reference timer.py:20-122 — time_process
ctx-manager, @timed, time_section, env toggle), Spark-first.

The reference hand-times Python sections; on Spark the task-level
numbers already exist in the UI/event log, so the useful layer is (a)
the same ergonomic wrappers for driver-side stages, emitting structured
one-line records, and (b) job-group tagging so every Spark job a stage
launches is attributed to it in the UI and the status tracker — the
replacement for threading timers through task callables.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Any, Callable, Iterator

ENABLE_ENV = "SHOWDOWN_DETAILED_TIMING"  # reference: enable_detailed_timing param


def timing_enabled(default: bool = True) -> bool:
    v = os.environ.get(ENABLE_ENV)
    return default if v is None else v not in ("0", "false", "False")


def emit(record: dict[str, Any]) -> None:
    print(json.dumps(record), file=sys.stderr)


@contextlib.contextmanager
def time_process(name: str, spark=None, **tags) -> Iterator[dict]:
    """Time a pipeline section; if a SparkSession is given, tag every
    Spark job launched inside with a job group named after the section
    (UI attribution + cancellable as a unit)."""
    stats: dict[str, Any] = {"section": name, **tags}
    sc = spark.sparkContext if spark is not None else None
    if sc is not None:
        sc.setJobGroup(name, f"section {name}", interruptOnCancel=False)
    t0 = time.perf_counter()
    try:
        yield stats
    finally:
        stats["seconds"] = round(time.perf_counter() - t0, 3)
        if sc is not None:
            sc.setJobGroup("", "")
        if timing_enabled():
            emit(stats)


def timed(fn: Callable) -> Callable:
    """Decorator twin of time_process (reference @timed)."""

    def wrapper(*args, **kwargs):
        with time_process(fn.__qualname__):
            return fn(*args, **kwargs)

    wrapper.__name__ = fn.__name__
    wrapper.__qualname__ = fn.__qualname__
    return wrapper


def throughput(count: int, seconds: float) -> dict[str, float]:
    """C12 rate math (download.py:246-248, calculate_throughput.py:106-117):
    items/sec, avg seconds/item — the per-run numbers the reference logs."""
    return {
        "count": count,
        "seconds": round(seconds, 3),
        "per_second": round(count / seconds, 3) if seconds else 0.0,
        "avg_seconds_each": round(seconds / count, 4) if count else 0.0,
    }
