"""Shared machinery for materialized lake layers (battle-log parse
layer, content-signature layer): idempotent, atomic, self-invalidating
directory caches.

- ``cache_root(name)``: per-layer namespace. $SPARK_GRAFT_LAKE_DIR, when
  set, is a SHARED root — each layer gets its own subdirectory under it
  (two layers whose independent VERSION counters collide must never
  serve each other's files).
- ``keyed_dir``: cache key = (layer VERSION, sf-dir basename, hash of
  the RESOLVED path, hash of the BUILD FORMULA SOURCE). The formula tag
  means an edit to any function the build depends on invalidates the
  cache automatically — no reliance on remembering a manual VERSION
  bump in a different module than the edited formula.
- ``ensure_lake``: build-once with a temp-dir + rename commit.
  Concurrent builders race benignly (the losing rename finds the
  winner's _SUCCESS). A directory left WITHOUT the sentinel (an
  interrupted cleanup) is junk: it is removed and the rename retried,
  instead of permanently bricking every consumer with ENOTEMPTY.
"""

from __future__ import annotations

import hashlib
import inspect
import os
import shutil
import time
from pathlib import Path
from typing import Callable


def cache_root(name: str) -> Path:
    env = os.environ.get("SPARK_GRAFT_LAKE_DIR")
    if env:
        return Path(env) / name
    return Path(__file__).resolve().parents[2] / "spark-warehouse" / name


def formula_tag(*funcs: Callable) -> str:
    """md5 over the source of every formula the build depends on."""
    blob = "\n".join(inspect.getsource(f) for f in funcs)
    return hashlib.md5(blob.encode()).hexdigest()[:8]


def keyed_dir(name: str, version: int, sf_dir: str, tag: str) -> Path:
    p = Path(sf_dir)
    path_tag = hashlib.md5(str(p.resolve()).encode()).hexdigest()[:8]
    return cache_root(name) / f"v{version}-{p.name or 'sf'}-{path_tag}-{tag}"


def ensure_lake(out: Path, build_fn: Callable[[Path], None]) -> Path:
    """Build into ``out`` exactly once via temp dir + rename; repair a
    sentinel-less leftover instead of failing forever."""
    if (out / "_SUCCESS").exists():
        return out
    tmp = out.parent / f".tmp-{os.getpid()}-{int(time.time() * 1000)}"
    tmp.parent.mkdir(parents=True, exist_ok=True)
    try:
        build_fn(tmp)
        (tmp / "_SUCCESS").touch()
        try:
            tmp.rename(out)
        except OSError:
            if not (out / "_SUCCESS").exists():
                # out exists but is junk (interrupted cleanup left a
                # sentinel-less dir): clear it and retry the commit once
                shutil.rmtree(out, ignore_errors=True)
                try:
                    tmp.rename(out)
                except OSError:
                    if not (out / "_SUCCESS").exists():
                        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
