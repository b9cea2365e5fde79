"""Materialized content-signature layer over the documents table —
compute shingles, MinHash signatures, and SimHash fingerprints ONCE and
let every dedup query read the columnar result.

This is the dedup analogue of the battle-log lake (battlelog_lake.py):
at 100 TB the raw text column dominates, and signature computation
(normalize -> tokenize -> shingle -> k hashes per shingle) is the
expensive map stage every near-dup pass repays. Production systems
compute signatures AT INGEST and store them beside the document — the
dedup jobs then touch only the signature columns (a few hundred bytes
per doc instead of the text). Two tables:

- ``signatures``: doc, shingles (distinct word 3-grams), mh0..mh7
  (the 8 seeded MinHash values) — the fact side of d2 (PPJoin prefix
  filter + exact verify), d3 (band candidates), d7/d8 (candidates +
  verify edges). Short docs (< n tokens) have no row, exactly like the
  on-the-fly ``_shingle_df``.
- ``fingerprints``: doc, simhash (16-bit frequency-weighted) — d4/d5.

Every stored column is the byte-identical output of the same
deterministic formulas the DuckDB oracles replicate, so routing queries
through the layer cannot change results — the driver's hash checks
verify the WRITE PATH end-to-end, same as the b-queries prove the
battle-log lake.

Build is idempotent + atomic (temp dir + rename), keyed by (VERSION,
sf-dir basename, resolved-path hash) like the battle-log lake; bump
VERSION when a formula changes so stale caches can never serve.
"""

from __future__ import annotations

import hashlib
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION = 1
SHINGLE_N = 3
NUM_HASHES = 8


def cache_root() -> Path:
    env = os.environ.get("SPARK_GRAFT_LAKE_DIR")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "spark-warehouse" / "signature_lake"


def lake_dir(sf_dir: str) -> Path:
    p = Path(sf_dir)
    tag = hashlib.md5(str(p.resolve()).encode()).hexdigest()[:8]
    return cache_root() / f"v{VERSION}-{p.name or 'sf'}-{tag}"


def build_signature_lake(spark: SparkSession, sf_dir: str, out_dir: Path) -> None:
    from ..io import table
    from ..operators.dedup import _shingle_df, minhash_signature, simhash16

    docs = table(spark, sf_dir, "documents")
    sh = _shingle_df(docs, "doc_id", "text", SHINGLE_N)
    sig = sh.select(
        "doc", "shingles", *minhash_signature(F.col("shingles"), NUM_HASHES)
    )
    sig.write.parquet(str(out_dir / "signatures"))
    simhash16(docs, "doc_id", "text").write.parquet(str(out_dir / "fingerprints"))


def ensure_signature_lake(spark: SparkSession, sf_dir: str) -> Path:
    """Build the layer for ``sf_dir`` if absent; concurrent builders
    race benignly (losing rename finds the winner in place)."""
    out = lake_dir(sf_dir)
    if (out / "_SUCCESS").exists():
        return out
    tmp = out.parent / f".tmp-{os.getpid()}-{int(time.time() * 1000)}"
    tmp.parent.mkdir(parents=True, exist_ok=True)
    try:
        build_signature_lake(spark, sf_dir, tmp)
        (tmp / "_SUCCESS").touch()
        try:
            tmp.rename(out)
        except OSError:
            if not (out / "_SUCCESS").exists():
                raise
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def signature_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(signatures, fingerprints) of the materialized layer, building on
    first use."""
    out = ensure_signature_lake(spark, sf_dir)
    return (
        spark.read.parquet(str(out / "signatures")),
        spark.read.parquet(str(out / "fingerprints")),
    )
