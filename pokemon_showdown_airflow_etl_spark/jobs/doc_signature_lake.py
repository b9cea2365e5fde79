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

Build is idempotent + atomic via the shared lake-cache machinery
(jobs/_lake.py); the cache key embeds a hash of the formula SOURCE
(normalize/tokenize/shingle/minhash/simhash), so an edit to any of
those functions invalidates the cache automatically — VERSION covers
layout changes only.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._lake import ensure_lake, formula_tag, keyed_dir

VERSION = 1
SHINGLE_N = 3
NUM_HASHES = 8


def _tag() -> str:
    from ..operators import dedup

    return formula_tag(
        dedup.normalize_text,
        dedup.tokens,
        dedup.shingles_from_tokens,
        dedup._shingle_df,
        dedup.minhash_signature,
        dedup._token_hash16,
        dedup.simhash16,
    )


def lake_dir(sf_dir: str) -> Path:
    return keyed_dir("signature_lake", VERSION, sf_dir, _tag())


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
    """Build the layer for ``sf_dir`` if absent (atomic, race-benign,
    self-repairing — see jobs/_lake.py)."""
    return ensure_lake(
        lake_dir(sf_dir), lambda tmp: build_signature_lake(spark, sf_dir, tmp)
    )


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
