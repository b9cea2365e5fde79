"""Incremental image-hash registry: m8's admission protocol as a LIVE,
growing lake — the image twin of the signature corpus
(jobs/doc_signature_lake.py), sharing its commit-marker machinery
verbatim so every crash-safety property carries over unchanged.

Layout under ``root``:

    hashes/batch=<id>/      accepted assets' (asset_id, ahash_lo,
                            ahash_hi) — ONLY survivors define near-dup
                            identity, like signatures/
    admissions/batch=<id>/  the full per-asset decision audit
    members/batch=<id>/     every DECIDED asset id — the commit marker
                            (written LAST) and the re-run guard

A drop is hashed ONCE (the Arrow aHash kernel), decided against the
committed corpus hash rows by the banded-Hamming equi-join
(operators/multimodal.py::ahash_admission — complete recall within the
threshold by pigeonhole), and only the accepted rows join the corpus:
tomorrow's drop dedups against today's survivors without re-hashing a
single stored pixel. Consolidation is literally
``compact_signature_corpus(root, data_table="hashes")`` — the
marker/manifest/retired-ledger protocol is table-agnostic and already
crash-tested there.

Reference parity note: this generalizes the reference's
idempotent-ingest anti-join (db.py:853-912) the same way the signature
lake does, applied to a modality the reference does not carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .doc_signature_lake import (
    _committed_batches,
    read_committed,
    retired_batches,
)

MAX_HAMMING = 3


def ingest_image_batch(
    spark: SparkSession,
    new_assets: DataFrame,
    root: str,
    batch_id: str,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_hamming: int = MAX_HAMMING,
) -> dict:
    """Admit ``new_assets`` (id + binary payload) against the hash
    corpus under ``root`` and register the accepted assets. Returns
    counts only (the O5 stats rule): n_batch, n_already_registered,
    n_considered, n_accepted, n_dup_of_corpus, n_dup_in_batch,
    n_undecodable — the last four always sum to n_considered.

    Same protocol as ingest_signature_batch: members/ is the commit
    marker and lands LAST; a committed batch is immutable (re-running
    its id with undecided assets raises); a retired id can never be
    reused; a crashed batch's partial hashes are invisible to every
    reader until its re-run repairs them."""
    import os

    from ..operators.multimodal import ahash_admission, image_ahash
    from ..pinning import pin

    hash_dir = os.path.join(root, "hashes")
    mem_dir = os.path.join(root, "members")
    adm_dir = os.path.join(root, "admissions")

    ids = new_assets.select(F.col(id_col).alias("asset")).distinct()
    n_batch = ids.count()

    committed = _committed_batches(mem_dir)
    members = read_committed(spark, root, "members")
    fresh_ids = (
        ids
        if members is None
        else ids.join(members.select("asset"), "asset", "left_anti")
    )
    n_fresh = fresh_ids.count()
    if n_fresh == 0:
        return {
            "n_batch": n_batch,
            "n_already_registered": n_batch,
            "n_considered": 0,
            "n_accepted": 0,
            "n_dup_of_corpus": 0,
            "n_dup_in_batch": 0,
            "n_undecodable": 0,
        }
    if batch_id in committed:
        # a committed batch may legitimately re-present its OWN
        # undecodable assets (checkpoint replay with the same null
        # payloads — they are deliberately absent from members/ so a
        # future batch can re-consider them); only ids the batch's
        # audit never saw make the re-run an illegal mutation
        own_adm = os.path.join(adm_dir, f"batch={batch_id}")
        own_undecodable = (
            spark.read.parquet(own_adm)
            .filter(F.col("status") == "undecodable")
            .select("asset")
        )
        n_foreign = fresh_ids.join(own_undecodable, "asset", "left_anti").count()
        if n_foreign > 0:
            raise ValueError(
                f"batch_id {batch_id!r} already committed but this run "
                f"carries {n_foreign} undecided assets its audit never saw "
                "— a committed batch is immutable; submit the amended "
                "assets under a NEW batch_id"
            )
        return {
            "n_batch": n_batch,
            "n_already_registered": n_batch - n_fresh,
            "n_considered": 0,
            "n_accepted": 0,
            "n_dup_of_corpus": 0,
            "n_dup_in_batch": 0,
            "n_undecodable": n_fresh,
        }
    if batch_id in retired_batches(root):
        raise ValueError(
            f"batch_id {batch_id!r} was retired by compaction — its "
            "admission audit is immutable; use a NEW batch_id"
        )

    # one Arrow hash pass for the fresh assets, pinned: the admission
    # joins (corpus probe + within-batch) and the registration write
    # all read it
    fresh_assets = new_assets.dropDuplicates([id_col]).join(
        fresh_ids.withColumnRenamed("asset", id_col), id_col
    )
    batch_hashes = pin(
        image_ahash(fresh_assets, id_col=id_col, payload_col=payload_col)
        .select("asset_id", "ahash_lo", "ahash_hi")
    )
    corpus_hashes = read_committed(spark, root, "hashes", exclude=(batch_id,))
    if corpus_hashes is None:
        corpus_hashes = batch_hashes.limit(0)

    # null/undecodable payloads produce no hash row; they get an
    # explicit 'undecodable' audit row and are EXCLUDED from members/
    # (left undecided), so a corrected re-upload of the same asset_id
    # is re-considered instead of permanently skipped, and the returned
    # counts always sum to n_considered (ADVICE r11)
    hashed_ids = batch_hashes.select(
        F.col("asset_id").alias("asset")
    ).distinct()
    undecodable = fresh_ids.join(hashed_ids, "asset", "left_anti").select(
        "asset",
        F.lit(0).cast("long").alias("n_corpus_dups"),
        F.lit(None).cast("string").alias("first_corpus_dup"),
        F.lit("undecodable").alias("status"),
    )
    decision = ahash_admission(
        batch_hashes, corpus_hashes, max_hamming=max_hamming
    ).unionByName(undecodable)
    decision.write.mode("overwrite").parquet(
        os.path.join(adm_dir, f"batch={batch_id}")
    )
    decision = spark.read.parquet(os.path.join(adm_dir, f"batch={batch_id}"))

    accepted = decision.filter(F.col("status") == "accepted").select(
        F.col("asset").alias("asset_id")
    )
    batch_hashes.join(accepted, "asset_id").write.mode("overwrite").parquet(
        os.path.join(hash_dir, f"batch={batch_id}")
    )
    counts = {
        r["status"]: r["n"]
        for r in decision.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    # members LAST: the batch's commit marker, recording every DECIDED
    # id (rejected dups included, undecodable excluded) so a re-run
    # skips decided assets but re-opens undecodable ones
    hashed_ids.write.mode("overwrite").parquet(
        os.path.join(mem_dir, f"batch={batch_id}")
    )
    return {
        "n_batch": n_batch,
        "n_already_registered": n_batch - n_fresh,
        "n_considered": n_fresh,
        "n_accepted": counts.get("accepted", 0),
        "n_dup_of_corpus": counts.get("dup_of_corpus", 0),
        "n_dup_in_batch": counts.get("dup_in_batch", 0),
        "n_undecodable": counts.get("undecodable", 0),
    }


def compact_image_corpus(
    spark: SparkSession, root: str, min_batches: int = 8
) -> dict:
    """O12 consolidation for the image registry — the signature lake's
    compaction verbatim with data_table='hashes' (the protocol is
    table-agnostic; there are no facet dirs here, so the facet
    reductions no-op)."""
    from .doc_signature_lake import compact_signature_corpus

    return compact_signature_corpus(
        spark, root, min_batches=min_batches, data_table="hashes"
    )
