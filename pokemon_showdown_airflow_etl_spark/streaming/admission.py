"""Streaming document admission — the d9 incremental dedup as a
Structured Streaming sink: an unbounded stream of incoming documents is
admitted batch-by-batch against the growing signature corpus
(jobs/doc_signature_lake.py::ingest_signature_batch).

Exactly-once composition (the T5 contract, twice over): the checkpoint
makes micro-batch REPLAY possible after a failure, and the ingest's
``members/batch=<id>`` commit marker makes replay HARMLESS — a replayed
epoch either finds its marker (completed: no-op) or repairs its partial
partitions in place, excluding them from the corpus view while
re-deciding. State never lives in the stream itself (no
applyInPandasWithState): the signature corpus on disk IS the state, so
admission survives restarts, scales with the lake not the stream, and
batch/stream admissions interleave safely on one root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_document_admission(
    docs: DataFrame,
    sig_root: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    available_now: bool = True,
    facets: bool = True,
):
    """Admit a streaming frame of (id, text) documents against
    ``sig_root``. Each micro-batch runs the full d9 decision against
    the registered survivors, so a duplicate arriving a week after its
    original is rejected without any stream-side state growth.

    Batch ids are namespaced by a digest of the CHECKPOINT directory:
    epoch numbering is only monotone within one checkpoint, so a bare
    ``epoch-N`` would collide when a second stream (fresh checkpoint,
    epochs restarting at 0) feeds the same sig_root — its epoch-0
    would be mistaken for a crashed re-run of the first stream's
    epoch-0 and repair-overwrite committed corpus partitions.

    Each admitted micro-batch also persists its intake facets
    (sketches/lm/cms/hh — ``facets=False`` to skip), so the corpus-wide
    sketch stats, stored LM, and heavy hitters stay current as the
    stream drains; compaction later reduces the per-epoch partitions."""
    import hashlib

    from ..jobs.doc_signature_lake import ingest_signature_batch

    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def admit(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_signature_batch(
            batch_df.sparkSession,
            batch_df,
            sig_root,
            batch_id=f"{ns}-epoch-{epoch_id}",
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            facets=facets,
        )

    writer = docs.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_embedding_admission(
    vecs: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    available_now: bool = True,
):
    """The s11 streaming twin: admit a stream of (id, embedding) rows
    against the persisted embedding index
    (jobs/embedding_index_lake.py) — identical exactly-once composition
    as document admission above (checkpoint replay + members/ commit
    markers; the index on disk is the state). The index must be
    initialized (centroids committed) before the stream starts — the
    first micro-batch fails loudly otherwise, by read_centroids's
    contract. Batch ids are namespaced by the checkpoint digest for the
    same two-streams-one-root reason as document admission."""
    import hashlib

    from ..jobs.embedding_index_lake import ingest_embedding_batch

    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def admit(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_embedding_batch(
            batch_df.sparkSession,
            batch_df,
            index_root,
            batch_id=f"{ns}-epoch-{epoch_id}",
            threshold=threshold,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
        )

    writer = vecs.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_image_admission(
    assets: DataFrame,
    root: str,
    checkpoint_dir: str,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    available_now: bool = True,
):
    """Admit a streaming frame of (id, binary payload) image assets
    against the incremental aHash registry
    (jobs/image_hash_lake.py::ingest_image_batch) — the m8 decision
    per micro-batch, with the SAME exactly-once composition as the
    document and embedding admissions: checkpoint replay is harmless
    because the registry's members/ marker either no-ops a completed
    epoch or repairs its partials in place, and batch ids are
    namespaced by the checkpoint digest so two streams feeding one
    root can never collide on epoch numbers. The registry on disk is
    the only state — no stream-side hash table, so a duplicate image
    arriving weeks after its original is still rejected."""
    import hashlib

    from ..jobs.image_hash_lake import ingest_image_batch

    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def admit(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_image_batch(
            batch_df.sparkSession,
            batch_df,
            root,
            batch_id=f"{ns}-epoch-{epoch_id}",
            id_col=id_col,
            payload_col=payload_col,
            max_hamming=max_hamming,
        )

    writer = assets.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
