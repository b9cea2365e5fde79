"""Daily training-corpus curation DAG — the orchestration layer for the
engine's LLM-data side, built with the SAME conventions the replay DAGs
inherit from the reference (O1-O5, dags/showdown_replay_etl_dag.py):
one Spark job per task, XCom carries counts only, conditional skip when
the drop is empty, maintenance under ALL_DONE.

    admit_document_drop      ingest today's drop into the signature
                             corpus (d9 decision + all intake facets:
                             sketches/lm/cms/hh/bloom) — skipped when
                             the drop directory has no undecided docs
    >> decontaminate_check   probe the drop against the STORED Bloom
                             facet per-doc (a10 serve; counts to XCom,
                             verdicts parquet beside the drop) — the
                             drop's OWN batch is excluded from the
                             merged filter, so verdicts measure overlap
                             with the prior corpus, not self-overlap
    >> curate_corpus         the 10-stage curate pipeline over the
                             accepted drop, perplexity band served from
                             the stored lm/ facet (--lm-root) so no
                             corpus re-scan
    >> compact_corpus        ALL_DONE consolidation of the per-batch
                             signature partitions (O12/O4 — runs even
                             if curation failed, so small files never
                             accumulate)

    admit_image_drop         parallel leg (O6): admit today's image
                             drop into the aHash registry (the m8
                             decision; skipped when there is no drop
                             or it is already decided)
    >> compact_images        ALL_DONE consolidation of the image
                             registry's per-batch partitions

Airflow is not installed in the test container, so the module degrades
to an importable no-op; the callables are plain functions tested via
the jobs package (tests/test_orchestration.py pins the topology).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

SIG_ROOT = os.environ.get("CORPUS_SIG_ROOT", "/data/corpus_sig")
DROP_DIR = os.environ.get("CORPUS_DROP_DIR", "/data/corpus_drops")
OUT_DIR = os.environ.get("CORPUS_CURATED_DIR", "/data/corpus_curated")
IMG_ROOT = os.environ.get("CORPUS_IMG_ROOT", "/data/corpus_img")
IMG_DROP_DIR = os.environ.get("CORPUS_IMG_DROP_DIR", "/data/image_drops")

DAG_PARAMS = {
    "batch_id": None,  # defaults to the run's ds (execution date)
    "perplexity_band": [0.05, 0.95],
    "mixture_alpha": 0.7,
    "min_batches_compact": 8,
    # optional r12 stages, off by default: within-corpus SemDeDup
    # (s23 — needs an embeddings parquet covering the drop) and NB
    # auto-labeling of the mixture domains (t29 — needs a labeled
    # seed parquet; used when the drop has no trusted domain column)
    "semantic_prune": None,  # cosine threshold, e.g. 0.9
    "embeddings_path": None,
    "nb_seed_path": None,
    "nb_label_col": "label",
    # optional DSIR importance resampling (t31, off by default): a
    # target parquet whose text distribution the kept docs should
    # match, and the exact number that survive the Gumbel-top-k race
    "dsir_target_path": None,
    "dsir_k": None,
}


def _resolve(context: dict) -> dict:
    return {**DAG_PARAMS, **(context.get("params") or {})}


def _batch_id(p: dict, context: dict) -> str:
    return p.get("batch_id") or context.get("ds") or "adhoc"


def _skip(msg: str, stats: dict) -> dict:
    try:  # pragma: no cover - airflow not installed here
        from airflow.exceptions import AirflowSkipException
    except ImportError:
        return stats
    raise AirflowSkipException(msg)


def run_admit(**context) -> dict:
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        ingest_signature_batch,
    )
    from pokemon_showdown_airflow_etl_spark.session import get_spark

    p = _resolve(context)
    bid = _batch_id(p, context)
    spark = get_spark(app_name="corpus-admit")
    stats = ingest_signature_batch(
        spark,
        spark.read.parquet(os.path.join(DROP_DIR, bid)),
        SIG_ROOT,
        batch_id=bid,
    )
    if stats["n_considered"] == 0:
        return _skip("drop already decided", stats)  # O3
    return stats


def run_decon_check(**context) -> dict:
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        eval_contamination,
    )
    from pokemon_showdown_airflow_etl_spark.session import get_spark

    p = _resolve(context)
    bid = _batch_id(p, context)
    spark = get_spark(app_name="corpus-decon-check")
    # the probe must see only batches that PRECEDED this drop —
    # admit_document_drop has already committed the drop's own bloom
    # partition, and probing a doc against its own grams flags
    # everything (ADVICE r11), so the drop's batch id is excluded
    verdicts = eval_contamination(
        spark,
        SIG_ROOT,
        spark.read.parquet(os.path.join(DROP_DIR, bid)),
        exclude=(bid,),
    )
    if verdicts is None:  # pre-facet corpus: nothing to probe against
        return {"has_bloom": False}
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.pinning import pin

    verdicts = pin(verdicts)
    verdicts.write.mode("overwrite").parquet(
        os.path.join(DROP_DIR, f"{bid}_decon_verdicts")
    )
    row = verdicts.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("contaminated").cast("long")).alias("n_flagged"),
    ).collect()[0]
    return {
        "has_bloom": True,
        "n_docs": int(row["n_docs"]),
        "n_docs_flagged": int(row["n_flagged"] or 0),
    }


def run_admit_images(**context) -> dict:
    from pokemon_showdown_airflow_etl_spark.jobs.image_hash_lake import (
        ingest_image_batch,
    )
    from pokemon_showdown_airflow_etl_spark.session import get_spark

    p = _resolve(context)
    bid = _batch_id(p, context)
    drop = os.path.join(IMG_DROP_DIR, bid)
    if not os.path.isdir(drop):
        return _skip("no image drop today", {"n_batch": 0})  # O3
    spark = get_spark(app_name="corpus-admit-images")
    stats = ingest_image_batch(
        spark, spark.read.parquet(drop), IMG_ROOT, batch_id=bid
    )
    if stats["n_considered"] == 0:
        return _skip("image drop already decided", stats)  # O3
    return stats


def run_compact_images(**context) -> dict:
    from pokemon_showdown_airflow_etl_spark.jobs.image_hash_lake import (
        compact_image_corpus,
    )
    from pokemon_showdown_airflow_etl_spark.session import get_spark

    p = _resolve(context)
    spark = get_spark(app_name="corpus-compact-images")
    return compact_image_corpus(
        spark, IMG_ROOT, min_batches=int(p["min_batches_compact"])
    )


def run_curate(**context) -> dict:
    from pokemon_showdown_airflow_etl_spark.jobs.curate import curate_corpus
    from pokemon_showdown_airflow_etl_spark.session import get_spark

    p = _resolve(context)
    bid = _batch_id(p, context)
    spark = get_spark(app_name="corpus-curate")
    lo, hi = p["perplexity_band"]
    return curate_corpus(
        spark,
        os.path.join(DROP_DIR, bid),
        os.path.join(OUT_DIR, bid),
        perplexity_band=(float(lo), float(hi)),
        lm_root=SIG_ROOT,  # t26: score under the STORED corpus LM
        mixture_alpha=float(p["mixture_alpha"]),
        semantic_prune_threshold=(
            float(p["semantic_prune"])
            if p.get("semantic_prune") is not None
            else None
        ),
        embeddings_path=p.get("embeddings_path"),
        nb_seed_path=p.get("nb_seed_path"),
        nb_label_col=p.get("nb_label_col") or "label",
        dsir_target_path=p.get("dsir_target_path"),
        dsir_k=(
            int(p["dsir_k"]) if p.get("dsir_k") is not None else None
        ),
    )


def run_compact(**context) -> dict:
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        compact_signature_corpus,
    )
    from pokemon_showdown_airflow_etl_spark.session import get_spark

    p = _resolve(context)
    spark = get_spark(app_name="corpus-compact")
    return compact_signature_corpus(
        spark, SIG_ROOT, min_batches=int(p["min_batches_compact"])
    )


try:  # pragma: no cover - airflow not installed in the test container
    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.utils.trigger_rule import TriggerRule

    with DAG(
        dag_id="corpus_curation",
        schedule_interval=timedelta(days=1),
        start_date=datetime(2025, 1, 1),
        catchup=False,
        default_args={"retries": 1, "retry_delay": timedelta(minutes=5)},
        max_active_runs=1,  # the lake jobs are single-writer
        params=dict(DAG_PARAMS),
    ) as dag:
        admit_document_drop = PythonOperator(
            task_id="admit_document_drop",
            python_callable=run_admit,
            execution_timeout=timedelta(hours=6),
        )
        decontaminate_check = PythonOperator(
            task_id="decontaminate_check",
            python_callable=run_decon_check,
        )
        curate = PythonOperator(
            task_id="curate_corpus",
            python_callable=run_curate,
            execution_timeout=timedelta(hours=8),
        )
        compact_corpus = PythonOperator(
            task_id="compact_corpus",
            python_callable=run_compact,
            trigger_rule=TriggerRule.ALL_DONE,  # O4
        )
        admit_image_drop = PythonOperator(
            task_id="admit_image_drop",
            python_callable=run_admit_images,
            execution_timeout=timedelta(hours=6),
        )
        compact_images = PythonOperator(
            task_id="compact_images",
            python_callable=run_compact_images,
            trigger_rule=TriggerRule.ALL_DONE,  # O4
        )
        admit_document_drop >> decontaminate_check >> curate >> compact_corpus
        # the image leg runs parallel to the document leg (O6): the
        # registries are independent lakes with independent drops
        admit_image_drop >> compact_images
except ImportError:
    dag = None
