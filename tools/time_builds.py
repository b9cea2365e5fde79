"""Time the throughput paths bench.py measures (lake builds, signature
ingest) in isolation, with bench's own methodology (best-of-N rebuilds).

Usage: python tools/time_builds.py [ingest] [sig_lake] [b_lake] [emb_index] [emb_reindex]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pokemon_showdown_airflow_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = set(sys.argv[1:]) or {"ingest", "sig_lake"}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="time-builds",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    def build_twice(cache_dir, build_fn, n=2) -> float:
        best = None
        for _ in range(n):
            shutil.rmtree(cache_dir, ignore_errors=True)
            t0 = time.perf_counter()
            build_fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    if "b_lake" in which:
        from pokemon_showdown_airflow_etl_spark.jobs import battlelog_lake as bl

        out["b_lake_build_sec"] = build_twice(
            bl.lake_dir(SF_DIR), lambda: bl.ensure_battlelog_lake(spark, SF_DIR)
        )
    if "sig_lake" in which:
        from pokemon_showdown_airflow_etl_spark.jobs import doc_signature_lake as sl

        out["sig_lake_build_sec"] = build_twice(
            sl.lake_dir(SF_DIR), lambda: sl.ensure_signature_lake(spark, SF_DIR)
        )
    if "emb_index" in which:
        from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as el

        out["emb_index_build_sec"] = build_twice(
            el.sf_index_dir(SF_DIR), lambda: el.sf_index_tables(spark, SF_DIR)
        )
    if "emb_reindex" in which:
        from pokemon_showdown_airflow_etl_spark.jobs import embedding_index_lake as el

        out["emb_reindex_build_sec"] = build_twice(
            el.sf_reindexed_dir(SF_DIR), lambda: el.sf_reindexed_tables(spark, SF_DIR)
        )
    if "ingest" in which:
        from pyspark.sql import functions as SF

        from pokemon_showdown_airflow_etl_spark.io import table
        from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
            ingest_signature_batch,
        )

        docs_tbl = table(spark, SF_DIR, "documents")
        seed_docs = docs_tbl.filter(SF.col("doc_id") % 2 != 0)
        drop_docs = docs_tbl.filter(SF.col("doc_id") % 2 == 0)
        n_drop = drop_docs.count()
        best: dict[bool, float] = {}
        for facets_on in (True, False):
            for _ in range(3):
                with tempfile.TemporaryDirectory() as d:
                    ingest_signature_batch(
                        spark, seed_docs, d + "/sig", "seed", facets=facets_on
                    )
                    t0 = time.perf_counter()
                    ingest_signature_batch(
                        spark, drop_docs, d + "/sig", "drop", facets=facets_on
                    )
                    dt = time.perf_counter() - t0
                    best[facets_on] = min(best.get(facets_on, dt), dt)
        out["ingest_sec"] = round(best[True], 3)
        out["ingest_docs_per_sec"] = round(n_drop / best[True], 1)
        out["ingest_nofacets_sec"] = round(best[False], 3)
        out["ingest_nofacets_docs_per_sec"] = round(n_drop / best[False], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
