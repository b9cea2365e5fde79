"""Tests for skew-mitigation utilities (salted aggregate/join must be
result-identical to the plain formulations) and the IVF ANN variant
(structural guarantees + recall against the exact brute-force path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.io import table
from pokemon_showdown_airflow_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from pokemon_showdown_airflow_etl_spark.operators.skew import (
    salted_agg_by_key,
    salted_count_by_key,
    salted_join_small,
)


def _skewed_df(spark):
    # 10k rows, 90% on one hot key
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("key"),
        (F.col("id") % 7).cast("double").alias("x"),
    )


def test_salted_count_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {r["key"]: r["count"] for r in df.groupBy("key").count().collect()}
    salted = {r["key"]: r["count"] for r in salted_count_by_key(df, "key").collect()}
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["key"]: r["s"] for r in df.groupBy("key").agg(F.sum("x").alias("s")).collect()
    }
    salted = {r["key"]: r["sum_x"] for r in salted_agg_by_key(df, "key", ["x"]).collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("k3", 2), ("k11", 3), ("missing", 4)], "key string, tag int"
    )
    plain = big.join(small, "key").groupBy("key", "tag").count()
    salted = salted_join_small(big, small, "key").groupBy("key", "tag").count()
    p = {(r["key"], r["tag"]): r["count"] for r in plain.collect()}
    s = {(r["key"], r["tag"]): r["count"] for r in salted.collect()}
    assert s == p


def test_ivf_structure_and_recall(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    ivf = ivf_topk(emb, k=1, n_cells=8, n_probe=4)
    rows = ivf.collect()
    # one result row per query that had any candidate in its probed cells
    assert len(rows) >= 0.9 * n
    assert all(r["rank"] == 1 for r in rows)

    exact = {
        r["query_id"]: (r["nn_id"], r["cos_sim"])
        for r in brute_force_topk(emb, emb, k=1).collect()
    }
    got = {r["query_id"]: (r["nn_id"], r["cos_sim"]) for r in rows}
    hits = sum(1 for q, (nn, _) in got.items() if exact.get(q, (None,))[0] == nn)
    recall = hits / max(len(got), 1)
    # approximate by design, but the planted near-dup pairs are nearly
    # colinear and land in the same cell: recall@1 well above chance
    assert recall >= 0.5, f"recall@1 {recall:.2f}"
    # IVF similarity can never exceed the exact top-1 similarity
    for q, (_, sim) in got.items():
        assert sim <= exact[q][1] + 1e-9


def test_gemm_topk_matches_expression_variant(spark, sf_dir):
    """The numpy-GEMM bucketed ANN must agree with the pure-expression
    lsh_bucketed_topk (same buckets, same tie-breaks): nearest-neighbor
    ids identical, similarities equal to 6 decimals."""
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        bucketed_gemm_topk,
        lsh_bucketed_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    expr = {
        r["query_id"]: (r["nn_id"], r["cos_sim"])
        for r in lsh_bucketed_topk(emb, k=1, n_bits=4).collect()
    }
    gemm = {
        r["query_id"]: (r["nn_id"], r["cos_sim"])
        for r in bucketed_gemm_topk(emb, k=1, n_bits=4).collect()
    }
    assert set(gemm) == set(expr)
    mismatched = [q for q in gemm if gemm[q] != expr[q]]
    assert not mismatched, f"{len(mismatched)} mismatches, e.g. {mismatched[:3]}"


def test_salted_join_rejects_replicating_join_types(spark):
    import pytest as _pytest

    big = spark.range(10).withColumnRenamed("id", "key")
    small = spark.range(3).withColumnRenamed("id", "key")
    for how in ("right", "full", "right_outer", "full_outer"):
        with _pytest.raises(ValueError, match="salt replicas"):
            salted_join_small(big, small, "key", how=how)


def test_kmeans_inertia_is_non_increasing(spark, sf_dir):
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        fit_kmeans_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents, history = fit_kmeans_centroids(emb, n_cells=4, max_iter=5)
    assert len(history) >= 2, "trainer stopped before a single update"
    for a, b in zip(history, history[1:]):
        assert b <= a + 1e-9, f"Lloyd iteration increased inertia: {history}"


def test_kmeans_centroids_cover_corpus_and_stay_distributed(spark, sf_dir):
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        fit_kmeans_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    cents, _ = fit_kmeans_centroids(emb, n_cells=4, max_iter=3)
    rows = cents.collect()
    assert len(rows) == 4
    assert sum(r["n_members"] for r in rows) == n
    assert all(len(r["centroid"]) == 64 for r in rows)


def test_kmeans_beats_first_n_seed_and_plugs_into_ivf(spark, sf_dir):
    """Trained cells must (a) not be worse than their own initialization
    — history[0] is the first-n-seed inertia, history[-1] the trained
    one — and (b) drop into ivf_topk unchanged: same output schema,
    every query still gets k neighbors."""
    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        fit_kmeans_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents, history = fit_kmeans_centroids(emb, n_cells=4, max_iter=6)
    assert history[-1] <= history[0] + 1e-9
    got = ivf_topk(emb, k=1, n_probe=2, centroids=cents)
    assert got.columns == ["query_id", "nn_id", "rank", "cos_sim"]
    n = emb.count()
    assert got.count() == n  # one nearest neighbor per vector


def test_embeddings_have_no_zero_norm_vectors(spark, sf_dir):
    """Precondition of the GEMM kernels (ivf_topk / embedding_near_dups
    / bucketed_gemm_topk): they substitute norm=1 for zero-norm vectors
    where the expression path (and the DuckDB oracles) would produce
    NaN — the two only agree because the corpus has no zero vectors.
    This pins that assumption to the data."""
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.operators.similarity import (
        as_double,
        l2_norm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    zero = emb.select(
        l2_norm(as_double(F.col("embedding"))).alias("nrm")
    ).filter(F.col("nrm") == 0.0)
    assert zero.count() == 0
