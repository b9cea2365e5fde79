"""LLM-data-pipeline queries (SURVEY.md section 2.11) over the
``documents`` and ``embeddings`` tables, each with a DuckDB oracle.

Cross-engine determinism strategy:
- hashing: md5 hex (identical in Spark/DuckDB); MinHash = lexicographic
  min over hex digests; 16-bit token hashes parse the first 4 hex chars.
- floats: computed in double, rounded identically on both sides.
- token/shingle definitions share one normalization (lower, collapse
  whitespace, split on single space).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, similarity, text
from .base import Query, t
from ..pinning import pin

QUERIES: list[Query] = []


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn

    return deco


# Shared SQL fragments (single normalization across all oracles).
NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
TOKENS_SQL = f"string_split({NORM_SQL}, ' ')"
SHINGLES_SQL = (
    "list_distinct(list_transform(range(1, len(tk) - 1), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))"
)


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------


@q(
    "d1_exact_dedup",
    f"""
    SELECT md5({NORM_SQL}) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup via content-hash groupBy: one row per distinct "
    "normalized content with keeper id and copy count. Single shuffle on "
    "the digest; at 100 TB this is the cheapest dedup pass and runs first.",
)
def d1_exact_dedup(spark, sf_dir):
    return dedup.exact_dup_groups(t(spark, sf_dir, "documents"), "doc_id", "text")


JACCARD_THRESHOLD = 0.8


def _sig_lake(spark, sf_dir):
    """(signatures, fingerprints) from the materialized content-signature
    layer (jobs/doc_signature_lake.py) — built on first use, then a pure
    columnar read. Stored values are byte-identical to the on-the-fly
    formulas, so the oracles (which compute from raw text) double as the
    layer's write-path check."""
    from ..jobs.doc_signature_lake import signature_tables

    return signature_tables(spark, sf_dir)


# single-source the layer's geometry: the d-queries MUST pass the same
# n / num_hashes the layer was built with (the precomputed path ignores
# mismatched values rather than recomputing)
from ..jobs.doc_signature_lake import NUM_HASHES as SIG_NUM_HASHES  # noqa: E402
from ..jobs.doc_signature_lake import SHINGLE_N as SIG_SHINGLE_N  # noqa: E402




@q(
    "d2_ngram_jaccard_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS shingles
        FROM toks WHERE len(tk) >= 3
    ), sized AS (
        SELECT doc_id, len(shingles) AS sz FROM sh WHERE len(shingles) > 0
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE len(shingles) > 0
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 4) AS jaccard
    FROM pairs p
    JOIN sized sa ON p.doc_a = sa.doc_id
    JOIN sized sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= {JACCARD_THRESHOLD}
    """,
    doc="Near-dup pairs by word-3-gram Jaccard >= 0.8 via inverted-index "
    "join (explode shingles, equi-join on shingle, pair group-by) — "
    "O(candidate pairs), not O(n^2). The planted ~0.98-Jaccard duplicate "
    "pairs in the synthetic corpus surface here.",
)
def d2_ngram_jaccard_pairs(spark, sf_dir):
    sig, _ = _sig_lake(spark, sf_dir)
    pairs = dedup.shingle_jaccard_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=SIG_SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
        shingle_df=sig.select("doc", "shingles"),
    )
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


def _minhash_sql(num_hashes: int = 8, rows_per_band: int = 2) -> str:
    mins = ",\n           ".join(
        f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(num_hashes)
    )
    n_bands = num_hashes // rows_per_band
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, {bi} AS band_no, mh{a} || '|' || mh{b} AS band_key FROM sig".format(
            bi=bi, a=bi * rows_per_band, b=bi * rows_per_band + 1
        )
        for bi in range(n_bands)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS shingles
        FROM toks WHERE len(tk) >= 3
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE len(shingles) > 0
    ), sig AS (
        SELECT doc_id,
           {mins}
        FROM ex GROUP BY doc_id
    ), bands AS (
        {band_selects}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band_no = b.band_no AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
    """


@q(
    "d3_minhash_lsh_candidates",
    _minhash_sql(),
    doc="MinHash+LSH candidate pairs: 8 MinHashes (lexicographic min of "
    "seeded md5 per shingle — engine-independent), 4 bands x 2 rows; pairs "
    "agreeing on any band. Candidate volume is set by band geometry, so "
    "the plan never materializes n^2 — the 100 TB near-dup path.",
)
def d3_minhash_lsh_candidates(spark, sf_dir):
    sig, _ = _sig_lake(spark, sf_dir)
    return dedup.minhash_lsh_candidates(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=SIG_SHINGLE_N,
        num_hashes=SIG_NUM_HASHES, rows_per_band=2, signature_df=sig,
    )


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) AS b{i}" for i in range(16)
    )
    fp = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
    return f"""
    WITH tk AS (
        SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM documents
    ), h AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::INT AS h FROM tk
    ), bits AS (
        SELECT doc_id, {sums} FROM h GROUP BY doc_id
    )
    SELECT doc_id AS doc, CAST({fp} AS BIGINT) AS simhash FROM bits
    """


@q(
    "d4_simhash_fingerprint",
    _simhash_sql(),
    doc="16-bit frequency-weighted SimHash fingerprint per document "
    "(token hash = first 4 hex chars of md5, parsed base 16 — "
    "engine-independent). Explode + groupBy, both map-side combinable.",
)
def d4_simhash_fingerprint(spark, sf_dir):
    _, fp = _sig_lake(spark, sf_dir)
    return fp.select("doc", "simhash")


D5_SQL = f"""
    WITH fp AS ({_simhash_sql()})
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
"""


@q(
    "d5_simhash_near_dups",
    D5_SQL,
    doc="SimHash near-dup pairs within Hamming distance 1, found via "
    "pigeonhole bit-block equi-joins (never n^2); the oracle verifies "
    "against the exhaustive pair join.",
)
def d5_simhash_near_dups(spark, sf_dir):
    _, fp = _sig_lake(spark, sf_dir)
    return dedup.simhash_near_dups(
        t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=1,
        fingerprint_df=fp,
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

COS_SQL = (
    "list_dot_product(q.v, c.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))"
)


def _srp_bucket_sql(vec_expr: str, n_bits: int = 4) -> str:
    """DuckDB replica of operators.similarity.srp_bucket: the identical
    seeded-hyperplane literals (repr round-trips doubles exactly), the
    identical sign test — so SRP buckets hash-match across engines while
    staying data-independent."""
    from ..operators.similarity import srp_hyperplanes

    parts = []
    for i, plane in enumerate(srp_hyperplanes(n_bits=n_bits)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({vec_expr}, {arr}) > 0 THEN {1 << i} ELSE 0 END"
        )
    return "(" + "\n               + ".join(parts) + ")"


@q(
    "s1_similarity_topk",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qs AS (
        SELECT vec_id, v FROM e WHERE vec_id < 5
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nn_id, {COS_SQL} AS cs
        FROM qs q JOIN e c ON q.vec_id != c.vec_id
    ), ranked AS (
        SELECT query_id, nn_id, cs,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM scored
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank, ROUND(cs, 6) AS cos_sim
    FROM ranked WHERE rnk <= 3
    """,
    doc="Brute-force cosine top-3 for 5 query vectors against the corpus: "
    "broadcast the query set, JVM-side zip_with/aggregate dot products, "
    "per-query window top-k. Exact baseline for the ANN path.",
)
def s1_similarity_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


@q(
    "s2_ann_srp_topk",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               {_srp_bucket_sql("embedding::DOUBLE[]")} AS bucket
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nn_id, {COS_SQL} AS cs
        FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
    ), ranked AS (
        SELECT query_id, nn_id, cs,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM scored
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank, ROUND(cs, 6) AS cos_sim
    FROM ranked WHERE rnk <= 1
    """,
    doc="LSH-bucketed approximate nearest neighbor: sign-projection buckets "
    "(4 bits), candidates meet only within a bucket (equi-join shuffle, no "
    "cross join), top-1 per vector. The corpus-vs-corpus scale path.",
)
def s2_ann_srp_topk(spark, sf_dir):
    return similarity.lsh_bucketed_topk(t(spark, sf_dir, "embeddings"), k=1, n_bits=4)


# 0.3 keeps the check non-vacuous on the synthetic random embeddings
# (max within-bucket cos at sf0.001 is ~0.449; real near-dup corpora
# would sit at 0.9+ and the operator takes the threshold as a param).
NEAR_DUP_COS = 0.3


@q(
    "s3_embedding_near_dups",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
        SELECT vec_id, v,
               {_srp_bucket_sql("v")} AS bucket
        FROM e
    )
    SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, ROUND({COS_SQL}, 6) AS cos_sim
    FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id
    WHERE ROUND({COS_SQL}, 6) >= {NEAR_DUP_COS}
    """,
    doc=f"Embedding-cosine near-duplicate pairs (threshold {NEAR_DUP_COS}) via "
    "SRP-bucketing: candidates must share a 4-bit sign-projection "
    "bucket, making the self-join an equi-join on the bucket key (a "
    "shuffle-partitionable plan) instead of a nested-loop all-pairs "
    "comparison. The oracle replicates the bucket formula, so results "
    "stay value-checked.",
)
def s3_embedding_near_dups(spark, sf_dir):
    return similarity.embedding_near_dups(
        t(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_COS, n_bits=4
    )


# s9 reuses s3's oracle verbatim as the edge producer — the d8 pattern
# applied to the embedding path, so the clustering is checked on exactly
# the pairs the pairwise query reports.
_S3_ORACLE = QUERIES[[q_.name for q_ in QUERIES].index("s3_embedding_near_dups")].oracle


@q(
    "s9_embedding_dup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_S3_ORACLE}),
    edges AS (
        SELECT vec_a AS u, vec_b AS v FROM pairs
        UNION
        SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ),
    lab AS (SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM reach GROUP BY node)
    SELECT CAST(node AS BIGINT) AS vec_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           node = cluster_id AS is_kept,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """,
    doc="Embedding-side duplicate CLUSTERS: s3's SRP-bucketed cosine "
    "pairs -> connected components -> keeper = min vec_id per "
    "component — the drop DECISION for semantic dedup, completing the "
    "pairs->clusters->keeper chain the text path has in d7->d8 (a "
    "vector B near both A and C must be dropped exactly once). Same "
    "min-label-propagation + pointer-jumping operator as d8 (rounds "
    "halve in depth from round 3 — this low-threshold graph measured "
    "diameter ~23 at sf0.1, 13 rounds with jumping), "
    "lineage-truncated); the oracle computes the same fixed point with "
    "a recursive CTE over s3's pair SQL.",
)
def s9_embedding_dup_clusters(spark, sf_dir):
    from ..operators.dedup import connected_components

    edges = similarity.embedding_near_dups(
        t(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_COS, n_bits=4
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    labels = connected_components(edges)
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_kept"),
        "cluster_size",
    )


@q(
    "s23_semantic_dedup",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
        SELECT vec_id, v,
               {_srp_bucket_sql("v")} AS bucket
        FROM e
    ), pairs AS (
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, ROUND({COS_SQL}, 6) AS cs
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < c.vec_id
        WHERE ROUND({COS_SQL}, 6) >= {NEAR_DUP_COS}
    ), w AS (
        SELECT vec_b AS vec_id,
               min(vec_a) AS witness_id,
               arg_min(cs, vec_a) AS witness_cos
        FROM pairs GROUP BY 1
    )
    SELECT e.vec_id,
           w.vec_id IS NULL AS kept,
           w.witness_id,
           w.witness_cos
    FROM e LEFT JOIN w USING (vec_id)
    """,
    doc="SemDeDup-style semantic corpus pruning (Abbas et al. 2023, "
    "arXiv:2303.09540; operators/similarity.py::semantic_dedup): "
    "within each SRP sign-projection cell, keep one representative per "
    "cosine near-duplicate neighborhood — a vector is DROPPED iff a "
    "smaller-id same-cell vector sits within the threshold, which "
    "makes the keep decision order-free (no greedy scan order to "
    "replicate cross-engine) while every dropped vector keeps a "
    "witness. The drop DECISION complement to s9's clusters: s9 "
    "reports the component structure, s23 reports the per-vector "
    "keep/drop verdict + deterministic witness a curation pass "
    "consumes directly. Pair scan is s3's within-cell GEMM equi-join "
    "(O(sum of squared cell sizes), never all-pairs); the witness "
    "reduce is one struct-min aggregation; the verdict anchors on the "
    "input ids with a left join.",
)
def s23_semantic_dedup(spark, sf_dir):
    return similarity.semantic_dedup(
        t(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_COS, n_bits=4
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@q(
    "t1_quality_features",
    f"""
    WITH toks AS (
        SELECT doc_id, text, {TOKENS_SQL} AS tk FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           ROUND(list_sum(list_transform(tk, t -> length(t))) / greatest(len(tk), 1), 4)
               AS avg_token_len,
           ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / greatest(length(text), 1), 4)
               AS punct_ratio,
           ROUND(len(list_filter(tk, t -> t IN ('a','the','and','of','to','in','is','it')))
                 / greatest(len(tk), 1), 4) AS stopword_ratio
    FROM toks
    """,
    doc="Per-document quality features (length, token stats, punctuation "
    "and stopword ratios): pure map over the corpus, zero shuffles — the "
    "100 TB quality-filter pass shape.",
)
def t1_quality_features(spark, sf_dir):
    return text.quality_features(t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "t2_lang_id",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), counts AS (
        SELECT doc_id,
               len(list_filter(tk, t -> t IN ('the','a','and','of','to'))) AS en_c,
               len(list_filter(tk, t -> t IN ('el','la','los','de','que'))) AS es_c,
               len(list_filter(tk, t -> t IN ('le','la','les','des','et'))) AS fr_c,
               len(list_filter(tk, t -> t IN ('der','die','das','und','ist'))) AS de_c
        FROM toks
    )
    SELECT doc_id,
           CASE WHEN greatest(en_c, es_c, fr_c, de_c) = 0 THEN 'und'
                WHEN en_c >= es_c AND en_c >= fr_c AND en_c >= de_c THEN 'en'
                WHEN es_c >= fr_c AND es_c >= de_c THEN 'es'
                WHEN fr_c >= de_c THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM counts
    """,
    doc="Marker-word language ID (earliest-argmax over per-language marker "
    "counts, 'und' when none match) — the n-gram-heuristic shape; a model "
    "scorer swaps in as a pandas_udf without changing the plan.",
)
def t2_lang_id(spark, sf_dir):
    return text.lang_id(t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "t3_token_counts",
    f"""
    SELECT doc_id,
           CAST(len({TOKENS_SQL}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens and BPE-ish pre-tokens "
    "(letter runs | digit runs | single symbols) via regexp_extract_all.",
)
def t3_token_counts(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.token_count_ws(F.col("text")).alias("n_ws_tokens"),
        text.token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


@q(
    "t4_fingerprint",
    f"""
    SELECT doc_id, md5({NORM_SQL}) AS fingerprint FROM documents
    """,
    doc="Stable content fingerprint: md5 of normalized text — the "
    "content-addressed identity used for incremental dedup at scale.",
)
def t4_fingerprint(spark, sf_dir):
    return text.fingerprint(t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "t5_corpus_stats",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           ROUND(CAST(quantile_cont(n_chars, 0.5) AS DOUBLE), 4) AS median_chars,
           ROUND(CAST(quantile_cont(n_chars, 0.9) AS DOUBLE), 4) AS p90_chars
    FROM documents
    GROUP BY lang
    """,
    doc="Corpus distribution stats per language (operators/text.py::"
    "corpus_stats): exact=True here is the oracle-checkable verification "
    "twin (exact interpolated quantiles, bit-comparable vs quantile_cont); "
    "the operator DEFAULTS to the percentile_approx sketch path — the "
    "only one that survives a group holding billions of values at 100 TB "
    "(plan-gated in test_plan_quality.py).",
)
def t5_corpus_stats(spark, sf_dir):
    return text.corpus_stats(t(spark, sf_dir, "documents"), exact=True)


@q(
    "t6_token_explode",
    f"""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest({TOKENS_SQL}) AS token FROM documents)
    GROUP BY token
    """,
    doc="UDTF-shaped table-generating op (SURVEY 2.9): text -> one row per "
    "token (explode(split(...))) + frequency — the battle-log line "
    "explosion shape on the documents stand-in.",
)
def t6_token_explode(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(dedup.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------


@q(
    "m1_payload_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    doc="Multimodal binary-column plumbing: text encoded to an opaque "
    "binary payload; byte length + content digest computed without any "
    "decode (JVM-side, prunable). Real media decode is the mapInPandas "
    "stub in operators.multimodal.",
)
def m1_payload_metadata(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    from ..operators.multimodal import attach_payload_metadata

    return attach_payload_metadata(d).select("doc_id", "n_bytes", "content_md5")


@q(
    "m2_image_decode_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CAST(64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 AS INT) AS width,
           CAST(64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc="Arrow-batched mapInPandas decode plumbing, end-to-end: binary "
    "payloads cross to Python in columnar batches and the (stubbed, "
    "digest-derived) decoder emits typed image features. The oracle "
    "recomputes the digest math in SQL, so the whole Python batch path — "
    "schema, pruned column transfer, batch shape — is value-checked "
    "cross-engine, not just smoke-tested.",
)
def m2_image_decode_features(spark, sf_dir):
    from ..operators.multimodal import decode_image_features

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return decode_image_features(assets)


@q(
    "m3_frame_sample_plan",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CAST(unnest(generate_series(0, greatest(n_chars * 40 - 1, 0), 1000)) AS BIGINT)
               AS frame_ms
    FROM documents
    """,
    doc="Video frame-sampling plan: duration metadata explodes to one row "
    "per sampled frame offset (JVM-side sequence+explode; the per-frame "
    "decode is the deploy-time stub). The explosion is what matters for "
    "partitioning at scale: rows fan out ~40x/document here without any "
    "Python involvement.",
)
def m3_frame_sample_plan(spark, sf_dir):
    from ..operators.multimodal import frame_sample_plan

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
    )
    return frame_sample_plan(assets).select(
        "asset_id", F.col("frame_ms").cast("long").alias("frame_ms")
    )


@q(
    "m4_image_resize",
    """
    WITH d AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, text,
               64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 64 AS w,
               64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 64 AS h
        FROM documents
    )
    SELECT asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END AS INT) AS out_width,
           CAST(CASE WHEN w >= h THEN (h * 224) // w ELSE 224 END AS INT) AS out_height,
           CAST(out_width * out_height * 3 AS BIGINT) AS out_bytes,
           md5(text || CAST(out_width AS VARCHAR) || 'x' || CAST(out_height AS VARCHAR))
               AS resized_md5
    FROM d
    """,
    doc="Aspect-fit image resize through the Arrow mapInPandas path: "
    "integer-exact target-box math on the (stub-decoded) dims plus a "
    "content-addressed stand-in for the resized buffer, so the whole "
    "Python batch pipeline is value-checked cross-engine. A real "
    "resampler swaps into the inner loop with the plan unchanged.",
)
def m4_image_resize(spark, sf_dir):
    from ..operators.multimodal import resize_images

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return resize_images(assets, target=224)


M5_FRAME = 400
M5_HOP = 200
# single source of truth for the PCM synthesizer multiplier: the m5b
# oracle string below folds in the same constant the numpy kernel uses
from ..operators.multimodal import PCM_MULT as PCM_MULT_SQL  # noqa: E402


@q(
    "m5_audio_frame_energy",
    f"""
    WITH a AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id,
               md5(text) AS cmd5,
               1000 + CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT)
                   AS n_samples
        FROM documents
        WHERE text IS NOT NULL
    ), f AS (
        SELECT asset_id, cmd5, n_samples,
               (n_samples - {M5_FRAME}) // {M5_HOP} + 1 AS n_frames
        FROM a
    )
    SELECT asset_id,
           CAST(16000 AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(u.k AS BIGINT) AS frame_idx,
           CAST((u.k * {M5_HOP} * 1000) // 16000 AS BIGINT) AS start_ms,
           CAST(('0x' || substr(md5(cmd5 || ':' || CAST(u.k AS VARCHAR)), 1, 8))
                AS BIGINT) AS energy_u32
    FROM f CROSS JOIN LATERAL (SELECT unnest(range(0, n_frames)) AS k) u
    """,
    doc="Audio feature-extraction plumbing (operators/multimodal.py::"
    "audio_frame_energy) — the modality m1-m4 left uncovered: each "
    "asset's (stub-decoded) PCM header yields sample count + rate, a "
    "25 ms window slides at a 12.5 ms hop (the standard speech "
    "framing at 16 kHz), and one row per fully-contained frame comes "
    "back with start offset + a digest-derived per-frame energy, so "
    "the WHOLE fan-out — framing arithmetic, ~hundreds-per-asset row "
    "explosion inside the Arrow kernel, typed schema, integer ms "
    "math — is value-checked cross-engine like m2/m4 (a real "
    "torchaudio frame-energy swaps into the inner loop, plan "
    "unchanged). The DECODER-reported sample_rate is an output column "
    "(r9 ADVISORY: start_ms divides by it, so a 44.1 kHz deploy "
    "decoder must be visible downstream, not silently divergent from "
    "a fixed-16 kHz expectation — the oracle pins the stub's constant "
    "today and inherits the real column at deploy). Each asset "
    "crosses the JVM/Python boundary ONCE; frames fan out AFTER the "
    "binary column is dropped, so downstream shuffles carry narrow "
    "numeric rows, never media bytes.",
)
def m5_audio_frame_energy(spark, sf_dir):
    from ..operators.multimodal import audio_frame_energy

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return audio_frame_energy(assets, frame_samples=M5_FRAME, hop_samples=M5_HOP)


@q(
    "m5b_audio_pcm_energy",
    f"""
    WITH a AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id,
               CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS seed,
               1000 + CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT)
                   AS n_samples
        FROM documents
        WHERE text IS NOT NULL
    ), f AS (
        SELECT asset_id, seed, n_samples,
               (n_samples - {M5_FRAME}) // {M5_HOP} + 1 AS n_frames
        FROM a
    )
    SELECT asset_id,
           CAST(16000 AS BIGINT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(u.k AS BIGINT) AS frame_idx,
           CAST((u.k * {M5_HOP} * 1000) // 16000 AS BIGINT) AS start_ms,
           CAST(list_sum(list_transform(
               list_transform(range(0, {M5_FRAME}),
                   j -> ((seed + (u.k * {M5_HOP} + j + 1) * {PCM_MULT_SQL})
                         % 2147483648) % 65536 - 32768),
               s -> s * s)) AS BIGINT) AS energy
    FROM f CROSS JOIN LATERAL (SELECT unnest(range(0, n_frames)) AS k) u
    """,
    doc="The m5 kernel with the inner loop made REAL (VERDICT r9 item "
    "6 / missing #2): per-frame energy is an actual windowed "
    "sum-of-squares over the asset's sample stream (operators/"
    "multimodal.py::audio_pcm_frame_energy), not a digest stub — the "
    "VAD / loudness / silence-trim computation itself. Samples are "
    "synthesized deterministically from the content digest (seed + "
    "golden-ratio LCG, mod-2^31 then int16-ranged), all integer "
    "arithmetic, so the energies hash-check bit-exactly cross-engine: "
    "numpy squares each sample ONCE and differences a cumulative sum "
    "(overlapping windows share work), DuckDB re-derives every frame "
    "from scratch. At deploy the synthesizer is replaced by the real "
    "decoder's sample array and the windowing/energy code runs "
    "unchanged. Same one-crossing-per-asset / fan-out-after-"
    "binary-drop shape as m5.",
)
def m5b_audio_pcm_energy(spark, sf_dir):
    from ..operators.multimodal import audio_pcm_frame_energy

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return audio_pcm_frame_energy(
        assets, frame_samples=M5_FRAME, hop_samples=M5_HOP
    )


# the deterministic 8x8-thumbnail pixels of an asset set CTE named
# {src}(asset_id, text): 64 bytes of md5 in counter mode — pixel j =
# byte j%16 of md5(cmd5 || ':' || j//16) — iid uniform per asset like
# a real thumbnail (an LCG stream mod 256 would collapse every
# thumbnail to one of 256 shifted patterns; see image_ahash's
# docstring). Shared by the m6 hash oracle and the m6b pair oracle.
_M6_HASH_SQL = (
    "SELECT asset_id, width, height, u.j AS j,\n"
    "       CAST(('0x' || substr(md5(cmd5 || ':' || CAST(u.j // 16 AS VARCHAR)),\n"
    "                            1 + 2 * (u.j % 16), 2)) AS INT) AS g\n"
    "FROM (\n"
    "    SELECT asset_id, md5(text) AS cmd5,\n"
    "           CAST(64 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT)\n"
    "                % 64 AS INT) AS width,\n"
    "           CAST(64 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT)\n"
    "                % 64 AS INT) AS height\n"
    "    FROM {src}\n"
    ") CROSS JOIN LATERAL (SELECT unnest(range(0, 64)) AS j) u"
)
_M6_PACK_SQL = (
    "SELECT asset_id, any_value(width) AS width, any_value(height) AS height,\n"
    "       CAST(coalesce(sum(CASE WHEN j < 32 AND g * 64 > s\n"
    "            THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END), 0) AS BIGINT)\n"
    "           AS ahash_lo,\n"
    "       CAST(coalesce(sum(CASE WHEN j >= 32 AND g * 64 > s\n"
    "            THEN 1::BIGINT << CAST(j - 32 AS INT) ELSE 0 END), 0) AS BIGINT)\n"
    "           AS ahash_hi\n"
    "FROM (SELECT *, sum(g) OVER (PARTITION BY asset_id) AS s FROM px)\n"
    "GROUP BY asset_id"
)


@q(
    "m6_image_ahash",
    f"""
    WITH src AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, text
        FROM documents WHERE text IS NOT NULL
    ), px AS (
        {_M6_HASH_SQL.format(src="src")}
    )
    {_M6_PACK_SQL}
    """,
    doc="Perceptual average-hash per image (operators/multimodal.py::"
    "image_ahash): the decode+resize stub yields a deterministic 8x8 "
    "grayscale thumbnail (md5 in counter mode over the payload digest "
    "— iid uniform pixels per asset, unlike an LCG stream whose "
    "mod-256 collapses to 256 patterns) and the HASH ITSELF is real "
    "— bit j set iff "
    "pixel j strictly exceeds the thumbnail mean (integer-exact as "
    "g*64 > sum), packed into two positive 32-bit words (neither "
    "engine can shift into bit 63 of a signed BIGINT). The oracle "
    "re-derives every pixel, the mean comparison, and both packed "
    "words from raw parquet, so the whole Arrow kernel — batch shape, "
    "vectorized (n,64) pixel matrix, basis matmul packing — is "
    "value-checked cross-engine. One JVM/Python crossing per asset; "
    "the binary column drops at the kernel boundary, so downstream "
    "dedup joins shuffle five narrow columns, never image bytes. At "
    "deploy PIL's resize((8,8)).convert('L') replaces the synthesizer "
    "and the mean/bit/pack code runs unchanged.",
)
def m6_image_ahash(spark, sf_dir):
    from ..operators.multimodal import image_ahash

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return image_ahash(assets)


M6B_MAX_HAMMING = 3
M6B_COPY_EVERY = 50
M6B_COPY_OFFSET = 1_000_000_000


@q(
    "m6b_image_near_dups",
    f"""
    WITH src AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, text
        FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT CAST(doc_id + {M6B_COPY_OFFSET} AS VARCHAR), text
        FROM documents
        WHERE text IS NOT NULL AND doc_id % {M6B_COPY_EVERY} = 0
    ), px AS (
        {_M6_HASH_SQL.format(src="src")}
    ), hx AS (
        {_M6_PACK_SQL}
    ), keyed AS (
        SELECT asset_id, ahash_lo, ahash_hi, b.b AS band,
               CASE b.b
                   WHEN 0 THEN ahash_lo & 65535
                   WHEN 1 THEN ahash_lo >> 16
                   WHEN 2 THEN ahash_hi & 65535
                   ELSE ahash_hi >> 16
               END AS key
        FROM hx CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    )
    SELECT DISTINCT l.asset_id AS asset_a, r.asset_id AS asset_b,
           CAST(bit_count(xor(l.ahash_lo, r.ahash_lo))
                + bit_count(xor(l.ahash_hi, r.ahash_hi)) AS INT) AS hamming
    FROM keyed l JOIN keyed r ON l.band = r.band AND l.key = r.key
    WHERE l.asset_id < r.asset_id
      AND bit_count(xor(l.ahash_lo, r.ahash_lo))
          + bit_count(xor(l.ahash_hi, r.ahash_hi)) <= {M6B_MAX_HAMMING}
    """,
    doc="Near-duplicate image pairs by banded Hamming blocking over "
    "aHash (operators/multimodal.py::ahash_near_dups; Manku, Jain & "
    "Das Sarma, WWW 2007): the 64-bit hash splits into four 16-bit "
    "bands, and two hashes within 3 bit flips differ in at most 3 "
    "bands — by pigeonhole they agree EXACTLY on at least one, so "
    "equi-join blocking on (band, key) has COMPLETE recall, never "
    "scans all pairs, and verification is two XOR+popcount words per "
    "candidate (band collisions beyond the threshold are filtered — "
    "the candidate != survivor distinction the oracle checks). The "
    "asset set plants a re-encoded copy of every 50th document (the "
    "re-uploaded-image case), so the pair output is non-empty at "
    "every SF and each planted pair reports hamming 0 through the "
    "full kernel->band->verify path. At 100 TB the join is "
    "O(collisions per 16-bit key) with narrow int rows; image bytes "
    "never leave the hash kernel.",
)
def m6b_image_near_dups(spark, sf_dir):
    from ..operators.multimodal import ahash_near_dups, image_ahash

    docs = t(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    ).unionByName(
        docs.filter(F.col("doc_id") % M6B_COPY_EVERY == 0).select(
            (F.col("doc_id") + M6B_COPY_OFFSET).cast("string").alias("asset_id"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    )
    # pinned: the hash frame feeds BOTH sides of the band self-join —
    # unpinned, the Arrow hash kernel would run twice
    hashes = pin(image_ahash(assets).select("asset_id", "ahash_lo", "ahash_hi"))
    return ahash_near_dups(hashes, max_hamming=M6B_MAX_HAMMING)


M8_BATCH_MOD = 20  # doc_id % 20 == 7 plays the incoming image drop
M8_COPY_CORPUS = 1_000_000_000  # re-encodes of corpus images (%50==0)
M8_COPY_BATCH = 3_000_000_000  # second copies of batch images (%140==7)


@q(
    "m8_image_admission",
    f"""
    WITH src AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, text
        FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT CAST(doc_id + {M8_COPY_CORPUS} AS VARCHAR), text
        FROM documents
        WHERE text IS NOT NULL AND doc_id % {M6B_COPY_EVERY} = 0
        UNION ALL
        SELECT CAST(doc_id + {M8_COPY_BATCH} AS VARCHAR), text
        FROM documents
        WHERE text IS NOT NULL AND doc_id % 140 = 7
    ), px AS (
        {{px}}
    ), hx AS (
        {{pack}}
    ), flagged AS (
        SELECT asset_id, ahash_lo, ahash_hi,
               CAST(asset_id AS BIGINT) % {M8_BATCH_MOD} = 7
                   OR CAST(asset_id AS BIGINT) >= {M8_COPY_CORPUS} AS is_new
        FROM hx
    ), keyed AS (
        SELECT asset_id, ahash_lo, ahash_hi, is_new, b.b AS band,
               CASE b.b
                   WHEN 0 THEN ahash_lo & 65535
                   WHEN 1 THEN ahash_lo >> 16
                   WHEN 2 THEN ahash_hi & 65535
                   ELSE ahash_hi >> 16
               END AS key
        FROM flagged CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    ), nb AS (SELECT * FROM keyed WHERE is_new),
    cb AS (SELECT * FROM keyed WHERE NOT is_new),
    cdup AS (
        SELECT asset, CAST(count(*) AS BIGINT) AS n_corpus_dups,
               min(corpus_asset) AS first_corpus_dup
        FROM (
            SELECT DISTINCT n.asset_id AS asset, c.asset_id AS corpus_asset
            FROM nb n JOIN cb c ON n.band = c.band AND n.key = c.key
            WHERE bit_count(xor(n.ahash_lo, c.ahash_lo))
                  + bit_count(xor(n.ahash_hi, c.ahash_hi))
                  <= {M6B_MAX_HAMMING}
        ) GROUP BY asset
    ), bdup AS (
        SELECT DISTINCT b.asset_id AS asset
        FROM nb a JOIN nb b ON a.band = b.band AND a.key = b.key
                           AND a.asset_id < b.asset_id
        WHERE bit_count(xor(a.ahash_lo, b.ahash_lo))
              + bit_count(xor(a.ahash_hi, b.ahash_hi))
              <= {M6B_MAX_HAMMING}
    )
    SELECT f.asset_id AS asset,
           coalesce(c.n_corpus_dups, 0) AS n_corpus_dups,
           c.first_corpus_dup,
           CASE WHEN c.asset IS NOT NULL THEN 'dup_of_corpus'
                WHEN bd.asset IS NOT NULL THEN 'dup_in_batch'
                ELSE 'accepted' END AS status
    FROM (SELECT DISTINCT asset_id FROM flagged WHERE is_new) f
    LEFT JOIN cdup c ON f.asset_id = c.asset
    LEFT JOIN bdup bd ON f.asset_id = bd.asset
    """.format(
        px=_M6_HASH_SQL.format(src="src"),
        pack=_M6_PACK_SQL,
    ),
    doc="Incremental image admission (operators/multimodal.py::"
    "ahash_admission): d9's cross-snapshot dedup protocol applied to "
    "the image modality — an incoming drop (the doc_id % 20 == 7 "
    "slice plus planted re-encodes: copies of corpus images that must "
    "report dup_of_corpus, and second copies of batch images that "
    "must report dup_in_batch under the min-id-keeper rule) decides "
    "against the corpus's materialized aHash rows. The batch's band "
    "rows equi-join the corpus band table (no corpus self-join, no "
    "re-hash of corpus pixels; a deployment buckets the stored band "
    "rows so the probe is exchange-free), verification is two "
    "XOR+popcount words, recall within hamming 3 is COMPLETE by the "
    "m6b pigeonhole argument, and corpus identity takes precedence "
    "over batch identity exactly like d9. The oracle replays hash, "
    "bands, both joins, and the precedence from raw parquet — one "
    "drifted verdict mismatches the hash.",
)
def m8_image_admission(spark, sf_dir):
    from ..operators.multimodal import ahash_admission, image_ahash

    docs = t(spark, sf_dir, "documents")

    def payload(df, offset=0):
        aid = (F.col("doc_id") + F.lit(offset)).cast("string")
        return df.select(
            aid.alias("asset_id"), F.encode("text", "UTF-8").alias("payload")
        )

    assets = (
        payload(docs)
        .unionByName(
            payload(docs.filter(F.col("doc_id") % M6B_COPY_EVERY == 0), M8_COPY_CORPUS)
        )
        .unionByName(payload(docs.filter(F.col("doc_id") % 140 == 7), M8_COPY_BATCH))
    )
    # one Arrow hash pass for all assets, pinned: the batch/corpus
    # split and both admission joins read it
    hashes = pin(image_ahash(assets).select("asset_id", "ahash_lo", "ahash_hi"))
    aid = F.col("asset_id").cast("long")
    is_new = (aid % M8_BATCH_MOD == 7) | (aid >= M8_COPY_CORPUS)
    return ahash_admission(
        hashes.filter(is_new), hashes.filter(~is_new), max_hamming=M6B_MAX_HAMMING
    )


M7_CUT_THRESHOLD = 128


@q(
    "m7_scene_segments",
    f"""
    WITH f AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, md5(text) AS cmd5,
               unnest(generate_series(0, greatest(n_chars * 40 - 1, 0), 1000))
                   AS frame_ms
        FROM documents
    ), l AS (
        SELECT asset_id, CAST(frame_ms AS BIGINT) AS frame_ms,
               CAST(('0x' || substr(md5(cmd5 || ':' ||
                    CAST(frame_ms AS VARCHAR)), 1, 2)) AS INT) AS luma
        FROM f
    ), c AS (
        SELECT asset_id, frame_ms, luma,
               coalesce(abs(luma - lag(luma) OVER (PARTITION BY asset_id
                        ORDER BY frame_ms)) > {M7_CUT_THRESHOLD}, FALSE)
                   AS is_cut
        FROM l
    )
    SELECT asset_id, frame_ms, luma, is_cut,
           CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
                OVER (PARTITION BY asset_id ORDER BY frame_ms) AS BIGINT)
               AS scene_id
    FROM c
    """,
    doc="Shot-boundary detection + scene segmentation (operators/"
    "multimodal.py::scene_segments) — the pass a video-training "
    "pipeline runs to sample one clip per scene instead of N "
    "near-identical frames: m3's frame fan-out (the shared JVM "
    "sequence+explode) carries the content digest, each frame gets a "
    "mean-luma column (digest-derived stub; a real decoder's frame "
    "statistic swaps in with the plan unchanged), a CUT is a luma "
    "jump above the threshold vs the lag-1 predecessor (first frame "
    "never cuts), and scene_id is the running count of cuts — the "
    "same windowed-cumsum sessionization as w5's session windows, "
    "keyed by change points instead of gaps. Pure JVM window "
    "expressions, zero Python, ONE shuffle on the asset key with "
    "windows bounded by frames-per-asset; the oracle re-derives the "
    "luma series and both window legs from raw parquet.",
)
def m7_scene_segments(spark, sf_dir):
    from ..operators.multimodal import (
        frame_sample_plan,
        scene_segments,
        synthetic_frame_luma,
    )

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        F.md5("text").alias("cmd5"),
    )
    frames = frame_sample_plan(assets).select(
        "asset_id",
        F.col("frame_ms").cast("long").alias("frame_ms"),
        synthetic_frame_luma(F.col("cmd5"), F.col("frame_ms")).alias("luma"),
    )
    return scene_segments(frames, threshold=M7_CUT_THRESHOLD)


@q(
    "m9_scene_frame_hashes",
    f"""
    WITH f AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, md5(text) AS cmd5,
               unnest(generate_series(0, greatest(n_chars * 40 - 1, 0), 1000))
                   AS frame_ms
        FROM documents
    ), l AS (
        SELECT asset_id, cmd5, CAST(frame_ms AS BIGINT) AS frame_ms,
               CAST(('0x' || substr(md5(cmd5 || ':' ||
                    CAST(frame_ms AS VARCHAR)), 1, 2)) AS INT) AS luma
        FROM f
    ), c AS (
        SELECT asset_id, cmd5, frame_ms, luma,
               coalesce(abs(luma - lag(luma) OVER w) > {M7_CUT_THRESHOLD},
                        FALSE) AS is_cut,
               lag(frame_ms) OVER w IS NULL AS first_frame
        FROM l WINDOW w AS (PARTITION BY asset_id ORDER BY frame_ms)
    ), rep AS (
        SELECT asset_id,
               CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
                    OVER (PARTITION BY asset_id ORDER BY frame_ms) AS BIGINT)
                   AS scene_id,
               frame_ms, luma,
               md5(cmd5 || ':' || CAST(frame_ms AS VARCHAR)) AS fmd5
        FROM c
        QUALIFY (is_cut OR first_frame) AND cmd5 IS NOT NULL
    ), px AS (
        SELECT asset_id, scene_id, frame_ms, luma, fmd5, u.j AS j,
               CAST(('0x' || substr(md5(fmd5 || ':' ||
                    CAST(u.j // 16 AS VARCHAR)), 1 + 2 * (u.j % 16), 2))
                   AS INT) AS g
        FROM rep CROSS JOIN LATERAL (SELECT unnest(range(0, 64)) AS j) u
    )
    SELECT asset_id, scene_id, frame_ms, any_value(luma) AS luma,
           CAST(64 + CAST(('0x' || substr(any_value(fmd5), 1, 2)) AS INT)
                % 64 AS INT) AS width,
           CAST(64 + CAST(('0x' || substr(any_value(fmd5), 3, 2)) AS INT)
                % 64 AS INT) AS height,
           CAST(coalesce(sum(CASE WHEN j < 32 AND g * 64 > s2
                THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END), 0) AS BIGINT)
               AS ahash_lo,
           CAST(coalesce(sum(CASE WHEN j >= 32 AND g * 64 > s2
                THEN 1::BIGINT << CAST(j - 32 AS INT) ELSE 0 END), 0) AS BIGINT)
               AS ahash_hi
    FROM (SELECT *, sum(g) OVER (PARTITION BY asset_id, scene_id, frame_ms)
               AS s2 FROM px)
    GROUP BY asset_id, scene_id, frame_ms
    """,
    doc="Scene-representative frame sampling + perceptual hashing "
    "(operators/multimodal.py::scene_frame_hashes) — the 'sample one "
    "clip per scene' pipeline m7's docstring promises, composed end "
    "to end: m7's segmentation, then each scene's FIRST frame as its "
    "deterministic representative (a scene STARTS at its cut, so the "
    "representative is the cut frame itself — a pure filter riding "
    "m7's window, no argmin aggregation), then the m6 aHash kernel "
    "over the sampled frames' digest-derived payloads so scenes dedup "
    "across assets by perceptual identity. Scale shape: m7's ONE "
    "exchange on the asset key (the first-frame flag shares the same "
    "window), a filter that collapses frames to scenes, and one Arrow "
    "crossing over the SURVIVORS only — frame payloads materialize "
    "per scene, never per frame, and the (scene_id, frame_ms) context "
    "rides THROUGH the kernel (no join back across an exchange). The "
    "oracle re-derives the luma series, both window legs, the "
    "representative rule, and every hash bit from raw parquet.",
)
def m9_scene_frame_hashes(spark, sf_dir):
    from ..operators.multimodal import (
        frame_sample_plan,
        scene_frame_hashes,
        synthetic_frame_luma,
    )

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        F.md5("text").alias("cmd5"),
    )
    frames = frame_sample_plan(assets).select(
        "asset_id",
        "cmd5",
        F.col("frame_ms").cast("long").alias("frame_ms"),
        synthetic_frame_luma(F.col("cmd5"), F.col("frame_ms")).alias("luma"),
    )
    return scene_frame_hashes(frames, threshold=M7_CUT_THRESHOLD)


# the m9 representative-frame + hash CTE chain over a planted asset set
# CTE named {src}(asset_id, cmd5, frame_ms) — shared by the m9b oracle
_M9_HASH_SQL = f"""
    l AS (
        SELECT asset_id, cmd5, CAST(frame_ms AS BIGINT) AS frame_ms,
               CAST(('0x' || substr(md5(cmd5 || ':' ||
                    CAST(frame_ms AS VARCHAR)), 1, 2)) AS INT) AS luma
        FROM f
    ), c AS (
        SELECT asset_id, cmd5, frame_ms, luma,
               coalesce(abs(luma - lag(luma) OVER w) > {M7_CUT_THRESHOLD},
                        FALSE) AS is_cut,
               lag(frame_ms) OVER w IS NULL AS first_frame
        FROM l WINDOW w AS (PARTITION BY asset_id ORDER BY frame_ms)
    ), rep AS (
        SELECT asset_id,
               CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
                    OVER (PARTITION BY asset_id ORDER BY frame_ms) AS BIGINT)
                   AS scene_id,
               frame_ms,
               md5(cmd5 || ':' || CAST(frame_ms AS VARCHAR)) AS fmd5
        FROM c
        QUALIFY (is_cut OR first_frame) AND cmd5 IS NOT NULL
    ), px AS (
        SELECT asset_id, scene_id, frame_ms, u.j AS j,
               CAST(('0x' || substr(md5(fmd5 || ':' ||
                    CAST(u.j // 16 AS VARCHAR)), 1 + 2 * (u.j % 16), 2))
                   AS INT) AS g
        FROM rep CROSS JOIN LATERAL (SELECT unnest(range(0, 64)) AS j) u
    ), hx AS (
        SELECT asset_id || ':' || CAST(scene_id AS VARCHAR) AS unit,
               CAST(coalesce(sum(CASE WHEN j < 32 AND g * 64 > s2
                    THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END), 0)
                    AS BIGINT) AS ahash_lo,
               CAST(coalesce(sum(CASE WHEN j >= 32 AND g * 64 > s2
                    THEN 1::BIGINT << CAST(j - 32 AS INT) ELSE 0 END), 0)
                    AS BIGINT) AS ahash_hi
        FROM (SELECT *, sum(g) OVER (PARTITION BY asset_id, scene_id,
                   frame_ms) AS s2 FROM px)
        GROUP BY asset_id, scene_id, frame_ms
    )"""


@q(
    "m9b_scene_clip_dups",
    f"""
    WITH f AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, md5(text) AS cmd5,
               unnest(generate_series(0, greatest(n_chars * 40 - 1, 0), 1000))
                   AS frame_ms
        FROM documents
        UNION ALL
        SELECT CAST(doc_id + {M6B_COPY_OFFSET} AS VARCHAR), md5(text),
               unnest(generate_series(0, greatest(n_chars * 40 - 1, 0), 1000))
        FROM documents WHERE doc_id % {M6B_COPY_EVERY} = 0
    ), {_M9_HASH_SQL}, keyed AS (
        SELECT unit, ahash_lo, ahash_hi, b.b AS band,
               CASE b.b
                   WHEN 0 THEN ahash_lo & 65535
                   WHEN 1 THEN ahash_lo >> 16
                   WHEN 2 THEN ahash_hi & 65535
                   ELSE ahash_hi >> 16
               END AS key
        FROM hx CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    )
    SELECT DISTINCT l.unit AS clip_a, r.unit AS clip_b,
           CAST(bit_count(xor(l.ahash_lo, r.ahash_lo))
                + bit_count(xor(l.ahash_hi, r.ahash_hi)) AS INT) AS hamming
    FROM keyed l JOIN keyed r ON l.band = r.band AND l.key = r.key
    WHERE l.unit < r.unit
      AND bit_count(xor(l.ahash_lo, r.ahash_lo))
          + bit_count(xor(l.ahash_hi, r.ahash_hi)) <= {M6B_MAX_HAMMING}
    """,
    doc="Cross-asset scene/clip deduplication — the downstream consumer "
    "m9 exists for: every asset's scene-representative frame hashes "
    "(the m9 chain) feed the m6b banded-Hamming pair scan, so a clip "
    "re-used across videos (the re-uploaded-footage case — planted "
    "here as full re-encodes of every 50th asset, whose every scene "
    "must pair with the original's at hamming 0) is found by "
    "perceptual identity without decoding a frame twice. The clip key "
    "is asset_id ':' scene_id — synthesized for OUTPUT identity only, "
    "never split back (the a12 composite-key lesson), and ':' cannot "
    "occur in the numeric asset ids. Same scale shape as m6b: "
    "equi-join blocking on (band, 16-bit key) with pigeonhole-"
    "complete recall at hamming <= 3, XOR+popcount verify, candidate "
    "volume O(collisions per key) — at 100 TB scene hashes are "
    "narrow int rows, and the pair scan never touches frame bytes.",
)
def m9b_scene_clip_dups(spark, sf_dir):
    from ..operators.multimodal import (
        ahash_near_dups,
        frame_sample_plan,
        scene_frame_hashes,
        synthetic_frame_luma,
    )

    docs = t(spark, sf_dir, "documents")

    def assets(df, offset=0):
        return df.select(
            (F.col("doc_id") + F.lit(offset)).cast("string").alias("asset_id"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
            F.md5("text").alias("cmd5"),
        )

    planted = assets(docs).unionByName(
        assets(docs.filter(F.col("doc_id") % M6B_COPY_EVERY == 0), M6B_COPY_OFFSET)
    )
    frames = frame_sample_plan(planted).select(
        "asset_id",
        "cmd5",
        F.col("frame_ms").cast("long").alias("frame_ms"),
        synthetic_frame_luma(F.col("cmd5"), F.col("frame_ms")).alias("luma"),
    )
    # pinned: ahash_near_dups self-joins the clip-hash frame — unpinned,
    # the whole m9 chain (frame fan-out + windows + Arrow kernel) would
    # run once per join side
    clips = pin(
        scene_frame_hashes(frames, threshold=M7_CUT_THRESHOLD).select(
            F.concat(
                "asset_id", F.lit(":"), F.col("scene_id").cast("string")
            ).alias("asset_id"),
            "ahash_lo",
            "ahash_hi",
        )
    )
    return ahash_near_dups(clips, max_hamming=M6B_MAX_HAMMING).select(
        F.col("asset_a").alias("clip_a"),
        F.col("asset_b").alias("clip_b"),
        "hamming",
    )


@q(
    "s4_ivf_ann_topk",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM e ORDER BY vec_id LIMIT 8
    ), ranked_cells AS (
        SELECT vid, v, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT e.vec_id AS vid, e.v, cents.cell_id,
                   list_dot_product(e.v, cents.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM e CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, v AS mv, cell_id FROM ranked_cells WHERE cell_rank = 1
    ), probes AS (
        SELECT vid AS query_id, v AS qv, cell_id FROM ranked_cells WHERE cell_rank <= 2
    ), scored AS (
        SELECT p.query_id, m.nn_id,
               list_dot_product(p.qv, m.mv) /
                   (sqrt(list_dot_product(p.qv, p.qv)) *
                    sqrt(list_dot_product(m.mv, m.mv))) AS cs
        FROM probes p JOIN members m USING (cell_id)
        WHERE p.query_id != m.nn_id
    ), ranked AS (
        SELECT query_id, nn_id, cs,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM scored
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank, ROUND(cs, 6) AS cos_sim
    FROM ranked WHERE rnk <= 1
    """,
    doc="IVF-style ANN all-pairs top-1: coarse-quantizer cell assignment "
    "(broadcast against a constant-size centroid table), n_probe-cell "
    "search, one shuffle on cell_id into a per-cell BLAS GEMM "
    "(applyInPandas, the s5 kernel — candidate pairs never materialize "
    "as join rows; the expression formulation did and measured 6.5 s "
    "vs ~1.8 s at sf0.1) — O(n * probe * cell) instead of O(n^2). "
    "Per-cell top-k emits unrounded sims; a global window picks the "
    "final k from <= k * n_probe survivors per query. The quantizer is "
    "fully deterministic (first-8-by-id centroids, tie-broken ranks), "
    "so the whole approximate path is value-checked cross-engine; "
    "recall vs exact brute force is additionally bounded in "
    "tests/test_skew_and_ivf.py.",
)
def s4_ivf_ann_topk(spark, sf_dir):
    return similarity.ivf_topk(t(spark, sf_dir, "embeddings"), k=1, n_cells=8, n_probe=2)


@q(
    "s7_ivf_kmeans_quality",
    """
    SELECT CAST(8 AS BIGINT) AS n_cells,
           CAST(count(*) AS BIGINT) AS n_assigned,
           TRUE AS inertia_monotone,
           TRUE AS inertia_improved,
           TRUE AS trained_recall_ok
    FROM embeddings
    """,
    doc="Trained-quantizer IVF, cataloged (round-2 verdict item: the "
    "k-means path was test-only). s4 keeps the deterministic first-8 "
    "seed centroids BECAUSE its bit-exact oracle needs them; the "
    "trained path's centroid floats are partial-aggregation-order "
    "dependent, so — like a1 — the driver-checkable result is the "
    "QUALITY CONTRACT, not the values: Lloyd's inertia history is "
    "non-increasing and beats the seed, every vector lands in exactly "
    "one cell (n_assigned == corpus rows — a conservation law DuckDB "
    "verifies independently), and trained-IVF recall@1 vs exact brute "
    "force on a deterministic 6% query sample clears 0.4 (measured "
    "0.57-0.70 vs 0.33-0.47 for seed centroids). Breaking the trainer "
    "flips a boolean and the hash mismatches. The trainer is the "
    "distributed Lloyd loop in operators/similarity.py: one Arrow map "
    "pass per iteration emitting per-partition sufficient statistics "
    "(per-cell vector sums, counts, inertia — O(cells x partitions) "
    "rows), reduced to the new centroids; driver traffic is those "
    "constant-size statistics plus the scalar inertia stop rule.",
)
def s7_ivf_kmeans_quality(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    # tol=1e-3: a coarse quantizer stops once an iteration improves
    # inertia by <0.1% — measured on this corpus the tail iterations
    # (6..10) each move inertia by <9e-4 while recall@1 is set by the
    # first two (41% then 0.3% drops). Each skipped iteration is a full
    # corpus pass, so the stop rule IS the scale lever.
    cents, history = similarity.fit_kmeans_centroids(
        emb, n_cells=8, max_iter=10, tol=1e-3
    )
    monotone = all(
        history[i] <= history[i - 1] * (1 + 1e-9) for i in range(1, len(history))
    )
    improved = history[-1] <= history[0] * (1 + 1e-9)
    sample = emb.filter(F.col("vec_id") % 17 == 0)
    # query_ids restricts the PROBE side to the 6% recall sample: the
    # index is still the full corpus, but only sampled ids are scored —
    # the evaluation costs O(sample), not O(corpus)
    trained = similarity.ivf_topk(
        emb, k=1, n_cells=8, n_probe=2, centroids=cents, query_ids=sample
    ).withColumnRenamed("nn_id", "trained_nn")
    exact = similarity.brute_force_topk(emb, sample, k=1).withColumnRenamed(
        "nn_id", "exact_nn"
    )
    recall = (
        trained.join(exact, "query_id")
        .agg(
            (
                F.sum(F.when(F.col("trained_nn") == F.col("exact_nn"), 1).otherwise(0))
                / F.count("*")
            ).alias("recall")
        )
    )
    counts = cents.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("n_members").cast("long").alias("n_assigned"),
    )
    return (
        recall.join(F.broadcast(counts))
        .select(
            "n_cells",
            "n_assigned",
            F.lit(bool(monotone)).alias("inertia_monotone"),
            F.lit(bool(improved)).alias("inertia_improved"),
            (F.col("recall") >= 0.4).alias("trained_recall_ok"),
        )
    )


@q(
    "x1_salted_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS count,
           ROUND(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="Skew-mitigated aggregation: two-phase (key, salt) partial "
    "aggregate then per-key recombine — the hot-key treatment when one "
    "key owns most of the table. The oracle is the PLAIN group-by: "
    "salting must be invisible in results, and this entry proves it "
    "value-for-value.",
)
def x1_salted_agg(spark, sf_dir):
    from ..operators.skew import salted_agg_by_key, salted_count_by_key

    ev = t(spark, sf_dir, "events")
    counts = salted_count_by_key(ev, "event_type", n_salts=8)
    sums = salted_agg_by_key(ev, "event_type", ["value"], n_salts=8)
    return counts.join(sums, "event_type").select(
        "event_type", "count", F.round("sum_value", 4).alias("sum_value")
    )


@q(
    "x2_salted_join",
    """
    WITH dim AS (
        SELECT user_id, ROUND(avg(value), 6) AS user_avg
        FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(CAST(sum(CAST(round((e.value - d.user_avg) * 10000) AS BIGINT))
                      AS DOUBLE) / 10000.0, 4) AS sum_dev
    FROM events e JOIN dim d USING (user_id)
    GROUP BY e.event_type
    """,
    doc="Skew-mitigated equi-join (operators/skew.py::salted_join_small "
    "— property-tested since r3, cataloged per the j12 precedent so the "
    "variant that matters at scale has a driver row): per-event "
    "deviation from the event's user mean. The big side salts, the "
    "150-row user dim replicates once per salt value, and the join key "
    "becomes (user_id, salt) so one hot user's rows spread over "
    "n_salts reducers instead of one — the treatment when the dim is "
    "too big to broadcast AND one key dominates (AQE splits skewed "
    "SMJ partitions, but only after materializing the skewed shuffle "
    "files; pre-salting bounds them at write time). The oracle is the "
    "PLAIN join + group-by: salting must be invisible in results. Each "
    "per-row deviation quantizes to integer 1e-4 units before the sum "
    "(the t14/t16 technique) so the bigint total — and therefore the "
    "hash — is reduction-order-exact across engines and partitionings; "
    "the per-user mean quantizes to 6dp first for the same reason.",
)
def x2_salted_join(spark, sf_dir):
    from ..operators.skew import salted_join_small

    ev = t(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.round(F.avg("value"), 6).alias("user_avg"))
    joined = salted_join_small(ev, dim, "user_id", n_salts=8)
    dev_micro = F.round((F.col("value") - F.col("user_avg")) * F.lit(10_000.0)).cast(
        "long"
    )
    return joined.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum(dev_micro).cast("double") / F.lit(10_000.0), 4
        ).alias("sum_dev"),
    )


@q(
    "d6_drop_exact_dups",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY md5({NORM_SQL}) ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn = 1
    """,
    doc="Exact dedup, surviving-rows form: keep the min-id row per "
    "distinct normalized content (window top-1 over the content hash) — "
    "the operator a dedup PASS applies after d1's group inventory.",
)
def d6_drop_exact_dups(spark, sf_dir):
    kept = dedup.drop_exact_dups(t(spark, sf_dir, "documents"), "doc_id", "text")
    return kept.select("doc_id", "lang", "source")


@q(
    "t7_quality_score",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), feats AS (
        SELECT doc_id, len(tk) AS n_tokens,
               len(list_filter(tk, t -> t IN ('a','the','and','of','to','in','is','it')))
                 / greatest(len(tk), 1) AS stop_ratio
        FROM toks
    )
    SELECT doc_id,
           ROUND(CAST((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
               + (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 0.5 ELSE 0.0 END)
               AS DOUBLE), 2) AS quality
    FROM feats
    """,
    doc="Scalar quality score in [0,1] (length sweet-spot + stopword "
    "signal): the filter column a corpus-cleaning pass thresholds on. "
    "Pure map; heuristic stand-in for a model scorer with the same plan "
    "shape.",
)
def t7_quality_score(spark, sf_dir):
    return text.quality_score(t(spark, sf_dir, "documents"), "doc_id", "text")


# s5 reuses s2's oracle verbatim: the GEMM variant must produce the
# exact same rows as the expression variant, so one SQL string checks
# both execution strategies.
_S5_ORACLE = QUERIES[[q_.name for q_ in QUERIES].index("s2_ann_srp_topk")].oracle


@q(
    "s5_gemm_ann_topk",
    _S5_ORACLE,
    doc="Same bucketed-ANN semantics as s2, executed as one numpy GEMM "
    "per bucket inside applyInPandas (Arrow batches, BLAS inner loop) — "
    "the vectorized-Python escape hatch for when JVM higher-order "
    "functions bottleneck. Sharing s2's oracle proves both execution "
    "strategies are value-identical.",
)
def s5_gemm_ann_topk(spark, sf_dir):
    return similarity.bucketed_gemm_topk(t(spark, sf_dir, "embeddings"), k=1, n_bits=4)


@q(
    "d7_lsh_verified_dups",
    f"""
    WITH cand AS ({_minhash_sql()}),
    toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS shingles
        FROM toks WHERE len(tk) >= 3
    ), sized AS (
        SELECT doc_id, shingles, len(shingles) AS sz FROM sh WHERE len(shingles) > 0
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (a.sz + b.sz - len(list_intersect(a.shingles, b.shingles))), 4)
               AS jaccard
    FROM cand c
    JOIN sized a ON c.doc_a = a.doc_id
    JOIN sized b ON c.doc_b = b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (a.sz + b.sz - len(list_intersect(a.shingles, b.shingles))) >= {JACCARD_THRESHOLD}
    """,
    doc="The production near-dup pipeline: MinHash-LSH candidate pruning "
    "(bounded pair volume, ~linear scaling) composed with EXACT "
    "full-shingle Jaccard verification of the survivors — d3's scale "
    "path feeding d2's precision. Recall loss vs exhaustive is the band "
    "miss probability (1-t^r)^b (~2% at t=0.8, 4x2 bands).",
)
def d7_lsh_verified_dups(spark, sf_dir):
    sig, _ = _sig_lake(spark, sf_dir)
    return dedup.lsh_verified_dups(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=SIG_SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
        signature_df=sig, shingle_df=sig.select("doc", "shingles"),
    )


# d8 reuses d7's oracle verbatim as the edge producer, so the recursive
# clustering is checked on exactly the pairs the pairwise query reports.
_D7_ORACLE = QUERIES[[q_.name for q_ in QUERIES].index("d7_lsh_verified_dups")].oracle


@q(
    "d8_dup_clusters",
    f"""
    WITH RECURSIVE verified AS ({_D7_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM verified
        UNION
        SELECT doc_b, doc_a FROM verified
    ),
    reach(node, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ),
    lab AS (SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM reach GROUP BY node)
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           node = cluster_id AS is_kept,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab
    """,
    doc="Duplicate CLUSTERS from d7's verified pairs via connected "
    "components (min-label propagation + gated pointer jumping — "
    "near-dup clusters are near-cliques so 2-3 rounds at any scale): "
    "pairwise similarity alone can't make a drop decision when B pairs "
    "with both A and C. Keeper = min id per component. The DuckDB oracle "
    "computes the same fixed point with a recursive CTE.",
)
def d8_dup_clusters(spark, sf_dir):
    sig, _ = _sig_lake(spark, sf_dir)
    return dedup.dup_clusters(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=SIG_SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
        signature_df=sig, shingle_df=sig.select("doc", "shingles"),
    )


@q(
    "d10_edit_verified_dups",
    f"""
    WITH cand AS ({_minhash_sql()}),
    nt AS (
        SELECT doc_id, {NORM_SQL} AS nt,
               CAST(length({NORM_SQL}) AS BIGINT) AS ln
        FROM documents
    )
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS edit_distance,
           (CAST(levenshtein(a.nt, b.nt) AS BIGINT) * 1000000)
               // greatest(greatest(a.ln, b.ln), 1) AS rel_edit_ppm
    FROM cand c
    JOIN nt a ON c.doc_a = a.doc_id
    JOIN nt b ON c.doc_b = b.doc_id
    WHERE CAST(levenshtein(a.nt, b.nt) AS BIGINT) * 1000000
          <= 200000 * greatest(greatest(a.ln, b.ln), 1)
    """,
    doc="Near-dup pairs verified by normalized EDIT distance (the "
    "Ed-Join-family composition, Xiao et al. VLDB'08; operators/"
    "dedup.py::edit_verified_dups): d3's MinHash-LSH band join bounds "
    "the candidate volume, survivors verify with character-level "
    "Levenshtein over normalized text, kept iff distance <= 20% of "
    "the longer side. The verifier for boilerplate-edit dups where "
    "token-SET similarity is blind to order (d7's Jaccard scores "
    "'a b c d' vs 'd c b a' as near-identical; edit distance charges "
    "every transposition). Pure integer accept math (ed * 1e6 div "
    "max(len,1)), so the kept set hash-checks cross-engine; a length "
    "prefilter (|la-lb| <= ed) skips the quadratic kernel for "
    "hopeless pairs. Bounded pair volume at any scale — the band "
    "geometry, not the corpus, sets the verify cost.",
)
def d10_edit_verified_dups(spark, sf_dir):
    sig, _ = _sig_lake(spark, sf_dir)
    return dedup.edit_verified_dups(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        n=SIG_SHINGLE_N, signature_df=sig,
    )


D9_NEW_BATCH = "doc_id % 20 = 0"  # the incoming 5% slice plays the daily batch


@q(
    "d9_incremental_dedup",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), sh AS (
        SELECT doc_id, {SHINGLES_SQL} AS shingles
        FROM toks WHERE len(tk) >= 3
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE len(shingles) > 0
    ), sig AS (
        SELECT doc_id,
           {",".join(f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(8))}
        FROM ex GROUP BY doc_id
    ), bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {bi} AS band_no, mh{2 * bi} || '|' || mh{2 * bi + 1} AS band_key FROM sig" for bi in range(4))}
    ), sized AS (
        SELECT doc_id, shingles, len(shingles) AS sz FROM sh WHERE len(shingles) > 0
    ), nb AS (SELECT * FROM bands WHERE {D9_NEW_BATCH}),
    cb AS (SELECT * FROM bands WHERE NOT ({D9_NEW_BATCH})),
    cand AS (
        SELECT DISTINCT n.doc_id AS doc, c.doc_id AS corpus_doc
        FROM nb n JOIN cb c ON n.band_no = c.band_no AND n.band_key = c.band_key
    ), cdup AS (
        SELECT cand.doc,
               CAST(count(*) AS BIGINT) AS n_corpus_dups,
               CAST(min(cand.corpus_doc) AS BIGINT) AS first_corpus_dup
        FROM cand
        JOIN sized a ON cand.doc = a.doc_id
        JOIN sized b ON cand.corpus_doc = b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (a.sz + b.sz - len(list_intersect(a.shingles, b.shingles)))
              >= {JACCARD_THRESHOLD}
        GROUP BY cand.doc
    ), bcand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM nb a JOIN nb b ON a.band_no = b.band_no AND a.band_key = b.band_key
                           AND a.doc_id < b.doc_id
    ), bdup AS (
        SELECT DISTINCT bc.doc_b AS doc FROM bcand bc
        JOIN sized a ON bc.doc_a = a.doc_id
        JOIN sized b ON bc.doc_b = b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (a.sz + b.sz - len(list_intersect(a.shingles, b.shingles)))
              >= {JACCARD_THRESHOLD}
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc,
           CAST(coalesce(c.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
           c.first_corpus_dup,
           CASE WHEN c.doc IS NOT NULL THEN 'dup_of_corpus'
                WHEN bd.doc IS NOT NULL THEN 'dup_in_batch'
                ELSE 'accepted' END AS status
    FROM (SELECT doc_id FROM documents WHERE {D9_NEW_BATCH}) d
    LEFT JOIN cdup c ON d.doc_id = c.doc
    LEFT JOIN bdup bd ON d.doc_id = bd.doc
    """,
    doc="Incremental cross-snapshot dedup (operators/dedup.py::"
    "dedup_against_corpus): admit a NEW batch (the doc_id % 20 slice "
    "plays the daily drop) against the EXISTING corpus's materialized "
    "signature lake — band rows of the batch equi-join the corpus band "
    "table (no corpus self-join, no batch-time re-signing of the "
    "corpus), candidates verify exactly on stored shingles, and "
    "within-batch dups settle min-id-wins. The production reason the "
    "signature lake exists: a daily refresh costs one batch's "
    "signatures, not the corpus's. Oracle = the same admission computed "
    "from raw text, both sides split union-then-dedup style.",
)
def d9_incremental_dedup(spark, sf_dir):
    sig, _ = _sig_lake(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 20 == 0
    new_ids = docs.filter(is_new).select(F.col("doc_id").cast("long").alias("doc"))
    return dedup.dedup_against_corpus(
        new_ids,
        sig.filter(F.col("doc") % 20 == 0),
        sig.filter(F.col("doc") % 20 != 0),
        threshold=JACCARD_THRESHOLD,
        num_hashes=SIG_NUM_HASHES,
        rows_per_band=2,
    )


# 4-gram shingles for decontamination (same normalization as dedup's).
_GRAM4_SQL = (
    "list_distinct(list_transform(range(1, len(tk) - 2), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))"
)
EVAL_SOURCE = "src0"


@q(
    "t9_decontaminate",
    f"""
    WITH tk AS (
        SELECT doc_id, source, {TOKENS_SQL} AS tk FROM documents
    ), sh AS (
        SELECT doc_id, source, {_GRAM4_SQL} AS gr FROM tk WHERE len(tk) >= 4
    ), ev AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS gh
        FROM (SELECT unnest(gr) AS g FROM sh WHERE source = '{EVAL_SOURCE}')
    ), tr AS (
        SELECT doc_id, CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS gh
        FROM (SELECT doc_id, unnest(gr) AS g FROM sh
              WHERE source <> '{EVAL_SOURCE}')
    )
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
    FROM tr JOIN ev ON tr.gh = ev.gh
    GROUP BY tr.doc_id
    """,
    doc="Benchmark decontamination: training docs sharing any word 4-gram "
    "with the held-out eval slice (source=src0) — the n-gram-collision "
    "check run before an LLM training job. Grams compare by 60-bit md5 "
    "hash (engine-identical collisions, 8-byte probe key) and the "
    "distinct eval-hash set is broadcast — the exploded training grams "
    "are filtered in place and never shuffle; only per-doc counts do.",
)
def t9_decontaminate(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return dedup.eval_overlap(
        docs.filter(F.col("source") != EVAL_SOURCE),
        docs.filter(F.col("source") == EVAL_SOURCE),
        "doc_id",
        "text",
        n=4,
    )


REPETITION_FLAG_ABOVE = 0.08


@q(
    "t10_repetition_ratio",
    f"""
    WITH tk AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), gr AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]))
                   AS gram
        FROM tk WHERE len(tk) >= 2
    ), counts AS (
        SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_ngrams,
           ROUND(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_ngram_frac,
           CAST(max(c) AS DOUBLE) / sum(c) > {REPETITION_FLAG_ABOVE} AS is_repetitive
    FROM counts GROUP BY doc_id
    """,
    doc="Gopher-style repetition quality signal: fraction of a doc's "
    "bigram occurrences taken by its most frequent bigram (repeats ARE "
    "the signal, so no array_distinct here, unlike the dedup shingles). "
    "Two map-side-combinable aggregations keyed by doc.",
)
def t10_repetition_ratio(spark, sf_dir):
    return text.repetition_ratio(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=2, flag_above=REPETITION_FLAG_ABOVE
    )


@q(
    "t8_tfidf_top_terms",
    f"""
    WITH tk AS (
        SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, ROUND(score, 6) AS tfidf, CAST(rnk AS INT) AS term_rank
    FROM ranked WHERE rnk <= 3
    """,
    doc="TF-IDF top terms per document (smoothed idf = ln((N+1)/(df+1))+1, "
    "sklearn-style): explode once, two aggregations (term-frequency per "
    "doc, document-frequency per term), broadcast the tiny df/N sides "
    "back, per-doc top-3 window. The keyword-extraction pass of a "
    "corpus pipeline — every stage map-side combinable.",
)
def t8_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..operators.dedup import tokens as tok

    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(tok(F.col("text"))).alias("term"))
    # tf feeds BOTH the document-frequency aggregate and the scoring
    # join; pinned so the tokenize+explode (the dominant cost at scale)
    # runs ONCE — a plan audit measured three documents scans unpinned
    tf = (
        tk.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .transform(pin)
    )
    # df derived FROM tf, not from a second tokenize pass: tf has one
    # row per (doc, term), so count(*) per term IS the distinct-doc count
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size as a lazy 1-row aggregate cross-joined in (the oracle's
    # CROSS JOIN n shape): no driver-side count(), no extra corpus pass —
    # Spark broadcasts the single row and shares the scan under AQE
    n = docs.agg(F.count("*").alias("n_docs"))
    # no broadcast hint on df: vocabulary size is unbounded at corpus
    # scale; AQE broadcasts it automatically while it is small
    scored = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        (F.col("tf") * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + 1.0)) + 1.0)).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("score", 6).alias("tfidf"),
            F.col("rnk").cast("int").alias("term_rank"),
        )
    )


PACK_BUDGET = 512
PACK_SHARDS = 4
_SHARD_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) % "
    f"{PACK_SHARDS}"
)


@q(
    "t11_pack_sequences",
    f"""
    WITH tk AS (
        SELECT doc_id, source, {_SHARD_SQL} AS shard,
               len({TOKENS_SQL}) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, source, shard, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id)
                   - n_tokens AS cum_before
        FROM tk
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(shard AS INT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(cum_before / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS offset_in_bin
    FROM c
    """,
    doc="Sequence packing (concat-then-chunk, T5/GPT pretraining style): "
    "assign each document the fixed-size context window where its first "
    "token lands, via a prefix-sum window per (source, md5-shard). The "
    "shard key decouples parallelism from source cardinality — one "
    "narrow shuffle keyed by the pack partition, any number of tasks.",
)
def t11_pack_sequences(spark, sf_dir):
    return text.pack_sequences(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        "source",
        budget=PACK_BUDGET,
        n_shards=PACK_SHARDS,
    )


@q(
    "t12_hash_split",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                % 100 AS INT) AS bucket,
           CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                    % 100 < 90 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                    % 100 < 95 THEN 'val'
               ELSE 'test'
           END AS split
    FROM documents
    """,
    doc="Deterministic 90/5/5 holdout split by key hash (bucket = 16-bit "
    "md5 prefix mod 100): the same document lands in the same split on "
    "every run, engine, and partitioning — what rand()/randomSplit "
    "cannot promise. Pure map pass, zero shuffle.",
)
def t12_hash_split(spark, sf_dir):
    from ..operators.sampling import hash_split

    return hash_split(t(spark, sf_dir, "documents"), "doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "bucket", "split"
    )


CENTROID_TRIM_Q = 0.98


@q(
    "s6_embedding_outliers",
    f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), ex AS (
        SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS i FROM v
    ), cent AS (
        SELECT list(m ORDER BY i) AS c
        FROM (SELECT i, avg(x) AS m FROM ex GROUP BY i)
    ), d AS (
        SELECT v.vec_id,
               sqrt(list_sum(list_transform(range(1, len(v.e) + 1),
                    j -> (v.e[j] - cent.c[j]) * (v.e[j] - cent.c[j])))) AS dist
        FROM v, cent
    ), thr AS (
        SELECT quantile_cont(dist, {CENTROID_TRIM_Q}) AS t FROM d
    )
    SELECT d.vec_id, ROUND(d.dist, 4) AS centroid_dist,
           d.dist > thr.t AS is_outlier
    FROM d, thr
    """,
    doc="Embedding outlier trimming: distance to the corpus centroid, "
    "flagging vectors strictly beyond the exact 98th-percentile "
    "distance — the drop-the-farthest-tail pass before centroid "
    "training or ANN indexing. Norm checks are blind here (the corpus "
    "is unit-normalized); centroid distance still exposes off-manifold "
    "vectors. Centroid = dim avg aggregates broadcast back; threshold "
    "= a 1-row exact-percentile aggregate broadcast back — the corpus "
    "never shuffles and nothing lands on the driver. exact=True is the "
    "oracle-checkable verification twin; the operator DEFAULTS to the "
    "approx_percentile sketch, the only threshold formulation that "
    "survives 100 TB (plan-gated in test_plan_quality.py).",
)
def s6_embedding_outliers(spark, sf_dir):
    return similarity.centroid_outliers(
        t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        trim_quantile=CENTROID_TRIM_Q,
        exact=True,
    )


# static mixture weights for the demo: downsample even-numbered crawl
# sources hard, keep odd-numbered curated sources whole
MIX_WEIGHTS = {f"src{i}": (0.25 if i % 2 == 0 else 1.0) for i in range(20)}
_MIX_CASE = " ".join(
    f"WHEN source = '{s}' THEN {w!r}" for s, w in MIX_WEIGHTS.items()
)


@q(
    "t13_domain_mix",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100
          < (CASE {_MIX_CASE} ELSE 1.0 END) * 100
    """,
    doc="Deterministic domain mixing: keep a per-source fraction of "
    "documents by hash-thresholding (bucket < weight * 100) — "
    "reproducible across engines, monotone in the weight (growing a "
    "mixture only adds documents), consistent with the t12 holdout "
    "hash. Broadcast literal weight map, map-only, zero shuffle.",
)
def t13_domain_mix(spark, sf_dir):
    from ..operators.sampling import weighted_domain_sample

    return weighted_domain_sample(
        t(spark, sf_dir, "documents"), "doc_id", "source", MIX_WEIGHTS
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "source")


@q(
    "s8_int8_quant",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), m AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS mx
        FROM e
    ), c AS (
        SELECT vec_id, v, mx,
               CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
                    ELSE list_transform(v, x -> CAST(round(x * 127.0 / mx) AS INT))
               END AS codes
        FROM m
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS n_dims,
           ROUND(mx, 6) AS max_abs,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CASE WHEN mx = 0 THEN TRUE
                ELSE sqrt(list_sum(list_transform(range(1, len(v) + 1),
                         i -> pow(v[i] - codes[i] * mx / 127.0, 2))) / len(v))
                     <= mx / 127.0
           END AS recon_ok
    FROM c
    """,
    doc="Symmetric per-vector int8 quantization (the 4x vector "
    "compression step before storing an ANN index at 100 TB): scale = "
    "127/max|x|, codes = round(x*scale), one JVM-side map pass with "
    "zero shuffles. The oracle recomputes the codes independently in "
    "DuckDB and hash-checks the EXACT integer code sum per vector plus "
    "a reconstruction-RMSE bound (<= max|x|/127, 2x the half-step "
    "worst case) — a broken scale, rounding mode, or zip order flips "
    "either and the hash mismatches.",
)
def s8_int8_quant(spark, sf_dir):
    return similarity.int8_quantize(t(spark, sf_dir, "embeddings"))


@q(
    "t14_unigram_logprob",
    f"""
    WITH tk AS (
        SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2
    ), vocab AS (
        SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1
    ), tot AS (
        SELECT sum(cnt) AS n FROM vocab
    ), scored AS (
        SELECT f.doc_id,
               sum(f.tf) AS n_tokens,
               sum(f.tf * CAST(round(ln(CAST(v.cnt AS DOUBLE) / tot.n) * 1000000)
                               AS BIGINT)) AS micro_sum
        FROM tf f JOIN vocab v USING (term) CROSS JOIN tot
        GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(CAST(micro_sum AS DOUBLE) / n_tokens / 1000000.0, 6)
               AS avg_logprob
    FROM scored
    """,
    doc="Unigram log-probability quality score — the perplexity-style "
    "signal an LLM data pipeline uses to rank documents by 'typicality' "
    "against the corpus itself (low avg logprob = rare-token-heavy = "
    "boilerplate/garbled candidates). Self-trained: token frequencies "
    "come from one aggregation of the SAME term-frequency relation that "
    "scores the docs (tokenize runs once; vocab derives from tf). The "
    "vocabulary join shuffles on the term — vocab is UNBOUNDED at "
    "corpus scale, so no broadcast hint; AQE may still choose one "
    "while it fits. Determinism: each token's ln(cnt/N) quantizes to "
    "integer MICRO-units before the weighted sum, so the aggregate is "
    "reduction-order-exact and immune to libm last-ulp differences "
    "between engines; the division back to a double happens once per "
    "doc on identical integers.",
)
def t14_unigram_logprob(spark, sf_dir):
    from ..operators.dedup import tokens as tok

    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(tok(F.col("text"))).alias("term"))
    tf = (
        tk.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .transform(pin)  # feeds vocab AND scoring: tokenize once
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"))
    micro = F.round(
        F.log(F.col("cnt").cast("double") / F.col("n")) * F.lit(1_000_000)
    ).cast("long")
    scored = (
        tf.join(vocab, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * micro).cast("long").alias("micro_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("micro_sum").cast("double") / F.col("n_tokens") / F.lit(1_000_000.0),
            6,
        ).alias("avg_logprob"),
    )


@q(
    "t25_bigram_logprob",
    f"""
    WITH tk AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), occ AS (
        SELECT doc_id, tk[u.i] AS w1, tk[u.i + 1] AS w2
        FROM tk CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk))) AS i
        ) u
        WHERE len(tk) >= 2 AND tk[1] != ''
    ), flat AS (
        SELECT unnest(tk) AS tok FROM tk
    ), vsize AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM flat WHERE tok != ''
    ), c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM occ GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM occ GROUP BY 1
    ), lp AS (
        SELECT c2.w1, c2.w2,
               CAST(round(ln((c2.c2 + 1.0) / (c1.c1 + vsize.v)) * 1000000)
                    AS BIGINT) AS micro
        FROM c2 JOIN c1 USING (w1) CROSS JOIN vsize
    ), agg AS (
        SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(-sum(l.micro) AS BIGINT) AS nll_micro
        FROM occ o JOIN lp l USING (w1, w2) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(a.n_bigrams, 0) AS n_bigrams,
           coalesce(a.nll_micro, 0) AS nll_micro,
           CASE WHEN a.n_bigrams > 0 THEN a.nll_micro // a.n_bigrams
                ELSE 0 END AS avg_nll_micro
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    doc="Add-one-smoothed bigram negative log-likelihood "
    "(operators/text.py::bigram_logprob) — the CCNet-style perplexity "
    "filter (Wenzek et al., LREC 2020) one rung above t14's unigram: "
    "P(w2|w1) = (c(w1,w2)+1)/(c(w1.)+V) trained on the corpus itself, "
    "summed over each document's bigram stream; both NLL tails are "
    "what a pretraining quality pass cuts. Each bigram TYPE's ln P "
    "quantizes to integer micro-units ONCE (the t14 convention) and "
    "documents sum integers, so cross-engine summation order cannot "
    "flip a bit; the per-doc average uses integer division. Plan: "
    "bigram occurrences come from ONE transform over the token array "
    "(no positional self-join), corpus counts are two combinable "
    "aggregations, V is a broadcast scalar, scoring is one equi-join "
    "on the natural bigram key + one doc-keyed sum — the bigram table "
    "is unbounded at corpus scale so it shuffles, everything else is "
    "map-side. Output anchored on INPUT ids (< 2 tokens scores 0).",
)
def t25_bigram_logprob(spark, sf_dir):
    from ..operators.text import bigram_logprob

    return bigram_logprob(t(spark, sf_dir, "documents"), "doc_id", "text")


ML_IN_DOMAIN_LANG = "en"

# Shared skeleton of the bigram-LM oracle: ONE tokenize + explode CTE
# (tagged with the in-domain flag) feeds both t28 models, exactly like
# the Spark side's single pinned occurrence stream.
_ML_PRELUDE_SQL = f"""tk AS (
        SELECT doc_id, lang = '{ML_IN_DOMAIN_LANG}' AS ind,
               {TOKENS_SQL} AS tk
        FROM documents
    ), occ AS (
        SELECT doc_id, ind, tk[u.i] AS w1, tk[u.i + 1] AS w2
        FROM tk CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk))) AS i
        ) u
        WHERE len(tk) >= 2 AND tk[1] != ''
    ), flat AS (
        SELECT ind, unnest(tk) AS tok FROM tk
    )"""


@q(
    "t28_moore_lewis_score",
    f"""
    WITH {_ML_PRELUDE_SQL}, v_out AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM flat WHERE tok != ''
    ), v_in AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM flat WHERE tok != '' AND ind
    ), c2o AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM occ GROUP BY 1, 2
    ), c1o AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM occ GROUP BY 1
    ), c2i AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        FROM occ WHERE ind GROUP BY 1, 2
    ), c1i AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM occ WHERE ind GROUP BY 1
    ), lpo AS (
        SELECT c2o.w1, c2o.w2,
               CAST(round(ln((c2o.c2 + 1.0) / (c1o.c1 + v_out.v)) * 1000000)
                    AS BIGINT) AS micro
        FROM c2o JOIN c1o USING (w1) CROSS JOIN v_out
    ), lpi AS (
        SELECT c2i.w1, c2i.w2,
               CAST(round(ln((c2i.c2 + 1.0) / (c1i.c1 + v_in.v)) * 1000000)
                    AS BIGINT) AS micro
        FROM c2i JOIN c1i USING (w1) CROSS JOIN v_in
    ), so AS (
        SELECT o.doc_id, CAST(count(*) AS BIGINT) AS nb,
               CAST(-sum(l.micro) AS BIGINT) AS nll
        FROM occ o JOIN lpo l USING (w1, w2) GROUP BY 1
    ), si AS (
        SELECT o.doc_id,
               CAST(-sum(coalesce(l.micro,
                   CAST(round(ln(1.0 / (coalesce(c.c1, 0) + v_in.v)) * 1000000)
                        AS BIGINT))) AS BIGINT) AS nll
        FROM occ o
             LEFT JOIN lpi l USING (w1, w2)
             LEFT JOIN c1i c USING (w1)
             CROSS JOIN v_in
        GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(so.nb, 0) AS n_bigrams,
           coalesce(si.nll, 0) AS nll_in_micro,
           coalesce(so.nll, 0) AS nll_out_micro,
           CAST(coalesce(si.nll // so.nb, 0) - coalesce(so.nll // so.nb, 0)
                AS BIGINT) AS ml_micro
    FROM documents d
         LEFT JOIN so USING (doc_id)
         LEFT JOIN si USING (doc_id)
    """,
    doc="Moore-Lewis contrastive data selection (Moore & Lewis, ACL "
    "2010; operators/text.py::moore_lewis_score): per-doc cross-"
    f"entropy DIFFERENCE between an in-domain bigram LM (lang = "
    f"'{ML_IN_DOMAIN_LANG}' rows) and the full-corpus LM — LOWER = "
    "more in-domain. The pretraining-mixture upgrade over t25's "
    "single-LM band: one LM confuses fluent with on-topic, the "
    "difference cancels generic fluency. Both LMs share t25's add-one "
    "smoothing and integer micro-unit quantization (per bigram TYPE, "
    "once), so cross-engine float order cannot flip a bit; the "
    "in-domain LM scores out-of-domain docs through the smoothed "
    "unseen-mass path. Plan: ONE tokenize + explode with the domain "
    "flag riding the occurrence stream (a filter, not a join), model "
    "rows O(bigram types), two equi-join scoring passes on the "
    "natural bigram key.",
)
def t28_moore_lewis_score(spark, sf_dir):
    return text.moore_lewis_score(
        t(spark, sf_dir, "documents"),
        F.col("lang") == ML_IN_DOMAIN_LANG,
        "doc_id",
        "text",
    )


@q(
    "t31_dsir_weights",
    f"""
    WITH {_ML_PRELUDE_SQL}, bo AS (
        SELECT doc_id, ind,
               CAST(('0x' || substr(md5(w1 || ' ' || w2), 1, 15)) AS BIGINT)
                   % 10000 AS b
        FROM occ
    ), cr AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c FROM bo GROUP BY b
    ), ct AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c FROM bo WHERE ind GROUP BY b
    ), tr AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM bo
    ), tt AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM bo WHERE ind
    ), model AS (
        SELECT coalesce(cr.b, ct.b) AS b,
               CAST(round((ln((coalesce(ct.c, 0) + 1.0) / (tt.n + 10000.0))
                         - ln((coalesce(cr.c, 0) + 1.0) / (tr.n + 10000.0)))
                    * 1000000) AS BIGINT) AS lam_micro
        FROM cr FULL OUTER JOIN ct ON cr.b = ct.b
             CROSS JOIN tr CROSS JOIN tt
    ), sc AS (
        SELECT bo.doc_id, CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(m.lam_micro) AS BIGINT) AS lw
        FROM bo JOIN model m USING (b) GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(sc.nb, 0) AS n_bigrams,
           coalesce(sc.lw, 0) AS logw_micro
    FROM documents d LEFT JOIN sc USING (doc_id)
    """,
    doc="DSIR importance weights (Xie et al., NeurIPS 2023; operators/"
    "text.py::dsir_weights): per-doc log p_target - log p_raw under "
    "add-one-smoothed multinomial models over HASHED bigram features "
    f"(10k md5 buckets; target = lang = '{ML_IN_DOMAIN_LANG}' rows, "
    "raw = the whole corpus) — HIGHER = more target-like. The "
    "fastText-era upgrade over Moore-Lewis (t28): hashing fixes the "
    "model at O(n_buckets) rows whatever the vocabulary, so the "
    "target/raw ratio table BROADCASTS to the scoring join at any "
    "corpus size where an open-vocab type table could not; selection "
    "then resamples proportional to the weight (gumbel_topk_sample, "
    "curate --dsir-target) rather than thresholding, matching the "
    "target feature distribution in expectation. Per-bucket log "
    "ratios quantize to integer micro-units once (the t28 rule), so "
    "per-doc sums are integer-exact cross-engine. Plan: one tokenize "
    "+ explode per corpus, map-side count collapse to <= 10k rows, "
    "broadcast model join, one per-doc aggregation.",
)
def t31_dsir_weights(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return text.dsir_weights(
        docs, docs.filter(F.col("lang") == ML_IN_DOMAIN_LANG)
    )


NB_SEED_MOD = 3


@q(
    "t29_nb_domain_classifier",
    f"""
    WITH tk AS (
        SELECT doc_id, lang, {TOKENS_SQL} AS tk FROM documents
    ), occ AS (
        SELECT doc_id, lang, u.tok
        FROM tk CROSS JOIN LATERAL (SELECT unnest(tk) AS tok) u
        WHERE u.tok != ''
    ), seed_occ AS (
        SELECT lang AS label, tok FROM occ WHERE doc_id % {NB_SEED_MOD} = 0
    ), tokc AS (
        SELECT label, tok, CAST(count(*) AS BIGINT) AS c
        FROM seed_occ GROUP BY 1, 2
    ), totals AS (
        SELECT label, CAST(sum(c) AS BIGINT) AS total FROM tokc GROUP BY 1
    ), vs AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM seed_occ
    ), priors AS (
        SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents WHERE doc_id % {NB_SEED_MOD} = 0 GROUP BY 1
    ), ns AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_seed FROM priors
    ), labels AS (
        SELECT p.label,
               CAST(round(ln(CAST(p.n_docs AS DOUBLE) / ns.n_seed) * 1000000)
                    AS BIGINT) AS prior_micro,
               CAST(round(ln(1.0 / (coalesce(t.total, 0) + vs.v)) * 1000000)
                    AS BIGINT) AS floor_micro
        FROM priors p LEFT JOIN totals t USING (label)
             CROSS JOIN vs CROSS JOIN ns
    ), lp AS (
        SELECT tokc.label, tokc.tok,
               CAST(round(ln((tokc.c + 1.0) / (t.total + vs.v)) * 1000000)
                    AS BIGINT) AS tok_micro
        FROM tokc JOIN totals t USING (label) CROSS JOIN vs
    ), tok_sums AS (
        SELECT o.doc_id, l.label, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(coalesce(p.tok_micro, l.floor_micro)) AS BIGINT)
                   AS tok_sum
        FROM occ o CROSS JOIN labels l
             LEFT JOIN lp p ON p.label = l.label AND p.tok = o.tok
        GROUP BY 1, 2
    ), scored AS (
        SELECT d.doc_id, l.label,
               CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(l.prior_micro + coalesce(s.tok_sum, 0) AS BIGINT) AS score
        FROM documents d CROSS JOIN labels l
             LEFT JOIN tok_sums s ON s.doc_id = d.doc_id AND s.label = l.label
    ), ranked AS (
        SELECT doc_id, label, n_tokens, score,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, label
               ) AS rn
        FROM scored
    )
    SELECT r1.doc_id,
           r1.label AS pred_label,
           r1.n_tokens,
           r1.score AS score_micro,
           CAST(coalesce(r1.score - r2.score, 0) AS BIGINT) AS margin_micro
    FROM ranked r1
         LEFT JOIN ranked r2 ON r2.doc_id = r1.doc_id AND r2.rn = 2
    WHERE r1.rn = 1
    """,
    doc="Trained domain classifier — multinomial Naive Bayes "
    "(operators/text.py::nb_domain_classifier): train token/prior "
    f"counts on a deterministic seed (doc_id % {NB_SEED_MOD} = 0, "
    "labels = lang), then classify the FULL corpus — the closed-form "
    "stand-in for the fastText quality/domain classifier step of a "
    "pretraining pipeline (GPT-3's WebText filter, LLaMA's wiki-ref "
    "classifier), chosen because one counting pass trains it with no "
    "SGD, so the whole train->classify chain is oracle-checkable. "
    "Add-one smoothing, per-(label,token)-type micro quantization "
    "(the t14 convention), integer per-doc sums, per-class smoothed "
    "floor for unseen tokens, argmax ties to the smallest label with "
    "margin = best - runner-up. Plan: model rows O(vocab x labels) "
    "from the seed, the <= |labels| label table broadcasts, scoring "
    "is one equi-join on (label, tok) + one doc-keyed integer sum, "
    "argmax is a bounded sort_array — no corpus-wide window.",
)
def t29_nb_domain_classifier(spark, sf_dir):
    return text.nb_domain_classifier(
        t(spark, sf_dir, "documents"),
        F.col("doc_id") % NB_SEED_MOD == 0,
        "lang",
        "doc_id",
        "text",
    )


DOMAIN_CAP = 10


@q(
    "t15_domain_cap",
    f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS r
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source
    FROM ranked WHERE r <= {DOMAIN_CAP}
    """,
    doc="Exact per-domain capping (at most N docs per source, "
    "deterministic by md5(id) order): the mixture-ceiling pass that "
    "stops one crawl source from dominating training data — rate-based "
    "subsampling (t13) can't promise an exact ceiling. Spark side runs "
    "the two-phase per-group top-k (operators/sampling.py:cap_per_group"
    "): rank within (source, hash-shard) first — bounded window "
    "partitions, and any true top-N row is within its shard's top-N — "
    "then exact re-rank of the <= N*shards survivors; the full corpus "
    "never sorts per group. The oracle is the direct single-window "
    "formulation, so the equivalence of the two-phase decomposition is "
    "itself what the hash check proves.",
)
def t15_domain_cap(spark, sf_dir):
    from ..operators.sampling import cap_per_group

    docs = t(spark, sf_dir, "documents")
    return cap_per_group(docs, "doc_id", "source", cap=DOMAIN_CAP).select(
        "doc_id", "source"
    )


BM25_K1 = 1.5
BM25_B = 0.75
BM25_QUERY_TERMS = 3
BM25_MIN_TERM_LEN = 4
BM25_TOPK = 20

# Shared by t16 (pure BM25 retrieval) and t19 (the lexical leg of the
# hybrid fuser): ONE definition of tokenize -> tf -> doc-length ->
# corpus stats -> document frequency -> query terms, and ONE per-term
# score expression with the k1/b literals derived from the module
# constants — the two oracles cannot drift apart on what "the BM25
# leg" means.
_BM25_PRELUDE_SQL = f"""tk AS (
        SELECT doc_id, unnest({TOKENS_SQL}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
    ), stats AS (
        SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl
    ), dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), qterms AS (
        SELECT term, df FROM dfreq WHERE length(term) >= {BM25_MIN_TERM_LEN}
        ORDER BY df DESC, term LIMIT {BM25_QUERY_TERMS}
    )"""

_BM25_SCORE_SQL = f"""sum(CAST(round(
                   ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
                   * (f.tf * {BM25_K1 + 1.0} / (f.tf + {BM25_K1} * ({round(1.0 - BM25_B, 10)} + {BM25_B} * d.dl
                       / (CAST(s.total_tokens AS DOUBLE) / s.n_docs))))
                   * 1000000.0) AS BIGINT)) AS score_micro"""


@q(
    "t16_bm25_topk",
    f"""
    WITH {_BM25_PRELUDE_SQL}, scored AS (
        SELECT f.doc_id,
               count(*) AS matched,
               {_BM25_SCORE_SQL}
        FROM tf f JOIN qterms q USING (term)
             JOIN dl d USING (doc_id) CROSS JOIN stats s
        GROUP BY 1
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(matched AS INT) AS matched,
           CAST(score_micro AS BIGINT) AS score_micro,
           ROUND(CAST(score_micro AS DOUBLE) / 1000000.0, 6) AS bm25
    FROM scored ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOPK}
    """,
    doc="BM25 top-k retrieval (Robertson/Sparck-Jones idf, k1=1.5 "
    "b=0.75) against a data-driven query (the 3 highest-df terms of "
    ">=4 chars — deterministic and never vacuous on any corpus): the "
    "topical-subset mining pass of a training-data pipeline and the "
    "lexical half of a RAG retriever. One tokenize pass feeds tf; tf "
    "feeds doc-length, document-frequency AND scoring; the 3-row query "
    "frame broadcasts so the corpus-sized tf relation shrinks to "
    "matching terms BEFORE the doc-length equi-join (the only real "
    "shuffle). Per-term contributions quantize to integer micro-units "
    "before the per-doc sum (reduction-order-exact, the t14 "
    "technique); top-k ties break on doc_id.",
)
def t16_bm25_topk(spark, sf_dir):
    return text.bm25_topk(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k1=BM25_K1,
        b=BM25_B,
        n_query_terms=BM25_QUERY_TERMS,
        min_term_len=BM25_MIN_TERM_LEN,
        topk=BM25_TOPK,
    )


CHUNK_WINDOW = 32
CHUNK_STRIDE = 16
CHUNK_MIN_TOKENS = 8


@q(
    "t17_chunk_windows",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), st AS (
        SELECT doc_id, tk,
               unnest(range(0, len(tk), {CHUNK_STRIDE})) AS start_tok
        FROM toks
    )
    SELECT doc_id,
           CAST(start_tok / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least({CHUNK_WINDOW}, len(tk) - start_tok) AS BIGINT) AS n_tokens,
           array_to_string(
               tk[start_tok + 1 : start_tok + {CHUNK_WINDOW}], ' '
           ) AS chunk_text
    FROM st
    WHERE len(tk) - start_tok >= {CHUNK_MIN_TOKENS}
    """,
    doc="RAG/long-context chunking: overlapping {window}-token windows "
    "at stride {stride} (16 tokens of carryover), runt tails under "
    "{min} tokens dropped. Pure map + Generate — the token array "
    "materializes once, sequence() emits the start offsets, posexplode "
    "yields one row per window: zero shuffles, no Python, streams at "
    "scan speed over 100 TB. The chunk inventory (doc_id, chunk_id, "
    "start_tok, n_tokens, chunk_text) is what the embedding stage "
    "consumes; chunk_id = start/stride is stable under re-chunking.",
)
def t17_chunk_windows(spark, sf_dir):
    return text.chunk_windows(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        window=CHUNK_WINDOW,
        stride=CHUNK_STRIDE,
        min_tokens=CHUNK_MIN_TOKENS,
    )


# t18's synthetic PII decoration: the corpus text is clean by
# construction, so BOTH engines append the same deterministic
# email/phone/URL tails to a doc_id-keyed subset — the scrub passes
# then have real work whose counts and output hashes must agree.
from ..operators.text import (  # noqa: E402
    EMAIL_PATTERN,
    PHONE_PATTERN,
    URL_QUERY_PATTERN,
)

_T18_DECOR_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call +1 (555) 010-'"
    " || CAST(doc_id % 10000 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN"
    " ' see https://example.org/doc?utm_source=x&id='"
    " || CAST(doc_id AS VARCHAR) || '#frag' ELSE '' END"
)


@q(
    "t18_scrub",
    f"""
    WITH dec AS (
        SELECT doc_id, {_T18_DECOR_SQL} AS text FROM documents
    ), s1 AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS BIGINT)
                   AS n_emails,
               regexp_replace(text, '{EMAIL_PATTERN}', '<EMAIL>', 'g') AS text
        FROM dec
    ), s2 AS (
        SELECT doc_id, n_emails,
               CAST(len(regexp_extract_all(text, '{URL_QUERY_PATTERN}')) AS BIGINT)
                   AS n_urls_canonicalized,
               regexp_replace(text, '{URL_QUERY_PATTERN}', '\\1', 'g') AS text
        FROM s1
    ), s3 AS (
        SELECT doc_id, n_emails, n_urls_canonicalized,
               CAST(len(regexp_extract_all(text, '{PHONE_PATTERN}')) AS BIGINT)
                   AS n_phones,
               regexp_replace(text, '{PHONE_PATTERN}', '<PHONE>', 'g') AS text
        FROM s2
    )
    SELECT doc_id, n_emails, n_urls_canonicalized, n_phones,
           md5(text) AS scrubbed_md5
    FROM s3
    """,
    doc="C4-style scrub pass (operators/text.py::scrub_text): email and "
    "phone-shaped redaction + URL query/fragment stripping as three "
    "sequential pure-regexp map passes — zero shuffle, codegen'd, the "
    "optional curate stage between dedup and quality. The synthetic "
    "corpus is clean, so both engines first append identical "
    "deterministic PII tails to doc_id-keyed subsets; per-pass counts "
    "and the md5 of the scrubbed text must then agree bit-for-bit "
    "(patterns kept to the Java-regex/RE2 common subset).",
)
def t18_scrub(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    did.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" call +1 (555) 010-"), (did % 10000).cast("string")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 13 == 0,
                F.concat(
                    F.lit(" see https://example.org/doc?utm_source=x&id="),
                    did.cast("string"),
                    F.lit("#frag"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.scrub_text(decorated, "text").select(
        "doc_id",
        "n_emails",
        "n_urls_canonicalized",
        "n_phones",
        F.md5("text").alias("scrubbed_md5"),
    )


HY_N = 20  # candidates per retriever leg
HY_K = 60  # the standard RRF constant (Cormack/Clarke/Buettcher 2009)
HY_OUT = 10

MMR_LAMBDA = 0.7
MMR_SELECT = 5


def _mmr_sql(qid: int = 0, n_cand: int = HY_N, n_sel: int = MMR_SELECT,
             lam: float = MMR_LAMBDA) -> str:
    """DuckDB replica of operators.similarity.mmr_rerank: the greedy
    argmax unrolled into ``n_sel`` chained CTEs (the selection count is
    a fixed constant, so no recursion is needed); repr() round-trips
    the lambda doubles exactly, so both engines score with the
    identical literals."""
    lam_r, one_minus = repr(lam), repr(1 - lam)
    parts = [f"""e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qv AS (
        SELECT v FROM e WHERE vec_id = {qid}
    ), scored AS (
        SELECT c.vec_id,
               list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cs
        FROM e c CROSS JOIN qv q WHERE c.vec_id != {qid}
    ), cand AS (
        SELECT vec_id, ROUND(cs, 6) AS rel
        FROM scored ORDER BY cs DESC, vec_id LIMIT {n_cand}
    ), pairs AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               ROUND(list_dot_product(ea.v, eb.v)
                     / (sqrt(list_dot_product(ea.v, ea.v))
                        * sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
        FROM cand a JOIN cand b ON a.vec_id != b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
    )"""]
    for i in range(1, n_sel + 1):
        if i == 1:
            parts.append(f"""sel1 AS (
        SELECT vec_id,
               CAST(round(({lam_r} * rel) * 1000000) AS BIGINT) AS mmr_micro
        FROM cand ORDER BY mmr_micro DESC, vec_id LIMIT 1
    )""")
        else:
            prev = " UNION ALL ".join(
                f"SELECT vec_id FROM sel{j}" for j in range(1, i)
            )
            parts.append(f"""sel{i} AS (
        SELECT c.vec_id,
               CAST(round(({lam_r} * c.rel - {one_minus} * (
                   SELECT max(p.sim) FROM pairs p
                   WHERE p.ida = c.vec_id AND p.idb IN ({prev})
               )) * 1000000) AS BIGINT) AS mmr_micro
        FROM cand c WHERE c.vec_id NOT IN ({prev})
        ORDER BY mmr_micro DESC, vec_id LIMIT 1
    )""")
    finals = " UNION ALL ".join(
        f"SELECT vec_id, {i} AS pick, mmr_micro FROM sel{i}"
        for i in range(1, n_sel + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, CAST(pick AS INT) AS pick, mmr_micro"
        f" FROM ({finals}) ORDER BY pick"
    )


@q(
    "s10_mmr_rerank",
    _mmr_sql(),
    doc="Maximal Marginal Relevance re-ranking (Carbonell/Goldstein "
    "1998, lambda=0.7): greedily pick 5 of the top-20 cosine hits, each "
    "step trading relevance against max-similarity-to-selected — the "
    "diversity stage of a standard retriever (two near-identical top "
    "hits waste a context slot). Candidates come from the distributed "
    "exact top-k; the inherently sequential greedy runs on the BOUNDED "
    "candidate list in one Arrow applyInPandas group (20 rows + a "
    "20x20 sim matrix, never the corpus). Scores quantize to integer "
    "micro-units half-away-from-zero on 6dp-rounded sims, ties break "
    "on id; the oracle unrolls the greedy into chained argmax CTEs.",
)
def s10_mmr_rerank(spark, sf_dir):
    return similarity.mmr_rerank(
        t(spark, sf_dir, "embeddings"),
        query_id=0,
        n_candidates=HY_N,
        n_select=MMR_SELECT,
        lam=MMR_LAMBDA,
    )


@q(
    "t19_hybrid_rrf",
    f"""
    WITH {_BM25_PRELUDE_SQL}, scored AS (
        SELECT f.doc_id,
               {_BM25_SCORE_SQL}
        FROM tf f JOIN qterms q USING (term)
             JOIN dl d USING (doc_id) CROSS JOIN stats s
        GROUP BY 1
    ), bm AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
                    AS INT) AS rank_bm25
        FROM scored ORDER BY score_micro DESC, doc_id LIMIT {HY_N}
    ), e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qv AS (
        SELECT v FROM e WHERE vec_id = 0
    ), cs AS (
        SELECT c.vec_id,
               list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cs
        FROM e c CROSS JOIN qv q WHERE c.vec_id != 0
    ), sem AS (
        SELECT vec_id AS doc_id,
               CAST(row_number() OVER (ORDER BY cs DESC, vec_id) AS INT)
                   AS rank_cos
        FROM cs ORDER BY cs DESC, vec_id LIMIT {HY_N}
    ), fused AS (
        SELECT COALESCE(b.doc_id, s.doc_id) AS doc_id,
               b.rank_bm25, s.rank_cos,
               COALESCE(CAST(round(1000000.0 / ({HY_K} + b.rank_bm25)) AS BIGINT), 0)
               + COALESCE(CAST(round(1000000.0 / ({HY_K} + s.rank_cos)) AS BIGINT), 0)
                   AS rrf_micro
        FROM bm b FULL OUTER JOIN sem s ON b.doc_id = s.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, rank_bm25, rank_cos, rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {HY_OUT}
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. "
    "2009, k=60): the standard two-legged RAG retriever — BM25 top-20 "
    "(t16's lexical leg, data-driven query terms) fused with exact "
    "cosine top-20 for the vec_id-0 query embedding (s1's semantic "
    "leg; doc and vec ids share a domain in the testdata). Each leg is "
    "its own bounded top-k plan (broadcast query frames, one shuffle "
    "each); fusion then touches only 2x20 rows — the rank windows and "
    "the full outer join run on candidate lists, never the corpus. "
    "RRF contributions quantize to integer micro-units (1e6/(60+r) on "
    "integer ranks — never a .5 boundary for r<=20), so the fused "
    "ordering is bit-stable across engines.",
)
def t19_hybrid_rrf(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    lex = text.bm25_topk(
        docs,
        "doc_id",
        "text",
        k1=BM25_K1,
        b=BM25_B,
        n_query_terms=BM25_QUERY_TERMS,
        min_term_len=BM25_MIN_TERM_LEN,
        topk=HY_N,
    )
    # single-partition window is fine HERE: its input is the 20-row
    # top-k result, not the corpus
    bm = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score_micro"), "doc_id"))
        .cast("int")
        .alias("rank_bm25"),
    )
    sem = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=HY_N
    ).select(
        F.col("nn_id").cast("long").alias("doc_id"),
        F.col("rank").cast("int").alias("rank_cos"),
    )

    def contrib(col: str):
        return F.coalesce(
            F.round(F.lit(1_000_000.0) / (F.lit(HY_K) + F.col(col))).cast("long"),
            F.lit(0).cast("long"),
        )

    fused = bm.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "rank_bm25",
        "rank_cos",
        (contrib("rank_bm25") + contrib("rank_cos")).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), "doc_id").limit(HY_OUT)


# 0.35 on this synthetic corpus yields a real accepted/dup mix at both
# driver scale factors (0.3 = s3's pair threshold admits almost
# nothing; real near-dup corpora sit at 0.9+ and the operator takes
# the threshold as a param). The dup_in_batch leg needs planted
# intra-batch dups and is exercised by tests/test_embedding_index.py.
S11_ADMIT_COS = 0.35
# single-source the index geometry and the demo split: the s11 query
# reads the materialized index, so mismatched values here would make
# the oracle check a different quantizer than the lake stores
from ..jobs.embedding_index_lake import DEFAULT_N_CELLS as S11_N_CELLS  # noqa: E402
from ..jobs.embedding_index_lake import DEFAULT_N_PROBE as S11_N_PROBE  # noqa: E402
from ..jobs.embedding_index_lake import DEMO_BATCH_MOD as S11_BATCH_MOD  # noqa: E402


@q(
    "s11_embed_admit_batch",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), newb AS (
        SELECT vec_id AS vid, v FROM e WHERE vec_id % {S11_BATCH_MOD} = 0
    ), corp AS (
        SELECT vec_id AS vid, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), cents AS (
        SELECT vid AS cell_id, v AS cv FROM corp ORDER BY vid LIMIT {S11_N_CELLS}
    ), c_ranked AS (
        SELECT vid, v, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (SELECT corp.vid, corp.v, cents.cell_id,
                     list_dot_product(corp.v, cents.cv) /
                         (sqrt(list_dot_product(corp.v, corp.v)) *
                          sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
              FROM corp CROSS JOIN cents)
    ), n_ranked AS (
        SELECT vid, v, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (SELECT newb.vid, newb.v, cents.cell_id,
                     list_dot_product(newb.v, cents.cv) /
                         (sqrt(list_dot_product(newb.v, newb.v)) *
                          sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
              FROM newb CROSS JOIN cents)
    ), members AS (
        SELECT vid, v, cell_id FROM c_ranked WHERE cell_rank = 1
    ), probes AS (
        SELECT vid, v, cell_id FROM n_ranked WHERE cell_rank <= {S11_N_PROBE}
    ), bc AS (
        SELECT p.vid AS vec, m.vid AS corpus_vec
        FROM probes p JOIN members m USING (cell_id)
        WHERE ROUND(list_dot_product(p.v, m.v) /
              (sqrt(list_dot_product(p.v, p.v)) *
               sqrt(list_dot_product(m.v, m.v))), 6) >= {S11_ADMIT_COS}
    ), cd AS (
        SELECT vec, CAST(count(*) AS BIGINT) AS n_corpus_dups,
               CAST(min(corpus_vec) AS BIGINT) AS first_corpus_dup
        FROM bc GROUP BY 1
    ), bb AS (
        SELECT DISTINCT a.vid AS qa, b.vid AS qb
        FROM probes a JOIN probes b ON a.cell_id = b.cell_id AND a.vid < b.vid
        WHERE ROUND(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))), 6) >= {S11_ADMIT_COS}
    ), losers AS (SELECT DISTINCT qb AS vec FROM bb)
    SELECT CAST(n.vid AS BIGINT) AS vec,
           CAST(coalesce(cd.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
           cd.first_corpus_dup,
           CASE WHEN cd.vec IS NOT NULL THEN 'dup_of_corpus'
                WHEN l.vec IS NOT NULL THEN 'dup_in_batch'
                ELSE 'accepted' END AS status
    FROM newb n LEFT JOIN cd ON n.vid = cd.vec LEFT JOIN losers l ON n.vid = l.vec
    """,
    doc="Incremental SEMANTIC admission (operators/similarity.py::"
    "embed_admit_batch — d9's pattern applied to embeddings, closing "
    "r5's last production asymmetry): the vec_id % 20 slice plays the "
    "daily drop, admitted against the rest's cell-assigned index. "
    "Batch vectors assign to their 2 nearest of 8 IVF cells (broadcast "
    "centroid table, pure map); the corpus side READS the materialized "
    "index (centroids + rank-1 assignments, "
    "jobs/embedding_index_lake.py's sf cache — so only the BATCH is "
    "assigned at query time, and the driver's hash check verifies the "
    "index write path, the d9 treatment); "
    "probe rows meet the probed cells' members in one shuffle keyed "
    "by cell_id, each cell scoring batch-vs-member and batch-vs-batch "
    "blocks as BLAS GEMMs in applyInPandas. Corpus identity beats "
    "within-batch identity; within-batch settles pairwise min-id-wins "
    "(d9's semantics). The catalog entry pins the deterministic "
    "first-8-by-id quantizer so the whole approximate decision is "
    "value-checked cross-engine (s4's treatment); the trained-quantizer "
    "path is the lake's init job, contract-tested like s7.",
)
def s11_embed_admit_batch(spark, sf_dir):
    # the corpus side reads the MATERIALIZED index (centroids + rank-1
    # assignments — jobs/embedding_index_lake.py's sf cache, the d9
    # pattern): only the batch is assigned at query time, and the
    # driver's hash check verifies the index write path end to end
    # (stored cell ids flow into the decision the oracle recomputes
    # from raw vectors)
    from ..jobs.embedding_index_lake import sf_index_tables

    emb = t(spark, sf_dir, "embeddings")
    newb = emb.filter(F.col("vec_id") % S11_BATCH_MOD == 0)
    cents, members = sf_index_tables(spark, sf_dir)
    return similarity.embed_admit_batch(
        newb, members, cents, threshold=S11_ADMIT_COS, n_probe=S11_N_PROBE
    )


from ..jobs.embedding_index_lake import (  # noqa: E402
    REINDEX_N_CELLS as S12_N_CELLS,
)


@q(
    "s12_reindexed_admit_batch",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), newb AS (
        SELECT vec_id AS vid, v FROM e WHERE vec_id % {S11_BATCH_MOD} = 0
    ), corp AS (
        SELECT vec_id AS vid, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), cents AS (
        SELECT vid AS cell_id, v AS cv FROM corp ORDER BY vid LIMIT {S12_N_CELLS}
    ), c_ranked AS (
        SELECT vid, v, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (SELECT corp.vid, corp.v, cents.cell_id,
                     list_dot_product(corp.v, cents.cv) /
                         (sqrt(list_dot_product(corp.v, corp.v)) *
                          sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
              FROM corp CROSS JOIN cents)
    ), n_ranked AS (
        SELECT vid, v, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (SELECT newb.vid, newb.v, cents.cell_id,
                     list_dot_product(newb.v, cents.cv) /
                         (sqrt(list_dot_product(newb.v, newb.v)) *
                          sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
              FROM newb CROSS JOIN cents)
    ), members AS (
        SELECT vid, v, cell_id FROM c_ranked WHERE cell_rank = 1
    ), probes AS (
        SELECT vid, v, cell_id FROM n_ranked WHERE cell_rank <= {S11_N_PROBE}
    ), bc AS (
        SELECT p.vid AS vec, m.vid AS corpus_vec
        FROM probes p JOIN members m USING (cell_id)
        WHERE ROUND(list_dot_product(p.v, m.v) /
              (sqrt(list_dot_product(p.v, p.v)) *
               sqrt(list_dot_product(m.v, m.v))), 6) >= {S11_ADMIT_COS}
    ), cd AS (
        SELECT vec, CAST(count(*) AS BIGINT) AS n_corpus_dups,
               CAST(min(corpus_vec) AS BIGINT) AS first_corpus_dup
        FROM bc GROUP BY 1
    ), bb AS (
        SELECT DISTINCT a.vid AS qa, b.vid AS qb
        FROM probes a JOIN probes b ON a.cell_id = b.cell_id AND a.vid < b.vid
        WHERE ROUND(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))), 6) >= {S11_ADMIT_COS}
    ), losers AS (SELECT DISTINCT qb AS vec FROM bb)
    SELECT CAST(n.vid AS BIGINT) AS vec,
           CAST(coalesce(cd.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
           cd.first_corpus_dup,
           CASE WHEN cd.vec IS NOT NULL THEN 'dup_of_corpus'
                WHEN l.vec IS NOT NULL THEN 'dup_in_batch'
                ELSE 'accepted' END AS status
    FROM newb n LEFT JOIN cd ON n.vid = cd.vec LEFT JOIN losers l ON n.vid = l.vec
    """,
    doc="Quantizer-migration proof, driver-checked (jobs/"
    "embedding_index_lake.py::reindex_embedding_index — the backfill "
    "the lake docstring promised): the demo corpus is bulk-loaded into "
    "a v0 root under s11's first-8 quantizer through the REAL ingest "
    "protocol, then MIGRATED into a v1 root under a first-16 quantizer "
    "(one broadcast-centroid map pass per committed batch re-assigning "
    "survivors; admissions never re-scored; members marker last, so "
    "the backfill resumes after any crash; old root untouched until "
    "cutover — the reference's versioned v0->v1 migration pattern, "
    "db.py:96-208, applied to the lake). This entry admits the demo "
    "batch against the MIGRATED index, so the driver's hash check "
    "pins the whole path: every v1 cell id must equal the rank-1 "
    "assignment DuckDB recomputes from raw vectors under the new "
    "quantizer — a single mis-migrated vector flips a probe set and "
    "the hash. Equivalence with a from-scratch rebuild and "
    "crash-injected resume are proven in tests/test_embedding_reindex"
    ".py.",
)
def s12_reindexed_admit_batch(spark, sf_dir):
    from ..jobs.embedding_index_lake import sf_reindexed_tables

    emb = t(spark, sf_dir, "embeddings")
    newb = emb.filter(F.col("vec_id") % S11_BATCH_MOD == 0)
    cents, members = sf_reindexed_tables(spark, sf_dir)
    return similarity.embed_admit_batch(
        newb, members, cents, threshold=S11_ADMIT_COS, n_probe=S11_N_PROBE
    )


# The recall sample: ~6% of the corpus, the same deterministic slice s7
# uses, so the audit costs O(sample * probe * cell), never O(corpus^2).
S13_SAMPLE_MOD = 17
S13_PROBE_VALUES = (1, 2, 4)


@q(
    "s13_ann_recall_audit",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qs AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S13_SAMPLE_MOD} = 0
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM e ORDER BY vec_id LIMIT 8
    ), assign AS (
        SELECT vid, v, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT e.vec_id AS vid, e.v, cents.cell_id,
                   list_dot_product(e.v, cents.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM e CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, v AS mv, cell_id FROM assign WHERE cell_rank = 1
    ), pvals AS (
        SELECT * FROM (VALUES {", ".join(f"({p})" for p in S13_PROBE_VALUES)}) AS pv(n_probe)
    ), ivf AS (
        SELECT pv.n_probe, a.vid AS query_id, m.nn_id,
               list_dot_product(a.v, m.mv) /
                   (sqrt(list_dot_product(a.v, a.v)) *
                    sqrt(list_dot_product(m.mv, m.mv))) AS cs
        FROM pvals pv
        JOIN assign a ON a.cell_rank <= pv.n_probe
        JOIN qs ON a.vid = qs.vec_id
        JOIN members m USING (cell_id)
        WHERE a.vid != m.nn_id
    ), ivf_top AS (
        SELECT n_probe, query_id, nn_id FROM (
            SELECT n_probe, query_id, nn_id,
                   row_number() OVER (PARTITION BY n_probe, query_id
                                      ORDER BY cs DESC, nn_id ASC) AS rnk
            FROM ivf
        ) WHERE rnk = 1
    ), exact AS (
        SELECT query_id, nn_id AS exact_nn FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {COS_SQL} DESC, c.vec_id ASC) AS rnk
            FROM qs q JOIN e c ON q.vec_id != c.vec_id
        ) WHERE rnk = 1
    )
    SELECT CAST(pv.n_probe AS INT) AS n_probe,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN i.nn_id = x.exact_nn THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           ROUND(sum(CASE WHEN i.nn_id = x.exact_nn THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS recall_micro
    FROM pvals pv
    CROSS JOIN exact x
    LEFT JOIN ivf_top i ON i.n_probe = pv.n_probe AND i.query_id = x.query_id
    GROUP BY pv.n_probe
    ORDER BY n_probe
    """,
    doc="ANN recall audit (r7 verdict item 2): recall@1 of the IVF probe "
    "path (s4's kernel, the pinned first-8 quantizer) versus exact "
    "brute force (s1's kernel) for n_probe in {1, 2, 4}, measured on "
    "the deterministic ~6% sample s7 uses. Both legs are fully "
    "deterministic, so the recall NUMBERS — not just the machinery — "
    "are value-checked cross-engine; this turns the 'recall is the "
    "n_probe dial' docstring claim on operators/similarity.py::ivf_topk "
    "into a measured, driver-verified contract. Queries whose probed "
    "cells hold no candidate count as misses (the exact leg anchors "
    "the denominator), so n_queries is constant across probe values. "
    "Cost shape: exact leg O(sample * corpus) with the sample "
    "broadcast; each IVF leg O(sample * probe * cell) via the "
    "query_ids prune — the audit never scores corpus x corpus, which "
    "is what makes running it routinely at 100 TB affordable.",
)
def s13_ann_recall_audit(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") % S13_SAMPLE_MOD == 0)
    exact = pin(
        similarity.brute_force_topk(emb, sample, k=1).select(
            "query_id", F.col("nn_id").alias("exact_nn")
        )
    )
    # one scored pass for all probe values (operators/similarity.py::
    # ivf_topk_multi_probe): per-leg ivf_topk calls re-assigned and
    # re-scored the identical candidate blocks 3x — row-identical, 3x
    # less kernel/shuffle work (OPTIMIZATION_r12.md)
    ivf_all = similarity.ivf_topk_multi_probe(
        emb, list(S13_PROBE_VALUES), k=1, n_cells=8, query_ids=sample
    ).select("n_probe", "query_id", F.col("nn_id").alias("ivf_nn"))
    pvals = spark.createDataFrame(
        [(p,) for p in S13_PROBE_VALUES], "n_probe int"
    )
    anchored = (
        exact.crossJoin(F.broadcast(pvals))
        .join(ivf_all, ["n_probe", "query_id"], "left")
        .withColumn(
            "hit",
            F.when(F.col("ivf_nn") == F.col("exact_nn"), 1).otherwise(0),
        )
    )
    return (
        anchored.groupBy("n_probe")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.sum("hit").cast("long").alias("n_hits"),
            F.round(F.sum("hit") / F.count("*"), 6).alias("recall_micro"),
        )
        .orderBy("n_probe")
    )


PQ_N_SUB = 8
PQ_SUB_DIM = 8  # dim 64 / 8 subspaces
PQ_N_CODES = 16


@q(
    "s14_pq_codes",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM e ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT e.vec_id, ms.m,
               e.v[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM e CROSS JOIN ms
    ), scored AS (
        SELECT s.vec_id, s.m, cb.j,
               -2 * list_dot_product(
                       s.sv,
                       cb.cv[s.m * {PQ_SUB_DIM} + 1 : s.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}])
                 + list_dot_product(
                       cb.cv[s.m * {PQ_SUB_DIM} + 1 : s.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}],
                       cb.cv[s.m * {PQ_SUB_DIM} + 1 : s.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}])
                 AS d2,
               list_dot_product(s.sv, s.sv) AS sn2
        FROM sub s CROSS JOIN cb
    ), best AS (
        SELECT vec_id, m, j, sn2 + d2 AS dist,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, j ASC) AS rnk
        FROM scored
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           string_agg(CAST(j AS VARCHAR), ',' ORDER BY m) AS codes,
           CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS BIGINT) AS err_micro
    FROM best WHERE rnk = 1
    GROUP BY vec_id
    """,
    doc="Product-quantization encode (Jegou et al., TPAMI 2011 — the "
    "compression arm of IVF-PQ, the standard 100-TB ANN memory "
    "layout): dim-64 vectors split into 8 subspaces; each subvector "
    "maps to its nearest of 16 per-subspace codewords, 512 bytes -> "
    "8 code bytes + a shared constant-size codebook. The codebook is "
    "the deterministic first-16-by-id rule (the s4/s11 quantizer "
    "pattern; production trains per-subspace k-means via "
    "fit_kmeans_centroids — identical plan), carried as a NumPy "
    "constant in ONE Arrow-vectorized mapInPandas kernel (the s5 GEMM "
    "pattern; an all-expression form was value-identical but cost "
    "~29 s of driver-side plan analysis for its 128-HOF tree), so "
    "encoding is a PURE MAP over the corpus: zero shuffle, zero join "
    "(asserted in test_plan_quality). Distances use "
    "-2*(sv @ cw.T)+||cw||^2 (argmin-equivalent, GEMM-shaped, "
    "bit-reproducible cross-engine), ties to the lowest code id; the oracle recomputes every code AND the total squared "
    "reconstruction error in integer micro-units (the t8/t16 "
    "order-free summation technique), so a single flipped code or a "
    "drifted codeword mismatches the hash. The cataloged entry "
    "serializes the code array to a ','-joined string (the g5 "
    "array_join pattern) because the driver canonicalizer cannot hash "
    "list-typed cells (r8 `err`); pq_encode itself keeps returning the "
    "real array<int> for downstream ADC.",
)
def s14_pq_codes(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebook(emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES)
    return similarity.pq_encode(emb, cb).withColumn(
        "codes", F.array_join(F.col("codes").cast("array<string>"), ",")
    )


PQ_SHORTLIST = 10


@q(
    "s15_pq_adc_topk",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM e ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT e.vec_id, ms.m,
               e.v[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM e CROSS JOIN ms
    ), cbsub AS (
        SELECT cb.j, ms.m,
               cb.cv[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS cw
        FROM cb CROSS JOIN ms
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), qsub AS (
        SELECT s.vec_id AS qid, s.m, s.sv AS qsv FROM sub s WHERE s.vec_id < 5
    ), adc AS (
        SELECT q.qid, b.vec_id AS nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM best b
        JOIN qsub q USING (m)
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        WHERE b.vec_id != q.qid
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN e eq ON eq.vec_id = s.qid
        JOIN e ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="PQ asymmetric-distance top-3 with exact re-rank — the QUERY "
    "path of IVF-PQ, completing s14's compression arm: the corpus is "
    "scanned as 8-byte codes, each query precomputes one 8x16 lookup "
    "table of subspace squared distances in integer micro-units "
    "(broadcast), and a candidate's approximate distance is 8 table "
    "lookups + integer adds — no per-pair vector math, which is what "
    "makes scanning a 100-TB corpus's codes affordable. The "
    f"{PQ_SHORTLIST}-candidate ADC shortlist is re-ranked exactly "
    "(true cosine, the standard rescoring step; shortlist size is the "
    "recall dial). Integer ADC scores make the approximate ranking "
    "bit-reproducible cross-engine, so the oracle value-checks BOTH "
    "legs — the lookup-table math via adc_micro and the rescoring via "
    "cos_sim. Plan: coded corpus stays a pure map; the only shuffles "
    "are two bounded top-k windows over narrow (id, long) rows.",
)
def s15_pq_adc_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebook(emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES)
    return similarity.pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < 5), cb, k=3, shortlist=PQ_SHORTLIST
    )


@q(
    "s16_hamming_topk",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), sk AS (
        SELECT vec_id,
               list_sum(list_transform(range(1, 33),
                   i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 1))
                             ELSE 0::BIGINT END)) AS b0,
               list_sum(list_transform(range(33, 65),
                   i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 33))
                             ELSE 0::BIGINT END)) AS b1
        FROM e
    ), qs AS (
        SELECT vec_id AS query_id, b0 AS q0, b1 AS q1 FROM sk WHERE vec_id < 5
    ), ham AS (
        SELECT q.query_id, c.vec_id AS nn_id,
               CAST(bit_count(xor(c.b0, q.q0))
                    + bit_count(xor(c.b1, q.q1)) AS INT) AS hamming
        FROM sk c CROSS JOIN qs q
        WHERE c.vec_id != q.query_id
    ), short AS (
        SELECT query_id, nn_id, hamming FROM (
            SELECT query_id, nn_id, hamming,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY hamming ASC, nn_id ASC) AS srnk
            FROM ham
        ) WHERE srnk <= 10
    ), rescored AS (
        SELECT s.query_id, s.nn_id, s.hamming,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN e eq ON eq.vec_id = s.query_id
        JOIN e ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, hamming
    FROM (
        SELECT query_id, nn_id, hamming, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="Binary-quantized ANN — the third rung of the compression "
    "ladder (full vectors s1, PQ codes s14/s15, sign bits here): each "
    "dim-64 vector becomes its 64 sign bits packed in two 32-bit "
    "words, and a candidate's approximate distance is two "
    "XOR+popcount instructions. Hamming is monotone in angle in "
    "expectation (Charikar SRP with the identity projection), so the "
    "10-candidate Hamming shortlist is rescored with true cosine — "
    "shortlist size is the recall dial, same contract as s15. "
    "Integer sketches and distances are bit-reproducible "
    "cross-engine, so the oracle value-checks both the packing and "
    "the popcount ranking. Plan: sketching is a pure map (static "
    "unrolled bit-sum, zero shuffle); queries broadcast; shuffles are "
    "two bounded top-k windows over narrow (id, int) rows. At 100 TB "
    "the sketch table is ~2000x smaller than the vectors and scans at "
    "memory bandwidth.",
)
def s16_hamming_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    return similarity.hamming_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, shortlist=10
    )


@q(
    "s17_ivfpq_topk",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM e ORDER BY vec_id LIMIT 8
    ), ranked_cells AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT e.vec_id AS vid, cents.cell_id,
                   list_dot_product(e.v, cents.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM e CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, cell_id FROM ranked_cells WHERE cell_rank = 1
    ), probes AS (
        SELECT vid AS qid, cell_id FROM ranked_cells
        WHERE cell_rank <= 2 AND vid < 5
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM e ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT e.vec_id, ms.m,
               e.v[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM e CROSS JOIN ms
    ), cbsub AS (
        SELECT cb.j, ms.m,
               cb.cv[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS cw
        FROM cb CROSS JOIN ms
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), qsub AS (
        SELECT s.vec_id AS qid, s.m, s.sv AS qsv FROM sub s WHERE s.vec_id < 5
    ), adc AS (
        SELECT p.qid, mem.nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM probes p
        JOIN members mem USING (cell_id)
        JOIN best b ON b.vec_id = mem.nn_id
        JOIN qsub q ON q.qid = p.qid AND q.m = b.m
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        WHERE mem.nn_id != p.qid
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN e eq ON eq.vec_id = s.qid
        JOIN e ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="IVF-PQ — the composed index that actually serves 100-TB ANN "
    "(the FAISS default; Jegou et al., TPAMI 2011), closing the "
    "ladder: s4's coarse cells prune each query's candidates to "
    "n_probe=2 cells, s15's ADC kernel scores the pruned candidates "
    "from their 8-byte codes (integer table lookups, no per-pair "
    "vector math), and the 10-candidate shortlist is rescored with "
    "true cosine. Per query the cost is O(probe x avg_cell) lookups "
    "+ 10 exact dots — against a 100-TB corpus the scan touches "
    "~1/4 of a ~60x-compressed code table and a handful of raw "
    "vectors. Both recall dials (n_probe — measured by s13; "
    "shortlist) stay deterministic, so the COMPOSITION is "
    "value-checked end-to-end: one wrong cell route, flipped code, "
    "or table entry mismatches the hash.",
)
def s17_ivfpq_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebook(emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES)
    return similarity.ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        cb,
        k=3,
        shortlist=PQ_SHORTLIST,
        n_cells=8,
        n_probe=2,
    )


@q(
    "s20_lake_pq_search",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), corp AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), batch AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} = 0
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM corp ORDER BY vec_id LIMIT {S11_N_CELLS}
    ), m_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT corp.vec_id AS vid, cents.cell_id,
                   list_dot_product(corp.v, cents.cv) /
                       (sqrt(list_dot_product(corp.v, corp.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM corp CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, cell_id FROM m_ranked WHERE cell_rank = 1
    ), p_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT batch.vec_id AS vid, cents.cell_id,
                   list_dot_product(batch.v, cents.cv) /
                       (sqrt(list_dot_product(batch.v, batch.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM batch CROSS JOIN cents
        )
    ), probes AS (
        SELECT vid AS qid, cell_id FROM p_ranked WHERE cell_rank <= {S11_N_PROBE}
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM corp ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT corp.vec_id, ms.m,
               corp.v[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM corp CROSS JOIN ms
    ), cbsub AS (
        SELECT cb.j, ms.m,
               cb.cv[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS cw
        FROM cb CROSS JOIN ms
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), qsub AS (
        SELECT batch.vec_id AS qid, ms.m,
               batch.v[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS qsv
        FROM batch CROSS JOIN ms
    ), adc AS (
        SELECT p.qid, mem.nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM probes p
        JOIN members mem USING (cell_id)
        JOIN best b ON b.vec_id = mem.nn_id
        JOIN qsub q ON q.qid = p.qid AND q.m = b.m
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN batch eq ON eq.vec_id = s.qid
        JOIN corp ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="IVF-PQ over the MATERIALIZED lake (jobs/embedding_index_lake"
    ".py::pq_layer_search, the CLI pq-search --n-probe path): s17 "
    "checks the composition live; this entry puts the SERVING path "
    "under the driver oracle — the demo batch queries the standing "
    "demo index built through the real protocol (init + bulk ingest + "
    "build_pq_layer), so the stored quantizer routes the probes, the "
    "STORED 8-byte codes feed the ADC lookup tables, and the STORED "
    "assignment vectors feed the rescore, while DuckDB recomputes all "
    "three facets from raw parquet. One stale code, mis-assigned "
    "cell, or drifted stored vector mismatches the hash. Per query "
    "the scan is n_probe/n_cells of a ~60x-compressed code table "
    "(broadcast integer tables, equi-join pairing on the probing "
    "query's id — never candidates x all queries) + shortlist exact "
    "dots: the read side of the incremental-ANN story d9 tells for "
    "lexical identity.",
)
def s20_lake_pq_search(spark, sf_dir):
    from ..jobs.embedding_index_lake import pq_layer_search, sf_pq_index_root

    emb = t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % S11_BATCH_MOD == 0)
    root = sf_pq_index_root(spark, sf_dir)
    return pq_layer_search(
        spark, root, batch, k=3, shortlist=PQ_SHORTLIST, n_probe=S11_N_PROBE
    )


S18_SHORTLISTS = (5, 20)


@q(
    "s18_compression_recall_audit",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qs AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S13_SAMPLE_MOD} = 0
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM e ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT e.vec_id, ms.m,
               e.v[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM e CROSS JOIN ms
    ), cbsub AS (
        SELECT cb.j, ms.m,
               cb.cv[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS cw
        FROM cb CROSS JOIN ms
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), qsub AS (
        SELECT s.vec_id AS qid, s.m, s.sv AS qsv FROM sub s
        WHERE s.vec_id % {S13_SAMPLE_MOD} = 0
    ), adc AS (
        SELECT q.qid, b.vec_id AS nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS score
        FROM best b
        JOIN qsub q USING (m)
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        WHERE b.vec_id != q.qid
        GROUP BY 1, 2
    ), sk AS (
        SELECT vec_id,
               list_sum(list_transform(range(1, 33),
                   i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 1))
                             ELSE 0::BIGINT END)) AS b0,
               list_sum(list_transform(range(33, 65),
                   i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 33))
                             ELSE 0::BIGINT END)) AS b1
        FROM e
    ), ham AS (
        SELECT q.vec_id AS qid, c.vec_id AS nn_id,
               CAST(bit_count(xor(c.b0, q.b0))
                    + bit_count(xor(c.b1, q.b1)) AS BIGINT) AS score
        FROM sk c JOIN (SELECT s.* FROM sk s JOIN qs ON s.vec_id = qs.vec_id) q
          ON c.vec_id != q.vec_id
    ), approx AS (
        SELECT 'pq_adc' AS method, qid, nn_id, score FROM adc
        UNION ALL
        SELECT 'hamming' AS method, qid, nn_id, score FROM ham
    ), ranked AS (
        SELECT method, qid, nn_id, score,
               row_number() OVER (PARTITION BY method, qid
                                  ORDER BY score ASC, nn_id ASC) AS srnk
        FROM approx
    ), lvals AS (
        SELECT * FROM (VALUES {", ".join(f"({L})" for L in S18_SHORTLISTS)}) AS lv(shortlist)
    ), rescored AS (
        SELECT r.method, lv.shortlist, r.qid, r.nn_id,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM lvals lv
        JOIN ranked r ON r.srnk <= lv.shortlist
        JOIN e eq ON eq.vec_id = r.qid
        JOIN e ec ON ec.vec_id = r.nn_id
    ), picked AS (
        SELECT method, shortlist, qid, nn_id FROM (
            SELECT method, shortlist, qid, nn_id,
                   row_number() OVER (PARTITION BY method, shortlist, qid
                                      ORDER BY cs DESC, nn_id ASC) AS rnk
            FROM rescored
        ) WHERE rnk = 1
    ), exact AS (
        SELECT query_id, nn_id AS exact_nn FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {COS_SQL} DESC, c.vec_id ASC) AS rnk
            FROM qs q JOIN e c ON q.vec_id != c.vec_id
        ) WHERE rnk = 1
    )
    SELECT mm.method AS method, CAST(lv.shortlist AS INT) AS shortlist,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN p.nn_id = x.exact_nn THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           ROUND(sum(CASE WHEN p.nn_id = x.exact_nn THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS recall_micro
    FROM (VALUES ('pq_adc'), ('hamming')) AS mm(method)
    CROSS JOIN lvals lv
    CROSS JOIN exact x
    LEFT JOIN picked p ON p.method = mm.method AND p.shortlist = lv.shortlist
                      AND p.qid = x.query_id
    GROUP BY mm.method, lv.shortlist
    ORDER BY method, shortlist
    """,
    doc="Compression-ladder recall audit — s13's measured-contract "
    "pattern applied to the two new approximate rungs: recall@1 of PQ "
    "ADC (s15's kernel) and binary Hamming (s16's kernel) versus exact "
    "brute force, per rescore-shortlist size in {5, 20}, on the same "
    "deterministic ~6% sample s13/s7 use. Every leg is deterministic "
    "(integer ADC tables, integer popcounts, id tie-breaks), so the "
    "recall NUMBERS — the dial a user actually tunes — are "
    "value-checked cross-engine. The exact leg anchors the "
    "denominator, so n_queries is constant and a query whose shortlist "
    "misses counts as a miss. Together with s13 (the n_probe dial) "
    "every approximation knob in the ANN surface is a measured, "
    "driver-verified contract rather than a docstring claim.",
)
def s18_compression_recall_audit(spark, sf_dir):
    from pyspark.sql.window import Window

    emb = t(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") % S13_SAMPLE_MOD == 0)
    cb = similarity.pq_codebook(emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES)
    # ONE fused Arrow kernel pass scores every pair under all three
    # rungs and emits batch-local shortlists (r13, guide §4 — the
    # previous shape ran three separate corpus passes plus two full
    # |q| x |corpus| JVM pair streams; see
    # similarity.compression_audit_scores for the superset argument
    # that keeps results row-identical). Pinned: the exact leg and the
    # two method branches below all read this one stream.
    max_l = max(S18_SHORTLISTS)
    fused = pin(
        similarity.compression_audit_scores(emb, sample, cb, shortlist=max_l)
    )
    exact = (
        fused.filter(F.col("method") == "exact")
        .withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos_sim"), F.asc("nn_id")
                )
            ),
        )
        .filter(F.col("_rnk") == 1)
        .select("query_id", F.col("nn_id").alias("exact_nn"))
    )
    cv = emb.select(
        F.col("vec_id").alias("nn_id"), similarity.as_double(F.col("embedding")).alias("cv")
    )
    # the score stream is narrow (query_id, nn_id, score) rows; the
    # query vector is re-attached to the bounded <= |q| x max_l
    # shortlist only (guide §2.3 — qv on every pair row multiplied the
    # top-k exchange ~20x)
    qvf = sample.select(
        F.col("vec_id").alias("query_id"),
        similarity.as_double(F.col("embedding")).alias("qv"),
    )
    legs = []
    for method in ("pq_adc", "hamming"):
        scored = fused.filter(F.col("method") == method).select(
            "query_id", "nn_id", "score"
        )
        w_short = Window.partitionBy("query_id").orderBy(
            F.asc("score"), F.asc("nn_id")
        )
        short = (
            scored.withColumn("_srnk", F.row_number().over(w_short))
            .filter(F.col("_srnk") <= max_l)
            .join(F.broadcast(qvf), "query_id")
        )
        rescored = pin(
            cv.join(F.broadcast(short), "nn_id").withColumn(
                "cos_sim",
                similarity.dot(F.col("qv"), F.col("cv"))
                / (
                    similarity.l2_norm(F.col("qv"))
                    * similarity.l2_norm(F.col("cv"))
                ),
            ).select("query_id", "nn_id", "_srnk", "cos_sim")
        )
        for L in S18_SHORTLISTS:
            w_pick = Window.partitionBy("query_id").orderBy(
                F.desc("cos_sim"), F.asc("nn_id")
            )
            legs.append(
                rescored.filter(F.col("_srnk") <= L)
                .withColumn("_rnk", F.row_number().over(w_pick))
                .filter(F.col("_rnk") == 1)
                .select(
                    F.lit(method).alias("method"),
                    F.lit(L).cast("int").alias("shortlist"),
                    "query_id",
                    F.col("nn_id").alias("approx_nn"),
                )
            )
    approx = legs[0]
    for leg in legs[1:]:
        approx = approx.unionByName(leg)
    grid = spark.createDataFrame(
        [(m, L) for m in ("pq_adc", "hamming") for L in S18_SHORTLISTS],
        "method string, shortlist int",
    )
    anchored = (
        exact.crossJoin(F.broadcast(grid))
        .join(approx, ["method", "shortlist", "query_id"], "left")
        .withColumn(
            "hit",
            F.when(F.col("approx_nn") == F.col("exact_nn"), 1).otherwise(0),
        )
    )
    return (
        anchored.groupBy("method", "shortlist")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.sum("hit").cast("long").alias("n_hits"),
            F.round(F.sum("hit") / F.count("*"), 6).alias("recall_micro"),
        )
        .orderBy("method", "shortlist")
    )


@q(
    "s21_opq_audit",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qs AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S13_SAMPLE_MOD} = 0
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM e ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), vars AS (
        SELECT u.i AS d,
               CAST(floor(var_pop(v[u.i]) * 1000000 + 0.5) AS BIGINT) AS vmic
        FROM qs CROSS JOIN LATERAL (
            SELECT unnest(range(1, {PQ_N_SUB * PQ_SUB_DIM} + 1)) AS i
        ) u
        GROUP BY u.i
    ), snake AS (
        SELECT d,
               CAST(CASE WHEN ((r0 // {PQ_N_SUB}) % 2) = 0 THEN r0 % {PQ_N_SUB}
                         ELSE {PQ_N_SUB - 1} - (r0 % {PQ_N_SUB}) END AS INT) AS m,
               CAST(r0 // {PQ_N_SUB} AS INT) AS rnd
        FROM (
            SELECT d, row_number() OVER (ORDER BY vmic DESC, d ASC) - 1 AS r0
            FROM vars
        )
    ), pmaps AS (
        SELECT 'identity' AS variant, u.d AS d,
               CAST((u.d - 1) // {PQ_SUB_DIM} AS INT) AS m,
               CAST((u.d - 1) % {PQ_SUB_DIM} AS INT) AS rnd
        FROM (SELECT unnest(range(1, {PQ_N_SUB * PQ_SUB_DIM} + 1)) AS d) u
        UNION ALL
        SELECT 'snake_perm', d, m, rnd FROM snake
    ), subp AS (
        SELECT pm.variant, e.vec_id, pm.m, list(e.v[pm.d] ORDER BY pm.rnd) AS sv
        FROM e CROSS JOIN pmaps pm GROUP BY 1, 2, 3
    ), cbp AS (
        SELECT pm.variant, cb.j, pm.m, list(cb.cv[pm.d] ORDER BY pm.rnd) AS cw
        FROM cb CROSS JOIN pmaps pm GROUP BY 1, 2, 3
    ), best AS (
        SELECT variant, vec_id, m, dist FROM (
            SELECT s.variant, s.vec_id, s.m,
                   list_dot_product(s.sv, s.sv)
                     - 2 * list_dot_product(s.sv, c.cw)
                     + list_dot_product(c.cw, c.cw) AS dist,
                   row_number() OVER (
                       PARTITION BY s.variant, s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM subp s JOIN cbp c ON c.variant = s.variant AND c.m = s.m
        ) WHERE rnk = 1
    )
    SELECT variant,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vectors,
           CAST(sum(CAST(round(dist * 1000000) AS BIGINT)) AS BIGINT)
               AS err_micro
    FROM best GROUP BY variant
    """,
    doc="OPQ-lite audit — coordinate permutation balancing per-subspace "
    "variance (the cheap cousin of Ge et al.'s optimized product "
    "quantization, CVPR 2013): dims rank by sample variance in integer "
    "micro-units and deal into subspaces boustrophedon "
    "(operators/similarity.py::opq_snake_permutation), a CLOSED-FORM "
    "allocation, which is what lets this oracle re-derive the whole "
    "permutation in SQL (var_pop -> micro round -> rank -> snake) and "
    "hash-check the full reconstruction-error audit of identity vs "
    "permuted seed-codebook PQ, bit-exactly, s14-style. HONEST "
    "NEGATIVE RESULT, deliberately cataloged: this corpus's embedding "
    "dims are i.i.d. uniform, so the audit shows the permutation "
    "~neutral here (a uniform hypercube is already axis-aligned "
    "optimal; a measured full parametric-OPQ PCA rotation was 1.4x "
    "WORSE) — on anisotropic embeddings the same operator cuts error "
    "~3x (planted-corpus proof in tests/test_pq.py). The audit itself "
    "is the 100-TB artifact: the permutation trains on the bounded "
    "sample, both encode legs are the s14 pure-map kernel (zero "
    "shuffle), and the decision to ship OPQ or identity becomes a "
    "measured, driver-verified number instead of a guess.",
)
def s21_opq_audit(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    perm = similarity.opq_snake_permutation(
        emb, n_sub=PQ_N_SUB, sample_mod=S13_SAMPLE_MOD
    )
    legs = []
    for variant, p in (("identity", None), ("snake_perm", perm)):
        cb = similarity.pq_codebook(emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES, perm=p)
        legs.append(
            similarity.pq_encode(emb, cb, perm=p).agg(
                F.count("*").cast("long").alias("n_vectors"),
                F.sum("err_micro").cast("long").alias("err_micro"),
            ).select(F.lit(variant).alias("variant"), "n_vectors", "err_micro")
        )
    return legs[0].unionByName(legs[1])


@q(
    "s22_opq_lake_search",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), corp AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), batch AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} = 0
    ), samp AS (
        SELECT vec_id, v FROM corp WHERE vec_id % {S13_SAMPLE_MOD} = 0
    ), vars AS (
        SELECT u.i AS d,
               CAST(floor(var_pop(v[u.i]) * 1000000 + 0.5) AS BIGINT) AS vmic
        FROM samp CROSS JOIN LATERAL (
            SELECT unnest(range(1, {PQ_N_SUB * PQ_SUB_DIM} + 1)) AS i
        ) u
        GROUP BY u.i
    ), snake AS (
        SELECT d,
               CAST(CASE WHEN ((r0 // {PQ_N_SUB}) % 2) = 0 THEN r0 % {PQ_N_SUB}
                         ELSE {PQ_N_SUB - 1} - (r0 % {PQ_N_SUB}) END AS INT) AS m,
               CAST(r0 // {PQ_N_SUB} AS INT) AS rnd
        FROM (
            SELECT d, row_number() OVER (ORDER BY vmic DESC, d ASC) - 1 AS r0
            FROM vars
        )
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM corp ORDER BY vec_id LIMIT {S11_N_CELLS}
    ), m_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT corp.vec_id AS vid, cents.cell_id,
                   list_dot_product(corp.v, cents.cv) /
                       (sqrt(list_dot_product(corp.v, corp.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM corp CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, cell_id FROM m_ranked WHERE cell_rank = 1
    ), p_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT batch.vec_id AS vid, cents.cell_id,
                   list_dot_product(batch.v, cents.cv) /
                       (sqrt(list_dot_product(batch.v, batch.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM batch CROSS JOIN cents
        )
    ), probes AS (
        SELECT vid AS qid, cell_id FROM p_ranked WHERE cell_rank <= {S11_N_PROBE}
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vid) - 1 AS j, v AS cv
        FROM (SELECT vec_id AS vid, v FROM corp ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), sub AS (
        SELECT corp.vec_id, sn.m, list(corp.v[sn.d] ORDER BY sn.rnd) AS sv
        FROM corp CROSS JOIN snake sn GROUP BY 1, 2
    ), cbsub AS (
        SELECT cb.j, sn.m, list(cb.cv[sn.d] ORDER BY sn.rnd) AS cw
        FROM cb CROSS JOIN snake sn GROUP BY 1, 2
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), qsub AS (
        SELECT batch.vec_id AS qid, sn.m, list(batch.v[sn.d] ORDER BY sn.rnd) AS qsv
        FROM batch CROSS JOIN snake sn GROUP BY 1, 2
    ), adc AS (
        SELECT p.qid, mem.nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM probes p
        JOIN members mem USING (cell_id)
        JOIN best b ON b.vec_id = mem.nn_id
        JOIN qsub q ON q.qid = p.qid AND q.m = b.m
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN batch eq ON eq.vec_id = s.qid
        JOIN corp ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="IVF-PQ over the lake with the TRAINED OPQ-lite permutation "
    "SERVED from storage (jobs/embedding_index_lake.py::build_pq_layer"
    "(opq=True) + pq_layer_search; VERDICT r10 item 7): s21 proved the "
    "permutation standalone, s20 proved the un-permuted serving path — "
    "this entry closes the loop by committing the trained permutation "
    "IN the layer (codebook.json beside the codebook it permutes, "
    "staged-swap protocol unchanged) so every stored 8-byte code "
    "encodes the permuted corpus and the search permutes queries "
    "before building its ADC lookup tables; the exact-cosine rescore "
    "reads the raw stored vectors, where the permutation cancels. The "
    "oracle composes s20's full IVF-PQ re-derivation with s21's "
    "closed-form SQL permutation (var_pop micro-rank -> boustrophedon "
    "deal over the corp sample), so one wrong stored perm entry, "
    "unpermuted code, or unpermuted query table mismatches the hash. "
    "Same 100-TB shape as s20: n_probe/n_cells of the code table, "
    "broadcast integer tables, equi-join pairing on the probing "
    "query's id, bounded rescore — the permutation adds one stored "
    "64-int list and one in-kernel column gather.",
)
def s22_opq_lake_search(spark, sf_dir):
    from ..jobs.embedding_index_lake import pq_layer_search, sf_opq_index_root

    emb = t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % S11_BATCH_MOD == 0)
    root = sf_opq_index_root(spark, sf_dir)
    return pq_layer_search(
        spark, root, batch, k=3, shortlist=PQ_SHORTLIST, n_probe=S11_N_PROBE
    )


@q(
    "s19_pq_train_quality",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST({PQ_N_SUB} AS INT) AS n_sub,
           CAST({PQ_N_CODES} AS INT) AS n_codes,
           TRUE AS err_improved,
           TRUE AS codes_in_range
    FROM embeddings
    """,
    doc="Trained-codebook PQ, cataloged with the s7/a1 contract: the "
    "per-subspace Lloyd trainer (operators/similarity.py::"
    "pq_train_codebook — FAISS practice: codebooks train on a bounded "
    "deterministic sample CPU-side, then broadcast; no RNG, so fully "
    "reproducible) must BEAT the deterministic first-N codebook s14 "
    "pins for its bit-exact oracle. The driver-checkable result is "
    "the QUALITY CONTRACT, not the centroid floats: total integer "
    "reconstruction error (sum of err_micro over the full corpus, "
    "computed by the same pq_encode pure-map pass) strictly improves "
    "vs the seed codebook, every code lands in [0, n_codes), and the "
    "encode conserves rows (n_vectors == corpus rows, which DuckDB "
    "verifies independently). Breaking the trainer flips a boolean "
    "and the hash mismatches.",
)
def s19_pq_train_quality(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    seed_cb = similarity.pq_codebook(emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES)
    trained_cb = similarity.pq_train_codebook(
        emb, n_sub=PQ_N_SUB, n_codes=PQ_N_CODES, sample_mod=S13_SAMPLE_MOD
    )
    seed = similarity.pq_encode(emb, seed_cb).agg(
        F.sum("err_micro").cast("long").alias("seed_err")
    )
    trained = similarity.pq_encode(emb, trained_cb).agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum("err_micro").cast("long").alias("trained_err"),
        F.min(F.array_min("codes")).alias("min_code"),
        F.max(F.array_max("codes")).alias("max_code"),
    )
    return trained.join(F.broadcast(seed)).select(
        "n_vectors",
        F.lit(PQ_N_SUB).cast("int").alias("n_sub"),
        F.lit(PQ_N_CODES).cast("int").alias("n_codes"),
        (F.col("trained_err") < F.col("seed_err")).alias("err_improved"),
        (
            (F.col("min_code") >= 0) & (F.col("max_code") < PQ_N_CODES)
        ).alias("codes_in_range"),
    )


T23_VOCAB_SIZE = 256


@q(
    "t23_vocab_encode",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), flat AS (
        SELECT doc_id, tk[u.i] AS token, u.i AS pos
        FROM toks CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk) + 1)) AS i
        ) u
        WHERE tk[u.i] != ''
    ), counts AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM flat GROUP BY 1
    ), vocab AS (
        SELECT token, CAST(r - 1 AS INT) AS token_id FROM (
            SELECT token, row_number() OVER (ORDER BY n DESC, token ASC) AS r
            FROM counts
        ) WHERE r <= {T23_VOCAB_SIZE}
    ), enc AS (
        SELECT f.doc_id, f.pos,
               CAST(coalesce(v.token_id, -1) AS INT) AS tid
        FROM flat f LEFT JOIN vocab v USING (token)
    ), agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids
        FROM enc GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_oov, 0) AS n_oov,
           coalesce(a.ids, '') AS ids
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    doc="Dictionary (vocabulary) encoding — the tokenize-to-ids step a "
    f"pretraining pipeline runs after curation: the {T23_VOCAB_SIZE} "
    "most frequent tokens (count desc, token asc — a total order, so "
    "the vocabulary boundary is deterministic and the whole encode "
    "hash-checks) get dense ids, every document's token stream maps "
    "to an int array with -1 for out-of-vocabulary, and output is "
    "anchored on input ids (empty/null docs come back with [] rather "
    "than vanishing — the t20 lesson). Plan: one combinable count "
    "aggregation, the t15 two-phase top-k for the vocab (shard rank "
    "then exact re-rank of <= shards x V survivors — never a global "
    "window over millions of distinct tokens), posexplode + "
    "broadcast vocabulary join + one doc-keyed reassembly. At 100 TB "
    "the vocabulary is constant-size and the encode is two shuffles "
    "(explode-join re-aggregation) regardless of corpus size. The "
    "cataloged entry serializes the id array to a ','-joined string "
    "(the g5 array_join pattern; driver canonicalizer cannot hash "
    "list cells — r8 `err`); vocab_encode keeps returning array<int>.",
)
def t23_vocab_encode(spark, sf_dir):
    from ..operators.text import build_vocab, vocab_encode

    docs = t(spark, sf_dir, "documents")
    vocab = pin(build_vocab(docs, "text", vocab_size=T23_VOCAB_SIZE))
    return vocab_encode(docs, vocab, "doc_id", "text").withColumn(
        "ids", F.array_join(F.col("ids").cast("array<string>"), ",")
    )


T24_MERGES = 8
T24_WORD_TYPES = 16  # binds at test scale so the bound itself is checked

# Double-space encoding (see operators/text.py::bpe_segment): symbols
# separated by TWO spaces so one literal-replace pass per merge is the
# canonical greedy leftmost scan (each match takes one space from each
# boundary and the replacement gives it back — adjacent matches never
# share a consumed character). RE2 has no lookahead, so this encoding
# is what makes greedy expressible as plain replace() in DuckDB too.
_T24_CHARSEG = (
    "'  ' || array_to_string("
    "list_transform(range(1, len({col}) + 1), i -> {col}[i:i]), '  ') || '  '"
)


def _t24_oracle() -> str:
    """Unrolled-BPE oracle: DuckDB has no loops, so each merge round is
    a generated CTE triple (pair counts -> argmax -> greedy replace) —
    the same greedy (count desc, left asc, right asc) recurrence
    bpe_train runs in Python on the collected word-type table."""

    def _apply(prev: str, alias: str) -> str:
        pat = f"' ' || {alias}.l || '  ' || {alias}.r || ' '"
        rep = f"' ' || {alias}.l || {alias}.r || ' '"
        return f"replace({prev}, {pat}, {rep})"

    # AS MATERIALIZED: each round references the previous round's CTE;
    # left to DuckDB's default inlining the chain expands exponentially
    # (measured 83 s at sf0.01 -> 0.4 s materialized).
    rounds, enc_rounds, merge_union = [], [], []
    for k in range(1, T24_MERGES + 1):
        rounds.append(
            f"""p{k} AS MATERIALIZED (
        SELECT ss[u.i] AS l, ss[u.i + 1] AS r, CAST(sum(n) AS BIGINT) AS cnt
        FROM (SELECT n, str_split(trim(seg), '  ') AS ss FROM t{k - 1}) s
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(ss))) AS i) u
        GROUP BY 1, 2
    ), b{k} AS MATERIALIZED (
        SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
    ), t{k} AS MATERIALIZED (
        SELECT word, n, {_apply("seg", "b")} AS seg
        FROM t{k - 1} CROSS JOIN b{k} b
    )"""
        )
        enc_rounds.append(
            f"""dt{k} AS MATERIALIZED (
        SELECT token, {_apply("seg", "b")} AS seg
        FROM dt{k - 1} CROSS JOIN b{k} b
    )"""
        )
        merge_union.append(f"SELECT {k} AS k, l, r, cnt FROM b{k}")
    return f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), flat AS (
        SELECT doc_id, tk[u.i] AS token, u.i AS pos
        FROM toks CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk) + 1)) AS i
        ) u
        WHERE tk[u.i] != ''
    ), wcnt AS (
        SELECT token AS word, CAST(count(*) AS BIGINT) AS n
        FROM flat GROUP BY 1
    ), t0 AS (
        SELECT word, n, {_T24_CHARSEG.format(col="word")} AS seg
        FROM (
            SELECT word, n,
                   row_number() OVER (ORDER BY n DESC, word ASC) AS rnk
            FROM wcnt
        ) WHERE rnk <= {T24_WORD_TYPES}
    ), {", ".join(rounds)}, dt0 AS (
        SELECT token, {_T24_CHARSEG.format(col="token")} AS seg
        FROM (SELECT DISTINCT token FROM flat)
    ), {", ".join(enc_rounds)}, segs AS (
        SELECT token, str_split(trim(seg), '  ') AS ss FROM dt{T24_MERGES}
    ), sub AS (
        SELECT f.doc_id, f.pos, u.i AS i, ss[u.i] AS sym
        FROM flat f JOIN segs USING (token)
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(ss) + 1)) AS i) u
    ), svoc AS (
        SELECT sym, CAST(count(*) AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY count(*) DESC, sym ASC) - 1
                    AS INT) AS sym_id
        FROM sub GROUP BY sym
    ), docenc AS (
        SELECT s.doc_id,
               CAST(count(DISTINCT s.pos) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_subwords,
               string_agg(CAST(v.sym_id AS VARCHAR), ',' ORDER BY s.pos, s.i)
                   AS ids
        FROM sub s JOIN svoc v USING (sym) GROUP BY 1
    )
    SELECT 'merge' AS kind, lpad(CAST(k AS VARCHAR), 2, '0') AS item,
           l || '|' || r || '|' || CAST(cnt AS VARCHAR) AS payload
    FROM ({" UNION ALL ".join(merge_union)})
    UNION ALL
    SELECT 'vocab', sym, CAST(sym_id AS VARCHAR) || '|' || CAST(n AS VARCHAR)
    FROM svoc
    UNION ALL
    SELECT 'doc', CAST(d.doc_id AS VARCHAR),
           CAST(coalesce(e.n_tokens, 0) AS VARCHAR) || '|' ||
           CAST(coalesce(e.n_subwords, 0) AS VARCHAR) || '|' ||
           coalesce(e.ids, '')
    FROM documents d LEFT JOIN docenc e USING (doc_id)
    """


@q(
    "t24_bpe_encode",
    _t24_oracle(),
    doc="Bounded deterministic byte-pair encoding (Sennrich et al., ACL "
    "2016) — the subword step that completes the tokenize story t23 "
    f"starts: {T24_MERGES} greedy merges trained on the "
    f"{T24_WORD_TYPES} most frequent word types (operators/text.py::"
    "bpe_train), then every document encoded to dense subword ids "
    "(bpe_encode). One entry hash-checks all three artifacts — the "
    "merge table (rank, pair, weighted count), the symbol vocabulary "
    "(provably bounded: corpus characters + one symbol per merge), and "
    "every document's id stream — as 'merge'/'vocab'/'doc' rows of a "
    "(kind, item, payload) union, all strings (driver canonicalizer "
    "constraint). Ties break (count desc, left asc, right asc) "
    "everywhere, so the whole artifact is a pure function of the "
    "corpus; merge application is the canonical greedy leftmost scan, "
    "expressed as one literal replace per merge over DOUBLE-space-"
    "separated symbol strings (the encoding that makes greedy "
    "expressible as plain replace in Spark codegen and lookahead-free "
    "RE2 DuckDB alike; the Python trainer walks the symbol list "
    "directly). Scale shape: training collects only the "
    "bounded word-type table (the s19 constant-sufficient-statistics "
    "pattern; top-K via the t15 two-phase shard rank), encode is a "
    "pure column-expression map with the merge table constant-folded, "
    "plus one bounded-vocab broadcast join and one doc-keyed "
    "reassembly — two shuffles regardless of corpus size.",
)
def t24_bpe_encode(spark, sf_dir):
    from ..operators.text import (
        bpe_encode,
        bpe_symbol_vocab,
        bpe_token_stream,
        bpe_train,
        bpe_type_table,
    )

    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(
        docs, "text", n_merges=T24_MERGES, max_word_types=T24_WORD_TYPES
    )
    # ONE pinned tokenize pass + ONE pinned type table feed the vocab
    # aggregation, the token->ids map and the encode join — the
    # per-subword explode the old sub frame materialized is gone
    # (operators/text.py::bpe_encode, OPTIMIZATION_r12.md)
    flat = bpe_token_stream(docs, "doc_id", "text")
    types = bpe_type_table(flat, merges)
    vocab = pin(bpe_symbol_vocab(docs, merges, types=types))
    enc = bpe_encode(
        docs, merges, "doc_id", "text", vocab=vocab, types=types, flat=flat
    )
    merge_rows = spark.createDataFrame(
        [("merge", f"{k:02d}", f"{l}|{r}|{c}") for k, (l, r, c) in enumerate(merges, 1)],
        "kind string, item string, payload string",
    )
    vocab_rows = vocab.select(
        F.lit("vocab").alias("kind"),
        F.col("sym").alias("item"),
        F.concat_ws(
            "|", F.col("sym_id").cast("string"), F.col("n").cast("string")
        ).alias("payload"),
    )
    doc_rows = enc.select(
        F.lit("doc").alias("kind"),
        F.col("doc_id").cast("string").alias("item"),
        F.concat_ws(
            "|",
            F.col("n_tokens").cast("string"),
            F.col("n_subwords").cast("string"),
            F.array_join(F.col("ids").cast("array<string>"), ","),
        ).alias("payload"),
    )
    return merge_rows.unionAll(vocab_rows).unionAll(doc_rows)


T20_SPAN_TOKENS = 10
T20_MAX_OCC = 1


@q(
    "t20_paragraph_dedup",
    f"""
    WITH tk AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), sp AS (
        SELECT doc_id,
               list_transform(
                   range(0, CAST(floor((len(tk) + {T20_SPAN_TOKENS - 1})
                                       / {T20_SPAN_TOKENS}) AS INT)),
                   i -> {{'idx': i,
                          'unit': array_to_string(
                              tk[(i*{T20_SPAN_TOKENS}+1):(i*{T20_SPAN_TOKENS}+{T20_SPAN_TOKENS})],
                              ' ')}}) AS spans
        FROM tk
    ), ex0 AS (
        SELECT doc_id, unnest(spans) AS s FROM sp
    ), ex AS (
        SELECT doc_id, s.idx AS idx, s.unit AS unit, md5(s.unit) AS h FROM ex0
    ), bl AS (
        SELECT h FROM ex GROUP BY h HAVING count(*) > {T20_MAX_OCC}
    ), kept AS (
        SELECT ex.* FROM ex LEFT JOIN bl ON ex.h = bl.h WHERE bl.h IS NULL
    ), stats AS (
        -- anchored on documents, not on docs-with-spans: span_dedup's
        -- contract is one output row per INPUT id, so a null/empty-text
        -- document must appear here too (n_spans=0, clean_text '')
        SELECT d.doc_id, CAST(coalesce(c.n_spans, 0) AS BIGINT) AS n_spans
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n_spans FROM ex GROUP BY 1) c
            USING (doc_id)
    ), agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(unit, ' ' ORDER BY idx) AS clean_text
        FROM kept GROUP BY 1
    )
    SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.n_spans,
           CAST(s.n_spans - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped,
           coalesce(a.clean_text, '') AS clean_text
    FROM stats s LEFT JOIN agg a USING (doc_id)
    """,
    doc="Repeated-span removal (operators/dedup.py::span_dedup) — the "
    "C4/RefinedWeb sub-document dedup whole-doc MinHash cannot see: any "
    "10-token span of the normalized token stream whose hash occurs "
    "more than once ACROSS the corpus is dropped from every document, "
    "and the survivors reassemble in order. Explode (map) -> blacklist "
    "aggregation on the span hash (map-side combinable) -> anti-join "
    "exploded spans against the blacklist (equi-join; AQE broadcasts "
    "the rare tail) -> per-doc reassembly keyed by doc. The planted "
    "exact/near-dup documents make the pass non-vacuous here (their "
    "aligned spans collide); in curate it runs AFTER doc-level "
    "keep-one, so what it removes is cross-document boilerplate.",
)
def t20_paragraph_dedup(spark, sf_dir):
    return dedup.span_dedup(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        span_tokens=T20_SPAN_TOKENS,
        max_occurrences=T20_MAX_OCC,
    )


# The driver corpus is single-line (no "\n\n"), which left span_dedup's
# separator mode — the literal C4/RefinedWeb formulation — tested but
# never oracle-checked (open since r6). ' the ' occurs in ~3/4 of the
# synthetic docs, so splitting on it exercises the real separator path:
# literal split, normalized-unit hashing, same-separator reassembly.
T20B_SEPARATOR = " the "


@q(
    "t20b_separator_dedup",
    f"""
    WITH sp AS (
        SELECT doc_id, str_split(text, '{T20B_SEPARATOR}') AS sp FROM documents
    ), ex AS (
        SELECT doc_id, u.i AS idx, sp[u.i] AS unit,
               md5(trim(regexp_replace(lower(sp[u.i]), '\\s+', ' ', 'g'))) AS h
        FROM sp CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(sp) + 1)) AS i
        ) u
    ), bl AS (
        SELECT h FROM ex GROUP BY h HAVING count(*) > {T20_MAX_OCC}
    ), kept AS (
        SELECT ex.* FROM ex LEFT JOIN bl ON ex.h = bl.h WHERE bl.h IS NULL
    ), stats AS (
        SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_spans
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1) c
            USING (doc_id)
    ), agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(unit, '{T20B_SEPARATOR}' ORDER BY idx) AS clean_text
        FROM kept GROUP BY 1
    )
    SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.n_spans,
           CAST(s.n_spans - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped,
           coalesce(a.clean_text, '') AS clean_text
    FROM stats s LEFT JOIN agg a USING (doc_id)
    """,
    doc="Separator-mode repeated-span removal — span_dedup's OTHER mode "
    "(operators/dedup.py::span_dedup, separator=' the '), the literal "
    "C4 (Raffel et al., JMLR 2020) / RefinedWeb repeated-paragraph "
    "formulation: documents split on a literal separator, each unit "
    "hashed on its NORMALIZED text (lower + collapse + trim), any unit "
    "occurring more than once across the corpus dropped everywhere, "
    "survivors rejoined with the same separator. In production the "
    "separator is '\\n\\n' (paragraphs) or '\\n' (lines); the driver "
    "corpus is single-line, so the entry synthesizes paragraph "
    "boundaries from a frequent token — same code path, non-vacuous "
    "(~8% of units are cross-document repeats at sf0.01). Same "
    "explode -> blacklist agg -> anti-join -> keyed reassembly shape "
    "as t20: nothing O(corpus) in one task, blacklist is the rare "
    "tail (AQE broadcasts it).",
)
def t20b_separator_dedup(spark, sf_dir):
    return dedup.span_dedup(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        max_occurrences=T20_MAX_OCC,
        separator=T20B_SEPARATOR,
    )


T21_ALPHA = 0.7
T21_BUDGET_NUM = 3
T21_BUDGET_DEN = 5


@q(
    "t21_domain_mixture",
    f"""
    WITH cnt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_domain
        FROM documents GROUP BY 1
    ), mic AS (
        SELECT source, n_domain,
               CAST(round(pow(n_domain, {T21_ALPHA}) * 1000000) AS BIGINT) AS micro
        FROM cnt
    ), tot AS (
        SELECT CAST(sum(micro) AS BIGINT) AS tot,
               CAST(sum(n_domain) AS BIGINT) AS n_total
        FROM mic
    ), tgt AS (
        SELECT source, n_domain,
               least(n_domain,
                     CAST((micro * ((n_total * {T21_BUDGET_NUM}) // {T21_BUDGET_DEN}))
                          // tot AS BIGINT)) AS mix_target
        FROM mic CROSS JOIN tot
    ), ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS r
        FROM documents d
    )
    SELECT CAST(r.doc_id AS BIGINT) AS doc_id, r.source,
           CAST(r.r AS INT) AS sel_rank, t.n_domain, t.mix_target
    FROM ranked r JOIN tgt t USING (source) WHERE r.r <= t.mix_target
    """,
    doc="Temperature-weighted domain mixture (operators/sampling.py::"
    "temperature_mixture, alpha=0.7, 60% corpus budget) — the "
    "count^alpha mixture-sampling recipe (XLM/mT5): per-domain weights "
    "COME FROM the corpus counts, generalizing the given-weights t13 "
    "and the hard-cap t15. Weights quantize to integer micro-units and "
    "targets use integer div end to end, so the mixture is "
    "bit-reproducible cross-engine; selection is hash-ranked (md5(id), "
    "t12's machinery) making the kept set stable across runs and "
    "monotone under budget growth. Count agg -> broadcast the "
    "constant-size per-domain target table -> two-phase sharded top-k "
    "per domain (no single task sorts a whole domain).",
)
def t21_domain_mixture(spark, sf_dir):
    from ..operators.sampling import temperature_mixture

    return temperature_mixture(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "source",
        alpha=T21_ALPHA,
        budget_num=T21_BUDGET_NUM,
        budget_den=T21_BUDGET_DEN,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        "sel_rank",
        "n_domain",
        "mix_target",
    )


# 5/9 (not t21's 3/5): the synthetic sources are equal-sized, and a
# budget the domain count divides exactly leaves zero remainder — this
# ratio forces a real leftover so the largest-remainder leg is
# value-checked, not just compiled
T22_BUDGET_NUM = 5
T22_BUDGET_DEN = 9


@q(
    "t22_domain_mixture_exact",
    f"""
    WITH cnt AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_domain
        FROM documents GROUP BY 1
    ), mic AS (
        SELECT source, n_domain,
               CAST(round(pow(n_domain, {T21_ALPHA}) * 1000000) AS BIGINT) AS micro
        FROM cnt
    ), tot AS (
        SELECT CAST(sum(micro) AS BIGINT) AS tot,
               CAST(sum(n_domain) AS BIGINT) AS n_total
        FROM mic
    ), base AS (
        SELECT source, n_domain,
               CAST((micro * ((n_total * {T22_BUDGET_NUM}) // {T22_BUDGET_DEN}))
                    // tot AS BIGINT) AS fl,
               CAST((micro * ((n_total * {T22_BUDGET_NUM}) // {T22_BUDGET_DEN}))
                    % tot AS BIGINT) AS rem
        FROM mic CROSS JOIN tot
    ), t0 AS (
        SELECT source, n_domain, least(n_domain, fl) AS t0,
               fl < n_domain AS uncapped, rem
        FROM base
    ), lft AS (
        SELECT CAST(((SELECT (n_total * {T22_BUDGET_NUM}) // {T22_BUDGET_DEN} FROM tot)
                     - sum(t0)) AS BIGINT) AS leftover
        FROM t0
    ), tgt AS (
        SELECT source, n_domain,
               CAST(t0 + CASE WHEN uncapped AND
                    row_number() OVER (
                        ORDER BY CASE WHEN uncapped THEN rem ELSE -1 END DESC,
                                 source)
                    <= (SELECT leftover FROM lft)
                    THEN 1 ELSE 0 END AS BIGINT) AS mix_target
        FROM t0
    ), ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS r
        FROM documents d
    )
    SELECT CAST(r.doc_id AS BIGINT) AS doc_id, r.source,
           CAST(r.r AS INT) AS sel_rank, t.n_domain, t.mix_target
    FROM ranked r JOIN tgt t USING (source) WHERE r.r <= t.mix_target
    """,
    doc="t21's exact-budget twin: the largest-remainder (Hamilton) "
    "topping — after integer-floor targets, uncapped domains ranked by "
    "remainder descending (ties by name) each absorb one leftover doc, "
    "so the mixture hits the budget exactly unless caps eat it (never "
    "oversampled). The topping is one deterministic pass over the "
    "CONSTANT-SIZE domain table: the single-partition rank window sees "
    "n_domains rows, never the corpus; everything else is t21's plan. "
    "The 5/9 budget forces a nonzero leftover on the equal-sized "
    "synthetic sources, so the remainder leg is value-checked "
    "cross-engine.",
)
def t22_domain_mixture_exact(spark, sf_dir):
    from ..operators.sampling import temperature_mixture

    return temperature_mixture(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "source",
        alpha=T21_ALPHA,
        budget_num=T22_BUDGET_NUM,
        budget_den=T22_BUDGET_DEN,
        exact_budget=True,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        "sel_rank",
        "n_domain",
        "mix_target",
    )


@q(
    "a2_cms_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), grams AS (
        SELECT tk[u.i] || ' ' || tk[u.i + 1] AS gram
        FROM toks CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(tk))) AS i
        ) u
    )
    SELECT gram,
           CAST(count(*) AS BIGINT) AS exact_n,
           CAST(row_number() OVER (ORDER BY count(*) DESC, gram) AS INT) AS rank,
           TRUE AS est_ge_exact,
           TRUE AS est_within_eps
    FROM grams GROUP BY gram ORDER BY exact_n DESC, gram LIMIT 10
    """,
    doc="Count-min-sketch bigram heavy hitters (operators/sketches.py): "
    "the custom MERGEABLE sketch case — a1 is the built-in HLL/KLL "
    "path; this builds a CMS from pure JVM expressions. The sketch is "
    "an additive depth x width counter matrix, so the distributed "
    "build is explode-each-occurrence-into-its-cells + count per cell: "
    "map-side partial aggregation collapses the stream to <= 1024 "
    "partial rows per task before the single exchange, and the "
    "materialized sketch (<= 1024 rows) broadcasts to the estimate "
    "join. Like a1/s7, raw sketch cells are engine-specific, so the "
    "driver-checked result is the exact top-10 bigrams (count desc, "
    "gram) — non-vacuous tie-breaking at sf0.01 — plus per-key audit "
    "booleans for the CMS laws: est >= exact (collisions only add) "
    "and est <= exact + 4/width * N. Production at 100 TB replaces "
    "the exact-audit candidates with per-partition local top-m "
    "proposal; the sketch plan is unchanged.",
)
def a2_cms_heavy_hitters(spark, sf_dir):
    from ..operators import sketches
    from ..operators.dedup import tokens as _tokens

    d = t(spark, sf_dir, "documents")
    tk = d.select(_tokens(F.col("text")).alias("_tk"))
    n = F.size("_tk")
    # pinned: the gram stream feeds BOTH the exact audit aggregation and
    # the sketch build — unpinned, each pass re-tokenizes the corpus
    grams = tk.select(
        F.explode(
            F.zip_with(
                F.slice("_tk", 1, n - 1),
                F.slice("_tk", 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram")
    ).transform(pin)
    return sketches.cms_heavy_hitters(grams, "gram", depth=4, width=256, topk=10)


@q(
    "a3_mg_cms_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS tk FROM documents
    ), words AS (
        SELECT unnest(tk) AS token FROM toks
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS exact_n,
           CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS INT) AS rank,
           TRUE AS proposed_by_mg,
           TRUE AS est_ge_exact
    FROM words GROUP BY token ORDER BY exact_n DESC, token LIMIT 10
    """,
    doc="Bounded-memory heavy hitters — the PRODUCTION path a2's doc "
    "promises: per-partition Misra-Gries candidate proposal (<= m=64 "
    "counters per partition via mergeable-summary reduction in "
    "mapInPandas — O(m) state however large the partition) + count-min "
    "estimates for the proposed keys. No exact per-key aggregation "
    "feeds the REPORTING path; the exact top-10 unigram counts here "
    "are the AUDIT (like s7's recall probe): proposed_by_mg asserts "
    "every true heavy hitter was proposed — guaranteed in this corpus "
    "regime because m >= the unigram vocabulary, and at scale by the "
    "MG floor freq > n_partition/(m+1) with m sized to 1/eps — and "
    "est_ge_exact is the CMS no-underestimate law on those keys.",
)
def a3_mg_cms_heavy_hitters(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..operators import sketches
    from ..operators.dedup import tokens as _tokens
    from ..pinning import pin

    d = t(spark, sf_dir, "documents")
    # pinned: the token stream has THREE consumers (MG proposal, exact
    # audit, sketch build) — one tokenize pass instead of three
    words = d.select(F.explode(_tokens(F.col("text"))).alias("token")).transform(pin)
    cands = (
        sketches.misra_gries_candidates(words, "token", m=64)
        .select(F.col("key").alias("token"))
        .distinct()
        .withColumn("proposed", F.lit(True))
    )
    exact = (
        words.groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_n"))
        .transform(pin)
    )
    top = exact.orderBy(F.desc("exact_n"), F.asc("token")).limit(10)
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("exact_n"), F.asc("token")))
        .cast("int"),
    )
    sketch = sketches.cms_sketch(words, "token", depth=4, width=256)
    est = sketches.cms_estimate(ranked, sketch, "token", depth=4, width=256)
    return (
        est.join(F.broadcast(cands), "token", "left")
        .select(
            "token",
            "exact_n",
            "rank",
            F.coalesce("proposed", F.lit(False)).alias("proposed_by_mg"),
            (F.col("est") >= F.col("exact_n")).alias("est_ge_exact"),
        )
        .orderBy("rank")
    )


@q(
    "a9_lake_embedding_drift",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), corp AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), x AS (
        SELECT CAST(u.i - 1 AS INT) AS d,
               CAST(round(corp.v[u.i] * 1000) AS BIGINT) AS m
        FROM corp CROSS JOIN LATERAL (
            SELECT unnest(range(1, {PQ_N_SUB * PQ_SUB_DIM} + 1)) AS i
        ) u
    )
    SELECT d, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(m) AS BIGINT) AS s_milli,
           CAST(sum(m * m) AS BIGINT) AS ss_milli
    FROM x GROUP BY d
    """,
    doc="The embedding lake's STORED drift facet (jobs/"
    "embedding_index_lake.py::read_index_estats over the demo index — "
    "corpus ingested as two real batches, then compacted): each ingest "
    "persists per-dimension additive sufficient statistics (count, "
    "sum, sum-of-squares of milli-quantized coordinates — dim rows per "
    "batch), compaction REDUCES them by SUM, and the merged stored "
    "rows serve corpus-wide per-dimension mean/variance: the signal "
    "that the IVF quantizer's training-time geometry has gone stale "
    "and an s12 reindex is due — without ever re-scanning the "
    "vectors. The oracle re-derives the merged statistics from raw "
    "parquet (quantize-once then integer sums, so cross-engine float "
    "summation order cannot flip a bit), proving "
    "ingest-persist -> compact-merge -> read bit-exact, the a6/a7 "
    "pattern applied to the embedding lake. Extends the facet "
    "protocol symmetrically: every incremental lake in the repo now "
    "carries mergeable intake statistics beside its commit markers.",
)
def a9_lake_embedding_drift(spark, sf_dir):
    from ..jobs.embedding_index_lake import (
        read_index_estats,
        sf_estats_index_root,
    )

    root = sf_estats_index_root(spark, sf_dir)
    return read_index_estats(spark, root).select(
        F.col("d").cast("int").alias("d"), "n", "s_milli", "ss_milli"
    )


@q(
    "s24_residual_ivfpq",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM e ORDER BY vec_id LIMIT 8
    ), ranked_cells AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT e.vec_id AS vid, cents.cell_id,
                   list_dot_product(e.v, cents.cv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM e CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, cell_id FROM ranked_cells WHERE cell_rank = 1
    ), res AS (
        SELECT m.nn_id AS vec_id, m.cell_id,
               list_transform(range(1, {PQ_N_SUB * PQ_SUB_DIM + 1}),
                              i -> e.v[i] - c.cv[i]) AS r
        FROM members m JOIN e ON e.vec_id = m.nn_id
        JOIN cents c USING (cell_id)
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, r AS cw
        FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT res.vec_id, ms.m,
               res.r[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM res CROSS JOIN ms
    ), cbsub AS (
        SELECT cb.j, ms.m,
               cb.cw[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS cw
        FROM cb CROSS JOIN ms
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), probes AS (
        SELECT vid AS qid, cell_id FROM ranked_cells
        WHERE cell_rank <= 2 AND vid < 5
    ), qres AS (
        SELECT p.qid, p.cell_id,
               list_transform(range(1, {PQ_N_SUB * PQ_SUB_DIM + 1}),
                              i -> e.v[i] - c.cv[i]) AS qr
        FROM probes p JOIN e ON e.vec_id = p.qid
        JOIN cents c USING (cell_id)
    ), qsub AS (
        SELECT qres.qid, qres.cell_id, ms.m,
               qres.qr[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}]
                   AS qsv
        FROM qres CROSS JOIN ms
    ), adc AS (
        SELECT p.qid, mem.nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM probes p
        JOIN members mem USING (cell_id)
        JOIN best b ON b.vec_id = mem.nn_id
        JOIN qsub q ON q.qid = p.qid AND q.cell_id = p.cell_id AND q.m = b.m
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        WHERE mem.nn_id != p.qid
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN e eq ON eq.vec_id = s.qid
        JOIN e ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="RESIDUAL-encoded IVF-PQ (operators/similarity.py::"
    "residual_ivfpq_topk) — the refinement that makes IVF-PQ the "
    "FAISS default (Jegou et al., TPAMI 2011 section III.C): members "
    "are PQ-coded as r = v - centroid(assigned cell) instead of raw "
    "vectors (s17), so the code budget quantizes the residual "
    "distribution the coarse quantizer left over and ADC approximates "
    "the true within-cell L2 ||(q-c)-(x-c)||. The query-side price is "
    "explicit: one integer lookup table per (query, PROBED cell) — "
    "the query's own residual against that cell — instead of one per "
    "query; with n_probe constant that is a bounded kernel, not a "
    "corpus cost. Everything else keeps s17's shape: one broadcast-"
    "centroid residual map (JVM zip_with, no shuffle), the s14 encode "
    "kernel pointed at residuals, ONE equi-join on cell_id, bounded "
    "exact-cosine rescore. The oracle re-derives assignment, every "
    "residual, the residual codebook, every code, every per-cell "
    "table entry, and both rankings from raw parquet — a single "
    "drifted residual flips the hash.",
)
def s24_residual_ivfpq(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    return similarity.residual_ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=3,
        shortlist=PQ_SHORTLIST,
        n_cells=8,
        n_probe=2,
        n_sub=PQ_N_SUB,
        n_codes=PQ_N_CODES,
    )


@q(
    "s25_residual_lake_search",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), corp AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), batch AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} = 0
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM corp ORDER BY vec_id LIMIT {S11_N_CELLS}
    ), m_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT corp.vec_id AS vid, cents.cell_id,
                   list_dot_product(corp.v, cents.cv) /
                       (sqrt(list_dot_product(corp.v, corp.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM corp CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, cell_id FROM m_ranked WHERE cell_rank = 1
    ), res AS (
        SELECT m.nn_id AS vec_id, m.cell_id,
               list_transform(range(1, {PQ_N_SUB * PQ_SUB_DIM + 1}),
                              i -> corp.v[i] - c.cv[i]) AS r
        FROM members m JOIN corp ON corp.vec_id = m.nn_id
        JOIN cents c USING (cell_id)
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, r AS cw
        FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), ms AS (
        SELECT unnest(range(0, {PQ_N_SUB})) AS m
    ), sub AS (
        SELECT res.vec_id, ms.m,
               res.r[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM res CROSS JOIN ms
    ), cbsub AS (
        SELECT cb.j, ms.m,
               cb.cw[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS cw
        FROM cb CROSS JOIN ms
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), p_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT batch.vec_id AS vid, cents.cell_id,
                   list_dot_product(batch.v, cents.cv) /
                       (sqrt(list_dot_product(batch.v, batch.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM batch CROSS JOIN cents
        )
    ), probes AS (
        SELECT vid AS qid, cell_id FROM p_ranked WHERE cell_rank <= {S11_N_PROBE}
    ), qres AS (
        SELECT p.qid, p.cell_id,
               list_transform(range(1, {PQ_N_SUB * PQ_SUB_DIM + 1}),
                              i -> batch.v[i] - c.cv[i]) AS qr
        FROM probes p JOIN batch ON batch.vec_id = p.qid
        JOIN cents c USING (cell_id)
    ), qsub AS (
        SELECT qres.qid, qres.cell_id, ms.m,
               qres.qr[ms.m * {PQ_SUB_DIM} + 1 : ms.m * {PQ_SUB_DIM} + {PQ_SUB_DIM}]
                   AS qsv
        FROM qres CROSS JOIN ms
    ), adc AS (
        SELECT p.qid, mem.nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM probes p
        JOIN members mem USING (cell_id)
        JOIN best b ON b.vec_id = mem.nn_id
        JOIN qsub q ON q.qid = p.qid AND q.cell_id = p.cell_id AND q.m = b.m
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        WHERE mem.nn_id != p.qid
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN e eq ON eq.vec_id = s.qid
        JOIN e ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="Residual IVF-PQ served from the LAKE (jobs/embedding_index_"
    "lake.py::build_pq_layer residual=True + pq_layer_search) — s24's "
    "refinement as a STORED layer, the s14->s20 promotion applied to "
    "residual codes: the committed codes/ parquet encodes every "
    "member's residual against its STORED cell assignment, "
    "codebook.json records residual=true, and the search builds its "
    "integer tables from each query's own per-probed-cell residual "
    "(n_probe REQUIRED — a residual has no meaning without the cell; "
    "the conflicting-request and refresh rules follow the OPQ layer's "
    "staged-swap protocol unchanged). The oracle re-derives the whole "
    "stored state — assignment, residuals, codebook, codes, per-cell "
    "tables, both rankings — from raw parquet, proving "
    "ingest-persist -> staged-build -> stored-row serve equals "
    "from-scratch. At 100 TB the residual layer costs what the raw "
    "layer costs (one more broadcast zip_with at build) and buys the "
    "within-cell ADC fidelity that makes the FAISS default the "
    "default.",
)
def s25_residual_lake_search(spark, sf_dir):
    from ..jobs.embedding_index_lake import (
        pq_layer_search,
        sf_residual_index_root,
    )

    emb = t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % S11_BATCH_MOD == 0)
    root = sf_residual_index_root(spark, sf_dir)
    return pq_layer_search(
        spark, root, batch, k=3, shortlist=PQ_SHORTLIST, n_probe=S11_N_PROBE
    )


@q(
    "s26_opq_residual_search",
    f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), corp AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} != 0
    ), batch AS (
        SELECT vec_id, v FROM e WHERE vec_id % {S11_BATCH_MOD} = 0
    ), cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM corp ORDER BY vec_id LIMIT {S11_N_CELLS}
    ), m_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT corp.vec_id AS vid, cents.cell_id,
                   list_dot_product(corp.v, cents.cv) /
                       (sqrt(list_dot_product(corp.v, corp.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM corp CROSS JOIN cents
        )
    ), members AS (
        SELECT vid AS nn_id, cell_id FROM m_ranked WHERE cell_rank = 1
    ), res AS (
        SELECT m.nn_id AS vec_id, m.cell_id,
               list_transform(range(1, {PQ_N_SUB * PQ_SUB_DIM + 1}),
                              i -> corp.v[i] - c.cv[i]) AS r
        FROM members m JOIN corp ON corp.vec_id = m.nn_id
        JOIN cents c USING (cell_id)
    ), rsamp AS (
        SELECT vec_id, r FROM res WHERE vec_id % {S13_SAMPLE_MOD} = 0
    ), vars AS (
        SELECT u.i AS d,
               CAST(floor(var_pop(r[u.i]) * 1000000 + 0.5) AS BIGINT) AS vmic
        FROM rsamp CROSS JOIN LATERAL (
            SELECT unnest(range(1, {PQ_N_SUB * PQ_SUB_DIM} + 1)) AS i
        ) u
        GROUP BY u.i
    ), snake AS (
        SELECT d,
               CAST(CASE WHEN ((r0 // {PQ_N_SUB}) % 2) = 0 THEN r0 % {PQ_N_SUB}
                         ELSE {PQ_N_SUB - 1} - (r0 % {PQ_N_SUB}) END AS INT) AS m,
               CAST(r0 // {PQ_N_SUB} AS INT) AS rnd
        FROM (
            SELECT d, row_number() OVER (ORDER BY vmic DESC, d ASC) - 1 AS r0
            FROM vars
        )
    ), cb AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, r AS cw
        FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT {PQ_N_CODES})
    ), sub AS (
        SELECT res.vec_id, sn.m, list(res.r[sn.d] ORDER BY sn.rnd) AS sv
        FROM res CROSS JOIN snake sn GROUP BY 1, 2
    ), cbsub AS (
        SELECT cb.j, sn.m, list(cb.cw[sn.d] ORDER BY sn.rnd) AS cw
        FROM cb CROSS JOIN snake sn GROUP BY 1, 2
    ), best AS (
        SELECT vec_id, m, j FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY -2 * list_dot_product(s.sv, c.cw)
                                  + list_dot_product(c.cw, c.cw) ASC, c.j ASC
                   ) AS rnk
            FROM sub s JOIN cbsub c USING (m)
        ) WHERE rnk = 1
    ), p_ranked AS (
        SELECT vid, cell_id,
               row_number() OVER (PARTITION BY vid ORDER BY cell_sim DESC, cell_id ASC)
                   AS cell_rank
        FROM (
            SELECT batch.vec_id AS vid, cents.cell_id,
                   list_dot_product(batch.v, cents.cv) /
                       (sqrt(list_dot_product(batch.v, batch.v)) *
                        sqrt(list_dot_product(cents.cv, cents.cv))) AS cell_sim
            FROM batch CROSS JOIN cents
        )
    ), probes AS (
        SELECT vid AS qid, cell_id FROM p_ranked WHERE cell_rank <= {S11_N_PROBE}
    ), qres AS (
        SELECT p.qid, p.cell_id,
               list_transform(range(1, {PQ_N_SUB * PQ_SUB_DIM + 1}),
                              i -> batch.v[i] - c.cv[i]) AS qr
        FROM probes p JOIN batch ON batch.vec_id = p.qid
        JOIN cents c USING (cell_id)
    ), qsub AS (
        SELECT qres.qid, qres.cell_id, sn.m,
               list(qres.qr[sn.d] ORDER BY sn.rnd) AS qsv
        FROM qres CROSS JOIN snake sn GROUP BY 1, 2, 3
    ), adc AS (
        SELECT p.qid, mem.nn_id,
               CAST(sum(CAST(round((list_dot_product(q.qsv, q.qsv)
                   + (-2 * list_dot_product(q.qsv, c.cw)
                      + list_dot_product(c.cw, c.cw))) * 1000000) AS BIGINT))
                    AS BIGINT) AS adc_micro
        FROM probes p
        JOIN members mem USING (cell_id)
        JOIN best b ON b.vec_id = mem.nn_id
        JOIN qsub q ON q.qid = p.qid AND q.cell_id = p.cell_id AND q.m = b.m
        JOIN cbsub c ON c.m = b.m AND c.j = b.j
        WHERE mem.nn_id != p.qid
        GROUP BY 1, 2
    ), short AS (
        SELECT qid, nn_id, adc_micro FROM (
            SELECT qid, nn_id, adc_micro,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY adc_micro ASC, nn_id ASC) AS srnk
            FROM adc
        ) WHERE srnk <= {PQ_SHORTLIST}
    ), rescored AS (
        SELECT s.qid AS query_id, s.nn_id, s.adc_micro,
               list_dot_product(eq.v, ec.v) /
                   (sqrt(list_dot_product(eq.v, eq.v)) *
                    sqrt(list_dot_product(ec.v, ec.v))) AS cs
        FROM short s
        JOIN e eq ON eq.vec_id = s.qid
        JOIN e ec ON ec.vec_id = s.nn_id
    )
    SELECT query_id, nn_id, CAST(rnk AS INT) AS rank,
           ROUND(cs, 6) AS cos_sim, adc_micro
    FROM (
        SELECT query_id, nn_id, adc_micro, cs,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, nn_id ASC) AS rnk
        FROM rescored
    ) WHERE rnk <= 3
    """,
    doc="The full FAISS OPQ+IVF-PQ stack served from the LAKE "
    "(jobs/embedding_index_lake.py::build_pq_layer residual=True, "
    "opq=True + pq_layer_search): s25's residual layer with the s21 "
    "variance-balancing permutation TRAINED ON THE RESIDUAL SAMPLE — "
    "the distribution the code budget actually quantizes. For a "
    "coordinate permutation residual and permute commute "
    "(perm(v) - perm(c) = perm(v - c)), so the composition is one "
    "consistent geometry: stored codes encode permuted residuals, "
    "codebook.json records both perm and residual=true, and the "
    "search permutes each query's per-probed-cell residual before "
    "building its integer tables (the exact-cosine rescore uses raw "
    "vectors, where the permutation cancels). Same staged-swap / "
    "conflicting-request / n_probe-required rules as both parents. "
    "The oracle composes s25's whole-state re-derivation with s22's "
    "snake-permutation SQL over the residual frame — assignment, "
    "residuals, permutation, codebook, codes, per-cell tables, both "
    "rankings all re-derived from raw parquet.",
)
def s26_opq_residual_search(spark, sf_dir):
    from ..jobs.embedding_index_lake import (
        pq_layer_search,
        sf_opq_residual_index_root,
    )

    emb = t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % S11_BATCH_MOD == 0)
    root = sf_opq_residual_index_root(spark, sf_dir)
    return pq_layer_search(
        spark, root, batch, k=3, shortlist=PQ_SHORTLIST, n_probe=S11_N_PROBE
    )


_T32_KEY_SQL = "coalesce(lab.cluster_id, d.doc_id)"
_T32_BUCKET_SQL = (
    f"CAST(('0x' || substr(md5(CAST({_T32_KEY_SQL} AS VARCHAR)), 1, 4)) "
    "AS INT) % 100"
)


@q(
    "t32_leakage_safe_split",
    f"""
    WITH RECURSIVE verified AS ({_D7_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM verified
        UNION
        SELECT doc_b, doc_a FROM verified
    ),
    reach(node, r) AS (
        SELECT u, v FROM edges
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ),
    lab AS (
        SELECT node, LEAST(node, MIN(r)) AS cluster_id
        FROM reach GROUP BY node
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST({_T32_KEY_SQL} AS BIGINT) AS split_key,
           CAST({_T32_BUCKET_SQL} AS INT) AS bucket,
           CASE WHEN {_T32_BUCKET_SQL} < 90 THEN 'train'
                WHEN {_T32_BUCKET_SQL} < 95 THEN 'val'
                ELSE 'test'
           END AS split
    FROM documents d LEFT JOIN lab ON lab.node = d.doc_id
    """,
    doc="Leakage-safe holdout split (operators/sampling.py::"
    "leakage_safe_split): split assignment keyed by the near-dup "
    "CLUSTER id instead of the document id, so no near-duplicate pair "
    "straddles train and the holdouts — the benchmark-contamination "
    "path Lee et al. 2022 measure (a kept near-dup of a train doc "
    "landing in test turns eval into memorization). d8's whole "
    "machinery re-pointed at split assignment: band-join candidates, "
    "exact verify, connected components, then the t12 bucket formula "
    "over split_key = cluster min id (unclustered docs key on "
    "themselves). The oracle carries the full recursive closure, so a "
    "single doc split under the wrong key flips the hash.",
)
def t32_leakage_safe_split(spark, sf_dir):
    from ..operators.sampling import leakage_safe_split

    sig, _ = _sig_lake(spark, sf_dir)
    return leakage_safe_split(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        threshold=JACCARD_THRESHOLD, n=SIG_SHINGLE_N,
        signature_df=sig, shingle_df=sig.select("doc", "shingles"),
    ).select("doc_id", "split_key", "bucket", "split")


# The energy-delta fingerprint rows of an asset set CTE named
# {src}(asset_id, text): m5's digest energy per frame (iid per
# (asset, frame) — see audio_fingerprint's docstring for why NOT the
# m5b synth, whose quasi-periodic envelope collapses delta-signs),
# bit k = 1 iff energy[k+1] > energy[k], packed in two positive
# 32-bit words. Shared by the m10 fingerprint oracle and the m10b
# pair oracle.
_M10_FP_SQL = f"""a AS (
        SELECT asset_id, md5(text) AS cmd5,
               1000 + CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT)
                   AS n_samples
        FROM {{src}}
    ), f AS (
        SELECT asset_id, cmd5,
               (n_samples - {M5_FRAME}) // {M5_HOP} + 1 AS n_frames
        FROM a
    ), en AS (
        SELECT asset_id, n_frames, u.k AS frame_idx,
               CAST(('0x' || substr(md5(cmd5 || ':' || CAST(u.k AS VARCHAR)),
                                    1, 8)) AS BIGINT) AS energy
        FROM f CROSS JOIN LATERAL (SELECT unnest(range(0, n_frames)) AS k) u
        WHERE n_frames >= 65 AND u.k <= 64
    ), bits AS (
        SELECT asset_id, n_frames, frame_idx,
               CASE WHEN lead(energy) OVER (PARTITION BY asset_id
                                            ORDER BY frame_idx) > energy
                    THEN 1 ELSE 0 END AS bit
        FROM en
    ), fp AS (
        SELECT asset_id,
               CAST(any_value(n_frames) AS BIGINT) AS n_frames,
               CAST(coalesce(sum(CASE WHEN frame_idx < 32 AND bit = 1
                    THEN 1::BIGINT << CAST(frame_idx AS INT) ELSE 0 END), 0)
                    AS BIGINT) AS fp_lo,
               CAST(coalesce(sum(CASE WHEN frame_idx >= 32 AND bit = 1
                    THEN 1::BIGINT << CAST(frame_idx - 32 AS INT) ELSE 0 END),
                    0) AS BIGINT) AS fp_hi
        FROM bits WHERE frame_idx < 64 GROUP BY asset_id
    )"""


@q(
    "m10_audio_fingerprint",
    f"""
    WITH src AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, text
        FROM documents WHERE text IS NOT NULL
    ), {_M10_FP_SQL.format(src="src")}
    SELECT asset_id, n_frames, fp_lo, fp_hi FROM fp
    """,
    doc="Energy-delta audio fingerprint (operators/multimodal.py::"
    "audio_fingerprint; the Haitsma-Kalker 2002 family): bit k = 1 "
    "iff frame k+1's energy strictly exceeds frame k's over the first "
    "65 frames — small re-encodes perturb absolute energies but "
    "rarely flip the envelope's up/down shape, which is why "
    "delta-sign bits are the standard robust audio identity. Rides "
    "the m5 framing kernel; energies are the per-frame digest stub "
    "(iid per (asset, frame) — the m5b PCM synth's quasi-periodic "
    "envelope would collapse every asset to a few phase-shifted "
    "patterns, the documented image-LCG failure mode, so the stub "
    "choice here is load-bearing and measured). Packed in two "
    "positive 32-bit words (the m6 rule), drop-in compatible with "
    "the banded-Hamming pair machinery. Assets under 65 frames are "
    "too short to fingerprint and emit no row. One kernel crossing "
    "per asset, one bounded per-asset lead window, conditional-sum "
    "pack — audio bytes never leave the kernel.",
)
def m10_audio_fingerprint(spark, sf_dir):
    from ..operators.multimodal import audio_fingerprint

    assets = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return audio_fingerprint(
        assets, frame_samples=M5_FRAME, hop_samples=M5_HOP
    )


@q(
    "m10b_audio_near_dups",
    f"""
    WITH src AS (
        SELECT CAST(doc_id AS VARCHAR) AS asset_id, text
        FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT CAST(doc_id + {M6B_COPY_OFFSET} AS VARCHAR), text
        FROM documents
        WHERE text IS NOT NULL AND doc_id % {M6B_COPY_EVERY} = 0
    ), {_M10_FP_SQL.format(src="src")}, keyed AS (
        SELECT asset_id, fp_lo, fp_hi, b.b AS band,
               CASE b.b
                   WHEN 0 THEN fp_lo & 65535
                   WHEN 1 THEN fp_lo >> 16
                   WHEN 2 THEN fp_hi & 65535
                   ELSE fp_hi >> 16
               END AS key
        FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    )
    SELECT DISTINCT l.asset_id AS asset_a, r.asset_id AS asset_b,
           CAST(bit_count(xor(l.fp_lo, r.fp_lo))
                + bit_count(xor(l.fp_hi, r.fp_hi)) AS INT) AS hamming
    FROM keyed l JOIN keyed r ON l.band = r.band AND l.key = r.key
    WHERE l.asset_id < r.asset_id
      AND bit_count(xor(l.fp_lo, r.fp_lo))
          + bit_count(xor(l.fp_hi, r.fp_hi)) <= {M6B_MAX_HAMMING}
    """,
    doc="Near-duplicate AUDIO pairs by banded Hamming blocking over "
    "the m10 fingerprints (operators/multimodal.py::audio_near_dups) "
    "— the m6b machinery re-pointed at the audio modality, completing "
    "the text/image/audio dedup triad: four 16-bit bands, pigeonhole-"
    "complete recall at max_hamming < n_bands, XOR+popcount verify. "
    "The asset set plants a re-encoded copy of every 50th document "
    "(same payload -> identical envelope -> hamming 0), so the pair "
    "output is non-empty at every SF and each planted pair survives "
    "the full kernel -> window -> pack -> band -> verify path. Same "
    "scale shape as m6b: O(collisions per 16-bit key) candidates, "
    "narrow integer rows, audio bytes never shuffle.",
)
def m10b_audio_near_dups(spark, sf_dir):
    from ..operators.multimodal import audio_fingerprint, audio_near_dups

    docs = t(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    ).unionByName(
        docs.filter(F.col("doc_id") % M6B_COPY_EVERY == 0).select(
            (F.col("doc_id") + M6B_COPY_OFFSET).cast("string").alias("asset_id"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    )
    # pinned: the fingerprint frame feeds BOTH sides of the band
    # self-join — unpinned, the whole m5 kernel chain would run twice
    fps = pin(
        audio_fingerprint(
            assets, frame_samples=M5_FRAME, hop_samples=M5_HOP
        ).select("asset_id", "fp_lo", "fp_hi")
    )
    return audio_near_dups(fps, max_hamming=M6B_MAX_HAMMING)
