"""Similarity search over embedding columns (SURVEY.md section 2.11).

Embeddings are ``array<float>`` columns. Dot products use
``F.zip_with`` + ``F.aggregate`` (JVM-side higher-order functions —
no Python in the loop). Two strategies:

- brute-force top-k: broadcast the (small) query set against the corpus,
  window top-k. Exact; cost O(|queries| * |corpus|) — the right baseline
  and the verifier for the approximate path.
- LSH-bucketed ANN: sign-random-projection buckets; candidates only meet
  within a bucket, so cost is O(n * bucket_size). The scale path for
  corpus-vs-corpus similarity at 100 TB.

All float math is done in double. Expression-path dots sum
left-to-right (array order), bit-reproducing the oracle's sequential
fold. The GEMM kernels (s3/s4/s5's hot stages) instead normalize then
BLAS-multiply — a different FP association that can differ from the
fold in final ulps, so their ROUND(.,6) outputs are exact-in-practice
rather than exact-by-construction (a flip needs the true cosine within
~1e-15 of a .5e-6 boundary; two driver rounds plus repr-strict raw
sweeps at two scale factors back it). Zero-norm vectors are a
documented PRECONDITION of the GEMM kernels (they substitute norm=1,
where the expression path yields NaN); tests assert the corpus is
zero-norm-free.

Methods are the standard published ones: sign-random-projection LSH for
cosine (Charikar, STOC 2002), inverted-file coarse quantization for ANN
(Jégou/Douze/Schmid, "Product quantization for nearest neighbor
search", TPAMI 2011 — the IVF part, without PQ codes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..pinning import pin
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the full corpus.

    ``queries`` is expected to be small — it collects to the driver as a
    constant-size matrix (the codebook/centroid pattern) and rides the
    scoring kernel as a NumPy closure, so the corpus never shuffles; the
    only shuffle is the per-query top-k window over
    partitions * |queries| * k candidate rows after the tie-safe
    per-partition top-k (local order = (-cos, id), the global rule, so
    local survivors are a superset of the global winners). Scoring is
    one BLAS GEMM per Arrow batch — measured value-identical to the
    zip_with/aggregate expression formulation on this host's BLAS
    (verified since s5 by the oracle sweeps at three SFs), at a
    fraction of its interpreted per-pair cost. That equality is
    empirical, not guaranteed: a blocked/FMA GEMM on another BLAS
    build could drift a last ulp at a near-tie pair and flip a rank
    vs an engine that sums sequentially — if a port sees rank flips
    at exact ties, rank on round(cos, 6) (the emitted precision)
    instead. Zero-norm vectors are rejected loudly (cosine is
    undefined; NaN would silently sort differently in NumPy, which
    orders it last, than in Spark's DESC, which treats it greatest).
    """
    import numpy as np
    import pandas as pd

    qrows = (
        queries.select(
            F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
        )
        .orderBy("qid")
        .collect()
    )
    c = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    out_schema = "query_id long, nn_id long, cos_sim double"
    if not qrows:
        return (
            c.limit(0)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("vec_id").alias("nn_id"),
                F.lit(1).cast("int").alias("rank"),
                F.lit(0.0).alias("cos_sim"),
            )
        )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    if (qn == 0.0).any():
        bad = [int(q) for q, n in zip(qids, qn) if n == 0.0]
        raise ValueError(f"zero-norm query vectors (cosine undefined): {bad}")

    # One BLAS GEMM per Arrow batch, then a TIE-SAFE local top-k per
    # query (order by -cos then id, exactly the global rule, so the
    # per-partition survivors are a superset of the global top-k): the
    # global window then ranks <= partitions * |q| * k narrow rows
    # instead of |q| * corpus pairs. The expression formulation paid
    # ~5-8us of interpreted higher-order-function cost per pair
    # (measured ~2 s for 118 x 2000 at sf0.1); the kernel does the
    # identical arithmetic (BLAS dot == list_dot_product bit-exactly,
    # proven since s5) in milliseconds.
    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            cn = np.sqrt((mat * mat).sum(axis=1))
            if (cn == 0.0).any():
                bad = [int(i) for i, n in zip(ids, cn) if n == 0.0]
                raise ValueError(
                    f"zero-norm corpus vectors (cosine undefined): {bad[:5]}"
                )
            sims = (mat @ Q.T) / np.outer(cn, qn)
            outq, outn, outs = [], [], []
            for j in range(len(qids)):
                col = sims[:, j]
                mask = ids != qids[j]
                cand_ids = ids[mask]
                cand = col[mask]
                order = np.lexsort((cand_ids, -cand))[: k]
                outq.extend([qids[j]] * len(order))
                outn.extend(cand_ids[order])
                outs.extend(cand[order])
            yield pd.DataFrame(
                {"query_id": outq, "nn_id": outn, "cos_sim": outs}
            )

    scored = c.mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


SRP_SEED = 421
SRP_DIM = 64  # testdata embedding dimensionality (TESTDATA.md)


def srp_hyperplanes(dim: int = SRP_DIM, n_bits: int = 4, seed: int = SRP_SEED) -> list[list[float]]:
    """``n_bits`` seeded random hyperplanes in R^dim (Charikar SRP-LSH,
    STOC 2002). Python's Mersenne Twister is deterministic across runs
    and platforms, so the same literal doubles can be embedded in both
    the Spark expression and the DuckDB oracle SQL — buckets stay
    data-independent AND cross-engine hash-checkable.
    """
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def srp_bucket(vec: Column, n_bits: int = 4, dim: int = SRP_DIM, seed: int = SRP_SEED) -> Column:
    """Sign-random-projection bucket id: bit i = sign(v . h_i) for the
    i-th seeded hyperplane, materialized as a literal double array so the
    projection runs JVM-side with zero data-dependent state. ``vec`` must
    be a double array of length ``dim`` (zip_with null-pads on length
    mismatch, which would poison the dot product).
    """
    b = F.lit(0)
    for i, plane in enumerate(srp_hyperplanes(dim, n_bits, seed)):
        h = F.array(*[F.lit(x) for x in plane])
        b = b + F.when(dot(vec, h) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def lsh_bucketed_topk(
    emb: DataFrame,
    k: int = 1,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs nearest neighbor: candidates share an SRP
    bucket. Equi-join on bucket id — shuffle partitions by bucket, no
    cross join ever materializes.
    """
    v = (
        emb.select(
            F.col(id_col).alias("vid"),
            as_double(F.col(vec_col)).alias("v"),
        )
        .withColumn("bucket", srp_bucket(F.col("v"), n_bits))
        .withColumn("nrm", l2_norm(F.col("v")))  # once per vector, not per pair
    )
    a, b = v.alias("a"), v.alias("b")
    scored = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") != F.col("b.vid"))
    ).select(
        F.col("a.vid").alias("query_id"),
        F.col("b.vid").alias("nn_id"),
        (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def bucketed_gemm_topk(
    emb: DataFrame,
    k: int = 1,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP-bucketed ANN with a vectorized-numpy inner loop: same bucket
    geometry as ``lsh_bucketed_topk``, but each bucket's similarity
    matrix is one BLAS GEMM inside ``applyInPandas`` instead of per-pair
    zip_with/aggregate expressions.

    This is the Arrow-batch escape hatch for when the JVM higher-order-
    function path becomes the bottleneck: per bucket, vectors land in
    one pandas group, are L2-normalized as a matrix, and V @ V.T scores
    every pair at BLAS speed. Bucket size bounds both memory and the
    O(b^2) work; the shuffle key is the bucket, exactly like the
    expression variant, so the plan scales identically.
    """
    import numpy as np
    import pandas as pd

    v = emb.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", srp_bucket(F.col("v"), n_bits))

    out_schema = "query_id long, nn_id long, rank int, cos_sim double"

    def topk_in_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        ids = pdf["vid"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        np.fill_diagonal(sims, -np.inf)
        rows = []
        kk = min(k, len(ids) - 1)
        if kk <= 0:
            return pd.DataFrame(columns=["query_id", "nn_id", "rank", "cos_sim"])
        for i in range(len(ids)):
            # stable top-k: sort by (-sim, nn_id) like the window variant
            order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))[:kk]
            for r, j in enumerate(order, start=1):
                rows.append((ids[i], ids[j], r, round(float(sims[i, j]), 6)))
        return pd.DataFrame(rows, columns=["query_id", "nn_id", "rank", "cos_sim"])

    return v.groupBy("bucket").applyInPandas(topk_in_bucket, out_schema)


def ivf_topk(
    emb: DataFrame,
    k: int = 1,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    query_ids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate all-pairs top-k: a coarse quantizer assigns
    every vector to its nearest cell; queries probe their ``n_probe``
    nearest cells and score only those cells' members.

    Default centroids are the ``n_cells`` lexicographically-first
    vectors (deterministic); pass ``centroids`` from
    ``fit_kmeans_centroids`` for trained cells — the plan is identical
    either way. The centroid assignment is a broadcast cross join
    against a CONSTANT-size centroid table (n x n_cells rows — by
    design, not a skew risk). Candidate scoring shuffles ONCE on
    cell_id into ``applyInPandas`` and runs each cell's query-member
    similarity block as one BLAS GEMM (the s5 kernel): the
    O(n * n_probe * avg_cell_size) candidate pairs never materialize
    as join rows carrying two vector arrays each — the expression
    formulation did exactly that and measured 6.5 s at sf0.1 against
    ~1 s for this shape. Each cell emits its per-query top-k with
    UNROUNDED sims; a global window then picks the final k from the
    <= k * n_probe survivors per query, so cross-cell ordering and tie
    handling are identical to the single-stage formulation.

    ``query_ids`` (a frame with ``id_col``) restricts the QUERY side:
    every vector still serves as an index member, but only listed ids
    probe and emit neighbors. This is the recall-probe / online-lookup
    shape — cost O(|queries| * probe * cell) instead of
    O(corpus * probe * cell); at 100 TB you never score the whole
    corpus to answer a sampled evaluation. Results for the listed ids
    are row-identical to the unrestricted run filtered afterward.
    """
    import numpy as np
    import pandas as pd
    v = emb.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    if centroids is not None:
        cents = centroids.select(
            F.col("cell_id"),
            as_double(F.col("centroid")).alias("cv"),
        ).withColumn("cn", l2_norm(F.col("cv")))
    else:
        cents = (
            v.orderBy("vid")
            .limit(n_cells)
            .select(
                F.col("vid").alias("cell_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
            )
        )
    scored_cells = v.crossJoin(F.broadcast(cents)).withColumn(
        "cell_sim", dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w_cell = Window.partitionBy("vid").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    ranked = scored_cells.withColumn("cell_rank", F.row_number().over(w_cell)).select(
        "vid", "v", "cell_id", "cell_rank"
    )
    if query_ids is not None:
        qflag = (
            query_ids.select(F.col(id_col).alias("vid"))
            .distinct()
            .withColumn("_isq", F.lit(True))
        )
        ranked = ranked.join(F.broadcast(qflag), "vid", "left").withColumn(
            "is_query", F.coalesce(F.col("_isq"), F.lit(False))
        )
        # members (rank-1 rows) flow for every PROBED cell — the index
        # serves the full corpus, but a cell no listed query probes
        # contributes nothing and its members would ride the kernel
        # shuffle as dead weight (at thousands-of-cells scale with a
        # small evaluation sample, that is most of the index). The
        # probed-cell list is bounded by n_probe * |queries| and
        # broadcast — same prune as embed_admit_batch.
        probes = ranked.filter(
            (F.col("cell_rank") == 1)
            | (F.col("is_query") & (F.col("cell_rank") <= n_probe))
        )
        # the queried-cell list comes from the QUERY-FILTERED subset,
        # not from `ranked` — the cell_rank window partitions by vid,
        # so ranking |queries| x n_cells rows yields identical ranks to
        # slicing the corpus-wide ranking, without re-running the full
        # crossJoin + window lineage just to build the broadcast side
        q_scored = (
            v.join(F.broadcast(query_ids.select(F.col(id_col).alias("vid")).distinct()), "vid")
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "cell_sim",
                dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")),
            )
        )
        queried_cells = (
            q_scored.withColumn("cell_rank", F.row_number().over(w_cell))
            .filter(F.col("cell_rank") <= n_probe)
            .select("cell_id")
            .distinct()
        )
        probes = probes.join(F.broadcast(queried_cells), "cell_id", "leftsemi")
    else:
        probes = ranked.filter(F.col("cell_rank") <= n_probe).withColumn(
            "is_query", F.lit(True)
        )

    cand_schema = "query_id long, nn_id long, cos_sim double"

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        member = pdf["cell_rank"].to_numpy() == 1
        qmask = pdf["is_query"].to_numpy()
        if not member.any() or not qmask.any():
            return pd.DataFrame(columns=["query_id", "nn_id", "cos_sim"])
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        ids = pdf["vid"].to_numpy()
        m_unit, m_ids = unit[member], ids[member]
        # column order = ascending member id, so a STABLE row argsort on
        # -sims breaks similarity ties by nn_id — same total order as
        # sorted(key=(-sim, id)) but vectorized across all queries
        perm = np.argsort(m_ids, kind="stable")
        m_unit, m_ids = m_unit[perm], m_ids[perm]
        q_unit, q_ids = unit[qmask], ids[qmask]
        sims = q_unit @ m_unit.T
        sims[q_ids[:, None] == m_ids[None, :]] = -np.inf  # self-match
        kk = min(k, m_ids.shape[0])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        qi = np.repeat(q_ids, kk)
        nn = m_ids[top.ravel()]
        cs = np.take_along_axis(sims, top, axis=1).ravel()
        keep = cs != -np.inf
        return pd.DataFrame(
            {"query_id": qi[keep], "nn_id": nn[keep], "cos_sim": cs[keep]}
        )

    cand = probes.groupBy("cell_id").applyInPandas(score_cell, cand_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def ivf_topk_multi_probe(
    emb: DataFrame,
    probe_values: list[int],
    k: int = 1,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: DataFrame | None = None,
) -> DataFrame:
    """Every ``n_probe`` in ``probe_values`` from ONE scored pass — the
    recall-audit shape (s13 sweeps the n_probe dial). Running
    :func:`ivf_topk` per probe value re-assigns, re-shuffles and
    re-scores the identical candidate blocks each time; here the cells
    are probed once at ``max(probe_values)``, the kernel keeps each
    query row's own cell rank (its probe rank for that cell's
    candidates), and the per-probe results are filters + windows over
    the ONE pinned candidate frame. Per (n_probe, query) rows are
    row-identical to the per-leg formulation: filtering candidates to
    probe_rank <= p yields exactly the cells an n_probe=p run probes,
    with the same per-cell top-k survivors feeding the same global
    window.

    Returns (n_probe int, query_id, nn_id, rank, cos_sim) — ivf_topk's
    output schema prefixed with the probe value.
    """
    import numpy as np
    import pandas as pd

    from ..pinning import pin

    max_probe = max(probe_values)
    v = emb.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    cents = (
        v.orderBy("vid")
        .limit(n_cells)
        .select(
            F.col("vid").alias("cell_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
        )
    )
    scored_cells = v.crossJoin(F.broadcast(cents)).withColumn(
        "cell_sim", dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w_cell = Window.partitionBy("vid").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    ranked = scored_cells.withColumn("cell_rank", F.row_number().over(w_cell)).select(
        "vid", "v", "cell_id", "cell_rank"
    )
    if query_ids is not None:
        qflag = (
            query_ids.select(F.col(id_col).alias("vid"))
            .distinct()
            .withColumn("_isq", F.lit(True))
        )
        ranked = ranked.join(F.broadcast(qflag), "vid", "left").withColumn(
            "is_query", F.coalesce(F.col("_isq"), F.lit(False))
        )
        probes = ranked.filter(
            (F.col("cell_rank") == 1)
            | (F.col("is_query") & (F.col("cell_rank") <= max_probe))
        )
    else:
        probes = ranked.filter(F.col("cell_rank") <= max_probe).withColumn(
            "is_query", F.lit(True)
        )

    cand_schema = "query_id long, probe_rank int, nn_id long, cos_sim double"

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        member = pdf["cell_rank"].to_numpy() == 1
        qmask = pdf["is_query"].to_numpy() & (
            pdf["cell_rank"].to_numpy() <= max_probe
        )
        if not member.any() or not qmask.any():
            return pd.DataFrame(
                columns=["query_id", "probe_rank", "nn_id", "cos_sim"]
            )
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        ids = pdf["vid"].to_numpy()
        m_unit, m_ids = unit[member], ids[member]
        perm = np.argsort(m_ids, kind="stable")
        m_unit, m_ids = m_unit[perm], m_ids[perm]
        q_unit, q_ids = unit[qmask], ids[qmask]
        q_rank = pdf["cell_rank"].to_numpy()[qmask]
        sims = q_unit @ m_unit.T
        sims[q_ids[:, None] == m_ids[None, :]] = -np.inf
        kk = min(k, m_ids.shape[0])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        qi = np.repeat(q_ids, kk)
        pr = np.repeat(q_rank, kk)
        nn = m_ids[top.ravel()]
        cs = np.take_along_axis(sims, top, axis=1).ravel()
        keep = cs != -np.inf
        return pd.DataFrame(
            {
                "query_id": qi[keep],
                "probe_rank": pr[keep].astype(np.int32),
                "nn_id": nn[keep],
                "cos_sim": cs[keep],
            }
        )

    cand = pin(probes.groupBy("cell_id").applyInPandas(score_cell, cand_schema))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    legs = [
        cand.filter(F.col("probe_rank") <= p)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.lit(p).cast("int").alias("n_probe"),
            "query_id",
            "nn_id",
            "rank",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        for p in probe_values
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def embedding_near_dups(
    emb: DataFrame,
    threshold: float,
    n_bits: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, cos >= t).

    With n_bits=0 this is the exact all-pairs check (test scale). With
    n_bits>0 — the scale path — pairs must share an SRP bucket, and
    each bucket's pair block runs as one BLAS GEMM in applyInPandas
    (the s4/s5 kernel; the per-pair join materialized both vectors per
    candidate row and HOF-dotted them — measured 2.0 s vs ~0.7 s at
    sf0.1). The kernel pre-filters with a 1e-6 slack UNDER the
    threshold and emits raw sims; the exact round(., 6) >= t decision
    stays in Spark expressions so boundary semantics are identical to
    the expression variant (and the oracle).
    """
    v = emb.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    )
    if n_bits:
        import numpy as np
        import pandas as pd

        slack = threshold - 1e-6

        def pairs_in_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
            if len(pdf) < 2:
                return pd.DataFrame(columns=["vec_a", "vec_b", "raw"])
            ids = pdf["vid"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)[order]
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            sims = unit @ unit.T
            iu = np.triu_indices(len(ids), k=1)  # ids sorted: a < b
            keep = sims[iu] >= slack
            return pd.DataFrame(
                {
                    "vec_a": ids[iu[0]][keep],
                    "vec_b": ids[iu[1]][keep],
                    "raw": sims[iu][keep],
                }
            )

        bucketed = v.withColumn("bucket", srp_bucket(F.col("v"), n_bits))
        cand = bucketed.groupBy("bucket").applyInPandas(
            pairs_in_bucket, "vec_a long, vec_b long, raw double"
        )
        return (
            cand.select("vec_a", "vec_b", F.round("raw", 6).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    v = v.withColumn("nrm", l2_norm(F.col("v")))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic corpus pruning (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding space into cells, and
    within each cell keep one representative per near-duplicate
    neighborhood. The deterministic keep rule — a vector is DROPPED iff
    some SMALLER-id vector in its cell has cosine >= threshold — makes
    the decision order-free (no greedy scan order to replicate
    cross-engine) while preserving the method's guarantee that every
    dropped vector has a kept-or-earlier witness within threshold.

    Cells are SRP sign-projection buckets (``srp_bucket``) rather than
    the paper's k-means so the partition is closed-form: an oracle (or a
    second engine) can re-derive membership from the vectors alone. The
    pair scan is exactly ``embedding_near_dups`` — within-bucket GEMM
    blocks, an equi-join shuffle on the bucket key, never all-pairs —
    so at 100 TB the cost is O(sum of squared cell sizes), the same
    bound the paper's per-cluster pairwise step pays.

    Returns one row per input id: (vec_id, kept, witness_id, witness_cos)
    where witness_id is the SMALLEST same-cell id within threshold
    (NULL for kept rows) and witness_cos its round-6 cosine.
    """
    pairs = embedding_near_dups(
        emb, threshold=threshold, n_bits=n_bits, id_col=id_col, vec_col=vec_col
    )
    # vec_a < vec_b in the pair stream, so b's witnesses are its vec_a
    # partners; min() picks the deterministic one to report. struct-min
    # carries the witness's cosine along without a second join.
    witnesses = pairs.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.min(F.struct(F.col("vec_a"), F.col("cos_sim"))).alias("w")
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"))
        .join(witnesses, "vec_id", "left")
        .select(
            "vec_id",
            F.col("w").isNull().alias("kept"),
            F.col("w.vec_a").alias("witness_id"),
            F.col("w.cos_sim").alias("witness_cos"),
        )
    )


def centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trim_quantile: float = 0.98,
    dim: int = SRP_DIM,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Embedding-space outlier trimming: distance to the corpus centroid,
    flagging every vector strictly beyond the ``trim_quantile`` distance
    — the "drop the farthest ~2%" pass a pipeline runs before centroid
    training or ANN indexing (norm checks can't see these:
    unit-normalized junk has a perfect norm but still sits far from the
    data manifold).

    Three passes, none shuffling the corpus: (1) the centroid as dim
    per-dimension avg aggregates, re-assembled into one array and
    broadcast back; (2) per-vector distance, one map pass; (3) the
    quantile as a 1-row aggregate, broadcast back for the flag. No
    statistic lands on the driver.

    The DEFAULT threshold is ``approx_percentile`` (a GK/KLL-style
    mergeable sketch: bounded memory per task, map-side combinable) —
    the only formulation that survives a 100-TB corpus, where the exact
    percentile would buffer billions of distances in the final
    aggregation task. Its rank error is <= 1/``accuracy``, so the
    flagged fraction is (1 - trim_quantile) within a +-1e-4 guard band
    at the default accuracy; the strict ``>`` against a threshold that
    is an actual data value keeps the band one-sided-safe (the
    threshold element itself is never flagged). ``exact=True`` is the
    oracle-checkable verification twin (interpolated exact percentile —
    the d2-vs-d7 pattern): bit-comparable against a SQL engine, and
    the path the s6 catalog entry pins.

    Returns (id, centroid_dist rounded 4dp, is_outlier).
    """
    v = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("_v"))
    cent = (
        v.agg(*[F.avg(F.col("_v")[i]).alias(f"_c{i}") for i in range(dim)])
        .select(F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("_c"))
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("_v", "_c", lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # d (id + scalar distance) feeds BOTH the quantile aggregate and the
    # final flag join; unpinned, each branch re-scans the embedding
    # parquet and re-runs the distance pass (3 corpus scans total). The
    # lazy localCheckpoint pins the narrow distance frame — vectors are
    # read once, and what materializes is 2 columns, not the corpus.
    d = (
        v.join(F.broadcast(cent))
        .select(F.col(id_col), dist.alias("_d"))
        .transform(pin)
    )
    if exact:
        thr = d.agg(F.expr(f"percentile(_d, {trim_quantile!r})").alias("_t"))
    else:
        thr = d.agg(
            F.expr(
                f"approx_percentile(_d, {trim_quantile!r}, {accuracy})"
            ).alias("_t")
        )
    return d.join(F.broadcast(thr)).select(
        F.col(id_col),
        F.round("_d", 4).alias("centroid_dist"),
        (F.col("_d") > F.col("_t")).alias("is_outlier"),
    )


def mmr_rerank(
    emb: DataFrame,
    query_id: int = 0,
    n_candidates: int = 20,
    n_select: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``n_select`` of the top ``n_candidates``
    cosine hits, each step maximizing ``lam * relevance - (1 - lam) *
    max-similarity-to-already-selected`` — the diversity-aware final
    stage of a standard retriever (two near-identical top hits waste a
    context slot; MMR keeps the second-best DIFFERENT hit instead).

    Scale shape: candidate generation is the distributed exact top-k
    (brute_force_topk — at corpus scale the ANN paths swap in); the
    greedy selection then runs on the BOUNDED candidate list inside one
    Arrow-batched applyInPandas group (n_candidates rows and an
    n_candidates^2 sim matrix — never the corpus; the sequential
    argmax is inherently iterative, so it belongs in the sanctioned
    vectorized-Python escape hatch, not in n_select chained shuffles).

    Determinism: relevance and pairwise sims round to 6dp BEFORE the
    greedy, scores quantize to integer micro-units half-away-from-zero
    (matching SQL round), ties break on id — so the pick sequence is
    bit-stable against the DuckDB oracle's unrolled-step formulation.

    Returns (vec_id, pick, mmr_micro) ordered by pick (1-based).
    """
    import numpy as np
    import pandas as pd

    cands = brute_force_topk(
        emb, emb.filter(F.col(id_col) == query_id), k=n_candidates,
        id_col=id_col, vec_col=vec_col,
    )
    with_vecs = cands.join(
        emb.select(
            F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("_v")
        ),
        "nn_id",
    ).select("query_id", "nn_id", "cos_sim", "_v")

    one_minus = 1 - lam

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["nn_id"].to_numpy()
        rel = pdf["cos_sim"].to_numpy(dtype="float64")  # rounded 6dp
        V = np.stack(pdf["_v"].map(np.asarray).to_list()).astype("float64")
        nrm = np.sqrt((V * V).sum(axis=1))
        sims = np.round((V @ V.T) / np.outer(nrm, nrm), 6)

        def micro(x: float) -> int:
            return int(np.floor(abs(x) * 1_000_000.0 + 0.5)) * (
                -1 if x < 0 else 1
            )

        selected: list[int] = []
        out = []
        remaining = list(range(len(ids)))
        for pick in range(1, min(n_select, len(ids)) + 1):
            best = None
            for i in remaining:
                pen = max((sims[i][j] for j in selected), default=0.0)
                score = micro(lam * rel[i] - one_minus * pen)
                key = (-score, ids[i])
                if best is None or key < best[0]:
                    best = (key, i, score)
            _, bi, bscore = best
            selected.append(bi)
            remaining.remove(bi)
            out.append((int(ids[bi]), pick, bscore))
        return pd.DataFrame(out, columns=["vec_id", "pick", "mmr_micro"])

    return (
        with_vecs.groupBy("query_id")
        .applyInPandas(greedy, "vec_id long, pick int, mmr_micro long")
        .orderBy("pick")
    )


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its ``n_probe`` nearest coarse-quantizer
    cells by cosine (ties to the lowest cell_id — exactly ``ivf_topk``'s
    ranking, so a persisted assignment and an in-query assignment can
    never disagree). ``centroids`` is the constant-size (cell_id,
    centroid) table; it is broadcast, so the pass is a pure map over the
    corpus — the shape that lets cell assignment be computed ONCE at
    ingest and persisted (the embedding-index lake) instead of per query.

    Returns (vec_id, v, cell_id, cell_rank) with v as double array.
    """
    v = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    cents = centroids.select(
        "cell_id", as_double(F.col("centroid")).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "cell_sim", dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_probe)
        .select("vec_id", "v", "cell_id", "cell_rank")
    )


def embed_admit_batch(
    new_emb: DataFrame,
    corpus_members: DataFrame,
    centroids: DataFrame,
    threshold: float,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SEMANTIC admission: admit a new embedding batch
    against a persisted cell-assigned corpus index — the embedding twin
    of ``dedup.dedup_against_corpus`` (d9), closing the asymmetry where
    lexical identity had an incremental path but embedding identity
    dedupe'd whole-corpus only.

    Inputs: ``new_emb`` = the incoming batch (id, vector);
    ``corpus_members`` = the INDEX — (vec_id, v|embedding, cell_id)
    rows already assigned to their rank-1 cell (in production this is
    the assignments table of the embedding-index lake, so the corpus is
    never re-embedded, re-assigned, or re-scanned beyond the probed
    cells); ``centroids`` = the quantizer the index was built with.

    Plan shape at scale: batch vectors assign to their ``n_probe``
    nearest cells (broadcast centroid table, pure map); the probe rows
    and the probed cells' members meet in ONE shuffle keyed by cell_id,
    and each cell scores batch-vs-member and batch-vs-batch blocks as
    BLAS GEMMs inside applyInPandas (the s4/s5 kernel) — candidate
    pairs never materialize as join rows carrying two vector arrays.
    The kernel pre-filters at threshold - 1e-6 and emits raw sims; the
    exact round(., 6) >= threshold decision stays in Spark expressions
    (same boundary semantics as the expression path and the oracle).

    Decision per new vector (mirrors d9): 'dup_of_corpus' if any probed
    corpus member has round(cos, 6) >= threshold (corpus always wins),
    else 'dup_in_batch' if it loses pairwise min-id-wins against a
    batch partner sharing a probed cell, else 'accepted'. Approximation
    contract: like every IVF path, a dup hiding in an unprobed cell is
    missed — recall is the n_probe dial, and the decision is exactly
    reproducible from the (deterministic) quantizer, which is what the
    s11 oracle pins cross-engine.

    Returns (vec, n_corpus_dups, first_corpus_dup, status).
    """
    import numpy as np
    import pandas as pd
    from ..pinning import pin

    # identity is the id: a batch carrying the same id twice (a re-sent
    # row in an at-least-once drop) must be ONE decision, not a
    # self-pair that rejects the vector against itself and silently
    # loses it from the index forever
    new_emb = new_emb.dropDuplicates([id_col])
    probes = assign_cells(new_emb, centroids, n_probe, id_col, vec_col).select(
        "vec_id", "v", "cell_id"
    ).withColumn("is_member", F.lit(False)).transform(pin)
    # the batch probes at most n_probe * |batch| distinct cells; corpus
    # members of every OTHER cell would contribute nothing to the
    # kernel yet still shuffle into the groupBy — at production scale
    # (thousands of cells, small daily drop) that dead weight IS the
    # index. The probed-cell list is bounded and broadcast, so the
    # semi-join prunes the index scan before anything moves.
    probed_cells = probes.select("cell_id").distinct()
    members = (
        corpus_members.select(
            F.col("vec_id"),
            as_double(
                F.col("v") if "v" in corpus_members.columns else F.col(vec_col)
            ).alias("v"),
            "cell_id",
        )
        .join(F.broadcast(probed_cells), "cell_id", "leftsemi")
        .withColumn("is_member", F.lit(True))
    )
    slack = threshold - 1e-6

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["is_member"].to_numpy()
        if (~m).sum() == 0:
            return pd.DataFrame(columns=["kind", "a", "b", "raw"])
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        ids = pdf["vec_id"].to_numpy()
        out: list[tuple[str, int, int, float]] = []
        n_unit, n_ids = unit[~m], ids[~m]
        if m.any():
            sims = n_unit @ unit[m].T
            c_ids = ids[m]
            qi, mi = np.nonzero(sims >= slack)
            out.extend(
                ("bc", int(n_ids[q]), int(c_ids[c]), float(sims[q, c]))
                for q, c in zip(qi, mi)
            )
        if len(n_ids) >= 2:
            order = np.argsort(n_ids, kind="stable")
            b_ids, b_unit = n_ids[order], n_unit[order]
            s2 = b_unit @ b_unit.T
            iu = np.triu_indices(len(b_ids), k=1)  # ids sorted: a <= b
            # strict id inequality like the oracle's a.vid < b.vid —
            # positional triu alone would self-pair a duplicated id
            # (belt and braces on top of the dropDuplicates above)
            keep = (s2[iu] >= slack) & (b_ids[iu[0]] != b_ids[iu[1]])
            out.extend(
                ("bb", int(b_ids[i]), int(b_ids[j]), float(s2[i, j]))
                for i, j in zip(iu[0][keep], iu[1][keep])
            )
        return pd.DataFrame(out, columns=["kind", "a", "b", "raw"])

    pairs = (
        members.unionByName(probes)
        .groupBy("cell_id")
        .applyInPandas(score_cell, "kind string, a long, b long, raw double")
    )
    # a bb pair sharing BOTH probed cells is emitted twice with the
    # identical float — distinct collapses it; bc pairs are unique by
    # construction (a member lives in exactly one cell)
    verified = (
        pairs.select("kind", "a", "b", F.round("raw", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
        .transform(pin)
    )
    cd = (
        verified.filter(F.col("kind") == "bc")
        .groupBy("a")
        .agg(
            F.count("*").cast("long").alias("n_corpus_dups"),
            F.min("b").cast("long").alias("first_corpus_dup"),
        )
        .withColumnRenamed("a", "vec")
    )
    losers = (
        verified.filter(F.col("kind") == "bb")
        .select(F.col("b").alias("vec"))
        .distinct()
        .withColumn("_bb", F.lit(True))
    )
    # new_emb is id-deduped above, so this is one row per decided id
    new_ids = new_emb.select(F.col(id_col).cast("long").alias("vec"))
    return (
        new_ids.join(cd, "vec", "left")
        .join(losers, "vec", "left")
        .select(
            "vec",
            F.coalesce("n_corpus_dups", F.lit(0)).cast("long").alias("n_corpus_dups"),
            "first_corpus_dup",
            F.when(F.col("n_corpus_dups").isNotNull(), "dup_of_corpus")
            .when(F.col("_bb"), "dup_in_batch")
            .otherwise("accepted")
            .alias("status"),
        )
    )


def int8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the compression step an
    ANN index applies before storing 100 TB of vectors (4x smaller than
    float32, 8x smaller than the double math path; dot products on int8
    codes are the SIMD fast path every vector engine uses).

    scale = 127 / max|x| per vector; codes = round(x * scale). The
    whole pass is JVM-side higher-order functions over the array —
    one map pass, zero shuffles, no Python. Returns the codes plus the
    audit columns the oracle checks: the exact integer code sum and a
    reconstruction-RMSE bound (RMSE <= max|x|/127 — twice the
    theoretical half-step worst case, so a broken rounding or scale
    flips the boolean). Zero vectors quantize to all-zero codes and a
    trivially-true bound.
    """
    v = as_double(F.col(vec_col))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # evaluation order deliberately matches the DuckDB oracle's
    # round((x * 127.0) / mx) — precomputing scale = 127/mx is the same
    # math but a different FP association, and a 1-ulp difference near a
    # .5 boundary would flip a code and the exact code_sum check
    codes = F.when(mx == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round((x * F.lit(127.0)) / mx).cast("int"))
    )
    out = emb.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.round(mx, 6).alias("max_abs"),
        codes.alias("codes"),
        v.alias("_v"),
        mx.alias("_mx"),
    )
    sq_err = F.aggregate(
        F.zip_with(
            "_v",
            F.transform(F.col("codes"), lambda c: c.cast("double")),
            lambda x, c: (x - c * F.col("_mx") / F.lit(127.0))
            * (x - c * F.col("_mx") / F.lit(127.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rmse = F.sqrt(sq_err / F.size("_v"))
    return out.select(
        F.col(id_col),
        "n_dims",
        "max_abs",
        F.aggregate("codes", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "code_sum"
        ),
        F.when(F.col("_mx") == 0, F.lit(True))
        .otherwise(rmse <= F.col("_mx") / F.lit(127.0))
        .alias("recon_ok"),
    )


def fit_kmeans_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
) -> tuple[DataFrame, list[float]]:
    """Distributed Lloyd's k-means for IVF coarse quantizers: the
    trainer ``ivf_topk`` points at when it says "production swaps in
    k-means centroids".

    Initialization is the same deterministic seed as ``ivf_topk``'s
    default cells (the n_cells lexicographically-first vectors), so
    swapping the trainer in changes centroid QUALITY, never determinism.
    Each iteration is ONE Arrow-batched map pass over the corpus
    (mapInPandas) that assigns every vector to its argmin-distance cell
    (ties to the lowest cell_id, like the min(struct) formulation it
    replaces) and emits per-partition SUFFICIENT STATISTICS — per-cell
    vector sums, member counts, and inertia partials: O(cells) rows per
    partition, reduced to the new centroids. The earlier
    crossJoin + min(struct) + 64-column avg() formulation shuffled one
    row per VECTOR per iteration and measured 1.6 s/iteration at sf0.1
    against ~0.1 s for this shape; the statistics reduction carries
    O(cells x partitions) rows regardless of corpus size. Vectors never
    visit the driver — only the constant-size statistics and the
    scalar inertia stop rule (relative improvement < tol) do,
    mirroring the convergence probe in dedup.connected_components.
    Empty cells keep their previous centroid.

    Returns (centroids DataFrame (cell_id, centroid, n_members),
    inertia history). The history is what tests assert on: Lloyd's
    algorithm guarantees it is non-increasing.
    """
    import numpy as np
    import pandas as pd
    v = emb.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=True)
    seed = [
        row["v"]
        for row in v.orderBy("vid").limit(n_cells).select("v").collect()
    ]
    C = np.array(seed, dtype=np.float64)  # (n_cells, dim) — constant-size
    counts = np.zeros(len(C), dtype=np.int64)
    stats_schema = "cell_id long, s array<double>, n long, inertia double"
    history: list[float] = []
    for _ in range(max_iter):
        cent = C  # bind the current centroids into this iteration's task

        def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(pdf["v"].tolist(), dtype=np.float64)
                # direct (x-c)^2 like the expression it replaces;
                # argmin ties resolve to the lowest cell index
                d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                best = d.argmin(axis=1)
                bd = d[np.arange(len(mat)), best]
                rows = []
                for c in np.unique(best):
                    m = best == c
                    rows.append(
                        (
                            int(c),
                            mat[m].sum(axis=0).tolist(),
                            int(m.sum()),
                            float(bd[m].sum()),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["cell_id", "s", "n", "inertia"]
                )

        # O(cells x partitions) sufficient-statistic rows to the driver
        parts = v.mapInPandas(partials, schema=stats_schema).collect()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype=np.int64)
        inertia = 0.0
        for r in parts:
            sums[r["cell_id"]] += np.array(r["s"])
            counts[r["cell_id"]] += r["n"]
            inertia += r["inertia"]
        history.append(float(inertia))
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        if len(history) >= 2 and history[-2] - history[-1] <= tol * max(history[-2], 1e-12):
            break
    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [
            (i + 1, [float(x) for x in C[i]], int(counts[i]))
            for i in range(len(C))
        ],
        "cell_id long, centroid array<double>, n_members long",
    )
    return cents, history


def opq_snake_permutation(
    emb: DataFrame,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = 17,
) -> list[int]:
    """OPQ-lite: a deterministic coordinate permutation that balances
    per-subspace variance — the cheap cousin of Ge et al.'s optimized
    product quantization (CVPR 2013), which additionally learns a
    rotation. Dims rank by sample variance (integer micro-units, so
    cross-engine summation order can't flip a rank; ties to the lower
    dim) and deal into subspaces boustrophedon ("snake": 0..n-1 then
    n-1..0), the classic balanced allocation. Closed-form given the
    ranking — no greedy state — which is what lets the s21 oracle
    re-derive the permutation in SQL and hash-check the whole audit.

    Honest measured result on THIS repo's synthetic embeddings (see
    s21): dims are i.i.d. uniform, so per-dim variances are near-equal
    and the permutation is neutral (±2%) — for a uniform hypercube the
    identity axes are already the optimal PQ alignment (measured: a
    full parametric-OPQ PCA rotation is 1.4x WORSE there). On
    anisotropic embeddings — the realistic case, covered by the planted
    corpus in tests/test_pq.py — the same permutation cuts seed-codebook
    reconstruction error ~3x. Like pq_train_codebook, only the bounded
    deterministic sample reaches the driver.

    Returns ``perm`` such that permuted coordinate p is original
    coordinate ``perm[p]``.
    """
    import numpy as np

    base = emb
    if sample_mod is not None:
        base = base.filter(F.col(id_col) % sample_mod == 0)
    rows = (
        base.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v"))
        .orderBy("vid")
        .collect()
    )
    if not rows:
        raise ValueError("empty sample — widen sample_mod")
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    vmic = np.floor(X.var(axis=0) * 1_000_000.0 + 0.5).astype(np.int64)
    order = sorted(range(dim), key=lambda d: (-int(vmic[d]), d))
    bins: list[list[int]] = [[] for _ in range(n_sub)]
    for r0, d in enumerate(order):
        rnd, pos = divmod(r0, n_sub)
        bins[pos if rnd % 2 == 0 else n_sub - 1 - pos].append(d)
    return [d for b in bins for d in b]


def _permute(v: list[float], perm: list[int] | None) -> list[float]:
    return v if perm is None else [v[d] for d in perm]


def pq_codebook(
    emb: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    perm: list[int] | None = None,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebook: ``[m][j][d]`` — the
    j-th codeword of subspace m is the m-th ``dim/n_sub``-dim slice of
    the ``n_codes`` lexicographically-first corpus vectors (the same
    oracle-reproducible rule as the s4/s11 coarse quantizer; a trained
    deployment runs ``fit_kmeans_centroids`` per subspace instead — the
    encode plan below is identical either way). Driver traffic is
    ``n_codes`` rows — constant-size sufficient statistics, the s7
    pattern, never the corpus. With ``perm`` (opq_snake_permutation)
    the codewords are slices of the PERMUTED seed vectors, pairing with
    ``pq_encode(..., perm=perm)``."""
    rows = (
        emb.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v"))
        .orderBy("vid")
        .limit(n_codes)
        .collect()
    )
    dim = len(rows[0]["v"])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    sd = dim // n_sub
    vs = [_permute(list(r["v"]), perm) for r in rows]
    return [[v[m * sd:(m + 1) * sd] for v in vs] for m in range(n_sub)]


def pq_encode(
    emb: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    perm: list[int] | None = None,
) -> DataFrame:
    """Product-quantization encode (Jégou et al., TPAMI 2011 — the
    compression arm of IVF-PQ, the standard 100-TB ANN memory layout):
    each vector splits into ``n_sub`` subvectors and each subvector
    maps to its nearest codeword, so a dim-64 double vector (512
    bytes) becomes ``n_sub`` small ints (8 bytes at n_sub=8/n_codes=16)
    plus the shared constant-size codebook.

    Plan shape — the whole point: the codebook rides as a NumPy
    constant inside ONE Arrow-vectorized ``mapInPandas`` kernel (the
    s5 GEMM pattern), so encoding is a PURE MAP over the corpus — zero
    shuffle, zero join, nothing O(corpus) anywhere but the scan itself
    (gated in tests/test_plan_quality.py). An all-expression
    formulation was value-identical but built a 128-HOF plan tree
    that cost ~29 s of driver-side analysis per call at any data size;
    the kernel builds in milliseconds and scores each Arrow batch as
    n_sub small GEMMs. Per subspace the distances are
    ``-2*(sv @ cw.T) + ||cw||^2`` (the ||sv||^2 term is constant
    within a subspace and cannot change the argmin, but IS added back
    for the error audit); argmin ties to the lowest code id
    (np.argmin-first ↔ the oracle's ORDER BY d2, j) —
    bit-reproducible cross-engine, which is what lets the s14 oracle
    hash-check every code.

    Returns (vec_id, codes array<int> ordered by subspace, err_micro) —
    err_micro is the total squared reconstruction error in integer
    micro-units (the t8/t16 technique: quantize each subspace's term
    half-away-from-zero, sum integers, so cross-engine float summation
    order can't flip a bit)."""
    import numpy as np
    import pandas as pd

    n_sub = len(codebook)
    sd = len(codebook[0][0])
    cbs = [np.asarray(words, dtype=np.float64) for words in codebook]
    cns = [(cb * cb).sum(axis=1) for cb in cbs]
    parr = None if perm is None else np.asarray(perm, dtype=np.int64)

    v = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            if parr is not None:
                mat = mat[:, parr]
            n = mat.shape[0]
            codes = np.empty((n, n_sub), dtype=np.int32)
            err = np.zeros(n, dtype=np.int64)
            rows = np.arange(n)
            for m in range(n_sub):
                sv = mat[:, m * sd:(m + 1) * sd]
                d2 = -2.0 * (sv @ cbs[m].T) + cns[m]
                j = np.argmin(d2, axis=1)
                codes[:, m] = j
                dist = (sv * sv).sum(axis=1) + d2[rows, j]
                err += np.floor(dist * 1_000_000.0 + 0.5).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "codes": list(codes),
                    "err_micro": err,
                }
            )

    return v.mapInPandas(kernel, "vec_id long, codes array<int>, err_micro long")


def pq_adc_scores(
    emb: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The ADC scoring stage of ``pq_adc_topk``, exposed so audits
    (s18) can rank one scored pass under several shortlist sizes:
    every (query, candidate) pair's integer asymmetric distance —
    corpus as PQ codes (pure map), per-query micro-unit lookup tables
    built in one Arrow kernel and broadcast, per pair ``n_sub`` JVM
    array lookups + integer adds. Returns (query_id, nn_id, adc_micro)
    — deliberately WITHOUT the query vector: the pair stream feeds a
    per-query top-k exchange, and a 512-byte qv on every candidate row
    multiplied the shuffle ~20x (optimization guide §2.3: project
    before the exchange). Callers re-attach qv to the bounded
    shortlist via a broadcast join on query_id."""
    import numpy as np
    import pandas as pd

    n_sub = len(codebook)
    sd = len(codebook[0][0])
    cbs = [np.asarray(words, dtype=np.float64) for words in codebook]
    cns = [(cb * cb).sum(axis=1) for cb in cbs]

    codes = pq_encode(emb, codebook, id_col=id_col, vec_col=vec_col).select(
        F.col("vec_id").alias("nn_id"), "codes"
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )

    def qkernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["qv"].tolist(), dtype=np.float64)
            tabs = []
            for row in mat:
                t = np.empty((n_sub, len(cbs[0])), dtype=np.int64)
                for m in range(n_sub):
                    qsv = row[m * sd:(m + 1) * sd]
                    d = (qsv * qsv).sum() + (-2.0 * (cbs[m] @ qsv) + cns[m])
                    t[m] = np.floor(d * 1_000_000.0 + 0.5).astype(np.int64)
                tabs.append(list(t))
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "qtab": tabs,
                }
            )

    qtab = qv.mapInPandas(
        qkernel,
        "query_id long, qtab array<array<long>>",
    )

    pairs = codes.crossJoin(F.broadcast(qtab)).filter(
        F.col("query_id") != F.col("nn_id")
    )
    adc = F.get(F.element_at("qtab", 1), F.element_at("codes", 1))
    for m in range(1, n_sub):
        adc = adc + F.get(F.element_at("qtab", m + 1), F.element_at("codes", m + 1))
    return pairs.select("query_id", "nn_id", adc.alias("adc_micro"))


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k with exact re-rank — the QUERY path
    of IVF-PQ (Jégou et al., TPAMI 2011): the corpus lives as 8-byte PQ
    codes (``pq_encode``), the query stays full-precision, and each
    query precomputes one n_sub x n_codes lookup table of subspace
    squared distances; a candidate's approximate distance is then
    ``n_sub`` table lookups + integer adds — no per-pair vector math at
    all, which is the property that makes scanning a 100-TB corpus's
    codes affordable. The ADC shortlist (size ``shortlist``) is then
    re-ranked EXACTLY (true cosine on the full vectors, the standard
    rescoring step), so the shortlist size is the recall dial.

    Determinism: the lookup tables quantize to integer micro-units per
    subspace (the t8/t16 technique; built in one Arrow kernel over the
    query frame — see pq_encode for why not expressions) and the
    per-candidate score is an integer sum of JVM-side array lookups,
    so ADC ranking is bit-reproducible cross-engine; ties break by
    candidate id. Plan shape: the coded corpus is a pure map; queries
    + tables broadcast; the only shuffles are the two bounded top-k
    windows (|queries| x corpus candidate rows narrow — id + one long
    — never the vectors).

    Returns (query_id, nn_id, rank, cos_sim, adc_micro) for the final
    exact-ranked top ``k``.
    """
    scored = pq_adc_scores(emb, queries, codebook, id_col=id_col, vec_col=vec_col)
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micro"), F.asc("nn_id")
    )
    # the top-k exchange ranks narrow (id, id, long) rows; the query
    # vector is re-attached to the <= |q| x shortlist survivors only
    # (guide §2.3 — the rescore still works for external queries
    # because qv comes from the QUERY frame, never the corpus)
    qvf = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    short = (
        scored.withColumn("_srnk", F.row_number().over(w_short))
        .filter(F.col("_srnk") <= shortlist)
        .drop("_srnk")
        .join(F.broadcast(qvf), "query_id")
    )
    cand = (
        emb.select(
            F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("cv")
        )
        .join(F.broadcast(short), "nn_id")
        .withColumn(
            "cos_sim",
            dot(F.col("qv"), F.col("cv"))
            / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("nn_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "adc_micro",
        )
    )


def sign_sketch(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Binary (1-bit) quantization: each dimension's SIGN, packed into
    two 32-bit words carried as longs — dim-64 doubles (512 bytes)
    become 16 bytes (a production layout packs 64 bits into one
    unsigned word; two signed halves keep every shift exact and
    engine-portable). Pure map, zero shuffle: the static unrolled
    bit-sum is plain integer arithmetic, bit-reproducible anywhere.

    Sign sketches are the cheapest ANN tier (Charikar SRP with the
    identity projection): E[hamming] is monotone in angle, so Hamming
    top-k over the sketches is a recall-tunable shortlist generator —
    see ``hamming_topk``. Returns (vec_id, b0, b1).

    The two-word layout hard-codes dim 64; any other dimensionality is
    rejected loudly — F.slice on a shorter vector would otherwise yield
    short indicator arrays whose zip_with dot is NULL, and every sketch
    would silently come back NULL (the PQ path's divisibility guard,
    applied here)."""
    v = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn(
        "v",
        F.when(F.size("v") == 64, F.col("v")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("sign_sketch requires dim-64 vectors, got dim "),
                    F.size("v").cast("string"),
                )
            )
        ),
    )

    # the packed word = dot(sign indicators, powers of two): three
    # expression nodes instead of a 64-term unrolled sum, whose giant
    # codegen method cost ~3 s of compile time per execution at ANY
    # data size (the s14 lesson's JVM-side twin). Powers up to 2^31
    # and sums < 2^32 are exact in doubles, so the cast back to long
    # is lossless.
    powers = F.array(*[F.lit(float(1 << i)) for i in range(32)])

    def half(lo: int) -> "F.Column":
        ind = F.transform(
            F.slice(F.col("v"), lo + 1, 32),
            lambda x: F.when(x > 0, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        return dot(ind, powers).cast("long")

    return v.select("vec_id", half(0).alias("b0"), half(32).alias("b1"))


def hamming_scores(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The Hamming scoring stage of ``hamming_topk``, exposed for the
    s18 audit: every (query, candidate) pair's popcount distance over
    the packed sign sketches. Returns (query_id, nn_id, hamming) —
    deliberately WITHOUT the query vector: the pair stream feeds a
    per-query top-k exchange, and a 512-byte qv on every candidate
    row multiplied the shuffle ~20x (guide §2.3: project before the
    exchange). Callers re-attach qv to the bounded shortlist via a
    broadcast join on query_id — from the QUERY frame, so external
    queries still rescore."""
    sk = sign_sketch(emb, id_col, vec_col)
    qsk = sign_sketch(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("b0").alias("q0"),
        F.col("b1").alias("q1"),
    )
    return (
        sk.withColumnRenamed("vec_id", "nn_id")
        .crossJoin(F.broadcast(qsk))
        .filter(F.col("query_id") != F.col("nn_id"))
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("b0").bitwiseXOR(F.col("q0")))
                + F.bit_count(F.col("b1").bitwiseXOR(F.col("q1")))
            ).cast("int"),
        )
        .select("query_id", "nn_id", "hamming")
    )


def hamming_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hamming-distance top-k over 1-bit sign sketches with exact
    cosine re-rank — the third rung of the compression ladder (full
    vectors s1, PQ codes s15, sign bits here: 512 -> 8ish bytes,
    32x less state than even PQ's ADC tables). A candidate's
    approximate distance is two XOR+popcount instructions
    (``bit_count(b0 XOR b0') + bit_count(b1 XOR b1')``) — integer,
    deterministic, so the approximate ranking is bit-reproducible
    cross-engine and the oracle value-checks it. The ``shortlist``
    Hamming-nearest candidates per query are rescored with true cosine
    (ties by id at both stages). Plan: sketches are a pure map; queries
    broadcast; the shuffles are two bounded top-k windows over narrow
    (id, int) rows.

    Returns (query_id, nn_id, rank, cos_sim, hamming)."""
    pairs = hamming_scores(emb, queries, id_col, vec_col)
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("nn_id")
    )
    # narrow rows through the top-k exchange; qv re-attached to the
    # bounded shortlist from the query frame (guide §2.3)
    qvf = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    short = (
        pairs.withColumn("_srnk", F.row_number().over(w_short))
        .filter(F.col("_srnk") <= shortlist)
        .select("query_id", "nn_id", "hamming")
        .join(F.broadcast(qvf), "query_id")
    )
    c = emb.select(
        F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("cv")
    )
    cand = c.join(F.broadcast(short), "nn_id").withColumn(
        "cos_sim",
        dot(F.col("qv"), F.col("cv"))
        / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("nn_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "hamming",
        )
    )


def compression_audit_scores(
    emb: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    shortlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE Arrow kernel pass over the corpus scoring every (query,
    candidate) pair under all three compression-ladder rungs at once —
    the s18 audit's scoring stage (r13, guide §4): PQ ADC (s15's
    integer tables), binary Hamming (s16's packed-sign popcounts), and
    exact cosine (s1's GEMM). The previous shape ran THREE separate
    corpus passes (pq_encode kernel, sign-sketch expressions, brute
    kernel) plus two full |corpus| x |queries| JVM pair streams into
    the shortlist windows; this kernel scores each Arrow batch once
    and emits only per-partition shortlists — for each query, the
    batch-local top-``shortlist`` by ADC, by Hamming, and the local
    exact top-1 — which are SUPERSETS of the global winners under the
    same total orders, so the downstream windows rank
    partitions x |q| x (2*shortlist + 1) narrow tagged rows instead of
    full pair streams, and the results are row-identical.

    Determinism: the ADC tables, code assignment, sign packing and
    popcounts are the exact integer formulas of ``pq_adc_scores`` /
    ``pq_encode`` / ``sign_sketch`` (copied op for op); the exact leg
    is ``brute_force_topk``'s GEMM and lexsort tie-break. Ties break by
    candidate id everywhere, like the operators this fuses.

    Returns tagged rows (method, query_id, nn_id, score, cos_sim):
    score carries adc_micro / hamming for the approx methods (cos_sim
    null), cos_sim carries the exact leg's cosine (score null)."""
    import numpy as np
    import pandas as pd

    n_sub = len(codebook)
    sd = len(codebook[0][0])
    cbs = [np.asarray(words, dtype=np.float64) for words in codebook]
    cns = [(cb * cb).sum(axis=1) for cb in cbs]

    qrows = (
        queries.select(
            F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv")
        )
        .orderBy("qid")
        .collect()
    )
    c = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    out_schema = (
        "method string, query_id long, nn_id long, score long, cos_sim double"
    )
    if not qrows:
        return c.limit(0).select(
            F.lit("exact").alias("method"),
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("nn_id"),
            F.lit(None).cast("long").alias("score"),
            F.lit(0.0).alias("cos_sim"),
        )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    dim = Q.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    if dim != 64:
        # the sign-sketch rung packs exactly two 32-bit words
        # (sign_sketch's guard, kept loud here too)
        raise ValueError(f"compression audit requires dim-64 vectors, got {dim}")
    qn = np.sqrt((Q * Q).sum(axis=1))
    if (qn == 0.0).any():
        bad = [int(q) for q, n in zip(qids, qn) if n == 0.0]
        raise ValueError(f"zero-norm query vectors (cosine undefined): {bad}")
    nq = len(qids)
    # per-query integer ADC tables — pq_adc_scores.qkernel's exact
    # formula, built once on the driver from the collected queries
    # (previously a mapInPandas over the query frame + a broadcast)
    qtab = np.empty((nq, n_sub, len(cbs[0])), dtype=np.int64)
    for i in range(nq):
        row = Q[i]
        for m in range(n_sub):
            qsv = row[m * sd:(m + 1) * sd]
            d = (qsv * qsv).sum() + (-2.0 * (cbs[m] @ qsv) + cns[m])
            qtab[i, m] = np.floor(d * 1_000_000.0 + 0.5).astype(np.int64)
    # packed query sign bits — sign_sketch's packing (indicator dot
    # powers-of-two, exact in doubles below 2^32)
    pow32 = (2.0 ** np.arange(32)).astype(np.float64)

    def _pack(mat: "np.ndarray") -> "np.ndarray":
        ind = (mat > 0).astype(np.float64)
        b0 = (ind[:, :32] @ pow32).astype(np.int64)
        b1 = (ind[:, 32:] @ pow32).astype(np.int64)
        return b0, b1

    q0, q1 = _pack(Q)
    L = int(shortlist)

    def _popcount(x: "np.ndarray") -> "np.ndarray":
        # numpy 1.26 has no bitwise_count; unpack the 8 bytes of each
        # int64 and sum — exact integer popcount
        b = x.astype(np.int64).view(np.uint8).reshape(*x.shape, 8)
        return np.unpackbits(b, axis=-1).sum(axis=-1).astype(np.int64)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            n = mat.shape[0]
            rows = np.arange(n)
            # --- PQ codes (pq_encode's exact argmin) + ADC scores ---
            codes = np.empty((n, n_sub), dtype=np.int64)
            for m in range(n_sub):
                sv = mat[:, m * sd:(m + 1) * sd]
                d2 = -2.0 * (sv @ cbs[m].T) + cns[m]
                codes[:, m] = np.argmin(d2, axis=1)
            adc = np.zeros((n, nq), dtype=np.int64)
            for m in range(n_sub):
                # qtab[:, m, :] is (nq, n_codes); gather per candidate code
                adc += qtab[:, m, :][:, codes[:, m]].T
            # --- Hamming over packed signs (sign_sketch + bit_count) ---
            b0, b1 = _pack(mat)
            ham = _popcount(b0[:, None] ^ q0[None, :]) + _popcount(
                b1[:, None] ^ q1[None, :]
            )
            # --- exact cosine (brute_force_topk's GEMM) ---
            cn = np.sqrt((mat * mat).sum(axis=1))
            if (cn == 0.0).any():
                bad = [int(i) for i, nn in zip(ids, cn) if nn == 0.0]
                raise ValueError(
                    f"zero-norm corpus vectors (cosine undefined): {bad[:5]}"
                )
            sims = (mat @ Q.T) / np.outer(cn, qn)
            meth, outq, outn, outs, outc = [], [], [], [], []
            for j in range(nq):
                mask = ids != qids[j]
                cand_ids = ids[mask]
                if not len(cand_ids):
                    continue
                # batch-local top-L by (score asc, id asc) — a superset
                # of the global top-L under the same order
                o = np.lexsort((cand_ids, adc[mask, j]))[:L]
                meth.extend(["pq_adc"] * len(o))
                outq.extend([qids[j]] * len(o))
                outn.extend(cand_ids[o])
                outs.extend(adc[mask, j][o])
                outc.extend([None] * len(o))
                o = np.lexsort((cand_ids, ham[mask, j]))[:L]
                meth.extend(["hamming"] * len(o))
                outq.extend([qids[j]] * len(o))
                outn.extend(cand_ids[o])
                outs.extend(ham[mask, j][o])
                outc.extend([None] * len(o))
                o = np.lexsort((cand_ids, -sims[mask, j]))[:1]
                meth.extend(["exact"] * len(o))
                outq.extend([qids[j]] * len(o))
                outn.extend(cand_ids[o])
                outs.extend([None] * len(o))
                outc.extend(sims[mask, j][o])
            yield pd.DataFrame(
                {
                    "method": meth,
                    "query_id": outq,
                    "nn_id": outn,
                    "score": pd.array(outs, dtype="Int64"),
                    "cos_sim": pd.array(outc, dtype="float64"),
                }
            )

    return c.mapInPandas(kernel, out_schema)


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 3,
    shortlist: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the composition that actually serves 100-TB ANN
    (Jégou et al., TPAMI 2011; the FAISS default): the coarse
    quantizer prunes candidates to the query's ``n_probe`` cells
    (``assign_cells``, s4's routing), the pruned candidates are scored
    from their 8-byte PQ CODES via per-query integer lookup tables
    (s15's ADC kernel — no vector math per pair), and only the
    ``shortlist`` ADC-nearest are rescored with true cosine. Cost per
    query: O(probe * avg_cell_size) table lookups + ``shortlist``
    exact dots — both dials (n_probe = candidate recall, shortlist =
    rescore recall) are measured contracts (s13 pattern).

    Plan shape: corpus assignment is one broadcast-centroid map +
    per-id rank window (persisted in production — the embedding-index
    lake stores exactly this); codes are a pure map; probes and lookup
    tables broadcast; candidates meet members in ONE equi-join on
    cell_id carrying only (id, codes, table) — vectors reappear only
    for the bounded rescore join. Deterministic end to end (first-N
    quantizers, integer ADC, id tie-breaks), so the whole composed
    path is oracle-checkable.

    Returns (query_id, nn_id, rank, cos_sim, adc_micro)."""
    import numpy as np
    import pandas as pd

    n_sub = len(codebook)
    sd = len(codebook[0][0])
    cbs = [np.asarray(words, dtype=np.float64) for words in codebook]
    cns = [(cb * cb).sum(axis=1) for cb in cbs]

    v = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    if centroids is not None:
        cents = centroids.select(
            "cell_id", as_double(F.col("centroid")).alias("centroid")
        )
    else:
        cents = (
            v.orderBy("vec_id")
            .limit(n_cells)
            .select(F.col("vec_id").alias("cell_id"), F.col("v").alias("centroid"))
        )
    members = assign_cells(emb, cents, 1, id_col, vec_col).select(
        F.col("vec_id").alias("nn_id"), "cell_id"
    )
    codes = pq_encode(emb, codebook, id_col=id_col, vec_col=vec_col).select(
        F.col("vec_id").alias("nn_id"), "codes"
    )
    probes = assign_cells(queries, cents, n_probe, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), "cell_id"
    )

    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )

    def qkernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["qv"].tolist(), dtype=np.float64)
            tabs = []
            for row in mat:
                t = np.empty((n_sub, len(cbs[0])), dtype=np.int64)
                for m in range(n_sub):
                    qsv = row[m * sd:(m + 1) * sd]
                    dd = (qsv * qsv).sum() + (-2.0 * (cbs[m] @ qsv) + cns[m])
                    t[m] = np.floor(dd * 1_000_000.0 + 0.5).astype(np.int64)
                tabs.append(list(t))
            yield pd.DataFrame(
                {"query_id": pdf["query_id"].to_numpy(), "qtab": tabs}
            )

    qtab = qv.mapInPandas(
        qkernel, "query_id long, qtab array<array<long>>"
    )

    cand = (
        members.join(F.broadcast(probes), "cell_id")
        .filter(F.col("query_id") != F.col("nn_id"))
        .join(codes, "nn_id")
        .join(F.broadcast(qtab), "query_id")
    )
    adc = F.get(F.element_at("qtab", 1), F.element_at("codes", 1))
    for m in range(1, n_sub):
        adc = adc + F.get(F.element_at("qtab", m + 1), F.element_at("codes", m + 1))
    # narrow rows through the top-k exchange; qv re-attached to the
    # bounded shortlist from the query frame (guide §2.3)
    scored = cand.select("query_id", "nn_id", adc.alias("adc_micro"))
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micro"), F.asc("nn_id")
    )
    short = (
        scored.withColumn("_srnk", F.row_number().over(w_short))
        .filter(F.col("_srnk") <= shortlist)
        .drop("_srnk")
        .join(F.broadcast(qv), "query_id")
    )
    rescored = (
        emb.select(
            F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("cv")
        )
        .join(F.broadcast(short), "nn_id")
        .withColumn(
            "cos_sim",
            dot(F.col("qv"), F.col("cv"))
            / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "adc_micro",
        )
    )


def pq_train_codebook(
    emb: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = 17,
    perm: list[int] | None = None,
) -> list[list[list[float]]]:
    """Train per-subspace PQ codebooks with Lloyd's algorithm on a
    bounded deterministic sample — the FAISS practice (codebooks train
    on ~10^2-10^5 sampled vectors CPU-side regardless of corpus size,
    then broadcast): the sample (``id % sample_mod == 0``, ordered by
    id; None = whole frame) collects to the driver as the constant-size
    training set, each subspace runs deterministic Lloyd (init = the
    sample's first ``n_codes`` subvectors, argmin ties to the lowest
    code, empty clusters keep their old codeword, fixed ``max_iter``),
    and the result plugs into ``pq_encode``/``pq_adc_topk`` unchanged.
    Fully deterministic — no RNG anywhere — so two runs (or two
    engines) training on the same sample produce identical codebooks.

    At 100 TB nothing here touches the corpus beyond the sampled scan:
    training cost is O(sample x codes x iter) on the driver, and the
    encode pass that follows is the same pure map either way. Returns
    ``[m][j][d]`` like ``pq_codebook``."""
    import numpy as np

    base = emb
    if sample_mod is not None:
        base = base.filter(F.col(id_col) % sample_mod == 0)
    rows = (
        base.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v"))
        .orderBy("vid")
        .collect()
    )
    if len(rows) < n_codes:
        raise ValueError(
            f"training sample has {len(rows)} vectors < n_codes={n_codes} — "
            "widen the sample (smaller sample_mod or None)"
        )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    if perm is not None:
        X = X[:, np.asarray(perm, dtype=np.int64)]
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    sd = dim // n_sub
    out = []
    for m in range(n_sub):
        S = X[:, m * sd:(m + 1) * sd]
        C = S[:n_codes].copy()
        for _ in range(max_iter):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            newC = C.copy()
            for j in range(n_codes):
                members = S[assign == j]
                if len(members):
                    newC[j] = members.mean(axis=0)
            if np.array_equal(newC, C):
                break
            C = newC
        out.append([list(c) for c in C])
    return out


def residual_ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    shortlist: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """RESIDUAL-encoded IVF-PQ — the refinement that makes IVF-PQ the
    FAISS default (Jegou et al., TPAMI 2011 §III.C): instead of
    PQ-coding raw vectors (s17), each member is coded as its residual
    r = v - centroid(assigned cell). Residuals concentrate around the
    origin (the coarse quantizer has already explained the
    between-cell variance), so the same code budget spends its
    codewords on a much tighter distribution and ADC approximates the
    TRUE L2 ||q - x|| = ||(q-c) - (x-c)|| inside each probed cell.
    The price is query-side: the lookup table is built per
    (query, probed cell) — the query's OWN residual against that
    cell — instead of once per query; with n_probe a small constant
    that is n_probe bounded kernels per query, not a corpus cost.

    Composition (every piece already oracle-checked alone): s4's
    first-N coarse quantizer and rank-1 assignment, JVM zip_with
    residuals (one broadcast-centroid map, no shuffle), the s14 encode
    kernel pointed at the residual frame, per-(query, cell) integer
    LUTs, ONE equi-join on cell_id, bounded exact-cosine rescore.
    Deterministic end to end — first-N quantizers, integer ADC,
    id tie-breaks — so the full residual path hash-checks
    cross-engine. Returns (query_id, nn_id, rank, cos_sim, adc_micro).
    """
    import numpy as np
    import pandas as pd

    v = emb.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    cents = (
        v.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("v").alias("centroid"))
    )
    cvt = cents.select("cell_id", F.col("centroid").alias("cv"))
    # rank-1 members with JVM residuals; pinned — the codebook seed
    # collect, the encode kernel, and the candidate join all read it
    members = pin(
        assign_cells(emb, cents, 1, id_col, vec_col)
        .join(F.broadcast(cvt), "cell_id")
        .select(
            "vec_id",
            "cell_id",
            F.zip_with("v", "cv", lambda a, b: a - b).alias("r"),
        )
    )
    cb = pq_codebook(members, n_sub=n_sub, n_codes=n_codes, id_col="vec_id", vec_col="r")
    sd = len(cb[0][0])
    cbs = [np.asarray(words, dtype=np.float64) for words in cb]
    cns = [(c * c).sum(axis=1) for c in cbs]
    codes = pq_encode(members, cb, id_col="vec_id", vec_col="r").select(
        F.col("vec_id").alias("nn_id"), "codes"
    )
    mem = members.select(F.col("vec_id").alias("nn_id"), "cell_id")

    # per-(query, probed cell) residual LUTs — n_queries x n_probe
    # bounded rows, never the corpus
    probes = (
        assign_cells(queries, cents, n_probe, id_col, vec_col)
        .join(F.broadcast(cvt), "cell_id")
        .select(
            F.col("vec_id").alias("query_id"),
            "cell_id",
            "v",
            F.zip_with("v", "cv", lambda a, b: a - b).alias("qr"),
        )
    )

    def qkernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(pdf["qr"].tolist(), dtype=np.float64)
            tabs = []
            for row in mat:
                t = np.empty((n_sub, len(cbs[0])), dtype=np.int64)
                for m in range(n_sub):
                    qsv = row[m * sd:(m + 1) * sd]
                    dd = (qsv * qsv).sum() + (-2.0 * (cbs[m] @ qsv) + cns[m])
                    t[m] = np.floor(dd * 1_000_000.0 + 0.5).astype(np.int64)
                tabs.append(list(t))
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "cell_id": pdf["cell_id"].to_numpy(),
                    "qtab": tabs,
                }
            )

    qtab = probes.mapInPandas(
        qkernel,
        "query_id long, cell_id long, qtab array<array<long>>",
    )

    cand = (
        mem.join(F.broadcast(qtab), "cell_id")
        .filter(F.col("query_id") != F.col("nn_id"))
        .join(codes, "nn_id")
    )
    adc = F.get(F.element_at("qtab", 1), F.element_at("codes", 1))
    for m in range(1, n_sub):
        adc = adc + F.get(F.element_at("qtab", m + 1), F.element_at("codes", m + 1))
    # narrow rows through the top-k exchange; qv re-attached to the
    # bounded shortlist from the query frame (guide §2.3)
    qvf = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    scored = cand.select("query_id", "nn_id", adc.alias("adc_micro"))
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micro"), F.asc("nn_id")
    )
    short = (
        scored.withColumn("_srnk", F.row_number().over(w_short))
        .filter(F.col("_srnk") <= shortlist)
        .drop("_srnk")
        .join(F.broadcast(qvf), "query_id")
    )
    rescored = (
        emb.select(
            F.col(id_col).alias("nn_id"), as_double(F.col(vec_col)).alias("nv")
        )
        .join(F.broadcast(short), "nn_id")
        .withColumn(
            "cos_sim",
            dot(F.col("qv"), F.col("nv"))
            / (l2_norm(F.col("qv")) * l2_norm(F.col("nv"))),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("nn_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "adc_micro",
        )
    )
