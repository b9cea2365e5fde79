"""Deterministic corpus splitting and sampling.

A training-data pipeline needs reproducible holdout assignment: the
same document must land in the same split on every run, on every
engine, regardless of partitioning — which rules out ``rand()`` and
anything seeded per-partition. The standard answer is content/key
hashing: bucket = hash(id) mod 100, split by bucket range. md5 is
engine-stable (identical hex in Spark, DuckDB, Python), so the split
is portable across the whole stack, and adding data never reshuffles
existing assignments (unlike ``randomSplit``, whose output depends on
partition layout).

Reference parity: the reference has no split concept (its unit is the
replay id set); this generalizes its deterministic id-keyed routing
(tasks/download.py batching) to fractional assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BOUNDS = {"train": (0, 90), "val": (90, 95), "test": (95, 100)}


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): first 4 hex chars of
    md5(id-as-string) parsed base 16, mod n_buckets. 16 bits of hash
    for 100 buckets keeps the modulo bias < 0.2%."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")
        % n_buckets
    )


def hash_split(
    df: DataFrame, id_col: str, bounds: dict[str, tuple[int, int]] | None = None
) -> DataFrame:
    """Assign every row a (bucket, split) by key hash. Pure map pass —
    no shuffle, no state, no driver participation; scales at exactly
    the scan rate and is reproducible across engines and runs."""
    bounds = bounds or SPLIT_BOUNDS
    b = hash_bucket(F.col(id_col))
    split = F.lit(None).cast("string")
    for name, (lo, hi) in sorted(bounds.items(), key=lambda kv: kv[1][0], reverse=True):
        split = F.when((b >= lo) & (b < hi), name).otherwise(split)
    return df.withColumn("bucket", b).withColumn("split", split)


def weighted_domain_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    n_buckets: int = 100,
) -> DataFrame:
    """Deterministic domain mixing: keep a ``weights[domain]`` fraction
    of each domain's documents (the static-weights form of LLM data
    mixture rebalancing — upweighting curated sources, downweighting
    crawl — applied as subsampling).

    Selection is hash-thresholding, not rand(): a document is kept iff
    its stable ``hash_bucket`` falls below weight * n_buckets, so the
    sample is reproducible across runs/engines, monotone in the weight
    (raising 0.3 -> 0.5 only ADDS documents — reruns of a grown mixture
    reuse everything already selected), and consistent with hash_split
    holdouts. The weights ride a broadcast literal map; the pass is
    map-only with zero shuffle.
    """
    b = hash_bucket(F.col(id_col), n_buckets)
    w = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    frac = F.coalesce(w[F.col(domain_col)], F.lit(default_weight))
    return (
        df.withColumn("bucket", b)
        .filter(F.col("bucket") < frac * n_buckets)
        .drop("bucket")
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    alpha: float = 0.7,
    budget_num: int = 3,
    budget_den: int = 5,
    n_shards: int = 16,
    exact_budget: bool = False,
) -> DataFrame:
    """Temperature-weighted domain mixture — the standard LLM
    data-mixing operator (multilingual sampling with p_d proportional
    to n_d^alpha, per Conneau & Lample's XLM and the mT5/CC-mixture
    recipes): sample each domain proportionally to count^alpha, so
    alpha=1 reproduces natural proportions, alpha->0 approaches
    uniform-over-domains, and the usual 0.5-0.7 range upweights small
    curated sources without flattening the mixture. Generalizes the
    static-weight t13 (weights given) and the hard-cap t15 (ceiling
    given): here the weights COME FROM the corpus counts.

    Determinism/exactness contract (everything integer once per-domain
    weights are formed, so the mixture is bit-reproducible on any
    engine): per-domain weight = round(n_d^alpha * 1e6) micro-units;
    the total budget = floor(N * budget_num / budget_den) documents
    (integer corpus fraction, default 60%); each domain's target =
    floor(micro_d * budget / sum(micro)) capped at n_d (floor
    undershoots the budget by < n_domains docs plus whatever the caps
    eat). ``exact_budget=True`` adds the largest-remainder topping
    (Hamilton's method): uncapped domains ranked by remainder =
    (micro_d * budget) mod sum(micro) descending (ties by domain name)
    each absorb one leftover doc — a single deterministic pass over the
    CONSTANT-SIZE domain table, so the single-partition rank window is
    n_domains rows, never the corpus; only cap-induced shortfall can
    remain (never oversampled). Selection within a domain is hash-ranked
    (md5(id), ties by id — t12's machinery), so the kept set is stable
    across runs/engines and monotone under budget growth. 64-bit note:
    micro_d * budget must stay under 2^63 — rescale the 1e6 micro-unit
    if a deployment's counts approach that.

    Scale shape: one count aggregation (map-side combinable) builds the
    constant-size per-domain weight table, joined back on the domain
    key (broadcast — one row per domain); selection is the t15
    two-phase sharded top-k, so no single task ever sorts a whole
    domain: rank within (domain, n_shards-way hash shard), keep shard
    ranks <= target (a superset), exact re-rank of the survivors only.

    Returns kept rows: (id_col, domain_col, sel_rank, n_domain,
    mix_target).
    """
    from pyspark.sql.window import Window

    cnt = df.groupBy(domain_col).agg(F.count("*").cast("long").alias("n_domain"))
    mic = cnt.withColumn(
        "micro",
        F.round(F.pow(F.col("n_domain"), F.lit(alpha)) * 1_000_000).cast("long"),
    )
    tot = mic.agg(
        F.sum("micro").cast("long").alias("tot"),
        F.sum("n_domain").cast("long").alias("n_total"),
    )
    # integer `div` end to end — long/long `/` is DOUBLE division in
    # Spark, and doubles lose exactness past 2^53 where the engines
    # could truncate differently
    budget_sql = f"(n_total * {budget_num}) div {budget_den}"
    base = (
        mic.join(F.broadcast(tot))
        .withColumn(
            "_floor", F.expr(f"(micro * ({budget_sql})) div tot").cast("long")
        )
        .withColumn("_t0", F.least(F.col("n_domain"), F.col("_floor")))
    )
    if exact_budget:
        # largest-remainder topping over the CONSTANT-SIZE domain
        # table: the un-partitioned rank window sees n_domains rows,
        # never the corpus
        base = base.withColumn(
            "_rem", F.expr(f"(micro * ({budget_sql})) % tot").cast("long")
        ).withColumn("_uncapped", F.col("_floor") < F.col("n_domain"))
        leftover = base.agg(
            (F.expr(f"max({budget_sql})") - F.sum("_t0"))
            .cast("long")
            .alias("_L")
        )
        w_lr = Window.orderBy(
            F.desc(F.when(F.col("_uncapped"), F.col("_rem")).otherwise(F.lit(-1))),
            F.col(domain_col),
        )
        base = (
            base.withColumn("_rnk", F.row_number().over(w_lr))
            .join(F.broadcast(leftover))
            .withColumn(
                "_t0",
                F.col("_t0")
                + F.when(
                    F.col("_uncapped") & (F.col("_rnk") <= F.col("_L")), 1
                ).otherwise(0),
            )
        )
    targets = base.select(
        F.col(domain_col),
        F.col("n_domain"),
        F.col("_t0").cast("long").alias("mix_target"),
    )
    h = F.md5(F.col(id_col).cast("string"))
    shard = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % n_shards
    w_shard = Window.partitionBy(domain_col, "_shard").orderBy("_h", id_col)
    w_dom = Window.partitionBy(domain_col).orderBy("_h", id_col)
    return (
        df.select(id_col, domain_col)
        .join(F.broadcast(targets), domain_col)
        .withColumn("_h", h)
        .withColumn("_shard", shard)
        .withColumn("_sr", F.row_number().over(w_shard))
        .filter(F.col("_sr") <= F.col("mix_target"))
        .withColumn("_dr", F.row_number().over(w_dom))
        .filter(F.col("_dr") <= F.col("mix_target"))
        .select(
            id_col,
            domain_col,
            F.col("_dr").cast("int").alias("sel_rank"),
            "n_domain",
            "mix_target",
        )
    )


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    n_shards: int = 16,
) -> DataFrame:
    """Exact per-group capping: keep EXACTLY min(cap, group size) rows
    per group, chosen deterministically by key hash — the "at most c
    documents per domain" pass a training-data pipeline runs to stop
    one crawl source from dominating the mixture (rate-based
    subsampling can't promise an exact ceiling).

    Selection order is md5(id) (ties broken by id), so the kept set is
    stable across runs/engines and monotone under corpus growth the
    same way hash_split is.

    Scale shape — the classic two-phase per-group top-k, NEVER a
    per-group global sort: (1) rank within (group, hash-shard) — each
    window partition holds ~1/n_shards of a group, and any row in the
    group's true top-cap is necessarily within its own shard's top-cap,
    so filtering shard_rank <= cap keeps a superset of at most
    cap * n_shards rows per group; (2) exact re-rank of that small
    surviving set per group. The heavy data shuffles once on
    (group, shard) with bounded partitions; only the capped survivors
    shuffle on the group.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % n_shards
    )
    w_shard = Window.partitionBy(group_col, "_shard").orderBy("_h", id_col)
    w_group = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("_shard", shard)
        .withColumn("_sr", F.row_number().over(w_shard))
        .filter(F.col("_sr") <= cap)  # superset: <= cap * n_shards per group
        .withColumn("_gr", F.row_number().over(w_group))
        .filter(F.col("_gr") <= cap)
        .drop("_h", "_shard", "_sr", "_gr")
    )


def token_budget_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    tokens_col: str,
    budget_tokens: int,
    alpha: float = 0.7,
    n_shards: int = 16,
) -> DataFrame:
    """Temperature-weighted domain mixture to an exact TOKEN budget —
    the unit a pretraining run actually plans by ("3T tokens", not "N
    documents"). Per-domain weights come from doc counts exactly like
    ``temperature_mixture`` (micro = round(count^alpha * 1e6)); the
    GLOBAL ``budget_tokens`` splits into per-domain token targets by
    floor shares capped at each domain's token supply, topped up
    largest-remainder (+1 token units, ties by domain name) so only
    cap-induced shortfall remains; each domain then keeps the maximal
    PREFIX of its documents, in a deterministic hash order, whose
    cumulative tokens fit the target. Doc granularity means a target
    is undershot by less than the first excluded doc's length — never
    overshot. Zero-token docs cost nothing and ride along wherever the
    running total already fits.

    Selection order is (hash-shard asc, md5(id) asc, id asc) within a
    domain — as deterministic and engine-portable as t12's plain md5
    order, chosen because it makes the running total two-phase: the
    corpus shuffles ONCE on (domain, shard), the cumulative sum runs
    within each (domain, shard) window, and the cross-shard offsets
    come from a CONSTANT-SIZE (domain x n_shards) totals table — no
    window ever sorts a whole domain in one task (the t15/t22 shard
    discipline applied to prefix sums). 64-bit note: micro * budget
    must stay under 2^63 — rescale the 1e6 micro-unit if a
    deployment's counts approach that.

    Returns kept rows: (id_col, domain_col, n_tokens, cum_tokens,
    tok_target).
    """
    from pyspark.sql.window import Window

    tok = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    cnt = df.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("n_domain"),
        F.sum(tok).cast("long").alias("tok_domain"),
    )
    mic = cnt.withColumn(
        "micro",
        F.round(F.pow(F.col("n_domain"), F.lit(alpha)) * 1_000_000).cast("long"),
    )
    tot = mic.agg(F.sum("micro").cast("long").alias("tot"))
    b = F.lit(int(budget_tokens)).cast("long")
    base = (
        mic.join(F.broadcast(tot))
        .withColumn("_floor", F.expr(f"(micro * {int(budget_tokens)}) div tot"))
        .withColumn("_t0", F.least(F.col("tok_domain"), F.col("_floor")))
        .withColumn("_rem", F.expr(f"(micro * {int(budget_tokens)}) % tot"))
        .withColumn("_uncapped", F.col("_floor") < F.col("tok_domain"))
    )
    leftover = base.agg((b - F.sum("_t0")).cast("long").alias("_L"))
    w_lr = Window.orderBy(
        F.desc(F.when(F.col("_uncapped"), F.col("_rem")).otherwise(F.lit(-1))),
        F.col(domain_col),
    )
    targets = (
        base.withColumn("_rnk", F.row_number().over(w_lr))
        .join(F.broadcast(leftover))
        .select(
            F.col(domain_col),
            (
                F.col("_t0")
                + F.when(
                    F.col("_uncapped") & (F.col("_rnk") <= F.col("_L")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("tok_target"),
        )
    )
    h = F.md5(F.col(id_col).cast("string"))
    shard = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % n_shards
    w_sc = (
        Window.partitionBy(domain_col, "_shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = (
        df.select(F.col(id_col), F.col(domain_col), tok.alias("n_tokens"))
        .join(F.broadcast(targets), domain_col)
        .withColumn("_h", h)
        .withColumn("_shard", shard)
        .withColumn("_scum", F.sum("n_tokens").over(w_sc))
    )
    # cross-shard offsets over the constant-size (domain, shard) table
    w_off = (
        Window.partitionBy(domain_col)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = (
        rows.groupBy(domain_col, "_shard")
        .agg(F.sum("n_tokens").alias("_st"))
        .withColumn("_off", F.sum("_st").over(w_off) - F.col("_st"))
        .select(domain_col, "_shard", "_off")
    )
    return (
        rows.join(F.broadcast(offs), [domain_col, "_shard"])
        .withColumn(
            "cum_tokens", (F.col("_off") + F.col("_scum")).cast("long")
        )
        .filter(F.col("cum_tokens") <= F.col("tok_target"))
        .select(id_col, domain_col, "n_tokens", "cum_tokens", "tok_target")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, the exponential-race formulation): row i gets the
    race key ln(u_i) / w_i with u_i a deterministic md5-uniform of its
    id, and the k LARGEST keys win — exactly the distribution of
    drawing k items one by one with probability proportional to the
    remaining weights. The "sample documents proportional to quality /
    length" primitive a mixture-building pipeline runs, with the
    engine's no-RNG discipline: same input -> same sample, and a SQL
    oracle re-derives every key.

    Keys quantize to integer micro-units (the t14/t25 convention) with
    the id as the total-order tie-break, so selection and ranks are
    engine-exact. Rows with NULL or non-positive weight cannot race
    and are excluded (ln(u)/w flips sign at w<0 and divides by zero at
    w=0 — silently keeping them would corrupt the distribution).

    Scale shape: one map pass for the keys, then a global top-k via
    orderBy().limit(k) — Spark's TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge), NEVER a single-partition sort of
    the corpus; the rank window runs over the k survivors only.
    Returns (id, weight, key_micro, rank) ordered by rank."""
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float((1 << 60) + 1))  # (0, 1]
    w = F.col(weight_col).cast("double")
    keyed = (
        df.filter(F.col(weight_col).isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            # the weight rides out in its OWN type: a long cast would
            # truncate fractional weights (a quality score in [0,1])
            # to 0/1 in the audit column
            F.col(weight_col).alias("weight"),
            F.round(F.log(u) / w * 1_000_000).cast("long").alias("key_micro"),
        )
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )
    # bounded window: k rows, not the corpus
    return keyed.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("key_micro"), F.asc(id_col)))
        .cast("int"),
    ).orderBy("rank")


def gumbel_topk_sample(
    df: DataFrame,
    id_col: str,
    logw_micro_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement when weights
    arrive in LOG space (integer micro-units) — the Gumbel-top-k trick:
    the k largest values of logw + Gumbel(u) are distributed exactly as
    k successive draws proportional to exp(logw), the same distribution
    ``weighted_sample`` realizes for linear weights (the two races are
    the same theorem in different parameterizations: ln(u)/w ~
    -Exp/w and logw + Gumbel are both argmax-equivalent). Needed
    where exp(logw) would overflow or underflow a double — DSIR's
    importance weights span thousands of nats, so the linear-space
    race is not an option.

    Same no-RNG discipline as weighted_sample: u is the md5-uniform of
    the id (strictly inside (0, 1), so -ln(-ln u) is finite), the
    Gumbel quantizes to integer micro-units, the id breaks ties
    totally, and a SQL oracle re-derives every key. NULL log-weights
    cannot race and are excluded (a doc the scorer never saw must not
    win by accident); logw = 0 is a legitimate weight (exp(0) = 1)
    and races normally.

    Scale shape: one map pass for keys, then a global top-k via
    orderBy().limit(k) — TakeOrderedAndProject (per-partition heaps +
    a k-row merge), never a full sort; the rank window sees k rows.
    Returns (id, logw_micro, key_micro, rank) ordered by rank."""
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float((1 << 60) + 1))  # (0, 1)
    lw = F.col(logw_micro_col).cast("long")
    keyed = (
        df.filter(lw.isNotNull())
        .select(
            F.col(id_col),
            lw.alias("logw_micro"),
            (lw + F.round(-F.log(-F.log(u)) * 1_000_000).cast("long")).alias(
                "key_micro"
            ),
        )
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )
    return keyed.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("key_micro"), F.asc(id_col)))
        .cast("int"),
    ).orderBy("rank")


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = 3,
    bounds: dict[str, tuple[int, int]] | None = None,
    signature_df: DataFrame | None = None,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Holdout split keyed by near-dup CLUSTER, not by document: every
    member of a near-duplicate cluster hashes on the cluster's min id,
    so no near-dup pair can straddle train and the holdouts. The
    doc-keyed split (t12/hash_split) silently leaks on a corpus that
    KEEPS its near-dups — a train doc's 95%-identical sibling lands in
    test with the holdout probability, and eval then measures
    memorization (the benchmark-contamination path the dedup
    literature warns about; Lee et al. 2022 §6.2 measure exactly this
    train/val dup leakage). Dropping dups (curate) is one fix;
    confining each cluster to one split is the other, for pipelines
    that keep near-dups on purpose (e.g. quality-weighted sampling
    over them later).

    Composition — d8's machinery re-pointed at split assignment: LSH
    band join -> exact verify -> connected components -> split_key =
    cluster id (min member id; unclustered docs key on themselves) ->
    the t12 bucket formula over the KEY. Deterministic end to end,
    SQL-oracle-checkable including the recursive closure. Scale shape
    is d8's (bounded candidate pairs, pointer-jumping components, no
    all-pairs) plus one map for the split.

    Returns ``df``'s rows + (split_key, bucket, split)."""
    from .dedup import dup_clusters

    clusters = dup_clusters(
        df, id_col, text_col, n=n, threshold=threshold,
        signature_df=signature_df, shingle_df=shingle_df,
    )
    keyed = (
        df.join(
            clusters.select(
                F.col("doc_id").alias(id_col), "cluster_id"
            ),
            id_col,
            "left",
        )
        .withColumn(
            "split_key",
            F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("long"),
        )
        .drop("cluster_id")
    )
    return hash_split(keyed, "split_key", bounds)
