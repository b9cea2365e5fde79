"""Text-analysis operators for training-data pipelines (SURVEY.md 2.11):
language-ID, quality scoring, token counting, document fingerprinting.

Everything is built-in column expressions — these run inside whole-stage
codegen over the raw text column, one scan, no shuffle at all (pure map),
which is exactly what you want for a 100 TB quality-filter pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text, tokens
from ..pinning import pin

# Marker stopwords per language for the n-gram/marker-word heuristic
# language id. Deterministic and cheap; a real pipeline would swap in a
# fastText-style model via pandas_udf without changing the plan shape.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "los", "de", "que"),
    "fr": ("le", "la", "les", "des", "et"),
    "de": ("der", "die", "das", "und", "ist"),
}

# A small English stopword list for quality features.
STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it")

# BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-space symbol — the standard pre-tokenization split.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish pre-tokens via regexp_extract_all."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).cast("long")


def _ratio(tok_pred: Column, tk: Column) -> Column:
    return F.size(F.filter(tk, tok_pred)) / F.greatest(F.size(tk), F.lit(1))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: length, token stats, punctuation and
    stopword ratios, mean token length. Pure map, zero shuffles.

    The token array is materialized in its own projection so the five
    consumers reference it instead of re-tokenizing (Catalyst's
    CollapseProject keeps non-cheap multi-referenced aliases staged).
    """
    text = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.length(text).cast("long").alias("n_chars_actual"),
        tokens(text).alias("_tk"),
        F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).alias("_punct"),
    )
    tk = F.col("_tk")
    n_tok = F.size(tk)
    return staged.select(
        F.col(id_col),
        "n_chars_actual",
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.aggregate(tk, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / F.greatest(n_tok, F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.round(F.col("_punct") / F.greatest(F.col("n_chars_actual"), F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(_ratio(lambda x: x.isin(*STOPWORDS), tk), 4).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scalar quality score in [0,1]: length sweet-spot x stopword signal.

    Heuristic stand-in for a model-based scorer; the plan shape (pure map
    over the corpus) is the deliverable.
    """
    feats = quality_features(df, id_col, text_col)
    len_ok = F.when(F.col("n_tokens").between(10, 100000), F.lit(0.5)).otherwise(F.lit(0.0))
    stop_ok = F.when(F.col("stopword_ratio").between(0.01, 0.6), F.lit(0.5)).otherwise(F.lit(0.0))
    return feats.select(F.col(id_col), F.round(len_ok + stop_ok, 2).alias("quality"))


def with_quality(df: DataFrame, text_col: str) -> DataFrame:
    """``quality_score`` as an appended column: same scoring expression,
    but keeping every input column so a filter pass needs NO self-join
    back on the id (a pure map stays a pure map at 100 TB)."""
    tk = tokens(F.col(text_col))
    n_tokens = F.size(tk)
    # round(.,4) BEFORE the between test — bit-identical to the
    # quality_features -> quality_score path at the band edges
    stop_ratio = F.round(_ratio(lambda t: t.isin(*STOPWORDS), tk), 4)
    len_ok = F.when(n_tokens.between(10, 100000), F.lit(0.5)).otherwise(F.lit(0.0))
    stop_ok = F.when(stop_ratio.between(0.01, 0.6), F.lit(0.5)).otherwise(F.lit(0.0))
    return df.withColumn("quality", F.round(len_ok + stop_ok, 2))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts,
    'und' (undetermined) when nothing matches.

    Staged in three projections — tokenize once, count each language's
    markers once, then run the (cheap, int-only) argmax when-chain —
    because the chain references every count ~3x and would otherwise
    re-tokenize the text a dozen times per row (measured ~4x slower).
    """

    def in_set(markers):
        # closure factory: a default-arg lambda would be mis-read by
        # PySpark's higher-order-function signature inspection
        return lambda x: x.isin(*markers)

    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    counted = toked.select(
        F.col(id_col),
        *[
            F.size(F.filter(F.col("_tk"), in_set(markers))).alias(f"_c_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    best = None
    best_count = None
    for lang in LANG_MARKERS:
        cnt = F.col(f"_c_{lang}")
        if best is None:
            best, best_count = F.lit(lang), cnt
        else:
            cond = cnt > best_count
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_count = F.when(cond, cnt).otherwise(best_count)
    pred = F.when(best_count > 0, best).otherwise(F.lit("und"))
    return counted.select(F.col(id_col), pred.alias("pred_lang"))


def repetition_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, flag_above: float = 0.08
) -> DataFrame:
    """Gopher-style repetition signal (Rae et al. 2021 §A1.1): the
    fraction of a document's word n-gram occurrences taken by its single
    most frequent n-gram. Boilerplate/spam repeats phrases; prose doesn't.

    Unlike the dedup shingles this keeps DUPLICATE n-grams (the repeats
    are the signal). explode -> per-(doc, gram) count -> per-doc
    max/total: two aggregations, both map-side combinable, keyed by doc
    so the shuffle is narrow and skew-free at corpus scale.

    Returns (doc_id, n_ngrams, top_ngram_frac, is_repetitive).
    """
    tk_col = tokens(F.col(text_col))
    staged = df.select(F.col(id_col).alias("doc"), tk_col.alias("_tk"))
    tk = F.col("_tk")
    idx = F.sequence(F.lit(0), F.size(tk) - n)
    # short docs get an empty gram array INSIDE the expression (sequence
    # with a negative end would walk backwards), and the explode is
    # explode_outer + null filter rather than a plain explode with a
    # pre-filter: Catalyst's InferFiltersFromGenerate would push a
    # size(grams) > 0 predicate below the token projection, inlining the
    # whole gram transform (with tokens() re-run per element_at) into an
    # interpreted Filter — measured 7.2 s vs 0.9 s at sf0.1.
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(tk, i + j + 1) for j in range(n)])
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        staged.select("doc", F.explode_outer(grams).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy("doc", "gram")
        .agg(F.count("*").alias("c"))
    )
    frac = F.max("c") / F.sum("c")
    return counts.groupBy("doc").agg(
        F.sum("c").cast("long").alias("n_ngrams"),
        F.round(frac, 4).alias("top_ngram_frac"),
        (frac > flag_above).alias("is_repetitive"),
    ).select(
        F.col("doc").cast("long").alias("doc_id"),
        "n_ngrams",
        "top_ngram_frac",
        "is_repetitive",
    )


# C4-style scrub patterns (public-knowledge cleaning heuristics: Raffel
# et al. 2020's boilerplate removal family + the standard PII-shaped
# redactions every crawl pipeline applies). Kept to the Java-regex /
# RE2 COMMON SUBSET (character classes, bounded repeats; no lookaround,
# no backreferences in the MATCH) so the DuckDB oracle runs the
# identical patterns.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# strip query/fragment from URLs (tracking params are the classic
# near-dup inflater: same page, thousand utm_ variants)
URL_QUERY_PATTERN = r"(https?://[^\s?#]+)[?#][^\s]*"
# deliberately aggressive phone-shaped digit-run redaction (C4-style:
# favor recall over precision on PII)
PHONE_PATTERN = r"\+?\d[\d\-\s()]{7,}\d"


def scrub_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII-shaped redaction + URL canonicalization as three sequential
    pure-regexp map passes (zero shuffle, whole-stage codegen; at
    100 TB this is a free rider on whatever scan already touches the
    text): emails -> ``<EMAIL>``, then URL query/fragment stripping,
    then phone-shaped digit runs -> ``<PHONE>``.

    Pass order is part of the contract — each pass's count is measured
    on ITS OWN input (the previous pass's output), so engines agree
    bit-for-bit on overlapping patterns (a digit run inside a URL query
    is gone before the phone pass looks). Replaces ``text_col`` in
    place and appends n_emails / n_urls_canonicalized / n_phones /
    was_redacted.
    """
    t0 = F.col(text_col)
    s1 = F.regexp_replace(t0, EMAIL_PATTERN, "<EMAIL>")
    step1 = df.withColumn(
        "n_emails", F.regexp_count(t0, F.lit(EMAIL_PATTERN)).cast("long")
    ).withColumn(text_col, s1)
    t1 = F.col(text_col)
    step2 = step1.withColumn(
        "n_urls_canonicalized",
        F.regexp_count(t1, F.lit(URL_QUERY_PATTERN)).cast("long"),
    ).withColumn(text_col, F.regexp_replace(t1, URL_QUERY_PATTERN, "$1"))
    t2 = F.col(text_col)
    return (
        step2.withColumn(
            "n_phones", F.regexp_count(t2, F.lit(PHONE_PATTERN)).cast("long")
        )
        .withColumn(text_col, F.regexp_replace(t2, PHONE_PATTERN, "<PHONE>"))
        .withColumn(
            "was_redacted",
            (F.col("n_emails") + F.col("n_urls_canonicalized") + F.col("n_phones"))
            > 0,
        )
    )


def corpus_stats(
    df: DataFrame,
    group_col: str = "lang",
    distinct_col: str = "source",
    value_col: str = "n_chars",
    quantiles: tuple[float, float] = (0.5, 0.9),
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group corpus distribution stats: doc count, distinct-source
    count, and the median/p90 of ``value_col``.

    The DEFAULT quantile path is ``percentile_approx`` (mergeable
    sketch, bounded memory per task, map-side combinable — rank error
    <= 1/``accuracy``): the only formulation that survives a 100-TB
    corpus, where a single group's exact percentile would buffer
    billions of values in one aggregation task. ``exact=True`` is the
    oracle-checkable verification twin (exact interpolated percentile,
    bit-comparable against quantile_cont in a SQL engine — the
    d2-vs-d7 pattern) and the path the t5 catalog entry pins; the
    approx default is plan-gated in test_plan_quality.py. Note the
    twins differ in kind, not just error: approx returns an actual
    data value, exact interpolates between adjacent ones.

    Returns (group, n_docs, n_sources, median_chars, p90_chars).
    """
    lo, hi = quantiles
    if exact:
        med = F.percentile(value_col, F.lit(lo))
        p90 = F.percentile(value_col, F.lit(hi))
    else:
        med = F.percentile_approx(value_col, F.lit(lo), F.lit(accuracy))
        p90 = F.percentile_approx(value_col, F.lit(hi), F.lit(accuracy))
    return df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct(distinct_col).cast("long").alias("n_sources"),
        F.round(med.cast("double"), 4).alias("median_chars"),
        F.round(p90.cast("double"), 4).alias("p90_chars"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stable content fingerprint: md5 of normalized text (C-equivalent of
    the reference's id-based identity, content-addressed instead)."""
    return df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    budget: int = 512,
    n_shards: int = 4,
) -> DataFrame:
    """Sequence packing for pretraining batches: concatenate documents in
    deterministic (group, shard, id) order and chunk the stream into
    fixed ``budget``-token context windows — each document is assigned
    the bin where its first token lands (GPT-style concat-then-chunk
    packing; Raffel et al. 2020 "packing" in T5 does the same).

    A document's bin depends on the cumulative token count of every
    document before it, which is a prefix sum — one window cumsum per
    (group, shard) partition, a single narrow shuffle keyed by the pack
    partition. The shard key (leading hex byte of md5(id), so
    engine-independent) caps partition size and sets parallelism
    independent of group cardinality: 20 sources would otherwise bound
    the job at 20 tasks no matter how many executors the cluster has.

    Returns (doc_id, <group_col>, shard, n_tokens, bin_id,
    offset_in_bin).
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10).cast("int")
        % n_shards
    )
    staged = df.select(
        F.col(id_col).alias("_doc"),
        F.col(group_col).alias("_grp"),
        shard.alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_grp", "shard").orderBy("_doc")
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return staged.select(
        F.col("_doc").cast("long").alias("doc_id"),
        F.col("_grp").alias(group_col),
        "shard",
        "n_tokens",
        F.floor(cum_before / F.lit(float(budget))).cast("long").alias("bin_id"),
        (cum_before % budget).cast("long").alias("offset_in_bin"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k1: float = 1.5,
    b: float = 0.75,
    n_query_terms: int = 3,
    min_term_len: int = 4,
    topk: int = 20,
) -> DataFrame:
    """BM25 relevance ranking: score every document against a query term
    set and return the top ``topk`` — the retrieval pass a training-data
    pipeline runs to mine topical subsets (and the lexical half of a
    RAG retriever). The query terms are data-driven: the
    ``n_query_terms`` highest-document-frequency terms of at least
    ``min_term_len`` chars, so the query is deterministic for any corpus
    and never vacuous.

    Plan shape (one tokenize pass, everything downstream shares it):
    term frequencies are pinned and feed BOTH the document-length /
    document-frequency statistics and the scoring join. The query-term
    frame is ``n_query_terms`` rows — broadcast — so the corpus-sized
    ``tf`` relation is filtered to matching terms BEFORE the doc-length
    equi-join (the only real shuffle). Corpus stats (N, total tokens)
    ride in as a broadcast 1-row aggregate, never a driver collect.

    Determinism: each (doc, term) BM25 contribution quantizes to integer
    micro-units before the per-doc sum (same technique as the unigram
    log-prob scorer), so the aggregate is reduction-order-exact across
    engines; ties in the top-k break on doc_id.
    """
    from ..pinning import pin

    tk = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = tk.groupBy(id_col, "term").agg(F.count("*").alias("tf")).transform(pin)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).transform(pin)
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (
        dfreq.filter(F.length("term") >= min_term_len)
        .orderBy(F.desc("df"), "term")
        .limit(n_query_terms)
    )

    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfc = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    micro = F.round(idf * tfc * F.lit(1_000_000.0)).cast("long")

    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("matched"),
            F.sum(micro).cast("long").alias("score_micro"),
        )
    )
    return (
        scored.orderBy(F.desc("score_micro"), id_col)
        .limit(topk)
        .select(
            F.col(id_col).cast("long"),
            "matched",
            "score_micro",
            F.round(F.col("score_micro").cast("double") / F.lit(1_000_000.0), 6).alias(
                "bm25"
            ),
        )
    )


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 16,
    min_tokens: int = 8,
) -> DataFrame:
    """Overlapping fixed-size token windows — the chunking pass every
    RAG retriever and long-context pretraining pipeline runs before
    embedding or packing (window/stride chunking with overlap; stride <
    window yields ``window - stride`` tokens of context carryover).

    Pure map + Generate: the token array materializes once per document,
    start offsets come from ``sequence(0, n-1, stride)``, and
    ``posexplode`` emits one row per window — zero shuffles, no Python,
    so the pass streams at scan speed over 100 TB and the downstream
    embedding stage controls its own parallelism. Tail windows shorter
    than ``min_tokens`` are dropped (they are always a suffix of the
    start list, so ``chunk_id`` numbering stays dense from 0 over kept
    prefixes). ``chunk_id`` is the window ordinal (``start / stride``),
    stable under re-chunking with the same geometry.
    """
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col),
        F.col("_tk"),
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("_tk") - 1, F.lit(0)),
                F.lit(stride),
            )
        ).alias("chunk_id", "start_tok"),
    )
    remaining = F.size("_tk") - F.col("start_tok")
    return staged.filter(remaining >= min_tokens).select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(window), remaining).cast("long").alias("n_tokens"),
        F.array_join(
            F.slice("_tk", F.col("start_tok") + 1, window), " "
        ).alias("chunk_text"),
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", vocab_size: int = 256, n_shards: int = 16
) -> DataFrame:
    """Frequency vocabulary for dictionary encoding: the ``vocab_size``
    most frequent tokens (count desc, token asc — a total order, so the
    boundary is deterministic) with dense ids 0..V-1. The id table is
    what a tokenizer ships to training.

    Scale shape: one map-side-combinable count aggregation, then the
    t15 two-phase top-k — tokens rank within an md5 shard first
    (bounded partitions; a corpus has millions of distinct tokens and
    a single global rank window over them would serialize), shard
    survivors (<= n_shards * vocab_size rows) take the exact global
    rank. Returns (token, token_id)."""
    from pyspark.sql.window import Window

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("n"))
    shard = F.conv(F.substring(F.md5("token"), 1, 2), 16, 10).cast("int") % n_shards
    w_shard = Window.partitionBy("_shard").orderBy(F.desc("n"), F.asc("token"))
    survivors = (
        counts.withColumn("_shard", shard)
        .withColumn("_sr", F.row_number().over(w_shard))
        .filter(F.col("_sr") <= vocab_size)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        survivors.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= vocab_size)
        .select("token", (F.col("_r") - 1).cast("int").alias("token_id"))
    )


def vocab_encode(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dictionary-encode each document's token stream against a
    (token, token_id) vocabulary: out-of-vocabulary tokens become -1
    (the UNK a downstream tokenizer maps explicitly). Output is
    anchored on the INPUT ids — empty/null-text documents come back
    with an empty ids array rather than vanishing (the t20 lesson).

    Scale shape: posexplode (map) -> broadcast/AQE join against the
    constant-size vocabulary -> one re-aggregation keyed by doc with
    order restored from the token position. Nothing O(corpus) in one
    task; the vocabulary never exceeds vocab_size rows.

    Returns (id_col, n_tokens, n_oov, ids array<int> in token order)."""
    flat = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token")
    ).filter(F.col("token") != "")
    enc = flat.join(F.broadcast(vocab), "token", "left").withColumn(
        "tid", F.coalesce(F.col("token_id"), F.lit(-1)).cast("int")
    )
    agg = enc.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum((F.col("tid") == -1).cast("long")).cast("long").alias("n_oov"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))), lambda x: x["tid"]
        ).alias("ids"),
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
        F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
    )


# --- subword (BPE-style) vocabulary -----------------------------------------


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_word_types: int = 256,
    n_shards: int = 16,
) -> list[tuple[str, str, int]]:
    """Bounded deterministic byte-pair-encoding merges (Sennrich et al.,
    ACL 2016) — the subword step a pretraining tokenizer runs after the
    whole-token dictionary (t23/build_vocab): starting from character
    symbols, repeatedly merge the most frequent adjacent symbol pair
    across the word-type table, ``n_merges`` times. No RNG anywhere;
    ties break (count desc, left asc, right asc), so the merge table is
    a pure function of the corpus.

    Scale shape (the s19/fit_kmeans pattern — train on constant-size
    sufficient statistics, apply distributed): word-type counts are one
    map-side-combinable aggregation; the ``max_word_types`` most
    frequent types (count desc, word asc) survive via the t15 two-phase
    sharded top-k — never a global window over millions of types, never
    a corpus collect. Only that bounded (word, freq) table reaches the
    driver; the merge loop itself is O(max_word_types * n_merges) pure
    Python. BPE training is inherently sequential in the merge rank, so
    a distributed loop would buy n_merges shuffles over a table that
    fits in L2 — the bounded-collect is the honest plan.

    Merge application is the canonical greedy leftmost non-overlapping
    scan (Sennrich's learn_bpe): walk the symbol list once, merging at
    every (left, right) adjacency and skipping both symbols — a run of
    n repeated symbols becomes floor(n/2) merged symbols then at most
    one leftover, exactly. (An earlier two-pass single-space replace
    convention diverged from greedy on runs >= 5: 'aaaaa' ->
    [aa, a, aa]; :func:`bpe_segment` and the t24 oracle reproduce the
    greedy scan via the double-space replace encoding documented
    there.)

    Returns ``[(left, right, pair_count), ...]`` in merge order.
    """
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("n"))
    # top-K via orderBy+limit = TakeOrderedAndProject: each partition
    # keeps its own top-K and the driver merges K x partitions rows —
    # the same never-a-global-window scale shape as the old two-phase
    # shard rank, two window stages (one of them a single-partition
    # exchange) cheaper (optimization guide §2.4; OPTIMIZATION_r12.md)
    types = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(max_word_types)
        .select("token", "n")
        .collect()
    )
    segs = {row["token"]: list(row["token"]) for row in types}
    freq = {row["token"]: int(row["n"]) for row in types}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, syms in segs.items():
            n = freq[word]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for word, syms in segs.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[word] = out
    return merges


def bpe_segment(text_col: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Apply a trained merge table to one token column via the
    double-space replace encoding: symbols separated by TWO spaces,
    each merge one literal replace of ``" l  r "`` with ``" lr "`` in
    rank order. The pattern consumes one space from each 2-space
    boundary and the replacement restores it, so adjacent matches never
    fight over a shared boundary character and one left-to-right
    non-overlapping replace pass IS the canonical greedy scan — a run
    of n repeated symbols merges to floor(n/2) pairs, matching
    :func:`bpe_train`'s list walk exactly (the old single-space
    two-pass form diverged on runs >= 5). Pure column expression — the
    encode stays a map inside codegen with the constant merge table
    folded into the plan; output is single-space-joined."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(text_col)),
        lambda i: text_col.substr(i, F.lit(1)),
    )
    seg = F.concat(F.lit("  "), F.array_join(chars, "  "), F.lit("  "))
    for left, right, _ in merges:
        pat, rep = F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
        seg = F.replace(seg, pat, rep)
    return F.trim(F.replace(seg, F.lit("  "), F.lit(" ")))


def bpe_token_stream(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, pos, token): the pinned occurrence stream every BPE
    apply-side consumer derives from — pinned because the type
    extraction and the encode join both read it, and unpinned the
    tokenize+posexplode would run once per consumer."""
    return pin(
        df.select(
            F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token")
        ).filter(F.col("token") != "")
    )


def bpe_type_table(
    flat: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """(token, n_occ, _syms): one row per word TYPE with its occurrence
    count and its segmentation under ``merges``. Segmentation runs once
    per type, not per occurrence — the tokenizer-cache standard
    (HF/sentencepiece memoize segmentations): the chained merge
    replaces cost O(merges * chars) per input, and a zipfian corpus has
    orders of magnitude fewer types than occurrences. The occurrence
    count rides the same map-side-combinable aggregation that
    deduplicates the types, so the symbol vocabulary can be derived
    from this table alone (count x multiplicity) without exploding
    subwords per occurrence (optimization guide §2.3: aggregate before
    you shuffle). Pinned: the symbol vocab and the token->ids map both
    read it."""
    return pin(
        flat.groupBy("token")
        .agg(F.count("*").cast("long").alias("n_occ"))
        .withColumn(
            "_syms", F.split(bpe_segment(F.col("token"), merges), " ")
        )
    )


def bpe_subwords(
    df: DataFrame, merges: list[tuple[str, str, int]], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, pos, i, sym): every subword occurrence in stream order
    (the per-occurrence view; the t24/tokenize artifact path works from
    :func:`bpe_type_table` instead and never materializes this
    fan-out)."""
    flat = bpe_token_stream(df, id_col, text_col)
    segs = bpe_type_table(flat, merges).select("token", "_syms")
    return flat.join(segs, "token").select(
        id_col, "pos", F.posexplode("_syms").alias("i", "sym")
    )


def bpe_symbol_vocab(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    types: DataFrame | None = None,
) -> DataFrame:
    """(sym, n, sym_id) over the whole corpus stream. The symbol table
    is PROVABLY bounded — every symbol is a single corpus character or
    one of the ``len(merges)`` merged symbols — so the dense-rank window
    (count desc, symbol asc) runs over a constant-size input, not the
    corpus. ``n`` counts OCCURRENCES, derived as count x multiplicity
    from the TYPE table: the old formulation exploded one row per
    subword occurrence and re-aggregated that corpus-scale stream; this
    explodes the type table only (distinct tokens x symbols-per-type
    rows) — value-identical, one corpus-scale explode+shuffle less
    (OPTIMIZATION_r12.md). Pass ``types`` (a pinned
    :func:`bpe_type_table`) when the caller also encodes."""
    from pyspark.sql.window import Window

    if types is None:
        types = bpe_type_table(bpe_token_stream(df, id_col, text_col), merges)
    return (
        types.select("n_occ", F.explode("_syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("n_occ").cast("long").alias("n"))
        .withColumn(
            "sym_id",
            (F.row_number().over(Window.orderBy(F.desc("n"), F.asc("sym"))) - 1).cast(
                "int"
            ),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    types: DataFrame | None = None,
    flat: DataFrame | None = None,
) -> DataFrame:
    """Encode each document's token stream to subword ids under a
    trained merge table. The symbol vocabulary is PROVABLY bounded:
    every symbol is either a single character seen in the corpus or one
    of the ``len(merges)`` merged symbols, so ranking it (count desc,
    symbol asc -> dense ids) is a constant-size step — unlike t23 there
    is no OOV, every token segments to known symbols.

    Scale shape (OPTIMIZATION_r12.md — the old path exploded one row
    per SUBWORD occurrence and reassembled the corpus from that
    fan-out): posexplode tokens once (map) -> type table (one
    combinable count agg; merge application constant-folded per TYPE)
    -> token -> id-array map built entirely at type level (bounded
    explode + broadcast vocab join + per-type reassembly) -> one
    equi-join back to the token stream -> one doc-keyed reassembly of
    token-level id ARRAYS. The corpus-scale shuffles carry token rows
    and flattened arrays, never per-subword rows — value-identical
    output, ~subwords-per-token x fewer shuffled rows.

    Returns (id_col, n_tokens, n_subwords, ids array<int> in stream
    order), anchored on the INPUT ids (empty/null docs -> empty array).
    Callers producing the vocab AND the encode (the t24 entry,
    jobs/tokenize.py) should pass one pinned ``types`` (+ ``flat``) to
    both so the tokenize+segment pass materializes once."""
    if flat is None:
        flat = bpe_token_stream(df, id_col, text_col)
    if types is None:
        types = bpe_type_table(flat, merges)
    if vocab is None:
        # bounded symbol table: <= distinct corpus chars + len(merges)
        vocab = bpe_symbol_vocab(df, merges, id_col, text_col, types=types)
    # token -> dense-id array, built once per word TYPE: explode the
    # type table's segmentations (bounded), attach ids via the
    # broadcast vocab, reassemble each type's array in symbol order
    type_ids = (
        types.select("token", F.posexplode("_syms").alias("i", "sym"))
        .join(F.broadcast(vocab.select("sym", "sym_id")), "sym")
        .groupBy("token")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "sym_id"))),
                lambda x: x["sym_id"],
            ).alias("_tok_ids")
        )
    )
    agg = (
        flat.join(type_ids, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.size("_tok_ids")).cast("long").alias("n_subwords"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_tok_ids"))),
                    lambda x: x["_tok_ids"],
                )
            ).alias("ids"),
        )
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("n_subwords", F.lit(0).cast("long")).alias("n_subwords"),
        F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
    )


# --- bigram language-model scoring (perplexity filtering) -------------------


def _bigram_staged(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _tk) token-array projection. The token array is
    materialized in its own projection FIRST: downstream transforms
    reference it via element_at twice per element, and passing the
    split expression itself would re-tokenize the text O(tokens) times
    per row (the shingles_from_tokens gotcha, dedup.py — measured
    9.3 s -> <1 s for the bigram explode at sf0.1)."""
    return df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))


def _bigram_occurrences(staged: DataFrame, id_col: str) -> DataFrame:
    """The (id, w1, w2) bigram occurrence stream from a ``_bigram_staged``
    projection — one transform over a sequence, no positional self-join;
    docs with < 2 tokens (or an empty normalized text) contribute no
    rows."""
    tk = F.col("_tk")
    pairs = F.when(
        (F.size(tk) >= 2) & (F.element_at(tk, 1) != ""),
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"),
                F.element_at(tk, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return staged.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_lm_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    _staged: DataFrame | None = None,
    _occ: DataFrame | None = None,
) -> DataFrame:
    """The add-one-smoothed bigram LM's sufficient statistics as
    MERGEABLE (kind, w1, w2, n) rows — the persistable form of the t25
    model, shaped for the signature lake's facet protocol
    (jobs/doc_signature_lake.py): per-batch rows land at ingest and
    compaction reduces them by the merge laws, so a 100 TB corpus's LM
    is served from the stored rows instead of retrained per run.

    - ``kind='bigram'``: bigram TYPE counts c(w1, w2) — merge law SUM
      (counts are additive across disjoint batches).
    - ``kind='vocab'``: one row per distinct token (w2 NULL, n = 1) —
      merge law DISTINCT union. Stored as rows (not a scalar) because
      distinct counts don't add; the context count c(w1·) needs no leg
      at all — it is the w1-marginal of the bigram rows.

    Scale shape: one explode + two combinable aggregations; the row
    set is O(bigram types), never O(corpus). ``_staged``/``_occ`` let
    a caller that also scores (bigram_logprob) share one pinned
    tokenize + explode instead of paying it twice."""
    staged = _staged if _staged is not None else _bigram_staged(df, id_col, text_col)
    occ = _occ if _occ is not None else _bigram_occurrences(staged, id_col)
    null_s = F.lit(None).cast("string")
    big = (
        occ.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("bigram").alias("kind"), "w1", "w2", "n")
    )
    voc = (
        staged.select(F.explode(F.col("_tk")).alias("w1"))
        .filter(F.col("w1") != "")
        .distinct()
        .select(
            F.lit("vocab").alias("kind"),
            "w1",
            null_s.alias("w2"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    return big.unionByName(voc)


def merge_lm_rows(rows: DataFrame) -> DataFrame:
    """Merge any union of per-batch LM rows back to ONE model in the
    same (kind, w1, w2, n) shape: SUM per bigram type, DISTINCT vocab.
    Associative; merging disjoint batches' rows equals training from
    scratch on their union (property-tested in tests/test_sketch_lake
    .py). NOT idempotent on the bigram leg — counts are additive, so a
    batch's rows must enter the merge exactly once (the lake's
    committed-partition read guarantees that; compaction's crash window
    is healed by excluding manifest-replaced batches, see
    read_corpus_lm)."""
    null_s = F.lit(None).cast("string")
    big = (
        rows.filter(F.col("kind") == "bigram")
        .groupBy("w1", "w2")
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.lit("bigram").alias("kind"), "w1", "w2", "n")
    )
    voc = (
        rows.filter(F.col("kind") == "vocab")
        .select("w1")
        .distinct()
        .select(
            F.lit("vocab").alias("kind"),
            "w1",
            null_s.alias("w2"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    return big.unionByName(voc)


def bigram_nll_with_lm(
    df: DataFrame,
    lm_rows: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    _occ: DataFrame | None = None,
) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    bigram model GIVEN as (kind, w1, w2, n) rows (``bigram_lm_rows``
    output or the lake's stored/merged facet): P(w2|w1) =
    (c(w1,w2) + 1) / (c(w1·) + V). Bigrams/contexts unseen by the
    model coalesce to count 0 — exactly what the smoothing is for —
    so a doc can be scored under a corpus LM it wasn't part of.

    Determinism: each scored bigram's ln P quantizes to integer
    micro-units once (the t14 convention), documents sum integers, so
    cross-engine float summation order cannot flip a bit. When the
    model was trained on these very docs the output is bit-identical
    to training from scratch (every occurrence then has a model row,
    so the left joins degenerate to t25's inner joins).

    Scale shape: c(w1·) and V reduce from the MODEL rows (O(types),
    not O(corpus)); scoring is one equi-join of the occurrence stream
    against the bigram table plus one doc-keyed integer sum.

    Returns (id_col, n_bigrams, nll_micro, avg_nll_micro) anchored on
    the INPUT ids (docs with < 2 tokens score 0)."""
    c2 = lm_rows.filter(F.col("kind") == "bigram").select(
        "w1", "w2", F.col("n").alias("c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vsize = (
        lm_rows.filter(F.col("kind") == "vocab")
        .select("w1")
        .distinct()
        .agg(F.count("*").cast("long").alias("v"))
    )
    lp = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
                * 1_000_000
            )
            .cast("long")
            .alias("micro"),
        )
    )
    occ = (
        _occ
        if _occ is not None
        else _bigram_occurrences(_bigram_staged(df, id_col, text_col), id_col)
    )
    # unseen bigram: smoothed mass 1 / (c1 + V); unseen context: 1 / V.
    # The seen path takes the model table's pre-quantized micro so the
    # self-trained case stays bit-identical to t25; the unseen path
    # quantizes the same way. c1 joins on its own (broadcastable
    # marginal) for the unseen-bigram-seen-context case.
    scored = (
        occ.join(lp.select("w1", "w2", "micro"), ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            F.col(id_col),
            F.coalesce(
                F.col("micro"),
                F.round(
                    F.log(
                        F.lit(1.0)
                        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                    )
                    * 1_000_000
                ).cast("long"),
            ).alias("micro"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (-F.sum("micro")).cast("long").alias("nll_micro"),
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce("nll_micro", F.lit(0).cast("long")).alias("nll_micro"),
        F.when(
            F.col("n_bigrams") > 0,
            F.expr("nll_micro div n_bigrams"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("avg_nll_micro"),
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    bigram model trained on the corpus itself — the CCNet-style
    perplexity signal (Wenzek et al., LREC 2020) one rung above t14's
    unigram: P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), summed over the
    document's bigram stream. Repetitive/templated text scores low NLL,
    gibberish high — both tails are what a quality filter cuts.
    Composition of ``bigram_lm_rows`` (train) + ``bigram_nll_with_lm``
    (score) on the same frame — value-identical to the pre-facet
    r10 single-pass form (the model rows cover every occurrence, so
    the scorer's left joins are effectively inner), re-oracled as t25.

    Returns (id_col, n_bigrams, nll_micro, avg_nll_micro) anchored on
    the INPUT ids (docs with < 2 tokens score 0)."""
    # ONE pinned occurrence stream feeds both the model aggregations
    # and the scoring join (the pre-facet r10 plan shape) — without
    # the sharing, train + score would tokenize and explode the
    # corpus twice
    staged = _bigram_staged(df, id_col, text_col)
    occ = pin(_bigram_occurrences(staged, id_col))
    lm = bigram_lm_rows(df, id_col, text_col, _staged=staged, _occ=occ)
    return bigram_nll_with_lm(df, lm, id_col, text_col, _occ=occ)


def moore_lewis_score(
    df: DataFrame,
    in_domain: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_lm_rows: DataFrame | None = None,
) -> DataFrame:
    """Moore-Lewis contrastive data selection (Moore & Lewis, ACL
    2010): score every document by the cross-entropy DIFFERENCE between
    an IN-DOMAIN bigram LM (trained on the rows where ``in_domain`` is
    true) and the full-corpus LM — ``ml_micro = avg_nll_in -
    avg_nll_out`` in integer micro-units, LOWER = more in-domain. The
    standard pretraining-mixture upgrade over a single-LM perplexity
    band (t25): one LM alone confuses "fluent" with "on-topic"; the
    difference cancels generic fluency and leaves domain affinity.

    Both LMs are add-one-smoothed bigram models in the t25/t26
    convention (per-type micro-quantized ln P, integer per-doc sums,
    so cross-engine summation order cannot flip a bit). The in-domain
    model scores OUT-of-domain docs through ``bigram_nll_with_lm``'s
    unseen-mass path — exactly what the smoothing is for.

    Scale shape: ONE tokenize + bigram explode feeds both models and
    both scoring passes (the ``_in`` flag rides the occurrence stream,
    so the in-domain occurrences are a filter, not a join); model rows
    are O(bigram types); scoring is two equi-joins on the natural
    bigram key. Nothing new shuffles beyond what t25 already pays
    twice over.

    ``out_lm_rows`` (optional) supplies the CONTRAST model as stored
    (kind, w1, w2, n) rows — e.g. the signature lake's lm/ facet
    (jobs/doc_signature_lake.py::read_corpus_lm) — instead of
    self-training it on ``df``: the textbook Moore-Lewis setup, where
    the out-of-domain side is the big general corpus the lake already
    summarized, so a 100 TB contrast model costs a facet read rather
    than a corpus re-scan. The in-domain LM always trains on the
    ``in_domain`` rows of ``df`` (the seed is the caller's batch by
    definition).

    Returns (id_col, n_bigrams, nll_in_micro, nll_out_micro, ml_micro)
    anchored on the INPUT ids (docs with < 2 tokens score 0).
    """
    staged = pin(
        df.select(
            F.col(id_col),
            tokens(F.col(text_col)).alias("_tk"),
            in_domain.cast("boolean").alias("_in"),
        )
    )
    # carry _in through the explode instead of re-joining it on: the
    # occurrence stream is corpus-sized and a join back to the doc
    # table would shuffle it once per flag
    tk = F.col("_tk")
    pairs = F.when(
        (F.size(tk) >= 2) & (F.element_at(tk, 1) != ""),
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"),
                F.element_at(tk, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    occ = pin(
        staged.select(F.col(id_col), F.col("_in"), F.explode(pairs).alias("bg"))
        .select(id_col, "_in", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    occ_plain = occ.drop("_in")
    lm_in = bigram_lm_rows(
        df,
        id_col,
        text_col,
        _staged=staged.filter(F.col("_in")),
        _occ=occ.filter(F.col("_in")),
    )
    lm_out = (
        out_lm_rows
        if out_lm_rows is not None
        else bigram_lm_rows(df, id_col, text_col, _staged=staged, _occ=occ_plain)
    )
    s_in = bigram_nll_with_lm(df, lm_in, id_col, text_col, _occ=occ_plain)
    s_out = bigram_nll_with_lm(df, lm_out, id_col, text_col, _occ=occ_plain)
    return (
        s_in.select(
            id_col,
            "n_bigrams",
            F.col("nll_micro").alias("nll_in_micro"),
            F.col("avg_nll_micro").alias("_avg_in"),
        )
        .join(
            s_out.select(
                id_col,
                F.col("nll_micro").alias("nll_out_micro"),
                F.col("avg_nll_micro").alias("_avg_out"),
            ),
            id_col,
        )
        .select(
            id_col,
            "n_bigrams",
            "nll_in_micro",
            "nll_out_micro",
            (F.col("_avg_in") - F.col("_avg_out")).cast("long").alias("ml_micro"),
        )
    )


def nb_train_rows(
    df: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multinomial Naive Bayes sufficient statistics as MERGEABLE
    (kind, label, tok, n) rows — the trained-classifier analogue of
    ``bigram_lm_rows``, shaped for the same lake-facet protocol
    (additive counts, distinct vocab):

    - ``kind='tok'``: token-occurrence counts n(tok, label) — SUM law.
    - ``kind='prior'``: document counts per label (tok NULL) — SUM law.
    - ``kind='vocab'``: one row per distinct seed token (label NULL,
      n=1) — DISTINCT law.

    This is the fastText-style quality/domain classifier slot of an
    LLM data pipeline (GPT-3's WebText quality filter, LLaMA's
    Wikipedia-reference classifier) reduced to its closed-form
    trainable core: Naive Bayes needs one counting pass, no SGD, and
    is therefore deterministic and oracle-checkable cross-engine.
    Row set is O(vocab x labels), never O(corpus)."""
    staged = df.select(
        F.col(label_col).alias("label"), tokens(F.col(text_col)).alias("_tk")
    )
    occ = staged.select(
        "label", F.explode(F.col("_tk")).alias("tok")
    ).filter(F.col("tok") != "")
    null_s = F.lit(None).cast("string")
    tok = (
        occ.groupBy("label", "tok")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("tok").alias("kind"), "label", "tok", "n")
    )
    prior = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("prior").alias("kind"), "label", null_s.alias("tok"), "n")
    )
    voc = (
        occ.select("tok")
        .distinct()
        .select(
            F.lit("vocab").alias("kind"),
            null_s.alias("label"),
            "tok",
            F.lit(1).cast("long").alias("n"),
        )
    )
    return tok.unionByName(prior).unionByName(voc)


def merge_nb_rows(rows: DataFrame) -> DataFrame:
    """Merge any union of per-batch ``nb_train_rows`` outputs back to
    ONE model in the same (kind, label, tok, n) shape: SUM per
    (label, token) and per prior label, DISTINCT vocab — the same
    additive/distinct laws as ``merge_lm_rows``, so the classifier
    drops into the signature lake's facet protocol unchanged (train
    per batch at ingest, reduce at compaction, serve from stored
    rows). Merging disjoint batches equals training on their union
    (property-tested); NOT idempotent on the count legs, so each
    batch's rows must enter exactly once."""
    null_s = F.lit(None).cast("string")
    tok = (
        rows.filter(F.col("kind") == "tok")
        .groupBy("label", "tok")
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.lit("tok").alias("kind"), "label", "tok", "n")
    )
    prior = (
        rows.filter(F.col("kind") == "prior")
        .groupBy("label")
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.lit("prior").alias("kind"), "label", null_s.alias("tok"), "n")
    )
    voc = (
        rows.filter(F.col("kind") == "vocab")
        .select("tok")
        .distinct()
        .select(
            F.lit("vocab").alias("kind"),
            null_s.alias("label"),
            "tok",
            F.lit(1).cast("long").alias("n"),
        )
    )
    return tok.unionByName(prior).unionByName(voc)


def nb_classify(
    df: DataFrame,
    model_rows: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score + argmax every document under a multinomial Naive Bayes
    model given as ``nb_train_rows`` output: score(d, c) =
    ln P(c) + sum_tok ln P(tok|c), with add-one smoothing P(tok|c) =
    (n(tok,c) + 1) / (total_c + V). Each (label, token) type's ln P
    quantizes to integer micro-units ONCE (the t14 convention) and
    documents sum integers; tokens unseen for a class fall to that
    class's smoothed floor 1 / (total_c + V). Prediction ties break on
    the lexicographically smallest label.

    Scale shape: the label table (priors, totals, unseen floors) is a
    <= |labels|-row broadcast; scoring fans each token occurrence out
    by |labels| (a constant), equi-joins the O(vocab x labels) model
    table on (label, tok), and reduces with one doc-keyed integer sum.
    The per-doc argmax is a bounded sort_array over |labels| structs —
    no window over the corpus.

    Returns (id_col, pred_label, n_tokens, score_micro, margin_micro):
    margin = best - runner-up (0 when the model has one label).
    Token-less docs score on priors alone."""
    tokc = model_rows.filter(F.col("kind") == "tok").select(
        "label", "tok", F.col("n").alias("c")
    )
    totals = tokc.groupBy("label").agg(F.sum("c").cast("long").alias("total"))
    vsize = (
        model_rows.filter(F.col("kind") == "vocab")
        .select("tok")
        .distinct()
        .agg(F.count("*").cast("long").alias("v"))
    )
    priors = model_rows.filter(F.col("kind") == "prior").select(
        "label", F.col("n").alias("n_docs")
    )
    n_seed = priors.agg(F.sum("n_docs").cast("long").alias("n_seed"))
    micro = lambda col: F.round(col * 1_000_000).cast("long")  # noqa: E731
    labels = (
        priors.join(totals, "label", "left")
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(n_seed))
        .select(
            "label",
            micro(
                F.log(F.col("n_docs") / F.col("n_seed"))
            ).alias("prior_micro"),
            micro(
                F.log(
                    F.lit(1.0)
                    / (F.coalesce(F.col("total"), F.lit(0)) + F.col("v"))
                )
            ).alias("floor_micro"),
            F.coalesce(F.col("total"), F.lit(0)).alias("total"),
        )
    )
    lp = (
        tokc.join(totals, "label")
        .crossJoin(F.broadcast(vsize))
        .select(
            "label",
            "tok",
            micro(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("total") + F.col("v")))
            ).alias("tok_micro"),
        )
    )
    occ = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
        .select(F.col(id_col), F.explode(F.col("_tk")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tok_sums = (
        occ.crossJoin(F.broadcast(labels.select("label", "floor_micro")))
        .join(lp, ["label", "tok"], "left")
        .groupBy(id_col, "label")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("tok_micro"), F.col("floor_micro")))
            .cast("long")
            .alias("tok_sum"),
        )
    )
    scored = (
        df.select(id_col)
        .crossJoin(F.broadcast(labels.select("label", "prior_micro")))
        .join(tok_sums, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            F.col("label"),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            (F.col("prior_micro") + F.coalesce("tok_sum", F.lit(0)))
            .cast("long")
            .alias("score"),
        )
    )
    # bounded argmax: |labels| structs per doc; (-score, label) sorts
    # best-score-first with ties to the smallest label
    ranked = scored.groupBy(id_col).agg(
        F.max("n_tokens").alias("n_tokens"),
        F.sort_array(
            F.collect_list(F.struct((-F.col("score")).alias("neg"), F.col("label")))
        ).alias("r"),
    )
    return ranked.select(
        id_col,
        F.col("r")[0]["label"].alias("pred_label"),
        "n_tokens",
        (-F.col("r")[0]["neg"]).cast("long").alias("score_micro"),
        F.when(
            F.size("r") > 1, (F.col("r")[1]["neg"] - F.col("r")[0]["neg"])
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("margin_micro"),
    )


def nb_domain_classifier(
    df: DataFrame,
    seed_filter: Column,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train-on-seed, score-everything composition of ``nb_train_rows``
    + ``nb_classify``: the one-pass closed-form stand-in for the
    fastText quality/domain classifier step of a pretraining pipeline
    — label a small seed (here: rows matching ``seed_filter``), train,
    then classify the full corpus including the unlabeled remainder."""
    return nb_classify(
        df, nb_train_rows(df.filter(seed_filter), label_col, id_col, text_col),
        id_col, text_col,
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023). Moore-Lewis (t28) with the two LMs replaced by HASHED n-gram
# bag-of-features models: every bigram maps to one of a FIXED number of
# buckets, so the model is O(n_buckets) rows whatever the vocabulary —
# the property that lets the target/raw ratio table broadcast at 100 TB
# where an open-vocab type table could not. Selection then RESAMPLES
# without replacement proportional to the importance weight
# (gumbel_topk_sample) instead of thresholding, which provably matches
# the target feature distribution in expectation — the paper's point.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 10_000


def hashed_bigram_bucket(
    w1: Column, w2: Column, n_buckets: int = DSIR_BUCKETS
) -> Column:
    """Engine-portable hashed feature id of a token bigram: the first
    15 hex chars of md5('w1 w2') (60 bits, non-negative) mod
    ``n_buckets`` — the cms md5 convention, so ANSI SQL reproduces
    every bucket id bit-for-bit."""
    h = F.conv(
        F.substring(F.md5(F.concat(w1, F.lit(" "), w2)), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(n_buckets)


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_id_col: str | None = None,
    target_text_col: str | None = None,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight: log p_target(x) -
    log p_raw(x) under add-one-smoothed multinomial models over HASHED
    bigram features (``n_buckets`` buckets). ``target`` is the corpus
    whose distribution selection should match (Wikipedia-shaped text in
    the paper); the RAW distribution is ``df`` itself — the corpus
    being selected from, exactly the paper's estimator.

    Determinism: the per-BUCKET log ratio quantizes to integer
    micro-units once (the t28 per-type rule), per-doc weights are
    integer sums of those, so cross-engine float summation order
    cannot flip a bit and a SQL oracle reproduces every weight.

    Scale shape: one tokenize + bigram explode per corpus; counts
    collapse map-side to <= n_buckets partial rows per task; the ratio
    model is a <= n_buckets-row table that BROADCASTS to the scoring
    join (no shuffle of the occurrence stream); scoring is one
    per-doc sum. Docs with < 2 tokens have no features and score 0 —
    anchored on the input ids. An empty ``target`` degenerates to the
    uniform model (every bucket count 0); callers that consider that a
    bug (curate does) must validate before calling.

    Returns (id_col, n_bigrams, logw_micro) — HIGHER = more
    target-like. Feed to gumbel_topk_sample for the resampling step.
    """
    tid = target_id_col or id_col
    ttext = target_text_col or text_col
    occ = pin(
        _bigram_occurrences(_bigram_staged(df, id_col, text_col), id_col)
        .withColumn(
            "b", hashed_bigram_bucket(F.col("w1"), F.col("w2"), n_buckets)
        )
        .select(id_col, "b")
    )
    occ_t = (
        _bigram_occurrences(_bigram_staged(target, tid, ttext), tid)
        .select(
            hashed_bigram_bucket(F.col("w1"), F.col("w2"), n_buckets).alias(
                "b"
            )
        )
    )
    cnt_r = occ.groupBy("b").agg(F.count("*").cast("long").alias("cr"))
    cnt_t = occ_t.groupBy("b").agg(F.count("*").cast("long").alias("ct"))
    tot_r = occ.agg(F.count("*").cast("long").alias("tr"))
    tot_t = occ_t.agg(F.count("*").cast("long").alias("tt"))
    model = (
        cnt_r.join(cnt_t, "b", "full_outer")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(n_buckets)))
                    )
                    - F.log(
                        (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tr") + F.lit(float(n_buckets)))
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lam_micro"),
        )
    )
    per_doc = (
        occ.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lam_micro").cast("long").alias("logw_micro"),
        )
    )
    return (
        df.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("logw_micro"), F.lit(0)).alias("logw_micro"),
        )
    )
