"""Data-selection operators added in round 11: Moore-Lewis contrastive
scoring (t28), the trained Naive-Bayes domain classifier (t29), and
SemDeDup-style semantic corpus pruning (s23). The oracle-parity sweep
checks their cataloged projections against DuckDB; these tests pin the
SEMANTIC contracts — planted in-domain docs score lower, planted labels
are recovered, duplicates drop with the right witness — that a
hash-match alone cannot distinguish from a consistently-wrong pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pokemon_showdown_airflow_etl_spark.operators.similarity import semantic_dedup
from pokemon_showdown_airflow_etl_spark.operators.text import (
    merge_nb_rows,
    moore_lewis_score,
    nb_classify,
    nb_domain_classifier,
    nb_train_rows,
)

PHYSICS = [
    "the electron orbits the nucleus and the photon carries energy",
    "quantum energy levels of the electron are discrete states",
    "the photon momentum transfers energy to the electron",
    "nuclear decay emits a photon and changes the nucleus energy",
]
RECIPES = [
    "whisk the eggs with butter and fold in the flour gently",
    "simmer the onions in butter then add flour to thicken",
    "bake the dough until golden and brush with melted butter",
    "knead the flour and water then rest the dough an hour",
]


def _docs(spark, texts_by_lang):
    rows = []
    i = 0
    for lang, texts in texts_by_lang.items():
        for txt in texts:
            rows.append((i, txt, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_moore_lewis_degenerates_to_zero_when_everything_is_in_domain(spark):
    """in_domain == everything -> the two LMs are the same model, so
    nll_in == nll_out and every ml_micro is exactly 0 (the scorer's
    left joins degenerate to the self-trained inner-join path)."""
    df = _docs(spark, {"en": PHYSICS + RECIPES})
    out = moore_lewis_score(df, F.lit(True), "doc_id", "text").collect()
    assert len(out) == 8
    for r in out:
        assert r.ml_micro == 0
        assert r.nll_in_micro == r.nll_out_micro


def test_moore_lewis_ranks_in_domain_docs_lower(spark):
    """Planted two-topic corpus: with physics as the in-domain seed,
    every physics doc's contrastive score sits below every recipe
    doc's (the Moore-Lewis selection property)."""
    df = _docs(spark, {"phys": PHYSICS, "food": RECIPES})
    out = moore_lewis_score(
        df, F.col("lang") == "phys", "doc_id", "text"
    ).collect()
    phys = [r.ml_micro for r in out if r.doc_id < len(PHYSICS)]
    food = [r.ml_micro for r in out if r.doc_id >= len(PHYSICS)]
    assert max(phys) < min(food)


def test_moore_lewis_anchors_short_docs_at_zero(spark):
    df = _docs(spark, {"en": ["single", ""]})
    out = {r.doc_id: r for r in moore_lewis_score(df, F.lit(True)).collect()}
    assert out[0].n_bigrams == 0 and out[0].ml_micro == 0
    assert out[1].n_bigrams == 0 and out[1].ml_micro == 0


def test_nb_classifier_recovers_planted_labels_on_held_out_docs(spark):
    """Disjoint vocabularies per class; train on even ids only; every
    doc — including the held-out odd ids — classifies to its true
    label with positive margin."""
    df = _docs(spark, {"phys": PHYSICS, "food": RECIPES})
    out = nb_domain_classifier(
        df, F.col("doc_id") % 2 == 0, "lang", "doc_id", "text"
    ).collect()
    truth = {r.doc_id: r.lang for r in df.collect()}
    assert len(out) == 8
    for r in out:
        assert r.pred_label == truth[r.doc_id], r
        assert r.margin_micro > 0


def test_nb_tokenless_doc_scores_on_priors_and_ties_to_smallest_label(spark):
    """Empty text -> prior-only score; equal class priors -> exact tie
    -> the lexicographically smallest label wins with margin 0."""
    df = _docs(spark, {"b_lang": ["beta beta beta"], "a_lang": ["alpha alpha"]})
    df = df.unionByName(
        spark.createDataFrame(
            [(99, "", "zz")], "doc_id long, text string, lang string"
        )
    )
    out = {
        r.doc_id: r
        for r in nb_classify(
            df.filter(F.col("doc_id") == 99),
            nb_train_rows(df.filter(F.col("doc_id") != 99), "lang"),
        ).collect()
    }
    r = out[99]
    assert r.n_tokens == 0
    assert r.pred_label == "a_lang"
    assert r.margin_micro == 0


def test_nb_rows_merge_law_equals_retraining_on_the_union(spark):
    """Train per disjoint batch, merge by the SUM/DISTINCT laws ->
    bit-identical rows to training once on the union (the facet
    protocol's precondition, as for merge_lm_rows)."""
    df = _docs(spark, {"phys": PHYSICS, "food": RECIPES})
    b1 = nb_train_rows(df.filter(F.col("doc_id") % 2 == 0), "lang")
    b2 = nb_train_rows(df.filter(F.col("doc_id") % 2 == 1), "lang")
    merged = {tuple(r) for r in merge_nb_rows(b1.unionByName(b2)).collect()}
    scratch = {tuple(r) for r in nb_train_rows(df, "lang").collect()}
    assert merged == scratch


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


def test_semantic_dedup_drops_duplicates_with_min_id_witness(spark):
    """Three copies of one direction + two orthogonal singletons: the
    smallest copy id survives, later copies report it (the SMALLEST
    same-cell neighbor, not just any) as witness with cosine 1."""
    base = [1.0, 0.0, 0.0, 0.0]
    vecs = [
        (1, base),
        (5, [2.0, 0.0, 0.0, 0.0]),  # same direction, scaled
        (9, base),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _emb(spark, vecs), threshold=0.99, n_bits=0
        ).collect()
    }
    assert out[1].kept and out[2].kept and out[3].kept
    for vid in (5, 9):
        assert not out[vid].kept
        assert out[vid].witness_id == 1
        assert out[vid].witness_cos == 1.0


def test_semantic_dedup_bucketed_agrees_with_exact_on_identical_vectors(spark):
    """Identical vectors always share every SRP bucket, so the n_bits>0
    scale path must reach the same verdicts as the exact path when the
    only near-dups are exact duplicates."""
    vecs = [(i, [float(i % 7 + 1), float((i * 3) % 5), 1.0, 0.5]) for i in range(12)]
    vecs += [(100 + i, v) for i, (_, v) in enumerate(vecs[:4])]  # dup the first 4
    exact = {
        (r.vec_id, r.kept, r.witness_id)
        for r in semantic_dedup(_emb(spark, vecs), 0.999999, n_bits=0).collect()
    }
    bucketed = {
        (r.vec_id, r.kept, r.witness_id)
        for r in semantic_dedup(_emb(spark, vecs), 0.999999, n_bits=4).collect()
    }
    assert exact == bucketed
    assert sum(1 for _, kept, _ in exact if not kept) == 4


def test_semantic_dedup_verdicts_are_internally_consistent(spark, sf_dir):
    """On the real testdata: every dropped row carries a smaller-id
    witness at/above threshold; every kept row carries none; ids are
    preserved exactly."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.3, n_bits=4).collect()
    assert sorted(r.vec_id for r in out) == sorted(
        r.vec_id for r in emb.select("vec_id").collect()
    )
    for r in out:
        if r.kept:
            assert r.witness_id is None and r.witness_cos is None
        else:
            assert r.witness_id is not None and r.witness_id < r.vec_id
            assert r.witness_cos >= 0.3


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from pokemon_showdown_airflow_etl_spark.operators.text import dsir_weights

    docs = _docs(spark, {"phy": PHYSICS, "rec": RECIPES})
    target = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(PHYSICS)],
        "doc_id long, text string",
    )
    w = dsir_weights(docs, target).join(docs.select("doc_id", "lang"), "doc_id")
    rows = {r["doc_id"]: r for r in w.collect()}
    phy = [r["logw_micro"] for r in rows.values() if r["lang"] == "phy"]
    rec = [r["logw_micro"] for r in rows.values() if r["lang"] == "rec"]
    # every physics doc is more target-like than every recipe doc
    assert min(phy) > max(rec)
    # deterministic: a second run reproduces every weight
    again = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_weights(docs, target).collect()
    }
    assert again == {k: r["logw_micro"] for k, r in rows.items()}


def test_dsir_anchors_short_docs_at_zero(spark):
    from pokemon_showdown_airflow_etl_spark.operators.text import dsir_weights

    docs = spark.createDataFrame(
        [(0, "word"), (1, None), (2, "the electron carries energy")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, PHYSICS[0])], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    assert set(rows) == {0, 1, 2}
    for i in (0, 1):
        assert rows[i]["n_bigrams"] == 0 and rows[i]["logw_micro"] == 0
    assert rows[2]["n_bigrams"] == 3


def test_gumbel_topk_matches_python_race(spark):
    import hashlib
    import math

    from pokemon_showdown_airflow_etl_spark.operators.sampling import (
        gumbel_topk_sample,
    )

    rows = [(i, (i % 7) * 2_000_000 - 5_000_000) for i in range(50)] + [
        (99, None)
    ]
    df = spark.createDataFrame(rows, "doc_id long, logw_micro long")

    def key(i, lw):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float((1 << 60) + 1)
        return lw + round(-math.log(-math.log(u)) * 1_000_000)

    expect = sorted(
        ((key(i, lw), i) for i, lw in rows if lw is not None),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = gumbel_topk_sample(df, "doc_id", "logw_micro", k=10).collect()
    assert [(r["key_micro"], r["doc_id"]) for r in got] == expect
    assert [r["rank"] for r in got] == list(range(1, 11))
    # the null-weight row can never race
    assert 99 not in {r["doc_id"] for r in got}
