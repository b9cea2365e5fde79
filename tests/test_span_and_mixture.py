"""Repeated-span dedup (operators/dedup.py::span_dedup — catalog t20)
and temperature-weighted domain mixture (operators/sampling.py::
temperature_mixture — catalog t21): planted-structure checks plus exact
Python-model comparisons of both the selection and the reassembly."""

from __future__ import annotations

import hashlib
import math

from pokemon_showdown_airflow_etl_spark.operators.dedup import span_dedup
from pokemon_showdown_airflow_etl_spark.operators.sampling import (
    temperature_mixture,
)

BOILER = "one two three four five six seven eight nine ten"  # exactly 10 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return {
        r["doc_id"]: (r["n_spans"], r["n_dropped"], r["clean_text"])
        for r in df.collect()
    }


def test_span_dedup_drops_repeated_window_everywhere(spark):
    a_tail = "alpha " * 10
    b_tail = "bravo " * 10
    rows = [
        (0, BOILER + " " + a_tail.strip()),
        (1, BOILER + " " + b_tail.strip()),
        (2, "charlie " * 10),  # untouched
    ]
    got = _collect(span_dedup(_docs(spark, rows), "doc_id", "text", span_tokens=10))
    # the shared leading window is dropped from BOTH docs (no keeper),
    # the distinct tails survive in order
    assert got[0] == (2, 1, a_tail.strip())
    assert got[1] == (2, 1, b_tail.strip())
    assert got[2] == (1, 0, ("charlie " * 10).strip())


def test_span_dedup_full_drop_and_threshold(spark):
    rows = [(0, BOILER), (1, BOILER), (2, BOILER)]
    got = _collect(span_dedup(_docs(spark, rows), "doc_id", "text", span_tokens=10))
    assert got == {i: (1, 1, "") for i in range(3)}
    # raising the floor above the occurrence count keeps everything
    got3 = _collect(
        span_dedup(
            _docs(spark, rows), "doc_id", "text", span_tokens=10, max_occurrences=3
        )
    )
    assert got3 == {i: (1, 0, BOILER) for i in range(3)}


def test_span_dedup_separator_mode_normalized_hash(spark):
    """Paragraph units: split on a literal separator, hash on the
    NORMALIZED text (case/whitespace variants of the boilerplate
    collide), rejoin with the same separator preserving the raw
    survivors."""
    rows = [
        (0, "Subscribe To Our\tNewsletter\n\nreal content here"),
        (1, "subscribe to our newsletter\n\ndifferent real content"),
        (2, "just original text"),
    ]
    got = _collect(
        span_dedup(_docs(spark, rows), "doc_id", "text", separator="\n\n")
    )
    assert got[0] == (2, 1, "real content here")
    assert got[1] == (2, 1, "different real content")
    assert got[2] == (1, 0, "just original text")


def test_span_dedup_matches_python_model(spark):
    """Seeded random word docs vs a direct Python model of the whole
    semantic (chunking, corpus-wide counting, drop, reassembly)."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 23))))
        for i in range(30)
    ]
    w, k = 4, 1

    spans = {}  # doc -> [unit]
    for i, text in rows:
        tk = text.split(" ")
        spans[i] = [
            " ".join(tk[j : j + w]) for j in range(0, len(tk), w)
        ]
    from collections import Counter

    counts = Counter(u for us in spans.values() for u in us)
    want = {}
    for i, _ in rows:
        kept = [u for u in spans[i] if counts[u] <= k]
        want[i] = (len(spans[i]), len(spans[i]) - len(kept), " ".join(kept))

    got = _collect(
        span_dedup(
            _docs(spark, rows), "doc_id", "text", span_tokens=w, max_occurrences=k
        )
    )
    assert got == want
    assert any(v[1] > 0 for v in want.values()), "fixture dropped nothing — vacuous"


# ---------------------------------------------------------------------------
# temperature_mixture
# ---------------------------------------------------------------------------


def _mix_rows(spark, sizes):
    rows = []
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def _model(sizes, alpha, num, den):
    micro = {d: round(n**alpha * 1_000_000) for d, n in sizes.items()}
    tot = sum(micro.values())
    budget = (sum(sizes.values()) * num) // den
    return {d: min(sizes[d], (micro[d] * budget) // tot) for d in sizes}


def test_mixture_targets_match_integer_model(spark):
    sizes = {"big": 120, "mid": 40, "small": 8}
    df = _mix_rows(spark, sizes)
    got = temperature_mixture(df, "doc_id", "source", alpha=0.7).collect()
    targets = {r["source"]: r["mix_target"] for r in got}
    assert targets == {
        d: t for d, t in _model(sizes, 0.7, 3, 5).items() if t > 0
    }
    per_dom = {d: sum(1 for r in got if r["source"] == d) for d in targets}
    assert per_dom == targets  # exactly target rows kept per domain
    # temperature boosts the small domain beyond its natural share
    nat = _model(sizes, 1.0, 3, 5)
    assert targets["small"] > nat["small"]


def test_mixture_alpha_one_is_proportional_and_capped(spark):
    sizes = {"a": 50, "b": 10, "c": 2}
    targets = {
        r["source"]: r["mix_target"]
        for r in temperature_mixture(
            _mix_rows(spark, sizes), "doc_id", "source", alpha=1.0
        ).collect()
    }
    model = _model(sizes, 1.0, 3, 5)
    assert targets == {d: t for d, t in model.items() if t > 0}
    assert all(targets[d] <= sizes[d] for d in targets)
    # tiny-domain cap bites at alpha -> 0 (uniform targets exceed n_c)
    t0 = {
        r["source"]: r["mix_target"]
        for r in temperature_mixture(
            _mix_rows(spark, sizes), "doc_id", "source", alpha=0.0
        ).collect()
    }
    assert t0["c"] == 2  # capped at the domain size


def test_mixture_selection_is_hash_ranked_and_monotone(spark):
    sizes = {"a": 30, "b": 12}
    df = _mix_rows(spark, sizes)

    def kept(num, den):
        return {
            r["doc_id"]
            for r in temperature_mixture(
                df, "doc_id", "source", alpha=0.7, budget_num=num, budget_den=den
            ).collect()
        }

    # exact selection model: per domain, ids ordered by (md5(str(id)), id)
    rows = df.collect()
    by_dom: dict[str, list[int]] = {}
    for r in rows:
        by_dom.setdefault(r["source"], []).append(r["doc_id"])
    targets = _model(sizes, 0.7, 3, 5)
    want = set()
    for d, ids in by_dom.items():
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want.update(order[: targets[d]])
    assert kept(3, 5) == want
    # monotone: a bigger budget only ADDS documents
    assert kept(2, 5) <= kept(3, 5) <= kept(4, 5)


def test_span_dedup_null_text_doc_keeps_its_row(spark):
    """The contract is one output row per input document: a null-text
    doc has no spans, but it must not vanish from the output (curate
    joins on doc_id — a missing row would silently delete the doc
    without any stage stat attributing the loss)."""
    rows = [(0, BOILER), (1, None), (2, "")]
    got = _collect(span_dedup(_docs(spark, rows), "doc_id", "text", span_tokens=10))
    assert set(got) == {0, 1, 2}
    assert got[1] == (0, 0, "")
    # empty string is one empty unit, not zero units (split semantics)
    assert got[2][0] == 1
    # separator mode too
    got_sep = _collect(
        span_dedup(_docs(spark, rows), "doc_id", "text", separator="\n\n")
    )
    assert got_sep[1] == (0, 0, "")


def test_mixture_exact_budget_largest_remainder(spark):
    """exact_budget=True (t22): uncapped domains ranked by remainder
    descending absorb the floor leftovers one each — the kept total
    hits the budget exactly unless caps eat it, and never oversamples."""
    sizes = {"a": 120, "b": 40, "c": 8}
    df = _mix_rows(spark, sizes)
    budget = (sum(sizes.values()) * 3) // 5  # 100

    floor_t = _model(sizes, 0.7, 3, 5)  # {'a': 61, 'b': 28, 'c': 8}
    got = temperature_mixture(
        df, "doc_id", "source", alpha=0.7, exact_budget=True
    ).collect()
    tgt = {r["source"]: r["mix_target"] for r in got}
    # the two uncapped domains each took one leftover; the third
    # leftover had only the capped domain left -> stays unplaced
    assert tgt == {"a": floor_t["a"] + 1, "b": floor_t["b"] + 1, "c": 8}
    assert sum(tgt.values()) == budget - 1  # cap-induced shortfall only
    per_dom = {d: sum(1 for r in got if r["source"] == d) for d in tgt}
    assert per_dom == tgt

    # no caps in play -> the budget is hit EXACTLY
    sizes2 = {"x": 90, "y": 60, "z": 33}
    got2 = temperature_mixture(
        _mix_rows(spark, sizes2), "doc_id", "source", alpha=0.7,
        exact_budget=True,
    ).collect()
    budget2 = (sum(sizes2.values()) * 3) // 5
    assert sum(1 for _ in got2) == budget2
    # and the exact-budget kept set is a superset of the floor one
    base_ids = {
        r["doc_id"]
        for r in temperature_mixture(
            _mix_rows(spark, sizes2), "doc_id", "source", alpha=0.7
        ).collect()
    }
    assert base_ids <= {r["doc_id"] for r in got2}


def test_weighted_sample_matches_python_model_and_guards(spark):
    """t30 (Efraimidis-Spirakis): the Spark selection equals a pure-
    Python replica of the exponential race (md5-uniform, ln(u)/w in
    micro-units, id tie-break); deterministic under re-run; rows with
    null/zero/negative weight are excluded; heavier rows win more."""
    import hashlib as _h
    import math as _m

    from pokemon_showdown_airflow_etl_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, (i % 7) + 1) for i in range(200)] + [
        (900, None),
        (901, 0),
        (902, -5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def key_micro(i, w):
        h = int(_h.md5(str(i).encode()).hexdigest()[:15], 16)
        u = (float(h) + 1.0) / float((1 << 60) + 1)
        return round(_m.log(u) / float(w) * 1_000_000)

    model = sorted(
        ((key_micro(i, w), i, w) for i, w in rows if w and w > 0),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    expect = [
        (i, w, k, r + 1) for r, (k, i, w) in enumerate(model)
    ]
    got = [
        (r["doc_id"], r["weight"], r["key_micro"], r["rank"])
        for r in weighted_sample(df, "doc_id", "w", k=20).collect()
    ]
    assert got == expect
    assert all(i < 900 for i, *_ in got)  # unweighable rows excluded
    # rerun -> identical (no RNG anywhere)
    got2 = [
        (r["doc_id"], r["weight"], r["key_micro"], r["rank"])
        for r in weighted_sample(df, "doc_id", "w", k=20).collect()
    ]
    assert got2 == got
    # weight monotonicity in aggregate: the top-20 of a 1..7-weighted
    # population should lean heavy (mean weight above the uniform 4)
    assert sum(w for _, w, *_ in got) / len(got) > 4.0


def test_leakage_safe_split_confines_clusters_to_one_split(spark):
    """t32: every member of a near-dup cluster gets the cluster's
    split; unclustered docs key on themselves and match the plain
    hash_split assignment."""
    from pokemon_showdown_airflow_etl_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    base_a = " ".join(f"atok{i}" for i in range(40))
    base_b = " ".join(f"btok{i}" for i in range(40))
    rows = (
        [(i, base_a + f" tail{i}") for i in range(4)]           # cluster A
        + [(10 + i, base_b + f" end{i}") for i in range(3)]     # cluster B
        + [(100 + i, " ".join(f"u{i}w{j}" for j in range(30))) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in leakage_safe_split(df, "doc_id", "text").collect()
    }
    assert len(got) == len(rows)
    # cluster members share the min-id key and hence the split
    assert {got[i] for i in range(4)} == {got[0]} and got[0][0] == 0
    assert {got[10 + i] for i in range(3)} == {got[10]} and got[10][0] == 10
    # unclustered docs: identical to the doc-keyed split
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id").collect()
    }
    for i in range(100, 106):
        assert got[i] == (i, plain[i])
