"""Property-based tests (hypothesis) for the semantics that are easy to
get subtly wrong: MERGE upsert/patch against a dict-model oracle, and
the discovery pagination stop conditions against a naive driver-side
model of the reference's loop (discovery.py:82-110)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pokemon_showdown_airflow_etl_spark.schemas import PAGE_SIZE

# ---------------------------------------------------------------------------
# upsert: last-writer-wins keyed merge == dict.update
# ---------------------------------------------------------------------------

key_st = st.integers(min_value=0, max_value=14)
rows_st = st.lists(
    st.tuples(key_st, st.integers(min_value=-100, max_value=100)), max_size=15
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(current=rows_st, updates=rows_st)
def test_upsert_matches_dict_model(spark_prop, current, updates):
    from pokemon_showdown_airflow_etl_spark.operators.merge import upsert

    # model: dict insert-or-replace keyed on k (db.py:230-236); both legs
    # key-dedup their input via dict() so the model and the DataFrames
    # see identical rows
    cur_rows, upd_rows = dict(current), dict(updates)
    cur_df = spark_prop.createDataFrame(
        list(cur_rows.items()) or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")
    upd_df = spark_prop.createDataFrame(
        list(upd_rows.items()) or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")

    got = {r["k"]: r["v"] for r in upsert(cur_df, upd_df, ["k"]).collect()}
    want = dict(cur_rows)
    want.update(upd_rows)
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    current=st.dictionaries(key_st, st.integers(-50, 50), max_size=10),
    patch=st.dictionaries(key_st, st.one_of(st.none(), st.integers(-50, 50)), max_size=10),
)
def test_merge_patch_only_touches_matched_nonnull(spark_prop, current, patch):
    """merge_patch must: leave unmatched rows alone, overwrite matched
    rows' patched column only when the patch value is non-NULL (the
    coalesce semantics stage-flag updates rely on), and never add rows."""
    from pokemon_showdown_airflow_etl_spark.operators.merge import merge_patch

    cur_df = spark_prop.createDataFrame(
        [(k, v) for k, v in current.items()] or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")
    patch_df = spark_prop.createDataFrame(
        [(k, v) for k, v in patch.items()] or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")

    got = {r["k"]: r["v"] for r in merge_patch(cur_df, patch_df, ["k"]).collect()}
    want = {
        k: (patch[k] if k in patch and patch[k] is not None else v)
        for k, v in current.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# discovery stop conditions vs a naive model
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=0, max_value=180),
    watermark_idx=st.one_of(st.none(), st.integers(min_value=0, max_value=179)),
    max_pages=st.integers(min_value=1, max_value=5),
)
def test_discovery_collects_exactly_rows_above_watermark(n, watermark_idx, max_pages):
    """The paging loop must collect exactly the rows newer than the
    watermark, in <= max_pages pages, stopping at the first stale row
    (discovery.py:91-100) or a short page (:108-110)."""
    from pokemon_showdown_airflow_etl_spark.sources.api import ReplayApiClient
    from pokemon_showdown_airflow_etl_spark.sources.fake import (
        FakeShowdownTransport,
        make_replays,
    )

    corpus = make_replays("f", n)
    watermark = (
        corpus[watermark_idx]["uploadtime"]
        if watermark_idx is not None and watermark_idx < n
        else None
    )
    client = ReplayApiClient(
        transport=FakeShowdownTransport({"f": corpus}), sleeper=lambda s: None
    )

    # driver-side loop exactly as jobs.pipeline.discover runs it
    collected, before_ts, pages, done = [], None, 0, False
    while pages < max_pages and not done:
        page = client.fetch_page("f", before_ts)
        pages += 1
        if not page:
            break
        for row in page:
            if watermark is not None and row["uploadtime"] <= watermark:
                done = True
                break
            collected.append(row)
        if len(page) < PAGE_SIZE:
            done = True
        before_ts = page[-1]["uploadtime"]

    # model: newest rows first, strictly above watermark, capped by the
    # page budget (a stale row inside a page caps that page early)
    newest_first = sorted(corpus, key=lambda r: r["uploadtime"], reverse=True)
    want = [r for r in newest_first if watermark is None or r["uploadtime"] > watermark]
    want = want[: max_pages * PAGE_SIZE]
    assert [r["id"] for r in collected] == [r["id"] for r in want]
    assert pages <= max_pages


# ---------------------------------------------------------------------------
# log-parse fast paths == naive formulations on adversarial logs
# ---------------------------------------------------------------------------

# Lines deliberately include the edge shapes the optimized paths argue
# about: bare "|t:" (no arg), "|t:extra|x" (prefix collision candidate),
# empty lines, commands embedding the target as a prefix, and stray text.
_line_st = st.one_of(
    st.just("|t:"),
    st.just("|t:|123"),
    st.just("|t:|999999999999"),
    st.just("|t:extra|5"),
    st.just("|win|alice"),
    st.just("|win"),
    st.just("|winner|bob"),
    st.just("|move|p1a: Mon|Tackle"),
    st.just("|start"),
    st.just(""),
    st.just("plain text no pipes"),
    st.text(alphabet="abt:|w3", min_size=0, max_size=8),
)
_log_st = st.lists(_line_st, min_size=0, max_size=12).map("\n".join)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(logs=st.lists(_log_st, min_size=1, max_size=5))
def test_logparse_fast_paths_match_naive(spark_prop, logs):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.functions.logparse import (
        battle_events,
        command_lines,
        explode_log_lines,
        parse_protocol_lines,
    )

    docs = spark_prop.createDataFrame(
        [(f"r{i}", log) for i, log in enumerate(logs)], "id string, log string"
    )
    exploded = explode_log_lines(docs).withColumn("_line", F.col("line"))
    parsed_keep = parse_protocol_lines(exploded)  # _line passes through
    parsed = parsed_keep.drop("_line")

    # command_lines == parse-everything-then-filter, for each command.
    # Domain note: Showdown protocol lines START with '|' (the
    # documented precondition of parse_protocol_lines). On garbage
    # lines like "3|t:|" the two paths diverge BY DESIGN — the prefix
    # guard drops them while the naive split field-shifts them into a
    # command — so the naive model restricts to proper lines; the
    # strategy still generates the garbage to prove fast never keeps
    # what the protocol domain excludes (the subset assert).
    for cmd in ("win", "t:", "move"):
        fast = {tuple(map(str, r)) for r in command_lines(docs, cmd).collect()}
        naive = {
            tuple(map(str, r))
            for r in parsed.filter(F.col("command") == cmd).collect()
        }
        # the prefix guard may only drop no-arg lines (e.g. a bare
        # "|win", no payload) and non-protocol garbage
        assert fast <= naive
        naive_with_args = {
            tuple(map(str, r))
            for r in parsed_keep.filter(
                (F.col("command") == cmd)
                & (F.size("args") >= 1)
                & F.col("_line").startswith("|")
            )
            .drop("_line")
            .collect()
        }
        assert fast == naive_with_args

    # battle_events' guarded stamp == the naive args-derived stamp
    w = (
        Window.partitionBy("replay_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts = F.when(
        F.col("command") == "t:", F.try_element_at("args", F.lit(1)).try_cast("long")
    )
    naive_ev = parsed.withColumn("event_ts", F.last(ts, ignorenulls=True).over(w))
    a = {tuple(map(str, r)) for r in battle_events(docs).collect()}
    b = {tuple(map(str, r)) for r in naive_ev.select(*battle_events(docs).columns).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# as-of join: union+window merge-asof == pandas.merge_asof
# ---------------------------------------------------------------------------

asof_key_st = st.integers(min_value=0, max_value=3)
asof_time_st = st.integers(min_value=0, max_value=20)
asof_left_st = st.lists(
    st.tuples(asof_key_st, asof_time_st), min_size=1, max_size=12
)
asof_right_st = st.lists(
    st.tuples(asof_key_st, asof_time_st, st.integers(min_value=-50, max_value=50)),
    max_size=12,
)
# the as-of tests additionally draw NULL carry values: a matched right
# row whose value is NULL must yield NULL (merge_asof semantics), not
# an older non-null value — the boxed-struct carry in operators.temporal
# exists exactly for this case (ADVICE r3, medium).
asof_right_nullable_st = st.lists(
    st.tuples(
        asof_key_st,
        asof_time_st,
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left_st, right=asof_right_nullable_st, strict=st.booleans())
def test_asof_join_matches_pandas_merge_asof(spark_prop, left, right, strict):
    """operators.temporal.asof_join vs the reference semantics of
    pandas.merge_asof (direction=backward; allow_exact_matches is the
    inverse of strict). The right side is deduped to one row per
    (key, time) — the operator's documented precondition for
    deterministic tie handling."""
    import pandas as pd

    from pokemon_showdown_airflow_etl_spark.operators.temporal import asof_join

    right_u = {(k, t): v for k, t, v in right}
    ldf = spark_prop.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, row_id long"
    )
    rdf = spark_prop.createDataFrame(
        [(k, t, v) for (k, t), v in right_u.items()] or [(None, None, None)],
        "k long, ts long, v long",
    ).filter("k IS NOT NULL")
    got = {
        r["row_id"]: r["vv"]
        for r in asof_join(ldf, rdf, on="k", carry={"v": "vv"}, strict=strict).collect()
    }

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "ts", "row_id"]
    ).sort_values("ts", kind="stable")
    if not right_u:
        want = {int(i): None for i in lpd["row_id"]}
    else:
        rpd = pd.DataFrame(
            [(k, t, v) for (k, t), v in right_u.items()], columns=["k", "ts", "v"]
        ).sort_values("ts", kind="stable")
        m = pd.merge_asof(
            lpd, rpd, on="ts", by="k",
            direction="backward", allow_exact_matches=not strict,
        )
        want = {
            int(r.row_id): (None if pd.isna(r.v) else int(r.v))
            for r in m.itertuples()
        }
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left_st, right=asof_right_nullable_st, strict=st.booleans())
def test_asof_join_sliced_equals_plain(spark_prop, left, right, strict):
    """The partition-bounded sliced as-of must be value-identical to the
    plain merge-asof for every random configuration — times span several
    7-second slices, so within-slice carry, the strict slice-level
    carry-in, and their coalesce are all exercised."""
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.operators.temporal import (
        asof_join,
        asof_join_sliced,
    )

    right_u = {(k, t): v for k, t, v in right}
    ldf = spark_prop.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, row_id long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "row_id")
    rdf = (
        spark_prop.createDataFrame(
            [(k, t, v) for (k, t), v in right_u.items()] or [(None, None, None)],
            "k long, t long, v long",
        )
        .filter("k IS NOT NULL")
        .select("k", F.timestamp_seconds("t").alias("ts"), "v")
    )
    plain = {
        r["row_id"]: r["vv"]
        for r in asof_join(ldf, rdf, on="k", carry={"v": "vv"}, strict=strict).collect()
    }
    sliced = {
        r["row_id"]: r["vv"]
        for r in asof_join_sliced(
            ldf, rdf, on="k", slice_seconds=7, carry={"v": "vv"}, strict=strict
        ).collect()
    }
    assert sliced == plain


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left_st, right=asof_right_st)
def test_range_join_bucketed_matches_model(spark_prop, left, right):
    """The bucketed band range join vs a brute-force python model:
    every (anchor, candidate) pair with the same key and candidate time
    in [anchor, anchor + band) must appear exactly once — including
    pairs that cross a bucket boundary — and nothing else."""
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.operators.temporal import (
        range_join_bucketed,
    )

    BAND = 7
    ldf = spark_prop.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, row_id long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "row_id")
    rdf = spark_prop.createDataFrame(
        [(k, t, v) for k, t, v in right] or [(None, None, None)],
        "k long, t long, rid long",
    ).filter("k IS NOT NULL").select(
        "k", F.timestamp_seconds("t").alias("ts"), "rid"
    )
    got = sorted(
        (r["row_id"], r["rv"])
        for r in range_join_bucketed(
            ldf, rdf, on="k", band_seconds=BAND, carry={"rid": "rv"}
        ).collect()
    )
    want = sorted(
        (i, rid)
        for i, (lk, lt) in enumerate(left)
        for (rk, rt, rid) in right
        if rk == lk and lt <= rt < lt + BAND
    )
    assert got == want


# ---------------------------------------------------------------------------
# BM25: shared-tf Spark pipeline == direct per-document model
# ---------------------------------------------------------------------------

_bm25_word_st = st.sampled_from(["alpha", "beta", "gamma", "dd", "ee", "ff"])
_bm25_doc_st = st.lists(_bm25_word_st, min_size=1, max_size=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_bm25_doc_st, min_size=1, max_size=8))
def test_bm25_matches_direct_model(spark_prop, docs):
    """operators.text.bm25_topk (pinned shared-tf formulation, broadcast
    query frame, micro-unit sums) against an independently coded
    per-document BM25 computed in plain Python over the same corpus —
    same query-term selection rule, same k1/b, same quantization."""
    import math

    from pokemon_showdown_airflow_etl_spark.operators.text import bm25_topk

    k1, b = 1.5, 0.75
    corpus = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark_prop.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_id"], r["matched"], r["score_micro"])
        for r in bm25_topk(
            sdf, "doc_id", "text",
            k1=k1, b=b, n_query_terms=2, min_term_len=2, topk=len(docs),
        ).collect()
    }

    # direct model
    tf: dict[tuple[int, str], int] = {}
    for i, ws in enumerate(docs):
        for w in ws:
            tf[(i, w)] = tf.get((i, w), 0) + 1
    dl = {i: len(ws) for i, ws in enumerate(docs)}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    dfreq: dict[str, int] = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    qterms = sorted(
        (w for w in dfreq if len(w) >= 2), key=lambda w: (-dfreq[w], w)
    )[:2]
    want = {}
    for i, ws in enumerate(docs):
        micro = 0
        matched = 0
        for w in qterms:
            if (i, w) not in tf:
                continue
            matched += 1
            idf = math.log(1.0 + (n_docs - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            tfc = tf[(i, w)] * (k1 + 1.0) / (
                tf[(i, w)] + k1 * (1.0 - b + b * dl[i] / avgdl)
            )
            micro += math.floor(idf * tfc * 1_000_000.0 + 0.5)
        if matched:
            want[i] = (i, matched, micro)
    assert got == set(want.values())


_chunk_word_st = st.sampled_from(["aa", "bb", "cc", "dd"])
_chunk_doc_st = st.lists(_chunk_word_st, min_size=1, max_size=40)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(_chunk_doc_st, min_size=1, max_size=5),
    window=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=12),
    min_tokens=st.integers(min_value=1, max_value=6),
)
def test_chunk_windows_matches_python_model(spark_prop, docs, window, stride, min_tokens):
    """chunk_windows (sequence + posexplode + slice) against a direct
    Python chunker over arbitrary window/stride/min_tokens geometry."""
    from pokemon_showdown_airflow_etl_spark.operators.text import chunk_windows

    corpus = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark_prop.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            chunk_windows(
                sdf, "doc_id", "text",
                window=window, stride=stride, min_tokens=min_tokens,
            ).collect(),
        )
    )
    want = []
    for i, ws in enumerate(docs):
        for cid, start in enumerate(range(0, len(ws), stride)):
            if len(ws) - start < min_tokens:
                continue
            piece = ws[start : start + window]
            want.append((i, cid, start, len(piece), " ".join(piece)))
    assert got == sorted(want)


_cms_key_st = st.sampled_from([f"k{i}" for i in range(12)])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    stream=st.lists(_cms_key_st, min_size=1, max_size=120),
    depth=st.integers(min_value=1, max_value=4),
    width=st.sampled_from([2, 8, 64]),
)
def test_cms_never_underestimates(spark_prop, stream, depth, width):
    """The CMS law under arbitrary streams and tiny, collision-heavy
    geometries: every estimate >= the true count, and with a roomy
    width the estimate is exact for every key."""
    from collections import Counter

    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    truth = Counter(stream)
    keys = spark_prop.createDataFrame([(k,) for k in stream], "k string")
    sk = cms_sketch(keys, "k", depth=depth, width=width)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(keys.distinct(), sk, "k", depth=depth, width=width).collect()
    }
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    assert sum(est.values()) <= depth * len(stream) * len(truth)  # sanity ceiling


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark_prop, edges):
    """Min-label propagation + pointer jumping against a direct
    union-find over arbitrary graphs (chains, cliques, isolated pairs)."""
    from pokemon_showdown_airflow_etl_spark.operators.dedup import (
        connected_components,
    )

    df = spark_prop.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["label"] for r in connected_components(df).collect()
    }

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


def test_connected_components_long_chain_converges_in_log_rounds(spark_prop):
    """A 64-node path graph (diameter 63) must converge well inside the
    25-round cap — the pointer-jumping guarantee; plain min-propagation
    would need 63 rounds and raise."""
    from pokemon_showdown_airflow_etl_spark.operators.dedup import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(63)]
    df = spark_prop.createDataFrame(chain, "doc_a long, doc_b long")
    labels = connected_components(df, max_iterations=12)
    rows = labels.collect()
    assert len(rows) == 64
    assert {r["label"] for r in rows} == {0}


_scrub_fragment = st.sampled_from(
    [
        "plain words here",
        "a.b@mail-host.org",
        "reach me +1 (555) 010-4477 now",
        "https://site.example/path?utm_source=x&id=9#frag",
        "http://plain.example/path",
        "digits 2024 2025",
        "x" * 40,
        "(((", "@@", "?&#",
    ]
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(frags=st.lists(_scrub_fragment, min_size=1, max_size=6))
def test_scrub_is_idempotent_and_removes_pii(spark_prop, frags):
    """t18's scrub as a fixed point: scrubbing already-scrubbed text
    changes nothing (second-pass counts all zero, text identical), and
    no email/URL-query survives a single pass. Randomly composed PII /
    boilerplate fragments cover pattern adjacency cases the catalog
    corpus can't."""
    from pokemon_showdown_airflow_etl_spark.operators.text import scrub_text

    spark = spark_prop
    df = spark.createDataFrame([(0, " ".join(frags))], "doc_id long, text string")
    once = scrub_text(df, "text").select(
        "doc_id", "text", "was_redacted"
    )
    twice = scrub_text(once.select("doc_id", "text"), "text")
    r1 = once.first()
    r2 = twice.first()
    assert r2["text"] == r1["text"], "scrub is not a fixed point"
    assert (
        r2["n_emails"] == r2["n_urls_canonicalized"] == r2["n_phones"] == 0
    ), "second pass still found matches"
    assert "@mail-host.org" not in r1["text"]
    assert "utm_source" not in r1["text"]


# ---------------------------------------------------------------------------
# additive lake-facet merge laws: for ANY partition of a corpus into
# batches, merging the per-batch facet rows equals building the facet
# from scratch on the whole corpus (the property compaction and the
# committed-read path rely on; max/bottom-k laws are covered in
# tests/test_sketch_lake.py)
# ---------------------------------------------------------------------------

_word_st = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_facet_doc_st = st.lists(_word_st, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(_facet_doc_st, min_size=1, max_size=10),
    cut=st.integers(min_value=0, max_value=10),
)
def test_facet_merges_equal_from_scratch_for_any_batch_split(
    spark_prop, docs, cut
):
    from pokemon_showdown_airflow_etl_spark.jobs.doc_signature_lake import (
        batch_cms_rows,
        batch_hh_rows,
        merge_hh_rows,
    )
    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        merge_cms_rows,
    )
    from pokemon_showdown_airflow_etl_spark.operators.text import (
        bigram_lm_rows,
        merge_lm_rows,
    )

    spark = spark_prop
    cut = min(cut, len(docs))
    rows = [(i, t) for i, t in enumerate(docs)]
    whole = spark.createDataFrame(rows, "doc_id long, text string")
    a = spark.createDataFrame(rows[:cut] or [], "doc_id long, text string")
    b = spark.createDataFrame(rows[cut:] or [], "doc_id long, text string")

    def srt(df):
        return sorted(map(tuple, df.collect()))

    # lm: SUM per bigram type + DISTINCT vocab
    assert srt(merge_lm_rows(bigram_lm_rows(a).unionAll(bigram_lm_rows(b)))) == srt(
        bigram_lm_rows(whole)
    )
    # cms: SUM per cell (width shrunk so collisions actually occur)
    assert srt(
        merge_cms_rows(
            batch_cms_rows(a, width=16).unionAll(batch_cms_rows(b, width=16))
        )
    ) == srt(batch_cms_rows(whole, width=16))
    # hh with m >= all gram types degenerates to exact counts, where
    # max-merge of a 2-way split must equal the per-batch maxima
    merged = merge_hh_rows(
        batch_hh_rows(a, m=100).unionAll(batch_hh_rows(b, m=100))
    )
    ca = {r[0]: r[1] for r in srt(batch_hh_rows(a, m=100))}
    cb = {r[0]: r[1] for r in srt(batch_hh_rows(b, m=100))}
    expect = sorted(
        (g, max(ca.get(g, 0), cb.get(g, 0))) for g in set(ca) | set(cb)
    )
    assert srt(merged) == expect


# ---------------------------------------------------------------------------
# histogram sketch: decimal bucketing matches the Python model, merge
# is SUM-exact for any batch split, and the quantile serve brackets the
# exact discrete quantile
# ---------------------------------------------------------------------------

hist_vals_st = st.lists(
    st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40
)


def _hist_py(vals):
    from collections import Counter

    def lohi(x):
        s = str(x)
        d = len(s)
        if d <= 3:
            return (x, x)
        lo = int(s[:3] + "0" * (d - 3))
        return (lo, lo + 10 ** (d - 3) - 1)

    return sorted(
        (lo, hi, n) for (lo, hi), n in Counter(map(lohi, vals)).items()
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=hist_vals_st, cut=st.integers(min_value=0, max_value=40))
def test_hist_sketch_matches_model_merges_and_brackets_quantiles(
    spark_prop, vals, cut
):
    from pokemon_showdown_airflow_etl_spark.operators.sketches import (
        hist_quantiles,
        hist_rows,
        merge_hist_rows,
    )

    spark = spark_prop
    cut = min(cut, len(vals))

    def df(vs):
        return spark.createDataFrame([(v,) for v in vs] or [], "v long")

    def srt(frame):
        return sorted(map(tuple, frame.collect()))

    whole = hist_rows(df(vals), "v")
    assert srt(whole) == _hist_py(vals)
    # merge law: any 2-way split re-merges to the from-scratch rows
    split = merge_hist_rows(
        hist_rows(df(vals[:cut]), "v").unionAll(hist_rows(df(vals[cut:]), "v"))
    )
    assert srt(split) == _hist_py(vals)
    # quantile serve brackets the exact nearest-rank quantile
    svals = sorted(vals)
    for r in hist_quantiles(whole, qs_ppm=(1, 500_000, 1_000_000)).collect():
        target = max(1, -(-r["q_ppm"] * len(svals) // 1_000_000))
        exact = svals[target - 1]
        assert r["est_lo"] <= exact <= r["est_hi"]
        assert r["n_total"] == len(svals)


_doc_word = st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split())
_doc_text = st.lists(_doc_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc_text, min_size=2, max_size=14))
def test_ppjoin_positional_filter_has_no_false_negatives(spark_prop, texts):
    """shingle_jaccard_pairs (r13: PPJoin positional prefix filter)
    against the naive all-pairs exact jaccard over random small
    corpora — the filter may only prune pairs the exact verification
    would reject, never a qualifying pair."""
    from pokemon_showdown_airflow_etl_spark.operators.dedup import (
        shingle_jaccard_pairs,
    )

    spark = spark_prop
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in shingle_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }

    def shingles(t):
        tk = [w for w in t.split(" ") if w]
        return {" ".join(tk[i:i + 2]) for i in range(len(tk) - 1)} if len(tk) >= 2 else set()

    want = {}
    for i, ta in docs:
        for j, tb in docs:
            if i >= j:
                continue
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= 0.5:
                want[(i, j)] = round(jac, 9)
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(st.sampled_from(["aa bb", "cc dd", "ee ff", "", "aa  bb"]), min_size=1, max_size=12)
)
def test_drop_exact_dups_with_copies_sums_to_input(spark_prop, texts):
    """r13: the with_copies audit column — its sum over the keepers is
    the input row count (what lets curate skip a separate full input
    scan), and the keeper set/schema match the default path exactly."""
    from pyspark.sql import functions as F

    from pokemon_showdown_airflow_etl_spark.operators.dedup import drop_exact_dups

    spark = spark_prop
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    plain = drop_exact_dups(df, "doc_id", "text")
    audited = drop_exact_dups(df, "doc_id", "text", with_copies=True)
    assert plain.columns == ["doc_id", "text"]
    assert audited.columns == ["doc_id", "text", "_n_copies"]
    rows = audited.collect()
    assert sum(r["_n_copies"] for r in rows) == len(texts)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in plain.collect()
    )
