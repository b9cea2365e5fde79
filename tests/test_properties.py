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
