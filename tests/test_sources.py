"""Unit tests for the API client pure core (no Spark, no network):
pagination semantics, retry/backoff schedule, non-retryable statuses —
the SURVEY 'hard part #2' behaviors (reference api.py:13-99)."""

from __future__ import annotations

import json

import pytest

from pokemon_showdown_airflow_etl_spark.sources.api import (
    PAGE_SIZE,
    ReplayApiClient,
    ReplayFetchError,
)
from pokemon_showdown_airflow_etl_spark.sources.fake import (
    FakeShowdownTransport,
    make_replays,
)


def make_client(transport, **kw):
    sleeps = []
    client = ReplayApiClient(transport=transport, sleeper=sleeps.append, **kw)
    return client, sleeps


def test_page_is_descending_and_capped():
    corpus = {"gen9ou": make_replays("gen9ou", 120)}
    client, _ = make_client(FakeShowdownTransport(corpus))
    page = client.fetch_page("gen9ou")
    assert len(page) == PAGE_SIZE
    times = [r["uploadtime"] for r in page]
    assert times == sorted(times, reverse=True)


def test_before_cursor_pages_strictly_backwards():
    corpus = {"gen9ou": make_replays("gen9ou", 120)}
    client, _ = make_client(FakeShowdownTransport(corpus))
    p1 = client.fetch_page("gen9ou")
    p2 = client.fetch_page("gen9ou", before_ts=p1[-1]["uploadtime"])
    assert max(r["uploadtime"] for r in p2) < p1[-1]["uploadtime"]
    # third page is short: 120 - 51 - 51 = 18 rows => end of data
    p3 = client.fetch_page("gen9ou", before_ts=p2[-1]["uploadtime"])
    assert len(p3) == 120 - 2 * PAGE_SIZE < PAGE_SIZE


def test_search_errors_degrade_to_empty_page():
    client, _ = make_client(lambda url, c, r: (500, "boom"))
    assert client.fetch_page("gen9ou") == []
    client, _ = make_client(lambda url, c, r: (200, "not json"))
    assert client.fetch_page("gen9ou") == []


def test_retry_backoff_schedule_then_success():
    """Flaky transport: two 500s then success. Backoff sleeps must be
    0.1 * 2^attempt (api.py:88)."""
    calls = {"n": 0}

    def flaky(url, c, r):
        calls["n"] += 1
        if calls["n"] <= 2:
            return 500, "flaky"
        return 200, json.dumps({"id": "x", "uploadtime": 1})

    client, sleeps = make_client(flaky)
    doc = client.fetch_replay("x")
    assert doc["id"] == "x" and calls["n"] == 3
    assert sleeps == [0.1, 0.2]


def test_retries_exhausted_raises():
    client, sleeps = make_client(lambda url, c, r: (500, "down"))
    with pytest.raises(ReplayFetchError) as exc:
        client.fetch_replay("x")
    assert exc.value.status == 500
    assert sleeps == [0.1, 0.2]  # 3 attempts => 2 backoffs


@pytest.mark.parametrize("status", [404, 403, 401])
def test_non_retryable_statuses_fail_fast(status):
    calls = {"n": 0}

    def dead(url, c, r):
        calls["n"] += 1
        return status, "no"

    client, sleeps = make_client(dead)
    with pytest.raises(ReplayFetchError) as exc:
        client.fetch_replay("x")
    assert exc.value.status == status
    assert calls["n"] == 1 and sleeps == []


def test_fake_corpus_replay_has_log_timestamps():
    corpus = {"gen9ou": make_replays("gen9ou", 3)}
    client, _ = make_client(FakeShowdownTransport(corpus))
    doc = client.fetch_replay("gen9ou-1001")
    assert "|t:|" in doc["log"]
    assert doc["players"] == [doc["p1"], doc["p2"]]
