"""Replay API client — S1/S2 sources (reference api.py:13-99).

The transport is a pluggable callable ``(url, connect_timeout,
read_timeout) -> (status_code, body_text)`` so the client logic
(pagination, retries, backoff, non-retryable statuses) is testable
without network and the same client object can ride inside Spark tasks
(it is a small picklable value object).

Semantics preserved from the reference:
- search pages hold at most 51 rows; a short page means end of data
  (discovery.py:108).
- replay fetch retries up to 3 times with exponential backoff
  0.1 * 2^attempt, but 404/403/401 are non-retryable (api.py:57-95).
- search errors degrade to an empty page (api.py:33-42).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable

BASE_URL = "https://replay.pokemonshowdown.com"  # constants.py:30
PAGE_SIZE = 51
SEARCH_TIMEOUTS = (5.0, 30.0)  # api.py:31
REPLAY_TIMEOUTS = (3.05, 20.0)  # api.py:63
NON_RETRYABLE = (404, 403, 401)  # api.py:74-77
MAX_RETRIES = 3
BACKOFF_BASE = 0.1  # api.py:88: 0.1 * 2^n

Transport = Callable[[str, float, float], tuple[int, str]]


class ReplayFetchError(Exception):
    def __init__(self, replay_id: str, status: int | None, message: str):
        super().__init__(message)
        self.replay_id = replay_id
        self.status = status


class PageFetchError(Exception):
    """A search page could not be served (transport failure, non-200,
    malformed body). Raised only in strict mode — callers that must not
    mistake an outage for end-of-data (e.g. the parallel backfill's
    range workers) opt in; the default degrades to an empty page like
    the reference."""


def urllib_transport(url: str, connect_timeout: float, read_timeout: float) -> tuple[int, str]:
    """Default transport over urllib (stdlib; no extra deps)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=read_timeout) as resp:  # noqa: S310
            return resp.status, resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:  # pragma: no cover - needs network
        return e.code, e.read().decode("utf-8", "replace")


@dataclass
class ReplayApiClient:
    transport: Transport = urllib_transport
    base_url: str = BASE_URL
    request_pause_s: float = 0.0  # reference paces 0.1 s (api.py:66)
    max_retries: int = MAX_RETRIES
    backoff_base_s: float = BACKOFF_BASE
    sleeper: Callable[[float], None] = field(default=time.sleep)

    def fetch_page(
        self, format_id: str, before_ts: int | None = None, strict: bool = False
    ) -> list[dict]:
        """S1: one page of the paginated search listing (api.py:13-42).

        By default errors (transport failure, non-200, bad JSON) degrade
        to an empty page, matching the reference's defensive return.
        ``strict=True`` raises PageFetchError instead, so callers that
        treat an empty page as end-of-data can tell the two apart.
        """
        url = f"{self.base_url}/search.json?format={format_id}"
        if before_ts is not None:
            url += f"&before={before_ts}"
        try:
            status, body = self.transport(url, *SEARCH_TIMEOUTS)
        except Exception as exc:
            if strict:
                raise PageFetchError(f"transport error: {exc}") from exc
            return []
        if status != 200:
            if strict:
                raise PageFetchError(f"search returned status {status}")
            return []
        try:
            rows = json.loads(body)
        except ValueError as exc:
            if strict:
                raise PageFetchError(f"malformed search body: {exc}") from exc
            return []
        if not isinstance(rows, list):
            if strict:
                raise PageFetchError("search body is not a list")
            return []
        return rows

    def fetch_replay(self, replay_id: str) -> dict:
        """S2: point lookup of one replay document with bounded retries
        (api.py:44-99). Raises ReplayFetchError after exhausting retries
        or immediately on a non-retryable status."""
        url = f"{self.base_url}/{replay_id}.json"
        last: tuple[int | None, str] = (None, "no attempt")
        for attempt in range(self.max_retries):
            try:
                status, body = self.transport(url, *REPLAY_TIMEOUTS)
            except Exception as exc:  # transport-level failure: retryable
                last = (None, f"transport error: {exc}")
            else:
                if status == 200:
                    if self.request_pause_s:
                        self.sleeper(self.request_pause_s)
                    return json.loads(body)
                last = (status, f"HTTP {status}")
                if status in NON_RETRYABLE:
                    raise ReplayFetchError(replay_id, status, f"HTTP {status} (non-retryable)")
            if attempt < self.max_retries - 1:
                self.sleeper(self.backoff_base_s * (2**attempt))
        raise ReplayFetchError(replay_id, last[0], f"exhausted retries: {last[1]}")
