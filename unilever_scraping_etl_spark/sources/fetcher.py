"""Fetcher protocol — the injected seam that replaces the reference's
two fetch paths (HTTP via curl_cffi, scrap_tokopedia.py:108-114; Selenium
browser fallback, scrap_tokopedia.py:98-106,240-250).

The reference hardcodes network clients inside scrape functions; we
invert that: a fetcher is any callable ``url -> FetchResult`` handed to
the ingest plan, so tests run on fixture HTML with zero network and
production swaps in a real client per-executor. The fallback-coalesce
semantics (HTTP first, browser when the page comes back empty/blocked —
including the reference's *intended* behavior at scrap_tokopedia.py:
137-138 where the fallback result is accidentally discarded) live in
``FallbackFetcher``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Mapping


@dataclass(frozen=True)
class FetchResult:
    url: str
    status: int
    html: str | None
    fetcher: str = "http"


Fetcher = Callable[[str], FetchResult]


class FixtureFetcher:
    """url -> canned HTML; the test-time fetcher (no network ever in
    tests, SURVEY.md §7.1). Unknown URLs return 404."""

    def __init__(self, pages: Mapping[str, str], name: str = "fixture"):
        self._pages = dict(pages)
        self._name = name

    def __call__(self, url: str) -> FetchResult:
        html = self._pages.get(url)
        if html is None:
            return FetchResult(url, 404, None, self._name)
        return FetchResult(url, 200, html, self._name)


class FallbackFetcher:
    """Cheap-path-first with expensive fallback (SURVEY.md §4): try
    ``primary``; if the status is bad or ``is_empty`` says the document
    lacks required content, retry with ``secondary`` and USE that result
    (the reference's evident intent at scrap_tokopedia.py:240-250; its
    HTTP!=200 branch at 137-138 drops the fallback result — a bug we do
    not replicate, SURVEY.md §7.4)."""

    def __init__(self, primary: Fetcher, secondary: Fetcher,
                 is_empty: Callable[[str], bool] | None = None):
        self._primary = primary
        self._secondary = secondary
        self._is_empty = is_empty

    def __call__(self, url: str) -> FetchResult:
        res = self._primary(url)
        needs_fallback = res.status != 200 or res.html is None or (
            self._is_empty is not None and self._is_empty(res.html))
        if needs_fallback:
            fb = self._secondary(url)
            return FetchResult(fb.url, fb.status, fb.html, f"fallback:{fb.fetcher}")
        return res


def http_fetcher(timeout: float = 10.0) -> Fetcher:
    """Production HTTP fetcher (requests-equivalent of
    scrap_tokopedia.py:108-114: GET with a browser User-Agent and a 10 s
    timeout). Imported lazily and never exercised in tests; any HTTP
    client library available on the executors can be slotted in."""
    import urllib.request

    def fetch(url: str) -> FetchResult:
        req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return FetchResult(url, resp.status, resp.read().decode("utf-8", "replace"))
        except Exception:
            return FetchResult(url, 0, None)

    return fetch
