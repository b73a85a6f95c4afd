"""SERP parsing: feed-link extraction from HTML and fast-mode JSON results.

  * feed links: goquery selector ``div[role=feed] div[jsaction]>a`` over the
    scrolled SERP HTML, collecting ``href`` in document order
    (gmaps/job.go:159-176);
  * fast-mode: ``ParseSearchResults`` over the single-request JSON payload —
    businesses at ``data[0][1][1:]``, each record at ``[14]``
    (gmaps/multiple.go:11-81, gmaps/searchjob.go:97-144);
  * ``removeFirstLine`` (gmaps/searchjob.go:133-144).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Any

from .entry import _get_hours, empty_entry  # noqa: SLF001 - shared parse core
from .nth import get_float, get_list, get_str
from .olc import olc_encode

__all__ = ["extract_feed_links", "parse_search_results", "remove_first_line"]


class _FeedLinkParser(HTMLParser):
    """Minimal DOM walk equivalent to ``div[role=feed] div[jsaction]>a``:
    anchors whose *direct parent* is a ``div[jsaction]`` that sits anywhere
    under a ``div[role=feed]``."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # stack of (tag, is_feed_div, is_jsaction_div)
        self._stack: list[tuple[str, bool, bool]] = []
        self._feed_depth = 0
        self.links: list[str] = []

    _VOID = {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        a = dict(attrs)
        is_feed = tag == "div" and a.get("role") == "feed"
        is_jsaction = tag == "div" and "jsaction" in a

        if tag == "a" and self._feed_depth > 0 and self._stack and self._stack[-1][2]:
            href = a.get("href") or ""
            if href:
                self.links.append(href)

        if tag in self._VOID:
            return
        self._stack.append((tag, is_feed, is_jsaction))
        if is_feed:
            self._feed_depth += 1

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a" and self._feed_depth > 0 and self._stack and self._stack[-1][2]:
            href = dict(attrs).get("href") or ""
            if href:
                self.links.append(href)

    def handle_endtag(self, tag: str) -> None:
        # pop until matching tag (tolerate unbalanced HTML)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _, was_feed, _ in self._stack[i:]:
                    if was_feed:
                        self._feed_depth -= 1
                del self._stack[i:]
                break


def extract_feed_links(html: str | bytes) -> list[str]:
    """All hrefs matching ``div[role=feed] div[jsaction]>a`` in doc order."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    p = _FeedLinkParser()
    p.feed(html)
    return p.links


def remove_first_line(data: bytes) -> bytes:
    """gmaps/searchjob.go:133-144 — drop everything up to the first newline."""
    if not data:
        return b""
    idx = data.find(b"\n")
    if idx == -1:
        return b""
    return data[idx + 1 :]


def parse_search_results(raw: bytes | str) -> list[dict[str, Any]]:
    """gmaps/multiple.go:11-81 — fast-mode SERP JSON → list of Entry dicts.

    Raises ValueError on structurally invalid payloads (Go returns errors).
    """
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", "replace")
    try:
        data = json.loads(raw)
    except ValueError as exc:
        raise ValueError(f"failed to unmarshal JSON: {exc}") from exc
    if not isinstance(data, list) or not data:
        raise ValueError("empty JSON data")
    container = data[0]
    if not isinstance(container, list) or not container:
        raise ValueError("invalid business list structure")
    items = get_list(container, 1)
    if len(items) < 2:
        raise ValueError("empty business list")

    entries: list[dict[str, Any]] = []
    for i in range(1, len(items)):
        arr = items[i]
        if not isinstance(arr, list):
            continue
        business = get_list(arr, 14)

        entry = empty_entry()
        entry["input_id"] = get_str(business, 0)
        entry["title"] = get_str(business, 11)
        entry["categories"] = [_gofmt_v(v) for v in get_list(business, 13)]
        entry["web_site"] = get_str(business, 7, 0)
        entry["review_rating"] = get_float(business, 4, 7)
        entry["review_count"] = int(get_float(business, 4, 8))
        entry["address"] = ", ".join(_gofmt_v(p) for p in get_list(business, 2))
        entry["latitude"] = get_float(business, 9, 2)
        entry["longtitude"] = get_float(business, 9, 3)
        entry["phone"] = get_str(business, 178, 0, 0).replace(" ", "")
        entry["open_hours"] = _get_hours(business)
        entry["status"] = get_str(business, 34, 4, 4)
        entry["timezone"] = get_str(business, 30)
        entry["data_id"] = get_str(business, 10)
        entry["plus_code"] = olc_encode(entry["latitude"], entry["longtitude"], 10)
        entries.append(entry)

    return entries


def _gofmt_v(v: Any) -> str:
    """Go ``fmt.Sprintf("%v", part)`` over a JSON-decoded value
    (gmaps/multiple.go:53-65,83-90).  Strings pass through; numbers are
    float64 in Go, so 5 renders as "5" and 5.5 as "5.5" via %v (shortest)."""
    if isinstance(v, str):
        return v
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) or isinstance(v, int):
        f = float(v)
        if f == int(f) and abs(f) < 1e21:
            return str(int(f))
        return repr(f)
    return str(v)
