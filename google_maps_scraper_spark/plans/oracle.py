"""Sequential single-threaded crawl oracle.

Re-enacts the reference's scheduling exactly — a priority queue drained in
``(priority ASC, created_at ASC)`` order (postgres/provider.go:159) with
concurrency 1 — over an in-memory pages dict.  The Spark engine must produce
the same URL-seen decisions and the same result set; BFS round assignment is
``1 + round(parent)`` by construction, which the oracle also records.

Job semantics per kind:
  * search (GmapJob, prio LOW, retries 3)  — gmaps/job.go:118-187
  * place  (PlaceJob, prio MEDIUM, retries 3) — gmaps/place.go:72-144
  * email  (EmailExtractJob, prio HIGH, retries 0) — gmaps/emailjob.go:64-98
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Any

from ..extract.canonical import entry_to_canonical_json
from ..extract.emails import extract_emails
from ..extract.entry import (
    entry_from_json,
    extract_reviews_page,
    is_website_valid_for_email,
    validate_entry,
)
from ..extract.place_page import extract_app_init_blob
from ..extract.serp import extract_feed_links
from ..extract.urls import (
    build_review_rpc_url,
    build_search_url,
    extract_next_page_token,
    normalize_google_url,
)
from ..schemas import (
    KIND_EMAIL,
    KIND_PLACE,
    KIND_SEARCH,
    PRIORITY_HIGH,
    PRIORITY_LOW,
    PRIORITY_MEDIUM,
)

__all__ = ["SequentialOracle", "OracleResult"]


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, int, str, str]] = field(default_factory=list)
    # (seq, priority, kind, url)
    seen_decisions: list[tuple[str, bool, str]] = field(default_factory=list)
    # (url, admitted, admitting_parent_seed)
    results: list[dict[str, Any]] = field(default_factory=list)
    rounds: dict[str, int] = field(default_factory=dict)  # job url+kind → BFS round
    counters: dict[str, int] = field(default_factory=dict)


@dataclass(order=True)
class _Job:
    priority: int
    created_seq: int
    kind: str = field(compare=False)
    url: str = field(compare=False)
    seed_id: str = field(compare=False)
    depth: int = field(compare=False, default=0)
    retries: int = field(compare=False, default=0)
    max_retries: int = field(compare=False, default=3)
    round: int = field(compare=False, default=1)
    pending_entry: dict | None = field(compare=False, default=None)


class SequentialOracle:
    def __init__(
        self,
        pages: dict[str, bytes | str],
        extract_email: bool = False,
        extra_reviews: bool = False,
        now_micros: int = 0,
    ):
        self.pages = pages
        self.extract_email = extract_email
        self.extra_reviews = extra_reviews
        self.now_micros = now_micros
        self._seen: set[str] = set()

    def _fetch_extra_reviews(self, place_url: str) -> list[dict]:
        """The reference's RPC pagination loop run inline inside the place
        job (gmaps/reviews.go:46-97; page cap 50; deterministic request id
        matches the engine's stored-page keying)."""
        acc: list[dict] = []
        token = ""
        pages_fetched = 0
        while pages_fetched < 50:
            url = build_review_rpc_url(place_url, token, 20, "0" * 21)
            body = self.pages.get(url)
            if body is None:
                break
            pages_fetched += 1
            acc.extend(extract_reviews_page(body, now_micros=self.now_micros))
            token = extract_next_page_token(body)
            if not token:
                break
        return acc

    def run(self, seed_queries: list[tuple[str, str]]) -> OracleResult:
        """seed_queries: (query_text, custom_id) pairs in input order."""
        res = OracleResult()
        heap: list[_Job] = []
        seq = 0
        for query, custom_id in seed_queries:
            url = build_search_url(query)
            heapq.heappush(
                heap,
                _Job(PRIORITY_LOW, seq, KIND_SEARCH, url, custom_id or f"seed-{seq}"),
            )
            seq += 1

        counters = {"seed_count": len(seed_queries), "seed_completed": 0,
                    "places_found": 0, "places_completed": 0}
        order_seq = 0

        while heap:
            job = heapq.heappop(heap)
            order_seq += 1
            res.crawl_order.append((order_seq, job.priority, job.kind, job.url))
            res.rounds.setdefault(f"{job.kind}:{job.url}", job.round)
            page = self.pages.get(job.url)

            if job.kind == KIND_SEARCH:
                if page is None:
                    counters["seed_completed"] += 1  # job.go:124-129
                    continue
                html = page.decode("utf-8", "replace") if isinstance(page, bytes) else page
                children: list[_Job] = []
                if "/maps/place/" in job.url:
                    children.append(_Job(PRIORITY_MEDIUM, seq, KIND_PLACE, job.url,
                                         job.seed_id, job.depth + 1, round=job.round + 1))
                    seq += 1
                else:
                    for href in extract_feed_links(html):
                        admitted = href not in self._seen
                        if admitted:
                            self._seen.add(href)
                            children.append(_Job(PRIORITY_MEDIUM, seq, KIND_PLACE, href,
                                                 job.seed_id, job.depth + 1,
                                                 round=job.round + 1))
                            seq += 1
                        res.seen_decisions.append((href, admitted, job.seed_id))
                for ch in children:
                    heapq.heappush(heap, ch)
                counters["places_found"] += len(children)
                counters["seed_completed"] += 1

            elif job.kind == KIND_PLACE:
                entry = None
                err = None
                if page is None:
                    err = "fetch error"
                else:
                    html = page.decode("utf-8", "replace") if isinstance(page, bytes) else page
                    blob = extract_app_init_blob(html)
                    if blob is None:
                        err = "APP_INITIALIZATION_STATE data not found"
                    else:
                        try:
                            entry = entry_from_json(blob, now_micros=self.now_micros)
                        except Exception as exc:
                            err = str(exc)
                if err is not None:
                    if job.retries < job.max_retries:
                        job.retries += 1
                        heapq.heappush(heap, job)  # retried at same priority/seq
                        res.crawl_order.pop()
                        order_seq -= 1
                    else:
                        counters["places_completed"] += 1
                    continue
                entry["input_id"] = job.seed_id
                if not entry["link"]:
                    entry["link"] = job.url
                if self.extra_reviews and (entry["review_count"] or 0) > 0:
                    acc = self._fetch_extra_reviews(job.url)
                    if acc:
                        entry["user_reviews_extended"] = acc
                if self.extract_email and is_website_valid_for_email(entry["web_site"]):
                    heapq.heappush(
                        heap,
                        _Job(PRIORITY_HIGH, seq, KIND_EMAIL,
                             normalize_google_url(entry["web_site"]), job.seed_id,
                             job.depth + 1, max_retries=0, round=job.round + 1,
                             pending_entry=entry),
                    )
                    seq += 1
                else:
                    counters["places_completed"] += 1
                    if validate_entry(entry):
                        res.results.append({
                            "url": job.url,
                            "entry": entry,
                            "canonical_json": entry_to_canonical_json(entry),
                        })

            elif job.kind == KIND_EMAIL:
                entry = job.pending_entry
                counters["places_completed"] += 1
                if page is not None:
                    html = page.decode("utf-8", "replace") if isinstance(page, bytes) else page
                    emails = extract_emails(html)
                    entry["emails"] = emails if emails else None
                # fetch miss: entry returned as-is (emailjob.go:80-82)
                if validate_entry(entry):
                    res.results.append({
                        "url": entry["link"],
                        "entry": entry,
                        "canonical_json": entry_to_canonical_json(entry),
                    })

        res.counters = counters
        return res
