"""Deterministic synthetic page corpus (FIXTURES.md §1 payload kinds).

Generates a Common-Crawl-style pages table — (url, warc_ts, html, text, lang)
— in which the two-hop crawl graph from a seed list is fully resolvable:

  * SERP pages whose ``div[role=feed]`` anchors point at place pages
    (href shape per gmaps/job.go:159-176), with cross-SERP duplicate hrefs to
    exercise the URL-seen set;
  * place pages embedding ``window.APP_INITIALIZATION_STATE`` with the
    ``)]}'``-prefixed entry blob at ``[3][0][6]`` (gmaps/place.go:297-319),
    built positionally to the index map consumed by EntryFromJSON
    (gmaps/entry.go:360-542);
  * business-website pages with mailto anchors / plaintext emails
    (gmaps/emailjob.go:104-139), including invalid + duplicate addresses and
    social-network sites that the pre-fetch filter must exclude;
  * malformed place pages (panic-shaped) for crash-safety rows.

Everything derives from ``seed`` (default 42) via ``random.Random`` — no
wall-clock, no uuids (job ids are content-derived hashes).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os
import random
from dataclasses import dataclass, field
from typing import Any

from ..extract.urls import build_search_url

__all__ = [
    "SyntheticCorpus",
    "generate_corpus",
    "generate_corpus_spark",
    "generate_fast_corpus",
    "generate_grid_corpus",
    "set_path",
]

_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _ensure_len(arr: list, n: int) -> None:
    while len(arr) < n:
        arr.append(None)


def set_path(root: list, path: list[int], value: Any) -> Any:
    """Nested-array builder (≙ setNested/ensureLen in
    gmaps/entry_internal_test.go:125-172)."""
    cur = root
    for i, idx in enumerate(path):
        _ensure_len(cur, idx + 1)
        if i == len(path) - 1:
            cur[idx] = value
        else:
            if not isinstance(cur[idx], list):
                cur[idx] = []
            cur = cur[idx]
    return root


@dataclass
class SyntheticCorpus:
    pages: list[dict] = field(default_factory=list)          # PAGES_SCHEMA rows
    seeds: list[dict] = field(default_factory=list)          # (line_no, query, custom_id, ...)
    serp_to_places: dict[str, list[str]] = field(default_factory=dict)
    place_meta: dict[str, dict] = field(default_factory=dict)  # url → ground truth
    robots: list[dict] = field(default_factory=list)


def _place_blob(meta: dict) -> list:
    """Build the positional entry payload for one place."""
    jd: list = []
    set_path(jd, [6], [])
    d = jd[6]
    set_path(d, [11], meta["title"])
    set_path(d, [13], list(meta["categories"]))
    set_path(d, [18], f"{meta['title']},{meta['address']}")
    set_path(d, [27], meta["link"])
    set_path(d, [4, 7], meta["rating"])
    set_path(d, [4, 8], meta["review_count"])
    set_path(d, [4, 2], meta["price_range"])
    set_path(d, [4, 3, 0], f"https://search.google.com/local/reviews?placeid={meta['place_id']}")
    set_path(d, [9, 2], meta["lat"])
    set_path(d, [9, 3], meta["lon"])
    set_path(d, [7, 0], meta["website_raw"])
    set_path(d, [178, 0, 0], meta["phone"])
    set_path(d, [183, 2, 2, 0], meta["plus_code"])
    set_path(d, [183, 1, 0], "")
    set_path(d, [183, 1, 1], meta["street"])
    set_path(d, [183, 1, 3], meta["city"])
    set_path(d, [183, 1, 4], meta["postal_code"])
    set_path(d, [183, 1, 5], "")
    set_path(d, [183, 1, 6], meta["country"])
    set_path(d, [30], meta["timezone"])
    set_path(d, [10], meta["data_id"])
    set_path(d, [78], meta["place_id"])
    set_path(d, [34, 4, 4], meta["status"])
    set_path(d, [32, 1, 1], meta["description"])
    # old-format hours: items at d[34][1], each [day, [slots]]
    hours_items = [[day, [slot]] for day, slot in meta["hours"]]
    set_path(d, [34, 1], hours_items)
    # popular times: d[84][0] items [day_no, [[hour, traffic],...]]
    pt_items = [[day_no, [[h, t] for h, t in hour_traffic]]
                for day_no, hour_traffic in meta["popular_times"]]
    set_path(d, [84, 0], pt_items)
    # reviews per rating d[175][3][0..4]
    for i, c in enumerate(meta["reviews_per_rating"]):
        set_path(d, [175, 3, i], c)
    # inline reviews at d[175][9][0][0]
    reviews = []
    for r in meta["reviews"]:
        el: list = []
        set_path(el, [0], r["review_id"])
        set_path(el, [1, 2], r["posted_micros"])
        set_path(el, [1, 3], r["posted_micros"])
        set_path(el, [1, 4, 2, 0], r["author_url"])
        set_path(el, [1, 4, 5, 0], r["author"])
        set_path(el, [1, 4, 5, 1], r["profile_pic"])
        set_path(el, [1, 6], r["when"])
        set_path(el, [1, 13, 0], "Google")
        set_path(el, [1, 13, 4], 5)
        set_path(el, [2, 0, 0], r["rating"])
        set_path(el, [2, 14, 0], "en")
        set_path(el, [2, 15, 0, 0], r["text"])
        reviews.append([el])
    set_path(d, [175, 9, 0, 0], reviews)
    # cid at jd[25][3][0][13][0][0][1]
    set_path(jd, [25, 3, 0, 13, 0, 0, 1], meta["cid"])
    return jd


def _place_html(meta: dict) -> str:
    from ..extract.gojson import go_json_dumps  # exact, HTML-safe-escaped JSON

    blob = ")]}'" + go_json_dumps(_place_blob(meta))
    state = [None, None, None, [[None, None, None, None, None, None, blob]]]
    return (
        "<!DOCTYPE html><html><head><title>"
        + meta["title"]
        + "</title></head><body><script>window.APP_INITIALIZATION_STATE="
        + go_json_dumps(state)
        + ";window.APP_FLAGS=[];</script></body></html>"
    )


def _serp_html(place_urls: list[str]) -> str:
    anchors = "".join(
        f'<div jsaction="pane.x{i}"><a href="{u}"><span>place</span></a></div>'
        for i, u in enumerate(place_urls)
    )
    return (
        '<!DOCTYPE html><html><body><div role="main">'
        f'<div role="feed">{anchors}</div></div></body></html>'
    )


def _website_html(emails: list[str], plaintext: list[str]) -> str:
    anchors = "".join(f'<a href="mailto:{e}">contact</a>' for e in emails)
    body = " ".join(plaintext)
    return f"<!DOCTYPE html><html><body>{anchors}<p>{body}</p></body></html>"


_CITIES = [
    ("Athens", "GR", "Europe/Athens", 37.9838, 23.7275),
    ("Limassol", "CY", "Asia/Nicosia", 34.7071, 33.0226),
    ("Madrid", "ES", "Europe/Madrid", 40.4168, -3.7038),
    ("Berlin", "DE", "Europe/Berlin", 52.52, 13.405),
    ("Lisbon", "PT", "Europe/Lisbon", 38.7223, -9.1393),
]
_CATEGORIES = ["Restaurant", "Cafe", "Bar", "Bakery", "Hotel"]
_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]
# A deliberately small host pool with one dominant host → realistic skew.
_HOST_POOL = [
    "bigchain.example.com", "tavern-athens.gr", "cafe-limassol.com.cy",
    "madrid-eats.es", "berlin-bites.de", "lisbon-food.pt", "shop.example.org",
]


def _review_rpc_element(r: dict) -> list:
    """One review element in the RPC page shape (same positional layout the
    inline d[175][9][0][0] items use — gmaps/entry.go:544-630 paths)."""
    el: list = []
    set_path(el, [0], r["review_id"])
    set_path(el, [1, 2], r["posted_micros"])
    set_path(el, [1, 3], r["posted_micros"])
    set_path(el, [1, 4, 2, 0], r["author_url"])
    set_path(el, [1, 4, 5, 0], r["author"])
    set_path(el, [1, 4, 5, 1], r["profile_pic"])
    set_path(el, [1, 6], r["when"])
    set_path(el, [1, 13, 0], "Google")
    set_path(el, [1, 13, 4], 5)
    set_path(el, [2, 0, 0], r["rating"])
    set_path(el, [2, 14, 0], "en")
    set_path(el, [2, 15, 0, 0], r["text"])
    return [el]


def _review_rpc_page(reviews: list[dict], next_token: str) -> str:
    """RPC body: ``)]}'\n`` + [j0, next_token, [elements]]
    (token at jd[1], reviews at jd[2] — gmaps/entry.go:330-357,
    gmaps/reviews.go:281-303)."""
    from ..extract.gojson import go_json_dumps

    jd = [None, next_token or None, [_review_rpc_element(r) for r in reviews]]
    return ")]}'\n" + go_json_dumps(jd)


def generate_corpus(
    n_seeds: int = 3,
    places_per_serp: int = 10,
    dup_fraction: float = 0.3,
    email_fraction: float = 0.6,
    malformed_fraction: float = 0.05,
    skew_host_fraction: float = 0.5,
    extra_review_pages: int = 0,
    seed: int = 42,
) -> SyntheticCorpus:
    """Build a corpus where each seed query resolves to one SERP page whose
    feed links to ``places_per_serp`` place pages; ``dup_fraction`` of links
    (after the first SERP) duplicate earlier places; ``email_fraction`` of
    places have crawlable websites; ``skew_host_fraction`` of websites live
    on one dominant eTLD+1 (politeness-skew exercise)."""
    rng = random.Random(seed)
    c = SyntheticCorpus()
    ts = _EPOCH
    all_place_urls: list[str] = []

    def add_page(url: str, html: str, text: str = "", lang: str = "en") -> None:
        nonlocal ts
        ts += dt.timedelta(seconds=1)
        c.pages.append({"url": url, "warc_ts": ts, "html": html.encode(), "text": text, "lang": lang})

    import math

    pair_period = math.lcm(len(_CITIES), len(_CATEGORIES))
    for s in range(n_seeds):
        city, country, tz, clat, clon = _CITIES[s % len(_CITIES)]
        cat = _CATEGORIES[s % len(_CATEGORIES)]
        query = f"{cat.lower()} in {city.lower()}"
        if s >= pair_period:
            # keep queries (hence SERP urls) unique once the city×category
            # cycle wraps — one url maps to ONE page (the corpus is a web
            # snapshot; the engine resolves multiple captures to the latest,
            # so duplicate urls with different bodies would shadow each other)
            query += f" district {s:04d}"
        custom_id = f"seed-{s:03d}" if s % 2 == 0 else ""
        c.seeds.append({
            "line_no": s,
            "query": query + (f" #!#{custom_id}" if custom_id else ""),
            "custom_id": custom_id,
        })
        serp_url = build_search_url(query)

        place_urls: list[str] = []
        n_dups = int(places_per_serp * dup_fraction) if s > 0 and all_place_urls else 0
        for _ in range(n_dups):
            place_urls.append(rng.choice(all_place_urls))
        for p in range(places_per_serp - n_dups):
            pid = f"{s:03d}-{p:03d}"
            h1 = hashlib.sha256(f"hex1-{seed}-{pid}".encode()).hexdigest()[:16]
            h2 = hashlib.sha256(f"hex2-{seed}-{pid}".encode()).hexdigest()[:16]
            name = f"{cat} {city} {pid}"
            url = (
                f"https://www.google.com/maps/place/{name.replace(' ', '+')}"
                f"/data=!4m2!3m1!1s0x{h1}:0x{h2}!10m1!1e1"
            )
            malformed = rng.random() < malformed_fraction
            has_site = rng.random() < email_fraction
            social = has_site and rng.random() < 0.15
            if social:
                website = f"https://facebook.com/{pid}"
            elif has_site:
                host = (
                    _HOST_POOL[0]
                    if rng.random() < skew_host_fraction
                    else rng.choice(_HOST_POOL[1:])
                )
                website = f"https://{host}/biz/{pid}"
            else:
                website = ""
            n_reviews = rng.randint(0, 3)
            meta = {
                "title": name,
                "categories": [cat, "Food"],
                "address": f" {10 + p} Main St, {city} {1000 + p}",
                "link": url,
                "rating": round(rng.uniform(3.0, 5.0), 1),
                "review_count": rng.randint(5, 900),
                "price_range": rng.choice(["€", "€€", "€€€"]),
                "lat": round(clat + rng.uniform(-0.05, 0.05), 7),
                "lon": round(clon + rng.uniform(-0.05, 0.05), 7),
                "website_raw": website,
                "phone": f"+30 21{rng.randint(10000000, 99999999)}",
                "plus_code": f"{pid} {city}",
                "street": f"{10 + p} Main St",
                "city": city,
                "postal_code": str(1000 + p),
                "country": country,
                "timezone": tz,
                "data_id": f"0x{h1}:0x{h2}",
                "place_id": f"ChIJ{h1}{h2}"[:27],
                "status": rng.choice(["Open", "Closed", "Open ⋅ Closes 10 pm"]),
                "description": f"A fine {cat.lower()} in {city}.",
                "hours": [(d, "9 am–10 pm") for d in _DAYS],
                "popular_times": [
                    (d + 1, [(h, rng.randint(0, 100)) for h in range(8, 23)])
                    for d in range(7)
                ],
                "reviews_per_rating": [rng.randint(0, 50) for _ in range(5)],
                "reviews": [
                    {
                        "review_id": f"rev-{pid}-{r}",
                        "posted_micros": 1700000000000000 + rng.randint(0, 10**12),
                        "author_url": f"https://www.google.com/maps/contrib/1{rng.randint(10**19, 10**20 - 1)}",
                        "author": f"Reviewer {pid}-{r}",
                        "profile_pic": f"https://lh3.example.com/p/{pid}-{r}=w36",
                        "when": f"{r + 1} months ago",
                        "rating": rng.randint(1, 5),
                        "text": f"Review {r} of {name}. Nice {cat.lower()}!",
                    }
                    for r in range(n_reviews)
                ],
                "cid": str(int(h2, 16)),
                "malformed": malformed,
            }
            c.place_meta[url] = meta
            if malformed:
                # panic-shaped: APP_INIT present but blob truncated/non-array
                add_page(url, "<html><script>window.APP_INITIALIZATION_STATE="
                              "[null,null,null,[[null,null,null,null,null,null,\")]}'{broken\"]]];"
                              "</script></html>")
            else:
                add_page(url, _place_html(meta))
                if extra_review_pages > 0:
                    # review-RPC chain keyed exactly as the engine/oracle
                    # build the listugcposts URLs (deterministic request id)
                    from ..extract.urls import build_review_rpc_url

                    n_pages = rng.randint(1, extra_review_pages)
                    ext_reviews = [
                        {
                            "review_id": f"xrev-{pid}-{k}-{i}",
                            "posted_micros": 1710000000000000
                            + rng.randint(0, 10**12),
                            "author_url": f"https://www.google.com/maps/contrib/1{rng.randint(10**19, 10**20 - 1)}",
                            "author": f"XReviewer {pid}-{k}-{i}",
                            "profile_pic": f"https://lh3.example.com/x/{pid}-{k}-{i}=w36",
                            "when": f"{i + 1} weeks ago",
                            "rating": rng.randint(1, 5),
                            "text": f"Extended review {k}/{i} of {name}.",
                        }
                        for k in range(n_pages)
                        for i in range(3)
                    ]
                    meta["extra_reviews"] = ext_reviews
                    per_page = 3
                    token = ""
                    for k in range(n_pages):
                        page_revs = ext_reviews[k * per_page:(k + 1) * per_page]
                        nxt = f"tok-{pid}-{k + 1}" if k + 1 < n_pages else ""
                        rpc_url = build_review_rpc_url(url, token, 20, "0" * 21)
                        add_page(rpc_url, _review_rpc_page(page_revs, nxt))
                        token = nxt
            # website page (only for non-social, real sites)
            if website and not social:
                e1 = f"info@{website.split('/')[2]}"
                e2 = f"sales-{pid}@{website.split('/')[2]}"
                mailtos = [e1, e1, "not-an-email"] if rng.random() < 0.5 else []
                plaintext = [f"Contact: {e1}", f"or {e2}", "bad@@x"]
                meta["expected_emails"] = (
                    [e1] if mailtos else [e1, e2]
                )
                add_page(website, _website_html(mailtos, plaintext),
                         text=" ".join(plaintext))
            elif social:
                meta["expected_emails"] = None  # filtered pre-fetch
            place_urls.append(url)
            all_place_urls.append(url)

        rng.shuffle(place_urls)
        c.serp_to_places[serp_url] = place_urls
        add_page(serp_url, _serp_html(place_urls))

    # robots deny-list: block one host's /private prefix (engine-new feature)
    c.robots.append({"host": _HOST_POOL[0], "path_prefix": "/private", "allowed": False})
    return c


def generate_grid_corpus(
    queries: list[str],
    bbox_str: str = "37.90,23.60,38.05,23.85",
    cell_km: float = 10.0,
    zoom: int = 15,
    places_per_cell: int = 4,
    seed: int = 42,
) -> SyntheticCorpus:
    """Grid-mode corpus: one SERP page per (query × grid cell), stored under
    the exact ``/@lat,lon,{zoom}z`` search URL the engine builds
    (runner/jobs.go:141-214 + gmaps/job.go:44-54), each feeding a disjoint
    set of place pages near its cell center."""
    from ..extract.geo import cell_geo_coordinates, generate_cells, parse_bounding_box

    rng = random.Random(seed)
    c = SyntheticCorpus()
    ts = _EPOCH
    bbox = parse_bounding_box(bbox_str)
    cells = generate_cells(bbox, cell_km)

    def add_page(url: str, html: str) -> None:
        nonlocal ts
        ts += dt.timedelta(seconds=1)
        c.pages.append({"url": url, "warc_ts": ts, "html": html.encode(),
                        "text": "", "lang": "en"})

    for qi, query in enumerate(queries):
        c.seeds.append({"line_no": qi, "query": query, "custom_id": f"gq{qi:02d}"})
        for ci, (lat, lon) in enumerate(cells):
            geo = cell_geo_coordinates(lat, lon)
            serp_url = build_search_url(query, geo, zoom)
            place_urls = []
            for p in range(places_per_cell):
                pid = f"g{qi:02d}-{ci:03d}-{p:02d}"
                h1 = hashlib.sha256(f"ghex1-{seed}-{pid}".encode()).hexdigest()[:16]
                h2 = hashlib.sha256(f"ghex2-{seed}-{pid}".encode()).hexdigest()[:16]
                name = f"Grid {query.title()} {pid}"
                url = (
                    f"https://www.google.com/maps/place/{name.replace(' ', '+')}"
                    f"/data=!4m2!3m1!1s0x{h1}:0x{h2}!10m1!1e1"
                )
                meta = {
                    "title": name, "categories": ["Restaurant", "Food"],
                    "address": f" {p + 1} Cell Rd, Athens {2000 + ci}",
                    "link": url,
                    "rating": round(rng.uniform(3.0, 5.0), 1),
                    "review_count": rng.randint(5, 200),
                    "price_range": "€€",
                    "lat": round(lat + rng.uniform(-0.01, 0.01), 7),
                    "lon": round(lon + rng.uniform(-0.01, 0.01), 7),
                    "website_raw": "",
                    "phone": f"+30 21{rng.randint(10000000, 99999999)}",
                    "plus_code": f"{pid} Athens",
                    "street": f"{p + 1} Cell Rd", "city": "Athens",
                    "postal_code": str(2000 + ci), "country": "GR",
                    "timezone": "Europe/Athens",
                    "data_id": f"0x{h1}:0x{h2}",
                    "place_id": f"ChIJ{h1}{h2}"[:27],
                    "status": "Open",
                    "description": "A grid-cell place.",
                    "hours": [(d, "9 am–10 pm") for d in _DAYS],
                    "popular_times": [],
                    "reviews_per_rating": [1, 1, 1, 1, 1],
                    "reviews": [],
                    "cid": str(int(h2, 16)),
                }
                c.place_meta[url] = meta
                add_page(url, _place_html(meta))
                place_urls.append(url)
            c.serp_to_places[serp_url] = place_urls
            add_page(serp_url, _serp_html(place_urls))
    return c


def _fast_business(meta: dict) -> list:
    """Business array at item[14] (gmaps/multiple.go field paths)."""
    b: list = []
    set_path(b, [0], meta["input_id"])
    set_path(b, [11], meta["title"])
    set_path(b, [13], list(meta["categories"]))
    set_path(b, [7, 0], meta["website_raw"])
    set_path(b, [4, 7], meta["rating"])
    set_path(b, [4, 8], meta["review_count"])
    # address parts joined ", " by the parser
    set_path(b, [2], [meta["street"], meta["city"]])
    set_path(b, [9, 2], meta["lat"])
    set_path(b, [9, 3], meta["lon"])
    set_path(b, [178, 0, 0], meta["phone"])
    set_path(b, [34, 4, 4], meta["status"])
    hours_items = [[day, [slot]] for day, slot in meta["hours"]]
    set_path(b, [34, 1], hours_items)
    set_path(b, [30], meta["timezone"])
    set_path(b, [10], meta["data_id"])
    return b


def generate_fast_corpus(
    n_seeds: int = 3,
    businesses_per_query: int = 15,
    center_lat: float = 37.9838,
    center_lon: float = 23.7275,
    zoom: float = 15.0,
    lang: str = "en",
    outside_fraction: float = 0.3,
    seed: int = 42,
) -> SyntheticCorpus:
    """Fast-mode corpus: one ``tbm=map`` payload page per query
    (first line junk + JSON, businesses at data[0][1][1:][14] —
    gmaps/searchjob.go:97-144, multiple.go:11-81).  ``outside_fraction`` of
    businesses land well outside a 10 km radius to exercise the haversine
    filter (entry.go:1013-1047)."""
    from ..extract.gojson import go_json_dumps
    from ..extract.urls import build_fast_search_url

    rng = random.Random(seed)
    c = SyntheticCorpus()
    ts = _EPOCH
    for sidx in range(n_seeds):
        city, country, tz, _, _ = _CITIES[sidx % len(_CITIES)]
        cat = _CATEGORIES[sidx % len(_CATEGORIES)]
        query = f"{cat.lower()} near {city.lower()} {sidx:03d}"
        custom_id = f"fseed-{sidx:03d}" if sidx % 2 == 0 else ""
        c.seeds.append({"line_no": sidx, "query": query, "custom_id": custom_id})

        items: list = [["header"]]
        for p in range(businesses_per_query):
            far = rng.random() < outside_fraction
            dlat = rng.uniform(0.2, 0.5) if far else rng.uniform(-0.03, 0.03)
            dlon = rng.uniform(0.2, 0.5) if far else rng.uniform(-0.03, 0.03)
            meta = {
                "input_id": f"0x{sidx:04x}:0x{p:04x}",
                "title": f"{cat} {city} fast {sidx:03d}-{p:03d}",
                "categories": [cat],
                "website_raw": f"https://{_HOST_POOL[p % len(_HOST_POOL)]}/f/{sidx}-{p}",
                "rating": round(rng.uniform(3.0, 5.0), 1),
                "review_count": rng.randint(1, 500),
                "street": f"{p + 1} Fast St",
                "city": city,
                "lat": round(center_lat + dlat, 7),
                "lon": round(center_lon + dlon, 7),
                "phone": f"+30 69{rng.randint(10000000, 99999999)}",
                "status": rng.choice(["Open", "Closed"]),
                "hours": [(d, "9 am–5 pm") for d in _DAYS[:5]],
                "timezone": tz,
                "data_id": f"0x{sidx:08x}:0x{p:08x}",
            }
            item: list = []
            set_path(item, [14], _fast_business(meta))
            items.append(item)
        payload = [[None, items]]
        body = ")]}'\n" + go_json_dumps(payload)
        url = build_fast_search_url(query, center_lat, center_lon, zoom, lang)
        ts += dt.timedelta(seconds=1)
        c.pages.append({
            "url": url, "warc_ts": ts, "html": body.encode(), "text": "", "lang": lang,
        })
    return c


def corpus_to_spark(spark, corpus: SyntheticCorpus):
    """Materialize the pages table as a DataFrame (PAGES_SCHEMA)."""
    from ..schemas import PAGES_SCHEMA

    return spark.createDataFrame(
        [
            (p["url"], p["warc_ts"].replace(tzinfo=None), p["html"], p["text"], p["lang"])
            for p in corpus.pages
        ],
        PAGES_SCHEMA,
    )


def _dist_meta(s: int, p: int, seed: int, cat: str, city: str, country: str,
               tz: str, clat: float, clon: float, url: str,
               skew_host_fraction: float = 0.5) -> dict:
    """Deterministic per-place metadata for the distributed generator.
    ``skew_host_fraction`` of websites land on ONE dominant eTLD+1 (the
    politeness-skew knob tools/bench_skew.py sweeps)."""
    rng = random.Random(f"{seed}-{s}-{p}")
    pid = f"{s:04d}-{p:04d}"
    h1 = hashlib.sha256(f"hex1-{seed}-{pid}".encode()).hexdigest()[:16]
    h2 = hashlib.sha256(f"hex2-{seed}-{pid}".encode()).hexdigest()[:16]
    name = f"{cat} {city} {pid}"
    has_site = rng.random() < 0.6
    social = has_site and rng.random() < 0.15
    if social:
        website = f"https://facebook.com/{pid}"
    elif has_site:
        host = (
            _HOST_POOL[0]
            if rng.random() < skew_host_fraction
            else rng.choice(_HOST_POOL[1:])
        )
        website = f"https://{host}/biz/{pid}"
    else:
        website = ""
    n_reviews = rng.randint(0, 3)
    return {
        "title": name,
        "categories": [cat, "Food"],
        "address": f" {10 + p % 90} Main St, {city} {1000 + p % 9000}",
        "link": url,
        "rating": round(rng.uniform(3.0, 5.0), 1),
        "review_count": rng.randint(5, 900),
        "price_range": rng.choice(["€", "€€", "€€€"]),
        "lat": round(clat + rng.uniform(-0.05, 0.05), 7),
        "lon": round(clon + rng.uniform(-0.05, 0.05), 7),
        "website_raw": website,
        "phone": f"+30 21{rng.randint(10000000, 99999999)}",
        "plus_code": f"{pid} {city}",
        "street": f"{10 + p % 90} Main St",
        "city": city,
        "postal_code": str(1000 + p % 9000),
        "country": country,
        "timezone": tz,
        "data_id": f"0x{h1}:0x{h2}",
        "place_id": f"ChIJ{h1}{h2}"[:27],
        "status": rng.choice(["Open", "Closed", "Open ⋅ Closes 10 pm"]),
        "description": f"A fine {cat.lower()} in {city}.",
        "hours": [(d, "9 am–10 pm") for d in _DAYS],
        "popular_times": [
            (d + 1, [(h, rng.randint(0, 100)) for h in range(8, 23)])
            for d in range(7)
        ],
        "reviews_per_rating": [rng.randint(0, 50) for _ in range(5)],
        "reviews": [
            {
                "review_id": f"rev-{pid}-{r}",
                "posted_micros": 1700000000000000 + rng.randint(0, 10**12),
                "author_url": f"https://www.google.com/maps/contrib/1{rng.randint(10**19, 10**20 - 1)}",
                "author": f"Reviewer {pid}-{r}",
                "profile_pic": f"https://lh3.example.com/p/{pid}-{r}=w36",
                "when": f"{r + 1} months ago",
                "rating": rng.randint(1, 5),
                "text": f"Review {r} of {name}. Nice {cat.lower()}!",
            }
            for r in range(n_reviews)
        ],
        "cid": str(int(h2, 16)),
        "malformed": rng.random() < 0.05,
        "social": social,
    }


def _dist_ctx(s: int) -> tuple:
    city, country, tz, clat, clon = _CITIES[s % len(_CITIES)]
    cat = _CATEGORIES[s % len(_CATEGORIES)]
    return cat, city, country, tz, clat, clon


def _dist_url(s: int, p: int, seed: int, per_serp: int, n_dups: int) -> tuple[int, int, str]:
    """Resolve the (possibly duplicate) place slot (s, p) to the REAL place it
    names.  Real places live at p >= n_dups (seed 0: everywhere); duplicate
    slots deterministically point one SERP back — no recursion needed."""
    if s > 0 and p < n_dups:
        span = per_serp - n_dups if s - 1 > 0 else per_serp
        base = n_dups if s - 1 > 0 else 0
        s, p = s - 1, base + (p * 13) % span
    cat, city, *_ = _dist_ctx(s)
    pid = f"{s:04d}-{p:04d}"
    h1 = hashlib.sha256(f"hex1-{seed}-{pid}".encode()).hexdigest()[:16]
    h2 = hashlib.sha256(f"hex2-{seed}-{pid}".encode()).hexdigest()[:16]
    name = f"{cat} {city} {pid}"
    url = (
        f"https://www.google.com/maps/place/{name.replace(' ', '+')}"
        f"/data=!4m2!3m1!1s0x{h1}:0x{h2}!10m1!1e1"
    )
    return s, p, url


def generate_corpus_spark(
    spark,
    n_seeds: int,
    places_per_serp: int,
    dup_fraction: float = 0.3,
    seed: int = 42,
    skew_host_fraction: float = 0.5,
    extra_review_pages: int = 0,
):
    """Distributed synthetic corpus (same page shapes as ``generate_corpus``)
    built inside executors via ``mapInPandas`` — the driver never touches a
    page body, so corpus size scales with the cluster, not the driver.

    ``skew_host_fraction``: share of place websites on one dominant eTLD+1
    (host-skew benchmarking).  ``extra_review_pages`` > 0 adds the
    review-RPC chain pages (1..N pages of 3 reviews per place, keyed exactly
    as the engine builds listugcposts continuation URLs) so
    ``extra_reviews=True`` crawls are exercisable at bench scale.

    Returns ``(pages_df, seeds)`` where seeds is the (query, custom_id) list.
    """
    import pandas as pd

    from ..extract.urls import build_review_rpc_url
    from ..schemas import PAGES_SCHEMA

    n_dups = int(places_per_serp * dup_fraction)
    per_serp = places_per_serp

    def gen_places(batches):
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                s, p = divmod(int(gid), per_serp)
                if s > 0 and p < n_dups:
                    continue  # duplicate slot — page exists at its target
                rs, rp, url = _dist_url(s, p, seed, per_serp, n_dups)
                cat, city, country, tz, clat, clon = _dist_ctx(rs)
                meta = _dist_meta(rs, rp, seed, cat, city, country, tz, clat,
                                  clon, url, skew_host_fraction)
                ts = _EPOCH + dt.timedelta(seconds=int(gid) % 86400)
                if meta["malformed"]:
                    html = ("<html><script>window.APP_INITIALIZATION_STATE="
                            "[null,null,null,[[null,null,null,null,null,null,\")]}'{broken\"]]];"
                            "</script></html>")
                else:
                    html = _place_html(meta)
                rows.append((url, ts.replace(tzinfo=None), html.encode(), "", "en"))
                if extra_review_pages > 0 and not meta["malformed"]:
                    # review-RPC chain, keyed exactly like the local
                    # generator (and the engine's continuation URLs)
                    rng = random.Random(f"{seed}-xrev-{rs}-{rp}")
                    pid = f"{rs:04d}-{rp:04d}"
                    name = meta["title"]
                    n_pages = rng.randint(1, extra_review_pages)
                    per_page = 3
                    token = ""
                    for k in range(n_pages):
                        page_revs = [
                            {
                                "review_id": f"xrev-{pid}-{k}-{i}",
                                "posted_micros": 1710000000000000
                                + rng.randint(0, 10**12),
                                "author_url": f"https://www.google.com/maps/contrib/1{rng.randint(10**19, 10**20 - 1)}",
                                "author": f"XReviewer {pid}-{k}-{i}",
                                "profile_pic": f"https://lh3.example.com/x/{pid}-{k}-{i}=w36",
                                "when": f"{i + 1} weeks ago",
                                "rating": rng.randint(1, 5),
                                "text": f"Extended review {k}/{i} of {name}.",
                            }
                            for i in range(per_page)
                        ]
                        nxt = f"tok-{pid}-{k + 1}" if k + 1 < n_pages else ""
                        rpc_url = build_review_rpc_url(url, token, 20, "0" * 21)
                        rows.append((
                            rpc_url, ts.replace(tzinfo=None),
                            _review_rpc_page(page_revs, nxt).encode(), "", "en",
                        ))
                        token = nxt
                website = meta["website_raw"]
                if website and not meta["social"]:
                    host = website.split("/")[2]
                    e1, e2 = f"info@{host}", f"sales-{rs:04d}-{rp:04d}@{host}"
                    plaintext = [f"Contact: {e1}", f"or {e2}", "bad@@x"]
                    rows.append((
                        website, ts.replace(tzinfo=None),
                        _website_html([e1, e1, "not-an-email"], plaintext).encode()
                        if random.Random(f"{seed}-w-{rs}-{rp}").random() < 0.5
                        else _website_html([], plaintext).encode(),
                        " ".join(plaintext), "en",
                    ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    def gen_serps(batches):
        for pdf in batches:
            rows = []
            for sid in pdf["id"]:
                s = int(sid)
                cat, city, *_ = _dist_ctx(s)
                # district token keeps queries (hence SERP urls) unique per seed
                serp_url = build_search_url(
                    f"{cat.lower()} in {city.lower()} district {s:04d}"
                )
                urls = [
                    _dist_url(s, p, seed, per_serp, n_dups)[2]
                    for p in range(per_serp)
                ]
                rng = random.Random(f"{seed}-serp-{s}")
                rng.shuffle(urls)
                ts = _EPOCH + dt.timedelta(seconds=90000 + s)
                rows.append((
                    serp_url, ts.replace(tzinfo=None),
                    _serp_html(urls).encode(), "", "en",
                ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    par = spark.sparkContext.defaultParallelism
    places = (
        spark.range(n_seeds * per_serp, numPartitions=max(par * 2, 8))
        .mapInPandas(gen_places, PAGES_SCHEMA)
    )
    serps = (
        spark.range(n_seeds, numPartitions=max(min(par, n_seeds), 1))
        .mapInPandas(gen_serps, PAGES_SCHEMA)
    )
    pages = places.unionByName(serps)

    seeds = []
    for s in range(n_seeds):
        cat, city, *_ = _dist_ctx(s)
        custom_id = f"seed-{s:03d}" if s % 2 == 0 else ""
        seeds.append(
            (f"{cat.lower()} in {city.lower()} district {s:04d}", custom_id)
        )
    return pages, seeds


def corpus_to_parquet(spark, corpus: SyntheticCorpus, path: str, partitions: int = 32):
    """Write the pages table to parquet (the bench/scaling input: reading a
    columnar pages table is the 100 TB shape — html stays a pruned-away
    column except in the fetch-extract stage)."""
    corpus_to_spark(spark, corpus).repartition(partitions, "url").write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


# --- url-bucketed pages table (Iceberg ``bucket(url)`` partition analog) ----
#
# The crawl's fetch stand-in is ``pages ⋈ claim ON url``.  With a plain
# parquet directory the big-claim rounds must either BROADCAST the claim
# (the driver builds a 10^5..10^6-row hash relation serially — a fixed cost
# that repeats identically at every cluster size and caps scaling) or
# shuffle-join (the multi-KB html column rides the exchange).  Writing the
# pages table bucketed by url removes both: the scan itself satisfies the
# join's required distribution (HashPartitioning(url, buckets)), so ONLY the
# slim claim keys shuffle — work that scales with the cluster — and html is
# born and dies inside the scan stage.  On a real deployment this is the
# Iceberg table's ``bucket(N, url)`` partition transform + storage-partitioned
# join; Spark's builtin bucketed-table support is the local-catalog analog.

_PAGES_DDL_COLS = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def write_bucketed_pages(spark, pages, path: str, buckets: int = 128,
                         table: str = "gms_pages_bucketed"):
    """Write ``pages`` as a url-bucketed external parquet table at ``path``
    and return the registered table's DataFrame.  Bucket files carry
    Spark's bucket-id naming, so any later session can re-register the same
    location with :func:`read_bucketed_pages`."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        # repartition on the SAME hash the bucketed writer uses (Murmur3
        # pmod buckets): each write task then holds exactly one bucket's
        # rows, so the layout is one file per bucket instead of
        # tasks × buckets small files
        pages.repartition(buckets, "url")
        .write.mode("overwrite")
        .bucketBy(buckets, "url")
        .option("path", path)
        .saveAsTable(table)
    )
    # sidecar so a later session can re-register without knowing the bucket
    # count (underscore prefix: Spark's file index treats it as metadata)
    with open(os.path.join(path, "_gms_buckets.json"), "w") as fh:
        json.dump({"buckets": buckets}, fh)
    return spark.table(table)


def bucketed_pages_spec(path: str) -> int | None:
    """Bucket count if ``path`` was written by :func:`write_bucketed_pages`,
    else None (plain parquet directory)."""
    try:
        with open(os.path.join(path, "_gms_buckets.json")) as fh:
            return int(json.load(fh)["buckets"])
    except (OSError, ValueError, KeyError):
        return None


def read_bucketed_pages(spark, path: str, buckets: int = 128,
                        table: str = "gms_pages_bucketed"):
    """Register the bucketed pages files written by
    :func:`write_bucketed_pages` in THIS session's catalog (catalogs are
    in-memory and per-session) and return the table's DataFrame — its scan
    reports HashPartitioning(url, buckets), which is what lets the fetch
    join skip the pages-side exchange."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({_PAGES_DDL_COLS}) USING parquet "
        f"CLUSTERED BY (url) INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
    return spark.table(table)
