"""Semantic tests for the round-4 tenth-wave operators — outlink
extraction (frontier expansion) and crawler-trap detection — each against
an independent sequential Python oracle (re module + pure string logic).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from google_maps_scraper_spark.operators.analytics import load
from google_maps_scraper_spark.operators.frontier import (
    _TRAP_MAX_DEPTH,
    _TRAP_MAX_QUERY,
    _TRAP_MAX_REP,
    frontier_link_extract,
    frontier_trap_detect,
)

SF = "/root/testdata/sf0.001"

_HREF = re.compile(r"""(?i)href=["']([^"'>]+)["']""")


def _py_html(doc_id: int, source: str) -> str:
    mail = (
        f'<a href="mailto:user@site-{source}.com">m</a>'
        if doc_id % 3 == 0
        else ""
    )
    return (
        f'<html><body><a href="https://site-{source}.com/p/{doc_id}">x</a>'
        f"<p><a href='/rel/{doc_id + 1}'>y</a></p>"
        f"<A HREF='HTTP://site-{source}.COM/Crawl/{doc_id}'>z</A>"
        f"{mail}</body></html>"
    )


def test_link_extract_matches_python(spark):
    docs = [
        (r["doc_id"], r["source"])
        for r in load(spark, SF, "documents").select("doc_id", "source").collect()
    ]
    expect = set()
    mailto_seen = 0
    for doc_id, source in docs:
        for href in _HREF.findall(_py_html(doc_id, source)):
            if href.lower().startswith("mailto:"):
                mailto_seen += 1
                continue
            if href.startswith("/"):
                href = f"https://site-{source}.com{href}"
            expect.add((doc_id, re.sub(r"#.*$", "", href)))
    assert mailto_seen > 0  # the filter is actually exercised
    got = {
        (r["doc_id"], r["link_url"])
        for r in frontier_link_extract(spark, SF).collect()
    }
    assert got == expect
    # every doc contributed its three non-mailto links
    per_doc = Counter(d for d, _ in got)
    assert set(per_doc.values()) == {3}


def _py_trap(doc_id: int):
    shape = doc_id % 4
    if shape == 0:
        path = "/cal/" + "d/e/" * 3 + "view"
    elif shape == 1:
        path = f"/p/{doc_id}"
    elif shape == 2:
        path = f"/a/b/c/d/e/f/g/h/i/j/k/l/{doc_id}"
    else:
        path = "/item"
    if shape == 3:
        query = (
            "sid="
            + hashlib.md5(str(doc_id).encode()).hexdigest()
            + hashlib.md5(f"x{doc_id}".encode()).hexdigest()
        )
    else:
        query = "a=1"
    segs = [s for s in path.split("/") if s]
    depth = len(segs)
    max_rep = max(Counter(segs).values())
    qlen = len(query)
    if depth > _TRAP_MAX_DEPTH:
        verdict = "depth"
    elif max_rep > _TRAP_MAX_REP:
        verdict = "loop"
    elif qlen > _TRAP_MAX_QUERY:
        verdict = "session"
    else:
        verdict = "ok"
    return depth, max_rep, qlen, verdict


def test_trap_detect_matches_python(spark):
    doc_ids = [
        r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()
    ]
    expect = {d: _py_trap(d) for d in doc_ids}
    got = {
        r["doc_id"]: (r["depth"], r["max_seg_rep"], r["query_len"], r["verdict"])
        for r in frontier_trap_detect(spark, SF).collect()
    }
    assert got == expect
    # all four verdicts occur (each synthesis shape fires its trap)
    assert {v[3] for v in got.values()} == {"depth", "loop", "session", "ok"}
