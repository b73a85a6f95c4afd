"""Semantic tests for the round-4 eighth-wave operators — SURT keys,
eTLD+1 politeness keys, and robots.txt longest-prefix-match evaluation —
each against an independent sequential Python oracle (urllib for URL
splitting, pure string logic for suffixes and rule matching).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

from google_maps_scraper_spark.operators.analytics import (
    frontier_url_canonicalize,
    load,
)
from google_maps_scraper_spark.operators.frontier import (
    _POLITENESS_BUCKETS,
    frontier_etld1_key,
    frontier_robots_eval,
    frontier_surt_key,
)

SF = "/root/testdata/sf0.001"


def _py_surt(url_canon: str) -> str:
    sp = urlsplit(url_canon)
    host = sp.hostname or ""
    rev = ",".join(reversed(host.split(".")))
    port = f":{sp.port}" if sp.port is not None else ""
    pathq = sp.path + (f"?{sp.query}" if sp.query else "")
    return f"{rev}{port}){pathq}"


def test_surt_key_matches_urllib(spark):
    canon = {
        r["doc_id"]: r["url_canon"]
        for r in frontier_url_canonicalize(spark, SF).collect()
    }
    got = {
        r["doc_id"]: (r["url_canon"], r["surt_key"])
        for r in frontier_surt_key(spark, SF).collect()
    }
    assert set(got) == set(canon)
    for doc_id, (url_canon, surt) in got.items():
        assert url_canon == canon[doc_id]
        assert surt == _py_surt(url_canon)
    # host-range contiguity: sorting by SURT groups each domain's URLs
    keys = sorted(s for _, s in got.values())
    domains = [k.split(")", 1)[0].split(":", 1)[0] for k in keys]
    seen, prev = set(), None
    for d in domains:
        if d != prev:
            assert d not in seen, f"domain {d} split into non-contiguous runs"
            seen.add(d)
        prev = d


_SUFFIXES = ("co.uk", "com.au")


def _py_etld1(host: str) -> str:
    for suf in _SUFFIXES:
        if host.endswith("." + suf):
            stem = host[: -(len(suf) + 1)]
            return stem.rsplit(".", 1)[-1] + "." + suf
    return ".".join(host.rsplit(".", 2)[-2:])


def test_etld1_key_matches_python(spark):
    rows = frontier_etld1_key(spark, SF).collect()
    assert len(rows) == load(spark, SF, "documents").count()
    multi = 0
    for r in rows:
        expect = _py_etld1(r["host"])
        assert r["etld1"] == expect, r["host"]
        h = int(hashlib.md5(expect.encode()).hexdigest()[:8], 16)
        assert r["bucket"] == h % _POLITENESS_BUCKETS
        if r["etld1"].count(".") == 2:
            multi += 1
    # the corpus exercises multi-label public suffixes, and subdomain
    # variants of one registrable domain share the bucket
    assert multi > 0
    by_etld1: dict = {}
    for r in rows:
        by_etld1.setdefault(r["etld1"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in by_etld1.values())


def _py_robots(path: str, srcnum: int):
    rules = [("/", True), ("/p", False), ("/p/4", True), ("/Crawl", srcnum % 2 == 0)]
    matched = max(
        ((rp, allow) for rp, allow in rules if path.startswith(rp)),
        key=lambda x: len(x[0]),
    )
    return matched[0], "allow" if matched[1] else "deny"


def test_robots_eval_matches_python(spark):
    src_of = {
        r["doc_id"]: int(r["source"][3:])
        for r in load(spark, SF, "documents").select("doc_id", "source").collect()
    }
    rows = frontier_robots_eval(spark, SF).collect()
    assert len(rows) == len(src_of)
    verdicts = set()
    overrides = 0
    for r in rows:
        rule, verdict = _py_robots(r["path"], src_of[r["doc_id"]])
        assert (r["matched_rule"], r["verdict"]) == (rule, verdict), r
        verdicts.add(verdict)
        if rule == "/p/4":
            overrides += 1
    # both verdicts occur and the longest-match override fires
    assert verdicts == {"allow", "deny"}
    assert overrides > 0
