"""Semantic tests for the round-4 wave-r operators — trailing-range burst
detection, IP-colocation politeness grouping, and the domain-level link
matrix — against independent Python oracles (two-pointer sliding window,
hashlib /24 fold, dict-based graph condensation)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _BURST_K,
    _BURST_W_US,
    events_burst_detect,
    load,
)
from google_maps_scraper_spark.operators.frontier import (
    _IP24_BUCKETS,
    _IP_BUDGET,
    frontier_ip_politeness_group,
)
from google_maps_scraper_spark.operators.graph import (
    EDGE_FANOUT,
    graph_domain_link_matrix,
)

SF = "/root/testdata/sf0.001"


def _us(dt):
    import datetime

    return int((dt - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def _host(doc_id: int, source: str) -> str:
    return [
        f"a.b.site-{source}.com",
        f"x.site-{source}.co.uk",
        f"site-{source}.org",
        f"deep.y.site-{source}.com.au",
        f"site-{source}.com",
    ][doc_id % 5]


def _etld1(host: str) -> str:
    for suf in (".co.uk", ".com.au"):
        if host.endswith(suf):
            m = re.search(r"([^.]+" + suf.replace(".", r"[.]") + r")$", host)
            return m.group(1)
    m = re.search(r"([^.]+[.][^.]+)$", host)
    return m.group(1)


def _md5fold(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_burst_detect_matches_python(spark):
    ev = load(spark, SF, "events").select("user_id", "event_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((_us(r["ts"]), r["event_id"]))
    expect = {}
    for rows in by_user.values():
        rows.sort()
        lo = 0
        for i, (us, eid) in enumerate(rows):
            while rows[lo][0] < us - _BURST_W_US:
                lo += 1
            n = i - lo + 1
            if n >= _BURST_K:
                expect[eid] = n
    got = {
        r["event_id"]: r["n_in_window"]
        for r in events_burst_detect(spark, SF).collect()
    }
    assert got == expect
    assert got  # calibrated threshold must flag something at sf0.001


def test_ip_politeness_group_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "source").collect()
    groups = defaultdict(lambda: (set(), 0))
    for r in docs:
        et = _etld1(_host(r["doc_id"], r["source"]))
        ip = f"10.0.{_md5fold(et) % _IP24_BUCKETS}"
        hosts, n = groups[ip]
        hosts.add(et)
        groups[ip] = (hosts, n + 1)
    rows = frontier_ip_politeness_group(spark, SF).collect()
    assert len(rows) == len(groups)
    any_coloc = False
    for r in rows:
        hosts, n_urls = groups[r["ip24"]]
        assert r["n_hosts"] == len(hosts)
        assert r["n_urls"] == n_urls
        assert r["colocated"] == (len(hosts) > 1)
        assert r["per_host_budget"] == max(1, _IP_BUDGET // len(hosts))
        any_coloc |= r["colocated"]
    assert any_coloc  # the fold must actually co-locate some domains
    # budgets conserve the server limit: colocated shares never exceed it
    for r in rows:
        assert r["per_host_budget"] * min(r["n_hosts"], _IP_BUDGET) <= _IP_BUDGET


def test_domain_link_matrix_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "source").collect()
    dom = {
        r["doc_id"]: _etld1(_host(r["doc_id"], r["source"])) for r in docs
    }
    n = len(dom)
    edges = {
        (u, (u * (j + 2) + j) % n)
        for u in dom
        for j in range(EDGE_FANOUT)
        if u != (u * (j + 2) + j) % n
    }
    expect = Counter((dom[u], dom[v]) for u, v in edges)
    rows = graph_domain_link_matrix(spark, SF).collect()
    got = {(r["src_dom"], r["dst_dom"]): r["n_links"] for r in rows}
    assert got == dict(expect)
    for r in rows:
        assert r["internal"] == (r["src_dom"] == r["dst_dom"])
    # condensation conserves every edge exactly once
    assert sum(got.values()) == len(edges)
