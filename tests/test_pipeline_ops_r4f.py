"""Semantic tests for the round-4 sixth-wave operators — graph compute
(integer PageRank, triangle counting), canonical-URL normalization, and
sliding-window rates — each against an independent sequential Python oracle
(urllib for URLs, brute-force set arithmetic for graphs).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from urllib.parse import urlsplit

import duckdb

from google_maps_scraper_spark.operators.analytics import (
    _SLIDE_US,
    events_sliding_window_rates,
    frontier_url_canonicalize,
    load,
)
from google_maps_scraper_spark.operators.graph import (
    _PR_BASE,
    _PR_ONE,
    EDGE_FANOUT,
    doc_edges,
    graph_pagerank_2iter,
    graph_triangle_count,
)

SF = "/root/testdata/sf0.001"


def _py_edges(doc_ids):
    n = len(doc_ids)
    edges = set()
    for u in doc_ids:
        for j in range(EDGE_FANOUT):
            v = (u * (j + 2) + j) % n
            if v != u:
                edges.add((u, v))
    return edges


def test_doc_edges_matches_python(spark):
    doc_ids = [r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()]
    expect = _py_edges(doc_ids)
    got = {(r["src"], r["dst"]) for r in doc_edges(spark, SF).collect()}
    assert got == expect
    assert all(s != d for s, d in got)


def test_pagerank_2iter_matches_python(spark):
    doc_ids = sorted(
        r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    edges = _py_edges(doc_ids)
    out_deg = Counter(s for s, _ in edges)
    ranks = {u: _PR_ONE for u in doc_ids}
    for _ in range(2):
        contrib: dict = defaultdict(int)
        for s, d in edges:
            contrib[d] += ranks[s] // out_deg[s]
        ranks = {u: _PR_BASE + (85 * contrib.get(u, 0)) // 100 for u in doc_ids}
    got = {r["doc_id"]: r["pr_scaled"] for r in graph_pagerank_2iter(spark, SF).collect()}
    assert got == ranks
    # the graph must actually redistribute rank: not all nodes equal
    assert len(set(ranks.values())) > 1


def test_triangle_count_matches_python(spark):
    doc_ids = [r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()]
    und = {(min(s, d), max(s, d)) for s, d in _py_edges(doc_ids)}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    per_node = Counter()
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counts each triangle once
                per_node[a] += 1
                per_node[b] += 1
                per_node[c] += 1
    got = {r["doc_id"]: r["n_tri"] for r in graph_triangle_count(spark, SF).collect()}
    assert got == {u: per_node.get(u, 0) for u in doc_ids}
    assert sum(got.values()) % 3 == 0  # every triangle credits 3 nodes


def _py_canon(raw: str) -> str:
    sp = urlsplit(raw)
    scheme = sp.scheme.lower()
    host = sp.hostname or ""
    if host.startswith("www."):
        host = host[4:]
    port = ""
    if sp.port is not None and not (
        (scheme == "http" and sp.port == 80) or (scheme == "https" and sp.port == 443)
    ):
        port = f":{sp.port}"
    path = sp.path.rstrip("/") or "/"
    params = sorted(
        p for p in sp.query.split("&") if p and not p.startswith("utm_")
    )
    q = f"?{'&'.join(params)}" if params else ""
    return f"{scheme}://{host}{port}{path}{q}"


def test_url_canonicalize_matches_urllib(spark):
    rows = frontier_url_canonicalize(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["url_canon"] == _py_canon(r["url_raw"]), r["url_raw"]
    # every mess pattern appears and collapses to a clean spelling
    canons = {r["url_canon"] for r in rows}
    assert any(c.endswith("?a=1&b=2") for c in canons)      # sorted, utm dropped
    assert not any("#" in c or "www." in c or ":80/" in c for c in canons)
    assert any(":8080" in c for c in canons)                # explicit port kept


def test_sliding_window_rates_matches_python(spark):
    ev = duckdb.sql(
        f"SELECT epoch_us(ts) AS us, event_type, user_id"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    n_ev: Counter = Counter()
    users: dict = defaultdict(set)
    for us, etype, uid in ev:
        s0 = (us // _SLIDE_US) * _SLIDE_US
        for w in (s0, s0 - _SLIDE_US):
            n_ev[(w, etype)] += 1
            users[(w, etype)].add(uid)
    got = {
        (r["win_start_us"], r["event_type"]): (r["n_events"], r["n_users"])
        for r in events_sliding_window_rates(spark, SF).collect()
    }
    assert got == {k: (n_ev[k], len(users[k])) for k in n_ev}
    # every event lands in exactly 2 windows
    assert sum(v[0] for v in got.values()) == 2 * len(ev)
