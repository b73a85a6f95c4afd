"""Semantic tests for the round-4 eleventh-wave operators — HyperLogLog
register build, two-round min-label propagation, and two-level sitemap-index
expansion — each against an independent sequential Python oracle built from
first principles (hashlib / dict arithmetic), not against the DuckDB SQL.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pandas as pd

from google_maps_scraper_spark.operators.analytics import (
    _HLL_BUCKETS,
    _HLL_W,
    events_hll_registers,
    load,
)
from google_maps_scraper_spark.operators.frontier import frontier_sitemap_expand
from google_maps_scraper_spark.operators.graph import (
    EDGE_FANOUT,
    graph_label_propagation_2iter,
)

SF = "/root/testdata/sf0.001"


def test_hll_registers_match_python(spark):
    users = [r["user_id"] for r in load(spark, SF, "events").collect()]
    regs: dict[int, int] = defaultdict(int)
    hits: dict[int, int] = defaultdict(int)
    for u in users:
        h = int(hashlib.md5(f"hll-v1:{u}".encode()).hexdigest()[:15], 16)
        bucket, rest = h % _HLL_BUCKETS, h // _HLL_BUCKETS
        rank = (_HLL_W + 1) if rest == 0 else _HLL_W - rest.bit_length() + 1
        regs[bucket] = max(regs[bucket], rank)
        hits[bucket] += 1
    got = {
        r["bucket"]: (r["register"], r["n_hashes"])
        for r in events_hll_registers(spark, SF).collect()
    }
    assert got == {b: (regs[b], hits[b]) for b in regs}
    # registers are ranks of a 52-bit suffix: 1..53, heavily skewed small
    assert all(1 <= reg <= _HLL_W + 1 for reg, _ in got.values())


def _undirected(spark):
    docs = sorted(r["doc_id"] for r in load(spark, SF, "documents").collect())
    n = len(docs)
    adj: dict[int, set[int]] = defaultdict(set)
    for u in docs:
        for j in range(EDGE_FANOUT):
            v = (u * (j + 2) + j) % n
            if v != u:
                adj[u].add(v)
                adj[v].add(u)
    return docs, adj


def test_label_propagation_two_rounds_match_python(spark):
    docs, adj = _undirected(spark)
    l1 = {v: min(v, min(adj[v])) for v in adj}
    l2 = {v: min(l1[v], min(l1[u] for u in adj[v])) for v in adj}
    got = {
        r["v"]: r["label"]
        for r in graph_label_propagation_2iter(spark, SF).collect()
    }
    assert got == l2
    # monotone contraction: round 2 never raises a label above round 1
    assert all(got[v] <= l1[v] for v in got)


def test_sitemap_expand_matches_python(spark):
    rows = load(spark, SF, "documents").select("doc_id", "source").collect()
    expect = sorted(
        (
            f"https://site-{r['source']}.com/sitemap-{r['doc_id'] % 2}.xml",
            f"https://site-{r['source']}.com/p/{r['doc_id']}",
            f"2026-{(r['doc_id'] % 12) + 1:02d}-01",
        )
        for r in rows
    )
    got = [
        (r["sitemap_url"], r["page_url"], r["lastmod"])
        for r in frontier_sitemap_expand(spark, SF).collect()
    ]
    assert sorted(got) == expect
    # every page appears exactly once and under its own host's sitemap
    assert len({p for _, p, _ in got}) == len(rows)
    assert all(s.split("/sitemap-")[0] == p.rsplit("/p/", 1)[0] for s, p, _ in got)
