"""Semantic tests for the round-4 fourteenth-wave operators — link-graph
degree histogram, BFS crawl-depth labeling, and training-shard manifest —
against independent Python oracles (edge replay, set-based BFS, hashlib
shard fold)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from google_maps_scraper_spark.operators.analytics import (
    _SHARD_COUNT,
    _SHARD_SALT,
    docs_shard_manifest,
    load,
)
from google_maps_scraper_spark.operators.graph import (
    _BFS_SEED_MOD,
    EDGE_FANOUT,
    graph_bfs_depth2,
    graph_degree_histogram,
)

SF = "/root/testdata/sf0.001"


def _doc_ids(spark):
    return sorted(
        r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()
    )


def _edges(ids):
    n = len(ids)
    return {
        (u, (u * (j + 2) + j) % n)
        for u in ids
        for j in range(EDGE_FANOUT)
        if u != (u * (j + 2) + j) % n
    }


def test_degree_histogram_matches_python(spark):
    ids = _doc_ids(spark)
    edges = _edges(ids)
    out_deg = Counter(u for u, _ in edges)
    in_deg = Counter(v for _, v in edges)
    ho = Counter(out_deg.get(i, 0) for i in ids)
    hi = Counter(in_deg.get(i, 0) for i in ids)
    expect = {
        d: (ho.get(d, 0), hi.get(d, 0)) for d in set(ho) | set(hi)
    }
    rows = graph_degree_histogram(spark, SF).collect()
    got = {r["degree"]: (r["n_nodes_out"], r["n_nodes_in"]) for r in rows}
    assert got == expect
    # histograms each account for every node exactly once
    assert sum(v[0] for v in got.values()) == len(ids)
    assert sum(v[1] for v in got.values()) == len(ids)


def test_bfs_depth2_matches_python(spark):
    ids = _doc_ids(spark)
    edges = _edges(ids)
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    d0 = {i for i in ids if i % _BFS_SEED_MOD == 0}
    assert d0, "seed set empty at this SF — pick a smaller modulus"
    r1 = {v for u in d0 for v in adj.get(u, ())} - d0
    r2 = {v for u in r1 for v in adj.get(u, ())} - d0 - r1
    expect = {i: -1 for i in ids}
    for s, depth in ((d0, 0), (r1, 1), (r2, 2)):
        for v in s:
            expect[v] = depth
    got = {r["doc_id"]: r["depth"] for r in graph_bfs_depth2(spark, SF).collect()}
    assert got == expect
    # the depth label is the MINIMUM hop count: no node labeled deeper than
    # a direct edge from a shallower level allows
    for u, v in edges:
        if got[u] >= 0:
            assert got[v] == -1 or got[v] <= got[u] + 1 or got[u] + 1 > 2


def test_shard_manifest_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text", "n_chars").collect()
    agg: dict[int, list] = {}
    for r in docs:
        h = hashlib.md5(f"{_SHARD_SALT}:{r['doc_id']}".encode()).hexdigest()
        shard = int(h[:8], 16) % _SHARD_COUNT
        t = (r["text"] or "").strip()
        n_tok = 0 if not t else len(re.split(r"\s+", t, flags=re.ASCII))
        a = agg.setdefault(shard, [0, 0, 0, None, None])
        a[0] += 1
        a[1] += r["n_chars"]
        a[2] += n_tok
        a[3] = r["doc_id"] if a[3] is None else min(a[3], r["doc_id"])
        a[4] = r["doc_id"] if a[4] is None else max(a[4], r["doc_id"])
    rows = docs_shard_manifest(spark, SF).collect()
    got = {
        r["shard"]: [
            r["n_docs"], r["total_chars"], r["total_tokens"],
            r["min_doc_id"], r["max_doc_id"],
        ]
        for r in rows
    }
    assert got == {k: v for k, v in agg.items()}
    # manifest totals reconcile with the corpus
    assert sum(v[0] for v in got.values()) == len(docs)
    assert sum(v[1] for v in got.values()) == sum(r["n_chars"] for r in docs)
