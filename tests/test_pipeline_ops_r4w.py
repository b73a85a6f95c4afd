"""Semantic tests for the round-4 wave-w operators — 2-hop harmonic
centrality, the power-of-two value histogram, and the ANN recall eval —
against independent Python oracles (set-based graph replay, bit-length
replay, composition re-check)."""

from __future__ import annotations

from collections import defaultdict

from google_maps_scraper_spark.operators.analytics import (
    events_value_log2_histogram,
    load,
)
from google_maps_scraper_spark.operators.graph import (
    EDGE_FANOUT,
    graph_harmonic_centrality_2hop,
)
from google_maps_scraper_spark.operators.similarity import (
    _RECALL_K,
    QUERIES as SIM_QUERIES,
    emb_ann_recall_eval,
)

SF = "/root/testdata/sf0.001"


def _edges(n):
    es = set()
    for u in range(n):
        for j in range(EDGE_FANOUT):
            v = (u * (j + 2) + j) % n
            if v != u:
                es.add((u, v))
    return es


def test_harmonic_centrality_matches_python(spark):
    n = load(spark, SF, "documents").count()
    es = _edges(n)
    in1 = defaultdict(set)
    for u, v in es:
        in1[v].add(u)
    in2 = defaultdict(set)
    for u, v in es:
        for w in in1[u]:
            if w != v and w not in in1[v]:
                in2[v].add(w)
    rows = {r["doc_id"]: r for r in graph_harmonic_centrality_2hop(spark, SF).collect()}
    assert set(rows) == set(range(n))
    for d in range(n):
        r = rows[d]
        assert r["n_dist1"] == len(in1[d])
        assert r["n_dist2"] == len(in2[d])
        assert r["harmonic_x2"] == 2 * len(in1[d]) + len(in2[d])
    # the exact-distance-2 exclusion is actually load-bearing here
    assert any(in1[d] and in2[d] for d in range(n))
    assert any(
        len(in2[d]) < sum(len(in1[u]) for u in in1[d]) for d in range(n)
    )


def test_value_log2_histogram_matches_python(spark):
    vals = [r["value"] for r in load(spark, SF, "events").select("value").collect()]
    buckets = defaultdict(list)
    for v in vals:
        x = float(v) * 1000
        frac = x - int(x)
        m = int(x) + (1 if x > 0 else -1) if abs(frac) == 0.5 else round(x)
        b = -1 if m <= 0 else m.bit_length()
        buckets[b].append(m)
    rows = {r["bucket"]: r for r in events_value_log2_histogram(spark, SF).collect()}
    assert set(rows) == set(buckets)
    for b, ms in buckets.items():
        r = rows[b]
        assert (r["n_events"], r["min_milli"], r["max_milli"]) == (
            len(ms),
            min(ms),
            max(ms),
        )
    # bucket invariant: [2^(b-1), 2^b) in milli-units
    for b, r in rows.items():
        if b > 0:
            assert (1 << (b - 1)) <= r["min_milli"] <= r["max_milli"] < (1 << b)
    assert len(rows) > 3


def test_ann_recall_eval_consistent_with_operands(spark):
    brute = {
        r["vec_id"] for r in SIM_QUERIES["emb_cosine_topk_r3"](spark, SF).collect()
    }
    lsh_rows = SIM_QUERIES["emb_lsh_ann_topk"](spark, SF).collect()
    lsh = {r["vec_id"] for r in lsh_rows}
    fallback = any(r["brute_force_fallback"] for r in lsh_rows)
    overlap = len(brute & lsh)
    [r] = emb_ann_recall_eval(spark, SF).collect()
    assert r["k"] == _RECALL_K
    assert r["n_overlap"] == overlap
    assert r["recall_permille"] == overlap * 1000 // _RECALL_K
    assert r["lsh_fallback"] == fallback
    assert 0 < r["n_overlap"] <= _RECALL_K
