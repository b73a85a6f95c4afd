"""Semantic tests for the round-4 wave-y operators — TPC-H Q6, the
temperature-mixture weights, and 2-round k-core peeling — against
independent Python oracles (filtered-sum replay, isqrt replay, set-based
peel replay)."""

from __future__ import annotations

import math
import re
from collections import defaultdict
from datetime import datetime

from google_maps_scraper_spark.operators.analytics import (
    docs_mixture_weights_isqrt,
    load,
    tpch_q6_forecast_revenue,
)
from google_maps_scraper_spark.operators.graph import (
    _KCORE_K,
    EDGE_FANOUT,
    graph_kcore_2iter,
)

SF = "/root/testdata/sf0.001"


def test_tpch_q6_matches_python(spark):
    rows = (
        load(spark, SF, "lineitem")
        .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
        .collect()
    )
    lo, hi = datetime(1995, 1, 1), datetime(1996, 1, 1)
    picked = [
        r
        for r in rows
        if lo <= r["l_shipdate"] < hi
        and 0.05 <= r["l_discount"] <= 0.07
        and r["l_quantity"] < 24
    ]
    revenue = round(sum(r["l_extendedprice"] * r["l_discount"] for r in picked), 2)
    [r] = tpch_q6_forecast_revenue(spark, SF).collect()
    assert r["n_lineitems"] == len(picked) > 0
    assert abs(r["revenue"] - revenue) < 0.01 * max(1.0, abs(revenue))


def test_mixture_weights_match_python(spark):
    docs = load(spark, SF, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        agg[r["source"]][0] += 1
        agg[r["source"]][1] += len(re.split(r"\s+", r["text"].strip()))
    ws = {s: math.isqrt(t) for s, (_, t) in agg.items()}
    total_w = sum(ws.values())
    rows = {r["source"]: r for r in docs_mixture_weights_isqrt(spark, SF).collect()}
    assert set(rows) == set(agg)
    for s, (n, t) in agg.items():
        r = rows[s]
        assert (r["n_docs"], r["n_tokens"], r["w"], r["share_permille"]) == (
            n,
            t,
            ws[s],
            ws[s] * 1000 // total_w,
        )
    # temperature actually flattens: every share under the uniform 2x bound
    assert all(r["share_permille"] < 2000 // len(agg) for r in rows.values())


def test_kcore_peeling_matches_python(spark):
    n = load(spark, SF, "documents").count()
    und = defaultdict(set)
    for u in range(n):
        for j in range(EDGE_FANOUT):
            v = (u * (j + 2) + j) % n
            if v != u:
                und[u].add(v)
                und[v].add(u)
    deg0 = {v: len(nb) for v, nb in und.items()}
    s1 = {v for v, d in deg0.items() if d >= _KCORE_K}
    deg1 = {
        v: len(und[v] & s1) for v in s1
    }
    s2 = {v for v in s1 if deg1[v] >= _KCORE_K}
    rows = {r["doc_id"]: r for r in graph_kcore_2iter(spark, SF).collect()}
    assert set(rows) == set(range(n))
    for v in range(n):
        r = rows[v]
        assert r["deg_initial"] == deg0.get(v, 0)
        assert r["survived_r1"] == (v in s1)
        assert r["survived_r2"] == (v in s2)
    # peeling is exercised, monotone, and actually CASCADES (round-2
    # degrees drop because round-1 removals take edges with them)
    assert 0 < len(s1) < n
    assert s2 <= s1 and len(s2) < len(s1)
