"""Semantic tests for the round-4 wave-aa operators — Matryoshka
prefix-dimension recall and sign-bit (binary-quantization) Hamming recall —
against independent numpy/pure-Python replays of both the compressed
ranking and the full-precision oracle."""

from __future__ import annotations

import math

from google_maps_scraper_spark.operators.analytics import load
from google_maps_scraper_spark.operators.similarity import (
    _MRL_PREFIX_DIM,
    _RECALL_K,
    emb_matryoshka_prefix_recall,
    emb_sign_hamming_recall,
)

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = load(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def _cos_topk(vecs, query, k, dims=None):
    def cos(a, b):
        if dims is not None:
            a, b = a[:dims], b[:dims]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 3)

    scored = [(cos(v, query), vid) for vid, v in vecs.items() if vid != 0]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in scored[:k]]


def test_matryoshka_prefix_recall_matches_python(spark):
    vecs = _vectors(spark)
    q = vecs[0]
    full = set(_cos_topk(vecs, q, _RECALL_K))
    pref = _cos_topk(vecs, q, _RECALL_K, dims=_MRL_PREFIX_DIM)
    overlap = sum(1 for v in pref if v in full)

    [r] = emb_matryoshka_prefix_recall(spark, SF).collect()
    assert r["k"] == _RECALL_K
    assert r["prefix_dim"] == _MRL_PREFIX_DIM
    assert r["n_overlap"] == overlap
    assert r["recall_permille"] == overlap * 1000 // _RECALL_K
    # the eval must discriminate: prefix retrieval loses SOMETHING on this
    # corpus (else the eval is vacuous) but stays far above chance
    assert 0 < r["n_overlap"] < _RECALL_K


def test_sign_hamming_recall_matches_python(spark):
    vecs = _vectors(spark)
    q = vecs[0]
    qs = [1 if x >= 0 else 0 for x in q]
    full = set(_cos_topk(vecs, q, _RECALL_K))
    scored = []
    for vid, v in vecs.items():
        if vid == 0:
            continue
        ham = sum(1 for x, qb in zip(v, qs) if (1 if x >= 0 else 0) != qb)
        scored.append((ham, vid))
    scored.sort()
    topk = scored[:_RECALL_K]
    overlap = sum(1 for _, vid in topk if vid in full)
    max_ham = max(h for h, _ in topk)

    [r] = emb_sign_hamming_recall(spark, SF).collect()
    assert r["k"] == _RECALL_K
    assert r["n_overlap"] == overlap
    assert r["recall_permille"] == overlap * 1000 // _RECALL_K
    assert r["max_hamming_in_topk"] == max_ham
    assert 0 < max_ham < 64  # the Hamming ranking actually ordered something
