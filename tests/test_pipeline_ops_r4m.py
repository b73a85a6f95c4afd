"""Semantic tests for the round-4 twelfth-wave operators — product-
quantization code assignment and PQ asymmetric-distance (ADC) top-k —
against an independent numpy oracle built from first principles (explicit
subvector argmin / LUT sums), not against the DuckDB SQL.
"""

from __future__ import annotations

import numpy as np

from google_maps_scraper_spark.operators.analytics import load
from google_maps_scraper_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    PQ_SUB,
    emb_pq_adc_topk,
    emb_pq_assign,
)

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = load(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    return {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}


def _py_codes(vecs):
    cents = np.stack([vecs[k] for k in range(1, PQ_K + 1)])
    codes = {}
    for vid, v in vecs.items():
        cs = []
        for m in range(PQ_M):
            lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
            d = ((cents[:, lo:hi] - v[lo:hi]) ** 2).sum(axis=1)
            cs.append(int(np.argmin(d)) + 1)  # numpy argmin: first min wins
        codes[vid] = cs
    return cents, codes


def test_pq_assign_matches_numpy(spark):
    vecs = _vectors(spark)
    _, codes = _py_codes(vecs)
    got = {
        r["vec_id"]: [r["code_1"], r["code_2"], r["code_3"], r["code_4"]]
        for r in emb_pq_assign(spark, SF).collect()
    }
    assert got == codes
    # packed code round-trips the four sub-codes
    for r in emb_pq_assign(spark, SF).collect():
        packed = r["pq_code"]
        unpacked = [
            packed // PQ_K**3 % PQ_K + 1,
            packed // PQ_K**2 % PQ_K + 1,
            packed // PQ_K % PQ_K + 1,
            packed % PQ_K + 1,
        ]
        assert unpacked == [r["code_1"], r["code_2"], r["code_3"], r["code_4"]]
        assert 0 <= packed < PQ_K**PQ_M


def test_pq_adc_topk_matches_numpy(spark):
    vecs = _vectors(spark)
    cents, codes = _py_codes(vecs)
    q = vecs[0]
    lut = np.stack(
        [
            ((cents[:, m * PQ_SUB:(m + 1) * PQ_SUB]
              - q[m * PQ_SUB:(m + 1) * PQ_SUB]) ** 2).sum(axis=1)
            for m in range(PQ_M)
        ]
    )
    adc = {
        vid: round(sum(lut[m][c - 1] for m, c in enumerate(cs)), 4)
        for vid, cs in codes.items()
        if vid != 0
    }
    expect = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    got = [
        (r["vec_id"], r["adc_r4"]) for r in emb_pq_adc_topk(spark, SF).collect()
    ]
    assert got == [(v, a) for v, a in expect]
    # ADC over own-vector codes is a lower-bound-ish proxy: the query's own
    # nearest codebook rows should rank well — sanity: all ADC values finite
    # and non-negative
    assert all(a >= 0 for _, a in got)
