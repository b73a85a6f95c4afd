"""Semantic tests for the round-4 seventh-wave operators — per-domain
quota capping, largest-remainder stratified sampling, the distributed
Bloom-filter build, and reciprocal-edge counting — each against an
independent sequential Python oracle (hashlib for the salted ranks, pure
set/bit arithmetic for the sketch and the graph).
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import load
from google_maps_scraper_spark.operators.graph import (
    EDGE_FANOUT,
    graph_reciprocal_edges,
)
from google_maps_scraper_spark.operators.sampling import (
    _BLOOM_BITS,
    _BLOOM_K,
    _BLOOM_WORD,
    _QUOTA_CAP,
    _STRAT_DENOM,
    docs_domain_quota_cap,
    docs_stratified_sample,
    seen_bloom_build,
)

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark):
    return [
        (r["doc_id"], r["lang"], r["source"], r["text"])
        for r in load(spark, SF, "documents")
        .select("doc_id", "lang", "source", "text")
        .collect()
    ]


def test_domain_quota_cap_matches_python(spark):
    docs = _docs(spark)
    by_src: dict = defaultdict(list)
    for doc_id, _, source, _ in docs:
        by_src[source].append(doc_id)
    expect = {}
    for source, ids in by_src.items():
        ids.sort(key=lambda i: (_md5(f"quota-v1:{i}"), i))
        for rk, doc_id in enumerate(ids[:_QUOTA_CAP], start=1):
            expect[doc_id] = (source, rk)
    got = {
        r["doc_id"]: (r["source"], r["rk"])
        for r in docs_domain_quota_cap(spark, SF).collect()
    }
    assert got == expect
    # the cap binds on this corpus (so the test exercises the filter)
    assert len(got) < len(docs)
    assert max(rk for _, rk in got.values()) == _QUOTA_CAP


def test_stratified_sample_matches_python_and_is_exact(spark):
    docs = _docs(spark)
    n = len(docs)
    target = n // _STRAT_DENOM
    counts = Counter(lang for _, lang, _, _ in docs)
    base = {l: counts[l] * target // n for l in counts}
    rem = {l: counts[l] * target % n for l in counts}
    leftover = target - sum(base.values())
    order = sorted(counts, key=lambda l: (-rem[l], l))
    quota = {
        l: base[l] + (1 if i < leftover else 0) for i, l in enumerate(order)
    }
    by_lang: dict = defaultdict(list)
    for doc_id, lang, _, _ in docs:
        by_lang[lang].append(doc_id)
    expect = {}
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (_md5(f"strat-v1:{i}"), i))
        for rk, doc_id in enumerate(ids[: quota[lang]], start=1):
            expect[doc_id] = (lang, rk)
    rows = docs_stratified_sample(spark, SF).collect()
    got = {r["doc_id"]: (r["lang"], r["rk"]) for r in rows}
    assert got == expect
    # largest-remainder allocation sums EXACTLY to the target
    assert len(got) == target
    got_per_lang = Counter(lang for lang, _ in got.values())
    assert dict(got_per_lang) == {l: q for l, q in quota.items() if q > 0}


def test_stratified_sample_is_stable_under_reexecution(spark):
    a = {r["doc_id"] for r in docs_stratified_sample(spark, SF).collect()}
    b = {r["doc_id"] for r in docs_stratified_sample(spark, SF).collect()}
    assert a == b


def test_bloom_build_matches_python_bit_for_bit(spark):
    docs = _docs(spark)
    words: dict = defaultdict(int)
    hits: dict = defaultdict(int)
    for _, _, _, text in docs:
        for j in range(_BLOOM_K):
            h = int(_md5(f"bloom-v1:{j}:{text}")[:8], 16) % _BLOOM_BITS
            words[h // _BLOOM_WORD] |= 1 << (h % _BLOOM_WORD)
            hits[h // _BLOOM_WORD] += 1
    rows = seen_bloom_build(spark, SF).collect()
    got = {r["word_idx"]: (r["bits"], r["n_hits"], r["n_set"]) for r in rows}
    expect = {
        w: (bits, hits[w], bin(bits).count("1")) for w, bits in words.items()
    }
    assert got == expect
    # membership holds: every inserted key probes positive on all k bits
    for _, _, _, text in docs[:25]:
        for j in range(_BLOOM_K):
            h = int(_md5(f"bloom-v1:{j}:{text}")[:8], 16) % _BLOOM_BITS
            assert got[h // _BLOOM_WORD][0] & (1 << (h % _BLOOM_WORD))


def test_reciprocal_edges_matches_python(spark):
    doc_ids = [
        r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()
    ]
    n = len(doc_ids)
    edges = set()
    for u in doc_ids:
        for j in range(EDGE_FANOUT):
            v = (u * (j + 2) + j) % n
            if v != u:
                edges.add((u, v))
    out_deg = Counter(s for s, _ in edges)
    recip = Counter(s for s, d in edges if (d, s) in edges)
    expect = {u: (out_deg[u], recip[u]) for u in out_deg}
    got = {
        r["node"]: (r["out_deg"], r["recip_n"])
        for r in graph_reciprocal_edges(spark, SF).collect()
    }
    assert got == expect
    # the derived graph is reciprocal-sparse but not degenerate
    assert 0 < sum(recip.values()) < len(edges)
