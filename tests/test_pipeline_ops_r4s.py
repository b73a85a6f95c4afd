"""Semantic tests for the round-4 wave-s operators — char-trigram language
profiles, incremental Bloom dedup with false-positive accounting, and the
perceptual image average-hash — against independent Python oracles
(Counter profiles, hashlib Bloom replay, md5-thumbnail bit packing)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _TRIGRAM_TOPK,
    docs_char_trigram_lang_profile,
    load,
    multimodal_image_ahash,
)
from google_maps_scraper_spark.operators.dedup_docs import (
    _IBLOOM_BITS,
    _IBLOOM_K,
    docs_incremental_bloom_dedup,
)

SF = "/root/testdata/sf0.001"


def test_char_trigram_profile_matches_python(spark):
    docs = load(spark, SF, "documents").select("lang", "text").collect()
    counts = defaultdict(Counter)
    for r in docs:
        t = r["text"].lower()
        for i in range(max(len(t) - 2, 0)):
            counts[r["lang"]][t[i : i + 3]] += 1
    expect = {}
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_TRIGRAM_TOPK]
        expect[lang] = [(tri, n, i + 1) for i, (tri, n) in enumerate(top)]
    rows = docs_char_trigram_lang_profile(spark, SF).collect()
    got = defaultdict(list)
    for r in rows:
        got[r["lang"]].append((r["tri"], r["cnt"], r["rk"]))
    assert dict(got) == expect
    assert all(len(v) == _TRIGRAM_TOPK for v in expect.values())


def _fold(salt: str, j: int, text: str) -> int:
    return (
        int(hashlib.md5(f"{salt}{j}:{text}".encode()).hexdigest()[:8], 16)
        % _IBLOOM_BITS
    )


def test_incremental_bloom_dedup_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    n = len(docs)
    old = {r["doc_id"]: r["text"] for r in docs if r["doc_id"] * 2 < n}
    new = {r["doc_id"]: r["text"] for r in docs if r["doc_id"] * 2 >= n}
    bits = set()
    for t in old.values():
        for j in range(_IBLOOM_K):
            bits.add(_fold("ibloom-v1:", j, t))
    old_texts = set(old.values())
    expect = {}
    for i, t in new.items():
        hit = all(_fold("ibloom-v1:", j, t) in bits for j in range(_IBLOOM_K))
        dup = t in old_texts
        expect[i] = (hit, dup, hit and not dup)
    rows = docs_incremental_bloom_dedup(spark, SF).collect()
    got = {
        r["doc_id"]: (r["bloom_hit"], r["exact_dup"], r["false_positive"])
        for r in rows
    }
    assert got == expect
    assert set(got) == set(new)
    # soundness: an exact duplicate can never miss the Bloom filter
    for hit, dup, _ in got.values():
        assert not (dup and not hit)
    # testdata texts are unique, so every Bloom hit here IS a false
    # positive — the column the operator exists to surface; assert the
    # sketch's error leg is actually exercised and correctly attributed
    assert all(not dup for _, dup, _fp in got.values())
    assert sum(1 for _, _, fp in got.values() if fp) > 0


def _ahash_py(doc_id: int):
    px = []
    for k in range(4):
        px += list(hashlib.md5(f"ahash-v1:{doc_id}:{k}".encode()).digest())
    total = sum(px)
    hi = sum(1 << (31 - i) for i in range(32) if px[i] * 64 > total)
    lo = sum(1 << (63 - i) for i in range(32, 64) if px[i] * 64 > total)
    n_set = sum(1 for p in px if p * 64 > total)
    return hi, lo, n_set


def test_image_ahash_matches_python(spark):
    rows = multimodal_image_ahash(spark, SF).collect()
    assert rows
    for r in rows:
        hi, lo, n_set = _ahash_py(r["doc_id"])
        assert (r["ahash_hi"], r["ahash_lo"], r["n_set"]) == (hi, lo, n_set)
    # random thumbnails: roughly half the bits set, never degenerate
    for r in rows:
        assert 8 <= r["n_set"] <= 56
