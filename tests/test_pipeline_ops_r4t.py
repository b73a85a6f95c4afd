"""Semantic tests for the round-4 wave-t operators — HLL register merge +
integer estimate, the inverted-index postings build, and per-source
template-shingle detection — against independent Python oracles (hashlib
HLL replay, Counter postings, set-based shingle census)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _HLLM_M,
    _HLLM_NUMER,
    _HLLM_W,
    _POSTINGS_HEAD,
    docs_inverted_index_postings,
    events_hll_merge_estimate,
    load,
)
from google_maps_scraper_spark.operators.dedup_docs import (
    _TPL_MIN_DOCS,
    docs_source_template_shingles,
)

SF = "/root/testdata/sf0.001"


def _hllm_hash(user_id) -> int:
    return int(hashlib.md5(f"hllm-v1:{user_id}".encode()).hexdigest()[:7], 16)


def _rank(rest: int) -> int:
    return _HLLM_W + 1 if rest == 0 else _HLLM_W + 1 - rest.bit_length()


def _estimate(regs: dict) -> int:
    s2 = sum(1 << (_HLLM_W + 1 - r) for r in regs.values())
    s2 += (_HLLM_M - len(regs)) * (1 << (_HLLM_W + 1))
    return (2 * _HLLM_NUMER) // (1000 * s2)


def test_hll_merge_estimate_matches_python(spark):
    ev = load(spark, SF, "events").select("event_type", "user_id").collect()
    regs = defaultdict(dict)  # event_type -> bucket -> max rank
    users = defaultdict(set)
    for r in ev:
        h = _hllm_hash(r["user_id"])
        b, rest = h % _HLLM_M, h // _HLLM_M
        rk = _rank(rest)
        for key in (r["event_type"], "ALL"):
            if rk > regs[key].get(b, 0):
                regs[key][b] = rk
            users[key].add(r["user_id"])
    rows = {r["event_type"]: r for r in events_hll_merge_estimate(spark, SF).collect()}
    assert set(rows) == set(regs)
    for k, reg in regs.items():
        est, exact = _estimate(reg), len(users[k])
        r = rows[k]
        assert r["est"] == est
        assert r["exact_users"] == exact
        assert r["err_permille"] == abs(est - exact) * 1000 // exact
        assert r["n_buckets_set"] == len(reg)
    # mergeability actually exercised: the ALL sketch is the bucket-wise max
    all_row = rows["ALL"]
    assert all_row["n_buckets_set"] == len(regs["ALL"])
    assert all(
        regs["ALL"][b] == max(regs[t].get(b, 0) for t in regs if t != "ALL")
        for b in regs["ALL"]
    )
    # sketch accuracy sanity at this n/m (biased-high raw regime): within 2x
    assert 0 < all_row["est"] < 2 * all_row["exact_users"] + _HLLM_M


def test_inverted_index_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    cf, df_post = Counter(), defaultdict(Counter)
    for r in docs:
        for w in r["text"].lower().strip().split(" "):
            if w:
                cf[w] += 1
                df_post[w][r["doc_id"]] += 1
    rows = {r["term"]: r for r in docs_inverted_index_postings(spark, SF).collect()}
    assert set(rows) == set(cf)
    for term, r in rows.items():
        postings = sorted(df_post[term])
        assert r["df"] == len(postings)
        assert r["cf"] == cf[term]
        assert r["postings_head"] == "|".join(
            str(d) for d in postings[:_POSTINGS_HEAD]
        )
    # the head cap is actually load-bearing on this corpus
    assert any(r["df"] > _POSTINGS_HEAD for r in rows.values())


def _shingles(text: str) -> set:
    words = re.split(r"\s+", text.lower().strip())
    top = max(len(words) - 3, 0)  # == Spark's sequence(0, greatest(size-3, 0))
    return {" ".join(words[i : i + 3]) for i in range(top + 1)}


def test_source_template_shingles_matches_python(spark):
    docs = (
        load(spark, SF, "documents").select("doc_id", "source", "text").collect()
    )
    per_doc = {r["doc_id"]: (r["source"], _shingles(r["text"])) for r in docs}
    census = defaultdict(Counter)
    for src, sh in per_doc.values():
        for s in sh:
            census[src][s] += 1
    tpl = {
        src: {s for s, c in cnt.items() if c >= _TPL_MIN_DOCS}
        for src, cnt in census.items()
    }
    rows = {r["doc_id"]: r for r in docs_source_template_shingles(spark, SF).collect()}
    assert set(rows) == set(per_doc)
    n_hits = 0
    for doc_id, (src, sh) in per_doc.items():
        r = rows[doc_id]
        n_t = len(sh & tpl[src])
        assert r["n_shingles"] == len(sh)
        assert r["n_template"] == n_t
        assert r["tpl_permille"] == n_t * 1000 // len(sh)
        assert r["has_template"] == (n_t > 0)
        n_hits += n_t
    # the census threshold is actually exercised on this corpus
    assert n_hits > 0
