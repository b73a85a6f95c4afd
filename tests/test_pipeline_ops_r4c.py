"""Semantic tests for the round-4 third-wave pipeline operators: TF-IDF
keyword extraction, unigram-LM rarity statistics, ordered-funnel conversion,
and the top-bigram repetition signal.

Each test re-derives the expected result with an independent sequential
Python oracle (not the DuckDB SQL the driver gate runs — a bug shared by
both SQL formulations would slip through that gate; a Python re-derivation
will not).
"""

from __future__ import annotations

import datetime
from collections import Counter

from google_maps_scraper_spark.operators.analytics import (
    _FUNNEL_GAP_H,
    _TFIDF_K,
    docs_tfidf_topk,
    docs_top_bigram_share,
    docs_unigram_lm_rarity,
    events_funnel_conversion,
    load,
)

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    return {
        r["doc_id"]: [t for t in r["text"].strip().split() if t]
        for r in load(spark, SF, "documents").collect()
    }


def test_tfidf_topk_matches_sequential(spark):
    toks = _doc_tokens(spark)
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    want = {}
    for d, c in tf.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))
        for rk, (tok, n) in enumerate(ranked[:_TFIDF_K], start=1):
            want[(d, rk)] = (tok, n, df[tok])
    got = {
        (r["doc_id"], r["rk"]): (r["token"], r["tf"], r["df"])
        for r in docs_tfidf_topk(spark, SF).collect()
    }
    assert got == want
    # a meaningful ranking: some doc's top term beats its #2 by count
    assert any(
        want[(d, 1)][1] > want[(d, 2)][1] for d, rk in want if rk == 1
        if (d, 2) in want
    )


def test_unigram_lm_rarity_matches_sequential(spark):
    toks = _doc_tokens(spark)
    vocab = Counter()
    for ts in toks.values():
        vocab.update(ts)
    want = {
        d: (len(ts), sum(vocab[t] for t in ts), min(vocab[t] for t in ts))
        for d, ts in toks.items()
        if ts
    }
    got = {
        r["doc_id"]: (r["n_tok"], r["sum_tok_freq"], r["min_tok_freq"])
        for r in docs_unigram_lm_rarity(spark, SF).collect()
    }
    assert got == want
    # rarity varies across the corpus (the filter signal is non-trivial)
    assert len({v[2] for v in want.values()}) > 1


def test_funnel_conversion_matches_sequential(spark):
    ev = [
        (r["user_id"], r["ts"], r["event_type"])
        for r in load(spark, SF, "events").collect()
    ]
    gap = datetime.timedelta(hours=_FUNNEL_GAP_H)
    by_user: dict = {}
    for uid, ts, et in ev:
        by_user.setdefault(uid, []).append((ts, et))
    want = {}
    for uid, rows in by_user.items():
        views = [ts for ts, et in rows if et == "view"]
        t1 = min(views) if views else None
        t2 = None
        if t1 is not None:
            clicks = [
                ts for ts, et in rows
                if et == "click" and t1 < ts <= t1 + gap
            ]
            t2 = min(clicks) if clicks else None
        t3 = None
        if t2 is not None:
            buys = [
                ts for ts, et in rows
                if et == "purchase" and t2 < ts <= t2 + gap
            ]
            t3 = min(buys) if buys else None
        depth = 3 if t3 else 2 if t2 else 1 if t1 else 0
        want[uid] = (t1, t2, t3, depth)
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"], r["funnel_depth"])
        for r in events_funnel_conversion(spark, SF).collect()
    }
    assert got == want
    # the step window actually discriminates: >1 distinct depth reached
    assert len({v[3] for v in want.values()}) > 1


def test_top_bigram_share_matches_sequential(spark):
    toks = _doc_tokens(spark)
    want = {}
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        c = Counter(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        bg, n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        want[d] = (len(ts) - 1, bg, n)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["top_bigram"], r["top_bigram_n"])
        for r in docs_top_bigram_share(spark, SF).collect()
    }
    assert got == want
    # repetition exists in the corpus (some doc repeats a bigram)
    assert any(v[2] >= 2 for v in want.values())
