"""Semantic tests for the round-4 ninth-wave operators — Count-Min sketch
build, skew-salted two-stage rollup, and CCNet rarity terciles — each
against an independent sequential Python oracle (hashlib + Counter).
"""

from __future__ import annotations

import hashlib
from collections import Counter

from google_maps_scraper_spark.operators.analytics import load
from google_maps_scraper_spark.operators.sampling import (
    _CMS_COLS,
    _CMS_ROWS,
    _RARITY_SCALE,
    docs_ccnet_rarity_bucket,
    events_cms_build,
    events_salted_rollup,
)

SF = "/root/testdata/sf0.001"


def _md5_fold(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_cms_build_matches_python_and_overestimates(spark):
    users = [
        r["user_id"]
        for r in load(spark, SF, "events").select("user_id").collect()
    ]
    cells: Counter = Counter()
    for u in users:
        for r in range(_CMS_ROWS):
            cells[(r, _md5_fold(f"cms-v1:{r}:{u}") % _CMS_COLS)] += 1
    got = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in events_cms_build(spark, SF).collect()
    }
    assert got == dict(cells)
    # every row of the sketch holds the full stream count
    for r in range(_CMS_ROWS):
        assert sum(c for (rr, _), c in got.items() if rr == r) == len(users)
    # CMS guarantee: the point estimate min_r cnt[r][h_r(u)] >= true count
    true = Counter(users)
    for u in list(true)[:50]:
        est = min(
            got[(r, _md5_fold(f"cms-v1:{r}:{u}") % _CMS_COLS)]
            for r in range(_CMS_ROWS)
        )
        assert est >= true[u]


def test_salted_rollup_equals_plain_groupby(spark):
    rows = load(spark, SF, "events").select("event_type", "event_id").collect()
    n: Counter = Counter()
    s: Counter = Counter()
    for r in rows:
        n[r["event_type"]] += 1
        s[r["event_type"]] += r["event_id"]
    got = {
        r["event_type"]: (r["n_events"], r["sum_ids"])
        for r in events_salted_rollup(spark, SF).collect()
    }
    assert got == {t: (n[t], s[t]) for t in n}


def test_ccnet_rarity_bucket_matches_python(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents").select("doc_id", "text").collect()
    }
    vocab: Counter = Counter()
    toks = {}
    for doc_id, text in docs.items():
        ts = [t for t in text.strip().split() if t]
        toks[doc_id] = ts
        vocab.update(ts)
    keys = {
        doc_id: sum(vocab[t] for t in ts) * _RARITY_SCALE // len(ts)
        for doc_id, ts in toks.items()
        if ts
    }
    order = sorted(keys, key=lambda d: (keys[d], d))
    n = len(order)
    expect = {}
    for i, doc_id in enumerate(order):
        b = i * 3 // n
        expect[doc_id] = (keys[doc_id], ("head", "middle", "tail")[b])
    got = {
        r["doc_id"]: (r["rarity_key"], r["bucket"])
        for r in docs_ccnet_rarity_bucket(spark, SF).collect()
    }
    assert got == expect
    # terciles are balanced to within one document
    sizes = Counter(b for _, b in got.values())
    assert max(sizes.values()) - min(sizes.values()) <= 1
