"""Semantic tests for the round-4 wave-z operators — span-level
cross-document duplication (stats + pairs) and DSIR hashed-feature
importance bits — against independent Python replays (dict-census span
walk, diagonal-island scan, hashlib bucket LM)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _DSIR_Q,
    _DSIR_TARGET_LANG,
    docs_dsir_hashed_importance,
    load,
)
from google_maps_scraper_spark.operators.dedup_docs import (
    _SPAN_K,
    _SPAN_MIN_RUN,
    _SPAN_OCC_CAP,
    docs_dup_span_pairs,
    docs_dup_span_stats,
)

SF = "/root/testdata/sf0.001"


def _pos_kgrams_py(text: str, k: int = _SPAN_K) -> list[tuple[int, str]]:
    words = re.split(r"\s+", text.strip().lower())
    n = max(len(words) - (k - 1), 1)
    return [(i, " ".join(words[i - 1 : i - 1 + k])) for i in range(1, n + 1)]


def _load_kgrams(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    return {r["doc_id"]: _pos_kgrams_py(r["text"]) for r in docs}


def _max_run(positions: list[int]) -> int:
    best = cur = 0
    prev = -2
    for p in sorted(positions):
        cur = cur + 1 if p == prev + 1 else 1
        best = max(best, cur)
        prev = p
    return best


def test_dup_span_stats_matches_python(spark):
    kgs = _load_kgrams(spark)
    docs_per_gram = defaultdict(set)
    for d, pgs in kgs.items():
        for _, g in pgs:
            docs_per_gram[g].add(d)
    dup = {g for g, ds in docs_per_gram.items() if len(ds) >= 2}

    got = {r["doc_id"]: r for r in docs_dup_span_stats(spark, SF).collect()}
    assert set(got) == set(kgs)
    saw_dup = saw_run2 = False
    for d, pgs in kgs.items():
        dps = [p for p, g in pgs if g in dup]
        r = got[d]
        assert r["n_kgrams"] == len(pgs)
        assert r["n_dup_pos"] == len(dps)
        assert r["max_dup_run"] == _max_run(dps)
        assert r["dup_permille"] == len(dps) * 1000 // len(pgs)
        saw_dup |= bool(dps)
        saw_run2 |= _max_run(dps) >= 2
    assert saw_dup and saw_run2  # fixture corpus must exercise both paths


def test_dup_span_pairs_matches_python(spark):
    kgs = _load_kgrams(spark)
    occs = defaultdict(list)  # gram -> [(doc, pos)]
    for d, pgs in kgs.items():
        for p, g in pgs:
            occs[g].append((d, p))
    rare = {
        g
        for g, o in occs.items()
        if len({d for d, _ in o}) >= 2 and len(o) <= _SPAN_OCC_CAP
    }
    diag = defaultdict(set)  # (a, b, diag) -> {pa}
    for g in rare:
        o = occs[g]
        for da, pa in o:
            for db, pb in o:
                if da < db:
                    diag[(da, db, pa - pb)].add(pa)
    per_pair = defaultdict(list)  # (a, b) -> [run, ...]
    for (da, db, _), pas in diag.items():
        ps = sorted(pas)
        run, prev = 0, None
        for p in ps:
            if prev is not None and p == prev + 1:
                run += 1
            else:
                if run:
                    per_pair[(da, db)].append(run)
                run = 1
            prev = p
        per_pair[(da, db)].append(run)
    want = {
        pair: (max(runs), len(runs))
        for pair, runs in per_pair.items()
        if max(runs) >= _SPAN_MIN_RUN
    }

    rows = docs_dup_span_pairs(spark, SF).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert set(got) == set(want)
    assert len(want) > 0  # corpus must produce shared spans
    for pair, (mx, nruns) in want.items():
        r = got[pair]
        assert r["max_run_kgrams"] == mx
        assert r["span_tokens"] == mx + _SPAN_K - 1
        assert r["n_runs"] == nruns


def test_dsir_hashed_importance_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "lang", "text").collect()
    tok = []  # (doc_id, lang, bucket)
    for r in docs:
        for t in re.split(r"\s+", r["text"].strip()):
            if t:
                b = int(hashlib.md5(t.encode()).hexdigest()[:2], 16)
                tok.append((r["doc_id"], r["lang"], b))
    t_cnt, r_cnt = Counter(), Counter()
    for _, lang, b in tok:
        r_cnt[b] += 1
        if lang == _DSIR_TARGET_LANG:
            t_cnt[b] += 1
    base = sum(t_cnt.values()) * _DSIR_Q // sum(r_cnt.values())

    want = defaultdict(lambda: [0, 0])  # doc -> [n_tok, score_q20]
    for d, _, b in tok:
        w = want[d]
        w[0] += 1
        w[1] += t_cnt[b] * _DSIR_Q // r_cnt[b]

    got = {
        r["doc_id"]: r for r in docs_dsir_hashed_importance(spark, SF).collect()
    }
    assert set(got) == set(want)
    for d, (n, sc) in want.items():
        r = got[d]
        assert (r["n_tok"], r["score_q20"]) == (n, sc)
        assert r["mean_q20"] == sc // n
        assert r["is_target_like"] == (sc // n > base)
    # the importance weight must actually discriminate: target-language docs
    # must be target-like far more often than the rest (directional sanity)
    en = {r["doc_id"] for r in docs if r["lang"] == _DSIR_TARGET_LANG}
    en_rate = sum(1 for d in en if got[d]["is_target_like"]) / len(en)
    other = [d for d in want if d not in en]
    other_rate = sum(1 for d in other if got[d]["is_target_like"]) / len(other)
    assert en_rate > other_rate + 0.15
    assert 0 < sum(1 for d in want if got[d]["is_target_like"]) < len(want)
