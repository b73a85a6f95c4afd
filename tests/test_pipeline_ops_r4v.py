"""Semantic tests for the round-4 wave-v operators — Markov transition
matrix, per-window top-k event types, and shingle-level snapshot novelty —
against independent Python oracles (sorted-sequence replay, Counter
ranking, set-difference replay)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from datetime import timezone

from google_maps_scraper_spark.operators.analytics import (
    _TUMBLE_US,
    _WIN_TOPK,
    events_markov_transitions,
    events_windowed_topk_types,
    load,
)
from google_maps_scraper_spark.operators.dedup_docs import docs_shingle_novelty

SF = "/root/testdata/sf0.001"


def test_markov_transitions_match_python(spark):
    ev = (
        load(spark, SF, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for s in seqs.values():
        s.sort()
        types = [t for _, _, t in s] + ["END"]
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    n_from = Counter()
    for (a, _), c in trans.items():
        n_from[a] += c
    rows = events_markov_transitions(spark, SF).collect()
    got = {
        (r["event_type"], r["next_type"]): (
            r["n_transitions"],
            r["n_from"],
            r["p_permille"],
        )
        for r in rows
    }
    assert got == {
        k: (c, n_from[k[0]], c * 1000 // n_from[k[0]]) for k, c in trans.items()
    }
    # row sums equal event counts exactly (END is absorbing)
    assert sum(c for c, _, _ in got.values()) == len(ev)
    # permille normalization is consistent within each from-state
    per_from = defaultdict(int)
    for (a, _), (c, _, _) in got.items():
        per_from[a] += c
    assert all(per_from[a] == n_from[a] for a in per_from)


def test_windowed_topk_matches_python(spark):
    ev = load(spark, SF, "events").select("ts", "event_type").collect()
    cnt = Counter()
    for r in ev:
        # parquet ts is NTZ; the engine side casts with a UTC session TZ
        us = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        cnt[((us // _TUMBLE_US) * _TUMBLE_US, r["event_type"])] += 1
    by_win = defaultdict(list)
    for (w, t), c in cnt.items():
        by_win[w].append((t, c))
    expect = []
    for w in sorted(by_win):
        ranked = sorted(by_win[w], key=lambda tc: (-tc[1], tc[0]))[:_WIN_TOPK]
        for rk, (t, c) in enumerate(ranked, start=1):
            expect.append((w, t, c, rk))
    rows = events_windowed_topk_types(spark, SF).collect()
    got = [
        (r["win_start_us"], r["event_type"], r["n_events"], r["rk"])
        for r in rows
    ]
    assert got == expect
    assert len({w for w, _, _, _ in got}) > 1  # multiple windows exercised


def _shingles(text: str) -> set:
    words = re.split(r"\s+", text.lower().strip())
    top = max(len(words) - 3, 0)
    return {" ".join(words[i : i + 3]) for i in range(top + 1)}


def test_shingle_novelty_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    n = len(docs)
    old_shingles = set()
    for r in docs:
        if r["doc_id"] * 2 < n:
            old_shingles |= _shingles(r["text"])
    expect = {}
    for r in docs:
        if r["doc_id"] * 2 >= n:
            sh = _shingles(r["text"])
            novel = len(sh - old_shingles)
            expect[r["doc_id"]] = (len(sh), novel, novel * 1000 // len(sh))
    rows = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_permille"])
        for r in docs_shingle_novelty(spark, SF).collect()
    }
    assert rows == expect
    # both legs exercised: some sharing across halves, plenty of novelty
    vals = [p for _, _, p in rows.values()]
    assert max(vals) > 500
    assert any(nov < tot for tot, nov, _ in rows.values())
