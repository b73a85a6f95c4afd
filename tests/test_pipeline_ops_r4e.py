"""Semantic tests for the round-4 fifth-wave operators: dedup survivor
selection and tumbling-window event rates — each against an independent
sequential Python oracle.
"""

from __future__ import annotations

import calendar
from collections import Counter

from google_maps_scraper_spark.operators.analytics import (
    _TUMBLE_US,
    events_windowed_rates,
    load,
)
from google_maps_scraper_spark.operators.dedup_docs import (
    _CC_LINE_TOKS,
    docs_dedup_keep_canonical,
)

SF = "/root/testdata/sf0.001"


class _UF:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_dedup_keep_canonical_matches_union_find(spark):
    docs = [
        (r["doc_id"], r["text"]) for r in load(spark, SF, "documents").collect()
    ]
    by_line: dict = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        lines = {
            " ".join(toks[i : i + _CC_LINE_TOKS])
            for i in range(0, len(toks), _CC_LINE_TOKS)
        }
        for line in lines:
            by_line.setdefault(line, []).append(doc_id)
    uf = _UF()
    for doc_id, _ in docs:
        uf.find(doc_id)
    for members in by_line.values():
        for other in members[1:]:
            uf.union(members[0], other)
    comp: dict = {}
    for doc_id, _ in docs:
        comp.setdefault(uf.find(doc_id), []).append(doc_id)
    want = {}
    for members in comp.values():
        m = min(members)
        for d in members:
            want[d] = (m, len(members), d == m)
    got = {
        r["doc_id"]: (r["cluster_id"], r["n_cluster"], r["is_canonical"])
        for r in docs_dedup_keep_canonical(spark, SF).collect()
    }
    assert got == want
    # survivor rule: exactly one canonical per cluster, and it IS the min
    canon = [d for d, v in want.items() if v[2]]
    assert len(canon) == len(comp)
    # real dedup happened: fewer survivors than documents
    assert len(canon) < len(want)


def test_windowed_rates_match_sequential(spark):
    ev = [
        (r["ts"], r["event_type"], r["user_id"])
        for r in load(spark, SF, "events").collect()
    ]

    def us(ts):
        return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond

    n_events = Counter()
    users: dict = {}
    for ts, et, uid in ev:
        w = (us(ts) // _TUMBLE_US) * _TUMBLE_US
        n_events[(w, et)] += 1
        users.setdefault((w, et), set()).add(uid)
    got = {
        (r["win_start_us"], r["event_type"]): (r["n_events"], r["n_users"])
        for r in events_windowed_rates(spark, SF).collect()
    }
    want = {k: (n, len(users[k])) for k, n in n_events.items()}
    assert got == want
    # windows are epoch-aligned 6-hour boundaries
    assert all(w % _TUMBLE_US == 0 for w, _ in want)
    # and the corpus spans many windows
    assert len({w for w, _ in want}) > 5
