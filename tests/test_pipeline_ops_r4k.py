"""Semantic tests for the round-4 tenth-wave operators — anchor-text link
inversion, one HITS iteration, per-host fetch-slot scheduling, and the
two-snapshot recrawl diff — each against an independent sequential Python
oracle built from first principles (dict/Counter arithmetic).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import load
from google_maps_scraper_spark.operators.frontier import (
    _SCHED_DELAY_BASE,
    _SCHED_HOSTS,
    frontier_fetch_slot_schedule,
    frontier_recrawl_diff,
)
from google_maps_scraper_spark.operators.graph import (
    _ANCHOR_MOD,
    EDGE_FANOUT,
    graph_anchor_text_inversion,
    graph_hits_1iter,
)

SF = "/root/testdata/sf0.001"


def _edges(spark):
    ids = sorted(
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    n = len(ids)
    e = set()
    for u in ids:
        for j in range(EDGE_FANOUT):
            v = (u * (j + 2) + j) % n
            if v != u:
                e.add((u, v))
    return ids, e


def test_anchor_text_inversion_matches_python(spark):
    _, e = _edges(spark)
    inlinks: Counter = Counter()
    anchors = defaultdict(set)
    for u, v in e:
        inlinks[v] += 1
        anchors[v].add(f"kw{(u + v) % _ANCHOR_MOD}")
    got = {
        r["doc_id"]: (r["n_inlinks"], r["n_anchors"], r["anchors"])
        for r in graph_anchor_text_inversion(spark, SF).collect()
    }
    expect = {
        v: (inlinks[v], len(anchors[v]), " ".join(sorted(anchors[v])))
        for v in inlinks
    }
    assert got == expect
    # every page's anchor set is covered by the synthetic vocabulary
    assert all(n <= _ANCHOR_MOD for _, n, _ in got.values())


def test_hits_1iter_matches_python(spark):
    ids, e = _edges(spark)
    auth: Counter = Counter()
    for _, v in e:
        auth[v] += 1
    hub: Counter = Counter()
    for u, v in e:
        hub[u] += auth[v]
    got = {
        r["doc_id"]: (r["auth"], r["hub"])
        for r in graph_hits_1iter(spark, SF).collect()
    }
    assert got == {i: (auth[i], hub[i]) for i in ids}
    # the aggregate identity Σ hub = Σ auth² holds for the 1st iteration
    assert sum(h for _, h in got.values()) == sum(a * a for a in auth.values())


def test_fetch_slot_schedule_matches_python(spark):
    ids = sorted(
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    by_host = defaultdict(list)
    for i in ids:
        by_host[i % _SCHED_HOSTS].append(i)
    expect = {}
    for h, docs in by_host.items():
        delay = _SCHED_DELAY_BASE * (1 + h % 5)
        for slot, i in enumerate(sorted(docs, key=lambda d: (d % 5, d))):
            expect[i] = (f"site-{h}.com", i % 5, slot, slot * delay)
    got = {
        r["doc_id"]: (r["host"], r["priority"], r["slot"], r["fetch_at_ms"])
        for r in frontier_fetch_slot_schedule(spark, SF).collect()
    }
    assert got == expect
    # politeness invariant: consecutive slots on one host are >= delay apart
    per_host = defaultdict(list)
    for host, _, slot, at in got.values():
        per_host[host].append((slot, at))
    for host, slots in per_host.items():
        delay = _SCHED_DELAY_BASE * (1 + int(host.split("-")[1].split(".")[0]) % 5)
        for (s1, t1), (s2, t2) in zip(sorted(slots), sorted(slots)[1:]):
            assert s2 == s1 + 1 and t2 - t1 == delay


def test_recrawl_diff_matches_python(spark):
    ids = sorted(
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    expect = {}
    for i in ids:
        in_a, in_b = i % 10 != 0, i % 7 != 0
        if not in_a and not in_b:
            continue
        if not in_a:
            expect[i] = "added"
        elif not in_b:
            expect[i] = "removed"
        else:
            expect[i] = "changed" if i % 3 == 0 else "same"
    got = {
        r["doc_id"]: r["verdict"]
        for r in frontier_recrawl_diff(spark, SF).collect()
    }
    assert got == expect
    # all four verdicts occur at this scale
    assert set(got.values()) == {"added", "removed", "changed", "same"}
