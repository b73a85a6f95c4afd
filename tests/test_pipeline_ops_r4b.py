"""Semantic tests for the round-4 second-wave pipeline operators: bucketed
range join, corpus line dedup, contamination check, PII scrub, nearest-rank
length quantiles, and duplicate-cluster connected components.

Each test checks the distributed implementation against an independent
sequential Python oracle (not the DuckDB SQL the driver gate runs — a bug
shared by both SQL formulations would slip through that gate; a Python
re-derivation will not).  The CC oracle is deliberately built from the
FULL clique graph (union-find over all docs sharing a line), while the
Spark side uses star edges — equality proves the star construction
preserves components.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from google_maps_scraper_spark.operators.analytics import (
    _BENCH_GRAM,
    _BENCH_MOD,
    _LINE_MIN_DOCS,
    _LINE_TOKS,
    _PII_EMAIL,
    _PII_PHONE,
    _QUANTILES,
    _RANGE_W_US,
    docs_contamination_check,
    docs_length_quantiles,
    docs_line_dedup,
    docs_pii_scrub,
    events_range_join_6h,
    load,
)
from google_maps_scraper_spark.operators.dedup_docs import (
    dedup_cluster_components,
)

SF = "/root/testdata/sf0.001"


def _doc_rows(spark):
    return [
        (r["doc_id"], r["text"], r["lang"])
        for r in load(spark, SF, "documents").collect()
    ]


def _lines_of(text: str) -> list[str]:
    toks = text.split(" ")
    return [
        " ".join(toks[i : i + _LINE_TOKS])
        for i in range(0, len(toks), _LINE_TOKS)
    ]


# =============================================================================
# Range join
# =============================================================================


def test_range_join_matches_bruteforce(spark):
    ev = [
        (r["event_id"], r["user_id"], r["ts"], r["event_type"])
        for r in load(spark, SF, "events").collect()
    ]
    purchases = [e for e in ev if e[3] == "purchase"]
    sources = [e for e in ev if e[3] in ("click", "view")]
    by_user: dict = {}
    for e in sources:
        by_user.setdefault(e[1], []).append(e[2])
    want = {}
    for eid, uid, ts, _ in purchases:
        n = 0
        for sts in by_user.get(uid, ()):
            gap = (ts - sts).total_seconds() * 1_000_000
            if 1 <= gap <= _RANGE_W_US:
                n += 1
        want[eid] = n
    got = {
        r["event_id"]: r["n_src"]
        for r in events_range_join_6h(spark, SF).collect()
    }
    assert got == want
    assert sum(want.values()) > 0  # the window actually catches sources


def test_range_join_plan_has_no_nested_loop(spark):
    """The bucketed decomposition must plan as an equi-join — the naive
    inequality formulation's BroadcastNestedLoopJoin is the thing this
    operator exists to avoid."""
    plan = (
        events_range_join_6h(spark, SF)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# =============================================================================
# Line dedup
# =============================================================================


def test_line_dedup_matches_sequential(spark):
    docs = _doc_rows(spark)
    freq: dict = {}
    for doc_id, text, _ in docs:
        for line in set(_lines_of(text)):
            freq[line] = freq.get(line, 0) + 1
    dup = {line for line, n in freq.items() if n >= _LINE_MIN_DOCS}
    want = {}
    for doc_id, text, _ in docs:
        lines = _lines_of(text)
        kept = [l for l in lines if l not in dup]
        want[doc_id] = (" ".join(kept), len(kept), len(lines) - len(kept))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in docs_line_dedup(spark, SF).collect()
    }
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # boilerplate really dropped


# =============================================================================
# Contamination check
# =============================================================================


def test_contamination_matches_sequential(spark):
    docs = _doc_rows(spark)
    bench = {
        doc_id: " ".join(text.split(" ")[:_BENCH_GRAM])
        for doc_id, text, _ in docs
        if doc_id % _BENCH_MOD == 0 and len(text.split(" ")) >= _BENCH_GRAM
    }
    want = {}
    for doc_id, text, _ in docs:
        padded = f" {text} "
        n = sum(1 for g in bench.values() if f" {g} " in padded)
        if n:
            want[doc_id] = n
    got = {
        r["doc_id"]: r["n_bench_hits"]
        for r in docs_contamination_check(spark, SF).collect()
    }
    assert got == want
    assert len(want) >= len(bench)  # at least the self-matches


def test_contamination_plan_broadcasts_bench(spark):
    """The benchmark gram set must broadcast into the corpus-gram join —
    shuffling exploded corpus grams against a few-row dimension would be
    the wrong plan at any scale."""
    plan = (
        docs_contamination_check(spark, SF)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# =============================================================================
# PII scrub
# =============================================================================


def test_pii_scrub_matches_re(spark):
    docs = _doc_rows(spark)
    want = {}
    for doc_id, text, _ in docs:
        t = (
            f"{text} contact user{doc_id}@mail.example.com or call"
            f" +1-555-01{doc_id % 100:02d} now"
        )
        scrubbed = re.sub(_PII_EMAIL, "<EMAIL>", t)
        scrubbed = re.sub(_PII_PHONE, "<PHONE>", scrubbed)
        want[doc_id] = (
            scrubbed,
            len(re.findall(_PII_EMAIL, t)),
            len(re.findall(_PII_PHONE, t)),
        )
    got = {
        r["doc_id"]: (r["scrubbed"], r["n_emails"], r["n_phones"])
        for r in docs_pii_scrub(spark, SF).collect()
    }
    assert got == want
    assert all(v[1] >= 1 and v[2] >= 1 for v in want.values())
    assert all("@" not in v[0] for v in want.values())


# =============================================================================
# Length quantiles
# =============================================================================


def test_length_quantiles_nearest_rank(spark):
    docs = _doc_rows(spark)
    by_lang: dict = {}
    for doc_id, text, lang in docs:
        by_lang.setdefault(lang, []).append((len(text.split(" ")), doc_id))
    want = {}
    for lang, pairs in by_lang.items():
        pairs.sort()
        n = len(pairs)
        row = tuple(
            pairs[(num * n + den - 1) // den - 1][0]
            for _, num, den in _QUANTILES
        ) + (n,)
        want[lang] = row
    got = {
        r["lang"]: (r["p50"], r["p90"], r["p99"], r["n_docs"])
        for r in docs_length_quantiles(spark, SF).collect()
    }
    assert got == want


# =============================================================================
# Connected components
# =============================================================================


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


def test_cluster_components_match_clique_union_find(spark):
    docs = _doc_rows(spark)
    by_line: dict = {}
    for doc_id, text, _ in docs:
        for line in set(_lines_of(text)):
            by_line.setdefault(line, []).append(doc_id)
    uf = _UF()
    for doc_id, _, _ in docs:
        uf.find(doc_id)
    for members in by_line.values():
        for other in members[1:]:
            uf.union(members[0], other)  # clique ≡ star-to-first for CC
    # canonical min per component
    comp: dict = {}
    for doc_id, _, _ in docs:
        root = uf.find(doc_id)
        comp.setdefault(root, []).append(doc_id)
    want = {}
    for members in comp.values():
        m = min(members)
        for d in members:
            want[d] = m
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_cluster_components(spark, SF).collect()
    }
    assert got == want
    # the corpus carries real multi-doc clusters (not just singletons)
    sizes = {}
    for c in want.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert max(sizes.values()) >= 3
