"""Semantic tests for the round-4 wave-aa operators — SemDeDup semantic
pruning, Poisson recrawl scheduling, and bigram-LM scoring — against
independent Python replays (numpy cell argmax + pairwise cosine, integer
visit-hash binomials, Counter bigram censuses)."""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from google_maps_scraper_spark.operators.analytics import (
    docs_bigram_lm_stats,
    load,
)
from google_maps_scraper_spark.operators.frontier import (
    _RECRAWL_VISITS,
    frontier_recrawl_poisson,
)
from google_maps_scraper_spark.operators.similarity import (
    _SEMDEDUP_TAU,
    N_CELLS,
    emb_semdedup_prune,
)

SF = "/root/testdata/sf0.001"


def _round3(x: float) -> float:
    """Spark F.round / DuckDB ROUND are HALF_UP on doubles; Python's
    built-in round is half-even — replay with the engines' rule."""
    return float(Decimal(repr(x)).quantize(Decimal("0.001"), ROUND_HALF_UP))


def test_semdedup_prune_matches_python(spark):
    rows = (
        load(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    )
    emb = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    cents = [emb[i] for i in range(1, N_CELLS + 1)]
    cnorm = [math.sqrt(sum(v * v for v in c)) for c in cents]

    def cell(e: list[float]) -> int:
        scores = [
            sum(a * b for a, b in zip(e, c)) / n for c, n in zip(cents, cnorm)
        ]
        return scores.index(max(scores)) + 1  # ties to the lowest cell id

    cells: dict[int, int] = {vid: cell(e) for vid, e in emb.items()}

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    by_cell: dict[int, list[int]] = {}
    for vid, c in sorted(cells.items()):
        by_cell.setdefault(c, []).append(vid)
    dropped = set()
    for members in by_cell.values():
        for i, a in enumerate(members):
            for b in members[:i]:
                if _round3(cos(emb[a], emb[b])) >= _SEMDEDUP_TAU:
                    dropped.add(a)
                    break

    got = {r["vec_id"]: r for r in emb_semdedup_prune(spark, SF).collect()}
    assert set(got) == set(emb)
    for vid, r in got.items():
        assert r["cell"] == cells[vid], vid
        assert r["is_kept"] == (vid not in dropped), vid
    # the fixture corpus must exercise both outcomes
    assert dropped and len(dropped) < len(emb)
    # keep-lowest-id rule: the minimum vec_id of any cell can never drop
    assert all(min(m) not in dropped for m in by_cell.values())


def test_recrawl_poisson_matches_python(spark):
    doc_ids = [
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    ]
    changes = {
        d: sum(
            1
            for v in range(1, _RECRAWL_VISITS + 1)
            if (d * 2654435761 + v * 40503) % 97 < 25
        )
        for d in doc_ids
    }
    order = sorted(doc_ids, key=lambda d: (-changes[d], d))
    rank = {d: i + 1 for i, d in enumerate(order)}

    got = {r["doc_id"]: r for r in frontier_recrawl_poisson(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    buckets = set()
    for d, r in got.items():
        x = changes[d]
        assert r["n_visits"] == _RECRAWL_VISITS
        assert r["n_changes"] == x
        assert r["recrawl_rank"] == rank[d]
        want = "hot" if x >= 3 else ("warm" if x >= 1 else "cold")
        assert r["due_bucket"] == want
        buckets.add(want)
    assert buckets == {"hot", "warm", "cold"}
    # the integer rank IS the Poisson priority order: λ̂ = −ln((n−X+.5)/(n+.5))
    # is strictly increasing in X, so rank order must agree with λ̂ order
    lam = {
        d: -math.log(
            (_RECRAWL_VISITS - x + 0.5) / (_RECRAWL_VISITS + 0.5)
        )
        for d, x in changes.items()
    }
    ranked = sorted(doc_ids, key=lambda d: rank[d])
    assert all(
        lam[a] >= lam[b] for a, b in zip(ranked, ranked[1:])
    )


def test_bigram_lm_stats_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    toks = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip()) for r in docs
    }
    bg_census: Counter = Counter()
    ctx_census: Counter = Counter()
    doc_bgs: dict[int, list[tuple[str, str]]] = {}
    for d, ts in toks.items():
        bgs = [(ts[i], f"{ts[i]} {ts[i + 1]}") for i in range(len(ts) - 1)]
        doc_bgs[d] = bgs
        for w1, bg in bgs:
            bg_census[bg] += 1
            ctx_census[w1] += 1

    got = {r["doc_id"]: r for r in docs_bigram_lm_stats(spark, SF).collect()}
    want_ids = {d for d, ts in toks.items() if len(ts) >= 2}
    assert set(got) == want_ids
    for d, r in got.items():
        bgs = doc_bgs[d]
        assert r["n_bigrams"] == len(bgs)
        assert r["sum_bg_freq"] == sum(bg_census[bg] for _, bg in bgs)
        assert r["min_bg_freq"] == min(bg_census[bg] for _, bg in bgs)
        assert r["sum_ctx_freq"] == sum(ctx_census[w1] for w1, _ in bgs)
    # corpus-level model: at least one doc must share a bigram with another
    assert any(
        bg_census[bg] > Counter(bg for _, bg in doc_bgs[d])[bg]
        for d in want_ids
        for _, bg in doc_bgs[d]
    )
