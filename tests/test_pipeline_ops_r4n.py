"""Semantic tests for the round-4 thirteenth-wave operators — consistent-
hash frontier shard assignment and exponential-decay recency scoring —
against independent Python oracles (hashlib ring walk; integer shift sums).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _TUMBLE_US,
    events_decay_recency_score,
    load,
)
from google_maps_scraper_spark.operators.frontier import (
    _RING_REPLICAS,
    _RING_SHARDS,
    _RING_SPACE,
    frontier_consistent_hash_assign,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _fold12(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % _RING_SPACE


def test_consistent_hash_assign_matches_python(spark):
    srcs = {
        r["source"] for r in load(spark, SF, "documents").select("source").collect()
    }
    ring = [
        (s, _fold12(f"ring-v1:{s}:{r}"))
        for s in range(_RING_SHARDS)
        for r in range(_RING_REPLICAS)
    ]
    expect = {}
    for src in srcs:
        host = f"site-{src}.com"
        hp = _fold12(f"host-v1:{host}")
        dist, shard = min(
            ((vp - hp + _RING_SPACE) % _RING_SPACE, s) for s, vp in ring
        )
        expect[host] = (shard, dist)
    got = {
        r["host"]: (r["shard"], r["ring_distance"])
        for r in frontier_consistent_hash_assign(spark, SF).collect()
    }
    assert got == expect
    # elasticity property: removing one shard's vnodes only ever REASSIGNS
    # hosts that were on that shard (everyone else's successor is unchanged)
    victim = next(iter({s for s, _ in got.values()}))
    ring2 = [(s, vp) for s, vp in ring if s != victim]
    for host, (shard, _) in got.items():
        hp = _fold12(f"host-v1:{host}")
        _, shard2 = min(
            ((vp - hp + _RING_SPACE) % _RING_SPACE, s) for s, vp in ring2
        )
        if shard != victim:
            assert shard2 == shard


def test_decay_recency_score_matches_python(spark):
    e = load(spark, SF, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    rows = e.collect()
    ref = max(r["us"] for r in rows)
    score: dict[int, int] = defaultdict(int)
    nev: dict[int, int] = defaultdict(int)
    for r in rows:
        age = min((ref - r["us"]) // _TUMBLE_US, 62)
        # Python round() is banker's; the engines round half away from zero
        v = r["value"] * 1000
        vi = int(v) + (1 if v - int(v) >= 0.5 else 0)
        score[r["user_id"]] += vi >> age
        nev[r["user_id"]] += 1
    got = {
        r["user_id"]: (r["recency_score"], r["n_events"])
        for r in events_decay_recency_score(spark, SF).collect()
    }
    assert got == {u: (score[u], nev[u]) for u in score}
    # decay sanity: total decayed mass never exceeds the undecayed sum
    assert all(s <= sum(int(r["value"] * 1000) + 1 for r in rows)
               for s, _ in got.values())
