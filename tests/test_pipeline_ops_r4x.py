"""Semantic tests for the round-4 wave-x operators — deterministic A/B
readout, session-duration histogram, and the MinHash Jaccard-estimate
accuracy eval — against independent Python oracles (hashlib bucketing,
session replay, signature replay)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict
from datetime import timezone

from google_maps_scraper_spark.operators.analytics import (
    events_ab_test_lift,
    events_session_duration_histogram,
    load,
)
from google_maps_scraper_spark.operators.dedup_docs import (
    NUM_PERM,
    _MERSENNE31,
    _MHE_MAX_DOC,
    _perm_coeffs,
    docs_minhash_jaccard_eval,
)

SF = "/root/testdata/sf0.001"


def test_ab_test_lift_matches_python(spark):
    ev = load(spark, SF, "events").select("user_id", "event_type").collect()
    conv = defaultdict(bool)
    for r in ev:
        conv[r["user_id"]] |= r["event_type"] == "purchase"
    stats = defaultdict(lambda: [0, 0])
    for u, c in conv.items():
        v = "A" if int(hashlib.md5(f"ab-v1:{u}".encode()).hexdigest()[0], 16) % 2 == 0 else "B"
        stats[v][0] += 1
        stats[v][1] += c
    rows = {r["variant"]: r for r in events_ab_test_lift(spark, SF).collect()}
    assert set(rows) == set(stats)
    for v, (n, k) in stats.items():
        r = rows[v]
        assert (r["n_users"], r["n_converted"], r["conv_permille"]) == (
            n,
            k,
            k * 1000 // n,
        )
    # both variants populated and assignment actually splits the users
    assert all(rows[v]["n_users"] > 0 for v in ("A", "B"))
    assert sum(r["n_users"] for r in rows.values()) == len(conv)


def test_session_duration_histogram_matches_python(spark):
    ev = (
        load(spark, SF, "events")
        .select("event_id", "ts", "user_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        us = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        by_user[r["user_id"]].append((us, r["event_id"]))
    durs = []
    for evs in by_user.values():
        evs.sort()
        start = last = None
        for us, _ in evs:
            if last is None or us - last > 1800 * 1_000_000:
                if start is not None:
                    durs.append((last - start) // 1_000_000)
                start = us
            last = us
        durs.append((last - start) // 1_000_000)
    buckets = defaultdict(list)
    for d in durs:
        buckets[0 if d <= 0 else d.bit_length()].append(d)
    rows = {
        r["bucket"]: r
        for r in events_session_duration_histogram(spark, SF).collect()
    }
    assert set(rows) == set(buckets)
    for b, ds in buckets.items():
        r = rows[b]
        assert (r["n_sessions"], r["min_s"], r["max_s"]) == (
            len(ds),
            min(ds),
            max(ds),
        )
    assert sum(r["n_sessions"] for r in rows.values()) == len(durs)
    assert len(rows) > 2


def _shingles(text: str) -> set:
    words = re.split(r"\s+", text.lower().strip())
    top = max(len(words) - 3, 0)
    return {" ".join(words[i : i + 3]) for i in range(top + 1)}


def test_minhash_jaccard_eval_matches_python(spark):
    docs = (
        load(spark, SF, "documents")
        .filter(f"doc_id < {_MHE_MAX_DOC}")
        .select("doc_id", "text")
        .collect()
    )
    coeffs = _perm_coeffs()
    sigs, shs = {}, {}
    for r in docs:
        sh = _shingles(r["text"])
        bases = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _MERSENNE31
            for s in sh
        ]
        sigs[r["doc_id"]] = [
            min((a * h + b) % _MERSENNE31 for h in bases) for a, b in coeffs
        ]
        shs[r["doc_id"]] = sh
    expect = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            m = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            inter = len(shs[a] & shs[b])
            uni = len(shs[a] | shs[b])
            est = m * 1000 // NUM_PERM
            exact = inter * 1000 // uni
            expect[(a, b)] = (est, exact, abs(est - exact))
    rows = {
        (r["doc_a"], r["doc_b"]): (
            r["est_permille"],
            r["exact_permille"],
            r["abs_err_permille"],
        )
        for r in docs_minhash_jaccard_eval(spark, SF).collect()
    }
    assert rows == expect
    assert len(rows) == _MHE_MAX_DOC * (_MHE_MAX_DOC - 1) // 2
    # the estimator is actually informative: mean abs error under ~3/sqrt(32)
    errs = [e for _, _, e in rows.values()]
    assert sum(errs) / len(errs) < 3000 / (NUM_PERM ** 0.5)
