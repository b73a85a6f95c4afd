"""Semantic tests for the round-4 fourth-wave pipeline operators:
deterministic split assignment, sequence packing (distributed prefix sum),
and daily retention cohorts — each against an independent sequential Python
oracle.
"""

from __future__ import annotations

import hashlib

from google_maps_scraper_spark.operators.analytics import (
    _DAY_US,
    _PACK_SEQ_TOKS,
    _SPLIT_SALT,
    docs_pack_sequences,
    docs_split_assign,
    events_retention_cohorts,
    load,
)

SF = "/root/testdata/sf0.001"


def test_split_assign_matches_md5(spark):
    docs = [
        (r["doc_id"], r["lang"])
        for r in load(spark, SF, "documents").collect()
    ]
    want = {}
    for doc_id, lang in docs:
        h = hashlib.md5(f"{_SPLIT_SALT}:{doc_id}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 100
        split = "train" if bucket < 80 else "val" if bucket < 90 else "test"
        want[doc_id] = (lang, bucket, split)
    got = {
        r["doc_id"]: (r["lang"], r["bucket"], r["split"])
        for r in docs_split_assign(spark, SF).collect()
    }
    assert got == want
    # ratios are in the hash-split ballpark and all three splits non-empty
    counts = {"train": 0, "val": 0, "test": 0}
    for _, _, s in want.values():
        counts[s] += 1
    n = len(want)
    assert counts["train"] > 0.7 * n
    assert counts["val"] > 0 and counts["test"] > 0


def test_split_assign_is_stable_across_runs(spark):
    a = {r["doc_id"]: r["split"] for r in docs_split_assign(spark, SF).collect()}
    b = {r["doc_id"]: r["split"] for r in docs_split_assign(spark, SF).collect()}
    assert a == b  # no RNG anywhere: re-execution cannot reshuffle the split


def test_pack_sequences_matches_global_prefix_sum(spark):
    docs = sorted(
        (r["doc_id"], len(r["text"].split(" ")))
        for r in load(spark, SF, "documents").collect()
    )
    want, off = {}, 0
    for doc_id, n_tok in docs:
        want[doc_id] = (
            n_tok, off, off // _PACK_SEQ_TOKS, off % _PACK_SEQ_TOKS
        )
        off += n_tok
    got = {
        r["doc_id"]: (r["n_tok"], r["tok_offset"], r["seq_id"], r["seq_pos"])
        for r in docs_pack_sequences(spark, SF).collect()
    }
    assert got == want
    # the tape really packs multiple docs per sequence AND spans sequences
    seqs = {v[2] for v in want.values()}
    assert len(seqs) > 1
    assert len(want) > len(seqs)


def test_retention_cohorts_match_sequential(spark):
    ev = [
        (r["user_id"], r["ts"]) for r in load(spark, SF, "events").collect()
    ]
    import calendar

    def day(ts):
        us = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
        return us // _DAY_US

    first: dict = {}
    for uid, ts in ev:
        d = day(ts)
        first[uid] = min(first.get(uid, d), d)
    cells: dict = {}
    seen = set()
    for uid, ts in ev:
        key = (first[uid], day(ts) - first[uid])
        if (uid, key) in seen:
            continue
        seen.add((uid, key))
        cells[key] = cells.get(key, 0) + 1
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in events_retention_cohorts(spark, SF).collect()
    }
    assert got == cells
    # the matrix is a real triangle: offset-0 cells exist and retention decays
    assert any(k[1] == 0 for k in cells)
    assert len({v for v in cells.values()}) > 1
