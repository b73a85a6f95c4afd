"""Semantic tests for the round-4 wave-q operators — watermark late-data
flags, the WARC/CDX offset index, and the meta-robots admission gate —
against independent Python oracles (sorted-replay watermark, running-sum
offsets, re-based directive parsing)."""

from __future__ import annotations

import re
from collections import defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _LATE_ALLOWED_US,
    _LATE_JITTER_US,
    events_late_data_flag,
    load,
)
from google_maps_scraper_spark.operators.frontier import (
    _META_ROBOTS_SYNTH,
    _WARC_FILES,
    frontier_meta_robots_gate,
    frontier_warc_cdx_index,
)

SF = "/root/testdata/sf0.001"
_EPOCH_0 = None


def _us(dt):
    import datetime

    return int(
        (dt - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )


def test_late_data_flag_matches_python(spark):
    ev = load(spark, SF, "events").select("event_id", "event_type", "ts").collect()
    by_type = defaultdict(list)
    for r in ev:
        us = _us(r["ts"])
        seq = us + (r["event_id"] * 2654435761) % _LATE_JITTER_US - _LATE_JITTER_US // 2
        by_type[r["event_type"]].append((seq, r["event_id"], us))
    expect = {}
    for rows in by_type.values():
        wm = None
        for seq, eid, us in sorted(rows):
            late = wm is not None and us < wm - _LATE_ALLOWED_US
            expect[eid] = (late, wm - us if late else 0)
            wm = us if wm is None else max(wm, us)
    got = {
        r["event_id"]: (r["late"], r["lateness_us"])
        for r in events_late_data_flag(spark, SF).collect()
    }
    assert got == expect
    n_late = sum(1 for l, _ in got.values() if l)
    assert 0 < n_late < len(got)  # jitter/lateness params stay non-degenerate


def test_warc_cdx_index_matches_python(spark):
    ids = sorted(
        r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    files = defaultdict(list)
    for i in ids:
        files[f"crawl-{i % _WARC_FILES}.warc.gz"].append(i)
    expect = {}
    totals = {}
    for f, members in files.items():
        off = 0
        for i in members:  # members already in doc_id order
            ln = 800 + (i * 97) % 4000
            expect[(f, i)] = (off, ln)
            off += ln
        totals[f] = off
    rows = frontier_warc_cdx_index(spark, SF).collect()
    assert len(rows) == len(ids)
    last = {}
    for r in rows:
        assert (r["offset"], r["record_len"]) == expect[(r["warc_file"], r["doc_id"])]
        assert r["file_bytes"] == totals[r["warc_file"]]
        last[r["warc_file"]] = r["offset"] + r["record_len"]
    # reconciliation: the last record of every shard ends at file_bytes
    assert last == totals


def test_meta_robots_gate_matches_python(spark):
    rows = frontier_meta_robots_gate(spark, SF).collect()
    assert rows
    pat = re.compile(r'(?i)<meta\s+name="robots"\s+content="([^"]*)"')
    seen_kinds = set()
    for r in rows:
        kind = r["doc_id"] % 4
        seen_kinds.add(kind)
        html = (
            f'<html><head><title>d{r["doc_id"]}</title>'
            f"{_META_ROBOTS_SYNTH[kind]}</head><body></body></html>"
        )
        m = pat.search(html)
        content = m.group(1).lower() if m else ""
        assert r["robots_content"] == content
        assert r["index_allowed"] == ("noindex" not in content)
        assert r["follow_links"] == ("nofollow" not in content)
    assert seen_kinds == {0, 1, 2, 3}
    # the uppercase variant must still be caught (case-insensitive extract)
    upper = [r for r in rows if r["doc_id"] % 4 == 1]
    assert upper and all(not r["index_allowed"] for r in upper)
    # and the no-meta variant is fully allowed
    bare = [r for r in rows if r["doc_id"] % 4 == 3]
    assert bare and all(r["index_allowed"] and r["follow_links"] for r in bare)
