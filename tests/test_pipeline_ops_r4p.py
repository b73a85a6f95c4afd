"""Semantic tests for the round-4 wave-p operators — MIME sniffing, the
Gopher-rule quality gate, hourly rate anomalies, video frame-sample
planning, and redirect-chain resolution — against independent Python
oracles (byte-level sniff replay, re-based rule replay, Counter rollup,
pure-int arithmetic, dict-walk chain resolve)."""

from __future__ import annotations

import re
from collections import Counter

from google_maps_scraper_spark.operators.analytics import (
    _GOPHER_MIN_WORDS,
    _MIME_SYNTH,
    _VID_FPS_X100,
    _VID_SAMPLES,
    docs_gopher_quality_gate,
    docs_mime_sniff,
    events_rate_anomaly,
    load,
    multimodal_video_frame_plan,
    sniff_mime,
)
from google_maps_scraper_spark.operators.frontier import (
    frontier_redirect_resolve,
)

SF = "/root/testdata/sf0.001"


# --- MIME sniffing ----------------------------------------------------------


def test_sniff_mime_magic_table():
    for prefix, mime in _MIME_SYNTH:
        assert sniff_mime(prefix + b"123") == mime


def test_sniff_mime_adversarial_bytes():
    # leading whitespace before the doctype still sniffs as HTML
    assert sniff_mime(b"  \n<!DOCTYPE HTML><html>") == "text/html"
    assert sniff_mime(b"<HTML><body>x</body>") == "text/html"
    # JPEG variants share the 3-byte SOI+APP prefix
    assert sniff_mime(b"\xff\xd8\xff\xdb\x00\x43") == "image/jpeg"
    # non-printable, non-magic bytes are opaque
    assert sniff_mime(b"\x00\x01\x02\x03") == "application/octet-stream"
    # printable ASCII with no tags is plain text
    assert sniff_mime(b"hello world 42\n") == "text/plain"
    assert sniff_mime(b"") == "text/plain"


def test_mime_sniff_matches_python(spark):
    rows = docs_mime_sniff(spark, SF).collect()
    assert rows
    for r in rows:
        payload = _MIME_SYNTH[r["doc_id"] % 6][0] + str(r["doc_id"]).encode()
        assert r["mime"] == sniff_mime(payload)
        assert r["magic_hex"] == payload[:4].hex().upper()
        assert r["byte_len"] == len(payload)
    assert {r["mime"] for r in rows} == {m for _, m in _MIME_SYNTH}


# --- Gopher quality gate ----------------------------------------------------


def _gopher_py(text: str):
    toks = re.split(r"\s+", text.strip())
    n = len(toks)
    chars = len(re.sub(r"\s", "", text))
    stop = len(re.findall(r"\b(?:the|a|and|of|to|in)\b", text.lower()))
    alpha = sum(1 for w in toks if re.fullmatch(r"[A-Za-z]+", w))
    if n < _GOPHER_MIN_WORDS:
        reason = "too_few_words"
    elif chars < 3 * n or chars > 10 * n:
        reason = "word_length"
    elif stop < 2:
        reason = "low_stopword"
    elif 5 * alpha < 4 * n:
        reason = "non_alpha"
    else:
        reason = "ok"
    return n, reason


def test_gopher_gate_matches_python(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents").select("doc_id", "text").collect()
    }
    rows = docs_gopher_quality_gate(spark, SF).collect()
    assert len(rows) == len(texts)
    reasons = Counter()
    for r in rows:
        n, reason = _gopher_py(texts[r["doc_id"]])
        assert (r["n_words"], r["fail_reason"]) == (n, reason)
        assert r["pass"] == (reason == "ok")
        reasons[reason] += 1
    # the calibrated thresholds must keep the gate non-degenerate
    assert reasons["ok"] > 0 and (len(rows) - reasons["ok"]) > 0


# --- hourly rate anomaly ----------------------------------------------------


def test_rate_anomaly_matches_python(spark):
    ev = load(spark, SF, "events").select("event_type", "ts").collect()
    hourly = Counter(
        (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in ev
    )
    totals, hours = Counter(), Counter()
    for (et, _), n in hourly.items():
        totals[et] += n
        hours[et] += 1
    expect = {
        (et, hr): (n, totals[et], hours[et])
        for (et, hr), n in hourly.items()
        if n * hours[et] >= 2 * totals[et]
    }
    rows = events_rate_anomaly(spark, SF).collect()
    got = {
        (r["event_type"], r["hr"]): (r["n"], r["total"], r["n_hours"])
        for r in rows
    }
    assert got == expect
    # every flagged bucket is genuinely >= 2x its type's mean
    for (et, _), (n, total, n_hours) in got.items():
        assert n >= 2 * total / n_hours


# --- video frame plan -------------------------------------------------------


def test_video_frame_plan_matches_python(spark):
    rows = multimodal_video_frame_plan(spark, SF).collect()
    ids = {r["doc_id"] for r in rows}
    assert len(rows) == len(ids) * _VID_SAMPLES
    for r in rows:
        dur = 2000 + (r["doc_id"] * 53) % 20000
        fps = _VID_FPS_X100[r["doc_id"] % 5]
        nf = dur * fps // 100000
        idx = r["sample_ord"] * nf // _VID_SAMPLES
        assert (r["duration_ms"], r["fps_x100"], r["n_frames"]) == (dur, fps, nf)
        assert r["frame_idx"] == idx
        assert r["frame_ts_ms"] == idx * 100000 // fps
        # a planned frame always lies inside the clip
        assert 0 <= r["frame_idx"] < max(nf, 1)
        assert 0 <= r["frame_ts_ms"] <= dur


# --- redirect resolution ----------------------------------------------------


def test_redirect_resolve_matches_python(spark):
    ids = sorted(
        r["doc_id"] for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    n = len(ids)
    m = {u: (u * 5 + 7) % n for u in ids if u % 3 == 0}

    def resolve(u):
        cur, hops = u, 0
        while hops < 3 and cur in m:
            cur = m[cur]
            hops += 1
        return cur, hops, cur not in m

    rows = frontier_redirect_resolve(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        assert (r["final_id"], r["hops"], r["terminal"]) == resolve(r["doc_id"])
    # the hop cap and chain mix are both exercised
    hop_counts = Counter(r["hops"] for r in rows)
    assert hop_counts[0] > 0 and hop_counts[1] > 0
    assert hop_counts[2] + hop_counts[3] > 0
