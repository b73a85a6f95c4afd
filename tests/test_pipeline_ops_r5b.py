"""Semantic tests for the round-4 wave-ab operators — WebP RIFF header
decode and WARC revisit-record collapse — against independent Python
replays (arithmetic dims, running-version capture walk) and byte-level
parser edge cases."""

from __future__ import annotations

import struct

from google_maps_scraper_spark.operators.analytics import (
    _webp_vp8l_payload,
    _webp_vp8x_payload,
    load,
    multimodal_webp_dims,
    parse_webp_header,
)
from google_maps_scraper_spark.operators.frontier import (
    _REVISIT_CAPTURES,
    frontier_warc_revisit_collapse,
)

SF = "/root/testdata/sf0.001"


def test_webp_parser_edge_cases():
    # roundtrip both variants at boundary dims (1 and the 14-bit VP8L max)
    for w, h in [(1, 1), (16383, 16383), (640, 480)]:
        assert parse_webp_header(_webp_vp8x_payload(w, h)) == ("vp8x", w, h)
        assert parse_webp_header(_webp_vp8l_payload(w, h)) == ("vp8l", w, h)
    # VP8X 24-bit canvas max
    assert parse_webp_header(_webp_vp8x_payload(1 << 24, 1 << 24)) == (
        "vp8x", 1 << 24, 1 << 24,
    )
    assert parse_webp_header(None) == (None, None, None)
    assert parse_webp_header(b"") == (None, None, None)
    assert parse_webp_header(b"RIFFxxxxWAVE" + b"\x00" * 16) == (
        "unknown", None, None,
    )
    # valid container, lossy VP8 chunk — recognized but dims not decoded
    vp8 = b"VP8 " + struct.pack("<I", 8) + b"\x00" * 8
    assert parse_webp_header(
        b"RIFF" + struct.pack("<I", 4 + len(vp8)) + b"WEBP" + vp8
    ) == ("webp", None, None)
    # VP8L with a wrong signature byte is not decoded as lossless dims
    bad = bytearray(_webp_vp8l_payload(10, 10))
    bad[20] = 0x2E
    assert parse_webp_header(bytes(bad)) == ("webp", None, None)
    # truncated VP8X (container ok, chunk cut before the dims)
    assert parse_webp_header(_webp_vp8x_payload(10, 10)[:23]) == (
        "webp", None, None,
    )
    # the RIFF even-boundary pad byte is present on the odd-sized VP8L chunk
    assert len(_webp_vp8l_payload(1, 1)) % 2 == 0


def test_webp_dims_matches_python(spark):
    doc_ids = [
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    ]
    got = {r["doc_id"]: r for r in multimodal_webp_dims(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        r = got[d]
        w, h = 16 + (d * 11) % 1024, 16 + (d * 5) % 1024
        variant = "vp8x" if d % 2 == 0 else "vp8l"
        payload = (
            _webp_vp8x_payload(w, h) if d % 2 == 0 else _webp_vp8l_payload(w, h)
        )
        assert (r["variant"], r["width"], r["height"]) == (variant, w, h), d
        assert r["byte_len"] == len(payload), d


def test_warc_revisit_collapse_matches_python(spark):
    doc_ids = [
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    ]
    want = {}
    for d in doc_ids:
        version = 1
        first_of_version = {1: 1}
        for k in range(1, _REVISIT_CAPTURES + 1):
            if k > 1 and (d * 48271 + k * 16807) % 101 < 30:
                version += 1
                first_of_version.setdefault(version, k)
            ref = first_of_version[version]
            payload = 0 if k != ref else 800 + (d * 97 + version * 13) % 4000
            want[(d, k)] = (version, k != ref, ref, payload)

    got = {
        (r["doc_id"], r["capture"]): r
        for r in frontier_warc_revisit_collapse(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, (version, is_rev, ref, payload) in want.items():
        r = got[key]
        assert r["version"] == version, key
        assert r["is_revisit"] == is_rev, key
        assert r["ref_capture"] == ref, key
        assert r["payload_bytes"] == payload, key
    # the fixture history must exercise both record kinds, and revisits
    # must always store zero payload (the WARC storage win)
    revs = [r for r in got.values() if r["is_revisit"]]
    assert revs and len(revs) < len(got)
    assert all(r["payload_bytes"] == 0 for r in revs)
    # capture 1 is always an original
    assert all(not got[(d, 1)]["is_revisit"] for d in doc_ids)


def test_cdc_upsert_merge_matches_python(spark):
    from google_maps_scraper_spark.operators.analytics import (
        events_cdc_upsert_merge,
    )

    rows = load(spark, SF, "events").select("event_id", "user_id").collect()
    base = {r["event_id"]: r["user_id"] for r in rows}
    changes: dict[int, list[tuple[int, int, int | None]]] = {}
    OPRANK = {"D": 3, "U": 2, "I": 1}
    for e, uid in base.items():
        if e % 3 == 0:
            changes.setdefault(e, []).append((1 + e % 4, OPRANK["U"], uid + 1000000))
        if e % 7 == 0:
            changes.setdefault(e, []).append((2 + e % 3, OPRANK["D"], None))
        if e % 11 == 0:
            changes.setdefault(e + 1000000000, []).append((1, OPRANK["I"], e))

    want = {}
    for e, uid in base.items():
        cl = changes.get(e)
        if not cl:
            want[e] = ("kept", True, uid)
            continue
        seq, rank, val = max(cl)
        if rank == OPRANK["D"]:
            want[e] = ("deleted", False, None)
        else:
            want[e] = ("updated", True, val)
    for e, cl in changes.items():
        if e not in base:
            _, _, val = max(cl)
            want[e] = ("inserted", True, val)

    got = {r["event_id"]: r for r in events_cdc_upsert_merge(spark, SF).collect()}
    assert set(got) == set(want)
    actions = set()
    for e, (action, present, val) in want.items():
        r = got[e]
        assert (r["action"], r["is_present"], r["user_id_final"]) == (
            action, present, val,
        ), e
        actions.add(action)
    assert actions == {"kept", "updated", "deleted", "inserted"}
    # last-writer-wins must be exercised: some key carries BOTH a U and a D
    both = [e for e, cl in changes.items() if len(cl) >= 2]
    assert both
    # and at least one same-seq tie resolves by op rank (D beats U)
    ties = [
        e for e in both
        if len({s for s, _, _ in changes[e]}) < len(changes[e])
    ]
    assert ties and all(want[e][0] == "deleted" for e in ties)


def test_url_blocklist_filter_matches_python(spark):
    import re as _re

    from google_maps_scraper_spark.operators.analytics import (
        frontier_url_canonicalize,
    )
    from google_maps_scraper_spark.operators.frontier import (
        _URL_BLOCKLIST,
        _URL_DIGIT_PERMILLE_MAX,
        _URL_SOFT_KEYWORDS,
        frontier_url_blocklist_filter,
    )

    canon = {
        r["doc_id"]: (r["url_raw"], r["url_canon"])
        for r in frontier_url_canonicalize(spark, SF).collect()
    }
    got = {
        r["doc_id"]: r
        for r in frontier_url_blocklist_filter(spark, SF).collect()
    }
    assert set(got) == set(canon)
    verdicts = set()
    for d, (raw, cu) in canon.items():
        m = _re.match(r"^[a-z]+://([^/:?#]+)", cu)
        host = m.group(1) if m else ""
        kw = sum(len(_re.findall(k, raw.lower())) for k in _URL_SOFT_KEYWORDS)
        dp = len(_re.findall(r"[0-9]", raw)) * 1000 // len(raw)
        blocked = host in _URL_BLOCKLIST
        verdict = (
            "blocked" if blocked
            else "flagged" if kw >= 2 or dp > _URL_DIGIT_PERMILLE_MAX
            else "clean"
        )
        r = got[d]
        assert (
            r["host"], r["kw_score"], r["digit_permille"],
            r["blocked_domain"], r["verdict"],
        ) == (host, kw, dp, blocked, verdict), d
        verdicts.add(verdict)
    assert verdicts == {"blocked", "flagged", "clean"}
    # hard block must win over soft signals: some blocked row also carries
    # a nonzero soft score and still reads 'blocked', never 'flagged'
    # (the flag-tier thresholds never coincide with a blocked domain at
    # this sf — the synthesis shapes have opposite parity)
    assert any(
        r["verdict"] == "blocked" and r["kw_score"] >= 1
        for r in got.values()
    )


def test_spam_mass_matches_python(spark):
    from google_maps_scraper_spark.operators.graph import (
        _PR_BASE,
        _PR_ONE,
        _SPAM_MASS_SUSPECT_PERMILLE,
        _SPAM_SEED_RESIDUES,
        EDGE_FANOUT,
        graph_spam_mass_2iter,
    )

    doc_ids = sorted(
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    )
    n = len(doc_ids)
    edges = set()
    for d in doc_ids:
        for j in range(EDGE_FANOUT):
            dst = (d * (j + 2) + j) % n
            if dst != d:
                edges.add((d, dst))
    out_deg: dict[int, int] = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1

    def step(r, base):
        contrib: dict[int, int] = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0) + r[s] // out_deg[s]
        return {
            d: base(d) + 85 * contrib.get(d, 0) // 100 for d in doc_ids
        }

    seeds = {d for d in doc_ids if d % 20 in _SPAM_SEED_RESIDUES}
    pr = {d: _PR_ONE for d in doc_ids}
    sr = {d: _PR_ONE if d in seeds else 0 for d in doc_ids}
    for _ in range(2):
        pr = step(pr, lambda d: _PR_BASE)
        sr = step(sr, lambda d: _PR_BASE if d in seeds else 0)

    got = {r["doc_id"]: r for r in graph_spam_mass_2iter(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        r = got[d]
        permille = sr[d] * 1000 // pr[d]
        assert r["pr_scaled"] == pr[d], d
        assert r["spam_scaled"] == sr[d], d
        assert r["spam_mass_permille"] == permille, d
        assert r["is_spam_suspect"] == (
            permille > _SPAM_MASS_SUSPECT_PERMILLE
        ), d
    # the signal the blocklist alone cannot give: some flagged page is NOT
    # itself a blocked-domain seed, and not every page is flagged
    suspects = {d for d in doc_ids if got[d]["is_spam_suspect"]}
    assert suspects - seeds
    assert suspects and len(suspects) < n


def test_host_rate_ewma_matches_python(spark):
    from google_maps_scraper_spark.operators.frontier import (
        _EWMA_DELAY_FACTOR,
        _EWMA_DELAY_MAX,
        _EWMA_DELAY_MIN,
        _EWMA_FETCHES,
        _EWMA_SLOW_MS,
        frontier_host_rate_ewma,
    )

    doc_ids = [
        r["doc_id"]
        for r in load(spark, SF, "documents").select("doc_id").collect()
    ]
    got = {r["doc_id"]: r for r in frontier_host_rate_ewma(spark, SF).collect()}
    assert set(got) == set(doc_ids)
    regimes = set()
    for d in doc_ids:
        lats = [
            80 + (d * 131 + k * 17) % 241
            for k in range(1, _EWMA_FETCHES + 1)
        ]
        # the integer recursion, step by step — div each step, so order
        # of operations matters (no closed form)
        e = lats[0]
        for lv in lats[1:]:
            e = (7 * e + lv) // 8
        delay = min(_EWMA_DELAY_MAX, max(_EWMA_DELAY_MIN, e * _EWMA_DELAY_FACTOR))
        r = got[d]
        assert r["ewma_ms"] == e, d
        assert r["min_lat_ms"] == min(lats), d
        assert r["max_lat_ms"] == max(lats), d
        assert r["crawl_delay_ms"] == delay, d
        assert r["slow_host"] == (e > _EWMA_SLOW_MS), d
        regimes.add(
            "floor" if delay == _EWMA_DELAY_MIN
            else "ceiling" if delay == _EWMA_DELAY_MAX
            else "proportional"
        )
    # the fixture latencies must exercise the whole clamp: backed-off slow
    # hosts, floor-rate fast hosts, and the proportional band between
    assert regimes == {"floor", "ceiling", "proportional"}
