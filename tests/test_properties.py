"""Property-based tests (hypothesis) over the pure parser/encoder surfaces.

The fixture suites pin exact reference outputs; these pin the *invariants*
that hold for every input — the class of bug a fixture can't catch (a float
that round-trips wrong, an escape sequence that doesn't invert, a URL whose
canonical form isn't a fixpoint).  All targets are pure Python (no Spark),
so the whole file runs in seconds.
"""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from google_maps_scraper_spark.extract.entry import haversine_distance
from google_maps_scraper_spark.extract.gojson import (
    go_float_repr,
    go_json_dumps,
    go_string_escape,
)
from google_maps_scraper_spark.extract.olc import olc_encode
from google_maps_scraper_spark.extract.urls import (
    canonical_url_hash,
    etld1,
    go_unquote,
    parse_query_line,
)

finite_floats = st.floats(allow_nan=False, allow_infinity=False)


# --------------------------------------------------------------------------
# gojson: Go encoding/json parity port (extract/gojson.py)
# --------------------------------------------------------------------------


@settings(max_examples=300)
@given(finite_floats)
def test_go_float_repr_roundtrips(f):
    # Go's strconv.AppendFloat emits shortest round-trip digits; whatever the
    # formatting shape, parsing it back must reproduce the exact float.
    s = go_float_repr(f)
    assert float(s) == f
    if math.copysign(1.0, f) < 0:
        assert s.startswith("-")


@settings(max_examples=300)
@given(finite_floats)
def test_go_float_repr_exponent_rule(f):
    # encode.go floatEncoder: 'e' form iff abs < 1e-6 or >= 1e21 (nonzero).
    s = go_float_repr(f)
    a = abs(f)
    if "e" in s:
        assert a != 0 and (a < 1e-6 or a >= 1e21)
        mant, _, exp = s.partition("e")
        assert exp[0] in "+-" and len(exp) >= 3  # Go pads to 2 exponent digits
    else:
        assert a == 0 or (1e-6 <= a < 1e21)


json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | finite_floats
    | st.text(max_size=40),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=20), children, max_size=5),
    max_leaves=25,
)


def _num_norm(v):
    """Compare JSON trees with numbers coerced to float: a float like
    2.257431511950117e+16 correctly prints as the integral '22574315119501170'
    (Go does the same), which json.loads parses as an exact int that differs
    from the nearest double under Python's cross-type ==."""
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return [_num_norm(x) for x in v]
    return {k: _num_norm(x) for k, x in v.items()}


@settings(max_examples=200)
@given(json_values)
def test_go_json_dumps_is_valid_json(v):
    out = go_json_dumps(v)
    assert _num_norm(json.loads(out)) == _num_norm(v)
    # HTML-safe mode: <, >, & never appear raw anywhere in the output.
    assert "<" not in out and ">" not in out and "&" not in out


@settings(max_examples=200)
@given(st.dictionaries(st.text(max_size=12), st.integers(), min_size=2, max_size=8))
def test_go_json_dumps_sorts_map_keys_bytewise(d):
    # Go sorts map keys as raw byte strings (encode.go sortable by UTF-8).
    out = go_json_dumps(d)
    pairs = json.loads(out, object_pairs_hook=list)
    keys = [k for k, _ in pairs]
    assert keys == sorted(keys, key=lambda k: k.encode("utf-8"))


@settings(max_examples=300)
@given(st.text(max_size=60))
def test_go_unquote_inverts_go_escape(s):
    # The JSON escaper and strconv.Unquote are inverse on every string Go
    # can emit (gmaps/entry.go decodes URLs through exactly this pair).
    assert go_unquote(go_string_escape(s)) == s


@settings(max_examples=300)
@given(st.text(max_size=60))
def test_go_unquote_parses_json_string_bodies(s):
    # json.dumps(ensure_ascii=True) emits only \uXXXX + simple escapes,
    # including surrogate pairs for astral chars — all in Unquote's grammar.
    body = json.dumps(s, ensure_ascii=True)[1:-1]
    assert go_unquote(body) == s


# --------------------------------------------------------------------------
# URL / frontier key derivation (extract/urls.py)
# --------------------------------------------------------------------------


def test_canonical_url_hash_fnv1a_vectors():
    # Published FNV-1a 64-bit vectors (the reference keys its seen-set on
    # this function, deduper/hashmap.go:37-42).
    assert canonical_url_hash("") == 0xCBF29CE484222325
    assert canonical_url_hash("a") == 0xAF63DC4C8601EC8C
    assert canonical_url_hash("foobar") == 0x85944171F73967E8


label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@settings(max_examples=300)
@given(st.lists(label, min_size=1, max_size=5))
def test_etld1_idempotent_suffix(labels):
    host = ".".join(labels)
    r = etld1(host)
    assert etld1(r) == r  # politeness bucket keys are fixpoints
    assert host == r or host.endswith("." + r)  # bucket is a host suffix
    assert 1 <= len(r.split(".")) <= 3


@settings(max_examples=200)
@given(
    st.text(max_size=30).filter(lambda t: "#!#" not in t and t.strip()),
    st.text(alphabet="abcdef0123456789-", max_size=12),
)
def test_parse_query_line_roundtrip(text, qid):
    got_text, got_id = parse_query_line(f"{text} #!# {qid}")
    assert got_text == text.strip()
    assert got_id == qid.strip()


# --------------------------------------------------------------------------
# Open Location Code (extract/olc.py)
# --------------------------------------------------------------------------

_OLC_ALPHABET = "23456789CFGHJMPQRVWX"


def _olc_decode_box(code: str):
    """Test-side pair decoder (the published spec run in reverse)."""
    digits = code.replace("+", "")
    lat_lo, lon_lo = -90.0, -180.0
    lat_res, lon_res = 20.0, 20.0
    for i in range(0, len(digits), 2):
        lat_lo += _OLC_ALPHABET.index(digits[i]) * lat_res
        lon_lo += _OLC_ALPHABET.index(digits[i + 1]) * lon_res
        lat_res /= 20.0
        lon_res /= 20.0
    return lat_lo, lon_lo, lat_res * 20.0, lon_res * 20.0


@settings(max_examples=300)
@given(
    st.floats(min_value=-90, max_value=90, allow_nan=False),
    st.floats(min_value=-180, max_value=180, allow_nan=False),
)
def test_olc_encode_contains_point(lat, lon):
    code = olc_encode(lat, lon, 10)
    assert len(code) == 11 and code[8] == "+"
    assert all(c in _OLC_ALPHABET for c in code.replace("+", ""))
    lat_lo, lon_lo, lat_sz, lon_sz = _olc_decode_box(code)
    # the encoder clips lat and normalizes lon before gridding
    clat = min(90.0, max(-90.0, lat))
    clon = lon if lon < 180 else lon - 360
    # integer scaling rounds at the finest (length-15) grid — allow one
    # fine-grid cell of slack at the box edges
    fine_lat, fine_lon = 1 / 2.5e7, 1 / 8.192e6
    assert lat_lo - fine_lat <= clat <= lat_lo + lat_sz + fine_lat
    assert lon_lo - fine_lon <= clon <= lon_lo + lon_sz + fine_lon


# --------------------------------------------------------------------------
# Haversine (extract/entry.py:535, R=6371e3 like the reference)
# --------------------------------------------------------------------------

lat_st = st.floats(min_value=-90, max_value=90, allow_nan=False)
lon_st = st.floats(min_value=-180, max_value=180, allow_nan=False)


@settings(max_examples=300)
@given(lat_st, lon_st, lat_st, lon_st)
def test_haversine_symmetric_bounded(lat1, lon1, lat2, lon2):
    d_ab = haversine_distance(lat1, lon1, lat2, lon2)
    d_ba = haversine_distance(lat2, lon2, lat1, lon1)
    assert math.isclose(d_ab, d_ba, rel_tol=1e-9, abs_tol=1e-6)
    assert 0.0 <= d_ab <= math.pi * 6371e3 * (1 + 1e-12)


@settings(max_examples=100)
@given(lat_st, lon_st)
def test_haversine_zero_on_identical(lat, lon):
    assert haversine_distance(lat, lon, lat, lon) == 0.0


# --------------------------------------------------------------------------
# Bloom filter (operators/bloom.py) — the URL-seen accelerator
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(max_size=30), max_size=50), st.sets(st.text(max_size=30), max_size=50))
def test_bloom_no_false_negatives_and_merge(added, probed):
    # False negatives are impossible — dedup decisions stay exact because
    # positives fall through to the exact anti-join; a miss may NOT.
    from google_maps_scraper_spark.operators.bloom import BloomFilter

    bf = BloomFilter.sized(max(len(added), 1), fpp=0.01)
    for k in added:
        bf.add(k)
    assert all(bf.might_contain(k) for k in added)

    # OR-merge must behave like adding to one filter (shard-merge law).
    half_a, half_b = BloomFilter(bf.m_bits, bf.k), BloomFilter(bf.m_bits, bf.k)
    items = sorted(added)
    for i, k in enumerate(items):
        (half_a if i % 2 == 0 else half_b).add(k)
    merged = half_a.merge(half_b)
    assert bytes(merged.bits) == bytes(bf.bits)

    # Serialization round-trips the exact decision function.
    clone = BloomFilter(bf.m_bits, bf.k, bf.to_bytes())
    for k in probed | added:
        assert clone.might_contain(k) == bf.might_contain(k)
