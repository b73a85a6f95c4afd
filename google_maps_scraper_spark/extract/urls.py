"""URL helpers re-expressing the reference's URL semantics.

Citations into /root/reference:
  * ``extractActualURL``      — gmaps/entry.go:990-1006
  * ``normalizeGoogleURL``    — gmaps/emailjob.go:153-176
  * ``isGoogleMapsURL``       — gmaps/job.go:379-405
  * search-URL construction   — gmaps/job.go:44-54
  * ``decodeURL`` (strconv.Unquote parity) — gmaps/entry.go:979-988
  * ``extractPlaceID``        — gmaps/reviews.go:199-233 (regex order pinned;
    the reference iterates a Go map, our order matches its test expectations
    in gmaps/reviews_test.go:13-63)
  * ``extractNextPageToken``  — gmaps/reviews.go:281-303
  * review RPC URL builder    — gmaps/reviews.go:235-261
  * ``parseQueryLine``        — runner/jobs.go:245-265
"""

from __future__ import annotations

import json
import re
import urllib.parse

__all__ = [
    "extract_actual_url",
    "normalize_google_url",
    "is_google_maps_url",
    "build_search_url",
    "go_unquote",
    "decode_url",
    "extract_place_id",
    "extract_next_page_token",
    "build_fast_search_url",
    "build_review_rpc_url",
    "parse_query_line",
    "canonical_url_hash",
    "etld1",
]


def _google_q_param(raw_url: str) -> str | None:
    parsed = urllib.parse.urlparse("https://www.google.com" + raw_url)
    qs = urllib.parse.parse_qs(parsed.query)
    vals = qs.get("q")
    if vals and vals[0]:
        return vals[0]
    return None


def extract_actual_url(google_url: str) -> str:
    """Unwrap ``/url?q=...`` redirect URLs (gmaps/entry.go:990-1006)."""
    if not google_url or not google_url.startswith("/url?q="):
        return google_url
    target = _google_q_param(google_url)
    return target if target else google_url


def normalize_google_url(raw_url: str) -> str:
    """gmaps/emailjob.go:153-176 — unwrap redirect, absolutize root-relative."""
    if not raw_url:
        return raw_url
    if raw_url.startswith("/url?q="):
        target = _google_q_param(raw_url)
        if target:
            return target
    if raw_url.startswith("/"):
        return "https://www.google.com" + raw_url
    return raw_url


def is_google_maps_url(s: str) -> bool:
    """gmaps/job.go:379-405."""
    s = s.strip()
    if not s:
        return False
    if s.startswith(("http://", "https://")):
        try:
            u = urllib.parse.urlparse(s)
        except ValueError:
            return False
        host = (u.hostname or "").lower()
        if host == "maps.app.goo.gl":
            return True
        return (host == "google.com" or host.endswith(".google.com")) and "/maps" in u.path
    return s.startswith("maps.app.goo.gl")


def _go_query_escape(s: str) -> str:
    """Go ``url.QueryEscape``: space → '+', everything non-unreserved %-escaped."""
    return urllib.parse.quote_plus(s, safe="")


def build_search_url(query: str, geo_coordinates: str = "", zoom: int = 0) -> str:
    """gmaps/job.go:44-54 — query → Google Maps search URL.

    A query that already is a Maps URL passes through trimmed; with geo+zoom a
    ``/@lat,lon,{zoom}z`` suffix is appended (spaces stripped from geo).
    """
    if is_google_maps_url(query):
        return query.strip()
    if geo_coordinates and zoom > 0:
        q = _go_query_escape(query)
        geo = geo_coordinates.replace(" ", "")
        return f"https://www.google.com/maps/search/{q}/@{geo},{zoom}z"
    q = _go_query_escape(query)
    return f"https://www.google.com/maps/search/{q}"


_GO_SIMPLE_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
    "v": "\v", "\\": "\\", "'": "'", '"': '"',
}


def go_unquote(s: str) -> str:
    """Parity port of Go ``strconv.Unquote`` for a double-quoted string body.

    ``s`` is the *body* (without surrounding quotes).  Raises ValueError on
    malformed escapes, mirroring Go's ErrSyntax (gmaps/entry.go:979-988 treats
    that as "no decode").  Surrogate-pair \\uD800-\\uDFFF sequences combine
    when paired, else map to U+FFFD like Go.
    """
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "\n":
            raise ValueError("newline in quoted string")
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        i += 1
        if i >= n:
            raise ValueError("trailing backslash")
        e = s[i]
        i += 1
        if e in _GO_SIMPLE_ESCAPES:
            out.append(_GO_SIMPLE_ESCAPES[e])
        elif e == "x":
            if i + 2 > n:
                raise ValueError("bad hex escape")
            out.append(chr(int(s[i : i + 2], 16)))
            i += 2
        elif e in "01234567":
            if i + 2 > n or not all(c in "01234567" for c in s[i : i + 2]):
                raise ValueError("bad octal escape")
            v = int(e + s[i : i + 2], 8)
            if v > 255:
                raise ValueError("octal escape > 255")
            out.append(chr(v))
            i += 2
        elif e == "u" or e == "U":
            width = 4 if e == "u" else 8
            if i + width > n:
                raise ValueError("bad unicode escape")
            hexs = s[i : i + width]
            if not re.fullmatch(r"[0-9a-fA-F]+", hexs):
                raise ValueError("bad unicode escape")
            v = int(hexs, 16)
            i += width
            if v > 0x10FFFF:
                raise ValueError("rune out of range")
            if 0xD800 <= v <= 0xDBFF and e == "u":
                # try surrogate pair
                if i + 6 <= n and s[i] == "\\" and s[i + 1] == "u":
                    v2 = int(s[i + 2 : i + 6], 16)
                    if 0xDC00 <= v2 <= 0xDFFF:
                        out.append(chr(0x10000 + ((v - 0xD800) << 10) + (v2 - 0xDC00)))
                        i += 6
                        continue
                out.append("�")
            elif 0xDC00 <= v <= 0xDFFF:
                out.append("�")
            else:
                out.append(chr(v))
        else:
            raise ValueError(f"unknown escape \\{e}")
    return "".join(out)


def decode_url(url: str) -> str:
    """gmaps/entry.go:979-988 — quote, Go-unquote; '' is returned by callers on
    error, so raise ValueError on malformed input like strconv.Unquote."""
    return go_unquote(url.replace('"', '\\"'))


_PLACE_ID_PATTERNS = [
    re.compile(r"!1s([^!]+)"),                                # standard !1s...
    re.compile(r"place_id=([^&]+)"),                          # query param
    re.compile(r"/place/[^/]+/@[^/]+/data=!.*!1s([^!]+)"),    # full place URL
]
_HEX_PLACE_ID = re.compile(r"0x[0-9a-fA-F]+:0x[0-9a-fA-F]+")


def extract_place_id(map_url: str) -> str:
    """gmaps/reviews.go:199-233 with deterministic pattern order
    (reviews_test.go:13-63 pins the expected results).

    Raises ValueError when no pattern matches (Go returns an error)."""
    for pat in _PLACE_ID_PATTERNS:
        m = pat.search(map_url)
        if m:
            raw = m.group(1)
            try:
                return urllib.parse.unquote(raw, errors="strict")
            except Exception:  # pragma: no cover - mirror QueryUnescape failure
                return raw
    m = _HEX_PLACE_ID.search(map_url)
    if m:
        return m.group(0)
    raise ValueError(f"could not extract place ID from URL: {map_url}")


def extract_next_page_token(data: bytes | str) -> str:
    """gmaps/reviews.go:281-303 — jd[1] after ``)]}'\\n`` prefix strip."""
    text = data.decode("utf-8", "replace") if isinstance(data, bytes) else data
    if text.startswith(")]}'\n"):
        text = text[5:]
    try:
        result = json.loads(text)
    except ValueError:
        return ""
    if not isinstance(result, list) or len(result) < 2 or result[1] is None:
        return ""
    return result[1] if isinstance(result[1], str) else ""


def build_review_rpc_url(map_url: str, page_token: str, page_size: int, request_id: str) -> str:
    """gmaps/reviews.go:235-261 — listugcposts RPC URL.  The random
    ``request_id`` is injected (deterministic in our engine; the reference's
    crypto-random id is semantically inert)."""
    place_id = extract_place_id(map_url)
    enc_pid = urllib.parse.quote_plus(place_id, safe="")
    enc_tok = urllib.parse.quote_plus(page_token, safe="")
    pb = (
        f"!1m6!1s{enc_pid}"
        "!6m4!4m1!1e1!4m1!1e3"
        f"!2m2!1i{page_size}!2s{enc_tok}"
        f"!5m2!1s{request_id}!7e81"
        "!8m9!2b1!3b1!5b1!7b1"
        "!12m4!1b1!2b1!4m1!1e1!11m0!13m1!1e1"
    )
    return f"https://www.google.com/maps/rpc/listugcposts?authuser=0&hl=en&pb={pb}"


def build_fast_search_url(
    query: str,
    lat: float = 0.0,
    lon: float = 0.0,
    zoom: float = 15.0,
    hl: str = "en",
) -> str:
    """Fast-mode SERP request URL (gmaps/searchjob.go:43,146-170): the
    ``maps.google.com/search`` endpoint with ``tbm=map`` and the positional
    ``pb`` protobuf-string carrying lon/lat/viewport/zoom.  Params render in
    Go ``url.Values.Encode()`` order (sorted keys, QueryEscape values)."""
    pb = (
        "!4m12!1m3!1d3826.902183192154"
        f"!2d{lon:.4f}!3d{lat:.4f}"
        "!2m3!1f0!2f0!3f0!3m2!1i600!2i800"
        f"!4f{zoom:.1f}!7i20!8i0"
        "!10b1!12m22!1m3!18b1!30b1!34e1!2m3!5m1!6e2!20e3!4b0!10b1!12b1!13b1"
        "!16b1!17m1!3e1!20m3!5e2!6b1!14b1!46m1!1b0"
        "!96b1!19m4!2m3!1i360!2i120!4i8"
    )
    params = {"tbm": "map", "authuser": "0", "hl": hl, "q": query, "pb": pb}
    encoded = "&".join(
        f"{k}={urllib.parse.quote_plus(params[k])}" for k in sorted(params)
    )
    return f"https://maps.google.com/search?{encoded}"


def parse_query_line(line: str) -> tuple[str, str] | None:
    """runner/jobs.go:245-265 — returns (text, id); None for blank lines;
    raises ValueError for lines with empty query text (e.g. '#!#id')."""
    line = line.strip()
    if not line:
        return None
    if "#!#" in line:
        before, _, after = line.partition("#!#")
        text, qid = before.strip(), after.strip()
    else:
        text, qid = line, ""
    if not text:
        raise ValueError(f"invalid query line {line!r}: empty query text")
    return text, qid


def canonical_url_hash(url: str) -> int:
    """64-bit FNV-1a-compatible decision hash for the URL-seen set.

    The reference keys its seen-set on FNV-64a of the raw href
    (deduper/hashmap.go:37-42).  Exact hash values are an internal detail;
    dedup *decisions* are what must match.  We use the same FNV-1a function
    for transparency, computed JVM-side via xxhash64 in the Spark path and
    here only for unit tests.
    """
    h = 0xCBF29CE484222325
    for b in url.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_MULTI_PART_TLDS = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "com.br", "com.cn", "com.mx", "co.in", "co.nz", "com.sg",
    "com.tr", "com.ar", "co.za", "com.hk", "com.tw",
}


def etld1(url_or_host: str) -> str:
    """Approximate eTLD+1 for politeness bucketing.

    A pragmatic suffix table (common multi-part public suffixes) rather than a
    full PSL — bucket *stability* is what politeness requires, not registrar
    perfection.  The reference has no politeness at all; this is engine-new
    (BASELINE.json north_rule)."""
    host = url_or_host
    if "//" in host:
        host = urllib.parse.urlparse(url_or_host).hostname or ""
    host = host.lower().rstrip(".")
    if not host:
        return ""
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if ".".join(parts[-2:]) in _MULTI_PART_TLDS:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])
