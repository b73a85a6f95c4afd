"""URL classification/construction (gmaps/url_test.go, gmaps/job.go:34-84),
query-line parsing (runner/jobs.go:245-265), SERP feed-link extraction
(gmaps/job.go:159-176), email extraction (gmaps/emailjob.go:104-148), and
Go-unquote parity (gmaps/entry.go:979-988)."""

import pytest

from google_maps_scraper_spark.extract import (
    build_search_url,
    extract_actual_url,
    extract_emails,
    extract_feed_links,
    extract_next_page_token,
    is_google_maps_url,
    normalize_google_url,
    parse_query_line,
    remove_first_line,
)
from google_maps_scraper_spark.extract.urls import go_unquote


# ---- isGoogleMapsURL (gmaps/job.go:379-405; url_test.go cases) --------------

@pytest.mark.parametrize(
    "s,want",
    [
        ("https://www.google.com/maps/search/pizza", True),
        ("https://google.com/maps/place/X", True),
        ("http://maps.google.com/maps?q=x", True),
        ("https://maps.app.goo.gl/abc123", True),
        ("maps.app.goo.gl/abc123", True),
        ("restaurant in athens", False),
        ("https://example.com/maps", False),
        ("https://notgoogle.com/maps/search/x", False),
        ("", False),
        ("   ", False),
        ("https://www.google.com/search?q=pizza", False),
    ],
)
def test_is_google_maps_url(s, want):
    assert is_google_maps_url(s) is want


def test_build_search_url_plain():
    assert build_search_url("restaurant in athens") == (
        "https://www.google.com/maps/search/restaurant+in+athens"
    )


def test_build_search_url_geo_zoom():
    assert build_search_url("cafe", "34.5, 33.0", 15) == (
        "https://www.google.com/maps/search/cafe/@34.5,33.0,15z"
    )


def test_build_search_url_passthrough():
    u = "  https://www.google.com/maps/search/pizza  "
    assert build_search_url(u) == u.strip()


# ---- parseQueryLine ---------------------------------------------------------

def test_parse_query_line():
    assert parse_query_line("restaurant in athens") == ("restaurant in athens", "")
    assert parse_query_line("pizza #!# my-id-1 ") == ("pizza", "my-id-1")
    assert parse_query_line("   ") is None
    assert parse_query_line("") is None
    with pytest.raises(ValueError):
        parse_query_line("#!#orphan-id")


# ---- redirect unwrap --------------------------------------------------------

def test_extract_actual_url():
    assert extract_actual_url("") == ""
    assert extract_actual_url("https://example.com") == "https://example.com"
    assert (
        extract_actual_url("/url?q=https://example.com/&opi=89978449")
        == "https://example.com/"
    )
    assert extract_actual_url("/url?nope=1") == "/url?nope=1"


def test_normalize_google_url():
    assert normalize_google_url("/url?q=http://example.com/&x=1") == "http://example.com/"
    assert normalize_google_url("/maps/place/x") == "https://www.google.com/maps/place/x"
    assert normalize_google_url("http://a.b") == "http://a.b"
    assert normalize_google_url("") == ""


# ---- go_unquote parity ------------------------------------------------------

def test_go_unquote():
    assert go_unquote(r"https:\/\/x" if False else "plain") == "plain"
    assert go_unquote(r"a=b") == "a=b"
    assert go_unquote(r"é") == "é"
    assert go_unquote(r"tab\there") == "tab\there"
    assert go_unquote(r"\x41") == "A"
    assert go_unquote(r"\101") == "A"
    # surrogate pair
    assert go_unquote(r"😀") == "😀"
    # unpaired surrogate → U+FFFD (Go behavior)
    assert go_unquote(r"\ud800x") == "�x"
    with pytest.raises(ValueError):
        go_unquote("bad\\qescape")
    with pytest.raises(ValueError):
        go_unquote("trailing\\")


# ---- SERP feed links --------------------------------------------------------

FEED_HTML = """
<html><body>
<div role="feed">
  <div jsaction="mouseover:x"><a href="https://www.google.com/maps/place/A/data=!1"></a></div>
  <div jsaction="mouseover:y"><a href="https://www.google.com/maps/place/B/data=!2">B</a>
     <div><a href="https://nested-not-direct-child.example"></a></div>
  </div>
  <div><a href="https://no-jsaction-parent.example"></a></div>
  <div jsaction="z"><a href="">empty-skipped</a></div>
</div>
<div jsaction="outside"><a href="https://outside-feed.example"></a></div>
</body></html>
"""


def test_extract_feed_links():
    links = extract_feed_links(FEED_HTML)
    assert links == [
        "https://www.google.com/maps/place/A/data=!1",
        "https://www.google.com/maps/place/B/data=!2",
    ]


def test_extract_feed_links_none():
    assert extract_feed_links("<html><body><p>no feed</p></body></html>") == []


# ---- first-line drop + next page token --------------------------------------

def test_remove_first_line():
    assert remove_first_line(b"junk\n[1,2]") == b"[1,2]"
    assert remove_first_line(b"nonewline") == b""
    assert remove_first_line(b"") == b""


def test_extract_next_page_token():
    assert extract_next_page_token(b")]}'\n[null,\"TOK\",[]]") == "TOK"
    assert extract_next_page_token(b"[null,null,[]]") == ""
    assert extract_next_page_token(b"garbage") == ""


# ---- emails -----------------------------------------------------------------

def test_doc_email_extractor_first_wins():
    html = (
        "<a href='mailto:a@example.com'>x</a>"
        "<a href='mailto:b@example.com'>y</a>"
        "<a href='mailto:a@example.com'>dup</a>"
        "<a href='mailto:not-an-email'>bad</a>"
    )
    assert extract_emails(html) == ["a@example.com", "b@example.com"]


def test_regex_email_fallback():
    html = "<p>contact us: info@shop.example.org or sales@shop.example.org</p>"
    assert extract_emails(html) == ["info@shop.example.org", "sales@shop.example.org"]


def test_no_emails():
    assert extract_emails("<p>nothing here</p>") == []
