"""Review-parsing golden-fixture tests, transcribed from
/root/reference/gmaps/reviews_test.go:65-157."""

import json
import pathlib

import pytest

from google_maps_scraper_spark.extract import extract_place_id, parse_reviews

FIXTURES = pathlib.Path("/root/reference/gmaps/testdata")

# deterministic "now" for published_at bounds (2026-08-16T00:00:00Z)
NOW_MICROS = 1786838400000000


def load(name):
    raw = (FIXTURES / name).read_bytes()
    return parse_reviews(json.loads(raw), now_micros=NOW_MICROS)


def test_native_with_reply():
    reviews = load("review_native_with_reply.json")
    assert len(reviews) == 1
    r = reviews[0]
    assert r["review_id"] == (
        "Ci9DQUlRQUNvZENodHljRjlvT2xGMmRraFdhSFowWW0xWVNURTBObEptU3pWWVgxRRAB"
    )
    assert r["source"] == "Google"
    assert r["rating_scale"] == 5
    assert r["Rating"] == 1
    assert r["rating_float"] == 1.0
    assert r["posted_at_unix_micros"] == 1772186522193853
    assert r["updated_at_unix_micros"] == 1772186522193853
    assert r["author_url"] == (
        "https://www.google.com/maps/contrib/116111130377271376564/reviews?hl=en"
    )
    assert r["language"] == "de"
    assert r["translated_lang"] == "en"
    assert r["text_original"]
    assert r["text_translated"]
    assert r["reply_text_original"]
    assert r["reply_text"]
    assert r["reply_posted_at_unix_micros"] == 1772266947000000
    assert r["reply_updated_at_unix_micros"] == 1772266947000000
    assert r["reply_language"] == "de"
    assert r["Name"] == "E. Ö."
    assert r["Description"]
    assert r["Description"] == r["text_original"]


def test_aggregator():
    reviews = load("review_aggregator.json")
    assert len(reviews) == 1
    r = reviews[0]
    assert r["review_id"] == "AGG_REVIEW_ID_001"
    assert r["source"] == "Tripadvisor"
    assert r["rating_scale"] == 10
    assert r["Rating"] == 0
    assert r["rating_float"] == 8.5
    assert r["posted_at_unix_micros"] == 1700000000000000
    assert r["updated_at_unix_micros"] == 1700001000000000
    assert r["author_url"] == "https://www.tripadvisor.com/members/testuser"
    assert r["language"] == "de"
    assert r["translated_lang"] == ""
    assert r["text_original"]
    assert r["text_translated"] == ""
    assert r["reply_posted_at_unix_micros"] == 0
    assert r["reply_text_original"] == ""


def test_native_no_text():
    reviews = load("review_native_no_text.json")
    assert len(reviews) == 1
    r = reviews[0]
    assert r["review_id"] == (
        "Ci9DQUlRQUNvZENodHljRjlvT21jMmJ6UnpkemN6Y0dscE9YRndaUzFuVVhCSVprRRAB"
    )
    assert r["source"] == "Google"
    assert r["Rating"] == 5
    assert r["rating_float"] == 5.0
    assert r["text_original"] == ""
    assert r["text_translated"] == ""
    assert r["language"] == ""
    assert r["reply_text_original"] == ""
    assert r["Name"] == "Lysann Lieblang"


def test_native_no_translation():
    reviews = load("review_native_no_translation.json")
    assert len(reviews) == 1
    r = reviews[0]
    assert r["review_id"] == "ChZDSUhNMG9nS0VJQ0FnSUNZemVhOFpREAE"
    assert r["source"] == "Google"
    assert r["rating_scale"] == 5
    assert r["language"] == "en"
    assert r["translated_lang"] == ""
    assert r["text_original"]
    assert r["text_translated"] == ""
    assert r["reply_text_original"] == ""


# ---- extractPlaceID (reviews_test.go:13-63) --------------------------------

@pytest.mark.parametrize(
    "url,want",
    [
        (
            "https://www.google.com/maps/place/Joe's+Pizza+Broadway/@40.7546795,"
            "-73.9870291,17z/data=!4m7!3m6!1s0x89c259ab3c1ef289:0x3b67a41175949f55"
            "!8m2!3d40.7546795!4d-73.9870291!16s%2Fg%2F11bw4ws2mt?hl=en&entry=ttu",
            "0x89c259ab3c1ef289:0x3b67a41175949f55",
        ),
        (
            "https://www.google.com/maps/place/Joe's+Pizza/@40.7546795,-73.9870291,17z"
            "?place_id=ChIJDdnwdv0y5xQRRytw1ihZQeU&hl=en",
            "ChIJDdnwdv0y5xQRRytw1ihZQeU",
        ),
        (
            "https://www.google.com/maps/place/Coffee+Project+New+York/data=!4m7!3m6"
            "!1s0x89c2599b5a24d7fd:0x9e354f6cf514b9fc!8m2!3d40.7270884!4d-73.989382"
            "!16s%2Fg%2F11c3svpqld!19sChIJ_dckWptZwokR_LkU9WxPNZ4",
            "0x89c2599b5a24d7fd:0x9e354f6cf514b9fc",
        ),
    ],
)
def test_extract_place_id(url, want):
    assert extract_place_id(url) == want


@pytest.mark.parametrize(
    "url", ["https://www.google.com/maps/search/pizza+in+Brooklyn+NY", ""]
)
def test_extract_place_id_errors(url):
    with pytest.raises(ValueError):
        extract_place_id(url)
