"""Golden-fixture tests for the entry extractor.

Expectations transcribed from /root/reference/gmaps/entry_test.go (the
reference's own test suite); fixtures are read directly from the read-only
reference checkout.
"""

import json
import pathlib

import pytest

from google_maps_scraper_spark.extract import (
    entry_csv_headers,
    entry_csv_row,
    entry_from_json,
    parse_search_results,
)

FIXTURES = pathlib.Path("/root/reference/testdata")


@pytest.fixture(scope="module")
def raw_entry():
    raw = (FIXTURES / "raw.json").read_bytes()
    return entry_from_json(raw)


def test_entry_scalars(raw_entry):
    e = raw_entry
    assert e["link"] == (
        "https://www.google.com/maps/place/Kipriakon/data=!4m2!3m1"
        "!1s0x14e732fd76f0d90d:0xe5415928d6702b47!10m1!1e1"
    )
    assert e["title"] == "Kipriakon"
    assert e["category"] == "Restaurant"
    assert e["categories"] == ["Restaurant"]
    assert e["address"] == "Old port, Limassol 3042"
    assert e["web_site"] == ""
    assert e["phone"] == "25 101555"
    assert e["plus_code"] == "M2CR+6X Limassol"
    assert e["review_count"] == 396
    assert e["review_rating"] == 4.2
    assert e["latitude"] == 34.670595399999996
    assert e["longtitude"] == 33.042456699999995
    assert e["cid"] == "16519582940102929223"
    assert e["status"] == "Closed ⋅ Opens 12:30 pm Tue"
    assert e["reviews_link"] == (
        "https://search.google.com/local/reviews?placeid=ChIJDdnwdv0y5xQRRytw1ihZQeU"
        "&q=Kipriakon&authuser=0&hl=en&gl=CY"
    )
    assert e["thumbnail"] == (
        "https://lh5.googleusercontent.com/p/AF1QipP4Y7A8nYL3KKXznSl69pXSq9p2IXCYUjVvOh0F"
        "=w408-h408-k-no"
    )
    assert e["timezone"] == "Asia/Nicosia"
    assert e["price_range"] == "€€"
    assert e["data_id"] == "0x14e732fd76f0d90d:0xe5415928d6702b47"
    assert e["place_id"] == "ChIJDdnwdv0y5xQRRytw1ihZQeU"


def test_entry_open_hours(raw_entry):
    assert raw_entry["open_hours"] == {
        "Monday": ["12:30–10 pm"],
        "Tuesday": ["12:30–10 pm"],
        "Wednesday": ["12:30–10 pm"],
        "Thursday": ["12:30–10 pm"],
        "Friday": ["12:30–10 pm"],
        "Saturday": ["12:30–10 pm"],
        "Sunday": ["12:30–10 pm"],
    }


def test_entry_images_and_street_view(raw_entry):
    imgs = raw_entry["images"]
    assert [i["title"] for i in imgs] == [
        "All", "Latest", "Videos", "Menu", "Food & drink", "Vibe",
        "Fried green tomatoes", "French fries", "By owner", "Street View & 360°",
    ]
    assert imgs[0]["image"] == (
        "https://lh5.googleusercontent.com/p/AF1QipP4Y7A8nYL3KKXznSl69pXSq9p2IXCYUjVvOh0F"
        "=w298-h298-k-no"
    )
    # street view URL comes from the panoid regex over the Street View image
    assert raw_entry["street_view_url"] == "" or "pano=" in raw_entry["street_view_url"]


def test_entry_order_online_owner_address(raw_entry):
    assert raw_entry["order_online"] == [
        {
            "link": "https://foody.com.cy/delivery/lemesos/to-kypriakon?utm_source=google"
            "&utm_medium=organic&utm_campaign=google_reserve_place_order_action",
            "source": "foody.com.cy",
        },
        {
            "link": "https://wolt.com/en/cyp/limassol/restaurant/kypriakon"
            "?utm_source=googlemapreserved&utm_campaign=kypriakon",
            "source": "wolt.com",
        },
    ]
    assert raw_entry["owner"] == {
        "id": "102769814432182832009",
        "name": "Kipriakon (Owner)",
        "link": "https://www.google.com/maps/contrib/102769814432182832009",
    }
    assert raw_entry["complete_address"] == {
        "borough": "",
        "street": "Old port",
        "city": "Limassol",
        "postal_code": "3042",
        "state": "",
        "country": "CY",
    }


def test_entry_reviews_per_rating_and_credit_cards(raw_entry):
    assert raw_entry["reviews_per_rating"] == {1: 37, 2: 16, 3: 27, 4: 60, 5: 256}
    assert raw_entry["credit_cards_accepted"] == ["Mastercard"]


def test_entry_about(raw_entry):
    assert len(raw_entry["about"]) == 10
    for about in raw_entry["about"]:
        assert about["id"]
        assert about["name"]
        assert about["options"]


def test_entry_popular_times(raw_entry):
    pt = raw_entry["popular_times"]
    assert len(pt) == 7
    days = {"Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"}
    assert set(pt) == days
    for v in pt.values():
        for traffic in v.values():
            assert 0 <= traffic <= 100
    assert pt["Monday"][20] == 100


def test_entry_review_count_only():
    raw = (FIXTURES / "raw.json").read_bytes()
    e = entry_from_json(raw, review_count_only=True)
    assert e["review_count"] == 396
    assert e["title"] == ""


def test_panic_fixtures_parse_without_error():
    # entry_test.go:182-195 — crash-regression corpus
    for name in ("panic.json", "panic2.json"):
        raw = (FIXTURES / name).read_bytes()
        entry_from_json(raw)  # must not raise


def test_raw2_about_nonempty():
    raw = (FIXTURES / "raw2.json").read_bytes()
    e = entry_from_json(raw)
    assert len(e["about"]) > 0


def test_panic2_credit_cards():
    raw = (FIXTURES / "panic2.json").read_bytes()
    e = entry_from_json(raw)
    assert e["credit_cards_accepted"] == [
        "American Express", "Diners Club", "Mastercard", "VISA",
    ]


def test_panic2_merges_duplicate_about_options():
    raw = (FIXTURES / "panic2.json").read_bytes()
    e = entry_from_json(raw)
    payments = next(a for a in e["about"] if a["id"] == "payments")
    ccs = [o for o in payments["options"] if o["name"] == "Credit cards"]
    assert len(ccs) == 1
    assert ccs[0]["enabled"] is True
    assert ccs[0]["values"] == ["American Express", "Diners Club", "Mastercard", "VISA"]


def test_csv_headers_and_row():
    # entry_test.go:255-266
    headers = entry_csv_headers()
    assert "credit_cards_accepted" in headers
    e = entry_from_json((FIXTURES / "raw.json").read_bytes())
    row = entry_csv_row(e)
    assert len(row) == len(headers) == 36
    e["credit_cards_accepted"] = ["American Express", "Mastercard", "VISA"]
    row = entry_csv_row(e)
    assert row[headers.index("credit_cards_accepted")] == "American Express, Mastercard, VISA"
    # float cells render Go %f style
    assert row[headers.index("latitude")] == "34.670595"
    assert row[headers.index("review_rating")] == "4.200000"


def test_fast_mode_search_results():
    # entry_test.go:301-314 — output.json must parse without error
    raw = (FIXTURES / "output.json").read_bytes()
    entries = parse_search_results(raw)
    assert len(entries) > 0
    for e in entries:
        assert isinstance(e["title"], str)


def test_invalid_json_raises():
    with pytest.raises(ValueError):
        entry_from_json(b"not json")
    with pytest.raises(ValueError):
        entry_from_json(json.dumps([1, 2, 3]).encode())  # len < 7
    with pytest.raises(ValueError):
        entry_from_json(json.dumps([None] * 7).encode())  # jd[6] not a list
