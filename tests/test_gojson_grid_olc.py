"""Go-JSON serialization parity, grid generation (grid/grid_test.go:11-109
semantics), OLC encoding, and canonical-entry JSON shape."""

import math

import pytest

from google_maps_scraper_spark.extract import (
    entry_from_json,
    entry_to_canonical_json,
    generate_cells,
    haversine_distance,
    olc_encode,
    parse_bounding_box,
)
from google_maps_scraper_spark.extract.entry import empty_entry
from google_maps_scraper_spark.extract.gojson import (
    GoStruct,
    go_float_repr,
    go_json_dumps,
)


# ---- go_float_repr ----------------------------------------------------------

@pytest.mark.parametrize(
    "f,want",
    [
        (34.670595399999996, "34.670595399999996"),
        (33.042456699999995, "33.042456699999995"),
        (4.2, "4.2"),
        (0.0, "0"),
        (5.0, "5"),
        (-3.5, "-3.5"),
        (1e21, "1e+21"),
        (2.5e22, "2.5e+22"),
        (1e-7, "1e-07"),
        (0.000001, "0.000001"),
        (123456789.123, "123456789.123"),
        (1e15, "1000000000000000"),
    ],
)
def test_go_float_repr(f, want):
    assert go_float_repr(f) == want


def test_go_json_string_escaping():
    assert go_json_dumps("a<b>&c") == '"a\\u003cb\\u003e\\u0026c"'
    assert go_json_dumps("line\nbreak\ttab") == '"line\\nbreak\\ttab"'
    assert go_json_dumps("\x01") == '"\\u0001"'
    assert go_json_dumps("  ") == '"\\u2028\\u2029"'
    assert go_json_dumps("plain é ü") == '"plain é ü"'


def test_go_json_map_key_sort():
    # Go sorts map keys bytewise on the *string* form: int hours 0..23 order
    # as "0","1","10",...,"19","2","20",...
    hours = {h: h for h in range(24)}
    s = go_json_dumps(hours)
    keys = [part.split(":")[0].strip('"{') for part in s[1:-1].split(",")]
    assert keys == sorted((str(h) for h in range(24)))


def test_go_json_null_vs_empty():
    assert go_json_dumps(None) == "null"
    assert go_json_dumps([]) == "[]"
    assert go_json_dumps({}) == "{}"
    assert go_json_dumps(GoStruct([("a", None), ("b", [])])) == '{"a":null,"b":[]}'


def test_canonical_entry_dual_longitude_and_order():
    e = empty_entry()
    e["title"] = "x"
    e["category"] = "y"
    e["latitude"] = 1.5
    e["longtitude"] = 2.5
    s = entry_to_canonical_json(e)
    # longitude alias first (MarshalJSON wrapper), legacy key in struct position
    assert s.startswith('{"longitude":2.5,"input_id":"",')
    assert '"longtitude":2.5' in s
    # nil slices null, zero maps null
    assert '"categories":null' in s
    assert '"about":null' in s
    assert '"emails":null' in s


def test_canonical_entry_full_fixture_round_trips():
    raw = open("/root/reference/testdata/raw.json", "rb").read()
    e = entry_from_json(raw)
    s = entry_to_canonical_json(e)
    # canonical JSON is parseable and preserves both longitude keys
    import json

    d = json.loads(s)
    assert d["longitude"] == d["longtitude"] == 33.042456699999995
    assert d["latitude"] == 34.670595399999996
    assert d["review_count"] == 396
    assert d["user_reviews"] == []  # allocated-empty, not null
    assert d["user_reviews_extended"] is None
    # determinism
    assert entry_to_canonical_json(entry_from_json(raw)) == s


# ---- grid -------------------------------------------------------------------

def test_parse_bounding_box():
    b = parse_bounding_box("40.30,-3.80,40.50,-3.60")
    assert (b.min_lat, b.min_lon, b.max_lat, b.max_lon) == (40.30, -3.80, 40.50, -3.60)
    with pytest.raises(ValueError):
        parse_bounding_box("1,2,3")
    with pytest.raises(ValueError):
        parse_bounding_box("50,-3.8,40,-3.6")  # minLat >= maxLat
    with pytest.raises(ValueError):
        parse_bounding_box("91,0,92,1")  # out of range


def test_generate_cells_counts():
    bbox = parse_bounding_box("40.30,-3.80,40.50,-3.60")
    cells = generate_cells(bbox, 1.0)
    # ~22km x ~17km box with 1km cells → hundreds of cells
    assert len(cells) > 300
    lat_step = 1.0 / 111.32
    first = cells[0]
    assert math.isclose(first[0], 40.30 + lat_step / 2)
    # all centers inside the bbox
    for lat, lon in cells:
        assert 40.30 <= lat <= 40.50
        assert -3.80 <= lon <= -3.60


def test_generate_cells_default_size():
    bbox = parse_bounding_box("40.30,-3.80,40.31,-3.79")
    assert generate_cells(bbox, 0) == generate_cells(bbox, 1.0)


# ---- haversine --------------------------------------------------------------

def test_haversine():
    # London→Paris ≈ 343–344 km
    d = haversine_distance(51.5074, -0.1278, 48.8566, 2.3522)
    assert 340_000 < d < 348_000
    assert haversine_distance(10, 20, 10, 20) == 0.0


# ---- OLC --------------------------------------------------------------------

@pytest.mark.parametrize(
    "lat,lon,code",
    [
        (47.365590, 8.524997, "8FVC9G8F+6X"),
        (20.375, 2.775, "7FG49Q00+"),
        (20.3700625, 2.7821875, "7FG49QCJ+2V"),
        (-41.2730625, 174.7859375, "4VCPPQGP+Q9"),
    ],
)
def test_olc_encode(lat, lon, code):
    want_len = len(code.replace("+", "").rstrip("0"))
    got = olc_encode(lat, lon, 10 if want_len >= 10 else want_len)
    assert got == code
