"""Multimodal binary plumbing: header decode round-trips and catalog query."""

import pytest

SF = "/root/testdata/sf0.001"


def test_parse_image_header_roundtrip():
    from google_maps_scraper_spark.operators.analytics import (
        _jpeg_payload,
        _png_payload,
        parse_image_header,
    )

    assert parse_image_header(_png_payload(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_jpeg_payload(1920, 1080)) == ("jpeg", 1920, 1080)
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"GIF89a....") == ("unknown", None, None)
    # truncated JPEG with no SOF marker: format known, dims not
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == (
        "jpeg", None, None,
    )


def test_multimodal_image_dims_query(spark):
    from google_maps_scraper_spark.operators.analytics import QUERIES

    rows = QUERIES["multimodal_image_dims"](spark, SF).collect()
    assert rows
    for r in rows:
        i = r["doc_id"]
        assert r["format"] == ("png" if i % 2 == 0 else "jpeg")
        assert r["width"] == 16 + (i * 13) % 2048
        assert r["height"] == 16 + (i * 7) % 2048
