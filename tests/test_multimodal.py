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


def test_parse_image_header_standalone_markers():
    """Regression (round-3 ADVICE, low): real-world JPEG streams carry
    length-less markers (TEM 0x01, RST0-7) and 0xFF fill/padding bytes; the
    marker scan must skip them instead of reading a phantom length segment,
    and must stop at SOS (entropy-coded data is not marker-structured)."""
    import struct

    from google_maps_scraper_spark.operators.analytics import parse_image_header

    def sof0(w, h):
        seg = b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00\x00"
        return b"\xff\xc0" + struct.pack(">H", len(seg) + 2) + seg

    # TEM + RST markers (no length) and 0xFF fill padding before SOF0
    stream = (
        b"\xff\xd8"          # SOI
        + b"\xff\x01"        # TEM: standalone
        + b"\xff\xd0"        # RST0: standalone
        + b"\xff\xff\xff\xd7"  # fill byte then RST7
        + sof0(640, 480)
        + b"\xff\xd9"        # EOI
    )
    assert parse_image_header(stream) == ("jpeg", 640, 480)

    # SOS before any SOF: scan must stop, not walk entropy-coded data
    sos = b"\xff\xda\x00\x04\x01\x00" + b"\x12\x34\x56\xff\x00\x99"
    assert parse_image_header(b"\xff\xd8" + sos) == ("jpeg", None, None)

    # desync guard: garbage where a marker should be
    assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00") == ("jpeg", None, None)

    # zero/invalid length segment must not loop forever
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x00") == ("jpeg", None, None)


# --- WAV/RIFF header decode -------------------------------------------------


def test_wav_roundtrip_pure():
    from google_maps_scraper_spark.operators.analytics import (
        _WAV_RATES,
        _wav_payload,
        parse_wav_header,
    )

    for i in range(25):
        ch, rate, ns = 1 + i % 2, _WAV_RATES[i % 5], 1000 + (i * 37) % 8000
        assert parse_wav_header(_wav_payload(ch, rate, 16, ns)) == (
            ch, rate, 16, ns,
        )


def test_wav_parser_chunk_walk_edge_cases():
    """Spec-correctness of the RIFF walk: odd-length chunks are word-aligned,
    unknown chunks are skipped, fmt-before-data ordering is not assumed, and
    malformed streams return all-None instead of raising."""
    import struct

    from google_maps_scraper_spark.operators.analytics import parse_wav_header

    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)

    def riff(body: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body

    # odd-length LIST chunk before fmt: the +1 alignment pad must be skipped
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    stream = riff(
        odd + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 400)
    )
    assert parse_wav_header(stream) == (2, 44100, 16, 100)

    # data chunk BEFORE fmt: sample count needs fmt, so it stays None
    # (the walk must not crash or misattribute)
    stream2 = riff(
        b"data" + struct.pack("<I", 400) + b"\x00" * 400
        + b"fmt " + struct.pack("<I", 16) + fmt
    )
    ch, rate, bits, ns = parse_wav_header(stream2)
    assert (ch, rate, bits) == (2, 44100, 16) and ns is None

    # malformed / truncated
    assert parse_wav_header(b"") == (None, None, None, None)
    assert parse_wav_header(b"RIFF\x04\x00\x00\x00WAVE") == (
        None, None, None, None,
    )
    assert parse_wav_header(b"OggS" + b"\x00" * 20) == (
        None, None, None, None,
    )
