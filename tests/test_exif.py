"""EXIF reader/writer (sources/exif.py): build↔parse round-trips in
both byte orders, APP1-in-JPEG location, honest bounds, and the
media_exif variant coverage."""

from __future__ import annotations

import pytest

from biggis_landuse_spark.sources.exif import (
    ExifFormatError,
    build_exif,
    parse_exif,
)

FULL = {
    "make": "CanonX",
    "model": "EOS-TEST-5",
    "orientation": 6,
    "datetime": "2026:08:16 06:00:00",
    "exposure_time": (1, 250),
    "iso": 400,
    "focal_length": (50, 1),
    "pixel_x_dimension": 4000,
}


@pytest.mark.parametrize("order", ["<", ">"])
def test_build_parse_roundtrip(order):
    assert parse_exif(build_exif(FULL, order=order)) == FULL


def test_app1_in_jpeg_and_absence():
    from biggis_landuse_spark.sources.jpeg import encode_jpeg

    jp = encode_jpeg(8, 8, bytes(64), channels=1)
    app1 = build_exif({"make": "XCam", "iso": 1600}, as_app1=True)
    spliced = jp[:2] + app1 + jp[2:]
    assert parse_exif(spliced) == {"make": "XCam", "iso": 1600}
    assert parse_exif(jp) == {}  # JPEG without APP1: empty, not error


def test_app1_found_past_fill_bytes():
    # T.81 B.1.1.2: any marker may be padded with extra 0xFF fill
    # bytes; the walk must skip them instead of misreading the length
    from biggis_landuse_spark.sources.jpeg import encode_jpeg

    jp = encode_jpeg(8, 8, bytes(64), channels=1)
    app1 = build_exif({"make": "XCam", "iso": 1600}, as_app1=True)
    spliced = jp[:2] + b"\xff\xff\xff" + app1 + jp[2:]
    assert parse_exif(spliced) == {"make": "XCam", "iso": 1600}


def test_truncated_fill_byte_run_returns_empty():
    # ADVICE r9 #2: a truncated JPEG ending in a 0xFF fill-byte run
    # must yield {} (no APP1 found), never IndexError — parse_exif
    # runs per-row inside mapInPandas where one bad blob would fail
    # the whole query
    assert parse_exif(b"\xff\xd8\xff\xff\xff\xff") == {}
    assert parse_exif(b"\xff\xd8\xff") == {}


def test_sub_ifd_optional():
    got = parse_exif(build_exif({"make": "A", "orientation": 8}))
    assert got == {"make": "A", "orientation": 8}
    assert "iso" not in got


def test_honest_bounds():
    with pytest.raises(ExifFormatError, match="unknown EXIF field"):
        build_exif({"shutter_count": 1})
    with pytest.raises(ExifFormatError, match="not an EXIF"):
        parse_exif(b"XXxxgarbage")
    # truncated IFD: typed error, never garbage values
    blob = build_exif(FULL)
    with pytest.raises(ExifFormatError):
        parse_exif(blob[:12])


def test_media_exif_variants_cover_nulls(spark):
    from biggis_landuse_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["media_exif"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_make = {}
    for r in rows:
        by_make.setdefault(r["make"], r)
    assert set(by_make) == {"CAM0", "CAM1", "CAM2", "CAM3"}
    assert by_make["CAM2"]["iso"] == 400  # the big-endian variant
    assert by_make["CAM3"]["iso"] is None  # no Exif sub-IFD → NULL
    assert by_make["CAM1"]["exposure_den"] == 250
