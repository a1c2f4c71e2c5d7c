"""Old-style JPEG-in-TIFF (compression 6, TIFF 6.0 §22 — r9 VERDICT
r8 #6): both wild flavors decode through the in-repo T.81 engine, and
the reconstruction is pinned EXACT against standalone decodes of the
same streams (the synthesized stitch must be byte-equivalent, not just
"close"). No Spark needed — pure codec tests."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from biggis_landuse_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_lossless,
)
from biggis_landuse_spark.sources.tiff import TiffFormatError, decode_tiff

_TYPE_FMT = {3: "H", 4: "I"}


def _tiff(entries: dict[int, tuple[int, list[int]]], body: bytes) -> bytes:
    """Minimal classic little-endian TIFF: header | body | IFD |
    overflow. Body bytes land at offset 8, so body-relative offsets in
    ``entries`` must already include the +8."""
    data = bytearray(b"II*\x00" + b"\x00\x00\x00\x00")
    data += body
    ifd_off = len(data)
    struct.pack_into("<I", data, 4, ifd_off)
    tags = sorted(entries)
    data += struct.pack("<H", len(tags))
    overflow_base = ifd_off + 2 + 12 * len(tags) + 4
    overflow = bytearray()
    for t in tags:
        typ, vals = entries[t]
        raw = struct.pack("<" + _TYPE_FMT[typ] * len(vals), *vals)
        if len(raw) <= 4:
            field = raw.ljust(4, b"\x00")
        else:
            field = struct.pack("<I", overflow_base + len(overflow))
            overflow += raw
        data += struct.pack("<HHI", t, typ, len(vals)) + field
    data += b"\x00\x00\x00\x00"
    data += overflow
    return bytes(data)


def _segments(stream: bytes):
    """JFIF stream → ([(marker, payload)], entropy_bytes). Assumes the
    encode_jpeg layout: segments, SOS, entropy data, trailing EOI."""
    segs = []
    pos = 2
    while pos < len(stream):
        assert stream[pos] == 0xFF
        m = stream[pos + 1]
        (ln,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        segs.append((m, stream[pos + 4 : pos + 2 + ln]))
        pos += 2 + ln
        if m == 0xDA:
            return segs, stream[pos:-2]
    return segs, b""


def _pixels(w, h, ch, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    # smooth it so JPEG error stays small and structured
    return (
        base.astype(np.float64) * 0.3
        + np.linspace(0, 150, w)[None, :, None]
        + np.linspace(0, 60, h)[:, None, None]
    ).clip(0, 255).astype(np.uint8)


def test_flavor1_full_interchange_stream_rgb():
    w, h = 40, 24
    px = _pixels(w, h, 3)
    stream = encode_jpeg(w, h, px.tobytes(), channels=3, quality=92)
    body = stream
    tif = _tiff(
        {
            256: (4, [w]), 257: (4, [h]), 258: (3, [8, 8, 8]),
            259: (3, [6]), 262: (3, [6]), 277: (3, [3]),
            278: (4, [h]),
            273: (4, [8]), 279: (4, [len(stream)]),  # alias the stream
            512: (3, [1]), 513: (4, [8]), 514: (4, [len(stream)]),
        },
        body,
    )
    bands = decode_tiff(tif)
    jw, jh, c, buf = decode_jpeg(stream)
    ref = np.frombuffer(buf, np.uint8).reshape(jh, jw, c)
    for s in range(3):  # EXACT vs the standalone decode of the stream
        assert np.array_equal(bands[s], ref[:h, :w, s].astype(np.float64))
    # and sane vs the source (lossy tolerance)
    assert np.mean(np.abs(bands[0] - px[:, :, 0])) < 8.0


def test_flavor1_lossless_proc14_is_bit_exact():
    w, h = 21, 13
    rng = np.random.default_rng(3)
    samples = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    stream = encode_jpeg_lossless(w, h, samples, precision=12, predictor=1)
    tif = _tiff(
        {
            256: (4, [w]), 257: (4, [h]), 258: (3, [8]),
            259: (3, [6]), 262: (3, [1]), 277: (3, [1]),
            278: (4, [h]),
            512: (3, [14]), 513: (4, [8]), 514: (4, [len(stream)]),
        },
        stream,
    )
    (band,) = decode_tiff(tif)
    assert np.array_equal(band, samples.astype(np.float64))


def _split_strips(px, rps, channels, quality=90, subsample=False):
    """Encode each strip standalone, then return (table offsets dict
    builder inputs): per-strip entropy data + the shared raw tables."""
    h = px.shape[0]
    streams = [
        encode_jpeg(
            px.shape[1], min(rps, h - y0),
            px[y0 : y0 + min(rps, h - y0)].tobytes(),
            channels=channels, quality=quality, subsample=subsample,
        )
        for y0 in range(0, h, rps)
    ]
    segs, _ = _segments(streams[0])
    qt = {}
    dc = {}
    ac = {}
    for m, payload in segs:
        if m == 0xDB:
            qt[payload[0] & 0x0F] = payload[1:65]
        elif m == 0xC4:
            tc, th = payload[0] >> 4, payload[0] & 0x0F
            bits = payload[1:17]
            tab = payload[1 : 17 + sum(bits)]
            (dc if tc == 0 else ac)[th] = tab
    entropy = [_segments(s)[1] for s in streams]
    return streams, entropy, qt, dc, ac


def _build_flavor2(px, rps, channels, subsample=False):
    w, h = px.shape[1], px.shape[0]
    streams, entropy, qt, dc, ac = _split_strips(
        px, rps, channels, subsample=subsample
    )
    # per-component table indices into the encoder's table ids
    comp_tabs = [0] if channels == 1 else [0, 1, 1]
    body = bytearray()
    offs = {}
    for name, tabs in (("q", qt), ("dc", dc), ("ac", ac)):
        for tid, tab in sorted(tabs.items()):
            offs[(name, tid)] = 8 + len(body)
            body += tab
    strip_offs, strip_cnts = [], []
    for e in entropy:
        strip_offs.append(8 + len(body))
        strip_cnts.append(len(e))
        body += e
    entries = {
        256: (4, [w]), 257: (4, [h]),
        258: (3, [8] * channels),
        259: (3, [6]), 262: (3, [1 if channels == 1 else 6]),
        277: (3, [channels]), 278: (4, [rps]),
        273: (4, strip_offs), 279: (4, strip_cnts),
        512: (3, [1]),
        519: (4, [offs[("q", t)] for t in comp_tabs]),
        520: (4, [offs[("dc", t)] for t in comp_tabs]),
        521: (4, [offs[("ac", t)] for t in comp_tabs]),
    }
    if channels == 3:
        entries[530] = (3, [2, 2] if subsample else [1, 1])
    return _tiff(entries, bytes(body)), streams


def test_flavor2_tables_split_gray_strips():
    w, h, rps = 48, 24, 8
    px = _pixels(w, h, 1, seed=11)
    tif, streams = _build_flavor2(px, rps, channels=1)
    (band,) = decode_tiff(tif)
    # EXACT per strip vs standalone decodes of the original streams
    for i, s in enumerate(streams):
        jw, jh, c, buf = decode_jpeg(s)
        ref = np.frombuffer(buf, np.uint8).reshape(jh, jw, c)
        got = band[i * rps : i * rps + jh]
        assert np.array_equal(got, ref[:, :, 0].astype(np.float64)), i
    assert np.mean(np.abs(band - px[:, :, 0])) < 8.0


@pytest.mark.parametrize("subsample", [False, True])
def test_flavor2_tables_split_ycbcr_strips(subsample):
    w, h, rps = 32, 32, 16
    px = _pixels(w, h, 3, seed=19)
    tif, streams = _build_flavor2(px, rps, channels=3,
                                  subsample=subsample)
    bands = decode_tiff(tif)
    for i, s in enumerate(streams):
        jw, jh, c, buf = decode_jpeg(s)
        ref = np.frombuffer(buf, np.uint8).reshape(jh, jw, c)
        for b in range(3):
            got = bands[b][i * rps : i * rps + jh]
            assert np.array_equal(got, ref[:, :, b].astype(np.float64))
    assert np.mean(np.abs(bands[1] - px[:, :, 1])) < 10.0


def test_oldstyle_refusals_are_typed():
    w, h = 16, 16
    px = _pixels(w, h, 1, seed=2)
    # lossless strips (proc 14 without an interchange stream): refuse
    tif, _ = _build_flavor2(px, 8, channels=1)
    hacked = bytearray(tif)
    # patch JPEGProc (512) SHORT value from 1 to 14 in the IFD
    i = hacked.find(struct.pack("<HHI", 512, 3, 1))
    hacked[i + 8] = 14
    with pytest.raises(TiffFormatError, match="proc 14"):
        decode_tiff(bytes(hacked))
    # missing tables and no interchange stream: refuse
    stream = encode_jpeg(w, h, px.tobytes(), channels=1)
    tif2 = _tiff(
        {
            256: (4, [w]), 257: (4, [h]), 258: (3, [8]),
            259: (3, [6]), 262: (3, [1]), 277: (3, [1]), 278: (4, [h]),
            273: (4, [8]), 279: (4, [len(stream)]), 512: (3, [1]),
        },
        stream,
    )
    with pytest.raises(TiffFormatError, match="JPEGQTables"):
        decode_tiff(tif2)


def test_oldstyle_tiff_through_spark_scan(spark, tmp_path):
    """S1 integration: an old-style JPEG TIFF ingests through the
    distributed scan → decode_to_pixels path (explicit baseline codec
    — best_decoder may pick rasterio, whose GDAL build may refuse
    compression 6), and the pixel relation matches the standalone
    stream decode exactly."""
    import numpy as np

    from biggis_landuse_spark.sources.geotiff import (
        GeoTiffDecoder,
        decode_to_pixels,
        scan_geotiffs,
    )

    w, h = 24, 16
    px = _pixels(w, h, 1, seed=23)
    stream = encode_jpeg(w, h, px.tobytes(), channels=1, quality=90)
    tif = _tiff(
        {
            256: (4, [w]), 257: (4, [h]), 258: (3, [8]),
            259: (3, [6]), 262: (3, [1]), 277: (3, [1]), 278: (4, [h]),
            512: (3, [1]), 513: (4, [8]), 514: (4, [len(stream)]),
        },
        stream,
    )
    (tmp_path / "scene_oldjpeg.tif").write_bytes(tif)
    pixels = decode_to_pixels(
        scan_geotiffs(spark, str(tmp_path)), GeoTiffDecoder()
    )
    got = {
        (r["py"], r["px"]): r["value"]
        for r in pixels.where("band = 0").collect()
    }
    jw, jh, c, buf = decode_jpeg(stream)
    ref = np.frombuffer(buf, np.uint8).reshape(jh, jw, c)
    assert len(got) == w * h
    for (y, x), v in got.items():
        assert v == float(ref[y, x, 0])


def test_flavor2_strip_carrying_full_stream_decodes():
    # the non-conforming-writer path: strips hold complete SOI..EOI
    # streams; tables tags still present but the strip wins
    w, h, rps = 24, 16, 8
    px = _pixels(w, h, 1, seed=5)
    streams = [
        encode_jpeg(w, rps, px[y0 : y0 + rps].tobytes(), channels=1)
        for y0 in range(0, h, rps)
    ]
    _, _, qt, dc, ac = _split_strips(px, rps, 1)
    body = bytearray()
    offs = {}
    for name, tabs in (("q", qt), ("dc", dc), ("ac", ac)):
        for tid, tab in sorted(tabs.items()):
            offs[(name, tid)] = 8 + len(body)
            body += tab
    strip_offs, strip_cnts = [], []
    for s in streams:
        strip_offs.append(8 + len(body))
        strip_cnts.append(len(s))
        body += s
    tif = _tiff(
        {
            256: (4, [w]), 257: (4, [h]), 258: (3, [8]),
            259: (3, [6]), 262: (3, [1]), 277: (3, [1]), 278: (4, [rps]),
            273: (4, strip_offs), 279: (4, strip_cnts), 512: (3, [1]),
            519: (4, [offs[("q", 0)]]),
            520: (4, [offs[("dc", 0)]]),
            521: (4, [offs[("ac", 0)]]),
        },
        bytes(body),
    )
    (band,) = decode_tiff(tif)
    for i, s in enumerate(streams):
        jw, jh, c, buf = decode_jpeg(s)
        ref = np.frombuffer(buf, np.uint8).reshape(jh, jw, c)
        assert np.array_equal(
            band[i * rps : i * rps + jh], ref[:, :, 0].astype(np.float64)
        )
