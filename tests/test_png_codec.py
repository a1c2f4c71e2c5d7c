"""Stdlib PNG decoder: round-trip against the stdlib encoder
(serving.encode_png_rgba), hand-filtered streams for filters 1-4,
refusals, and the real decode_media(codec="png") Spark path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from biggis_landuse_spark.serving import encode_png_rgba
from biggis_landuse_spark.sources.png import PngFormatError, decode_png


def test_roundtrip_encoder_rgba():
    w, h = 5, 3
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, w * h * 4, dtype=np.uint8).tobytes()
    png = encode_png_rgba(w, h, rgba)
    gw, gh, gc, buf = decode_png(png)
    assert (gw, gh, gc) == (w, h, 4)
    assert buf == rgba


def _png(width, height, ctype, rows_with_filters):
    """Assemble a PNG from (filter_byte, row_bytes) pairs."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    raw = b"".join(bytes([f]) + r for f, r in rows_with_filters)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_filter_types_gray(ftype):
    # 4×3 grayscale target image; apply the filter forward by the spec
    # and check the decoder inverts it exactly
    want = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [90, 80, 70, 60]], dtype=np.uint8
    )
    rows = []
    prev = np.zeros(4, dtype=np.int32)
    for y in range(3):
        cur = want[y].astype(np.int32)
        filt = np.zeros(4, dtype=np.int32)
        for i in range(4):
            left = cur[i - 1] if i else 0
            upleft = int(prev[i - 1]) if i else 0
            up = int(prev[i])
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
            filt[i] = (cur[i] - pred) & 0xFF
        rows.append((ftype, bytes(filt.astype(np.uint8))))
        prev = cur
    png = _png(4, 3, 0, rows)
    w, h, c, buf = decode_png(png)
    assert (w, h, c) == (4, 3, 1)
    np.testing.assert_array_equal(
        np.frombuffer(buf, np.uint8).reshape(3, 4), want
    )


def test_rgb_sub_filter_uses_channel_stride():
    # Sub filter predicts from the pixel CHANNELS bytes back, not 1
    want = np.array([[[100, 0, 50], [110, 5, 60]]], dtype=np.uint8)  # 2×1 RGB
    cur = want[0].ravel().astype(np.int32)
    filt = cur.copy()
    filt[3:] = (cur[3:] - cur[:-3]) & 0xFF
    png = _png(2, 1, 2, [(1, bytes(filt.astype(np.uint8)))])
    w, h, c, buf = decode_png(png)
    assert (w, h, c) == (2, 1, 3)
    assert buf == want.tobytes()


def test_refusals():
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"JFIFnot-a-png")
    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    # sub-byte depths stay refused at the header
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    png4 = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr4)
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(png4)
    # 16-bit parses (r9) but cannot ride the byte contract
    from biggis_landuse_spark.sources.png import encode_png_gray16

    png16 = encode_png_gray16(2, 2, np.full((2, 2), 40000, np.uint16))
    with pytest.raises(PngFormatError, match="decode_png_deep"):
        decode_png(png16)
    # headerless/missing IDAT is a typed error, not a zlib traceback
    bad = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    )
    with pytest.raises(PngFormatError, match="IDAT"):
        decode_png(bad)


def test_png16_round_trip_and_filtered_16bit_decode():
    from biggis_landuse_spark.sources.png import (
        decode_png_deep,
        encode_png_gray16,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, size=(13, 21), dtype=np.uint16)
    blob = encode_png_gray16(21, 13, img)
    w, h, c, arr = decode_png_deep(blob)
    assert (w, h, c) == (21, 13, 1)
    assert np.array_equal(arr[:, :, 0], img)  # bit-exact
    # 8-bit frames widen to uint16 through the deep entry
    rgba = rng.integers(0, 256, 3 * 2 * 4, dtype=np.uint8)
    blob8 = encode_png_rgba(3, 2, rgba.tobytes())
    w, h, c, arr8 = decode_png_deep(blob8)
    assert (w, h, c) == (3, 2, 4) and arr8.dtype == np.uint16
    assert np.array_equal(
        arr8.reshape(-1).astype(np.uint8), rgba
    )
    # hand-build a FILTERED 16-bit stream (Sub + Up + Paeth rows) to
    # pin the byte-level bpp-offset unfilter at depth 16
    import zlib as _z

    stride = 21 * 2
    be = img.astype(">u2").tobytes()
    rows = bytearray()
    prev = bytearray(stride)
    for y in range(13):
        row = bytearray(be[y * stride : (y + 1) * stride])
        ftype = (1, 2, 4)[y % 3]
        enc = bytearray(stride)
        for i in range(stride):
            left = row[i - 2] if i >= 2 else 0
            up = prev[i]
            upleft = prev[i - 2] if i >= 2 else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            else:
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = (
                    left if pa <= pb and pa <= pc else (up if pb <= pc
                                                        else upleft)
                )
            enc[i] = (row[i] - pred) & 0xFF
        rows += bytes([ftype]) + enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", 21, 13, 16, 0, 0, 0, 0)

    def chunk(tag, payload):
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    filt = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    w, h, c, arr2 = decode_png_deep(filt)
    assert np.array_equal(arr2[:, :, 0], img)


def test_decode_media_png_codec_spark(spark):
    from biggis_landuse_spark.multimodal import decode_media, media_features

    rng = np.random.default_rng(9)
    rows = []
    truths = {}
    for doc_id in range(4):
        w, h = 3 + doc_id, 2 + doc_id
        rgba = rng.integers(0, 256, w * h * 4, dtype=np.uint8)
        rows.append((doc_id, bytearray(encode_png_rgba(w, h, rgba.tobytes()))))
        truths[doc_id] = (w, h, rgba)
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in decode_media(df, codec="png").collect()}
    for doc_id, (w, h, rgba) in truths.items():
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 4)
        np.testing.assert_allclose(
            np.array(r["pixels"]), rgba.astype(np.float64) / 255.0
        )
    # the downstream feature kernel runs unchanged on real pixels
    feats = media_features(decode_media(df, codec="png")).collect()
    assert len(feats) == 4
    for f in feats:
        w, h, rgba = truths[f["doc_id"]]
        assert f["n_pixels"] == w * h * 4
        assert f["mean"] == pytest.approx(float(rgba.mean()) / 255.0, rel=1e-9)
