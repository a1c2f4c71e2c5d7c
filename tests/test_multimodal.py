"""Multimodal binary-column plumbing (stubbed codecs, real Spark
plumbing): metadata expressions, decode batch shape, resize math,
frame sampling fan-out, feature extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark import multimodal as MM

PNG = b"\x89PNG\r\n\x1a\n" + bytes(range(32))
JPg = b"\xff\xd8\xff\xe0" + bytes(range(16))
RAW = bytes([7, 1, 2, 3, 4, 5, 6, 250])


@pytest.fixture()
def media_df(spark):
    rows = [(1, PNG), (2, JPg), (3, RAW)]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_media_metadata_jvm_side(spark, media_df):
    out = media_df.select("doc_id", *MM.media_metadata_cols("content"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == len(PNG)
    assert rows[1]["magic"] == "89504E47"
    assert rows[1]["kind"] == "image/png"
    assert rows[2]["kind"] == "image/jpeg"
    assert rows[3]["kind"] == "unknown"
    # must stay JVM-side: no python UDF nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_media_fake_codec_deterministic(spark, media_df):
    d1 = {r["doc_id"]: r for r in MM.decode_media(media_df).collect()}
    d2 = {r["doc_id"]: r for r in MM.decode_media(media_df).collect()}
    for doc_id in (1, 2, 3):
        r = d1[doc_id]
        assert r["width"] >= 1 and r["height"] >= 1 and r["channels"] >= 1
        assert len(r["pixels"]) == r["width"] * r["height"] * r["channels"]
        assert all(0.0 <= p <= 1.0 for p in r["pixels"])
        assert r["pixels"] == d2[doc_id]["pixels"]  # retry-stable


def test_decode_media_real_codec_raises(media_df):
    with pytest.raises(NotImplementedError):
        MM.decode_media(media_df, codec="pillow")


def test_resize_images(spark, media_df):
    resized = MM.resize_images(MM.decode_media(media_df), out_w=2, out_h=2)
    for r in resized.collect():
        assert (r["width"], r["height"]) == (2, 2)
        assert len(r["pixels"]) == 2 * 2 * r["channels"]


def test_sample_frames_fanout(spark, media_df):
    frames = MM.sample_frames(media_df, every_n=2, frame_size=8)
    got = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.collect_set("frame_no").alias("fnos")
    )
    rows = {r["doc_id"]: r for r in got.collect()}
    # PNG is 40 bytes → 5 frames → keep 0, 2, 4
    assert rows[1]["n"] == 3 and sorted(rows[1]["fnos"]) == [0, 2, 4]
    # RAW is 8 bytes → 1 frame
    assert rows[3]["n"] == 1


def test_media_features(spark, media_df):
    feats = MM.media_features(MM.decode_media(media_df))
    for r in feats.collect():
        assert r["n_pixels"] >= 1
        assert 0.0 <= r["mean"] <= 1.0
        assert 0.0 <= r["p_bright"] <= 1.0


def test_decode_media_bmp_real_codec(spark):
    from biggis_landuse_spark.multimodal import decode_media
    from biggis_landuse_spark.sources.bmp import encode_bmp

    w, h = 4, 2
    rgb0 = bytes((i * 7) % 256 for i in range(w * h * 3))
    rgb1 = bytes((i * 13 + 5) % 256 for i in range(w * h * 3))
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_bmp(w, h, rgb0))),
            (1, bytearray(encode_bmp(w, h, rgb1, top_down=True))),
        ],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in decode_media(df, codec="bmp").collect()}
    for i, rgb in ((0, rgb0), (1, rgb1)):
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["pixels"] == [b / 255.0 for b in rgb]


def test_decode_media_gif_real_codec(spark):
    from biggis_landuse_spark.multimodal import decode_media
    from biggis_landuse_spark.sources.gif import encode_gif

    w, h = 9, 4
    rgb = bytes(((i * 5) % 11) * 20 for i in range(w * h * 3))
    df = spark.createDataFrame(
        [(0, bytearray(encode_gif(w, h, rgb)))], "doc_id long, content binary"
    )
    r = decode_media(df, codec="gif").collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    assert r["pixels"] == [b / 255.0 for b in rgb]


def test_gif_codec_interlaced_and_errors(spark):
    import pytest as _pytest
    from biggis_landuse_spark.sources.gif import (
        GifFormatError,
        decode_gif,
        encode_gif,
    )

    # interlace: reorder rows of an encoded image by hand-building the
    # descriptor with the interlace flag and pass-ordered row data
    import struct

    w, h = 4, 8
    rows = [bytes([r]) * w for r in range(h)]
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(start, h, step)]
    flat = b"".join(rows[y] for y in order)
    # 256-entry palette: index i → (i, i, i)
    pal = bytes(v for i in range(256) for v in (i, i, i))
    min_code = 8
    clear, eoi = 256, 257
    stream = bytearray()
    acc = nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for b in flat:
        put(b)
        put(clear)  # keep table minimal; valid stream
    put(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    gif = bytearray(b"GIF89a") + struct.pack("<HHBBB", w, h, 0x87, 0, 0) + pal
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40) + bytes([min_code])
    i = 0
    while i < len(stream):
        chunk = stream[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
        i += 255
    gif += b"\x00\x3b"
    w2, h2, c, out = decode_gif(bytes(gif))
    assert (w2, h2, c) == (w, h, 3)
    assert out == b"".join(bytes([r]) * (w * 3) for r in range(h))

    with _pytest.raises(GifFormatError):
        decode_gif(b"NOTAGIF")
    with _pytest.raises(GifFormatError):
        encode_gif(1, 1, b"\x00\x00")  # wrong buffer size


def test_media_codecs_reject_garbage_quickly():
    # random bytes must raise a typed error (never hang or return junk)
    import random

    from biggis_landuse_spark.sources.bmp import decode_bmp
    from biggis_landuse_spark.sources.gif import GifFormatError, decode_gif
    from biggis_landuse_spark.sources.png import decode_png

    random.seed(3)
    for n in (0, 1, 13, 54, 200, 4096):
        blob = bytes(random.randrange(256) for _ in range(n))
        for dec, errs in (
            (decode_bmp, (ValueError,)),
            (decode_gif, (GifFormatError,)),
            (decode_png, (ValueError, Exception)),
        ):
            try:
                dec(blob)
            except Exception:
                continue
            raise AssertionError(f"{dec.__name__} accepted {n} garbage bytes")
    # header-prefixed truncations: magic right, body garbage
    for prefix, dec in ((b"BM", decode_bmp), (b"GIF89a", decode_gif)):
        blob = prefix + bytes(random.randrange(256) for _ in range(80))
        try:
            dec(blob)
        except Exception:
            pass
        else:
            raise AssertionError(f"{dec.__name__} accepted truncated header blob")


def test_gif_subframe_bounds_and_dims_contract():
    import struct

    import pytest as _pytest

    from biggis_landuse_spark.sources.gif import GifFormatError, decode_gif, encode_gif

    rgb = bytes(range(48)) * 1  # 4x4 distinct values
    data = bytearray(encode_gif(4, 4, rgb))
    flags = data[10]
    desc = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    assert data[desc] == 0x2C
    # frame offset (1, 0) pushes a 4-wide frame past the 4-wide
    # screen → typed error, never silent clipping
    struct.pack_into("<H", data, desc + 1, 1)
    with _pytest.raises(GifFormatError, match="exceeds logical screen"):
        decode_gif(bytes(data))
    # back at (0, 0): decode keeps returning HEADER dims even though
    # the frame stays 4x4 (composited identity)
    struct.pack_into("<H", data, desc + 1, 0)
    w, h, c, out = decode_gif(bytes(data))
    assert (w, h, c) == (4, 4, 3)
    assert out == rgb


def test_bmp_rejects_crafted_headers():
    import struct

    import pytest as _pytest

    from biggis_landuse_spark.sources.bmp import decode_bmp, encode_bmp

    good = encode_bmp(3, 2, bytes(3 * 2 * 3))
    assert decode_bmp(good)[0] == 3

    neg_w = bytearray(good)
    struct.pack_into("<i", neg_w, 18, -3)
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(bytes(neg_w))

    zero_h = bytearray(good)
    struct.pack_into("<i", zero_h, 22, 0)
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(bytes(zero_h))

    # pixel offset pointing INTO the header: header bytes must never
    # be silently read as pixels
    hdr_px = bytearray(good)
    struct.pack_into("<I", hdr_px, 10, 14)
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(bytes(hdr_px))


def test_gif_offset_subframe_composites_onto_screen():
    # optimized GIFs store the first frame as a sub-rectangle at an
    # offset; decode must composite onto the logical screen (background
    # fill + GCE transparency), returning HEADER dims — not reject, and
    # never return sub-frame dims
    import struct

    from biggis_landuse_spark.sources.gif import GifFormatError, decode_gif

    w, h = 6, 4          # logical screen
    ix, iy, iw, ih = 3, 1, 2, 2  # sub-frame placement
    frame_idx = [10, 11, 12, 13]
    pal = bytes(v for i in range(256) for v in (i, i, i))  # gray GCT

    min_code = 8
    clear, eoi = 256, 257
    stream = bytearray()
    acc = nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for b in frame_idx:
        put(b)
        put(clear)
    put(eoi)
    if nbits:
        stream.append(acc & 0xFF)

    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0x87, 7, 0) + pal  # bg index 7
    # GCE: transparency on, transparent index 11
    gif += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 11]) + b"\x00"
    gif += b"\x2c" + struct.pack("<HHHHB", ix, iy, iw, ih, 0x00)
    gif += bytes([min_code])
    i = 0
    while i < len(stream):
        chunk = stream[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
        i += 255
    gif += b"\x00\x3b"

    W, H, C, out = decode_gif(bytes(gif))
    assert (W, H, C) == (w, h, 3)  # header dims, not 2x2

    def px(x, y):
        j = 3 * (y * w + x)
        return tuple(out[j : j + 3])

    assert px(0, 0) == (7, 7, 7)          # background fill
    assert px(ix, iy) == (10, 10, 10)     # frame top-left
    assert px(ix + 1, iy) == (7, 7, 7)    # transparent idx 11 → bg
    assert px(ix, iy + 1) == (12, 12, 12)
    assert px(ix + 1, iy + 1) == (13, 13, 13)
    assert px(w - 1, h - 1) == (7, 7, 7)

    # a frame exceeding the screen is still a typed error
    bad = bytearray(gif)
    off = 13 + 768 + 8  # header + GCT + GCE block → image descriptor
    assert bad[off] == 0x2C
    bad[off + 1 : off + 5] = struct.pack("<HH", 5, 3)  # 2x2 at (5,3) > 6x4
    import pytest as _pytest

    with _pytest.raises(GifFormatError, match="exceeds logical screen"):
        decode_gif(bytes(bad))
