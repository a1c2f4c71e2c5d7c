"""Pure-Python baseline TIFF codec: byte-exact round-trips across the
layout × compression × dtype × planar matrix, hand-crafted big-endian
decode, GeoTIFF affine tags, honest refusals, and the Spark ingest /
export paths reading REAL .tif files with the default decoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from biggis_landuse_spark.sources.tiff import (
    TiffFormatError,
    decode_tiff,
    encode_tiff,
    georef_of,
)


def _ramp(h, w, dtype, bands=1, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return [
            rng.uniform(-1000, 1000, (h, w)).astype(dtype) for _ in range(bands)
        ]
    info = np.iinfo(dtype)
    return [
        rng.integers(info.min, info.max, (h, w), dtype=dtype, endpoint=True)
        for _ in range(bands)
    ]


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "uint32", "int32", "float32", "float64"])
def test_roundtrip_dtypes_stripped(dtype):
    bands = _ramp(13, 7, dtype)
    got = decode_tiff(encode_tiff(bands))
    np.testing.assert_array_equal(got[0], bands[0].astype(np.float64))


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("planar", [False, True])
def test_roundtrip_multiband_multistrip(compression, planar):
    bands = _ramp(20, 9, "uint16", bands=3)
    payload = encode_tiff(
        bands, compression=compression, planar=planar, rows_per_strip=6
    )
    got = decode_tiff(payload)
    assert len(got) == 3
    for g, b in zip(got, bands):
        np.testing.assert_array_equal(g, b.astype(np.float64))


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("planar", [False, True])
def test_roundtrip_tiled_edge_crop(compression, planar):
    # 21×13 image with 8×8 tiles: right/bottom edge tiles are padded
    # in the file and must be cropped back on decode
    bands = _ramp(21, 13, "float32", bands=2)
    payload = encode_tiff(
        bands, tile_size=8, compression=compression, planar=planar
    )
    got = decode_tiff(payload)
    for g, b in zip(got, bands):
        assert g.shape == (21, 13)
        np.testing.assert_array_equal(g, b.astype(np.float64))


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int32"])
def test_roundtrip_predictor_horizontal_differencing(dtype):
    bands = _ramp(11, 17, dtype, bands=2)
    payload = encode_tiff(bands, compression="deflate", predictor=True)
    got = decode_tiff(payload)
    for g, b in zip(got, bands):
        np.testing.assert_array_equal(g, b.astype(np.float64))


def test_big_endian_decode():
    # hand-crafted MM file: 2×3 uint16, one uncompressed strip
    vals = [1, 2, 3, 4, 5, 65535]
    pix = struct.pack(">6H", *vals)
    ifd_off = 8 + len(pix)
    tags = [
        (256, 3, 1, 3),  # width
        (257, 3, 1, 2),  # height
        (258, 3, 1, 16),
        (259, 3, 1, 1),
        (273, 4, 1, 8),  # strip offset
        (277, 3, 1, 1),
        (278, 3, 1, 2),
        (279, 4, 1, len(pix)),
    ]
    body = b"MM" + struct.pack(">HI", 42, ifd_off) + pix
    body += struct.pack(">H", len(tags))
    for tag, typ, cnt, val in tags:
        if typ == 3:
            field = struct.pack(">H", val) + b"\x00\x00"
        else:
            field = struct.pack(">I", val)
        body += struct.pack(">HHI", tag, typ, cnt) + field
    body += b"\x00\x00\x00\x00"
    got = decode_tiff(body)
    np.testing.assert_array_equal(
        got[0], np.array(vals, dtype=np.float64).reshape(2, 3)
    )


def test_lzw_known_vector_msb_first_early_change():
    # independent re-derivation: pack the known TIFF-LZW code sequence
    # for bytes 07 07 07 08 08 07 — CLEAR, 7, 258, 8, 8, 7, EOI at 9
    # bits, MSB-first — without using the codec's own encoder
    from biggis_landuse_spark.sources.tiff import _lzw_decode

    codes = [256, 7, 258, 8, 8, 7, 257]
    acc, nbits, out = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert _lzw_decode(bytes(out)) == b"\x07\x07\x07\x08\x08\x07"


def test_lzw_early_change_width_boundary():
    # a stream long enough to cross the 9→10→11-bit width boundaries:
    # incompressible random bytes add one table entry per code
    from biggis_landuse_spark.sources.tiff import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(13)
    raw = bytes(rng.integers(0, 256, 3000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(raw)) == raw
    # and one that forces a table reset (> 4093 entries)
    raw = bytes(rng.integers(0, 4, 120_000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(raw)) == raw


def test_packbits_spec_vector():
    # the worked example from the TIFF 6.0 spec PackBits section
    from biggis_landuse_spark.sources.tiff import _packbits_decode

    packed = bytes.fromhex("FEAA028000 2AFDAA03 80002A22 F7AA".replace(" ", ""))
    expect = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10
    )
    assert _packbits_decode(packed) == expect


def test_georef_tags_roundtrip():
    bands = _ramp(4, 4, "uint8")
    payload = encode_tiff(bands, georef=(8.4, 49.02, 0.001, 0.0005))
    assert georef_of(payload) == (8.4, 49.02, 0.001, 0.0005)
    # no geo tags → identity grid
    assert georef_of(encode_tiff(bands)) == (0.0, 0.0, 1.0, 1.0)


def test_honest_refusals():
    with pytest.raises(TiffFormatError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04junk")
    # BigTIFF is now supported — but a truncated header must refuse
    with pytest.raises(TiffFormatError, match="truncated BigTIFF"):
        decode_tiff(b"II" + struct.pack("<HI", 43, 8))
    with pytest.raises(TiffFormatError, match="bad BigTIFF header"):
        decode_tiff(b"II" + struct.pack("<HHHQ", 43, 4, 0, 16))
    # new-style JPEG (7) is now a real codec: a compression=7 tag over
    # non-JPEG segment bytes must raise the codec's typed error, not
    # garble; old-style JPEG (6) and unknown codes still refuse here
    payload = bytearray(encode_tiff(_ramp(4, 4, "uint8")))
    idx = payload.find(struct.pack("<HHI", 259, 3, 1))
    payload[idx + 8 : idx + 10] = struct.pack("<H", 7)
    from biggis_landuse_spark.sources.jpeg import JpegFormatError

    with pytest.raises(JpegFormatError, match="not a JPEG"):
        decode_tiff(bytes(payload))
    payload[idx + 8 : idx + 10] = struct.pack("<H", 6)  # old-style JPEG
    with pytest.raises(TiffFormatError, match="old-style JPEG"):
        decode_tiff(bytes(payload))
    payload[idx + 8 : idx + 10] = struct.pack("<H", 34712)  # JPEG2000
    with pytest.raises(TiffFormatError, match="not supported"):
        decode_tiff(bytes(payload))


# ---------------------------------------------------------------------------
# Spark paths: ingest real .tif with the DEFAULT decoder; real .tif export
# ---------------------------------------------------------------------------


def test_ingest_real_geotiff_default_decoder(spark, tmp_path):
    from biggis_landuse_spark.sources.geotiff import ingest_geotiff

    h = w = 48  # re-tiles onto a 16-px grid as 3×3 tiles
    band = np.arange(h * w, dtype=np.float32).reshape(h, w)
    (tmp_path / "scene.tif").write_bytes(
        encode_tiff([band], tile_size=16, compression="deflate")
    )
    tiles = ingest_geotiff(
        spark, str(tmp_path / "scene.tif"), layer="real", tile_size=16
    )
    got = {
        (r["tile_col"], r["tile_row"]): r["tile"]["bands"][0]
        for r in tiles.collect()
    }
    assert len(got) == 9
    for (tc, tr), vals in got.items():
        want = band[tr * 16 : (tr + 1) * 16, tc * 16 : (tc + 1) * 16]
        np.testing.assert_array_equal(
            np.array(vals, dtype=np.float64).reshape(16, 16),
            want.astype(np.float64),
        )


def test_ingest_multiband_real_geotiff(spark, tmp_path):
    from biggis_landuse_spark.sources.geotiff import ingest_geotiff

    bands = _ramp(16, 16, "uint16", bands=3, seed=7)
    (tmp_path / "mb.tif").write_bytes(encode_tiff(bands, rows_per_strip=5))
    tiles = ingest_geotiff(spark, str(tmp_path / "mb.tif"), layer="mb", tile_size=16)
    row = tiles.first()
    assert len(row["tile"]["bands"]) == 3
    for b, want in enumerate(bands):
        np.testing.assert_array_equal(
            np.array(row["tile"]["bands"][b], dtype=np.float64).reshape(16, 16),
            want.astype(np.float64),
        )


def test_export_tiles_emits_valid_tiff(spark):
    from biggis_landuse_spark.fixtures import fixture_layer
    from biggis_landuse_spark.sources.geotiff import TiffEncoder, export_tiles

    tiles = fixture_layer(spark, "b4_red")
    out = export_tiles(tiles, encoder=TiffEncoder())
    rows = out.collect()
    assert len(rows) == tiles.count()
    want = {
        (r["tile_col"], r["tile_row"]): r["tile"]["bands"][0]
        for r in tiles.collect()
    }
    for r in rows[:4]:
        decoded = decode_tiff(bytes(r["payload"]))  # a REAL .tif payload
        np.testing.assert_array_equal(
            decoded[0].ravel(),
            np.array(want[(r["tile_col"], r["tile_row"])], dtype=np.float64),
        )


# ---------------------------------------------------------------------------
# BigTIFF (magic 43): the >4 GB layout, round-tripped at small scale
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"tile_size": 16, "compression": "deflate"},
        {"rows_per_strip": 8, "compression": "lzw", "predictor": True},
        {"compression": "packbits"},
    ],
)
def test_bigtiff_round_trip(kwargs):
    band = (np.arange(29 * 37).reshape(29, 37) % 251).astype(np.uint16)
    data = encode_tiff([band], bigtiff=True, **kwargs)
    assert data[:4] == b"II+\x00"  # magic 43
    (out,) = decode_tiff(data)
    np.testing.assert_array_equal(out, band.astype(np.float64))


def test_bigtiff_multiband_float_georef_and_jpeg():
    f32 = (np.arange(29 * 37).reshape(29, 37) / 7.0).astype(np.float32)
    data = encode_tiff(
        [f32, f32 * 2], bigtiff=True, tile_size=16, georef=(5.0, 45.0, 0.5, 0.5)
    )
    outs = decode_tiff(data)
    np.testing.assert_allclose(outs[1], (f32 * 2).astype(np.float64))
    assert georef_of(data) == (5.0, 45.0, 0.5, 0.5)

    b8 = (np.arange(29 * 37).reshape(29, 37) % 200).astype(np.uint8)
    data = encode_tiff([b8], bigtiff=True, compression="jpeg", rows_per_strip=16)
    (out,) = decode_tiff(data)
    assert np.abs(out - b8).max() <= 8  # lossy


def test_bigtiff_ingest_through_spark(spark, tmp_path):
    from biggis_landuse_spark.sources.geotiff import ingest_geotiff

    band = np.arange(32 * 32, dtype=np.float32).reshape(32, 32)
    (tmp_path / "big.tif").write_bytes(
        encode_tiff([band], bigtiff=True, tile_size=16, compression="deflate")
    )
    tiles = ingest_geotiff(spark, str(tmp_path / "big.tif"), layer="big", tile_size=16)
    got = {
        (r["tile_col"], r["tile_row"]): r["tile"]["bands"][0]
        for r in tiles.collect()
    }
    assert len(got) == 4
    for (tc, tr), vals in got.items():
        want = band[tr * 16 : (tr + 1) * 16, tc * 16 : (tc + 1) * 16]
        np.testing.assert_array_equal(
            np.array(vals, dtype=np.float64).reshape(16, 16),
            want.astype(np.float64),
        )


# -- 16-bit lossless JPEG-in-TIFF (SOF3 segments) — r8 session 2 ------------


class TestJpegLosslessInTiff:
    def test_roundtrip_stripped_and_tiled(self):
        import numpy as np

        from biggis_landuse_spark.sources.tiff import (
            decode_tiff,
            encode_tiff,
        )

        rng = np.random.default_rng(31)
        bands = [
            rng.integers(0, 65536, (37, 23)).astype(np.uint16)
            for _ in range(3)
        ]
        for kw in ({}, {"rows_per_strip": 10}, {"tile_size": 16}):
            blob = encode_tiff(bands, compression="jpeg_lossless", **kw)
            out = decode_tiff(blob)
            assert len(out) == 3
            for a, b in zip(bands, out):
                assert np.array_equal(b, a.astype(np.float64)), kw

    def test_segments_are_sof3_streams(self):
        import numpy as np

        from biggis_landuse_spark.sources.tiff import encode_tiff

        img = np.arange(64 * 64, dtype=np.uint16).reshape(64, 64)
        blob = encode_tiff([img], compression="jpeg_lossless")
        assert b"\xff\xc3" in blob  # SOF3 marker inside the segment

    def test_honest_bounds(self):
        import numpy as np
        import pytest

        from biggis_landuse_spark.sources.tiff import encode_tiff

        img8 = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError, match="uint16"):
            encode_tiff([img8], compression="jpeg_lossless")
        img16 = np.zeros((8, 8), np.uint16)
        with pytest.raises(ValueError, match="predictor"):
            encode_tiff(
                [img16], compression="jpeg_lossless", predictor=True
            )


class TestMultiIfd:
    """Multi-IFD chain walking (r10, VERDICT r9 #2): COG overviews and
    multi-page archives, previously invisible (header + IFD0 only)."""

    def _cog(self, dtype=np.float64, **kw):
        from biggis_landuse_spark.sources.tiff import encode_tiff_multi

        full = (np.arange(64 * 64, dtype=np.int64) % 16).astype(
            dtype
        ).reshape(64, 64)
        ov1 = full.reshape(32, 2, 32, 2).sum(axis=(1, 3)) / 4
        ov2 = ov1.reshape(16, 2, 16, 2).sum(axis=(1, 3)) / 4
        blob = encode_tiff_multi(
            [[full], [ov1.astype(dtype)], [ov2.astype(dtype)]],
            georef=(10.0, 50.0, 0.001, 0.001),
            **kw,
        )
        return blob, full, ov1.astype(dtype), ov2.astype(dtype)

    def test_cog_round_trip_all_ifds(self):
        from biggis_landuse_spark.sources.tiff import (
            decode_tiff,
            georef_of,
            tiff_pages,
        )

        blob, full, ov1, ov2 = self._cog(
            compression="deflate", tile_size=32
        )
        pages = tiff_pages(blob)
        assert [p["width"] for p in pages] == [64, 32, 16]
        assert [p["reduced"] for p in pages] == [False, True, True]
        # ingest's default stays the full-res IFD0
        assert np.array_equal(decode_tiff(blob)[0], full)
        assert np.array_equal(decode_tiff(blob, ifd=1)[0], ov1)
        assert np.array_equal(decode_tiff(blob, ifd=2)[0], ov2)
        # geo tags live on IFD0 (the COG convention)
        assert georef_of(blob) == (10.0, 50.0, 0.001, 0.001)

    def test_cog_bigtiff_and_multipage(self):
        from biggis_landuse_spark.sources.tiff import (
            decode_tiff,
            encode_tiff_multi,
            tiff_pages,
        )

        blob, _full, ov1, _ov2 = self._cog(bigtiff=True)
        assert len(tiff_pages(blob)) == 3
        assert np.array_equal(decode_tiff(blob, ifd=1)[0], ov1)
        # multi-page: one band per page, subfile type 2
        a = np.ones((8, 8), np.uint8)
        mp = encode_tiff_multi([[a], [a * 2]], subfile_types=[2, 2])
        pages = tiff_pages(mp)
        assert [p["page"] for p in pages] == [True, True]
        assert decode_tiff(mp, ifd=1)[0][0, 0] == 2.0

    def test_ifd_chain_guards(self):
        from biggis_landuse_spark.sources.tiff import (
            TiffFormatError,
            decode_tiff,
            encode_tiff,
            parse_ifds,
        )

        blob = bytearray(encode_tiff([np.zeros((4, 4), np.uint8)]))
        with pytest.raises(TiffFormatError, match="has 1"):
            decode_tiff(bytes(blob), ifd=3)
        # craft a cycle: point the (single) IFD's next pointer at the
        # IFD itself
        (ifd_off,) = struct.unpack("<I", blob[4:8])
        (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
        nxt_pos = ifd_off + 2 + 12 * n
        struct.pack_into("<I", blob, nxt_pos, ifd_off)
        with pytest.raises(TiffFormatError, match="cycle"):
            parse_ifds(bytes(blob))

    def test_scan_pages_and_pyramid_from_overviews_equality(
        self, spark, tmp_path
    ):
        # the done-criterion equality: a COG whose overviews are exact
        # mean-2x2 reductions must ingest (ingest_geotiff_overviews)
        # into EXACTLY the levels build_pyramid would compute from
        # IFD0 — stored overviews replace recompute, not approximate it
        from biggis_landuse_spark.catalog import LayerCatalog
        from biggis_landuse_spark.operators.pyramid import build_pyramid
        from biggis_landuse_spark.sources.geotiff import (
            ingest_geotiff,
            ingest_geotiff_overviews,
            scan_geotiff_pages,
        )

        blob, _f, _o1, _o2 = self._cog(compression="deflate")
        d = tmp_path / "cog"
        d.mkdir()
        (d / "scene.tif").write_bytes(blob)

        pages = scan_geotiff_pages(spark, str(d)).orderBy("ifd").collect()
        assert [p["ifd"] for p in pages] == [0, 1, 2]
        assert [p["reduced"] for p in pages] == [False, True, True]

        cat = LayerCatalog(spark, str(tmp_path / "cat"))
        written = ingest_geotiff_overviews(
            spark, str(d), "cog", cat, base_zoom=2, tile_size=32
        )
        assert written == [2, 1, 0]

        tiles = ingest_geotiff(
            spark, str(d), "ref", tile_size=32
        ).select(
            "tile_col", "tile_row",
            F.lit(None).cast("timestamp").alias("ts"), "tile",
        )
        cat.write_layer(tiles, "ref", 2)
        build_pyramid(cat, "ref", from_zoom=2, to_zoom=0)

        def grid(layer, zoom):
            return {
                (r["tile_col"], r["tile_row"]): r["tile"]["bands"]
                for r in cat.read_layer(layer, zoom).collect()
            }

        for zoom in (2, 1, 0):
            assert grid("cog", zoom) == grid("ref", zoom), zoom


class TestPartialDecode:
    """Row-banded partial decode (r10: the scene-ingest parallelism
    primitive): rows=(y0,y1) must equal the full decode's slice on
    every layout, and segments outside the band never decompress."""

    @pytest.mark.parametrize(
        "kw",
        [
            {"compression": "deflate", "tile_size": 16},
            {"compression": "lzw", "rows_per_strip": 8, "predictor": True},
            {"compression": "packbits", "rows_per_strip": 5},
            {"compression": "none", "tile_size": 16, "planar": True},
        ],
    )
    def test_rows_equal_full_slice(self, kw):
        rng = np.random.default_rng(7)
        bands = [
            rng.integers(0, 4000, (37, 29)).astype(np.uint16)
            for _ in range(2)
        ]
        blob = encode_tiff(bands, **kw)
        full = decode_tiff(blob)
        for y0, y1 in ((0, 37), (5, 21), (16, 17), (30, 37), (7, 7)):
            part = decode_tiff(blob, rows=(y0, y1))
            for b in range(2):
                assert np.array_equal(part[b], full[b][y0:y1]), (kw, y0, y1)

    def test_band_outside_image_clamps(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = encode_tiff([img])
        assert decode_tiff(blob, rows=(6, 99))[0].shape == (2, 8)
        assert decode_tiff(blob, rows=(50, 60))[0].shape == (0, 8)

    def test_chunked_ingest_parity(self, spark, tmp_path):
        # decode_to_pixels_georef_chunked must produce EXACTLY the
        # plain path's pixel rows (global py, same affine), with a
        # chunk size that straddles segment boundaries
        from biggis_landuse_spark.sources.geotiff import (
            GeoTiffDecoder,
            decode_to_pixels_georef,
            decode_to_pixels_georef_chunked,
            scan_geotiffs,
        )

        rng = np.random.default_rng(11)
        d = tmp_path / "scene"
        d.mkdir()
        for name in ("a", "b"):
            bands = [
                rng.integers(0, 9000, (45, 33)).astype(np.uint16)
                for _ in range(2)
            ]
            (d / f"{name}.tif").write_bytes(
                encode_tiff(
                    bands, compression="deflate", tile_size=16,
                    georef=(7.0, 48.0, 0.001, 0.001),
                )
            )
        plain = decode_to_pixels_georef(
            scan_geotiffs(spark, str(d)), GeoTiffDecoder()
        )
        chunked = decode_to_pixels_georef_chunked(
            spark, str(d), chunk_rows=13
        )
        assert chunked.rdd.getNumPartitions() == 8  # ceil(45/13) x 2
        key = ["path", "band", "py", "px"]
        a = sorted(map(tuple, plain.select(*key, "value", "x0", "dy").collect()))
        b = sorted(map(tuple, chunked.select(*key, "value", "x0", "dy").collect()))
        assert a == b


class TestScanRobustness:
    """r11 ADVICE pins: one corrupt file must not fail a scene scan,
    and the chunked ingest path must never silently FILTER a mixed
    directory (chunking is a plan optimization, not a file selector)."""

    def test_scan_pages_survives_truncated_file(self, spark, tmp_path):
        # a valid TIFF magic with an IFD offset pointing past EOF makes
        # the raw struct unpacks fail mid-chain; the scan must yield
        # the good file's pages and skip the corrupt one, not raise
        d = tmp_path / "scene"
        d.mkdir()
        good = encode_tiff(
            [np.arange(64, dtype=np.uint8).reshape(8, 8)],
            georef=(7.0, 48.0, 0.001, 0.001),
        )
        (d / "good.tif").write_bytes(good)
        # magic + next-IFD offset aiming at byte 10_000 of a 12-byte file
        (d / "bad.tif").write_bytes(
            b"II*\x00" + struct.pack("<I", 10_000) + b"\x00" * 4
        )
        # and a file whose IFD entry count lies about the bytes present
        (d / "worse.tif").write_bytes(
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 500)
        )
        from biggis_landuse_spark.sources.geotiff import scan_geotiff_pages

        pages = scan_geotiff_pages(spark, str(d)).collect()
        assert {p["path"].rsplit("/", 1)[-1] for p in pages} == {"good.tif"}

    def test_chunked_mixed_dir_does_not_drop_files(self, spark, tmp_path):
        # pre-r11, a mixed directory made chunk_rows=None and
        # chunk_rows=N behave differently: the chunked planner silently
        # dropped every file the pages scan could not parse. Now the
        # leftover files route through the per-file decode, so BOTH
        # paths agree — including agreeing to fail loudly when the
        # decoder cannot handle the stray payload
        from biggis_landuse_spark.sources.geotiff import (
            GeoTiffDecoder,
            decode_to_pixels_georef,
            decode_to_pixels_georef_chunked,
            scan_geotiffs,
        )

        d = tmp_path / "scene"
        d.mkdir()
        (d / "a.tif").write_bytes(
            encode_tiff(
                [np.arange(90, dtype=np.uint8).reshape(9, 10)],
                georef=(7.0, 48.0, 0.001, 0.001),
            )
        )
        (d / "ramp.bin").write_bytes(
            (5).to_bytes(4, "little") + (4).to_bytes(4, "little")
        )
        plain = decode_to_pixels_georef(
            scan_geotiffs(spark, str(d)), GeoTiffDecoder()
        )
        chunked = decode_to_pixels_georef_chunked(
            spark, str(d), chunk_rows=4
        )
        with pytest.raises(Exception):
            plain.count()
        with pytest.raises(Exception):
            chunked.count()


class TestPageBandIngest:
    """Band-per-page archive ingest (r11, VERDICT r10 #5 — the
    GeoTrellis hadoopMultibandGeoTiffRDD surface,
    MultibandGeotiffTilingExample.scala:59): a multi-page TIFF whose
    pages each carry one band must stack into ONE multiband layer
    equal to ingesting the same bands as a single multiband file."""

    def _bands(self, n=3, h=32, w=48, seed=7):
        rng = np.random.default_rng(seed)
        return [
            rng.integers(0, 255, (h, w)).astype(np.uint8) for _ in range(n)
        ]

    def test_pages_as_bands_equals_multiband_ingest(self, spark, tmp_path):
        from biggis_landuse_spark.sources.geotiff import (
            PageBandDecoder,
            ingest_geotiff,
        )
        from biggis_landuse_spark.sources.tiff import encode_tiff_multi

        bands = self._bands()
        geo = (7.0, 48.0, 0.001, 0.001)
        d1 = tmp_path / "multi"
        d1.mkdir()
        (d1 / "scene.tif").write_bytes(encode_tiff(bands, georef=geo))
        d2 = tmp_path / "pages"
        d2.mkdir()
        (d2 / "scene.tif").write_bytes(
            encode_tiff_multi(
                [[b] for b in bands], subfile_types=[0, 2, 2], georef=geo
            )
        )
        key = ("tile_col", "tile_row")

        def grid(df):
            return {
                tuple(r[k] for k in key): r["tile"]["bands"]
                for r in df.collect()
            }

        ref = grid(ingest_geotiff(spark, str(d1), "ref", tile_size=16))
        got = grid(
            ingest_geotiff(
                spark, str(d2), "pg", tile_size=16,
                decoder=PageBandDecoder(),
            )
        )
        assert set(ref) == set(got)
        assert all(len(b) == 3 for b in got.values())
        assert ref == got

    def test_page_bands_skip_reduced_overviews(self, spark, tmp_path):
        # a COG-style archive mixing overview IFDs (reduced=True) with
        # band pages must stack only the pages — overviews are pyramid
        # levels, not bands
        from biggis_landuse_spark.sources.geotiff import PageBandDecoder
        from biggis_landuse_spark.sources.tiff import encode_tiff_multi

        b0, b1 = self._bands(n=2, h=16, w=16)
        ov = b0.reshape(8, 2, 8, 2).mean(axis=(1, 3)).astype(np.uint8)
        blob = encode_tiff_multi(
            [[b0], [ov], [b1]], subfile_types=[0, 1, 2]
        )
        dec = PageBandDecoder()
        out = dec.decode("x", blob)
        assert len(out) == 2
        assert np.array_equal(out[0], b0.astype(np.float64))
        assert np.array_equal(out[1], b1.astype(np.float64))
        # decode_rows parity with decode-then-slice
        rows = dec.decode_rows("x", blob, 3, 9)
        assert [a.shape for a in rows] == [(6, 16), (6, 16)]
        assert np.array_equal(rows[1], b1[3:9].astype(np.float64))

    def test_page_bands_shape_mismatch_raises(self, spark):
        from biggis_landuse_spark.sources.geotiff import PageBandDecoder
        from biggis_landuse_spark.sources.tiff import (
            TiffFormatError,
            encode_tiff_multi,
        )

        a = np.zeros((8, 8), np.uint8)
        b = np.zeros((4, 8), np.uint8)
        blob = encode_tiff_multi([[a], [b]], subfile_types=[0, 2])
        with pytest.raises(TiffFormatError, match="page"):
            PageBandDecoder().decode("x", blob)
