"""Pure-Python baseline TIFF / GeoTIFF codec (stdlib + numpy only).

Closes the gap between "GeoTiff ingest plumbing tested with a fake
decoder" and "reads an actual .tif" (reference front door:
GeotiffTilingExample.scala:49, MultibandGeotiffTilingExample.scala:59)
in a container without rasterio/GDAL. Implements the public TIFF 6.0
baseline plus the GeoTIFF georeferencing tags:

- classic TIFF, little- or big-endian (``II``/``MM``, magic 42), and\n  BigTIFF (magic 43, 8-byte offsets) read + write — the layout\n  >4 GB rasters ship in at 100 TB scale;
- stripped (RowsPerStrip) and tiled (TileWidth/TileLength) layouts;
- compression: none (1), zlib/deflate (8, 32946), LZW (5), PackBits
  (32773), old-style JPEG (6 — TTN2-deprecated but alive in scanned
  archives: full-interchange-stream and tables-split-strip flavors,
  read-only) and new-style JPEG (7, sources/jpeg.py — baseline streams
  per segment for 8-bit samples, LOSSLESS SOF3 streams for 16-bit
  (the DNG/medical shape, r8 s2), abbreviated JPEGTables tag 347
  honored); old-style JPEG (6) raises;
- horizontal-differencing predictor (2) for integer samples;
- chunky (PlanarConfiguration=1) and planar (2) sample layout;
- sample types: uint8/16/32, int8/16/32, float32/64 (BitsPerSample ×
  SampleFormat);
- georeferencing: ModelPixelScaleTag (33550) + ModelTiepointTag
  (33922) → top-left affine.

The symmetric :func:`encode_tiff` writes the same subset (used by the
export path and by tests to generate real .tif inputs). Scale posture:
the codec runs executor-side inside ``mapInPandas`` batches
(sources/geotiff.py) — one file per row, never on the driver.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

# TIFF field types → struct code / byte size
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d", 16: "Q", 17: "q", 18: "Q"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}

# tag codes (TIFF 6.0 + GeoTIFF)
IMAGE_WIDTH = 256
IMAGE_LENGTH = 257
BITS_PER_SAMPLE = 258
COMPRESSION = 259
PHOTOMETRIC = 262
STRIP_OFFSETS = 273
SAMPLES_PER_PIXEL = 277
ROWS_PER_STRIP = 278
STRIP_BYTE_COUNTS = 279
PLANAR_CONFIG = 284
PREDICTOR = 317
JPEG_PROC = 512
JPEG_INTERCHANGE_FORMAT = 513
JPEG_INTERCHANGE_FORMAT_LENGTH = 514
JPEG_RESTART_INTERVAL = 515
JPEG_QTABLES = 519
JPEG_DCTABLES = 520
JPEG_ACTABLES = 521
YCBCR_SUBSAMPLING = 530
TILE_WIDTH = 322
TILE_LENGTH = 323
TILE_OFFSETS = 324
TILE_BYTE_COUNTS = 325
SAMPLE_FORMAT = 339
JPEG_TABLES = 347
NEW_SUBFILE_TYPE = 254
MODEL_PIXEL_SCALE = 33550
MODEL_TIEPOINT = 33922


class TiffFormatError(ValueError):
    pass


def _tiff_header(data: bytes) -> tuple[str, int, tuple]:
    """Header → (byteorder, first-IFD offset, entry-layout params)."""
    if data[:2] == b"II":
        order = "<"
    elif data[:2] == b"MM":
        order = ">"
    else:
        raise TiffFormatError(f"not a TIFF: byte order {data[:2]!r}")
    (magic,) = struct.unpack(order + "H", data[2:4])
    if magic == 43:  # BigTIFF: 8-byte offsets, 20-byte IFD entries
        if len(data) < 16:
            raise TiffFormatError("truncated BigTIFF header")
        osz, rsv = struct.unpack(order + "HH", data[4:8])
        if osz != 8 or rsv != 0:
            raise TiffFormatError(f"bad BigTIFF header (offsetsize={osz})")
        (off,) = struct.unpack(order + "Q", data[8:16])
        layout = (20, 8, "Q", "Q", 8)  # esize, inline, ptr, cnt, n-size
    elif magic == 42:
        (off,) = struct.unpack(order + "I", data[4:8])
        layout = (12, 4, "I", "I", 2)
    else:
        raise TiffFormatError(f"bad TIFF magic {magic}")
    return order, off, layout


def _ifd_at(
    data: bytes, order: str, off: int, layout: tuple
) -> tuple[dict[int, list], int]:
    """One IFD at ``off`` → ({tag: values}, next-IFD offset or 0)."""
    esize, inline, ptr_fmt, cnt_fmt, nsz = layout
    if off <= 0 or off + nsz > len(data):
        raise TiffFormatError(f"IFD offset {off} out of bounds")
    (n,) = struct.unpack(
        order + ("H" if nsz == 2 else "Q"), data[off : off + nsz]
    )
    entry0 = off + nsz
    tags: dict[int, list] = {}
    for i in range(n):
        e = data[entry0 + esize * i : entry0 + esize * (i + 1)]
        tag, typ = struct.unpack(order + "HH", e[:4])
        (cnt,) = struct.unpack(order + cnt_fmt, e[4 : 4 + _TYPE_SIZE[4 if cnt_fmt == "I" else 16]])
        if typ not in _TYPE_SIZE:
            continue  # unknown field type: skip per spec
        vfield = e[esize - inline :]
        size = _TYPE_SIZE[typ] * cnt
        if size <= inline:
            raw = vfield[:size]
        else:
            (ptr,) = struct.unpack(order + ptr_fmt, vfield)
            raw = data[ptr : ptr + size]
        if typ == 7:  # UNDEFINED: opaque bytes (e.g. JPEGTables)
            tags[tag] = [raw]
        elif typ == 2:  # ASCII
            tags[tag] = [raw.rstrip(b"\x00").decode("ascii", "replace")]
        elif typ in (5, 10):  # RATIONAL: pairs of (num, den)
            pairs = struct.unpack(order + ("Ii"[typ == 10] * 2) * cnt, raw)
            tags[tag] = [
                pairs[2 * j] / (pairs[2 * j + 1] or 1) for j in range(cnt)
            ]
        else:
            tags[tag] = list(struct.unpack(order + _TYPE_FMT[typ] * cnt, raw))
    nxt_pos = entry0 + esize * n
    nxt_raw = data[nxt_pos : nxt_pos + inline]
    nxt = (
        struct.unpack(order + ptr_fmt, nxt_raw)[0]
        if len(nxt_raw) == inline
        else 0
    )
    return tags, nxt


def parse_ifds(
    data: bytes, max_ifds: int = 1024
) -> tuple[str, list[dict[int, list]]]:
    """Walk the WHOLE next-IFD chain (r10, VERDICT r9 #2) →
    ``(byteorder, [tags per IFD])``. Every cloud-optimized GeoTIFF
    carries overview IFDs after the full-res IFD0, and multi-page
    archives chain one page per IFD — previously invisible (the
    parser stopped at "header + first IFD"). Guards: offsets are
    bounds-checked, repeated offsets (a cycle) and chains past
    ``max_ifds`` raise instead of looping."""
    order, off, layout = _tiff_header(data)
    out: list[dict[int, list]] = []
    seen: set[int] = set()
    while off:
        if off in seen:
            raise TiffFormatError(f"IFD chain cycle at offset {off}")
        if len(out) >= max_ifds:
            raise TiffFormatError(f"IFD chain longer than {max_ifds}")
        seen.add(off)
        tags, off = _ifd_at(data, order, off, layout)
        out.append(tags)
    if not out:
        raise TiffFormatError("no IFDs in file")
    return order, out


def parse_ifd(data: bytes) -> tuple[str, dict[int, list]]:
    """Parse the header + first IFD into ``(byteorder, {tag: values})``."""
    order, off, layout = _tiff_header(data)
    tags, _nxt = _ifd_at(data, order, off, layout)
    return order, tags


def tiff_pages(data: bytes) -> list[dict]:
    """Per-IFD metadata of the whole chain: ``[{index, width, height,
    n_bands, bits, compression, reduced, page}]``. ``reduced`` is
    NewSubfileType bit 0 (a stored overview — what COGs carry);
    ``page`` is bit 1 (one page of a multi-page archive). Lets ingest
    select IFD0 explicitly and pyramid builds bootstrap from stored
    overviews instead of recomputing them."""
    _, ifds = parse_ifds(data)
    out = []
    for i, tags in enumerate(ifds):
        sub = tags.get(NEW_SUBFILE_TYPE, [0])[0]
        spp = tags.get(SAMPLES_PER_PIXEL, [1])[0]
        out.append({
            "index": i,
            "width": tags.get(IMAGE_WIDTH, [0])[0],
            "height": tags.get(IMAGE_LENGTH, [0])[0],
            "n_bands": spp,
            "bits": tags.get(BITS_PER_SAMPLE, [8] * spp)[0],
            "compression": tags.get(COMPRESSION, [1])[0],
            "reduced": bool(sub & 1),
            "page": bool(sub & 2),
        })
    return out


def _np_dtype(order: str, bits: int, fmt: int) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise TiffFormatError(f"SampleFormat {fmt} not supported")
    if kind == "f" and bits not in (32, 64):
        raise TiffFormatError(f"float{bits} not supported")
    if kind != "f" and bits not in (8, 16, 32):
        raise TiffFormatError(f"{bits}-bit integer samples not supported")
    return np.dtype(f"{order}{kind}{bits // 8}")


def _lzw_decode(seg: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first bit packing, 9→12-bit codes, early
    code-width change per TIFF 6.0 §13)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    # dictionary as a list of bytes; entries 0-255 literal, 256/257 control
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    prev: bytes | None = None
    acc = 0  # bit accumulator
    nbits = 0
    pos = 0
    n = len(seg)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: emit what we have
            acc = (acc << 8) | seg[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        # keep the accumulator bounded: without this mask acc grows
        # into a stream-length Python int and every shift costs O(n)
        # — measured O(n²) decode (r8 codec-throughput finding)
        acc &= (1 << nbits) - 1
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffFormatError(f"corrupt LZW stream: code {code}")
        out += entry
        prev = entry
        # early change: the decoder table lags the encoder by one entry
        # (the first code after CLEAR adds none), so bump when the table
        # is two short of the width limit — TIFF 6.0 §13's "one code
        # earlier" rule
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1


def _packbits_decode(seg: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i, n = 0, len(seg)
    while i < n:
        h = seg[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += seg[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i < n:
                out += bytes([seg[i]]) * (257 - h)
                i += 1
        # h == 128: no-op
    return bytes(out)


def _decompress(
    seg: bytes,
    comp: int,
    jpeg_tables: bytes | None = None,
    dt: np.dtype | None = None,
) -> bytes:
    if comp == 1:
        return seg
    if comp in (8, 32946):  # zlib / deflate (old code)
        return zlib.decompress(seg)
    if comp == 5:
        return _lzw_decode(seg)
    if comp == 32773:
        return _packbits_decode(seg)
    if comp == 7:  # new-style JPEG: the segment is a JFIF stream,
        # abbreviated when a JPEGTables tag (347) carries the tables
        from biggis_landuse_spark.sources.jpeg import decode_jpeg

        if dt is not None and dt.itemsize == 2:
            # deep samples ride either a LOSSLESS (SOF3) payload — the
            # DNG/medical-TIFF shape (r8 session 2) — or a 12-bit DCT
            # frame (lossy DNG, r9); decode_jpeg_deep handles both and
            # the result serializes in the container's byte order like
            # every other segment codec
            from biggis_landuse_spark.sources.jpeg import (
                decode_jpeg_deep,
            )

            _w, _h, _c, arr = decode_jpeg_deep(seg, tables=jpeg_tables)
            return arr.astype(dt).tobytes()
        _w, _h, _c, buf = decode_jpeg(seg, tables=jpeg_tables)
        return buf
    if comp == 6:
        raise TiffFormatError(
            "old-style JPEG (compression 6) segments need the 512/513/"
            "519-521 tag context; decode through decode_tiff"
        )
    raise TiffFormatError(
        f"compression {comp} not supported "
        "(baseline codec handles none/deflate/lzw/packbits/jpeg)"
    )


def _undo_predictor(arr: np.ndarray, predictor: int) -> np.ndarray:
    """``arr`` is (rows, cols, samples) for one segment."""
    if predictor == 1:
        return arr
    if predictor == 2:
        if arr.dtype.kind not in "ui":
            raise TiffFormatError("predictor 2 requires integer samples")
        # horizontal differencing: cumulative sum along cols, modulo the
        # sample width (int64 accumulate + truncating cast == mod 2^k)
        return np.cumsum(arr, axis=1, dtype=np.int64).astype(arr.dtype)
    raise TiffFormatError(f"predictor {predictor} not supported")


def _jseg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _oldstyle_huff(data: bytes, off: int) -> bytes:
    """Raw old-style Huffman table at ``off``: 16 BITS bytes + the
    HUFFVAL bytes they count (TIFF 6.0 §22 JPEGDCTables format — the
    DHT payload minus the Tc/Th byte)."""
    bits = data[off : off + 16]
    if len(bits) < 16:
        raise TiffFormatError("old-style JPEG Huffman table truncated")
    return data[off : off + 16 + sum(bits)]


def _decode_oldstyle_jpeg(
    data: bytes, tags: dict, w: int, h: int, spp: int
) -> np.ndarray:
    """TIFF 6.0 §22 old-style JPEG (compression 6, deprecated by TTN2
    but common in scanned archives) → (spp, h, w) float64.

    Two wild flavors, both handled; anything else refuses with a typed
    error (refusal beats a wrong decode — the r8 codec discipline):

    - **Full interchange stream** (tag 513/514): one complete
      SOI..EOI stream covers the whole image; strip pointers (which
      usually alias into the same bytes) are ignored. Decoded by the
      in-repo T.81 engine (sources/jpeg.py) and cropped to the
      declared extent; a lossless (SOF3) stream rides the same path
      via the 16-bit decoder.
    - **Tables-split strips** (tags 519/520/521 + entropy-only strip
      data): each strip is a bare entropy-coded scan; a conforming
      stream is STITCHED around it — DQT/DHT synthesized from the raw
      table payloads with table id = component index, DRI from tag
      515, SOF0/SOS sized to the strip (Y sampling from tag 530,
      default 2x2) — then decoded like any abbreviated JPEG. Strips
      that carry their own SOI decode directly.

    3-component strips must be photometric YCbCr (6) and return RGB
    after upsampling + color conversion — the libtiff
    JPEGCOLORMODE_RGB contract the reference's readers rely on.
    Old-style lossless STRIPS (JPEGProc 14 without 513), arithmetic
    coding, and 12-bit precision stay typed refusals in the JPEG
    engine. Ref parity: UtilsGeoTiff reads whatever GeoTools'
    ImageIO-ext accepts, which includes these legacy archives.
    """
    from biggis_landuse_spark.sources.jpeg import (
        decode_jpeg,
        decode_jpeg_lossless,
    )

    if TILE_WIDTH in tags:
        raise TiffFormatError(
            "old-style JPEG (compression 6) tiled layout not supported"
        )
    if tags.get(PLANAR_CONFIG, [1])[0] != 1:
        raise TiffFormatError(
            "old-style JPEG (compression 6) requires chunky planar config"
        )
    out = np.empty((spp, h, w), dtype=np.float64)
    proc = tags.get(JPEG_PROC, [1])[0]

    if JPEG_INTERCHANGE_FORMAT in tags:
        off = tags[JPEG_INTERCHANGE_FORMAT][0]
        ln = tags.get(
            JPEG_INTERCHANGE_FORMAT_LENGTH, [len(data) - off]
        )[0]
        stream = data[off : min(off + ln, len(data))]
        if stream[:2] != b"\xff\xd8":
            raise TiffFormatError(
                "JPEGInterchangeFormat does not point at an SOI"
            )
        if proc == 14:
            _jw, _jh, _c, arr = decode_jpeg_lossless(stream)
            if arr.ndim == 2:
                arr = arr[:, :, None]
        else:
            jw, jh, c, buf = decode_jpeg(stream)
            arr = np.frombuffer(buf, np.uint8).reshape(jh, jw, c)
        if arr.shape[0] < h or arr.shape[1] < w or arr.shape[2] < spp:
            raise TiffFormatError(
                "old-style JPEG stream smaller than the declared extent"
            )
        for s in range(spp):
            out[s] = arr[:h, :w, s]
        return out

    if proc != 1:
        raise TiffFormatError(
            f"old-style JPEG proc {proc} strips not supported "
            "(baseline sequential only)"
        )
    if STRIP_OFFSETS not in tags:
        raise TiffFormatError("old-style JPEG: no interchange stream "
                              "and no strips")
    if spp not in (1, 3):
        raise TiffFormatError(
            "old-style JPEG strips carry 1 (gray) or 3 (YCbCr) samples"
        )
    if spp == 3 and tags.get(PHOTOMETRIC, [6])[0] != 6:
        raise TiffFormatError(
            "3-sample old-style JPEG strips must be photometric YCbCr"
        )
    qts = [data[o : o + 64] for o in tags.get(JPEG_QTABLES, [])]
    dcs = [_oldstyle_huff(data, o) for o in tags.get(JPEG_DCTABLES, [])]
    acs = [_oldstyle_huff(data, o) for o in tags.get(JPEG_ACTABLES, [])]
    if len(qts) < spp or len(dcs) < spp or len(acs) < spp:
        raise TiffFormatError(
            "old-style JPEG strips need per-component "
            "JPEGQTables/JPEGDCTables/JPEGACTables"
        )
    restart = tags.get(JPEG_RESTART_INTERVAL, [0])[0]
    sub = tags.get(YCBCR_SUBSAMPLING, [2, 2])
    prefix = bytearray(b"\xff\xd8")
    for i in range(spp):
        prefix += _jseg(0xDB, bytes([i]) + qts[i])
        prefix += _jseg(0xC4, bytes([i]) + dcs[i])
        prefix += _jseg(0xC4, bytes([0x10 | i]) + acs[i])
    if restart:
        prefix += _jseg(0xDD, struct.pack(">H", restart))
    if spp == 1:
        comps = [(0, 1, 1)]
    else:
        comps = [(0, sub[0], sub[1]), (1, 1, 1), (2, 1, 1)]
    rps = tags.get(ROWS_PER_STRIP, [h])[0]
    offs, cnts = tags[STRIP_OFFSETS], tags[STRIP_BYTE_COUNTS]
    for i, (o, c) in enumerate(zip(offs, cnts)):
        y0 = i * rps
        rows = min(rps, h - y0)
        sdata = data[o : o + c]
        if sdata[:2] == b"\xff\xd8":
            # non-conforming writers emit a full stream per strip
            jw, jh, ch, buf = decode_jpeg(sdata)
        else:
            sof = struct.pack(">BHHB", 8, rows, w, spp)
            for cid, chs, cvs in comps:
                sof += bytes([cid, (chs << 4) | cvs, cid])
            sos = bytes([spp])
            for cid, _chs, _cvs in comps:
                sos += bytes([cid, (cid << 4) | cid])
            sos += b"\x00\x3f\x00"
            stream = bytes(prefix) + _jseg(0xC0, sof) + _jseg(0xDA, sos)
            stream += sdata
            if not sdata.rstrip(b"\x00").endswith(b"\xff\xd9"):
                stream += b"\xff\xd9"
            jw, jh, ch, buf = decode_jpeg(stream)
        if ch < spp or jw < w or jh < rows:
            raise TiffFormatError(
                "old-style JPEG strip decodes smaller than its extent"
            )
        arr = np.frombuffer(buf, np.uint8).reshape(jh, jw, ch)
        for s in range(spp):
            out[s, y0 : y0 + rows, :] = arr[:rows, :w, s]
    return out


def decode_tiff(
    data: bytes,
    ifd: int = 0,
    rows: tuple[int, int] | None = None,
) -> list[np.ndarray]:
    """Decode one image of the file to a list of (height, width)
    float64 arrays, one per band. ``ifd`` selects the image: 0 (the
    default) is the full-resolution IFD0 — what ingest reads — and
    higher indexes reach stored COG overviews / multi-page archive
    pages (walk :func:`tiff_pages` to pick one).

    ``rows=(y0, y1)`` decodes ONLY the segments intersecting that row
    band and returns (y1−y0, width) arrays (r10: the partial-decode
    primitive behind chunked ingest — one 8k² scene file is a single
    non-splittable binaryFile row, so without this every pixel of a
    scene decodes in ONE task). Segments outside the band are never
    decompressed; cost is proportional to the band, not the image."""
    if ifd == 0:
        order, tags = parse_ifd(data)
    else:
        order, ifds = parse_ifds(data)
        if ifd >= len(ifds):
            raise TiffFormatError(
                f"IFD {ifd} requested but file has {len(ifds)}"
            )
        tags = ifds[ifd]
    if IMAGE_WIDTH not in tags or IMAGE_LENGTH not in tags:
        raise TiffFormatError("missing ImageWidth/ImageLength")
    w, h = tags[IMAGE_WIDTH][0], tags[IMAGE_LENGTH][0]
    spp = tags.get(SAMPLES_PER_PIXEL, [1])[0]
    bits = tags.get(BITS_PER_SAMPLE, [8] * spp)
    fmts = tags.get(SAMPLE_FORMAT, [1] * spp)
    if len(set(bits)) > 1 or len(set(fmts)) > 1:
        raise TiffFormatError("heterogeneous per-sample types not supported")
    comp = tags.get(COMPRESSION, [1])[0]
    planar = tags.get(PLANAR_CONFIG, [1])[0]
    predictor = tags.get(PREDICTOR, [1])[0]
    if comp == 7 and bits[0] == 12 and fmts[0] == 1:
        # 12-bit DCT JPEG payloads (the lossy-DNG shape, r9): the JPEG
        # engine owns the sample width; container-side they are uint16
        dt = _np_dtype(order, 16, fmts[0])
    else:
        dt = _np_dtype(order, bits[0], fmts[0])
    y_lo, y_hi = (0, h) if rows is None else rows
    y_lo, y_hi = max(0, int(y_lo)), min(h, int(y_hi))
    if y_hi <= y_lo:
        return [np.empty((0, w), dtype=np.float64) for _ in range(spp)]
    if comp == 6:  # old-style JPEG: tag-driven, not a segment codec
        old = _decode_oldstyle_jpeg(data, tags, w, h, spp)
        return [old[b][y_lo:y_hi] for b in range(spp)]
    jpeg_tables = None
    if comp == 7:
        if bits[0] not in (8, 12, 16) or fmts[0] != 1:
            raise TiffFormatError(
                "JPEG compression carries 8-bit DCT, 12-bit DCT, or "
                "16-bit (lossless SOF3) unsigned samples only"
            )
        jt = tags.get(JPEG_TABLES)
        jpeg_tables = jt[0] if jt else None

    out = np.empty((spp, y_hi - y_lo, w), dtype=np.float64)

    if TILE_WIDTH in tags:  # tiled layout
        tw, th = tags[TILE_WIDTH][0], tags[TILE_LENGTH][0]
        offs, cnts = tags[TILE_OFFSETS], tags[TILE_BYTE_COUNTS]
        across, down = math.ceil(w / tw), math.ceil(h / th)
        per_plane = across * down
        chans = spp if planar == 1 else 1
        for i, (o, c) in enumerate(zip(offs, cnts)):
            if planar == 1:
                band0, idx = 0, i
            else:
                band0, idx = i // per_plane, i % per_plane
            ty, tx = (idx // across) * th, (idx % across) * tw
            if ty >= y_hi or ty + th <= y_lo:
                continue  # segment never decompressed
            raw = _decompress(data[o : o + c], comp, jpeg_tables, dt)
            seg = np.frombuffer(raw, dtype=dt, count=th * tw * chans).reshape(
                th, tw, chans
            )
            seg = _undo_predictor(seg, predictor)
            ch, cw = min(th, h - ty), min(tw, w - tx)  # edge-tile crop
            s_lo = max(ty, y_lo) - ty
            s_hi = min(ty + ch, y_hi) - ty
            for s in range(chans):
                out[
                    band0 + s,
                    ty + s_lo - y_lo : ty + s_hi - y_lo,
                    tx : tx + cw,
                ] = seg[s_lo:s_hi, :cw, s]
    else:  # stripped layout
        if STRIP_OFFSETS not in tags:
            raise TiffFormatError("missing StripOffsets")
        rps = tags.get(ROWS_PER_STRIP, [h])[0]
        offs, cnts = tags[STRIP_OFFSETS], tags[STRIP_BYTE_COUNTS]
        per_plane = math.ceil(h / rps)
        chans = spp if planar == 1 else 1
        for i, (o, c) in enumerate(zip(offs, cnts)):
            if planar == 1:
                band0, idx = 0, i
            else:
                band0, idx = i // per_plane, i % per_plane
            y0 = idx * rps
            n_rows = min(rps, h - y0)
            if y0 >= y_hi or y0 + n_rows <= y_lo:
                continue  # segment never decompressed
            raw = _decompress(data[o : o + c], comp, jpeg_tables, dt)
            seg = np.frombuffer(raw, dtype=dt, count=n_rows * w * chans).reshape(
                n_rows, w, chans
            )
            seg = _undo_predictor(seg, predictor)
            s_lo = max(y0, y_lo) - y0
            s_hi = min(y0 + n_rows, y_hi) - y0
            for s in range(chans):
                out[band0 + s, y0 + s_lo - y_lo : y0 + s_hi - y_lo, :] = seg[
                    s_lo:s_hi, :, s
                ]

    return [out[b] for b in range(spp)]


def georef_of(data: bytes) -> tuple[float, float, float, float]:
    """(x0, y0, dx, dy): top-left model coordinates + positive cell
    sizes, from ModelPixelScale + ModelTiepoint. Files without geo
    tags get the identity grid (pixel == model space)."""
    _, tags = parse_ifd(data)
    if MODEL_PIXEL_SCALE not in tags or MODEL_TIEPOINT not in tags:
        return 0.0, 0.0, 1.0, 1.0
    sx, sy = tags[MODEL_PIXEL_SCALE][0], tags[MODEL_PIXEL_SCALE][1]
    i, j, _k, x, y, _z = tags[MODEL_TIEPOINT][:6]
    # tiepoint maps raster (i, j) → model (x, y); north-up: +y is up
    return float(x - i * sx), float(y + j * sy), float(sx), float(sy)


# ---------------------------------------------------------------------------
# Encoder (same subset)
# ---------------------------------------------------------------------------

_FMT_OF_KIND = {"u": 1, "i": 2, "f": 3}


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF-variant LZW encoder (mirror of :func:`_lzw_decode`)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        # bounded accumulator (see _lzw_decode: unmasked it grows
        # into a stream-length int → O(n²) encode)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for i in range(len(raw)):
        c = raw[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code >= 4093:  # table nearly full: reset (TIFF 6.0 §13)
            emit(CLEAR, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
        # the decoder adds a table entry for every code after the first,
        # including this final one — count it so the EOI width agrees
        # when the final code lands exactly on a width boundary
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """Apple PackBits RLE encoder (mirror of :func:`_packbits_decode`)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        j = i
        while j < n - 1 and raw[j] == raw[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of length 2..128
            out += bytes([257 - (j - i + 1), raw[i]])
            i = j + 1
            continue
        j = i
        while j < n and j - i < 128:
            if j < n - 2 and raw[j] == raw[j + 1] == raw[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + raw[i:j]
        i = j
    return bytes(out)


def encode_tiff(
    bands: list[np.ndarray],
    dtype: str | np.dtype | None = None,
    tile_size: int | None = None,
    compression: str = "none",
    planar: bool = False,
    rows_per_strip: int | None = None,
    predictor: bool = False,
    georef: tuple[float, float, float, float] | None = None,
    jpeg_quality: int = 95,
    bigtiff: bool = False,
) -> bytes:
    """Encode bands (equal-shape 2-D arrays) as a little-endian classic
    TIFF. ``tile_size`` switches to the tiled layout; ``compression``
    is ``"none"``, ``"deflate"``, ``"lzw"``, ``"packbits"`` or
    ``"jpeg"`` (new-style 7 — LOSSY, uint8 chunky 1- or 3-band only,
    each segment a full JFIF stream); ``predictor`` applies horizontal
    differencing (integer samples only); ``georef=(x0, y0, dx, dy)``
    writes ModelPixelScale + a (0,0) ModelTiepoint; ``bigtiff=True``
    writes the BigTIFF layout (magic 43, 8-byte offsets — the format
    >4 GB rasters actually ship in)."""
    img = _prep_image(
        bands, dtype, tile_size, compression, planar, rows_per_strip,
        predictor, georef, jpeg_quality, subfile_type=None,
    )
    return _write_tiff([img], bigtiff)


def encode_tiff_multi(
    images: list[list[np.ndarray]],
    subfile_types: list[int] | None = None,
    bigtiff: bool = False,
    georef: tuple[float, float, float, float] | None = None,
    **kwargs,
) -> bytes:
    """Encode SEVERAL images into one file as a chained-IFD TIFF
    (r10, VERDICT r9 #2): pass the full-res image first and reduced
    2x2 overviews after it with ``subfile_types=[0, 1, 1, ...]`` for a
    cloud-optimized-GeoTIFF shape, or pages with type 2 for a
    multi-page (band-per-page) archive. ``georef`` applies to IFD0
    only (the COG convention — overview geo placement derives from the
    full-res affine and the decimation factor). Remaining kwargs are
    shared by every image (dtype / tile_size / compression / ...)."""
    if not images:
        raise ValueError("need at least one image")
    if subfile_types is None:
        subfile_types = [0] + [1] * (len(images) - 1)
    if len(subfile_types) != len(images):
        raise ValueError("subfile_types must match images")
    prepped = [
        _prep_image(
            bands,
            kwargs.get("dtype"),
            kwargs.get("tile_size"),
            kwargs.get("compression", "none"),
            kwargs.get("planar", False),
            kwargs.get("rows_per_strip"),
            kwargs.get("predictor", False),
            georef if i == 0 else None,
            kwargs.get("jpeg_quality", 95),
            subfile_type=subfile_types[i],
        )
        for i, bands in enumerate(images)
    ]
    return _write_tiff(prepped, bigtiff)


def _prep_image(
    bands: list[np.ndarray],
    dtype,
    tile_size,
    compression,
    planar,
    rows_per_strip,
    predictor,
    georef,
    jpeg_quality,
    subfile_type,
) -> tuple[list[bytes], dict[int, tuple[int, list]], bool]:
    """One image → (compressed segments, IFD entries sans offsets,
    tiled?)."""
    if not bands:
        raise ValueError("need at least one band")
    dt = np.dtype(dtype or bands[0].dtype).newbyteorder("<")
    if dt.kind not in _FMT_OF_KIND:
        raise ValueError(f"unsupported dtype {dt}")
    if predictor and dt.kind not in "ui":
        raise ValueError("predictor 2 requires integer samples")
    h, w = bands[0].shape
    spp = len(bands)
    arrs = [np.ascontiguousarray(b, dtype=dt) for b in bands]
    comp_code = {
        "none": 1, "deflate": 8, "lzw": 5, "packbits": 32773, "jpeg": 7,
        "jpeg_lossless": 7,
    }[compression]
    jpeg_lossless = compression == "jpeg_lossless"
    if jpeg_lossless:
        # 16-bit SOF3 segments — the DNG/medical-TIFF shape (r8 s2)
        if dt != np.dtype("<u2") or planar or predictor or spp > 4:
            raise ValueError(
                "jpeg_lossless compression requires uint16 chunky data "
                "(<=4 bands) without predictor"
            )
    elif comp_code == 7:
        if dt != np.dtype("<u1") or planar or predictor or spp not in (1, 3):
            raise ValueError(
                "jpeg compression requires uint8 chunky 1- or 3-band data "
                "without predictor"
            )

    def pack(seg: np.ndarray) -> bytes:
        if jpeg_lossless:
            from biggis_landuse_spark.sources.jpeg import (
                encode_jpeg_lossless,
            )

            if seg.ndim == 2:
                seg = seg[:, :, None]
            rows, cols, _chans = seg.shape
            return encode_jpeg_lossless(
                cols, rows, seg, precision=16, predictor=1
            )
        if comp_code == 7:
            from biggis_landuse_spark.sources.jpeg import encode_jpeg

            if seg.ndim == 2:
                seg = seg[:, :, None]
            rows, cols, chans = seg.shape
            return encode_jpeg(
                cols, rows, seg.tobytes(), channels=chans,
                quality=jpeg_quality,
            )
        if predictor:
            if seg.ndim == 2:
                seg = seg[:, :, None]
            diff = seg.copy()
            diff[:, 1:] = seg[:, 1:] - seg[:, :-1]  # wraps mod 2^k
            seg = diff
        raw = seg.tobytes()
        if comp_code == 8:
            return zlib.compress(raw)
        if comp_code == 5:
            return _lzw_encode(raw)
        if comp_code == 32773:
            return _packbits_encode(raw)
        return raw

    segments: list[bytes] = []
    extra: dict[int, tuple[int, list]] = {}
    if tile_size is not None:
        tw = th = tile_size
        across, down = math.ceil(w / tw), math.ceil(h / th)
        planes = arrs if planar else [np.stack(arrs, axis=-1)]
        for plane in planes:
            padded = np.zeros(
                (down * th, across * tw) + plane.shape[2:], dtype=dt
            )
            padded[:h, :w] = plane
            for ty in range(down):
                for tx in range(across):
                    segments.append(
                        pack(padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw])
                    )
        extra[TILE_WIDTH] = (3, [tw])
        extra[TILE_LENGTH] = (3, [th])
    else:
        rps = rows_per_strip or h
        planes = arrs if planar else [np.stack(arrs, axis=-1)]
        for plane in planes:
            for y0 in range(0, h, rps):
                segments.append(pack(plane[y0 : y0 + rps]))
        extra[ROWS_PER_STRIP] = (3, [rps])

    entries: dict[int, tuple[int, list]] = {
        IMAGE_WIDTH: (4, [w]),
        IMAGE_LENGTH: (4, [h]),
        BITS_PER_SAMPLE: (3, [dt.itemsize * 8] * spp),
        COMPRESSION: (3, [comp_code]),
        PHOTOMETRIC: (3, [1]),
        SAMPLES_PER_PIXEL: (3, [spp]),
        PLANAR_CONFIG: (3, [2 if planar else 1]),
        SAMPLE_FORMAT: (3, [_FMT_OF_KIND[dt.kind]] * spp),
    }
    if subfile_type is not None:
        entries[NEW_SUBFILE_TYPE] = (4, [subfile_type])
    if predictor:
        entries[PREDICTOR] = (3, [2])
    entries.update(extra)
    if georef is not None:
        x0, y0, dx, dy = georef
        entries[MODEL_PIXEL_SCALE] = (12, [dx, dy, 0.0])
        entries[MODEL_TIEPOINT] = (12, [0.0, 0.0, 0.0, x0, y0, 0.0])
    return segments, entries, tile_size is not None


def _write_tiff(
    images: list[tuple[list[bytes], dict[int, tuple[int, list]], bool]],
    bigtiff: bool,
) -> bytes:
    """Lay out prepped images as one file with a CHAINED IFD list:
    header | img0 data | img0 IFD | img0 overflow | img1 data | … —
    each IFD's next pointer patched to the following IFD's offset
    (0 on the last)."""
    if bigtiff:
        body = bytearray(b"II+\x00" + struct.pack("<HHQ", 8, 0, 0))
        inline, ptr_fmt, cnt_fmt = 8, "<Q", "<HHQ"
        nxt_ptr_pos = 8  # header's first-IFD pointer
    else:
        body = bytearray(b"II*\x00\x00\x00\x00\x00")
        inline, ptr_fmt, cnt_fmt = 4, "<I", "<HHI"
        nxt_ptr_pos = 4
    off_typ = 16 if bigtiff else 4  # LONG8 offsets past 4 GB
    esize = 20 if bigtiff else 12
    for segments, entries, tiled in images:
        seg_offsets = []
        for seg in segments:
            seg_offsets.append(len(body))
            body += seg
        entries = dict(entries)
        if tiled:
            entries[TILE_OFFSETS] = (off_typ, seg_offsets)
            entries[TILE_BYTE_COUNTS] = (off_typ, [len(s) for s in segments])
        else:
            entries[STRIP_OFFSETS] = (off_typ, seg_offsets)
            entries[STRIP_BYTE_COUNTS] = (
                off_typ, [len(s) for s in segments],
            )
        ifd_off = len(body)
        struct.pack_into(ptr_fmt, body, nxt_ptr_pos, ifd_off)
        tag_codes = sorted(entries)
        overflow = bytearray()
        if bigtiff:
            body += struct.pack("<Q", len(tag_codes))
            overflow_base = ifd_off + 8 + esize * len(tag_codes) + inline
        else:
            body += struct.pack("<H", len(tag_codes))
            overflow_base = ifd_off + 2 + esize * len(tag_codes) + inline
        for tag in tag_codes:
            typ, vals = entries[tag]
            fmt = _TYPE_FMT[typ]
            raw = struct.pack("<" + fmt * len(vals), *vals)
            if len(raw) <= inline:
                raw_field = raw.ljust(inline, b"\x00")
            else:
                raw_field = struct.pack(
                    ptr_fmt, overflow_base + len(overflow)
                )
                overflow += raw
            body += struct.pack(cnt_fmt, tag, typ, len(vals)) + raw_field
        nxt_ptr_pos = len(body)
        body += b"\x00" * inline  # next-IFD pointer: patched or final 0
        body += overflow
    return bytes(body)
