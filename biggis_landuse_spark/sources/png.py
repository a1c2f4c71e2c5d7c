"""Stdlib PNG decoder (zlib + unfilter) — the inverse of the stdlib
encoder in ``serving.encode_png_rgba``.

Makes the multimodal byte→pixel decode step REAL for PNG payloads
(``multimodal.decode_media(codec="png")``) in a container without
pillow: 8- and 16-bit depth (r9 — 16-bit gray PNG is the standard
DEM / satellite-product delivery), color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), non-interlaced — the subset every PNG
writer emits by default, per the public PNG specification (RFC 2083).
Filters 0-4 (None/Sub/Up/Average/Paeth) are all implemented, with the
spec's byte-level (bpp-offset) filtering, which is what makes the
same unfilter loop correct at both depths. Anything outside the
subset raises — an honest bound, never a garbled image.

8-bit frames ride the ``decode_png`` byte contract; 16-bit samples
return as a uint16 array via ``decode_png_deep`` (big-endian in the
stream per spec). ``encode_png_gray16`` is the encode twin for deep
single-band rasters — bit-exact round-trips, pinned in tests.

Runs executor-side inside Arrow-batched ``mapInPandas``; per-image
cost is the zlib inflate plus a per-byte unfilter pass (swap in
pillow via the codec registry where throughput matters).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_MAGIC = b"\x89PNG\r\n\x1a\n"


class PngFormatError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png_raw(data: bytes) -> tuple[int, int, int, int, bytes]:
    """→ (width, height, channels, depth, unfiltered sample bytes —
    big-endian within each sample, per spec)."""
    if data[:8] != _MAGIC:
        raise PngFormatError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    depth = 8
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth not in (8, 16):
                raise PngFormatError(
                    f"bit depth {depth} not supported (8 or 16)"
                )
            if ctype not in _CHANNELS:
                raise PngFormatError(f"color type {ctype} not supported")
            if interlace != 0:
                raise PngFormatError("interlaced PNG not supported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise PngFormatError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngFormatError(f"corrupt or missing IDAT: {exc}") from exc
    # filtering is defined on BYTES with offsets of bpp = bytes per
    # pixel (RFC 2083 §6.3) — at depth 8 bpp == channels, so the 8-bit
    # behavior is unchanged
    bpp = channels * (depth // 8)
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngFormatError("IDAT length mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        row = bytearray(raw[row_off + 1 : row_off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        else:
            raise PngFormatError(f"filter type {ftype} invalid")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return width, height, channels, depth, bytes(out)


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, pixels) with ``pixels`` a row-major
    interleaved uint8 byte string of length w*h*channels."""
    width, height, channels, depth, out = _decode_png_raw(data)
    if depth != 8:
        raise PngFormatError(
            f"{depth}-bit PNG does not fit the 8-bit pixel contract — "
            "use decode_png_deep for uint16 samples"
        )
    return width, height, channels, out


def decode_png_deep(data: bytes):
    """→ (width, height, channels, uint16 samples array): any
    supported PNG at full sample depth — the 16-bit DEM / product
    shape ``decode_png``'s byte contract cannot carry (8-bit frames
    widen to uint16 for a uniform caller contract)."""
    width, height, channels, depth, out = _decode_png_raw(data)
    dt = ">u2" if depth == 16 else np.uint8
    arr = (
        np.frombuffer(out, dtype=dt)
        .reshape(height, width, channels)
        .astype(np.uint16)
    )
    return width, height, channels, arr


def encode_png_gray16(width: int, height: int, samples) -> bytes:
    """16-bit grayscale PNG encoder (stdlib only) — the export twin of
    :func:`decode_png_deep` for single-band deep rasters (DEMs,
    radiometric products). Samples: (h, w) array-like of uint16;
    scanlines are filter-0 + big-endian per spec; bit-exact round-trip
    pinned in tests."""
    arr = np.asarray(samples, dtype=np.uint16)
    if arr.shape != (height, width):
        raise PngFormatError(
            f"sample array {arr.shape} does not match {height}x{width}"
        )
    be = arr.astype(">u2").tobytes()
    stride = width * 2
    raw = b"".join(
        b"\x00" + be[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
