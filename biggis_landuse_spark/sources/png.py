"""Stdlib PNG decoder (zlib + unfilter) — the inverse of the stdlib
encoder in ``serving.encode_png_rgba``.

Makes the multimodal byte→pixel decode step REAL for PNG payloads
(``multimodal.decode_media(codec="png")``) in a container without
pillow: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the subset every PNG writer emits by
default, per the public PNG specification (RFC 2083). Filters 0-4
(None/Sub/Up/Average/Paeth) are all implemented. Anything outside the
subset raises — an honest bound, never a garbled image.

Runs executor-side inside Arrow-batched ``mapInPandas``; per-image
cost is the zlib inflate plus a per-byte unfilter pass (swap in
pillow via the codec registry where throughput matters).
"""

from __future__ import annotations

import struct
import zlib

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


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, pixels) with ``pixels`` a row-major
    interleaved uint8 byte string of length w*h*channels."""
    if data[:8] != _MAGIC:
        raise PngFormatError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
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
            if depth != 8:
                raise PngFormatError(f"bit depth {depth} not supported (8 only)")
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
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
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
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        else:
            raise PngFormatError(f"filter type {ftype} invalid")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return width, height, channels, bytes(out)
