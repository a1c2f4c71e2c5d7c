"""Minimal stdlib BMP codec: uncompressed (BI_RGB) 24/32-bit
BITMAPINFOHEADER files, bottom-up or top-down.

Third real byte→pixel codec next to sources/png.py and
sources/wav.py (reference: the multimodal decode path,
multimodal.py decode_media). Pure `struct` parsing — runs
executor-side inside the Arrow-batched mapInPandas plumbing.
"""

from __future__ import annotations

import struct


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels=3, interleaved RGB bytes,
    row-major top-down). Alpha of 32-bit files is dropped — the
    decoded-media schema is RGB like the PNG path."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, raw_h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP: planes={planes} bpp={bpp} "
            f"compression={compression} (only uncompressed 24/32-bit)"
        )
    top_down = raw_h < 0
    height = -raw_h if top_down else raw_h
    if width <= 0 or height == 0:
        raise ValueError(f"not a BMP: invalid dimensions {width}x{raw_h}")
    if pixel_off < 14 + hdr_size:
        raise ValueError(
            f"not a BMP: pixel offset {pixel_off} points into the header "
            f"(headers end at {14 + hdr_size})"
        )
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3  # rows pad to 4 bytes
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = pixel_off + src_row * stride
        if base + width * nbytes > len(data):
            raise ValueError("truncated BMP pixel data")
        o = row * width * 3
        for x in range(width):
            b = base + x * nbytes
            # BMP stores BGR(A)
            out[o] = data[b + 2]
            out[o + 1] = data[b + 1]
            out[o + 2] = data[b]
            o += 3
    return width, height, 3, bytes(out)


def encode_bmp(
    width: int, height: int, rgb: bytes, top_down: bool = False
) -> bytes:
    """Interleaved RGB (row-major top-down) → 24-bit BI_RGB BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb buffer size mismatch")
    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + img_size, 0, 0, off)
    hdr += struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        24,
        0,
        img_size,
        2835,
        2835,
        0,
        0,
    )
    body = bytearray(img_size)
    pad = stride - width * 3
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        src = src_row * width * 3
        dst = row * stride
        for x in range(width):
            s = src + x * 3
            d = dst + x * 3
            body[d] = rgb[s + 2]
            body[d + 1] = rgb[s + 1]
            body[d + 2] = rgb[s]
        # pad bytes already zero
    return hdr + bytes(body)
