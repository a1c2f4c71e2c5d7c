"""Minimal stdlib GIF87a/89a decoder: first frame, palette-indexed,
LZW-compressed, optional interlace — decoded to interleaved RGB.

Fourth real byte→pixel codec (PNG/BMP/WAV siblings). GIF LZW differs
from the TIFF variant in sources/tiff.py: LSB-first bit packing,
per-image minimum code size, explicit CLEAR/EOI codes, no early
change — implemented here from the GIF89a specification (public).
Transparency and animation frames beyond the first are out of scope:
the decoded-media schema is a single RGB frame, matching the
PNG/BMP paths.
"""

from __future__ import annotations

import struct


class GifFormatError(ValueError):
    pass


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first packing, codes grow after the table
    fills (max 12 bits), CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = fresh_table()
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[: n_pixels])
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise GifFormatError(f"bad first LZW code {code}")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise GifFormatError(f"corrupt GIF LZW stream: code {code}")
            out += entry
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    return bytes(out[:n_pixels])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """First frame composited onto the logical screen →
    (width, height, channels=3, RGB bytes).

    Optimized GIFs commonly store the first frame as a sub-rectangle
    at an (ix, iy) offset; per GIF89a §18/§23 the uncovered screen
    area is the background color (transparent first-frame pixels —
    GCE flag bit 0 — also show background). The returned dims are
    always the HEADER's logical screen, never the sub-frame's."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF file")
    width, height, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    transparent = None
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            first_sub = True
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                if label == 0xF9 and first_sub and ln >= 4:
                    # graphic control: transparency flag + index
                    gflags, t_idx = data[pos + 1], data[pos + 4]
                    if gflags & 0x01:
                        transparent = t_idx
                first_sub = False
                pos += 1 + ln
            pos += 1
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if ix + iw > width or iy + ih > height:
                raise GifFormatError(
                    f"frame {iw}x{ih} at ({ix},{iy}) exceeds logical "
                    f"screen {width}x{height}"
                )
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = data[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise GifFormatError("no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode_gif(bytes(lzw), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise GifFormatError("truncated GIF image data")
            if iflags & 0x40:  # interlaced: redistribute rows
                rows = []
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        rows.append((y, idx[src * iw : (src + 1) * iw]))
                        src += 1
                ordered = bytearray(iw * ih)
                for y, row in rows:
                    ordered[y * iw : (y + 1) * iw] = row
                idx = bytes(ordered)
            # background fill: GCT background index (black when the
            # index has no GCT to point into, GIF89a §18)
            if gct is not None and 3 * bg + 3 <= len(gct):
                bg_rgb = gct[3 * bg : 3 * bg + 3]
            else:
                bg_rgb = b"\x00\x00\x00"
            out = bytearray(bg_rgb * (width * height))
            for i, ci in enumerate(idx):
                if ci == transparent:
                    continue  # background shows through
                if 3 * ci + 3 > len(pal):
                    raise GifFormatError(f"palette index {ci} out of range")
                j = 3 * ((iy + i // iw) * width + (ix + i % iw))
                out[j : j + 3] = pal[3 * ci : 3 * ci + 3]
            return width, height, 3, bytes(out)
        elif block == 0x3B:  # trailer
            break
        else:
            raise GifFormatError(f"unknown GIF block 0x{block:02x}")
    raise GifFormatError("no image data in GIF")


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """Tiny encoder for round-trip tests: builds a palette from the
    distinct colors (≤256 required), emits uncompressed-style LZW
    (each index as its own code, CLEAR spam keeps the table small)."""
    if len(rgb) != width * height * 3:
        raise GifFormatError("rgb buffer size mismatch")
    colors: dict[bytes, int] = {}
    idx = bytearray()
    for i in range(width * height):
        c = bytes(rgb[3 * i : 3 * i + 3])
        if c not in colors:
            if len(colors) == 256:
                raise GifFormatError("encoder supports ≤256 distinct colors")
            colors[c] = len(colors)
        idx.append(colors[c])
    # palette size: power of two ≥ max(2, n)
    bits = 1
    while (1 << bits) < max(2, len(colors)):
        bits += 1
    pal = bytearray()
    for c in colors:
        pal += c
    pal += b"\x00" * (3 * (1 << bits) - len(pal))
    min_code = max(2, bits)
    clear = 1 << min_code
    eoi = clear + 1
    code_size = min_code + 1
    # real GIF LZW: greedy longest-prefix dictionary build, codes grow
    # up to 12 bits, CLEAR resets when the table fills
    acc = 0
    nbits = 0
    stream = bytearray()

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    run = b""
    for ci in idx:
        cand = run + bytes([ci])
        if cand in table:
            run = cand
            continue
        put(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code > 4095:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code + 1
        run = bytes([ci])
    if run:
        put(table[run])
    put(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(min_code)
    i = 0
    while i < len(stream):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
        i += 255
    out += b"\x00\x3b"
    return bytes(out)
