"""EXIF metadata reader/writer (stdlib only).

EXIF is a classic-TIFF IFD tree embedded either in a JPEG APP1
segment (``Exif\\x00\\x00`` prefix) or at the head of a TIFF file —
the camera/scan metadata a multimodal ingest pipeline extracts before
training (orientation fixing, capture-time dedup, device census).
Reuses the TIFF container vocabulary (sources/tiff.py field
types/sizes); walks IFD0 and the Exif private sub-IFD (tag 34665),
returning a plain dict of the portable tag subset. Unknown tags are
skipped per the TIFF rule; truncated structures raise
:class:`ExifFormatError` — an honest bound, never garbage values.

Runs executor-side inside Arrow-batched ``mapInPandas`` like the
image codecs; per-image cost is a few dozen struct unpacks.
"""

from __future__ import annotations

import struct

from biggis_landuse_spark.sources.tiff import _TYPE_FMT, _TYPE_SIZE


class ExifFormatError(ValueError):
    pass


# tag → (name, ifd): the portable subset a pipeline actually uses
_TAGS_IFD0 = {
    271: "make",
    272: "model",
    274: "orientation",
    306: "datetime",
    282: "x_resolution",
    283: "y_resolution",
}
_TAGS_EXIF = {
    33434: "exposure_time",  # RATIONAL (num, den)
    33437: "f_number",
    34855: "iso",
    36867: "datetime_original",
    37386: "focal_length",
    40962: "pixel_x_dimension",
    40963: "pixel_y_dimension",
}
EXIF_IFD_POINTER = 34665


def _read_ifd(data: bytes, order: str, off: int) -> dict[int, list]:
    """One classic-TIFF IFD at ``off`` → {tag: values}."""
    if off + 2 > len(data):
        raise ExifFormatError("truncated IFD header")
    (n,) = struct.unpack(order + "H", data[off : off + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        e = data[off + 2 + 12 * i : off + 2 + 12 * (i + 1)]
        if len(e) < 12:
            raise ExifFormatError("truncated IFD entry")
        tag, typ = struct.unpack(order + "HH", e[:4])
        (cnt,) = struct.unpack(order + "I", e[4:8])
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = e[8 : 8 + size]
        else:
            (ptr,) = struct.unpack(order + "I", e[8:12])
            raw = data[ptr : ptr + size]
            if len(raw) < size:
                raise ExifFormatError(f"tag {tag} value out of bounds")
        if typ == 2:  # ASCII
            tags[tag] = [raw.split(b"\x00")[0].decode("ascii", "replace")]
        elif typ in (5, 10):  # RATIONAL / SRATIONAL → (num, den) pairs
            pairs = struct.unpack(order + ("Ii"[typ == 10] * 2) * cnt, raw)
            tags[tag] = [
                (pairs[2 * j], pairs[2 * j + 1]) for j in range(cnt)
            ]
        elif typ == 7:
            tags[tag] = [raw]
        else:
            tags[tag] = list(struct.unpack(order + _TYPE_FMT[typ] * cnt, raw))
    return tags


def parse_exif(data: bytes) -> dict[str, object]:
    """JPEG bytes (APP1 located by marker walk) or a bare TIFF/EXIF
    block → the portable tag dict (missing tags absent). Returns {}
    for a JPEG without an APP1 Exif segment."""
    if data[:2] == b"\xff\xd8":  # JPEG: find APP1 "Exif\0\0"
        pos = 2
        tiff = None
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            # optional 0xFF fill bytes may pad any marker
            # (T.81 B.1.1.2): advance to the last 0xFF so the byte
            # after it is the real marker, not another fill byte
            while pos + 1 < len(data) and data[pos + 1] == 0xFF:
                pos += 1
            if pos + 1 >= len(data):
                # truncated stream ending in a fill-byte run (e.g.
                # SOI + 0xFF...): no marker byte left to read
                break
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD9:
                pos += 2
                continue
            if pos + 4 > len(data):
                break
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            seg = data[pos + 4 : pos + 2 + seglen]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                tiff = seg[6:]
                break
            if marker == 0xDA:
                break  # entropy data: no APP1 ahead of it → none
            pos += 2 + seglen
        if tiff is None:
            return {}
        data = tiff
    if data[:2] == b"II":
        order = "<"
    elif data[:2] == b"MM":
        order = ">"
    else:
        raise ExifFormatError(f"not an EXIF/TIFF block: {data[:2]!r}")
    (magic,) = struct.unpack(order + "H", data[2:4])
    if magic != 42:
        raise ExifFormatError(f"bad TIFF magic {magic} in EXIF block")
    (off0,) = struct.unpack(order + "I", data[4:8])
    ifd0 = _read_ifd(data, order, off0)
    out: dict[str, object] = {}
    for tag, name in _TAGS_IFD0.items():
        if tag in ifd0:
            v = ifd0[tag]
            out[name] = v[0] if len(v) == 1 else v
    if EXIF_IFD_POINTER in ifd0:
        sub = _read_ifd(data, order, int(ifd0[EXIF_IFD_POINTER][0]))
        for tag, name in _TAGS_EXIF.items():
            if tag in sub:
                v = sub[tag]
                out[name] = v[0] if len(v) == 1 else v
    return out


def build_exif(
    fields: dict[str, object], order: str = "<", as_app1: bool = False
) -> bytes:
    """The symmetric writer: portable-name fields → a classic-TIFF
    EXIF block (or a full APP1 segment with ``as_app1``). Strings
    NUL-terminate, rationals are (num, den) tuples; IFD0 and the Exif
    sub-IFD lay out exactly like a camera writes them (entries
    tag-sorted, out-of-line values after each IFD)."""
    name2tag = {v: k for k, v in _TAGS_IFD0.items()}
    name2tag_exif = {v: k for k, v in _TAGS_EXIF.items()}
    ifd0 = {name2tag[k]: v for k, v in fields.items() if k in name2tag}
    sub = {
        name2tag_exif[k]: v for k, v in fields.items() if k in name2tag_exif
    }
    unknown = set(fields) - set(name2tag) - set(name2tag_exif)
    if unknown:
        raise ExifFormatError(f"unknown EXIF field names: {sorted(unknown)}")

    def encode_ifd(tags: dict[int, object], base: int,
                   extra: dict[int, int] | None = None) -> bytes:
        items = sorted(tags.items())
        if extra:
            items = sorted(items + list(extra.items()))
        n = len(items)
        head = struct.pack(order + "H", n)
        entries = b""
        tail = b""
        voff = base + 2 + 12 * n + 4
        for tag, v in items:
            if extra and tag in extra and tag not in tags:
                entries += struct.pack(order + "HHI", tag, 4, 1)
                entries += struct.pack(order + "I", extra[tag])
                continue
            if isinstance(v, str):
                raw = v.encode("ascii") + b"\x00"
                typ, cnt = 2, len(raw)
            elif isinstance(v, tuple):
                raw = struct.pack(order + "II", *v)
                typ, cnt = 5, 1
            else:
                raw = struct.pack(order + "H", int(v))
                typ, cnt = 3, 1
            entries += struct.pack(order + "HHI", tag, typ, cnt)
            if len(raw) <= 4:
                entries += raw + b"\x00" * (4 - len(raw))
            else:
                entries += struct.pack(order + "I", voff + len(tail))
                tail += raw + (b"\x00" if len(raw) % 2 else b"")
        return head + entries + struct.pack(order + "I", 0) + tail

    # two-pass: IFD0 size depends only on entry count, so the Exif
    # sub-IFD offset is known before encoding
    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_size_wo_tail = 2 + 12 * n0 + 4
    # encode IFD0 tail first to learn its length
    probe = encode_ifd(ifd0, 8)
    tail_len = len(probe) - (2 + 12 * len(ifd0) + 4)
    sub_off = 8 + ifd0_size_wo_tail + tail_len
    extra = {EXIF_IFD_POINTER: sub_off} if sub else None
    body = encode_ifd(ifd0, 8, extra)
    if sub:
        body += encode_ifd(sub, sub_off)
    hdr = (b"II" if order == "<" else b"MM") + struct.pack(
        order + "HI", 42, 8
    )
    tiff = hdr + body
    if not as_app1:
        return tiff
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
