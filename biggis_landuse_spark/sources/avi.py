"""Stdlib AVI (RIFF) video demuxer — the video twin of sources/wav.py.

Makes the multimodal byte→frame decode step REAL for AVI payloads
without ffmpeg/OpenCV: RIFF container walk (``hdrl`` → ``avih`` /
``strh`` / ``strf``, ``movi`` frame chunks) per the public AVI RIFF
specification, with two frame codecs:

- **BI_RGB** (uncompressed 24-bit DIB, fourcc 0 / ``00db`` chunks):
  bottom-up BGR rows padded to 4-byte stride — decoded with pure
  numpy slicing;
- **MJPG** (Motion-JPEG, ``00dc`` chunks): each frame is a complete
  baseline/progressive JPEG, decoded by the repo's own stdlib JPEG
  codec (sources/jpeg.py) — the classic webcam/drone capture format.

Anything else (DivX, H.264, palettized DIBs, …) raises — an honest
bound, never garbled frames. Frames come back as height×width×3
uint8 RGB arrays, so downstream feature kernels are container-
independent. Runs executor-side inside Arrow-batched mapInPandas.

Reference parity note: the reference pipeline has no media ingest at
all (GeoTIFF only); this extends the beyond-reference multimodal
surface (SURVEY.md §2 extension table) from image/audio to video.
"""

from __future__ import annotations

import struct

import numpy as np


class AviFormatError(ValueError):
    pass


_MJPG = b"MJPG"


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi(
    data: bytes,
) -> tuple[int, int, int, int, list[np.ndarray]]:
    """→ (width, height, rate, scale, frames); fps = rate/scale and
    each frame is a height×width×3 uint8 RGB array."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI file")
    width = height = None
    rate, scale = 0, 1
    bitcount = compression = None
    handler = b""
    stream_idx = 0  # strl lists appear in stream order (spec)
    vids_idx: int | None = None
    frame_chunks: list[bytes] = []
    for tag, body, size in _walk_chunks(data, 12, len(data)):
        if tag != b"LIST":
            continue
        kind = data[body : body + 4]
        if kind == b"hdrl":
            for t2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if t2 == b"avih" and s2 >= 40:
                    width, height = struct.unpack(
                        "<II", data[b2 + 32 : b2 + 40]
                    )
                elif t2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    is_vids = False
                    for t3, b3, s3 in _walk_chunks(
                        data, b2 + 4, b2 + s2
                    ):
                        if t3 == b"strh" and s3 >= 28:
                            # audio/other streams: remember only the
                            # FIRST vids stream; their strf is a
                            # WAVEFORMATEX, not a BITMAPINFOHEADER
                            if (
                                data[b3 : b3 + 4] != b"vids"
                                or vids_idx is not None
                            ):
                                continue
                            is_vids = True
                            vids_idx = stream_idx
                            handler = data[b3 + 4 : b3 + 8]
                            scale, rate = struct.unpack(
                                "<II", data[b3 + 20 : b3 + 28]
                            )
                        elif t3 == b"strf" and s3 >= 20 and is_vids:
                            bitcount, compression = struct.unpack(
                                "<HI", data[b3 + 14 : b3 + 20]
                            )
                    stream_idx += 1
        elif kind == b"movi":
            sid = b"%02d" % (vids_idx if vids_idx is not None else 0)
            for t2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                # the vids stream's '##db' (uncompressed) / '##dc'
                # (compressed) frame chunks — matched by the stream
                # index its strl occupies, not a hardcoded 00
                if t2[:2] == sid and t2[2:4] in (b"db", b"dc"):
                    frame_chunks.append(data[b2 : b2 + s2])
    if width is None or height is None:
        raise AviFormatError("missing avih header")
    if not frame_chunks:
        raise AviFormatError("no video frame chunks in movi")

    is_mjpg = (
        compression == struct.unpack("<I", _MJPG)[0]
        or handler.upper() == _MJPG
    )
    frames: list[np.ndarray] = []
    if is_mjpg:
        from biggis_landuse_spark.sources.jpeg import decode_jpeg

        for chunk in frame_chunks:
            w, h, c, buf = decode_jpeg(chunk)
            px = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, c)
            if c == 1:
                px = np.repeat(px, 3, axis=2)
            frames.append(px)
        return width, height, rate, scale, frames
    if compression != 0 or bitcount != 24:
        raise AviFormatError(
            f"unsupported video format (compression={compression!r}, "
            f"bitcount={bitcount!r}): BI_RGB 24-bit and MJPG only"
        )
    stride = (width * 3 + 3) // 4 * 4
    for chunk in frame_chunks:
        if len(chunk) < stride * height:
            raise AviFormatError(
                f"short frame chunk: {len(chunk)} < {stride * height}"
            )
        grid = np.frombuffer(
            chunk[: stride * height], dtype=np.uint8
        ).reshape(height, stride)
        bgr = grid[:, : width * 3].reshape(height, width, 3)
        frames.append(bgr[::-1, :, ::-1].copy())  # bottom-up, BGR→RGB
    return width, height, rate, scale, frames


def avi_header_parts(
    width: int,
    height: int,
    n_frames: int,
    rate: int = 25,
    scale: int = 1,
    fourcc: bytes = b"\x00\x00\x00\x00",
    frame_sizes: list[int] | None = None,
    bitcount: int = 24,
) -> tuple[bytes, list[bytes]]:
    """The byte-exact constant skeleton of a BI_RGB/MJPG AVI with
    ``n_frames`` frames: returns (prefix, chunk_headers) such that
    ``prefix + h[0] + f[0] + h[1] + f[1] + …`` is a valid file. With
    equal frame sizes every chunk header is identical, so a SQL engine
    can synthesize the whole container from TWO hex literals and the
    payload — the property the byte-level oracles rely on."""
    raw = fourcc == b"\x00\x00\x00\x00"
    stride = (width * 3 + 3) // 4 * 4
    sizes = frame_sizes or [stride * height] * n_frames
    if len(sizes) != n_frames:
        raise AviFormatError("frame_sizes length != n_frames")
    us_per_frame = int(1_000_000 * scale / rate) if rate else 0
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, n_frames, 0, 1, max(sizes),
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + (fourcc if not raw else b"\x00" * 4)
        + struct.pack(
            "<IHHIIIIIIiI4H",
            0, 0, 0, 0, scale, rate, 0, n_frames, max(sizes), -1, 0,
            0, 0, width, height,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bitcount,
        0 if raw else struct.unpack("<I", _MJPG)[0],
        stride * height if raw else 0, 0, 0, 0, 0,
    )
    strl = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih \
        + b"LIST" + struct.pack("<I", len(strl)) + strl
    cid = b"00db" if raw else b"00dc"
    headers = [cid + struct.pack("<I", s) for s in sizes]
    movi_size = 4 + sum(8 + s + (s & 1) for s in sizes)
    body_size = 4 + 8 + len(hdrl) + 8 + movi_size
    prefix = (
        b"RIFF" + struct.pack("<I", body_size)
        + b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", movi_size) + b"movi"
    )
    return prefix, headers


def encode_avi(
    frames: list[np.ndarray], rate: int = 25, scale: int = 1
) -> bytes:
    """Inverse (tests + sinks): height×width×3 uint8 RGB frames →
    uncompressed BI_RGB AVI bytes."""
    if not frames:
        raise AviFormatError("need at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise AviFormatError("frames must be H×W×3 RGB")
    stride = (w * 3 + 3) // 4 * 4
    prefix, headers = avi_header_parts(w, h, len(frames), rate, scale)
    out = [prefix]
    pad = b"\x00" * (stride - w * 3)
    for hd, fr in zip(headers, frames):
        if fr.shape != (h, w, 3):
            raise AviFormatError("all frames must share one shape")
        bgr = np.asarray(fr, dtype=np.uint8)[::-1, :, ::-1]
        rows = b"".join(bgr[r].tobytes() + pad for r in range(h))
        out.append(hd + rows)
    return b"".join(out)


def encode_avi_mjpg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    rate: int = 25,
    scale: int = 1,
) -> bytes:
    """MJPG AVI writer (tests): each element is a complete JPEG."""
    sizes = [len(j) for j in jpeg_frames]
    prefix, headers = avi_header_parts(
        width, height, len(jpeg_frames), rate, scale,
        fourcc=_MJPG, frame_sizes=sizes,
    )
    out = [prefix]
    for hd, j in zip(headers, jpeg_frames):
        out.append(hd + j + (b"\x00" if len(j) & 1 else b""))
    return b"".join(out)
