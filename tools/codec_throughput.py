#!/usr/bin/env python
"""Per-codec single-core decode throughput (r8, VERDICT r7 #5).

The media-path PLANS are right (Arrow-batched mapInPandas, constant
memory per worker), but the pure-Python codecs are the real cluster
bottleneck at 100 TB — this tool MEASURES MB/s/core per codec so
SCALING.md can carry numbers instead of adjectives, and so the
rasterio/pillow fast-path decision has a denominator.

Synthesizes representative payloads with the repo's own encoders
(textured, not constant — constant rasters overstate RLE/LZW codecs),
decodes each repeatedly single-threaded, and prints a markdown table
of compressed MB/s and decoded MP/s (pixels) per codec.

Usage: python tools/codec_throughput.py   (paste the table into
SCALING.md's codec-throughput section; numbers are min-of-3 wall).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _texture(h: int, w: int, dtype, hi: int) -> np.ndarray:
    """Deterministic mid-entropy texture: smooth gradient + hash noise
    (compresses ~2x under deflate/LZW — typical EO raster behavior)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 7 + xx * 3) % (hi // 2)
    noise = ((xx * 2654435761 + yy * 40503) >> 7) % (hi // 2)
    return (base + noise).astype(dtype)


def _bench(label: str, payload: bytes, decode, n_pixels: int, reps: int = 3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        decode(payload)
        best = min(best, time.perf_counter() - t0)
    comp_mbs = len(payload) / best / 1e6
    mpps = n_pixels / best / 1e6
    row = (label, len(payload) / 1e6, best, comp_mbs, mpps)
    print(
        f"| {row[0]} | {row[1]:.2f} | {row[2]:.3f} "
        f"| {row[3]:.1f} | {row[4]:.3f} |",
        flush=True,
    )
    return row


def main() -> None:
    from biggis_landuse_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from biggis_landuse_spark.serving import encode_png_rgba
    from biggis_landuse_spark.sources.png import decode_png
    from biggis_landuse_spark.sources.tiff import decode_tiff, encode_tiff
    from biggis_landuse_spark.sources.wav import decode_wav, encode_wav

    rows = []
    print("| codec / payload | comp MB | dec s | comp MB/s | Mpx(or Msmp)/s |")
    print("|---|---|---|---|---|")
    band = _texture(1024, 1024, np.uint16, 4096)
    for comp in ("none", "deflate", "lzw", "packbits"):
        payload = encode_tiff([band], compression=comp)
        rows.append(
            _bench(f"tiff/{comp} 1024² u16", payload, decode_tiff, 1024 * 1024)
        )

    # JPEG: the Huffman layer is a per-bit Python loop — the rate
    # (not the absolute) is the deliverable
    J = 256
    rgb = _texture(J, J * 3, np.uint8, 256).reshape(J, J, 3)
    pix = rgb.tobytes()
    jb = encode_jpeg(J, J, pix, channels=3, quality=90)
    rows.append(_bench(f"jpeg/baseline {J}² RGB", jb, decode_jpeg, J * J,
                       reps=1))
    js = encode_jpeg(J, J, pix, channels=3, quality=90, subsample=True)
    rows.append(_bench(f"jpeg/420 {J}² RGB", js, decode_jpeg, J * J,
                       reps=1))

    rgb512 = _texture(512, 512 * 3, np.uint8, 256).reshape(512, 512, 3)
    rgba = np.dstack(
        [rgb512, np.full((512, 512), 255, np.uint8)]
    ).tobytes()
    pb = encode_png_rgba(512, 512, rgba)
    rows.append(_bench("png/rgba 512²", pb, decode_png, 512 * 512))

    pcm = (
        _texture(1, 1_048_576, np.int32, 65536)[0].astype(np.float64)
        - 32768.0
    ) / 32768.0
    wb = encode_wav(pcm, rate=16000)
    rows.append(_bench("wav/pcm16 1M samples", wb, decode_wav, 1_048_576))

    print(f"(rows printed incrementally above; {len(rows)} codecs)")


if __name__ == "__main__":
    main()
