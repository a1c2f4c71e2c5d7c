"""12-bit DCT JPEG (T.81 extended sequential SOF1, r9 — closing the
last Huffman-DCT refusal the spec permits): encode/decode round-trips
with quantizer-bounded error, the byte-contract refusal, table-width
plumbing, and the SOF3-strictness of the lossless entry. The DCT/
Huffman machinery is shared with the 8-bit path that is verified
against Java ImageIO; these tests pin the precision-specific deltas
(level shift 2048, 16-bit DQT, full-range tables, uint16 output)."""

from __future__ import annotations

import numpy as np
import pytest

from biggis_landuse_spark.sources.jpeg import (
    JpegFormatError,
    decode_jpeg,
    decode_jpeg_deep,
    decode_jpeg_lossless,
    encode_jpeg,
    encode_jpeg_deep,
    encode_jpeg_lossless,
)


def _smooth12(w, h, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4096, size=(h, w)).astype(np.float64)
    return (
        0.25 * base
        + np.linspace(0, 2400, w)[None, :]
        + np.linspace(0, 900, h)[:, None]
    ).clip(0, 4095).astype(np.uint16)


def test_gray12_round_trip_error_bounded_by_quantizer():
    w, h = 40, 24
    img = _smooth12(w, h)
    blob = encode_jpeg_deep(w, h, img, channels=1, quality=100)
    jw, jh, c, arr = decode_jpeg_deep(blob)
    assert (jw, jh, c) == (w, h, 1)
    assert arr.dtype == np.uint16
    err = np.abs(arr[:, :, 0].astype(int) - img.astype(int))
    # q100 quantizer entries are 16 (Annex K x16): per-sample error
    # stays within a small multiple of one quantization step
    assert int(err.max()) <= 32
    assert float(err.mean()) <= 8.0


def test_rgb12_round_trip_and_subsample():
    w, h = 32, 32
    g = _smooth12(w, h, seed=3)
    img = np.stack([g, g // 2, np.flip(g, 1)], axis=-1).astype(np.uint16)
    blob = encode_jpeg_deep(w, h, img, channels=3, quality=98)
    jw, jh, c, arr = decode_jpeg_deep(blob)
    assert (jw, jh, c) == (w, h, 3)
    assert float(np.abs(arr.astype(int) - img.astype(int)).mean()) < 40.0
    blob420 = encode_jpeg_deep(w, h, img, channels=3, quality=95,
                               subsample=True)
    _, _, _, arr420 = decode_jpeg_deep(blob420)
    # chroma is subsampled: luma-projected error stays tight even
    # where per-channel error grows
    y = 0.299 * arr420[..., 0] + 0.587 * arr420[..., 1] + 0.114 * arr420[..., 2]
    y0 = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert float(np.abs(y - y0).mean()) < 40.0


def test_deep_stream_structure():
    img = _smooth12(16, 8, seed=5)
    blob = encode_jpeg_deep(16, 8, img, channels=1)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # SOF1 marker present with precision byte 12; no SOF0
    i = blob.find(b"\xff\xc1")
    assert i > 0 and blob[i + 4] == 12
    assert blob.find(b"\xff\xc0") == -1
    # DQT is the 16-bit (Pq=1) form
    j = blob.find(b"\xff\xdb")
    assert blob[j + 4] >> 4 == 1


def test_byte_contract_refuses_12bit():
    img = _smooth12(8, 8)
    blob = encode_jpeg_deep(8, 8, img, channels=1)
    with pytest.raises(JpegFormatError, match="decode_jpeg_deep"):
        decode_jpeg(blob)


def test_lossless_entry_stays_sof3_strict():
    img = _smooth12(8, 8)
    blob = encode_jpeg_deep(8, 8, img, channels=1)
    with pytest.raises(JpegFormatError, match="not a lossless"):
        decode_jpeg_lossless(blob)
    # and the deep entry accepts BOTH frame kinds
    ll = encode_jpeg_lossless(8, 8, img, precision=12)
    _, _, _, exact = decode_jpeg_deep(ll)
    assert np.array_equal(exact[:, :, 0], img)


def test_deep_entry_also_reads_8bit_frames_as_uint16():
    px = bytes(range(64))
    blob = encode_jpeg(8, 8, px, channels=1, quality=100)
    w, h, c, arr = decode_jpeg_deep(blob)
    assert arr.dtype == np.uint16 and (w, h, c) == (8, 8, 1)
    # same values the byte contract returns
    _, _, _, buf = decode_jpeg(blob)
    assert np.array_equal(
        arr[:, :, 0].astype(np.uint8),
        np.frombuffer(buf, np.uint8).reshape(8, 8),
    )


def test_12bit_dct_in_tiff_comp7():
    # the lossy-DNG container shape: BitsPerSample 12, compression 7,
    # strip payload a 12-bit SOF1 stream — decodes through decode_tiff
    # to the exact same samples the standalone deep decode yields
    from biggis_landuse_spark.sources.tiff import decode_tiff
    from tests.test_tiff_oldjpeg import _tiff

    w, h = 24, 16
    img = _smooth12(w, h, seed=9)
    stream = encode_jpeg_deep(w, h, img, channels=1, quality=100)
    tif = _tiff(
        {
            256: (4, [w]), 257: (4, [h]), 258: (3, [12]),
            259: (3, [7]), 262: (3, [1]), 277: (3, [1]), 278: (4, [h]),
            273: (4, [8]), 279: (4, [len(stream)]),
        },
        stream,
    )
    (band,) = decode_tiff(tif)
    _, _, _, ref = decode_jpeg_deep(stream)
    assert np.array_equal(band, ref[:, :, 0].astype(np.float64))


def test_domain_guards():
    bad = np.full((4, 4), 4096, np.uint16)
    with pytest.raises(JpegFormatError, match="12-bit samples"):
        encode_jpeg_deep(4, 4, bad, channels=1)
    with pytest.raises(JpegFormatError, match="1 or 3"):
        encode_jpeg_deep(4, 4, np.zeros((4, 4, 2), np.uint16), channels=2)
    with pytest.raises(JpegFormatError, match="does not match"):
        encode_jpeg_deep(8, 4, np.zeros((4, 4), np.uint16), channels=1)
