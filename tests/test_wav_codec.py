"""Stdlib WAV codec: encode/decode round-trips across bit depths,
format refusals, and the decode_media(codec='wav') Spark path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from biggis_landuse_spark.sources.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
)


def _sine(n=200, freq=440.0, rate=16000, channels=1):
    t = np.arange(n * channels) // channels
    return 0.5 * np.sin(2 * np.pi * freq * t / rate)


@pytest.mark.parametrize("bits,tol", [(8, 1 / 120.0), (16, 1 / 30000.0), (32, 1e-9)])
def test_roundtrip_bit_depths(bits, tol):
    want = _sine()
    rate, ch, n, got = decode_wav(encode_wav(want, bits=bits))
    assert (rate, ch, n) == (16000, 1, len(want))
    np.testing.assert_allclose(got, want, atol=tol)


def test_stereo_interleave_preserved():
    want = _sine(n=64, channels=2)
    want[1::2] *= -1.0  # distinguish channels
    rate, ch, n, got = decode_wav(encode_wav(want, channels=2))
    assert (ch, n) == (2, 64)
    np.testing.assert_allclose(got[::2], want[::2], atol=1e-4)
    np.testing.assert_allclose(got[1::2], want[1::2], atol=1e-4)


def test_float32_format():
    want = _sine()
    payload = want.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    rate, ch, n, got = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_refusals():
    with pytest.raises(WavFormatError, match="RIFF"):
        decode_wav(b"\x89PNGnope")
    # ADPCM (format 2) must refuse
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(WavFormatError, match="not supported"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_media_wav_codec_spark(spark):
    from biggis_landuse_spark.multimodal import decode_media, media_features

    rows, truths = [], {}
    for doc_id, n in ((0, 100), (1, 150)):
        want = _sine(n=n)
        rows.append((doc_id, bytearray(encode_wav(want))))
        truths[doc_id] = want
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in decode_media(df, codec="wav").collect()}
    for doc_id, want in truths.items():
        r = got[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (len(want), 1, 1)
        np.testing.assert_allclose(np.array(r["pixels"]), want, atol=1e-4)
    feats = {
        f["doc_id"]: f for f in media_features(decode_media(df, codec="wav")).collect()
    }
    for doc_id, want in truths.items():
        assert feats[doc_id]["n_pixels"] == len(want)
        assert feats[doc_id]["mean"] == pytest.approx(float(want.mean()), abs=1e-4)
