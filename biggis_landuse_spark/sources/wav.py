"""Stdlib WAV (RIFF/PCM) decoder — the audio twin of sources/png.py.

Makes the multimodal byte→sample decode step REAL for WAV payloads
(``multimodal.decode_media(codec="wav")``) without librosa/ffmpeg:
RIFF container walk, ``fmt `` parse, PCM integer (8/16/32-bit) and
IEEE float32 sample formats, any channel count, per the public
RIFF/WAVE specification. Compressed codecs (MP3-in-WAV, ADPCM, …)
raise — an honest bound, never garbled audio.

Samples come back channel-interleaved and normalized to [-1, 1]
float, so downstream feature kernels (mean/std/energy) are format-
independent. Runs executor-side inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (sample_rate, channels, n_frames, samples) with ``samples`` a
    float64 array of length n_frames*channels, interleaved, in [-1, 1]."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            payload = body
    if fmt is None or payload is None:
        raise WavFormatError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned, offset-binary
            raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            samples = (raw - 128.0) / 128.0
        elif bits == 16:
            raw = np.frombuffer(payload, dtype="<i2").astype(np.float64)
            samples = raw / 32768.0
        elif bits == 32:
            raw = np.frombuffer(payload, dtype="<i4").astype(np.float64)
            samples = raw / 2147483648.0
        else:
            raise WavFormatError(f"PCM bit depth {bits} not supported")
    elif audio_format == 3 and bits == 32:  # IEEE float
        samples = np.frombuffer(payload, dtype="<f4").astype(np.float64)
    else:
        raise WavFormatError(
            f"audio format {audio_format}/{bits}-bit not supported "
            "(PCM 8/16/32 and float32 only)"
        )
    if channels < 1:
        raise WavFormatError("channel count must be >= 1")
    n_frames = len(samples) // channels
    return rate, channels, n_frames, samples[: n_frames * channels]


def encode_wav(
    samples: np.ndarray, rate: int = 16000, channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Inverse (tests + sinks): float [-1, 1] interleaved → PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        raw = np.clip(s * 32768.0, -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = np.clip(s * 128.0 + 128.0, 0, 255).astype(np.uint8).tobytes()
    elif bits == 32:
        raw = np.clip(s * 2147483648.0, -(2**31), 2**31 - 1).astype("<i4").tobytes()
    else:
        raise WavFormatError(f"bit depth {bits} not supported")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
