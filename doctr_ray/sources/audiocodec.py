"""WAV (RIFF PCM) audio codec — pure stdlib + numpy.

The multimodal brief stubs audio decode behind ffmpeg/torchaudio;
that is true for COMPRESSED audio (mp3/aac/opus), but the raw
interchange format — RIFF/WAVE with integer PCM — needs no native
library at all. This module decodes and encodes it so audio payloads
in Arrow binary columns can be processed for real inside
``map_batches`` stages (see functions/multimodal.decode_audio_real):

- chunks walked by the RIFF grammar (``fmt `` before ``data``; extra
  chunks like LIST/fact skipped by size);
- PCM formats 1 (integer: 8-bit unsigned, 16/24/32-bit signed
  little-endian) and 3 (IEEE float32/64), any channel count;
- samples returned as an ``(n_frames, channels) int16`` array —
  8-bit is centered and scaled up, 24/32-bit and float take the top
  16 bits (the lossless direction round-trips 16-bit exactly).

``WAVE_FORMAT_EXTENSIBLE`` (tag 0xFFFE — how 24-bit files usually
ship) resolves the real format from the SubFormat GUID. Compressed
codecs raise ``NotImplementedError`` naming the format tag and the
library a real deployment would use.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, channels) int16 samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag in SubFormat
        # fmt chunk: 16 base bytes + cbSize(2) + validBits(2) +
        # channelMask(4) + SubFormat GUID (first 2 bytes = tag)
        if fmt_body is None or len(fmt_body) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (tag,) = struct.unpack_from("<H", fmt_body, 24)
    if tag not in (1, 3):
        raise NotImplementedError(
            f"compressed WAV format tag {tag}: needs ffmpeg/torchaudio"
        )
    if tag == 3:  # IEEE float
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(raw, dt)
        samples = np.clip(np.round(x * 32767.0), -32768, 32767).astype(
            np.int16
        )
    elif bits == 8:  # unsigned, centered at 128
        samples = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8)
    elif bits == 16:
        samples = np.frombuffer(raw, "<i2").astype(np.int16)
    elif bits == 24:
        b = np.frombuffer(raw, np.uint8)
        n = len(b) // 3
        b = b[: n * 3].reshape(n, 3)
        # top 16 of the 24: bytes are little-endian
        samples = (b[:, 1].astype(np.int16)) | (
            b[:, 2].astype(np.int16) << 8
        )
    elif bits == 32:
        samples = (np.frombuffer(raw, "<i4") >> 16).astype(np.int16)
    else:
        raise NotImplementedError(f"{bits}-bit WAV samples")
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    channels = samples.shape[1]
    raw = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
