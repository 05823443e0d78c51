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
    fact_frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
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
    if tag == 7:  # G.711 mu-law (COMPRESSED, 2:1 — decoded for real)
        samples = _MULAW_DECODE_TABLE[np.frombuffer(raw, np.uint8)]
        n = len(samples) // channels
        return samples[: n * channels].reshape(n, channels), rate
    if tag == 6:  # G.711 A-law (COMPRESSED, 2:1 — decoded for real)
        samples = _ALAW_DECODE_TABLE[np.frombuffer(raw, np.uint8)]
        n = len(samples) // channels
        return samples[: n * channels].reshape(n, channels), rate
    if tag == 0x11:  # IMA ADPCM (COMPRESSED, ~4:1 — decoded for real)
        _tag, _ch, _rate, _br, block_align, _bits = fmt
        out = _decode_ima_adpcm(raw, channels, block_align)
        if fact_frames is not None:  # drop tail-block zero padding
            out = out[:fact_frames]
        return out, rate
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


# ---------------------------------------------------- G.711 mu-law/A-law
#
# The ITU-T G.711 companders (the classic Sun Microsystems public-domain
# g711.c semantics): genuinely COMPRESSED audio (8 bits per sample for a
# 16-bit dynamic range) whose decode(encode(x)) is a pure per-sample
# integer function — so unlike ADPCM it is expressible in the DuckDB
# oracle SQL exactly (see __ray_entry__ audio_compressed oracle).

_MULAW_BIAS = 0x84  # 132


def _build_mulaw_decode() -> np.ndarray:
    out = np.empty(256, np.int16)
    for code in range(256):
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + _MULAW_BIAS) << ((u & 0x70) >> 4)
        out[code] = (_MULAW_BIAS - t) if (u & 0x80) else (t - _MULAW_BIAS)
    return out


def _build_alaw_decode() -> np.ndarray:
    out = np.empty(256, np.int16)
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t += 0x108
            t <<= seg - 1
        out[code] = t if (a & 0x80) else -t
    return out


_MULAW_DECODE_TABLE = _build_mulaw_decode()
_ALAW_DECODE_TABLE = _build_alaw_decode()


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> G.711 mu-law uint8 codes (Sun g711.c linear2ulaw)."""
    x = samples.astype(np.int32)
    pcm = x >> 2  # arithmetic shift (floor), matching the C semantics
    neg = pcm < 0
    mag = np.where(neg, -pcm, pcm)
    mag = np.minimum(mag, 8159) + (_MULAW_BIAS >> 2)  # 33
    # segment = MSB position of mag above bit 5 (mag in [33, 8192])
    seg = np.maximum(
        (np.floor(np.log2(mag.astype(np.float64)))).astype(np.int32) - 5, 0
    )
    escape = seg >= 8  # mag == 8192: top code
    seg = np.minimum(seg, 7)
    uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    uval = np.where(escape, 0x7F, uval)
    mask = np.where(neg, 0x7F, 0xFF)
    return (uval ^ mask).astype(np.uint8)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> G.711 A-law uint8 codes (Sun g711.c linear2alaw)."""
    x = samples.astype(np.int32)
    pcm = x >> 3  # 13-bit domain
    neg = pcm < 0
    mask = np.where(neg, 0x55, 0xD5)
    mag = np.where(neg, -pcm - 1, pcm)
    # segment = index of first seg_aend >= mag, seg_aend = 0x1F,0x3F,...
    seg = np.zeros_like(mag)
    for i, end in enumerate((0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)):
        seg = np.where(mag > end, i + 1, seg)
    escape = seg >= 8
    seg = np.minimum(seg, 7)
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((mag >> shift) & 0x0F)
    aval = np.where(escape, 0x7F, aval)
    return (aval ^ mask).astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, rate: int, law: str = "mulaw") -> bytes:
    """int16 samples -> RIFF/WAVE with G.711 (tag 7 mu-law / 6 A-law)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_g711 expects int16 samples")
    channels = samples.shape[1]
    codes = (mulaw_encode if law == "mulaw" else alaw_encode)(samples.ravel())
    tag = 7 if law == "mulaw" else 6
    raw = codes.tobytes()
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, rate, rate * channels, channels, 8, 0
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, samples.shape[0])
        + b"data" + struct.pack("<I", len(raw)) + raw
        + (b"\x00" if len(raw) & 1 else b"")  # RIFF word alignment
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------ IMA ADPCM
#
# DVI/IMA ADPCM (WAV format tag 0x11): block-based 4-bit differential
# coding, ~4:1. The decode recurrence is sequential per channel (each
# nibble updates predictor + step index), so the oracle for this codec
# is structural + an error-bound invariant; sample values are pinned in
# pytest (tests/test_audiocodec.py) against spec-table references.

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, np.int32)
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32,
)


def _ima_decode_channel(
    nibbles: np.ndarray, pred: int, index: int
) -> np.ndarray:
    out = np.empty(len(nibbles), np.int16)
    step_table, index_table = _IMA_STEP_TABLE, _IMA_INDEX_TABLE
    for i, n in enumerate(nibbles.tolist()):
        step = int(step_table[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if (n & 8) else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(index_table[n])))
        out[i] = pred
    return out


def _decode_ima_adpcm(
    raw: bytes, channels: int, block_align: int
) -> np.ndarray:
    if block_align < 4 * channels:
        raise ValueError("IMA ADPCM block_align too small")
    samples_per_block = (block_align - 4 * channels) * 2 // channels + 1
    chunks = []
    for off in range(0, len(raw) - (len(raw) % block_align), block_align):
        block = raw[off : off + block_align]
        chans = []
        for c in range(channels):
            pred, index = struct.unpack_from("<hB", block, c * 4)
            body = np.frombuffer(block, np.uint8, offset=4 * channels)
            # data interleaves 4-byte words per channel; nibbles
            # low-first within each byte
            words = body.reshape(-1, 4 * channels)[:, c * 4 : c * 4 + 4]
            flat = words.ravel()
            nibbles = np.empty(flat.size * 2, np.uint8)
            nibbles[0::2] = flat & 0x0F
            nibbles[1::2] = flat >> 4
            decoded = _ima_decode_channel(
                nibbles[: samples_per_block - 1], pred, index
            )
            chans.append(
                np.concatenate([[np.int16(pred)], decoded]).astype(np.int16)
            )
        chunks.append(np.stack(chans, axis=1))
    if not chunks:
        return np.zeros((0, channels), np.int16)
    return np.concatenate(chunks, axis=0)


def encode_wav_ima_adpcm(
    samples: np.ndarray, rate: int, samples_per_block: int = 505
) -> bytes:
    """int16 -> RIFF/WAVE IMA ADPCM (tag 0x11). Standard encoder:
    first sample stored verbatim in the block header, then 4-bit
    nibbles; lossy (~4:1) but fully deterministic."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_ima_adpcm expects int16 samples")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block - 1 must be a multiple of 8")
    n, channels = samples.shape
    block_align = 4 * channels + (samples_per_block - 1) * channels // 2
    step_table, index_table = _IMA_STEP_TABLE, _IMA_INDEX_TABLE
    blocks = []
    index = [0] * channels
    for start in range(0, n, samples_per_block):
        block = samples[start : start + samples_per_block]
        if len(block) < samples_per_block:  # zero-pad the tail block
            pad = np.zeros((samples_per_block - len(block), channels), np.int16)
            block = np.concatenate([block, pad])
        header = bytearray()
        nib_chans = []
        for c in range(channels):
            x = block[:, c].astype(np.int32)
            pred = int(x[0])
            idx = index[c]
            header += struct.pack("<hBB", pred, idx, 0)
            nibbles = np.empty(samples_per_block - 1, np.uint8)
            for i in range(1, samples_per_block):
                step = int(step_table[idx])
                delta = int(x[i]) - pred
                code = 0
                if delta < 0:
                    code = 8
                    delta = -delta
                if delta >= step:
                    code |= 4
                    delta -= step
                if delta >= step >> 1:
                    code |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    code |= 1
                # reconstruct exactly as the decoder will
                diff = step >> 3
                if code & 1:
                    diff += step >> 2
                if code & 2:
                    diff += step >> 1
                if code & 4:
                    diff += step
                pred = pred - diff if (code & 8) else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(index_table[code])))
                nibbles[i - 1] = code
            index[c] = idx
            packed = (nibbles[0::2] | (nibbles[1::2] << 4)).astype(np.uint8)
            nib_chans.append(packed.reshape(-1, 4))
        data = np.concatenate(nib_chans, axis=1).tobytes()
        blocks.append(bytes(header) + data)
    raw = b"".join(blocks)
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, rate, byte_rate, block_align, 4, 2,
        samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
