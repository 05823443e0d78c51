"""WAV (RIFF PCM) codec: bit-depth round-trips, chunk walking, and
the real decode path behind functions/multimodal.decode_audio_real."""

import struct

import numpy as np
import pytest

from doctr_ray.sources.audiocodec import decode_wav, encode_wav


def test_16bit_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, 500).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (500, 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (300, 2)).astype(np.int16)
    s2, r2 = decode_wav(encode_wav(stereo, 44100))
    assert r2 == 44100 and np.array_equal(s2, stereo)


def _wav(fmt_tag, channels, rate, bits, raw):
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_8_24_32_bit_and_float_depths():
    # 8-bit unsigned: 128 -> 0, 129 -> 256
    s, _ = decode_wav(_wav(1, 1, 8000, 8, bytes([128, 129, 127, 255, 0])))
    assert s[:, 0].tolist() == [0, 256, -256, 32512, -32768]
    # 24-bit: top 16 bits survive
    v24 = (123456).to_bytes(3, "little", signed=True) + (
        -123456
    ).to_bytes(3, "little", signed=True)
    s, _ = decode_wav(_wav(1, 1, 8000, 24, v24))
    assert s[:, 0].tolist() == [123456 >> 8, -((123456 + 255) >> 8)]
    # 32-bit int: top 16 bits
    v32 = struct.pack("<ii", 1 << 24, -(1 << 24))
    s, _ = decode_wav(_wav(1, 1, 8000, 32, v32))
    assert s[:, 0].tolist() == [256, -256]
    # float32 in [-1, 1]
    vf = struct.pack("<fff", 0.5, -1.0, 1.0)
    s, _ = decode_wav(_wav(3, 1, 8000, 32, vf))
    assert s[:, 0].tolist() == [16384, -32767, 32767]


def test_extra_chunks_skipped_and_errors_named():
    base = encode_wav(np.zeros(4, np.int16), 8000)
    # splice a LIST chunk between fmt and data
    at = base.find(b"data")
    spliced = base[:at] + b"LIST" + struct.pack("<I", 4) + b"INFO" + base[at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s, rate = decode_wav(spliced)
    assert s.shape == (4, 1) and rate == 8000
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")
    with pytest.raises(NotImplementedError, match="ffmpeg|torchaudio"):
        decode_wav(_wav(85, 1, 8000, 16, b"\0\0"))  # mp3 tag


def test_decode_audio_real_dispatch():
    from doctr_ray.functions.multimodal import decode_audio_real

    wav = encode_wav(np.arange(-5, 5, dtype=np.int16), 12000)
    samples, rate = decode_audio_real(wav)
    assert rate == 12000 and samples.shape == (10, 1)
    with pytest.raises(NotImplementedError, match="torchaudio"):
        decode_audio_real(b"\xff\xfb\x90\x00mp3 frames")


def test_wave_format_extensible():
    """Tag 0xFFFE resolves the real format from the SubFormat GUID."""
    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32768, 64).astype(np.int16)
    base = encode_wav(samples, 22050)
    # rebuild the fmt chunk as EXTENSIBLE wrapping PCM
    fmt_ext = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 22050, 22050 * 2, 2, 16, 22, 16, 0
    ) + struct.pack("<H", 1) + b"\x00" * 14  # SubFormat GUID: PCM
    at = base.find(b"fmt ")
    end = at + 8 + struct.unpack_from("<I", base, at + 4)[0]
    patched = (
        base[:at] + b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
        + base[end:]
    )
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    s, rate = decode_wav(patched)
    assert rate == 22050 and np.array_equal(s[:, 0], samples)
