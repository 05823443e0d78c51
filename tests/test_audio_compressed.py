"""Compressed audio codecs: FLAC (lossless — exact round-trips across
every decoder path), G.711 mu-law/A-law (spec-pinned values + error
bounds), IMA ADPCM (differential vs an independent scalar reference),
and the decode_audio_real dispatch that makes them real multimodal
stages."""

import itertools
import struct

import numpy as np
import pytest

from doctr_ray.sources.audiocodec import (
    _ALAW_DECODE_TABLE,
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    _MULAW_DECODE_TABLE,
    alaw_encode,
    decode_wav,
    encode_wav_g711,
    encode_wav_ima_adpcm,
    mulaw_encode,
)
from doctr_ray.sources.flaccodec import decode_flac, encode_flac


def _wave(n=3000, ch=1, seed=13):
    t = np.arange(n, dtype=np.int64)
    base = (t * seed + 7) % 65536 - 32768
    cols = [(base + c * 1000) % 65536 - 32768 for c in range(ch)]
    return np.stack(cols, axis=1).astype(np.int16)


# ------------------------------------------------------------------ FLAC


def test_flac_roundtrip_basic():
    x = _wave(2500, 2)
    enc = encode_flac(x, 44100)
    dec, rate = decode_flac(enc)
    assert rate == 44100 and np.array_equal(dec, x)
    # real compression on the structured waveform
    assert len(enc) < x.nbytes // 2


def test_flac_every_decoder_path():
    """Stereo decorrelation x LPC x partitioned Rice x 5-bit method:
    every (stereo, lpc, porder, method) combination round-trips
    sample-exactly — these drive the decoder through CONSTANT, FIXED,
    LPC and VERBATIM subframes, left/right/mid-side reconstruction and
    both Rice partition methods."""
    x = _wave(3000, 2)
    for stereo, lpc, porder, method in itertools.product(
        ["independent", "left_side", "right_side", "mid_side"],
        [False, True],
        [0, 2],
        [0, 1],
    ):
        enc = encode_flac(
            x, 48000, block_size=512, stereo=stereo, lpc=lpc,
            partition_order=porder, method=method,
        )
        dec, rate = decode_flac(enc)
        assert rate == 48000
        assert np.array_equal(dec, x), (stereo, lpc, porder, method)


def test_flac_constant_verbatim_and_edge_sizes():
    const = np.full((700, 1), -12345, np.int16)
    dec, _ = decode_flac(encode_flac(const, 8000))
    assert np.array_equal(dec, const)
    rng = np.random.RandomState(0)
    noise = rng.randint(-32768, 32767, (300, 1)).astype(np.int16)
    dec, _ = decode_flac(encode_flac(noise, 8000))  # verbatim fallback
    assert np.array_equal(dec, noise)
    tiny = _wave(5, 3)
    dec, _ = decode_flac(encode_flac(tiny, 96000))
    assert np.array_equal(dec, tiny)
    # non-table rate comes back from STREAMINFO
    dec, rate = decode_flac(encode_flac(tiny, 11025))
    assert rate == 11025


def test_flac_crc_and_truncation_fail_fast():
    enc = bytearray(encode_flac(_wave(1500, 1), 44100))
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"NOPE" + bytes(enc[4:]))
    corrupt = bytearray(enc)
    corrupt[-20] ^= 0xFF  # flip a bit inside the last frame
    with pytest.raises(ValueError, match="CRC|truncated|reserved|sync|Rice"):
        decode_flac(bytes(corrupt))
    for cut in (3, 20, 60, len(enc) - 7):
        with pytest.raises(ValueError):
            decode_flac(bytes(enc[:cut]))


# ----------------------------------------------------------------- G.711


def test_g711_spec_pinned_values():
    # classic G.711 table anchors (Sun g711.c semantics)
    assert mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    assert _MULAW_DECODE_TABLE[0xFF] == 0
    assert mulaw_encode(np.array([32767], np.int16))[0] == 0x80
    assert _MULAW_DECODE_TABLE[0x80] == 32124
    assert _MULAW_DECODE_TABLE[mulaw_encode(np.array([1000], np.int16))[0]] == 988
    assert alaw_encode(np.array([0], np.int16))[0] == 0xD5
    assert _ALAW_DECODE_TABLE[0xD5] == 8  # A-law has no exact zero
    assert _ALAW_DECODE_TABLE[alaw_encode(np.array([32767], np.int16))[0]] == 32256


def test_g711_error_bounds_full_domain():
    t = np.arange(-32768, 32768, dtype=np.int64)
    x = t.astype(np.int16)
    em = np.abs(_MULAW_DECODE_TABLE[mulaw_encode(x)].astype(np.int64) - t)
    ea = np.abs(_ALAW_DECODE_TABLE[alaw_encode(x)].astype(np.int64) - t)
    assert em.max() <= 1024  # half of the top mu-law segment step
    assert ea.max() <= 1024


def test_g711_wav_roundtrip_and_fact_chunk():
    sig = _wave(997, 1, seed=123)[:, 0]
    for law, tab, enc in (
        ("mulaw", _MULAW_DECODE_TABLE, mulaw_encode),
        ("alaw", _ALAW_DECODE_TABLE, alaw_encode),
    ):
        wav = encode_wav_g711(sig, 8000, law)
        dec, rate = decode_wav(wav)
        assert rate == 8000 and dec.shape == (997, 1)
        assert np.array_equal(dec[:, 0], tab[enc(sig)])
        assert len(wav) < sig.nbytes  # 2:1 compression
    st = np.stack([sig, (-sig).astype(np.int16)], axis=1)
    dec, _ = decode_wav(encode_wav_g711(st, 16000, "alaw"))
    assert dec.shape == (997, 2)
    assert np.array_equal(dec[:, 1], _ALAW_DECODE_TABLE[alaw_encode(st[:, 1])])


# ------------------------------------------------------------- IMA ADPCM


def _ima_reference_decode(nibbles, pred, index):
    """Independent scalar IMA ADPCM reference (spec step/index tables,
    written separately from the codec) for differential testing."""
    out = []
    for n in nibbles:
        step = int(_IMA_STEP_TABLE[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[n])))
        out.append(pred)
    return out


def test_ima_adpcm_differential_vs_reference():
    """Decode an arbitrary coded mono block and compare against the
    independent scalar reference above."""
    rng = np.random.RandomState(7)
    nibbles = rng.randint(0, 16, 64).astype(np.uint8)
    packed = (nibbles[0::2] | (nibbles[1::2] << 4)).astype(np.uint8)
    header = struct.pack("<hBB", 100, 20, 0)
    block = header + packed.tobytes()
    raw = block
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, len(block), 4, 2, 65)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    dec, rate = decode_wav(wav)
    expect = [100] + _ima_reference_decode(nibbles.tolist(), 100, 20)
    assert rate == 8000
    assert dec[:, 0].tolist() == expect


def test_ima_adpcm_encode_decode_tracks_signal():
    smooth = (9000 * np.sin(np.arange(4000) * 0.01)).astype(np.int16)
    wav = encode_wav_ima_adpcm(smooth, 8000, samples_per_block=505)
    dec, rate = decode_wav(wav)
    assert rate == 8000 and dec.shape == (4000, 1)
    assert np.abs(dec[:, 0].astype(np.int64) - smooth).max() < 256
    assert len(wav) < smooth.nbytes // 3  # ~4:1 compression
    # stereo + non-divisible tail (fact chunk truncates the padding)
    ch2 = (7000 * np.cos(np.arange(1777) * 0.008)).astype(np.int16)
    st = np.stack([smooth[:1777], ch2], axis=1)
    dec, _ = decode_wav(encode_wav_ima_adpcm(st, 11025, samples_per_block=249))
    assert dec.shape == (1777, 2)
    assert np.abs(dec.astype(np.int64) - st.astype(np.int64)).max() < 256


# ---------------------------------------------------------- dispatch


def test_decode_audio_real_dispatch_compressed():
    from doctr_ray.functions.multimodal import decode_audio_real

    sig = _wave(800, 2)
    dec, rate = decode_audio_real(encode_flac(sig, 32000))
    assert rate == 32000 and np.array_equal(dec, sig)
    dec, rate = decode_audio_real(encode_wav_g711(sig, 8000, "mulaw"))
    assert rate == 8000 and dec.shape == (800, 2)
    dec, rate = decode_audio_real(
        encode_wav_ima_adpcm(sig[:, :1], 16000, samples_per_block=249)
    )
    assert rate == 16000 and dec.shape == (800, 1)
    with pytest.raises(NotImplementedError, match="ffmpeg|torchaudio"):
        decode_audio_real(b"\xff\xfb\x90\x00mp3 frames")


# ------------------------------------------- third-party differential
#
# CPython 3.11 ships audioop (an INDEPENDENT C implementation of the
# G.711 companders and Intel/DVI ADPCM, removed in 3.13) — the closest
# thing this container has to a golden reference for compressed audio.

audioop = pytest.importorskip("audioop")


def test_g711_bit_exact_vs_audioop_full_domain():
    """Both laws, both directions, EVERY input: encode over all 65536
    int16 samples and decode over all 256 codes match audioop
    bit-for-bit."""
    t = np.arange(-32768, 32768, dtype=np.int16)
    raw = t.astype("<i2").tobytes()
    assert np.array_equal(
        np.frombuffer(audioop.lin2ulaw(raw, 2), np.uint8), mulaw_encode(t)
    )
    assert np.array_equal(
        np.frombuffer(audioop.lin2alaw(raw, 2), np.uint8), alaw_encode(t)
    )
    codes = bytes(range(256))
    assert np.array_equal(
        np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2"), _MULAW_DECODE_TABLE
    )
    assert np.array_equal(
        np.frombuffer(audioop.alaw2lin(codes, 2), "<i2"), _ALAW_DECODE_TABLE
    )


def test_ima_adpcm_bit_exact_vs_audioop():
    """The nibble decode recurrence matches audioop's DVI ADPCM
    bit-for-bit from arbitrary (predictor, index) states."""
    from doctr_ray.sources.audiocodec import _ima_decode_channel

    rng = np.random.RandomState(3)
    for seed_pred, seed_idx in ((100, 20), (0, 0), (-7000, 60), (32000, 88)):
        nibbles = rng.randint(0, 16, 200).astype(np.uint8)
        packed = bytes(
            (int(a) << 4) | int(b)
            for a, b in zip(nibbles[0::2], nibbles[1::2])
        )
        dec = np.frombuffer(
            audioop.adpcm2lin(packed, 2, (seed_pred, seed_idx))[0], "<i2"
        )
        ours = _ima_decode_channel(nibbles, seed_pred, seed_idx)
        assert np.array_equal(dec, ours)


def test_wav_container_parity_vs_stdlib_wave():
    """Stdlib ``wave`` reads our WAV files sample-exactly and we read
    its output sample-exactly — independent container verification."""
    import io
    import wave

    from doctr_ray.sources.audiocodec import encode_wav

    sig = _wave(500, 1, seed=999)[:, 0]
    w = wave.open(io.BytesIO(encode_wav(sig, 22050)))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
        22050, 1, 2,
    )
    assert np.array_equal(
        np.frombuffer(w.readframes(w.getnframes()), "<i2"), sig
    )
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(2)
    ww.setframerate(44100)
    st = np.stack([sig, (-sig).astype(np.int16)], axis=1)
    ww.writeframes(st.astype("<i2").tobytes())
    ww.close()
    dec, rate = decode_wav(buf.getvalue())
    assert rate == 44100 and np.array_equal(dec, st)
