"""Corrupt-input robustness sweep: every in-repo codec must either
decode or raise PROMPTLY on truncated streams — never hang or loop.
100-TB corpora guarantee torn payloads; the pipeline's quarantine
mode (pipelines/ocr.py) depends on decoders failing fast."""

import time

import numpy as np
import pytest

from doctr_ray.sources import (
    audiocodec,
    avicodec,
    ccittcodec,
    flaccodec,
    gifcodec,
    imagecodec,
    jbig2codec,
    jpegcodec,
    jpxcodec,
    pdffilters,
)

_rng = np.random.default_rng(3)
_G = _rng.integers(0, 256, (32, 48), np.uint8)
_BI = np.where(_rng.random((32, 48)) < 0.4, 0, 255).astype(np.uint8)
_PCM = _rng.integers(-32768, 32768, 300).astype(np.int16)

CASES = [
    ("png", imagecodec.decode_png, imagecodec.encode_png(_G)),
    ("bmp", imagecodec.decode_bmp, imagecodec.encode_bmp(_G)),
    ("pnm", imagecodec.decode_pnm, imagecodec.encode_pnm(_G)),
    ("tiff", imagecodec.decode_tiff, imagecodec.encode_tiff(_G, "lzw")),
    ("jpeg", jpegcodec.decode_jpeg, jpegcodec.encode_jpeg(_G, 90)),
    ("gif", gifcodec.decode_gif, gifcodec.encode_gif(_G)),
    ("jpx", jpxcodec.decode_jpx, jpxcodec.encode_jpx(_G)),
    (
        "jbig2",
        lambda d: jbig2codec.decode_jbig2(d, width=48, height=32),
        jbig2codec.encode_jbig2(_BI == 0),
    ),
    (
        "ccitt_g4",
        lambda d: ccittcodec.decode_g4(d, 48, 32),
        ccittcodec.encode_g4(_BI == 0),
    ),
    ("wav", audiocodec.decode_wav, audiocodec.encode_wav(_PCM, 8000)),
    ("pdf_lzw", pdffilters.lzw_decode, pdffilters.lzw_encode(_G.tobytes())),
    ("flac", flaccodec.decode_flac, flaccodec.encode_flac(_PCM, 8000)),
    (
        "wav_mulaw",
        audiocodec.decode_wav,
        audiocodec.encode_wav_g711(_PCM, 8000, "mulaw"),
    ),
    (
        "wav_ima_adpcm",
        audiocodec.decode_wav,
        audiocodec.encode_wav_ima_adpcm(_PCM, 8000, samples_per_block=249),
    ),
    (
        "avi_dib",
        avicodec.decode_avi,
        avicodec.encode_avi(np.stack([_G, 255 - _G]), fps=10),
    ),
    (
        "gif_anim",
        lambda d: gifcodec.decode_gif_frames(d),
        gifcodec.encode_gif_animation(np.stack([_BI, 255 - _BI])),
    ),
    (
        "apng",
        lambda d: imagecodec.decode_apng_frames(d),
        imagecodec.encode_apng(np.stack([_G, 255 - _G])),
    ),
]


@pytest.mark.parametrize("name,dec,blob", CASES, ids=[c[0] for c in CASES])
def test_truncated_streams_fail_fast(name, dec, blob):
    for frac in (0.05, 0.3, 0.7, 0.95):
        cut = blob[: max(1, int(len(blob) * frac))]
        t0 = time.perf_counter()
        try:
            dec(cut)
        except Exception:
            pass  # a clean raise is the expected outcome
        assert time.perf_counter() - t0 < 5.0, (name, frac)


@pytest.mark.parametrize("name,dec,blob", CASES, ids=[c[0] for c in CASES])
def test_mutated_streams_fail_fast(name, dec, blob):
    """Byte corruption (not just truncation) must also terminate
    promptly — either a clean raise or a decoded (possibly wrong)
    result; never a hang or unbounded loop."""
    rng = np.random.default_rng(11)
    for _ in range(6):
        buf = bytearray(blob)
        for pos in rng.integers(0, len(buf), size=3):
            buf[pos] ^= int(rng.integers(1, 256))
        t0 = time.time()
        try:
            dec(bytes(buf))
        except Exception:
            pass  # clean raise is acceptable
        assert time.time() - t0 < 5.0, name
