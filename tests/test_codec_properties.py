"""Property-based round-trip tests (hypothesis): arbitrary shapes and
values through every lossless codec added in round 5. Each property is
budgeted to keep the suite fast; hypothesis hunts the edge geometry
(1-pixel dims, single samples, extreme values) that fixed fixtures
miss."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _arrays(draw, n, h, w, levels=256):
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    return rng.randint(0, levels, size=(n, h, w)).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_flac_roundtrip_property(data):
    from doctr_ray.sources.flaccodec import decode_flac, encode_flac

    n = data.draw(st.integers(1, 1200))
    ch = data.draw(st.integers(1, 3))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    kind = data.draw(st.sampled_from(["noise", "saw", "const", "steps"]))
    if kind == "noise":
        x = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    elif kind == "saw":
        t = np.arange(n, dtype=np.int64)
        x = np.stack(
            [((t * (13 + c) + 7) % 65536 - 32768) for c in range(ch)], axis=1
        ).astype(np.int16)
    elif kind == "const":
        x = np.full((n, ch), data.draw(st.integers(-32768, 32767)), np.int16)
    else:
        x = (rng.randint(-4, 4, (n, ch)).cumsum(axis=0) % 65536 - 32768).astype(
            np.int16
        )
    bs = data.draw(st.sampled_from([192, 256, 576, 1024]))
    stereo = (
        data.draw(
            st.sampled_from(
                ["independent", "left_side", "right_side", "mid_side"]
            )
        )
        if ch == 2
        else "independent"
    )
    enc = encode_flac(
        x,
        data.draw(st.sampled_from([8000, 22050, 44100, 11025])),
        block_size=bs,
        stereo=stereo,
        lpc=data.draw(st.booleans()),
        partition_order=data.draw(st.sampled_from([0, 1, 2])),
        method=data.draw(st.sampled_from([0, 1])),
    )
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec, x)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_gif_animation_roundtrip_property(data):
    from doctr_ray.sources.gifcodec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    n = data.draw(st.integers(1, 5))
    h = data.draw(st.integers(1, 24))
    w = data.draw(st.integers(1, 24))
    fr = _arrays(data.draw, n, h, w, levels=12)
    subrect = data.draw(st.booleans())
    dec, _ = decode_gif_frames(encode_gif_animation(fr, subrect=subrect))
    assert np.array_equal(dec, np.stack([fr] * 3, axis=3))


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_apng_roundtrip_property(data):
    from doctr_ray.sources.imagecodec import decode_apng_frames, encode_apng

    n = data.draw(st.integers(1, 5))
    h = data.draw(st.integers(1, 24))
    w = data.draw(st.integers(1, 24))
    fr = _arrays(data.draw, n, h, w)
    if data.draw(st.booleans()):
        fr = np.stack([fr, 255 - fr, fr // 2], axis=3)
    dec, _ = decode_apng_frames(
        encode_apng(fr, subrect=data.draw(st.booleans()))
    )
    assert np.array_equal(dec, fr)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_avi_dib_roundtrip_property(data):
    from doctr_ray.sources.avicodec import decode_avi, encode_avi

    n = data.draw(st.integers(1, 5))
    h = data.draw(st.integers(1, 24))
    w = data.draw(st.integers(1, 24))
    fr = _arrays(data.draw, n, h, w)
    rgb = data.draw(st.booleans())
    x = np.stack([fr, fr // 3, 255 - fr], axis=3) if rgb else fr
    dec, fps = decode_avi(encode_avi(x, fps=data.draw(st.integers(1, 60))))
    expect = x if rgb else np.stack([fr] * 3, axis=3)
    assert np.array_equal(dec, expect)


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_multipage_tiff_roundtrip_property(data):
    from doctr_ray.sources.imagecodec import (
        decode_tiff_pages,
        encode_tiff_multipage,
    )

    n = data.draw(st.integers(1, 4))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    pages = [
        rng.randint(0, 256, (
            data.draw(st.integers(1, 24)), data.draw(st.integers(1, 24))
        )).astype(np.uint8)
        for _ in range(n)
    ]
    comp = data.draw(st.sampled_from(["none", "lzw", "deflate", "packbits"]))
    dec = decode_tiff_pages(encode_tiff_multipage(pages, comp))
    assert len(dec) == n
    assert all(np.array_equal(a, b) for a, b in zip(dec, pages))


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_g711_roundtrip_bounded_property(data):
    """decode(encode(x)) stays within the top-segment quantization
    bound for arbitrary samples — and matches audioop bit-for-bit."""
    import audioop

    from doctr_ray.sources.audiocodec import (
        _ALAW_DECODE_TABLE,
        _MULAW_DECODE_TABLE,
        alaw_encode,
        mulaw_encode,
    )

    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    x = rng.randint(-32768, 32768, data.draw(st.integers(1, 500))).astype(
        np.int16
    )
    raw = x.astype("<i2").tobytes()
    mu, al = mulaw_encode(x), alaw_encode(x)
    assert np.array_equal(
        mu, np.frombuffer(audioop.lin2ulaw(raw, 2), np.uint8)
    )
    assert np.array_equal(
        al, np.frombuffer(audioop.lin2alaw(raw, 2), np.uint8)
    )
    assert np.abs(
        _MULAW_DECODE_TABLE[mu].astype(np.int64) - x.astype(np.int64)
    ).max() <= 1024
    assert np.abs(
        _ALAW_DECODE_TABLE[al].astype(np.int64) - x.astype(np.int64)
    ).max() <= 1024
