"""GIF decoder: round-trips against the in-repo fixture encoder
(literal-code LZW, interlacing, palettes, animation first frame) and
the e2e OCR path over a real on-disk .gif."""

import numpy as np
import pytest

from doctr_ray.sources.gifcodec import decode_gif, encode_gif
from doctr_ray.sources.imagecodec import decode_image, to_gray


def _rng(seed):
    return np.random.default_rng(seed)


def test_roundtrip_small_palette():
    img = _rng(1).integers(0, 4, size=(13, 7), dtype=np.uint8) * 80
    got = decode_gif(encode_gif(img))
    assert got.shape == (13, 7, 3)
    assert np.array_equal(to_gray(got), img)


def test_roundtrip_rgb_and_magic_dispatch():
    img = _rng(2).integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    # many distinct colors but <= 99 cells -> palette fits
    data = encode_gif(img)
    assert data[:6] == b"GIF89a"
    assert np.array_equal(decode_image(data), img)


def test_roundtrip_interlaced():
    img = _rng(3).integers(0, 8, size=(23, 5), dtype=np.uint8) * 30
    plain = decode_gif(encode_gif(img, interlace=False))
    inter = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(plain, inter)
    assert np.array_equal(to_gray(inter), img)


def test_large_image_recode_path():
    """Enough pixels to cross the encoder's re-CLEAR threshold and the
    decoder's width-growth ladder several times."""
    img = (_rng(4).integers(0, 5, size=(80, 90), dtype=np.uint8) * 50).astype(
        np.uint8
    )
    assert np.array_equal(to_gray(decode_gif(encode_gif(img))), img)


def test_too_many_colors_rejected():
    img = np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3)
    img[:, :, 0] = np.arange(32 * 32, dtype=np.int64).reshape(32, 32) % 256
    img[:, :, 1] = (np.arange(32 * 32, dtype=np.int64) // 256).reshape(32, 32)
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_trailer_and_extension_blocks_skipped():
    img = _rng(5).integers(0, 4, size=(6, 6), dtype=np.uint8) * 85
    data = bytearray(encode_gif(img))
    # splice a comment extension right before the image descriptor
    at = data.index(0x2C, 13)
    ext = b"\x21\xfe\x05hello\x00"
    data[at:at] = ext
    assert np.array_equal(to_gray(decode_gif(bytes(data))), img)


def test_file_gif_media_runs_full_ocr(tmp_path):
    """A real GIF on disk flows through rasterize_media -> detect ->
    recognize and reconstructs the exact rendered text (same contract
    as the PNG/JPEG e2e tests)."""
    from doctr_ray.media import (
        encode_media_ref,
        rasterize_synth,
        synth_ground_truth_text,
    )
    from doctr_ray.pipelines.ocr import process_media_row
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.readers import rasterize_media

    ref = encode_media_ref("the gif decoder carries real web scans", 640, 480)
    page = rasterize_synth(ref)[0]
    p = tmp_path / "page.gif"
    p.write_bytes(encode_gif(page.image))

    pages = rasterize_media(f"file://{p}")
    assert len(pages) == 1
    assert np.array_equal(pages[0].image, page.image)

    rows = process_media_row("d0", f"file://{p}", 0, GlyphRecognizer())
    assert " ".join(rows["text"]) == synth_ground_truth_text(ref)
