import numpy as np
import pytest

from doctr_ray.media import (
    DEFAULT_PAGE_H,
    DEFAULT_PAGE_W,
    decode_media_ref,
    encode_media_ref,
    rasterize_synth,
    synth_ground_truth_text,
)


def test_media_ref_roundtrip():
    ref = encode_media_ref("hello world", 800, 600, cols=2)
    text, w, h, cols, art, rot, table, skew = decode_media_ref(ref)
    assert (text, w, h, cols, art, rot, table, skew) == (
        "hello world", 800, 600, 2, 0, 0, None, 0,
    )
    ref2 = encode_media_ref("x", artefacts=3, rotation=90, table=(2, 4), skew_decidegrees=-25)
    assert decode_media_ref(ref2)[4:] == (3, 90, (2, 4), -25)


def test_artefacts_rendered():
    ref = encode_media_ref("hello world words", artefacts=2)
    pages = rasterize_synth(ref)
    p = pages[0]
    assert len(p.artefacts) == 2
    for x0, y0, x1, y1 in p.artefacts:
        assert (p.image[y0:y1, x0:x1] == 0).all()  # solid ink
    # artefacts never overlap word boxes
    for _, wx0, wy0, wx1, wy1 in p.words:
        for ax0, ay0, ax1, ay1 in p.artefacts:
            assert wy1 <= ay0 or wy0 >= ay1 or wx1 <= ax0 or wx0 >= ax1


def test_foreign_ref_rejected():
    with pytest.raises(ValueError):
        decode_media_ref("s3://bucket/file.pdf")


def test_rasterize_single_page():
    ref = encode_media_ref("alpha beta gamma")
    pages = rasterize_synth(ref)
    assert len(pages) == 1
    p = pages[0]
    assert p.image.shape == (DEFAULT_PAGE_H, DEFAULT_PAGE_W)
    assert p.image.dtype == np.uint8
    assert [w[0] for w in p.words] == ["alpha", "beta", "gamma"]
    # words painted: boxes contain ink, ends exclusive and tight
    for text, x0, y0, x1, y1 in p.words:
        cell = p.image[y0:y1, x0:x1]
        assert (cell < 128).any()
        assert (cell[0] < 128).any() and (cell[-1] < 128).any()
        assert (cell[:, 0] < 128).any() and (cell[:, -1] < 128).any()


def test_rasterize_multi_page_and_gt():
    text = " ".join(f"w{i:03d}" for i in range(600))
    ref = encode_media_ref(text, 480, 360)
    pages = rasterize_synth(ref)
    assert len(pages) > 1
    got = [w[0] for p in pages for w in p.words]
    assert got == text.split(" ")
    assert synth_ground_truth_text(ref) == text


def test_rasterize_empty():
    pages = rasterize_synth(encode_media_ref(""))
    assert len(pages) == 1 and pages[0].words == []


def test_rasterize_deterministic():
    ref = encode_media_ref("deterministic words here", 640, 480)
    a = rasterize_synth(ref)
    b = rasterize_synth(ref)
    assert all(np.array_equal(x.image, y.image) for x, y in zip(a, b))


def test_two_column_layout():
    text = " ".join(f"w{i:02d}" for i in range(80))
    pages = rasterize_synth(encode_media_ref(text, 640, 200, cols=2))
    p = pages[0]
    xs = [w[1] for w in p.words]
    assert max(xs) > 320  # some words land in the right column


def test_count_pages_matches_rasterize():
    from doctr_ray.media import count_pages

    for n, w, h in [(0, 640, 480), (5, 640, 480), (200, 480, 360), (600, 480, 360), (80, 640, 200)]:
        text = " ".join(f"w{i:03d}" for i in range(n))
        ref = encode_media_ref(text, w, h)
        assert count_pages(ref) == len(rasterize_synth(ref)), (n, w, h)


def test_file_html_media_route(tmp_path):
    # file://*.html media short-circuit: DOM main-content extraction
    # recovers the article text verbatim (reference io/html.py analog)
    from doctr_ray.functions.html_extract import synthesize_html
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    text = "the quick brown fox jumps over the lazy dog again and again"
    f = tmp_path / "page.html"
    f.write_text(synthesize_html(text, "docX"), encoding="utf-8")
    got, conf = media_to_ocr_span("docX", f"file://{f}", 0, GlyphRecognizer())
    assert got == text
    assert conf == 1.0
