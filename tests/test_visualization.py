"""Dependency-free visualization: box overlays + PGM round-trip."""

import numpy as np

from doctr_ray.detection import detect_page
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.visualization import draw_boxes, load_pgm, save_pgm, visualize_page


def test_draw_boxes_outlines():
    img = np.full((100, 200), 255, dtype=np.uint8)
    out = draw_boxes(img, np.array([[0.1, 0.1, 0.5, 0.5]]), value=0)
    assert (img == 255).all()  # input untouched
    x0, y0, x1, y1 = 20, 10, 100, 50
    assert (out[y0, x0 : x1 + 1] == 0).all()  # top edge
    assert (out[y1, x0 : x1 + 1] == 0).all()  # bottom edge
    assert (out[y0 : y1 + 1, x0] == 0).all()  # left edge
    assert (out[y0 + 2 : y1 - 1, x0 + 2 : x1 - 1] == 255).all()  # interior untouched


def test_visualize_page_overlays_detections():
    page = rasterize_synth(encode_media_ref("alpha beta gamma", 640, 480))[0]
    from doctr_ray.builder import build_page
    from doctr_ray.geometry import extract_crops
    from doctr_ray.recognition import GlyphRecognizer

    rec = GlyphRecognizer()
    boxes, rel = detect_page(page.image)
    preds = rec.recognize_batch(extract_crops(page.image, boxes))
    built = build_page(rel[:, :4], [t for t, _ in preds], [c for _, c in preds], rel[:, 4])
    out = visualize_page(built.export, page.image, words=True, lines=True, blocks=True)
    assert out.shape == page.image.shape
    assert (out != page.image).any()  # something was drawn
    assert {128, 192} <= set(np.unique(out).tolist())  # line + block shades


def test_pgm_roundtrip(tmp_path):
    img = np.random.RandomState(0).randint(0, 256, (37, 53), dtype=np.uint8)
    p = save_pgm(img, str(tmp_path / "page.pgm"))
    back = load_pgm(p)
    assert np.array_equal(back, img)
