"""Page reconstitution: builder export -> page image (synthesize_page)."""

import numpy as np

from doctr_ray.builder import build_page
from doctr_ray.detection import detect_page
from doctr_ray.geometry import extract_crops
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.recognition import GlyphRecognizer
from doctr_ray.reconstitution import synthesize_kie_page, synthesize_page

WORDS = "alpha beta gamma delta epsilon zeta theta kappa".split()


def _export_of(image, rec):
    boxes, rel = detect_page(image)
    crops = extract_crops(image, boxes)
    preds = rec.recognize_batch(crops)
    return build_page(
        rel[:, :4], [t for t, _ in preds], [c for _, c in preds], rel[:, 4]
    ).export


def test_roundtrip_exact():
    """Extract -> reconstitute reproduces the synthetic page
    pixel-for-pixel (the procedural font is the renderer AND the
    recognizer, so reconstitution is exact on the engine's own assets —
    the reference's PIL-based synthesize_page is approximate)."""
    rec = GlyphRecognizer()
    page = rasterize_synth(encode_media_ref(" ".join(WORDS), 640, 480))[0]
    export = _export_of(page.image, rec)
    out = synthesize_page(export, page.image.shape[:2])
    assert np.array_equal(out, page.image)


def test_draw_proba_shades_low_confidence():
    export = {
        "blocks": [
            {
                "lines": [
                    {
                        "words": [
                            {"value": "ab", "confidence": 0.5, "geometry": [0.1, 0.1, 0.2, 0.2]}
                        ]
                    }
                ]
            }
        ]
    }
    out = synthesize_page(export, (100, 200), draw_proba=True)
    vals = set(np.unique(out).tolist())
    assert 255 in vals and 128 in vals and 0 not in vals


def test_box_fit_rescales():
    # a word drawn into a box twice its natural size still lands inside
    export = {
        "blocks": [
            {"lines": [{"words": [{"value": "abc", "confidence": 1.0, "geometry": [0.0, 0.0, 0.5, 0.5]}]}]}
        ]
    }
    out = synthesize_page(export, (60, 140))
    assert (out[:30, :70] == 0).any()
    assert (out[31:, :] == 255).all()


def test_synthesize_kie_page():
    preds = [
        {"value": "word", "x0": 0.1, "y0": 0.1, "x1": 0.3, "y1": 0.2},
        {"value": "", "x0": 0.5, "y0": 0.5, "x1": 0.7, "y1": 0.7},  # artefact
    ]
    out = synthesize_kie_page(preds, (100, 200))
    assert (out[50:70, 100:140] == 0).all()  # solid artefact box
    assert (out[10:20, 20:60] == 0).any()    # word ink
