"""Orientation: crop rectification, page rotation estimate, rotated e2e."""

import numpy as np
import pytest

from doctr_ray.glyphs import render_word
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.orientation import (
    classify_crop_orientation,
    deskew_page,
    estimate_page_rotation,
    rectify_crop,
    rectify_loc_preds,
    rotate_image_90,
)
from doctr_ray.recognition import GlyphRecognizer


@pytest.fixture(scope="module")
def rec():
    return GlyphRecognizer()


def test_rotate_image_90_roundtrip():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(rotate_image_90(rotate_image_90(img, 90), 270), img)
    assert rotate_image_90(img, 90).shape == (4, 3)


def test_rectify_crop_recovers_word(rec):
    crop = ((1 - render_word("hello")) * 255).astype(np.uint8)
    for angle in (0, 90, 180, 270):
        rotated = rotate_image_90(crop, angle)
        upright = rectify_crop(rotated, angle)
        assert np.array_equal(upright, crop)


def test_classify_crop_orientation(rec):
    crop = ((1 - render_word("wonder")) * 255).astype(np.uint8)
    for angle in (0, 90, 180, 270):
        rotated = rotate_image_90(crop, angle)
        got, conf = classify_crop_orientation(rotated, rec)
        assert got == angle, angle
        assert conf == pytest.approx(1.0)


def test_rectify_loc_preds_inverse():
    boxes = np.array([[0.1, 0.2, 0.3, 0.25]], dtype=np.float32)
    # rotating coordinates by 90 then mapping back must round-trip
    out = rectify_loc_preds(boxes, 0)
    assert np.allclose(out, boxes)
    out180 = rectify_loc_preds(boxes, 180)
    assert np.allclose(out180, [[0.7, 0.75, 0.9, 0.8]])


def test_estimate_page_rotation(rec):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    for rot in (0, 90, 180, 270):
        ref = encode_media_ref(text, rotation=rot)
        page = rasterize_synth(ref)[0]
        assert estimate_page_rotation(page.image, rec) == rot, rot
        upright = deskew_page(page.image, rot)
        base = rasterize_synth(encode_media_ref(text))[0].image
        assert np.array_equal(upright, base)


def test_rotated_media_e2e(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    text = "the quick brown fox jumps over the lazy dog"
    rows_ids, rows_spans = [], []
    for rot in (0, 90, 180, 270):
        rows_ids.append(f"doc-rot{rot}")
        rows_spans.append(
            [
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": encode_media_ref(text, rotation=rot),
                    "offset": 0,
                }
            ]
        )
    t = pa.Table.from_arrays(
        [pa.array(rows_ids, pa.string()), pa.array(rows_spans, SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(rd.from_arrow(t), detect_orientation=True).to_pandas()
    assert dict(zip(out["doc_id"], out["full_text"])) == {
        d: text for d in rows_ids
    }


def test_estimate_skew_angle():
    from doctr_ray.geometry import rotate_image
    from doctr_ray.orientation import estimate_skew_angle

    text = " ".join(["customer", "window", "merge", "batch", "value"] * 8)
    base = rasterize_synth(encode_media_ref(text))[0].image
    for deg in (1.5, 3.0, 5.0):
        skewed = rotate_image(base, deg)
        est = estimate_skew_angle(skewed)
        assert abs(est - deg) < 0.5, (deg, est)
    assert abs(estimate_skew_angle(base)) < 0.5


def test_straighten_pages_exact(ray_session):
    """Skewed scans (media s-spec): the exact inverse-reconstruction
    path (doctr_ray.skew) recovers EVERY word byte-exactly."""
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    words = ["customer", "window", "merge", "batch", "value", "part", "key", "scan"] * 5
    text = " ".join(words)
    ref = encode_media_ref(text, skew_decidegrees=30)  # 3 degrees
    t = pa.Table.from_arrays(
        [
            pa.array(["doc-skew"], pa.string()),
            pa.array(
                [[{"kind": "media", "text": "", "media_ref": ref, "offset": 0}]],
                SPANS_TYPE,
            ),
        ],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(rd.from_arrow(t), straighten_pages=True).to_pandas()
    assert out["full_text"][0] == text  # byte-exact, in order
