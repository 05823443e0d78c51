"""Contrib ArtefactDetector: reference predictor contract on the
deterministic session (batching, thresholds, NMS, pixel-frame boxes)."""

import numpy as np
import pytest

from doctr_ray.contrib import ArtefactDetector, _DeterministicSession
from doctr_ray.media import encode_media_ref, rasterize_synth


def _pages(n_art=2, words="alpha beta gamma delta"):
    ref = encode_media_ref(words, artefacts=n_art)
    return [p.image for p in rasterize_synth(ref)]


def test_detects_artefacts_not_words():
    pages = _pages(n_art=2)
    det = ArtefactDetector()
    results = det(pages)
    assert len(results) == len(pages)
    found = results[0]
    assert len(found) == 2
    for r in found:
        assert r["label"] == "artefact"
        assert r["confidence"] >= 0.95  # solid rectangles
        x0, y0, x1, y1 = r["box"]
        assert 0 <= x0 < x1 and 0 <= y0 < y1  # pixel frame, well-formed
        assert all(isinstance(v, int) for v in r["box"])


def test_batching_matches_single():
    pages = _pages(n_art=1) + _pages(n_art=3) + _pages(n_art=2)
    one = ArtefactDetector(batch_size=1)(pages)
    big = ArtefactDetector(batch_size=4)(pages)
    assert one == big
    assert [len(r) for r in one] == [1, 3, 2]


def test_conf_threshold_filters_everything():
    pages = _pages(n_art=2)
    assert ArtefactDetector(conf_threshold=1.01)(pages) == [[] for _ in pages]


def test_resize_path_rescales_to_original_frame():
    pages = _pages(n_art=2)
    h, w = pages[0].shape[:2]
    native = ArtefactDetector()(pages)[0]
    # same page run through the resize path: boxes come back in the
    # ORIGINAL pixel frame (reference width/height_scale contract);
    # the resolution-exact classifier degrades, so only check that any
    # detections land near the native ones
    det = ArtefactDetector(input_shape=(3, 2 * h, 2 * w), conf_threshold=0.5)
    scaled = det(pages)[0]
    for r in scaled:
        x0, y0, x1, y1 = r["box"]
        assert 0 <= x0 < x1 <= w and 0 <= y0 < y1 <= h


def test_session_contract():
    s = _DeterministicSession()
    assert s.get_inputs()[0].name == "images"
    page = _pages(n_art=1)[0]
    batch = np.repeat(page[None, None, :, :], 3, axis=1).astype(np.float32) / 255.0
    (rel, cls), = s.run(None, {"images": batch})
    assert rel.shape[1] == 5 and len(cls) == len(rel)
    assert (cls == 0).sum() == 1  # one artefact


def test_onnx_model_path_requires_runtime():
    with pytest.raises(ImportError):
        ArtefactDetector(model_path="/tmp/nonexistent.onnx")


def test_show_returns_overlays():
    pages = _pages(n_art=2)
    det = ArtefactDetector()
    det(pages)
    overlays = det.show()
    assert len(overlays) == len(pages)
    assert overlays[0].shape == pages[0].shape
    # boxes were burned in: some pixels changed
    assert (overlays[0] != pages[0]).any()
