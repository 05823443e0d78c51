"""KIE pipeline: multi-class detection, per-class sorted predictions."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
from doctr_ray.detection import detect_page
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.pipelines.kie import classify_components, kie_predictions


def test_classify_components_on_rendered_page():
    ref = encode_media_ref("alpha beta gamma delta", artefacts=2)
    page = rasterize_synth(ref)[0]
    abs_boxes, rel = detect_page(page.image)
    classes = classify_components(rel, page.image.shape)
    assert (classes == "artefacts").sum() == 2
    assert (classes == "words").sum() == 4


def test_kie_predictions_e2e(ray_session):
    words = "alpha beta gamma delta epsilon"
    ref = encode_media_ref(words, artefacts=3)
    t = pa.Table.from_arrays(
        [
            pa.array(["doc-kie"], pa.string()),
            pa.array(
                [[{"kind": "media", "text": "", "media_ref": ref, "offset": 0}]],
                SPANS_TYPE,
            ),
        ],
        schema=DOCS_SCHEMA,
    )
    out = kie_predictions(rd.from_arrow(t)).to_pandas()
    w = out[out["class_name"] == "words"].sort_values("rank")
    a = out[out["class_name"] == "artefacts"].sort_values("rank")
    assert list(w["value"]) == words.split(" ")  # reading order per class
    assert len(a) == 3 and (a["value"] == "").all()
    assert (a["confidence"] >= 0.95).all()  # solid rectangles
    # artefacts sorted left-to-right (same row)
    assert list(a["x0"]) == sorted(a["x0"])
