"""Metrics: TextMatch, LocalizationConfusion, NMS (reference utils/metrics.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from doctr_ray.metrics import (
    localization_confusion,
    match_boxes,
    nms,
    text_match,
)


def test_text_match(ray_session):
    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "pred": ["Hello", "world", "Café", "miss"],
                "gt": ["hello", "world", "Café", "hit"],
            }
        )
    )
    m = text_match(ds)
    assert m["total"] == 4
    assert m["raw"] == pytest.approx(1 / 4)       # only 'world'
    assert m["caseless"] == pytest.approx(2 / 4)  # + 'Hello'
    assert m["unidecode"] == pytest.approx(3 / 4)  # + NFD-equal Café


def test_match_boxes_greedy():
    gt = np.array([[0.1, 0.1, 0.3, 0.2], [0.5, 0.5, 0.7, 0.6]], dtype=np.float32)
    pred_same = gt.copy()
    assert match_boxes(gt, pred_same) == 2
    pred_one = gt[:1]
    assert match_boxes(gt, pred_one) == 1
    assert match_boxes(gt, np.zeros((0, 4), np.float32)) == 0


def test_localization_confusion(ray_session):
    rows = {
        "gt_boxes": [
            [0.1, 0.1, 0.3, 0.2, 0.5, 0.5, 0.7, 0.6],
            [0.2, 0.2, 0.4, 0.3],
        ],
        "pred_boxes": [
            [0.1, 0.1, 0.3, 0.2],               # matches 1 of 2
            [0.2, 0.2, 0.4, 0.3, 0.8, 0.8, 0.9, 0.9],  # 1 match + 1 false pos
        ],
    }
    ds = rd.from_arrow(pa.Table.from_pydict(rows))
    m = localization_confusion(ds)
    assert m["matches"] == 2
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["precision"] == pytest.approx(2 / 3)


def test_nms():
    boxes = np.array(
        [
            [0.1, 0.1, 0.3, 0.3, 0.9],
            [0.11, 0.11, 0.31, 0.31, 0.8],  # overlaps first -> suppressed
            [0.6, 0.6, 0.8, 0.8, 0.7],
        ],
        dtype=np.float32,
    )
    kept = nms(boxes, 0.5)
    assert kept.tolist() == [0, 2]
    assert nms(np.zeros((0, 5), np.float32)).tolist() == []
