import numpy as np

from doctr_ray.detection import (
    binarize,
    connected_component_boxes,
    detach_scores,
    detect_page,
    dilate,
)
from doctr_ray.media import encode_media_ref, rasterize_synth


def test_dilate_fills_small_gaps():
    m = np.zeros((5, 10), dtype=bool)
    m[2, 2] = True
    m[2, 5] = True  # gap of 2 -> closed at rx=2
    d = dilate(m, rx=2, ry=1)
    assert d[2, 2:6].all()
    assert d[1, 2] and d[3, 2]


def test_connected_components_simple():
    m = np.zeros((10, 10), dtype=bool)
    m[1:3, 1:4] = True
    m[6:9, 5:8] = True
    boxes = connected_component_boxes(m)
    assert boxes.tolist() == [[1, 1, 4, 3], [5, 6, 8, 9]]


def test_connected_components_diagonal_touch():
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = True
    m[1, 1] = True  # 8-connected
    boxes = connected_component_boxes(m)
    assert len(boxes) == 1
    assert boxes[0].tolist() == [0, 0, 2, 2]


def test_connected_components_u_shape_merge():
    # two vertical arms joined at the bottom: labels must union
    m = np.zeros((5, 5), dtype=bool)
    m[0:4, 0] = True
    m[0:4, 4] = True
    m[4, :] = True
    boxes = connected_component_boxes(m)
    assert len(boxes) == 1
    assert boxes[0].tolist() == [0, 0, 5, 5]


def test_detect_page_matches_ground_truth_boxes():
    ref = encode_media_ref("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    page = rasterize_synth(ref)[0]
    abs_boxes, rel = detect_page(page.image)
    assert len(abs_boxes) == len(page.words)
    gt = np.array([[x0, y0, x1, y1] for _, x0, y0, x1, y1 in page.words], dtype=np.int32)
    gt = gt[np.lexsort((gt[:, 0], gt[:, 1]))]
    got = abs_boxes[np.lexsort((abs_boxes[:, 0], abs_boxes[:, 1]))]
    assert np.array_equal(got, gt)  # pixel-exact tight boxes
    boxes, scores = detach_scores(rel)
    assert boxes.shape == (len(gt), 4) and scores.shape == (len(gt),)
    assert (scores > 0).all() and (scores <= 1).all()
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_detect_empty_page():
    img = np.full((100, 200), 255, dtype=np.uint8)
    abs_boxes, rel = detect_page(img)
    assert len(abs_boxes) == 0 and rel.shape == (0, 5)


def test_binarize_threshold():
    img = np.array([[0, 127, 128, 255]], dtype=np.uint8)
    assert binarize(img).tolist() == [[True, True, False, False]]
