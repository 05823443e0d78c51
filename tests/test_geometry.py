"""Geometry kernels (reference utils/geometry.py, models/_utils.py)."""

import numpy as np
import pytest

from doctr_ray.geometry import (
    box_iou,
    estimate_page_angle,
    extract_crops,
    mask_regions,
    rel_to_abs,
    remove_padding_coords,
    resize_aspect_pad,
    resolve_enclosing_bbox,
    rotate_boxes,
)


def test_resolve_enclosing_bbox():
    b = np.array([[0.1, 0.2, 0.3, 0.4], [0.2, 0.1, 0.5, 0.3]])
    assert resolve_enclosing_bbox(b).tolist() == [0.1, 0.1, 0.5, 0.4]


def test_rotate_boxes_noop_below_min_angle():
    b = np.array([[0.1, 0.1, 0.3, 0.2]], dtype=np.float32)
    out = rotate_boxes(b, angle=0.5, orig_shape=(100, 100))
    assert out.shape == (1, 4, 2)  # expanded to polygons, unrotated
    np.testing.assert_allclose(out[0, 0], [0.1, 0.1])
    np.testing.assert_allclose(out[0, 2], [0.3, 0.2])


def test_rotate_boxes_range_contract():
    # the reference's rotate_boxes contract covers -90..+90 degrees:
    # angles beyond 90 - min_angle are a NO-OP (utils/geometry.py:276);
    # page-level 180-degree turns are handled by rotate_image_90
    b = np.array([[0.1, 0.1, 0.3, 0.2]], dtype=np.float32)
    out = rotate_boxes(b, angle=180.0, orig_shape=(100, 100))
    assert out[0, :, 0].min() == pytest.approx(0.1, abs=1e-6)  # unchanged poly
    # an in-range rotation moves points the reference's way: near +90
    # deg the top-left corner region maps toward the bottom-left
    # ((x,y) -> ~(y, 1-x) about the center on a square page)
    out = rotate_boxes(b, angle=80.0, orig_shape=(100, 100), min_angle=1.0)
    xs, ys = out[0, :, 0], out[0, :, 1]
    assert xs.mean() == pytest.approx(0.103, abs=0.01)
    assert ys.mean() == pytest.approx(0.735, abs=0.01)


def test_estimate_page_angle():
    # horizontal polys -> 0; tilted -> the tilt
    polys = np.array([[[0, 0], [10, 0], [10, 2], [0, 2]]], dtype=np.float64)
    assert estimate_page_angle(polys) == pytest.approx(0.0)
    tilt = np.array([[[0, 10], [10, 0], [11, 1], [1, 11]]], dtype=np.float64)
    assert estimate_page_angle(tilt) == pytest.approx(45.0, abs=1.0)


def test_rel_to_abs_and_extract_crops():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    rel = np.array([[0.2, 0.1, 0.5, 0.4]], dtype=np.float32)
    ab = rel_to_abs(rel, (10, 10))
    assert ab.tolist() == [[2, 1, 5, 4]]
    crops = extract_crops(img, ab)
    assert crops[0].shape == (3, 3)
    assert crops[0][0, 0] == img[1, 2]


def test_box_iou():
    a = np.array([[0, 0, 2, 2]], dtype=np.float64)
    b = np.array([[1, 1, 3, 3], [5, 5, 6, 6]], dtype=np.float64)
    iou = box_iou(a, b)
    assert iou[0, 0] == pytest.approx(1 / 7)
    assert iou[0, 1] == 0.0


def test_mask_regions():
    img = np.zeros((10, 10), dtype=np.uint8)
    out = mask_regions(img, np.array([[0.0, 0.0, 0.5, 0.5]]))
    assert (out[:5, :5] == 255).all()
    assert (out[5:, 5:] == 0).all()
    assert (img == 0).all()  # original untouched


def test_resize_aspect_pad_and_remove_padding():
    img = np.full((10, 20), 7, dtype=np.uint8)
    out, pad = resize_aspect_pad(img, (32, 32), pad_value=0)
    assert out.shape == (32, 32)
    top, bottom, left, right = pad
    assert left == right == 0  # width-bound
    assert top + bottom == 32 - 16
    # content occupies rows [top, top+16)
    assert (out[top : top + 16] == 7).all()
    # a box spanning the content maps back to the full original
    content_box = np.array(
        [[0.0, top / 32, 1.0, (top + 16) / 32]], dtype=np.float32
    )
    back = remove_padding_coords(content_box, (32, 32), pad)
    np.testing.assert_allclose(back, [[0, 0, 1, 1]], atol=1e-6)


def test_resize_bilinear_semantics():
    import numpy as np

    from doctr_ray.geometry import resize_bilinear

    # constant image stays constant at any size
    img = np.full((10, 8), 77, dtype=np.uint8)
    assert (resize_bilinear(img, (23, 5)) == 77).all()
    # identity size -> identical
    r = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(resize_bilinear(r, (3, 4)), r)
    # 2x upscale of a 2x2 checkerboard: half-pixel centers give the
    # classic [a, 3/4a+1/4b, ...] pattern — hand-computed fixture
    cb = np.array([[0, 100], [100, 0]], dtype=np.uint8)
    up = resize_bilinear(cb, (4, 4))
    assert up[0, 0] == 0 and up[3, 3] == 0
    assert up[0, 3] == 100 and up[3, 0] == 100
    assert up[1, 1] == up[2, 2] == 38  # 0.25-offset blend: 2*0.1875*100 = 37.5 -> 38
    assert up[0, 1] == 25 and up[0, 2] == 75
    # linear ramp is preserved exactly under bilinear (floats)
    ramp = np.tile(np.linspace(0, 1, 16), (4, 1))
    out = resize_bilinear(ramp, (4, 31))
    rows_equal = np.allclose(out, out[0])
    assert rows_equal
    d = np.diff(out[0])
    # interior stays exactly linear; edges clamp (replicate padding)
    assert np.allclose(d[1:-1], d[1], atol=1e-9)


def test_resize_bilinear_aspect_pad_contract():
    import numpy as np

    from doctr_ray.geometry import (
        remove_padding_coords,
        resize_aspect_pad,
        resize_bilinear_aspect_pad,
    )

    img = np.random.RandomState(3).randint(0, 256, (30, 50), dtype=np.uint8)
    out, pad = resize_bilinear_aspect_pad(img, (64, 64))
    out_nn, pad_nn = resize_aspect_pad(img, (64, 64))
    assert out.shape == (64, 64) and pad == pad_nn  # same geometry contract
    # padding regions equal the pad value
    top, bottom, left, right = pad
    if top:
        assert (out[:top] == 255).all()
    if bottom:
        assert (out[-bottom:] == 255).all()
    # remove_padding_coords round-trips the content box
    b = remove_padding_coords(np.array([[left / 64, top / 64, (64 - right) / 64, (64 - bottom) / 64]]), (64, 64), pad)
    assert np.allclose(b, [[0, 0, 1, 1]], atol=1e-6)
