"""Parity tests: the reference's OWN test fixtures, run against this
engine's ports.

Every box/expected-order fixture below is translated from the
reference's hand-built test cases (no torch needed):

- builder fixtures: reference tests/common/test_models_builder.py
  (:406-449 sort/lines tables, :561-566 degenerate heights, :20-78
  builder basics)
- reading-order fixtures: reference
  tests/common/test_models_reading_order.py (:16-336 — direction,
  labels, columns, vertical, segments, rotated pages, and the
  regression cases)

Documented divergences (API, not semantics):
- this engine accepts direction='ttb' as an alias of 'ttb-rtl' (the
  reference rejects the bare 'ttb');
- DocumentBuilder-level table assignment is a different surface here
  (tables are extracted from images in tables.py, covered by the
  table_grids oracle), so the builder+tables fixtures are not ported.
"""

import os

import numpy as np
import pytest

from doctr_ray.builder import build_page, resolve_lines, sort_boxes
from doctr_ray.reading_order import (
    ReadingOrderPredictor,
    assign_layout_labels,
    deskew_reading_geometries,
    detect_text_direction,
    layout_label_role,
    normalize_layout_label,
    resolve_reading_segments,
    sort_reading_order,
)

# --------------------------------------------------------- builder


@pytest.mark.parametrize(
    "input_boxes, sorted_idxs",
    [
        # reference test_models_builder.py:406-422
        [[[0, 0.5, 0.1, 0.6], [0, 0.3, 0.2, 0.4], [0, 0, 0.1, 0.1]], [2, 1, 0]],  # vertical
        [[[0.7, 0.5, 0.85, 0.6], [0.2, 0.3, 0.4, 0.4], [0, 0, 0.1, 0.1]], [2, 1, 0]],  # diagonal
        [[[0, 0.5, 0.1, 0.6], [0.15, 0.5, 0.25, 0.6], [0.5, 0.5, 0.6, 0.6]], [0, 1, 2]],  # same line
        [[[0, 0.5, 0.1, 0.6], [0.2, 0.49, 0.35, 0.59], [0.8, 0.52, 0.9, 0.63]], [0, 1, 2]],  # ~same line
        [[[0, 0.3, 0.4, 0.45], [0.5, 0.28, 0.75, 0.42], [0, 0.45, 0.1, 0.55]], [0, 1, 2]],  # 2 lines
        [[[0, 0.3, 0.4, 0.35], [0.75, 0.28, 0.95, 0.42], [0, 0.45, 0.1, 0.55]], [0, 1, 2]],  # 2 lines
        [
            [
                [[0.1, 0.1], [0.2, 0.2], [0.15, 0.25], [0.05, 0.15]],
                [[0.5, 0.5], [0.6, 0.6], [0.55, 0.65], [0.45, 0.55]],
            ],
            [0, 1],
        ],  # rotated
    ],
)
def test_ref_sort_boxes(input_boxes, sorted_idxs):
    assert sort_boxes(np.asarray(input_boxes))[0].tolist() == sorted_idxs


@pytest.mark.parametrize(
    "input_boxes, lines",
    [
        # reference test_models_builder.py:429-445
        [[[0, 0.5, 0.1, 0.6], [0, 0.3, 0.2, 0.4], [0, 0, 0.1, 0.1]], [[2], [1], [0]]],
        [[[0.7, 0.5, 0.85, 0.6], [0.2, 0.3, 0.4, 0.4], [0, 0, 0.1, 0.1]], [[2], [1], [0]]],
        [[[0, 0.5, 0.14, 0.6], [0.15, 0.5, 0.25, 0.6], [0.5, 0.5, 0.6, 0.6]], [[0, 1], [2]]],
        [[[0, 0.5, 0.18, 0.6], [0.2, 0.48, 0.35, 0.58], [0.8, 0.52, 0.9, 0.63]], [[0, 1], [2]]],
        [[[0, 0.3, 0.48, 0.45], [0.5, 0.28, 0.75, 0.42], [0, 0.45, 0.1, 0.55]], [[0, 1], [2]]],
        [[[0, 0.3, 0.4, 0.35], [0.75, 0.28, 0.95, 0.42], [0, 0.45, 0.1, 0.55]], [[0], [1], [2]]],
        [
            [
                [[0.1, 0.1], [0.2, 0.2], [0.15, 0.25], [0.05, 0.15]],
                [[0.5, 0.5], [0.6, 0.6], [0.55, 0.65], [0.45, 0.55]],
            ],
            [[0], [1]],
        ],
    ],
)
def test_ref_resolve_lines(input_boxes, lines):
    got, _ = resolve_lines(np.asarray(input_boxes))
    assert [[int(i) for i in line] for line in got] == lines


def test_ref_sort_boxes_degenerate_heights():
    # reference test_models_builder.py:561-566
    boxes = np.array([[0.5, 0.2, 0.6, 0.2], [0.1, 0.2, 0.2, 0.2]], dtype=np.float32)
    idxs, _ = sort_boxes(boxes)
    assert sorted(np.asarray(idxs).tolist()) == [0, 1]


def test_ref_builder_basics():
    # reference test_models_builder.py:20-78 — one line when lines are
    # not resolved; zero blocks for an empty detection
    rng = np.random.RandomState(0)
    boxes = rng.rand(10, 4).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 0.05
    texts = ["hello"] * 10
    built = build_page(boxes, texts, [1.0] * 10, do_resolve_lines=False)
    assert len(built.export["blocks"]) == 1
    assert len(built.export["blocks"][0]["lines"]) == 1
    assert len(built.export["blocks"][0]["lines"][0]["words"]) == 10

    empty = build_page(np.zeros((0, 4), np.float32), [], [])
    assert empty.export["blocks"] == []


# ----------------------------------------------------- reading order


@pytest.mark.parametrize(
    "texts, language, expected",
    [
        # reference test_models_reading_order.py:16-34
        (["Hello", "world"], None, "ltr"),
        (["Die schnelle braune Katze"], None, "ltr"),
        (["Привет мир"], None, "ltr"),
        (["こんにちは世界"], None, "ltr"),
        (["مرحبا", "بالعالم"], None, "rtl"),
        (["שלום עולם"], None, "rtl"),
        (["سلام دنیا"], None, "rtl"),  # Persian
        (["مرحبا Hello بالعالم العربي"], None, "rtl"),  # mixed, RTL-dominant
        (["Hello world مرحبا"], None, "ltr"),  # mixed, LTR-dominant
        (["123", "456"], None, "ltr"),  # no strong character, no hint
        (["123", "456"], "ar", "rtl"),  # no strong character, language hint
        (["123"], "he", "rtl"),
        (["123"], "fr", "ltr"),
        ([], None, "ltr"),
    ],
)
def test_ref_detect_text_direction(texts, language, expected):
    assert detect_text_direction(texts, language=language) == expected


def test_ref_normalize_layout_label():
    # reference test_models_reading_order.py:39-42
    assert normalize_layout_label("Page-header") == "page_header"
    assert normalize_layout_label(" Section header ") == "section_header"
    assert normalize_layout_label(None) == ""


@pytest.mark.parametrize(
    "label, role",
    [
        # reference test_models_reading_order.py:45-58
        ("Page-header", "header"),
        ("Page-footer", "footer"),
        ("Footnote", "footnote"),
        ("Caption", "caption"),
        ("Table", "float"),
        ("Picture", "float"),
        ("Text", "body"),
        ("Title", "body"),
        (None, "body"),
    ],
)
def test_ref_layout_label_role(label, role):
    assert layout_label_role(label) == role


def _two_columns(num_lines: int = 4):
    left = [((0.1, 0.1 + 0.2 * i), (0.45, 0.25 + 0.2 * i)) for i in range(num_lines)]
    right = [((0.55, 0.1 + 0.2 * i), (0.9, 0.25 + 0.2 * i)) for i in range(num_lines)]
    return left + right


def test_ref_sort_reading_order_basic():
    # reference test_models_reading_order.py:69-78
    assert sort_reading_order([]) == []
    assert sort_reading_order([((0.1, 0.1), (0.2, 0.2))]) == [0]
    geoms = [((0.1, 0.5), (0.9, 0.6)), ((0.1, 0.1), (0.9, 0.2)), ((0.1, 0.3), (0.9, 0.4))]
    assert sort_reading_order(geoms) == [1, 2, 0]
    geoms = [((0.55, 0.2), (0.9, 0.8)), ((0.1, 0.05), (0.9, 0.15)), ((0.1, 0.2), (0.45, 0.8))]
    assert sort_reading_order(geoms) == [1, 2, 0]


def test_ref_sort_reading_order_columns():
    # reference test_models_reading_order.py:81-92
    boxes = _two_columns()
    assert sort_reading_order(boxes) == list(range(8))
    assert sort_reading_order(boxes, direction="rtl") == [4, 5, 6, 7, 0, 1, 2, 3]
    rng = np.random.default_rng(42)
    for _ in range(5):
        perm = rng.permutation(8).tolist()
        order = sort_reading_order([boxes[idx] for idx in perm])
        assert [perm[idx] for idx in order] == list(range(8))


def test_ref_sort_reading_order_input_formats():
    # reference test_models_reading_order.py:95-105
    boxes = _two_columns(2)
    expected = sort_reading_order(boxes)
    as_array = np.asarray([(x0, y0, x1, y1) for ((x0, y0), (x1, y1)) in boxes])
    assert sort_reading_order(as_array) == expected
    as_polys = np.asarray(
        [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)] for ((x0, y0), (x1, y1)) in boxes]
    )
    assert sort_reading_order(as_polys) == expected
    assert sort_reading_order(as_array * 1000) == expected


def test_ref_sort_reading_order_vertical():
    # reference test_models_reading_order.py:108-115
    cols = [((0.8 - 0.15 * i, 0.1), (0.9 - 0.15 * i, 0.9)) for i in range(4)]
    assert sort_reading_order(cols, direction="ttb-rtl") == [0, 1, 2, 3]
    assert sort_reading_order(cols, direction="ttb-ltr") == [3, 2, 1, 0]
    cols = [((0.8, 0.5), (0.9, 0.9)), ((0.8, 0.1), (0.9, 0.45)), ((0.6, 0.1), (0.7, 0.9))]
    assert sort_reading_order(cols, direction="ttb-rtl") == [1, 0, 2]


def test_ref_sort_reading_order_labels():
    # reference test_models_reading_order.py:118-144
    geoms = [
        ((0.1, 0.92), (0.9, 0.97)),  # 0: page footer
        ((0.1, 0.02), (0.9, 0.06)),  # 1: page header
        ((0.1, 0.1), (0.9, 0.4)),  # 2: body text
        ((0.1, 0.45), (0.5, 0.7)),  # 3: figure
        ((0.1, 0.71), (0.5, 0.75)),  # 4: caption below the figure
        ((0.55, 0.45), (0.9, 0.88)),  # 5: body on the right of the figure
        ((0.1, 0.8), (0.5, 0.84)),  # 6: footnote
    ]
    labels = ["Page-footer", "Page-header", "Text", "Picture", "Caption", "Text", "Footnote"]
    assert sort_reading_order(geoms, labels=labels) == [1, 2, 3, 4, 5, 6, 0]
    # a caption above its figure is read before it
    geoms_above = list(geoms)
    geoms_above[4] = ((0.1, 0.41), (0.5, 0.44))
    assert sort_reading_order(geoms_above, labels=labels) == [1, 2, 4, 3, 5, 6, 0]
    # a caption too far from any float keeps its natural body position
    geoms_far = list(geoms)
    geoms_far[3] = ((0.1, 0.45), (0.5, 0.5))
    geoms_far[4] = ((0.55, 0.02), (0.9, 0.06))
    order = sort_reading_order(geoms_far, labels=labels)
    assert order.index(4) < order.index(3)
    with pytest.raises(ValueError):
        sort_reading_order(geoms, labels=labels[:-1])


def test_ref_sort_reading_order_degenerate_geometries():
    # reference test_models_reading_order.py:147-151
    geoms = [((0.1, 0.1), (0.1, 0.1))] * 3 + [((0.5, 0.5), (0.5, 0.5))]
    order = sort_reading_order(geoms)
    assert sorted(order) == list(range(4))


def test_ref_resolve_reading_segments():
    # reference test_models_reading_order.py:154-168
    geoms = [((0.1, 0.1 + 0.05 * i), (0.9, 0.13 + 0.05 * i)) for i in range(3)]
    geoms += [((0.1, 0.4 + 0.05 * i), (0.9, 0.43 + 0.05 * i)) for i in range(2)]
    assert resolve_reading_segments(geoms) == [[0, 1, 2], [3, 4]]
    labels = ["Title", "Text", "Text", "Text", "Text"]
    assert resolve_reading_segments(geoms, labels=labels) == [[0], [1, 2], [3, 4]]
    labels = ["Table", "Table", "Text", "Text", "Text"]
    assert resolve_reading_segments(geoms, labels=labels) == [[0], [1], [2], [3, 4]]
    boxes = _two_columns()
    assert resolve_reading_segments(boxes) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    assert resolve_reading_segments([]) == []


def test_ref_assign_layout_labels():
    # reference test_models_reading_order.py:171-181
    geoms = [((0.1, 0.1), (0.4, 0.2)), ((0.6, 0.1), (0.9, 0.2)), ((0.1, 0.5), (0.4, 0.6))]
    regions = [((0.05, 0.05), (0.45, 0.25)), ((0.55, 0.05), (0.95, 0.25))]
    labels = assign_layout_labels(geoms, regions, ["Title", "Text"])
    assert labels == ["Title", "Text", None]
    poly_regions = np.asarray([[(0.05, 0.05), (0.45, 0.05), (0.45, 0.25), (0.05, 0.25)]])
    assert assign_layout_labels(geoms[:1], poly_regions, ["Table"]) == ["Table"]
    assert assign_layout_labels([], regions, ["Title", "Text"]) == []
    with pytest.raises(ValueError):
        assign_layout_labels(geoms, regions, ["Title"])


def test_ref_reading_order_predictor():
    # reference test_models_reading_order.py:184-197
    predictor = ReadingOrderPredictor()
    assert predictor.direction == "auto"
    assert "auto" in repr(predictor)
    geoms = [((0.55, 0.2), (0.9, 0.8)), ((0.1, 0.05), (0.9, 0.15)), ((0.1, 0.2), (0.45, 0.8))]
    assert predictor(geoms, texts=["right column", "the title", "left column"]) == [1, 2, 0]
    assert predictor(geoms, texts=["العمود الأيسر", "العنوان", "العمود الأيمن"]) == [1, 0, 2]
    assert predictor(geoms, language="ar") == [1, 0, 2]
    assert predictor.resolve_direction(["hello"]) == "ltr"
    assert ReadingOrderPredictor(direction="rtl").resolve_direction(["hello"]) == "rtl"
    with pytest.raises(ValueError):
        ReadingOrderPredictor(direction="bottom-up")


def _rotated_box(box, deg, width=800, height=1000):
    # reference test_models_reading_order.py:200-211
    angle = np.deg2rad(deg)
    rot = np.array([[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]])
    center = np.array([width / 2, height / 2])
    (x0, y0), (x1, y1) = box
    pts = np.array([
        [x0 * width, y0 * height],
        [x1 * width, y0 * height],
        [x1 * width, y1 * height],
        [x0 * width, y1 * height],
    ])
    return ((pts - center) @ rot.T + center) / [width, height]


def test_ref_sort_reading_order_rotated_pages():
    # reference test_models_reading_order.py:214-226
    title = [((0.1, 0.06), (0.9, 0.09))]
    left = [((0.1, 0.12 + 0.05 * idx), (0.47, 0.15 + 0.05 * idx)) for idx in range(5)]
    right = [((0.53, 0.12 + 0.05 * idx), (0.9, 0.15 + 0.05 * idx)) for idx in range(5)]
    geoms = title + left + right
    expected = list(range(11))
    for deg in (-35, -15, 15, 35):
        rotated = [_rotated_box(box, deg) for box in geoms]
        assert sort_reading_order(rotated) == expected, deg
        assert sort_reading_order(rotated, page_shape=(1000, 800)) == expected, deg
    straight = np.asarray([[(x0, y0), (x1, y0), (x1, y1), (x0, y1)] for ((x0, y0), (x1, y1)) in geoms])
    assert sort_reading_order(straight) == expected


def test_ref_deskew_reading_geometries():
    # reference test_models_reading_order.py:229-248
    geoms = [((0.1, 0.12), (0.47, 0.15)), ((0.53, 0.12), (0.9, 0.15))]
    rotated = [_rotated_box(box, 25) for box in geoms]
    out, regions = deskew_reading_geometries(geoms, [((0.0, 0.0), (1.0, 0.5))])
    assert out == list(geoms) and len(regions) == 1
    out, _ = deskew_reading_geometries(rotated, page_shape=(1000, 800))
    y_centers = [np.asarray(poly)[:, 1].mean() for poly in out]
    assert abs(y_centers[0] - y_centers[1]) < 0.005
    out, regions = deskew_reading_geometries(rotated, [((0.0, 0.1), (1.0, 0.2))], page_shape=(1000, 800))
    assert np.asarray(regions[0]).shape == (4, 2)
    again, _ = deskew_reading_geometries(out, page_shape=(1000, 800))
    assert all(np.allclose(a, b) for a, b in zip(out, again))
    out, _ = deskew_reading_geometries(rotated, page_shape=(1000, 800), angle_geoms=np.stack(rotated))
    y_centers = [np.asarray(poly)[:, 1].mean() for poly in out]
    assert abs(y_centers[0] - y_centers[1]) < 0.005


def test_ref_reading_order_predictor_rotated():
    # reference test_models_reading_order.py:251-255
    left = [_rotated_box(((0.1, 0.1 + 0.2 * idx), (0.3, 0.2 + 0.2 * idx)), 25) for idx in range(3)]
    right = [_rotated_box(((0.6, 0.1 + 0.2 * idx), (0.8, 0.2 + 0.2 * idx)), 25) for idx in range(3)]
    order = ReadingOrderPredictor()(left + right, page_shape=(1000, 800))
    assert order == [0, 1, 2, 3, 4, 5]


def test_ref_deskew_strong_rotation_non_square_page():
    # reference test_models_reading_order.py:258-270
    layout = [(80, 40, 670, 110), (80, 150, 360, 900), (390, 150, 670, 900)]
    for height, width in [(1000, 750), (700, 2000)]:
        sx, sy = width / 750, height / 1000
        for angle in (-44, 30, 44):
            theta = np.deg2rad(angle)
            rot = np.array([[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]])
            center = np.array([width / 2, height / 2])
            polys = []
            for x0, y0, x1, y1 in layout:
                pts = np.array(
                    [[x0 * sx, y0 * sy], [x1 * sx, y0 * sy], [x1 * sx, y1 * sy], [x0 * sx, y1 * sy]]
                )
                polys.append(((pts - center) @ rot.T + center) / np.array([width, height]))
            assert sort_reading_order(polys, page_shape=(height, width)) == [0, 1, 2], (height, width, angle)


def _box(x0, y0, x1, y1):
    return ((x0, y0), (x1, y1))


def test_ref_fragmented_columns():
    # reference test_models_reading_order.py:280-292
    left = [
        _box(0.10, 0.10, 0.45, 0.13),
        _box(0.10, 0.14, 0.25, 0.17),
        _box(0.34, 0.14, 0.45, 0.17),
        _box(0.10, 0.18, 0.45, 0.21),
        _box(0.10, 0.22, 0.45, 0.25),
        _box(0.10, 0.26, 0.45, 0.29),
    ]
    right = [_box(0.55, 0.10 + 0.04 * i, 0.90, 0.13 + 0.04 * i) for i in range(6)]
    order = sort_reading_order(left + right)
    assert max(order.index(i) for i in range(6)) < min(order.index(i) for i in range(6, 12))


def test_ref_fragmented_row_with_merged_column_components():
    # reference test_models_reading_order.py:295-306
    geoms = [
        _box(0.35, 0.05, 0.65, 0.10),
        _box(0.10, 0.15, 0.45, 0.20),
        _box(0.10, 0.22, 0.16, 0.27),
        _box(0.17, 0.22, 0.24, 0.27),
        _box(0.25, 0.22, 0.45, 0.27),
        _box(0.10, 0.29, 0.45, 0.34),
        _box(0.55, 0.15, 0.90, 0.20),
        _box(0.55, 0.22, 0.90, 0.27),
    ]
    assert sort_reading_order(geoms) == [0, 1, 2, 3, 4, 5, 6, 7]


def test_ref_key_value_rows_stay_together():
    # reference test_models_reading_order.py:309-323
    geoms = [
        _box(0.05, 0.02, 0.95, 0.06),
        _box(0.05, 0.08, 0.95, 0.12),
        _box(0.05, 0.14, 0.95, 0.18),
        _box(0.05, 0.20, 0.30, 0.24),
        _box(0.65, 0.20, 0.95, 0.24),
        _box(0.05, 0.26, 0.30, 0.30),
        _box(0.65, 0.26, 0.95, 0.30),
        _box(0.05, 0.32, 0.30, 0.36),
        _box(0.65, 0.32, 0.95, 0.36),
        _box(0.05, 0.38, 0.95, 0.42),
        _box(0.05, 0.44, 0.95, 0.48),
    ]
    assert sort_reading_order(geoms) == list(range(11))


def test_ref_columns_with_gutter():
    # reference test_models_reading_order.py:326-336
    geoms = [
        _box(0.05, 0.02, 0.95, 0.06),
        _box(0.05, 0.10, 0.45, 0.14),
        _box(0.05, 0.16, 0.45, 0.20),
        _box(0.05, 0.22, 0.45, 0.26),
        _box(0.55, 0.10, 0.95, 0.14),
        _box(0.55, 0.16, 0.95, 0.20),
        _box(0.55, 0.22, 0.95, 0.26),
    ]
    assert sort_reading_order(geoms) == [0, 1, 2, 3, 4, 5, 6]


# ----------------------------------------------- exporter fixtures
# reference tests/common/test_io_exporters.py:20-230, adapted to this
# engine's export-dict surface (same geometries, same expected strings)

from doctr_ray.exporters import (
    export_document_as,
    export_kie_page_as,
    export_page_as,
)


def _word_at(text, x0, y0, x1, y1):
    return {"value": text, "confidence": 0.95, "geometry": [x0, y0, x1, y1]}


def _line_at(text, x0, y0, x1, y1, rtl=False):
    words = text.split()
    step = (x1 - x0) / max(len(words), 1)
    geo = words[::-1] if rtl else words
    return {
        "geometry": [x0, y0, x1, y1],
        "words": [
            _word_at(w, x0 + i * step, y0, x0 + (i + 0.9) * step, y1)
            for i, w in enumerate(geo)
        ],
    }


def _reading_order_page():
    # reference test_io_exporters.py:34-52
    lines = [_line_at("A Two Column Study", 0.2, 0.05, 0.8, 0.09)]
    lines += [_line_at(f"left line {i}", 0.08, 0.14 + 0.05 * i, 0.46, 0.17 + 0.05 * i) for i in range(3)]
    lines += [_line_at(f"right line {i}", 0.54, 0.14 + 0.05 * i, 0.92, 0.17 + 0.05 * i) for i in range(3)]
    lines += [_line_at("- item one", 0.08, 0.4, 0.46, 0.43), _line_at("Page 3 of 12", 0.4, 0.95, 0.6, 0.97)]
    lines = [lines[i] for i in [5, 0, 8, 2, 4, 7, 1, 6, 3]]  # shuffled like the reference
    layout = [
        {"type": "Title", "geometry": [0.15, 0.04, 0.85, 0.1]},
        {"type": "Text", "geometry": [0.06, 0.12, 0.48, 0.32]},
        {"type": "Text", "geometry": [0.52, 0.12, 0.94, 0.32]},
        {"type": "List-item", "geometry": [0.06, 0.38, 0.48, 0.45]},
        {"type": "Page-footer", "geometry": [0.35, 0.94, 0.65, 0.98]},
    ]
    return {"blocks": [{"lines": lines}]}, layout


def test_ref_page_export_as_markdown():
    # reference test_io_exporters.py:71-94
    export, layout = _reading_order_page()
    md = export_page_as(export, "markdown", layout=layout)
    parts = md.split("\n\n")
    assert parts[0] == "# A Two Column Study"
    assert parts[1] == "left line 0\nleft line 1\nleft line 2"
    assert parts[2] == "- \\- item one"  # raw OCR dash escaped inside the bullet
    assert parts[3] == "right line 0\nright line 1\nright line 2"
    assert parts[4] == "Page 3 of 12"
    assert "Page 3 of 12" not in export_page_as(export, "markdown", layout=layout, include_furniture=False)
    # structural characters escaped by default, raw on request
    plain = {"blocks": [{"lines": [_line_at("*bold* #tag [link]", 0.1, 0.1, 0.9, 0.15)]}]}
    assert export_page_as(plain, "markdown") == "\\*bold\\* \\#tag \\[link\\]"
    assert export_page_as(plain, "markdown", escape=False) == "*bold* #tag [link]"
    assert export_page_as({"blocks": []}, "markdown") == ""


def test_ref_page_export_as_markdown_rtl():
    # reference test_io_exporters.py:96-107
    lines = [
        _line_at("النص في العمود الأيمن", 0.54, 0.1, 0.92, 0.14, rtl=True),
        _line_at("النص في العمود الأيسر", 0.08, 0.1, 0.46, 0.14, rtl=True),
    ]
    export = {"blocks": [{"lines": lines}]}
    assert export_page_as(export, "markdown") == "النص في العمود الأيمن\n\nالنص في العمود الأيسر"
    assert export_page_as(export, "markdown", direction="ltr").startswith("الأيسر")


def test_ref_page_export_with_tables():
    # reference test_io_exporters.py:110-134
    lines = [
        _line_at("before the table", 0.1, 0.1, 0.9, 0.14),
        _line_at("after the table", 0.1, 0.7, 0.9, 0.74),
    ]
    export = {"blocks": [{"lines": lines}]}
    tables = [{"grid": [["Name", "Qty"], ["Bolt", "12|3"]], "geometry": [0.1, 0.55, 0.7, 0.65]}]
    md = export_page_as(export, "markdown", tables=tables)
    assert md.split("\n\n") == [
        "before the table",
        "| Name | Qty |\n| --- | --- |\n| Bolt | 12\\|3 |",
        "after the table",
    ]
    adoc = export_page_as(export, "asciidoc", tables=tables)
    assert "|===\n|Name |Qty\n\n|Bolt |12\\|3\n|===" in adoc
    assert adoc.index("before the table") < adoc.index("|===") < adoc.index("after the table")


def test_ref_page_export_as_asciidoc():
    # reference test_io_exporters.py:136-143
    export, layout = _reading_order_page()
    parts = export_page_as(export, "asciidoc", layout=layout).split("\n\n")
    assert parts[0] == "== A Two Column Study"
    assert parts[2] == "* {empty}- item one"
    assert "Page 3 of 12" not in export_page_as(export, "asciidoc", layout=layout, include_furniture=False)


def test_ref_document_export_as_markdown():
    # reference test_io_exporters.py:157-176
    pages = [
        {"blocks": [{"lines": [_line_at(f"page {i} content", 0.1, 0.1, 0.9, 0.15)]}]}
        for i in range(2)
    ]
    assert export_document_as(pages, "markdown") == "page 0 content\n\n---\n\npage 1 content"
    assert export_document_as(pages, "asciidoc") == "page 0 content\n\n<<<\n\npage 1 content"
    assert export_document_as(pages, "markdown", page_break="\n\n") == "page 0 content\n\npage 1 content"
    with pytest.raises(ValueError):
        export_document_as(pages, "pdf")


def test_ref_kie_page_export_as_markdown():
    # reference test_io_exporters.py:179-193
    preds = {
        "words": [
            {"value": "second", "geometry": [0.1, 0.5, 0.9, 0.6]},
            {"value": "first", "geometry": [0.1, 0.1, 0.9, 0.2]},
        ]
    }
    assert export_kie_page_as(preds, "markdown") == "**words**\n\n- first\n- second"
    assert export_kie_page_as(preds, "asciidoc") == "*words*\n\n* first\n* second"
    with pytest.raises(ValueError):
        export_kie_page_as(preds, "yaml")


def test_ref_page_export_as_markdown_list_items():
    # reference test_io_exporters.py:196-235
    lines = [_line_at(f"item number {i}", 0.1, 0.1 + 0.1 * i, 0.5, 0.13 + 0.1 * i) for i in range(3)]
    layout = [
        {"type": "List-item", "geometry": [0.08, 0.09 + 0.1 * i, 0.52, 0.14 + 0.1 * i]}
        for i in range(3)
    ]
    export = {"blocks": [{"lines": lines}]}
    assert export_page_as(export, "markdown", layout=layout) == (
        "- item number 0\n- item number 1\n- item number 2"
    )
    assert export_page_as(export, "asciidoc", layout=layout) == (
        "* item number 0\n* item number 1\n* item number 2"
    )
    # one item wrapped over three visual lines -> ONE bullet
    lines = [
        _line_at("first item wrapping over", 0.1, 0.10, 0.9, 0.13),
        _line_at("several visual lines here", 0.1, 0.14, 0.9, 0.17),
        _line_at("until it finally ends", 0.1, 0.18, 0.6, 0.21),
        _line_at("second short item", 0.1, 0.26, 0.5, 0.29),
    ]
    layout = [
        {"type": "List-item", "geometry": [0.08, 0.09, 0.92, 0.22]},
        {"type": "List-item", "geometry": [0.08, 0.25, 0.52, 0.30]},
    ]
    export = {"blocks": [{"lines": lines}]}
    assert export_page_as(export, "markdown", layout=layout) == (
        "- first item wrapping over several visual lines here until it finally ends\n- second short item"
    )


# --------------------------------------------------------------------------
# Differential parity: execute the REFERENCE reading-order module directly
# (its ordering code is pure numpy + scipy-csgraph; we stub the two scipy
# symbols with a union-find equivalent and the geometry helpers that only
# rotated fixtures reach) and compare orderings on random layouts. This is
# the strongest parity evidence available in this container: not translated
# fixtures, the reference's own code as the oracle.


def _load_reference_reading_order():
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/models/reading_order/base.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    saved = {
        k: sys.modules.get(k)
        for k in (
            "doctr", "doctr.utils", "doctr.utils.geometry", "doctr.utils.repr",
            "scipy", "scipy.sparse", "scipy.sparse.csgraph",
        )
    }
    pkg = types.ModuleType("doctr")
    u = types.ModuleType("doctr.utils")
    ug = types.ModuleType("doctr.utils.geometry")
    # straight-box fixtures short-circuit before deskew uses these
    ug.estimate_page_angle = lambda *a, **k: 0.0
    ug.order_points = lambda p: p
    ur = types.ModuleType("doctr.utils.repr")
    ur.NestedObject = object
    sp = types.ModuleType("scipy")
    sps = types.ModuleType("scipy.sparse")
    spg = types.ModuleType("scipy.sparse.csgraph")
    sps.csr_matrix = lambda x: np.asarray(x)

    def _cc(mat, directed=False, return_labels=True):
        arr = np.asarray(mat).astype(bool)
        n = arr.shape[0]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(arr | arr.T)
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        labels = np.array([find(i) for i in range(n)])
        _, labels = np.unique(labels, return_inverse=True)
        return len(set(labels.tolist())), labels

    spg.connected_components = _cc
    sp.sparse = sps
    sps.csgraph = spg
    mods = {
        "doctr": pkg, "doctr.utils": u, "doctr.utils.geometry": ug,
        "doctr.utils.repr": ur, "scipy": sp, "scipy.sparse": sps,
        "scipy.sparse.csgraph": spg,
    }
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_ref_reading_order", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_ref_differential_random_orderings():
    """Our sort_reading_order must equal the reference's, executed
    directly, on random straight-box layouts in all four directions."""
    ref = _load_reference_reading_order()
    rng = np.random.default_rng(42)
    checked = 0
    for _ in range(120):
        n = int(rng.integers(2, 14))
        x0 = rng.uniform(0, 0.8, n)
        y0 = rng.uniform(0, 0.8, n)
        w = rng.uniform(0.02, 0.3, n)
        h = rng.uniform(0.01, 0.1, n)
        b = np.stack(
            [x0, y0, np.minimum(x0 + w, 0.99), np.minimum(y0 + h, 0.99)], axis=1
        )
        for d in ("ltr", "rtl", "ttb-rtl", "ttb-ltr"):
            assert sort_reading_order(b, direction=d) == ref.sort_reading_order(
                b, direction=d
            ), f"divergence on {d} layout:\n{b!r}"
            checked += 1
    assert checked == 480


def test_ref_differential_labeled_orderings():
    """Label grouping (header/footer/footnote/caption/float) must also
    match the reference end-to-end."""
    ref = _load_reference_reading_order()
    rng = np.random.default_rng(7)
    label_pool = [
        None, None, None, "Page-header", "Page-footer", "Footnote",
        "Caption", "Table", "Picture",
    ]
    for _ in range(60):
        n = int(rng.integers(2, 12))
        x0 = rng.uniform(0, 0.8, n)
        y0 = rng.uniform(0, 0.8, n)
        w = rng.uniform(0.05, 0.4, n)
        h = rng.uniform(0.02, 0.12, n)
        b = np.stack(
            [x0, y0, np.minimum(x0 + w, 0.99), np.minimum(y0 + h, 0.99)], axis=1
        )
        labels = [label_pool[i] for i in rng.integers(0, len(label_pool), n)]
        assert sort_reading_order(b, labels=labels) == ref.sort_reading_order(
            b, labels=labels
        ), f"label divergence:\n{b!r}\n{labels}"


def _load_reference_builder():
    """Execute the reference DocumentBuilder module directly, stubbing
    scipy's fclusterdata with an exact single-linkage threshold
    clustering (criterion='distance' + method='single' == connected
    components of the <= t distance graph) and the element classes the
    line/block methods never instantiate."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/models/builder.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    def _fclusterdata(X, t, depth=None, criterion="distance", metric="euclidean"):
        assert criterion == "distance" and metric == "euclidean"
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(d2 <= t * t)
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = [find(i) for i in range(n)]
        relabel: dict[int, int] = {}
        return np.array([relabel.setdefault(r, len(relabel) + 1) for r in roots])

    def _resolve_enclosing_bbox(bboxes):
        if isinstance(bboxes, np.ndarray):
            return np.array(
                [bboxes[:, 0].min(), bboxes[:, 1].min(), bboxes[:, 2].max(), bboxes[:, 3].max()]
            )
        xs = [p[0] for box in bboxes for p in box]
        ys = [p[1] for box in bboxes for p in box]
        return (min(xs), min(ys)), (max(xs), max(ys))

    mods: dict[str, types.ModuleType] = {}

    def _mk(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        mods[name] = m
        return m

    _mk("doctr")
    _mk("doctr.io")
    el_names = [
        "Block", "Document", "KIEDocument", "KIEPage", "LayoutElement",
        "Line", "Page", "Prediction", "Table", "TableCell", "Word",
    ]
    _mk("doctr.io.elements", **{n: type(n, (), {}) for n in el_names})
    _mk(
        "doctr.utils.geometry",
        estimate_page_angle=lambda *a, **k: 0.0,
        order_points=lambda p: p,
        resolve_enclosing_bbox=_resolve_enclosing_bbox,
        resolve_enclosing_rbbox=lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("rotated path not under differential test")
        ),
        rotate_boxes=lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("rotated path not under differential test")
        ),
    )
    _mk("doctr.utils")
    _mk("doctr.utils.repr", NestedObject=object)
    _mk("scipy")
    _mk("scipy.cluster")
    _mk("scipy.cluster.hierarchy", fclusterdata=_fclusterdata)

    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_ref_builder", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _random_word_boxes(rng, n):
    """Page-like random layout: words on a loose grid with jitter."""
    rows = max(1, int(np.sqrt(n)))
    x0 = rng.uniform(0.02, 0.7, n)
    y0 = (rng.integers(0, rows, n) + rng.uniform(-0.15, 0.15, n)) / (rows + 1) + 0.02
    w = rng.uniform(0.03, 0.2, n)
    h = rng.uniform(0.015, 0.03, n)
    return np.stack([x0, y0, np.minimum(x0 + w, 0.99), np.minimum(y0 + h, 0.99)], axis=1)


def test_ref_differential_builder_lines_blocks():
    """sort_boxes / resolve_lines / resolve_blocks must match the
    reference DocumentBuilder executed directly, on random layouts."""
    ref = _load_reference_builder()
    builder = ref.DocumentBuilder()
    rng = np.random.default_rng(3)
    from doctr_ray.builder import resolve_blocks as ours_blocks
    from doctr_ray.builder import resolve_lines as ours_lines
    from doctr_ray.builder import sort_boxes as ours_sort

    for trial in range(60):
        n = int(rng.integers(2, 40))
        b = _random_word_boxes(rng, n)

        ref_idx, ref_boxes = builder._sort_boxes(b, None)
        our_idx, our_boxes = ours_sort(b, None)
        assert ref_idx.tolist() == our_idx.tolist(), f"sort divergence trial {trial}"
        assert np.allclose(ref_boxes, our_boxes)

        ref_lines = builder._resolve_lines(b, None)
        our_lines, _ = ours_lines(b, None)
        assert ref_lines == our_lines, f"lines divergence trial {trial}:\n{b!r}"

        ref_blocks = builder._resolve_blocks(b, ref_lines)
        our_blocks = ours_blocks(b, our_lines)
        assert ref_blocks == our_blocks, f"blocks divergence trial {trial}"


def test_ref_differential_sub_lines():
    ref = _load_reference_builder()
    builder = ref.DocumentBuilder()
    rng = np.random.default_rng(9)
    from doctr_ray.builder import _resolve_sub_lines as ours_sub

    for _ in range(40):
        n = int(rng.integers(1, 15))
        x0 = np.sort(rng.uniform(0, 0.9, n))
        w = rng.uniform(0.01, 0.12, n)
        b = np.stack([x0, np.full(n, 0.4), np.minimum(x0 + w, 0.99), np.full(n, 0.43)], axis=1)
        idcs = rng.permutation(n).tolist()
        for break_dist in (0.01, 0.035, 0.08):
            assert builder._resolve_sub_lines(b, list(idcs), break_dist) == ours_sub(
                b, list(idcs), break_dist
            )


def test_ref_differential_segments_and_labels():
    """resolve_reading_segments and assign_layout_labels must match the
    reference module executed directly."""
    ref = _load_reference_reading_order()
    rng = np.random.default_rng(21)
    label_pool = [None, None, "Text", "Table", "Caption", "Page-header"]
    for _ in range(40):
        n = int(rng.integers(2, 12))
        x0 = rng.uniform(0, 0.7, n)
        y0 = rng.uniform(0, 0.8, n)
        w = rng.uniform(0.05, 0.3, n)
        h = rng.uniform(0.02, 0.08, n)
        b = np.stack(
            [x0, y0, np.minimum(x0 + w, 0.99), np.minimum(y0 + h, 0.99)], axis=1
        )
        labels = [label_pool[i] for i in rng.integers(0, len(label_pool), n)]
        assert resolve_reading_segments(b, labels=labels) == ref.resolve_reading_segments(
            b, labels=labels
        )
        assert resolve_reading_segments(b) == ref.resolve_reading_segments(b)

        m = int(rng.integers(1, 4))
        rx0 = rng.uniform(0, 0.6, m)
        ry0 = rng.uniform(0, 0.6, m)
        regions = np.stack(
            [rx0, ry0, np.minimum(rx0 + rng.uniform(0.1, 0.4, m), 0.99),
             np.minimum(ry0 + rng.uniform(0.1, 0.4, m), 0.99)], axis=1
        )
        rlabels = [str(x) for x in rng.integers(0, 5, m)]
        assert assign_layout_labels(b, regions, rlabels) == ref.assign_layout_labels(
            b, regions, rlabels
        )


def _load_reference_metrics():
    """Execute the reference metrics module directly. anyascii/scipy/
    shapely are stubbed: only the pure-numpy surfaces (box_iou, nms)
    are under differential test — matching/polygon metrics need the
    real native libs."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/utils/metrics.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    def _raise(*a, **k):
        raise NotImplementedError("not under differential test")

    mods = {}
    m_any = types.ModuleType("anyascii")
    m_any.anyascii = lambda s: s
    mods["anyascii"] = m_any
    m_sp = types.ModuleType("scipy")
    m_opt = types.ModuleType("scipy.optimize")
    m_opt.linear_sum_assignment = _raise
    m_sp.optimize = m_opt
    mods["scipy"] = m_sp
    mods["scipy.optimize"] = m_opt
    m_sh = types.ModuleType("shapely")
    for name in ("STRtree", "area", "intersection", "polygons"):
        setattr(m_sh, name, _raise)
    mods["shapely"] = m_sh

    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_ref_metrics", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_ref_differential_box_iou_and_nms():
    ref = _load_reference_metrics()
    from doctr_ray.geometry import box_iou as ours_iou
    from doctr_ray.metrics import nms as ours_nms

    rng = np.random.default_rng(5)
    for _ in range(40):
        n = int(rng.integers(1, 30))
        m = int(rng.integers(1, 30))
        x0 = rng.uniform(0, 0.7, n); y0 = rng.uniform(0, 0.7, n)
        a = np.stack([x0, y0, x0 + rng.uniform(0.05, 0.3, n), y0 + rng.uniform(0.05, 0.3, n)], axis=1)
        x0 = rng.uniform(0, 0.7, m); y0 = rng.uniform(0, 0.7, m)
        b = np.stack([x0, y0, x0 + rng.uniform(0.05, 0.3, m), y0 + rng.uniform(0.05, 0.3, m)], axis=1)
        assert np.allclose(ref.box_iou(a, b), ours_iou(a, b), atol=1e-12)

        scored = np.concatenate([a, rng.uniform(0.1, 1.0, (n, 1))], axis=1)
        for thresh in (0.1, 0.3, 0.5):
            assert [int(i) for i in ref.nms(scored, thresh)] == ours_nms(scored, thresh).tolist()


def test_ref_differential_text_match_counts():
    """TextMatch raw/caseless counters vs the reference (ASCII inputs,
    where the stubbed anyascii is exact; the engine's documented
    divergence is folding anyascii/unicase into caseless for non-ASCII)."""
    ref = _load_reference_metrics()
    import pyarrow as pa

    from doctr_ray.metrics import text_match_partial

    rng = np.random.default_rng(17)
    words = ["Word", "word", "WORD", "other", "Mot", "mot", "x1", "X1"]
    gt = [words[i] for i in rng.integers(0, len(words), 50)]
    pred = [words[i] for i in rng.integers(0, len(words), 50)]

    tm = ref.TextMatch()
    tm.update(gt, pred)
    summary = tm.summary()

    part = text_match_partial(
        pa.table({"pred": pred, "gt": gt}), pred_col="pred", gt_col="gt"
    )
    assert part["raw"][0].as_py() / 50 == pytest.approx(summary["raw"])
    assert part["caseless"][0].as_py() / 50 == pytest.approx(summary["caseless"])


def _load_reference_vocabs():
    """The reference vocab table imports only re + string — load it
    directly as the oracle for the full 215-entry charset contract."""
    import importlib.util

    path = "/root/reference/doctr/datasets/vocabs.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("_ref_vocabs", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ref_vocab_contract_exact():
    """Every reference vocab entry must be STRING-IDENTICAL (content
    and label order) in the engine's decoded tables."""
    ref = _load_reference_vocabs()
    from doctr_ray.vocabs import VOCABS

    assert set(ref.VOCABS) <= set(VOCABS)
    for name, vocab in ref.VOCABS.items():
        assert VOCABS[name] == vocab, f"vocab contract divergence: {name}"


def _load_reference_dataset_utils():
    """Execute the reference datasets/utils.py (translate/encode/
    decode/encode_sequences are pure numpy+stdlib; PIL and the image/
    geometry helpers its unrelated functions need are stubbed)."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/datasets/utils.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    def _raise(*a, **k):
        raise NotImplementedError

    mods: dict[str, types.ModuleType] = {}
    pil = types.ModuleType("PIL")
    pil_img = types.ModuleType("PIL.Image")
    pil_img.Image = object
    pil.Image = pil_img
    mods["PIL"] = pil
    mods["PIL.Image"] = pil_img
    d = types.ModuleType("doctr")
    dio = types.ModuleType("doctr.io")
    dioi = types.ModuleType("doctr.io.image")
    dioi.get_img_shape = _raise
    dug = types.ModuleType("doctr.utils.geometry")
    for n in ("convert_to_relative_coords", "extract_crops", "extract_rcrops"):
        setattr(dug, n, _raise)
    mods.update({"doctr": d, "doctr.io": dio, "doctr.io.image": dioi, "doctr.utils.geometry": dug})
    # package alias so `from .vocabs import VOCABS` resolves to the real table
    refds = types.ModuleType("_refds")
    refds.__path__ = ["/root/reference/doctr/datasets"]
    mods["_refds"] = refds

    saved = {k: sys.modules.get(k) for k in list(mods) + ["_refds.utils", "_refds.vocabs"]}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_refds.utils", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["_refds.utils"] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_ref_differential_translate_encode():
    """translate / encode_string / decode_sequence / encode_sequences
    vs the reference module executed directly."""
    ref = _load_reference_dataset_utils()
    from doctr_ray.vocabs import (
        VOCABS,
        decode_sequence,
        encode_sequences,
        encode_string,
        translate,
    )

    samples = [
        "Hello, World!", "café crème à 3€", "über naïve façade",
        "with   spaces\tand\nnewlines", "ΚΑΛΗΜΕΡΑ κόσμε", "привет мир",
        "مرحبا بالعالم", "שלום", "नमस्ते", "日本語テキスト", "½±©",
    ]
    for vocab_name in ("english", "french", "german", "greek", "russian", "arabic", "multilingual"):
        for s in samples:
            assert translate(s, vocab_name) == ref.translate(s, vocab_name), (
                f"translate divergence: {s!r} into {vocab_name}"
            )

    rng = np.random.default_rng(13)
    for vocab_name in ("english", "french", "russian"):
        vocab = VOCABS[vocab_name]
        for _ in range(10):
            n = int(rng.integers(1, 12))
            s = "".join(vocab[i] for i in rng.integers(0, len(vocab), n))
            codes = encode_string(s, vocab)
            assert codes == ref.encode_string(s, vocab)
            assert decode_sequence(codes, vocab) == ref.decode_sequence(codes, vocab)

    vocab = VOCABS["english"]
    words_sets = [["ab", "a", "longerword"], ["x"], ["ab", ""]]
    for words in words_sets[:2]:  # reference crashes on empty strings? keep non-empty
        for kwargs in (
            {},
            {"target_size": 6},
            {"target_size": 6, "sos": len(vocab) + 1},
            {"target_size": 8, "sos": len(vocab) + 1, "pad": len(vocab) + 2},
            {"pad": len(vocab) + 2},
            {"target_size": 4, "dynamic_seq_length": True},
        ):
            ours = encode_sequences(words, vocab, **kwargs)
            theirs = ref.encode_sequences(words, vocab, **kwargs)
            assert ours.shape == theirs.shape, f"shape divergence {kwargs}"
            assert (ours == theirs).all(), f"encode_sequences divergence {kwargs}"


def _load_reference_geometry():
    """Execute the reference geometry module directly (cv2 stubbed —
    only the pure-numpy kernels are under differential test; the
    image-warping functions need the real native lib)."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/utils/geometry.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    pkg = types.ModuleType("_refutils")
    pkg.__path__ = ["/root/reference/doctr/utils"]
    cv2 = types.ModuleType("cv2")
    saved = {k: sys.modules.get(k) for k in ("_refutils", "_refutils.common_types", "_refutils.geometry", "cv2")}
    sys.modules["_refutils"] = pkg
    sys.modules["cv2"] = cv2
    try:
        spec = importlib.util.spec_from_file_location("_refutils.geometry", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["_refutils.geometry"] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_ref_differential_geometry_kernels():
    """estimate_page_angle / rotate_boxes / extract_crops /
    resolve_enclosing_bbox vs the reference module executed directly."""
    ref = _load_reference_geometry()
    from doctr_ray.geometry import (
        estimate_page_angle,
        extract_crops,
        resolve_enclosing_bbox,
        rotate_boxes,
    )

    rng = np.random.default_rng(31)
    for _ in range(30):
        # reading-oriented polygons from rotated rectangles
        n = int(rng.integers(1, 10))
        angle = float(rng.uniform(-30, 30))
        th = np.deg2rad(angle)
        cx = rng.uniform(0.2, 0.8, n)
        cy = rng.uniform(0.2, 0.8, n)
        w = rng.uniform(0.05, 0.2, n)
        h = rng.uniform(0.01, 0.05, n)
        # corners in TL,TR,BR,BL order, rotated by theta (y-down frame)
        dx = np.stack([-w / 2, w / 2, w / 2, -w / 2], axis=1)
        dy = np.stack([-h / 2, -h / 2, h / 2, h / 2], axis=1)
        rx = dx * np.cos(th) - dy * np.sin(th)
        ry = dx * np.sin(th) + dy * np.cos(th)
        polys = np.stack([cx[:, None] + rx, cy[:, None] + ry], axis=2).astype(np.float32)

        ours_a = estimate_page_angle(polys)
        ref_a = ref.estimate_page_angle(polys)
        assert ours_a == pytest.approx(ref_a, abs=1e-4), "estimate_page_angle divergence"

        got = rotate_boxes(polys, angle=-ref_a, orig_shape=(512, 512), min_angle=1.0)
        want = ref.rotate_boxes(polys, angle=-ref_a, orig_shape=(512, 512), min_angle=1.0)
        assert np.allclose(got, want, atol=1e-5), "rotate_boxes divergence"

        # rel->abs crop extraction on straight boxes
        img = rng.integers(0, 255, size=(64, 96), dtype=np.uint8)[:, :, None].repeat(3, 2)
        x0 = rng.uniform(0, 0.7, n)
        y0 = rng.uniform(0, 0.7, n)
        boxes = np.stack(
            [x0, y0, x0 + rng.uniform(0.05, 0.29, n), y0 + rng.uniform(0.05, 0.29, n)],
            axis=1,
        ).astype(np.float32)
        theirs = ref.extract_crops(img, boxes)
        ours = extract_crops(img, boxes)  # same relative-projection contract
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            assert np.array_equal(a, b), "extract_crops divergence"

        flat = np.stack([x0, y0, x0 + 0.1, y0 + 0.1], axis=1)
        assert np.allclose(
            resolve_enclosing_bbox(flat), np.asarray(ref.resolve_enclosing_bbox(flat))
        )


def test_ref_differential_detach_scores_and_relative_coords():
    ref = _load_reference_geometry()
    from doctr_ray.detection import detach_scores

    rng = np.random.default_rng(37)
    for _ in range(10):
        n = int(rng.integers(0, 8))
        scored = rng.uniform(0, 1, (n, 5)).astype(np.float32)
        theirs_boxes, theirs_scores = ref.detach_scores([scored])
        ours_boxes, ours_scores = detach_scores([scored])
        assert np.allclose(ours_boxes[0], theirs_boxes[0])
        assert np.allclose(ours_scores[0], theirs_scores[0])


def _load_reference_recognition_utils():
    """Execute the reference merge_strings module directly (rapidfuzz
    Hamming stubbed with the exact equal-length definition)."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/models/recognition/utils.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    rf = types.ModuleType("rapidfuzz")
    rfd = types.ModuleType("rapidfuzz.distance")

    class _Hamming:
        @staticmethod
        def distance(a, b, processor=None):
            assert len(a) == len(b)
            return sum(x != y for x, y in zip(a, b))

    rfd.Hamming = _Hamming
    rf.distance = rfd
    saved = {k: sys.modules.get(k) for k in ("rapidfuzz", "rapidfuzz.distance")}
    sys.modules.update({"rapidfuzz": rf, "rapidfuzz.distance": rfd})
    try:
        spec = importlib.util.spec_from_file_location("_ref_recoutils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_ref_differential_merge_strings():
    """Split-crop merging must agree with the reference on every input:
    exhaustive-random sweep over short alphabet strings hits all of the
    zero/multi/none perfect-match branches."""
    import random

    ref = _load_reference_recognition_utils()
    from doctr_ray.recognition import merge_multi_strings, merge_strings

    random.seed(4)
    alpha = "abcdef"
    for _ in range(1500):
        a = "".join(random.choice(alpha) for _ in range(random.randint(0, 8)))
        b = "".join(random.choice(alpha) for _ in range(random.randint(0, 8)))
        r = random.choice([0.1, 0.3, 0.5, 0.8])
        assert merge_strings(a, b, r) == ref.merge_strings(a, b, r), (a, b, r)
    for _ in range(500):
        seqs = [
            "".join(random.choice(alpha) for _ in range(random.randint(0, 7)))
            for _ in range(random.randint(1, 4))
        ]
        r, lr = random.choice([0.3, 0.5]), random.choice([0.1, 0.5])
        assert merge_multi_strings(seqs, r, lr) == ref.merge_multi_strings(seqs, r, lr)


import contextlib


@contextlib.contextmanager
def _reference_elements():
    """Execute the reference io/elements.py + io/exporters.py directly:
    the real exporter/element code runs on top of the real reference
    geometry and reading-order modules (cv2/scipy/reconstitution
    stubbed as in the other loaders). Gives Page/Word/Line/Block objects
    whose export()/render()/export_as_* are the genuine reference
    implementations."""
    import importlib.util
    import sys
    import types

    ref_root = "/root/reference/doctr"
    if not os.path.exists(f"{ref_root}/io/elements.py"):
        pytest.skip("reference tree not available")

    names = [
        "doctr", "doctr.io", "doctr.utils", "doctr.models", "doctr.file_utils",
        "doctr.utils.common_types", "doctr.utils.repr", "doctr.utils.geometry",
        "doctr.utils.reconstitution", "doctr.models.reading_order",
        "doctr.models.reading_order.base", "doctr.io.exporters",
        "doctr.io.elements", "cv2", "scipy", "scipy.sparse",
        "scipy.sparse.csgraph",
    ]
    saved = {k: sys.modules.get(k) for k in names}

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    def _raise(*a, **k):
        raise NotImplementedError

    try:
        doctr_pkg = types.ModuleType("doctr")
        doctr_pkg.__version__ = "0.0-parity"
        sys.modules["doctr"] = doctr_pkg
        for sub in ("doctr.io", "doctr.utils", "doctr.models"):
            sys.modules[sub] = types.ModuleType(sub)
        fu = types.ModuleType("doctr.file_utils")
        fu.requires_package = lambda *a, **k: None
        sys.modules["doctr.file_utils"] = fu
        sys.modules["cv2"] = types.ModuleType("cv2")
        _load("doctr.utils.common_types", f"{ref_root}/utils/common_types.py")
        _load("doctr.utils.repr", f"{ref_root}/utils/repr.py")
        _load("doctr.utils.geometry", f"{ref_root}/utils/geometry.py")
        rec = types.ModuleType("doctr.utils.reconstitution")
        rec.synthesize_page = _raise
        rec.synthesize_kie_page = _raise
        sys.modules["doctr.utils.reconstitution"] = rec

        sp = types.ModuleType("scipy")
        sps = types.ModuleType("scipy.sparse")
        spg = types.ModuleType("scipy.sparse.csgraph")
        sps.csr_matrix = lambda x: np.asarray(x)

        def _cc(mat, directed=False, return_labels=True):
            arr = np.asarray(mat).astype(bool)
            n = arr.shape[0]
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            ii, jj = np.nonzero(arr | arr.T)
            for a, b in zip(ii.tolist(), jj.tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            labels = np.array([find(i) for i in range(n)])
            _, labels = np.unique(labels, return_inverse=True)
            return len(set(labels.tolist())), labels

        spg.connected_components = _cc
        sps.csgraph = spg
        sp.sparse = sps
        sys.modules.update({"scipy": sp, "scipy.sparse": sps, "scipy.sparse.csgraph": spg})

        ro_pkg = types.ModuleType("doctr.models.reading_order")
        ro_base = _load(
            "doctr.models.reading_order.base", f"{ref_root}/models/reading_order/base.py"
        )
        for n in ro_base.__all__:
            setattr(ro_pkg, n, getattr(ro_base, n))
        ro_pkg.base = ro_base
        sys.modules["doctr.models.reading_order"] = ro_pkg

        _load("doctr.io.exporters", f"{ref_root}/io/exporters.py")
        elements = _load("doctr.io.elements", f"{ref_root}/io/elements.py")
        # the exporter methods lazily import doctr.* at call time, so the
        # module web must stay installed while the caller uses the objects
        yield elements
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _random_reference_page(elements, rng):
    """Random Page built from the reference's own element classes."""
    W, L, B, P = elements.Word, elements.Line, elements.Block, elements.Page
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "a&b", "x<y"]
    blocks = []
    y = 0.05
    for _ in range(int(rng.integers(1, 3))):
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            x = 0.05
            ws = []
            for _ in range(int(rng.integers(1, 5))):
                wwidth = 0.05 + 0.02 * int(rng.integers(0, 4))
                ws.append(
                    W(
                        words[int(rng.integers(0, len(words)))],
                        0.9,
                        ((x, y), (x + wwidth, y + 0.03)),
                        0.8,
                        {"value": 0, "confidence": None},
                    )
                )
                x += wwidth + 0.02
            lines.append(L(ws))
            y += 0.05
        blocks.append(B(lines))
        y += 0.04
    return P(
        None, blocks, 0, (120, 200),
        {"value": 0.0, "confidence": 1.0}, {"value": "en", "confidence": 0.9},
    )


def test_ref_differential_page_exporters():
    """text / markdown / asciidoc / html page exports must be
    BYTE-IDENTICAL to the reference exporters running on the same
    page — the reference Page.export() dict feeds this engine's
    exporters directly (also proving export-schema compatibility)."""
    from doctr_ray.exporters import export_page_as, render_html, render_text

    rng = np.random.default_rng(2)
    with _reference_elements() as elements:
        for _ in range(30):
            page = _random_reference_page(elements, rng)
            exp = page.export()
            assert page.render() == render_text(exp)
            assert page.export_as_markdown() == export_page_as(exp, "markdown")
            assert page.export_as_asciidoc() == export_page_as(exp, "asciidoc")
            assert page.export_as_html() == render_html(exp)


def test_ref_differential_hocr_export():
    """hOCR XML export byte-identical to the reference XMLExporter
    (ocr_system pinned to the stubbed reference version string)."""
    from doctr_ray.exporters import render_hocr

    rng = np.random.default_rng(6)
    with _reference_elements() as elements:
        for _ in range(15):
            page = _random_reference_page(elements, rng)
            ref_bytes, _tree = page.export_as_xml()
            ours = render_hocr(page.export(), ocr_system="python-doctr 0.0-parity")
            assert ours == ref_bytes.decode("utf-8")


def test_ref_differential_document_exports():
    """Document-level render/export page joins must match the reference
    Document mixins (text/markdown/asciidoc/html page breaks)."""
    from doctr_ray.exporters import export_document_as, render_document

    rng = np.random.default_rng(8)
    with _reference_elements() as elements:
        pages = [_random_reference_page(elements, rng) for _ in range(3)]
        doc = elements.Document(pages)
        exps = [p.export() for p in pages]
        assert doc.render() == render_document(exps, "text")
        assert doc.export_as_markdown() == export_document_as(exps, "markdown")
        assert doc.export_as_asciidoc() == export_document_as(exps, "asciidoc")
        assert doc.export_as_html() == render_document(exps, "html")


def test_ref_differential_kie_page_exports():
    """KIE per-class exports (markdown/html) must match the reference
    KIEPage mixins on the same predictions."""
    from doctr_ray.exporters import export_kie_page_as

    rng = np.random.default_rng(9)
    with _reference_elements() as elements:
        Pred = elements.Prediction
        preds = {}
        pred_dicts = {}
        for cls in ("date", "total"):
            ps, ds = [], []
            for _ in range(int(rng.integers(1, 4))):
                x0 = float(rng.uniform(0.05, 0.6))
                y0 = float(rng.uniform(0.05, 0.8))
                geom = ((x0, y0), (x0 + 0.2, y0 + 0.04))
                val = f"v{int(rng.integers(0, 100))}"
                ps.append(Pred(val, 0.9, geom, 0.8, {"value": 0, "confidence": None}))
                ds.append({"value": val, "geometry": geom, "confidence": 0.9})
            preds[cls] = ps
            pred_dicts[cls] = ds
        page = elements.KIEPage(
            None, preds, 0, (120, 200),
            {"value": 0.0, "confidence": 1.0}, {"value": "en", "confidence": 0.9},
        )
        assert page.export_as_markdown() == export_kie_page_as(pred_dicts, "markdown")
        assert page.export_as_html() == export_kie_page_as(pred_dicts, "html")
        assert page.export_as_asciidoc() == export_kie_page_as(pred_dicts, "asciidoc")


def _load_reference_split_utils():
    """Execute the reference recognition predictor _utils module
    (split_crops / remap_preds) directly."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/models/recognition/predictor/_utils.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    rf = types.ModuleType("rapidfuzz")
    rfd = types.ModuleType("rapidfuzz.distance")

    class _Hamming:
        @staticmethod
        def distance(a, b, processor=None):
            return sum(x != y for x, y in zip(a, b))

    rfd.Hamming = _Hamming
    rf.distance = rfd

    pkg = types.ModuleType("_refrec")
    pkg.__path__ = ["/root/reference/doctr/models/recognition"]
    sub = types.ModuleType("_refrec.predictor")
    sub.__path__ = ["/root/reference/doctr/models/recognition/predictor"]
    names = ["rapidfuzz", "rapidfuzz.distance", "_refrec", "_refrec.predictor",
             "_refrec.utils", "_refrec.predictor._utils"]
    saved = {k: sys.modules.get(k) for k in names}
    sys.modules.update({"rapidfuzz": rf, "rapidfuzz.distance": rfd, "_refrec": pkg, "_refrec.predictor": sub})
    try:
        for name, p in (
            ("_refrec.utils", "/root/reference/doctr/models/recognition/utils.py"),
            ("_refrec.predictor._utils", path),
        ):
            spec = importlib.util.spec_from_file_location(name, p)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_ref_differential_split_crops_remap_preds():
    """The reference split/remap contract: identical slice boundaries,
    crop maps, and merged predictions on random wide crops."""
    ref = _load_reference_split_utils()
    from doctr_ray.recognition import remap_preds, split_crops

    rng = np.random.default_rng(23)
    for _ in range(25):
        crops = []
        for _ in range(int(rng.integers(1, 6))):
            h = int(rng.integers(8, 33))
            w = int(rng.integers(4, 400))
            crops.append(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        for max_ratio, target_ratio, ov in ((4.0, 4, 0.5), (6.0, 4, 0.25), (2.0, 2, 0.1)):
            ref_crops, ref_map, ref_req = ref.split_crops(list(crops), max_ratio, target_ratio, ov)
            our_crops, our_map, our_req = split_crops(list(crops), max_ratio, target_ratio, ov)
            assert ref_req == our_req
            assert ref_map == our_map
            assert len(ref_crops) == len(our_crops)
            for a, b in zip(ref_crops, our_crops):
                assert np.array_equal(a, b)
            # remap with synthetic per-slice predictions
            preds = [(f"t{i}ab", 0.5 + 0.4 * (i % 2)) for i in range(len(ref_crops))]
            assert ref.remap_preds(list(preds), ref_map, ov) == remap_preds(
                list(preds), our_map, ov
            )

    with pytest.raises(ValueError):
        split_crops([], 4.0, 4, 0.0)


def test_ref_export_dict_roundtrips_through_engine_elements():
    """A reference Page.export() dict loads into this engine's element
    classes and exports back IDENTICALLY (schema-compatible both ways;
    json-normalized to erase tuple-vs-list)."""
    import json

    from doctr_ray.elements import Document as RDoc
    from doctr_ray.elements import Page as RPage

    def norm(d):
        return json.dumps(d, sort_keys=True, default=float)

    rng = np.random.default_rng(3)
    with _reference_elements() as elements:
        for _ in range(10):
            page = _random_reference_page(elements, rng)
            exp = page.export()
            assert norm(RPage.from_dict(exp).export()) == norm(exp)
        doc = elements.Document([_random_reference_page(elements, rng) for _ in range(2)])
        dexp = doc.export()
        assert norm(RDoc.from_dict(dexp).export()) == norm(dexp)


def test_ref_differential_kie_hocr():
    """KIE hOCR export byte-identical to the reference XMLExporter."""
    from doctr_ray.exporters import render_kie_hocr

    rng = np.random.default_rng(12)
    with _reference_elements() as elements:
        Pred = elements.Prediction
        preds = {}
        pred_dicts = {}
        for cls in ("date", "total", "vendor"):
            ps, ds = [], []
            for _ in range(int(rng.integers(1, 4))):
                x0 = float(rng.uniform(0.05, 0.6))
                y0 = float(rng.uniform(0.05, 0.8))
                geom = ((x0, y0), (x0 + 0.2, y0 + 0.04))
                val = f"v{int(rng.integers(0, 100))}"
                ps.append(Pred(val, 0.87, geom, 0.8, {"value": 0, "confidence": None}))
                ds.append({"value": val, "geometry": geom, "confidence": 0.87})
            preds[cls] = ps
            pred_dicts[cls] = ds
        page = elements.KIEPage(
            None, preds, 0, (120, 200),
            {"value": 0.0, "confidence": 1.0}, {"value": "en", "confidence": 0.9},
        )
        ref_bytes, _tree = page.export_as_xml()
        ours = render_kie_hocr(
            pred_dicts, (120, 200), 0, language="en",
            ocr_system="python-doctr 0.0-parity",
        )
        assert ours == ref_bytes.decode("utf-8")


def _load_reference_model_utils():
    """Execute the reference models/_utils.py directly (cv2/langdetect
    stubbed — only the pure-numpy crop/quad rectification is under
    differential test)."""
    import importlib.util
    import sys
    import types

    path = "/root/reference/doctr/models/_utils.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")

    cv2 = types.ModuleType("cv2")
    ld = types.ModuleType("langdetect")

    class _LDE(Exception):
        pass

    ld.LangDetectException = _LDE
    ld.detect_langs = lambda *a, **k: (_ for _ in ()).throw(_LDE())
    dg = types.ModuleType("doctr.utils.geometry")
    dg.rotate_image = lambda *a, **k: None
    d = types.ModuleType("doctr")
    du = types.ModuleType("doctr.utils")
    mods = {"cv2": cv2, "langdetect": ld, "doctr": d, "doctr.utils": du, "doctr.utils.geometry": dg}
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("_ref_model_utils", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_ref_differential_rectify():
    ref = _load_reference_model_utils()
    from doctr_ray.orientation import rectify_crops, rectify_quad_preds

    rng = np.random.default_rng(15)
    crops = [
        rng.integers(0, 255, (int(rng.integers(4, 12)), int(rng.integers(4, 12))), np.uint8)
        for _ in range(8)
    ]
    orientations = [int(rng.integers(0, 4)) for _ in range(8)]
    ref_out = ref.rectify_crops(list(crops), list(orientations))
    our_out = rectify_crops(list(crops), list(orientations))
    assert len(ref_out) == len(our_out)
    for a, b in zip(ref_out, our_out):
        assert np.array_equal(a, b)
    assert ref.rectify_crops([], []) == rectify_crops([], [])

    quads = rng.uniform(0, 1, (8, 4, 2))
    assert np.array_equal(
        ref.rectify_loc_preds(quads, orientations),
        rectify_quad_preds(quads, orientations),
    )
    assert rectify_quad_preds(np.zeros((0, 4, 2)), []) is None
    assert ref.rectify_loc_preds(np.zeros((0, 4, 2)), []) is None
