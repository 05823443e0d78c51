"""Reading-order module: direction, XY-cut columns, segments, 2-col e2e."""

import numpy as np
import pytest

from doctr_ray.reading_order import (
    detect_text_direction,
    resolve_reading_segments,
    sort_reading_order,
    xy_cut_order,
)


def test_detect_text_direction():
    assert detect_text_direction(["hello", "world"]) == "ltr"
    assert detect_text_direction(["مرحبا"]) == "rtl"  # Arabic
    assert detect_text_direction([]) == "ltr"


def test_title_over_two_columns():
    # mirrors the reference doctest (reading_order/base.py:394-402):
    # right column, title, left column -> order [title, left, right]
    boxes = np.array(
        [
            [0.55, 0.2, 0.9, 0.8],   # right column
            [0.1, 0.05, 0.9, 0.15],  # full-width title
            [0.1, 0.2, 0.45, 0.8],   # left column
        ]
    )
    assert sort_reading_order(boxes) == [1, 2, 0]


def test_two_column_order():
    boxes = np.array(
        [
            [0.1, 0.1, 0.4, 0.2],   # L1
            [0.6, 0.1, 0.9, 0.2],   # R1
            [0.1, 0.3, 0.4, 0.4],   # L2
            [0.6, 0.3, 0.9, 0.4],   # R2
        ]
    )
    assert sort_reading_order(boxes) == [0, 2, 1, 3]


def test_rtl_columns_reversed():
    boxes = np.array(
        [
            [0.1, 0.1, 0.4, 0.2],
            [0.6, 0.1, 0.9, 0.2],
        ]
    )
    assert xy_cut_order(boxes, rtl=True) == [1, 0]


def test_no_cut_falls_back_to_sort_key():
    # overlapping elements, no clean gap -> builder sort key order
    boxes = np.array(
        [
            [0.1, 0.5, 0.6, 0.6],
            [0.4, 0.1, 0.9, 0.2],
        ]
    )
    assert sort_reading_order(boxes) == [1, 0]


def test_reading_segments():
    boxes = np.array(
        [
            [0.1, 0.10, 0.5, 0.15],
            [0.1, 0.16, 0.5, 0.21],  # tight below -> same segment
            [0.1, 0.60, 0.5, 0.65],  # far -> new segment
        ]
    )
    assert resolve_reading_segments(boxes, order=[0, 1, 2]) == [[0, 1], [2]]


def test_two_column_page_roundtrip(ray_session):
    """e2e: a 2-column synth page reads left column fully before right
    only with keep_reading_order=True."""
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.media import encode_media_ref
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    # 70 words fill BOTH columns: the reference's gutter test only sees
    # two columns when each side holds >= 25% of the elements and no
    # line spans half the content extent — an underfilled right column
    # is (correctly, per the reference engine) read row-wise instead
    text = " ".join(f"w{i:02d}" for i in range(70))
    ref = encode_media_ref(text, 640, 160, cols=2)
    t = pa.Table.from_arrays(
        [
            pa.array(["doc-2col"], pa.string()),
            pa.array(
                [[{"kind": "media", "text": "", "media_ref": ref, "offset": 0}]],
                SPANS_TYPE,
            ),
        ],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(rd.from_arrow(t), keep_reading_order=True).to_pandas()
    assert out["full_text"][0] == text
    out2 = ocr_extracted_text(rd.from_arrow(t), keep_reading_order=False).to_pandas()
    assert out2["full_text"][0] != text  # interleaves columns row-wise


def test_sort_with_labels_header_footer():
    import numpy as np

    from doctr_ray.reading_order import sort_with_labels

    boxes = np.array(
        [
            [0.1, 0.90, 0.9, 0.95],  # footer (top of list to prove reorder)
            [0.1, 0.45, 0.9, 0.55],  # body
            [0.1, 0.05, 0.9, 0.10],  # header
            [0.1, 0.80, 0.9, 0.85],  # footnote
        ]
    )
    labels = ["Page-footer", "Text", "Page-header", "Footnote"]
    assert sort_with_labels(boxes, labels) == [2, 1, 3, 0]


def test_sort_with_labels_caption_attach():
    import numpy as np

    from doctr_ray.reading_order import sort_with_labels

    boxes = np.array(
        [
            [0.1, 0.10, 0.9, 0.20],  # body text above
            [0.1, 0.30, 0.9, 0.60],  # Picture (float)
            [0.1, 0.62, 0.9, 0.66],  # its caption (just below)
            [0.1, 0.70, 0.9, 0.80],  # body text below
        ]
    )
    labels = ["Text", "Picture", "Caption", "Text"]
    order = sort_with_labels(boxes, labels)
    # caption immediately follows the picture regardless of base order
    pi, ci = order.index(1), order.index(2)
    assert ci == pi + 1
    assert order[0] == 0 and order[-1] == 3


def test_sort_with_labels_far_caption_not_attached():
    import numpy as np

    from doctr_ray.reading_order import sort_with_labels

    boxes = np.array(
        [
            [0.1, 0.05, 0.9, 0.30],  # Picture
            [0.1, 0.85, 0.9, 0.90],  # far Caption (gap 0.55 > 0.1)
        ]
    )
    order = sort_with_labels(boxes, ["Picture", "Caption"])
    assert order == [0, 1]  # positional order kept, no attach semantics


def test_assign_layout_labels():
    import numpy as np

    from doctr_ray.reading_order import assign_layout_labels

    regions = np.array([[0.0, 0.0, 1.0, 0.2], [0.0, 0.8, 1.0, 1.0]])
    labels = ["Page-header", "Page-footer"]
    elements = np.array(
        [
            [0.1, 0.05, 0.3, 0.15],  # inside header
            [0.1, 0.85, 0.3, 0.95],  # inside footer
            [0.1, 0.45, 0.3, 0.55],  # covered by neither
            [0.1, 0.15, 0.3, 0.30],  # straddles header, coverage 1/3 < 0.5
        ]
    )
    got = assign_layout_labels(elements, regions, labels)
    assert got == ["Page-header", "Page-footer", None, None]  # default None like the reference
    assert assign_layout_labels(np.zeros((0, 4)), regions, labels) == []
    assert assign_layout_labels(elements[:1], np.zeros((0, 4)), []) == [None]
    assert assign_layout_labels(elements[:1], np.zeros((0, 4)), [], default="Text") == ["Text"]


def test_ttb_vertical_order():
    """Vertical text: columns read right-to-left, cells top-to-bottom
    within a column (ttb direction, reference base.py:138-155)."""
    import numpy as np

    from doctr_ray.reading_order import sort_reading_order

    boxes = np.array(
        [
            [0.1, 0.1, 0.2, 0.3],  # left col, top
            [0.1, 0.5, 0.2, 0.7],  # left col, bottom
            [0.7, 0.1, 0.8, 0.3],  # right col, top    -> 1st
            [0.7, 0.5, 0.8, 0.7],  # right col, bottom
        ]
    )
    # [2, 0, 3, 1] is the REFERENCE's output for this sparse 2x2 grid
    # (verified by executing models/reading_order/base.py directly; see
    # test_reference_parity.py::test_ref_differential_random_orderings):
    # in the canonical frame the two top cells form a detected column,
    # and the multi-column continuation preference follows it. Tall
    # filled columns order typographically — the reference's own
    # vertical fixtures pin that case.
    assert sort_reading_order(boxes, direction="ttb") == [2, 0, 3, 1]


def test_rtl_direction_explicit():
    import numpy as np

    from doctr_ray.reading_order import sort_reading_order

    boxes = np.array([[0.1, 0.1, 0.3, 0.2], [0.6, 0.1, 0.8, 0.2]])
    assert sort_reading_order(boxes, direction="rtl") == [1, 0]
    assert sort_reading_order(boxes, direction="ltr") == [0, 1]
