"""Builder semantics — fixtures mirror the reference's
tests/common/test_models_builder.py patterns (F3 in FIXTURES.md)."""

import numpy as np
import pytest

from doctr_ray.builder import (
    build_page,
    page_text,
    resolve_blocks,
    resolve_lines,
    sort_boxes,
)


def _boxes(rows):
    return np.array(rows, dtype=np.float32)


def test_sort_boxes_reading_order():
    # two lines of two words each; sort key = x + 2*ymax/med_h
    boxes = _boxes(
        [
            [0.5, 0.1, 0.6, 0.15],  # line1 right
            [0.1, 0.1, 0.2, 0.15],  # line1 left
            [0.1, 0.3, 0.2, 0.35],  # line2 left
            [0.5, 0.3, 0.6, 0.35],  # line2 right
        ]
    )
    order, out = sort_boxes(boxes)
    assert order.tolist() == [1, 0, 2, 3]
    assert np.array_equal(out, boxes)


def test_sort_boxes_degenerate_heights():
    boxes = _boxes([[0.1, 0.5, 0.2, 0.5], [0.3, 0.5, 0.4, 0.5]])
    order, _ = sort_boxes(boxes)  # med height 0 -> fallback, no crash
    assert sorted(order.tolist()) == [0, 1]


def test_resolve_lines_groups_rows():
    boxes = _boxes(
        [
            [0.1, 0.1, 0.2, 0.14],
            [0.22, 0.105, 0.32, 0.145],  # same visual row (y-center close)
            [0.1, 0.3, 0.2, 0.34],
        ]
    )
    lines, _ = resolve_lines(boxes)
    assert lines == [[0, 1], [2]]


def test_resolve_lines_paragraph_break_splits_row():
    # same row, horizontal gap 0.3 >> paragraph_break 0.035 -> two sub-lines
    boxes = _boxes(
        [
            [0.05, 0.1, 0.15, 0.14],
            [0.45, 0.1, 0.55, 0.14],
        ]
    )
    lines, _ = resolve_lines(boxes)
    assert lines == [[0], [1]]


def test_resolve_lines_small_gaps_stay_joined():
    boxes = _boxes(
        [
            [0.10, 0.1, 0.15, 0.14],
            [0.16, 0.1, 0.21, 0.14],
            [0.22, 0.1, 0.27, 0.14],
        ]
    )
    lines, _ = resolve_lines(boxes)
    assert lines == [[0, 1, 2]]


def test_resolve_lines_rotated_input_straightened():
    # (N,4,2) rotated polys on an unrotated page -> behaves like straight
    straight = _boxes([[0.1, 0.1, 0.3, 0.15], [0.32, 0.1, 0.5, 0.15]])
    polys = np.stack(
        [
            np.stack(
                [
                    straight[:, [0, 1]],
                    straight[:, [2, 1]],
                    straight[:, [2, 3]],
                    straight[:, [0, 3]],
                ],
                axis=1,
            )
        ]
    )[0]
    lines, out = resolve_lines(polys, shape=(1000, 1000))
    assert lines == [[0, 1]]
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out, straight, atol=1e-6)


def test_resolve_blocks_distance_components():
    lines_boxes = _boxes(
        [
            [0.1, 0.10, 0.5, 0.13],
            [0.1, 0.15, 0.5, 0.18],  # near line 0 -> same block
            [0.1, 0.70, 0.5, 0.73],  # far -> own block
        ]
    )
    blocks = resolve_blocks(lines_boxes, [[0], [1], [2]])
    assert blocks == [[[0], [1]], [[2]]]


def test_build_page_default_single_block():
    boxes = _boxes(
        [
            [0.1, 0.1, 0.2, 0.14],
            [0.21, 0.1, 0.31, 0.14],
            [0.1, 0.3, 0.2, 0.34],
        ]
    )
    built = build_page(boxes, ["hello", "world", "below"], [1.0, 0.9, 0.8])
    assert built.order == [0, 1, 2]
    assert built.line_ids == [0, 0, 1]
    assert built.block_ids == [0, 0, 0]
    assert len(built.export["blocks"]) == 1
    assert page_text(built, ["hello", "world", "below"]) == "hello world\nbelow"


def test_build_page_empty():
    built = build_page(np.zeros((0, 4), np.float32), [], [])
    assert built.order == [] and built.export == {"blocks": []}


def test_build_page_block_resolution():
    boxes = _boxes(
        [
            [0.1, 0.10, 0.4, 0.13],
            [0.1, 0.15, 0.4, 0.18],
            [0.1, 0.80, 0.4, 0.83],
        ]
    )
    built = build_page(
        boxes, ["a", "b", "c"], [1, 1, 1], do_resolve_blocks=True
    )
    assert built.block_ids == [0, 0, 1]
    assert len(built.export["blocks"]) == 2
    # export geometry sane
    g = built.export["blocks"][0]["geometry"]
    assert g[0] <= g[2] and g[1] <= g[3]


def test_builder_full_page_order_roundtrip():
    """Rendered page -> detect -> builder preserves original word order."""
    from doctr_ray.detection import detect_page
    from doctr_ray.media import encode_media_ref, rasterize_synth

    text = " ".join(f"w{i:03d}" for i in range(40))
    page = rasterize_synth(encode_media_ref(text, 480, 360))[0]
    abs_boxes, rel = detect_page(page.image)
    # words by detection order; builder must re-sequence to reading order
    texts = []
    for x0, y0, x1, y1 in abs_boxes:
        for t, gx0, gy0, gx1, gy1 in page.words:
            if (gx0, gy0, gx1, gy1) == (x0, y0, x1, y1):
                texts.append(t)
                break
    assert len(texts) == len(abs_boxes)
    built = build_page(rel[:, :4], texts, [1.0] * len(texts), shape=page.image.shape)
    ordered = [texts[i] for i in built.order]
    assert ordered == [w[0] for w in page.words]


def test_rtl_line_word_order():
    """RTL scripts read right-to-left within a line (ordered_line_words
    analog, io/exporters.py:219-250)."""
    boxes = _boxes(
        [
            [0.1, 0.1, 0.2, 0.14],
            [0.21, 0.1, 0.31, 0.14],
            [0.32, 0.1, 0.42, 0.14],
        ]
    )
    arabic = ["مرحبا", "يا", "عالم"]
    built = build_page(boxes, arabic, [1.0] * 3)
    assert built.order == [2, 1, 0]
    latin = build_page(boxes, ["a", "b", "c"], [1.0] * 3)
    assert latin.order == [0, 1, 2]


def test_median_helper_matches_numpy():
    """_median must stay bit-identical to np.median (builder thresholds
    are discontinuous — a ulp of drift flips line membership)."""
    import numpy as np

    from doctr_ray.builder import _median

    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 4, 9, 10, 57, 100, 101):
        for _ in range(100):
            a = rng.random(n) * rng.choice([1e-3, 1.0, 1e3])
            assert _median(a.copy()) == float(np.median(a))
