"""Recognition kernels.

The merge_strings / merge_multi_strings parametrized cases mirror the
reference's own authoritative fixtures
(reference: tests/common/test_models_recognition_utils.py).
"""

import numpy as np
import pytest

from doctr_ray.glyphs import CHAR_H, CHAR_PITCH, CHAR_SPACE
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.recognition import (
    GlyphRecognizer,
    merge_multi_strings,
    merge_strings,
    split_crop_spans,
)


@pytest.mark.parametrize(
    "a, b, overlap_ratio, merged",
    [
        ("abcX", "Xdef", 0.5, "abcdef"),
        ("abcdX", "Xdef", 0.75, "abcdef"),
        ("abcdeX", "Xdef", 0.9, "abcdef"),
        ("abcdefX", "Xdef", 0.9, "abcdef"),
        ("abccccX", "Xcccccc", 4 / 7, "abcccccccc"),
        ("abc", "", 0.5, "abc"),
        ("", "abc", 0.5, "abc"),
        ("a", "b", 0.5, "ab"),
        ("abcdX", "Xefghi", 0.33, "abcdefghi"),
        ("bcdX", "Xefgh", 0.4, "bcdefgh"),
        ("cdX", "Xefg", 0.5, "cdefg"),
        ("abcdX", "Xbcde", 1.0, "abcde"),
        ("ababX", "Xabde", 0.8, "ababde"),
        ("ababX", "Xabab", 0.8, "ababab"),
        ("abaX", "Xbab", 1.0, "abab"),
        ("cabababX", "Xabababc", 0.5, "cabababababc"),
        ("ababaX", "Xbabab", 1.0, "ababab"),
        ("one_differon", "ferent_letter", 0.5, "one_differont_letter"),
        ("-", "test", 0.9, "-test"),
        ("test", "-", 0.9, "test-"),
    ],
)
def test_merge_strings(a, b, overlap_ratio, merged):
    assert merge_strings(a, b, overlap_ratio) == merged


@pytest.mark.parametrize(
    "seq_list, overlap_ratio, last_overlap_ratio, merged",
    [
        (["abcX", "Xdef"], 0.5, 0.5, "abcdef"),
        (["abcdX", "XdefX", "XefghX", "Xijk"], 0.5, 0.5, "abcdefghijk"),
        (["abcdX", "XdefX", "XefghiX", "Xaijk"], 0.5, 0.8, "abcdefghijk"),
        (["aaaa", "aaab", "aabc"], 0.8, 0.3, "aaaabc"),
        ([], 0.5, 0.4, ""),
    ],
)
def test_merge_multi_strings(seq_list, overlap_ratio, last_overlap_ratio, merged):
    assert merge_multi_strings(seq_list, overlap_ratio, last_overlap_ratio) == merged


def test_split_crop_spans_no_split():
    # aspect ratio <= 8 -> single span
    spans, ov, last = split_crop_spans(8 * CHAR_H, CHAR_H)
    assert spans == [(0, 8 * CHAR_H)] and ov == 0.0 and last == 0.0


def test_split_crop_spans_wide():
    n = 30
    width = n * CHAR_PITCH - CHAR_SPACE
    spans, ov, last = split_crop_spans(width, CHAR_H)
    assert len(spans) > 1
    assert spans[0][0] == 0 and spans[-1][1] == width
    for x0, x1 in spans:
        assert x0 % CHAR_PITCH == 0  # pitch-aligned
    assert 0 < ov < 1


def test_recognize_rendered_words():
    rec = GlyphRecognizer()
    words = ["alpha", "beta", "x1", "mixed42", "a"]
    from doctr_ray.glyphs import render_word

    crops = [(1 - render_word(w)) * 255 for w in words]
    preds = rec.recognize_batch([c.astype(np.uint8) for c in crops])
    assert [t for t, _ in preds] == words
    assert all(c == pytest.approx(1.0) for _, c in preds)


def test_recognize_long_word_with_split_merge_roundtrip():
    """Wide-crop split + Hamming merge reconstructs the exact word."""
    rec = GlyphRecognizer()
    word = "abcdefghijklmnopqrstuvwxyz0123456789"
    from doctr_ray.glyphs import render_word

    crop = ((1 - render_word(word)) * 255).astype(np.uint8)
    h, w = crop.shape
    spans, ov, last = split_crop_spans(w, h)
    assert len(spans) > 1
    parts = [crop[:, x0:x1] for x0, x1 in spans]
    preds = rec.recognize_batch(parts)
    merged = merge_multi_strings([t for t, _ in preds], ov, last)
    assert merged == word


def test_recognize_repeated_chars_split():
    rec = GlyphRecognizer()
    word = "aaaaaaaaaaaaaaaaaaaaaaaa"
    from doctr_ray.glyphs import render_word

    crop = ((1 - render_word(word)) * 255).astype(np.uint8)
    spans, ov, last = split_crop_spans(*crop.shape[::-1])
    parts = [crop[:, x0:x1] for x0, x1 in spans]
    preds = rec.recognize_batch(parts)
    merged = merge_multi_strings([t for t, _ in preds], ov, last)
    assert merged == word


def test_recognize_full_roundtrip_via_detection():
    from doctr_ray.detection import detect_page
    from doctr_ray.geometry import extract_crops

    text = "the quick brown fox jumps over the lazy dog 0123456789"
    page = rasterize_synth(encode_media_ref(text))[0]
    abs_boxes, _ = detect_page(page.image)
    crops = extract_crops(page.image, abs_boxes)
    rec = GlyphRecognizer()
    preds = rec.recognize_batch(crops)
    assert sorted(t for t, _ in preds) == sorted(text.split(" "))
