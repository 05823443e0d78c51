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


def test_weights_load_once_per_actor_and_identity_is_noop(tmp_path):
    """Round-2 verdict #7: checkpoint plumbing — weights load ONCE in
    __init__ (never per batch), identity weights leave the pipeline
    output unchanged, and non-identity weights provably flow into the
    predictions."""
    import numpy as np

    import doctr_ray.weights as W
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.pipelines.ocr import OcrDocWorker
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.weights import identity_recognizer_weights, save_weights

    base = GlyphRecognizer()
    k = base.templates.shape[0]
    ckpt = tmp_path / "identity.npz"
    save_weights(str(ckpt), identity_recognizer_weights(k))

    page = rasterize_synth(encode_media_ref("weights load once per actor"))[0]
    crops = [page.image[y0:y1, x0:x1] for (_, x0, y0, x1, y1) in page.words]

    n0 = W.LOAD_COUNT
    rec = GlyphRecognizer(weights=str(ckpt))
    assert W.LOAD_COUNT == n0 + 1  # loaded in __init__
    for _ in range(3):
        got = rec.recognize_batch(crops)
    assert W.LOAD_COUNT == n0 + 1  # NOT re-loaded per batch
    assert got == base.recognize_batch(crops)  # identity == no weights

    # non-identity weights actually flow: bias one template to always win
    skew = identity_recognizer_weights(k)
    skew["template_bias"] = np.full(k, 1e9)
    skew["template_bias"][0] = -1e9
    rec2 = GlyphRecognizer(weights=skew)
    texts = [t for t, _ in rec2.recognize_batch(crops)]
    assert all(set(t) == {base.vocab[0]} for t in texts if t)

    # worker-level: constructor kwarg reaches the recognizer
    w = OcrDocWorker(emit="text", weights=str(ckpt))
    assert w.recognizer.d_scale is not None


def test_weights_object_store_ref(ray_session, tmp_path):
    # broadcast form: ray.put once, actors ray.get zero-copy
    import ray

    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.weights import identity_recognizer_weights

    base = GlyphRecognizer()
    ref = ray.put(identity_recognizer_weights(base.templates.shape[0]))
    rec = GlyphRecognizer(weights=ref)
    assert rec.d_scale is not None and float(rec.d_scale.sum()) == float(
        base.templates.shape[0]
    )
