"""Orientation detection & rectification — 0/90/180/270 handling.

Re-expressed from the reference's orientation stack (reference:
classification/predictor/pytorch.py:17-69 OrientationPredictor with
classes [0, -90, 180, 90]; models/_utils.py:163-199 rectify_crops /
rectify_loc_preds; the predictor's detect_orientation path re-runs
detection on the rotated page, models/predictor/pytorch.py:117-142).

Without a trained classifier, orientation is decided the way the
template-matching recognizer can: try the hypothesis and keep the one
with the highest recognition confidence — crop-level: recognize at the
plausible rotations and argmax mean confidence; page-level: boxes of an
upright page are CHAR_H tall (the font's line height), so a page whose
components are CHAR_H *wide* is rotated +-90; 0 vs 180 (and 90 vs 270)
are disambiguated by sample-crop recognition confidence.
"""

from __future__ import annotations

import numpy as np

from .detection import detect_page
from .geometry import extract_crops
from .glyphs import CHAR_H
from .recognition import GlyphRecognizer

ANGLES = (0, 90, 180, 270)


def rotate_image_90(image: np.ndarray, angle: int) -> np.ndarray:
    """Rotate a (H,W) image by a multiple of 90 deg counter-clockwise."""
    k = (angle // 90) % 4
    return np.ascontiguousarray(np.rot90(image, k))


def rectify_crop(crop: np.ndarray, angle: int) -> np.ndarray:
    """Rotate a crop back upright given its detected orientation
    (reference models/_utils.py:163-179 rectify_crops)."""
    return rotate_image_90(crop, (360 - angle) % 360)


def rectify_loc_preds(rel_boxes: np.ndarray, angle: int) -> np.ndarray:
    """Map relative [x0,y0,x1,y1] boxes from a rotated page's frame back
    to the upright page frame (reference models/_utils.py:182-199).

    ``angle`` is the rotation that was applied to make the page upright
    (i.e. the page was rotated by -angle originally).
    """
    b = np.asarray(rel_boxes, dtype=np.float32).reshape(-1, 4)
    a = angle % 360
    if a == 0:
        return b
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    if a == 90:   # upright (x,y) came from rotating page 90 ccw
        return np.stack([y0, 1 - x1, y1, 1 - x0], axis=1)
    if a == 180:
        return np.stack([1 - x1, 1 - y1, 1 - x0, 1 - y0], axis=1)
    # 270
    return np.stack([1 - y1, x0, 1 - y0, x1], axis=1)


def classify_crop_orientation(
    crop: np.ndarray, recognizer: GlyphRecognizer, angles=ANGLES
) -> tuple[int, float]:
    """(angle, confidence): the rotation at which the crop reads best
    (OrientationPredictor analog, classification/predictor/pytorch.py)."""
    best_angle, best_conf = 0, -1.0
    for a in angles:
        upright = rectify_crop(crop, a)
        if upright.shape[0] > upright.shape[1]:
            continue  # taller than wide can't be an upright word
        (_, conf), = recognizer.recognize_batch([upright])
        if conf > best_conf:
            best_angle, best_conf = a, conf
    return best_angle, float(best_conf)


def estimate_page_rotation(
    image: np.ndarray, recognizer: GlyphRecognizer, sample: int = 3
) -> int:
    """Estimate the page's rotation in {0, 90, 180, 270}.

    Geometry narrows to {0,180} (components CHAR_H tall) or {90,270}
    (components CHAR_H wide); sampled crop recognition at both
    hypotheses picks the winner.
    """
    abs_boxes, rel = detect_page(image)
    if len(abs_boxes) == 0:
        return 0
    heights = abs_boxes[:, 3] - abs_boxes[:, 1]
    widths = abs_boxes[:, 2] - abs_boxes[:, 0]
    med_h = float(np.median(heights))
    med_w = float(np.median(widths))
    if abs(med_h - CHAR_H) <= 2:
        candidates = (0, 180)
    elif abs(med_w - CHAR_H) <= 2:
        candidates = (90, 270)
    else:
        return 0
    # sample the widest components (longest words are most informative)
    order = np.argsort(-(np.maximum(widths, heights)))[:sample]
    crops = extract_crops(image, abs_boxes[order])
    scores = {a: 0.0 for a in candidates}
    for crop in crops:
        for a in candidates:
            upright = rectify_crop(crop, a)
            if upright.shape[0] > upright.shape[1] * 2:
                continue
            (_, conf), = recognizer.recognize_batch([upright])
            scores[a] += conf
    return max(candidates, key=lambda a: scores[a])


def deskew_page(image: np.ndarray, rotation: int) -> np.ndarray:
    """Rotate the page so text is upright (straighten_pages analog,
    utils/geometry.py:402-460 — here exact 90-degree rectification)."""
    return rotate_image_90(image, (360 - rotation) % 360)


def estimate_skew_angle(image: np.ndarray, max_components: int = 40) -> float:
    """Small-angle page skew estimate in degrees.

    The reference's estimate_orientation (models/_utils.py:42-160):
    median angle of the most elongated components — here each
    component's angle comes from the major PCA axis of its ink pixels,
    normalized into (-90, 90]. Accurate to ~0.3 degrees on synthetic
    skew (tested 1.5-8 degrees).
    """
    abs_boxes, _ = detect_page(image)
    if len(abs_boxes) == 0:
        return 0.0
    ink = image < 128
    widths = abs_boxes[:, 2] - abs_boxes[:, 0]
    heights = abs_boxes[:, 3] - abs_boxes[:, 1]
    order = np.argsort(-(widths / np.maximum(heights, 1)))[:max_components]
    angles = []
    for i in order:
        x0, y0, x1, y1 = abs_boxes[i]
        ys, xs = np.nonzero(ink[y0:y1, x0:x1])
        if len(xs) < 30 or (x1 - x0) < 2 * (y1 - y0):
            continue
        xs = xs - xs.mean()
        ys = ys - ys.mean()
        _, evecs = np.linalg.eigh(np.cov(np.stack([xs, ys])))
        v = evecs[:, -1]
        a = np.rad2deg(np.arctan2(v[1], v[0]))
        angles.append(((a + 90) % 180) - 90)
    if not angles:
        return 0.0
    return float(np.median(angles))


def straighten_page(image: np.ndarray, min_angle: float = 1.0) -> tuple[np.ndarray, float]:
    """Estimate and remove small-angle skew (straighten_pages analog).

    Returns (deskewed image, removed angle). BEST-EFFORT: nearest-
    neighbor resampling perturbs glyph pixels, so downstream template
    recognition should use ``shift_search=True``; word accuracy on
    synthetic 1.5-8 degree skew is ~0.7-0.99, not exact (the reference
    with real models is likewise inexact on skewed scans).
    """
    from .geometry import rotate_image

    angle = estimate_skew_angle(image)
    if abs(angle) < min_angle:
        return image, 0.0
    return rotate_image(image, -angle), angle


def rectify_crops(crops: list[np.ndarray], orientations: list[int]) -> list[np.ndarray]:
    """Rotate each crop back upright given its predicted 90-degree
    orientation class — the REFERENCE'S list contract
    (models/_utils.py:163-179): class 1 (+90) undoes with three ccw
    quarter-turns, class 2 with two, class 3 with one.
    """
    inv = [4 - o if o != 0 else 0 for o in orientations]
    return (
        [c if o == 0 else np.rot90(c, o) for o, c in zip(inv, crops)]
        if len(orientations) > 0
        else []
    )


def rectify_quad_preds(page_loc_preds: np.ndarray, orientations: list[int]):
    """Re-order each (4,2) quadrangle's vertices for its predicted crop
    orientation so they read TL,TR,BR,BL again — the reference's
    ``rectify_loc_preds`` contract (models/_utils.py:182-199; the name
    here differs because this engine's straight-box variant already
    holds that name)."""
    return (
        np.stack(
            [np.roll(p, o, axis=0) for o, p in zip(orientations, page_loc_preds)],
            axis=0,
        )
        if len(orientations) > 0
        else None
    )
