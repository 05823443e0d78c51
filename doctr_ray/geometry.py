"""Geometry kernels — pure numpy, vectorized.

Re-expressed semantics of the reference's geometry utilities
(reference: doctr/utils/geometry.py), restricted to what the extraction
pipeline needs. All page-relative coordinates are in [0, 1]
(io/elements.py:84-86); straight boxes are ``[xmin, ymin, xmax, ymax]``,
rotated geometries are ``(4, 2)`` polygons ordered TL, TR, BR, BL
(utils/geometry.py:58-105).
"""

from __future__ import annotations

import numpy as np


def resolve_enclosing_bbox(boxes: np.ndarray) -> np.ndarray:
    """Enclosing [xmin,ymin,xmax,ymax] of (N,4) boxes.

    reference: utils/geometry.py:128-145 (words->line, lines->block).
    """
    b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    return np.array(
        [b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max()], dtype=b.dtype
    )


def estimate_page_angle(polys: np.ndarray) -> float:
    """Mean skew angle (degrees) of (N,4,2) abs polygons from their top edges.

    reference: utils/geometry.py:463-477 (median of atan2 over TL->TR edges).
    """
    if len(polys) == 0:
        return 0.0
    xleft = polys[:, 0, 0] + (polys[:, 3, 0] - polys[:, 0, 0]) / 2
    yleft = polys[:, 0, 1] + (polys[:, 3, 1] - polys[:, 0, 1]) / 2
    xright = polys[:, 1, 0] + (polys[:, 2, 0] - polys[:, 1, 0]) / 2
    yright = polys[:, 1, 1] + (polys[:, 2, 1] - polys[:, 1, 1]) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (yleft - yright) / (xright - xleft)
    t = t[np.isfinite(t)]
    if t.size == 0:
        return 0.0
    return float(np.median(np.rad2deg(np.arctan(t))))


def rotate_boxes(
    loc_preds: np.ndarray,
    angle: float,
    orig_shape: tuple[int, int],
    min_angle: float = 1.0,
) -> np.ndarray:
    """Rotate relative (N,4) boxes or (N,4,2) polys about the page center.

    reference: utils/geometry.py:209-260 — no-op below ``min_angle``;
    aspect-ratio-corrected rotation in relative space.
    """
    if abs(angle) < min_angle:
        if loc_preds.ndim == 2:
            out = np.stack(
                [
                    loc_preds[:, [0, 1]],
                    loc_preds[:, [2, 1]],
                    loc_preds[:, [2, 3]],
                    loc_preds[:, [0, 3]],
                ],
                axis=1,
            )
            return out.astype(loc_preds.dtype)
        return loc_preds
    if loc_preds.ndim == 2:
        polys = np.stack(
            [
                loc_preds[:, [0, 1]],
                loc_preds[:, [2, 1]],
                loc_preds[:, [2, 3]],
                loc_preds[:, [0, 3]],
            ],
            axis=1,
        )
    else:
        polys = loc_preds
    theta = np.deg2rad(angle)
    h, w = orig_shape
    centered = polys - 0.5
    # to an isotropic space, rotate, back
    centered[:, :, 0] *= w
    centered[:, :, 1] *= h
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=centered.dtype,
    )
    rotated = centered @ rot.T
    rotated[:, :, 0] /= w
    rotated[:, :, 1] /= h
    return (rotated + 0.5).astype(polys.dtype)


def rel_to_abs(boxes: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """(N,4) relative -> absolute int pixel boxes, ends exclusive.

    reference: utils/geometry.py:505-517 (the rounding inside extract_crops).
    """
    h, w = shape
    out = np.empty_like(boxes)
    out[:, [0, 2]] = boxes[:, [0, 2]] * w
    out[:, [1, 3]] = boxes[:, [1, 3]] * h
    return np.round(out).astype(np.int32)


def extract_crops(img: np.ndarray, abs_boxes: np.ndarray) -> list[np.ndarray]:
    """Slice (N,4) absolute [x0,y0,x1,y1] boxes out of a page image.

    reference: utils/geometry.py:505-531. Zero-area boxes yield empty
    crops — callers filter them (models/predictor/base.py:188-196).
    """
    return [img[y0:y1, x0:x1] for x0, y0, x1, y1 in abs_boxes]


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (N,4) x (M,4) straight boxes.

    reference: utils/metrics.py:126-152.
    """
    a = a.reshape(-1, 4)
    b = b.reshape(-1, 4)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou
