"""Exact skew recovery — inverse reconstruction of NN-rotated pages.

The reference handles rotated/skewed pages with a rotated-geometry
path: (4, 2) polygon detection, ``extract_rcrops`` perspective crops
(reference utils/geometry.py:534-648) and ``preserve_original_coords``
(models/predictor/base.py:236-308) mapping output geometry back into
the original frame through the inverse transform ``m_inv``. With real
scans that path is inherently approximate (resampling); this engine's
synthetic scans are produced by a KNOWN deterministic nearest-neighbor
rotation (geometry.rotate_image), which makes an EXACT inverse
possible:

- every output pixel of the skewed page carries the value of exactly
  one pristine pixel (``round`` of the rotated coordinate) — so
  scattering the observed values back through the same map
  reconstructs the pristine page wherever the map sampled it
  (:func:`reconstruct_upright`), with a boolean mask for the few
  percent of pristine pixels the NN map never visited;
- detection runs on the reconstruction unchanged: glyph border rings
  are 2 px thick at the default scale, so isolated unsampled pixels
  can neither disconnect a component nor shrink its tight box;
- recognition scores templates on KNOWN pixels only
  (GlyphRecognizer ``masks=``) — an exact match on every sampled pixel
  identifies the glyph with certainty (glyph interiors differ in many
  pixels, far above the unsampled density);
- the page angle is recovered by trying the decidegree candidates
  around the PCA estimate and keeping the one whose sampled words
  match templates exactly (the renderer quantizes skew to decidegrees;
  a wrong candidate scrambles the reconstruction and fails validation).

``m_inv`` analog: :func:`pristine_box_to_skewed_poly` maps upright
boxes back into the original (skewed) frame as (4, 2) polygons — the
``preserve_original_coords`` surface.
"""

from __future__ import annotations

import numpy as np

from .detection import detect_page
from .geometry import extract_crops
from .orientation import estimate_skew_angle
from .recognition import GlyphRecognizer


def forward_maps(shape: tuple[int, int], angle_deg: float):
    """The sampling grid of ``geometry.rotate_image``: for every output
    pixel (y, x) of the rotated page, the pristine pixel (yi, xi) whose
    value it carries, plus the in-bounds mask."""
    th = np.deg2rad(angle_deg)
    H, W = shape[:2]
    yy, xx = np.mgrid[0:H, 0:W]
    cy, cx = (H - 1) / 2, (W - 1) / 2
    xs = np.cos(th) * (xx - cx) + np.sin(th) * (yy - cy) + cx
    ys = -np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy) + cy
    xi = np.round(xs).astype(np.int64)
    yi = np.round(ys).astype(np.int64)
    ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    return yi, xi, ok


def reconstruct_upright(image: np.ndarray, angle_deg: float) -> tuple[np.ndarray, np.ndarray]:
    """Skewed page -> (pristine reconstruction, known mask).

    Scatters each observed pixel back to the pristine position the NN
    rotation sampled it from. Unvisited pristine pixels are background
    (255) with ``known=False``."""
    yi, xi, ok = forward_maps(image.shape, angle_deg)
    pristine = np.full_like(image, 255)
    known = np.zeros(image.shape[:2], dtype=bool)
    pristine[yi[ok], xi[ok]] = image[ok]
    known[yi[ok], xi[ok]] = True
    return pristine, known


def _validate(
    pristine: np.ndarray, known: np.ndarray, recognizer: GlyphRecognizer
) -> bool:
    """True iff EVERY detected word matches a template EXACTLY on its
    known pixels (conf == 1.0) — the angle-candidate test. All words,
    not a sample: a near-zero wrong angle reconstructs the page center
    exactly and only garbles the periphery."""
    from .glyphs import CHAR_H

    abs_boxes, _ = detect_page(pristine)
    if len(abs_boxes) == 0:
        return False
    # validate on text-line components only (artefacts/tables are not
    # template-matchable and would veto a correct angle)
    heights = abs_boxes[:, 3] - abs_boxes[:, 1]
    abs_boxes = abs_boxes[np.abs(heights - CHAR_H) <= 2]
    if len(abs_boxes) == 0:
        return False
    crops = extract_crops(pristine, abs_boxes)
    masks = extract_crops(known, abs_boxes)
    preds = recognizer.recognize_batch(crops, masks=masks)
    return all(conf >= 1.0 for _, conf in preds)


def recover_skewed_page(
    image: np.ndarray, recognizer: GlyphRecognizer
) -> tuple[np.ndarray, np.ndarray | None, float]:
    """-> (upright page, known mask or None, removed angle).

    Tries the decidegree candidates nearest the PCA estimate (dd=0 =
    validate the page unchanged); the first whose reconstruction
    validates wins. If the estimator abstains (no elongated component)
    the finite decidegree grid is brute-scanned nearest-first. Falls
    back to the nearest candidate's reconstruction (best effort) if
    nothing validates."""
    est = estimate_skew_angle(image)
    base = int(round(est * 10))
    tried: set[int] = set()
    fallback: tuple[np.ndarray, np.ndarray, float] | None = None
    no_text_at_zero = False

    def _try(dd: int):
        tried.add(dd)
        if dd == 0:
            # validate the original as-is before touching a pixel
            from .glyphs import CHAR_H

            boxes, _ = detect_page(image)
            if len(boxes) == 0:
                # no ink at all: no reconstruction can create text —
                # the unchanged page is exact at any angle
                return image, None, 0.0
            if not (np.abs((boxes[:, 3] - boxes[:, 1]) - CHAR_H) <= 2).any():
                # components exist but none at text-line height. This is
                # EITHER an artefact-only page (leave unchanged) OR a
                # skewed page whose every box is tilted past the height
                # tolerance — only a later candidate can tell them
                # apart, so record the unchanged page as a fallback and
                # keep scanning (a false "success" here is the bug the
                # skew property test caught: the brute scan reaches
                # dd=0 before a far-from-estimate true angle).
                nonlocal no_text_at_zero
                no_text_at_zero = True
                return None
            ones = np.ones(image.shape[:2], dtype=bool)
            if _validate(image, ones, recognizer):
                return image, None, 0.0
            return None
        nonlocal fallback
        pristine, known = reconstruct_upright(image, dd / 10.0)
        if _validate(pristine, known, recognizer):
            return pristine, known, dd / 10.0
        if fallback is None:
            fallback = (pristine, known, dd / 10.0)
        return None

    # PCA estimate error grows with angle (observed up to ~0.45 deg);
    # a window around the estimate covers it — wrong candidates are
    # rejected by validation, the correct one usually sits in the
    # first two tries. The estimate is 0 for an upright page, so dd=0
    # (validate-unchanged) is always an early candidate.
    for delta in (0, 1, -1, 2, -2, 3, -3, 4, -4, 5, -5, 6, -6):
        got = _try(base + delta)
        if got is not None:
            return got
    # One-step refinement before the brute scan: the PCA estimate can
    # land at ~half the true angle on adversarial corpora (observed:
    # -4.1 for a true -8.4 on repeated-glyph words). Reconstructing at
    # the wrong estimate leaves the RESIDUAL rotation in the page, and
    # the estimator measures that residual fine — est + residual lands
    # within ~1 decidegree of truth, turning an ~85-candidate brute
    # scan into one more ±6 window.
    if base != 0:
        pristine, _ = reconstruct_upright(image, base / 10.0)
        base2 = base + int(round(estimate_skew_angle(pristine) * 10))
        for delta in (0, 1, -1, 2, -2, 3, -3, 4, -4, 5, -5, 6, -6):
            dd = base2 + delta
            if dd in tried:
                continue
            got = _try(dd)
            if got is not None:
                return got
    # Estimator abstention: a page whose words are all single glyphs
    # has no elongated component to measure (PCA samples w >= 2h), so
    # est comes back ~0 on a genuinely skewed page. The renderer's
    # angle grid is finite — brute-scan it nearest-first; only the true
    # angle can reproduce every glyph exactly on its sampled pixels.
    for dd in sorted(range(-90, 91), key=lambda v: (abs(v - base), v)):
        if dd in tried:
            continue
        got = _try(dd)
        if got is not None:
            return got
    if no_text_at_zero or fallback is None:
        # nothing validated anywhere: an artefact-only / empty page is
        # exact unchanged; otherwise best-effort nearest reconstruction
        return image, None, 0.0
    return fallback


def pristine_box_to_skewed_poly(
    box, shape: tuple[int, int], angle_deg: float
) -> np.ndarray:
    """Upright-frame [x0, y0, x1, y1] pixel box -> (4, 2) polygon in the
    original skewed frame (TL, TR, BR, BL), relative coordinates.

    The ``preserve_original_coords`` / ``m_inv`` analog (reference
    models/predictor/base.py:236-308): output geometry expressed in the
    ORIGINAL input frame rather than the rectified one."""
    H, W = shape[:2]
    cy, cx = (H - 1) / 2, (W - 1) / 2
    th = np.deg2rad(angle_deg)
    x0, y0, x1, y1 = [float(v) for v in box]
    corners = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)
    # inverse of the sampling map: pristine (xi, yi) -> output (x, y)
    dx = corners[:, 0] - cx
    dy = corners[:, 1] - cy
    out_x = np.cos(th) * dx - np.sin(th) * dy + cx
    out_y = np.sin(th) * dx + np.cos(th) * dy + cy
    return np.stack([out_x / W, out_y / H], axis=1)


def skewed_poly_to_pristine_box(
    poly: np.ndarray, shape: tuple[int, int], angle_deg: float
) -> np.ndarray:
    """(4, 2) relative polygon in the skewed frame -> upright-frame
    [x0, y0, x1, y1] pixel box (the forward rectification)."""
    H, W = shape[:2]
    cy, cx = (H - 1) / 2, (W - 1) / 2
    th = np.deg2rad(angle_deg)
    p = np.asarray(poly, dtype=np.float64) * np.array([W, H])
    dx = p[:, 0] - cx
    dy = p[:, 1] - cy
    xs = np.cos(th) * dx + np.sin(th) * dy + cx
    ys = -np.sin(th) * dx + np.cos(th) * dy + cy
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()])


def extract_rcrops(
    img: np.ndarray, polys: np.ndarray, fill: int = 255
) -> list[np.ndarray]:
    """Upright crops from (4, 2) relative polygons by inverse-mapping
    each target pixel through the polygon's own frame — the
    ``extract_rcrops`` analog (reference utils/geometry.py:534-648).

    Generic best-effort resampler (NN): used for arbitrary rotated
    boxes; the exact skew pipeline uses :func:`reconstruct_upright`
    instead (inverse of the known renderer map, no second resample).
    """
    H, W = img.shape[:2]
    out: list[np.ndarray] = []
    for poly in np.asarray(polys, dtype=np.float64).reshape(-1, 4, 2):
        p = poly * np.array([W, H])
        tl, tr, br, bl = p
        w = int(round(max(np.linalg.norm(tr - tl), np.linalg.norm(br - bl))))
        h = int(round(max(np.linalg.norm(bl - tl), np.linalg.norm(br - tr))))
        if w <= 0 or h <= 0:
            out.append(np.full((0, 0), fill, dtype=img.dtype))
            continue
        u = (tr - tl) / max(w, 1)
        v = (bl - tl) / max(h, 1)
        jj, ii = np.mgrid[0:h, 0:w]
        src = tl[None, None, :] + ii[..., None] * u[None, None, :] + jj[..., None] * v[None, None, :]
        xi = np.round(src[..., 0]).astype(np.int64)
        yi = np.round(src[..., 1]).astype(np.int64)
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        crop = np.full((h, w), fill, dtype=img.dtype)
        crop[ok] = img[yi[ok], xi[ok]]
        out.append(crop)
    return out
