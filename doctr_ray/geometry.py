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


def remap_boxes(
    loc_preds: np.ndarray, orig_shape: tuple[int, int], dest_shape: tuple[int, int]
) -> np.ndarray:
    """Re-express relative (N,4,2) polys for a padded/cropped canvas of
    ``dest_shape`` centered on the ``orig_shape`` one (absolute geometry
    unchanged) — reference: utils/geometry.py:250-274."""
    if len(dest_shape) != 2 or len(orig_shape) != 2:
        raise ValueError("shapes must be (height, width) pairs")
    oh, ow = orig_shape
    dh, dw = dest_shape
    out = loc_preds.copy()
    out[:, :, 0] = (loc_preds[:, :, 0] * ow + (dw - ow) / 2) / dw
    out[:, :, 1] = (loc_preds[:, :, 1] * oh + (dh - oh) / 2) / dh
    return out


def rotate_boxes(
    loc_preds: np.ndarray,
    angle: float,
    orig_shape: tuple[int, int],
    min_angle: float = 1.0,
    target_shape: tuple[int, int] | None = None,
) -> np.ndarray:
    """Rotate relative (N,4) boxes or (N,4,2) polys about the page
    center; optionally remap to a ``target_shape`` canvas afterwards.

    reference: utils/geometry.py:276-330 — exactly its conventions:
    no-op below ``min_angle`` and above ``90 - min_angle``; row-vector
    times [[cos,-sin],[sin,cos]] in the y-down absolute frame (verified
    by the differential test; the previous transposed form rotated the
    OPPOSITE way, so deskew calls doubled the skew).
    """
    polys = loc_preds.copy()
    if polys.ndim == 2:
        polys = np.stack(
            [polys[:, [0, 1]], polys[:, [2, 1]], polys[:, [2, 3]], polys[:, [0, 3]]],
            axis=1,
        )
    if abs(angle) < min_angle or abs(angle) > 90 - min_angle:
        return polys
    theta = angle * np.pi / 180.0
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=polys.dtype,
    )
    h, w = orig_shape
    points = np.stack((polys[:, :, 0] * w, polys[:, :, 1] * h), axis=-1)
    center = (w / 2, h / 2)
    rotated = center + np.matmul(points - center, rot)
    out = np.stack((rotated[:, :, 0] / w, rotated[:, :, 1] / h), axis=-1)
    if target_shape is not None:
        out = remap_boxes(out, orig_shape=orig_shape, dest_shape=target_shape)
    return out


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
    """Slice (N,4) [x0,y0,x1,y1] boxes out of a page image.

    reference: utils/geometry.py:505-531 — integer boxes slice as-is;
    float boxes are treated as RELATIVE coordinates and projected the
    reference's way (scale, round, then +1 on the max indices so the
    rounded edge pixel is included). Zero-area boxes yield empty
    crops — callers filter them (models/predictor/base.py:188-196).
    """
    boxes = np.asarray(abs_boxes)
    if boxes.shape[0] == 0:
        return []
    if not np.issubdtype(boxes.dtype, np.integer):
        h, w = img.shape[:2]
        boxes = boxes.copy()
        boxes[:, [0, 2]] *= w
        boxes[:, [1, 3]] *= h
        boxes = boxes.round().astype(int)
        boxes[:, 2:] += 1
        # the reference materializes contiguous crops for its tensor
        # stack; the engine's integer fast path below keeps zero-copy
        # views (recognition kernels accept strided input)
        return [np.ascontiguousarray(img[y0:y1, x0:x1]) for x0, y0, x1, y1 in boxes]
    return [img[y0:y1, x0:x1] for x0, y0, x1, y1 in boxes]


def rotate_image(image: np.ndarray, angle_deg: float, fill: int = 255) -> np.ndarray:
    """Arbitrary-angle rotation about the page center (nearest-neighbor).

    reference: utils/geometry.py:333-460 rotate_image (cv2 bilinear
    there; NN here — the deterministic stand-in). Same output shape.
    """
    th = np.deg2rad(angle_deg)
    H, W = image.shape[:2]
    yy, xx = np.mgrid[0:H, 0:W]
    cy, cx = (H - 1) / 2, (W - 1) / 2
    xs = np.cos(th) * (xx - cx) + np.sin(th) * (yy - cy) + cx
    ys = -np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy) + cy
    xi = np.round(xs).astype(np.int64)
    yi = np.round(ys).astype(np.int64)
    ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    out = np.full_like(image, fill)
    out[ok.nonzero()] = image[yi[ok], xi[ok]]
    return out


def mask_regions(image: np.ndarray, rel_boxes: np.ndarray, fill: int = 255) -> np.ndarray:
    """Blank out regions (ignore_regions) before detection.

    reference: models/_utils.py:221-258 mask_boxes — fill layout regions
    with a constant so the detector skips them. Returns a copy.
    """
    out = image.copy()
    h, w = image.shape[:2]
    for x0, y0, x1, y1 in rel_to_abs(np.asarray(rel_boxes, dtype=np.float32).reshape(-1, 4), (h, w)):
        out[max(0, y0) : y1, max(0, x0) : x1] = fill
    return out


def resize_aspect_pad(
    image: np.ndarray, target: tuple[int, int], pad_value: int = 255, symmetric: bool = True
) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """Aspect-preserving nearest-neighbor resize with padding.

    reference: transforms/modules/pytorch.py:31-225 Resize
    (preserve_aspect_ratio + symmetric_pad; the reference uses bilinear
    +antialias — nearest-neighbor here, the deterministic stand-in).
    Returns (resized, (top, bottom, left, right) padding).
    """
    th, tw = target
    h, w = image.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    ys = (np.arange(nh) * h / nh).astype(np.int64)
    xs = (np.arange(nw) * w / nw).astype(np.int64)
    resized = image[ys][:, xs]
    pad_v, pad_h = th - nh, tw - nw
    if symmetric:
        top, left = int(np.ceil(pad_v / 2)), int(np.ceil(pad_h / 2))
    else:
        top, left = 0, 0
    bottom, right = pad_v - top, pad_h - left
    out = np.full((th, tw), pad_value, dtype=image.dtype)
    out[top : top + nh, left : left + nw] = resized
    return out, (top, bottom, left, right)


def remove_padding_coords(
    rel_boxes: np.ndarray, target: tuple[int, int], padding: tuple[int, int, int, int]
) -> np.ndarray:
    """Map model-space relative coords back through the resize padding.

    reference: models/detection/_utils/base.py:12-79 _remove_padding.
    """
    th, tw = target
    top, bottom, left, right = padding
    b = np.asarray(rel_boxes, dtype=np.float32).reshape(-1, 4).copy()
    content_w = (tw - left - right) / tw
    content_h = (th - top - bottom) / th
    b[:, [0, 2]] = np.clip((b[:, [0, 2]] - left / tw) / content_w, 0, 1)
    b[:, [1, 3]] = np.clip((b[:, [1, 3]] - top / th) / content_h, 0, 1)
    return b


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


def resize_bilinear(image: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Bilinear resize with half-pixel-center sampling (the semantics of
    torch's ``interpolate(mode='bilinear', align_corners=False)`` /
    cv2.INTER_LINEAR — reference transforms/modules/pytorch.py:31-225
    Resize). Pure numpy, fully vectorized; float32 accumulation,
    round-half-away like uint8 casts in the reference stack.

    The EXACT extraction path keeps nearest-neighbor
    (:func:`resize_aspect_pad`) — template matching needs unresampled
    glyphs; this exists for preprocessing parity and the multimodal
    resize stage.
    """
    th, tw = target
    h, w = image.shape[:2]
    if (th, tw) == (h, w):
        return image.copy()
    # source coordinates of each target pixel center
    ys = (np.arange(th, dtype=np.float64) + 0.5) * (h / th) - 0.5
    xs = (np.arange(tw, dtype=np.float64) + 0.5) * (w / tw) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    img = image.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(image.dtype, np.integer):
        return np.clip(np.round(out), 0, 255).astype(image.dtype)
    return out.astype(image.dtype)


def resize_bilinear_aspect_pad(
    image: np.ndarray, target: tuple[int, int], pad_value: int = 255, symmetric: bool = True
) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """Aspect-preserving bilinear resize with padding — the reference's
    Resize(preserve_aspect_ratio=True, symmetric_pad=True) contract
    (transforms/modules/pytorch.py:31-225) with a real bilinear kernel;
    same return shape as :func:`resize_aspect_pad`."""
    th, tw = target
    h, w = image.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    resized = resize_bilinear(image, (nh, nw))
    pad_v, pad_h = th - nh, tw - nw
    if symmetric:
        top, left = int(np.ceil(pad_v / 2)), int(np.ceil(pad_h / 2))
    else:
        top, left = 0, 0
    bottom, right = pad_v - top, pad_h - left
    out = np.full((th, tw), pad_value, dtype=image.dtype)
    out[top : top + nh, left : left + nw] = resized
    return out, (top, bottom, left, right)
