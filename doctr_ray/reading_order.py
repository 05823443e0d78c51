"""Reading order — column-aware linearization of page elements.

Re-expressed semantics of the reference's reading-order module
(reference: models/reading_order/base.py): text direction from unicode
bidi classes (:83-120), multi-column detection via low-crossing
vertical splits and a reads-before traversal (:180-280), and the
``sort_reading_order`` entry point (:382-457). The column logic here is
the classic recursive XY-cut (find a vertical gap no element crosses ->
read left block fully before right; else split on a horizontal gap;
else fall back to the builder's reading sort key) — the same
column-first semantics as the reference's topological traversal,
deterministic and pure-numpy.

Plugged into the builder stage as ``keep_reading_order=True``
(reference: models/builder.py:659-689 _apply_reading_order).
"""

from __future__ import annotations

import unicodedata

import numpy as np

# minimum relative gap for a cut (noise guard)
MIN_GAP = 0.01
# RTL scripts' bidi classes (reference base.py:105-120)
_RTL_CLASSES = {"R", "AL"}


def detect_text_direction(texts: list[str]) -> str:
    """'ltr' | 'rtl' from unicode bidirectional classes of the chars.

    reference: models/reading_order/base.py:83-120 (strong R/AL vs L
    counts over the page text).
    """
    rtl = ltr = 0
    for t in texts:
        for ch in t:
            c = unicodedata.bidirectional(ch)
            if c in _RTL_CLASSES:
                rtl += 1
            elif c == "L":
                ltr += 1
    return "rtl" if rtl > ltr else "ltr"


def _sort_key_order(boxes: np.ndarray) -> list[int]:
    """Builder fallback sort (x + 2*ymax/med_h), reference builder.py:105."""
    med = float(np.median(boxes[:, 3] - boxes[:, 1]))
    if not np.isfinite(med) or med <= 0:
        med = 1.0
    return np.argsort(boxes[:, 0] + 2 * boxes[:, 3] / med, kind="stable").tolist()


def _find_cut(lo: np.ndarray, hi: np.ndarray, min_gap: float) -> float | None:
    """Largest gap in [min(lo), max(hi)] crossed by no interval, or None."""
    order = np.argsort(lo, kind="stable")
    best_gap, best_pos = 0.0, None
    reach = -np.inf
    for i in order:
        if reach > -np.inf and lo[i] - reach >= min_gap and lo[i] - reach > best_gap:
            best_gap = float(lo[i] - reach)
            best_pos = float((reach + lo[i]) / 2)
        reach = max(reach, float(hi[i]))
    return best_pos


def xy_cut_order(boxes: np.ndarray, rtl: bool = False, _depth: int = 0) -> list[int]:
    """Recursive XY-cut reading order of (N,4) relative boxes.

    Vertical cuts first (columns: read one column fully before the
    next; right-to-left for rtl), then horizontal cuts (bands top to
    bottom), then the builder sort key within an uncuttable block.
    """
    n = len(boxes)
    if n <= 1:
        return list(range(n))
    idx = np.arange(n)
    if _depth < 16:
        # vertical cut -> columns
        cut = _find_cut(boxes[:, 0], boxes[:, 2], MIN_GAP)
        if cut is not None:
            left = idx[boxes[:, 0] < cut]
            right = idx[boxes[:, 0] >= cut]
            if len(left) and len(right):
                first, second = (right, left) if rtl else (left, right)
                return [int(first[i]) for i in xy_cut_order(boxes[first], rtl, _depth + 1)] + [
                    int(second[i]) for i in xy_cut_order(boxes[second], rtl, _depth + 1)
                ]
        # horizontal cut -> bands
        hcut = _find_cut(boxes[:, 1], boxes[:, 3], MIN_GAP)
        if hcut is not None:
            top = idx[boxes[:, 1] < hcut]
            bot = idx[boxes[:, 1] >= hcut]
            if len(top) and len(bot):
                return [int(top[i]) for i in xy_cut_order(boxes[top], rtl, _depth + 1)] + [
                    int(bot[i]) for i in xy_cut_order(boxes[bot], rtl, _depth + 1)
                ]
    return _sort_key_order(boxes)


def sort_reading_order(
    boxes: np.ndarray, texts: list[str] | None = None, direction: str | None = None
) -> list[int]:
    """Reading-ordered indices of (N,4) relative element boxes.

    Direction is auto-detected from ``texts`` when not given
    (reference: base.py:382-457).
    """
    if len(boxes) == 0:
        return []
    if direction is None:
        direction = detect_text_direction(texts or [])
    return xy_cut_order(np.asarray(boxes, dtype=np.float64), rtl=(direction == "rtl"))


def resolve_reading_segments(
    boxes: np.ndarray, order: list[int], gap_factor: float = 0.8
) -> list[list[int]]:
    """Group consecutive ordered elements into paragraph segments:
    same column (x-overlap) and vertical gap <= gap_factor * median
    height (reference: base.py:460-531)."""
    if not order:
        return []
    heights = boxes[:, 3] - boxes[:, 1]
    med_h = float(np.median(heights)) or 1.0
    segments: list[list[int]] = [[order[0]]]
    for prev, cur in zip(order, order[1:]):
        pb, cb = boxes[prev], boxes[cur]
        x_overlap = min(pb[2], cb[2]) - max(pb[0], cb[0])
        v_gap = cb[1] - pb[3]
        if x_overlap > 0 and -med_h <= v_gap <= gap_factor * med_h:
            segments[-1].append(cur)
        else:
            segments.append([cur])
    return segments
