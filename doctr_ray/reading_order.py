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


def xy_cut_order(
    boxes: np.ndarray, rtl: bool = False, _depth: int = 0, prefer: str = "vertical"
) -> list[int]:
    """Recursive XY-cut reading order of (N,4) relative boxes.

    By default vertical cuts first (columns: read one column fully
    before the next; right-to-left for rtl), then horizontal cuts
    (bands top to bottom), then the builder sort key within an
    uncuttable block. ``prefer='horizontal'`` tries band cuts first —
    used by the canonical ttb frame where "lines" are the outer axis.
    """
    n = len(boxes)
    if n <= 1:
        return list(range(n))
    idx = np.arange(n)

    def v_cut():
        cut = _find_cut(boxes[:, 0], boxes[:, 2], MIN_GAP)
        if cut is not None:
            left = idx[boxes[:, 0] < cut]
            right = idx[boxes[:, 0] >= cut]
            if len(left) and len(right):
                first, second = (right, left) if rtl else (left, right)
                return [
                    int(first[i]) for i in xy_cut_order(boxes[first], rtl, _depth + 1, prefer)
                ] + [
                    int(second[i]) for i in xy_cut_order(boxes[second], rtl, _depth + 1, prefer)
                ]
        return None

    def h_cut():
        hcut = _find_cut(boxes[:, 1], boxes[:, 3], MIN_GAP)
        if hcut is not None:
            top = idx[boxes[:, 1] < hcut]
            bot = idx[boxes[:, 1] >= hcut]
            if len(top) and len(bot):
                return [
                    int(top[i]) for i in xy_cut_order(boxes[top], rtl, _depth + 1, prefer)
                ] + [
                    int(bot[i]) for i in xy_cut_order(boxes[bot], rtl, _depth + 1, prefer)
                ]
        return None

    if _depth < 16:
        cuts = (v_cut, h_cut) if prefer == "vertical" else (h_cut, v_cut)
        for c in cuts:
            result = c()
            if result is not None:
                return result
    return _sort_key_order(boxes)


def _to_canonical_ltr(boxes: np.ndarray, direction: str) -> np.ndarray:
    """Map boxes into the canonical ltr frame so one ordering algorithm
    serves every direction (reference: base.py:138-155 _to_canonical_ltr).

    'rtl' mirrors x; 'ttb' (vertical, columns read right-to-left) swaps
    axes and mirrors the new x.
    """
    b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    if direction == "rtl":
        return np.stack([1 - b[:, 2], b[:, 1], 1 - b[:, 0], b[:, 3]], axis=1)
    if direction == "ttb":
        # within-column flow (y) becomes within-line flow (x'); columns
        # read right-to-left, so the rightmost column maps to the top
        # line: x' = y, y' = 1 - x
        return np.stack([b[:, 1], 1 - b[:, 2], b[:, 3], 1 - b[:, 0]], axis=1)
    return b


def sort_reading_order(
    boxes: np.ndarray, texts: list[str] | None = None, direction: str | None = None
) -> list[int]:
    """Reading-ordered indices of (N,4) relative element boxes.

    Direction is auto-detected from ``texts`` when not given
    (reference: base.py:382-457). 'ltr' | 'rtl' | 'ttb' supported; rtl
    and ttb are handled by canonicalizing boxes into the ltr frame
    (base.py:138-155).
    """
    if len(boxes) == 0:
        return []
    if direction is None:
        direction = detect_text_direction(texts or [])
    if direction == "rtl":
        return xy_cut_order(np.asarray(boxes, dtype=np.float64), rtl=True)
    if direction == "ttb":
        return xy_cut_order(_to_canonical_ltr(boxes, "ttb"), rtl=False, prefer="horizontal")
    return xy_cut_order(np.asarray(boxes, dtype=np.float64), rtl=False)


# layout-label ordering groups (reference base.py:382-457: header first,
# body + floats, footnotes, footer last)
_HEADER_LABELS = {"Page-header", "Title"}
_FOOTER_LABELS = {"Page-footer"}
_FOOTNOTE_LABELS = {"Footnote"}
_FLOAT_LABELS = {"Picture", "Table", "Formula"}
CAPTION_LABEL = "Caption"
CAPTION_MAX_DIST = 0.1  # y_gap + 2*x_gap threshold (base.py:283-315)


def _caption_distance(cap: np.ndarray, flt: np.ndarray) -> float:
    """Distance used to attach a caption to its float
    (reference base.py:283-315: vertical gap + 2x horizontal gap)."""
    y_gap = max(flt[1] - cap[3], cap[1] - flt[3], 0.0)
    x_gap = max(flt[0] - cap[2], cap[0] - flt[2], 0.0)
    return float(y_gap + 2.0 * x_gap)


def sort_with_labels(
    boxes: np.ndarray,
    labels: list[str],
    texts: list[str] | None = None,
    direction: str | None = None,
) -> list[int]:
    """Label-aware reading order: headers first, body + floats in
    column order with captions attached to their float, footnotes,
    then footers (reference: base.py:382-457 sort_reading_order with
    label groups + _attach_captions).
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    n = len(boxes)
    if n == 0:
        return []
    if direction is None:
        direction = detect_text_direction(texts or [])
    rtl = direction == "rtl"
    group_of = np.full(n, 1, dtype=np.int64)  # default: body
    for i, lab in enumerate(labels):
        if lab in _HEADER_LABELS:
            group_of[i] = 0
        elif lab in _FOOTNOTE_LABELS:
            group_of[i] = 2
        elif lab in _FOOTER_LABELS:
            group_of[i] = 3
    order: list[int] = []
    for g in (0, 1, 2, 3):
        idx = np.flatnonzero(group_of == g)
        if len(idx) == 0:
            continue
        sub = [int(idx[i]) for i in xy_cut_order(boxes[idx], rtl=rtl)]
        if g == 1:
            sub = _attach_captions(boxes, labels, sub)
        order.extend(sub)
    return order


def _attach_captions(boxes: np.ndarray, labels: list[str], order: list[int]) -> list[int]:
    """Move each caption to immediately follow its nearest float
    (within CAPTION_MAX_DIST); unattached captions keep their slot."""
    captions = [i for i in order if labels[i] == CAPTION_LABEL]
    floats = [i for i in order if labels[i] in _FLOAT_LABELS]
    if not captions or not floats:
        return order
    attach: dict[int, list[int]] = {}
    attached = set()
    for c in captions:
        dists = [(_caption_distance(boxes[c], boxes[f]), f) for f in floats]
        d, f = min(dists)
        if d <= CAPTION_MAX_DIST:
            attach.setdefault(f, []).append(c)
            attached.add(c)
    out: list[int] = []
    for i in order:
        if i in attached:
            continue
        out.append(i)
        for c in attach.get(i, []):
            out.append(c)
    return out


def assign_layout_labels(
    element_boxes: np.ndarray,
    region_boxes: np.ndarray,
    region_labels: list[str],
    min_coverage: float = 0.5,
    default: str = "Text",
) -> list[str]:
    """Assign each element the label of the layout region covering it
    most (argmax area-coverage, threshold 0.5) — reference
    base.py:534-578 / io/exporters.py:71-89. Fully vectorized."""
    e = np.asarray(element_boxes, dtype=np.float64).reshape(-1, 4)
    r = np.asarray(region_boxes, dtype=np.float64).reshape(-1, 4)
    if len(e) == 0:
        return []
    if len(r) == 0:
        return [default] * len(e)
    lt = np.maximum(e[:, None, :2], r[None, :, :2])
    rb = np.minimum(e[:, None, 2:], r[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    areas = np.maximum((e[:, 2] - e[:, 0]) * (e[:, 3] - e[:, 1]), 1e-12)
    coverage = inter / areas[:, None]
    best = coverage.argmax(axis=1)
    out = []
    for i, j in enumerate(best):
        out.append(region_labels[j] if coverage[i, j] >= min_coverage else default)
    return out


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
