"""Reading order — column-aware linearization of page elements.

Re-expressed semantics of the reference's reading-order module
(reference: models/reading_order/base.py): text direction from unicode
bidi classes with an ISO-639 fallback hint (:83-126), layout label
normalization/roles (:128-155), page de-skew before ordering
(:318-380 deskew_reading_geometries), the ``sort_reading_order`` entry
point with label groups + caption attachment (:283-457), paragraph
segmentation (:460-531), layout-label assignment (:534-578) and the
``ReadingOrderPredictor`` wrapper (:600-664).

The ordering engine is :func:`topological_order` — the reference's
column-following reads-before topological sort (base.py:180-280,
Breuel 2003), re-expressed in pure numpy with union-find column
components. Differential tests execute the reference module directly
and verify ORDER-IDENTICAL output on random layouts in all four
directions, with and without layout labels
(tests/test_reference_parity.py::test_ref_differential_*). The classic
recursive XY-cut (:func:`xy_cut_order`) remains available standalone;
the two agree on Manhattan layouts.

Plugged into the builder stage as ``keep_reading_order=True``
(reference: models/builder.py:659-689 _apply_reading_order).
"""

from __future__ import annotations

import unicodedata
from collections.abc import Sequence
from typing import Any

import numpy as np

# minimum relative gap for a cut (noise guard)
MIN_GAP = 0.01
# RTL scripts' bidi classes (reference base.py:36)
_RTL_CLASSES = {"R", "AL"}
# ISO 639 codes of predominantly right-to-left languages (public
# knowledge; reference base.py:33 keeps the same fallback set)
RTL_LANGUAGES = {
    "ar", "arc", "ckb", "dv", "fa", "he", "iw", "ks", "ku", "nqo", "ps",
    "sd", "syr", "ug", "ur", "yi",
}
SUPPORTED_DIRECTIONS = ("auto", "ltr", "rtl", "ttb-rtl", "ttb-ltr")


def detect_text_direction(texts: Sequence[str], language: str | None = None) -> str:
    """'ltr' | 'rtl' from unicode bidirectional classes of the chars.

    reference: models/reading_order/base.py:83-126 (strong R/AL vs L
    counts over the page text; ISO-639 language fallback when the
    script is inconclusive).
    """
    rtl = ltr = 0
    for t in texts:
        for ch in t:
            c = unicodedata.bidirectional(ch)
            if c in _RTL_CLASSES:
                rtl += 1
            elif c == "L":
                ltr += 1
    if rtl > ltr:
        return "rtl"
    if ltr == 0 and rtl == 0 and isinstance(language, str):
        if language.split("-")[0].lower() in RTL_LANGUAGES:
            return "rtl"
    return "ltr"


# ------------------------------------------------------- layout labels

def normalize_layout_label(label: str | None) -> str:
    """Canonical snake_case layout label ('' for None) —
    reference base.py:128-137."""
    if label is None:
        return ""
    return str(label).strip().lower().replace("-", "_").replace(" ", "_")


_ROLE_OF = {
    "page_header": "header",
    "page_footer": "footer",
    "footnote": "footnote",
    "caption": "caption",
    "table": "float",
    "picture": "float",
    "figure": "float",
    "formula": "float",
}


def layout_label_role(label: str | None) -> str:
    """Reading-order role of a layout label: header | footer |
    footnote | caption | float | body (reference base.py:139-155)."""
    return _ROLE_OF.get(normalize_layout_label(label), "body")


# ------------------------------------------------------- geometry prep

def _to_boxes(geoms) -> np.ndarray:
    """Any docTR geometry format -> (N, 4) relative straight boxes.

    Accepts ((x0, y0), (x1, y1)) 2-point boxes, 4-point polygons,
    (N, 4) / (N, 2, 2) / (N, 4, 2) arrays, relative or absolute
    coordinates (absolute inputs are normalized by the global extent —
    the ordering only depends on relative gaps)."""
    if isinstance(geoms, np.ndarray) and geoms.size == 0:
        return np.zeros((0, 4), dtype=np.float64)
    if not isinstance(geoms, np.ndarray) and len(geoms) == 0:
        return np.zeros((0, 4), dtype=np.float64)
    arr = np.asarray(geoms, dtype=np.float64)
    if arr.ndim == 3:  # (N, 2, 2) two-point boxes or (N, 4, 2) polygons
        arr = np.concatenate([arr.min(axis=1), arr.max(axis=1)], axis=-1)
    arr = arr.reshape(-1, 4)
    m = float(arr.max()) if arr.size else 0.0
    if m > 1.5:  # absolute pixel coordinates
        arr = arr / m
    return arr


def _order_points(p: np.ndarray) -> np.ndarray:
    """Normalize a 4-point polygon's vertex order to TL, TR, BR, BL
    (y-down frame) so angle estimation is vertex-order independent."""
    s = p.sum(axis=1)
    d = p[:, 1] - p[:, 0]
    return np.stack([p[s.argmin()], p[d.argmin()], p[s.argmax()], p[d.argmax()]])


def deskew_reading_geometries(
    geoms,
    region_geoms=None,
    page_shape: tuple[int, int] | None = None,
    angle_geoms=None,
    min_angle: float = 1.0,
) -> tuple[list[Any], list[Any]]:
    """De-skew rotated 4-point geometries into an upright frame so the
    reading order is computed on an upright page (reference:
    base.py:318-380). Straight inputs pass through unchanged; angles
    below ``min_angle`` or at/above 45 degrees are left alone (corner
    identification is ambiguous past 45 — an upstream orientation
    correction is needed). ``page_shape`` (height, width) corrects the
    aspect-ratio distortion of relative coordinates."""
    from .geometry import estimate_page_angle

    regions = list(region_geoms) if region_geoms is not None else []
    pts = [np.asarray(g, dtype=np.float64).reshape(-1, 2) for g in geoms]
    if len(pts) == 0 or any(p.shape[0] != 4 for p in pts):
        return list(geoms), regions  # straight geometries: nothing to do
    height, width = page_shape if page_shape is not None else (1, 1)
    scale = np.array([width, height], dtype=np.float64)
    ang_src = [np.asarray(g, dtype=np.float64).reshape(-1, 2) for g in (angle_geoms if angle_geoms is not None else [])]
    if len(ang_src) > 0 and all(p.shape[0] == 4 for p in ang_src):
        # detector polygons are already reading-oriented: keep order
        angle = estimate_page_angle(np.stack(ang_src) * scale)
    else:
        angle = estimate_page_angle(np.stack([_order_points(p * scale) for p in pts]))
    if not np.isfinite(angle) or abs(angle) < min_angle or abs(angle) >= 45:
        return list(geoms), regions
    # Undo the skew with the full affine implied by the quads' own edge
    # directions (aggregate top edge -> e1, left edge -> e2). Relative
    # coordinates turn a rigid page rotation into rotation+shear
    # (S^-1 R S with S = diag(w, h)); inverting the edge frame removes
    # both at once, so this is exact with or without ``page_shape``.
    P = np.stack([_order_points(p * scale) for p in pts])
    u = (P[:, 1] - P[:, 0] + P[:, 2] - P[:, 3]).sum(axis=0)
    v = (P[:, 3] - P[:, 0] + P[:, 2] - P[:, 1]).sum(axis=0)
    nu, nv = np.linalg.norm(u), np.linalg.norm(v)
    center = (np.concatenate(pts, axis=0) * scale).mean(axis=0)
    if nu < 1e-9 or nv < 1e-9:
        return list(geoms), regions
    M = np.stack([u / nu, v / nv], axis=1)  # columns: skewed e1, e2
    if abs(np.linalg.det(M)) < 0.1:
        return list(geoms), regions  # degenerate frame: leave untouched
    Minv = np.linalg.inv(M)

    def _rot(points: np.ndarray) -> np.ndarray:
        return ((points * scale - center) @ Minv.T + center) / scale

    def _corners(points: np.ndarray) -> np.ndarray:
        # straight 2-point regions expand to 4 corners before rotating
        # (rotating only the diagonal would underestimate the extent)
        if points.shape[0] == 4:
            return points
        (x0, y0), (x1, y1) = points.min(axis=0), points.max(axis=0)
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])

    out = [_rot(p) for p in pts]
    region_pts = [np.asarray(g, dtype=np.float64).reshape(-1, 2) for g in regions]
    return out, [_rot(_corners(p)) for p in region_pts]


# ---------------------------------------------- topological ordering

def _interval_overlap(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Pairwise 1-D interval overlap, normalized by the shorter interval
    (reference base.py:158-169 _overlap_ratios)."""
    lo32 = lo.astype(np.float32)
    hi32 = hi.astype(np.float32)
    inter = np.minimum(hi32[:, None], hi32[None, :]) - np.maximum(lo32[:, None], lo32[None, :])
    np.clip(inter, 0, None, out=inter)
    span = hi32 - lo32
    shorter = np.minimum(span[:, None], span[None, :])
    return inter / np.clip(shorter, 1e-9, None)


def _total_rank(primary: np.ndarray, secondary: np.ndarray) -> np.ndarray:
    """Rank in the strict total order (primary, secondary, index) —
    a strict order on an axis cannot create 2-cycles in the relation
    matrix (reference base.py:172-177 _strict_rank)."""
    perm = np.lexsort((np.arange(len(primary)), secondary, primary))
    rank = np.empty(len(perm), dtype=np.int64)
    rank[perm] = np.arange(len(perm))
    return rank


def _uf_components(n: int, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Connected-component labels via union-find (plays the role of
    scipy.sparse.csgraph.connected_components in reference base.py:233)."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ii.tolist(), jj.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


def _looks_multi_column(boxes: np.ndarray) -> bool:
    """Gutter test: some vertical line splits the elements into two
    sizeable groups with few crossers (reference base.py:239-250)."""
    n = len(boxes)
    if n < 3:
        return False
    x0, x1 = boxes[:, 0], boxes[:, 2]
    span = float(x1.max() - x0.min()) or 1.0
    allow_crossing = max(1, int(0.05 * n))
    mid = (x0 + x1) / 2
    lo, hi = x0.min() + 0.25 * span, x0.min() + 0.75 * span
    for split in np.unique(x1[(x1 >= lo) & (x1 <= hi)]):
        crossing = int(np.count_nonzero(np.minimum(x1 - split, split - x0) > 0.02 * span))
        n_left = int(np.count_nonzero(mid <= split))
        if crossing <= allow_crossing and n_left >= 0.25 * n and n - n_left >= 0.25 * n:
            return True
    return False


def topological_order(
    boxes: np.ndarray,
    x_overlap_threshold: float = 0.2,
    y_overlap_threshold: float = 0.5,
) -> list[int]:
    """Column-following topological sort of canonical-LTR boxes — the
    reference's ordering engine, re-expressed (reference base.py:180-280
    _topological_order; Breuel 2003 reads-before relations).

    Relations: ``i`` reads before ``j`` when they overlap horizontally
    and ``i`` is above (same column), or when they share a visual row
    without horizontal overlap and ``i`` is left of ``j``. Resolved by
    Kahn's algorithm; among ready elements the traversal prefers (1) on
    multi-column pages, the closest continuation below the last element
    in its column, (2) the rest of the last element's visual row,
    (3) the last element's column component (horizontal-overlap
    connectivity, page-spanning lines excluded so titles don't merge
    columns), then (4) topmost-leftmost.
    """
    n = len(boxes)
    if n <= 1:
        return list(range(n))
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x_ov = _interval_overlap(x0, x1)
    y_ov = _interval_overlap(y0, y1)
    stacked = x_ov > x_overlap_threshold

    xr = _total_rank(x0, x1)
    yr = _total_rank(y0, y1)
    before = (yr[:, None] < yr[None, :]) & stacked
    row_rel = (y_ov > y_overlap_threshold) & ~stacked & (xr[:, None] < xr[None, :])
    before |= row_rel
    np.fill_diagonal(before, False)
    pending = before.sum(axis=0)

    page_w = float(x1.max() - x0.min()) or 1.0
    spanning = (x1 - x0) > 0.5 * page_w
    col_link = np.triu(stacked, 1) & ~spanning[:, None] & ~spanning[None, :]
    comp = _uf_components(n, *np.nonzero(col_link))
    multi_col = _looks_multi_column(boxes)

    emitted = np.zeros(n, dtype=bool)
    order: list[int] = []
    last = -1
    while len(order) < n:
        ready = np.flatnonzero((pending == 0) & ~emitted)
        if ready.size == 0:  # degenerate-geometry cycle safety net
            ready = np.flatnonzero(~emitted)
            cand = ready
        else:
            cand = (
                ready[(x_ov[last, ready] > x_overlap_threshold) & (y0[ready] >= y0[last])]
                if last >= 0 and multi_col
                else np.empty(0, dtype=int)
            )
            if cand.size == 0 and last >= 0:
                cand = ready[y_ov[last, ready] > y_overlap_threshold]
            if cand.size == 0 and last >= 0 and not spanning[last]:
                # continuation broken (gap / fragment): finish the column
                same_col = ready[comp[ready] == comp[last]]
                cand = same_col if same_col.size else ready
            elif cand.size == 0:
                cand = ready
        nxt = int(cand[np.lexsort((x0[cand], y0[cand]))[0]])
        order.append(nxt)
        emitted[nxt] = True
        pending = pending - before[nxt]
        last = nxt
    return order


# ------------------------------------------------------------- XY-cut

def _sort_key_order(boxes: np.ndarray) -> list[int]:
    """Builder fallback sort (x + 2*ymax/med_h), reference builder.py:105."""
    med = float(np.median(boxes[:, 3] - boxes[:, 1]))
    if not np.isfinite(med) or med <= 0:
        med = 1.0
    return np.argsort(boxes[:, 0] + 2 * boxes[:, 3] / med, kind="stable").tolist()


def _find_cut(lo: np.ndarray, hi: np.ndarray, min_gap: float) -> float | None:
    """FIRST gap in [min(lo), max(hi)] crossed by no interval, or None.

    First (topmost/leftmost), not largest: a wide element above two
    columns must be peeled off top-down so the columns underneath
    become one v-cuttable region — cutting at the largest gap first
    would split a column's tail (e.g. a trailing list item) away from
    its column flow (reference fixture: exporters reading-order page).
    """
    order = np.argsort(lo, kind="stable")
    reach = -np.inf
    for i in order:
        if reach > -np.inf and lo[i] - reach >= min_gap:
            return float((reach + lo[i]) / 2)
        reach = max(reach, float(hi[i]))
    return None


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
    serves every direction (reference: base.py:157-178 _to_canonical_ltr).

    'rtl' mirrors x; 'ttb-rtl' (vertical lines, columns right-to-left,
    traditional CJK) swaps axes and mirrors the new y source; 'ttb-ltr'
    (columns left-to-right) swaps axes only.
    """
    b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    if direction == "rtl":
        return np.stack([1 - b[:, 2], b[:, 1], 1 - b[:, 0], b[:, 3]], axis=1)
    if direction in ("ttb", "ttb-rtl"):
        # within-column flow (y) becomes within-line flow (x'); columns
        # read right-to-left, so the rightmost column maps to the top
        # line: x' = y, y' = 1 - x
        return np.stack([b[:, 1], 1 - b[:, 2], b[:, 3], 1 - b[:, 0]], axis=1)
    if direction == "ttb-ltr":
        return np.stack([b[:, 1], b[:, 0], b[:, 3], b[:, 2]], axis=1)
    return b


def _ordered(boxes: np.ndarray, idcs: list[int], prefer: str) -> list[int]:
    # canonical frames make every direction an ltr problem, so ONE
    # engine orders them all: the reference's column-following
    # topological sort (xy_cut_order remains available standalone —
    # the two agree on Manhattan layouts, and the topological engine
    # additionally matches the reference on fragmented / overlapping
    # column fixtures where recursive cuts find no valid split)
    if not idcs:
        return []
    sub = topological_order(boxes[idcs])
    return [idcs[i] for i in sub]


def sort_reading_order(
    geoms,
    texts: Sequence[str] | None = None,
    direction: str | None = None,
    labels: Sequence[str | None] | None = None,
    caption_max_distance: float = 0.1,
    page_shape: tuple[int, int] | None = None,
    angle_geoms=None,
) -> list[int]:
    """Reading-ordered indices of page-element geometries.

    reference: models/reading_order/base.py:382-457. Accepts any docTR
    geometry format (2-point boxes, 4-point polygons, (N,4)/(N,4,2)
    arrays, relative or absolute). Rotated polygons are de-skewed
    before ordering (``page_shape`` corrects relative-coordinate
    aspect distortion). Direction is auto-detected from ``texts`` when
    not given; 'ltr' | 'rtl' | 'ttb-rtl' | 'ttb-ltr' are supported
    ('ttb' is kept as an alias of 'ttb-rtl'). With ``labels``, page
    headers come first, footnotes and page footers last, and captions
    attach to the closest float (before it when sitting above).
    """
    if direction is not None and direction not in SUPPORTED_DIRECTIONS + ("ttb",):
        raise ValueError(
            f"invalid reading direction '{direction}', should be one of {SUPPORTED_DIRECTIONS[1:]}"
        )
    geoms, _ = deskew_reading_geometries(geoms, page_shape=page_shape, angle_geoms=angle_geoms)
    boxes = _to_boxes(geoms)
    n = len(boxes)
    if labels is not None and len(labels) != n:
        raise ValueError(f"Incompatible number of labels ({len(labels)}) and geometries ({n})")
    if n <= 1:
        return list(range(n))
    if direction is None or direction == "auto":
        direction = detect_text_direction(texts or [])
    canonical = _to_canonical_ltr(boxes, direction)
    prefer = "horizontal" if direction in ("ttb", "ttb-rtl", "ttb-ltr") else "vertical"

    if labels is None:
        return _ordered(canonical, list(range(n)), prefer)

    groups: dict[str, list[int]] = {"header": [], "body": [], "caption": [], "footnote": [], "footer": []}
    norm = [normalize_layout_label(lab) for lab in labels]
    for i, lab in enumerate(norm):
        role = layout_label_role(lab)
        groups["body" if role == "float" else role].append(i)
    body = _attach_captions(
        _ordered(canonical, groups["body"], prefer),
        _ordered(canonical, groups["caption"], prefer),
        canonical,
        norm,
        caption_max_distance,
    )
    return (
        _ordered(canonical, groups["header"], prefer)
        + body
        + _ordered(canonical, groups["footnote"], prefer)
        + _ordered(canonical, groups["footer"], prefer)
    )


def sort_with_labels(
    boxes: np.ndarray,
    labels: Sequence[str],
    texts: Sequence[str] | None = None,
    direction: str | None = None,
) -> list[int]:
    """Back-compat wrapper: label-aware :func:`sort_reading_order`."""
    return sort_reading_order(boxes, texts=texts, direction=direction, labels=list(labels))


def _attach_captions(
    order: list[int],
    caption_idcs: list[int],
    boxes: np.ndarray,
    labels: list[str],
    max_distance: float,
) -> list[int]:
    """Insert captions right before (above) / after (below) the closest
    float within reach; unattached captions take their natural spatial
    slot in the body (reference base.py:283-315)."""
    order = list(order)
    float_idcs = [i for i in order if layout_label_role(labels[i]) == "float"]
    for cap in caption_idcs:
        cx0, cy0, cx1, cy1 = boxes[cap]
        best, best_d = -1, float("inf")
        for f in float_idcs:
            fx0, fy0, fx1, fy1 = boxes[f]
            x_gap = max(fx0 - cx1, cx0 - fx1, 0.0)
            y_gap = max(fy0 - cy1, cy0 - fy1, 0.0)
            d = y_gap + 2.0 * x_gap  # captions sit above/below their float
            if d < best_d:
                best, best_d = f, d
        if best >= 0 and best_d <= max_distance:
            pos = order.index(best)
            above = (cy0 + cy1) / 2 <= (boxes[best, 1] + boxes[best, 3]) / 2
            order.insert(pos if above else pos + 1, cap)
        else:
            pos = next((i for i, idx in enumerate(order) if boxes[idx, 1] >= cy0), len(order))
            order.insert(pos, cap)
    return order


def assign_layout_labels(
    element_geoms,
    region_geoms,
    region_labels: Sequence[str],
    min_coverage: float = 0.5,
    default: str | None = None,
) -> list[str | None]:
    """Assign each element the label of the layout region covering it
    most (argmax area-coverage, threshold 0.5; ``default`` — None like
    the reference — when nothing covers it) — reference base.py:534-578.
    Fully vectorized; rotated region polygons are reduced to their
    bounding boxes."""
    e = _to_boxes(element_geoms)
    r = _to_boxes(region_geoms)
    if len(r) != len(region_labels):
        raise ValueError(
            f"Incompatible number of region labels ({len(region_labels)}) and regions ({len(r)})"
        )
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
    return [
        region_labels[j] if coverage[i, j] >= min_coverage else default
        for i, j in enumerate(best)
    ]


def resolve_reading_segments(
    geoms,
    texts: Sequence[str] | None = None,
    direction: str | None = None,
    labels: Sequence[str | None] | None = None,
    x_overlap_threshold: float = 0.2,
    paragraph_gap: float = 0.8,
    page_shape: tuple[int, int] | None = None,
    order: list[int] | None = None,
) -> list[list[int]]:
    """Order elements and group consecutive ones into segments
    (paragraphs/regions). Two consecutive elements merge when they share
    the same (possibly empty) normalized label, the current one is not a
    float, their horizontal overlap (normalized by the narrower element)
    exceeds ``x_overlap_threshold``, and the vertical gap is at most
    ``paragraph_gap`` times the median element height (reference:
    base.py:460-531 — merge criteria matched exactly; verified by the
    differential test executing the reference module)."""
    boxes = _to_boxes(geoms)
    if len(boxes) == 0:
        return []
    if order is None:
        order = sort_reading_order(
            geoms, texts=texts, direction=direction, labels=list(labels) if labels is not None else None,
            page_shape=page_shape,
        )
    canonical = _to_canonical_ltr(
        boxes, direction if direction not in (None, "auto") else "ltr"
    )
    med_h = float(np.median(canonical[:, 3] - canonical[:, 1]))
    norm = [normalize_layout_label(labels[i] if labels is not None else None) for i in range(len(order))]
    segments: list[list[int]] = [[order[0]]]
    for prev, cur in zip(order, order[1:]):
        pb, cb = canonical[prev], canonical[cur]
        x_gap = min(pb[2], cb[2]) - max(pb[0], cb[0])
        x_overlap = x_gap / max(min(pb[2] - pb[0], cb[2] - cb[0]), 1e-9)
        same = (
            norm[prev] == norm[cur]
            and layout_label_role(norm[cur]) != "float"
            and x_overlap > x_overlap_threshold
            and cb[1] - pb[3] <= paragraph_gap * med_h
        )
        if same:
            segments[-1].append(cur)
        else:
            segments.append([cur])
    return segments


class ReadingOrderPredictor:
    """Callable wrapper resolving direction then ordering
    (reference: base.py:600-664)."""

    def __init__(self, direction: str = "auto") -> None:
        if direction not in SUPPORTED_DIRECTIONS:
            raise ValueError(
                f"invalid reading direction '{direction}', should be one of {SUPPORTED_DIRECTIONS}"
            )
        self.direction = direction

    def resolve_direction(
        self, texts: Sequence[str] | None = None, language: str | None = None
    ) -> str:
        if self.direction != "auto":
            return self.direction
        return detect_text_direction(texts if texts is not None else [], language=language)

    def __call__(
        self,
        geoms,
        texts: Sequence[str] | None = None,
        language: str | None = None,
        labels: Sequence[str | None] | None = None,
        page_shape: tuple[int, int] | None = None,
    ) -> list[int]:
        return sort_reading_order(
            geoms,
            direction=self.resolve_direction(texts, language=language),
            labels=list(labels) if labels is not None else None,
            page_shape=page_shape,
        )

    def __repr__(self) -> str:
        return f"ReadingOrderPredictor(direction='{self.direction}')"
