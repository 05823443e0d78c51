"""DB-style text detection — pure numpy, deterministic.

Mirrors the *shape* of the reference's differentiable-binarization
post-processing contract (reference:
detection/differentiable_binarization/base.py:88-154 — threshold the
probability map, morphological open, connected components via
cv2.findContours, score filter, emit relative (N,5) boxes with an
objectness score; detection/core.py:34-64 box_score;
utils/geometry.py:108-125 detach_scores). Without torch, the
"probability map" here is the page ink mask itself; the morphology is a
binary dilation that merges intra-word glyph gaps but not inter-word
gaps, and components come from a vectorized run-based union-find
(cv2-free connected-component labeling).

Output contract (identical to the reference's single-class path,
models/predictor/pytorch.py:144-150): per page an ``(N, 5)`` float32
array ``[xmin, ymin, xmax, ymax, score]`` in relative [0,1] page
coordinates, plus the absolute pixel boxes (kept so downstream cropping
is exact, avoiding float round-trips).
"""

from __future__ import annotations

import numpy as np

from .glyphs import SCALE

# Dilation radii: intra-word glyph gap is 1*SCALE px (must close: gap <= 2*rx),
# inter-word gap is 4*SCALE px (must stay open: gap > 2*rx).
DILATE_X = 1 * SCALE
DILATE_Y = 1

INK_THRESH = 128       # pixel < 128 is ink (bin_thresh analog, base.py:61)
BOX_THRESH = 0.05      # min mean-ink score to keep a box (box_thresh, base.py:62)
MIN_SIDE = 2           # drop degenerate specks


def binarize(image: np.ndarray) -> np.ndarray:
    """Grayscale (H,W) uint8 -> boolean ink map."""
    return image < INK_THRESH


def dilate(mask: np.ndarray, rx: int = DILATE_X, ry: int = DILATE_Y) -> np.ndarray:
    """Binary dilation with a (2ry+1, 2rx+1) rectangular structuring element.

    Implemented as shifted ORs (separable): fills gaps of width <= 2r.
    """
    out = mask.copy()
    for s in range(1, rx + 1):
        out[:, s:] |= mask[:, :-s]
        out[:, :-s] |= mask[:, s:]
    m = out.copy()
    for s in range(1, ry + 1):
        out[s:, :] |= m[:-s, :]
        out[:-s, :] |= m[s:, :]
    return out


def _find_runs(row: np.ndarray) -> np.ndarray:
    """(K,2) [start, end) column runs of True in a 1-D boolean row."""
    d = np.diff(row.astype(np.int8), prepend=0, append=0)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return np.stack([starts, ends], axis=1)


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: list[int] = []

    def make(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, a: int) -> int:
        p = self.parent
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:  # path compression
            p[a], a = root, p[a]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def connected_component_boxes(mask: np.ndarray, with_ink: bool = False):
    """8-connected component bounding boxes of a boolean mask.

    ``with_ink=True`` additionally returns each component's ink pixel
    count (sum of run lengths) — the numerator of the box score — so
    no separate integral-image pass is needed.

    Fully vectorized run-based labeling:
    1. ALL row runs in one pass (pad + diff over the 2-D mask);
    2. adjacency between consecutive rows' runs via two
       ``np.searchsorted`` calls per row (runs are sorted, so the
       overlapping prev-runs of each run form a contiguous range);
    3. union-find over the resulting edge list, then per-root extents
       with ``np.minimum.at``/``np.maximum.at``.

    Cost ~ O(pixels) for step 1 (single numpy pass) + O(#runs) python
    for the union loop — ~2k runs for a dense page vs ~300k pixels.

    Returns (N, 4) int32 [x0, y0, x1, y1], exclusive ends, sorted by
    (y0, x0).
    """
    H, W = mask.shape
    padded = np.zeros((H, W + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    rows_s, starts = np.nonzero(d == 1)
    rows_e, ends = np.nonzero(d == -1)
    n = len(starts)
    if n == 0:
        empty = np.zeros((0, 4), dtype=np.int32)
        return (empty, np.zeros(0, dtype=np.int64)) if with_ink else empty
    # runs are emitted row-major: run i = (rows_s[i], [starts[i], ends[i]))
    row_of = rows_s.astype(np.int64)
    # global row-major keys make per-row sorted arrays globally sorted,
    # so ONE searchsorted pair finds every run's touching range in the
    # previous row (8-connectivity: prev [ps,pe) touches [s,e) iff
    # ps <= e and pe >= s)
    stride = W + 2
    start_keys = row_of * stride + starts
    end_keys = row_of * stride + ends
    prev_base = (row_of - 1) * stride
    lo_i = np.searchsorted(end_keys, prev_base + starts, side="left")
    hi_i = np.searchsorted(start_keys, prev_base + ends, side="right")
    counts = np.maximum(hi_i - lo_i, 0)
    # expand (run, prev-run) edge pairs without a python loop
    edge_a = np.repeat(np.arange(n, dtype=np.int64), counts)
    total = int(counts.sum())
    if total:
        csum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        edge_b = np.arange(total, dtype=np.int64) - np.repeat(csum, counts) + np.repeat(lo_i, counts)
    else:
        edge_b = np.empty(0, dtype=np.int64)

    # vectorized connected components: iterative min-label propagation
    # with pointer jumping (Shiloach-Vishkin style). Labels decrease
    # monotonically; at the fixed point every edge has equal labels ->
    # label == per-component min run index. Converges in ~log(diameter)
    # iterations (python loop count, not per-element).
    label = np.arange(n, dtype=np.int64)
    if total:
        for _ in range(n):
            nxt = label[label]  # pointer jump
            np.minimum.at(nxt, edge_a, label[edge_b])
            np.minimum.at(nxt, edge_b, label[edge_a])
            if np.array_equal(nxt, label):
                break
            label = nxt
    _, labels = np.unique(label, return_inverse=True)
    k = labels.max() + 1
    x0 = np.full(k, W, dtype=np.int64)
    x1 = np.zeros(k, dtype=np.int64)
    y0 = np.full(k, H, dtype=np.int64)
    y1 = np.zeros(k, dtype=np.int64)
    np.minimum.at(x0, labels, starts)
    np.maximum.at(x1, labels, ends)
    np.minimum.at(y0, labels, row_of)
    np.maximum.at(y1, labels, row_of + 1)
    out = np.stack([x0, y0, x1, y1], axis=1).astype(np.int32)
    order = np.lexsort((out[:, 0], out[:, 1]))
    if not with_ink:
        return out[order]
    ink = np.zeros(k, dtype=np.int64)
    np.add.at(ink, labels, ends - starts)
    return out[order], ink[order]


def detect_page(image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One page -> (abs_boxes (N,4) int32, rel_boxes_scored (N,5) float32).

    rel boxes follow the reference contract: [xmin, ymin, xmax, ymax,
    score] relative to page size, score = mean ink density inside the
    box (detection/core.py:34-64).
    """
    H, W = image.shape[:2]
    ink = binarize(image)
    comp, ink_sums = connected_component_boxes(dilate(ink), with_ink=True)
    if len(comp):
        # dilation is exact Minkowski expansion -> shrink back to tight ink box
        comp = comp + np.array([DILATE_X, DILATE_Y, -DILATE_X, -DILATE_Y], dtype=np.int32)
        comp[:, 0] = np.clip(comp[:, 0], 0, W)
        comp[:, 1] = np.clip(comp[:, 1], 0, H)
        comp[:, 2] = np.clip(comp[:, 2], 0, W)
        comp[:, 3] = np.clip(comp[:, 3], 0, H)
        keep = (comp[:, 2] - comp[:, 0] >= MIN_SIDE) & (comp[:, 3] - comp[:, 1] >= MIN_SIDE)
        comp, ink_sums = comp[keep], ink_sums[keep]
    abs_boxes = comp
    n = len(abs_boxes)
    rel = np.zeros((n, 5), dtype=np.float32)
    if n:
        # score = mean ORIGINAL ink inside the tight box (box_score
        # analog, detection/core.py:34-64). Computed by direct per-box
        # sums — boxes are small and disjoint, this beats a full-page
        # integral image; the dilated-run ink_sums can't be used (the
        # dilation fills glyph gaps -> every component scores ~1.0,
        # which would break density-based class separation in KIE).
        scores = np.empty(n, dtype=np.float32)
        areas = np.maximum(
            (abs_boxes[:, 2] - abs_boxes[:, 0]) * (abs_boxes[:, 3] - abs_boxes[:, 1]), 1
        )
        for i, (x0, y0, x1, y1) in enumerate(abs_boxes):
            scores[i] = ink[y0:y1, x0:x1].sum()
        scores /= areas
        rel[:, 0] = abs_boxes[:, 0] / W
        rel[:, 1] = abs_boxes[:, 1] / H
        rel[:, 2] = abs_boxes[:, 2] / W
        rel[:, 3] = abs_boxes[:, 3] / H
        rel[:, 4] = scores
        keep = scores >= BOX_THRESH
        abs_boxes, rel = abs_boxes[keep], rel[keep]
    return abs_boxes, rel


def detach_scores(boxes_scored: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N,5) -> ((N,4) boxes, (N,) scores). reference: utils/geometry.py:108-125."""
    return boxes_scored[:, :4], boxes_scored[:, 4]
