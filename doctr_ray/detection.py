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


def connected_component_boxes(mask: np.ndarray) -> np.ndarray:
    """8-connected component bounding boxes of a boolean mask.

    Run-based two-pass labeling: rows are reduced to ink runs
    (vectorized), runs overlapping between adjacent rows are unioned.
    Cost is O(#runs) ~ #words x #lines per page, not O(pixels).

    Returns (N, 4) int32 [x0, y0, x1, y1], exclusive ends, in
    first-seen (top-to-bottom) order.
    """
    uf = _UnionFind()
    boxes: list[list[int]] = []          # per-set [x0, y0, x1, y1]
    prev: list[tuple[int, int, int]] = []  # (start, end, set_id) of previous row
    H = mask.shape[0]
    for y in range(H):
        row_runs = _find_runs(mask[y])
        cur: list[tuple[int, int, int]] = []
        pi = 0
        for s, e in row_runs:
            sid = -1
            # 8-connectivity: previous-row run [ps,pe) touches if ps <= e and pe >= s
            # (runs are sorted; advance pi monotonically)
            while pi < len(prev) and prev[pi][1] < s:
                pi += 1
            pj = pi
            while pj < len(prev) and prev[pj][0] <= e:
                psid = uf.find(prev[pj][2])
                if sid == -1:
                    sid = psid
                else:
                    uf.union(sid, psid)
                    sid = uf.find(sid)
                pj += 1
            if sid == -1:
                sid = uf.make()
                boxes.append([int(s), y, int(e), y + 1])
            cur.append((int(s), int(e), sid))
        prev = cur
        for s, e, sid in cur:
            b = boxes[uf.find(sid)]
            if s < b[0]:
                b[0] = int(s)
            if e > b[2]:
                b[2] = int(e)
            b[3] = y + 1
    # merge box extents into roots
    final: dict[int, list[int]] = {}
    for i, b in enumerate(boxes):
        r = uf.find(i)
        fb = final.get(r)
        if fb is None:
            final[r] = list(boxes[r]) if r != i else list(b)
            fb = final[r]
        fb[0] = min(fb[0], b[0])
        fb[1] = min(fb[1], b[1])
        fb[2] = max(fb[2], b[2])
        fb[3] = max(fb[3], b[3])
    if not final:
        return np.zeros((0, 4), dtype=np.int32)
    out = np.array(sorted(final.values(), key=lambda b: (b[1], b[0])), dtype=np.int32)
    return out


def detect_page(image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One page -> (abs_boxes (N,4) int32, rel_boxes_scored (N,5) float32).

    rel boxes follow the reference contract: [xmin, ymin, xmax, ymax,
    score] relative to page size, score = mean ink density inside the
    box (detection/core.py:34-64).
    """
    H, W = image.shape[:2]
    ink = binarize(image)
    comp = connected_component_boxes(dilate(ink))
    if len(comp):
        # dilation is exact Minkowski expansion -> shrink back to tight ink box
        comp = comp + np.array([DILATE_X, DILATE_Y, -DILATE_X, -DILATE_Y], dtype=np.int32)
        comp[:, 0] = np.clip(comp[:, 0], 0, W)
        comp[:, 1] = np.clip(comp[:, 1], 0, H)
        comp[:, 2] = np.clip(comp[:, 2], 0, W)
        comp[:, 3] = np.clip(comp[:, 3], 0, H)
        keep = (comp[:, 2] - comp[:, 0] >= MIN_SIDE) & (comp[:, 3] - comp[:, 1] >= MIN_SIDE)
        comp = comp[keep]
    abs_boxes = comp
    n = len(abs_boxes)
    rel = np.zeros((n, 5), dtype=np.float32)
    if n:
        scores = np.empty(n, dtype=np.float32)
        for i, (x0, y0, x1, y1) in enumerate(abs_boxes):
            scores[i] = float(ink[y0:y1, x0:x1].mean())
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
