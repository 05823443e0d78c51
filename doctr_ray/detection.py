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
    labels = _label_runs(row_of, starts.astype(np.int64), ends.astype(np.int64), W + 2)
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


def _label_runs(row_of: np.ndarray, starts: np.ndarray, ends: np.ndarray, stride: int) -> np.ndarray:
    """Component labels for row-major sorted runs (8-connected between
    consecutive rows): global-key searchsorted adjacency + min-label
    propagation. Shared by the mask CC and the run-space detector."""
    n = len(starts)
    start_keys = row_of * stride + starts
    end_keys = row_of * stride + ends
    prev_base = (row_of - 1) * stride
    lo_i = np.searchsorted(end_keys, prev_base + starts, side="left")
    hi_i = np.searchsorted(start_keys, prev_base + ends, side="right")
    counts = np.maximum(hi_i - lo_i, 0)
    edge_a = np.repeat(np.arange(n, dtype=np.int64), counts)
    total = int(counts.sum())
    if total:
        csum = np.concatenate(([0], np.cumsum(counts)))[:-1]
        edge_b = (
            np.arange(total, dtype=np.int64)
            - np.repeat(csum, counts)
            + np.repeat(lo_i, counts)
        )
    else:
        edge_b = np.empty(0, dtype=np.int64)
    label = np.arange(n, dtype=np.int64)
    if total:
        for _ in range(n):
            nxt = label[label]
            np.minimum.at(nxt, edge_a, label[edge_b])
            np.minimum.at(nxt, edge_b, label[edge_a])
            if np.array_equal(nxt, label):
                break
            label = nxt
    return np.unique(label, return_inverse=True)[1]


_MBUF_CACHE: dict = {}  # (H, wp) -> reusable bool mask buffer

# (256, 8) bool: byte value -> its MSB-first bit pattern
_UNPACK_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).astype(bool)


def ink_runs(image: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, starts, ends) of the page's horizontal ink runs,
    row-major sorted, ends exclusive.

    Bit-packed transition scan: the boolean ink mask packs to bits
    (W/8 bytes per row), run starts/ends are single byte-wide bit ops
    (cur & ~prev / prev & ~cur), and only the handful of nonzero bytes
    are unpacked. The full-page work is one threshold pass + one
    packbits pass; everything after touches ~runs bytes, not pixels —
    the previous int8 diff + nonzero scan was ~8x more DRAM traffic
    and dominated the detector at scale (the single-socket bandwidth
    wall in BASELINE.md).
    """
    H, W = image.shape[:2]
    wp = (W // 8 + 1) * 8  # >= W+1 so a run touching col W-1 still ends
    # per-process buffer reuse: a fresh 300KB np.zeros per page is real
    # allocator traffic at thousands of pages/s (Ray map workers run
    # the UDF single-threaded, so a keyed module cache is safe)
    mbuf = _MBUF_CACHE.get((H, wp))
    if mbuf is None:
        mbuf = np.zeros((H, wp), dtype=bool)
        _MBUF_CACHE[(H, wp)] = mbuf
    else:
        mbuf[:, W:] = False
    np.less(image, INK_THRESH, out=mbuf[:, :W])
    B = np.packbits(mbuf, axis=1)  # MSB-first: bit j of byte b -> col b*8+j
    carry = np.empty_like(B)
    carry[:, 0] = 0
    np.left_shift(B[:, :-1], 7, out=carry[:, 1:])  # prev byte's LSB -> bit 7
    prev = (B >> 1) | carry        # the bit to the left of each bit
    bpr = B.shape[1]
    # ONE set-bit extraction over the combined transition mask instead
    # of two (starts and ends interleave strictly in row-major order:
    # s_i < e_i < s_{i+1}, so one pass keeps the pairing), then split by
    # probing the start mask — measured 0.54 -> 0.37 ms/page
    S = B & ~prev                  # 0 -> 1 transitions
    T = S | (prev & ~B)            # plus 1 -> 0 transitions
    flat = T.ravel()
    nz = np.flatnonzero(flat)
    if len(nz) == 0:
        e = np.zeros(0, dtype=np.int64)
        return e, e, e
    byte_i, bit_i = np.nonzero(_UNPACK_LUT[flat[nz]])
    src = nz[byte_i]
    cols = (src % bpr) * 8 + bit_i
    is_start = ((S.ravel()[src] >> (7 - bit_i)) & 1).astype(bool)
    return (src // bpr)[is_start], cols[is_start], cols[~is_start]


def detect_page(image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One page -> (abs_boxes (N,4) int32, rel_boxes_scored (N,5) float32).

    rel boxes follow the reference contract: [xmin, ymin, xmax, ymax,
    score] relative to page size, score = mean ink density inside the
    tight box (detection/core.py:34-64).

    Run-space implementation: ink runs come from the bit-packed
    transition scan (:func:`ink_runs` — threshold + packbits are the
    only full-page passes); horizontal dilation (merge runs with gap
    <= 2*DILATE_X), connected components, tight extents, and ink sums
    all operate on the tiny run arrays. Vertical dilation is
    unnecessary: every glyph has an ink border ring (glyphs.py), so
    components are vertically connected already.
    """
    H, W = image.shape[:2]
    rows, starts, ends = ink_runs(image)
    if len(starts) == 0:
        return np.zeros((0, 4), dtype=np.int32), np.zeros((0, 5), dtype=np.float32)
    n = len(starts)

    # horizontal dilation in run space: expand by DILATE_X and merge
    # same-row runs whose gap closed (original runs are sorted/disjoint,
    # so a chain test against the previous run suffices)
    ds_ = starts - DILATE_X
    de = ends + DILATE_X
    cont = np.zeros(n, dtype=bool)
    if n > 1:
        cont[1:] = (rows[1:] == rows[:-1]) & (ds_[1:] <= de[:-1])
    bounds = np.flatnonzero(~cont)                     # merged-run start indices
    m_rows = rows[bounds]
    m_ds = ds_[bounds]
    m_de = np.maximum.reduceat(de, bounds)
    m_ts = starts[bounds]                              # tight start (first run)
    m_te = np.maximum.reduceat(ends, bounds)           # tight end
    m_ink = np.add.reduceat(ends - starts, bounds)

    labels = _label_runs(m_rows, m_ds - m_ds.min(), m_de - m_ds.min(), int(W + 2 * DILATE_X + 2))
    # per-component extents: sort runs by label once + reduceat — the
    # five ufunc.at scatter reductions this replaces hit numpy's slow
    # generic path (measured 1.14 -> 0.88 ms/page for detect_page)
    order = np.argsort(labels, kind="stable")
    ls = labels[order]
    grp = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
    x0 = np.minimum.reduceat(m_ts[order], grp)
    x1 = np.maximum.reduceat(m_te[order], grp)
    y0 = np.minimum.reduceat(m_rows[order], grp)
    y1 = np.maximum.reduceat(m_rows[order], grp) + 1
    ink_sum = np.add.reduceat(m_ink[order], grp)

    abs_boxes = np.stack([x0, y0, x1, y1], axis=1).astype(np.int32)
    order = np.lexsort((abs_boxes[:, 0], abs_boxes[:, 1]))
    abs_boxes, ink_sum = abs_boxes[order], ink_sum[order]

    keep = (abs_boxes[:, 2] - abs_boxes[:, 0] >= MIN_SIDE) & (
        abs_boxes[:, 3] - abs_boxes[:, 1] >= MIN_SIDE
    )
    abs_boxes, ink_sum = abs_boxes[keep], ink_sum[keep]
    m = len(abs_boxes)
    rel = np.zeros((m, 5), dtype=np.float32)
    if m:
        areas = np.maximum(
            (abs_boxes[:, 2] - abs_boxes[:, 0]).astype(np.int64)
            * (abs_boxes[:, 3] - abs_boxes[:, 1]),
            1,
        )
        scores = (ink_sum / areas).astype(np.float32)
        rel[:, 0] = abs_boxes[:, 0] / W
        rel[:, 1] = abs_boxes[:, 1] / H
        rel[:, 2] = abs_boxes[:, 2] / W
        rel[:, 3] = abs_boxes[:, 3] / H
        rel[:, 4] = scores
        keep = scores >= BOX_THRESH
        abs_boxes, rel = abs_boxes[keep], rel[keep]
    return abs_boxes, rel


def detach_scores(boxes_scored):
    """Detach objectness scores from box predictions
    (reference: utils/geometry.py:108-125).

    List input follows the reference contract — a list of (N,5) or
    (N,5,2) arrays -> (list of box arrays, list of score arrays);
    a bare (N,5) array returns (boxes, scores) directly (engine-internal
    shorthand).
    """
    def _one(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if b.ndim == 2:
            return b[:, :-1], b[:, -1]
        return b[:, :-1], b[:, -1, -1]

    if isinstance(boxes_scored, np.ndarray):
        return _one(boxes_scored)
    pairs = [_one(b) for b in boxes_scored]
    return [p[0] for p in pairs], [p[1] for p in pairs]
