"""Document builder — words -> lines -> blocks -> ordered page export.

Re-expressed semantics of the reference's ``DocumentBuilder``
(reference: models/builder.py:53-285, 582-811):

- ``sort_boxes``   — reading sort key ``x + 2*ymax/median_height``
  (builder.py:67-105; rotated boxes are deskewed first via
  ``estimate_page_angle``/``rotate_boxes``).
- ``resolve_lines`` — y-center clustering into visual rows within
  ±median_height/2, then an adaptive horizontal ``break_dist``
  (min(paragraph_break, max(3*median_gap, aspect-scaled median height)))
  splits rows into sub-lines (builder.py:107-219).
- ``resolve_blocks`` — lines -> 6-dim geometric features ->
  single-linkage agglomerative clustering cut at t=0.1
  (builder.py:221-285 uses scipy ``fclusterdata(t=0.1,
  criterion='distance')``; with single linkage + the distance criterion
  that is exactly connected components under "feature distance <= t"
  edges, which we compute with a union-find — scipy-free, same result).

The output is columnar: ordered word indices plus per-word
line/block ids, and a nested page export dict mirroring
``Page.export()`` (io/elements.py:424-512).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .geometry import estimate_page_angle, resolve_enclosing_bbox, rotate_boxes

PARAGRAPH_BREAK = 0.035  # reference models/builder.py:57
BLOCK_DIST_T = 0.1       # reference models/builder.py:271


def _median(a: np.ndarray) -> float:
    """``float(np.median(a))`` without the _ureduce machinery — the
    builder calls this ~3x per page on <100-element arrays where
    np.median's dispatch is 4x the partition itself (15 -> 3.6 us).
    Bit-identical: same partition selection, same two-middle mean
    (equality fuzz-tested against np.median in tests)."""
    n = a.shape[0]
    if n % 2:
        return float(np.partition(a, n // 2)[n // 2])
    b = np.partition(a, (n // 2 - 1, n // 2))
    return float((b[n // 2 - 1] + b[n // 2]) / 2)


def sort_boxes(
    boxes: np.ndarray, shape: tuple[int, int] | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Reading-sort indices + (possibly deskewed) straight boxes.

    reference: models/builder.py:67-105.
    """
    if boxes.ndim == 3:
        height, width = shape if shape is not None else (1024, 1024)
        scale = np.array([width, height], dtype=boxes.dtype)
        angle = estimate_page_angle(boxes * scale)
        rotated = rotate_boxes(boxes, angle=-angle, orig_shape=(height, width), min_angle=1.0)
        if abs(angle) >= 1.0:
            # axis-aligned boxes mixed into a rotated page carry no skew:
            # keep their own extent, only translate to the deskewed center
            edges = (boxes[:, 1] - boxes[:, 0]) * scale
            own_angle = np.rad2deg(np.arctan2(-edges[:, 1], edges[:, 0]))
            keep = np.abs(own_angle) < abs(angle) / 2
            if keep.any():
                centers = boxes.mean(axis=1, keepdims=True)
                new_centers = rotated.mean(axis=1, keepdims=True)
                rotated[keep] = boxes[keep] - centers[keep] + new_centers[keep]
        boxes = np.concatenate((rotated.min(1), rotated.max(1)), -1)
    med_height = _median(boxes[:, 3] - boxes[:, 1]) if len(boxes) else 1.0
    if not np.isfinite(med_height) or med_height <= 0:
        med_height = 1.0
    key = boxes[:, 0] + 2 * boxes[:, 3] / med_height
    return key.argsort(kind="stable"), boxes


def _resolve_sub_lines(boxes: np.ndarray, word_idcs: list[int], break_dist: float) -> list[list[int]]:
    """Split one visual row into sub-lines at gaps >= break_dist.

    reference: models/builder.py:107-147.
    """
    order = np.argsort(boxes[word_idcs, 0], kind="stable")
    word_idcs = [word_idcs[i] for i in order]
    if len(word_idcs) < 2:
        return [word_idcs]
    lines: list[list[int]] = []
    sub = [word_idcs[0]]
    for i in word_idcs[1:]:
        gap = boxes[i, 0] - boxes[sub[-1], 2]
        if gap >= break_dist:
            lines.append(sub)
            sub = []
        sub.append(i)
    lines.append(sub)
    return lines


def resolve_lines(
    boxes: np.ndarray,
    shape: tuple[int, int] | None = None,
    paragraph_break: float = PARAGRAPH_BREAK,
) -> tuple[list[list[int]], np.ndarray]:
    """Group (N,4)|(N,4,2) boxes into reading-ordered lines.

    Returns (lines as nested word indices, straightened boxes).
    reference: models/builder.py:149-219.
    """
    if len(boxes) == 0:
        return [], boxes.reshape(0, 4)
    idxs, boxes = sort_boxes(boxes, shape)
    y_med = _median(boxes[:, 3] - boxes[:, 1])

    # visual rows: accumulate while |y_center - running mean| < y_med/2.
    # y-centers precomputed once; the sequential loop runs on plain
    # python floats (a numpy fancy-index + .mean() per word dominated
    # the builder's profile)
    yc_all = ((boxes[:, 1] + boxes[:, 3]) * 0.5).tolist()
    idx_list = [int(i) for i in idxs]
    half_med = y_med / 2
    rows: list[list[int]] = []
    words: list[int] = [idx_list[0]]
    y_center_sum = yc_all[idx_list[0]]
    for idx in idx_list[1:]:
        yc = yc_all[idx]
        if abs(yc - y_center_sum / len(words)) >= half_med:
            rows.append(words)
            words = []
            y_center_sum = 0.0
        words.append(idx)
        y_center_sum += yc
    if words:
        rows.append(words)

    # adaptive break distance from the page's own word-gap statistics
    gap_chunks = []
    n_pairs = 0
    for row in rows:
        if len(row) < 2:
            continue
        r = np.asarray(row)
        r = r[np.argsort(boxes[r, 0], kind="stable")]
        n_pairs += len(r) - 1
        gap_chunks.append(boxes[r[1:], 0] - boxes[r[:-1], 2])
    gaps = np.concatenate(gap_chunks) if gap_chunks else np.empty(0, dtype=boxes.dtype)
    pos = gaps[gaps > 0]
    aspect = (shape[0] / shape[1]) if shape is not None else 1.0
    floor = y_med * aspect
    if len(pos) >= 5 and len(pos) >= 0.5 * n_pairs:
        break_dist = min(paragraph_break, max(3.0 * _median(pos), floor))
    elif n_pairs >= 5:
        break_dist = min(paragraph_break, floor)
    else:
        break_dist = paragraph_break

    lines: list[list[int]] = []
    for row in rows:
        lines.extend(_resolve_sub_lines(boxes, row, break_dist))
    return lines, boxes


def resolve_blocks(boxes: np.ndarray, lines: list[list[int]]) -> list[list[list[int]]]:
    """Cluster lines into blocks; single-linkage components at t=0.1.

    reference: models/builder.py:221-285 (fclusterdata('distance', 0.1)).
    """
    if len(lines) <= 1:
        return [list(lines)] if lines else []
    enclosing = np.stack([resolve_enclosing_bbox(boxes[line]) for line in lines])
    feats = np.stack(
        (
            (enclosing[:, 0] + enclosing[:, 3]) / 2,
            (enclosing[:, 1] + enclosing[:, 2]) / 2,
            (enclosing[:, 0] + enclosing[:, 2]) / 2,
            (enclosing[:, 1] + enclosing[:, 3]) / 2,
            enclosing[:, 0],
            enclosing[:, 1],
        ),
        axis=-1,
    )
    n = len(lines)
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    adj = d2 <= BLOCK_DIST_T * BLOCK_DIST_T
    # connected components (single linkage at cut t == components of adj graph)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in np.flatnonzero(adj[i, i + 1 :]) + i + 1:
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    # block order = first line occurrence (dict preserves insertion order)
    return [[lines[i] for i in g] for g in groups.values()]


@dataclass
class BuiltPage:
    """Ordered, structured result for one page."""

    order: list[int]          # word indices in final reading order
    line_ids: list[int]       # per ordered word
    block_ids: list[int]      # per ordered word
    export: dict              # Page.export()-shaped nested dict


def build_page(
    boxes: np.ndarray,
    texts: list[str],
    confidences: list[float],
    objectness: np.ndarray | None = None,
    shape: tuple[int, int] | None = None,
    do_resolve_lines: bool = True,
    do_resolve_blocks: bool = False,
    paragraph_break: float = PARAGRAPH_BREAK,
    keep_reading_order: bool = False,
    with_export: bool = True,
) -> BuiltPage:
    """Assemble one page, mirroring ``DocumentBuilder.__call__``'s
    word->line->block path (reference: models/builder.py:582-811).

    ``do_resolve_blocks`` defaults False like the reference
    (builder.py:55), yielding one block per page. ``with_export=False``
    skips building the nested Page.export() dict — the text hot path
    only needs order/line ids, and the per-word dict construction is
    ~15% of the page budget.
    ``keep_reading_order`` re-orders the resolved lines with the
    column-aware reading-order module (reference: builder.py:659-689
    _apply_reading_order) — columns read fully before the next.
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    n = len(boxes)
    if objectness is None:
        objectness = np.zeros(n, dtype=np.float32)
    if n == 0:
        return BuiltPage(order=[], line_ids=[], block_ids=[], export={"blocks": []})
    if do_resolve_lines:
        lines, sboxes = resolve_lines(boxes, shape, paragraph_break)
    else:
        idxs, sboxes = sort_boxes(boxes, shape)
        lines = [[int(i) for i in idxs]]
    # rtl scripts read words right-to-left within a line (reference:
    # io/exporters.py:219-250 ordered_line_words, auto per-page bidi)
    from .reading_order import detect_text_direction

    if detect_text_direction(texts) == "rtl":
        lines = [list(reversed(line)) for line in lines]
    if keep_reading_order and len(lines) > 1:
        from .reading_order import sort_reading_order

        line_boxes = np.stack([resolve_enclosing_bbox(sboxes[line]) for line in lines])
        line_texts = [" ".join(texts[w] for w in line) for line in lines]
        lines = [lines[i] for i in sort_reading_order(line_boxes, line_texts)]
    blocks = resolve_blocks(sboxes, lines) if do_resolve_blocks else ([list(lines)] if lines else [])

    order: list[int] = []
    line_ids: list[int] = []
    block_ids: list[int] = []
    export_blocks = []
    li = 0
    for bi, blk in enumerate(blocks):
        blk_lines = []
        for line in blk:
            words = []
            for w in line:
                order.append(w)
                line_ids.append(li)
                block_ids.append(bi)
                if with_export:
                    words.append(
                        {
                            "value": texts[w],
                            "confidence": float(confidences[w]),
                            "geometry": [float(v) for v in sboxes[w]],
                            "objectness_score": float(objectness[w]),
                        }
                    )
            if with_export:
                geom = resolve_enclosing_bbox(sboxes[line])
                blk_lines.append(
                    {
                        "geometry": [float(v) for v in geom],
                        "objectness_score": float(np.mean([objectness[w] for w in line])),
                        "words": words,
                    }
                )
            li += 1
        if with_export and blk_lines:
            bgeom = resolve_enclosing_bbox(np.stack([np.asarray(l["geometry"]) for l in blk_lines]))
            export_blocks.append(
                {
                    "geometry": [float(v) for v in bgeom],
                    "objectness_score": float(np.mean([l["objectness_score"] for l in blk_lines])),
                    "lines": blk_lines,
                }
            )
    return BuiltPage(
        order=order,
        line_ids=line_ids,
        block_ids=block_ids,
        export={"blocks": export_blocks},
    )


def page_text(built: BuiltPage, texts: list[str], word_sep: str = " ", line_sep: str = "\n") -> str:
    """Linearize a built page to text (render() analog, io/exporters.py:1187-1197)."""
    out: list[str] = []
    cur: list[str] = []
    last_line = -1
    for w, li in zip(built.order, built.line_ids):
        if li != last_line and cur:
            out.append(word_sep.join(cur))
            cur = []
        cur.append(texts[w])
        last_line = li
    if cur:
        out.append(word_sep.join(cur))
    return line_sep.join(out)
