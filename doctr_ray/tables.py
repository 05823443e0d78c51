"""Table structure extraction — bordered grids to logical cells.

Re-expressed semantics of the reference's table stack (reference:
table_structure/predictor/pytorch.py:19-80 TablePredictor — table crops
to ``{cells: [{geometry, row/col spans}], num_rows, num_cols}``;
models/builder.py:424-580 _build_tables — vectorized point-in-cell word
assignment, in-cell reading order, logical grid re-index;
io/elements.py:251-311 Table.to_grid). The deterministic "model" here
detects a bordered grid directly: a detected component much taller than
the font's line height whose region contains full-height vertical and
full-width horizontal ink lines is a table; line positions give the
cell lattice; word components inside the region are assigned to cells
by box-center containment.

Synthetic table media: ``doctr_ray.media.encode_media_ref(...,
table=(R, C))`` renders an R x C bordered grid whose cells consume the
first R*C words row-major — so the logical-grid ground truth is exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .detection import detect_page
from .geometry import extract_crops
from .glyphs import CHAR_H
from .recognition import GlyphRecognizer

# a component this much taller than the line height is not a word
TABLE_MIN_HEIGHT = 3 * CHAR_H
LINE_FILL = 0.95  # fraction of span a grid line must cover


@dataclass
class TableCell:
    value: str
    confidence: float
    row: int
    col: int
    geometry: list[float]  # relative [x0, y0, x1, y1]


@dataclass
class Table:
    cells: list[TableCell]
    num_rows: int
    num_cols: int
    geometry: list[float]

    def to_grid(self) -> list[list[str]]:
        """Dense grid of cell texts (Table.to_grid, io/elements.py:293-311)."""
        grid = [["" for _ in range(self.num_cols)] for _ in range(self.num_rows)]
        for c in self.cells:
            grid[c.row][c.col] = c.value
        return grid

    def export(self) -> dict:
        return {
            "geometry": list(self.geometry),
            "num_rows": self.num_rows,
            "num_cols": self.num_cols,
            "cells": [
                {
                    "value": c.value,
                    "confidence": c.confidence,
                    "row_start": c.row,
                    "row_end": c.row + 1,
                    "col_start": c.col,
                    "col_end": c.col + 1,
                    "geometry": list(c.geometry),
                }
                for c in self.cells
            ],
        }


def _grid_lines(ink_region: np.ndarray, axis: int) -> list[int]:
    """Positions (center offsets) of full-span grid lines along an axis.

    axis=0: vertical lines (columns with near-full ink); axis=1:
    horizontal lines (rows). Consecutive line pixels collapse to one.
    """
    fill = ink_region.mean(axis=axis)
    hits = np.flatnonzero(fill >= LINE_FILL)
    if len(hits) == 0:
        return []
    groups = np.split(hits, np.flatnonzero(np.diff(hits) > 1) + 1)
    return [int(g.mean()) for g in groups]


def extract_tables(
    image: np.ndarray, recognizer: GlyphRecognizer | None = None
) -> tuple[list[Table], np.ndarray]:
    """Detect bordered-grid tables on a page.

    Returns (tables, body_word_mask): tables with recognized cell
    texts, and a mask over the page's detected components marking the
    ones that are ordinary body words (outside any table; table-
    internal words and the lattices themselves are consumed).
    """
    H, W = image.shape[:2]
    ink = image < 128
    abs_boxes, rel = detect_page(image)
    n = len(abs_boxes)
    body_mask = np.ones(n, dtype=bool)
    tables: list[Table] = []
    if n == 0:
        return tables, body_mask
    rec = recognizer or GlyphRecognizer()
    heights = abs_boxes[:, 3] - abs_boxes[:, 1]
    for ti in np.flatnonzero(heights >= TABLE_MIN_HEIGHT):
        tx0, ty0, tx1, ty1 = (int(v) for v in abs_boxes[ti])
        region = ink[ty0:ty1, tx0:tx1]
        v_lines = _grid_lines(region, axis=0)
        h_lines = _grid_lines(region, axis=1)
        if len(v_lines) < 2 or len(h_lines) < 2:
            continue  # tall blob but no lattice -> not a table
        body_mask[ti] = False
        num_cols = len(v_lines) - 1
        num_rows = len(h_lines) - 1
        # word components inside the table: assign by center containment
        centers_x = (abs_boxes[:, 0] + abs_boxes[:, 2]) / 2
        centers_y = (abs_boxes[:, 1] + abs_boxes[:, 3]) / 2
        inside = (
            body_mask
            & (centers_x > tx0)
            & (centers_x < tx1)
            & (centers_y > ty0)
            & (centers_y < ty1)
        )
        cells: list[TableCell] = []
        member_idx = np.flatnonzero(inside)
        crops = extract_crops(image, abs_boxes[member_idx])
        preds = rec.recognize_batch(crops)
        vx = np.asarray(v_lines) + tx0
        hy = np.asarray(h_lines) + ty0
        for mi, (text, conf) in zip(member_idx, preds):
            cx, cy = centers_x[mi], centers_y[mi]
            col = int(np.searchsorted(vx, cx) - 1)
            row = int(np.searchsorted(hy, cy) - 1)
            if 0 <= col < num_cols and 0 <= row < num_rows:
                body_mask[mi] = False
                x0, y0, x1, y1 = abs_boxes[mi]
                cells.append(
                    TableCell(
                        value=text,
                        confidence=float(conf),
                        row=row,
                        col=col,
                        geometry=[x0 / W, y0 / H, x1 / W, y1 / H],
                    )
                )
        cells.sort(key=lambda c: (c.row, c.col))
        tables.append(
            Table(
                cells=cells,
                num_rows=num_rows,
                num_cols=num_cols,
                geometry=[tx0 / W, ty0 / H, tx1 / W, ty1 / H],
            )
        )
    return tables, body_mask
