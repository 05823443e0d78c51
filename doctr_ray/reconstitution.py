"""Page reconstitution — synthesize a page image from a builder export.

Re-expressed from the reference's ``synthesize_page`` /
``synthesize_kie_page`` (reference utils/reconstitution.py:128-300:
blank page, per-word font fitted to the predicted box, drawn at the
predicted geometry). The reference draws with PIL and a vector font —
inherently approximate; this engine draws with the same deterministic
procedural font the rasterizer uses (doctr_ray.glyphs), which makes
the round-trip EXACT on its own assets: reconstituting the export of
a synthetic page reproduces the page pixel-for-pixel (pinned in
tests/test_reconstitution.py).

A word whose box does not match the font's natural metrics is scaled
to fit (nearest-neighbor), mirroring the reference's font-size fit.
"""

from __future__ import annotations

import numpy as np

from .glyphs import SCALE, render_word, word_width


def _draw_word(page: np.ndarray, value: str, x0: int, y0: int, x1: int, y1: int) -> None:
    H, W = page.shape[:2]
    bw, bh = x1 - x0, y1 - y0
    if bw <= 0 or bh <= 0 or not value:
        return
    mask = render_word(value, SCALE)
    mh, mw = mask.shape
    if (mh, mw) != (bh, bw):
        # fit-to-box: nearest-neighbor rescale of the natural rendering
        # (the reference's font-size fit, reconstitution.py:42-92)
        ys = (np.arange(bh) * mh / bh).astype(np.int64)
        xs = (np.arange(bw) * mw / bw).astype(np.int64)
        mask = mask[ys][:, xs]
    ex0, ey0 = max(0, x0), max(0, y0)
    ex1, ey1 = min(W, x1), min(H, y1)
    if ex1 <= ex0 or ey1 <= ey0:
        return
    sub = mask[ey0 - y0 : ey1 - y0, ex0 - x0 : ex1 - x0]
    region = page[ey0:ey1, ex0:ex1]
    region[sub.astype(bool)] = 0


def synthesize_page(
    page_export: dict,
    page_shape: tuple[int, int],
    draw_proba: bool = False,
) -> np.ndarray:
    """Builder export dict -> (H, W) uint8 page image.

    ``draw_proba`` shades each word's ink by its confidence instead of
    pure black (the reference's probability overlay)."""
    H, W = page_shape
    page = np.full((H, W), 255, dtype=np.uint8)
    for block in page_export.get("blocks", []):
        for line in block.get("lines", []):
            for word in line.get("words", []):
                g = word["geometry"]
                x0 = int(round(g[0] * W))
                y0 = int(round(g[1] * H))
                x1 = int(round(g[2] * W))
                y1 = int(round(g[3] * H))
                before = page[max(0, y0) : y1, max(0, x0) : x1].copy()
                _draw_word(page, word["value"], x0, y0, x1, y1)
                if draw_proba:
                    conf = float(word.get("confidence", 1.0))
                    shade = np.uint8(round((1.0 - conf) * 255))
                    region = page[max(0, y0) : y1, max(0, x0) : x1]
                    region[(region == 0) & (before != 0)] = shade
    return page


def synthesize_kie_page(
    predictions: list[dict],
    page_shape: tuple[int, int],
) -> np.ndarray:
    """KIE prediction rows [{value, x0, y0, x1, y1 (relative)}] -> page
    image (synthesize_kie_page analog, reconstitution.py:282-300);
    artefact predictions (empty value) render as solid boxes."""
    H, W = page_shape
    page = np.full((H, W), 255, dtype=np.uint8)
    for p in predictions:
        x0 = int(round(p["x0"] * W))
        y0 = int(round(p["y0"] * H))
        x1 = int(round(p["x1"] * W))
        y1 = int(round(p["y1"] * H))
        if p.get("value"):
            _draw_word(page, p["value"], x0, y0, x1, y1)
        else:
            page[max(0, y0) : y1, max(0, x0) : x1] = 0
    return page
