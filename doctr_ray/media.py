"""Synthetic media assets and the rasterize stage kernel.

The reference's media ingestion is ``DocumentFile.from_pdf/from_images``
-> pdfium/cv2 rasterization to ``np.ndarray`` pages
(reference: io/pdf.py:16-43, io/image/base.py:16-54, io/reader.py:24-79).
This sandbox has no pdfium/cv2, so real decoding is stubbed in
:mod:`doctr_ray.sources.readers`; *synthetic* media are first-class: a
``media_ref`` of the form::

    synth://v1/{page_w}x{page_h}/c{cols}/{base64url(text)}

is a self-describing asset whose pages are rendered deterministically
with the procedural bitmap font (:mod:`doctr_ray.glyphs`). Layout is a
greedy word-wrap into 1 or 2 columns with fixed margins/leading, filling
pages top-to-bottom — the ground truth (per-word text + pixel box) falls
out of the same code path, which is what makes the OCR round-trip
exactly checkable.

Pages are grayscale uint8 (255 background, 0 ink). The reference uses
RGB (io/pdf.py:41); grayscale is an intentional 3x memory saving for the
object store — the detection/recognition kernels only need luminance.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

import numpy as np

from .glyphs import CHAR_H, SCALE, render_word, word_width

# Scaled layout metrics (px at SCALE=2).
MARGIN = 8 * SCALE       # 16
WORD_GAP = 4 * SCALE     # 8  — must exceed 2*detection dilation radius
LINE_LEAD = 5 * SCALE    # 10 — vertical gap between line boxes
LINE_PITCH = CHAR_H + LINE_LEAD  # 24
COL_GAP = 12 * SCALE     # 24 — gutter between columns (2-col layout)

DEFAULT_PAGE_W = 640
DEFAULT_PAGE_H = 480

SYNTH_PREFIX = "synth://v1/"
HTML_PREFIX = "synthhtml://v1/"


def encode_html_media_ref(text: str, doc_seed: str = "h") -> str:
    """Self-describing HTML asset: the text is served as a full page
    with deterministic boilerplate (functions/html_extract.synthesize_html)."""
    payload = base64.urlsafe_b64encode(text.encode("utf-8")).decode("ascii")
    return f"{HTML_PREFIX}{doc_seed}/{payload}"


def fetch_html(media_ref: str) -> str:
    """Materialize the HTML page behind a synthhtml:// ref."""
    if not media_ref.startswith(HTML_PREFIX):
        raise ValueError(f"not a synthhtml media_ref: {media_ref[:40]!r}")
    seed, payload = media_ref[len(HTML_PREFIX):].split("/", 1)
    text = base64.urlsafe_b64decode(payload.encode("ascii")).decode("utf-8")
    from .functions.html_extract import synthesize_html

    return synthesize_html(text, seed)


_SPEC_RE = None


def encode_media_ref(
    text: str,
    page_w: int = DEFAULT_PAGE_W,
    page_h: int = DEFAULT_PAGE_H,
    cols: int = 1,
    artefacts: int = 0,
    rotation: int = 0,
    table: tuple[int, int] | None = None,
    skew_decidegrees: int = 0,
) -> str:
    payload = base64.urlsafe_b64encode(text.encode("utf-8")).decode("ascii")
    art = f"a{artefacts}" if artefacts else ""
    rot = f"r{rotation}" if rotation else ""
    tab = f"t{table[0]}x{table[1]}" if table else ""
    sk = f"s{skew_decidegrees}" if skew_decidegrees else ""
    return f"{SYNTH_PREFIX}{page_w}x{page_h}/c{cols}{art}{rot}{tab}{sk}/{payload}"


def decode_media_ref(
    media_ref: str,
) -> tuple[str, int, int, int, int, int, tuple[int, int] | None]:
    """-> (text, page_w, page_h, cols, artefacts, rotation, table).
    Raises on foreign refs."""
    global _SPEC_RE
    if _SPEC_RE is None:
        import re

        _SPEC_RE = re.compile(r"^c(\d+)(?:a(\d+))?(?:r(\d+))?(?:t(\d+)x(\d+))?(?:s(-?\d+))?$")
    if not media_ref.startswith(SYNTH_PREFIX):
        raise ValueError(f"not a synth media_ref: {media_ref[:40]!r}")
    rest = media_ref[len(SYNTH_PREFIX) :]
    dims, colspec, payload = rest.split("/", 2)
    w, h = dims.split("x")
    m = _SPEC_RE.match(colspec)
    if m is None:
        raise ValueError(f"bad media spec: {colspec!r}")
    cols_s, art_s, rot_s, tr, tc, sk = m.groups()
    table = (int(tr), int(tc)) if tr else None
    text = base64.urlsafe_b64decode(payload.encode("ascii")).decode("utf-8")
    return (
        text, int(w), int(h), int(cols_s), int(art_s or 0), int(rot_s or 0),
        table, int(sk or 0),
    )


ART_W = 20 * SCALE   # artefact rectangle size (px)
ART_H = 10 * SCALE
ART_BAND = ART_H + 4 * SCALE  # bottom band reserved when artefacts present
CELL_PAD = 3 * SCALE  # cell inner padding (> 2*detection dilation radius)
LINE_T = 1 * SCALE    # table grid line thickness


@dataclass
class PageGT:
    """One rendered page + its ground truth."""

    image: np.ndarray                         # (H, W) uint8, 255 bg / 0 ink
    words: list[tuple[str, int, int, int, int]]  # (text, x0, y0, x1, y1) px, exclusive
    artefacts: list[tuple[int, int, int, int]] = None  # solid boxes (x0,y0,x1,y1)
    table: dict | None = None  # {num_rows, num_cols, cells:[(text,row,col)], box}

    def __post_init__(self):
        if self.artefacts is None:
            self.artefacts = []


def skew_margins(page_w: int, page_h: int, skew_dd: int) -> tuple[int, int]:
    """(margin_x, margin_y) for a page that will be skew-rendered.

    A rotation about the page center sweeps the corner content out of
    frame; a scanner keeps the sheet inside the scan, so the renderer
    insets content far enough that every content pixel survives the
    rotation (depth = c_x(1-cos) + c_y*sin per axis). Upright pages use
    the plain MARGIN."""
    if not skew_dd:
        return MARGIN, MARGIN
    import math

    th = math.radians(abs(skew_dd) / 10.0)
    cx, cy = page_w / 2.0, page_h / 2.0
    mx = MARGIN + math.ceil(cx * (1 - math.cos(th)) + cy * math.sin(th))
    my = MARGIN + math.ceil(cy * (1 - math.cos(th)) + cx * math.sin(th))
    return mx, my


def _layout_columns(page_w: int, cols: int, margin_x: int = MARGIN) -> list[tuple[int, int]]:
    """[(x_start, x_end)] for each column's content area."""
    content_w = page_w - 2 * margin_x
    if cols <= 1:
        return [(margin_x, margin_x + content_w)]
    col_w = (content_w - COL_GAP) // 2
    return [(margin_x, margin_x + col_w), (margin_x + col_w + COL_GAP, margin_x + col_w + COL_GAP + col_w)]


def rasterize_synth(media_ref: str, scale: int = SCALE) -> list[PageGT]:
    """Render a synth:// asset into pages with word ground truth.

    Greedy wrap: words fill a line until the column width is exceeded,
    lines fill a column until the page height is exceeded, columns fill
    left-to-right (cols=2), then a new page starts. Words wider than a
    column are hard-truncated to fit (cannot happen with the synthetic
    corpora's short tokens; asserted in tests).
    """
    text, page_w, page_h, cols, n_art, rotation, table, skew_dd = decode_media_ref(media_ref)
    words = [w for w in text.split(" ") if w]
    margin_x, margin_y = skew_margins(page_w, page_h, skew_dd)
    col_spans = _layout_columns(page_w, cols, margin_x)
    usable_h = page_h - (ART_BAND if n_art else 0)
    max_lines = max(1, (usable_h - 2 * margin_y + LINE_LEAD) // LINE_PITCH)

    pages: list[PageGT] = []
    placed: list[tuple[str, int, int, int, int]] = []
    img = np.full((page_h, page_w), 255, dtype=np.uint8)
    col_i, line_i = 0, 0
    x = col_spans[0][0]

    table_gt: dict | None = None
    if table is not None:
        R, C = table
        cell_words, words = words[: R * C], words[R * C :]
        cw_inner = max([word_width(w) for w in cell_words], default=CHAR_H * 4)
        cell_w = cw_inner + 2 * CELL_PAD
        cell_h = CHAR_H + 2 * CELL_PAD
        table_w = C * cell_w + (C + 1) * LINE_T
        table_h = R * cell_h + (R + 1) * LINE_T
        tx0, ty0 = MARGIN, MARGIN
        # lattice
        for i in range(R + 1):
            y = ty0 + i * (cell_h + LINE_T)
            img[y : y + LINE_T, tx0 : tx0 + table_w] = 0
        for j in range(C + 1):
            xg = tx0 + j * (cell_w + LINE_T)
            img[ty0 : ty0 + table_h, xg : xg + LINE_T] = 0
        cells_gt = []
        for i, w in enumerate(cell_words):
            r_, c_ = i // C, i % C
            wx = tx0 + LINE_T + c_ * (cell_w + LINE_T) + CELL_PAD
            wy = ty0 + LINE_T + r_ * (cell_h + LINE_T) + CELL_PAD
            mask = render_word(w, scale)
            img[wy : wy + mask.shape[0], wx : wx + mask.shape[1]][mask.astype(bool)] = 0
            cells_gt.append((w, r_, c_))
        table_gt = {
            "num_rows": R,
            "num_cols": C,
            "cells": cells_gt,
            "box": (tx0, ty0, tx0 + table_w, ty0 + table_h),
        }
        # body text flows below the table on page 0
        line_i = (table_h + LINE_LEAD + LINE_PITCH - 1) // LINE_PITCH

    def flush_page() -> None:
        nonlocal img, placed, col_i, line_i, x, table_gt
        pages.append(PageGT(image=img, words=placed, table=table_gt))
        table_gt = None
        img = np.full((page_h, page_w), 255, dtype=np.uint8)
        placed = []
        col_i, line_i = 0, 0
        x = col_spans[0][0]

    for w in words:
        ww = word_width(w, scale)
        cx0, cx1 = col_spans[col_i]
        if ww > cx1 - cx0:  # pathological long word: truncate to fit
            keep = max(1, (cx1 - cx0 + 1 * scale) // (6 * scale))
            w = w[:keep]
            ww = word_width(w, scale)
        if x + ww > cx1:  # wrap line
            line_i += 1
            x = cx0
            if line_i >= max_lines:  # wrap column
                col_i += 1
                line_i = 0
                if col_i >= len(col_spans):  # wrap page
                    flush_page()
                else:
                    x = col_spans[col_i][0]
        y = margin_y + line_i * LINE_PITCH
        mask = render_word(w, scale)
        img[y : y + mask.shape[0], x : x + ww][mask.astype(bool)] = 0
        placed.append((w, x, y, x + ww, y + mask.shape[0]))
        x += ww + WORD_GAP

    if placed or not pages:
        flush_page()
    # artefacts: solid rectangles in the reserved bottom band of page 0
    # (deterministic positions; never overlap text)
    if n_art:
        img0 = pages[0].image
        y0 = page_h - ART_BAND + 2 * SCALE
        for i in range(n_art):
            x0 = MARGIN + i * (ART_W + 4 * SCALE)
            if x0 + ART_W > page_w - MARGIN:
                break
            img0[y0 : y0 + ART_H, x0 : x0 + ART_W] = 0
            pages[0].artefacts.append((x0, y0, x0 + ART_W, y0 + ART_H))
    if skew_dd:
        from .geometry import rotate_image

        for p in pages:
            p.image = rotate_image(p.image, skew_dd / 10.0)
    if rotation:
        # rotated scans: image stored rotated; GT boxes stay in the
        # upright frame (the pipeline's detect_orientation path must
        # recover the upright page before extracting)
        k = (rotation // 90) % 4
        for p in pages:
            p.image = np.ascontiguousarray(np.rot90(p.image, k))
    return pages


def count_pages(media_ref: str, scale: int = SCALE) -> int:
    """Number of pages :func:`rasterize_synth` would produce — same wrap
    arithmetic, no pixel painting (cheap; used by bench for pages/s)."""
    text, page_w, page_h, cols, n_art, _rot, _table, _sk = decode_media_ref(media_ref)
    if _table is not None:
        words_all = [w for w in text.split(" ") if w]
        # cell words live on page 0's table; count_pages only needs the flow
        text = " ".join(words_all[_table[0] * _table[1] :])
    words = [w for w in text.split(" ") if w]
    margin_x, margin_y = skew_margins(page_w, page_h, _sk)
    col_spans = _layout_columns(page_w, cols, margin_x)
    usable_h = page_h - (ART_BAND if n_art else 0)
    max_lines = max(1, (usable_h - 2 * margin_y + LINE_LEAD) // LINE_PITCH)
    pages, col_i, line_i = 1, 0, 0
    x = col_spans[0][0]
    for w in words:
        ww = word_width(w, scale)
        cx0, cx1 = col_spans[col_i]
        if ww > cx1 - cx0:
            keep = max(1, (cx1 - cx0 + 1 * scale) // (6 * scale))
            ww = word_width(w[:keep], scale)
        if x + ww > cx1:
            line_i += 1
            x = cx0
            if line_i >= max_lines:
                col_i += 1
                line_i = 0
                if col_i >= len(col_spans):
                    pages += 1
                    col_i = 0
                    x = col_spans[0][0]
                else:
                    x = col_spans[col_i][0]
        x += ww + WORD_GAP
    return pages


def synth_ground_truth_text(media_ref: str) -> str:
    """The exact text the OCR pipeline must recover from this asset."""
    text = decode_media_ref(media_ref)[0]
    return " ".join(w for w in text.split(" ") if w)
