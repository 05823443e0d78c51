"""Visualization — dependency-free overlays and image dumps.

The reference draws detection overlays with matplotlib
(reference utils/visualization.py:112-420 — visualize_page /
draw_boxes). This container has no matplotlib or PIL, so the analog is
pure numpy: boxes are burned into a copy of the page as outline
rectangles (``draw_boxes``), and images dump to PGM/PPM — formats
writable without any codec — so a cluster job can emit inspectable
artifacts next to its parquet output (``save_pgm``).
"""

from __future__ import annotations

import numpy as np


def draw_boxes(
    image: np.ndarray,
    rel_boxes: np.ndarray,
    value: int = 0,
    thickness: int = 1,
) -> np.ndarray:
    """Burn (N, 4) relative [x0, y0, x1, y1] box OUTLINES into a copy of
    a grayscale page (draw_boxes analog, reference
    utils/visualization.py:402-420 — cv2.rectangle there)."""
    out = image.copy()
    H, W = out.shape[:2]
    b = np.asarray(rel_boxes, dtype=np.float64).reshape(-1, 4)
    xs = np.clip(np.round(b[:, [0, 2]] * W).astype(np.int64), 0, W - 1)
    ys = np.clip(np.round(b[:, [1, 3]] * H).astype(np.int64), 0, H - 1)
    t = max(1, thickness)
    for (x0, x1), (y0, y1) in zip(xs, ys):
        out[y0 : y0 + t, x0 : x1 + 1] = value
        out[max(0, y1 - t + 1) : y1 + 1, x0 : x1 + 1] = value
        out[y0 : y1 + 1, x0 : x0 + t] = value
        out[y0 : y1 + 1, max(0, x1 - t + 1) : x1 + 1] = value
    return out


def visualize_page(
    page_export: dict,
    image: np.ndarray,
    words: bool = True,
    lines: bool = False,
    blocks: bool = False,
) -> np.ndarray:
    """Overlay a builder export's geometry onto its page image
    (visualize_page analog, reference utils/visualization.py:155-330;
    returns the annotated array instead of a matplotlib figure).
    Word boxes darkest, line boxes mid, block boxes light."""
    out = image.copy()
    for block in page_export.get("blocks", []):
        if blocks:
            out = draw_boxes(out, np.asarray([block["geometry"]]), value=192, thickness=2)
        for line in block.get("lines", []):
            if lines:
                out = draw_boxes(out, np.asarray([line["geometry"]]), value=128)
            if words:
                geoms = [w["geometry"] for w in line.get("words", [])]
                if geoms:
                    out = draw_boxes(out, np.asarray(geoms), value=0)
    return out


def save_pgm(image: np.ndarray, path: str) -> str:
    """Write a grayscale uint8 image as binary PGM (P5) — viewable
    anywhere, zero codec dependencies."""
    img = np.ascontiguousarray(image.astype(np.uint8))
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode("ascii"))
        f.write(img.tobytes())
    return path


def load_pgm(path: str) -> np.ndarray:
    """Read back a binary PGM written by :func:`save_pgm`."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"P5":
            raise ValueError(f"not a binary PGM: {magic!r}")
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        maxval = int(f.readline())
        if maxval != 255:
            raise ValueError("only 8-bit PGM supported")
        return np.frombuffer(f.read(w * h), dtype=np.uint8).reshape(h, w)
