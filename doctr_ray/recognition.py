"""CRNN-style text recognition — batched template scoring, deterministic.

Mirrors the reference recognition contract (reference:
recognition/predictor/pytorch.py:44-85 — crops in, ``(text, confidence)``
out, with wide crops split into overlapping slices before the model and
re-merged after; recognition/crnn/pytorch.py:48-93 CTC best-path decode
with min-probability confidence). Without torch, the "model" is a
fixed-pitch segmentation (the analog of CTC's fixed downsample grid)
followed by one batched nearest-template matmul over the whole batch of
character cells — the same vectorized-inference shape as a real
recognition head.

Split/merge semantics re-expressed from reference
recognition/predictor/_utils.py:16-136 and recognition/utils.py:12-91
(Hamming-alignment overlap merge), with one engine-specific change:
split boundaries snap to the font's character pitch so slices stay
grid-aligned (the reference's CNN is shift-tolerant; a template matcher
is not). Doctest fixtures from the reference are preserved verbatim as
unit-test expectations (tests/test_recognition.py).
"""

from __future__ import annotations

import numpy as np

from .glyphs import CHAR_H, CHAR_PITCH, CHAR_SPACE, CHAR_W, template_matrix

# Reference defaults: critical_ar=8, target_ar=6, split overlap 0.5
# (recognition/predictor/pytorch.py:40-42).
CRITICAL_AR = 8.0
TARGET_AR = 6
SPLIT_OVERLAP = 0.5
INK_THRESH = 128


def hamming(a: str, b: str) -> int:
    """Hamming distance of equal-length strings (rapidfuzz-free)."""
    if len(a) != len(b):
        raise ValueError("hamming requires equal lengths")
    return sum(x != y for x, y in zip(a, b))


def merge_strings(a: str, b: str, overlap_ratio: float) -> str:
    """Merge two overlapping character sequences by Hamming alignment.

    Same contract as reference recognition/utils.py:12-65:

    >>> merge_strings('abcd', 'cdefgh', 0.5)
    'abcdefgh'
    >>> merge_strings('abcdi', 'cdefgh', 0.5)
    'abcdefgh'
    """
    if min(len(a), len(b)) <= 1:
        return a + b
    # the boundary characters of each slice may be cut by the split
    a_core, b_core = a[:-1], b[1:]
    max_ov = min(len(a_core), len(b_core))
    dists = [hamming(a_core[-k:], b_core[:k]) for k in range(1, max_ov + 1)]
    exact = [i for i, d in enumerate(dists) if d == 0]
    expected = round(len(b) * overlap_ratio) - 3  # cropping + 0-based adjust

    if len(exact) == 1:
        i = exact[0]
        return a_core + b_core[i + 1 :]
    if len(exact) > 1:  # repeated-character ambiguity: pick nearest expected
        i = min(exact, key=lambda x: abs(x - expected))
        return a_core + b_core[i + 1 :]
    if expected < -1:
        return a + b
    if expected < 0:
        return a_core + b_core
    blended = [d + abs(i - expected) for i, d in enumerate(dists)]
    i = blended.index(min(blended))
    return a_core + b_core[i + 1 :]


def merge_multi_strings(parts: list[str], overlap_ratio: float, last_overlap_ratio: float) -> str:
    """Left-fold of :func:`merge_strings` over ordered slices.

    >>> merge_multi_strings(['abc', 'bcdef', 'difghi', 'aijkl'], 0.5, 0.1)
    'abcdefghijkl'
    """
    if not parts:
        return ""
    out = parts[0]
    for i in range(1, len(parts)):
        ratio = last_overlap_ratio if i == len(parts) - 1 else overlap_ratio
        out = merge_strings(out, parts[i], ratio)
    return out


def split_crop_spans(
    width: int,
    height: int,
    max_ratio: float = CRITICAL_AR,
    target_ratio: int = TARGET_AR,
    overlap_ratio: float = SPLIT_OVERLAP,
) -> tuple[list[tuple[int, int]], float, float]:
    """Column spans to slice a wide crop into, char-pitch aligned.

    Returns ``(spans, part_overlap_ratio, last_overlap_ratio)`` where
    ``spans`` is ``[(x0, x1), ...]`` (one span == no split). Ratios feed
    :func:`merge_multi_strings` exactly like the reference's
    ``split_crops``/``remap_preds`` pair (_utils.py:16-136).
    """
    if width / max(1, height) <= max_ratio:
        return [(0, width)], 0.0, 0.0
    n_chars = max(1, round((width + CHAR_SPACE) / CHAR_PITCH))
    # chars per slice s.t. slice AR ~ target_ratio
    tc = max(2, int((target_ratio * height + CHAR_SPACE) // CHAR_PITCH))
    if tc >= n_chars:
        return [(0, width)], 0.0, 0.0
    oc = max(1, int(tc * overlap_ratio))
    step = max(1, tc - oc)
    starts = list(range(0, n_chars - tc + 1, step))
    if starts[-1] + tc < n_chars:
        starts.append(n_chars - tc)
    spans = [(s * CHAR_PITCH, min(width, (s + tc) * CHAR_PITCH - CHAR_SPACE)) for s in starts]
    last_ov = 0.0
    if len(starts) > 1:
        last_ov = (starts[-2] + tc - starts[-1]) / tc
    return spans, oc / tc, last_ov


class GlyphRecognizer:
    """The stateful recognition "model": templates built once.

    In the Ray pipeline this object lives inside a ``map_batches`` actor
    (built once per worker in ``__init__``, the analog of loading CRNN
    weights + vocab once — reference models/utils/pytorch.py:41).
    """

    def __init__(self, weights=None) -> None:
        self.templates, self.vocab = template_matrix()
        self.t_sq = (self.templates**2).sum(axis=1)  # (K,)
        self.cell_px = float(CHAR_H * CHAR_W)
        # optional checkpoint (path / ObjectRef / dict): per-template
        # distance affine, loaded ONCE here — the torch-weights analog
        # (reference models/utils/pytorch.py:41); identity blob leaves
        # every prediction unchanged (tested)
        self.d_scale = self.d_bias = None
        if weights is not None:
            from .weights import load_weights

            w = load_weights(weights)
            self.d_scale = np.asarray(w["template_scale"], np.float64)
            self.d_bias = np.asarray(w["template_bias"], np.float64)

    def _cells(self, crop: np.ndarray) -> np.ndarray:
        """Crop (H,W) uint8 -> (n_chars, CHAR_H*CHAR_W) float32 ink cells.

        Vectorized: pad the crop to a whole number of pitch cells and
        reshape — one slice per crop instead of one per character."""
        h, w = crop.shape[:2]
        if h != CHAR_H:  # nearest-neighbor vertical rescale (robustness path)
            idx = (np.arange(CHAR_H) * h / CHAR_H).astype(np.int64)
            crop = crop[idx]
        # ceil: pitch-exact crops give w = n*PITCH - SPACE; odd widths
        # (best-effort fallbacks) must still fit inside the padding
        n = max(1, int(-(-w // CHAR_PITCH)))
        padded = np.zeros((CHAR_H, n * CHAR_PITCH), dtype=np.float32)
        padded[:, :w] = crop < INK_THRESH
        # (H, n, pitch) -> (n, H, char_w)
        cells = padded.reshape(CHAR_H, n, CHAR_PITCH).transpose(1, 0, 2)[:, :, :CHAR_W]
        return np.ascontiguousarray(cells).reshape(n, -1)

    def _mask_cells(self, mask: np.ndarray, crop_shape: tuple[int, int]) -> np.ndarray:
        """Known-pixel mask -> per-character cells, same slicing as
        :meth:`_cells`; pitch padding counts as known background."""
        h, w = crop_shape[:2]
        m = mask.astype(np.float32)
        if mask.shape[0] != CHAR_H:
            idx = (np.arange(CHAR_H) * mask.shape[0] / CHAR_H).astype(np.int64)
            m = m[idx]
        n = max(1, int(-(-w // CHAR_PITCH)))
        padded = np.ones((CHAR_H, n * CHAR_PITCH), dtype=np.float32)
        padded[:, :w] = m[:, :w]
        cells = padded.reshape(CHAR_H, n, CHAR_PITCH).transpose(1, 0, 2)[:, :, :CHAR_W]
        return np.ascontiguousarray(cells).reshape(n, -1)

    def recognize_batch(
        self,
        crops: list[np.ndarray],
        shift_search: bool = False,
        masks: list[np.ndarray] | None = None,
    ) -> list[tuple[str, float]]:
        """Batch of crops -> [(text, confidence)].

        All character cells across the batch are scored against the
        template matrix in a single matmul (the batched-inference hot
        path); confidence is the min per-character score, per the CTC
        min-probability contract (crnn/pytorch.py:86-91).

        ``shift_search=True`` additionally tries the 8 one-pixel
        translations of each crop and keeps the best-confidence read —
        the tolerance knob for resampled inputs (deskewed scans), where
        tight boxes can be off by a pixel. 9x cost; off on the exact
        path.

        ``masks`` (one bool array per crop, True = pixel is known)
        restricts template scoring to known pixels — the exact-skew
        reconstruction path (doctr_ray.skew): an exact match on every
        sampled pixel scores distance 0 -> confidence 1.0.
        """
        if shift_search:
            out: list[tuple[str, float]] = []
            for crop in crops:
                h, w = crop.shape[:2]
                pad = np.full((h + 2, w + 2), 255, dtype=crop.dtype)
                pad[1 : 1 + h, 1 : 1 + w] = crop
                variants = [
                    pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                    for dy in (0, -1, 1)
                    for dx in (0, -1, 1)
                ]
                preds = self.recognize_batch(variants)
                out.append(max(preds, key=lambda p: p[1]))
            return out
        if not crops:
            return []
        per_crop = [self._cells(c) for c in crops]
        counts = [c.shape[0] for c in per_crop]
        cells = np.concatenate(per_crop, axis=0)  # (M, 98)
        if masks is not None:
            mcells = np.concatenate(
                [self._mask_cells(m, c.shape) for m, c in zip(masks, crops)], axis=0
            )
            # masked squared distance: values are {0,1}, so
            # d = sum(m*c) - 2*(m*c)@T + m@T  (two matmuls)
            mc = mcells * cells
            d = mc.sum(axis=1, keepdims=True) - 2.0 * (mc @ self.templates.T)
            d += mcells @ self.templates.T
        else:
            # squared L2 distance via one matmul
            d = self.t_sq[None, :] - 2.0 * (cells @ self.templates.T)
            d += (cells**2).sum(axis=1, keepdims=True)
        if self.d_scale is not None:
            d = d * self.d_scale[None, :] + self.d_bias[None, :]
        best = d.argmin(axis=1)
        conf = 1.0 - np.sqrt(np.maximum(d[np.arange(len(best)), best], 0.0)) / np.sqrt(self.cell_px)
        out: list[tuple[str, float]] = []
        pos = 0
        for n in counts:
            idxs = best[pos : pos + n]
            text = "".join(self.vocab[i] for i in idxs)
            c = float(conf[pos : pos + n].min()) if n else 0.0
            out.append((text, c))
            pos += n
        return out


# ---------------------------------------------- reference split contract


def split_crops(
    crops: list[np.ndarray],
    max_ratio: float,
    target_ratio: int,
    split_overlap_ratio: float,
) -> tuple[list[np.ndarray], list, bool]:
    """Split wide crops into overlapping slices — the REFERENCE'S split
    contract (models/recognition/predictor/_utils.py:16-68), verified
    slice-for-slice by the differential parity test. The engine's
    internal fast path (:func:`split_crop_spans`) computes the same
    spans pitch-aligned without materializing slices; this function
    exists for API parity and external callers.

    Returns (new_crops, crop_map, remap_required) where crop_map
    entries are either an int (unsplit crop index) or
    (start, end, last_overlap_ratio).
    """
    import math

    if split_overlap_ratio <= 0.0 or split_overlap_ratio >= 1.0:
        raise ValueError(
            f"Valid range for split_overlap_ratio is (0.0, 1.0), but is: {split_overlap_ratio}"
        )
    out: list[np.ndarray] = []
    crop_map: list = []
    remap_required = False
    for crop in crops:
        h, w = crop.shape[:2]
        if h and w / h > max_ratio:
            split_w = max(1, math.ceil(h * target_ratio))
            overlap_w = max(0, math.floor(split_w * split_overlap_ratio))
            if w <= split_w:
                slices, last_ov = [crop], 0.0
            else:
                step = split_w - overlap_w
                starts = list(range(0, w - split_w + 1, step))
                if starts[-1] + split_w < w:
                    starts.append(w - split_w)
                slices = [crop[:, s : s + split_w] for s in starts]
                last = (starts[-2] + split_w) - starts[-1] if len(starts) > 1 else 0
                last_ov = last / split_w if split_w else 0.0
            slices = [s for s in slices if all(d > 0 for d in s.shape)]
            if slices:
                crop_map.append((len(out), len(out) + len(slices), last_ov))
                out.extend(slices)
                remap_required = True
            else:
                crop_map.append(len(out))
                out.append(crop)
        else:
            crop_map.append(len(out))
            out.append(crop)
    return out, crop_map, remap_required


def remap_preds(
    preds: list[tuple[str, float]],
    crop_map: list,
    overlap_ratio: float,
) -> list[tuple[str, float]]:
    """Reassemble per-slice predictions into per-crop predictions
    (reference models/recognition/predictor/_utils.py:110-140): split
    parts merge through :func:`merge_multi_strings` with the split's
    recorded last-overlap ratio; confidence is the slice average."""
    out: list[tuple[str, float]] = []
    for item in crop_map:
        if isinstance(item, int):
            out.append(preds[item])
        else:
            start, end, last_ov = item
            texts = [t for t, _ in preds[start:end]]
            confs = [c for _, c in preds[start:end]]
            out.append((merge_multi_strings(texts, overlap_ratio, last_ov), sum(confs) / len(confs)))
    return out
