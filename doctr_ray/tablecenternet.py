"""Numpy forward pass for the reference TableCenterNet table tower.

The reference's ``tablecenternet`` architecture (table_structure/
tablecenternet/pytorch.py:133-522 model — StarNet backbone +
DCNv2 DLA/IDA decoder + six dense heads hm/reg/ct2cn/cn2ct/lc/sp +
key-point decode; backbone classification/starnet/pytorch.py:57-135
StarNet "Rewrite the Stars" blocks; deformable conv modules/layers/
pytorch.py:84-195 _deform_conv2d + DCNv2; postprocessor
table_structure/tablecenternet/base.py:21-206; predictor
table_structure/predictor/pytorch.py:19-80) re-implemented
layer-for-layer as pure-numpy INFERENCE so a real torch checkpoint —
converted to ``.npz`` with the same state-dict key names — runs inside
this engine's table actors without torch in the container:

- StarNet: ConvBN stem (stride 2) + four down-sampling stages of
  star blocks (7x7 depthwise -> relu6(f1) * f2 -> 1x1 project ->
  7x7 depthwise -> residual); the five tapped maps (stem + stages)
  feed the decoder
- DCNv2 deformable conv: a regular conv predicts per-kernel-position
  offsets + sigmoid modulation, sampling via bilinear grid_sample
  with ALIGN_CORNERS=TRUE and zero padding (modules/layers/
  pytorch.py:115-139 — note the different corner convention from
  LW-DETR's deformable attention)
- DLAUp / IDAUp aggregation: per-channel grouped transposed-conv
  upsampling (kernel 2f, stride f, pad f//2) + DeformConv project /
  node fusion, then a final IDAUp over the three finest maps
- heads: Conv3x3+ReLU+Conv1x1 per head on the stride-4 map
- decode (pytorch.py:228-301): 3x3 max-pool NMS on the sigmoid
  heatmaps, top-k centers/corners, sub-pixel reg offsets, the 8-vector
  center->corner / corner->center polygons, span + logical gathers
- postprocessor (base.py:82-206): corner relocation (nearest corner
  of each overlapping high-score corner polygon snaps the cell
  corner), per-corner logical coordinates resolved through the span
  (base.py:21-57 _get_logic_coords), score decay for cells optimized
  on <= 2 corners, relative-coordinate output — shapely's
  ``contains_xy`` replaced by an even-odd ray-casting test

Training (focal/vector-pair/logical losses and the scipy-interpolated
dense targets) is the reference's training harness, out of scope like
the other towers' losses.

Weights load once per actor through :mod:`doctr_ray.weights`
(path / object-store ref / dict), the same contract as CRNN/LW-DETR.
:func:`random_tablecenternet_weights` builds a reduced-size fixed-seed
checkpoint with the exact torch key set for parity tests and fixtures.
"""

from __future__ import annotations

import numpy as np

from .dbnet import conv2d
from .lwdetr import order_points

# ---------------------------------------------------------------- kernels


def relu6(x: np.ndarray) -> np.ndarray:
    """``nn.ReLU6``: clip to [0, 6]."""
    return np.clip(x, 0.0, 6.0)


def conv_bn(
    x: np.ndarray, p: dict, prefix: str, stride: int = 1, pad: int = 0,
    groups: int = 1, eps: float = 1e-5,
) -> np.ndarray:
    """StarNet ConvBN (starnet/pytorch.py:35-55): conv WITH bias
    (nn.Conv2d default — the reference keeps it even before BN),
    then BatchNorm2d when the checkpoint carries one."""
    w = p[f"{prefix}.conv.weight"]
    b = p.get(f"{prefix}.conv.bias")
    if groups > 1:
        out = depthwise_conv2d(x, w, b, pad=pad)
    else:
        out = conv2d(x, w, b, stride=stride, pad=pad)
    if f"{prefix}.bn.weight" in p:
        g = p[f"{prefix}.bn.weight"]
        be = p[f"{prefix}.bn.bias"]
        m = p[f"{prefix}.bn.running_mean"]
        v = p[f"{prefix}.bn.running_var"]
        scale = (g / np.sqrt(v + eps)).astype(out.dtype)
        shift = (be - m * g / np.sqrt(v + eps)).astype(out.dtype)
        out = out * scale[None, :, None, None] + shift[None, :, None, None]
    return out


def depthwise_conv2d(x: np.ndarray, w: np.ndarray, b=None, pad: int = 0) -> np.ndarray:
    """Depthwise (groups == channels) conv, stride 1: one (kh, kw)
    filter per channel, w shape (C, 1, kh, kw)."""
    B, C, H, W = x.shape
    kh, kw = w.shape[2], w.shape[3]
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    out = np.einsum("bchwkl,ckl->bchw", win, w[:, 0].astype(x.dtype))
    if b is not None:
        out += b.astype(x.dtype)[None, :, None, None]
    return out


def conv_transpose2d_grouped(
    x: np.ndarray, w: np.ndarray, stride: int, padding: int
) -> np.ndarray:
    """Per-channel ``nn.ConvTranspose2d(o, o, k, stride, padding,
    groups=o, bias=False)`` (IDAUp's up_*, layers — torch weight
    shape (C, 1, k, k)): zero-stuff by the stride, pad by k-1-p,
    correlate with the flipped kernel per channel."""
    B, C, H, W = x.shape
    k = w.shape[2]
    hs, ws = (H - 1) * stride + 1, (W - 1) * stride + 1
    stuffed = np.zeros((B, C, hs, ws), x.dtype)
    stuffed[:, :, ::stride, ::stride] = x
    pad = k - 1 - padding
    stuffed = np.pad(stuffed, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    win = np.lib.stride_tricks.sliding_window_view(stuffed, (k, k), axis=(2, 3))
    return np.einsum("bchwkl,ckl->bchw", win, w[:, 0, ::-1, ::-1].astype(x.dtype))


def grid_sample_bilinear_ac(value: np.ndarray, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` with per-pixel normalized coords gx/gy of
    shape (N, Ho, Wo) over value (N, C, H, W) -> (N, C, Ho, Wo).
    align_corners=True maps -1 -> 0 and +1 -> size-1
    (modules/layers/pytorch.py:133-135)."""
    N, C, H, W = value.shape
    px = (gx + 1.0) * 0.5 * (W - 1)
    py = (gy + 1.0) * 0.5 * (H - 1)
    x0 = np.floor(px).astype(np.int64)
    y0 = np.floor(py).astype(np.int64)
    wx = (px - x0).astype(value.dtype)
    wy = (py - y0).astype(value.dtype)
    vf = value.reshape(N, C, H * W)
    Ho, Wo = gx.shape[1], gx.shape[2]
    out = np.zeros((N, C, Ho, Wo), value.dtype)
    for dx, dy, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi, yi = x0 + dx, y0 + dy
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = np.clip(yi, 0, H - 1) * W + np.clip(xi, 0, W - 1)
        gathered = np.take_along_axis(
            vf, idx.reshape(N, 1, Ho * Wo), axis=2
        ).reshape(N, C, Ho, Wo)
        out += gathered * (wgt * valid)[:, None]
    return out


def dcn_v2(x: np.ndarray, p: dict, prefix: str) -> np.ndarray:
    """Modulated deformable conv (DCNv2, modules/layers/pytorch.py:
    84-195): a regular conv predicts (2k) offsets + k sigmoid masks;
    each kernel position samples the input at base + offset with
    align_corners=True bilinear, scales by its mask, and contributes
    through a 1x1 slice of the weight. Offsets are (dy, dx) pairs per
    kernel position (torchvision layout)."""
    w = p[f"{prefix}.weight"]  # (Co, C, kh, kw)
    bias = p[f"{prefix}.bias"]
    om = conv2d(
        x, p[f"{prefix}.conv_offset_mask.weight"], p[f"{prefix}.conv_offset_mask.bias"],
        stride=1, pad=1,
    )
    kh, kw = w.shape[2], w.shape[3]
    nk = kh * kw
    offset = om[:, : 2 * nk]
    mask = 1.0 / (1.0 + np.exp(-om[:, 2 * nk :]))
    B, C, H, W = x.shape
    ho, wo = om.shape[2], om.shape[3]
    base_y = (np.arange(ho, dtype=x.dtype) - 1).reshape(1, ho, 1)  # stride 1, pad 1
    base_x = (np.arange(wo, dtype=x.dtype) - 1).reshape(1, 1, wo)
    norm_y, norm_x = max(H - 1, 1), max(W - 1, 1)
    out = np.zeros((B, w.shape[0], ho, wo), x.dtype)
    for ki in range(kh):
        for kj in range(kw):
            k = ki * kw + kj
            sy = base_y + ki + offset[:, 2 * k]
            sx = base_x + kj + offset[:, 2 * k + 1]
            sampled = grid_sample_bilinear_ac(
                x, 2.0 * sx / norm_x - 1.0, 2.0 * sy / norm_y - 1.0
            )
            sampled = sampled * mask[:, k : k + 1]
            out += np.einsum("bchw,oc->bohw", sampled, w[:, :, ki, kj].astype(x.dtype))
    return out + bias.astype(x.dtype)[None, :, None, None]


def deform_conv_block(x: np.ndarray, p: dict, prefix: str, eps: float = 1e-5) -> np.ndarray:
    """DeformConv (tablecenternet/pytorch.py:53-67): DCNv2 then
    BatchNorm + ReLU (``actf``)."""
    out = dcn_v2(x, p, f"{prefix}.conv")
    g = p[f"{prefix}.actf.0.weight"]
    be = p[f"{prefix}.actf.0.bias"]
    m = p[f"{prefix}.actf.0.running_mean"]
    v = p[f"{prefix}.actf.0.running_var"]
    scale = (g / np.sqrt(v + eps)).astype(out.dtype)
    shift = (be - m * g / np.sqrt(v + eps)).astype(out.dtype)
    out = out * scale[None, :, None, None] + shift[None, :, None, None]
    return np.maximum(out, 0)


def maxpool3x3_same(x: np.ndarray) -> np.ndarray:
    """3x3 max pool, stride 1, pad 1 (the decode's key-point NMS)."""
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-np.inf)
    win = np.lib.stride_tricks.sliding_window_view(xp, (3, 3), axis=(2, 3))
    return win.max(axis=(4, 5))


def points_in_polygon(poly: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Even-odd ray-casting interior test of (M, 2) points against an
    (N, 2) polygon — the shapely ``contains_xy`` stand-in used by the
    relocation step (base.py:142)."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        crosses = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (x < np.where(crosses, xint, np.inf))
    return inside


# ------------------------------------------------------------- decode


def _topk_keypoints(heat: np.ndarray, k: int):
    """Single-channel top-k after 3x3 NMS (pytorch.py:228-246):
    returns (scores, flat indexes, xs, ys), sorted by score
    descending like torch.topk."""
    B, _, H, W = heat.shape
    k = min(k, H * W)
    hmax = maxpool3x3_same(heat)
    kept = heat * (hmax == heat)
    flat = kept.reshape(B, -1)
    inds = np.argsort(-flat, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(flat, inds, axis=1)
    ys = (inds // W).astype(np.float32)
    xs = (inds % W).astype(np.float32)
    return scores, inds, xs, ys


def _gather_rows(feat_map: np.ndarray, inds: np.ndarray) -> np.ndarray:
    """(B, C, H, W) + flat (B, K) -> (B, K, C) (the reference's
    _transpose_and_gather_feat, pytorch.py:43-47)."""
    B, C = feat_map.shape[0], feat_map.shape[1]
    flat = feat_map.reshape(B, C, -1)
    return np.take_along_axis(
        flat, inds[:, None, :].repeat(C, axis=1), axis=2
    ).transpose(0, 2, 1)


def polygons_decode(heatmap: np.ndarray, vec: np.ndarray, reg: np.ndarray, k: int):
    """Key-points -> quadrilaterals (pytorch.py:228-265): top-k peaks,
    sub-pixel reg offsets, corners at (x, y) - vec pairs."""
    scores, inds, xs, ys = _topk_keypoints(heatmap, k)
    offset = _gather_rows(reg, inds)  # (B, K, 2)
    xs = xs + offset[..., 0]
    ys = ys + offset[..., 1]
    v = _gather_rows(vec, inds)  # (B, K, 8)
    polys = np.stack(
        [xs - v[..., 0], ys - v[..., 1], xs - v[..., 2], ys - v[..., 3],
         xs - v[..., 4], ys - v[..., 5], xs - v[..., 6], ys - v[..., 7]],
        axis=2,
    )
    return scores, inds, xs, ys, polys


def resolve_logic_coords(lc_logic: np.ndarray, col_span: int, row_span: int):
    """Per-corner logical [col, row] predictions + spans -> the cell's
    (start_col, end_col, start_row, end_row) (base.py:21-57: aligned
    corner pairs win, else the rounded mean of the tighter pair)."""
    col_span, row_span = max(1, col_span), max(1, row_span)
    cols, rows = lc_logic[:, 0], lc_logic[:, 1]
    ci = [max(1, int(round(float(c)))) for c in cols]
    ri = [max(1, int(round(float(r)))) for r in rows]
    if ci[0] == ci[3]:
        start_col = ci[0]
        end_col = start_col + col_span - 1
    elif ci[1] == ci[2]:
        end_col = max(col_span + 1, ci[1]) - 1
        start_col = end_col + 1 - col_span
    elif abs(cols[0] - cols[3]) <= abs(cols[1] - cols[2]):
        start_col = max(1, int(round((cols[0] + cols[3]) / 2.0)))
        end_col = start_col + col_span - 1
    else:
        end_col = max(col_span + 1, int(round((cols[1] + cols[2]) / 2.0))) - 1
        start_col = end_col + 1 - col_span
    if ri[0] == ri[1]:
        start_row = ri[0]
        end_row = start_row + row_span - 1
    elif ri[2] == ri[3]:
        end_row = max(row_span + 1, ri[2]) - 1
        start_row = end_row + 1 - row_span
    elif abs(rows[0] - rows[1]) <= abs(rows[2] - rows[3]):
        start_row = max(1, int(round((rows[0] + rows[1]) / 2.0)))
        end_row = start_row + row_span - 1
    else:
        end_row = max(row_span + 1, int(round((rows[2] + rows[3]) / 2.0))) - 1
        start_row = end_row + 1 - row_span
    return start_col, end_col, start_row, end_row


class TableCenterNetPostProcessorNumpy:
    """Numpy port of the reference TableCenterNetPostProcessor
    (base.py:82-206): corner relocation, logical-coordinate
    resolution, under-optimized-cell score decay, relative output."""

    def __init__(
        self,
        center_thresh: float = 0.3,
        corner_thresh: float = 0.3,
        not_relocate: bool = False,
        assume_straight_pages: bool = True,
    ) -> None:
        self.center_thresh = center_thresh
        self.corner_thresh = corner_thresh
        self.not_relocate = not_relocate
        self.assume_straight_pages = assume_straight_pages
        self.cell_min_optimize_count = 2
        self.cell_decay_thresh = 0.4

    @staticmethod
    def _lookup_logic(lc_map: np.ndarray, x: float, y: float) -> np.ndarray:
        h, w = lc_map.shape[1:]
        xi = min(max(int(x), 0), w - 1) if x >= 0 else 0
        yi = min(max(int(y), 0), h - 1) if y >= 0 else 0
        return lc_map[:, yi, xi]

    def _relocate(self, decoded: dict, b: int):
        cp = decoded["center_polygons"][b].copy()
        cs = decoded["center_scores"][b].copy()
        spans = decoded["center_spans"][b]
        corner_polys = decoded["corner_polygons"][b]
        corner_scores = decoded["corner_scores"][b]
        corner_pts = decoded["corner_points"][b]
        corner_logics = decoded["corner_logics"][b]
        lc_map = decoded["lc"][b]

        valid_c = np.nonzero(cs >= self.center_thresh)[0]
        valid_k = np.nonzero(corner_scores >= self.corner_thresh)[0]
        logic = np.zeros((cp.shape[0], 4), np.int32)
        corner_count = np.zeros(cp.shape[0], np.int32)
        # bbox prefilter of corner candidates per cell (base.py:60-71)
        if valid_k.size:
            kp = corner_polys[valid_k]
            k_box = np.stack(
                [kp[:, 0::2].min(1), kp[:, 1::2].min(1), kp[:, 0::2].max(1), kp[:, 1::2].max(1)],
                axis=1,
            )
        for i in valid_c:
            cell = cp[i].reshape(4, 2)
            origin = decoded["center_polygons"][b][i].reshape(4, 2)
            center_poly = origin if self.not_relocate else cp[i].reshape(4, 2).copy()
            lc_logic: list = [None, None, None, None]
            n_used = n_repeat = 0
            if valid_k.size:
                cx0, cy0 = cell[:, 0].min(), cell[:, 1].min()
                cx1, cy1 = cell[:, 0].max(), cell[:, 1].max()
                overlap = (
                    (k_box[:, 0] <= cx1) & (k_box[:, 2] >= cx0)
                    & (k_box[:, 1] <= cy1) & (k_box[:, 3] >= cy0)
                )
                for j in valid_k[np.nonzero(overlap)[0]]:
                    kx, ky = corner_pts[j]
                    candidates = corner_polys[j].reshape(4, 2)
                    if not points_in_polygon(center_poly, candidates).any():
                        continue
                    # the nearest corner index comes from the ORIGINAL
                    # (un-relocated) polygon (base.py:144-145)
                    idx = int(np.argmin(((origin - [kx, ky]) ** 2).sum(1)))
                    ox, oy = origin[idx]
                    px, py = cell[idx]
                    if px == ox and py == oy:
                        n_used += 1
                        cell[idx] = [kx, ky]
                        lc_logic[idx] = corner_logics[j]
                    elif (ox - px) ** 2 + (oy - py) ** 2 >= (ox - kx) ** 2 + (oy - ky) ** 2:
                        n_repeat += 1
                        cell[idx] = [kx, ky]
                        lc_logic[idx] = corner_logics[j]
            corner_count[i] = n_used + n_repeat
            for c in range(4):
                if lc_logic[c] is None:
                    lc_logic[c] = self._lookup_logic(lc_map, cell[c][0], cell[c][1])
            logic[i] = resolve_logic_coords(
                np.stack(lc_logic),
                int(round(float(spans[i][0]))),
                int(round(float(spans[i][1]))),
            )
            cp[i] = cell.reshape(8)
        # under-optimized cells decay, then re-sort (base.py:164-169)
        decay = (cs >= self.center_thresh) & (corner_count <= self.cell_min_optimize_count)
        cs[decay] *= self.cell_decay_thresh
        order = np.argsort(-cs, kind="stable")
        return cp[order], cs[order], logic[order]

    def _simple(self, decoded: dict, b: int):
        cp = decoded["center_polygons"][b]
        cs = decoded["center_scores"][b]
        spans = decoded["center_spans"][b]
        lc_map = decoded["lc"][b]
        logic = np.zeros((cp.shape[0], 4), np.int32)
        for i in np.nonzero(cs >= self.center_thresh)[0]:
            cell = cp[i].reshape(4, 2)
            lc_logic = np.stack(
                [self._lookup_logic(lc_map, cell[c][0], cell[c][1]) for c in range(4)]
            )
            logic[i] = resolve_logic_coords(
                lc_logic, int(round(float(spans[i][0]))), int(round(float(spans[i][1])))
            )
        return cp, cs, logic

    def __call__(self, decoded: dict) -> list[dict]:
        feat_h, feat_w = decoded["feat_size"]
        scale = np.array([feat_w, feat_h], np.float32)
        results = []
        for b in range(decoded["center_polygons"].shape[0]):
            cp, cs, logic = (
                self._simple(decoded, b) if self.not_relocate else self._relocate(decoded, b)
            )
            keep = cs >= self.center_thresh
            polys = np.clip((cp[keep].reshape(-1, 4, 2) / scale).astype(np.float32), 0, 1)
            if self.assume_straight_pages:
                cells = np.concatenate([polys.min(axis=1), polys.max(axis=1)], axis=1)
            else:
                cells = (
                    np.stack([order_points(q) for q in polys]).astype(np.float32)
                    if len(polys)
                    else polys.reshape(0, 4, 2)
                )
            results.append(
                {
                    "polygons": cells.astype(np.float32),
                    "scores": cs[keep].astype(np.float32),
                    # 0-indexed (start_col, end_col, start_row, end_row)
                    "logical": (logic[keep] - 1).astype(np.int32),
                }
            )
        return results


# ------------------------------------------------------------- the tower


class TableCenterNetNumpy:
    """Numpy ``tablecenternet`` table-structure inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once here by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict of the reference TableCenterNet (``feat_extractor.*``
    StarNet stem + stages, ``dla_up.ida_*``/``ida_up`` deformable
    aggregation, per-head ``hm/reg/ct2cn/cn2ct/lc/sp``) so
    ``{k: v.numpy() for k, v in sd.items()}`` of a real checkpoint is
    a valid blob. Stage depths and channel widths are inferred from
    the blob; the head set and the level window are ctor args.
    """

    #: table normalization (tablecenternet/pytorch.py:26-28)
    MEAN = np.array([0.798, 0.785, 0.772], np.float32)
    STD = np.array([0.264, 0.2749, 0.287], np.float32)
    HEADS = ("hm", "reg", "ct2cn", "cn2ct", "lc", "sp")

    def __init__(
        self,
        weights,
        center_thresh: float = 0.3,
        corner_thresh: float = 0.3,
        center_k: int = 3000,
        corner_k: int = 5000,
        not_relocate: bool = False,
        input_size: int = 1024,
        first_level: int = 1,
        last_level: int = 4,
        assume_straight_pages: bool = True,
    ) -> None:
        from .weights import load_weights

        self.params = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        p = self.params
        self.input_size = input_size
        self.first_level, self.last_level = first_level, last_level
        self.center_k, self.corner_k = center_k, corner_k
        self.assume_straight_pages = assume_straight_pages
        # stage count and per-stage block depth from the key set
        self.num_stages = 1 + max(
            int(k.split(".")[1]) for k in p if k.startswith("feat_extractor.")
        )
        self.depths = [
            max(
                (int(k.split(".")[2]) for k in p
                 if k.startswith(f"feat_extractor.{s}.") and k.split(".")[3] == "dwconv"),
                default=0,
            )
            for s in range(1, self.num_stages)
        ]
        self.postprocessor = TableCenterNetPostProcessorNumpy(
            center_thresh=center_thresh,
            corner_thresh=corner_thresh,
            not_relocate=not_relocate,
            assume_straight_pages=assume_straight_pages,
        )

    # -- StarNet backbone --------------------------------------------------
    def _star_block(self, x: np.ndarray, prefix: str) -> np.ndarray:
        """StarNet block (starnet/pytorch.py:57-79): depthwise 7x7 ->
        relu6(f1) * f2 -> project -> depthwise 7x7 -> residual."""
        p = self.params
        identity = x
        x = conv_bn(x, p, f"{prefix}.dwconv", pad=3, groups=x.shape[1])
        x1 = conv_bn(x, p, f"{prefix}.f1")
        x2 = conv_bn(x, p, f"{prefix}.f2")
        x = relu6(x1) * x2
        x = conv_bn(x, p, f"{prefix}.g")
        x = conv_bn(x, p, f"{prefix}.dwconv2", pad=3, groups=x.shape[1])
        return identity + x

    def encoder_features(self, x: np.ndarray) -> list[np.ndarray]:
        """(B, 3, H, W) -> the five tapped maps (stem + four stages,
        strides 2/4/8/16/32)."""
        p = self.params
        out = relu6(conv_bn(x, p, "feat_extractor.0.0", stride=2, pad=1))
        feats = [out]
        for s in range(1, self.num_stages):
            out = conv_bn(out, p, f"feat_extractor.{s}.0", stride=2, pad=1)
            for j in range(1, self.depths[s - 1] + 1):
                out = self._star_block(out, f"feat_extractor.{s}.{j}")
            feats.append(out)
        return feats

    # -- DLA decoder ---------------------------------------------------------
    def _ida(self, prefix: str, layers: list, startp: int, endp: int) -> None:
        """IDAUp forward (tablecenternet/pytorch.py:88-94), mutating
        ``layers`` in place like the reference."""
        p = self.params
        for i in range(startp + 1, endp):
            sub = i - startp
            proj = deform_conv_block(layers[i], p, f"{prefix}.proj_{sub}")
            w_up = p[f"{prefix}.up_{sub}.weight"]
            f = w_up.shape[2] // 2
            layers[i] = conv_transpose2d_grouped(proj, w_up, stride=f, padding=f // 2)
            layers[i] = deform_conv_block(
                layers[i - 1] + layers[i], p, f"{prefix}.node_{sub}"
            )

    def forward_heads(self, x: np.ndarray) -> dict[str, np.ndarray]:
        """Backbone + DLAUp + final IDAUp + the six dense heads
        (pytorch.py:267-274) on the stride-4 map."""
        p = self.params
        feats = self.encoder_features(np.ascontiguousarray(x, np.float32))
        layers = list(feats[self.first_level :])
        # DLAUp (pytorch.py:121-127): repeated in-place IDA sweeps
        out = [layers[-1]]
        for i in range(len(layers) - 1):
            self._ida(f"dla_up.ida_{i}", layers, len(layers) - i - 2, len(layers))
            out.insert(0, layers[-1])
        y = [out[i].copy() for i in range(self.last_level - self.first_level)]
        self._ida("ida_up", y, 0, len(y))
        heads = {}
        for head in self.HEADS:
            h = conv2d(y[-1], p[f"{head}.0.weight"], p[f"{head}.0.bias"], pad=1)
            h = np.maximum(h, 0)
            heads[head] = conv2d(h, p[f"{head}.2.weight"], p[f"{head}.2.bias"])
        return heads

    def decode(self, heads: dict[str, np.ndarray]) -> dict:
        """Raw head maps -> decoded key-point dict (pytorch.py:277-301)."""
        hm = 1.0 / (1.0 + np.exp(-heads["hm"]))
        reg = heads["reg"]
        c_scores, c_ind, _, _, c_poly = polygons_decode(
            hm[:, 0:1], heads["ct2cn"], reg, self.center_k
        )
        k_scores, k_ind, k_xs, k_ys, k_poly = polygons_decode(
            hm[:, 1:2], heads["cn2ct"], reg, self.corner_k
        )
        return {
            "center_polygons": c_poly,
            "center_scores": c_scores,
            "center_spans": _gather_rows(heads["sp"], c_ind),
            "corner_polygons": k_poly,
            "corner_scores": k_scores,
            "corner_points": np.stack([k_xs, k_ys], axis=2),
            "corner_logics": _gather_rows(heads["lc"], k_ind),
            "lc": heads["lc"],
            "feat_size": (hm.shape[2], hm.shape[3]),
        }

    def forward(self, x: np.ndarray) -> list[dict]:
        """(B, 3, S, S) normalized -> per-image
        {polygons, scores, logical} (the reference's ``preds``)."""
        return self.postprocessor(self.decode(self.forward_heads(x)))

    # -- crop API (TablePredictor analog) ------------------------------------
    def preprocess(self, crop: np.ndarray) -> tuple[np.ndarray, tuple]:
        from .geometry import resize_aspect_pad

        if crop.ndim == 2:
            crop = np.repeat(crop[:, :, None], 3, axis=2)
        S = self.input_size
        chans, padding = [], (0, 0, 0, 0)
        for c in range(3):
            resized, padding = resize_aspect_pad(crop[:, :, c], (S, S), pad_value=0)
            chans.append(resized)
        img = np.stack(chans).astype(np.float32) / 255.0
        img = (img - self.MEAN[:, None, None]) / self.STD[:, None, None]
        return img, padding

    def __call__(self, crops: list[np.ndarray]) -> list[dict]:
        """Table crops -> [{cells, num_rows, num_cols}] — the
        reference TablePredictor contract (table_structure/predictor/
        pytorch.py:37-80), with padding removed from the relative
        cell geometry."""
        from .geometry import remove_padding_coords

        results = []
        for crop in crops:
            img, padding = self.preprocess(crop)
            pred = self.forward(img[None])[0]
            polys = pred["polygons"]
            if self.assume_straight_pages and len(polys):
                polys = remove_padding_coords(
                    polys, (self.input_size, self.input_size), padding
                )
            cells, max_row, max_col = [], -1, -1
            for poly, score, lc in zip(polys, pred["scores"], pred["logical"]):
                start_col, end_col, start_row, end_row = (int(v) for v in lc)
                max_row, max_col = max(max_row, end_row), max(max_col, end_col)
                cells.append(
                    {
                        "geometry": np.asarray(poly).tolist(),
                        "score": float(score),
                        "row_start": start_row,
                        "row_end": end_row,
                        "col_start": start_col,
                        "col_end": end_col,
                    }
                )
            results.append({"cells": cells, "num_rows": max_row + 1, "num_cols": max_col + 1})
        return results

    def __repr__(self) -> str:
        return (
            f"TableCenterNetNumpy(stages={self.num_stages - 1}, depths={self.depths}, "
            f"input={self.input_size})"
        )


# ---------------------------------------------------------------- fixtures


def random_tablecenternet_weights(
    stem_dim: int = 8,
    base_dim: int = 8,
    depths: tuple[int, ...] = (1, 1, 1, 1),
    head_conv: int = 16,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Reduced-size fixed-seed checkpoint with the exact torch
    state-dict key set of the reference TableCenterNet (StarNet-S3 at
    full size uses stem 32 / base 32 / depths (2, 2, 8, 4) /
    head_conv 256)."""
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, i, k, bias=True, groups=1):
        p[f"{name}.weight"] = (
            rng.standard_normal((o, i // groups, k, k)) * (0.3 / np.sqrt(i * k * k / groups))
        ).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = (rng.standard_normal(o) * 0.01).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = np.zeros(c, np.float32)
        p[f"{name}.running_var"] = np.ones(c, np.float32)

    def conv_bn_(name, o, i, k, groups=1):
        conv(f"{name}.conv", o, i, k, groups=groups)
        bn(f"{name}.bn", o)

    def deform(name, o, i):
        conv(name + ".conv.conv_offset_mask", 27, i, 3)
        p[f"{name}.conv.weight"] = (
            rng.standard_normal((o, i, 3, 3)) * (0.3 / np.sqrt(i * 9))
        ).astype(np.float32)
        p[f"{name}.conv.bias"] = np.zeros(o, np.float32)
        bn(f"{name}.actf.0", o)

    def up(name, o, f):
        # ConvTranspose2d(o, o, 2f, stride=f, pad=f//2, groups=o):
        # torch weight (in, out/groups, k, k) = (o, 1, 2f, 2f)
        p[f"{name}.weight"] = (
            rng.standard_normal((o, 1, 2 * f, 2 * f)) * 0.25
        ).astype(np.float32)

    # StarNet: stem + 4 stages
    conv_bn_("feat_extractor.0.0", stem_dim, 3, 3)
    channels = [stem_dim]
    in_c = stem_dim
    for s, depth in enumerate(depths, start=1):
        dim = base_dim * 2 ** (s - 1)
        channels.append(dim)
        conv_bn_(f"feat_extractor.{s}.0", dim, in_c, 3)
        in_c = dim
        for j in range(1, depth + 1):
            blk = f"feat_extractor.{s}.{j}"
            conv_bn_(f"{blk}.dwconv", dim, dim, 7, groups=dim)
            conv(f"{blk}.f1.conv", 4 * dim, dim, 1)
            conv(f"{blk}.f2.conv", 4 * dim, dim, 1)
            conv_bn_(f"{blk}.g", dim, 4 * dim, 1)
            conv(f"{blk}.dwconv2.conv", dim, dim, 7, groups=dim)
    # DLAUp (first_level=1): ida_i over channels[1:]
    ch = channels[1:]
    in_ch = list(ch)
    scales = np.array([2**i for i in range(len(ch))])
    for i in range(len(ch) - 1):
        j = -i - 2
        o = ch[j]
        ups = (scales[j:] // scales[j]).tolist()
        ins = in_ch[j:]
        for sub in range(1, len(ins)):
            deform(f"dla_up.ida_{i}.proj_{sub}", o, ins[sub])
            deform(f"dla_up.ida_{i}.node_{sub}", o, o)
            up(f"dla_up.ida_{i}.up_{sub}", o, int(ups[sub]))
        scales[j + 1 :] = scales[j]
        in_ch[j + 1 :] = [o for _ in in_ch[j + 1 :]]
    # final IDAUp over the three finest maps
    o = ch[0]
    for sub, (c, f) in enumerate(zip(ch[1:3], (2, 4)), start=1):
        deform(f"ida_up.proj_{sub}", o, c)
        deform(f"ida_up.node_{sub}", o, o)
        up(f"ida_up.up_{sub}", o, f)
    # heads (hm bias at the detection prior, pytorch.py:206-209)
    for head, out_ch in (("hm", 2), ("reg", 2), ("ct2cn", 8), ("cn2ct", 8), ("lc", 2), ("sp", 2)):
        conv(f"{head}.0", head_conv, o, 3)
        conv(f"{head}.2", out_ch, head_conv, 1)
        p[f"{head}.2.bias"] = np.full(
            out_ch, -2.19 if head == "hm" else 0.0, np.float32
        )
    return p


def small_tablecenternet(weights=None, **kw) -> TableCenterNetNumpy:
    """The reduced-size tower wired to
    :func:`random_tablecenternet_weights`'s geometry."""
    return TableCenterNetNumpy(
        weights if weights is not None else random_tablecenternet_weights(),
        input_size=kw.pop("input_size", 64),
        center_k=kw.pop("center_k", 50),
        corner_k=kw.pop("corner_k", 80),
        **kw,
    )
