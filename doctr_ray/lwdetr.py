"""Numpy forward pass for the reference LW-DETR layout architecture.

The reference's ``lw_detr_s`` / ``lw_detr_m`` layout towers
(layout/lw_detr/pytorch.py:246-612 LWDETR + :153-243 LWDETRBackbone;
layers layout/lw_detr/layers/pytorch.py:25-785 — refine_obb_boxes,
LWDETRHead, LWDETRAttention, MultiScaleDeformableAttention,
LWDETRDecoder, MultiScaleProjector, C2fBottleneck; ViT-Det backbone
classification/vit_det/pytorch.py:66-227 ViTInput/ViTTokenize/ViTStage
with classification/vit_det/layers/pytorch.py:15-215 PatchEmbed +
AttentionWithCAE + WindowedCAETransformerBlock; postprocessor
layout/lw_detr/base.py:17-208) re-implemented layer-for-layer as
pure-numpy INFERENCE so a real torch checkpoint — converted to
``.npz`` with the same state-dict key names — runs inside this
engine's layout actors without torch in the container:

- ViT-Det encoder: 16x16 conv patch embed, learned absolute positions
  (cls slot dropped, vit_det/pytorch.py:85-88), 4x4 window tokenize,
  N WindowedCAETransformerBlocks (CAE q/v bias, gamma_1/gamma_2
  residual scaling, window vs global attention per block index),
  features tapped at ``out_feature_indexes``
- MultiScaleProjector: channel-concat of the tapped maps ->
  C2fBottleneck (1x1 conv-BN-SiLU -> split halves -> chained 3x3
  conv-BN-SiLU pairs -> concat -> 1x1 conv-BN-SiLU) -> ChannelLayerNorm
- encoder proposals (lw_detr/pytorch.py:388-445): per-cell (cx, cy)
  grid with w = h = 0.05 * 2^level, sin 0 / cos 1, invalid where
  padded or outside (0.01, 0.99); group-0 enc_output linear+LN,
  class/bbox heads, top-``num_queries`` by max class logit
- decoder (layers/pytorch.py:484-654): 3 layers of self-attention
  (q/k carry sine+angle query positions, v does not), multiscale
  deformable cross-attention (grid_sample bilinear, zeros padding,
  align_corners=False) over the single fused level, residual MLP,
  iterative OBB refinement between layers
- heads + postprocessor (base.py:17-208): sigmoid scores, top-300
  (query, class) pairs, score threshold, OBB -> polygon (cv2.boxPoints
  corner math), class-wise greedy NMS with exact convex-polygon IoU
  (Sutherland-Hodgman clip + shoelace area replacing
  cv2.intersectConvexConvex)

Inference uses ONE query group (lw_detr/pytorch.py:470-473); the
group-DETR training replication and the Hungarian/IA-BCE loss are the
training harness, out of scope like the other towers' losses.

Weights load once per actor through :mod:`doctr_ray.weights`
(path / object-store ref / dict), the same contract as CRNN/DBNet.
:func:`random_lwdetr_weights` builds a reduced-size fixed-seed
checkpoint with the exact torch key set for parity tests and fixtures.
"""

from __future__ import annotations

import numpy as np

from .dbnet import conv2d
from .vitstr import gelu, layer_norm, linear, softmax

#: reference lw_detr default_cfgs class inventory
#: (layout/lw_detr/pytorch.py:36-48) — the DocLayNet label set
LAYOUT_CLASSES = [
    "Caption",
    "Footnote",
    "Formula",
    "List-item",
    "Page-footer",
    "Page-header",
    "Picture",
    "Section-header",
    "Table",
    "Text",
    "Title",
]

# ---------------------------------------------------------------- kernels


def silu(x: np.ndarray) -> np.ndarray:
    """``nn.SiLU``: x * sigmoid(x)."""
    return x / (1.0 + np.exp(-x))


def batch_norm(x: np.ndarray, p: dict, prefix: str, eps: float = 1e-5) -> np.ndarray:
    """Inference ``nn.BatchNorm2d`` from torch-keyed running stats."""
    g = p[f"{prefix}.weight"]
    b = p[f"{prefix}.bias"]
    m = p[f"{prefix}.running_mean"]
    v = p[f"{prefix}.running_var"]
    scale = (g / np.sqrt(v + eps)).astype(x.dtype)
    shift = (b - m * g / np.sqrt(v + eps)).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def conv_bn_silu(
    x: np.ndarray, p: dict, seq: str, idx: int, stride: int = 1, pad: int = 0
) -> np.ndarray:
    """One ``conv_sequence_pt(act=True, bn=True, activation=SiLU)``
    triple (reference models/utils/pytorch.py:89-125): bias-free conv
    at ``{seq}.{idx}``, BN at ``{seq}.{idx+1}``, SiLU."""
    out = conv2d(x, p[f"{seq}.{idx}.weight"], None, stride=stride, pad=pad)
    return silu(batch_norm(out, p, f"{seq}.{idx + 1}"))


def channel_layer_norm(
    x: np.ndarray, w: np.ndarray, b: np.ndarray, eps: float = 1e-6
) -> np.ndarray:
    """ChannelLayerNorm (modules/layers/pytorch.py:61-81): point-wise
    mean/var over the CHANNEL axis of (B, C, H, W)."""
    u = x.mean(axis=1, keepdims=True)
    s = ((x - u) ** 2).mean(axis=1, keepdims=True)
    xn = (x - u) / np.sqrt(s + eps)
    return w.astype(x.dtype)[None, :, None, None] * xn + b.astype(x.dtype)[None, :, None, None]


def normalize_vec(v: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """``F.normalize(dim=-1)``: v / max(||v||, eps)."""
    n = np.sqrt((v * v).sum(axis=-1, keepdims=True))
    return v / np.maximum(n, eps)


def refine_obb_boxes(reference_points: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """Apply predicted deltas to (cx, cy, w, h, sin, cos) references
    (layers/pytorch.py:25-63): center shifted by delta * wh, size
    scaled by exp(clamped delta), rotations composed."""
    ref = reference_points.astype(deltas.dtype)
    cxcy = deltas[..., :2] * ref[..., 2:4] + ref[..., :2]
    wh = np.exp(np.clip(deltas[..., 2:4], -5.0, 3.5)) * ref[..., 2:4]
    delta_rot = normalize_vec(deltas[..., 4:6])
    sin_d, cos_d = delta_rot[..., 0:1], delta_rot[..., 1:2]
    sin_r, cos_r = ref[..., 4:5], ref[..., 5:6]
    sin_new = sin_r * cos_d + cos_r * sin_d
    cos_new = cos_r * cos_d - sin_r * sin_d
    rot = normalize_vec(np.concatenate([sin_new, cos_new], axis=-1))
    return np.concatenate([cxcy, wh, rot], axis=-1)


def mlp_head(x: np.ndarray, p: dict, prefix: str, num_layers: int) -> np.ndarray:
    """LWDETRHead (layers/pytorch.py:66-86): ReLU MLP, linear last."""
    for i in range(num_layers):
        x = linear(x, p[f"{prefix}.layers.{i}.weight"], p[f"{prefix}.layers.{i}.bias"])
        if i < num_layers - 1:
            x = np.maximum(x, 0)
    return x


def grid_sample_bilinear(value: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False)`` for value (N, C, H, W) and grid
    (N, Q, P, 2) in [-1, 1] -> (N, C, Q, P)."""
    N, C, H, W = value.shape
    gx = (grid[..., 0] + 1.0) * (W / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (H / 2.0) - 0.5
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    wx = (gx - x0).astype(value.dtype)
    wy = (gy - y0).astype(value.dtype)
    vf = value.reshape(N, C, H * W)
    Q, P = grid.shape[1], grid.shape[2]
    out = np.zeros((N, C, Q, P), value.dtype)
    for dx, dy, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        xi, yi = x0 + dx, y0 + dy
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = np.clip(yi, 0, H - 1) * W + np.clip(xi, 0, W - 1)  # (N, Q, P)
        gathered = np.take_along_axis(
            vf, idx.reshape(N, 1, Q * P), axis=2
        ).reshape(N, C, Q, P)
        out += gathered * (wgt * valid)[:, None, :, :]
    return out


def gen_sine_position_embeddings(pos: np.ndarray, hidden_size: int = 256) -> np.ndarray:
    """Sine/cosine embeddings of (B, Q, 4) normalized (cx, cy, w, h)
    -> (B, Q, 2 * hidden_size) (layers/pytorch.py:445-481; order
    pos_y, pos_x, pos_w, pos_h)."""
    scale = 2.0 * np.pi
    dim = hidden_size // 2
    dim_t = np.arange(dim, dtype=np.float64)
    dim_t = 10000.0 ** (2.0 * np.floor(dim_t / 2.0) / dim)

    def embed(coord: np.ndarray) -> np.ndarray:
        v = (coord * scale)[:, :, None] / dim_t  # (B, Q, dim)
        return np.stack([np.sin(v[:, :, 0::2]), np.cos(v[:, :, 1::2])], axis=3).reshape(
            *coord.shape, dim
        )

    pos_x = embed(pos[:, :, 0].astype(np.float64))
    pos_y = embed(pos[:, :, 1].astype(np.float64))
    pos_w = embed(pos[:, :, 2].astype(np.float64))
    pos_h = embed(pos[:, :, 3].astype(np.float64))
    return np.concatenate([pos_y, pos_x, pos_w, pos_h], axis=2).astype(pos.dtype)


# ----------------------------------------------------- polygon geometry


def box_points(cx: float, cy: float, w: float, h: float, angle_deg: float) -> np.ndarray:
    """``cv2.boxPoints(((cx, cy), (w, h), angle_deg))`` corner math
    (OpenCV RotatedRect::points): 4 corners of the rotated rect."""
    a = np.sin(np.deg2rad(angle_deg)) * 0.5
    b = np.cos(np.deg2rad(angle_deg)) * 0.5
    p0 = (cx - a * h - b * w, cy + b * h - a * w)
    p1 = (cx + a * h - b * w, cy - b * h - a * w)
    p2 = (2 * cx - p0[0], 2 * cy - p0[1])
    p3 = (2 * cx - p1[0], 2 * cy - p1[1])
    return np.array([p0, p1, p2, p3], dtype=np.float32)


def order_points(pts: np.ndarray) -> np.ndarray:
    """Reference utils/geometry.py:58-105 order_points: TL, TR, BR, BL
    for a (4, 2) quadrangle (angle sort around centroid, roll to the
    min-sum corner, enforce clockwise in the y-down frame)."""
    pts = np.asarray(pts)
    c = pts.mean(axis=0)
    angles = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    pts = pts[np.argsort(angles)]
    start = np.argmin(pts.sum(axis=1))
    pts = np.roll(pts, -start, axis=0)
    area = 0.5 * np.sum(pts[:, 0] * np.roll(pts[:, 1], -1) - pts[:, 1] * np.roll(pts[:, 0], -1))
    if area < 0:
        pts = np.roll(pts[::-1], 1, axis=0)
    return pts


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace |area| of an (N, 2) polygon."""
    x, y = poly[:, 0], poly[:, 1]
    return float(abs(np.sum(x * np.roll(y, -1) - y * np.roll(x, -1))) * 0.5)


def convex_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip convex ``subject`` by convex ``clip``
    -> intersection polygon ((0, 2) when disjoint). Replaces
    cv2.intersectConvexConvex in the NMS IoU (base.py:66-87)."""
    # orient the clip polygon counter-clockwise so "inside" is a
    # consistent half-plane test
    cx, cy = clip[:, 0], clip[:, 1]
    if np.sum(cx * np.roll(cy, -1) - cy * np.roll(cx, -1)) < 0:
        clip = clip[::-1]
    out = [tuple(pt) for pt in subject]
    n = len(clip)
    for i in range(n):
        if not out:
            break
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        ex, ey = bx - ax, by - ay
        pts = out
        out = []
        prev = pts[-1]
        prev_side = ex * (prev[1] - ay) - ey * (prev[0] - ax)
        for cur in pts:
            cur_side = ex * (cur[1] - ay) - ey * (cur[0] - ax)
            if (cur_side >= 0) != (prev_side >= 0):
                # segment crosses the clip edge: add the intersection
                px, py = prev
                dx, dy = cur[0] - px, cur[1] - py
                denom = ex * dy - ey * dx
                if abs(denom) > 1e-12:
                    t = -prev_side / denom
                    out.append((px + t * dx, py + t * dy))
            if cur_side >= 0:
                out.append(cur)
            prev, prev_side = cur, cur_side
    return np.asarray(out, np.float64).reshape(-1, 2)


def convex_iou(poly1: np.ndarray, poly2: np.ndarray) -> float:
    """Exact IoU of two convex polygons (base.py:66-87 _iou)."""
    inter_poly = convex_clip(poly1.astype(np.float64), poly2.astype(np.float64))
    if len(inter_poly) < 3:
        return 0.0
    inter = polygon_area(inter_poly)
    if inter <= 0:
        return 0.0
    a1, a2 = polygon_area(poly1.astype(np.float64)), polygon_area(poly2.astype(np.float64))
    return inter / (a1 + a2 - inter + 1e-6)


# ------------------------------------------------------- postprocessor


class LWDETRPostProcessorNumpy:
    """Numpy port of the reference LWDETRPostProcessor
    (layout/lw_detr/base.py:17-208): sigmoid scores, top-``topk``
    (query, class) pairs, score threshold, OBB decode, class-wise
    greedy NMS with exact convex-polygon IoU."""

    def __init__(
        self,
        num_classes: int,
        score_thresh: float = 0.5,
        iou_thresh: float = 0.5,
        topk: int = 300,
        assume_straight_pages: bool = True,
    ) -> None:
        self.num_classes = num_classes
        self.score_thresh = score_thresh
        self.iou_thresh = iou_thresh
        self.topk = topk
        self.assume_straight_pages = assume_straight_pages

    def _decode_boxes(self, boxes: np.ndarray) -> np.ndarray:
        """(N, 6) OBB -> (N, 4, 2) ordered polygons (base.py:42-64)."""
        polys = []
        for cx, cy, w, h, sin, cos in boxes:
            angle = np.degrees(np.arctan2(sin, cos))
            polys.append(order_points(box_points(cx, cy, w, h, angle)))
        return np.asarray(polys, np.float32)

    def _nms(self, polys: np.ndarray, scores: np.ndarray, labels: np.ndarray) -> list[int]:
        """Class-wise greedy NMS over rotated polygons (base.py:89-137)."""
        keep: list[int] = []
        for cls in np.unique(labels):
            cls_idxs = np.where(labels == cls)[0]
            order = np.argsort(scores[cls_idxs])[::-1]
            cls_idxs = cls_idxs[order]
            cls_polys = polys[cls_idxs]
            suppressed = np.zeros(len(cls_idxs), dtype=bool)
            for i in range(len(cls_idxs)):
                if suppressed[i]:
                    continue
                keep.append(int(cls_idxs[i]))
                for j in range(i + 1, len(cls_idxs)):
                    if suppressed[j]:
                        continue
                    if convex_iou(cls_polys[i], cls_polys[j]) >= self.iou_thresh:
                        suppressed[j] = True
        return keep

    def __call__(
        self, logits: np.ndarray, boxes: np.ndarray
    ) -> list[tuple[list[int], np.ndarray, list[float]]]:
        results = []
        for b in range(boxes.shape[0]):
            prob = 1.0 / (1.0 + np.exp(-logits[b]))  # (Q, C)
            num_classes = prob.shape[-1]
            flat = prob.reshape(-1)
            topk = min(self.topk, flat.size)
            topk_idxs = np.argsort(flat)[::-1][:topk]
            scores_b = flat[topk_idxs]
            labels_b = topk_idxs % num_classes
            bboxes = boxes[b][topk_idxs // num_classes]
            mask = scores_b > self.score_thresh
            bboxes, scores_b, labels_b = bboxes[mask], scores_b[mask], labels_b[mask]
            polys = (
                self._decode_boxes(bboxes)
                if len(bboxes)
                else np.zeros((0, 4, 2), np.float32)
            )
            keep = self._nms(polys, scores_b, labels_b) if len(polys) else []
            final_labels, final_boxes, final_scores = [], [], []
            for idx in keep:
                poly = polys[idx].reshape(-1)
                if self.assume_straight_pages:
                    xs, ys = poly[0::2], poly[1::2]
                    final_boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
                else:
                    final_boxes.append(poly.tolist())
                final_labels.append(int(labels_b[idx]))
                final_scores.append(float(scores_b[idx]))
            arr = (
                np.asarray(final_boxes, np.float32).reshape(-1, 4)
                if self.assume_straight_pages
                else np.asarray(final_boxes, np.float32).reshape(-1, 4, 2)
            )
            results.append((final_labels, arr, final_scores))
        return results


# ------------------------------------------------------------- the tower


class LWDETRNumpy:
    """Numpy ``lw_detr_s`` / ``lw_detr_m`` layout inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once here by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict of the reference LWDETR (``feat_extractor.encoder.*``
    ViT-Det backbone, ``feat_extractor.projector.*``,
    ``reference_point_embed`` / ``query_feat`` / ``enc_output.0`` /
    ``enc_out_*_embed.0`` encoder heads, ``decoder.*``,
    ``class_embed`` / ``bbox_embed``) so ``{k: v.numpy() for k, v in
    sd.items()}`` of a real checkpoint is a valid blob. Shapes are
    inferred from the blob (vit/detr widths, layer counts, query
    count); head counts and the window/tap layout are ctor args (torch
    stores no shape for them — vit_det_s/m both use 12 heads, window
    blocks (0, 1, 3, 6, 7, 9) and taps (2, 4, 5, 9),
    classification/vit_det/pytorch.py:173-174,305-345).
    """

    #: layout normalization (layout/lw_detr/pytorch.py:33-35)
    MEAN = np.array([0.798, 0.785, 0.772], np.float32)
    STD = np.array([0.264, 0.2749, 0.287], np.float32)

    def __init__(
        self,
        weights,
        class_names: list[str] | None = None,
        score_thresh: float = 0.5,
        iou_thresh: float = 0.5,
        group_detr: int = 13,
        vit_num_heads: int = 12,
        sa_num_heads: int = 8,
        ca_num_heads: int = 16,
        dec_n_points: int = 2,
        input_size: int = 1024,
        patch_size: int = 16,
        window_block_indexes: tuple[int, ...] = (0, 1, 3, 6, 7, 9),
        out_feature_indexes: tuple[int, ...] = (2, 4, 5, 9),
        assume_straight_pages: bool = True,
    ) -> None:
        from .weights import load_weights

        self.params = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        p = self.params
        self.class_names = list(class_names) if class_names is not None else list(LAYOUT_CLASSES)
        self.num_classes = p["class_embed.weight"].shape[0]
        if len(self.class_names) != self.num_classes:
            raise ValueError(
                f"checkpoint has {self.num_classes} classes but "
                f"{len(self.class_names)} class names were given"
            )
        self.group_detr = group_detr
        self.num_queries = p["reference_point_embed.weight"].shape[0] // group_detr
        self.d_model = int(p["class_embed.weight"].shape[1])
        self.vit_d_model = int(
            p["feat_extractor.encoder.0.patch_embed.proj.weight"].shape[0]
        )
        self.vit_num_layers = sum(
            1 for k in p if k.startswith("feat_extractor.encoder.2.blocks.")
            and k.endswith(".attn.proj.weight")
        )
        self.dec_layers = sum(
            1 for k in p if k.startswith("decoder.layers.")
            and k.endswith(".self_attn.o_proj.weight")
        )
        self.vit_num_heads = vit_num_heads
        self.sa_num_heads = sa_num_heads
        self.ca_num_heads = ca_num_heads
        self.dec_n_points = dec_n_points
        self.input_size = input_size
        self.patch_size = patch_size
        self.window_block_indexes = set(window_block_indexes)
        self.out_feature_indexes = [
            i if i >= 0 else i + self.vit_num_layers for i in out_feature_indexes
        ]
        self.assume_straight_pages = assume_straight_pages
        self.c2f_num_blocks = sum(
            1 for k in p if k.startswith("feat_extractor.projector.stages.0.0.blocks.")
            and k.endswith(".0.weight")
        )
        self.postprocessor = LWDETRPostProcessorNumpy(
            num_classes=self.num_classes,
            score_thresh=score_thresh,
            iou_thresh=iou_thresh,
            assume_straight_pages=assume_straight_pages,
        )

    # -- ViT-Det backbone -------------------------------------------------
    def _vit_attention(self, x: np.ndarray, prefix: str) -> np.ndarray:
        """AttentionWithCAE (vit_det/layers/pytorch.py:75-125): fused
        qkv with CAE bias (q_bias, zeros, v_bias)."""
        p = self.params
        B, N, C = x.shape
        heads = self.vit_num_heads
        hd = C // heads
        qkv_bias = np.concatenate(
            [p[f"{prefix}.q_bias"], np.zeros(C, np.float32), p[f"{prefix}.v_bias"]]
        )
        qkv = linear(x, p[f"{prefix}.qkv.weight"], qkv_bias)
        qkv = qkv.reshape(B, N, 3, heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = (q * np.float32(hd**-0.5)) @ k.transpose(0, 1, 3, 2)
        attn = softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return linear(out, p[f"{prefix}.proj.weight"], p[f"{prefix}.proj.bias"])

    def encoder_features(self, x: np.ndarray) -> list[np.ndarray]:
        """(B, 3, H, W) -> tapped feature maps [(B, C, Hp, Wp)]
        (vit_det/pytorch.py:66-141: ViTInput -> ViTTokenize ->
        ViTStage)."""
        p = self.params
        B = x.shape[0]
        ps = self.patch_size
        # PatchEmbed: conv kernel == stride == patch -> blocked matmul
        w = p["feat_extractor.encoder.0.patch_embed.proj.weight"]  # (D, 3, ps, ps)
        b = p["feat_extractor.encoder.0.patch_embed.proj.bias"]
        D = w.shape[0]
        Hp, Wp = x.shape[2] // ps, x.shape[3] // ps
        blocks = x.reshape(B, 3, Hp, ps, Wp, ps).transpose(0, 2, 4, 1, 3, 5)
        tokens = blocks.reshape(B, Hp, Wp, 3 * ps * ps) @ w.reshape(D, -1).T.astype(x.dtype)
        tokens += b.astype(x.dtype)
        # learned positions; cls slot dropped (vit_det/pytorch.py:85-88)
        pos = p["feat_extractor.encoder.0.pos_embed"][:, 1:]
        size = int(np.sqrt(pos.shape[1]))
        if size != Hp or size != Wp:
            raise NotImplementedError(
                "pos_embed grid {}x{} != patch grid {}x{}: bicubic position "
                "interpolation is not implemented (feed the configured "
                "input_size)".format(size, size, Hp, Wp)
            )
        tokens = tokens + pos.reshape(1, Hp, Wp, D).astype(x.dtype)
        # ViTTokenize: 4x4 window split (vit_det/pytorch.py:105-112)
        if Hp % 4 or Wp % 4:
            raise ValueError(f"patch grid {Hp}x{Wp} not divisible by the 4x4 windows")
        h, wd = Hp // 4, Wp // 4
        t = tokens.reshape(B, 4, h, 4, wd, D).transpose(0, 1, 3, 2, 4, 5)
        t = t.reshape(B * 16, h * wd, D)
        feats = []
        for i in range(self.vit_num_layers):
            blk = f"feat_extractor.encoder.2.blocks.{i}"
            windowed = i in self.window_block_indexes
            shortcut = t
            normed = layer_norm(
                t, p[f"{blk}.norm1.weight"], p[f"{blk}.norm1.bias"], eps=1e-6
            )
            if not windowed:
                # global attention: merge the 16 windows into one seq
                normed = normed.reshape(B, 16 * h * wd, D)
                shortcut = shortcut.reshape(B, 16 * h * wd, D)
            attn = self._vit_attention(normed, f"{blk}.attn")
            attn = attn * p[f"{blk}.gamma_1"].astype(attn.dtype)
            t = shortcut + attn
            if not windowed:
                t = t.reshape(B * 16, h * wd, D)
            normed = layer_norm(
                t, p[f"{blk}.norm2.weight"], p[f"{blk}.norm2.bias"], eps=1e-6
            )
            mlp = linear(normed, p[f"{blk}.mlp.net.0.weight"], p[f"{blk}.mlp.net.0.bias"])
            mlp = linear(gelu(mlp), p[f"{blk}.mlp.net.2.weight"], p[f"{blk}.mlp.net.2.bias"])
            t = t + mlp * p[f"{blk}.gamma_2"].astype(mlp.dtype)
            if i in self.out_feature_indexes:
                feat = t.reshape(B, 4, 4, h, wd, D).transpose(0, 5, 1, 3, 2, 4)
                feats.append(feat.reshape(B, D, Hp, Wp))
        return feats

    def projector(self, feats: list[np.ndarray]) -> np.ndarray:
        """MultiScaleProjector + C2fBottleneck + ChannelLayerNorm
        (layers/pytorch.py:657-785) -> (B, d_model, Hp, Wp)."""
        p = self.params
        base = "feat_extractor.projector.stages.0.0"
        fused = np.concatenate(feats, axis=1)
        y01 = conv_bn_silu(fused, p, f"{base}.conv_seq_1", 0)
        c = y01.shape[1] // 2
        ys = [y01[:, :c], y01[:, c:]]
        for i in range(self.c2f_num_blocks):
            blk = f"{base}.blocks.{i}"
            out = conv_bn_silu(ys[-1], p, blk, 0, pad=1)
            ys.append(conv_bn_silu(out, p, blk, 3, pad=1))
        out = conv_bn_silu(np.concatenate(ys, axis=1), p, f"{base}.conv_seq_2", 0)
        return channel_layer_norm(
            out,
            p["feat_extractor.projector.stages.0.1.weight"],
            p["feat_extractor.projector.stages.0.1.bias"],
        )

    # -- transformer -------------------------------------------------------
    @staticmethod
    def _resize_valid_mask(mask: np.ndarray, size: tuple[int, int]) -> np.ndarray:
        """Max-pool resize of the valid-pixel mask to feature size
        (lw_detr/pytorch.py:187-222): a cell is valid if ANY covered
        input pixel is valid."""
        B, H, W = mask.shape
        h, w = size
        kh, kw = H // h, W // w
        m = mask[:, : h * kh, : w * kw].reshape(B, h, kh, w, kw)
        return m.any(axis=(2, 4))

    def gen_encoder_output_proposals(
        self,
        enc_output: np.ndarray,
        valid_mask: np.ndarray,
        spatial_shapes: list[tuple[int, int]],
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Grid proposals + invalid masking (lw_detr/pytorch.py:388-445)."""
        B = enc_output.shape[0]
        proposals = []
        for level, (height, width) in enumerate(spatial_shapes):
            gy, gx = np.meshgrid(
                np.arange(height, dtype=enc_output.dtype),
                np.arange(width, dtype=enc_output.dtype),
                indexing="ij",
            )
            grid = np.stack([gx, gy], axis=-1)[None].repeat(B, axis=0)
            grid = (grid + 0.5) / np.array([width, height], enc_output.dtype)
            wh = np.full_like(grid, 0.05 * (2.0**level))
            sin = np.zeros_like(grid[..., :1])
            cos = np.ones_like(grid[..., :1])
            proposals.append(
                np.concatenate([grid, wh, sin, cos], axis=-1).reshape(B, -1, 6)
            )
        output_proposals = np.concatenate(proposals, axis=1)
        spatial_valid = (
            (output_proposals[..., :4] > 0.01) & (output_proposals[..., :4] < 0.99)
        ).all(axis=-1, keepdims=True)
        invalid = ~valid_mask[..., None] | ~spatial_valid
        output_proposals = np.where(invalid, 0.0, output_proposals)
        object_query = np.where(invalid, 0.0, enc_output)
        return object_query, output_proposals, invalid

    def _self_attention(self, hidden: np.ndarray, pos: np.ndarray, li: int) -> np.ndarray:
        """LWDETRAttention inference (layers/pytorch.py:115-192): q/k
        from hidden + pos, v from the original hidden."""
        p = self.params
        pre = f"decoder.layers.{li}.self_attn"
        B, Q, D = hidden.shape
        heads = self.sa_num_heads
        hd = D // heads
        hp = hidden + pos
        q = linear(hp, p[f"{pre}.q_proj.weight"], p[f"{pre}.q_proj.bias"])
        k = linear(hp, p[f"{pre}.k_proj.weight"], p[f"{pre}.k_proj.bias"])
        v = linear(hidden, p[f"{pre}.v_proj.weight"], p[f"{pre}.v_proj.bias"])
        q = q.reshape(B, Q, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Q, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Q, heads, hd).transpose(0, 2, 1, 3)
        attn = softmax(q @ k.transpose(0, 1, 3, 2) * np.float32(hd**-0.5), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Q, D)
        return linear(out, p[f"{pre}.o_proj.weight"], p[f"{pre}.o_proj.bias"])

    def _cross_attention(
        self,
        hidden: np.ndarray,
        pos: np.ndarray,
        value: np.ndarray,
        valid_mask: np.ndarray,
        reference_points: np.ndarray,
        spatial_shapes: list[tuple[int, int]],
        li: int,
    ) -> np.ndarray:
        """LWDETRMultiscaleDeformableAttention (layers/pytorch.py:
        253-354) over the single fused level: rotated sampling offsets,
        bilinear grid sample, weighted sum."""
        p = self.params
        pre = f"decoder.layers.{li}.cross_attn"
        B, Q, D = hidden.shape
        S = value.shape[1]
        heads, pts, levels = self.ca_num_heads, self.dec_n_points, len(spatial_shapes)
        hd = D // heads
        hp = hidden + pos
        v = linear(value, p[f"{pre}.value_proj.weight"], p[f"{pre}.value_proj.bias"])
        v = np.where(valid_mask[..., None], v, 0.0)
        v = v.reshape(B, S, heads, hd)
        offsets = linear(
            hp, p[f"{pre}.sampling_offsets.weight"], p[f"{pre}.sampling_offsets.bias"]
        ).reshape(B, Q, heads, levels, pts, 2)
        weights = linear(
            hp, p[f"{pre}.attention_weights.weight"], p[f"{pre}.attention_weights.bias"]
        ).reshape(B, Q, heads, levels * pts)
        weights = softmax(weights, axis=-1).reshape(B, Q, heads, levels, pts)
        # rotated offsets around the 6-coord OBB reference
        ref = reference_points[:, :, None, :, None, :]  # (B, Q, 1, L, 1, 6)
        center, wh = ref[..., :2], ref[..., 2:4]
        sin, cos = ref[..., 4:5], ref[..., 5:6]
        off = offsets / pts * wh * 0.5
        dx, dy = off[..., 0:1], off[..., 1:2]
        rot = np.concatenate([dx * cos - dy * sin, dx * sin + dy * cos], axis=-1)
        sampling_locations = center + rot  # (B, Q, heads, L, P, 2)
        # single-level grid sample
        H, W = spatial_shapes[0]
        grids = 2.0 * sampling_locations[:, :, :, 0] - 1.0  # (B, Q, heads, P, 2)
        grids = grids.transpose(0, 2, 1, 3, 4).reshape(B * heads, Q, pts, 2)
        vl = v.transpose(0, 2, 3, 1).reshape(B * heads, hd, H, W)
        sampled = grid_sample_bilinear(vl, grids.astype(vl.dtype))  # (B*heads, hd, Q, P)
        wt = weights.transpose(0, 2, 1, 3, 4).reshape(B * heads, 1, Q, levels * pts)
        out = (sampled * wt).sum(-1).reshape(B, heads * hd, Q).transpose(0, 2, 1)
        return linear(out, p[f"{pre}.output_proj.weight"], p[f"{pre}.output_proj.bias"])

    def _get_reference(
        self, reference_points: np.ndarray, num_levels: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Reference-point inputs + query positions (layers/pytorch.py:
        538-584): sine embed -> ref_point_head, plus the double-angle
        feature through angle_proj."""
        p = self.params
        ref_xywh = reference_points[..., :4]
        angle = reference_points[..., 4:6]
        ref_inputs = np.concatenate(
            [
                np.repeat(ref_xywh[:, :, None], num_levels, axis=2),
                np.repeat(angle[:, :, None], num_levels, axis=2),
            ],
            axis=-1,
        )
        sine = gen_sine_position_embeddings(ref_xywh, self.d_model)
        base = mlp_head(sine, p, "decoder.ref_point_head", 2)
        sin_t, cos_t = angle[..., 0:1], angle[..., 1:2]
        feat = np.concatenate(
            [sin_t, cos_t, 2 * sin_t * cos_t, cos_t**2 - sin_t**2], axis=-1
        )
        emb = linear(feat, p["decoder.angle_proj.0.weight"], p["decoder.angle_proj.0.bias"])
        emb = linear(
            np.maximum(emb, 0), p["decoder.angle_proj.2.weight"], p["decoder.angle_proj.2.bias"]
        )
        return ref_inputs, base + emb

    def forward(
        self, x: np.ndarray, mask: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(B, 3, H, W) normalized float32 + valid mask (B, H, W) ->
        (logits (B, Q, C), pred OBBs (B, Q, 6) in [0, 1] space)
        (lw_detr/pytorch.py:447-560, eval branch: one query group)."""
        p = self.params
        x = np.ascontiguousarray(x, np.float32)
        if mask is None:
            mask = np.ones((x.shape[0], x.shape[2], x.shape[3]), bool)
        feat = self.projector(self.encoder_features(x))
        B, D, H, W = feat.shape
        feat_mask = self._resize_valid_mask(mask, (H, W))
        spatial_shapes = [(H, W)]
        source = feat.reshape(B, D, H * W).transpose(0, 2, 1)  # (B, S, D)
        mask_flat = feat_mask.reshape(B, -1)
        # inference uses the FIRST query group only (pytorch.py:470-473)
        reference_points = p["reference_point_embed.weight"][: self.num_queries]
        query_feat = p["query_feat.weight"][: self.num_queries]
        tgt = np.repeat(query_feat[None].astype(np.float32), B, axis=0)
        reference_points = np.repeat(
            reference_points[None].astype(np.float32), B, axis=0
        )
        object_query, output_proposals, invalid = self.gen_encoder_output_proposals(
            source, mask_flat, spatial_shapes
        )
        # group-0 encoder heads
        oq = linear(object_query, p["enc_output.0.weight"], p["enc_output.0.bias"])
        oq = layer_norm(oq, p["enc_output_norm.0.weight"], p["enc_output_norm.0.bias"])
        enc_logits = linear(
            oq, p["enc_out_class_embed.0.weight"], p["enc_out_class_embed.0.bias"]
        )
        enc_logits_masked = np.where(invalid, -np.inf, enc_logits)
        enc_delta = mlp_head(oq, p, "enc_out_bbox_embed.0", 3)
        enc_coords = refine_obb_boxes(output_proposals, enc_delta)
        # top-k proposals by max class logit (descending, torch.topk order)
        best = enc_logits_masked.max(axis=-1)  # (B, S)
        topk_idx = np.argsort(-best, axis=1)[:, : self.num_queries]
        topk_coords = np.take_along_axis(enc_coords, topk_idx[..., None], axis=1)
        reference_points = refine_obb_boxes(topk_coords, reference_points)
        # decoder with iterative refinement
        hidden = tgt
        ref_inputs, query_pos = self._get_reference(reference_points, len(spatial_shapes))
        for li in range(self.dec_layers):
            sa = self._self_attention(hidden, query_pos, li)
            hidden = layer_norm(
                hidden + sa,
                p[f"decoder.layers.{li}.self_attn_layer_norm.weight"],
                p[f"decoder.layers.{li}.self_attn_layer_norm.bias"],
            )
            ca = self._cross_attention(
                hidden, query_pos, source, mask_flat, ref_inputs, spatial_shapes, li
            )
            hidden = layer_norm(
                hidden + ca,
                p[f"decoder.layers.{li}.cross_attn_layer_norm.weight"],
                p[f"decoder.layers.{li}.cross_attn_layer_norm.bias"],
            )
            mlp = linear(
                hidden,
                p[f"decoder.layers.{li}.mlp.fc1.weight"],
                p[f"decoder.layers.{li}.mlp.fc1.bias"],
            )
            mlp = linear(
                np.maximum(mlp, 0),
                p[f"decoder.layers.{li}.mlp.fc2.weight"],
                p[f"decoder.layers.{li}.mlp.fc2.bias"],
            )
            hidden = layer_norm(
                hidden + mlp,
                p[f"decoder.layers.{li}.layer_norm.weight"],
                p[f"decoder.layers.{li}.layer_norm.bias"],
            )
            hidden_norm = layer_norm(
                hidden, p["decoder.layernorm.weight"], p["decoder.layernorm.bias"]
            )
            if li < self.dec_layers - 1:
                delta = mlp_head(hidden_norm, p, "bbox_embed", 3)
                reference_points = refine_obb_boxes(reference_points, delta)
                ref_inputs, query_pos = self._get_reference(
                    reference_points, len(spatial_shapes)
                )
        logits = linear(hidden_norm, p["class_embed.weight"], p["class_embed.bias"])
        pred_boxes = refine_obb_boxes(reference_points, mlp_head(hidden_norm, p, "bbox_embed", 3))
        return logits, pred_boxes

    # -- page API (LayoutPredictor analog) ----------------------------------
    def preprocess(self, page: np.ndarray) -> tuple[np.ndarray, np.ndarray, tuple]:
        """uint8 page (H, W[, 3]) -> normalized (3, S, S) + valid mask
        + padding (the reference PreProcessor's aspect-preserving
        resize + symmetric pad, layout/zoo.py:45-48)."""
        from .geometry import resize_aspect_pad

        if page.ndim == 2:
            page = np.repeat(page[:, :, None], 3, axis=2)
        S = self.input_size
        chans, padding = [], (0, 0, 0, 0)
        for c in range(3):
            resized, padding = resize_aspect_pad(page[:, :, c], (S, S), pad_value=0)
            chans.append(resized)
        img = np.stack(chans).astype(np.float32) / 255.0
        img = (img - self.MEAN[:, None, None]) / self.STD[:, None, None]
        top, bottom, left, right = padding
        mask = np.zeros((S, S), bool)
        mask[top : S - bottom, left : S - right] = True
        return img, mask, padding

    def __call__(self, pages: list[np.ndarray]) -> list[dict]:
        """Pages -> [{class_names, boxes, scores}] — the reference
        LayoutPredictor contract (layout/predictor/pytorch.py:36-82),
        with padding removed from the relative boxes."""
        from .geometry import remove_padding_coords

        out = []
        for page in pages:
            img, mask, padding = self.preprocess(page)
            logits, boxes = self.forward(img[None], mask[None])
            labels, pred_boxes, scores = self.postprocessor(logits, boxes)[0]
            if self.assume_straight_pages and len(pred_boxes):
                pred_boxes = remove_padding_coords(
                    pred_boxes, (self.input_size, self.input_size), padding
                )
            out.append(
                {
                    "class_names": [self.class_names[i] for i in labels],
                    "boxes": np.asarray(pred_boxes, np.float32),
                    "scores": list(scores),
                }
            )
        return out

    def __repr__(self) -> str:
        return (
            f"LWDETRNumpy(classes={self.num_classes}, d_model={self.d_model}, "
            f"queries={self.num_queries}, vit_layers={self.vit_num_layers}, "
            f"dec_layers={self.dec_layers})"
        )


# ---------------------------------------------------------------- fixtures


def random_lwdetr_weights(
    num_classes: int = 11,
    vit_d_model: int = 32,
    vit_num_layers: int = 4,
    d_model: int = 32,
    num_queries: int = 12,
    group_detr: int = 2,
    dec_layers: int = 2,
    ff_dim: int = 64,
    input_size: int = 128,
    patch_size: int = 16,
    out_feature_indexes: tuple[int, ...] = (1, 3),
    dec_n_points: int = 2,
    ca_num_heads: int = 4,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Reduced-size fixed-seed checkpoint with the exact torch
    state-dict key set of the reference LWDETR (the reference's own
    model tests instantiate archs with random weights and assert
    output shape/structure). Defaults shrink every axis (grid 8x8,
    width 32) so the full tower runs in milliseconds."""
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def lin(name: str, o: int, i: int, scale: float = 0.1):
        p[f"{name}.weight"] = (rng.standard_normal((o, i)) * scale).astype(np.float32)
        p[f"{name}.bias"] = (rng.standard_normal(o) * 0.01).astype(np.float32)

    def ln(name: str, d: int):
        p[f"{name}.weight"] = np.ones(d, np.float32)
        p[f"{name}.bias"] = np.zeros(d, np.float32)

    def conv_bn(seq: str, o: int, i: int, k: int):
        p[f"{seq}.0.weight"] = (rng.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)
        p[f"{seq}.1.weight"] = np.ones(o, np.float32)
        p[f"{seq}.1.bias"] = np.zeros(o, np.float32)
        p[f"{seq}.1.running_mean"] = np.zeros(o, np.float32)
        p[f"{seq}.1.running_var"] = np.ones(o, np.float32)

    # ViT-Det encoder
    grid = input_size // patch_size
    enc = "feat_extractor.encoder"
    p[f"{enc}.0.patch_embed.proj.weight"] = (
        rng.standard_normal((vit_d_model, 3, patch_size, patch_size)) * 0.02
    ).astype(np.float32)
    p[f"{enc}.0.patch_embed.proj.bias"] = np.zeros(vit_d_model, np.float32)
    p[f"{enc}.0.pos_embed"] = (
        rng.standard_normal((1, grid * grid + 1, vit_d_model)) * 0.02
    ).astype(np.float32)
    for i in range(vit_num_layers):
        blk = f"{enc}.2.blocks.{i}"
        ln(f"{blk}.norm1", vit_d_model)
        ln(f"{blk}.norm2", vit_d_model)
        p[f"{blk}.attn.qkv.weight"] = (
            rng.standard_normal((3 * vit_d_model, vit_d_model)) * 0.1
        ).astype(np.float32)
        p[f"{blk}.attn.q_bias"] = np.zeros(vit_d_model, np.float32)
        p[f"{blk}.attn.v_bias"] = np.zeros(vit_d_model, np.float32)
        lin(f"{blk}.attn.proj", vit_d_model, vit_d_model)
        lin(f"{blk}.mlp.net.0", 4 * vit_d_model, vit_d_model)
        lin(f"{blk}.mlp.net.2", vit_d_model, 4 * vit_d_model)
        p[f"{blk}.gamma_1"] = np.full(vit_d_model, 0.1, np.float32)
        p[f"{blk}.gamma_2"] = np.full(vit_d_model, 0.1, np.float32)
    # projector (C2fBottleneck with num_blocks=3, lw_detr/pytorch.py:159)
    proj = "feat_extractor.projector.stages.0.0"
    c = d_model // 2
    conv_bn(f"{proj}.conv_seq_1", 2 * c, vit_d_model * len(out_feature_indexes), 1)
    for i in range(3):
        conv_bn(f"{proj}.blocks.{i}", c, c, 3)
        # second conv of the pair sits at sequential index 3
        p[f"{proj}.blocks.{i}.3.weight"] = (
            rng.standard_normal((c, c, 3, 3)) * 0.05
        ).astype(np.float32)
        p[f"{proj}.blocks.{i}.4.weight"] = np.ones(c, np.float32)
        p[f"{proj}.blocks.{i}.4.bias"] = np.zeros(c, np.float32)
        p[f"{proj}.blocks.{i}.4.running_mean"] = np.zeros(c, np.float32)
        p[f"{proj}.blocks.{i}.4.running_var"] = np.ones(c, np.float32)
    conv_bn(f"{proj}.conv_seq_2", d_model, (2 + 3) * c, 1)
    ln("feat_extractor.projector.stages.0.1", d_model)
    # queries + encoder heads (group 0 used at inference; all groups
    # present so the key set matches a real checkpoint)
    ref = np.zeros((num_queries * group_detr, 6), np.float32)
    ref[:, 5] = 1.0  # identity rotation (pytorch.py:376-377)
    p["reference_point_embed.weight"] = ref
    p["query_feat.weight"] = (
        rng.standard_normal((num_queries * group_detr, d_model)) * 0.02
    ).astype(np.float32)
    lin("class_embed", num_classes, d_model)
    for j, dims in enumerate([(d_model, d_model), (d_model, d_model), (6, d_model)]):
        lin(f"bbox_embed.layers.{j}", *dims)
    for g in range(group_detr):
        lin(f"enc_output.{g}", d_model, d_model)
        ln(f"enc_output_norm.{g}", d_model)
        lin(f"enc_out_class_embed.{g}", num_classes, d_model)
        for j, dims in enumerate([(d_model, d_model), (d_model, d_model), (6, d_model)]):
            lin(f"enc_out_bbox_embed.{g}.layers.{j}", *dims)
    # decoder
    for i in range(dec_layers):
        lay = f"decoder.layers.{i}"
        for proj_name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            lin(f"{lay}.self_attn.{proj_name}", d_model, d_model)
        ln(f"{lay}.self_attn_layer_norm", d_model)
        lin(f"{lay}.cross_attn.sampling_offsets", ca_num_heads * dec_n_points * 2, d_model)
        lin(f"{lay}.cross_attn.attention_weights", ca_num_heads * dec_n_points, d_model)
        lin(f"{lay}.cross_attn.value_proj", d_model, d_model)
        lin(f"{lay}.cross_attn.output_proj", d_model, d_model)
        ln(f"{lay}.cross_attn_layer_norm", d_model)
        lin(f"{lay}.mlp.fc1", ff_dim, d_model)
        lin(f"{lay}.mlp.fc2", d_model, ff_dim)
        ln(f"{lay}.layer_norm", d_model)
    ln("decoder.layernorm", d_model)
    lin("decoder.ref_point_head.layers.0", d_model, 2 * d_model)
    lin("decoder.ref_point_head.layers.1", d_model, d_model)
    lin("decoder.angle_proj.0", d_model, 4)
    lin("decoder.angle_proj.2", d_model, d_model)
    return p


def small_lwdetr(weights=None, **kw) -> LWDETRNumpy:
    """The reduced-size tower wired to :func:`random_lwdetr_weights`'s
    geometry — the test/fixture configuration."""
    return LWDETRNumpy(
        weights if weights is not None else random_lwdetr_weights(),
        group_detr=kw.pop("group_detr", 2),
        vit_num_heads=kw.pop("vit_num_heads", 4),
        sa_num_heads=kw.pop("sa_num_heads", 4),
        ca_num_heads=kw.pop("ca_num_heads", 4),
        input_size=kw.pop("input_size", 128),
        window_block_indexes=kw.pop("window_block_indexes", (0, 2)),
        out_feature_indexes=kw.pop("out_feature_indexes", (1, 3)),
        **kw,
    )
