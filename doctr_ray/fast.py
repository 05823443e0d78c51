"""Numpy forward pass for the reference FAST detection architecture —
the zoo's DEFAULT ``det_arch`` family (``fast_tiny`` / ``fast_small``
/ ``fast_base``).

The reference stack (detection/fast/pytorch.py:47-231 model + :331-444
factories; backbone classification/textnet/pytorch.py:44-278 TextNet;
modules/layers/pytorch.py FASTConvLayer) re-implemented
layer-for-layer as pure-numpy INFERENCE so a real torch checkpoint —
converted to ``.npz`` with the same state-dict key names — runs inside
this engine's detection actors without torch:

- TextNet backbone: conv3x3-s2/BN/ReLU stem (Sequential indices
  0/1/2) + four stages (indices 3..6) of FASTConvLayer blocks — the
  RepVGG-style over-parameterized conv whose UNFUSED branches live in
  the checkpoint: main (kh, kw) conv/BN + vertical (kh, 1) conv/BN
  when kw != 1 + horizontal (1, kw) conv/BN when kh != 1 + identity
  BN when in == out and stride == 1, summed then ReLU
  (layers/pytorch.py FASTConvLayer.forward)
- FastNeck (fast/pytorch.py:47-73): per-scale FASTConvLayer
  reductions (in * [1, 2, 4, 8] -> 128), bilinear upsample
  (align_corners=False) of f2..f4 to f1's 1/4 resolution, concat
- FastHead (fast/pytorch.py:76-98): FASTConvLayer(512 -> 128) +
  inference-identity dropout + 1x1 classless conv; logits bilinearly
  upsampled to the input size, then the erosion-reversal
  MaxPool2d(k=3, s=1, p=1) BEFORE sigmoid (fast/pytorch.py:160,208)
- postprocessing: the modified-DBNet straight-pages analog the
  reference notes it uses (bin_thresh=0.1, box_thresh=0.1, connected
  components) — shared with the LinkNet/DBNet towers

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_fast_weights` builds a fixed-seed checkpoint with the
exact torch key set per arch. Conv / BN / pool kernels are shared
with :mod:`doctr_ray.dbnet`.
"""

from __future__ import annotations

import numpy as np

from .dbnet import bn_relu, conv2d, maxpool2d_s, sigmoid

# ---------------------------------------------------------------- kernels


def bilinear_resize(x: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """``F.interpolate(mode='bilinear', align_corners=False)``:
    half-pixel source mapping src = (i + 0.5) * n_in / n_out - 0.5,
    clipped at the borders."""
    B, C, H, W = x.shape
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x

    def _axis(n_in, n_out):
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0, n_in - 1)
        lo = np.minimum(np.floor(src).astype(np.int64), max(n_in - 2, 0))
        t = (src - lo).astype(x.dtype)
        return lo, np.minimum(lo + 1, n_in - 1), t

    ylo, yhi, ty = _axis(H, Ho)
    xlo, xhi, tx = _axis(W, Wo)
    top = x[:, :, ylo][:, :, :, xlo] * (1 - tx) + x[:, :, ylo][:, :, :, xhi] * tx
    bot = x[:, :, yhi][:, :, :, xlo] * (1 - tx) + x[:, :, yhi][:, :, :, xhi] * tx
    return top * (1 - ty[None, None, :, None]) + bot * ty[None, None, :, None]


def fast_conv_layer(x: np.ndarray, p: dict, prefix: str, stride: int = 1) -> np.ndarray:
    """FASTConvLayer (layers/pytorch.py): main + vertical + horizontal
    + identity branches (each conv/BN, unfused as in the checkpoint),
    summed, ReLU. Branch presence is keyed off the blob, mirroring the
    kernel-size rules (ver when kw != 1, hor when kh != 1, identity
    when in == out and stride == 1)."""
    w = p[f"{prefix}.conv.weight"]
    kh, kw = w.shape[2], w.shape[3]
    out = _conv_rect(x, w, stride, ((kh - 1) // 2, (kw - 1) // 2))
    out = bn_relu(out, p, f"{prefix}.bn", relu=False)
    if f"{prefix}.ver_conv.weight" in p:
        v = _conv_rect(x, p[f"{prefix}.ver_conv.weight"], stride, ((kh - 1) // 2, 0))
        out = out + bn_relu(v, p, f"{prefix}.ver_bn", relu=False)
    if f"{prefix}.hor_conv.weight" in p:
        h = _conv_rect(x, p[f"{prefix}.hor_conv.weight"], stride, (0, (kw - 1) // 2))
        out = out + bn_relu(h, p, f"{prefix}.hor_bn", relu=False)
    if f"{prefix}.rbr_identity.weight" in p:
        out = out + bn_relu(x, p, f"{prefix}.rbr_identity", relu=False)
    np.maximum(out, 0, out=out)
    return out


def _conv_rect(x: np.ndarray, w: np.ndarray, stride: int, pad: tuple[int, int]):
    """Correlation with possibly-rectangular kernel/padding via the
    shared square-kernel conv2d (asymmetric pad applied up front)."""
    ph, pw = pad
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    if stride > 1:
        win = win[:, :, ::stride, ::stride]
    Ho, Wo = win.shape[2], win.shape[3]
    cols = win.transpose(0, 2, 3, 1, 4, 5).reshape(B, Ho * Wo, C * kh * kw)
    out = cols @ w.reshape(O, -1).T.astype(x.dtype)
    return out.reshape(B, Ho, Wo, O).transpose(0, 3, 1, 2)


# ------------------------------------------------------------- architecture

#: per arch: list of stages, each a list of (in_c, out_c, (kh, kw), stride)
#: rows — textnet/pytorch.py:153-278 verbatim
TEXTNET_STAGES = {
    "fast_tiny": [
        [(64, 64, (3, 3), 1), (64, 64, (3, 3), 2), (64, 64, (3, 3), 1)],
        [(64, 128, (3, 3), 2), (128, 128, (1, 3), 1), (128, 128, (3, 3), 1), (128, 128, (3, 1), 1)],
        [(128, 256, (3, 3), 2), (256, 256, (3, 3), 1), (256, 256, (3, 1), 1), (256, 256, (1, 3), 1)],
        [(256, 512, (3, 3), 2), (512, 512, (3, 1), 1), (512, 512, (1, 3), 1), (512, 512, (3, 3), 1)],
    ],
    "fast_small": [
        [(64, 64, (3, 3), 1), (64, 64, (3, 3), 2)],
        [(64, 128, (3, 3), 2), (128, 128, (1, 3), 1), (128, 128, (3, 3), 1), (128, 128, (3, 1), 1),
         (128, 128, (3, 3), 1), (128, 128, (3, 1), 1), (128, 128, (1, 3), 1), (128, 128, (3, 3), 1)],
        [(128, 256, (3, 3), 2), (256, 256, (3, 3), 1), (256, 256, (1, 3), 1), (256, 256, (3, 1), 1),
         (256, 256, (3, 3), 1), (256, 256, (1, 3), 1), (256, 256, (3, 1), 1), (256, 256, (3, 3), 1)],
        [(256, 512, (3, 3), 2), (512, 512, (3, 1), 1), (512, 512, (1, 3), 1), (512, 512, (1, 3), 1),
         (512, 512, (3, 1), 1)],
    ],
    "fast_base": [
        [(64, 64, (3, 3), 1), (64, 64, (3, 3), 2), (64, 64, (3, 1), 1), (64, 64, (3, 3), 1),
         (64, 64, (3, 1), 1), (64, 64, (3, 3), 1), (64, 64, (3, 3), 1), (64, 64, (1, 3), 1),
         (64, 64, (3, 3), 1), (64, 64, (3, 3), 1)],
        [(64, 128, (3, 3), 2), (128, 128, (1, 3), 1), (128, 128, (3, 3), 1), (128, 128, (3, 1), 1),
         (128, 128, (3, 3), 1), (128, 128, (3, 3), 1), (128, 128, (3, 1), 1), (128, 128, (3, 1), 1),
         (128, 128, (3, 3), 1), (128, 128, (3, 3), 1)],
        [(128, 256, (3, 3), 2), (256, 256, (3, 3), 1), (256, 256, (3, 3), 1), (256, 256, (1, 3), 1),
         (256, 256, (3, 3), 1), (256, 256, (3, 1), 1), (256, 256, (3, 3), 1), (256, 256, (3, 1), 1)],
        [(256, 512, (3, 3), 2), (512, 512, (1, 3), 1), (512, 512, (3, 1), 1), (512, 512, (3, 1), 1),
         (512, 512, (1, 3), 1)],
    ],
}


class FASTNumpy:
    """Numpy ``fast_tiny`` / ``fast_small`` / ``fast_base`` inference
    tower + straight-pages postprocessing. ``weights``: path /
    ObjectRef / dict consumed once by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict (``feat_extractor.{0,1,3..6}.*``, ``neck.reduction.*``,
    ``prob_head.*``)."""

    MEAN = np.array([0.798, 0.785, 0.772], np.float32)
    STD = np.array([0.264, 0.2749, 0.287], np.float32)

    def __init__(
        self,
        weights,
        arch: str = "fast_base",
        bin_thresh: float = 0.1,
        box_thresh: float = 0.1,
        pooling_size: int = 4,
        input_shape: tuple[int, int] = (1024, 1024),
    ):
        from .weights import load_weights

        if arch not in TEXTNET_STAGES:
            raise ValueError(f"unknown fast arch '{arch}'")
        self.arch = arch
        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.pooling_size = pooling_size
        self.input_shape = input_shape

    # -- backbone ----------------------------------------------------------
    def features(self, x: np.ndarray) -> list[np.ndarray]:
        """(B,3,H,W) -> the four TextNet stage maps at 1/4..1/32."""
        p = self.p
        out = conv2d(x, p["feat_extractor.0.weight"], stride=2, pad=1)
        out = bn_relu(out, p, "feat_extractor.1")
        feats = []
        for si, stage in enumerate(TEXTNET_STAGES[self.arch], start=3):
            for bi, (_in, _out, _k, stride) in enumerate(stage):
                out = fast_conv_layer(out, p, f"feat_extractor.{si}.{bi}", stride)
            feats.append(out)
        return feats

    # -- neck / head --------------------------------------------------------
    def neck(self, feats: list[np.ndarray]) -> np.ndarray:
        """FastNeck: per-scale reductions + upsample-to-f1 + concat."""
        red = [
            fast_conv_layer(f, self.p, f"neck.reduction.{i}")
            for i, f in enumerate(feats)
        ]
        size = red[0].shape[-2:]
        return np.concatenate(
            [red[0]] + [bilinear_resize(r, size) for r in red[1:]], axis=1
        )

    def prob_map(self, x: np.ndarray) -> np.ndarray:
        """(B,3,H,W) float32 -> (B,classes,H,W) probability map:
        head logits -> bilinear to input size -> erosion-reversal
        max-pool -> sigmoid."""
        x = np.ascontiguousarray(x, np.float32)
        f = self.neck(self.features(x))
        h = fast_conv_layer(f, self.p, "prob_head.0")
        logits = conv2d(h, self.p["prob_head.2.weight"])
        logits = bilinear_resize(logits, x.shape[-2:])
        k = self.pooling_size // 2 + 1
        logits = maxpool2d_s(logits, k, 1, (self.pooling_size // 2) // 2)
        return sigmoid(logits)

    # -- postprocess (modified-DBNet analog, shared CC machinery) ----------
    def boxes_from_prob(self, prob: np.ndarray) -> np.ndarray:
        from .detection import connected_component_boxes

        H, W = prob.shape
        boxes = connected_component_boxes(prob > self.bin_thresh)
        out = []
        for x0, y0, x1, y1 in boxes:
            if x1 - x0 < 2 or y1 - y0 < 2:
                continue
            score = float(prob[y0:y1, x0:x1].mean())
            if score < self.box_thresh:
                continue
            out.append([x0 / W, y0 / H, x1 / W, y1 / H, score])
        return np.asarray(out, np.float32) if out else np.zeros((0, 5), np.float32)

    def detect(self, page: np.ndarray) -> np.ndarray:
        """Gray/RGB uint8 page -> (N,5) relative boxes — the slot
        contract shared with the DBNet / LinkNet towers."""
        from .geometry import remove_padding_coords, resize_aspect_pad

        g = page if page.ndim == 2 else page.mean(axis=2).astype(page.dtype)
        th, tw = self.input_shape
        resized, padding = resize_aspect_pad(g, (th, tw), pad_value=0)
        chan = resized.astype(np.float32) / 255.0
        x = (chan[None, None, :, :] - self.MEAN[None, :, None, None]) / self.STD[
            None, :, None, None
        ]
        prob = self.prob_map(x)[0, 0]
        boxes = self.boxes_from_prob(prob)
        if len(boxes):
            boxes[:, :4] = remove_padding_coords(boxes[:, :4], (th, tw), padding)
        return boxes

    def __repr__(self) -> str:
        return f"FASTNumpy(arch={self.arch}, input={self.input_shape})"


# ---------------------------------------------------------------- fixtures


def random_fast_weights(
    arch: str = "fast_tiny", seed: int = 0, num_classes: int = 1
) -> dict:
    """Fixed-seed checkpoint with the exact torch state-dict key set of
    the reference FAST (unfused RepConv branches, per the published
    checkpoints)."""
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, c, kh, kw):
        p[f"{name}.weight"] = (
            rng.standard_normal((o, c, kh, kw)) * np.sqrt(2.0 / (o * kh * kw))
        ).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        p[f"{name}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)

    def fast_layer(name, in_c, out_c, kh, kw, stride):
        conv(f"{name}.conv", out_c, in_c, kh, kw)
        bn(f"{name}.bn", out_c)
        if kw != 1:
            conv(f"{name}.ver_conv", out_c, in_c, kh, 1)
            bn(f"{name}.ver_bn", out_c)
        if kh != 1:
            conv(f"{name}.hor_conv", out_c, in_c, 1, kw)
            bn(f"{name}.hor_bn", out_c)
        if in_c == out_c and stride == 1:
            bn(f"{name}.rbr_identity", in_c)

    conv("feat_extractor.0", 64, 3, 3, 3)
    bn("feat_extractor.1", 64)
    stages = TEXTNET_STAGES[arch]
    for si, stage in enumerate(stages, start=3):
        for bi, (in_c, out_c, (kh, kw), stride) in enumerate(stage):
            fast_layer(f"feat_extractor.{si}.{bi}", in_c, out_c, kh, kw, stride)
    c1 = stages[0][-1][1]   # stage-1 channels (the neck's base scale)
    c2 = stages[1][-1][1]   # neck/head width
    for i, scale in enumerate((1, 2, 4, 8)):
        fast_layer(f"neck.reduction.{i}", c1 * scale, c2, 3, 3, 1)
    fast_layer("prob_head.0", 4 * c2, c2, 3, 3, 1)
    conv("prob_head.2", num_classes, c2, 1, 1)
    return p
