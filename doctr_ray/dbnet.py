"""Numpy forward pass for the reference DBNet detection architecture.

The reference's ``db_resnet50``
(detection/differentiable_binarization/pytorch.py:26-42 config,
:48-93 FPN, :96-233 model, :300-341 backbone wiring with
fpn_layers=[layer1..layer4]) re-implemented layer-for-layer as
pure-numpy INFERENCE so a real torch checkpoint — converted to
``.npz`` with the same state-dict key names — runs without torch:

- torchvision ResNet-50 backbone (v1.5 bottlenecks: stride on the
  3x3 conv), intermediate maps after layer1..layer4
  (channels 256/512/1024/2048 at 1/4..1/32 resolution);
- the FPN: per-level 1x1 conv+BN+ReLU to 256 channels, top-down
  bilinear x2 (align_corners=True) additions, per-level 3x3
  conv+BN+ReLU to 64 + bilinear 2^idx upsample, channel concat;
- the probability head: 3x3 conv+BN+ReLU, two ConvTranspose2d
  2x2/stride-2 deconvolutions (BN+ReLU between), sigmoid;
- the straight-pages DBPostProcessor analog (base.py:88-154):
  bin_thresh binarization, connected-component bounding boxes
  (doctr_ray.detection's vectorized run labeling instead of
  cv2.findContours), mean-probability box score, box_thresh filter,
  relative (N, 5) [xmin ymin xmax ymax score] output.

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_dbnet_weights` builds a fixed-seed checkpoint for
shape/parity tests (the reference's own model tests instantiate archs
with random weights and assert output structure).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- kernels


def conv2d(x, w, b=None, stride: int = 1, pad: int = 0):
    """General NCHW convolution via sliding-window im2col matmul."""
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    if stride > 1:
        win = win[:, :, ::stride, ::stride]
    Ho, Wo = win.shape[2], win.shape[3]
    cols = win.transpose(0, 2, 3, 1, 4, 5).reshape(B, Ho * Wo, C * kh * kw)
    out = cols @ w.reshape(O, -1).T.astype(x.dtype)
    if b is not None:
        out += b.astype(x.dtype)
    return out.reshape(B, Ho, Wo, O).transpose(0, 3, 1, 2)


def bn_relu(x, p, prefix: str, relu: bool = True, eps: float = 1e-5):
    """Inference BatchNorm2d (+ optional ReLU) from torch-keyed params."""
    g = p[f"{prefix}.weight"]
    be = p[f"{prefix}.bias"]
    m = p[f"{prefix}.running_mean"]
    v = p[f"{prefix}.running_var"]
    scale = (g / np.sqrt(v + eps)).astype(x.dtype)
    shift = (be - m * g / np.sqrt(v + eps)).astype(x.dtype)
    out = x * scale[None, :, None, None] + shift[None, :, None, None]
    if relu:
        np.maximum(out, 0, out=out)
    return out


def maxpool2d_s(x, k: int, stride: int, pad: int):
    """MaxPool2d with independent kernel/stride/padding (the ResNet
    stem's 3x3/2/1)."""
    if pad:
        x = np.pad(
            x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
            constant_values=-np.inf,
        )
    win = np.lib.stride_tricks.sliding_window_view(x, (k, k), axis=(2, 3))
    return win[:, :, ::stride, ::stride].max(axis=(4, 5))


def bilinear_upsample(x, scale: int):
    """nn.Upsample(scale_factor=scale, mode='bilinear',
    align_corners=True): src = i_out * (H-1)/(H_out-1)."""
    if scale == 1:
        return x
    B, C, H, W = x.shape
    Ho, Wo = H * scale, W * scale

    def _axis(n_in, n_out):
        if n_in == 1:
            return np.zeros(n_out, np.int64), np.zeros(n_out, np.int64), np.zeros(
                n_out, x.dtype
            )
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        lo = np.floor(src).astype(np.int64)
        lo = np.minimum(lo, n_in - 2)
        t = (src - lo).astype(x.dtype)
        return lo, lo + 1, t

    ylo, yhi, ty = _axis(H, Ho)
    xlo, xhi, tx = _axis(W, Wo)
    top = x[:, :, ylo][:, :, :, xlo] * (1 - tx) + x[:, :, ylo][:, :, :, xhi] * tx
    bot = x[:, :, yhi][:, :, :, xlo] * (1 - tx) + x[:, :, yhi][:, :, :, xhi] * tx
    return top * (1 - ty[None, None, :, None]) + bot * ty[None, None, :, None]


def conv_transpose_2x2(x, w, b=None):
    """ConvTranspose2d(kernel 2, stride 2): non-overlapping, so each
    input pixel expands to its own 2x2 output block. ``w`` shape is
    torch's (C_in, C_out, 2, 2)."""
    B, C, H, W = x.shape
    Ci, Co, _, _ = w.shape
    out = np.einsum("bchw,cokl->bokhlw", x, w.astype(x.dtype))  # B,Co,2,H,2,W
    out = out.transpose(0, 1, 3, 2, 5, 4).reshape(B, Co, 2 * H, 2 * W)
    if b is not None:
        out += b.astype(x.dtype)[None, :, None, None]
    return out


def sigmoid(x):
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[pos == False])  # noqa: E712
    out[pos == False] = e / (1.0 + e)  # noqa: E712
    return out


# ------------------------------------------------------------- ResNet-50

#: (n_blocks, mid_channels) per layer; out = 4 * mid
RESNET50_LAYERS = [(3, 64), (4, 128), (6, 256), (3, 512)]


def _bottleneck(x, p, prefix: str, stride: int):
    """torchvision Bottleneck (v1.5: stride on the 3x3)."""
    idn = x
    out = conv2d(x, p[f"{prefix}.conv1.weight"])
    out = bn_relu(out, p, f"{prefix}.bn1")
    out = conv2d(out, p[f"{prefix}.conv2.weight"], stride=stride, pad=1)
    out = bn_relu(out, p, f"{prefix}.bn2")
    out = conv2d(out, p[f"{prefix}.conv3.weight"])
    out = bn_relu(out, p, f"{prefix}.bn3", relu=False)
    if f"{prefix}.downsample.0.weight" in p:
        idn = conv2d(x, p[f"{prefix}.downsample.0.weight"], stride=stride)
        idn = bn_relu(idn, p, f"{prefix}.downsample.1", relu=False)
    out += idn
    np.maximum(out, 0, out=out)
    return out


#: BasicBlock counts per layer (torchvision resnet34 — db_resnet34)
RESNET34_LAYERS = [3, 4, 6, 3]


class DBNetNumpy:
    """Numpy ``db_resnet50`` / ``db_resnet34`` inference tower +
    straight-pages postprocessing. ``weights``: path / ObjectRef /
    dict consumed once by :func:`doctr_ray.weights.load_weights`;
    keys follow the torch state dict (``feat_extractor.*``,
    ``fpn.*``, ``prob_head.*``)."""

    MEAN = np.array([0.798, 0.785, 0.772], np.float32)
    STD = np.array([0.264, 0.2749, 0.287], np.float32)

    def __init__(
        self,
        weights,
        arch: str = "db_resnet50",
        bin_thresh: float = 0.3,
        box_thresh: float = 0.1,
        input_shape: tuple[int, int] = (1024, 1024),
    ):
        from .weights import load_weights

        if arch not in ("db_resnet50", "db_resnet34"):
            raise ValueError(f"unknown dbnet arch '{arch}'")
        self.arch = arch
        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.input_shape = input_shape

    # -- backbone --------------------------------------------------------
    def features(self, x: np.ndarray) -> list[np.ndarray]:
        """(B,3,H,W) -> [layer1..layer4] maps at 1/4..1/32 (bottleneck
        blocks for resnet50, BasicBlocks for resnet34)."""
        p = self.p
        out = conv2d(x, p["feat_extractor.conv1.weight"], stride=2, pad=3)
        out = bn_relu(out, p, "feat_extractor.bn1")
        out = maxpool2d_s(out, 3, 2, 1)
        feats = []
        if self.arch == "db_resnet34":
            from .linknet import basic_block

            for li, n_blocks in enumerate(RESNET34_LAYERS, start=1):
                for bi in range(n_blocks):
                    stride = 2 if (bi == 0 and li > 1) else 1
                    out = basic_block(out, p, f"feat_extractor.layer{li}.{bi}", stride)
                feats.append(out)
            return feats
        for li, (n_blocks, _mid) in enumerate(RESNET50_LAYERS, start=1):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 1) else 1
                out = _bottleneck(
                    out, p, f"feat_extractor.layer{li}.{bi}", stride
                )
            feats.append(out)
        return feats

    def fpn(self, feats: list[np.ndarray]) -> np.ndarray:
        """FPN (pytorch.py:48-93): 256-ch laterals, top-down adds,
        64-ch out branches upsampled to 1/4, concat."""
        p = self.p
        lat = []
        for i, f in enumerate(feats):
            t = conv2d(f, p[f"fpn.in_branches.{i}.0.weight"])
            lat.append(bn_relu(t, p, f"fpn.in_branches.{i}.1"))
        out = [lat[-1]]
        for t in lat[:-1][::-1]:
            out.append(bilinear_upsample(out[-1], 2) + t)
        out = out[::-1]  # finest first
        branches = []
        for i, t in enumerate(out):
            t = conv2d(t, p[f"fpn.out_branches.{i}.0.weight"], pad=1)
            t = bn_relu(t, p, f"fpn.out_branches.{i}.1")
            branches.append(bilinear_upsample(t, 2**i))
        return np.concatenate(branches, axis=1)

    def prob_map(self, x: np.ndarray) -> np.ndarray:
        """(B,3,H,W) float32 -> (B,1,H,W) probability map."""
        p = self.p
        f = self.fpn(self.features(np.ascontiguousarray(x, np.float32)))
        h = conv2d(f, p["prob_head.0.weight"], pad=1)
        h = bn_relu(h, p, "prob_head.1")
        h = conv_transpose_2x2(h, p["prob_head.3.weight"])
        h = bn_relu(h, p, "prob_head.4")
        h = conv_transpose_2x2(
            h, p["prob_head.6.weight"], p.get("prob_head.6.bias")
        )
        return sigmoid(h)

    # -- postprocess (DBPostProcessor straight-pages analog) -------------
    def boxes_from_prob(self, prob: np.ndarray) -> np.ndarray:
        """(H,W) prob map -> (N,5) relative [xmin ymin xmax ymax score]
        (base.py:88-154: binarize, connected components, bounding
        rect, mean-prob score, box_thresh filter, min size 2)."""
        from .detection import connected_component_boxes

        H, W = prob.shape
        mask = prob > self.bin_thresh
        boxes = connected_component_boxes(mask)
        out = []
        for x0, y0, x1, y1 in boxes:
            if x1 - x0 < 2 or y1 - y0 < 2:
                continue
            score = float(prob[y0:y1, x0:x1].mean())
            if score < self.box_thresh:
                continue
            out.append([x0 / W, y0 / H, x1 / W, y1 / H, score])
        return (
            np.asarray(out, np.float32) if out else np.zeros((0, 5), np.float32)
        )

    def detect(self, page: np.ndarray) -> np.ndarray:
        """Gray/RGB uint8 page -> (N,5) relative boxes (aspect-pad
        preprocess + forward + postprocess + padding removal)."""
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
            boxes[:, :4] = remove_padding_coords(
                boxes[:, :4], (th, tw), padding
            )
        return boxes


class DBNetMobileNet(DBNetNumpy):
    """Numpy ``db_mobilenet_v3_large`` inference tower (reference
    differentiable_binarization/pytorch.py db_mobilenet_v3_large
    factory: the DB FPN + prob head over torchvision
    mobilenet_v3_large features tapped at Sequential indices
    [3, 6, 12, 16] -> channel pyramid [24, 40, 112, 960] at
    1/4..1/32). Keys: ``feat_extractor.{0..16}.*`` (the features
    stack under the IntermediateLayerGetter's preserved child names)
    plus the shared ``fpn.*`` / ``prob_head.*``."""

    TAPS = (3, 6, 12, 16)

    def __init__(
        self,
        weights,
        bin_thresh: float = 0.3,
        box_thresh: float = 0.1,
        input_shape: tuple[int, int] = (1024, 1024),
    ):
        from .mobilenet import MobileNetV3Large

        # ONE load: the backbone loads the full blob; FPN/head share it
        self.backbone = MobileNetV3Large(weights, prefix="feat_extractor")
        self.p = self.backbone.p
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.input_shape = input_shape

    def features(self, x: np.ndarray) -> list[np.ndarray]:
        """(B,3,H,W) -> the four tapped maps at 1/4..1/32."""
        return self.backbone.feature_taps(x, self.TAPS)


# ---------------------------------------------------------------- fixtures


def random_dbnet_weights(
    seed: int = 0, num_classes: int = 1, arch: str = "db_resnet50"
) -> dict:
    """Fixed-seed checkpoint with the exact torch state-dict key set of
    db_resnet50 / db_resnet34 (backbone + fpn + prob_head; the
    thresh_head is a training-only branch and not required for
    inference)."""
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, c, k):
        p[name] = (
            rng.standard_normal((o, c, k, k)) * np.sqrt(2.0 / (o * k * k))
        ).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(
            np.float32
        )
        p[f"{name}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)

    conv("feat_extractor.conv1.weight", 64, 3, 7)
    bn("feat_extractor.bn1", 64)
    in_ch = 64
    if arch == "db_resnet34":
        for li, n_blocks in enumerate(RESNET34_LAYERS, start=1):
            out_ch = 64 * 2 ** (li - 1)
            for bi in range(n_blocks):
                pre = f"feat_extractor.layer{li}.{bi}"
                conv(f"{pre}.conv1.weight", out_ch, in_ch, 3)
                bn(f"{pre}.bn1", out_ch)
                conv(f"{pre}.conv2.weight", out_ch, out_ch, 3)
                bn(f"{pre}.bn2", out_ch)
                if bi == 0 and li > 1:
                    conv(f"{pre}.downsample.0.weight", out_ch, in_ch, 1)
                    bn(f"{pre}.downsample.1", out_ch)
                in_ch = out_ch
        fpn_in = [64, 128, 256, 512]
    else:
        for li, (n_blocks, mid) in enumerate(RESNET50_LAYERS, start=1):
            out_ch = mid * 4
            for bi in range(n_blocks):
                pre = f"feat_extractor.layer{li}.{bi}"
                conv(f"{pre}.conv1.weight", mid, in_ch, 1)
                bn(f"{pre}.bn1", mid)
                conv(f"{pre}.conv2.weight", mid, mid, 3)
                bn(f"{pre}.bn2", mid)
                conv(f"{pre}.conv3.weight", out_ch, mid, 1)
                bn(f"{pre}.bn3", out_ch)
                if bi == 0:
                    conv(f"{pre}.downsample.0.weight", out_ch, in_ch, 1)
                    bn(f"{pre}.downsample.1", out_ch)
                in_ch = out_ch
        fpn_in = [256, 512, 1024, 2048]
    for i, c in enumerate(fpn_in):
        conv(f"fpn.in_branches.{i}.0.weight", 256, c, 1)
        bn(f"fpn.in_branches.{i}.1", 256)
        conv(f"fpn.out_branches.{i}.0.weight", 64, 256, 3)
        bn(f"fpn.out_branches.{i}.1", 64)
    conv("prob_head.0.weight", 64, 256, 3)
    bn("prob_head.1", 64)
    p["prob_head.3.weight"] = (
        rng.standard_normal((64, 64, 2, 2)) * 0.1
    ).astype(np.float32)
    bn("prob_head.4", 64)
    p["prob_head.6.weight"] = (
        rng.standard_normal((64, num_classes, 2, 2)) * 0.1
    ).astype(np.float32)
    p["prob_head.6.bias"] = np.zeros(num_classes, np.float32)
    return p


def random_db_mobilenet_weights(seed: int = 0, num_classes: int = 1) -> dict:
    """Fixed-seed checkpoint with the exact torch key set of
    db_mobilenet_v3_large (mobilenet features under
    ``feat_extractor.*`` + the shared fpn / prob_head)."""
    from .mobilenet import LARGE_CONF, LARGE_LAST_CONV, random_mobilenet_weights

    p = random_mobilenet_weights(
        seed=seed, conf=LARGE_CONF, last_conv=LARGE_LAST_CONV,
        prefix="feat_extractor", include_classifier=False,
    )
    rng = np.random.RandomState(seed + 1)

    def conv(name, o, c, k):
        p[name] = (
            rng.standard_normal((o, c, k, k)) * np.sqrt(2.0 / (o * k * k))
        ).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        p[f"{name}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)

    # the taps' channel pyramid: blocks 3 / 6 / 12 and the final conv
    fpn_in = [LARGE_CONF[2][3], LARGE_CONF[5][3], LARGE_CONF[11][3], LARGE_LAST_CONV]
    for i, c in enumerate(fpn_in):
        conv(f"fpn.in_branches.{i}.0.weight", 256, c, 1)
        bn(f"fpn.in_branches.{i}.1", 256)
        conv(f"fpn.out_branches.{i}.0.weight", 64, 256, 3)
        bn(f"fpn.out_branches.{i}.1", 64)
    conv("prob_head.0.weight", 64, 256, 3)
    bn("prob_head.1", 64)
    p["prob_head.3.weight"] = (rng.standard_normal((64, 64, 2, 2)) * 0.1).astype(np.float32)
    bn("prob_head.4", 64)
    p["prob_head.6.weight"] = (
        rng.standard_normal((64, num_classes, 2, 2)) * 0.1
    ).astype(np.float32)
    p["prob_head.6.bias"] = np.zeros(num_classes, np.float32)
    return p
