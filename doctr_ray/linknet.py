"""Numpy forward pass for the reference LinkNet detection architecture.

The reference's ``linknet_resnet18`` / ``linknet_resnet34`` towers
(detection/linknet/pytorch.py:46-160 model + :263-376 factories;
backbone = torchvision ResNet BasicBlock stacks via doctr's
classification/resnet/pytorch.py:110-176 ``resnet18``/``resnet34``)
re-implemented layer-for-layer as pure-numpy INFERENCE so a real torch
checkpoint — converted to ``.npz`` with the same state-dict key
names — runs inside this engine's detection actors without torch:

- ResNet-18/34 encoder (torchvision BasicBlock: conv3x3-s/bn/relu +
  conv3x3/bn + identity-or-downsample add + relu), stem conv7x7-s2 +
  maxpool3x3-s2 -> [layer1..layer4] maps at 1/4..1/32
- LinkNetFPN (linknet/pytorch.py:46-88): decoder blocks
  ``conv1x1(in->in/4) / BN / ReLU / convT3x3(stride, out_pad=s-1) /
  BN / ReLU / conv1x1(->out) / BN / ReLU``; top-down
  ``decoder(out) + skip`` from layer4 down to layer1, then the
  stride-1 ``decoders[0]`` pass
- classifier head (linknet/pytorch.py:137-147): convT3x3-s2(64->32) /
  BN / ReLU / conv3x3(32->32) / BN / ReLU / convT2x2-s2(->classes,
  with bias), sigmoid -> full-resolution probability map
- postprocessing: the LinkNetPostProcessor straight-pages analog
  (linknet/base.py: bin_thresh=0.1 binarize, connected components,
  bounding rects, mean-prob score >= box_thresh=0.1) — the same
  connected-component machinery the DBNet tower uses

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_linknet_weights` builds a fixed-seed checkpoint with the
exact torch key set for shape/parity tests and fixtures. The conv /
BN / pool / upsample kernels are shared with :mod:`doctr_ray.dbnet`.
"""

from __future__ import annotations

import numpy as np

from .dbnet import bn_relu, conv2d, maxpool2d_s, sigmoid

# ---------------------------------------------------------------- kernels


def conv_transpose2d(
    x: np.ndarray,
    w: np.ndarray,
    b: np.ndarray | None = None,
    stride: int = 1,
    pad: int = 0,
    output_pad: int = 0,
) -> np.ndarray:
    """General ``nn.ConvTranspose2d`` (NCHW; w is torch's
    (C_in, C_out, kh, kw)): dilate the input by ``stride``, pad by
    ``k - 1 - pad`` (+ ``output_pad`` at the bottom/right), then run a
    normal correlation with the spatially-flipped, channel-transposed
    kernel. Output size = (H-1)*stride - 2*pad + k + output_pad."""
    B, C, H, W = x.shape
    _, O, kh, kw = w.shape
    if stride > 1:
        xd = np.zeros((B, C, (H - 1) * stride + 1, (W - 1) * stride + 1), x.dtype)
        xd[:, :, ::stride, ::stride] = x
    else:
        xd = x
    ph, pw = kh - 1 - pad, kw - 1 - pad
    xp = np.pad(xd, ((0, 0), (0, 0), (ph, ph + output_pad), (pw, pw + output_pad)))
    wf = np.ascontiguousarray(w.transpose(1, 0, 2, 3)[:, :, ::-1, ::-1])
    return conv2d(xp, wf, b, stride=1, pad=0)


def basic_block(x: np.ndarray, p: dict, prefix: str, stride: int) -> np.ndarray:
    """torchvision ``BasicBlock``: conv3x3-stride/bn/relu +
    conv3x3/bn, residual add (1x1-conv downsample when present),
    final relu."""
    out = conv2d(x, p[f"{prefix}.conv1.weight"], stride=stride, pad=1)
    out = bn_relu(out, p, f"{prefix}.bn1")
    out = conv2d(out, p[f"{prefix}.conv2.weight"], pad=1)
    out = bn_relu(out, p, f"{prefix}.bn2", relu=False)
    if f"{prefix}.downsample.0.weight" in p:
        idn = conv2d(x, p[f"{prefix}.downsample.0.weight"], stride=stride)
        idn = bn_relu(idn, p, f"{prefix}.downsample.1", relu=False)
    else:
        idn = x
    out = out + idn
    np.maximum(out, 0, out=out)
    return out


# ------------------------------------------------------------- architecture

#: per arch: (blocks per layer, block kind, channels per layer)
#: — torchvision resnet18/34 (BasicBlock) and resnet50 (Bottleneck)
LINKNET_ARCHS = {
    "linknet_resnet18": ([2, 2, 2, 2], "basic", [64, 128, 256, 512]),
    "linknet_resnet34": ([3, 4, 6, 3], "basic", [64, 128, 256, 512]),
    "linknet_resnet50": ([3, 4, 6, 3], "bottleneck", [256, 512, 1024, 2048]),
}
#: legacy alias (blocks per layer) used by fixtures/tests
LINKNET_LAYERS = {k: v[0] for k, v in LINKNET_ARCHS.items()}


def _decoder_rows(chans: list[int]) -> list[tuple[int, int, int]]:
    """FPN decoder (in_chan, out_chan, stride) rows — linknet/
    pytorch.py:46-61 builds decoder_block(ochan, ichan, stride) over
    the consecutive [stem-resolution] + layer channels with stride 2
    wherever resolution halves (the first pair shares 1/4 res)."""
    full = [chans[0]] + chans
    return [
        (full[i + 1], full[i], 1 if i == 0 else 2) for i in range(len(chans))
    ]


class LinkNetNumpy:
    """Numpy ``linknet_resnet18`` / ``linknet_resnet34`` inference
    tower + straight-pages postprocessing. ``weights``: path /
    ObjectRef / dict consumed once by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict (``feat_extractor.*``, ``fpn.decoders.*``,
    ``classifier.*``)."""

    MEAN = np.array([0.798, 0.785, 0.772], np.float32)
    STD = np.array([0.264, 0.2749, 0.287], np.float32)

    def __init__(
        self,
        weights,
        arch: str = "linknet_resnet18",
        bin_thresh: float = 0.1,
        box_thresh: float = 0.1,
        input_shape: tuple[int, int] = (1024, 1024),
    ):
        from .weights import load_weights

        if arch not in LINKNET_ARCHS:
            raise ValueError(f"unknown linknet arch '{arch}'")
        self.arch = arch
        self.blocks, self.kind, self.chans = LINKNET_ARCHS[arch]
        self.decoders = _decoder_rows(self.chans)
        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.input_shape = input_shape

    # -- encoder ----------------------------------------------------------
    def features(self, x: np.ndarray) -> list[np.ndarray]:
        """(B,3,H,W) -> [layer1..layer4] maps at 1/4..1/32."""
        p = self.p
        out = conv2d(x, p["feat_extractor.conv1.weight"], stride=2, pad=3)
        out = bn_relu(out, p, "feat_extractor.bn1")
        out = maxpool2d_s(out, 3, 2, 1)
        feats = []
        if self.kind == "bottleneck":
            from .dbnet import _bottleneck as block_fn
        else:
            block_fn = basic_block
        for li, n_blocks in enumerate(self.blocks, start=1):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 1) else 1
                out = block_fn(out, p, f"feat_extractor.layer{li}.{bi}", stride)
            feats.append(out)
        return feats

    def _decoder(self, x: np.ndarray, i: int, stride: int) -> np.ndarray:
        """One LinkNetFPN decoder block (linknet/pytorch.py:63-78)."""
        p = self.p
        d = f"fpn.decoders.{i}"
        out = conv2d(x, p[f"{d}.0.weight"])
        out = bn_relu(out, p, f"{d}.1")
        out = conv_transpose2d(
            out, p[f"{d}.3.weight"], stride=stride, pad=1, output_pad=stride - 1
        )
        out = bn_relu(out, p, f"{d}.4")
        out = conv2d(out, p[f"{d}.6.weight"])
        return bn_relu(out, p, f"{d}.7")

    def fpn(self, feats: list[np.ndarray]) -> np.ndarray:
        """Top-down decoder adds (linknet/pytorch.py:80-88):
        ``decoders[i](out) + feats[i-1]`` from layer4 to layer1, then
        the stride-1 ``decoders[0]``."""
        out = feats[-1]
        for i in range(len(self.decoders) - 1, 0, -1):
            out = self._decoder(out, i, self.decoders[i][2]) + feats[i - 1]
        return self._decoder(out, 0, self.decoders[0][2])

    def prob_map(self, x: np.ndarray) -> np.ndarray:
        """(B,3,H,W) float32 -> (B,classes,H,W) probability map
        (classifier head, linknet/pytorch.py:137-147)."""
        p = self.p
        f = self.fpn(self.features(np.ascontiguousarray(x, np.float32)))
        h = conv_transpose2d(f, p["classifier.0.weight"], stride=2, pad=1, output_pad=1)
        h = bn_relu(h, p, "classifier.1")
        h = conv2d(h, p["classifier.3.weight"], pad=1)
        h = bn_relu(h, p, "classifier.4")
        h = conv_transpose2d(h, p["classifier.6.weight"], p["classifier.6.bias"], stride=2)
        return sigmoid(h)

    # -- postprocess (LinkNetPostProcessor straight-pages analog) ---------
    def boxes_from_prob(self, prob: np.ndarray) -> np.ndarray:
        """(H,W) prob map -> (N,5) relative [xmin ymin xmax ymax score]
        (linknet/base.py: binarize at bin_thresh, connected
        components, bounding rect, mean-prob score, box_thresh
        filter, min size 2)."""
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
        return np.asarray(out, np.float32) if out else np.zeros((0, 5), np.float32)

    def detect(self, page: np.ndarray) -> np.ndarray:
        """Gray/RGB uint8 page -> (N,5) relative boxes (aspect-pad
        preprocess + forward + postprocess + padding removal) — the
        slot contract shared with :class:`doctr_ray.dbnet.DBNetNumpy`."""
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
        return f"LinkNetNumpy(arch={self.arch}, input={self.input_shape})"


# ---------------------------------------------------------------- fixtures


def random_linknet_weights(
    arch: str = "linknet_resnet18", seed: int = 0, num_classes: int = 1
) -> dict:
    """Fixed-seed checkpoint with the exact torch state-dict key set of
    the reference LinkNet (the reference's own model tests instantiate
    archs with random weights and assert output shape/structure)."""
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, c, k):
        p[f"{name}.weight"] = (
            rng.standard_normal((o, c, k, k)) * np.sqrt(2.0 / (o * k * k))
        ).astype(np.float32)

    def convt(name, c_in, c_out, k, bias=False):
        p[f"{name}.weight"] = (
            rng.standard_normal((c_in, c_out, k, k)) * np.sqrt(2.0 / (c_out * k * k))
        ).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = np.zeros(c_out, np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        p[f"{name}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)

    blocks, kind, chans = LINKNET_ARCHS[arch]
    conv("feat_extractor.conv1", 64, 3, 7)
    bn("feat_extractor.bn1", 64)
    in_ch = 64
    for li, n_blocks in enumerate(blocks, start=1):
        out_ch = chans[li - 1]
        mid_ch = out_ch // 4 if kind == "bottleneck" else out_ch
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and li > 1) else 1
            pre = f"feat_extractor.layer{li}.{bi}"
            if kind == "bottleneck":
                conv(f"{pre}.conv1", mid_ch, in_ch, 1)
                bn(f"{pre}.bn1", mid_ch)
                conv(f"{pre}.conv2", mid_ch, mid_ch, 3)
                bn(f"{pre}.bn2", mid_ch)
                conv(f"{pre}.conv3", out_ch, mid_ch, 1)
                bn(f"{pre}.bn3", out_ch)
            else:
                conv(f"{pre}.conv1", out_ch, in_ch, 3)
                bn(f"{pre}.bn1", out_ch)
                conv(f"{pre}.conv2", out_ch, out_ch, 3)
                bn(f"{pre}.bn2", out_ch)
            if stride != 1 or in_ch != out_ch:
                conv(f"{pre}.downsample.0", out_ch, in_ch, 1)
                bn(f"{pre}.downsample.1", out_ch)
            in_ch = out_ch
    for i, (d_in, d_out, stride) in enumerate(_decoder_rows(chans)):
        mid = d_in // 4
        conv(f"fpn.decoders.{i}.0", mid, d_in, 1)
        bn(f"fpn.decoders.{i}.1", mid)
        convt(f"fpn.decoders.{i}.3", mid, mid, 3)
        bn(f"fpn.decoders.{i}.4", mid)
        conv(f"fpn.decoders.{i}.6", d_out, mid, 1)
        bn(f"fpn.decoders.{i}.7", d_out)
    convt("classifier.0", chans[0], 32, 3)
    bn("classifier.1", 32)
    conv("classifier.3", 32, 32, 3)
    bn("classifier.4", 32)
    convt("classifier.6", 32, num_classes, 2, bias=True)
    return p
