"""Numpy forward pass for the reference MobileNetV3-small classifier.

The reference's orientation predictors
(``mobilenet_v3_small_page_orientation`` /
``mobilenet_v3_small_crop_orientation``,
classification/mobilenet/pytorch.py:58-73 configs, :79-130 builder —
torchvision's MobileNetV3 with a 4-class head over [0, -90, 180, 90])
re-implemented layer-for-layer as pure-numpy INFERENCE so a real torch
checkpoint — converted to ``.npz`` with the same state-dict key
names — classifies page/crop rotation without torch in the container:

- stem: 3x3/s2 conv -> BN -> hardswish (``features.0``);
- the 11 inverted-residual blocks of the *small* profile
  (torchvision mobilenetv3.py ``_mobilenet_v3_conf``): optional 1x1
  expand, kxk depthwise (stride per config), optional
  squeeze-excitation (ReLU fc1 / hardsigmoid fc2), 1x1 linear
  project, residual when stride 1 and channels match;
- ``features.12``: 1x1 conv 96 -> 576 -> BN -> hardswish;
- global average pool, classifier Linear 576 -> 1024 -> hardswish ->
  Linear 1024 -> n_classes (dropout is inference-identity).

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_mobilenet_weights` builds a full fixed-seed torch-keyed
checkpoint for shape/parity tests (the reference's own classification
tests instantiate archs with random weights and assert output
structure).
"""

from __future__ import annotations

import numpy as np

from .dbnet import bn_relu, conv2d
from .weights import load_weights

#: torchvision _mobilenet_v3_conf("mobilenet_v3_small") rows:
#: (in_c, kernel, expanded_c, out_c, use_se, use_hs, stride)
SMALL_CONF = (
    (16, 3, 16, 16, True, False, 2),
    (16, 3, 72, 24, False, False, 2),
    (24, 3, 88, 24, False, False, 1),
    (24, 5, 96, 40, True, True, 2),
    (40, 5, 240, 40, True, True, 1),
    (40, 5, 240, 40, True, True, 1),
    (40, 5, 120, 48, True, True, 1),
    (48, 5, 144, 48, True, True, 1),
    (48, 5, 288, 96, True, True, 2),
    (96, 5, 576, 96, True, True, 1),
    (96, 5, 576, 96, True, True, 1),
)
LAST_CONV = 576  # 6 * 96
LAST_CHANNEL = 1024

#: torchvision _mobilenet_v3_conf("mobilenet_v3_large") rows
LARGE_CONF = (
    (16, 3, 16, 16, False, False, 1),
    (16, 3, 64, 24, False, False, 2),
    (24, 3, 72, 24, False, False, 1),
    (24, 5, 72, 40, True, False, 2),
    (40, 5, 120, 40, True, False, 1),
    (40, 5, 120, 40, True, False, 1),
    (40, 3, 240, 80, False, True, 2),
    (80, 3, 200, 80, False, True, 1),
    (80, 3, 184, 80, False, True, 1),
    (80, 3, 184, 80, False, True, 1),
    (80, 3, 480, 112, True, True, 1),
    (112, 3, 672, 112, True, True, 1),
    (112, 5, 672, 160, True, True, 2),
    (160, 5, 960, 160, True, True, 1),
    (160, 5, 960, 160, True, True, 1),
)
LARGE_LAST_CONV = 960  # 6 * 160

#: the reference's rectangular-stride block indices for the ``_r``
#: recognition backbones (mobilenet/pytorch.py:151-176 small_r,
#: :204-229 large_r): these depthwise convs run stride (2, 1)
SMALL_RECT_STRIDES = frozenset({2, 4, 9})
LARGE_RECT_STRIDES = frozenset({4, 7, 13})

#: the reference's orientation classes (mobilenet/pytorch.py:64,72)
ORIENTATION_CLASSES = (0, -90, 180, 90)


def _divisible(v: float, divisor: int = 8) -> int:
    """torchvision _make_divisible (SE squeeze-channel rule)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardsigmoid(x: np.ndarray) -> np.ndarray:
    return np.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hardswish(x: np.ndarray) -> np.ndarray:
    return x * hardsigmoid(x)


def depthwise_conv2d(x, w, stride=1, pad: int = 0):
    """Depthwise NCHW convolution (groups == channels): ``w`` is
    (C, 1, k, k), each channel convolved with its own filter.
    ``stride`` may be an int or an (sh, sw) pair (the ``_r``
    recognition backbones run (2, 1) rectangular strides)."""
    k = w.shape[2]
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    win = np.lib.stride_tricks.sliding_window_view(x, (k, k), axis=(2, 3))
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    if sh > 1 or sw > 1:
        win = win[:, :, ::sh, ::sw]
    return np.einsum(
        "bchwij,cij->bchw", win, w[:, 0].astype(x.dtype), optimize=True
    )


class MobileNetV3Small:
    """torchvision-keyed MobileNetV3-small inference tower.

    ``src`` is anything :func:`doctr_ray.weights.load_weights`
    accepts (``.npz`` path, object-store ref, or dict). ``classes``
    defaults to the reference's orientation labels. ``prefix`` names
    the features stack in the checkpoint (``features`` standalone,
    ``feat_extractor`` when embedded in a recognition model) and
    ``rect_strides`` lists block indices whose depthwise conv runs
    stride (2, 1) — the ``_r`` recognition-backbone variants."""

    CONF = SMALL_CONF
    LAST_C = LAST_CONV

    def __init__(self, src, classes=ORIENTATION_CLASSES, prefix: str = "features",
                 rect_strides=frozenset()):
        self.p = {k: np.asarray(v) for k, v in load_weights(src).items()}
        self.classes = tuple(classes)
        self.prefix = prefix
        self.rect_strides = frozenset(rect_strides)

    # ------------------------------------------------------ forward

    def _se(self, x, prefix: str):
        s = x.mean(axis=(2, 3), keepdims=True)  # squeeze
        s = conv2d(s, self.p[f"{prefix}.fc1.weight"], self.p[f"{prefix}.fc1.bias"])
        s = np.maximum(s, 0.0)
        s = conv2d(s, self.p[f"{prefix}.fc2.weight"], self.p[f"{prefix}.fc2.bias"])
        return x * hardsigmoid(s)

    def _cna(self, x, prefix: str, stride: int = 1, act: str = "hs",
             depthwise: bool = False):
        """Conv2dNormActivation: conv (no bias) -> BN -> activation."""
        w = self.p[f"{prefix}.0.weight"]
        pad = (w.shape[2] - 1) // 2
        if depthwise:
            x = depthwise_conv2d(x, w, stride=stride, pad=pad)
        else:
            x = conv2d(x, w, stride=stride, pad=pad)
        x = bn_relu(x, self.p, f"{prefix}.1", relu=False)
        if act == "re":
            return np.maximum(x, 0.0)
        if act == "hs":
            return hardswish(x)
        return x  # linear (project layers)

    def _block(self, x: np.ndarray, i: int, row) -> np.ndarray:
        """Inverted-residual block ``features.{i}`` (torchvision
        InvertedResidual): expand / depthwise / SE / project +
        residual."""
        pre = self.prefix
        in_c, _k, exp_c, out_c, use_se, use_hs, stride = row
        if i in self.rect_strides:
            stride = (2, 1)
        act = "hs" if use_hs else "re"
        sub = 0
        res = x
        if exp_c != in_c:
            x = self._cna(x, f"{pre}.{i}.block.0", act=act)
            sub = 1
        x = self._cna(
            x, f"{pre}.{i}.block.{sub}", stride=stride, act=act, depthwise=True
        )
        sub += 1
        if use_se:
            x = self._se(x, f"{pre}.{i}.block.{sub}")
            sub += 1
        x = self._cna(x, f"{pre}.{i}.block.{sub}", act="none")
        if stride == 1 and in_c == out_c:
            x = x + res
        return x

    def feature_taps(self, x: np.ndarray, taps) -> list[np.ndarray]:
        """Run the features stack collecting outputs at the given
        Sequential indices in ascending order — the
        ``IntermediateLayerGetter`` analog a detection FPN consumes
        (index 0 = stem, 1..len(CONF) = blocks, len(CONF)+1 = the
        final 1x1 conv)."""
        taps = sorted(set(taps))
        last = len(self.CONF) + 1
        out: dict[int, np.ndarray] = {}
        x = x.astype(np.float32, copy=False)
        x = self._cna(x, f"{self.prefix}.0", stride=2, act="hs")
        if 0 in taps:
            out[0] = x
        for i, row in enumerate(self.CONF, start=1):
            if i > max(taps):
                break
            x = self._block(x, i, row)
            if i in taps:
                out[i] = x
        if last in taps:
            x = self._cna(x, f"{self.prefix}.{last}", act="hs")
            out[last] = x
        return [out[t] for t in taps]

    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, H, W) float32 -> the final feature map
        (B, LAST_C, H', W') — the ``.features`` stack a recognition
        head consumes."""
        return self.feature_taps(x, [len(self.CONF) + 1])[0]

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, H, W) float32 -> (B, n_classes) logits."""
        x = self.features(x)
        x = x.mean(axis=(2, 3))  # AdaptiveAvgPool2d(1) + flatten
        x = x @ self.p["classifier.0.weight"].T + self.p["classifier.0.bias"]
        x = hardswish(x)
        return x @ self.p["classifier.3.weight"].T + self.p["classifier.3.bias"]

    # ------------------------------------------------- classification

    def classify(self, images: np.ndarray):
        """(B, 3, H, W) -> (class indices, angles, softmax probs) —
        the reference OrientationPredictor postprocess
        (classification/predictor/pytorch.py:48-60)."""
        logits = self.forward(images)
        idx = logits.argmax(axis=1)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        angles = np.asarray(self.classes)[idx]
        return idx, angles, probs[np.arange(len(idx)), idx]


class MobileNetV3Large(MobileNetV3Small):
    """torchvision-keyed MobileNetV3-LARGE profile (same key scheme,
    15 inverted-residual blocks, final conv 160 -> 960)."""

    CONF = LARGE_CONF
    LAST_C = LARGE_LAST_CONV


def random_mobilenet_weights(
    seed: int = 0,
    num_classes: int = 4,
    conf=SMALL_CONF,
    last_conv: int = LAST_CONV,
    prefix: str = "features",
    include_classifier: bool = True,
) -> dict:
    """Fixed-seed torch-keyed MobileNetV3 checkpoint (inference arrays
    only) for shape/parity tests and fixtures — small profile under
    ``features.*`` with a classifier head by default; pass
    ``LARGE_CONF``/``LARGE_LAST_CONV`` and ``prefix='feat_extractor'``
    with ``include_classifier=False`` for a recognition backbone."""
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, c, k):
        p[f"{name}.weight"] = rng.randn(o, c, k, k).astype(np.float32) * 0.1

    def bn(name, c):
        p[f"{name}.weight"] = 1.0 + rng.randn(c).astype(np.float32) * 0.05
        p[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.05
        p[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.05
        p[f"{name}.running_var"] = 1.0 + rng.rand(c).astype(np.float32) * 0.1

    conv(f"{prefix}.0.0", 16, 3, 3)
    bn(f"{prefix}.0.1", 16)
    for i, (in_c, k, exp_c, out_c, use_se, _hs, _s) in enumerate(conf, start=1):
        sub = 0
        if exp_c != in_c:
            conv(f"{prefix}.{i}.block.0.0", exp_c, in_c, 1)
            bn(f"{prefix}.{i}.block.0.1", exp_c)
            sub = 1
        p[f"{prefix}.{i}.block.{sub}.0.weight"] = (
            rng.randn(exp_c, 1, k, k).astype(np.float32) * 0.1
        )
        bn(f"{prefix}.{i}.block.{sub}.1", exp_c)
        sub += 1
        if use_se:
            sq = _divisible(exp_c // 4)
            p[f"{prefix}.{i}.block.{sub}.fc1.weight"] = (
                rng.randn(sq, exp_c, 1, 1).astype(np.float32) * 0.1
            )
            p[f"{prefix}.{i}.block.{sub}.fc1.bias"] = (
                rng.randn(sq).astype(np.float32) * 0.05
            )
            p[f"{prefix}.{i}.block.{sub}.fc2.weight"] = (
                rng.randn(exp_c, sq, 1, 1).astype(np.float32) * 0.1
            )
            p[f"{prefix}.{i}.block.{sub}.fc2.bias"] = (
                rng.randn(exp_c).astype(np.float32) * 0.05
            )
            sub += 1
        conv(f"{prefix}.{i}.block.{sub}.0", out_c, exp_c, 1)
        bn(f"{prefix}.{i}.block.{sub}.1", out_c)
    conv(f"{prefix}.{len(conf) + 1}.0", last_conv, conf[-1][3], 1)
    bn(f"{prefix}.{len(conf) + 1}.1", last_conv)
    if include_classifier:
        p["classifier.0.weight"] = (
            rng.randn(LAST_CHANNEL, last_conv).astype(np.float32) * 0.05
        )
        p["classifier.0.bias"] = rng.randn(LAST_CHANNEL).astype(np.float32) * 0.05
        p["classifier.3.weight"] = (
            rng.randn(num_classes, LAST_CHANNEL).astype(np.float32) * 0.05
        )
        p["classifier.3.bias"] = rng.randn(num_classes).astype(np.float32) * 0.05
    return p
