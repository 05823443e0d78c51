"""Numpy forward pass for the reference CRNN recognition architecture.

The reference's ``crnn_vgg16_bn`` tower (recognition/crnn/pytorch.py:
23-45 config, :96-233 model; backbone classification/vgg/pytorch.py:
32-112) re-implemented layer-for-layer as pure-numpy INFERENCE so a
real torch checkpoint — converted to ``.npz`` with the same state-dict
key names — runs inside this engine's recognition actors without torch
in the container:

- VGG16-bn ``features`` (torchvision cfg "D" + batch norm) with the
  reference's last-3 rectangular ``MaxPool2d((2, 1))`` swap
  (vgg/pytorch.py:50-55): input (B, 3, 32, 128) -> (B, 512, 1, 32)
- the CRNN head (crnn/pytorch.py:196-213): reshape to a W-major
  sequence (B, 32, 512), 2-layer bidirectional LSTM (128 units),
  linear projection to ``len(vocab) + 1`` logits
- CTC best-path decoding (crnn/pytorch.py:55-93): per-sequence
  confidence = min over time of the max softmax probability, argmax
  path collapsed with repeats removed and blank (= len(vocab)) dropped

Weights load once per actor through :mod:`doctr_ray.weights`
(path / object-store ref / dict), same contract as every other
stateful stage. :func:`random_crnn_weights` builds a full fixed-seed
checkpoint for shape/parity tests and fixtures.
"""

from __future__ import annotations

import numpy as np

from .vocabs import VOCABS, decode_sequence

# ---------------------------------------------------------------- kernels


def conv2d_3x3(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """3x3 / stride 1 / pad 1 convolution (the only conv shape in
    VGG16), NCHW, via one sliding-window im2col matmul per batch."""
    B, C, H, W = x.shape
    O = w.shape[0]
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (3, 3), axis=(2, 3))
    # (B, C, H, W, 3, 3) -> (B, H*W, C*9); flatten order (C, 3, 3)
    # matches w.reshape(O, C*9)
    cols = win.transpose(0, 2, 3, 1, 4, 5).reshape(B, H * W, C * 9)
    out = cols @ w.reshape(O, -1).T.astype(x.dtype) + b.astype(x.dtype)
    return out.reshape(B, H, W, O).transpose(0, 3, 1, 2)


def batchnorm2d(x, gamma, beta, mean, var, eps: float = 1e-5):
    """Inference-mode BatchNorm2d (running statistics)."""
    scale = (gamma / np.sqrt(var + eps)).astype(x.dtype)
    shift = (beta - mean * gamma / np.sqrt(var + eps)).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def maxpool2d(x: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """MaxPool2d with kernel == stride (the VGG pools: (2,2) / (2,1))."""
    B, C, H, W = x.shape
    x = x[:, :, : H // kh * kh, : W // kw * kw]
    return x.reshape(B, C, H // kh, kh, W // kw, kw).max(axis=(3, 5))


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # numerically stable split form
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def lstm_layer(x, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """One direction of one torch ``nn.LSTM`` layer (batch_first).

    Gate order in the stacked (4H, .) weights is torch's [i, f, g, o]:
    ``i,f,o = sigmoid``, ``g = tanh``, ``c = f*c + i*g``,
    ``h = o*tanh(c)``; both ``b_ih`` and ``b_hh`` are added. The input
    projection for ALL timesteps is one matmul; only the (B, H) hidden
    recurrence steps through time.
    """
    B, T, _ = x.shape
    H = w_hh.shape[1]
    xg = x @ w_ih.T.astype(x.dtype) + (b_ih + b_hh).astype(x.dtype)  # (B,T,4H)
    w_hh_t = w_hh.T.astype(x.dtype)
    h = np.zeros((B, H), x.dtype)
    c = np.zeros((B, H), x.dtype)
    out = np.empty((B, T, H), x.dtype)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        g = xg[:, t] + h @ w_hh_t
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H : 2 * H])
        gg = np.tanh(g[:, 2 * H : 3 * H])
        o = _sigmoid(g[:, 3 * H :])
        c = f * c + i * gg
        h = o * np.tanh(c)
        out[:, t] = h
    return out


def bilstm(x: np.ndarray, params: dict, num_layers: int = 2) -> np.ndarray:
    """Stacked bidirectional LSTM with torch state-dict key names
    (``decoder.weight_ih_l{k}[{_reverse}]`` ...); per-timestep output is
    ``concat(h_fwd[t], h_bwd[t])`` exactly like ``nn.LSTM``."""
    for k in range(num_layers):
        fwd = lstm_layer(
            x,
            params[f"decoder.weight_ih_l{k}"],
            params[f"decoder.weight_hh_l{k}"],
            params[f"decoder.bias_ih_l{k}"],
            params[f"decoder.bias_hh_l{k}"],
        )
        bwd = lstm_layer(
            x,
            params[f"decoder.weight_ih_l{k}_reverse"],
            params[f"decoder.weight_hh_l{k}_reverse"],
            params[f"decoder.bias_ih_l{k}_reverse"],
            params[f"decoder.bias_hh_l{k}_reverse"],
            reverse=True,
        )
        x = np.concatenate([fwd, bwd], axis=-1)
    return x


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def ctc_best_path(logits: np.ndarray, vocab: str) -> list[tuple[str, float]]:
    """Reference CTCPostProcessor.ctc_best_path (crnn/pytorch.py:55-80):
    confidence = min over time of the max softmax prob; word = argmax
    path with repeats collapsed then blank (index ``len(vocab)``)
    removed, decoded through the vocab."""
    blank = len(vocab)
    probs = softmax(logits, axis=-1).max(axis=-1).min(axis=1)  # (B,)
    paths = logits.argmax(axis=-1)  # (B, T)
    words = []
    for seq in paths:
        # collapse repeats, drop blank (itertools.groupby semantics)
        keep = np.ones(len(seq), bool)
        keep[1:] = seq[1:] != seq[:-1]
        ids = seq[keep]
        ids = ids[ids != blank]
        words.append(decode_sequence(ids.tolist(), vocab))
    return list(zip(words, [float(p) for p in probs]))


# ------------------------------------------------------------- architecture

#: torchvision VGG cfg "D": conv output channels between pools
_VGG_D = [[64, 64], [128, 128], [256, 256, 256], [512, 512, 512], [512, 512, 512]]
#: the reference swaps the LAST THREE pools to (2,1) (vgg/pytorch.py:50-55)
_POOLS = [(2, 2), (2, 2), (2, 1), (2, 1), (2, 1)]


def vgg16_bn_layout() -> list[tuple[str, int, int, int]]:
    """(kind, torch-Sequential index, in_ch, out_ch) rows for the
    ``features`` stack — the state-dict key map."""
    rows: list[tuple[str, int, int, int]] = []
    idx, in_ch = 0, 3
    for block, (kh, kw) in zip(_VGG_D, _POOLS):
        for out_ch in block:
            rows.append(("conv", idx, in_ch, out_ch))
            rows.append(("bn", idx + 1, out_ch, out_ch))
            idx += 3  # conv, bn, relu
            in_ch = out_ch
        rows.append(("pool", idx, kh, kw))
        idx += 1
    return rows


class CRNN:
    """Numpy ``crnn_vgg16_bn`` inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once here by
    :func:`doctr_ray.weights.load_weights` (the once-per-actor
    contract); keys follow the torch state dict of the reference model
    so ``{k: v.numpy() for k, v in sd.items()}`` of a real checkpoint
    is a valid blob. Preprocessing mirrors the reference PreProcessor
    for this arch (models/preprocessor/pytorch.py + default_cfgs
    mean/std, crnn/pytorch.py:24-29): aspect-preserving resize to
    32x128 with symmetric zero padding, /255, normalize.
    """

    MEAN = np.array([0.694, 0.695, 0.693], np.float32)
    STD = np.array([0.299, 0.296, 0.301], np.float32)
    INPUT_H, INPUT_W = 32, 128

    def __init__(self, weights, vocab: str | None = None, rnn_units: int = 128):
        from .weights import load_weights

        self.params = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        self.rnn_units = rnn_units
        n_classes = self.params["linear.weight"].shape[0]
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        if len(self.vocab) + 1 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 1} (vocab + CTC blank)"
            )
        self.layout = vgg16_bn_layout()

    # -- stages ---------------------------------------------------------
    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) float32 -> (B, 512, 1, 32)."""
        p = self.params
        for kind, idx, a, b in self.layout:
            if kind == "conv":
                x = conv2d_3x3(
                    x, p[f"feat_extractor.{idx}.weight"],
                    p[f"feat_extractor.{idx}.bias"],
                )
            elif kind == "bn":
                x = batchnorm2d(
                    x,
                    p[f"feat_extractor.{idx}.weight"],
                    p[f"feat_extractor.{idx}.bias"],
                    p[f"feat_extractor.{idx}.running_mean"],
                    p[f"feat_extractor.{idx}.running_var"],
                )
                np.maximum(x, 0, out=x)  # the ReLU following every BN
            else:
                x = maxpool2d(x, a, b)
        return x

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> logits (B, 32, len(vocab)+1)
        (crnn/pytorch.py:203-213: B x C x H x W -> B x W x C*H)."""
        f = self.features(np.ascontiguousarray(x, np.float32))
        B, c, h, w = f.shape
        seq = f.reshape(B, h * c, w).transpose(0, 2, 1)  # (B, W, C*H)
        dec = bilstm(seq, self.params)
        return dec @ self.params["linear.weight"].T.astype(dec.dtype) + self.params[
            "linear.bias"
        ].astype(dec.dtype)

    # -- crop API (GlyphRecognizer-compatible) ---------------------------
    def preprocess(self, crops: list[np.ndarray]) -> np.ndarray:
        """Grayscale or RGB uint8 crops -> normalized (B, 3, 32, 128)."""
        from .geometry import resize_aspect_pad

        out = np.empty((len(crops), 3, self.INPUT_H, self.INPUT_W), np.float32)
        for i, crop in enumerate(crops):
            g = crop if crop.ndim == 2 else crop.mean(axis=2).astype(crop.dtype)
            resized, _ = resize_aspect_pad(
                g, (self.INPUT_H, self.INPUT_W), pad_value=0
            )
            chan = resized.astype(np.float32) / 255.0
            out[i] = (chan[None, :, :] - self.MEAN[:, None, None]) / self.STD[
                :, None, None
            ]
        return out

    def recognize_batch(self, crops, masks=None, batch_size: int = 32):
        """list of crops -> list[(text, confidence)] — the slot contract
        shared with :class:`doctr_ray.recognition.GlyphRecognizer`
        (``masks`` is accepted for signature parity; a learned tower
        has no known-pixel fast path)."""
        preds: list[tuple[str, float]] = []
        for i in range(0, len(crops), batch_size):
            x = self.preprocess(list(crops[i : i + batch_size]))
            preds.extend(ctc_best_path(self.forward(x), self.vocab))
        return preds

    def __repr__(self) -> str:
        return f"CRNN(vocab={len(self.vocab)}, rnn_units={self.rnn_units})"


class CRNNMobileNet(CRNN):
    """Numpy ``crnn_mobilenet_v3_small`` / ``crnn_mobilenet_v3_large``
    inference tower (reference crnn/pytorch.py:289-339: the CRNN head
    over the ``_r`` rectangular-stride MobileNetV3 backbones,
    classification/mobilenet/pytorch.py:151-176 / :204-229).

    Checkpoint keys: the torchvision features stack under
    ``feat_extractor.*`` plus the shared CRNN ``decoder.*`` /
    ``linear.*`` head. The three stride-2 depthwise convs after the
    first downsample run (2, 1), so a (3, 32, 128) input leaves the
    backbone as (B, C_last, 1, 32) — the same 32-step sequence as the
    VGG tower with C_last = 576 (small) / 960 (large)."""

    def __init__(
        self,
        weights,
        arch: str = "crnn_mobilenet_v3_small",
        vocab: str | None = None,
        rnn_units: int = 128,
    ):
        from .mobilenet import (
            LARGE_RECT_STRIDES,
            SMALL_RECT_STRIDES,
            MobileNetV3Large,
            MobileNetV3Small,
        )

        if arch == "crnn_mobilenet_v3_small":
            cls, rect = MobileNetV3Small, SMALL_RECT_STRIDES
        elif arch == "crnn_mobilenet_v3_large":
            cls, rect = MobileNetV3Large, LARGE_RECT_STRIDES
        else:
            raise ValueError(f"unknown crnn-mobilenet arch '{arch}'")
        self.arch = arch
        # ONE load: the backbone loads the full blob; the head shares it
        self.backbone = cls(weights, prefix="feat_extractor", rect_strides=rect)
        self.params = self.backbone.p
        self.rnn_units = rnn_units
        n_classes = self.params["linear.weight"].shape[0]
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        if len(self.vocab) + 1 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 1} (vocab + CTC blank)"
            )

    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> (B, C_last, 1, 32) via the rectangular-
        stride MobileNetV3 stack."""
        return self.backbone.features(np.ascontiguousarray(x, np.float32))

    def __repr__(self) -> str:
        return f"CRNNMobileNet(arch={self.arch}, vocab={len(self.vocab)})"


# ---------------------------------------------------------------- fixtures


def random_crnn_weights(
    vocab_size: int | None = None, rnn_units: int = 128, seed: int = 0
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint with the exact torch state-dict key
    set — the random-weights parity fixture (the reference's own model
    tests instantiate archs with random weights and assert output
    shape/structure, tests/pytorch/test_models_recognition_pt.py)."""
    if vocab_size is None:
        vocab_size = len(VOCABS["french"])
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}
    for kind, idx, a, b in vgg16_bn_layout():
        if kind == "conv":
            fan_out = b * 9
            p[f"feat_extractor.{idx}.weight"] = (
                rng.standard_normal((b, a, 3, 3)) * np.sqrt(2.0 / fan_out)
            ).astype(np.float32)
            p[f"feat_extractor.{idx}.bias"] = np.zeros(b, np.float32)
        elif kind == "bn":
            p[f"feat_extractor.{idx}.weight"] = np.ones(b, np.float32)
            p[f"feat_extractor.{idx}.bias"] = np.zeros(b, np.float32)
            p[f"feat_extractor.{idx}.running_mean"] = (
                rng.standard_normal(b) * 0.1
            ).astype(np.float32)
            p[f"feat_extractor.{idx}.running_var"] = (
                1.0 + 0.1 * rng.rand(b)
            ).astype(np.float32)
    lstm_in = 512
    for k in range(2):
        in_sz = lstm_in if k == 0 else 2 * rnn_units
        bound = 1.0 / np.sqrt(rnn_units)
        for suf in ("", "_reverse"):
            p[f"decoder.weight_ih_l{k}{suf}"] = rng.uniform(
                -bound, bound, (4 * rnn_units, in_sz)
            ).astype(np.float32)
            p[f"decoder.weight_hh_l{k}{suf}"] = rng.uniform(
                -bound, bound, (4 * rnn_units, rnn_units)
            ).astype(np.float32)
            p[f"decoder.bias_ih_l{k}{suf}"] = rng.uniform(
                -bound, bound, 4 * rnn_units
            ).astype(np.float32)
            p[f"decoder.bias_hh_l{k}{suf}"] = rng.uniform(
                -bound, bound, 4 * rnn_units
            ).astype(np.float32)
    p["linear.weight"] = rng.uniform(
        -0.05, 0.05, (vocab_size + 1, 2 * rnn_units)
    ).astype(np.float32)
    p["linear.bias"] = np.zeros(vocab_size + 1, np.float32)
    return p


def _crnn_head_weights(rng, p, lstm_in, rnn_units, vocab_size):
    """Append the shared CRNN BiLSTM + linear head keys to ``p``."""
    for k in range(2):
        in_sz = lstm_in if k == 0 else 2 * rnn_units
        bound = 1.0 / np.sqrt(rnn_units)
        for suf in ("", "_reverse"):
            p[f"decoder.weight_ih_l{k}{suf}"] = rng.uniform(
                -bound, bound, (4 * rnn_units, in_sz)
            ).astype(np.float32)
            p[f"decoder.weight_hh_l{k}{suf}"] = rng.uniform(
                -bound, bound, (4 * rnn_units, rnn_units)
            ).astype(np.float32)
            p[f"decoder.bias_ih_l{k}{suf}"] = rng.uniform(
                -bound, bound, 4 * rnn_units
            ).astype(np.float32)
            p[f"decoder.bias_hh_l{k}{suf}"] = rng.uniform(
                -bound, bound, 4 * rnn_units
            ).astype(np.float32)
    p["linear.weight"] = rng.uniform(
        -0.05, 0.05, (vocab_size + 1, 2 * rnn_units)
    ).astype(np.float32)
    p["linear.bias"] = np.zeros(vocab_size + 1, np.float32)
    return p


def random_crnn_mobilenet_weights(
    arch: str = "crnn_mobilenet_v3_small",
    vocab_size: int | None = None,
    rnn_units: int = 128,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint for :class:`CRNNMobileNet` — the
    torch-keyed MobileNetV3 features under ``feat_extractor.*`` plus
    the CRNN head."""
    from .mobilenet import (
        LARGE_CONF,
        LARGE_LAST_CONV,
        LAST_CONV,
        SMALL_CONF,
        random_mobilenet_weights,
    )

    if vocab_size is None:
        vocab_size = len(VOCABS["french"])
    conf, last = (
        (SMALL_CONF, LAST_CONV)
        if arch == "crnn_mobilenet_v3_small"
        else (LARGE_CONF, LARGE_LAST_CONV)
    )
    p = random_mobilenet_weights(
        seed=seed, conf=conf, last_conv=last,
        prefix="feat_extractor", include_classifier=False,
    )
    rng = np.random.RandomState(seed + 1)
    return _crnn_head_weights(rng, p, last, rnn_units, vocab_size)
