"""Numpy forward pass for the reference SAR recognition architecture.

The reference's ``sar_resnet31`` tower (recognition/sar/pytorch.py:
34-316 model + :345-410 factory; backbone classification/resnet/
pytorch.py:265-296 ``resnet31`` — the ResNet-31 stages of MASTER's
backbone WITHOUT the MAGC blocks) re-implemented layer-for-layer as
pure-numpy INFERENCE so a real torch checkpoint — converted to
``.npz`` with the same state-dict key names — runs inside this
engine's recognition actors without torch:

- ResNet-31 encoder (origin_stem=False: two 3x3 conv/BN/ReLU stems +
  MaxPool2d(2); stages [1, 2, 5, 3] BasicBlocks at channels
  [256, 256, 512, 512], each stage followed by conv/BN/ReLU +
  optional pool (2,2)/(2,1)) -> (B, 512, 4, 32) for (3, 32, 128)
- SAREncoder (sar/pytorch.py:34-45): vertical max-pool to (N, W, C),
  2-layer unidirectional LSTM, LAST timestep through a linear ->
  the holistic feature (N, rnn_units)
- SARDecoder (sar/pytorch.py:83-167): per step TWO chained LSTMCell
  applications (an init cell feeding a state cell), the 2-D attention
  glimpse (AttentionModule, sar/pytorch.py:48-80: conv3x3 feature
  projection + conv1x1 state projection, tanh, conv1x1 scores,
  softmax over ALL positions, weighted feature sum), logits =
  output_dense([hidden, glimpse]); step 0 consumes the holistic
  vector, step 1 the embedded zero vector, steps >= 2 the previous
  argmax routed through the reference's ``embed(embed_tgt(idx))``
  double lookup; the stacked logits drop step 0
- postprocessing (sar/pytorch.py:318-343): argmax ids through
  ``list(vocab) + ["<eos>"]`` cut at the first ``<eos>``;
  confidence = MIN over the whole sequence of the argmax prob

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_sar_weights` builds a fixed-seed checkpoint with the
exact torch key set (width-reduced for tests; key NAMES invariant).
Conv / BN / pool kernels are shared with :mod:`doctr_ray.dbnet`,
BasicBlock with :mod:`doctr_ray.linknet`, LSTM gate math with
:mod:`doctr_ray.crnn`, softmax with :mod:`doctr_ray.vitstr`.
"""

from __future__ import annotations

import numpy as np

from .crnn import _sigmoid, lstm_layer
from .dbnet import bn_relu, conv2d, maxpool2d_s
from .linknet import basic_block
from .vitstr import linear, softmax
from .vocabs import VOCABS

#: resnet31 stages (resnet/pytorch.py:283-295): (blocks, pool)
RESNET31_STAGES = [(1, (2, 2)), (2, (2, 1)), (5, None), (3, None)]


# ---------------------------------------------------------------- kernels


def lstm_cell(x, h, c, w_ih, w_hh, b_ih, b_hh):
    """One ``nn.LSTMCell`` step (torch gate order [i, f, g, o], both
    biases added) — the same math as one :func:`doctr_ray.crnn.
    lstm_layer` timestep, exposed for the decoder's stateful loop."""
    g = x @ w_ih.T.astype(x.dtype) + h @ w_hh.T.astype(x.dtype) + (b_ih + b_hh).astype(x.dtype)
    H = h.shape[1]
    i = _sigmoid(g[:, :H])
    f = _sigmoid(g[:, H : 2 * H])
    gg = np.tanh(g[:, 2 * H : 3 * H])
    o = _sigmoid(g[:, 3 * H :])
    c = f * c + i * gg
    h = o * np.tanh(c)
    return h, c


def attention_glimpse(features: np.ndarray, hidden: np.ndarray, p: dict, prefix: str):
    """AttentionModule (sar/pytorch.py:48-80): tanh(conv3x3(features)
    + conv1x1(state)) -> conv1x1 scores -> softmax over every (H, W)
    position -> attention-weighted feature sum (N, C)."""
    B, C, H, W = features.shape
    fp = conv2d(features, p[f"{prefix}.feat_conv.weight"], p[f"{prefix}.feat_conv.bias"], pad=1)
    sw = p[f"{prefix}.state_conv.weight"]  # (A, rnn, 1, 1), no bias
    sp = hidden @ sw[:, :, 0, 0].T.astype(hidden.dtype)  # (N, A)
    attn = np.tanh(fp + sp[:, :, None, None])
    scores = conv2d(attn, p[f"{prefix}.attention_projector.weight"])  # (N, 1, H, W)
    weights = softmax(scores.reshape(B, -1), axis=-1).reshape(B, 1, H, W)
    return (features * weights).sum(axis=(2, 3))


def decode_sar(logits: np.ndarray, vocab: str) -> list[tuple[str, float]]:
    """Reference SARPostProcessor (sar/pytorch.py:318-343): argmax ids
    through ``list(vocab) + ["<eos>"]`` cut at the first ``<eos>``;
    confidence = MIN over the whole sequence of the argmax prob."""
    embedding = list(vocab) + ["<eos>"]
    ids = logits.argmax(axis=-1)
    sm = softmax(logits, axis=-1)
    picked = np.take_along_axis(sm, ids[..., None], axis=-1)[..., 0]
    confs = picked.min(axis=1)
    out: list[tuple[str, float]] = []
    for row, conf in zip(ids, confs):
        word = "".join(embedding[i] for i in row).split("<eos>")[0]
        out.append((word, float(np.clip(conf, 0, 1))))
    return out


# ------------------------------------------------------------- architecture


class SARNumpy:
    """Numpy ``sar_resnet31`` inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict (``feat_extractor.{0..10}.*``, ``encoder.rnn.*`` /
    ``encoder.linear.*``, ``decoder.*``). Channel widths and
    ``rnn_units`` come from the array shapes. The architecture
    requires the backbone channel count == rnn_units == embedding
    units (the reference sizes all three to 512)."""

    MEAN = np.array([0.694, 0.695, 0.693], np.float32)
    STD = np.array([0.299, 0.296, 0.301], np.float32)
    INPUT_H, INPUT_W = 32, 128

    def __init__(self, weights, vocab: str | None = None, max_length: int = 30):
        from .weights import load_weights

        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        p = self.p
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        n_classes = p["decoder.output_dense.weight"].shape[0]
        if len(self.vocab) + 1 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 1} (vocab + EOS)"
            )
        self.rnn_units = int(p["encoder.linear.weight"].shape[0])
        # +1 timestep for the EOS after the longest word (sar/pytorch.py:203)
        self.max_length = max_length + 1

    # -- encoder ----------------------------------------------------------
    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) float32 -> (B, C, 4, 32): the plain
        ResNet-31 (no MAGC) stem + stages."""
        p = self.p
        out = conv2d(x, p["feat_extractor.0.weight"], pad=1)
        out = bn_relu(out, p, "feat_extractor.1")
        out = conv2d(out, p["feat_extractor.3.weight"], pad=1)
        out = bn_relu(out, p, "feat_extractor.4")
        out = maxpool2d_s(out, 2, 2, 0)
        for si, (n_blocks, pool) in enumerate(RESNET31_STAGES, start=7):
            pre = f"feat_extractor.{si}"
            for bi in range(n_blocks):
                out = basic_block(out, p, f"{pre}.{bi}", stride=1)
            out = conv2d(out, p[f"{pre}.{n_blocks}.weight"], pad=1)
            out = bn_relu(out, p, f"{pre}.{n_blocks + 1}")
            if pool is not None:
                kh, kw = pool
                out = out.reshape(
                    out.shape[0], out.shape[1],
                    out.shape[2] // kh, kh, out.shape[3] // kw, kw,
                ).max(axis=(3, 5))
        return out

    def holistic(self, features: np.ndarray) -> np.ndarray:
        """Vertical max-pool + 2-layer LSTM + last-step linear
        (sar/pytorch.py:247-255 and 34-45)."""
        p = self.p
        pooled = features.max(axis=2).transpose(0, 2, 1)  # (N, W, C)
        seq = pooled
        for k in range(2):
            seq = lstm_layer(
                seq,
                p[f"encoder.rnn.weight_ih_l{k}"],
                p[f"encoder.rnn.weight_hh_l{k}"],
                p[f"encoder.rnn.bias_ih_l{k}"],
                p[f"encoder.rnn.bias_hh_l{k}"],
            )
        return linear(seq[:, -1], p["encoder.linear.weight"], p["encoder.linear.bias"])

    # -- decoder ----------------------------------------------------------
    def decode_steps(self, features: np.ndarray, holistic: np.ndarray) -> np.ndarray:
        """SARDecoder greedy loop (sar/pytorch.py:115-167): two chained
        LSTMCells per step, attention glimpse, output head; steps >= 2
        feed back ``embed(embed_tgt(argmax))``; returns logits without
        the step-0 entry: (N, max_length, vocab + 1)."""
        p = self.p
        B, C = holistic.shape
        cell = (
            p["decoder.lstm_cell.weight_ih"],
            p["decoder.lstm_cell.weight_hh"],
            p["decoder.lstm_cell.bias_ih"],
            p["decoder.lstm_cell.bias_hh"],
        )
        h_init = c_init = h = c = np.zeros((B, features.shape[1]), np.float32)
        logits_list: list[np.ndarray] = []
        n_classes = p["decoder.output_dense.weight"].shape[0]
        for t in range(self.max_length + 1):
            if t == 0:
                prev = holistic
            elif t == 1:
                prev = linear(
                    np.zeros((B, n_classes), np.float32),
                    p["decoder.embed.weight"], p["decoder.embed.bias"],
                )
            else:
                idx = logits_list[t - 1].argmax(-1)
                onehotish = p["decoder.embed_tgt.weight"][idx].astype(np.float32)
                prev = linear(onehotish, p["decoder.embed.weight"], p["decoder.embed.bias"])
            h_init, c_init = lstm_cell(prev, h_init, c_init, *cell)
            h, c = lstm_cell(h_init, h, c, *cell)
            glimpse = attention_glimpse(features, h, p, "decoder.attention_module")
            step = linear(
                np.concatenate([h, glimpse], axis=1),
                p["decoder.output_dense.weight"], p["decoder.output_dense.bias"],
            )
            logits_list.append(step)
        return np.stack(logits_list[1:], axis=1)

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> logits (B, max_length, vocab + 1)."""
        f = self.features(np.ascontiguousarray(x, np.float32))
        return self.decode_steps(f, self.holistic(f))

    # -- crop API (GlyphRecognizer-compatible) ---------------------------
    def preprocess(self, crops: list[np.ndarray]) -> np.ndarray:
        from .geometry import resize_aspect_pad

        out = np.empty((len(crops), 3, self.INPUT_H, self.INPUT_W), np.float32)
        for i, crop in enumerate(crops):
            g = crop if crop.ndim == 2 else crop.mean(axis=2).astype(crop.dtype)
            resized, _ = resize_aspect_pad(g, (self.INPUT_H, self.INPUT_W), pad_value=0)
            chan = resized.astype(np.float32) / 255.0
            out[i] = (chan[None, :, :] - self.MEAN[:, None, None]) / self.STD[:, None, None]
        return out

    def recognize_batch(self, crops, masks=None, batch_size: int = 32):
        """list of crops -> list[(text, confidence)] — the shared slot
        contract (``masks`` accepted for signature parity)."""
        preds: list[tuple[str, float]] = []
        for i in range(0, len(crops), batch_size):
            x = self.preprocess(list(crops[i : i + batch_size]))
            preds.extend(decode_sar(self.forward(x), self.vocab))
        return preds

    def __repr__(self) -> str:
        return f"SARNumpy(vocab={len(self.vocab)}, rnn_units={self.rnn_units})"


# ---------------------------------------------------------------- fixtures


def random_sar_weights(
    vocab_size: int | None = None,
    rnn_units: int = 512,
    attention_units: int = 512,
    stem_channels: int = 128,
    stage_channels: tuple[int, int, int, int] = (256, 256, 512, 512),
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint with the exact torch state-dict key
    set of the reference SAR (embedding_units == rnn_units as in the
    real arch; the last stage's channels must equal rnn_units)."""
    if vocab_size is None:
        vocab_size = len(VOCABS["french"])
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, c, k, bias=True):
        p[f"{name}.weight"] = (
            rng.standard_normal((o, c, k, k)) * np.sqrt(2.0 / (o * k * k))
        ).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = np.zeros(o, np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        p[f"{name}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)

    def lin(name, o, i):
        bound = 1.0 / np.sqrt(i)
        p[f"{name}.weight"] = rng.uniform(-bound, bound, (o, i)).astype(np.float32)
        p[f"{name}.bias"] = rng.uniform(-bound, bound, o).astype(np.float32)

    conv("feat_extractor.0", stem_channels // 2, 3, 3, bias=False)
    bn("feat_extractor.1", stem_channels // 2)
    conv("feat_extractor.3", stem_channels, stem_channels // 2, 3, bias=False)
    bn("feat_extractor.4", stem_channels)
    in_ch = stem_channels
    for si, ((n_blocks, _pool), out_ch) in enumerate(
        zip(RESNET31_STAGES, stage_channels), start=7
    ):
        pre = f"feat_extractor.{si}"
        for bi in range(n_blocks):
            conv(f"{pre}.{bi}.conv1", out_ch, in_ch, 3, bias=False)
            bn(f"{pre}.{bi}.bn1", out_ch)
            conv(f"{pre}.{bi}.conv2", out_ch, out_ch, 3, bias=False)
            bn(f"{pre}.{bi}.bn2", out_ch)
            if in_ch != out_ch:
                conv(f"{pre}.{bi}.downsample.0", out_ch, in_ch, 1, bias=False)
                bn(f"{pre}.{bi}.downsample.1", out_ch)
            in_ch = out_ch
        conv(f"{pre}.{n_blocks}", out_ch, out_ch, 3, bias=False)
        bn(f"{pre}.{n_blocks + 1}", out_ch)
    feat_ch = stage_channels[-1]
    # encoder LSTM (2 unidirectional layers) + holistic linear
    for k in range(2):
        in_sz = feat_ch if k == 0 else rnn_units
        bound = 1.0 / np.sqrt(rnn_units)
        p[f"encoder.rnn.weight_ih_l{k}"] = rng.uniform(
            -bound, bound, (4 * rnn_units, in_sz)
        ).astype(np.float32)
        p[f"encoder.rnn.weight_hh_l{k}"] = rng.uniform(
            -bound, bound, (4 * rnn_units, rnn_units)
        ).astype(np.float32)
        p[f"encoder.rnn.bias_ih_l{k}"] = rng.uniform(-bound, bound, 4 * rnn_units).astype(
            np.float32
        )
        p[f"encoder.rnn.bias_hh_l{k}"] = rng.uniform(-bound, bound, 4 * rnn_units).astype(
            np.float32
        )
    lin("encoder.linear", rnn_units, rnn_units)
    # decoder: embed is Linear(vocab+1 -> E), embed_tgt is
    # Embedding(E, vocab+1) — the reference's double-lookup pair
    n_classes = vocab_size + 1
    lin("decoder.embed", rnn_units, n_classes)
    p["decoder.embed_tgt.weight"] = (
        rng.standard_normal((rnn_units, n_classes)) * 0.02
    ).astype(np.float32)
    conv("decoder.attention_module.feat_conv", attention_units, feat_ch, 3)
    conv("decoder.attention_module.state_conv", attention_units, rnn_units, 1, bias=False)
    conv("decoder.attention_module.attention_projector", 1, attention_units, 1, bias=False)
    bound = 1.0 / np.sqrt(rnn_units)
    for nm in ("weight_ih", "weight_hh"):
        p[f"decoder.lstm_cell.{nm}"] = rng.uniform(
            -bound, bound, (4 * rnn_units, rnn_units)
        ).astype(np.float32)
    for nm in ("bias_ih", "bias_hh"):
        p[f"decoder.lstm_cell.{nm}"] = rng.uniform(-bound, bound, 4 * rnn_units).astype(
            np.float32
        )
    lin("decoder.output_dense", n_classes, 2 * rnn_units)
    return p
