"""Numpy forward pass for the reference MASTER recognition architecture.

The reference's ``master`` tower (recognition/master/pytorch.py:36-257
model + greedy decode, :280-344 factory; backbone
classification/magc_resnet/pytorch.py:33-173 ``magc_resnet31`` =
classification/resnet/pytorch.py:85-155 ResNet-31 stages with a MAGC
global-context block per stage; decoder
modules/transformer/pytorch.py:145-210) re-implemented
layer-for-layer as pure-numpy INFERENCE so a real torch checkpoint —
converted to ``.npz`` with the same state-dict key names — runs inside
this engine's recognition actors without torch:

- ResNet-31 encoder (origin_stem=False: two 3x3 conv/BN/ReLU stems +
  MaxPool2d(2); stages [1, 2, 5, 3] BasicBlocks at channels
  [256, 256, 512, 512], each stage followed by MAGC + conv/BN/ReLU +
  optional pool (2,2)/(2,1)) -> (B, 512, 4, 32) for a (3, 32, 128)
  input, flattened to a 128-step sequence + sinusoidal positional
  encoding (transformer/pytorch.py:18-43, a buffer — recomputed here,
  not a weight)
- MAGC (magc_resnet/pytorch.py:33-102): 8-header global-context
  attention — per-header 1x1 conv mask, /sqrt(C/h) scale, softmax over
  positions, context vector, bottleneck transform conv1x1 / LayerNorm
  over (C/16, 1, 1) / ReLU / conv1x1, residual add
- transformer Decoder (3 layers, 8 heads, dff 2048, SHARED pre-norm
  modules across layers like the encoder): embedding * sqrt(d_model) +
  positional encoding, masked self-attention (causal tril AND
  pad-position mask), source attention over the encoded sequence, FFN
- greedy decode (master/pytorch.py:231-257): ys starts [SOS, PAD...];
  at step i the FULL decoder runs and ys[i+1] = argmax(linear(out[i]));
  early exit once every row has emitted EOS; final logits =
  linear(out) over all max_length steps
- postprocessing (master/pytorch.py:259-277): per-step prob of the
  argmax class, confidence = MIN over the full sequence, word = join
  through ``list(vocab) + ["<eos>", "<sos>", "<pad>"]`` cut at the
  first ``<eos>``

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_master_weights` builds a fixed-seed checkpoint with the
exact torch key set (optionally width-reduced for tests — key NAMES
are invariant, shapes carry the width). Attention / layer-norm /
linear kernels are shared with :mod:`doctr_ray.vitstr`, conv / BN /
pool kernels with :mod:`doctr_ray.dbnet`.
"""

from __future__ import annotations

import numpy as np

from .dbnet import bn_relu, conv2d, maxpool2d_s
from .linknet import basic_block
from .vitstr import layer_norm, linear, multi_head_attention, softmax
from .vocabs import VOCABS

# ---------------------------------------------------------------- kernels


def positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal table (transformer/pytorch.py:21-31) — a registered
    BUFFER in torch (``positional_encoding.pe``), i.e. a pure function
    recomputed here rather than read from the checkpoint."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)[None]  # (1, max_len, d_model)


def magc(x: np.ndarray, p: dict, prefix: str, headers: int = 8) -> np.ndarray:
    """Multi-Aspect Global Context block (magc_resnet/pytorch.py:
    73-102), attn_scale=True: per-header softmax position mask ->
    context vector -> bottleneck transform -> residual add."""
    B, C, H, W = x.shape
    ch = C // headers
    xs = x.reshape(B * headers, ch, H, W)
    mask = conv2d(xs, p[f"{prefix}.conv_mask.weight"], p[f"{prefix}.conv_mask.bias"])
    mask = mask.reshape(B * headers, H * W)
    if headers > 1:
        mask = mask / np.sqrt(ch).astype(x.dtype)
    mask = softmax(mask, axis=1)
    context = (xs.reshape(B * headers, ch, H * W) * mask[:, None, :]).sum(-1)
    context = context.reshape(B, C, 1, 1)
    t = conv2d(context, p[f"{prefix}.transform.0.weight"], p[f"{prefix}.transform.0.bias"])
    # LayerNorm([planes, 1, 1]): normalize each sample over its channels
    planes = t.shape[1]
    flat = t.reshape(B, planes)
    mu = flat.mean(axis=1, keepdims=True)
    var = flat.var(axis=1, keepdims=True)
    g = p[f"{prefix}.transform.1.weight"].reshape(planes)
    be = p[f"{prefix}.transform.1.bias"].reshape(planes)
    flat = (flat - mu) / np.sqrt(var + 1e-5) * g.astype(x.dtype) + be.astype(x.dtype)
    t = np.maximum(flat, 0).reshape(B, planes, 1, 1)
    t = conv2d(t, p[f"{prefix}.transform.3.weight"], p[f"{prefix}.transform.3.bias"])
    return x + t


# ------------------------------------------------------------- architecture

#: magc_resnet31 stages (magc_resnet/pytorch.py:158-172): (blocks,
#: out_channels, pool) — Sequential indices 7..10 after the two stems
MAGC_RESNET31_STAGES = [(1, 256, (2, 2)), (2, 256, (2, 1)), (5, 512, None), (3, 512, None)]


class MASTERNumpy:
    """Numpy ``master`` inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict (``feat_extractor.{0..10}.*`` backbone,
    ``decoder.*``, ``linear.*``) so ``{k: v.numpy() for k, v in
    sd.items()}`` of a real checkpoint is a valid blob (the
    ``positional_encoding.pe`` buffers are recomputed, any blob copy
    is ignored). ``d_model`` and channel widths come from the array
    shapes; ``num_heads`` must divide both ``d_model`` and every
    stage's channel count."""

    MEAN = np.array([0.694, 0.695, 0.693], np.float32)
    STD = np.array([0.299, 0.296, 0.301], np.float32)
    INPUT_H, INPUT_W = 32, 128

    def __init__(
        self,
        weights,
        vocab: str | None = None,
        num_heads: int = 8,
        max_length: int = 50,
    ):
        from .weights import load_weights

        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        p = self.p
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        n_classes = p["linear.weight"].shape[0]
        # EOS, SOS, PAD ride after the vocab (master/pytorch.py:85)
        if len(self.vocab) + 3 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 3} (vocab + EOS/SOS/PAD)"
            )
        self.eos = len(self.vocab)
        self.sos = len(self.vocab) + 1
        self.pad = len(self.vocab) + 2
        self.d_model = int(p["decoder.embed.weight"].shape[1])
        self.num_heads = num_heads
        self.num_layers = sum(
            1 for k in p if k.startswith("decoder.attention.") and k.endswith(".output_linear.weight")
        )
        self.max_length = max_length
        self._pe_mem = positional_encoding(self.INPUT_H * self.INPUT_W, self.d_model)
        self._pe_tgt = positional_encoding(max_length, self.d_model)

    # -- encoder ----------------------------------------------------------
    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) float32 -> (B, C, 4, 32): the ResNet-31
        stem + four MAGC stages (Sequential indices 0..10)."""
        p = self.p
        out = conv2d(x, p["feat_extractor.0.weight"], pad=1)
        out = bn_relu(out, p, "feat_extractor.1")
        out = conv2d(out, p["feat_extractor.3.weight"], pad=1)
        out = bn_relu(out, p, "feat_extractor.4")
        out = maxpool2d_s(out, 2, 2, 0)
        for si, (n_blocks, _ch, pool) in enumerate(MAGC_RESNET31_STAGES, start=7):
            pre = f"feat_extractor.{si}"
            for bi in range(n_blocks):
                out = basic_block(out, p, f"{pre}.{bi}", stride=1)
            out = magc(out, p, f"{pre}.{n_blocks}", headers=8)  # fixed 8 headers (magc_resnet/pytorch.py:131)
            out = conv2d(out, p[f"{pre}.{n_blocks + 1}.weight"], pad=1)
            out = bn_relu(out, p, f"{pre}.{n_blocks + 2}")
            if pool is not None:
                kh, kw = pool
                out = out.reshape(
                    out.shape[0], out.shape[1],
                    out.shape[2] // kh, kh, out.shape[3] // kw, kw,
                ).max(axis=(3, 5))
        return out

    def encode(self, x: np.ndarray) -> np.ndarray:
        """Backbone map -> positional-encoded (B, H*W, d_model)
        sequence (master/pytorch.py:182-187)."""
        f = self.features(np.ascontiguousarray(x, np.float32))
        B, C, H, W = f.shape
        seq = f.reshape(B, C, H * W).transpose(0, 2, 1)
        return seq + self._pe_mem[:, : H * W].astype(seq.dtype)

    # -- decoder ----------------------------------------------------------
    def _target_mask(self, ys: np.ndarray) -> np.ndarray:
        """(B, L) token ids -> (B, 1, L, L) combined pad AND causal
        mask (master/pytorch.py:105-124); zeros are masked."""
        B, L = ys.shape
        pad_mask = (ys != self.pad)[:, None, None, :]  # key positions
        sub = np.tril(np.ones((L, L), bool))
        return (pad_mask & sub[None, None]).astype(np.int32)

    def decoder_forward(self, ys: np.ndarray, memory: np.ndarray) -> np.ndarray:
        """The transformer Decoder (transformer/pytorch.py:145-210):
        embed * sqrt(d) + positions, then per layer masked self-attn /
        source-attn / FFN with the SHARED pre-norm modules."""
        p = self.p
        tgt_mask = self._target_mask(ys)
        out = p["decoder.embed.weight"][ys].astype(np.float32) * np.sqrt(self.d_model).astype(
            np.float32
        )
        out = out + self._pe_tgt[:, : out.shape[1]]
        norms = {
            n: (p[f"decoder.{n}.weight"], p[f"decoder.{n}.bias"])
            for n in (
                "layer_norm_input",
                "layer_norm_masked_attention",
                "layer_norm_attention",
                "layer_norm_output",
            )
        }
        for i in range(self.num_layers):
            normed = layer_norm(out, *norms["layer_norm_input"])
            out = out + multi_head_attention(
                normed, p, f"decoder.attention.{i}", self.num_heads, mask=tgt_mask
            )
            normed = layer_norm(out, *norms["layer_norm_masked_attention"])
            out = out + multi_head_attention(
                normed, p, f"decoder.source_attention.{i}", self.num_heads, kv=memory
            )
            normed = layer_norm(out, *norms["layer_norm_attention"])
            ff = f"decoder.position_feed_forward.{i}"
            h = np.maximum(linear(normed, p[f"{ff}.0.weight"], p[f"{ff}.0.bias"]), 0)
            out = out + linear(h, p[f"{ff}.3.weight"], p[f"{ff}.3.bias"])
        return layer_norm(out, *norms["layer_norm_output"])

    def decode_greedy(self, memory: np.ndarray) -> np.ndarray:
        """Greedy decode (master/pytorch.py:231-257): full decoder
        pass per step, ys[i+1] = argmax of step i's logits, early
        exit once every sequence holds an EOS; returns the final
        (B, max_length, vocab+3) logits."""
        B = memory.shape[0]
        ys = np.full((B, self.max_length), self.pad, np.int64)
        ys[:, 0] = self.sos
        p = self.p
        output = self.decoder_forward(ys, memory)
        for i in range(self.max_length - 1):
            if i > 0:
                output = self.decoder_forward(ys, memory)
            step = linear(output[:, i], p["linear.weight"], p["linear.bias"])
            ys[:, i + 1] = step.argmax(-1)
            if (ys == self.eos).any(axis=-1).all():
                break
        return linear(output, p["linear.weight"], p["linear.bias"])

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> greedy logits (B, max_length, vocab+3)."""
        return self.decode_greedy(self.encode(x))

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
            preds.extend(decode_master(self.forward(x), self.vocab))
        return preds

    def __repr__(self) -> str:
        return (
            f"MASTERNumpy(vocab={len(self.vocab)}, d_model={self.d_model}, "
            f"layers={self.num_layers}, heads={self.num_heads})"
        )


def decode_master(logits: np.ndarray, vocab: str) -> list[tuple[str, float]]:
    """Reference MASTERPostProcessor (master/pytorch.py:259-277):
    per-step argmax, word = join through
    ``list(vocab) + ["<eos>", "<sos>", "<pad>"]`` cut at the first
    ``<eos>``; confidence = MIN over the whole sequence of the
    argmax class's softmax prob (clipped)."""
    embedding = list(vocab) + ["<eos>", "<sos>", "<pad>"]
    ids = logits.argmax(axis=-1)  # (B, L)
    sm = softmax(logits, axis=-1)
    picked = np.take_along_axis(sm, ids[..., None], axis=-1)[..., 0]
    confs = picked.min(axis=1)
    out: list[tuple[str, float]] = []
    for row, conf in zip(ids, confs):
        word = "".join(embedding[i] for i in row).split("<eos>")[0]
        out.append((word, float(np.clip(conf, 0, 1))))
    return out


# ---------------------------------------------------------------- fixtures


def random_master_weights(
    vocab_size: int | None = None,
    d_model: int = 512,
    dff: int = 2048,
    num_layers: int = 3,
    stem_channels: int = 128,
    stage_channels: tuple[int, int, int, int] = (256, 256, 512, 512),
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint with the exact torch state-dict key
    set of the reference MASTER. Width parameters shrink shapes for
    fast tests — the key NAMES (the contract a converted real
    checkpoint must satisfy) are width-invariant. The real ``master``
    arch is the default widths."""
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

    # stems (origin_stem=False, resnet/pytorch.py:119-125)
    conv("feat_extractor.0", stem_channels // 2, 3, 3, bias=False)
    bn("feat_extractor.1", stem_channels // 2)
    conv("feat_extractor.3", stem_channels, stem_channels // 2, 3, bias=False)
    bn("feat_extractor.4", stem_channels)
    in_ch = stem_channels
    for si, ((n_blocks, _ch, _pool), out_ch) in enumerate(
        zip(MAGC_RESNET31_STAGES, stage_channels), start=7
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
        # MAGC at index n_blocks (headers=8, ratio 1/16)
        m = f"{pre}.{n_blocks}"
        planes = max(out_ch // 16, 1)
        conv(f"{m}.conv_mask", 1, out_ch // 8, 1)
        conv(f"{m}.transform.0", planes, out_ch, 1)
        p[f"{m}.transform.1.weight"] = np.ones((planes, 1, 1), np.float32)
        p[f"{m}.transform.1.bias"] = np.zeros((planes, 1, 1), np.float32)
        conv(f"{m}.transform.3", out_ch, planes, 1)
        conv(f"{pre}.{n_blocks + 1}", out_ch, out_ch, 3, bias=False)
        bn(f"{pre}.{n_blocks + 2}", out_ch)
    # decoder (vocab + EOS/SOS/PAD)
    n_classes = vocab_size + 3
    p["decoder.embed.weight"] = (rng.standard_normal((n_classes, d_model)) * 0.02).astype(
        np.float32
    )
    for ln in (
        "layer_norm_input",
        "layer_norm_masked_attention",
        "layer_norm_attention",
        "layer_norm_output",
    ):
        p[f"decoder.{ln}.weight"] = np.ones(d_model, np.float32)
        p[f"decoder.{ln}.bias"] = np.zeros(d_model, np.float32)
    for i in range(num_layers):
        for group in ("attention", "source_attention"):
            for j in range(3):
                lin(f"decoder.{group}.{i}.linear_layers.{j}", d_model, d_model)
            lin(f"decoder.{group}.{i}.output_linear", d_model, d_model)
        lin(f"decoder.position_feed_forward.{i}.0", dff, d_model)
        lin(f"decoder.position_feed_forward.{i}.3", d_model, dff)
    lin("linear", n_classes, d_model)
    return p
