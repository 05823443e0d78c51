"""Numpy forward pass for the reference ViTSTR recognition architecture.

The reference's ``vitstr_small`` / ``vitstr_base`` towers
(recognition/vitstr/pytorch.py:41-130 model + :231-286 configs;
backbone classification/vit/pytorch.py:61-100 VisionTransformer;
modules/vision_transformer/pytorch.py:14-83 PatchEmbedding;
modules/transformer/pytorch.py:46-143 MultiHeadAttention +
EncoderBlock) re-implemented layer-for-layer as pure-numpy INFERENCE
so a real torch checkpoint — converted to ``.npz`` with the same
state-dict key names — runs inside this engine's recognition actors
without torch in the container:

- PatchEmbedding: conv projection with kernel == stride ==
  ``patch_size`` (4, 8) over (B, 3, 32, 128) -> (8, 16) grid ->
  128 patches, cls token prepended, learned positions added
  (``interpolate`` is False for rectangular patches —
  vision_transformer/pytorch.py:21)
- EncoderBlock (pre-norm, vit flavor with GELU): N layers sharing ONE
  ``layer_norm_input`` and ONE ``layer_norm_attention`` module across
  all layers (transformer/pytorch.py:120-138 — the norms are built
  once, the attention/FFN lists per layer), final ``layer_norm_output``
- ViTSTR head (vitstr/pytorch.py:104-108): keep the first
  ``max_length`` (= 32 + 2) tokens, linear to ``len(vocab) + 1``
  logits, drop the cls token -> (B, max_length - 1, vocab + 1)
- decoding (vitstr/pytorch.py:171-189): per-step argmax through
  ``list(vocab) + ["<eos>", "<sos>"]``, word cut at the first
  ``<eos>``; confidence = mean of the max softmax prob over the
  word's steps (0.0 for an empty word)

``nn.GELU()`` is the exact erf form; numpy has no erf, so
:func:`erf` uses Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7,
below float32 resolution — differentially tested against
``math.erf``).

Weights load once per actor through :mod:`doctr_ray.weights`
(path / object-store ref / dict), the same contract as CRNN/DBNet.
:func:`random_vitstr_weights` builds a fixed-seed checkpoint for
shape/parity tests and fixtures.
"""

from __future__ import annotations

import numpy as np

from .vocabs import VOCABS

# ---------------------------------------------------------------- kernels


def erf(x: np.ndarray) -> np.ndarray:
    """Vectorized error function, Abramowitz & Stegun 7.1.26
    (max abs error 1.5e-7 — exact at float32 resolution)."""
    x = np.asarray(x, np.float64)
    sign = np.sign(x)
    a = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-a * a))


def gelu(x: np.ndarray) -> np.ndarray:
    """Exact-form GELU (torch ``nn.GELU()`` default, approximate='none')."""
    return (0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))).astype(x.dtype)


def layer_norm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray, eps: float = 1e-5):
    """``nn.LayerNorm`` over the last axis (biased variance)."""
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return ((x - mu) / np.sqrt(var + eps)) * gamma.astype(x.dtype) + beta.astype(x.dtype)


def linear(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``nn.Linear``: x @ w.T + b."""
    return x @ w.T.astype(x.dtype) + b.astype(x.dtype)


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def multi_head_attention(
    x: np.ndarray,
    p: dict,
    prefix: str,
    num_heads: int,
    kv: np.ndarray | None = None,
    mask: np.ndarray | None = None,
):
    """Attention with the reference MultiHeadAttention layout
    (transformer/pytorch.py:73-101): three (D, D) input projections
    ``linear_layers.{0,1,2}``, scaled dot-product per head, concat,
    ``output_linear``. ``kv`` (defaults to ``x``) is the key/value
    source for cross-attention; ``mask`` broadcasts against the
    (B, h, Tq, Tk) score matrix and zeros are masked to -inf
    (transformer/pytorch.py:46-56)."""
    B, T, D = x.shape
    src = x if kv is None else kv
    S = src.shape[1]
    dk = D // num_heads
    q = linear(x, p[f"{prefix}.linear_layers.0.weight"], p[f"{prefix}.linear_layers.0.bias"])
    k = linear(src, p[f"{prefix}.linear_layers.1.weight"], p[f"{prefix}.linear_layers.1.bias"])
    v = linear(src, p[f"{prefix}.linear_layers.2.weight"], p[f"{prefix}.linear_layers.2.bias"])
    # (B, T, D) -> (B, h, T, dk)
    q = q.reshape(B, T, num_heads, dk).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, num_heads, dk).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, num_heads, dk).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dk).astype(x.dtype)
    if mask is not None:
        scores = np.where(mask == 0, np.float32(-np.inf), scores)
    out = softmax(scores, axis=-1) @ v  # (B, h, T, dk)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return linear(out, p[f"{prefix}.output_linear.weight"], p[f"{prefix}.output_linear.bias"])


def patch_embed(x: np.ndarray, p: dict, prefix: str, patch_size: tuple[int, int]):
    """PatchEmbedding (vision_transformer/pytorch.py:66-83): conv with
    kernel == stride == patch_size == a blocked reshape + one matmul,
    then cls token + learned positions (no interpolation: the ViTSTR
    patches are rectangular, positions are used verbatim)."""
    B, C, H, W = x.shape
    ph, pw = patch_size
    if H % ph or W % pw:
        raise ValueError(f"input {H}x{W} not divisible by patch {ph}x{pw}")
    w = p[f"{prefix}.projection.weight"]  # (D, C, ph, pw)
    b = p[f"{prefix}.projection.bias"]
    D = w.shape[0]
    gh, gw = H // ph, W // pw
    # (B, C, gh, ph, gw, pw) -> (B, gh*gw, C*ph*pw), flatten order (C, ph, pw)
    blocks = x.reshape(B, C, gh, ph, gw, pw).transpose(0, 2, 4, 1, 3, 5)
    cols = blocks.reshape(B, gh * gw, C * ph * pw)
    patches = cols @ w.reshape(D, -1).T.astype(x.dtype) + b.astype(x.dtype)
    cls = np.broadcast_to(p[f"{prefix}.cls_token"].astype(x.dtype), (B, 1, D))
    emb = np.concatenate([cls, patches], axis=1)  # (B, gh*gw + 1, D)
    return emb + p[f"{prefix}.positions"].astype(x.dtype)


def decode_vitstr(logits: np.ndarray, vocab: str) -> list[tuple[str, float]]:
    """Reference ViTSTRPostProcessor (vitstr/pytorch.py:171-189):
    argmax ids through ``list(vocab) + ["<eos>", "<sos>"]``, word =
    everything before the first ``<eos>``; confidence = mean of the
    max softmax prob over the word's steps (clipped), 0.0 if empty."""
    embedding = list(vocab) + ["<eos>", "<sos>"]
    ids = logits.argmax(axis=-1)  # (B, T)
    probs = softmax(logits, axis=-1).max(axis=-1)  # (B, T)
    out: list[tuple[str, float]] = []
    for row, prow in zip(ids, probs):
        word = "".join(embedding[i] for i in row).split("<eos>")[0]
        conf = float(np.clip(prow[: len(word)], 0, 1).mean()) if word else 0.0
        out.append((word, conf))
    return out


# ------------------------------------------------------------- architecture

#: (d_model, num_layers, num_heads, ffd_ratio) per arch
#: (classification/vit/pytorch.py:159-199 vit_s / vit_b)
VITSTR_CONFIGS = {
    "vitstr_small": (384, 12, 6, 4),
    "vitstr_base": (768, 12, 12, 4),
}


class ViTSTR:
    """Numpy ``vitstr_small`` / ``vitstr_base`` inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once here by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict of the reference model (``feat_extractor.0.*`` patch
    embedding, ``feat_extractor.1.*`` encoder, ``head.*``) so
    ``{k: v.numpy() for k, v in sd.items()}`` of a real checkpoint is
    a valid blob. ``d_model`` and the layer count are inferred from
    the blob; ``num_heads`` must divide ``d_model`` (torch stores no
    shape for it). Preprocessing mirrors the reference PreProcessor
    for this arch (vitstr default_cfgs mean/std, input (3, 32, 128),
    aspect-preserving resize + symmetric zero pad).
    """

    MEAN = np.array([0.694, 0.695, 0.693], np.float32)
    STD = np.array([0.299, 0.296, 0.301], np.float32)
    INPUT_H, INPUT_W = 32, 128
    PATCH = (4, 8)

    def __init__(
        self,
        weights,
        vocab: str | None = None,
        num_heads: int = 6,
        max_length: int = 32,
    ):
        from .weights import load_weights

        self.params = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        p = self.params
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        n_classes = p["head.weight"].shape[0]
        if len(self.vocab) + 1 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 1} (vocab + EOS)"
            )
        self.d_model = int(p["feat_extractor.0.projection.weight"].shape[0])
        if self.d_model % num_heads:
            raise ValueError(f"num_heads {num_heads} does not divide d_model {self.d_model}")
        self.num_heads = num_heads
        self.num_layers = sum(
            1 for k in p if k.endswith(".output_linear.weight")
        )
        # reference adds SOS + EOS slots (vitstr/pytorch.py:70)
        self.max_length = max_length + 2

    # -- stages ---------------------------------------------------------
    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) float32 -> (B, num_patches + 1, d_model)."""
        p = self.params
        out = patch_embed(x, p, "feat_extractor.0", self.PATCH)
        enc = "feat_extractor.1"
        ln_in_w, ln_in_b = p[f"{enc}.layer_norm_input.weight"], p[f"{enc}.layer_norm_input.bias"]
        ln_at_w, ln_at_b = (
            p[f"{enc}.layer_norm_attention.weight"],
            p[f"{enc}.layer_norm_attention.bias"],
        )
        for i in range(self.num_layers):
            normed = layer_norm(out, ln_in_w, ln_in_b)
            out = out + multi_head_attention(normed, p, f"{enc}.attention.{i}", self.num_heads)
            normed = layer_norm(out, ln_at_w, ln_at_b)
            ff = f"{enc}.position_feed_forward.{i}"
            h = gelu(linear(normed, p[f"{ff}.0.weight"], p[f"{ff}.0.bias"]))
            out = out + linear(h, p[f"{ff}.3.weight"], p[f"{ff}.3.bias"])
        return layer_norm(out, p[f"{enc}.layer_norm_output.weight"], p[f"{enc}.layer_norm_output.bias"])

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> logits (B, max_length - 1, len(vocab)+1)
        (vitstr/pytorch.py:104-108: truncate to max_length, linear
        head, drop the cls token)."""
        f = self.features(np.ascontiguousarray(x, np.float32))
        f = f[:, : self.max_length]
        logits = linear(f, self.params["head.weight"], self.params["head.bias"])
        return logits[:, 1:]

    # -- crop API (GlyphRecognizer-compatible) ---------------------------
    def preprocess(self, crops: list[np.ndarray]) -> np.ndarray:
        """Grayscale or RGB uint8 crops -> normalized (B, 3, 32, 128)."""
        from .geometry import resize_aspect_pad

        out = np.empty((len(crops), 3, self.INPUT_H, self.INPUT_W), np.float32)
        for i, crop in enumerate(crops):
            g = crop if crop.ndim == 2 else crop.mean(axis=2).astype(crop.dtype)
            resized, _ = resize_aspect_pad(g, (self.INPUT_H, self.INPUT_W), pad_value=0)
            chan = resized.astype(np.float32) / 255.0
            out[i] = (chan[None, :, :] - self.MEAN[:, None, None]) / self.STD[:, None, None]
        return out

    def recognize_batch(self, crops, masks=None, batch_size: int = 32):
        """list of crops -> list[(text, confidence)] — the slot contract
        shared with GlyphRecognizer / CRNN (``masks`` accepted for
        signature parity)."""
        preds: list[tuple[str, float]] = []
        for i in range(0, len(crops), batch_size):
            x = self.preprocess(list(crops[i : i + batch_size]))
            preds.extend(decode_vitstr(self.forward(x), self.vocab))
        return preds

    def __repr__(self) -> str:
        return (
            f"ViTSTR(vocab={len(self.vocab)}, d_model={self.d_model}, "
            f"layers={self.num_layers}, heads={self.num_heads})"
        )


# ---------------------------------------------------------------- fixtures


def random_vitstr_weights(
    vocab_size: int | None = None,
    d_model: int = 384,
    num_layers: int = 12,
    seed: int = 0,
    input_shape: tuple[int, int, int] = (3, 32, 128),
    patch_size: tuple[int, int] = (4, 8),
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint with the exact torch state-dict key
    set of the reference ViTSTR (the reference's own model tests
    instantiate archs with random weights and assert output
    shape/structure)."""
    if vocab_size is None:
        vocab_size = len(VOCABS["french"])
    rng = np.random.RandomState(seed)
    C, H, W = input_shape
    num_patches = (H // patch_size[0]) * (W // patch_size[1])
    p: dict[str, np.ndarray] = {}

    def lin(name: str, o: int, i: int, scale: float | None = None):
        bound = scale if scale is not None else 1.0 / np.sqrt(i)
        p[f"{name}.weight"] = rng.uniform(-bound, bound, (o, i)).astype(np.float32)
        p[f"{name}.bias"] = rng.uniform(-bound, bound, o).astype(np.float32)

    pe = "feat_extractor.0"
    p[f"{pe}.cls_token"] = rng.standard_normal((1, 1, d_model)).astype(np.float32)
    p[f"{pe}.positions"] = rng.standard_normal((1, num_patches + 1, d_model)).astype(np.float32)
    p[f"{pe}.projection.weight"] = (
        rng.standard_normal((d_model, C, *patch_size)) * 0.02
    ).astype(np.float32)
    p[f"{pe}.projection.bias"] = np.zeros(d_model, np.float32)

    enc = "feat_extractor.1"
    for ln in ("layer_norm_input", "layer_norm_attention", "layer_norm_output"):
        p[f"{enc}.{ln}.weight"] = np.ones(d_model, np.float32)
        p[f"{enc}.{ln}.bias"] = np.zeros(d_model, np.float32)
    for i in range(num_layers):
        for j in range(3):
            lin(f"{enc}.attention.{i}.linear_layers.{j}", d_model, d_model)
        lin(f"{enc}.attention.{i}.output_linear", d_model, d_model)
        lin(f"{enc}.position_feed_forward.{i}.0", 4 * d_model, d_model)
        lin(f"{enc}.position_feed_forward.{i}.3", d_model, 4 * d_model)
    lin("head", vocab_size + 1, d_model, scale=0.05)
    return p
