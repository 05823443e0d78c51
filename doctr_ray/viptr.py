"""Numpy forward pass for the reference VIPTR recognition architecture
— the last named arch of the recognition zoo.

The reference's ``viptr_tiny`` (recognition/viptr/pytorch.py:84-275
model + factory; backbone classification/vip/pytorch.py:126-271
``vip_tiny`` VIPNet; layers classification/vip/layers/pytorch.py)
re-implemented layer-for-layer as pure-numpy INFERENCE so a real torch
checkpoint — converted to ``.npz`` with the same state-dict key
names — runs inside this engine's recognition actors without torch:

- PatchEmbed (layers:49-86): two conv3x3-s2/BN/GELU pairs ->
  (B, H/4, W/4, C) channel-last features
- stage 1 (``_vip_local_mixer``): CrossShapedWindowAttention blocks —
  pre-norm qkv, the two LePE halves over cross-shaped windows
  ((h, split) vertical and (split, w) horizontal strips), per-window
  depthwise-conv learned position encoding added to attn @ v, concat
  + projection residual, GELU MLP; PatchMerging (conv3x3 stride
  (2, 1) + LayerNorm) halves H into the next width
- stage 2 (``_vip_mixed_mixer``): channels chunked in two — CSWin on
  the local half, OSRA (overlapped-spatial-reduction attention:
  depthwise k=sr+3/s=sr reduction + per-channel 1x1, local dw-conv
  residual, 1x1 q/kv convs) on the global half — re-fused through the
  dw/1x1 conv bottleneck ``proj`` residual; PatchMerging again
- stage 3 (``_vip_global_mha_mixer``): plain pre-norm multi-head
  self-attention blocks at full width
- neck (VIPNet tail): LayerNorm, mean over the remaining height
  (the custom AdaptiveAvgPool2d with exact-division windows),
  Linear(C -> out_dim, no bias) + Hardswish -> (B, W/4, out_dim)
- head + CTC (viptr/pytorch.py:36-81): linear to vocab + 1, best-path
  decode with blank = len(vocab) and min-over-time confidence — the
  identical rule to CRNN's, so :func:`doctr_ray.crnn.ctc_best_path`
  IS the decoder

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_viptr_weights` builds a fixed-seed checkpoint with the
exact torch key set (width-reduced for tests; key NAMES invariant).
"""

from __future__ import annotations

import numpy as np

from .crnn import ctc_best_path
from .dbnet import bn_relu
from .mobilenet import depthwise_conv2d, hardswish
from .vitstr import gelu, layer_norm, linear, softmax
from .vocabs import VOCABS

# ---------------------------------------------------------------- kernels


def conv2d_st(x, w, b=None, stride=(1, 1), pad=(0, 0)):
    """Dense NCHW conv with per-axis stride/pad (PatchEmbed's s2 convs
    and PatchMerging's (2, 1) stride)."""
    ph, pw = pad
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(2, 3))
    sh, sw = stride
    if sh > 1 or sw > 1:
        win = win[:, :, ::sh, ::sw]
    Ho, Wo = win.shape[2], win.shape[3]
    cols = win.transpose(0, 2, 3, 1, 4, 5).reshape(B, Ho * Wo, C * kh * kw)
    out = cols @ w.reshape(O, -1).T.astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out.reshape(B, Ho, Wo, O).transpose(0, 3, 1, 2)


def _mlp(x, p, prefix):
    """PositionwiseFeedForward with GELU (Linear / GELU / Linear)."""
    h = gelu(linear(x, p[f"{prefix}.0.weight"], p[f"{prefix}.0.bias"]))
    return linear(h, p[f"{prefix}.3.weight"], p[f"{prefix}.3.bias"])


def lepe_attention(qkv, size, p, prefix, idx, split_size, num_heads):
    """LePEAttention (layers:365-540): cross-shaped window attention
    with a per-window depthwise-conv position encoding on V.
    ``qkv`` is (3, B, N, C_half)."""
    q, k, v = qkv
    h, w = size
    B, N, C = q.shape
    h_sp, w_sp = (h, split_size) if idx == 0 else (split_size, w)
    dh = C // num_heads
    scale = np.float32(dh**-0.5)

    def windows(t):
        # (B, N, C) -> (B', h_sp*w_sp, C): strip partition
        img = t.transpose(0, 2, 1).reshape(B, C, h, w)
        img = img.reshape(B, C, h // h_sp, h_sp, w // w_sp, w_sp)
        return img.transpose(0, 2, 4, 3, 5, 1).reshape(-1, h_sp * w_sp, C)

    def heads(t):
        return t.reshape(-1, h_sp * w_sp, num_heads, dh).transpose(0, 2, 1, 3)

    qw = heads(windows(q)) * scale
    kw = heads(windows(k))
    # V windows in NCHW for the depthwise LePE conv
    vi = v.transpose(0, 2, 1).reshape(B, C, h, w)
    vi = vi.reshape(B, C, h // h_sp, h_sp, w // w_sp, w_sp)
    vi = vi.transpose(0, 2, 4, 1, 3, 5).reshape(-1, C, h_sp, w_sp)
    lepe = depthwise_conv2d(vi, p[f"{prefix}.get_v.weight"], pad=1)
    lepe = lepe + p[f"{prefix}.get_v.bias"].astype(lepe.dtype)[None, :, None, None]
    lepe = lepe.reshape(-1, num_heads, dh, h_sp * w_sp).transpose(0, 1, 3, 2)
    vw = vi.reshape(-1, num_heads, dh, h_sp * w_sp).transpose(0, 1, 3, 2)

    attn = softmax(qw @ kw.transpose(0, 1, 3, 2), axis=-1)
    out = attn @ vw + lepe  # (B', heads, n_win, dh)
    out = out.transpose(0, 2, 1, 3).reshape(-1, h_sp * w_sp, C)
    # windows -> image -> (B, N, C)
    img = out.reshape(B, h // h_sp, w // w_sp, h_sp, w_sp, C)
    return img.transpose(0, 1, 3, 2, 4, 5).reshape(B, N, C)


def cswin_block(x, size, p, prefix, num_heads, split_size):
    """CrossShapedWindowAttention (layers:545-615): pre-norm qkv, the
    two LePE halves (vertical idx 0 / horizontal idx 1), concat +
    projection residual, pre-norm GELU MLP residual."""
    B, N, C = x.shape
    normed = layer_norm(x, p[f"{prefix}.norm1.weight"], p[f"{prefix}.norm1.bias"])
    qkv = linear(normed, p[f"{prefix}.qkv.weight"], p[f"{prefix}.qkv.bias"])
    qkv = qkv.reshape(B, N, 3, C).transpose(2, 0, 1, 3)
    half = C // 2
    x1 = lepe_attention(
        qkv[:, :, :, :half], size, p, f"{prefix}.attns.0", 0, split_size, num_heads // 2
    )
    x2 = lepe_attention(
        qkv[:, :, :, half:], size, p, f"{prefix}.attns.1", 1, split_size, num_heads // 2
    )
    merged = linear(
        np.concatenate([x1, x2], axis=2),
        p[f"{prefix}.proj.weight"], p[f"{prefix}.proj.bias"],
    )
    x = x + merged
    normed = layer_norm(x, p[f"{prefix}.norm2.weight"], p[f"{prefix}.norm2.bias"])
    return x + _mlp(normed, p, f"{prefix}.mlp")


def mhsa_block(x, p, prefix, num_heads):
    """MultiHeadSelfAttention (layers:145-196): pre-norm fused-qkv
    attention + GELU MLP, both residual."""
    B, N, C = x.shape
    dh = C // num_heads
    normed = layer_norm(x, p[f"{prefix}.norm1.weight"], p[f"{prefix}.norm1.bias"])
    qkv = linear(normed, p[f"{prefix}.mixer.qkv.weight"], p[f"{prefix}.mixer.qkv.bias"])
    qkv = qkv.reshape(B, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q = qkv[0] * np.float32(dh**-0.5)
    attn = softmax(q @ qkv[1].transpose(0, 1, 3, 2), axis=-1)
    out = (attn @ qkv[2]).transpose(0, 2, 1, 3).reshape(B, N, C)
    out = linear(out, p[f"{prefix}.mixer.proj.weight"], p[f"{prefix}.mixer.proj.bias"])
    x = x + out
    normed = layer_norm(x, p[f"{prefix}.norm2.weight"], p[f"{prefix}.norm2.bias"])
    return x + _mlp(normed, p, f"{prefix}.mlp")


def osra_block(x, size, p, prefix, num_heads, sr_ratio):
    """OSRABlock (layers:198-330): pre-norm overlapped-spatial-
    reduction attention (depthwise k=sr+3/s=sr + per-channel 1x1
    reduction, dw local-conv residual, 1x1 q/kv) + GELU MLP."""
    B, N, C = x.shape
    h, w = size
    dh = C // num_heads
    tm = f"{prefix}.token_mixer"
    normed = layer_norm(x, p[f"{prefix}.norm1.weight"], p[f"{prefix}.norm1.bias"])
    img = normed.transpose(0, 2, 1).reshape(B, C, h, w)
    q = conv2d_st(img, p[f"{tm}.q.weight"], p[f"{tm}.q.bias"])
    q = q.reshape(B, num_heads, dh, -1).transpose(0, 1, 3, 2)
    if sr_ratio > 1:
        k_sr = sr_ratio + 3
        kv = depthwise_conv2d(img, p[f"{tm}.sr.0.weight"], stride=sr_ratio, pad=k_sr // 2)
        kv = bn_relu(kv, p, f"{tm}.sr.1", relu=False)
        kv = gelu(kv)
        kv = kv * p[f"{tm}.sr.3.weight"][:, 0, 0, 0].astype(kv.dtype)[None, :, None, None]
        kv = bn_relu(kv, p, f"{tm}.sr.4", relu=False)
    else:
        kv = img
    lc = depthwise_conv2d(kv, p[f"{tm}.local_conv.weight"], pad=1)
    lc = lc + p[f"{tm}.local_conv.bias"].astype(lc.dtype)[None, :, None, None]
    kv = lc + kv
    kv = conv2d_st(kv, p[f"{tm}.kv.weight"], p[f"{tm}.kv.bias"])  # (B, 2C, h', w')
    k = kv[:, :C].reshape(B, num_heads, dh, -1)
    v = kv[:, C:].reshape(B, num_heads, dh, -1).transpose(0, 1, 3, 2)
    attn = softmax((q @ k) * np.float32(dh**-0.5), axis=-1)
    out = (attn @ v).transpose(0, 1, 3, 2).reshape(B, C, -1).transpose(0, 2, 1)
    x = x + out
    normed = layer_norm(x, p[f"{prefix}.norm2.weight"], p[f"{prefix}.norm2.bias"])
    return x + _mlp(normed, p, f"{prefix}.mlp")


def patch_merging(x, p, prefix):
    """PatchMerging (layers:332-363): conv3x3 stride (2, 1) + LN on
    channel-last input (B, H, W, C) -> (B, H/2, W, out)."""
    img = x.transpose(0, 3, 1, 2)
    out = conv2d_st(
        img, p[f"{prefix}.reduction.weight"], p[f"{prefix}.reduction.bias"],
        stride=(2, 1), pad=(1, 1),
    )
    out = out.transpose(0, 2, 3, 1)
    return layer_norm(out, p[f"{prefix}.norm.weight"], p[f"{prefix}.norm.bias"])


# ------------------------------------------------------------- architecture

#: vip_tiny (classification/vip/pytorch.py:243-270)
VIPTR_CONFIGS = {
    "viptr_tiny": dict(
        embed_dims=(64, 128, 256), depths=(3, 3, 3), num_heads=(2, 4, 8),
        mlp_ratios=(3, 4, 4), split_sizes=(1, 2, 4), sr_ratios=(4, 2, 2),
        out_dim=192,
    ),
}


class VIPTRNumpy:
    """Numpy ``viptr_tiny`` inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict (``feat_extractor.{0..5}.*`` VIPNet under the
    IntermediateLayerGetter, ``head.*``). Widths come from the array
    shapes; ``depths``/``num_heads``/``split_sizes``/``sr_ratios``
    from the arch config."""

    MEAN = np.array([0.694, 0.695, 0.693], np.float32)
    STD = np.array([0.299, 0.296, 0.301], np.float32)
    INPUT_H, INPUT_W = 32, 128

    def __init__(self, weights, vocab: str | None = None, arch: str = "viptr_tiny"):
        from .weights import load_weights

        if arch not in VIPTR_CONFIGS:
            raise ValueError(f"unknown viptr arch '{arch}'")
        self.arch = arch
        self.cfg = VIPTR_CONFIGS[arch]
        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        n_classes = self.p["head.weight"].shape[0]
        if len(self.vocab) + 1 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 1} (vocab + CTC blank)"
            )

    def features(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) float32 -> (B, W/4, out_dim)."""
        p = self.p
        cfg = self.cfg
        x = np.ascontiguousarray(x, np.float32)
        # PatchEmbed: conv/BN/GELU twice, channel-last
        out = conv2d_st(x, p["feat_extractor.0.proj.0.weight"], stride=(2, 2), pad=(1, 1))
        out = gelu(bn_relu(out, p, "feat_extractor.0.proj.1", relu=False))
        out = conv2d_st(out, p["feat_extractor.0.proj.3.weight"], stride=(2, 2), pad=(1, 1))
        out = gelu(bn_relu(out, p, "feat_extractor.0.proj.4", relu=False))
        out = out.transpose(0, 2, 3, 1)  # (B, h, w, C)
        B = out.shape[0]

        # stage 1: local CSWin blocks + PatchMerging
        h, w = out.shape[1], out.shape[2]
        seq = out.reshape(B, h * w, -1)
        for i in range(cfg["depths"][0]):
            seq = cswin_block(
                seq, (h, w), p, f"feat_extractor.1.local_unit.{i}",
                cfg["num_heads"][0], cfg["split_sizes"][0],
            )
        out = patch_merging(seq.reshape(B, h, w, -1), p, "feat_extractor.1.downsample")

        # stage 2: mixed CSWin + OSRA halves with the conv-proj residual
        h, w = out.shape[1], out.shape[2]
        C = out.shape[3]
        seq = out.reshape(B, h * w, C)
        for i in range(cfg["depths"][1]):
            half = C // 2
            x1 = cswin_block(
                seq[:, :, :half], (h, w), p, f"feat_extractor.2.local_unit.{i}",
                cfg["num_heads"][1], cfg["split_sizes"][1],
            )
            x2 = osra_block(
                seq[:, :, half:], (h, w), p, f"feat_extractor.2.global_unit.{i}",
                cfg["num_heads"][1] // 2, cfg["sr_ratios"][1],
            )
            cat = np.concatenate([x1, x2], axis=2)
            img = cat.transpose(0, 2, 1).reshape(B, C, h, w)
            pr = f"feat_extractor.2.proj"
            t = depthwise_conv2d(img, p[f"{pr}.0.weight"], pad=1)
            t = t + p[f"{pr}.0.bias"].astype(t.dtype)[None, :, None, None]
            t = gelu(t)
            t = bn_relu(t, p, f"{pr}.2", relu=False)
            t = conv2d_st(t, p[f"{pr}.3.weight"], p[f"{pr}.3.bias"])
            t = gelu(t)
            t = bn_relu(t, p, f"{pr}.5", relu=False)
            t = conv2d_st(t, p[f"{pr}.6.weight"], p[f"{pr}.6.bias"])
            t = bn_relu(t, p, f"{pr}.7", relu=False)
            img = t + img
            seq = img.transpose(0, 2, 3, 1).reshape(B, h * w, C)
        out = patch_merging(seq.reshape(B, h, w, C), p, "feat_extractor.2.downsample")

        # stage 3: global MHSA at full width
        h, w = out.shape[1], out.shape[2]
        C = out.shape[3]
        seq = out.reshape(B, h * w, C)
        for i in range(cfg["depths"][2]):
            seq = mhsa_block(
                seq, p, f"feat_extractor.3.local_unit.{i}", cfg["num_heads"][2]
            )
        out = seq.reshape(B, h, w, C)

        # neck: LN -> mean over height (exact-division adaptive pool)
        out = layer_norm(
            out, p["feat_extractor.4.0.weight"], p["feat_extractor.4.0.bias"],
            eps=1e-6,
        )
        out = out.mean(axis=1)  # (B, w, C)
        out = out @ p["feat_extractor.5.0.weight"].T.astype(out.dtype)
        return hardswish(out)  # dropout is inference-identity

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> logits (B, W/4, len(vocab)+1)."""
        f = self.features(x)
        return linear(f, self.p["head.weight"], self.p["head.bias"])

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
        contract; VIPTR's CTC rule equals CRNN's (blank = len(vocab),
        min-over-time confidence), so crnn.ctc_best_path decodes."""
        preds: list[tuple[str, float]] = []
        for i in range(0, len(crops), batch_size):
            x = self.preprocess(list(crops[i : i + batch_size]))
            preds.extend(ctc_best_path(self.forward(x), self.vocab))
        return preds

    def __repr__(self) -> str:
        return f"VIPTRNumpy(arch={self.arch}, vocab={len(self.vocab)})"


# ---------------------------------------------------------------- fixtures


def random_viptr_weights(
    vocab_size: int | None = None,
    embed_dims: tuple[int, int, int] = (64, 128, 256),
    out_dim: int = 192,
    depths: tuple[int, int, int] = (3, 3, 3),
    num_heads: tuple[int, int, int] = (2, 4, 8),
    mlp_ratios: tuple[int, int, int] = (3, 4, 4),
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint with the exact torch state-dict key
    set of the reference VIPTR (width parameters shrink shapes for
    fast tests; key NAMES are width-invariant)."""
    if vocab_size is None:
        vocab_size = len(VOCABS["french"])
    rng = np.random.RandomState(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, o, c, k, bias=True):
        p[f"{name}.weight"] = (rng.standard_normal((o, c, k, k)) * 0.1).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = np.zeros(o, np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        p[f"{name}.running_var"] = (1.0 + 0.1 * rng.rand(c)).astype(np.float32)

    def lin(name, o, i, bias=True):
        p[f"{name}.weight"] = (rng.standard_normal((o, i)) * 0.02).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = np.zeros(o, np.float32)

    def ln(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)

    def cswin(prefix, dim, mlp_ratio):
        lin(f"{prefix}.qkv", 3 * dim, dim)
        ln(f"{prefix}.norm1", dim)
        lin(f"{prefix}.proj", dim, dim)
        for j in range(2):
            conv(f"{prefix}.attns.{j}.get_v", dim // 2, 1, 3)
        lin(f"{prefix}.mlp.0", dim * mlp_ratio, dim)
        lin(f"{prefix}.mlp.3", dim, dim * mlp_ratio)
        ln(f"{prefix}.norm2", dim)

    e1, e2, e3 = embed_dims
    conv("feat_extractor.0.proj.0", e1 // 2, 3, 3, bias=False)
    bn("feat_extractor.0.proj.1", e1 // 2)
    conv("feat_extractor.0.proj.3", e1, e1 // 2, 3, bias=False)
    bn("feat_extractor.0.proj.4", e1)
    # stage 1: local CSWin + merge
    for i in range(depths[0]):
        cswin(f"feat_extractor.1.local_unit.{i}", e1, mlp_ratios[0])
    conv("feat_extractor.1.downsample.reduction", e2, e1, 3)
    ln("feat_extractor.1.downsample.norm", e2)
    # stage 2: mixed halves + conv proj + merge
    half = e2 // 2
    for i in range(depths[1]):
        cswin(f"feat_extractor.2.local_unit.{i}", half, mlp_ratios[1])
        g = f"feat_extractor.2.global_unit.{i}"
        ln(f"{g}.norm1", half)
        conv(f"{g}.token_mixer.q", half, half, 1)
        conv(f"{g}.token_mixer.kv", 2 * half, half, 1)
        conv(f"{g}.token_mixer.sr.0", half, 1, 5, bias=False)  # dw k=sr+3
        bn(f"{g}.token_mixer.sr.1", half)
        conv(f"{g}.token_mixer.sr.3", half, 1, 1, bias=False)  # dw 1x1
        bn(f"{g}.token_mixer.sr.4", half)
        conv(f"{g}.token_mixer.local_conv", half, 1, 3)
        lin(f"{g}.mlp.0", half * mlp_ratios[1], half)
        lin(f"{g}.mlp.3", half, half * mlp_ratios[1])
        ln(f"{g}.norm2", half)
    inner = max(16, e2 // 8)
    conv("feat_extractor.2.proj.0", e2, 1, 3)  # depthwise
    bn("feat_extractor.2.proj.2", e2)
    conv("feat_extractor.2.proj.3", inner, e2, 1)
    bn("feat_extractor.2.proj.5", inner)
    conv("feat_extractor.2.proj.6", e2, inner, 1)
    bn("feat_extractor.2.proj.7", e2)
    conv("feat_extractor.2.downsample.reduction", e3, e2, 3)
    ln("feat_extractor.2.downsample.norm", e3)
    # stage 3: global MHSA
    for i in range(depths[2]):
        g = f"feat_extractor.3.local_unit.{i}"
        ln(f"{g}.norm1", e3)
        lin(f"{g}.mixer.qkv", 3 * e3, e3)
        lin(f"{g}.mixer.proj", e3, e3)
        ln(f"{g}.norm2", e3)
        lin(f"{g}.mlp.0", e3 * mlp_ratios[2], e3)
        lin(f"{g}.mlp.3", e3, e3 * mlp_ratios[2])
    # neck + head
    ln("feat_extractor.4.0", e3)
    lin("feat_extractor.5.0", out_dim, e3, bias=False)
    lin("head", vocab_size + 1, out_dim)
    return p
