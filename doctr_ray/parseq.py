"""Numpy forward pass for the reference PARSeq recognition architecture.

The reference's ``parseq`` tower (recognition/parseq/pytorch.py:38-500:
CharEmbedding + single-layer PARSeqDecoder + AR decode with one refine
iteration; backbone = the same ViT-S / (4, 8)-patch encoder as ViTSTR)
re-implemented layer-for-layer as pure-numpy INFERENCE so a real torch
checkpoint — converted to ``.npz`` with the same state-dict key
names — runs inside this engine's recognition actors without torch.

Inference path (the permutation machinery is training-only):

- ViT-S backbone (``feat_extractor.0`` patch embedding +
  ``feat_extractor.1`` encoder — shared kernels with
  :mod:`doctr_ray.vitstr`), cls token dropped -> memory (B, 128, 384)
- ``decode`` (parseq/pytorch.py:252-268): content = [SOS embedding] +
  (pos_queries + char embeddings); queries = learned ``pos_queries``;
  ONE decoder layer = masked attention(query -> content) +
  cross-attention(query -> memory) + GELU FFN, each pre-normed with
  its own LayerNorm (query_norm applied to both attention inputs),
  final ``output_norm``
- ``decode_autoregressive`` (parseq/pytorch.py:270-320): ys starts
  [SOS, PAD...]; step i decodes with the single causal-row mask
  ``tril[i, :i+1]`` and position query i; early exit once every row
  holds EOS; then ONE refine iteration with the lookahead-2 mask
  (``tril`` with the upper triangle above diagonal 2 re-enabled) and
  the cumulative post-EOS padding mask over the step-argmax sequence
- postprocessing (parseq/pytorch.py:407-432): argmax ids through
  ``list(vocab) + ["<eos>", "<sos>", "<pad>"]`` cut at the first
  ``<eos>``; confidence = mean of the max softmax prob over the
  word's steps (0.0 if empty) — the ViTSTR rule

Weights load once per actor through :mod:`doctr_ray.weights`;
:func:`random_parseq_weights` builds a fixed-seed checkpoint with the
exact torch key set.
"""

from __future__ import annotations

import numpy as np

from .vitstr import (
    decode_vitstr,
    gelu,
    layer_norm,
    linear,
    multi_head_attention,
    patch_embed,
)
from .vocabs import VOCABS

#: the PARSeq decode confidence/word rule equals ViTSTR's (both use the
#: mean-over-word max-softmax with the same embedding table head)
decode_parseq = decode_vitstr


class PARSeqNumpy:
    """Numpy ``parseq`` inference tower.

    ``weights`` is a path / Ray ObjectRef / dict consumed once by
    :func:`doctr_ray.weights.load_weights`; keys follow the torch
    state dict (``feat_extractor.0/1.*`` ViT, ``decoder.*`` single
    layer, ``embed.embedding.weight``, ``pos_queries``, ``head.*``).
    ``d_model`` and the encoder depth come from the blob."""

    MEAN = np.array([0.694, 0.695, 0.693], np.float32)
    STD = np.array([0.299, 0.296, 0.301], np.float32)
    INPUT_H, INPUT_W = 32, 128
    PATCH = (4, 8)

    def __init__(
        self,
        weights,
        vocab: str | None = None,
        enc_num_heads: int = 6,
        dec_num_heads: int = 12,
        max_length: int = 32,
    ):
        from .weights import load_weights

        self.p = {k: np.asarray(v) for k, v in load_weights(weights).items()}
        p = self.p
        self.vocab = vocab if vocab is not None else VOCABS["french"]
        n_classes = p["head.weight"].shape[0]
        if len(self.vocab) + 1 != n_classes:
            raise ValueError(
                f"checkpoint has {n_classes} classes but vocab needs "
                f"{len(self.vocab) + 1} (vocab + EOS)"
            )
        self.eos = len(self.vocab)
        self.sos = len(self.vocab) + 1
        self.pad = len(self.vocab) + 2
        self.d_model = int(p["embed.embedding.weight"].shape[1])
        self.enc_num_heads = enc_num_heads
        self.dec_num_heads = dec_num_heads
        self.enc_layers = sum(
            1
            for k in p
            if k.startswith("feat_extractor.1.attention.") and k.endswith(".output_linear.weight")
        )
        self.max_length = max_length

    # -- encoder (the ViTSTR ViT backbone, cls dropped) --------------------
    def memory(self, x: np.ndarray) -> np.ndarray:
        p = self.p
        out = patch_embed(np.ascontiguousarray(x, np.float32), p, "feat_extractor.0", self.PATCH)
        enc = "feat_extractor.1"
        ln_in = (p[f"{enc}.layer_norm_input.weight"], p[f"{enc}.layer_norm_input.bias"])
        ln_at = (p[f"{enc}.layer_norm_attention.weight"], p[f"{enc}.layer_norm_attention.bias"])
        for i in range(self.enc_layers):
            normed = layer_norm(out, *ln_in)
            out = out + multi_head_attention(
                normed, p, f"{enc}.attention.{i}", self.enc_num_heads
            )
            normed = layer_norm(out, *ln_at)
            ff = f"{enc}.position_feed_forward.{i}"
            h = gelu(linear(normed, p[f"{ff}.0.weight"], p[f"{ff}.0.bias"]))
            out = out + linear(h, p[f"{ff}.3.weight"], p[f"{ff}.3.bias"])
        out = layer_norm(
            out, p[f"{enc}.layer_norm_output.weight"], p[f"{enc}.layer_norm_output.bias"]
        )
        return out[:, 1:]  # drop the cls token (parseq/pytorch.py:330-331)

    # -- decoder ------------------------------------------------------------
    def _embed(self, ids: np.ndarray) -> np.ndarray:
        """CharEmbedding (parseq/pytorch.py:38-53): sqrt(d) * table."""
        return self.p["embed.embedding.weight"][ids].astype(np.float32) * np.sqrt(
            self.d_model
        ).astype(np.float32)

    def decode(self, ys: np.ndarray, memory: np.ndarray, target_mask=None, target_query=None):
        """parseq/pytorch.py:252-268 + PARSeqDecoder:87-103."""
        p = self.p
        B, L = ys.shape
        pos = p["pos_queries"].astype(np.float32)
        null_ctx = self._embed(ys[:, :1])
        content = np.concatenate(
            [null_ctx, pos[:, : L - 1] + self._embed(ys[:, 1:])], axis=1
        )
        if target_query is None:
            target_query = np.broadcast_to(pos[:, :L], (B, L, self.d_model))
        target = np.ascontiguousarray(target_query, np.float32)
        qn = (p["decoder.query_norm.weight"], p["decoder.query_norm.bias"])
        cn = (p["decoder.content_norm.weight"], p["decoder.content_norm.bias"])
        target = target + multi_head_attention(
            layer_norm(target, *qn), p, "decoder.attention", self.dec_num_heads,
            kv=layer_norm(content, *cn), mask=target_mask,
        )
        target = target + multi_head_attention(
            layer_norm(target, *qn), p, "decoder.cross_attention", self.dec_num_heads,
            kv=memory,
        )
        ffn_in = layer_norm(
            target, p["decoder.feed_forward_norm.weight"], p["decoder.feed_forward_norm.bias"]
        )
        h = gelu(linear(ffn_in, p["decoder.position_feed_forward.0.weight"],
                        p["decoder.position_feed_forward.0.bias"]))
        target = target + linear(h, p["decoder.position_feed_forward.3.weight"],
                                 p["decoder.position_feed_forward.3.bias"])
        return layer_norm(
            target, p["decoder.output_norm.weight"], p["decoder.output_norm.bias"]
        )

    def decode_autoregressive(self, memory: np.ndarray) -> np.ndarray:
        """parseq/pytorch.py:270-320: per-step AR decode with position
        queries, then one refine iteration with the lookahead-2 mask."""
        p = self.p
        B = memory.shape[0]
        L = self.max_length + 1  # +1 for EOS
        ys = np.full((B, L), self.pad, np.int64)
        ys[:, 0] = self.sos
        pos = p["pos_queries"].astype(np.float32)
        query_mask = np.tril(np.ones((L, L), np.int32))
        logits_steps = []
        steps = 0
        for i in range(L):
            out = self.decode(
                ys[:, : i + 1], memory,
                target_mask=query_mask[i : i + 1, : i + 1],
                target_query=np.broadcast_to(pos[:, i : i + 1], (B, 1, self.d_model)),
            )
            step = linear(out, p["head.weight"], p["head.bias"])  # (B, 1, V+1)
            logits_steps.append(step)
            steps = i + 1
            if i + 1 < L:
                ys[:, i + 1] = step[:, 0].argmax(-1)
                if (ys == self.eos).any(axis=-1).all():
                    break
        logits = np.concatenate(logits_steps, axis=1)  # (B, steps, V+1)
        # one refine iteration (parseq/pytorch.py:305-320)
        refine_mask = query_mask.copy()
        refine_mask[np.triu(np.ones((L, L), bool), 2)] = 1
        sos = np.full((B, 1), self.sos, np.int64)
        ys = np.concatenate([sos, logits[:, :-1].argmax(-1)], axis=1)  # (B, steps)
        pad_mask = ~(np.cumsum(ys == self.eos, axis=-1) > 0)[:, None, None, :]
        mask = (pad_mask & refine_mask[None, None, :steps, : ys.shape[1]].astype(bool)).astype(
            np.int32
        )
        out = self.decode(
            ys, memory, target_mask=mask,
            target_query=np.broadcast_to(pos[:, :steps], (B, steps, self.d_model)),
        )
        return linear(out, p["head.weight"], p["head.bias"])

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(B, 3, 32, 128) -> refined logits (B, <=max_length+1, V+1)."""
        return self.decode_autoregressive(self.memory(x))

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
            preds.extend(decode_parseq(self.forward(x), self.vocab))
        return preds

    def __repr__(self) -> str:
        return (
            f"PARSeqNumpy(vocab={len(self.vocab)}, d_model={self.d_model}, "
            f"enc_layers={self.enc_layers})"
        )


# ---------------------------------------------------------------- fixtures


def random_parseq_weights(
    vocab_size: int | None = None,
    d_model: int = 384,
    enc_layers: int = 12,
    dec_ff_dim: int = 384,
    dec_ffd_ratio: int = 4,
    max_length: int = 32,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Full fixed-seed checkpoint with the exact torch state-dict key
    set of the reference PARSeq (ViT-S backbone keys shared with
    ViTSTR's fixture scheme + the single decoder layer + char
    embedding + position queries + head)."""
    from .vitstr import random_vitstr_weights

    if vocab_size is None:
        vocab_size = len(VOCABS["french"])
    rng = np.random.RandomState(seed)
    # backbone keys (feat_extractor.0/1.*) — reuse the ViTSTR fixture,
    # then swap its flat head for PARSeq's decoder/embed/queries/head
    p = random_vitstr_weights(
        vocab_size=vocab_size, d_model=d_model, num_layers=enc_layers, seed=seed
    )
    del p["head.weight"], p["head.bias"]

    def lin(name, o, i):
        p[f"{name}.weight"] = (rng.standard_normal((o, i)) * 0.02).astype(np.float32)
        p[f"{name}.bias"] = np.zeros(o, np.float32)

    for group in ("attention", "cross_attention"):
        for j in range(3):
            lin(f"decoder.{group}.linear_layers.{j}", d_model, d_model)
        lin(f"decoder.{group}.output_linear", d_model, d_model)
    lin("decoder.position_feed_forward.0", dec_ff_dim * dec_ffd_ratio, d_model)
    lin("decoder.position_feed_forward.3", d_model, dec_ff_dim * dec_ffd_ratio)
    for ln in ("query_norm", "content_norm", "feed_forward_norm", "output_norm"):
        p[f"decoder.{ln}.weight"] = np.ones(d_model, np.float32)
        p[f"decoder.{ln}.bias"] = np.zeros(d_model, np.float32)
    p["embed.embedding.weight"] = (
        rng.standard_normal((vocab_size + 3, d_model)) * 0.02
    ).astype(np.float32)
    p["pos_queries"] = (rng.standard_normal((1, max_length + 1, d_model)) * 0.02).astype(
        np.float32
    )
    lin("head", vocab_size + 1, d_model)
    return p
