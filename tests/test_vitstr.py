"""Numpy ViTSTR tower: each kernel differentially tested against a
naive obviously-correct implementation (torch is absent, so the per-op
math — torch's documented equations — is the oracle), plus the
EOS-split decode semantics, the end-to-end shape contract, a
fixed-seed determinism pin, load-once weights accounting, and the
zoo's instance-not-name slot."""

import hashlib
import math

import numpy as np
import pytest

from doctr_ray.vitstr import (
    VITSTR_CONFIGS,
    ViTSTR,
    decode_vitstr,
    erf,
    gelu,
    layer_norm,
    linear,
    multi_head_attention,
    patch_embed,
    random_vitstr_weights,
    softmax,
)

RNG = np.random.RandomState(11)


# ---------------------------------------------------------------- kernels


def test_erf_matches_math_erf():
    x = np.linspace(-4, 4, 2001)
    want = np.array([math.erf(v) for v in x])
    np.testing.assert_allclose(erf(x), want, atol=1.6e-7)


def test_gelu_exact_form():
    x = RNG.standard_normal(100).astype(np.float32)
    want = np.array([0.5 * v * (1 + math.erf(v / math.sqrt(2))) for v in x])
    np.testing.assert_allclose(gelu(x), want, atol=1e-6)


def test_layer_norm_matches_naive():
    x = RNG.standard_normal((2, 5, 8)).astype(np.float32)
    g = RNG.rand(8).astype(np.float32)
    b = RNG.rand(8).astype(np.float32)
    got = layer_norm(x, g, b)
    for n in range(2):
        for t in range(5):
            row = x[n, t].astype(np.float64)
            want = (row - row.mean()) / np.sqrt(row.var() + 1e-5) * g + b
            np.testing.assert_allclose(got[n, t], want, rtol=1e-4, atol=1e-5)


def _mha_naive(x, p, prefix, num_heads):
    """Per-head, per-sample re-derivation with fresh slices."""
    B, T, D = x.shape
    dk = D // num_heads
    out = np.zeros((B, T, D))
    for n in range(B):
        q = x[n] @ p[f"{prefix}.linear_layers.0.weight"].T + p[f"{prefix}.linear_layers.0.bias"]
        k = x[n] @ p[f"{prefix}.linear_layers.1.weight"].T + p[f"{prefix}.linear_layers.1.bias"]
        v = x[n] @ p[f"{prefix}.linear_layers.2.weight"].T + p[f"{prefix}.linear_layers.2.bias"]
        heads = []
        for h in range(num_heads):
            qs, ks, vs = (a[:, h * dk : (h + 1) * dk] for a in (q, k, v))
            scores = qs @ ks.T / math.sqrt(dk)
            e = np.exp(scores - scores.max(axis=1, keepdims=True))
            attn = e / e.sum(axis=1, keepdims=True)
            heads.append(attn @ vs)
        cat = np.concatenate(heads, axis=1)
        out[n] = cat @ p[f"{prefix}.output_linear.weight"].T + p[f"{prefix}.output_linear.bias"]
    return out


def test_multi_head_attention_matches_naive():
    D, h = 12, 3
    p = {}
    for j in range(3):
        p[f"a.linear_layers.{j}.weight"] = RNG.standard_normal((D, D)).astype(np.float32) * 0.3
        p[f"a.linear_layers.{j}.bias"] = RNG.standard_normal(D).astype(np.float32) * 0.1
    p["a.output_linear.weight"] = RNG.standard_normal((D, D)).astype(np.float32) * 0.3
    p["a.output_linear.bias"] = RNG.standard_normal(D).astype(np.float32) * 0.1
    x = RNG.standard_normal((2, 7, D)).astype(np.float32)
    got = multi_head_attention(x, p, "a", h)
    np.testing.assert_allclose(got, _mha_naive(x, p, "a", h), rtol=1e-4, atol=1e-5)


def test_patch_embed_matches_naive_conv():
    C, H, W, D, ph, pw = 3, 8, 16, 5, 4, 8
    p = {
        "e.projection.weight": RNG.standard_normal((D, C, ph, pw)).astype(np.float32) * 0.2,
        "e.projection.bias": RNG.standard_normal(D).astype(np.float32) * 0.1,
        "e.cls_token": RNG.standard_normal((1, 1, D)).astype(np.float32),
        "e.positions": RNG.standard_normal((1, (H // ph) * (W // pw) + 1, D)).astype(np.float32),
    }
    x = RNG.standard_normal((2, C, H, W)).astype(np.float32)
    got = patch_embed(x, p, "e", (ph, pw))
    # naive: strided conv then row-major (gh, gw) flatten, cls prepend
    gh, gw = H // ph, W // pw
    for n in range(2):
        np.testing.assert_allclose(
            got[n, 0], p["e.cls_token"][0, 0] + p["e.positions"][0, 0], rtol=1e-5
        )
        for gi in range(gh):
            for gj in range(gw):
                block = x[n, :, gi * ph : (gi + 1) * ph, gj * pw : (gj + 1) * pw]
                want = (
                    (block[None] * p["e.projection.weight"]).sum(axis=(1, 2, 3))
                    + p["e.projection.bias"]
                    + p["e.positions"][0, 1 + gi * gw + gj]
                )
                np.testing.assert_allclose(
                    got[n, 1 + gi * gw + gj], want, rtol=1e-4, atol=1e-4
                )


def test_patch_embed_rejects_indivisible_input():
    p = {
        "e.projection.weight": np.zeros((2, 1, 4, 8), np.float32),
        "e.projection.bias": np.zeros(2, np.float32),
        "e.cls_token": np.zeros((1, 1, 2), np.float32),
        "e.positions": np.zeros((1, 3, 2), np.float32),
    }
    with pytest.raises(ValueError, match="divisible"):
        patch_embed(np.zeros((1, 1, 30, 64), np.float32), p, "e", (4, 8))


# --------------------------------------------------------------- decoding


def test_decode_vitstr_eos_split_and_confidence():
    vocab = "ab"
    eos = 2  # len(vocab)
    T, V = 5, 3
    # path: a b <eos> a a -> "ab"; conf = mean of first 2 max-probs
    logits = np.full((1, T, V), -10.0, np.float32)
    for t, k in enumerate([0, 1, eos, 0, 0]):
        logits[0, t, k] = 5.0
    preds = decode_vitstr(logits, vocab)
    assert preds[0][0] == "ab"
    step = softmax(logits[0, :2], axis=-1).max(axis=-1)
    assert abs(preds[0][1] - float(step.mean())) < 1e-6
    # immediate EOS -> empty word, confidence 0.0
    logits2 = np.full((1, T, V), -10.0, np.float32)
    logits2[:, :, eos] = 5.0
    assert decode_vitstr(logits2, vocab)[0] == ("", 0.0)
    # no EOS anywhere -> the whole row decodes
    logits3 = np.full((1, 3, V), -10.0, np.float32)
    logits3[:, :, 1] = 5.0
    assert decode_vitstr(logits3, vocab)[0][0] == "bbb"


# --------------------------------------------------------- end-to-end tower


@pytest.fixture(scope="module")
def small_vitstr():
    # tiny transformer keeps tests fast; patch/input geometry is real
    w = random_vitstr_weights(vocab_size=10, d_model=48, num_layers=2, seed=3)
    return ViTSTR(w, vocab="0123456789", num_heads=4)


def test_features_shape(small_vitstr):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    f = small_vitstr.features(x)
    # (32/4) * (128/8) = 128 patches + cls
    assert f.shape == (2, 129, 48)
    assert np.isfinite(f).all()


def test_forward_logits_shape_and_decode(small_vitstr):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    logits = small_vitstr.forward(x)
    # max_length = 32 + 2, minus the cls token -> 33 steps
    assert logits.shape == (2, 33, 11)
    preds = decode_vitstr(logits, small_vitstr.vocab)
    assert len(preds) == 2
    for text, conf in preds:
        assert isinstance(text, str) and 0.0 <= conf <= 1.0


def test_fixed_seed_argmax_path_pinned(small_vitstr):
    """Determinism contract: the argmax path of the fixed-seed tower on
    a fixed input must never drift (any kernel change that alters the
    forward math shows up here)."""
    x = np.linspace(-1, 1, 2 * 3 * 32 * 128, dtype=np.float32).reshape(2, 3, 32, 128)
    path = small_vitstr.forward(x).argmax(axis=-1).astype(np.int64)
    digest = hashlib.sha256(path.tobytes()).hexdigest()[:16]
    assert digest == PINNED_ARGMAX_DIGEST, f"forward argmax path changed: {digest}"


# pinned from the first verified run of this exact tower (see test above)
PINNED_ARGMAX_DIGEST = "8575311bcc3c4c0d"


def test_full_size_config_shapes():
    """vitstr_small at its real width: one forward, real geometry."""
    d_model, layers, heads, _ = VITSTR_CONFIGS["vitstr_small"]
    w = random_vitstr_weights(vocab_size=10, d_model=d_model, num_layers=2, seed=0)
    model = ViTSTR(w, vocab="0123456789", num_heads=heads)
    assert model.d_model == d_model and model.num_layers == 2
    logits = model.forward(np.zeros((1, 3, 32, 128), np.float32))
    assert logits.shape == (1, 33, 11)


def test_recognize_batch_contract(small_vitstr):
    crops = [
        (RNG.rand(20, 64) * 255).astype(np.uint8),
        (RNG.rand(34, 200, 3) * 255).astype(np.uint8),  # RGB + resize path
    ]
    preds = small_vitstr.recognize_batch(crops)
    assert len(preds) == 2
    assert all(isinstance(t, str) and 0 <= c <= 1 for t, c in preds)


def test_weights_load_once_per_instance(tmp_path):
    import doctr_ray.weights as W

    p = str(tmp_path / "vitstr.npz")
    W.save_weights(p, random_vitstr_weights(vocab_size=10, d_model=48, num_layers=2, seed=3))
    before = W.LOAD_COUNT
    model = ViTSTR(p, vocab="0123456789", num_heads=4)
    assert W.LOAD_COUNT == before + 1
    model.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    model.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    assert W.LOAD_COUNT == before + 1  # no reload per batch


def test_vocab_size_mismatch_raises():
    w = random_vitstr_weights(vocab_size=10, d_model=48, num_layers=2)
    with pytest.raises(ValueError, match="classes"):
        ViTSTR(w, vocab="abc", num_heads=4)


def test_heads_must_divide_d_model():
    w = random_vitstr_weights(vocab_size=10, d_model=48, num_layers=2)
    with pytest.raises(ValueError, match="num_heads"):
        ViTSTR(w, vocab="0123456789", num_heads=5)


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_vitstr_weights(vocab_size=5, d_model=48, num_layers=2)
    for key in (
        "feat_extractor.0.cls_token",
        "feat_extractor.0.positions",
        "feat_extractor.0.projection.weight",
        "feat_extractor.1.layer_norm_input.weight",
        "feat_extractor.1.layer_norm_attention.bias",
        "feat_extractor.1.layer_norm_output.weight",
        "feat_extractor.1.attention.0.linear_layers.2.weight",
        "feat_extractor.1.attention.1.output_linear.bias",
        "feat_extractor.1.position_feed_forward.0.0.weight",
        "feat_extractor.1.position_feed_forward.1.3.bias",
        "head.weight",
        "head.bias",
    ):
        assert key in p, key
    # positions cover the (32/4) x (128/8) grid + cls
    assert p["feat_extractor.0.positions"].shape == (1, 129, 48)


# ----------------------------------------------------------- zoo slot


def test_zoo_accepts_vitstr_instance():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    model = ViTSTR(
        random_vitstr_weights(vocab_size=10, d_model=48, num_layers=2, seed=3),
        vocab="0123456789",
        num_heads=4,
    )
    pred = ocr_predictor(reco_arch=model)
    assert pred.cfg.reco_instance is model
    page = rasterize_synth(encode_media_ref("hello world again", 640, 480))[0].image
    exports = pred.forward_pages([page])
    assert len(exports) == 1
    words = [w for b in exports[0]["blocks"] for l in b["lines"] for w in l["words"]]
    # random weights produce garbage text but the geometry pipeline and
    # the slot contract must hold: one prediction per detected word box
    assert len(words) >= 2
    for w in words:
        assert isinstance(w["value"], str)
        assert 0.0 <= w["confidence"] <= 1.0
