"""Numpy CRNN tower: each kernel differentially tested against a naive
obviously-correct loop implementation (torch is absent from the
container, so the per-op math — torch's documented equations — is the
oracle), plus CTC-decode semantics, the end-to-end shape contract, a
fixed-seed determinism pin, load-once weights accounting, and the
zoo's instance-not-name slot."""

import hashlib

import numpy as np
import pytest

from doctr_ray.crnn import (
    CRNN,
    batchnorm2d,
    bilstm,
    conv2d_3x3,
    ctc_best_path,
    lstm_layer,
    maxpool2d,
    random_crnn_weights,
    softmax,
    vgg16_bn_layout,
)
from doctr_ray.vocabs import VOCABS

RNG = np.random.RandomState(7)


# ---------------------------------------------------------------- kernels


def _conv_naive(x, w, b):
    B, C, H, W = x.shape
    O = w.shape[0]
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1))).astype(np.float64)
    out = np.zeros((B, O, H, W))
    for n in range(B):
        for o in range(O):
            for i in range(H):
                for j in range(W):
                    out[n, o, i, j] = (
                        xp[n, :, i : i + 3, j : j + 3] * w[o]
                    ).sum() + b[o]
    return out


def test_conv2d_matches_naive():
    x = RNG.standard_normal((2, 3, 5, 6)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = RNG.standard_normal(4).astype(np.float32)
    got = conv2d_3x3(x, w, b)
    np.testing.assert_allclose(got, _conv_naive(x, w, b), rtol=1e-4, atol=1e-4)


def test_maxpool_matches_naive():
    x = RNG.standard_normal((2, 3, 6, 7)).astype(np.float32)
    for kh, kw in ((2, 2), (2, 1)):
        got = maxpool2d(x, kh, kw)
        H, W = 6 // kh, 7 // kw
        want = np.zeros((2, 3, H, W), np.float32)
        for i in range(H):
            for j in range(W):
                want[:, :, i, j] = x[
                    :, :, i * kh : (i + 1) * kh, j * kw : (j + 1) * kw
                ].max(axis=(2, 3))
        np.testing.assert_array_equal(got, want)


def test_batchnorm_formula():
    x = RNG.standard_normal((2, 4, 3, 3)).astype(np.float32)
    g, be = RNG.rand(4).astype(np.float32), RNG.rand(4).astype(np.float32)
    m, v = RNG.rand(4).astype(np.float32), (1 + RNG.rand(4)).astype(np.float32)
    got = batchnorm2d(x, g, be, m, v)
    want = (x - m[None, :, None, None]) / np.sqrt(
        v[None, :, None, None] + 1e-5
    ) * g[None, :, None, None] + be[None, :, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _lstm_naive(x, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """Scalar-ish re-derivation of torch's LSTM equations (different
    code path: per-sample, per-step, fresh gate slices)."""

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    B, T, _ = x.shape
    H = w_hh.shape[1]
    out = np.zeros((B, T, H))
    for n in range(B):
        h = np.zeros(H)
        c = np.zeros(H)
        ts = reversed(range(T)) if reverse else range(T)
        for t in ts:
            gates = w_ih @ x[n, t] + b_ih + w_hh @ h + b_hh
            i, f, g, o = (gates[k * H : (k + 1) * H] for k in range(4))
            c = sig(f) * c + sig(i) * np.tanh(g)
            h = sig(o) * np.tanh(c)
            out[n, t] = h
    return out


def test_lstm_matches_naive_both_directions():
    B, T, I, H = 2, 5, 6, 4
    x = RNG.standard_normal((B, T, I)).astype(np.float32)
    w_ih = RNG.standard_normal((4 * H, I)).astype(np.float32) * 0.3
    w_hh = RNG.standard_normal((4 * H, H)).astype(np.float32) * 0.3
    b_ih = RNG.standard_normal(4 * H).astype(np.float32) * 0.1
    b_hh = RNG.standard_normal(4 * H).astype(np.float32) * 0.1
    for rev in (False, True):
        got = lstm_layer(x, w_ih, w_hh, b_ih, b_hh, reverse=rev)
        want = _lstm_naive(x, w_ih, w_hh, b_ih, b_hh, reverse=rev)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilstm_output_is_fwd_bwd_concat():
    H = 3
    params = {}
    rng = np.random.RandomState(1)
    for k in range(2):
        in_sz = 4 if k == 0 else 2 * H
        for suf in ("", "_reverse"):
            params[f"decoder.weight_ih_l{k}{suf}"] = rng.standard_normal(
                (4 * H, in_sz)
            ).astype(np.float32) * 0.3
            params[f"decoder.weight_hh_l{k}{suf}"] = rng.standard_normal(
                (4 * H, H)
            ).astype(np.float32) * 0.3
            params[f"decoder.bias_ih_l{k}{suf}"] = np.zeros(4 * H, np.float32)
            params[f"decoder.bias_hh_l{k}{suf}"] = np.zeros(4 * H, np.float32)
    x = rng.standard_normal((1, 6, 4)).astype(np.float32)
    out = bilstm(x, params, num_layers=2)
    assert out.shape == (1, 6, 2 * H)
    # layer-0 forward half must equal the standalone forward pass
    l0 = lstm_layer(
        x,
        params["decoder.weight_ih_l0"],
        params["decoder.weight_hh_l0"],
        params["decoder.bias_ih_l0"],
        params["decoder.bias_hh_l0"],
    )
    l0b = lstm_layer(
        x,
        params["decoder.weight_ih_l0_reverse"],
        params["decoder.weight_hh_l0_reverse"],
        params["decoder.bias_ih_l0_reverse"],
        params["decoder.bias_hh_l0_reverse"],
        reverse=True,
    )
    x1 = np.concatenate([l0, l0b], axis=-1)
    np.testing.assert_allclose(
        out,
        np.concatenate(
            [
                lstm_layer(
                    x1,
                    params["decoder.weight_ih_l1"],
                    params["decoder.weight_hh_l1"],
                    params["decoder.bias_ih_l1"],
                    params["decoder.bias_hh_l1"],
                ),
                lstm_layer(
                    x1,
                    params["decoder.weight_ih_l1_reverse"],
                    params["decoder.weight_hh_l1_reverse"],
                    params["decoder.bias_ih_l1_reverse"],
                    params["decoder.bias_hh_l1_reverse"],
                    reverse=True,
                ),
            ],
            axis=-1,
        ),
        rtol=1e-5,
        atol=1e-6,
    )


# --------------------------------------------------------------- CTC decode


def test_ctc_best_path_semantics():
    vocab = "ab"
    blank = 2
    # path: a a blank a b b -> "aab"
    T, V = 6, 3
    logits = np.full((1, T, V), -10.0, np.float32)
    for t, k in enumerate([0, 0, blank, 0, 1, 1]):
        logits[0, t, k] = 5.0
    words = ctc_best_path(logits, vocab)
    assert words[0][0] == "aab"
    # confidence = min over t of max softmax prob (uniform logits at one
    # step pull it to ~1/3)
    logits[0, 3] = 0.0
    w2 = ctc_best_path(logits, vocab)
    assert abs(w2[0][1] - 1.0 / 3.0) < 1e-6
    # all-blank path -> empty string
    blank_logits = np.zeros((1, 4, V), np.float32)
    blank_logits[:, :, blank] = 5.0
    assert ctc_best_path(blank_logits, vocab)[0][0] == ""


def test_softmax_rows_sum_to_one():
    x = RNG.standard_normal((3, 4, 5)).astype(np.float32)
    s = softmax(x)
    np.testing.assert_allclose(s.sum(-1), np.ones((3, 4)), rtol=1e-5)


# --------------------------------------------------------- end-to-end tower


@pytest.fixture(scope="module")
def small_crnn():
    # tiny vocab keeps the linear head small; backbone is full-size
    return CRNN(random_crnn_weights(vocab_size=10, seed=3), vocab="0123456789")


def test_feature_shape(small_crnn):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    f = small_crnn.features(x)
    assert f.shape == (2, 512, 1, 32)  # reference lstm_in resolution
    # H=32 -> pools (2,2)x2 then (2,1)x3 -> 32/2/2/2/2/2 = 1
    # W=128 -> /2 /2 then kept -> 32 timesteps


def test_forward_logits_shape_and_decode(small_crnn):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    logits = small_crnn.forward(x)
    assert logits.shape == (2, 32, 11)
    assert np.isfinite(logits).all()
    preds = ctc_best_path(logits, small_crnn.vocab)
    assert len(preds) == 2
    for text, conf in preds:
        assert isinstance(text, str) and 0.0 <= conf <= 1.0


def test_fixed_seed_argmax_path_pinned(small_crnn):
    """Determinism contract: the argmax path of the fixed-seed tower on
    a fixed input must never drift (any kernel change that alters the
    forward math shows up here)."""
    x = np.linspace(-1, 1, 2 * 3 * 32 * 128, dtype=np.float32).reshape(
        2, 3, 32, 128
    )
    path = small_crnn.forward(x).argmax(axis=-1).astype(np.int64)
    digest = hashlib.sha256(path.tobytes()).hexdigest()[:16]
    assert digest == PINNED_ARGMAX_DIGEST, (
        f"forward argmax path changed: {digest}"
    )


# pinned from the first verified run of this exact tower (see test above)
PINNED_ARGMAX_DIGEST = "928aa28eee63323d"


def test_recognize_batch_contract(small_crnn):
    crops = [
        (RNG.rand(20, 64) * 255).astype(np.uint8),
        (RNG.rand(34, 200, 3) * 255).astype(np.uint8),  # RGB + resize path
    ]
    preds = small_crnn.recognize_batch(crops)
    assert len(preds) == 2
    assert all(isinstance(t, str) and 0 <= c <= 1 for t, c in preds)


def test_weights_load_once_per_instance(tmp_path):
    import doctr_ray.weights as W

    p = str(tmp_path / "crnn.npz")
    W.save_weights(p, random_crnn_weights(vocab_size=10, seed=3))
    before = W.LOAD_COUNT
    model = CRNN(p, vocab="0123456789")
    assert W.LOAD_COUNT == before + 1
    model.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    model.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    assert W.LOAD_COUNT == before + 1  # no reload per batch


def test_vocab_size_mismatch_raises():
    with pytest.raises(ValueError, match="classes"):
        CRNN(random_crnn_weights(vocab_size=10, seed=3), vocab="abc")


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_crnn_weights(vocab_size=5)
    # spot-check the exact torch names a converted checkpoint would have
    for key in (
        "feat_extractor.0.weight",
        "feat_extractor.1.running_var",
        "feat_extractor.40.weight",
        "feat_extractor.41.running_mean",
        "decoder.weight_ih_l0",
        "decoder.weight_hh_l1_reverse",
        "decoder.bias_hh_l0_reverse",
        "linear.weight",
    ):
        assert key in p, key
    # layout covers 13 convs + 13 bns + 5 pools = torchvision indices
    kinds = [k for k, *_ in vgg16_bn_layout()]
    assert kinds.count("conv") == 13 and kinds.count("pool") == 5


# ----------------------------------------------------------- zoo slot


def test_zoo_accepts_crnn_instance():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    model = CRNN(random_crnn_weights(vocab_size=10, seed=3), vocab="0123456789")
    pred = ocr_predictor(reco_arch=model)
    assert pred.cfg.reco_instance is model
    page = rasterize_synth(encode_media_ref("hello world again", 640, 480))[0].image
    exports = pred.forward_pages([page])
    assert len(exports) == 1
    words = [
        w
        for b in exports[0]["blocks"]
        for l in b["lines"]
        for w in l["words"]
    ]
    # random weights produce garbage text but the geometry pipeline and
    # the slot contract must hold: one prediction per detected word box
    assert len(words) >= 2
    for w in words:
        assert isinstance(w["value"], str)
        assert 0.0 <= w["confidence"] <= 1.0


def test_zoo_rejects_unknown_string_arch_still():
    from doctr_ray.zoo import ocr_predictor

    with pytest.raises(ValueError, match="unknown recognition"):
        ocr_predictor(reco_arch="not_a_real_arch")
