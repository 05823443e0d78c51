"""Numpy SAR tower: the LSTMCell step and attention glimpse
differentially tested against naive per-sample loops (torch absent,
so the documented per-op math is the oracle), plus the holistic
encoder contract, the greedy feedback loop, a fixed-seed determinism
pin, checkpoint key names, load-once accounting, and the zoo slot."""

import hashlib
import math

import numpy as np
import pytest

from doctr_ray.crnn import lstm_layer
from doctr_ray.sar import (
    RESNET31_STAGES,
    SARNumpy,
    attention_glimpse,
    decode_sar,
    lstm_cell,
    random_sar_weights,
)
from doctr_ray.vitstr import softmax

RNG = np.random.RandomState(23)

TINY = dict(vocab_size=10, rnn_units=64, attention_units=16,
            stem_channels=32, stage_channels=(64, 64, 64, 64))


# ---------------------------------------------------------------- kernels


def test_lstm_cell_matches_lstm_layer_step():
    """A single LSTMCell application must equal the first timestep of
    the full-layer kernel (same gate math, zero initial state)."""
    B, I, H = 3, 5, 4
    x = RNG.standard_normal((B, 1, I)).astype(np.float32)
    w_ih = RNG.standard_normal((4 * H, I)).astype(np.float32) * 0.3
    w_hh = RNG.standard_normal((4 * H, H)).astype(np.float32) * 0.3
    b_ih = RNG.standard_normal(4 * H).astype(np.float32) * 0.1
    b_hh = RNG.standard_normal(4 * H).astype(np.float32) * 0.1
    want = lstm_layer(x, w_ih, w_hh, b_ih, b_hh)[:, 0]
    h, c = lstm_cell(
        x[:, 0], np.zeros((B, H), np.float32), np.zeros((B, H), np.float32),
        w_ih, w_hh, b_ih, b_hh,
    )
    np.testing.assert_allclose(h, want, rtol=1e-5, atol=1e-6)


def _glimpse_naive(features, hidden, p, prefix):
    B, C, H, W = features.shape
    A = p[f"{prefix}.feat_conv.weight"].shape[0]
    out = np.zeros((B, C))
    for n in range(B):
        # conv3x3 on features
        fp = np.zeros((A, H, W))
        xpad = np.pad(features[n], ((0, 0), (1, 1), (1, 1)))
        for a in range(A):
            for i in range(H):
                for j in range(W):
                    fp[a, i, j] = (
                        xpad[:, i : i + 3, j : j + 3] * p[f"{prefix}.feat_conv.weight"][a]
                    ).sum() + p[f"{prefix}.feat_conv.bias"][a]
        sp = p[f"{prefix}.state_conv.weight"][:, :, 0, 0] @ hidden[n]
        attn = np.tanh(fp + sp[:, None, None])
        scores = np.einsum("ahw,a->hw", attn, p[f"{prefix}.attention_projector.weight"][0, :, 0, 0])
        flat = scores.flatten()
        e = np.exp(flat - flat.max())
        wgt = (e / e.sum()).reshape(H, W)
        out[n] = (features[n] * wgt[None]).sum(axis=(1, 2))
    return out


def test_attention_glimpse_matches_naive():
    C, A, rnn = 6, 4, 5
    p = {
        "m.feat_conv.weight": RNG.standard_normal((A, C, 3, 3)).astype(np.float32) * 0.3,
        "m.feat_conv.bias": RNG.standard_normal(A).astype(np.float32) * 0.1,
        "m.state_conv.weight": RNG.standard_normal((A, rnn, 1, 1)).astype(np.float32) * 0.3,
        "m.attention_projector.weight": RNG.standard_normal((1, A, 1, 1)).astype(np.float32),
    }
    feats = RNG.standard_normal((2, C, 3, 4)).astype(np.float32)
    hidden = RNG.standard_normal((2, rnn)).astype(np.float32)
    got = attention_glimpse(feats, hidden, p, "m")
    np.testing.assert_allclose(got, _glimpse_naive(feats, hidden, p, "m"), rtol=1e-4, atol=1e-4)


def test_decode_sar_semantics():
    vocab = "ab"
    eos = 2
    logits = np.full((1, 4, 3), -10.0, np.float32)
    for t, k in enumerate([1, 0, eos, 0]):
        logits[0, t, k] = 5.0
    preds = decode_sar(logits, vocab)
    assert preds[0][0] == "ba"
    picked = softmax(logits, -1).max(-1)[0]
    assert abs(preds[0][1] - picked.min()) < 1e-6


# --------------------------------------------------------- end-to-end tower


@pytest.fixture(scope="module")
def tiny_sar():
    return SARNumpy(random_sar_weights(seed=3, **TINY), vocab="0123456789", max_length=7)


def test_encoder_shapes(tiny_sar):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    f = tiny_sar.features(x)
    # stem pool /2 -> 16x64; stage pools (2,2) then (2,1) -> 4x32
    assert f.shape == (2, 64, 4, 32)
    hol = tiny_sar.holistic(f)
    assert hol.shape == (2, 64)


def test_forward_shape_and_decode(tiny_sar):
    x = RNG.standard_normal((1, 3, 32, 128)).astype(np.float32)
    logits = tiny_sar.forward(x)
    # max_length + 1 EOS step, step 0 dropped -> 8 steps, vocab+1
    assert logits.shape == (1, 8, 11)
    preds = decode_sar(logits, tiny_sar.vocab)
    text, conf = preds[0]
    assert isinstance(text, str) and 0.0 <= conf <= 1.0
    out = tiny_sar.recognize_batch([(RNG.rand(20, 64) * 255).astype(np.uint8)])
    assert len(out) == 1


def test_greedy_feeds_own_argmax_back():
    """Steps >= 2 must condition on the previous argmax through the
    embed(embed_tgt(idx)) double lookup: perturbing one embed_tgt row
    only changes the output when that token is emitted."""
    w = random_sar_weights(seed=5, **TINY)
    m1 = SARNumpy(dict(w), vocab="0123456789", max_length=5)
    x = np.linspace(-1, 1, 3 * 32 * 128, dtype=np.float32).reshape(1, 3, 32, 128)
    l1 = m1.forward(x)
    first_tok = int(l1[0, 0].argmax())
    w2 = dict(w)
    et = w2["decoder.embed_tgt.weight"].copy()
    et[first_tok] += 5.0
    w2["decoder.embed_tgt.weight"] = et
    m2 = SARNumpy(w2, vocab="0123456789", max_length=5)
    l2 = m2.forward(x)
    # step 0 logits are computed before any feedback -> identical
    np.testing.assert_allclose(l1[0, 0], l2[0, 0], atol=1e-6)
    # the first fed-back step consumed the perturbed row -> different
    assert np.abs(l1[0, 1:] - l2[0, 1:]).max() > 1e-4


def test_fixed_seed_argmax_path_pinned(tiny_sar):
    x = np.linspace(-1, 1, 3 * 32 * 128, dtype=np.float32).reshape(1, 3, 32, 128)
    path = tiny_sar.forward(x).argmax(axis=-1).astype(np.int64)
    digest = hashlib.sha256(path.tobytes()).hexdigest()[:16]
    assert digest == PINNED_ARGMAX_DIGEST, f"greedy path changed: {digest}"


PINNED_ARGMAX_DIGEST = "4bceb969a21579c6"


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_sar_weights(**TINY)
    for key in (
        "feat_extractor.0.weight",
        "feat_extractor.7.0.downsample.0.weight",  # stem 32 -> stage 64
        "feat_extractor.9.5.weight",               # stage3 trailing conv after 5 blocks
        "feat_extractor.10.4.running_var",         # stage4 trailing bn
        "encoder.rnn.weight_ih_l0",
        "encoder.rnn.bias_hh_l1",
        "encoder.linear.weight",
        "decoder.embed.weight",
        "decoder.embed.bias",
        "decoder.embed_tgt.weight",
        "decoder.attention_module.feat_conv.weight",
        "decoder.attention_module.state_conv.weight",
        "decoder.attention_module.attention_projector.weight",
        "decoder.lstm_cell.weight_ih",
        "decoder.lstm_cell.bias_hh",
        "decoder.output_dense.weight",
    ):
        assert key in p, key
    # resnet31 has NO MAGC: the post-block index is the trailing conv
    assert "feat_extractor.7.1.conv_mask.weight" not in p
    assert [s[0] for s in RESNET31_STAGES] == [1, 2, 5, 3]
    # embed is a Linear over vocab+1; embed_tgt an Embedding to vocab+1
    assert p["decoder.embed.weight"].shape == (64, 11)
    assert p["decoder.embed_tgt.weight"].shape == (64, 11)
    # attention convs carry no bias except feat_conv (reference:52-54)
    assert "decoder.attention_module.state_conv.bias" not in p
    assert "decoder.attention_module.attention_projector.bias" not in p


def test_vocab_size_mismatch_raises():
    w = random_sar_weights(**TINY)
    with pytest.raises(ValueError, match="classes"):
        SARNumpy(w, vocab="abc")


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "sar.npz")
    W.save_weights(path, random_sar_weights(seed=3, **TINY))
    before = W.LOAD_COUNT
    m = SARNumpy(path, vocab="0123456789", max_length=4)
    assert W.LOAD_COUNT == before + 1
    m.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    assert W.LOAD_COUNT == before + 1


# ----------------------------------------------------------- zoo slot


def test_zoo_accepts_sar_instance():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    model = SARNumpy(random_sar_weights(seed=3, **TINY), vocab="0123456789", max_length=6)
    pred = ocr_predictor(reco_arch=model)
    assert pred.cfg.reco_instance is model
    page = rasterize_synth(encode_media_ref("go now", 480, 320))[0].image
    exports = pred.forward_pages([page])
    words = [w for b in exports[0]["blocks"] for l in b["lines"] for w in l["words"]]
    assert len(words) >= 1
    for w in words:
        assert isinstance(w["value"], str)
        assert 0.0 <= w["confidence"] <= 1.0
