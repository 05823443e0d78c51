"""VIPTR tower: the cross-shaped-window partition round trip, OSRA
reduction shapes, the strided conv kernel, the stage pyramid,
determinism pin, key names, load-once, and the zoo slot. The shared
attention/norm/GELU kernels are differentially covered in
test_vitstr.py / test_crnn.py."""

import hashlib

import numpy as np
import pytest

from doctr_ray.viptr import (
    VIPTR_CONFIGS,
    VIPTRNumpy,
    conv2d_st,
    lepe_attention,
    random_viptr_weights,
)

RNG = np.random.RandomState(43)

TINY = dict(vocab_size=10, embed_dims=(16, 32, 64), out_dim=24)


def test_conv2d_st_matches_naive_rect_stride():
    """The per-axis-stride conv (PatchMerging's (2,1)) against a naive
    loop."""
    x = RNG.standard_normal((1, 3, 6, 8)).astype(np.float32)
    w = RNG.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = RNG.standard_normal(4).astype(np.float32)
    got = conv2d_st(x, w, b, stride=(2, 1), pad=(1, 1))
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    want = np.zeros((1, 4, 3, 8))
    for o in range(4):
        for i in range(3):
            for j in range(8):
                want[0, o, i, j] = (
                    xp[0, :, 2 * i : 2 * i + 3, j : j + 3] * w[o]
                ).sum() + b[o]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lepe_window_partition_round_trip():
    """With zeroed get_v (no position encoding) and identity-like attn
    (q=k=0 -> uniform), each window's output is its value mean — the
    partition/merge must place means back into the right strips."""
    C, heads, split = 4, 1, 2
    h, w = 4, 6
    p = {
        "a.get_v.weight": np.zeros((C, 1, 3, 3), np.float32),
        "a.get_v.bias": np.zeros(C, np.float32),
    }
    v = RNG.standard_normal((1, h * w, C)).astype(np.float32)
    qkv = np.stack([np.zeros_like(v), np.zeros_like(v), v])
    out = lepe_attention(qkv, (h, w), p, "a", idx=0, split_size=split, num_heads=heads)
    # idx 0 windows are (h, split) = (4, 2) vertical strips
    vi = v.reshape(1, h, w, C)
    for ws in range(w // split):
        strip = vi[:, :, ws * split : (ws + 1) * split]
        mean = strip.reshape(-1, C).mean(axis=0)
        got = out.reshape(1, h, w, C)[:, :, ws * split : (ws + 1) * split]
        np.testing.assert_allclose(got, np.broadcast_to(mean, got.shape), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_viptr():
    return VIPTRNumpy(random_viptr_weights(seed=3, **TINY), vocab="0123456789")


def test_features_and_logits_shapes(tiny_viptr):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    f = tiny_viptr.features(x)
    # W/4 = 32 sequence steps at out_dim
    assert f.shape == (2, 32, 24)
    logits = tiny_viptr.forward(x)
    assert logits.shape == (2, 32, 11)
    assert np.isfinite(logits).all()


def test_recognize_batch_contract(tiny_viptr):
    preds = tiny_viptr.recognize_batch(
        [(RNG.rand(20, 64) * 255).astype(np.uint8),
         (RNG.rand(30, 90, 3) * 255).astype(np.uint8)]
    )
    assert len(preds) == 2
    assert all(isinstance(t, str) and 0 <= c <= 1 for t, c in preds)


def test_fixed_seed_argmax_path_pinned(tiny_viptr):
    x = np.linspace(-1, 1, 3 * 32 * 128, dtype=np.float32).reshape(1, 3, 32, 128)
    path = tiny_viptr.forward(x).argmax(axis=-1).astype(np.int64)
    digest = hashlib.sha256(path.tobytes()).hexdigest()[:16]
    assert digest == PINNED_ARGMAX_DIGEST, f"forward path changed: {digest}"


PINNED_ARGMAX_DIGEST = "fa3deb4c8a5c6d48"


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_viptr_weights(**TINY)
    for key in (
        "feat_extractor.0.proj.0.weight",               # patch embed conv 1
        "feat_extractor.0.proj.4.running_var",          # patch embed bn 2
        "feat_extractor.1.local_unit.0.qkv.weight",     # stage1 CSWin
        "feat_extractor.1.local_unit.2.attns.1.get_v.weight",
        "feat_extractor.1.downsample.reduction.weight",
        "feat_extractor.1.downsample.norm.weight",
        "feat_extractor.2.local_unit.0.norm1.weight",   # mixed local half
        "feat_extractor.2.global_unit.0.token_mixer.q.weight",
        "feat_extractor.2.global_unit.1.token_mixer.sr.0.weight",
        "feat_extractor.2.global_unit.2.token_mixer.local_conv.bias",
        "feat_extractor.2.proj.0.weight",               # mixed conv-proj
        "feat_extractor.2.proj.7.running_mean",
        "feat_extractor.3.local_unit.0.mixer.qkv.weight",  # global MHSA
        "feat_extractor.3.local_unit.2.mlp.3.bias",
        "feat_extractor.4.0.weight",                    # tail LN
        "feat_extractor.5.0.weight",                    # neck linear
        "head.weight",
        "head.bias",
    ):
        assert key in p, key
    # the neck linear has NO bias (VIPNet mlp_head Linear(bias=False))
    assert "feat_extractor.5.0.bias" not in p
    # depthwise shapes: get_v over the CSWin half, sr over OSRA half
    assert p["feat_extractor.1.local_unit.0.attns.0.get_v.weight"].shape == (8, 1, 3, 3)
    assert p["feat_extractor.2.global_unit.0.token_mixer.sr.0.weight"].shape == (16, 1, 5, 5)


def test_vocab_size_mismatch_raises():
    with pytest.raises(ValueError, match="classes"):
        VIPTRNumpy(random_viptr_weights(**TINY), vocab="abc")


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown viptr"):
        VIPTRNumpy({}, arch="viptr_base")


def test_real_config_is_the_reference_vip_tiny():
    cfg = VIPTR_CONFIGS["viptr_tiny"]
    assert cfg["embed_dims"] == (64, 128, 256)
    assert cfg["num_heads"] == (2, 4, 8)
    assert cfg["split_sizes"] == (1, 2, 4)
    assert cfg["sr_ratios"] == (4, 2, 2)
    assert cfg["out_dim"] == 192


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "viptr.npz")
    W.save_weights(path, random_viptr_weights(seed=3, **TINY))
    before = W.LOAD_COUNT
    m = VIPTRNumpy(path, vocab="0123456789")
    assert W.LOAD_COUNT == before + 1
    m.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    assert W.LOAD_COUNT == before + 1


def test_zoo_accepts_viptr_instance(tiny_viptr):
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    pred = ocr_predictor(reco_arch=tiny_viptr)
    assert pred.cfg.reco_instance is tiny_viptr
    page = rasterize_synth(encode_media_ref("go fast", 480, 320))[0].image
    exports = pred.forward_pages([page])
    words = [w for b in exports[0]["blocks"] for l in b["lines"] for w in l["words"]]
    assert len(words) >= 1
    for w in words:
        assert isinstance(w["value"], str)
        assert 0.0 <= w["confidence"] <= 1.0
