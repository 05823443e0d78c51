"""Numpy LinkNet tower: the general conv-transpose kernel and the
BasicBlock differentially tested against naive scatter/loop
implementations (torch is absent, so the per-op math — torch's
documented semantics — is the oracle), plus encoder/FPN/head shapes,
a fixed-seed determinism pin, checkpoint key names, load-once weights
accounting, and the zoo's instance-not-name detection slot."""

import hashlib

import numpy as np
import pytest

from doctr_ray.linknet import (
    LINKNET_LAYERS,
    LinkNetNumpy,
    basic_block,
    conv_transpose2d,
    random_linknet_weights,
)

RNG = np.random.RandomState(5)


# ---------------------------------------------------------------- kernels


def _convt_naive(x, w, b, stride, pad, output_pad):
    """Scatter-accumulate re-derivation of ConvTranspose2d: every input
    pixel adds x * w into the (stride-spaced) output window, then the
    ``pad`` ring is cut off and ``output_pad`` rows/cols appended."""
    B, C, H, W = x.shape
    _, O, kh, kw = w.shape
    Hf, Wf = (H - 1) * stride + kh, (W - 1) * stride + kw
    full = np.zeros((B, O, Hf, Wf), np.float64)
    for n in range(B):
        for ci in range(C):
            for i in range(H):
                for j in range(W):
                    full[n, :, i * stride : i * stride + kh, j * stride : j * stride + kw] += (
                        x[n, ci, i, j] * w[ci]
                    )
    Ho = (H - 1) * stride - 2 * pad + kh + output_pad
    Wo = (W - 1) * stride - 2 * pad + kw + output_pad
    out = np.zeros((B, O, Ho, Wo), np.float64)
    core = full[:, :, pad : pad + Ho, pad : pad + Wo]
    out[:, :, : core.shape[2], : core.shape[3]] = core
    if b is not None:
        out += b[None, :, None, None]
    return out


@pytest.mark.parametrize(
    "k,stride,pad,output_pad",
    [(2, 2, 0, 0), (3, 2, 1, 1), (3, 1, 1, 0), (4, 3, 1, 2)],
)
def test_conv_transpose2d_matches_naive(k, stride, pad, output_pad):
    x = RNG.standard_normal((2, 3, 4, 5)).astype(np.float32)
    w = RNG.standard_normal((3, 2, k, k)).astype(np.float32)
    b = RNG.standard_normal(2).astype(np.float32)
    got = conv_transpose2d(x, w, b, stride=stride, pad=pad, output_pad=output_pad)
    want = _convt_naive(x, w, b, stride, pad, output_pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_basic_block_identity_and_downsample_paths():
    p = {}
    rng = np.random.RandomState(2)

    def conv(name, o, c, k):
        p[f"{name}.weight"] = (rng.standard_normal((o, c, k, k)) * 0.2).astype(np.float32)

    def bn(name, c):
        p[f"{name}.weight"] = np.ones(c, np.float32)
        p[f"{name}.bias"] = np.zeros(c, np.float32)
        p[f"{name}.running_mean"] = np.zeros(c, np.float32)
        p[f"{name}.running_var"] = np.ones(c, np.float32)

    # identity path: in == out, stride 1 — residual is x itself
    conv("b.conv1", 4, 4, 3), bn("b.bn1", 4)
    conv("b.conv2", 4, 4, 3), bn("b.bn2", 4)
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    out = basic_block(x, p, "b", stride=1)
    assert out.shape == x.shape
    assert (out >= 0).all()  # final relu
    # with zeroed convs the block must reduce to relu(x)
    z = {k: (np.zeros_like(v) if "conv" in k else v) for k, v in p.items()}
    np.testing.assert_allclose(basic_block(x, z, "b", 1), np.maximum(x, 0), atol=1e-6)

    # downsample path: stride 2 halves the map through the 1x1 conv
    conv("d.conv1", 8, 4, 3), bn("d.bn1", 8)
    conv("d.conv2", 8, 8, 3), bn("d.bn2", 8)
    conv("d.downsample.0", 8, 4, 1), bn("d.downsample.1", 8)
    out2 = basic_block(x, p, "d", stride=2)
    assert out2.shape == (1, 8, 3, 3)


# --------------------------------------------------------- end-to-end tower


@pytest.fixture(scope="module")
def small_linknet():
    return LinkNetNumpy(random_linknet_weights(), input_shape=(128, 128))


def test_backbone_fpn_head_shapes(small_linknet):
    x = RNG.standard_normal((1, 3, 128, 128)).astype(np.float32)
    feats = small_linknet.features(x)
    assert [f.shape for f in feats] == [
        (1, 64, 32, 32),
        (1, 128, 16, 16),
        (1, 256, 8, 8),
        (1, 512, 4, 4),
    ]
    fused = small_linknet.fpn(feats)
    assert fused.shape == (1, 64, 32, 32)  # decoders[0] keeps 1/4 res
    prob = small_linknet.prob_map(x)
    assert prob.shape == (1, 1, 128, 128)  # two stride-2 transposes
    assert (prob >= 0).all() and (prob <= 1).all()


def test_resnet34_variant_layer_counts():
    w = random_linknet_weights("linknet_resnet34")
    blocks = {k.split(".")[1:3][0] + "." + k.split(".")[2] for k in w if k.startswith("feat_extractor.layer")}
    per_layer = [sum(1 for b in blocks if b.startswith(f"layer{i}.")) for i in (1, 2, 3, 4)]
    assert per_layer == LINKNET_LAYERS["linknet_resnet34"]
    m = LinkNetNumpy(w, arch="linknet_resnet34", input_shape=(64, 64))
    prob = m.prob_map(np.zeros((1, 3, 64, 64), np.float32))
    assert prob.shape == (1, 1, 64, 64)


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown linknet"):
        LinkNetNumpy({}, arch="linknet_resnet99")


def test_fixed_seed_binmap_pinned(small_linknet):
    """Determinism contract: the binarized map of the fixed-seed tower
    on a fixed input must never drift."""
    x = np.linspace(-1, 1, 3 * 128 * 128, dtype=np.float32).reshape(1, 3, 128, 128)
    mask = (small_linknet.prob_map(x)[0, 0] > small_linknet.bin_thresh).astype(np.uint8)
    digest = hashlib.sha256(mask.tobytes()).hexdigest()[:16]
    assert digest == PINNED_BINMAP_DIGEST, f"binarized map changed: {digest}"


PINNED_BINMAP_DIGEST = "f23daea0b2f0b95a"


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_linknet_weights()
    for key in (
        "feat_extractor.conv1.weight",
        "feat_extractor.bn1.running_var",
        "feat_extractor.layer1.0.conv1.weight",
        "feat_extractor.layer2.0.downsample.0.weight",
        "feat_extractor.layer2.0.downsample.1.running_mean",
        "feat_extractor.layer4.1.bn2.bias",
        "fpn.decoders.0.0.weight",
        "fpn.decoders.3.3.weight",
        "fpn.decoders.3.7.running_var",
        "classifier.0.weight",
        "classifier.3.weight",
        "classifier.6.weight",
        "classifier.6.bias",
    ):
        assert key in p, key
    # layer1 blocks have no downsample (stride 1, 64 -> 64)
    assert "feat_extractor.layer1.0.downsample.0.weight" not in p
    # decoder convT shape is torch's (C_in, C_out, kh, kw) with mid = in//4
    assert p["fpn.decoders.3.3.weight"].shape == (128, 128, 3, 3)
    assert p["classifier.0.weight"].shape == (64, 32, 3, 3)


def test_boxes_from_prob_semantics(small_linknet):
    prob = np.zeros((64, 64), np.float32)
    prob[10:20, 5:30] = 0.9  # strong component
    prob[40:42, 40:41] = 0.9  # sub-min-size component (w < 2)
    boxes = small_linknet.boxes_from_prob(prob)
    assert len(boxes) == 1
    x0, y0, x1, y1, score = boxes[0]
    assert abs(x0 - 5 / 64) < 0.02 and abs(y0 - 10 / 64) < 0.02
    assert score > 0.8


def test_detect_runs_end_to_end(small_linknet):
    page = (RNG.rand(100, 160) * 255).astype(np.uint8)
    boxes = small_linknet.detect(page)
    assert boxes.ndim == 2 and boxes.shape[1] == 5
    if len(boxes):
        assert (boxes[:, :4] >= 0).all() and (boxes[:, :4] <= 1).all()


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "linknet.npz")
    W.save_weights(path, random_linknet_weights())
    before = W.LOAD_COUNT
    m = LinkNetNumpy(path, input_shape=(64, 64))
    assert W.LOAD_COUNT == before + 1
    m.detect((RNG.rand(50, 50) * 255).astype(np.uint8))
    m.detect((RNG.rand(50, 50) * 255).astype(np.uint8))
    assert W.LOAD_COUNT == before + 1


def test_zoo_accepts_linknet_instance(ray_session):
    from doctr_ray.zoo import ocr_predictor

    det = LinkNetNumpy(random_linknet_weights(), input_shape=(128, 128))
    pred = ocr_predictor(det_arch=det)
    assert pred.cfg.det_instance is det


def test_resnet50_bottleneck_variant():
    """linknet_resnet50: Bottleneck encoder (256..2048 channel pyramid)
    under the same decoder FPN; the classifier consumes layer1's 256."""
    w = random_linknet_weights("linknet_resnet50")
    assert "feat_extractor.layer1.0.conv3.weight" in w       # bottleneck
    assert "feat_extractor.layer1.0.downsample.0.weight" in w  # 64 -> 256
    assert w["fpn.decoders.3.0.weight"].shape == (512, 2048, 1, 1)
    assert w["classifier.0.weight"].shape == (256, 32, 3, 3)
    m = LinkNetNumpy(w, arch="linknet_resnet50", input_shape=(64, 64))
    x = np.zeros((1, 3, 64, 64), np.float32)
    feats = m.features(x)
    assert [f.shape[1] for f in feats] == [256, 512, 1024, 2048]
    prob = m.prob_map(x)
    assert prob.shape == (1, 1, 64, 64)
