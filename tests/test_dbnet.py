"""Numpy DBNet tower: general conv/pool/upsample/deconv kernels
differentially tested against naive implementations, ResNet/FPN/head
shape contracts, a fixed-seed determinism pin, postprocessor
semantics, and checkpoint-key parity with the torch state dict."""

import hashlib

import numpy as np
import pytest

from doctr_ray.dbnet import (
    DBNetNumpy,
    bilinear_upsample,
    conv2d,
    conv_transpose_2x2,
    maxpool2d_s,
    random_dbnet_weights,
)

RNG = np.random.RandomState(3)


def _conv_naive(x, w, b, stride, pad):
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad))).astype(np.float64)
    Ho = (H + 2 * pad - kh) // stride + 1
    Wo = (W + 2 * pad - kw) // stride + 1
    out = np.zeros((B, O, Ho, Wo))
    for n in range(B):
        for o in range(O):
            for i in range(Ho):
                for j in range(Wo):
                    blk = xp[n, :, i * stride : i * stride + kh,
                             j * stride : j * stride + kw]
                    out[n, o, i, j] = (blk * w[o]).sum() + (b[o] if b is not None else 0)
    return out


@pytest.mark.parametrize("k,stride,pad", [(1, 1, 0), (3, 1, 1), (3, 2, 1), (7, 2, 3), (1, 2, 0)])
def test_conv2d_general_matches_naive(k, stride, pad):
    x = RNG.standard_normal((2, 3, 9, 11)).astype(np.float32)
    w = RNG.standard_normal((4, 3, k, k)).astype(np.float32)
    b = RNG.standard_normal(4).astype(np.float32)
    got = conv2d(x, w, b, stride=stride, pad=pad)
    np.testing.assert_allclose(
        got, _conv_naive(x, w, b, stride, pad), rtol=1e-4, atol=1e-4
    )


def test_maxpool_3x3_s2_p1_matches_naive():
    x = RNG.standard_normal((1, 2, 9, 10)).astype(np.float32)
    got = maxpool2d_s(x, 3, 2, 1)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-np.inf)
    Ho = (9 + 2 - 3) // 2 + 1
    Wo = (10 + 2 - 3) // 2 + 1
    want = np.zeros((1, 2, Ho, Wo), np.float32)
    for i in range(Ho):
        for j in range(Wo):
            want[:, :, i, j] = xp[:, :, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3].max(
                axis=(2, 3)
            )
    np.testing.assert_array_equal(got, want)


def test_bilinear_upsample_align_corners():
    # align_corners=True preserves corners exactly and interpolates a
    # linear ramp exactly
    ramp = np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4).repeat(3, axis=2)
    up = bilinear_upsample(ramp, 2)
    assert up.shape == (1, 1, 6, 8)
    assert up[0, 0, 0, 0] == 0.0 and up[0, 0, -1, -1] == 3.0
    # a linear ramp stays linear: src = i*(4-1)/(8-1)
    want = np.arange(8) * 3.0 / 7.0
    np.testing.assert_allclose(up[0, 0, 0], want, rtol=1e-6)
    x = RNG.standard_normal((1, 2, 3, 3)).astype(np.float32)
    assert bilinear_upsample(x, 1) is x


def test_conv_transpose_2x2_matches_naive():
    x = RNG.standard_normal((1, 3, 4, 5)).astype(np.float32)
    w = RNG.standard_normal((3, 2, 2, 2)).astype(np.float32)
    b = RNG.standard_normal(2).astype(np.float32)
    got = conv_transpose_2x2(x, w, b)
    want = np.zeros((1, 2, 8, 10), np.float64)
    for ci in range(3):
        for co in range(2):
            for i in range(4):
                for j in range(5):
                    want[0, co, 2 * i : 2 * i + 2, 2 * j : 2 * j + 2] += (
                        x[0, ci, i, j] * w[ci, co]
                    )
    want += b[None, :, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def small_dbnet():
    return DBNetNumpy(random_dbnet_weights(), input_shape=(128, 128))


def test_backbone_fpn_head_shapes(small_dbnet):
    x = RNG.standard_normal((1, 3, 128, 128)).astype(np.float32)
    feats = small_dbnet.features(x)
    assert [f.shape for f in feats] == [
        (1, 256, 32, 32),
        (1, 512, 16, 16),
        (1, 1024, 8, 8),
        (1, 2048, 4, 4),
    ]
    fused = small_dbnet.fpn(feats)
    assert fused.shape == (1, 256, 32, 32)  # 4 x 64 at 1/4 resolution
    prob = small_dbnet.prob_map(x)
    assert prob.shape == (1, 1, 128, 128)
    assert ((prob >= 0) & (prob <= 1)).all()


def test_fixed_seed_binmap_pinned(small_dbnet):
    x = np.linspace(-1, 1, 3 * 128 * 128, dtype=np.float32).reshape(
        1, 3, 128, 128
    )
    bm = (small_dbnet.prob_map(x)[0, 0] > 0.3).astype(np.uint8)
    digest = hashlib.sha256(bm.tobytes()).hexdigest()[:16]
    assert digest == PINNED_BINMAP_DIGEST, digest


PINNED_BINMAP_DIGEST = "e8d91f79e1177ef1"


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_dbnet_weights()
    for key in (
        "feat_extractor.conv1.weight",
        "feat_extractor.layer1.0.downsample.0.weight",
        "feat_extractor.layer3.5.conv2.weight",
        "feat_extractor.layer4.2.bn3.running_var",
        "fpn.in_branches.3.0.weight",
        "fpn.out_branches.0.1.running_mean",
        "prob_head.0.weight",
        "prob_head.3.weight",
        "prob_head.6.bias",
    ):
        assert key in p, key
    # bottleneck counts: 3+4+6+3 blocks
    assert sum(1 for k in p if k.endswith(".conv3.weight")) == 16


def test_boxes_from_prob_semantics(small_dbnet):
    prob = np.zeros((64, 64), np.float32)
    prob[10:20, 5:25] = 0.9         # strong component -> box
    prob[40:42, 40:41] = 0.9        # 1x2: below min_size 2 -> dropped
    prob[50:60, 30:50] = 0.32       # above bin_thresh, weak score
    boxes = small_dbnet.boxes_from_prob(prob)
    assert len(boxes) == 2
    strong = boxes[0]
    np.testing.assert_allclose(
        strong[:4], [5 / 64, 10 / 64, 25 / 64, 20 / 64], rtol=1e-6
    )
    assert strong[4] > 0.8
    # raise box_thresh: the weak component dies
    small_dbnet.box_thresh, old = 0.5, small_dbnet.box_thresh
    try:
        assert len(small_dbnet.boxes_from_prob(prob)) == 1
    finally:
        small_dbnet.box_thresh = old


def test_detect_runs_end_to_end(small_dbnet):
    page = np.full((100, 80), 255, np.uint8)
    page[20:40, 10:60] = 0
    boxes = small_dbnet.detect(page)
    assert boxes.ndim == 2 and boxes.shape[1] == 5
    assert ((boxes[:, :4] >= 0) & (boxes[:, :4] <= 1)).all()


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "dbnet.npz")
    W.save_weights(path, random_dbnet_weights())
    before = W.LOAD_COUNT
    m = DBNetNumpy(path, input_shape=(64, 64))
    assert W.LOAD_COUNT == before + 1
    m.detect(np.full((40, 40), 255, np.uint8))
    m.detect(np.full((40, 40), 255, np.uint8))
    assert W.LOAD_COUNT == before + 1


def test_zoo_accepts_dbnet_instance(ray_session):
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    det = DBNetNumpy(random_dbnet_weights(), input_shape=(128, 128))
    pred = ocr_predictor(det_arch=det)
    assert pred.cfg.det_instance is det
    page = rasterize_synth(encode_media_ref("hello world", 320, 240))[0].image
    exports = pred.forward_pages([page])  # random weights: garbage boxes,
    assert len(exports) == 1              # but the slot contract holds
    assert "blocks" in exports[0]


def test_db_resnet34_basicblock_variant():
    """db_resnet34: BasicBlock encoder (64..512 pyramid) under the same
    DB FPN/head."""
    from doctr_ray.dbnet import DBNetNumpy, random_dbnet_weights

    w = random_dbnet_weights(arch="db_resnet34")
    assert "feat_extractor.layer1.0.conv1.weight" in w
    assert "feat_extractor.layer1.0.conv3.weight" not in w   # no bottleneck
    assert "feat_extractor.layer1.0.downsample.0.weight" not in w
    assert "feat_extractor.layer2.0.downsample.0.weight" in w
    assert w["fpn.in_branches.3.0.weight"].shape == (256, 512, 1, 1)
    m = DBNetNumpy(w, arch="db_resnet34", input_shape=(64, 64))
    x = np.zeros((1, 3, 64, 64), np.float32)
    feats = m.features(x)
    assert [f.shape[1] for f in feats] == [64, 128, 256, 512]
    assert m.prob_map(x).shape == (1, 1, 64, 64)


def test_db_unknown_arch_raises():
    import pytest as _pytest

    from doctr_ray.dbnet import DBNetNumpy

    with _pytest.raises(ValueError, match="unknown dbnet"):
        DBNetNumpy({}, arch="db_resnet18")
