"""FAST tower: the RepConv branch sum and half-pixel bilinear resize
differentially tested against naive implementations, the TextNet stage
pyramid, the erosion-reversal pooling order, determinism pins, key
names per arch, load-once, and the zoo slot."""

import hashlib

import numpy as np
import pytest

from doctr_ray.fast import (
    TEXTNET_STAGES,
    FASTNumpy,
    bilinear_resize,
    fast_conv_layer,
    random_fast_weights,
)

RNG = np.random.RandomState(37)


# ---------------------------------------------------------------- kernels


def test_bilinear_resize_half_pixel_convention():
    """align_corners=False: upsampling [a, b] by 2 gives the 1/4 - 3/4
    interpolation pattern (NOT the align_corners=True endpoints)."""
    x = np.array([[[[0.0, 4.0]]]], np.float32)
    out = bilinear_resize(x, (1, 4))
    np.testing.assert_allclose(out[0, 0, 0], [0.0, 1.0, 3.0, 4.0], atol=1e-6)
    # identity when size matches
    assert bilinear_resize(x, (1, 2)) is x


def test_bilinear_resize_matches_naive_grid():
    x = RNG.standard_normal((1, 2, 5, 7)).astype(np.float32)
    Ho, Wo = 11, 4
    got = bilinear_resize(x, (Ho, Wo))
    want = np.zeros((1, 2, Ho, Wo))
    for i in range(Ho):
        sy = min(max((i + 0.5) * 5 / Ho - 0.5, 0), 4)
        y0 = min(int(np.floor(sy)), 3)
        ty = sy - y0
        for j in range(Wo):
            sx = min(max((j + 0.5) * 7 / Wo - 0.5, 0), 6)
            x0 = min(int(np.floor(sx)), 5)
            tx = sx - x0
            want[0, :, i, j] = (
                x[0, :, y0, x0] * (1 - ty) * (1 - tx)
                + x[0, :, y0, x0 + 1] * (1 - ty) * tx
                + x[0, :, y0 + 1, x0] * ty * (1 - tx)
                + x[0, :, y0 + 1, x0 + 1] * ty * tx
            )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _bn(p, name, c, rng):
    p[f"{name}.weight"] = (1 + 0.1 * rng.rand(c)).astype(np.float32)
    p[f"{name}.bias"] = (0.1 * rng.randn(c)).astype(np.float32)
    p[f"{name}.running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
    p[f"{name}.running_var"] = (1 + 0.1 * rng.rand(c)).astype(np.float32)


def test_fast_conv_layer_sums_all_branches():
    """The unfused RepConv: main 3x3 + vertical 3x1 + horizontal 1x3 +
    identity BN, summed before the ReLU — verified against an explicit
    per-branch recomputation."""
    rng = np.random.RandomState(2)
    C = 4
    p = {}
    p["l.conv.weight"] = (rng.randn(C, C, 3, 3) * 0.2).astype(np.float32)
    _bn(p, "l.bn", C, rng)
    p["l.ver_conv.weight"] = (rng.randn(C, C, 3, 1) * 0.2).astype(np.float32)
    _bn(p, "l.ver_bn", C, rng)
    p["l.hor_conv.weight"] = (rng.randn(C, C, 1, 3) * 0.2).astype(np.float32)
    _bn(p, "l.hor_bn", C, rng)
    _bn(p, "l.rbr_identity", C, rng)
    x = rng.randn(1, C, 6, 6).astype(np.float32)
    got = fast_conv_layer(x, p, "l", stride=1)

    def branch(w, name, pad):
        from doctr_ray.fast import _conv_rect

        out = _conv_rect(x, w, 1, pad)
        g, b = p[f"{name}.weight"], p[f"{name}.bias"]
        m, v = p[f"{name}.running_mean"], p[f"{name}.running_var"]
        return (out - m[None, :, None, None]) / np.sqrt(
            v[None, :, None, None] + 1e-5
        ) * g[None, :, None, None] + b[None, :, None, None]

    idn = (x - p["l.rbr_identity.running_mean"][None, :, None, None]) / np.sqrt(
        p["l.rbr_identity.running_var"][None, :, None, None] + 1e-5
    ) * p["l.rbr_identity.weight"][None, :, None, None] + p["l.rbr_identity.bias"][
        None, :, None, None
    ]
    want = np.maximum(
        branch(p["l.conv.weight"], "l.bn", (1, 1))
        + branch(p["l.ver_conv.weight"], "l.ver_bn", (1, 0))
        + branch(p["l.hor_conv.weight"], "l.hor_bn", (0, 1))
        + idn,
        0,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------- end-to-end tower


@pytest.fixture(scope="module")
def tiny_fast():
    return FASTNumpy(random_fast_weights("fast_tiny"), arch="fast_tiny",
                     input_shape=(128, 128))


def test_stage_pyramid_shapes(tiny_fast):
    x = RNG.standard_normal((1, 3, 128, 128)).astype(np.float32)
    feats = tiny_fast.features(x)
    assert [f.shape for f in feats] == [
        (1, 64, 32, 32),
        (1, 128, 16, 16),
        (1, 256, 8, 8),
        (1, 512, 4, 4),
    ]
    fused = tiny_fast.neck(feats)
    assert fused.shape == (1, 512, 32, 32)  # 4 x 128 at f1's scale
    prob = tiny_fast.prob_map(x)
    assert prob.shape == (1, 1, 128, 128)
    assert (prob >= 0).all() and (prob <= 1).all()


def test_detect_runs_end_to_end(tiny_fast):
    boxes = tiny_fast.detect((RNG.rand(90, 140) * 255).astype(np.uint8))
    assert boxes.ndim == 2 and boxes.shape[1] == 5


def test_fixed_seed_binmap_pinned(tiny_fast):
    x = np.linspace(-1, 1, 3 * 128 * 128, dtype=np.float32).reshape(1, 3, 128, 128)
    mask = (tiny_fast.prob_map(x)[0, 0] > tiny_fast.bin_thresh).astype(np.uint8)
    digest = hashlib.sha256(mask.tobytes()).hexdigest()[:16]
    assert digest == PINNED_BINMAP_DIGEST, f"binarized map changed: {digest}"


PINNED_BINMAP_DIGEST = "4b3d3d266ba0313e"


@pytest.mark.parametrize("arch", ["fast_tiny", "fast_small", "fast_base"])
def test_checkpoint_keys_per_arch(arch):
    p = random_fast_weights(arch)
    stages = TEXTNET_STAGES[arch]
    # stem + one key per block of each stage
    assert "feat_extractor.0.weight" in p
    assert "feat_extractor.1.running_var" in p
    for si, stage in enumerate(stages, start=3):
        for bi, (in_c, out_c, (kh, kw), stride) in enumerate(stage):
            pre = f"feat_extractor.{si}.{bi}"
            assert f"{pre}.conv.weight" in p, pre
            assert (f"{pre}.ver_conv.weight" in p) == (kw != 1), pre
            assert (f"{pre}.hor_conv.weight" in p) == (kh != 1), pre
            assert (f"{pre}.rbr_identity.weight" in p) == (
                in_c == out_c and stride == 1
            ), pre
    for i in range(4):
        assert f"neck.reduction.{i}.conv.weight" in p
    assert p["neck.reduction.3.conv.weight"].shape == (128, 512, 3, 3)
    assert p["prob_head.0.conv.weight"].shape == (128, 512, 3, 3)
    assert p["prob_head.2.weight"].shape == (1, 128, 1, 1)


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown fast"):
        FASTNumpy({}, arch="fast_large")


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "fast.npz")
    W.save_weights(path, random_fast_weights("fast_tiny"))
    before = W.LOAD_COUNT
    m = FASTNumpy(path, arch="fast_tiny", input_shape=(64, 64))
    assert W.LOAD_COUNT == before + 1
    m.detect((RNG.rand(50, 50) * 255).astype(np.uint8))
    assert W.LOAD_COUNT == before + 1


def test_zoo_accepts_fast_instance(tiny_fast, ray_session):
    from doctr_ray.zoo import ocr_predictor

    pred = ocr_predictor(det_arch=tiny_fast)
    assert pred.cfg.det_instance is tiny_fast
