"""Numpy MobileNetV3-small tower: depthwise-conv kernel differentially
tested against a naive loop, checkpoint-key parity with the torchvision
state-dict naming, shape contracts, a fixed-seed determinism pin, and
the orientation-classify postprocess."""

import numpy as np
import pytest

from doctr_ray.mobilenet import (
    ORIENTATION_CLASSES,
    SMALL_CONF,
    MobileNetV3Small,
    _divisible,
    depthwise_conv2d,
    hardsigmoid,
    hardswish,
    random_mobilenet_weights,
)

RNG = np.random.RandomState(7)


def _depthwise_naive(x, w, stride, pad):
    B, C, H, W = x.shape
    k = w.shape[2]
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad))).astype(np.float64)
    Ho = (H + 2 * pad - k) // stride + 1
    Wo = (W + 2 * pad - k) // stride + 1
    out = np.zeros((B, C, Ho, Wo))
    for n in range(B):
        for c in range(C):
            for i in range(Ho):
                for j in range(Wo):
                    blk = xp[n, c, i * stride : i * stride + k,
                             j * stride : j * stride + k]
                    out[n, c, i, j] = (blk * w[c, 0]).sum()
    return out


@pytest.mark.parametrize("k,stride", [(3, 1), (3, 2), (5, 1), (5, 2)])
def test_depthwise_matches_naive(k, stride):
    x = RNG.randn(2, 6, 11, 13).astype(np.float32)
    w = RNG.randn(6, 1, k, k).astype(np.float32)
    pad = (k - 1) // 2
    got = depthwise_conv2d(x, w, stride=stride, pad=pad)
    want = _depthwise_naive(x, w, stride, pad)
    assert np.allclose(got, want, atol=1e-4)


def test_hard_activations():
    x = np.array([-4.0, -3.0, 0.0, 3.0, 6.0], np.float32)
    assert np.allclose(hardsigmoid(x), [0, 0, 0.5, 1, 1])
    assert np.allclose(hardswish(x), x * np.clip(x / 6 + 0.5, 0, 1))


def test_divisible_rule():
    # torchvision _make_divisible(v, 8) fixtures
    assert _divisible(16 // 4) == 8
    assert _divisible(72 // 4) == 24  # 16 < 0.9*18 -> bumped a step
    assert _divisible(240 // 4) == 64
    assert _divisible(120 // 4) == 32


def test_checkpoint_keys_match_torchvision_names():
    p = random_mobilenet_weights(0)
    assert "features.0.0.weight" in p and p["features.0.0.weight"].shape == (
        16, 3, 3, 3,
    )
    # block 1 has no expand layer (16 == 16): depthwise is block.0
    assert "features.1.block.0.0.weight" in p
    assert p["features.1.block.0.0.weight"].shape == (16, 1, 3, 3)
    assert "features.1.block.1.fc1.weight" in p  # SE
    # block 2 expands 16 -> 72: expand at block.0, depthwise block.1
    assert p["features.2.block.0.0.weight"].shape == (72, 16, 1, 1)
    assert p["features.2.block.1.0.weight"].shape == (72, 1, 3, 3)
    assert "features.2.block.2.fc1" not in {k[:24] for k in p}  # no SE
    assert p["features.12.0.weight"].shape == (576, 96, 1, 1)
    assert p["classifier.0.weight"].shape == (1024, 576)
    assert p["classifier.3.weight"].shape == (4, 1024)
    # every key uses the torchvision naming alphabet
    for k in p:
        assert k.startswith(("features.", "classifier.")), k


def test_forward_shapes_and_determinism():
    m = MobileNetV3Small(random_mobilenet_weights(0))
    x = np.random.RandomState(1).rand(2, 3, 64, 64).astype(np.float32)
    a = m.forward(x)
    assert a.shape == (2, 4)
    b = MobileNetV3Small(random_mobilenet_weights(0)).forward(x)
    assert np.array_equal(a, b)
    # batch independence: same row regardless of batch composition
    solo = m.forward(x[:1])
    assert np.allclose(a[0], solo[0], atol=1e-5)


def test_classify_postprocess():
    m = MobileNetV3Small(random_mobilenet_weights(3))
    x = np.random.RandomState(2).rand(3, 3, 64, 64).astype(np.float32)
    idx, angles, conf = m.classify(x)
    assert idx.shape == angles.shape == conf.shape == (3,)
    assert all(a in ORIENTATION_CLASSES for a in angles)
    assert ((conf > 0) & (conf <= 1)).all()
    # angles are the reference's class list order [0, -90, 180, 90]
    assert np.array_equal(angles, np.asarray(ORIENTATION_CLASSES)[idx])


def test_weights_roundtrip_via_npz(tmp_path):
    from doctr_ray.weights import save_weights

    p = random_mobilenet_weights(1)
    path = str(tmp_path / "mnv3.npz")
    save_weights(path, p)
    m = MobileNetV3Small(path)
    x = np.random.RandomState(4).rand(1, 3, 32, 32).astype(np.float32)
    assert np.array_equal(
        m.forward(x), MobileNetV3Small(p).forward(x)
    )


def test_orientation_predictor_list_contract():
    """Reference OrientationPredictor contract
    (classification/predictor/pytorch.py:36-70): list-of-images ->
    [class_idxs, class_angles, confs]; disabled -> zeros with 1.0."""
    from doctr_ray.zoo import (
        crop_orientation_predictor,
        page_orientation_predictor,
    )

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (40 + i, 60, 3), dtype=np.uint8) for i in range(3)]
    p = crop_orientation_predictor(batch_size=2)
    idxs, angles, confs = p(imgs)
    assert len(idxs) == len(angles) == len(confs) == 3
    assert all(a in ORIENTATION_CLASSES for a in angles)
    assert all(0 < c <= 1 and c == round(c, 2) for c in confs)
    # batch-size independence
    assert crop_orientation_predictor(batch_size=1)(imgs) == [idxs, angles, confs]
    d = page_orientation_predictor(disabled=True)
    assert d(imgs) == [[0, 0, 0], [0, 0, 0], [1.0, 1.0, 1.0]]
    assert d([]) == [[], [], []]
    with pytest.raises(ValueError, match="multi-channel"):
        p([np.zeros((4, 4), np.uint8)])


def test_orientation_predictor_instance_slot():
    """instance-not-name (reference classification/zoo.py:56-62): a
    loaded MobileNetV3Small occupies the model slot; unknown names and
    types raise like the reference zoo."""
    from doctr_ray.zoo import crop_orientation_predictor

    inst = MobileNetV3Small(random_mobilenet_weights(5))
    p = crop_orientation_predictor(arch=inst)
    assert p.model is inst and p.input_size == (256, 256)
    with pytest.raises(ValueError, match="unknown architecture"):
        crop_orientation_predictor(arch="resnet18_orientation")
    with pytest.raises(ValueError, match="unknown architecture"):
        crop_orientation_predictor(arch=123)


def test_conf_table_matches_torchvision_small_profile():
    # channel bookkeeping: each row's in_c equals the previous out_c
    prev = 16
    for in_c, k, exp_c, out_c, _se, _hs, stride in SMALL_CONF:
        assert in_c == prev
        assert k in (3, 5) and stride in (1, 2) and exp_c >= in_c
        prev = out_c
    assert prev == 96


def test_orientation_instance_in_predictor_slot():
    """ocr_predictor(orientation_predictor=...) routes page rotation
    through the model slot instead of the deterministic estimator —
    the reference's assume_straight_pages=False wiring."""
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.orientation import rotate_image_90
    from doctr_ray.zoo import ocr_predictor

    page = rasterize_synth(encode_media_ref("orientation slot words"))[0].image
    rotated = rotate_image_90(page, 90)

    class Fixed:
        """OrientationPredictor-contract stub reporting +90."""

        calls = 0

        def __call__(self, imgs):
            Fixed.calls += len(imgs)
            return [[1] * len(imgs), [90] * len(imgs), [0.99] * len(imgs)]

    base = ocr_predictor(detect_orientation=True)
    slot = ocr_predictor(detect_orientation=True, orientation_predictor=Fixed())
    a = base([rotated])[0]
    b = slot([rotated])[0]
    assert Fixed.calls == 1
    # both routes must deskew the +90 page back to the same layout
    texts = lambda e: [
        w["value"] for blk in e["blocks"] for ln in blk["lines"] for w in ln["words"]
    ]
    assert texts(a) == texts(b)
