"""db_mobilenet_v3_large: the tapped-pyramid contract (channels and
resolutions at features [3, 6, 12, 16]), the shared DB FPN/head over
it, a determinism pin, key names, load-once, and the zoo slot."""

import hashlib

import numpy as np
import pytest

from doctr_ray.dbnet import DBNetMobileNet, random_db_mobilenet_weights

RNG = np.random.RandomState(31)


@pytest.fixture(scope="module")
def tower():
    return DBNetMobileNet(random_db_mobilenet_weights(), input_shape=(128, 128))


def test_tapped_pyramid_shapes(tower):
    x = RNG.standard_normal((1, 3, 128, 128)).astype(np.float32)
    feats = tower.features(x)
    # mobilenet_v3_large taps at 1/4, 1/8, 1/16, 1/32
    assert [f.shape for f in feats] == [
        (1, 24, 32, 32),
        (1, 40, 16, 16),
        (1, 112, 8, 8),
        (1, 960, 4, 4),
    ]
    prob = tower.prob_map(x)
    assert prob.shape == (1, 1, 128, 128)
    assert (prob >= 0).all() and (prob <= 1).all()


def test_detect_runs_end_to_end(tower):
    boxes = tower.detect((RNG.rand(90, 140) * 255).astype(np.uint8))
    assert boxes.ndim == 2 and boxes.shape[1] == 5


def test_fixed_seed_binmap_pinned(tower):
    x = np.linspace(-1, 1, 3 * 128 * 128, dtype=np.float32).reshape(1, 3, 128, 128)
    mask = (tower.prob_map(x)[0, 0] > tower.bin_thresh).astype(np.uint8)
    digest = hashlib.sha256(mask.tobytes()).hexdigest()[:16]
    assert digest == PINNED_BINMAP_DIGEST, f"binarized map changed: {digest}"


PINNED_BINMAP_DIGEST = "111ce3c2a38d83a2"


def test_checkpoint_keys_match_torch_state_dict_names():
    p = random_db_mobilenet_weights()
    for key in (
        "feat_extractor.0.0.weight",
        "feat_extractor.4.block.1.0.weight",   # depthwise of block 4
        "feat_extractor.16.0.weight",          # final 1x1 conv
        "fpn.in_branches.0.0.weight",
        "fpn.out_branches.3.1.running_var",
        "prob_head.0.weight",
        "prob_head.6.bias",
    ):
        assert key in p, key
    # lateral convs consume the tapped channel pyramid
    assert p["fpn.in_branches.0.0.weight"].shape == (256, 24, 1, 1)
    assert p["fpn.in_branches.3.0.weight"].shape == (256, 960, 1, 1)
    assert "classifier.0.weight" not in p


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "db_mnv3.npz")
    W.save_weights(path, random_db_mobilenet_weights())
    before = W.LOAD_COUNT
    m = DBNetMobileNet(path, input_shape=(64, 64))
    assert W.LOAD_COUNT == before + 1  # backbone + head share ONE load
    m.detect((RNG.rand(50, 50) * 255).astype(np.uint8))
    assert W.LOAD_COUNT == before + 1


def test_zoo_accepts_instance(tower, ray_session):
    from doctr_ray.zoo import ocr_predictor

    pred = ocr_predictor(det_arch=tower)
    assert pred.cfg.det_instance is tower
