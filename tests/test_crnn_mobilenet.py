"""CRNN-MobileNetV3 variants: the rectangular-stride backbone contract
(the ``_r`` backbones keep the 32-step width sequence), both profile
shapes, determinism pins, load-once accounting, and the zoo slot."""

import hashlib

import numpy as np
import pytest

from doctr_ray.crnn import (
    CRNNMobileNet,
    ctc_best_path,
    random_crnn_mobilenet_weights,
)
from doctr_ray.mobilenet import (
    LARGE_RECT_STRIDES,
    SMALL_RECT_STRIDES,
    MobileNetV3Small,
    random_mobilenet_weights,
)

RNG = np.random.RandomState(29)


def test_rect_strides_preserve_width():
    """The _r variant's (2, 1) depthwise strides keep W at 1/4 while H
    collapses to 1 for a 32x128 input; the square variant halves both."""
    w = random_mobilenet_weights(seed=1, include_classifier=False)
    rect = MobileNetV3Small(w, rect_strides=SMALL_RECT_STRIDES)
    square = MobileNetV3Small(w)
    x = RNG.standard_normal((1, 3, 32, 128)).astype(np.float32)
    assert rect.features(x).shape == (1, 576, 1, 32)
    assert square.features(x).shape == (1, 576, 1, 4)


@pytest.fixture(scope="module")
def small_tower():
    return CRNNMobileNet(
        random_crnn_mobilenet_weights(vocab_size=10, seed=3),
        vocab="0123456789",
    )


def test_small_forward_and_decode(small_tower):
    x = RNG.standard_normal((2, 3, 32, 128)).astype(np.float32)
    logits = small_tower.forward(x)
    assert logits.shape == (2, 32, 11)
    preds = ctc_best_path(logits, small_tower.vocab)
    assert len(preds) == 2
    for text, conf in preds:
        assert isinstance(text, str) and 0.0 <= conf <= 1.0


def test_large_profile_shapes():
    m = CRNNMobileNet(
        random_crnn_mobilenet_weights("crnn_mobilenet_v3_large", vocab_size=10, seed=0),
        arch="crnn_mobilenet_v3_large",
        vocab="0123456789",
    )
    x = np.zeros((1, 3, 32, 128), np.float32)
    f = m.features(x)
    assert f.shape == (1, 960, 1, 32)
    assert m.forward(x).shape == (1, 32, 11)
    assert m.backbone.rect_strides == LARGE_RECT_STRIDES


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown crnn-mobilenet"):
        CRNNMobileNet({}, arch="crnn_mobilenet_v3_tiny")


def test_fixed_seed_argmax_path_pinned(small_tower):
    x = np.linspace(-1, 1, 3 * 32 * 128, dtype=np.float32).reshape(1, 3, 32, 128)
    path = small_tower.forward(x).argmax(axis=-1).astype(np.int64)
    digest = hashlib.sha256(path.tobytes()).hexdigest()[:16]
    assert digest == PINNED_ARGMAX_DIGEST, f"forward argmax path changed: {digest}"


PINNED_ARGMAX_DIGEST = "a464ed7f077594e2"


def test_checkpoint_keys_are_recognition_scoped():
    p = random_crnn_mobilenet_weights(vocab_size=5)
    for key in (
        "feat_extractor.0.0.weight",
        "feat_extractor.1.block.1.fc1.weight",  # SE in block 1 (small)
        "feat_extractor.12.0.weight",           # final 1x1 conv
        "decoder.weight_ih_l0",
        "decoder.bias_hh_l1_reverse",
        "linear.weight",
    ):
        assert key in p, key
    assert "classifier.0.weight" not in p  # recognition blob has no top
    # the head's first LSTM consumes the 576-wide small feature
    assert p["decoder.weight_ih_l0"].shape[1] == 576


def test_weights_load_once(tmp_path):
    import doctr_ray.weights as W

    path = str(tmp_path / "crnn_mnv3.npz")
    W.save_weights(path, random_crnn_mobilenet_weights(vocab_size=10, seed=3))
    before = W.LOAD_COUNT
    m = CRNNMobileNet(path, vocab="0123456789")
    assert W.LOAD_COUNT == before + 1  # backbone + head share ONE load
    m.recognize_batch([(RNG.rand(16, 32) * 255).astype(np.uint8)])
    assert W.LOAD_COUNT == before + 1


def test_zoo_accepts_instance(small_tower):
    from doctr_ray.zoo import ocr_predictor

    pred = ocr_predictor(reco_arch=small_tower)
    assert pred.cfg.reco_instance is small_tower
