"""Predictor zoo + local factory (ocr_predictor / kie_predictor /
save/from_name)."""

import numpy as np
import pytest

import ray.data as rd

from doctr_ray.corpus import expected_full_text, make_inline_docs
from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.zoo import (
    from_name,
    kie_predictor,
    ocr_predictor,
    save_predictor_config,
)

WORDS = "alpha beta gamma delta epsilon zeta".split()


def test_arch_validation():
    with pytest.raises(ValueError, match="detection architecture"):
        ocr_predictor(det_arch="yolo_v8")
    with pytest.raises(ValueError, match="recognition architecture"):
        ocr_predictor(reco_arch="gpt")
    p = ocr_predictor("db_resnet50", "crnn_vgg16_bn", pretrained=True)
    assert "db_resnet50" in repr(p)


def test_local_mode_pages_roundtrip():
    text = " ".join(WORDS)
    page = rasterize_synth(encode_media_ref(text, 640, 480))[0]
    p = ocr_predictor()
    exports = p.forward_pages([page.image])
    assert len(exports) == 1 and exports[0]["blocks"]
    got = p.render([page.image]).replace("\n", " ")
    assert " ".join(got.split()) == text


def test_local_mode_skewed_page():
    text = " ".join(WORDS)
    page = rasterize_synth(encode_media_ref(text, 640, 480, skew_decidegrees=37))[0]
    p = ocr_predictor(straighten_pages=True)
    got = " ".join(p.render([page.image]).split())
    assert got == text


def test_dataset_mode(ray_session):
    docs = make_inline_docs([("d1", " ".join(WORDS))])
    p = ocr_predictor()
    out = p.extract_text(rd.from_arrow(docs)).to_pandas()
    assert out["full_text"][0] == expected_full_text(" ".join(WORDS))
    spans = p(rd.from_arrow(docs)).to_pandas()
    assert set(spans.columns) == {"doc_id", "ord", "kind", "text", "media_ref", "offset"}


def test_local_hub_roundtrip(tmp_path):
    p = ocr_predictor("fast_tiny", "parseq", keep_reading_order=True)
    path = save_predictor_config(p, "my-ocr", str(tmp_path))
    assert path.endswith("config.json")
    q = from_name("my-ocr", str(tmp_path))
    assert q.cfg == p.cfg

    k = kie_predictor()
    save_predictor_config(k, "my-kie", str(tmp_path))
    k2 = from_name("my-kie", str(tmp_path))
    assert k2.cfg.kie


def test_kie_predictor_dataset(ray_session):
    docs = make_inline_docs([("7", " ".join(WORDS))], media_fraction=1.0)
    out = kie_predictor()(rd.from_arrow(docs)).to_pandas()
    assert (out["class_name"] == "words").any()
    assert sorted(out.loc[out["class_name"] == "words", "value"]) == sorted(WORDS)


def test_detect_language_flag():
    from doctr_ray.functions.text import LANG_MARKERS

    lang_words = list(LANG_MARKERS["en"])[:6]
    page = rasterize_synth(encode_media_ref(" ".join(lang_words), 640, 480))[0]
    p = ocr_predictor(detect_language=True)
    export = p.forward_pages([page.image])[0]
    assert export["language"]["value"] == "en"
    assert export["language"]["confidence"] > 0
    # flag off -> no language key (export shape unchanged)
    assert "language" not in ocr_predictor().forward_pages([page.image])[0]


def test_hub_ships_weights_blob(tmp_path, ray_session):
    """push/load analog with a real artifact pair: config.json +
    weights.npz; the reloaded predictor's pipeline output is unchanged
    under the identity checkpoint (proves the blob actually loads)."""
    import ray

    from doctr_ray.corpus import make_inline_docs
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.weights import identity_recognizer_weights
    from doctr_ray.zoo import from_name, ocr_predictor, save_predictor_config

    k = GlyphRecognizer().templates.shape[0]
    p = ocr_predictor()
    save_predictor_config(
        p, "glyph-identity", str(tmp_path), weights=identity_recognizer_weights(k)
    )
    q = from_name("glyph-identity", str(tmp_path))
    assert q.cfg.weights and q.cfg.weights.endswith("weights.npz")

    docs = make_inline_docs([("d1", "weights ride along in the hub artifact")], 1.0)
    base = p.extract_text(ray.data.from_arrow(docs)).to_pandas()
    got = q.extract_text(ray.data.from_arrow(docs)).to_pandas()
    assert base.equals(got)


def test_hub_push_from_list(tmp_path):
    from doctr_ray.weights import identity_recognizer_weights
    from doctr_ray.zoo import (
        from_hub,
        list_hub_models,
        ocr_predictor,
        push_to_hub,
    )

    hub = str(tmp_path / "hub")
    # validation: bad task / bad arch / name collision
    with pytest.raises(ValueError):
        push_to_hub("m", "nonsense_task", "fast_base", hub)
    with pytest.raises(ValueError):
        push_to_hub("m", "recognition", "fast_base", hub)  # det arch

    from doctr_ray.recognition import GlyphRecognizer

    k = GlyphRecognizer().templates.shape[0]
    w = identity_recognizer_weights(k)
    d = push_to_hub(
        "my-reco", "recognition", "crnn_vgg16_bn", hub, weights=w,
        run_config={"epochs": 3},
    )
    with pytest.raises(FileExistsError):
        push_to_hub("my-reco", "recognition", "crnn_vgg16_bn", hub)
    push_to_hub("my-det", "detection", "fast_base", hub)
    assert list_hub_models(hub) == ["my-det", "my-reco"]

    # artifact triple on disk (config + checkpoint + model card)
    import os

    assert os.path.isfile(os.path.join(d, "config.json"))
    assert os.path.isfile(os.path.join(d, "weights.npz"))
    card = open(os.path.join(d, "README.md")).read()
    assert "recognition" in card and '"epochs": 3' in card

    m = from_hub("my-reco", hub)
    assert m.task == "recognition" and m.arch == "crnn_vgg16_bn"
    loaded = m.load_weights()
    assert set(loaded) == set(w)

    # instance-parity: hub models plug into the predictor zoo
    p = ocr_predictor(det_arch=from_hub("my-det", hub), reco_arch=m)
    assert p.cfg.det_arch == "fast_base"
    assert p.cfg.reco_arch == "crnn_vgg16_bn"
    assert p.cfg.weights == m.weights_path
    # task mismatch is rejected
    with pytest.raises(ValueError):
        ocr_predictor(det_arch=m)


def test_hub_model_output_unchanged(tmp_path):
    """Identity hub weights flow through local-mode extraction without
    changing the result (weights plumbing, not semantics)."""
    from doctr_ray.weights import identity_recognizer_weights
    from doctr_ray.zoo import from_hub, ocr_predictor, push_to_hub

    hub = str(tmp_path / "hub")
    from doctr_ray.recognition import GlyphRecognizer

    k = GlyphRecognizer().templates.shape[0]
    push_to_hub(
        "id-reco", "recognition", "glyph_template", hub,
        weights=identity_recognizer_weights(k),
    )
    page = rasterize_synth(encode_media_ref("hello hub world", 640, 480))[0].image
    base = ocr_predictor().forward_pages([page])
    hubbed = ocr_predictor(reco_arch=from_hub("id-reco", hub)).forward_pages([page])

    def words(exports):
        return [
            w["value"]
            for e in exports
            for b in e["blocks"]
            for l in b["lines"]
            for w in l["words"]
        ]

    assert words(base) == words(hubbed)


def test_local_hub_roundtrip_layout(tmp_path):
    from doctr_ray.zoo import from_name, ocr_predictor, save_predictor_config

    p = ocr_predictor(detect_layout=True, ignore_regions=["Picture"])
    save_predictor_config(p, "my-layout-ocr", str(tmp_path))
    q = from_name("my-layout-ocr", str(tmp_path))
    # instances are runtime state: rebuilt lazily, not round-tripped
    assert q.cfg.detect_layout and q.cfg.ignore_regions == ("Picture",)
