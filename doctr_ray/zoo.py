"""Predictor zoo + local factory — the ``ocr_predictor`` surface.

Re-expressed from the reference's zoo (reference models/zoo.py:18-282:
``ocr_predictor(det_arch, reco_arch, pretrained, ...)`` /
``kie_predictor``) and the factory/hub surface (models/factory/
hub.py:56-220 — save/load predictor artifacts by name). Architecture
names from the reference zoo are accepted for drop-in compatibility,
but in this container every arch resolves to the deterministic
stand-in kernels (procedural-glyph detection + template recognition) —
unknown names raise, like the reference's zoo.

A predictor is Ray-native: calling it on a ``ray.data.Dataset`` of
docs rows runs the fused zero-shuffle pipeline; calling it on a list
of page images runs locally and returns per-page builder exports (the
reference's ``predictor([page, ...]) -> Document`` convention).

The hub analog is a LOCAL registry (no network in this container):
``save_predictor_config`` / ``from_name`` persist and rebuild
predictor configurations under a directory — weights do not exist,
configuration is the whole artifact.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np

# reference zoo arch inventories (models/detection/zoo.py,
# models/recognition/zoo.py); every name maps to the stand-in kernels
DET_ARCHS = {
    "db_resnet34", "db_resnet50", "db_mobilenet_v3_large",
    "linknet_resnet18", "linknet_resnet34", "linknet_resnet50",
    "fast_tiny", "fast_small", "fast_base",
    "glyph_cc",  # this engine's native detector
}
RECO_ARCHS = {
    "crnn_vgg16_bn", "crnn_mobilenet_v3_small", "crnn_mobilenet_v3_large",
    "master", "sar_resnet31", "vitstr_small", "vitstr_base", "parseq",
    "viptr_tiny",
    "glyph_template",  # this engine's native recognizer
}


@dataclass(frozen=True)
class PredictorConfig:
    det_arch: str = "fast_base"
    reco_arch: str = "crnn_vgg16_bn"
    assume_straight_pages: bool = True
    detect_orientation: bool = False
    straighten_pages: bool = False
    detect_language: bool = False
    keep_reading_order: bool = False
    kie: bool = False
    # optional recognizer checkpoint path (.npz, see doctr_ray.weights)
    # — loaded once per actor; the torch-weights slot on a real cluster
    weights: str | None = None


class OCRPredictor:
    """Configured extraction pipeline (reference models/predictor).

    - ``predictor(docs_ds)`` -> spans Dataset (fused zero-shuffle path)
    - ``predictor.extract_text(docs_ds)`` -> (doc_id, full_text)
    - ``predictor(pages)`` with a list of numpy pages -> list of
      builder exports (local mode, no Ray session required)
    """

    def __init__(self, config: PredictorConfig) -> None:
        self.cfg = config
        self._recognizer = None  # built lazily for local mode

    def __call__(self, inputs):
        import ray.data as rd

        if isinstance(inputs, rd.Dataset):
            from .pipelines.ocr import ocr_spans

            return ocr_spans(inputs, **self._pipeline_kwargs())
        return self.forward_pages(list(inputs))

    def extract_text(self, docs_ds):
        from .pipelines.ocr import ocr_extracted_text

        return ocr_extracted_text(docs_ds, **self._pipeline_kwargs())

    def _pipeline_kwargs(self) -> dict:
        kw = {
            "keep_reading_order": self.cfg.keep_reading_order,
            "detect_orientation": self.cfg.detect_orientation,
            "straighten_pages": self.cfg.straighten_pages,
        }
        if self.cfg.weights:
            kw["weights"] = self.cfg.weights
        return kw

    def forward_pages(self, pages: list[np.ndarray]) -> list[dict]:
        """Local mode: page images -> builder exports (one per page)."""
        from .builder import build_page
        from .detection import detect_page
        from .geometry import extract_crops
        from .recognition import GlyphRecognizer

        if self._recognizer is None:
            self._recognizer = GlyphRecognizer()
        exports = []
        for image in pages:
            if self.cfg.detect_orientation:
                from .orientation import deskew_page, estimate_page_rotation

                rot = estimate_page_rotation(image, self._recognizer)
                if rot:
                    image = deskew_page(image, rot)
            known = None
            if self.cfg.straighten_pages:
                from .skew import recover_skewed_page

                image, known, _ = recover_skewed_page(image, self._recognizer)
            boxes, rel = detect_page(image)
            crops = extract_crops(image, boxes)
            masks = extract_crops(known, boxes) if known is not None else None
            preds = self._recognizer.recognize_batch(crops, masks=masks)
            built = build_page(
                rel[:, :4],
                [t for t, _ in preds],
                [c for _, c in preds],
                rel[:, 4],
                keep_reading_order=self.cfg.keep_reading_order,
            )
            export = built.export
            if self.cfg.detect_language:
                # per-page language attach (reference ocr_predictor
                # detect_language flag, models/predictor/pytorch.py)
                from .functions.text import get_language

                lang, lang_conf = get_language(" ".join(t for t, _ in preds))
                export["language"] = {"value": lang, "confidence": lang_conf}
            exports.append(export)
        return exports

    def render(self, pages: list[np.ndarray], page_break: str = "\n\n\n\n") -> str:
        """Local-mode text rendering (Document.render analog)."""
        from .exporters import render_text

        return page_break.join(render_text(e) for e in self.forward_pages(pages))

    def __repr__(self) -> str:
        return (
            f"OCRPredictor(det_arch='{self.cfg.det_arch}', "
            f"reco_arch='{self.cfg.reco_arch}', "
            f"assume_straight_pages={self.cfg.assume_straight_pages})"
        )


def ocr_predictor(
    det_arch: str = "fast_base",
    reco_arch: str = "crnn_vgg16_bn",
    pretrained: bool = True,
    assume_straight_pages: bool = True,
    detect_orientation: bool = False,
    straighten_pages: bool = False,
    detect_language: bool = False,
    keep_reading_order: bool = False,
    **kwargs,
) -> OCRPredictor:
    """The reference's ``ocr_predictor`` signature (models/zoo.py:100-181),
    mapped onto this engine's pipeline knobs. ``pretrained`` is accepted
    and ignored (the procedural kernels ARE the weights)."""
    if det_arch not in DET_ARCHS:
        raise ValueError(f"unknown detection architecture '{det_arch}'")
    if reco_arch not in RECO_ARCHS:
        raise ValueError(f"unknown recognition architecture '{reco_arch}'")
    return OCRPredictor(
        PredictorConfig(
            det_arch=det_arch,
            reco_arch=reco_arch,
            assume_straight_pages=assume_straight_pages,
            detect_orientation=detect_orientation,
            straighten_pages=straighten_pages,
            detect_language=detect_language,
            keep_reading_order=keep_reading_order,
        )
    )


def kie_predictor(det_arch: str = "fast_base", reco_arch: str = "crnn_vgg16_bn", **kwargs):
    """KIE variant (reference models/zoo.py:250-282): calling it on a
    docs Dataset yields per-class prediction rows."""
    if det_arch not in DET_ARCHS:
        raise ValueError(f"unknown detection architecture '{det_arch}'")
    if reco_arch not in RECO_ARCHS:
        raise ValueError(f"unknown recognition architecture '{reco_arch}'")

    class _KIE(OCRPredictor):
        def __call__(self, inputs):
            from .pipelines.kie import kie_predictions

            return kie_predictions(inputs)

    return _KIE(PredictorConfig(det_arch=det_arch, reco_arch=reco_arch, kie=True))


# ----------------------------------------------------------- local hub

def save_predictor_config(
    predictor: OCRPredictor, name: str, hub_dir: str, weights: dict | None = None
) -> str:
    """Persist a predictor under ``hub_dir/name/`` (the push_to_hub
    analog, reference models/factory/hub.py:96-188): config.json plus,
    when given, the recognizer checkpoint blob (weights.npz via
    doctr_ray.weights) — the artifact pair a real hub ships."""
    d = os.path.join(hub_dir, name)
    os.makedirs(d, exist_ok=True)
    cfg = asdict(predictor.cfg)
    if weights is not None:
        from .weights import save_weights

        wpath = os.path.join(d, "weights.npz")
        save_weights(wpath, weights)
        cfg["weights"] = wpath
    path = os.path.join(d, "config.json")
    with open(path, "w") as f:
        json.dump({"task": "kie" if predictor.cfg.kie else "ocr", **cfg}, f, indent=1)
    return path


def from_name(name: str, hub_dir: str) -> OCRPredictor:
    """Rebuild a saved predictor (the from_hub analog, hub.py:190-220);
    a recorded checkpoint rides along in the config and loads once per
    actor when the pipeline runs."""
    with open(os.path.join(hub_dir, name, "config.json")) as f:
        raw = json.load(f)
    task = raw.pop("task", "ocr")
    cfg = PredictorConfig(**raw)
    if task == "kie":
        return kie_predictor(cfg.det_arch, cfg.reco_arch)
    return OCRPredictor(cfg)
