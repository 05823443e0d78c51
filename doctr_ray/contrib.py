"""Contrib predictor surface: artefact detection behind the reference's
ONNX-predictor contract.

Mirrors reference contrib/base.py:14-96 (``_BasePredictor``: batch_size
+ session + preprocess/postprocess/__call__) and
contrib/artefacts.py:26-107 (``ArtefactDetector``: conf/IoU thresholds,
NMS, label mapping, boxes rescaled to original pixel frames). The
container has no onnxruntime, so ``_init_model`` import-guards the ONNX
branch and otherwise builds the engine's deterministic component
session (run-space ink CC + line-height classification — the same
model stage the KIE pipeline oracles end-to-end). Declared divergence:
the deterministic session returns per-image ``(rel_boxes_scored,
class_ids)`` instead of a raw YOLO output tensor — the ONNX branch
would adapt its tensor into the same pair at load time — and the
default ``input_shape=None`` skips the resize (the procedural model is
resolution-exact; pass an explicit shape to exercise the resize +
rescale path).

Ray-side use: a predictor instance is per-actor state — construct it in
an actor-pool stage's ``__init__`` and call it on each batch's decoded
pages (see pipelines/kie.py for the fused form the driver queries use).
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["ArtefactDetector"]

default_cfgs: dict[str, dict[str, Any]] = {
    # deterministic component model (glyph line-height contract);
    # labels: index 0 = non-text artefact, index 1 = text word
    "component_artefact": {
        "input_shape": None,
        "labels": ["artefact", "word"],
        "url": None,
    },
}


class _DeterministicSession:
    """Session analog for the procedural model: ``run(None, {name:
    batch})`` over float32 NCHW batches -> per-image
    ``(rel_boxes_scored (N,5), class_ids (N,))``."""

    class _Input:
        name = "images"

    def get_inputs(self):
        return [self._Input()]

    def run(self, _output_names, feeds):
        from .detection import detect_page
        from .pipelines.kie import classify_components

        batch = feeds[self._Input.name]
        results = []
        for chw in batch:
            # NCHW float [0,1] -> grayscale uint8 page
            page = np.clip(np.asarray(chw).mean(axis=0) * 255.0, 0, 255).astype(
                np.uint8
            )
            _, rel = detect_page(page)
            if len(rel) == 0:
                results.append((rel.reshape(0, 5), np.zeros(0, dtype=np.int64)))
                continue
            classes = classify_components(rel, page.shape)
            class_ids = np.where(classes == "artefacts", 0, 1).astype(np.int64)
            results.append((rel, class_ids))
        return results


class _BasePredictor:
    """Reference contrib/base.py:14-96 contract: construct a session
    once, then ``__call__`` batches inputs through preprocess ->
    session.run -> postprocess."""

    def __init__(
        self,
        batch_size: int,
        url: str | None = None,
        model_path: str | None = None,
        **kwargs: Any,
    ) -> None:
        self.batch_size = batch_size
        self.session = self._init_model(url, model_path, **kwargs)
        self._inputs: list[np.ndarray] = []
        self._results: list[Any] = []

    def _init_model(
        self, url: str | None = None, model_path: str | None = None, **kwargs: Any
    ) -> Any:
        if model_path:
            try:
                import onnxruntime as ort  # noqa: F401
            except ImportError as exc:  # onnxruntime absent from container
                raise ImportError(
                    "onnxruntime is required to load an ONNX model_path; "
                    "omit model_path to use the deterministic session"
                ) from exc
            return ort.InferenceSession(
                model_path, providers=["CPUExecutionProvider"]
            )
        # no download path in this environment: URLs resolve to the
        # built-in deterministic session (declared stand-in)
        return _DeterministicSession()

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def postprocess(
        self, output: list[Any], input_images: list[list[np.ndarray]]
    ) -> Any:
        raise NotImplementedError

    def __call__(self, inputs: list[np.ndarray]) -> Any:
        self._inputs = inputs
        model_inputs = self.session.get_inputs()
        batched_inputs = [
            inputs[i : i + self.batch_size]
            for i in range(0, len(inputs), self.batch_size)
        ]
        processed_batches = [
            np.array([self.preprocess(img) for img in batch], dtype=np.float32)
            for batch in batched_inputs
        ]
        outputs = [
            self.session.run(None, {model_inputs[0].name: batch})
            for batch in processed_batches
        ]
        return self.postprocess(outputs, batched_inputs)


class ArtefactDetector(_BasePredictor):
    """Detect non-text artefacts in page images (reference
    contrib/artefacts.py:26-107 surface).

    >>> detector = ArtefactDetector()
    >>> results = detector([page_image])          # list per image of
    >>> # {"label": ..., "confidence": ..., "box": [x0, y0, x1, y1]}
    """

    def __init__(
        self,
        arch: str = "component_artefact",
        batch_size: int = 2,
        model_path: str | None = None,
        labels: list[str] | None = None,
        input_shape: tuple[int, int, int] | None = None,
        conf_threshold: float = 0.5,
        iou_threshold: float = 0.5,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            batch_size=batch_size,
            url=default_cfgs[arch]["url"],
            model_path=model_path,
            **kwargs,
        )
        self.labels = labels or default_cfgs[arch]["labels"]
        self.input_shape = (
            input_shape
            if input_shape is not None
            else default_cfgs[arch]["input_shape"]
        )
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        from .geometry import resize_bilinear

        page = img
        if page.ndim == 3:  # HWC -> grayscale
            page = page.mean(axis=2)
        if self.input_shape is not None:
            page = resize_bilinear(
                page.astype(np.uint8), (self.input_shape[1], self.input_shape[2])
            )
        chw = np.repeat(page[None, :, :], 3, axis=0).astype(np.float32) / 255.0
        return chw

    def postprocess(
        self, output: list[Any], input_images: list[list[np.ndarray]]
    ) -> list[list[dict[str, Any]]]:
        from .metrics import nms

        results: list[list[dict[str, Any]]] = []
        for batch_out, batch_imgs in zip(output, input_images):
            for (rel, class_ids), img in zip(batch_out, batch_imgs):
                org_h, org_w = img.shape[:2]
                sample: list[dict[str, Any]] = []
                keep_rows = []
                for i in range(len(rel)):
                    score = float(rel[i, 4])
                    if class_ids[i] != 0 or score < self.conf_threshold:
                        continue  # words and low-confidence boxes drop
                    x0, y0, x1, y1 = rel[i, :4]
                    keep_rows.append(
                        (
                            [
                                int(x0 * org_w),
                                int(y0 * org_h),
                                int(x1 * org_w),
                                int(y1 * org_h),
                            ],
                            score,
                        )
                    )
                if keep_rows:
                    scored = np.array(
                        [[*box, s] for box, s in keep_rows], dtype=np.float64
                    )
                    for i in nms(scored, self.iou_threshold):
                        box, score = keep_rows[int(i)]
                        sample.append(
                            {
                                "label": self.labels[0],
                                "confidence": score,
                                "box": box,
                            }
                        )
                results.append(sample)
        self._results = results
        return results

    def show(self, **kwargs: Any) -> list[np.ndarray]:
        """Overlay detections on the inputs. matplotlib is absent from
        this container, so this returns the overlay images (and shows
        them interactively only when matplotlib is importable)."""
        from .visualization import draw_boxes

        overlays = []
        for img, res in zip(self._inputs, self._results):
            page = img if img.ndim == 2 else img.mean(axis=2).astype(np.uint8)
            boxes = np.array(
                [r["box"] for r in res], dtype=np.float64
            ).reshape(-1, 4)
            h, w = page.shape[:2]
            rel = boxes / np.array([w, h, w, h], dtype=np.float64)
            overlays.append(draw_boxes(page, rel))
        try:
            import matplotlib.pyplot as plt

            for ov in overlays:
                plt.figure(figsize=(10, 10))
                plt.imshow(ov, cmap="gray")
            plt.show(**kwargs)
        except ImportError:
            pass
        return overlays
