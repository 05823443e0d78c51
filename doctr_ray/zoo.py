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
    # loaded MODEL INSTANCES (e.g. doctr_ray.crnn.CRNN /
    # doctr_ray.dbnet.DBNetNumpy) — the reference zoos'
    # instance-not-name convention (recognition/zoo.py:38-52,
    # detection/zoo.py:45-54); anything with recognize_batch() /
    # detect()
    reco_instance: object | None = None
    det_instance: object | None = None
    # loaded OrientationPredictor (zoo factories below) — replaces the
    # deterministic estimate_page_rotation when set, the reference's
    # assume_straight_pages=False wiring (models/predictor/base.py)
    orientation_instance: object | None = None
    # layout slot (reference models/zoo.py:30-35 detect_layout /
    # layout_arch / ignore_regions / detect_tables): a loaded layout
    # model instance (doctr_ray.lwdetr.LWDETRNumpy or the deterministic
    # ComponentClassifyLayout) whose page contract is
    # ``model([page]) -> [{class_names, boxes, scores}]``
    detect_layout: bool = False
    layout_instance: object | None = None
    # region classes masked out of the page BEFORE text detection
    # (reference predictor/base.py:110-128 _mask_regions)
    ignore_regions: tuple = ()
    detect_tables: bool = False
    # table-structure slot (reference models/zoo.py:70-82): a loaded
    # model with the TablePredictor crops contract
    # ``model([crop]) -> [{cells, num_rows, num_cols}]``
    # (doctr_ray.tablecenternet.TableCenterNetNumpy or the lattice
    # stand-in); None -> the page-level lattice detector
    table_instance: object | None = None


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
        # recognition slot: a loaded model instance (CRNN numpy tower)
        # replaces the template recognizer for crop->text only; the
        # geometric helpers (rotation/skew estimation) stay on the
        # deterministic recognizer
        reco = self.cfg.reco_instance or self._recognizer
        exports = []
        for image in pages:
            if self.cfg.detect_orientation:
                from .orientation import deskew_page, estimate_page_rotation

                if self.cfg.orientation_instance is not None:
                    # model slot: the reference's page-orientation
                    # predictor contract ([idxs, angles, confs]);
                    # deskew_page undoes the predicted angle
                    rgb = (
                        np.repeat(image[:, :, None], 3, axis=2)
                        if image.ndim == 2
                        else image
                    )
                    _, angles, _ = self.cfg.orientation_instance([rgb])
                    rot = int(angles[0]) % 360
                else:
                    rot = estimate_page_rotation(image, self._recognizer)
                if rot:
                    image = deskew_page(image, rot)
            known = None
            if self.cfg.straighten_pages:
                from .skew import recover_skewed_page

                image, known, _ = recover_skewed_page(image, self._recognizer)
            # layout regions on the working (deskewed/straightened)
            # page, BEFORE detection so ignore_regions can mask
            # (reference predictor/pytorch.py:103-105,137-141)
            regions = None
            if self.cfg.detect_layout or self.cfg.detect_tables:
                layout_model = self.cfg.layout_instance or ComponentClassifyLayout()
                regions = layout_model([image])[0]
                if self.cfg.ignore_regions and len(regions["boxes"]):
                    from .geometry import mask_regions

                    keep = np.array(
                        [n in self.cfg.ignore_regions for n in regions["class_names"]],
                        dtype=bool,
                    )
                    if keep.any():
                        boxes_r = np.asarray(regions["boxes"], np.float32)
                        image = mask_regions(image, boxes_r[keep].reshape(-1, 4))
            if self.cfg.det_instance is not None:
                from .geometry import rel_to_abs

                rel = self.cfg.det_instance.detect(image)
                boxes = rel_to_abs(rel[:, :4], image.shape[:2])
            else:
                boxes, rel = detect_page(image)
            crops = extract_crops(image, boxes)
            masks = extract_crops(known, boxes) if known is not None else None
            preds = reco.recognize_batch(crops, masks=masks)
            built = build_page(
                rel[:, :4],
                [t for t, _ in preds],
                [c for _, c in preds],
                rel[:, 4],
                keep_reading_order=self.cfg.keep_reading_order,
            )
            export = built.export
            if regions is not None:
                # LayoutElement export triple (reference builder.py:
                # 288-312 _build_layout_elements; io/elements.py:162
                # _exported_keys = geometry/type/confidence)
                export["layout"] = [
                    {
                        "geometry": (
                            tuple(tuple(float(c) for c in pt) for pt in np.asarray(box))
                            if np.asarray(box).ndim == 2
                            else (
                                (float(box[0]), float(box[1])),
                                (float(box[2]), float(box[3])),
                            )
                        ),
                        "type": str(name),
                        "confidence": float(score),
                    }
                    for name, box, score in zip(
                        regions["class_names"], regions["boxes"], regions["scores"]
                    )
                ]
            if self.cfg.detect_tables:
                if self.cfg.table_instance is not None:
                    # reference flow (predictor/pytorch.py:184-292
                    # _tables_from_regions): crop the layout model's
                    # Table regions, run the table model per crop,
                    # remap cell geometry back to page coordinates
                    export["tables"] = self._tables_from_regions(image, regions)
                else:
                    # lattice recovery on the page: the stand-in
                    # locates + structures in one pass
                    from .tables import extract_tables

                    page_tables, _ = extract_tables(
                        image, reco if hasattr(reco, "recognize_batch") else None
                    )
                    export["tables"] = [t.export() for t in page_tables]
            if self.cfg.detect_language:
                # per-page language attach (reference ocr_predictor
                # detect_language flag, models/predictor/pytorch.py)
                from .functions.text import get_language

                lang, lang_conf = get_language(" ".join(t for t, _ in preds))
                export["language"] = {"value": lang, "confidence": lang_conf}
            exports.append(export)
        return exports

    def _tables_from_regions(self, image: np.ndarray, regions: dict | None) -> list[dict]:
        """Crop layout ``Table`` regions (the whole page when the
        layout pass yielded none) and run the table-structure model on
        each crop, remapping cell geometry to page-relative coords
        (reference predictor/pytorch.py:213-292 without the
        perspective warp — this engine's region boxes are straight)."""
        h, w = image.shape[:2]
        crops, metas = [], []
        table_boxes = (
            [
                np.asarray(b, np.float32).reshape(-1)[:4]
                for n, b in zip(regions["class_names"], regions["boxes"])
                if n == "Table"
            ]
            if regions is not None
            else []
        )
        if not table_boxes:
            crops, metas = [image], [(0.0, 0.0, 1.0, 1.0)]
        else:
            for x0, y0, x1, y1 in table_boxes:
                ax0, ay0 = int(x0 * w), int(y0 * h)
                ax1, ay1 = int(np.ceil(x1 * w)), int(np.ceil(y1 * h))
                if ax1 - ax0 < 2 or ay1 - ay0 < 2:
                    continue
                crops.append(image[ay0:ay1, ax0:ax1])
                metas.append((float(x0), float(y0), float(x1 - x0), float(y1 - y0)))
        if not crops:
            return []
        out = []
        for (ox, oy, sw, sh), grid in zip(metas, self.cfg.table_instance(crops)):
            if not grid["cells"]:
                continue
            cells = []
            for cell in grid["cells"]:
                g = np.asarray(cell["geometry"], np.float32).reshape(-1)
                if g.size == 4:  # straight (xmin, ymin, xmax, ymax)
                    g = np.array(
                        [ox + g[0] * sw, oy + g[1] * sh, ox + g[2] * sw, oy + g[3] * sh],
                        np.float32,
                    )
                else:  # 4-point polygon
                    pts = g.reshape(-1, 2)
                    pts[:, 0] = ox + pts[:, 0] * sw
                    pts[:, 1] = oy + pts[:, 1] * sh
                    g = pts.reshape(-1)
                remapped = dict(cell)
                remapped["geometry"] = g.tolist()
                cells.append(remapped)
            out.append(
                {"cells": cells, "num_rows": grid["num_rows"], "num_cols": grid["num_cols"]}
            )
        return out

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


#: reference layout/zoo.py:18 ARCHS, plus this engine's stand-in
LAYOUT_ARCHS = {"lw_detr_s", "lw_detr_m", "component_classify"}


class ComponentClassifyLayout:
    """Deterministic layout stand-in with the LayoutPredictor page
    contract (reference layout/predictor/pytorch.py:36-82:
    ``model([page]) -> [{class_names, boxes, scores}]``): detected
    components classified by line-height conformity (the KIE
    classifier) and mapped onto the reference's DocLayNet label set —
    text-height components are ``Text`` regions, everything else a
    ``Picture`` artefact."""

    def __init__(self) -> None:
        from .lwdetr import LAYOUT_CLASSES

        self.class_names = list(LAYOUT_CLASSES)

    def __call__(self, pages: list[np.ndarray]) -> list[dict]:
        from .detection import detect_page
        from .pipelines.kie import classify_components

        out = []
        for page in pages:
            gray = page.mean(axis=2).astype(page.dtype) if page.ndim == 3 else page
            _, rel = detect_page(gray)
            if len(rel) == 0:
                out.append({"class_names": [], "boxes": np.zeros((0, 4), np.float32), "scores": []})
                continue
            kinds = classify_components(rel, gray.shape)
            out.append(
                {
                    "class_names": ["Text" if k == "words" else "Picture" for k in kinds],
                    "boxes": rel[:, :4].astype(np.float32),
                    "scores": [float(s) for s in rel[:, 4]],
                }
            )
        return out


def layout_predictor(
    arch="lw_detr_s",
    pretrained: bool = True,
    assume_straight_pages: bool = True,
    weights=None,
    **kwargs,
):
    """The reference's ``layout_predictor`` factory (layout/zoo.py:
    52-91), mapped onto this engine's slots. Like the other zoos it
    accepts a loaded model INSTANCE (anything callable on a page list
    — e.g. :class:`doctr_ray.lwdetr.LWDETRNumpy`) as well as a name;
    a ``weights`` checkpoint routes a name to the real numpy tower,
    otherwise names resolve to the deterministic component-classify
    stand-in (the procedural kernels ARE the weights, as for
    detection/recognition)."""
    if not isinstance(arch, str):
        if not callable(arch):
            raise ValueError(f"unknown architecture: {type(arch)}")
        return arch
    if arch not in LAYOUT_ARCHS:
        raise ValueError(f"unknown architecture '{arch}'")
    if weights is not None and arch.startswith("lw_detr"):
        from .lwdetr import LWDETRNumpy

        return LWDETRNumpy(
            weights, assume_straight_pages=assume_straight_pages, **kwargs
        )
    return ComponentClassifyLayout()


#: reference table_structure/zoo.py ARCHS, plus this engine's stand-in
TABLE_ARCHS = {"tablecenternet", "lattice_detect"}


class LatticeTablePredictor:
    """Deterministic table-structure stand-in with the TablePredictor
    crops contract (reference table_structure/predictor/pytorch.py:
    37-80: ``model([crop]) -> [{cells, num_rows, num_cols}]``): the
    ruled-border lattice detector structures each crop; the
    largest-cell-count table wins when a crop holds several."""

    def __call__(self, crops: list[np.ndarray]) -> list[dict]:
        from .tables import extract_tables

        out = []
        for crop in crops:
            gray = crop.mean(axis=2).astype(crop.dtype) if crop.ndim == 3 else crop
            tables, _ = extract_tables(gray)
            if not tables:
                out.append({"cells": [], "num_rows": 0, "num_cols": 0})
                continue
            best = max(tables, key=lambda t: len(t.cells))
            cells = [
                {
                    "geometry": list(c.geometry),
                    "score": float(c.confidence),
                    "row_start": int(c.row),
                    "row_end": int(c.row),
                    "col_start": int(c.col),
                    "col_end": int(c.col),
                }
                for c in best.cells
            ]
            out.append(
                {"cells": cells, "num_rows": best.num_rows, "num_cols": best.num_cols}
            )
        return out


def table_predictor(
    arch="tablecenternet",
    pretrained: bool = True,
    assume_straight_pages: bool = True,
    weights=None,
    **kwargs,
):
    """The reference's ``table_predictor`` factory (table_structure/
    zoo.py:52-82), mapped onto this engine's slots: a loaded model
    INSTANCE (anything callable on a crop list — e.g.
    :class:`doctr_ray.tablecenternet.TableCenterNetNumpy`) passes
    through; a ``weights`` checkpoint routes the name to the real
    numpy tower; otherwise names resolve to the deterministic lattice
    stand-in."""
    if not isinstance(arch, str):
        if not callable(arch):
            raise ValueError(f"unknown architecture: {type(arch)}")
        return arch
    if arch not in TABLE_ARCHS:
        raise ValueError(f"unknown architecture '{arch}'")
    if weights is not None and arch == "tablecenternet":
        from .tablecenternet import TableCenterNetNumpy

        return TableCenterNetNumpy(
            weights, assume_straight_pages=assume_straight_pages, **kwargs
        )
    return LatticeTablePredictor()


def ocr_predictor(
    det_arch: str = "fast_base",
    reco_arch: str = "crnn_vgg16_bn",
    pretrained: bool = True,
    assume_straight_pages: bool = True,
    detect_orientation: bool = False,
    straighten_pages: bool = False,
    detect_language: bool = False,
    keep_reading_order: bool = False,
    detect_layout: bool = False,
    layout_arch="lw_detr_s",
    ignore_regions: list[str] | None = None,
    detect_tables: bool = False,
    table_arch=None,
    **kwargs,
) -> OCRPredictor:
    """The reference's ``ocr_predictor`` signature (models/zoo.py:100-181),
    mapped onto this engine's pipeline knobs. ``pretrained`` is accepted
    and ignored (the procedural kernels ARE the weights). Like the
    reference zoos (detection/zoo.py:45-54, recognition/zoo.py:38-52),
    each arch argument also accepts a loaded ``HubModel`` instance —
    its arch name routes the kernel and its checkpoint (weights.npz
    path) rides into the recognizer actors."""
    weights = kwargs.get("weights")
    reco_instance = None
    det_instance = None
    if isinstance(det_arch, HubModel):
        if det_arch.task != "detection":
            raise ValueError(f"hub model '{det_arch.name}' is not a detection model")
        det_arch = det_arch.arch
    elif not isinstance(det_arch, str) and hasattr(det_arch, "detect"):
        # instance-not-name (reference detection/zoo.py:45-54)
        det_instance = det_arch
        det_arch = type(det_arch).__name__.lower()
    if isinstance(reco_arch, HubModel):
        if reco_arch.task != "recognition":
            raise ValueError(f"hub model '{reco_arch.name}' is not a recognition model")
        weights = reco_arch.weights_path or weights
        reco_arch = reco_arch.arch
    elif not isinstance(reco_arch, str) and hasattr(reco_arch, "recognize_batch"):
        # instance-not-name (reference recognition/zoo.py:38-52): a
        # loaded model object (e.g. doctr_ray.crnn.CRNN) occupies the
        # recognition slot directly
        reco_instance = reco_arch
        reco_arch = type(reco_arch).__name__.lower()
    if det_instance is None and det_arch not in DET_ARCHS:
        raise ValueError(f"unknown detection architecture '{det_arch}'")
    if reco_instance is None and reco_arch not in RECO_ARCHS:
        raise ValueError(f"unknown recognition architecture '{reco_arch}'")
    orientation_instance = kwargs.get("orientation_predictor")
    # layout slot — built whenever layout OR tables are requested
    # (reference models/zoo.py:57-68; tables need the layout pass)
    layout_instance = None
    if detect_layout or detect_tables:
        layout_instance = layout_predictor(layout_arch, pretrained=pretrained)
    table_instance = (
        table_predictor(table_arch, pretrained=pretrained)
        if detect_tables and table_arch is not None
        else None
    )
    return OCRPredictor(
        PredictorConfig(
            det_arch=det_arch,
            reco_arch=reco_arch,
            assume_straight_pages=assume_straight_pages,
            detect_orientation=detect_orientation,
            straighten_pages=straighten_pages,
            detect_language=detect_language,
            keep_reading_order=keep_reading_order,
            weights=weights,
            reco_instance=reco_instance,
            det_instance=det_instance,
            orientation_instance=orientation_instance,
            detect_layout=detect_layout,
            layout_instance=layout_instance,
            ignore_regions=tuple(ignore_regions or ()),
            detect_tables=detect_tables,
            table_instance=table_instance,
        )
    )


#: reference classification/zoo.py:40 ORIENTATION_ARCHS
ORIENTATION_ARCHS = {
    "mobilenet_v3_small_crop_orientation": (256, 256),
    "mobilenet_v3_small_page_orientation": (512, 512),
}
#: reference classification/mobilenet/pytorch.py:58-73 normalization
_ORIENT_MEAN = np.array([0.694, 0.695, 0.693], np.float32)
_ORIENT_STD = np.array([0.299, 0.296, 0.301], np.float32)


class OrientationPredictor:
    """Crop/page rotation classifier — the reference
    ``OrientationPredictor`` (classification/predictor/pytorch.py:
    17-70) list contract over the numpy MobileNetV3 tower:
    ``predictor([img, ...]) -> [class_idxs, class_angles, confs]``
    with classes [0, -90, 180, 90]; a disabled predictor returns
    all-zero classes with confidence 1.0."""

    def __init__(self, model=None, input_size=(512, 512), batch_size: int = 8):
        self.model = model  # None = disabled (reference zoo.py:47-48)
        self.input_size = tuple(input_size)
        self.batch_size = batch_size

    def _preprocess(self, images: list[np.ndarray]) -> np.ndarray:
        th, tw = self.input_size
        out = np.empty((len(images), 3, th, tw), np.float32)
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            scale = min(th / h, tw / w)
            nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
            ys = (np.arange(nh) * h / nh).astype(np.int64)
            xs = (np.arange(nw) * w / nw).astype(np.int64)
            resized = img[ys][:, xs]
            top = int(np.ceil((th - nh) / 2))  # symmetric pad
            left = int(np.ceil((tw - nw) / 2))
            canvas = np.zeros((th, tw, 3), np.float32)
            canvas[top : top + nh, left : left + nw] = resized / 255.0
            out[i] = ((canvas - _ORIENT_MEAN) / _ORIENT_STD).transpose(2, 0, 1)
        return out

    def __call__(self, inputs: list[np.ndarray]):
        if len(inputs) == 0:
            return [[], [], []]
        if any(i.ndim != 3 for i in inputs):
            raise ValueError(
                "incorrect input shape: all inputs are expected to be "
                "multi-channel 2D images."
            )
        n = len(inputs)
        if self.model is None:
            return [[0] * n, [0] * n, [1.0] * n]
        idxs: list[int] = []
        angles: list[int] = []
        confs: list[float] = []
        for s in range(0, n, self.batch_size):
            batch = self._preprocess(inputs[s : s + self.batch_size])
            bi, ba, bc = self.model.classify(batch)
            idxs += [int(v) for v in bi]
            angles += [int(v) for v in ba]
            confs += [round(float(v), 2) for v in bc]
        return [idxs, angles, confs]


def _orientation_predictor(arch, model_type: str, disabled: bool, batch_size: int):
    if disabled:
        return OrientationPredictor(None)
    from .mobilenet import MobileNetV3Small, random_mobilenet_weights

    if isinstance(arch, str):
        if arch not in ORIENTATION_ARCHS:
            raise ValueError(f"unknown architecture '{arch}'")
        size = ORIENTATION_ARCHS[arch]
        # no pretrained checkpoint ships in this container: the named
        # arch instantiates the real tower with fixed-seed weights (the
        # reference's pretrained=False behavior); pass a loaded
        # MobileNetV3Small for real checkpoints
        model = MobileNetV3Small(random_mobilenet_weights(0))
    elif isinstance(arch, MobileNetV3Small):
        model = arch
        size = (256, 256) if model_type == "crop" else (512, 512)
    else:
        raise ValueError(f"unknown architecture: {type(arch)}")
    return OrientationPredictor(model, input_size=size, batch_size=batch_size)


def crop_orientation_predictor(
    arch="mobilenet_v3_small_crop_orientation",
    pretrained: bool = False,
    batch_size: int = 128,
    disabled: bool = False,
    **kwargs,
) -> OrientationPredictor:
    """Reference ``crop_orientation_predictor`` (classification/zoo.py:
    75-95): name or loaded MobileNetV3Small instance -> predictor."""
    return _orientation_predictor(arch, "crop", disabled, batch_size)


def page_orientation_predictor(
    arch="mobilenet_v3_small_page_orientation",
    pretrained: bool = False,
    batch_size: int = 4,
    disabled: bool = False,
    **kwargs,
) -> OrientationPredictor:
    """Reference ``page_orientation_predictor`` (classification/zoo.py:
    98-119)."""
    return _orientation_predictor(arch, "page", disabled, batch_size)


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
    # loaded model instances are runtime state, not configuration —
    # from_name rebuilds them from the arch names (the reference hub
    # ships config + weights, never pickled modules)
    for k in ("reco_instance", "det_instance", "orientation_instance",
              "layout_instance", "table_instance"):
        cfg[k] = None
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
    # JSON round-trips the ignore_regions tuple as a list
    raw["ignore_regions"] = tuple(raw.get("ignore_regions") or ())
    cfg = PredictorConfig(**raw)
    if task == "kie":
        return kie_predictor(cfg.det_arch, cfg.reco_arch)
    return OCRPredictor(cfg)


# ------------------------------------------------- hub (per-model artifacts)

# reference AVAILABLE_ARCHS (models/factory/hub.py:30-36): per-task
# architecture inventories a hub artifact may declare
AVAILABLE_HUB_ARCHS: dict[str, set] = {
    "detection": DET_ARCHS,
    "recognition": RECO_ARCHS,
    "classification": {"mobilenet_v3_small_crop_orientation",
                       "mobilenet_v3_small_page_orientation"},
    "layout": {"lw_detr_s", "lw_detr_m", "component_classify"},
    "table_structure": {"tablecenternet", "lattice_detect"},
}


@dataclass(frozen=True)
class HubModel:
    """A loaded hub artifact: task + arch + optional checkpoint blobs.

    The reference's zoos accept model INSTANCES as well as names
    (detection/zoo.py:45-54, recognition/zoo.py:38-52); passing a
    ``HubModel`` to :func:`ocr_predictor` is this engine's analog —
    the arch name routes to the matching kernel and the weights ride
    along into the actor constructors.
    """

    name: str
    task: str
    arch: str
    weights_path: str | None = None

    def load_weights(self) -> dict | None:
        if self.weights_path is None:
            return None
        from .weights import load_weights

        return load_weights(self.weights_path)


def push_to_hub(
    model_name: str,
    task: str,
    arch: str,
    hub_dir: str,
    weights: dict | None = None,
    run_config: dict | None = None,
) -> str:
    """Publish a model artifact under ``hub_dir/model_name/`` — the
    ``push_to_hf_hub`` analog (reference models/factory/hub.py:80-188)
    with the hub replaced by a directory (no network in this
    container): validates task (hub.py:100-101) and arch against the
    per-task inventory (hub.py:161-165), refuses to overwrite an
    existing artifact (``create_repo(..., exist_ok=False)``,
    hub.py:168), and writes the artifact triple a real hub ships —
    ``config.json`` (arch + task, hub.py:56-77), ``weights.npz``
    (checkpoint blob via doctr_ray.weights) and a ``README.md`` model
    card with tags + optional run configuration (hub.py:104-158).
    """
    if task not in AVAILABLE_HUB_ARCHS:
        raise ValueError(
            f"task must be one of {sorted(AVAILABLE_HUB_ARCHS)}"
        )
    if arch not in AVAILABLE_HUB_ARCHS[task]:
        raise ValueError(
            f"Architecture: {arch} for task: {task} not found.\n"
            f"Available architectures: "
            f"{ {k: sorted(v) for k, v in AVAILABLE_HUB_ARCHS.items()} }"
        )
    d = os.path.join(hub_dir, model_name)
    if os.path.exists(d):
        raise FileExistsError(f"hub artifact '{model_name}' already exists")
    os.makedirs(d)

    cfg: dict = {"arch": arch, "task": task}
    if weights is not None:
        from .weights import save_weights

        save_weights(os.path.join(d, "weights.npz"), weights)
        cfg["weights"] = "weights.npz"
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    card = (
        "---\nlanguage: en\ntags:\n- ocr\n- ray-data\n"
        f"- {task}\n---\n\n## Task: {task}\n\narch: {arch}\n"
    )
    if run_config is not None:
        card += (
            "\n### Run Configuration\n\n```json\n"
            + json.dumps(run_config, indent=2, ensure_ascii=False)
            + "\n```\n"
        )
    with open(os.path.join(d, "README.md"), "w") as f:
        f.write(card)
    return d


def from_hub(model_name: str, hub_dir: str) -> HubModel:
    """Load a hub artifact (the ``from_hub`` analog, reference
    models/factory/hub.py:190-224): reads config.json, routes on its
    recorded task exactly like the reference's task dispatch
    (hub.py:212-224), and resolves the checkpoint path."""
    d = os.path.join(hub_dir, model_name)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    task, arch = cfg["task"], cfg["arch"]
    if task not in AVAILABLE_HUB_ARCHS:
        raise ValueError(f"unknown task '{task}' in hub artifact")
    wpath = cfg.get("weights")
    return HubModel(
        name=model_name,
        task=task,
        arch=arch,
        weights_path=os.path.join(d, wpath) if wpath else None,
    )


def list_hub_models(hub_dir: str) -> list[str]:
    """Names of artifacts published under ``hub_dir`` (models with a
    config.json), sorted — the hub listing surface."""
    if not os.path.isdir(hub_dir):
        return []
    return sorted(
        n
        for n in os.listdir(hub_dir)
        if os.path.isfile(os.path.join(hub_dir, n, "config.json"))
    )
