"""KIE pipeline — multi-class detection + per-class flat predictions.

Re-expressed semantics of the reference's KIE path (reference:
models/kie_predictor/pytorch.py — detection keeps a per-class dict
``{class: boxes}``, crops/recognition run per class, and
``KIEDocumentBuilder`` emits flat per-class ``Prediction`` lists sorted
by ``_sort_boxes`` — models/builder.py:814-970). This engine's
deterministic detector distinguishes two classes by line-height
conformity (see :func:`classify_components`): ``words`` (components at
the font's CHAR_H line height) and ``artefacts`` (anything taller or
shorter). The topology is the fused single-chain OCR pipeline with a
``class_name`` key column added (SURVEY.md §3.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..builder import sort_boxes
from ..detection import detect_page
from ..geometry import extract_crops
from ..media import rasterize_synth
from ..recognition import GlyphRecognizer

# Words are rendered at exactly CHAR_H px line height (the procedural
# font IS the recognition model, glyphs.py); any component taller or
# shorter than a text line is a non-text artefact. Density alone is not
# separable: a short word whose procedural glyph interiors are dense
# approaches solid-rectangle density (observed: 'row' at 0.72).
ARTEFACT_HEIGHT_TOL = 2  # px

KIE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("page_idx", pa.int32()),
        pa.field("class_name", pa.string()),
        pa.field("rank", pa.int32()),       # _sort_boxes order within (page, class)
        pa.field("value", pa.string()),     # recognized text ('' for artefacts)
        pa.field("confidence", pa.float32()),
        pa.field("x0", pa.float32()),
        pa.field("y0", pa.float32()),
        pa.field("x1", pa.float32()),
        pa.field("y1", pa.float32()),
    ]
)


def classify_components(rel_scored: np.ndarray, page_shape: tuple[int, int]) -> np.ndarray:
    """(N,5) scored rel boxes -> class names by line-height conformity."""
    from ..glyphs import CHAR_H

    h_px = np.round((rel_scored[:, 3] - rel_scored[:, 1]) * page_shape[0])
    return np.where(
        np.abs(h_px - CHAR_H) > ARTEFACT_HEIGHT_TOL, "artefacts", "words"
    )


class KieMediaWorker:
    """Media rows -> per-class prediction rows. Runs as a TASK stage
    (instance passed to map_batches): the only state is the glyph
    template bank (27 KB pickled, ~2 ms build), so an actor pool would
    pay seconds of per-query actor spin-up for nothing (CLAUDE.md
    cheap-state policy)."""

    def __init__(self) -> None:
        self.recognizer = GlyphRecognizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in KIE_SCHEMA}
        for did, ref, off in zip(
            batch["doc_id"].to_pylist(),
            batch["media_ref"].to_pylist(),
            batch["offset"].to_pylist(),
        ):
            for page_idx, page in enumerate(rasterize_synth(ref)):
                abs_boxes, rel = detect_page(page.image)
                if len(abs_boxes) == 0:
                    continue
                classes = classify_components(rel, page.image.shape)
                word_mask = classes == "words"
                texts = np.full(len(abs_boxes), "", dtype=object)
                confs = rel[:, 4].astype(np.float32).copy()
                if word_mask.any():
                    crops = extract_crops(page.image, abs_boxes[word_mask])
                    preds = self.recognizer.recognize_batch(crops)
                    texts[word_mask] = [t for t, _ in preds]
                    confs[word_mask] = [c for _, c in preds]
                # per-class flat predictions in reading-sort order
                # (KIEDocumentBuilder semantics, builder.py:814-970)
                for cls in ("words", "artefacts"):
                    m = classes == cls
                    if not m.any():
                        continue
                    idx = np.flatnonzero(m)
                    order, _ = sort_boxes(rel[m, :4])
                    for rank, oi in enumerate(order):
                        i = idx[oi]
                        cols["doc_id"].append(did)
                        cols["media_ref"].append(ref)
                        cols["offset"].append(off)
                        cols["page_idx"].append(page_idx)
                        cols["class_name"].append(cls)
                        cols["rank"].append(rank)
                        cols["value"].append(str(texts[i]))
                        cols["confidence"].append(float(confs[i]))
                        cols["x0"].append(float(rel[i, 0]))
                        cols["y0"].append(float(rel[i, 1]))
                        cols["x1"].append(float(rel[i, 2]))
                        cols["y1"].append(float(rel[i, 3]))
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in KIE_SCHEMA], schema=KIE_SCHEMA
        )


def kie_predictions(docs_ds, concurrency: int | tuple | None = None):
    """docs Dataset -> flat per-class prediction rows (KIE output)."""
    from .ocr import default_pool, explode_spans

    work = docs_ds.map_batches(explode_spans, batch_format="pyarrow", batch_size=256)
    media = work.filter(expr="kind == 'media'")
    media = media.repartition(max(64, default_pool() * 8))
    if concurrency is not None:
        return media.map_batches(
            KieMediaWorker,
            batch_format="pyarrow",
            batch_size=32,
            concurrency=concurrency,
        )
    return media.map_batches(
        KieMediaWorker(), batch_format="pyarrow", batch_size=32
    )
