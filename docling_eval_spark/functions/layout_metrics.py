"""Layout (bounding-box) metrics, from scratch with numpy.

Parity targets (cited, no code copied):
  - IoU: reference docling_eval/evaluators/layout_evaluator.py:409-423
  - label-matched greedy IoU + area-weighted average across thresholds
    {.5,.75,.9,.95}: layout_evaluator.py:425-494.  NOTE the reference
    zips the full per-pred weight list against the matched-only IoU list
    (misaligning weights when early preds are unmatched); we weight each
    matched pred's IoU by its own area — the evidently intended semantics.
  - COCO-style AP (101-point interpolation, IoU .5:.05:.95, greedy
    score-ordered matching): layout_evaluator.py:246-349 delegates to
    torchmetrics MeanAveragePrecision; we implement the COCO evaluation
    protocol directly.  NOTE the reference records map_50 into its
    per-image `map_val` field (layout_evaluator.py:303-306); our
    per-image rollup exposes both honestly.
  - area-mask precision/recall/F1 on a 512x512 rasterization:
    layout_evaluator.py:690-779.

Boxes are numpy arrays [N,4] as (l, t, r, b) in a top-left-origin page
coordinate system normalized to 100 (layout_evaluator.py:626-632).
These kernels run per page inside grouped-map Arrow UDFs — per-page data
is tiny, so none of this is a distributed operation; the corpus-level
mAP is distributed as partial (per-page match rows) + final (per-class
PR curve) aggregation, see operators/layout_agg.py.
"""

from __future__ import annotations

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)  # COCO .5:.05:.95


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Pairwise IoU, vectorized: [len(a), len(b)]."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    a = boxes_a[:, None, :]  # [N,1,4]
    b = boxes_b[None, :, :]  # [1,M,4]
    ix = np.maximum(0.0, np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0]))
    iy = np.maximum(0.0, np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1]))
    inter = ix * iy
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out


def greedy_label_matched_iou(
    pred_boxes: np.ndarray,
    pred_labels: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    iou_thresh: float = 0.5,
) -> dict:
    """Greedy first-fit matching in pred order (reference :425-470 semantics):
    each pred matches the first unmatched same-label gt with IoU >= thresh.
    Returns area-weighted average matched IoU (weights = pred box area /
    total pred area), matched/unmatched counts.
    """
    n_pred, n_gt = len(pred_boxes), len(gt_boxes)
    if n_pred == 0:
        return {"average_iou": 0.0, "matched_gt": 0, "unmatched_gt": n_gt}
    ious = iou_matrix(pred_boxes, gt_boxes) if n_gt else np.zeros((n_pred, 0))
    areas = np.abs((pred_boxes[:, 2] - pred_boxes[:, 0]) * (pred_boxes[:, 3] - pred_boxes[:, 1]))
    wsum = float(areas.sum())
    matched_gt: set[int] = set()
    weighted = 0.0
    n_matched = 0
    for p in range(n_pred):
        for g in range(n_gt):
            if g in matched_gt or pred_labels[p] != gt_labels[g]:
                continue
            if ious[p, g] >= iou_thresh:
                matched_gt.add(g)
                n_matched += 1
                if wsum > 0:
                    weighted += areas[p] * ious[p, g] / wsum
                break
    return {
        "average_iou": float(weighted),
        "matched_gt": n_matched,
        "unmatched_gt": n_gt - len(matched_gt),
    }


def match_detections(
    pred_boxes: np.ndarray,
    pred_scores: np.ndarray,
    gt_boxes: np.ndarray,
    iou_thresholds: np.ndarray = IOU_THRESHOLDS,
) -> np.ndarray:
    """COCO-protocol matching for ONE class on ONE image.

    Detections sorted by score desc; each matches the unmatched gt with
    max IoU >= threshold. Returns tp bool array [T, n_pred] per threshold
    (detections assumed same class as gts).
    """
    order = np.argsort(-pred_scores, kind="stable")
    ious = iou_matrix(pred_boxes[order], gt_boxes)
    n_pred, n_gt = len(pred_boxes), len(gt_boxes)
    tp = np.zeros((len(iou_thresholds), n_pred), dtype=bool)
    for ti, t in enumerate(iou_thresholds):
        taken = np.zeros(n_gt, dtype=bool)
        for di in range(n_pred):
            best_g, best_iou = -1, t
            for g in range(n_gt):
                if not taken[g] and ious[di, g] >= best_iou:
                    best_iou = ious[di, g]
                    best_g = g
            if best_g >= 0:
                taken[best_g] = True
                tp[ti, order[di]] = True
    return tp


def average_precision(scores: np.ndarray, tp: np.ndarray, n_gt: int) -> float:
    """COCO 101-point interpolated AP from flat detection lists.

    scores: [N] detection confidences (any order); tp: [N] bool whether the
    detection is a true positive at the given IoU threshold; n_gt: number of
    ground-truth boxes of this class. This is the FINAL step of the
    distributed corpus mAP: per-page partials produce (score, tp) rows,
    grouped per (class, threshold), and this reduces them.
    """
    if n_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp_sorted = tp[order].astype(np.float64)
    cum_tp = np.cumsum(tp_sorted)
    cum_fp = np.cumsum(1.0 - tp_sorted)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
    # precision envelope (monotone non-increasing from the right)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # 101-point interpolation; points must be EXACTLY i/100 (linspace
    # accumulates ulp error upward on 10 of the 101 points, wrongly
    # excluding recalls that land exactly on them and understating AP by
    # 1/101 — diverges from the closed-form floor(100*R)+1 oracle)
    recall_points = np.arange(101) / 100.0
    idx = np.searchsorted(recall, recall_points, side="left")
    interp = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(interp.mean())


def image_map(
    pred_boxes: np.ndarray,
    pred_labels: np.ndarray,
    pred_scores: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
) -> dict:
    """Per-image COCO mAP (mean over classes then thresholds), plus map_50/75.

    Mirrors the reference's per-image MeanAveragePrecision usage
    (layout_evaluator.py:294-306). Classes with no gt are skipped (NaN->skip),
    like torchmetrics. Returns -1.0 values when no class has gt.
    """
    classes = np.unique(np.concatenate([gt_labels, pred_labels])) if (len(gt_labels) or len(pred_labels)) else np.array([])
    per_class = {}  # class -> [T] AP array
    for c in classes:
        gmask = gt_labels == c
        pmask = pred_labels == c
        n_gt = int(gmask.sum())
        if n_gt == 0:
            continue
        tp = match_detections(pred_boxes[pmask], pred_scores[pmask], gt_boxes[gmask])
        aps = np.array([
            average_precision(pred_scores[pmask], tp[ti], n_gt)
            for ti in range(len(IOU_THRESHOLDS))
        ])
        per_class[c] = aps
    if not per_class:
        return {"map": -1.0, "map_50": -1.0, "map_75": -1.0}
    ap_matrix = np.stack(list(per_class.values()))  # [C, T]
    return {
        "map": float(ap_matrix.mean()),
        "map_50": float(ap_matrix[:, 0].mean()),
        "map_75": float(ap_matrix[:, 5].mean()),
    }


def mask_precision_recall_f1(
    gt_boxes: np.ndarray,
    pred_boxes: np.ndarray,
    page_width: float = 100.0,
    page_height: float = 100.0,
    mask_width: int = 512,
    mask_height: int = 512,
) -> tuple[float, float, float]:
    """Rasterize boxes to boolean masks; P=|∩|/|pred|, R=|∩|/|gt|.

    Parity: layout_evaluator.py:690-779 (incl. edge cases: empty gt AND
    empty pred -> (1,1,1); empty one side -> zeros).
    """
    def rasterize(boxes: np.ndarray) -> np.ndarray:
        mask = np.zeros((mask_height, mask_width), dtype=bool)
        for l, t, r, b in boxes:
            x0 = max(0, int(np.floor(l / page_width * mask_width)))
            x1 = min(mask_width, int(np.ceil(r / page_width * mask_width)))
            y0 = max(0, int(np.floor(t / page_height * mask_height)))
            y1 = min(mask_height, int(np.ceil(b / page_height * mask_height)))
            if x1 > x0 and y1 > y0:
                mask[y0:y1, x0:x1] = True
        return mask

    if len(gt_boxes) == 0 and len(pred_boxes) == 0:
        return 1.0, 1.0, 1.0
    if len(gt_boxes) == 0 or len(pred_boxes) == 0:
        return 0.0, 0.0, 0.0
    gm = rasterize(gt_boxes)
    pm = rasterize(pred_boxes)
    inter = float(np.logical_and(gm, pm).sum())
    p_area = float(pm.sum())
    g_area = float(gm.sum())
    precision = inter / p_area if p_area > 0 else 0.0
    recall = inter / g_area if g_area > 0 else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) > 0 else 0.0
    return precision, recall, f1


def greedy_argmax_iou_match(
    pivot_boxes: np.ndarray,
    other_boxes: np.ndarray,
) -> tuple[list[tuple[int, int, float]], list[int], list[int]]:
    """Argmax-IoU pairing (reference bbox_text_evaluator.py:181-292).

    For each `other` box, pair it with the argmax-IoU `pivot` box with
    IoU > 0 (reference :227-239); pivots may pair with multiple others
    there — here each pivot is consumed once (greedy in `other` order) so
    the match is 1:1, matching the evaluator's downstream text pairing.
    Orphans on both sides are returned (reference :241-249 keeps them as
    unmatched evaluation units).

    Returns (matches [(other_idx, pivot_idx, iou)], orphan_others,
    orphan_pivots).
    """
    ious = iou_matrix(other_boxes, pivot_boxes) if len(pivot_boxes) and len(other_boxes) \
        else np.zeros((len(other_boxes), len(pivot_boxes)))
    taken = np.zeros(len(pivot_boxes), dtype=bool)
    matches: list[tuple[int, int, float]] = []
    orphan_others: list[int] = []
    for o in range(len(other_boxes)):
        row = ious[o].copy()
        row[taken] = -1.0
        if row.size == 0 or row.max() <= 0.0:
            orphan_others.append(o)
            continue
        p = int(row.argmax())
        taken[p] = True
        matches.append((o, p, float(ious[o, p])))
    orphan_pivots = [p for p in range(len(pivot_boxes)) if not taken[p]]
    return matches, orphan_others, orphan_pivots
