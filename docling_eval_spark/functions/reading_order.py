"""Reading-order metrics + the geometric reading-order rule, from scratch.

Parity targets:
  - ARD / weighted ARD: reference
    docling_eval/evaluators/readingorder_evaluator.py:229-271
      ard_norm      = 1 - (sum_k |k - pred_order[k]|) / n^2
      w_ard_norm    = 1 - (sum_k |k - pred_order[k]| * area_k/total_area) / n^2
      n == 0 -> (0.0, 0.0)
  - reading-order prediction (reference wraps docling's rule-based
    ReadingOrderPredictor, readingorder_evaluator.py:156-227): our
    from-scratch rule is the classic column-aware geometric sort —
    partition blocks into column bands by x-overlap, then order by
    (page, column band, top y, left x). Exposed both as a numpy kernel
    (per-page, inside grouped-map UDFs) and as a Window spec in
    operators/reading_order_op.py.
"""

from __future__ import annotations

import numpy as np


def ard_norm(pred_order: np.ndarray, areas: np.ndarray | None = None) -> tuple[float, float]:
    """Normalized Average Relative Distance + area-weighted variant.

    pred_order[k] = predicted rank of the element whose true rank is k.
    areas: per-element bbox areas (for the weighted variant); weights are
    areas normalized by their sum.
    """
    n = len(pred_order)
    if n == 0:
        return 0.0, 0.0
    true_order = np.arange(n)
    dist = np.abs(true_order - np.asarray(pred_order, dtype=np.float64))
    ard = float(dist.sum())
    n_sq = n * n
    if areas is None or len(areas) != n or float(np.sum(areas)) == 0.0:
        weights = np.full(n, 1.0 / n)
    else:
        weights = np.asarray(areas, dtype=np.float64) / float(np.sum(areas))
    w_ard = float((dist * weights).sum())
    return 1.0 - ard / n_sq, 1.0 - w_ard / n_sq


def predict_reading_order(boxes: np.ndarray, column_gap_frac: float = 0.05) -> np.ndarray:
    """Rule-based geometric reading order over top-left-origin boxes [N,4] (l,t,r,b).

    1. Cluster boxes into column bands: sort by left edge; a new band starts
       when a box's left edge clears the previous band's max right edge
       (minus a tolerance of column_gap_frac * page width).
    2. Within a band: top-to-bottom, then left-to-right.
    3. Bands ordered left-to-right.
    Returns the permutation `order` such that boxes[order] is reading order.
    Deterministic; ties broken by original index.
    """
    n = len(boxes)
    if n == 0:
        return np.array([], dtype=np.int64)
    boxes = np.asarray(boxes, dtype=np.float64)
    page_w = float(boxes[:, 2].max() - boxes[:, 0].min()) or 1.0
    tol = column_gap_frac * page_w
    by_left = np.argsort(boxes[:, 0], kind="stable")
    band_id = np.zeros(n, dtype=np.int64)
    cur_band, cur_right = 0, -np.inf
    for i in by_left:
        l, _, r, _ = boxes[i]
        if l > cur_right - tol and cur_right != -np.inf:
            cur_band += 1
            cur_right = r
        else:
            cur_right = max(cur_right, r)
        band_id[i] = cur_band
    keys = np.lexsort((np.arange(n), boxes[:, 0], boxes[:, 1], band_id))
    return keys
