"""Deterministic synthetic layout pages with closed-form metric oracles.

Mirrors FIXTURES.md §4 (`layout_pages`): per doc, a GT box list in true
reading order plus a prediction derived by a doc_id-determined perturbation
mode. Every geometric quantity is chosen so per-image mAP, mask P/R/F1,
weighted IoU, and ARD have CLOSED-FORM values expressible in ANSI SQL over
(doc_id) alone — the DuckDB oracle recomputes them with CASE arithmetic,
giving the correctness gate exact cross-engine checks (the same strategy
the reference uses in tests/test_table_evaluator.py:286-292: hand-built
inputs with known metric identities).

Geometry (top-left origin, page normalized to 100 — parity with reference
docling_eval/evaluators/layout_evaluator.py:626-632):
  - n = 3 + doc_id % 5 boxes, single column, box k = (l=10, t=2+10k,
    r=30, b=10+10k): identical 20x8 boxes, 2-unit vertical gaps.
  - labels: box 0 "title", boxes 1..n-1 "text"; scores fixed 1.0
    (reference fixes detection scores to 1.0, layout_evaluator.py:663).

Perturbation mode = doc_id % 4:
  0 identity                -> map=1, mask=(1,1,1), ard=1
  1 drop last pred box      -> text AP = (floor(100(n-2)/(n-1))+1)/101,
                               mask R=(n-1)/n, ard=1
  2 shift all preds x+2     -> IoU = 144/176 ≈ .818 -> passes IoU thr ≤ .80
                               (7 of 10) -> map=0.7, mask=(0.9,0.9,0.9)
  3 swap t of boxes 0 and 1 -> boxes identical as a set: mask=(1,1,1);
                               reading order swaps ranks 0,1:
                               ard = 1-2/n^2, weighted ard = 1-2/n^3

Mask closed forms hold exactly because callers rasterize at 500x500 over
the 100-unit page (5 px per unit, integer coords -> exact pixel areas).
"""

from __future__ import annotations

import numpy as np

BOX_W, BOX_H = 20, 8
MASK_SIZE = 500  # 5 px per page unit: exact rasterization of integer coords


def n_boxes(doc_id: int) -> int:
    return 3 + doc_id % 5


def mode(doc_id: int) -> int:
    return doc_id % 4


def gt_page(doc_id: int) -> tuple[np.ndarray, np.ndarray]:
    """(boxes [n,4] float64, labels [n] str) in true reading order."""
    n = n_boxes(doc_id)
    boxes = np.array(
        [[10.0, 2.0 + 10 * k, 10.0 + BOX_W, 2.0 + 10 * k + BOX_H] for k in range(n)]
    )
    labels = np.array(["title"] + ["text"] * (n - 1))
    return boxes, labels


def pred_page(doc_id: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(boxes, labels, scores) after the doc's perturbation mode."""
    boxes, labels = gt_page(doc_id)
    m = mode(doc_id)
    if m == 1:
        boxes, labels = boxes[:-1], labels[:-1]
    elif m == 2:
        boxes = boxes + np.array([2.0, 0.0, 2.0, 0.0])
    elif m == 3:
        boxes = boxes.copy()
        t0, b0 = boxes[0, 1], boxes[0, 3]
        boxes[0, 1], boxes[0, 3] = boxes[1, 1], boxes[1, 3]
        boxes[1, 1], boxes[1, 3] = t0, b0
    return boxes, labels, np.ones(len(boxes))
