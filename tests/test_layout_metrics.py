"""Layout metric fixtures per FIXTURES.md §4 — closed-form IoU/mAP/mask cases."""

import numpy as np
import pytest

from docling_eval_spark.functions.layout_metrics import (
    average_precision,
    greedy_label_matched_iou,
    image_map,
    iou_matrix,
    mask_precision_recall_f1,
    match_detections,
)


def boxes(*bs):
    return np.array(bs, dtype=np.float64)


class TestIoU:
    def test_perfect_overlap(self):
        a = boxes([0, 0, 10, 10])
        assert iou_matrix(a, a)[0, 0] == pytest.approx(1.0)

    def test_no_overlap(self):
        assert iou_matrix(boxes([0, 0, 1, 1]), boxes([5, 5, 6, 6]))[0, 0] == 0.0

    def test_half_overlap(self):
        # [0,0,2,1] vs [1,0,3,1]: inter=1, union=3 -> 1/3
        got = iou_matrix(boxes([0, 0, 2, 1]), boxes([1, 0, 3, 1]))[0, 0]
        assert got == pytest.approx(1 / 3)

    def test_matrix_shape(self):
        m = iou_matrix(boxes([0, 0, 1, 1], [2, 2, 3, 3]), boxes([0, 0, 1, 1]))
        assert m.shape == (2, 1)
        assert m[0, 0] == 1.0 and m[1, 0] == 0.0


class TestGreedyLabelMatch:
    def test_perfect(self):
        b = boxes([0, 0, 10, 10], [20, 0, 30, 10])
        labels = np.array(["text", "table"])
        r = greedy_label_matched_iou(b, labels, b, labels, 0.5)
        assert r["average_iou"] == pytest.approx(1.0)
        assert r["matched_gt"] == 2 and r["unmatched_gt"] == 0

    def test_label_mismatch_only(self):
        b = boxes([0, 0, 10, 10])
        r = greedy_label_matched_iou(b, np.array(["text"]), b, np.array(["table"]), 0.5)
        assert r["average_iou"] == 0.0 and r["unmatched_gt"] == 1

    def test_below_threshold(self):
        p = boxes([0, 0, 2, 1])
        g = boxes([1, 0, 3, 1])  # IoU 1/3 < 0.5
        r = greedy_label_matched_iou(p, np.array(["a"]), g, np.array(["a"]), 0.5)
        assert r["matched_gt"] == 0

    def test_area_weighting(self):
        # two preds: big box perfect match, small box unmatched -> weighted by area
        p = boxes([0, 0, 10, 10], [90, 90, 91, 91])
        g = boxes([0, 0, 10, 10])
        lab = np.array(["a", "a"])
        r = greedy_label_matched_iou(p, lab, g, np.array(["a"]), 0.5)
        assert r["average_iou"] == pytest.approx(100.0 / 101.0)


class TestAP:
    def test_perfect_detection(self):
        b = boxes([0, 0, 10, 10], [20, 20, 30, 30])
        tp = match_detections(b, np.array([0.9, 0.8]), b)
        assert tp.all()
        ap = average_precision(np.array([0.9, 0.8]), tp[0], n_gt=2)
        assert ap == pytest.approx(1.0)

    def test_all_misses(self):
        p = boxes([0, 0, 1, 1])
        g = boxes([50, 50, 60, 60])
        tp = match_detections(p, np.array([0.9]), g)
        assert not tp.any()
        assert average_precision(np.array([0.9]), tp[0], 1) == 0.0

    def test_half_precision(self):
        # 1 tp then 1 fp, 1 gt total: recall hits 1.0 at precision 1.0
        scores = np.array([0.9, 0.8])
        tp = np.array([True, False])
        ap = average_precision(scores, tp, n_gt=1)
        assert ap == pytest.approx(1.0)
        # fp first, tp second: precision at full recall = 0.5
        ap2 = average_precision(np.array([0.9, 0.8]), np.array([False, True]), n_gt=1)
        assert ap2 == pytest.approx(0.5, abs=0.01)

    def test_empty_detections(self):
        assert average_precision(np.array([]), np.array([], dtype=bool), 3) == 0.0


class TestImageMap:
    def test_perfect(self):
        b = boxes([10, 10, 40, 40], [50, 50, 90, 90])
        labels = np.array([0, 1])
        scores = np.array([1.0, 1.0])
        m = image_map(b, labels, scores, b, labels)
        assert m["map"] == pytest.approx(1.0)
        assert m["map_50"] == pytest.approx(1.0)
        assert m["map_75"] == pytest.approx(1.0)

    def test_half_overlap_boundary(self):
        # IoU exactly 0.5: counts at threshold .5 only
        p = boxes([0, 0, 10, 20])
        g = boxes([0, 0, 10, 10])  # IoU = 0.5
        m = image_map(p, np.array([0]), np.array([1.0]), g, np.array([0]))
        assert m["map_50"] == pytest.approx(1.0)
        assert m["map_75"] == pytest.approx(0.0)

    def test_pred_only_label_ignored(self):
        # class with no gt is skipped (torchmetrics semantics)
        g = boxes([0, 0, 10, 10])
        p = boxes([0, 0, 10, 10], [20, 20, 30, 30])
        m = image_map(p, np.array([0, 7]), np.array([1.0, 1.0]), g, np.array([0]))
        assert m["map_50"] == pytest.approx(1.0)

    def test_no_gt_at_all(self):
        m = image_map(boxes([0, 0, 1, 1]), np.array([0]), np.array([1.0]),
                      np.zeros((0, 4)), np.array([], dtype=np.int64))
        assert m["map"] == -1.0


class TestMaskPRF:
    def test_identical(self):
        b = boxes([10, 10, 50, 50])
        p, r, f1 = mask_precision_recall_f1(b, b)
        assert (p, r, f1) == (1.0, 1.0, 1.0)

    def test_both_empty(self):
        assert mask_precision_recall_f1(np.zeros((0, 4)), np.zeros((0, 4))) == (1.0, 1.0, 1.0)

    def test_one_empty(self):
        b = boxes([10, 10, 50, 50])
        assert mask_precision_recall_f1(np.zeros((0, 4)), b) == (0.0, 0.0, 0.0)
        assert mask_precision_recall_f1(b, np.zeros((0, 4))) == (0.0, 0.0, 0.0)

    def test_half(self):
        gt = boxes([0, 0, 100, 100])
        pred = boxes([0, 0, 100, 50])
        p, r, f1 = mask_precision_recall_f1(gt, pred)
        assert p == pytest.approx(1.0)
        assert r == pytest.approx(0.5, abs=0.01)
