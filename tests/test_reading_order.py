"""ARD fixtures per FIXTURES.md §5 — formula readingorder_evaluator.py:229-271."""

import numpy as np
import pytest

from docling_eval_spark.functions.reading_order import ard_norm, predict_reading_order


class TestARD:
    def test_identity(self):
        ard, ward = ard_norm(np.arange(5))
        assert ard == 1.0 and ward == 1.0

    def test_empty(self):
        assert ard_norm(np.array([])) == (0.0, 0.0)

    def test_full_reversal_n4(self):
        # pred_order = [3,2,1,0]: sum|i-pi| = 3+1+1+3 = 8; 1 - 8/16 = 0.5
        ard, _ = ard_norm(np.array([3, 2, 1, 0]))
        assert ard == pytest.approx(0.5)

    def test_single_swap(self):
        # [1,0,2,3]: sum = 2; 1 - 2/16
        ard, _ = ard_norm(np.array([1, 0, 2, 3]))
        assert ard == pytest.approx(1 - 2 / 16)

    def test_weighted(self):
        # two boxes, areas 3:1, pred swapped: dist=[1,1]
        # w_ard = 1*0.75 + 1*0.25 = 1.0 ; 1 - 1/4 = 0.75
        ard, ward = ard_norm(np.array([1, 0]), areas=np.array([3.0, 1.0]))
        assert ard == pytest.approx(0.5)
        assert ward == pytest.approx(0.75)


class TestReadingOrderRule:
    def test_single_column_top_to_bottom(self):
        b = np.array([[0, 30, 10, 40], [0, 0, 10, 10], [0, 15, 10, 25]], dtype=float)
        order = predict_reading_order(b)
        assert list(order) == [1, 2, 0]

    def test_two_columns(self):
        # left column (x 0-10), right column (x 50-60); each two boxes
        b = np.array(
            [[50, 20, 60, 30],  # right bottom
             [0, 20, 10, 30],   # left bottom
             [50, 0, 60, 10],   # right top
             [0, 0, 10, 10]],   # left top
            dtype=float)
        order = predict_reading_order(b)
        assert list(order) == [3, 1, 2, 0]

    def test_empty(self):
        assert len(predict_reading_order(np.zeros((0, 4)))) == 0

    def test_permutation_property(self):
        rng = np.random.RandomState(42)
        b = rng.rand(20, 2)
        b = np.hstack([b, b + 0.1])
        order = predict_reading_order(b)
        assert sorted(order) == list(range(20))
