"""Property-based tests (hypothesis) for the pure metric kernels —
invariants the reference implicitly relies on (SURVEY.md §5 notes the
reference has no property tests; these guard the from-scratch kernels).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_eval_spark.functions.text_metrics import cer, levenshtein

texts = st.text(alphabet=st.characters(codec="utf-8",
                                       blacklist_categories=("Cs",)),
                max_size=60)


class TestLevenshtein:
    @given(texts)
    @settings(max_examples=60, deadline=None)
    def test_identity(self, s):
        assert levenshtein(s, s) == 0

    @given(texts, texts)
    @settings(max_examples=60, deadline=None)
    def test_symmetry(self, a, b):
        assert levenshtein(a, b) == levenshtein(b, a)

    @given(texts, texts, texts)
    @settings(max_examples=40, deadline=None)
    def test_triangle(self, a, b, c):
        assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)

    @given(texts, texts)
    @settings(max_examples=60, deadline=None)
    def test_bounds(self, a, b):
        d = levenshtein(a, b)
        assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))

    @given(texts, texts)
    @settings(max_examples=40, deadline=None)
    def test_cer_bounds(self, pred, true):
        c = cer(pred, true)
        assert c >= 0.0
        if pred == true:
            assert c == 0.0


class TestIoU:
    @given(st.lists(st.tuples(
        st.integers(0, 80), st.integers(0, 80),
        st.integers(1, 20), st.integers(1, 20)), min_size=0, max_size=8))
    @settings(max_examples=40, deadline=None)
    def test_iou_matrix_bounds_and_diag(self, raw):
        from docling_eval_spark.functions.layout_metrics import iou_matrix

        boxes = np.array([[x, y, x + w, y + h] for x, y, w, h in raw],
                         dtype=np.float64).reshape(-1, 4)
        m = iou_matrix(boxes, boxes)
        assert ((m >= 0) & (m <= 1 + 1e-12)).all()
        if len(boxes):
            assert np.allclose(np.diag(m), 1.0)
            assert np.allclose(m, m.T)


class TestReadingOrder:
    @given(st.lists(st.integers(0, 500), min_size=1, max_size=30, unique=True))
    @settings(max_examples=40, deadline=None)
    def test_single_column_recovers_y_order(self, ys):
        from docling_eval_spark.functions.reading_order import predict_reading_order

        boxes = np.array([[10.0, float(y), 110.0, float(y) + 5] for y in ys])
        order = predict_reading_order(boxes)
        assert [ys[i] for i in order] == sorted(ys)

    @given(st.integers(0, 10_000))
    @settings(max_examples=30, deadline=None)
    def test_permutation_property(self, seed):
        from docling_eval_spark.functions.reading_order import predict_reading_order

        rng = np.random.RandomState(seed)
        n = rng.randint(1, 20)
        boxes = rng.rand(n, 2)
        boxes = np.hstack([boxes, boxes + rng.rand(n, 2) + 0.01])
        order = predict_reading_order(boxes)
        assert sorted(order.tolist()) == list(range(n))


class TestJaccardShingles:
    @given(st.lists(st.sampled_from("abcdefg tuvw xyz".split()),
                    min_size=0, max_size=30))
    @settings(max_examples=40, deadline=None)
    def test_identity_and_bounds(self, words):
        from docling_eval_spark.operators.dedup import _shingle_hashes

        text = " ".join(words)
        h = _shingle_hashes(text, 3)
        assert len(h) >= 1
        assert (np.sort(h) == h).all()  # np.unique sorted
        h2 = _shingle_hashes(text, 3)
        assert (h == h2).all()  # deterministic
