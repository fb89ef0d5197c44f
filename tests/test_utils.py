import numpy as np
import pytest

from tggcn.utils.geometric import (
    bounding_boxes_from_keypoints,
    compute_centroid,
    iou_between_bounding_boxes,
)
from tggcn.utils.itertools import (
    negative_range,
    rle_numpy,
    run_length_encoding,
    run_length_encoding_intervals,
)
from tggcn.utils.metrics import f1_at_k, f1_at_k_single_example


class TestIterTools:
    def test_negative_range(self):
        assert list(negative_range(3)) == [-1, -2, -3]
        with pytest.raises(ValueError):
            negative_range(0)

    def test_rle(self):
        labels = [1, 1, 2, 2, 2, 3]
        assert list(run_length_encoding(labels)) == [(1, 2), (2, 3), (3, 1)]
        assert list(run_length_encoding_intervals(labels)) == [(0, 2), (2, 5), (5, 6)]

    def test_rle_numpy_matches_iterator(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            labels = rng.integers(0, 4, size=rng.integers(1, 30))
            ids, starts, ends = rle_numpy(labels)
            expected = list(run_length_encoding(labels))
            assert [(i, e - s) for i, s, e in zip(ids, starts, ends)] == expected

    def test_rle_numpy_empty(self):
        ids, starts, ends = rle_numpy(np.array([]))
        assert len(ids) == len(starts) == len(ends) == 0


class TestF1AtK:
    def test_perfect_prediction(self):
        y = [0, 0, 1, 1, 2, 2]
        assert f1_at_k_single_example(y, y, num_classes=3, overlap=0.5) == 1.0

    def test_all_wrong_class(self):
        y_true = [0] * 6
        y_pred = [1] * 6
        assert f1_at_k_single_example(y_true, y_pred, num_classes=3, overlap=0.25) == 0.0

    def test_partial_overlap(self):
        # Predicted segment shifted: overlap IoU = 4/8 = 0.5.
        y_true = [0] * 6 + [1] * 6
        y_pred = [0] * 4 + [1] * 8
        assert f1_at_k_single_example(y_true, y_pred, num_classes=2, overlap=0.5) == 1.0
        # At stricter threshold the short first segment fails IoU for class 1.
        f1 = f1_at_k_single_example(y_true, y_pred, num_classes=2, overlap=0.75)
        assert f1 < 1.0

    def test_oversegmentation_penalised(self):
        y_true = [0] * 8
        y_pred = [0, 0, 1, 1, 0, 0, 1, 1]
        # Two predicted '0' segments against one GT: 1 TP + 1 FP; two '1' FPs.
        f1 = f1_at_k_single_example(y_true, y_pred, num_classes=2, overlap=0.1)
        # precision 1/4... the second 0-segment IoU vs GT = 2/8 = 0.25 >= 0.1 but used -> FP.
        assert f1 == pytest.approx(2 * (0.25 * 1.0) / (0.25 + 1.0))

    def test_class_id_out_of_range_ignored(self):
        y_true = [0, 0, 5, 5]
        y_pred = [0, 0, 5, 5]
        # Class 5 >= num_classes=2 is ignored as prediction but stays a GT segment (FN).
        f1 = f1_at_k_single_example(y_true, y_pred, num_classes=2, overlap=0.5)
        assert f1 == pytest.approx(2 * (1.0 * 0.5) / (1.0 + 0.5))

    def test_batch_ignore_value(self):
        y_true = [[0, 0, 1, 1, -1, -1], [-1] * 6]
        y_pred = [[0, 0, 1, 1, 0, 0], [0] * 6]
        # Second example is all padding -> excluded from the average.
        assert f1_at_k(y_true, y_pred, num_classes=2, overlap=0.5, ignore_value=-1) == 1.0


class TestGeometric:
    def test_bounding_boxes_from_keypoints(self):
        kps = np.array([[1.0, 2.0], [3.0, 0.5], [np.nan, np.nan]])
        box = bounding_boxes_from_keypoints(kps)
        np.testing.assert_allclose(box, [1.0, 0.5, 3.0, 2.0])

    def test_centroid(self):
        boxes = np.array([[0.0, 0.0, 2.0, 4.0]])
        np.testing.assert_allclose(compute_centroid(boxes), [[1.0, 2.0]])

    def test_iou(self):
        a = np.array([0.0, 0.0, 2.0, 2.0])
        b = np.array([1.0, 1.0, 3.0, 3.0])
        iou = iou_between_bounding_boxes([a, b])
        np.testing.assert_allclose(iou, [1.0 / 9.0])

    def test_iou_disjoint(self):
        a = np.array([0.0, 0.0, 1.0, 1.0])
        b = np.array([2.0, 2.0, 3.0, 3.0])
        iou = iou_between_bounding_boxes([a, b])
        np.testing.assert_allclose(iou, [0.0])
