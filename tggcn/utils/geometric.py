"""Numpy geometry utilities (bounding boxes, IoU, centroids).

Behavioural parity with reference pyrutils/geometric.py:6-116 and the centroid
helper in vhoi/data_loading.py:985-995. All functions are NaN-aware and
vectorised over leading dimensions.
"""

from typing import List, Union

import numpy as np


def bounding_boxes_from_keypoints(keypoints: np.ndarray) -> np.ndarray:
    """Keypoints (..., K, 2) -> bounding boxes (..., 4) as x_min, y_min, x_max, y_max."""
    min_vals = np.nanmin(keypoints, axis=-2)
    max_vals = np.nanmax(keypoints, axis=-2)
    return np.concatenate([min_vals, max_vals], axis=-1)


def alter_bounding_boxes_size(bounding_boxes: np.ndarray, alter_percentage: Union[int, float]) -> np.ndarray:
    """Scale bounding box sides by alter_percentage (reference geometric.py:20-45)."""
    min_vals = bounding_boxes[..., :2].copy()
    max_vals = bounding_boxes[..., 2:].copy()
    alter_proportion = alter_percentage / 100
    scale_diff = abs(1.0 - alter_proportion) * (max_vals - min_vals)
    if alter_proportion < 1.0:
        min_vals += scale_diff
        max_vals -= scale_diff
    else:
        min_vals -= scale_diff
        max_vals += scale_diff
    return np.concatenate([min_vals, max_vals], axis=-1)


def intersect_bounding_boxes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Box intersection; NaN where boxes do not intersect (reference geometric.py:70)."""
    min_vals = np.maximum(a[..., :2], b[..., :2])
    max_vals = np.minimum(a[..., 2:], b[..., 2:])
    is_consistent = (min_vals[..., :1] <= max_vals[..., :1]) & (min_vals[..., 1:2] <= max_vals[..., 1:2])
    is_consistent = np.repeat(is_consistent, repeats=2, axis=-1)
    min_vals = np.where(is_consistent, min_vals, np.nan)
    max_vals = np.where(is_consistent, max_vals, np.nan)
    return np.concatenate([min_vals, max_vals], axis=-1)


def unionize_bounding_boxes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Smallest box covering both inputs (reference geometric.py:94)."""
    min_vals = np.minimum(a[..., :2], b[..., :2])
    max_vals = np.maximum(a[..., 2:], b[..., 2:])
    return np.concatenate([min_vals, max_vals], axis=-1)


def compute_bounding_boxes_area(bounding_boxes: np.ndarray) -> np.ndarray:
    """Area (..., 1) of boxes (..., 4) (reference geometric.py:110)."""
    width = bounding_boxes[..., 2:3] - bounding_boxes[..., 0:1]
    height = bounding_boxes[..., 3:4] - bounding_boxes[..., 1:2]
    return width * height


def iou_between_bounding_boxes(many_bounding_boxes: List[np.ndarray]) -> np.ndarray:
    """IoU (..., 1) of a list of box arrays (reference geometric.py:46-66)."""
    union = many_bounding_boxes[0]
    intersection = many_bounding_boxes[0]
    for boxes in many_bounding_boxes[1:]:
        union = unionize_bounding_boxes(union, boxes)
        intersection = intersect_bounding_boxes(intersection, boxes)
    intersection_area = compute_bounding_boxes_area(intersection)
    intersection_area = np.where(np.isnan(intersection_area), 0.0, intersection_area)
    union_area = compute_bounding_boxes_area(union)
    return intersection_area / union_area


def compute_centroid(bounding_boxes: np.ndarray) -> np.ndarray:
    """Centroids (..., 2) of boxes (..., 4) (reference vhoi/data_loading.py:985)."""
    x = (bounding_boxes[..., :1] + bounding_boxes[..., 2:3]) / 2
    y = (bounding_boxes[..., 1:2] + bounding_boxes[..., 3:4]) / 2
    return np.concatenate([x, y], axis=-1)
