"""Geometry utils vs. the reference's analytic oracles.

Mirrors `/root/reference/test/test_postprocessor.py:37-99` plus extra
cross-checks of the qhull-free min-area rectangle against scipy.
"""

import numpy as np
import pytest

from radargnn_tpu.utils.geometry import (
    get_box_corners, is_point_in_rect, point_iou, get_discrete_iou,
    get_stats_of_predicted_box_points, minimum_bounding_rectangle_with_rotation,
    minimum_bounding_rectangle_without_rotation, convex_hull,
)


def test_point_in_rectangle():
    box = np.array([[1, 1], [2, 1], [2, 0], [1, 0]])
    points = np.array([[1, 2], [2, 2], [0.5, 1], [1, 0.5],
                       [1.5, 0.5], [2, 0.5], [1.5, 0], [1.7, -0.001]])
    expected = [False, False, False, True, True, True, True, False]
    assert [is_point_in_rect(box, p) for p in points] == expected


def test_point_iou_rotated_box():
    boxes_pred = np.array([[1, 1, 1, 1, 90], [4, 4, 2, 2, 45]], dtype=np.float64)
    boxes_gt = np.array([[1, 0.9, 1, 1, 90], [4.2, 3.9, 3, 2, 30]], dtype=np.float64)
    points = np.array([[1, 2], [2, 3], [1, 1], [1, 1.45], [4, 4], [5, 4]])
    iou = point_iou(boxes_pred, boxes_gt, points, box_aligned=False)
    np.testing.assert_allclose(iou, np.array([[0.5, 0], [0, 1]]))


def test_point_iou_aligned_box():
    box_pred = np.array([[1, 1, 2, 2], [2, 2, 3, 3]])
    box_true = np.array([[3, 3, 4, 4], [1, 1, 2, 2], [5, 5, 8, 8]])
    points = np.array([[1, 1], [1.5, 1.5], [2.5, 2.5], [3.5, 3.5], [6, 6], [7, 7]])
    iou = point_iou(box_pred, box_true, points, box_aligned=True)
    np.testing.assert_allclose(iou, np.array([[0, 1, 0], [0, 0, 0]]))


def test_get_stats_of_predicted_box_points():
    p_pred = np.array([[1, 2], [2, 3], [-1, 7]])
    p_true = np.array([[1, 2], [-1, 7], [5, 6], [3, 2]])
    tp, fp, fn = get_stats_of_predicted_box_points(p_pred, p_true)
    assert (tp, fp, fn) == (2, 1, 2)


def test_get_discrete_iou():
    assert get_discrete_iou(2, 1, 2) == 2 / 5
    assert get_discrete_iou(0, 0, 0) == 0.00001


def test_box_corners_identity():
    corners = get_box_corners(0, 0, 2, 1, 0)
    np.testing.assert_allclose(
        corners, [[1, 0.5], [1, -0.5], [-1, -0.5], [-1, 0.5]], atol=1e-12)


def test_box_corners_rotated_90():
    corners = get_box_corners(1, 1, 2, 1, 90)
    np.testing.assert_allclose(
        corners, [[0.5, 2], [1.5, 2], [1.5, 0], [0.5, 0]], atol=1e-12)


def test_convex_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    hull = convex_hull(pts)
    assert hull.shape == (4, 2)
    assert {tuple(p) for p in hull} == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_min_rect_aligned():
    pts = np.array([[1, 2], [3, 4], [-1, 3]])
    rect = minimum_bounding_rectangle_without_rotation(pts)
    np.testing.assert_allclose(rect, [[-1, 2], [-1, 4], [3, 2], [3, 4]])


def test_min_area_rect_diamond():
    # 4 points forming a rotated square: min-area rect is the square itself
    pts = np.array([[1, 2], [2, 1], [1, 0], [0, 1]], dtype=np.float64)
    rect = minimum_bounding_rectangle_with_rotation(pts)
    got = {tuple(np.round(c, 9)) for c in rect}
    assert got == {(1.0, 2.0), (2.0, 1.0), (1.0, 0.0), (0.0, 1.0)}


def test_min_area_rect_vs_scipy_qhull():
    """Random clouds: area must match a brute-force qhull-based evaluation."""
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(0)
    for _ in range(20):
        pts = rng.normal(size=(12, 2)) * 5
        rect = minimum_bounding_rectangle_with_rotation(pts)
        # all points inside (tolerance)
        d1 = np.linalg.norm(rect[0] - rect[1])
        d2 = np.linalg.norm(rect[1] - rect[2])
        area = d1 * d2

        # brute force over hull edges using scipy hull
        hull = pts[ConvexHull(pts).vertices]
        best = np.inf
        for i in range(len(hull)):
            e = hull[(i + 1) % len(hull)] - hull[i]
            e = e / np.linalg.norm(e)
            o = np.array([-e[1], e[0]])
            pe, po = hull @ e, hull @ o
            best = min(best, (pe.max() - pe.min()) * (po.max() - po.min()))
        assert area == pytest.approx(best, rel=1e-9)
