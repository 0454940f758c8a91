"""NMS + rotated IoU vs. the reference's detectron2/torchvision semantics.

The threshold-behavior characterization mirrors
`/root/reference/test/test_postprocessor.py:8-34`; rotated IoU is
cross-checked against shapely-free analytic cases and a Monte-Carlo oracle.
"""

import numpy as np
import jax.numpy as jnp

from radargnn_tpu.postprocess.nms import (
    aligned_iou_matrix, rotated_iou_matrix, nms_indices,
)


def test_nms_rotated_threshold_characterization():
    box_matrix = np.array([[1, 2, 1, 1, 90], [1, 2.9, 1, 1, 90]], np.float64)
    scores = np.array([0.2, 0.7])

    box_inters = 0.1 * 1
    boxes_iou = box_inters / (2 - box_inters)

    keep_lower = nms_indices(box_matrix, scores, boxes_iou - 0.01, rotated=True)
    assert keep_lower.tolist() == [1]

    keep_higher = nms_indices(box_matrix, scores, boxes_iou + 0.01, rotated=True)
    assert keep_higher.tolist() == [1, 0]


def test_aligned_iou_analytic():
    a = jnp.array([[0.0, 0, 2, 2]])
    b = jnp.array([[1.0, 1, 3, 3], [2.0, 2, 3, 3], [0.0, 0, 2, 2]])
    iou = np.asarray(aligned_iou_matrix(a, b))
    np.testing.assert_allclose(iou[0], [1 / 7, 0.0, 1.0], atol=1e-6)


def test_rotated_iou_axis_aligned_case():
    # rotated IoU with theta=0 must equal aligned IoU
    a = np.array([[1.0, 1, 2, 2, 0]])          # box [0,2]x[0,2]
    b = np.array([[2.0, 2, 2, 2, 0]])          # box [1,3]x[1,3]
    iou = np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou, [[1 / 7]], atol=1e-6)


def test_rotated_iou_45deg_diamond():
    # square vs the same square rotated 45°: intersection is a regular octagon
    a = np.array([[0.0, 0, 2, 2, 0]])
    b = np.array([[0.0, 0, 2, 2, 45]])
    iou = float(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b))[0, 0])
    inter = 8 * (np.sqrt(2) - 1)               # octagon area for side 2
    expect = inter / (4 + 4 - inter)
    assert abs(iou - expect) < 1e-6


def test_rotated_iou_identical_and_disjoint():
    a = np.array([[3.0, -2, 4, 1.5, 33.0]])
    iou = float(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(a))[0, 0])
    assert abs(iou - 1.0) < 1e-6
    b = np.array([[30.0, 40, 2, 2, 70.0]])
    iou = float(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b))[0, 0])
    assert iou == 0.0


def test_rotated_iou_monte_carlo():
    from radargnn_tpu.utils.geometry import get_box_corners, points_in_rect_mask

    rng = np.random.default_rng(0)
    pts = rng.uniform(-6, 6, size=(200_000, 2))
    for _ in range(8):
        a = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                      rng.uniform(1, 4), rng.uniform(0.5, 3),
                      rng.uniform(0, 180)])
        b = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                      rng.uniform(1, 4), rng.uniform(0.5, 3),
                      rng.uniform(0, 180)])
        in_a = points_in_rect_mask(get_box_corners(*a), pts)
        in_b = points_in_rect_mask(get_box_corners(*b), pts)
        inter_mc = (in_a & in_b).mean() * 144
        union_mc = (in_a | in_b).mean() * 144
        iou_mc = inter_mc / union_mc if union_mc > 0 else 0.0
        iou = float(rotated_iou_matrix(jnp.asarray(a[None]),
                                       jnp.asarray(b[None]))[0, 0])
        assert abs(iou - iou_mc) < 0.02, (a, b, iou, iou_mc)


def test_nms_aligned_basic():
    boxes = np.array([[0, 0, 2, 2], [0.1, 0, 2.1, 2], [5, 5, 6, 6]], np.float64)
    scores = np.array([0.9, 0.8, 0.5])
    keep = nms_indices(boxes, scores, 0.5, rotated=False)
    assert keep.tolist() == [0, 2]

    # high threshold keeps everything, score-ordered
    keep = nms_indices(boxes, scores, 0.99, rotated=False)
    assert keep.tolist() == [0, 1, 2]


def test_nms_negative_coordinates():
    # the reference needs a +shift hack for negative coords
    # (`postprocessing.py:362-365`); our IoU is shift-invariant by design
    boxes = np.array([[-10, -10, -8, -8], [-9.9, -10, -7.9, -8]], np.float64)
    scores = np.array([0.3, 0.6])
    keep = nms_indices(boxes, scores, 0.5, rotated=False)
    assert keep.tolist() == [1]


def test_nms_empty():
    assert nms_indices(np.zeros((0, 4)), np.zeros((0,)), 0.5, False).size == 0


def test_nms_invariance_under_rigid_transform():
    """NMS keep set is invariant under rotation+translation of all boxes."""
    rng = np.random.default_rng(3)
    boxes = np.stack([rng.uniform(-5, 5, 12), rng.uniform(-5, 5, 12),
                      rng.uniform(1, 4, 12), rng.uniform(0.5, 2, 12),
                      rng.uniform(0, 180, 12)], axis=1)
    scores = rng.random(12)
    base = nms_indices(boxes, scores, 0.3, rotated=True).tolist()

    for phi, shift in ((37.0, (11.0, -4.0)), (120.0, (-30.0, 8.0))):
        t = np.deg2rad(phi)
        rot = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        moved = boxes.copy()
        moved[:, :2] = boxes[:, :2] @ rot.T + np.asarray(shift)
        moved[:, 4] = np.mod(boxes[:, 4] + phi, 180.0)
        got = nms_indices(moved, scores, 0.3, rotated=True).tolist()
        assert got == base, (phi, shift)
