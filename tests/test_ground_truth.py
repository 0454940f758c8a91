"""GT box pipeline: the reference's property tests (rotation invariance of
the "en" encoding and its exact inverse recovery under 360 rotations) plus
the aligned/rotated hand-computed oracles.

Mirrors `/root/reference/test/test_preprocessor.py:26-204`.
"""

import numpy as np

from radargnn_tpu.data.ground_truth import (
    build_one_hot_vectors, create_2d_bounding_boxes,
)
from radargnn_tpu.ops.knn import nearest_neighbor_host
from radargnn_tpu.postprocess import boxes as bx

POS6 = np.array([[1, 2], [3, 4], [-1, 3], [9, 8], [10, 7], [-2, -3]],
                dtype=np.float64)
TRACKS6 = np.array([b"0", b"0", b"0", b"1", b"1", b"2"], dtype=object)


def _rot(phi_deg):
    phi = np.deg2rad(phi_deg)
    return np.array([[np.cos(phi), -np.sin(phi)], [np.sin(phi), np.cos(phi)]])


def test_bounding_box_creation_aligned():
    bb = create_2d_bounding_boxes(POS6, TRACKS6, True, "translation")
    assert bb[0].tolist() == [0, 1, 4, 2]
    assert bb[3].tolist() == [0.5, -0.5, 1, 1]
    assert bb[5].tolist() == [0, 0, 0.5, 0.5]


def test_bounding_box_creation_rotated():
    pos = np.array([[1, 2], [2, 1], [1, 0], [0, 1]], dtype=np.float64)
    tracks = np.array([b"0"] * 4, dtype=object)
    bb = create_2d_bounding_boxes(pos, tracks, False, "translation")
    bb_true = np.array([0, -1, 2 ** 0.5, 2 ** 0.5, 45 * np.pi / 180])
    assert np.all(np.abs(bb[0] - bb_true) < 1e-10)


def test_one_hot_vector_creation():
    one_hot = build_one_hot_vectors(np.array([1, 1, 0, 1]))
    assert one_hot[0].tolist() == [0, 1, 0, 0, 0, 0]
    assert one_hot[2].tolist() == [1, 0, 0, 0, 0, 0]


def test_rotation_invariant_bb_representation():
    """'en' encoding identical under all 360 1° rotations of the cloud."""
    base = create_2d_bounding_boxes(POS6, TRACKS6, False, "en")
    pos = POS6.copy()
    ok = True
    for phi in range(1, 360, 1):
        pos = pos @ _rot(phi)
        bb = create_2d_bounding_boxes(pos, TRACKS6, False, "en")
        if not (np.round(base, 5) == np.round(bb, 5)).all():
            ok = False
    assert ok


def test_reconstruction_of_rotation_invariant_bb():
    """'en' → relative-rotated inverse matches the directly created
    translation-invariant boxes, under 360 rotations."""
    pos = POS6.copy()
    ok = True
    for phi in range(0, 360, 1):
        pos = pos @ _rot(phi)
        base = create_2d_bounding_boxes(pos, TRACKS6, False, "translation")
        en = create_2d_bounding_boxes(pos, TRACKS6, False, "en")

        nn_pos = pos[nearest_neighbor_host(pos)]
        en_deg = en.copy()
        en_deg[:, 1] = np.rad2deg(en_deg[:, 1])
        en_deg[:, 4] = np.rad2deg(en_deg[:, 4])
        rec = bx.rotation_invariant_to_relative_rotated(en_deg, pos, nn_pos)
        rec[:, 4] = np.deg2rad(rec[:, 4])

        if not (np.round(base[:5], 5) == np.round(rec[:5], 5)).all():
            ok = False
        # single-point object: angle not reconstructible, compare first 4 cols
        if not (np.round(base[5, :4], 5) == np.round(rec[5, :4], 5)).all():
            ok = False
    assert ok


def test_corner_roundtrip():
    rng = np.random.default_rng(0)
    boxes = np.stack([rng.uniform(-10, 10, 16), rng.uniform(-10, 10, 16),
                      rng.uniform(2, 8, 16), rng.uniform(0.5, 1.9, 16),
                      rng.uniform(0, 179.9, 16)], axis=1)
    corners = bx.corners_from_absolute(boxes)
    back = bx.corners_to_xylwt(corners)
    np.testing.assert_allclose(back, boxes, rtol=1e-9, atol=1e-9)
