"""Direct parity tests against the ACTUAL reference implementation.

The reference's pure-numpy/torch modules (`graph_constructor/features.py`,
`preprocessor/bounding_box.py`, `utils/math.py`) are loaded straight from
/root/reference (bypassing package __init__s that need ray/PyG) and compared
against our vectorized equivalents on randomized inputs. Skipped when the
reference tree is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src/gnnradarobjectdetection"

if not os.path.isdir(REF):
    pytest.skip("reference tree unavailable", allow_module_level=True)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    for pkg in ("gnnradarobjectdetection", "gnnradarobjectdetection.utils",
                "gnnradarobjectdetection.preprocessor",
                "gnnradarobjectdetection.graph_constructor"):
        m = types.ModuleType(pkg)
        m.__path__ = []
        sys.modules.setdefault(pkg, m)
    math_mod = _load("gnnradarobjectdetection.utils.math",
                     f"{REF}/utils/math.py")
    features_mod = _load("gnnradarobjectdetection.graph_constructor.features",
                         f"{REF}/graph_constructor/features.py")
    bb_mod = _load("gnnradarobjectdetection.preprocessor.bounding_box",
                   f"{REF}/preprocessor/bounding_box.py")
    return types.SimpleNamespace(math=math_mod, features=features_mod,
                                 bb=bb_mod)


def test_point_pair_features_match_reference(ref):
    from radargnn_tpu.graph.features import point_pair_features

    rng = np.random.default_rng(0)
    for mode in ("directed", "undirected"):
        p1 = rng.normal(size=(40, 2)) * 10
        p2 = rng.normal(size=(40, 2)) * 10
        v1 = rng.normal(size=(40, 2)) * 3
        v2 = rng.normal(size=(40, 2)) * 3
        # sprinkle zero-velocity cases
        v1[::7] = 0
        v2[::5] = 0

        ours = point_pair_features(p1, p2, v1, v2, mode)
        for i in range(40):
            d, t12, tmin, tmax = ref.features.get_En_equivariant_point_pair_metrics(
                p1[i].reshape(2, 1), p2[i].reshape(2, 1),
                v1[i].reshape(2, 1), v2[i].reshape(2, 1), mode)
            np.testing.assert_allclose(
                ours[i], [d, t12, tmin, tmax], atol=1e-8,
                err_msg=f"{mode} row {i}")


def test_box_corner_decode_matches_reference(ref):
    from radargnn_tpu.postprocess import boxes as bx

    rng = np.random.default_rng(1)
    n = 30
    boxes = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                      rng.uniform(1, 8, n), rng.uniform(0.5, 0.99, n) *
                      rng.uniform(1, 8, n), rng.uniform(0, 179.9, n)], axis=1)
    pts = rng.uniform(-20, 20, size=(n, 2))

    ours = bx.corners_from_absolute(
        bx.relative_rotated_to_absolute(boxes, pts))
    for i in range(n):
        r = ref.bb.RelativeRotatedBoundingBox(*boxes[i])
        ref_corners = r.get_absolute_bounding_box(pts[i, 0], pts[i, 1]).corners
        np.testing.assert_allclose(ours[i], ref_corners, atol=1e-9)


def test_aligned_box_decode_matches_reference(ref):
    from radargnn_tpu.postprocess import boxes as bx

    rng = np.random.default_rng(2)
    n = 30
    boxes = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                      rng.uniform(0.5, 6, n), rng.uniform(0.5, 6, n)], axis=1)
    pts = rng.uniform(-20, 20, size=(n, 2))
    ours = bx.relative_aligned_to_absolute_corners(boxes, pts)
    for i in range(n):
        r = ref.bb.RelativeAlignedBoundingBox(*boxes[i])
        ref_corners = r.get_absolute_bounding_box(pts[i, 0], pts[i, 1]).corners
        np.testing.assert_allclose(ours[i], ref_corners, atol=1e-9)


def test_rotation_invariant_roundtrip_matches_reference(ref):
    from radargnn_tpu.postprocess import boxes as bx

    rng = np.random.default_rng(3)
    n = 40
    rel = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                    rng.uniform(1, 6, n), rng.uniform(0.5, 0.95, n) *
                    rng.uniform(1, 6, n), rng.uniform(0.01, 179.9, n)], axis=1)
    pts = rng.uniform(-20, 20, size=(n, 2))
    nns = pts + rng.normal(size=(n, 2))

    ours_en = bx.relative_rotated_to_rotation_invariant(rel, pts, nns)
    for i in range(n):
        r = ref.bb.RelativeRotatedBoundingBox(*rel[i])
        en = r.relative_rotated_bb_to_rotation_invariant_representation(
            pts[i], nns[i])
        np.testing.assert_allclose(
            ours_en[i],
            [en.d, en.theta_v_p_nn_v_p_c, en.l, en.w, en.theta_v_p_nn_v_dir],
            atol=1e-6, err_msg=f"row {i}")

    # inverse
    ours_rel = bx.rotation_invariant_to_relative_rotated(ours_en, pts, nns)
    for i in range(n):
        r = ref.bb.RotationInvariantRelativeRotatedBoundingBox(*ours_en[i])
        back = r.rotation_invariant_representation_to_relative_rotated_bb(
            pts[i], nns[i])
        np.testing.assert_allclose(
            ours_rel[i], [back.x_center, back.y_center, back.l, back.w,
                          back.theta], atol=1e-6, err_msg=f"row {i}")


def test_corners_to_xylwt_matches_reference(ref):
    from radargnn_tpu.postprocess import boxes as bx
    from radargnn_tpu.utils.geometry import get_box_corners

    rng = np.random.default_rng(4)
    n = 30
    corner_sets = []
    for _ in range(n):
        corner_sets.append(get_box_corners(
            rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(1.2, 8),
            rng.uniform(0.4, 1.1), rng.uniform(0, 179.0)))
    corners = np.stack(corner_sets)

    ours = bx.corners_to_xylwt(corners)

    class _Box:
        def __init__(self, c):
            self.corners = c

    ref_matrix = ref.bb.BoundingBox.get_absolute_rotated_box_representations(
        [_Box(c) for c in corner_sets])
    np.testing.assert_allclose(ours, ref_matrix, atol=1e-7)


def test_min_area_rect_matches_reference(ref):
    from radargnn_tpu.utils.geometry import (
        minimum_bounding_rectangle_with_rotation,
    )

    rng = np.random.default_rng(5)
    for _ in range(15):
        pts = rng.normal(size=(12, 2)) * 6
        ours = minimum_bounding_rectangle_with_rotation(pts)
        theirs = ref.math.minimum_bounding_rectangle_with_rotation_alternative(
            pts)
        # same rectangle up to corner ordering
        ours_set = {tuple(np.round(c, 6)) for c in ours}
        ref_set = {tuple(np.round(c, 6)) for c in theirs}
        assert ours_set == ref_set


def test_point_iou_matches_reference(ref):
    import torch

    from radargnn_tpu.utils.geometry import point_iou

    rng = np.random.default_rng(6)
    points = rng.uniform(-10, 10, size=(300, 2))
    for aligned in (True, False):
        if aligned:
            a = np.sort(rng.uniform(-8, 8, size=(4, 2, 2)), axis=1)
            boxes_a = a.transpose(0, 2, 1).reshape(4, 4)[:, [0, 2, 1, 3]]
            b = np.sort(rng.uniform(-8, 8, size=(5, 2, 2)), axis=1)
            boxes_b = b.transpose(0, 2, 1).reshape(5, 4)[:, [0, 2, 1, 3]]
        else:
            boxes_a = np.stack([rng.uniform(-6, 6, 4), rng.uniform(-6, 6, 4),
                                rng.uniform(1, 6, 4), rng.uniform(0.5, 3, 4),
                                rng.uniform(0, 180, 4)], axis=1)
            boxes_b = np.stack([rng.uniform(-6, 6, 5), rng.uniform(-6, 6, 5),
                                rng.uniform(1, 6, 5), rng.uniform(0.5, 3, 5),
                                rng.uniform(0, 180, 5)], axis=1)
        ours = point_iou(boxes_a, boxes_b, points, aligned)
        theirs = ref.math.point_iou(torch.tensor(boxes_a),
                                    torch.tensor(boxes_b), points, aligned)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=1e-9, err_msg=str(aligned))


def test_angle_adaption_matches_reference(ref):
    import jax.numpy as jnp

    from radargnn_tpu.train.losses import (
        adapt_bb_orientation_angle, invert_bb_orientation_angle_adaption,
    )

    rng = np.random.default_rng(7)
    bb = np.concatenate(
        [rng.normal(size=(20, 4)),
         rng.uniform(0, np.pi, size=(20, 1))], axis=1)
    bb[3] = np.nan

    ours = np.asarray(adapt_bb_orientation_angle(jnp.asarray(bb.copy())))
    theirs = ref.bb.adapt_bb_orientation_angle(bb.copy())
    np.testing.assert_allclose(ours[:3], theirs[:3], atol=1e-6)
    np.testing.assert_allclose(ours[4:], theirs[4:], atol=1e-6)
    assert np.isnan(ours[3]).all() and np.isnan(theirs[3, 0])

    for theta in np.linspace(-1, 1, 21):
        ours_inv = float(invert_bb_orientation_angle_adaption(theta))
        theirs_inv = ref.bb.invert_bb_orientation_angle_adaption(theta)
        assert ours_inv == pytest.approx(theirs_inv, abs=1e-6)  # f32 vs f64
