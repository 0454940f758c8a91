"""Native C++ geometry kernels vs. the numpy reference implementations."""

import os

import numpy as np
import pytest

from radargnn_tpu import native


def _lib_or_skip():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_native_builds():
    _lib_or_skip()


def test_native_knn_matches_numpy():
    _lib_or_skip()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 2)) * 10
    got = native.knn_edges(pts, 5)

    os.environ["RADARGNN_NO_NATIVE"] = "1"
    try:
        import importlib
        from radargnn_tpu.ops import knn as knn_mod
        # force numpy path by calling internals directly
        d2 = knn_mod._pairwise_sq_dists_np(pts)
        part = np.argpartition(d2, 4, axis=1)[:, :5]
        part_d = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(part_d, axis=1, kind="stable")
        idx = np.take_along_axis(part, order, axis=1)
        expect = np.stack([np.repeat(np.arange(100), 5), idx.reshape(-1)], 1)
    finally:
        del os.environ["RADARGNN_NO_NATIVE"]
    np.testing.assert_array_equal(got, expect)


def test_native_nearest_neighbor_matches_numpy():
    _lib_or_skip()
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(64, 2)) * 3
    got = native.nearest_neighbor(pts)
    d2 = (np.sum(pts**2, 1)[:, None] + np.sum(pts**2, 1)[None, :]
          - 2 * pts @ pts.T)
    np.fill_diagonal(d2, np.inf)
    np.testing.assert_array_equal(got, np.argmin(d2, axis=1))


def test_native_min_area_rect_matches_numpy():
    _lib_or_skip()
    from radargnn_tpu.utils import geometry

    rng = np.random.default_rng(2)
    for _ in range(10):
        pts = rng.normal(size=(15, 2)) * 5
        got = native.min_area_rect(pts)
        # numpy path (bypass the native shortcut)
        hull = geometry.convex_hull(pts)
        edges = np.roll(hull, -1, axis=0) - hull
        lengths = np.linalg.norm(edges, axis=1)
        u = edges[lengths > 0] / lengths[lengths > 0, None]
        o = np.stack([-u[:, 1], u[:, 0]], axis=1)
        pe, po = u @ hull.T, o @ hull.T
        areas = (pe.max(1) - pe.min(1)) * (po.max(1) - po.min(1))
        best = areas.min()

        d1 = np.linalg.norm(got[0] - got[1])
        d2_ = np.linalg.norm(got[1] - got[2])
        assert d1 * d2_ == pytest.approx(best, rel=1e-9)
        # all points inside
        from radargnn_tpu.utils.geometry import points_in_rect_mask
        assert points_in_rect_mask(got, pts).all()


def test_degenerate_returns_none():
    _lib_or_skip()
    pts = np.array([[0.0, 0], [1, 1]])
    assert native.min_area_rect(pts) is None


def test_native_point_pair_features_matches_numpy():
    """The C++ single-pass kernel must match the vectorized numpy formulas
    exactly (incl. zero-velocity -> 90 deg and coincident-point edge cases)
    in both edge modes."""
    from radargnn_tpu import native
    from radargnn_tpu.graph.features import point_pair_features

    if native.load() is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    n, e = 50, 300
    pos = rng.normal(size=(n, 2)) * 10
    vel = rng.normal(size=(n, 2)) * 3
    vel[:5] = 0.0                      # zero-velocity points
    pos[6] = pos[7]                    # coincident pair
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    senders[0], receivers[0] = 6, 7    # force a zero-distance edge
    edges = np.stack([senders, receivers], axis=-1)

    for mode in ("directed", "undirected"):
        got = native.point_pair_features_2d(pos, vel, edges,
                                            mode == "directed")
        want = point_pair_features(pos[senders], pos[receivers],
                                   vel[senders], vel[receivers], mode)
        # acos near dot=+-1 amplifies last-ulp differences in the dot
        # (summation order); 1e-5 degrees is far below feature noise
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-5)


def test_native_radius_edges_matches_numpy():
    from radargnn_tpu import native
    from radargnn_tpu.ops.knn import _pairwise_sq_dists_np

    if native.load() is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 20, (80, 2))
    r = 3.0
    got = native.radius_edges(pts, r)
    d2 = _pairwise_sq_dists_np(pts)
    s, t = np.nonzero(d2 <= r * r)
    want = np.stack([s, t], axis=1)
    np.testing.assert_array_equal(got, want)
