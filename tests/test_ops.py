"""Segment-reduction and device-kNN ops: torch-scatter-parity semantics."""

import numpy as np
import jax.numpy as jnp

from radargnn_tpu.ops import (
    segment_max, segment_sum, segment_mean, segment_reduce,
    knn_graph, radius_graph, nearest_neighbor,
)
from radargnn_tpu.ops.knn import knn_edges_host, nearest_neighbor_host


def test_segment_max_basic():
    data = jnp.array([[1.0, 5.0], [3.0, 2.0], [-4.0, -7.0]])
    ids = jnp.array([0, 0, 2])
    out = segment_max(data, ids, 4)
    np.testing.assert_allclose(out, [[3, 5], [0, 0], [-4, -7], [0, 0]])


def test_segment_max_negative_values_not_clamped():
    data = jnp.array([[-3.0], [-5.0]])
    ids = jnp.array([1, 1])
    out = segment_max(data, ids, 2)
    np.testing.assert_allclose(out, [[0.0], [-3.0]])


def test_segment_max_mask():
    data = jnp.array([[10.0], [1.0], [99.0]])
    ids = jnp.array([0, 0, 1])
    mask = jnp.array([False, True, False])
    out = segment_max(data, ids, 2, mask)
    np.testing.assert_allclose(out, [[1.0], [0.0]])


def test_segment_sum_and_mean():
    data = jnp.array([[1.0], [2.0], [4.0]])
    ids = jnp.array([0, 0, 1])
    mask = jnp.array([True, True, True])
    np.testing.assert_allclose(segment_sum(data, ids, 3, mask), [[3], [4], [0]])
    np.testing.assert_allclose(segment_mean(data, ids, 3, mask), [[1.5], [4], [0]])


def test_segment_reduce_dispatch():
    data = jnp.array([[1.0], [2.0]])
    ids = jnp.array([0, 0])
    np.testing.assert_allclose(segment_reduce("add", data, ids, 1), [[3.0]])
    np.testing.assert_allclose(segment_reduce("max", data, ids, 1), [[2.0]])
    np.testing.assert_allclose(segment_reduce("mean", data, ids, 1), [[1.5]])


def test_knn_graph_device_matches_host():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(40, 2)).astype(np.float32)
    k = 5
    s, r, m = knn_graph(jnp.asarray(pts), k)
    assert bool(m.all())
    got = set(zip(np.asarray(s).tolist(), np.asarray(r).tolist()))
    ref = set(map(tuple, knn_edges_host(pts, k).tolist()))
    assert got == ref


def test_knn_graph_padding():
    rng = np.random.default_rng(1)
    pts = np.zeros((16, 2), dtype=np.float32)
    pts[:10] = rng.normal(size=(10, 2))
    valid = np.arange(16) < 10
    s, r, m = knn_graph(jnp.asarray(pts), 3, jnp.asarray(valid))
    s, r, m = map(np.asarray, (s, r, m))
    # no valid edge touches a padded node
    assert (s[m] < 10).all() and (r[m] < 10).all()
    # all edges from padded senders masked out
    assert not m.reshape(16, 3)[10:].any()
    # every valid node has exactly k valid edges
    assert m.reshape(16, 3)[:10].all()


def test_knn_graph_fewer_than_k_neighbors():
    pts = np.array([[0, 0], [1, 0]], dtype=np.float32)
    s, r, m = knn_graph(jnp.asarray(pts), 5)
    m = np.asarray(m).reshape(2, 5)
    assert m.sum() == 2  # each node has only 1 possible neighbor


def test_radius_graph_device():
    pts = np.array([[0, 0], [1, 0], [5, 0]], dtype=np.float32)
    s, r, m = radius_graph(jnp.asarray(pts), 1.5, max_degree=2)
    got = {(int(a), int(b)) for a, b, keep in
           zip(np.asarray(s), np.asarray(r), np.asarray(m)) if keep}
    assert got == {(0, 1), (1, 0)}


def test_nearest_neighbor_device_matches_host():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(30, 2)).astype(np.float32)
    nn_dev = np.asarray(nearest_neighbor(jnp.asarray(pts)))
    nn_host = nearest_neighbor_host(pts)
    np.testing.assert_array_equal(nn_dev, nn_host)
