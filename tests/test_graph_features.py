"""Graph construction + invariant features vs. the reference oracles.

Mirrors `/root/reference/test/test_graph_constructor.py` (hand-computed
geometry values) and cross-checks the host kNN edge order against sklearn.
"""

import numpy as np

from radargnn_tpu.configs import GraphConstructionConfiguration
from radargnn_tpu.graph.build import build_geometric_graph, build_edges
from radargnn_tpu.graph.features import (
    point_pair_features, edge_features, node_features, node_degrees,
)
from radargnn_tpu.ops.knn import knn_edges_host


def test_point_pair_features():
    p1 = np.array([[1, 1]], dtype=np.float64)
    p2 = np.array([[3, 2]], dtype=np.float64)
    v1 = np.array([[0, 1]], dtype=np.float64)
    v2 = np.array([[1, 0]], dtype=np.float64)
    out = point_pair_features(p1, p2, v1, v2, "directed")[0]
    np.testing.assert_allclose(np.round(out, 2), [2.24, 90.0, 63.43, 26.57])


def test_point_pair_features_with_zero_velocity():
    p1 = np.array([[1, 1]], dtype=np.float64)
    p2 = np.array([[3, 2]], dtype=np.float64)
    v1 = np.array([[0, 1]], dtype=np.float64)
    v2 = np.array([[0, 0]], dtype=np.float64)
    out = point_pair_features(p1, p2, v1, v2, "directed")[0]
    np.testing.assert_allclose(np.round(out, 2), [2.24, 90.0, 63.43, 90.0])


def test_edge_features_full_vector():
    X = np.array([[1, 1], [3, 2]], dtype=np.float64)
    V = np.array([[0, 1], [1, 0]], dtype=np.float64)
    edges = build_edges(X, "knn", k=1)
    feats = ["point_pair_features", "spatial_euclidean_distance",
             "velocity_euclidean_distance", "relative_position",
             "relative_velocity"]
    e_feat = edge_features(feats, "directed", X, V, edges[:, 0], edges[:, 1])
    # edge x0 -> x1: relative position of x0 w.r.t. x1
    expected = [2.24, 90, 63.43, 26.57, 2.24, 1.41, -2, -1, -1, 1]
    assert np.round(e_feat[0, :], 2).tolist() == expected


def test_node_features_assembly_order():
    X = np.array([[1, 1], [3, 2]], dtype=np.float64)
    V = np.array([[0, 1], [1, 0]], dtype=np.float64)
    rcs = np.array([[1.8], [2.6]])
    time_index = np.array([[100], [101]])
    edges = build_edges(X, "knn", k=1)
    feats = ["rcs", "time_index", "degree", "velocity_vector_length",
             "velocity_vector", "spatial_coordinates"]
    n_feat = node_features(feats, X, V, {"rcs": rcs, "time_index": time_index},
                           edges[:, 0], edges[:, 1])
    assert n_feat[1, :].tolist() == [2.6, 101, 1, 1, 1, 0, 3, 2]


def test_degree_undirected_semantics():
    # 0->1 and 1->0 is one undirected neighbor each
    senders = np.array([0, 1])
    receivers = np.array([1, 0])
    deg = node_degrees(senders, receivers, 2)
    assert deg.tolist() == [1, 1]

    # 0->1, 0->2: deg(0)=2, deg(1)=1, deg(2)=1
    deg = node_degrees(np.array([0, 0]), np.array([1, 2]), 3)
    assert deg.tolist() == [2, 1, 1]


def test_graph_constructor_pipeline():
    pos = np.array([[1, 1], [3, 2], [5, 8]], dtype=np.float64)
    vel = np.ones_like(pos)
    ts = np.array([100, 101, 102]).reshape(3, 1)

    config = GraphConstructionConfiguration(
        "knn", {"k": 1, "r": 1}, ["spatial_coordinates", "time_index"],
        ["spatial_euclidean_distance"], "directed", "X")
    g = build_geometric_graph(config, pos, vel, rcs=None, timestamps=ts)

    assert g.edges.tolist() == [[0, 1], [1, 0], [2, 1]]
    assert np.allclose(g.edge_feat[0, 0], 5 ** 0.5)
    assert g.node_feat[1, :].tolist() == [3, 2, 1]


def test_graph_constructor_distance_definition():
    pos = np.array([[1, 1], [2, 2], [10, 10]], dtype=np.float64)
    vel = np.ones_like(pos)
    vel[0, :] = 100

    cfg_x = GraphConstructionConfiguration(
        "knn", {"k": 1, "r": 1}, ["spatial_coordinates"],
        ["spatial_euclidean_distance"], "directed", "X")
    g = build_geometric_graph(cfg_x, pos, vel)
    assert g.edges.tolist() == [[0, 1], [1, 0], [2, 1]]

    cfg_xv = GraphConstructionConfiguration(
        "knn", {"k": 1, "r": 1}, ["spatial_coordinates"],
        ["spatial_euclidean_distance"], "directed", "XV")
    g = build_geometric_graph(cfg_xv, pos, vel)
    assert g.edges.tolist() == [[0, 1], [1, 2], [2, 1]]


def test_knn_edges_match_sklearn():
    from sklearn.neighbors import kneighbors_graph

    rng = np.random.default_rng(42)
    for n, k in [(10, 3), (50, 5), (200, 20)]:
        pts = rng.normal(size=(n, 2)) * 10
        ours = knn_edges_host(pts, k)
        a = kneighbors_graph(pts, k, mode="connectivity", include_self=False)
        ref = np.stack(a.nonzero(), axis=1)
        np.testing.assert_array_equal(ours, ref)


def test_radius_edges_match_sklearn():
    from sklearn.neighbors import radius_neighbors_graph

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(60, 2)) * 3
    ours = build_edges(pts, "radius", r=2.0)
    a = radius_neighbors_graph(pts, 2.0, mode="connectivity", include_self=False)
    ref = np.stack(a.nonzero(), axis=1)
    np.testing.assert_array_equal(ours, ref)


def test_undirected_point_pair_features_symmetric():
    rng = np.random.default_rng(3)
    p1, p2 = rng.normal(size=(8, 2)), rng.normal(size=(8, 2))
    v1, v2 = rng.normal(size=(8, 2)), rng.normal(size=(8, 2))
    f_fwd = point_pair_features(p1, p2, v1, v2, "undirected")
    f_bwd = point_pair_features(p2, p1, v2, v1, "undirected")
    np.testing.assert_allclose(f_fwd, f_bwd, atol=1e-12)
