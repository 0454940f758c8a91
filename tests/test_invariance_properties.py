"""Invariance property tests at the feature and model level.

The reference's core claim (arXiv:2304.06547): with invariant inputs the
model output is invariant to the corresponding transformations of the cloud.
"""

import numpy as np
import jax

from radargnn_tpu.configs import GNNArchitectureConfig, GraphConstructionConfiguration
from radargnn_tpu.graph.build import build_geometric_graph
from radargnn_tpu.models.detnet import DetNet


def _rot(deg):
    r = np.deg2rad(deg)
    return np.array([[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]])


def _cloud(rng, n=80):
    pos = rng.normal(size=(n, 2)) * 10
    vel = rng.normal(size=(n, 2)) * 3
    rcs = rng.normal(size=(n, 1))
    ts = np.repeat(np.arange(4), n // 4).reshape(-1, 1)
    return pos, vel, rcs, ts


def test_translation_invariant_features():
    """relative_position edge features + non-spatial node features are
    identical under cloud translation."""
    rng = np.random.default_rng(0)
    pos, vel, rcs, ts = _cloud(rng)
    cfg = GraphConstructionConfiguration(
        "knn", {"k": 5, "r": 1}, ["rcs", "velocity_vector", "degree"],
        ["relative_position"], "directed", "X")
    g1 = build_geometric_graph(cfg, pos, vel, rcs, ts)
    g2 = build_geometric_graph(cfg, pos + np.array([123.0, -77.0]), vel,
                               rcs, ts)
    np.testing.assert_array_equal(g1.edges, g2.edges)
    np.testing.assert_allclose(g1.edge_feat, g2.edge_feat, atol=1e-9)
    np.testing.assert_allclose(g1.node_feat, g2.node_feat, atol=1e-9)


def test_rotation_invariant_features():
    """point_pair_features + invariant node features are identical under
    cloud rotation (positions AND velocities rotated)."""
    rng = np.random.default_rng(1)
    pos, vel, rcs, ts = _cloud(rng)
    cfg = GraphConstructionConfiguration(
        "knn", {"k": 5, "r": 1},
        ["rcs", "velocity_vector_length", "degree"],
        ["point_pair_features", "spatial_euclidean_distance"],
        "directed", "X")
    r = _rot(73.0)
    g1 = build_geometric_graph(cfg, pos, vel, rcs, ts)
    g2 = build_geometric_graph(cfg, pos @ r.T, vel @ r.T, rcs, ts)
    np.testing.assert_array_equal(g1.edges, g2.edges)
    np.testing.assert_allclose(g1.edge_feat, g2.edge_feat, atol=1e-7)
    np.testing.assert_allclose(g1.node_feat, g2.node_feat, atol=1e-7)


def test_model_output_invariant_under_translation():
    """End to end: translation-invariant inputs → identical logits."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    pos, vel, rcs, ts = _cloud(rng)
    cfg = GraphConstructionConfiguration(
        "knn", {"k": 5, "r": 1}, ["rcs", "velocity_vector", "degree"],
        ["relative_position"], "directed", "X")
    arch = GNNArchitectureConfig(
        node_feature_dimension=4, edge_feature_dimension=2,
        conv_layer_dimensions=[16, 16],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5], batch_norm_in_mlps=False)
    model = DetNet(arch)

    outs = []
    variables = None
    for shift in (np.zeros(2), np.array([55.0, -31.0])):
        g = build_geometric_graph(cfg, pos + shift, vel, rcs, ts)
        args = (jnp.asarray(g.node_feat, jnp.float32),
                jnp.asarray(g.edge_feat, jnp.float32),
                jnp.asarray(g.senders.astype(np.int32)),
                jnp.asarray(g.receivers.astype(np.int32)))
        if variables is None:
            variables = model.init(jax.random.key(0), *args, train=False)
        cls, bb = model.apply(variables, *args, train=False)
        outs.append((np.asarray(cls), np.asarray(bb)))

    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)
