"""On-device graph construction vs the host pipeline."""

import numpy as np
import jax.numpy as jnp

from radargnn_tpu.configs import GraphConstructionConfiguration
from radargnn_tpu.graph.build import build_geometric_graph
from radargnn_tpu.graph.online import (
    build_graph_batch_on_device, make_online_graph_builder, time_index_device,
)


def _frames(rng, g=2, n_valid=60, n_pad=64):
    pos = np.zeros((g, n_pad, 2), np.float32)
    vel = np.zeros((g, n_pad, 2), np.float32)
    rcs = np.zeros((g, n_pad), np.float32)
    ts = np.zeros((g, n_pad), np.float32)
    valid = np.zeros((g, n_pad), bool)
    for i in range(g):
        pos[i, :n_valid] = rng.normal(size=(n_valid, 2)) * 10
        vel[i, :n_valid] = rng.normal(size=(n_valid, 2)) * 3
        rcs[i, :n_valid] = rng.normal(size=n_valid)
        ts[i, :n_valid] = np.repeat(np.arange(4), n_valid // 4)[:n_valid]
        valid[i, :n_valid] = True
    return pos, vel, rcs, ts, valid


def test_time_index_device_matches_host():
    from radargnn_tpu.graph.features import time_index_feature

    rng = np.random.default_rng(0)
    ts = rng.integers(100, 110, 50).astype(np.float64)
    host = time_index_feature(ts).reshape(-1)
    dev = np.asarray(time_index_device(jnp.asarray(ts)))
    np.testing.assert_allclose(dev, host)


def test_online_graph_matches_host_pipeline():
    rng = np.random.default_rng(1)
    config = GraphConstructionConfiguration(
        "knn", {"k": 5, "r": 1.0},
        ["rcs", "velocity_vector", "time_index", "degree"],
        ["relative_position"], "directed", "X")

    pos, vel, rcs, ts, valid = _frames(rng, g=2, n_valid=60, n_pad=64)
    builder = make_online_graph_builder(config)
    batch = builder(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rcs),
                    jnp.asarray(ts), jnp.asarray(valid))

    for gi in range(2):
        host = build_geometric_graph(
            config, pos[gi, :60].astype(np.float64),
            vel[gi, :60].astype(np.float64),
            rcs=rcs[gi, :60], timestamps=ts[gi, :60])

        dev_edges = {(int(s), int(r)) for s, r, m in zip(
            np.asarray(batch.senders[gi]), np.asarray(batch.receivers[gi]),
            np.asarray(batch.edge_mask[gi])) if m}
        host_edges = set(map(tuple, host.edges.tolist()))
        assert dev_edges == host_edges

        # per-edge features must agree (match rows by edge pair)
        dev_feat = {}
        for s, r, m, f in zip(np.asarray(batch.senders[gi]),
                              np.asarray(batch.receivers[gi]),
                              np.asarray(batch.edge_mask[gi]),
                              np.asarray(batch.edge_feat[gi])):
            if m:
                dev_feat[(int(s), int(r))] = f
        for (s, r), f_host in zip(map(tuple, host.edges.tolist()),
                                  host.edge_feat):
            np.testing.assert_allclose(dev_feat[(s, r)], f_host,
                                       rtol=1e-4, atol=1e-4)

        # node features for valid nodes
        np.testing.assert_allclose(
            np.asarray(batch.node_feat[gi][:60]), host.node_feat,
            rtol=1e-4, atol=1e-4)


def test_online_graph_radius():
    rng = np.random.default_rng(2)
    config = GraphConstructionConfiguration(
        "radius", {"k": 5, "r": 6.0}, ["rcs"],
        ["spatial_euclidean_distance"], "directed", "X")
    pos, vel, rcs, ts, valid = _frames(rng, g=1, n_valid=40, n_pad=48)
    batch = build_graph_batch_on_device(
        config, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rcs),
        jnp.asarray(ts), jnp.asarray(valid), max_degree=16)
    s = np.asarray(batch.senders[0])
    r = np.asarray(batch.receivers[0])
    m = np.asarray(batch.edge_mask[0])
    d = np.linalg.norm(pos[0][s] - pos[0][r], axis=1)
    assert (d[m] <= 6.0 + 1e-4).all()
    assert m.any()
