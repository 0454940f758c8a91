"""On-device (jit) graph construction from raw point clouds.

The reference can only train on graphs precomputed offline (PyG `.pt` files,
SURVEY.md §1 L2). This module is the TPU-native extension: one jitted
function turns padded raw point-cloud frames into a full `GraphBatch` on
device — kNN via a dense-distance MXU matmul + `lax.top_k`, invariant edge /
node features as vectorized trig (the shared formulas of
radargnn_tpu.graph.features with `xp=jnp`). Enables streaming training
without a dataset-creation pass.

Semantics match the host pipeline (tests/test_online_graph.py) with one
noted deviation: the host `time_index` ranks raw timestamps via numpy
`unique`; the jit version computes the identical dense rank with a
sort-based method.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from radargnn_tpu.configs import GraphConstructionConfiguration
from radargnn_tpu.graph import features as F
from radargnn_tpu.graph.batch import GraphBatch
from radargnn_tpu.ops.knn import knn_graph, radius_graph


def time_index_device(timestamps: jnp.ndarray,
                      valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense rank of each timestamp among the frame's unique timestamps.

    jit-safe equivalent of `features.time_index_feature` (host numpy):
    sort, flag value changes, cumulative-sum the flags, un-sort.
    """
    ts = timestamps.reshape(-1)
    if valid is not None:
        # push padded entries to the end so they can't create ranks below
        # valid ones
        big = jnp.max(jnp.where(valid, ts, -jnp.inf)) + 1.0
        ts = jnp.where(valid, ts, big)
    order = jnp.argsort(ts)
    sorted_ts = ts[order]
    changed = jnp.concatenate(
        [jnp.zeros((1,), sorted_ts.dtype),
         (sorted_ts[1:] != sorted_ts[:-1]).astype(sorted_ts.dtype)])
    ranks_sorted = jnp.cumsum(changed)
    ranks = jnp.zeros_like(ranks_sorted).at[order].set(ranks_sorted)
    return ranks.astype(jnp.float32)


def _edge_features_device(config, pos, vel, senders, receivers):
    return F.edge_features(config.edge_features, config.edge_mode,
                           pos, vel, senders, receivers, xp=jnp)


def _node_features_device(config, pos, vel, rcs, timestamps, senders,
                          receivers, edge_mask, valid):
    inv = {}
    if rcs is not None:
        inv["rcs"] = rcs.reshape(-1, 1)
    if "time_index" in config.node_features:
        inv["time_index"] = time_index_device(timestamps, valid).reshape(-1, 1)
    return F.node_features(config.node_features, pos, vel, inv,
                           senders, receivers, edge_mask, xp=jnp)


def make_online_graph_builder(config: GraphConstructionConfiguration,
                              bg_index: int = 5, max_degree: int = 32):
    """Returns a jitted builder closed over the (unhashable) config."""
    return jax.jit(partial(build_graph_batch_on_device, config,
                           bg_index=bg_index, max_degree=max_degree))


def build_graph_batch_on_device(config: GraphConstructionConfiguration,
                                pos: jnp.ndarray, vel: jnp.ndarray,
                                rcs: jnp.ndarray, timestamps: jnp.ndarray,
                                valid: jnp.ndarray,
                                labels: Optional[jnp.ndarray] = None,
                                boxes: Optional[jnp.ndarray] = None,
                                bg_index: int = 5,
                                max_degree: int = 32) -> GraphBatch:
    """Raw padded frames → GraphBatch, entirely on device (jit via
    `make_online_graph_builder`).

    Args (leading G axis everywhere):
        pos [G, N, 2], vel [G, N, 2], rcs [G, N], timestamps [G, N],
        valid [G, N] bool; optional labels [G, N] / boxes [G, N, B]
        (for evaluation-only use they default to background / NaN).
        config must be hashable-static (dataclass instance reused across
        calls to avoid recompiles).

    Note: `degree` uses the directed-edge symmetrized adjacency over the
    padded node set (dense [N, N] bool per graph — fine at frame scale).
    """
    g, n, _ = pos.shape

    def one(pos_i, vel_i, rcs_i, ts_i, valid_i):
        if config.distance_definition == "X":
            basis = pos_i
        elif config.distance_definition == "XV":
            basis = jnp.concatenate([pos_i, vel_i], axis=1)
        else:
            raise ValueError(config.distance_definition)

        if config.graph_construction_algorithm == "knn":
            senders, receivers, edge_mask = knn_graph(basis, config.k, valid_i)
        elif config.graph_construction_algorithm == "radius":
            senders, receivers, edge_mask = radius_graph(
                basis, config.r, max_degree, valid_i)
        else:
            raise ValueError(config.graph_construction_algorithm)

        e_feat = _edge_features_device(config, pos_i, vel_i, senders,
                                       receivers)
        e_feat = jnp.where(edge_mask[:, None], e_feat, 0.0)
        n_feat = _node_features_device(config, pos_i, vel_i, rcs_i, ts_i,
                                       senders, receivers, edge_mask, valid_i)
        n_feat = jnp.where(valid_i[:, None], n_feat, 0.0)
        return (n_feat.astype(jnp.float32), e_feat.astype(jnp.float32),
                senders, receivers, edge_mask)

    n_feat, e_feat, senders, receivers, edge_mask = jax.vmap(one)(
        pos, vel, rcs, timestamps, valid)

    if labels is None:
        labels = jnp.full((g, n), bg_index, jnp.int32)
    labels = jnp.where(valid, labels, bg_index).astype(jnp.int32)
    if boxes is None:
        boxes = jnp.full((g, n, 5), jnp.nan, jnp.float32)

    return GraphBatch(
        node_feat=n_feat, edge_feat=e_feat,
        senders=senders.astype(jnp.int32),
        receivers=receivers.astype(jnp.int32),
        node_mask=valid, edge_mask=edge_mask,
        labels=labels, boxes=boxes,
        pos=pos.astype(jnp.float32), vel=vel.astype(jnp.float32))
