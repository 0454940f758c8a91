"""DetNet — end-to-end detection + semantic-segmentation GNN.

Capability parity with `DetNetBasic` (`gnn/gnn_models.py:15-134` in
/root/reference): optional node/edge embedding MLPs → stack of conv layers,
each followed by BatchNorm + ReLU (edge features are reused un-re-embedded at
every layer) → two MLP heads (classification logits — softmax lives in the
loss — and box regression).

TPU-native differences: the model operates on flattened padded GraphBatch
arrays ([G·N, Dn] nodes, [G·E, De] edges, global flat edge indices) with
validity masks; BatchNorm is masked; everything is one jittable function of
(params, batch_stats) — no Python module state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from radargnn_tpu.configs import GNNArchitectureConfig
from radargnn_tpu.graph.batch import GraphBatch
from radargnn_tpu.models.mlp import MLP, MaskedBatchNorm
from radargnn_tpu.models.layers import MPNNConv, RadarPointGNNConv


class DetNet(nn.Module):
    """Graph network for per-point classification + bounding-box regression."""

    config: GNNArchitectureConfig

    @nn.compact
    def __call__(self, node_feat: jnp.ndarray, edge_feat: jnp.ndarray,
                 senders: jnp.ndarray, receivers: jnp.ndarray,
                 node_mask: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 train: bool = True, tiling=None, halo=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        dtype = getattr(cfg, "compute_dtype", "float32")
        sorted_edges = getattr(cfg, "assume_sorted_edges", False)
        x = node_feat
        e = edge_feat

        if halo is not None:
            # Halo-partitioned (data × model mesh) path: node arrays arrive
            # SHARD-MAJOR flat (trainer permutes them); edge features ride
            # pre-gathered in the halo bundle in per-shard tile order, so
            # the embedding runs directly in that layout and the conv layers
            # consume the bundle instead of senders/receivers.
            tiling = None
            g_, p_, tt_, de_ = halo.e_t.shape
            eo_ = halo.e_ovf.shape[2]
            e_t = halo.e_t.reshape(-1, de_)
            e_ovf = halo.e_ovf.reshape(-1, de_)
            if cfg.initial_edge_feature_embedding:
                dims = list(cfg.edge_feature_embedding_layer_dimensions)
                emb = MLP(dims[-1], dims[:-1], cfg.batch_norm_in_mlps, dtype,
                          name="edge_emb_mlp")
                e_t = emb(e_t, (halo.recv_t >= 0).reshape(-1), train)
                e_ovf = emb(e_ovf, (halo.ovf_r >= 0).reshape(-1), train)
            if dtype != "float32":
                cd = jnp.dtype(dtype)
                e_t = e_t.astype(cd)
                e_ovf = e_ovf.astype(cd)
            halo = halo.replace_edge_feat(
                e_t.reshape(g_, p_, tt_, -1), e_ovf.reshape(g_, p_, eo_, -1))
            e = e_t     # layers size their pre-MLP from edge_attr's width

        if cfg.initial_node_feature_embedding:
            dims = list(cfg.node_feature_embedding_layer_dimensions)
            x = MLP(dims[-1], dims[:-1], cfg.batch_norm_in_mlps, dtype,
                    name="node_emb_mlp")(x, node_mask, train)

        # note: routing the sender-gather backward through a pre-sorted
        # segment-sum (ops.gather_with_sorted_backward) measured ~4% SLOWER
        # end-to-end than XLA's unsorted scatter-add — the per-step argsort
        # costs more than the sorted scatter saves (docs/RESULTS.md).
        sender_csr = None
        if not getattr(cfg, "use_fused_aggregation", False) \
                or cfg.conv_layer_type not in ("MPNNConv",
                                               "RadarPointGNNConv") \
                or cfg.conv_pre_mlp_layer_number != 1 \
                or cfg.aggregation_function != "max":
            # the fused kernels implement the single-linear-pre-MLP max
            # aggregation only; other configurations take the XLA path
            tiling = None

        if tiling is not None:
            # Fused path: the loader delivers edge data pre-permuted into
            # CSR-tile order (batch.flat_tiling), so the embedding MLP runs
            # directly in that layout and NO per-layer edge permutation
            # gather/scatter ever appears in the step (it was 48% of the
            # profile, docs/RESULTS.md).
            edge_mask_t = tiling.receivers >= 0
            e_t = tiling.edge_feat
            win = tiling.win
            if cfg.initial_edge_feature_embedding:
                dims = list(cfg.edge_feature_embedding_layer_dimensions)
                emb = MLP(dims[-1], dims[:-1], cfg.batch_norm_in_mlps, dtype,
                          name="edge_emb_mlp")
                e_t = emb(e_t, edge_mask_t, train)
                if win is not None:
                    # windowed mode: overflow edge features ride the same
                    # embedding (shared parameters, flax reuses the module)
                    sloc, t_win, pmask, ovf_s, ovf_r, ovf_e = win
                    ovf_e = emb(ovf_e, ovf_r >= 0, train)
                    win = (sloc, t_win, pmask, ovf_s, ovf_r, ovf_e)
            if win is not None and dtype != "float32":
                # cast edge features to the compute dtype ONCE: every layer's
                # windowed kernel streams them at half width and returns
                # compute-dtype d_e (the cast's VJP restores f32 for the
                # embedding backward)
                cd = jnp.dtype(dtype)
                e_t = e_t.astype(cd)
                sloc, t_win, pmask, ovf_s, ovf_r, ovf_e = win
                win = (sloc, t_win, pmask, ovf_s, ovf_r, ovf_e.astype(cd))
            tiling = tiling._replace(edge_feat=e_t, win=win)
            # layers size their pre-MLP from edge_attr's width; in fused
            # mode the tiled embedded features are the edge features
            e = e_t
            edge_mask = edge_mask_t
        elif cfg.initial_edge_feature_embedding and halo is None:
            dims = list(cfg.edge_feature_embedding_layer_dimensions)
            e = MLP(dims[-1], dims[:-1], cfg.batch_norm_in_mlps, dtype,
                    name="edge_emb_mlp")(e, edge_mask, train)

        for i, layer_dim in enumerate(cfg.conv_layer_dimensions):
            if cfg.conv_layer_type == "MPNNConv":
                x = MPNNConv(out_channels=layer_dim,
                             aggr=cfg.aggregation_function,
                             pre_layers=cfg.conv_pre_mlp_layer_number,
                             post_layers=cfg.conv_post_mlp_layer_number,
                             use_edge_encoder=cfg.conv_use_edge_encoder,
                             dtype=dtype, sorted_edges=sorted_edges,
                             bf16_max=getattr(cfg, "fused_bf16_max", False),
                             name=f"conv_{i}")(x, senders, receivers, e,
                                               edge_mask, sender_csr, tiling,
                                               halo)
            elif cfg.conv_layer_type == "RadarPointGNNConv":
                x = RadarPointGNNConv(
                    aggr=cfg.aggregation_function,
                    pre_layers=cfg.conv_pre_mlp_layer_number,
                    post_layers=cfg.conv_post_mlp_layer_number,
                    dtype=dtype, sorted_edges=sorted_edges,
                    bf16_max=getattr(cfg, "fused_bf16_max", False),
                    name=f"conv_{i}")(x, senders, receivers, e, edge_mask,
                                      tiling, halo)
            else:
                raise ValueError(
                    f"{cfg.conv_layer_type} is invalid GNN conv layer type. "
                    f"Chose either MPNNConv or RadarPointGNNConv")
            x = MaskedBatchNorm(name=f"bn_{i}")(x, node_mask, train)
            x = nn.relu(x)

        cls_dims = list(cfg.classification_head_layer_dimensions)
        cls = MLP(cls_dims[-1], cls_dims[:-1], cfg.batch_norm_in_mlps, dtype,
                  name="classification_head")(x, node_mask, train)

        reg_dims = list(cfg.regression_head_layer_dimensions)
        bb = MLP(reg_dims[-1], reg_dims[:-1], cfg.batch_norm_in_mlps, dtype,
                 name="regression_head")(x, node_mask, train)

        return cls, bb

    def apply_to_batch(self, variables, batch: GraphBatch, train: bool = False,
                       **kwargs):
        """Convenience: run on a GraphBatch, returning [G, N, ...] outputs."""
        g, n = batch.node_mask.shape
        from radargnn_tpu.models.layers import FUSED_NODE_BLOCK
        tiling = batch.flat_tiling(FUSED_NODE_BLOCK) \
            if getattr(self.config, "use_fused_aggregation", False) else None
        out = self.apply(
            variables, batch.flat_nodes(), batch.flat_edges(),
            batch.flat_senders(), batch.flat_receivers(),
            batch.node_mask.reshape(-1), batch.edge_mask.reshape(-1),
            train=train, tiling=tiling, **kwargs)
        if train and kwargs.get("mutable"):
            (cls, bb), updates = out
            return (cls.reshape(g, n, -1), bb.reshape(g, n, -1)), updates
        cls, bb = out
        return cls.reshape(g, n, -1), bb.reshape(g, n, -1)


def create_detnet_state(config: GNNArchitectureConfig, rng: jax.Array,
                        example_batch: GraphBatch):
    """Initializes (params, batch_stats) for a DetNet from an example batch."""
    model = DetNet(config)
    variables = model.init(
        rng, example_batch.flat_nodes(), example_batch.flat_edges(),
        example_batch.flat_senders(), example_batch.flat_receivers(),
        example_batch.node_mask.reshape(-1), example_batch.edge_mask.reshape(-1),
        train=False)
    return model, variables
