"""Split-projection pre-MLP: project node features BEFORE the edge gather.

The reference computes the message MLP on the gathered edge tensor
(`pre_mlp([x_i ‖ x_j ‖ e])`, `gnn/mpnn_layers.py:94-101` in /root/reference),
costing E·(2D+De)·H MACs. Because the first Linear is linear in its
concatenated blocks,

    concat[x_r, x_s, e] @ W  ==  (x @ W_r)[recv] + (x @ W_s)[send] + e @ W_e

with W row-partitioned — so both node projections run once per NODE instead
of once per EDGE: a ~k× FLOP cut on the dominant matmul (k = 20 for the
flagship config) with bit-identical parameters (same `pre_mlp/lin_N/kernel`
layout as the naive stack; only fp summation order differs).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from radargnn_tpu.models.mlp import TorchLinear, torch_linear_init


class _LinearParams(nn.Module):
    """Declares torch-initialized Linear parameters and returns them."""

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        kernel_init, _ = torch_linear_init()
        kernel = self.param("kernel", kernel_init,
                            (self.fan_in, self.features))
        bound = 1.0 / jnp.sqrt(self.fan_in)
        bias = self.param(
            "bias", lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -bound, bound), (self.features,))
        return kernel, bias


class PreMLPParams(nn.Module):
    """Declares the pre-MLP first-layer parameters under the canonical
    `pre_mlp/lin_0` path (used by the hoisted max-aggregation fast path)."""

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        return _LinearParams(self.fan_in, self.features, name="lin_0")()


class SplitPreMLP(nn.Module):
    """The conv pre-MLP with the first layer computed as split projections.

    layer_sizes: output size of each Linear (reference shape: all pre_dim).
    include_receiver: True for MPNNConv ([x_r ‖ x_s ‖ e]), False for
    RadarPointGNNConv ([x_s ‖ e]).
    """

    layer_sizes: Sequence[int]
    node_dim: int
    include_receiver: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, pre_gathered=None):
        d = self.node_dim
        n_node_blocks = 2 if self.include_receiver else 1
        fan_in = n_node_blocks * d + edge_attr.shape[-1]
        kernel, bias = _LinearParams(fan_in, self.layer_sizes[0],
                                     name="lin_0")()

        def mm(a, w):
            if self.dtype != "float32":
                cd = jnp.dtype(self.dtype)
                return jnp.dot(a.astype(cd), w.astype(cd),
                               preferred_element_type=jnp.float32)
            return a @ w

        if self.include_receiver:
            w_r, w_s, w_e = kernel[:d], kernel[d:2 * d], kernel[2 * d:]
            m = (mm(x, w_r)[receivers] + mm(x, w_s)[senders]
                 + mm(edge_attr, w_e) + bias)
        else:
            w_s, w_e = kernel[:d], kernel[d:]
            m = mm(x, w_s)[senders] + mm(edge_attr, w_e) + bias

        for i, size in enumerate(self.layer_sizes[1:], start=1):
            m = nn.relu(m)
            m = TorchLinear(size, dtype=self.dtype, name=f"lin_{i}")(m)
        return m
