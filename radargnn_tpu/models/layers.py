"""Message-passing convolution layers (MPNNConv, RadarPointGNNConv).

Capability parity with `gnn/mpnn_layers.py` in /root/reference
(MPNNConv `:11-101`, RadarPointGNNConv `:104-184`), re-designed for TPU:
instead of PyG's propagate/scatter machinery, each layer is one edge-wise
gather + dense MLP (MXU) + masked segment reduction (radargnn_tpu.ops).

Message ordering matches PyG flow="source_to_target" exactly so that weights
transfer 1:1: for an edge (s, r) — r one of s's k nearest neighbors — the
message is pre_mlp([x_r ‖ x_s ‖ e]) (PyG x_i = target = r, x_j = source = s)
and is aggregated at the *receiver* r.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from radargnn_tpu.models.mlp import LinearReluStack, TorchLinear
from radargnn_tpu.models.split_mlp import PreMLPParams, SplitPreMLP
from radargnn_tpu.ops.segment import (
    gather_with_sorted_backward, hoisted_segment_max, segment_reduce,
)

# CSR-tile geometry for the fused Pallas aggregation (must match the
# loader's csr_tiling argument); env-overridable for tuning
import os as _os

FUSED_NODE_BLOCK = int(_os.environ.get("RADARGNN_FUSED_NODE_BLOCK", 256))
FUSED_EDGE_TILE = int(_os.environ.get("RADARGNN_FUSED_EDGE_TILE", 512))
# sender-window width (in node blocks) for the windowed (v3) kernels; the
# loader builds the matching tiling when given a 3-tuple csr_tiling
FUSED_WINDOW_BLOCKS = int(_os.environ.get("RADARGNN_FUSED_WINDOW_BLOCKS", 3))
# receivers per tile for the dense fixed-degree (v4) kernels (tile covers
# R_TILE*k edge slots); max_nodes must be divisible by it. 64 measured
# +0.9% over 32 at the flagship shape (fewer, larger tiles)
FUSED_DENSE_R_TILE = int(_os.environ.get("RADARGNN_FUSED_DENSE_R_TILE", 64))
# in-edge SLOTS per receiver for the dense kernels, as a delta over the
# graph's kNN k: the reference aggregates at the kNN target side so
# in-degree is variable (flagship mean 20 / p90 26); +4 slots keeps the
# over-degree spill ~2.4% (prepare_dense_knn_tiles docstring)
FUSED_DENSE_EXTRA_SLOTS = int(
    _os.environ.get("RADARGNN_FUSED_DENSE_EXTRA_SLOTS", 4))
# backward-only bf16 max-gradient routing in the windowed kernels (see
# make_fused_hoisted_aggregate_v3); None = follow the model config
# (fused_bf16_max, default OFF — strict subgradient-valid routing),
# "0"/"1" forces it off/on for experiments
_BF16_MAX_ENV = _os.environ.get("RADARGNN_FUSED_BF16_MAX")
# spread-tiling run cap (see configs.GNNArchitectureConfig.fused_run_cap);
# "" / unset = follow the model config, "0" forces contiguous CSR runs
_RUN_CAP_ENV = _os.environ.get("RADARGNN_FUSED_RUN_CAP")
# profile-guided windowed-kernel variants (pallas_kernels
# make_fused_hoisted_aggregate_v3 docstring): env-switchable for perf
# experiments; defaults follow the measured winners (r3: precomp_eq ON
# +2.5%; stream_m/sender_dx neutral; bf16_landing/precomp_land -1.5%)
_PRECOMP_EQ = _os.environ.get("RADARGNN_FUSED_PRECOMP_EQ", "1") == "1"
# dense (v4) kernels only: layers NARROWER than this build the window
# one-hot in-kernel instead of consuming the int8 eq stream — the narrow
# layers' kernels are eq-DMA-bound (r4 trace), while the global in-kernel
# build measured -2.9% (the wide layers hide the stream under their MXU
# work). 0 streams everywhere; a large value builds in-kernel everywhere.
_EQ_MIN_WIDTH = int(_os.environ.get("RADARGNN_FUSED_EQ_MIN_WIDTH", "0"))
# dense (v4) kernels: land the overflow backward's d_x through the
# sender-sorted segment-sum kernel when the batch carries the ossum
# tiling. Default OFF — measured r5: 11.34M vs 11.41M (-0.6%): XLA had
# already fused its scatter into the dx part-combine, so the separate
# kernel + [Eo,d] permutation gather lose more than the scatter costs.
# Kept behind the flag for future hardware/geometries.
_OVF_SSUM = _os.environ.get("RADARGNN_FUSED_OVF_SSUM", "0") == "1"
# dense (v4): layers at or below this width skip the Pallas kernels and
# run a pure-XLA reshape-max over the SAME dense slot layout (the
# neighbor-major layout makes the reduction a [T, k, R, H] axis-max — no
# segment ops at all). The narrow layers' kernels are fixed-cost-bound
# (r4 trace); 0 = always use the kernels.
_DENSE_XLA_MAX_WIDTH = int(
    _os.environ.get("RADARGNN_FUSED_DENSE_XLA_MAX_WIDTH", "0"))
_STREAM_M = _os.environ.get("RADARGNN_FUSED_STREAM_M", "0") == "1"
_SENDER_DX = _os.environ.get("RADARGNN_FUSED_SENDER_DX", "0") == "1"
_BF16_LANDING = _os.environ.get("RADARGNN_FUSED_BF16_LANDING", "0") == "1"
_PRECOMP_LAND = _os.environ.get("RADARGNN_FUSED_PRECOMP_LAND", "0") == "1"
_PRECOMP_EQT = _os.environ.get("RADARGNN_FUSED_PRECOMP_EQT", "0") == "1"


def fused_csr_tiling(model_config, k=None):
    """Loader `csr_tiling` spec for a GNNArchitectureConfig, or None when
    the fused path is off. Single source of truth for CLI / benchmarks.

    `fused_tiling: "dense"` (kNN graphs only) needs the graph's kNN degree
    `k` (GraphConstructionConfiguration.k) and returns the dense tiling
    dict; the tuple modes ignore `k`. `"auto"` resolves to dense when `k`
    is given (kNN graph, no halo partitioning — callers pass k=None to
    force windowed) and to windowed otherwise."""
    if not getattr(model_config, "use_fused_aggregation", False):
        return None
    mode = getattr(model_config, "fused_tiling", "windowed")
    if mode == "auto":
        mode = "dense" if k is not None else "windowed"
    if mode == "dense":
        if k is None:
            raise ValueError('fused_tiling "dense" needs the kNN degree k '
                             "(graph_construction.k); pass it to "
                             "fused_csr_tiling")
        # dense overflow carries the over-degree spill (~2.5% at +4 slots)
        # ON TOP of the window overflow the config fraction budgets for,
        # so pad the configured fraction rather than reuse it verbatim
        return {"mode": "dense", "node_block": FUSED_NODE_BLOCK,
                "r_tile": FUSED_DENSE_R_TILE,
                "k": int(k) + FUSED_DENSE_EXTRA_SLOTS,
                "window_blocks": FUSED_WINDOW_BLOCKS,
                # build the sender-sorted overflow tiling only when its
                # consumer is enabled (measured -0.6%, default off) — the
                # shipping path skips the per-sample host sort + arrays
                "ovf_ssum": _OVF_SSUM,
                "ovf_frac": getattr(model_config,
                                    "fused_overflow_fraction", 0.05) + 0.03}
    tiling = (FUSED_NODE_BLOCK, FUSED_EDGE_TILE)
    if mode == "windowed":
        tiling = tiling + (
            FUSED_WINDOW_BLOCKS,
            getattr(model_config, "fused_overflow_fraction", 0.05))
        run_cap = getattr(model_config, "fused_run_cap", None)
        if _RUN_CAP_ENV:
            run_cap = int(_RUN_CAP_ENV) or None
        if run_cap is not None:
            tiling = tiling + (run_cap,)
    return tiling


def _dense_xla_hoisted_max(num_nodes, x, w_s, w_e, offset, tiling,
                           r_tile, k):
    """Pure-XLA hoisted max over the dense slot layout (narrow layers).

    Slot j·R + (r mod R) of tile t = receiver t·R + (r mod R)'s j-th
    in-edge, so the reduction is a [T, k, R, H] axis-max — no segment
    ops, no Pallas. The sender gather and operand ride XLA; overflow
    combines exactly as the kernel path does. Differentiable end-to-end
    (autodiff; max ties share gradient — XLA's own semantics)."""
    import jax

    from radargnn_tpu.ops.pallas_kernels import _NEG, dense_overflow_inner

    sloc, t_win, pmask, ovf_s, ovf_r, ovf_e = tiling.win
    cd = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    x_c = x.astype(cd)
    ws_c = w_s.astype(cd)
    we_c = w_e.astype(cd)
    h = w_s.shape[1]
    op = jnp.dot(x_c[tiling.senders], ws_c,
                 preferred_element_type=jnp.float32) \
        + jnp.dot(tiling.edge_feat.astype(cd), we_c,
                  preferred_element_type=jnp.float32)
    op = jnp.where((sloc >= 0)[:, None], op, _NEG)
    acc = op.reshape(-1, k, r_tile, h).max(axis=1).reshape(num_nodes, h)
    # overflow: the SAME lowering as the kernel path (shared helper)
    inner_o = dense_overflow_inner(x_c, ws_c, ovf_e.astype(cd), we_c,
                                   ovf_s, ovf_r, num_nodes)
    inner = jnp.maximum(acc, inner_o)
    has = inner > _NEG / 2
    return jnp.where(has, offset + inner, 0.0)


def _fused_hoisted_max(num_nodes, x, w_s, w_e, offset, tiling,
                       bf16_max=True):
    """Dispatches the hoisted max aggregation to the fused Pallas kernels:
    windowed v3 when the tiling carries sender windows, v2 CSR otherwise.
    `offset` is the per-receiver additive term hoisted out of the max."""
    if tiling.dense is not None:
        # dense fixed-degree path (v4): kNN graphs have exactly k in-edges
        # per receiver, so aggregation is a (k-1)-fold static-slice max and
        # backward routing a direct per-slice compare — the v3 landing
        # one-hot and inner/g gather matmuls disappear entirely
        # (ops.pallas_kernels.make_fused_dense_aggregate).
        from radargnn_tpu.ops.pallas_kernels import (
            make_fused_dense_aggregate,
        )
        r_tile, k = tiling.dense
        sloc, t_win, pmask, ovf_s, ovf_r, ovf_e = tiling.win
        if x.shape[-1] <= _DENSE_XLA_MAX_WIDTH:
            return _dense_xla_hoisted_max(num_nodes, x, w_s, w_e, offset,
                                          tiling, r_tile, k)
        precomp = _PRECOMP_EQ and x.shape[-1] >= _EQ_MIN_WIDTH
        # r5 experiment knobs compose: ovf_ssum (sender-sorted overflow
        # d_x landing) needs the batch's ossum tiling; sender_dx applies
        # in either mode
        ossum_args = ()
        use_ssum = tiling.ovft is not None and _OVF_SSUM
        eot = 256
        if use_ssum:
            os_perm, os_send, os_blocks = tiling.ovft
            eot = os_perm.shape[0] // os_blocks.shape[0]
            ossum_args = (os_perm, os_send, os_blocks)
        fused = make_fused_dense_aggregate(
            num_nodes, k, r_tile, tiling.node_block,
            window_blocks=pmask.shape[0], bf16_max=bf16_max,
            precomp_eq=precomp, ovf_ssum=use_ssum, ovf_edge_tile=eot,
            sender_dx=_SENDER_DX)
        return fused(x, w_s, tiling.edge_feat, w_e.astype(jnp.float32),
                     offset, ovf_e, t_win, sloc, pmask, ovf_s, ovf_r,
                     *ossum_args)
    if tiling.win is not None:
        # windowed fused path (v3): Morton-ordered nodes put every tile's
        # senders inside a small node window — the E-wide gather AND the
        # backward d_x landing run as in-kernel one-hot MXU matmuls; a few
        # percent of edges overflow to the XLA path (ops.pallas_kernels).
        from radargnn_tpu.ops.pallas_kernels import (
            make_fused_hoisted_aggregate_v3,
        )
        sloc, t_win, pmask, ovf_s, ovf_r, ovf_e = tiling.win
        if (_STREAM_M or _BF16_LANDING or _PRECOMP_LAND) and not bf16_max:
            import warnings
            warnings.warn(
                "RADARGNN_FUSED_{STREAM_M,BF16_LANDING,PRECOMP_LAND} require "
                "bf16_max routing (fused_bf16_max=True or "
                "RADARGNN_FUSED_BF16_MAX=1); ignoring the variant knobs and "
                "running the baseline kernels", stacklevel=2)
        fused = make_fused_hoisted_aggregate_v3(
            num_nodes, tiling.node_block, tiling.edge_tile,
            window_blocks=pmask.shape[0], roll_passes=tiling.roll_passes,
            bf16_max=bf16_max, precomp_eq=_PRECOMP_EQ,
            stream_m=_STREAM_M and bf16_max,
            sender_dx=_SENDER_DX or (_STREAM_M and bf16_max),
            bf16_landing=_BF16_LANDING and bf16_max,
            precomp_land=_PRECOMP_LAND and _BF16_LANDING and bf16_max,
            precomp_eqT=_PRECOMP_EQT)
        return fused(x, w_s, tiling.edge_feat, w_e.astype(jnp.float32),
                     offset, ovf_e, tiling.receivers, tiling.blocks, t_win,
                     sloc, pmask, ovf_s, ovf_r)
    # fused Pallas path (v2): edge data arrives pre-permuted into tile
    # order by the loader (batch.flat_tiling) — the message operand never
    # materializes in HBM, the E-wide gather runs at node width, and the
    # backward gather transpose uses the sender-sorted Pallas segment sum.
    from radargnn_tpu.ops.pallas_kernels import (
        make_fused_hoisted_aggregate_v2,
    )
    ssum = tiling.ssum
    s_perm, s_send, s_blocks = ssum if ssum is not None else (None,) * 3
    fused = make_fused_hoisted_aggregate_v2(
        num_nodes, tiling.node_block, tiling.edge_tile)
    return fused(x, w_s, tiling.edge_feat, w_e.astype(jnp.float32),
                 tiling.senders, tiling.receivers, tiling.blocks,
                 offset, s_perm, s_send, s_blocks)


class _AggregationMixin:
    """Shared masked aggregation with the sorted-scatter and bfloat16
    fast paths (max aggregation is exact in bfloat16; sum/mean stay f32)."""

    def _aggregate(self, m, receivers, num_nodes, edge_mask):
        data = m
        if self.dtype != "float32" and self.aggr == "max":
            data = m.astype(jnp.dtype(self.dtype))
        out = segment_reduce(self.aggr, data, receivers, num_nodes, edge_mask,
                             indices_are_sorted=self.sorted_edges)
        return out.astype(jnp.float32)


class MPNNConv(_AggregationMixin, nn.Module):
    """General MPNN layer with edge features.

    message  m_sr = pre_mlp([x_r ‖ x_s ‖ e_sr])   (edge encoder optional)
    aggregate     = perm-invariant reduce (default max) over incoming edges
    update   h_r  = post_mlp([x_r ‖ aggr_r])
    """

    out_channels: int
    aggr: str = "max"
    pre_layers: int = 1
    post_layers: int = 1
    use_edge_encoder: bool = False
    dtype: str = "float32"
    sorted_edges: bool = False      # receivers non-decreasing (loader layout)
    bf16_max: bool = False          # opt-in bf16 backward max routing

    @nn.compact
    def __call__(self, x: jnp.ndarray, senders: jnp.ndarray,
                 receivers: jnp.ndarray, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None,
                 sender_csr=None, tiling=None, halo=None) -> jnp.ndarray:
        num_nodes = x.shape[0]
        in_channels = x.shape[-1]

        if halo is not None:
            if self.use_edge_encoder or self.pre_layers != 1 \
                    or self.aggr != "max":
                raise ValueError("halo partitioning requires the hoisted "
                                 "configuration: single linear pre-MLP, max "
                                 "aggregation, no conv edge encoder")
            from radargnn_tpu.parallel.halo_windowed import (
                halo_hoisted_max_batched,
            )
            pre_mlp_dim = 2 * in_channels + edge_attr.shape[-1]
            kernel, bias = PreMLPParams(pre_mlp_dim, pre_mlp_dim,
                                        name="pre_mlp")()
            d = in_channels
            w_r, w_s, w_e = kernel[:d], kernel[d:2 * d], kernel[2 * d:]
            cd = jnp.dtype(self.dtype) if self.dtype != "float32" \
                else jnp.float32
            y_r = jnp.dot(x.astype(cd), w_r.astype(cd),
                          preferred_element_type=jnp.float32)
            bf16_max = self.bf16_max if _BF16_MAX_ENV is None \
                else _BF16_MAX_ENV == "1"
            aggr = halo_hoisted_max_batched(
                x, w_s, w_e.astype(jnp.float32), y_r + bias, halo, bf16_max)
            out = jnp.concatenate([x, aggr], axis=-1)
            post_sizes = [self.out_channels] * self.post_layers
            return LinearReluStack(post_sizes, dtype=self.dtype,
                                   name="post_mlp")(out)

        if self.use_edge_encoder:
            encoder = TorchLinear(in_channels, dtype=self.dtype,
                                  name="edge_encoder")
            edge_attr = encoder(edge_attr)
            if tiling is not None:
                win = tiling.win
                if win is not None:
                    sloc, t_win, pmask, ovf_s, ovf_r, ovf_e = win
                    win = (sloc, t_win, pmask, ovf_s, ovf_r, encoder(ovf_e))
                tiling = tiling._replace(edge_feat=encoder(tiling.edge_feat),
                                         win=win)
            pre_mlp_dim = 3 * in_channels
        else:
            pre_mlp_dim = 2 * in_channels + edge_attr.shape[-1]

        if self.pre_layers == 1 and self.aggr == "max":
            # Hoisted fast path: with a single linear pre-MLP, the receiver
            # projection and bias are constant per receiver, so they commute
            # with the max — aggr_r = (x@W_r)[r] + b + max_e((x@W_s)[s]+e@W_e)
            # for non-empty neighborhoods (0 for empty). This removes the
            # receiver-side [E, H] gather from the hot path entirely.
            kernel, bias = PreMLPParams(pre_mlp_dim, pre_mlp_dim,
                                        name="pre_mlp")()
            d = in_channels
            w_r, w_s, w_e = kernel[:d], kernel[d:2 * d], kernel[2 * d:]
            cd = jnp.dtype(self.dtype) if self.dtype != "float32" \
                else jnp.float32

            def mm(a, w):
                return jnp.dot(a.astype(cd), w.astype(cd),
                               preferred_element_type=jnp.float32)

            y_r = mm(x, w_r)
            if tiling is not None:
                bf16_max = self.bf16_max if _BF16_MAX_ENV is None \
                    else _BF16_MAX_ENV == "1"
                aggr = _fused_hoisted_max(num_nodes, x, w_s, w_e,
                                          y_r + bias, tiling, bf16_max)
            else:
                y_s = mm(x, w_s).astype(cd)
                y_e = mm(edge_attr, w_e).astype(cd)
                if sender_csr is not None:
                    # sorted-scatter backward pass for the gather transpose
                    y_s_g = gather_with_sorted_backward(y_s, senders,
                                                        *sender_csr)
                else:
                    y_s_g = y_s[senders]
                inner_operand = y_s_g + y_e
                aggr = hoisted_segment_max(
                    inner_operand, receivers, num_nodes, edge_mask,
                    self.sorted_edges, y_r + bias)
        else:
            m = SplitPreMLP([pre_mlp_dim] * self.pre_layers, in_channels,
                            include_receiver=True, dtype=self.dtype,
                            name="pre_mlp")(x, senders, receivers, edge_attr)
            aggr = self._aggregate(m, receivers, num_nodes, edge_mask)

        out = jnp.concatenate([x, aggr], axis=-1)
        post_sizes = [self.out_channels] * self.post_layers
        return LinearReluStack(post_sizes, dtype=self.dtype,
                               name="post_mlp")(out)


class RadarPointGNNConv(_AggregationMixin, nn.Module):
    """Residual Radar-PointGNN variant: message pre_mlp([x_s ‖ e]); update
    post_mlp([x ‖ m]) + x. Output dim forced equal to input dim."""

    aggr: str = "max"
    pre_layers: int = 1
    post_layers: int = 1
    dtype: str = "float32"
    sorted_edges: bool = False
    bf16_max: bool = False          # opt-in bf16 backward max routing

    @nn.compact
    def __call__(self, x: jnp.ndarray, senders: jnp.ndarray,
                 receivers: jnp.ndarray, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None,
                 tiling=None, halo=None) -> jnp.ndarray:
        num_nodes = x.shape[0]
        node_dim = x.shape[-1]
        pre_mlp_dim = node_dim + edge_attr.shape[-1]

        if halo is not None:
            if self.pre_layers != 1 or self.aggr != "max":
                raise ValueError("halo partitioning requires the hoisted "
                                 "configuration: single linear pre-MLP and "
                                 "max aggregation")
            from radargnn_tpu.parallel.halo_windowed import (
                halo_hoisted_max_batched,
            )
            kernel, bias = PreMLPParams(pre_mlp_dim, pre_mlp_dim,
                                        name="pre_mlp")()
            w_s, w_e = kernel[:node_dim], kernel[node_dim:]
            offset = jnp.broadcast_to(bias, (num_nodes, pre_mlp_dim))
            bf16_max = self.bf16_max if _BF16_MAX_ENV is None \
                else _BF16_MAX_ENV == "1"
            aggr = halo_hoisted_max_batched(
                x, w_s, w_e.astype(jnp.float32), offset, halo, bf16_max)
            out = jnp.concatenate([x, aggr], axis=-1)
            h = LinearReluStack([node_dim] * self.post_layers,
                                dtype=self.dtype, name="post_mlp")(out)
            return h + x

        if self.pre_layers == 1 and self.aggr == "max":
            # Hoisted fast path: message = x_s@W_s + e@W_e + b, so the bias
            # hoists out of the max (there is no receiver term) and the
            # fused kernels apply directly with a constant offset.
            kernel, bias = PreMLPParams(pre_mlp_dim, pre_mlp_dim,
                                        name="pre_mlp")()
            w_s, w_e = kernel[:node_dim], kernel[node_dim:]
            cd = jnp.dtype(self.dtype) if self.dtype != "float32" \
                else jnp.float32

            def mm(a, w):
                return jnp.dot(a.astype(cd), w.astype(cd),
                               preferred_element_type=jnp.float32)

            offset = jnp.broadcast_to(bias, (num_nodes, pre_mlp_dim))
            if tiling is not None:
                bf16_max = self.bf16_max if _BF16_MAX_ENV is None \
                    else _BF16_MAX_ENV == "1"
                aggr = _fused_hoisted_max(num_nodes, x, w_s, w_e, offset,
                                          tiling, bf16_max)
            else:
                operand = mm(x, w_s).astype(cd)[senders] \
                    + mm(edge_attr, w_e).astype(cd)
                aggr = hoisted_segment_max(operand, receivers, num_nodes,
                                           edge_mask, self.sorted_edges,
                                           offset)
        else:
            m = SplitPreMLP([pre_mlp_dim] * self.pre_layers, node_dim,
                            include_receiver=False, dtype=self.dtype,
                            name="pre_mlp")(x, senders, receivers, edge_attr)
            aggr = self._aggregate(m, receivers, num_nodes, edge_mask)

        out = jnp.concatenate([x, aggr], axis=-1)
        post_sizes = [node_dim] * self.post_layers
        h = LinearReluStack(post_sizes, dtype=self.dtype, name="post_mlp")(out)
        return h + x
