"""Halo partitioning composed with the windowed Pallas kernels.

`parallel/halo.py` ships boundary sender features with one `all_to_all` and
reduces each shard's edges with XLA segment ops. This module swaps the
per-shard LOCAL reduction for the windowed fused Pallas path
(docs/KERNELS.md) — the single-chip hot-path kernels — by exploiting the
fused op's existing overflow machinery:

  * each shard's received halo buffer is appended to its own node rows
    (`x_aug = [x_own ‖ halo]`), and
  * halo edges (plus the local edges the sender windows miss) ride the fused
    op's fixed-budget XLA overflow list with senders pointing into the
    augmented rows.

So the windowed kernels run UNCHANGED per shard, the halo exchange stays one
`all_to_all` whose transfer overlaps the local tile compute, and gradients
flow end-to-end (the `all_to_all` transpose is the reverse `all_to_all`;
`jax.grad` of the shard_map body handles the concat/slice plumbing).

Host planning (`build_halo_windowed_plan`) is static per bucket — every
shard gets identical array shapes (shared tile/overflow budgets), so the
sharded step jits once. No reference equivalent exists (SURVEY.md §2c);
this is the production path for point clouds whose edge set exceeds one
chip.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from radargnn_tpu.parallel.halo import HaloPlan, build_halo_plan, _round_up


@dataclasses.dataclass(frozen=True)
class HaloWindowedPlan:
    """Static per-bucket plan: halo exchange + per-shard windowed tilings.

    All per-shard arrays share one static shape (common tile / overflow
    budgets). n_aug = Ns + P·B rows per shard: own nodes then the received
    halo buffer; overflow senders index into those augmented rows.
    """
    halo: HaloPlan
    node_block: int
    edge_tile: int
    window_blocks: int
    n_aug: int
    roll_passes: int
    tile_blocks: np.ndarray    # [P, T]
    tile_win: np.ndarray       # [P, T]
    recv_t: np.ndarray         # [P, T·TE] shard-local receiver, -1 pad
    sloc: np.ndarray           # [P, T·TE] window-local sender, -1 pad
    part_mask: np.ndarray      # [P, WB, NBLK]
    tile_eperm: np.ndarray     # [P, T·TE] into the ORIGINAL edge arrays
    ovf_s: np.ndarray          # [P, Eo] augmented-row sender
    ovf_r: np.ndarray          # [P, Eo] shard-local receiver, -1 pad
    ovf_eperm: np.ndarray      # [P, Eo] into the ORIGINAL edge arrays


def build_halo_windowed_plan(senders: np.ndarray, receivers: np.ndarray,
                             num_nodes: int, num_shards: int,
                             node_block: int = 16, edge_tile: int = 32,
                             window_blocks: int = 2,
                             edge_mask: Optional[np.ndarray] = None,
                             ovf_frac: float = 0.5,
                             pad_align: int = 8,
                             budgets: Optional[dict] = None,
                             run_cap: Optional[int] = None
                             ) -> HaloWindowedPlan:
    """Plans the halo exchange and a windowed CSR tiling per shard.

    `ovf_frac` budgets the per-shard WINDOW overflow (local edges whose
    sender misses the Morton window) relative to the local-edge budget; the
    halo edges are appended after it. Call with Morton-ordered nodes to keep
    both the boundary and the window overflow small.

    `budgets` overrides the derived static shapes with dataset-wide maxima
    so every sample's plan is identical-shape (one jitted executable):
    keys halo_b / loc_width / halo_width / tiles / roll_passes, as returned
    by `plan_budgets(plan)`.
    """
    from radargnn_tpu.ops.pallas_kernels import (
        prepare_windowed_csr_tiles, window_part_mask,
    )

    budgets = budgets or {}
    hp = build_halo_plan(senders, receivers, num_nodes, num_shards,
                         edge_mask, pad_align,
                         halo_b=budgets.get("halo_b"),
                         loc_width=budgets.get("loc_width"),
                         halo_width=budgets.get("halo_width"))
    p_n, ns = hp.num_shards, hp.nodes_per_shard
    b = hp.send_idx.shape[-1]
    # augmented row count rounds up to the node block so batched callers can
    # concatenate per-graph augmented arrays tile-aligned
    n_aug = _round_up(ns + p_n * b, node_block)
    nblocks = n_aug // node_block
    el = hp.loc_senders.shape[1]
    eh = hp.halo_senders.shape[1]
    win_budget = max(edge_tile, _round_up(max(int(el * ovf_frac), 1),
                                          edge_tile))

    # pass 1: per-shard tilings; find the common tile budget + roll bound
    tmax = budgets.get("tiles", 1)
    rp = ((run_cap - 1).bit_length() if run_cap is not None
          else budgets.get("roll_passes", 1))
    for p in range(p_n):
        ls, lr = hp.loc_senders[p], hp.loc_receivers[p]
        mask = lr >= 0
        try:
            prep = prepare_windowed_csr_tiles(
                np.maximum(ls, 0), np.maximum(lr, 0), mask, n_aug,
                node_block, edge_tile, window_blocks, None, win_budget,
                run_cap=run_cap)
        except ValueError as e:
            raise ValueError(
                f"shard {p}/{p_n}: {e}. The halo window-overflow budget is "
                f"{win_budget} edges (= halo_overflow_fraction={ovf_frac} of "
                f"the {el}-edge local budget, tile-rounded); raise "
                f"halo_overflow_fraction in the MODEL_ARCHITECTURE config "
                f"(or widen window_blocks) and retry") from e
        tmax = max(tmax, len(prep[1]))
        if run_cap is None and mask.any():
            deg = int(np.bincount(lr[mask], minlength=ns).max())
            rp = max(rp, int(np.ceil(np.log2(max(2, deg)))))
    if "tiles" in budgets and tmax > budgets["tiles"]:
        raise ValueError(f"tile override {budgets['tiles']} < required {tmax}")

    # pass 2: re-tile with the shared budget so every shard's shapes match
    tile_blocks, tile_win, recv_t, sloc = [], [], [], []
    pmask, tile_eperm, ovf_s, ovf_r, ovf_eperm = [], [], [], [], []
    for p in range(p_n):
        ls, lr = hp.loc_senders[p], hp.loc_receivers[p]
        mask = lr >= 0
        (perm, blocks, precv, psloc, twin, ovf_idx) = \
            prepare_windowed_csr_tiles(
                np.maximum(ls, 0), np.maximum(lr, 0), mask, n_aug,
                node_block, edge_tile, window_blocks, tmax, win_budget,
                run_cap=run_cap)
        tile_blocks.append(blocks)
        tile_win.append(twin)
        recv_t.append(precv)
        sloc.append(psloc)
        pmask.append(window_part_mask(twin, nblocks,
                                      min(window_blocks, nblocks)))
        # tiled local edges -> original edge ids (dummy slots: edge 0,
        # receiver -1 keeps them dead)
        tile_eperm.append(hp.loc_edge_perm[p][perm])
        # overflow list = window-overflow local edges, then halo edges
        ov = ovf_idx >= 0
        ovc = np.maximum(ovf_idx, 0)
        o_s = np.where(ov, ls[ovc], 0)
        o_r = np.where(ov, lr[ovc], -1)
        o_e = np.where(ov, hp.loc_edge_perm[p][ovc], 0)
        hv = hp.halo_senders[p] >= 0
        h_s = np.where(hv, ns + np.maximum(hp.halo_senders[p], 0), 0)
        h_r = np.where(hv, hp.halo_receivers[p], -1)
        h_e = np.where(hv, hp.halo_edge_perm[p], 0)
        ovf_s.append(np.concatenate([o_s, h_s]))
        ovf_r.append(np.concatenate([o_r, h_r]))
        ovf_eperm.append(np.concatenate([o_e, h_e]))

    return HaloWindowedPlan(
        hp, node_block, edge_tile, min(window_blocks, nblocks), n_aug, rp,
        np.stack(tile_blocks).astype(np.int32),
        np.stack(tile_win).astype(np.int32),
        np.stack(recv_t).astype(np.int32),
        np.stack(sloc).astype(np.int32),
        np.stack(pmask),
        np.stack(tile_eperm).astype(np.int32),
        np.stack(ovf_s).astype(np.int32),
        np.stack(ovf_r).astype(np.int32),
        np.stack(ovf_eperm).astype(np.int32))


def plan_budgets(plan: HaloWindowedPlan) -> dict:
    """Static-shape budgets of a plan, in `build_halo_windowed_plan`'s
    `budgets` format. Merge across a dataset with `merge_budgets` and rebuild
    so every sample's plan shares one shape (one compiled executable)."""
    return dict(halo_b=plan.halo.send_idx.shape[-1],
                loc_width=plan.halo.loc_senders.shape[1],
                halo_width=plan.halo.halo_senders.shape[1],
                tiles=plan.tile_blocks.shape[1],
                roll_passes=plan.roll_passes)


def merge_budgets(budgets_list) -> dict:
    return {k: max(b[k] for b in budgets_list) for k in budgets_list[0]}


def shard_major_nodes(a: jnp.ndarray, num_graphs: int, max_nodes: int,
                      dp: int, mp: int) -> jnp.ndarray:
    """Permutes batched node arrays [G, N, ...] into shard-major flat order
    [(d, m, g_local, n_local), ...] so that a flat sharding
    P(("data", "model")) hands each (data, model) device a contiguous row
    block holding ITS graphs' node partitions. A pure transpose — message
    passing and the masked losses/BatchNorm are node-order-free."""
    gl, ns = num_graphs // dp, max_nodes // mp
    a4 = a.reshape((dp, gl, mp, ns) + a.shape[2:])
    a4 = jnp.transpose(a4, (0, 2, 1, 3) + tuple(range(4, a4.ndim)))
    return a4.reshape((num_graphs * max_nodes,) + a.shape[2:])


@struct.dataclass
class HaloBundle:
    """Device-side stacked halo plans for a GraphBatch: every array has
    leading axes [G, P] (graph, model shard) so `in_specs P("data",
    "model")` hands each device its own graphs' shard rows. Built by
    `GraphBatch.flat_halo`; consumed by `halo_windowed_hoisted_max_batched`.
    """
    send_idx: jnp.ndarray       # [G, P, P, B]
    e_t: jnp.ndarray            # [G, P, T·TE, De] tile-ordered edge features
    e_ovf: jnp.ndarray          # [G, P, Eo, De]
    recv_t: jnp.ndarray         # [G, P, T·TE] shard-local receiver, -1 pad
    tile_blocks: jnp.ndarray    # [G, P, T]
    tile_win: jnp.ndarray       # [G, P, T]
    sloc: jnp.ndarray           # [G, P, T·TE] window-local sender, -1 pad
    part_mask: jnp.ndarray      # [G, P, WB, NBLK]
    ovf_s: jnp.ndarray          # [G, P, Eo] augmented-row sender
    ovf_r: jnp.ndarray          # [G, P, Eo] shard-local receiver, -1 pad
    # (node_block, edge_tile, window_blocks, n_aug, roll_passes, dp, mp,
    #  nodes_per_shard, halo_b) — static; trainer reads dp/mp at [5]/[6]
    geometry: tuple = struct.field(pytree_node=False, default=None)
    mesh: object = struct.field(pytree_node=False, default=None)

    def replace_edge_feat(self, e_t, e_ovf):
        return self.replace(e_t=e_t, e_ovf=e_ovf)


def halo_hoisted_max_batched(x: jnp.ndarray, w_s: jnp.ndarray,
                             w_e: jnp.ndarray, offset: jnp.ndarray,
                             bundle: "HaloBundle",
                             bf16_max: bool = False) -> jnp.ndarray:
    """Dispatches halo aggregation by the bundle's kernel family: dense
    (v4) when the plan geometry carries the trailing "dense" marker
    (parallel/halo_dense.py — kNN graphs, the headline family), windowed
    (v3) otherwise. Call sites (models/layers.py) stay family-agnostic."""
    if len(bundle.geometry) > 9 and bundle.geometry[9] == "dense":
        from radargnn_tpu.parallel.halo_dense import (
            halo_dense_hoisted_max_batched,
        )
        return halo_dense_hoisted_max_batched(x, w_s, w_e, offset, bundle,
                                              bf16_max)
    return halo_windowed_hoisted_max_batched(x, w_s, w_e, offset, bundle,
                                             bf16_max)


def halo_windowed_hoisted_max_batched(x: jnp.ndarray, w_s: jnp.ndarray,
                                      w_e: jnp.ndarray, offset: jnp.ndarray,
                                      bundle: HaloBundle,
                                      bf16_max: bool = False) -> jnp.ndarray:
    """Batched halo aggregation over a (data × model) mesh.

        out[g, n] = offset[g, n] + max over edges e->n in graph g of
                    (x[g, send(e)] @ w_s + e_feat[e] @ w_e),  0 if no edges

    `x` / `offset` are SHARD-MAJOR flat node arrays [G·N, D] / [G·N, H]
    (see shard_major_nodes) sharded P(("data", "model")); each device runs
    the windowed Pallas kernels over its local graphs' shard with one
    all_to_all (over "model") for boundary sender features, issued before
    the tile compute so the ICI transfer overlaps it. Fully differentiable
    (the all_to_all transposes to the reverse all_to_all; weight cotangents
    psum over the mesh automatically).
    """
    from radargnn_tpu.ops.pallas_kernels import make_fused_hoisted_aggregate_v3

    (node_block, edge_tile, window_blocks, n_aug, roll_passes, dp, mp, ns,
     b) = bundle.geometry
    mesh = bundle.mesh
    g_total = bundle.send_idx.shape[0]
    gl = g_total // dp                     # graphs per data shard
    nblocks = n_aug // node_block
    d = x.shape[-1]
    h = w_s.shape[1]
    raw_aug = ns + mp * b                  # pre-padding augmented rows

    fused = make_fused_hoisted_aggregate_v3(
        gl * n_aug, node_block, edge_tile, window_blocks,
        roll_passes=roll_passes, bf16_max=bf16_max, ovf_sorted=False)

    plan_arrays = (bundle.send_idx, bundle.e_t, bundle.e_ovf, bundle.recv_t,
                   bundle.tile_blocks, bundle.tile_win, bundle.sloc,
                   bundle.part_mask, bundle.ovf_s, bundle.ovf_r)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(("data", "model")), P(("data", "model")))
             + (P("data", "model"),) * len(plan_arrays) + (P(), P()),
             out_specs=P(("data", "model")), check_vma=False)
    def step(x_own, off_own, send, e_t, e_ovf, recv_t, tblocks, twin,
             sloc_, pmask_, ovf_s_, ovf_r_, w_s_, w_e_):
        # drop the sharded-to-1 model axis; leading axis = local graphs
        send = send[:, 0]                          # [gl, P, B]
        x_g = x_own.reshape(gl, ns, d)
        # 1) boundary exchange first — the tile compute has no dependency on
        #    the halo rows (they only feed the overflow list), so the ICI
        #    transfer overlaps the local tile work
        flat_idx = (jnp.maximum(send, 0)
                    + (jnp.arange(gl, dtype=jnp.int32) * ns)[:, None, None])
        outbound = jnp.where((send >= 0)[..., None],
                             x_own[flat_idx.reshape(-1)].reshape(
                                 gl, mp, b, d), 0.0)
        halo = jax.lax.all_to_all(outbound, "model", 1, 1)   # [gl, P, B, D]
        # 2) per-graph augmented rows (own nodes ‖ halo buffer ‖ zero pad),
        #    concatenated across local graphs tile-aligned
        x_aug = jnp.concatenate([x_g, halo.reshape(gl, mp * b, d)], axis=1)
        x_aug = jnp.pad(x_aug, ((0, 0), (0, n_aug - raw_aug), (0, 0)))
        off_aug = jnp.pad(off_own.reshape(gl, ns, h),
                          ((0, 0), (0, n_aug - ns), (0, 0)))
        # 3) concatenate the local graphs' tilings with per-graph offsets
        #    (blocks stay monotone: graph g's windows live in
        #    [g·nblocks, (g+1)·nblocks))
        g_idx = jnp.arange(gl, dtype=jnp.int32)
        tb = (tblocks[:, 0] + (g_idx * nblocks)[:, None]).reshape(-1)
        tw = (twin[:, 0] + (g_idx * nblocks)[:, None]).reshape(-1)
        n_off = (g_idx * n_aug)[:, None]
        rt = jnp.where(recv_t[:, 0] >= 0, recv_t[:, 0] + n_off, -1
                       ).reshape(-1)
        sl = sloc_[:, 0].reshape(-1)               # window-local: no offset
        et = e_t[:, 0].reshape(gl * e_t.shape[2], -1)
        eo = e_ovf[:, 0].reshape(gl * e_ovf.shape[2], -1)
        o_s = (ovf_s_[:, 0] + n_off).reshape(-1)
        o_r = jnp.where(ovf_r_[:, 0] >= 0, ovf_r_[:, 0] + n_off, -1
                        ).reshape(-1)
        pm = jnp.transpose(pmask_[:, 0], (1, 0, 2)).reshape(
            window_blocks, gl * nblocks)
        out = fused(x_aug.reshape(gl * n_aug, d), w_s_, et, w_e_,
                    off_aug.reshape(gl * n_aug, h), eo, rt, tb, tw, sl, pm,
                    o_s, o_r)
        return out.reshape(gl, n_aug, h)[:, :ns].reshape(gl * ns, h)

    return step(x, offset, *plan_arrays, w_s, w_e)


def halo_windowed_hoisted_max(x: jnp.ndarray, w_s: jnp.ndarray,
                              e_feat: jnp.ndarray, w_e: jnp.ndarray,
                              offset: jnp.ndarray, plan: HaloWindowedPlan,
                              mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Sharded hoisted max-aggregation through the windowed Pallas kernels.

        out[n] = offset[n] + max over edges e->n of (x[send(e)]@w_s + e@w_e)
                 for non-empty neighborhoods, 0 otherwise

    x [P·Ns, D] and offset [P·Ns, H] shard over `axis` along nodes; e_feat
    [E, De] is in original edge order (replicated; only each shard's slices
    are gathered). Fully differentiable in x, w_s, e_feat, w_e, offset.
    """
    from radargnn_tpu.ops.pallas_kernels import make_fused_hoisted_aggregate_v3

    hp = plan.halo
    p_n, ns = hp.num_shards, hp.nodes_per_shard
    b = hp.send_idx.shape[-1]
    h = w_s.shape[1]

    e_t = e_feat[jnp.asarray(plan.tile_eperm)]                # [P, T·TE, De]
    ovf_valid = jnp.asarray(plan.ovf_r >= 0)
    e_ovf = jnp.where(ovf_valid[..., None],
                      e_feat[jnp.asarray(plan.ovf_eperm)], 0.0)

    fused = make_fused_hoisted_aggregate_v3(
        plan.n_aug, plan.node_block, plan.edge_tile, plan.window_blocks,
        roll_passes=plan.roll_passes, ovf_sorted=False)

    sharded = (jnp.asarray(hp.send_idx), e_t, e_ovf,
               jnp.asarray(plan.recv_t), jnp.asarray(plan.tile_blocks),
               jnp.asarray(plan.tile_win), jnp.asarray(plan.sloc),
               jnp.asarray(plan.part_mask), jnp.asarray(plan.ovf_s),
               jnp.asarray(plan.ovf_r))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)) + (P(axis),) * len(sharded)
             + (P(), P()),
             out_specs=P(axis), check_vma=False)
    def step(x_own, off_own, send, e_t_, e_ovf_, recv_t, tblocks, twin,
             sloc_, pmask_, ovf_s_, ovf_r_, w_s_, w_e_):
        x_own, off_own, send = x_own[0], off_own[0], send[0]
        # 1) boundary exchange first: the fused op's tile compute has no
        #    dependency on the halo rows (they only feed the overflow list),
        #    so the ICI transfer overlaps the local tile work
        outbound = jnp.where((send >= 0)[..., None],
                             x_own[jnp.maximum(send, 0)], 0)   # [P, B, D]
        halo = jax.lax.all_to_all(outbound, axis, 0, 0)
        # 2) augmented rows: own nodes, then the received halo buffer —
        #    overflow senders index into these rows
        x_aug = jnp.concatenate([x_own, halo.reshape(p_n * b, -1)], axis=0)
        off_aug = jnp.pad(off_own, ((0, plan.n_aug - ns), (0, 0)))
        out = fused(x_aug, w_s_, e_t_[0], w_e_, off_aug, e_ovf_[0],
                    recv_t[0], tblocks[0], twin[0], sloc_[0], pmask_[0],
                    ovf_s_[0], ovf_r_[0])
        return out[:ns][None]

    x_sh = x.reshape(p_n, ns, x.shape[-1])
    off_sh = offset.reshape(p_n, ns, h)
    out = step(x_sh, off_sh, *sharded, w_s, w_e)
    return out.reshape(p_n * ns, h)
