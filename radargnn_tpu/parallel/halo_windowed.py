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
                             pad_align: int = 8) -> HaloWindowedPlan:
    """Plans the halo exchange and a windowed CSR tiling per shard.

    `ovf_frac` budgets the per-shard WINDOW overflow (local edges whose
    sender misses the Morton window) relative to the local-edge budget; the
    halo edges are appended after it. Call with Morton-ordered nodes to keep
    both the boundary and the window overflow small.
    """
    from radargnn_tpu.ops.pallas_kernels import (
        prepare_windowed_csr_tiles, window_part_mask,
    )

    hp = build_halo_plan(senders, receivers, num_nodes, num_shards,
                         edge_mask, pad_align)
    p_n, ns = hp.num_shards, hp.nodes_per_shard
    b = hp.send_idx.shape[-1]
    n_aug = ns + p_n * b
    nblocks = -(-n_aug // node_block)
    el = hp.loc_senders.shape[1]
    eh = hp.halo_senders.shape[1]
    win_budget = max(edge_tile, _round_up(max(int(el * ovf_frac), 1),
                                          edge_tile))

    # pass 1: per-shard tilings; find the common tile budget + roll bound
    preps, tmax, rp = [], 1, 1
    for p in range(p_n):
        ls, lr = hp.loc_senders[p], hp.loc_receivers[p]
        mask = lr >= 0
        preps.append(prepare_windowed_csr_tiles(
            np.maximum(ls, 0), np.maximum(lr, 0), mask, n_aug, node_block,
            edge_tile, window_blocks, None, win_budget))
        tmax = max(tmax, len(preps[p][1]))
        if mask.any():
            deg = int(np.bincount(lr[mask], minlength=ns).max())
            rp = max(rp, int(np.ceil(np.log2(max(2, deg)))))

    # pass 2: re-tile with the shared budget so every shard's shapes match
    tile_blocks, tile_win, recv_t, sloc = [], [], [], []
    pmask, tile_eperm, ovf_s, ovf_r, ovf_eperm = [], [], [], [], []
    for p in range(p_n):
        ls, lr = hp.loc_senders[p], hp.loc_receivers[p]
        mask = lr >= 0
        (perm, blocks, precv, psloc, twin, ovf_idx) = \
            prepare_windowed_csr_tiles(
                np.maximum(ls, 0), np.maximum(lr, 0), mask, n_aug,
                node_block, edge_tile, window_blocks, tmax, win_budget)
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
        roll_passes=plan.roll_passes)

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
