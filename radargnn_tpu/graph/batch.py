"""GraphBatch — the static-shape padded graph container (replaces PyG `Data`).

The reference stores one variable-size PyG `Data(x, edge_index, edge_attr, y,
pos, vel)` per frame and batches them block-diagonally
(`utils/data_handling.py:30` in /root/reference). On TPU, variable shapes
force recompilation and break MXU tiling, so this framework instead pads every
graph to a bucket size and stacks G graphs along a leading axis:

    node_feat [G, N, Dn]   edge_feat [G, E, De]
    senders   [G, E]       receivers [G, E]        (node indices within graph)
    node_mask [G, N]       edge_mask [G, E]
    labels    [G, N]       boxes     [G, N, B]     (NaN for background nodes)
    pos       [G, N, 2]    vel       [G, N, 2]

Compute flattens to [G*N] / [G*E] with per-graph index offsets (a reshape — no
data movement), which recovers the block-diagonal batch semantics including
batch-wide BatchNorm statistics. The leading G axis is the data-parallel
sharding axis; the E axis is the edge-partitioning (model) axis.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


class FlatTiling(NamedTuple):
    """Flattened (global-index) CSR tiling bundle for the fused Pallas
    aggregation paths. `ssum` drives the v2 sender-sorted backward segment
    sum; `win` (senders_local, tile_win, part_mask, ovf_senders,
    ovf_receivers, ovf_edge_feat) drives the v3 windowed kernels; `dense`
    (r_tile, k) switches `win` to the v4 dense fixed-degree layout
    (prepare_dense_knn_tiles) for kNN graphs."""

    senders: jnp.ndarray
    receivers: jnp.ndarray
    blocks: jnp.ndarray
    edge_feat: jnp.ndarray
    ssum: Optional[tuple] = None
    win: Optional[tuple] = None
    node_block: int = 256
    edge_tile: int = 256
    # static bound on the windowed kernels' segmented-max log-roll passes:
    # 2**roll_passes >= the longest same-receiver run in any tile (the max
    # in-degree bounds it); None = full log2(edge_tile)
    roll_passes: Optional[int] = None
    # (r_tile, k) for the dense fixed-degree (v4) kernels; None = windowed
    dense: Optional[tuple] = None
    # r5 dense-family overflow d_x landing: (ossum_perm, ossum_send,
    # ossum_blocks) — a sender-sorted CSR tiling of the overflow slots
    # for pallas_segment_sum_csr. None = XLA scatter-add.
    ovft: Optional[tuple] = None


@struct.dataclass
class GraphBatch:
    """Batched padded graphs. All arrays have the leading G axis."""

    node_feat: jnp.ndarray        # [G, N, Dn] float
    edge_feat: jnp.ndarray        # [G, E, De] float
    senders: jnp.ndarray          # [G, E] int32
    receivers: jnp.ndarray        # [G, E] int32
    node_mask: jnp.ndarray        # [G, N] bool
    edge_mask: jnp.ndarray        # [G, E] bool
    labels: jnp.ndarray           # [G, N] int32
    boxes: jnp.ndarray            # [G, N, B] float (NaN for bg, like reference y)
    pos: jnp.ndarray              # [G, N, 2] float
    vel: jnp.ndarray              # [G, N, 2] float

    # optional CSR tiling for the fused Pallas aggregation (see
    # ops.pallas_kernels.prepare_csr_tiles); None when not prepared.
    # The permutation is applied ON THE HOST: tiled_senders/tiled_edge_feat
    # are the edge arrays already in tile order, so the model never gathers
    # (or scatter-adds, in backward) edge data through the permutation —
    # profiling showed those five per-layer [E, De] scatters were 48% of
    # the train step (docs/RESULTS.md).
    tiled_perm: Optional[jnp.ndarray] = None        # [G, E_t] int32
    tiled_receivers: Optional[jnp.ndarray] = None   # [G, E_t] int32, -1 pad
    tile_blocks: Optional[jnp.ndarray] = None       # [G, T] int32 (local)
    tiled_senders: Optional[jnp.ndarray] = None     # [G, E_t] int32 (local)
    tiled_edge_feat: Optional[jnp.ndarray] = None   # [G, E_t, De] float

    # sender-sorted CSR tiling for the backward gather transpose
    # (pallas_segment_sum_csr): permutation FROM receiver-tile slots into
    # sender-sorted tile order, the sender id per slot (-1 pad), and the
    # node block per tile.
    ssum_perm: Optional[jnp.ndarray] = None         # [G, E_s] int32
    ssum_senders: Optional[jnp.ndarray] = None      # [G, E_s] int32, -1 pad
    ssum_blocks: Optional[jnp.ndarray] = None       # [G, T_s] int32 (local)

    # windowed (v3) tiling: Morton-ordered nodes, per-tile sender windows
    # (ops.pallas_kernels.prepare_windowed_csr_tiles) + fixed-budget
    # overflow edges for the XLA fallback path.
    win_senders_local: Optional[jnp.ndarray] = None  # [G, E_t] int32, -1 pad
    tile_win: Optional[jnp.ndarray] = None           # [G, T] int32 (local)
    win_part_mask: Optional[jnp.ndarray] = None      # [G, WB, NBLK] bool
    ovf_senders: Optional[jnp.ndarray] = None        # [G, Eo] int32 (local)
    ovf_receivers: Optional[jnp.ndarray] = None      # [G, Eo] int32, -1 pad
    ovf_edge_feat: Optional[jnp.ndarray] = None      # [G, Eo, De] float

    # r5: sender-sorted CSR tiling of the overflow slots for the dense
    # (v4) family — the backward overflow d_x lands through
    # pallas_segment_sum_csr instead of XLA's scatter-add. The perm
    # indexes the plain [Eo] overflow slot space.
    ossum_perm: Optional[jnp.ndarray] = None         # [G, Eot] int32
    ossum_send: Optional[jnp.ndarray] = None         # [G, Eot] int32, -1 pad
    ossum_blocks: Optional[jnp.ndarray] = None       # [G, To] int32 (local)

    # halo edge-partitioning over a (data × model) mesh
    # (parallel.halo_windowed): per-graph stacked HaloWindowedPlan arrays,
    # leading axes [G, P]. Built by the loader's halo_partition option.
    halo_send_idx: Optional[jnp.ndarray] = None      # [G, P, P, B]
    halo_e_t: Optional[jnp.ndarray] = None           # [G, P, T·TE, De]
    halo_e_ovf: Optional[jnp.ndarray] = None         # [G, P, Eo, De]
    halo_recv_t: Optional[jnp.ndarray] = None        # [G, P, T·TE]
    halo_tile_blocks: Optional[jnp.ndarray] = None   # [G, P, T]
    halo_tile_win: Optional[jnp.ndarray] = None      # [G, P, T]
    halo_sloc: Optional[jnp.ndarray] = None          # [G, P, T·TE]
    halo_part_mask: Optional[jnp.ndarray] = None     # [G, P, WB, NBLK]
    halo_ovf_s: Optional[jnp.ndarray] = None         # [G, P, Eo]
    halo_ovf_r: Optional[jnp.ndarray] = None         # [G, P, Eo]

    # static (non-pytree) tiling geometry: (node_block, edge_tile) used by
    # the loader; the kernels must be built with the same values
    tile_geometry: Optional[tuple] = struct.field(pytree_node=False,
                                                  default=None)
    # static halo geometry: (node_block, edge_tile, window_blocks, n_aug,
    # roll_passes, dp, mp, nodes_per_shard, halo_b); the trainer reads
    # dp/mp at [5]/[6]. None = batch carries no halo partitioning.
    halo_geometry: Optional[tuple] = struct.field(pytree_node=False,
                                                  default=None)

    @property
    def num_graphs(self) -> int:
        return self.node_feat.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.node_feat.shape[1]

    @property
    def max_edges(self) -> int:
        return self.senders.shape[1]

    # ---- flattened (block-diagonal) views --------------------------------
    def flat_senders(self) -> jnp.ndarray:
        """[G*E] senders with per-graph offsets — global node indices."""
        g, e = self.senders.shape
        offset = (jnp.arange(g, dtype=jnp.int32) * self.max_nodes)[:, None]
        return (self.senders + offset).reshape(-1)

    def flat_receivers(self) -> jnp.ndarray:
        g, e = self.receivers.shape
        offset = (jnp.arange(g, dtype=jnp.int32) * self.max_nodes)[:, None]
        return (self.receivers + offset).reshape(-1)

    def flat_nodes(self) -> jnp.ndarray:
        return self.node_feat.reshape(-1, self.node_feat.shape[-1])

    def flat_edges(self) -> jnp.ndarray:
        return self.edge_feat.reshape(-1, self.edge_feat.shape[-1])

    def flat_tiling(self, node_block: Optional[int] = None) -> \
            "Optional[FlatTiling]":
        """Global flat CSR tiling bundle (FlatTiling) in tile order, or None
        if unprepared. The geometry comes from the batch's own
        `tile_geometry` (the loader's node_block/edge_tile); the argument is
        a fallback for batches created before that field existed.

        Per-graph tilings concatenate exactly because max_nodes is a multiple
        of node_block: global block id = g·(N/node_block) + local block id.
        """
        if self.tiled_senders is None:
            return None
        roll_passes = None
        dense = None
        if self.tile_geometry is not None:
            node_block, edge_tile = self.tile_geometry[:2]
            if len(self.tile_geometry) > 2:
                roll_passes = self.tile_geometry[2]
            if len(self.tile_geometry) > 3 \
                    and self.tile_geometry[3] is not None \
                    and self.tile_geometry[3][0] == "dense":
                dense = tuple(self.tile_geometry[3][1:])   # (r_tile, k)
        else:
            edge_tile = node_block
        g, et = self.tiled_senders.shape
        n = self.max_nodes
        assert n % node_block == 0, "max_nodes must align to node_block"
        n_off = (jnp.arange(g, dtype=jnp.int32) * n)[:, None]
        b_off = (jnp.arange(g, dtype=jnp.int32) * (n // node_block))[:, None]
        senders = (self.tiled_senders + n_off).reshape(-1)
        recv = jnp.where(self.tiled_receivers >= 0,
                         self.tiled_receivers + n_off, -1).reshape(-1)
        blocks = (self.tile_blocks + b_off).reshape(-1)
        edge_feat = self.tiled_edge_feat.reshape(
            -1, self.tiled_edge_feat.shape[-1])
        ssum = None
        if self.ssum_perm is not None:
            e_off = (jnp.arange(g, dtype=jnp.int32) * et)[:, None]
            s_perm = (self.ssum_perm + e_off).reshape(-1)
            s_send = jnp.where(self.ssum_senders >= 0,
                               self.ssum_senders + n_off, -1).reshape(-1)
            s_blocks = (self.ssum_blocks + b_off).reshape(-1)
            ssum = (s_perm, s_send, s_blocks)
        win = None
        if self.win_senders_local is not None:
            # senders_local are window-relative: no offset. part_mask
            # concatenates along the (global) block axis.
            sloc = self.win_senders_local.reshape(-1)
            t_win = (self.tile_win + b_off).reshape(-1)
            wb = self.win_part_mask.shape[1]
            pmask = jnp.transpose(self.win_part_mask, (1, 0, 2)).reshape(
                wb, -1)
            ovf_mask = self.ovf_receivers >= 0
            ovf_s = jnp.where(ovf_mask, self.ovf_senders + n_off,
                              0).reshape(-1)
            ovf_r = jnp.where(ovf_mask, self.ovf_receivers + n_off,
                              -1).reshape(-1)
            ovf_e = self.ovf_edge_feat.reshape(
                -1, self.ovf_edge_feat.shape[-1])
            win = (sloc, t_win, pmask, ovf_s, ovf_r, ovf_e)
        ovft = None
        if self.ossum_perm is not None:
            # sender-sorted overflow tiling (dense family): the perm
            # indexes the plain [Eo] overflow slot space, so it offsets
            # by Eo per graph; senders/blocks get node/block offsets
            eo = self.ovf_senders.shape[1]
            eo_off = (jnp.arange(g, dtype=jnp.int32) * eo)[:, None]
            ovft = (
                (self.ossum_perm + eo_off).reshape(-1),
                jnp.where(self.ossum_send >= 0, self.ossum_send + n_off,
                          -1).reshape(-1),
                (self.ossum_blocks + b_off).reshape(-1),
            )
        return FlatTiling(senders, recv, blocks, edge_feat, ssum, win,
                          node_block, edge_tile, roll_passes, dense, ovft)

    def flat_halo(self, mesh):
        """Device-side HaloBundle for halo-partitioned training (None when
        the batch carries no halo plan). See
        parallel.halo_windowed.halo_windowed_hoisted_max_batched."""
        if self.halo_send_idx is None or self.halo_geometry is None:
            return None
        from radargnn_tpu.parallel.halo_windowed import HaloBundle
        return HaloBundle(
            send_idx=self.halo_send_idx, e_t=self.halo_e_t,
            e_ovf=self.halo_e_ovf, recv_t=self.halo_recv_t,
            tile_blocks=self.halo_tile_blocks, tile_win=self.halo_tile_win,
            sloc=self.halo_sloc, part_mask=self.halo_part_mask,
            ovf_s=self.halo_ovf_s, ovf_r=self.halo_ovf_r,
            geometry=self.halo_geometry, mesh=mesh)

    def num_valid_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask)

    def num_valid_edges(self) -> jnp.ndarray:
        return jnp.sum(self.edge_mask)


@dataclasses.dataclass
class GraphSample:
    """One un-padded graph on the host (numpy). The unit the data pipeline
    produces; `pad_sample` + `stack_samples` turn lists of these into a
    GraphBatch."""

    node_feat: np.ndarray         # [n, Dn]
    edge_feat: np.ndarray         # [e, De]
    senders: np.ndarray           # [e]
    receivers: np.ndarray         # [e]
    labels: np.ndarray            # [n]
    boxes: np.ndarray             # [n, B]
    pos: np.ndarray               # [n, 2]
    vel: np.ndarray               # [n, 2]

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    def save_npz(self, path: str) -> None:
        np.savez_compressed(
            path, node_feat=self.node_feat, edge_feat=self.edge_feat,
            senders=self.senders, receivers=self.receivers, labels=self.labels,
            boxes=self.boxes, pos=self.pos, vel=self.vel)

    @staticmethod
    def load_npz(path: str) -> "GraphSample":
        with np.load(path) as z:
            return GraphSample(**{k: z[k] for k in (
                "node_feat", "edge_feat", "senders", "receivers", "labels",
                "boxes", "pos", "vel")})


def morton_sort_sample(sample: GraphSample) -> GraphSample:
    """Reorders a sample's nodes along a Morton (Z-order) space-filling
    curve of their positions and remaps edge endpoints. Message passing is
    permutation invariant; this only improves index locality (the windowed
    fused kernels require it)."""
    from radargnn_tpu.ops.pallas_kernels import morton_order

    perm = morton_order(sample.pos)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return GraphSample(
        node_feat=sample.node_feat[perm], edge_feat=sample.edge_feat,
        senders=inv[sample.senders].astype(sample.senders.dtype),
        receivers=inv[sample.receivers].astype(sample.receivers.dtype),
        labels=sample.labels[perm], boxes=sample.boxes[perm],
        pos=sample.pos[perm], vel=sample.vel[perm])


def roll_passes_bound(samples: List[GraphSample], edge_tile: int) -> int:
    """Static log-roll pass count for the windowed kernels' segmented max:
    the longest same-receiver edge run inside a tile is bounded by the max
    in-degree, so 2**passes >= max_in_degree is always enough (padded slots
    never land). Cheap O(E) host metadata."""
    max_deg = 1
    for s in samples:
        if s.num_edges:
            max_deg = max(max_deg,
                          int(np.bincount(s.receivers,
                                          minlength=s.num_nodes).max()))
    full = int(np.ceil(np.log2(edge_tile)))
    return min(full, max(1, int(np.ceil(np.log2(max_deg)))))


def overflow_budget(max_edges: int, edge_tile: int,
                    frac: float = 0.08) -> int:
    """Static overflow-edge budget for the windowed tiling (same for every
    sample of a bucket so shapes stay jit-stable)."""
    return max(edge_tile,
               -(-int(max_edges * frac) // edge_tile) * edge_tile)


def pad_sample(sample: GraphSample, max_nodes: int, max_edges: int,
               bg_index: int, sort_edges_by_receiver: bool = True,
               csr_tiling=None, halo_partition: Optional[dict] = None
               ) -> dict:
    """Pads a GraphSample to (max_nodes, max_edges); returns plain numpy dict.

    Padded nodes get label `bg_index` and NaN boxes; padded edges point at
    node max_nodes-1 and are masked out. With `sort_edges_by_receiver`
    (default) edges are stably re-ordered by receiver so segment reductions
    can take the `indices_are_sorted` fast path (message passing is
    permutation invariant, so results are unchanged).

    `csr_tiling` enables the fused-aggregation layouts: (node_block,
    edge_tile) builds the v2 receiver+sender CSR tilings; (node_block,
    edge_tile, window_blocks) additionally Morton-orders the nodes and
    builds the v3 windowed tiling + overflow lists.

    `halo_partition` (dict: mp, dp, ovf_frac, budgets) replaces the
    single-chip tiling with a per-graph HaloWindowedPlan for (data × model)
    mesh training: nodes Morton-ordered then partitioned into `mp` shards,
    per-shard windowed tilings + boundary-exchange plan, edge features
    pre-gathered into tile order. Requires a 3-tuple (windowed) csr_tiling
    for the kernel geometry.
    """
    window_blocks = None
    ovf_frac = 0.08
    run_cap = None
    dense_cfg = None
    if isinstance(csr_tiling, dict):
        # dense fixed-degree (v4) tiling for kNN graphs:
        # {"mode": "dense", "node_block", "r_tile", "k", "window_blocks",
        #  "ovf_frac"} — see ops.pallas_kernels.prepare_dense_knn_tiles
        if csr_tiling.get("mode") != "dense":
            raise ValueError(f"unknown tiling dict mode: {csr_tiling}")
        dense_cfg = dict(csr_tiling)
        sample = morton_sort_sample(sample)
        csr_tiling = None
    elif csr_tiling is not None and len(csr_tiling) >= 3:
        node_block, edge_tile, window_blocks = csr_tiling[:3]
        if len(csr_tiling) >= 4:
            ovf_frac = csr_tiling[3]
        if len(csr_tiling) >= 5:
            run_cap = csr_tiling[4]
        csr_tiling = (node_block, edge_tile)
        sample = morton_sort_sample(sample)
    if halo_partition is not None and window_blocks is None \
            and dense_cfg is None:
        raise ValueError("halo_partition requires a windowed (3-tuple) or "
                         "dense (dict) csr_tiling for the kernel geometry")

    n, e = sample.num_nodes, sample.num_edges
    if n > max_nodes or e > max_edges:
        raise ValueError(f"sample ({n} nodes, {e} edges) exceeds bucket "
                         f"({max_nodes}, {max_edges})")

    s_senders, s_receivers, s_edge_feat = (
        sample.senders, sample.receivers, sample.edge_feat)
    if sort_edges_by_receiver and e:
        order = np.argsort(s_receivers, kind="stable")
        s_senders = s_senders[order]
        s_receivers = s_receivers[order]
        s_edge_feat = s_edge_feat[order]

    def pad_nodes(a, fill=0.0):
        out = np.full((max_nodes,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return out

    boxes = np.full((max_nodes, sample.boxes.shape[1]), np.nan, dtype=np.float32)
    boxes[:n] = sample.boxes

    labels = np.full((max_nodes,), bg_index, dtype=np.int32)
    labels[:n] = sample.labels

    senders = np.zeros((max_edges,), dtype=np.int32)
    receivers = np.full((max_edges,), max_nodes - 1, dtype=np.int32)
    senders[:e] = s_senders
    receivers[:e] = s_receivers

    node_mask = np.zeros((max_nodes,), dtype=bool)
    node_mask[:n] = True
    edge_mask = np.zeros((max_edges,), dtype=bool)
    edge_mask[:e] = True

    out = dict(
        node_feat=pad_nodes(sample.node_feat),
        edge_feat=np.concatenate([
            s_edge_feat.astype(np.float32),
            np.zeros((max_edges - e, sample.edge_feat.shape[1]), np.float32)],
            axis=0),
        senders=senders, receivers=receivers,
        node_mask=node_mask, edge_mask=edge_mask,
        labels=labels, boxes=boxes,
        pos=pad_nodes(sample.pos), vel=pad_nodes(sample.vel),
    )
    if dense_cfg is not None and halo_partition is not None:
        # dense × halo composition (r4 verdict item 3): per-shard dense
        # slot layouts over each shard's own nodes; halo edges ride the
        # overflow list against augmented rows (parallel/halo_dense.py)
        from radargnn_tpu.parallel.halo_dense import (
            build_halo_dense_plan, plan_budgets_dense,
        )
        mp = halo_partition["mp"]
        if max_nodes % mp:
            raise ValueError(f"max_nodes {max_nodes} not divisible by "
                             f"mp={mp} halo shards")
        node_block = dense_cfg["node_block"]
        r_tile = dense_cfg["r_tile"]
        kslots = dense_cfg["k"]
        wb = dense_cfg.get("window_blocks", 3)
        plan = build_halo_dense_plan(
            senders, receivers, max_nodes, mp, kslots, r_tile, node_block,
            wb, edge_mask=edge_mask,
            ovf_frac=halo_partition.get("ovf_frac", 0.5),
            budgets=halo_partition.get("budgets"))
        ef = out["edge_feat"]
        e_t = np.where((plan.sloc >= 0)[..., None],
                       ef[plan.tile_eperm], 0.0).astype(np.float32)
        e_ovf = np.where((plan.ovf_r >= 0)[..., None],
                         ef[plan.ovf_eperm], 0.0).astype(np.float32)
        t = plan.n_aug // r_tile
        tile_blocks = np.broadcast_to(
            ((np.arange(t) * r_tile) // node_block).astype(np.int32),
            (mp, t))
        out.update(
            halo_send_idx=plan.halo.send_idx, halo_e_t=e_t,
            halo_e_ovf=e_ovf, halo_recv_t=plan.slot_recv,
            halo_tile_blocks=np.ascontiguousarray(tile_blocks),
            halo_tile_win=plan.tile_win, halo_sloc=plan.sloc,
            halo_part_mask=plan.part_mask, halo_ovf_s=plan.ovf_s,
            halo_ovf_r=plan.ovf_r)
        # trailing ("dense", r_tile, k) marker: trainer reads dp/mp at
        # [5]/[6]; halo_windowed.halo_hoisted_max_batched dispatches on it
        out["_halo_geometry"] = (
            plan.node_block, r_tile * kslots, plan.window_blocks,
            plan.n_aug, -1, halo_partition.get("dp", 1), mp,
            plan.halo.nodes_per_shard, plan.halo.send_idx.shape[-1],
            "dense", r_tile, kslots)
        out["_halo_budgets"] = plan_budgets_dense(plan)
    elif dense_cfg is not None:
        from radargnn_tpu.ops.pallas_kernels import (
            prepare_csr_tiles, prepare_dense_knn_tiles, window_part_mask,
        )
        node_block = dense_cfg["node_block"]
        r_tile = dense_cfg["r_tile"]
        k = dense_cfg["k"]
        window_blocks = dense_cfg.get("window_blocks", 3)
        te = r_tile * k
        budget = overflow_budget(max_edges, te,
                                 dense_cfg.get("ovf_frac", 0.05))
        perm, senders_local, tile_win, ovf_idx = prepare_dense_knn_tiles(
            senders, receivers, edge_mask, max_nodes, k, r_tile,
            node_block, window_blocks, budget)
        nblocks = (max_nodes + node_block - 1) // node_block
        pmask = window_part_mask(tile_win, nblocks, window_blocks)
        ovf_valid = ovf_idx >= 0
        ovf_c = np.maximum(ovf_idx, 0)
        t = max_nodes // r_tile
        # receiver per slot is implicit in the layout; materialize it for
        # the FlatTiling bookkeeping fields (kernels never read it)
        slot_recv = (np.repeat(np.arange(t), te) * r_tile
                     + np.tile(np.arange(te) % r_tile, t)).astype(np.int32)
        slot_recv = np.where(senders_local >= 0, slot_recv, -1)
        out.update(
            tiled_perm=perm, tiled_receivers=slot_recv,
            tile_blocks=((np.arange(t) * r_tile) // node_block
                         ).astype(np.int32),
            tiled_senders=senders[perm],
            tiled_edge_feat=out["edge_feat"][perm],
            win_senders_local=senders_local, tile_win=tile_win,
            win_part_mask=pmask,
            ovf_senders=np.where(ovf_valid, senders[ovf_c], 0
                                 ).astype(np.int32),
            ovf_receivers=np.where(ovf_valid, receivers[ovf_c], -1
                                   ).astype(np.int32),
            ovf_edge_feat=np.where(ovf_valid[:, None],
                                   out["edge_feat"][ovf_c], 0.0
                                   ).astype(np.float32))
        # the dense kernels assume the sorted segment_max lowering —
        # enforce the tiler's receiver-sorted overflow contract at plan
        # build (host numpy; see pallas_kernels.check_overflow_sorted)
        from radargnn_tpu.ops.pallas_kernels import check_overflow_sorted
        check_overflow_sorted(out["ovf_receivers"],
                              "prepare_dense_knn_tiles plan")
        # Optional (measured -0.6%, RADARGNN_FUSED_OVF_SSUM): sender-
        # sorted CSR tiling of the overflow slots — the dense backward
        # lands its overflow d_x through pallas_segment_sum_csr instead
        # of XLA's scatter-add. Host-side sorting is free at plan build
        # (the r4 negative was a per-step DEVICE argsort); the perm
        # indexes the PLAIN overflow slot space (out["ovf_senders"]
        # order). Skipped on the shipping path — its consumer is off.
        if dense_cfg.get("ovf_ssum", False):
            te_o = dense_cfg.get("ovf_edge_tile", 256)
            nblocks_o = max_nodes // node_block
            total_o = -(-budget // te_o) + nblocks_o
            s_perm, s_blocks, s_send = prepare_csr_tiles(
                out["ovf_senders"], ovf_valid, max_nodes, node_block,
                te_o, total_o)
            out.update(ossum_perm=s_perm, ossum_send=s_send,
                       ossum_blocks=s_blocks)
    elif halo_partition is not None:
        from radargnn_tpu.parallel.halo_windowed import (
            build_halo_windowed_plan, plan_budgets,
        )
        mp = halo_partition["mp"]
        if max_nodes % mp:
            raise ValueError(f"max_nodes {max_nodes} not divisible by "
                             f"mp={mp} halo shards")
        plan = build_halo_windowed_plan(
            senders, receivers, max_nodes, mp, node_block, edge_tile,
            window_blocks, edge_mask=edge_mask,
            ovf_frac=halo_partition.get("ovf_frac", 0.5),
            budgets=halo_partition.get("budgets"),
            run_cap=halo_partition.get("run_cap", run_cap))
        ef = out["edge_feat"]
        e_t = np.where((plan.recv_t >= 0)[..., None],
                       ef[plan.tile_eperm], 0.0).astype(np.float32)
        e_ovf = np.where((plan.ovf_r >= 0)[..., None],
                         ef[plan.ovf_eperm], 0.0).astype(np.float32)
        out.update(
            halo_send_idx=plan.halo.send_idx, halo_e_t=e_t,
            halo_e_ovf=e_ovf, halo_recv_t=plan.recv_t,
            halo_tile_blocks=plan.tile_blocks,
            halo_tile_win=plan.tile_win, halo_sloc=plan.sloc,
            halo_part_mask=plan.part_mask, halo_ovf_s=plan.ovf_s,
            halo_ovf_r=plan.ovf_r)
        # non-array metadata (popped by stack_samples)
        out["_halo_geometry"] = (
            plan.node_block, plan.edge_tile, plan.window_blocks, plan.n_aug,
            plan.roll_passes, halo_partition.get("dp", 1), mp,
            plan.halo.nodes_per_shard, plan.halo.send_idx.shape[-1])
        out["_halo_budgets"] = plan_budgets(plan)
    elif csr_tiling is not None and window_blocks is not None:
        from radargnn_tpu.ops.pallas_kernels import (
            prepare_windowed_csr_tiles, window_part_mask,
        )
        node_block, edge_tile = csr_tiling
        total_tiles = (max_edges + edge_tile - 1) // edge_tile             + (max_nodes + node_block - 1) // node_block
        budget = overflow_budget(max_edges, edge_tile, ovf_frac)
        (perm, tile_blocks, padded_recv, senders_local, tile_win,
         ovf_idx) = prepare_windowed_csr_tiles(
            senders, receivers, edge_mask, max_nodes, node_block, edge_tile,
            window_blocks, total_tiles, budget, run_cap=run_cap)
        nblocks = (max_nodes + node_block - 1) // node_block
        pmask = window_part_mask(tile_win, nblocks, window_blocks)
        ovf_valid = ovf_idx >= 0
        ovf_c = np.maximum(ovf_idx, 0)
        out.update(
            tiled_perm=perm, tiled_receivers=padded_recv,
            tile_blocks=tile_blocks, tiled_senders=senders[perm],
            tiled_edge_feat=out["edge_feat"][perm],
            win_senders_local=senders_local, tile_win=tile_win,
            win_part_mask=pmask,
            ovf_senders=np.where(ovf_valid, senders[ovf_c], 0
                                 ).astype(np.int32),
            ovf_receivers=np.where(ovf_valid, receivers[ovf_c], -1
                                   ).astype(np.int32),
            ovf_edge_feat=np.where(ovf_valid[:, None],
                                   out["edge_feat"][ovf_c], 0.0
                                   ).astype(np.float32))
        # single-chip windowed kernels run with ovf_sorted=True — enforce
        # the tiler's receiver-sorted overflow contract at plan build
        from radargnn_tpu.ops.pallas_kernels import check_overflow_sorted
        check_overflow_sorted(out["ovf_receivers"],
                              "prepare_windowed_csr_tiles plan")
    elif csr_tiling is not None:
        from radargnn_tpu.ops.pallas_kernels import prepare_csr_tiles
        node_block, edge_tile = csr_tiling
        total_tiles = (max_edges + edge_tile - 1) // edge_tile             + (max_nodes + node_block - 1) // node_block
        perm, tile_blocks, padded_recv = prepare_csr_tiles(
            receivers, edge_mask, max_nodes, node_block, edge_tile,
            total_tiles)
        tiled_senders = senders[perm]
        # second tiling pass, sorted by SENDER: drives the backward gather
        # transpose (pallas_segment_sum_csr). Slots index into the
        # receiver-tile-ordered edge arrays above.
        s_perm, s_blocks, s_padded = prepare_csr_tiles(
            tiled_senders, padded_recv >= 0, max_nodes, node_block,
            edge_tile, total_tiles)
        out.update(tiled_perm=perm, tiled_receivers=padded_recv,
                   tile_blocks=tile_blocks,
                   tiled_senders=tiled_senders,
                   tiled_edge_feat=out["edge_feat"][perm],
                   ssum_perm=s_perm, ssum_senders=s_padded,
                   ssum_blocks=s_blocks)
    return out


def halo_dataset_budgets(samples: List[GraphSample], max_nodes: int,
                         max_edges: int, bg_index: int, csr_tiling,
                         halo_partition: dict) -> dict:
    """Dataset-wide static halo-plan budgets (two-round probe).

    Round 1 finds the max halo/edge widths; round 2 re-plans with those
    widths fixed — n_aug (and hence the tile count) depends on the halo
    width, so the tile budget is only a fixed point once widths are shared.
    The returned dict makes every sample's plan identical-shape."""
    from radargnn_tpu.parallel.halo_windowed import merge_budgets

    probe = dict(halo_partition, budgets=None)
    round1 = merge_budgets([
        pad_sample(s, max_nodes, max_edges, bg_index, csr_tiling=csr_tiling,
                   halo_partition=probe)["_halo_budgets"] for s in samples])
    widths = {k: round1[k] for k in ("halo_b", "loc_width", "halo_width")}
    probe2 = dict(halo_partition, budgets=widths)
    return merge_budgets([
        pad_sample(s, max_nodes, max_edges, bg_index, csr_tiling=csr_tiling,
                   halo_partition=probe2)["_halo_budgets"] for s in samples])


def stack_samples(samples: List[GraphSample], max_nodes: int, bg_index: int,
                  max_edges: Optional[int] = None,
                  sort_edges_by_receiver: bool = True,
                  csr_tiling=None, pad_cache: Optional[dict] = None,
                  roll_passes: Optional[int] = None,
                  halo_partition: Optional[dict] = None) -> GraphBatch:
    """Pads and stacks host samples into a device GraphBatch.

    With the default receiver-sorted edge layout, flat receiver indices are
    globally non-decreasing (per-graph sorted + increasing graph offsets), so
    models configured with `assume_sorted_edges` hit the sorted-scatter fast
    path.

    `pad_cache` (id(sample) -> padded dict) memoizes the per-sample padding
    and CSR/windowed-tiling host work across epochs — padding is pure
    per-sample, so reshuffled batches reuse it.

    `roll_passes` statically bounds the windowed kernels' segmented-max
    log-roll passes (see roll_passes_bound); None computes it from this
    batch's samples — pass a loader-level constant to keep one compiled
    executable across batches."""
    if max_edges is None:
        max_edges = max(s.num_edges for s in samples)
    padded = []
    for s in samples:
        if pad_cache is not None and id(s) in pad_cache:
            padded.append(pad_cache[id(s)])
            continue
        p = pad_sample(s, max_nodes, max_edges, bg_index,
                       sort_edges_by_receiver, csr_tiling, halo_partition)
        if pad_cache is not None:
            pad_cache[id(s)] = p
        padded.append(p)
    halo_geometry = None
    if halo_partition is not None:
        # all geometries must agree except roll_passes (take the max so one
        # executable covers every batch; loader budgets make them equal)
        geoms = [p["_halo_geometry"] for p in padded]
        base = geoms[0][:4] + geoms[0][5:]
        for g_ in geoms[1:]:
            if g_[:4] + g_[5:] != base:
                raise ValueError("halo plan shapes differ across samples; "
                                 "pass shared budgets (loader does this)")
        rp = max(g_[4] for g_ in geoms)
        halo_geometry = geoms[0][:4] + (rp,) + geoms[0][5:]
    arrays = {k: np.stack([p[k] for p in padded])
              for k in padded[0] if not k.startswith("_")}
    if isinstance(csr_tiling, dict) and halo_partition is None:
        # dense fixed-degree (v4) geometry: edge_tile = r_tile*k slots,
        # trailing ("dense", r_tile, k) marker read by flat_tiling
        r_tile, kk = csr_tiling["r_tile"], csr_tiling["k"]
        geometry = (csr_tiling["node_block"], r_tile * kk, None,
                    ("dense", r_tile, kk))
        valid_edges = int(sum(s.num_edges for s in samples))
        batch = GraphBatch(**{k: jnp.asarray(v) for k, v in arrays.items()},
                           tile_geometry=geometry, halo_geometry=None)
        object.__setattr__(batch, "host_valid_edges", valid_edges)
        return batch
    geometry = tuple(csr_tiling[:2]) \
        if csr_tiling is not None and halo_partition is None else None
    if geometry is not None and csr_tiling is not None \
            and len(csr_tiling) >= 3:
        if len(csr_tiling) >= 5 and csr_tiling[4] is not None:
            # spread tiling: run length is capped by construction, so the
            # pass count is static regardless of the in-degree distribution
            roll_passes = (int(csr_tiling[4]) - 1).bit_length()
        elif roll_passes is None:
            roll_passes = roll_passes_bound(samples, geometry[1])
        geometry = geometry + (roll_passes,)
    valid_edges = int(sum(s.num_edges for s in samples))
    batch = GraphBatch(**{k: jnp.asarray(v) for k, v in arrays.items()},
                       tile_geometry=geometry, halo_geometry=halo_geometry)
    # host-side metadata (NOT a pytree field — set as a plain attribute so
    # it never enters jit cache keys): lets the trainer report edges/s
    # without pulling edge_mask back from the device
    object.__setattr__(batch, "host_valid_edges", valid_edges)
    return batch
