"""Halo-exchange edge partitioning — boundary-feature all_to_all + overlap.

The north-star scaling design (SURVEY.md §2c, §5): partition a large graph's
NODES contiguously over the mesh `model` axis (Morton-ordered nodes make the
partitions spatially compact), assign each edge to its RECEIVER's shard so
the segment reduction stays chip-local, and exchange only the BOUNDARY
sender features (the "halo") with one `all_to_all` over ICI.

Overlap: edges are split host-side into local-sender edges and remote-sender
(halo) edges. The shard_map body issues the all_to_all first, then computes
the local-edge partial reduction — which has no data dependency on the
collective — and only then the halo-edge partial. XLA's latency-hiding
scheduler hides the ICI transfer behind the local partial's compute.

Compared to `edge_partition.py` (replicated node array + one pmax/psum
combine), this path ships O(boundary) bytes instead of O(N·D) replication
and needs no cross-chip combine at all: every receiver's full in-neighborhood
is resident on its own shard.

Host planning is static per bucket (fixed budgets) so the sharded step jits
once; `HaloPlan` is pure numpy and cacheable alongside the loader's pad
cache.

No reference equivalent exists (the reference is single-GPU); capability is
new scope mandated by BASELINE.json.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -jnp.inf


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static host-built partition plan for one padded graph bucket.

    P = number of shards, Ns = nodes per shard (num_nodes = P*Ns),
    El/Eh = per-shard local-/halo-edge budgets, B = per (owner, dest)
    halo-send budget.
    """
    num_shards: int
    nodes_per_shard: int
    # [P, P, B] owned-local node index each owner sends to each dest; -1 pad
    send_idx: np.ndarray
    # local-sender edges, per receiver shard: sender index is shard-local
    loc_senders: np.ndarray      # [P, El] int32, -1 pad
    loc_receivers: np.ndarray    # [P, El] int32 shard-local, -1 pad
    loc_edge_perm: np.ndarray    # [P, El] original edge index (gather), 0 pad
    # halo edges: sender index points into the received halo buffer [P*B]
    halo_senders: np.ndarray     # [P, Eh] int32, -1 pad
    halo_receivers: np.ndarray   # [P, Eh] int32 shard-local, -1 pad
    halo_edge_perm: np.ndarray   # [P, Eh] original edge index, 0 pad


def build_halo_plan(senders: np.ndarray, receivers: np.ndarray,
                    num_nodes: int, num_shards: int,
                    edge_mask: Optional[np.ndarray] = None,
                    pad_align: int = 8,
                    halo_b: Optional[int] = None,
                    loc_width: Optional[int] = None,
                    halo_width: Optional[int] = None) -> HaloPlan:
    """Partitions edges by receiver shard and plans the boundary exchange.

    Nodes are assigned contiguously: shard p owns [p*Ns, (p+1)*Ns). Call
    with Morton-ordered nodes (graph.batch.morton_sort_sample) to keep the
    boundary small. Planning is O(E log E) vectorized numpy (one lexsorted
    unique over the boundary triples) — no per-edge Python.

    `halo_b` / `loc_width` / `halo_width` override the derived per-(owner,
    dest) send budget and per-shard edge widths — pass dataset-wide maxima so
    every sample's plan shares one static shape (jit stability).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    if edge_mask is None:
        edge_mask = np.ones(len(senders), bool)
    edge_mask = np.asarray(edge_mask) & (receivers >= 0)
    ns = _round_up(num_nodes, num_shards) // num_shards
    p_of = lambda n: np.minimum(n // ns, num_shards - 1)

    r_shard = p_of(receivers)
    s_shard = p_of(senders)
    local = edge_mask & (r_shard == s_shard)
    remote = edge_mask & ~ (r_shard == s_shard)

    # unique boundary (owner p, dest q, sender) triples, lexicographically
    # sorted — rank within each (p, q) group is the sender's halo-buffer slot
    remote_idx = np.flatnonzero(remote)
    p_r = s_shard[remote_idx].astype(np.int64)
    q_r = r_shard[remote_idx].astype(np.int64)
    gid_e = p_r * num_shards + q_r
    key = gid_e * (num_nodes + 1) + senders[remote_idx]
    uniq_key, inv = np.unique(key, return_inverse=True)
    gid = uniq_key // (num_nodes + 1)
    u_send = uniq_key % (num_nodes + 1)
    starts = np.searchsorted(gid, np.arange(num_shards * num_shards))
    rank = np.arange(len(gid)) - starts[gid]
    counts = np.bincount(gid, minlength=num_shards * num_shards)
    b = int(counts.max()) if len(gid) else 1
    b = _round_up(max(b, 1), pad_align)
    if halo_b is not None:
        if halo_b < b:
            raise ValueError(f"halo_b override {halo_b} < required {b}")
        b = halo_b
    send_flat = np.full((num_shards * num_shards, b), -1, np.int64)
    send_flat[gid, rank] = u_send - (gid // num_shards) * ns   # owner-local
    send_idx = send_flat.reshape(num_shards, num_shards, b)
    # halo slot of each remote edge's sender on its dest: owner p's chunk
    # starts at p*b
    slot_of_edge = np.full(len(senders), -1, np.int64)
    slot_of_edge[remote_idx] = p_r * b + rank[inv]

    def pack(mask_per_shard, sender_map, width):
        counts = [int(m.sum()) for m in mask_per_shard]
        need = _round_up(max(counts + [1]), pad_align)
        if width is None:
            width = need
        elif width < need:
            raise ValueError(f"edge-width override {width} < required {need}")
        send = np.full((num_shards, width), -1, np.int64)
        recv = np.full((num_shards, width), -1, np.int64)
        perm = np.zeros((num_shards, width), np.int64)
        for q, m in enumerate(mask_per_shard):
            idx = np.flatnonzero(m)
            send[q, :len(idx)] = sender_map(q, idx)
            recv[q, :len(idx)] = receivers[idx] - q * ns
            perm[q, :len(idx)] = idx
        return send, recv, perm

    loc_s, loc_r, loc_p = pack(
        [local & (r_shard == q) for q in range(num_shards)],
        lambda q, idx: senders[idx] - q * ns, loc_width)
    halo_s, halo_r, halo_p = pack(
        [remote & (r_shard == q) for q in range(num_shards)],
        lambda q, idx: slot_of_edge[idx], halo_width)

    return HaloPlan(num_shards, ns, send_idx.astype(np.int32),
                    loc_s.astype(np.int32), loc_r.astype(np.int32),
                    loc_p.astype(np.int32),
                    halo_s.astype(np.int32), halo_r.astype(np.int32),
                    halo_p.astype(np.int32))


def halo_segment_reduce(reducer: str, x: jnp.ndarray,
                        message_fn: Callable[[jnp.ndarray, jnp.ndarray],
                                             jnp.ndarray],
                        edge_feat: jnp.ndarray, plan: HaloPlan, mesh: Mesh,
                        axis: str = "model") -> jnp.ndarray:
    """Edge aggregation out[n] = reduce over edges e->n of
    message_fn(x[sender(e)], edge_feat[e]), with nodes/edges partitioned per
    `plan` and boundary features exchanged via all_to_all over `axis`.

    x [N_pad, D] (N_pad = P*Ns), edge_feat [E, De] in original edge order;
    returns [N_pad, H] replicated-free: sharded over `axis` along nodes.
    """
    p_n = plan.num_shards
    ns = plan.nodes_per_shard
    b = plan.send_idx.shape[-1]

    send_idx = jnp.asarray(plan.send_idx)
    loc_s, loc_r = jnp.asarray(plan.loc_senders), jnp.asarray(
        plan.loc_receivers)
    halo_s, halo_r = jnp.asarray(plan.halo_senders), jnp.asarray(
        plan.halo_receivers)
    e_loc = edge_feat[jnp.asarray(plan.loc_edge_perm)]     # [P, El, De]
    e_halo = edge_feat[jnp.asarray(plan.halo_edge_perm)]   # [P, Eh, De]

    def _partial(xs, s, r, e):
        mask = r >= 0
        msg = message_fn(xs[jnp.maximum(s, 0)], e)
        if reducer == "max":
            msg = jnp.where(mask[:, None], msg, _NEG)
            return jax.ops.segment_max(msg, jnp.maximum(r, 0),
                                       num_segments=ns)
        msg = jnp.where(mask[:, None], msg, 0)
        return jax.ops.segment_sum(msg, jnp.maximum(r, 0), num_segments=ns)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                       P(axis), P(axis)),
             out_specs=P(axis), check_vma=False)
    def step(x_own, send, s_l, r_l, e_l, s_h, r_h, e_h):
        x_own = x_own[0]                               # [Ns, D]
        send = send[0]                                 # [P, B] dest-major
        s_l, r_l, e_l = s_l[0], r_l[0], e_l[0]
        s_h, r_h, e_h = s_h[0], r_h[0], e_h[0]
        # 1) issue the boundary exchange (chunk q -> shard q; received
        #    buffer is owner-major, matching the plan's halo slots)
        outbound = jnp.where((send >= 0)[..., None],
                             x_own[jnp.maximum(send, 0)], 0)  # [P, B, D]
        halo = jax.lax.all_to_all(outbound, axis, 0, 0)       # [P, B, D]
        # 2) local-edge partial — independent of the collective, so the
        #    latency-hiding scheduler overlaps it with the ICI transfer
        part_local = _partial(x_own, s_l, r_l, e_l)
        # 3) halo-edge partial against the received buffer
        part_halo = _partial(halo.reshape(p_n * b, -1), s_h, r_h, e_h)
        if reducer == "max":
            out = jnp.maximum(part_local, part_halo)
            return jnp.where(out == _NEG, 0.0, out)[None]
        return (part_local + part_halo)[None]

    x_sh = x.reshape(p_n, ns, x.shape[-1])
    out = step(x_sh, send_idx, loc_s, loc_r, e_loc, halo_s, halo_r, e_halo)
    return out.reshape(p_n * ns, -1)
