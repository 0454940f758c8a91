"""Edge-partitioned message passing — the SP/TP analog for GNNs.

The reference has no distributed execution (SURVEY.md §2c); this module is
the explicit-collective scaling path for graphs too large for one chip's
edge set: the edge arrays are sharded over the mesh `model` axis, each chip
computes messages + a *local* segment reduction over its edge shard against
the full (replicated) node array, and the partial per-node aggregates are
combined over ICI with one collective (`pmax` for max aggregation — max is
idempotent, so duplicate boundary handling is free — `psum` for sum/mean).

Compute/communication overlap: the combine collective of layer ℓ overlaps
with the next stage's local compute under XLA's async collectives; the
explicit `shard_map` keeps the partials chip-local until the single combine.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from radargnn_tpu.ops.segment import segment_count

_NEG = -jnp.inf


def _local_partials(reducer: str, data, segment_ids, num_segments, mask):
    """Shard-local reduction with combinable partials (max keeps -inf for
    empty segments so the cross-chip pmax is exact)."""
    if reducer == "max":
        filled = jnp.where(mask[:, None], data, _NEG)
        out = jax.ops.segment_max(filled, segment_ids,
                                  num_segments=num_segments)
    elif reducer in ("sum", "add", "mean"):
        filled = jnp.where(mask[:, None], data, 0)
        out = jax.ops.segment_sum(filled, segment_ids,
                                  num_segments=num_segments)
    else:
        raise ValueError(reducer)
    cnt = segment_count(segment_ids, num_segments, mask)
    return out, cnt


def partitioned_segment_reduce(reducer: str, data: jnp.ndarray,
                               segment_ids: jnp.ndarray, num_segments: int,
                               mask: jnp.ndarray, mesh: Mesh,
                               axis: str = "model") -> jnp.ndarray:
    """Segment reduction with the edge axis sharded over `axis`.

    data [E, D], segment_ids [E], mask [E] — sharded on the mesh `axis`;
    returns the replicated [num_segments, D] aggregate with the same
    semantics as radargnn_tpu.ops.segment_reduce (empty segments → 0).
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis)),
             out_specs=P(), check_vma=False)
    def reduce_shard(d, ids, m):
        out, cnt = _local_partials(reducer, d, ids, num_segments, m)
        if reducer == "max":
            out = jax.lax.pmax(out, axis)
        else:
            out = jax.lax.psum(out, axis)
        cnt = jax.lax.psum(cnt, axis)
        if reducer == "mean":
            out = jnp.where(cnt[:, None] > 0,
                            out / jnp.maximum(cnt[:, None], 1).astype(out.dtype),
                            0)
        else:
            out = jnp.where(cnt[:, None] > 0, out, 0).astype(data.dtype)
        return out

    return reduce_shard(data, segment_ids, mask)


def edge_partitioned_aggregate(message_fn: Callable, reducer: str,
                               x: jnp.ndarray, senders: jnp.ndarray,
                               receivers: jnp.ndarray, edge_attr: jnp.ndarray,
                               edge_mask: jnp.ndarray, mesh: Mesh,
                               axis: str = "model") -> jnp.ndarray:
    """Full edge-partitioned message+aggregate step.

    `message_fn(x_r, x_s, e) -> m` is applied to each chip's edge shard
    (gathering boundary node features from the replicated node array — the
    all-gather analog of halo exchange), followed by the local reduction and
    one ICI combine.
    """
    num_nodes = x.shape[0]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
             out_specs=P(), check_vma=False)
    def step(x_full, s, r, e, m):
        msg = message_fn(x_full[r], x_full[s], e)
        out, cnt = _local_partials(reducer, msg, r, num_nodes, m)
        if reducer == "max":
            out = jax.lax.pmax(out, axis)
        else:
            out = jax.lax.psum(out, axis)
        cnt = jax.lax.psum(cnt, axis)
        if reducer == "mean":
            out = jnp.where(cnt[:, None] > 0,
                            out / jnp.maximum(cnt[:, None], 1).astype(out.dtype), 0)
        else:
            out = jnp.where(cnt[:, None] > 0, out, 0).astype(msg.dtype)
        return out

    return step(x, senders, receivers, edge_attr, edge_mask)
