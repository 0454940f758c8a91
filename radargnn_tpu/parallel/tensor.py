"""Tensor-parallel weight sharding + pipeline stage hooks.

The reference has no distributed training (SURVEY.md §2c); its widest MLP is
464 wide (`configurations/configuration_radarscenes.yml:32` in
/root/reference), far below where tensor parallelism pays for itself on TPU
(a 464-wide matmul is a fraction of one MXU pass). These hooks exist for
capability completeness and for scaled-up derivatives of the architecture:

  * `detnet_param_shardings` — column-parallel (output-dim) NamedShardings
    for every eligible 2-D kernel in a DetNet param tree over the mesh
    `model` axis. Under `jit`, GSPMD partitions the matmuls and inserts the
    (reduce-)collectives; the train step needs no code changes. With the
    fused Pallas aggregation the conv pre-MLP weights enter a `shard_map`
    with replicated in_specs, so GSPMD all-gathers them at region entry —
    correct, and cheap at these widths (weights are KBs).
  * `apply_param_shardings` — device_put of a variables tree onto those
    shardings.
  * `pipeline_stage_assignment` — the layer→stage map for pipeline
    parallelism. PP is documented out of scope for a 5-layer GNN (the
    per-layer compute is far too small to fill a pipeline bubble); the hook
    defines the canonical contiguous stage split so a deeper derivative can
    place stages on a `pipe` mesh axis.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def detnet_param_shardings(mesh: Mesh, params: Dict, axis: str = "model",
                           min_width: int = 2):
    """NamedSharding tree: 2-D kernels shard column-parallel (output dim)
    over `axis` when the output dim divides the axis size; matching biases
    shard the same way; everything else replicates.

    Column-parallel keeps each layer's forward a local matmul producing the
    layer's own output shard; the following row begins with an all-gather
    that GSPMD fuses into the next matmul's operand feed.
    """
    size = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def shard_one(path, leaf):
        if not hasattr(leaf, "ndim"):
            return rep
        if leaf.ndim == 2 and leaf.shape[1] % size == 0 \
                and leaf.shape[1] // size >= min_width:
            return NamedSharding(mesh, P(None, axis))
        if leaf.ndim == 1 and path and path[-1] == "bias" \
                and leaf.shape[0] % size == 0 \
                and leaf.shape[0] // size >= min_width:
            return NamedSharding(mesh, P(axis))
        return rep

    flat = dict(_flatten(params))
    shardings = {path: shard_one(path, leaf) for path, leaf in flat.items()}

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return shardings[prefix]

    return rebuild(params)


def apply_param_shardings(variables: Dict, sharding_tree: Dict) -> Dict:
    """Places a variables/params tree onto the sharding tree (leafwise
    device_put). Arrays whose sharding entry is missing replicate."""
    return jax.tree.map(jax.device_put, variables, sharding_tree)


def pipeline_stage_assignment(conv_layer_dimensions: List[int],
                              num_stages: int) -> List[int]:
    """Contiguous layer→stage split balancing per-layer output widths (a
    proxy for per-layer FLOPs at fixed edge count). Returns stage index per
    conv layer; stages are contiguous and non-empty when
    num_stages <= num_layers."""
    n = len(conv_layer_dimensions)
    if num_stages <= 0:
        raise ValueError("num_stages must be positive")
    num_stages = min(num_stages, n)
    weights = [float(d) for d in conv_layer_dimensions]
    total = sum(weights)
    # greedy prefix split at cumulative-weight boundaries, guaranteeing
    # every stage at least one layer
    bounds = [total * (s + 1) / num_stages for s in range(num_stages)]
    stages, acc, s = [], 0.0, 0
    for i, w in enumerate(weights):
        acc += w
        stages.append(s)
        remaining_layers = n - i - 1
        remaining_stages = num_stages - s - 1
        if s < num_stages - 1 and (acc >= bounds[s]
                                   or remaining_layers == remaining_stages):
            s += 1
    return stages
