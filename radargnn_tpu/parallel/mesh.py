"""Device-mesh construction and sharding rules.

The reference has no distributed training at all (SURVEY.md §2c); this module
is the TPU-native scaling layer: a `jax.sharding.Mesh` with axes

    data   — data parallelism: the leading graph axis [G, ...] of a
             GraphBatch is sharded; XLA inserts the gradient psum over ICI,
    model  — edge partitioning: the per-graph edge axis is sharded inside
             `shard_map` regions (see radargnn_tpu.parallel.edge_partition)
             with max/psum combine collectives over ICI.

Parameters and optimizer state are replicated (the MLPs are far below the
size where tensor parallelism pays off — ≤224 wide).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Builds a mesh from {"axis": size} with -1 meaning "all remaining".

    Default: all devices on the `data` axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    axes = dict(axes) if axes else {"data": n}
    # resolve -1
    known = 1
    wild = None
    for k, v in axes.items():
        if v == -1:
            wild = k
        else:
            known *= v
    if wild is not None:
        axes[wild] = max(1, n // known)
    total = int(np.prod(list(axes.values())))
    if total > n:
        raise ValueError(f"mesh {axes} needs {total} devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (graph) axis over 'data'; everything else replicated."""
    axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh]):
    """Places every GraphBatch array with its leading graph axis sharded on
    the mesh 'data' axis. No-op without a mesh."""
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initializes jax.distributed for multi-host (DCN) execution.

    On a multi-host TPU slice, call this before any jax op; afterwards
    `jax.devices()` spans all hosts and `make_mesh` lays the `data` axis
    across hosts (gradient all-reduce rides DCN between hosts, ICI within).
    No-ops cleanly in single-process settings.
    """
    import jax as _jax

    if num_processes in (None, 1):
        return
    _jax.distributed.initialize(coordinator_address=coordinator_address,
                                num_processes=num_processes,
                                process_id=process_id)
