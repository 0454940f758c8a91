"""Scaling-efficiency harness: edges/s at mesh sizes 1 / 2 / ... / N.

North-star requirement (BASELINE.md): scaling efficiency measured at 1 chip,
1 host, and N ≥ 2 hosts. On real multi-chip hardware this measures true ICI
scaling; with `JAX_PLATFORMS=cpu` + `--xla_force_host_platform_device_count=N`
it validates the sharded program logic at every mesh size.

Usage:
    python benchmarks/scaling.py [--graphs-per-device 4] [--points 1024]
Prints one JSON line per mesh size with edges/s and efficiency vs 1 device.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import time


def run_mesh(n_devices: int, graphs_per_device: int, points: int, steps: int,
             dtype: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.parallel.mesh import make_mesh, shard_batch
    from radargnn_tpu.train.trainer import Trainer

    k = 20
    g = graphs_per_device * n_devices
    arch = GNNArchitectureConfig(
        node_feature_dimension=5, edge_feature_dimension=2,
        conv_layer_dimensions=[224, 224, 128, 64, 32],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[16, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[32, 64, 128, 224],
        edge_feature_embedding_layer_dimensions=[4, 8, 16],
        batch_norm_in_mlps=False, compute_dtype=dtype,
        assume_sorted_edges=True)
    tcfg = TrainingConfig(dataset="radarscenes", learning_rate=1e-3, epochs=1,
                          batch_size=g, shuffle=False, bg_index=5,
                          adapt_orientation_angle=True)

    samples = make_samples(num_frames=g, num_points=points, seed=0)
    batch = stack_samples(samples, max_nodes=points, bg_index=5,
                          max_edges=points * k)
    mesh = make_mesh({"data": n_devices},
                     devices=jax.devices()[:n_devices])
    batch = shard_batch(batch, mesh)

    model, variables = create_detnet_state(arch, jax.random.key(0), batch)
    trainer = Trainer(tcfg, model, variables, mesh=mesh)

    noise = jnp.asarray(np.random.default_rng(1).normal(
        size=(steps, 1, 1, batch.node_feat.shape[-1])).astype(np.float32) * 0.01)

    @jax.jit
    def run(state, batch, noise):
        def body(state, eps):
            b = batch.replace(node_feat=batch.node_feat + eps)
            new_state, losses = trainer.train_step_fn(state, b)
            return new_state, losses[0]
        return jax.lax.scan(body, state, noise)

    state, losses = run(trainer.state, batch, noise)
    jax.device_get(losses)
    t0 = time.perf_counter()
    state, losses = run(state, batch, noise)
    jax.device_get(losses)
    dt = time.perf_counter() - t0
    edges = g * points * k * steps
    return edges / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--graphs-per-device", type=int, default=2)
    parser.add_argument("--points", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--cpu", type=int, default=0, metavar="N",
                        help="force an N-virtual-device CPU platform "
                             "(env vars alone don't override the axon "
                             "TPU tunnel's platform pin)")
    args = parser.parse_args()

    if args.cpu:
        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    base = None
    for size in sizes:
        eps = run_mesh(size, args.graphs_per_device, args.points, args.steps,
                       args.dtype)
        if base is None:
            base = eps
        print(json.dumps({
            "metric": "scaling_edges_per_s", "devices": size,
            "value": round(eps, 1), "unit": "edges/s",
            "efficiency_vs_1": round(eps / (base * size), 3),
        }))


if __name__ == "__main__":
    main()
