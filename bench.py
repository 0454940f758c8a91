"""Benchmark: edges/s through the flagship RadarScenes edge-conv train step.

Measures the full jitted training step (forward + backward + Adam update) of
the translation-invariant RadarScenes model (configuration_radarscenes.yml:
k=20 kNN, conv dims [224,224,128,64,32], node/edge embedding MLPs) on
synthetic frames shaped like cropped RadarScenes clouds, and reports
valid-edges processed per second.

Baseline: the reference trains this stack via PyG/torch-scatter on GPU; the
north-star target (BASELINE.md) is ≥5× an A100 PyG baseline per chip. No
measured baseline exists in-repo, so we derive one: the flagship stack costs
≈1.1 MFLOP/edge forward (dominated by the per-edge pre-MLPs: 464²+464²+272²
+144²+80² ≈ 0.53M MACs), ≈3.3 MFLOP/edge for a full train step. A100 PyG
typically sustains ~15% of 156 TFLOP/s TF32 on gather/scatter-bound edge
MLPs → ≈ 23 TFLOP/s / 3.3 MFLOP ≈ 7e6 edges/s. `vs_baseline` is
edges_per_s / 7e6 (target ≥ 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

A100_PYG_EDGES_PER_S = 7e6  # derived estimate, see module docstring


def main():
    import jax
    import numpy as np

    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.synthetic import make_samples, DEFAULT_GRAPH_CONFIG
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer

    # Flagship architecture (configuration_radarscenes.yml TRAIN section).
    arch = GNNArchitectureConfig(
        node_feature_dimension=5, edge_feature_dimension=2,
        conv_layer_dimensions=[224, 224, 128, 64, 32],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[16, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[32, 64, 128, 224],
        edge_feature_embedding_layer_dimensions=[4, 8, 16],
        conv_layer_type="MPNNConv", batch_norm_in_mlps=False)

    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=1e-3, epochs=1, batch_size=8,
        shuffle=False, bg_index=5, bb_loss_weight=0.5,
        regularization_strength=5e-6, adapt_orientation_angle=True)

    # Synthetic frames at RadarScenes scale: ~2.5-3k points, k=20 → 50-60k edges.
    k = DEFAULT_GRAPH_CONFIG.k
    num_points = 2816
    g = 8
    samples = make_samples(num_frames=g, num_points=num_points, seed=0)
    batch = stack_samples(samples, max_nodes=num_points, bg_index=5,
                          max_edges=num_points * k)

    model, variables = create_detnet_state(arch, jax.random.key(0), batch)
    trainer = Trainer(tcfg, model, variables)

    # warmup / compile
    state, _ = trainer._train_step(trainer.state, batch)
    jax.block_until_ready(state.params)

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = trainer._train_step(state, batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    valid_edges = int(np.asarray(jax.device_get(batch.num_valid_edges())))
    edges_per_s = valid_edges * steps / dt

    print(json.dumps({
        "metric": "train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(edges_per_s / A100_PYG_EDGES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
