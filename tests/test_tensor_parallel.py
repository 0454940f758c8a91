"""Tensor-parallel weight sharding + pipeline stage hooks
(parallel/tensor.py — SURVEY.md §2c TP/PP rows; the reference is
single-GPU, so these are capability hooks, perf-neutral at ≤464 widths)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _samples(n_frames=4, n_points=48, k=4, seed=5):
    import dataclasses
    from radargnn_tpu.data.synthetic import make_samples, DEFAULT_GRAPH_CONFIG

    cfg = dataclasses.replace(
        DEFAULT_GRAPH_CONFIG, graph_construction_settings={"k": k, "r": 1.0})
    cfg.__post_init__()
    return make_samples(num_frames=n_frames, num_points=n_points, seed=seed,
                        graph_config=cfg)


def _arch(node_dim, edge_dim):
    from radargnn_tpu.configs import GNNArchitectureConfig
    return GNNArchitectureConfig(
        node_feature_dimension=node_dim, edge_feature_dimension=edge_dim,
        conv_layer_dimensions=[16, 16],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[8, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[8, 16],
        edge_feature_embedding_layer_dimensions=[4, 8],
        conv_layer_type="MPNNConv", batch_norm_in_mlps=False)


def test_detnet_param_shardings_column_parallel():
    """Eligible 2-D kernels shard P(None, 'model'); ineligible leaves
    replicate."""
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.parallel.mesh import make_mesh
    from radargnn_tpu.parallel.tensor import detnet_param_shardings

    samples = _samples()
    batch = stack_samples(samples, 64, 5)
    arch = _arch(batch.node_feat.shape[-1], batch.edge_feat.shape[-1])
    _, variables = create_detnet_state(arch, jax.random.key(0), batch)

    mesh = make_mesh({"data": 2, "model": 2})
    sh = detnet_param_shardings(mesh, variables["params"])

    flat_p = jax.tree.leaves_with_path(variables["params"])
    flat_s = jax.tree.leaves(sh, is_leaf=lambda x: hasattr(x, "spec"))
    n_col = 0
    for (path, leaf), s in zip(flat_p, flat_s):
        if leaf.ndim == 2 and leaf.shape[1] % 2 == 0 and leaf.shape[1] >= 4:
            assert s.spec == P(None, "model"), path
            n_col += 1
        elif leaf.ndim == 2:
            assert s.spec == P()
    assert n_col >= 5, "expected most kernels to shard"


def test_tp_training_matches_replicated():
    """Training with column-parallel params on a data×model mesh must
    reproduce the replicated-parameter loss trajectory, and the state's
    kernels must actually stay sharded across steps."""
    from radargnn_tpu.configs import TrainingConfig
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.parallel.mesh import make_mesh
    from radargnn_tpu.train.trainer import Trainer

    samples = _samples(n_frames=8)
    loader = GraphDataLoader(samples, 4, False, 5, pad_align=16)
    example = stack_samples(samples[:4], loader.max_nodes, 5,
                            loader.max_edges)
    arch = _arch(example.node_feat.shape[-1], example.edge_feat.shape[-1])
    model, variables = create_detnet_state(arch, jax.random.key(0), example)

    mesh = make_mesh({"data": 2, "model": 2})
    tcfg_tp = TrainingConfig(dataset="radarscenes", learning_rate=1e-3,
                             epochs=1, batch_size=4, shuffle=False,
                             bg_index=5, adapt_orientation_angle=True,
                             shard_params_over_model=True)
    tcfg_rep = TrainingConfig(dataset="radarscenes", learning_rate=1e-3,
                              epochs=1, batch_size=4, shuffle=False,
                              bg_index=5, adapt_orientation_angle=True)

    t_tp = Trainer(tcfg_tp, model, jax.tree.map(jnp.copy, variables),
                   mesh=mesh)
    t_rep = Trainer(tcfg_rep, model, variables, mesh=mesh)

    losses = {}
    for name, tr in (("tp", t_tp), ("rep", t_rep)):
        ls = []
        for _ in range(2):
            for b in loader:
                tr.state, out = tr._train_step(tr.state, b)
                ls.append(float(out[0]))
        losses[name] = ls
    np.testing.assert_allclose(losses["tp"], losses["rep"],
                               rtol=1e-4, atol=1e-5)

    # kernels still sharded over 'model' after donated steps
    sharded = [
        leaf for path, leaf in jax.tree.leaves_with_path(t_tp.state.params)
        if hasattr(leaf, "sharding") and leaf.ndim == 2
        and getattr(leaf.sharding, "spec", P()) == P(None, "model")]
    assert sharded, "TP kernels lost their sharding across train steps"


def test_pipeline_stage_assignment():
    from radargnn_tpu.parallel.tensor import pipeline_stage_assignment

    # flagship conv stack, 2 stages: contiguous, non-empty, monotone
    stages = pipeline_stage_assignment([224, 224, 128, 64, 32], 2)
    assert stages == sorted(stages)
    assert set(stages) == {0, 1}
    # width-balanced: the first stage should not swallow everything
    assert stages[0] == 0 and stages[-1] == 1

    # more stages than layers clamps
    stages = pipeline_stage_assignment([64, 32], 4)
    assert stages == [0, 1]

    # single stage
    assert pipeline_stage_assignment([64, 32, 16], 1) == [0, 0, 0]
