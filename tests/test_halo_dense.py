"""Halo edge partitioning composed with the DENSE (v4) kernel family.

r4 verdict item 3: multi-chip previously required the windowed kernels
(2× slower per shard than the dense headline path). These tests pin the
composition end-to-end: per-shard dense slot layouts, halo edges on the
overflow list against augmented rows (ovf_sorted=False), the batched
sharded aggregation on the 8-virtual-device CPU mesh, loader-shared
budgets, and Trainer loss parity against the single-device XLA path.
No reference equivalent exists (SURVEY.md §2c — the reference is
single-GPU, `gnn/trainer.py` in /root/reference).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_halo_training import _arch, _samples

DENSE = {"mode": "dense", "node_block": 16, "r_tile": 8, "k": 8,
         "window_blocks": 2, "ovf_frac": 0.6}
HALO = {"dp": 2, "mp": 2, "ovf_frac": 0.8}


def _halo_dense_batch(samples, max_nodes=64, max_edges=None):
    from radargnn_tpu.graph.batch import halo_dataset_budgets, stack_samples

    max_edges = max_edges or max(s.num_edges for s in samples)
    max_edges = -(-max_edges // 16) * 16
    budgets = halo_dataset_budgets(samples, max_nodes, max_edges, 5, DENSE,
                                   HALO)
    return stack_samples(samples, max_nodes, 5, max_edges, csr_tiling=DENSE,
                         halo_partition=dict(HALO, budgets=budgets))


def test_batched_halo_dense_matches_xla():
    """halo_dense_hoisted_max_batched on a data×model mesh must match the
    single-device XLA hoisted max per graph — forward and all gradients
    (the dense strict routing is exact by construction, so gradient parity
    holds without a bf16 trade)."""
    from radargnn_tpu.ops.segment import hoisted_segment_max
    from radargnn_tpu.parallel.halo_windowed import (
        halo_hoisted_max_batched, shard_major_nodes,
    )
    from radargnn_tpu.parallel.mesh import make_mesh

    samples = _samples()
    batch = _halo_dense_batch(samples)
    g, n = batch.node_mask.shape
    d = batch.node_feat.shape[-1]
    de = batch.edge_feat.shape[-1]
    h = 16
    rng = np.random.default_rng(0)
    w_s = jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.4)
    w_e = jnp.asarray(rng.normal(size=(de, h)).astype(np.float32) * 0.4)
    offset = jnp.asarray(rng.normal(size=(g, n, h)).astype(np.float32))

    mesh = make_mesh({"data": 2, "model": 2})
    bundle = batch.flat_halo(mesh)
    assert bundle is not None
    assert bundle.geometry[9] == "dense"
    dp, mp = batch.halo_geometry[5], batch.halo_geometry[6]
    assert (dp, mp) == (2, 2)
    # real boundary traffic + real overflow (halo edges always ride it)
    assert int(np.asarray(batch.halo_send_idx >= 0).sum()) > 8
    assert int(np.asarray(batch.halo_ovf_r >= 0).sum()) > 8

    perm = lambda a: shard_major_nodes(a, g, n, dp, mp)  # noqa: E731

    def f_halo(x, w_s_, w_e_, off):
        return halo_hoisted_max_batched(perm(x), w_s_, w_e_, perm(off),
                                        bundle)

    def f_xla(x, w_s_, w_e_, off):
        outs = []
        for i in range(g):
            op = (x[i] @ w_s_)[batch.senders[i]] \
                + batch.edge_feat[i] @ w_e_
            outs.append(hoisted_segment_max(
                op, batch.receivers[i], n, batch.edge_mask[i], False,
                off[i]))
        return perm(jnp.stack(outs))

    args = (batch.node_feat, w_s, w_e, offset)
    got = np.asarray(f_halo(*args))
    want = np.asarray(f_xla(*args))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    g_h = jax.grad(lambda *a: (f_halo(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(
        *args)
    g_d = jax.grad(lambda *a: (f_xla(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(
        *args)
    for nm, a, b in zip(("x", "w_s", "w_e", "offset"), g_h, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_halo_dense_trainer_matches_single_device():
    """Trainer steps on the (data × model) mesh through the dense halo path
    must track the single-device XLA-path loss trajectory."""
    from radargnn_tpu.configs import TrainingConfig
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.parallel.mesh import make_mesh
    from radargnn_tpu.train.trainer import Trainer

    samples = _samples(n_frames=8)
    tcfg = TrainingConfig(dataset="radarscenes", learning_rate=1e-3,
                          epochs=2, batch_size=4, shuffle=False, bg_index=5,
                          adapt_orientation_angle=True)

    halo_loader = GraphDataLoader(samples, 4, False, 5, csr_tiling=DENSE,
                                  halo_partition=dict(HALO), pad_align=16)
    plain_loader = GraphDataLoader(samples, 4, False, 5, pad_align=16,
                                   max_nodes=halo_loader.max_nodes,
                                   max_edges=halo_loader.max_edges)

    example = stack_samples(samples[:4], halo_loader.max_nodes, 5,
                            halo_loader.max_edges)
    arch = _arch(example.node_feat.shape[-1], example.edge_feat.shape[-1])
    key = jax.random.key(0)
    model, variables = create_detnet_state(arch, key, example)

    mesh = make_mesh({"data": 2, "model": 2})
    t_halo = Trainer(tcfg, model, jax.tree.map(jnp.copy, variables),
                     mesh=mesh)
    t_plain = Trainer(tcfg, model, variables, mesh=None)

    losses = {}
    for name, tr, loader in (("halo", t_halo, halo_loader),
                             ("plain", t_plain, plain_loader)):
        ls = []
        for _ in range(2):
            for b in loader:
                tr.state, out = tr._train_step(tr.state, b)
                ls.append(float(out[0]))
        losses[name] = ls

    np.testing.assert_allclose(losses["halo"], losses["plain"],
                               rtol=5e-3, atol=5e-3)


def test_halo_dense_loader_shared_budgets():
    """Every dense-halo batch from one loader must share identical static
    shapes and halo_geometry (one compiled executable), and the geometry
    must carry the dense marker the dispatcher keys on."""
    from radargnn_tpu.data.loader import GraphDataLoader

    samples = _samples(n_frames=6, n_points=40, seed=9)
    loader = GraphDataLoader(samples, 2, False, 5, csr_tiling=DENSE,
                             halo_partition=dict(HALO), pad_align=16)
    batches = list(loader)
    assert len(batches) == 3
    geo = batches[0].halo_geometry
    assert geo[9] == "dense" and geo[10] == DENSE["r_tile"] \
        and geo[11] == DENSE["k"]
    for b in batches[1:]:
        assert b.halo_geometry == geo
        for f in ("halo_send_idx", "halo_e_t", "halo_recv_t",
                  "halo_tile_win", "halo_ovf_s"):
            assert getattr(b, f).shape == getattr(batches[0], f).shape


def test_cli_halo_accepts_dense_tiling():
    """The CLI plumbing no longer rejects dense tiling under a model>1 mesh
    (r4 verdict item 3 'lift the cli/train.py restriction')."""
    from radargnn_tpu.cli.train import halo_partition_from_configs
    from radargnn_tpu.configs import GNNArchitectureConfig
    from radargnn_tpu.models.layers import fused_csr_tiling
    from radargnn_tpu.parallel.mesh import make_mesh

    arch = GNNArchitectureConfig(
        node_feature_dimension=5, edge_feature_dimension=2,
        conv_layer_dimensions=[8], classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5],
        use_fused_aggregation=True, fused_tiling="dense",
        halo_overflow_fraction=0.7)
    mesh = make_mesh({"data": 2, "model": 2})
    tiling = fused_csr_tiling(arch, k=5)
    assert isinstance(tiling, dict)
    hp = halo_partition_from_configs(arch, mesh, tiling)
    assert hp == {"dp": 2, "mp": 2, "ovf_frac": 0.7}
