"""Multi-chip logic on the 8-virtual-device CPU mesh: mesh construction,
DP sharded training parity, edge-partitioned reductions, driver dry run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radargnn_tpu.parallel.mesh import make_mesh, shard_batch
from radargnn_tpu.parallel.edge_partition import (
    partitioned_segment_reduce, edge_partitioned_aggregate,
)
from radargnn_tpu.ops.segment import segment_reduce


def test_make_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh()
    assert dict(m.shape) == {"data": 8}
    m = make_mesh({"data": -1, "model": 2})
    assert dict(m.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


@pytest.mark.parametrize("reducer", ["max", "sum", "mean"])
def test_partitioned_segment_reduce_matches_single(reducer):
    rng = np.random.default_rng(0)
    E, N, D = 512, 64, 16
    data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, E))
    mask = jnp.asarray(rng.random(E) < 0.8)

    expect = segment_reduce(reducer, data, ids, N, mask)

    mesh = make_mesh({"model": 8})
    got = partitioned_segment_reduce(reducer, data, ids, N, mask, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_partitioned_empty_segments_zero():
    mesh = make_mesh({"model": 8})
    data = jnp.full((8, 4), -5.0)
    ids = jnp.zeros((8,), jnp.int32)
    mask = jnp.ones((8,), bool)
    out = partitioned_segment_reduce("max", data, ids, 3, mask, mesh)
    np.testing.assert_allclose(np.asarray(out[0]), [-5] * 4)
    np.testing.assert_allclose(np.asarray(out[1:]), 0)


def test_edge_partitioned_aggregate_matches_dense():
    rng = np.random.default_rng(1)
    N, E, D, De = 32, 256, 8, 4
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, N, E))
    r = jnp.asarray(rng.integers(0, N, E))
    e = jnp.asarray(rng.normal(size=(E, De)).astype(np.float32))
    mask = jnp.asarray(rng.random(E) < 0.9)
    W = jnp.asarray(rng.normal(size=(2 * D + De, D)).astype(np.float32))

    def message_fn(x_r, x_s, e_):
        return jnp.concatenate([x_r, x_s, e_], axis=-1) @ W

    dense_msg = message_fn(x[r], x[s], e)
    expect = segment_reduce("max", dense_msg, r, N, mask)

    mesh = make_mesh({"model": 8})
    got = edge_partitioned_aggregate(message_fn, "max", x, s, r, e, mask, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_dp_training_matches_single_device():
    """Two training steps: single-device vs data-parallel mesh — identical
    losses (deterministic reductions, replicated params)."""
    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer

    samples = make_samples(num_frames=8, num_points=80, seed=0)
    batch = stack_samples(samples, max_nodes=96, bg_index=5, max_edges=96 * 20)

    arch = GNNArchitectureConfig(
        node_feature_dimension=samples[0].node_feat.shape[1],
        edge_feature_dimension=2, conv_layer_dimensions=[16, 16],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[8, 5], batch_norm_in_mlps=False)
    tcfg = TrainingConfig(dataset="radarscenes", learning_rate=1e-3, epochs=1,
                          batch_size=8, shuffle=False, bg_index=5,
                          adapt_orientation_angle=True)

    losses = {}
    for mode in ("single", "mesh"):
        model, variables = create_detnet_state(arch, jax.random.key(0), batch)
        mesh = make_mesh({"data": 8}) if mode == "mesh" else None
        trainer = Trainer(tcfg, model, variables, mesh=mesh)
        b = shard_batch(batch, mesh)
        state = trainer.state
        ls = []
        for _ in range(2):
            state, losses_step = trainer._train_step(state, b)
            ls.append(float(jax.device_get(losses_step[0])))
        losses[mode] = ls

    np.testing.assert_allclose(losses["mesh"], losses["single"],
                               rtol=1e-5, atol=1e-6)


def test_driver_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_halo_segment_reduce_matches_dense():
    """Halo-exchange partitioning (boundary all_to_all + local/halo split)
    must match the dense reference for max and sum aggregation."""
    import jax.numpy as jnp
    from radargnn_tpu.parallel.halo import build_halo_plan, halo_segment_reduce
    from radargnn_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    p, ns = 8, 16
    n = p * ns
    e = 600
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    mask = rng.random(e) < 0.9
    x = rng.normal(size=(n, 12)).astype(np.float32)
    ef = rng.normal(size=(e, 3)).astype(np.float32)

    def message(xs, ee):
        return xs * 1.5 + ee.sum(axis=-1, keepdims=True)

    mesh = make_mesh({"model": p})
    plan = build_halo_plan(senders, receivers, n, p, edge_mask=mask)

    for reducer in ("max", "sum"):
        got = np.asarray(halo_segment_reduce(
            reducer, jnp.asarray(x), message, jnp.asarray(ef), plan, mesh))
        want = np.zeros((n, 12), np.float32)
        if reducer == "max":
            acc = np.full((n, 12), -np.inf, np.float32)
        else:
            acc = np.zeros((n, 12), np.float32)
        msg = np.asarray(message(x[senders], ef))
        for i in range(e):
            if not mask[i]:
                continue
            if reducer == "max":
                acc[receivers[i]] = np.maximum(acc[receivers[i]], msg[i])
            else:
                acc[receivers[i]] += msg[i]
        want = np.where(np.isinf(acc), 0.0, acc)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=reducer)


def test_halo_reduce_expresses_mpnn_aggregation():
    """The halo-exchange path must express MPNNConv's hoisted max
    aggregation: inner[r] = max over e=(s,r) of (x[s]@W_s + e@W_e), i.e.
    message_fn = affine sender projection + edge projection."""
    import jax.numpy as jnp
    from radargnn_tpu.parallel.halo import build_halo_plan, halo_segment_reduce
    from radargnn_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    p, ns, d, h, de = 8, 12, 6, 10, 3
    n = p * ns
    e = 400
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    x = rng.normal(size=(n, d)).astype(np.float32)
    ef = rng.normal(size=(e, de)).astype(np.float32)
    w_s = rng.normal(size=(d, h)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32)

    def message(xs, ee):
        return xs @ w_s + ee @ w_e

    mesh = make_mesh({"model": p})
    plan = build_halo_plan(senders, receivers, n, p)
    got = np.asarray(halo_segment_reduce(
        "max", jnp.asarray(x), message, jnp.asarray(ef), plan, mesh))

    msg = x[senders] @ w_s + ef @ w_e
    want = np.full((n, h), -np.inf, np.float32)
    for i in range(e):
        want[receivers[i]] = np.maximum(want[receivers[i]], msg[i])
    want = np.where(np.isinf(want), 0.0, want)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("run_cap", [None, 2])
def test_halo_windowed_matches_dense(run_cap):
    """Halo partitioning composed with the windowed Pallas kernels
    (parallel/halo_windowed.py): per-shard local edges run through the
    fused v3 tiles, halo + window-overflow edges through its XLA overflow
    list, boundary features via one all_to_all. Forward AND gradients must
    match the dense single-device hoisted formulation. run_cap=2 covers
    spread tiling (and its leftover-overflow route) on the sharded path."""
    import jax
    import jax.numpy as jnp

    from radargnn_tpu.ops.segment import hoisted_segment_max
    from radargnn_tpu.parallel.halo_windowed import (
        build_halo_windowed_plan, halo_windowed_hoisted_max,
    )
    from radargnn_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    n, e, d, de, h = 64, 400, 12, 6, 16
    shards = 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    w_s = rng.normal(size=(d, h)).astype(np.float32) * 0.4
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.4
    offset = rng.normal(size=(n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    mask = rng.random(e) < 0.9

    plan = build_halo_windowed_plan(senders, receivers, n, shards,
                                    node_block=8, edge_tile=16,
                                    window_blocks=2, edge_mask=mask,
                                    ovf_frac=0.6, run_cap=run_cap)
    assert (plan.halo.halo_senders >= 0).sum() > 20, "need halo traffic"
    if run_cap is not None:
        assert plan.roll_passes == (run_cap - 1).bit_length()
    mesh = make_mesh({"model": shards})

    def f_sharded(x_, w_s_, e_, w_e_, off_):
        return halo_windowed_hoisted_max(x_, w_s_, e_, w_e_, off_, plan,
                                         mesh)

    def f_dense(x_, w_s_, e_, w_e_, off_):
        op = (x_ @ w_s_)[jnp.asarray(senders)] + e_ @ w_e_
        return hoisted_segment_max(op, jnp.asarray(receivers), n,
                                   jnp.asarray(mask), False, off_)

    args = tuple(map(jnp.asarray, (x, w_s, e_feat, w_e, offset)))
    np.testing.assert_allclose(np.asarray(f_sharded(*args)),
                               np.asarray(f_dense(*args)),
                               rtol=1e-4, atol=1e-4)

    g_s = jax.grad(lambda *a: (f_sharded(*a) ** 2).sum(),
                   argnums=(0, 1, 2, 3, 4))(*args)
    g_d = jax.grad(lambda *a: (f_dense(*a) ** 2).sum(),
                   argnums=(0, 1, 2, 3, 4))(*args)
    for nm, a, bb_ in zip(("x", "w_s", "e", "w_e", "offset"), g_s, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_halo_windowed_degenerate_shards():
    """Robustness: shards with zero halo traffic and shards with zero local
    edges must still produce exact results (dummy tiles, empty overflow)."""
    import jax.numpy as jnp

    from radargnn_tpu.ops.segment import hoisted_segment_max
    from radargnn_tpu.parallel.halo_windowed import (
        build_halo_windowed_plan, halo_windowed_hoisted_max,
    )
    from radargnn_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    n, d, de, h = 64, 8, 4, 8
    shards = 4
    ns = n // shards
    # shard 0: internal edges only (no halo); shard 1: NO local edges, only
    # remote senders; shards 2-3: nothing at all (empty)
    senders = np.concatenate([
        rng.integers(0, ns, 40),                  # local to shard 0
        rng.integers(2 * ns, 3 * ns, 25),         # remote (shard 2 owners)
    ]).astype(np.int32)
    receivers = np.concatenate([
        rng.integers(0, ns, 40),
        rng.integers(ns, 2 * ns, 25),             # received on shard 1
    ]).astype(np.int32)
    e = len(senders)
    x = rng.normal(size=(n, d)).astype(np.float32)
    w_s = rng.normal(size=(d, h)).astype(np.float32) * 0.4
    e_feat = rng.normal(size=(e, de)).astype(np.float32)
    w_e = rng.normal(size=(de, h)).astype(np.float32) * 0.4
    offset = rng.normal(size=(n, h)).astype(np.float32)

    plan = build_halo_windowed_plan(senders, receivers, n, shards,
                                    node_block=8, edge_tile=16,
                                    window_blocks=2)
    mesh = make_mesh({"model": shards})
    got = halo_windowed_hoisted_max(jnp.asarray(x), jnp.asarray(w_s),
                                    jnp.asarray(e_feat), jnp.asarray(w_e),
                                    jnp.asarray(offset), plan, mesh)
    op = (x @ w_s)[senders] + e_feat @ w_e
    want = hoisted_segment_max(jnp.asarray(op), jnp.asarray(receivers), n,
                               jnp.ones(e, bool), False,
                               jnp.asarray(offset))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_orbax_checkpoint_sharded_arrays(tmp_path):
    """Orbax saves/restores jax.Arrays sharded over a mesh — the multi-host
    checkpoint path (msgpack would gather to one host)."""
    import os

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radargnn_tpu.parallel.mesh import make_mesh
    from radargnn_tpu.train import checkpoint as ckpt

    mesh = make_mesh({"data": 8})
    sh = NamedSharding(mesh, P("data"))
    params = {"w": jax.device_put(jnp.arange(64.0).reshape(8, 8), sh),
              "b": jax.device_put(jnp.ones((8,)), sh)}
    opt_state = {"m": jax.device_put(jnp.zeros((8, 8)), sh)}

    folder = str(tmp_path / "ck")
    ckpt.save_train_state(folder, params=params, batch_stats={},
                          opt_state=opt_state, epoch=3,
                          losses={"train": [1.0]}, scheduler_lr=1e-3,
                          backend="orbax")
    assert os.path.isdir(os.path.join(folder, "orbax"))
    model, opt_sd, meta = ckpt.load_train_state(folder, opt_state)
    np.testing.assert_array_equal(np.asarray(model["params"]["w"]),
                                  np.arange(64.0).reshape(8, 8))
    np.testing.assert_array_equal(np.asarray(opt_sd["m"]), np.zeros((8, 8)))
    assert meta["epoch"] == 3
