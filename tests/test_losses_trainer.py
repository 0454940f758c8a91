"""Losses vs. torch oracles; Trainer end-to-end on synthetic data."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
from radargnn_tpu.train.losses import (
    weighted_cross_entropy, masked_huber_box_loss, adapt_bb_orientation_angle,
    invert_bb_orientation_angle_adaption,
)


def test_weighted_cross_entropy_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(20, 6)).astype(np.float32)
    labels = rng.integers(0, 6, 20)
    w = np.array([1, 1, 1, 1, 1, 0.05], np.float32)

    ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(w))
    ce = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))
    theirs = ce(torch.tensor(logits), torch.tensor(labels)).item()
    assert float(ours) == pytest.approx(theirs, rel=1e-5)


def test_weighted_cross_entropy_mask():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(10, 4)),
                         dtype=jnp.float32)
    labels = jnp.asarray(np.arange(10) % 4)
    w = jnp.ones(4)
    mask = jnp.asarray(np.arange(10) < 6)
    ours = weighted_cross_entropy(logits, labels, w, mask)
    expect = weighted_cross_entropy(logits[:6], labels[:6], w)
    assert float(ours) == pytest.approx(float(expect), rel=1e-6)


def test_masked_huber_matches_reference_loop():
    """Reference semantics: per-node Huber (torch HuberLoss = mean over dims),
    summed over non-bg nodes / count (`gnn/trainer.py:191-206`)."""
    import torch

    rng = np.random.default_rng(2)
    n, bg = 12, 5
    bb_pred = rng.normal(size=(n, 5)).astype(np.float32)
    bb_true = rng.normal(size=(n, 5)).astype(np.float32) * 2
    labels = rng.integers(0, 6, n)
    bb_true[labels == bg] = np.nan

    ours = masked_huber_box_loss(jnp.asarray(bb_pred), jnp.asarray(bb_true),
                                 jnp.asarray(labels), bg)

    huber = torch.nn.HuberLoss()
    loss, num = 0.0, 0
    for i in range(n):
        if labels[i] != bg:
            loss = loss + huber(torch.tensor(bb_true[i]), torch.tensor(bb_pred[i]))
            num += 1
    expect = (loss / num).item() if num else 0.0
    assert float(ours) == pytest.approx(expect, rel=1e-5)


def test_masked_huber_all_background():
    bb = jnp.zeros((4, 5))
    labels = jnp.full((4,), 5)
    assert float(masked_huber_box_loss(bb, bb, labels, 5)) == 0.0


def test_angle_adaption_roundtrip():
    thetas = np.linspace(0, np.pi - 1e-6, 50)
    boxes = np.zeros((50, 5))
    boxes[:, 4] = thetas
    adapted = np.asarray(adapt_bb_orientation_angle(jnp.asarray(boxes)))
    assert (adapted[:, 4] >= -1).all() and (adapted[:, 4] <= 1).all()
    rec = np.asarray(invert_bb_orientation_angle_adaption(
        jnp.asarray(adapted[:, 4])))
    np.testing.assert_allclose(rec, thetas, atol=1e-5)


def test_angle_adaption_nan_passthrough():
    boxes = np.full((3, 5), np.nan)
    out = np.asarray(adapt_bb_orientation_angle(jnp.asarray(boxes)))
    assert np.isnan(out).all()


def test_adam_matches_torch():
    """One optimizer step: optax chain vs torch.optim.Adam(weight_decay)."""
    import torch
    import optax
    from radargnn_tpu.train.trainer import _make_optimizer

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, -0.5, 0.25], np.float32)

    tx = _make_optimizer(1e-2, 1e-3)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=1e-2, weight_decay=1e-3)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


# --------------------------------------------------------------------------
# end-to-end trainer
# --------------------------------------------------------------------------

def _tiny_setup(tmp_path=None, epochs=3):
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer, set_seeds
    from radargnn_tpu.graph.batch import stack_samples

    samples = make_samples(num_frames=6, num_points=150, seed=0)
    train_loader = GraphDataLoader(samples[:4], batch_size=2, shuffle=True,
                                   bg_index=5, seed=0, pad_align=32)
    val_loader = GraphDataLoader(samples[4:], batch_size=2, shuffle=False,
                                 bg_index=5, seed=0,
                                 max_nodes=train_loader.max_nodes,
                                 max_edges=train_loader.max_edges)

    arch = GNNArchitectureConfig(
        node_feature_dimension=samples[0].node_feat.shape[1],
        edge_feature_dimension=samples[0].edge_feat.shape[1],
        conv_layer_dimensions=[16, 16],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[8, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=[16],
        edge_feature_embedding_layer_dimensions=[8],
        batch_norm_in_mlps=False)
    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=3e-3, epochs=epochs, batch_size=2,
        shuffle=True, bg_index=5, exponential_lr_decay_factor=0.95,
        bb_loss_weight=0.5, adapt_orientation_angle=True,
        deterministic=True, seed=123)

    key = set_seeds(tcfg.seed)
    example = stack_samples(samples[:2], train_loader.max_nodes, 5,
                            train_loader.max_edges)
    model, variables = create_detnet_state(arch, key, example)
    trainer = Trainer(tcfg, model, variables)
    return trainer, {"train": train_loader, "validate": val_loader}, arch


def test_trainer_fit_reduces_loss(tmp_path):
    trainer, loaders, arch = _tiny_setup(epochs=4)
    trainer.fit(loaders, verbose=False)
    assert len(trainer.train_loss) == 4
    assert trainer.train_loss[-1] < trainer.train_loss[0]
    assert np.isfinite(trainer.valid_loss).all()
    assert trainer.model_lowest_valid  # best-val copy retained

    trainer.save_results(str(tmp_path), arch, {"dummy": 1})
    folder = os.path.join(str(tmp_path), "model_01")
    for art in ("gnn_configs.json", "dataset_configs.json",
                "trained_model.msgpack", "loss_train.npy",
                "loss_validation.npy", "loss_train_cls.npy",
                "loss_train_bb.npy", "loss_curves.png"):
        assert os.path.exists(os.path.join(folder, art)), art

    # second save → model_02
    trainer.save_results(str(tmp_path), arch, {})
    assert os.path.isdir(os.path.join(str(tmp_path), "model_02"))


def test_trainer_checkpoint_resume(tmp_path):
    trainer, loaders, _ = _tiny_setup(epochs=2)
    trainer.config.checkpoint_every_epochs = 1
    ckpt_dir = str(tmp_path / "ckpt")
    trainer.fit(loaders, checkpoint_dir=ckpt_dir, verbose=False)
    losses_full = list(trainer.train_loss)

    # resume from epoch 2 checkpoint and run nothing more (epochs==2)
    trainer2, loaders2, _ = _tiny_setup(epochs=2)
    trainer2.fit(loaders2, resume_from=ckpt_dir, verbose=False)
    assert trainer2.train_loss == losses_full  # history restored, no new epochs


def test_lr_schedule_updates_without_recompile():
    trainer, loaders, _ = _tiny_setup(epochs=3)
    trainer.fit(loaders, verbose=False)
    lr = float(trainer.state.opt_state.hyperparams["learning_rate"])
    assert lr == pytest.approx(3e-3 * 0.95 ** 3, rel=1e-5)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend: save_train_state(backend="orbax") writes sharded
    jax.Arrays directly (the multi-host production path); load_train_state
    auto-detects the format and restores identical state."""
    import jax

    from radargnn_tpu.train import checkpoint as ckpt

    trainer, loaders, _ = _tiny_setup(epochs=1)
    trainer.fit(loaders, verbose=False)
    st = trainer.state
    folder = str(tmp_path / "orbax_ckpt")
    ckpt.save_train_state(
        folder, params=st.params, batch_stats=st.batch_stats,
        opt_state=st.opt_state, epoch=1,
        losses={"train": list(map(float, trainer.train_loss))},
        scheduler_lr=3e-3, backend="orbax")
    assert os.path.isdir(os.path.join(folder, "orbax"))
    assert not os.path.exists(os.path.join(folder, "model.msgpack"))

    model, opt_sd, meta = ckpt.load_train_state(folder, st.opt_state)
    assert meta["epoch"] == 1 and meta["scheduler_lr"] == 3e-3
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), model["params"], st.params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        jax.tree.leaves(opt_sd), jax.tree.leaves(st.opt_state))
