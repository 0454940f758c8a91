"""Trainer: jitted train/eval steps, epoch loop, artifacts, checkpoints.

Capability parity with the reference `Trainer` (`gnn/trainer.py:21-442` in
/root/reference): Adam + L2 weight decay, the three LR schedules, weighted
cross entropy with separate validation weights, Huber box loss on
non-background nodes, orientation-angle adaption, early stopping on val-loss
minima, best-validation model retention, numbered `model_NN` result folders
with config JSONs / loss .npy arrays / loss-curve PNG.

TPU-native design:
  * one jitted, donated train step: forward + masked losses + backward +
    optax update, all on device; the per-node Python Huber loop
    (`trainer.py:193-206`) becomes a masked mean,
  * learning rate is an injected optax hyper-parameter — epoch schedules
    never recompile,
  * batches are `GraphBatch` pytrees sharded over the mesh `data` axis;
    gradients all-reduce over ICI automatically under jit,
  * faithful BatchNorm quirk: the reference never calls `model.eval()`
    (`trainer.py:251-273`), so validation also runs train-mode BatchNorm and
    updates running stats; we replicate that by default,
  * mid-training checkpoint/resume every `checkpoint_every_epochs`.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
from radargnn_tpu.graph.batch import GraphBatch
from radargnn_tpu.models.detnet import DetNet
from radargnn_tpu.parallel.mesh import shard_batch
from radargnn_tpu.train import checkpoint as ckpt
from radargnn_tpu.train.losses import adapt_bb_orientation_angle, detection_loss
from radargnn_tpu.train.schedules import make_scheduler
from radargnn_tpu.utils.properties import ClassDistribution


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: object
    step: jnp.ndarray


def set_seeds(seed: int) -> jax.Array:
    """Determinism knob: seeds numpy and returns the jax PRNG key.

    Parity: `gnn/trainer.py:439-442` (torch_geometric.seed_everything +
    cudnn-deterministic; on TPU, XLA reductions are already deterministic).
    """
    np.random.seed(seed)
    return jax.random.key(seed)


def _make_optimizer(learning_rate: float, weight_decay: float):
    """torch.optim.Adam(lr, weight_decay) parity: L2 added to the gradient
    before the Adam moments (`gnn/trainer.py:70-71`)."""
    return optax.inject_hyperparams(_adam_chain)(
        learning_rate=learning_rate, weight_decay=weight_decay)


def _adam_chain(learning_rate, weight_decay):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),   # scales by -lr
    )


class Trainer:
    """GNN trainer. `fit(data_loaders)` runs the full training."""

    def __init__(self, config: TrainingConfig, model: DetNet, variables: dict,
                 mesh=None):
        self.config = config
        self.model = model
        self.mesh = mesh

        self.train_loss = []
        self.train_loss_cls = []
        self.train_loss_bb = []
        self.valid_loss = []
        self.model_lowest_valid: dict = {}

        # class weights (`gnn/trainer.py:89-103`)
        if config.set_weights_according_radar_scenes_distribution:
            w = list(ClassDistribution.get_class_weights().values())
            vw = w
        else:
            w = list(config.class_weights.values())
            vw = list(config.val_class_weights.values())
        self._weights = jnp.asarray(w, dtype=jnp.float32)
        self._val_weights = jnp.asarray(vw, dtype=jnp.float32)

        if mesh is not None and "model" in mesh.axis_names \
                and getattr(config, "shard_params_over_model", False):
            # tensor parallelism: column-parallel kernels over 'model';
            # GSPMD partitions the matmuls from these input shardings alone
            from radargnn_tpu.parallel.tensor import (
                apply_param_shardings, detnet_param_shardings,
            )
            sh = detnet_param_shardings(mesh, variables["params"])
            variables = dict(variables, params=apply_param_shardings(
                variables["params"], sh))

        self.tx = _make_optimizer(config.learning_rate,
                                  config.regularization_strength)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32))

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._train_scan = self._build_train_scan()

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _halo_perm(self, a, batch: GraphBatch):
        """Shard-major node permutation for halo batches (a: [G, N, ...])."""
        from radargnn_tpu.parallel.halo_windowed import shard_major_nodes

        dp, mp = batch.halo_geometry[5], batch.halo_geometry[6]
        return shard_major_nodes(a, batch.num_graphs, batch.max_nodes, dp, mp)

    def _forward(self, params, batch_stats, batch: GraphBatch, train: bool):
        from radargnn_tpu.models.layers import FUSED_NODE_BLOCK

        variables = {"params": params, "batch_stats": batch_stats}
        if batch.halo_geometry is not None and self.mesh is not None:
            # halo-partitioned path: node arrays go shard-major flat (each
            # (data, model) device owns a contiguous row block); edge
            # features ride pre-gathered in the plan bundle
            halo = batch.flat_halo(self.mesh)
            return self.model.apply(
                variables, self._halo_perm(batch.node_feat, batch),
                batch.flat_edges(), batch.flat_senders(),
                batch.flat_receivers(),
                self._halo_perm(batch.node_mask, batch),
                batch.edge_mask.reshape(-1),
                train=train, halo=halo,
                mutable=["batch_stats"] if train else False)
        tiling = batch.flat_tiling(FUSED_NODE_BLOCK) \
            if getattr(self.model.config, "use_fused_aggregation", False) \
            else None
        return self.model.apply(
            variables, batch.flat_nodes(), batch.flat_edges(),
            batch.flat_senders(), batch.flat_receivers(),
            batch.node_mask.reshape(-1), batch.edge_mask.reshape(-1),
            train=train, tiling=tiling,
            mutable=["batch_stats"] if train else False)

    def _loss_terms(self, logits, bb, batch: GraphBatch, weights):
        cfg = self.config
        halo = batch.halo_geometry is not None and self.mesh is not None
        if halo:
            # model outputs are in shard-major node order — permute the
            # targets identically (the loss is a masked mean, order-free)
            labels = self._halo_perm(batch.labels, batch)
            boxes = self._halo_perm(batch.boxes, batch)
            node_mask = self._halo_perm(batch.node_mask, batch)
        else:
            labels = batch.labels.reshape(-1)
            boxes = batch.boxes.reshape(-1, batch.boxes.shape[-1])
            node_mask = batch.node_mask.reshape(-1)
        if cfg.adapt_orientation_angle and boxes.shape[-1] == 5:
            boxes = adapt_bb_orientation_angle(boxes)
        return detection_loss(
            logits, bb, labels, boxes, weights,
            cfg.bg_index, cfg.cls_loss_weight, cfg.bb_loss_weight,
            node_mask)

    def _build_train_step(self):
        def train_step(state: TrainState, batch: GraphBatch):
            def loss_fn(params):
                (logits, bb), updates = self._forward(
                    params, state.batch_stats, batch, train=True)
                total, l_cls, l_bb = self._loss_terms(
                    logits, bb, batch, self._weights)
                return total, (l_cls, l_bb, updates["batch_stats"])

            grads, (l_cls, l_bb, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            total = (self.config.cls_loss_weight * l_cls
                     + self.config.bb_loss_weight * l_bb)
            new_state = TrainState(params=params, batch_stats=new_stats,
                                   opt_state=opt_state, step=state.step + 1)
            return new_state, (total, l_cls, l_bb)

        self.train_step_fn = train_step        # unjitted body (scan/compose)
        return jax.jit(train_step, donate_argnums=(0,))

    def _build_train_scan(self):
        def train_scan(state: TrainState, batches: GraphBatch):
            """K train steps in one dispatch; batches have leading scan axis."""
            def body(state, batch):
                new_state, losses = self.train_step_fn(state, batch)
                return new_state, jnp.stack(losses)

            return jax.lax.scan(body, state, batches)

        # donate the carried state like the single-step path — otherwise
        # scan dispatches hold two live copies of params+opt_state
        return jax.jit(train_scan, donate_argnums=(0,))

    def _build_eval_step(self):
        @jax.jit
        def eval_step(state: TrainState, batch: GraphBatch):
            # Reference quirk: validation runs train-mode BatchNorm and keeps
            # the running-stat updates (`gnn/trainer.py:251-273` never calls
            # model.eval()).
            (logits, bb), updates = self._forward(
                state.params, state.batch_stats, batch, train=True)
            total, l_cls, l_bb = self._loss_terms(
                logits, bb, batch, self._val_weights)
            return updates["batch_stats"], total

        return eval_step

    # ------------------------------------------------------------------
    # epoch loop
    # ------------------------------------------------------------------

    def fit(self, data_loaders: Dict[str, object],
            resume_from: Optional[str] = None,
            checkpoint_dir: Optional[str] = None,
            verbose: bool = True) -> None:
        cfg = self.config
        scheduler = make_scheduler(cfg)
        start_epoch = 1

        if resume_from:
            model_vars, opt_sd, meta = ckpt.load_train_state(
                resume_from, self.state.opt_state)
            self.state = TrainState(
                params=model_vars["params"],
                batch_stats=model_vars["batch_stats"],
                opt_state=opt_sd, step=self.state.step)
            scheduler.lr = meta["scheduler_lr"]
            start_epoch = meta["epoch"] + 1
            for name, dest in (("train", self.train_loss),
                               ("train_cls", self.train_loss_cls),
                               ("train_bb", self.train_loss_bb),
                               ("valid", self.valid_loss)):
                dest.extend(meta["losses"].get(name, []))

        start_time = time.time()
        early_stopping_triggers = 0

        for epoch in range(start_epoch, cfg.epochs + 1):
            loss_train, loss_cls, loss_bb = self._train_epoch(
                data_loaders["train"], verbose)
            loss_valid = self._eval_epoch(data_loaders["validate"])

            self.train_loss.append(loss_train)
            self.train_loss_cls.append(loss_cls)
            self.train_loss_bb.append(loss_bb)
            self.valid_loss.append(loss_valid)

            new_lr = scheduler.step(loss_valid)
            self.state = self.state.replace(opt_state=_set_lr(
                self.state.opt_state, new_lr))

            if loss_valid <= min(self.valid_loss):
                # keep the snapshot ON DEVICE: jax arrays are immutable, so
                # holding the references is a zero-cost deepcopy (the
                # reference's trainer.py:128-130 deep-copies host-side);
                # device_get happens once in save_results
                self.model_lowest_valid = {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                    "epoch": epoch}

            if verbose:
                print(f">>> Epoch: {epoch}/{cfg.epochs}, "
                      f"loss_train: {round(loss_train, 5)}, "
                      f"loss_valid: {round(loss_valid, 5)}")

            if checkpoint_dir and cfg.checkpoint_every_epochs and \
                    epoch % cfg.checkpoint_every_epochs == 0:
                self._checkpoint(checkpoint_dir, epoch, scheduler.lr)

            # early stopping (`gnn/trainer.py:136-146`)
            if loss_valid > min(self.valid_loss):
                early_stopping_triggers += 1
                if verbose:
                    print("Trigger Times:", early_stopping_triggers)
                if early_stopping_triggers >= cfg.early_stopping_patience:
                    if verbose:
                        print("Early stopping!")
                    break
            else:
                early_stopping_triggers = 0

        if verbose:
            hours = (time.time() - start_time) / 3600
            print(f">>> Overall training duration: {round(hours, 2)} hours")

    def _edges_in(self, batch) -> int:
        # stack_samples always sets host metadata; the device pull is a
        # stats-only fallback for hand-built batches (no id()-keyed caching —
        # CPython reuses ids after GC, which returned stale counts)
        v = getattr(batch, "host_valid_edges", None)
        if v is not None:
            return v
        return int(np.asarray(batch.edge_mask).sum())

    def _train_epoch(self, loader, verbose=False):
        from radargnn_tpu.utils.profiling import StepStats

        stats = StepStats()
        sums = np.zeros(3)
        n = 0
        k = max(int(getattr(self.config, "scan_steps_per_dispatch", 1)), 1)
        pending = []

        def flush():
            nonlocal n
            if not pending:
                return
            t0 = time.time()
            num_edges = sum(self._edges_in(b) for b in pending)
            if len(pending) == 1:
                self.state, losses = self._train_step(self.state, pending[0])
                sums[:] += np.asarray(jax.device_get(losses))
            else:
                stacked = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *pending)
                self.state, losses = self._train_scan(self.state, stacked)
                sums[:] += np.asarray(jax.device_get(losses)).sum(axis=0)
            stats.record(time.time() - t0, num_edges)
            n += len(pending)
            pending.clear()

        for batch in loader:
            pending.append(shard_batch(batch, self.mesh))
            if len(pending) == k:
                flush()
        flush()

        self.last_epoch_stats = stats
        if verbose:
            s = stats.summary()
            print(f">>> epoch throughput: {s['edges_per_s']:.0f} edges/s "
                  f"over {n} batches")
        return tuple(sums / max(n, 1))

    def _eval_epoch(self, loader):
        total = 0.0
        n = 0
        for batch in loader:
            batch = shard_batch(batch, self.mesh)
            new_stats, loss = self._eval_step(self.state, batch)
            self.state = self.state.replace(batch_stats=new_stats)
            total += float(jax.device_get(loss))
            n += 1
        return total / max(n, 1)

    def _checkpoint(self, folder, epoch, lr):
        ckpt.save_train_state(
            folder, params=self.state.params, batch_stats=self.state.batch_stats,
            opt_state=jax.device_get(
                serialization.to_state_dict(self.state.opt_state)),
            epoch=epoch,
            losses={"train": self.train_loss, "train_cls": self.train_loss_cls,
                    "train_bb": self.train_loss_bb, "valid": self.valid_loss},
            scheduler_lr=lr)

    # ------------------------------------------------------------------
    # artifacts (`gnn/trainer.py:311-376`)
    # ------------------------------------------------------------------

    def save_results(self, path: str, model_config: GNNArchitectureConfig,
                     dataset_config_dict: dict) -> None:
        folder_path = get_new_result_folder_path(path)
        os.makedirs(folder_path)

        json_dict = {"GNN_ARCHITECTURE_CONFIG": asdict(model_config),
                     "TRAINING_CONFIG": asdict(self.config)}
        with open(f"{folder_path}/gnn_configs.json", "w") as f:
            json.dump(json_dict, f, indent=4)
        with open(f"{folder_path}/dataset_configs.json", "w") as f:
            json.dump(dataset_config_dict, f, indent=4)

        ckpt.save_variables(f"{folder_path}/trained_model.msgpack",
                            {"params": self.state.params,
                             "batch_stats": self.state.batch_stats})
        if self.model_lowest_valid:
            ep = self.model_lowest_valid["epoch"]
            ckpt.save_variables(
                f"{folder_path}/trained_model_low_val_ep{ep}.msgpack",
                {"params": self.model_lowest_valid["params"],
                 "batch_stats": self.model_lowest_valid["batch_stats"]})

        for name, data in (("loss_train", self.train_loss),
                           ("loss_validation", self.valid_loss),
                           ("loss_train_cls", self.train_loss_cls),
                           ("loss_train_bb", self.train_loss_bb)):
            with open(f"{folder_path}/{name}.npy", "wb") as f:
                np.save(f, np.array([data]))

        fig, _ = self.show_learning_curves()
        fig.savefig(f"{folder_path}/loss_curves.png")

    def show_learning_curves(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(range(len(self.train_loss)), self.train_loss)
        ax.plot(range(len(self.valid_loss)), self.valid_loss)
        ax.plot(range(len(self.train_loss_cls)), self.train_loss_cls)
        ax.plot(range(len(self.train_loss_bb)), self.train_loss_bb)
        plt.legend(["Training loss", "Validation loss",
                    "Training loss classification", "Training loss bounding box"])
        plt.title("Training and validation loss")
        ax.grid("minor")
        plt.xlabel("epoch")
        plt.ylabel("loss")
        return fig, ax


def _set_lr(opt_state, lr: float):
    """Replaces the injected learning-rate hyper-parameter (no recompile)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_new_result_folder_path(path: str) -> str:
    """Numbered model_NN folders. Parity: `gnn/trainer.py:394-436`."""
    import glob

    folders = glob.glob(path + "/*/")
    if len(folders) == 0:
        folder_name = "model_01"
    else:
        numbers = []
        for folder in folders:
            number = 0
            i = 2
            while True:
                try:
                    number = int(folder[-i:-1])
                    i += 1
                except Exception:
                    break
            numbers.append(number)
        next_number = max(numbers) + 1
        folder_name = f"model_{next_number:02d}"
    return f"{path}/{folder_name}"
