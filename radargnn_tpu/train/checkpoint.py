"""Checkpointing: msgpack model snapshots + resumable training state.

The reference only saves at end-of-training (whole-model pickle,
`gnn/trainer.py:311-376` in /root/reference) with no resume path. Here:

  * `save_variables` / `load_variables`: {'params', 'batch_stats'} snapshots
    as flax msgpack — the `trained_model.pt` analog,
  * `save_train_state` / `load_train_state`: full mid-training state
    (params, batch_stats, opt_state, epoch, loss history, scheduler lr) for
    crash-resume — a TPU-native addition (SURVEY.md §5 checkpoint/resume).

Backends: "msgpack" (default; single-host, gathers arrays to host) or
"orbax" (`backend="orbax"` / env RADARGNN_CKPT_BACKEND=orbax) — orbax
writes sharded `jax.Array`s directly from their devices, the multi-host
production path. `load_train_state` auto-detects the on-disk format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
from flax import serialization


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    variables = jax.device_get(variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_variables(path: str, target: Dict[str, Any] = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        raw = f.read()
    state = serialization.msgpack_restore(raw)
    if target is not None:
        state = serialization.from_state_dict(target, state)
    return state


def save_train_state(folder: str, *, params, batch_stats, opt_state, epoch: int,
                     losses: Dict[str, list], scheduler_lr: float,
                     extra: Dict[str, Any] = None,
                     backend: str = None) -> None:
    backend = backend or os.environ.get("RADARGNN_CKPT_BACKEND", "msgpack")
    os.makedirs(folder, exist_ok=True)
    meta = {"epoch": epoch, "scheduler_lr": float(scheduler_lr),
            "losses": {k: [float(x) for x in v] for k, v in losses.items()}}
    if extra:
        meta.update(extra)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        tree = {"params": params, "batch_stats": batch_stats,
                "opt_state": serialization.to_state_dict(opt_state)}
        path = os.path.abspath(os.path.join(folder, "orbax"))
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
    else:
        save_variables(os.path.join(folder, "model.msgpack"),
                       {"params": params, "batch_stats": batch_stats})
        with open(os.path.join(folder, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.device_get(serialization.to_state_dict(opt_state))))
    with open(os.path.join(folder, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_train_state(folder: str, opt_state_target=None):
    orbax_path = os.path.abspath(os.path.join(folder, "orbax"))
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(orbax_path)
        model = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
        opt_sd = tree["opt_state"]
    else:
        model = load_variables(os.path.join(folder, "model.msgpack"))
        with open(os.path.join(folder, "opt_state.msgpack"), "rb") as f:
            opt_sd = serialization.msgpack_restore(f.read())
    if opt_state_target is not None:
        opt_sd = serialization.from_state_dict(opt_state_target, opt_sd)
    with open(os.path.join(folder, "meta.json")) as f:
        meta = json.load(f)
    return model, opt_sd, meta
