"""CLI: model training. Parity: `train.py:12-75` in /root/reference."""

from __future__ import annotations

import argparse
import os

import jax

from radargnn_tpu.configs import UserConfigurationReader
from radargnn_tpu.data.loader import get_data_loaders
from radargnn_tpu.graph.batch import stack_samples
from radargnn_tpu.models.detnet import create_detnet_state
from radargnn_tpu.parallel.mesh import make_mesh
from radargnn_tpu.train.trainer import Trainer, set_seeds


def halo_partition_from_configs(model_config, mesh,
                                csr_tiling=None) -> dict | None:
    """Loader `halo_partition` dict for a mesh with model-axis edge
    partitioning; None when the mesh has no model axis. The window-overflow
    budget comes from the first-class `halo_overflow_fraction` config field
    (MODEL_ARCHITECTURE section; see configuration_description.yml).
    Pass the already-derived `csr_tiling` to avoid recomputation."""
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None
    if csr_tiling is None:
        from radargnn_tpu.models.layers import fused_csr_tiling
        csr_tiling = fused_csr_tiling(model_config)
    if csr_tiling is None or (not isinstance(csr_tiling, dict)
                              and len(csr_tiling) < 3):
        raise SystemExit(
            "mesh_axes with model>1 requires use_fused_aggregation with "
            "windowed or dense tiling (the halo path runs the fused "
            "kernels per shard)")
    return {"dp": mesh.shape.get("data", 1),
            "mp": mesh.shape["model"],
            "ovf_frac": getattr(model_config, "halo_overflow_fraction", 0.5)}


def main(path_to_graph_data: str, path_to_results: str,
         path_to_config: str, resume: bool = False) -> None:
    config_dict = UserConfigurationReader.read_config_file(path_to_config)
    model_config = UserConfigurationReader.get_config_object(
        "MODEL_ARCHITECTURE", config_dict)
    training_config = UserConfigurationReader.get_config_object(
        "TRAINING", config_dict)

    print(f"Train devices: {jax.devices()}")

    key = set_seeds(training_config.seed) if training_config.deterministic \
        else jax.random.key(0)

    mesh = make_mesh(training_config.mesh_axes) \
        if training_config.mesh_axes else None

    print(">>> loading data")
    from radargnn_tpu.models.layers import fused_csr_tiling
    graph_k = None
    tiling_mode = getattr(model_config, "fused_tiling", None)
    if tiling_mode in ("dense", "auto"):
        graph_config = UserConfigurationReader.get_config_object(
            "GRAPH_CONSTRUCTION", config_dict)
        is_knn = graph_config.graph_construction_algorithm == "knn"
        if tiling_mode == "dense" and not is_knn:
            raise SystemExit('fused_tiling "dense" requires a kNN graph '
                             "(fixed in-degree); use windowed tiling for "
                             "radius graphs")
        # "auto" resolves to dense for kNN graphs — including under halo
        # edge partitioning since r5 (parallel/halo_dense.py gives each
        # shard its own dense slot layout; halo edges ride the overflow
        # list), so multi-chip no longer pays the windowed-family penalty
        if is_knn:
            graph_k = graph_config.k
    csr_tiling = fused_csr_tiling(model_config, k=graph_k)
    if csr_tiling is None:
        print(">>> fused aggregation: off (unfused XLA aggregation path)")
    elif isinstance(csr_tiling, dict):
        print(f">>> fused aggregation: dense (v4) kernels, "
              f"{csr_tiling['k']} slots/receiver")
    else:
        print(f">>> fused aggregation: windowed (v3) kernels, "
              f"tiling {csr_tiling}")
    # edge partitioning over the mesh 'model' axis: the loader builds
    # per-graph halo plans and the trainer routes conv aggregation
    # through the halo-windowed kernels (parallel/halo_windowed.py)
    halo_partition = halo_partition_from_configs(model_config, mesh,
                                                 csr_tiling)
    if halo_partition is not None:
        print(f">>> halo edge partitioning: {halo_partition}")
    data_loaders, dataset_config_dict = get_data_loaders(
        ["train", "validate"], path_to_graph_data,
        training_config.batch_size, training_config.shuffle,
        bg_index=training_config.bg_index, seed=training_config.seed,
        csr_tiling=csr_tiling, halo_partition=halo_partition)

    print(">>> creating model")
    train_loader = data_loaders["train"]
    example = stack_samples(
        train_loader.samples[:1], train_loader.max_nodes,
        training_config.bg_index, train_loader.max_edges,
        csr_tiling=csr_tiling if halo_partition is None else None)
    model, variables = create_detnet_state(model_config, key, example)

    print(">>> starting training")
    trainer = Trainer(training_config, model, variables, mesh=mesh)
    ckpt_dir = os.path.join(path_to_results, "_checkpoint") \
        if training_config.checkpoint_every_epochs else None
    resume_from = ckpt_dir if (resume and ckpt_dir
                               and os.path.exists(
                                   os.path.join(ckpt_dir, "meta.json"))) \
        else None
    if resume_from:
        print(f">>> resuming from {resume_from}")
    trainer.fit(data_loaders, resume_from=resume_from,
                checkpoint_dir=ckpt_dir)

    trainer.save_results(path_to_results, model_config, dataset_config_dict)


def cli() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--results", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the _checkpoint folder if present")
    args = parser.parse_args()
    if not os.path.isdir(args.data):
        raise SystemExit("Invalid path for graph data folder")
    if not os.path.isdir(args.results):
        raise SystemExit("Invalid path for results folder")
    if not os.path.isfile(args.config):
        raise SystemExit("Invalid path to config file")
    main(args.data, args.results, args.config, resume=args.resume)


if __name__ == "__main__":
    cli()
