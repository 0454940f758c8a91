"""CLI: full pipeline (create dataset → train → evaluate).

Parity: `main.py:12-61` in /root/reference — the next model folder is
computed up-front so the evaluation step targets the model `train` writes.
"""

from __future__ import annotations

import argparse
import os

from radargnn_tpu.cli.create_dataset import main as create_dataset
from radargnn_tpu.cli.evaluate import main as evaluate
from radargnn_tpu.cli.train import main as train
from radargnn_tpu.train.trainer import get_new_result_folder_path


def main(path_to_dataset: str, path_to_results: str, path_to_config: str) -> None:
    path_to_graph_data = f"{path_to_dataset}/processed"
    path_to_model_folder = get_new_result_folder_path(path_to_results)

    print("\n============ CREATING GRAPH DATASET =============\n")
    create_dataset(path_to_dataset, path_to_config)

    print("\n================ TRAINING MODEL =================\n")
    train(path_to_graph_data, path_to_results, path_to_config)

    print("\n================ EVALUATING MODEL ===============\n")
    evaluate(path_to_dataset, path_to_model_folder, path_to_config)


def cli() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--results", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    if not os.path.isdir(args.dataset):
        raise SystemExit("Invalid path for dataset folder")
    if not os.path.isdir(args.results):
        raise SystemExit("Invalid path for results folder")
    if not os.path.isfile(args.config):
        raise SystemExit("Invalid path to config file")
    main(args.dataset, args.results, args.config)


if __name__ == "__main__":
    cli()
