"""CLI: model evaluation. Parity: `evaluate.py:13-105` in /root/reference.

Improvement over the reference: the model is reconstructed from the saved
architecture config + msgpack weights (the reference loads a whole-model
pickle and leaves config-based reconstruction as a TODO, `evaluate.py:46-52`).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax

from radargnn_tpu.configs import GNNArchitectureConfig, UserConfigurationReader, \
    dataclass_from_dict
from radargnn_tpu.data.loader import get_data_loaders
from radargnn_tpu.models.detnet import DetNet
from radargnn_tpu.postprocess.evaluation import evaluation_selector
from radargnn_tpu.postprocess.extraction import Postprocessor, PredictionExtractor
from radargnn_tpu.postprocess.inference import Predictor
from radargnn_tpu.train import checkpoint as ckpt


def load_model(path_to_model_folder: str):
    """Rebuild DetNet + variables from gnn_configs.json + msgpack weights."""
    with open(os.path.join(path_to_model_folder, "gnn_configs.json")) as f:
        configs = json.load(f)
    model_config = dataclass_from_dict(
        GNNArchitectureConfig, configs["GNN_ARCHITECTURE_CONFIG"])
    variables = ckpt.load_variables(
        os.path.join(path_to_model_folder, "trained_model.msgpack"))
    variables = jax.tree.map(jax.numpy.asarray, variables)
    return DetNet(model_config), variables


def main(path_to_data: str, path_to_model_folder: str,
         path_to_config: str, batch_size: int = 8,
         plot_predictions: int = 0) -> None:
    path_to_raw_data = os.path.join(path_to_data, "raw")
    path_to_graph_data = os.path.join(path_to_data, "processed")

    config_dict = UserConfigurationReader.read_config_file(path_to_config)
    config = UserConfigurationReader.get_config_object(
        "POSTPROCESSING", config_dict)

    dataset = config_dict["CREATE_DATASET"].get("dataset")
    version = config_dict["CREATE_DATASET"]["DATASET_PROCESSING"].get("version")

    graph_names = sorted(
        glob.glob(f"{path_to_graph_data}/{config.split}/*.npz"))

    # fused-kernel tiling for inference when the model was configured with
    # use_fused_aggregation (without it the Predictor silently falls back
    # to the XLA aggregation path)
    from radargnn_tpu.models.layers import fused_csr_tiling
    model_config = UserConfigurationReader.get_config_object(
        "MODEL_ARCHITECTURE", config_dict)
    graph_k = None
    if getattr(model_config, "fused_tiling", None) in ("dense", "auto"):
        graph_config = UserConfigurationReader.get_config_object(
            "GRAPH_CONSTRUCTION", config_dict)
        if graph_config.graph_construction_algorithm == "knn":
            graph_k = graph_config.k
    csr_tiling = fused_csr_tiling(model_config, k=graph_k)

    eval_loaders, _ = get_data_loaders(
        [config.split], path_to_graph_data, batch_size=batch_size,
        shuffle=False, bg_index=config.bg_index, csr_tiling=csr_tiling)
    eval_loader = eval_loaders[config.split]

    model, variables = load_model(path_to_model_folder)

    predictor = Predictor(model, variables, eval_loader)
    predictions, ground_truth, pos, vel = predictor.predict()

    post_processor = Postprocessor()
    bb_pred, bb_ground_truth, cls_pred, cls_ground_truth = \
        post_processor.process(config, pos, vel, predictions, ground_truth)

    cls_pred_label = PredictionExtractor().extract(predictions)

    EvaluatorCls = evaluation_selector(dataset)
    evaluator = EvaluatorCls(config=config, version=version,
                             dataset_path=path_to_raw_data,
                             model_path=path_to_model_folder)
    evaluator.evaluate(bb_pred, bb_ground_truth, cls_pred, cls_pred_label,
                       cls_ground_truth, vel, graph_names=graph_names)
    eval_folder = evaluator.save_results(path_to_model_folder)

    if plot_predictions and eval_folder:
        from radargnn_tpu.postprocess.visualization import PredictionVisualizer
        names = list(config.min_object_score.keys())
        names.insert(config.bg_index, "background")
        for i in range(min(plot_predictions, len(bb_pred))):
            fig, _ = PredictionVisualizer.plot_detections(
                bb_pred[i], cls_pred[i], label_names=names)
            fig.savefig(os.path.join(eval_folder, f"prediction_{i:03d}.png"))


def cli() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--plot", type=int, default=0,
                        help="save prediction plots for the first N graphs")
    args = parser.parse_args()
    if not os.path.isdir(args.data):
        raise SystemExit("Invalid path for graph data folder")
    if not os.path.isdir(args.model):
        raise SystemExit("Invalid path for model folder")
    if not os.path.isfile(args.config):
        raise SystemExit("Invalid path to config file")
    main(args.data, args.model, args.config, args.batch_size, args.plot)


if __name__ == "__main__":
    cli()
