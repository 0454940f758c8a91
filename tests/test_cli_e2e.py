"""End-to-end CLI slice: create_dataset → train → evaluate on a synthetic
RadarScenes-format dataset through the full YAML-configured pipeline.

This is the reference's `main.py` flow (SURVEY.md §3.5) driven by a real
configuration file — the minimum end-to-end slice of SURVEY.md §7.
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("h5py")

from tests.test_radarscenes_pipeline import _make_dataset_root  # noqa: E402

CONFIG_YAML = """
CREATE_DATASET:
    dataset: radarscenes

    DATASET_PROCESSING:
        time_per_point_cloud_frame: 0.2
        crop_point_cloud: True
        crop_settings: {{"front": 100, "sides": 50}}
        bounding_boxes_aligned: False
        bb_invariance: "translation"
        create_small_subset: False
        subset_settings: {{}}
        deterministic: True
        seed: 123
        parallelize: False

    GRAPH_CONSTRUCTION:
        graph_construction_algorithm: "knn"
        graph_construction_settings: {{"k": 5, "r": 1}}
        node_features: ["rcs", "velocity_vector", "time_index", "degree"]
        edge_features: ["relative_position"]
        edge_mode: "directed"
        distance_definition: "X"

TRAIN:
    MODEL_ARCHITECTURE:
        node_feature_dimension: 5
        edge_feature_dimension: 2
        conv_layer_dimensions: [16, 16]
        classification_head_layer_dimensions: [6]
        regression_head_layer_dimensions: [8, 5]
        initial_node_feature_embedding: True
        initial_edge_feature_embedding: True
        node_feature_embedding_layer_dimensions: [8, 16]
        edge_feature_embedding_layer_dimensions: [4, 8]
        conv_layer_type: "MPNNConv"
        batch_norm_in_mlps: False

    TRAINING:
        dataset: radarscenes
        bg_index: 5
        learning_rate: 0.003
        epochs: {epochs}
        batch_size: 2
        shuffle: True
        deterministic: True
        seed: 123
        exponential_lr_decay_factor: 0.95
        bb_loss_weight: 0.5
        regularization_strength: 0.000005
        adapt_orientation_angle: True

EVALUATE:
    POSTPROCESSING:
        split: "validate"
        iou_for_nms: 0.01
        bg_index: 5
        min_object_score: {{"car": 0.3, "pedestrian": 0.3,
                           "pedestrian_group": 0.3, "two_wheeler": 0.3,
                           "large_vehicle": 0.3}}
        max_score_for_background: 0.5
        iou_for_mAP: 0.3
        use_point_iou: True
        bb_invariance: "translation"
        adapt_orientation_angle: True
"""


def test_full_cli_pipeline(tmp_path, capsys):
    from radargnn_tpu.cli.main import main

    dataset_root = _make_dataset_root(tmp_path, num_train=2, num_val=1)
    results = str(tmp_path / "results")
    os.makedirs(results)
    config_path = str(tmp_path / "config.yml")
    with open(config_path, "w") as f:
        f.write(CONFIG_YAML.format(epochs=2))

    main(dataset_root, results, config_path)

    # Shipping defaults (r4 verdict item 2): this config is the verbatim
    # reference schema — no fused_* fields — and it is a kNN graph with the
    # hoisted conv configuration, so the AUTO defaults must engage the
    # dense (v4) kernel family, the headline path.
    assert ">>> fused aggregation: dense (v4) kernels" in \
        capsys.readouterr().out

    model_folder = os.path.join(results, "model_01")
    assert os.path.isdir(model_folder)
    for art in ("gnn_configs.json", "dataset_configs.json",
                "trained_model.msgpack", "loss_curves.png"):
        assert os.path.exists(os.path.join(model_folder, art)), art

    eval_folder = os.path.join(model_folder, "evaluation_01")
    assert os.path.isdir(eval_folder)
    with open(os.path.join(eval_folder, "eval_results.json")) as f:
        results_json = json.load(f)
    det = results_json["OBJECT_DETECTION_METRICS"]
    seg = results_json["SEMANTIC_SEGMENTATION_METRICS"]
    assert "mAP" in det and isinstance(det["mAP"], float)
    assert "f1" in seg
    f1 = np.asarray(seg["f1"], dtype=float)
    assert np.isfinite(f1).all()

    # evaluate again with prediction plots
    from radargnn_tpu.cli.evaluate import main as evaluate_main
    evaluate_main(dataset_root, model_folder, config_path,
                  plot_predictions=2)
    eval2 = os.path.join(model_folder, "evaluation_02")
    assert os.path.exists(os.path.join(eval2, "prediction_000.png"))


def test_train_cli_fused_windowed(tmp_path):
    """The YAML-exposed fused windowed path (use_fused_aggregation +
    fused_tiling: windowed) must train end-to-end through the CLI."""
    from radargnn_tpu.cli.create_dataset import main as create_main
    from radargnn_tpu.cli.train import main as train_main

    dataset_root = _make_dataset_root(tmp_path, num_train=2, num_val=1)
    results = str(tmp_path / "results")
    os.makedirs(results)
    fused_yaml = CONFIG_YAML.format(epochs=1).replace(
        "        batch_norm_in_mlps: False",
        "        batch_norm_in_mlps: False\n"
        "        use_fused_aggregation: True\n"
        "        fused_tiling: \"windowed\"\n"
        "        fused_overflow_fraction: 0.5\n"
        "        assume_sorted_edges: True")
    config_path = str(tmp_path / "config.yml")
    with open(config_path, "w") as f:
        f.write(fused_yaml)

    create_main(dataset_root, config_path)
    train_main(os.path.join(dataset_root, "processed"), results, config_path)
    model_folder = os.path.join(results, "model_01")
    assert os.path.exists(os.path.join(model_folder,
                                       "trained_model.msgpack"))

    # evaluation must run through the fused inference tiling too (the
    # evaluate CLI builds it from the MODEL_ARCHITECTURE section)
    from radargnn_tpu.cli.evaluate import main as evaluate_main
    evaluate_main(dataset_root, model_folder, config_path)
    eval_folder = os.path.join(model_folder, "evaluation_01")
    with open(os.path.join(eval_folder, "eval_results.json")) as f:
        results_json = json.load(f)
    assert "mAP" in results_json["OBJECT_DETECTION_METRICS"]


def test_train_cli_fused_dense(tmp_path):
    """The YAML-exposed dense fixed-degree path (use_fused_aggregation +
    fused_tiling: dense) must train and evaluate end-to-end through the
    CLI — the train/evaluate CLIs read the kNN degree from the
    GRAPH_CONSTRUCTION section to size the receiver slots."""
    from radargnn_tpu.cli.create_dataset import main as create_main
    from radargnn_tpu.cli.train import main as train_main

    dataset_root = _make_dataset_root(tmp_path, num_train=2, num_val=1)
    results = str(tmp_path / "results")
    os.makedirs(results)
    fused_yaml = CONFIG_YAML.format(epochs=1).replace(
        "        batch_norm_in_mlps: False",
        "        batch_norm_in_mlps: False\n"
        "        use_fused_aggregation: True\n"
        "        fused_tiling: \"dense\"\n"
        "        fused_overflow_fraction: 0.5\n"
        "        assume_sorted_edges: True")
    config_path = str(tmp_path / "config.yml")
    with open(config_path, "w") as f:
        f.write(fused_yaml)

    create_main(dataset_root, config_path)
    train_main(os.path.join(dataset_root, "processed"), results, config_path)
    model_folder = os.path.join(results, "model_01")
    assert os.path.exists(os.path.join(model_folder,
                                       "trained_model.msgpack"))

    from radargnn_tpu.cli.evaluate import main as evaluate_main
    evaluate_main(dataset_root, model_folder, config_path)
    eval_folder = os.path.join(model_folder, "evaluation_01")
    with open(os.path.join(eval_folder, "eval_results.json")) as f:
        results_json = json.load(f)
    assert "mAP" in results_json["OBJECT_DETECTION_METRICS"]
