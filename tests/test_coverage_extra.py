"""Coverage for the remaining configuration modes: radius graphs, undirected
edge features, eval-mode BatchNorm inference, loader determinism, schedules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radargnn_tpu.configs import GraphConstructionConfiguration
from radargnn_tpu.data.loader import GraphDataLoader
from radargnn_tpu.data.synthetic import make_samples
from radargnn_tpu.graph.build import build_geometric_graph
from radargnn_tpu.train.schedules import (
    ConstantLR, ExponentialLR, ReduceLROnPlateau,
)


def test_radius_graph_pipeline():
    cfg = GraphConstructionConfiguration(
        "radius", {"k": 5, "r": 8.0},
        ["rcs", "velocity_vector_length", "degree"],
        ["spatial_euclidean_distance", "relative_position"],
        "directed", "X")
    samples = make_samples(num_frames=2, num_points=120, seed=0,
                           graph_config=cfg)
    s = samples[0]
    assert s.num_edges > 0
    # all edges within radius
    d = np.linalg.norm(s.pos[s.senders] - s.pos[s.receivers], axis=1)
    assert (d <= 8.0 + 1e-5).all()
    # edge feature 0 = distance
    np.testing.assert_allclose(s.edge_feat[:, 0], d, rtol=1e-5)


def test_undirected_edge_features_pipeline():
    cfg = GraphConstructionConfiguration(
        "knn", {"k": 4, "r": 1.0}, ["rcs"],
        ["point_pair_features", "relative_position", "relative_velocity"],
        "undirected", "X")
    samples = make_samples(num_frames=1, num_points=80, seed=1,
                           graph_config=cfg)
    s = samples[0]
    assert s.edge_feat.shape[1] == 8
    # undirected relative position/velocity are absolute values
    assert (s.edge_feat[:, 4:] >= 0).all()


def test_xv_distance_definition_pipeline():
    cfg = GraphConstructionConfiguration(
        "knn", {"k": 3, "r": 1.0}, ["rcs"], ["relative_position"],
        "directed", "XV")
    samples = make_samples(num_frames=1, num_points=60, seed=2,
                           graph_config=cfg)
    assert samples[0].num_edges == 60 * 3


def test_predictor_eval_mode_uses_running_stats():
    from radargnn_tpu.configs import GNNArchitectureConfig
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.postprocess.inference import Predictor

    samples = make_samples(num_frames=2, num_points=60, seed=3)
    loader = GraphDataLoader(samples, 2, False, 5, pad_align=16)
    batch = stack_samples(samples, loader.max_nodes, 5, loader.max_edges)
    arch = GNNArchitectureConfig(
        node_feature_dimension=samples[0].node_feat.shape[1],
        edge_feature_dimension=2, conv_layer_dimensions=[8],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5], batch_norm_in_mlps=False)
    model, variables = create_detnet_state(arch, jax.random.key(0), batch)

    preds_train_bn, *_ = Predictor(model, variables, loader, verbose=False,
                                   use_batch_stats=True).predict()
    preds_eval_bn, *_ = Predictor(model, variables, loader, verbose=False,
                                  use_batch_stats=False).predict()
    a = preds_train_bn["class_probability_prediction"][0]
    b = preds_eval_bn["class_probability_prediction"][0]
    assert a.shape == b.shape
    # fresh init: running stats are (0, 1), so modes genuinely differ
    assert not np.allclose(a, b)


def test_loader_determinism_and_graph_padding():
    samples = make_samples(num_frames=5, num_points=50, seed=4)
    orders = []
    for _ in range(2):
        loader = GraphDataLoader(samples, 2, True, 5, seed=7, pad_align=16)
        seen = []
        for batch in loader:
            seen.append(np.asarray(batch.node_feat).sum())
        orders.append(seen)
    assert orders[0] == orders[1]           # same seed → same order

    # last batch padded with an empty graph: 5 samples, batch 2 → 3 batches
    loader = GraphDataLoader(samples, 2, False, 5, seed=0, pad_align=16)
    batches = list(loader)
    assert len(batches) == 3
    assert not bool(np.asarray(batches[-1].node_mask[1]).any())


def test_schedules_behavior():
    c = ConstantLR(1e-3)
    assert c.step(1.0) == 1e-3

    e = ExponentialLR(1.0, 0.5)
    assert e.step(1.0) == 0.5
    assert e.step(1.0) == 0.25

    p = ReduceLROnPlateau(1.0, factor=0.1, patience=1)
    assert p.step(10.0) == 1.0      # first value becomes best
    assert p.step(10.0) == 1.0      # bad 1
    assert p.step(10.0) == 0.1      # bad 2 > patience → decay
    assert p.step(0.5) == 0.1       # improvement resets counter


def test_sorted_edges_flag_consistency():
    """assume_sorted_edges with loader batches must equal unsorted compute."""
    from radargnn_tpu.configs import GNNArchitectureConfig
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import DetNet

    samples = make_samples(num_frames=2, num_points=60, seed=5)
    batch = stack_samples(samples, 64, 5, 64 * 20)

    outs = {}
    for flag in (False, True):
        arch = GNNArchitectureConfig(
            node_feature_dimension=samples[0].node_feat.shape[1],
            edge_feature_dimension=2, conv_layer_dimensions=[8, 8],
            classification_head_layer_dimensions=[6],
            regression_head_layer_dimensions=[5], batch_norm_in_mlps=False,
            assume_sorted_edges=flag)
        model = DetNet(arch)
        args = (batch.flat_nodes(), batch.flat_edges(), batch.flat_senders(),
                batch.flat_receivers(), batch.node_mask.reshape(-1),
                batch.edge_mask.reshape(-1))
        variables = model.init(jax.random.key(0), *args, train=False)
        cls, bb = model.apply(variables, *args, train=False)
        outs[flag] = (np.asarray(cls), np.asarray(bb))

    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-5,
                               atol=1e-6)


def test_radar_scenes_distribution_weights():
    """set_weights_according_radar_scenes_distribution uses the published
    class-frequency weights (parity: `gnn/trainer.py:89-103`)."""
    import jax
    from radargnn_tpu.configs import GNNArchitectureConfig, TrainingConfig
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.train.trainer import Trainer
    from radargnn_tpu.utils.properties import ClassDistribution

    samples = make_samples(num_frames=1, num_points=40, seed=6)
    batch = stack_samples(samples, 64, 5, 64 * 20)
    arch = GNNArchitectureConfig(
        node_feature_dimension=samples[0].node_feat.shape[1],
        edge_feature_dimension=2, conv_layer_dimensions=[8],
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5], batch_norm_in_mlps=False)
    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=1e-3, epochs=1, batch_size=1,
        shuffle=False, bg_index=5,
        set_weights_according_radar_scenes_distribution=True)
    model, variables = create_detnet_state(arch, jax.random.key(0), batch)
    trainer = Trainer(tcfg, model, variables)
    expected = list(ClassDistribution.get_class_weights().values())
    np.testing.assert_allclose(np.asarray(trainer._weights), expected,
                               rtol=1e-6)


def test_en_invariance_cli_evaluate(tmp_path):
    """CLI-level decode with bb_invariance 'en' (the trickiest format)."""
    import json
    from radargnn_tpu.configs import PostProcessingConfiguration
    from radargnn_tpu.data.ground_truth import create_2d_bounding_boxes
    from radargnn_tpu.postprocess import (
        ObjectDetectionMetrics, Postprocessor, PredictionExtractor,
    )

    rng = np.random.default_rng(8)
    n = 60
    pos = rng.uniform(0, 50, size=(n, 2))
    labels = np.full(n, 5.0)
    tracks = np.full(n, b"", object)
    for obj, (lo, hi) in enumerate([(0, 8), (8, 15)]):
        centers = [np.array([12.0, 12.0]), np.array([35.0, 30.0])]
        pos[lo:hi] = centers[obj] + rng.uniform(-2, 2, size=(hi - lo, 2))
        labels[lo:hi] = obj
        tracks[lo:hi] = str(obj).encode()
    boxes = create_2d_bounding_boxes(pos, tracks, False, "en")
    probs = np.full((n, 6), 0.01)
    probs[np.arange(n), labels.astype(int)] = 0.9

    config = PostProcessingConfiguration(
        split="validate", iou_for_nms=0.01,
        min_object_score={"car": 0.4, "pedestrian": 0.4,
                          "pedestrian_group": 0.4, "two_wheeler": 0.4,
                          "large_vehicle": 0.4},
        max_score_for_background=0.5, iou_for_mAP=0.3, use_point_iou=True,
        bg_index=5, bb_invariance="en")

    pp = Postprocessor()
    bb_p, bb_g, cls_p, cls_g = pp.process(
        config, [pos], [rng.normal(size=(n, 2))],
        {"bounding_box_predictions": [np.nan_to_num(boxes, nan=0.0)],
         "class_probability_prediction": [probs]},
        {"bounding_box_true": [boxes], "class_true": [labels]})
    res = ObjectDetectionMetrics.get_map(config, bb_p, bb_g, cls_p)
    assert res["map"] > 0.99
