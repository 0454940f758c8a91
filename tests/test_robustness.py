"""Robustness edge cases: empty detections/GT, single-node graphs, all-background
frames through the full postprocess+metrics path (paths where the reference
crashes, e.g. `metrics.py:108` indexes boxes[0] of an empty list)."""

import numpy as np
import jax.numpy as jnp

from radargnn_tpu.configs import PostProcessingConfiguration
from radargnn_tpu.postprocess import (
    ObjectDetectionMetrics, Postprocessor, PredictionExtractor,
)


def _config():
    return PostProcessingConfiguration(
        split="validate", iou_for_nms=0.01,
        min_object_score={"car": 0.5, "pedestrian": 0.5,
                          "pedestrian_group": 0.5, "two_wheeler": 0.5,
                          "large_vehicle": 0.5},
        max_score_for_background=0.2, iou_for_mAP=0.3, use_point_iou=True,
        bg_index=5, bb_invariance="translation")


def test_all_background_frame_full_pipeline():
    """No foreground anywhere: no detections, no GT — metrics stay defined."""
    rng = np.random.default_rng(0)
    n = 40
    pos = rng.uniform(0, 50, size=(n, 2))
    vel = rng.normal(size=(n, 2))
    labels = np.full(n, 5.0)
    boxes = np.full((n, 5), np.nan)
    probs = np.full((n, 6), 0.01)
    probs[:, 5] = 0.95

    pp = Postprocessor()
    bb_p, bb_g, cls_p, cls_g = pp.process(
        _config(), [pos], [vel],
        {"bounding_box_predictions": [np.zeros((n, 5))],
         "class_probability_prediction": [probs]},
        {"bounding_box_true": [boxes], "class_true": [labels]})

    assert len(bb_p[0]["boxes"]) == 0
    assert len(bb_g[0]["boxes"]) == 0

    res = ObjectDetectionMetrics.get_map(_config(), bb_p, bb_g, cls_p)
    assert res["map"] == -1.0               # nothing to evaluate


def test_predictions_without_gt_map_zero_classes_excluded():
    """Detections exist but GT has none: every class skips (npig=0)."""
    rng = np.random.default_rng(1)
    n = 30
    pos = rng.uniform(0, 50, size=(n, 2))
    vel = rng.normal(size=(n, 2))
    labels = np.full(n, 5.0)
    gt_boxes = np.full((n, 5), np.nan)
    probs = np.full((n, 6), 0.01)
    probs[:5, 0] = 0.9                       # confident car predictions
    probs[5:, 5] = 0.9
    pred_boxes = np.zeros((n, 5))
    pred_boxes[:, 2:4] = 2.0

    pp = Postprocessor()
    bb_p, bb_g, cls_p, cls_g = pp.process(
        _config(), [pos], [vel],
        {"bounding_box_predictions": [pred_boxes],
         "class_probability_prediction": [probs]},
        {"bounding_box_true": [gt_boxes], "class_true": [labels]})

    assert len(bb_p[0]["boxes"]) > 0
    res = ObjectDetectionMetrics.get_map(_config(), bb_p, bb_g, cls_p)
    assert res["map"] == -1.0


def test_single_node_graph_through_model():
    """A 1-valid-node graph (no edges) must produce finite outputs."""
    import jax

    from radargnn_tpu.configs import GNNArchitectureConfig
    from radargnn_tpu.graph.batch import GraphSample, stack_samples
    from radargnn_tpu.models.detnet import DetNet

    sample = GraphSample(
        node_feat=np.ones((1, 4), np.float32),
        edge_feat=np.zeros((0, 2), np.float32),
        senders=np.zeros((0,), np.int32), receivers=np.zeros((0,), np.int32),
        labels=np.array([0], np.int32), boxes=np.zeros((1, 5), np.float32),
        pos=np.zeros((1, 2), np.float32), vel=np.zeros((1, 2), np.float32))
    batch = stack_samples([sample], max_nodes=8, bg_index=5, max_edges=8)

    arch = GNNArchitectureConfig(
        node_feature_dimension=4, edge_feature_dimension=2,
        conv_layer_dimensions=[8], classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[5], batch_norm_in_mlps=False)
    model = DetNet(arch)
    args = (batch.flat_nodes(), batch.flat_edges(), batch.flat_senders(),
            batch.flat_receivers(), batch.node_mask.reshape(-1),
            batch.edge_mask.reshape(-1))
    variables = model.init(jax.random.key(0), *args, train=False)
    cls, bb = model.apply(variables, *args, train=True,
                          mutable=["batch_stats"])[0]
    assert np.isfinite(np.asarray(cls)[0]).all()
    assert np.isfinite(np.asarray(bb)[0]).all()


def test_nms_all_identical_boxes():
    from radargnn_tpu.postprocess.nms import nms_indices

    boxes = np.tile(np.array([[0.0, 0, 2, 2]]), (5, 1))
    scores = np.array([0.1, 0.5, 0.3, 0.9, 0.2])
    keep = nms_indices(boxes, scores, 0.5, rotated=False)
    assert keep.tolist() == [3]


def test_prediction_extractor_empty_cloud():
    probs = np.zeros((0, 6))
    labels = PredictionExtractor.get_predicted_label(probs)
    assert labels.shape == (0, 1)
