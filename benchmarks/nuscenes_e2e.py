"""End-to-end nuScenes vertical on the current backend (TPU when present):
synthetic nuScenes-format tables -> multisweep dataset creation -> training
-> batched inference -> decode/NMS -> submission.json -> native CVPR-2019
DetectionEval (incl. finite-difference GT velocities). Prints final
mAP/NDS. The RadarScenes analog is the CLI e2e (tests/test_cli_e2e.py).
"""
import os, sys, json, glob, tempfile
from pathlib import Path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
print("devices:", jax.devices())

from tests.test_nuscenes_pipeline import _make_nuscenes_root
from radargnn_tpu.configs import (
    GraphConstructionConfiguration, NuScenesDatasetConfiguration,
    GNNArchitectureConfig, TrainingConfig, PostProcessingConfiguration,
)
from radargnn_tpu.data.nuscenes.dataset_creation import NuScenesGraphDataset
from radargnn_tpu.data.loader import get_data_loaders
from radargnn_tpu.models.detnet import create_detnet_state
from radargnn_tpu.train.trainer import Trainer, set_seeds
from radargnn_tpu.postprocess import Predictor
from radargnn_tpu.postprocess.extraction import Postprocessor, PredictionExtractor
from radargnn_tpu.data.nuscenes.evaluation import NuscenesEvaluator
from radargnn_tpu.graph.batch import stack_samples

tmp = Path(tempfile.mkdtemp(prefix="nusc_tpu_"))
root = _make_nuscenes_root(tmp, samples_per_scene=3)
gcfg = GraphConstructionConfiguration(
    "knn", {"k": 4, "r": 1.0}, ["rcs", "velocity_vector", "degree"],
    ["relative_position"], "directed", "X")
dcfg = NuScenesDatasetConfiguration(
    version="v1.0-mini", nsweeps=1, crop_point_cloud=True,
    crop_settings={"x": 100, "y": 100}, bb_invariance="translation")
NuScenesGraphDataset(root, gcfg, dcfg)

loaders, ds_cfg = get_data_loaders(["train", "validate"],
                                   os.path.join(root, "processed"),
                                   batch_size=2, shuffle=True, bg_index=0)
tr = loaders["train"]
arch = GNNArchitectureConfig(
    node_feature_dimension=tr.samples[0].node_feat.shape[1],
    edge_feature_dimension=2, conv_layer_dimensions=[16, 16],
    classification_head_layer_dimensions=[11],
    regression_head_layer_dimensions=[8, 5],
    initial_node_feature_embedding=True, initial_edge_feature_embedding=True,
    node_feature_embedding_layer_dimensions=[8, 16],
    edge_feature_embedding_layer_dimensions=[4, 8],
    batch_norm_in_mlps=False, compute_dtype="bfloat16",
    assume_sorted_edges=True)
tcfg = TrainingConfig(dataset="nuscenes", learning_rate=3e-3, epochs=4,
                      batch_size=2, shuffle=True, bg_index=0,
                      deterministic=True, seed=7,
                      adapt_orientation_angle=True, bb_loss_weight=0.5)
key = set_seeds(7)
batch = next(iter(tr))
model, variables = create_detnet_state(arch, key, batch)
trainer = Trainer(tcfg, model, variables)
trainer.fit(loaders, verbose=False)
print("losses:", [round(float(x), 3) for x in trainer.train_loss])

config = PostProcessingConfiguration(
    split="validate", iou_for_nms=0.01,
    min_object_score={n: 0.2 for n in
                      ("barrier", "bicycle", "bus", "car", "construction",
                       "motorcycle", "pedestrian", "trafficcone",
                       "trailer", "truck")},
    max_score_for_background=0.6, iou_for_mAP=0.3, use_point_iou=True,
    bg_index=0, bb_invariance="translation", adapt_orientation_angle=True)
va = loaders["validate"]
predictor = Predictor(model, {"params": trainer.state.params,
                              "batch_stats": trainer.state.batch_stats},
                      va, verbose=False)
preds, gts, pos, vel = predictor.predict()
pp = Postprocessor()
bb_p, bb_g, cls_p, cls_g = pp.process(config, pos, vel, preds, gts)
cls_pred_label = PredictionExtractor().extract(preds)
graph_names = sorted(glob.glob(os.path.join(root, "processed", "validate",
                                            "*.npz")))
model_dir = str(tmp / "model"); os.makedirs(model_dir)
ev = NuscenesEvaluator(config=config, version="v1.0-mini",
                       dataset_path=os.path.join(root, "raw"),
                       model_path=model_dir)
ev.evaluate(bb_p, bb_g, cls_p, cls_pred_label, cls_g, vel,
            graph_names=graph_names)
folder = ev.save_results()
m = json.load(open(os.path.join(folder, "nuscenes_metrics.json")))
print("NUSC-TPU ok: mAP=%.4f NDS=%.4f" % (m["mean_ap"], m["nd_score"]))
