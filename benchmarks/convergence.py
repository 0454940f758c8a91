"""End-to-end convergence validation on synthetic RadarScenes-like data.

Trains the DetNet (reduced conv stack for wall-clock) on synthetic frames
with known objects, then runs the complete evaluation pipeline (predict →
decode → NMS → point-IoU mAP + F1). Demonstrates that the whole stack —
graph pipeline, masked losses, schedules, postprocessing, metrics — learns
and evaluates correctly at realistic scale.

Prints JSON lines: per-epoch losses, then final {"metric": "synthetic_map"}
and {"metric": "synthetic_f1_macro"}.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json


def main():
    import numpy as np
    import jax

    # smoke-test hook: RADARGNN_PLATFORM=cpu forces host CPU (the axon TPU
    # plugin ignores JAX_PLATFORMS, so it must be set via jax.config)
    plat = _os.environ.get("RADARGNN_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # persistent compilation cache (same setup as bench.py). Note: the axon
    # remote-compile tunnel does not hit this cache across processes — for
    # long trainings prefer ONE process over many resume chunks; the cache
    # still helps CPU runs and native-libtpu environments.
    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from radargnn_tpu.configs import (
        GNNArchitectureConfig, PostProcessingConfiguration, TrainingConfig,
    )
    from radargnn_tpu.data.loader import GraphDataLoader
    from radargnn_tpu.data.synthetic import make_samples
    from radargnn_tpu.graph.batch import stack_samples
    from radargnn_tpu.models.detnet import create_detnet_state
    from radargnn_tpu.postprocess import (
        ObjectDetectionMetrics, Postprocessor, PredictionExtractor, Predictor,
        SegmentationMetrics,
    )
    from radargnn_tpu.train.trainer import Trainer, set_seeds

    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--points", type=int, default=800)
    parser.add_argument("--bb-invariance", type=str, default="translation",
                        choices=["none", "translation", "en"],
                        help="bounding-box invariance mode, end-to-end: GT "
                             "encoding -> training -> decode (the 'en' "
                             "decode runs the 1-NN recompute at inference, "
                             "reference postprocessing.py:233-237)")
    parser.add_argument("--imbalanced", action="store_true",
                        help="RadarScenes-faithful class profile (~96%% "
                             "background, car-dominated objects) instead "
                             "of the mild near-balanced default")
    parser.add_argument("--protocol", type=str, default="reference",
                        choices=["reference", "soft"],
                        help="eval protocol: 'reference' = the exact "
                             "headline protocol (point-IoU mAP@0.3, per-"
                             "class min score 0.5, bg cap 0.2, NMS IoU "
                             "0.01 — configuration_radarscenes.yml:64-80); "
                             "'soft' = the older lenient thresholds")
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--full-arch", action="store_true",
                        help="flagship conv stack [224,224,128,64,32]")
    parser.add_argument("--fused", action="store_true",
                        help="use the fused Pallas aggregation path")
    parser.add_argument("--windows", action="store_true",
                        help="with --fused: windowed (v3) Morton tiling")
    parser.add_argument("--dense", action="store_true",
                        help="with --fused: dense fixed-degree (v4) kNN "
                             "tiling (k+4 slots/receiver, over-degree "
                             "spill to overflow)")
    parser.add_argument("--ovf-frac", type=float, default=0.05,
                        help="overflow-edge budget fraction for --windows "
                             "(--dense defaults to 0.08 unless set)")
    parser.add_argument("--no-eval", action="store_true",
                        help="skip the mAP/F1 evaluation stage (saves its "
                             "compile time on remote-tunnel TPUs)")
    parser.add_argument("--checkpoint-dir", type=str, default=None,
                        help="save per-epoch training state here")
    parser.add_argument("--no-cache-batches", action="store_true",
                        help="disable device-cached batches; caching fixes "
                             "batch MEMBERSHIP across epochs (only batch "
                             "order reshuffles), so recorded convergence "
                             "numbers are not apples-to-apples with true "
                             "per-sample shuffling")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume from a checkpoint directory (run long "
                             "trainings in command-timeout-sized chunks)")
    parser.add_argument("--seed", type=int, default=123,
                        help="training seed (init + shuffling); the data "
                             "seed stays fixed so seed sweeps compare "
                             "kernel families on identical datasets")
    args = parser.parse_args()

    samples = make_samples(num_frames=args.frames, num_points=args.points,
                           seed=0, bb_invariance=args.bb_invariance,
                           imbalanced=args.imbalanced)
    n_val = max(args.frames // 5, 2)
    train_s, val_s = samples[:-n_val], samples[-n_val:]

    if args.full_arch:
        conv_dims = [224, 224, 128, 64, 32]
        node_emb = [32, 64, 128, 224]
        edge_emb = [4, 8, 16]
    else:
        conv_dims = [64, 64, 32]
        node_emb = [32, 64]
        edge_emb = [4, 8]
    arch = GNNArchitectureConfig(
        node_feature_dimension=train_s[0].node_feat.shape[1],
        edge_feature_dimension=2,
        conv_layer_dimensions=conv_dims,
        classification_head_layer_dimensions=[6],
        regression_head_layer_dimensions=[16, 5],
        initial_node_feature_embedding=True,
        initial_edge_feature_embedding=True,
        node_feature_embedding_layer_dimensions=node_emb,
        edge_feature_embedding_layer_dimensions=edge_emb,
        batch_norm_in_mlps=False, compute_dtype=args.dtype,
        assume_sorted_edges=True, use_fused_aggregation=args.fused)
    # adapt_orientation_angle: sin-encode θ to [-1,1]; the reference
    # enables it for rotated-box modes (none/translation/en all carry θ)
    tcfg = TrainingConfig(
        dataset="radarscenes", learning_rate=2e-3, epochs=args.epochs,
        batch_size=args.batch_size, shuffle=True, bg_index=5,
        deterministic=True, seed=args.seed,
        exponential_lr_decay_factor=0.95,
        bb_loss_weight=0.5, regularization_strength=5e-6,
        adapt_orientation_angle=True, scan_steps_per_dispatch=4,
        set_weights_according_radar_scenes_distribution=args.imbalanced)

    key = set_seeds(tcfg.seed)
    csr_tiling = None
    if args.fused:
        from radargnn_tpu.models.layers import (
            FUSED_DENSE_EXTRA_SLOTS, FUSED_DENSE_R_TILE, FUSED_EDGE_TILE,
            FUSED_NODE_BLOCK, FUSED_WINDOW_BLOCKS,
        )
        if args.dense:
            csr_tiling = {
                "mode": "dense", "node_block": FUSED_NODE_BLOCK,
                "r_tile": FUSED_DENSE_R_TILE,
                "k": 20 + FUSED_DENSE_EXTRA_SLOTS,
                "window_blocks": FUSED_WINDOW_BLOCKS,
                "ovf_frac": max(args.ovf_frac, 0.08)}
        else:
            csr_tiling = (FUSED_NODE_BLOCK, FUSED_EDGE_TILE)
            if args.windows:
                csr_tiling = csr_tiling + (FUSED_WINDOW_BLOCKS,
                                           args.ovf_frac)
    loaders = {
        "train": GraphDataLoader(train_s, args.batch_size, True, 5, seed=1,
                                 cache_batches=not args.no_cache_batches,
                                 csr_tiling=csr_tiling),
        "validate": GraphDataLoader(val_s, args.batch_size, False, 5, seed=1,
                                    cache_batches=not args.no_cache_batches,
                                    csr_tiling=csr_tiling),
    }
    # share buckets
    n_bucket = max(loaders["train"].max_nodes, loaders["validate"].max_nodes)
    e_bucket = max(loaders["train"].max_edges, loaders["validate"].max_edges)
    for ld in loaders.values():
        ld.max_nodes, ld.max_edges = n_bucket, e_bucket

    example = stack_samples(train_s[:args.batch_size], n_bucket, 5, e_bucket,
                            csr_tiling=csr_tiling)
    model, variables = create_detnet_state(arch, key, example)
    trainer = Trainer(tcfg, model, variables)
    if args.checkpoint_dir:
        tcfg.checkpoint_every_epochs = 1
    trainer.fit(loaders, verbose=False, resume_from=args.resume,
                checkpoint_dir=args.checkpoint_dir)
    for ep, (lt, lv) in enumerate(zip(trainer.train_loss, trainer.valid_loss)):
        print(json.dumps({"epoch": ep + 1, "loss_train": round(float(lt), 4),
                          "loss_valid": round(float(lv), 4)}))

    if args.no_eval:
        return

    if args.protocol == "reference":
        # the EXACT protocol behind the reference's headline numbers
        # (configuration_radarscenes.yml:64-80): point-IoU mAP@0.3, NMS IoU
        # 0.01, per-class min object score 0.5, background-score cap 0.2
        min_score, bg_cap = 0.5, 0.2
    else:
        min_score, bg_cap = 0.4, 0.3
    config = PostProcessingConfiguration(
        split="validate", iou_for_nms=0.01,
        min_object_score={"car": min_score, "pedestrian": min_score,
                          "pedestrian_group": min_score,
                          "two_wheeler": min_score,
                          "large_vehicle": min_score},
        max_score_for_background=bg_cap, iou_for_mAP=0.3, use_point_iou=True,
        bg_index=5, bb_invariance=args.bb_invariance,
        adapt_orientation_angle=True)

    predictor = Predictor(
        model, {"params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats},
        loaders["validate"], verbose=False)
    predictions, ground_truth, pos, vel = predictor.predict()

    pp = Postprocessor()
    bb_pred, bb_gt, cls_pred, cls_gt = pp.process(
        config, pos, vel, predictions, ground_truth)
    cls_pred_label = PredictionExtractor().extract(predictions)

    res = ObjectDetectionMetrics.get_map(config, bb_pred, bb_gt, cls_pred)
    seg = SegmentationMetrics(cls_pred_label, cls_gt)
    f1 = seg.get_f1(6, "macro")

    print(json.dumps({"metric": "synthetic_map",
                      "value": round(float(res["map"]), 4)}))
    print(json.dumps({"metric": "synthetic_f1_macro",
                      "value": round(float(f1), 4)}))


if __name__ == "__main__":
    main()
