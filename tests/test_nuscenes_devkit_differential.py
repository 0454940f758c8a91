"""Devkit-differential test for the native nuScenes detection eval.

Runs ONE randomized synthetic nuScenes DB + submission through BOTH
evaluators and asserts metric agreement:

  * the official `nuscenes-devkit` `DetectionEval` (detection_cvpr_2019) —
    the exact evaluator the reference invokes
    (`postprocessor/nuscenes/evaluation.py:70-74` in /root/reference),
  * our native `NuScenesDetectionEval`
    (radargnn_tpu/data/nuscenes/detection_eval.py).

The devkit is NOT installed in the dev environment (this module skips
cleanly via importorskip); the repo Dockerfile installs it through the
`eval` extra, where this test runs for real:

    docker build -t radargnn_tpu . && \
    docker run radargnn_tpu python -m pytest \
        tests/test_nuscenes_devkit_differential.py -v

The synthetic DB is devkit-complete (all 13 v1.0 tables incl. log/map/
visibility, instance prev/next annotation chains for finite-difference GT
velocities) and uses the official mini_val scene names so the devkit's
split machinery resolves it.
"""

import json
import os

import numpy as np
import pytest

nuscenes_devkit = pytest.importorskip(
    "nuscenes", reason="nuscenes-devkit not installed (Docker eval extra)")


def _quat_yaw(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _make_devkit_complete_root(tmp_path, rng):
    """v1.0-mini root with every table the devkit loads. Two scenes named
    after the official mini_val split, 3 samples each, moving instances
    (car/pedestrian) with prev/next chains."""
    root = str(tmp_path / "nusc_devkit")
    version = "v1.0-mini"
    table_dir = os.path.join(root, version)
    os.makedirs(table_dir)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    os.makedirs(os.path.join(root, "maps"), exist_ok=True)

    tables = {t: [] for t in (
        "category", "attribute", "visibility", "instance", "sensor",
        "calibrated_sensor", "ego_pose", "log", "scene", "sample",
        "sample_data", "sample_annotation", "map")}

    tables["category"] = [
        {"token": "cat_car", "name": "vehicle.car",
         "description": "car"},
        {"token": "cat_ped", "name": "human.pedestrian.adult",
         "description": "adult"},
        {"token": "cat_truck", "name": "vehicle.truck",
         "description": "truck"},
    ]
    tables["attribute"] = [
        {"token": "attr_vm", "name": "vehicle.moving", "description": ""},
        {"token": "attr_vp", "name": "vehicle.parked", "description": ""},
        {"token": "attr_pm", "name": "pedestrian.moving", "description": ""},
    ]
    tables["visibility"] = [
        {"token": str(i), "level": f"v{lo}-{hi}",
         "description": f"visibility {lo}-{hi}%"}
        for i, (lo, hi) in enumerate([(0, 40), (40, 60), (60, 80),
                                      (80, 100)], start=1)]
    tables["sensor"] = [{"token": "sensor_LIDAR_TOP",
                         "channel": "LIDAR_TOP", "modality": "lidar"}]
    tables["calibrated_sensor"] = [{
        "token": "cs_LIDAR_TOP", "sensor_token": "sensor_LIDAR_TOP",
        "translation": [0.0, 0.0, 1.8], "rotation": _quat_yaw(0.0),
        "camera_intrinsic": []}]

    # official mini_val scene names (nuscenes.utils.splits)
    scene_names = ("scene-0103", "scene-0916")
    samples_per_scene = 3
    cat_of = {"car": "cat_car", "pedestrian": "cat_ped", "truck": "cat_truck"}
    attr_of = {"car": "attr_vm", "pedestrian": "attr_pm", "truck": "attr_vp"}
    size_of = {"car": [1.9, 4.5, 1.7], "pedestrian": [0.6, 0.7, 1.8],
               "truck": [2.5, 7.0, 2.9]}          # w, l, h

    all_tokens = []
    inst_id = 0
    for s_i, scene_name in enumerate(scene_names):
        log_token = f"log{s_i}"
        tables["log"].append({
            "token": log_token, "logfile": f"log{s_i}", "vehicle": "n008",
            "date_captured": "2026-08-21", "location": "singapore-onenorth"})
        tables["map"].append({
            "token": f"map{s_i}", "log_tokens": [log_token],
            "category": "semantic_prior", "filename": ""})
        scene_token = f"scenetok{s_i}"
        sample_tokens = [f"sample{s_i}x{j}"
                         for j in range(samples_per_scene)]
        all_tokens.extend(sample_tokens)
        tables["scene"].append({
            "token": scene_token, "name": scene_name,
            "log_token": log_token, "nbr_samples": samples_per_scene,
            "first_sample_token": sample_tokens[0],
            "last_sample_token": sample_tokens[-1],
            "description": "synthetic"})

        # 4 moving instances per scene at random speeds/headings
        insts = []
        for kind in ("car", "car", "pedestrian", "truck"):
            start = rng.uniform([-25, -25, 0.5], [25, 25, 1.2])
            vel = rng.uniform(-6, 6, 2)
            yaw = rng.uniform(0, 2 * np.pi)
            insts.append((f"inst{inst_id}", kind, start, vel, yaw))
            inst_id += 1

        ann_chain = {tok: [] for tok, *_ in insts}
        for j, token in enumerate(sample_tokens):
            ts = 1_000_000_000 + 500_000 * j
            pose_token = f"pose{s_i}x{j}"
            tables["ego_pose"].append({
                "token": pose_token, "timestamp": ts,
                "translation": [2.0 * j, 1.0 * s_i, 0.0],
                "rotation": _quat_yaw(0.0)})
            sd_token = f"sd{s_i}x{j}"
            tables["sample_data"].append({
                "token": sd_token, "sample_token": token,
                "ego_pose_token": pose_token,
                "calibrated_sensor_token": "cs_LIDAR_TOP",
                "timestamp": ts, "fileformat": "pcd",
                "filename": f"sweeps/{sd_token}.pcd",
                "is_key_frame": True, "height": 0, "width": 0,
                "prev": f"sd{s_i}x{j - 1}" if j else "",
                "next": f"sd{s_i}x{j + 1}"
                if j + 1 < samples_per_scene else ""})
            tables["sample"].append({
                "token": token, "timestamp": ts,
                "scene_token": scene_token,
                "prev": sample_tokens[j - 1] if j else "",
                "next": sample_tokens[j + 1]
                if j + 1 < samples_per_scene else ""})

            dt = 0.5 * j
            for inst_token, kind, start, vel, yaw in insts:
                ann_token = f"ann_{inst_token}_{j}"
                ann_chain[inst_token].append(ann_token)
                center = [float(start[0] + vel[0] * dt),
                          float(start[1] + vel[1] * dt), float(start[2])]
                tables["sample_annotation"].append({
                    "token": ann_token, "sample_token": token,
                    "instance_token": inst_token,
                    "visibility_token": "4",
                    "attribute_tokens": [attr_of[kind]],
                    "translation": center, "size": size_of[kind],
                    "rotation": _quat_yaw(yaw),
                    "num_lidar_pts": int(rng.integers(1, 12)),
                    "num_radar_pts": int(rng.integers(1, 6)),
                    "prev": "", "next": ""})

        for inst_token, kind, *_ in insts:
            chain = ann_chain[inst_token]
            tables["instance"].append({
                "token": inst_token, "category_token": cat_of[kind],
                "nbr_annotations": len(chain),
                "first_annotation_token": chain[0],
                "last_annotation_token": chain[-1]})
            # link the prev/next chains
            for a_i, ann_token in enumerate(chain):
                row = next(r for r in tables["sample_annotation"]
                           if r["token"] == ann_token)
                row["prev"] = chain[a_i - 1] if a_i else ""
                row["next"] = chain[a_i + 1] if a_i + 1 < len(chain) else ""

    for name, rows in tables.items():
        with open(os.path.join(table_dir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root, all_tokens


def _make_submission(root, tokens, rng):
    """Randomized predictions: jittered GT boxes (some beyond every match
    threshold), plus false positives, plus one unmatched GT per sample."""
    from radargnn_tpu.data.nuscenes.db import NuScenes as NativeDB
    from radargnn_tpu.data.nuscenes.dataset_creation import CLASS_NAME_TO_ID
    from radargnn_tpu.data.nuscenes.submission import DETECTION_NAMES

    nusc = NativeDB(version="v1.0-mini", dataroot=root)
    results = {}
    for token in tokens:
        sample = nusc.get("sample", token)
        boxes = []
        for a_i, ann_token in enumerate(sample["anns"]):
            ann = nusc.get("sample_annotation", ann_token)
            box = nusc.box_from_annotation(ann)
            label = CLASS_NAME_TO_ID.get(box.name, 0)
            if label == 0:
                continue
            if a_i % 4 == 3:
                continue                     # leave some GT unmatched
            # jitter spans the 0.5/1/2/4 m thresholds
            jitter = rng.normal(0, 1.2, 2)
            yaw = rng.uniform(0, 2 * np.pi) if rng.random() < 0.3 \
                else float(2 * np.arctan2(ann["rotation"][3],
                                          ann["rotation"][0]))
            boxes.append({
                "sample_token": token,
                "translation": [float(box.center[0] + jitter[0]),
                                float(box.center[1] + jitter[1]),
                                float(box.center[2])],
                "size": [float(s * rng.uniform(0.8, 1.25))
                         for s in box.wlh],
                "rotation": _quat_yaw(yaw),
                "velocity": [float(v) for v in rng.normal(0, 3, 2)],
                "detection_name": DETECTION_NAMES[label],
                "detection_score": float(rng.random()),
                "attribute_name": "vehicle.moving"
                if DETECTION_NAMES[label] != "pedestrian"
                else "pedestrian.moving",
            })
        for _ in range(3):                   # false positives
            name = rng.choice(["car", "pedestrian", "bus"])
            boxes.append({
                "sample_token": token,
                "translation": [float(v) for v in
                                rng.uniform([-30, -30, 0.5], [30, 30, 1.5])],
                "size": [float(v) for v in rng.uniform(0.5, 5.0, 3)],
                "rotation": _quat_yaw(float(rng.uniform(0, 2 * np.pi))),
                "velocity": [float(v) for v in rng.normal(0, 3, 2)],
                "detection_name": str(name),
                "detection_score": float(rng.random()),
                "attribute_name": "vehicle.moving"
                if name != "pedestrian" else "pedestrian.moving",
            })
        results[token] = boxes
    return {
        "meta": {"use_camera": False, "use_lidar": False, "use_radar": True,
                 "use_map": False, "use_external": False},
        "results": results,
    }


def test_native_eval_matches_devkit(tmp_path):
    from nuscenes import NuScenes as DevkitNuScenes
    from nuscenes.eval.common.config import config_factory
    from nuscenes.eval.detection.evaluate import DetectionEval

    from radargnn_tpu.data.nuscenes.db import NuScenes as NativeDB
    from radargnn_tpu.data.nuscenes.detection_eval import (
        NuScenesDetectionEval, ground_truth_from_db,
    )

    rng = np.random.default_rng(2026)
    root, tokens = _make_devkit_complete_root(tmp_path, rng)
    submission = _make_submission(root, tokens, rng)

    # --- devkit side -----------------------------------------------------
    result_path = str(tmp_path / "results.json")
    with open(result_path, "w") as f:
        json.dump(submission, f)
    nusc_dk = DevkitNuScenes(version="v1.0-mini", dataroot=root,
                             verbose=False)
    dk_eval = DetectionEval(nusc_dk, config_factory("detection_cvpr_2019"),
                            result_path, eval_set="mini_val",
                            output_dir=str(tmp_path / "dk_out"),
                            verbose=False)
    metrics, _ = dk_eval.evaluate()
    dk = metrics.serialize()

    # --- native side -----------------------------------------------------
    nusc_nat = NativeDB(version="v1.0-mini", dataroot=root)
    gt, ego = ground_truth_from_db(nusc_nat, tokens)
    nat = NuScenesDetectionEval(submission, gt, ego).evaluate()

    assert np.isclose(nat["mean_ap"], dk["mean_ap"], atol=1e-4), \
        (nat["mean_ap"], dk["mean_ap"])
    assert np.isclose(nat["nd_score"], dk["nd_score"], atol=1e-4), \
        (nat["nd_score"], dk["nd_score"])
    for cls, ap in dk["mean_dist_aps"].items():
        assert np.isclose(nat["label_aps"][cls], ap, atol=1e-4), \
            (cls, nat["label_aps"][cls], ap)
    for name, err in dk["tp_errors"].items():
        assert np.isclose(nat["tp_errors"][name], err, atol=1e-4), \
            (name, nat["tp_errors"][name], err)
