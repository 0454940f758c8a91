"""RadarScenes dataset-creation pipeline on synthetic on-disk data.

Builds a miniature RadarScenes-format dataset (sequences.json, per-sequence
scenes.json + radar_data.h5) and runs the full creation pipeline: scene
accumulation, velocity decomposition, cropping, graph construction, GT boxes,
npz serialization.
"""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from radargnn_tpu.configs import (
    GraphConstructionConfiguration, RadarScenesDatasetConfiguration,
)
from radargnn_tpu.data.radarscenes.dataset_creation import RadarScenesGraphDataset
from radargnn_tpu.data.radarscenes.reader import Sequence, SENSOR_MOUNTING
from radargnn_tpu.graph.batch import GraphSample

RADAR_DTYPE = np.dtype([
    ("timestamp", np.int64), ("sensor_id", np.uint8),
    ("range_sc", np.float32), ("azimuth_sc", np.float32),
    ("rcs", np.float32), ("vr", np.float32), ("vr_compensated", np.float32),
    ("x_cc", np.float32), ("y_cc", np.float32),
    ("x_seq", np.float32), ("y_seq", np.float32),
    ("uuid", "S32"), ("track_id", "S32"), ("label_id", np.uint8),
])

ODO_DTYPE = np.dtype([
    ("timestamp", np.int64), ("x_seq", np.float64), ("y_seq", np.float64),
    ("yaw_seq", np.float64), ("vx", np.float64), ("yaw_rate", np.float64),
])


def _make_sequence_dir(root, name, num_scenes=8, points_per_scene=40, seed=0):
    rng = np.random.default_rng(seed)
    seq_dir = os.path.join(root, "data", name)
    os.makedirs(seq_dir, exist_ok=True)

    dt_us = 70_000                      # 70 ms between scans
    timestamps = 1_000_000 + np.arange(num_scenes) * dt_us

    all_rows = []
    scenes = {}
    odo = np.zeros(num_scenes, ODO_DTYPE)
    for i, ts in enumerate(timestamps):
        odo[i] = (ts, 0.5 * i, 0.0, 0.0, 5.0, 0.0)
        rows = np.zeros(points_per_scene, RADAR_DTYPE)
        rows["timestamp"] = ts
        sensor = (i % 4) + 1
        rows["sensor_id"] = sensor
        rows["x_cc"] = rng.uniform(1, 40, points_per_scene)
        rows["y_cc"] = rng.uniform(-20, 20, points_per_scene)
        rows["x_seq"] = rows["x_cc"] + 0.5 * i
        rows["y_seq"] = rows["y_cc"]
        rows["range_sc"] = np.hypot(rows["x_cc"], rows["y_cc"])
        rows["azimuth_sc"] = rng.uniform(-1, 1, points_per_scene)
        rows["rcs"] = rng.normal(0, 5, points_per_scene)
        rows["vr"] = rng.normal(0, 3, points_per_scene)
        rows["vr_compensated"] = rng.normal(0, 3, points_per_scene)
        rows["label_id"] = 11           # static
        # one small moving object (car) in each scene
        rows["label_id"][:5] = 0
        rows["x_cc"][:5] = 10 + rng.uniform(-1, 1, 5)
        rows["y_cc"][:5] = 3 + rng.uniform(-0.5, 0.5, 5)
        for j in range(5):
            rows["track_id"][j] = b"car_0"
        # one animal point (must be dropped by reduced labels)
        rows["label_id"][5] = 9
        start = sum(r.shape[0] for r in all_rows)
        scenes[str(int(ts))] = {
            "sensor_id": int(sensor),
            "radar_indices": [start, start + points_per_scene],
            "odometry_index": i,
        }
        all_rows.append(rows)

    with h5py.File(os.path.join(seq_dir, "radar_data.h5"), "w") as hf:
        hf.create_dataset("radar_data", data=np.concatenate(all_rows))
        hf.create_dataset("odometry", data=odo)

    meta = {"sequence_name": name, "category": "train", "scenes": scenes}
    with open(os.path.join(seq_dir, "scenes.json"), "w") as f:
        json.dump(meta, f)
    return seq_dir


def _make_dataset_root(tmp_path, num_train=2, num_val=1):
    root = str(tmp_path / "radarscenes")
    raw = os.path.join(root, "raw")
    sequences = {}
    for i in range(num_train):
        name = f"sequence_{i + 1}"
        _make_sequence_dir(raw, name, seed=i)
        sequences[name] = {"category": "train"}
    for i in range(num_val):
        name = f"sequence_val_{i + 1}"
        _make_sequence_dir(raw, name, seed=100 + i)
        sequences[name] = {"category": "validation"}
    os.makedirs(os.path.join(raw, "data"), exist_ok=True)
    with open(os.path.join(raw, "data", "sequences.json"), "w") as f:
        json.dump({"sequences": sequences}, f)
    return root


def test_sequence_reader(tmp_path):
    root = _make_dataset_root(tmp_path)
    seq = Sequence.from_json(os.path.join(
        root, "raw", "data", "sequence_1", "scenes.json"))
    assert len(seq.timestamps) == 8
    scene = seq.get_scene(seq.timestamps[0])
    assert scene.radar_data.shape[0] == 40
    nxt = seq.next_scene_after(seq.timestamps[0])
    assert nxt.timestamp == seq.timestamps[1]
    assert seq.next_timestamp_after(seq.timestamps[-1]) is None


def test_scene_collection_window(tmp_path):
    from radargnn_tpu.data.radarscenes.scene_collection import (
        concatenate_subsequent_scenes,
    )
    root = _make_dataset_root(tmp_path)
    seq = Sequence.from_json(os.path.join(
        root, "raw", "data", "sequence_1", "scenes.json"))
    col = concatenate_subsequent_scenes(seq, int(seq.timestamps[0]), 0.2)
    # 70ms spacing: scenes at 0,70,140,210ms - the 210ms one crosses the
    # 200ms boundary but is still appended (reference walk parity)
    assert len(col.scenes) == 4

    col.process()
    pc = col.point_cloud
    assert pc.num_points == 4 * 40
    # velocity decomposition: v = vr*(cos, sin)(azimuth+yaw)
    yaw = SENSOR_MOUNTING[int(pc.sensor_id[0, 0])]["yaw"]
    ang = pc.azimuth_sc[0, 0] + yaw
    np.testing.assert_allclose(
        pc.V_cc_compensated[0],
        [pc.vr_compensated[0, 0] * np.cos(ang),
         pc.vr_compensated[0, 0] * np.sin(ang)], rtol=1e-6)
    # animal label (9) became NaN
    assert np.isnan(pc.label_id).sum() == 4


def test_full_dataset_creation(tmp_path):
    root = _make_dataset_root(tmp_path)
    graph_config = GraphConstructionConfiguration(
        "knn", {"k": 5, "r": 1.0},
        ["rcs", "velocity_vector", "time_index", "degree"],
        ["relative_position"], "directed", "X")
    dataset_config = RadarScenesDatasetConfiguration(
        time_per_point_cloud_frame=0.2, crop_point_cloud=True,
        crop_settings={"front": 100, "sides": 50},
        bounding_boxes_aligned=False, bb_invariance="translation",
        create_small_subset=False, subset_settings={},
        deterministic=True, seed=1, parallelize=False)

    ds = RadarScenesGraphDataset(root, graph_config, dataset_config)

    for split in ("train", "validate"):
        n = ds.len(split)
        assert n > 0, split
        sample = ds.get(split, 0)
        assert isinstance(sample, GraphSample)
        assert sample.node_feat.shape[1] == 5     # rcs + vel(2) + t_idx + degree
        assert sample.edge_feat.shape[1] == 2     # relative_position
        assert sample.num_edges == sample.num_nodes * 5
        # car points have finite boxes, static NaN
        fg = sample.labels == 0
        assert fg.any()
        assert np.isfinite(sample.boxes[fg]).all()
        assert np.isnan(sample.boxes[~fg]).all()
    assert os.path.exists(os.path.join(root, "processed", "config.json"))


def test_parallel_dataset_creation_matches_serial(tmp_path):
    root_a = _make_dataset_root(tmp_path / "a")
    root_b = _make_dataset_root(tmp_path / "b")
    graph_config = GraphConstructionConfiguration(
        "knn", {"k": 3, "r": 1.0}, ["rcs"], ["relative_position"],
        "directed", "X")
    kw = dict(time_per_point_cloud_frame=0.2, crop_point_cloud=False,
              crop_settings={}, bounding_boxes_aligned=False,
              bb_invariance="translation", create_small_subset=False,
              subset_settings={}, deterministic=True, seed=1)
    RadarScenesGraphDataset(root_a, graph_config,
                            RadarScenesDatasetConfiguration(**kw, parallelize=False))
    RadarScenesGraphDataset(root_b, graph_config,
                            RadarScenesDatasetConfiguration(**kw, parallelize=True),
                            num_workers=2)
    for split in ("train", "validate"):
        files = sorted(os.listdir(os.path.join(root_a, "processed", split)))
        assert files == sorted(os.listdir(os.path.join(root_b, "processed", split)))
        for fname in files:
            a = GraphSample.load_npz(os.path.join(root_a, "processed", split, fname))
            b = GraphSample.load_npz(os.path.join(root_b, "processed", split, fname))
            np.testing.assert_array_equal(a.node_feat, b.node_feat)
            np.testing.assert_array_equal(a.senders, b.senders)
