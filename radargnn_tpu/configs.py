"""Typed configuration system: single 3-section YAML → dataclasses.

Capability parity with the reference config layer
(`utils/user_config_reader.py:10-66`, `preprocessor/configs.py:4-26`,
`preprocessor/radarscenes/configs.py:5-61`, `preprocessor/nuscenes/configs.py:6-48`,
`gnn/configs.py:4-100`, `postprocessor/configs.py:4-27` in /root/reference).

The YAML schema is identical (CREATE_DATASET / TRAIN / EVALUATE sections with
DATASET_PROCESSING, GRAPH_CONSTRUCTION, MODEL_ARCHITECTURE, TRAINING,
POSTPROCESSING subsections) so reference configuration files work verbatim.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import yaml


def dataclass_from_dict(data_class, d):
    """Recursively converts a dict into a dataclass instance.

    Mirrors `user_config_reader.dataclass_from_dict` (reference
    `utils/user_config_reader.py:10-17`): unknown leaf values pass through.
    """
    try:
        fieldtypes = {f.name: f.type for f in dataclasses.fields(data_class)}
        return data_class(**{f: dataclass_from_dict(fieldtypes[f], d[f]) for f in d})
    except Exception:
        return d


# --------------------------------------------------------------------------
# Graph construction
# --------------------------------------------------------------------------

@dataclass
class GraphConstructionConfiguration:
    """Settings for building a graph from a point cloud.

    Parity: `preprocessor/configs.py:4-26`.
    """

    graph_construction_algorithm: str       # "knn" | "radius"
    graph_construction_settings: dict       # {"k": int, "r": float}

    node_features: list
    edge_features: list
    edge_mode: str                          # "directed" | "undirected"

    distance_definition: str                # "X" | "XV"

    def __post_init__(self):
        if self.graph_construction_algorithm == "knn":
            self.k = self.graph_construction_settings.get("k")
            self.r = None
        elif self.graph_construction_algorithm == "radius":
            self.r = self.graph_construction_settings.get("r")
            self.k = None
        else:
            raise ValueError("Invalid graph construction algorithm selected")


# --------------------------------------------------------------------------
# Dataset creation
# --------------------------------------------------------------------------

@dataclass
class RadarScenesDatasetConfiguration:
    """Settings for creating point-cloud frames from RadarScenes.

    Parity: `preprocessor/radarscenes/configs.py:5-21`.
    """

    time_per_point_cloud_frame: float
    crop_point_cloud: bool
    crop_settings: dict
    bounding_boxes_aligned: bool
    bb_invariance: str                      # "none" | "translation" | "en"
    create_small_subset: bool
    subset_settings: dict = None

    deterministic: bool = False
    seed: int = 0

    parallelize: bool = False


# The 28 hard-coded held-out test sequences of the reference standard split
# (`preprocessor/radarscenes/configs.py:42-44`). Indices into the RadarScenes
# "training" sequence list; the remaining training sequences become "train".
RADARSCENES_TEST_SPLIT_INDICES = frozenset({
    4, 6, 11, 16, 18, 24, 33, 34, 36, 37, 42, 44, 48, 52,
    53, 60, 63, 67, 73, 84, 86, 92, 94, 100, 108, 119, 124, 126,
})


@dataclass
class RadarScenesSplitConfiguration:
    """Train/test/validate split over RadarScenes sequences.

    Parity: `preprocessor/radarscenes/configs.py:24-61`. Instead of requiring
    the `radar_scenes` SDK, the sequences.json is parsed directly: sequences
    whose "category" is "train" form train+test (split via
    RADARSCENES_TEST_SPLIT_INDICES), category "validation" forms validate.
    """

    sequence_dict: dict

    def __init__(self, sequence_file: str = None, standard_split: bool = True,
                 train_sequences: list = (), test_sequences: list = (),
                 validate_sequences: list = ()):
        if standard_split:
            import json
            with open(sequence_file) as f:
                seq_meta = json.load(f)["sequences"]
            train_val = [name for name, meta in seq_meta.items()
                         if meta.get("category") == "train"]
            validate = [name for name, meta in seq_meta.items()
                        if meta.get("category") == "validation"]
            all_idx = set(range(len(train_val)))
            # indices beyond the sequence count are ignored (lets reduced /
            # synthetic datasets reuse the standard split machinery)
            idx_test = {i for i in RADARSCENES_TEST_SPLIT_INDICES
                        if i < len(train_val)}
            idx_train = all_idx - idx_test
            self.sequence_dict = {
                "train": [train_val[i] for i in idx_train],
                "test": [train_val[i] for i in idx_test],
                "validate": validate,
            }
        else:
            self.sequence_dict = {
                "train": list(train_sequences),
                "test": list(test_sequences),
                "validate": list(validate_sequences),
            }


@dataclass
class NuScenesDatasetConfiguration:
    """Settings for creating point-cloud frames from nuScenes.

    Parity: `preprocessor/nuscenes/configs.py:6-19`.
    """

    version: str = "v1.0-trainval"
    nsweeps: int = 1
    crop_point_cloud: bool = False
    crop_settings: dict = None
    wlh_factor: float = 1.0
    wlh_offset: float = 0.0
    bounding_boxes_aligned: bool = False
    bb_invariance: str = "translation"
    deterministic: bool = False
    seed: int = 0


@dataclass
class NuScenesSplitConfiguration:
    """Scene-name split for nuScenes. Parity: `preprocessor/nuscenes/configs.py:22-48`."""

    sequence_dict: dict

    def __init__(self, version: str = "v1.0-mini"):
        from radargnn_tpu.data.nuscenes import splits
        if version == "v1.0-mini":
            self.sequence_dict = {
                "train": list(sorted(set(splits.mini_train))),
                "validate": list(sorted(set(splits.mini_val))),
            }
        elif version == "v1.0-trainval":
            self.sequence_dict = {
                "train": list(sorted(set(splits.train_detect + splits.train_track))),
                "validate": list(sorted(set(splits.val))),
            }
        elif version == "v1.0-test":
            self.sequence_dict = {"test": list(sorted(set(splits.test)))}
        else:
            raise ValueError(
                f"The given dataset version {version} is not a valid version "
                f"of the nuScenes Dataset!")


# --------------------------------------------------------------------------
# Model / training
# --------------------------------------------------------------------------

@dataclass
class GNNArchitectureConfig:
    """GNN model architecture. Parity: `gnn/configs.py:4-30`."""

    node_feature_dimension: int
    edge_feature_dimension: int

    conv_layer_dimensions: list
    classification_head_layer_dimensions: list
    regression_head_layer_dimensions: list

    initial_node_feature_embedding: bool = False
    initial_edge_feature_embedding: bool = False
    node_feature_embedding_layer_dimensions: list = None
    edge_feature_embedding_layer_dimensions: list = None
    conv_layer_type: str = "MPNNConv"

    batch_norm_in_mlps: bool = True
    conv_pre_mlp_layer_number: int = 1
    conv_post_mlp_layer_number: int = 1
    conv_use_edge_encoder: bool = False
    aggregation_function: str = "max"

    # ---- TPU-native extension: matmul compute dtype ("float32"|"bfloat16").
    # Parameters and reductions stay float32; bfloat16 feeds the MXU at its
    # full rate and halves gather bandwidth on the edge hot path.
    compute_dtype: str = "float32"
    # Edges are receiver-sorted within each graph (the GraphDataLoader /
    # stack_samples default layout) — enables the sorted-scatter fast path.
    # Must be False for hand-built unsorted edge lists.
    assume_sorted_edges: bool = False
    # Use the fused Pallas max-aggregation kernels (requires CSR tiling in
    # the batch — the CLI/loader build it automatically — and pre_layers==1,
    # aggr "max"). Default None = AUTO: enabled exactly when those
    # preconditions hold (resolved in __post_init__ with a log line on
    # fallback), so a verbatim reference YAML gets the fast kernels.
    # Set False to force the unfused XLA path.
    use_fused_aggregation: Optional[bool] = None
    # Tiling flavor for the fused path: "auto" (DEFAULT — dense for kNN
    # graphs, windowed for radius graphs and under halo edge partitioning),
    # "windowed" (v3 Morton-windowed kernels — required for radius graphs;
    # the halo path composes with either family), "dense" (v4 fixed-degree
    # kernels — kNN graphs only: k+4 in-edge slots per receiver,
    # aggregation by static-slice max instead of a landing one-hot matmul;
    # the fastest kNN path), or "csr" (v2 sender-sorted backward).
    fused_tiling: str = "auto"
    # Static overflow-edge budget fraction for the windowed tiling; raise if
    # the loader reports "window overflow ... exceeds budget".
    fused_overflow_fraction: float = 0.05
    # OPT-IN speed knob: backward-only bf16 max-gradient routing in the
    # windowed kernels (r5: strict routing costs only ~20% vs this knob —
    # 7.87M vs 9.9M edges/s — since the exact split-selection dots,
    # docs/KERNELS.md r5; the dense family's strict routing is free).
    # Gradient-semantics caveat (why this is OFF by default): every
    # message tied with the max at bf16 resolution receives the FULL
    # upstream cotangent, so k ties contribute k·g — not a valid
    # subgradient when bf16 ties occur. Convergence measured equivalent
    # on the flagship runs (docs/RESULTS.md); enable explicitly (or via
    # RADARGNN_FUSED_BF16_MAX=1) when that trade is acceptable. The
    # default exact-f32 routing gives each bf16-tied edge gradient only
    # when it is the true f32 max (tested in tests/test_pallas.py).
    fused_bf16_max: bool = False
    # Spread tiling run cap for the windowed kernels: cap the longest
    # same-receiver edge run per tile (host scheduler spreads a receiver's
    # edges across its block's tiles). run_cap=1 removes the forward
    # kernel's segmented-max roll loop entirely (the landing one-hot matmul
    # + cross-tile max do the reduction on the MXU) — the measured VPU
    # bottleneck of the v3 forward. None keeps contiguous CSR runs with
    # log2(max in-degree) roll passes. Env RADARGNN_FUSED_RUN_CAP overrides.
    # Default 4 = the measured winner (docs/RESULTS.md: +1.4% net over
    # contiguous runs at the flagship shape; pairs with the 0.05 overflow
    # default). Set null for contiguous CSR runs.
    fused_run_cap: Optional[int] = 4
    # Halo (multi-chip edge partitioning) window-overflow budget: fraction
    # of each shard's LOCAL edge budget reserved for edges whose sender
    # misses the Morton window. Per-shard partitions see a wider sender
    # spread than a single-chip tiling, so this is budgeted separately from
    # fused_overflow_fraction (single-chip default 0.05; halo default 0.5).
    # Too small → build_halo_windowed_plan raises at plan build with the
    # required size; too large only wastes overflow-path padding.
    halo_overflow_fraction: float = 0.5

    def __post_init__(self):
        # Resolve the AUTO fused-aggregation default: the fused kernel
        # families accelerate exactly the hoisted configuration (single
        # linear pre-MLP + max aggregation — the reference's default,
        # configuration_radarscenes.yml). Anything else falls back to the
        # unfused XLA path with a log line so the user knows why.
        if self.use_fused_aggregation is None:
            ok = (self.conv_pre_mlp_layer_number == 1
                  and self.aggregation_function == "max")
            self.use_fused_aggregation = ok
            if not ok:
                import logging
                logging.getLogger(__name__).info(
                    "fused aggregation auto-disabled: requires "
                    "conv_pre_mlp_layer_number == 1 and "
                    "aggregation_function == 'max' (got %d, %r); "
                    "running the unfused XLA aggregation path",
                    self.conv_pre_mlp_layer_number,
                    self.aggregation_function)


@dataclass
class TrainingConfig:
    """Training hyper-parameters. Parity: `gnn/configs.py:33-100`."""

    dataset: str

    learning_rate: float
    epochs: int
    batch_size: int
    shuffle: bool

    bg_index: int

    deterministic: bool = False
    seed: int = 0

    class_weights: dict = field(default_factory=dict)
    set_weights_according_radar_scenes_distribution: bool = False
    val_class_weights: dict = field(default_factory=dict)

    bb_loss_weight: float = 1
    cls_loss_weight: float = 1

    regularization_strength: float = 1e-4
    reduce_lr_on_plateau_factor: float = 0.5
    reduce_lr_on_plateau_patience: int = 0
    exponential_lr_decay_factor: float = 0.0

    early_stopping_patience: int = 10

    adapt_orientation_angle: bool = False

    # ---- TPU-native extensions (no reference equivalent) -------------------
    # Largest node count per padded graph bucket; edges pad to k*max_nodes.
    max_nodes_per_graph: int = 0            # 0 → derive from data
    # Mid-training checkpointing interval in epochs (0 = end-of-training only).
    checkpoint_every_epochs: int = 0
    # Mesh shape for pjit: {"data": -1} style dict; empty → single device.
    mesh_axes: dict = field(default_factory=dict)
    # Tensor parallelism: shard eligible MLP kernels column-parallel over
    # the mesh 'model' axis (parallel/tensor.py). Capability hook — at the
    # reference's ≤464 widths this is perf-neutral (docs/SCALING.md).
    shard_params_over_model: bool = False
    # Train steps fused into one device dispatch via lax.scan (amortizes
    # host→device dispatch latency; 1 = one dispatch per batch).
    scan_steps_per_dispatch: int = 1
    # Compute dtype for conv stacks ("float32" | "bfloat16") — forwarded to
    # the model when set on the architecture config.
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.dataset == "radarscenes":
            self.class_weights.setdefault("car", 1)
            self.class_weights.setdefault("pedestrian", 1)
            self.class_weights.setdefault("pedestrian_group", 1)
            self.class_weights.setdefault("two_wheeler", 1)
            self.class_weights.setdefault("large_vehicle", 1)
            self.class_weights.setdefault("background", 0.05)
        elif self.dataset == "nuscenes":
            self.class_weights.setdefault("background", 0.05)
            self.class_weights.setdefault("barrier", 1)
            self.class_weights.setdefault("bicycle", 1)
            self.class_weights.setdefault("bus", 1)
            self.class_weights.setdefault("car", 1)
            self.class_weights.setdefault("construction", 1)
            self.class_weights.setdefault("motorcycle", 1)
            self.class_weights.setdefault("pedestrian", 1)
            self.class_weights.setdefault("trafficcone", 1)
            self.class_weights.setdefault("trailer", 1)
            self.class_weights.setdefault("truck", 1)
        else:
            raise ValueError("Only the radarscenes and nuscenes dataset are supported!")

        if self.val_class_weights:
            assert set(self.class_weights.keys()) == set(self.val_class_weights.keys())
        else:
            self.val_class_weights = self.class_weights


# --------------------------------------------------------------------------
# Postprocessing / evaluation
# --------------------------------------------------------------------------

@dataclass
class PostProcessingConfiguration:
    """Postprocessing + evaluation settings. Parity: `postprocessor/configs.py:4-27`."""

    split: str

    iou_for_nms: float
    min_object_score: dict
    max_score_for_background: float

    iou_for_mAP: float = 0.3
    use_point_iou: bool = False

    bg_index: int = 5

    bb_invariance: str = "translation"
    adapt_orientation_angle: bool = False

    get_mAP: bool = True
    get_confusion: bool = True
    get_segmentation_f1: bool = True
    f1_class_averaging: Optional[str] = None


# --------------------------------------------------------------------------
# Reader
# --------------------------------------------------------------------------

def _dataset_config_selector(dataset: str):
    return {
        "radarscenes": RadarScenesDatasetConfiguration,
        "nuscenes": NuScenesDatasetConfiguration,
    }[dataset]


class ConfigToDataClassMapping:
    """Parity: `utils/user_config_reader.py:20-37`."""

    @staticmethod
    def get_mapping_dicts(dataset: str):
        dataclass_mapping_dict = {
            "DATASET_PROCESSING": _dataset_config_selector(dataset),
            "GRAPH_CONSTRUCTION": GraphConstructionConfiguration,
            "MODEL_ARCHITECTURE": GNNArchitectureConfig,
            "TRAINING": TrainingConfig,
            "POSTPROCESSING": PostProcessingConfiguration,
        }
        supertask_mapping_dict = {
            "DATASET_PROCESSING": "CREATE_DATASET",
            "GRAPH_CONSTRUCTION": "CREATE_DATASET",
            "MODEL_ARCHITECTURE": "TRAIN",
            "TRAINING": "TRAIN",
            "POSTPROCESSING": "EVALUATE",
        }
        return dataclass_mapping_dict, supertask_mapping_dict


class UserConfigurationReader:
    """YAML → dataclass reader. Parity: `utils/user_config_reader.py:40-66`."""

    @staticmethod
    def get_config_object(config_subset_name: str, config_dict: dict):
        dataset = config_dict["CREATE_DATASET"]["dataset"]
        dataclass_mapping, supertask_mapping = \
            ConfigToDataClassMapping.get_mapping_dicts(dataset)

        super_task = supertask_mapping.get(config_subset_name)
        subset_config_dict = config_dict.get(super_task).get(config_subset_name)

        config = dataclass_from_dict(
            dataclass_mapping.get(config_subset_name), subset_config_dict)

        if not isinstance(config, dataclass_mapping.get(config_subset_name)):
            raise ValueError("Conversion of config file to dataclass failed.")
        return config

    @staticmethod
    def read_config_file(path: str) -> dict:
        with open(path) as f:
            return yaml.safe_load(f)
