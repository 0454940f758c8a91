"""radargnn_tpu — a TPU-native GNN framework for radar point-cloud perception.

A from-scratch JAX/XLA/Pallas re-design of the capability set of TUMFTM/RadarGNN
(point-level GNNs for semantic segmentation + object detection on automotive
radar point clouds; see /root/reference). Not a port: all compute-path code is
built around static-shape padded graph batches, fused gather/segment-reduce
kernels, and pjit/shard_map device-mesh parallelism.

Layers (mirroring the reference's capability inventory, SURVEY.md §1):
    configs          — YAML → typed dataclass configuration system
    graph            — graph construction + invariant feature extraction
    ops              — gather / segment-reduce / kNN device kernels (jnp + Pallas)
    models           — MPNN conv layers + DetNet detection/segmentation model
    train            — losses, schedules, Trainer, checkpointing
    postprocess      — box decode, NMS, mAP/F1 metrics, evaluators
    data             — dataset creation pipelines + padded-bucket loading
    parallel         — mesh construction, sharding rules, edge partitioning
    utils            — geometry, class properties, result folders, profiling
"""

__version__ = "0.1.0"
