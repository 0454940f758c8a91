"""Predictor: batched jitted inference over an evaluation loader.

Capability parity with `postprocessor/inference.py:5-75` in /root/reference,
with two TPU-native upgrades: evaluation batches are padded GraphBatches (the
reference forces batch_size=1, `evaluate.py:40`), and the forward + softmax
run jitted on device; only the final per-graph unpadding happens on host.

Faithful quirk: the reference never switches the model to eval mode, so
BatchNorm uses batch statistics during inference; we default to the same
(`use_batch_stats=True`) with the option of running on running averages.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np

from radargnn_tpu.graph.batch import GraphBatch


class Predictor:
    def __init__(self, model, variables, dataloader, verbose: bool = True,
                 use_batch_stats: bool = True):
        self.model = model
        self.variables = variables
        self.dataloader = dataloader
        self.verbose = verbose
        self.use_batch_stats = use_batch_stats
        self._fwd = self._build_forward()

    def _build_forward(self):
        @jax.jit
        def fwd(variables, batch: GraphBatch):
            from radargnn_tpu.models.layers import FUSED_NODE_BLOCK

            tiling = batch.flat_tiling(FUSED_NODE_BLOCK) \
                if getattr(self.model.config, "use_fused_aggregation", False) \
                else None
            out = self.model.apply(
                variables, batch.flat_nodes(), batch.flat_edges(),
                batch.flat_senders(), batch.flat_receivers(),
                batch.node_mask.reshape(-1), batch.edge_mask.reshape(-1),
                train=self.use_batch_stats, tiling=tiling,
                mutable=["batch_stats"] if self.use_batch_stats else False)
            (cls, bb) = out[0] if self.use_batch_stats else out
            cls_prob = jax.nn.softmax(cls, axis=1)
            return cls_prob, bb

        return fwd

    def predict(self) -> Tuple[Dict, Dict, List, List]:
        """Returns (predictions, ground_truth, pos, vel) — per-graph numpy
        lists with padding stripped, matching the reference structure."""
        pos, vel = [], []
        predictions = {"bounding_box_predictions": [],
                       "class_probability_prediction": []}
        ground_truth = {"bounding_box_true": [], "class_true": []}

        num_batches = len(self.dataloader)
        for i, batch in enumerate(self.dataloader):
            cls_prob, bb = self._fwd(self.variables, batch)
            cls_prob, bb = map(np.asarray, jax.device_get((cls_prob, bb)))

            g, n = batch.node_mask.shape
            cls_prob = cls_prob.reshape(g, n, -1)
            bb = bb.reshape(g, n, -1)
            mask = np.asarray(batch.node_mask)
            b_pos = np.asarray(batch.pos)
            b_vel = np.asarray(batch.vel)
            b_labels = np.asarray(batch.labels)
            b_boxes = np.asarray(batch.boxes)

            for gi in range(g):
                m = mask[gi]
                if not m.any():
                    continue        # graph-count padding
                pos.append(b_pos[gi][m].astype(np.float64))
                vel.append(b_vel[gi][m].astype(np.float64))
                ground_truth["class_true"].append(
                    b_labels[gi][m].astype(np.float64))
                ground_truth["bounding_box_true"].append(
                    b_boxes[gi][m].astype(np.float64))
                predictions["bounding_box_predictions"].append(
                    bb[gi][m].astype(np.float64))
                predictions["class_probability_prediction"].append(
                    cls_prob[gi][m].astype(np.float64))

            if self.verbose and ((i + 1) == 1 or (i + 1) % 10 == 0
                                 or (i + 1) == num_batches):
                print(f"{i + 1}/{num_batches} inference batches finished")

        return predictions, ground_truth, pos, vel
