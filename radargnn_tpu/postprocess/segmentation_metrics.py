"""Semantic-segmentation metrics: F1, confusion matrices.

Parity: `SegmentationMetrics` (`postprocessor/metrics.py:136-196` in
/root/reference) — thin assembly over sklearn, same label-range conventions.
Also hosts `ObjectDetectionMetrics.get_map`, the mAP driver
(`postprocessor/metrics.py:12-133`) wired to our clean engine.
"""

from __future__ import annotations

from typing import List

import numpy as np
from sklearn.metrics import confusion_matrix, f1_score, multilabel_confusion_matrix

from radargnn_tpu.configs import PostProcessingConfiguration
from radargnn_tpu.postprocess.mean_ap import MeanAveragePrecision


class ObjectDetectionMetrics:
    """mAP from postprocessed predictions. Parity: `metrics.py:12-133`."""

    @staticmethod
    def _prediction_dicts(bb_pred: List) -> List[dict]:
        dicts = []
        for res in bb_pred:
            boxes = res["boxes"]
            if len(boxes) == 0:
                matrix = np.empty([0, 0])
            elif boxes.aligned:
                matrix = boxes.to_two_point()
            else:
                matrix = boxes.to_xylwt()
            dicts.append({"boxes": matrix,
                          "scores": np.asarray(res["scores"], np.float64),
                          "labels": np.asarray(res["labels"], np.int64)})
        return dicts

    @staticmethod
    def _ground_truth_dicts(bb_ground_truth: List) -> List[dict]:
        dicts = []
        for res in bb_ground_truth:
            boxes = res["boxes"]
            if len(boxes) == 0:
                matrix = np.empty([0, 0])
            elif boxes.aligned:
                matrix = boxes.to_two_point()
            else:
                matrix = boxes.to_xylwt()
            dicts.append({"boxes": matrix,
                          "labels": np.asarray(res["labels"], np.int64)})
        return dicts

    @classmethod
    def get_map(cls, eval_config: PostProcessingConfiguration, bb_pred: List,
                bb_ground_truth: List, cls_pred: List) -> dict:
        iou_thresholds = [eval_config.iou_for_mAP]
        pos = [d["pos"] for d in cls_pred]
        aligned = next((p["boxes"].aligned for p in bb_pred
                        if len(p["boxes"])), True)

        prediction_dicts = cls._prediction_dicts(bb_pred)
        ground_truth_dicts = cls._ground_truth_dicts(bb_ground_truth)

        if not aligned and not eval_config.use_point_iou:
            raise ValueError(
                "so far only Point-IOU based mAP calculation is possible for "
                "rotated bounding boxes, select 'use_point_iou = True' in "
                "configuration for rotated boxes")

        metric = MeanAveragePrecision(iou_thresholds, class_metrics=True)
        if eval_config.use_point_iou:
            metric.update(prediction_dicts, ground_truth_dicts, True, pos, aligned)
        else:
            metric.update(prediction_dicts, ground_truth_dicts)
        return metric.compute()


class SegmentationMetrics:
    def __init__(self, cls_pred_label: List, cls_ground_truth: List):
        self.y_true = self._ground_truth_vector(cls_ground_truth)
        self.y_pred = self._prediction_vector(cls_pred_label)

    def get_f1(self, num_classes: int, average):
        return f1_score(self.y_true, self.y_pred,
                        labels=range(num_classes), average=average)

    def get_confusion_matrix(self, num_classes: int) -> np.ndarray:
        return confusion_matrix(self.y_true, self.y_pred,
                                labels=range(num_classes))

    def get_confusion_matrices_per_class(self, num_classes: int) -> np.ndarray:
        return multilabel_confusion_matrix(self.y_true, self.y_pred,
                                           labels=range(num_classes))

    @staticmethod
    def _prediction_vector(cls_pred_label) -> list:
        y = np.concatenate([np.asarray(c).reshape(-1, 1)
                            for c in cls_pred_label], axis=0)
        return y.astype(int).tolist()

    @staticmethod
    def _ground_truth_vector(cls_ground_truth) -> list:
        y = np.concatenate(
            [np.asarray(c["labels"]).reshape(-1, 1) for c in cls_ground_truth],
            axis=0)
        return y.astype(int).tolist()
