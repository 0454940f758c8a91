"""COCO-style mean-average-precision with point-IoU and rotated-box support.

Re-implements the behavior of the reference's vendored torchmetrics fork
(`postprocessor/torchmetrics_mean_ap.py` in /root/reference, 1030 lines) in
compact vectorized numpy, preserving the decisive semantics:

  * greedy per-image matching in descending-score order; each detection takes
    the not-yet-matched GT with the highest IoU if that IoU is strictly
    greater than the threshold (`_find_best_gt_match:721-747`),
  * max 100 detections per image, mergesort (stable) global score ordering,
  * precision/recall curve with right-to-left precision envelope ("zigzag
    removal", `:956-962`), sampled at 101 recall thresholds via searchsorted,
    zeros beyond the achieved recall,
  * classes = union of GT and detection labels; classes without GT stay at
    sentinel -1 and are excluded from the overall map; per-class AP for them
    is NaN (`_summarize`, `compute`),
  * point-IoU mode: IoU between boxes = discrete IoU of the member points of
    the frame's cloud (`compute_iou:84-128` + `utils/math.py:176-211`).

Area ranges are fixed to "all" (the only range the reference pipeline
consumes) — every box always falls inside, so no ignore logic is needed.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from radargnn_tpu.utils.geometry import point_iou as geometry_point_iou
from radargnn_tpu.postprocess.nms import aligned_iou_matrix, rotated_iou_matrix

MAX_DET = 100
REC_THRESHOLDS = np.linspace(0.0, 1.0, 101)


def _box_iou(det: np.ndarray, gt: np.ndarray, aligned: bool) -> np.ndarray:
    import jax.numpy as jnp
    if aligned:
        return np.asarray(aligned_iou_matrix(jnp.asarray(det), jnp.asarray(gt)))
    return np.asarray(rotated_iou_matrix(jnp.asarray(det), jnp.asarray(gt)))


class MeanAveragePrecision:
    """Accumulates per-image detections/GT; `compute()` returns the metric
    dict with `map`, `map_per_class`, `map_50`, `map_75`, `mar_100`."""

    def __init__(self, iou_thresholds: Optional[List[float]] = None,
                 class_metrics: bool = True):
        self.iou_thresholds = list(iou_thresholds or
                                   np.arange(0.5, 1.0, 0.05).round(2).tolist())
        self.class_metrics = class_metrics
        self.detections: List[np.ndarray] = []
        self.detection_scores: List[np.ndarray] = []
        self.detection_labels: List[np.ndarray] = []
        self.groundtruths: List[np.ndarray] = []
        self.groundtruth_labels: List[np.ndarray] = []
        self.point_clouds: List[Optional[np.ndarray]] = []
        self.use_point_iou = False
        self.is_aligned = True

    def update(self, preds: List[Dict], target: List[Dict],
               use_point_iou: bool = False,
               point_clouds: Optional[List[np.ndarray]] = None,
               is_aligned: bool = True) -> None:
        for item in preds:
            self.detections.append(np.asarray(item["boxes"], np.float64))
            self.detection_scores.append(np.asarray(item["scores"], np.float64))
            self.detection_labels.append(
                np.asarray(item["labels"]).astype(np.int64).reshape(-1))
        for item in target:
            self.groundtruths.append(np.asarray(item["boxes"], np.float64))
            self.groundtruth_labels.append(
                np.asarray(item["labels"]).astype(np.int64).reshape(-1))
        self.use_point_iou = use_point_iou
        self.is_aligned = is_aligned
        if use_point_iou and point_clouds is not None:
            self.point_clouds.extend(point_clouds)

    # ------------------------------------------------------------------

    def _classes(self) -> List[int]:
        labels = self.detection_labels + self.groundtruth_labels
        if not labels:
            return []
        return sorted(np.unique(np.concatenate(labels)).tolist())

    def _iou(self, idx: int, det: np.ndarray, gt: np.ndarray) -> np.ndarray:
        if det.shape[0] == 0 or gt.shape[0] == 0:
            return np.zeros((det.shape[0], gt.shape[0]))
        if self.use_point_iou:
            return np.asarray(geometry_point_iou(
                det, gt, self.point_clouds[idx], self.is_aligned))
        return _box_iou(det, gt, self.is_aligned)

    def _evaluate_image(self, idx: int, class_id: int):
        det_mask = self.detection_labels[idx] == class_id
        gt_mask = self.groundtruth_labels[idx] == class_id
        nb_det, nb_gt = int(det_mask.sum()), int(gt_mask.sum())
        if nb_det == 0 and nb_gt == 0:
            return None

        scores = self.detection_scores[idx][det_mask]
        order = np.argsort(-scores, kind="stable")[:MAX_DET]
        scores_sorted = scores[order]
        det = self.detections[idx][det_mask][order] if nb_det else \
            np.zeros((0, self.detections[idx].shape[1] if
                      self.detections[idx].ndim == 2 else 4))
        gt = self.groundtruths[idx][gt_mask] if nb_gt else np.zeros((0, 4))

        T = len(self.iou_thresholds)
        nd = det.shape[0]
        det_matches = np.zeros((T, nd), bool)
        gt_matches = np.zeros((T, nb_gt), bool)

        if nd and nb_gt:
            ious = self._iou(idx, det, gt)
            for ti, t in enumerate(self.iou_thresholds):
                for di in range(nd):
                    cand = ious[di] * ~gt_matches[ti]
                    gi = int(np.argmax(cand))
                    if cand[gi] > t:
                        det_matches[ti, di] = True
                        gt_matches[ti, gi] = True

        return {"dtMatches": det_matches, "dtScores": scores_sorted,
                "nb_gt": nb_gt}

    def _calculate_class(self, class_id: int):
        """Returns (precision[T,101] or None, recall[T] or None)."""
        evals = [self._evaluate_image(i, class_id)
                 for i in range(len(self.detections))]
        evals = [e for e in evals if e is not None]
        if not evals:
            return None, None
        npig = sum(e["nb_gt"] for e in evals)
        if npig == 0:
            return None, None

        det_scores = np.concatenate([e["dtScores"] for e in evals])
        inds = np.argsort(-det_scores, kind="stable")
        det_scores_sorted = det_scores[inds]
        det_matches = np.concatenate([e["dtMatches"] for e in evals],
                                     axis=1)[:, inds]

        T = len(self.iou_thresholds)
        nb_rec = len(REC_THRESHOLDS)
        precision = np.zeros((T, nb_rec))
        recall = np.zeros((T,))

        for ti in range(T):
            tp = np.cumsum(det_matches[ti]).astype(np.float64)
            fp = np.cumsum(~det_matches[ti]).astype(np.float64)
            nd = tp.shape[0]
            if nd == 0:
                continue
            rc = tp / npig
            pr = tp / (tp + fp + np.finfo(np.float64).eps)
            recall[ti] = rc[-1]

            # precision envelope (zigzag removal): running max from the right
            pr = np.maximum.accumulate(pr[::-1])[::-1]

            inds_r = np.searchsorted(rc, REC_THRESHOLDS, side="left")
            prec = np.zeros((nb_rec,))
            valid = inds_r < nd
            prec[valid] = pr[inds_r[valid]]
            precision[ti] = prec
            _ = det_scores_sorted  # scores curve not consumed downstream
        return precision, recall

    def compute(self) -> Dict[str, object]:
        classes = self._classes()
        T = len(self.iou_thresholds)
        nb_rec = len(REC_THRESHOLDS)
        precisions = np.full((T, nb_rec, len(classes)), -1.0)
        recalls = np.full((T, len(classes)), -1.0)

        for ci, c in enumerate(classes):
            prec, rec = self._calculate_class(c)
            if prec is not None:
                precisions[:, :, ci] = prec
                recalls[:, ci] = rec

        def _mean_valid(a):
            v = a[a > -1]
            return float(v.mean()) if v.size else -1.0

        result = {
            "map": _mean_valid(precisions),
            "mar_100": _mean_valid(recalls),
            "classes": classes,
        }
        for thr_name, thr in (("map_50", 0.5), ("map_75", 0.75)):
            if thr in self.iou_thresholds:
                ti = self.iou_thresholds.index(thr)
                result[thr_name] = _mean_valid(precisions[ti])
            else:
                result[thr_name] = -1.0

        if self.class_metrics:
            per_class = []
            for ci in range(len(classes)):
                p = precisions[:, :, ci]
                v = p[p > -1]
                per_class.append(float(v.mean()) if v.size else float("nan"))
            result["map_per_class"] = np.asarray(per_class)
        else:
            result["map_per_class"] = np.asarray([-1.0])
        return result
