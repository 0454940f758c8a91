"""Postprocessing pipeline: decode, NMS integration, mAP engine, evaluators.

The strongest oracle: feeding ground truth back as perfect predictions
through the full decode→NMS→mAP path must give mAP 1.0 for every invariance
mode; corrupted predictions must lower it in the expected way.
"""

import numpy as np
import pytest

from radargnn_tpu.configs import PostProcessingConfiguration
from radargnn_tpu.data.ground_truth import create_2d_bounding_boxes
from radargnn_tpu.postprocess import (
    MeanAveragePrecision, Postprocessor, SegmentationMetrics,
    RadarscenesEvaluator,
)


def _config(**kw):
    base = dict(
        split="validate", iou_for_nms=0.01,
        min_object_score={"car": 0.5, "pedestrian": 0.5, "pedestrian_group": 0.5,
                          "two_wheeler": 0.5, "large_vehicle": 0.5},
        max_score_for_background=0.2, iou_for_mAP=0.3, use_point_iou=True,
        bg_index=5, bb_invariance="translation")
    base.update(kw)
    return PostProcessingConfiguration(**base)


def _frame(rng, n=60, bb_invariance="translation", aligned=False):
    """Synthetic frame with 3 objects; returns pos, vel, labels, gt boxes."""
    pos = rng.uniform(0, 50, size=(n, 2))
    labels = np.full(n, 5)
    tracks = np.full(n, b"", object)
    centers = [np.array([10.0, 10.0]), np.array([25.0, 40.0]),
               np.array([42.0, 15.0])]
    for obj, (lo, hi) in enumerate([(0, 6), (6, 14), (14, 19)]):
        center = centers[obj]
        pos[lo:hi] = center + rng.uniform(-2, 2, size=(hi - lo, 2))
        labels[lo:hi] = obj % 5
        tracks[lo:hi] = str(obj).encode()
    boxes = create_2d_bounding_boxes(pos, tracks, aligned, bb_invariance)
    vel = rng.normal(size=(n, 2))
    return pos, vel, labels.astype(float), boxes


def _perfect_class_probs(labels, n_classes=6):
    probs = np.full((len(labels), n_classes), 0.01)
    probs[np.arange(len(labels)), labels.astype(int)] = 0.9
    return probs


@pytest.mark.parametrize("bb_invariance,aligned", [
    ("translation", False), ("none", False), ("en", False),
    ("translation", True),
])
def test_perfect_predictions_give_map_1(bb_invariance, aligned):
    rng = np.random.default_rng(0)
    config = _config(bb_invariance=bb_invariance)
    pp = Postprocessor()

    raw_pos, raw_vel, preds, gts = [], [], {
        "bounding_box_predictions": [], "class_probability_prediction": []}, {
        "bounding_box_true": [], "class_true": []}
    for _ in range(3):
        pos, vel, labels, boxes = _frame(
            rng, bb_invariance=bb_invariance, aligned=aligned)
        raw_pos.append(pos)
        raw_vel.append(vel)
        bb_pred = np.nan_to_num(boxes, nan=0.0)       # model outputs no NaNs
        preds["bounding_box_predictions"].append(bb_pred)
        preds["class_probability_prediction"].append(
            _perfect_class_probs(labels))
        gts["bounding_box_true"].append(boxes)
        gts["class_true"].append(labels)

    bb_pred, bb_gt, cls_pred, cls_gt = pp.process(
        config, raw_pos, raw_vel, preds, gts)

    # every frame: 3 deduped GT objects
    for gt in bb_gt:
        assert len(gt["boxes"]) == 3

    from radargnn_tpu.postprocess import ObjectDetectionMetrics
    res = ObjectDetectionMetrics.get_map(config, bb_pred, bb_gt, cls_pred)
    assert res["map"] == pytest.approx(1.0, abs=1e-6)


def test_bad_predictions_reduce_map():
    rng = np.random.default_rng(1)
    config = _config()
    pp = Postprocessor()

    pos, vel, labels, boxes = _frame(rng)
    # shift all predicted boxes far away
    bb_pred = np.nan_to_num(boxes, nan=0.0).copy()
    bb_pred[:, 0] += 30
    bb_pred[:, 1] += 30

    preds = {"bounding_box_predictions": [bb_pred],
             "class_probability_prediction": [_perfect_class_probs(labels)]}
    gts = {"bounding_box_true": [boxes], "class_true": [labels]}
    bb_p, bb_g, cls_p, cls_g = pp.process(config, [pos], [vel], preds, gts)

    from radargnn_tpu.postprocess import ObjectDetectionMetrics
    res = ObjectDetectionMetrics.get_map(config, bb_p, bb_g, cls_p)
    assert res["map"] < 0.2


def test_map_engine_simple_aligned_oracle():
    """Hand-computed: 1 GT, 2 dets (one TP at higher score, one FP lower)
    → PR curve gives AP 1.0; FP-first ordering gives lower AP."""
    m = MeanAveragePrecision([0.5])
    preds = [{"boxes": np.array([[0, 0, 2, 2], [10, 10, 12, 12]]),
              "scores": np.array([0.9, 0.3]),
              "labels": np.array([0, 0])}]
    target = [{"boxes": np.array([[0, 0, 2, 2]]), "labels": np.array([0])}]
    m.update(preds, target)
    assert m.compute()["map"] == pytest.approx(1.0)

    m = MeanAveragePrecision([0.5])
    preds[0]["scores"] = np.array([0.3, 0.9])        # FP ranked first
    m.update(preds, target)
    # precision at recall>0 is 1/2 → AP = 0.5
    assert m.compute()["map"] == pytest.approx(0.5)


def test_map_classes_without_gt_are_excluded():
    m = MeanAveragePrecision([0.5])
    preds = [{"boxes": np.array([[0, 0, 2, 2], [5, 5, 6, 6]]),
              "scores": np.array([0.9, 0.8]), "labels": np.array([0, 3])}]
    target = [{"boxes": np.array([[0, 0, 2, 2]]), "labels": np.array([0])}]
    m.update(preds, target)
    res = m.compute()
    assert res["map"] == pytest.approx(1.0)           # class 3 has no GT
    assert np.isnan(res["map_per_class"][1])          # class 3 AP = NaN


def test_map_strictly_greater_threshold():
    """IoU == threshold must NOT match (reference `_find_best_gt_match`)."""
    m = MeanAveragePrecision([0.5])
    # IoU exactly 0.5: [0,0,2,1] vs [0,0,1,1] -> inter 1, union 2
    preds = [{"boxes": np.array([[0, 0, 2, 1.0]]), "scores": np.array([0.9]),
              "labels": np.array([0])}]
    target = [{"boxes": np.array([[0, 0, 1, 1.0]]), "labels": np.array([0])}]
    m.update(preds, target)
    assert m.compute()["map"] == pytest.approx(0.0)


def test_segmentation_metrics():
    cls_pred_label = [np.array([[0], [1], [5]]), np.array([[2], [5]])]
    cls_gt = [{"labels": np.array([0, 1, 5])}, {"labels": np.array([2, 2])}]
    seg = SegmentationMetrics(cls_pred_label, cls_gt)
    f1 = seg.get_f1(6, None)
    assert f1[0] == 1.0 and f1[1] == 1.0
    cm = seg.get_confusion_matrix(6)
    assert cm[2, 2] == 1 and cm[2, 5] == 1
    assert cm.sum() == 5


def test_radarscenes_evaluator_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    config = _config()
    pp = Postprocessor()

    pos, vel, labels, boxes = _frame(rng)
    preds = {"bounding_box_predictions": [np.nan_to_num(boxes, nan=0.0)],
             "class_probability_prediction": [_perfect_class_probs(labels)]}
    gts = {"bounding_box_true": [boxes], "class_true": [labels]}
    bb_p, bb_g, cls_p, cls_g = pp.process(config, [pos], [vel], preds, gts)

    from radargnn_tpu.postprocess import PredictionExtractor
    cls_pred_label = PredictionExtractor().extract(preds)

    ev = RadarscenesEvaluator(config)
    ev.evaluate(bb_p, bb_g, cls_p, cls_pred_label, cls_g)
    assert ev.mAP == pytest.approx(1.0)
    assert ev.f1_segmentation is not None

    folder = ev.save_results(str(tmp_path))
    import os
    for art in ("eval_configs.json", "eval_results.json", "confusion_abs.npy",
                "confusion_rel.npy", "confusion.png"):
        assert os.path.exists(os.path.join(folder, art))
    # numbering
    ev.save_results(str(tmp_path))
    assert os.path.isdir(os.path.join(str(tmp_path), "evaluation_02"))


def _naive_coco_ap(dets, gts, iou_fn, thr):
    """First-principles single-class COCO AP (independent of the engine):
    greedy best-IoU matching per image in score order, global score sort,
    101-point interpolated precision with right-max envelope."""
    records = []  # (score, is_tp)
    npig = sum(len(g) for g in gts)
    for det_i, gt_i in zip(dets, gts):
        det_i = sorted(det_i, key=lambda d: -d[1])
        matched = [False] * len(gt_i)
        for box, score in det_i:
            best, best_iou = -1, 0.0
            for j, gbox in enumerate(gt_i):
                if matched[j]:
                    continue
                iou = iou_fn(box, gbox)
                if iou > best_iou:
                    best, best_iou = j, iou
            if best >= 0 and best_iou > thr:
                matched[best] = True
                records.append((score, True))
            else:
                records.append((score, False))
    if npig == 0:
        return None
    records.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in records])
    fp = np.cumsum([not r[1] for r in records])
    rec = tp / npig
    prec = tp / np.maximum(tp + fp, 1e-12)
    prec = np.maximum.accumulate(prec[::-1])[::-1]
    out = np.zeros(101)
    rts = np.linspace(0, 1, 101)
    idx = np.searchsorted(rec, rts, side="left")
    ok = idx < len(rec)
    out[ok] = prec[idx[ok]]
    return float(out.mean())


def test_map_engine_fuzz_vs_naive():
    """Randomized multi-image single-class problems: engine == naive AP."""
    rng = np.random.default_rng(12)

    def iou_aligned(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        ar_a = (a[2] - a[0]) * (a[3] - a[1])
        ar_b = (b[2] - b[0]) * (b[3] - b[1])
        return inter / (ar_a + ar_b - inter) if inter else 0.0

    for trial in range(5):
        n_img = 4
        dets, gts = [], []
        preds_dicts, target_dicts = [], []
        for _ in range(n_img):
            n_gt = rng.integers(0, 4)
            n_det = rng.integers(0, 6)
            gt_boxes = []
            for _ in range(n_gt):
                x, y = rng.uniform(0, 20, 2)
                w, h = rng.uniform(1, 5, 2)
                gt_boxes.append((x, y, x + w, y + h))
            det = []
            for _ in range(n_det):
                if gt_boxes and rng.random() < 0.6:
                    gx1, gy1, gx2, gy2 = gt_boxes[rng.integers(len(gt_boxes))]
                    jitter = rng.uniform(-1, 1, 4)
                    box = (gx1 + jitter[0], gy1 + jitter[1],
                           gx2 + jitter[2], gy2 + jitter[3])
                else:
                    x, y = rng.uniform(0, 20, 2)
                    w, h = rng.uniform(1, 5, 2)
                    box = (x, y, x + w, y + h)
                box = (min(box[0], box[2]), min(box[1], box[3]),
                       max(box[0], box[2]) + 1e-3, max(box[1], box[3]) + 1e-3)
                det.append((box, float(rng.random())))
            dets.append(det)
            gts.append(gt_boxes)
            preds_dicts.append({
                "boxes": np.array([b for b, _ in det]).reshape(-1, 4),
                "scores": np.array([s for _, s in det]),
                "labels": np.zeros(len(det), np.int64)})
            target_dicts.append({
                "boxes": np.array(gt_boxes).reshape(-1, 4),
                "labels": np.zeros(len(gt_boxes), np.int64)})

        thr = 0.3
        naive = _naive_coco_ap(dets, gts, iou_aligned, thr)
        engine = MeanAveragePrecision([thr])
        engine.update(preds_dicts, target_dicts)
        res = engine.compute()
        if naive is None:
            assert res["map"] == -1.0
        else:
            assert res["map"] == pytest.approx(naive, abs=1e-9), f"trial {trial}"


def _naive_coco_ap_ranged(dets, gts, iou_fn, thr, max_det, area_range,
                          avg_recall=False):
    """First-principles single-class AP/AR with max-detection truncation and
    area-range ignore semantics matching the reference fork
    (`torchmetrics_mean_ap.py:561-575,661-718`): GT outside the range are
    never matched and excluded from npig; unmatched detections outside the
    range count neither as TP nor FP."""
    def area(b):
        return (b[2] - b[0]) * (b[3] - b[1])

    lo, hi = area_range
    records = []  # (score, is_tp, ignored)
    npig = sum(sum(lo <= area(g) <= hi for g in g_i) for g_i in gts)
    for det_i, gt_i in zip(dets, gts):
        det_i = sorted(det_i, key=lambda d: -d[1])[:max_det]
        gt_ok = [lo <= area(g) <= hi for g in gt_i]
        matched = [False] * len(gt_i)
        for box, score in det_i:
            best, best_iou = -1, 0.0
            for j, gbox in enumerate(gt_i):
                if matched[j] or not gt_ok[j]:
                    continue
                iou = iou_fn(box, gbox)
                if iou > best_iou:
                    best, best_iou = j, iou
            if best >= 0 and best_iou > thr:
                matched[best] = True
                records.append((score, True, False))
            else:
                records.append((score, False,
                                not (lo <= area(box) <= hi)))
    if npig == 0:
        return None
    records.sort(key=lambda r: -r[0])
    kept = [r for r in records if not r[2]]
    tp = np.cumsum([r[1] for r in kept])
    fp = np.cumsum([not r[1] for r in kept])
    if len(kept) == 0:
        return 0.0
    rec = tp / npig
    if avg_recall:
        return float(rec[-1])
    prec = tp / np.maximum(tp + fp, 1e-12)
    prec = np.maximum.accumulate(prec[::-1])[::-1]
    out = np.zeros(101)
    rts = np.linspace(0, 1, 101)
    idx = np.searchsorted(rec, rts, side="left")
    ok = idx < len(rec)
    out[ok] = prec[idx[ok]]
    return float(out.mean())


def test_map_engine_fuzz_max_dets_and_area_ranges():
    """Engine vs first-principles oracle across max-detection thresholds and
    area ranges (the parity surface of `torchmetrics_mean_ap.py:403-520`)."""
    rng = np.random.default_rng(77)

    def iou_aligned(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        ar_a = (a[2] - a[0]) * (a[3] - a[1])
        ar_b = (b[2] - b[0]) * (b[3] - b[1])
        return inter / (ar_a + ar_b - inter) if inter else 0.0

    ranges = {"all": (0.0, 1e10), "tiny": (0.0, 6.0), "big": (6.0, 1e10)}
    max_dets = [1, 2, 100]
    for trial in range(4):
        dets, gts, preds_dicts, target_dicts = [], [], [], []
        for _ in range(4):
            n_gt, n_det = rng.integers(0, 4), rng.integers(0, 6)
            gt_boxes = []
            for _ in range(n_gt):
                x, y = rng.uniform(0, 20, 2)
                w, h = rng.uniform(0.8, 4, 2)
                gt_boxes.append((x, y, x + w, y + h))
            det = []
            for _ in range(n_det):
                if gt_boxes and rng.random() < 0.6:
                    g = gt_boxes[rng.integers(len(gt_boxes))]
                    j = rng.uniform(-0.8, 0.8, 4)
                    box = (g[0] + j[0], g[1] + j[1], g[2] + j[2], g[3] + j[3])
                else:
                    x, y = rng.uniform(0, 20, 2)
                    w, h = rng.uniform(0.8, 4, 2)
                    box = (x, y, x + w, y + h)
                box = (min(box[0], box[2]), min(box[1], box[3]),
                       max(box[0], box[2]) + 1e-3, max(box[1], box[3]) + 1e-3)
                det.append((box, float(rng.random())))
            dets.append(det)
            gts.append(gt_boxes)
            preds_dicts.append({
                "boxes": np.array([b for b, _ in det]).reshape(-1, 4),
                "scores": np.array([s for _, s in det]),
                "labels": np.zeros(len(det), np.int64)})
            target_dicts.append({
                "boxes": np.array(gt_boxes).reshape(-1, 4),
                "labels": np.zeros(len(gt_boxes), np.int64)})

        thr = 0.3
        engine = MeanAveragePrecision([thr], max_detection_thresholds=max_dets,
                                      area_ranges=ranges)
        engine.update(preds_dicts, target_dicts)
        res = engine.compute()

        # map at area "all" uses the LARGEST max-det threshold
        naive_map = _naive_coco_ap_ranged(dets, gts, iou_aligned, thr, 100,
                                          ranges["all"])
        if naive_map is None:
            assert res["map"] == -1.0
        else:
            assert res["map"] == pytest.approx(naive_map, abs=1e-9), \
                f"trial {trial} map"

        # mar_<k> per max-det threshold
        for md in max_dets:
            naive_mar = _naive_coco_ap_ranged(dets, gts, iou_aligned, thr,
                                              md, ranges["all"],
                                              avg_recall=True)
            if naive_mar is None:
                assert res[f"mar_{md}"] == -1.0
            else:
                assert res[f"mar_{md}"] == pytest.approx(naive_mar,
                                                         abs=1e-9), \
                    f"trial {trial} mar_{md}"

        # per-area summaries at the largest max-det threshold
        for name in ("tiny", "big"):
            naive_a = _naive_coco_ap_ranged(dets, gts, iou_aligned, thr, 100,
                                            ranges[name])
            got = res[f"map_{name}"]
            if naive_a is None:
                assert got == -1.0
            else:
                assert got == pytest.approx(naive_a, abs=1e-9), \
                    f"trial {trial} map_{name}"
