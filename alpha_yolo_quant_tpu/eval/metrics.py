"""mean-average-precision compatible with the reference's metric stack.

The reference feeds normalized [ImageID, LabelName, XMin, XMax, YMin, YMax]
annotation rows and [ImageID, LabelName, Conf, XMin, XMax, YMin, YMax]
detection rows into the external `map_boxes.mean_average_precision_for_boxes`
(reference stage_3.py:51-59), sweeping IoU 0.50..0.95 and averaging for
mAP50-95. This module reimplements that metric: per-class Pascal-VOC AP with
all-point interpolation, averaged over classes present in the annotations.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _ap_from_pr(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-point interpolated AP (the map_boxes/VOC-2010 style)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a: (N,4), b: (M,4) xyxy -> (N,M) IoU."""
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], \
        b[None, :, 3]
    ix1 = np.maximum(ax1, bx1)
    iy1 = np.maximum(ay1, by1)
    ix2 = np.minimum(ax2, bx2)
    iy2 = np.minimum(ay2, by2)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def average_precision(ann: np.ndarray, det: np.ndarray,
                      iou_threshold: float) -> Tuple[float, Dict[str, float]]:
    """ann rows: [image_id, label, x1, y1, x2, y2];
    det rows: [image_id, label, conf, x1, y1, x2, y2] (all object dtype ok).

    Returns (mAP, per-class AP) at one IoU threshold. Classes with no
    annotations are skipped (map_boxes semantics).
    """
    ann = np.asarray(ann, object)
    det = np.asarray(det, object)
    labels = sorted({str(r[1]) for r in ann})
    aps: Dict[str, float] = {}
    for label in labels:
        gt_rows = [r for r in ann if str(r[1]) == label]
        dt_rows = [r for r in det if str(r[1]) == label]
        n_gt = len(gt_rows)
        if n_gt == 0:
            continue
        if not dt_rows:
            aps[label] = 0.0
            continue
        gt_by_img: Dict[str, List] = {}
        for r in gt_rows:
            gt_by_img.setdefault(str(r[0]), []).append(
                [float(r[2]), float(r[3]), float(r[4]), float(r[5])])
        used = {img: np.zeros(len(v), bool) for img, v in gt_by_img.items()}
        boxes_by_img = {img: np.array(v, np.float64)
                        for img, v in gt_by_img.items()}

        dt_rows.sort(key=lambda r: -float(r[2]))
        tp = np.zeros(len(dt_rows))
        fp = np.zeros(len(dt_rows))
        for i, r in enumerate(dt_rows):
            img = str(r[0])
            box = np.array([[float(r[3]), float(r[4]), float(r[5]),
                             float(r[6])]])
            if img not in boxes_by_img:
                fp[i] = 1
                continue
            ious = _iou_matrix(box, boxes_by_img[img])[0]
            j = int(np.argmax(ious))
            if ious[j] >= iou_threshold and not used[img][j]:
                tp[i] = 1
                used[img][j] = True
            else:
                fp[i] = 1
        ctp, cfp = np.cumsum(tp), np.cumsum(fp)
        recall = ctp / n_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-12)
        aps[label] = _ap_from_pr(recall, precision)
    mean = float(np.mean(list(aps.values()))) if aps else 0.0
    return mean, aps


def map50_95(ann: np.ndarray, det: np.ndarray) -> Tuple[float, Dict]:
    """The reference's headline metric: mean AP over IoU 0.50..0.95 step
    0.05 (reference stage_3.py:54-59)."""
    per_iou = {}
    for t in np.arange(0.5, 1.0, 0.05):
        m, _ = average_precision(ann, det, float(t))
        per_iou[round(float(t), 2)] = m
    return float(np.mean(list(per_iou.values()))), per_iou
