"""mean-average-precision compatible with the reference's metric stack.

The reference feeds normalized [ImageID, LabelName, XMin, XMax, YMin, YMax]
annotation rows and [ImageID, LabelName, Conf, XMin, XMax, YMin, YMax]
detection rows into the external `map_boxes.mean_average_precision_for_boxes`
(reference stage_3.py:51-59), sweeping IoU 0.50..0.95 and averaging for
mAP50-95. This module reimplements that metric: per-class Pascal-VOC AP with
all-point interpolation, averaged over classes present in the annotations.

Implementation note: matching is vectorized per (class, image) group — one
IoU matrix and one argmax per group, shared across ALL IoU thresholds —
instead of a per-detection Python loop (the round-1 version was the eval
wall-clock bottleneck at 5,000 images). Semantics are unchanged: each
detection (in descending-confidence order) claims only its argmax-IoU
ground truth, first eligible claimant wins, later claimants are FPs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _ap_from_pr(recall: np.ndarray, precision: np.ndarray) -> float:
    """All-point interpolated AP (the map_boxes/VOC-2010 style)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
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


class _ClassEval:
    """Threshold-independent matching state for one class.

    For every detection (sorted by descending confidence, stable):
      vmax[i] = IoU against its argmax ground truth in its image
      jkey[i] = globally-unique index of that ground truth (-1: no gts)
      n_gt    = number of ground-truth boxes of this class
    """

    __slots__ = ("vmax", "jkey", "n_gt", "n_det")

    def __init__(self, gt_by_img: Dict[str, np.ndarray],
                 det_imgs: List[str], det_boxes: np.ndarray):
        n = len(det_imgs)
        self.n_det = n
        self.n_gt = sum(len(v) for v in gt_by_img.values())
        self.vmax = np.zeros(n, np.float64)
        self.jkey = np.full(n, -1, np.int64)
        base: Dict[str, int] = {}
        tot = 0
        for img, boxes in gt_by_img.items():
            base[img] = tot
            tot += len(boxes)
        by_img: Dict[str, List[int]] = {}
        for i, img in enumerate(det_imgs):
            by_img.setdefault(img, []).append(i)
        for img, idxs in by_img.items():
            gts = gt_by_img.get(img)
            if gts is None or len(gts) == 0:
                continue
            ious = _iou_matrix(det_boxes[idxs], gts)
            j = np.argmax(ious, axis=1)
            self.vmax[idxs] = ious[np.arange(len(idxs)), j]
            self.jkey[idxs] = base[img] + j

    def ap_at(self, iou_threshold: float) -> float:
        """Greedy first-claimant matching at one threshold -> AP."""
        if self.n_det == 0:
            return 0.0
        elig = (self.vmax >= iou_threshold) & (self.jkey >= 0)
        tp = np.zeros(self.n_det, np.float64)
        e = np.nonzero(elig)[0]
        if len(e):
            winner = np.full(self.n_gt, self.n_det, np.int64)
            np.minimum.at(winner, self.jkey[e], e)
            tp[e[winner[self.jkey[e]] == e]] = 1.0
        ctp = np.cumsum(tp)
        cfp = np.cumsum(1.0 - tp)
        recall = ctp / self.n_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-12)
        return _ap_from_pr(recall, precision)


def _prepare(ann: np.ndarray, det: np.ndarray) -> Dict[str, _ClassEval]:
    """Group rows by class, sort detections by confidence (stable), build
    the threshold-independent per-class matching state."""
    ann = np.asarray(ann, object)
    det = np.asarray(det, object)
    labels = sorted({str(r[1]) for r in ann})
    gt_by_label: Dict[str, Dict[str, List]] = {lb: {} for lb in labels}
    for r in ann:
        lb = str(r[1])
        gt_by_label[lb].setdefault(str(r[0]), []).append(
            [float(r[2]), float(r[3]), float(r[4]), float(r[5])])
    det_by_label: Dict[str, List] = {lb: [] for lb in labels}
    for r in det:
        lb = str(r[1])
        if lb in det_by_label:
            det_by_label[lb].append((str(r[0]), float(r[2]),
                                     [float(r[3]), float(r[4]),
                                      float(r[5]), float(r[6])]))
    out: Dict[str, _ClassEval] = {}
    for lb in labels:
        rows = det_by_label[lb]
        rows.sort(key=lambda t: -t[1])          # stable, like the reference
        imgs = [t[0] for t in rows]
        boxes = (np.array([t[2] for t in rows], np.float64)
                 if rows else np.zeros((0, 4)))
        gt = {img: np.array(v, np.float64)
              for img, v in gt_by_label[lb].items()}
        out[lb] = _ClassEval(gt, imgs, boxes)
    return out


def average_precision(ann: np.ndarray, det: np.ndarray,
                      iou_threshold: float) -> Tuple[float, Dict[str, float]]:
    """ann rows: [image_id, label, x1, y1, x2, y2];
    det rows: [image_id, label, conf, x1, y1, x2, y2] (all object dtype ok).

    Returns (mAP, per-class AP) at one IoU threshold. Classes with no
    annotations are skipped (map_boxes semantics).
    """
    classes = _prepare(ann, det)
    aps = {lb: ce.ap_at(iou_threshold) for lb, ce in classes.items()
           if ce.n_gt > 0}
    mean = float(np.mean(list(aps.values()))) if aps else 0.0
    return mean, aps


def map50_95(ann: np.ndarray, det: np.ndarray) -> Tuple[float, Dict]:
    """The reference's headline metric: mean AP over IoU 0.50..0.95 step
    0.05 (reference stage_3.py:54-59). The per-class matching state is
    built once and shared across the ten thresholds."""
    classes = _prepare(ann, det)
    per_iou = {}
    for t in np.arange(0.5, 1.0, 0.05):
        aps = [ce.ap_at(float(t)) for ce in classes.values() if ce.n_gt > 0]
        per_iou[round(float(t), 2)] = float(np.mean(aps)) if aps else 0.0
    return float(np.mean(list(per_iou.values()))), per_iou
