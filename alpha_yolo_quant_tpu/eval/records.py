"""Detection/annotation record builders (reference utils/coco.py analog).

Rows follow the reference's metric-input convention
(utils/coco.py:152-245): detections are normalized by the model frame
(640), annotations by their own original image size; labels are the COCO-80
class-name strings.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

# COCO-80 class names in model output order (reference utils/coco.py:17-98)
COCO_NAMES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
]


def detection_rows(image_id, det: np.ndarray, n_det: int,
                   frame: float = 640.0) -> List[list]:
    """det: (max_det, 6) rows [x1,y1,x2,y2,conf,cls] from NMS; returns
    metric rows [image_id, label, conf, x1n, y1n, x2n, y2n] normalized by
    the model frame (reference utils/coco.py:152-175)."""
    rows = []
    for i in range(int(n_det)):
        x1, y1, x2, y2, conf, cls = det[i]
        rows.append([str(image_id), COCO_NAMES[int(cls)], float(conf),
                     float(x1) / frame, float(y1) / frame,
                     float(x2) / frame, float(y2) / frame])
    return rows


def annotation_rows(image_id, boxes_xywh: Sequence[Sequence[float]],
                    classes: Sequence[int], orig_hw) -> List[list]:
    """COCO-format xywh GT boxes in original pixel coords -> normalized
    xyxy rows [image_id, label, x1n, y1n, x2n, y2n]
    (reference utils/coco.py:178-197)."""
    h, w = orig_hw
    rows = []
    for (x, y, bw, bh), c in zip(boxes_xywh, classes):
        rows.append([str(image_id), COCO_NAMES[int(c)],
                     float(x) / w, float(y) / h,
                     float(x + bw) / w, float(y + bh) / h])
    return rows


def to_metric_arrays(ann_rows: List[list], det_rows: List[list]):
    """Pack rows for eval.metrics (ann: id,label,x1,y1,x2,y2;
    det: id,label,conf,x1,y1,x2,y2)."""
    ann = np.array([[r[0], r[1], r[2], r[3], r[4], r[5]] for r in ann_rows],
                   object)
    det = np.array([[r[0], r[1], r[2], r[3], r[4], r[5], r[6]]
                    for r in det_rows], object)
    return ann, det
