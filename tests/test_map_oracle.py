"""Differential validation of eval.metrics against the map_boxes oracle
transcription (VERDICT r4 #2): bit-EQUAL per-class APs and means on
randomized fuzz cases covering empty classes, duplicate detections,
IoU-tie claims, crowd-sized confidence ties, 1e-8 conf floods,
degenerate/inverted boxes, ann-less images, and lexicographic image-id
ordering. Plus handcrafted pins for each load-bearing semantic corner.

If the real map_boxes wheel is ever importable, test_against_real_map_boxes
compares both implementations to the package itself (auto-skipped today:
zero egress, not installable in this image).
"""

import numpy as np
import pytest

import conftest  # noqa: F401

from alpha_yolo_quant_tpu.eval.map_oracle import (
    map50_95_oracle, mean_average_precision_for_boxes_oracle,
)
from alpha_yolo_quant_tpu.eval.metrics import average_precision, map50_95

THRESHOLDS = (0.3, 0.5, 0.85)


def _boxes(rng, hard):
    if hard:
        # coarse integer grid: exact coordinate collisions, IoU ties,
        # zero-area degenerates
        x, y = rng.integers(0, 8, 2) * 10.0
        w, h = rng.integers(0, 5, 2) * 10.0
    else:
        x, y = rng.uniform(0, 500, 2)
        w, h = rng.uniform(-20.0, 120.0, 2)   # inverted boxes allowed
    return [float(x), float(y), float(x + w), float(y + h)]


def _fuzz_case(rng, hard):
    # duplicate ids incl. the '2' vs '10' lexicographic trap
    imgs = [str(int(i)) for i in rng.integers(0, 30,
                                              size=int(rng.integers(1, 8)))]
    classes = [f"c{i}" for i in range(int(rng.integers(1, 5)))]
    ann_rows, det_rows = [], []
    for _ in range(int(rng.integers(1, 25))):
        ann_rows.append([str(rng.choice(imgs)), str(rng.choice(classes)),
                         *_boxes(rng, hard)])
    if hard:
        ann_rows.append(list(ann_rows[0]))     # duplicate gt: IoU tie
    det_imgs = imgs + ["777"]                  # an ann-less image
    det_classes = classes + ["ghost"]          # a det-only class
    for _ in range(int(rng.integers(0, 40))):
        conf = float(rng.uniform(0, 1))
        if hard:
            conf = round(conf, 1)              # force confidence ties
            if rng.random() < 0.25:
                conf = 1e-8                    # conf flood
        row = [str(rng.choice(det_imgs)), str(rng.choice(det_classes)),
               conf, *_boxes(rng, hard)]
        det_rows.append(row)
        if hard and rng.random() < 0.2:
            det_rows.append(list(row))         # duplicate detection
    return (np.array(ann_rows, object),
            np.array(det_rows, object) if det_rows
            else np.zeros((0, 7), object))


@pytest.mark.parametrize("hard,seed0", [(False, 0), (True, 10_000)])
def test_fuzz_bit_equal_to_oracle(hard, seed0):
    """500 smooth + 500 adversarial cases x 3 thresholds: the vectorized
    metric equals the loop oracle EXACTLY (==, not approx)."""
    for case in range(500):
        rng = np.random.default_rng(seed0 + case)
        ann, det = _fuzz_case(rng, hard)
        for thr in THRESHOLDS:
            want_m, want_aps = mean_average_precision_for_boxes_oracle(
                ann, det, thr)
            got_m, got_aps = average_precision(ann, det, thr)
            assert got_aps == want_aps, (case, thr)
            assert got_m == want_m, (case, thr)


def test_fuzz_sweep_bit_equal_to_oracle():
    """Full mAP50-95 sweeps (shared matching state vs 10 independent
    oracle calls) agree exactly."""
    for case in range(30):
        rng = np.random.default_rng(20_000 + case)
        ann, det = _fuzz_case(rng, hard=case % 2 == 1)
        want_m, want_per = map50_95_oracle(ann, det)
        got_m, got_per = map50_95(ann, det)
        assert got_per == want_per, case
        assert got_m == want_m, case


def test_input_order_matching_not_confidence_order():
    """map_boxes matches per image in input ROW order: an earlier
    low-conf detection claims the gt, the later high-conf duplicate
    becomes the top-ranked FP -> AP 0.5 (a conf-sorted matcher would
    give 1.0)."""
    ann = np.array([["0", "dog", 0.0, 0.0, 10.0, 10.0]], object)
    det = np.array([["0", "dog", 0.3, 0.0, 0.0, 10.0, 10.0],
                    ["0", "dog", 0.9, 0.0, 0.0, 10.0, 10.0]], object)
    for fn in (average_precision,
               mean_average_precision_for_boxes_oracle):
        m, _ = fn(ann, det, 0.5)
        assert m == 0.5, fn.__name__


def test_detections_on_annotationless_images_are_skipped():
    """The package's image loop covers annotation images only: a
    high-conf detection on an image with no annotation rows is NOT a
    false positive."""
    ann = np.array([["0", "dog", 0.0, 0.0, 10.0, 10.0]], object)
    det = np.array([["z", "dog", 0.99, 50.0, 50.0, 60.0, 60.0],
                    ["0", "dog", 0.50, 0.0, 0.0, 10.0, 10.0]], object)
    for fn in (average_precision,
               mean_average_precision_for_boxes_oracle):
        m, _ = fn(ann, det, 0.5)
        assert m == 1.0, fn.__name__


def test_sweep_thresholds_are_rounded():
    """stage_3 calls the metric at round(t, 2): an overlap of exactly
    0.85 passes the 0.85 gate (the raw arange value 0.8500000000000003
    would reject it)."""
    ann = np.array([["0", "dog", 0.0, 0.0, 100.0, 100.0]], object)
    det = np.array([["0", "dog", 0.9, 0.0, 0.0, 100.0, 85.0]], object)
    _, per = map50_95(ann, det)
    assert per[0.85] == 1.0 and per[0.9] == 0.0


def test_against_real_map_boxes():
    """Opt-in: when the real wheel exists, both implementations must
    match it (column layout converted to its XMin,XMax,YMin,YMax
    convention)."""
    map_boxes = pytest.importorskip("map_boxes")
    for case in range(50):
        rng = np.random.default_rng(30_000 + case)
        ann, det = _fuzz_case(rng, hard=case % 2 == 1)
        ann_mb = np.array([[r[0], r[1], r[2], r[4], r[3], r[5]]
                           for r in ann], object)
        det_mb = np.array([[r[0], r[1], r[2], r[3], r[5], r[4], r[6]]
                           for r in det], object)
        for thr in THRESHOLDS:
            want, _ = map_boxes.mean_average_precision_for_boxes(
                ann_mb, det_mb, thr, verbose=False)
            got, _ = average_precision(ann, det, thr)
            orc, _ = mean_average_precision_for_boxes_oracle(ann, det, thr)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
            np.testing.assert_allclose(orc, want, rtol=0, atol=1e-12)
