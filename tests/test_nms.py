"""NMS parity with the reference greedy implementations + batched behavior."""

import numpy as np
import pytest

import conftest
from reference_oracle import load as load_ref

import jax.numpy as jnp

from alpha_yolo_quant_tpu.postprocess.nms import (
    NmsParams, _greedy_nms_mask, non_max_suppression, q_nms_params,
    scale_boxes, xywh2xyxy,
)

RNG = np.random.default_rng(11)
ref_exists = pytest.mark.skipif(not conftest.reference_available(),
                                reason="no reference mount")


def _random_boxes(n, span=600.0):
    xy = RNG.uniform(0, span, (n, 2))
    wh = RNG.uniform(5, 120, (n, 2))
    return np.concatenate((xy, xy + wh), 1)


@ref_exists
def test_greedy_mask_matches_reference_nms():
    ref = load_ref("utils.bbox_cls_functions")
    for trial in range(5):
        n = 200
        boxes = _random_boxes(n)
        scores = RNG.uniform(0, 1, n)
        want = ref.nms(boxes, scores, 0.45)
        keep = np.asarray(_greedy_nms_mask(
            jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            jnp.ones(n, bool), 0.45, 300, 1.0, False))
        got = np.nonzero(keep)[0]
        assert set(got) == set(want)


@ref_exists
def test_greedy_mask_matches_reference_nms_quant():
    ref = load_ref("utils.bbox_cls_functions")
    for trial in range(5):
        n = 150
        boxes = np.round(_random_boxes(n, span=200000.0))
        scores = RNG.integers(0, 32768, n).astype(np.float64)
        want = ref.nms_quant(boxes, scores, 0.45)
        keep = np.asarray(_greedy_nms_mask(
            jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            jnp.ones(n, bool), 0.45, 300, 412.0, True))
        got = np.nonzero(keep)[0]
        assert set(got) == set(want)


@ref_exists
def test_greedy_mask_matches_reference_nms_quant_dense():
    """Dense overlapping clusters in the quantized (anchor-scale) domain —
    exercises the scaled-inter union (`inter *= 2.22` BEFORE the union,
    utils/bbox_cls_functions.py:108-110). Round 1 subtracted the unscaled
    intersection, which flips every pair with inter/(a_i+a_j) in
    (1/4.44, 1/3.22] — guaranteed hit by this distribution."""
    ref = load_ref("utils.bbox_cls_functions")
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 300
        centers = rng.uniform(50000, 150000, (5, 2))
        xy = centers[rng.integers(0, 5, n)] + rng.normal(0, 8000, (n, 2))
        wh = rng.uniform(20000, 45000, (n, 2))
        boxes = np.round(np.concatenate((xy, xy + wh), 1))
        scores = rng.integers(8192, 32768, n).astype(np.float64)
        want = ref.nms_quant(boxes, scores, 0.45)
        keep = np.asarray(_greedy_nms_mask(
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(scores, jnp.float32),
            jnp.ones(n, bool), 0.45, 300, 412.0, True))
        assert set(np.nonzero(keep)[0].tolist()) == set(int(i) for i in want)


def test_quantized_iou_multiplier_derivation():
    from alpha_yolo_quant_tpu.postprocess.nms import quantized_iou_multiplier

    assert quantized_iou_multiplier(0.45) == 2.22   # the reference constant
    assert quantized_iou_multiplier(0.5) == 2.0
    assert quantized_iou_multiplier(0.25) == 4.0


def test_q_nms_non_default_iou_threshold():
    """iou_thres != 0.45 must change the quantized keep-set via the derived
    multiplier (round 1 silently ignored the parameter). Oracle: a numpy
    mirror of the reference greedy loop with the derived multiplier."""
    rng = np.random.default_rng(21)
    n = 200
    centers = rng.uniform(50000, 150000, (4, 2))
    xy = centers[rng.integers(0, 4, n)] + rng.normal(0, 9000, (n, 2))
    wh = rng.uniform(20000, 45000, (n, 2))
    boxes = np.round(np.concatenate((xy, xy + wh), 1))
    scores = rng.integers(8192, 32768, n).astype(np.float64)

    def ref_quant_greedy(dets, sc, mult):
        x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
        areas = (x2 - x1 + 412) * (y2 - y1 + 412)
        order = np.argsort(-sc, kind="stable")
        keep = []
        while order.size > 0:
            i = order[0]
            keep.append(int(i))
            xx1 = np.maximum(x1[i], x1[order[1:]])
            yy1 = np.maximum(y1[i], y1[order[1:]])
            xx2 = np.minimum(x2[i], x2[order[1:]])
            yy2 = np.minimum(y2[i], y2[order[1:]])
            inter = (np.maximum(0.0, xx2 - xx1 + 412)
                     * np.maximum(0.0, yy2 - yy1 + 412)) * mult
            order = order[np.nonzero(
                inter <= areas[i] + areas[order[1:]] - inter)[0] + 1]
        return keep

    keepsets = {}
    for thr, mult in ((0.3, 3.33), (0.6, 1.67)):
        want = ref_quant_greedy(boxes, scores, mult)
        keep = np.asarray(_greedy_nms_mask(
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(scores, jnp.float32),
            jnp.ones(n, bool), thr, 300, 412.0, True))
        got = set(np.nonzero(keep)[0].tolist())
        assert got == set(want)
        keepsets[thr] = got
    assert keepsets[0.3] != keepsets[0.6]


@ref_exists
def test_full_coord_parity():
    """End-to-end conf-filter + class-offset NMS vs reference coord."""
    ref = load_ref("utils.bbox_cls_functions")
    n = 400
    pred = np.zeros((1, 84, n))
    xy = RNG.uniform(100, 500, (2, n))
    wh = RNG.uniform(10, 80, (2, n))
    pred[0, 0:2] = xy
    pred[0, 2:4] = wh
    cls = RNG.uniform(0, 1, (80, n)) * RNG.uniform(0, 0.6, (1, n))
    pred[0, 4:] = cls
    want = ref.coord(pred.copy())[0]  # rows [x1,y1,x2,y2,conf,cls]

    det, n_det = non_max_suppression(jnp.asarray(pred, jnp.float32),
                                     NmsParams())
    got = np.asarray(det[0])[: int(n_det[0])]
    assert got.shape[0] == want.shape[0]
    # same boxes in the same (score) order
    np.testing.assert_allclose(got[:, 4], want[:, 4], rtol=1e-5)
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(got[:, 5].astype(int),
                                  want[:, 5].astype(int))


def test_batched_nms_works():
    """The reference only supports batch 1 (return inside the loop,
    utils/bbox_cls_functions.py:192); ours is batched."""
    n = 100
    pred = RNG.uniform(0, 1, (3, 84, n)).astype(np.float32)
    pred[:, 0:2] = RNG.uniform(100, 500, (3, 2, n))
    pred[:, 2:4] = RNG.uniform(10, 80, (3, 2, n))
    det, n_det = non_max_suppression(jnp.asarray(pred), NmsParams())
    assert det.shape == (3, 300, 6)
    assert all(int(c) >= 0 for c in n_det)
    # each batch element independently equals its own single-image run
    for i in range(3):
        d1, c1 = non_max_suppression(jnp.asarray(pred[i:i + 1]), NmsParams())
        np.testing.assert_allclose(np.asarray(det[i]), np.asarray(d1[0]),
                                   rtol=1e-6)


def test_q_nms_params_derivation():
    p = q_nms_params(anchor_scale=32767.0 / 79.5)
    assert p.plus_one == 412.0
    assert p.conf_thres == 8192.0
    assert abs(p.box_scale - 412.1635) < 1e-3


def test_scale_boxes_roundtrip():
    boxes = jnp.asarray([[100.0, 120.0, 300.0, 360.0]])
    out = np.asarray(scale_boxes((640, 640), boxes, (480, 640)))
    # gain = min(640/480, 640/640) = 1.0 -> pad_y = round(80-0.1) = 80
    np.testing.assert_allclose(out, [[100.0, 40.0, 300.0, 280.0]])


@ref_exists
def test_greedy_mask_cap_overflow_parity():
    """More greedy survivors than max_det: the kept-box buffer drops
    appends beyond its cap, which must not change the TRUNCATED output —
    the first max_det kept boxes (see _greedy_nms_mask docstring)."""
    ref = load_ref("utils.bbox_cls_functions")
    rng = np.random.default_rng(5)
    n, max_det = 1200, 300
    xy = rng.uniform(0, 60000, (n, 2))       # sparse: most boxes survive
    wh = rng.uniform(30, 200, (n, 2))
    boxes = np.concatenate((xy, xy + wh), 1)
    scores = rng.uniform(0, 1, n)
    want = ref.nms(boxes, scores, 0.45)
    assert len(want) > max_det, "test needs survivors beyond max_det"
    keep = np.asarray(_greedy_nms_mask(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
        jnp.ones(n, bool), 0.45, max_det, 1.0, False))
    assert keep.sum() == max_det
    assert set(np.nonzero(keep)[0].tolist()) \
        == set(int(i) for i in want[:max_det])


@ref_exists
def test_greedy_mask_dense_clusters_parity():
    """Dense overlapping candidates produce deep suppression chains — the
    regime the blocked implementation restructures; keep-set must still
    match the reference exactly."""
    ref = load_ref("utils.bbox_cls_functions")
    rng = np.random.default_rng(99)
    n = 600
    # a few tight clusters of heavily-overlapping boxes
    centers = rng.uniform(100, 500, (6, 2))
    xy = centers[rng.integers(0, 6, n)] + rng.normal(0, 4, (n, 2))
    wh = rng.uniform(40, 60, (n, 2))
    boxes = np.concatenate((xy, xy + wh), 1)
    scores = rng.uniform(0, 1, n)
    want = ref.nms(boxes, scores, 0.45)
    keep = np.asarray(_greedy_nms_mask(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
        jnp.ones(n, bool), 0.45, 600, 1.0, False))
    assert set(np.nonzero(keep)[0].tolist()) == set(int(i) for i in want)


def test_int_key_candidate_sort_matches_argsort():
    """The q_NMS packed-int-key candidate sort must reproduce the stable
    argsort selection EXACTLY: descending score, lowest-index-first ties,
    valid-before-invalid — across negative pre-sigmoid scores, heavy
    ties, and sub-threshold candidates."""
    from alpha_yolo_quant_tpu.postprocess.nms import _select_candidates

    rng = np.random.default_rng(3)
    n = 8400
    for name, lo, hi, thres in (("post-sigmoid", 0, 32767, 8192.0),
                                ("pre-sigmoid", -32767, 32767, -31.5),
                                ("ties", 0, 50, 10.0)):
        conf = rng.integers(lo, hi + 1, n).astype(np.float32)
        bxywh = rng.uniform(0, 640 * 412, (4, n)).astype(np.float32)
        cls = rng.integers(0, 80, n).astype(np.float32)
        pred = (jnp.asarray(bxywh), jnp.asarray(conf), jnp.asarray(cls))
        from alpha_yolo_quant_tpu.postprocess import nms as nms_mod

        ref = _select_candidates(pred, 30000, jnp.float32(thres), 1000,
                                 int_scores=False)
        got = _select_candidates(pred, 30000, jnp.float32(thres), 1000,
                                 int_scores=True)
        # per-call flavor selection (no module-global mutation)
        got_g = _select_candidates(pred, 30000, jnp.float32(thres),
                                   1000, int_scores=True,
                                   select_gather=True)
        got_m = _select_candidates(pred, 30000, jnp.float32(thres),
                                   1000, int_scores=True,
                                   select_topk_merge=True)
        assert nms_mod.SELECT_GATHER is False  # globals untouched
        assert nms_mod.SELECT_TOPK_MERGE is False
        n_valid = int(np.asarray(ref[3]).sum())
        for variant, sel in (("co-sort", got), ("key+gather", got_g),
                             ("topk-merge", got_m)):
            for a, b, what in zip(ref, sel,
                                  ("boxes", "conf", "cls", "valid")):
                # identical on every VALID row; invalid tail rows may be
                # ordered differently (the argsort path orders
                # -inf-masked rows arbitrarily) and are masked downstream
                np.testing.assert_array_equal(
                    np.asarray(a)[:n_valid], np.asarray(b)[:n_valid],
                    err_msg=f"{name} {variant}: {what}")
            np.testing.assert_array_equal(
                np.asarray(ref[3]), np.asarray(sel[3]),
                err_msg=f"{name} {variant}")


def test_q_nms_detections_unchanged_by_int_key_sort():
    """End-to-end q_NMS detections identical with the int-key selection
    (quantized=True engages it) vs the argsort selection forced."""
    import dataclasses as dc

    from alpha_yolo_quant_tpu.postprocess import nms as nms_mod

    rng = np.random.default_rng(11)
    B, n = 4, 8400
    conf = rng.integers(0, 32767, (B, n)).astype(np.float32)
    bxywh = rng.uniform(50 * 412, 500 * 412, (B, 4, n)).astype(np.float32)
    cls = rng.integers(0, 80, (B, n)).astype(np.float32)
    pred = (jnp.asarray(bxywh), jnp.asarray(conf), jnp.asarray(cls))
    p = q_nms_params(412.1635)
    det_a, n_a = non_max_suppression(pred, p)

    orig = nms_mod._select_candidates
    try:
        nms_mod._select_candidates = (
            lambda pr, mx, ct, pk=None, int_scores=False, **kw:
            orig(pr, mx, ct, pk, int_scores=False, **kw))
        det_b, n_b = non_max_suppression(pred, p)
    finally:
        nms_mod._select_candidates = orig
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
    np.testing.assert_array_equal(np.asarray(det_a), np.asarray(det_b))
