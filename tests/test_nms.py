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
