"""Batched, jittable NMS — float and integer (q_NMS) variants.

Functional equivalent of the reference's `coord`/`nms` and
`coord_quant`/`nms_quant` (quantisation/utils/bbox_cls_functions.py:49-250),
with two deliberate upgrades:
  * batched: the reference `return`s inside its batch loop and therefore only
    ever works for batch 1 (utils/bbox_cls_functions.py:192); here the whole
    pipeline is vmapped with fixed-size padding, so batch-64 TPU serving works.
  * O(max_det x N) vectorized greedy selection instead of a python while
    loop — identical keep-set to sequential greedy NMS.

q_NMS constants are DERIVED, not hard-coded: +412 is one pixel in anchor-
scale units (round(32767/79.5)), 2.22 approximates 1/iou_thres, and the
integer confidence threshold is conf_thres * (2^15-1) (reference
utils/bbox_cls_functions.py:82-117,195-250; see SURVEY.md §2.3.8).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NmsParams:
    """Float-domain NMS parameters (reference utils/bbox_cls_functions.py:
    142-160)."""

    conf_thres: float = 0.25
    iou_thres: float = 0.45
    max_det: int = 300
    max_nms: int = 30000
    max_wh: float = 7680.0
    agnostic: bool = False
    # candidate pre-truncation: keep only the top-k scores before NMS.
    # None = all candidates (the reference float path); the reference q_NMS
    # itself truncates to 1000 (stage_8_torch_full_quant.py:260).
    pre_topk: int = None  # type: ignore[assignment]
    # Integer (q_NMS) mode: boxes are in anchor-scale units, scores in
    # 16-bit sigmoid units. `plus_one` is the +1 area term in those units.
    quantized: bool = False
    box_scale: float = 1.0       # divide boxes by this at the end
    score_scale: float = 1.0     # divide scores by this at the end
    plus_one: float = 1.0


def quantized_iou_multiplier(iou_thres: float) -> float:
    """The q_NMS intersection multiplier, DERIVED from the IoU threshold:
    the reference hard-codes 2.22 = round(1/0.45, 2)
    (utils/bbox_cls_functions.py:108). Emitting exactly 2.22 at 0.45 keeps
    keep-set parity; any other threshold derives the same way."""
    return round(1.0 / float(iou_thres), 2)


def q_nms_params(anchor_scale: float, iou_thres: float = 0.45,
                 conf_thres_int: int = 8192,
                 score_scale: float = 32767.0) -> NmsParams:
    """Derive the q_NMS parameter set from the anchor scale (reference
    hard-codes 412 / 412.1635 / 8192 / 2.22 for K=16, anchors max 79.5)."""
    return NmsParams(conf_thres=float(conf_thres_int), iou_thres=iou_thres,
                     quantized=True, box_scale=float(anchor_scale),
                     score_scale=score_scale, pre_topk=1000,
                     plus_one=float(int(round(anchor_scale))))


def xywh2xyxy(x):
    """(..., 4) xywh -> xyxy (reference utils/bbox_cls_functions.py:120-139)."""
    dw = x[..., 2] / 2
    dh = x[..., 3] / 2
    return jnp.stack((x[..., 0] - dw, x[..., 1] - dh,
                      x[..., 0] + dw, x[..., 1] + dh), axis=-1)


def _greedy_nms_mask(boxes, scores, valid, iou_thres, max_det, plus_one,
                     quantized):
    """Greedy NMS over score-sorted padded candidates.

    boxes: (N,4) xyxy (already class-offset), SORTED by descending score;
    scores: (N,); valid: (N,) bool. Returns keep mask (N,) with at most
    max_det True — identical to sequential greedy NMS.

    Implementation: greedy NMS is the unique fixpoint of
        keep_i = valid_i AND no higher-ranked kept box suppresses i,
    computed by Jacobi iteration (one MXU matvec per step). A node settles
    once all its higher-ranked suppressors have settled, so the iteration
    converges within the suppression-DAG depth — a handful of steps on real
    detections — instead of the max_det-step sequential scan.
    """
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + plus_one) * (y2 - y1 + plus_one)

    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + plus_one)
    h = jnp.maximum(0.0, yy2 - yy1 + plus_one)
    inter = w * h
    if quantized:
        # reference nms_quant mutates inter IN PLACE before the union
        # (`inter *= 2.22` — utils/bbox_cls_functions.py:108-110 and the
        # torch twin stage_8_torch_full_quant.py:280-283), so the union
        # term uses the SCALED intersection: suppress when
        #     m*inter > a_i + a_j - m*inter
        # with m = round(1/iou_thres, 2) (2.22 at the reference's 0.45).
        # Mirroring the op order keeps f32 parity with the deployed torch
        # reference; the numpy f64 golden may differ within ~2^-24 of the
        # boundary (the two references disagree there too).
        t = inter * jnp.float32(quantized_iou_multiplier(iou_thres))
        suppress = t > (areas[:, None] + areas[None, :] - t)
    else:
        iou = inter / (areas[:, None] + areas[None, :] - inter)
        suppress = iou > iou_thres

    # rank-permute so blocks partition by descending score (stable argsort
    # breaks ties by lower index — the same convention as the reference's
    # ordering); non_max_suppression already passes sorted candidates, so
    # this is the identity there.
    perm = jnp.argsort(-scores, stable=True)
    suppress = suppress[perm][:, perm]
    valid = valid[perm]
    t_mat = (suppress & (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
             & valid[:, None]).astype(jnp.float32)

    # Blocked greedy: process candidates in score order in blocks. Each
    # block is first pruned by everything already kept (one matvec), then
    # its internal suppression DAG is resolved by Jacobi iteration — now
    # bounded by the block size instead of the GLOBAL chain depth (dense
    # candidate sets can have ~N-deep chains; measured 85ms -> bounded).
    blk = 128
    kept = jnp.zeros((n,), jnp.float32)
    for start in range(0, n, blk):
        end = min(start + blk, n)
        size = end - start
        pre_kill = (kept @ t_mat[:, start:end]) > 0.5
        v_b = valid[start:end] & ~pre_kill
        t_b = t_mat[start:end, start:end]

        def cond(c):
            k, prev, it = c
            return (it < size) & jnp.any(k != prev)

        def body(c):
            k, _, it = c
            killed = (k.astype(jnp.float32) @ t_b) > 0.5
            return v_b & ~killed, k, it + 1

        k_b, _, _ = jax.lax.while_loop(
            cond, body, (v_b, jnp.zeros_like(v_b), jnp.int32(0)))
        kept = kept.at[start:end].set(k_b.astype(jnp.float32))
    keep_sorted = kept > 0.5
    # truncate the survivor list to max_det in score order
    # (reference coord: i = i[:max_det])
    within = jnp.cumsum(keep_sorted.astype(jnp.int32)) <= max_det
    keep_sorted = keep_sorted & within
    # scatter back to the caller's candidate order
    return jnp.zeros((n,), bool).at[perm].set(keep_sorted)


def _select_candidates(pred, max_nms, conf_thres, pre_topk=None):
    """pred: (84, N) -> fixed-size top-k candidate set, score-sorted.
    Returns (boxes_xyxy (M,4), conf (M,), cls (M,), valid (M,))."""
    box = xywh2xyxy(pred[:4].T)                # (N,4)
    cls_scores = pred[4:]                      # (80, N)
    conf = jnp.max(cls_scores, axis=0)
    cls = jnp.argmax(cls_scores, axis=0).astype(jnp.float32)
    valid = conf > conf_thres
    m = min(pre_topk or max_nms, max_nms, conf.shape[0])
    score_for_sort = jnp.where(valid, conf, -jnp.inf)
    # argsort-based top-k: XLA's batched TopK lowering is catastrophically
    # slow on this backend for large k (measured 19s vs 4.5ms at
    # (128, 8400) k=1000); a full descending sort is cheap and gives the
    # stable lowest-index tie order the NMS rank matrix assumes.
    idx = jnp.argsort(-score_for_sort)[:m]
    return box[idx], conf[idx], cls[idx], valid[idx]


def non_max_suppression(preds, params: NmsParams = NmsParams(),
                        score_map=None):
    """Batched NMS.

    preds: (B, 4+nc, N) in xywh + class scores (float; for q_NMS these are
    integer-valued floats in anchor/sigmoid scale units).

    score_map: optional MONOTONE map applied to the kept rows' confidences
    before descaling (the serving path defers the 16-bit sigmoid LUT here —
    ranking and thresholding commute with a monotone map, so the result is
    unchanged up to the ordering of exact score ties, which the reference's
    unstable argsort does not define either).

    Returns (det, n_det): det is (B, max_det, 6) rows [x1,y1,x2,y2,conf,cls]
    (descaled for q_NMS), n_det (B,) the number of valid rows. Padding rows
    are zero.
    """
    p = params

    def single(pred):
        boxes, conf, cls, valid = _select_candidates(
            pred, p.max_nms, jnp.float32(p.conf_thres), p.pre_topk)
        offset = cls * (0.0 if p.agnostic else p.max_wh)
        shifted = boxes + offset[:, None]
        keep = _greedy_nms_mask(shifted, conf, valid, p.iou_thres,
                                p.max_det, p.plus_one, p.quantized)
        # compact kept rows to the front, at most max_det of them
        order = jnp.argsort(~keep, stable=True)   # kept first, score order
        keep_sorted = keep[order]
        conf_out = conf[order]
        if score_map is not None:
            conf_out = score_map(conf_out)
        rows = jnp.concatenate(
            (boxes[order] / p.box_scale,
             (conf_out / p.score_scale)[:, None],
             cls[order][:, None]), axis=1)
        rows = jnp.where(keep_sorted[:, None], rows, 0.0)
        n = jnp.sum(keep_sorted.astype(jnp.int32))
        if rows.shape[0] < p.max_det:   # fixed serving shape (B, max_det, 6)
            pad = jnp.zeros((p.max_det - rows.shape[0], 6), rows.dtype)
            rows = jnp.concatenate((rows, pad), 0)
        return rows[:p.max_det], n

    return jax.vmap(single)(preds)


def clip_boxes(boxes, hw):
    """Clip xyxy boxes to (h, w) (reference utils/bbox_cls_functions.py:
    258-273)."""
    h, w = hw
    return jnp.stack((jnp.clip(boxes[..., 0], 0, w),
                      jnp.clip(boxes[..., 1], 0, h),
                      jnp.clip(boxes[..., 2], 0, w),
                      jnp.clip(boxes[..., 3], 0, h)), axis=-1)


def scale_boxes(model_hw, boxes, orig_hw):
    """Map boxes from the model's letterboxed frame back to the original
    image (reference utils/bbox_cls_functions.py:276-308)."""
    gain = min(model_hw[0] / orig_hw[0], model_hw[1] / orig_hw[1])
    pad_x = round((model_hw[1] - orig_hw[1] * gain) / 2 - 0.1)
    pad_y = round((model_hw[0] - orig_hw[0] * gain) / 2 - 0.1)
    shifted = jnp.stack((boxes[..., 0] - pad_x, boxes[..., 1] - pad_y,
                         boxes[..., 2] - pad_x, boxes[..., 3] - pad_y),
                        axis=-1)
    return clip_boxes(shifted / gain, orig_hw)
