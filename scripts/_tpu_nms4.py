"""q_NMS composition-overhead variants, B=128 slope-timed:
A baseline full | B optimization_barrier between stages |
C greedy as static lax.scan over all 8 blocks (no while early-exit) |
D B+C combined.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from _slope import slope_time  # noqa: E402

from alpha_yolo_quant_tpu.postprocess import nms as N  # noqa: E402

B = 128
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
p = dataclasses.replace(N.q_nms_params(412.1635), conf_thres=0.0)
xy = rng.uniform(4120, 260000, (B, 2, 8400))
wh = rng.uniform(2000, 40000, (B, 2, 8400))
cls = rng.normal(-6000, 3000, (B, 80, 8400))
preds = jnp.asarray(np.concatenate([xy, wh, cls], 1).astype(np.float32))


def greedy_scan(boxes, valid, iou_thres, max_det, plus_one, quantized):
    """Static-trip-count variant of _greedy_nms_mask (presorted)."""
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + plus_one) * (y2 - y1 + plus_one)
    blk = 128
    n_blocks = -(-n // blk)
    n_pad = n_blocks * blk

    def pad(v):
        return jnp.pad(v, (0, n_pad - v.shape[0]))

    xyxya = tuple(pad(v) for v in (x1, y1, x2, y2, areas))
    validp = pad(valid)
    tri = (jnp.arange(blk)[:, None] < jnp.arange(blk)[None, :]).astype(
        jnp.bfloat16)
    x1p, y1p, x2p, y2p, areasp = xyxya
    xb = [v.reshape(n_blocks, blk) for v in xyxya]
    vb = validp.reshape(n_blocks, blk)

    def blk_body(kept, blkdat):
        bx1, by1, bx2, by2, bareas, v_row, start = blkdat
        s_col = N._suppress_slice(xyxya, (bx1, by1, bx2, by2, bareas),
                                  0.45, 412.0, True)
        pre_kill = (kept.astype(jnp.bfloat16) @ s_col) > 0.5
        v_b = v_row & ~pre_kill
        s_bb = jax.lax.dynamic_slice(s_col, (start, 0), (blk, blk))
        t_b = s_bb * tri

        def cond(c):
            k, prev, it = c
            return (it < blk) & jnp.any(k != prev)

        def body(c):
            k, _, it = c
            killed = (k.astype(jnp.bfloat16) @ t_b) > 0.5
            return v_b & ~killed, k, it + 1

        k_b, _, _ = jax.lax.while_loop(
            cond, body, (v_b, jnp.zeros_like(v_b), jnp.int32(0)))
        kept = jax.lax.dynamic_update_slice(
            kept, k_b.astype(jnp.float32), (start,))
        return kept, None

    starts = jnp.arange(n_blocks, dtype=jnp.int32) * blk
    kept, _ = jax.lax.scan(
        blk_body, jnp.zeros((n_pad,), jnp.float32),
        (xb[0], xb[1], xb[2], xb[3], xb[4], vb, starts))
    keep_sorted = kept[:n] > 0.5
    within = jnp.cumsum(keep_sorted.astype(jnp.int32)) <= max_det
    return keep_sorted & within


def make_full(barrier=False, scan=False):
    def single(pred):
        boxes, conf, cls_, valid = N._select_candidates(
            pred, p.max_nms, jnp.float32(p.conf_thres), p.pre_topk)
        if barrier:
            boxes, conf, cls_, valid = jax.lax.optimization_barrier(
                (boxes, conf, cls_, valid))
        offset = cls_ * p.max_wh
        shifted = boxes + offset[:, None]
        if scan:
            keep = greedy_scan(shifted, valid, p.iou_thres, p.max_det,
                               p.plus_one, True)
        else:
            keep = N._greedy_nms_mask(shifted, conf, valid, p.iou_thres,
                                      p.max_det, p.plus_one, True,
                                      presorted=True)
        if barrier:
            keep, boxes, conf, cls_ = jax.lax.optimization_barrier(
                (keep, boxes, conf, cls_))
        order = jnp.argsort(~keep, stable=True)
        keep_sorted = keep[order]
        rows = jnp.concatenate(
            (boxes[order] / p.box_scale,
             (conf[order] / p.score_scale)[:, None],
             cls_[order][:, None]), axis=1)
        rows = jnp.where(keep_sorted[:, None], rows, 0.0)
        n = jnp.sum(keep_sorted.astype(jnp.int32))
        if rows.shape[0] < p.max_det:
            rows = jnp.concatenate(
                (rows, jnp.zeros((p.max_det - rows.shape[0], 6),
                                 rows.dtype)), 0)
        return rows[:p.max_det], n

    return lambda t: jax.vmap(single)(t)[0]


fA = make_full()
fB = make_full(barrier=True)
fC = make_full(scan=True)
fD = make_full(barrier=True, scan=True)

# parity of the scan variant vs baseline
a = np.asarray(jax.jit(fA)(preds[:8]))
c = np.asarray(jax.jit(fC)(preds[:8]))
print("scan variant keep-parity:", np.array_equal(a, c), flush=True)

slope_time("A baseline     ", fA, preds)
slope_time("B barrier      ", fB, preds)
slope_time("C scan-blocks  ", fC, preds)
slope_time("D barrier+scan ", fD, preds)
print("done", flush=True)
