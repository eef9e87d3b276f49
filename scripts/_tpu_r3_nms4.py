"""Round-3 q_NMS part 3: assembly compaction variants.

r3_nms3.log: select(co-sort) 0.93 | greedy 2.65 | assembly 2.58 (argsort
over ~keep + 3 gathers) | FULL(co-sort select) 7.38. Replace assembly:

  A1 co-sort rows: key = keep<<10 | (1000-rank); ONE lax.sort over
     (key, x1, y1, x2, y2, conf, cls); kept rows land first in score order
  A2 cumsum-scatter into a fixed 304-slot buffer
  F2 FULL with co-sort select + A1 assembly
  F3 FULL with co-sort select + A2 assembly
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from _slope import slope_time
from alpha_yolo_quant_tpu.postprocess import nms as nms_mod
from alpha_yolo_quant_tpu.postprocess.nms import (
    _greedy_nms_mask, _select_candidates, q_nms_params, xywh2xyxy,
)

print("backend:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, N, M = 128, 8400, 1000
MAX_DET = 300
scores = jnp.asarray(rng.integers(9000, 32767, (B, N)).astype(np.float32))
boxes_xywh = jnp.asarray(
    rng.uniform(50 * 412, 500 * 412, (B, 4, N)).astype(np.float32))
cls = jnp.asarray(rng.integers(0, 80, (B, N)).astype(np.float32))
P = q_nms_params(412.1635)

sel_boxes = jnp.asarray(rng.uniform(0, 640 * 412, (B, M, 4)).astype(
    np.float32))
sel_conf = jnp.asarray(rng.integers(9000, 32767, (B, M)).astype(np.float32))
sel_cls = cls[:, :M]
keepmask = jnp.asarray((rng.uniform(0, 1, (B, M)) < 0.25).astype(
    np.float32))


def assemble_cosort(bx, cf, c, keep):
    m = keep.shape[0]
    key = (keep.astype(jnp.int32) << 10) | (m - jnp.arange(m,
                                                           dtype=jnp.int32))
    srt = lax.sort((-key, bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3], cf, c),
                   num_keys=1)
    skey = -srt[0]
    keep_sorted = (skey >> 10) > 0
    rows = jnp.stack([srt[1] / 412.1635, srt[2] / 412.1635,
                      srt[3] / 412.1635, srt[4] / 412.1635,
                      srt[5] / 32767.0, srt[6]], 1)
    rows = jnp.where(keep_sorted[:, None], rows, 0.0)
    n_det = jnp.sum(keep_sorted.astype(jnp.int32))
    return rows[:MAX_DET], jnp.minimum(n_det, MAX_DET)


def assemble_scatter(bx, cf, c, keep):
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (pos < MAX_DET), pos, MAX_DET)
    rows = jnp.concatenate(
        (bx / 412.1635, (cf / 32767.0)[:, None], c[:, None]), 1)
    buf = jnp.zeros((MAX_DET + 1, 6), rows.dtype)
    buf = buf.at[slot].set(rows)
    n_det = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), MAX_DET)
    return buf[:MAX_DET], n_det


def a1(args):
    bx, cf, c, kf = args
    return jax.vmap(assemble_cosort)(bx, cf, c, kf > 0.5)


def a2(args):
    bx, cf, c, kf = args
    return jax.vmap(assemble_scatter)(bx, cf, c, kf > 0.5)


slope_time("A1 co-sort assembly ", a1, (sel_boxes, sel_conf, sel_cls,
                                        keepmask))
slope_time("A2 scatter assembly ", a2, (sel_boxes, sel_conf, sel_cls,
                                        keepmask))


def select_cosort(pred, max_nms, conf_thres, pre_topk=None):
    bxywh, conf, c = pred
    box = xywh2xyxy(bxywh.T)
    n = conf.shape[0]
    m = min(pre_topk or max_nms, max_nms, n)
    key = ((conf.astype(jnp.int32) + (1 << 15)) << 14) \
        | (n - 1 - jnp.arange(n, dtype=jnp.int32))
    srt = lax.sort((-key, box[:, 0], box[:, 1], box[:, 2], box[:, 3], c),
                   num_keys=1)
    skey = -srt[0][:m]
    conf_s = ((skey >> 14) - (1 << 15)).astype(conf.dtype)
    boxes = jnp.stack([srt[i][:m] for i in (1, 2, 3, 4)], 1)
    return boxes, conf_s, srt[5][:m], conf_s > conf_thres


def full_with(assemble):
    def run(args):
        bx, sc, cl = args

        def single(bxy, s, c):
            boxes, conf, cc, valid = select_cosort(
                (bxy, s, c), 30000, jnp.float32(8192.0), 1000)
            off = cc * 7680.0
            keep = _greedy_nms_mask(boxes + off[:, None], conf, valid,
                                    0.45, MAX_DET, 412.0, True,
                                    presorted=True, block=128)
            return assemble(boxes, conf, cc, keep)

        return jax.vmap(single)(bx, sc, cl)
    return run


slope_time("F2 FULL cosel+A1    ", full_with(assemble_cosort),
           (boxes_xywh, scores, cls))
slope_time("F3 FULL cosel+A2    ", full_with(assemble_scatter),
           (boxes_xywh, scores, cls))
print("done", flush=True)
