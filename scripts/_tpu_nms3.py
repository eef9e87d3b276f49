"""Find the missing 13ms in q_NMS (full 19ms vs select 3.3 + greedy 2.6):
time select+greedy (no finalize), finalize alone, and full, B=128."""
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


def sel_greedy(t):
    def single(pred):
        boxes, conf, cls_, valid = N._select_candidates(
            pred, p.max_nms, jnp.float32(p.conf_thres), p.pre_topk)
        offset = cls_ * p.max_wh
        keep = N._greedy_nms_mask(boxes + offset[:, None], conf, valid,
                                  p.iou_thres, p.max_det, p.plus_one,
                                  True, presorted=True)
        return keep
    return jax.vmap(single)(t)


def full(t):
    return N.non_max_suppression(t, p)[0]


slope_time("select+greedy  ", sel_greedy, preds)
slope_time("full q_NMS     ", full, preds)

# finalize alone: fixed keep/boxes/conf/cls inputs
kp = jax.block_until_ready(jax.jit(sel_greedy)(preds))
sel = jax.jit(lambda t: jax.vmap(
    lambda pred: N._select_candidates(
        pred, p.max_nms, jnp.float32(p.conf_thres), p.pre_topk)[:3])(t))
bx, cf, cl = (jax.block_until_ready(v) for v in sel(preds))


def finalize(args):
    keep, boxes, conf, cls_ = args

    def single(keep, boxes, conf, cls_):
        order = jnp.argsort(~keep, stable=True)
        keep_sorted = keep[order]
        rows = jnp.concatenate(
            (boxes[order] / p.box_scale,
             (conf[order] / p.score_scale)[:, None],
             cls_[order][:, None]), axis=1)
        rows = jnp.where(keep_sorted[:, None], rows, 0.0)
        n = jnp.sum(keep_sorted.astype(jnp.int32))
        pad = jnp.zeros((p.max_det - 0, 6), rows.dtype)
        rows = jnp.concatenate((rows, pad), 0)
        return rows[:p.max_det], n
    return jax.vmap(single)(*args)[0]


slope_time("finalize       ", finalize, (kp, bx, cf, cl))
print("done", flush=True)
