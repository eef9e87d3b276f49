"""Round-3 decode->NMS seam: why does the 6-operand select co-sort cost
~9 ms in-pipeline (N1-N4 in r3_nmsseam.log) vs 0.93 ms standalone?

Variants (all compute P2 + selection only):
  S1 current: vmapped _select_candidates on (dbox (b,4,N), conf, cid)
  S2 S1 + optimization_barrier on the decode outputs
  S3 coordinate-plane operands: xywh->xyxy done batch-wise on (b,N)
     planes, sort called ONCE batched (no vmap slicing of (4,N))
  S4 key-only sort + take + gathers (argsort-style) in-pipeline
  S5 standalone reference: same co-sort on materialized device arrays
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.postprocess.nms import (
    _select_candidates, q_nms_params, xywh2xyxy,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, cls_int_conf_threshold, decode_full_quant,
    device_plan, int_forward, quantize_input,
)

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan(model)
P = dataclasses.replace(q_nms_params(model.head.anchor_scale),
                        conf_thres=cls_int_conf_threshold(model))

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def decode(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto", head_requant=True)
    return decode_full_quant(model, plan, outs, sigmoid_cls=False,
                             reduce_cls=True, pre_requantized=True)


def sel(pred):
    return _select_candidates(pred, P.max_nms, jnp.float32(P.conf_thres),
                              P.pre_topk, int_scores=True)


def s1(imgs):
    preds = decode(imgs)
    return jax.vmap(sel)(preds)


def s2(imgs):
    preds = jax.lax.optimization_barrier(decode(imgs))
    return jax.vmap(sel)(preds)


def s3(imgs):
    dbox, conf, cid = decode(imgs)
    n = conf.shape[1]
    m = P.pre_topk
    # batch-wise plane building: (b, n) per coordinate, no vmap slicing
    xy, wh = dbox[:, :2], dbox[:, 2:]
    lt = xy - wh * 0.5
    rb = xy + wh * 0.5
    x1, y1 = lt[:, 0], lt[:, 1]
    x2, y2 = rb[:, 0], rb[:, 1]
    key = ((conf.astype(jnp.int32) + (1 << 15)) << 14) \
        | (n - 1 - jnp.arange(n, dtype=jnp.int32))[None]
    srt = jax.lax.sort((-key, x1, y1, x2, y2, cid), num_keys=1,
                       dimension=1)
    skey = -srt[0][:, :m]
    conf_s = ((skey >> 14) - (1 << 15)).astype(jnp.float32)
    boxes = jnp.stack([srt[i][:, :m] for i in (1, 2, 3, 4)], 2)
    return boxes, conf_s, srt[5][:, :m], conf_s > jnp.float32(
        P.conf_thres)


def s4(imgs):
    dbox, conf, cid = decode(imgs)
    n = conf.shape[1]
    m = P.pre_topk

    def single(db, cf, ci):
        box = xywh2xyxy(db.T)
        key = ((cf.astype(jnp.int32) + (1 << 15)) << 14) \
            | (n - 1 - jnp.arange(n, dtype=jnp.int32))
        skey = -jax.lax.sort(-key)[:m]
        idx = (n - 1) - (skey & ((1 << 14) - 1))
        cs = ((skey >> 14) - (1 << 15)).astype(jnp.float32)
        return box[idx], cs, ci[idx], cs > jnp.float32(P.conf_thres)
    return jax.vmap(single)(dbox, conf, cid)


preds0 = jax.block_until_ready(jax.jit(decode)(images))


def s5(_preds):
    return jax.vmap(sel)(_preds)


slope_time("S1 current vmap co-sort ", s1, images)
slope_time("S2 S1+barrier           ", s2, images)
slope_time("S3 batched plane co-sort", s3, images)
slope_time("S4 key sort + gathers   ", s4, images)
slope_time("S5 standalone co-sort   ", s5, preds0)
print("done", flush=True)
