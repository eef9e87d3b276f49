"""Round-3 decode->NMS seam bisect (in-pipeline NMS sub-stages).

r3_seams2.log: P2 (quant+fwd+decode) 28.9 | P3 full 42.1 -> NMS+seam
13.2 ms vs 5.3 standalone (r3_nms4 F2). Charge the NMS sub-stages while
composed with the real pipeline:

  N1 P2 + _select_candidates        (the 6-operand packed co-sort)
  N2 N1 + _greedy_nms_mask
  N3 full pipeline (reference point)
  N4 P2 + key-build only (no sort)  (operand materialization cost)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

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
    _greedy_nms_mask, _select_candidates,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, cls_int_conf_threshold, decode_full_quant,
    device_plan, int_forward, quantize_input,
)
from alpha_yolo_quant_tpu.postprocess.nms import q_nms_params
import dataclasses

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
fn_full, _ = build_int_pipeline(model, engine="auto")
P = dataclasses.replace(q_nms_params(model.head.anchor_scale),
                        conf_thres=cls_int_conf_threshold(model))

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def decode(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto", head_requant=True)
    return decode_full_quant(model, plan, outs, sigmoid_cls=False,
                             reduce_cls=True, pre_requantized=True)


def n1(imgs):
    preds = decode(imgs)

    def single(pred):
        return _select_candidates(pred, P.max_nms,
                                  jnp.float32(P.conf_thres), P.pre_topk,
                                  int_scores=True)
    return jax.vmap(single)(preds)


def n2(imgs):
    preds = decode(imgs)

    def single(pred):
        boxes, conf, cls, valid = _select_candidates(
            pred, P.max_nms, jnp.float32(P.conf_thres), P.pre_topk,
            int_scores=True)
        shifted = boxes + (cls * P.max_wh)[:, None]
        keep = _greedy_nms_mask(shifted, conf, valid, P.iou_thres,
                                P.max_det, P.plus_one, True,
                                presorted=True, block=P.block)
        return keep
    return jax.vmap(single)(preds)


def n4(imgs):
    dbox, conf, cid = decode(imgs)
    n = conf.shape[1]
    key = ((conf.astype(jnp.int32) + (1 << 15)) << 14) \
        | (n - 1 - jnp.arange(n, dtype=jnp.int32))[None]
    return key, dbox * 0.5, cid


slope_time("N4 P2+key-build (no sort)", n4, images)
slope_time("N1 P2+select co-sort     ", n1, images)
slope_time("N2 N1+greedy mask        ", n2, images)
slope_time("N3 full pipeline         ", fn_full, images)
print("done", flush=True)
