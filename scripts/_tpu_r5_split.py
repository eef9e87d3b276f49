"""Round-5 HONEST stage split under the trap-#6b-fixed harness (every
output leaf consumed through the carry — see _slope.py). The r3_split /
r4 forward-only numbers consumed one head edge out of six, so XLA
dropped 5 of the 6 detect-head branches (~5.9 ms): "forward 19.4 /
post-forward 12.4" was wrong; this probe re-attributes the 31.75 ms
e2e. Also re-checks the auto-vs-s8 engine call with all heads live.
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
    non_max_suppression, q_nms_params,
)
from alpha_yolo_quant_tpu.runtime.interpreter import (
    cls_int_conf_threshold, decode_full_quant, device_plan, int_forward,
    quantize_input,
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


def a0(imgs):
    return quantize_input(imgs, 8, out_dtype=jnp.bfloat16)


def a1(imgs):
    return int_forward(model, plan, a0(imgs), engine="auto",
                       head_requant=True)


def a1s(imgs):
    return int_forward(model, plan,
                       quantize_input(imgs, 8, out_dtype=jnp.int8),
                       engine="s8", head_requant=True)


def a2(imgs):
    return decode_full_quant(model, plan, a1(imgs), sigmoid_cls=False,
                             reduce_cls=True, pre_requantized=True)


def a3(imgs):
    return non_max_suppression(a2(imgs), P)


slope_time("A0 quantize          ", a0, images)
slope_time("A1 +forward(auto)    ", a1, images)
slope_time("A1s +forward(s8)     ", a1s, images)
slope_time("A2 +decode per-level ", a2, images)
slope_time("A3 full e2e          ", a3, images)
print("done", flush=True)
