"""Stem-only s2d with the space-to-depth transpose FUSED into the
quantize pass (quantize_input(s2d=True) -> conv2d_bf16_s2d_exact
pre_s2d): the full-s2d probe (r3_s2d.log) lost +2.5 ms on two unfused
mid-graph transposes; here the only transpose rides the quantize read
and the stem conv gets C_in 3 -> 12 (sublane padding waste 2.7x -> 1.3x).
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
from alpha_yolo_quant_tpu.runtime import interpreter as it

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = it.device_plan(model)

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def fwd_plain(imgs):
    xq = it.quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    return it.int_forward(model, plan, xq, engine="auto",
                          head_requant=True)


def fwd_s2dq(imgs):
    xq = it.quantize_input(imgs, 8, out_dtype=jnp.bfloat16, s2d=True)
    return it.int_forward(model, plan, xq, engine="auto",
                          head_requant=True)


o_a = jax.jit(fwd_plain)(images[:2])
o_b = jax.jit(fwd_s2dq)(images[:2])
ok = all(np.array_equal(np.asarray(o_a[r]).astype(np.int64),
                        np.asarray(o_b[r]).astype(np.int64))
         for r in model.graph.outputs)
print("s2d-quantize == plain on TPU (B=2):", ok, flush=True)

slope_time("fwd plain      ", fwd_plain, images)
slope_time("fwd s2d-in-qnt ", fwd_s2dq, images)
print("done", flush=True)
