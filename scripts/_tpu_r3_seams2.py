"""Round-3 seam re-probe after the per-level serving decode.

Baseline (r3_seams.log, concat-first decode): P1 31.8 | P2 37.65 |
P3 51.76 (pre NMS-win pipeline). Re-measure the same prefixes with
decode_full_quant's new per-level path + the current q_NMS.
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
from alpha_yolo_quant_tpu.runtime.interpreter import (
    build_int_pipeline, decode_full_quant, device_plan, int_forward,
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
fn_full, _ = build_int_pipeline(model, engine="auto")

images = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))


def p1(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto", head_requant=True)
    return outs["p3_box"]


def p2(imgs):
    xq = quantize_input(imgs, 8, out_dtype=jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto", head_requant=True)
    return decode_full_quant(model, plan, outs, sigmoid_cls=False,
                             reduce_cls=True, pre_requantized=True)


slope_time("P1 quant+fwd(hreq)    ", p1, images)
slope_time("P2 +decode per-level  ", p2, images)
dt = slope_time("P3 full e2e           ", fn_full, images)
print(f"  e2e img/s: {B/dt:.0f}", flush=True)
print("done", flush=True)
