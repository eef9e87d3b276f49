"""Round-4: measure the epilogue op-diet in place (after the lib change:
direct req1 + folded-rhu req2 + mask-free sigma apply + head-requant fast
paths). Forward-only and full e2e, auto engine, B=128, slope-timed.

Baselines (r4_epi.log, pre-diet): forward 25.70 ms, e2e 39.3 ms
(r3_wide16.log) = 3,247 img/s official.
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
from alpha_yolo_quant_tpu.runtime import interpreter as interp

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
n_direct = sum(c.req1_direct_ok for c in model.convs.values()
               if c.node.silu)
n_fold2 = sum(c.fold2_ok for c in model.convs.values() if c.node.silu)
print(f"req1_direct_ok: {n_direct}, fold2_ok: {n_fold2} of "
      f"{sum(1 for c in model.convs.values() if c.node.silu)} silu convs; "
      f"head direct: {model.head.req_direct_ok}", flush=True)
plan = interp.device_plan(model)

images = rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)
x_q = jax.jit(lambda im: interp.quantize_input(im, 8,
                                               out_dtype=jnp.bfloat16)
              )(jnp.asarray(images))
x_q.block_until_ready()


def fwd(x):
    return interp.int_forward(model, plan, x, engine="auto",
                              head_requant=True)


slope_time("fwd auto (op-diet)", fwd, x_q)

from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

fn, _ = build_int_pipeline(model, engine="auto")
img_dev = jax.device_put(images)
dt = slope_time("e2e auto (op-diet)", fn, img_dev)
print(f"=> {B/dt:.0f} img/s", flush=True)
print("done", flush=True)
