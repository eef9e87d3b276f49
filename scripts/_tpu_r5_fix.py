"""Round-5: re-measure with the trap-#6b-fixed harness (every output
leaf consumed through the carry).

1. fwd auto — past forward-only numbers consumed ONE of the six head
   edges; if the other five chains were DCE'd (trap #6b), the 19.4 ms
   attribution under-counts the detect-head branches.
2. e2e single — should match the official bench (det consumption
   already covered ~everything; n_det is now consumed too).
3. e2e dual/quad independent streams — the REAL answer to the
   dual-stream batching question (r5_dual.log's 2x/4x-for-free was
   pure artifact).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

from _slope import slope_time
from alpha_yolo_quant_tpu.config import QuantConfig
from alpha_yolo_quant_tpu.models.graph import build_yolov8_graph
from alpha_yolo_quant_tpu.models.params import init_params
from alpha_yolo_quant_tpu.quantize.calibrate import (
    collect_stats, reduce_stats,
)
from alpha_yolo_quant_tpu.quantize.transform import build_quantized_model
from alpha_yolo_quant_tpu.runtime import interpreter as interp
from alpha_yolo_quant_tpu.runtime.interpreter import build_int_pipeline

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = interp.device_plan(model)
fn, _ = build_int_pipeline(model, engine="auto")

import jax.numpy as jnp

x_q = jax.jit(lambda im: interp.quantize_input(
    im, 8, out_dtype=jnp.bfloat16))(
        jnp.asarray(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
            np.float32)))
x_q.block_until_ready()


def fwd(x):
    return interp.int_forward(model, plan, x, engine="auto",
                              head_requant=True)


slope_time("fwd auto (all heads consumed)", fwd, x_q)

ims = [jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32)) for _ in range(4)]
dt1 = slope_time("e2e single", fn, ims[0])


def dual(xs):
    return fn(xs[0]), fn(xs[1])


dt2 = slope_time("e2e dual", dual, (ims[0], ims[1]), carry_all=True)


def quad(xs):
    return tuple(fn(x) for x in xs)


dt4 = slope_time("e2e quad", quad, tuple(ims), carry_all=True)
print(f"single {dt1*1e3:.2f} -> {128/dt1:.0f} img/s | "
      f"dual {dt2*1e3:.2f} -> {256/dt2:.0f} | "
      f"quad {dt4*1e3:.2f} -> {512/dt4:.0f}", flush=True)
print("done", flush=True)
