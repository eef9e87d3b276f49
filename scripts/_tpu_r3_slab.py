"""Round-3 slab-resident packed engine vs the XLA auto engine:
whole-forward at B=128 @640, slope-timed (post trap-#5 harness: every
output leaf kept live via optimization_barrier).

The round-2 packed engine lost 68 vs 29 ms on C2f unpack/repack
boundaries; runtime/slabforward.py keeps the narrow region lane-packed
(structural ops become tap-matrix bookkeeping). This is the first
whole-forward measurement of that engine.
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
    device_plan, int_forward, quantize_input,
)

print("backend:", jax.devices()[0].platform, flush=True)

B = 128
cfg = QuantConfig(model="yolov8n", k=8, image_size=640, full_quant=True)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
rng = np.random.default_rng(1)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan_x = device_plan(model)
plan_p = device_plan(model, pallas=True)

xq = jax.device_put(np.asarray(quantize_input(
    jnp.asarray(rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32)),
    8)))


def fwd_auto(x):
    return int_forward(model, plan_x, x, engine="auto", head_requant=True)


def fwd_slab(x):
    return int_forward(model, plan_p, x, engine="packed",
                       head_requant=True)


# correctness cross-check on device first (B=2 slice)
o_a = jax.jit(fwd_auto)(xq[:2])
o_p = jax.jit(fwd_slab)(xq[:2])
ok = all(np.array_equal(np.asarray(o_a[r]).astype(np.int64),
                        np.asarray(o_p[r]).astype(np.int64))
         for r in model.graph.outputs)
print("slab == auto on TPU (B=2):", ok, flush=True)

slope_time("forward auto  B=128", fwd_auto, xq)
slope_time("forward slab  B=128", fwd_slab, xq)
print("done", flush=True)
