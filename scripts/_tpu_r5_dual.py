"""Round-5 probe: dual-stream batching.

The post-forward region (~12.4 of 31.8 ms at B=128) is latency/
scheduler-bound: select sort runs at 2% BW and three component-superior
rewrites lost e2e. Untried: give XLA TWO INDEPENDENT B=128 pipelines in
ONE jit — the latency-hiding scheduler may interleave stream A's
small-op post-forward chain under stream B's conv work. This is NOT the
round-3 "B=256 as one batch" experiment (lane overfill made every conv
worse); each stream keeps the lane-optimal B=128, only the schedule is
shared. Bit-exactness is trivial (identical per-image math).

Win condition: dual wall < 2x single wall (63.6 ms) by more than noise.
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
fn, _ = build_int_pipeline(model, engine="auto")

im_a = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))
im_b = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))
# distinct buffers for the quad legs: identical operands would let XLA
# CSE whole streams (and trap #6 would hoist carry-free ones)
im_c = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))
im_d = jax.device_put(rng.uniform(0, 1, (B, 3, 640, 640)).astype(
    np.float32))

dt1 = slope_time("single B=128", fn, im_a)


def dual(xs):
    return fn(xs[0]), fn(xs[1])


dt2 = slope_time("dual 2x B=128", dual, (im_a, im_b), carry_all=True)
print(f"dual vs 2x single: {dt2*1000:.2f} vs {2*dt1*1000:.2f} ms "
      f"-> {256.0/dt2:.0f} img/s vs {128.0/dt1:.0f}", flush=True)


def quad(xs):
    return tuple(fn(x) for x in xs)


dt4 = slope_time("quad 4x B=128", quad, (im_a, im_b, im_c, im_d), carry_all=True)
print(f"quad: {dt4*1000:.2f} ms -> {512.0/dt4:.0f} img/s", flush=True)
print("done", flush=True)
