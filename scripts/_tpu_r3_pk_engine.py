"""Round-3: packed engine with pipelined folded-mask kernels vs auto.

1. Bit-exact parity packed vs s8 on the real graph (B=2, 640).
2. Slope-timed int_forward: packed vs auto at B=128.
3. Slope-timed e2e pipeline (engine=packed vs auto).
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
    build_int_pipeline, device_plan, int_forward, quantize_input,
)

print("backend:", jax.devices()[0].platform, flush=True)

cfg = QuantConfig(k=8, full_quant=True, image_size=640)
g = build_yolov8_graph(cfg)
p = init_params(g, seed=0)
calib = np.random.default_rng(1).uniform(
    0, 1, (1, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(g, p, [calib]), "max")
qm = build_quantized_model(g, p, max_a, cfg)
plan = device_plan(qm, pallas=True)

# --- 1. parity at B=2 ---
x2 = jnp.asarray(np.random.default_rng(2).uniform(
    0, 1, (2, 3, 640, 640)).astype(np.float32))
xq2 = jax.jit(lambda a: quantize_input(a, 8))(x2)
o_s8 = jax.jit(lambda a: int_forward(qm, plan, a, engine="s8"))(xq2)
o_pk = jax.jit(lambda a: int_forward(qm, plan, a, engine="packed"))(xq2)
bad = 0
for r in qm.graph.outputs:
    a = np.asarray(o_s8[r], dtype=np.int64)
    b = np.asarray(o_pk[r], dtype=np.int64)
    if not np.array_equal(a, b):
        bad += 1
        print(f"PARITY FAIL {r}: {np.abs(a - b).max()} max diff, "
              f"{(a != b).mean():.4f} frac", flush=True)
print("parity:", "OK" if bad == 0 else f"{bad} outputs differ", flush=True)

# --- 2. forward slope timing at B=128 ---
x128 = jnp.asarray(np.random.default_rng(3).uniform(
    0, 1, (128, 3, 640, 640)).astype(np.float32))
xq128 = jax.jit(lambda a: quantize_input(a, 8, out_dtype=jnp.bfloat16))(x128)


def fwd(engine):
    def f(a):
        return int_forward(qm, plan, a, engine=engine, head_requant=True)
    return f


slope_time("fwd auto   B128", fwd("auto"), xq128)
slope_time("fwd packed B128", fwd("packed"), xq128)

# --- 3. e2e ---
fn_a, _ = build_int_pipeline(qm, engine="auto")
fn_p, _ = build_int_pipeline(qm, engine="packed")
dt = slope_time("e2e auto   B128", fn_a, x128)
print(f"  auto img/s: {128/dt:.0f}", flush=True)
dt = slope_time("e2e packed B128", fn_p, x128)
print(f"  packed img/s: {128/dt:.0f}", flush=True)
print("done", flush=True)
