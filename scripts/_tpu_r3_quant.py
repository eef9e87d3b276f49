"""Round-3 input-quantize probe: Pallas elementwise vs XLA.

r3_seams.log P0: the XLA quantize (f32 NCHW -> bf16, B=128) costs
3.87 ms against a ~1.15 ms HBM roofline (629 MB read + 314 MB write).
Probe a trivial Pallas elementwise kernel at the same contract:

  Q0 XLA quantize -> bf16 (baseline)
  Q1 Pallas quantize -> bf16, grid (B,4), block (1,3,160,640)
  Q2 Pallas quantize -> int8 (s8-engine variant)
  Q3 Q1 + forward(auto) prefix  (vs r3_seams P1 = 31.8 ms)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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
rng = np.random.default_rng(1)
images = jax.device_put(
    rng.uniform(0, 1, (B, 3, 640, 640)).astype(np.float32))


def _qkernel(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = jnp.round(
        jnp.clip(x, -1.0, 1.0) * np.float32(127.0)).astype(o_ref.dtype)


def pallas_quantize(x, out_dtype, rows=160):
    b, c, h, w = x.shape
    return pl.pallas_call(
        _qkernel,
        grid=(b, h // rows),
        in_specs=[pl.BlockSpec((1, c, rows, w), lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, c, rows, w), lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), out_dtype),
    )(x)


# exactness vs the XLA path
x2 = images[:2]
ref = np.asarray(jax.jit(
    lambda a: quantize_input(a, 8, out_dtype=jnp.bfloat16))(x2))
got = np.asarray(jax.jit(
    lambda a: pallas_quantize(a, jnp.bfloat16))(x2))
print("bf16 exact:", np.array_equal(ref.astype(np.float32),
                                    got.astype(np.float32)), flush=True)
ref8 = np.asarray(jax.jit(lambda a: quantize_input(a, 8))(x2))
got8 = np.asarray(jax.jit(lambda a: pallas_quantize(a, jnp.int8))(x2))
print("int8 exact:", np.array_equal(ref8, got8), flush=True)

slope_time("Q0 XLA quantize bf16   ",
           lambda a: quantize_input(a, 8, out_dtype=jnp.bfloat16), images)
slope_time("Q1 Pallas quantize bf16",
           lambda a: pallas_quantize(a, jnp.bfloat16), images)
slope_time("Q2 Pallas quantize int8",
           lambda a: pallas_quantize(a, jnp.int8), images)

cfg = QuantConfig(model="yolov8n", k=8, full_quant=True, image_size=640)
graph = build_yolov8_graph(cfg)
params = init_params(graph, seed=0)
calib = rng.uniform(0, 1, (2, 3, 640, 640)).astype(np.float32)
max_a = reduce_stats(collect_stats(graph, params, [calib]), "max")
model = build_quantized_model(graph, params, max_a, cfg)
plan = device_plan(model)


def q3(imgs):
    xq = pallas_quantize(imgs, jnp.bfloat16)
    outs = int_forward(model, plan, xq, engine="auto")
    return outs["p3_box"]


slope_time("Q3 pallas-q + fwd(auto)", q3, images)
print("done", flush=True)
